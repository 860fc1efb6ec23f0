"""Declared schemas for every logical table the engine touches.

The reference's schema system is implicit/dynamic (positional Nextflow
tuples, schemaless JSON with defensive ``.get`` defaults — see
``/root/reference/main.nf:103-113`` and ``bin/analyze_joss.py:91-105``).
The engine is columnar-first: every table has a fixed declared
``pyarrow.Schema``; dynamic schema exists only at the boundary, where the
schema-conformance check compares the observed schema against the declared
one and fails fast on mismatch (analog of the reference's fail-fast input
validation, ``main.nf:49-66``).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input table: Common-Crawl-style web pages (BASELINE.json input_hint).
# ---------------------------------------------------------------------------
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# Output tables.
# ---------------------------------------------------------------------------
# One row per violated check per offending input row.  The engine analog of
# the reference's per-record status row `repo_name,CLONE,DEP,TESTS`
# (ProcessRepo.nf:85, RunAlmanack.nf:77-78) normalised to long form.
VIOLATIONS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lang", pa.string()),
        ("check", pa.string()),
        ("severity", pa.string()),  # "error" | "warning"
        ("detail", pa.string()),
    ]
)

# Per-(partition, check) verdict — the rollup of the status-row vector plus
# the reference's tri-level threshold scoring (analyze_joss.py:42-49,322-335).
VERDICTS_SCHEMA = pa.schema(
    [
        ("lang", pa.string()),
        ("check", pa.string()),
        ("n_rows", pa.int64()),
        ("n_violations", pa.int64()),
        ("pass_rate", pa.float64()),
        ("status", pa.string()),  # good | ok | needs_improvement | unknown
        ("score", pa.float64()),  # 1.0 | 0.7 | 0.3 | 0.0
        ("verdict", pa.string()),  # PASS | FAIL | UNKNOWN
    ]
)

# Long-form stats profile: the `almanack.table()` analog
# (RunAlmanack.nf:68; consumed by name-lookup at analyze_joss.py:51-78).
PROFILE_SCHEMA = pa.schema(
    [
        ("lang", pa.string()),
        ("column", pa.string()),
        ("metric", pa.string()),
        ("value", pa.float64()),
    ]
)

# Internal single-pass long stream emitted by the CheckSuite stage; every
# downstream table (violations, verdicts, profile) derives from it, so the
# big input is scanned exactly once for all row-local checks + profiling.
# kind: "violation" (one row per violated check per input row) or
# "profile" (one row per (batch, lang): serialized stats/sketch partial).
STREAM_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("lang", pa.string()),
        ("check", pa.string()),
        ("url", pa.string()),
        ("severity", pa.string()),
        ("detail", pa.string()),
        ("payload", pa.binary()),  # serialized per-batch profile partial
    ]
)

REQUIRED_COLUMNS = [f.name for f in PAGES_SCHEMA]


class SchemaMismatchError(ValueError):
    """Raised fail-fast when the input's physical schema doesn't conform."""


def check_conformance(observed: pa.Schema, declared: pa.Schema = PAGES_SCHEMA) -> None:
    """Fail-fast input-schema validation (reference main.nf:49-66 analog).

    Column order is irrelevant; extra columns are allowed (they're ignored
    by checks); a missing column or a type mismatch on a declared column
    raises :class:`SchemaMismatchError`.
    """
    problems = []
    names = set(observed.names)
    for field in declared:
        if field.name not in names:
            problems.append(f"missing required column '{field.name}'")
            continue
        obs = observed.field(field.name).type
        if obs != field.type:
            problems.append(
                f"column '{field.name}' has type {obs}, expected {field.type}"
            )
    if problems:
        raise SchemaMismatchError(
            "input schema does not conform to the declared pages schema: "
            + "; ".join(problems)
        )


def ensure_parquet_dir(path: str, schema: pa.Schema) -> None:
    """Guarantee ``path`` is a readable parquet directory: a 0-row
    ``write_parquet`` produces no files, so back-fill one empty file with
    the declared schema (the empty-input contract, FIXTURES.md)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    if not any(f.endswith(".parquet") for f in os.listdir(path)):
        pq.write_table(schema.empty_table(), os.path.join(path, "empty.parquet"))
