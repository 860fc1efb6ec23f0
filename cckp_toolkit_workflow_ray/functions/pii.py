"""PII redaction: vectorized regex redaction of emails / phone numbers /
IP addresses in a text column.

A training-data pipeline must strip personally-identifying strings before
the corpus ships; this generalizes the reference's per-row regex
predicates (URL format at ``/root/reference/main.nf:117-125``) into an
in-place rewrite.  Patterns evaluate with pyarrow.compute's RE2 kernels
(``count_substring_regex`` / ``replace_substring_regex``) — zero-copy over
Arrow batches, no Python per row, and the SAME regex engine DuckDB uses,
so the SQL oracles are semantics-identical by construction.

Scale shape: a pure per-batch map — no shuffle, no state; fuses with the
parquet read.  At 100 TB this stage is embarrassingly parallel and its
cost is one RE2 pass per pattern over each batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement token).  Order matters only if a
# pattern could match inside another's replacement; the tokens are
# letter-only so no cross-matching is possible.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact PII in ``text_col``; append per-row match counts
    (``n_email``/``n_phone``/``n_ip``, int64, counted on the ORIGINAL
    text) and replace the column with the redacted string.  Null text
    stays null (counts 0)."""
    col = t.column(text_col)
    filled = pc.fill_null(col, "")
    counts = {}
    red = filled
    for name, pattern, token in PII_PATTERNS:
        counts[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(filled, pattern), pa.int64())
        red = pc.replace_substring_regex(red, pattern, token)
    # restore nulls
    red = pc.if_else(pc.is_null(col), col, red)
    out = t.set_column(t.schema.get_field_index(text_col),
                       text_col, red)
    for name, arr in counts.items():
        out = out.append_column(name, arr)
    return out


def redact_pii(ds, text_col: str = "text", batch_size: int = 8192):
    """Dataset-level PII redaction: one streaming ``map_batches`` pass."""
    return ds.map_batches(
        lambda t: redact_pii_batch(t, text_col),
        batch_format="pyarrow", batch_size=batch_size)
