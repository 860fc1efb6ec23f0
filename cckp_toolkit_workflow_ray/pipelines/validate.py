"""End-to-end validation pipeline (the ``main.nf`` workflow analog).

Reference lifecycle (``/root/reference/main.nf:75-137``): sample-sheet
source → fail-fast input validation → per-record fan-out (presence checks,
metric profiling, test execution) → keyed joins → criteria scoring →
report.  Ray-Data-first restructuring: the three per-record branches
collapse into ONE streaming ``map_batches`` pass (columns accumulate; no
join needed — SURVEY.md §2.5 J1), uniqueness adds one pruned-read shuffle,
and everything downstream operates on the tiny derived stream.

Dataflow::

    read_parquet(pages)                         # full columns, 1 scan
      └─ map_batches(CheckSuite actors)         # all row checks + partials
           └─ write_parquet(out/stream)         # small long-form stream
    read_parquet(pages, columns=[url,lang])     # pruned 2nd scan
      └─ combiner + groupby(url) → dups         # the only all-to-all
    stream → violations ∪ dup-violations → write_parquet(out/violations)
    stream → hierarchical profile merge → profile table + drift verdicts
    violations → groupby(lang, check).count → verdict table → report.json

Nothing materializes the wide input; the driver only ever holds the
per-lang merged profile (KiB) and the verdict table (rows = langs ×
checks).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time
from dataclasses import replace as _dc_replace
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa
from ..functions.arrow import table_from_pandas as _table_from_pandas
import pyarrow.compute as pc

from ..config import ValidationConfig, validate_check_names
from ..functions.extract import EXTRACTOR_VERSION
from ..schema import (STREAM_SCHEMA, VIOLATIONS_SCHEMA, check_conformance,
                      ensure_parquet_dir)
from ..stages.checks import CheckSuite, make_check_fn
from ..stages.profile import (
    ReferenceProfile,
    merge_profiles,
    profile_to_table,
)
from ..stages.uniqueness import duplicate_urls, duplicates_to_violations
from ..stages.verdicts import assemble_verdicts
from ..state.checkpoint import config_fingerprint as _config_fingerprint


def _dataset_schema(ds) -> pa.Schema | None:
    sch = ds.schema()
    if sch is None:
        return None  # e.g. an empty generated dataset — nothing to gate on
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    if getattr(sch, "names", None) is None:
        return None
    return pa.schema(list(zip(sch.names, sch.types)))


def _stream_to_violations(t: pa.Table) -> pa.Table:
    v = t.filter(pc.equal(t.column("kind"), "violation"))
    return v.select(["url", "lang", "check", "severity", "detail"]).cast(VIOLATIONS_SCHEMA)


def violation_counts(viol_dir: str) -> pd.DataFrame:
    """Per-(lang, check) violation counts: per-batch combiner + driver
    merge — the cardinality is langs x checks, no distributed groupby
    needed.  Shared by the monolithic and checkpointed paths."""
    import ray.data as rd

    def _count_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": t.column("lang").to_numpy(zero_copy_only=False),
            "check": t.column("check").to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["lang", "check"], as_index=False).size()
        return _table_from_pandas(
            g.rename(columns={"size": "n_violations"}), preserve_index=False
        )

    parts = (
        rd.read_parquet(viol_dir, columns=["lang", "check"])
        .map_batches(_count_partial, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame(columns=["lang", "check", "n_violations"])
    return parts.groupby(["lang", "check"], as_index=False)["n_violations"].sum()


@dataclass
class ValidationResult:
    out_dir: str
    verdicts: pd.DataFrame
    profile: pa.Table
    config: ValidationConfig
    reference: ReferenceProfile | None = None
    report: dict = field(default_factory=dict)

    @property
    def violations_path(self) -> str:
        return os.path.join(self.out_dir, "violations")

    def violations(self):
        import ray.data as rd

        return rd.read_parquet(self.violations_path)

    def overall_verdict(self) -> str:
        o = self.verdicts[self.verdicts.check == "__overall__"]
        order = {"PASS": 0, "UNKNOWN": 1, "FAIL": 2}
        return max(o["verdict"], key=order.get) if len(o) else "UNKNOWN"


class _PhaseTimer:
    """Opt-in phase timing: set CCKP_TIMING=1 to print wall times to stderr."""

    def __init__(self):
        self.enabled = os.environ.get("CCKP_TIMING") == "1"
        self.t = time.perf_counter()

    def lap(self, name: str):
        if self.enabled:
            now = time.perf_counter()
            print(f"[validate] {name}: {now - self.t:.2f}s", file=sys.stderr)
            self.t = now


def validate(
    source,
    out_dir: str | None = None,
    config: ValidationConfig | None = None,
    reference_profile: ReferenceProfile | None = None,
) -> ValidationResult:
    """Run the full validation DAG over a pages table.

    ``source``: parquet path(s) (preferred — enables pruned reads) or a
    ``ray.data.Dataset`` with the pages schema.
    """
    import ray.data as rd

    cfg = config or ValidationConfig()
    validate_check_names(cfg.checks)
    if reference_profile is not None:
        # the reference profile is the authoritative membership set for
        # the referential check (RunAlmanack.nf:77-78 chain analog)
        cfg = _dc_replace(cfg, valid_langs=tuple(reference_profile.valid_langs))
    paths = None
    if isinstance(source, (str, list, tuple)):
        # Ray's read_parquet rejects tuples — normalize to a list
        paths = list(source) if isinstance(source, (list, tuple)) else source
    ds = rd.read_parquet(paths) if paths is not None else source

    # fail-fast physical-schema gate (main.nf:49-66 analog); an empty
    # dataset has no observable schema — it must not crash (FIXTURES.md)
    observed = _dataset_schema(ds)
    if observed is not None:
        check_conformance(observed)

    out_dir = out_dir or tempfile.mkdtemp(dir="/tmp", prefix="cckp_validate_")
    os.makedirs(out_dir, exist_ok=True)
    stream_dir = os.path.join(out_dir, "stream")
    viol_dir = os.path.join(out_dir, "violations")
    # a rerun into the same out_dir must not mix with stale files
    # (write_parquet appends new UUID-named part files)
    shutil.rmtree(stream_dir, ignore_errors=True)
    shutil.rmtree(viol_dir, ignore_errors=True)

    # ---- pass 1: all row-local checks + profile partials, one scan.
    # Task-based (not actor-pool) so Ray fuses the checks onto the
    # parquet-read tasks: the wide html column never enters the object
    # store (see stages.checks.make_check_fn).  The uniqueness pass runs
    # sequentially after it — measured faster than thread-overlapping the
    # two scans, which just contend for the same CPUs.
    import pyarrow.parquet as pq

    timer = _PhaseTimer()
    stream = ds.map_batches(
        make_check_fn(cfg),
        batch_size=cfg.batch_size,
        batch_format="pyarrow",
    )
    # coalesce the tiny derived stream into a few files so downstream
    # re-reads don't pay per-file task overhead
    stream.repartition(16).write_parquet(stream_dir)
    ensure_parquet_dir(stream_dir, STREAM_SCHEMA)
    timer.lap("stream pass")

    dups = None
    if "uniqueness_url" in cfg.checks:
        dups = duplicate_urls(paths if paths is not None else ds, cfg).materialize()
    timer.lap("uniqueness")

    os.makedirs(stream_dir, exist_ok=True)
    if not any(f.endswith(".parquet") for f in os.listdir(stream_dir)):
        # 0-row input writes no files; keep the dir readable (FIXTURES.md:
        # empty input must produce clean UNKNOWN verdicts, not crash)
        pq.write_table(STREAM_SCHEMA.empty_table(), os.path.join(stream_dir, "empty.parquet"))
    stream_ds = rd.read_parquet(stream_dir)

    # ---- violations table (incl. uniqueness shuffle results) -------------
    viol_ds = stream_ds.map_batches(_stream_to_violations, batch_format="pyarrow")
    if dups is not None:
        sev = cfg.severity("uniqueness_url")
        dup_viols = dups.map_batches(
            lambda t: duplicates_to_violations(t, severity=sev),
            batch_format="pyarrow",
        )
        viol_ds = viol_ds.union(dup_viols)
    viol_ds.write_parquet(viol_dir)
    ensure_parquet_dir(viol_dir, VIOLATIONS_SCHEMA)
    timer.lap("violations write")

    # ---- small derived tables --------------------------------------------
    counts_df = violation_counts(viol_dir)
    timer.lap("violation counts")
    profiles = merge_profiles(stream_ds, cfg)
    timer.lap("profile merge")
    verdicts = assemble_verdicts(profiles, counts_df, cfg, reference_profile)
    profile_tbl = profile_to_table(profiles)

    # ---- persist verdicts/profile + driver report (K3/K5 analog) ---------
    pq.write_table(
        _table_from_pandas(verdicts, preserve_index=False),
        os.path.join(out_dir, "verdicts.parquet"),
    )
    pq.write_table(profile_tbl, os.path.join(out_dir, "profile.parquet"))

    report = {
        "extractor_version": EXTRACTOR_VERSION,
        "config_fingerprint": _config_fingerprint(cfg),
        "n_rows": int(sum(p["n_rows"] for p in profiles.values())),
        "n_violations": int(counts_df["n_violations"].sum()) if len(counts_df) else 0,
        "violations_by_check": {
            check: int(g["n_violations"].sum())
            for check, g in counts_df.groupby("check")
        },
        "overall_by_lang": {
            r.lang: r.verdict
            for r in verdicts[verdicts.check == "__overall__"].itertuples()
        },
    }
    timer.lap("verdicts+persist")
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)

    return ValidationResult(
        out_dir=out_dir, verdicts=verdicts, profile=profile_tbl,
        config=cfg, reference=reference_profile, report=report,
    )


def run_check(check: str, source, out_dir: str | None = None,
              config: ValidationConfig | None = None,
              reference_profile: ReferenceProfile | None = None) -> ValidationResult:
    """Run a single check standalone — the engine analog of the reference's
    standalone per-module workflow (AnalyzeJOSSCriteria.nf:43-61)."""
    cfg = config or ValidationConfig()
    cfg = ValidationConfig(**{**vars(cfg), "checks": (check,)})
    return validate(source, out_dir=out_dir, config=cfg, reference_profile=reference_profile)


def build_reference_profile(source, config: ValidationConfig | None = None) -> ReferenceProfile:
    """Profile a clean corpus into the broadcast reference-profile side
    (drift baseline + valid-lang set)."""
    import ray.data as rd

    cfg = config or ValidationConfig()
    profile_cfg = ValidationConfig(**{**vars(cfg), "checks": ()})
    if isinstance(source, (list, tuple)):
        source = list(source)
    ds = rd.read_parquet(source) if isinstance(source, (str, list)) else source
    stream = ds.map_batches(
        make_check_fn(profile_cfg),
        batch_size=cfg.batch_size,
        batch_format="pyarrow",
    )
    profiles = merge_profiles(stream, cfg)
    return ReferenceProfile.from_merged(profiles)
