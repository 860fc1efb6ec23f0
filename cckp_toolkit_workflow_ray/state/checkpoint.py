"""Per-partition checkpoint/resume — the Nextflow ``-resume`` analog.

The reference resumes via a content-addressed task cache
(``/root/reference/nextflow.config:14``: every (process, inputs) pair maps
to a ``work/`` dir; unchanged tasks are skipped) and idempotent publishDir
copies.  The engine analog (SURVEY.md §4): the expensive per-row scan is
partitioned by input file group; each partition writes its derived stream
to ``out/partitions/<pid>/`` ATOMICALLY (temp dir + rename) together with
a ``manifest.json`` carrying lineage — input files with sizes, the config
fingerprint, extractor version — plus row/violation metrics.  On resume a
partition is skipped iff its manifest matches the current inputs+config;
anything interrupted mid-write leaves no manifest and re-runs.  A
partition whose check pass *errored* writes no manifest either, so
UNKNOWN-producing failures re-run rather than being treated as complete
(SURVEY.md §7.3).

The cross-partition phases (uniqueness, profile merge, verdicts) are
cheap relative to the scan and re-run on every invocation over the
completed partition streams + a pruned input scan.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import pandas as pd
import pyarrow as pa
from ..functions.arrow import table_from_pandas as _table_from_pandas
import pyarrow.parquet as pq

from ..config import ValidationConfig
from ..functions.extract import EXTRACTOR_VERSION
from ..schema import (STREAM_SCHEMA, VIOLATIONS_SCHEMA, check_conformance,
                      ensure_parquet_dir)

MANIFEST_NAME = "manifest.json"


def config_fingerprint(cfg: ValidationConfig) -> str:
    payload = json.dumps(
        {k: (sorted(v.items()) if isinstance(v, dict) else v)
         for k, v in vars(cfg).items()},
        sort_keys=True, default=str,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _input_lineage(files: list[str]) -> list[dict]:
    # (size, mtime) is the invalidation key: an in-place rewrite that
    # keeps the byte size still bumps mtime, so the partition re-runs
    return [
        {"path": f, "size": os.path.getsize(f),
         "mtime_ns": os.stat(f).st_mtime_ns}
        for f in sorted(files)
    ]


def partition_inputs(input_path: str, files_per_partition: int = 1) -> list[list[str]]:
    """Deterministic partitioning of an input directory into file groups."""
    if os.path.isdir(input_path):
        files = sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".parquet")
        )
    else:
        files = [input_path]
    return [
        files[i : i + files_per_partition]
        for i in range(0, len(files), files_per_partition)
    ]


def partition_id(files: list[str]) -> str:
    return hashlib.sha256("\n".join(sorted(files)).encode()).hexdigest()[:12]


def manifest_is_valid(part_dir: str, files: list[str], cfg_fp: str) -> bool:
    mpath = os.path.join(part_dir, MANIFEST_NAME)
    if not os.path.exists(mpath):
        return False
    try:
        with open(mpath) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return (
        m.get("status") == "complete"
        and m.get("config_fingerprint") == cfg_fp
        and m.get("extractor_version") == EXTRACTOR_VERSION
        and m.get("inputs") == _input_lineage(files)
    )


class StageCache:
    """Content-addressed per-stage Dataset cache — the Nextflow
    ``-resume`` analog (``/root/reference/nextflow.config:14``) for
    expensive CHAIN INTERMEDIATES (VERDICT r3 #2): the materialized
    MinHash band-key Dataset and verified LSH pair set in
    ``minhash_lsh_pairs``, and the packed-span table in
    ``curate_corpus``.  A 100-TB dedup run that dies at 90% resumes
    from the last published stage instead of restarting from zero.

    Each stage lives at ``<root>/<stage>-<fp>/`` where ``fp``
    fingerprints the INPUT LINEAGE (file paths + sizes + mtimes — the
    same invalidation key as the validate-scan manifests) plus the
    stage's semantic parameters.  A stage directory is published
    ATOMICALLY (temp dir + data write + manifest, then one rename), so
    a crash mid-write leaves no manifest and the stage re-runs; a crash
    BETWEEN stages resumes with every published stage served from disk.
    ``hits`` / ``computed`` record per-run provenance (test +
    observability surface).
    """

    def __init__(self, root: str, inputs: list[str] | None = None):
        self.root = root
        self.inputs = list(inputs or [])
        self.hits: list[str] = []
        self.computed: list[str] = []
        # test hook: raise AFTER a named stage publishes, simulating a
        # crash between stages (mirrors run_partitioned_validation's
        # _fault_after)
        self._fault_after_put: str | None = None
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, stage: str, params: dict) -> str:
        payload = json.dumps(
            {"stage": stage, "params": params,
             "inputs": _input_lineage(self.inputs)},
            sort_keys=True, default=str)
        fp = hashlib.sha256(payload.encode()).hexdigest()[:16]
        return os.path.join(self.root, f"{stage}-{fp}")

    def lookup(self, stage: str, params: dict):
        """The cached Dataset for (stage, params) or None.  Only a
        directory holding a complete manifest counts — data without a
        manifest (any interrupted write) is recomputed."""
        import ray.data as rd

        d = self._stage_dir(stage, params)
        mpath = os.path.join(d, MANIFEST_NAME)
        if not os.path.exists(mpath):
            return None
        try:
            with open(mpath) as f:
                m = json.load(f)
        except (OSError, json.JSONDecodeError):
            return None
        if m.get("status") != "complete":
            return None
        self.hits.append(stage)
        return rd.read_parquet(os.path.join(d, "data"))

    def put(self, stage: str, params: dict, ds):
        """Persist ``ds`` atomically; return a Dataset reading the
        PERSISTED copy, so downstream consumers never re-execute the
        producing pipeline."""
        import ray.data as rd

        d = self._stage_dir(stage, params)
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(d, ignore_errors=True)
        data_dir = os.path.join(tmp, "data")
        ds.write_parquet(data_dir)
        os.makedirs(data_dir, exist_ok=True)
        if not any(f.endswith(".parquet") for f in os.listdir(data_dir)):
            # 0-row results write no files; back-fill one empty file so
            # the cached dir stays readable (the empty-input contract).
            # schema() re-executes the plan, but only ever for a 0-row
            # result — the populated path never pays it.
            schema = ds.schema()
            fields = []
            for n, t in zip(schema.names, schema.types):
                if isinstance(t, pa.DataType):
                    fields.append((n, t))
                else:
                    try:
                        fields.append((n, pa.from_numpy_dtype(t)))
                    except (pa.ArrowNotImplementedError, TypeError):
                        fields.append((n, pa.string()))
            ensure_parquet_dir(data_dir, pa.schema(fields))
        with open(os.path.join(tmp, MANIFEST_NAME), "w") as f:
            json.dump({"status": "complete", "stage": stage,
                       "params": {k: str(v) for k, v in sorted(params.items())},
                       "inputs": _input_lineage(self.inputs)},
                      f, indent=2, sort_keys=True)
        os.replace(tmp, d)  # atomic publish
        self.computed.append(stage)
        if self._fault_after_put == stage:
            raise RuntimeError(f"injected fault after stage {stage!r}")
        return rd.read_parquet(os.path.join(d, "data"))

    def get_or_compute(self, stage: str, params: dict, compute):
        """Serve (stage, params) from cache, else run ``compute()`` (a
        zero-arg callable returning a Dataset) and publish its result."""
        got = self.lookup(stage, params)
        if got is not None:
            return got
        return self.put(stage, params, compute())


def run_partitioned_validation(
    input_path: str,
    out_dir: str,
    config: ValidationConfig | None = None,
    reference_profile=None,
    files_per_partition: int = 1,
    _fault_after: int | None = None,
):
    """Resumable validation over a parquet directory.

    Phase 1 (checkpointed): per input-file-group, run the single-pass
    check/profile scan and persist its derived stream + manifest.
    Phase 2 (recomputed each run): uniqueness over the pruned input,
    profile merge, verdicts, violations, report — all derived from the
    tiny streams.

    ``_fault_after`` is a test hook: raise after N freshly-computed
    partitions to simulate a mid-run crash.

    Returns (ValidationResult, stats) where stats counts skipped/computed
    partitions.
    """
    import ray.data as rd

    from ..pipelines.validate import (
        ValidationResult,
        _stream_to_violations,
        violation_counts,
    )
    from ..stages.checks import make_check_fn
    from ..stages.profile import merge_profiles, profile_to_table
    from ..stages.uniqueness import duplicate_urls, duplicates_to_violations
    from ..stages.verdicts import assemble_verdicts

    from ..config import validate_check_names

    cfg = config or ValidationConfig()
    validate_check_names(cfg.checks)
    if reference_profile is not None:
        from dataclasses import replace as _dc_replace

        cfg = _dc_replace(cfg, valid_langs=tuple(reference_profile.valid_langs))
    cfg_fp = config_fingerprint(cfg)
    parts = partition_inputs(input_path, files_per_partition)
    parts_root = os.path.join(out_dir, "partitions")
    os.makedirs(parts_root, exist_ok=True)

    # fail-fast schema gate on EVERY input file (main.nf:49-66 analog) —
    # a cheap metadata read per file, before any compute is spent
    all_files = [f for grp in parts for f in grp]
    for f in all_files:
        check_conformance(pq.read_schema(f))

    computed = skipped = 0
    part_dirs = []
    for grp in parts:
        pid = partition_id(grp)
        part_dir = os.path.join(parts_root, pid)
        part_dirs.append(part_dir)
        if manifest_is_valid(part_dir, grp, cfg_fp):
            skipped += 1
            continue
        if _fault_after is not None and computed >= _fault_after:
            raise RuntimeError(f"injected fault after {computed} partitions")

        tmp_dir = part_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(part_dir, ignore_errors=True)
        stream = rd.read_parquet(grp).map_batches(
            make_check_fn(cfg), batch_size=cfg.batch_size, batch_format="pyarrow"
        )
        stream.repartition(2).write_parquet(os.path.join(tmp_dir, "stream"))
        ensure_parquet_dir(os.path.join(tmp_dir, "stream"), STREAM_SCHEMA)
        # partition metrics for the manifest (lineage + stats)
        import pyarrow.dataset as pads

        st = (
            pads.dataset(os.path.join(tmp_dir, "stream"), format="parquet")
            .to_table(columns=["kind"])
            .column("kind")
            .to_pylist()
        )
        n_viol = sum(1 for k in st if k == "violation")
        n_rows = sum(pq.read_metadata(f).num_rows for f in grp)
        manifest = {
            "status": "complete",
            "partition_id": pid,
            "inputs": _input_lineage(grp),
            "config_fingerprint": cfg_fp,
            "extractor_version": EXTRACTOR_VERSION,
            "n_rows": n_rows,
            "n_stream_violations": n_viol,
        }
        with open(os.path.join(tmp_dir, MANIFEST_NAME), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp_dir, part_dir)  # atomic publish
        computed += 1

    # ---- phase 2: cross-partition assembly (recomputed each run) ---------
    stream_files = [
        os.path.join(d, "stream", f)
        for d in part_dirs
        for f in sorted(os.listdir(os.path.join(d, "stream")))
        if f.endswith(".parquet")
    ]
    stream_ds = rd.read_parquet(stream_files)
    viol_dir = os.path.join(out_dir, "violations")
    shutil.rmtree(viol_dir, ignore_errors=True)

    viol_ds = stream_ds.map_batches(_stream_to_violations, batch_format="pyarrow")
    dups = None
    if "uniqueness_url" in cfg.checks:
        dups = duplicate_urls(all_files, cfg).materialize()
        sev = cfg.severity("uniqueness_url")
        viol_ds = viol_ds.union(
            dups.map_batches(
                lambda t: duplicates_to_violations(t, severity=sev),
                batch_format="pyarrow",
            )
        )
    viol_ds.write_parquet(viol_dir)
    ensure_parquet_dir(viol_dir, VIOLATIONS_SCHEMA)

    counts_df = violation_counts(viol_dir)
    profiles = merge_profiles(stream_ds, cfg)
    verdicts = assemble_verdicts(profiles, counts_df, cfg, reference_profile)
    profile_tbl = profile_to_table(profiles)
    pq.write_table(
        _table_from_pandas(verdicts, preserve_index=False),
        os.path.join(out_dir, "verdicts.parquet"),
    )
    pq.write_table(profile_tbl, os.path.join(out_dir, "profile.parquet"))

    report = {
        "extractor_version": EXTRACTOR_VERSION,
        "config_fingerprint": cfg_fp,
        "n_rows": int(sum(p["n_rows"] for p in profiles.values())),
        "n_violations": int(counts_df["n_violations"].sum()) if len(counts_df) else 0,
        "partitions_total": len(parts),
        "partitions_computed": computed,
        "partitions_skipped": skipped,
    }
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)

    result = ValidationResult(
        out_dir=out_dir, verdicts=verdicts, profile=profile_tbl,
        config=cfg, reference=reference_profile, report=report,
    )
    return result, {"computed": computed, "skipped": skipped, "total": len(parts)}
