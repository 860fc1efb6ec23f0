"""Command-line entry point — the ``nextflow run main.nf --...`` analog.

Submit to a cluster with ``ray job submit -- python -m
cckp_toolkit_workflow_ray.cli validate --input ... --out ...`` (the
driver then connects to the cluster address from the job env), or run
standalone where it starts a local Ray session.

Subcommands mirror the reference's entry points:

* ``validate``   — full pipeline over a pages dir (main.nf:75-137)
* ``check``      — one check standalone (AnalyzeJOSSCriteria.nf:43-61)
* ``profile``    — build a reference profile from a clean corpus
* ``generate``   — write a deterministic synthetic pages fixture
* the reference's fail-fast param validation (main.nf:49-59) maps to
  argparse ``required=`` + the engine's schema gate.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import os

    import ray

    from .logfilter import (install_empty_column_size_filter,
                            make_worker_setup_hook)

    install_empty_column_size_filter()
    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR",
                      runtime_env={"worker_process_setup_hook":
                                   make_worker_setup_hook()})
        # honor a cluster address from the job environment (ray job
        # submit); default to a fresh local instance otherwise.  num_cpus
        # is only legal when STARTING a local instance — passing it while
        # connecting to an existing cluster raises in ray.init
        address = os.environ.get("RAY_ADDRESS", "local")
        if num_cpus is not None and address == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(address=address, **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="cckp-ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pv = sub.add_parser("validate", help="run the full validation DAG")
    pv.add_argument("--input", required=True, help="pages parquet dir/file")
    pv.add_argument("--out", required=True)
    pv.add_argument("--reference", help="reference profile JSON (drift baseline)")
    pv.add_argument("--resume", action="store_true",
                    help="partitioned, checkpointed run (skips completed partitions)")
    pv.add_argument("--checks", default=None,
                    help="comma-separated check names (default: full suite; "
                         "opt-in checks like text_min_len must be listed here)")
    pv.add_argument("--min-text-len", type=int, default=None,
                    help="threshold for the text_min_len check")

    pc = sub.add_parser("check", help="run one check standalone")
    pc.add_argument("--name", required=True)
    pc.add_argument("--input", required=True)
    pc.add_argument("--out", required=True)
    pc.add_argument("--reference", help="reference profile JSON")

    pp = sub.add_parser("profile", help="build a reference profile from a clean corpus")
    pp.add_argument("--input", required=True)
    pp.add_argument("--out", required=True, help="output JSON path")

    pg = sub.add_parser("generate", help="write a synthetic pages fixture")
    pg.add_argument("--n", type=int, required=True)
    pg.add_argument("--out", required=True)
    pg.add_argument("--seed", type=int, default=42)
    pg.add_argument("--no-violations", action="store_true")
    pg.add_argument("--drift-lang", default=None)
    pg.add_argument("--drift-factor", type=float, default=1.0)

    args = p.parse_args(argv)
    _ensure_ray(args.num_cpus)

    from .pipelines.validate import build_reference_profile, run_check, validate
    from .stages.profile import ReferenceProfile

    if args.cmd == "validate":
        from .config import ValidationConfig, validate_check_names

        cfg = None
        if args.checks or args.min_text_len is not None:
            kwargs = {}
            if args.checks:
                names = tuple(c.strip() for c in args.checks.split(",") if c.strip())
                validate_check_names(names)   # fail fast (main.nf:49-59 analog)
                kwargs["checks"] = names
            if args.min_text_len is not None:
                kwargs["min_text_len"] = args.min_text_len
            cfg = ValidationConfig(**kwargs)
        ref = ReferenceProfile.load(args.reference) if args.reference else None
        if args.resume:
            from .state.checkpoint import run_partitioned_validation

            res, stats = run_partitioned_validation(
                args.input, args.out, reference_profile=ref, config=cfg
            )
            print(json.dumps({**res.report, **stats}, indent=2, sort_keys=True))
        else:
            res = validate(args.input, out_dir=args.out, reference_profile=ref,
                           config=cfg)
            print(json.dumps(res.report, indent=2, sort_keys=True))
        return 0 if res.overall_verdict() != "FAIL" else 1

    if args.cmd == "check":
        ref = ReferenceProfile.load(args.reference) if args.reference else None
        res = run_check(args.name, args.input, out_dir=args.out,
                        reference_profile=ref)
        print(json.dumps(res.report, indent=2, sort_keys=True))
        return 0 if res.overall_verdict() != "FAIL" else 1

    if args.cmd == "profile":
        ref = build_reference_profile(args.input)
        ref.save(args.out)
        print(json.dumps({"langs": ref.valid_langs, "counts": ref.counts}))
        return 0

    if args.cmd == "generate":
        from .sources.pages import write_pages

        write_pages(args.n, args.out, seed=args.seed,
                    violations=not args.no_violations,
                    drift_lang=args.drift_lang, drift_factor=args.drift_factor)
        print(json.dumps({"n": args.n, "out": args.out}))
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
