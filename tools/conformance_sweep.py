"""Full-registry conformance sweep: every registered query vs its DuckDB
oracle at sf0.01 (rows + schema + values), timed again at sf0.1.

Reproduces the driver's CORRECTNESS protocol (columns sorted by name,
integer dtypes normalized to int64, floats compared at rtol=1e-12) over
ALL queries, not just the driver's sample.  Queries run in CHUNKS, each
chunk in a fresh subprocess with its own Ray session, so one leaked
actor or session-level regression can't poison the rest and the sweep
is resumable: per-chunk results land in ``--state-dir`` and finished
chunks are skipped on re-run.

Usage:
    python tools/conformance_sweep.py --out CONFORMANCE_SWEEP_r04.json
    python tools/conformance_sweep.py --only minhash_dedup,exact_dedup
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
import ray
sys.path.insert(0, os.environ["SWEEP_REPO"])
from cckp_toolkit_workflow_ray.logfilter import install_empty_column_size_filter, make_worker_setup_hook
install_empty_column_size_filter()
ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR",
         runtime_env={"worker_process_setup_hook": make_worker_setup_hook()})
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, os.environ["SWEEP_REPO"])
import importlib
m = importlib.import_module("__ray_entry__")
qs, osql = m.queries(), m.oracle_sql()

import duckdb, pandas as pd, pyarrow as pa, numpy as np

def connect(sf_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con

def to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith(("int", "uint", "Int", "UInt")):
            df[c] = df[c].astype("int64")
        elif dt.startswith(("float", "Float")):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)

names = json.loads(os.environ["SWEEP_NAMES"])
sf001, sf01 = os.environ["SWEEP_SF001"], os.environ["SWEEP_SF01"]
con = connect(sf001)
out = {}
for name in names:
    entry = {}
    try:
        t0 = time.time()
        rdf = to_df(qs[name](sf001))
        entry["sec_sf0.01"] = round(time.time() - t0, 2)
        entry["rows"] = int(len(rdf))
        if name in osql:
            odf = con.execute(osql[name]).fetchdf()
            a, b = norm(rdf), norm(odf)
            if a.shape != b.shape or list(a.columns) != list(b.columns):
                entry["status"] = "fail"
                entry["detail"] = (f"shape/schema: engine {a.shape} "
                                   f"{list(a.columns)} vs oracle {b.shape} "
                                   f"{list(b.columns)}")
            else:
                try:
                    pd.testing.assert_frame_equal(
                        a, b, check_dtype=False, rtol=1e-12, atol=1e-12)
                    entry["status"] = "pass"
                except AssertionError as e:
                    entry["status"] = "fail"
                    entry["detail"] = str(e).splitlines()[0][:200]
        else:
            entry["status"] = "no_oracle_rows_only"
        t0 = time.time()
        rdf1 = to_df(qs[name](sf01))
        entry["sec_sf0.1"] = round(time.time() - t0, 2)
        entry["rows_sf0.1"] = int(len(rdf1))
    except Exception as e:
        entry["status"] = "error"
        entry["detail"] = f"{type(e).__name__}: {e}"[:300]
    out[name] = entry
    print(f"  {name}: {entry['status']}", flush=True)
ray.shutdown()
with open(os.environ["SWEEP_OUT"], "w") as f:
    json.dump(out, f)
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "CONFORMANCE_SWEEP_r04.json"))
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--only", default="")
    ap.add_argument("--state-dir", default="/tmp/conformance_sweep")
    ap.add_argument("--sf001", default="/root/testdata/sf0.01")
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import importlib

    m = importlib.import_module("__ray_entry__")
    names = sorted(m.queries())
    if args.only:
        want = set(args.only.split(","))
        names = [n for n in names if n in want]
    os.makedirs(args.state_dir, exist_ok=True)

    chunks = [names[i : i + args.chunk] for i in range(0, len(names), args.chunk)]
    merged: dict[str, dict] = {}
    for i, chunk in enumerate(chunks):
        # --only runs always execute fresh and use a side-car state file:
        # reusing a cached full-sweep chunk here served a STALE failure
        # for a since-fixed query, and an --only rerun must never
        # overwrite the resumable full-sweep chunks either
        part = os.path.join(
            args.state_dir,
            f"only_{i:03d}.json" if args.only else f"chunk_{i:03d}.json")
        if os.path.exists(part) and not args.only:
            with open(part) as f:
                got = json.load(f)
            if set(got) == set(chunk):
                print(f"chunk {i}: cached ({len(chunk)} queries)")
                merged.update(got)
                continue
        print(f"chunk {i}: running {len(chunk)} queries "
              f"({chunk[0]}..{chunk[-1]})", flush=True)
        env = dict(os.environ,
                   SWEEP_REPO=REPO, SWEEP_NAMES=json.dumps(chunk),
                   SWEEP_SF001=args.sf001, SWEEP_SF01=args.sf01,
                   SWEEP_OUT=part, RAY_ADDRESS="local")
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           cwd=REPO, timeout=3600)
        if r.returncode != 0:
            print(f"chunk {i} FAILED (exit {r.returncode})", file=sys.stderr)
            return 1
        with open(part) as f:
            merged.update(json.load(f))

    statuses = [v["status"] for v in merged.values()]
    snap = {
        "round": args.round,
        "protocol": ("every registered query run at sf0.01 vs its DuckDB "
                     "oracle (sorted columns, int64-normalized, rtol=1e-12 "
                     "floats) and timed at sf0.1; resumable chunks of "
                     f"{args.chunk} queries per fresh ray session"),
        "n_queries": len(merged),
        "n_pass": statuses.count("pass"),
        "n_no_oracle_rows_only": statuses.count("no_oracle_rows_only"),
        "n_fail": statuses.count("fail") + statuses.count("error"),
        "queries": merged,
    }
    if not args.only:
        with open(args.out, "w") as f:
            json.dump(snap, f, indent=1)
        print(f"wrote {args.out}")
    print(json.dumps({k: snap[k] for k in
                      ("n_queries", "n_pass", "n_no_oracle_rows_only",
                       "n_fail")}))
    bad = {k: v for k, v in merged.items()
           if v["status"] not in ("pass", "no_oracle_rows_only")}
    if bad:
        print("FAILURES:", json.dumps(bad, indent=1))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
