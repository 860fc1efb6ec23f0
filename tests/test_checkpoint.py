"""Resume tests (SURVEY.md §5.6): kill after k partitions, rerun, assert
identical final outputs and that completed partitions were skipped."""

import os

import pandas as pd
import pytest

from cckp_toolkit_workflow_ray.config import ValidationConfig
from cckp_toolkit_workflow_ray.state.checkpoint import (
    manifest_is_valid,
    partition_id,
    partition_inputs,
    run_partitioned_validation,
)


@pytest.fixture(scope="module")
def multi_file_pages(ray_session, tmp_path_factory):
    """A pages dir with several parquet files (one partition each)."""
    from cckp_toolkit_workflow_ray.sources.pages import generate_pages_dataset

    out = str(tmp_path_factory.mktemp("pages_parts"))
    generate_pages_dataset(6000, override_num_blocks=6).repartition(6).write_parquet(out)
    return out


def _mtimes(out_dir):
    root = os.path.join(out_dir, "partitions")
    out = {}
    for pid in os.listdir(root):
        for base, _, files in os.walk(os.path.join(root, pid)):
            for f in files:
                p = os.path.join(base, f)
                out[p] = os.path.getmtime(p)
    return out


def test_kill_resume_identical_outputs(ray_session, multi_file_pages, tmp_path_factory):
    cfg = ValidationConfig()
    clean_dir = str(tmp_path_factory.mktemp("ckpt_clean"))
    res_clean, stats = run_partitioned_validation(multi_file_pages, clean_dir, cfg)
    assert stats["computed"] == stats["total"] > 1

    # crash after 2 partitions
    crash_dir = str(tmp_path_factory.mktemp("ckpt_crash"))
    with pytest.raises(RuntimeError, match="injected fault"):
        run_partitioned_validation(multi_file_pages, crash_dir, cfg, _fault_after=2)
    done_before = _mtimes(crash_dir)
    assert len(os.listdir(os.path.join(crash_dir, "partitions"))) == 2

    # resume: completed partitions skipped (files untouched), rest computed
    res2, stats2 = run_partitioned_validation(multi_file_pages, crash_dir, cfg)
    assert stats2["skipped"] == 2
    assert stats2["computed"] == stats2["total"] - 2
    after = _mtimes(crash_dir)
    for p, t in done_before.items():
        assert after[p] == t, f"completed partition file was rewritten: {p}"

    # final outputs identical to the clean run
    a = res_clean.verdicts.sort_values(["lang", "check"]).reset_index(drop=True)
    b = res2.verdicts.sort_values(["lang", "check"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    va = res_clean.violations().to_pandas()
    vb = res2.violations().to_pandas()
    key = ["url", "lang", "check", "detail"]
    pd.testing.assert_frame_equal(
        va.sort_values(key).reset_index(drop=True)[key],
        vb.sort_values(key).reset_index(drop=True)[key],
    )


def test_config_change_invalidates_manifests(ray_session, multi_file_pages, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt_cfg"))
    _, s1 = run_partitioned_validation(multi_file_pages, out, ValidationConfig())
    # same config -> all skipped
    _, s2 = run_partitioned_validation(multi_file_pages, out, ValidationConfig())
    assert s2["skipped"] == s2["total"] and s2["computed"] == 0
    # different check set -> full recompute
    cfg3 = ValidationConfig(checks=("url_format",))
    _, s3 = run_partitioned_validation(multi_file_pages, out, cfg3)
    assert s3["computed"] == s3["total"]


def test_partition_helpers(multi_file_pages):
    parts = partition_inputs(multi_file_pages)
    assert len(parts) >= 2 and all(len(p) == 1 for p in parts)
    assert partition_id(parts[0]) != partition_id(parts[1])
    assert not manifest_is_valid("/nonexistent", parts[0], "x")


def test_partitioned_matches_monolithic(ray_session, multi_file_pages, tmp_path_factory):
    from cckp_toolkit_workflow_ray.pipelines.validate import validate

    cfg = ValidationConfig()
    mono = validate(multi_file_pages, out_dir=str(tmp_path_factory.mktemp("mono")), config=cfg)
    part, _ = run_partitioned_validation(
        multi_file_pages, str(tmp_path_factory.mktemp("part")), cfg
    )
    a = mono.verdicts.sort_values(["lang", "check"]).reset_index(drop=True)
    b = part.verdicts.sort_values(["lang", "check"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a.drop(columns=["pass_rate"]), b.drop(columns=["pass_rate"]), check_exact=True
    )


def test_errored_partition_leaves_no_manifest_and_reruns(
    ray_session, multi_file_pages, tmp_path_factory
):
    """SURVEY.md §7.3: a partition whose scan ERRORED must not be treated
    as complete.  The structural guarantee is that the manifest is written
    only after a successful stream write + atomic rename — so a partition
    directory holding data but NO manifest (what any mid-compute error,
    crash, or kill leaves behind, whether published or still .tmp) must be
    recomputed on resume and the final outputs must match a clean run."""
    import shutil

    cfg = ValidationConfig()
    clean, _ = run_partitioned_validation(
        multi_file_pages, str(tmp_path_factory.mktemp("ckpt_err_clean")), cfg
    )

    out = str(tmp_path_factory.mktemp("ckpt_err"))
    res1, s1 = run_partitioned_validation(multi_file_pages, out, cfg)
    parts_root = os.path.join(out, "partitions")
    pids = sorted(os.listdir(parts_root))
    # simulate an errored/killed partition two ways:
    # (a) published dir whose manifest is gone (e.g. partially cleaned)
    os.remove(os.path.join(parts_root, pids[0], "manifest.json"))
    # (b) a half-written .tmp dir from a crash mid-rename
    shutil.move(os.path.join(parts_root, pids[1]),
                os.path.join(parts_root, pids[1] + ".tmp"))

    res2, s2 = run_partitioned_validation(multi_file_pages, out, cfg)
    assert s2["computed"] == 2, "both damaged partitions must recompute"
    assert s2["skipped"] == s2["total"] - 2
    pd.testing.assert_frame_equal(
        res2.verdicts.sort_values(["lang", "check"]).reset_index(drop=True),
        clean.verdicts.sort_values(["lang", "check"]).reset_index(drop=True),
    )


# --------------------------------------------------------------- StageCache
# VERDICT r3 #2: resume for the expensive chain intermediates (the
# -resume analog beyond the validate scan).

SF = "/root/testdata/sf0.001"


def _lsh_corpus():
    import pyarrow.parquet as pq

    base = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    near = base[base.doc_id % 10 == 0].copy()
    near["doc_id"] += 10_000_000
    near["text"] = near["text"].map(
        lambda t: "xqzv" + t[t.index(" "):] if " " in t else "xqzv")
    return pd.concat([base, near], ignore_index=True)


def _stage_mtimes(root, prefix):
    out = {}
    for d in os.listdir(root):
        if d.startswith(prefix):
            for base, _, files in os.walk(os.path.join(root, d)):
                for f in files:
                    p = os.path.join(base, f)
                    out[p] = os.path.getmtime(p)
    return out


def test_stage_cache_minhash_kill_after_signature_pass(
        ray_session, tmp_path_factory):
    """Kill right after the signature pass publishes, rerun, assert the
    signature stage is a manifest hit (files untouched), the pair set
    computes fresh, and the output is identical to a cacheless run."""
    import pyarrow as pa
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.dedup import minhash_lsh_pairs
    from cckp_toolkit_workflow_ray.state.checkpoint import StageCache

    corpus = _lsh_corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(corpus, preserve_index=False))
    clean = minhash_lsh_pairs(ds, jaccard_threshold=0.5)
    assert len(clean) > 0

    root = str(tmp_path_factory.mktemp("stage_cache_lsh"))
    inputs = [f"{SF}/documents.parquet"]
    c1 = StageCache(root, inputs=inputs)
    c1._fault_after_put = "minhash_bands"
    with pytest.raises(RuntimeError, match="injected fault"):
        minhash_lsh_pairs(ds, jaccard_threshold=0.5, cache=c1)
    assert c1.computed == ["minhash_bands"] and c1.hits == []
    band_files_before = _stage_mtimes(root, "minhash_bands-")
    assert band_files_before, "signature stage must have published"

    # resume: signature stage skipped (manifest hit, files untouched)
    c2 = StageCache(root, inputs=inputs)
    out2 = minhash_lsh_pairs(ds, jaccard_threshold=0.5, cache=c2)
    assert c2.hits == ["minhash_bands"]
    assert c2.computed == ["minhash_verified_pairs"]
    band_files_after = _stage_mtimes(root, "minhash_bands-")
    assert band_files_after == band_files_before
    pd.testing.assert_frame_equal(out2, clean)

    # third run: full hit — the whole pipeline is skipped
    c3 = StageCache(root, inputs=inputs)
    out3 = minhash_lsh_pairs(ds, jaccard_threshold=0.5, cache=c3)
    assert c3.hits == ["minhash_verified_pairs"] and c3.computed == []
    pd.testing.assert_frame_equal(out3, clean)

    # changed verify param: signature stage still hits, pairs recompute
    c4 = StageCache(root, inputs=inputs)
    out4 = minhash_lsh_pairs(ds, jaccard_threshold=0.9, cache=c4)
    assert "minhash_bands" in c4.hits
    assert c4.computed == ["minhash_verified_pairs"]
    assert set(zip(out4.id_a, out4.id_b)) <= set(zip(clean.id_a, clean.id_b))


def test_stage_cache_curate_resume(ray_session, tmp_path_factory):
    """curate_corpus: the packed-span table (output of the whole
    filter->dedup->cap->pack chain) checkpoints; a resumed run recomputes
    only the per-lang rollup and matches the cacheless result."""
    from cckp_toolkit_workflow_ray.pipelines.queries import curate_corpus
    from cckp_toolkit_workflow_ray.state.checkpoint import StageCache

    def norm(df):
        return df.sort_values("lang", na_position="last").reset_index(drop=True)

    clean = norm(curate_corpus(SF))
    root = str(tmp_path_factory.mktemp("stage_cache_curate"))
    inputs = [f"{SF}/documents.parquet"]

    c1 = StageCache(root, inputs=inputs)
    out1 = norm(curate_corpus(SF, cache=c1))
    assert c1.computed == ["curate_packed_spans"] and c1.hits == []
    pd.testing.assert_frame_equal(out1, clean)

    spans_before = _stage_mtimes(root, "curate_packed_spans-")
    c2 = StageCache(root, inputs=inputs)
    out2 = norm(curate_corpus(SF, cache=c2))
    assert c2.hits == ["curate_packed_spans"] and c2.computed == []
    assert _stage_mtimes(root, "curate_packed_spans-") == spans_before
    pd.testing.assert_frame_equal(out2, clean)


def test_stage_cache_input_lineage_invalidates(ray_session, tmp_path):
    """The stage fingerprint covers input lineage (path+size+mtime): an
    in-place rewrite of an input re-runs the stage; identical inputs and
    params hit; different params miss."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from cckp_toolkit_workflow_ray.state.checkpoint import StageCache

    inp = str(tmp_path / "in.parquet")
    pq.write_table(pa.table({"x": [1, 2, 3]}), inp)
    root = str(tmp_path / "cache")

    def compute():
        return rd.from_arrow(pa.table({"x": [1, 2, 3]}))

    c1 = StageCache(root, inputs=[inp])
    c1.get_or_compute("s", {"p": 1}, compute)
    assert c1.computed == ["s"]

    c2 = StageCache(root, inputs=[inp])
    got = c2.get_or_compute("s", {"p": 1}, compute)
    assert c2.hits == ["s"] and c2.computed == []
    assert sorted(got.to_pandas()["x"]) == [1, 2, 3]

    # param change -> recompute
    c3 = StageCache(root, inputs=[inp])
    c3.get_or_compute("s", {"p": 2}, compute)
    assert c3.computed == ["s"]

    # in-place rewrite (same bytes, newer mtime) -> recompute
    time.sleep(0.01)
    pq.write_table(pa.table({"x": [1, 2, 3]}), inp)
    c4 = StageCache(root, inputs=[inp])
    c4.get_or_compute("s", {"p": 1}, compute)
    assert c4.computed == ["s"] and c4.hits == []
