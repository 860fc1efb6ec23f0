"""Unit tests for the sorted-run grouped top-k and sequence packing stages,
on fixtures engineered so keys/buckets span block boundaries."""

import numpy as np
import pandas as pd
import pytest


def _topk_reference(df, key_cols, order_cols, ascending, k):
    s = df.sort_values(order_cols, ascending=ascending,
                       kind="mergesort", na_position="last")
    return (s.groupby(key_cols, dropna=False, sort=False)
             .head(k).sort_values(["rid"]).reset_index(drop=True))


@pytest.mark.parametrize("k", [1, 3, 7])
def test_grouped_top_k_matches_pandas(ray_session, k):
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.ranking import grouped_top_k

    rng = np.random.default_rng(7)
    n = 3000
    keys = rng.integers(0, 12, n).astype(float)
    keys[rng.random(n) < 0.05] = np.nan  # NULL key group
    df = pd.DataFrame({
        "grp": keys,
        "val": rng.integers(0, 40, n),  # heavy ties -> tiebreak matters
        "rid": np.arange(n, dtype=np.int64),
    })
    ds = rd.from_pandas(df).repartition(16)
    got = grouped_top_k(ds, ["grp"], ["val", "rid"], k=k,
                        descending=[True, False]).to_pandas()
    got = got.sort_values("rid").reset_index(drop=True)[df.columns.tolist()]
    want = _topk_reference(df, ["grp"], ["val", "rid"],
                           [False, True], k)[df.columns.tolist()]
    pd.testing.assert_frame_equal(got, want)


def test_grouped_top_k_single_giant_group(ray_session):
    """One key spanning every block: driver merge must take the true
    global head-k, not per-block heads."""
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.ranking import grouped_top_k

    n = 500
    df = pd.DataFrame({
        "grp": ["only"] * n,
        "val": np.arange(n, dtype=np.int64)[::-1],
        "rid": np.arange(n, dtype=np.int64),
    })
    ds = rd.from_pandas(df).repartition(8)
    got = grouped_top_k(ds, ["grp"], ["val", "rid"], k=5,
                        descending=[False, False]).to_pandas()
    # smallest 5 vals are rows with val 0..4 == rid n-1..n-5
    assert sorted(got["val"].tolist()) == [0, 1, 2, 3, 4]
    assert len(got) == 5


def test_packed_sequence_spans_matches_cumsum(ray_session):
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.packing import packed_sequence_spans

    rng = np.random.default_rng(11)
    n, seq = 2000, 128
    ntok = rng.integers(0, 90, n).astype(np.int64)
    ntok[rng.random(n) < 0.1] = 0  # zero-token docs
    # non-contiguous, shuffled ids: order is defined by id, not row order
    ids = rng.permutation(np.arange(0, 3 * n, 3, dtype=np.int64))
    df = pd.DataFrame({"doc_id": ids, "n_tokens": ntok})
    ds = rd.from_pandas(df).repartition(16)
    got = packed_sequence_spans(ds, "doc_id", "n_tokens", seq_tokens=seq,
                                bucket_size=97).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)

    ref = df.sort_values("doc_id").reset_index(drop=True)
    off = np.concatenate([[0], np.cumsum(ref["n_tokens"].to_numpy())[:-1]])
    first = off // seq
    last = np.where(ref["n_tokens"] > 0,
                    (off + ref["n_tokens"] - 1) // seq, first)
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["seq_first"].tolist() == first.tolist()
    assert got["seq_last"].tolist() == last.tolist()


def test_packed_sequence_spans_keep_cols(ray_session):
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.packing import packed_sequence_spans

    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "n_tokens": np.full(10, 7, dtype=np.int64),
        "lang": ["en"] * 10,
    })
    got = packed_sequence_spans(
        rd.from_pandas(df), "doc_id", "n_tokens", seq_tokens=10,
        bucket_size=4, keep_cols=["lang"]).to_pandas()
    assert set(got.columns) == {"lang", "doc_id", "n_tokens",
                                "seq_first", "seq_last"}
    got = got.sort_values("doc_id")
    # 7 tokens/doc, 10/seq: doc 1 occupies tokens 7..13 -> seqs 0..1
    assert got["seq_first"].tolist()[:3] == [0, 0, 1]
    assert got["seq_last"].tolist()[:3] == [0, 1, 2]


def test_global_shuffle_is_permutation(ray_session):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    out = m.queries()["global_shuffle"]("/root/testdata/sf0.001")
    import pandas as pd
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    # positions are exactly 0..n-1, each once
    assert sorted(out["pos"].tolist()) == list(range(len(out)))
    # deterministic across runs
    out2 = m.queries()["global_shuffle"]("/root/testdata/sf0.001")
    if not isinstance(out2, pd.DataFrame):
        out2 = out2.to_pandas()
    assert out["pos"].tolist() == out2["pos"].tolist()


def test_truncated_ppm_header_is_decode_failure():
    """A P6 payload ending exactly at the maxval token (no trailing
    whitespace byte) must yield decode failure, not a ValueError from
    np.frombuffer (review r3 finding)."""
    from cckp_toolkit_workflow_ray.stages.multimodal import DecodeImage

    dec = DecodeImage()
    assert dec._decode(b"P6\n13 5\n255") is None
    assert dec._decode(b"P6\n13 5\n255\n") is None  # header ok, no pixels


def test_grouped_top_k_per_group_quota(ray_session):
    """k_table gives each group its own cap; groups absent from the
    table fall back to the scalar k (0 when k is None → dropped)."""
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.ranking import grouped_top_k

    rng = np.random.default_rng(11)
    n = 2000
    df = pd.DataFrame({
        "grp": rng.integers(0, 8, n).astype(np.int64),
        "val": rng.integers(0, 30, n),
        "rid": np.arange(n, dtype=np.int64),
    })
    # quota only for groups 0-5; 6 and 7 are absent from k_table
    k_table = pd.DataFrame({"grp": np.arange(6, dtype=np.int64),
                            "k": np.array([1, 2, 4, 8, 16, 0])})
    ds = rd.from_pandas(df).repartition(16)

    got = grouped_top_k(ds, ["grp"], ["val", "rid"],
                        k_table=k_table).to_pandas()
    got = got.sort_values("rid").reset_index(drop=True)[df.columns.tolist()]
    quota = dict(zip(k_table["grp"], k_table["k"]))
    want = (df.sort_values(["val", "rid"], kind="mergesort")
              .groupby("grp", sort=False, group_keys=False)
              .apply(lambda g: g.head(quota.get(g.name, 0)),
                     include_groups=True)
              .sort_values("rid").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[df.columns.tolist()])
    assert not (got["grp"] >= 6).any()  # absent groups dropped

    # fallback: absent groups get scalar k
    got2 = grouped_top_k(ds, ["grp"], ["val", "rid"], k=3,
                         k_table=k_table).to_pandas()
    counts = got2.groupby("grp").size()
    assert counts.get(6, 0) == 3 and counts.get(7, 0) == 3


def test_grouped_top_k_quota_dataset_side_100k_groups(ray_session):
    """VERDICT r3 #5: a quota side too large to broadcast (100k groups,
    forced via broadcast_limit) is attached by the bucketed LEFT hash
    join regime and must produce the identical result to the broadcast
    regime — including groups absent from the quota (scalar-k fallback)
    and zero-quota groups (dropped)."""
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.ranking import grouped_top_k

    rng = np.random.default_rng(17)
    n_groups = 100_000
    n = 50_000
    df = pd.DataFrame({
        "grp": rng.integers(0, n_groups, n).astype(np.int64),
        "val": rng.integers(0, 1000, n),
        "rid": np.arange(n, dtype=np.int64),
    })
    # quotas 0-3 for even groups only; odd groups fall back to k=1
    even = np.arange(0, n_groups, 2, dtype=np.int64)
    k_table = pd.DataFrame({"grp": even, "k": (even // 2) % 4})
    ds = rd.from_pandas(df).repartition(16)

    small = grouped_top_k(ds, ["grp"], ["val", "rid"], k=1,
                          k_table=k_table).to_pandas()
    # oversized-frame promotion (broadcast_limit forces the join regime)
    joined = grouped_top_k(ds, ["grp"], ["val", "rid"], k=1,
                           k_table=k_table, broadcast_limit=10).to_pandas()
    # explicit Dataset quota side
    ds_side = grouped_top_k(ds, ["grp"], ["val", "rid"], k=1,
                            k_table=rd.from_pandas(k_table).repartition(8)
                            ).to_pandas()

    cols = df.columns.tolist()
    small = small.sort_values("rid").reset_index(drop=True)[cols]
    for other in (joined, ds_side):
        other = other.sort_values("rid").reset_index(drop=True)[cols]
        assert other.dtypes.equals(small.dtypes)
        pd.testing.assert_frame_equal(other, small)

    quota = dict(zip(k_table["grp"], k_table["k"]))
    want = (df.sort_values(["val", "rid"], kind="mergesort")
              .groupby("grp", sort=False, group_keys=False)
              .apply(lambda g: g.head(quota.get(g.name, 1)),
                     include_groups=True)
              .sort_values("rid").reset_index(drop=True))
    pd.testing.assert_frame_equal(small, want[cols])


def test_grouped_budget_fill_matches_window_oracle(ray_session):
    """grouped_budget_fill == SQL running-inclusive-sum <= budget, with
    NaN groups, budget-boundary rows, and pruned buckets."""
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.packing import grouped_budget_fill

    rng = np.random.default_rng(23)
    n = 4000
    grp = rng.integers(0, 5, n).astype(float)
    grp[rng.random(n) < 0.04] = np.nan
    df = pd.DataFrame({
        "g": grp,
        "cost": rng.integers(1, 50, n).astype(np.int64),
        "h": rng.integers(0, 2**32, n).astype(np.int64),  # uniform order key
        "rid": np.arange(n, dtype=np.int64),
    })
    budget = int(df["cost"].sum()) // 20  # small budget -> buckets pruned

    got = grouped_budget_fill(
        rd.from_pandas(df).repartition(16), "g", "cost", "h", "rid",
        budget=budget, n_buckets=16).to_pandas()

    s = df.sort_values(["h", "rid"], kind="mergesort")
    s["run"] = s.groupby("g", dropna=False)["cost"].cumsum()
    want = s[s["run"] <= budget]
    key = lambda d: sorted(map(tuple,
                               d[["g", "rid"]].fillna(-1).to_numpy().tolist()))
    assert key(got) == key(want)
    assert len(got)  # budget > max single cost, so something survives

    # callable budget receives the grand total
    got2 = grouped_budget_fill(
        rd.from_pandas(df).repartition(16), "g", "cost", "h", "rid",
        budget=lambda total: total // 20, n_buckets=16).to_pandas()
    assert key(got2) == key(want)


def test_grouped_budget_fill_zero_cost_at_budget_boundary(ray_session):
    """A zero-cost row whose bucket's base offset EQUALS the budget has
    an inclusive running sum equal to the budget — SQL keeps it, so the
    bucket prune must be <=, not <."""
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.packing import grouped_budget_fill

    width = 2**28  # bucket width at n_buckets=16
    df = pd.DataFrame({
        "g": ["a", "a", "a"],
        "cost": np.array([7, 3, 0], dtype=np.int64),
        "h": np.array([1, 2, width + 1], dtype=np.int64),
        "rid": np.array([0, 1, 2], dtype=np.int64),
    })
    got = grouped_budget_fill(rd.from_pandas(df), "g", "cost", "h", "rid",
                              budget=10, n_buckets=16).to_pandas()
    # runs: 7, 10, 10 -> all three rows satisfy run <= 10
    assert sorted(got["rid"].tolist()) == [0, 1, 2]
