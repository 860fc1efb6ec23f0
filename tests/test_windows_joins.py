"""Unit tests for window and join operators (edge cases beyond the SQL
oracle parity already covered in test_queries_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cckp_toolkit_workflow_ray.stages.joins import (
    asof_join_bucketed,
    broadcast_join,
    hash_join,
    interval_join_bucketed,
    semi_join,
)
from cckp_toolkit_workflow_ray.stages.windows import (
    session_window,
    sliding_window,
    tumbling_window,
)


def _ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


HOUR = 3_600_000_000


@pytest.fixture(scope="module")
def events_df(ray_session):
    ts = pd.to_datetime(
        ["2024-01-01 00:05", "2024-01-01 00:20", "2024-01-01 01:10",
         "2024-01-01 03:00", "2024-01-01 03:10", "2024-01-02 00:00"]
    ).astype("datetime64[us]")
    return pd.DataFrame({
        "key": ["a", "a", "a", "a", "b", "a"],
        "ts": ts,
        "event_id": np.arange(6, dtype=np.int64),
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    })


def test_tumbling_window_counts_and_sums(ray_session, events_df):
    out = tumbling_window(_ds(events_df), "ts", "key", HOUR, value_col="value").to_pandas()
    a0 = out[(out.key == "a") & (out.window_start_us == 1704067200000000)]
    assert a0.n_events.iloc[0] == 2 and a0.sum_value.iloc[0] == 3.0
    assert out.n_events.sum() == 6


def test_sliding_window_membership(ray_session, events_df):
    out = sliding_window(_ds(events_df), "ts", "key", size_us=HOUR, hop_us=HOUR // 2).to_pandas()
    # every event belongs to exactly size/hop = 2 windows
    assert out.n_events.sum() == 12


def test_session_window_gaps(ray_session, events_df):
    out = session_window(_ds(events_df), "ts", "key", gap_us=HOUR,
                         order_cols=["event_id"]).to_pandas()
    a = out[out.key == "a"].sort_values("session_start_us")
    # a: (00:05,00:20,01:10) one session; (03:00) next; (next day) third
    assert len(a) == 3
    assert a.iloc[0].n_events == 3 and a.iloc[1].n_events == 1 and a.iloc[2].n_events == 1
    assert len(out[out.key == "b"]) == 1


def test_broadcast_and_semi_join(ray_session):
    left = pd.DataFrame({"k": [1, 2, 3, 4], "x": list("abcd")})
    dim = pd.DataFrame({"k": [2, 4], "name": ["two", "four"]})
    j = broadcast_join(_ds(left), dim, on="k").to_pandas().sort_values("k")
    assert j.k.tolist() == [2, 4] and j.name.tolist() == ["two", "four"]
    lj = broadcast_join(_ds(left), dim, on="k", how="left").to_pandas()
    assert len(lj) == 4 and lj.name.isna().sum() == 2
    s = semi_join(_ds(left), [2, 4], on="k").to_pandas()
    assert sorted(s.k) == [2, 4]
    a = semi_join(_ds(left), [2, 4], on="k", anti=True).to_pandas()
    assert sorted(a.k) == [1, 3]


def test_hash_join_matches_pandas(ray_session):
    rng = np.random.default_rng(0)
    left = pd.DataFrame({"k": rng.integers(0, 50, 500), "x": rng.integers(0, 9, 500)})
    right = pd.DataFrame({"k": np.arange(0, 60, 2), "y": np.arange(30) * 10})
    got = hash_join(_ds(left), _ds(right), on="k", n_buckets=7).to_pandas()
    want = left.merge(right, on="k")
    key = ["k", "x", "y"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_asof_join_bucketed_matches_merge_asof(ray_session):
    rng = np.random.default_rng(1)
    base = pd.Timestamp("2024-01-01").to_datetime64().astype("datetime64[us]")
    left = pd.DataFrame({
        "k": rng.integers(0, 10, 200),
        "ts": base + rng.integers(0, 10**9, 200).astype("timedelta64[us]"),
        "event_id": np.arange(200, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 10, 80),
        "rts": base + rng.integers(0, 10**9, 80).astype("timedelta64[us]"),
    })
    got = asof_join_bucketed(_ds(left), _ds(right), key="k", ts="ts",
                             right_ts="rts", right_cols=[], n_buckets=4).to_pandas()
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("rts", kind="mergesort"),
        left_on="ts", right_on="rts", by="k",
    )
    g = got.sort_values("event_id").reset_index(drop=True)
    w = want.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(
        pd.to_datetime(g["rts"]), pd.to_datetime(w["rts"]), check_names=False
    )

def test_hash_join_preserves_int_dtypes(ray_session):
    # VERDICT r1: union NaN-padding degraded int64 -> float64, losing ulp
    # precision on large sums (revenue_e4 ~1e14).  Joined int columns must
    # come back integral even when some buckets hold only one side.
    left = pd.DataFrame({
        "k": np.arange(100, dtype=np.int64),
        "big": np.int64(10_000_000_000_000) + np.arange(100, dtype=np.int64),
    })
    # right matches only even keys: odd-key rows land in buckets that may
    # contain left-only rows
    right = pd.DataFrame({"k": np.arange(0, 100, 2, dtype=np.int64),
                          "w": np.arange(50, dtype=np.int64) * 7})
    got = hash_join(_ds(left), _ds(right), on="k", n_buckets=5).to_pandas()
    assert pd.api.types.is_integer_dtype(got["big"].dtype), got.dtypes
    assert pd.api.types.is_integer_dtype(got["w"].dtype), got.dtypes
    assert got["big"].sum() == left[left.k % 2 == 0]["big"].sum()


def test_hash_join_left_pads_right_ints_nullably(ray_session):
    left = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                         "x": np.arange(10, dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([0, 1], dtype=np.int64),
                          "w": np.array([5, 6], dtype=np.int64)})
    got = hash_join(_ds(left), _ds(right), on="k", n_buckets=3,
                    how="left").to_pandas()
    assert len(got) == 10
    assert got["w"].isna().sum() == 8
    # matched values exact
    assert got.set_index("k")["w"].dropna().astype("int64").to_dict() == {0: 5, 1: 6}


def test_semi_join_empty_keyset(ray_session):
    # ADVICE r1: empty broadcast key set crashed on valid[pos]
    left = pd.DataFrame({"k": [1, 2, 3], "x": list("abc")})
    s = semi_join(_ds(left), [], on="k").to_pandas()
    assert len(s) == 0
    a = semi_join(_ds(left), [], on="k", anti=True).to_pandas()
    assert sorted(a.k) == [1, 2, 3]


def test_interval_join_bucketed_matches_bruteforce(ray_session):
    rng = np.random.default_rng(5)
    base = pd.Timestamp("2024-01-01").to_datetime64().astype("datetime64[us]")
    left = pd.DataFrame({
        "event_id": np.arange(500, dtype=np.int64),
        "ts": base + rng.integers(0, 10**10, 500).astype("timedelta64[us]"),
    })
    starts = base + rng.integers(0, 10**10, 60).astype("timedelta64[us]")
    # intervals of varying length, some spanning many buckets
    right = pd.DataFrame({
        "window_id": np.arange(60, dtype=np.int64),
        "w_start": starts,
        "w_end": starts + rng.integers(1, 4 * 10**9, 60).astype("timedelta64[us]"),
    })
    got = interval_join_bucketed(
        _ds(left), _ds(right), "ts", "w_start", "w_end",
        bucket_us=10**9, right_cols=["window_id"]).to_pandas()
    want = left.merge(right, how="cross")
    want = want[(want.ts >= want.w_start) & (want.ts < want.w_end)]
    key = ["event_id", "window_id"]
    assert sorted(map(tuple, got[key].to_numpy())) == \
        sorted(map(tuple, want[key].to_numpy()))


def test_interval_join_empty_right(ray_session):
    base = pd.Timestamp("2024-01-01").to_datetime64().astype("datetime64[us]")
    left = pd.DataFrame({"event_id": np.arange(5, dtype=np.int64),
                         "ts": base + np.arange(5).astype("timedelta64[us]")})
    right = pd.DataFrame({
        "window_id": pd.Series([], dtype="int64"),
        "w_start": pd.Series([], dtype="datetime64[us]"),
        "w_end": pd.Series([], dtype="datetime64[us]"),
    })
    got = interval_join_bucketed(_ds(left), _ds(right), "ts", "w_start",
                                 "w_end", bucket_us=10**9,
                                 right_cols=["window_id"]).to_pandas()
    assert len(got) == 0


def test_salted_distinct_count_exact(ray_session):
    from cckp_toolkit_workflow_ray.stages.groupagg import salted_distinct_count

    rng = np.random.default_rng(2)
    n = 5000
    df = pd.DataFrame({
        "k": np.array(["hot"] * (n - 100) + ["cold"] * 100),  # skewed key
        "u": np.concatenate([rng.integers(0, 700, n - 100),
                             rng.integers(0, 50, 100)]).astype(np.int64),
    })
    # some NULL entities must not count (SQL semantics)
    df.loc[df.index[:10], "u"] = pd.NA
    df["u"] = df["u"].astype("Int64")
    got = salted_distinct_count(_ds(df), "k", "u", n_salts=16).to_pandas()
    want = df.dropna(subset=["u"]).groupby("k")["u"].nunique()
    assert dict(zip(got["k"], got["n_distinct"])) == want.to_dict()


def test_interval_join_null_bounds_never_explode(ray_session):
    # review r2: NaT -> iNaT wraps via `e - 1` to +2^63-1 and the
    # replication count for one row became ~10^9; null bounds must simply
    # never match
    base = pd.Timestamp("2024-01-01").to_datetime64().astype("datetime64[us]")
    left = pd.DataFrame({"event_id": np.arange(10, dtype=np.int64),
                         "ts": base + np.arange(10).astype("timedelta64[us]")})
    right = pd.DataFrame({
        "window_id": np.array([1, 2, 3], dtype=np.int64),
        "w_start": [base, pd.NaT, base],
        "w_end": [base + np.timedelta64(100, "us"), base, pd.NaT],
    })
    got = interval_join_bucketed(_ds(left), _ds(right), "ts", "w_start",
                                 "w_end", bucket_us=10**9,
                                 right_cols=["window_id"]).to_pandas()
    # only window 1 (valid bounds) matches; 2 and 3 are dropped
    assert set(got["window_id"]) == {1}
    assert len(got) == 10


def test_salted_distinct_count_multiblock_nullable_ints(ray_session):
    # review r2: the salt hash must not depend on whether a given BATCH
    # contains nulls (int64 vs float64 pandas dtype) — the same entity
    # must land in the same salt in every block
    from cckp_toolkit_workflow_ray.stages.groupagg import salted_distinct_count

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame({
        "k": np.where(rng.random(n) < 0.9, "hot", "cold"),
        "u": pd.array(rng.integers(0, 300, n), dtype="Int64"),
    })
    # nulls only in SOME regions -> after repartition some blocks are
    # null-free (int64) and some have nulls (float64/object)
    df.loc[df.index[:40], "u"] = pd.NA
    ds = _ds(df).repartition(8)
    got = salted_distinct_count(ds, "k", "u", n_salts=16).to_pandas()
    want = df.dropna(subset=["u"]).groupby("k")["u"].nunique()
    assert dict(zip(got["k"], got["n_distinct"])) == want.to_dict()


def test_hash_join_exact_beyond_2_53(ray_session):
    # review r2: plain-int NaN padding round-trips through float64 and
    # corrupts magnitudes >= 2^53; the nullable-extension upcast before
    # the union must keep the full int64 range exact
    big = np.int64(2**62) + np.arange(40, dtype=np.int64) * 7
    left = pd.DataFrame({"k": np.arange(40, dtype=np.int64), "big": big})
    right = pd.DataFrame({"k": np.arange(0, 40, 2, dtype=np.int64),
                          "w": np.arange(20, dtype=np.int64)})
    got = hash_join(_ds(left), _ds(right), on="k", n_buckets=5).to_pandas()
    want = left.merge(right, on="k")
    assert sorted(got["big"].astype("int64")) == sorted(want["big"])


def test_exact_grouped_quantiles_matches_numpy(ray_session):
    from cckp_toolkit_workflow_ray.stages.groupagg import exact_grouped_quantiles

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"k": rng.choice(["a", "b"], 3000),
                       "v": rng.integers(0, 50, 3000).astype(np.int64)})
    got = exact_grouped_quantiles(_ds(df).repartition(6), "k", "v",
                                  [0.25, 0.5, 0.9])
    import math
    for _, r in got.iterrows():
        vals = np.sort(df[df.k == r["k"]]["v"].to_numpy())
        for q, col in [(0.25, "q25"), (0.5, "q50"), (0.9, "q90")]:
            want = vals[max(1, math.ceil(q * vals.size)) - 1]
            assert r[col] == want, (r["k"], q, r[col], want)


def test_interval_join_all_null_bound_batch(ray_session):
    # ADVICE r2: a right-side batch containing ONLY null-bound rows left
    # tag_right with offsets of length 1 vs reps of length 0 and crashed
    # np.repeat; after the exclusive-prefix-sum fix it must simply emit
    # nothing (never-abort rule)
    base = pd.Timestamp("2024-01-01").to_datetime64().astype("datetime64[us]")
    left = pd.DataFrame({"event_id": np.arange(5, dtype=np.int64),
                         "ts": base + np.arange(5).astype("timedelta64[us]")})
    right = pd.DataFrame({
        "window_id": np.array([1, 2], dtype=np.int64),
        "w_start": [pd.NaT, base],
        "w_end": [base, pd.NaT],
    })
    got = interval_join_bucketed(_ds(left), _ds(right), "ts", "w_start",
                                 "w_end", bucket_us=10**9,
                                 right_cols=["window_id"]).to_pandas()
    assert len(got) == 0


def test_sorted_sum_by_key_matches_bruteforce_with_nulls(ray_session):
    """Review r3: the sorted-run keyed sum must be exact across many
    blocks AND must not drop the NULL-key group (NaN defeats `==`-based
    edge detection)."""
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.groupagg import sorted_sum_by_key

    rng = np.random.default_rng(23)
    n = 20000
    keys = rng.integers(0, 500, n).astype("float64")
    keys[rng.random(n) < 0.05] = np.nan  # a NULL-key group
    df = pd.DataFrame({"k": keys, "v": rng.integers(0, 100, n)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(16)
    got = sorted_sum_by_key(ds, ["k"], ["v"])
    want = df.groupby("k", dropna=False, as_index=False)["v"].sum() \
        .sort_values("k").reset_index(drop=True)
    g = got.sort_values("k").reset_index(drop=True)
    assert len(g) == len(want)
    # NaN group present and exact
    nan_got = g[g["k"].isna()]["v"].sum()
    nan_want = want[want["k"].isna()]["v"].sum()
    assert nan_got == nan_want and nan_want > 0
    nn_g = g[g["k"].notna()]
    nn_w = want[want["k"].notna()]
    assert (nn_g["k"].to_numpy() == nn_w["k"].to_numpy()).all()
    assert (nn_g["v"].to_numpy() == nn_w["v"].to_numpy()).all()


def test_sorted_sum_by_key_composite_keys(ray_session):
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.groupagg import sorted_sum_by_key

    rng = np.random.default_rng(29)
    n = 5000
    df = pd.DataFrame({
        "a": rng.integers(0, 40, n),
        "b": rng.integers(0, 10, n),
        "v": rng.integers(0, 1000, n),
        "w": rng.integers(0, 7, n),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(9)
    got = sorted_sum_by_key(ds, ["a", "b"], ["v", "w"])
    want = df.groupby(["a", "b"], as_index=False)[["v", "w"]].sum() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_values(["a", "b"]).reset_index(drop=True).astype("int64"),
        want.astype("int64"))


def test_session_window_multiblock_matches_bruteforce(ray_session):
    """The sorted-run sessionizer must agree with a single-frame pandas
    sessionization across many blocks, and numeric NULL keys are dropped
    (functions/nulls.py policy)."""
    from cckp_toolkit_workflow_ray.stages.windows import session_window

    rng = np.random.default_rng(31)
    n = 12000
    base = pd.Timestamp("2024-01-01").value // 1000
    users = rng.integers(0, 800, n).astype("float64")
    users[rng.random(n) < 0.02] = np.nan
    ts_us = base + rng.integers(0, 3 * 24 * 3600 * 10**6, n)
    df = pd.DataFrame({
        "user_id": users,
        "ts": ts_us.astype("datetime64[us]"),
        "event_id": np.arange(n, dtype=np.int64),
    })
    gap = 1800 * 10**6
    got = session_window(_ds(df), "ts", "user_id", gap_us=gap,
                         order_cols=["event_id"]).to_pandas()
    # brute force on non-null users
    d = df[df["user_id"].notna()].copy()
    d["_us"] = d["ts"].astype("datetime64[us]").astype("int64")
    d = d.sort_values(["user_id", "_us", "event_id"])
    rows = []
    for u, g in d.groupby("user_id"):
        us = g["_us"].to_numpy()
        new = np.ones(len(g), bool)
        new[1:] = (us[1:] - us[:-1]) > gap
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(g)) - 1
        for s, e in zip(starts, ends):
            rows.append((u, us[s], us[e], e - s + 1))
    want = pd.DataFrame(rows, columns=["user_id", "session_start_us",
                                       "session_end_us", "n_events"])
    cols = ["user_id", "session_start_us", "session_end_us", "n_events"]
    g2 = got[cols].sort_values(cols).reset_index(drop=True)
    w2 = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g2, w2, check_dtype=False)
    assert not got["user_id"].isna().any()


def test_funnel_conversion_edge_users_across_blocks(ray_session, tmp_path):
    """A user whose funnel rows SPLIT across sorted blocks must resolve
    through the edge-row driver path with the same strictly-later chain
    a pandas brute force computes."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    rng = np.random.default_rng(9)
    n = 6000
    users = rng.integers(0, 40, n)  # few users, many rows -> split users
    types = rng.choice(["view", "click", "purchase", "error"], n)
    ts = pd.to_datetime(
        rng.integers(1_600_000_000, 1_600_900_000, n), unit="s")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts.astype("datetime64[us]"),
        "user_id": users.astype(np.int64),
        "event_type": types,
        "value": rng.normal(size=n),
        "props": ['{"k": 1}'] * n,
    })
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{d}/events.parquet")

    got = entrymod.queries()["funnel_conversion"](d)

    us = df.copy()
    us["_us"] = us["ts"].astype("int64")
    n1 = n2 = n3 = 0
    for _, g in us.groupby("user_id"):
        t1 = g.loc[g["event_type"] == "view", "_us"].min()
        if pd.isna(t1):
            continue
        n1 += 1
        c = g[(g["event_type"] == "click") & (g["_us"] > t1)]["_us"]
        if c.empty:
            continue
        n2 += 1
        p = g[(g["event_type"] == "purchase") & (g["_us"] > c.min())]
        if len(p):
            n3 += 1
    assert (int(got["n_step1"].iloc[0]), int(got["n_step2"].iloc[0]),
            int(got["n_step3"].iloc[0])) == (n1, n2, n3)


def test_skew_hash_join_matches_plain_hash_join(ray_session):
    """skew_hash_join must be row-identical to hash_join on a skewed
    input (one viral key holding ~half the left rows), with NULL keys,
    for both inner and left joins, and must fall back cleanly when no
    key is hot."""
    import pandas as pd
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.joins import (
        hash_join, skew_hash_join)

    rng = np.random.default_rng(12)
    n = 4000
    k = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 200, n))
    kf = k.astype("float64")
    kf[::191] = np.nan  # NULL keys on the left
    left = pd.DataFrame({"k": kf, "lval": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 200, dtype=np.float64),
                          "rval": np.arange(1000, 1200, dtype=np.int64)})
    lds = rd.from_pandas(left).repartition(6)
    rds = rd.from_pandas(right).repartition(3)

    def norm(ds):
        df = ds.to_pandas()
        df = df[sorted(df.columns)].astype("float64")
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for how in ("inner", "left"):
        want = norm(hash_join(lds, rds, on="k", n_buckets=4, how=how))
        got = norm(skew_hash_join(lds, rds, on="k", hot_limit=500,
                                  n_buckets=4, how=how))
        pd.testing.assert_frame_equal(got, want), how

    # no hot key -> pure fallback, still identical
    got = norm(skew_hash_join(lds, rds, on="k", hot_limit=10**9,
                              n_buckets=4))
    want = norm(hash_join(lds, rds, on="k", n_buckets=4))
    pd.testing.assert_frame_equal(got, want)

    # hot key with NO right match + inner join -> hot slice vanishes
    right2 = rd.from_pandas(right[right["k"] != 7])
    got = norm(skew_hash_join(lds, right2, on="k", hot_limit=500,
                              n_buckets=4))
    want = norm(hash_join(lds, right2, on="k", n_buckets=4))
    pd.testing.assert_frame_equal(got, want)


def test_anti_join_keys_two_regimes_identical(ray_session):
    """anti_join_keys: broadcast isin_sorted regime vs bucketed
    LEFT-join regime produce the identical surviving set, including
    NULL left keys (which match nothing and must SURVIVE)."""
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.joins import anti_join_keys

    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": pd.array(
            [None if i % 17 == 0 else int(rng.integers(0, 400))
             for i in range(1000)], dtype="Int64"),
        "payload": np.arange(1000)})
    probe = pd.DataFrame({"k": np.unique(rng.integers(0, 400, 150))})

    def norm(ds):
        df = ds.to_pandas()
        df["k"] = pd.array(pd.to_numeric(df["k"]), dtype="Int64")
        df["payload"] = df["payload"].astype("int64")
        return df.sort_values(["payload"]).reset_index(drop=True)[
            ["k", "payload"]]

    lds, pds = rd.from_pandas(left), rd.from_pandas(probe)
    got_b = norm(anti_join_keys(lds, pds, on="k",
                                broadcast_limit=10**9))
    got_j = norm(anti_join_keys(lds, pds, on="k", broadcast_limit=0,
                                n_buckets=5))
    pd.testing.assert_frame_equal(got_b, got_j)
    # brute-force truth: NULL keys survive, probe hits drop
    keys = set(probe["k"].tolist())
    want = left[[(pd.isna(k) or k not in keys)
                 for k in left["k"]]].reset_index(drop=True)
    assert got_b["payload"].tolist() == want["payload"].tolist()
