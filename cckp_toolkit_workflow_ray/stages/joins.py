"""Join operators — broadcast, semi/anti, bucketed hash join, as-of.

The reference's only joins are small keyed ``combine``s
(``/root/reference/main.nf:100-102,120-121``) that the engine's
single-pipeline restructuring eliminates (SURVEY.md §2.5 J1).  These
operators cover the cases a web-scale pipeline still genuinely needs:

* **broadcast join / semi / anti** — small side ``ray.put`` once, looked
  up per batch with numpy ``searchsorted`` / pandas merge.  No shuffle.
* **bucketed hash join** — both sides large: add ``bucket = hash(key) %
  B`` to both, tag, union, ``groupby(bucket).map_groups`` does a pandas
  merge per bucket.  B bounds reducer memory (choose B so the larger
  side's per-bucket slice fits a worker); skew: a hot key lands in one
  bucket — pre-aggregate or broadcast that key's side when known.
* **merge_asof per bucket** — as-of/range joins: sort both sides by
  (key, ts) within buckets, ``pd.merge_asof`` per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_strings


def _pd_nullable_dtype(typ):
    """Pandas dtype that survives NaN padding without degrading.

    ``union`` blocks keep their own schema, so a ``map_groups`` group
    assembled from both sides NaN-pads each side's missing columns and
    would silently degrade int64 → float64 (corrupting magnitudes ≥
    2^53).  The tag stages therefore convert ints to pandas NULLABLE
    extension dtypes before the union (``_nullable_int_pandas`` — Ray
    preserves extension dtypes through the shuffle, keeping the full
    int64 range exact); this map is the belt-and-braces restore applied
    after group assembly, and Arrow converts Int64+NA back to int64 on
    output.

    ``typ`` may be a pyarrow DataType (Arrow blocks) or a numpy dtype /
    python type (Ray's PandasBlockSchema for pandas-built datasets)."""
    if isinstance(typ, pa.DataType):
        if pa.types.is_integer(typ):
            # nullable pandas ints: Int8/Int16/Int32/Int64/UInt64...
            return str(typ).capitalize().replace("int", "Int").replace("uInt", "UInt")
        if pa.types.is_boolean(typ):
            return "boolean"
        if pa.types.is_floating(typ):
            return "float64"
        if pa.types.is_timestamp(typ):
            # keep the timezone — astype('datetime64[us]') on a tz-aware
            # column raises in pandas 2.x
            return (f"datetime64[{typ.unit}, {typ.tz}]" if typ.tz
                    else f"datetime64[{typ.unit}]")
        return None
    try:
        dt = np.dtype(typ)
    except TypeError:
        return None
    if dt.kind in "iu":
        return str(dt).capitalize().replace("int", "Int").replace("uInt", "UInt")
    if dt.kind == "b":
        return "boolean"
    if dt.kind == "f":
        return "float64"
    if dt.kind == "M":
        return str(dt)
    return None


def _schema_dtype_map(schema: pa.Schema, cols) -> dict:
    out = {}
    for name, typ in zip(schema.names, schema.types):
        if name in cols:
            dt = _pd_nullable_dtype(typ)
            if dt is not None:
                out[name] = dt
    return out


def _cast_side(df: pd.DataFrame, dtype_map: dict) -> pd.DataFrame:
    for c, dt in dtype_map.items():
        if c in df.columns and str(df[c].dtype) != dt:
            try:
                df[c] = df[c].astype(dt)
            except (TypeError, ValueError):
                # e.g. an all-NaN float pad that can't cast to a tz-aware
                # dtype directly — a wrong dtype must not crash the join
                # (never-abort); to_datetime handles the tz path
                if dt.startswith("datetime64"):
                    df[c] = pd.to_datetime(df[c], errors="coerce", utc="," in dt)
    return df


def _key_hash(values: np.ndarray) -> np.ndarray:
    if np.issubdtype(values.dtype, np.integer):
        from ..functions.hashing import splitmix64

        return splitmix64(values.astype(np.uint64)).astype(np.int64)
    return hash_strings(values, seed=3).astype(np.int64)


def broadcast_join(ds, small_df: pd.DataFrame, on: str, how: str = "inner",
                   batch_size: int = 65536):
    """Join a Dataset against a small pandas table (dimension-table join).
    ``how``: inner | left."""
    import ray

    ref = ray.put(small_df)

    def join_batch(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(ref), on=on, how=how)

    return ds.map_batches(join_batch, batch_format="pandas", batch_size=batch_size)


def semi_join(ds, keys, on: str, anti: bool = False, batch_size: int = 65536):
    """Keep rows whose key is (not, for anti) in the broadcast key set."""
    import ray

    ref = ray.put(np.sort(np.asarray(list(keys))))

    def filt(t: pa.Table) -> pa.Table:
        from ..functions.hashing import isin_sorted

        valid = ray.get(ref)
        v = t.column(on).to_numpy(zero_copy_only=False)
        hit = isin_sorted(valid, v)
        return t.filter(pa.array(~hit if anti else hit))

    return ds.map_batches(filt, batch_format="pyarrow", batch_size=batch_size)


_PD_INT_MAP = {
    pa.int8(): pd.Int8Dtype(), pa.int16(): pd.Int16Dtype(),
    pa.int32(): pd.Int32Dtype(), pa.int64(): pd.Int64Dtype(),
    pa.uint8(): pd.UInt8Dtype(), pa.uint16(): pd.UInt16Dtype(),
    pa.uint32(): pd.UInt32Dtype(), pa.uint64(): pd.UInt64Dtype(),
}


def _nullable_int_pandas(t: pa.Table) -> pd.DataFrame:
    """Arrow → pandas keeping ints as NULLABLE extension dtypes.

    The default conversion turns int64-with-nulls into float64, silently
    corrupting magnitudes ≥ 2^53 AND making per-batch dtypes depend on
    which batch happens to contain a null.  Ray preserves extension
    dtypes through union/shuffle/group assembly (verified: 2^62 values
    stay exact in mixed groups), so converting here keeps the whole join
    path exact for the full int64 range."""
    return t.to_pandas(types_mapper=_PD_INT_MAP.get)


def _col_hash_u64(col: pd.Series) -> np.ndarray:
    """Per-column uint64 key hash from exact values, independent of
    per-batch null presence (null keys get an arbitrary bucket; they are
    dropped by the merge's NULL-key semantics anyway)."""
    from ..functions.hashing import splitmix64

    if pd.api.types.is_integer_dtype(col.dtype):
        kv = col.fillna(0).astype("int64").to_numpy()
        return splitmix64(kv.astype(np.uint64))
    return hash_strings(col.to_numpy(), seed=3)


def _key_cols(on) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def restore_plain_ints(df: pd.DataFrame) -> pd.DataFrame:
    """Inverse of the ``_nullable_int_pandas`` upcast for join consumers:
    cast nullable extension int columns back to plain numpy ints where no
    nulls remain, so join-regime outputs match the broadcast-regime
    schema.  Columns that kept genuine nulls stay extension-typed —
    callers needing float64-for-NULL semantics convert at their own
    output surface."""
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith(("Int", "UInt")) and df[c].notna().all():
            df[c] = df[c].astype(dt.lower())
    return df


def _with_bucket_and_tag(ds, on, n_buckets: int, tag: int, batch_size: int):
    """``on`` may be one column name or a list (composite key: the bucket
    mixes every key column's hash, so e.g. a 128-bit (h1, h2) pair
    buckets by the full pair, never by h1 alone)."""
    keys = _key_cols(on)

    def add(t: pa.Table) -> pd.DataFrame:
        from ..functions.hashing import splitmix64

        df = _nullable_int_pandas(t)
        kh = np.zeros(len(df), dtype=np.uint64)
        for c in keys:
            kh = splitmix64(kh ^ _col_hash_u64(df[c]))
        df["__bucket"] = kh.astype(np.int64) % n_buckets
        df["__side"] = np.int8(tag)
        return df

    return ds.map_batches(add, batch_format="pyarrow", batch_size=batch_size)


def hash_join(left, right, on, n_buckets: int = 64, how: str = "inner",
              batch_size: int = 65536):
    """Large-large equi-join: explicit partitioned hash join.

    ``on`` is one column name or a list of names shared by both sides
    (composite key).  Both sides get a ``bucket`` column and a side tag,
    are unioned, and each bucket group splits by tag and pandas-merges
    (the union pads each side's missing columns with nulls; the per-side
    column lists are captured from the schemas up front so padding is
    dropped exactly).  Column sets must be disjoint apart from the key.
    """
    keys = _key_cols(on)
    left_schema, right_schema = left.schema(), right.schema()
    left_cols = [c for c in left_schema.names]
    right_cols = [c for c in right_schema.names]
    left_dtypes = _schema_dtype_map(left_schema, left_cols)
    right_dtypes = _schema_dtype_map(right_schema, right_cols)
    l = _with_bucket_and_tag(left, keys, n_buckets, 0, batch_size)
    r = _with_bucket_and_tag(right, keys, n_buckets, 1, batch_size)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # a bucket whose rows all come from one side lacks the other
        # side's columns entirely (union blocks keep their own schema) —
        # reindex materializes the expected columns as nulls.  The group
        # assembly NaN-pads missing columns (int64 → float64), so cast
        # each side back to its Arrow-derived (nullable) dtypes.
        lg = _cast_side(g[g["__side"] == 0].reindex(columns=left_cols),
                        left_dtypes)
        rg = _cast_side(g[g["__side"] == 1].reindex(columns=right_cols),
                        right_dtypes)
        # SQL equi-join semantics: NULL keys match nothing (pandas would
        # match NaN to NaN); null-key left rows survive only a left join
        l_nullmask = lg[keys].isna().any(axis=1)
        lg_null = lg[l_nullmask]
        lg = lg[~l_nullmask]
        rg = rg[rg[keys].notna().all(axis=1)]
        out = lg.merge(rg, on=keys, how=how)
        if how == "left" and len(lg_null):
            out = pd.concat([out, lg_null.reindex(columns=out.columns)],
                            ignore_index=True)
        return out

    return l.union(r).groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def interval_join_bucketed(left, right, left_ts: str, right_start: str,
                           right_end: str, bucket_us: int,
                           right_cols: list[str] | None = None,
                           batch_size: int = 65536):
    """Interval (range) join with NO equi key: match every left row whose
    timestamp falls in ``[right_start, right_end)``.

    Scale motif — time-bucket co-partitioning: each right interval
    replicates to every bucket it covers (bounded by interval_len /
    bucket_us + 1 copies), each left row goes to its single bucket, and a
    ``groupby(bucket)`` group task emits matches via two vectorized
    ``searchsorted`` calls over the bucket's sorted left timestamps.  A
    matched pair materializes in exactly one bucket (the left row's), so
    no cross-bucket dedup is needed.  Choose ``bucket_us`` ≳ the typical
    interval length so the replication factor stays ~2.
    Column sets must be disjoint.  Timestamps compare in int64 µs.
    """
    right_cols = right_cols if right_cols is not None else [
        c for c in right.schema().names if c not in (right_start, right_end)]
    left_schema = left.schema()
    left_names = [c for c in left_schema.names]
    left_dtypes = _schema_dtype_map(left_schema, left_names)
    right_schema = right.schema()
    right_names = [right_start, right_end, *right_cols]
    right_dtypes = _schema_dtype_map(right_schema, right_names)

    def _to_us(col: pd.Series) -> np.ndarray:
        if pd.api.types.is_datetime64_any_dtype(col):
            return col.astype("datetime64[us]").astype("int64").to_numpy()
        return col.to_numpy().astype(np.int64)

    def tag_left(t: pa.Table) -> pd.DataFrame:
        df = _nullable_int_pandas(t)
        df["__bucket"] = _to_us(df[left_ts]) // bucket_us
        df["__side"] = np.int8(0)
        return df

    def tag_right(t: pa.Table) -> pd.DataFrame:
        df = _nullable_int_pandas(t)
        # a null bound means the row can never match (never-abort rule);
        # it must be dropped HERE — NaT round-trips through int64 as
        # -2^63, and `e - 1` would wrap to +2^63-1, making the bucket
        # replication count for that row ~10^9
        df = df[df[right_start].notna() & df[right_end].notna()]
        s = _to_us(df[right_start])
        e = _to_us(df[right_end])
        b0 = s // bucket_us
        b1 = np.maximum(e - 1, s) // bucket_us      # inclusive end bucket
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(df)), reps)
        out = df.iloc[idx].copy()
        # cumsum(reps) - reps == exclusive prefix sum with len(offsets) ==
        # len(reps) even when the null-bound filter emptied the frame (a
        # batch of all-NaT bounds previously crashed np.repeat on a
        # length-1 offsets vs length-0 reps — never-abort rule)
        offsets = np.cumsum(reps) - reps
        out["__bucket"] = (np.arange(reps.sum()) - np.repeat(offsets, reps)
                           + np.repeat(b0, reps))
        out["__side"] = np.int8(1)
        return out

    l = left.map_batches(tag_left, batch_format="pyarrow", batch_size=batch_size)
    r = right.map_batches(tag_right, batch_format="pyarrow", batch_size=batch_size)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = _cast_side(g[g["__side"] == 0].reindex(columns=left_names),
                        left_dtypes)
        rg = _cast_side(g[g["__side"] == 1].reindex(columns=right_names),
                        right_dtypes)
        empty = pd.concat(
            [lg.iloc[:0], rg.iloc[:0][right_cols]], axis=1)
        if lg.empty or rg.empty:
            return empty
        lg = lg[lg[left_ts].notna()]
        rg = rg[rg[right_start].notna() & rg[right_end].notna()]
        if lg.empty or rg.empty:
            return empty
        lg = lg.sort_values(left_ts, kind="mergesort")
        ts = _to_us(lg[left_ts])
        lo = np.searchsorted(ts, _to_us(rg[right_start]), side="left")
        hi = np.searchsorted(ts, _to_us(rg[right_end]), side="left")
        counts = (hi - lo).clip(min=0)
        total = int(counts.sum())
        if total == 0:
            return empty
        offsets = np.concatenate([[0], np.cumsum(counts[:-1])])
        left_idx = (np.arange(total) - np.repeat(offsets, counts)
                    + np.repeat(lo, counts))
        right_idx = np.repeat(np.arange(len(rg)), counts)
        out = lg.iloc[left_idx].reset_index(drop=True)
        for c in right_cols:
            out[c] = rg[c].to_numpy()[right_idx]
        return out

    return l.union(r).groupby("__bucket").map_groups(
        merge_bucket, batch_format="pandas")


def asof_join_bucketed(left, right, key: str, ts: str, right_ts: str,
                       right_cols: list[str], n_buckets: int = 32,
                       batch_size: int = 65536):
    """As-of join (latest right row per key with right_ts <= ts) for two
    large sides: bucket by key hash, sort within the bucket group, and
    ``pd.merge_asof`` per bucket."""
    left_schema = left.schema()
    left_cols = [c for c in left_schema.names]
    left_dtypes = _schema_dtype_map(left_schema, left_cols)
    right_schema = right.schema()
    right_dtypes = _schema_dtype_map(
        right_schema, set([key, right_ts, *right_cols]))
    right_pd_nulls = {}
    for name, typ in zip(right_schema.names, right_schema.types):
        if name in right_cols or name == right_ts:
            if pa.types.is_timestamp(typ):
                right_pd_nulls[name] = pd.NaT
            elif pa.types.is_floating(typ) or pa.types.is_integer(typ):
                right_pd_nulls[name] = np.nan
            else:
                right_pd_nulls[name] = None
    l = _with_bucket_and_tag(left, key, n_buckets, 0, batch_size)
    r = _with_bucket_and_tag(right, key, n_buckets, 1, batch_size)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = _cast_side(g[g["__side"] == 0].reindex(columns=left_cols),
                        left_dtypes)
        rg = _cast_side(
            g[g["__side"] == 1].reindex(columns=[key, right_ts, *right_cols]),
            right_dtypes)
        if lg.empty:
            return lg
        # NULL keys match nothing (as-of is left-join-shaped: keep them);
        # a NULL left timestamp also matches nothing (right_ts <= NULL is
        # never true) AND would break merge_asof's sorted-key check, so
        # route it to the padded path too
        null_mask = lg[key].isna() | lg[ts].isna()
        lg_null = lg[null_mask]
        lg = lg[~null_mask]
        rg = rg[rg[key].notna() & rg[right_ts].notna()]
        lg = lg.sort_values([ts, key], kind="mergesort")

        def _pad(df):
            # typed nulls matching merge_asof's output dtypes, so blocks
            # from empty-right buckets unify with the rest
            for c in (right_ts, *right_cols):
                df[c] = right_pd_nulls.get(c)
            return _cast_side(df, right_dtypes)

        if rg.empty:
            out = _pad(lg)
            if len(lg_null):
                out = pd.concat([out, _pad(lg_null.copy())], ignore_index=True)
            return out
        rg = rg.sort_values([right_ts, key], kind="mergesort")
        # blocks from the two union branches can deserialize with
        # different datetime units (us vs ns); merge_asof requires equal
        # key dtypes
        if pd.api.types.is_datetime64_any_dtype(lg[ts]):
            lg[ts] = lg[ts].astype("datetime64[us]")
            rg[right_ts] = rg[right_ts].astype("datetime64[us]")
        out = pd.merge_asof(
            lg, rg[[key, right_ts, *right_cols]],
            left_on=ts, right_on=right_ts, by=key, direction="backward",
        )
        if len(lg_null):
            out = pd.concat([out, _pad(lg_null.copy())], ignore_index=True)
        return out

    return l.union(r).groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def skew_hash_join(left, right, on, hot_limit: int = 1_000_000,
                   max_hot_keys: int = 10_000, n_buckets: int = 64,
                   how: str = "inner", batch_size: int = 65536):
    """Skew-aware large-large equi-join: HOT keys (left-side frequency >
    ``hot_limit``) are routed through a broadcast map-side join — their
    rows never enter the bucket exchange, so one viral key cannot
    overwhelm its reducer — while COLD keys take the ordinary bucketed
    ``hash_join``.  The result is row-identical to ``hash_join``
    (equality pytest-pinned).

    Hot-key detection is the heavy-hitter motif: per-batch key counts →
    sorted-run keyed sum → keys above ``hot_limit`` (bounded by
    total/hot_limit keys, each one driver row).  The hot slice of the
    RIGHT side must be broadcastable — true for the
    enrich/dimension-shaped joins where skew actually bites (one row,
    or a handful, per key on the right).  If either guard trips
    (> ``max_hot_keys`` hot keys, or the hot right slice exceeds
    ``hot_limit`` rows), the operator falls back to the plain bucketed
    join LOUDLY rather than broadcast something worker-sized.

    ``how``: inner | left.  NULL keys never become hot (they match
    nothing / survive only a left join) and stay on the cold path,
    which already implements the SQL semantics.
    """
    import warnings

    import ray

    from .groupagg import sorted_reduce_by_key_ds

    keys = _key_cols(on)

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df[keys].dropna().groupby(keys, as_index=False).size()
        return g.rename(columns={"size": "__n"})

    totals = sorted_reduce_by_key_ds(
        left.map_batches(count_partial, batch_format="pandas",
                         batch_size=batch_size),
        keys, {"__n": "sum"})
    hot = totals.map_batches(lambda df: df[df["__n"] > hot_limit],
                             batch_format="pandas").to_pandas()
    if hot.empty or "__n" not in hot:
        return hash_join(left, right, on, n_buckets=n_buckets, how=how,
                         batch_size=batch_size)
    if len(hot) > max_hot_keys:
        warnings.warn(
            f"skew_hash_join: {len(hot)} hot keys exceed max_hot_keys="
            f"{max_hot_keys}; falling back to the bucketed join")
        return hash_join(left, right, on, n_buckets=n_buckets, how=how,
                         batch_size=batch_size)
    hot_keys = hot[keys].reset_index(drop=True)

    def split(ds, want_hot: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            m = df[keys].merge(hot_keys.assign(__h=1), on=keys,
                               how="left")["__h"].notna().to_numpy()
            return df[m] if want_hot else df[~m]

        return ds.map_batches(fn, batch_format="pandas",
                              batch_size=batch_size)

    hot_right = split(right, True).to_pandas()
    if len(hot_right) > hot_limit:
        warnings.warn(
            f"skew_hash_join: hot right slice has {len(hot_right)} rows "
            f"(> hot_limit={hot_limit}) — not broadcastable; falling "
            "back to the bucketed join")
        return hash_join(left, right, on, n_buckets=n_buckets, how=how,
                         batch_size=batch_size)

    cold = hash_join(split(left, False), split(right, False), on,
                     n_buckets=n_buckets, how=how, batch_size=batch_size)
    if hot_right.empty:
        if how == "inner":
            return cold  # hot left rows match nothing
        # left join with an unmatched hot slice: rare; route through the
        # plain bucketed join rather than hand-pad null right columns
        return hash_join(left, right, on, n_buckets=n_buckets, how=how,
                         batch_size=batch_size)
    hot_joined = broadcast_join(split(left, True), hot_right, on=on,
                                how=how, batch_size=batch_size)
    # align the hot branch's dtypes to the cold hash_join contract
    # (Arrow-derived nullable dtypes) so the union's blocks agree —
    # values identical either way, but mismatched Int64/int64 flavors
    # make the streaming executor warn on every hot/cold boundary
    dtypes = {**_schema_dtype_map(left.schema(), left.schema().names),
              **_schema_dtype_map(right.schema(), right.schema().names)}
    hot_joined = hot_joined.map_batches(
        lambda df: _cast_side(df, dtypes), batch_format="pandas",
        batch_size=batch_size)
    return cold.union(hot_joined)


def anti_join_keys(left, keys_ds, on: str,
                   broadcast_limit: int = 2_000_000,
                   n_buckets: int = 64, batch_size: int = 65536):
    """Keep left rows whose ``on`` key is ABSENT from ``keys_ds`` — the
    NOT-EXISTS / anti-join operator (TPC-H Q22 shape; the reference's
    referential "missing row" checks are the per-row analog,
    ``/root/reference/bin/analyze_joss.py:456`` criteria absence).

    ``keys_ds``: a Dataset with one INTEGER column named ``on`` holding
    the DISTINCT probe keys (pre-deduplicated by the caller — e.g. via
    ``sorted_distinct_keys``; string keys must be hashed first, the
    repo's ints-only-exchange convention).  SQL semantics: a NULL left
    key matches nothing, so NULL-key rows always SURVIVE the anti-join.

    Two regimes (the shared ``broadcast_limit`` convention): at or below
    the limit the sorted int64 key array ships ONCE via ``ray.put`` and
    every batch filters with one vectorized ``isin_sorted`` masked by
    the validity bitmap (null keys survive); above it, a bucketed LEFT
    hash join against the marker-tagged key side, keeping rows whose
    marker padded NULL.  Both regimes are pytest-proven identical
    (tests/test_windows_joins.py)."""
    import ray
    import ray.data as rd

    from ..functions.hashing import isin_sorted

    n_keys = keys_ds.count()
    if n_keys <= broadcast_limit:
        kdf = keys_ds.to_pandas() if n_keys else pd.DataFrame({on: []})
        # ints-only exchange: the probe set stays int64 end-to-end (a
        # float64 cast would corrupt keys beyond 2^53 — the same
        # property test_hash_join_exact_beyond_2_53 pins for joins)
        arr = np.sort(kdf[on].dropna().to_numpy(dtype=np.int64)) \
            if len(kdf) else np.empty(0, dtype=np.int64)
        ref = ray.put(arr)

        def filt(t: pa.Table, _ref=ref) -> pa.Table:
            col = t.column(on)
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            v = pc.fill_null(pc.cast(col, pa.int64()), 0) \
                .to_numpy(zero_copy_only=False)
            hit = isin_sorted(ray.get(_ref), v) & valid
            return t.filter(pa.array(~hit))

        return left.map_batches(filt, batch_format="pyarrow",
                                batch_size=batch_size)

    marked = keys_ds.map_batches(
        lambda df: df.assign(__present=np.int8(1)),
        batch_format="pandas", batch_size=batch_size)
    joined = hash_join(left, marked, on=on, how="left",
                       n_buckets=n_buckets, batch_size=batch_size)
    return joined.map_batches(
        lambda df: df[df["__present"].isna()].drop(columns="__present"),
        batch_format="pandas", batch_size=batch_size)
