"""High-cardinality grouped aggregation utilities.

Ray Data's ``groupby().aggregate()`` pays per-group Python overhead, which
is fine for low-cardinality keys (langs, checks) but dominates wall time
when the key is ~unique per row (url hashes: millions-billions of groups).

``candidate_duplicates`` exploits that duplicate keys are the *rare* case
for a uniqueness check: after a global ``sort`` on the key (a range
partition — Ray's fastest exchange), every key is contiguous, so

* a key duplicated *within* a block is found vectorized (shifted
  equality), and
* a key spanning *two* blocks must touch a block edge, so emitting each
  block's first/last key group is sufficient to catch it.

The candidate stream (in-block dups + 2 edge groups per block) is orders
of magnitude smaller than the key stream; the final exact aggregation
over candidates uses Ray's aggregate only on that small remainder.
Assumption (documented): duplicates are a small fraction of keys.  If an
input is pathologically duplicate-heavy the code stays *correct* — the
candidate stream just grows toward the key stream and the final
aggregate slows accordingly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def candidate_duplicates(partials, key_cols: list[str], n_col: str = "n"):
    """partials: Dataset of per-batch combined rows (key_cols + n + carry
    columns).  Returns a Dataset of candidate rows (same schema) containing
    every key whose global count could exceed its in-block count."""
    sorted_ds = partials.sort(key_cols)

    def block_candidates(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        keys = df[key_cols].to_numpy()
        same_as_prev = np.zeros(len(df), dtype=bool)
        same_as_prev[1:] = (keys[1:] == keys[:-1]).all(axis=1)
        in_dup_group = same_as_prev | np.concatenate([same_as_prev[1:], [False]])
        first_key = (keys == keys[0]).all(axis=1)
        last_key = (keys == keys[-1]).all(axis=1)
        keep = in_dup_group | first_key | last_key
        # also keep any row whose in-block count already exceeds 1
        keep |= df[n_col].to_numpy() > 1
        return df[keep]

    # batch_size=None -> one call per block, so "block edge" is well-defined
    return sorted_ds.map_batches(block_candidates, batch_format="pandas", batch_size=None)


def sorted_sum_by_key(partials, key_cols: list[str], sum_cols: list[str],
                      batch_size: int = 65536) -> pd.DataFrame:
    """Exact keyed sum for MID/HIGH-cardinality keys without Ray's
    per-group aggregate overhead (measured ~1.5 ms/group: a 15k-group
    Sum cost 22 s at sf0.01).

    Shape: per-batch combine → range-sort the partial stream → one
    vectorized pandas groupby-sum per block for block-INTERIOR keys
    (after a global sort a key interior to a block cannot appear in any
    other block) → the ≤2 block-EDGE keys per block (the only keys that
    can span blocks) are COMBINED per block before shipping, so the
    driver merge is genuinely bounded by 2 × n_blocks rows even when one
    hot key's partials fill many blocks (a raw-row edge pass would ship
    every partial row of that key — review r3 finding).  Returns the
    O(groups) result as a DataFrame — the same driver-bound output every
    keyed-sum query already returns.
    """
    # NaN-safe edge detection shared with the grouped top-k (same
    # sorted-run contract); see ranking._edge_mask for the NULL-group
    # rationale
    from .ranking import _edge_mask

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key_cols, as_index=False, dropna=False)[sum_cols].sum()

    sorted_ds = partials.map_batches(
        combine, batch_format="pandas", batch_size=batch_size
    ).sort(key_cols).materialize()

    def interior(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        inner = df[~_edge_mask(df, key_cols)]
        if inner.empty:
            return inner
        return inner.groupby(key_cols, as_index=False, dropna=False)[
            sum_cols].sum()

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        e = df[_edge_mask(df, key_cols)]
        if e.empty:
            return e
        return e.groupby(key_cols, as_index=False, dropna=False)[
            sum_cols].sum()

    # batch_size=None → one call per block, so "block edge" is well-defined
    interior_df = sorted_ds.map_batches(
        interior, batch_format="pandas", batch_size=None).to_pandas()
    edge_rows = sorted_ds.map_batches(
        edges, batch_format="pandas", batch_size=None).to_pandas()
    edge_sum = edge_rows.groupby(key_cols, as_index=False, dropna=False)[
        sum_cols].sum() if len(edge_rows) else edge_rows
    out = pd.concat([interior_df, edge_sum], ignore_index=True)
    if out.empty:  # empty corpus: concat of schemaless empties loses cols
        return pd.DataFrame(columns=key_cols + sum_cols)
    return out.sort_values(key_cols, kind="mergesort").reset_index(drop=True)


def sorted_distinct_keys(partials, key_cols: list[str],
                         driver_limit: int = 2_000_000):
    """DISTINCT key rows at ANY cardinality as a DATASET — the sorted-run
    motif applied to set-dedup: a ``groupby(keys).aggregate`` pays Ray's
    per-group overhead (~1.5 ms/group — hours at corpus-sized key
    cardinality), while this shape pays ONE range sort, then per block
    (``batch_size=None`` → one call per block) a vectorized
    ``drop_duplicates``: keys interior to a block are final in place and
    stay distributed; the ≤2 block-EDGE keys per block contribute one
    deduped row each, so the driver reconciliation is bounded by
    2 × n_blocks rows.  Callers should pre-dedup per batch so the sort
    moves each batch's distinct keys, not raw rows.  Below
    ``driver_limit`` pre-deduped rows the distinct finishes in one
    bounded driver ``drop_duplicates`` instead (the shared two-regime
    convention — the range sort is ~1 s of pure barrier overhead on a
    small stream)."""
    import ray.data as rd

    from .ranking import _edge_mask

    pre_ds = partials.materialize()
    if pre_ds.count() <= driver_limit:
        df = pre_ds.to_pandas()
        if df.empty:
            return pre_ds
        return rd.from_pandas(
            df.drop_duplicates(key_cols).reset_index(drop=True))

    sorted_ds = pre_ds.sort(key_cols)

    def block_distinct(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(__edge=pd.Series([], dtype=bool))
        d = df.drop_duplicates(key_cols).copy()
        d["__edge"] = _edge_mask(d, key_cols)
        return d

    capped = sorted_ds.map_batches(
        block_distinct, batch_format="pandas", batch_size=None).materialize()
    interior = capped.map_batches(
        lambda df: df[~df["__edge"]].drop(columns="__edge"),
        batch_format="pandas")
    edge_rows = capped.map_batches(
        lambda df: df[df["__edge"]].drop(columns="__edge"),
        batch_format="pandas").to_pandas()
    if len(edge_rows):
        edge_rows = edge_rows.drop_duplicates(key_cols)
        interior = interior.union(
            rd.from_pandas(edge_rows.reset_index(drop=True)))
    return interior


def sorted_reduce_by_key_ds(partials, key_cols: list[str],
                            agg: dict[str, str],
                            batch_size: int = 65536,
                            driver_limit: int = 2_000_000):
    """Exact keyed reduction (``agg``: {col: "sum"|"min"|"max"}) at ANY
    key cardinality, returned as a DATASET — the reduction analog of
    ``sorted_distinct_keys``.  Ray's ``groupby().aggregate()`` pays
    per-group Python overhead (measured ~0.6 ms/group on this box: a
    200k-group Sum cost 122 s where this shape costs 0.5 s), so any
    reduction keyed by doc/cluster/128-bit-hash cardinality must never
    go through it.

    Two regimes on the pre-combined partial stream (the shared
    ``broadcast_limit`` convention): at or below ``driver_limit``
    combined rows the reduction finishes in ONE bounded driver groupby
    (a range sort costs ~1 s of fixed barrier — pure overhead on small
    streams, and iterative callers like the CC label loop pay it per
    round); above it, ONE range sort → per block (``batch_size=None`` →
    one call per block) a vectorized pandas groupby: keys INTERIOR to a
    block are final in place and stay distributed; the ≤2 block-EDGE
    keys per block ship ONE pre-combined row each, so the driver
    reconciliation is bounded by 2 × n_blocks rows — independent of
    group count.  NaN-safe on the keys (``dropna=False`` + the shared
    ``_edge_mask``), matching SQL's NULL group."""
    import ray.data as rd

    from .ranking import _edge_mask

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return df.groupby(key_cols, as_index=False, dropna=False).agg(agg)

    pre_ds = partials.map_batches(
        pre, batch_format="pandas", batch_size=batch_size).materialize()
    if pre_ds.count() <= driver_limit:
        df = pre_ds.to_pandas()
        if df.empty:
            return pre_ds
        out = df.groupby(key_cols, as_index=False, dropna=False).agg(agg)
        return rd.from_pandas(out.reset_index(drop=True))

    sorted_ds = pre_ds.sort(key_cols).materialize()

    def block_reduce(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(__edge=pd.Series([], dtype=bool))
        # the edge mask is computed on the RAW block rows (which sit in
        # global range-sort order), never on a re-sorted combined frame:
        # pandas groupby re-sorts NaN keys last, which need not match the
        # range sort's null placement, and a mislabeled boundary key
        # would surface once per block instead of once
        em = _edge_mask(df, key_cols)
        parts = []
        for mask, flag in ((~em, False), (em, True)):
            sub = df[mask]
            if len(sub):
                g = sub.groupby(key_cols, as_index=False,
                                dropna=False).agg(agg)
                g["__edge"] = flag
                parts.append(g)
        return pd.concat(parts, ignore_index=True)

    reduced = sorted_ds.map_batches(
        block_reduce, batch_format="pandas", batch_size=None).materialize()
    interior = reduced.map_batches(
        lambda df: df[~df["__edge"]].drop(columns="__edge"),
        batch_format="pandas")
    edge_rows = reduced.map_batches(
        lambda df: df[df["__edge"]].drop(columns="__edge"),
        batch_format="pandas").to_pandas()
    if len(edge_rows):
        final_edge = edge_rows.groupby(
            key_cols, as_index=False, dropna=False).agg(agg)
        interior = interior.union(
            rd.from_pandas(final_edge.reset_index(drop=True)))
    return interior


def salted_distinct_count(ds, key: str, entity: str, n_salts: int = 64,
                          batch_size: int = 65536):
    """Exact ``count(DISTINCT entity)`` per LOW-cardinality key at scale.

    A plain ``groupby(key)`` funnels every (key, entity) pair of a hot key
    into one group task.  Salting by ``hash(entity) % n_salts`` splits the
    DISTINCT computation *exactly* — each entity value lands in exactly one
    salt, so per-(key, salt) distinct counts are disjoint and their sum is
    the true distinct count.  Stage 1 pre-combines per batch
    (drop_duplicates), stage 2 groups by the salted key (cardinality
    |keys| × n_salts — balanced), stage 3 sums the tiny per-salt counts.
    SQL-NULL semantics: NULL entities are not counted; NULL keys form
    their own group.
    """
    from ray.data.aggregate import Sum

    from ..functions.hashing import hash_strings, splitmix64

    # Decide the salt hash ONCE from the Arrow schema, not per batch: a
    # pandas batch containing nulls converts int64 → float64, and a
    # dtype-dependent branch would salt the same entity differently in
    # different batches, double-counting it (review finding r2).
    schema = ds.schema()
    if schema is None:  # empty upstream: Ray has no schema to probe
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            key: pd.Series([], dtype=object),
            "n_distinct": pd.Series([], dtype="int64"),
        }))
    ent_type = dict(zip(schema.names, schema.types)).get(entity)
    ent_is_int = (pa.types.is_integer(ent_type)
                  if isinstance(ent_type, pa.DataType)
                  else np.dtype(ent_type).kind in "iu")

    def _salt(vals: np.ndarray) -> np.ndarray:
        if ent_is_int:
            # nulls were dropped; a float-degraded batch casts back exactly
            h = splitmix64(vals.astype(np.int64).astype(np.uint64))
        else:
            h = hash_strings(vals, seed=17)
        return (h % np.uint64(n_salts)).astype(np.int64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[entity].notna()][[key, entity]].drop_duplicates()
        df = df.copy()
        df["__salt"] = _salt(df[entity].to_numpy())
        return df

    pairs = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)

    def count_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "__salt": [g["__salt"].iloc[0]],
            "n_distinct": [int(g[entity].nunique())],
        })

    per_salt = pairs.groupby([key, "__salt"]).map_groups(
        count_group, batch_format="pandas")
    # final fold over the (keys × salts) grid: the sorted-run
    # reduction, not Ray's hash Aggregate (barrier cost precedent).
    # pandas keeps a NULL key as NaN — restore the None the previous
    # Ray-aggregate contract handed consumers
    from ..functions.nulls import restore_null_keys

    return sorted_reduce_by_key_ds(
        per_salt, [key], {"n_distinct": "sum"}).map_batches(
        lambda df: restore_null_keys(df, [key]),
        batch_format="pandas")


def grouped_value_counts(ds, key: str, val: str,
                         batch_size: int = 131072) -> pd.DataFrame:
    """Exact (key, val) -> n distribution for a LOW-cardinality key over a
    bounded-domain value column (lengths, scores, small ints): per-batch
    ``groupby.size`` combiner, then the sorted-run keyed sum.  The
    exchange is bounded by |keys| × |distinct vals| per batch —
    independent of row count — which makes EXACT grouped quantiles/modes
    scale-free when the value domain is bounded (the complement of the
    t-digest/KLL sketch path, which covers unbounded domains
    approximately).  Finishing rides ``sorted_sum_by_key``, NOT Ray's
    per-group aggregate: the (key, val) composite has |keys| × |vals|
    groups, and at ~1.5 ms/group the hash aggregate cost 6 s on a
    2k-group distribution that the sorted-run sum finishes in ~1 s."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key, val], dropna=False, as_index=False).size()
        return g.rename(columns={"size": "n"})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    return sorted_sum_by_key(parts, [key, val], ["n"])


def exact_grouped_quantiles(ds, key: str, val: str, qs: list[float],
                            batch_size: int = 131072) -> pd.DataFrame:
    """Exact per-key quantiles with SQL ``quantile_disc`` semantics (the
    value at 1-based rank ``max(1, ceil(q*n))`` of the sorted values),
    computed from the distributed value-counts distribution — no per-key
    value materialization anywhere."""
    import math

    # round, not int(): int(0.29 * 100) == 28 would mislabel the column
    qcols = [f"q{round(q * 100)}" for q in qs]
    if len(set(qcols)) != len(qcols):
        raise ValueError(
            f"quantile labels collide ({qcols}); qs must be "
            "distinguishable at 1% granularity")
    all_counts = grouped_value_counts(ds, key, val, batch_size)
    if all_counts.empty:
        return pd.DataFrame({key: pd.Series([], dtype="object"),
                             **{c: pd.Series([], dtype="float64")
                                for c in qcols}})
    counts = all_counts[all_counts[val].notna()]
    rows = []
    for k, g in counts.groupby(key, dropna=False):
        g = g.sort_values(val)
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        vals = g[val].to_numpy()
        row = {key: k}
        for q, c in zip(qs, qcols):
            rank = max(1, math.ceil(q * total))
            row[c] = vals[np.searchsorted(cum, rank)]
        rows.append(row)
    # keys whose values are ALL null still get a row (NULL quantiles),
    # matching SQL quantile_disc over an all-NULL group.  Membership is
    # computed between two slices of all_counts (same key dtype — a frame
    # rebuilt from `rows` could infer float64 for an all-NaN key column
    # and crash the merge); pandas merge matches NaN keys to NaN.
    missing = all_counts[[key]].drop_duplicates()
    has_vals = counts[[key]].drop_duplicates().assign(__has=1)
    if len(has_vals):
        m = missing.merge(has_vals, on=key, how="left")
        missing = missing[m["__has"].isna().to_numpy()]
    for k in missing[key]:
        rows.append({key: k, **{c: np.nan for c in qcols}})
    return pd.DataFrame(rows).sort_values(key).reset_index(drop=True)
