"""Sequence packing: map documents onto fixed-size token sequences.

LLM pretraining packs the token stream of a corpus (documents concatenated
in a deterministic order) into fixed-length training sequences.  Given a
per-document token count, each document's placement is fully determined by
its GLOBAL token offset — the sum of token counts of all documents that
precede it in the pack order.  This module computes that exclusive prefix
sum distributed, in two bounded passes:

1. bucket documents by id range (``bucket = id // bucket_size``) and
   compute per-bucket token sums with a per-batch combiner — the exchange
   carries O(n_buckets) rows, and the driver's exclusive scan over bucket
   sums is O(n_docs / bucket_size) (hierarchical re-bucketing extends this
   another level if even that is too large; at 10^12 docs and
   bucket_size=2^20 the scan is ~10^6 rows — trivial);
2. broadcast the bucket→offset array (``ray.put`` once, ``searchsorted``
   per batch) and finish the within-bucket cumsum in a
   ``groupby(bucket).map_groups`` — each group is ≤ bucket_size rows by
   construction, so pick bucket_size ≈ a block and the per-group Python
   overhead amortizes over block-sized vectorized work.

Output per document: its global token offset and the first/last sequence
index it lands in (``seq = offset // seq_tokens``) — exactly SQL's
``sum(...) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND 1
PRECEDING)`` window, which is the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def packed_sequence_spans(ds, id_col: str, tokens_col: str,
                          seq_tokens: int, bucket_size: int = 65536,
                          keep_cols: list[str] | None = None):
    """``ds`` must carry a unique integer ``id_col`` (the pack order) and a
    non-negative ``tokens_col``.  Returns a Dataset with keep_cols +
    [id_col, tokens_col, "seq_first", "seq_last"]: the first and last
    fixed-size sequence each document's tokens occupy.  Zero-token
    documents sit AT their offset (seq_last == seq_first) without
    consuming a slot.
    """
    import ray

    keep_cols = keep_cols or []
    # Consumed twice (bucket-sum pass, then span assignment): materialize
    # the slim (id, tokens, keep_cols) projection once so the upstream
    # derivation — at scale, a full corpus read — does not re-execute.
    ds = ds.materialize()

    def bucket_sums(df: pd.DataFrame) -> pd.DataFrame:
        b = df[id_col].to_numpy() // bucket_size
        g = pd.DataFrame({"__bucket": b, "__toks": df[tokens_col].to_numpy()})
        return g.groupby("__bucket", as_index=False)["__toks"].sum()

    # O(n_buckets) rows on the driver — bounded by construction.
    sums = ds.map_batches(bucket_sums, batch_format="pandas").to_pandas()
    sums = sums.groupby("__bucket", as_index=False)["__toks"].sum() \
               .sort_values("__bucket").reset_index(drop=True)
    bucket_ids = sums["__bucket"].to_numpy(dtype=np.int64)
    toks = sums["__toks"].to_numpy(dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(toks)[:-1]])
    handle = ray.put((bucket_ids, offsets))

    out_cols = keep_cols + [id_col, tokens_col, "seq_first", "seq_last"]

    def assign_spans(df: pd.DataFrame) -> pd.DataFrame:
        # ray.get of the broadcast offsets hits the worker-local plasma
        # cache after the first group on each worker — shipped once, not
        # per group.
        b_ids, b_offs = ray.get(handle)
        df = df.sort_values(id_col, kind="mergesort")
        ids = df[id_col].to_numpy()
        ntok = df[tokens_col].to_numpy().astype(np.int64)
        bucket = ids[0] // bucket_size
        base = b_offs[np.searchsorted(b_ids, bucket)]
        off = base + np.concatenate([[0], np.cumsum(ntok)[:-1]])
        out = df.copy()
        out["seq_first"] = off // seq_tokens
        out["seq_last"] = np.where(
            ntok > 0, (off + ntok - 1) // seq_tokens, off // seq_tokens)
        return out[out_cols]

    ds = ds.map_batches(
        lambda df: df.assign(
            __bucket=df[id_col].to_numpy() // bucket_size),
        batch_format="pandas")
    return ds.groupby("__bucket").map_groups(
        assign_spans, batch_format="pandas")


def grouped_budget_fill(ds, group_col: str, cost_col: str,
                        order_col: str, tiebreak_col: str,
                        budget, n_buckets: int = 64):
    """Keep each group's PREFIX, in a deterministic global order, whose
    running inclusive cost stays within ``budget`` — SQL's

        sum(cost) OVER (PARTITION BY group
                        ORDER BY order, tiebreak
                        ROWS UNBOUNDED PRECEDING) <= budget

    i.e. per-language token/char budget filling: pour documents in
    shuffle order into each language's bucket until the budget is hit.

    Distributed as an ORDER-RANGE-bucketed prefix sum (the sequence-
    packing motif, grouped): ``order_col`` must be uniform in
    [0, 2^32) (the shuffle key), so ``bucket = order * n_buckets >> 32``
    partitions the global order into n_buckets contiguous ranges with no
    block-identity dependence.  Pass 1: per-(group, bucket) cost sums via
    a per-batch combiner — O(groups × n_buckets) rows to the driver,
    whose per-group exclusive scan over ordered buckets yields each
    (group, bucket)'s base offset.  Pass 2: one ``map_groups`` per
    (group, bucket) — vectorized within-range cumsum + base, filter to
    ``run <= budget``.  No full-table driver structure; the broadcast is
    the O(groups × n_buckets) offset table.

    ``budget``: an int, or a callable receiving the grand-total cost
    (computed for free from the pass-1 partials) and returning the int
    budget — e.g. ``lambda total: total // 10``.
    """
    import ray

    ds = ds.materialize()
    nb = np.uint64(n_buckets)

    def _bucket(order_vals: np.ndarray) -> np.ndarray:
        return ((order_vals.astype(np.uint64) * nb) >> np.uint64(32)) \
            .astype(np.int64)

    def bsums(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            group_col: df[group_col],
            "__b": _bucket(df[order_col].to_numpy()),
            "__c": df[cost_col].to_numpy().astype(np.int64),
        })
        return g.groupby([group_col, "__b"], as_index=False,
                         dropna=False)["__c"].sum()

    sums = ds.map_batches(bsums, batch_format="pandas").to_pandas()
    if sums.empty:  # empty corpus: nothing to fill (and no schema to key)
        return ds
    sums = sums.groupby([group_col, "__b"], as_index=False,
                        dropna=False)["__c"].sum() \
               .sort_values([group_col, "__b"], kind="mergesort",
                            na_position="last") \
               .reset_index(drop=True)
    total = int(sums["__c"].sum())
    budget_n = int(budget(total)) if callable(budget) else int(budget)
    sums["__off"] = (sums.groupby(group_col, dropna=False)["__c"].cumsum()
                     - sums["__c"]).astype(np.int64)
    # groups whose bucket starts PAST the budget can be pruned before the
    # second pass ever touches their rows.  <= not <: a bucket whose base
    # offset equals the budget exactly can still contribute zero-cost
    # rows, whose inclusive running sum equals the budget and which the
    # SQL window (run <= budget) keeps.
    live = sums[sums["__off"] <= budget_n]
    handle = ray.put(live[[group_col, "__b", "__off"]])

    keyed = ds.map_batches(
        lambda df: df.assign(__b=_bucket(df[order_col].to_numpy())),
        batch_format="pandas")

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(handle)
        grp, b = g[group_col].iloc[0], g["__b"].iloc[0]
        grp_mask = (offs[group_col].isna() if pd.isna(grp)
                    else offs[group_col] == grp)
        row = offs[grp_mask & (offs["__b"] == b)]
        if row.empty:  # bucket pruned: base offset already past budget
            return g.iloc[0:0].drop(columns="__b")
        base = int(row["__off"].iloc[0])
        g = g.sort_values([order_col, tiebreak_col], kind="mergesort")
        run = base + np.cumsum(g[cost_col].to_numpy().astype(np.int64))
        return g[run <= budget_n].drop(columns="__b")

    return keyed.groupby([group_col, "__b"]).map_groups(
        fill, batch_format="pandas")
