"""Distributed grouped top-k (per-key capping) on sorted runs.

The web-corpus motivation is per-domain capping (keep at most k documents
per domain, best-first): a standard training-data curation step between
dedup and sampling.  The reference's per-key "best row wins" semantics
(`/root/reference/main.nf:101-102` keeps one verdict row per repo) is the
k=1 special case.

Shape — the same sorted-run motif as ``groupagg.sorted_sum_by_key``:

* global ``sort`` on ``key_cols + order_cols`` (one range-partition
  exchange — Ray's cheapest all-to-all);
* per block (``batch_size=None`` → one call per block) every key's rows
  are contiguous AND already in final order, so "first k rows of the
  key's run" is a vectorized rank-within-run filter;
* a key INTERIOR to a block cannot appear in any other block, so its
  head-k is final and stays distributed;
* the ≤2 block-EDGE keys per block may span blocks; each block emits at
  most k rows for each of them, so the driver-side merge is bounded by
  ``2 k × n_blocks`` rows — independent of corpus size and of the number
  of groups.  Merging those rows in global sort order and re-taking
  head-k per key is exact because range partitioning preserves order
  across blocks.

The result is a Dataset of O(|groups| × k) rows that never funnels the
group count through the driver — millions of domains stay distributed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _edge_mask(df: pd.DataFrame, key_cols: list[str]) -> np.ndarray:
    """Rows whose key equals the block's FIRST or LAST row's key, NaN-safe
    (same contract as groupagg.sorted_sum_by_key._edge_mask)."""
    mask = np.zeros(len(df), dtype=bool)
    for pos in (0, -1):
        m = np.ones(len(df), dtype=bool)
        for c in key_cols:
            col = df[c]
            ref = col.iloc[pos]
            if pd.isna(ref):
                m &= col.isna().to_numpy()
            else:
                m &= (col == ref).to_numpy()
        mask |= m
    return mask


def _rank_within_runs(df: pd.DataFrame, key_cols: list[str]) -> np.ndarray:
    """0-based rank of each row within its contiguous key run, vectorized
    and NaN-safe (NaN == NaN for run purposes, matching SQL PARTITION BY)."""
    n = len(df)
    new_run = np.zeros(n, dtype=bool)
    new_run[0] = True
    for c in key_cols:
        col = df[c]
        prev = col.shift()
        same = (col == prev).to_numpy() | (col.isna() & prev.isna()).to_numpy()
        new_run[1:] |= ~same[1:]
    run_id = np.cumsum(new_run) - 1
    starts = np.flatnonzero(new_run)
    return np.arange(n) - starts[run_id]


def grouped_top_k(ds, key_cols: list[str], order_cols: list[str],
                  k: int | None = None,
                  descending: list[bool] | None = None,
                  k_table=None, broadcast_limit: int = 2_000_000):
    """Keep the first ``k`` rows per key under ``ORDER BY order_cols``
    (SQL ``row_number() OVER (PARTITION BY key ORDER BY ...) <= k``
    semantics — make ``order_cols`` end in a tiebreaker column for a
    deterministic result).  Returns a Dataset.

    ``k_table``: optional per-group cap, two regimes (VERDICT r3 #5):

    * a pandas frame with ``key_cols`` + a ``k`` column and at most
      ``broadcast_limit`` rows is broadcast ONCE via ``ray.put`` (never
      re-pickled per task) and merged per block — right for corpus
      sources/languages;
    * a ``ray.data.Dataset`` quota side (or a frame beyond the limit,
      which is promoted automatically) is attached by a bucketed LEFT
      hash join BEFORE the sort — one extra keyed exchange, but the
      quota side never funnels through the driver, so millions of web
      domains work.

    Groups absent from ``k_table`` fall back to ``k`` (or 0 when ``k``
    is None, i.e. dropped).  Used by temperature-based mixture sampling
    where every source gets its own quota.
    """
    import ray
    import ray.data as rd

    if descending is None:
        descending = [False] * len(order_cols)
    default_k = 0 if k is None else int(k)

    k_ref = None
    cap_joined = False
    if k_table is not None and isinstance(k_table, pd.DataFrame) \
            and len(k_table) <= broadcast_limit:
        k_ref = ray.put(k_table)
    elif k_table is not None:
        from .joins import hash_join, restore_plain_ints

        quota_ds = k_table if not isinstance(k_table, pd.DataFrame) else \
            rd.from_pandas(k_table)
        quota_ds = quota_ds.map_batches(
            lambda df: df.rename(columns={"k": "__kcap"}),
            batch_format="pandas")
        data_cols = ds.schema().names
        ds = hash_join(ds, quota_ds, on=list(key_cols), how="left") \
            .map_batches(
                lambda df: restore_plain_ints(
                    df.reindex(columns=data_cols + ["__kcap"])),
                batch_format="pandas")
        cap_joined = True

    sort_cols = list(key_cols) + list(order_cols)
    desc = [False] * len(key_cols) + list(descending)
    sorted_ds = ds.sort(sort_cols, descending=desc)

    def _row_caps(df: pd.DataFrame) -> np.ndarray:
        if cap_joined:
            return df["__kcap"].fillna(default_k).to_numpy(dtype=np.int64)
        if k_ref is None:
            return np.full(len(df), default_k, dtype=np.int64)
        m = df[key_cols].merge(ray.get(k_ref), on=key_cols, how="left")
        return m["k"].fillna(default_k).to_numpy(dtype=np.int64)

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(__edge=pd.Series([], dtype=bool))
        keep = _rank_within_runs(df, key_cols) < _row_caps(df)
        out = df[keep].copy()
        out["__edge"] = _edge_mask(df, key_cols)[keep]
        return out

    # ONE pass over the sorted stream (batch_size=None → one call per
    # block, so "block edge" is well-defined); only the O(groups×k +
    # 2k×blocks) capped result is materialized — the full sorted table
    # streams through and is never pinned in the object store.
    capped = sorted_ds.map_batches(
        block_top, batch_format="pandas", batch_size=None).materialize()

    helper_cols = ["__edge"] + (["__kcap"] if cap_joined else [])
    interior = capped.map_batches(
        lambda df: df[~df["__edge"]].drop(columns=helper_cols),
        batch_format="pandas")
    edge_rows = capped.map_batches(
        lambda df: df[df["__edge"]].drop(columns="__edge"),
        batch_format="pandas").to_pandas()

    if len(edge_rows):
        # Rows arrive in arbitrary block order; re-establish global sort
        # order (range partitioning makes per-key order across blocks the
        # sort order), then take the true head-k per key.
        edge_sorted = edge_rows.sort_values(
            sort_cols, ascending=[not d for d in desc],
            kind="mergesort", na_position="last").reset_index(drop=True)
        final_edge = edge_sorted[
            _rank_within_runs(edge_sorted, key_cols) < _row_caps(edge_sorted)]
        if cap_joined:
            final_edge = final_edge.drop(columns="__kcap")
        if len(final_edge):
            interior = interior.union(rd.from_pandas(
                final_edge.reset_index(drop=True)))
    return interior
