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
