"""Heavy hitters with an EXACT top-k guarantee at bounded exchange.

The classic map-reduce word count (``word_frequencies``) exchanges the
full vocabulary — fine for natural-language corpora, but the vocabulary
of a 100-TB web crawl (urls, hashes, code identifiers) is itself
corpus-sized.  This stage is the bounded-state scale path: the
Misra–Gries / "Frequent" threshold argument (Misra & Gries 1982)
applied per block.

Per block, only items whose block count exceeds ``block_N / (k + 1)``
are emitted as candidates — at most ``k`` per block regardless of
vocabulary size.  The union of per-block survivors is a SUPERSET of
every item with GLOBAL count > ``total_N / (k + 1)``: if an item is
at or below the threshold in every block, summing gives global count
≤ Σ blockᵢ_N/(k+1) = total_N/(k+1).  One exact recount pass restricted
to the broadcast candidate set then yields exact counts, and the
result equals the exact global top-m WHENEVER the m-th count clears
the threshold — which the stage CHECKS at runtime and refuses to
answer wrongly otherwise (raising with the k needed), the same
no-silent-degradation policy as the dedup bucket caps.

Exchange cost: candidates ≤ k × n_blocks rows + one candidate-pruned
recount — independent of vocabulary size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["heavy_hitters_top_m"]


def heavy_hitters_top_m(ds, count_partial, m: int, k: int = 4096,
                        key_col: str = "word", n_col: str = "n",
                        tie_asc: bool = True):
    """Exact global top-``m`` (count DESC, key ASC) via the Frequent
    prefilter + exact recount.

    ``count_partial``: batch -> DataFrame[(key_col, n_col)] per-batch
    exact counts (the combiner).  Returns a DataFrame with columns
    ``(key_col, n_col, "rk")``.  Raises RuntimeError when the
    threshold guarantee cannot certify exactness for this ``m``/``k``
    (never returns a possibly-wrong top-m).
    """
    import ray

    # pass 1: per-block counts -> threshold survivors + (N, max_dropped)
    def survivors(t: pa.Table) -> pd.DataFrame:
        df = count_partial(t)
        n_block = int(df[n_col].sum())
        keep = df[n_col].to_numpy() * (k + 1) > n_block
        out = df[keep].copy()
        stats = pd.DataFrame({key_col: pd.Series([None], dtype=object),
                              n_col: np.array([n_block], dtype=np.int64),
                              "__stat": np.array([1], dtype=np.int8)})
        out["__stat"] = np.int8(0)
        return pd.concat([out, stats], ignore_index=True)

    cand = ds.map_batches(survivors, batch_format="pyarrow").to_pandas()
    if cand.empty and "__stat" not in cand:
        # Ray loses the schema of an empty stream (typed-empty rule)
        return pd.DataFrame({key_col: pd.Series([], dtype=object),
                             n_col: pd.Series([], dtype="int64"),
                             "rk": pd.Series([], dtype="int64")})
    total_n = int(cand.loc[cand["__stat"] == 1, n_col].sum())
    words = cand.loc[cand["__stat"] == 0, key_col].unique()
    if total_n == 0:
        return pd.DataFrame({key_col: pd.Series([], dtype=object),
                             n_col: pd.Series([], dtype="int64"),
                             "rk": pd.Series([], dtype="int64")})
    if len(words) == 0:
        # nonzero corpus but NO block-threshold survivors: nothing is
        # certifiable — refusing beats returning an empty "top-m"
        raise RuntimeError(
            f"heavy_hitters_top_m cannot certify exact top-{m}: no item "
            f"cleared any block's threshold at k={k} (flat distribution "
            f"or k too small; total={total_n})")
    cand_sorted = np.sort(words.astype(object))
    cand_ref = ray.put(cand_sorted)

    # pass 2: exact recount restricted to the broadcast candidate set
    def recount(t: pa.Table) -> pd.DataFrame:
        df = count_partial(t)
        cs = ray.get(cand_ref)
        pos = np.searchsorted(cs, df[key_col].to_numpy(dtype=object))
        pos = np.clip(pos, 0, len(cs) - 1)
        hit = cs[pos] == df[key_col].to_numpy(dtype=object)
        return df[hit]

    counts = ds.map_batches(recount, batch_format="pyarrow").to_pandas()
    exact = counts.groupby(key_col, as_index=False)[n_col].sum()
    exact = exact.sort_values([n_col, key_col],
                              ascending=[False, tie_asc], kind="mergesort")
    top = exact.head(m).reset_index(drop=True)
    # certification: every item OUTSIDE the candidate set has global
    # count <= total_n/(k+1); the top-m is exact iff its m-th count
    # clears that bound (when fewer than m candidates exist, the bound
    # must clear 0 extra rows — certify against the would-be m-th).
    mth = int(top[n_col].iloc[-1]) if len(top) == m else 0
    if len(top) < m or mth * (k + 1) <= total_n:
        raise RuntimeError(
            f"heavy_hitters_top_m cannot certify exact top-{m}: the "
            f"{m}-th count {mth} does not clear total/(k+1) = "
            f"{total_n / (k + 1):.1f}; rerun with k > "
            f"{total_n // max(mth, 1)} (no-silent-degradation policy)")
    top[n_col] = top[n_col].astype(np.int64)
    top["rk"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top
