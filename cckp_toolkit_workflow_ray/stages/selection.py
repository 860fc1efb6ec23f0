"""Distributed EXACT order statistics over unbounded domains.

The engine already has exact grouped quantiles for BOUNDED value
domains (``groupagg.exact_grouped_quantiles`` — scale-free via value
counts) and approximate quantiles for unbounded ones (t-digest / KLL
sketches).  This stage closes the remaining cell: EXACT quantiles of an
unbounded numeric column (float64 payments, scores, ...) without a
global sort — the classic distributed-selection motif (iterative
histogram refinement, the k-th-element analog of radix select).

Float64 values map to order-isomorphic int64 keys (the standard IEEE
trick: non-negatives keep their bit pattern, negatives complement all
bits — then one sign-bit XOR to land in SIGNED int64 order), and each
round histograms the surviving key range into ``n_buckets`` equal-width
buckets with ONE pruned column pass (per-batch partial = a bincount;
the driver folds ``n_buckets`` ints) and descends into the bucket
containing the target rank.  The range shrinks ``n_buckets``× per
round, so a 64-bit domain resolves in ≤ ⌈64 / log2(n_buckets)⌉ passes
(6 at the default 4096) — each pass a cheap streaming scan, never an
all-to-all exchange.  The result is an ACTUAL data value, bit-exact,
which is what makes the SQL ``quantile_disc`` comparison hash-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["exact_quantiles_unbounded", "exact_quantiles_unbounded_grouped"]

_SIGN = np.int64(-(2**63))


def _flip(b: np.ndarray) -> np.ndarray:
    """int64 bit patterns of float64 → order-isomorphic int64 keys."""
    return np.where(b >= 0, b, (~b) ^ _SIGN)


def _unflip(k: np.ndarray) -> np.ndarray:
    return np.where(k >= 0, k, ~(k ^ _SIGN))


def exact_quantiles_unbounded(ds, col: str, qs: list[float],
                              n_buckets: int = 4096,
                              batch_size: int = 131072) -> dict[float, float]:
    """Exact ``quantile_disc`` values (1-based rank ``ceil(q·n)``) of a
    float64 column, NULL/NaN-excluded, returned as actual data values.

    One min/max/count pass is shared by all ``qs``; each quantile then
    pays its own ≤6 refinement passes (sharing the first round across
    quantiles is possible but not worth the complexity at ≤3 qs).
    Returns ``{q: value}``; values are NaN when the column has no
    non-null rows (matching SQL's NULL aggregate on empty input).
    """

    def keys_of(t: pa.Table) -> np.ndarray:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        return _flip(x[~np.isnan(x)].view(np.int64))

    def minmax_partial(t: pa.Table) -> pd.DataFrame:
        k = keys_of(t)
        if not k.size:
            return pd.DataFrame({"n": np.array([0], dtype=np.int64),
                                 "lo": np.array([0], dtype=np.int64),
                                 "hi": np.array([0], dtype=np.int64),
                                 "has": np.array([0], dtype=np.int64)})
        return pd.DataFrame({"n": np.array([k.size], dtype=np.int64),
                             "lo": np.array([k.min()], dtype=np.int64),
                             "hi": np.array([k.max()], dtype=np.int64),
                             "has": np.array([1], dtype=np.int64)})

    mm = ds.map_batches(minmax_partial, batch_format="pyarrow",
                        batch_size=batch_size).to_pandas()
    if mm.empty or "n" not in mm or int(mm["n"].sum()) == 0:
        return {q: float("nan") for q in qs}
    n_total = int(mm["n"].sum())
    present = mm[mm["has"] == 1]
    glo, ghi = int(present["lo"].min()), int(present["hi"].max())

    def hist_counts(lo: int, hi: int, width: int) -> np.ndarray:
        """ONE pruned pass: bucket counts of keys inside [lo, hi].
        ``k - lo`` can exceed int64 (lo may be deeply negative while k
        is positive), so the difference wraps through two's complement
        and reinterprets as uint64 — exact for any in-range pair."""
        def partial(t: pa.Table) -> pd.DataFrame:
            k = keys_of(t)
            k = k[(k >= lo) & (k <= hi)]
            if not k.size:
                return pd.DataFrame({"b": pd.Series([], dtype="int64"),
                                     "c": pd.Series([], dtype="int64")})
            with np.errstate(over="ignore"):
                d = (k - np.int64(lo)).view(np.uint64)
            idx = (d // np.uint64(width)).astype(np.int64)
            c = np.bincount(idx, minlength=n_buckets)
            nz = np.nonzero(c)[0]
            return pd.DataFrame({"b": nz.astype(np.int64),
                                 "c": c[nz].astype(np.int64)})

        got = ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=batch_size).to_pandas()
        counts = np.zeros(n_buckets, dtype=np.int64)
        if len(got) and "b" in got:
            g = got.groupby("b")["c"].sum()
            counts[g.index.to_numpy()] = g.to_numpy()
        return counts

    import math

    out: dict[float, float] = {}
    for q in qs:
        # 1-based rank, the same arithmetic as exact_grouped_quantiles
        # (and DuckDB quantile_disc): math.ceil over the float product
        rank = max(1, math.ceil(q * n_total))
        lo, hi, r = glo, ghi, rank  # python ints: exact at any range
        while hi > lo:
            width = max(1, -(-(hi - lo + 1) // n_buckets))  # ceil div
            counts = hist_counts(lo, hi, width)
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, r))
            if b > 0:
                r -= int(cum[b - 1])
            lo = lo + b * width
            hi = min(hi, lo + width - 1)
        out[q] = float(_unflip(np.array([lo], dtype=np.int64))
                       .view(np.float64)[0])
    return out


def exact_quantiles_unbounded_grouped(ds, key: str, col: str,
                                      qs: list[float],
                                      n_buckets: int = 4096,
                                      batch_size: int = 131072
                                      ) -> pd.DataFrame:
    """Per-LOW-cardinality-key exact ``quantile_disc`` over an unbounded
    float64 column — the grouped generalization of
    :func:`exact_quantiles_unbounded` in the SAME number of passes:
    every (key, q) selection state descends simultaneously, so one
    min/max/count pass plus ≤6 refinement passes serve ALL groups and
    quantiles together (each pass's partial loops over the ≤ |keys|·|qs|
    active states — vectorized inside a state, tiny across states).

    String keys must already carry the sentinel-null convention if NULL
    groups are required.  Returns a DataFrame ``(key, q, value)`` with
    NaN values for all-null groups (SQL's NULL quantile)."""

    def kv_of(t: pa.Table):
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        k = t.column(key).to_numpy(zero_copy_only=False)
        ok = ~np.isnan(x)
        return k[ok], _flip(x[ok].view(np.int64))

    def mm_partial(t: pa.Table) -> pd.DataFrame:
        gk, kk = kv_of(t)
        if not kk.size:
            return pd.DataFrame({key: pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64"),
                                 "lo": pd.Series([], dtype="int64"),
                                 "hi": pd.Series([], dtype="int64")})
        df = pd.DataFrame({key: gk, "k": kk})
        g = df.groupby(key, dropna=False).agg(
            n=("k", "size"), lo=("k", "min"), hi=("k", "max"))
        return g.reset_index()

    # per-key totals/ranges (low-card: driver fold is tiny).  The full
    # key UNIVERSE (incl. all-null-value groups) comes from a separate
    # pruned distinct so those groups still get NaN rows.
    mm = ds.map_batches(mm_partial, batch_format="pyarrow",
                        batch_size=batch_size).to_pandas()
    universe = ds.map_batches(
        lambda df: df[[key]].drop_duplicates(),
        batch_format="pandas", batch_size=batch_size).to_pandas()
    all_keys = (universe[key].drop_duplicates().tolist()
                if len(universe) and key in universe else [])
    if mm.empty or "n" not in mm:
        per_key = {}
    else:
        g = mm.groupby(key, dropna=False).agg(
            n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
        per_key = {k: (int(r["n"]), int(r["lo"]), int(r["hi"]))
                   for k, r in g.iterrows()}

    import math

    # state table: one live row per (key, q)
    states = []  # [key, q, lo, hi, r]
    out_rows = []
    for gk in all_keys:
        for q in qs:
            if gk in per_key and per_key[gk][0] > 0:
                n, lo, hi = per_key[gk]
                states.append([gk, q, lo, hi,
                               max(1, math.ceil(q * n))])
            else:
                out_rows.append({key: gk, "q": q, "value": float("nan")})

    while any(s[2] < s[3] for s in states):
        live = [(i, s) for i, s in enumerate(states) if s[2] < s[3]]
        plan = [(i, s[0], s[2], s[3],
                 max(1, -(-(s[3] - s[2] + 1) // n_buckets)))
                for i, s in live]

        def hist_partial(t: pa.Table) -> pd.DataFrame:
            gk, kk = kv_of(t)
            rows_s, rows_b, rows_c = [], [], []
            for sid, skey, lo, hi, width in plan:
                sel = kk[(gk == skey) if not pd.isna(skey)
                         else pd.isna(gk)]
                sel = sel[(sel >= lo) & (sel <= hi)]
                if not sel.size:
                    continue
                with np.errstate(over="ignore"):
                    d = (sel - np.int64(lo)).view(np.uint64)
                c = np.bincount(
                    (d // np.uint64(width)).astype(np.int64),
                    minlength=n_buckets)
                nz = np.nonzero(c)[0]
                rows_s.append(np.full(nz.size, sid, dtype=np.int64))
                rows_b.append(nz.astype(np.int64))
                rows_c.append(c[nz].astype(np.int64))
            if not rows_s:
                return pd.DataFrame({"s": pd.Series([], dtype="int64"),
                                     "b": pd.Series([], dtype="int64"),
                                     "c": pd.Series([], dtype="int64")})
            return pd.DataFrame({"s": np.concatenate(rows_s),
                                 "b": np.concatenate(rows_b),
                                 "c": np.concatenate(rows_c)})

        got = ds.map_batches(hist_partial, batch_format="pyarrow",
                             batch_size=batch_size).to_pandas()
        agg = (got.groupby(["s", "b"])["c"].sum()
               if len(got) and "s" in got else pd.Series(dtype="int64"))
        for sid, skey, lo, hi, width in plan:
            counts = np.zeros(n_buckets, dtype=np.int64)
            if len(agg):
                try:
                    sub = agg.loc[sid]
                    counts[sub.index.to_numpy()] = sub.to_numpy()
                except KeyError:
                    pass
            cum = np.cumsum(counts)
            s = states[sid]
            b = int(np.searchsorted(cum, s[4]))
            if b > 0:
                s[4] -= int(cum[b - 1])
            s[2] = lo + b * width
            s[3] = min(hi, s[2] + width - 1)

    for s in states:
        out_rows.append({key: s[0], "q": s[1],
                         "value": float(_unflip(
                             np.array([s[2]], dtype=np.int64))
                             .view(np.float64)[0])})
    return pd.DataFrame(out_rows)
