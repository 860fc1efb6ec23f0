"""Batch-vectorized Levenshtein distance over UTF-8 BYTES.

DuckDB's ``levenshtein()`` operates on the raw UTF-8 byte sequence
(measured: ``levenshtein('héllo','hello') = 2`` — the two-byte ``é``
costs a substitution plus a deletion), so oracle parity requires the
engine to do the same: slice prefixes by CODE POINT (DuckDB ``substr``
is character-based), then measure distance over their encoded bytes.

The DP is vectorized ACROSS pairs: one Python-level loop over the
longest left string (≤ a few hundred prefix bytes), each step a numpy
kernel over (n_pairs × max_right_len).  The row recurrence's
left-to-right dependency (``cur[j] = min(cand[j], cur[j-1] + 1)``)
is resolved without an inner loop by the running-min identity
``cur[j] - j = min_{k<=j}(cand[k] - k)`` → one
``np.minimum.accumulate`` per row.

Provenance: the reference workflow has no fuzzy string matching
(`/root/reference/bin/*.py` checks are exact/regex); this extends the
dedup family with the standard edit-distance verification used after
candidate blocking.
"""

from __future__ import annotations

import numpy as np


def levenshtein_bytes_batch(a_strs, b_strs) -> np.ndarray:
    """Levenshtein distances (int64) between ``a_strs[i]`` and
    ``b_strs[i]`` measured over their UTF-8 bytes, vectorized across
    the pair axis.  Inputs are sequences of Python str."""
    a_bytes = [s.encode("utf-8") for s in a_strs]
    b_bytes = [s.encode("utf-8") for s in b_strs]
    n = len(a_bytes)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.array([len(s) for s in a_bytes], dtype=np.int64)
    lb = np.array([len(s) for s in b_bytes], dtype=np.int64)
    maxa = int(la.max())
    maxb = int(lb.max())
    ans = np.where(la == 0, lb, -1).astype(np.int64)
    if maxa == 0:
        return ans
    A = np.zeros((n, maxa), dtype=np.uint8)
    B = np.zeros((n, maxb), dtype=np.uint8)
    for p, s in enumerate(a_bytes):
        if s:
            A[p, :len(s)] = np.frombuffer(s, dtype=np.uint8)
    for p, s in enumerate(b_bytes):
        if s:
            B[p, :len(s)] = np.frombuffer(s, dtype=np.uint8)

    js = np.arange(maxb + 1, dtype=np.int32)
    prev = np.broadcast_to(js, (n, maxb + 1)).astype(np.int32)
    g = np.empty((n, maxb + 1), dtype=np.int32)
    rows = np.arange(n)
    for i in range(1, maxa + 1):
        if maxb:
            sub = prev[:, :-1] + (A[:, i - 1:i] != B).astype(np.int32)
            cand = np.minimum(prev[:, 1:] + 1, sub)
            g[:, 0] = i
            g[:, 1:] = cand - js[1:]
            np.minimum.accumulate(g, axis=1, out=g)
            cur = g + js
        else:
            cur = np.full((n, 1), i, dtype=np.int32)
        done = la == i
        if done.any():
            ans[done] = cur[rows[done], lb[done]]
        prev = cur
    return ans
