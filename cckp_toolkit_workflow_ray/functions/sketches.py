"""Mergeable sketches: t-digest, HyperLogLog, fixed-bin histogram.

The reference profiles each record with ``almanack.table()`` (a metric
list, ``/root/reference/modules/RunAlmanack.nf:68``) and scores thresholds
over the resulting numbers (``bin/analyze_joss.py:302-345``).  At 10^12
rows the per-partition profile must be computed in one streaming pass, so
the engine uses mergeable sketches: per-batch partials are produced inside
``map_batches`` actors and merged per ``lang`` partition.

Determinism policy (SURVEY.md §7.3): *verdict-deciding* quantities must be
bit-identical across block layouts / parallelism levels.

* HyperLogLog merge = elementwise register max → fully order-free. ✔
* FixedHistogram merge = vector add → fully order-free. ✔  Drift verdicts
  (KS / PSI) are computed from histograms only.
* TDigest is order-sensitive at the margin (batch boundaries shift
  centroids); it feeds *reported* quantile estimates in the stats profile,
  never a pass/fail decision.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# t-digest (Dunning's merging digest, k1 scale function) — public algorithm.
# ---------------------------------------------------------------------------


class TDigest:
    __slots__ = ("compression", "means", "weights")

    def __init__(self, compression: float = 200.0, means=None, weights=None):
        self.compression = float(compression)
        self.means = np.asarray(means if means is not None else [], dtype=np.float64)
        self.weights = np.asarray(weights if weights is not None else [], dtype=np.float64)

    # -- construction -------------------------------------------------------
    def add(self, values: np.ndarray) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return self
        self.means = np.concatenate([self.means, values])
        self.weights = np.concatenate([self.weights, np.ones(values.size)])
        self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.compression / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _compress(self):
        """Vectorized k-space binning (Dunning's scale-function clustering):
        sort centroids, bucket by floor(k(q_mid)), merge each bucket with
        one reduceat pass.  Fully numpy — no per-centroid Python loop."""
        if self.means.size <= 1:
            return
        order = np.lexsort((self.weights, self.means))  # stable, deterministic
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        cum = np.cumsum(weights)
        q_mid = (cum - weights / 2.0) / total
        bucket = np.floor(self._k(q_mid)).astype(np.int64)
        # group boundaries where the bucket id changes
        starts = np.flatnonzero(np.concatenate([[True], bucket[1:] != bucket[:-1]]))
        w_sums = np.add.reduceat(weights, starts)
        mw_sums = np.add.reduceat(means * weights, starts)
        self.means = mw_sums / w_sums
        self.weights = w_sums

    # -- queries ------------------------------------------------------------
    @property
    def count(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def cdf(self, x) -> np.ndarray:
        if self.means.size == 0:
            return np.full(np.shape(x), np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return np.interp(np.asarray(x, dtype=np.float64), self.means, cum / self.weights.sum())

    # -- serialization ------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = struct.pack("<dI", self.compression, self.means.size)
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        compression, n = struct.unpack_from("<dI", b)
        off = struct.calcsize("<dI")
        means = np.frombuffer(b, dtype=np.float64, count=n, offset=off)
        weights = np.frombuffer(b, dtype=np.float64, count=n, offset=off + 8 * n)
        return cls(compression, means.copy(), weights.copy())


# ---------------------------------------------------------------------------
# HyperLogLog (dense, p-bit prefix registers) — public algorithm (Flajolet).
# ---------------------------------------------------------------------------


class HyperLogLog:
    __slots__ = ("p", "registers")

    def __init__(self, p: int = 14, registers=None):
        self.p = p
        self.registers = (
            np.zeros(1 << p, dtype=np.uint8) if registers is None else registers
        )

    def add_hashes(self, hashes: np.ndarray) -> "HyperLogLog":
        """Add pre-hashed uint64 values (use functions.hashing.hash_strings)."""
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining 64-p bits, + 1
        cur = rest.copy()
        # vectorized leading-zero count via float log2 trick is imprecise for
        # uint64; do a 6-step binary clz instead (deterministic, fast)
        shift = 32
        cnt = np.zeros(h.size, dtype=np.uint64)
        while shift:
            s = np.uint64(shift)
            high_zero = (cur >> np.uint64(64 - shift)) == 0
            cnt = np.where(high_zero, cnt + s, cnt)
            cur = np.where(high_zero, cur << s, cur)
            shift //= 2
        lz = cnt.astype(np.uint8) + 1
        np.maximum.at(self.registers, idx, lz)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.registers.size)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = float(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)  # linear counting for small cardinality
        return float(est)

    def to_bytes(self) -> bytes:
        return struct.pack("<I", self.p) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        (p,) = struct.unpack_from("<I", b)
        regs = np.frombuffer(b, dtype=np.uint8, count=1 << p, offset=4).copy()
        return cls(p, regs)


# ---------------------------------------------------------------------------
# Fixed-bin histogram — the verdict-deciding distribution sketch.
# ---------------------------------------------------------------------------


class FixedHistogram:
    """Counts over fixed bin edges; merge = add.  Deterministic regardless
    of batch/block layout, so drift verdicts (KS / PSI) computed from it
    are reproducible across parallelism levels."""

    __slots__ = ("edges", "counts")

    def __init__(self, edges: np.ndarray, counts=None):
        self.edges = np.asarray(edges, dtype=np.float64)
        self.counts = (
            np.zeros(self.edges.size + 1, dtype=np.int64)
            if counts is None
            else np.asarray(counts, dtype=np.int64)
        )

    def add(self, values: np.ndarray) -> "FixedHistogram":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size:
            idx = np.searchsorted(self.edges, values, side="right")
            np.add.at(self.counts, idx, 1)
        return self

    def merge(self, other: "FixedHistogram") -> "FixedHistogram":
        self.counts += other.counts
        return self

    @property
    def total(self) -> int:
        return int(self.counts.sum())

    def cdf_at_edges(self) -> np.ndarray:
        tot = self.total
        if tot == 0:
            return np.zeros(self.edges.size)
        return np.cumsum(self.counts[:-1]) / tot

    def to_bytes(self) -> bytes:
        head = struct.pack("<I", self.edges.size)
        return head + self.edges.tobytes() + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "FixedHistogram":
        (n,) = struct.unpack_from("<I", b)
        off = 4
        edges = np.frombuffer(b, dtype=np.float64, count=n, offset=off).copy()
        counts = np.frombuffer(b, dtype=np.int64, count=n + 1, offset=off + 8 * n).copy()
        return cls(edges, counts)


def ks_statistic(a: FixedHistogram, b: FixedHistogram) -> float:
    """Two-sample KS statistic evaluated on the shared bin edges."""
    assert np.array_equal(a.edges, b.edges), "histograms must share edges"
    if a.total == 0 or b.total == 0:
        return float("nan")
    return float(np.max(np.abs(a.cdf_at_edges() - b.cdf_at_edges())))


def psi(expected: FixedHistogram, actual: FixedHistogram, eps: float = 1e-6) -> float:
    """Population Stability Index over shared bins (standard definition)."""
    assert np.array_equal(expected.edges, actual.edges)
    if expected.total == 0 or actual.total == 0:
        return float("nan")
    e = np.clip(expected.counts / expected.total, eps, None)
    a = np.clip(actual.counts / actual.total, eps, None)
    return float(np.sum((a - e) * np.log(a / e)))


# ---------------------------------------------------------------------------
# KLL quantile sketch (Karnin-Lang-Liberty) — public algorithm.
# Deterministic variant: compaction keeps odd/even positions by an
# alternating counter instead of a random coin, so merges are reproducible
# (the classic analysis allows any unbiased selector; alternation keeps the
# rank error bounded in practice and makes results layout-stable, which is
# what the engine's determinism policy wants from a *reported* statistic).
# ---------------------------------------------------------------------------


class KLL:
    __slots__ = ("k", "levels", "_n", "_flip")

    def __init__(self, k: int = 200):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._n = 0
        self._flip = 0

    def _capacity(self, level: int) -> int:
        # geometrically decreasing capacities, floor 8
        c = int(self.k * (2 / 3) ** (len(self.levels) - 1 - level))
        return max(8, c)

    def add(self, values: np.ndarray) -> "KLL":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return self
        self._n += int(values.size)
        self.levels[0] = np.concatenate([self.levels[0], values])
        self._compress()
        return self

    def _compress(self):
        lvl = 0
        while lvl < len(self.levels):
            if self.levels[lvl].size > self._capacity(lvl):
                buf = np.sort(self.levels[lvl], kind="mergesort")
                keep = buf[self._flip % 2 :: 2]
                self._flip += 1
                self.levels[lvl] = np.empty(0, dtype=np.float64)
                if lvl + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[lvl + 1] = np.concatenate([self.levels[lvl + 1], keep])
            lvl += 1

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, buf in enumerate(other.levels):
            if buf.size:
                self.levels[i] = np.concatenate([self.levels[i], buf])
        self._n += other._n
        self._compress()
        return self

    @property
    def count(self) -> int:
        return self._n

    def quantile(self, q: float) -> float:
        items, weights = [], []
        for lvl, buf in enumerate(self.levels):
            if buf.size:
                items.append(buf)
                weights.append(np.full(buf.size, 2**lvl, dtype=np.float64))
        if not items:
            return float("nan")
        v = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="mergesort")
        v, w = v[order], w[order]
        cum = np.cumsum(w) - w / 2.0
        return float(np.interp(q * w.sum(), cum, v))

    def cdf(self, x) -> np.ndarray:
        items, weights = [], []
        for lvl, buf in enumerate(self.levels):
            if buf.size:
                items.append(buf)
                weights.append(np.full(buf.size, 2**lvl, dtype=np.float64))
        if not items:
            return np.full(np.shape(x), np.nan)
        v = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="mergesort")
        v, w = v[order], w[order]
        cum = np.cumsum(w) - w / 2.0
        return np.interp(np.asarray(x, dtype=np.float64), v, cum / w.sum())

    def to_bytes(self) -> bytes:
        parts = [struct.pack("<IqII", self.k, self._n, self._flip, len(self.levels))]
        for buf in self.levels:
            parts.append(struct.pack("<I", buf.size))
            parts.append(buf.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLL":
        k, n, flip, n_levels = struct.unpack_from("<IqII", b)
        off = struct.calcsize("<IqII")
        obj = cls(k)
        obj._n, obj._flip = n, flip
        obj.levels = []
        for _ in range(n_levels):
            (sz,) = struct.unpack_from("<I", b, off)
            off += 4
            obj.levels.append(np.frombuffer(b, dtype=np.float64, count=sz, offset=off).copy())
            off += 8 * sz
        return obj
