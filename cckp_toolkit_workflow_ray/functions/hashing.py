"""Deterministic, vectorized hashing primitives.

Everything that depends on randomness in this engine (synthetic data,
minhash permutations, salting, sampling) is derived from counter-based
hash streams so that results are reproducible across runs, block layouts
and parallelism levels — a hard requirement for verdict parity across
``num_cpus=8`` vs ``num_cpus=32`` runs (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_U64 = np.uint64

_GOLDEN = _U64(0x9E3779B97F4A7C15)
_M1 = _U64(0xBF58476D1CE4E5B9)
_M2 = _U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array (public domain
    algorithm, Steele et al.). Deterministic across platforms."""
    with np.errstate(over="ignore"):
        z = (x.astype(_U64) + _GOLDEN).astype(_U64)
        z = (z ^ (z >> _U64(30))) * _M1
        z = (z ^ (z >> _U64(27))) * _M2
        z = z ^ (z >> _U64(31))
    return z


def hash_stream(index: np.ndarray, channel: int, seed: int = 42) -> np.ndarray:
    """A named deterministic uint64 stream per row index.

    ``channel`` separates independent uses (lang choice, length draw, ...).
    """
    base = splitmix64(np.asarray(index, dtype=np.uint64) ^ _U64(seed & 0xFFFFFFFFFFFFFFFF))
    with np.errstate(over="ignore"):
        return splitmix64(base + _U64(channel) * _GOLDEN)


def uniform01(index: np.ndarray, channel: int, seed: int = 42) -> np.ndarray:
    """Deterministic uniform [0,1) doubles per row index."""
    return hash_stream(index, channel, seed).astype(np.float64) / 2.0**64


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Stable uint64 hash of a string/bytes array (pandas SipHash-style
    ``hash_array``; deterministic for a fixed hash key across processes).

    The 16-char hash key is derived from ``seed`` via blake2b so distinct
    seeds give genuinely independent hash functions (a plain
    ``f"{seed:032d}"[:16]`` would be all-zeros for any realistic seed).
    """
    import hashlib

    arr = pd.array(values) if not isinstance(values, (pd.Series, np.ndarray)) else values
    key = hashlib.blake2b(str(seed).encode(), digest_size=8).hexdigest()
    return pd.util.hash_array(np.asarray(arr, dtype=object), hash_key=key, categorize=False).astype(np.uint64)


def byte_kgram_hashes(data: bytes, k: int) -> np.ndarray:
    """Hashes of all k-byte windows of ``data`` (polynomial rolling hash +
    splitmix finalizer), vectorized via strided windows.  Shared by the
    char-shingle dedup path and the winnowing fingerprinter."""
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    arr = np.frombuffer(data, dtype=np.uint8)
    windows = np.lib.stride_tricks.sliding_window_view(arr, k).astype(np.uint64)
    with np.errstate(over="ignore"):
        mult = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
        h = (windows * mult[::-1]).sum(axis=1)
    return splitmix64(h)


def isin_sorted(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Membership mask of ``values`` in a SORTED array, empty-safe.

    The naive ``sorted_arr[clip(searchsorted(...))] == values`` crashes
    with IndexError on an empty array (``&`` does not short-circuit) —
    a bug class found twice in review; every broadcast-membership filter
    must go through this helper."""
    if sorted_arr.size == 0:
        return np.zeros(len(values), dtype=bool)
    pos = np.clip(np.searchsorted(sorted_arr, values), 0, sorted_arr.size - 1)
    return sorted_arr[pos] == values


def shuffle_key(ids: np.ndarray) -> np.ndarray:
    """The deterministic global-shuffle ordering key: Knuth
    multiplicative hash ``(id * 2654435761) % 2^32`` as int64.  ONE
    definition shared by global_shuffle / mixture_sample /
    temperature_mixture and spelled out verbatim in their SQL oracles —
    changing it here without changing the oracles breaks the documented
    "same shuffle order" relationship between the sampling queries."""
    u = np.asarray(ids).astype(np.uint64)
    with np.errstate(over="ignore"):
        return ((u * _U64(2654435761)) % _U64(2**32)).astype(np.int64)
