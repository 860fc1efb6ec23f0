"""Bloom-filter-accelerated cross-corpus dedup.

The web-pipeline staple (Dolma-style "have we crawled this before?"):
a Bloom filter over the snapshot's content keys broadcasts in
``n_bits/8`` bytes REGARDLESS of key count — ~13x smaller than the
16-bytes-per-key sorted-array broadcast of ``anti_join_texts`` at the
same capacity — and the probe classifies every new row locally, so the
only all-to-all exchange left is the exact verification of the
bloom-POSITIVE rows (true duplicates + the ~fpr sliver of false
positives), not the whole new corpus.  Exactness is restored by that
verification join, so the output is byte-identical to the exact
anti-join and the operator stays SQL-oracle-able.

Public algorithm throughout: Bloom (1970) bit array with
Kirsch–Mitzenmacher double hashing (position_i = h1 + i*h2 mod m),
which preserves the standard false-positive bound with only two base
hashes.  Reference behavior anchor: the same "skip what a prior run
already ingested" semantics as the toolkit's re-run short-circuit
(/root/reference/nextflow.config:14 `-resume`), re-expressed as a
corpus-level anti-semi-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ..functions.arrow import table_from_pandas as _table_from_pandas

from ..functions.hashing import splitmix64
from .dedup import _pair_keys

__all__ = ["bloom_from_keys", "bloom_might_contain", "bloom_anti_join_texts"]


def _positions(h1: np.ndarray, h2: np.ndarray, n_hashes: int,
               n_bits: int) -> np.ndarray:
    """(n_rows, n_hashes) bit positions via double hashing.  ``h2`` is
    forced odd so the stride is coprime with the power-of-two ``m`` and
    the k probes of one key never collapse onto one bit."""
    u1 = h1.astype(np.uint64)
    u2 = (h2.astype(np.uint64) | np.uint64(1))
    i = np.arange(n_hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pos = u1[:, None] + i[None, :] * u2[:, None]
    return (pos % np.uint64(n_bits)).astype(np.int64)


def _set_bits(pos: np.ndarray, n_bits: int) -> np.ndarray:
    """Packed uint64 bit array with the given positions set (vectorized:
    one bincount over word indices per distinct bit-in-word offset)."""
    words = np.zeros(n_bits // 64, dtype=np.uint64)
    flat = pos.ravel()
    w = flat >> 6
    b = (flat & 63).astype(np.uint64)
    # group by bit offset: 64 bincounts max, each fully vectorized
    for off in np.unique(b):
        hits = np.unique(w[b == off])
        words[hits] |= np.uint64(1) << off
    return words


def _test_bits(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """All-probes-set mask for an (n_rows, n_hashes) position matrix."""
    bits = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return bits.all(axis=1)


def bloom_from_keys(keys_ds, n_bits: int, n_hashes: int = 7,
                    fanin: int = 32):
    """OR-reduce per-block Bloom fragments into one packed uint64 array.

    ``keys_ds``: Dataset with int64 columns ``k1``/``k2`` (the 128-bit
    content key halves).  Each input block builds a LOCAL ``n_bits``-bit
    fragment and emits it as ONE binary row; fragments then OR-combine
    through a Dataset-native tree (``map_batches`` over ``fanin`` blobs
    per call) so the driver only ever touches the final array — the
    reduce is logarithmic in block count, never O(blocks) driver memory.
    """
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")

    def fragment(t: pa.Table) -> pa.Table:
        h1 = t.column("k1").to_numpy(zero_copy_only=False)
        h2 = t.column("k2").to_numpy(zero_copy_only=False)
        if len(h1) == 0:
            blob = np.zeros(n_bits // 64, dtype=np.uint64).tobytes()
        else:
            pos = _positions(h1, h2, n_hashes, n_bits)
            blob = _set_bits(pos, n_bits).tobytes()
        return pa.table({"blob": pa.array([blob], type=pa.binary())})

    blobs = keys_ds.map_batches(fragment, batch_format="pyarrow",
                                batch_size=None).materialize()

    def or_blobs(t: pa.Table) -> pa.Table:
        acc = np.zeros(n_bits // 64, dtype=np.uint64)
        for blob in t.column("blob"):
            acc |= np.frombuffer(blob.as_py(), dtype=np.uint64)
        return pa.table({"blob": pa.array([acc.tobytes()], type=pa.binary())})

    while blobs.count() > fanin:
        blobs = blobs.map_batches(or_blobs, batch_format="pyarrow",
                                  batch_size=fanin).materialize()
    final = blobs.map_batches(or_blobs, batch_format="pyarrow",
                              batch_size=None).take_all()
    acc = np.zeros(n_bits // 64, dtype=np.uint64)
    for row in final:
        acc |= np.frombuffer(row["blob"], dtype=np.uint64)
    return acc


def bloom_might_contain(words: np.ndarray, h1: np.ndarray, h2: np.ndarray,
                        n_hashes: int = 7) -> np.ndarray:
    """Vectorized membership probe; True = POSSIBLY present (must be
    verified), False = DEFINITELY absent (no false negatives)."""
    if len(h1) == 0:
        return np.zeros(0, dtype=bool)
    n_bits = len(words) * 64
    return _test_bits(words, _positions(h1, h2, n_hashes, n_bits))


def bloom_anti_join_texts(new_ds, existing_ds, text_col: str = "text",
                          n_bits: int = 1 << 23, n_hashes: int = 7,
                          batch_size: int = 65536, n_buckets: int = 64):
    """Keep rows of ``new_ds`` whose exact text appears nowhere in
    ``existing_ds`` — same semantics as ``dedup.anti_join_texts`` (NULLs
    compare equal via the hash key), but the snapshot ships as a Bloom
    filter instead of a key set:

    1. distinct 128-bit snapshot keys (sorted-run distinct, ints only,
       stays a Dataset);
    2. Bloom build over the key Dataset (tree OR-reduce) → ``ray.put``
       once, read per task;
    3. probe: bloom-NEGATIVE new rows are definitely unseen and survive
       with zero exchange; bloom-POSITIVE rows (true dups + ~fpr false
       positives) are exactly verified by a bucketed LEFT anti-join
       against the snapshot key Dataset.

    At 100 TB the win is twofold: the broadcast is ``n_bits/8`` bytes
    independent of snapshot size (vs 16 B/key), and the all-to-all
    verification exchange carries only the positive sliver, not the
    whole new corpus.  Choose ``n_bits ≈ 10 × |snapshot keys|`` for
    ~1 % fpr; an undersized filter degrades GRACEFULLY to more verified
    rows, never to a wrong answer.

    The new side is PROBED TWICE (one pass keeps negatives, one keeps
    positives) — deliberate: a single tagged pass would have to carry
    the wide text column through a materialized intermediate, while two
    streaming probes read the (already pruned) input twice and keep
    everything pipelined.  Callers holding an expensive derived corpus
    should ``materialize()`` it first (the ``incremental_near_dedup``
    convention).
    """
    import ray

    from .groupagg import sorted_distinct_keys
    from .joins import hash_join, restore_plain_ints

    def key_partial(t: pa.Table) -> pa.Table:
        k1, k2 = _pair_keys(t.column(text_col).to_numpy(zero_copy_only=False))
        g = pd.DataFrame({"k1": k1, "k2": k2}).drop_duplicates()
        return _table_from_pandas(g, preserve_index=False)

    keys = sorted_distinct_keys(
        existing_ds.select_columns([text_col])
        .map_batches(key_partial, batch_format="pyarrow",
                     batch_size=batch_size),
        ["k1", "k2"],
    ).materialize()
    if keys.count() == 0:
        return new_ds

    words_ref = ray.put(bloom_from_keys(keys, n_bits, n_hashes))

    def probe(flag_positive: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            h1, h2 = _pair_keys(df[text_col].to_numpy())
            hit = bloom_might_contain(ray.get(words_ref), h1, h2, n_hashes)
            if flag_positive:
                out = df[hit].copy()
                out["k1"], out["k2"] = h1[hit], h2[hit]
                return out
            return df[~hit]

        return fn

    definite = new_ds.map_batches(probe(False), batch_format="pandas",
                                  batch_size=batch_size)
    candidates = new_ds.map_batches(probe(True), batch_format="pandas",
                                    batch_size=batch_size)

    flagged = keys.map_batches(
        lambda df: df.assign(__hit=np.int64(1)), batch_format="pandas")
    j = hash_join(candidates, flagged, on=["k1", "k2"], how="left",
                  n_buckets=n_buckets)

    def keep_joined(df: pd.DataFrame) -> pd.DataFrame:
        mask = df["__hit"].isna().to_numpy()
        return restore_plain_ints(
            df[mask].drop(columns=["k1", "k2", "__hit"]))

    return definite.union(j.map_batches(keep_joined, batch_format="pandas"))
