"""Benchmark decontamination: drop training documents that contain any
word n-gram from a (small) benchmark/eval set.

The classic GPT-3/PaLM decontamination rule — a 13-word-gram collision
with an eval benchmark marks the training doc contaminated.  Extends the
reference's referential membership check (``/root/reference/main.nf:101``:
key ∈ allowed set) from scalar keys to n-gram set intersection.

Scale shape: the benchmark side is SMALL BY DEFINITION (eval suites are
thousands of docs, not billions), so its distinct gram set is computed
once, sorted, and broadcast via ``ray.put`` — every corpus batch probes
it with a vectorized 128-bit membership test and never shuffles.  The
corpus side streams: one fused map over the parquet read, grams hashed
per batch (one concatenated array per batch, segment-any via reduceat —
no per-doc Python in the probe).  Membership DECIDES on hash equality,
so it uses the repo's 128-bit two-independent-hashes motif
(``stages/dedup.py`` ``_pair_keys``): false-positive odds ~3e-15 at 1e12
gram comparisons.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ..functions.arrow import table_from_pandas as _table_from_pandas

from ..functions.hashing import hash_strings
from ..functions.text import re2_words
from .dedup import _pair_isin


def word_ngrams_strict(text: str, n: int) -> np.ndarray:
    """All n-word grams (joined by single space) — STRICT: a doc with
    fewer than n words has none (unlike the shingling fallback in
    ``dedup.word_ngram_hashes``, which would let a short doc alias a
    benchmark prefix).  Tokenization is the RE2-``\\s+`` split shared
    with the SQL oracles (``functions.text.re2_words``)."""
    words = re2_words(text)
    if len(words) < n:
        return np.empty(0, dtype=object)
    return np.array([" ".join(words[i:i + n])
                     for i in range(len(words) - n + 1)], dtype=object)


def _gram_hash_pairs(grams: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) as int64 views — the int64 interpretation is used
    CONSISTENTLY on both the benchmark (sort) and corpus (probe) sides,
    so searchsorted order agrees regardless of the sign bit."""
    return (hash_strings(grams, seed=17).view(np.int64),
            hash_strings(grams, seed=18).view(np.int64))


def benchmark_gram_set(bench_ds, text_col: str = "text", n: int = 13,
                       batch_size: int = 4096) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (h1, h2) gram-hash pairs of the benchmark set, sorted by
    (h1, h2) for the vectorized probe.  Centralizes ONLY the benchmark
    gram hashes (16 B per distinct gram) — the documented small side."""
    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        per_doc = [word_ngrams_strict(txt, n) for txt in texts]
        flat = (np.concatenate(per_doc) if per_doc
                else np.empty(0, dtype=object))
        h1, h2 = _gram_hash_pairs(flat)
        df = pd.DataFrame({"h1": h1, "h2": h2})
        return _table_from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    parts = bench_ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size).to_pandas()
    parts = parts.drop_duplicates().sort_values(["h1", "h2"])
    return (parts["h1"].to_numpy(dtype=np.int64),
            parts["h2"].to_numpy(dtype=np.int64))


def flag_contaminated(ds, bench_h1: np.ndarray, bench_h2: np.ndarray,
                      text_col: str = "text", n: int = 13,
                      batch_size: int = 8192):
    """Append a boolean ``contaminated`` column: True iff any of the
    doc's word n-grams hash-matches the benchmark set.  One broadcast
    object, one streaming pass."""
    import ray

    ref = ray.put((np.ascontiguousarray(bench_h1),
                   np.ascontiguousarray(bench_h2)))

    def probe(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        per_doc = [word_ngrams_strict(txt, n) for txt in texts]
        lens = np.array([g.size for g in per_doc], dtype=np.int64)
        flags = np.zeros(len(texts), dtype=bool)
        nz = np.flatnonzero(lens > 0)
        if nz.size:
            bh1, bh2 = ray.get(ref)
            flat = np.concatenate([per_doc[i] for i in nz])
            h1, h2 = _gram_hash_pairs(flat)
            hits = _pair_isin(bh1, bh2, h1, h2).astype(np.int64)
            starts = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
            flags[nz] = np.add.reduceat(hits, starts) > 0
        return t.append_column("contaminated", pa.array(flags))

    return ds.map_batches(probe, batch_format="pyarrow",
                          batch_size=batch_size)


def decontaminate(ds, bench_ds, text_col: str = "text", n: int = 13,
                  batch_size: int = 8192):
    """End-to-end: build the benchmark gram set, drop every contaminated
    doc from ``ds``.  Returns the filtered Dataset."""
    bh1, bh2 = benchmark_gram_set(bench_ds, text_col, n)
    flagged = flag_contaminated(ds, bh1, bh2, text_col, n, batch_size)
    import pyarrow.compute as pc

    return flagged.map_batches(
        lambda t: t.filter(pc.invert(t.column("contaminated")))
                   .drop_columns(["contaminated"]),
        batch_format="pyarrow")
