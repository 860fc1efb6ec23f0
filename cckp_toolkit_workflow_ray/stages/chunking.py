"""Fixed-token sequence chunking: split each document into consecutive
chunks of at most ``chunk_tokens`` whitespace tokens — the
training-data packing/pre-tokenization step that turns a cleaned corpus
into model-ready sequences.

Extends the reference's per-record map family (``main.nf:82-88`` one-in
/one-out projections) to the one-in/many-out row expansion a training
pipeline needs (same family as the video frame sampler in
``stages/multimodal.py``).

Scale shape: a pure streaming ``map_batches`` row expansion — no
shuffle, no state, output rows ≈ input tokens / chunk_tokens.  Each
output chunk carries ``(id, chunk_idx, n_tokens, chunk_text)`` so a
downstream tokenizer/packer can stream it without re-reading the parent
document.  Chunk boundaries are deterministic (pure token-index
arithmetic), so a resumed run reproduces identical chunks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def chunk_batch(texts, ids, chunk_tokens: int) -> pa.Table:
    """One (doc) batch → chunk rows.  Tokenization = split on single
    spaces, drop empty tokens (the ``word_frequencies`` / unigram-LM
    corpus convention — SQL-expressible as ``string_split(text, ' ')``
    with empties filtered).  Empty/null docs yield no chunks."""
    out_id, out_idx, out_n, out_text = [], [], [], []
    for i, txt in enumerate(texts):
        words = [w for w in (txt or "").split(" ") if w]
        if not words:
            continue
        n_chunks = (len(words) + chunk_tokens - 1) // chunk_tokens
        for c in range(n_chunks):
            seg = words[c * chunk_tokens:(c + 1) * chunk_tokens]
            out_id.append(ids[i])
            out_idx.append(c)
            out_n.append(len(seg))
            out_text.append(" ".join(seg))
    return pa.table({
        "doc_id": pa.array(np.asarray(out_id, dtype=np.int64)),
        "chunk_idx": pa.array(np.asarray(out_idx, dtype=np.int64)),
        "n_tokens": pa.array(np.asarray(out_n, dtype=np.int64)),
        "chunk_text": pa.array(out_text, type=pa.string()),
    })


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    chunk_tokens: int = 32, batch_size: int = 4096):
    """Dataset-level chunking: one streaming pass, one row per chunk."""
    def fn(t: pa.Table) -> pa.Table:
        return chunk_batch(
            t.column(text_col).to_numpy(zero_copy_only=False),
            t.column(id_col).to_numpy(zero_copy_only=False),
            chunk_tokens)

    return ds.select_columns([text_col, id_col]).map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size)
