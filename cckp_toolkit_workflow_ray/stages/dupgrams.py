"""Duplicated-n-gram fraction analysis (RefinedWeb/Gopher-style).

A standard web-corpus quality signal: for each document, the fraction of
its DISTINCT word n-grams that also occur in at least one OTHER document
corpus-wide.  Documents whose duplicated fraction crosses a threshold are
flagged as boilerplate/template-heavy.  Extends the reference's
per-record quality checks (`/root/reference/main.nf:49-81` presence /
format predicates) to a corpus-global predicate, which is what makes it
an engine problem: the decision for one row needs an aggregate over all
rows.

Scale shape (two regimes, decided by the observed duplicate volume — the
same contract as ``dedup.find_duplicate_int_keys_two_regime``):

* grams are hashed with the 128-bit two-independent-hashes motif
  (decides on hash equality → collision odds ~3e-15), per-doc DISTINCT,
  per-batch combined — the exchange carries ints only, never gram text;
* duplicated grams are found with the sorted-candidate motif
  (``groupagg.candidate_duplicates``): duplicates are the rare case for
  honest web text, so the candidate stream is tiny;
* **broadcast regime** (duplicated-gram set fits one object): one more
  streaming pass over the corpus probes the sorted set per batch
  (vectorized ``_pair_isin`` + ``reduceat`` per doc) and folds straight
  into per-lang partial rollups — no second exchange at all;
* **join regime** (duplicate-heavy corpus): the per-doc gram pairs join
  the duplicated-key Dataset through the bucketed 128-bit hash join,
  and per-doc duplicate counts come off a doc-sorted run (block-interior
  docs final in place, ≤2 edge docs per block merged on the driver) —
  no O(dup_rate × N) driver structure anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ..functions.arrow import table_from_pandas as _table_from_pandas

from ..functions.nulls import restore_null_keys, sentinel_nulls
from ..functions.text import re2_words
from .decontaminate import _gram_hash_pairs, word_ngrams_strict
from .dedup import _pair_isin, find_duplicate_int_keys_two_regime

ROLLUP_COLS = ["n_docs", "n_flagged", "n_dup_grams"]


def _doc_distinct_grams(texts, n: int) -> tuple[list, np.ndarray]:
    """Per-doc DISTINCT n-gram arrays + per-doc counts (0 for short docs)."""
    per_doc = [np.unique(word_ngrams_strict(txt, n)) for txt in texts]
    lens = np.array([g.size for g in per_doc], dtype=np.int64)
    return per_doc, lens


def _sum_rollup(parts):
    # sorted-run reduction: Ray's hash Aggregate pays a multi-second
    # barrier even on the bounded per-lang grid (queries._sum_by_key
    # precedent)
    from .groupagg import sorted_reduce_by_key_ds

    return sorted_reduce_by_key_ds(
        parts, ["lang"], {c: "sum" for c in ROLLUP_COLS})


def dup_ngram_rollup(ds, text_col: str = "text", lang_col: str = "lang",
                     id_col: str = "doc_id", n: int = 5, flag_mult: int = 5,
                     batch_size: int = 8192,
                     broadcast_limit: int = 2_000_000) -> pd.DataFrame:
    """Per-lang rollup of the duplicated-n-gram analysis.

    Returns a DataFrame (lang, n_docs, n_flagged, n_dup_grams) where
    ``n_docs`` counts documents with at least one n-gram (≥ n words),
    ``n_flagged`` those with ``flag_mult * n_dup >= n_grams`` (an integer
    threshold — no float boundary can flip a doc; ``flag_mult=5`` is the
    20 % rule), and ``n_dup_grams`` the per-doc duplicated-distinct-gram
    total.  NULL langs form their own group (SQL GROUP BY semantics).
    """
    import ray

    def gram_count_partial(t: pa.Table) -> pa.Table:
        """batch → per-batch (h1, h2, n) where n = #docs in the batch
        containing the gram (per-doc distinct first)."""
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        per_doc, lens = _doc_distinct_grams(texts, n)
        flat = (np.concatenate([g for g in per_doc if g.size])
                if lens.any() else np.empty(0, dtype=object))
        h1, h2 = _gram_hash_pairs(flat)
        df = pd.DataFrame({"h1": h1, "h2": h2})
        g = df.groupby(["h1", "h2"], as_index=False).size() \
              .rename(columns={"size": "n"})
        return _table_from_pandas(g, preserve_index=False)

    regime, dup = find_duplicate_int_keys_two_regime(
        ds.select_columns([text_col]), gram_count_partial,
        batch_size=batch_size, key_cols=["h1", "h2"],
        broadcast_limit=broadcast_limit)

    if regime == "broadcast":
        bh = dup.sort_values(["h1", "h2"])
        ref = ray.put((np.ascontiguousarray(bh["h1"].to_numpy(np.int64)),
                       np.ascontiguousarray(bh["h2"].to_numpy(np.int64))))

        def probe(t: pa.Table) -> pa.Table:
            texts = t.column(text_col).to_numpy(zero_copy_only=False)
            per_doc, lens = _doc_distinct_grams(texts, n)
            n_dup = np.zeros(len(texts), dtype=np.int64)
            nz = np.flatnonzero(lens > 0)
            if nz.size:
                bh1, bh2 = ray.get(ref)
                flat = np.concatenate([per_doc[i] for i in nz])
                h1, h2 = _gram_hash_pairs(flat)
                hits = _pair_isin(bh1, bh2, h1, h2).astype(np.int64)
                starts = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
                n_dup[nz] = np.add.reduceat(hits, starts)
            has = lens > 0
            df = pd.DataFrame({
                "lang": sentinel_nulls(pd.Series(
                    t.column(lang_col).to_numpy(zero_copy_only=False))),
                "n_docs": has.astype(np.int64),
                "n_flagged": (has & (flag_mult * n_dup >= lens)
                              ).astype(np.int64),
                "n_dup_grams": n_dup,
            })
            out = df.groupby("lang", as_index=False).sum()
            return _table_from_pandas(out, preserve_index=False)

        parts = ds.select_columns([text_col, lang_col]).map_batches(
            probe, batch_format="pyarrow", batch_size=batch_size)
        out = _sum_rollup(parts).to_pandas()
    else:
        out = _dup_rollup_join(ds, dup, text_col, lang_col, id_col, n,
                               flag_mult, batch_size)
    out = restore_null_keys(out, ["lang"])
    for c in ROLLUP_COLS:
        out[c] = out[c].astype(np.int64)
    # SQL's per_doc CTE only admits docs with >= n words, so a lang whose
    # docs are all short has NO row — drop the engine's zero rows to match
    out = out[out["n_docs"] > 0]
    return out.sort_values("lang", na_position="last").reset_index(drop=True)


def _dup_rollup_join(ds, dup_ds, text_col: str, lang_col: str, id_col: str,
                     n: int, flag_mult: int, batch_size: int) -> pd.DataFrame:
    """Duplicate-heavy regime: per-doc duplicate counts via the bucketed
    128-bit hash join + a doc-sorted run; per-lang totals from the
    explode pass.  Only the joined (duplicated) gram stream re-exchanges;
    a doc with zero duplicated grams never leaves its explode block."""
    from .joins import hash_join
    from .ranking import _edge_mask

    def explode(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        langs = sentinel_nulls(pd.Series(
            t.column(lang_col).to_numpy(zero_copy_only=False))).to_numpy()
        per_doc, lens = _doc_distinct_grams(texts, n)
        nz = np.flatnonzero(lens > 0)
        flat = (np.concatenate([per_doc[i] for i in nz])
                if nz.size else np.empty(0, dtype=object))
        h1, h2 = _gram_hash_pairs(flat)
        reps = lens[nz]
        return _table_from_pandas(pd.DataFrame({
            "h1": h1, "h2": h2,
            "doc_id": np.repeat(ids[nz], reps),
            "lang": np.repeat(langs[nz], reps),
            "n_grams": np.repeat(reps, reps),
        }), preserve_index=False)

    def base_partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        # a doc has >=1 distinct n-gram iff it has >= n words — the cheap
        # word-count test; building/hashing every gram here paid a whole
        # extra corpus pass of gram construction (review r3 finding)
        has_grams = np.array([len(re2_words(x)) >= n for x in texts],
                             dtype=np.int64)
        df = pd.DataFrame({
            "lang": sentinel_nulls(pd.Series(
                t.column(lang_col).to_numpy(zero_copy_only=False))),
            "n_docs": has_grams,
            "n_flagged": 0, "n_dup_grams": 0,
        })
        return _table_from_pandas(
            df.groupby("lang", as_index=False).sum(), preserve_index=False)

    base = ds.select_columns([text_col, lang_col]).map_batches(
        base_partial, batch_format="pyarrow", batch_size=batch_size)

    pairs = ds.select_columns([id_col, text_col, lang_col]).map_batches(
        explode, batch_format="pyarrow", batch_size=batch_size)
    dup_keys = dup_ds.map_batches(lambda df: df[["h1", "h2"]],
                                  batch_format="pandas")
    hits = hash_join(pairs, dup_keys, on=["h1", "h2"], how="inner")

    # doc-sorted run over the hit stream: interior docs rolled up in
    # place; the ≤2 edge docs per block merge on the driver.
    sorted_hits = hits.sort(["doc_id"]).materialize()

    _empty = pa.table({"lang": pa.array([], type=pa.string()),
                       **{c: pa.array([], type=pa.int64())
                          for c in ROLLUP_COLS}})

    def interior_rollup(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _empty
        inner = df[~_edge_mask(df, ["doc_id"])]
        if inner.empty:
            return _empty
        g = inner.groupby("doc_id", as_index=False).agg(
            lang=("lang", "first"), n_grams=("n_grams", "first"),
            n_dup=("h1", "size"))
        g["n_flagged"] = (flag_mult * g["n_dup"] >= g["n_grams"]
                          ).astype(np.int64)
        out = g.groupby("lang", as_index=False).agg(
            n_flagged=("n_flagged", "sum"), n_dup_grams=("n_dup", "sum"))
        out["n_docs"] = 0  # doc totals come from the explode pass
        out = out[["lang"] + ROLLUP_COLS]
        for c in ROLLUP_COLS:
            out[c] = out[c].astype(np.int64)
        return _table_from_pandas(out, preserve_index=False)

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return df[_edge_mask(df, ["doc_id"])]

    interior = sorted_hits.map_batches(interior_rollup,
                                       batch_format="pandas",
                                       batch_size=None)
    edges = sorted_hits.map_batches(edge_rows, batch_format="pandas",
                                    batch_size=None).to_pandas()
    rollup = _sum_rollup(base.union(interior)).to_pandas()
    if len(edges):
        g = edges.groupby("doc_id", as_index=False).agg(
            lang=("lang", "first"), n_grams=("n_grams", "first"),
            n_dup=("h1", "size"))
        g["n_flagged"] = (flag_mult * g["n_dup"] >= g["n_grams"]
                          ).astype(np.int64)
        extra = g.groupby("lang", as_index=False).agg(
            n_flagged=("n_flagged", "sum"), n_dup_grams=("n_dup", "sum"))
        rollup = rollup.merge(extra, on="lang", how="outer",
                              suffixes=("", "_e"))
        for c in ("n_flagged", "n_dup_grams"):
            rollup[c] = (rollup[c].fillna(0)
                         + rollup[f"{c}_e"].fillna(0)).astype(np.int64)
            rollup = rollup.drop(columns=f"{c}_e")
        rollup["n_docs"] = rollup["n_docs"].fillna(0).astype(np.int64)
    return rollup


# ---------------------------------------------------------------------------
# exact-substring span dedup (Lee et al. 2022, arXiv:2107.06499 — ExactSubstr)
# ---------------------------------------------------------------------------

SPAN_SCHEMA = {"doc_id": pa.int64(), "span_start": pa.int64(),
               "span_end": pa.int64()}


def _empty_spans() -> pa.Table:
    return pa.table({c: pa.array([], type=t) for c, t in SPAN_SCHEMA.items()})


def _positional_grams(texts, n: int) -> tuple[list, np.ndarray]:
    """Per-doc POSITIONAL n-gram arrays (index = token position) + counts.
    Unlike ``_doc_distinct_grams`` repeats are kept: ExactSubstr counts
    every (doc, pos) occurrence, so a gram repeated twice inside one doc
    is already duplicated."""
    per_doc = [word_ngrams_strict(txt, n) for txt in texts]
    lens = np.array([g.size for g in per_doc], dtype=np.int64)
    return per_doc, lens


def _merge_spans(doc: np.ndarray, pos: np.ndarray, n: int):
    """Merge (doc, pos) duplicated-window starts — sorted by pos within
    each doc run — into maximal token spans [span_start, span_end).
    Windows are length-``n`` so the running end within a doc is
    ``prev_pos + n`` (monotone); a new span starts when the gap exceeds
    it.  Fully vectorized (the gaps-and-islands motif)."""
    if not doc.size:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    brk = np.ones(doc.size, dtype=bool)
    brk[1:] = (doc[1:] != doc[:-1]) | (pos[1:] > pos[:-1] + n)
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], doc.size) - 1
    return doc[starts], pos[starts], pos[ends] + n


def exact_substring_spans(ds, text_col: str = "text", id_col: str = "doc_id",
                          n: int = 5, batch_size: int = 8192,
                          broadcast_limit: int = 2_000_000):
    """ExactSubstr-style span dedup (Lee et al. 2022): a length-``n``
    word window is duplicated when its gram string occurs at more than
    one (doc, pos) corpus-wide (within-doc repeats count); per doc,
    overlapping/adjacent duplicated windows merge into maximal token
    spans — the text a trainer would cut.  Returns a Dataset of
    (doc_id, span_start, span_end) in token coordinates.

    Scale shape mirrors ``dup_ngram_rollup``: 128-bit hashed grams,
    two-regime duplicate detection, and — because one document is one
    row — span merging in the broadcast regime is FINAL per batch (no
    exchange at all after the probe).  The join regime re-exchanges only
    the duplicated-window stream: (doc_id, pos) hits sort once, interior
    docs merge in place, and the ≤2 block-edge docs merge on the driver.
    Grams are compared by 128-bit hash (collision odds ~3e-15); the SQL
    oracle compares exact strings — the paragraph_dedup contract."""
    import ray

    def gram_count_partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        per_doc, lens = _positional_grams(texts, n)
        flat = (np.concatenate([g for g in per_doc if g.size])
                if lens.any() else np.empty(0, dtype=object))
        h1, h2 = _gram_hash_pairs(flat)
        g = pd.DataFrame({"h1": h1, "h2": h2}) \
            .groupby(["h1", "h2"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return _table_from_pandas(g, preserve_index=False)

    regime, dup = find_duplicate_int_keys_two_regime(
        ds.select_columns([text_col]), gram_count_partial,
        batch_size=batch_size, key_cols=["h1", "h2"],
        broadcast_limit=broadcast_limit)

    if regime != "broadcast":
        return _substr_spans_join(ds, dup, text_col, id_col, n, batch_size)

    bh = dup.sort_values(["h1", "h2"])
    ref = ray.put((np.ascontiguousarray(bh["h1"].to_numpy(np.int64)),
                   np.ascontiguousarray(bh["h2"].to_numpy(np.int64))))

    def probe(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        per_doc, lens = _positional_grams(texts, n)
        nz = np.flatnonzero(lens > 0)
        if not nz.size:
            return _empty_spans()
        bh1, bh2 = ray.get(ref)
        flat = np.concatenate([per_doc[i] for i in nz])
        h1, h2 = _gram_hash_pairs(flat)
        hits = _pair_isin(bh1, bh2, h1, h2)
        docrep = np.repeat(ids[nz], lens[nz])
        poscat = np.concatenate([np.arange(l, dtype=np.int64)
                                 for l in lens[nz]])
        # batch rows are whole docs, positions ascend within each — the
        # exact _merge_spans precondition, so spans are final here
        sd, ss, se = _merge_spans(docrep[hits], poscat[hits], n)
        return pa.table({"doc_id": pa.array(sd), "span_start": pa.array(ss),
                         "span_end": pa.array(se)})

    return ds.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pyarrow", batch_size=batch_size)


def _substr_spans_join(ds, dup_ds, text_col: str, id_col: str, n: int,
                       batch_size: int):
    """Duplicate-heavy regime: duplicated-window hits via the bucketed
    128-bit hash join, then one (doc_id, pos) sort; block-interior docs'
    spans are final in place, the ≤2 edge docs per block merge on the
    driver (bounded by 2 × positions-per-doc × n_blocks)."""
    import ray.data as rd

    from .joins import hash_join
    from .ranking import _edge_mask

    def explode(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        per_doc, lens = _positional_grams(texts, n)
        nz = np.flatnonzero(lens > 0)
        flat = (np.concatenate([per_doc[i] for i in nz])
                if nz.size else np.empty(0, dtype=object))
        h1, h2 = _gram_hash_pairs(flat)
        poscat = (np.concatenate([np.arange(l, dtype=np.int64)
                                  for l in lens[nz]])
                  if nz.size else np.empty(0, dtype=np.int64))
        return pa.table({"h1": pa.array(h1), "h2": pa.array(h2),
                         "doc_id": pa.array(np.repeat(ids[nz], lens[nz])),
                         "pos": pa.array(poscat)})

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", batch_size=batch_size)
    dup_keys = dup_ds.map_batches(lambda df: df[["h1", "h2"]],
                                  batch_format="pandas")
    hits = hash_join(pairs, dup_keys, on=["h1", "h2"], how="inner")
    sorted_hits = hits.sort(["doc_id", "pos"]).materialize()

    def interior_spans(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _empty_spans()
        inner = df[~_edge_mask(df, ["doc_id"])]
        sd, ss, se = _merge_spans(inner["doc_id"].to_numpy(np.int64),
                                  inner["pos"].to_numpy(np.int64), n)
        return pa.table({"doc_id": pa.array(sd), "span_start": pa.array(ss),
                         "span_end": pa.array(se)})

    interior = sorted_hits.map_batches(interior_spans,
                                       batch_format="pandas",
                                       batch_size=None)
    edges = sorted_hits.map_batches(
        lambda df: df[_edge_mask(df, ["doc_id"])] if len(df) else df,
        batch_format="pandas", batch_size=None).to_pandas()
    if len(edges):
        e = edges.sort_values(["doc_id", "pos"], kind="mergesort")
        sd, ss, se = _merge_spans(e["doc_id"].to_numpy(np.int64),
                                  e["pos"].to_numpy(np.int64), n)
        if sd.size:
            interior = interior.union(rd.from_arrow(pa.table({
                "doc_id": pa.array(sd), "span_start": pa.array(ss),
                "span_end": pa.array(se)})))
    return interior


def exact_substring_cut(ds, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 5, batch_size: int = 8192,
                        broadcast_limit: int = 2_000_000):
    """Apply the ExactSubstr spans: for every doc with ≥1 duplicated
    span, re-emit (doc_id, kept_text) — the RE2-``\\s+`` tokens outside
    all spans re-joined by single spaces ('' when the whole doc is
    duplicated).  Docs without spans are untouched and never re-emitted
    (the corpus-diff convention of ``paragraph_dedup``).

    Two regimes on the span-table size: spans broadcast via ``ray.put``
    + one cutting pass over the corpus (dup spans are rare in honest web
    text), or a bucketed doc_id hash join + ``groupby.map_groups`` when
    the span table is itself corpus-scale.  Cutting is per-affected-doc
    numpy masking — bounded by the duplicated-doc count, not the corpus.
    """
    import ray
    import ray.data as rd

    from ..functions.text import re2_words

    spans = exact_substring_spans(ds, text_col=text_col, id_col=id_col, n=n,
                                  batch_size=batch_size,
                                  broadcast_limit=broadcast_limit)
    spans = spans.materialize()
    _empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                       "kept_text": pa.array([], type=pa.string())})

    def _cut_one(text: str, ss: np.ndarray, se: np.ndarray) -> str:
        toks = np.array(re2_words(text), dtype=object)
        keep = np.ones(toks.size, dtype=bool)
        for s, e in zip(ss, se):
            keep[s:e] = False
        return " ".join(toks[keep])

    if spans.count() <= broadcast_limit:
        sp = spans.to_pandas()
        if not len(sp):
            return rd.from_arrow(_empty)
        sp = sp.sort_values(["doc_id", "span_start"], kind="mergesort")
        ref = ray.put((np.ascontiguousarray(sp["doc_id"].to_numpy(np.int64)),
                       np.ascontiguousarray(sp["span_start"].to_numpy(np.int64)),
                       np.ascontiguousarray(sp["span_end"].to_numpy(np.int64))))

        def cut_batch(t: pa.Table) -> pa.Table:
            sdoc, ss, se = ray.get(ref)
            ids = t.column(id_col).to_numpy(zero_copy_only=False) \
                   .astype(np.int64)
            lo = np.searchsorted(sdoc, ids, side="left")
            hi = np.searchsorted(sdoc, ids, side="right")
            aff = np.flatnonzero(hi > lo)
            if not aff.size:
                return _empty
            texts = t.column(text_col).to_numpy(zero_copy_only=False)
            kept = [_cut_one(texts[i], ss[lo[i]:hi[i]], se[lo[i]:hi[i]])
                    for i in aff]
            return pa.table({
                "doc_id": pa.array(ids[aff], type=pa.int64()),
                "kept_text": pa.array(kept, type=pa.string())})

        return ds.select_columns([id_col, text_col]).map_batches(
            cut_batch, batch_format="pyarrow", batch_size=batch_size)

    # join regime: only affected docs re-exchange (inner join on doc_id)
    from .joins import hash_join

    joined = hash_join(ds.select_columns([id_col, text_col]), spans,
                       on=[id_col], how="inner")

    def cut_group(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "kept_text": pd.Series([], dtype=object)})
        g = df.sort_values("span_start", kind="mergesort")
        return pd.DataFrame({
            "doc_id": [np.int64(g[id_col].iloc[0])],
            "kept_text": [_cut_one(
                g[text_col].iloc[0],
                g["span_start"].to_numpy(np.int64),
                g["span_end"].to_numpy(np.int64))]})

    return joined.groupby(id_col).map_groups(cut_group,
                                             batch_format="pandas")
