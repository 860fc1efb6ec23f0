"""Unigram language-model quality scoring (KenLM-lite): train corpus
word frequencies, broadcast the (small, Zipf-truncated) model, score
every document's log-probability in one streaming pass.

The classic perplexity-style quality filter a training-data pipeline
runs before sampling (documents whose token distribution diverges from
the corpus score low).  Generalizes the reference's threshold scorer
(``/root/reference/bin/analyze_joss.py:302-345``: metrics → score →
verdict) to a learned-model scorer with the broadcast-state motif of
``LangIdModel`` (``functions/text.py``).

Scale shape: training = the sorted-run exact keyed sum
(``stages/groupagg.sorted_sum_by_key`` — no per-group aggregate
overhead at vocabulary cardinality) truncated to ``top_k`` words; the
model (word array + int64 log-prob array) broadcasts via ``ray.put``
once; scoring is a pure fused map — ``searchsorted`` probe +
``reduceat`` per-doc sums, no Python per row, no shuffle.

Log-probs are pre-rounded to integer micro-nats PER WORD TYPE
(``round_half_away(1e6 * ln(count/total))``) so every downstream sum is
exact int64 arithmetic — no float summation order anywhere (the
``embedding_norm_stats`` ulp lesson, ADVICE r2)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.numeric import round_half_away as _round_half_away
from ..functions.text import word_count_partial


def train_unigram_model(ds, text_col: str = "text",
                        top_k: int | None = None,
                        batch_size: int = 8192):
    """(sorted word array, int64 logprob_e6 array, oov_logprob_e6, total).

    Tokenization splits on single spaces and drops empty tokens (the
    ``word_frequencies`` convention).  ``top_k`` truncates the vocab to
    the most frequent words (count DESC, word ASC tie-break); words
    outside it score ``oov_logprob_e6`` = logprob of a count-1/2 word —
    the Zipf-truncation that keeps the broadcast model small at corpus
    scale.  With ``top_k=None`` the full vocabulary is kept (exact
    mode, used by the SQL-oracled query)."""
    from .groupagg import sorted_sum_by_key

    def partial(t: pa.Table) -> pd.DataFrame:
        return word_count_partial(
            t.column(text_col).to_numpy(zero_copy_only=False))

    counts = sorted_sum_by_key(
        ds.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow", batch_size=batch_size),
        ["word"], ["n"])
    total = int(counts["n"].sum())
    if top_k is not None and len(counts) > top_k:
        counts = counts.sort_values(["n", "word"],
                                    ascending=[False, True],
                                    kind="mergesort").head(top_k)
    counts = counts.sort_values("word", kind="mergesort")
    vocab = counts["word"].to_numpy(dtype=object)
    if total == 0:
        return vocab, np.empty(0, dtype=np.int64), np.int64(0), 0
    # libm math.log, not np.log: DuckDB's ln() calls libm's log, while
    # numpy's vectorized log can differ by an ulp (SIMD path) — enough to
    # flip the once-per-word-type rounding for a value near a .5e-6
    # boundary and break the hash-exact oracle.  One scalar call per
    # vocabulary TYPE at model build (vocab is top_k-bounded at scale).
    ratios = counts["n"].to_numpy(dtype=np.float64) / total
    lp = _round_half_away(np.array(
        [1e6 * math.log(r) for r in ratios], dtype=np.float64)
    ).astype(np.int64)
    oov = np.int64(_round_half_away(
        np.array([1e6 * math.log(0.5 / total)]))[0])
    return vocab, lp, oov, total


def score_documents(ds, vocab: np.ndarray, lp_e6: np.ndarray,
                    oov_lp_e6: np.int64, text_col: str = "text",
                    batch_size: int = 8192):
    """Append int64 ``logprob_e6`` (sum of per-token micro-nat
    log-probs) and ``n_tokens`` columns — one broadcast, one fused map."""
    import ray

    ref = ray.put((vocab, lp_e6))

    def score(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        per_doc = [[w for w in (x or "").split(" ") if w] for x in texts]
        lens = np.array([len(p) for p in per_doc], dtype=np.int64)
        sums = np.zeros(len(texts), dtype=np.int64)
        nz = np.flatnonzero(lens > 0)
        if nz.size:
            v, lp = ray.get(ref)
            flat = np.array([w for i in nz for w in per_doc[i]],
                            dtype=object)
            idx = np.searchsorted(v, flat)
            idx_c = np.clip(idx, 0, max(len(v) - 1, 0))
            hit = (v[idx_c] == flat) if len(v) else \
                np.zeros(flat.size, dtype=bool)
            tok_lp = np.where(hit, lp[idx_c] if len(v) else 0,
                              oov_lp_e6).astype(np.int64)
            starts = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
            sums[nz] = np.add.reduceat(tok_lp, starts)
        return t.append_column(
            "logprob_e6", pa.array(sums, type=pa.int64())
        ).append_column("n_tokens", pa.array(lens, type=pa.int64()))

    return ds.map_batches(score, batch_format="pyarrow",
                          batch_size=batch_size)


def importance_scores(ds, target_model, base_model, text_col: str = "text",
                      batch_size: int = 8192):
    """DSIR-style importance scoring (Xie et al. 2023, arXiv:2302.03169):
    append int64 ``dsir_e6`` = Σ_tokens (lp_target − lp_base) in integer
    micro-nats — the log importance weight of the doc under the target
    unigram LM relative to the base LM.  ``target_model`` /
    ``base_model`` are (vocab, lp_e6, oov_lp_e6) triples from
    :func:`train_unigram_model`; both broadcast ONCE via ``ray.put``;
    tokenization happens once per doc and probes both vocabs.  All
    arithmetic is exact int64 (per-word-type rounding at model build),
    so scores are bit-identical at any parallelism."""
    import ray

    vt, lpt, oovt = target_model
    vb, lpb, oovb = base_model
    ref = ray.put((vt, lpt, vb, lpb))

    def _probe(v, lp, oov, flat):
        idx = np.searchsorted(v, flat)
        idx_c = np.clip(idx, 0, max(len(v) - 1, 0))
        hit = (v[idx_c] == flat) if len(v) else \
            np.zeros(flat.size, dtype=bool)
        return np.where(hit, lp[idx_c] if len(v) else 0, oov) \
            .astype(np.int64)

    def score(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        per_doc = [[w for w in (x or "").split(" ") if w] for x in texts]
        lens = np.array([len(p) for p in per_doc], dtype=np.int64)
        diffs = np.zeros(len(texts), dtype=np.int64)
        nz = np.flatnonzero(lens > 0)
        if nz.size:
            v_t, lp_t, v_b, lp_b = ray.get(ref)
            flat = np.array([w for i in nz for w in per_doc[i]],
                            dtype=object)
            tok = _probe(v_t, lp_t, oovt, flat) \
                - _probe(v_b, lp_b, oovb, flat)
            starts = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
            diffs[nz] = np.add.reduceat(tok, starts)
        return t.append_column("dsir_e6", pa.array(diffs, type=pa.int64()))

    return ds.map_batches(score, batch_format="pyarrow",
                          batch_size=batch_size)


def train_unigram_models_pair(ds, text_col: str = "text",
                              mask_col: str = "lang",
                              target_value: str = "en",
                              batch_size: int = 8192):
    """Train the base LM (all docs) and the target LM (docs whose
    ``mask_col == target_value``) in ONE corpus pass: the per-batch
    combiner emits (word, n_base, n_target) so the keyed exchange and
    the tokenize work are shared — at corpus scale this halves DSIR's
    training cost vs two :func:`train_unigram_model` calls.  Returns
    ``((vocab_t, lp_t, oov_t, total_t), (vocab_b, lp_b, oov_b,
    total_b))`` with the identical per-word-type micro-nat rounding, so
    results are bit-equal to the two-pass construction."""
    from .groupagg import sorted_sum_by_key

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        keys = t.column(mask_col).to_numpy(zero_copy_only=False)
        base = word_count_partial(texts).rename(columns={"n": "n_base"})
        tgt = word_count_partial(texts[keys == target_value]) \
            .rename(columns={"n": "n_target"})
        out = base.merge(tgt, on="word", how="left")
        # explicit types: an empty pandas frame would convert to a
        # null-typed Arrow word column and split the block schema
        return pa.table({
            "word": pa.array(out["word"].to_numpy(), type=pa.string()),
            "n_base": pa.array(out["n_base"].to_numpy(np.int64)),
            "n_target": pa.array(out["n_target"].fillna(0)
                                 .to_numpy(np.int64))})

    counts = sorted_sum_by_key(
        ds.select_columns([text_col, mask_col]).map_batches(
            partial, batch_format="pyarrow", batch_size=batch_size),
        ["word"], ["n_base", "n_target"])
    counts = counts.sort_values("word", kind="mergesort")

    def _model(sub: pd.DataFrame, col: str):
        total = int(sub[col].sum())
        vocab = sub["word"].to_numpy(dtype=object)
        if total == 0:
            return vocab[:0], np.empty(0, dtype=np.int64), np.int64(0), 0
        ratios = sub[col].to_numpy(dtype=np.float64) / total
        lp = _round_half_away(np.array(
            [1e6 * math.log(r) for r in ratios], dtype=np.float64)
        ).astype(np.int64)
        oov = np.int64(_round_half_away(
            np.array([1e6 * math.log(0.5 / total)]))[0])
        return vocab, lp, oov, total

    base_model = _model(counts, "n_base")
    target_model = _model(counts[counts["n_target"] > 0], "n_target")
    return target_model, base_model


def bigram_logprob_rollup(ds, group_col: str = "lang",
                          text_col: str = "text",
                          broadcast_limit: int = 2_000_000,
                          batch_size: int = 8192):
    """Add-one-smoothed bigram-LM corpus scoring rolled up per group —
    the KenLM-style fluency signal one order above ``unigram_logprob``:
    P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V), scored on the SAME corpus
    the model is trained on (every scored bigram exists in the model,
    so no OOV path; cross-corpus scoring would need one).  Exactness
    discipline: each bigram TYPE's ln is computed once with libm
    ``math.log`` (the ln-parity convention above) and rounded to
    integer micro-nats, so all corpus accumulation is exact int64.

    Two regimes on the model side: at or below ``broadcast_limit``
    bigram types the (w1, w2, lp_e6) table broadcasts once via
    ``ray.put`` and every scoring batch merges locally; beyond it the
    instance stream (group, w1, w2) attaches scores through the
    bucketed ``hash_join`` on the composite key — the model never
    re-pickles per task and never caps silently.  Groups are counted
    over ALL docs (``n_docs``), including token-less ones.
    ``group_col`` must be pre-sentineled by the caller (NULL-group
    convention)."""
    import math

    import ray
    import ray.data as rd

    from ..functions.numeric import round_half_away
    from ..functions.text import word_count_partial
    from .groupagg import sorted_sum_by_key
    from .joins import hash_join

    def bpart(t: pa.Table) -> pd.DataFrame:
        w1l: list[str] = []
        w2l: list[str] = []
        for x in t.column(text_col).to_pylist():
            toks = [w for w in (x or "").split(" ") if w]
            if len(toks) >= 2:
                w1l.extend(toks[:-1])
                w2l.extend(toks[1:])
        if not w1l:
            return pd.DataFrame({"w1": pd.Series([], dtype=object),
                                 "w2": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        return pd.DataFrame({"w1": w1l, "w2": w2l, "n": 1}) \
            .groupby(["w1", "w2"], as_index=False).sum()

    def upart(t: pa.Table) -> pd.DataFrame:
        return word_count_partial(
            t.column(text_col).to_numpy(zero_copy_only=False))

    def dpart(t: pa.Table) -> pd.DataFrame:
        g = pd.Series(t.column(group_col).to_numpy(zero_copy_only=False))
        return pd.DataFrame({group_col: g, "n_docs": 1}) \
            .groupby(group_col, as_index=False).sum()

    docs = sorted_sum_by_key(
        ds.select_columns([group_col]).map_batches(
            dpart, batch_format="pyarrow", batch_size=batch_size),
        [group_col], ["n_docs"])
    _zero = pd.DataFrame({
        group_col: docs[group_col] if len(docs) else
        pd.Series([], dtype=object),
        "n_docs": docs["n_docs"].astype(np.int64) if len(docs) else
        pd.Series([], dtype="int64"),
        "n_bigrams": np.zeros(len(docs), dtype=np.int64),
        "sum_lp_e6": np.zeros(len(docs), dtype=np.int64)})
    big = sorted_sum_by_key(
        ds.select_columns([text_col]).map_batches(
            bpart, batch_format="pyarrow", batch_size=batch_size),
        ["w1", "w2"], ["n"])
    if big.empty:
        return _zero
    uni = sorted_sum_by_key(
        ds.select_columns([text_col]).map_batches(
            upart, batch_format="pyarrow", batch_size=batch_size),
        ["word"], ["n"])
    vocab = len(uni)
    model = big.merge(
        uni.rename(columns={"word": "w1", "n": "c1"}), on="w1")
    ratios = (model["n"].to_numpy(dtype=np.float64) + 1.0) \
        / (model["c1"].to_numpy(dtype=np.float64) + float(vocab))
    model = model.assign(lp_e6=round_half_away(1e6 * np.array(
        [math.log(r) for r in ratios], dtype=np.float64))
        .astype(np.int64))[["w1", "w2", "lp_e6"]]

    _SCORE_EMPTY = pd.DataFrame({
        group_col: pd.Series([], dtype=object),
        "n_bigrams": pd.Series([], dtype="int64"),
        "sum_lp_e6": pd.Series([], dtype="int64")})

    def explode(t: pa.Table) -> pd.DataFrame:
        gl: list = []
        w1l: list[str] = []
        w2l: list[str] = []
        for g, x in zip(t.column(group_col).to_pylist(),
                        t.column(text_col).to_pylist()):
            toks = [w for w in (x or "").split(" ") if w]
            if len(toks) >= 2:
                gl.extend([g] * (len(toks) - 1))
                w1l.extend(toks[:-1])
                w2l.extend(toks[1:])
        return pd.DataFrame({group_col: pd.Series(gl, dtype=object),
                             "w1": pd.Series(w1l, dtype=object),
                             "w2": pd.Series(w2l, dtype=object)})

    if len(model) <= broadcast_limit:
        ref = ray.put(model)

        def score(t: pa.Table, _ref=ref) -> pd.DataFrame:
            inst = explode(t)
            if inst.empty:
                return _SCORE_EMPTY
            m = inst.merge(ray.get(_ref), on=["w1", "w2"])
            return m.groupby(group_col, as_index=False).agg(
                n_bigrams=("lp_e6", "size"), sum_lp_e6=("lp_e6", "sum"))

        rollup = sorted_sum_by_key(
            ds.select_columns([group_col, text_col]).map_batches(
                score, batch_format="pyarrow", batch_size=batch_size),
            [group_col], ["n_bigrams", "sum_lp_e6"])
    else:
        inst_ds = ds.select_columns([group_col, text_col]).map_batches(
            explode, batch_format="pyarrow", batch_size=batch_size)
        joined = hash_join(inst_ds, rd.from_pandas(model),
                           on=["w1", "w2"])

        def jpart(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return _SCORE_EMPTY
            return df.groupby(group_col, as_index=False).agg(
                n_bigrams=("lp_e6", "size"), sum_lp_e6=("lp_e6", "sum"))

        rollup = sorted_sum_by_key(
            joined.map_batches(jpart, batch_format="pandas"),
            [group_col], ["n_bigrams", "sum_lp_e6"])
    if rollup.empty:
        return _zero
    out = docs.merge(rollup, on=group_col, how="left")
    for c in ("n_docs", "n_bigrams", "sum_lp_e6"):
        out[c] = out[c].fillna(0).astype(np.int64)
    return out
