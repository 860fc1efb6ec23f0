"""Text-analysis primitives: language ID, quality scoring, token counting,
document fingerprinting.

Generalizes the reference's content predicates — lowercase keyword
batteries (``/root/reference/bin/analyze_joss.py:133-157``), project-type
classification by surface features (``bin/run_tests.py:41-71``), and
threshold scoring (``bin/analyze_joss.py:302-345``) — into the text ops a
web-corpus pipeline needs.  All are pure, deterministic, and vectorized or
cheap-per-row; stateful pieces (the lang-ID profile) are built once and
broadcast.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .hashing import hash_strings, splitmix64

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# DuckDB's string_split_regex / regexp_replace use RE2, whose \s is
# EXACTLY [\t\n\f\r ] — no \x0b, no Unicode whitespace.  Every engine
# tokenizer that feeds a '\s+' SQL oracle must split on THIS class:
# python str.split() (all Unicode whitespace + \x0b) and even
# re.split(r"\s+", ..., re.ASCII) (includes \x0b) silently diverge on
# vertical-tab / NBSP / line-separator bytes in real web text.
RE2_WS = re.compile(r"[\t\n\f\r ]+")


def re2_words(text) -> list[str]:
    """RE2-``\\s+`` word split with empty tokens dropped — the shared
    tokenization of every word-gram operator whose oracle splits with
    ``string_split_regex(text, '\\s+')``."""
    return [w for w in RE2_WS.split(text or "") if w]

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that with for on".split()
)


# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish subword estimate)
# ---------------------------------------------------------------------------


def whitespace_token_counts(texts: pd.Series) -> np.ndarray:
    """Vectorized whitespace token counts (0 for empty/null)."""
    s = texts.fillna("")
    return np.where(s.str.len() > 0, s.str.count(" ") + 1, 0).astype(np.int64)


# spelled-out RE2 semantics: the oracle's \d is [0-9] and \s is
# [\t\n\f\r ] under RE2, while python-re's Unicode \d/\s would swallow
# \x0b / NBSP / non-ASCII digits and diverge (same rule as RE2_WS above)
_BPE_PIECE_RE = re.compile(r"[A-Za-z]{1,4}|[0-9]|[^\t\n\f\r A-Za-z0-9]")


def bpe_ish_token_count(text: str) -> int:
    """Deterministic BPE-style token estimate: alphabetic runs split into
    ≤4-char pieces, digits and punctuation one token each (a standard
    public approximation of subword tokenizers)."""
    return len(_BPE_PIECE_RE.findall(text or ""))


def bpe_ish_token_counts(texts: pd.Series) -> np.ndarray:
    """Vectorized batch variant (pandas' compiled-regex count kernel —
    VERDICT r1 #9: no per-row findall list comprehension in the hot path)."""
    return texts.fillna("").str.count(_BPE_PIECE_RE.pattern).to_numpy(
        dtype=np.int64)


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def quality_metrics(texts: pd.Series) -> pd.DataFrame:
    """Per-doc quality signals (vectorized): length, word stats,
    punctuation/digit/space ratios, stopword ratio, mean word length."""
    s = texts.fillna("")
    n_chars = s.str.len().to_numpy(dtype=np.int64)
    n_words = whitespace_token_counts(s)
    n_alpha = s.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
    n_digit = s.str.count(r"\d").to_numpy(dtype=np.int64)
    n_punct = s.str.count(r"[^\w\s]").to_numpy(dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_word_len = np.where(n_words > 0, (n_chars - (n_words - 1).clip(0)) / n_words.clip(1), 0.0)
    denom = n_chars.clip(1)
    stop = s.str.lower().str.findall(_WORD_RE).map(
        lambda ws: sum(1 for w in ws if w in STOPWORDS)
    ).to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "n_chars": n_chars,
        "n_words": n_words,
        "punct_ratio": n_punct / denom,
        "digit_ratio": n_digit / denom,
        "alpha_ratio": n_alpha / denom,
        "mean_word_len": mean_word_len,
        "stopword_ratio": np.where(n_words > 0, stop / n_words.clip(1), 0.0),
    })


def quality_score(metrics: pd.DataFrame) -> np.ndarray:
    """Scalar quality in [0,1]: fraction of heuristic gates passed (the
    tri-level scorer consumes this like a pass rate)."""
    gates = [
        metrics["n_words"].to_numpy() >= 5,
        metrics["mean_word_len"].to_numpy() <= 12,
        metrics["punct_ratio"].to_numpy() <= 0.2,
        metrics["digit_ratio"].to_numpy() <= 0.3,
        metrics["alpha_ratio"].to_numpy() >= 0.5,
    ]
    return np.mean(np.stack(gates), axis=0)


# ---------------------------------------------------------------------------
# language identification (character n-gram profiles)
# ---------------------------------------------------------------------------


def _trigram_counts(text: str) -> dict:
    t = " " + (text or "").lower() + " "
    out: dict = {}
    for i in range(len(t) - 2):
        g = t[i : i + 3]
        out[g] = out.get(g, 0) + 1
    return out


class LangIdModel:
    """N-gram heuristic language identifier.

    Train: top-N trigram frequency profile per language from labelled
    sample text.  Predict: cosine similarity between a document's trigram
    counts and each profile.  Built once on the driver (small sample),
    broadcast to workers; prediction is per-row but dict-based and cheap.
    """

    def __init__(self, profiles: dict[str, dict]):
        self.profiles = profiles
        self._norms = {
            lang: float(np.sqrt(sum(v * v for v in prof.values())))
            for lang, prof in profiles.items()
        }

    @classmethod
    def train(cls, texts_by_lang: dict[str, list[str]], top_n: int = 300) -> "LangIdModel":
        profiles = {}
        for lang, texts in sorted(texts_by_lang.items()):
            counts: dict = {}
            for t in texts:
                for g, c in _trigram_counts(t).items():
                    counts[g] = counts.get(g, 0) + c
            top = dict(sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n])
            profiles[lang] = top
        return cls(profiles)

    def predict(self, text: str) -> str:
        counts = _trigram_counts(text)
        if not counts:
            return "unknown"
        norm_d = float(np.sqrt(sum(v * v for v in counts.values())))
        best_lang, best_sim = "unknown", -1.0
        for lang in sorted(self.profiles):
            prof = self.profiles[lang]
            dot = sum(c * prof.get(g, 0) for g, c in counts.items())
            sim = dot / (norm_d * self._norms[lang]) if self._norms[lang] else 0.0
            if sim > best_sim:
                best_lang, best_sim = lang, sim
        return best_lang

    # -- vectorized batch path ------------------------------------------
    # Trigrams are encoded as exact uint64 keys (3 code points < 2^21
    # each → c0·2^42 + c1·2^21 + c2, a bijection), so the whole batch is
    # one utf-32 decode + one lexsort; the per-(doc,lang) dot products
    # are INTEGER sums (counts × integer profile weights, < 2^53), so
    # every float the batch path produces — dot, norm, similarity — is
    # bit-identical to the scalar ``predict`` path.

    @staticmethod
    def _tri_key(codes: np.ndarray) -> np.ndarray:
        c = codes.astype(np.uint64)
        P = np.uint64(1 << 21)
        return c[:-2] * P * P + c[1:-1] * P + c[2:]

    def _vocab(self):
        if not hasattr(self, "_vocab_keys"):
            langs = sorted(self.profiles)
            keyset = sorted({g for p in self.profiles.values() for g in p})
            keys = np.array([
                int(self._tri_key(np.frombuffer(
                    g.encode("utf-32-le"), dtype=np.uint32))[0])
                for g in keyset], dtype=np.uint64) if keyset else \
                np.empty(0, dtype=np.uint64)
            order = np.argsort(keys)
            w = np.zeros((len(langs), len(keyset)), dtype=np.int64)
            for li, lang in enumerate(langs):
                for gi, g in enumerate(keyset):
                    w[li, gi] = self.profiles[lang].get(g, 0)
            self._vocab_keys = keys[order]
            self._vocab_w = w[:, order]
            self._langs_arr = np.array(langs, dtype=object)
            self._lang_norms = np.array([self._norms[lg] for lg in langs])
        return self._vocab_keys, self._vocab_w, self._langs_arr, self._lang_norms

    def predict_batch(self, texts) -> np.ndarray:
        """Vectorized ``predict`` over a sequence of (possibly None)
        texts; returns an object array of language labels, element-wise
        identical to ``[predict(t or "") for t in texts]``."""
        n = len(texts)
        out = np.full(n, "unknown", dtype=object)
        if n == 0:
            return out
        vocab, W, langs, lang_norms = self._vocab()
        padded = [" " + (t or "").lower() + " " for t in texts]
        lens = np.array([len(p) for p in padded], dtype=np.int64)
        codes = np.frombuffer("".join(padded).encode("utf-32-le"),
                              dtype=np.uint32)
        if codes.size < 3:
            return out
        keys_all = self._tri_key(codes)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        inside = doc_of[:-2] == doc_of[2:]        # window within one doc
        wdoc, wkey = doc_of[:-2][inside], keys_all[inside]
        if wkey.size == 0:
            return out
        # run-length (doc, key) counts via one lexsort
        order = np.lexsort((wkey, wdoc))
        wdoc, wkey = wdoc[order], wkey[order]
        new = np.r_[True, (wdoc[1:] != wdoc[:-1]) | (wkey[1:] != wkey[:-1])]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.r_[starts, wkey.size]).astype(np.int64)
        tdoc, tkey = wdoc[starts], wkey[starts]
        # per-doc squared norm (exact integer sum)
        nd2 = np.zeros(n, dtype=np.int64)
        np.add.at(nd2, tdoc, cnt * cnt)
        # per-(doc, lang) integer dots over vocab-matched trigrams
        pos = np.searchsorted(vocab, tkey)
        pos_c = np.minimum(pos, max(len(vocab) - 1, 0))
        hit = (vocab[pos_c] == tkey) if len(vocab) else \
            np.zeros(tkey.size, dtype=bool)
        dots = np.zeros((n, len(langs)), dtype=np.int64)
        if hit.any():
            np.add.at(dots, tdoc[hit],
                      cnt[hit, None] * W[:, pos_c[hit]].T)
        norm_d = np.sqrt(nd2.astype(np.float64))
        denom = norm_d[:, None] * lang_norms[None, :]
        sims = np.zeros((n, len(langs)), dtype=np.float64)
        ok = denom > 0
        sims[ok] = dots.astype(np.float64)[ok] / denom[ok]
        has_tri = nd2 > 0
        if len(langs):
            best = np.argmax(sims, axis=1)    # ties → first (sorted) lang
            out[has_tri] = langs[best[has_tri]]
        return out


# ---------------------------------------------------------------------------
# document fingerprinting (winnowing over rolling hashes)
# ---------------------------------------------------------------------------


def winnow_from_hashes(h: np.ndarray, window: int = 16) -> np.ndarray:
    """The winnowing SELECTION over an already-computed k-gram hash
    sequence: min per complete sliding window (or the single global min
    for short sequences), deduplicated.  Split out so callers that
    already hold the hash sequence (the winnow_verify oracle export)
    don't recompute it."""
    if h.size == 0:
        return np.empty(0, dtype=np.uint64)
    if h.size <= window:
        return np.unique(h.min(keepdims=True))
    return np.unique(
        np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1))


def winnow_fingerprint(text: str, k: int = 8, window: int = 16) -> np.ndarray:
    """Winnowing fingerprint (Schleimer et al.): rolling k-gram hashes,
    minimum per sliding window, deduplicated.  Deterministic; two
    documents sharing long substrings share fingerprint values."""
    b = (text or "").encode("utf-8", "ignore")
    if len(b) < k:
        return np.empty(0, dtype=np.uint64)
    from .hashing import byte_kgram_hashes

    return winnow_from_hashes(byte_kgram_hashes(b, k), window)


def fingerprint64(text: str) -> int:
    """One 64-bit document fingerprint: hash of the winnowed set."""
    fp = winnow_fingerprint(text)
    if fp.size == 0:
        return 0
    with np.errstate(over="ignore"):
        acc = np.uint64(0xCBF29CE484222325)
        for v in np.sort(fp):
            acc = splitmix64(np.array([acc ^ v], dtype=np.uint64))[0]
    return int(acc)


# ---------------------------------------------------------------------------
# word-repetition metrics (Gopher-style repetition filters)
# ---------------------------------------------------------------------------


def word_repetition_metrics(texts: pd.Series) -> pd.DataFrame:
    """Per-doc repetition metrics (the Gopher / MassiveText quality-filter
    family): ``max_word_count`` (count of the most frequent word),
    ``total_words``, ``distinct_words`` — all int64, 0 for empty/null
    text.  Tokenization = the RE2-``\\s+`` split shared with the SQL
    oracle (``RE2_WS``; python ``str.split()`` would also split \\x0b
    and Unicode whitespace and silently diverge from the oracle).

    Vectorized: one pandas split/explode + two C-level groupbys per
    batch — no Python per row."""
    s = texts.fillna("").reset_index(drop=True)
    w = s.str.split(RE2_WS, regex=True).explode().dropna()
    w = w[w != ""]  # regex split keeps empty edge tokens; the oracle drops them
    n = len(s)
    out = pd.DataFrame({
        "max_word_count": np.zeros(n, dtype=np.int64),
        "total_words": np.zeros(n, dtype=np.int64),
        "distinct_words": np.zeros(n, dtype=np.int64),
    })
    if len(w):
        counts = pd.DataFrame({"r": w.index.to_numpy(), "w": w.to_numpy()}) \
            .groupby(["r", "w"], as_index=False, sort=False).size()
        per = counts.groupby("r")["size"].agg(["max", "sum", "count"])
        out.loc[per.index, "max_word_count"] = per["max"].astype(np.int64)
        out.loc[per.index, "total_words"] = per["sum"].astype(np.int64)
        out.loc[per.index, "distinct_words"] = per["count"].astype(np.int64)
    return out


def word_count_partial(texts: np.ndarray) -> pd.DataFrame:
    """Per-batch word-count combiner shared by ``word_frequencies`` and
    ``train_unigram_model``: split on single spaces, drop empty tokens,
    return the (word, n) counts as an explicitly-typed frame (stable
    schema for empty batches)."""
    words = [w for x in texts for w in (x or "").split(" ") if w]
    if not words:
        return pd.DataFrame({"word": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    u, c = np.unique(np.array(words, dtype=object), return_counts=True)
    return pd.DataFrame({"word": u, "n": c.astype(np.int64)})
