"""Deterministic synthetic pages-table generator (fixtures + bench input).

Mirrors the reference's fixture strategy — tiny inputs with *known
outcomes* (valid/invalid sample sheets at
``/root/reference/tests/fixtures/*.csv`` and the known-pass/known-fail
conformance table in ``/root/reference/README.md:141-147``) — transposed
to the mandated pages payload ``(url, warc_ts, html, text, lang)``.

Everything is a pure function of ``(row_index, seed)`` via counter-based
splitmix64 streams: no wall clock, no RNG state, no external data.  The
same index always produces the same row regardless of batch/block layout,
so fixtures are reproducible at any scale and parallelism.

Seeded violation classes (disjoint by index-modulus; each maps to a
reference check analog, see FIXTURES.md):

==============================  =======================  ==================
class (index rule)              violated check           reference analog
==============================  =======================  ==================
``i % 1000 == 1``               url_format               main.nf:62-66
``i % 1000 == 2``               presence(text NULL)      ProcessRepo.nf:49-72
``i % 1000 == 3``               presence(text empty)     ProcessRepo.nf:49-72
``i % 1000 == 4``               presence(html NULL)      ProcessRepo.nf:49-72
``i % 1000 == 5``               presence(lang NULL)      ProcessRepo.nf:49-81
``i % 1000 == 6``               presence(warc_ts NULL)   ProcessRepo.nf:49-81
``i % 1000 == 13``              referential(lang='xx')   RunAlmanack.nf:77-78
``i % 1000 == 21``              presence(url NULL)       ProcessRepo.nf:49-72
``i % 200 == 9`` (i>0)          uniqueness (url of i-1)  main.nf:101-102
``i % 500 == 11``               uniqueness hot-key       (skew exercise)
``i % 500 == 17``               extraction mismatch      ProcessRepo.nf:41-44
==============================  =======================  ==================
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.extract import synthesize_html
from ..functions.hashing import hash_stream, uniform01
from ..schema import PAGES_SCHEMA

BASE_EPOCH_US = 1735689600_000_000  # 2025-01-01T00:00:00Z in microseconds

LANGS = ["en", "de", "fr", "es", "zh"]
_LANG_CUM = np.array([0.40, 0.58, 0.74, 0.88, 1.00])
# mean word-count per lang differs → per-lang length distributions for drift
_LANG_WORDS = {"en": (30, 90), "de": (34, 96), "fr": (28, 86), "es": (24, 78), "zh": (10, 48)}

VALID_LANGS = set(LANGS)

_DOMAINS = [f"site-{i:02d}.example.org" for i in range(50)]

_VOCAB = (
    "data table row batch query scan filter join merge sort hash shuffle "
    "stream block arrow parquet column schema check verdict page crawl web "
    "text token index store actor pool task node cluster spill limit agg "
    "count sum mean drift profile sketch digest distinct sample salt key "
    "value lang url html byte string record field partition stage source "
    "sink stat report score status pass fail good slow fast small big the"
).split()

HOT_URL = "https://site-00.example.org/hot/burst"


def page_batch(
    indices: np.ndarray,
    seed: int = 42,
    violations: bool = True,
    drift_lang: str | None = None,
    drift_factor: float = 1.0,
) -> pa.Table:
    """Generate one Arrow batch of pages for the given global row indices."""
    idx = np.asarray(indices, dtype=np.int64)
    n = idx.size

    # ---- lang ------------------------------------------------------------
    u_lang = uniform01(idx, channel=1, seed=seed)
    lang_codes = np.searchsorted(_LANG_CUM, u_lang, side="right").clip(0, len(LANGS) - 1)
    langs = np.array(LANGS, dtype=object)[lang_codes]

    # ---- url (Zipf-ish head-heavy domains → natural key skew) ------------
    u_dom = uniform01(idx, channel=2, seed=seed)
    dom_idx = (u_dom * u_dom * len(_DOMAINS)).astype(np.int64).clip(0, len(_DOMAINS) - 1)

    def _url_for(i: np.ndarray, d: np.ndarray) -> list:
        return [f"https://{_DOMAINS[di]}/page/{ii}" for ii, di in zip(i.tolist(), d.tolist())]

    urls = np.array(_url_for(idx, dom_idx), dtype=object)

    # ---- text ------------------------------------------------------------
    u_len = uniform01(idx, channel=3, seed=seed)
    lo = np.array([_LANG_WORDS[l][0] for l in langs], dtype=np.float64)
    hi = np.array([_LANG_WORDS[l][1] for l in langs], dtype=np.float64)
    if drift_lang is not None:
        mask = langs == drift_lang
        lo = np.where(mask, lo * drift_factor, lo)
        hi = np.where(mask, hi * drift_factor, hi)
    n_words = (lo + u_len * (hi - lo)).astype(np.int64).clip(1, None)

    # word ids: one deterministic stream per (row, word position)
    total = int(n_words.sum())
    row_rep = np.repeat(idx, n_words)
    pos = np.concatenate([np.arange(k) for k in n_words]) if n > 0 else np.array([], dtype=np.int64)
    word_ids = (hash_stream(row_rep * np.int64(131) + pos, channel=4, seed=seed) % len(_VOCAB)).astype(np.int64)
    vocab = np.array(_VOCAB, dtype=object)
    words = vocab[word_ids]
    offsets = np.concatenate([[0], np.cumsum(n_words)])
    texts = np.empty(n, dtype=object)
    for r in range(n):
        ws = words[offsets[r] : offsets[r + 1]].tolist()
        # a paragraph break every 12 words
        parts = [" ".join(ws[k : k + 12]) for k in range(0, len(ws), 12)]
        texts[r] = "\n".join(parts)

    # ---- warc_ts ---------------------------------------------------------
    ts_off = (hash_stream(idx, channel=5, seed=seed) % np.uint64(365 * 86400)).astype(np.int64)
    warc_ts = BASE_EPOCH_US + ts_off * 1_000_000

    # ---- violations ------------------------------------------------------
    text_valid = np.ones(n, dtype=bool)
    html_valid = np.ones(n, dtype=bool)
    lang_valid = np.ones(n, dtype=bool)
    ts_valid = np.ones(n, dtype=bool)
    corrupt = np.zeros(n, dtype=bool)
    if violations:
        m1000 = idx % 1000
        bad_url = m1000 == 1
        if bad_url.any():
            urls[bad_url] = [f"not a url {i}" for i in idx[bad_url].tolist()]
        text_valid &= m1000 != 2
        empty_text = m1000 == 3
        texts[empty_text] = ""
        html_valid &= m1000 != 4
        lang_valid &= m1000 != 5
        ts_valid &= m1000 != 6
        ref_bad = m1000 == 13
        langs[ref_bad] = "xx"
        null_url = m1000 == 21
        urls[null_url] = None
        dup = (idx % 200 == 9) & (idx > 0)
        if dup.any():
            prev = idx[dup] - 1
            u_dom_p = uniform01(prev, channel=2, seed=seed)
            dom_p = (u_dom_p * u_dom_p * len(_DOMAINS)).astype(np.int64).clip(0, len(_DOMAINS) - 1)
            urls[dup] = _url_for(prev, dom_p)
        hot = idx % 500 == 11
        urls[hot] = HOT_URL
        corrupt = idx % 500 == 17

    # ---- html ------------------------------------------------------------
    htmls = np.empty(n, dtype=object)
    for r in range(n):
        if not html_valid[r]:
            htmls[r] = None
            continue
        t = texts[r] if texts[r] is not None else ""
        h = synthesize_html(t, title=t[:24])
        if corrupt[r]:
            # perturb inside the first paragraph so extract_text(html) != text
            h = h.replace(b"<p>", b"<p>\xc2\xa0", 1)
        htmls[r] = h
    texts[~text_valid] = None

    return pa.Table.from_arrays(
        [
            pa.array(urls, type=pa.string()),
            pa.array(
                [int(v) if ok else None for v, ok in zip(warc_ts.tolist(), ts_valid.tolist())],
                type=pa.timestamp("us"),
            ),
            pa.array(htmls, type=pa.binary()),
            pa.array(texts, type=pa.string()),
            pa.array([l if ok else None for l, ok in zip(langs.tolist(), lang_valid.tolist())], type=pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def generate_pages_table(n: int, **kwargs) -> pa.Table:
    """Small in-memory fixture (tests / smoke paths)."""
    return page_batch(np.arange(n, dtype=np.int64), **kwargs)


def generate_pages_dataset(n: int, seed: int = 42, violations: bool = True,
                           drift_lang: str | None = None, drift_factor: float = 1.0,
                           override_num_blocks: int | None = None):
    """Distributed generation: ``ray.data.range(n)`` → vectorized map_batches.

    Scales to any n — each task derives its rows purely from the global
    index column, so there is no driver-side loop and no shared state.
    """
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=override_num_blocks)

    def _gen(batch: pa.Table) -> pa.Table:
        return page_batch(
            batch.column("id").to_numpy(zero_copy_only=False),
            seed=seed,
            violations=violations,
            drift_lang=drift_lang,
            drift_factor=drift_factor,
        )

    return ds.map_batches(_gen, batch_format="pyarrow", batch_size=4096)


def write_pages(n: int, out_dir: str, **kwargs) -> str:
    """Materialize a pages fixture to parquet (bench / fixture caching)."""
    generate_pages_dataset(n, **kwargs).write_parquet(out_dir)
    return out_dir
