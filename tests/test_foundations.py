"""Unit tests for hashing, sketches, extraction, generator determinism."""

import numpy as np
import pyarrow as pa
import pytest

from cckp_toolkit_workflow_ray.functions.extract import extract_text, synthesize_html
from cckp_toolkit_workflow_ray.functions.hashing import hash_stream, hash_strings, uniform01
from cckp_toolkit_workflow_ray.functions.sketches import (
    FixedHistogram,
    HyperLogLog,
    TDigest,
    ks_statistic,
    psi,
)
from cckp_toolkit_workflow_ray.schema import PAGES_SCHEMA, SchemaMismatchError, check_conformance
from cckp_toolkit_workflow_ray.sources.pages import generate_pages_table, page_batch


# ---------------------------------------------------------------- hashing
def test_hash_stream_deterministic_and_channel_independent():
    idx = np.arange(1000)
    a = hash_stream(idx, channel=1)
    b = hash_stream(idx, channel=1)
    c = hash_stream(idx, channel=2)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    u = uniform01(idx, channel=3)
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.05


def test_hash_strings_stable():
    v = ["abc", "def", "abc"]
    h = hash_strings(v)
    assert h[0] == h[2] and h[0] != h[1]
    assert np.array_equal(h, hash_strings(v))


# ---------------------------------------------------------------- sketches
def test_tdigest_quantiles_close_to_exact():
    rng = np.random.default_rng(0)
    vals = rng.normal(100, 15, 50_000)
    td = TDigest()
    for chunk in np.array_split(vals, 37):
        td.add(chunk)
    for q in (0.1, 0.5, 0.9, 0.99):
        exact = np.quantile(vals, q)
        assert abs(td.quantile(q) - exact) < 1.5, q
    assert td.count == 50_000


def test_tdigest_merge_and_serde():
    rng = np.random.default_rng(1)
    vals = rng.exponential(10, 20_000)
    parts = np.array_split(vals, 8)
    digs = [TDigest().add(p) for p in parts]
    merged = digs[0]
    for d in digs[1:]:
        merged.merge(TDigest.from_bytes(d.to_bytes()))
    assert abs(merged.quantile(0.5) - np.quantile(vals, 0.5)) < 0.5
    rt = TDigest.from_bytes(merged.to_bytes())
    assert rt.quantile(0.5) == merged.quantile(0.5)


def test_hll_estimate_and_merge():
    n = 100_000
    h = hash_strings([f"url-{i}" for i in range(n)])
    hll = HyperLogLog()
    hll.add_hashes(h[: n // 2])
    other = HyperLogLog().add_hashes(h[n // 2 :])
    hll.merge(HyperLogLog.from_bytes(other.to_bytes()))
    est = hll.estimate()
    assert abs(est - n) / n < 0.03
    # merge is order-free
    a = HyperLogLog().add_hashes(h[::2])
    b = HyperLogLog().add_hashes(h[1::2])
    ab = HyperLogLog.from_bytes(a.to_bytes()).merge(b)
    ba = HyperLogLog.from_bytes(b.to_bytes()).merge(a)
    assert np.array_equal(ab.registers, ba.registers)


def test_hll_small_cardinality_linear_counting():
    hll = HyperLogLog().add_hashes(hash_strings([f"x{i}" for i in range(100)]))
    assert abs(hll.estimate() - 100) < 3


def test_fixed_histogram_ks_psi():
    edges = np.linspace(0, 100, 21)
    rng = np.random.default_rng(2)
    a = FixedHistogram(edges).add(rng.uniform(0, 100, 10_000))
    b = FixedHistogram(edges).add(rng.uniform(0, 100, 10_000))
    c = FixedHistogram(edges).add(rng.uniform(30, 100, 10_000))
    assert ks_statistic(a, b) < 0.03
    assert ks_statistic(a, c) > 0.2
    assert psi(a, b) < 0.05
    assert psi(a, c) > 0.5
    # merge = add, order-free, exact
    m1 = FixedHistogram.from_bytes(a.to_bytes()).merge(b)
    m2 = FixedHistogram.from_bytes(b.to_bytes()).merge(a)
    assert np.array_equal(m1.counts, m2.counts)


# ---------------------------------------------------------------- extract
@pytest.mark.parametrize(
    "text",
    ["", "hello world", "a\nb\nc", "with & <angle> brackets", "trailing\n", "  spaces  kept "],
)
def test_extract_inverts_synthesize(text):
    assert extract_text(synthesize_html(text, title=text[:10])) == text


# ---------------------------------------------------------------- generator
def test_generator_schema_and_determinism():
    t1 = generate_pages_table(3000)
    t2 = generate_pages_table(3000)
    assert t1.schema.equals(PAGES_SCHEMA)
    assert t1.equals(t2)
    # batch-layout independence: generating in two halves gives identical rows
    h1 = page_batch(np.arange(0, 1500))
    h2 = page_batch(np.arange(1500, 3000))
    assert pa.concat_tables([h1, h2]).equals(t1)


def test_generator_seeded_violations_present():
    t = generate_pages_table(4000).to_pandas()
    assert t["url"].isna().sum() == 4                                    # i%1000==21
    bad_fmt = ~t["url"].str.startswith("https://", na=False) & t["url"].notna()
    assert bad_fmt.sum() == 4                                            # i%1000==1
    assert t["text"].isna().sum() == 4
    assert (t["text"] == "").sum() == 4
    assert t["html"].isna().sum() == 4
    assert t["lang"].isna().sum() == 4
    assert t["warc_ts"].isna().sum() == 4
    assert (t["lang"] == "xx").sum() == 4
    assert t["url"].duplicated(keep=False).sum() > 20  # dups + hot key
    # extraction invariant holds except for the seeded corruptions
    bad = 0
    for _, row in t.iterrows():
        if row["html"] is None or row["text"] is None:
            continue
        if extract_text(row["html"]) != row["text"]:
            bad += 1
    assert bad == 8  # i%500==17 over 4000 rows


def test_generator_drift_variant_shifts_lengths():
    base = generate_pages_table(5000, violations=False).to_pandas()
    drift = generate_pages_table(5000, violations=False, drift_lang="zh", drift_factor=0.4).to_pandas()
    zl_base = base[base.lang == "zh"]["text"].str.len().mean()
    zl_drift = drift[drift.lang == "zh"]["text"].str.len().mean()
    en_base = base[base.lang == "en"]["text"].str.len().mean()
    en_drift = drift[drift.lang == "en"]["text"].str.len().mean()
    assert zl_drift < 0.6 * zl_base
    assert abs(en_drift - en_base) < 1e-9


# ---------------------------------------------------------------- schema gate
def test_schema_conformance_fail_fast():
    check_conformance(PAGES_SCHEMA)
    bad = pa.schema([("uri", pa.string()), ("warc_ts", pa.string())])
    with pytest.raises(SchemaMismatchError, match="missing required column 'url'"):
        check_conformance(bad)


def test_distributed_generation_matches_local(ray_session):
    from cckp_toolkit_workflow_ray.sources.pages import generate_pages_dataset

    keys = ["url", "warc_ts", "text"]  # url alone isn't unique (seeded dups)
    ds = generate_pages_dataset(2000, override_num_blocks=7)
    got = ds.to_pandas().sort_values(keys, kind="mergesort").reset_index(drop=True)
    want = (
        generate_pages_table(2000)
        .to_pandas()
        .sort_values(keys, kind="mergesort")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)


def test_kll_quantiles_and_merge():
    from cckp_toolkit_workflow_ray.functions.sketches import KLL

    rng = np.random.default_rng(3)
    vals = rng.normal(500, 80, 60_000)
    k = KLL()
    for chunk in np.array_split(vals, 23):
        k.add(chunk)
    assert k.count == 60_000
    for q in (0.1, 0.5, 0.9):
        exact = np.quantile(vals, q)
        assert abs(k.quantile(q) - exact) < 12, (q, k.quantile(q), exact)
    # merge of shard sketches ~ bulk sketch
    parts = np.array_split(vals, 6)
    merged = KLL()
    for p in parts:
        merged.merge(KLL().add(p))
    assert merged.count == 60_000
    assert abs(merged.quantile(0.5) - np.quantile(vals, 0.5)) < 15
    # serde roundtrip is exact
    rt = KLL.from_bytes(merged.to_bytes())
    assert rt.quantile(0.5) == merged.quantile(0.5)
    assert rt.count == merged.count


def test_kll_deterministic():
    from cckp_toolkit_workflow_ray.functions.sketches import KLL

    vals = np.arange(10_000, dtype=np.float64)
    a = KLL().add(vals)
    b = KLL().add(vals)
    assert a.quantile(0.25) == b.quantile(0.25)
    assert all(np.array_equal(x, y) for x, y in zip(a.levels, b.levels))


def test_fingerprint64_golden_values():
    """Seeded golden fingerprints (VERDICT r1 #3): any change to the
    rolling hash, winnowing window, or set-hash silently breaks
    cross-version fingerprint joins — pin exact values."""
    from cckp_toolkit_workflow_ray.functions.text import fingerprint64

    assert fingerprint64("the quick brown fox jumps over the lazy dog") \
        == 0xF93B485774BF4B21
    assert fingerprint64("a completely different sentence with other words entirely") \
        == 0x0B86044F05CDAF22
    assert fingerprint64("") == 0
    assert fingerprint64("short") == 0      # below k-gram size -> empty set
    assert fingerprint64(None) == 0


def test_redact_pii_batch_exact_strings():
    from cckp_toolkit_workflow_ray.functions.pii import redact_pii_batch

    t = pa.table({
        "text": pa.array([
            "mail me at bob.smith+x@sub.example.org today",
            "call 555-123-4567 or 555-999-0000 now",
            "host 192.168.1.10 and 10.0.0.1",
            "clean text with no pii",
            None,
            "",
        ]),
    })
    out = redact_pii_batch(t)
    texts = out.column("text").to_pylist()
    assert texts[0] == "mail me at <EMAIL> today"
    assert texts[1] == "call <PHONE> or <PHONE> now"
    assert texts[2] == "host <IP> and <IP>"
    assert texts[3] == "clean text with no pii"
    assert texts[4] is None
    assert texts[5] == ""
    assert out.column("n_email").to_pylist() == [1, 0, 0, 0, 0, 0]
    assert out.column("n_phone").to_pylist() == [0, 2, 0, 0, 0, 0]
    assert out.column("n_ip").to_pylist() == [0, 0, 2, 0, 0, 0]


def test_decontaminate_drops_only_contaminated(ray_session):
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.decontaminate import decontaminate

    bench_snippet = " ".join(f"b{i}" for i in range(13))
    corpus = rd.from_items([
        # contains the benchmark 13-gram mid-document -> dropped
        {"doc_id": 1, "text": "x y " + bench_snippet + " z"},
        # only 12 of the 13 benchmark words -> kept
        {"doc_id": 2, "text": " ".join(f"b{i}" for i in range(12)) + " other"},
        {"doc_id": 3, "text": "completely unrelated text"},
        # shorter than 13 words -> never contaminated
        {"doc_id": 4, "text": "tiny doc"},
        {"doc_id": 5, "text": None},
    ])
    bench = rd.from_items([{"text": "pre " + bench_snippet + " post"},
                           {"text": "short bench doc"}])
    kept = sorted(r["doc_id"]
                  for r in decontaminate(corpus, bench).take_all())
    assert kept == [2, 3, 4, 5]


def test_word_repetition_metrics_hand_values():
    import pandas as pd

    from cckp_toolkit_workflow_ray.functions.text import word_repetition_metrics

    m = word_repetition_metrics(pd.Series(
        ["a a a b", "x y z", "", None, "  padded   spaces  here "]))
    assert m["max_word_count"].tolist() == [3, 1, 0, 0, 1]
    assert m["total_words"].tolist() == [4, 3, 0, 0, 3]
    assert m["distinct_words"].tolist() == [2, 3, 0, 0, 3]


def test_chunk_batch_hand_values():
    from cckp_toolkit_workflow_ray.stages.chunking import chunk_batch

    t = chunk_batch(
        [" ".join(f"w{i}" for i in range(70)),  # 70 tokens -> 32/32/6
         "a  b   c",                            # runs of spaces drop empties
         "", None, "solo"],
        np.array([10, 11, 12, 13, 14], dtype=np.int64), chunk_tokens=32)
    df = t.to_pandas()
    assert df[df.doc_id == 10]["n_tokens"].tolist() == [32, 32, 6]
    assert df[df.doc_id == 10]["chunk_idx"].tolist() == [0, 1, 2]
    assert df[df.doc_id == 10]["chunk_text"].iloc[2] == \
        "w64 w65 w66 w67 w68 w69"
    assert df[df.doc_id == 11]["chunk_text"].tolist() == ["a b c"]
    # empty/null docs yield no chunks
    assert set(df.doc_id) == {10, 11, 14}
    # reassembling chunks reproduces the (space-normalized) document
    joined = " ".join(df[df.doc_id == 10].sort_values("chunk_idx")
                      ["chunk_text"])
    assert joined == " ".join(f"w{i}" for i in range(70))


def test_unigram_model_train_score_hand_values(ray_session):
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.lm_score import (
        score_documents, train_unigram_model)

    ds = rd.from_items([
        {"doc_id": 1, "text": "a a b"},
        {"doc_id": 2, "text": "b c"},
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": None},
    ])
    vocab, lp, oov, total = train_unigram_model(ds)
    assert total == 5
    assert vocab.tolist() == ["a", "b", "c"]
    # counts a=2 b=2 c=1; lp_e6 = round(1e6 * ln(n/5)) half away from zero
    exp = {w: round(1e6 * np.log(n / 5)) for w, n in
           (("a", 2), ("b", 2), ("c", 1))}
    assert dict(zip(vocab.tolist(), lp.tolist())) == exp
    assert oov == round(1e6 * np.log(0.5 / 5))

    scored = {r["doc_id"]: r for r in
              score_documents(ds, vocab, lp, oov).take_all()}
    assert scored[1]["logprob_e6"] == 2 * exp["a"] + exp["b"]
    assert scored[1]["n_tokens"] == 3
    assert scored[3]["logprob_e6"] == 0 and scored[3]["n_tokens"] == 0
    assert scored[4]["logprob_e6"] == 0 and scored[4]["n_tokens"] == 0

    # top_k truncation: keep the 2 most frequent (count DESC, word ASC
    # tie-break -> a, b); c scores as OOV
    vocab2, lp2, oov2, _ = train_unigram_model(ds, top_k=2)
    assert vocab2.tolist() == ["a", "b"]
    scored2 = {r["doc_id"]: r for r in
               score_documents(ds, vocab2, lp2, oov2).take_all()}
    assert scored2[2]["logprob_e6"] == exp["b"] + oov2


def test_re2_whitespace_tokenizer_matches_duckdb():
    """Engine word tokenization must match DuckDB's RE2 '\\s+' exactly —
    including the corner bytes where python diverges: \\x0b (RE2 \\s
    excludes it, python str.split()/re.ASCII include it) and Unicode
    whitespace (NBSP, line separator)."""
    import duckdb

    from cckp_toolkit_workflow_ray.functions.text import re2_words

    fixtures = [
        "plain ascii words",
        "tab\tand\nnewline\rand\fformfeed",
        "vertical\x0btab stays glued",      # \x0b is NOT RE2 whitespace
        "nbsp\xa0stays line sep stays",  # Unicode ws is NOT RE2 ws
        "  leading and trailing  ",
        "", "\x0b", "\t\t",
    ]
    con = duckdb.connect()
    for t in fixtures:
        want = [w for w in con.execute(
            "SELECT string_split_regex(?, '\\s+')", [t]).fetchone()[0]
            if w != ""]
        assert re2_words(t) == want, repr(t)


def test_word_repetition_metrics_re2_semantics():
    """word_repetition_metrics tokenizes like the '\\s+' oracle: \\x0b
    and NBSP glue words together instead of splitting them."""
    import pandas as pd

    from cckp_toolkit_workflow_ray.functions.text import word_repetition_metrics

    out = word_repetition_metrics(pd.Series([
        "a a a",                 # 3 words, 1 distinct
        "a\x0ba a\xa0a",         # \x0b / NBSP glue -> 2 words, 2 distinct
        None,
    ]))
    assert out["total_words"].tolist() == [3, 2, 0]
    assert out["distinct_words"].tolist() == [1, 2, 0]
    assert out["max_word_count"].tolist() == [3, 1, 0]


def test_sorted_distinct_keys_matches_pandas(ray_session):
    """sorted_distinct_keys returns exactly the distinct key rows,
    including a NULL-key group, across many blocks."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.groupagg import sorted_distinct_keys

    rng = np.random.default_rng(3)
    n = 5000
    k1 = rng.integers(0, 80, n).astype(float)
    k1[rng.random(n) < 0.03] = np.nan
    df = pd.DataFrame({"k1": k1, "k2": rng.integers(0, 7, n)})
    ds = rd.from_pandas(df).repartition(16)
    got = sorted_distinct_keys(ds, ["k1", "k2"]).to_pandas()
    want = df.drop_duplicates(["k1", "k2"])
    key = lambda d: sorted(map(tuple, d.fillna(-1).to_numpy().tolist()))
    assert key(got) == key(want)


def test_bpe_regex_matches_duckdb_re2():
    """The BPE-ish piece regex must count like the oracle's RE2 pattern
    on \\x0b / NBSP / non-ASCII-digit text (python-re Unicode \\s and \\d
    would swallow them)."""
    import duckdb

    from cckp_toolkit_workflow_ray.functions.text import bpe_ish_token_count

    con = duckdb.connect()
    for t in ["plain words here", "ab\x0bcd", "ab\xa0cd", "x٣y",
              "mixed 12 punct!? \x0b\xa0"]:
        want = con.execute(
            r"SELECT len(regexp_extract_all(?,"
            r" '[A-Za-z]{1,4}|\d|[^\sA-Za-z\d]'))", [t]).fetchone()[0]
        assert bpe_ish_token_count(t) == want, repr(t)


def test_canonicalize_urls_kernel_parity_with_duckdb():
    """functions/urls.canonicalize_urls must agree with the SQL oracle's
    regexp_replace chain VALUE-FOR-VALUE (both engines are RE2) on the
    canonicalization edge cases: fragments, uppercase scheme/host,
    default ports, www, tracking params in first/middle/last position,
    trailing slashes, NULLs and non-URLs."""
    import duckdb
    import pyarrow as pa

    from cckp_toolkit_workflow_ray.functions.urls import (
        canonicalize_urls, url_hosts)

    urls = pa.array([
        "https://www.src3.example.com/item/42?utm_source=feed",
        "http://src3.example.com/item/42",
        "HTTPS://SRC3.Example.com:443/item/42",
        "https://src3.example.com/item/42/",
        "https://src3.example.com/item/42?ref=a&gclid=xyz&utm_b=2",
        "https://x.com/?utm_a=1&b=2&utm_c=3",
        "https://x.com/p?utm_a=1&utm_b=2&utm_c=3",
        "http://www.X.com:80/A/B/?fbclid=z#frag",
        "https://x.com:8080/p?q=1#frag",
        None, "", "not a url", "ftp://files.example.com/a/",
    ])
    got = canonicalize_urls(urls).to_pylist()

    sql = r"""
    SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(regexp_replace(regexp_replace(
        CASE WHEN regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) <> ''
             THEN lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
                  || regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '', 'g')
             ELSE u END,
        '^http://', 'https://', 'g'),
        '^https://www\.', 'https://', 'g'),
        '^(https://[^/?#:]+):(?:443|80)(/|\?|#|$)', '\1\2', 'g'),
        '&(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*', '', 'g'),
        '\?(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*&', '?', 'g'),
        '\?(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*$', '', 'g'),
        '/$', '', 'g')
    FROM (SELECT regexp_replace(url, '#.*$', '', 'g') AS u FROM t)
    """
    con = duckdb.connect()
    con.register("t", pa.table({"url": urls}))
    want = [r[0] for r in con.execute(sql).fetchall()]
    assert got == want

    # spot-check canonical semantics (all surface forms converge)
    assert got[0] == got[1] == got[2] == got[3] \
        == "https://src3.example.com/item/42"
    assert got[4] == "https://src3.example.com/item/42?ref=a"
    # host lowercased, default port stripped, fbclid dropped, trailing
    # slash stripped — but PATH case preserved (significant by policy)
    assert got[7] == "https://x.com/A/B"

    # host extraction: lowercased, port-stripped, null on non-URLs
    hosts = url_hosts(pa.array([
        "https://X.com:8080/p", "https://a.b.c/q", None, "junk"])).to_pylist()
    assert hosts == ["x.com", "a.b.c", None, None]


def test_heavy_hitters_exact_top_m_and_certification(ray_session):
    """The Frequent prefilter + exact recount must equal the exact
    top-m on a skewed distribution, and must REFUSE (raise) rather
    than return a possibly-wrong top-m when k is too small to certify
    exactness on a flat one."""
    import pandas as pd
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.heavyhitters import (
        heavy_hitters_top_m)

    rng = np.random.default_rng(3)
    # zipf-ish: item i appears ~ 3000 // (i + 1) times
    vals = np.concatenate(
        [np.full(3000 // (i + 1), f"w{i:03d}", dtype=object)
         for i in range(200)])
    rng.shuffle(vals)
    ds = rd.from_pandas(pd.DataFrame({"text": vals})).repartition(7)

    def cp(t):
        u, c = np.unique(
            t.column("text").to_numpy(zero_copy_only=False),
            return_counts=True)
        return pd.DataFrame({"word": u.astype(object),
                             "n": c.astype(np.int64)})

    got = heavy_hitters_top_m(ds, cp, m=10, k=256)
    exact = (pd.Series(vals).value_counts().rename_axis("word")
             .reset_index(name="n")
             .sort_values(["n", "word"], ascending=[False, True])
             .head(10).reset_index(drop=True))
    assert list(got["word"]) == list(exact["word"])
    assert list(got["n"]) == list(exact["n"])
    assert list(got["rk"]) == list(range(1, 11))

    # flat distribution + tiny k: the 10th count cannot clear
    # total/(k+1) -> certification must refuse
    flat = rd.from_pandas(pd.DataFrame(
        {"text": np.array([f"u{i}" for i in range(5000)], dtype=object)}
    )).repartition(4)
    with pytest.raises(RuntimeError, match="cannot certify"):
        heavy_hitters_top_m(flat, cp, m=10, k=8)

    # empty input -> typed empty, not a raise
    empty = rd.from_pandas(pd.DataFrame(
        {"text": pd.Series([], dtype="object")}))
    out = heavy_hitters_top_m(empty, cp, m=10, k=8)
    assert len(out) == 0 and list(out.columns) == ["word", "n", "rk"]


def test_exact_quantiles_unbounded_selection(ray_session):
    """Distributed selection must return bit-exact quantile_disc values
    across extreme float ranges (denormals, ±1e308, mixed signs), drop
    NaN/NULL, and answer NaN on an all-null column."""
    import math

    import pandas as pd
    import ray.data as rd

    from cckp_toolkit_workflow_ray.stages.selection import (
        _flip, _unflip, exact_quantiles_unbounded)

    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.normal(0, 1e3, 4000), rng.exponential(1e-5, 4000),
        -rng.exponential(1e8, 4000),
        np.array([0.0, -0.0, 1e308, -1e308, 5e-324, -5e-324])])
    b = x.view(np.int64)
    assert np.array_equal(_unflip(_flip(b)), b)
    k = _flip(b)
    assert np.allclose(np.sort(x), x[np.argsort(k, kind="stable")])

    df = pd.DataFrame({"value": x})
    df.loc[::97, "value"] = np.nan
    ds = rd.from_pandas(df).repartition(6)
    got = exact_quantiles_unbounded(ds, "value", [0.1, 0.5, 0.9])
    clean = np.sort(df["value"].dropna().to_numpy())
    for q, v in got.items():
        assert v == clean[max(1, math.ceil(q * len(clean))) - 1], q

    allnull = rd.from_pandas(pd.DataFrame(
        {"value": pd.Series([np.nan] * 10, dtype="float64")}))
    out = exact_quantiles_unbounded(allnull, "value", [0.5])
    assert math.isnan(out[0.5])


def test_compression_ratio_codec_properties(ray_session):
    """The zlib layer under compression_ratio: deterministic across
    runs, and repetitive text compresses far better than high-entropy
    text (the quality-signal contract)."""
    import zlib

    rep = ("spam " * 400).encode()
    rnd = bytes(((i * 2654435761) >> 7) & 0xFF for i in range(2000))
    assert zlib.compress(rep, 6) == zlib.compress(rep, 6)
    r_rep = len(zlib.compress(rep, 6)) / len(rep)
    r_rnd = len(zlib.compress(rnd, 6)) / len(rnd)
    assert r_rep < 0.05 < 0.5 < r_rnd
