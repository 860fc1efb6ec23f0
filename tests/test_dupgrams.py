"""Duplicated-n-gram analysis: regime equivalence and edge cases.

The driver-style oracle comparison lives in test_queries_oracle.py
(dup_ngram_flag is SQL-oracled); these tests cover what SQL cannot see —
the forced join regime, short/empty inputs, and NULL langs.
"""

import numpy as np
import pandas as pd
import pandas.testing as pdt
import pytest

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def _rollup(ray_session, ds, **kw):
    from cckp_toolkit_workflow_ray.stages.dupgrams import dup_ngram_rollup

    return dup_ngram_rollup(ds, **kw).reset_index(drop=True)


def test_join_regime_matches_broadcast(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(SF_DOCS, columns=["doc_id", "lang", "text"])
    fast = _rollup(ray_session, ds)
    # broadcast_limit=0 forces the duplicate-heavy path: bucketed 128-bit
    # hash join + doc-sorted-run rollup.  Same answer, different exchange.
    slow = _rollup(ray_session, ds, broadcast_limit=0)
    pdt.assert_frame_equal(fast, slow)
    assert fast["n_flagged"].sum() > 0  # the fixture has template dups


def test_short_docs_produce_no_rows(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "lang": ["en", "en", "de", "de"],
        "text": ["one two three four", "a b", "", None],
    })
    out = _rollup(ray_session, rd.from_pandas(df))
    assert out.empty  # no doc reaches 5 words -> SQL per_doc is empty


def test_flag_rule_and_null_lang(ray_session):
    import ray.data as rd

    # doc 0 and 1 share their full 6-word text (every 5-gram duplicated,
    # flagged); doc 2 is unique (0 dup grams); doc 3 has a NULL lang and
    # shares the same text as 0/1 so the NULL group is flagged too.
    shared = "alpha beta gamma delta epsilon zeta"
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "lang": ["en", "en", "en", None],
        "text": [shared, shared, "one two three four five six seven",
                 shared],
    })
    out = _rollup(ray_session, rd.from_pandas(df))
    en = out[out["lang"] == "en"].iloc[0]
    assert en["n_docs"] == 3 and en["n_flagged"] == 2
    assert en["n_dup_grams"] == 4  # 2 docs x 2 distinct duplicated 5-grams
    null_row = out[out["lang"].isna()].iloc[0]
    assert null_row["n_docs"] == 1 and null_row["n_flagged"] == 1


def test_join_regime_handles_edge_docs(ray_session):
    """Many single-row blocks force every doc onto a block edge in the
    doc-sorted run — the driver-side edge merge must still be exact."""
    import ray.data as rd

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "lang": ["en"] * 6,
        "text": [shared] * 6,
    })
    ds = rd.from_pandas(df).repartition(6)
    out = _rollup(ray_session, ds, broadcast_limit=0)
    en = out.iloc[0]
    assert en["n_docs"] == 6 and en["n_flagged"] == 6
    assert en["n_dup_grams"] == 6 * 4  # 4 distinct 5-grams per doc


# ---------------------------------------------------------------------------
# exact-substring span dedup (ExactSubstr)
# ---------------------------------------------------------------------------


def _spans(ray_session, ds, **kw) -> pd.DataFrame:
    from cckp_toolkit_workflow_ray.stages.dupgrams import \
        exact_substring_spans

    out = exact_substring_spans(ds, n=5, **kw).to_pandas()
    if not len(out):
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("doc_id", "span_start", "span_end")})
    return (out.astype("int64")
            .sort_values(["doc_id", "span_start"]).reset_index(drop=True))


def test_exact_substring_spans_merge_and_within_doc_repeat(ray_session):
    import ray.data as rd

    # doc 0 / doc 1 share an 8-word prefix -> windows 0..3 merge into one
    # span [0, 8); doc 2 repeats a 5-gram WITHIN itself (positions 0 and
    # 5, gap == n) -> windows merge into [0, 10); doc 3 is unique.
    shared = "a b c d e f g h"
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [shared + " tail0 x0 y0", shared + " tail1 x1 y1",
                 "p q r s t p q r s t",
                 "u0 u1 u2 u3 u4 u5 u6"],
    })
    out = _spans(ray_session, rd.from_pandas(df))
    assert out.values.tolist() == [[0, 0, 8], [1, 0, 8], [2, 0, 10]]


def test_exact_substring_spans_join_regime_identical(ray_session):
    """broadcast_limit=0 forces the bucketed-join + sorted-run regime;
    single-row blocks put every doc on a block edge — output must be
    identical to the broadcast regime's."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(30)])
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(20)]
    texts += texts[:7]  # exact copies -> every window duplicated
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    a = _spans(ray_session, rd.from_pandas(df))
    b = _spans(ray_session, rd.from_pandas(df).repartition(13),
               broadcast_limit=0)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) >= 7  # the copied docs all have spans


def test_exact_substring_spans_empty_and_short_docs(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "text": [None, "", "only four words here"]})
    out = _spans(ray_session, rd.from_pandas(df))
    assert out.empty


def _cut(ray_session, ds, **kw) -> pd.DataFrame:
    from cckp_toolkit_workflow_ray.stages.dupgrams import exact_substring_cut

    out = exact_substring_cut(ds, n=5, **kw).to_pandas()
    if not len(out):
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "kept_text": pd.Series([], dtype=object)})
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def test_exact_substring_cut_keeps_tail_and_empties_full_dups(ray_session):
    import ray.data as rd

    shared = "a b c d e f g h"
    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": [shared + " tail0 x0 y0",   # span [0,8) -> tail survives
                 shared,                    # fully duplicated -> ''
                 "u0 u1 u2 u3 u4 u5"],      # unique -> not re-emitted
    })
    out = _cut(ray_session, rd.from_pandas(df))
    assert out.values.tolist() == [[0, "tail0 x0 y0"], [1, ""]]


def test_exact_substring_cut_join_regime_identical(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(23)
    vocab = np.array([f"w{i}" for i in range(25)])
    texts = [" ".join(rng.choice(vocab, size=14)) for _ in range(18)]
    texts += texts[:5]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    a = _cut(ray_session, rd.from_pandas(df))
    b = _cut(ray_session, rd.from_pandas(df).repartition(11),
             broadcast_limit=0)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) >= 5
