"""bigram_logprob_rollup: regime equivalence + semantics pins.

The query-level rollup is SQL-oracled (``bigram_logprob`` in the
conformance sweep); these pin what the oracle cannot see — the bucketed
composite-key-join regime matching the broadcast regime row for row,
and the token-less-doc counting rule.
"""

import numpy as np
import pandas as pd

import ray.data as rd

from cckp_toolkit_workflow_ray.stages.lm_score import bigram_logprob_rollup


def _corpus():
    return rd.from_pandas(pd.DataFrame({
        "lang": ["en", "en", "de", "de", "xx"],
        "text": ["a b a b c", "a b", "x y x", None, "solo"],
    }))


def test_bigram_regimes_row_identical(ray_session):
    a = bigram_logprob_rollup(_corpus()).sort_values("lang") \
        .reset_index(drop=True)
    b = bigram_logprob_rollup(_corpus(), broadcast_limit=0) \
        .sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)


def test_bigram_counting_rules(ray_session):
    out = bigram_logprob_rollup(_corpus()).set_index("lang")
    # "a b a b c" -> 4 bigrams, "a b" -> 1; NULL text doc counts with 0;
    # single-token doc has no bigram
    assert out.loc["en", "n_docs"] == 2
    assert out.loc["en", "n_bigrams"] == 5
    assert out.loc["de", "n_docs"] == 2
    assert out.loc["de", "n_bigrams"] == 2
    assert out.loc["xx", "n_bigrams"] == 0
    # log-probs are negative micro-nats
    assert out.loc["en", "sum_lp_e6"] < 0
    assert out.loc["xx", "sum_lp_e6"] == 0


def test_bigram_empty_corpus(ray_session):
    ds = rd.from_pandas(pd.DataFrame({
        "lang": pd.Series([], dtype=object),
        "text": pd.Series([], dtype=object)}))
    out = bigram_logprob_rollup(ds)
    assert len(out) == 0
