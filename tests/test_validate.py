"""End-to-end pipeline tests vs the pandas oracle (SURVEY.md §5 plan)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cckp_toolkit_workflow_ray.config import ValidationConfig
from cckp_toolkit_workflow_ray.pipelines.validate import (
    build_reference_profile,
    run_check,
    validate,
)
from cckp_toolkit_workflow_ray.schema import SchemaMismatchError
from cckp_toolkit_workflow_ray.sources.pages import generate_pages_dataset

from .oracle import oracle_violations, oracle_verdicts


def _violation_set(res):
    df = res.violations().to_pandas()
    return set(zip(df["url"].where(df["url"].notna(), None), df["lang"], df["check"]))


@pytest.fixture(scope="module")
def result(ray_session, tiny_pages_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("validate_out"))
    return validate(tiny_pages_dir, out_dir=out)


@pytest.fixture(scope="module")
def pages_df(tiny_pages_table):
    return tiny_pages_table.to_pandas()


def test_violations_match_oracle_exactly(result, pages_df):
    cfg = result.config
    want = oracle_violations(pages_df, cfg)
    want_set = set(zip(want["url"].where(want["url"].notna(), None), want["lang"], want["check"]))
    got_set = _violation_set(result)
    assert got_set == want_set
    # and with multiplicity: same number of rows
    assert result.violations().count() == len(want)


def test_verdicts_match_oracle(result, pages_df):
    cfg = result.config
    want = oracle_verdicts(pages_df, oracle_violations(pages_df, cfg), cfg)
    got = result.verdicts
    got = got[(got.check != "__overall__") & ~got.check.str.startswith("drift_")]
    merged = want.merge(got, on=["lang", "check"], suffixes=("_o", "_e"))
    assert len(merged) == len(want), "missing (lang, check) verdict rows"
    assert len(got) == len(want), "spurious extra verdict rows"
    assert (merged.n_rows_o == merged.n_rows_e).all()
    assert (merged.n_violations_o == merged.n_violations_e).all()
    assert (merged.status_o == merged.status_e).all()
    assert (merged.verdict_o == merged.verdict_e).all()
    assert np.allclose(merged.score_o, merged.score_e)
    pr = merged.dropna(subset=["pass_rate_o"])
    assert np.allclose(pr.pass_rate_o, pr.pass_rate_e)


def test_profile_exact_stats(result, pages_df):
    prof = result.profile.to_pandas()
    en = pages_df[pages_df.lang == "en"]
    count = prof[(prof.lang == "en") & (prof["column"] == "*") & (prof.metric == "count")]["value"].iloc[0]
    assert count == len(en)
    tmin = prof[(prof.lang == "en") & (prof["column"] == "text_len") & (prof.metric == "min")]["value"].iloc[0]
    tmax = prof[(prof.lang == "en") & (prof["column"] == "text_len") & (prof.metric == "max")]["value"].iloc[0]
    lens = en["text"].dropna().str.len()
    assert tmin == lens.min() and tmax == lens.max()
    mean = prof[(prof.lang == "en") & (prof["column"] == "text_len") & (prof.metric == "mean")]["value"].iloc[0]
    assert abs(mean - lens.mean()) < 1e-9
    # hll distinct estimate within 5%
    dist = prof[(prof.lang == "en") & (prof["column"] == "url") & (prof.metric == "distinct_estimate")]["value"].iloc[0]
    exact = en["url"].dropna().nunique()
    assert abs(dist - exact) / exact < 0.05
    # t-digest median within 3% of exact
    p50 = prof[(prof.lang == "en") & (prof["column"] == "text_len") & (prof.metric == "p50")]["value"].iloc[0]
    assert abs(p50 - lens.median()) / lens.median() < 0.03


def test_report_written(result):
    import json, os

    with open(os.path.join(result.out_dir, "report.json")) as f:
        rep = json.load(f)
    assert rep["n_rows"] == 2000
    assert rep["violations_by_check"]["uniqueness_url"] > 0
    assert set(rep["overall_by_lang"]) >= {"en", "de", "fr", "es", "zh"}
    assert rep["overall_by_lang"]["en"] == "FAIL"  # seeded violations ⇒ FAIL


def test_determinism_across_parallelism(ray_session, tiny_pages_dir, tmp_path_factory, result):
    """Same verdicts + violation set at a different batch size / layout
    (sandbox stand-in for different cluster sizes)."""
    cfg = ValidationConfig(batch_size=333, check_concurrency=2, uniqueness_batch_size=777)
    out = str(tmp_path_factory.mktemp("validate_out2"))
    res2 = validate(tiny_pages_dir, out_dir=out, config=cfg)
    assert _violation_set(res2) == _violation_set(result)
    a = result.verdicts.sort_values(["lang", "check"]).reset_index(drop=True)
    b = res2.verdicts.sort_values(["lang", "check"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a.drop(columns=["pass_rate"]), b.drop(columns=["pass_rate"]), check_exact=True
    )


def test_clean_input_all_pass(ray_session, tmp_path_factory):
    ds = generate_pages_dataset(1500, violations=False)
    out = str(tmp_path_factory.mktemp("clean_out"))
    res = validate(ds, out_dir=out)
    assert res.violations().count() == 0
    core = res.verdicts[(res.verdicts.check != "__overall__")
                        & ~res.verdicts.check.str.startswith("drift_")]
    assert (core.verdict == "PASS").all()
    # drift has no reference baseline here -> UNKNOWN, which propagates to
    # the rollup (analyze_joss.py:91-105 defaulting semantics)
    assert res.overall_verdict() == "UNKNOWN"
    # with drift disabled the rollup is a clean PASS
    cfg = ValidationConfig(checks=tuple(c for c in ValidationConfig().checks if not c.startswith("drift_")))
    res2 = validate(
        generate_pages_dataset(1500, violations=False),
        out_dir=str(tmp_path_factory.mktemp("clean_out_nodrift")),
        config=cfg,
    )
    assert res2.overall_verdict() == "PASS"


def test_drift_detected_against_reference(ray_session, tmp_path_factory):
    ref = build_reference_profile(generate_pages_dataset(4000, violations=False))
    drifted = generate_pages_dataset(4000, violations=False, drift_lang="zh", drift_factor=0.4)
    out = str(tmp_path_factory.mktemp("drift_out"))
    res = validate(drifted, out_dir=out, reference_profile=ref)
    d = res.verdicts[res.verdicts.check == "drift_text_len"].set_index("lang")
    assert d.loc["zh", "verdict"] == "FAIL"
    assert d.loc["en", "verdict"] == "PASS"
    assert d.loc["en", "status"] == "good"
    # r2: the length drift shows up in the html histogram too, while the
    # null-rate profile is unchanged
    h = res.verdicts[res.verdicts.check == "drift_html_len"].set_index("lang")
    assert h.loc["zh", "verdict"] == "FAIL"
    assert h.loc["en", "verdict"] == "PASS"
    nr = res.verdicts[res.verdicts.check == "drift_null_rate"]
    assert (nr.verdict == "PASS").all()


def test_reference_profile_roundtrip(ray_session, tmp_path):
    ref = build_reference_profile(generate_pages_dataset(1000, violations=False))
    p = str(tmp_path / "ref.json")
    ref.save(p)
    from cckp_toolkit_workflow_ray.stages.profile import ReferenceProfile

    ref2 = ReferenceProfile.load(p)
    assert ref2.valid_langs == ref.valid_langs
    assert ref2.counts == ref.counts
    assert all(np.array_equal(ref.hists[l].counts, ref2.hists[l].counts) for l in ref.hists)
    assert all(np.array_equal(ref.hists_html[l].counts, ref2.hists_html[l].counts)
               for l in ref.hists_html)
    assert ref2.null_rates == ref.null_rates


def test_schema_gate_rejects_wrong_input(ray_session):
    import ray.data as rd

    bad = rd.from_arrow(pa.table({"uri": pa.array(["a"]), "text": pa.array(["b"])}))
    with pytest.raises(SchemaMismatchError):
        validate(bad)


def test_empty_input_all_unknown(ray_session, tmp_path_factory):
    ds = generate_pages_dataset(0)
    out = str(tmp_path_factory.mktemp("empty_out"))
    res = validate(ds, out_dir=out)
    assert res.violations().count() == 0
    # zero rows -> no partitions at all: empty verdict table, n_rows 0,
    # and the overall rollup defaults to UNKNOWN (never PASS on no data)
    assert res.report["n_rows"] == 0
    assert len(res.verdicts) == 0
    assert res.overall_verdict() == "UNKNOWN"


def test_run_check_standalone(ray_session, tiny_pages_dir, tmp_path_factory, pages_df):
    out = str(tmp_path_factory.mktemp("single_out"))
    res = run_check("url_format", tiny_pages_dir, out_dir=out)
    got = res.violations().to_pandas()
    assert set(got["check"]) == {"url_format"}
    cfg = ValidationConfig(checks=("url_format",))
    want = oracle_violations(pages_df, cfg)
    assert set(got["url"]) == set(want["url"])


def test_uniqueness_extreme_hot_key_skew(ray_session, tmp_path_factory):
    """Skew exercise (north-rule salted-key mitigation): ONE url occupies
    half the corpus.  The per-batch combiner must bound the hot key's
    contribution to one partial row per batch (the salting guarantee), and
    the dup count must still be exact."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cckp_toolkit_workflow_ray.config import ValidationConfig
    from cckp_toolkit_workflow_ray.stages.uniqueness import _hash_counts, duplicate_urls

    n = 20_000
    hot = "https://hot.example.com/only"
    urls = np.array([hot if i % 2 == 0 else f"https://site/{i}" for i in range(n)], dtype=object)
    t = pa.table({"url": pa.array(urls, type=pa.string()),
                  "lang": pa.array(["en"] * n, type=pa.string())})
    ds = rd.from_arrow(t)

    # combiner bound: the hot key collapses to ONE row within a batch
    part = _hash_counts(t.slice(0, 4096))
    assert part.num_rows == 4096 // 2 + 1  # distinct urls + one hot row
    assert part.column("n").to_pylist().count(2048) == 1

    cfg = ValidationConfig(uniqueness_batch_size=4096)
    dups = duplicate_urls(ds, cfg).to_pandas()
    assert len(dups) == 1
    assert dups.iloc[0]["url"] == hot and dups.iloc[0]["n"] == n // 2


def test_kll_profile_variant(ray_session, tiny_pages_dir, tmp_path_factory):
    """The profile pass works identically with the KLL quantile sketch."""
    cfg = ValidationConfig(quantile_sketch="kll")
    res = validate(tiny_pages_dir, out_dir=str(tmp_path_factory.mktemp("kll_out")), config=cfg)
    prof = res.profile.to_pandas()
    p50 = prof[(prof.lang == "en") & (prof["column"] == "text_len") & (prof.metric == "p50")]["value"].iloc[0]
    assert p50 > 0
    # verdicts unaffected by the sketch choice (they never depend on it)
    base = validate(tiny_pages_dir, out_dir=str(tmp_path_factory.mktemp("td_out")))
    a = res.verdicts.sort_values(["lang", "check"]).reset_index(drop=True)
    b = base.verdicts.sort_values(["lang", "check"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_url_format_re2_vs_oracle_trailing_newline(ray_session, tmp_path_factory):
    """Engine (RE2 '$' = end of text) and oracle (fullmatch) must agree on
    trailing-newline urls — a classic '$' semantics trap."""
    import pyarrow as pa
    import ray.data as rd

    from cckp_toolkit_workflow_ray.functions.extract import synthesize_html

    urls = ["https://ok.example/x", "https://bad.example/y\n"]
    t = pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array([1, 2], type=pa.timestamp("us")),
        "html": pa.array([synthesize_html("a"), synthesize_html("b")], type=pa.binary()),
        "text": pa.array(["a", "b"]),
        "lang": pa.array(["en", "en"]),
    })
    res = validate(rd.from_arrow(t), out_dir=str(tmp_path_factory.mktemp("re2")))
    got = res.violations().to_pandas()
    got_fmt = set(got[got.check == "url_format"]["url"])
    want = oracle_violations(t.to_pandas(), res.config)
    want_fmt = set(want[want["check"] == "url_format"]["url"])
    assert got_fmt == want_fmt == {"https://bad.example/y\n"}


def test_pre_r2_partial_backfill_yields_unknown_html_drift():
    # ADVICE r2: a resumed run mixing pre-r2 checkpointed partials (no
    # hist_html) must report drift_html_len UNKNOWN, not a verdict from a
    # silently undercounted histogram
    import pickle

    import numpy as np

    from cckp_toolkit_workflow_ray.config import ValidationConfig
    from cckp_toolkit_workflow_ray.stages.checks import (
        _empty_partial, deserialize_partial, merge_partials, serialize_partial)
    from cckp_toolkit_workflow_ray.stages.verdicts import _drift_hist_row
    from cckp_toolkit_workflow_ray.stages.profile import ReferenceProfile
    from cckp_toolkit_workflow_ray.functions.sketches import FixedHistogram

    cfg = ValidationConfig()
    fresh = _empty_partial(cfg)
    fresh["n_rows"] = 10
    fresh["hist_html"].add(np.array([100.0, 200.0, 300.0]))
    fresh["hist_text"].add(np.array([50.0, 150.0, 250.0]))

    # simulate a pre-r2 checkpoint: serialized dict without hist_html
    legacy = pickle.loads(serialize_partial(_empty_partial(cfg)))
    del legacy["hist_html"]
    del legacy["hist_html_missing"]
    legacy_partial = deserialize_partial(pickle.dumps(legacy, protocol=4))
    assert legacy_partial["hist_html_missing"] is True

    merged = merge_partials([fresh, legacy_partial], cfg)
    assert merged["hist_html_missing"] is True
    # fresh-only merge stays untagged
    assert merge_partials([fresh], cfg)["hist_html_missing"] is False

    ref = ReferenceProfile(
        valid_langs=["en"], hists={"en": fresh["hist_text"]},
        counts={"en": 10}, hists_html={"en": fresh["hist_html"]})
    row = _drift_hist_row("en", merged, cfg, ref, "drift_html_len",
                          "hist_html", "hists_html")
    assert row[-1] == "UNKNOWN"
    # the text drift is unaffected by the html backfill tag
    merged["hist_text"].add(np.array([5.0]))
    row_t = _drift_hist_row("en", merged, cfg, ref, "drift_text_len",
                            "hist_text", "hists")
    assert row_t[-1] in ("PASS", "FAIL")
