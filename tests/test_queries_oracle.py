"""Every queries() entry must match its oracle_sql() on the same parquet —
the same comparison the driver's correctness gate performs (row count,
schema, order-insensitive values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns), kind="mergesort", na_position="last").reset_index(drop=True)
    return df


def _compare(got: pd.DataFrame, want: pd.DataFrame, name: str):
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    g, w = _norm(got), _norm(want)
    for c in g.columns:
        if pd.api.types.is_float_dtype(w[c]):
            assert np.allclose(
                g[c].astype(float), w[c].astype(float), rtol=1e-12, equal_nan=True
            ), f"{name}: float column {c} differs"
        else:
            gl, wl = g[c].tolist(), w[c].tolist()
            assert gl == wl, f"{name}: column {c} differs: {gl[:5]} vs {wl[:5]}"


ORACLED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(ray_session, con, name):
    fn = entrymod.queries()[name]
    got = fn(SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.sql(entrymod.oracle_sql()[name]).df()
    _compare(got, want, name)


def test_all_queries_have_callables():
    qs = entrymod.queries()
    for name in ORACLED:
        assert name in qs
    # rows-only entries are allowed but must be callable too
    for name, fn in qs.items():
        assert callable(fn), name


def test_entry_returns_rows(ray_session):
    out = entrymod.entry()
    assert len(out) > 0
    assert {"lang", "check", "verdict"} <= set(out.columns)


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run_and_are_deterministic(ray_session, name):
    fn = entrymod.queries()[name]
    a = fn(SF_DIR)
    if not isinstance(a, pd.DataFrame):
        a = a.to_pandas()
    assert len(a) > 0 and len(a.columns) > 0
    b = fn(SF_DIR)
    if not isinstance(b, pd.DataFrame):
        b = b.to_pandas()
    a = _norm(a)
    b = _norm(b)
    pd.testing.assert_frame_equal(a, b)


@pytest.fixture(scope="module")
def null_sf(ray_session, tmp_path_factory):
    """A documents table WITH nulls in lang/text/source — exercises the
    SQL NULL-group semantics the shipped fixtures never hit."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("null_sf"))
    n = 400
    rng = np.random.default_rng(7)
    langs = np.array(["en", "de", None, "fr"], dtype=object)[rng.integers(0, 4, n)]
    texts = np.array([f"word{i} text sample number {i}" for i in range(n)], dtype=object)
    texts[::50] = None
    sources = np.array([f"src{i%20}" for i in range(n)], dtype=object)
    sources[::70] = None
    t = pa.table({
        "doc_id": pa.array(np.arange(n)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "source": pa.array(sources, type=pa.string()),
        # NULL text -> NULL n_chars (review r2: a 0 here meant the
        # NULL-group harness never exercised NULL values, only NULL keys)
        "n_chars": pa.array([len(x) if x is not None else None for x in texts],
                            type=pa.int64()),
    })
    pq.write_table(t, f"{d}/documents.parquet")
    return d


NULL_SENSITIVE = [
    "presence_check", "referential_lang_check", "stats_profile",
    "distinct_sources", "exact_dedup", "keyword_check", "token_count",
    "verdict_rollup", "bpe_token_count", "quality_check",
    "nchars_quantiles", "nchars_mode", "normalized_prefixes",
    "stratified_sample",
]


@pytest.mark.parametrize("name", NULL_SENSITIVE)
def test_null_groups_match_oracle(ray_session, null_sf, name):
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM '{null_sf}/documents.parquet'")
    got = entrymod.queries()[name](null_sf)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = c.sql(entrymod.oracle_sql()[name]).df()
    assert len(got) == len(want), f"{name}: {len(got)} != {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), name
    g, w = _norm(got), _norm(want)
    for col in g.columns:
        if pd.api.types.is_float_dtype(w[col]):
            assert np.allclose(g[col].astype(float), w[col].astype(float),
                               rtol=1e-12, equal_nan=True), f"{name}:{col}"
        else:
            gl = g[col].where(g[col].notna(), None).tolist()
            wl = w[col].where(w[col].notna(), None).tolist()
            assert gl == wl, f"{name}:{col}"


def test_mode_and_quantiles_with_null_values(ray_session, tmp_path):
    """review r2: NULL-modal n_chars must yield mode_nchars=NULL (not
    crash), and an all-NULL group must keep its (NULL-quantile) row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    t = pa.table({
        "doc_id": pa.array(list(range(10)), type=pa.int64()),
        "text": pa.array(["x"] * 10, type=pa.string()),
        "lang": pa.array(["en"] * 6 + ["de"] * 4, type=pa.string()),
        "source": pa.array(["src10"] * 10, type=pa.string()),
        # en: NULL x4 (modal), 7 x2 ; de: all NULL
        "n_chars": pa.array([None, None, None, None, 7, 7,
                             None, None, None, None], type=pa.int64()),
    })
    pq.write_table(t, f"{d}/documents.parquet")
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")

    got = entrymod.queries()["nchars_mode"](d)
    want = c.sql(entrymod.oracle_sql()["nchars_mode"]).df()
    _compare(got, want, "nchars_mode[null-values]")
    g = got.set_index("lang")
    assert pd.isna(g.loc["en", "mode_nchars"]) and g.loc["en", "mode_count"] == 4
    assert pd.isna(g.loc["de", "mode_nchars"])

    gq = entrymod.queries()["nchars_quantiles"](d)
    wq = c.sql(entrymod.oracle_sql()["nchars_quantiles"]).df()
    _compare(gq, wq, "nchars_quantiles[null-values]")
    gqi = gq.set_index("lang")
    assert pd.isna(gqi.loc["de", "q50"])          # all-NULL group kept
    assert gqi.loc["en", "q50"] == 7              # NULLs ignored in ranks


def test_topk_with_ties_null_peers_and_ties(ray_session, tmp_path):
    """RANK() semantics: ties at the k-th value are ALL kept, and NULL
    n_chars rows are window peers ordered last — they share rank
    #non-null+1 and survive when a sparse lang leaves that within k."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    # en: 14 docs, 12 tied at rank 3 -> RANK keeps all 14 (ROW_NUMBER
    # would keep only 10);  de: 3 docs, one NULL length -> the NULL
    # peer ranks 3rd and is kept.
    n_en, n_de = 14, 3
    t = pa.table({
        "doc_id": pa.array(list(range(n_en + n_de)), type=pa.int64()),
        "text": pa.array(["x"] * (n_en + n_de), type=pa.string()),
        "lang": pa.array(["en"] * n_en + ["de"] * n_de, type=pa.string()),
        "source": pa.array(["s"] * (n_en + n_de), type=pa.string()),
        "n_chars": pa.array([100, 90] + [50] * 12 + [7, None, 3],
                            type=pa.int64()),
    })
    pq.write_table(t, f"{d}/documents.parquet")
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")

    got = entrymod.queries()["topk_with_ties"](d)
    want = c.sql(entrymod.oracle_sql()["topk_with_ties"]).df()
    _compare(got, want, "topk_with_ties[ties+null]")
    en = got[got["lang"] == "en"]
    assert len(en) == 14                       # 2 + all 12 ties at rank 3
    assert (en["rk"].to_numpy() == np.r_[1, 2, [3] * 12]).all()
    de = got[got["lang"] == "de"]
    assert len(de) == 3
    null_row = de[de["n_chars"].isna()]
    assert len(null_row) == 1 and int(null_row["rk"].iloc[0]) == 3


def test_quantiles_null_key_holds_all_values(ray_session, tmp_path):
    """review r3: when the only groups with non-null values have NULL
    keys, the missing-key merge must not crash on mismatched dtypes."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "nk")
    os.makedirs(d)
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["a", "b", "c", "d"], type=pa.string()),
        "lang": pa.array([None, None, "en", "en"], type=pa.string()),
        "source": pa.array(["src10"] * 4, type=pa.string()),
        "n_chars": pa.array([3, 5, None, None], type=pa.int64()),
    })
    pq.write_table(t, f"{d}/documents.parquet")
    gq = entrymod.queries()["nchars_quantiles"](d)
    assert len(gq) == 2
    en = gq[gq["lang"] == "en"]
    assert len(en) == 1 and pd.isna(en["q50"].iloc[0])
    nk = gq[gq["lang"].isna()]
    # quantile_disc rank for q=0.5 over [3,5] is ceil(0.5*2)=1 -> 3
    assert len(nk) == 1 and nk["q50"].iloc[0] == 3 and nk["q90"].iloc[0] == 5


def test_queries_survive_empty_corpus(ray_session, tmp_path):
    """A fully EMPTY corpus (0-row tables, real schemas) must yield
    typed empty results, not KeyErrors — Ray loses the schema of empty
    aggregate streams, so every driver-side column access needs the
    typed-empty guard."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "empty_sf")
    import os
    os.makedirs(d)
    for t in TABLES:
        src = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        pq.write_table(
            pa.table({n: pa.array([], type=src.field(n).type)
                      for n in src.names}),
            f"{d}/{t}.parquet")

    qs = entrymod.queries()
    expect = {
        "temperature_mixture": ["lang", "source", "n_kept", "sum_n_chars"],
        "mixture_sample": ["source", "lang", "n_kept", "sum_n_chars"],
        "incremental_dedup": ["doc_id", "lang"],
        "normalized_dedup": ["doc_id", "lang"],
        "window_distinct_users": ["window_start", "n_distinct"],
        "tfidf_top_terms": ["lang", "word", "score_e6", "rk"],
        "label_centroids": ["label", "pos", "n_vecs", "sum_e6"],
        "budget_sample": ["lang", "n_kept", "sum_chars"],
        "word_frequencies": ["word", "n", "rk"],
        "cluster_composition": ["lang", "label", "n_docs", "sum_chars"],
        "winnow_verify": ["doc_id", "fp"],
        "user_growth": ["day", "n_new", "cum_users"],
        "incremental_near_dedup": ["doc_id"],
        "media_features": ["kind", "decode_ok", "n", "sum_pixels"],
        "kmeans_clusters": ["vec_id", "cluster_id"],
        "semantic_dedup": ["vec_id", "cluster_id"],
        "cluster_balanced_sample": ["vec_id", "cluster_id"],
        "exact_substring_spans": ["doc_id", "span_start", "span_end"],
        "exact_substring_cut": ["doc_id", "kept_text"],
        "dsir_sample": ["doc_id", "lang", "dsir_e6"],
        "weighted_sample": ["doc_id", "lang", "n_chars", "key_e6"],
        "incremental_bloom_dedup": ["doc_id", "lang"],
        "canonical_url_dedup": ["canonical_url", "doc_id", "n_dups"],
        "url_host_rollup": ["host", "n_docs", "n_pages"],
        "bm25_top_docs": ["query_id", "doc_id", "score_e6", "rk"],
        "heavy_hitter_words": ["word", "n", "rk"],
        "retention_cohorts": ["cohort_day", "offset_days", "n_users"],
        "value_quantiles_by_type": ["event_type", "q50", "q90"],
        "skew_join_events": ["event_type", "n_rows", "sum_ncust"],
        "daily_drift": ["day", "n_prev", "n_cur", "psi_e6", "ks_e6"],
        "inter_event_gaps": ["user_id", "n_gaps", "sum_gap_us",
                             "max_gap_us"],
        "latest_event_per_user": ["user_id", "event_id", "ts",
                                  "event_type", "value"],
        "corr_chars_tokens": ["lang", "n_pairs", "corr_e6"],
        "cube_lang_source": ["lang", "source", "grp", "n_docs",
                             "total_chars"],
        "token_entropy": ["lang", "n_tokens", "vocab", "ent_e6"],
        "pmi_bigrams": ["w1", "w2", "n", "pmi_e6", "rk"],
        "pagerank_hosts": ["host", "out_deg", "rank"],
        "host_components": ["host", "component", "comp_size"],
        "event_rate_anomaly": ["day", "n_events", "z_e6"],
        "snapshot_diff": ["change_class", "n_docs"],
        "dataset_split": ["lang", "split", "n_docs", "sum_chars"],
        "bigram_logprob": ["lang", "n_docs", "n_bigrams", "sum_lp_e6"],
        "event_transitions": ["from_type", "to_type", "n", "prob_e6"],
        "value_mad_by_type": ["event_type", "med", "mad"],
        "keyword_matrix": ["lang", "keyword", "n"],
        "value_histogram": ["event_type", "bin", "n"],
        "daily_type_growth": ["event_type", "day", "n", "growth_e6"],
        "rolling_active_users": ["day", "n_active"],
        "rfm_segments": ["r_bucket", "f_bucket", "m_bucket", "n_users"],
        "dup_rate_by_source": ["source", "n_docs", "n_nonnull",
                               "n_distinct", "dup_rate_e6"],
        "zorder_layout": ["doc_id", "morton", "rk"],
        "event_type_trend": ["event_type", "n_days", "n_events",
                             "slope_e6"],
        "chi2_lang_source": ["lang", "source", "n", "expected_e6",
                             "chi2_e6"],
        "edit_distance_pairs": ["id_a", "id_b", "dist"],
        "kcore_hosts": ["host", "core_deg"],
        "rrf_fusion": ["query_id", "doc_id", "rrf_e6", "rk"],
        "value_winsorized": ["event_type", "n", "n_lo", "n_hi",
                             "sum_clamped_e6"],
        "degree_assortativity": ["n_pairs", "assortativity_e6"],
        "welch_ttest_chars": ["lang_a", "lang_b", "n_a", "n_b", "t_e6"],
        "cusum_changepoint": ["event_type", "cp_day_us", "cusum_abs",
                              "n_days", "total"],
        "host_neighbor_jaccard": ["host_a", "host_b", "common",
                                  "union_sz", "jaccard_e6"],
        "hits_hosts": ["host", "hub", "auth"],
        "event_type_cosine": ["type_a", "type_b", "dot", "cos_e6"],
        "bfs_depth_hosts": ["host", "depth"],
        "gini_hosts": ["n_hosts", "total_docs", "gini_e6"],
        "pricing_summary": ["l_returnflag", "l_linestatus", "n_rows",
                            "sum_qty_e6", "sum_base_e6", "sum_disc_e6",
                            "sum_charge_e6"],
        "shipping_priority": ["l_orderkey", "o_orderdate",
                              "revenue_e6", "rk"],
        "null_profile": ["tbl", "col", "n_rows", "n_null",
                         "null_rate_e6"],
        "zipf_slope": ["n_words", "slope_e6", "intercept_e6"],
        "pca_power_component": ["pos", "loading_e6"],
        "pareto_front_docs": ["doc_id", "n_chars", "n_tokens"],
        "kl_unigram_drift": ["vocab", "n_p", "n_q", "kl_e6"],
        "theil_sen_trend": ["event_type", "n_pairs", "slope_e6"],
        "compression_ratio": ["lang", "n_docs", "sum_raw", "sum_comp",
                              "ratio_e6"],
        "golden_records": ["rep_doc", "n_dups", "lang", "source"],
        "rolling_median_anomaly": ["day", "n_events", "med7", "dev"],
        "personalized_pagerank": ["host", "out_deg", "rank"],
        "event_throttle_dedup": ["event_type", "n_total", "n_kept",
                                 "kept_rate_e6"],
        "chars_percent_rank": ["doc_id", "lang", "n_chars", "pr_e6"],
        "supplier_hhi": ["n_name", "n_suppliers", "n_rows", "hhi_e6"],
        "order_fulfillment_lag": ["o_orderpriority", "n_orders",
                                  "p50_days", "p90_days"],
        "region_revenue": ["n_name", "n_orders", "revenue_e6"],
        "dup_cluster_sizes": ["cluster_size", "n_clusters", "n_docs"],
        "lang_vocab_cosine": ["lang_a", "lang_b", "dot", "cos_e6"],
        "part_cooccurrence": ["part_a", "part_b", "n_both", "n_a",
                              "n_b", "lift_e6", "rk"],
        "customers_no_urgent": ["c_mktsegment", "n_customers",
                                "acctbal_e6"],
        "nation_trade_volume": ["supp_nation", "cust_nation", "l_year",
                                "n_rows", "revenue_e6"],
        "returned_items_report": ["c_custkey", "c_name", "n_orders",
                                  "revenue_e6"],
        "forecast_revenue": ["l_year", "n_rows", "revenue_e6"],
        "order_priority_exists": ["o_orderpriority", "n_orders"],
        "returnflag_priority_counts": ["l_returnflag", "n_rows",
                                       "high_count", "low_count"],
        "customer_order_distribution": ["c_count", "n_customers"],
        "promo_revenue": ["l_year", "n_rows", "promo_e6", "total_e6",
                          "promo_pct_e6"],
        "small_qty_revenue": ["p_brand", "n_rows", "revenue_e6"],
        "large_volume_customers": ["o_orderkey", "c_custkey", "c_name",
                                   "o_orderdate", "totalprice_e6",
                                   "sum_qty_e6", "rk"],
        "disjunctive_revenue": ["branch", "n_rows", "revenue_e6"],
        "mannwhitney_chars": ["lang_a", "lang_b", "n_a", "n_b", "u2"],
        "benford_totalprice": ["digit", "n", "obs_pct_e6",
                               "benford_e6"],
        "daily_autocorr": ["event_type", "n_pairs", "corr_e6"],
        "charclass_profile": ["lang", "n_docs", "n_chars", "n_alpha",
                              "n_digit", "n_space", "n_other"],
        "readability_counts": ["lang", "n_docs", "n_words",
                               "n_sentences", "n_vowel_groups"],
        "event_heatmap": ["dow", "hour", "n"],
        "top_supplier": ["s_suppkey", "s_name", "total_rev_e6"],
        "embedding_quantize": ["label", "n_vecs", "sum_err_e6",
                               "sum_abs_code"],
        "longest_doc_per_lang": ["lang", "doc_id", "n_chars"],
        "type_cooccurrence_1h": ["type_a", "type_b", "n"],
        "market_share": ["l_year", "n_rows", "nation_e6", "total_e6",
                         "share_e6"],
        "cluster_representatives": ["cluster", "rep_doc", "rep_len",
                                    "n_members"],
        "top_words_concat": ["lang", "top_words", "top_n"],
        "url_depth_profile": ["host", "n_urls", "sum_depth",
                              "n_query"],
        "boilerplate_rate_by_source": ["source", "n_paras",
                                       "n_boiler", "boiler_rate_e6"],
        "ewma_daily": ["event_type", "n_days", "num", "ewma_e6"],
        "dedup_method_overlap": ["method", "n_pairs", "n_both"],
        "docs_above_lang_median": ["lang", "med", "n_above",
                                   "n_equal", "n_below"],
        "order_backlog_daily": ["day_i", "n_open"],
        "tokens_per_char_ols": ["lang", "n_pairs", "slope_e6",
                                "intercept_e6"],
        "quality_funnel": ["lang", "n_docs", "n_len_ok",
                           "n_sentence_ok", "n_tokens_ok"],
        "top_event_trigrams": ["t1", "t2", "t3", "n", "rk"],
        "monthly_revenue": ["o_year", "o_month", "n_orders",
                            "revenue_e6"],
        "customer_lifetime_span": ["span_band", "n_customers"],
        "host_reciprocity": ["n_edges", "n_reciprocal",
                             "reciprocity_e6"],
        "url_prefix_blocklist": ["host", "n_urls", "n_blocked"],
        "dedup_threshold_curve": ["threshold_e2", "n_pairs"],
        "doc_id_islands": ["island_start", "island_end", "island_len",
                           "n_islands", "rk"],
        "value_iqr_outliers": ["event_type", "q1", "q3", "n_below",
                               "n_above"],
        "apply_upserts": ["lang", "n_docs", "n_updated", "n_inserted",
                          "sum_chars"],
        "host_n50": ["n_hosts", "total_docs", "n50"],
        "token_length_histogram": ["lang", "word_len", "n"],
        "session_entry_exit": ["entry_type", "exit_type",
                               "n_sessions"],
        "value_volatility": ["event_type", "n_steps",
                             "sum_absdiff_e6"],
        "returning_share_daily": ["day_i", "n_new", "n_returning"],
        "corpus_report": ["n_docs", "n_langs", "n_sources",
                          "total_chars", "null_text_rate_e6",
                          "distinct_text_rate_e6"],
        "source_lang_entropy": ["source", "n_docs", "n_langs",
                                "entropy_e6"],
        "max_silence_days": ["event_type", "n_days_active",
                             "max_gap_days"],
        "knn_label_agreement": ["label", "n", "n_agree"],
        "dow_anova": ["n_days", "n_events", "eta2_e6"],
        "customer_trend_census": ["trend", "n_customers"],
        "revenue_top1pct_share": ["n_customers", "top_k",
                                  "top_rev_e6", "total_rev_e6",
                                  "share_e6"],
        "signup_to_purchase_latency": ["n_converted", "p50_us",
                                       "p90_us"],
        "order_size_histogram": ["n_items", "n_orders"],
        "discount_by_qty_band": ["qty_band", "n_rows", "disc_e6"],
        "km_user_survival": ["duration_days", "n_risk", "n_deaths",
                             "survival"],
        "topk_with_ties": ["lang", "doc_id", "n_chars", "rk"],
        "weighted_median_price": ["l_returnflag", "wmedian", "wtotal"],
        "phrase_search": ["phrase", "n_docs", "n_hits"],
        "term_proximity": ["term_a", "term_b", "gap", "n_docs"],
        "window_collocations": ["word", "n", "rk"],
        "gap_fill_daily": ["day_i", "n_obs", "filled", "value_e6"],
        "activity_coverage": ["event_type", "n_users", "covered_us"],
        "peak_concurrency": ["event_type", "peak"],
    }
    for name, cols in expect.items():
        out = qs[name](d)
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) == 0, name
        assert list(out.columns) == cols, (name, list(out.columns))


NASTY_QUERIES = [
    # every query that groups, partitions, joins or windows on a nullable
    # key, plus the whitespace-sensitive tokenizer family
    "nchars_mode", "nchars_quantiles", "rollup_lang_source",
    "docs_validate", "asof_last_order", "domain_cap", "mixture_sample",
    "curate_corpus", "temperature_mixture", "budget_sample",
    "repetition_check", "bpe_token_count", "token_count",
    "exact_substring_spans", "exact_substring_cut", "dsir_sample",
    "weighted_sample",
    "window_distinct_users", "normalized_dedup", "incremental_dedup",
    # event family: NULL ts (excluded by event-time ops), NULL
    # event_type (kept as a group), NULL value (0 contribution), NULL
    # user_id (as-of keeps the row with a NULL result)
    "windowed_events", "sliding_events", "session_windows",
    "json_props_stats", "asof_last_order", "asof_bucketed",
    "enrich_events_nation", "distinct_users_events",
    "referential_events_check",
    # embedding family: zero vectors and NULL labels
    "embedding_norm_stats", "label_centroids", "cluster_composition",
    "knn_embeddings", "kmeans_clusters", "semantic_dedup",
    "cluster_balanced_sample",
    # join family: NULL order dates/custkeys/prices/discounts
    "hash_join_revenue", "top_orders", "interval_event_windows",
    "incremental_near_dedup", "user_growth",
    # ADVICE r3: nullable-lang grouping / nullable-text consumption and
    # the engine-export oracles must also hold on the adversarial corpus
    "tfidf_top_terms", "winnow_verify", "langid_confusion",
    # r4 additions: bloom prefilter must stay exact under NULL texts;
    # URL derivation/canonicalization must propagate NULL source -> NULL
    # url -> NULL canonical/host groups identically to SQL
    "incremental_bloom_dedup", "canonical_url_dedup", "url_host_rollup",
    # BM25 / heavy hitters consume nullable text and must agree with SQL
    # on the exotic whitespace / empty-string tokenization edge cases
    "bm25_top_docs", "heavy_hitter_words",
    # distributed selection consumes nullable float values
    "value_quantiles_exact",
    # cohort retention excludes NULL users/timestamps (user_growth
    # policy) and must agree with SQL on the exclusion
    "retention_cohorts",
    # grouped selection: NULL event_type group + all-null-value groups
    "value_quantiles_by_type",
    # funnel excludes NULL users/timestamps and keys on nullable types
    "funnel_conversion",
    # skew-aware join: NULL user_id -> NULL key matches nothing; NULL
    # event_type is a rollup group
    "skew_join_events",
    # day-over-day drift: NULL ts/value excluded; pre-1970 days must
    # floor identically to date_trunc; isolated days pair with nothing
    "daily_drift",
    # LAG gaps / latest-snapshot: NULL users and timestamps excluded,
    # NULL payload columns ride through the top-k untouched
    "inter_event_gaps", "latest_event_per_user",
    # grouped moments on nullable n_chars/text pairs + NULL lang group;
    # single-doc groups exercise the zero-variance NULL path
    "corr_chars_tokens",
    # CUBE adds the lang-aggregated set over genuine NULL lang/source
    # groups, which must stay distinct from '__all__'
    "cube_lang_source",
    # tokenizer family on exotic whitespace / empty strings
    "token_entropy", "pmi_bigrams", "phrase_search", "term_proximity",
    "window_collocations",
    # gap fill: NULL ts excluded; the nasty fixture's isolated days
    # exercise the interpolation path
    "gap_fill_daily",
    # interval union: NULL users/ts excluded, NULL type kept; isolated
    # events contribute exactly L
    "activity_coverage",
    # sweep-line peak: NULL ts excluded, NULL type kept; the pre-1970
    # rows land in their own far-left time buckets
    "peak_concurrency",
    # NULL source -> NULL host: no node, and no edge THROUGH the doc —
    # adjacency must skip null-host endpoints identically to SQL
    "pagerank_hosts", "host_components",
    # NULL ts excluded; the nasty pre-1970 / isolated days land in
    # incomplete trailing windows and must yield NULL z identically
    "event_rate_anomaly",
    # NULL-text docs must diff as unchanged (NULL vs NULL) yet changed
    # when rewritten ('rev2 ' vs NULL) — IS DISTINCT FROM parity
    "snapshot_diff",
    # NULL lang split groups + NULL n_chars mass
    "dataset_split",
    # bigram LM: NULL lang group, NULL/exotic-whitespace texts, and the
    # NULL-safe LEFT join of token-less groups
    "bigram_logprob",
    # Markov transitions: NULL event_type is a STATE (sentinel
    # round-trip) distinct from "no previous event"
    "event_transitions",
    # triangle census over NULL-host-pruned edges
    "triangle_count",
    # chained selections: NULL event_type group + all-null-value groups
    # must yield NULL med AND NULL mad
    "value_mad_by_type",
    # multi-pattern scan over NULL/exotic texts and NULL lang groups
    "keyword_matrix",
    # global-range binning with NULL event_type groups / NULL values
    "value_histogram",
    # LAG growth within the NULL event_type partition too
    "daily_type_growth",
    # rolling distinct: NULL users/ts excluded; isolated pre-1970 days
    # must window correctly
    "rolling_active_users",
    # RFM: NULL value rows contribute 0 monetary (COALESCE parity)
    "rfm_segments",
    # dup report: NULL source group; NULL texts in n_docs but not the
    # distinct set; exact and normalized dup seeds in the nasty corpus
    "dup_rate_by_source",
    # derived-stream selection: gaps under NULL users/ts exclusion
    "gap_quantiles",
    # NULL n_chars interleaves as bit pattern 0 identically
    "zorder_layout",
    # OLS daily trend: NULL ts excluded, NULL event_type is a group,
    # single-day types exercise the zero-variance NULL slope
    "event_type_trend",
    # contingency decomposition: NULL lang AND NULL source are genuine
    # cells whose row/col marginals must join NULL-safely
    "chi2_lang_source",
    # suffix blocking / byte-Levenshtein over NULL and exotic-unicode
    # texts (multi-byte code points cost their byte length in DuckDB)
    "edit_distance_pairs",
    # peeling over NULL-host-pruned edges (the pagerank/CC edge policy)
    "kcore_hosts",
    # fusion consumes the BM25 tokenizer family (exotic whitespace /
    # NULL texts) through both systems
    "rrf_fusion",
    # strict-bound counts and per-row e6 clamps over NULL event_type
    # groups; all-NULL-value groups must DROP from the surface
    "value_winsorized",
    # degree mixing over NULL-host-pruned edges; the nasty graph's
    # near-regular degree structure exercises the zero-variance NULL
    "degree_assortativity",
    # NULL lang / NULL n_chars exclusion parity; single-doc langs
    # exercise the n<2 NULL-t path
    "welch_ttest_chars",
    # CUSUM over NULL-type groups; NULL ts excluded; the nasty
    # pre-1970 / isolated days must floor and rank identically
    "cusum_changepoint",
    # wedge counts over NULL-host-pruned edges; all-integer Jaccard
    "host_neighbor_jaccard",
    # fixed-point HITS over NULL-host-pruned edges (pagerank policy)
    "hits_hosts",
    # Gram-matrix cosine: NULL user/type exclusion parity; boundary
    # users split across blocks must contribute exactly once
    "event_type_cosine",
    # bounded BFS over NULL-host-pruned edges; unreachable hosts NULL
    "bfs_depth_hosts",
    # Gini over NULL-host-excluded counts (host-graph policy)
    "gini_hosts",
    # Q1-style masses: NULL returnflag groups, per-metric all-NULL
    # groups must report NULL sums with exact non-null counts
    "pricing_summary",
    # Q3-style 3-way join: NULL custkeys/prices/discounts/orderdates
    "shipping_priority",
    # validity-bitmap counts must equal SQL count(*)-count(col)
    "null_profile",
    # Zipf fit consumes the nullable/exotic-whitespace tokenizer
    "zipf_slope",
    # power iteration over the nasty zero vectors (and any NULL
    # embeddings) must keep the integer accumulation order-free
    "pca_power_component",
    # skyline: NULL n_chars / NULL text exclusion parity; the nasty
    # duplicate texts exercise the equal-point survival rule
    "pareto_front_docs",
    # smoothed KL over the exotic-whitespace/NULL-text tokenizer
    "kl_unigram_drift",
    # Theil-Sen: NULL-type group, NULL ts excluded, pre-1970 day
    # arithmetic, single-day types must drop (no pairs)
    "theil_sen_trend",
    # compression ratio: NULL-lang groups, NULL-text exclusion, and
    # the export-oracle aggregation layer on the nasty corpus
    "compression_ratio",
    # survivorship: all-NULL-field clusters keep NULL, first-non-null
    # order matters on the nasty duplicate seeds
    "golden_records",
    # robust rolling median: NULL ts excluded, pre-1970 / isolated
    # days land in incomplete windows -> NULL med/dev
    "rolling_median_anomaly",
    # seed-teleport PageRank over NULL-host-pruned edges
    "personalized_pagerank",
    # throttle: NULL user/ts excluded, NULL type is a partition,
    # equal-ts ties break on event_id identically
    "event_throttle_dedup",
    # percent_rank: NULL n_chars excluded, NULL lang partition,
    # single-row partitions report 0
    "chars_percent_rank",
    # fulfillment lag: NULL orderdates/shipdates drop; NULL priority
    # is a selection group
    "order_fulfillment_lag",
    # Q5-style snowflake: NULL custkeys/prices/discounts drop
    "region_revenue",
    # cluster histogram over the nasty dup seeds
    "dup_cluster_sizes",
    # vocab cosine: NULL lang excluded, exotic-whitespace tokenizer
    "lang_vocab_cosine",
    # basket pairs: NULL order/part keys excluded; nasty lineitem has
    # NULL quantities/prices riding through untouched
    "part_cooccurrence",
    # anti-join: NULL o_custkey never enters the probe set; NOT-EXISTS
    # parity on the segment rollup
    "customers_no_urgent",
    # bilateral trade matrix: NULL price/discount/custkey rows drop on
    # both sides; year() parity on the ship-year key
    "nation_trade_volume",
    # reduce->join->top-k: NULL returnflag is not 'R'; NULL price rows
    # drop; deterministic (revenue DESC, custkey ASC) boundary
    "returned_items_report",
    # Q6-style: NULL discount/quantity fail the WHERE band; all-NULL
    # price years must report NULL revenue with exact n_rows
    "forecast_revenue",
    # Q4-style EXISTS: NULL o_orderdate makes the comparison UNKNOWN
    # so the order drops; orders with no lineitems never match
    "order_priority_exists",
    # Q12-style CASE census: NULL priority in neither counter, NULL
    # returnflag a kept group, dangling lineitems drop
    "returnflag_priority_counts",
    # Q13-style histogram: NULL/dangling o_custkey excluded from the
    # counts; zero bucket = distinct customers minus matched
    "customer_order_distribution",
    # Q14-style promo share: NULL price/discount rows drop before the
    # join; the integer percent formula is shared with the oracle
    "promo_revenue",
    # Q17-style correlated average: NULL quantities skipped by the
    # per-part moments AND failing the cleared inequality
    "small_qty_revenue",
    # Q18-style HAVING join-back: NULL quantities skipped by the
    # per-order mass; NULL totalprice ranks last via the sentinel;
    # NULL custkeys drop (inner-join parity)
    "large_volume_customers",
    # Q19-style disjunction: NaN quantities fail every band; NULL
    # price/discount counts in n_rows but not the revenue sum
    "disjunctive_revenue",
    # rank-sum from the length histogram: NULL lang/n_chars excluded;
    # the nasty duplicate lengths exercise the tie half exactly
    "mannwhitney_chars",
    # Benford census: NULL totalprice excluded; integer digit
    # extraction must match the string prefix on every magnitude
    "benford_totalprice",
    # lag-1 autocorr: NULL ts excluded, NULL type is a group, the
    # nasty isolated/pre-1970 days must pair (or not) identically
    "daily_autocorr",
    # char-class counts over NULL/exotic-whitespace/Unicode-digit
    # texts: RE2 \\s and [0-9] must agree on \\x0b, NBSP, ٣٤
    "charclass_profile",
    # readability counters on the exotic-whitespace tokenizer family
    "readability_counts",
    # heatmap: pre-1970 timestamps must floor/mod identically
    "event_heatmap",
    # Q15: NULL suppkey/price/discount rows drop; = max keeps ties
    "top_supplier",
    # int8 quantization: the nasty zero vectors land in zero-range
    # dimensions (code 0, zero error); NULL labels are a group
    "embedding_quantize",
    # grouped argmax: NULL lang group; the nasty duplicate lengths
    # exercise the MIN-doc_id tie-break
    "longest_doc_per_lang",
    # temporal self-join: NULL users/ts excluded, NULL types are pair
    # members; the nasty equal-ts events exercise the id tie order
    "type_cooccurrence_1h",
    # Q8 snowflake: NULL custkey/suppkey/price/discount rows drop on
    # every level; integer half-away share
    "market_share",
    # quality-priority representatives: the nasty NULL-text and dup
    # seeds exercise the qlen-0 members and the champion tie-break
    "cluster_representatives",
    # ordered string agg on the exotic-whitespace tokenizer; NULL lang
    # group; the rank ORDER must survive the distributed top-k
    "top_words_concat",
    # url depth: NULL source -> NULL canonical rows excluded on both
    # sides; canonicalizer parity on the nasty url classes
    "url_depth_profile",
    # boilerplate rate: NULL source group, NULL texts excluded, the
    # nasty embedded newlines split into extra paragraph instances
    "boilerplate_rate_by_source",
    # exact EWMA: NULL ts excluded, NULL type group, pre-1970 and
    # isolated days window identically
    "ewma_daily",
    # method agreement: both pair engines on the nasty dup seeds and
    # NULL texts; zero-pair methods must drop their row
    "dedup_method_overlap",
    # tag-vs-group-median: NULL lang group joins NULL-safely; the
    # nasty duplicate lengths exercise the = bucket
    "docs_above_lang_median",
    # sweep-line backlog: NULL orderdates drop; extra nasty orders
    # with no lineitems drop (inner parity)
    "order_backlog_daily",
    # OLS calibration: pairwise NULL exclusion, NULL lang group,
    # single-doc zero-variance NULL slope
    "tokens_per_char_ols",
    # funnel gates on NULL text / NULL n_chars and exotic whitespace
    "quality_funnel",
    # trigram mining: NULL types are STATES; equal-ts id tie order;
    # the row-counter guard vs genuinely-NULL states
    "top_event_trigrams",
    # month rollup: NULL orderdates drop, all-NULL-price months
    # report NULL mass with exact n_orders
    "monthly_revenue",
    # lifetime span: NULL custkey/orderdate drop; the nasty extra
    # orders create fresh single-order customers in band 0
    "customer_lifetime_span",
    # reciprocity over NULL-host-pruned distinct edges, no self-loops
    "host_reciprocity",
    # deny-list prefix match: NULL canonical urls excluded; the
    # prefix-free predecessor search must equal SQL's any-EXISTS
    "url_prefix_blocklist",
    # survival curve on the nasty dup seeds (exact tie Jaccards at
    # the 0.5 boundary must threshold identically)
    "dedup_threshold_curve",
    # islands: the nasty +10M perturbed ids create far-apart islands
    "doc_id_islands",
    # Tukey fences: NULL values excluded, NULL type group, all-NULL
    # groups drop
    "value_iqr_outliers",
    # MERGE apply: NULL doc_ids match no delta; 'rev2 ' || NULL stays
    # NULL; delete precedence; NULL lang rollup group
    "apply_upserts",
    # N50 over NULL-host-excluded counts (host-graph policy)
    "host_n50",
    # word-length grid on the exotic-whitespace/NULL-text tokenizer
    "token_length_histogram",
    # entry/exit matrix: NULL users/ts excluded, NULL types as
    # boundary states, equal-ts id tie order
    "session_entry_exit",
    # value LAG volatility: NULL values skip the step (LAG parity),
    # NULL type group, boundary users contribute exactly once
    "value_volatility",
    # new-vs-returning: NULL users/ts excluded; the nasty future-day
    # events create fresh first-day groups
    "returning_share_daily",
    # executive summary: NULL text/lang/source rates on the nasty
    # corpus; 128-bit distinct vs SQL DISTINCT text
    "corpus_report",
    # lang-mix entropy: NULL lang is a counted category, NULL source
    # a group; e6-quantized ln parity
    "source_lang_entropy",
    # silence gaps: NULL ts excluded, NULL type group, the nasty
    # isolated pre-1970/future days create giant gaps
    "max_silence_days",
    # 1-NN agreement: nasty zero vectors excluded on both sides,
    # NULL labels NULL-safe agree, duplicate vectors tie on min id
    "knn_label_agreement",
    # weekday ANOVA: NULL ts excluded; pre-1970/future nasty days
    # floor and mod identically; quantized terms order-free
    "dow_anova",
    # trend census: NULL custkey/date/price drop; the nasty extra
    # orders create fresh single-order customers
    "customer_trend_census",
    # whale share: NULL price/custkey rows drop; ceil-k boundary
    "revenue_top1pct_share",
    # conversion latency: same-ts purchase converts only when it
    # sorts after the signup; NULL users/ts excluded
    "signup_to_purchase_latency",
    # fan-out profile: NULL orderkeys drop
    "order_size_histogram",
    # discount curve: NULL quantity drops the row, all-NULL-discount
    # bands report NULL mass
    "discount_by_qty_band",
    # KM survival: NULL ts/user excluded; censoring at the corpus's
    # observed end day must agree after the exclusions
    "km_user_survival",
    # RANK ties: NULL lang partition group; NULL n_chars rows are
    # peers ranked last and kept when a sparse lang leaves rank <= k
    "topk_with_ties",
    # weighted median: NULL price/quantity rows drop (SQL WHERE)
    "weighted_median_price",
]


@pytest.fixture(scope="module")
def nasty_sf(tmp_path_factory):
    """Adversarial corpus: NULL lang/source/text/user_id, exotic
    whitespace (\\x0b, NBSP), Unicode digits, empty strings, exact and
    normalized duplicates — the input classes where engine-vs-RE2/SQL
    semantics can silently diverge."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("nasty") / "sf")
    import os
    os.makedirs(d)
    for t in TABLES:
        if t not in ("documents", "events", "embeddings",
                     "orders", "lineitem"):
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{d}/{t}.parquet")

    for t, idcol, nullcols in [
        ("orders", "o_orderkey",
         ["o_custkey", "o_orderdate", "o_totalprice"]),
        ("lineitem", None,
         ["l_quantity", "l_extendedprice", "l_returnflag", "l_discount"]),
    ]:
        df = pq.read_table(f"{SF_DIR}/{t}.parquet").to_pandas()
        extra = df.head(len(nullcols) * 2).copy()
        if idcol:
            extra[idcol] = np.arange(
                int(df[idcol].max()) + 1,
                int(df[idcol].max()) + 1 + len(extra),
                dtype=df[idcol].dtype)
        for i, c in enumerate(nullcols):
            extra.iloc[2 * i:2 * i + 2, extra.columns.get_loc(c)] = None
        pq.write_table(
            pa.Table.from_pandas(pd.concat([df, extra], ignore_index=True),
                                 preserve_index=False,
                                 schema=pq.read_schema(
                                     f"{SF_DIR}/{t}.parquet")),
            f"{d}/{t}.parquet")

    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    vb = int(emb["vec_id"].max()) + 1
    dim = len(emb["embedding"].iloc[0])
    emb_add = pd.DataFrame({
        "vec_id": np.arange(vb, vb + 3, dtype=emb["vec_id"].dtype),
        "embedding": [np.zeros(dim, dtype=np.float32),
                      np.ones(dim, dtype=np.float32) / np.sqrt(dim),
                      np.zeros(dim, dtype=np.float32)],
        "label": [None, 3, 7],
    })
    out_emb = pd.concat([emb, emb_add], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out_emb, preserve_index=False,
                             schema=pq.read_schema(
                                 f"{SF_DIR}/embeddings.parquet")),
        f"{d}/embeddings.parquet")

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    base = int(docs["doc_id"].max()) + 1
    texts = [None, "", " ", "\x0b", "ab\x0bcd ef", "nb\xa0sp words here",
             "digits ٣٤ and 12", "tab\tsep\nnl\rcr\ffeed words",
             "   pad   ", "dup dup dup dup dup", "dup dup dup dup dup",
             "DUP dup DUP dup DUP", "short", ("w " * 600).strip()]
    add = pd.DataFrame({
        "doc_id": np.arange(base, base + len(texts),
                            dtype=docs["doc_id"].dtype),
        "text": texts,
        "lang": ([None, "en", "de", "xx"] * 4)[:len(texts)],
        "source": ([None, "src0", "srcN"] * 5)[:len(texts)],
        "n_chars": [len(t) if t else 0 for t in texts],
    })
    out = pd.concat([docs, add], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, preserve_index=False,
                             schema=pq.read_schema(
                                 f"{SF_DIR}/documents.parquet")),
        f"{d}/documents.parquet")

    ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    eb = int(ev["event_id"].max()) + 1
    nul = ev.head(17).copy()
    nul["event_id"] = np.arange(eb, eb + 17, dtype=ev["event_id"].dtype)
    idx = nul.index
    nul.loc[idx[:3], "user_id"] = None
    nul.loc[idx[3:6], "ts"] = pd.NaT
    nul.loc[idx[6:8], "event_type"] = None
    nul.loc[idx[8:10], "value"] = None
    nul.loc[idx[10:12], "props"] = None
    # pre-1970 timestamps: negative epoch-us, where DuckDB's truncating
    # // diverges from numpy's floor division (sliding-window finding)
    nul.loc[idx[12:15], "ts"] = pd.to_datetime(
        ["1969-12-31 23:30:00", "1969-06-15 11:11:11",
         "1969-12-31 00:00:00"])
    # a day whose events ALL have NULL user_id (ADVICE r3 medium):
    # window_distinct_users must drop the whole day group (documented
    # NULL policy), not emit n_distinct=0 or count the NULLs
    nul.loc[idx[15:], "ts"] = pd.to_datetime(
        ["2031-05-05 01:02:03", "2031-05-05 22:59:59"])
    nul.loc[idx[15:], "user_id"] = None
    out_e = pd.concat([ev, nul], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out_e, preserve_index=False,
                             schema=pq.read_schema(
                                 f"{SF_DIR}/events.parquet")),
        f"{d}/events.parquet")
    return d


@pytest.fixture(scope="module")
def nasty_con(nasty_sf):
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{nasty_sf}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", NASTY_QUERIES)
def test_query_matches_oracle_on_adversarial_corpus(ray_session, nasty_sf,
                                                    nasty_con, name):
    fn = entrymod.queries()[name]
    got = fn(nasty_sf)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = nasty_con.sql(entrymod.oracle_sql()[name]).df()
    _compare(got, want, name)
