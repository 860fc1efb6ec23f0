"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship validation pipeline on pages synthesized
deterministically from sf0.001; ``queries()`` exposes one callable per
implemented operator family (SURVEY.md §2) over ``sf_dir``; ``oracle_sql``
gives the DuckDB-equivalent SQL for every SQL-expressible query (column
names match exactly).  Ray is initialised by the caller — nothing here
calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from cckp_toolkit_workflow_ray.logfilter import (
    install_empty_column_size_filter as _install_logfilter,
)
from cckp_toolkit_workflow_ray.pipelines import queries as q

# driver-side log hygiene only (drops Ray's spurious empty-column sizing
# warning); the caller owns ray.init, so the worker-side hook is theirs
_install_logfilter()

# derived-URL corpus + RE2 canonicalization chain, shared by the
# canonical_url_dedup and url_host_rollup oracles.  The regex chain is
# the EXACT transform sequence of functions/urls.py:canonicalize_urls —
# both engines run RE2, so parity is kernel-exact ('g' = replace-all,
# matching Arrow's replace_substring_regex default).
_URL_CANON_CTE = r"""
    WITH urls AS (
        SELECT doc_id,
            CASE doc_id % 5
              WHEN 0 THEN 'https://www.' || source || '.example.com/item/'
                          || CAST(doc_id % 1000 AS VARCHAR) || '?utm_source=feed'
              WHEN 1 THEN 'http://' || source || '.example.com/item/'
                          || CAST(doc_id % 1000 AS VARCHAR)
              WHEN 2 THEN 'https://' || source || '.example.com/item/'
                          || CAST(doc_id % 1000 AS VARCHAR) || '/'
              WHEN 3 THEN 'HTTPS://' || upper(source) || '.EXAMPLE.COM:443/item/'
                          || CAST(doc_id % 1000 AS VARCHAR)
              ELSE 'https://' || source || '.example.com/item/'
                   || CAST(doc_id % 1000 AS VARCHAR)
                   || '?ref=a&gclid=x' || CAST(doc_id % 7 AS VARCHAR)
            END AS url
        FROM documents),
    s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '', 'g') AS u
           FROM urls),
    canon AS (
        SELECT doc_id,
            regexp_replace(
            regexp_replace(
            regexp_replace(
            regexp_replace(
            regexp_replace(
            regexp_replace(
            regexp_replace(
              CASE WHEN regexp_extract(
                        u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) <> ''
                   THEN lower(regexp_extract(
                            u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
                        || regexp_replace(
                            u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '', 'g')
                   ELSE u END,
              '^http://', 'https://', 'g'),
              '^https://www\.', 'https://', 'g'),
              '^(https://[^/?#:]+):(?:443|80)(/|\?|#|$)', '\1\2', 'g'),
              '&(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*', '', 'g'),
              '\?(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*&', '?', 'g'),
              '\?(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*$', '', 'g'),
              '/$', '', 'g') AS canonical_url
        FROM s1)
"""

# k-core peeling oracle: the 8 synchronous peel rounds unroll into
# chained CTEs (degree -> qualifying set -> surviving edges per round);
# a converged round is a no-op, so the fixed unroll matches the
# engine's early-exiting iteration exactly
def _kcore_round_ctes(k: int = 2, n_rounds: int = 8) -> str:
    parts = []
    for r in range(1, n_rounds + 1):
        parts.append(f"""
            d{r} AS MATERIALIZED (
                     SELECT h, CAST(count(*) AS BIGINT) AS n FROM (
                         SELECT u AS h FROM g{r - 1}
                         UNION ALL SELECT v AS h FROM g{r - 1})
                     GROUP BY h),
            k{r} AS MATERIALIZED (SELECT h FROM d{r} WHERE n >= {k}),
            g{r} AS MATERIALIZED (
                     SELECT u, v FROM g{r - 1}
                     WHERE u IN (SELECT h FROM k{r})
                       AND v IN (SELECT h FROM k{r}))""")
    return ",".join(parts)


# integer-exact PageRank oracle: the 5 synchronous iterations unroll
# into chained CTEs — every quantity is an int64 (floor-division
# contributions, integer damping), so the engine matches hash-exactly
def _hits_iter_ctes(n: int = 2) -> str:
    """Unrolled integer-exact HITS iterations: each half-step
    renormalises by the integer divisor max(1, Σ // (n_nodes·1e6)) —
    the float-free analog of the L2 norm (see stages/graph.py:
    hits_int)."""
    parts = []
    for k in range(1, n + 1):
        for raw, prev, out in ((f"h{k}", f"a{k - 1}", "h"),
                               (f"a{k}", f"h{k}", "a")):
            src_side, dst_side = ("src", "dst") if out == "h" \
                else ("dst", "src")
            prev_col = "a" if out == "h" else "h"
            parts.append(f"""
            {raw}r AS (
                SELECT e.{src_side} AS host,
                       CAST(sum(e.w * p.{prev_col}) AS BIGINT) AS s
                FROM edges e JOIN {prev} p ON p.host = e.{dst_side}
                GROUP BY e.{src_side}),
            {raw}d AS (
                SELECT greatest(CAST(1 AS BIGINT),
                       CAST(coalesce(sum(s), 0) AS BIGINT)
                       // ((SELECT n FROM nn) * 1000000)) AS d
                FROM {raw}r),
            {raw} AS (
                SELECT n.host,
                       CAST(coalesce(r.s, 0)
                            // (SELECT d FROM {raw}d)
                            AS BIGINT) AS {out}
                FROM nodes n LEFT JOIN {raw}r r ON r.host = n.host)""")
    return ",".join(parts)


def _ihalf(expr: str) -> str:
    """SQL round-half-away-from-zero of a DOUBLE expression as BIGINT
    (the label_centroids form — explicit floor so a value landing
    exactly on .5 never depends on the round() tie rule)."""
    return (f"CAST(CASE WHEN ({expr}) >= 0 "
            f"THEN floor(({expr}) + 0.5) "
            f"ELSE -floor(-({expr}) + 0.5) END AS BIGINT)")


def _bfs_iter_ctes(n: int = 8) -> str:
    """Unrolled min-distance propagation rounds: after k rounds a node
    at true hop distance d ≤ k holds exactly d, any farther node NULL
    (see stages/graph.py:bfs_depths_str)."""
    parts = []
    for k in range(1, n + 1):
        parts.append(f"""
            d{k} AS (
                SELECT t.host, CAST(min(t.cand) AS BIGINT) AS d
                FROM (
                    SELECT host, d AS cand FROM d{k - 1}
                    UNION ALL
                    SELECT ue.dst AS host, p.d + 1 AS cand
                    FROM ue JOIN d{k - 1} p ON p.host = ue.src
                    WHERE p.d IS NOT NULL) t
                GROUP BY t.host)""")
    return ",".join(parts)


def _pagerank_iter_ctes(n: int = 5, personalized: bool = False) -> str:
    base = ("CASE WHEN n.host IN (SELECT host FROM seeds) "
            "THEN 150000000 ELSE 0 END"
            if personalized else "150000000")
    parts = []
    for k in range(1, n + 1):
        parts.append(f"""
            r{k} AS (
                SELECT n.host,
                       CAST({base} + (85 * coalesce(c.s, 0)) // 100
                            AS BIGINT) AS r
                FROM nodes n LEFT JOIN (
                    SELECT ew.dst AS host,
                           CAST(sum((p.r * ew.w) // ew.deg)
                                AS BIGINT) AS s
                    FROM ew JOIN r{k - 1} p ON p.host = ew.src
                    GROUP BY ew.dst) c ON c.host = n.host)""")
    return ",".join(parts)


# exact char-5-shingle Jaccard of the seeded (doc, perturbed-copy) pairs;
# shingles are distinct 5-char windows (short strings pad — the PAD:
# namespace can never equal a real 5-char window).  Shared by the
# minhash_verify_jaccard oracle and the minhash_seeded_containment filter.
_MINHASH_VERIFY_SQL = """
    WITH seeded AS (
        SELECT doc_id AS id_a, doc_id + 10000000 AS id_b,
               coalesce(text, '') AS ta,
               CASE WHEN doc_id % 50 = 0
                    THEN reverse(coalesce(text, ''))
                    WHEN contains(coalesce(text, ''), ' ')
                    THEN 'xqzv' || substr(coalesce(text, ''),
                                          strpos(coalesce(text, ''), ' '))
                    ELSE 'xqzv' END AS tb
        FROM documents WHERE doc_id % 10 = 0
    ),
    ga AS (
        SELECT DISTINCT id_a, sh FROM (
            SELECT id_a, substr(ta, unnest(generate_series(
                1, greatest(length(ta) - 4, 0))), 5) AS sh
            FROM seeded)
        UNION
        SELECT id_a, 'PAD:' || ta FROM seeded WHERE length(ta) < 5
    ),
    gb AS (
        SELECT DISTINCT id_a, sh FROM (
            SELECT id_a, substr(tb, unnest(generate_series(
                1, greatest(length(tb) - 4, 0))), 5) AS sh
            FROM seeded)
        UNION
        SELECT id_a, 'PAD:' || tb FROM seeded WHERE length(tb) < 5
    ),
    inter AS (
        SELECT a.id_a, count(*) AS ni
        FROM ga a JOIN gb b ON a.id_a = b.id_a AND a.sh = b.sh
        GROUP BY a.id_a
    ),
    ca AS (SELECT id_a, count(*) AS na FROM ga GROUP BY id_a),
    cb AS (SELECT id_a, count(*) AS nb FROM gb GROUP BY id_a)
    SELECT s.id_a, s.id_b,
           CAST(round((1000000.0 * coalesce(i.ni, 0))
                      / (ca.na + cb.nb - coalesce(i.ni, 0)))
                AS BIGINT) AS jaccard_e6
    FROM seeded s
    JOIN ca ON ca.id_a = s.id_a
    JOIN cb ON cb.id_a = s.id_a
    LEFT JOIN inter i ON i.id_a = s.id_a
"""

# exact word-3-gram Jaccard on the same seeded pairs (python str.split()
# semantics: whitespace runs, strip; <3 words -> the single gram
# join(words)).  Shared by the ngram_verify_jaccard oracle and the
# ngram_seeded_containment filter.
_NGRAM_VERIFY_SQL = """
    WITH seeded AS (
        SELECT doc_id AS id_a, doc_id + 10000000 AS id_b,
               coalesce(text, '') AS ta,
               CASE WHEN doc_id % 50 = 0
                    THEN reverse(coalesce(text, ''))
                    WHEN contains(coalesce(text, ''), ' ')
                    THEN 'xqzv' || substr(coalesce(text, ''),
                                          strpos(coalesce(text, ''), ' '))
                    ELSE 'xqzv' END AS tb
        FROM documents WHERE doc_id % 10 = 0
    ),
    wa AS (SELECT id_a, list_filter(string_split_regex(ta, '\\s+'),
                                    x -> x <> '') AS ws FROM seeded),
    wb AS (SELECT id_a, list_filter(string_split_regex(tb, '\\s+'),
                                    x -> x <> '') AS ws FROM seeded),
    ga AS (
        SELECT DISTINCT id_a, g FROM (
            SELECT id_a, array_to_string(ws[i:i+2], ' ') AS g FROM (
                SELECT id_a, ws, unnest(generate_series(
                    1, greatest(len(ws) - 2, 0))) AS i
                FROM wa WHERE len(ws) >= 3))
        UNION
        SELECT id_a, array_to_string(ws, ' ')
        FROM wa WHERE len(ws) BETWEEN 1 AND 2
    ),
    gb AS (
        SELECT DISTINCT id_a, g FROM (
            SELECT id_a, array_to_string(ws[i:i+2], ' ') AS g FROM (
                SELECT id_a, ws, unnest(generate_series(
                    1, greatest(len(ws) - 2, 0))) AS i
                FROM wb WHERE len(ws) >= 3))
        UNION
        SELECT id_a, array_to_string(ws, ' ')
        FROM wb WHERE len(ws) BETWEEN 1 AND 2
    ),
    inter AS (
        SELECT a.id_a, count(*) AS ni
        FROM ga a JOIN gb b ON a.id_a = b.id_a AND a.g = b.g
        GROUP BY a.id_a
    ),
    ca AS (SELECT id_a, count(*) AS na FROM ga GROUP BY id_a),
    cb AS (SELECT id_a, count(*) AS nb FROM gb GROUP BY id_a)
    SELECT s.id_a, s.id_b,
           CAST(round((1000000.0 * coalesce(i.ni, 0))
                      / (coalesce(ca.na, 0) + coalesce(cb.nb, 0)
                         - coalesce(i.ni, 0)))
                AS BIGINT) AS jaccard_e6
    FROM seeded s
    LEFT JOIN ca ON ca.id_a = s.id_a
    LEFT JOIN cb ON cb.id_a = s.id_a
    LEFT JOIN inter i ON i.id_a = s.id_a
"""


def _lsh_pair_ctes(oracle_dir: str) -> str:
    """Shared CTE block recomputing the FULL LSH-verified pair set from
    the engine's oracle export (``minhash_lsh_pairs(export_oracle_dir=)``):
    candidates = docs sharing >= 1 band key (self-join on the engine's own
    band-key table), verified by exact set-Jaccard over the exported
    per-doc distinct shingle-hash sets.  Mirrors the stage exactly — docs
    with empty shingle sets can never pass (j = 0 < threshold, and they
    are absent from the shingle table so the sizes join drops them), and
    the DOUBLE division of exact BIGINTs is IEEE-identical to the
    engine's numpy float64 division."""
    return f"""
    bands AS (
        SELECT * FROM read_parquet('{oracle_dir}/bands/*.parquet')
    ),
    sh AS (
        SELECT * FROM read_parquet('{oracle_dir}/shingles/*.parquet')
    ),
    cand AS (
        SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
        FROM bands a JOIN bands b
          ON a."key" = b."key" AND a.doc < b.doc
    ),
    sizes AS (SELECT doc, count(*) AS n FROM sh GROUP BY doc),
    inter AS (
        SELECT c.id_a, c.id_b, count(*) AS i
        FROM cand c
        JOIN sh sa ON sa.doc = c.id_a
        JOIN sh sb ON sb.doc = c.id_b AND sb.shingle = sa.shingle
        GROUP BY c.id_a, c.id_b
    ),
    verified AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN sizes na ON na.doc = c.id_a
        JOIN sizes nb ON nb.doc = c.id_b
        LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
        WHERE CAST(coalesce(i.i, 0) AS DOUBLE)
              / (na.n + nb.n - coalesce(i.i, 0)) >= 0.5
    )"""


def _lsh_pairs_sql(oracle_dir: str) -> str:
    """Engine LSH pair-set output = the verified CTE, bare."""
    return ("WITH " + _lsh_pair_ctes(oracle_dir)
            + "\n    SELECT id_a, id_b FROM verified")


def _lsh_filtered_sql(oracle_dir: str) -> str:
    """End-to-end near-dup removal oracle: pair set (as above) →
    connected components via a recursive min-label CTE → keep the min-id
    representative per component plus every unpaired doc.  The corpus id
    set is re-derived in SQL exactly as ``_derived_text_corpus`` builds
    it (documents ∪ perturbed copies of every 10th doc at +10_000_000)."""
    return ("WITH RECURSIVE " + _lsh_pair_ctes(oracle_dir) + f""",
    edges AS (
        SELECT id_a AS a, id_b AS b FROM verified
        UNION
        SELECT id_b, id_a FROM verified
    ),
    reach(node, lbl) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.b, r.lbl
        FROM reach r JOIN edges e ON e.a = r.node
        WHERE r.lbl < e.b
    ),
    minlbl AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node),
    losers AS (SELECT node FROM minlbl WHERE lbl < node),
    corpus AS (
        SELECT doc_id FROM documents
        UNION ALL
        SELECT doc_id + 10000000 FROM documents WHERE doc_id % 10 = 0
    )
    SELECT c.doc_id FROM corpus c
    WHERE c.doc_id NOT IN (SELECT node FROM losers)""")


def entry() -> Any:
    """Flagship: full validation DAG over a 10k-row pages table derived
    deterministically (seed=42) from the sf0.001 scale point; returns the
    per-(lang, check) verdict table."""
    from cckp_toolkit_workflow_ray.pipelines.validate import validate
    from cckp_toolkit_workflow_ray.sources.pages import generate_pages_dataset

    res = validate(generate_pages_dataset(10_000, seed=42))
    return res.verdicts


PAGES_ORACLE_DIR = "/tmp/cckp_pages_oracle/pages"

# The full engine check set minus `extraction` (the one check whose
# semantics — re-running the HTML extractor — no SQL oracle can express;
# it keeps its byte-exact pytest oracle in tests/oracle.py and runs in
# entry()).  Everything else in the verdict table is SQL-reproducible.
_PAGES_SQL_CHECKS = (
    "presence_url", "presence_warc_ts", "presence_html", "presence_text",
    "presence_lang", "url_format", "referential_lang", "uniqueness_url",
    "drift_text_len", "drift_html_len", "drift_null_rate",
)


def _pages_validate(sf_dir: str) -> Any:
    """Full-engine verdict table (per-(lang, check) n_rows/violations/
    pass-rate/status/verdict + __overall__ rollups) on a synthesized
    pages table (size tied to the scale point) — with the pages table
    also written to parquet at a fixed path so the DuckDB oracle can
    reproduce every row (VERDICT r2 #7).  The `score` column is excluded
    from the compared output: the __overall__ mean's float summation
    order is engine-internal and would make the hash comparison
    ulp-flaky; scores are pinned by pytest instead."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from cckp_toolkit_workflow_ray.config import ValidationConfig
    from cckp_toolkit_workflow_ray.pipelines.validate import validate
    from cckp_toolkit_workflow_ray.sources.pages import generate_pages_dataset

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n = 20 * n_docs
    # deterministic pages parquet for the oracle (rows are a pure function
    # of (index, seed), so content is layout-independent); the dir must be
    # cleared first — write_parquet appends UUID part files
    shutil.rmtree(PAGES_ORACLE_DIR, ignore_errors=True)
    os.makedirs(PAGES_ORACLE_DIR, exist_ok=True)
    generate_pages_dataset(n, seed=42).write_parquet(PAGES_ORACLE_DIR)

    cfg = ValidationConfig(checks=_PAGES_SQL_CHECKS)
    res = validate(PAGES_ORACLE_DIR, config=cfg)
    df = res.verdicts.sort_values(["lang", "check"]).reset_index(drop=True)
    return df[["lang", "check", "n_rows", "n_violations", "pass_rate",
               "status", "verdict"]]


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "presence_check": q.presence_check,
        "format_check": q.format_check,
        "referential_lang_check": q.referential_lang_check,
        "referential_events_check": q.referential_events_check,
        "stats_profile": q.stats_profile,
        "distinct_sources": q.distinct_sources,
        "uniqueness_nchars": q.uniqueness_nchars,
        "exact_dedup": q.exact_dedup,
        "keyword_check": q.keyword_check,
        "topk_longest": q.topk_longest,
        "nchars_quantiles": q.nchars_quantiles,
        "nchars_mode": q.nchars_mode,
        "normalized_prefixes": q.normalized_prefixes,
        "stratified_sample": q.stratified_sample,
        "deterministic_sample": q.deterministic_sample,
        "token_count": q.token_count,
        "verdict_rollup": q.verdict_rollup,
        "windowed_events": q.windowed_events,
        "asof_last_order": q.asof_last_order,
        "pages_validate": _pages_validate,
        # training-data ops (dedup / similarity / text analysis)
        "exact_dedup_full": q.exact_dedup_full,
        "incremental_dedup": q.incremental_dedup,
        "incremental_bloom_dedup": q.incremental_bloom_dedup,
        "incremental_near_dedup": q.incremental_near_dedup,
        "normalized_dedup": q.normalized_dedup,
        "canonical_url_dedup": q.canonical_url_dedup,
        "url_host_rollup": q.url_host_rollup,
        "minhash_dedup": q.minhash_dedup,
        "minhash_dedup_filtered": q.minhash_dedup_filtered,
        "simhash_dedup": q.simhash_dedup,
        "ngram_jaccard_dedup": q.ngram_jaccard_dedup,
        "paragraph_dedup": q.paragraph_dedup,
        "word_frequencies": q.word_frequencies,
        "media_features": q.media_features,
        "knn_embeddings": q.knn_embeddings,
        "ivf_knn_embeddings": q.ivf_knn_embeddings,
        "ivf_knn_exhaustive": q.ivf_knn_exhaustive,
        "embedding_neardup": q.embedding_neardup,
        "cosine_threshold_pairs": q.cosine_threshold_pairs,
        "minhash_verify_jaccard": q.minhash_verify_jaccard,
        "ngram_verify_jaccard": q.ngram_verify_jaccard,
        "minhash_seeded_containment": q.minhash_seeded_containment,
        "ngram_seeded_containment": q.ngram_seeded_containment,
        "docs_validate": q.docs_validate,
        "bpe_token_count": q.bpe_token_count,
        "quality_check": q.quality_check,
        "pii_redact": q.pii_redact,
        "decontaminate": q.decontaminate,
        "repetition_check": q.repetition_check,
        "chunk_docs": q.chunk_docs,
        "unigram_logprob": q.unigram_logprob,
        "domain_cap": q.domain_cap,
        "sequence_pack": q.sequence_pack,
        "global_shuffle": q.global_shuffle,
        "quality_deciles": q.quality_deciles,
        "curate_corpus": q.curate_corpus,
        "dup_ngram_flag": q.dup_ngram_flag,
        "mixture_sample": q.mixture_sample,
        "temperature_mixture": q.temperature_mixture,
        "rollup_lang_source": q.rollup_lang_source,
        "tfidf_top_terms": q.tfidf_top_terms,
        "bm25_top_docs": q.bm25_top_docs,
        "heavy_hitter_words": q.heavy_hitter_words,
        "value_quantiles_exact": q.value_quantiles_exact,
        "retention_cohorts": q.retention_cohorts,
        "value_quantiles_by_type": q.value_quantiles_by_type,
        "funnel_conversion": q.funnel_conversion,
        "skew_join_events": q.skew_join_events,
        "label_centroids": q.label_centroids,
        "budget_sample": q.budget_sample,
        "cluster_composition": q.cluster_composition,
        "langid_confusion": q.langid_confusion,
        "fingerprint_docs": q.fingerprint_docs,
        "winnow_verify": q.winnow_verify,
        "ivf_knn_oracled": q.ivf_knn_oracled,
        "kmeans_clusters": q.kmeans_clusters,
        "semantic_dedup": q.semantic_dedup,
        "cluster_balanced_sample": q.cluster_balanced_sample,
        "exact_substring_spans": q.exact_substring_spans,
        "exact_substring_cut": q.exact_substring_cut,
        "dsir_sample": q.dsir_sample,
        "weighted_sample": q.weighted_sample,
        # window + join operators
        "sliding_events": q.sliding_events,
        "session_windows": q.session_windows,
        "hash_join_revenue": q.hash_join_revenue,
        "enrich_events_nation": q.enrich_events_nation,
        "asof_bucketed": q.asof_bucketed,
        "interval_event_windows": q.interval_event_windows,
        "distinct_users_events": q.distinct_users_events,
        "window_distinct_users": q.window_distinct_users,
        "user_growth": q.user_growth,
        "embedding_norm_stats": q.embedding_norm_stats,
        "top_orders": q.top_orders,
        "json_props_stats": q.json_props_stats,
        "drift_check": q.drift_check,
        # drift / sequence / statistical / phrase operators
        "daily_drift": q.daily_drift,
        "inter_event_gaps": q.inter_event_gaps,
        "latest_event_per_user": q.latest_event_per_user,
        "corr_chars_tokens": q.corr_chars_tokens,
        "cube_lang_source": q.cube_lang_source,
        "token_entropy": q.token_entropy,
        "pmi_bigrams": q.pmi_bigrams,
        "pagerank_hosts": q.pagerank_hosts,
        "host_components": q.host_components,
        "event_rate_anomaly": q.event_rate_anomaly,
        "snapshot_diff": q.snapshot_diff,
        "dataset_split": q.dataset_split,
        "bigram_logprob": q.bigram_logprob,
        "event_transitions": q.event_transitions,
        "triangle_count": q.triangle_count,
        "value_mad_by_type": q.value_mad_by_type,
        "keyword_matrix": q.keyword_matrix,
        "value_histogram": q.value_histogram,
        "daily_type_growth": q.daily_type_growth,
        "rolling_active_users": q.rolling_active_users,
        "rfm_segments": q.rfm_segments,
        "dup_rate_by_source": q.dup_rate_by_source,
        "gap_quantiles": q.gap_quantiles,
        "zorder_layout": q.zorder_layout,
        "event_type_trend": q.event_type_trend,
        "kcore_hosts": q.kcore_hosts,
        "rrf_fusion": q.rrf_fusion,
        "value_winsorized": q.value_winsorized,
        "chi2_lang_source": q.chi2_lang_source,
        "edit_distance_pairs": q.edit_distance_pairs,
        "degree_assortativity": q.degree_assortativity,
        "welch_ttest_chars": q.welch_ttest_chars,
        "cusum_changepoint": q.cusum_changepoint,
        "host_neighbor_jaccard": q.host_neighbor_jaccard,
        "hits_hosts": q.hits_hosts,
        "event_type_cosine": q.event_type_cosine,
        "bfs_depth_hosts": q.bfs_depth_hosts,
        "gini_hosts": q.gini_hosts,
        "part_cooccurrence": q.part_cooccurrence,
        "pricing_summary": q.pricing_summary,
        "shipping_priority": q.shipping_priority,
        "null_profile": q.null_profile,
        "zipf_slope": q.zipf_slope,
        "pca_power_component": q.pca_power_component,
        "pareto_front_docs": q.pareto_front_docs,
        "kl_unigram_drift": q.kl_unigram_drift,
        "theil_sen_trend": q.theil_sen_trend,
        "compression_ratio": q.compression_ratio,
        "golden_records": q.golden_records,
        "rolling_median_anomaly": q.rolling_median_anomaly,
        "personalized_pagerank": q.personalized_pagerank,
        "event_throttle_dedup": q.event_throttle_dedup,
        "chars_percent_rank": q.chars_percent_rank,
        "supplier_hhi": q.supplier_hhi,
        "order_fulfillment_lag": q.order_fulfillment_lag,
        "region_revenue": q.region_revenue,
        "dup_cluster_sizes": q.dup_cluster_sizes,
        "lang_vocab_cosine": q.lang_vocab_cosine,
        "customers_no_urgent": q.customers_no_urgent,
        "nation_trade_volume": q.nation_trade_volume,
        "returned_items_report": q.returned_items_report,
        "forecast_revenue": q.forecast_revenue,
        "order_priority_exists": q.order_priority_exists,
        "returnflag_priority_counts": q.returnflag_priority_counts,
        "customer_order_distribution": q.customer_order_distribution,
        "promo_revenue": q.promo_revenue,
        "small_qty_revenue": q.small_qty_revenue,
        "large_volume_customers": q.large_volume_customers,
        "disjunctive_revenue": q.disjunctive_revenue,
        "mannwhitney_chars": q.mannwhitney_chars,
        "benford_totalprice": q.benford_totalprice,
        "daily_autocorr": q.daily_autocorr,
        "charclass_profile": q.charclass_profile,
        "readability_counts": q.readability_counts,
        "event_heatmap": q.event_heatmap,
        "top_supplier": q.top_supplier,
        "embedding_quantize": q.embedding_quantize,
        "longest_doc_per_lang": q.longest_doc_per_lang,
        "type_cooccurrence_1h": q.type_cooccurrence_1h,
        "market_share": q.market_share,
        "cluster_representatives": q.cluster_representatives,
        "top_words_concat": q.top_words_concat,
        "url_depth_profile": q.url_depth_profile,
        "boilerplate_rate_by_source": q.boilerplate_rate_by_source,
        "ewma_daily": q.ewma_daily,
        "dedup_method_overlap": q.dedup_method_overlap,
        "docs_above_lang_median": q.docs_above_lang_median,
        "order_backlog_daily": q.order_backlog_daily,
        "tokens_per_char_ols": q.tokens_per_char_ols,
        "quality_funnel": q.quality_funnel,
        "top_event_trigrams": q.top_event_trigrams,
        "monthly_revenue": q.monthly_revenue,
        "customer_lifetime_span": q.customer_lifetime_span,
        "host_reciprocity": q.host_reciprocity,
        "url_prefix_blocklist": q.url_prefix_blocklist,
        "dedup_threshold_curve": q.dedup_threshold_curve,
        "doc_id_islands": q.doc_id_islands,
        "value_iqr_outliers": q.value_iqr_outliers,
        "apply_upserts": q.apply_upserts,
        "host_n50": q.host_n50,
        "token_length_histogram": q.token_length_histogram,
        "session_entry_exit": q.session_entry_exit,
        "value_volatility": q.value_volatility,
        "returning_share_daily": q.returning_share_daily,
        "corpus_report": q.corpus_report,
        "source_lang_entropy": q.source_lang_entropy,
        "max_silence_days": q.max_silence_days,
        "knn_label_agreement": q.knn_label_agreement,
        "dow_anova": q.dow_anova,
        "customer_trend_census": q.customer_trend_census,
        "revenue_top1pct_share": q.revenue_top1pct_share,
        "signup_to_purchase_latency": q.signup_to_purchase_latency,
        "order_size_histogram": q.order_size_histogram,
        "discount_by_qty_band": q.discount_by_qty_band,
        "km_user_survival": q.km_user_survival,
        "topk_with_ties": q.topk_with_ties,
        "weighted_median_price": q.weighted_median_price,
        "phrase_search": q.phrase_search,
        "term_proximity": q.term_proximity,
        "window_collocations": q.window_collocations,
        "gap_fill_daily": q.gap_fill_daily,
        "activity_coverage": q.activity_coverage,
        "peak_concurrency": q.peak_concurrency,
    }


# Okapi BM25 CTE chain (probe queries -> tokenize -> tf/df/idf ->
# integer-parity contributions -> per-(query, doc) scores) — shared by
# the bm25_top_docs oracle and the rrf_fusion oracle's system A.
_BM25_CTES = """
            qt(query_id, w) AS (VALUES
                (0, 'hash'), (0, 'join'),
                (1, 'window'), (1, 'sort'),
                (2, 'slow'), (2, 'scan'), (2, 'filter')),
            words AS (
                SELECT doc_id,
                       unnest(list_filter(
                           string_split(coalesce(text, ''), ' '),
                           w -> w <> '')) AS w
                FROM documents),
            dl AS (SELECT doc_id, count(*) AS dl FROM words GROUP BY doc_id),
            stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                             (SELECT count(*) FROM words) AS s),
            tf AS (SELECT q.query_id, q.w, wd.doc_id, count(*) AS tf
                   FROM words wd JOIN qt q ON q.w = wd.w
                   GROUP BY q.query_id, q.w, wd.doc_id),
            dfq AS (SELECT w, count(DISTINCT doc_id) AS df
                    FROM words WHERE w IN (SELECT w FROM qt) GROUP BY w),
            idf AS (
                SELECT w, CAST(CASE WHEN x >= 0 THEN floor(x + 0.5)
                                    ELSE -floor(-x + 0.5) END AS BIGINT)
                           AS idf_e6
                FROM (SELECT w,
                             1e6 * ln((n - df + 0.5) / (df + 0.5) + 1) AS x
                      FROM dfq, stats)),
            contrib AS (
                SELECT t.query_id, t.doc_id,
                       CAST(CASE WHEN c >= 0 THEN floor(c + 0.5)
                                 ELSE -floor(-c + 0.5) END AS BIGINT) AS c
                FROM (SELECT t.query_id, t.doc_id,
                             (CAST(i.idf_e6 AS DOUBLE) * t.tf * 22 * s)
                             / (10 * CAST(s AS DOUBLE) * t.tf
                                + 3 * CAST(s AS DOUBLE)
                                + 9 * CAST(d.dl AS DOUBLE) * n) AS c
                      FROM tf t
                      JOIN idf i ON i.w = t.w
                      JOIN dl d ON d.doc_id = t.doc_id, stats) t),
            scores AS (SELECT query_id, doc_id,
                              CAST(sum(c) AS BIGINT) AS score_e6
                       FROM contrib GROUP BY query_id, doc_id)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "presence_check": """
            SELECT lang,
                   count(*) AS n_rows,
                   count(*) FILTER (WHERE text IS NULL OR text = '') AS n_text_missing,
                   count(*) FILTER (WHERE source IS NULL OR source = '') AS n_source_missing
            FROM documents GROUP BY lang
        """,
        "format_check": """
            SELECT doc_id, lang, source
            FROM documents
            WHERE NOT regexp_matches(coalesce(source, ''), '^src1[0-9]$')
        """,
        "referential_lang_check": """
            SELECT lang,
                   count(*) AS n_rows,
                   count(*) FILTER (WHERE coalesce(lang,'') NOT IN ('en','de','fr')) AS n_violations
            FROM documents GROUP BY lang
        """,
        "referential_events_check": """
            SELECT e.event_type,
                   count(*) AS n_events,
                   count(*) FILTER (WHERE c.c_custkey IS NULL) AS n_orphans
            FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
            GROUP BY e.event_type
        """,
        "stats_profile": """
            SELECT lang,
                   count(*) AS n_docs,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "distinct_sources": """
            SELECT lang, CAST(count(DISTINCT source) AS BIGINT) AS n_sources
            FROM documents GROUP BY lang
        """,
        "uniqueness_nchars": """
            SELECT n_chars, count(*) AS n_dups
            FROM documents GROUP BY n_chars HAVING count(*) > 1
        """,
        "exact_dedup": """
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
            FROM documents GROUP BY substr(text, 1, 16)
        """,
        "keyword_check": """
            SELECT lang,
                   count(*) AS n_docs,
                   count(*) FILTER (WHERE text LIKE '%query%') AS n_query,
                   count(*) FILTER (WHERE text LIKE '%join%') AS n_join,
                   count(*) FILTER (WHERE text LIKE '%query%' AND text LIKE '%join%') AS n_both
            FROM documents GROUP BY lang
        """,
        "topk_longest": """
            SELECT lang, doc_id, n_chars, rk FROM (
                SELECT lang, doc_id, n_chars,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n_chars DESC, doc_id ASC) AS rk
                FROM documents
            ) WHERE rk <= 5
        """,
        "deterministic_sample": """
            SELECT doc_id, lang FROM documents WHERE doc_id % 20 = 0
        """,
        "nchars_quantiles": """
            SELECT lang,
                   CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS q25,
                   CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS q50,
                   CAST(quantile_disc(n_chars, 0.90) AS BIGINT) AS q90
            FROM documents GROUP BY lang
        """,
        "nchars_mode": """
            SELECT lang, CAST(n_chars AS BIGINT) AS mode_nchars,
                   n AS mode_count
            FROM (
                SELECT lang, n_chars, count(*) AS n,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY count(*) DESC, n_chars ASC)
                           AS rk
                FROM documents GROUP BY lang, n_chars
            ) WHERE rk = 1
        """,
        "normalized_prefixes": """
            SELECT lang,
                   CAST(count(DISTINCT substr(lower(trim(
                       regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')
                   )), 1, 8)) AS BIGINT) AS n_prefixes
            FROM documents GROUP BY lang
        """,
        "stratified_sample": """
            SELECT lang, doc_id, rk FROM (
                SELECT lang, doc_id,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY doc_id ASC) AS rk
                FROM documents
            ) WHERE rk <= 4
        """,
        "token_count": """
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(CASE WHEN text IS NULL THEN 0
                                 WHEN length(text) = 0 THEN 0
                                 ELSE length(text) - length(replace(text, ' ', '')) + 1
                            END) AS BIGINT) AS total_tokens
            FROM documents GROUP BY lang
        """,
        "verdict_rollup": """
            SELECT lang, n_rows, n_violations,
                   1.0 - CAST(n_violations AS DOUBLE) / n_rows AS pass_rate,
                   CASE WHEN 1.0 - CAST(n_violations AS DOUBLE) / n_rows >= 0.9 THEN 'good'
                        WHEN 1.0 - CAST(n_violations AS DOUBLE) / n_rows >= 0.7 THEN 'ok'
                        ELSE 'needs_improvement' END AS status,
                   CASE WHEN n_violations = 0 THEN 'PASS' ELSE 'FAIL' END AS verdict
            FROM (
                SELECT lang, count(*) AS n_rows,
                       count(*) FILTER (WHERE n_chars < 200) AS n_violations
                FROM documents GROUP BY lang
            )
        """,
        # event-time ops exclude NULL-ts rows (engine policy, matching
        # filter below); NULL value contributes 0 (sum-skip == +0 for
        # non-empty groups; the CASE makes all-NULL groups 0 like the
        # engine rather than SQL-NULL)
        "windowed_events": """
            SELECT event_type,
                   date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events,
                   CAST(sum(CASE WHEN value IS NULL THEN 0
                            ELSE CAST(round(value * 100) AS BIGINT)
                            END) AS BIGINT) AS sum_value_cents
            FROM events WHERE ts IS NOT NULL
            GROUP BY event_type, date_trunc('hour', ts)
        """,
        "asof_last_order": """
            SELECT e.event_id, max(o.o_orderdate) AS last_order_date
            FROM events e
            LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            GROUP BY e.event_id
        """,
        "top_orders": """
            SELECT o_orderkey, o_totalprice, rk FROM (
                SELECT o_orderkey, o_totalprice,
                       row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
                FROM orders
            ) WHERE rk <= 20
        """,
        "json_props_stats": """
            SELECT event_type,
                   count(*) AS n_events,
                   CAST(sum(coalesce(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1)
                                          AS BIGINT), 0)) AS BIGINT) AS sum_k
            FROM events GROUP BY event_type
        """,
        "exact_dedup_full": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 7 = 0
            )
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
            FROM corpus GROUP BY text
        """,
        # cross-corpus anti-join (NULL text == NULL text, matching the
        # engine's hash-key decision rule)
        "incremental_dedup": """
            SELECT n.doc_id, n.lang
            FROM documents n
            WHERE n.doc_id % 3 <> 0
              AND NOT EXISTS (
                  SELECT 1 FROM documents e
                  WHERE e.doc_id % 3 = 0
                    AND e.text IS NOT DISTINCT FROM n.text)
            ORDER BY n.doc_id
        """,
        # bloom-accelerated variant: same anti-join semantics, so the
        # oracle is the same SQL (the Bloom filter is an exactness-
        # preserving prefilter — positives are verified exactly)
        "incremental_bloom_dedup": """
            SELECT n.doc_id, n.lang
            FROM documents n
            WHERE n.doc_id % 3 <> 0
              AND NOT EXISTS (
                  SELECT 1 FROM documents e
                  WHERE e.doc_id % 3 = 0
                    AND e.text IS NOT DISTINCT FROM n.text)
            ORDER BY n.doc_id
        """,
        # both sides normalize with RE2 ('g' = replace all, like Arrow's
        # replace_substring_regex default)
        "normalized_dedup": """
            WITH norm AS (
                SELECT doc_id, lang,
                       trim(regexp_replace(lower(text),
                                           '[^a-z0-9]+', ' ', 'g')) AS nt
                FROM documents)
            SELECT doc_id, lang FROM norm
            QUALIFY row_number() OVER (PARTITION BY nt ORDER BY doc_id) = 1
            ORDER BY doc_id
        """,
        # derived-URL corpus; canonicalization chain identical to
        # functions/urls.py (see _URL_CANON_CTE)
        "canonical_url_dedup": _URL_CANON_CTE + """
            SELECT canonical_url, CAST(min(doc_id) AS BIGINT) AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_dups
            FROM canon GROUP BY canonical_url
            ORDER BY canonical_url
        """,
        "url_host_rollup": _URL_CANON_CTE + """
            SELECT NULLIF(lower(regexp_extract(canonical_url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)),
                   '') AS host,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT canonical_url) AS BIGINT) AS n_pages
            FROM canon GROUP BY 1 ORDER BY 1
        """,
        "knn_embeddings": """
            WITH q AS (
                SELECT vec_id AS query_id,
                       CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id < 10
            )
            SELECT query_id, neighbor_id, rk FROM (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_cosine_similarity(
                               q.qe, CAST(e.embedding AS DOUBLE[])) DESC,
                                    e.vec_id ASC
                       ) AS rk
                FROM q CROSS JOIN embeddings e
            ) WHERE rk <= 10
        """,
        # IVF in its exhaustive limit (n_probe == n_lists) must equal the
        # brute-force top-10 — identical oracle to knn_embeddings
        "ivf_knn_exhaustive": """
            WITH q AS (
                SELECT vec_id AS query_id,
                       CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id < 10
            )
            SELECT query_id, neighbor_id, rk FROM (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_cosine_similarity(
                               q.qe, CAST(e.embedding AS DOUBLE[])) DESC,
                                    e.vec_id ASC
                       ) AS rk
                FROM q CROSS JOIN embeddings e
            ) WHERE rk <= 10
        """,
        "bpe_token_count": """
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(len(regexp_extract_all(
                       text, '[A-Za-z]{1,4}|\\d|[^\\sA-Za-z\\d]'))) AS BIGINT)
                       AS bpe_tokens
            FROM documents GROUP BY lang
        """,
        "quality_check": """
            SELECT lang,
                   count(*) AS n_docs,
                   count(*) FILTER (WHERE
                       n_words < 5
                       OR (n_chars - CASE WHEN n_words > 1 THEN n_words - 1 ELSE 0 END)
                          / CAST(CASE WHEN n_words > 1 THEN n_words ELSE 1 END AS DOUBLE) > 12.0
                       OR n_alpha / CAST(CASE WHEN n_chars > 1 THEN n_chars ELSE 1 END AS DOUBLE) < 0.5
                   ) AS n_low_quality
            FROM (
                SELECT lang,
                       CAST(length(text) AS DOUBLE) AS n_chars,
                       CAST(CASE WHEN length(text) > 0
                                 THEN length(text) - length(replace(text, ' ', '')) + 1
                                 ELSE 0 END AS DOUBLE) AS n_words,
                       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha
                FROM documents
            ) GROUP BY lang
        """,
        # FLOOR division, not DuckDB's truncating // : a pre-1970
        # timestamp has negative epoch-us, where // rounds toward zero
        # but the engine's numpy floor (and date_trunc) round toward -inf
        "sliding_events": """
            WITH e AS (SELECT event_type, epoch_us(ts) AS us
                       FROM events WHERE ts IS NOT NULL),
            f AS (SELECT event_type,
                         ((us // 1800000000)
                          - CASE WHEN us < 0 AND us % 1800000000 <> 0
                                 THEN 1 ELSE 0 END) * 1800000000 AS base
                  FROM e)
            SELECT event_type,
                   base - k * 1800000000 AS window_start_us,
                   count(*) AS n_events
            FROM f CROSS JOIN (VALUES (0), (1)) AS t(k)
            GROUP BY 1, 2
        """,
        "session_windows": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            marked AS (
                SELECT user_id, us, event_id,
                       CASE WHEN lag(us) OVER w IS NULL
                                 OR us - lag(us) OVER w > 1800000000
                            THEN 1 ELSE 0 END AS new_session
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
            ),
            sess AS (
                SELECT user_id, us,
                       sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                              ROWS UNBOUNDED PRECEDING) AS sid
                FROM marked
            )
            SELECT user_id,
                   min(us) AS session_start_us,
                   max(us) AS session_end_us,
                   count(*) AS n_events
            FROM sess GROUP BY user_id, sid
        """,
        # NULL price/discount contributes 0 (the CASE makes an all-NULL
        # group read 0 like the engine rather than SQL-NULL; sum-skip
        # == +0 otherwise)
        "hash_join_revenue": """
            SELECT o.o_orderstatus,
                   count(*) AS n_items,
                   CAST(sum(CASE WHEN l.l_extendedprice IS NULL
                                      OR l.l_discount IS NULL THEN 0
                            ELSE CAST(round(l.l_extendedprice
                                            * (1 - l.l_discount) * 10000)
                                      AS BIGINT) END) AS BIGINT)
                       AS revenue_e4
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderstatus
        """,
        "enrich_events_nation": """
            SELECT n.n_name, e.event_type, count(*) AS n_events
            FROM events e
            JOIN customer c ON e.user_id = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name, e.event_type
        """,
        "asof_bucketed": """
            SELECT e.event_id, max(o.o_orderdate) AS last_order_date
            FROM events e
            LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            GROUP BY e.event_id
        """,
        "interval_event_windows": """
            WITH w AS (
                SELECT o_orderkey AS window_id,
                       TIMESTAMP '2024-01-01'
                           + (o_orderkey % 720) * INTERVAL 1 HOUR AS ws
                FROM orders
            )
            SELECT w.window_id, count(*) AS n_events
            FROM w JOIN events e
              ON e.ts >= w.ws AND e.ts < w.ws + INTERVAL 90 MINUTE
            GROUP BY w.window_id
        """,
        "distinct_users_events": """
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
            FROM events GROUP BY event_type
        """,
        # NULL policy: rows with NULL ts or NULL user_id are excluded —
        # an all-NULL-user day yields NO row (matches the engine, which
        # filters both before the salted distinct exchange)
        "window_distinct_users": """
            SELECT date_trunc('day', ts) AS window_start,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        # growth curve: first-seen day per user, counted and cumulated;
        # NULL users/timestamps excluded (engine policies)
        "user_growth": """
            WITH f AS (
                SELECT user_id, min(date_trunc('day', ts)) AS day
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                GROUP BY user_id),
            c AS (SELECT day, count(*) AS n_new FROM f GROUP BY day)
            SELECT day, CAST(n_new AS BIGINT) AS n_new,
                   CAST(sum(n_new) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
            FROM c ORDER BY day
        """,
        # cohort retention: distinct (user, day) activity joined to each
        # user's first-seen day; NULL users/timestamps excluded (the
        # user_growth policy)
        "retention_cohorts": """
            WITH ud AS (
                SELECT DISTINCT user_id, date_trunc('day', ts) AS day
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            fd AS (SELECT user_id, min(day) AS cohort_day
                   FROM ud GROUP BY user_id)
            SELECT f.cohort_day,
                   CAST(date_diff('day', f.cohort_day, u.day) AS BIGINT)
                       AS offset_days,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM ud u JOIN fd f USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "embedding_norm_stats": """
            SELECT CAST(label AS BIGINT) AS label,
                   count(*) AS n_vecs,
                   CAST(sum(CAST(round(1000000 * sqrt(list_inner_product(
                       CAST(embedding AS DOUBLE[]),
                       CAST(embedding AS DOUBLE[])))) AS BIGINT)) AS BIGINT)
                       AS sum_norm_e6
            FROM embeddings GROUP BY label
        """,
        "cosine_threshold_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.45
        """,
        # exact char-5-shingle Jaccard of the seeded (doc, perturbed-copy)
        # pairs; shingles are distinct 5-char windows (short strings pad —
        # the PAD: namespace can never equal a real 5-char window)
        "minhash_verify_jaccard": _MINHASH_VERIFY_SQL,
        # LSH recall containment: the seeded pairs at Jaccard >= 0.9 (per
        # the same exact-Jaccard SQL) must ALL be found by the MinHash-LSH
        # pipeline — the engine query intersects them with the LSH output,
        # so a recall failure surfaces as a missing row
        "minhash_seeded_containment":
            "SELECT id_a, id_b, jaccard_e6 FROM ("
            + _MINHASH_VERIFY_SQL +
            ") WHERE jaccard_e6 >= 900000",
        # exact word-3-gram Jaccard on the same seeded pairs (python
        # str.split() semantics: whitespace runs, strip; <3 words -> the
        # single gram join(words))
        "ngram_verify_jaccard": _NGRAM_VERIFY_SQL,
        # word-3-gram LSH recall containment (same gate as the minhash
        # variant): seeded pairs at word-trigram Jaccard >= 0.9 must all
        # be found by the n-gram LSH pipeline
        "ngram_seeded_containment":
            "SELECT id_a, id_b, jaccard_e6 FROM ("
            + _NGRAM_VERIFY_SQL +
            ") WHERE jaccard_e6 >= 900000",
        # the FULL MinHash-LSH verified pair set, recomputed by SQL from
        # the engine's exported band-key table + per-doc shingle sets:
        # the self-join reproduces candidate generation, the intersection
        # counts reproduce exact-Jaccard verification — checking the
        # distributed bucket/pair-dedup/payload-join/verify machinery
        "minhash_dedup": _lsh_pairs_sql(q.MINHASH_ORACLE_DIR),
        # cross-corpus near-dup dedup: LSH pair set from the engine's
        # band/shingle exports -> cross-side filter -> anti-join the
        # new side (copies live at +10M, the side predicate is pure id
        # arithmetic on both sides)
        "incremental_near_dedup": (
            "WITH " + _lsh_pair_ctes(q.INC_NEAR_ORACLE_DIR) + """,
            flagged AS (
                SELECT DISTINCT CASE WHEN id_a >= 10000000 THEN id_a
                                     ELSE id_b END AS nid
                FROM verified
                WHERE (id_a >= 10000000) <> (id_b >= 10000000)),
            new_side AS (
                SELECT doc_id + 10000000 AS doc_id
                FROM documents WHERE doc_id % 10 = 0)
            SELECT n.doc_id FROM new_side n
            WHERE n.doc_id NOT IN (SELECT nid FROM flagged)
            ORDER BY n.doc_id"""),
        # same pair machinery + recursive-CTE connected components + the
        # min-id-representative keep rule: oracles LSH, verification,
        # distributed CC AND the two-regime loser filter end-to-end
        "minhash_dedup_filtered": _lsh_filtered_sql(q.MINHASH_FILT_ORACLE_DIR),
        # multimodal aggregation layer (VERDICT r3 #7): the engine writes
        # its decoded per-asset feature rows to parquet; the oracle
        # recomputes the per-(kind, decode_ok) rollup from them — the
        # grouping/count/sum machinery is hash-gated, the codecs stay
        # byte-exact pytest goldens (no SQL can decode BMP/WAV)
        "media_features": f"""
            SELECT kind, decode_ok,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(coalesce(sum(px), 0) AS BIGINT) AS sum_pixels
            FROM read_parquet('{q.MEDIA_ORACLE_DIR}/*.parquet')
            GROUP BY kind, decode_ok
            ORDER BY kind, decode_ok
        """,
        # language-ID confusion rollup (same export trick): the oracle
        # recomputes (lang, predicted) counts from the engine's exported
        # per-doc predictions; the trigram model itself is pytest-pinned
        "langid_confusion": f"""
            SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
            FROM read_parquet('{q.LANGID_ORACLE_DIR}/*.parquet')
            GROUP BY lang, predicted
            ORDER BY lang, predicted
        """,
        # word-3-gram variant of the full LSH pair-set oracle
        "ngram_jaccard_dedup": _lsh_pairs_sql(q.NGRAM_ORACLE_DIR),
        # the FULL SimHash near-dup pair set: banding with max_hamming+1
        # bands has exact recall (pigeonhole) and exact verification, so
        # the engine output must equal ALL pairs at hamming <= 3 over the
        # per-doc simhash table the query wrote to parquet; DuckDB's
        # BIGINT bit_count counts the 64-bit two's-complement pattern,
        # identical to the engine's uint64 popcount
        # NOTE: the engine caps LSH band buckets at max_bucket members
        # (logged warning, recall-for-boundedness trade at corpus scale);
        # a capped bucket would make the engine a strict SUBSET of this
        # exact-equality oracle.  The conformance corpora are sized far
        # under the cap, so no bucket is ever skipped here.
        "simhash_dedup": f"""
            WITH sims AS (
                SELECT * FROM read_parquet('{q.SIMHASH_ORACLE_DIR}/*.parquet')
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                       AS hamming
            FROM sims a JOIN sims b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        # exact cosine near-dup pairs over embeddings + the deterministic
        # noisy copies the query wrote to parquet (threshold 0.995 sits
        # far from both populations, so summation ulps cannot flip a row)
        "embedding_neardup": f"""
            WITH corpus AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings
                UNION ALL
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM read_parquet('{q.EMB_ORACLE_DIR}/*.parquet')
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.e, b.e) >= 0.995
        """,
        # the FULL pages-validate verdict table (minus the extraction
        # check, whose extractor no SQL can run, and the score column —
        # see _pages_validate).  The query wrote the deterministic pages
        # table to parquet at a fixed path first, so this SQL reproduces
        # n_rows / violation counts / pass rates / tri-level statuses /
        # verdicts / __overall__ rollups from the same bytes the engine
        # read.  Lang attribution: NULL lang -> '__missing__' (empty
        # string stays its own group); uniqueness counts one violation
        # per duplicated url, attributed to min(lang).
        "pages_validate": f"""
            WITH pages AS (
                SELECT * FROM read_parquet('{PAGES_ORACLE_DIR}/*.parquet')
            ),
            base AS (
                SELECT coalesce(lang, '__missing__') AS g,
                       url, warc_ts, html, text, lang
                FROM pages
            ),
            grp AS (
                SELECT g,
                       count(*) AS n_rows,
                       count(*) FILTER (WHERE url IS NULL OR url = '')
                           AS v_presence_url,
                       count(*) FILTER (WHERE warc_ts IS NULL)
                           AS v_presence_warc_ts,
                       count(*) FILTER (WHERE html IS NULL
                                        OR octet_length(html) = 0)
                           AS v_presence_html,
                       count(*) FILTER (WHERE text IS NULL OR text = '')
                           AS v_presence_text,
                       count(*) FILTER (WHERE lang IS NULL OR lang = '')
                           AS v_presence_lang,
                       count(*) FILTER (WHERE NOT (url IS NULL OR url = '')
                           AND NOT regexp_matches(url, '^https?://[^/\\s]+/.+$'))
                           AS v_url_format,
                       count(*) FILTER (WHERE NOT (lang IS NULL OR lang = '')
                           AND lang NOT IN ('en','de','fr','es','zh'))
                           AS v_referential_lang
                FROM base GROUP BY g
            ),
            uniq AS (
                SELECT lang_min AS g, count(*) AS v
                FROM (
                    SELECT url, min(coalesce(lang, '__missing__')) AS lang_min
                    FROM pages WHERE url IS NOT NULL AND url <> ''
                    GROUP BY url HAVING count(*) > 1
                ) GROUP BY lang_min
            ),
            checks AS (
                SELECT g, 'presence_url' AS cn, n_rows, v_presence_url AS v FROM grp
                UNION ALL SELECT g, 'presence_warc_ts', n_rows, v_presence_warc_ts FROM grp
                UNION ALL SELECT g, 'presence_html', n_rows, v_presence_html FROM grp
                UNION ALL SELECT g, 'presence_text', n_rows, v_presence_text FROM grp
                UNION ALL SELECT g, 'presence_lang', n_rows, v_presence_lang FROM grp
                UNION ALL SELECT g, 'url_format', n_rows, v_url_format FROM grp
                UNION ALL SELECT g, 'referential_lang', n_rows, v_referential_lang FROM grp
                UNION ALL SELECT grp.g, 'uniqueness_url', grp.n_rows,
                                 coalesce(uniq.v, 0)
                          FROM grp LEFT JOIN uniq ON uniq.g = grp.g
            ),
            scored AS (
                SELECT g AS lang, cn, n_rows, CAST(v AS BIGINT) AS n_violations,
                       1.0 - CAST(v AS DOUBLE) / n_rows AS pass_rate,
                       CASE WHEN 1.0 - CAST(v AS DOUBLE) / n_rows >= 0.9 THEN 'good'
                            WHEN 1.0 - CAST(v AS DOUBLE) / n_rows >= 0.7 THEN 'ok'
                            ELSE 'needs_improvement' END AS status,
                       CASE WHEN v = 0 THEN 'PASS' ELSE 'FAIL' END AS verdict
                FROM checks
            ),
            drift AS (
                SELECT g AS lang, d.cn, n_rows, CAST(0 AS BIGINT) AS n_violations,
                       CAST(NULL AS DOUBLE) AS pass_rate,
                       'unknown' AS status, 'UNKNOWN' AS verdict
                FROM grp CROSS JOIN (VALUES ('drift_text_len'),
                                            ('drift_html_len'),
                                            ('drift_null_rate')) AS d(cn)
            ),
            allrows AS (
                SELECT * FROM scored UNION ALL SELECT * FROM drift
            ),
            overall AS (
                SELECT lang, '__overall__' AS cn, max(n_rows) AS n_rows,
                       CAST(sum(n_violations) AS BIGINT) AS n_violations,
                       CAST(NULL AS DOUBLE) AS pass_rate, '-' AS status,
                       CASE WHEN bool_or(verdict = 'FAIL') THEN 'FAIL'
                            WHEN bool_or(verdict = 'UNKNOWN') THEN 'UNKNOWN'
                            ELSE 'PASS' END AS verdict
                FROM allrows GROUP BY lang
            )
            SELECT lang, cn AS "check", n_rows, n_violations,
                   pass_rate, status, verdict
            FROM allrows
            UNION ALL
            SELECT lang, cn, n_rows, n_violations, pass_rate, status, verdict
            FROM overall
        """,
        # exact top-50 vocabulary words, deterministic tie-break
        "word_frequencies": """
            SELECT word, n, rk FROM (
                SELECT word, count(*) AS n,
                       row_number() OVER (ORDER BY count(*) DESC, word ASC)
                           AS rk
                FROM (
                    SELECT unnest(string_split(coalesce(text, ''), ' '))
                        AS word
                    FROM documents
                ) WHERE word <> '' GROUP BY word
            ) WHERE rk <= 50
        """,
        # distributed selection (iterative histogram refinement): the
        # engine returns actual data values, so quantile_disc compares
        # bit-exactly; NULLs excluded by both sides
        "value_quantiles_exact": """
            SELECT quantile_disc(value, 0.5) AS q50,
                   quantile_disc(value, 0.9) AS q90
            FROM events
        """,
        # skew-aware join: half of all events collapse onto key 7; NULL
        # user_id -> NULL key matches nothing (inner join)
        "skew_join_events": """
            WITH lhs AS (
                SELECT event_id, event_type,
                       CASE WHEN event_id % 2 = 0 THEN 7
                            ELSE user_id % 199 END AS k
                FROM events),
            rhs AS (SELECT c_custkey % 199 AS k,
                           CAST(count(*) AS BIGINT) AS n_cust
                    FROM customer GROUP BY 1)
            SELECT l.event_type, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(r.n_cust) AS BIGINT) AS sum_ncust
            FROM lhs l JOIN rhs r USING (k)
            GROUP BY 1 ORDER BY 1
        """,
        # strictly-later conditional first-touch chain; NULL users and
        # timestamps excluded (event-time policy)
        "funnel_conversion": """
            WITH e AS (
                SELECT user_id, event_type, ts FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            t1 AS (SELECT user_id, min(ts) AS ts1 FROM e
                   WHERE event_type = 'view' GROUP BY user_id),
            t2 AS (SELECT e.user_id, min(e.ts) AS ts2
                   FROM e JOIN t1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.ts > t1.ts1
                   GROUP BY e.user_id),
            t3 AS (SELECT e.user_id, min(e.ts) AS ts3
                   FROM e JOIN t2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
                   GROUP BY e.user_id)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM t1) AS n_step1,
                   (SELECT CAST(count(*) AS BIGINT) FROM t2) AS n_step2,
                   (SELECT CAST(count(*) AS BIGINT) FROM t3) AS n_step3
        """,
        # grouped distributed selection: all (type, q) states descend
        # simultaneously; NULL event_type is a group, NULL values are
        # excluded, all-null groups yield NULL quantiles
        "value_quantiles_by_type": """
            SELECT event_type,
                   quantile_disc(value, 0.5) AS q50,
                   quantile_disc(value, 0.9) AS q90
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # Misra-Gries "Frequent" prefilter + exact recount: the engine
        # certifies exactness at runtime (m-th count > total/(k+1)), so
        # the oracle is simply the exact top-20
        "heavy_hitter_words": """
            SELECT word, n, rk FROM (
                SELECT word, count(*) AS n,
                       row_number() OVER (ORDER BY count(*) DESC, word ASC)
                           AS rk
                FROM (
                    SELECT unnest(string_split(coalesce(text, ''), ' '))
                        AS word
                    FROM documents
                ) WHERE word <> '' GROUP BY word
            ) WHERE rk <= 20
        """,
        # corpus-wide paragraph dedup (CCNet boilerplate removal): split
        # each text into two halves joined by \n, union with exact copies
        # of every 7th doc, drop every paragraph occurring more than once
        # corpus-wide, reassemble in order.  The engine decides on 128-bit
        # paragraph hashes; the SQL on exact strings — they agree unless a
        # hash collision occurs (~3e-15)
        "paragraph_dedup": """
            WITH corpus AS (
                SELECT doc_id,
                       substr(t, 1, length(t) // 2) || chr(10)
                           || substr(t, length(t) // 2 + 1) AS text
                FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents)
                UNION ALL
                SELECT doc_id + 10000000,
                       substr(t, 1, length(t) // 2) || chr(10)
                           || substr(t, length(t) // 2 + 1)
                FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents)
                WHERE doc_id % 7 = 0
            ),
            parts AS (
                SELECT doc_id, p.i AS i, parts[p.i] AS para FROM (
                    SELECT doc_id, string_split(text, chr(10)) AS parts
                    FROM corpus
                ) CROSS JOIN LATERAL (
                    SELECT unnest(generate_series(1, len(parts))) AS i) p
            ),
            dups AS (
                SELECT para FROM parts GROUP BY para HAVING count(*) > 1
            ),
            kept AS (
                SELECT pt.doc_id, pt.i, pt.para
                FROM parts pt LEFT JOIN dups d ON d.para = pt.para
                WHERE d.para IS NULL
            )
            SELECT c.doc_id,
                   coalesce(string_agg(k.para, chr(10) ORDER BY k.i), '')
                       AS clean_text
            FROM corpus c LEFT JOIN kept k ON k.doc_id = c.doc_id
            GROUP BY c.doc_id
        """,
        # distribution-drift verdicts recomputed end-to-end in SQL from
        # the SAME parquet bytes the engine profiled (the query wrote the
        # clean baseline and the zh-drifted live corpus first): fixed-bin
        # histograms (searchsorted-right bin index = least(len//w + 1, 65)
        # for the 65-edge grids), KS = max |cdf_live - cdf_ref| at the
        # edges (integer cumulatives, one double division each — bit-
        # identical to the engine), eps-clipped PSI with natural log, and
        # per-column null-or-empty-rate deltas, all thresholded exactly
        # like config.py (ks 0.05/0.15, psi 0.10/0.25, null 0.02/0.10)
        "drift_check": f"""
            WITH live AS (
                SELECT * FROM read_parquet('{q.DRIFT_ORACLE_LIVE}/*.parquet')
            ),
            refp AS (
                SELECT * FROM read_parquet('{q.DRIFT_ORACLE_REF}/*.parquet')
            ),
            nrows AS (SELECT lang, count(*) AS n_rows FROM live GROUP BY lang),
            binned AS (
                SELECT 0 AS src, lang, 'drift_text_len' AS chk,
                       least(length(text) // 32 + 1, 65) AS b, count(*) AS c
                FROM live WHERE text IS NOT NULL GROUP BY lang, b
                UNION ALL
                SELECT 0, lang, 'drift_html_len',
                       least(octet_length(html) // 128 + 1, 65), count(*)
                FROM live WHERE html IS NOT NULL GROUP BY lang, 4
                UNION ALL
                SELECT 1, lang, 'drift_text_len',
                       least(length(text) // 32 + 1, 65), count(*)
                FROM refp WHERE text IS NOT NULL GROUP BY lang, 4
                UNION ALL
                SELECT 1, lang, 'drift_html_len',
                       least(octet_length(html) // 128 + 1, 65), count(*)
                FROM refp WHERE html IS NOT NULL GROUP BY lang, 4
            ),
            tot AS (
                SELECT src, lang, chk, sum(c) AS t
                FROM binned GROUP BY src, lang, chk
            ),
            grid AS (
                SELECT lc.lang, lc.chk, gs.i
                FROM (SELECT DISTINCT lang, chk FROM binned) lc
                CROSS JOIN (SELECT unnest(generate_series(0, 65)) AS i) gs
            ),
            dense AS (
                SELECT g.lang, g.chk, g.i,
                       coalesce(l.c, 0) AS cl, coalesce(r.c, 0) AS cr
                FROM grid g
                LEFT JOIN binned l ON l.src = 0 AND l.lang = g.lang
                                  AND l.chk = g.chk AND l.b = g.i
                LEFT JOIN binned r ON r.src = 1 AND r.lang = g.lang
                                  AND r.chk = g.chk AND r.b = g.i
            ),
            wt AS (
                SELECT d.*, tl.t AS tl, tr.t AS tr
                FROM dense d
                JOIN tot tl ON tl.src = 0 AND tl.lang = d.lang AND tl.chk = d.chk
                JOIN tot tr ON tr.src = 1 AND tr.lang = d.lang AND tr.chk = d.chk
            ),
            cum AS (
                SELECT lang, chk, i, tl, tr,
                       sum(cl) OVER (PARTITION BY lang, chk ORDER BY i
                                     ROWS UNBOUNDED PRECEDING) AS ccl,
                       sum(cr) OVER (PARTITION BY lang, chk ORDER BY i
                                     ROWS UNBOUNDED PRECEDING) AS ccr
                FROM wt
            ),
            ks AS (
                SELECT lang, chk,
                       max(abs(CAST(ccl AS DOUBLE) / tl
                               - CAST(ccr AS DOUBLE) / tr)) AS ks
                FROM cum WHERE i <= 64 GROUP BY lang, chk
            ),
            psi AS (
                SELECT lang, chk,
                       sum((greatest(CAST(cl AS DOUBLE) / tl, 0.000001)
                            - greatest(CAST(cr AS DOUBLE) / tr, 0.000001))
                           * ln(greatest(CAST(cl AS DOUBLE) / tl, 0.000001)
                                / greatest(CAST(cr AS DOUBLE) / tr, 0.000001)))
                           AS psi
                FROM wt GROUP BY lang, chk
            ),
            hist_rows AS (
                SELECT k.lang, k.chk AS cn, n.n_rows,
                       CASE WHEN k.ks >= 0.15 OR p.psi >= 0.25
                                THEN 'needs_improvement'
                            WHEN k.ks >= 0.05 OR p.psi >= 0.10 THEN 'ok'
                            ELSE 'good' END AS status,
                       CASE WHEN k.ks >= 0.15 OR p.psi >= 0.25 THEN 'FAIL'
                            ELSE 'PASS' END AS verdict
                FROM ks k
                JOIN psi p ON p.lang = k.lang AND p.chk = k.chk
                JOIN nrows n ON n.lang = k.lang
            ),
            lnull AS (
                SELECT lang, count(*) AS n,
                       count(*) FILTER (WHERE url IS NULL OR url = '') AS nu,
                       count(*) FILTER (WHERE warc_ts IS NULL) AS nw,
                       count(*) FILTER (WHERE html IS NULL
                                        OR octet_length(html) = 0) AS nh,
                       count(*) FILTER (WHERE text IS NULL OR text = '') AS nt,
                       count(*) FILTER (WHERE lang IS NULL OR lang = '') AS nl
                FROM live GROUP BY lang
            ),
            rnull AS (
                SELECT lang, count(*) AS n,
                       count(*) FILTER (WHERE url IS NULL OR url = '') AS nu,
                       count(*) FILTER (WHERE warc_ts IS NULL) AS nw,
                       count(*) FILTER (WHERE html IS NULL
                                        OR octet_length(html) = 0) AS nh,
                       count(*) FILTER (WHERE text IS NULL OR text = '') AS nt,
                       count(*) FILTER (WHERE lang IS NULL OR lang = '') AS nl
                FROM refp GROUP BY lang
            ),
            nd AS (
                SELECT l.lang, l.n AS n_rows,
                       greatest(
                           abs(CAST(l.nu AS DOUBLE)/l.n - CAST(r.nu AS DOUBLE)/r.n),
                           abs(CAST(l.nw AS DOUBLE)/l.n - CAST(r.nw AS DOUBLE)/r.n),
                           abs(CAST(l.nh AS DOUBLE)/l.n - CAST(r.nh AS DOUBLE)/r.n),
                           abs(CAST(l.nt AS DOUBLE)/l.n - CAST(r.nt AS DOUBLE)/r.n),
                           abs(CAST(l.nl AS DOUBLE)/l.n - CAST(r.nl AS DOUBLE)/r.n)
                       ) AS d
                FROM lnull l JOIN rnull r ON r.lang = l.lang
            ),
            null_rows AS (
                SELECT lang, 'drift_null_rate' AS cn, n_rows,
                       CASE WHEN d >= 0.10 THEN 'needs_improvement'
                            WHEN d >= 0.02 THEN 'ok' ELSE 'good' END AS status,
                       CASE WHEN d >= 0.10 THEN 'FAIL' ELSE 'PASS' END AS verdict
                FROM nd
            )
            SELECT lang, cn AS "check", n_rows, status, verdict FROM hist_rows
            UNION ALL
            SELECT lang, cn, n_rows, status, verdict FROM null_rows
        """,
        # PII redaction rollup: the seeded emails/phones/IPs are a pure
        # function of doc_id; counts and redacted-length deltas use the
        # SAME RE2 patterns the engine runs through pyarrow.compute
        "pii_redact": """
            WITH seeded AS (
                SELECT lang,
                       coalesce(text, '')
                       || CASE WHEN doc_id % 5 = 0
                               THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                    || '@example.com now' ELSE '' END
                       || CASE WHEN doc_id % 7 = 0
                               THEN ' call 555-123-4567' ELSE '' END
                       || CASE WHEN doc_id % 11 = 0
                               THEN ' from 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
                               ELSE '' END AS t
                FROM documents
            ),
            red AS (
                SELECT lang,
                       len(regexp_extract_all(t,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS ne,
                       len(regexp_extract_all(t,
                           '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS np,
                       len(regexp_extract_all(t,
                           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS ni,
                       length(t) - length(regexp_replace(regexp_replace(
                           regexp_replace(t,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                               '<EMAIL>', 'g'),
                           '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g'),
                           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                           '<IP>', 'g')) AS removed
                FROM seeded
            )
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(ne) AS BIGINT) AS n_email,
                   CAST(sum(np) AS BIGINT) AS n_phone,
                   CAST(sum(ni) AS BIGINT) AS n_ip,
                   CAST(sum(removed) AS BIGINT) AS chars_removed
            FROM red GROUP BY lang
        """,
        # benchmark decontamination: 13-word-gram intersection with the
        # first-13-word snippets of every 97th doc; the engine decides on
        # 128-bit gram-hash membership, the SQL on exact gram strings —
        # they agree unless a hash collision occurs (~3e-15)
        "decontaminate": """
            WITH words AS (
                SELECT doc_id, lang,
                       list_filter(string_split_regex(coalesce(text, ''),
                                                      '\\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            bench AS (
                SELECT DISTINCT array_to_string(ws[1:13], ' ') AS g
                FROM words WHERE doc_id % 97 = 0 AND len(ws) >= 13
            ),
            grams AS (
                SELECT doc_id, lang, array_to_string(ws[i:i+12], ' ') AS g
                FROM (
                    SELECT doc_id, lang, ws,
                           unnest(generate_series(
                               1, greatest(len(ws) - 12, 0))) AS i
                    FROM words WHERE len(ws) >= 13)
            )
            SELECT DISTINCT g.doc_id, g.lang
            FROM grams g JOIN bench b ON b.g = g.g
        """,
        # Gopher-style repetition rollup: integer thresholds (10*max >=
        # total, 2*distinct <= total) so no float boundary can flip a doc
        "repetition_check": """
            WITH words AS (
                SELECT doc_id, unnest(list_filter(
                    string_split_regex(coalesce(text, ''), '\\s+'),
                    x -> x <> '')) AS w
                FROM documents
            ),
            wc AS (
                SELECT doc_id, w, count(*) AS c
                FROM words GROUP BY doc_id, w
            ),
            per_doc AS (
                SELECT doc_id, max(c) AS mx, sum(c) AS tot,
                       count(*) AS nd
                FROM wc GROUP BY doc_id
            )
            SELECT d.lang, count(*) AS n_docs,
                   count(*) FILTER (WHERE p.tot IS NOT NULL
                                    AND 10 * p.mx >= p.tot)
                       AS n_top_repetitive,
                   count(*) FILTER (WHERE p.tot IS NOT NULL
                                    AND 2 * p.nd <= p.tot)
                       AS n_low_diversity
            FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
            GROUP BY d.lang
        """,
        # fixed-token sequence chunking: every doc split into consecutive
        # 32-token chunks (single-space tokenization, empties dropped);
        # one row per chunk with the exact chunk text
        "chunk_docs": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split(coalesce(text, ''), ' '),
                                   w -> w <> '') AS words
                FROM documents
            ),
            expanded AS (
                SELECT doc_id, words,
                       unnest(generate_series(
                           0, (len(words) + 31) // 32 - 1)) AS c
                FROM toks WHERE len(words) > 0
            )
            SELECT doc_id,
                   CAST(c AS BIGINT) AS chunk_idx,
                   CAST(least(32, len(words) - c * 32) AS BIGINT)
                       AS n_tokens,
                   array_to_string(
                       list_slice(words, c * 32 + 1, c * 32 + 32), ' ')
                       AS chunk_text
            FROM expanded
        """,
        # unigram-LM quality rollup: exact corpus word frequencies →
        # per-word-type integer micro-nat log-prob (rounded half away
        # from zero ONCE, so all downstream sums are exact int64) →
        # per-doc token log-prob sums → per-lang aggregate
        "unigram_logprob": """
            WITH toks AS (
                SELECT doc_id, lang,
                       list_filter(string_split(coalesce(text, ''), ' '),
                                   w -> w <> '') AS words
                FROM documents
            ),
            words AS (
                SELECT doc_id, unnest(words) AS w FROM toks
            ),
            counts AS (SELECT w, count(*) AS n FROM words GROUP BY w),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts),
            lp AS (
                SELECT w, CAST(CASE WHEN x >= 0 THEN floor(x + 0.5)
                                    ELSE -floor(-x + 0.5) END AS BIGINT)
                           AS lp_e6
                FROM (SELECT w, 1e6 * ln(n / t) AS x FROM counts, tot)
            ),
            per_doc AS (
                SELECT t.doc_id, t.lang,
                       coalesce(s.lp_sum, 0) AS logprob_e6,
                       coalesce(s.ntok, 0) AS n_tokens
                FROM toks t LEFT JOIN (
                    SELECT doc_id, CAST(sum(lp_e6) AS BIGINT) AS lp_sum,
                           count(*) AS ntok
                    FROM words JOIN lp USING (w) GROUP BY doc_id
                ) s USING (doc_id)
            )
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(logprob_e6) AS BIGINT) AS sum_logprob_e6,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens
            FROM per_doc GROUP BY lang
        """,
        # per-domain capping: keep at most 20 docs per (source, lang),
        # longest first, doc_id tiebreak — sorted-run grouped top-k
        "domain_cap": """
            SELECT source, lang, doc_id, n_chars FROM (
                SELECT source, lang, doc_id, n_chars,
                       row_number() OVER (PARTITION BY source, lang
                                          ORDER BY n_chars DESC,
                                                   doc_id ASC) AS rn
                FROM documents)
            WHERE rn <= 20
            ORDER BY source, lang, doc_id
        """,
        # sequence packing: global exclusive token prefix sum in doc_id
        # order -> first/last 512-token sequence per doc (token definition
        # shared with token_count: space separators + 1)
        "sequence_pack": """
            WITH t AS (
                SELECT doc_id,
                       CAST(CASE WHEN text IS NULL OR length(text) = 0
                                 THEN 0
                                 ELSE length(text)
                                      - length(replace(text, ' ', '')) + 1
                            END AS BIGINT) AS n_tokens
                FROM documents),
            o AS (
                SELECT doc_id, n_tokens,
                       CAST(COALESCE(SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT) AS off
                FROM t)
            SELECT doc_id, n_tokens,
                   CAST(off // 512 AS BIGINT) AS seq_first,
                   CAST(CASE WHEN n_tokens = 0 THEN off // 512
                             ELSE (off + n_tokens - 1) // 512
                        END AS BIGINT) AS seq_last
            FROM o ORDER BY doc_id
        """,
        # global quality stratification: ntile(10) by (n_chars, doc_id)
        # via the distributed prefix-sum rank, per-(lang, decile) rollup
        "quality_deciles": """
            WITH ranked AS (
                SELECT lang, n_chars,
                       ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
                FROM documents)
            SELECT lang, CAST(decile AS BIGINT) AS decile,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
            FROM ranked GROUP BY lang, decile
            ORDER BY lang, decile
        """,
        # deterministic global shuffle: 0-based rank under the bijective
        # Knuth multiplicative hash (doc_id * 2654435761) % 2^32
        "global_shuffle": """
            SELECT doc_id,
                   CAST(row_number() OVER (
                       ORDER BY (doc_id * 2654435761) % 4294967296)
                        - 1 AS BIGINT) AS pos
            FROM documents ORDER BY doc_id
        """,
        # end-to-end curation chain: quality filter -> exact dedup
        # (min-doc_id winner per text) -> per-domain cap (top 10 per
        # (source, lang), longest first) -> 512-token sequence packing in
        # doc_id order -> per-lang rollup
        "curate_corpus": """
            WITH filtered AS (
                SELECT doc_id, source, lang, n_chars, text FROM documents
                WHERE n_chars >= 200 AND text IS NOT NULL
                      AND length(text) > 0),
            deduped AS (
                SELECT doc_id, source, lang, n_chars, text FROM (
                    SELECT *, row_number() OVER (PARTITION BY text
                                                 ORDER BY doc_id) AS rn
                    FROM filtered)
                WHERE rn = 1),
            capped AS (
                SELECT doc_id, lang,
                       CAST(length(text)
                            - length(replace(text, ' ', '')) + 1
                            AS BIGINT) AS n_tokens
                FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY source, lang
                        ORDER BY n_chars DESC, doc_id) AS rn
                    FROM deduped)
                WHERE rn <= 10),
            packed AS (
                SELECT doc_id, lang, n_tokens,
                       CAST(COALESCE(SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT) AS off
                FROM capped),
            spans AS (
                SELECT lang, n_tokens, off // 512 AS seq_first,
                       CASE WHEN n_tokens = 0 THEN off // 512
                            ELSE (off + n_tokens - 1) // 512
                       END AS seq_last
                FROM packed)
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   CAST(sum(CASE WHEN seq_last > seq_first THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
                   CAST(sum(seq_last - seq_first + 1) AS BIGINT)
                       AS n_spanned_seqs
            FROM spans GROUP BY lang
        """,
        # duplicated-5-gram fraction per doc (RefinedWeb/Gopher signal):
        # a doc is flagged when >= 20% of its DISTINCT word 5-grams occur
        # in another document (integer rule 5*n_dup >= n_grams).  The
        # engine decides on 128-bit gram hashes; the SQL on exact strings
        # — they agree unless a hash collision occurs (~3e-15)
        "dup_ngram_flag": """
            WITH words AS (
                SELECT doc_id, lang,
                       list_filter(string_split_regex(coalesce(text, ''),
                                                      '\\s+'),
                                   x -> x <> '') AS ws
                FROM documents),
            grams AS (
                SELECT DISTINCT doc_id, lang,
                       array_to_string(ws[i:i+4], ' ') AS g
                FROM (SELECT doc_id, lang, ws,
                             unnest(generate_series(
                                 1, greatest(len(ws) - 4, 0))) AS i
                      FROM words WHERE len(ws) >= 5)),
            gc AS (SELECT g, count(*) AS nd FROM grams GROUP BY g),
            per_doc AS (
                SELECT gr.doc_id, any_value(gr.lang) AS lang,
                       count(*) AS n_grams,
                       count(*) FILTER (WHERE gc.nd > 1) AS n_dup
                FROM grams gr JOIN gc ON gc.g = gr.g
                GROUP BY gr.doc_id)
            SELECT lang, count(*) AS n_docs,
                   count(*) FILTER (WHERE 5 * n_dup >= n_grams)
                       AS n_flagged,
                   CAST(sum(n_dup) AS BIGINT) AS n_dup_grams
            FROM per_doc GROUP BY lang ORDER BY lang
        """,
        # balanced source-mixture sampling: every source downsampled to
        # the smallest source's size, keeping the k docs with the
        # smallest deterministic shuffle key (global_shuffle order)
        "mixture_sample": """
            WITH k AS (
                SELECT min(cnt) AS k FROM (
                    SELECT count(*) AS cnt FROM documents GROUP BY source)),
            ranked AS (
                SELECT source, lang, n_chars,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY (doc_id * 2654435761) % 4294967296,
                                    doc_id) AS rn
                FROM documents)
            SELECT source, lang, count(*) AS n_kept,
                   CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
            FROM ranked, k WHERE rn <= k.k
            GROUP BY source, lang ORDER BY source, lang
        """,
        # temperature-based mixture (alpha=0.5): integer quota arithmetic
        # (isqrt + floor division) so engine and oracle agree exactly
        "temperature_mixture": """
            WITH counts AS (
                SELECT lang, count(*) AS n FROM documents GROUP BY lang),
            tot AS (
                SELECT (sum(n) // 2) AS t,
                       sum(CAST(floor(sqrt(n)) AS BIGINT)) AS sum_w
                FROM counts),
            quota AS (
                SELECT lang,
                       least(n, (t * CAST(floor(sqrt(n)) AS BIGINT)) // sum_w)
                           AS ks
                FROM counts, tot),
            ranked AS (
                SELECT lang, source, n_chars,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY (doc_id * 2654435761) % 4294967296,
                                    doc_id) AS rn
                FROM documents)
            SELECT r.lang, r.source, count(*) AS n_kept,
                   CAST(sum(r.n_chars) AS BIGINT) AS sum_n_chars
            FROM ranked r JOIN quota qu
                 ON r.lang IS NOT DISTINCT FROM qu.lang
            WHERE r.rn <= qu.ks
            GROUP BY r.lang, r.source ORDER BY r.lang, r.source
        """,
        # TF-IDF: idf pre-rounded to integer micro-nats per word type
        # (same half-away rounding CASE as unigram_logprob), scores are
        # exact integer products
        "tfidf_top_terms": """
            WITH words AS (
                SELECT doc_id, lang,
                       unnest(list_filter(
                           string_split(coalesce(text, ''), ' '),
                           w -> w <> '')) AS w
                FROM documents),
            tf AS (SELECT lang, w, count(*) AS tf
                   FROM words GROUP BY lang, w),
            dfq AS (SELECT w, count(DISTINCT doc_id) AS df
                    FROM words GROUP BY w),
            nd AS (SELECT count(*) AS n FROM documents),
            idf AS (
                SELECT w, CAST(CASE WHEN x >= 0 THEN floor(x + 0.5)
                                    ELSE -floor(-x + 0.5) END AS BIGINT)
                           AS idf_e6
                FROM (SELECT w, 1e6 * ln(n / df) AS x FROM dfq, nd)),
            scored AS (
                SELECT t.lang, t.w AS word,
                       t.tf * i.idf_e6 AS score_e6,
                       row_number() OVER (
                           PARTITION BY t.lang
                           ORDER BY t.tf * i.idf_e6 DESC, t.w ASC) AS rk
                FROM tf t JOIN idf i ON t.w = i.w)
            SELECT lang, word, CAST(score_e6 AS BIGINT) AS score_e6,
                   CAST(rk AS BIGINT) AS rk
            FROM scored WHERE rk <= 10 ORDER BY lang, rk
        """,
        # Okapi BM25 (k1=1.2, b=0.75 as exact integer ratios; Lucene
        # idf) — contribution rescaled to integer inputs with ONE
        # float64 division per (term, doc) in the same literal operation
        # order as the engine, rounded half-away per TERM to micro-nats,
        # then summed exactly; ln() is libm on both sides
        "bm25_top_docs": "WITH " + _BM25_CTES + """
            SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_e6,
                   CAST(rk AS BIGINT) AS rk
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY score_e6 DESC, doc_id ASC) AS rk
                  FROM scores)
            WHERE rk <= 10 ORDER BY query_id, rk
        """,
        "rrf_fusion": "WITH " + _BM25_CTES + """
            , ranked_a AS (
                SELECT query_id, doc_id, rk FROM (
                    SELECT query_id, doc_id, row_number() OVER (
                        PARTITION BY query_id
                        ORDER BY score_e6 DESC, doc_id ASC) AS rk
                    FROM scores) WHERE rk <= 10),
            tfm AS (SELECT query_id, doc_id,
                           CAST(sum(tf) AS BIGINT) AS sum_tf
                    FROM tf GROUP BY query_id, doc_id),
            ranked_b AS (
                SELECT query_id, doc_id, rk FROM (
                    SELECT query_id, doc_id, row_number() OVER (
                        PARTITION BY query_id
                        ORDER BY sum_tf DESC, doc_id ASC) AS rk
                    FROM tfm) WHERE rk <= 10),
            allp AS (SELECT query_id, doc_id FROM ranked_a
                     UNION SELECT query_id, doc_id FROM ranked_b),
            f AS (
                SELECT p.query_id, p.doc_id,
                       coalesce(1.0 / (60 + a.rk), 0)
                       + coalesce(1.0 / (60 + b.rk), 0) AS rrf
                FROM allp p
                LEFT JOIN ranked_a a ON a.query_id = p.query_id
                                    AND a.doc_id = p.doc_id
                LEFT JOIN ranked_b b ON b.query_id = p.query_id
                                    AND b.doc_id = p.doc_id)
            SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
                   CAST(round(1000000 * rrf) AS BIGINT) AS rrf_e6,
                   CAST(rk AS BIGINT) AS rk
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY rrf DESC, doc_id ASC) AS rk
                  FROM f)
            WHERE rk <= 10 ORDER BY query_id, rk
        """,
        # per-label centroid sums: elements pre-rounded to e6 ints so the
        # sums are order-independent exact integers; embedding[i] is
        # 1-based in DuckDB, matching the engine's 1-based pos
        "label_centroids": """
            WITH flat AS (
                SELECT label,
                       unnest(embedding) AS v,
                       unnest(range(1, len(embedding) + 1)) AS pos
                FROM embeddings)
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(pos AS BIGINT) AS pos,
                   count(*) AS n_vecs,
                   CAST(sum(CAST(CASE WHEN 1e6 * v >= 0
                                 THEN floor(1e6 * v + 0.5)
                                 ELSE -floor(-1e6 * v + 0.5)
                                 END AS BIGINT)) AS BIGINT) AS sum_e6
            FROM flat GROUP BY label, pos ORDER BY label, pos
        """,
        # pruned IVF: exact cosine top-10 RESTRICTED to the engine's
        # exported probed lists (assignment is unique per vector, so the
        # join yields each candidate once); float64 ranking like the
        # brute-force oracle
        "ivf_knn_oracled": f"""
            WITH a AS (
                SELECT * FROM read_parquet('{q.IVF_ORACLE_DIR}/assign/*.parquet')
            ),
            p AS (
                SELECT * FROM read_parquet('{q.IVF_ORACLE_DIR}/probes/*.parquet')
            ),
            qv AS (
                SELECT vec_id AS query_id,
                       CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id < 10
            ),
            cand AS (
                SELECT p.query_id, a.vec_id FROM p JOIN a USING (list_id)
            ),
            ranked AS (
                SELECT c.query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY c.query_id
                           ORDER BY list_cosine_similarity(
                               qv.qe, CAST(e.embedding AS DOUBLE[])) DESC,
                                    c.vec_id ASC) AS rk
                FROM cand c
                JOIN qv ON qv.query_id = c.query_id
                JOIN embeddings e ON e.vec_id = c.vec_id
            )
            SELECT query_id, neighbor_id, rk
            FROM ranked WHERE rk <= 10 ORDER BY query_id, rk
        """,
        # winnowing selection recomputed in SQL over engine-exported
        # k-gram hash sequences (UBIGINT so min orders in uint64 space);
        # window = 16, complete windows only, single global min for
        # short docs — exactly functions.text.winnow_fingerprint
        "winnow_verify": f"""
            WITH g AS (
                SELECT * FROM read_parquet('{q.WINNOW_ORACLE_DIR}/*.parquet')
            ),
            cnt AS (SELECT doc_id, count(*) AS m FROM g GROUP BY doc_id),
            wins AS (
                SELECT g.doc_id, g.pos, c.m,
                       min(g.h) OVER (PARTITION BY g.doc_id ORDER BY g.pos
                                      ROWS BETWEEN 15 PRECEDING
                                      AND CURRENT ROW) AS mn
                FROM g JOIN cnt c USING (doc_id)),
            sel AS (
                SELECT doc_id, mn FROM wins WHERE m > 16 AND pos >= 15
                UNION ALL
                SELECT g.doc_id, min(g.h) AS mn
                FROM g JOIN cnt c USING (doc_id) WHERE c.m <= 16
                GROUP BY g.doc_id
            ),
            dd AS (SELECT DISTINCT doc_id, mn FROM sel)
            SELECT doc_id,
                   CAST(mn::HUGEINT
                        - CASE WHEN mn >= 9223372036854775808::UBIGINT
                               THEN 18446744073709551616::HUGEINT
                               ELSE 0::HUGEINT END AS BIGINT) AS fp
            FROM dd ORDER BY doc_id, fp
        """,
        # k-means assignment recomputed in SQL from the engine's exported
        # centroids (argmax cosine, ties to the smallest cluster_id);
        # zero-norm / NULL embeddings excluded on both sides.  Margins
        # are ≫ ulps (pytest-asserted), so DuckDB's summation order
        # cannot flip an argmax.
        "kmeans_clusters": f"""
            WITH cdf AS (
                SELECT * FROM read_parquet(
                    '{q.KMEANS_ORACLE_DIR}/centroids/*.parquet')),
            cent AS (
                SELECT cluster_id, array_agg(val ORDER BY pos) AS ce
                FROM cdf GROUP BY cluster_id),
            vecs AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings
                WHERE embedding IS NOT NULL
                  AND list_inner_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[])) > 0),
            ranked AS (
                SELECT v.vec_id, c.cluster_id,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY list_cosine_similarity(v.e, c.ce) DESC,
                                    c.cluster_id ASC) AS rk
                FROM vecs v CROSS JOIN cent c)
            SELECT vec_id, cluster_id FROM ranked WHERE rk = 1
            ORDER BY vec_id
        """,
        # SemDeDup keep-list recomputed in SQL over the engine's exported
        # cluster assignments and the exported noisy half of the union:
        # a vector is removed iff a same-cluster neighbor with a smaller
        # vec_id sits at cosine ≥ 0.995 (threshold ~0.4 away from both
        # populations — ulp-safe)
        "semantic_dedup": f"""
            WITH allv AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings
                UNION ALL
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM read_parquet('{q.SEMDEDUP_ORACLE_DIR}/noisy/*.parquet')),
            a AS (
                SELECT * FROM read_parquet(
                    '{q.SEMDEDUP_ORACLE_DIR}/assign/*.parquet')),
            removed AS (
                SELECT DISTINCT a2.vec_id
                FROM a a1
                JOIN a a2 ON a1.cluster_id = a2.cluster_id
                         AND a1.vec_id < a2.vec_id
                JOIN allv v1 ON v1.vec_id = a1.vec_id
                JOIN allv v2 ON v2.vec_id = a2.vec_id
                WHERE list_cosine_similarity(v1.e, v2.e) >= 0.995)
            SELECT a.vec_id, a.cluster_id FROM a
            WHERE a.vec_id NOT IN (SELECT vec_id FROM removed)
            ORDER BY a.vec_id
        """,
        # cluster-balanced sampling recomputed in SQL from the engine's
        # exported cluster assignments: per cluster keep the 25 smallest
        # shuffle keys (the global_shuffle Knuth hash, vec_id tiebreak);
        # the assignment itself is independently oracled by
        # kmeans_clusters
        "cluster_balanced_sample": f"""
            WITH a AS (
                SELECT * FROM read_parquet(
                    '{q.KMEANS_BALANCE_DIR}/assign/*.parquet')),
            ranked AS (
                SELECT vec_id, cluster_id,
                       row_number() OVER (
                           PARTITION BY cluster_id
                           ORDER BY (vec_id * 2654435761) % 4294967296,
                                    vec_id) AS rk
                FROM a)
            SELECT vec_id, cluster_id FROM ranked WHERE rk <= 25
            ORDER BY vec_id
        """,
        # ExactSubstr span dedup recomputed from raw text: positional
        # 5-grams, duplicated = gram string at >1 (doc,pos) corpus-wide,
        # overlapping windows merged with gaps-and-islands.  Engine
        # decides on 128-bit hashes, SQL on exact strings (collision
        # odds ~3e-15 — the paragraph_dedup contract).
        "exact_substring_spans": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(string_split_regex(coalesce(text, ''),
                                                      '\s+'),
                                   x -> x <> '') AS ws
                FROM documents),
            g AS (
                SELECT doc_id, unnest(generate_series(1, len(ws) - 4)) AS i,
                       ws
                FROM w WHERE len(ws) >= 5),
            g2 AS (
                SELECT doc_id, i - 1 AS pos,
                       array_to_string(ws[i:i+4], ' ') AS gram
                FROM g),
            d AS (SELECT gram FROM g2 GROUP BY gram HAVING count(*) >= 2),
            hit AS (SELECT g2.doc_id, g2.pos FROM g2 JOIN d USING (gram)),
            m AS (SELECT doc_id, pos,
                    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                                   ORDER BY pos) <= 5
                         THEN 0 ELSE 1 END AS brk
                  FROM hit),
            isl AS (SELECT doc_id, pos,
                    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                    FROM m)
            SELECT doc_id, min(pos) AS span_start,
                   CAST(max(pos) + 5 AS BIGINT) AS span_end
            FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start
        """,
        # ExactSubstr applied: recompute the spans, anti-join token
        # positions against them, string_agg the surviving tokens in
        # order ('' when the whole doc is duplicated)
        "exact_substring_cut": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(string_split_regex(coalesce(text, ''),
                                                      '\s+'),
                                   x -> x <> '') AS ws
                FROM documents),
            g AS (
                SELECT doc_id, unnest(generate_series(1, len(ws) - 4)) AS i,
                       ws
                FROM w WHERE len(ws) >= 5),
            g2 AS (
                SELECT doc_id, i - 1 AS pos,
                       array_to_string(ws[i:i+4], ' ') AS gram
                FROM g),
            d AS (SELECT gram FROM g2 GROUP BY gram HAVING count(*) >= 2),
            hit AS (SELECT g2.doc_id, g2.pos FROM g2 JOIN d USING (gram)),
            m AS (SELECT doc_id, pos,
                    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                                   ORDER BY pos) <= 5
                         THEN 0 ELSE 1 END AS brk
                  FROM hit),
            isl AS (SELECT doc_id, pos,
                    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                    FROM m),
            spans AS (
                SELECT doc_id, min(pos) AS s, max(pos) + 5 AS e
                FROM isl GROUP BY doc_id, grp),
            toks AS (
                SELECT doc_id, unnest(ws) AS tok,
                       unnest(generate_series(1, len(ws))) AS i
                FROM w),
            kept AS (
                SELECT t.doc_id,
                       string_agg(t.tok, ' ' ORDER BY t.i) AS kept_text
                FROM toks t
                WHERE t.doc_id IN (SELECT DISTINCT doc_id FROM spans)
                  AND NOT EXISTS (SELECT 1 FROM spans s
                                  WHERE s.doc_id = t.doc_id
                                    AND t.i - 1 >= s.s AND t.i - 1 < s.e)
                GROUP BY t.doc_id)
            SELECT sd.doc_id, coalesce(k.kept_text, '') AS kept_text
            FROM (SELECT DISTINCT doc_id FROM spans) sd
            LEFT JOIN kept k USING (doc_id)
            ORDER BY sd.doc_id
        """,
        # DSIR importance resampling: target unigram LM on the 'en'
        # slice, base LM on the corpus, integer micro-nat log weight
        # diff per doc (per-word-type half-away rounding — the
        # unigram_logprob discipline; OOV-vs-target = count-1/2
        # backoff), top 10% per language by (weight DESC, doc_id).
        # NULL-lang docs excluded (quota join cannot match NULL).
        "dsir_sample": """
            WITH docs AS (
                SELECT doc_id, lang, text FROM documents
                WHERE lang IS NOT NULL),
            toks AS (
                SELECT doc_id, lang,
                       list_filter(string_split(coalesce(text, ''), ' '),
                                   w -> w <> '') AS words
                FROM docs),
            words AS (
                SELECT doc_id, lang, unnest(words) AS w FROM toks),
            bc AS (SELECT w, count(*) AS n FROM words GROUP BY w),
            bt AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM bc),
            blp AS (
                SELECT w, CAST(CASE WHEN x >= 0 THEN floor(x + 0.5)
                                    ELSE -floor(-x + 0.5) END AS BIGINT)
                           AS lp
                FROM (SELECT w, 1e6 * ln(n / t) AS x FROM bc, bt)),
            tc AS (SELECT w, count(*) AS n FROM words
                   WHERE lang = 'en' GROUP BY w),
            tt AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM tc),
            tlp AS (
                SELECT w, CAST(CASE WHEN x >= 0 THEN floor(x + 0.5)
                                    ELSE -floor(-x + 0.5) END AS BIGINT)
                           AS lp
                FROM (SELECT w, 1e6 * ln(n / t) AS x FROM tc, tt)),
            toov AS (
                SELECT CAST(CASE WHEN x >= 0 THEN floor(x + 0.5)
                                 ELSE -floor(-x + 0.5) END AS BIGINT) AS lp
                FROM (SELECT 1e6 * ln(0.5 / t) AS x FROM tt)),
            scored AS (
                SELECT d.doc_id, d.lang, coalesce(s.diff, 0) AS dsir_e6
                FROM toks d LEFT JOIN (
                    SELECT doc_id,
                           CAST(sum(coalesce(t.lp, (SELECT lp FROM toov))
                                    - b.lp) AS BIGINT) AS diff
                    FROM words
                    JOIN blp b USING (w)
                    LEFT JOIN tlp t USING (w)
                    GROUP BY doc_id) s USING (doc_id)),
            q AS (SELECT lang, count(*) // 10 AS k FROM docs
                  GROUP BY lang),
            r AS (SELECT doc_id, lang, dsir_e6,
                         row_number() OVER (
                             PARTITION BY lang
                             ORDER BY dsir_e6 DESC, doc_id) AS rn
                  FROM scored)
            SELECT doc_id, lang, dsir_e6
            FROM r JOIN q USING (lang) WHERE rn <= q.k
            ORDER BY doc_id
        """,
        # Efraimidis-Spirakis A-ES weighted sampling without replacement:
        # exponential-race key ln(u)/w quantized to integer micro-nats
        # (one float->int64 round per row, exact int64 ranking after),
        # u = the shared seed-stable multiplicative-hash uniform, w =
        # n_chars; each lang keeps its top n_eligible // 20 by
        # (key DESC, doc_id).  NULL-lang / non-positive-weight docs are
        # excluded (documented policy, same as dsir_sample).
        "weighted_sample": """
            WITH elig AS (
                SELECT doc_id, lang, n_chars,
                       ((doc_id * 2654435761) % 4294967296 + 1)
                           / 4294967297.0 AS u
                FROM documents
                WHERE lang IS NOT NULL
                  AND n_chars IS NOT NULL AND n_chars > 0),
            keyed AS (
                SELECT doc_id, lang, n_chars,
                       CAST(CASE WHEN x >= 0 THEN floor(x + 0.5)
                                 ELSE -floor(-x + 0.5) END AS BIGINT)
                           AS key_e6
                FROM (SELECT *, 1e6 * ln(u) / n_chars AS x FROM elig)),
            q AS (SELECT lang, count(*) // 20 AS k FROM elig
                  GROUP BY lang),
            r AS (SELECT *, row_number() OVER (
                      PARTITION BY lang
                      ORDER BY key_e6 DESC, doc_id) AS rn
                  FROM keyed)
            SELECT doc_id, lang, n_chars, key_e6
            FROM r JOIN q USING (lang) WHERE rn <= q.k
            ORDER BY doc_id
        """,
        "cluster_composition": """
            SELECT d.lang, CAST(e.label AS BIGINT) AS label,
                   count(*) AS n_docs,
                   CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
            GROUP BY d.lang, e.label ORDER BY d.lang, label
        """,
        # per-lang budget fill: running INCLUSIVE window sum in shuffle
        # order, all-integer, budget = corpus total // 10
        "budget_sample": """
            WITH r AS (
                SELECT lang, doc_id, n_chars,
                       sum(n_chars) OVER (
                           PARTITION BY lang
                           ORDER BY (doc_id * 2654435761) % 4294967296,
                                    doc_id
                           ROWS UNBOUNDED PRECEDING) AS run
                FROM documents),
            b AS (SELECT (sum(n_chars) // 10) AS budget FROM documents)
            SELECT lang, count(*) AS n_kept,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM r, b WHERE run <= budget
            GROUP BY lang ORDER BY lang
        """,
        # GROUP BY ROLLUP (lang, source): grp is the GROUPING() bit
        # vector (leaf 0, lang subtotal 1, grand total 3); aggregated-out
        # dimensions surface as '__all__'
        "rollup_lang_source": """
            SELECT CASE WHEN GROUPING(lang) = 1 THEN '__all__'
                        ELSE lang END AS lang,
                   CASE WHEN GROUPING(source) = 1 THEN '__all__'
                        ELSE source END AS source,
                   CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT)
                       AS grp,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY ROLLUP (lang, source)
            ORDER BY grp, lang, source
        """,
        # the CheckSuite's violation counts over documents mapped into the
        # pages schema (lang groups use the raw lang value; the engine's
        # __missing__ attribution only differs when lang is NULL, which the
        # shared testdata never contains)
        # NULL lang attributes to the engine's '__missing__' label (the
        # reference's missing-attribution semantics; same as the
        # pages_validate oracle) — exposed by the adversarial NULL-lang
        # corpus, invisible on the fixture tables which have no NULL lang
        "docs_validate": """
            WITH documents_attr AS (
                SELECT coalesce(lang, '__missing__') AS g, *
                FROM documents
            )
            SELECT lang, check_name, n_violations FROM (
                SELECT g AS lang, 'referential_lang' AS check_name,
                       count(*) FILTER (WHERE lang IS NOT NULL AND lang <> ''
                                        AND lang NOT IN ('en','de','fr'))
                           AS n_violations
                FROM documents_attr GROUP BY g
                UNION ALL
                SELECT g AS lang, 'text_min_len',
                       count(*) FILTER (WHERE text IS NOT NULL AND text <> ''
                                        AND length(text) < 200)
                FROM documents_attr GROUP BY g
                UNION ALL
                SELECT g AS lang, 'presence_text',
                       count(*) FILTER (WHERE text IS NULL OR text = '')
                FROM documents_attr GROUP BY g
                UNION ALL
                SELECT g AS lang, 'presence_lang',
                       count(*) FILTER (WHERE lang IS NULL OR lang = '')
                FROM documents_attr GROUP BY g
                UNION ALL
                SELECT g AS lang, 'presence_url',
                       count(*) FILTER (WHERE source IS NULL OR source = '')
                FROM documents_attr GROUP BY g
            ) WHERE n_violations > 0
        """,
        # day-over-day PSI/KS drift: 20 fixed-width buckets over the
        # global value range; PSI on Laplace-smoothed (c+0.5)/(N+10)
        # proportions, KS on integer cumulative counts (bit-identical);
        # a day pairs only with its immediate calendar predecessor
        "daily_drift": """
            WITH ev AS (
                SELECT epoch_us(date_trunc('day', ts)) AS day_us, value
                FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
            bounds AS (SELECT min(value) AS vmin, max(value) AS vmax
                       FROM ev),
            bk AS (
                SELECT day_us,
                       CASE WHEN b.vmax = b.vmin THEN 0
                            ELSE least(CAST(floor((value - b.vmin) /
                                       ((b.vmax - b.vmin) / 20.0))
                                       AS BIGINT), 19) END AS bucket
                FROM ev, bounds b),
            days AS (SELECT DISTINCT day_us FROM bk),
            cnt AS (SELECT day_us, bucket, count(*) AS c
                    FROM bk GROUP BY 1, 2),
            grid AS (
                SELECT d.day_us, r.bucket, coalesce(c.c, 0) AS c
                FROM days d
                CROSS JOIN (SELECT unnest(range(0, 20)) AS bucket) r
                LEFT JOIN cnt c
                  ON c.day_us = d.day_us AND c.bucket = r.bucket),
            tot AS (SELECT day_us, bucket, c,
                           SUM(c) OVER (PARTITION BY day_us) AS n,
                           SUM(c) OVER (PARTITION BY day_us
                                        ORDER BY bucket) AS cum
                    FROM grid),
            pair AS (
                SELECT a.day_us, a.bucket, a.n AS na, b.n AS nb,
                       CAST(a.cum AS DOUBLE) / a.n AS fa,
                       CAST(b.cum AS DOUBLE) / b.n AS fb,
                       (CAST(a.c AS DOUBLE) + 0.5)
                           / (CAST(a.n AS DOUBLE) + 10.0) AS pa2,
                       (CAST(b.c AS DOUBLE) + 0.5)
                           / (CAST(b.n AS DOUBLE) + 10.0) AS pb2
                FROM tot a JOIN tot b
                  ON a.day_us = b.day_us + 86400000000
                 AND a.bucket = b.bucket),
            stat AS (
                SELECT day_us, max(nb) AS n_prev, max(na) AS n_cur,
                       sum((pa2 - pb2) * ln(pa2 / pb2)) AS psi,
                       max(abs(fa - fb)) AS ks
                FROM pair GROUP BY day_us)
            SELECT make_timestamp(day_us) AS day,
                   CAST(n_prev AS BIGINT) AS n_prev,
                   CAST(n_cur AS BIGINT) AS n_cur,
                   CAST(round(1000000 * psi) AS BIGINT) AS psi_e6,
                   CAST(round(1000000 * ks) AS BIGINT) AS ks_e6
            FROM stat ORDER BY day
        """,
        # LAG gaps per user in exact integer microseconds; single-event
        # users have no gap (count(prev) = 0) and are absent
        "inter_event_gaps": """
            WITH o AS (
                SELECT user_id, epoch_us(ts) AS ts_us,
                       lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id) AS prev
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL)
            SELECT user_id, CAST(count(prev) AS BIGINT) AS n_gaps,
                   CAST(sum(ts_us - prev) AS BIGINT) AS sum_gap_us,
                   CAST(max(ts_us - prev) AS BIGINT) AS max_gap_us
            FROM o GROUP BY user_id HAVING count(prev) >= 1
            ORDER BY user_id
        """,
        "latest_event_per_user": """
            SELECT user_id, event_id, ts, event_type, value
            FROM (SELECT user_id, event_id, ts, event_type, value,
                         row_number() OVER (
                             PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events
                  WHERE user_id IS NOT NULL AND ts IS NOT NULL)
            WHERE rn = 1 ORDER BY user_id
        """,
        # Pearson corr from exact integer moments; the float closed form
        # uses the IDENTICAL operand order as the engine, so e6 rounding
        # is bit-reproducible; zero-variance groups yield NULL
        "corr_chars_tokens": """
            WITH d AS (
                SELECT lang, CAST(n_chars AS BIGINT) AS x,
                       CAST(len(list_filter(string_split(text, ' '),
                                            w -> w <> '')) AS BIGINT) AS y
                FROM documents
                WHERE n_chars IS NOT NULL AND text IS NOT NULL),
            m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_pairs,
                         CAST(sum(x) AS BIGINT) AS sx,
                         CAST(sum(y) AS BIGINT) AS sy,
                         CAST(sum(x * y) AS BIGINT) AS sxy,
                         CAST(sum(x * x) AS BIGINT) AS sxx,
                         CAST(sum(y * y) AS BIGINT) AS syy
                  FROM d GROUP BY lang),
            r AS (SELECT lang, n_pairs,
                         (CAST(n_pairs AS DOUBLE) * sxy
                          - CAST(sx AS DOUBLE) * sy) AS num,
                         (CAST(n_pairs AS DOUBLE) * sxx
                          - CAST(sx AS DOUBLE) * sx)
                         * (CAST(n_pairs AS DOUBLE) * syy
                            - CAST(sy AS DOUBLE) * sy) AS v2
                  FROM m)
            SELECT lang, n_pairs,
                   CASE WHEN v2 > 0
                        THEN CAST(round(1000000 * (num / sqrt(v2)))
                                  AS BIGINT)
                        ELSE NULL END AS corr_e6
            FROM r ORDER BY lang
        """,
        "cube_lang_source": """
            SELECT CASE WHEN GROUPING(lang) = 1 THEN '__all__'
                        ELSE lang END AS lang,
                   CASE WHEN GROUPING(source) = 1 THEN '__all__'
                        ELSE source END AS source,
                   CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT)
                       AS grp,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY CUBE (lang, source)
            ORDER BY grp, lang, source
        """,
        # Shannon entropy in exact integer micro-nats: per-count ln
        # rounded ONCE, so the corpus accumulation is an exact int sum
        "token_entropy": """
            WITH w AS (
                SELECT lang,
                       unnest(string_split(coalesce(text, ''), ' ')) AS word
                FROM documents),
            c AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS n
                  FROM w WHERE word <> '' GROUP BY lang, word),
            s AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens,
                         CAST(count(*) AS BIGINT) AS vocab,
                         CAST(sum(n * CAST(round(1000000 * ln(n))
                                           AS BIGINT)) AS BIGINT) AS s
                  FROM c GROUP BY lang)
            SELECT lang, n_tokens, vocab,
                   CAST(round(1000000 * ln(n_tokens)
                              - CAST(s AS DOUBLE) / n_tokens)
                        AS BIGINT) AS ent_e6
            FROM s ORDER BY lang
        """,
        # PMI over exact integer counts with the engine's operand order
        "pmi_bigrams": """
            WITH toks AS (
                SELECT list_filter(string_split(coalesce(text, ''), ' '),
                                   x -> x <> '') AS l
                FROM documents),
            big AS (SELECT l[i.i] AS w1, l[i.i + 1] AS w2
                    FROM toks,
                         LATERAL (SELECT unnest(range(1, len(l))) AS i) i),
            bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
                   FROM big GROUP BY w1, w2),
            uc AS (SELECT unnest(l) AS w FROM toks),
            un AS (SELECT w, CAST(count(*) AS BIGINT) AS n
                   FROM uc GROUP BY w),
            tot AS (SELECT (SELECT CAST(sum(n) AS BIGINT) FROM bc) AS nb,
                           (SELECT CAST(sum(n) AS BIGINT) FROM un) AS nu),
            sc AS (SELECT b.w1, b.w2, b.n,
                          CAST(round(1000000 * ln(
                              (CAST(b.n AS DOUBLE)
                               * CAST(t.nu AS DOUBLE)
                               * CAST(t.nu AS DOUBLE))
                              / (CAST(t.nb AS DOUBLE)
                                 * CAST(u1.n AS DOUBLE)
                                 * CAST(u2.n AS DOUBLE)))) AS BIGINT)
                              AS pmi_e6
                   FROM bc b
                   JOIN un u1 ON u1.w = b.w1
                   JOIN un u2 ON u2.w = b.w2
                   CROSS JOIN tot t
                   WHERE b.n >= 5)
            SELECT w1, w2, n, pmi_e6,
                   CAST(row_number() OVER (
                       ORDER BY pmi_e6 DESC, w1, w2) AS BIGINT) AS rk
            FROM sc QUALIFY rk <= 25 ORDER BY rk
        """,
        # deterministic crawl-adjacency host graph + 5 unrolled
        # integer-exact PageRank iterations (scale 1e9, damping 85/100,
        # base (15*1e9)//100 = 150000000); dangling mass dropped
        "pagerank_hosts": _URL_CANON_CTE + """
            , hx AS (
                SELECT doc_id,
                       NULLIF(lower(regexp_extract(canonical_url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)),
                           '') AS host
                FROM canon),
            nodes AS (SELECT DISTINCT host FROM hx
                      WHERE host IS NOT NULL),
            e0 AS (
                SELECT a.host AS src, b.host AS dst
                FROM hx a JOIN hx b ON b.doc_id = a.doc_id + 1
                WHERE a.host IS NOT NULL AND b.host IS NOT NULL),
            edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
                      FROM e0 GROUP BY src, dst),
            deg AS (SELECT src, CAST(sum(w) AS BIGINT) AS deg
                    FROM edges GROUP BY src),
            ew AS (SELECT e.src, e.dst, e.w, d.deg
                   FROM edges e JOIN deg d ON d.src = e.src),
            r0 AS (SELECT host, CAST(1000000000 AS BIGINT) AS r
                   FROM nodes),
        """ + _pagerank_iter_ctes(5) + """
            SELECT n.host,
                   CAST(coalesce(d.deg, 0) AS BIGINT) AS out_deg,
                   r5.r AS rank
            FROM nodes n JOIN r5 ON r5.host = n.host
            LEFT JOIN deg d ON d.src = n.host
            ORDER BY n.host
        """,
        # connected components of the same host graph, rep = min host
        # (recursive min-label transitive closure)
        "host_components": _URL_CANON_CTE.replace(
            "WITH urls", "WITH RECURSIVE urls", 1) + """
            , hx AS (
                SELECT doc_id,
                       NULLIF(lower(regexp_extract(canonical_url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)),
                           '') AS host
                FROM canon),
            nodes AS (SELECT DISTINCT host FROM hx
                      WHERE host IS NOT NULL),
            e0 AS (
                SELECT a.host AS src, b.host AS dst
                FROM hx a JOIN hx b ON b.doc_id = a.doc_id + 1
                WHERE a.host IS NOT NULL AND b.host IS NOT NULL),
            ue AS (SELECT src, dst FROM e0
                   UNION SELECT dst, src FROM e0),
            reach AS (
                SELECT host, host AS label FROM nodes
                UNION
                SELECT e.dst AS host, r.label
                FROM reach r JOIN ue e ON e.src = r.host),
            comp AS (SELECT host, min(label) AS component
                     FROM reach GROUP BY host),
            sz AS (SELECT component,
                          CAST(count(*) AS BIGINT) AS comp_size
                   FROM comp GROUP BY component)
            SELECT c.host, c.component, s.comp_size
            FROM comp c JOIN sz s ON s.component = c.component
            ORDER BY c.host
        """,
        # trailing-7-observed-days z-score on exact integer moments
        "event_rate_anomaly": """
            WITH e AS (
                SELECT epoch_us(date_trunc('day', ts)) AS day_us,
                       count(*) AS c
                FROM events WHERE ts IS NOT NULL GROUP BY 1),
            w AS (
                SELECT day_us, c,
                       CAST(count(*) OVER win AS BIGINT) AS cnt,
                       CAST(sum(c) OVER win AS BIGINT) AS s,
                       CAST(sum(c * c) OVER win AS BIGINT) AS q
                FROM e
                WINDOW win AS (ORDER BY day_us
                               ROWS BETWEEN 7 PRECEDING
                               AND 1 PRECEDING))
            SELECT make_timestamp(day_us) AS day,
                   CAST(c AS BIGINT) AS n_events,
                   CASE WHEN cnt = 7
                             AND (7.0 * q - CAST(s AS DOUBLE) * s)
                                 / 49.0 > 0
                        THEN CAST(round(1000000 * ((CAST(c AS DOUBLE)
                                  - CAST(s AS DOUBLE) / 7.0)
                                  / sqrt((7.0 * q
                                          - CAST(s AS DOUBLE) * s)
                                         / 49.0))) AS BIGINT)
                        ELSE NULL END AS z_e6
            FROM w ORDER BY day
        """,
        # snapshot-diff classification over the deterministically
        # derived next crawl (drop %7, rewrite %10, re-add %11 at +20M);
        # NULL IS DISTINCT FROM semantics matches the engine's
        # null-marker hash
        "snapshot_diff": """
            WITH newc AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 10 = 0
                            THEN 'rev2 ' || coalesce(text, '')
                            ELSE text END AS text
                FROM documents WHERE doc_id % 7 <> 0
                UNION ALL
                SELECT doc_id + 20000000, text FROM documents
                WHERE doc_id % 11 = 0),
            cls AS (
                SELECT CASE WHEN b.doc_id IS NULL THEN 'added'
                            WHEN n.doc_id IS NULL THEN 'removed'
                            WHEN n.text IS DISTINCT FROM b.text
                                 THEN 'changed'
                            ELSE 'unchanged' END AS change_class
                FROM documents b FULL OUTER JOIN newc n
                  ON n.doc_id = b.doc_id)
            SELECT change_class, CAST(count(*) AS BIGINT) AS n_docs
            FROM cls GROUP BY 1 ORDER BY 1
        """,
        # the shared Knuth shuffle key drives the stable 90/5/5 split
        "dataset_split": """
            SELECT lang,
                   CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90
                        THEN 'train'
                        WHEN (doc_id * 2654435761) % 4294967296 % 100 < 95
                        THEN 'val' ELSE 'test' END AS split,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # add-one bigram LM trained and scored on the corpus; per-type
        # ln rounded once to micro-nats (exact int accumulation)
        "bigram_logprob": """
            WITH toks AS (
                SELECT doc_id, lang,
                       list_filter(string_split(coalesce(text, ''), ' '),
                                   x -> x <> '') AS l
                FROM documents),
            big AS (SELECT lang, l[i.i] AS w1, l[i.i + 1] AS w2
                    FROM toks,
                         LATERAL (SELECT unnest(range(1, len(l))) AS i) i),
            bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
                   FROM big GROUP BY w1, w2),
            uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c1
                   FROM (SELECT unnest(l) AS w FROM toks) GROUP BY w),
            v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM uc),
            lp AS (SELECT b.w1, b.w2,
                          CAST(round(1000000 * ln(
                              (CAST(b.c12 AS DOUBLE) + 1.0)
                              / (CAST(u.c1 AS DOUBLE) + vv.vocab)))
                               AS BIGINT) AS lp_e6
                   FROM bc b JOIN uc u ON u.w = b.w1 CROSS JOIN v vv),
            sc AS (SELECT g.lang, l.lp_e6
                   FROM big g JOIN lp l
                     ON l.w1 = g.w1 AND l.w2 = g.w2),
            agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_bigrams,
                           CAST(sum(lp_e6) AS BIGINT) AS sum_lp_e6
                    FROM sc GROUP BY lang),
            docs AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
                     FROM documents GROUP BY lang)
            SELECT d.lang, d.n_docs,
                   coalesce(a.n_bigrams, 0) AS n_bigrams,
                   coalesce(a.sum_lp_e6, 0) AS sum_lp_e6
            FROM docs d LEFT JOIN agg a
              ON a.lang IS NOT DISTINCT FROM d.lang
            ORDER BY d.lang
        """,
        # Markov transitions: LAG pairs per user; a NULL event_type is a
        # STATE (sentinel round-trip) while the first row of a user has
        # no transition — disambiguated via lag(event_id)
        "event_transitions": """
            WITH o AS (
                SELECT user_id,
                       coalesce(event_type, chr(0) || '__null__') AS et,
                       epoch_us(ts) AS us, event_id
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            p AS (
                SELECT et AS t2,
                       lag(et) OVER w AS t1,
                       lag(event_id) OVER w AS prev_id
                FROM o
                WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
            c AS (SELECT t1, t2, CAST(count(*) AS BIGINT) AS n
                  FROM p WHERE prev_id IS NOT NULL GROUP BY t1, t2),
            tt AS (SELECT t1, CAST(sum(n) AS BIGINT) AS tot
                   FROM c GROUP BY t1)
            SELECT NULLIF(c.t1, chr(0) || '__null__') AS from_type,
                   NULLIF(c.t2, chr(0) || '__null__') AS to_type,
                   c.n,
                   CAST(round(1000000 * (CAST(c.n AS DOUBLE)
                                         / CAST(t.tot AS DOUBLE)))
                        AS BIGINT) AS prob_e6
            FROM c JOIN tt t ON t.t1 = c.t1
            ORDER BY from_type, to_type
        """,
        # triangle census on the canonical simple undirected host graph;
        # each triangle u<v<z counted once via the ordered 3-way join
        "triangle_count": _URL_CANON_CTE + """
            , hx AS (
                SELECT doc_id,
                       NULLIF(lower(regexp_extract(canonical_url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)),
                           '') AS host
                FROM canon),
            nodes AS (SELECT DISTINCT host FROM hx
                      WHERE host IS NOT NULL),
            e0 AS (
                SELECT a.host AS src, b.host AS dst
                FROM hx a JOIN hx b ON b.doc_id = a.doc_id + 1
                WHERE a.host IS NOT NULL AND b.host IS NOT NULL),
            ce AS (SELECT DISTINCT least(src, dst) AS u,
                          greatest(src, dst) AS v
                   FROM e0 WHERE src <> dst)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes)
                       AS n_nodes,
                   (SELECT CAST(count(*) AS BIGINT) FROM ce) AS n_edges,
                   (SELECT CAST(count(*) AS BIGINT)
                    FROM ce e1
                    JOIN ce e2 ON e2.u = e1.u AND e2.v > e1.v
                    JOIN ce e3 ON e3.u = e1.v AND e3.v = e2.v)
                       AS n_triangles
        """,
        # robust dispersion: exact discrete median, then exact discrete
        # median of absolute deviations (both actual data values)
        "value_mad_by_type": """
            WITH m AS (SELECT event_type,
                              quantile_disc(value, 0.5) AS med
                       FROM events GROUP BY event_type),
            d AS (SELECT e.event_type, abs(e.value - m.med) AS dev
                  FROM events e JOIN m
                    ON m.event_type IS NOT DISTINCT FROM e.event_type),
            a AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad
                  FROM d GROUP BY event_type)
            SELECT m.event_type, m.med, a.mad
            FROM m JOIN a
              ON a.event_type IS NOT DISTINCT FROM m.event_type
            ORDER BY m.event_type
        """,
        # multi-pattern scan: the non-overlapping count identity
        # (len - len(replace)) / len; none of the patterns self-overlap
        "keyword_matrix": """
            WITH kw AS (SELECT unnest(
                ['data', 'the', 'and', 'ing', 'tion']) AS keyword),
            c AS (
                SELECT d.lang, k.keyword,
                       CAST(sum((length(coalesce(d.text, ''))
                                 - length(replace(coalesce(d.text, ''),
                                                  k.keyword, '')))
                                // length(k.keyword)) AS BIGINT) AS n
                FROM documents d CROSS JOIN kw k
                GROUP BY d.lang, k.keyword)
            SELECT lang, keyword, n FROM c ORDER BY lang, keyword
        """,
        # sparse equal-width histogram over the global value range
        "value_histogram": """
            WITH ev AS (SELECT event_type, value FROM events
                        WHERE value IS NOT NULL),
            b AS (SELECT min(value) AS vmin, max(value) AS vmax FROM ev),
            bk AS (SELECT event_type,
                          CASE WHEN bb.vmax = bb.vmin THEN 0
                               ELSE least(CAST(floor((value - bb.vmin)
                                    / ((bb.vmax - bb.vmin) / 10.0))
                                    AS BIGINT), 9) END AS bin
                   FROM ev, b bb)
            SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n
            FROM bk GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # day-over-day growth per type vs the previous OBSERVED day
        "daily_type_growth": """
            WITH c AS (
                SELECT event_type,
                       epoch_us(date_trunc('day', ts)) AS day_us,
                       CAST(count(*) AS BIGINT) AS n
                FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
            g AS (SELECT event_type, day_us, n,
                         lag(n) OVER (PARTITION BY event_type
                                      ORDER BY day_us) AS p
                  FROM c)
            SELECT event_type, make_timestamp(day_us) AS day, n,
                   CASE WHEN p IS NULL THEN NULL
                        ELSE CAST(round(1000000 * (CAST(n AS DOUBLE)
                                        / CAST(p AS DOUBLE)))
                             AS BIGINT) END AS growth_e6
            FROM g ORDER BY event_type, day
        """,
        # exact trailing-7-calendar-day distinct actives per observed day
        "rolling_active_users": """
            WITH p AS (
                SELECT DISTINCT user_id,
                       epoch_us(date_trunc('day', ts)) AS day_us
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            d AS (SELECT DISTINCT day_us FROM p)
            SELECT make_timestamp(d.day_us) AS day,
                   CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_active
            FROM d JOIN p
              ON p.day_us BETWEEN d.day_us - 6 * 86400000000
                              AND d.day_us
            GROUP BY d.day_us ORDER BY day
        """,
        # RFM quartile segmentation over exact per-user metrics and
        # exact quantile_disc thresholds (actual data values)
        "rfm_segments": """
            WITH u AS (
                SELECT user_id, epoch_us(max(ts)) AS r,
                       CAST(count(*) AS BIGINT) AS f,
                       CAST(coalesce(sum(CAST(round(1000000 * value)
                                              AS BIGINT)), 0)
                            AS BIGINT) AS m
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                GROUP BY user_id),
            t AS (SELECT
                quantile_disc(r, 0.25) AS r1, quantile_disc(r, 0.5) AS r2,
                quantile_disc(r, 0.75) AS r3,
                quantile_disc(f, 0.25) AS f1, quantile_disc(f, 0.5) AS f2,
                quantile_disc(f, 0.75) AS f3,
                quantile_disc(m, 0.25) AS m1, quantile_disc(m, 0.5) AS m2,
                quantile_disc(m, 0.75) AS m3
                FROM u),
            b AS (SELECT
                CAST(u.r > t.r1 AS BIGINT) + CAST(u.r > t.r2 AS BIGINT)
                    + CAST(u.r > t.r3 AS BIGINT) AS r_bucket,
                CAST(u.f > t.f1 AS BIGINT) + CAST(u.f > t.f2 AS BIGINT)
                    + CAST(u.f > t.f3 AS BIGINT) AS f_bucket,
                CAST(u.m > t.m1 AS BIGINT) + CAST(u.m > t.m2 AS BIGINT)
                    + CAST(u.m > t.m3 AS BIGINT) AS m_bucket
                FROM u, t)
            SELECT r_bucket, f_bucket, m_bucket,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        # duplicate-rate report: COUNT(DISTINCT text) skips NULLs; the
        # engine's 128-bit content keys are the exact-equality stand-in
        "dup_rate_by_source": """
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(text) AS BIGINT) AS n_nonnull,
                   CAST(count(DISTINCT text) AS BIGINT) AS n_distinct,
                   CASE WHEN count(text) > 0
                        THEN CAST(round(1000000 *
                             (CAST(count(text) - count(DISTINCT text)
                                   AS DOUBLE)
                              / CAST(count(text) AS DOUBLE)))
                             AS BIGINT)
                        ELSE NULL END AS dup_rate_e6
            FROM documents GROUP BY source ORDER BY source
        """,
        # exact discrete quantiles of the LAG gap distribution
        "gap_quantiles": """
            WITH o AS (
                SELECT epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (
                             PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id) AS gap
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL)
            SELECT CAST(quantile_disc(gap, 0.5) AS BIGINT) AS q50_us,
                   CAST(quantile_disc(gap, 0.9) AS BIGINT) AS q90_us,
                   CAST(quantile_disc(gap, 0.99) AS BIGINT) AS q99_us
            FROM o WHERE gap IS NOT NULL
        """,
        # Morton interleave: the classic five magic-number spread steps,
        # bit-identical integer arithmetic in both engines
        "zorder_layout": """
            WITH s AS (
                SELECT doc_id, (doc_id % 65536) AS a,
                       (coalesce(n_chars, 0) % 65536) AS b
                FROM documents),
            sp AS (
                SELECT doc_id,
                       (((((a | (a << 8)) & 16711935)
                          | (((a | (a << 8)) & 16711935) << 4))
                         & 252645135) ) AS a4,
                       (((((b | (b << 8)) & 16711935)
                          | (((b | (b << 8)) & 16711935) << 4))
                         & 252645135) ) AS b4
                FROM s),
            sp2 AS (
                SELECT doc_id,
                       (((a4 | (a4 << 2)) & 858993459)
                        | ((((a4 | (a4 << 2)) & 858993459) << 1)))
                       & 1431655765 AS am,
                       (((b4 | (b4 << 2)) & 858993459)
                        | ((((b4 | (b4 << 2)) & 858993459) << 1)))
                       & 1431655765 AS bm
                FROM sp)
            SELECT doc_id, CAST(am | (bm << 1) AS BIGINT) AS morton,
                   CAST(row_number() OVER (ORDER BY am | (bm << 1),
                                           doc_id) AS BIGINT) AS rk
            FROM sp2 QUALIFY rk <= 25 ORDER BY rk
        """,
        "kcore_hosts": _URL_CANON_CTE + """
            , hx AS (
                SELECT doc_id,
                       NULLIF(lower(regexp_extract(canonical_url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)),
                           '') AS host
                FROM canon),
            e0 AS (
                SELECT a.host AS src, b.host AS dst
                FROM hx a JOIN hx b ON b.doc_id = a.doc_id + 1
                WHERE a.host IS NOT NULL AND b.host IS NOT NULL),
            g0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u,
                          greatest(src, dst) AS v
                   FROM e0 WHERE src <> dst),
        """ + _kcore_round_ctes(k=2, n_rounds=8) + """
            SELECT h AS host, CAST(count(*) AS BIGINT) AS core_deg
            FROM (SELECT u AS h FROM g8 UNION ALL SELECT v AS h FROM g8)
            GROUP BY h ORDER BY host
        """,
        "event_type_trend": """
            WITH e AS (
                -- date_trunc floors pre-1970 days (bare `//` would
                -- TRUNCATE toward zero and split them off by one);
                -- the truncated epoch is an exact day multiple, so the
                -- remaining division is exact
                SELECT event_type,
                       epoch_us(date_trunc('day', ts))
                           // 86400000000 AS day
                FROM events WHERE ts IS NOT NULL),
            d AS (
                SELECT event_type, day, CAST(count(*) AS BIGINT) AS cnt
                FROM e GROUP BY event_type, day),
            m AS (
                SELECT event_type,
                       CAST(count(*) AS BIGINT) AS n_days,
                       CAST(sum(day) AS BIGINT) AS sx,
                       CAST(sum(cnt) AS BIGINT) AS sy,
                       CAST(sum(day * cnt) AS BIGINT) AS sxy,
                       CAST(sum(day * day) AS BIGINT) AS sxx
                FROM d GROUP BY event_type)
            SELECT event_type, n_days, sy AS n_events,
                   CASE WHEN CAST(n_days AS DOUBLE) * sxx
                             - CAST(sx AS DOUBLE) * sx > 0
                        THEN CAST(round(1000000 * (
                                 (CAST(n_days AS DOUBLE) * sxy
                                  - CAST(sx AS DOUBLE) * sy)
                                 / (CAST(n_days AS DOUBLE) * sxx
                                    - CAST(sx AS DOUBLE) * sx)))
                             AS BIGINT)
                        ELSE NULL END AS slope_e6
            FROM m ORDER BY event_type
        """,
        "chi2_lang_source": """
            WITH cells AS (
                SELECT lang, source, CAST(count(*) AS BIGINT) AS n
                FROM documents GROUP BY lang, source),
            t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM cells),
            r AS (SELECT lang, CAST(sum(n) AS BIGINT) AS rn
                  FROM cells GROUP BY lang),
            c AS (SELECT source, CAST(sum(n) AS BIGINT) AS cn
                  FROM cells GROUP BY source),
            e AS (
                SELECT cells.lang, cells.source, cells.n,
                       CAST(r.rn AS DOUBLE) * c.cn / t.total AS e
                FROM cells
                CROSS JOIN t
                JOIN r ON r.lang IS NOT DISTINCT FROM cells.lang
                JOIN c ON c.source IS NOT DISTINCT FROM cells.source)
            SELECT lang, source, n,
                   CAST(round(1000000 * e) AS BIGINT) AS expected_e6,
                   CAST(round(1000000 * ((CAST(n AS DOUBLE) - e)
                                         * (CAST(n AS DOUBLE) - e) / e))
                        AS BIGINT) AS chi2_e6
            FROM e ORDER BY lang, source
        """,
        "value_winsorized": """
            WITH v AS (SELECT event_type, value FROM events
                       WHERE value IS NOT NULL),
            q AS (SELECT event_type,
                         quantile_disc(value, 0.05) AS p05,
                         quantile_disc(value, 0.95) AS p95
                  FROM v GROUP BY event_type)
            SELECT v.event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(value < p05 AS BIGINT)) AS BIGINT)
                       AS n_lo,
                   CAST(sum(CAST(value > p95 AS BIGINT)) AS BIGINT)
                       AS n_hi,
                   CAST(sum(CAST(round(1000000 *
                            least(greatest(value, p05), p95))
                            AS BIGINT)) AS BIGINT) AS sum_clamped_e6
            FROM v JOIN q
              ON q.event_type IS NOT DISTINCT FROM v.event_type
            GROUP BY v.event_type ORDER BY v.event_type
        """,
        "edit_distance_pairs": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000,
                       CASE WHEN doc_id % 50 = 0
                            THEN reverse(coalesce(text, ''))
                            WHEN contains(coalesce(text, ''), ' ')
                            THEN 'xqzv' || substr(coalesce(text, ''),
                                 strpos(coalesce(text, ''), ' '))
                            ELSE 'xqzv' END
                FROM documents WHERE doc_id % 10 = 0),
            b AS (
                SELECT doc_id,
                       substr(text, greatest(1, length(text) - 15),
                              16) AS blk,
                       substr(text, 1, 96) AS pre
                FROM corpus WHERE text IS NOT NULL),
            p AS (
                SELECT x.doc_id AS id_a, y.doc_id AS id_b,
                       CAST(levenshtein(x.pre, y.pre) AS BIGINT) AS dist
                FROM b x JOIN b y
                  ON x.blk = y.blk AND x.doc_id < y.doc_id)
            SELECT id_a, id_b, dist FROM p
            WHERE dist <= 24 ORDER BY id_a, id_b
        """,
        # Newman degree assortativity: each edge contributes BOTH
        # orientations, so the two marginals coincide (sy = sx,
        # syy = sxx) and the Pearson closed form reduces to
        # (n·sxy − sx²) / (n·sxx − sx²) — evaluated in DOUBLE with the
        # engine's exact operand order on exact integer moments
        "degree_assortativity": _URL_CANON_CTE + """
            , hx AS (
                SELECT doc_id,
                       NULLIF(lower(regexp_extract(canonical_url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)),
                           '') AS host
                FROM canon),
            e0 AS (
                SELECT a.host AS src, b.host AS dst
                FROM hx a JOIN hx b ON b.doc_id = a.doc_id + 1
                WHERE a.host IS NOT NULL AND b.host IS NOT NULL),
            ce AS (SELECT DISTINCT least(src, dst) AS u,
                          greatest(src, dst) AS v
                   FROM e0 WHERE src <> dst),
            deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
                    FROM (SELECT u AS node FROM ce
                          UNION ALL SELECT v AS node FROM ce)
                    GROUP BY node),
            p AS (SELECT d1.d AS x, d2.d AS y
                  FROM ce JOIN deg d1 ON d1.node = ce.u
                          JOIN deg d2 ON d2.node = ce.v),
            m AS (SELECT CAST(2 * count(*) AS BIGINT) AS n_pairs,
                         CAST(sum(x + y) AS BIGINT) AS sx,
                         CAST(2 * sum(x * y) AS BIGINT) AS sxy,
                         CAST(sum(x * x + y * y) AS BIGINT) AS sxx
                  FROM p),
            r AS (SELECT n_pairs,
                         (CAST(n_pairs AS DOUBLE) * sxy
                          - CAST(sx AS DOUBLE) * sx) AS num,
                         (CAST(n_pairs AS DOUBLE) * sxx
                          - CAST(sx AS DOUBLE) * sx) AS den
                  FROM m)
            SELECT n_pairs,
                   CASE WHEN den > 0
                        THEN CAST(round(1000000 * (num / den))
                                  AS BIGINT)
                        ELSE NULL END AS assortativity_e6
            FROM r WHERE n_pairs > 0
        """,
        # Welch two-sample t on document length per lang pair: exact
        # integer moments, Bessel-corrected variance and the t ratio
        # in DOUBLE with the engine's exact operand order; n<2 or
        # zero-variance pairs yield NULL
        "welch_ttest_chars": """
            WITH d AS (
                SELECT lang, CAST(n_chars AS BIGINT) AS x
                FROM documents
                WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
            m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(x) AS BIGINT) AS sx,
                         CAST(sum(x * x) AS BIGINT) AS sxx
                  FROM d GROUP BY lang),
            p AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
                         a.n AS n_a, b.n AS n_b,
                         CAST(a.sx AS DOUBLE) / a.n AS ma,
                         CAST(b.sx AS DOUBLE) / b.n AS mb,
                         CASE WHEN a.n >= 2 THEN
                             (CAST(a.n AS DOUBLE) * a.sxx
                              - CAST(a.sx AS DOUBLE) * a.sx)
                             / (CAST(a.n AS DOUBLE) * (a.n - 1))
                         END AS va,
                         CASE WHEN b.n >= 2 THEN
                             (CAST(b.n AS DOUBLE) * b.sxx
                              - CAST(b.sx AS DOUBLE) * b.sx)
                             / (CAST(b.n AS DOUBLE) * (b.n - 1))
                         END AS vb
                  FROM m a JOIN m b ON a.lang < b.lang)
            SELECT lang_a, lang_b, n_a, n_b,
                   CASE WHEN n_a >= 2 AND n_b >= 2
                             AND (va / n_a + vb / n_b) > 0
                        THEN CAST(round(1000000 * ((ma - mb)
                                 / sqrt(va / n_a + vb / n_b)))
                                  AS BIGINT)
                        ELSE NULL END AS t_e6
            FROM p ORDER BY lang_a, lang_b
        """,
        # CUSUM changepoint per type: the cumulative deviation stays
        # exact by scaling with the day count (S'_i = D·cum_i − i·T);
        # argmax |S'| with the earliest-day tiebreak
        "cusum_changepoint": """
            WITH c AS (
                SELECT event_type,
                       epoch_us(date_trunc('day', ts)) AS day_us,
                       CAST(count(*) AS BIGINT) AS n
                FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
            t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total,
                         CAST(count(*) AS BIGINT) AS n_days
                  FROM c GROUP BY event_type),
            s AS (SELECT c.event_type, c.day_us, t.total, t.n_days,
                         t.n_days * SUM(c.n) OVER (
                             PARTITION BY c.event_type
                             ORDER BY c.day_us)
                         - (ROW_NUMBER() OVER (
                             PARTITION BY c.event_type
                             ORDER BY c.day_us)) * t.total AS dev
                  FROM c JOIN t
                    ON t.event_type IS NOT DISTINCT FROM c.event_type),
            r AS (SELECT event_type, day_us, total, n_days,
                         CAST(abs(dev) AS BIGINT) AS adev,
                         ROW_NUMBER() OVER (
                             PARTITION BY event_type
                             ORDER BY abs(dev) DESC, day_us) AS rk
                  FROM s)
            SELECT event_type, day_us AS cp_day_us, adev AS cusum_abs,
                   n_days, total
            FROM r WHERE rk = 1 ORDER BY event_type
        """,
        # neighborhood Jaccard: common-neighbor wedge counts via
        # self-join on the center, |A∪B| = d_a + d_b − common, and an
        # ALL-INTEGER e6 round-half-away ((2e6·c + u) // (2u))
        "host_neighbor_jaccard": _URL_CANON_CTE + """
            , hx AS (
                SELECT doc_id,
                       NULLIF(lower(regexp_extract(canonical_url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)),
                           '') AS host
                FROM canon),
            e0 AS (
                SELECT a.host AS src, b.host AS dst
                FROM hx a JOIN hx b ON b.doc_id = a.doc_id + 1
                WHERE a.host IS NOT NULL AND b.host IS NOT NULL),
            ce AS (SELECT DISTINCT least(src, dst) AS u,
                          greatest(src, dst) AS v
                   FROM e0 WHERE src <> dst),
            nb AS (SELECT u AS c, v AS n FROM ce
                   UNION ALL SELECT v AS c, u AS n FROM ce),
            cm AS (SELECT a.n AS host_a, b.n AS host_b,
                          CAST(count(*) AS BIGINT) AS common
                   FROM nb a JOIN nb b
                     ON b.c = a.c AND b.n > a.n
                   GROUP BY 1, 2),
            deg AS (SELECT c AS host, CAST(count(*) AS BIGINT) AS d
                    FROM nb GROUP BY c)
            SELECT cm.host_a, cm.host_b, cm.common,
                   da.d + db.d - cm.common AS union_sz,
                   (2000000 * cm.common
                    + (da.d + db.d - cm.common))
                   // (2 * (da.d + db.d - cm.common)) AS jaccard_e6
            FROM cm JOIN deg da ON da.host = cm.host_a
                    JOIN deg db ON db.host = cm.host_b
            ORDER BY cm.host_a, cm.host_b
        """,
        # 2 unrolled integer-exact HITS iterations over the same host
        # graph as pagerank (scale 1e6, integer renormalise per
        # half-step)
        "hits_hosts": _URL_CANON_CTE + """
            , hx AS (
                SELECT doc_id,
                       NULLIF(lower(regexp_extract(canonical_url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)),
                           '') AS host
                FROM canon),
            nodes AS (SELECT DISTINCT host FROM hx
                      WHERE host IS NOT NULL),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
            e0 AS (
                SELECT a.host AS src, b.host AS dst
                FROM hx a JOIN hx b ON b.doc_id = a.doc_id + 1
                WHERE a.host IS NOT NULL AND b.host IS NOT NULL),
            edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
                      FROM e0 GROUP BY src, dst),
            a0 AS (SELECT host, CAST(1000000 AS BIGINT) AS a
                   FROM nodes),
        """ + _hits_iter_ctes(2) + """
            SELECT n.host, h2.h AS hub, a2.a AS auth
            FROM nodes n JOIN h2 ON h2.host = n.host
            JOIN a2 ON a2.host = n.host
            ORDER BY n.host
        """,
        # co-occurrence Gram matrix: exact integer dots over per-user
        # type-count vectors; the only float is dot / sqrt(qa·qb) in
        # the engine's exact operand order
        "event_type_cosine": """
            WITH c AS (
                SELECT user_id, event_type,
                       CAST(count(*) AS BIGINT) AS c
                FROM events
                WHERE user_id IS NOT NULL AND event_type IS NOT NULL
                GROUP BY 1, 2),
            d AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                         CAST(sum(a.c * b.c) AS BIGINT) AS dot
                  FROM c a JOIN c b
                    ON b.user_id = a.user_id
                   AND b.event_type > a.event_type
                  GROUP BY 1, 2),
            q AS (SELECT event_type, CAST(sum(c * c) AS BIGINT) AS q
                  FROM c GROUP BY event_type)
            SELECT d.type_a, d.type_b, d.dot,
                   CAST(round(1000000 * (CAST(d.dot AS DOUBLE)
                        / sqrt(CAST(qa.q AS DOUBLE) * qb.q)))
                        AS BIGINT) AS cos_e6
            FROM d JOIN q qa ON qa.event_type = d.type_a
                   JOIN q qb ON qb.event_type = d.type_b
            ORDER BY d.type_a, d.type_b
        """,
        # 8 unrolled min-distance rounds from the lexicographic-min
        # host over the undirected host graph; depth NULL beyond 8
        "bfs_depth_hosts": _URL_CANON_CTE + """
            , hx AS (
                SELECT doc_id,
                       NULLIF(lower(regexp_extract(canonical_url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)),
                           '') AS host
                FROM canon),
            nodes AS (SELECT DISTINCT host FROM hx
                      WHERE host IS NOT NULL),
            e0 AS (
                SELECT a.host AS src, b.host AS dst
                FROM hx a JOIN hx b ON b.doc_id = a.doc_id + 1
                WHERE a.host IS NOT NULL AND b.host IS NOT NULL),
            ue AS (SELECT src, dst FROM e0
                   UNION SELECT dst, src FROM e0),
            d0 AS (SELECT host,
                          CASE WHEN host = (SELECT min(host)
                                            FROM nodes)
                               THEN CAST(0 AS BIGINT) END AS d
                   FROM nodes),
        """ + _bfs_iter_ctes(8) + """
            SELECT host, d AS depth FROM d8 ORDER BY host
        """,
        # discrete Gini over docs-per-host counts ranked by (x, host):
        # G = (2·Σi·x − (n+1)·Σx) / (n·Σx), exact ints to one division
        "gini_hosts": _URL_CANON_CTE + """
            , hx AS (
                SELECT doc_id,
                       NULLIF(lower(regexp_extract(canonical_url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)),
                           '') AS host
                FROM canon),
            c AS (SELECT host, CAST(count(*) AS BIGINT) AS x
                  FROM hx WHERE host IS NOT NULL GROUP BY host),
            r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, host) AS i
                  FROM c),
            m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(x) AS BIGINT) AS sx,
                         CAST(sum(i * x) AS BIGINT) AS six
                  FROM r)
            SELECT n AS n_hosts, sx AS total_docs,
                   CASE WHEN sx > 0
                        THEN CAST(round(1000000 *
                                 (CAST(2 * six - (n + 1) * sx
                                       AS DOUBLE)
                                  / (CAST(n AS DOUBLE) * sx)))
                                  AS BIGINT)
                        ELSE NULL END AS gini_e6
            FROM m WHERE n > 0
        """,
        # market-basket pairs: distinct (order, part) baskets,
        # support-ranked top 25 with lift N·c_ab / (c_a·c_b)
        "part_cooccurrence": """
            WITH op AS (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem
                WHERE l_orderkey IS NOT NULL
                  AND l_partkey IS NOT NULL),
            n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders
                  FROM op),
            c AS (SELECT p, CAST(count(*) AS BIGINT) AS cp
                  FROM op GROUP BY p),
            pr AS (SELECT a.p AS part_a, b.p AS part_b,
                          CAST(count(*) AS BIGINT) AS n_both
                   FROM op a JOIN op b
                     ON b.o = a.o AND b.p > a.p
                   GROUP BY 1, 2),
            r AS (SELECT part_a, part_b, n_both,
                         CAST(ROW_NUMBER() OVER (
                             ORDER BY n_both DESC, part_a, part_b)
                             AS BIGINT) AS rk
                  FROM pr)
            SELECT r.part_a, r.part_b, r.n_both,
                   ca.cp AS n_a, cb.cp AS n_b,
                   CAST(round(1000000 *
                        ((CAST((SELECT n_orders FROM n) AS DOUBLE)
                          * r.n_both)
                         / (CAST(ca.cp AS DOUBLE) * cb.cp)))
                        AS BIGINT) AS lift_e6,
                   r.rk
            FROM r JOIN c ca ON ca.p = r.part_a
                   JOIN c cb ON cb.p = r.part_b
            WHERE r.rk <= 25 ORDER BY r.rk
        """,
        # TPC-H-Q1-style: monetary masses as exact int64 sums of
        # per-row e6-rounded expressions (no float-sum order); SQL
        # aggregate-NULL semantics (all-NULL group -> NULL sum)
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(round(1000000 * l_quantity)
                                 AS BIGINT)) AS BIGINT) AS sum_qty_e6,
                   CAST(sum(CAST(round(1000000 * l_extendedprice)
                                 AS BIGINT)) AS BIGINT)
                       AS sum_base_e6,
                   CAST(sum(CAST(round(1000000 *
                            (l_extendedprice * (1 - l_discount)))
                                 AS BIGINT)) AS BIGINT)
                       AS sum_disc_e6,
                   CAST(sum(CAST(round(1000000 *
                            ((l_extendedprice * (1 - l_discount))
                             * (1 + l_tax))) AS BIGINT)) AS BIGINT)
                       AS sum_charge_e6
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        # TPC-H-Q3-style: min market segment (deterministic), 3-way
        # join, per-order e6-int revenue, top 10 (rev DESC, orderkey)
        "shipping_priority": """
            WITH seg AS (SELECT min(c_mktsegment) AS s FROM customer),
            cu AS (SELECT c_custkey FROM customer
                   WHERE c_mktsegment = (SELECT s FROM seg)),
            j AS (SELECT l.l_orderkey, o.o_orderdate,
                         CAST(round(1000000 * (l.l_extendedprice
                              * (1 - l.l_discount))) AS BIGINT) AS rev
                  FROM lineitem l
                  JOIN orders o ON o.o_orderkey = l.l_orderkey
                  JOIN cu ON cu.c_custkey = o.o_custkey
                  WHERE l.l_extendedprice IS NOT NULL
                    AND l.l_discount IS NOT NULL),
            g AS (SELECT l_orderkey, o_orderdate,
                         CAST(sum(rev) AS BIGINT) AS revenue_e6
                  FROM j GROUP BY 1, 2),
            r AS (SELECT l_orderkey, o_orderdate, revenue_e6,
                         CAST(ROW_NUMBER() OVER (
                             ORDER BY revenue_e6 DESC, l_orderkey)
                             AS BIGINT) AS rk
                  FROM g)
            SELECT l_orderkey, o_orderdate, revenue_e6, rk
            FROM r WHERE rk <= 10 ORDER BY rk
        """,
        # column null-rate profile; rate is all-integer round-half-away
        "null_profile": """
            WITH d AS (
                SELECT 'documents' AS tbl, c.col,
                       CAST(count(*) AS BIGINT) AS n_rows,
                       CAST(count(*) - count(CASE c.col
                            WHEN 'doc_id' THEN CAST(doc_id AS VARCHAR)
                            WHEN 'text' THEN text
                            WHEN 'lang' THEN lang
                            WHEN 'source' THEN source
                            WHEN 'n_chars'
                                THEN CAST(n_chars AS VARCHAR)
                            END) AS BIGINT) AS n_null
                FROM documents
                CROSS JOIN (SELECT unnest(['doc_id', 'lang',
                    'n_chars', 'source', 'text']) AS col) c
                GROUP BY c.col
                UNION ALL
                SELECT 'events', c.col,
                       CAST(count(*) AS BIGINT),
                       CAST(count(*) - count(CASE c.col
                            WHEN 'event_id'
                                THEN CAST(event_id AS VARCHAR)
                            WHEN 'ts' THEN CAST(ts AS VARCHAR)
                            WHEN 'user_id'
                                THEN CAST(user_id AS VARCHAR)
                            WHEN 'event_type' THEN event_type
                            WHEN 'value' THEN CAST(value AS VARCHAR)
                            WHEN 'props' THEN props
                            END) AS BIGINT)
                FROM events
                CROSS JOIN (SELECT unnest(['event_id', 'event_type',
                    'props', 'ts', 'user_id', 'value']) AS col) c
                GROUP BY c.col)
            SELECT tbl, col, n_rows, n_null,
                   CASE WHEN n_rows > 0
                        THEN (2000000 * n_null + n_rows)
                             // (2 * n_rows)
                        ELSE CAST(0 AS BIGINT) END AS null_rate_e6
            FROM d ORDER BY tbl, col
        """,
        # Zipf OLS over e6-rounded libm lns of the top-1000 ranks and
        # counts; slope dimensionless (×1e6 at the surface), intercept
        # already in e6 ln units
        "zipf_slope": """
            WITH w AS (
                SELECT unnest(string_split(coalesce(text, ''), ' '))
                    AS word
                FROM documents),
            c AS (SELECT word, CAST(count(*) AS BIGINT) AS n
                  FROM w WHERE word <> '' GROUP BY word),
            r AS (SELECT n, ROW_NUMBER() OVER (
                             ORDER BY n DESC, word ASC) AS rk
                  FROM c QUALIFY rk <= 1000),
            v AS (SELECT CAST(round(1000000 * ln(rk)) AS BIGINT) AS x,
                         CAST(round(1000000 * ln(n)) AS BIGINT) AS y
                  FROM r),
            m AS (SELECT CAST(count(*) AS BIGINT) AS k,
                         CAST(sum(x) AS BIGINT) AS sx,
                         CAST(sum(y) AS BIGINT) AS sy,
                         CAST(sum(x * y) AS BIGINT) AS sxy,
                         CAST(sum(x * x) AS BIGINT) AS sxx
                  FROM v),
            f AS (SELECT k,
                         (CAST(k AS DOUBLE) * sxy
                          - CAST(sx AS DOUBLE) * sy) AS num,
                         (CAST(k AS DOUBLE) * sxx
                          - CAST(sx AS DOUBLE) * sx) AS den,
                         CAST(sx AS DOUBLE) AS sxd,
                         CAST(sy AS DOUBLE) AS syd
                  FROM m)
            SELECT k AS n_words,
                   CAST(round(1000000 * (num / den)) AS BIGINT)
                       AS slope_e6,
                   CAST(round((syd - (num / den) * sxd) / k)
                        AS BIGINT) AS intercept_e6
            FROM f WHERE k >= 2 AND den > 0
        """,
        # two power-iteration rounds with order-free integer
        # accumulation: every cross-element sum is an int64 sum of
        # per-element half-away-rounded products (see the engine
        # docstring); renormalise = one mirrored float division
        "pca_power_component": f"""
            WITH f AS (
                SELECT vec_id,
                       CAST(unnest(embedding) AS DOUBLE) AS x,
                       unnest(range(1, len(embedding) + 1)) AS pos
                FROM embeddings WHERE embedding IS NOT NULL),
            v0 AS (SELECT DISTINCT pos, CAST(1000000 AS BIGINT) AS v
                   FROM f),
            s1 AS (SELECT f.vec_id,
                          CAST(sum({_ihalf('f.x * v0.v')})
                               AS BIGINT) AS s
                   FROM f JOIN v0 ON v0.pos = f.pos
                   GROUP BY f.vec_id),
            w1 AS (SELECT f.pos,
                          CAST(sum({_ihalf('f.x * s1.s')})
                               AS BIGINT) AS w
                   FROM f JOIN s1 ON s1.vec_id = f.vec_id
                   GROUP BY f.pos),
            n1 AS (SELECT CAST(max(abs(w)) AS BIGINT) AS nrm FROM w1),
            v1 AS (SELECT pos,
                          CASE WHEN (SELECT nrm FROM n1) = 0
                               THEN CAST(0 AS BIGINT)
                               ELSE {_ihalf('1000000 * (CAST(w AS DOUBLE) / (SELECT nrm FROM n1))')}
                          END AS v
                   FROM w1),
            s2 AS (SELECT f.vec_id,
                          CAST(sum({_ihalf('f.x * v1.v')})
                               AS BIGINT) AS s
                   FROM f JOIN v1 ON v1.pos = f.pos
                   GROUP BY f.vec_id),
            w2 AS (SELECT f.pos,
                          CAST(sum({_ihalf('f.x * s2.s')})
                               AS BIGINT) AS w
                   FROM f JOIN s2 ON s2.vec_id = f.vec_id
                   GROUP BY f.pos),
            n2 AS (SELECT CAST(max(abs(w)) AS BIGINT) AS nrm FROM w2)
            SELECT pos,
                   CASE WHEN (SELECT nrm FROM n2) = 0
                        THEN CAST(0 AS BIGINT)
                        ELSE {_ihalf('1000000 * (CAST(w AS DOUBLE) / (SELECT nrm FROM n2))')}
                   END AS loading_e6
            FROM w2 ORDER BY pos
        """,
        # 2-D strict-dominance skyline: survives iff no row is >= on
        # both coordinates and > on one; exact duplicates all survive
        "pareto_front_docs": """
            WITH d AS (
                SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
                       CAST(len(list_filter(string_split(text, ' '),
                                            w -> w <> ''))
                            AS BIGINT) AS y
                FROM documents
                WHERE n_chars IS NOT NULL AND text IS NOT NULL)
            SELECT a.doc_id, a.x AS n_chars, a.y AS n_tokens
            FROM d a
            WHERE NOT EXISTS (
                SELECT 1 FROM d b
                WHERE b.x >= a.x AND b.y >= a.y
                  AND (b.x > a.x OR b.y > a.y))
            ORDER BY a.doc_id
        """,
        # add-one-smoothed unigram KL between doc_id-parity halves in
        # exact micro-nats: KL = Σa(ln a − ln b)/A − ln A + ln B with
        # every ln e6-rounded once (the token_entropy convention)
        "kl_unigram_drift": """
            WITH w AS (
                SELECT doc_id % 2 AS side,
                       unnest(string_split(coalesce(text, ''), ' '))
                           AS word
                FROM documents),
            c AS (SELECT side, word, CAST(count(*) AS BIGINT) AS n
                  FROM w WHERE word <> '' GROUP BY 1, 2),
            v AS (SELECT word,
                         CAST(coalesce(max(CASE WHEN side = 0
                                           THEN n END), 0) + 1
                              AS BIGINT) AS a,
                         CAST(coalesce(max(CASE WHEN side = 1
                                           THEN n END), 0) + 1
                              AS BIGINT) AS b
                  FROM c GROUP BY word),
            m AS (SELECT CAST(count(*) AS BIGINT) AS vocab,
                         CAST(sum(a) AS BIGINT) AS sa,
                         CAST(sum(b) AS BIGINT) AS sb,
                         CAST(sum(a *
                              (CAST(round(1000000 * ln(a)) AS BIGINT)
                               - CAST(round(1000000 * ln(b))
                                      AS BIGINT))) AS BIGINT) AS t
                  FROM v)
            SELECT vocab, sa - vocab AS n_p, sb - vocab AS n_q,
                   CAST(round(CAST(t AS DOUBLE) / sa) AS BIGINT)
                   - CAST(round(1000000 * ln(sa)) AS BIGINT)
                   + CAST(round(1000000 * ln(sb)) AS BIGINT) AS kl_e6
            FROM m WHERE vocab > 0
        """,
        # Theil-Sen: discrete median of pairwise slopes, sorted by the
        # mirrored DOUBLE with the (day_a, day_b) tiebreak, element at
        # rank ceil(n/2); single-day types have no pairs
        "theil_sen_trend": """
            WITH c AS (
                SELECT event_type,
                       epoch_us(date_trunc('day', ts))
                           // 86400000000 AS d,
                       CAST(count(*) AS BIGINT) AS n
                FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
            p AS (SELECT a.event_type,
                         (CAST(b.n - a.n AS DOUBLE) / (b.d - a.d))
                             AS slope,
                         a.d AS da, b.d AS db
                  FROM c a JOIN c b
                    ON b.event_type IS NOT DISTINCT FROM a.event_type
                   AND b.d > a.d),
            r AS (SELECT event_type, slope,
                         ROW_NUMBER() OVER (PARTITION BY event_type
                             ORDER BY slope, da, db) AS rn,
                         COUNT(*) OVER (PARTITION BY event_type)
                             AS cnt
                  FROM p)
            SELECT event_type, CAST(cnt AS BIGINT) AS n_pairs,
                   CAST(round(1000000 * slope) AS BIGINT) AS slope_e6
            FROM r WHERE rn = CAST(ceil(cnt / 2.0) AS BIGINT)
            ORDER BY event_type
        """,
        # export-trick oracle (the winnow_verify pattern): the engine
        # exports per-doc (lang, n_raw, n_comp); SQL re-aggregates, so
        # the distributed rollup is SQL-checked and only the zlib
        # codec itself is golden-pinned
        "compression_ratio": f"""
            WITH d AS (
                SELECT lang, n_raw, n_comp
                FROM read_parquet('{q.COMPRESS_ORACLE_DIR}/*.parquet')),
            g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(n_raw) AS BIGINT) AS sum_raw,
                         CAST(sum(n_comp) AS BIGINT) AS sum_comp
                  FROM d GROUP BY lang)
            SELECT lang, n_docs, sum_raw, sum_comp,
                   CASE WHEN sum_raw > 0
                        THEN CAST(round(1000000 *
                                 (CAST(sum_comp AS DOUBLE) / sum_raw))
                                  AS BIGINT)
                        ELSE NULL END AS ratio_e6
            FROM g ORDER BY lang
        """,
        # survivorship: per >=2-member exact-text cluster, min doc_id
        # plus the first non-null field value in doc_id order
        "golden_records": """
            WITH d AS (
                SELECT doc_id, text, lang, source
                FROM documents WHERE text IS NOT NULL
                UNION ALL
                SELECT doc_id + 10000000, text,
                       NULL AS lang, NULL AS source
                FROM documents
                WHERE text IS NOT NULL AND doc_id % 10 = 0),
            g AS (SELECT text, CAST(min(doc_id) AS BIGINT) AS rep_doc,
                         CAST(count(*) AS BIGINT) AS n_dups
                  FROM d GROUP BY text HAVING count(*) >= 2),
            la AS (SELECT text, arg_min(lang, doc_id) AS lang
                   FROM d WHERE lang IS NOT NULL GROUP BY text),
            sa AS (SELECT text, arg_min(source, doc_id) AS source
                   FROM d WHERE source IS NOT NULL GROUP BY text)
            SELECT g.rep_doc, g.n_dups, la.lang, sa.source
            FROM g LEFT JOIN la ON la.text = g.text
                   LEFT JOIN sa ON sa.text = g.text
            ORDER BY g.rep_doc
        """,
        # robust trailing-median anomaly: discrete median window,
        # exact integer deviation, incomplete windows NULL
        "rolling_median_anomaly": """
            WITH e AS (
                SELECT epoch_us(date_trunc('day', ts)) AS day_us,
                       CAST(count(*) AS BIGINT) AS c
                FROM events WHERE ts IS NOT NULL GROUP BY 1),
            w AS (
                SELECT day_us, c,
                       quantile_disc(c, 0.5) OVER win AS med,
                       CAST(count(*) OVER win AS BIGINT) AS cnt
                FROM e
                WINDOW win AS (ORDER BY day_us
                               ROWS BETWEEN 7 PRECEDING
                               AND 1 PRECEDING))
            SELECT make_timestamp(day_us) AS day, c AS n_events,
                   CASE WHEN cnt = 7 THEN med END AS med7,
                   CASE WHEN cnt = 7 THEN c - med END AS dev
            FROM w ORDER BY day
        """,
        # personalized PageRank: teleport (base AND start mass) only
        # on the 3 lexicographic-min hosts; otherwise the pagerank
        # unrolled-CTE machinery verbatim
        "personalized_pagerank": _URL_CANON_CTE + """
            , hx AS (
                SELECT doc_id,
                       NULLIF(lower(regexp_extract(canonical_url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)),
                           '') AS host
                FROM canon),
            nodes AS (SELECT DISTINCT host FROM hx
                      WHERE host IS NOT NULL),
            seeds AS (SELECT host FROM nodes ORDER BY host LIMIT 3),
            e0 AS (
                SELECT a.host AS src, b.host AS dst
                FROM hx a JOIN hx b ON b.doc_id = a.doc_id + 1
                WHERE a.host IS NOT NULL AND b.host IS NOT NULL),
            edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
                      FROM e0 GROUP BY src, dst),
            deg AS (SELECT src, CAST(sum(w) AS BIGINT) AS deg
                    FROM edges GROUP BY src),
            ew AS (SELECT e.src, e.dst, e.w, d.deg
                   FROM edges e JOIN deg d ON d.src = e.src),
            r0 AS (SELECT host,
                          CAST(CASE WHEN host IN (SELECT host
                                                  FROM seeds)
                               THEN 1000000000 ELSE 0 END
                               AS BIGINT) AS r
                   FROM nodes),
        """ + _pagerank_iter_ctes(5, personalized=True) + """
            SELECT n.host,
                   CAST(coalesce(d.deg, 0) AS BIGINT) AS out_deg,
                   r5.r AS rank
            FROM nodes n JOIN r5 ON r5.host = n.host
            LEFT JOIN deg d ON d.src = n.host
            ORDER BY n.host
        """,
        # 30-min same-(user,type) suppression vs the previous RAW
        # event (LAG contract); all-integer kept rate
        "event_throttle_dedup": """
            WITH e AS (
                SELECT event_type, user_id, epoch_us(ts) AS ts_us,
                       event_id
                FROM events
                WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            l AS (SELECT event_type,
                         CASE WHEN lag(ts_us) OVER w IS NULL
                              OR ts_us - lag(ts_us) OVER w
                                 > 1800000000
                              THEN 1 ELSE 0 END AS kept
                  FROM e
                  WINDOW w AS (PARTITION BY user_id, event_type
                               ORDER BY ts_us, event_id))
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
                   CAST(sum(kept) AS BIGINT) AS n_kept,
                   (2000000 * CAST(sum(kept) AS BIGINT)
                    + CAST(count(*) AS BIGINT))
                   // (2 * CAST(count(*) AS BIGINT)) AS kept_rate_e6
            FROM l GROUP BY event_type ORDER BY event_type
        """,
        # exact per-lang PERCENT_RANK of document length; half-away
        # rounding via the explicit floor form (values can land on .5)
        "chars_percent_rank": f"""
            SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
                   {_ihalf("1000000 * percent_rank() OVER ("
                           "PARTITION BY lang ORDER BY n_chars)")}
                       AS pr_e6
            FROM documents WHERE n_chars IS NOT NULL
            ORDER BY doc_id
        """,
        # HHI concentration: exact integer share moments, one mirrored
        # float division per nation
        "supplier_hhi": """
            WITH c AS (
                SELECT n.n_name, l.l_suppkey AS s,
                       CAST(count(*) AS BIGINT) AS c
                FROM lineitem l
                JOIN supplier su ON su.s_suppkey = l.l_suppkey
                JOIN nation n ON n.n_nationkey = su.s_nationkey
                WHERE l.l_suppkey IS NOT NULL
                GROUP BY 1, 2),
            g AS (SELECT n_name,
                         CAST(count(*) AS BIGINT) AS n_suppliers,
                         CAST(sum(c) AS BIGINT) AS n_rows,
                         CAST(sum(c * c) AS BIGINT) AS sq
                  FROM c GROUP BY n_name)
            SELECT n_name, n_suppliers, n_rows,
                   CAST(round(1000000 * (CAST(sq AS DOUBLE)
                        / (CAST(n_rows AS DOUBLE) * n_rows)))
                        AS BIGINT) AS hhi_e6
            FROM g ORDER BY n_name
        """,
        # chained join -> keyed max -> grouped exact selection:
        # fulfillment lag quantiles are actual data values
        "order_fulfillment_lag": """
            WITH ls AS (
                SELECT l_orderkey,
                       CAST(max(epoch_us(l_shipdate) // 86400000000)
                            AS BIGINT) AS ship_day
                FROM lineitem WHERE l_shipdate IS NOT NULL
                GROUP BY 1),
            o AS (SELECT o_orderkey, o_orderpriority,
                         epoch_us(o_orderdate) // 86400000000
                             AS od_day
                  FROM orders WHERE o_orderdate IS NOT NULL),
            l AS (SELECT o.o_orderpriority,
                         ls.ship_day - o.od_day AS lag_days
                  FROM o JOIN ls ON ls.l_orderkey = o.o_orderkey)
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   quantile_disc(lag_days, 0.5) AS p50_days,
                   quantile_disc(lag_days, 0.9) AS p90_days
            FROM l GROUP BY 1 ORDER BY 1
        """,
        # Q5-style snowflake join, same-nation condition, monetary e6
        # ints; region = lexicographic min name
        "region_revenue": """
            WITH reg AS (SELECT r_regionkey FROM region
                         WHERE r_name = (SELECT min(r_name)
                                         FROM region)),
            nat AS (SELECT n_nationkey, n_name FROM nation
                    WHERE n_regionkey = (SELECT r_regionkey
                                         FROM reg)),
            j AS (SELECT n.n_name, o.o_orderkey,
                         CAST(round(1000000 * (l.l_extendedprice
                              * (1 - l.l_discount))) AS BIGINT) AS rev
                  FROM lineitem l
                  JOIN orders o ON o.o_orderkey = l.l_orderkey
                  JOIN customer c ON c.c_custkey = o.o_custkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey
                  JOIN nat n ON n.n_nationkey = c.c_nationkey
                  WHERE s.s_nationkey = c.c_nationkey
                    AND l.l_extendedprice IS NOT NULL
                    AND l.l_discount IS NOT NULL)
            SELECT n_name,
                   CAST(count(DISTINCT o_orderkey) AS BIGINT)
                       AS n_orders,
                   CAST(sum(rev) AS BIGINT) AS revenue_e6
            FROM j GROUP BY n_name ORDER BY n_name
        """,
        # cluster-size histogram over the seeded derived corpus (the
        # golden_records motif)
        "dup_cluster_sizes": """
            WITH corpus AS (
                SELECT text FROM documents WHERE text IS NOT NULL
                UNION ALL
                SELECT text FROM documents
                WHERE text IS NOT NULL AND doc_id % 10 = 0),
            s AS (SELECT text, CAST(count(*) AS BIGINT)
                      AS cluster_size
                  FROM corpus GROUP BY text)
            SELECT cluster_size,
                   CAST(count(*) AS BIGINT) AS n_clusters,
                   CAST(cluster_size * count(*) AS BIGINT) AS n_docs
            FROM s GROUP BY cluster_size ORDER BY cluster_size
        """,
        # vocabulary Gram cosine between langs: exact integer dots via
        # the word self-join, one mirrored float division
        "lang_vocab_cosine": """
            WITH w AS (
                SELECT lang,
                       unnest(string_split(coalesce(text, ''), ' '))
                           AS word
                FROM documents WHERE lang IS NOT NULL),
            c AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS n
                  FROM w WHERE word <> '' GROUP BY 1, 2),
            d AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
                         CAST(sum(a.n * b.n) AS BIGINT) AS dot
                  FROM c a JOIN c b
                    ON b.word = a.word AND b.lang > a.lang
                  GROUP BY 1, 2),
            q AS (SELECT lang, CAST(sum(n * n) AS BIGINT) AS q
                  FROM c GROUP BY lang)
            SELECT d.lang_a, d.lang_b, d.dot,
                   CAST(round(1000000 * (CAST(d.dot AS DOUBLE)
                        / sqrt(CAST(qa.q AS DOUBLE) * qb.q)))
                        AS BIGINT) AS cos_e6
            FROM d JOIN q qa ON qa.lang = d.lang_a
                   JOIN q qb ON qb.lang = d.lang_b
            ORDER BY d.lang_a, d.lang_b
        """,
        # Q22-style NOT EXISTS anti-join + segment rollup; NULL custkey
        # survives; all-NULL-acctbal segment -> NULL sum
        "customers_no_urgent": """
            WITH urgent AS (
                SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'
                  AND o_custkey IS NOT NULL)
            SELECT c.c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(CAST(round(1000000 * c.c_acctbal)
                        AS BIGINT)) AS BIGINT) AS acctbal_e6
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM urgent u
                              WHERE u.o_custkey = c.c_custkey)
            GROUP BY 1 ORDER BY 1
        """,
        # Q7-style bilateral trade matrix: (supp nation, cust nation,
        # ship year) revenue; calendar year() parity; e6 monetary idiom
        "nation_trade_volume": """
            WITH li AS (
                SELECT l_orderkey, l_suppkey,
                       CAST(year(l_shipdate) AS BIGINT) AS l_year,
                       CAST(round(1000000 * (l_extendedprice
                            * (1 - l_discount))) AS BIGINT) AS rev
                FROM lineitem
                WHERE l_shipdate IS NOT NULL
                  AND l_suppkey IS NOT NULL
                  AND l_extendedprice IS NOT NULL
                  AND l_discount IS NOT NULL),
            j AS (SELECT sn.n_name AS supp_nation,
                         cn.n_name AS cust_nation, li.l_year, li.rev
                  FROM li
                  JOIN supplier s ON s.s_suppkey = li.l_suppkey
                  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
                  JOIN orders o ON o.o_orderkey = li.l_orderkey
                  JOIN customer c ON c.c_custkey = o.o_custkey
                  JOIN nation cn ON cn.n_nationkey = c.c_nationkey)
            SELECT supp_nation, cust_nation, l_year,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(rev) AS BIGINT) AS revenue_e6
            FROM j GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        # Q10-style returned-item report: reduce -> join -> reduce ->
        # deterministic top-20 (revenue DESC, custkey ASC)
        "returned_items_report": """
            WITH r AS (
                SELECT l_orderkey,
                       CAST(sum(CAST(round(1000000 * (l_extendedprice
                            * (1 - l_discount))) AS BIGINT))
                            AS BIGINT) AS rev
                FROM lineitem
                WHERE l_returnflag = 'R'
                  AND l_extendedprice IS NOT NULL
                  AND l_discount IS NOT NULL
                GROUP BY 1),
            cr AS (SELECT o.o_custkey AS c_custkey,
                          CAST(count(*) AS BIGINT) AS n_orders,
                          CAST(sum(r.rev) AS BIGINT) AS revenue_e6
                   FROM r JOIN orders o ON o.o_orderkey = r.l_orderkey
                   WHERE o.o_custkey IS NOT NULL
                   GROUP BY 1)
            SELECT cr.c_custkey, cu.c_name, cr.n_orders, cr.revenue_e6
            FROM cr JOIN customer cu ON cu.c_custkey = cr.c_custkey
            ORDER BY cr.revenue_e6 DESC, cr.c_custkey
            LIMIT 20
        """,
        # Q6-style filter-aggregate per ship year; WHERE drops NULL
        # predicates; all-NULL-price year -> NULL revenue
        "forecast_revenue": """
            SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(round(1000000 * (l_extendedprice
                        * l_discount)) AS BIGINT)) AS BIGINT)
                       AS revenue_e6
            FROM lineitem
            WHERE l_shipdate IS NOT NULL
              AND l_discount BETWEEN 0.03 AND 0.07
              AND l_quantity < 25
            GROUP BY 1 ORDER BY 1
        """,
        # Q4-style EXISTS semi-join: orders with a lineitem shipped
        # strictly after the order date, per priority (NULL kept)
        "order_priority_exists": """
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders o
            WHERE o.o_orderkey IS NOT NULL
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate)
            GROUP BY 1 ORDER BY 1
        """,
        # Q12-style conditional census: NULL priority counts in
        # neither CASE branch; NULL returnflag is a kept group
        "returnflag_priority_counts": """
            SELECT l.l_returnflag,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN o.o_orderpriority IN
                        ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                        AS BIGINT) AS high_count,
                   CAST(sum(CASE WHEN o.o_orderpriority IS NOT NULL
                        AND o.o_orderpriority NOT IN
                        ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                        AS BIGINT) AS low_count
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE l.l_orderkey IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        # Q13-style order-count histogram over DISTINCT customer keys
        # (one NULL key = one zero-count group); dangling and NULL
        # o_custkeys excluded
        "customer_order_distribution": """
            WITH cust AS (SELECT DISTINCT c_custkey FROM customer),
            oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
                   FROM orders WHERE o_custkey IS NOT NULL
                   GROUP BY 1),
            per AS (SELECT c.c_custkey,
                           coalesce(oc.n, 0) AS c_count
                    FROM cust c
                    LEFT JOIN oc ON oc.o_custkey = c.c_custkey)
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   CAST(count(*) AS BIGINT) AS n_customers
            FROM per GROUP BY 1 ORDER BY 1
        """,
        # Q14-style promo share per ship year; the integer percent is
        # the SAME formula as the engine ((2e8·promo+total)//(2·total),
        # HUGEINT so the scaled product can't overflow)
        "promo_revenue": """
            WITH j AS (
                SELECT CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                       CAST(round(1000000 * (l.l_extendedprice
                            * (1 - l.l_discount))) AS BIGINT) AS rev,
                       CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END
                           AS is_promo
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                WHERE l.l_shipdate IS NOT NULL
                  AND l.l_extendedprice IS NOT NULL
                  AND l.l_discount IS NOT NULL),
            g AS (SELECT l_year,
                         CAST(count(*) AS BIGINT) AS n_rows,
                         CAST(sum(rev * is_promo) AS BIGINT)
                             AS promo_e6,
                         CAST(sum(rev) AS BIGINT) AS total_e6
                  FROM j GROUP BY 1)
            SELECT l_year, n_rows, promo_e6, total_e6,
                   CASE WHEN total_e6 > 0 THEN CAST(
                       (2 * 100000000 * CAST(promo_e6 AS HUGEINT)
                        + CAST(total_e6 AS HUGEINT))
                       // (2 * CAST(total_e6 AS HUGEINT)) AS BIGINT)
                   END AS promo_pct_e6
            FROM g ORDER BY l_year
        """,
        # Q17-style correlated average, division cleared to the exact
        # integer inequality 5·qty_e6·n_qty < sum_qty_e6
        "small_qty_revenue": """
            WITH b AS (SELECT min(p_brand) AS mb FROM part),
            bp AS (SELECT p_partkey FROM part
                   WHERE p_brand = (SELECT mb FROM b)),
            li AS (SELECT l.l_partkey,
                          CAST(round(1000000 * l.l_quantity)
                               AS BIGINT) AS qty_e6,
                          CAST(round(1000000 * l.l_extendedprice)
                               AS BIGINT) AS price_e6
                   FROM lineitem l
                   JOIN bp ON bp.p_partkey = l.l_partkey),
            st AS (SELECT l_partkey,
                          CAST(sum(qty_e6) AS BIGINT) AS sum_qty,
                          CAST(count(qty_e6) AS BIGINT) AS n_qty
                   FROM li GROUP BY 1),
            f AS (SELECT li.price_e6
                  FROM li JOIN st ON st.l_partkey = li.l_partkey
                  WHERE 5 * li.qty_e6 * st.n_qty < st.sum_qty)
            SELECT (SELECT mb FROM b) AS p_brand,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(price_e6) AS BIGINT) AS revenue_e6
            FROM f GROUP BY 1
        """,
        # Q18-style HAVING join-back: per-order qty mass > 250 units,
        # top 20 by (totalprice DESC NULLS LAST via sentinel, orderkey)
        "large_volume_customers": """
            WITH po AS (
                SELECT l_orderkey,
                       CAST(sum(CAST(round(1000000 * l_quantity)
                            AS BIGINT)) AS BIGINT) AS sum_qty_e6
                FROM lineitem WHERE l_orderkey IS NOT NULL
                GROUP BY 1 HAVING sum_qty_e6 > 250000000),
            j AS (SELECT o.o_orderkey, o.o_custkey AS c_custkey,
                         o.o_orderdate,
                         CAST(round(1000000 * o.o_totalprice)
                              AS BIGINT) AS totalprice_e6,
                         po.sum_qty_e6
                  FROM po JOIN orders o
                      ON o.o_orderkey = po.l_orderkey
                  WHERE o.o_custkey IS NOT NULL
                    AND o.o_custkey IN
                        (SELECT DISTINCT c_custkey FROM customer
                         WHERE c_custkey IS NOT NULL)),
            r AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY
                      coalesce(totalprice_e6, -4611686018427387904)
                      DESC, o_orderkey) AS BIGINT) AS rk
                  FROM j)
            SELECT r.o_orderkey, r.c_custkey, cu.c_name,
                   r.o_orderdate, r.totalprice_e6, r.sum_qty_e6, r.rk
            FROM r JOIN customer cu ON cu.c_custkey = r.c_custkey
            WHERE r.rk <= 20 ORDER BY r.rk
        """,
        # Q19-style OR-of-conjunctions, rolled up per FIRST matching
        # branch (CASE priority); NaN/NULL quantities fail every band
        "disjunctive_revenue": """
            WITH j AS (
                SELECT CASE
                    WHEN p.p_type = 'PROMO'
                         AND l.l_quantity BETWEEN 1 AND 11
                         AND p.p_size BETWEEN 1 AND 15 THEN 1
                    WHEN p.p_type = 'SMALL'
                         AND l.l_quantity BETWEEN 10 AND 20
                         AND p.p_size BETWEEN 1 AND 30 THEN 2
                    WHEN p.p_brand = 'Brand#12'
                         AND l.l_quantity >= 20
                         AND p.p_size BETWEEN 1 AND 50 THEN 3
                    ELSE 0 END AS branch,
                       CAST(round(1000000 * (l.l_extendedprice
                            * (1 - l.l_discount))) AS BIGINT) AS rev
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey)
            SELECT CAST(branch AS BIGINT) AS branch,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(rev) AS BIGINT) AS revenue_e6
            FROM j WHERE branch > 0
            GROUP BY 1 ORDER BY 1
        """,
        # Mann-Whitney doubled-U from the (lang, length) histogram:
        # ties contribute their half exactly, all-integer
        "mannwhitney_chars": """
            WITH h AS (
                SELECT lang, CAST(n_chars AS BIGINT) AS v,
                       CAST(count(*) AS BIGINT) AS n
                FROM documents
                WHERE lang IS NOT NULL AND n_chars IS NOT NULL
                GROUP BY 1, 2),
            p AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
                         CAST(sum(CASE WHEN a.v > b.v
                                       THEN 2 * a.n * b.n
                                       WHEN a.v = b.v THEN a.n * b.n
                                       ELSE 0 END) AS BIGINT) AS u2
                  FROM h a JOIN h b ON a.lang < b.lang
                  GROUP BY 1, 2),
            c AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nn
                  FROM h GROUP BY 1)
            SELECT p.lang_a, p.lang_b, ca.nn AS n_a, cb.nn AS n_b,
                   p.u2
            FROM p JOIN c ca ON ca.lang = p.lang_a
                   JOIN c cb ON cb.lang = p.lang_b
            ORDER BY 1, 2
        """,
        # Benford census: digit from the e6-int price's decimal
        # string (the engine's integer magnitude divide is identical);
        # integer half-away observed share; libm log10 reference
        "benford_totalprice": """
            WITH t AS (
                SELECT CAST(round(1000000 * o_totalprice) AS BIGINT)
                    AS tp
                FROM orders
                WHERE o_totalprice IS NOT NULL
                  AND round(1000000 * o_totalprice) > 0),
            g AS (SELECT CAST(substr(CAST(tp AS VARCHAR), 1, 1)
                              AS BIGINT) AS digit,
                         CAST(count(*) AS BIGINT) AS n
                  FROM t GROUP BY 1),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM g)
            SELECT g.digit, g.n,
                   CAST((2000000 * g.n + tot.nn) // (2 * tot.nn)
                        AS BIGINT) AS obs_pct_e6,
                   CAST(round(1000000 * log10(1 + 1.0 / g.digit))
                        AS BIGINT) AS benford_e6
            FROM g, tot ORDER BY g.digit
        """,
        # lag-1 autocorrelation of daily counts per type: exact
        # integer moments over consecutive-day pairs; the Pearson
        # closed form shares the corr_chars_tokens operand order
        "daily_autocorr": """
            WITH d AS (
                SELECT event_type,
                       epoch_us(date_trunc('day', ts))
                           // 86400000000 AS day_i,
                       CAST(count(*) AS BIGINT) AS n
                FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
            p AS (SELECT a.event_type, a.n AS x, b.n AS y
                  FROM d a JOIN d b
                    ON b.event_type IS NOT DISTINCT FROM a.event_type
                   AND b.day_i = a.day_i + 1),
            m AS (SELECT event_type,
                         CAST(count(*) AS BIGINT) AS n_pairs,
                         CAST(sum(x) AS BIGINT) AS sx,
                         CAST(sum(y) AS BIGINT) AS sy,
                         CAST(sum(x * y) AS BIGINT) AS sxy,
                         CAST(sum(x * x) AS BIGINT) AS sxx,
                         CAST(sum(y * y) AS BIGINT) AS syy
                  FROM p GROUP BY 1),
            r AS (SELECT event_type, n_pairs,
                         (CAST(n_pairs AS DOUBLE) * sxy
                          - CAST(sx AS DOUBLE) * sy) AS num,
                         (CAST(n_pairs AS DOUBLE) * sxx
                          - CAST(sx AS DOUBLE) * sx)
                         * (CAST(n_pairs AS DOUBLE) * syy
                            - CAST(sy AS DOUBLE) * sy) AS v2
                  FROM m)
            SELECT event_type, n_pairs,
                   CASE WHEN v2 > 0
                        THEN CAST(round(1000000 * (num / sqrt(v2)))
                                  AS BIGINT)
                        ELSE NULL END AS corr_e6
            FROM r ORDER BY event_type
        """,
        # char-class composition: single-char RE2 classes count
        # identically in Arrow and DuckDB; codepoint length totals
        "charclass_profile": """
            WITH d AS (
                SELECT lang,
                       CAST(length(text) AS BIGINT) AS total,
                       CAST(length(regexp_replace(text, '[^A-Za-z]',
                            '', 'g')) AS BIGINT) AS alpha,
                       CAST(length(regexp_replace(text, '[^0-9]', '',
                            'g')) AS BIGINT) AS digit,
                       CAST(len(regexp_extract_all(text, '\\s'))
                            AS BIGINT) AS space
                FROM documents WHERE text IS NOT NULL)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(total) AS BIGINT) AS n_chars,
                   CAST(sum(alpha) AS BIGINT) AS n_alpha,
                   CAST(sum(digit) AS BIGINT) AS n_digit,
                   CAST(sum(space) AS BIGINT) AS n_space,
                   CAST(sum(total - alpha - digit - space) AS BIGINT)
                       AS n_other
            FROM d GROUP BY 1 ORDER BY 1
        """,
        # readability raw counts: whitespace-split words (the
        # corr_chars_tokens convention), sentence terminators, vowel
        # RUNS via RE2 + quantifier on both sides
        "readability_counts": """
            WITH d AS (
                SELECT lang,
                       CAST(len(list_filter(string_split(text, ' '),
                            w -> w <> '')) AS BIGINT) AS words,
                       CAST(len(regexp_extract_all(text, '[.!?]'))
                            AS BIGINT) AS sents,
                       CAST(len(regexp_extract_all(text,
                            '[aeiouAEIOU]+')) AS BIGINT) AS vgrp
                FROM documents WHERE text IS NOT NULL)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(words) AS BIGINT) AS n_words,
                   CAST(sum(sents) AS BIGINT) AS n_sentences,
                   CAST(sum(vgrp) AS BIGINT) AS n_vowel_groups
            FROM d GROUP BY 1 ORDER BY 1
        """,
        # hour × weekday heatmap: pure integer epoch arithmetic —
        # day floor, Thursday offset, non-negative remainders
        "event_heatmap": """
            WITH d AS (
                SELECT epoch_us(date_trunc('day', ts))
                           // 86400000000 AS day_i,
                       epoch_us(ts) AS us
                FROM events WHERE ts IS NOT NULL)
            SELECT CAST(((day_i + 4) % 7 + 7) % 7 AS BIGINT) AS dow,
                   CAST((us - day_i * 86400000000) // 3600000000
                        AS BIGINT) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM d GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # Q15-style top supplier(s): ties all surface (= max parity)
        "top_supplier": """
            WITH r AS (
                SELECT l_suppkey AS s_suppkey,
                       CAST(sum(CAST(round(1000000 * (l_extendedprice
                            * (1 - l_discount))) AS BIGINT))
                            AS BIGINT) AS total_rev_e6
                FROM lineitem
                WHERE l_suppkey IS NOT NULL
                  AND l_extendedprice IS NOT NULL
                  AND l_discount IS NOT NULL
                GROUP BY 1),
            mx AS (SELECT max(total_rev_e6) AS m FROM r)
            SELECT r.s_suppkey, s.s_name, r.total_rev_e6
            FROM r JOIN supplier s ON s.s_suppkey = r.s_suppkey, mx
            WHERE r.total_rev_e6 = mx.m
            ORDER BY r.s_suppkey
        """,
        # int8 scalar quantization: identical IEEE operand order makes
        # the per-element e6 errors bit-equal; integer sums order-free
        "embedding_quantize": """
            WITH f AS (
                SELECT vec_id, label,
                       CAST(unnest(embedding) AS DOUBLE) AS x,
                       unnest(range(1, len(embedding) + 1)) AS pos
                FROM embeddings WHERE embedding IS NOT NULL),
            mm AS (SELECT pos, min(x) AS mn, max(x) AS mx
                   FROM f GROUP BY 1),
            c AS (SELECT f.vec_id, f.label, f.x, mm.mn, mm.mx,
                         CASE WHEN mm.mx > mm.mn
                              THEN round((254 * (f.x - mm.mn))
                                         / (mm.mx - mm.mn)) - 127
                              ELSE 0 END AS code
                  FROM f JOIN mm ON mm.pos = f.pos),
            e AS (SELECT vec_id, label, abs(code) AS ac,
                         CASE WHEN mx > mn
                              THEN round(1000000 * ((x - (mn
                                   + ((code + 127) * (mx - mn))
                                   / 254)) * (x - (mn + ((code + 127)
                                   * (mx - mn)) / 254))))
                              ELSE 0 END AS err
                  FROM c)
            SELECT label,
                   CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
                   CAST(sum(err) AS BIGINT) AS sum_err_e6,
                   CAST(sum(ac) AS BIGINT) AS sum_abs_code
            FROM e GROUP BY 1 ORDER BY 1
        """,
        # grouped argmax: longest doc per lang, MIN-doc_id tie-break
        "longest_doc_per_lang": """
            WITH d AS (
                SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
                       CAST(n_chars AS BIGINT) AS n_chars
                FROM documents WHERE n_chars IS NOT NULL),
            r AS (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY lang
                      ORDER BY n_chars DESC, doc_id) AS rk
                  FROM d)
            SELECT lang, doc_id, n_chars FROM r WHERE rk = 1
            ORDER BY lang
        """,
        # banded temporal self-join census: ordered same-user pairs
        # within one hour, grouped by type pair (NULL types kept)
        "type_cooccurrence_1h": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS us, event_id,
                       event_type
                FROM events
                WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            p AS (SELECT a.event_type AS type_a,
                         b.event_type AS type_b
                  FROM e a JOIN e b ON b.user_id = a.user_id
                   AND (b.us > a.us
                        OR (b.us = a.us AND b.event_id > a.event_id))
                   AND b.us <= a.us + 3600000000)
            SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n
            FROM p GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # Q8-style market share: MIN region's customers, MIN nation's
        # suppliers, exact integer half-away share per ship year
        "market_share": """
            WITH r AS (SELECT min(r_name) AS rm FROM region),
            rn AS (SELECT n_nationkey, n_name FROM nation
                   WHERE n_regionkey IN
                       (SELECT r_regionkey FROM region
                        WHERE r_name = (SELECT rm FROM r))),
            nm AS (SELECT min(n_name) AS nn FROM rn),
            cu AS (SELECT c_custkey FROM customer
                   WHERE c_custkey IS NOT NULL
                     AND c_nationkey IN
                         (SELECT n_nationkey FROM rn)),
            s AS (SELECT s_suppkey,
                         CASE WHEN s_nationkey IN
                             (SELECT n_nationkey FROM rn
                              WHERE n_name = (SELECT nn FROM nm))
                         THEN 1 ELSE 0 END AS is_nation
                  FROM supplier
                  WHERE s_suppkey IS NOT NULL
                    AND s_nationkey IS NOT NULL),
            li AS (SELECT l_orderkey, l_suppkey,
                          CAST(year(l_shipdate) AS BIGINT) AS l_year,
                          CAST(round(1000000 * (l_extendedprice
                               * (1 - l_discount))) AS BIGINT) AS rev
                   FROM lineitem
                   WHERE l_shipdate IS NOT NULL
                     AND l_suppkey IS NOT NULL
                     AND l_extendedprice IS NOT NULL
                     AND l_discount IS NOT NULL),
            j AS (SELECT li.l_year, li.rev,
                         li.rev * s.is_nation AS nrev
                  FROM li
                  JOIN s ON s.s_suppkey = li.l_suppkey
                  JOIN orders o ON o.o_orderkey = li.l_orderkey
                  JOIN cu ON cu.c_custkey = o.o_custkey),
            g AS (SELECT l_year, CAST(count(*) AS BIGINT) AS n_rows,
                         CAST(sum(nrev) AS BIGINT) AS nation_e6,
                         CAST(sum(rev) AS BIGINT) AS total_e6
                  FROM j GROUP BY 1)
            SELECT l_year, n_rows, nation_e6, total_e6,
                   CASE WHEN total_e6 > 0 THEN CAST(
                       (2 * 1000000 * CAST(nation_e6 AS HUGEINT)
                        + CAST(total_e6 AS HUGEINT))
                       // (2 * CAST(total_e6 AS HUGEINT)) AS BIGINT)
                   END AS share_e6
            FROM g ORDER BY l_year
        """,
        # quality-priority near-dup representatives: recursive-CTE CC
        # over the exported pair set; perturbed lengths closed-form
        "cluster_representatives": "WITH RECURSIVE "
        + _lsh_pair_ctes(q.CLUSTER_REP_ORACLE_DIR) + """,
            edges AS (
                SELECT id_a AS a, id_b AS b FROM verified
                UNION
                SELECT id_b, id_a FROM verified),
            reach(node, lbl) AS (
                SELECT a, a FROM edges
                UNION
                SELECT e.b, r.lbl
                FROM reach r JOIN edges e ON e.a = r.node
                WHERE r.lbl < e.b),
            minlbl AS (SELECT node, min(lbl) AS lbl
                       FROM reach GROUP BY node),
            corpus AS (
                SELECT doc_id,
                       CAST(length(coalesce(text, '')) AS BIGINT)
                           AS qlen
                FROM documents
                UNION ALL
                SELECT doc_id + 10000000,
                       CAST(CASE WHEN doc_id % 50 = 0
                                 THEN length(coalesce(text, ''))
                                 WHEN position(' ' IN
                                     coalesce(text, '')) > 0
                                 THEN length(coalesce(text, ''))
                                     - position(' ' IN
                                       coalesce(text, '')) + 5
                                 ELSE 4 END AS BIGINT)
                FROM documents WHERE doc_id % 10 = 0),
            mem AS (SELECT m.node, m.lbl, c.qlen
                    FROM minlbl m
                    JOIN corpus c ON c.doc_id = m.node),
            rr AS (SELECT lbl, node, qlen, ROW_NUMBER() OVER (
                       PARTITION BY lbl
                       ORDER BY qlen DESC, node) AS rk
                   FROM mem),
            sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS n_members
                   FROM mem GROUP BY lbl)
            SELECT rr.lbl AS cluster, rr.node AS rep_doc,
                   rr.qlen AS rep_len, sz.n_members
            FROM rr JOIN sz ON sz.lbl = rr.lbl
            WHERE rr.rk = 1 ORDER BY rr.lbl""",
        # ordered string aggregation: top-3 words per lang in exact
        # (count DESC, word ASC) rank order
        "top_words_concat": """
            WITH w AS (
                SELECT lang,
                       unnest(list_filter(string_split(text, ' '),
                              x -> x <> '')) AS word
                FROM documents WHERE text IS NOT NULL),
            c AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS n
                  FROM w GROUP BY 1, 2),
            r AS (SELECT lang, word, n, ROW_NUMBER() OVER (
                      PARTITION BY lang
                      ORDER BY n DESC, word) AS rk
                  FROM c)
            SELECT lang,
                   string_agg(word, ',' ORDER BY rk) AS top_words,
                   CAST(sum(n) AS BIGINT) AS top_n
            FROM r WHERE rk <= 3 GROUP BY lang ORDER BY lang
        """,
        # per-host URL structure: slash depth past scheme+host, query
        # incidence; NULL canonical urls excluded (NULL source policy)
        "url_depth_profile": _URL_CANON_CTE + """
            SELECT NULLIF(lower(regexp_extract(canonical_url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)),
                   '') AS host,
                   CAST(count(*) AS BIGINT) AS n_urls,
                   CAST(sum(length(regexp_replace(canonical_url,
                        '[^/]', '', 'g')) - 2) AS BIGINT) AS sum_depth,
                   CAST(sum(CASE WHEN canonical_url LIKE '%?%'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_query
            FROM canon WHERE canonical_url IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        # boilerplate incidence per source: paragraph_dedup derivation,
        # global-recurrence tag, integer half-away rate
        "boilerplate_rate_by_source": """
            WITH d AS (
                SELECT source, text, length(text) AS l
                FROM documents WHERE text IS NOT NULL),
            j AS (SELECT source,
                         substr(text, 1, l // 2) || chr(10)
                         || substr(text, l // 2 + 1) AS t2
                  FROM d),
            p AS (SELECT source,
                         unnest(string_split(t2, chr(10))) AS para
                  FROM j),
            g AS (SELECT para, source, CAST(count(*) AS BIGINT) AS n
                  FROM p GROUP BY 1, 2),
            gl AS (SELECT para, CAST(sum(n) AS BIGINT) AS n_glob
                   FROM g GROUP BY 1),
            r AS (SELECT g.source, g.n,
                         CASE WHEN gl.n_glob > 1 THEN g.n
                              ELSE 0 END AS nb
                  FROM g JOIN gl ON gl.para = g.para),
            s AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_paras,
                         CAST(sum(nb) AS BIGINT) AS n_boiler
                  FROM r GROUP BY 1)
            SELECT source, n_paras, n_boiler,
                   CASE WHEN n_paras > 0 THEN CAST(
                       (2 * 1000000 * CAST(n_boiler AS HUGEINT)
                        + CAST(n_paras AS HUGEINT))
                       // (2 * CAST(n_paras AS HUGEINT)) AS BIGINT)
                   ELSE CAST(0 AS BIGINT) END AS boiler_rate_e6
            FROM s ORDER BY source
        """,
        # exact half-life EWMA over the trailing 30-day window: the
        # recurrence closes to an integer numerator over 2^29
        "ewma_daily": """
            WITH d AS (
                SELECT event_type,
                       epoch_us(date_trunc('day', ts))
                           // 86400000000 AS day_i,
                       CAST(count(*) AS BIGINT) AS n
                FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
            mx AS (SELECT event_type, max(day_i) AS mday
                   FROM d GROUP BY 1),
            w AS (SELECT d.event_type, d.n,
                         CAST(d.day_i - (mx.mday - 29) AS BIGINT)
                             AS off
                  FROM d JOIN mx
                    ON mx.event_type IS NOT DISTINCT FROM d.event_type
                  WHERE d.day_i >= mx.mday - 29),
            s AS (SELECT event_type,
                         CAST(count(*) AS BIGINT) AS n_days,
                         CAST(sum(n * (CASE WHEN off = 0 THEN 1
                              ELSE (CAST(1 AS BIGINT) << (off - 1))
                              END)) AS BIGINT) AS num
                  FROM w GROUP BY 1)
            SELECT event_type, n_days, num,
                   CAST((2 * 1000000 * CAST(num AS HUGEINT)
                         + 536870912)
                        // (2 * CAST(536870912 AS HUGEINT))
                        AS BIGINT) AS ewma_e6
            FROM s ORDER BY event_type
        """,
        # method-agreement report: both pair sets recomputed from the
        # engines' own exports; zero-pair methods emit no row
        "dedup_method_overlap": "WITH "
        + _lsh_pair_ctes(q.OVL_MH_DIR) + f""",
            shs AS (SELECT * FROM
                    read_parquet('{q.OVL_SH_DIR}/*.parquet')),
            sp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                   FROM shs a JOIN shs b ON a.doc_id < b.doc_id
                   WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
            mp AS (SELECT id_a, id_b FROM verified),
            tb AS (SELECT m.id_a FROM mp m JOIN sp s
                       ON s.id_a = m.id_a AND s.id_b = m.id_b),
            u AS (
                SELECT 'minhash' AS method,
                       CAST(count(*) AS BIGINT) AS n_pairs,
                       (SELECT CAST(count(*) AS BIGINT) FROM tb)
                           AS n_both
                FROM mp HAVING count(*) > 0
                UNION ALL
                SELECT 'simhash', CAST(count(*) AS BIGINT),
                       (SELECT CAST(count(*) AS BIGINT) FROM tb)
                FROM sp HAVING count(*) > 0)
            SELECT method, n_pairs, n_both FROM u ORDER BY method""",
        # tag-against-group-aggregate: exact quantile_disc median,
        # NULL-safe group join, vectorized three-way census
        "docs_above_lang_median": """
            WITH d AS (SELECT lang, n_chars FROM documents
                       WHERE n_chars IS NOT NULL),
            m AS (SELECT lang, quantile_disc(n_chars, 0.5) AS med
                  FROM d GROUP BY 1)
            SELECT d.lang, CAST(m.med AS BIGINT) AS med,
                   CAST(sum(CASE WHEN d.n_chars > m.med
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
                   CAST(sum(CASE WHEN d.n_chars = m.med
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
                   CAST(sum(CASE WHEN d.n_chars < m.med
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_below
            FROM d JOIN m ON m.lang IS NOT DISTINCT FROM d.lang
            GROUP BY 1, 2 ORDER BY 1
        """,
        # sweep-line interval count: +1/-1 deltas, dense calendar span,
        # cumulative window sum
        "order_backlog_daily": """
            WITH e AS (
                SELECT l_orderkey,
                       max(epoch_us(date_trunc('day', l_shipdate))
                           // 86400000000) AS end_day
                FROM lineitem
                WHERE l_orderkey IS NOT NULL
                  AND l_shipdate IS NOT NULL
                GROUP BY 1),
            o AS (SELECT o_orderkey,
                         epoch_us(date_trunc('day', o_orderdate))
                             // 86400000000 AS start_day
                  FROM orders
                  WHERE o_orderkey IS NOT NULL
                    AND o_orderdate IS NOT NULL),
            iv AS (SELECT o.start_day AS s,
                          greatest(o.start_day, e.end_day) AS t
                   FROM o JOIN e ON e.l_orderkey = o.o_orderkey),
            d AS (SELECT day_i, CAST(sum(delta) AS BIGINT) AS delta
                  FROM (SELECT s AS day_i, 1 AS delta FROM iv
                        UNION ALL
                        SELECT t + 1, -1 FROM iv) u
                  GROUP BY 1),
            bounds AS (SELECT min(s) AS lo, max(t) AS hi FROM iv),
            days AS (SELECT unnest(range(lo, hi + 1)) AS day_i
                     FROM bounds)
            SELECT CAST(days.day_i AS BIGINT) AS day_i,
                   CAST(sum(coalesce(d.delta, 0)) OVER (
                       ORDER BY days.day_i
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_open
            FROM days LEFT JOIN d USING (day_i) ORDER BY day_i
        """,
        # per-lang OLS calibration line: exact integer moments, shared
        # closed-form operand order (the corr_chars_tokens convention)
        "tokens_per_char_ols": """
            WITH d AS (
                SELECT lang, CAST(n_chars AS BIGINT) AS x,
                       CAST(len(list_filter(string_split(text, ' '),
                                            w -> w <> '')) AS BIGINT)
                           AS y
                FROM documents
                WHERE n_chars IS NOT NULL AND text IS NOT NULL),
            m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_pairs,
                         CAST(sum(x) AS BIGINT) AS sx,
                         CAST(sum(y) AS BIGINT) AS sy,
                         CAST(sum(x * y) AS BIGINT) AS sxy,
                         CAST(sum(x * x) AS BIGINT) AS sxx
                  FROM d GROUP BY lang),
            r AS (SELECT lang, n_pairs,
                         (CAST(n_pairs AS DOUBLE) * sxy
                          - CAST(sx AS DOUBLE) * sy) AS num,
                         (CAST(n_pairs AS DOUBLE) * sxx
                          - CAST(sx AS DOUBLE) * sx) AS den,
                         CAST(sy AS DOUBLE) AS syd,
                         CAST(sx AS DOUBLE) AS sxd,
                         CAST(n_pairs AS DOUBLE) AS nd
                  FROM m)
            SELECT lang, n_pairs,
                   CASE WHEN den > 0
                        THEN CAST(round(1000000 * (num / den))
                                  AS BIGINT) END AS slope_e6,
                   CASE WHEN den > 0
                        THEN CAST(round(1000000 * ((syd
                             - (num / den) * sxd) / nd)) AS BIGINT)
                   END AS intercept_e6
            FROM r ORDER BY lang
        """,
        # stacked quality gates: NULL text/n_chars fail gate 1
        "quality_funnel": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN text IS NOT NULL
                        AND n_chars >= 100 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_len_ok,
                   CAST(sum(CASE WHEN text IS NOT NULL
                        AND n_chars >= 100
                        AND len(regexp_extract_all(text, '[.!?]')) > 0
                        THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_sentence_ok,
                   CAST(sum(CASE WHEN text IS NOT NULL
                        AND n_chars >= 100
                        AND len(regexp_extract_all(text, '[.!?]')) > 0
                        AND len(list_filter(string_split(text, ' '),
                                w -> w <> '')) >= 20
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_tokens_ok
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        # order-3 sequence mining: LAG×2 inside the user partition,
        # row-counter guard so a NULL STATE stays distinct from "no
        # previous event"; engine sentinel sorts first -> NULLS FIRST
        "top_event_trigrams": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS us, event_id,
                       event_type
                FROM events
                WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            l AS (SELECT event_type AS t3,
                         LAG(event_type, 1) OVER w AS t2,
                         LAG(event_type, 2) OVER w AS t1,
                         ROW_NUMBER() OVER w AS rn
                  FROM e WINDOW w AS (PARTITION BY user_id
                                      ORDER BY us, event_id)),
            g AS (SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
                  FROM l WHERE rn >= 3 GROUP BY 1, 2, 3),
            r AS (SELECT t1, t2, t3, n, CAST(ROW_NUMBER() OVER (
                      ORDER BY n DESC, t1 ASC NULLS FIRST,
                               t2 ASC NULLS FIRST, t3 ASC NULLS FIRST)
                      AS BIGINT) AS rk
                  FROM g)
            SELECT t1, t2, t3, n, rk FROM r WHERE rk <= 5
            ORDER BY rk
        """,
        # month-grain rollup: calendar year()/month() parity, e6
        # masses with aggregate-NULL parity
        "monthly_revenue": """
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(month(o_orderdate) AS BIGINT) AS o_month,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(round(1000000 * o_totalprice)
                        AS BIGINT)) AS BIGINT) AS revenue_e6
            FROM orders WHERE o_orderdate IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # per-customer first->last order span, 30-day bands
        "customer_lifetime_span": """
            WITH p AS (
                SELECT o_custkey,
                       min(epoch_us(date_trunc('day', o_orderdate))
                           // 86400000000) AS lo,
                       max(epoch_us(date_trunc('day', o_orderdate))
                           // 86400000000) AS hi
                FROM orders
                WHERE o_custkey IS NOT NULL
                  AND o_orderdate IS NOT NULL
                GROUP BY 1)
            SELECT CAST((hi - lo) // 30 AS BIGINT) AS span_band,
                   CAST(count(*) AS BIGINT) AS n_customers
            FROM p GROUP BY 1 ORDER BY 1
        """,
        # directed-edge reciprocity over the shared host graph (self-
        # loops excluded; weights ignored — set property)
        "host_reciprocity": _URL_CANON_CTE + """
            , hx AS (
                SELECT doc_id,
                       NULLIF(lower(regexp_extract(canonical_url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)),
                           '') AS host
                FROM canon),
            e0 AS (
                SELECT DISTINCT a.host AS src, b.host AS dst
                FROM hx a JOIN hx b ON b.doc_id = a.doc_id + 1
                WHERE a.host IS NOT NULL AND b.host IS NOT NULL
                  AND a.host <> b.host),
            s AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
                         CAST(sum(CASE WHEN EXISTS (
                             SELECT 1 FROM e0 r
                             WHERE r.src = e0.dst
                               AND r.dst = e0.src)
                             THEN 1 ELSE 0 END) AS BIGINT)
                             AS n_reciprocal
                  FROM e0)
            SELECT n_edges, n_reciprocal,
                   CAST((2 * 1000000 * CAST(n_reciprocal AS HUGEINT)
                         + CAST(n_edges AS HUGEINT))
                        // (2 * CAST(n_edges AS HUGEINT)) AS BIGINT)
                       AS reciprocity_e6
            FROM s WHERE n_edges > 0
        """,
        # robots/deny-list motif: 5 smallest canonical urls truncated
        # to 30 code points; blocked = ANY prefix match
        "url_prefix_blocklist": _URL_CANON_CTE + """
            , cu AS (SELECT canonical_url AS u FROM canon
                     WHERE canonical_url IS NOT NULL),
            low AS (SELECT DISTINCT substr(u, 1, 30) AS p
                    FROM (SELECT u FROM cu ORDER BY u LIMIT 5)),
            t AS (SELECT NULLIF(lower(regexp_extract(u,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)),
                       '') AS host,
                         CASE WHEN EXISTS (SELECT 1 FROM low
                              WHERE starts_with(cu.u, low.p))
                         THEN 1 ELSE 0 END AS blocked
                  FROM cu)
            SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
                   CAST(sum(blocked) AS BIGINT) AS n_blocked
            FROM t GROUP BY 1 ORDER BY 1
        """,
        # survival curve from ONE export: same candidates, exact
        # Jaccards, three vectorized threshold counts
        "dedup_threshold_curve": "WITH "
        + _lsh_pair_ctes(q.THRESH_CURVE_ORACLE_DIR) + """,
            jv AS (SELECT CAST(coalesce(i.i, 0) AS DOUBLE)
                          / (na.n + nb.n - coalesce(i.i, 0)) AS j
                   FROM cand c
                   JOIN sizes na ON na.doc = c.id_a
                   JOIN sizes nb ON nb.doc = c.id_b
                   LEFT JOIN inter i ON i.id_a = c.id_a
                        AND i.id_b = c.id_b),
            jv05 AS (SELECT j FROM jv WHERE j >= 0.5),
            t AS (SELECT unnest([50, 70, 90]) AS th)
            SELECT CAST(t.th AS BIGINT) AS threshold_e2,
                   CAST(sum(CASE WHEN jv05.j >= t.th / 100.0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
            FROM t, jv05 GROUP BY 1 ORDER BY 1""",
        # gaps-and-islands on doc ids: the ROW_NUMBER grouping trick,
        # 5 longest islands + island count
        "doc_id_islands": """
            WITH d AS (SELECT DISTINCT doc_id FROM documents
                       WHERE doc_id IS NOT NULL),
            r AS (SELECT doc_id, doc_id - ROW_NUMBER() OVER (
                      ORDER BY doc_id) AS grp FROM d),
            i AS (SELECT min(doc_id) AS island_start,
                         max(doc_id) AS island_end,
                         CAST(max(doc_id) - min(doc_id) + 1 AS BIGINT)
                             AS island_len
                  FROM r GROUP BY grp),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n_islands FROM i),
            rr AS (SELECT i.*, CAST(ROW_NUMBER() OVER (
                       ORDER BY island_len DESC, island_start)
                       AS BIGINT) AS rk FROM i)
            SELECT CAST(island_start AS BIGINT) AS island_start,
                   CAST(island_end AS BIGINT) AS island_end,
                   island_len, n.n_islands, rk
            FROM rr, n WHERE rk <= 5 ORDER BY rk
        """,
        # Tukey fences on exact quartiles; NULL-safe group join
        "value_iqr_outliers": """
            WITH d AS (SELECT event_type, value FROM events
                       WHERE value IS NOT NULL),
            qs AS (SELECT event_type,
                          quantile_disc(value, 0.25) AS q1,
                          quantile_disc(value, 0.75) AS q3
                   FROM d GROUP BY 1)
            SELECT d.event_type, qs.q1, qs.q3,
                   CAST(sum(CASE WHEN d.value
                        < qs.q1 - 1.5 * (qs.q3 - qs.q1)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
                   CAST(sum(CASE WHEN d.value
                        > qs.q3 + 1.5 * (qs.q3 - qs.q1)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_above
            FROM d JOIN qs
              ON qs.event_type IS NOT DISTINCT FROM d.event_type
            GROUP BY 1, 2, 3 ORDER BY 1
        """,
        # MERGE INTO (SCD-1): delete wins over update, NULL-propagating
        # concat on updates, inserts ride a union
        "apply_upserts": """
            WITH b AS (SELECT doc_id, lang, text FROM documents),
            d AS (SELECT doc_id,
                         CASE WHEN doc_id % 13 = 0 THEN 'D'
                              ELSE 'U' END AS op,
                         CASE WHEN doc_id % 13 = 0 THEN NULL
                              ELSE 'rev2 ' || text END AS new_text
                  FROM documents
                  WHERE doc_id IS NOT NULL
                    AND (doc_id % 13 = 0 OR doc_id % 9 = 0)),
            m AS (SELECT b.lang,
                         CASE WHEN d.op = 'U' THEN d.new_text
                              ELSE b.text END AS final,
                         CASE WHEN d.op = 'U' THEN 1 ELSE 0 END
                             AS upd,
                         d.op
                  FROM b LEFT JOIN d ON d.doc_id = b.doc_id),
            kept AS (SELECT lang, final, upd, 0 AS ins FROM m
                     WHERE op IS DISTINCT FROM 'D'),
            ins AS (SELECT lang, text AS final, 0 AS upd, 1 AS ins
                    FROM documents
                    WHERE doc_id IS NOT NULL AND doc_id % 17 = 0),
            u AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(upd) AS BIGINT) AS n_updated,
                   CAST(sum(ins) AS BIGINT) AS n_inserted,
                   CAST(sum(length(coalesce(final, ''))) AS BIGINT)
                       AS sum_chars
            FROM u GROUP BY 1 ORDER BY 1
        """,
        # N50 host concentration: cumulative window over the host grid
        "host_n50": _URL_CANON_CTE + """
            , hx AS (
                SELECT NULLIF(lower(regexp_extract(canonical_url,
                    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)), '')
                    AS host
                FROM canon),
            hc AS (SELECT host, CAST(count(*) AS BIGINT) AS n_docs
                   FROM hx WHERE host IS NOT NULL GROUP BY 1),
            ranked AS (SELECT n_docs,
                              ROW_NUMBER() OVER (
                                  ORDER BY n_docs DESC, host) AS rk,
                              SUM(n_docs) OVER (
                                  ORDER BY n_docs DESC, host
                                  ROWS UNBOUNDED PRECEDING) AS cum
                       FROM hc),
            tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t,
                           CAST(count(*) AS BIGINT) AS nh FROM hc)
            SELECT tot.nh AS n_hosts, tot.t AS total_docs,
                   CAST(min(ranked.rk) AS BIGINT) AS n50
            FROM ranked, tot WHERE 2 * ranked.cum >= tot.t
            GROUP BY 1, 2
        """,
        # word-length distribution per lang (code-point lengths)
        "token_length_histogram": """
            WITH w AS (
                SELECT lang,
                       unnest(list_filter(string_split(text, ' '),
                              x -> x <> '')) AS word
                FROM documents WHERE text IS NOT NULL)
            SELECT lang, CAST(length(word) AS BIGINT) AS word_len,
                   CAST(count(*) AS BIGINT) AS n
            FROM w GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # session entry/exit matrix: 30-min gap islands, boundary
        # types by rank; NULL types are genuine states
        "session_entry_exit": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS us, event_id,
                       event_type
                FROM events
                WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            l AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
                       OR us - LAG(us) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS brk
                  FROM e WINDOW w AS (PARTITION BY user_id
                                      ORDER BY us, event_id)),
            s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
                      ORDER BY us, event_id
                      ROWS UNBOUNDED PRECEDING) AS sid
                  FROM l),
            f AS (SELECT user_id, sid, event_type,
                         ROW_NUMBER() OVER (PARTITION BY user_id, sid
                             ORDER BY us, event_id) AS rf,
                         ROW_NUMBER() OVER (PARTITION BY user_id, sid
                             ORDER BY us DESC, event_id DESC) AS rl
                  FROM s),
            g AS (SELECT user_id, sid,
                         max(CASE WHEN rf = 1 THEN event_type END)
                             AS entry_type,
                         max(CASE WHEN rl = 1 THEN event_type END)
                             AS exit_type
                  FROM f GROUP BY 1, 2)
            SELECT entry_type, exit_type,
                   CAST(count(*) AS BIGINT) AS n_sessions
            FROM g GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # per-user value LAG volatility rolled up per later-event type
        "value_volatility": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS us, event_id,
                       event_type, value
                FROM events
                WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            l AS (SELECT event_type, value,
                         LAG(value) OVER (PARTITION BY user_id
                             ORDER BY us, event_id) AS pv
                  FROM e),
            d AS (SELECT event_type,
                         CAST(round(1000000 * abs(value - pv))
                              AS BIGINT) AS ad
                  FROM l
                  WHERE value IS NOT NULL AND pv IS NOT NULL)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_steps,
                   CAST(sum(ad) AS BIGINT) AS sum_absdiff_e6
            FROM d GROUP BY 1 ORDER BY 1
        """,
        # new-vs-returning daily actives: first-day tag on distinct
        # (user, day) pairs
        "returning_share_daily": """
            WITH p AS (
                SELECT DISTINCT user_id,
                       epoch_us(date_trunc('day', ts))
                           // 86400000000 AS day_i
                FROM events
                WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            f AS (SELECT user_id, min(day_i) AS first_day
                  FROM p GROUP BY 1)
            SELECT CAST(p.day_i AS BIGINT) AS day_i,
                   CAST(sum(CASE WHEN p.day_i = f.first_day
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
                   CAST(sum(CASE WHEN p.day_i <> f.first_day
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_returning
            FROM p JOIN f ON f.user_id = p.user_id
            GROUP BY 1 ORDER BY 1
        """,
        # one-row executive summary; integer half-away rates
        "corpus_report": """
            WITH s AS (
                SELECT CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(count(DISTINCT lang) AS BIGINT)
                           AS n_langs,
                       CAST(count(DISTINCT source) AS BIGINT)
                           AS n_sources,
                       CAST(sum(n_chars) AS BIGINT) AS total_chars,
                       CAST(count(*) - count(text) AS BIGINT)
                           AS n_null,
                       CAST(count(DISTINCT text) AS BIGINT)
                           AS n_distinct,
                       CAST(count(text) AS BIGINT) AS n_text
                FROM documents)
            SELECT n_docs, n_langs, n_sources, total_chars,
                   CAST((2000000 * n_null + n_docs) // (2 * n_docs)
                        AS BIGINT) AS null_text_rate_e6,
                   CASE WHEN n_text > 0 THEN CAST(
                       (2000000 * n_distinct + n_text) // (2 * n_text)
                       AS BIGINT) ELSE CAST(0 AS BIGINT) END
                       AS distinct_text_rate_e6
            FROM s WHERE n_docs > 0
        """,
        # lang-mix entropy per source: the token_entropy e6-quantized
        # ln convention (integer inner sum, one float closed form)
        "source_lang_entropy": """
            WITH c AS (SELECT source, lang,
                              CAST(count(*) AS BIGINT) AS n
                       FROM documents GROUP BY 1, 2),
            s AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
                         CAST(count(*) AS BIGINT) AS n_langs,
                         CAST(sum(n * CAST(round(1000000 * ln(n))
                              AS BIGINT)) AS BIGINT) AS s
                  FROM c GROUP BY 1)
            SELECT source, n_docs, n_langs,
                   CAST(round(1000000 * ln(n_docs)
                              - CAST(s AS DOUBLE) / n_docs)
                        AS BIGINT) AS entropy_e6
            FROM s ORDER BY source
        """,
        # longest silent stretch per type between first and last
        # active day; single-day types report 0
        "max_silence_days": """
            WITH d AS (SELECT DISTINCT event_type,
                              epoch_us(date_trunc('day', ts))
                                  // 86400000000 AS day_i
                       FROM events WHERE ts IS NOT NULL),
            l AS (SELECT event_type, day_i,
                         LAG(day_i) OVER (PARTITION BY event_type
                             ORDER BY day_i) AS prev
                  FROM d)
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_days_active,
                   CAST(coalesce(max(day_i - prev - 1), 0) AS BIGINT)
                       AS max_gap_days
            FROM l GROUP BY 1 ORDER BY 1
        """,
        # leave-one-out 1-NN label agreement; zero vectors excluded,
        # self excluded before ranking, NULL-label NULL-safe agree
        "knn_label_agreement": """
            WITH v AS (
                SELECT vec_id, label,
                       CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings
                WHERE len(list_filter(CAST(embedding AS DOUBLE[]),
                          x -> x <> 0)) > 0),
            p AS (SELECT a.vec_id, a.label AS la, b.vec_id AS nb,
                         b.label AS lb,
                         list_cosine_similarity(a.e, b.e) AS s
                  FROM v a JOIN v b ON b.vec_id <> a.vec_id),
            r AS (SELECT vec_id, la, lb, ROW_NUMBER() OVER (
                      PARTITION BY vec_id ORDER BY s DESC, nb) AS rk
                  FROM p)
            SELECT la AS label, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN lb IS NOT DISTINCT FROM la
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
            FROM r WHERE rk = 1 GROUP BY 1 ORDER BY 1
        """,
        # weekday ANOVA eta²: per-group terms e6-quantized to ints
        # (order-free), integer half-away final ratio
        "dow_anova": """
            WITH d AS (
                SELECT epoch_us(date_trunc('day', ts))
                           // 86400000000 AS day_i,
                       CAST(count(*) AS BIGINT) AS n
                FROM events WHERE ts IS NOT NULL GROUP BY 1),
            g AS (SELECT ((day_i + 4) % 7 + 7) % 7 AS dow,
                         CAST(count(*) AS BIGINT) AS cnt,
                         CAST(sum(n) AS BIGINT) AS s
                  FROM d GROUP BY 1),
            t AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
                         CAST(sum(n) AS BIGINT) AS s_all,
                         CAST(sum(n * n) AS BIGINT) AS ss_all
                  FROM d),
            q AS (SELECT CAST(sum(CAST(round(1000000
                       * (CAST(s AS DOUBLE) * s / cnt)) AS BIGINT))
                       AS BIGINT) AS ssb_q
                  FROM g),
            f AS (SELECT t.n_days, t.s_all,
                         1000000 * t.ss_all
                         - CAST(round(1000000 * (CAST(t.s_all
                               AS DOUBLE) * t.s_all / t.n_days))
                               AS BIGINT) AS sst_i,
                         greatest(q.ssb_q - CAST(round(1000000
                             * (CAST(t.s_all AS DOUBLE) * t.s_all
                                / t.n_days)) AS BIGINT),
                             0) AS num
                  FROM t, q)
            SELECT n_days, s_all AS n_events,
                   CASE WHEN sst_i > 0 THEN CAST(
                       (2 * 1000000 * CAST(num AS HUGEINT)
                        + CAST(sst_i AS HUGEINT))
                       // (2 * CAST(sst_i AS HUGEINT)) AS BIGINT)
                   END AS eta2_e6
            FROM f WHERE n_days > 0
        """,
        # per-customer OLS slope SIGN census, all-integer with the
        # globally-rebased day index
        "customer_trend_census": """
            WITH o AS (
                SELECT o_custkey AS c,
                       epoch_us(date_trunc('day', o_orderdate))
                           // 86400000000 AS day_i,
                       CAST(round(1000000 * o_totalprice) AS BIGINT)
                           AS y
                FROM orders
                WHERE o_custkey IS NOT NULL
                  AND o_orderdate IS NOT NULL
                  AND o_totalprice IS NOT NULL),
            g0 AS (SELECT min(day_i) AS gmin FROM o),
            m AS (SELECT c, CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(day_i - g0.gmin) AS BIGINT) AS sx,
                         CAST(sum(y) AS BIGINT) AS sy,
                         CAST(sum((day_i - g0.gmin) * y) AS BIGINT)
                             AS sxy
                  FROM o, g0 GROUP BY 1),
            t AS (SELECT CASE WHEN n < 2 THEN 'single'
                              WHEN n * sxy - sx * sy > 0 THEN 'up'
                              WHEN n * sxy - sx * sy < 0 THEN 'down'
                              ELSE 'flat' END AS trend
                  FROM m)
            SELECT trend, CAST(count(*) AS BIGINT) AS n_customers
            FROM t GROUP BY 1 ORDER BY 1
        """,
        # whale concentration: ceil(n/100) ranked (rev DESC, custkey),
        # integer half-away share
        "revenue_top1pct_share": """
            WITH po AS (
                SELECT l_orderkey,
                       CAST(sum(CAST(round(1000000 * (l_extendedprice
                            * (1 - l_discount))) AS BIGINT))
                            AS BIGINT) AS rev
                FROM lineitem
                WHERE l_orderkey IS NOT NULL
                  AND l_extendedprice IS NOT NULL
                  AND l_discount IS NOT NULL
                GROUP BY 1),
            pc0 AS (SELECT o.o_custkey AS c,
                           CAST(sum(po.rev) AS BIGINT) AS rev
                    FROM po JOIN orders o
                        ON o.o_orderkey = po.l_orderkey
                    WHERE o.o_custkey IS NOT NULL GROUP BY 1),
            t AS (SELECT CAST(count(*) AS BIGINT) AS n_customers,
                         CAST(sum(rev) AS BIGINT) AS total,
                         CAST((count(*) + 99) // 100 AS BIGINT) AS k
                  FROM pc0),
            r AS (SELECT rev, ROW_NUMBER() OVER (
                      ORDER BY rev DESC, c) AS rk FROM pc0),
            topr AS (SELECT CAST(sum(r.rev) AS BIGINT) AS top_rev
                     FROM r, t WHERE r.rk <= t.k)
            SELECT t.n_customers, t.k AS top_k,
                   topr.top_rev AS top_rev_e6,
                   t.total AS total_rev_e6,
                   CAST((2 * 1000000 * CAST(topr.top_rev AS HUGEINT)
                         + CAST(t.total AS HUGEINT))
                        // (2 * CAST(t.total AS HUGEINT)) AS BIGINT)
                       AS share_e6
            FROM t, topr WHERE t.total > 0
        """,
        # conversion latency: first purchase strictly after the first
        # signup in (ts, id) order; quantile_disc ranks
        "signup_to_purchase_latency": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS us, event_id,
                       event_type
                FROM events
                WHERE ts IS NOT NULL AND user_id IS NOT NULL
                  AND event_type IN ('signup', 'purchase')),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY us, event_id) AS rn FROM e),
            s AS (SELECT user_id, min(rn) AS srn FROM r
                  WHERE event_type = 'signup' GROUP BY 1),
            p AS (SELECT r.user_id, min(r.rn) AS prn
                  FROM r JOIN s ON s.user_id = r.user_id
                  WHERE r.event_type = 'purchase' AND r.rn > s.srn
                  GROUP BY 1),
            l AS (SELECT rp.us - rs.us AS lat
                  FROM p
                  JOIN s ON s.user_id = p.user_id
                  JOIN r rp ON rp.user_id = p.user_id
                      AND rp.rn = p.prn
                  JOIN r rs ON rs.user_id = p.user_id
                      AND rs.rn = s.srn)
            SELECT CAST(count(*) AS BIGINT) AS n_converted,
                   CAST(quantile_disc(lat, 0.5) AS BIGINT) AS p50_us,
                   CAST(quantile_disc(lat, 0.9) AS BIGINT) AS p90_us
            FROM l HAVING count(*) > 0
        """,
        # order fan-out profile
        "order_size_histogram": """
            WITH c AS (SELECT l_orderkey,
                              CAST(count(*) AS BIGINT) AS n_items
                       FROM lineitem WHERE l_orderkey IS NOT NULL
                       GROUP BY 1)
            SELECT n_items, CAST(count(*) AS BIGINT) AS n_orders
            FROM c GROUP BY 1 ORDER BY 1
        """,
        # volume-discount curve: integer band on the e6 quantity
        "discount_by_qty_band": """
            SELECT CAST(round(1000000 * l_quantity) AS BIGINT)
                       // 10000000 AS qty_band,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(round(1000000 * l_discount)
                        AS BIGINT)) AS BIGINT) AS disc_e6
            FROM lineitem WHERE l_quantity IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        # Kaplan-Meier over user lifetimes: censored = active on the
        # corpus's final observed day; n_risk = duration >= t (DESC running
        # sum); survival = EXP(SUM(LN(1-d/n)) OVER (ORDER BY t)) after
        # the deaths>0 WHERE (same associativity as the engine cumsum)
        "km_user_survival": """
            WITH e AS (SELECT user_id,
                              epoch_us(date_trunc('day', ts))
                                  // 86400000000 AS day_i
                       FROM events
                       WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            u AS (SELECT user_id, min(day_i) AS fd, max(day_i) AS ld
                  FROM e GROUP BY 1),
            lif AS (SELECT ld - fd AS dur,
                           ((SELECT max(day_i) FROM e) - ld) >= 1
                               AS dead
                    FROM u),
            g AS (SELECT dur,
                         CAST(count(*) FILTER (WHERE dead) AS BIGINT)
                             AS n_deaths,
                         CAST(count(*) AS BIGINT) AS ending
                  FROM lif GROUP BY 1),
            r AS (SELECT dur, n_deaths,
                         SUM(ending) OVER (ORDER BY dur DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS n_risk
                  FROM g)
            SELECT CAST(dur AS BIGINT) AS duration_days,
                   CAST(n_risk AS BIGINT) AS n_risk,
                   n_deaths,
                   EXP(SUM(LN(1.0 - CAST(n_deaths AS DOUBLE) / n_risk))
                       OVER (ORDER BY dur)) AS survival
            FROM r WHERE n_deaths > 0 ORDER BY duration_days
        """,
        # RANK() semantics: ties at the k-th length are all kept;
        # NULL n_chars rows are peers ordered last (DuckDB default)
        "topk_with_ties": """
            WITH r AS (SELECT lang, doc_id, n_chars,
                              RANK() OVER (PARTITION BY lang
                                  ORDER BY n_chars DESC) AS rk
                       FROM documents)
            SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(rk AS BIGINT) AS rk
            FROM r WHERE rk <= 10
            ORDER BY lang NULLS LAST, rk, doc_id
        """,
        # lower weighted median: smallest price whose cumulative
        # INTEGER quantity weight reaches half the flag's total
        "weighted_median_price": """
            WITH g AS (SELECT l_returnflag, l_extendedprice AS price,
                              CAST(sum(CAST(l_quantity AS BIGINT))
                                   AS BIGINT) AS wt
                       FROM lineitem
                       WHERE l_extendedprice IS NOT NULL
                         AND l_quantity IS NOT NULL
                       GROUP BY 1, 2),
            t AS (SELECT l_returnflag,
                         CAST(sum(wt) AS BIGINT) AS wtotal
                  FROM g GROUP BY 1),
            c AS (SELECT l_returnflag, price,
                         SUM(wt) OVER (PARTITION BY l_returnflag
                             ORDER BY price
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cw
                  FROM g)
            SELECT c.l_returnflag, min(price) AS wmedian,
                   any_value(t.wtotal) AS wtotal
            FROM c JOIN t ON c.l_returnflag
                     IS NOT DISTINCT FROM t.l_returnflag
            WHERE 2 * cw >= t.wtotal
            GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
        # positional phrase search: docs containing each query phrase
        # as a CONSECUTIVE token run + total occurrences; tokenisation
        # = the word_frequencies convention; never-occurring phrases
        # absent on both sides
        "phrase_search": """
            WITH toks AS (
                SELECT list_filter(string_split(coalesce(text, ''), ' '),
                                   x -> x <> '') AS l,
                       row_number() OVER () AS rid
                FROM documents),
            g2 AS (SELECT rid, l[i.i] || ' ' || l[i.i + 1] AS ph
                   FROM toks,
                        LATERAL (SELECT unnest(range(1, len(l))) AS i) i),
            g3 AS (SELECT rid,
                          l[i.i] || ' ' || l[i.i + 1] || ' '
                              || l[i.i + 2] AS ph
                   FROM toks,
                        LATERAL (SELECT unnest(range(1, len(l) - 1))
                                     AS i) i),
            hits AS (
                SELECT ph AS phrase, rid FROM g2
                WHERE ph IN ('order fast', 'window join')
                UNION ALL
                SELECT ph, rid FROM g3
                WHERE ph IN ('big order scan', 'quux phrase absent'))
            SELECT phrase,
                   CAST(count(DISTINCT rid) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_hits
            FROM hits GROUP BY phrase ORDER BY phrase
        """,
        # proximity histogram: per-doc MIN token distance between each
        # term pair, counted per gap; docs containing only one term
        # contribute nothing (inner-join semantics)
        "term_proximity": """
            WITH toks AS (
                SELECT row_number() OVER () AS rid,
                       list_filter(string_split(coalesce(text, ''), ' '),
                                   x -> x <> '') AS l
                FROM documents),
            pos AS (SELECT rid, unnest(l) AS w,
                           generate_subscripts(l, 1) AS p
                    FROM toks),
            pairs(term_a, term_b) AS (VALUES ('order', 'join'),
                                             ('data', 'spark'),
                                             ('quux', 'absent')),
            md AS (SELECT pr.term_a, pr.term_b, a.rid,
                          CAST(min(abs(a.p - b.p)) AS BIGINT) AS gap
                   FROM pairs pr
                   JOIN pos a ON a.w = pr.term_a
                   JOIN pos b ON b.w = pr.term_b AND b.rid = a.rid
                   GROUP BY 1, 2, 3)
            SELECT term_a, term_b, gap,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM md GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        # skip-window collocations: words within +-3 positions of the
        # target, counted per (target occurrence, neighbor position)
        # pair; target may neighbor itself; (n DESC, word) tie-break
        "window_collocations": """
            WITH toks AS (
                SELECT row_number() OVER () AS rid,
                       list_filter(string_split(coalesce(text, ''), ' '),
                                   x -> x <> '') AS l
                FROM documents),
            pos AS (SELECT rid, unnest(l) AS w,
                           generate_subscripts(l, 1) AS p
                    FROM toks),
            tgt AS (SELECT rid, p FROM pos WHERE w = 'order'),
            nb AS (SELECT n.w FROM tgt t
                   JOIN pos n ON n.rid = t.rid
                             AND abs(n.p - t.p) <= 3 AND n.p <> t.p),
            cnt AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS n
                    FROM nb GROUP BY w)
            SELECT word, n, rk FROM (
                SELECT word, n,
                       row_number() OVER (ORDER BY n DESC, word) AS rk
                FROM cnt)
            WHERE rk <= 20 ORDER BY rk
        """,
        # calendar-grid gap fill: full day grid between first and last
        # active day, missing days linearly interpolated between
        # nearest observed neighbours as ONE rational expression over
        # exact integers (identical operand order as the engine)
        "gap_fill_daily": """
            WITH d AS (SELECT (epoch_us(ts)
                               - ((epoch_us(ts) % 86400000000)
                                  + 86400000000) % 86400000000)
                              // 86400000000 AS day_i,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events WHERE ts IS NOT NULL GROUP BY 1),
            bounds AS (SELECT min(day_i) AS lo, max(day_i) AS hi FROM d),
            grid AS (SELECT unnest(range(lo, hi + 1)) AS day_i
                     FROM bounds),
            j AS (SELECT g.day_i, d.n
                  FROM grid g LEFT JOIN d ON g.day_i = d.day_i),
            f AS (SELECT day_i, n,
                         last_value(CASE WHEN n IS NOT NULL
                                         THEN day_i END IGNORE NULLS)
                             OVER (ORDER BY day_i
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS pd,
                         last_value(n IGNORE NULLS)
                             OVER (ORDER BY day_i
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS pn,
                         first_value(CASE WHEN n IS NOT NULL
                                          THEN day_i END IGNORE NULLS)
                             OVER (ORDER BY day_i
                                   ROWS BETWEEN CURRENT ROW
                                   AND UNBOUNDED FOLLOWING) AS nd,
                         first_value(n IGNORE NULLS)
                             OVER (ORDER BY day_i
                                   ROWS BETWEEN CURRENT ROW
                                   AND UNBOUNDED FOLLOWING) AS nn
                  FROM j)
            SELECT day_i,
                   CAST(coalesce(n, 0) AS BIGINT) AS n_obs,
                   CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END
                        AS BIGINT) AS filled,
                   CAST(CASE WHEN n IS NOT NULL THEN 1000000 * n
                             ELSE CAST(round(1000000.0
                                             * (pn * (nd - day_i)
                                                + nn * (day_i - pd))
                                             / (nd - pd)) AS BIGINT)
                        END AS BIGINT) AS value_e6
            FROM f ORDER BY day_i
        """,
        # interval-union engagement: 30-min windows per event, union
        # length per (user, type) via the fixed-L gap telescoping
        # (first event contributes L, each next min(gap, L)), rolled
        # up per type; NULL user/ts excluded, NULL type kept
        "activity_coverage": """
            WITH e AS (SELECT user_id, event_type,
                              epoch_us(ts) AS ts_us,
                              lag(epoch_us(ts)) OVER (
                                  PARTITION BY user_id, event_type
                                  ORDER BY epoch_us(ts), event_id)
                                  AS prev
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            u AS (SELECT user_id, event_type,
                         CAST(sum(CASE WHEN prev IS NULL
                                       THEN 1800000000
                                       ELSE least(ts_us - prev,
                                                  1800000000)
                                  END) AS BIGINT) AS covered_us
                  FROM e GROUP BY 1, 2)
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(covered_us) AS BIGINT) AS covered_us
            FROM u GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
        # sweep-line peak: max simultaneously-open 30-min windows per
        # type; at equal t a close precedes an open (half-open windows,
        # ORDER BY t, d); NULL ts excluded, NULL type kept
        "peak_concurrency": """
            WITH b AS (
                SELECT event_type, epoch_us(ts) AS t, 1 AS d
                FROM events WHERE ts IS NOT NULL
                UNION ALL
                SELECT event_type, epoch_us(ts) + 1800000000, -1
                FROM events WHERE ts IS NOT NULL),
            c AS (SELECT event_type,
                         sum(d) OVER (PARTITION BY event_type
                                      ORDER BY t, d
                                      ROWS UNBOUNDED PRECEDING) AS open
                  FROM b)
            SELECT event_type, CAST(max(open) AS BIGINT) AS peak
            FROM c GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
    }
