"""Validation run configuration.

The reference exposes its knobs as Nextflow params with defaults
(``/root/reference/main.nf:16-20``) and per-process resources/containers
(``nextflow.config:8-23``).  The engine analog is one dataclass: which
checks run, their thresholds, and per-stage Ray sizing.

Threshold semantics copy the reference's tri-level scoring exactly
(``bin/analyze_joss.py:42-49``: scores GOOD=1.0 / OK=0.7 /
NEEDS_IMPROVEMENT=0.3 / none=0.0; ``:48-49``: pass-rate thresholds
GOOD>=0.9, OK>=0.7) applied per (partition, check) pass rate.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# reference: analyze_joss.py:42-49
SCORE_GOOD = 1.0
SCORE_OK = 0.7
SCORE_NEEDS_IMPROVEMENT = 0.3
SCORE_NONE = 0.0
PASS_RATE_GOOD = 0.9
PASS_RATE_OK = 0.7

ROW_CHECKS = (
    "presence_url",
    "presence_warc_ts",
    "presence_html",
    "presence_text",
    "presence_lang",
    "url_format",
    "extraction",
    "referential_lang",
)
SHUFFLE_CHECKS = ("uniqueness_url",)
PROFILE_CHECKS = ("drift_text_len", "drift_html_len", "drift_null_rate")
# opt-in row checks (not in the default suite, so default pipeline output
# is stable across versions)
OPTIONAL_ROW_CHECKS = ("text_min_len",)

DEFAULT_VALID_LANGS = ("en", "de", "fr", "es", "zh")

# Fixed histogram edges for text length (chars).  Constant edges make the
# drift statistics (KS / PSI) bit-deterministic across any block layout.
TEXT_LEN_HIST_EDGES = tuple(float(x) for x in range(0, 2049, 32))
# html byte length runs larger than text char length (markup overhead)
HTML_LEN_HIST_EDGES = tuple(float(x) for x in range(0, 8193, 128))


@dataclass
class ValidationConfig:
    # which checks run (reference: params toggles, main.nf:16-20)
    checks: tuple = ROW_CHECKS + SHUFFLE_CHECKS + PROFILE_CHECKS
    url_regex: str = r"^https?://[^/\s]+/.+$"
    valid_langs: tuple = DEFAULT_VALID_LANGS

    # tri-level scoring thresholds (analyze_joss.py:48-49)
    pass_rate_good: float = PASS_RATE_GOOD
    pass_rate_ok: float = PASS_RATE_OK

    # drift thresholds (applied to deterministic fixed-bin histograms)
    ks_ok: float = 0.05      # ks <  ks_ok            -> good
    ks_fail: float = 0.15    # ks >= ks_fail          -> FAIL verdict
    psi_ok: float = 0.10
    psi_fail: float = 0.25
    # null-rate drift: max per-column |rate - reference rate|
    null_drift_ok: float = 0.02
    null_drift_fail: float = 0.10

    # Ray sizing (reference analog: per-process cpus/containers).
    # check_concurrency None -> autoscale the actor pool to the cluster's
    # CPU count at run time (resolved in pipelines.validate).
    batch_size: int = 8192          # ~7 MB of html per batch; fewer, larger partials
    check_concurrency: tuple | int | None = None
    uniqueness_batch_size: int = 131072  # url+lang only -> narrow columns, big batches
    # "sort" (default): retry-safe sorted-candidate exchange;
    # "index": sharded counter actors (faster, but a retried map task
    # double-counts — see stages/uniqueness.py docstring)
    uniqueness_strategy: str = "sort"
    min_text_len: int = 200         # threshold for the opt-in text_min_len check
    hll_p: int = 12                 # 4 KiB partials, ~1.6% distinct error
    tdigest_compression: float = 200.0
    quantile_sketch: str = "tdigest"  # or "kll" (both mergeable; reported-only)

    # violation severity per check (default "error")
    severities: dict = field(default_factory=dict)

    def severity(self, check: str) -> str:
        return self.severities.get(check, "error")


KNOWN_CHECKS = frozenset(
    ROW_CHECKS + SHUFFLE_CHECKS + PROFILE_CHECKS + OPTIONAL_ROW_CHECKS
)


def validate_check_names(checks) -> None:
    """Fail fast on unknown check names (main.nf:49-59 analog) — a typo'd
    check would otherwise silently produce PASS verdicts."""
    unknown = sorted(set(checks) - KNOWN_CHECKS)
    if unknown:
        raise ValueError(
            f"unknown check name(s) {unknown}; known checks: {sorted(KNOWN_CHECKS)}"
        )


def tri_level(pass_rate: float, n_rows: int, cfg: ValidationConfig) -> tuple[str, float]:
    """(status, score) per the reference's threshold scorer
    (analyze_joss.py:302-345): zero evaluated rows -> unknown/0.0."""
    if n_rows == 0:
        return "unknown", SCORE_NONE
    if pass_rate >= cfg.pass_rate_good:
        return "good", SCORE_GOOD
    if pass_rate >= cfg.pass_rate_ok:
        return "ok", SCORE_OK
    return "needs_improvement", SCORE_NEEDS_IMPROVEMENT
