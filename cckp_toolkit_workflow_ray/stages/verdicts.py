"""Verdict assembly: per-(lang, check) PASS/FAIL/UNKNOWN + tri-level scores.

Reproduces the reference's verdict semantics over partitions instead of
repos:

* the accumulating status row ``repo_name,CLONE,DEP,TESTS,ALMANACK``
  (``/root/reference/modules/ProcessRepo.nf:85``,
  ``RunAlmanack.nf:77-78``) becomes the per-(lang, check) verdict table;
* tri-level threshold scoring of pass rates
  (``bin/analyze_joss.py:42-49,302-345``): good/1.0 ≥ 0.9, ok/0.7 ≥ 0.7,
  else needs_improvement/0.3, zero evaluated rows → unknown/0.0;
* max-severity status rollup (``analyze_joss.py:288-298``) and the
  overall score = mean of check scores (``analyze_joss.py:505-508``)
  produce one ``__overall__`` row per lang;
* missing data never aborts: a lang with no rows yields UNKNOWN
  (``analyze_joss.py:91-105`` defaulting semantics).

Drift verdicts come from deterministic fixed-bin histograms compared
against the broadcast reference profile via KS and PSI thresholds.
"""

from __future__ import annotations

import math

import pandas as pd

from ..config import (
    SCORE_GOOD,
    SCORE_NEEDS_IMPROVEMENT,
    SCORE_NONE,
    SCORE_OK,
    ValidationConfig,
    tri_level,
)
from ..functions.sketches import ks_statistic, psi
from .profile import ReferenceProfile

_SEVERITY_ORDER = {"PASS": 0, "UNKNOWN": 1, "FAIL": 2}


def assemble_verdicts(
    profiles: dict[str, dict],
    violation_counts: pd.DataFrame,  # columns: lang, check, n_violations
    cfg: ValidationConfig,
    reference: ReferenceProfile | None = None,
) -> pd.DataFrame:
    """Build the VERDICTS_SCHEMA table (pandas; it is tiny)."""
    counts = {
        (r.lang, r.check): int(r.n_violations)
        for r in violation_counts.itertuples(index=False)
    }
    row_checks = [c for c in cfg.checks if not c.startswith("drift_")]
    rows = []
    for lang in sorted(profiles):
        n_rows = int(profiles[lang]["n_rows"])
        for check in row_checks:
            n_viol = counts.pop((lang, check), 0)
            pass_rate = 1.0 - n_viol / n_rows if n_rows else float("nan")
            status, score = tri_level(pass_rate, n_rows, cfg)
            verdict = "UNKNOWN" if n_rows == 0 else ("PASS" if n_viol == 0 else "FAIL")
            rows.append((lang, check, n_rows, n_viol, pass_rate, status, score, verdict))

        # ---- drift (deterministic histogram KS/PSI vs reference) ---------
        if "drift_text_len" in cfg.checks:
            rows.append(_drift_hist_row(
                lang, profiles[lang], cfg, reference, "drift_text_len",
                "hist_text", "hists"))
        if "drift_html_len" in cfg.checks:
            rows.append(_drift_hist_row(
                lang, profiles[lang], cfg, reference, "drift_html_len",
                "hist_html", "hists_html"))
        if "drift_null_rate" in cfg.checks:
            rows.append(_drift_null_row(lang, profiles[lang], cfg, reference))

    # violations attributed to langs absent from the profile (defensive —
    # shouldn't happen, but UNKNOWN-never-abort semantics demand a row)
    for (lang, check), n_viol in sorted(counts.items()):
        rows.append((lang, check, 0, n_viol, float("nan"), "unknown", SCORE_NONE, "FAIL"))

    df = pd.DataFrame(
        rows,
        columns=[
            "lang", "check", "n_rows", "n_violations",
            "pass_rate", "status", "score", "verdict",
        ],
    )

    # ---- per-lang rollup: max-severity verdict + mean score --------------
    overall = []
    for lang, g in df.groupby("lang", sort=True):
        verdict = max(g["verdict"], key=_SEVERITY_ORDER.get)
        overall.append(
            (lang, "__overall__", int(g["n_rows"].max()), int(g["n_violations"].sum()),
             float("nan"), "-", float(g["score"].mean()), verdict)
        )
    return pd.concat([df, pd.DataFrame(overall, columns=df.columns)], ignore_index=True)


def _drift_hist_row(lang, profile, cfg, reference, check: str,
                    profile_key: str, ref_attr: str):
    """KS/PSI drift verdict for one histogrammed column (text_len,
    html_len) — VERDICT r1 #7 generalized the single-metric version."""
    n_rows = int(profile["n_rows"])
    ref_hists = getattr(reference, ref_attr, None) if reference is not None else None
    if not ref_hists or lang not in ref_hists or n_rows == 0:
        # no baseline -> UNKNOWN, never abort (analyze_joss.py:91-105 analog)
        return (lang, check, n_rows, 0, float("nan"), "unknown", SCORE_NONE, "UNKNOWN")
    if profile_key == "hist_html" and profile.get("hist_html_missing"):
        # a merged partial predates the html histogram (pre-r2 checkpoint
        # resume): the histogram undercounts, so the verdict is UNKNOWN
        # rather than silently wrong
        return (lang, check, n_rows, 0, float("nan"), "unknown", SCORE_NONE, "UNKNOWN")
    ks = ks_statistic(ref_hists[lang], profile[profile_key])
    p = psi(ref_hists[lang], profile[profile_key])
    if math.isnan(ks) or math.isnan(p):
        return (lang, check, n_rows, 0, float("nan"), "unknown", SCORE_NONE, "UNKNOWN")
    if ks >= cfg.ks_fail or p >= cfg.psi_fail:
        status, score, verdict = "needs_improvement", SCORE_NEEDS_IMPROVEMENT, "FAIL"
    elif ks >= cfg.ks_ok or p >= cfg.psi_ok:
        status, score, verdict = "ok", SCORE_OK, "PASS"
    else:
        status, score, verdict = "good", SCORE_GOOD, "PASS"
    # pass_rate column carries 1-KS for drift rows (a bounded similarity)
    return (lang, check, n_rows, 0, 1.0 - ks, status, score, verdict)


def _drift_null_row(lang, profile, cfg, reference):
    """Per-column null-rate drift: max |rate - reference rate| across the
    profiled columns, thresholded like the histogram drifts."""
    n_rows = int(profile["n_rows"])
    ref_rates = getattr(reference, "null_rates", None) if reference is not None else None
    if not ref_rates or lang not in ref_rates or n_rows == 0:
        return (lang, "drift_null_rate", n_rows, 0, float("nan"), "unknown",
                SCORE_NONE, "UNKNOWN")
    ref = ref_rates[lang]
    deltas = [
        abs(profile["nulls"][c] / n_rows - float(ref[c]))
        for c in profile["nulls"] if c in ref
    ]
    if not deltas:
        return (lang, "drift_null_rate", n_rows, 0, float("nan"), "unknown",
                SCORE_NONE, "UNKNOWN")
    d = max(deltas)
    if d >= cfg.null_drift_fail:
        status, score, verdict = "needs_improvement", SCORE_NEEDS_IMPROVEMENT, "FAIL"
    elif d >= cfg.null_drift_ok:
        status, score, verdict = "ok", SCORE_OK, "PASS"
    else:
        status, score, verdict = "good", SCORE_GOOD, "PASS"
    return (lang, "drift_null_rate", n_rows, 0, 1.0 - d, status, score, verdict)
