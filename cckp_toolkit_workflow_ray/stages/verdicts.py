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
            rows.append(_drift_row(lang, profiles[lang], cfg, reference))

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


def _drift_row(lang, profile, cfg, reference):
    n_rows = int(profile["n_rows"])
    if reference is None or lang not in reference.hists or n_rows == 0:
        # no baseline -> UNKNOWN, never abort (analyze_joss.py:91-105 analog)
        return (lang, "drift_text_len", n_rows, 0, float("nan"), "unknown", SCORE_NONE, "UNKNOWN")
    ks = ks_statistic(reference.hists[lang], profile["hist_text"])
    p = psi(reference.hists[lang], profile["hist_text"])
    if math.isnan(ks) or math.isnan(p):
        return (lang, "drift_text_len", n_rows, 0, float("nan"), "unknown", SCORE_NONE, "UNKNOWN")
    if ks >= cfg.ks_fail or p >= cfg.psi_fail:
        status, score, verdict = "needs_improvement", SCORE_NEEDS_IMPROVEMENT, "FAIL"
    elif ks >= cfg.ks_ok or p >= cfg.psi_ok:
        status, score, verdict = "ok", SCORE_OK, "PASS"
    else:
        status, score, verdict = "good", SCORE_GOOD, "PASS"
    # pass_rate column carries 1-KS for drift rows (a bounded similarity)
    return (lang, "drift_text_len", n_rows, 0, 1.0 - ks, status, score, verdict)
