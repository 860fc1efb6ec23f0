"""Brute-force pandas oracle for the validation engine.

Independent reimplementation of the check semantics (no engine code paths
beyond the pure extract_text function and threshold constants) — the
analog of the reference's known-outcome conformance table
(/root/reference/README.md:141-147).  Tests compare engine output to this
order-insensitively.
"""

from __future__ import annotations

import re

import pandas as pd

from cckp_toolkit_workflow_ray.config import ValidationConfig
from cckp_toolkit_workflow_ray.functions.extract import extract_text

MISSING = "__missing__"


def _null_or_empty(s: pd.Series) -> pd.Series:
    if s.dtype == object:
        return s.isna() | (s == "") | (s == b"")
    return s.isna()


def oracle_violations(df: pd.DataFrame, cfg: ValidationConfig) -> pd.DataFrame:
    lang_attr = df["lang"].where(df["lang"].notna(), MISSING)
    out = []

    pres = {c: _null_or_empty(df[c]) for c in ("url", "warc_ts", "html", "text", "lang")}
    for c, mask in pres.items():
        if f"presence_{c}" in cfg.checks:
            for i in df.index[mask]:
                out.append((df["url"][i] if pd.notna(df["url"][i]) else None,
                            lang_attr[i], f"presence_{c}"))

    if "url_format" in cfg.checks:
        # fullmatch of the unanchored pattern == RE2's ^...$ (end of TEXT,
        # not Python re's before-trailing-newline '$')
        rx = re.compile(cfg.url_regex.lstrip("^").rstrip("$"))
        bad = ~pres["url"] & ~df["url"].fillna("").map(lambda u: bool(rx.fullmatch(u)))
        for i in df.index[bad]:
            out.append((df["url"][i], lang_attr[i], "url_format"))

    if "referential_lang" in cfg.checks:
        bad = ~pres["lang"] & ~df["lang"].isin(set(cfg.valid_langs))
        for i in df.index[bad]:
            out.append((df["url"][i] if pd.notna(df["url"][i]) else None,
                        lang_attr[i], "referential_lang"))

    if "extraction" in cfg.checks:
        checkable = ~pres["html"] & ~pres["text"]
        for i in df.index[checkable]:
            try:
                ok = extract_text(df["html"][i]) == df["text"][i]
            except Exception:
                ok = False
            if not ok:
                out.append((df["url"][i], lang_attr[i], "extraction"))

    if "uniqueness_url" in cfg.checks:
        u = df[~pres["url"]].copy()
        u["lang_attr"] = lang_attr[u.index]
        g = u.groupby("url").agg(n=("url", "size"), lang_min=("lang_attr", "min"))
        for url, row in g[g.n > 1].iterrows():
            out.append((url, row.lang_min, "uniqueness_url"))

    return pd.DataFrame(out, columns=["url", "lang", "check"])


def oracle_verdicts(df: pd.DataFrame, viols: pd.DataFrame, cfg: ValidationConfig) -> pd.DataFrame:
    from cckp_toolkit_workflow_ray.config import tri_level

    lang_attr = df["lang"].where(df["lang"].notna(), MISSING)
    n_rows = lang_attr.value_counts().to_dict()
    vcounts = viols.groupby(["lang", "check"]).size().to_dict()
    rows = []
    for lang in sorted(n_rows):
        for check in [c for c in cfg.checks if not c.startswith("drift_")]:
            nv = vcounts.get((lang, check), 0)
            nr = n_rows[lang]
            pr = 1 - nv / nr if nr else float("nan")
            status, score = tri_level(pr, nr, cfg)
            verdict = "UNKNOWN" if nr == 0 else ("PASS" if nv == 0 else "FAIL")
            rows.append((lang, check, nr, nv, pr, status, score, verdict))
    return pd.DataFrame(
        rows, columns=["lang", "check", "n_rows", "n_violations",
                       "pass_rate", "status", "score", "verdict"]
    )
