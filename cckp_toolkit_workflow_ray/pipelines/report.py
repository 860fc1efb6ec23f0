"""Run-report writers — the reference's report stage re-scoped.

The reference ends each record with an LLM-generated HTML report
(``/root/reference/bin/analyze.py:37-74``, golden example
``test-results/POT_ai_analysis.html``) and falls back to a static error
HTML when the agent fails (``analyze.py:66-74``).  The engine keeps the
*capability* — a human-readable per-run report derived from the verdict
tables — as a deterministic static renderer plus a pluggable hook for an
external summarizer (no network in the engine itself).
"""

from __future__ import annotations

import html
import os


def violation_examples(result, k: int = 5):
    """Top-k example violations per (lang, check) for the report —
    per-group head over the (small) violations table (SURVEY.md §2.7).
    Deterministic: ordered by (url, detail) within each group."""
    import pandas as pd

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["url", "detail"], kind="mergesort").head(k)

    return (
        result.violations()
        .groupby(["lang", "check"])
        .map_groups(head_k, batch_format="pandas")
        .to_pandas()
    )


def write_html_report(result, path: str | None = None, examples_per_check: int = 3,
                      summarizer=None) -> str:
    """Render the run report to a standalone HTML file.

    ``summarizer``: optional callable ``report_dict -> str`` for an
    external prose generator (the analyze.py agent analog); its output is
    embedded escaped.  Returns the output path.
    """
    path = path or os.path.join(result.out_dir, "report.html")
    v = result.verdicts
    overall = result.overall_verdict()
    ex = violation_examples(result, examples_per_check)

    def table(df, cols):
        head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
        body = "".join(
            "<tr>" + "".join(f"<td>{html.escape(str(r[c]))}</td>" for c in cols) + "</tr>"
            for _, r in df.iterrows()
        )
        return f"<table border='1' cellspacing='0'><tr>{head}</tr>{body}</table>"

    prose = ""
    if summarizer is not None:
        try:
            prose = f"<p>{html.escape(summarizer(result.report))}</p>"
        except Exception as exc:  # report generation must never fail the run
            prose = f"<p><em>summarizer failed: {html.escape(str(exc))}</em></p>"

    parts = [
        "<html><head><meta charset='utf-8'><title>validation report</title></head><body>",
        f"<h1>Validation report — overall: {html.escape(overall)}</h1>",
        f"<p>rows: {result.report.get('n_rows')}, violations: "
        f"{result.report.get('n_violations')}, config: "
        f"{html.escape(str(result.report.get('config_fingerprint')))}</p>",
        prose,
        "<h2>Per-partition verdicts</h2>",
        table(v.sort_values(["lang", "check"]),
              ["lang", "check", "n_rows", "n_violations", "status", "score", "verdict"]),
        "<h2>Example violations</h2>",
        table(ex.sort_values(["lang", "check", "url"]),
              ["lang", "check", "url", "severity", "detail"]) if len(ex) else "<p>none</p>",
        "</body></html>",
    ]
    with open(path, "w") as f:
        f.write("\n".join(parts))
    return path
