"""Stats-profile merging + reference profile (the `almanack.table()` analog).

The reference profiles every record with ``almanack.table(repo_path)``
(``/root/reference/modules/RunAlmanack.nf:68``) and downstream stages look
metrics up by name (``bin/analyze_joss.py:51-78``).  Here the profile is a
long table ``(lang, column, metric, value)`` computed by merging the
per-batch partials the CheckSuite stage emitted — a hierarchical combine
(within-batch → per-lang) so no single task ever holds more than a few
hundred KiB of sketch state, regardless of input size.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import ValidationConfig
from ..functions.extract import EXTRACTOR_VERSION
from ..functions.sketches import FixedHistogram
from ..schema import PROFILE_SCHEMA
from .checks import deserialize_partial, merge_partials, serialize_partial


def _merge_partial_batch(batch: pa.Table, cfg: ValidationConfig) -> pa.Table:
    """Level-1 combine: merge this batch's partial rows per lang."""
    langs = batch.column("lang").to_pylist()
    payloads = batch.column("payload").to_pylist()
    by_lang: dict[str, list] = {}
    for lang, pay in zip(langs, payloads):
        by_lang.setdefault(lang, []).append(deserialize_partial(pay))
    out_langs, out_pay = [], []
    for lang in sorted(by_lang):
        out_langs.append(lang)
        out_pay.append(serialize_partial(merge_partials(by_lang[lang], cfg)))
    return pa.table(
        {"lang": pa.array(out_langs, type=pa.string()),
         "payload": pa.array(out_pay, type=pa.binary())}
    )


def merge_profiles(stream_ds, cfg: ValidationConfig) -> dict[str, dict]:
    """stream (kind == 'profile') → {lang: merged partial}.

    Two-level distributed combine: map_batches merges ~512 partials at a
    time, then a per-lang groupby merges the survivors.  Lang cardinality
    is small, so the final group stage is trivially balanced.
    """
    partials = stream_ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("kind"), "profile")).select(
            ["lang", "payload"]
        ),
        batch_format="pyarrow",
    )
    level1 = partials.map_batches(
        lambda t: _merge_partial_batch(t, cfg), batch_format="pyarrow", batch_size=512
    )

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        merged = merge_partials(
            [deserialize_partial(b) for b in group["payload"]], cfg
        )
        return pd.DataFrame(
            {"lang": [group["lang"].iloc[0]], "payload": [serialize_partial(merged)]}
        )

    final = level1.groupby("lang").map_groups(_final, batch_format="pandas")
    rows = final.take_all()
    return {r["lang"]: deserialize_partial(r["payload"]) for r in rows}


def profile_to_table(profiles: dict[str, dict]) -> pa.Table:
    """Long-form PROFILE_SCHEMA table from merged per-lang partials."""
    langs, cols, metrics, values = [], [], [], []

    def put(lang, col, metric, value):
        if value is None:
            return
        langs.append(lang)
        cols.append(col)
        metrics.append(metric)
        values.append(float(value))

    for lang in sorted(profiles):
        p = profiles[lang]
        put(lang, "*", "count", p["n_rows"])
        for c, v in p["nulls"].items():
            put(lang, c, "null_count", v)
            if p["n_rows"]:
                put(lang, c, "null_rate", v / p["n_rows"])
        for key in ("text_len", "html_len"):
            s = p[key]
            put(lang, key, "count", s["n"])
            put(lang, key, "min", s["min"])
            put(lang, key, "max", s["max"])
            if s["n"]:
                put(lang, key, "mean", s["sum"] / s["n"])
        put(lang, "warc_ts", "min", p["warc_ts"]["min"])
        put(lang, "warc_ts", "max", p["warc_ts"]["max"])
        td = p["tdigest_text"]
        if td.count:
            for q in (0.5, 0.9, 0.99):
                put(lang, "text_len", f"p{int(q*100)}", td.quantile(q))
        put(lang, "url", "distinct_estimate", p["hll_url"].estimate())
    return pa.Table.from_arrays(
        [
            pa.array(langs, type=pa.string()),
            pa.array(cols, type=pa.string()),
            pa.array(metrics, type=pa.string()),
            pa.array(values, type=pa.float64()),
        ],
        schema=PROFILE_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Reference profile: the broadcast small side for referential + drift checks
# (analog of the almanack metric names consumed at analyze_joss.py:386-390).
# ---------------------------------------------------------------------------


class ReferenceProfile:
    def __init__(self, valid_langs: list[str], hists: dict[str, FixedHistogram],
                 counts: dict[str, int], extractor_version: str = EXTRACTOR_VERSION,
                 hists_html: dict[str, FixedHistogram] | None = None,
                 null_rates: dict[str, dict] | None = None):
        self.valid_langs = list(valid_langs)
        self.hists = hists              # lang -> text-length histogram
        self.hists_html = hists_html or {}   # lang -> html-length histogram
        self.null_rates = null_rates or {}   # lang -> {column: null rate}
        self.counts = counts            # lang -> n_rows
        self.extractor_version = extractor_version

    @staticmethod
    def _hists_json(hists):
        return {lang: {"edges": h.edges.tolist(), "counts": h.counts.tolist()}
                for lang, h in hists.items()}

    @staticmethod
    def _hists_from_json(d):
        return {lang: FixedHistogram(np.asarray(h["edges"]), np.asarray(h["counts"]))
                for lang, h in d.items()}

    def to_json(self) -> str:
        return json.dumps(
            {
                "valid_langs": self.valid_langs,
                "extractor_version": self.extractor_version,
                "counts": self.counts,
                "hists": self._hists_json(self.hists),
                "hists_html": self._hists_json(self.hists_html),
                "null_rates": self.null_rates,
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "ReferenceProfile":
        d = json.loads(s)
        return cls(d["valid_langs"], cls._hists_from_json(d["hists"]),
                   {k: int(v) for k, v in d["counts"].items()},
                   d.get("extractor_version", EXTRACTOR_VERSION),
                   hists_html=cls._hists_from_json(d.get("hists_html", {})),
                   null_rates=d.get("null_rates", {}))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "ReferenceProfile":
        with open(path) as f:
            return cls.from_json(f.read())

    @classmethod
    def from_merged(cls, profiles: dict[str, dict]) -> "ReferenceProfile":
        langs = [l for l in sorted(profiles) if not l.startswith("__")]
        return cls(
            valid_langs=langs,
            hists={l: profiles[l]["hist_text"] for l in langs},
            counts={l: profiles[l]["n_rows"] for l in langs},
            hists_html={l: profiles[l]["hist_html"] for l in langs},
            null_rates={
                l: {c: v / profiles[l]["n_rows"]
                    for c, v in profiles[l]["nulls"].items()}
                for l in langs if profiles[l]["n_rows"]
            },
        )
