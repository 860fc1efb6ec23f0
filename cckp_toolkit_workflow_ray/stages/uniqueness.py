"""URL-uniqueness check — the engine's all-to-all shuffle stage.

The reference's join keys ``(repo_url, repo_name)`` act as record identity
(``/root/reference/main.nf:101-102``); duplicate sample-sheet rows would
silently run twice.  At web scale, uniqueness(url) is a first-class check
and the one operation that genuinely requires moving every key between
nodes.

Scale design (SURVEY.md §2.7):

* **Prune at the read** — this stage consumes only ``(url, lang)``; when
  given parquet paths it issues its own pruned ``read_parquet`` so the
  wide ``html`` column never enters the shuffle.
* **Combiner before shuffle** — per-batch ``value_counts`` collapses each
  url to at most one ``(url, lang_min, n)`` partial per batch, so a hot
  key (a url duplicated millions of times) contributes one row per batch
  instead of millions of rows to the exchange.  This bounds the largest
  reducer group by the number of batches — the same guarantee explicit
  key-salting gives, without a second shuffle phase.
* The final ``groupby("url")`` then aggregates the small partial stream;
  only urls with total count > 1 survive into violation rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import ValidationConfig
from ..schema import VIOLATIONS_SCHEMA
from .checks import MISSING_LANG


def _partial_counts(batch: pa.Table) -> pa.Table:
    """Combiner: url -> (count, min lang) within one batch."""
    df = pd.DataFrame(
        {
            "url": batch.column("url").to_numpy(zero_copy_only=False),
            "lang": batch.column("lang").to_numpy(zero_copy_only=False),
        }
    )
    df = df[df["url"].notna() & (df["url"] != "")]
    if df.empty:
        return pa.table(
            {"url": pa.array([], type=pa.string()),
             "lang_min": pa.array([], type=pa.string()),
             "n": pa.array([], type=pa.int64())}
        )
    df["lang"] = df["lang"].fillna(MISSING_LANG)
    agg = df.groupby("url", sort=False).agg(lang_min=("lang", "min"), n=("lang", "size")).reset_index()
    return pa.table(
        {"url": pa.array(agg["url"], type=pa.string()),
         "lang_min": pa.array(agg["lang_min"], type=pa.string()),
         "n": pa.array(agg["n"].to_numpy(dtype=np.int64))}
    )


def duplicate_urls(source, cfg: ValidationConfig | None = None):
    """Return a small Dataset of ``(url, lang_min, n)`` for urls with n>1.

    ``source`` is either a list of parquet paths (preferred: pruned read)
    or an existing ``ray.data.Dataset`` of pages.
    """
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    cfg = cfg or ValidationConfig()
    if isinstance(source, (str, list, tuple)):
        ds = rd.read_parquet(source, columns=["url", "lang"])
    else:
        ds = source.select_columns(["url", "lang"])

    partials = ds.map_batches(
        _partial_counts, batch_format="pyarrow", batch_size=cfg.uniqueness_batch_size
    )
    totals = partials.groupby("url").aggregate(
        Sum("n", alias_name="n"), Min("lang_min", alias_name="lang_min")
    )
    return totals.map_batches(
        lambda t: t.filter(pa.compute.greater(t.column("n"), 1)),
        batch_format="pyarrow",
    )


def duplicates_to_violations(dups: pa.Table) -> pa.Table:
    """Long-form violation rows: one per duplicated url (keyed identity)."""
    n = dups.num_rows
    details = [f"url occurs {k} times" for k in dups.column("n").to_pylist()]
    return pa.Table.from_arrays(
        [
            dups.column("url").cast(pa.string()),
            dups.column("lang_min").cast(pa.string()),
            pa.array(["uniqueness_url"] * n, type=pa.string()),
            pa.array(["error"] * n, type=pa.string()),
            pa.array(details, type=pa.string()),
        ],
        schema=VIOLATIONS_SCHEMA,
    )
