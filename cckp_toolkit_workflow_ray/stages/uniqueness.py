"""URL-uniqueness check — the engine's all-to-all shuffle stage.

The reference's join keys ``(repo_url, repo_name)`` act as record identity
(``/root/reference/main.nf:101-102``); duplicate sample-sheet rows would
silently run twice.  At web scale, uniqueness(url) is a first-class check
and the one operation that genuinely requires moving every key between
nodes.

Scale design (SURVEY.md §2.7), measured on a 10M-row input:

* **Prune at the read** — this stage consumes only ``(url, lang)``; when
  given parquet paths it issues its own pruned ``read_parquet`` so the
  wide ``html`` column never enters the shuffle.
* **Hash keys, not strings; ints-only exchange** — urls are hashed to a
  128-bit composite ``(h1, h2)`` (two independent 64-bit streams) and the
  global sort moves ONLY the three int64 columns ``(h1, h2, n)`` — no
  strings cross the exchange.  Collision probability at 10^12 keys is
  ~3e-15; a second pruned scan recovers the representative url/lang for
  the (rare) duplicated keys via a broadcast key set, combined per batch
  so at most |dup_keys| rows per batch reach the driver.
* **Combiner before shuffle** — per-batch ``np.unique`` collapses each
  url to at most one partial per batch, so a hot key (a url duplicated
  millions of times) contributes one row per batch instead of millions of
  rows to the exchange.  This bounds the largest reducer group by the
  number of batches — the same guarantee explicit key-salting gives,
  without a second shuffle phase.
* **Sorted-candidate extraction** (stages.groupagg) — after the sort,
  duplicate keys are found vectorized; the final exact collapse runs in
  pandas on the driver over the (small) candidate set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import ValidationConfig
from ..functions.hashing import hash_strings
from ..schema import VIOLATIONS_SCHEMA
from .checks import MISSING_LANG

_DUPS_SCHEMA = pa.schema(
    [("url", pa.string()), ("lang_min", pa.string()), ("n", pa.int64())]
)


def _valid_url_mask(urls) -> np.ndarray:
    return pc.and_(
        pc.is_valid(urls), pc.invert(pc.equal(pc.fill_null(urls, ""), ""))
    ).to_numpy(zero_copy_only=False)


def _hash_counts(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch (h1, h2, n) — ints only, nothing wide."""
    urls = batch.column("url")
    url_np = urls.to_numpy(zero_copy_only=False)[_valid_url_mask(urls)]
    if url_np.size == 0:
        return pa.table({"h1": pa.array([], type=pa.int64()),
                         "h2": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64())})
    h1 = hash_strings(url_np, seed=1).astype(np.int64)
    uniq, first_idx, counts = np.unique(h1, return_index=True, return_counts=True)
    h2 = hash_strings(url_np[first_idx], seed=2).astype(np.int64)
    return pa.table({"h1": uniq, "h2": h2, "n": counts.astype(np.int64)})


def _make_recover_fn(dup_h1_sorted: np.ndarray):
    """Second-scan combiner: for rows whose url-hash is in the duplicated
    key set, emit per-batch (h1, h2, url_min, lang_min) — bounded by
    |dup_keys| rows per batch regardless of duplicate multiplicity."""

    def recover(batch: pa.Table) -> pa.Table:
        empty = pa.table({"h1": pa.array([], type=pa.int64()),
                          "h2": pa.array([], type=pa.int64()),
                          "url": pa.array([], type=pa.string()),
                          "lang": pa.array([], type=pa.string())})
        urls = batch.column("url")
        valid = _valid_url_mask(urls)
        url_np = urls.to_numpy(zero_copy_only=False)[valid]
        if url_np.size == 0:
            return empty
        lang_np = pc.fill_null(batch.column("lang"), MISSING_LANG).to_numpy(
            zero_copy_only=False
        )[valid]
        h1 = hash_strings(url_np, seed=1).astype(np.int64)
        pos = np.searchsorted(dup_h1_sorted, h1)
        pos_c = np.clip(pos, 0, max(0, dup_h1_sorted.size - 1))
        hit = dup_h1_sorted.size > 0
        sel = hit & (dup_h1_sorted[pos_c] == h1)
        if not np.any(sel):
            return empty
        df = pd.DataFrame({"h1": h1[sel], "url": url_np[sel], "lang": lang_np[sel]})
        g = df.groupby("h1", as_index=False).agg(url=("url", "min"), lang=("lang", "min"))
        g["h2"] = hash_strings(g["url"].to_numpy(), seed=2).astype(np.int64)
        return pa.Table.from_pandas(g[["h1", "h2", "url", "lang"]], preserve_index=False)

    return recover


class _KeyCounterShard:
    """One shard of the distributed url-hash index — the engine's only
    'shared mutable state', which is exactly the case SURVEY.md reserves
    for raw Ray actors: a sharded count index that scan tasks stream
    partials into, avoiding any sort/shuffle barrier.  Each shard owns a
    hash range; memory per shard = |urls in range| x 16 bytes, so the
    shard count P scales the index across a cluster's memory."""

    def __init__(self):
        self.h1_chunks: list = []
        self.h2_chunks: list = []
        self.n_chunks: list = []

    def add(self, h1: np.ndarray, h2: np.ndarray, n: np.ndarray) -> None:
        self.h1_chunks.append(h1)
        self.h2_chunks.append(h2)
        self.n_chunks.append(n)

    def finalize_duplicates(self):
        """Exact per-(h1, h2) totals; returns only keys with n > 1."""
        if not self.h1_chunks:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.int64))
        h1 = np.concatenate(self.h1_chunks)
        h2 = np.concatenate(self.h2_chunks)
        n = np.concatenate(self.n_chunks)
        order = np.lexsort((h2, h1))
        h1, h2, n = h1[order], h2[order], n[order]
        new_group = np.concatenate(
            [[True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
        )
        starts = np.flatnonzero(new_group)
        totals = np.add.reduceat(n, starts)
        sel = totals > 1
        return h1[starts][sel], h2[starts][sel], totals[sel].astype(np.int64)


def _make_counting_fn(shards, n_shards: int):
    """Scan-side: per-batch combine then stream ints to the owning shards.
    ray.get on the adds applies backpressure per task."""
    import ray

    def count_into_shards(batch: pa.Table) -> pa.Table:
        t = _hash_counts(batch)
        h1 = t.column("h1").to_numpy(zero_copy_only=False)
        if h1.size:
            h2 = t.column("h2").to_numpy(zero_copy_only=False)
            n = t.column("n").to_numpy(zero_copy_only=False)
            shard_ids = (h1.astype(np.uint64) % np.uint64(n_shards)).astype(np.int64)
            refs = []
            for s in range(n_shards):
                m = shard_ids == s
                if m.any():
                    refs.append(shards[s].add.remote(h1[m], h2[m], n[m]))
            ray.get(refs)
        return pa.table({"rows": pa.array([batch.num_rows], type=pa.int64())})

    return count_into_shards


def duplicate_urls(source, cfg: ValidationConfig | None = None):
    """Return a small Dataset of ``(url, lang_min, n)`` for urls with n>1.

    ``source`` is either a list of parquet paths (preferred: pruned read)
    or an existing ``ray.data.Dataset`` of pages.
    """
    import ray
    import ray.data as rd

    cfg = cfg or ValidationConfig()

    def pages_scan():
        if isinstance(source, (str, list, tuple)):
            return rd.read_parquet(source, columns=["url", "lang"])
        return source.select_columns(["url", "lang"])

    # scan 1: stream per-batch (h1, h2, n) combiners into the sharded
    # count index — no sort barrier; counting overlaps the scan
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_shards = max(2, ncpu // 2)
    Shard = ray.remote(num_cpus=0)(_KeyCounterShard)
    shards = [Shard.remote() for _ in range(n_shards)]
    counting = pages_scan().map_batches(
        _make_counting_fn(shards, n_shards),
        batch_format="pyarrow",
        batch_size=cfg.uniqueness_batch_size,
    )
    counting.count()  # drive the scan to completion (all adds applied)

    parts = ray.get([s.finalize_duplicates.remote() for s in shards])
    for s in shards:
        ray.kill(s)
    dup_h1 = np.concatenate([p[0] for p in parts])
    dup_n = np.concatenate([p[2] for p in parts])
    dup_keys = pd.DataFrame(
        {"h1": dup_h1,
         "h2": np.concatenate([p[1] for p in parts]),
         "n": dup_n}
    )
    if dup_keys.empty:
        return rd.from_arrow(_DUPS_SCHEMA.empty_table())

    # scan 2: recover representative url + min lang for duplicated keys
    dup_h1_sorted = np.sort(dup_keys["h1"].to_numpy())
    reps = (
        pages_scan()
        .map_batches(
            _make_recover_fn(dup_h1_sorted),
            batch_format="pyarrow",
            batch_size=cfg.uniqueness_batch_size,
        )
        .to_pandas()
    )
    reps = reps.groupby(["h1", "h2"], as_index=False).agg(
        url=("url", "min"), lang_min=("lang", "min")
    )
    out = dup_keys.merge(reps, on=["h1", "h2"], how="inner")[["url", "lang_min", "n"]]
    return rd.from_arrow(
        pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False).cast(
            _DUPS_SCHEMA
        )
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
