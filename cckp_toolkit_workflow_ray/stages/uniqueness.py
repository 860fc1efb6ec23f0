"""URL-uniqueness check — the engine's all-to-all exchange stage.

The reference's join keys ``(repo_url, repo_name)`` act as record identity
(``/root/reference/main.nf:101-102``); duplicate sample-sheet rows would
silently run twice.  At web scale, uniqueness(url) is a first-class check
and the one operation that genuinely requires comparing every key.

Scale design (SURVEY.md §2.7), measured on 10-20M-row inputs:

* **Prune at the read** — this stage consumes only ``(url, lang)``; when
  given parquet paths it issues its own pruned ``read_parquet`` so the
  wide ``html`` column never enters the exchange.
* **Hash keys, not strings; ints-only exchange** — urls are hashed to a
  128-bit composite ``(h1, h2)`` (two independently-keyed SipHash
  streams) and grouped BY THE PAIR everywhere, so collision probability
  at 10^12 keys is ~3e-15; only the three int64 columns ``(h1, h2, n)``
  cross the exchange.  A second pruned scan recovers the representative
  url/lang for the (rare) duplicated keys via a broadcast key set,
  combined per batch so at most |dup_keys| rows per batch reach the
  driver.
* **Combiner before shuffle** — per-batch pair-grouping collapses each
  url to at most one partial per batch, so a hot key (a url duplicated
  millions of times) contributes one row per batch instead of millions of
  rows to the exchange — the same guarantee explicit key-salting gives.
* **Two strategies** for the global count:
  - ``"sort"`` (default): global sort of the int partials +
    sorted-candidate extraction (stages.groupagg).  Pure dataset ops —
    safe under Ray task retries, the right default for long 100TB scans.
  - ``"index"``: stream partials into range-sharded counter actors (no
    sort barrier; slightly faster).  CAVEAT: a map task retried after
    some of its ``add`` calls were applied would double-count — use only
    where task retries are disabled or failures restart the stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ..functions.arrow import table_from_pandas as _table_from_pandas
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


def _pair_group(h1: np.ndarray, h2: np.ndarray):
    """Group rows by the (h1, h2) pair: returns (starts, order) such that
    sorted pairs are h1[order][starts...] with np.add.reduceat-able runs."""
    order = np.lexsort((h2, h1))
    s1, s2 = h1[order], h2[order]
    new = np.ones(order.size, dtype=bool)
    new[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
    return np.flatnonzero(new), order


def _hash_counts(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch (h1, h2, n) — ints only, grouped by the full
    128-bit pair (never by h1 alone)."""
    urls = batch.column("url")
    url_np = urls.to_numpy(zero_copy_only=False)[_valid_url_mask(urls)]
    if url_np.size == 0:
        return pa.table({"h1": pa.array([], type=pa.int64()),
                         "h2": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64())})
    h1 = hash_strings(url_np, seed=1).astype(np.int64)
    h2 = hash_strings(url_np, seed=2).astype(np.int64)
    starts, order = _pair_group(h1, h2)
    ones = np.ones(order.size, dtype=np.int64)
    return pa.table({
        "h1": h1[order][starts],
        "h2": h2[order][starts],
        "n": np.add.reduceat(ones, starts),
    })


def _make_recover_fn(dup_h1_sorted: np.ndarray, dup_h2_for_h1: np.ndarray):
    """Second-scan combiner: for rows whose (h1, h2) is in the duplicated
    key set, emit per-batch (h1, h2, url_min, lang_min) — bounded by
    |dup_keys| rows per batch regardless of duplicate multiplicity.
    ``dup_h1_sorted`` / ``dup_h2_for_h1`` are parallel arrays sorted by
    (h1, h2)."""

    def recover(batch: pa.Table) -> pa.Table:
        empty = pa.table({"h1": pa.array([], type=pa.int64()),
                          "h2": pa.array([], type=pa.int64()),
                          "url": pa.array([], type=pa.string()),
                          "lang": pa.array([], type=pa.string())})
        urls = batch.column("url")
        valid = _valid_url_mask(urls)
        url_np = urls.to_numpy(zero_copy_only=False)[valid]
        if url_np.size == 0 or dup_h1_sorted.size == 0:
            return empty
        lang_np = pc.fill_null(batch.column("lang"), MISSING_LANG).to_numpy(
            zero_copy_only=False
        )[valid]
        h1 = hash_strings(url_np, seed=1).astype(np.int64)
        h2 = hash_strings(url_np, seed=2).astype(np.int64)
        # membership against the sorted dup pair set
        pos = np.searchsorted(dup_h1_sorted, h1)
        sel = np.zeros(h1.size, dtype=bool)
        inb = pos < dup_h1_sorted.size
        # walk matching h1 runs to confirm the h2 member (runs are tiny)
        cand = np.flatnonzero(inb & (dup_h1_sorted[np.clip(pos, 0, dup_h1_sorted.size - 1)] == h1))
        for i in cand.tolist():
            p = pos[i]
            while p < dup_h1_sorted.size and dup_h1_sorted[p] == h1[i]:
                if dup_h2_for_h1[p] == h2[i]:
                    sel[i] = True
                    break
                p += 1
        if not sel.any():
            return empty
        df = pd.DataFrame({"h1": h1[sel], "h2": h2[sel],
                           "url": url_np[sel], "lang": lang_np[sel]})
        g = df.groupby(["h1", "h2"], as_index=False).agg(
            url=("url", "min"), lang=("lang", "min")
        )
        return _table_from_pandas(g[["h1", "h2", "url", "lang"]], preserve_index=False)

    return recover


# ---------------------------------------------------------------------------
# strategy "index": sharded counter actors (opt-in; see module docstring)
# ---------------------------------------------------------------------------


class _KeyCounterShard:
    """One shard of the distributed url-hash index — the engine's only
    'shared mutable state' (the raw-actor escape hatch SURVEY.md reserves
    for exactly this).  Each shard owns a hash range; memory per shard =
    |urls in range| x 16 bytes, so the shard count P scales the index
    across a cluster's memory."""

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
        starts, order = _pair_group(h1, h2)
        totals = np.add.reduceat(n[order], starts)
        sel = totals > 1
        return (h1[order][starts][sel], h2[order][starts][sel],
                totals[sel].astype(np.int64))


def _make_counting_fn(shards, n_shards: int):
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


def _dup_keys_via_index(pages_scan, cfg: ValidationConfig) -> pd.DataFrame:
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_shards = max(2, ncpu // 2)
    Shard = ray.remote(num_cpus=0)(_KeyCounterShard)
    shards = [Shard.remote() for _ in range(n_shards)]
    pages_scan().map_batches(
        _make_counting_fn(shards, n_shards),
        batch_format="pyarrow",
        batch_size=cfg.uniqueness_batch_size,
    ).count()
    parts = ray.get([s.finalize_duplicates.remote() for s in shards])
    for s in shards:
        ray.kill(s)
    return pd.DataFrame({
        "h1": np.concatenate([p[0] for p in parts]),
        "h2": np.concatenate([p[1] for p in parts]),
        "n": np.concatenate([p[2] for p in parts]),
    })


def duplicate_urls(source, cfg: ValidationConfig | None = None,
                   broadcast_limit: int = 2_000_000, n_buckets: int = 64):
    """Return a Dataset of ``(url, lang_min, n)`` for urls with n>1.

    ``source`` is either a list of parquet paths (preferred: pruned read)
    or an existing ``ray.data.Dataset`` of pages.

    Two regimes (VERDICT r2 #5): duplicated keys ≤ ``broadcast_limit``
    resolve via the broadcast-filtered recovery scan (rare-dup regime —
    the result is small).  A duplicate-heavy input switches to bucketed
    hash joins: per-batch (key, url_min, lang_min) partials join the
    dup-key Dataset and a distributed keyed Min picks representatives —
    no driver-side key set, and the returned Dataset is itself
    distributed (O(dup keys) rows).  The ``"index"`` strategy centralizes
    keys in sharded actors by design and stays broadcast-only.
    """
    import ray.data as rd

    cfg = cfg or ValidationConfig()

    def pages_scan():
        if isinstance(source, (str, list, tuple)):
            paths = list(source) if isinstance(source, (list, tuple)) else source
            return rd.read_parquet(paths, columns=["url", "lang"])
        return source.select_columns(["url", "lang"])

    if cfg.uniqueness_strategy == "index":
        regime, dup_keys = "broadcast", _dup_keys_via_index(pages_scan, cfg)
    else:
        from .dedup import find_duplicate_int_keys_two_regime

        regime, dup_keys = find_duplicate_int_keys_two_regime(
            pages_scan(), _hash_counts, cfg.uniqueness_batch_size,
            key_cols=["h1", "h2"], broadcast_limit=broadcast_limit)

    if regime == "broadcast":
        if dup_keys.empty:
            return rd.from_arrow(_DUPS_SCHEMA.empty_table())
        # recovery scan: representative url + min lang per duplicated key
        dk = dup_keys.sort_values(["h1", "h2"], kind="mergesort")
        reps = (
            pages_scan()
            .map_batches(
                _make_recover_fn(dk["h1"].to_numpy(), dk["h2"].to_numpy()),
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
            _table_from_pandas(out.reset_index(drop=True), preserve_index=False).cast(
                _DUPS_SCHEMA
            )
        )

    # ---- duplicate-heavy regime: joins end-to-end ------------------------

    from .joins import hash_join

    def recover_all(batch: pa.Table) -> pa.Table:
        """Per-batch (h1, h2, url_min, lang_min) for ALL keys — the
        duplicate-heavy input makes pruning pointless; the per-batch
        combine still bounds the exchange to distinct urls per batch."""
        urls = batch.column("url")
        valid = _valid_url_mask(urls)
        url_np = urls.to_numpy(zero_copy_only=False)[valid]
        if url_np.size == 0:
            return pa.table({"h1": pa.array([], type=pa.int64()),
                             "h2": pa.array([], type=pa.int64()),
                             "url": pa.array([], type=pa.string()),
                             "lang": pa.array([], type=pa.string())})
        lang_np = pc.fill_null(batch.column("lang"), MISSING_LANG).to_numpy(
            zero_copy_only=False)[valid]
        h1 = hash_strings(url_np, seed=1).astype(np.int64)
        h2 = hash_strings(url_np, seed=2).astype(np.int64)
        df = pd.DataFrame({"h1": h1, "h2": h2, "url": url_np, "lang": lang_np})
        g = df.groupby(["h1", "h2"], as_index=False).agg(
            url=("url", "min"), lang=("lang", "min"))
        return _table_from_pandas(g, preserve_index=False)

    recs = pages_scan().map_batches(
        recover_all, batch_format="pyarrow",
        batch_size=cfg.uniqueness_batch_size)
    joined = hash_join(recs, dup_keys, on=["h1", "h2"], n_buckets=n_buckets)
    # duplicated 128-bit keys are corpus-cardinality — sorted-run min,
    # never Ray's per-group aggregate (~0.6 ms/group at scale)
    from .groupagg import sorted_reduce_by_key_ds

    reps = sorted_reduce_by_key_ds(
        joined, ["h1", "h2"],
        {"url": "min", "lang": "min", "n": "min"},  # n constant per key
    ).map_batches(lambda df: df.rename(columns={"lang": "lang_min"}),
                  batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["url", "lang_min", "n"]].copy()
        out["n"] = out["n"].astype("int64")
        return out

    return reps.map_batches(finish, batch_format="pandas")


def duplicates_to_violations(dups: pa.Table, severity: str = "error") -> pa.Table:
    """Long-form violation rows: one per duplicated url (keyed identity)."""
    n = dups.num_rows
    details = [f"url occurs {k} times" for k in dups.column("n").to_pylist()]
    return pa.Table.from_arrays(
        [
            dups.column("url").cast(pa.string()),
            dups.column("lang_min").cast(pa.string()),
            pa.array(["uniqueness_url"] * n, type=pa.string()),
            pa.array([severity] * n, type=pa.string()),
            pa.array(details, type=pa.string()),
        ],
        schema=VIOLATIONS_SCHEMA,
    )
