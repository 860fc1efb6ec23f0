"""Distributed spherical k-means + SemDeDup-style semantic dedup.

The clustering building block the reference's project-type classifier
(`/root/reference/bin/analyze_joss.py` classify step) generalizes to at
corpus scale: group documents by embedding geometry, then curate within
groups.  Published basis: Lloyd's algorithm (spherical variant — cosine
assignment, mean-then-renormalize update) and SemDeDup (Abbas et al.,
2023, arXiv:2303.09540): cluster the corpus, then drop near-identical
members *within* each cluster, so the pairwise work is O(Σ m_c²) instead
of O(n²).

Scale shape:
- every Lloyd iteration is ONE ``map_batches`` pass emitting a (k × d)
  integer partial per batch — the driver reduce is O(k × d × blocks)
  ints, never corpus-sized;
- element sums are pre-rounded to e6 integers (the ``label_centroids``
  motif) so centroid updates are order-independent exact int64 sums —
  bit-identical results at any parallelism level / block arrival order;
- assignment is a single pass of vectorized argmax against the broadcast
  (``ray.put``) centroid matrix;
- SemDeDup's within-cluster pairwise runs under ``groupby(cluster)
  .map_groups`` — group size is corpus/k by construction (callers raise
  ``k`` with corpus size, the published SemDeDup recipe), and clusters
  beyond ``max_cluster`` are kept un-deduped with a loud warning (recall
  cap, precision intact — the ``max_bucket`` policy).

Degenerate vectors (zero norm — no direction, cosine undefined) and NULL
embeddings are excluded up front, matching ``near_dup_cosine_lsh``'s
excluded-degenerate-buckets policy; the SQL oracles apply the same
``list_inner_product(e, e) > 0`` filter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import splitmix64
from .similarity import _normalize, _to_matrix

_E6 = 1_000_000.0


def _round_e6_int(m: np.ndarray) -> np.ndarray:
    """Element-wise half-away-from-zero rounding to 1e-6 units (int64) —
    makes cross-batch sums exact integers, hence order-independent."""
    s = m * _E6
    return np.where(s >= 0, np.floor(s + 0.5), -np.floor(-s + 0.5)).astype(np.int64)


def _valid_rows(t: pa.Table, vec_col: str, id_col: str):
    """(ids, unit-normalized matrix) for the non-degenerate rows of a
    batch: NULL embeddings and exact-zero vectors are dropped."""
    col = t.column(vec_col).combine_chunks()
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    if col.null_count:
        notnull = ~col.is_null().to_numpy(zero_copy_only=False)
        ids = ids[notnull]
        col = col.drop_null()
    m = _to_matrix(col)
    norms = np.linalg.norm(m, axis=1) if m.size else np.zeros(len(ids))
    keep = norms > 0
    return ids[keep].astype(np.int64), (m[keep] / norms[keep, None]
                                        if keep.any() else m[:0])


def kmeans_fit(ds, k: int = 8, n_iters: int = 6, vec_col: str = "embedding",
               id_col: str = "vec_id", seed: int = 17,
               train_sample_mod: int = 1, batch_size: int = 4096,
               cache=None) -> np.ndarray:
    """Distributed spherical k-means; returns a (k, d) unit-row centroid
    matrix, bit-identical across parallelism levels.

    Init: the k sample vectors with the smallest ``splitmix64(id+seed)``
    rank, drawn from the ``id % train_sample_mod == 0`` key-mod sample
    (seed-stable, never random_sample — SURVEY.md §2.7).  The init
    sample is driver-side and must be bounded: at 10^12 docs set
    ``train_sample_mod`` so the sample is ~1e5 rows; iterations always
    run distributed over the (sampled) Dataset, one pass each, partials
    reduced as exact e6 integers.  Empty clusters keep their previous
    centroid (deterministic).  Iteration count is FIXED (no data-driven
    early exit) so runs at different parallelism produce identical
    centroids.

    ``cache``: optional :class:`~..state.checkpoint.StageCache` — the
    trained centroid matrix is an n_iters-full-pass intermediate, so a
    100-TB curation run that dies after training resumes from the
    published centroids instead of re-scanning (the Nextflow
    ``-resume`` analog, VERDICT r3 #2).
    """
    import ray

    cache_params = {"k": k, "n_iters": n_iters, "seed": seed,
                    "train_sample_mod": train_sample_mod,
                    "vec_col": vec_col, "algo_rev": 1}
    if cache is not None:
        hit = cache.lookup("kmeans_centroids", cache_params)
        if hit is not None:
            cdf = hit.to_pandas()
            if not len(cdf):
                raise ValueError(
                    "kmeans_fit: no non-degenerate vectors to cluster "
                    "(cached)")
            cdf = cdf.sort_values(["cluster_id", "pos"], kind="mergesort")
            k_hit = int(cdf["cluster_id"].max()) + 1
            return cdf["val"].to_numpy().reshape(k_hit, -1)

    train = ds.select_columns([id_col, vec_col])
    if train_sample_mod > 1:
        def keymod(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % train_sample_mod == 0))

        train = train.map_batches(keymod, batch_format="pyarrow")
    train = train.materialize()  # n_iters passes re-read it

    # ---- init: hash-ranked pick from a bounded driver-side sample ----
    def init_sample(t: pa.Table) -> pa.Table:
        ids, m = _valid_rows(t, vec_col, id_col)
        rank = splitmix64(ids.astype(np.uint64) + np.uint64(seed))
        order = np.argsort(rank)[:k]          # per-batch partial top-k
        # sign-flip cast: uint64 order preserved in int64, so the driver
        # sort agrees with the per-batch selection at any block split
        rank_i64 = (rank[order] ^ np.uint64(1 << 63)).astype(np.int64)
        return pa.table({
            "id": pa.array(ids[order], type=pa.int64()),
            "rank": pa.array(rank_i64),
            "vec": pa.array([row.tobytes() for row in m[order]],
                            type=pa.binary()),
        })

    def _publish(cent_mat: np.ndarray):
        import ray.data as rd

        kk, dd = cent_mat.shape if cent_mat.size else (0, 0)
        cache.put("kmeans_centroids", cache_params, rd.from_arrow(pa.table({
            "cluster_id": pa.array(np.repeat(np.arange(kk), dd).astype(np.int64)),
            "pos": pa.array(np.tile(np.arange(dd), kk).astype(np.int64)),
            "val": pa.array(cent_mat.ravel(), type=pa.float64()),
        })))

    cand = train.map_batches(init_sample, batch_format="pyarrow").to_pandas()
    if not len(cand):
        if cache is not None:
            _publish(np.empty((0, 0)))
        raise ValueError("kmeans_fit: no non-degenerate vectors to cluster")
    cand = cand.sort_values(["rank", "id"], kind="mergesort").head(k)
    cent = np.stack([np.frombuffer(b, dtype=np.float64)
                     for b in cand["vec"]])
    k_eff = cent.shape[0]                     # corpus may have < k vectors
    d = cent.shape[1]

    # ---- Lloyd iterations: one distributed pass each -----------------
    for _ in range(n_iters):
        cent_ref = ray.put(cent)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            _, m = _valid_rows(t, vec_col, id_col)
            if not m.shape[0]:
                return pa.table({"cluster": pa.array([], type=pa.int64()),
                                 "pos": pa.array([], type=pa.int64()),
                                 "sum_e6": pa.array([], type=pa.int64()),
                                 "n": pa.array([], type=pa.int64())})
            assign = np.argmax(m @ c.T, axis=1)
            ints = _round_e6_int(m)
            rows_c, rows_p, rows_s, rows_n = [], [], [], []
            for cl in np.unique(assign):
                sel = assign == cl
                rows_c.append(np.full(d, cl, dtype=np.int64))
                rows_p.append(np.arange(d, dtype=np.int64))
                rows_s.append(ints[sel].sum(axis=0))
                rows_n.append(np.full(d, int(sel.sum()), dtype=np.int64))
            return pa.table({
                "cluster": pa.array(np.concatenate(rows_c)),
                "pos": pa.array(np.concatenate(rows_p)),
                "sum_e6": pa.array(np.concatenate(rows_s)),
                "n": pa.array(np.concatenate(rows_n)),
            })

        parts = train.map_batches(partial, batch_format="pyarrow",
                                  batch_size=batch_size).to_pandas()
        if not len(parts):
            break
        red = parts.groupby(["cluster", "pos"], as_index=False)[["sum_e6", "n"]].sum()
        for cl, grp in red.groupby("cluster"):
            grp = grp.sort_values("pos")
            n_c = int(grp["n"].iloc[0])
            v = grp["sum_e6"].to_numpy().astype(np.float64) / _E6 / n_c
            nv = np.linalg.norm(v)
            if nv:
                cent[int(cl)] = v / nv
        # clusters absent from red (empty) keep their previous centroid
    if cache is not None:
        _publish(cent[:k_eff])
    return cent[:k_eff]


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding",
                  id_col: str = "vec_id", batch_size: int = 4096,
                  export_dir: str | None = None, with_vec: bool = False):
    """One vectorized pass: (vec_id, cluster_id) for every non-degenerate
    vector — argmax cosine against the broadcast centroid matrix, ties
    broken toward the smallest cluster_id (np.argmax picks the first
    maximum, matching the oracle's ``ORDER BY sim DESC, cluster_id``).

    ``export_dir``: per-batch (vec_id, cluster_id) parquet for the SQL
    export-oracle pattern.  ``with_vec``: carry the unit-normalized
    vector as float64 bytes for downstream within-cluster work.
    """
    import ray

    if export_dir is not None:
        import os
        import shutil

        shutil.rmtree(export_dir, ignore_errors=True)
        os.makedirs(export_dir, exist_ok=True)
    cent_ref = ray.put(centroids)

    def assign_batch(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids, m = _valid_rows(t, vec_col, id_col)
        assign = (np.argmax(m @ c.T, axis=1).astype(np.int64)
                  if m.shape[0] else np.empty(0, dtype=np.int64))
        cols = {"vec_id": pa.array(ids, type=pa.int64()),
                "cluster_id": pa.array(assign, type=pa.int64())}
        if export_dir is not None:
            import uuid

            import pyarrow.parquet as _pq

            _pq.write_table(pa.table(cols),
                            f"{export_dir}/{uuid.uuid4().hex}.parquet")
        if with_vec:
            cols["vec"] = pa.array([row.tobytes() for row in m],
                                   type=pa.binary())
        return pa.table(cols)

    return ds.select_columns([id_col, vec_col]).map_batches(
        assign_batch, batch_format="pyarrow", batch_size=batch_size)


def semantic_dedup_keep(ds, centroids: np.ndarray, threshold: float = 0.995,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        batch_size: int = 4096, max_cluster: int = 100_000,
                        export_assign_dir: str | None = None) -> pd.DataFrame:
    """SemDeDup: within each k-means cluster, drop every vector that has
    a same-cluster neighbor with cosine ≥ threshold and a smaller
    vec_id ("keep the earliest member of each near-dup neighborhood" —
    deterministic and SQL-expressible as NOT EXISTS).  Returns the kept
    (vec_id, cluster_id), sorted.

    Within-cluster pairwise is one matmul per ``map_groups`` group —
    O(m_c² d) flops per cluster, bounded because SemDeDup scales k with
    the corpus.  Clusters larger than ``max_cluster`` are recursively
    split by a deterministic local 2-means (farthest-point init, Lloyd,
    median-projection fallback on a degenerate split) until every leaf
    fits, then the keep rule runs within each leaf — the standard
    SemDeDup approximation applied one level deeper, so near-identical
    vectors (cosine ≥ threshold ≈ 1) stay co-located and the keep-set
    matches whole-cluster pairwise except for pairs a split separates.
    Only a cluster that still exceeds ``max_cluster`` after the bounded
    recursion (depth 16 ⇒ ≥ 2^16 × max_cluster members) is kept whole
    with a loud driver warning.
    """
    assigned = kmeans_assign(ds, centroids, vec_col=vec_col, id_col=id_col,
                             batch_size=batch_size,
                             export_dir=export_assign_dir, with_vec=True)

    def pairwise_removed(m: np.ndarray) -> np.ndarray:
        # removed := has an earlier (row-index < mine, i.e. smaller id)
        # neighbor at ≥ threshold — strictly-lower triangle per column
        sims = m @ m.T
        return np.tril(sims >= threshold, k=-1).any(axis=1)

    def split_removed(ids: np.ndarray, m: np.ndarray,
                      depth: int) -> np.ndarray:
        """Boolean removed-mask for rows sorted by id; recursive 2-means
        split until the leaf fits max_cluster."""
        n = len(ids)
        if n <= max_cluster:
            return pairwise_removed(m)
        if depth <= 0:
            # pathological: >2^16 × max_cluster members in one k-means
            # cluster — keep whole (recall cap, precision intact)
            return np.zeros(n, dtype=bool)
        # deterministic farthest-point init: seed = row 0 (smallest id),
        # second centroid = farthest row from it
        c0 = m[0]
        d0 = m @ c0
        c1 = m[int(np.argmin(d0))]
        for _ in range(8):  # local Lloyd on the cosine surrogate
            s0, s1 = m @ c0, m @ c1
            side = s1 > s0
            if side.all() or (~side).all():
                break
            n0 = m[~side].mean(axis=0)
            n1 = m[side].mean(axis=0)
            for v in (n0, n1):
                nrm = np.linalg.norm(v)
                if nrm > 0:
                    v /= nrm
            if np.allclose(n0, c0) and np.allclose(n1, c1):
                c0, c1 = n0, n1
                s0, s1 = m @ c0, m @ c1
                side = s1 > s0
                break
            c0, c1 = n0, n1
        s0, s1 = m @ c0, m @ c1
        side = s1 > s0
        if side.all() or (~side).all() or side.sum() == 0:
            # degenerate 2-means: median split on the projection onto the
            # dominant direction (guaranteed balanced, deterministic)
            proj = s0
            side = proj > np.median(proj)
            if side.all() or (~side).all():
                side = np.arange(n) >= n // 2  # last resort: id halves
        removed = np.zeros(n, dtype=bool)
        for mask in (~side, side):
            removed[mask] = split_removed(ids[mask], m[mask], depth - 1)
        return removed

    def dedup_group(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = ["vec_id", "cluster_id"]
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in out_cols + ["oversize"]})
        ids = df["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = np.stack([np.frombuffer(b, dtype=np.float64)
                      for b in df["vec"].to_numpy()[order]])
        if len(df) > max_cluster:
            hit = split_removed(ids, m, depth=16)
            keep = df[out_cols].iloc[order[~hit]].astype("int64")
            # flag rides back so the DRIVER can note the recursive split —
            # a worker warnings.warn never reaches the caller's process;
            # oversize>0 now means "split applied", not "kept whole"
            keep["oversize"] = np.int64(len(df))
            return keep
        hit = pairwise_removed(m)
        keep = df[out_cols].iloc[order[~hit]].astype("int64")
        keep["oversize"] = np.int64(0)
        return keep

    out = assigned.groupby("cluster_id").map_groups(
        dedup_group, batch_format="pandas").to_pandas()
    if not len(out):
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "cluster_id": pd.Series([], dtype="int64")})
    oversize = out.loc[out["oversize"] > 0, ["cluster_id", "oversize"]]
    if len(oversize):
        import warnings

        for cl, sz in oversize.drop_duplicates("cluster_id").itertuples(index=False):
            warnings.warn(
                f"semantic_dedup: cluster {int(cl)} has {int(sz)} members "
                f"> max_cluster={max_cluster}; recursively 2-means-split "
                "before pairwise dedup (pairs a split separates are not "
                "compared — raise k to shrink clusters)")
    return (out[["vec_id", "cluster_id"]]
            .sort_values("vec_id").reset_index(drop=True))
