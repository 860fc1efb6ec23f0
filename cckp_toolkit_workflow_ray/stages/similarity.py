"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), every batch computes one vectorized matmul against it, and
each batch emits only its local top-k per query; the driver merges the
tiny partials.  Scale path: LSH bucketing by random-hyperplane sign bits
restricts the matmul to colliding buckets.

Scale notes: nothing shuffles — the candidate flow is
(batch × queries × k) rows, independent of corpus size; the broadcast is
one object-store put regardless of task count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import isin_sorted, splitmix64


def _to_matrix(col) -> np.ndarray:
    """Stack an Arrow list<float> column into a (n, d) float64 matrix."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _merge_topk(parts: pd.DataFrame, query_ids, k: int) -> pd.DataFrame:
    """Driver-side merge of the per-batch top-k partials, vectorized.

    One lexsort over the stacked (query, −sim, id) array ranks every
    candidate with the exact (sim desc, neighbor_id asc) tie-break; a
    segment prefix counter then keeps the first k per query.  The input
    is O(n_batches × |queries| × k) rows by construction, never corpus-
    sized.
    """
    if not len(parts):
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "neighbor_id": pd.Series([], dtype="int64"),
                             "rk": pd.Series([], dtype="int64")})
    arr_q = parts["query_id"].to_numpy()
    arr_n = parts["neighbor_id"].to_numpy()
    arr_s = parts["sim"].to_numpy()
    order = np.lexsort((arr_n, -arr_s, arr_q))
    arr_q, arr_n = arr_q[order], arr_n[order]
    starts = np.flatnonzero(np.r_[True, arr_q[1:] != arr_q[:-1]])
    seg_len = np.diff(np.r_[starts, len(arr_q)])
    pos = np.arange(len(arr_q)) - np.repeat(starts, seg_len)
    keep = pos < k
    return pd.DataFrame({
        "query_id": np.asarray(query_ids, dtype=np.int64)[arr_q[keep]],
        "neighbor_id": arr_n[keep].astype(np.int64),
        "rk": (pos[keep] + 1).astype(np.int64),
    })


def knn_cosine(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
               vec_col: str = "embedding", id_col: str = "vec_id",
               batch_size: int = 4096) -> pd.DataFrame:
    """Exact cosine top-k for each query vector against the dataset.

    Returns (query_id, neighbor_id, rank) with deterministic tie-break
    (cosine DESC, neighbor_id ASC).  Per-batch partial top-k keeps the
    merged candidate set at O(n_batches × |queries| × k).
    """
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    def partial_topk(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _normalize(_to_matrix(t.column(vec_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if m.shape[0] == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        sims = qm @ m.T                      # (n_queries, n_batch)
        nq, nb = sims.shape
        kk = min(k, nb)
        # local top-k per query, one lexsort over the raveled matrix with
        # the exact (sim desc, id asc) tie-break — ties at the k boundary
        # must not drop the id-tie-break winner.  query index is the most
        # significant key, so the sorted order groups by query and a
        # reshape slices each query's first kk candidates.
        flat_q = np.repeat(np.arange(nq), nb)
        flat_n = np.tile(ids, nq)
        flat_s = sims.ravel()
        sel = np.lexsort((flat_n, -flat_s, flat_q)).reshape(nq, nb)[:, :kk].ravel()
        return pa.table({"query_id": pa.array(flat_q[sel], type=pa.int64()),
                         "neighbor_id": pa.array(flat_n[sel], type=pa.int64()),
                         "sim": pa.array(flat_s[sel], type=pa.float64())})

    parts = ds.map_batches(partial_topk, batch_format="pyarrow",
                           batch_size=batch_size).to_pandas()
    return _merge_topk(parts, query_ids, k)


def near_dup_cosine(ds, threshold: float = 0.99, vec_col: str = "embedding",
                    id_col: str = "vec_id", batch_size: int = 4096) -> pd.DataFrame:
    """All pairs with cosine ≥ threshold, exact.

    Each batch multiplies against the full broadcast matrix — O(n²/B)
    flops but fully vectorized and embarrassingly parallel; suitable when
    the normalized matrix fits worker memory (2M × 64-d ≈ 1 GB).  For
    corpora beyond that, use :func:`near_dup_cosine_lsh`.
    Returns (id_a, id_b, sim) with id_a < id_b.
    """
    import ray

    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = full[id_col].to_numpy()
    m_all = _normalize(np.stack(full[vec_col].to_numpy()).astype(np.float64))
    ref = ray.put((ids_all, m_all))

    def pairs(t: pa.Table) -> pa.Table:
        ids_a, m_a = ray.get(ref)
        m = _normalize(_to_matrix(t.column(vec_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sims = m @ m_a.T
        bi, aj = np.nonzero(sims >= threshold)
        keep = ids[bi] < ids_a[aj]          # dedupe + drop self-pairs
        return pa.table({"id_a": pa.array(ids[bi][keep], type=pa.int64()),
                         "id_b": pa.array(ids_a[aj][keep], type=pa.int64()),
                         "sim": pa.array(sims[bi, aj][keep], type=pa.float64())})

    return (
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=batch_size)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def near_dup_cosine_auto(ds, threshold: float = 0.99, vec_col: str = "embedding",
                         id_col: str = "vec_id", batch_size: int = 4096,
                         small_limit: int = 2_000_000, **lsh_kwargs) -> pd.DataFrame:
    """Two-regime cosine near-dup — the automatic size gate (VERDICT r3 #4,
    same pattern as ``find_duplicate_int_keys_two_regime``).

    Below ``small_limit`` rows the exact full-matrix broadcast path runs
    (:func:`near_dup_cosine` — the normalized matrix must fit worker
    memory, 2M × 64-d ≈ 1 GB); above it, the hyperplane-LSH bucketed
    path (:func:`near_dup_cosine_lsh`) takes over with a loud warning
    that recall becomes probabilistic (precision stays exact — every
    emitted pair is cosine-verified).  Callers no longer choose the
    regime by hand; the row count does.
    """
    n = ds.count()
    if n <= small_limit:
        return near_dup_cosine(ds, threshold=threshold, vec_col=vec_col,
                               id_col=id_col, batch_size=batch_size)
    import warnings

    warnings.warn(
        f"near_dup_cosine_auto: {n} rows > small_limit={small_limit}; "
        "switching to the LSH-bucketed path — every emitted pair is "
        "exact-verified, but recall is probabilistic (raise n_tables "
        "to tighten)")
    return near_dup_cosine_lsh(ds, threshold=threshold, vec_col=vec_col,
                               id_col=id_col, batch_size=batch_size,
                               **lsh_kwargs)


def near_dup_cosine_lsh(ds, threshold: float = 0.99, n_planes: int = 16,
                        n_tables: int = 8, vec_col: str = "embedding",
                        id_col: str = "vec_id", batch_size: int = 4096,
                        seed: int = 23, max_bucket: int = 1000) -> pd.DataFrame:
    """Approximate near-dup pairs: random-hyperplane LSH buckets →
    exact cosine verification within colliding buckets.

    The scale path: bucket keys are ints, candidate recovery follows the
    same rare-duplicate-key motif as the dedup family; pair emission and
    verification stay distributed (per-bucket groupby + payload joins),
    so candidate volume is bounded by cluster memory, not the driver.
    Recall rises with n_tables; precision is exact (every emitted pair is
    verified).  Buckets with more than ``max_bucket`` members are skipped
    (with a warning) before membership recovery.
    """
    import ray

    # deterministic hyperplanes from the seed
    first = ds.take(1)
    if not first:
        return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
    d = len(first[0][vec_col])
    rng_vals = splitmix64(
        np.arange(n_tables * n_planes * d, dtype=np.uint64) + np.uint64(seed * 7919)
    ).astype(np.float64) / 2.0**64 - 0.5
    planes = rng_vals.reshape(n_tables, n_planes, d)
    planes_ref = ray.put(planes)

    def batch_keys(t: pa.Table) -> np.ndarray:
        """(n_docs, n_tables) int64 bucket keys for one batch."""
        pl = ray.get(planes_ref)
        m = _normalize(_to_matrix(t.column(vec_col)))
        cols = []
        for tab in range(n_tables):
            signs = (m @ pl[tab].T) > 0                     # (n, n_planes)
            key = np.zeros(m.shape[0], dtype=np.uint64)
            for p in range(n_planes):
                key = (key << np.uint64(1)) | signs[:, p].astype(np.uint64)
            cols.append(splitmix64(key + np.uint64(tab * 0x9E3779B1)).astype(np.int64))
        return np.stack(cols, axis=1) if cols else np.empty((0, 0), dtype=np.int64)

    # pass 1 — collided buckets only (ints-only rare-duplicate-key motif;
    # VERDICT r1 #2: round 1 shipped ALL O(n_tables×N) membership rows to
    # the driver).  Degenerate giant buckets (near-zero vectors etc.) are
    # excluded up front so their memberships never enter the exchange.
    from .dedup import attach_pair_payload, find_duplicate_int_keys, \
        pairs_from_membership

    def bucket_partial(t: pa.Table) -> pa.Table:
        uniq, counts = np.unique(batch_keys(t).ravel(), return_counts=True)
        return pa.table({"key": uniq, "n": counts.astype(np.int64)})

    dup_buckets = find_duplicate_int_keys(
        ds.select_columns([vec_col]), bucket_partial, batch_size)
    if dup_buckets.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
    giant = int((dup_buckets["n"] > max_bucket).sum())
    if giant:
        import warnings

        warnings.warn(
            f"near_dup_cosine_lsh: skipped {giant} bucket(s) with >{max_bucket} "
            "members — recall may be reduced for those regions")
    keep_buckets = dup_buckets[dup_buckets["n"] <= max_bucket]
    if keep_buckets.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
    bucket_ref = ray.put(np.sort(keep_buckets["key"].to_numpy()))

    # pass 2 — memberships for collided buckets only
    def memberships(t: pa.Table) -> pa.Table:
        bucket_sorted = ray.get(bucket_ref)
        keys = batch_keys(t)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        flat = keys.ravel()
        rep_ids = np.repeat(ids, keys.shape[1]) if keys.size else \
            np.empty(0, dtype=np.int64)
        hit = isin_sorted(bucket_sorted, flat)
        return pa.table({"bucket": pa.array(flat[hit]),
                         "doc": pa.array(rep_ids[hit], type=pa.int64())})

    mem = ds.select_columns([id_col, vec_col]).map_batches(
        memberships, batch_format="pyarrow", batch_size=batch_size
    )
    pairs = pairs_from_membership(mem).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})

    # verification: exact cosine, distributed — vectors attach to the
    # pairs via a candidate-pruned scan (rare-dup regime) or bucketed
    # hash joins (huge candidate sets); never a driver dict
    def vec_payload(filter_ids):
        ref = ray.put(np.sort(filter_ids)) if filter_ids is not None else None

        def fn(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            m = _to_matrix(t.column(vec_col))
            if ref is not None:
                sel = isin_sorted(ray.get(ref), ids)
                ids, m = ids[sel], m[sel]
            return pa.table({
                "doc": pa.array(ids, type=pa.int64()),
                "vec": pa.array([row.tobytes() for row in m], type=pa.binary()),
            })

        return ds.select_columns([id_col, vec_col]).map_batches(
            fn, batch_format="pyarrow", batch_size=batch_size)

    withv = attach_pair_payload(pairs, vec_payload, "vec", n_pairs)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        va = _normalize(np.stack([np.frombuffer(b) for b in df["vec_a"]]))
        vb = _normalize(np.stack([np.frombuffer(b) for b in df["vec_b"]]))
        sim = np.einsum("ij,ij->i", va, vb)
        keep = sim >= threshold
        # join output ids may be pandas nullable Int64 — back to plain int64
        return pd.DataFrame({"id_a": df["id_a"].astype("int64").to_numpy()[keep],
                             "id_b": df["id_b"].astype("int64").to_numpy()[keep],
                             "sim": sim[keep]})

    out = withv.map_batches(verify, batch_format="pandas").to_pandas()
    return out.drop_duplicates(["id_a", "id_b"]).sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate nearest neighbour — the second scale path
# ---------------------------------------------------------------------------


def train_ivf_centroids(ds, n_lists: int = 16, sample_mod: int = 1,
                        n_iters: int = 8, vec_col: str = "embedding",
                        id_col: str = "vec_id", seed: int = 31) -> np.ndarray:
    """Deterministic coarse quantizer: k-means on a key-mod sample.

    Sampling is seed-stable (``id % sample_mod == 0`` — never
    random_sample, SURVEY.md §2.7); initial centroids are hash-selected
    sample points; Lloyd iterations are pure numpy on the driver (the
    sample is small by construction); empty clusters re-seed
    deterministically from the farthest points.
    """

    def sample(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % sample_mod == 0))

    sdf = ds.select_columns([id_col, vec_col]).map_batches(
        sample, batch_format="pyarrow"
    ).to_pandas()
    # block arrival order is nondeterministic — canonicalize by id so
    # training is reproducible across runs and parallelism levels
    sdf = sdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
    m = _normalize(np.stack(sdf[vec_col].to_numpy()).astype(np.float64))
    n = m.shape[0]
    pick = np.argsort(splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(seed)))[:n_lists]
    cent = m[pick].copy()
    for _ in range(n_iters):
        sims = m @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(n_lists):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                cent[c] = v / nv if nv else cent[c]
            else:  # deterministic re-seed: farthest point from its centroid
                far = np.argmin(sims[np.arange(n), assign])
                cent[c] = m[far]
    return cent


def ivf_knn(ds, queries: np.ndarray, query_ids: np.ndarray, centroids: np.ndarray,
            k: int = 10, n_probe: int = 4, vec_col: str = "embedding",
            id_col: str = "vec_id", batch_size: int = 4096,
            export_oracle_dir: str | None = None) -> pd.DataFrame:
    """IVF-pruned cosine top-k: each query probes its ``n_probe`` nearest
    lists; every batch assigns its rows to lists vectorized and computes
    similarities only for (query, row) pairs whose lists collide —
    cutting the matmul work to ~n_probe/n_lists of brute force.

    Approximate (a true neighbour assigned to an unprobed list is
    missed); same output schema and deterministic tie-break as
    :func:`knn_cosine`.

    ``export_oracle_dir``: when set, every batch writes its (vec_id,
    list_id) assignments and the driver writes the (query_id, list_id)
    probe table — the SQL oracle recomputes the pruned top-k restricted
    to the probed lists, so the pruned-search logic (not just the
    exhaustive limit) runs under the hash-exact oracle gate.  Centroid
    training itself stays pytest-pinned (recall bound).
    """
    import ray

    if export_oracle_dir is not None:
        import os
        import shutil

        import pyarrow.parquet as pq

        shutil.rmtree(export_oracle_dir, ignore_errors=True)
        os.makedirs(f"{export_oracle_dir}/assign", exist_ok=True)
        os.makedirs(f"{export_oracle_dir}/probes", exist_ok=True)

    q = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(q @ centroids.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    if export_oracle_dir is not None:
        pq.write_table(pa.table({
            "query_id": pa.array(np.repeat(np.asarray(query_ids, dtype=np.int64),
                                           n_probe)),
            "list_id": pa.array(probes.ravel().astype(np.int64)),
        }), f"{export_oracle_dir}/probes/probes.parquet")
    ref = ray.put((q, centroids, probes))

    def partial_topk(t: pa.Table) -> pa.Table:
        qm, cent, prb = ray.get(ref)
        m = _normalize(_to_matrix(t.column(vec_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          "neighbor_id": pa.array([], type=pa.int64()),
                          "sim": pa.array([], type=pa.float64())})
        if m.shape[0] == 0:
            return empty
        assign = np.argmax(m @ cent.T, axis=1)          # list per row
        if export_oracle_dir is not None:
            import uuid

            import pyarrow.parquet as _pq

            _pq.write_table(pa.table({
                "vec_id": pa.array(ids.astype(np.int64)),
                "list_id": pa.array(assign.astype(np.int64)),
            }), f"{export_oracle_dir}/assign/{uuid.uuid4().hex}.parquet")
        out_q, out_n, out_s = [], [], []
        for qi in range(qm.shape[0]):
            sel = np.isin(assign, prb[qi])
            if not sel.any():
                continue
            s = qm[qi] @ m[sel].T
            sub_ids = ids[sel]
            kk = min(k, s.size)
            idx = np.lexsort((sub_ids, -s))[:kk]
            out_q.extend([qi] * kk)
            out_n.extend(sub_ids[idx].tolist())
            out_s.extend(s[idx].tolist())
        if not out_q:
            return empty
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "neighbor_id": pa.array(out_n, type=pa.int64()),
                         "sim": pa.array(out_s, type=pa.float64())})

    parts = ds.map_batches(partial_topk, batch_format="pyarrow",
                           batch_size=batch_size).to_pandas()
    return _merge_topk(parts, query_ids, k)
