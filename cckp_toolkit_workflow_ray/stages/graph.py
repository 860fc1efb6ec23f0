"""Distributed graph analytics over keyed edge streams.

Integer-exact PageRank (Page et al. 1999): every quantity is an int64
— ranks in fixed-point ``scale`` units, per-edge contribution
``(r_src * w) // deg_src`` (floor division on positive ints), damping
applied as the integer ``base + (85 * Σ) // 100`` — so results are
bit-identical at any parallelism / block order and reproducible in
ANSI SQL by unrolled-iteration CTEs.  Dangling-node mass is dropped
(the simplified PageRank variant; every rank still gets the
``(1−d)·scale`` base, so no node vanishes).  Provenance: the reference
workflow has no graph operator (`/root/reference/main.nf` is a linear
validation DAG); this extends the curation family with the standard
link-authority signal used for crawl-frontier prioritisation.

Scale shape — the shared two-regime convention:

* node set ≤ ``broadcast_limit``: the O(nodes) rank/degree tables live
  on the driver and broadcast ONCE PER ITERATION via ``ray.put``; the
  edge Dataset (the big side — edges ≫ nodes on web graphs) streams
  through one ``map_batches`` contribution pass + one sorted-run keyed
  sum per iteration and is never collected.
* beyond the limit: ranks and degrees stay Datasets; each iteration is
  a bucketed ``hash_join`` (edges ⋈ ranks on src) + sorted-run keyed
  sum + LEFT join back onto the node set — two keyed exchanges per
  iteration, no driver table at node cardinality.  Both regimes are
  row-identical (pytest-pinned).

Overflow bound (int64): ``damping_num · Σ contrib ≤ 100 · n_nodes ·
scale`` must stay below 2^63 — at the default ``scale`` 1e9 that is
~10^8 nodes; raise/shrink ``scale`` past that (documented, loud
assert below).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pagerank_int(edges, nodes, n_iters: int = 5, scale: int = 10**9,
                 damping_num: int = 85, damping_den: int = 100,
                 broadcast_limit: int = 2_000_000,
                 seeds: tuple[str, ...] | None = None):
    """Integer-exact PageRank over an aggregated edge Dataset.

    ``edges``: Dataset with columns ``(src, dst, w)`` — already
    key-aggregated, positive int weights.  ``nodes``: Dataset with the
    distinct node column ``host`` (no NULLs).  Returns a Dataset of
    ``(host, out_deg, rank)`` — ``rank`` after ``n_iters`` synchronous
    iterations from the uniform ``scale`` start, ``out_deg`` the total
    out-edge weight (0 for dangling nodes).
    """
    import ray
    import ray.data as rd

    from .groupagg import sorted_reduce_by_key_ds, sorted_sum_by_key
    from .joins import hash_join

    base = (damping_den - damping_num) * scale // damping_den
    # personalized PageRank (``seeds`` non-None): the teleport mass —
    # both the (1−d)·scale base and the start vector — lands ONLY on
    # the seed hosts; everything else in the iteration is unchanged,
    # so the unrolled-CTE reproducibility argument carries over.  The
    # seed set is tiny (closure-shipped), never a shuffle side.
    seed_arr = None if seeds is None else np.sort(
        np.asarray(list(seeds), dtype=object))

    def _base_of(hosts: np.ndarray) -> np.ndarray:
        if seed_arr is None:
            return np.full(len(hosts), base, dtype=np.int64)
        return np.where(pd.Series(hosts).isin(seed_arr), base,
                        0).astype(np.int64)

    def _start_of(hosts: np.ndarray) -> np.ndarray:
        if seed_arr is None:
            return np.full(len(hosts), scale, dtype=np.int64)
        return np.where(pd.Series(hosts).isin(seed_arr), scale,
                        0).astype(np.int64)

    n_nodes = nodes.count()
    if n_nodes == 0:
        return rd.from_pandas(pd.DataFrame({
            "host": pd.Series([], dtype=object),
            "out_deg": pd.Series([], dtype="int64"),
            "rank": pd.Series([], dtype="int64")}))
    assert damping_den * n_nodes * scale < 2**62, (
        "pagerank_int int64 overflow bound: shrink scale for "
        f"{n_nodes} nodes")
    if edges.count() == 0:
        # edgeless graph: every node keeps the base mass only — and an
        # EMPTY edge Dataset has no schema, which would crash the joins
        # (hypothesis finding)
        return nodes.map_batches(
            lambda df: pd.DataFrame({
                "host": df["host"],
                "out_deg": np.zeros(len(df), dtype=np.int64),
                "rank": _base_of(df["host"].to_numpy(dtype=object))}),
            batch_format="pandas")

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"src": pd.Series([], dtype=object),
                                 "deg": pd.Series([], dtype="int64")})
        g = df.groupby("src", as_index=False)["w"].sum()
        return g.rename(columns={"w": "deg"})

    if n_nodes <= broadcast_limit:
        deg_df = sorted_sum_by_key(
            edges.map_batches(deg_partial, batch_format="pandas"),
            ["src"], ["deg"])
        deg_ref = ray.put(deg_df)
        ew = edges.map_batches(
            lambda df: df.merge(ray.get(deg_ref), on="src"),
            batch_format="pandas").materialize()
        hosts_df = nodes.to_pandas()
        ranks = pd.DataFrame({
            "host": hosts_df["host"],
            "r": _start_of(hosts_df["host"].to_numpy(dtype=object))})
        for _ in range(n_iters):
            r_ref = ray.put(ranks)

            def contrib(df: pd.DataFrame, _ref=r_ref) -> pd.DataFrame:
                m = df.merge(ray.get(_ref), left_on="src",
                             right_on="host", how="inner")
                if m.empty:
                    return pd.DataFrame({
                        "dst": pd.Series([], dtype=object),
                        "s": pd.Series([], dtype="int64")})
                s = (m["r"].to_numpy(dtype=np.int64)
                     * m["w"].to_numpy(dtype=np.int64)) \
                    // m["deg"].to_numpy(dtype=np.int64)
                return pd.DataFrame({"dst": m["dst"], "s": s}) \
                    .groupby("dst", as_index=False).sum()

            sums = sorted_sum_by_key(
                ew.map_batches(contrib, batch_format="pandas"),
                ["dst"], ["s"])
            merged = hosts_df.merge(
                sums.rename(columns={"dst": "host"}), on="host",
                how="left")
            sval = merged["s"].fillna(0).to_numpy(dtype=np.int64) \
                if "s" in merged else np.zeros(len(merged),
                                               dtype=np.int64)
            ranks = pd.DataFrame({
                "host": merged["host"],
                "r": _base_of(merged["host"].to_numpy(dtype=object))
                + (damping_num * sval) // damping_den})
        out = hosts_df[["host"]].merge(
            deg_df.rename(columns={"src": "host", "deg": "out_deg"}),
            on="host", how="left")
        out["out_deg"] = out["out_deg"].fillna(0).astype(np.int64) \
            if "out_deg" in out else np.zeros(len(out), dtype=np.int64)
        out = out.merge(ranks.rename(columns={"r": "rank"}), on="host")
        out["rank"] = out["rank"].astype(np.int64)
        return rd.from_pandas(
            out.sort_values("host").reset_index(drop=True))

    # ---- bucketed regime: no driver table at node cardinality ----
    deg_ds = sorted_reduce_by_key_ds(
        edges.map_batches(deg_partial, batch_format="pandas"),
        ["src"], {"deg": "sum"})
    ew = hash_join(edges, deg_ds, on="src").materialize()
    ranks_ds = nodes.map_batches(
        lambda df: pd.DataFrame({
            "src": df["host"],
            "r": _start_of(df["host"].to_numpy(dtype=object))}),
        batch_format="pandas").materialize()
    for _ in range(n_iters):
        joined = hash_join(ew, ranks_ds, on="src")

        def contrib_b(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"dst": pd.Series([], dtype=object),
                                     "s": pd.Series([], dtype="int64")})
            s = (df["r"].to_numpy(dtype=np.int64)
                 * df["w"].to_numpy(dtype=np.int64)) \
                // df["deg"].to_numpy(dtype=np.int64)
            return pd.DataFrame({"dst": df["dst"], "s": s}) \
                .groupby("dst", as_index=False).sum()

        sums_ds = sorted_reduce_by_key_ds(
            joined.map_batches(contrib_b, batch_format="pandas"),
            ["dst"], {"s": "sum"}).map_batches(
                lambda df: df.rename(columns={"dst": "src"}),
                batch_format="pandas")
        ranks_ds = hash_join(nodes.map_batches(
            lambda df: df.rename(columns={"host": "src"}),
            batch_format="pandas"), sums_ds, on="src", how="left") \
            .map_batches(
                lambda df: pd.DataFrame({
                    "src": df["src"],
                    "r": _base_of(df["src"].to_numpy(dtype=object))
                    + (damping_num * df["s"].fillna(0)
                       .to_numpy(dtype=np.int64))
                    // damping_den}),
                batch_format="pandas").materialize()
    out_ds = hash_join(
        ranks_ds.map_batches(
            lambda df: df.rename(columns={"src": "host", "r": "rank"}),
            batch_format="pandas"),
        deg_ds.map_batches(
            lambda df: df.rename(columns={"src": "host",
                                          "deg": "out_deg"}),
            batch_format="pandas"),
        on="host", how="left")
    return out_ds.map_batches(
        lambda df: pd.DataFrame({
            "host": df["host"],
            "out_deg": df["out_deg"].fillna(0).astype(np.int64),
            "rank": df["rank"].astype(np.int64)}),
        batch_format="pandas")


def connected_components_str(edges, nodes, max_rounds: int = 64,
                             driver_limit: int = 2_000_000):
    """Connected components over STRING-keyed undirected edges →
    Dataset ``(host, component)`` with component = lexicographic MIN
    host of the component (the SQL-recursive-CTE-reproducible rep).

    Two regimes (the ``cluster_near_dups`` convention, string keys):
    at or below ``driver_limit`` edges, a driver union-find with path
    compression (the pair set is already aggregated/bounded); beyond
    it, iterative distributed min-label propagation — each round
    attaches labels to edge sources (bucketed hash join), edges forward
    ``label`` to their targets, and a sorted-run keyed MIN produces the
    new labels.  Labels decrease monotonically (lexicographically) to
    the component minimum; RAISES after ``max_rounds`` without
    convergence rather than returning possibly-wrong components (the
    dedup-CC policy).  Both regimes are row-identical (pytest-pinned).
    """
    import ray.data as rd

    from .groupagg import sorted_reduce_by_key_ds
    from .joins import hash_join

    if nodes.count() == 0:
        return rd.from_pandas(pd.DataFrame({
            "host": pd.Series([], dtype=object),
            "component": pd.Series([], dtype=object)}))

    # undirected: every edge both ways, weights irrelevant
    und = edges.map_batches(
        lambda df: pd.concat([
            df[["src", "dst"]],
            df[["src", "dst"]].rename(
                columns={"src": "dst", "dst": "src"})[["src", "dst"]],
        ], ignore_index=True).drop_duplicates() if len(df) else
        pd.DataFrame({"src": pd.Series([], dtype=object),
                      "dst": pd.Series([], dtype=object)}),
        batch_format="pandas").materialize()

    if und.count() == 0:
        # edgeless: every node is its own component (an empty Dataset
        # has no schema, which would crash the propagation joins —
        # hypothesis finding)
        return nodes.map_batches(
            lambda df: pd.DataFrame({"host": df["host"],
                                     "component": df["host"]}),
            batch_format="pandas")

    if und.count() <= driver_limit:
        e = und.to_pandas()
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(e["src"], e["dst"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        hosts = nodes.to_pandas()["host"]
        out = pd.DataFrame({
            "host": hosts,
            "component": [find(h) for h in hosts]})
        return rd.from_pandas(
            out.sort_values("host").reset_index(drop=True))

    labels = nodes.map_batches(
        lambda df: pd.DataFrame({"src": df["host"],
                                 "label": df["host"]}),
        batch_format="pandas").materialize()
    for _ in range(max_rounds):
        # forward each node's label across its out-edges, keep the
        # per-node min of (own label, incoming labels)
        fwd = hash_join(und, labels, on="src").map_batches(
            lambda df: pd.DataFrame({"src": df["dst"],
                                     "label": df["label"]}),
            batch_format="pandas")
        new_labels = sorted_reduce_by_key_ds(
            labels.union(fwd), ["src"], {"label": "min"}).materialize()
        changed = hash_join(
            new_labels.map_batches(
                lambda df: df.rename(columns={"label": "new"}),
                batch_format="pandas"),
            labels, on="src").map_batches(
                lambda df: pd.DataFrame(
                    {"c": np.array([int((df["new"] != df["label"])
                                        .sum())], dtype=np.int64)}),
                batch_format="pandas").sum("c")
        labels = new_labels
        if not changed:
            return labels.map_batches(
                lambda df: pd.DataFrame({"host": df["src"],
                                         "component": df["label"]}),
                batch_format="pandas")
    raise RuntimeError(
        f"connected_components_str: no convergence in {max_rounds} "
        "rounds — raise max_rounds (graph diameter exceeds it)")


def triangle_count_exact(ce, n_edges: int | None = None,
                         broadcast_limit: int = 2_000_000,
                         n_buckets: int = 64) -> int:
    """Exact triangle count of a simple undirected graph given as a
    canonical edge Dataset ``ce`` with columns ``(u, v)`` — distinct
    rows, ``u < v`` lexicographically, no self-loops (the
    ``triangle_count`` query surface produces exactly this shape).

    Two regimes (the shared ``broadcast_limit`` convention):

    * ``n_edges <= broadcast_limit`` — the O(edges) adjacency index
      (host → sorted neighbor array) broadcasts ONCE via ``ray.put``
      and the edge Dataset streams through a per-batch
      ``np.intersect1d(assume_unique=True)`` pass, counting each
      triangle u < v < z once at its (u, v) edge.

    * beyond the limit — the DISTRIBUTED degree-oriented wedge join
      (Schank & Wagner 2005 / Suri & Vassilvitskii WWW'11 shape): each
      edge is directed from its lower-(degree, id) endpoint to the
      higher, so every out-degree is O(sqrt(2m)) in aggregate and the
      total wedge volume is O(m^1.5); each triangle then has exactly
      ONE apex whose two out-edges cover it, so counting = joining the
      wedge stream (pairs of out-neighbors, keyed by the lexicographic
      (min, max) closing pair) against the canonical edge set.  Four
      keyed exchanges total — two bucketed ``hash_join``s to attach
      endpoint degrees, one range sort for run-contiguous wedge
      emission, one bucketed ``hash_join`` for the closing-edge
      membership — and no driver-side table at node or edge
      cardinality.  Both regimes are row-identical (pytest-pinned on
      random graphs).
    """
    import ray
    import ray.data as rd

    from .joins import hash_join
    from .ranking import _edge_mask

    if n_edges is None:
        n_edges = ce.count()
    if n_edges == 0:
        return 0

    if n_edges <= broadcast_limit:
        cedf = ce.to_pandas()
        adj: dict[str, np.ndarray] = {
            h: np.sort(g.to_numpy(dtype=object)) for h, g in pd.concat([
                cedf.rename(columns={"u": "h", "v": "nb"}),
                cedf.rename(columns={"v": "h", "u": "nb"})[["h", "nb"]],
            ], ignore_index=True).groupby("h")["nb"]}
        adj_ref = ray.put(adj)

        def tri_partial(df: pd.DataFrame, _ref=adj_ref) -> pd.DataFrame:
            a = ray.get(_ref)
            tot = 0
            for u, v in zip(df["u"].to_numpy(dtype=object),
                            df["v"].to_numpy(dtype=object)):
                common = np.intersect1d(a[u], a[v], assume_unique=True)
                tot += int((common > v).sum())
            return pd.DataFrame({"t": pd.Series([tot], dtype="int64")})

        n_tri = ce.map_batches(tri_partial, batch_format="pandas").sum("t")
        return int(n_tri or 0)

    # ---- wedge-join regime ----
    from .groupagg import sorted_reduce_by_key_ds

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "h": np.concatenate([df["u"].to_numpy(dtype=object),
                                 df["v"].to_numpy(dtype=object)]),
            "n": np.ones(2 * len(df), dtype=np.int64)})

    deg = sorted_reduce_by_key_ds(
        ce.map_batches(endpoints, batch_format="pandas"),
        ["h"], {"n": "sum"}, driver_limit=0)

    deg_u = deg.map_batches(
        lambda df: df.rename(columns={"h": "u", "n": "du"}),
        batch_format="pandas")
    deg_v = deg.map_batches(
        lambda df: df.rename(columns={"h": "v", "n": "dv"}),
        batch_format="pandas")
    with_deg = hash_join(
        hash_join(ce, deg_u, on="u", n_buckets=n_buckets),
        deg_v, on="v", n_buckets=n_buckets)

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object)})
        du = df["du"].to_numpy(dtype=np.int64)
        dv = df["dv"].to_numpy(dtype=np.int64)
        uu = df["u"].to_numpy(dtype=object)
        vv = df["v"].to_numpy(dtype=object)
        # total order (degree, id): u < v lexicographically already, so
        # a degree tie always orients u -> v
        u_first = du <= dv
        return pd.DataFrame({"a": np.where(u_first, uu, vv),
                             "b": np.where(u_first, vv, uu)})

    sorted_out = with_deg.map_batches(orient, batch_format="pandas") \
        .sort("a").materialize()

    _W_EMPTY = pd.DataFrame({"x": pd.Series([], dtype=object),
                             "y": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})

    def _emit(df: pd.DataFrame) -> pd.DataFrame:
        """All out-neighbor pairs per source run (df sorted by ``a``),
        keyed by the lexicographic closing pair, pre-combined."""
        if len(df) < 2:
            return _W_EMPTY
        a = df["a"].to_numpy(dtype=object)
        b = df["b"].to_numpy(dtype=object)
        starts = np.concatenate([[0], np.flatnonzero(a[1:] != a[:-1]) + 1,
                                 [len(a)]])
        xs, ys = [], []
        # per-RUN loop (not per-row): inner pair emission is vectorized;
        # degree orientation bounds each run at O(sqrt(2m)) neighbors
        for s, e in zip(starts[:-1], starts[1:]):
            k = e - s
            if k < 2:
                continue
            nb = np.sort(b[s:e])
            i, j = np.triu_indices(k, 1)
            xs.append(nb[i])
            ys.append(nb[j])
        if not xs:
            return _W_EMPTY
        out = pd.DataFrame({"x": np.concatenate(xs),
                            "y": np.concatenate(ys)})
        out["n"] = np.int64(1)
        return out.groupby(["x", "y"], as_index=False)["n"].sum()

    def interior(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _W_EMPTY
        return _emit(df[~_edge_mask(df, ["a"])])

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return df[_edge_mask(df, ["a"])] if len(df) else df

    wedges = sorted_out.map_batches(
        interior, batch_format="pandas", batch_size=None)
    boundary = sorted_out.map_batches(
        edge_rows, batch_format="pandas", batch_size=None).to_pandas()
    if len(boundary):
        bw = _emit(boundary.sort_values(["a", "b"]).reset_index(drop=True))
        if len(bw):
            wedges = wedges.union(rd.from_pandas(bw))

    closing = ce.map_batches(
        lambda df: df.rename(columns={"u": "x", "v": "y"}),
        batch_format="pandas")
    matched = hash_join(wedges, closing, on=["x", "y"],
                        n_buckets=n_buckets)
    n_tri = matched.map_batches(
        lambda df: pd.DataFrame({"t": np.array(
            [int(df["n"].sum())], dtype=np.int64)}),
        batch_format="pandas").sum("t")
    return int(n_tri or 0)


def kcore_edges(ce, k: int = 2, n_rounds: int = 8,
                broadcast_limit: int = 2_000_000):
    """Iterative k-core peeling over a canonical undirected edge
    Dataset ``ce`` (columns ``(u, v)``, distinct, u < v, no
    self-loops): each round drops every node whose current degree is
    below ``k`` and every edge touching one, for EXACTLY ``n_rounds``
    synchronous rounds — the fixed-round convention of
    ``pagerank_int``, so the result is reproducible by ``n_rounds``
    unrolled SQL CTEs whether or not peeling has converged.  Peeling
    is monotone, so a round that removes nothing is a fixed point and
    iteration stops early (identical result, fewer exchanges).

    Two regimes per round (the shared ``broadcast_limit`` convention):
    a qualifying-node set at or below the limit broadcasts ONCE via
    ``ray.put`` and the edge Dataset filters in one streaming pass;
    beyond it the filter is two bucketed ``hash_join``s (edges ⋈ keep
    on u, then on v) with no driver table.  Returns the surviving edge
    Dataset."""
    import ray

    from .groupagg import sorted_reduce_by_key_ds
    from .joins import hash_join

    edges = ce.materialize()
    n_prev = edges.count()
    if n_prev == 0:
        return edges

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "h": np.concatenate([df["u"].to_numpy(dtype=object),
                                 df["v"].to_numpy(dtype=object)]),
            "n": np.ones(2 * len(df), dtype=np.int64)})

    for _ in range(n_rounds):
        deg = sorted_reduce_by_key_ds(
            edges.map_batches(endpoints, batch_format="pandas"),
            ["h"], {"n": "sum"})
        keep = deg.map_batches(lambda df: df[df["n"] >= k],
                               batch_format="pandas")
        n_keep = keep.count()
        if n_keep == 0:
            return edges.map_batches(lambda df: df.iloc[:0],
                                     batch_format="pandas").materialize()
        if n_keep <= broadcast_limit:
            keep_ref = ray.put(np.sort(
                keep.to_pandas()["h"].to_numpy(dtype=object)))

            def filt(df: pd.DataFrame, _ref=keep_ref) -> pd.DataFrame:
                if df.empty:
                    return df
                ks = ray.get(_ref)
                iu = np.searchsorted(ks, df["u"].to_numpy(dtype=object))
                iv = np.searchsorted(ks, df["v"].to_numpy(dtype=object))
                ok_u = (iu < len(ks)) & (
                    ks[np.minimum(iu, len(ks) - 1)]
                    == df["u"].to_numpy(dtype=object))
                ok_v = (iv < len(ks)) & (
                    ks[np.minimum(iv, len(ks) - 1)]
                    == df["v"].to_numpy(dtype=object))
                return df[ok_u & ok_v]

            edges = edges.map_batches(
                filt, batch_format="pandas").materialize()
        else:
            keep_u = keep.map_batches(
                lambda df: df[["h"]].rename(columns={"h": "u"}),
                batch_format="pandas")
            keep_v = keep.map_batches(
                lambda df: df[["h"]].rename(columns={"h": "v"}),
                batch_format="pandas")
            edges = hash_join(hash_join(edges, keep_u, on="u"),
                              keep_v, on="v").materialize()
        n_now = edges.count()
        if n_now == n_prev:
            break
        n_prev = n_now
    return edges


def neighbor_pair_counts(nb, max_degree: int | None = None):
    """Common-neighbor counts for every node pair of an undirected
    graph: ``nb`` is the both-directions adjacency Dataset ``(c, n)``
    (center, neighbor — one row per directed edge, no duplicates), and
    the result Dataset ``(host_a, host_b, common)`` counts, for each
    unordered pair with ``host_a < host_b``, the centers adjacent to
    both — the wedge-counting primitive behind neighborhood-Jaccard
    link similarity.

    Shape: the ``pairs_from_membership`` sorted-run motif with COUNT
    (not distinct-pair) semantics — one range sort by (c, n); within a
    block every center is a contiguous run, so pair emission for
    block-INTERIOR runs is one vectorized numpy pass (repeat/cumsum
    index arithmetic, no per-center Python) and only the ≤2 block-EDGE
    runs per block go through an exact per-group pass; per-pair counts
    then combine in one keyed exchange.  Wedge volume is Σ_c C(d_c, 2)
    — the operator's intrinsic cost, O(m²/n) on skew-free graphs.
    ``max_degree`` (optional) skips hub centers above the bound with a
    LOUD warning (recall cap, never silent — the `cap_giant_buckets`
    convention); callers owning an oracle must leave it None.
    """
    from .groupagg import sorted_reduce_by_key_ds

    _EMPTY = pd.DataFrame({"host_a": pd.Series([], dtype=object),
                           "host_b": pd.Series([], dtype=object),
                           "common": pd.Series([], dtype="int64")})

    def _warn_hub(size: int) -> None:
        import warnings

        warnings.warn(
            f"neighbor_pair_counts: skipped a center with degree "
            f"{size} (> max_degree={max_degree}) — common-neighbor "
            "counts through that hub are lost")

    def emit_run(vals: np.ndarray) -> pd.DataFrame:
        d = vals.size
        if d < 2:
            return _EMPTY
        if max_degree is not None and d > max_degree:
            _warn_hub(int(d))
            return _EMPTY
        ia, ib = np.triu_indices(d, k=1)
        return pd.DataFrame({"host_a": vals[ia], "host_b": vals[ib],
                             "common": np.ones(ia.size, dtype=np.int64)})

    def emit_group(g: pd.DataFrame) -> pd.DataFrame:
        out = emit_run(np.sort(g["n"].to_numpy(dtype=object)))
        if out.empty:
            return _EMPTY
        return out.groupby(["host_a", "host_b"], as_index=False).sum()

    sorted_nb = nb.sort(["c", "n"]).materialize()

    def emit_interior(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return _EMPTY
        c = df["c"].to_numpy(dtype=object)
        new = np.ones(c.size, dtype=bool)
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        if starts.size <= 2:
            return _EMPTY
        lens = np.diff(np.append(starts, c.size))
        s, L = starts[1:-1], lens[1:-1]          # interior runs only
        if max_degree is not None:
            hub = L > max_degree
            if hub.any():
                for sz in L[hub]:
                    _warn_hub(int(sz))
                s, L = s[~hub], L[~hub]
        pairable = L >= 2
        s, L = s[pairable], L[pairable]
        if s.size == 0:
            return _EMPTY
        n_elems = int(L.sum())
        excl = np.cumsum(L) - L
        pos_in_run = np.arange(n_elems) - np.repeat(excl, L)
        row = np.repeat(s, L) + pos_in_run
        after = np.repeat(L, L) - 1 - pos_in_run
        total = int(after.sum())
        if total == 0:
            return _EMPTY
        off = np.cumsum(after) - after
        a_rows = np.repeat(row, after)
        b_rows = a_rows + (np.arange(total) - np.repeat(off, after)) + 1
        v = df["n"].to_numpy(dtype=object)
        out = pd.DataFrame({"host_a": v[a_rows], "host_b": v[b_rows],
                            "common": np.ones(total, dtype=np.int64)})
        return out.groupby(["host_a", "host_b"], as_index=False).sum()

    def extract_edges(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        c = df["c"].to_numpy(dtype=object)
        return df[(c == c[0]) | (c == c[-1])]

    # batch_size=None → one call per block, so "block edge" is
    # well-defined and both passes see the same block boundaries
    ipairs = sorted_nb.map_batches(emit_interior, batch_format="pandas",
                                   batch_size=None)
    epairs = sorted_nb.map_batches(extract_edges, batch_format="pandas",
                                   batch_size=None) \
        .groupby("c").map_groups(emit_group, batch_format="pandas") \
        .map_batches(lambda df: df[["host_a", "host_b", "common"]]
                     if len(df) else _EMPTY, batch_format="pandas")
    return sorted_reduce_by_key_ds(ipairs.union(epairs),
                                   ["host_a", "host_b"],
                                   {"common": "sum"})


def hits_int(edges, nodes, n_iters: int = 2, scale: int = 10**6,
             broadcast_limit: int = 2_000_000):
    """Integer-exact HITS hubs/authorities (Kleinberg 1999) over an
    aggregated directed edge Dataset ``(src, dst, w)``.

    Instead of the float L2 normalisation of classic HITS — whose
    distributed float sums would be order-sensitive — each half-step
    renormalises with an INTEGER divisor: after computing the raw
    scores ``h_raw(u) = Σ_{u→v} w·a(v)`` the whole vector is floor-
    divided by ``max(1, ΣH // (n·scale))``, which keeps every score in
    O(n·scale) fixed-point units and is bit-reproducible in SQL's
    unrolled CTEs at any parallelism (the ``pagerank_int``
    convention).  ``a`` starts uniform at ``scale``.  Returns a
    Dataset ``(host, hub, auth)`` after ``n_iters`` full iterations.

    Regimes (the shared two-regime convention): node table broadcast
    via ``ray.put`` once per half-step below ``broadcast_limit``
    nodes, bucketed hash joins + sorted-run keyed sums beyond; both
    pytest-pinned row-identical.  int64 overflow bound:
    ``2·Σw·n·scale < 2⁶²`` (loud assert) — at the default 1e6 scale
    that is ~10⁹ edge-weight × node product; shrink ``scale`` past
    that."""
    import ray
    import ray.data as rd

    from .groupagg import sorted_reduce_by_key_ds, sorted_sum_by_key
    from .joins import hash_join

    n_nodes = nodes.count()
    empty = pd.DataFrame({"host": pd.Series([], dtype=object),
                          "hub": pd.Series([], dtype="int64"),
                          "auth": pd.Series([], dtype="int64")})
    if n_nodes == 0:
        return rd.from_pandas(empty)

    def _zeros():
        return nodes.map_batches(
            lambda df: pd.DataFrame({
                "host": df["host"],
                "hub": np.zeros(len(df), dtype=np.int64),
                "auth": np.zeros(len(df), dtype=np.int64)}),
            batch_format="pandas")

    if edges.count() == 0:
        # no edges: one half-step zeroes every score (empty edge
        # Datasets also have no schema for the joins)
        return _zeros()

    total_w = int(edges.map_batches(
        lambda df: pd.DataFrame({"w": [df["w"].sum()]}),
        batch_format="pandas").to_pandas()["w"].sum())
    assert 2 * total_w * n_nodes * scale < 2**62, (
        "hits_int int64 overflow bound: shrink scale for "
        f"{n_nodes} nodes / total edge weight {total_w}")
    floor_div = n_nodes * scale

    _S_EMPTY_SRC = pd.DataFrame({"src": pd.Series([], dtype=object),
                                 "s": pd.Series([], dtype="int64")})
    _S_EMPTY_DST = pd.DataFrame({"dst": pd.Series([], dtype=object),
                                 "s": pd.Series([], dtype="int64")})

    if n_nodes <= broadcast_limit:
        hosts_df = nodes.to_pandas()

        def half_step(score: pd.DataFrame, score_col: str,
                      join_on: str, group_to: str) -> pd.DataFrame:
            """raw = Σ w·score joined on ``join_on``, grouped to
            ``group_to``; then the integer renormalise."""
            ref = ray.put(score)
            emp = _S_EMPTY_SRC if group_to == "src" else _S_EMPTY_DST

            def contrib(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
                m = df.merge(ray.get(_ref), left_on=join_on,
                             right_on="host", how="inner")
                if m.empty:
                    return emp
                s = m["w"].to_numpy(dtype=np.int64) \
                    * m[score_col].to_numpy(dtype=np.int64)
                return pd.DataFrame({group_to: m[group_to], "s": s}) \
                    .groupby(group_to, as_index=False).sum()

            raw = sorted_sum_by_key(
                edges.map_batches(contrib, batch_format="pandas"),
                [group_to], ["s"])
            total = int(raw["s"].sum()) if "s" in raw else 0
            div = max(1, total // floor_div)
            merged = hosts_df.merge(
                raw.rename(columns={group_to: "host"}), on="host",
                how="left")
            sval = merged["s"].fillna(0).to_numpy(dtype=np.int64) \
                if "s" in merged else np.zeros(len(merged),
                                               dtype=np.int64)
            return pd.DataFrame({"host": merged["host"],
                                 "val": sval // div})

        a = pd.DataFrame({"host": hosts_df["host"],
                          "a": np.full(len(hosts_df), scale,
                                       dtype=np.int64)})
        h = None
        for _ in range(n_iters):
            h = half_step(a, "a", "dst", "src") \
                .rename(columns={"val": "h"})
            a = half_step(h, "h", "src", "dst") \
                .rename(columns={"val": "a"})
        out = hosts_df[["host"]].merge(
            h.rename(columns={"h": "hub"}), on="host").merge(
            a.rename(columns={"a": "auth"}), on="host")
        out["hub"] = out["hub"].astype(np.int64)
        out["auth"] = out["auth"].astype(np.int64)
        return rd.from_pandas(
            out.sort_values("host").reset_index(drop=True))

    # ---- bucketed regime: no driver table at node cardinality ----
    node_src = nodes.map_batches(
        lambda df: df.rename(columns={"host": "src"}),
        batch_format="pandas").materialize()
    node_dst = nodes.map_batches(
        lambda df: df.rename(columns={"host": "dst"}),
        batch_format="pandas").materialize()

    def half_step_b(score_ds, in_col: str, join_on: str,
                    group_to: str, out_col: str):
        joined = hash_join(edges, score_ds, on=join_on)
        emp = _S_EMPTY_SRC if group_to == "src" else _S_EMPTY_DST

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return emp
            s = df["w"].to_numpy(dtype=np.int64) \
                * df[in_col].to_numpy(dtype=np.int64)
            return pd.DataFrame({group_to: df[group_to], "s": s}) \
                .groupby(group_to, as_index=False).sum()

        raw = sorted_reduce_by_key_ds(
            joined.map_batches(contrib, batch_format="pandas"),
            [group_to], {"s": "sum"}).materialize()
        total = int(raw.map_batches(
            lambda df: pd.DataFrame({"s": [df["s"].sum()]}),
            batch_format="pandas").to_pandas()["s"].sum())
        div = max(1, total // floor_div)
        side = node_src if group_to == "src" else node_dst
        return hash_join(side, raw, on=group_to, how="left") \
            .map_batches(
                lambda df: pd.DataFrame({
                    group_to: df[group_to],
                    out_col: df["s"].fillna(0)
                    .to_numpy(dtype=np.int64) // div}),
                batch_format="pandas").materialize()

    a_ds = node_dst.map_batches(
        lambda df: pd.DataFrame({
            "dst": df["dst"],
            "a": np.full(len(df), scale, dtype=np.int64)}),
        batch_format="pandas").materialize()
    h_ds = None
    for _ in range(n_iters):
        h_ds = half_step_b(a_ds, "a", "dst", "src", "h")
        a_ds = half_step_b(h_ds, "h", "src", "dst", "a")
    hub = h_ds.map_batches(
        lambda df: df.rename(columns={"src": "host", "h": "hub"}),
        batch_format="pandas")
    auth = a_ds.map_batches(
        lambda df: df.rename(columns={"dst": "host", "a": "auth"}),
        batch_format="pandas")
    return hash_join(hub, auth, on="host").map_batches(
        lambda df: pd.DataFrame({
            "host": df["host"],
            "hub": df["hub"].astype(np.int64),
            "auth": df["auth"].astype(np.int64)}),
        batch_format="pandas")


def bfs_depths_str(edges, nodes, source: str, max_depth: int = 8,
                   driver_limit: int = 2_000_000):
    """Hop distance (unweighted BFS depth) from ``source`` over
    STRING-keyed undirected edges → Dataset ``(host, depth)``, depth
    NULL (NaN) for nodes farther than ``max_depth`` — the bounded
    frontier primitive behind crawl-radius and seed-expansion
    analyses.

    Semantics are min-distance propagation run for EXACTLY
    ``max_depth`` synchronous rounds (the `kcore_edges` fixed-round
    convention — reproducible by ``max_depth`` unrolled SQL CTE
    rounds; the monotone fixed point makes early-exit rounds free):
    after k rounds a node at true distance d ≤ k holds exactly d, any
    farther node holds NULL.  Two regimes: a driver BFS over the
    collected edge list at or below ``driver_limit`` edges, else
    per-round bucketed hash join + sorted-run keyed MIN (the
    `connected_components_str` shape).  Both pytest-pinned
    row-identical."""
    import ray.data as rd

    from .groupagg import sorted_reduce_by_key_ds
    from .joins import hash_join

    if nodes.count() == 0:
        return rd.from_pandas(pd.DataFrame({
            "host": pd.Series([], dtype=object),
            "depth": pd.Series([], dtype="float64")}))

    und = edges.map_batches(
        lambda df: pd.concat([
            df[["src", "dst"]],
            df[["src", "dst"]].rename(
                columns={"src": "dst", "dst": "src"})[["src", "dst"]],
        ], ignore_index=True).drop_duplicates() if len(df) else
        pd.DataFrame({"src": pd.Series([], dtype=object),
                      "dst": pd.Series([], dtype=object)}),
        batch_format="pandas").materialize()

    def _surface(dist: pd.DataFrame) -> pd.DataFrame:
        out = dist.sort_values("host").reset_index(drop=True)
        # int64 when fully reachable, float64 (NaN = unreachable)
        # otherwise — the oracle BIGINT-column convention
        out["depth"] = out["depth"].astype(
            "int64" if out["depth"].notna().all() else "float64")
        return out

    n_und = und.count()
    if n_und == 0:
        return nodes.map_batches(
            lambda df: pd.DataFrame({
                "host": df["host"],
                "depth": np.where(
                    df["host"].to_numpy(dtype=object) == source,
                    0.0, np.nan)}),
            batch_format="pandas")

    if n_und <= driver_limit:
        e = und.to_pandas()
        adj: dict = {}
        for a, b in zip(e["src"], e["dst"]):
            adj.setdefault(a, []).append(b)
        dist = {source: 0}
        frontier = [source]
        for d in range(1, max_depth + 1):
            nxt = []
            for c in frontier:
                for n in adj.get(c, ()):
                    if n not in dist:
                        dist[n] = d
                        nxt.append(n)
            if not nxt:
                break
            frontier = nxt
        hosts = nodes.to_pandas()["host"]
        return rd.from_pandas(_surface(pd.DataFrame({
            "host": hosts,
            "depth": [float(dist[h]) if h in dist else np.nan
                      for h in hosts]})))

    # ---- bucketed regime: (src, d) Dataset, min-propagation ----
    dist_ds = nodes.map_batches(
        lambda df: pd.DataFrame({
            "src": df["host"],
            "d": np.where(df["host"].to_numpy(dtype=object) == source,
                          np.int64(0), np.int64(2**62))}),
        batch_format="pandas").materialize()
    for _ in range(max_depth):
        fwd = hash_join(und, dist_ds, on="src").map_batches(
            lambda df: pd.DataFrame({
                "src": df["dst"],
                "d": df["d"].to_numpy(dtype=np.int64) + 1}),
            batch_format="pandas")
        new = sorted_reduce_by_key_ds(
            dist_ds.union(fwd), ["src"], {"d": "min"}).materialize()
        changed = hash_join(
            new.map_batches(
                lambda df: df.rename(columns={"d": "nd"}),
                batch_format="pandas"),
            dist_ds, on="src").map_batches(
                lambda df: pd.DataFrame(
                    {"c": np.array([int((df["nd"] != df["d"]).sum())],
                                   dtype=np.int64)}),
                batch_format="pandas").sum("c")
        dist_ds = new
        if not changed:
            break
    out = dist_ds.map_batches(
        lambda df: pd.DataFrame({
            "host": df["src"],
            "depth": np.where(
                df["d"].to_numpy(dtype=np.int64) > max_depth,
                np.nan, df["d"].to_numpy(dtype=np.int64)
                .astype(np.float64))}),
        batch_format="pandas").to_pandas()
    return rd.from_pandas(_surface(out))
