"""pagerank_int: regime equivalence + semantics pins.

The query-level result is SQL-oracled (``pagerank_hosts`` in the
conformance sweep); these tests pin what the oracle cannot see — that
the bucketed no-driver-table regime is row-identical to the broadcast
regime, and the integer semantics of dangling/isolated nodes.
"""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from cckp_toolkit_workflow_ray.stages.graph import pagerank_int

SCALE = 10**9
BASE = 15 * SCALE // 100


def _fixture():
    # a -> b (2), a -> c (1), b -> c (1); d isolated (no edges at all),
    # c dangling (in-edges only)
    edges = rd.from_pandas(pd.DataFrame({
        "src": ["a", "a", "b"],
        "dst": ["b", "c", "c"],
        "w": np.array([2, 1, 1], dtype=np.int64)}))
    nodes = rd.from_pandas(pd.DataFrame({"host": ["a", "b", "c", "d"]}))
    return edges, nodes


def _run(broadcast_limit, n_iters=3):
    edges, nodes = _fixture()
    return pagerank_int(edges, nodes, n_iters=n_iters,
                        broadcast_limit=broadcast_limit).to_pandas() \
        .sort_values("host").reset_index(drop=True)


def test_regimes_row_identical(ray_session):
    a = _run(broadcast_limit=2_000_000)
    b = _run(broadcast_limit=0)  # forces the bucketed no-driver path
    pd.testing.assert_frame_equal(a, b, check_like=True)


def test_integer_semantics(ray_session):
    out = _run(broadcast_limit=2_000_000, n_iters=1).set_index("host")
    # isolated + dangling nodes keep the base mass only
    assert out.loc["a", "rank"] == BASE
    assert out.loc["d", "rank"] == BASE
    assert out.loc["d", "out_deg"] == 0
    # one iteration from uniform start: b gets a's 2/3 share,
    # c gets a's 1/3 + b's all — exact floor arithmetic
    assert out.loc["b", "rank"] == BASE + (85 * ((SCALE * 2) // 3)) // 100
    assert out.loc["c", "rank"] == BASE + (
        85 * ((SCALE * 1) // 3 + SCALE)) // 100
    assert out.loc["a", "out_deg"] == 3


def test_empty_graph(ray_session):
    edges = rd.from_pandas(pd.DataFrame({
        "src": pd.Series([], dtype=object),
        "dst": pd.Series([], dtype=object),
        "w": pd.Series([], dtype="int64")}))
    nodes = rd.from_pandas(pd.DataFrame({
        "host": pd.Series([], dtype=object)}))
    out = pagerank_int(edges, nodes).to_pandas()
    # Ray drops the schema of fully-empty datasets — the typed-empty
    # column guarantee lives at the query surface (see the
    # pagerank_hosts entry in test_queries_survive_empty_corpus)
    assert len(out) == 0


def test_overflow_guard(ray_session):
    edges, nodes = _fixture()
    with pytest.raises(AssertionError, match="overflow"):
        pagerank_int(edges, nodes, scale=2**62)


# ---------------------------------------------------------------------------
# connected_components_str
# ---------------------------------------------------------------------------

from cckp_toolkit_workflow_ray.stages.graph import connected_components_str


def _cc_fixture():
    # two components {a,b,c} (chain) and {x,y}; z isolated
    edges = rd.from_pandas(pd.DataFrame({
        "src": ["b", "c", "y"],
        "dst": ["a", "b", "x"],
        "w": np.array([1, 1, 1], dtype=np.int64)}))
    nodes = rd.from_pandas(pd.DataFrame({
        "host": ["a", "b", "c", "x", "y", "z"]}))
    return edges, nodes


def test_cc_regimes_row_identical(ray_session):
    edges, nodes = _cc_fixture()
    a = connected_components_str(edges, nodes).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    edges2, nodes2 = _cc_fixture()
    b = connected_components_str(edges2, nodes2, driver_limit=0) \
        .to_pandas().sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)
    assert a.set_index("host")["component"].to_dict() == {
        "a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}


def test_cc_nonconvergence_raises(ray_session):
    edges, nodes = _cc_fixture()
    with pytest.raises(RuntimeError, match="convergence"):
        connected_components_str(edges, nodes, driver_limit=0,
                                 max_rounds=1)


# ---------------------------------------------------------------------------
# property-based regime equivalence on random graphs
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _rand_graph(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    hosts = [f"h{i}" for i in range(n)]
    edges = draw(st.lists(
        st.tuples(st.integers(0, n - 1), st.integers(0, n - 1),
                  st.integers(1, 3)),
        min_size=0, max_size=12))
    return hosts, edges


def _mk(hosts, edges):
    if edges:
        e = pd.DataFrame({"src": [f"h{a}" for a, _, _ in edges],
                          "dst": [f"h{b}" for _, b, _ in edges],
                          "w": np.array([w for _, _, w in edges],
                                        dtype=np.int64)}) \
            .groupby(["src", "dst"], as_index=False).sum()
    else:
        e = pd.DataFrame({"src": pd.Series([], dtype=object),
                          "dst": pd.Series([], dtype=object),
                          "w": pd.Series([], dtype="int64")})
    return rd.from_pandas(e), rd.from_pandas(pd.DataFrame({"host": hosts}))


@settings(max_examples=12, deadline=None)
@given(_rand_graph())
def test_pagerank_regimes_on_random_graphs(ray_session, g):
    hosts, edges = g
    e1, n1 = _mk(hosts, edges)
    a = pagerank_int(e1, n1, n_iters=2).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    e2, n2 = _mk(hosts, edges)
    b = pagerank_int(e2, n2, n_iters=2, broadcast_limit=0).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)
    # mass bounds: every rank >= base, total <= n * scale (dangling
    # mass only ever leaks out, floor division only shrinks)
    assert (a["rank"] >= BASE).all()
    assert a["rank"].sum() <= len(hosts) * SCALE


@settings(max_examples=12, deadline=None)
@given(_rand_graph())
def test_cc_regimes_on_random_graphs(ray_session, g):
    hosts, edges = g
    e1, n1 = _mk(hosts, edges)
    a = connected_components_str(e1, n1).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    e2, n2 = _mk(hosts, edges)
    b = connected_components_str(e2, n2, driver_limit=0).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)
    # reference union-find over the same undirected edges
    parent = {h: h for h in hosts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d, _ in edges:
        ra, rb = find(f"h{s}"), find(f"h{d}")
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    want = {h: find(h) for h in hosts}
    # min-label reps: canonicalize reference reps to component minima
    comp = {}
    for h in hosts:
        comp.setdefault(want[h], []).append(h)
    canon = {r: min(m) for r, m in comp.items()}
    got = a.set_index("host")["component"].to_dict()
    assert got == {h: canon[want[h]] for h in hosts}


# ---------------------------------------------------------------------------
# triangle_count_exact: regime equivalence + brute-force reference
# ---------------------------------------------------------------------------

from itertools import combinations

from cckp_toolkit_workflow_ray.stages.graph import triangle_count_exact


def _canon_edges(edges):
    """Distinct canonical (u < v) pairs, self-loops dropped."""
    seen = set()
    for a, b, *_ in edges:
        if a == b:
            continue
        u, v = (f"h{min(a, b)}", f"h{max(a, b)}")
        seen.add((u, v))
    return sorted(seen)

def _brute_triangles(ce_pairs):
    es = set(ce_pairs)
    nodes = sorted({x for p in ce_pairs for x in p})
    return sum(
        1 for u, v, z in combinations(nodes, 3)
        if (u, v) in es and (u, z) in es and (v, z) in es)


def _tri_run(ce_pairs, **kw):
    if ce_pairs:
        ce = rd.from_pandas(pd.DataFrame(
            {"u": [u for u, _ in ce_pairs],
             "v": [v for _, v in ce_pairs]}))
    else:
        ce = rd.from_pandas(pd.DataFrame(
            {"u": pd.Series([], dtype=object),
             "v": pd.Series([], dtype=object)}))
    return triangle_count_exact(ce, **kw)


def test_triangle_regimes_fixture(ray_session):
    # K4 plus a pendant: 4 triangles
    pairs = _canon_edges([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3),
                          (2, 3), (3, 4)])
    assert _tri_run(pairs) == 4
    assert _tri_run(pairs, broadcast_limit=0) == 4


def test_triangle_empty(ray_session):
    assert _tri_run([]) == 0
    assert _tri_run([("h0", "h1")], broadcast_limit=0) == 0


@settings(max_examples=10, deadline=None)
@given(_rand_graph())
def test_triangle_regimes_on_random_graphs(ray_session, g):
    hosts, edges = g
    pairs = _canon_edges([(a, b) for a, b, _ in edges])
    want = _brute_triangles(pairs)
    assert _tri_run(pairs) == want
    # broadcast_limit=0 forces the distributed wedge-join regime
    assert _tri_run(pairs, broadcast_limit=0, n_buckets=4) == want


# ---------------------------------------------------------------------------
# kcore_edges: regime equivalence + reference peeling
# ---------------------------------------------------------------------------

from cckp_toolkit_workflow_ray.stages.graph import kcore_edges


def _ref_kcore(pairs, k=2, n_rounds=8):
    es = set(pairs)
    for _ in range(n_rounds):
        deg = {}
        for u, v in es:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {h for h, d in deg.items() if d >= k}
        new = {(u, v) for u, v in es if u in keep and v in keep}
        if new == es:
            break
        es = new
    return sorted(es)


def _kcore_run(pairs, **kw):
    ce = rd.from_pandas(pd.DataFrame(
        {"u": [u for u, _ in pairs] or pd.Series([], dtype=object),
         "v": [v for _, v in pairs] or pd.Series([], dtype=object)}))
    out = kcore_edges(ce, **kw).to_pandas()
    return sorted(zip(out["u"], out["v"])) if len(out) else []


def test_kcore_fixture(ray_session):
    # triangle + two-tendril chain: tendrils peel in two rounds
    pairs = _canon_edges([(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)])
    want = _ref_kcore(pairs)
    assert want == [("h0", "h1"), ("h0", "h2"), ("h1", "h2")]
    assert _kcore_run(pairs) == want
    assert _kcore_run(pairs, broadcast_limit=0) == want


def test_kcore_fully_peeled(ray_session):
    # a pure chain has no 2-core
    pairs = _canon_edges([(0, 1), (1, 2), (2, 3)])
    assert _kcore_run(pairs) == []
    assert _kcore_run(pairs, broadcast_limit=0) == []


@settings(max_examples=10, deadline=None)
@given(_rand_graph())
def test_kcore_regimes_on_random_graphs(ray_session, g):
    hosts, edges = g
    pairs = _canon_edges([(a, b) for a, b, _ in edges])
    if not pairs:
        return
    want = _ref_kcore(pairs)
    assert _kcore_run(pairs) == want
    assert _kcore_run(pairs, broadcast_limit=0) == want


# ---------------------------------------------------------------------------
# neighbor_pair_counts: wedge counts match brute force on random graphs
# ---------------------------------------------------------------------------

from cckp_toolkit_workflow_ray.stages.graph import neighbor_pair_counts


def _brute_common(ce: pd.DataFrame) -> pd.DataFrame:
    adj: dict = {}
    for u, v in zip(ce["u"], ce["v"]):
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    rows = []
    hosts = sorted(adj)
    for i, a in enumerate(hosts):
        for b in hosts[i + 1:]:
            c = len(adj[a] & adj[b])
            if c:
                rows.append((a, b, c))
    return pd.DataFrame(rows, columns=["host_a", "host_b", "common"]) \
        if rows else pd.DataFrame({"host_a": pd.Series([], dtype=object),
                                   "host_b": pd.Series([], dtype=object),
                                   "common": pd.Series([], dtype="int64")})


@settings(max_examples=10, deadline=None)
@given(_rand_graph())
def test_neighbor_pair_counts_match_brute_force(ray_session, g):
    hosts, edges = g
    ce = pd.DataFrame({"u": [f"h{min(a, b)}" for a, b, _ in edges
                             if a != b],
                       "v": [f"h{max(a, b)}" for a, b, _ in edges
                             if a != b]}).drop_duplicates()
    if ce.empty:
        return
    nb = pd.DataFrame({
        "c": pd.concat([ce["u"], ce["v"]], ignore_index=True),
        "n": pd.concat([ce["v"], ce["u"]], ignore_index=True)})
    # several blocks so both the interior and the block-edge paths run
    got = neighbor_pair_counts(
        rd.from_pandas(nb).repartition(3)).to_pandas()
    if "host_a" not in got:
        # a no-pair graph loses the empty stream's schema (Ray), the
        # same typed-empty case queries guard at the surface
        got = pd.DataFrame({"host_a": pd.Series([], dtype=object),
                            "host_b": pd.Series([], dtype=object),
                            "common": pd.Series([], dtype="int64")})
    got = got.sort_values(["host_a", "host_b"]).reset_index(drop=True)
    got["common"] = got["common"].astype(np.int64)
    want = _brute_common(ce)
    want["common"] = want["common"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want, check_like=True)


# ---------------------------------------------------------------------------
# hits_int: regime equivalence, integer semantics, guards
# ---------------------------------------------------------------------------

from cckp_toolkit_workflow_ray.stages.graph import hits_int


@settings(max_examples=10, deadline=None)
@given(_rand_graph())
def test_hits_regimes_on_random_graphs(ray_session, g):
    hosts, edges = g
    e1, n1 = _mk(hosts, edges)
    a = hits_int(e1, n1, n_iters=2).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    e2, n2 = _mk(hosts, edges)
    b = hits_int(e2, n2, n_iters=2, broadcast_limit=0).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)
    assert (a["hub"] >= 0).all() and (a["auth"] >= 0).all()


def test_hits_edgeless_and_empty(ray_session):
    e, n = _mk(["h0", "h1"], [])
    out = hits_int(e, n, n_iters=2).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    assert out["hub"].tolist() == [0, 0]
    assert out["auth"].tolist() == [0, 0]
    e0, n0 = _mk([], [])
    assert len(hits_int(e0, n0).to_pandas()) == 0


def test_hits_overflow_guard(ray_session):
    e, n = _mk(["h0", "h1"], [(0, 1, 3)])
    with pytest.raises(AssertionError, match="overflow"):
        hits_int(e, n, scale=2**61)


# ---------------------------------------------------------------------------
# bfs_depths_str: regimes match, brute force, bound semantics
# ---------------------------------------------------------------------------

from cckp_toolkit_workflow_ray.stages.graph import bfs_depths_str


@settings(max_examples=10, deadline=None)
@given(_rand_graph())
def test_bfs_regimes_match_brute_force(ray_session, g):
    hosts, edges = g
    e1, n1 = _mk(hosts, edges)
    src = min(hosts)
    a = bfs_depths_str(e1, n1, source=src, max_depth=8).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    e2, n2 = _mk(hosts, edges)
    b = bfs_depths_str(e2, n2, source=src, max_depth=8,
                       driver_limit=0).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)
    # brute-force BFS
    adj: dict = {}
    for x, y, _ in edges:
        adj.setdefault(f"h{x}", set()).add(f"h{y}")
        adj.setdefault(f"h{y}", set()).add(f"h{x}")
    dist = {src: 0}
    frontier = [src]
    while frontier:
        nxt = []
        for c in frontier:
            for n in adj.get(c, ()):
                if n not in dist:
                    dist[n] = dist[c] + 1
                    nxt.append(n)
        frontier = nxt
    for h, d in zip(a["host"], a["depth"]):
        want = dist.get(h)
        if want is None or want > 8:
            assert pd.isna(d), (h, d, want)
        else:
            assert d == want, (h, d, want)


def test_bfs_depth_bound(ray_session):
    # path graph longer than the bound: depth NULL past max_depth
    hosts = [f"h{i}" for i in range(6)]
    edges = [(i, i + 1, 1) for i in range(5)]
    e, n = _mk(hosts, edges)
    out = bfs_depths_str(e, n, source="h0", max_depth=3).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    assert out["depth"].tolist()[:4] == [0, 1, 2, 3]
    assert out["depth"].isna().tolist()[4:] == [True, True]


@settings(max_examples=8, deadline=None)
@given(_rand_graph())
def test_personalized_pagerank_regimes_and_seed_mass(ray_session, g):
    hosts, edges = g
    seeds = tuple(sorted(hosts)[:2])
    e1, n1 = _mk(hosts, edges)
    a = pagerank_int(e1, n1, n_iters=2, seeds=seeds).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    e2, n2 = _mk(hosts, edges)
    b = pagerank_int(e2, n2, n_iters=2, seeds=seeds,
                     broadcast_limit=0).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)
    # teleport mass lands only on seeds: non-seed dangling-isolated
    # nodes (no in-edges) must have rank 0
    in_deg = {h: 0 for h in hosts}
    for x, y, _ in edges:
        in_deg[f"h{y}"] += 1
    for h, r in zip(a["host"], a["rank"]):
        if h not in seeds and in_deg[h] == 0:
            assert r == 0, (h, r)
