"""Report-stage tests + property-based tests (hypothesis) for the pure
functions — the unit layer the reference lacks (SURVEY.md §5)."""

import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cckp_toolkit_workflow_ray.functions.extract import extract_text, synthesize_html
from cckp_toolkit_workflow_ray.functions.hashing import hash_stream, splitmix64
from cckp_toolkit_workflow_ray.functions.sketches import FixedHistogram, HyperLogLog, TDigest
from cckp_toolkit_workflow_ray.pipelines.report import violation_examples, write_html_report


# ---------------------------------------------------------------- report
@pytest.fixture(scope="module")
def result(ray_session, tiny_pages_dir, tmp_path_factory):
    from cckp_toolkit_workflow_ray.pipelines.validate import validate

    return validate(tiny_pages_dir, out_dir=str(tmp_path_factory.mktemp("rep_out")))


def test_violation_examples_capped_per_group(result):
    ex = violation_examples(result, k=2)
    sizes = ex.groupby(["lang", "check"]).size()
    assert (sizes <= 2).all() and len(ex) > 0


def test_html_report_written_and_escaped(result):
    path = write_html_report(result, summarizer=lambda rep: "<b>summary & notes</b>")
    assert os.path.exists(path)
    content = open(path).read()
    assert "Validation report" in content
    assert "&lt;b&gt;summary &amp; notes&lt;/b&gt;" in content  # escaped
    assert "uniqueness_url" in content


def test_html_report_summarizer_failure_tolerated(result, tmp_path):
    def bad(rep):
        raise RuntimeError("agent down")

    path = write_html_report(result, path=str(tmp_path / "r.html"), summarizer=bad)
    assert "summarizer failed" in open(path).read()  # analyze.py:66-74 analog


# ---------------------------------------------------------------- properties
@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_extract_inverts_synthesize_property(text):
    assert extract_text(synthesize_html(text, title=text[:16])) == text


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6), min_size=1, max_size=300),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=50, deadline=None)
def test_tdigest_quantile_bounds_property(values, nsplit):
    """Quantiles of a digest always lie within [min, max] of the data and
    count is preserved under arbitrary partitioning + merge."""
    arr = np.asarray(values)
    parts = np.array_split(arr, nsplit)
    td = TDigest(compression=100)
    for p in parts:
        td.merge(TDigest(compression=100).add(p))
    assert td.count == pytest.approx(len(values))
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        v = td.quantile(q)
        assert arr.min() - 1e-9 <= v <= arr.max() + 1e-9


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500),
       st.integers(min_value=2, max_value=5))
@settings(max_examples=50, deadline=None)
def test_hll_merge_equals_bulk_property(hashes, nsplit):
    """Merging shard HLLs == one bulk HLL (register-exact), any split."""
    h = np.asarray(hashes, dtype=np.uint64)
    bulk = HyperLogLog(p=10).add_hashes(h)
    merged = HyperLogLog(p=10)
    for part in np.array_split(h, nsplit):
        merged.merge(HyperLogLog(p=10).add_hashes(part))
    assert np.array_equal(bulk.registers, merged.registers)


@given(st.lists(st.floats(min_value=0, max_value=100, allow_nan=False), max_size=400),
       st.integers(min_value=2, max_value=4))
@settings(max_examples=50, deadline=None)
def test_histogram_merge_exact_property(values, nsplit):
    edges = np.linspace(0, 100, 11)
    arr = np.asarray(values)
    bulk = FixedHistogram(edges).add(arr)
    merged = FixedHistogram(edges)
    for part in np.array_split(arr, nsplit):
        merged.merge(FixedHistogram(edges).add(part))
    assert np.array_equal(bulk.counts, merged.counts)
    assert bulk.total == len(values)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_splitmix_is_injective_on_sample(xs):
    """splitmix64 is a bijection on uint64 — no collisions on distinct
    inputs (sampled)."""
    arr = np.unique(np.asarray(xs, dtype=np.uint64))
    out = splitmix64(arr)
    assert np.unique(out).size == arr.size


@given(st.integers(min_value=0, max_value=10_000), st.integers(min_value=0, max_value=50))
@settings(max_examples=100, deadline=None)
def test_hash_stream_row_independence(idx, channel):
    """A row's stream value depends only on (index, channel, seed) —
    never on batch context (the determinism foundation)."""
    single = hash_stream(np.array([idx]), channel)[0]
    batch = hash_stream(np.arange(max(1, idx + 1)), channel)[idx]
    assert single == batch


# ---------------------------------------------------------------- A3 client
def test_external_client_logs_in_once_per_actor(ray_session):
    """A3 exemplar (VERDICT r1 #8): the client session is created once per
    actor in __init__ and reused across MANY batches — every response
    carries the same session id, and the login sequence shows exactly one
    login for the single-actor pool."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cckp_toolkit_workflow_ray.state.client import enrich_with_client

    n = 2000
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "text": pa.array([f"text {i}" for i in range(n)], type=pa.string()),
    })).repartition(8)
    out = enrich_with_client(ds, concurrency=1, batch_size=100).to_pandas()
    assert len(out) == n
    sessions = out["response"].str.split("/").str[0].unique()
    # one actor -> exactly one session across all 20 batches
    assert len(sessions) == 1, sessions
    # and many request() calls went through that single session
    reqs = out["response"].str.extract(r"/r(\d+):")[0].astype(int)
    assert reqs.max() == n


def test_client_summarizer_hook_in_report(ray_session, tmp_path):
    from cckp_toolkit_workflow_ray.pipelines.validate import validate
    from cckp_toolkit_workflow_ray.pipelines.report import write_html_report
    from cckp_toolkit_workflow_ray.sources.pages import generate_pages_dataset
    from cckp_toolkit_workflow_ray.state.client import (
        FakeExternalClient,
        make_client_summarizer,
    )

    res = validate(generate_pages_dataset(500, seed=42), out_dir=str(tmp_path))
    holder = {}

    def factory():
        holder["client"] = FakeExternalClient()
        return holder["client"]

    summarize = make_client_summarizer(factory)
    p1 = write_html_report(res, path=str(tmp_path / "r1.html"), summarizer=summarize)
    p2 = write_html_report(res, path=str(tmp_path / "r2.html"), summarizer=summarize)
    # one login at construction, reused by both report renders
    assert holder["client"].n_logins == 1
    assert holder["client"].n_requests == 2
    assert "session-" in open(p1).read() and "session-" in open(p2).read()


# ---------------------------------------------------------------------------
# 2-D skyline sweep vs brute-force strict dominance
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from cckp_toolkit_workflow_ray.pipelines.queries import _skyline2d


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                min_size=0, max_size=24))
def test_skyline2d_matches_brute_force(pts):
    import pandas as pd

    df = pd.DataFrame(pts, columns=["x", "y"])
    df["doc_id"] = range(len(df))
    got = set(_skyline2d(df)["doc_id"]) if len(df) else set()
    want = set()
    for i, (xi, yi) in enumerate(pts):
        dominated = any(
            xj >= xi and yj >= yi and (xj > xi or yj > yi)
            for j, (xj, yj) in enumerate(pts) if j != i)
        if not dominated:
            want.add(i)
    assert got == want
