"""Every queries() entry must match its oracle_sql() on the same parquet —
the same comparison the driver's correctness gate performs (row count,
schema, order-insensitive values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _compare(got: pd.DataFrame, want: pd.DataFrame, name: str):
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    g, w = _norm(got), _norm(want)
    for c in g.columns:
        if pd.api.types.is_float_dtype(w[c]):
            assert np.allclose(
                g[c].astype(float), w[c].astype(float), rtol=1e-12, equal_nan=True
            ), f"{name}: float column {c} differs"
        else:
            gl, wl = g[c].tolist(), w[c].tolist()
            assert gl == wl, f"{name}: column {c} differs: {gl[:5]} vs {wl[:5]}"


ORACLED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(ray_session, con, name):
    fn = entrymod.queries()[name]
    got = fn(SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.sql(entrymod.oracle_sql()[name]).df()
    _compare(got, want, name)


def test_all_queries_have_callables():
    qs = entrymod.queries()
    for name in ORACLED:
        assert name in qs
    # rows-only entries are allowed but must be callable too
    for name, fn in qs.items():
        assert callable(fn), name


def test_entry_returns_rows(ray_session):
    out = entrymod.entry()
    assert len(out) > 0
    assert {"lang", "check", "verdict"} <= set(out.columns)


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run_and_are_deterministic(ray_session, name):
    fn = entrymod.queries()[name]
    a = fn(SF_DIR)
    if not isinstance(a, pd.DataFrame):
        a = a.to_pandas()
    assert len(a) >= 0 and len(a.columns) > 0
    b = fn(SF_DIR)
    if not isinstance(b, pd.DataFrame):
        b = b.to_pandas()
    a = _norm(a)
    b = _norm(b)
    pd.testing.assert_frame_equal(a, b)
