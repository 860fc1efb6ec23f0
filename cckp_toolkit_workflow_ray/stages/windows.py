"""Windowed aggregation operators (tumbling / sliding / session).

Ray Data has no event-time/watermark machinery and the reference has no
windows either (its channels are unordered streams, SURVEY.md §2.9), but
an events-log table at scale needs them.  Batch semantics over a
partitioned log:

* **tumbling**: window id is a derived key → per-batch combiner +
  groupby — no ordering assumption at all;
* **sliding**: each row belongs to ``size/hop`` windows → vectorized
  replication inside ``map_batches`` then the tumbling path;
* **session** (gap-based): requires per-key time order → ``groupby(key)
  .map_groups`` with a sorted pandas body; the ordering assumption is
  *within one key group only* (documented per the guide), which the
  group shuffle itself provides.

All window ids are int64 epoch-microseconds — deterministic, join-safe,
and exactly reproducible in SQL oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ..functions.arrow import table_from_pandas as _table_from_pandas
import pyarrow.compute as pc

from ..functions.nulls import restore_null_keys, sentinel_nulls


def _partial_counts(key_col: str, win_col: str, value_col: str | None):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        aggs = {"n_events": (key_col, "size")}
        if value_col is not None:
            aggs["sum_value"] = (value_col, "sum")
        return df.groupby([key_col, win_col], as_index=False).agg(**aggs)

    return fn


def tumbling_window(ds, ts_col: str, key_col: str, size_us: int,
                    value_col: str | None = None):
    """Per-(key, window) counts (+ optional sum) for tumbling windows.
    Combiner inside map_batches, then the sorted-run keyed sum — the
    (key × window) cardinality grows with the log's time span, so the
    finishing reduction must not pay Ray's per-group aggregate overhead
    (~0.6 ms/group: 122 s at 200k groups vs 0.5 s sorted-run)."""
    from .groupagg import sorted_reduce_by_key_ds

    def partial(t: pa.Table) -> pa.Table:
        # event-time op: rows without an event time are excluded (and a
        # NaN window key would degrade the int64 window dtype)
        t = t.filter(pc.is_valid(t.column(ts_col)))
        us = pc.cast(t.column(ts_col), pa.int64()) \
               .to_numpy(zero_copy_only=False).astype(np.int64)
        keys = pd.Series(t.column(key_col).to_numpy(zero_copy_only=False))
        if keys.dtype == object:
            keys = sentinel_nulls(keys)  # SQL keeps a NULL group
        df = pd.DataFrame({
            key_col: keys,
            "window_start_us": (us // size_us) * size_us,
        })
        if value_col is not None:
            df[value_col] = t.column(value_col).to_numpy(zero_copy_only=False)
        g = _partial_counts(key_col, "window_start_us", value_col)(df)
        return _table_from_pandas(g, preserve_index=False)

    aggs = {"n_events": "sum"}
    if value_col is not None:
        aggs["sum_value"] = "sum"
    out = sorted_reduce_by_key_ds(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key_col, "window_start_us"], aggs)
    return out.map_batches(
        lambda df: restore_null_keys(df, [key_col]), batch_format="pandas"
    )


def sliding_window(ds, ts_col: str, key_col: str, size_us: int, hop_us: int):
    """Per-(key, window) counts for sliding windows (window = [start,
    start+size), starts every hop).  Each row replicates into size/hop
    windows vectorized; then the tumbling aggregation path."""
    assert size_us % hop_us == 0, "size must be a multiple of hop"
    k = size_us // hop_us
    from .groupagg import sorted_reduce_by_key_ds

    def partial(t: pa.Table) -> pa.Table:
        # event-time op: rows without an event time are excluded
        t = t.filter(pc.is_valid(t.column(ts_col)))
        us = pc.cast(t.column(ts_col), pa.int64()) \
               .to_numpy(zero_copy_only=False).astype(np.int64)
        keys = pd.Series(t.column(key_col).to_numpy(zero_copy_only=False))
        if keys.dtype == object:
            keys = sentinel_nulls(keys)
        base = (us // hop_us) * hop_us
        starts = base[:, None] - np.arange(k, dtype=np.int64)[None, :] * hop_us
        df = pd.DataFrame({
            key_col: np.repeat(keys.to_numpy(), k),
            "window_start_us": starts.ravel(),
        })
        g = df.groupby([key_col, "window_start_us"], as_index=False).size()
        return _table_from_pandas(
            g.rename(columns={"size": "n_events"}), preserve_index=False
        )

    # sorted-run keyed sum — same (key × window)-cardinality rationale
    # as tumbling_window
    out = sorted_reduce_by_key_ds(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key_col, "window_start_us"], {"n_events": "sum"})
    return out.map_batches(
        lambda df: restore_null_keys(df, [key_col]), batch_format="pandas"
    )


def session_window(ds, ts_col: str, key_col: str, gap_us: int,
                   order_cols: list[str] | None = None):
    """Gap-based sessionization per key.

    A new session starts when the time since the previous event of the
    same key exceeds ``gap_us``.  Ordering within a key is (ts, then
    ``order_cols``) — a total order so results are deterministic under
    timestamp ties.  Returns per-session rows:
    (key, session_start_us, session_end_us, n_events).

    Scale shape (r3): a ``groupby(key).map_groups`` here pays per-group
    Python overhead on |keys| groups (~ms each; the session key is
    ~user-cardinality).  Instead the events are range-sorted by
    (key, ts, order) so every key is a contiguous run; block-INTERIOR
    runs sessionize in one vectorized pass over the whole block (gap
    breaks + run boundaries → session ids; per-session min/max/count are
    slice reads off the sorted arrays), and only the ≤2 block-EDGE keys
    per block — the runs that may span blocks — take the per-group path.
    Same motif as dedup.pairs_from_membership.
    """
    order_cols = order_cols or []

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        """Exact per-key sessionization (block-edge keys only)."""
        g = g.sort_values(["_us", *order_cols], kind="mergesort")
        us = g["_us"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (us[1:] - us[:-1]) > gap_us
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(g)) - 1
        out = pd.DataFrame({
            "session_start_us": us[starts],
            "session_end_us": us[ends],
            "n_events": (ends - starts + 1).astype(np.int64),
        })
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    cols = [key_col, ts_col, *order_cols]

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        # filters FIRST (boolean masks already produce new frames), then
        # one copy before the assignments:
        # - numeric NULL keys are dropped (documented sessionization
        #   exception in functions/nulls.py: a NaN key defeats sorted-run
        #   detection — `NaN != NaN` splits every row into its own run)
        # - NULL event times are excluded (event-time op; NaT would
        #   int-cast to INT64_MIN and sessionize as a real instant)
        if df[key_col].dtype != object:
            df = df[df[key_col].notna()]
        df = df[df[ts_col].notna()].copy()
        if df[key_col].dtype == object:
            df[key_col] = sentinel_nulls(df[key_col])
        # robust epoch-us regardless of pandas datetime unit (ns vs us)
        df["_us"] = df[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        return df[[key_col, "_us", *order_cols]]

    sorted_ev = ds.select_columns(cols).map_batches(
        pre, batch_format="pandas"
    ).sort([key_col, "_us", *order_cols]).materialize()

    def _empty(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key_col: pd.Series([], dtype=df[key_col].dtype),
            "session_start_us": pd.Series([], dtype="int64"),
            "session_end_us": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
        })

    def emit_interior(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 1:
            return _empty(df)
        k = df[key_col].to_numpy()
        first_key, last_key = k[0], k[-1]
        us = df["_us"].to_numpy()
        new = np.ones(len(df), dtype=bool)
        new[1:] = (k[1:] != k[:-1]) | ((us[1:] - us[:-1]) > gap_us)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(df)) - 1
        sess_key = k[starts]
        keep = (sess_key != first_key) & (sess_key != last_key)
        if not keep.any():
            return _empty(df)
        return pd.DataFrame({
            key_col: sess_key[keep],
            "session_start_us": us[starts][keep],
            "session_end_us": us[ends][keep],
            "n_events": (ends - starts + 1)[keep].astype(np.int64),
        })

    def extract_edges(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        k = df[key_col].to_numpy()
        return df[(k == k[0]) | (k == k[-1])]

    # batch_size=None → one call per block, so "block edge" is well-defined
    # and both passes see the same (materialized) block boundaries
    interior = sorted_ev.map_batches(emit_interior, batch_format="pandas",
                                     batch_size=None)
    edges = sorted_ev.map_batches(extract_edges, batch_format="pandas",
                                  batch_size=None)
    edge_sessions = edges.groupby(key_col).map_groups(
        sessionize, batch_format="pandas")
    out = interior.union(edge_sessions)
    return out.map_batches(
        lambda df: restore_null_keys(df, [key_col]), batch_format="pandas"
    )
