"""Shared NULL-group-key handling.

SQL GROUP BY keeps a NULL group; pandas groupby drops NaN keys (unless
dropna=False) and Ray's groupby cannot sort None keys.  Operators that
must match SQL semantics map null STRING keys to a sentinel before
grouping and restore None at the output surface.  Null NUMERIC group
keys flow as float64 NaN end-to-end (cast the key column to float64
UNCONDITIONALLY in the partial so one key never splits across int/float
group identities, use dropna=False in every pandas groupby, and restore
the int64 dtype at the driver via _int_or_float64) — the label rollups
do this.  Two documented exceptions DROP null numeric keys instead:
event-time operators (a NULL timestamp has no window) and
sessionization (NaN defeats sorted-run detection; see
stages/windows.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

NULL_KEY = "\x00__null__"


def sentinel_nulls(series: pd.Series) -> pd.Series:
    """Replace nulls with the sentinel (object/string series only)."""
    return series.where(series.notna(), NULL_KEY)


def restore_null_keys(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    # NOT Series.where(cond, None): pandas coerces the None fill to float
    # NaN on object dtype, which hash-diverges from the oracle's real
    # None for a NULL group key.  Also normalize NaN -> None: a pandas
    # groupby(dropna=False) downstream of a restore reintroduces NaN
    # group keys (adversarial-corpus finding).
    for k in keys:
        if k in df.columns and df[k].dtype == object:
            vals = df[k].to_numpy(dtype=object, copy=True)
            mask = pd.isna(pd.Series(vals)) | (vals == NULL_KEY)
            vals[mask.to_numpy()] = None
            df[k] = vals
    return df
