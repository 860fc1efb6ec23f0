"""High-cardinality grouped aggregation utilities.

Ray Data's ``groupby().aggregate()`` pays per-group Python overhead, which
is fine for low-cardinality keys (langs, checks) but dominates wall time
when the key is ~unique per row (url hashes: millions-billions of groups).

``candidate_duplicates`` exploits that duplicate keys are the *rare* case
for a uniqueness check: after a global ``sort`` on the key (a range
partition — Ray's fastest exchange), every key is contiguous, so

* a key duplicated *within* a block is found vectorized (shifted
  equality), and
* a key spanning *two* blocks must touch a block edge, so emitting each
  block's first/last key group is sufficient to catch it.

The candidate stream (in-block dups + 2 edge groups per block) is orders
of magnitude smaller than the key stream; the final exact aggregation
over candidates uses Ray's aggregate only on that small remainder.
Assumption (documented): duplicates are a small fraction of keys.  If an
input is pathologically duplicate-heavy the code stays *correct* — the
candidate stream just grows toward the key stream and the final
aggregate slows accordingly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def candidate_duplicates(partials, key_cols: list[str], n_col: str = "n"):
    """partials: Dataset of per-batch combined rows (key_cols + n + carry
    columns).  Returns a Dataset of candidate rows (same schema) containing
    every key whose global count could exceed its in-block count."""
    sorted_ds = partials.sort(key_cols)

    def block_candidates(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        keys = df[key_cols].to_numpy()
        same_as_prev = np.zeros(len(df), dtype=bool)
        same_as_prev[1:] = (keys[1:] == keys[:-1]).all(axis=1)
        in_dup_group = same_as_prev | np.concatenate([same_as_prev[1:], [False]])
        first_key = (keys == keys[0]).all(axis=1)
        last_key = (keys == keys[-1]).all(axis=1)
        keep = in_dup_group | first_key | last_key
        # also keep any row whose in-block count already exceeds 1
        keep |= df[n_col].to_numpy() > 1
        return df[keep]

    # batch_size=None -> one call per block, so "block edge" is well-defined
    return sorted_ds.map_batches(block_candidates, batch_format="pandas", batch_size=None)
