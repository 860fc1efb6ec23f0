"""Arrow interop helpers shared across stages.

``pa.Table.from_pandas`` attaches a ``pandas`` schema-metadata dict to the
resulting table.  ``hash(pa.Schema)`` raises ``unhashable type: 'dict'`` on
such schemas, which makes Ray Data's ``unify_schemas`` fast path log
"Failed to hash the schemas (for deduplication)" on every multi-block merge
(sort sampling, shuffle reduce, union).  The warning is harmless but
pollutes every log a user reads, and the metadata itself is dead weight in
the object store — every stage here round-trips through explicit dtypes,
never through the pandas metadata.  ``table_from_pandas`` is a drop-in
replacement that strips it.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def table_from_pandas(df: pd.DataFrame, **kwargs) -> pa.Table:
    """``pa.Table.from_pandas`` minus the pandas schema-metadata dict.

    Same signature and semantics (``preserve_index``/``schema``/... pass
    through untouched); only the schema metadata differs.  Metadata
    replacement is zero-copy.
    """
    t = pa.Table.from_pandas(df, **kwargs)
    return t.replace_schema_metadata(None) if t.schema.metadata else t
