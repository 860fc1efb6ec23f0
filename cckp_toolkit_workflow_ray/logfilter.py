"""Worker/driver log hygiene.

Ray's pandas block sizing calls ``np.vectorize`` without ``otypes`` on a
sampled object/string column; on a 0-row column that raises and Ray logs
``Error calculating size for column '...': cannot call `vectorize` on
size 0 inputs`` from every worker that touches an empty pandas block
(1,170 lines in one full-bench log).  Sizing falls back safely — the
message carries no signal — so the session owners (bench, CLI, pytest,
conformance sweep) install this filter driver-side and ship it to
workers via ``runtime_env={"worker_process_setup_hook":
make_worker_setup_hook()}``.

``make_worker_setup_hook`` returns a CLOSURE, not a module-level
function: cloudpickle serializes closures by value, so the hook
deserializes in workers that cannot import this package (Ray workers do
not inherit the driver's sys.path).  A module-level hook pickles by
reference and kills every worker at spawn with ModuleNotFoundError.

The filter drops ONLY that message; other pandas_block warnings pass.
"""

from __future__ import annotations

import logging


def make_worker_setup_hook():
    """Self-contained (pickle-by-value) setup hook for Ray workers."""

    def _install():
        import logging

        lg = logging.getLogger("ray.data._internal.pandas_block")
        if getattr(lg, "_empty_col_size_filter", False):
            return

        class _EmptyColumnSizeNoise(logging.Filter):
            def filter(self, record):
                msg = record.getMessage()
                return not ("Error calculating size for column" in msg
                            and "size 0 inputs" in msg)

        lg.addFilter(_EmptyColumnSizeNoise())
        lg._empty_col_size_filter = True

    return _install


def install_empty_column_size_filter() -> None:
    """Driver-side install; idempotent.

    Also drops the streaming executor's "Operator produced a RefBundle
    with a different schema" warning — but ONLY when the mismatching
    schemas carry the ``__side`` join tag: the partitioned hash joins
    (stages/joins.py) deliberately union two differently-shaped sides
    and pad after the bucket groupby, so each side ships only its own
    columns through the exchange.  Mismatches without the tag stay
    visible — those can be real bugs.
    """
    make_worker_setup_hook()()
    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if getattr(lg, "_join_union_schema_filter", False):
        return

    class _JoinUnionSchemaNoise(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
            msg = record.getMessage()
            if "RefBundle with a different schema" not in msg:
                return True
            # (a) the joins' deliberate two-shape union (__side tag);
            # (b) Ray's own untyped pd.DataFrame() block for an EMPTY
            #     sort/groupby partition (names=[]) — every empty frame
            #     THIS package emits is column-typed, so an untyped
            #     empty side is Ray-internal, never one of our bugs
            return not ("__side" in msg
                        or "PandasBlockSchema(names=[], types=[])" in msg)

    lg.addFilter(_JoinUnionSchemaNoise())
    lg._join_union_schema_filter = True
