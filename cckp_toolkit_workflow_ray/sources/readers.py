"""Input sources beyond parquet — the reference's source inventory
(SURVEY.md §2.1) re-expressed on Ray Data.

* S1 sample-sheet CSV: read lines, drop the header, trim, drop empties
  (``/root/reference/main.nf:75-79`` semantics exactly), fail-fast when
  the required column is missing (``main.nf.test:61-74`` analog).
* S2 single-value source: one record from a literal
  (``main.nf:77-78`` → ``ray.data.from_items``).
* S5 JSON artifact reader: ``ray.data.read_json``.
* Pages parquet reader with column pruning and optional row filters.
"""

from __future__ import annotations

import csv

import pyarrow.compute as pc


class SampleSheetError(ValueError):
    """Fail-fast invalid sample sheet (main.nf:49-59 analog)."""


def read_sample_sheet(path: str, column: str = "url") -> list[str]:
    """Parse a sample-sheet CSV into a list of values.

    Reference semantics (main.nf:75-79): first line is a header, values
    are trimmed, empty lines dropped; a sheet whose header lacks the
    required column fails fast with a clear message
    (tests/fixtures/invalid-sample-sheet.csv analog).
    """
    with open(path, newline="") as f:
        reader = csv.reader(f)
        try:
            header = [h.strip() for h in next(reader)]
        except StopIteration:
            raise SampleSheetError(f"sample sheet {path!r} is empty")
        if column not in header:
            raise SampleSheetError(
                f"sample sheet {path!r} has no '{column}' column (header: {header})"
            )
        idx = header.index(column)
        out = []
        for row in reader:
            if idx < len(row):
                v = row[idx].strip()
                if v:
                    out.append(v)
        return out


def dataset_from_sample_sheet(path: str, column: str = "url"):
    """Sample sheet → 1-column Dataset (the reference's url channel)."""
    import ray.data as rd

    return rd.from_items([{column: v} for v in read_sample_sheet(path, column)])


def dataset_from_value(value, column: str = "url"):
    """Single-record source (--repo_url analog, main.nf:77-78)."""
    import ray.data as rd

    return rd.from_items([{column: value}])


def read_pages(paths, columns=None, langs: list[str] | None = None):
    """Pages parquet reader with pruning pushed to the scan.

    ``columns`` prunes at the read; ``langs`` pushes a row-group-level
    filter (only matching row groups leave storage).
    """
    import ray.data as rd

    kwargs = {}
    if columns is not None:
        kwargs["columns"] = list(columns)
    if langs is not None:
        kwargs["filter"] = pc.field("lang").isin(list(langs))
    return rd.read_parquet(paths, **kwargs)


def read_json_records(paths):
    """JSON artifact reader (analyze_joss.py:530-533 analog)."""
    import ray.data as rd

    return rd.read_json(paths)
