"""Shared numeric helpers with SQL-matching semantics."""

from __future__ import annotations

import numpy as np


def round_half_away(x: np.ndarray) -> np.ndarray:
    """round() with SQL semantics (half away from zero).  ``np.round`` is
    half-to-even; a value landing exactly on .5 would diverge from the
    DuckDB oracles' ``round()``."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)
