"""Oracle-stable rounding — THE one implementation.

Ray and DuckDB sum floats in different orders (1-ulp drift) and their
round() modes differ (Python half-even vs DuckDB half-away-from-zero).
Snapping to an integer of scaled units on BOTH sides —
``CAST(round(x * 10^k) AS BIGINT) / 10^k`` in SQL, these helpers in the
engine — yields bit-identical doubles whenever the integers agree, making
the driver's value-hash comparison deterministic.

Every engine-side value that meets a SQL oracle MUST round through one of
these (duplicating the 0.5-offset logic elsewhere risks silent oracle
drift — this module exists because review found two copies)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def py_round(x: float, k: int) -> float:
    """Half-away-from-zero at k decimals (scalar)."""
    scale = float(10 ** k)
    s = x * scale
    return (math.floor(s + 0.5) if s >= 0 else math.ceil(s - 0.5)) / scale


def np_round(arr: np.ndarray, k: int) -> np.ndarray:
    scale = float(10 ** k)
    scaled = arr * scale
    snapped = np.where(scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5))
    return snapped / scale


def pc_round(col, k: int):  # noqa: ANN001, ANN201 — Array | ChunkedArray
    scale = float(10 ** k)
    # "half_towards_infinity" is pyarrow's name for half-away-from-zero
    scaled = pc.round(pc.multiply(col, pa.scalar(scale)),
                      ndigits=0, round_mode="half_towards_infinity")
    return pc.divide(pc.cast(scaled, pa.int64()), pa.scalar(scale))


def sql_round(expr: str, k: int) -> str:
    scale = 10 ** k
    return f"CAST(round(({expr}) * {scale}) AS BIGINT) / {scale}.0"
