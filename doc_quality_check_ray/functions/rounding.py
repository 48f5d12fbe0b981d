"""Half-away-from-zero rounding, pinned to DuckDB ``round()`` semantics.

Every engine-side rounding of an oracle-compared float column must go through
these helpers: numpy ``np.round`` / Python ``round`` / Arrow's default
``pc.round`` are all banker's rounding (half-to-even), while DuckDB rounds
half away from zero — at an exact half boundary (``0.8203125`` at 6 digits)
the two differ and the driver's exact value-hash fails.

Both implementations below were verified bit-exact against DuckDB
``round(CAST(x AS DOUBLE), d)`` over 160k samples including planted exact
half-boundaries at d=5 and d=6 (see ``tests/test_rounding.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def round_half_away(x, decimals: int):
    """Vectorized numpy half-away-from-zero round (DuckDB-equivalent).

    Accepts scalars or arrays; returns float64 of the same shape.
    """
    x = np.asarray(x, dtype=np.float64)
    p = 10.0**decimals
    out = np.copysign(np.floor(np.abs(x) * p + 0.5), x) / p
    return out


def round_half_away_scalar(x: float, decimals: int) -> float:
    return float(round_half_away(x, decimals))


def pc_round_half_away(arr: pa.Array | pa.ChunkedArray, decimals: int):
    """Arrow-native half-away round — zero-copy path for Arrow columns.

    ``half_towards_infinity`` is Arrow's name for half-away-from-zero.
    """
    return pc.round(arr, ndigits=decimals, round_mode="half_towards_infinity")
