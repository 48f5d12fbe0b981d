"""Pin engine rounding to DuckDB round() (half away from zero) bit-exactly.

Round-1 driver failure t_token_stats was caused by numpy/Arrow half-to-even
vs DuckDB half-away at exact half boundaries (0.8203125 → 0.820312 vs
0.820313). Every oracle-compared float column must round through
functions.rounding; this test is the boundary-value pin.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from doc_quality_check_ray.functions.rounding import (
    pc_round_half_away,
    round_half_away,
    round_half_away_scalar,
)

BOUNDARY = [0.8203125, -0.8203125, 2.5e-6, 1.5e-6, 0.1234565, 0.5e-6, 0.0]


@pytest.mark.parametrize("decimals", [5, 6])
def test_matches_duckdb_on_boundaries_and_random(decimals: int):
    rng = np.random.default_rng(42)
    vals = np.concatenate(
        [
            np.array(BOUNDARY),
            rng.random(5000),
            (rng.integers(0, 4_000_000, 5000) + 0.5) / 10.0**decimals,
            -rng.random(1000),
        ]
    )
    con = duckdb.connect()
    con.register("v", pa.table({"x": vals}))
    duck = np.array(
        [r[0] for r in con.sql(f"select round(CAST(x AS DOUBLE), {decimals}) from v").fetchall()]
    )
    np.testing.assert_array_equal(round_half_away(vals, decimals), duck)
    np.testing.assert_array_equal(
        pc_round_half_away(pa.array(vals), decimals).to_numpy(), duck
    )


def test_scalar_half_boundary():
    assert round_half_away_scalar(0.8203125, 6) == 0.820313
    assert round_half_away_scalar(-0.8203125, 6) == -0.820313
    # numpy/python would give 0.820312 here (half-to-even)
    assert round(0.8203125, 6) == 0.820312
