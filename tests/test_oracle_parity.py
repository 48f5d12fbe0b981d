"""End-to-end parity: every Ray query must value-match its DuckDB oracle.

This mirrors the driver's correctness gate: run queries()[name](sf_dir) and
oracle_sql()[name] side by side, compare as sorted frames.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import importlib
import sys

sys.path.insert(0, "/root/repo")
entry_mod = importlib.import_module("__ray_entry__")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def _to_df(obj) -> pd.DataFrame:
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    return obj.to_pandas()  # ray Dataset


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(name: str, sf_dir: str):
    got = _norm(_to_df(entry_mod.queries()[name](sf_dir)))
    con = _duck(sf_dir)
    want = _norm(con.sql(entry_mod.oracle_sql()[name]).df())
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    # dtype-sensitive exact compare — the local gate must equal the driver's
    # type-sensitive value-hash (round-1 lesson: rtol/check_dtype=False let
    # HUGEINT-vs-int64 and half-even-vs-half-away defects ship green locally).
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)


def test_entry_smoke():
    ds = entry_mod.entry()
    df = _to_df(ds)
    assert len(df) >= 0
    assert list(df.columns) == ["conv_id", "turn_idx", "check_id", "detail"]
