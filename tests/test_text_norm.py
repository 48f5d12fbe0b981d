"""Normalizer parity: Arrow RE2 chain == DuckDB SQL == pure-Python oracle,
pinned on adversarial inputs (the M8 / north-rule text-equality invariant)."""

from __future__ import annotations

import duckdb
import pyarrow as pa

from doc_quality_check_ray.functions.text_norm import (
    normalize_text_arrow,
    normalize_text_py,
    sql_normalize_expr,
)

CASES = [
    "hello world",
    "a\x00b",
    "ctrl\x01\x02\x03chars\x7f",
    "repl�char",
    "????????",
    "???",  # short run survives
    "•••••••",
    "a  \t b\t\tc",
    "  leading and trailing  ",
    "line1  \n   line2\n\n\nline3",
    "\n\n\n",
    "",
    "mixed \x00� ???? \t\t x\n\n y ",
    "unicode éàü 中文 ok",
]


def test_arrow_matches_python():
    arr = pa.array(CASES, pa.string())
    got = normalize_text_arrow(arr).to_pylist()
    want = [normalize_text_py(c) for c in CASES]
    assert got == want


def test_sql_matches_python():
    con = duckdb.connect()
    expr = sql_normalize_expr("t")
    for c in CASES:
        if "\x00" in c:
            continue  # NUL can't ride through a SQL literal; covered by arrow test
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [c]).fetchone()[0]
        assert got == normalize_text_py(c), repr(c)


def test_null_passthrough():
    arr = pa.array([None, "x"], pa.string())
    assert normalize_text_arrow(arr).to_pylist() == [None, "x"]
    assert normalize_text_py(None) is None


def test_fast_path_equivalence_mixed_batch():
    """The dirty-row fast path must be byte-identical to the full chain on a
    batch mixing clean, dirty, null, and edge-case rows at every dirty ratio."""
    import numpy as np

    from doc_quality_check_ray.functions.text_norm import _full_chain

    rng = np.random.default_rng(5)
    clean = ["plain words here", "a b c", "single space text ok"]
    rows = []
    for i in range(5000):
        if i % 37 == 0:
            rows.append(CASES[i % len(CASES)])
        elif i % 11 == 0:
            rows.append(None)
        else:
            rows.append(clean[i % 3] + f" {i}")
    arr = pa.array(rows, pa.string())
    fast = normalize_text_arrow(arr).to_pylist()
    import pyarrow.compute as pc

    slow = pc.utf8_trim(_full_chain(arr), characters=" \n").to_pylist()
    assert fast == slow

    # fully dirty batch takes the chain-everything branch
    dirty = pa.array([c for c in CASES if c] * 50, pa.string())
    assert normalize_text_arrow(dirty).to_pylist() == pc.utf8_trim(
        _full_chain(dirty), characters=" \n"
    ).to_pylist()
