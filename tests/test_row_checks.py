"""Unit tests for the row-check stage on tiny hand-built Arrow tables —
planted violations must be reported exactly (FIXTURES.md oracle strategy)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa

from doc_quality_check_ray.config import ValidationConfig
from doc_quality_check_ray.stages.row_checks import (
    CHECK_EMPTY,
    CHECK_QUALITY,
    CHECK_ROLE,
    CHECK_TOOL,
    row_violations_batch,
    verdict_batch,
)

TS = dt.datetime(2024, 1, 1)


def make(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([TS] * len(rows), pa.timestamp("us")),
        }
    )


def hits(table, check):
    v = row_violations_batch(table)
    out = v.filter(pa.compute.equal(v["check_id"], check))
    return sorted(zip(out["conv_id"].to_pylist(), out["turn_idx"].to_pylist()))


def test_clean_table_no_violations():
    t = make(
        [
            ("c1", 0, "user", "hello world", None),
            ("c1", 1, "assistant", "hi there", None),
            ("c1", 2, "tool", "result 42", "search"),
        ]
    )
    assert row_violations_batch(t).num_rows == 0
    v = verdict_batch(t)
    assert v["valid"].to_pylist() == [True, True, True]


def test_empty_turn_variants():
    t = make(
        [
            ("c1", 0, "user", "", None),
            ("c1", 1, "user", "   ", None),
            ("c1", 2, "user", None, None),
            ("c1", 3, "user", "ok", None),
        ]
    )
    assert hits(t, CHECK_EMPTY) == [("c1", 0), ("c1", 1), ("c1", 2)]


def test_invalid_role():
    t = make(
        [
            ("c1", 0, "agent", "x y", None),
            ("c1", 1, "", "x y", None),
            ("c1", 2, None, "x y", None),
            ("c1", 3, "user", "x y", None),
        ]
    )
    assert hits(t, CHECK_ROLE) == [("c1", 0), ("c1", 1), ("c1", 2)]


def test_tool_role_consistency():
    t = make(
        [
            ("c1", 0, "tool", "x", None),  # missing tool
            ("c1", 1, "user", "x", "search"),  # unexpected tool
            ("c1", 2, "tool", "x", "search"),  # ok
            ("c1", 3, "user", "x", None),  # ok
        ]
    )
    assert hits(t, CHECK_TOOL) == [("c1", 0), ("c1", 1)]


def test_low_quality_text():
    t = make(
        [
            ("c1", 0, "user", "???? ???? ####", None),  # garbage
            ("c1", 1, "user", "perfectly fine prose", None),
            ("c1", 2, "user", "", None),  # empty → NOT low-quality (priority)
        ]
    )
    assert hits(t, CHECK_QUALITY) == [("c1", 0)]


def test_verdict_priority_empty_wins():
    # A row that is empty AND has a bad role: reason must be empty_turn
    # (reference checks empty before unreadable, app.py:369-380).
    t = make([("c1", 0, "agent", "", "x")])
    v = verdict_batch(t)
    assert v["reason"].to_pylist() == [CHECK_EMPTY]
    assert v["valid"].to_pylist() == [False]


def test_multiple_checks_same_row():
    t = make([("c1", 0, "agent", "", "x")])
    v = row_violations_batch(t)
    got = sorted(v["check_id"].to_pylist())
    assert got == [CHECK_EMPTY, CHECK_ROLE, CHECK_TOOL]


def test_config_threshold_respected():
    cfg = ValidationConfig(quality_ratio_threshold=0.99)
    t = make([("c1", 0, "user", "almost! clean text.", None)])
    v = row_violations_batch(t, cfg)
    assert CHECK_QUALITY in v["check_id"].to_pylist()
