"""Property-based checks (hypothesis): on arbitrary small transcript tables,
the vectorized engine kernels agree with a naive pure-Python oracle —
the FIXTURES.md "property-style invariants" requirement."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from doc_quality_check_ray.config import DEFAULT_CONFIG
from doc_quality_check_ray.functions.text_norm import normalize_text_arrow, normalize_text_py
from doc_quality_check_ray.stages.row_checks import row_violations_batch, verdict_batch

TEXTS = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
        ),
        max_size=40,
    ),
)
ROLES = st.one_of(st.none(), st.sampled_from(["user", "assistant", "tool", "agent", ""]))
TOOLS = st.one_of(st.none(), st.sampled_from(["search", "web_search"]))


def rows_strategy():
    return st.lists(st.tuples(TEXTS, ROLES, TOOLS), min_size=1, max_size=30)


def _table(rows):
    return pa.table(
        {
            "conv_id": pa.array([f"c{i % 3}" for i in range(len(rows))], pa.string()),
            "turn_idx": pa.array(list(range(len(rows))), pa.int32()),
            "role": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[0] for r in rows], pa.string()),
            "tool": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([dt.datetime(2024, 1, 1)] * len(rows), pa.timestamp("us")),
        }
    )


def _oracle_checks(text, role, tool):
    """Naive per-row oracle mirroring the documented check semantics."""
    cfg = DEFAULT_CONFIG
    out = set()
    empty = text is None or text.strip(" ") == ""
    if empty:
        out.add("empty_turn")
    if role is None or role not in cfg.valid_roles:
        out.add("invalid_role")
    role_f = role or ""
    if (role_f == "tool") != (tool is not None):
        out.add("tool_role_consistency")
    if not empty and text:
        kept = sum(1 for ch in text if ch.isascii() and (ch.isalnum() or ch == " "))
        # engine counts [0-9A-Za-z ] only — isalnum() accepts unicode digits
        kept = sum(
            1
            for ch in text
            if ("0" <= ch <= "9") or ("a" <= ch <= "z") or ("A" <= ch <= "Z") or ch == " "
        )
        if len(text) > 0 and kept / len(text) < cfg.quality_ratio_threshold:
            out.add("low_quality_text")
    return out


@settings(max_examples=200, deadline=None)
@given(rows_strategy())
def test_row_checks_match_python_oracle(rows):
    t = _table(rows)
    v = row_violations_batch(t)
    got: dict[int, set] = {}
    for cid, ti, check in zip(
        v["conv_id"].to_pylist(), v["turn_idx"].to_pylist(), v["check_id"].to_pylist()
    ):
        got.setdefault(ti, set()).add(check)
    for i, (text, role, tool) in enumerate(rows):
        want = _oracle_checks(text, role, tool)
        assert got.get(i, set()) == want, (i, text, role, tool)


@settings(max_examples=200, deadline=None)
@given(rows_strategy())
def test_verdict_priority_consistent(rows):
    t = _table(rows)
    v = verdict_batch(t)
    for i, (text, role, tool) in enumerate(rows):
        want = _oracle_checks(text, role, tool)
        reason = v["reason"][i].as_py()
        if not want:
            assert reason == "OK"
        else:
            # first failing check in priority order wins
            for c in DEFAULT_CONFIG.reason_priority:
                if c in want:
                    assert reason == c
                    break


@settings(max_examples=150, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=20))
def test_normalizer_vector_matches_scalar(texts):
    arr = pa.array(texts, pa.string())
    assert normalize_text_arrow(arr).to_pylist() == [normalize_text_py(x) for x in texts]
