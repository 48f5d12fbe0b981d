"""Row-level checks — stateless, vectorized ``map_batches`` stage.

Re-expresses the reference's per-page quality gates as per-turn constraint
checks (SURVEY.md §7.1):

========================  ======================================================
check_id                  reference analog
========================  ======================================================
``empty_turn``            emptiness predicate ``ink_ratio < threshold``
                          (``app.py:355-356``, ``test_readability.py:219-221``)
``low_quality_text``      readability predicate ``ocr_conf >= threshold``
                          (``app.py:358-362``, ``checks/confidence_check.py``)
``invalid_role``          closed enum domains ``DocumentType``/``DocumentSide``
                          (``modules/identity_detection.py:22-35``)
``tool_role_consistency`` config-driven keyword/side referential rules
                          (``modules/identity_detection.py:526-650``)
========================  ======================================================

Every mask is an Arrow compute kernel — no Python per row. Each function has a
DuckDB-SQL twin (``sql_*`` in :mod:`doc_quality_check_ray.pipelines.oracle`)
so the driver can value-hash-verify outputs end to end.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import DEFAULT_CONFIG, ValidationConfig
from ..functions.quality import valid_char_ratio
from ..schema import VIOLATION_SCHEMA

CHECK_EMPTY = "empty_turn"
CHECK_ROLE = "invalid_role"
CHECK_TOOL = "tool_role_consistency"
CHECK_QUALITY = "low_quality_text"

DETAIL_EMPTY = "text null or blank"
DETAIL_MISSING_TOOL = "missing_tool"
DETAIL_UNEXPECTED_TOOL = "unexpected_tool"


def _masks(t: pa.Table, cfg: ValidationConfig) -> dict[str, pa.Array]:
    """Boolean violation masks for one Arrow batch (null-safe, no Python rows)."""
    text, role, tool = t["text"], t["role"], t["tool"]

    empty = pc.or_kleene(
        pc.is_null(text), pc.equal(pc.utf8_trim(text, characters=" "), "")
    )
    empty = pc.fill_null(empty, True)

    bad_role = pc.or_kleene(
        pc.is_null(role), pc.invert(pc.is_in(role, value_set=pa.array(cfg.valid_roles)))
    )
    bad_role = pc.fill_null(bad_role, True)

    role_f = pc.fill_null(role, "")
    is_tool_role = pc.equal(role_f, "tool")
    missing_tool = pc.and_(is_tool_role, pc.is_null(tool))
    unexpected_tool = pc.and_(pc.invert(is_tool_role), pc.is_valid(tool))

    ratio = valid_char_ratio(text)
    low_quality = pc.and_kleene(
        pc.invert(empty), pc.less(ratio, cfg.quality_ratio_threshold)
    )
    low_quality = pc.fill_null(low_quality, False)

    return {
        CHECK_EMPTY: empty,
        CHECK_ROLE: bad_role,
        "_missing_tool": missing_tool,
        "_unexpected_tool": unexpected_tool,
        CHECK_QUALITY: low_quality,
    }


def _emit(t: pa.Table, mask: pa.Array, check_id: str, detail) -> pa.Table:
    """Project (conv_id, turn_idx) under ``mask`` into violation rows."""
    hit = t.filter(mask)
    n = hit.num_rows
    if isinstance(detail, str):
        detail_col = pa.array([detail] * n, pa.string())
    else:
        detail_col = detail(hit)
    return pa.table(
        {
            "conv_id": hit["conv_id"],
            "turn_idx": hit["turn_idx"],
            "check_id": pa.array([check_id] * n, pa.string()),
            "detail": detail_col,
        },
        schema=VIOLATION_SCHEMA,
    )


def row_violations_batch(
    t: pa.Table, cfg: ValidationConfig = DEFAULT_CONFIG
) -> pa.Table:
    """All row-level violation rows for one batch (a row can hit several checks).

    The materialized-violations analog of the reference's ``invalid_pages``
    accumulation (``app.py:369-380``).
    """
    m = _masks(t, cfg)
    parts = [
        _emit(t, m[CHECK_EMPTY], CHECK_EMPTY, DETAIL_EMPTY),
        _emit(
            t,
            m[CHECK_ROLE],
            CHECK_ROLE,
            lambda hit: pc.binary_join_element_wise(
                "role=", pc.fill_null(hit["role"], "<null>"), ""
            ),
        ),
        _emit(t, m["_missing_tool"], CHECK_TOOL, DETAIL_MISSING_TOOL),
        _emit(t, m["_unexpected_tool"], CHECK_TOOL, DETAIL_UNEXPECTED_TOOL),
        _emit(
            t,
            m[CHECK_QUALITY],
            CHECK_QUALITY,
            f"valid_char_ratio<{cfg.quality_ratio_threshold}",
        ),
    ]
    return pa.concat_tables(parts)


def verdict_batch(t: pa.Table, cfg: ValidationConfig = DEFAULT_CONFIG) -> pa.Table:
    """Per-row Valid/Invalid verdict with priority-ordered single reason.

    Mirrors the reference's verdict derivation where the *first* failed check
    wins the Reason column — empty before unreadable (``app.py:369-380``).
    """
    m = _masks(t, cfg)
    m[CHECK_TOOL] = pc.or_(m["_missing_tool"], m["_unexpected_tool"])
    reason = pa.array(["OK"] * t.num_rows, pa.string())
    for check in reversed(cfg.reason_priority):
        reason = pc.if_else(m[check], check, reason)
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "valid": pc.equal(reason, "OK"),
            "reason": reason,
        }
    )


def row_checks(
    ds: ray.data.Dataset, cfg: ValidationConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Dataset → violation-row Dataset (streaming, zero-copy Arrow batches)."""
    return ds.map_batches(
        lambda t: row_violations_batch(t, cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )


def verdicts(
    ds: ray.data.Dataset, cfg: ValidationConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Dataset → per-row verdict Dataset."""
    return ds.map_batches(
        lambda t: verdict_batch(t, cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
