"""Row-level checks — a config-driven registry of stateless, vectorized
``map_batches`` checks.

Re-expresses the reference's per-page quality gates as per-turn constraint
checks (SURVEY.md §7.1), behind the reference's extension surface
(SURVEY.md §2.11: adding a document type in ``config.json:2-57`` needs zero
code — here, adding a row check = one :func:`register_row_check` call + its
id in ``ValidationConfig.enabled_row_checks``):

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

Each registry entry carries BOTH the Arrow kernels and the DuckDB-SQL
fragment generators, so the engine stage and the correctness oracle are
derived from the same definition and cannot drift apart. Every mask is an
Arrow compute kernel — no Python per row; shared intermediates (the empty
mask, the quality ratio) are memoized per batch in a context dict.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import DEFAULT_CONFIG, ValidationConfig
from ..functions.quality import sql_valid_char_ratio_expr, valid_char_ratio
from ..schema import VIOLATION_SCHEMA

CHECK_EMPTY = "empty_turn"
CHECK_ROLE = "invalid_role"
CHECK_TOOL = "tool_role_consistency"
CHECK_QUALITY = "low_quality_text"

DETAIL_EMPTY = "text null or blank"
DETAIL_MISSING_TOOL = "missing_tool"
DETAIL_UNEXPECTED_TOOL = "unexpected_tool"


# -- shared per-batch intermediates (memoized in ctx) ------------------------


def _ctx_empty(t: pa.Table, ctx: dict) -> pa.Array:
    if "empty" not in ctx:
        text = t["text"]
        empty = pc.or_kleene(
            pc.is_null(text), pc.equal(pc.utf8_trim(text, characters=" "), "")
        )
        ctx["empty"] = pc.fill_null(empty, True)
    return ctx["empty"]


def _ctx_ratio(t: pa.Table, ctx: dict):
    if "ratio" not in ctx:
        ctx["ratio"] = valid_char_ratio(t["text"])
    return ctx["ratio"]


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


# -- the registry ------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RowCheck:
    """One row-level check: Arrow kernels + the SQL twin, in one place.

    ``emit(t, cfg, ctx)`` returns violation-row tables; ``verdict_mask``
    the per-row boolean for the priority reason; ``sql_fragments(cfg)``
    full (conv_id, turn_idx, check_id, detail) SELECTs for the violation
    union; ``sql_predicate(cfg)`` the boolean expression used by the
    verdict CASE and conversation rollups.
    """

    check_id: str
    emit: Callable[[pa.Table, ValidationConfig, dict], list[pa.Table]]
    verdict_mask: Callable[[pa.Table, ValidationConfig, dict], pa.Array]
    sql_fragments: Callable[[ValidationConfig], list[str]]
    sql_predicate: Callable[[ValidationConfig], str]


ROW_CHECK_REGISTRY: dict[str, RowCheck] = {}


def register_row_check(check: RowCheck, replace: bool = False) -> RowCheck:
    """Adding a check = this call + its id in ``enabled_row_checks`` —
    the engine stage AND the DuckDB oracle both pick it up."""
    if check.check_id in ROW_CHECK_REGISTRY and not replace:
        raise ValueError(f"row check already registered: {check.check_id}")
    ROW_CHECK_REGISTRY[check.check_id] = check
    return check


def _enabled(cfg: ValidationConfig) -> list[RowCheck]:
    unknown = [c for c in cfg.enabled_row_checks if c not in ROW_CHECK_REGISTRY]
    if unknown:
        raise KeyError(f"enabled_row_checks not registered: {unknown}")
    return [ROW_CHECK_REGISTRY[c] for c in cfg.enabled_row_checks]


def _reason_order(cfg: ValidationConfig) -> list[str]:
    """Priority order over the *enabled* checks; enabled checks missing from
    ``reason_priority`` rank last, in enablement order."""
    pri = [c for c in cfg.reason_priority if c in cfg.enabled_row_checks]
    return pri + [c for c in cfg.enabled_row_checks if c not in pri]


# -- built-in checks ---------------------------------------------------------


def _roles_in(cfg: ValidationConfig) -> str:
    return ", ".join(f"'{r}'" for r in cfg.valid_roles)


register_row_check(
    RowCheck(
        check_id=CHECK_EMPTY,
        emit=lambda t, cfg, ctx: [_emit(t, _ctx_empty(t, ctx), CHECK_EMPTY, DETAIL_EMPTY)],
        verdict_mask=lambda t, cfg, ctx: _ctx_empty(t, ctx),
        sql_fragments=lambda cfg: [
            f"""SELECT conv_id, turn_idx, '{CHECK_EMPTY}' AS check_id,
       '{DETAIL_EMPTY}' AS detail
  FROM transcripts WHERE text IS NULL OR trim(text) = ''"""
        ],
        sql_predicate=lambda cfg: "(text IS NULL OR trim(text) = '')",
    )
)


def _role_mask(t: pa.Table, cfg: ValidationConfig, ctx: dict) -> pa.Array:
    role = t["role"]
    bad = pc.or_kleene(
        pc.is_null(role), pc.invert(pc.is_in(role, value_set=pa.array(cfg.valid_roles)))
    )
    return pc.fill_null(bad, True)


register_row_check(
    RowCheck(
        check_id=CHECK_ROLE,
        emit=lambda t, cfg, ctx: [
            _emit(
                t,
                _role_mask(t, cfg, ctx),
                CHECK_ROLE,
                lambda hit: pc.binary_join_element_wise(
                    "role=", pc.fill_null(hit["role"], "<null>"), ""
                ),
            )
        ],
        verdict_mask=_role_mask,
        sql_fragments=lambda cfg: [
            f"""SELECT conv_id, turn_idx, '{CHECK_ROLE}' AS check_id,
       'role=' || coalesce(role, '<null>') AS detail
  FROM transcripts WHERE role IS NULL OR role NOT IN ({_roles_in(cfg)})"""
        ],
        sql_predicate=lambda cfg: f"(role IS NULL OR role NOT IN ({_roles_in(cfg)}))",
    )
)


def _tool_masks(t: pa.Table, cfg: ValidationConfig, ctx: dict):
    if "tool_masks" not in ctx:
        role_f = pc.fill_null(t["role"], "")
        is_tool_role = pc.equal(role_f, "tool")
        ctx["tool_masks"] = (
            pc.and_(is_tool_role, pc.is_null(t["tool"])),
            pc.and_(pc.invert(is_tool_role), pc.is_valid(t["tool"])),
        )
    return ctx["tool_masks"]


register_row_check(
    RowCheck(
        check_id=CHECK_TOOL,
        emit=lambda t, cfg, ctx: [
            _emit(t, _tool_masks(t, cfg, ctx)[0], CHECK_TOOL, DETAIL_MISSING_TOOL),
            _emit(t, _tool_masks(t, cfg, ctx)[1], CHECK_TOOL, DETAIL_UNEXPECTED_TOOL),
        ],
        verdict_mask=lambda t, cfg, ctx: pc.or_(*_tool_masks(t, cfg, ctx)),
        sql_fragments=lambda cfg: [
            f"""SELECT conv_id, turn_idx, '{CHECK_TOOL}' AS check_id,
       '{DETAIL_MISSING_TOOL}' AS detail
  FROM transcripts WHERE coalesce(role, '') = 'tool' AND tool IS NULL""",
            f"""SELECT conv_id, turn_idx, '{CHECK_TOOL}' AS check_id,
       '{DETAIL_UNEXPECTED_TOOL}' AS detail
  FROM transcripts WHERE coalesce(role, '') <> 'tool' AND tool IS NOT NULL""",
        ],
        sql_predicate=lambda cfg: (
            "((coalesce(role,'') = 'tool' AND tool IS NULL) "
            "OR (coalesce(role,'') <> 'tool' AND tool IS NOT NULL))"
        ),
    )
)


def _quality_mask(t: pa.Table, cfg: ValidationConfig, ctx: dict) -> pa.Array:
    low = pc.and_kleene(
        pc.invert(_ctx_empty(t, ctx)),
        pc.less(_ctx_ratio(t, ctx), cfg.quality_ratio_threshold),
    )
    return pc.fill_null(low, False)


register_row_check(
    RowCheck(
        check_id=CHECK_QUALITY,
        emit=lambda t, cfg, ctx: [
            _emit(
                t,
                _quality_mask(t, cfg, ctx),
                CHECK_QUALITY,
                f"valid_char_ratio<{cfg.quality_ratio_threshold}",
            )
        ],
        verdict_mask=_quality_mask,
        sql_fragments=lambda cfg: [
            f"""SELECT conv_id, turn_idx, '{CHECK_QUALITY}' AS check_id,
       'valid_char_ratio<{cfg.quality_ratio_threshold}' AS detail
  FROM transcripts
 WHERE NOT (text IS NULL OR trim(text) = '')
   AND {sql_valid_char_ratio_expr("text")} < {cfg.quality_ratio_threshold}"""
        ],
        sql_predicate=lambda cfg: (
            f"(NOT (text IS NULL OR trim(text) = '') AND coalesce("
            f"{sql_valid_char_ratio_expr('text')} < {cfg.quality_ratio_threshold},"
            f" FALSE))"
        ),
    )
)


CHECK_ARTIFACT = "artifact_text"


def _artifact_class_masks(t: pa.Table, cfg: ValidationConfig, ctx: dict):
    """One boolean mask per artifact class + the OR of all of them,
    memoized per batch (each pattern is ONE vectorized RE2 scan)."""
    if "artifact" not in ctx:
        masks = [
            (name, pc.fill_null(pc.match_substring_regex(t["text"], pat), False))
            for name, pat in cfg.artifact_patterns
        ]
        any_mask = masks[0][1]
        for _, m in masks[1:]:
            any_mask = pc.or_(any_mask, m)
        ctx["artifact"] = (masks, any_mask)
    return ctx["artifact"]


def _artifact_detail(cfg: ValidationConfig):
    """detail = 'classes=' + comma-joined matched class names (bank order) —
    the per-row artifact-type breakdown of ``get_artifact_types``
    (``utils/text_filter.py:154-191``). Arrow's skip-null element-wise join
    is the exact twin of SQL ``concat_ws`` (both drop unmatched classes)."""

    def detail(hit: pa.Table) -> pa.Array:
        masks, _ = _artifact_class_masks(hit, cfg, {})
        pieces = [
            pc.if_else(m, name, pa.scalar(None, pa.string())) for name, m in masks
        ]
        joined = pc.binary_join_element_wise(*pieces, ",", null_handling="skip")
        return pc.binary_join_element_wise("classes=", joined, "")

    return detail


def _sql_artifact_case(name: str, pat: str) -> str:
    return f"CASE WHEN regexp_matches(text, '{pat}') THEN '{name}' END"


register_row_check(
    RowCheck(
        check_id=CHECK_ARTIFACT,
        emit=lambda t, cfg, ctx: [
            _emit(
                t,
                _artifact_class_masks(t, cfg, ctx)[1],
                CHECK_ARTIFACT,
                _artifact_detail(cfg),
            )
        ],
        verdict_mask=lambda t, cfg, ctx: _artifact_class_masks(t, cfg, ctx)[1],
        sql_fragments=lambda cfg: [
            f"""SELECT conv_id, turn_idx, '{CHECK_ARTIFACT}' AS check_id,
       'classes=' || concat_ws(',', {", ".join(_sql_artifact_case(n, p) for n, p in cfg.artifact_patterns)}) AS detail
  FROM transcripts
 WHERE {" OR ".join(f"regexp_matches(text, '{p}')" for _, p in cfg.artifact_patterns)}"""
        ],
        sql_predicate=lambda cfg: (
            "coalesce("
            + " OR ".join(
                f"regexp_matches(text, '{p}')" for _, p in cfg.artifact_patterns
            )
            + ", FALSE)"
        ),
    )
)


# -- batch kernels -----------------------------------------------------------


def row_violations_batch(
    t: pa.Table, cfg: ValidationConfig = DEFAULT_CONFIG
) -> pa.Table:
    """All enabled checks' violation rows for one batch (a row can hit
    several checks) — the materialized-violations analog of the reference's
    ``invalid_pages`` accumulation (``app.py:369-380``)."""
    ctx: dict = {}
    parts = []
    for chk in _enabled(cfg):
        parts.extend(chk.emit(t, cfg, ctx))
    if not parts:
        return VIOLATION_SCHEMA.empty_table()
    return pa.concat_tables(parts)


def verdict_batch(t: pa.Table, cfg: ValidationConfig = DEFAULT_CONFIG) -> pa.Table:
    """Per-row Valid/Invalid verdict with priority-ordered single reason.

    Mirrors the reference's verdict derivation where the *first* failed check
    wins the Reason column — empty before unreadable (``app.py:369-380``).
    """
    ctx: dict = {}
    reason = pa.array(["OK"] * t.num_rows, pa.string())
    for check_id in reversed(_reason_order(cfg)):
        m = ROW_CHECK_REGISTRY[check_id].verdict_mask(t, cfg, ctx)
        reason = pc.if_else(m, check_id, reason)
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "valid": pc.equal(reason, "OK"),
            "reason": reason,
        }
    )


# -- SQL twins generated from the registry -----------------------------------


def sql_violation_fragments(cfg: ValidationConfig = DEFAULT_CONFIG) -> list[str]:
    """Full (conv_id, turn_idx, check_id, detail) SELECTs, one per enabled
    check emission — the oracle's violation union is built from these."""
    out: list[str] = []
    for chk in _enabled(cfg):
        out.extend(chk.sql_fragments(cfg))
    return out


def sql_reason_case(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Priority-ordered single-reason CASE (first failed check wins)."""
    whens = "\n      ".join(
        f"WHEN {ROW_CHECK_REGISTRY[c].sql_predicate(cfg)} THEN '{c}'"
        for c in _reason_order(cfg)
    )
    return f"""CASE
      {whens}
      ELSE 'OK'
    END"""


def sql_any_violation_predicate(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """OR of every enabled check's predicate (conversation rollups)."""
    return "(" + "\n      OR ".join(
        chk.sql_predicate(cfg) for chk in _enabled(cfg)
    ) + ")"


# -- Dataset stages ----------------------------------------------------------


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
