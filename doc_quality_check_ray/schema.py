"""Declared Arrow schemas for every table the engine reads or emits.

The reference has *no* declared schema anywhere — rows are dicts with
conditionally-present keys (``app.py:383-400``, ``test_readability.py:223-233``).
The engine replaces that with fixed, nullable Arrow schemas: dynamic
"columns appear per enabled check" behavior becomes config-enabled rows in the
verdict table (SURVEY.md §1.3).
"""

from __future__ import annotations

import pyarrow as pa

#: The input transcript table (BASELINE.json ``input_hint``).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

#: Materialized violation rows — the analog of the reference's ``invalid_pages``
#: list of ``(page_info, reason)`` (``app.py:110,376,380``) and the dedicated
#: UNREADABLE / EMPTY report sections (``test_readability.py:856-879``).
VIOLATION_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("check_id", pa.string()),
        pa.field("detail", pa.string()),
    ]
)

#: Per-row verdict — the analog of the reference's Valid/Invalid + Reason row
#: (``app.py:369-400``): priority-ordered single reason, first failed check wins.
VERDICT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("valid", pa.bool_()),
        pa.field("reason", pa.string()),
    ]
)

#: Per-partition verdict manifest row (pass/fail + per-check counts), the
#: distributed analog of the reference's summary stats block
#: (``test_readability.py:299-306``).
PARTITION_VERDICT_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.int32()),
        pa.field("n_rows", pa.int64()),
        pa.field("n_violations", pa.int64()),
        pa.field("passed", pa.bool_()),
    ]
)

VIOLATION_COLUMNS = [f.name for f in VIOLATION_SCHEMA]
TRANSCRIPT_COLUMNS = [f.name for f in TRANSCRIPT_SCHEMA]


def empty_violations() -> pa.Table:
    """An empty, correctly-typed violation table (for batches with no hits)."""
    return VIOLATION_SCHEMA.empty_table()
