"""Column-stats merge semantics: SQL NULL-sum behavior and empty inputs."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from doc_quality_check_ray.schema import TRANSCRIPT_SCHEMA
from doc_quality_check_ray.stages.stats import column_stats


def _table(rows: list[dict]) -> pa.Table:
    cols = {f.name: [r.get(f.name) for r in rows] for f in TRANSCRIPT_SCHEMA}
    return pa.table(
        {f.name: pa.array(cols[f.name], f.type) for f in TRANSCRIPT_SCHEMA},
        schema=TRANSCRIPT_SCHEMA,
    )


def test_all_null_text_sum_stays_null():
    """sum(length(text)) over an all-null-text table is SQL NULL, not 0 —
    the tree-reduce level must not coerce it (ADVICE r2)."""
    t = _table(
        [
            {"conv_id": "c0", "turn_idx": 0, "role": "user", "ts": 0},
            {"conv_id": "c0", "turn_idx": 1, "role": "assistant", "ts": 1},
        ]
    )
    out = column_stats(ray.data.from_arrow(t)).to_pylist()[0]
    assert out["n_rows"] == 2
    assert out["null_text"] == 2
    assert out["sum_text_len"] is None
    assert out["min_text_len"] is None and out["max_text_len"] is None


def test_empty_dataset_column_stats():
    """Zero-row input: count(*)-style stats are 0, every sum/min/max NULL
    (DuckDB empty-input semantics); must not crash on missing partials."""
    out = column_stats(ray.data.from_arrow(TRANSCRIPT_SCHEMA.empty_table())).to_pylist()[0]
    assert out["n_rows"] == 0 and out["n_convs"] == 0 and out["n_roles"] == 0
    assert out["null_text"] is None and out["sum_text_len"] is None
    assert out["min_ts"] is None and out["max_ts"] is None
