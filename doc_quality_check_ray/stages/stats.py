"""Per-column statistics — partial-per-batch, merged tree-wise.

The distributed generalization of the reference's summary-statistics blocks
(``test_readability.py:299-306``, ``app.py:406-414``) and threshold-sweep
percentile analysis (``tests/analyze_thresholds.py:91-200``): null counts,
min/max, text-length stats, timestamp range, distinct counts.

Scale design: every statistic here is a **mergeable partial** computed per
Arrow batch inside ``map_batches`` (one tiny row out per batch), merged on the
driver — the input is never shuffled and ``text`` lengths are consumed
streaming. The only distinct count that cannot merge driver-side at 10^12-turn
scale is ``n_convs`` (conversation cardinality ~10^9), which goes through the
:func:`doc_quality_check_ray.stages.keys.key_counts`-style fine-grained
groupby instead; ``n_roles`` has a tiny domain and merges as per-batch sets.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import DEFAULT_CONFIG, ValidationConfig

_NULLABLE = ("text", "role", "tool", "ts")


def _partial_stats(t: pa.Table) -> pa.Table:
    text = t["text"]
    tlen = pc.utf8_length(text)
    row = {
        "n_rows": [t.num_rows],
        "null_text": [pc.sum(pc.cast(pc.is_null(t["text"]), pa.int64())).as_py() or 0],
        "null_role": [pc.sum(pc.cast(pc.is_null(t["role"]), pa.int64())).as_py() or 0],
        "null_tool": [pc.sum(pc.cast(pc.is_null(t["tool"]), pa.int64())).as_py() or 0],
        "null_ts": [pc.sum(pc.cast(pc.is_null(t["ts"]), pa.int64())).as_py() or 0],
        "min_text_len": [pc.min(tlen).as_py()],
        "max_text_len": [pc.max(tlen).as_py()],
        "sum_text_len": [pc.sum(tlen).as_py()],
        "min_ts": [pc.min(t["ts"]).as_py()],
        "max_ts": [pc.max(t["ts"]).as_py()],
        "roles": [pc.unique(pc.drop_null(t["role"])).to_pylist()],
    }
    return pa.table(
        row,
        schema=pa.schema(
            [
                ("n_rows", pa.int64()),
                ("null_text", pa.int64()),
                ("null_role", pa.int64()),
                ("null_tool", pa.int64()),
                ("null_ts", pa.int64()),
                ("min_text_len", pa.int64()),
                ("max_text_len", pa.int64()),
                ("sum_text_len", pa.int64()),
                ("min_ts", pa.timestamp("us")),
                ("max_ts", pa.timestamp("us")),
                ("roles", pa.list_(pa.string())),
            ]
        ),
    )


def n_distinct_conversations(
    ds: ray.data.Dataset, cfg: ValidationConfig = DEFAULT_CONFIG
) -> int:
    """Exact conversation cardinality via per-batch unique → groupby → count.

    The per-batch combiner bounds shuffle volume to distinct-per-batch keys.
    """
    from .exchange import hash_bucket_aggregate

    partial = ds.select_columns(["conv_id"]).map_batches(
        lambda t: pa.table({"conv_id": pc.unique(t["conv_id"])}),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
    return hash_bucket_aggregate(
        partial, ["conv_id"], {"n": ("conv_id", "count")}
    ).count()


def _merge_partial_rows(t: pa.Table) -> pa.Table:
    """N partial-stat rows → 1 (runs inside tasks as a tree-reduce level)."""
    rows = t.to_pylist()
    roles = sorted({r for p in rows for r in p["roles"]})

    def s(k):
        # all-None → None (SQL NULL-sum semantics: e.g. sum_text_len on an
        # all-null-text shard must stay NULL, not coerce to 0), like mn/mx
        vals = [p[k] for p in rows if p[k] is not None]
        return sum(vals) if vals else None

    def mn(k):
        vals = [p[k] for p in rows if p[k] is not None]
        return min(vals) if vals else None

    def mx(k):
        vals = [p[k] for p in rows if p[k] is not None]
        return max(vals) if vals else None

    merged = {
        "n_rows": [s("n_rows")],
        "null_text": [s("null_text")],
        "null_role": [s("null_role")],
        "null_tool": [s("null_tool")],
        "null_ts": [s("null_ts")],
        "min_text_len": [mn("min_text_len")],
        "max_text_len": [mx("max_text_len")],
        "sum_text_len": [s("sum_text_len")],
        "min_ts": [mn("min_ts")],
        "max_ts": [mx("max_ts")],
        "roles": [roles],
    }
    return pa.table(merged, schema=t.schema)


def column_stats(
    ds: ray.data.Dataset, cfg: ValidationConfig = DEFAULT_CONFIG
) -> pa.Table:
    """One-row stats table over a transcript Dataset (drives the drift check
    snapshot and the verdict manifest's stats block)."""
    partials = (
        ds.map_batches(
            _partial_stats,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            zero_copy_batch=True,
        )
        # tree-reduce level: 128 partial rows merge to 1 inside tasks, so the
        # driver folds O(batches/128) rows, never O(batches)
        .map_batches(_merge_partial_rows, batch_format="pyarrow", batch_size=128)
        .take_all()
    )

    if not partials:  # empty Dataset → DuckDB empty-input semantics:
        # count(*) = 0 but every sum/min/max aggregate is NULL
        partials = [
            {
                "n_rows": 0, "null_text": None, "null_role": None,
                "null_tool": None, "null_ts": None, "min_text_len": None,
                "max_text_len": None, "sum_text_len": None, "min_ts": None,
                "max_ts": None, "roles": [],
            }
        ]

    roles: set[str] = set()
    agg = {k: [] for k in partials[0] if k != "roles"}
    for p in partials:
        roles.update(p["roles"])
        for k in agg:
            agg[k].append(p[k])

    def s(k):
        vals = [v for v in agg[k] if v is not None]
        return sum(vals) if vals else None

    def mn(k):
        vals = [v for v in agg[k] if v is not None]
        return min(vals) if vals else None

    def mx(k):
        vals = [v for v in agg[k] if v is not None]
        return max(vals) if vals else None

    return pa.table(
        {
            "n_rows": pa.array([s("n_rows")], pa.int64()),
            "n_convs": pa.array([n_distinct_conversations(ds, cfg)], pa.int64()),
            "null_text": pa.array([s("null_text")], pa.int64()),
            "null_role": pa.array([s("null_role")], pa.int64()),
            "null_tool": pa.array([s("null_tool")], pa.int64()),
            "null_ts": pa.array([s("null_ts")], pa.int64()),
            "min_text_len": pa.array([mn("min_text_len")], pa.int64()),
            "max_text_len": pa.array([mx("max_text_len")], pa.int64()),
            "sum_text_len": pa.array([s("sum_text_len")], pa.int64()),
            "min_ts": pa.array([mn("min_ts")], pa.timestamp("us")),
            "max_ts": pa.array([mx("max_ts")], pa.timestamp("us")),
            "n_roles": pa.array([len(roles)], pa.int64()),
        }
    )
