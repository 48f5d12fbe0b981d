"""M18 analog: exceptions inside the fused scan become ``batch_error``
violation rows instead of failing the task (``test_readability.py:257-271``
converts per-file crashes to error rows).

Boundary (verified at the CLI surface): a shard whose column TYPES conflict
with the corpus schema aborts in Ray's block-merge layer *before* the UDF —
that is task-level territory (Ray retries / abort with a clear ArrowTypeError).
A shard with a *missing* column is handled gracefully upstream (Arrow schema
unification fills nulls → rows flag ``empty_turn``). The in-UDF guard covers
kernel/logic failures on well-typed batches.
"""

from __future__ import annotations

import pyarrow as pa

import doc_quality_check_ray.pipelines.run as R
from doc_quality_check_ray.config import DEFAULT_CONFIG
from doc_quality_check_ray.synth import synth_transcripts


def test_udf_exception_becomes_batch_error_row(monkeypatch):
    table, _ = synth_transcripts(n_convs=5)

    def boom(t, cfg):
        raise ValueError("synthetic kernel failure")

    monkeypatch.setattr(R, "_fused_phase1_batch_inner", boom)
    out = R._fused_phase1_batch(table, DEFAULT_CONFIG)
    assert out.num_rows == 1
    row = out.to_pylist()[0]
    assert row["kind"] == "v" and row["check_id"] == "batch_error"
    assert "ValueError: synthetic kernel failure" in row["detail"]
    assert row["cnt"] == table.num_rows  # rows affected are accounted for


def test_batch_errors_surface_in_summary_counts(tmp_path):
    """Errored batches emit no p/q partials, so partition verdicts cannot
    see them — _count_batch_errors must surface them for the run summary."""
    import pyarrow.parquet as pq

    table, _ = synth_transcripts(n_convs=5)

    def boom(t, cfg):
        raise ValueError("synthetic kernel failure")

    import unittest.mock as mock

    with mock.patch.object(R, "_fused_phase1_batch_inner", boom):
        err_rows = R._fused_phase1_batch(table, DEFAULT_CONFIG)
    vdir = tmp_path / "partials" / "shard=00000" / "kind=v"
    vdir.mkdir(parents=True)
    pq.write_table(err_rows.drop_columns(["kind"]), vdir / "part-0.parquet")

    import ray

    n_err, n_lost = ray.get(
        R._count_batch_errors_task.remote(R._shard_dirs(tmp_path, "v"))
    )
    assert n_err == 1
    assert n_lost == table.num_rows


def test_missing_column_batches_flow_through():
    # missing 'tool' column arrives as nulls after schema unification:
    # rows must flag tool_role_consistency for role=tool, not crash
    table, _ = synth_transcripts(n_convs=3)
    table = table.drop_columns(["tool"]).append_column(
        "tool", pa.nulls(table.num_rows, pa.string())
    )
    out = R._fused_phase1_batch(table, DEFAULT_CONFIG)
    checks = set(
        out.filter(pa.compute.equal(out["kind"], "v"))["check_id"].to_pylist()
    )
    assert "batch_error" not in checks
