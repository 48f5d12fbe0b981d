"""Schema conformance + column-stats gates."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from doc_quality_check_ray.config import ValidationConfig
from doc_quality_check_ray.pipelines.run import _column_stats_gate, run_validation
from doc_quality_check_ray.schema import TRANSCRIPT_SCHEMA
from doc_quality_check_ray.stages.schema_check import check_parquet_schema, check_schema
from doc_quality_check_ray.state.snapshot import StatsSnapshot
from doc_quality_check_ray.synth import CLEAN, write_transcripts_parquet


def test_check_schema_conforming():
    assert check_schema(TRANSCRIPT_SCHEMA) == []


def test_check_schema_findings():
    s = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int64()),  # mistyped (declared int32)
            ("role", pa.string()),
            ("text", pa.string()),
            # 'tool' missing
            ("ts", pa.timestamp("us")),
            ("extra_col", pa.float64()),
        ]
    )
    f = {x.column: x.problem for x in check_schema(s)}
    assert f == {"turn_idx": "type_mismatch", "tool": "missing", "extra_col": "extra"}


def test_run_summary_carries_schema_report(tmp_path):
    d = tmp_path / "c"
    write_transcripts_parquet(str(d), n_convs=30, seed=3, plant=CLEAN, convs_per_file=30)
    # add an extra column to one file
    fpath = next(iter(sorted(d.glob("*.parquet"))))
    t = pq.read_table(fpath)
    t = t.append_column("debug_tag", pa.array(["x"] * t.num_rows))
    pq.write_table(t, fpath, row_group_size=32 * 1024)

    s = run_validation(str(d), str(tmp_path / "o"), ValidationConfig(shard_group_size=1))
    assert s["schema"]["ok"] is True  # extras are tolerated
    (only_file,) = s["schema"]["per_file"].keys()
    assert s["schema"]["per_file"][only_file][0]["problem"] == "extra"
    assert s["column_stats_gate"]["passed"] is True
    rates = s["column_stats_gate"]["checks"]
    assert rates["null_text_rate"]["value"] == 0.0


def test_column_stats_gate_trips():
    snap = StatsSnapshot(
        n_rows=100,
        role_counts={"user": 80, "<null>": 20},
        length_edges=(0.0, 16.0),
        length_hist=[40, 50],  # 90 non-null → 10 null texts
        tdigest_means=[],
        tdigest_weights=[],
        ts_min=None,
        ts_max=None,
        ts_tdigest_means=[],
        ts_tdigest_weights=[100.0],
        max_text_len=5000,
    )
    cfg = ValidationConfig(
        max_null_text_rate=0.05, max_null_role_rate=0.01, max_null_ts_rate=0.0,
        max_text_len=4096,
    )
    gate = _column_stats_gate(snap, cfg)
    assert gate["passed"] is False
    assert not gate["checks"]["null_text_rate"]["ok"]  # 0.10 > 0.05
    assert not gate["checks"]["null_role_rate"]["ok"]  # 0.20 > 0.01
    assert not gate["checks"]["max_text_len"]["ok"]  # 5000 > 4096
    assert gate["checks"]["null_ts_rate"]["ok"]


def test_check_parquet_schema_ok(tmp_path):
    d = tmp_path / "c"
    write_transcripts_parquet(str(d), n_convs=10, seed=4, plant=CLEAN, convs_per_file=10)
    rep = check_parquet_schema([str(p) for p in d.glob("*.parquet")])
    assert rep["ok"] is True and rep["per_file"] == {}
