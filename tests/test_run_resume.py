"""End-to-end resumable run: kill after partial completion, resume, outputs
identical to a single clean run (FIXTURES.md resume test)."""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from doc_quality_check_ray.config import ValidationConfig
from doc_quality_check_ray.pipelines.reports import render_html_report, render_txt_report
from doc_quality_check_ray.pipelines.run import run_validation
from doc_quality_check_ray.synth import DEFAULT_PLANT, write_transcripts_parquet

CFG = ValidationConfig(batch_size=4096, shard_group_size=1)  # 1 file per checkpoint


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    # 4 shards of 50 convs each
    write_transcripts_parquet(
        str(d), n_convs=200, turns_per_conv=8, seed=21,
        plant=DEFAULT_PLANT, convs_per_file=50,
    )
    assert len(list(d.glob("*.parquet"))) == 4
    return str(d)


def _fingerprint(out: Path) -> dict:
    summary = json.loads((out / "run_summary.json").read_text())
    summary.pop("processed"), summary.pop("skipped")
    for k in [k for k in summary if k.startswith("wall_")]:  # timings vary
        summary.pop(k)
    viol = sorted(
        tuple(r.values())
        for f in sorted(out.glob("partials/shard=*/kind=v/*.parquet"))
        for r in pq.read_table(
            f, columns=["conv_id", "turn_idx", "check_id", "detail"]
        ).to_pylist()
    )
    dups = sorted(
        tuple(r.values())
        for f in sorted((out / "global" / "key_findings" / "finding=dup").rglob("*.parquet"))
        for r in pq.read_table(f, columns=["conv_id", "turn_idx", "n_dups"]).to_pylist()
    )
    return {"summary": summary, "viol": viol, "dups": dups}


def test_clean_run_and_reports(corpus, tmp_path):
    out = tmp_path / "out"
    summary = run_validation(corpus, str(out), CFG)
    assert summary["partial"] is False
    assert summary["n_groups"] == 4 and summary["processed"] == 4
    # each shard chunk plants its own violations (seed offset per part)
    assert summary["n_rows"] == 200 * 8 + 4 * DEFAULT_PLANT.dup_rows
    assert summary["n_duplicate_keys"] == 4 * DEFAULT_PLANT.dup_rows

    txt = render_txt_report(str(out))
    assert "PER-PARTITION VERDICTS" in txt and "FAIL" in txt
    html = render_html_report(str(out))
    assert "<title>" in html
    assert (out / "report.txt").exists() and (out / "report.html").exists()


def test_export_content_json(corpus, tmp_path):
    import json

    import ray.data

    from doc_quality_check_ray.pipelines.reports import export_content_json

    ds = ray.data.read_parquet(corpus)
    out = tmp_path / "content_json"
    export_content_json(ds, str(out))
    files = list(out.glob("*.json"))
    assert files
    row = json.loads(next(iter(files)).read_text().splitlines()[0])
    assert set(row) == {"conv_id", "turn_idx", "text"}


def test_kill_resume_identical(corpus, tmp_path):
    clean_out = tmp_path / "clean"
    run_validation(corpus, str(clean_out), CFG)

    resumed_out = tmp_path / "resumed"
    partial = run_validation(corpus, str(resumed_out), CFG, max_groups=2)
    assert partial["partial"] is True and partial["processed"] == 2
    assert not (resumed_out / "run_summary.json").exists()

    final = run_validation(corpus, str(resumed_out), CFG)
    assert final["partial"] is False
    assert final["skipped"] == 2 and final["processed"] == 2

    assert _fingerprint(clean_out) == _fingerprint(resumed_out)


def test_resume_redoes_scanned_but_unfinalized_group(corpus, tmp_path):
    """The deferred-manifest window: a group whose partials were written but
    whose manifest never landed (kill between scan and finalize) must be
    redone cleanly on resume, with output identical to a clean run."""
    from doc_quality_check_ray.pipelines.run import _list_shards, _process_group

    clean_out = tmp_path / "cleanB"
    run_validation(corpus, str(clean_out), CFG)

    out = tmp_path / "orphan"
    files = [f for _, f in _list_shards(corpus)]
    # scan group 00000 but never finalize it (no manifest entry)
    _process_group("00000", files[:1], out, CFG)
    assert (out / "partials" / "shard=00000").exists()
    assert not (out / "_manifest" / "shard-00000.json").exists()

    final = run_validation(corpus, str(out), CFG)
    assert final["partial"] is False and final["processed"] == 4
    assert _fingerprint(clean_out) == _fingerprint(out)


def test_resume_skips_everything_when_complete(corpus, tmp_path):
    out = tmp_path / "out2"
    run_validation(corpus, str(out), CFG)
    again = run_validation(corpus, str(out), CFG)
    assert again["skipped"] == 4 and again["processed"] == 0


def test_drift_gate_against_snapshot(corpus, tmp_path):
    out = tmp_path / "out3"
    run_validation(corpus, str(out), CFG)
    snap = out / "global" / "stats.json"

    # validate the same corpus against its own snapshot → no drift
    out2 = tmp_path / "out4"
    s = run_validation(corpus, str(out2), CFG, snapshot_path=str(snap))
    assert s["drift"]["checked"] is True and s["drift"]["drifted"] is False

    # the actor-pool per-batch scan ran and covered every row
    batches = pq.read_table(out2 / "global" / "drift_batches").to_pandas()
    assert batches["n_rows"].sum() == s["n_rows"]
    assert not batches["drifted"].any()
