"""End-to-end curation pipeline: multi-shard run, resume semantics, and
composition equality against the DuckDB three-stage oracle."""

from __future__ import annotations

import json
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow.parquet as pq

from doc_quality_check_ray.pipelines.curate import run_curation
from doc_quality_check_ray.pipelines.documents import (
    FILTER_MIN_TOKENS,
    FILTER_TOP_FRAC,
    SAMPLE_HEX_LT,
)
from doc_quality_check_ray.pipelines.oracle import sql_curate_keep


def _split_corpus(sf_dir: str, dst: Path, n_shards: int = 3) -> Path:
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    dst.mkdir(parents=True)
    step = (t.num_rows + n_shards - 1) // n_shards
    for i in range(n_shards):
        pq.write_table(t.slice(i * step, step), dst / f"part-{i}.parquet")
    return dst


def _final_frame(out: Path) -> pd.DataFrame:
    t = pq.read_table(out / "final", columns=["doc_id", "source"])
    df = t.to_pandas()
    df["source"] = df["source"].astype(str)
    return df.sort_values(["doc_id"], ignore_index=True)[["doc_id", "source"]]


def test_curation_multishard_matches_oracle_and_resumes(tmp_path, sf_dir):
    corpus = _split_corpus(sf_dir, tmp_path / "corpus", n_shards=3)
    out = tmp_path / "run1"
    summary = run_curation(str(corpus), str(out), resume=False)
    assert summary["n_shards"] == 3
    assert summary["n_input"] == pq.read_metadata(
        f"{sf_dir}/documents.parquet"
    ).num_rows
    assert summary["n_final"] == summary["n_input"] - summary["n_gated_out"] - (
        summary["n_removed_dedup_or_decontaminated"]
    )

    got = _final_frame(out)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.sql(sql_curate_keep(FILTER_MIN_TOKENS, FILTER_TOP_FRAC, SAMPLE_HEX_LT))
        .df()
        .sort_values(["doc_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)

    # ---- kill/resume: drop one shard's manifest + output, resume, same final
    victim = out / "_manifest" / "shard-00001.json"
    entry = json.loads(victim.read_text())
    victim.unlink()
    import shutil

    shutil.rmtree(out / "scored" / "shard=00001")
    resumed = run_curation(str(corpus), str(out), resume=True)
    assert resumed["n_input"] == summary["n_input"]
    assert resumed["n_final"] == summary["n_final"]
    assert json.loads(
        (out / "_manifest" / "shard-00001.json").read_text()
    )["n_kept"] == entry["n_kept"]
    pd.testing.assert_frame_equal(_final_frame(out), want, check_exact=True)

    # resume skips completed shards: manifests untouched, summary identical
    again = run_curation(str(corpus), str(out), resume=True)
    assert again["n_final"] == summary["n_final"]


def test_curation_resume_detects_regenerated_input(tmp_path, sf_dir):
    """ADVICE r4: a corpus regenerated in place must invalidate the pinned
    checkpoints — the input fingerprint (footer row count + mtime) mismatch
    forces a full rebuild instead of silently reusing stale output."""
    corpus = _split_corpus(sf_dir, tmp_path / "corpus", n_shards=2)
    out = tmp_path / "run"
    first = run_curation(str(corpus), str(out), resume=True)

    # regenerate shard 1 in place with half its rows (row count changes)
    victim = corpus / "part-1.parquet"
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, t.num_rows // 2), victim)

    rebuilt = run_curation(str(corpus), str(out), resume=True)
    assert rebuilt["n_input"] < first["n_input"]
    # the recorded fingerprint now matches the regenerated input, so a
    # further resume is a cheap no-op with the same summary
    again = run_curation(str(corpus), str(out), resume=True)
    assert again["n_input"] == rebuilt["n_input"]
    assert again["n_final"] == rebuilt["n_final"]
