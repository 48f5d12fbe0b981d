"""Hot-conversation auto-selection: a mega-conversation corpus must take the
salted (order-free mergeable) key-finding path in phase 2 and produce
findings identical to the conv-bucketed fast path."""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from doc_quality_check_ray.config import ValidationConfig
from doc_quality_check_ray.pipelines.run import run_validation
from doc_quality_check_ray.synth import PlantSpec, write_transcripts_parquet

PLANT = PlantSpec(dup_rows=4, gap_convs=3, hot_conv_turns=5000)


@pytest.fixture(scope="module")
def hot_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("hotcorpus")
    write_transcripts_parquet(
        str(d), n_convs=50, turns_per_conv=8, seed=33,
        plant=PLANT, convs_per_file=51,
    )
    return str(d)


def _key_findings(out: Path):
    dup = sorted(
        tuple(r.values())
        for f in (out / "global" / "key_findings" / "finding=dup").rglob("*.parquet")
        for r in pq.read_table(f).to_pylist()
    )
    gap = sorted(
        tuple(r.values())
        for f in (out / "global" / "key_findings" / "finding=gap").rglob("*.parquet")
        for r in pq.read_table(f).to_pylist()
    )
    return dup, gap


def test_mega_conversation_takes_salted_path_with_identical_findings(
    hot_corpus, tmp_path
):
    # batch 1024 < the 5000-turn conversation → the sketch's probe sees a
    # batch filled by one conv → salted path
    cfg_hot = ValidationConfig(
        batch_size=1024, shard_group_size=1, hot_conv_turns=1000
    )
    out_a = tmp_path / "salted"
    s_a = run_validation(hot_corpus, str(out_a), cfg_hot)
    assert s_a["key_path"] == "salted"
    assert s_a["max_conv_batch"] >= 1000

    # batch 8192 > the conversation and a sky-high threshold → fast path
    cfg_cold = ValidationConfig(
        batch_size=8192, shard_group_size=1, hot_conv_turns=10**9
    )
    out_b = tmp_path / "bucketed"
    s_b = run_validation(hot_corpus, str(out_b), cfg_cold)
    assert s_b["key_path"] == "conv_bucket"

    assert _key_findings(out_a) == _key_findings(out_b)
    # the same corpus facts fall out of both paths
    for k in ("n_rows", "n_duplicate_keys", "n_gap_conversations"):
        assert s_a[k] == s_b[k], k


def test_small_corpus_stays_on_fast_path(tmp_path):
    d = tmp_path / "small"
    write_transcripts_parquet(
        str(d), n_convs=40, turns_per_conv=8, seed=5,
        plant=PlantSpec(dup_rows=2), convs_per_file=40,
    )
    out = tmp_path / "out"
    s = run_validation(str(d), str(out), ValidationConfig(shard_group_size=1))
    assert s["key_path"] == "conv_bucket"
    assert s["max_conv_batch"] < s["n_rows"]
