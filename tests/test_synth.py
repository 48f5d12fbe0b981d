"""Planted == reported: the engine must find exactly the violations the
seeded generator planted (FIXTURES.md property invariants)."""

from __future__ import annotations

import pyarrow.compute as pc
import ray.data

from doc_quality_check_ray.stages.keys import duplicate_keys, turn_gaps
from doc_quality_check_ray.stages.row_checks import row_checks
from doc_quality_check_ray.synth import CLEAN, DEFAULT_PLANT, PlantSpec, synth_transcripts

ROW_CHECKS = ["empty_turn", "invalid_role", "tool_role_consistency", "low_quality_text"]


def _engine_row_keys(table):
    ds = ray.data.from_arrow(table).repartition(8)
    v = row_checks(ds).to_pandas()
    out = {c: set() for c in ROW_CHECKS}
    for _, r in v.iterrows():
        out[r.check_id].add((r.conv_id, r.turn_idx))
    return out


def test_clean_corpus_zero_violations():
    table, _ = synth_transcripts(n_convs=50, plant=CLEAN)
    ds = ray.data.from_arrow(table).repartition(4)
    assert row_checks(ds).count() == 0
    assert duplicate_keys(ds).count() == 0
    assert turn_gaps(ds).count() == 0


def test_planted_row_violations_exact():
    table, expected = synth_transcripts(n_convs=100, plant=DEFAULT_PLANT, seed=11)
    got = _engine_row_keys(table)
    for check in ROW_CHECKS:
        assert got[check] == expected[check], check


def test_planted_key_violations_exact():
    table, expected = synth_transcripts(n_convs=100, plant=DEFAULT_PLANT, seed=13)
    ds = ray.data.from_arrow(table).repartition(8)
    dup = duplicate_keys(ds).to_pandas()
    assert set(zip(dup.conv_id, dup.turn_idx)) == expected["duplicate_key"]
    assert (dup.n_dups == 2).all()
    gaps = turn_gaps(ds).to_pandas()
    assert set(gaps.conv_id) == expected["turn_gap"]


def test_big_skew_salting_equivalence():
    """One hot conversation (50k turns) among small ones: partial-aggregate
    path must report the identical violations — and not blow up (the
    ``big-pdf-but-readable`` analog, SURVEY.md §7.4 skew)."""
    plant = PlantSpec(dup_rows=5, gap_convs=2, hot_conv_turns=50_000)
    table, expected = synth_transcripts(n_convs=200, plant=plant, seed=17)
    # deliver shuffled + finely partitioned so the hot conv spans many blocks
    perm_ds = ray.data.from_arrow(table).random_shuffle(seed=3).repartition(32)
    dup = duplicate_keys(perm_ds).to_pandas()
    assert set(zip(dup.conv_id, dup.turn_idx)) == expected["duplicate_key"]
    gaps = turn_gaps(perm_ds).to_pandas()
    assert set(gaps.conv_id) == expected["turn_gap"]
    hot = gaps[gaps.conv_id == "s00000200"]
    if len(hot):  # hot conv only flagged if a plant landed in it
        assert hot.n.iloc[0] >= 50_000


def test_salted_conversation_stats_equivalent():
    """Salting on vs off must produce identical per-conversation stats,
    including for the hot conversation (SURVEY.md §7.4 skew equivalence)."""
    from doc_quality_check_ray.stages.keys import (
        conversation_stats,
        conversation_stats_salted,
    )

    plant = PlantSpec(dup_rows=6, gap_convs=3, hot_conv_turns=30_000)
    table, _ = synth_transcripts(n_convs=150, plant=plant, seed=23)
    ds = ray.data.from_arrow(table).random_shuffle(seed=1).repartition(16)
    plain = conversation_stats(ds).to_pandas().sort_values("conv_id", ignore_index=True)
    salted = (
        conversation_stats_salted(ds).to_pandas().sort_values("conv_id", ignore_index=True)
    )
    cols = ["conv_id", "n", "n_distinct", "min_idx", "max_idx"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        plain[cols].astype({"n": "int64", "n_distinct": "int64"}),
        salted[cols].astype({"n": "int64", "n_distinct": "int64"}),
        check_dtype=False,
    )
    hot = plain[plain.conv_id == "s00000150"]
    assert len(hot) == 1 and hot.n.iloc[0] >= 30_000


def test_determinism():
    t1, e1 = synth_transcripts(n_convs=30, plant=DEFAULT_PLANT, seed=5)
    t2, e2 = synth_transcripts(n_convs=30, plant=DEFAULT_PLANT, seed=5)
    assert t1.equals(t2) and e1 == e2
