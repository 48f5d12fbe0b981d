"""North-rule invariant: per-turn text equality between two runs, verified
from fingerprint partials under (conv_id, turn_idx) keying."""

from __future__ import annotations

import pyarrow.parquet as pq

from doc_quality_check_ray.config import ValidationConfig
from doc_quality_check_ray.pipelines.run import run_validation, verify_text_equality
from doc_quality_check_ray.synth import DEFAULT_PLANT, write_transcripts_parquet

CFG = ValidationConfig(batch_size=4096, shard_group_size=2)


def _corpus(d, seed=21, mutate=None):
    write_transcripts_parquet(
        str(d), n_convs=120, turns_per_conv=8, seed=seed,
        plant=DEFAULT_PLANT, convs_per_file=60,
    )
    if mutate:
        f = sorted(d.glob("*.parquet"))[0]
        t = pq.read_table(f)
        texts = t["text"].to_pylist()
        texts[mutate] = (texts[mutate] or "") + " EXTRA TAMPERED WORDS"
        import pyarrow as pa

        t = t.set_column(
            t.schema.get_field_index("text"), "text", pa.array(texts, pa.string())
        )
        pq.write_table(t, f, row_group_size=32 * 1024)
        return t["conv_id"][mutate].as_py(), t["turn_idx"][mutate].as_py()
    return None


def test_identical_runs_are_equal(tmp_path):
    ca, cb = tmp_path / "ca", tmp_path / "cb"
    _corpus(ca)
    _corpus(cb)
    run_validation(str(ca), str(tmp_path / "oa"), CFG)
    run_validation(str(cb), str(tmp_path / "ob"), CFG)
    res = verify_text_equality(str(tmp_path / "oa"), str(tmp_path / "ob"), CFG)
    assert res["equal"] is True and res["n_mismatched_keys"] == 0


def test_single_tampered_turn_detected(tmp_path):
    ca, cb = tmp_path / "ca", tmp_path / "cb"
    _corpus(ca)
    _corpus(cb)
    key = _corpus(cb, mutate=77)  # rewrite one turn's text in corpus b
    run_validation(str(ca), str(tmp_path / "oa"), CFG)
    run_validation(str(cb), str(tmp_path / "ob"), CFG)
    res = verify_text_equality(str(tmp_path / "oa"), str(tmp_path / "ob"), CFG)
    assert res["equal"] is False
    assert res["n_mismatched_keys"] == 1
    assert tuple(res["sample"][0]) == key


def test_normalization_invariance(tmp_path):
    """Whitespace-only differences (collapsed by the M8 normalizer) must NOT
    flag inequality — equality is defined on canonical text."""
    import pyarrow as pa

    ca, cb = tmp_path / "ca", tmp_path / "cb"
    _corpus(ca)
    _corpus(cb)
    f = sorted(cb.glob("*.parquet"))[0]
    t = pq.read_table(f)
    texts = t["text"].to_pylist()
    texts[5] = "  " + (texts[5] or "").replace(" ", "  ") + "   "
    t = t.set_column(
        t.schema.get_field_index("text"), "text", pa.array(texts, pa.string())
    )
    pq.write_table(t, f, row_group_size=32 * 1024)
    run_validation(str(ca), str(tmp_path / "oa"), CFG)
    run_validation(str(cb), str(tmp_path / "ob"), CFG)
    res = verify_text_equality(str(tmp_path / "oa"), str(tmp_path / "ob"), CFG)
    assert res["equal"] is True
