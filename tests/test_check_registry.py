"""The config-driven check registry: adding a check = register + config id;
disabling removes it from BOTH the engine stage and the generated oracle SQL
(the reference's zero-code config extension surface, config.json:2-57)."""

from __future__ import annotations

import dataclasses

import duckdb
import pyarrow as pa
import pytest

from doc_quality_check_ray.config import ValidationConfig
from doc_quality_check_ray.stages.row_checks import (
    ROW_CHECK_REGISTRY,
    RowCheck,
    _emit,
    register_row_check,
    row_violations_batch,
    sql_reason_case,
    sql_violation_fragments,
    verdict_batch,
)

BATCH = pa.table(
    {
        "conv_id": pa.array(["c1", "c1", "c2"], pa.string()),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "role": pa.array(["user", "assistant", "user"], pa.string()),
        "text": pa.array(["hello there", "", "SHOUTY TEXT"], pa.string()),
        "tool": pa.array([None, None, None], pa.string()),
        "ts": pa.array([None, None, None], pa.timestamp("us")),
    }
)


def test_disabling_a_check_removes_it_from_engine_and_sql():
    cfg = ValidationConfig(
        enabled_row_checks=("invalid_role", "tool_role_consistency", "low_quality_text")
    )
    out = row_violations_batch(BATCH, cfg)
    assert "empty_turn" not in set(out["check_id"].to_pylist())
    assert "empty_turn" not in "".join(sql_violation_fragments(cfg))
    # the empty row falls through to the next priority reason (none here → OK)
    v = verdict_batch(BATCH, cfg)
    assert v["reason"].to_pylist()[1] == "OK"
    assert "empty_turn" not in sql_reason_case(cfg)


@pytest.fixture
def shouting_check():
    import pyarrow.compute as pc

    def mask(t, cfg, ctx):
        up = pc.utf8_upper(pc.fill_null(t["text"], ""))
        nonblank = pc.invert(pc.equal(pc.utf8_trim_whitespace(up), ""))
        return pc.and_(pc.equal(t["text"], up), nonblank)

    chk = RowCheck(
        check_id="all_caps",
        emit=lambda t, cfg, ctx: [_emit(t, mask(t, cfg, ctx), "all_caps", "shouting")],
        verdict_mask=mask,
        sql_fragments=lambda cfg: [
            """SELECT conv_id, turn_idx, 'all_caps' AS check_id, 'shouting' AS detail
  FROM transcripts
 WHERE text = upper(text) AND trim(coalesce(text, '')) <> ''"""
        ],
        sql_predicate=lambda cfg: (
            "(text = upper(text) AND trim(coalesce(text, '')) <> '')"
        ),
    )
    register_row_check(chk)
    yield chk
    ROW_CHECK_REGISTRY.pop("all_caps")


def test_registering_a_custom_check_is_config_plus_registration(shouting_check):
    cfg = ValidationConfig(
        enabled_row_checks=ValidationConfig().enabled_row_checks + ("all_caps",)
    )
    out = row_violations_batch(BATCH, cfg).to_pylist()
    caps = [r for r in out if r["check_id"] == "all_caps"]
    assert [(r["conv_id"], r["turn_idx"]) for r in caps] == [("c2", 0)]
    # the generated oracle SQL includes the new check (engine/SQL lockstep)
    frags = sql_violation_fragments(cfg)
    assert any("all_caps" in f for f in frags)
    # verdict: not in reason_priority → ranks after the built-ins
    v = verdict_batch(BATCH, cfg).to_pylist()
    assert v[2]["reason"] == "all_caps"
    # SQL fragment agrees with the engine on a real DuckDB run
    con = duckdb.connect()
    con.register("transcripts", BATCH)
    got = con.sql([f for f in frags if "all_caps" in f][0]).df()
    assert list(got["conv_id"]) == ["c2"]


def test_unknown_enabled_check_raises():
    cfg = ValidationConfig(enabled_row_checks=("no_such_check",))
    with pytest.raises(KeyError):
        row_violations_batch(BATCH, cfg)


def test_duplicate_registration_rejected(shouting_check):
    with pytest.raises(ValueError):
        register_row_check(shouting_check)


def test_configurable_lang_banks_flow_to_engine_and_sql():
    from doc_quality_check_ray.functions.textstats import (
        detect_language,
        sql_detect_language_expr,
    )

    banks = {"xx": ("zorp", "blee"), "en": ("the", "and")}
    pri = ("en", "xx")
    text = pa.array(["zorp blee zorp", "the and the"])
    assert list(detect_language(text, banks, pri)) == ["xx", "en"]
    con = duckdb.connect()
    con.register("t", pa.table({"text": text}))
    expr = sql_detect_language_expr("text", banks, pri)
    assert [r[0] for r in con.sql(f"SELECT {expr} FROM t").fetchall()] == ["xx", "en"]


def test_from_json_deep_tuples(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(
        '{"lang_keyword_banks": [["en", ["the", "and"]], ["xx", ["zorp"]]],'
        ' "lang_priority": ["en", "xx"]}'
    )
    cfg = ValidationConfig.from_json(p)
    assert cfg.lang_keyword_banks == (("en", ("the", "and")), ("xx", ("zorp",)))


def test_artifact_check_detail_lists_matched_classes():
    """The artifact_text registry entry (get_artifact_types analog): per-row
    detail lists every matched class in bank order, identically in the Arrow
    kernel and the generated SQL fragment."""
    import pyarrow.compute as pc

    from doc_quality_check_ray.config import DEFAULT_CONFIG
    from doc_quality_check_ray.stages.row_checks import CHECK_ARTIFACT

    t = pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c2", "c2"], pa.string()),
            "turn_idx": pa.array([0, 1, 0, 1], pa.int32()),
            "role": pa.array(["user"] * 4, pa.string()),
            "text": pa.array(
                [
                    "??????? ???? ######## @@@@",
                    "clean text",
                    "see https://example.com now",
                    None,
                ],
                pa.string(),
            ),
            "tool": pa.array([None] * 4, pa.string()),
            "ts": pa.array([None] * 4, pa.timestamp("us")),
        }
    )
    chk = ROW_CHECK_REGISTRY[CHECK_ARTIFACT]
    out = pa.concat_tables(chk.emit(t, DEFAULT_CONFIG, {}))
    got = {
        (r["conv_id"], r["turn_idx"]): r["detail"] for r in out.to_pylist()
    }
    assert got == {
        ("c1", 0): "classes=question_runs,hash_runs,at_runs",
        ("c2", 0): "classes=url",
    }
    # SQL twin produces the identical rows
    con = duckdb.connect()
    con.register("transcripts", t)
    frag = chk.sql_fragments(DEFAULT_CONFIG)[0]
    rows = con.sql(frag).fetchall()
    assert {(r[0], r[1]): r[3] for r in rows} == got
