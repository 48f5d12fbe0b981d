"""Multimodal decode plumbing: null-payload propagation and actor contract."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from doc_quality_check_ray.stages.multimodal import (
    FakeImageCodec,
    attach_fake_payloads,
    decode_stage,
)


def test_null_payload_propagates_null_dims():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([b"hello world", None], pa.binary()),
            "media_type": pa.array(["image/fake"] * 2, pa.string()),
        }
    )
    out = FakeImageCodec()(t).to_pylist()
    assert out[0]["n_bytes"] == 11 and out[0]["width"] is not None
    assert out[1]["n_bytes"] is None
    assert out[1]["width"] is None and out[1]["height"] is None


def test_decode_stage_null_text_end_to_end():
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["abc", None, "defgh"], pa.string()),
        }
    )
    out = (
        decode_stage(attach_fake_payloads(ray.data.from_arrow(docs)))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["n_bytes"].tolist()[0] == 3
    assert out["n_bytes"].isna().tolist() == [False, True, False]
