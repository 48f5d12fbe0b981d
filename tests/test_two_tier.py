"""Two-tier scoring: the expensive path must run on exactly the
below-cutoff subset, and keep-best semantics must hold."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from doc_quality_check_ray.stages.two_tier import two_tier_batch


def _mk_batch():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["a", "bb", "ccc", "dddd", "eeeee"]),
        }
    )


def test_expensive_sees_only_below_cutoff_rows():
    seen: list[int] = []
    cheap_vals = np.array([0.9, 0.2, 0.5, 0.95, 0.1])

    def cheap(text):
        return cheap_vals[: len(text)]

    def expensive(text):
        seen.append(len(text))
        return np.full(len(text), 0.42)

    out = two_tier_batch(_mk_batch(), cheap, expensive, cutoff=0.6)
    # expensive was invoked once, on exactly the 3 below-cutoff rows
    assert seen == [3]
    assert out["rescored"].to_pylist() == [False, True, True, False, True]
    # keep-best: max(cheap, expensive) on rescored rows, cheap elsewhere
    assert out["final_score"].to_pylist() == [0.9, 0.42, 0.5, 0.95, 0.42]
    assert out["cheap_score"].to_pylist() == [0.9, 0.2, 0.5, 0.95, 0.1]


def test_no_rescore_when_all_above_cutoff():
    def cheap(text):
        return np.full(len(text), 0.99)

    def expensive(text):  # pragma: no cover - must never run
        raise AssertionError("expensive path ran on an above-cutoff batch")

    out = two_tier_batch(_mk_batch(), cheap, expensive, cutoff=0.5)
    assert not any(out["rescored"].to_pylist())
    assert out["final_score"].to_pylist() == out["cheap_score"].to_pylist()
