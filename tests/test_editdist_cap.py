"""The edit-distance verifier's equal-prefix run cap must fire (with a
logged warning) on a degenerate blocking key instead of materializing
S^2/2 candidate pairs — the tested-fallback convention (cf. the simhash
distributed-branch test)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def test_run_cap_truncates_degenerate_prefix(tmp_path, sf_dir):
    from doc_quality_check_ray.pipelines.documents import (
        EDIT_RUN_CAP,
        q_edit_distance_pairs,
    )

    # 600 docs sharing the full 24-char prefix (> EDIT_RUN_CAP), all within
    # the length band and within distance k of each other
    n = EDIT_RUN_CAP + 88
    base = "the same twenty-four ch"  # 23 chars; suffix keeps prefix equal
    docs = pa.table(
        {
            "doc_id": pa.array(range(1, n + 1), pa.int64()),  # avoid %31 plants
            "text": pa.array([f"{base}x tail {i:03d}" for i in range(n)]),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([len(f"{base}x tail {i:03d}") for i in range(n)], pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")

    out = q_edit_distance_pairs(str(tmp_path)).to_pandas()

    capped = EDIT_RUN_CAP * (EDIT_RUN_CAP - 1) // 2
    uncapped = n * (n - 1) // 2
    # every within-cap pair is within distance k (only the 3-digit tail
    # differs), so the output size reveals whether truncation happened
    # the warning itself is emitted inside the Ray worker process (not
    # capturable here); the pair count is the truncation's observable proof
    assert len(out) == capped
    assert len(out) < uncapped
