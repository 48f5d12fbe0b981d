"""Adaptive two-tier scoring — cheap score for every row, expensive rescore
only for the below-cutoff subset, keep the best of the two attempts.

Reference analog: balanced-mode OCR confidence computes a cheap full-page
score, early-exits when it clears a threshold, and only otherwise runs the
expensive enhancement + re-OCR retry, keeping the best of both attempts
(``checks/confidence_check.py:369-415``); the same shape appears as the
adaptive OCR retry for short segments (``modules/document_segmentation.py:
544-548``). SURVEY.md §2.3 M2c.

Pipeline shape: ONE streaming ``map_batches`` pass; inside each batch the
expensive function is invoked on the below-cutoff row *slice only* (Arrow
filter → compute → numpy scatter-back). The expensive path's row volume is
therefore exactly the below-cutoff count — the per-row-branch equivalent of
``filter → rescore → union`` without a second input scan or a union shuffle,
which is what survives at 100 TB (the two-filter form re-reads the corpus
once per branch).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.rounding import round_half_away

ScoreFn = Callable[[pa.ChunkedArray | pa.Array], np.ndarray]


def two_tier_batch(
    t: pa.Table,
    cheap_fn: ScoreFn,
    expensive_fn: ScoreFn,
    cutoff: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Score one batch; ``expensive_fn`` sees ONLY the below-cutoff slice."""
    cheap = np.asarray(cheap_fn(t[text_col]), dtype=np.float64)
    mask = cheap < cutoff
    final = cheap.copy()
    if mask.any():
        sub = t.filter(pa.array(mask))
        exp = np.asarray(expensive_fn(sub[text_col]), dtype=np.float64)
        final[mask] = np.maximum(cheap[mask], exp)  # keep best attempt
    return pa.table(
        {
            id_col: t[id_col],
            "cheap_score": pa.array(round_half_away(cheap, 6), pa.float64()),
            "final_score": pa.array(round_half_away(final, 6), pa.float64()),
            "rescored": pa.array(mask),
        }
    )


def two_tier_scores(
    ds: ray.data.Dataset,
    cheap_fn: ScoreFn,
    expensive_fn: ScoreFn,
    cutoff: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: two_tier_batch(t, cheap_fn, expensive_fn, cutoff, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
