"""Per-row text quality scoring — the transcript analog of the reference's
OCR-confidence readability metric.

The reference scores a page by the fraction of OCR boxes whose content is
valid vs junk (``checks/confidence_check.py:27-109``), filters artifact-like
content with a regex bank before scoring (``:112-175``, ``utils/text_filter.py``),
and gates ``ocr_conf >= readability_threshold`` (``app.py:358-362``).

For transcripts the equivalent per-row signal is the **valid-character ratio**:
the fraction of ``[0-9A-Za-z space]`` characters in ``text``. Garbage turns
(replacement-char runs, symbol noise — the ``unclear-pdfs/`` analog) score near
0; normal prose scores near 1. The ratio is computed with two vectorized Arrow
kernels per batch and is exactly reproducible in ANSI SQL (oracle parity).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: RE2 class of characters that count as "valid" content.
VALID_CHAR_RE2 = r"[^0-9A-Za-z ]"


def valid_char_ratio(text: pa.Array | pa.ChunkedArray):
    """Fraction of valid chars per row ∈ [0,1]; null for null/empty text.

    Counts invalid code points with ``count_substring_regex`` instead of
    materializing a replaced copy of the column — same values (single-char
    class, one match per code point), ~25% less wall and no string
    allocation (the copy was pure memory-bandwidth pressure in the fused
    scan's hottest kernel).
    """
    total = pc.utf8_length(text)
    bad = pc.count_substring_regex(text, pattern=VALID_CHAR_RE2)
    kept = pc.subtract(total, bad)
    return pc.divide(
        pc.cast(kept, pa.float64()),
        pc.if_else(pc.equal(total, 0), pa.scalar(None, pa.int32()), total),
    )


def sql_valid_char_ratio_expr(col: str) -> str:
    """DuckDB expression computing the identical ratio (NULL on empty/null)."""
    kept = f"length(regexp_replace({col}, '{VALID_CHAR_RE2}', '', 'g'))"
    return f"(CAST({kept} AS DOUBLE) / nullif(length({col}), 0))"
