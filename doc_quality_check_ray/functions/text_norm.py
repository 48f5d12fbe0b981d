"""Canonical text normalizer — the engine's analog of the reference's
``clean_text`` (``utils/text_cleaner.py:8-51``).

Reference semantics re-expressed (NOT copied): strip null bytes (``:28``),
control / unicode-replacement chars (``:32``), long ``?``/``•`` runs
(``:35-36``), collapse spaces/tabs (``:39-41``), strip each line and drop empty
lines (``:44-49``).

The normalizer exists in three exactly-equivalent forms, pinned against each
other by tests:

- :func:`normalize_text_arrow` — vectorized ``pyarrow.compute`` RE2 chain, the
  hot-path form used inside ``map_batches`` (zero Python per row);
- :func:`sql_normalize_expr` — a DuckDB SQL expression (DuckDB's regex engine
  is also RE2, so the patterns are shared verbatim) for the oracle;
- :func:`normalize_text_py` — a pure-Python scalar form for unit-test oracles.

This function is the per-row canonicalization applied before the north-rule
**per-turn text-equality invariant** (SURVEY.md §2.3 M8).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

#: (RE2 pattern, replacement) applied in order. RE2 syntax is shared by
#: pyarrow.compute and DuckDB. ``\x{FFFD}`` = unicode replacement char.
NORM_STEPS_RE2: tuple[tuple[str, str], ...] = (
    (r"\x00", ""),  # null bytes
    (r"[\x01-\x08\x0b\x0c\x0e-\x1f\x7f]|\x{FFFD}", ""),  # control + replacement chars
    (r"\?{4,}", ""),  # long ? runs
    (r"\x{2022}{4,}", ""),  # long bullet runs
    (r"[ \t]+", " "),  # collapse horizontal whitespace
    (r" *\n *", "\n"),  # strip spaces around line breaks
    (r"\n+", "\n"),  # drop empty lines
)

#: Python ``re`` equivalents (``\x{...}`` → ``\u...``), for the pure oracle.
_NORM_STEPS_PY = tuple(
    (re.compile(p.replace(r"\x{FFFD}", "�").replace(r"\x{2022}", "•")), r)
    for p, r in NORM_STEPS_RE2
)

_EDGE_CHARS = " \n"

#: one-scan "needs the chain" detector: matches iff ANY of steps 1-7 could
#: change the string. Unflagged strings are fixed points of the whole chain
#: (single spaces survive ``[ \t]+→' '``; every other step needs a char this
#: pattern matches), so they only need the final trim. Keeps the hot path at
#: one regex pass instead of seven; the chain runs on the dirty subset only.
_NEEDS_NORM_RE2 = r"[\x00-\x1f\x7f]|\x{FFFD}|\?{4,}|\x{2022}{4,}| {2}"


def _full_chain(col):
    out = col
    for pat, rep in NORM_STEPS_RE2:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=rep)
    return out


def normalize_text_arrow(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized normalizer over an Arrow string column (nulls pass through)."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flagged = pc.fill_null(pc.match_substring_regex(col, _NEEDS_NORM_RE2), False)
    n_dirty = pc.sum(pc.cast(flagged, pa.int64())).as_py() or 0
    if n_dirty == 0:
        return pc.utf8_trim(col, characters=_EDGE_CHARS)
    if n_dirty >= len(col) // 4:  # mostly dirty: chain everything
        return pc.utf8_trim(_full_chain(col), characters=_EDGE_CHARS)
    # sparse dirty rows: chain only the flagged subset, scatter back
    arr = col.to_numpy(zero_copy_only=False)
    mask = flagged.to_numpy(zero_copy_only=False)
    idx = np.nonzero(mask)[0]
    cleaned = _full_chain(pa.array(arr[idx], pa.string())).to_numpy(
        zero_copy_only=False
    )
    arr = arr.copy()
    arr[idx] = cleaned
    return pc.utf8_trim(pa.array(arr, pa.string()), characters=_EDGE_CHARS)


def sql_normalize_expr(col: str) -> str:
    """DuckDB SQL expression computing the identical normalization of ``col``."""
    expr = col
    for pat, rep in NORM_STEPS_RE2:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return f"trim({expr}, ' ' || chr(10))"


def normalize_text_py(text: str | None) -> str | None:
    """Pure-Python scalar normalizer (test oracle only — never in the hot path)."""
    if text is None:
        return None
    for pat, rep in _NORM_STEPS_PY:
        text = pat.sub(rep, text)
    return text.strip(_EDGE_CHARS)
