"""Vectorized text analysis over document tables — language ID, quality
scoring, token stats, fingerprinting.

Reference analogs: language detection by per-language keyword hit counts with
argmax (``utils/document_processor.py:39-89``, M12), banded composite quality
scoring (``modules/identity_detection.py:652-698``, C5), keyword membership
counting (``:526-533``, C2).

Every function here is Arrow-kernel vectorized (token explosion via list
offsets + ``np.bincount``, no Python per row) and has an exactly-equivalent
DuckDB SQL expression for the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .rounding import round_half_away

TOKEN_SPLIT_RE2 = r"\s+"

#: tiny per-language function-word banks (public knowledge, not from the
#: reference's config) — the M12-style n-gram/keyword heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "with"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"),
    "es": ("el", "la", "de", "que", "y", "los", "una", "por", "con", "para"),
    "fr": ("le", "la", "et", "les", "des", "une", "est", "pour", "dans", "que"),
}
#: tie-break / fallback priority, mirroring the reference's default-to-primary
#: behavior (``document_processor.py:83-89``).
LANG_PRIORITY = ("en", "de", "es", "fr")

EN_STOPWORDS = LANG_STOPWORDS["en"]


def _tokens(text: pa.ChunkedArray | pa.Array):
    """Lowercased whitespace tokens as a ListArray + flat parent indices."""
    toks = pc.split_pattern_regex(pc.utf8_lower(pc.fill_null(text, "")), TOKEN_SPLIT_RE2)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    return toks, flat, parents


def token_counts(text, n_rows: int) -> np.ndarray:
    """Whitespace token count per row (0 for null/blank)."""
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(text, ""))
    toks = pc.split_pattern_regex(trimmed, TOKEN_SPLIT_RE2)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    blank = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    return np.where(blank, 0, counts).astype(np.int64)


def sql_token_count_expr(col: str) -> str:
    return (
        f"CASE WHEN trim({col}) = '' OR {col} IS NULL THEN 0 "
        f"ELSE len(string_split_regex(trim({col}), '{TOKEN_SPLIT_RE2}')) END"
    )


def stopword_counts(text, n_rows: int, stopwords=EN_STOPWORDS) -> np.ndarray:
    """Per-row count of tokens in ``stopwords`` (vectorized explode+bincount)."""
    _, flat, parents = _tokens(text)
    hit = pc.is_in(flat, value_set=pa.array(stopwords))
    hits = hit.to_numpy(zero_copy_only=False)
    par = parents.to_numpy(zero_copy_only=False)
    if len(par) == 0:
        return np.zeros(n_rows, dtype=np.int64)
    return np.bincount(par[hits], minlength=n_rows).astype(np.int64)


def sql_stopword_count_expr(col: str, stopwords=EN_STOPWORDS) -> str:
    inlist = ", ".join(f"'{w}'" for w in stopwords)
    return (
        f"len(list_filter(string_split_regex(lower(coalesce({col}, '')), "
        f"'{TOKEN_SPLIT_RE2}'), x -> x IN ({inlist})))"
    )


def alpha_ratio(text):
    """Fraction of [A-Za-z] characters; null for null/empty text.
    (count_substring_regex: counts non-alpha code points without building a
    replaced string copy — same values, less memory traffic.)"""
    total = pc.utf8_length(text)
    bad = pc.count_substring_regex(text, pattern=r"[^A-Za-z]")
    kept = pc.subtract(total, bad)
    return pc.divide(
        pc.cast(kept, pa.float64()),
        pc.if_else(pc.equal(total, 0), pa.scalar(None, pa.int32()), total),
    )


def sql_alpha_ratio_expr(col: str) -> str:
    return (
        f"(CAST(length(regexp_replace({col}, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
        f" / nullif(length({col}), 0))"
    )


def quality_scores(text) -> np.ndarray:
    """Banded composite quality score ∈ [0,1] — the C5 scoring-ladder analog
    (``identity_detection.py:652-698``): alpha-ratio base + in-band bonuses
    for stopword density and length."""
    n = len(text)
    ar = pc.fill_null(alpha_ratio(text), 0.0).to_numpy(zero_copy_only=False)
    ntok = token_counts(text, n)
    nstop = stopword_counts(text, n)
    with np.errstate(divide="ignore", invalid="ignore"):
        stop_ratio = np.where(ntok > 0, nstop / np.maximum(ntok, 1), 0.0)
    nchars = pc.fill_null(pc.utf8_length(text), 0).to_numpy(zero_copy_only=False)
    stop_band = ((stop_ratio >= 0.05) & (stop_ratio <= 0.6)).astype(np.float64)
    len_band = ((nchars >= 50) & (nchars <= 2000)).astype(np.float64)
    return round_half_away(0.5 * ar + 0.3 * stop_band + 0.2 * len_band, 6)


def sql_quality_score_expr(col: str) -> str:
    ar = f"coalesce({sql_alpha_ratio_expr(col)}, 0.0)"
    ntok = sql_token_count_expr(col)
    nstop = sql_stopword_count_expr(col)
    stop_ratio = f"(CASE WHEN {ntok} > 0 THEN CAST({nstop} AS DOUBLE) / {ntok} ELSE 0.0 END)"
    stop_band = f"(CASE WHEN {stop_ratio} >= 0.05 AND {stop_ratio} <= 0.6 THEN 1.0 ELSE 0.0 END)"
    len_band = (
        f"(CASE WHEN length(coalesce({col}, '')) BETWEEN 50 AND 2000 THEN 1.0 ELSE 0.0 END)"
    )
    return f"round(0.5 * {ar} + 0.3 * {stop_band} + 0.2 * {len_band}, 6)"


def detect_language(text, banks=None, priority=None) -> np.ndarray:
    """Argmax of per-language function-word hits; ties fall to priority
    order (strictly-greater comparison, like the reference's argmax-with-
    default, ``document_processor.py:70-89``).

    ``banks``/``priority`` default to the module banks but are normally the
    CONFIG's (the reference loads its per-language keyword lists from
    ``config.json``, ``modules/config_loader.py:54-245`` — adding a language
    is a config change, not a code change)."""
    banks = dict(banks) if banks is not None else LANG_STOPWORDS
    priority = tuple(priority) if priority is not None else LANG_PRIORITY
    n = len(text)
    counts = {lang: stopword_counts(text, n, tuple(banks[lang])) for lang in priority}
    best = np.full(n, priority[0], dtype=object)
    best_n = counts[priority[0]].copy()
    for lang in priority[1:]:
        m = counts[lang] > best_n
        best[m] = lang
        best_n = np.maximum(best_n, counts[lang])
    return best


def sql_detect_language_expr(col: str, banks=None, priority=None) -> str:
    banks = dict(banks) if banks is not None else LANG_STOPWORDS
    priority = tuple(priority) if priority is not None else LANG_PRIORITY
    c = {lang: sql_stopword_count_expr(col, tuple(banks[lang])) for lang in priority}
    # same strictly-greater fold as detect_language
    expr = f"'{priority[0]}'"
    best = c[priority[0]]
    for lang in priority[1:]:
        expr = f"CASE WHEN {c[lang]} > {best} THEN '{lang}' ELSE {expr} END"
        best = f"greatest({best}, {c[lang]})"
    return expr
