"""Engine configuration — the analog of the reference's ``config.json`` +
``modules/config_loader.py`` singleton.

The reference loads one JSON config as a process-global singleton
(``config_loader.py:13-19,308-314``) with dot-path access (``:247-267``).
The engine replaces the singleton with a frozen dataclass constructed on the
driver and *passed into* task closures / actor constructors — it ships through
the Ray object store once per worker, giving the same "load once, read
everywhere" semantics without mutable process-global state (SURVEY.md §2.9 T2).

All thresholds live here, none hardcoded in stages — mirroring the reference's
"all thresholds/weights in config" extension surface (``config.json:58-101``).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path


@dataclasses.dataclass(frozen=True)
class ValidationConfig:
    """Thresholds and domains for the validation pipeline.

    Reference analogs:
      - ``emptiness_threshold`` slider (``app.py:243``, M13) → empty-turn check.
      - ``readability_threshold`` (``app.py:358-362``, M14) → ``quality_ratio_threshold``.
      - Enum domains ``DocumentType``/``DocumentSide``
        (``modules/identity_detection.py:22-35``) → ``valid_roles``.
    """

    # Row checks -----------------------------------------------------------
    #: enabled row checks, by registry id (stages/row_checks.py
    #: ROW_CHECK_REGISTRY). Adding a check = register_row_check(...) + its id
    #: here — engine stage and SQL oracle both derive from the registry
    #: (the reference's zero-code config extension surface, config.json:2-57).
    enabled_row_checks: tuple[str, ...] = (
        "empty_turn",
        "invalid_role",
        "tool_role_consistency",
        "low_quality_text",
    )
    valid_roles: tuple[str, ...] = ("user", "assistant", "tool")
    #: fraction of [0-9A-Za-z space] chars below which non-empty text is
    #: flagged ``low_quality_text`` (readability analog, M2/M14).
    quality_ratio_threshold: float = 0.5
    #: priority order for the single per-row ``reason`` — the reference checks
    #: empty before unreadable (``app.py:369-380``).
    reason_priority: tuple[str, ...] = (
        "empty_turn",
        "invalid_role",
        "tool_role_consistency",
        "low_quality_text",
    )

    #: artifact classes for the ``artifact_text`` row check:
    #: ((class_name, RE2 pattern), ...) — the reference's artifact banks
    #: (``checks/confidence_check.py:18-24``, ``utils/text_filter.py:18-57``)
    #: plus its ``?{4,}`` junk-run class (``utils/text_cleaner.py:35-36``);
    #: per-row detail lists every matched class, the
    #: ``get_artifact_types`` analog (``utils/text_filter.py:154-191``).
    #: Patterns must be valid RE2 in BOTH Arrow and DuckDB (both use RE2).
    artifact_patterns: tuple[tuple[str, str], ...] = (
        ("question_runs", r"\?{4,}"),
        ("hash_runs", r"#{4,}"),
        ("at_runs", r"@{4,}"),
        ("url", r"https?://"),
        ("win_path", r"[A-Za-z]:\\"),
    )

    # Partitioning ---------------------------------------------------------
    #: number of logical partitions for per-partition verdicts / resumable
    #: output layout. Partition id = numeric_conv_id % n_partitions so the
    #: oracle can recompute it (at cluster scale this is a hash of conv_id).
    n_partitions: int = 32
    #: salt fan-out for skew-aware per-conversation aggregation (hot conv_ids).
    skew_salt: int = 16
    #: conversations with more than this many turns take the salted
    #: two-stage aggregation path.
    hot_conv_turns: int = 100_000

    # Column-stats gates ---------------------------------------------------
    #: corpus-level pass/fail bounds on column statistics (None = ungated);
    #: the distributed analog of the reference's threshold gates applied to
    #: aggregate stats rather than single pages.
    max_null_text_rate: float | None = 0.05
    max_null_role_rate: float | None = 0.01
    max_null_ts_rate: float | None = 0.0
    max_text_len: int | None = 1_000_000  # guard against pathological rows

    # Language ID ----------------------------------------------------------
    #: per-language function-word banks for the keyword-argmax language
    #: detector (the reference's per-language keyword lists live in
    #: config.json, ``modules/config_loader.py:54-245`` — adding a language
    #: is a config change). ((lang, (words...)), ...); priority breaks ties.
    lang_keyword_banks: tuple[tuple[str, tuple[str, ...]], ...] = (
        ("en", ("the", "and", "of", "to", "a", "in", "is", "that", "for", "with")),
        ("de", ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu")),
        ("es", ("el", "la", "de", "que", "y", "los", "una", "por", "con", "para")),
        ("fr", ("le", "la", "et", "les", "des", "une", "est", "pour", "dans", "que")),
    )
    lang_priority: tuple[str, ...] = ("en", "de", "es", "fr")

    # Stats / drift --------------------------------------------------------
    #: number of buckets for text-length histograms used by the drift check.
    length_hist_buckets: tuple[int, ...] = (0, 16, 64, 128, 256, 512, 1024, 4096)
    #: PSI above which a drift violation is raised (common industry rule of
    #: thumb: 0.1 moderate, 0.25 major shift).
    psi_threshold: float = 0.25
    #: t-digest compression (max centroids) for quantile sketches.
    tdigest_compression: int = 200

    # Execution ------------------------------------------------------------
    batch_size: int = 65_536
    drift_actor_pool: int = 2
    #: shards processed per phase-1 execution: one Ray Data execution spans a
    #: group of input files so the whole cluster parallelizes across them
    #: (resume granularity stays per-shard; a killed group redoes only its
    #: own shards).
    shard_group_size: int = 8
    #: emit per-turn fingerprints of the *normalized* text (kind='f' partials)
    #: so two runs can verify the north-rule per-turn text-equality invariant
    #: keyed on (conv_id, turn_idx) without re-reading either corpus.
    emit_text_fingerprints: bool = True

    @staticmethod
    def from_json(path: str | Path) -> "ValidationConfig":
        raw = json.loads(Path(path).read_text())
        known = {f.name for f in dataclasses.fields(ValidationConfig)}
        def tupled(v):
            return tuple(tupled(x) for x in v) if isinstance(v, list) else v

        kwargs = {}
        for k, v in raw.items():
            if k not in known:
                raise KeyError(f"unknown config key: {k}")
            kwargs[k] = tupled(v)
        return ValidationConfig(**kwargs)


DEFAULT_CONFIG = ValidationConfig()
