"""Key-level checks: uniqueness of ``(conv_id, turn_idx)`` and per-conversation
``turn_idx`` contiguity.

Reference analogs: geometric IoU near-dup suppression
(``modules/document_segmentation.py:143-228``) → exact duplicate-key detection;
pairwise per-page group repair (``modules/identity_detection.py:189-259``) →
per-conversation contiguity (SURVEY.md §7.1).

Scale design (the part that matters at 10^12 turns):

- ``text`` is projected away before any shuffle — only the two key columns
  move (SURVEY.md §7.4 "wide text rows").
- A **per-batch combiner** (Arrow ``group_by`` inside ``map_batches``) collapses
  each batch to one partial row per distinct key before the all-to-all
  exchange, so the global ``groupby`` shuffles ≤ distinct-keys-per-batch rows,
  not raw turns. A key duplicated a million times inside hot blocks reduces to
  per-block counts — this *is* the skew salting for uniqueness: the natural
  block partitioning acts as the salt, and the global groupby merges partials.
- Contiguity is computed from **order-free mergeable partials**
  ``(n, n_distinct, min_idx, max_idx)`` — no sort-within-group, no
  materialization of a whole conversation in one task, so a hot conv_id with
  100M turns cannot OOM a worker (SURVEY.md §4.2 "skew").

Contiguity rule: a conversation passes iff its distinct turn indices are
exactly ``0..d-1`` **and** it has no duplicate keys::

    violated  ⟺  NOT (min_idx = 0  AND  max_idx = d - 1  AND  n = d)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import DEFAULT_CONFIG, ValidationConfig
from ..schema import VIOLATION_SCHEMA
from .exchange import hash_bucket_aggregate

CHECK_DUP = "duplicate_key"
CHECK_GAP = "turn_gap"


def _partial_key_counts(t: pa.Table) -> pa.Table:
    """Combiner: batch → one row per distinct (conv_id, turn_idx) with count."""
    out = t.select(["conv_id", "turn_idx"]).group_by(["conv_id", "turn_idx"]).aggregate(
        [([], "count_all")]
    )
    return out.rename_columns(["conv_id", "turn_idx", "cnt"])


def key_counts(ds: ray.data.Dataset, cfg: ValidationConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Dataset → one row per distinct key: (conv_id, turn_idx, cnt).

    partial-per-batch → hash-shuffle on the fine-grained key → sum merge.
    """
    partials = ds.map_batches(
        _partial_key_counts,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
    return hash_bucket_aggregate(
        partials, ["conv_id", "turn_idx"], {"cnt": ("cnt", "sum")}
    )


def duplicate_keys(
    ds: ray.data.Dataset, cfg: ValidationConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Duplicate-key table: (conv_id, turn_idx, n_dups=cnt) for cnt > 1."""

    def keep_dups(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.greater(t["cnt"], 1))
        return pa.table(
            {
                "conv_id": hit["conv_id"],
                "turn_idx": hit["turn_idx"],
                "n_dups": pc.cast(hit["cnt"], pa.int64()),
            }
        )

    return key_counts(ds, cfg).map_batches(keep_dups, batch_format="pyarrow")


def conversation_stats(
    ds: ray.data.Dataset, cfg: ValidationConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Per-conversation order-free stats: (conv_id, n, n_distinct, min_idx, max_idx).

    Two-stage: the distinct-key table from :func:`key_counts` is re-combined
    per batch per conv_id, then a coarse ``groupby(conv_id)`` merges partials.
    All four stats are mergeable, so no conversation is ever held whole.
    """

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("conv_id").aggregate(
            [("cnt", "sum"), ([], "count_all"), ("turn_idx", "min"), ("turn_idx", "max")]
        )
        return g.rename_columns(["conv_id", "n", "n_distinct", "min_idx", "max_idx"])

    partials = key_counts(ds, cfg).map_batches(
        partial, batch_format="pyarrow", batch_size=cfg.batch_size
    )
    return hash_bucket_aggregate(
        partials,
        ["conv_id"],
        {
            "n": ("n", "sum"),
            "n_distinct": ("n_distinct", "sum"),
            "min_idx": ("min_idx", "min"),
            "max_idx": ("max_idx", "max"),
        },
    )


def conversation_stats_salted(
    ds: ray.data.Dataset, cfg: ValidationConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Explicit skew-salted variant of :func:`conversation_stats`.

    Two-level tree merge: partials are first combined per
    ``(conv_id, salt = turn_idx % cfg.skew_salt)`` — so a hot conversation's
    partial rows are reduced by ``skew_salt`` independent reducers — then the
    ≤ ``skew_salt`` pre-merged rows per conversation collapse in a second,
    tiny exchange. Output is identical to :func:`conversation_stats`
    (equivalence-tested on the big-skew fixture); use this path when single
    conversations are large enough that their per-batch partials would
    overwhelm one reducer (cfg.hot_conv_turns guidance).
    """

    def partial(t: pa.Table) -> pa.Table:
        salt = pc.subtract(
            t["turn_idx"],
            pc.multiply(
                pc.divide(t["turn_idx"], cfg.skew_salt), cfg.skew_salt
            ),
        )
        g = (
            t.append_column("salt", pc.cast(salt, pa.int32()))
            .group_by(["conv_id", "salt"])
            .aggregate(
                [("cnt", "sum"), ([], "count_all"), ("turn_idx", "min"), ("turn_idx", "max")]
            )
            .rename_columns(["conv_id", "salt", "n", "n_distinct", "min_idx", "max_idx"])
        )
        return g

    partials = key_counts(ds, cfg).map_batches(
        partial, batch_format="pyarrow", batch_size=cfg.batch_size
    )
    level1 = hash_bucket_aggregate(
        partials,
        ["conv_id", "salt"],
        {
            "n": ("n", "sum"),
            "n_distinct": ("n_distinct", "sum"),
            "min_idx": ("min_idx", "min"),
            "max_idx": ("max_idx", "max"),
        },
    )
    return hash_bucket_aggregate(
        level1,
        ["conv_id"],
        {
            "n": ("n", "sum"),
            "n_distinct": ("n_distinct", "sum"),
            "min_idx": ("min_idx", "min"),
            "max_idx": ("max_idx", "max"),
        },
    )


def key_finding_violations(
    ds: ray.data.Dataset,
    cfg: ValidationConfig = DEFAULT_CONFIG,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """BOTH key-level finding families (duplicate_key + turn_gap) in
    violation-row format from ONE derivation and ONE conv-keyed exchange —
    the query-path twin of ``run.py``'s phase-2 ``bucket_findings``.

    The per-batch (conv, turn) combiner bounds shuffle volume; bucketing on
    conv_id puts each conversation whole into one reduce task so duplicates
    and contiguity fall out of a single local merge. Assumption: one
    conversation's distinct keys fit one task (the order-free
    :func:`conversation_stats_salted` path is the fallback for adversarial
    mega-conversations).
    """
    import numpy as np
    import pandas as pd

    partials = ds.map_batches(
        _partial_key_counts,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )

    def bucketize(t: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(t.select(["conv_id"])).hash_rows(seed=11).to_numpy()
        return t.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def findings(g: pd.DataFrame) -> pa.Table:
        # dropna=False: null keys are real groups (DuckDB GROUP BY keeps
        # them) — matches exchange.py's merge semantics
        kc = (
            g.groupby(["conv_id", "turn_idx"], sort=False, dropna=False)["cnt"]
            .sum()
            .reset_index()
        )
        dup = kc[kc["cnt"] > 1]
        conv = (
            kc.groupby("conv_id", sort=False, dropna=False)
            .agg(
                n=("cnt", "sum"),
                n_distinct=("cnt", "size"),
                min_idx=("turn_idx", "min"),
                max_idx=("turn_idx", "max"),
            )
            .reset_index()
        )
        bad = conv[
            ~(
                (conv["min_idx"] == 0)
                & (conv["max_idx"] == conv["n_distinct"] - 1)
                & (conv["n"] == conv["n_distinct"])
            )
        ]
        dup_detail = "n=" + dup["cnt"].astype(str)
        gap_detail = (
            "n=" + bad["n"].astype(str)
            + ",distinct=" + bad["n_distinct"].astype(str)
            + ",min=" + bad["min_idx"].astype(str)
            + ",max=" + bad["max_idx"].astype(str)
        )
        nd, nb = len(dup), len(bad)
        return pa.table(
            {
                "conv_id": pa.array(
                    list(dup["conv_id"]) + list(bad["conv_id"]), pa.string()
                ),
                "turn_idx": pa.array(
                    list(dup["turn_idx"].astype("int32")) + [-1] * nb, pa.int32()
                ),
                "check_id": pa.array([CHECK_DUP] * nd + [CHECK_GAP] * nb, pa.string()),
                "detail": pa.array(list(dup_detail) + list(gap_detail), pa.string()),
            },
            schema=VIOLATION_SCHEMA,
        )

    return (
        partials.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(findings, batch_format="pandas")
    )


def turn_gaps(
    ds: ray.data.Dataset,
    cfg: ValidationConfig = DEFAULT_CONFIG,
    salted: bool = False,
) -> ray.data.Dataset:
    """Offending conversations: (conv_id, n, n_distinct, min_idx, max_idx).

    ``salted=True`` routes through :func:`conversation_stats_salted` (the
    two-level tree merge for hot conversations); output is identical."""

    def keep_gaps(t: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(
                pc.equal(t["min_idx"], 0),
                pc.equal(t["max_idx"], pc.subtract(t["n_distinct"], 1)),
            ),
            pc.equal(t["n"], t["n_distinct"]),
        )
        hit = t.filter(pc.invert(ok))
        return pa.table(
            {
                "conv_id": hit["conv_id"],
                "n": pc.cast(hit["n"], pa.int64()),
                "n_distinct": pc.cast(hit["n_distinct"], pa.int64()),
                "min_idx": pc.cast(hit["min_idx"], pa.int64()),
                "max_idx": pc.cast(hit["max_idx"], pa.int64()),
            }
        )

    stats = (conversation_stats_salted if salted else conversation_stats)(ds, cfg)
    return stats.map_batches(keep_gaps, batch_format="pyarrow")
