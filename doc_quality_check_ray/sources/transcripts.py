"""Transcript-table sources.

The engine's native input is a Parquet table with schema
``(conv_id, turn_idx, role, text, tool, ts)`` (BASELINE.json ``input_hint``) —
at production scale it arrives as partitioned Parquet and is read with
``ray.data.read_parquet`` directly (:func:`read_transcripts`).

The sandbox testdata has no transcripts table, so for correctness checks we
*derive* one deterministically from ``events`` × ``documents`` — with known
violations planted by modular-arithmetic rules — in a form expressible BOTH as
a Ray Data pipeline (:func:`derive_transcripts`) and as a DuckDB CTE
(:data:`TRANSCRIPTS_CTE`). The DuckDB side is the oracle: every validation
query can then be value-hash-compared end to end.

This mirrors the reference's labeled conformance corpus under
``/root/reference/dataset/`` (``empty-pdfs/``, ``unclear-pdfs/``, …,
``tests/analyze_thresholds.py:20-26``): each planted rule is the analog of one
labeled defect folder, and golden expected outcomes are computable exactly.

Planted violation rules (all on the *pre-plant* clean derivation):

=====================  =====================================================
rule                   effect
=====================  =====================================================
event_id % 101 == 7    role := 'agent'            (invalid_role)
event_id % 101 == 57   role := ''                 (invalid_role)
event_id % 97  == 13   text := ''                 (empty_turn)
event_id % 97  == 41   text := '   '              (empty_turn, whitespace)
event_id % 89  == 11   text := garbage run        (low_quality_text)
event_id % 103 == 5    tool := 'search' on a non-tool row  (tool mismatch)
event_id % 103 == 6    tool := NULL on a tool row          (tool mismatch)
user_id  % 17  == 3    turn_idx skips value 2     (turn_gap)
event_id % 211 == 9    row emitted twice          (duplicate_key)
event_id % 113 == 10   ts shifted back 1 day      (ts_regression)
=====================  =====================================================

Clean derivation: ``conv_id = printf('c%06d', user_id)``; ``turn_idx`` is the
0-based rank of the event within its user ordered by ``(ts, event_id)``
(both unique → total order); ``role`` maps event_type
click/view→user, purchase/signup→assistant, error→tool; ``text`` joins
``documents.text`` on ``doc_id = event_id % n_docs`` (broadcast small side);
``tool = 'web_search'`` iff the clean role is tool, else NULL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..schema import TRANSCRIPT_SCHEMA

GARBAGE_TEXT = "??????? ???? ######## @@@@"

#: DuckDB CTE producing the identical transcripts table from the registered
#: ``events`` and ``documents`` views. Prepend to every oracle query.
TRANSCRIPTS_CTE = """
WITH _ev AS (
  SELECT e.event_id, e.ts, e.user_id, e.event_type,
         CAST(row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) - 1
              AS INTEGER) AS rn
  FROM events e
), _base AS (
  SELECT
    printf('c%06d', ev.user_id) AS conv_id,
    CAST(CASE WHEN ev.user_id % 17 = 3 AND ev.rn >= 2 THEN ev.rn + 1 ELSE ev.rn END
         AS INTEGER) AS turn_idx,
    CASE WHEN ev.event_id % 101 = 7  THEN 'agent'
         WHEN ev.event_id % 101 = 57 THEN ''
         WHEN ev.event_type IN ('click','view') THEN 'user'
         WHEN ev.event_type IN ('purchase','signup') THEN 'assistant'
         ELSE 'tool' END AS role,
    CASE WHEN ev.event_id % 97 = 13 THEN ''
         WHEN ev.event_id % 97 = 41 THEN '   '
         WHEN ev.event_id % 89 = 11 THEN '??????? ???? ######## @@@@'
         ELSE d.text END AS text,
    CASE WHEN ev.event_id % 103 = 5 AND ev.event_type <> 'error' THEN 'search'
         WHEN ev.event_id % 103 = 6 AND ev.event_type = 'error'  THEN NULL
         WHEN ev.event_type = 'error' THEN 'web_search'
         ELSE NULL END AS tool,
    CASE WHEN ev.event_id % 113 = 10 THEN ev.ts - INTERVAL 1 DAY
         ELSE ev.ts END AS ts,
    ev.event_id AS _event_id
  FROM _ev ev
  JOIN documents d ON d.doc_id = ev.event_id % (SELECT count(*) FROM documents)
), transcripts AS (
  SELECT conv_id, turn_idx, role, text, tool, ts FROM _base
  UNION ALL
  SELECT conv_id, turn_idx, role, text, tool, ts FROM _base WHERE _event_id % 211 = 9
)
"""

_ROLE_MAP = {
    "click": "user",
    "view": "user",
    "purchase": "assistant",
    "signup": "assistant",
    "error": "tool",
}


def read_transcripts(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Production-path source: partitioned transcript Parquet → Dataset.

    Pass ``columns`` to prune at the read — stats/uniqueness paths never load
    ``text`` (SURVEY.md §7.4 "wide text rows").
    """
    return ray.data.read_parquet(path, columns=columns)


def _doc_texts(sf_dir: str) -> np.ndarray:
    """documents.text as a doc_id-indexed array (small broadcast side)."""
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    order = np.argsort(t["doc_id"].to_numpy())
    return t["text"].to_numpy(zero_copy_only=False)[order]


def _derive_group(g: pd.DataFrame, docs_ref) -> pd.DataFrame:
    """Bucket-level derivation: runs inside ``groupby(bucket).map_groups``
    where a bucket holds MANY whole conversations (vectorized across all of
    them — per-conversation rank via ``groupby.cumcount`` on the sorted
    frame, not per-group Python calls).

    The documents small side is broadcast once via ``ray.put``; ``ray.get`` on
    a worker resolves it zero-copy from the local object store — never
    re-shipped per batch (SURVEY.md §2.6 A2 broadcast pattern).
    """
    docs: np.ndarray = ray.get(docs_ref) if hasattr(docs_ref, "hex") else docs_ref
    g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort").reset_index(
        drop=True
    )
    eid = g["event_id"].to_numpy()
    uid = g["user_id"].to_numpy()
    rn = g.groupby("user_id", sort=False).cumcount().to_numpy()

    turn_idx = np.where((uid % 17 == 3) & (rn >= 2), rn + 1, rn).astype(np.int32)

    # np.select = first-true-condition wins, matching the SQL CASE ordering in
    # TRANSCRIPTS_CTE exactly (an event can satisfy several plant rules).
    role = np.select(
        [eid % 101 == 7, eid % 101 == 57],
        ["agent", ""],
        default=g["event_type"].map(_ROLE_MAP).to_numpy(dtype=object),
    )
    text = np.select(
        [eid % 97 == 13, eid % 97 == 41, eid % 89 == 11],
        ["", "   ", GARBAGE_TEXT],
        default=docs[eid % len(docs)],
    )

    is_tool = (g["event_type"] == "error").to_numpy()
    tool = np.where(is_tool, "web_search", None)
    tool = np.where((eid % 103 == 5) & ~is_tool, "search", tool)
    tool = np.where((eid % 103 == 6) & is_tool, None, tool)

    ts = g["ts"].to_numpy().copy()
    ts[eid % 113 == 10] -= np.timedelta64(1, "D")

    out = pd.DataFrame(
        {
            "conv_id": np.char.add("c", np.char.zfill(uid.astype("U20"), 6)),
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )
    dup = out[eid % 211 == 9]
    if len(dup):
        out = pd.concat([out, dup], ignore_index=True)
    return out


def derive_transcripts(sf_dir: str, use_cache: bool = True) -> ray.data.Dataset:
    """Derive the planted-violation transcripts table from ``sf_dir`` testdata.

    Matches :data:`TRANSCRIPTS_CTE` row-for-row. The per-user rank forces one
    grouped exchange (conversations bucketed whole by ``user_id % 64``); at
    production scale transcripts are a direct Parquet read
    (:func:`read_transcripts`) and this stage does not exist.

    Because the derivation is a pure function of the immutable ``sf_dir``
    tables, the result is spilled once per scale factor to a parquet cache
    under /tmp (atomic rename; marker-guarded) and re-read by every
    subsequent query — one exchange per process instead of one per query.
    """
    if use_cache:
        return ray.data.read_parquet(_ensure_derived_cache(sf_dir))
    return _derive_pipeline(sf_dir)


def _derive_pipeline(sf_dir: str) -> ray.data.Dataset:
    docs_ref = ray.put(_doc_texts(sf_dir))
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def bucketize(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid % 64).astype(np.int64)))

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(lambda g: _derive_group(g, docs_ref), batch_format="pandas")
    )
    return _cast_schema(out)


def _ensure_derived_cache(sf_dir: str) -> str:
    import hashlib
    from pathlib import Path

    # cache key covers the input path AND the derivation spec (the CTE string
    # defines the semantics verbatim) — a semantics change invalidates caches
    key = hashlib.md5(
        (str(Path(sf_dir).resolve()) + TRANSCRIPTS_CTE).encode()
    ).hexdigest()[:12]
    base = Path("/tmp/dqc_derived_cache") / key
    marker = base / "_complete"
    if marker.exists():
        return str(base)
    import os
    import shutil

    tmp = base.parent / f".tmp-{key}-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.parent.mkdir(parents=True, exist_ok=True)
    _derive_pipeline(sf_dir).write_parquet(str(tmp))
    (tmp / "_complete").write_text("ok")
    if marker.exists():  # lost a race: another process finished first
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        if base.exists():
            shutil.rmtree(base)
        os.replace(tmp, base)
    return str(base)


def _cast_schema(ds: ray.data.Dataset) -> ray.data.Dataset:
    def cast(t: pa.Table) -> pa.Table:
        return t.select(TRANSCRIPT_SCHEMA.names).cast(TRANSCRIPT_SCHEMA)

    return ds.map_batches(cast, batch_format="pyarrow")
