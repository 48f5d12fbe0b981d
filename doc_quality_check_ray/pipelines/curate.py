"""End-to-end resumable corpus curation: quality gate → exact dedup →
decontamination → partitioned parquet.

The training-data curation run a user of this engine executes before every
bake, composed from the already-oracle-verified operators:

    phase 1 (per input shard, checkpointed like ``run.py``):
        read shard → first-failing quality gate (``documents.filter_gates``:
        empty → too_short → repetitive → kept) → write the kept rows as the
        shard's ``scored`` parquet; the completion manifest (with lineage +
        per-gate metrics) lands LAST, atomically — a killed run re-does only
        unfinished shards.
    phase 2 (global, idempotent, from phase-1 outputs only):
        exact keep-first dedup (fingerprint-bucket shuffle,
        ``stages.dedup.exact_dedup_keep_first``) → content anti-join against
        the deterministic hash-sample blocklist
        (``stages.dedup.decontaminate``) → final parquet partitioned by
        ``source`` (resumable layout: one directory per partition).

Scale notes: phase 1 is embarrassingly parallel and never shuffles; phase 2
shuffles only (fingerprint, row) pairs through hash buckets — no broadcast,
no driver materialization of anything data-proportional. Counts in the run
summary come from parquet METADATA (footer row counts), not from re-scanning
data.

Reference analog: the reference's batch driver loops folders → per-file
checks → report folder (``test_readability.py:963-1075``); here the same
lifecycle is a Ray Data pipeline with per-shard checkpoints.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..functions.hashing import md5_first_byte_of_ints
from ..state.manifest import RunManifest, _atomic_write_json, atomic_output_dir

SAMPLE_HEX_LT = "10"  # the q_sample_documents blocklist rule (md5(doc_id)[0:2])


def _input_files(in_dir: str) -> list[str]:
    p = Path(in_dir)
    if p.is_file():
        return [str(p)]
    if (p / "documents.parquet").exists():
        return [str(p / "documents.parquet")]
    return [str(f) for f in sorted(p.glob("*.parquet"))]


def _score_shard(file: str, shard_out: Path) -> dict[str, Any]:
    """Phase-1 unit of work: gate one shard, write kept rows atomically."""
    from .documents import filter_gates

    def score(t: pa.Table) -> pa.Table:
        gate = filter_gates(t)
        kept = t.select(["doc_id", "source", "text"]).filter(
            pc.equal(gate, "kept")
        )
        return kept

    # prune at the read: the gate + output need exactly these three columns
    # (documents.parquet also carries lang/n_chars — never load them here)
    ds = ray.data.read_parquet(file, columns=["doc_id", "source", "text"])
    with atomic_output_dir(shard_out) as tmp:
        ds.map_batches(
            score, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(str(tmp))
    n_input = pq.read_metadata(file).num_rows
    n_kept = sum(
        pq.read_metadata(f).num_rows for f in sorted(shard_out.glob("*.parquet"))
    )
    return {"n_input": n_input, "n_kept": n_kept, "input_file": file}


def _input_fingerprint(files: list[str]) -> dict[str, Any]:
    """Cheap identity of the input corpus: per-file footer row count + mtime.
    Footer reads are metadata-only (no data pages leave storage)."""
    return {
        "files": [
            {
                "name": Path(f).name,
                "num_rows": pq.read_metadata(f).num_rows,
                "mtime_ns": Path(f).stat().st_mtime_ns,
            }
            for f in files
        ]
    }


def run_curation(in_dir: str, out_dir: str, resume: bool = True) -> dict[str, Any]:
    """Run (or resume) the full curation pipeline; returns the run summary.

    A resumed run first validates the pinned checkpoints against the CURRENT
    input (ADVICE r4: a corpus regenerated in place under the same path must
    not silently reuse stale curation output): the input fingerprint
    (per-file parquet footer row count + mtime) is written on first build
    and a mismatch falls back to a full rebuild of the out dir.
    """
    import logging
    import shutil

    from ..stages.dedup import decontaminate, exact_dedup_keep_first

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    files = _input_files(in_dir)

    fp_path = out / "input_fingerprint.json"
    fp = _input_fingerprint(files)
    if resume and fp_path.exists():
        import json

        if json.loads(fp_path.read_text()) != fp:
            logging.getLogger(__name__).warning(
                "run_curation: input fingerprint mismatch under %s — "
                "discarding stale checkpoints and rebuilding", out
            )
            for sub in ("scored", "final", "_manifest"):
                shutil.rmtree(out / sub, ignore_errors=True)
            (out / "run_summary.json").unlink(missing_ok=True)
            resume = False

    manifest = RunManifest(out)
    done = manifest.completed_shards() if resume else set()
    if not fp_path.exists() or not resume:
        _atomic_write_json(fp_path, fp)
    t0 = time.perf_counter()
    for i, f in enumerate(files):
        sid = f"{i:05d}"
        if sid in done:
            continue
        shard_out = out / "scored" / f"shard={sid}"
        entry = _score_shard(f, shard_out)
        entry["shard_id"] = sid
        manifest.mark_complete(sid, entry)

    # ---- phase 2: global dedup + decontamination, idempotent ----
    scored_files = [
        str(f) for f in sorted((out / "scored").glob("shard=*/*.parquet"))
    ]
    scored = ray.data.read_parquet(scored_files)

    def as_arrow(t: pa.Table) -> pa.Table:
        # keep-first emits pandas blocks; decontaminate reads the corpus
        # Arrow schema — pin it (and the column order) here
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": pc.cast(t["source"], pa.string()),
                "text": pc.cast(t["text"], pa.string()),
            }
        )

    deduped = exact_dedup_keep_first(scored).map_batches(
        as_arrow, batch_format="pyarrow"
    )

    cut = int(SAMPLE_HEX_LT, 16)

    def sample_filter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(md5_first_byte_of_ints(ids) < cut))

    # the anti-join keys on text fingerprints; doc_id only feeds the sample
    # filter — prune the other three columns at the read
    blocklist = ray.data.read_parquet(files, columns=["doc_id", "text"]).map_batches(
        sample_filter, batch_format="pyarrow", zero_copy_batch=True
    )
    final = decontaminate(deduped, blocklist)

    final_dir = out / "final"
    with atomic_output_dir(final_dir) as tmp:
        final.write_parquet(str(tmp), partition_cols=["source"])

    n_input = sum(manifest.shard_entry(s)["n_input"] for s in manifest.completed_shards())
    n_scored = sum(manifest.shard_entry(s)["n_kept"] for s in manifest.completed_shards())
    n_final = sum(
        pq.read_metadata(f).num_rows
        for f in sorted(final_dir.glob("**/*.parquet"))
    )
    summary = {
        "n_input": n_input,
        "n_gated_out": n_input - n_scored,
        "n_removed_dedup_or_decontaminated": n_scored - n_final,
        "n_final": n_final,
        "n_shards": len(files),
        "wall_sec": round(time.perf_counter() - t0, 3),
    }
    manifest.write_run_summary(summary)
    return summary
