"""The resumable end-to-end validation run — the ``ray job submit`` entry.

Two phases, mirroring the reference's lifecycle (SURVEY.md §3.1/§3.3):

**Phase 1 — per-shard scan (resumable).** One input parquet file = one shard
(the "shards" of ``get_files_in_folder``, ``test_readability.py:138-164``).
For each shard not yet in the manifest: stream blocks through the row-check
stage, write violation rows + distinct-key partials + a stats sketch, then
atomically mark complete. A killed run resumes by skipping completed shards —
the idempotent-per-file analog of the reference's per-file loop + report
folders (K4).

**Phase 2 — global merge (idempotent, tiny).** Reads only the *partials*
written by phase 1 (distinct-key counts ≪ raw rows; sketches are KB-sized):
duplicate keys, turn-gap conversations, partition verdicts, corpus stats,
drift vs an optional reference snapshot. Rerunning phase 2 overwrites
``global/`` wholesale.

Nothing here calls ``ray.init`` — the driver owns the session. CLI:
``python -m doc_quality_check_ray.run --input DIR --out DIR`` (see run.py
module main), which guards init for standalone use.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

from ..config import DEFAULT_CONFIG, ValidationConfig
from ..state.manifest import RunManifest, atomic_output_dir
from ..state.snapshot import StatsSnapshot
from ..stages import drift as drift_mod
from ..stages.keys import CHECK_DUP, CHECK_GAP
from ..stages.row_checks import row_violations_batch
from .validate import partition_id_col


def _list_shards(input_path: str) -> list[tuple[str, str]]:
    """(shard_id, file) per input parquet file, deterministic order."""
    p = Path(input_path)
    files = sorted(p.glob("*.parquet")) if p.is_dir() else [p]
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    return [(f"{i:05d}", str(f)) for i, f in enumerate(files)]


def _process_shard(
    shard_id: str, file: str, out: Path, cfg: ValidationConfig
) -> dict[str, Any]:
    """Phase 1 for one shard: violations + key partials + sketch, atomically."""
    t0 = time.perf_counter()
    ds = ray.data.read_parquet(file)

    with atomic_output_dir(out / "row_violations" / f"shard={shard_id}") as vtmp:
        row_checks_ds = ds.map_batches(
            lambda t: row_violations_batch(t, cfg),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            zero_copy_batch=True,
        )
        row_checks_ds.write_parquet(str(vtmp))

    with atomic_output_dir(out / "key_partials" / f"shard={shard_id}") as ktmp:
        # distinct keys per block (combiner) — phase 2 merges across shards
        ds.map_batches(
            lambda t: t.select(["conv_id", "turn_idx"])
            .group_by(["conv_id", "turn_idx"])
            .aggregate([([], "count_all")])
            .rename_columns(["conv_id", "turn_idx", "cnt"]),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            zero_copy_batch=True,
        ).write_parquet(str(ktmp))

    sketch = drift_mod.build_snapshot(ds, cfg)
    sdir = out / "sketches"
    sdir.mkdir(parents=True, exist_ok=True)
    sketch.save(sdir / f"shard-{shard_id}.json")

    viol_files = list((out / "row_violations" / f"shard={shard_id}").glob("*.parquet"))
    n_viol = sum(pq.read_metadata(f).num_rows for f in viol_files)
    return {
        "shard_id": shard_id,
        "input_file": file,
        "n_rows": sketch.n_rows,
        "n_row_violations": int(n_viol),
        "wall_sec": round(time.perf_counter() - t0, 3),
        "engine_version": "0.1.0",
    }


def _phase2_global(out: Path, cfg: ValidationConfig, snapshot_path: str | None) -> dict:
    """Merge partials from all completed shards into global verdicts."""
    kp = ray.data.read_parquet(str(out / "key_partials"))
    key_counts = kp.groupby(["conv_id", "turn_idx"]).aggregate(
        Sum("cnt", alias_name="cnt")
    )

    def keep_dups(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.greater(t["cnt"], 1))
        return pa.table(
            {
                "conv_id": hit["conv_id"],
                "turn_idx": pc.cast(hit["turn_idx"], pa.int32()),
                "n_dups": pc.cast(hit["cnt"], pa.int64()),
            }
        )

    def conv_partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by("conv_id")
            .aggregate(
                [("cnt", "sum"), ([], "count_all"), ("turn_idx", "min"), ("turn_idx", "max")]
            )
            .rename_columns(["conv_id", "n", "n_distinct", "min_idx", "max_idx"])
        )

    gdir = out / "global"
    with atomic_output_dir(gdir) as gtmp:
        dups = key_counts.map_batches(keep_dups, batch_format="pyarrow")
        dups.write_parquet(str(gtmp / "duplicate_keys"))

        conv = (
            key_counts.map_batches(conv_partial, batch_format="pyarrow")
            .groupby("conv_id")
            .aggregate(
                Sum("n", alias_name="n"),
                Sum("n_distinct", alias_name="n_distinct"),
                Min("min_idx", alias_name="min_idx"),
                Max("max_idx", alias_name="max_idx"),
            )
        )

        def keep_gaps(t: pa.Table) -> pa.Table:
            ok = pc.and_(
                pc.and_(
                    pc.equal(t["min_idx"], 0),
                    pc.equal(t["max_idx"], pc.subtract(t["n_distinct"], 1)),
                ),
                pc.equal(t["n"], t["n_distinct"]),
            )
            return t.filter(pc.invert(ok))

        gaps = conv.map_batches(keep_gaps, batch_format="pyarrow")
        gaps.write_parquet(str(gtmp / "turn_gaps"))

        # merged corpus sketch from per-shard sketches (KB-scale JSON)
        merged = _merge_sketches(out, cfg)
        merged.save(gtmp / "stats.json")

        drift_info: dict[str, Any] = {"checked": False}
        if snapshot_path:
            ref = StatsSnapshot.load(snapshot_path)
            import numpy as np

            from ..functions.sketches import psi

            domain = sorted(set(ref.role_counts) | set(merged.role_counts))
            psi_role = psi(merged.role_vector(domain), ref.role_vector(domain))
            psi_len = psi(
                np.asarray(merged.length_hist), np.asarray(ref.length_hist)
            )
            drift_info = {
                "checked": True,
                "psi_role": psi_role,
                "psi_len": psi_len,
                "drifted": bool(
                    psi_role > cfg.psi_threshold or psi_len > cfg.psi_threshold
                ),
            }
        import json

        (gtmp / "drift.json").write_text(json.dumps(drift_info))

        # partition verdicts: rows from shard manifests are not keyed by
        # partition, so recount from key partials (cnt sums = true row counts)
        def part_rows(t: pa.Table) -> pa.Table:
            pid = partition_id_col(t["conv_id"], cfg.n_partitions)
            return (
                pa.table({"partition_id": pid, "cnt": t["cnt"]})
                .group_by("partition_id")
                .aggregate([("cnt", "sum")])
                .rename_columns(["partition_id", "n_rows"])
            )

        rows_per = (
            kp.map_batches(part_rows, batch_format="pyarrow")
            .groupby("partition_id")
            .aggregate(Sum("n_rows", alias_name="n_rows"))
            .to_pandas()
        )

        viol = ray.data.read_parquet(str(out / "row_violations"))

        def part_viol(t: pa.Table) -> pa.Table:
            pid = partition_id_col(t["conv_id"], cfg.n_partitions)
            return (
                pa.table({"partition_id": pid})
                .group_by("partition_id")
                .aggregate([([], "count_all")])
                .rename_columns(["partition_id", "n_violations"])
            )

        vp_parts = [
            viol.map_batches(part_viol, batch_format="pyarrow"),
            dups.map_batches(part_viol, batch_format="pyarrow"),
            gaps.map_batches(part_viol, batch_format="pyarrow"),
        ]
        viol_per = (
            vp_parts[0]
            .union(*vp_parts[1:])
            .groupby("partition_id")
            .aggregate(Sum("n_violations", alias_name="n_violations"))
            .to_pandas()
        )
        pv = rows_per.merge(viol_per, on="partition_id", how="left")
        pv["n_violations"] = pv["n_violations"].fillna(0).astype("int64")
        pv["passed"] = pv["n_violations"] == 0
        pv = pv.sort_values("partition_id", ignore_index=True)
        pq.write_table(pa.Table.from_pandas(pv, preserve_index=False), gtmp / "partition_verdicts.parquet")

        n_dup = sum(pq.read_metadata(f).num_rows for f in (gtmp / "duplicate_keys").glob("*.parquet"))
        n_gap = sum(pq.read_metadata(f).num_rows for f in (gtmp / "turn_gaps").glob("*.parquet"))
        summary = {
            "n_rows": merged.n_rows,
            "n_duplicate_keys": int(n_dup),
            "n_gap_conversations": int(n_gap),
            "n_partitions_failed": int((~pv["passed"]).sum()),
            "drift": drift_info,
        }
    return summary


def _merge_sketches(out: Path, cfg: ValidationConfig) -> StatsSnapshot:
    import numpy as np

    from ..functions.sketches import Histogram, TDigest

    roles: dict[str, int] = {}
    hist = Histogram.empty(cfg.length_hist_buckets)
    td = TDigest(cfg.tdigest_compression)
    n, ts_min, ts_max = 0, None, None
    for f in sorted((out / "sketches").glob("shard-*.json")):
        s = StatsSnapshot.load(f)
        n += s.n_rows
        for k, c in s.role_counts.items():
            roles[k] = roles.get(k, 0) + c
        hist = hist.merge(s.length_histogram())
        td = td.merge(s.tdigest())
        if s.ts_min:
            ts_min = s.ts_min if ts_min is None else min(ts_min, s.ts_min)
        if s.ts_max:
            ts_max = s.ts_max if ts_max is None else max(ts_max, s.ts_max)
    means, weights = td.to_arrays()
    return StatsSnapshot(
        n_rows=n,
        role_counts=roles,
        length_edges=tuple(float(e) for e in cfg.length_hist_buckets),
        length_hist=hist.to_list(),
        tdigest_means=means,
        tdigest_weights=weights,
        ts_min=ts_min,
        ts_max=ts_max,
    )


def run_validation(
    input_path: str,
    out_dir: str,
    cfg: ValidationConfig = DEFAULT_CONFIG,
    resume: bool = True,
    snapshot_path: str | None = None,
    max_shards: int | None = None,
) -> dict[str, Any]:
    """Execute the full validation run; returns the run summary dict.

    ``resume=True`` skips shards already marked complete. ``max_shards``
    exists for kill/resume testing (stop after N shards).
    """
    out = Path(out_dir)
    manifest = RunManifest(out)
    done = manifest.completed_shards() if resume else set()
    shards = _list_shards(input_path)

    processed = 0
    skipped = 0
    for shard_id, file in shards:
        if shard_id in done:
            skipped += 1
            continue
        if max_shards is not None and processed >= max_shards:
            return {"partial": True, "processed": processed, "skipped": skipped}
        entry = _process_shard(shard_id, file, out, cfg)
        manifest.mark_complete(shard_id, entry)
        processed += 1

    summary = _phase2_global(out, cfg, snapshot_path)
    summary.update(
        {
            "partial": False,
            "processed": processed,
            "skipped": skipped,
            "n_shards": len(shards),
        }
    )
    manifest.write_run_summary(summary)
    return summary
