"""The resumable end-to-end validation run — the ``ray job submit`` entry.

Phases, mirroring the reference's lifecycle (SURVEY.md §3.1/§3.3):

**Phase 0 — schema conformance.** Metadata-only validation of every input
file against the declared transcript schema.

**Phase 1 — fused scan (resumable).** Input files are processed in fixed
checkpoint groups (the "shards" of ``get_files_in_folder``,
``test_readability.py:138-164``, batched for cluster-wide parallelism). ONE
streaming pass per group emits a tagged union of: violation rows (kind=v),
per-partition row/violation counts (p/q), per-batch stats sketches incl.
histograms, t-digests and an HLL (s), and per-turn normalized-text
fingerprints (f) — written atomically, manifest entry last. A killed run
resumes by skipping completed groups — the idempotent-per-file analog of the
reference's per-file loop + report folders (K4).

**Phase 2 — global merge (idempotent).** A single conv-keyed hash exchange
over the (immutable, column-pruned) input yields duplicate-key and turn-gap
findings; partition verdicts, merged corpus stats, column-stats gates, and
drift-vs-snapshot come from the KB-scale phase-1 partials. Rerunning phase 2
overwrites ``global/`` wholesale.

Nothing here calls ``ray.init`` — the driver owns the session. CLI:
``python -m doc_quality_check_ray --input DIR --out DIR`` (guards init for
standalone use; ``--verify-equality A B`` compares two runs' fingerprints).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..config import DEFAULT_CONFIG, ValidationConfig
from ..stages.exchange import parquet_hash_exchange
from ..state.manifest import RunManifest, atomic_output_dir
from ..state.snapshot import StatsSnapshot
from ..stages import drift as drift_mod
from ..stages.row_checks import row_violations_batch
from .validate import partition_id_col


def _list_shards(input_path: str) -> list[tuple[str, str]]:
    """(shard_id, file) per input parquet file, deterministic order."""
    p = Path(input_path)
    files = sorted(p.glob("*.parquet")) if p.is_dir() else [p]
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    return [(f"{i:05d}", str(f)) for i, f in enumerate(files)]


#: union schema of the fused phase-1 output, discriminated by ``kind``:
#: 'v' = violation row, 'p'/'q' = per-partition row/violation counts,
#: 's' = per-batch sketch, 'f' = per-turn normalized-text fingerprint.
_FUSED_FIELDS = {
    "conv_id": pa.string(),
    "turn_idx": pa.int32(),
    "check_id": pa.string(),
    "detail": pa.string(),
    "cnt": pa.int64(),
    "sketch": pa.string(),
}


def _fused_phase1_batch(t: pa.Table, cfg: ValidationConfig) -> pa.Table:
    """ONE pass per batch producing all three phase-1 outputs as a tagged
    union table — the input is read exactly once per shard (the reference
    similarly computes all per-page metrics in its single extraction pass,
    ``utils/document_processor.py:151-161``).

    Exceptions are captured as a synthetic ``batch_error`` violation row
    instead of failing the task — the M18 row-level error guard
    (``test_readability.py:186-271`` converts per-file crashes into error
    rows with ``error=str(e)``); Ray's task retries still cover
    infrastructure failures.
    """
    import json

    try:
        return _fused_phase1_batch_inner(t, cfg)
    except Exception as e:  # noqa: BLE001 — deliberate poison-pill capture
        err = pa.table(
            {
                "conv_id": pa.array(["<batch_error>"], pa.string()),
                "turn_idx": pa.array([-1], pa.int32()),
                "check_id": pa.array(["batch_error"], pa.string()),
                "detail": pa.array([f"{type(e).__name__}: {e}"[:500]], pa.string()),
                "cnt": pa.array([t.num_rows], pa.int64()),
                "sketch": pa.array([None], pa.string()),
                "kind": pa.array(["v"], pa.string()),
            }
        )
        return err


def _fused_phase1_batch_inner(t: pa.Table, cfg: ValidationConfig) -> pa.Table:
    import json

    v = row_violations_batch(t, cfg)
    # kind='p'/'q': per-partition row / violation counts (partition_id rides
    # in turn_idx, count in cnt) — phase 2 builds the verdict manifest from
    # these KB-scale partials with no extra pass over rows or violations
    def part_counts(conv_id) -> pa.Table:
        pid = partition_id_col(conv_id, cfg.n_partitions)
        return (
            pa.table({"turn_idx": pc.cast(pid, pa.int32())})
            .group_by("turn_idx")
            .aggregate([([], "count_all")])
            .rename_columns(["turn_idx", "cnt"])
        )

    p = part_counts(t["conv_id"])
    q = part_counts(v["conv_id"])

    # kind='f': per-turn fingerprint of the NORMALIZED text (the M8
    # canonicalization), xxhash64 via polars (vectorized) riding in cnt —
    # the material for the north-rule per-turn text-equality check.
    tagged = [("p", p), ("q", q)]
    if cfg.emit_text_fingerprints:
        import polars as pl

        from ..functions.text_norm import normalize_text_arrow

        norm = normalize_text_arrow(t["text"])
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        fp = (
            pl.from_arrow(pc.fill_null(norm, "\x00<null>"))
            .hash(seed=7)
            .to_numpy()
            .astype("int64", casting="unsafe", copy=False)
        )
        f = pa.table(
            {"conv_id": t["conv_id"], "turn_idx": t["turn_idx"], "cnt": pa.array(fp)}
        )
        tagged.append(("f", f))

    sketch_json = json.dumps(drift_mod._batch_sketch(t, cfg))

    def pad(tbl: pa.Table, kind: str) -> pa.Table:
        cols = {}
        for name, typ in _FUSED_FIELDS.items():
            cols[name] = (
                tbl[name] if name in tbl.column_names else pa.nulls(tbl.num_rows, typ)
            )
        cols["kind"] = pa.array([kind] * tbl.num_rows, pa.string())
        return pa.table(cols)

    s = pa.table({"sketch": pa.array([sketch_json], pa.string())})
    return pa.concat_tables(
        [pad(v, "v"), pad(s, "s")] + [pad(tbl, kind) for kind, tbl in tagged]
    )


def _shard_dirs(out: Path, kind: str) -> list[str]:
    """All parquet files of one fused-output kind (read_parquet takes files
    when given a list, not directories)."""
    return sorted(str(p) for p in out.glob(f"partials/shard=*/kind={kind}/*.parquet"))


def _process_group(
    group_id: str, files: list[str], out: Path, cfg: ValidationConfig
) -> dict[str, Any]:
    """Phase 1 for one checkpoint group (a fixed slice of input files) in ONE
    Ray Data execution.

    A single ``read_parquet`` over the group's files lets the executor split
    read tasks across all files and row groups — measured ~2× faster than a
    per-file union and ~4× faster than sequential per-file pipelines, which
    anti-scale with cluster size. The group is the checkpoint unit: outputs
    land in a temp dir, are renamed into ``partials/shard=<group_id>``
    atomically, and the manifest entry is written last.
    """
    t0 = time.perf_counter()
    ds = ray.data.read_parquet(files).map_batches(
        lambda t: _fused_phase1_batch(t, cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
    dst = out / "partials" / f"shard={group_id}"
    with atomic_output_dir(dst) as tmp:
        ds.write_parquet(str(tmp), partition_cols=["kind"])
    n_viol = sum(pq.read_metadata(f).num_rows for f in dst.glob("kind=v/*.parquet"))
    # tree reduce, level 1: this shard's per-batch sketches merge into ONE
    # sketch inside a Ray task; the driver later merges O(shards) of these
    # (never O(batches) — at 10^12 rows that is millions of JSON sketches).
    # The ref is returned UNRESOLVED so the merge overlaps the next group's
    # scan instead of sitting on the critical path between groups.
    sketch_ref = _merge_shard_sketch_task.remote(str(dst), cfg)
    entry = {
        "shard_id": group_id,
        "input_files": files,
        "n_row_violations": int(n_viol),
        "wall_sec": round(time.perf_counter() - t0, 3),
        "group_size": len(files),
        "engine_version": "0.1.0",
    }
    return entry, sketch_ref


def _finalize_group(
    manifest: RunManifest, entry: dict[str, Any], sketch_ref
) -> None:
    """Resolve the deferred sketch merge and write the completion manifest."""
    shard_sketch = ray.get(sketch_ref)
    entry["sketch"] = shard_sketch
    entry["n_rows"] = int(shard_sketch["n_rows"]) if shard_sketch else 0
    manifest.mark_complete(entry["shard_id"], entry)


@ray.remote
def _merge_shard_sketch_task(shard_dir: str, cfg: ValidationConfig) -> dict | None:
    """Merge one shard's kind=s batch-sketch rows into a single sketch dict."""
    import json

    import pyarrow.dataset as pads

    files = sorted(str(p) for p in Path(shard_dir).glob("kind=s/*.parquet"))
    if not files:
        return None
    col = pads.dataset(files, format="parquet").to_table(columns=["sketch"])["sketch"]
    return drift_mod.merge_sketch_dicts(
        [json.loads(s) for s in col.to_pylist()], cfg
    )


def _phase2_global(
    out: Path,
    cfg: ValidationConfig,
    snapshot_path: str | None,
    input_files: list[str] | None = None,
) -> dict:
    """Merge partials from all completed shards into global verdicts.

    Every intermediate that is consumed more than once is spilled to Parquet
    ONCE and re-read streaming (a lazy Dataset re-executes its whole lineage
    per consumer — at 10^12 keys neither recomputation nor ``materialize()``
    in the object store is acceptable; disk-backed reuse is).
    """

    import pandas as pd

    # the KB-scale partial merges are independent of the key exchange — run
    # them as tasks CONCURRENT with it instead of serially on the driver
    # afterward (phase 2's driver-side serial tail was the largest
    # non-scaling cost in the N-vs-4N measurement)
    p_ref = _sum_partials_task.remote(_shard_dirs(out, "p"), "n_rows")
    q_ref = _sum_partials_task.remote(_shard_dirs(out, "q"), "n_violations")
    err_ref = _count_batch_errors_task.remote(_shard_dirs(out, "v"))

    def bucket_findings(t: pa.Table) -> pa.Table:
        """Per bucket: count key multiplicities, emit dup-key and gap-conv
        findings. Input is raw (conv_id, turn_idx) rows straight off the
        immutable input parquet — multiplicity IS the row count.

        polars on the Arrow bucket (null keys are real groups in polars
        group_by, matching DuckDB): pandas multi-key string groupby plus the
        arrow→pandas conversion cost ~2× the whole reduction at megarow
        bucket sizes. Returns a typed Arrow table (typed even when empty,
        so downstream schema inference never sees object dtypes).
        """
        import polars as pl

        df = pl.from_arrow(t.select(["conv_id", "turn_idx"]))
        kc = df.group_by(["conv_id", "turn_idx"]).len(name="cnt")
        dup = kc.filter(pl.col("cnt") > 1)
        conv = kc.group_by("conv_id").agg(
            n=pl.col("cnt").sum().cast(pl.Int64),
            n_distinct=pl.len().cast(pl.Int64),
            min_idx=pl.col("turn_idx").min().cast(pl.Int64),
            max_idx=pl.col("turn_idx").max().cast(pl.Int64),
        )
        bad = conv.filter(
            ~(
                (pl.col("min_idx") == 0)
                & (pl.col("max_idx") == pl.col("n_distinct") - 1)
                & (pl.col("n") == pl.col("n_distinct"))
            )
        )
        nd, nb = len(dup), len(bad)
        return pa.table(
            {
                "conv_id": pa.array(
                    dup["conv_id"].to_list() + bad["conv_id"].to_list(), pa.string()
                ),
                "turn_idx": pa.array(
                    dup["turn_idx"].to_list() + [-1] * nb, pa.int32()
                ),
                "n_dups": pa.array(
                    dup["cnt"].cast(pl.Int64).to_list() + [0] * nb, pa.int64()
                ),
                "n": pa.array([0] * nd + bad["n"].to_list(), pa.int64()),
                "n_distinct": pa.array(
                    [0] * nd + bad["n_distinct"].to_list(), pa.int64()
                ),
                "min_idx": pa.array([0] * nd + bad["min_idx"].to_list(), pa.int64()),
                "max_idx": pa.array([0] * nd + bad["max_idx"].to_list(), pa.int64()),
                "finding": pa.array(["dup"] * nd + ["gap"] * nb, pa.string()),
            }
        )

    # merged corpus sketch first (KB-scale JSON): its hot-conversation probe
    # (max multiplicity of one conv within any scanned batch) decides the
    # key-finding path BEFORE the exchange runs
    merged = _merge_sketches(out, cfg)
    hot_gate = min(cfg.hot_conv_turns, cfg.batch_size)
    use_salted = (merged.max_conv_batch or 0) >= hot_gate

    gdir = out / "global"
    with atomic_output_dir(gdir) as gtmp:
        # ONE conv-keyed hash exchange straight over the (immutable, column-
        # pruned) INPUT produces every key-level finding — phase 1 does not
        # persist a per-key table at all: re-reading two narrow columns costs
        # about the same as writing+reading 10^12 key partials would, and
        # halves phase-1 output volume. Bucketing on conv_id alone puts each
        # conversation whole into one reduce task, so dup keys and
        # conversation contiguity fall out of a single local merge.
        # Assumption: one conversation's rows fit one reduce task — when the
        # phase-1 sketch's hot-conversation probe says a conversation filled
        # a whole batch (≥ min(hot_conv_turns, batch_size) turns in one
        # batch), the order-free mergeable-partials path below is selected
        # automatically instead.
        if input_files and use_salted:
            dup_t, gap_t = _key_findings_salted(input_files, cfg)
        else:
            findings = (
                parquet_hash_exchange(
                    input_files,
                    ["conv_id"],
                    bucket_findings,
                    num_buckets=64,
                    columns=["conv_id", "turn_idx"],
                    reduce_format="pyarrow",
                )
                if input_files
                else bucket_findings(
                    pa.table(
                        {
                            "conv_id": pa.array([], pa.string()),
                            "turn_idx": pa.array([], pa.int32()),
                        }
                    )
                )
            )
            dup_t = findings.filter(pc.equal(findings["finding"], "dup")).select(
                ["conv_id", "turn_idx", "n_dups"]
            )
            gap_t = findings.filter(pc.equal(findings["finding"], "gap")).select(
                ["conv_id", "n", "n_distinct", "min_idx", "max_idx"]
            )
        kdir = gtmp / "key_findings"
        (kdir / "finding=dup").mkdir(parents=True)
        (kdir / "finding=gap").mkdir(parents=True)
        pq.write_table(dup_t, kdir / "finding=dup" / "part-0.parquet")
        pq.write_table(gap_t, kdir / "finding=gap" / "part-0.parquet")

        merged.save(gtmp / "stats.json")

        # column-stats gates: corpus-level pass/fail on aggregate stats
        stats_gate = _column_stats_gate(merged, cfg)

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
            # per-batch drift rows via the DriftChecker ACTOR POOL (snapshot
            # broadcast once via ray.put, fetched in __init__ once per actor
            # — the A2/T1 pattern): localizes WHERE in the stream the
            # distribution moved, beyond the corpus-level verdict above.
            if input_files:
                drift_mod.drift_scan(
                    ray.data.read_parquet(
                        input_files, columns=["conv_id", "role", "text", "ts"]
                    ),
                    ref,
                    cfg,
                ).write_parquet(str(gtmp / "drift_batches"))
        import json

        (gtmp / "drift.json").write_text(json.dumps(drift_info))

        # verdict manifest from the KB-scale 'p'/'q' partials + the (small)
        # key findings — partial sums were launched as tasks before the
        # exchange and have been computing alongside it; collect them now
        rows_per = ray.get(p_ref)
        viol_per = ray.get(q_ref)
        for extra in (dup_t, gap_t):
            if extra.num_rows:
                pid = partition_id_col(extra["conv_id"], cfg.n_partitions).to_pandas()
                more = pid.value_counts().rename_axis("partition_id").reset_index(
                    name="n_violations"
                )
                viol_per = (
                    pd.concat([viol_per, more], ignore_index=True)
                    .groupby("partition_id", as_index=False)["n_violations"]
                    .sum()
                )
        pv = rows_per.merge(viol_per, on="partition_id", how="left")
        pv["n_violations"] = pv["n_violations"].fillna(0).astype("int64")
        pv["passed"] = pv["n_violations"] == 0
        pv = pv.sort_values("partition_id", ignore_index=True)
        pq.write_table(pa.Table.from_pandas(pv, preserve_index=False), gtmp / "partition_verdicts.parquet")

        n_dup = sum(
            pq.read_metadata(f).num_rows
            for f in (gtmp / "key_findings" / "finding=dup").glob("*.parquet")
        )
        n_gap = sum(
            pq.read_metadata(f).num_rows
            for f in (gtmp / "key_findings" / "finding=gap").glob("*.parquet")
        )
        est = merged.n_convs_estimate()
        # batch_error poison-pill rows emit no 'p'/'q' partials, so they are
        # invisible to partition verdicts — count them explicitly and fail
        # the run summary when any batch was lost (ADVICE r1: a run must not
        # report n_partitions_failed=0 while entire batches errored out)
        n_batch_errors, n_error_rows = ray.get(err_ref)
        summary = {
            "n_rows": merged.n_rows,
            "key_path": "salted" if use_salted else "conv_bucket",
            "max_conv_batch": int(merged.max_conv_batch or 0),
            "n_convs_estimate": int(est) if est is not None else None,
            "n_duplicate_keys": int(n_dup),
            "n_gap_conversations": int(n_gap),
            "n_partitions_failed": int((~pv["passed"]).sum()),
            "n_batch_errors": int(n_batch_errors),
            "n_rows_in_errored_batches": int(n_error_rows),
            "column_stats_gate": stats_gate,
            "drift": drift_info,
            "passed": bool(
                (~pv["passed"]).sum() == 0
                and n_batch_errors == 0
                and stats_gate["passed"]
            ),
        }
    return summary


def _key_findings_salted(
    input_files: list[str], cfg: ValidationConfig
) -> tuple[pa.Table, pa.Table]:
    """Key findings via order-free mergeable partials — the hot-conversation
    path (auto-selected off the phase-1 sketch). Duplicates come from the
    fine-grained (conv_id, turn_idx) exchange (naturally skew-free: a key's
    copies merge by count, never a whole conversation in one task); gaps
    from :func:`~doc_quality_check_ray.stages.keys.conversation_stats_salted`'s
    two-level tree merge. Output tables are identical to the conv-bucketed
    fast path (equivalence-tested on the mega-conversation fixture).
    """
    from ..stages.keys import duplicate_keys, turn_gaps

    ds = ray.data.read_parquet(input_files, columns=["conv_id", "turn_idx"])
    dup_t = _concat_ds(
        duplicate_keys(ds, cfg), ["conv_id", "turn_idx", "n_dups"]
    )
    gap_t = _concat_ds(
        turn_gaps(ds, cfg, salted=True),
        ["conv_id", "n", "n_distinct", "min_idx", "max_idx"],
    )
    return dup_t, gap_t


def _concat_ds(ds: ray.data.Dataset, columns: list[str]) -> pa.Table:
    batches = [
        b.select(columns)
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    if not batches:
        return pa.table(
            {
                c: pa.array(
                    [], pa.string() if c == "conv_id" else
                    pa.int32() if c == "turn_idx" else pa.int64()
                )
                for c in columns
            }
        )
    return pa.concat_tables(batches)


@ray.remote
def _sum_partials_task(files: list[str], alias: str):
    """Sum the per-partition 'p'/'q' count partials (threaded C++ scan over
    the many small per-block files; runs concurrent with the key exchange)."""
    import pandas as pd
    import pyarrow.dataset as pads

    if not files:
        return pd.DataFrame({"partition_id": [], alias: []}).astype("int64")
    t = pads.dataset(files, format="parquet").to_table(columns=["turn_idx", "cnt"])
    return (
        t.to_pandas()
        .rename(columns={"turn_idx": "partition_id", "cnt": alias})
        .groupby("partition_id", as_index=False)[alias]
        .sum()
    )


@ray.remote
def _count_batch_errors_task(files: list[str]) -> tuple[int, int]:
    """(n batch_error rows, total rows lost in them) across all shards."""
    import pyarrow.dataset as pads

    if not files:
        return 0, 0
    t = pads.dataset(files, format="parquet").to_table(
        columns=["check_id", "cnt"],
        filter=pads.field("check_id") == "batch_error",
    )
    n_rows_lost = pc.sum(t["cnt"]).as_py() or 0
    return t.num_rows, int(n_rows_lost)




def _column_stats_gate(snap: StatsSnapshot, cfg: ValidationConfig) -> dict:
    """Corpus-level pass/fail on aggregate column stats (configurable bounds).

    Exact counts derived from the merged sketches: the length histogram and
    ts digest are exhaustive over non-null values, so null counts are totals
    minus their mass; max length merges exactly.
    """
    n = max(snap.n_rows, 1)
    checks: dict[str, dict] = {}

    def gate(name: str, value, bound, cmp="le"):
        if bound is None:
            return
        ok = value <= bound if cmp == "le" else value >= bound
        checks[name] = {"value": value, "bound": bound, "ok": bool(ok)}

    gate("null_text_rate", snap.null_text_count() / n, cfg.max_null_text_rate)
    gate("null_role_rate", snap.null_role_count() / n, cfg.max_null_role_rate)
    gate("null_ts_rate", snap.null_ts_count() / n, cfg.max_null_ts_rate)
    if snap.max_text_len is not None:
        gate("max_text_len", snap.max_text_len, cfg.max_text_len)
    return {"passed": all(c["ok"] for c in checks.values()), "checks": checks}


def _merge_sketches(out: Path, cfg: ValidationConfig) -> StatsSnapshot:
    """Tree reduce, level 2: merge the per-shard sketches (one per shard,
    pre-merged inside tasks by :func:`_merge_shard_sketch_task`) — the driver
    loop is O(shards). Shards from older outputs without a manifest sketch
    fall back to an in-task merge of their batch rows.
    """
    manifest = RunManifest(out)
    dicts = []
    fallback_refs = []
    for d in sorted(out.glob("partials/shard=*")):
        sid = d.name.removeprefix("shard=")
        try:
            entry = manifest.shard_entry(sid)
            sk = entry.get("sketch")
        except FileNotFoundError:
            sk = None
        if sk:
            dicts.append(sk)
        else:
            fallback_refs.append(_merge_shard_sketch_task.remote(str(d), cfg))
    dicts.extend(s for s in ray.get(fallback_refs) if s)
    merged = drift_mod.merge_sketch_dicts(dicts, cfg)
    return drift_mod.snapshot_from_sketch(merged, cfg)


def run_validation(
    input_path: str,
    out_dir: str,
    cfg: ValidationConfig = DEFAULT_CONFIG,
    resume: bool = True,
    snapshot_path: str | None = None,
    max_groups: int | None = None,
) -> dict[str, Any]:
    """Execute the full validation run; returns the run summary dict.

    The checkpoint unit is a *group* of ``cfg.shard_group_size`` consecutive
    input files (group membership is a pure function of the sorted file list,
    so resume with the same config always re-derives the same groups).
    ``resume=True`` skips completed groups. ``max_groups`` exists for
    kill/resume testing (stop after N groups).
    """
    out = Path(out_dir)
    manifest = RunManifest(out)
    done = manifest.completed_shards() if resume else set()
    shards = _list_shards(input_path)

    # phase 0: metadata-only schema conformance over every input file
    from ..stages.schema_check import check_parquet_schema

    schema_report = check_parquet_schema([f for _, f in shards])

    g = max(1, cfg.shard_group_size)
    groups = [
        (f"{i // g:05d}", [f for _, f in shards[i : i + g]])
        for i in range(0, len(shards), g)
    ]
    pending = [(gid, files) for gid, files in groups if gid not in done]
    skipped = len(groups) - len(pending)
    stopped_early = max_groups is not None and len(pending) > max_groups
    if max_groups is not None:
        pending = pending[:max_groups]

    # the previous group's sketch-merge task resolves while the current
    # group's scan runs — zero critical-path cost; a kill mid-group redoes at
    # most one already-scanned group (its manifest lands one group late)
    t1 = time.perf_counter()
    processed = 0
    prev: tuple[dict[str, Any], Any] | None = None
    for gid, files in pending:
        entry, ref = _process_group(gid, files, out, cfg)
        if prev is not None:
            _finalize_group(manifest, *prev)
        prev = (entry, ref)
        processed += 1
    if prev is not None:
        _finalize_group(manifest, *prev)
    wall_phase1 = time.perf_counter() - t1

    if stopped_early:
        return {"partial": True, "processed": processed, "skipped": skipped}

    t2 = time.perf_counter()
    summary = _phase2_global(out, cfg, snapshot_path, input_files=[f for _, f in shards])
    summary["wall_phase1_sec"] = round(wall_phase1, 3)
    summary["wall_phase2_sec"] = round(time.perf_counter() - t2, 3)
    summary.update(
        {
            "partial": False,
            "processed": processed,
            "skipped": skipped,
            "n_groups": len(groups),
            "n_input_files": len(shards),
            "schema": schema_report,
        }
    )
    manifest.write_run_summary(summary)
    return summary


def verify_text_equality(
    out_a: str, out_b: str, cfg: ValidationConfig = DEFAULT_CONFIG
) -> dict[str, Any]:
    """North-rule invariant: per-turn text equality between two completed runs.

    Compares the normalized-text fingerprints (kind='f' partials) of both
    runs keyed on ``(conv_id, turn_idx)`` — the keyed comparison is the
    order-free equivalent of comparing under a stable (conv_id, turn_idx)
    sort, with no re-read of either corpus. Distributed via the same hash
    exchange as phase 2; the per-bucket reducer emits only differing keys.

    Returns counts plus a deterministic (sorted) sample of mismatches:
    keys whose fingerprints differ, or that exist in only one run.
    """
    import pandas as pd

    fa = _shard_dirs(Path(out_a), "f")
    fb = _shard_dirs(Path(out_b), "f")
    if not fa or not fb:
        raise FileNotFoundError(
            "missing kind=f fingerprint partials; run with emit_text_fingerprints=True"
        )
    if Path(out_a).resolve() == Path(out_b).resolve():
        return {"equal": True, "n_mismatched_keys": 0, "sample": []}
    overlap = set(fa) & set(fb)
    if overlap:
        raise ValueError(f"runs share fingerprint files: {sorted(overlap)[:3]}")
    tags = {f: "a" for f in fa} | {f: "b" for f in fb}

    def reduce_fn(df: pd.DataFrame) -> pa.Table:
        # duplicate keys within a run: combine to a set-fingerprint (sorted
        # hash tuple) so dup multiplicity differences also surface
        agg = (
            df.sort_values("cnt")
            .groupby(["conv_id", "turn_idx", "src"], sort=False)["cnt"]
            .apply(tuple)
            .unstack("src")
        )
        for side in ("a", "b"):
            if side not in agg.columns:
                agg[side] = None
        bad_mask = agg["a"].isna() | agg["b"].isna() | (agg["a"] != agg["b"])
        bad = agg[bad_mask].reset_index()[["conv_id", "turn_idx"]]
        return pa.table(
            {
                "conv_id": pa.array(bad["conv_id"], pa.string()),
                "turn_idx": pa.array(bad["turn_idx"].astype("int32")),
            }
        )

    mism = parquet_hash_exchange(
        list(tags), ["conv_id"], reduce_fn, num_buckets=64,
        columns=["conv_id", "turn_idx", "cnt"], file_tags=tags,
    )
    n = mism.num_rows if mism.num_rows else 0
    sample = (
        sorted(zip(mism["conv_id"].to_pylist(), mism["turn_idx"].to_pylist()))[:20]
        if n
        else []
    )
    return {"equal": n == 0, "n_mismatched_keys": int(n), "sample": sample}
