"""Distribution-drift checks — snapshot build + broadcast actor-pool compare.

Structure mirrors the reference's two-phase pattern exactly
(SURVEY.md §3.3 phases B/C):

- **Phase B (global aggregate)**: one streaming pass emits a tiny mergeable
  sketch row per batch (role counts, length histogram, t-digest); the driver
  tree-merges them into a :class:`~doc_quality_check_ray.state.snapshot.StatsSnapshot`
  — the analog of ``_analyze_keyword_frequency`` over all classifications
  (``modules/identity_detection.py:261-327``).
- **Phase C (broadcast map)**: :class:`DriftChecker` is a callable class run
  as a ``map_batches`` **actor pool**; the snapshot is ``ray.put`` once and
  fetched in ``__init__`` (once per actor, never per batch) — the analog of
  ``_apply_frequency_based_adjustment`` (``:329-451``) and the T1 "load the
  engine once per worker" pattern (``app.py:13-105``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import DEFAULT_CONFIG, ValidationConfig
from ..functions.sketches import Histogram, TDigest, kl_divergence, psi
from ..state.snapshot import StatsSnapshot

NULL_ROLE = "<null>"


def _batch_sketch(t: pa.Table, cfg: ValidationConfig) -> dict:
    """One mergeable sketch row for one Arrow batch."""
    role = pc.fill_null(t["role"], NULL_ROLE)
    rc = (
        pa.table({"role": role})
        .group_by("role")
        .aggregate([([], "count_all")])
    )
    lens = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False).astype(np.float64)
    lens = lens[~np.isnan(lens)]
    hist = Histogram.of(lens, cfg.length_hist_buckets)
    td = TDigest(cfg.tdigest_compression).add(lens)
    means, weights = td.to_arrays()
    ts_min = pc.min(t["ts"]).as_py()
    ts_max = pc.max(t["ts"]).as_py()
    # timestamp-range sketch: t-digest over epoch-microseconds
    ts_us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
    ts_td = TDigest(cfg.tdigest_compression).add(ts_us)
    ts_means, ts_weights = ts_td.to_arrays()
    # conversation-cardinality sketch (HLL over conv_id hashes)
    import base64

    import polars as pl

    from ..functions.sketches import HyperLogLog

    conv_hashes = pl.from_arrow(pc.fill_null(t["conv_id"], "")).hash(seed=13).to_numpy()
    hll = HyperLogLog().add_hashes(conv_hashes)
    hll_b64 = base64.b64encode(hll.registers.tobytes()).decode()
    # hot-conversation probe: max multiplicity of one conv within this batch
    # (on the already-computed hashes; collisions only overestimate, which
    # errs toward the safe salted path). A conversation larger than a batch
    # fills at least one batch entirely, so the merged max detects it.
    if len(conv_hashes):
        _, cnts = np.unique(conv_hashes, return_counts=True)
        max_conv_batch = int(cnts.max())
    else:
        max_conv_batch = 0
    return {
        "hll": hll_b64,
        "max_conv_batch": max_conv_batch,
        "n_rows": t.num_rows,
        "role_keys": rc["role"].to_pylist(),
        "role_counts": rc["count_all"].to_pylist(),
        "max_len": int(lens.max()) if len(lens) else None,
        "hist": hist.to_list(),
        "td_means": means,
        "td_weights": weights,
        "ts_td_means": ts_means,
        "ts_td_weights": ts_weights,
        "ts_min": str(ts_min) if ts_min is not None else None,
        "ts_max": str(ts_max) if ts_max is not None else None,
    }


def sketch_partials(
    ds: ray.data.Dataset, cfg: ValidationConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        row = _batch_sketch(t, cfg)
        return pa.table({k: [v] for k, v in row.items()})

    return ds.map_batches(
        fn, batch_format="pyarrow", batch_size=cfg.batch_size, zero_copy_batch=True
    )


def merge_sketch_dicts(dicts, cfg: ValidationConfig) -> dict:
    """Merge N batch-sketch dicts into one (same shape as ``_batch_sketch``).

    Every field is mergeable: counts add, histograms add, t-digests merge,
    HLL registers max, min/max fold — so merging can happen at any level of
    a reduction tree (inside tasks per shard, then once across shards on the
    driver) and yields the same result as a flat merge.
    """
    import base64

    from ..functions.sketches import HyperLogLog

    roles: dict[str, int] = {}
    hist = Histogram.empty(cfg.length_hist_buckets)
    td = TDigest(cfg.tdigest_compression)
    ts_td = TDigest(cfg.tdigest_compression)
    hll = HyperLogLog()
    n, ts_min, ts_max = 0, None, None
    max_len = None
    max_conv_batch = 0
    for r in dicts:
        n += int(r["n_rows"])
        max_conv_batch = max(max_conv_batch, int(r.get("max_conv_batch") or 0))
        if r.get("hll"):
            np.maximum(
                hll.registers,
                np.frombuffer(base64.b64decode(r["hll"]), dtype=np.uint8),
                out=hll.registers,
            )
        if r.get("max_len") is not None:
            max_len = r["max_len"] if max_len is None else max(max_len, r["max_len"])
        for k, c in zip(r["role_keys"], r["role_counts"]):
            roles[k] = roles.get(k, 0) + int(c)
        hist = hist.merge(Histogram(cfg.length_hist_buckets, np.asarray(r["hist"])))
        td = td.merge(
            TDigest.from_arrays(r["td_means"], r["td_weights"], cfg.tdigest_compression)
        )
        ts_td = ts_td.merge(
            TDigest.from_arrays(
                r["ts_td_means"], r["ts_td_weights"], cfg.tdigest_compression
            )
        )
        if r["ts_min"] is not None:
            ts_min = r["ts_min"] if ts_min is None else min(ts_min, r["ts_min"])
        if r["ts_max"] is not None:
            ts_max = r["ts_max"] if ts_max is None else max(ts_max, r["ts_max"])
    means, weights = td.to_arrays()
    ts_means, ts_weights = ts_td.to_arrays()
    return {
        "hll": base64.b64encode(hll.registers.tobytes()).decode(),
        "max_conv_batch": int(max_conv_batch),
        "n_rows": int(n),
        "role_keys": list(roles.keys()),
        "role_counts": list(roles.values()),
        "max_len": max_len,
        "hist": hist.to_list(),
        "td_means": means,
        "td_weights": weights,
        "ts_td_means": ts_means,
        "ts_td_weights": ts_weights,
        "ts_min": ts_min,
        "ts_max": ts_max,
    }


def snapshot_from_sketch(d: dict, cfg: ValidationConfig) -> StatsSnapshot:
    roles = dict(zip(d["role_keys"], (int(c) for c in d["role_counts"])))
    return StatsSnapshot(
        n_rows=int(d["n_rows"]),
        role_counts=roles,
        length_edges=tuple(float(e) for e in cfg.length_hist_buckets),
        length_hist=[int(x) for x in d["hist"]],
        tdigest_means=d["td_means"],
        tdigest_weights=d["td_weights"],
        ts_min=d["ts_min"],
        ts_max=d["ts_max"],
        ts_tdigest_means=d.get("ts_td_means", []),
        ts_tdigest_weights=d.get("ts_td_weights", []),
        max_text_len=d.get("max_len"),
        hll_b64=d.get("hll"),
        max_conv_batch=d.get("max_conv_batch"),
    )


def build_snapshot(
    ds: ray.data.Dataset, cfg: ValidationConfig = DEFAULT_CONFIG
) -> StatsSnapshot:
    """Phase B: stream → per-batch sketches → TREE merge.

    A distributed reduce level (64 sketch rows → 1 inside tasks) bounds the
    driver's final merge at O(batches/64) — at 10^12 rows the driver never
    loops over millions of per-batch sketches.
    """

    def reduce_level(t: pa.Table) -> pa.Table:
        merged = merge_sketch_dicts(t.to_pylist(), cfg)
        return pa.table({k: [v] for k, v in merged.items()})

    rows = (
        sketch_partials(ds, cfg)
        .map_batches(reduce_level, batch_format="pyarrow", batch_size=64)
        .take_all()
    )
    return snapshot_from_sketch(merge_sketch_dicts(rows, cfg), cfg)


class DriftChecker:
    """Actor-pool stage: per-batch PSI against the broadcast snapshot.

    ``__init__`` runs once per actor (snapshot fetch + domain precompute);
    ``__call__`` runs per batch and emits one drift row. Used as::

        ds.map_batches(DriftChecker, fn_constructor_args=(snap_ref, cfg),
                       batch_format="pyarrow", concurrency=cfg.drift_actor_pool)
    """

    def __init__(self, snapshot_ref, cfg: ValidationConfig = DEFAULT_CONFIG):
        snap = ray.get(snapshot_ref) if isinstance(snapshot_ref, ray.ObjectRef) else snapshot_ref
        self.cfg = cfg
        self.domain = sorted(snap.role_counts)
        self.ref_roles = snap.role_vector(self.domain)
        self.ref_hist = snap.length_histogram().counts

    def __call__(self, t: pa.Table) -> pa.Table:
        sk = _batch_sketch(t, self.cfg)
        cur = np.zeros(len(self.domain), dtype=np.int64)
        dom_index = {r: i for i, r in enumerate(self.domain)}
        for k, c in zip(sk["role_keys"], sk["role_counts"]):
            if k in dom_index:
                cur[dom_index[k]] += int(c)
        psi_role = psi(cur, self.ref_roles)
        psi_len = psi(np.asarray(sk["hist"]), self.ref_hist)
        drifted = psi_role > self.cfg.psi_threshold or psi_len > self.cfg.psi_threshold
        return pa.table(
            {
                "n_rows": pa.array([t.num_rows], pa.int64()),
                "psi_role": pa.array([psi_role], pa.float64()),
                "psi_len": pa.array([psi_len], pa.float64()),
                "drifted": pa.array([drifted], pa.bool_()),
            }
        )


def drift_scan(
    ds: ray.data.Dataset,
    snapshot: StatsSnapshot,
    cfg: ValidationConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Phase C: per-batch drift rows via the actor pool (streaming)."""
    snap_ref = ray.put(snapshot)
    return ds.map_batches(
        DriftChecker,
        fn_constructor_args=(snap_ref, cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.drift_actor_pool,
        zero_copy_batch=True,
    )


def drift_report(
    ds: ray.data.Dataset,
    snapshot: StatsSnapshot,
    cfg: ValidationConfig = DEFAULT_CONFIG,
) -> pa.Table:
    """Corpus-level drift verdict: current global sketches vs snapshot.

    PSI/KL are rounded to 6 decimals (half-away, = DuckDB ``round()``) so
    the SQL twin (``oracle.sql_drift_report``) hashes identically; the
    drifted gate compares the UNROUNDED scores against the threshold, as
    does the twin."""
    from ..functions.rounding import round_half_away_scalar

    current = build_snapshot(ds, cfg)
    domain = sorted(set(snapshot.role_counts) | set(current.role_counts))
    p = current.role_vector(domain)
    q = snapshot.role_vector(domain)
    psi_role = psi(p, q)
    kl_role = kl_divergence(p, q)
    psi_len = psi(current.length_histogram().counts, snapshot.length_histogram().counts)
    return pa.table(
        {
            "n_rows": pa.array([current.n_rows], pa.int64()),
            "psi_role": pa.array([round_half_away_scalar(psi_role, 6)], pa.float64()),
            "kl_role": pa.array([round_half_away_scalar(kl_role, 6)], pa.float64()),
            "psi_len": pa.array([round_half_away_scalar(psi_len, 6)], pa.float64()),
            "drifted": pa.array(
                [psi_role > cfg.psi_threshold or psi_len > cfg.psi_threshold], pa.bool_()
            ),
        }
    )
