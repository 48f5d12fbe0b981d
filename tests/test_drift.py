"""Sketches + drift: t-digest accuracy/mergeability, PSI behavior, and the
actor-pool drift scan catching a planted distribution shift (the `drifted`
fixture of FIXTURES.md)."""

from __future__ import annotations

import numpy as np
import ray.data

from doc_quality_check_ray.config import ValidationConfig
from doc_quality_check_ray.functions.sketches import Histogram, TDigest, psi
from doc_quality_check_ray.stages.drift import build_snapshot, drift_report, drift_scan
from doc_quality_check_ray.synth import synth_transcripts


def test_tdigest_quantiles_accurate():
    rng = np.random.default_rng(0)
    data = rng.gamma(4.0, 50.0, 200_000)
    td = TDigest(200).add(data)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        exact = np.quantile(data, q)
        approx = td.quantile(q)
        assert abs(approx - exact) / exact < 0.02, (q, exact, approx)


def test_tdigest_merge_equals_bulk():
    rng = np.random.default_rng(1)
    data = rng.normal(100, 25, 100_000)
    parts = np.array_split(data, 13)
    merged = TDigest(200)
    for p in parts:
        merged = merged.merge(TDigest(200).add(p))
    bulk = TDigest(200).add(data)
    for q in (0.1, 0.5, 0.9):
        assert abs(merged.quantile(q) - bulk.quantile(q)) < np.std(data) * 0.05


def test_tdigest_pinned_to_exact_quantiles(sf_dir):
    """The run-path t-digest sketch must track the exact quantile twin
    (q_text_len_quantiles) — bounds the sketch error the manifest reports."""
    from doc_quality_check_ray.config import DEFAULT_CONFIG
    from doc_quality_check_ray.pipelines.validate import (
        TEXT_LEN_QUANTILES,
        q_text_len_quantiles,
    )
    from doc_quality_check_ray.sources.transcripts import derive_transcripts

    exact_t = q_text_len_quantiles(sf_dir)
    exact = dict(zip(exact_t["quantile"].to_pylist(), exact_t["text_len"].to_pylist()))
    snap = build_snapshot(derive_transcripts(sf_dir), DEFAULT_CONFIG)
    td = snap.tdigest()
    spread = max(exact[0.99] - exact[0.10], 1)
    for q in TEXT_LEN_QUANTILES:
        assert abs(td.quantile(q) - exact[q]) <= max(2.0, 0.05 * spread), (
            q, exact[q], td.quantile(q),
        )


def test_histogram_and_psi():
    edges = (0, 10, 20, 50)
    a = Histogram.of(np.array([1.0, 5, 15, 100]), edges)
    assert a.to_list() == [2, 1, 0, 1]
    assert psi(a.counts, a.counts) == 0.0
    b = Histogram.of(np.array([45.0] * 100), edges)
    assert psi(a.counts, b.counts) > 1.0


def test_drift_detected_on_shifted_corpus():
    cfg = ValidationConfig()
    clean, _ = synth_transcripts(n_convs=300, seed=2)
    snap = build_snapshot(ray.data.from_arrow(clean).repartition(4), cfg)

    # same generator, shifted parameterization: role mix 90/5/5, lengths 3x
    drifted, _ = synth_transcripts(
        n_convs=300, seed=3, role_weights=(0.90, 0.05, 0.05), length_scale=3.0
    )
    rep = drift_report(ray.data.from_arrow(drifted).repartition(4), snap, cfg)
    assert rep["drifted"][0].as_py() is True
    assert rep["psi_role"][0].as_py() > cfg.psi_threshold

    # self-comparison passes
    rep_self = drift_report(ray.data.from_arrow(clean).repartition(4), snap, cfg)
    assert rep_self["drifted"][0].as_py() is False


def test_drift_scan_actor_pool():
    cfg = ValidationConfig(batch_size=1024, drift_actor_pool=2)
    clean, _ = synth_transcripts(n_convs=200, seed=4)
    snap = build_snapshot(ray.data.from_arrow(clean).repartition(4), cfg)
    drifted, _ = synth_transcripts(
        n_convs=200, seed=5, role_weights=(0.95, 0.03, 0.02), length_scale=4.0
    )
    rows = drift_scan(
        ray.data.from_arrow(drifted).repartition(4), snap, cfg
    ).to_pandas()
    assert len(rows) >= 1
    assert rows["drifted"].all()
    assert rows["n_rows"].sum() == len(drifted)


def test_hll_conversation_estimate():
    """Merged per-batch HLL sketches estimate conv cardinality within ~5%."""
    from doc_quality_check_ray.stages.drift import build_snapshot

    table, _ = synth_transcripts(n_convs=2000, turns_per_conv=4, seed=8)
    snap = build_snapshot(ray.data.from_arrow(table).repartition(8), ValidationConfig())
    est = snap.n_convs_estimate()
    assert est is not None
    assert abs(est - 2000) / 2000 < 0.05
