"""Inventory discipline: every driver query either has a DuckDB oracle or
is on the explicit rows-only allowlist (sketches/ANN + their meters, each
justified in COVERAGE.md). A new query without an oracle must be added
here deliberately — no silent no-oracle rows."""

import importlib


ROWS_ONLY_ALLOWLIST = {
    # approximate operators (no SQL analog) ...
    "d_minhash_pairs",
    "d_simhash_pairs",
    "d_winnow_pairs",
    "d_lsh_near_dup",
    "d_ivf_knn",
    "d_pq_knn",
    # ... their driver-visible accuracy meters (exact twin computed inside)
    "d_minhash_recall",
    "d_simhash_recall",
    "d_winnow_recall",
    "d_lsh_recall",
    "d_ivf_recall",
    "d_pq_recall",
    "d_ivf_probe_sweep",
    "d_edit_distance_recall",
    # mergeable sketches with meters
    "t_hll_distinct",
    "d_bloom_decontaminate",
    "t_heavy_hitters",
    "t_heavy_hitters_recall",
    # pytest-pinned (no SQL zlib)
    "t_compression_ratio",
    # t-digest sketch accuracy meter (exact twin computed inside; no SQL
    # analog for the sketch itself)
    "v_tdigest_quantile_error",
}


def test_every_query_is_oracle_backed_or_allowlisted():
    m = importlib.import_module("__ray_entry__")
    queries = set(m.queries())
    oracles = set(m.oracle_sql())
    assert oracles <= queries, sorted(oracles - queries)
    missing = queries - oracles - ROWS_ONLY_ALLOWLIST
    assert not missing, f"queries without oracle or allowlist entry: {sorted(missing)}"
    stale = ROWS_ONLY_ALLOWLIST - queries
    assert not stale, f"allowlist entries no longer in queries(): {sorted(stale)}"
    overlap = ROWS_ONLY_ALLOWLIST & oracles
    assert not overlap, f"allowlisted but actually oracle-backed: {sorted(overlap)}"


def test_driver_sample_window_is_oracle_backed():
    # the driver hash-verifies only the first 50 queries() entries — keep
    # that window 100% oracle-backed so every sampled row is a hard check
    # (rows-only meters ride later in the dict)
    m = importlib.import_module("__ray_entry__")
    first = list(m.queries())[:50]
    oracles = set(m.oracle_sql())
    not_backed = [k for k in first if k not in oracles]
    assert not not_backed, f"first-50 sample has no-oracle rows: {not_backed}"


def test_r5_window_completes_cumulative_driver_verification():
    # VERDICT r4 #1: the r5 window must contain every oracle-backed query
    # never driver-checked in r1–r4, so this round completes 128/128
    # cumulative driver verification; the recorded cumulative set plus the
    # window must cover the whole oracle-backed inventory.
    m = importlib.import_module("__ray_entry__")
    window = list(m.queries())[:50]
    assert len(m._R5_FIRST_50) == 50 and window == m._R5_FIRST_50
    oracles = set(m.oracle_sql())
    checked = set(m._DRIVER_CHECKED_R1_R4)
    assert checked <= oracles, sorted(checked - oracles)
    never = oracles - checked
    missing = never - set(window)
    assert not missing, f"never-driver-checked queries outside the window: {sorted(missing)}"
