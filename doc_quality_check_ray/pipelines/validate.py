"""The validation pipeline — the engine's flagship entry points.

Shape (SURVEY.md §3.1 "new-engine shape")::

    read/derive transcripts
      → map_batches(row checks)                      (stateless, Arrow)
      → key_counts combiner → groupby uniqueness     (shuffle, keys only)
      → per-conversation contiguity from partials    (shuffle, partials only)
      → union violations → partition verdicts        (tiny)

Each ``q_*`` function is one driver-verifiable query: it takes ``sf_dir`` and
returns a Dataset / Arrow table whose DuckDB twin lives in
:mod:`doc_quality_check_ray.pipelines.oracle`.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import DEFAULT_CONFIG, ValidationConfig
from ..functions.rounding import (
    pc_round_half_away,
    round_half_away,
    round_half_away_scalar,
)
from ..stages.exchange import hash_bucket_aggregate
from ..sources.transcripts import derive_transcripts
from ..stages.keys import duplicate_keys, turn_gaps
from ..stages.row_checks import row_checks, verdicts
from ..stages.stats import column_stats


def q_row_violations(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    return row_checks(derive_transcripts(sf_dir), cfg)


def q_verdicts(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    return verdicts(derive_transcripts(sf_dir), cfg)


def q_duplicate_keys(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    return duplicate_keys(derive_transcripts(sf_dir), cfg)


def q_turn_gaps(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    return turn_gaps(derive_transcripts(sf_dir), cfg)


def q_column_stats(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    return column_stats(derive_transcripts(sf_dir), cfg)


def q_role_distribution(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Role frequency table — the analog of the reference's global
    keyword-frequency aggregation (``modules/identity_detection.py:261-327``).

    Per-batch combiner → groupby merge; shuffles one row per role per batch.
    """
    ds = derive_transcripts(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["role"])
            .group_by("role")
            .aggregate([([], "count_all")])
            .rename_columns(["role", "n"])
        )
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=cfg.batch_size)
    return hash_bucket_aggregate(partials, ["role"], {"n": ("n", "sum")}, num_buckets=8)


def q_role_drift(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG) -> pa.Table:
    """PSI of the role distribution between the even- and odd-numbered
    conversation halves (reference window vs current window).

    eps-smoothed over the union role domain; rounded to 6 decimals so the
    SQL oracle's float summation order cannot flip the hash.
    """
    from ..functions.sketches import psi

    ds = derive_transcripts(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        pid = partition_id_col(t["conv_id"], 2)
        half = pa.table(
            {"half": pid, "r": pc.fill_null(t["role"], "<null>")}
        )
        g = half.group_by(["half", "r"]).aggregate([([], "count_all")])
        return g.rename_columns(["half", "r", "n"])

    counts = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=cfg.batch_size),
        ["half", "r"],
        {"n": ("n", "sum")},
        num_buckets=8,
    ).to_pandas()
    domain = sorted(counts["r"].unique())
    even = counts[counts["half"] == 0].set_index("r")["n"]
    odd = counts[counts["half"] == 1].set_index("r")["n"]
    p = [int(even.get(r, 0)) for r in domain]
    q = [int(odd.get(r, 0)) for r in domain]
    return pa.table(
        {
            "psi_role": pa.array([round_half_away_scalar(psi(p, q), 6)], pa.float64()),
            "n_even": pa.array([int(sum(p))], pa.int64()),
            "n_odd": pa.array([int(sum(q))], pa.int64()),
        }
    )


def q_artifact_rows(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Per-row artifact-class breakdown — the ``get_artifact_types``
    classifier (reference ``utils/text_filter.py:154-191``) as a
    registry-driven row check: rows matching any configured artifact
    pattern, with ``detail`` listing every matched class in bank order.
    The check is registered but not in the default verdict set, so this
    query emits exactly its violation rows (engine and SQL twin both
    generated from the same registry entry)."""
    from ..stages.row_checks import ROW_CHECK_REGISTRY

    chk = ROW_CHECK_REGISTRY["artifact_text"]
    ds = derive_transcripts(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        return pa.concat_tables(chk.emit(t, cfg, {}))

    return ds.map_batches(
        fn, batch_format="pyarrow", batch_size=cfg.batch_size, zero_copy_batch=True
    )


TEXT_LEN_QUANTILES = (0.10, 0.25, 0.50, 0.75, 0.90, 0.99)
TS_QUANTILES = (0.10, 0.50, 0.90)


def _exact_quantiles_from_hist(hist, qs) -> list[int]:
    """Discrete quantiles (DuckDB ``quantile_disc`` semantics: sorted
    non-null element at 1-based index ceil(q·n)) from a (value, count)
    histogram sorted by value."""
    import numpy as np

    vals = hist["v"].to_numpy()
    cum = np.cumsum(hist["n"].to_numpy())
    total = int(cum[-1])
    out = []
    for q in qs:
        idx = min(max(int(np.ceil(np.float64(q) * total)), 1), total)
        out.append(int(vals[np.searchsorted(cum, idx)]))
    return out


def _exact_value_quantiles(
    ds: ray.data.Dataset, derive, qs, cfg: ValidationConfig
) -> list[int]:
    """Exact quantiles of an integer-valued column via a distributed
    (value → count) histogram: per-batch combiner → hash-bucket exchange →
    driver-side cumsum over the (bounded) distinct-value table.

    This is the *query-scale exact twin* of the run-path t-digest sketch
    (the reference's sorted-percentile table, ``tests/analyze_thresholds.py:
    107-113``, computes the same thing in-memory). It is exact whenever the
    distinct-value count is driver-sized (text lengths are band-limited;
    timestamps at query scale); the 100 TB manifest path keeps the t-digest
    (``stages/drift.py``), pinned against this exact twin in pytest.
    """

    def partial(t: pa.Table) -> pa.Table:
        v = derive(t)
        g = (
            pa.table({"v": v})
            .drop_null()
            .group_by("v")
            .aggregate([([], "count_all")])
            .rename_columns(["v", "n"])
        )
        return g

    hist = (
        hash_bucket_aggregate(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=cfg.batch_size),
            ["v"],
            {"n": ("n", "sum")},
            num_buckets=16,
        )
        .to_pandas()
        .sort_values("v", ignore_index=True)
    )
    return _exact_quantiles_from_hist(hist, qs)


def q_text_len_quantiles(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG) -> pa.Table:
    """Exact text-length quantiles (quantile_disc semantics) — the
    distributed analog of the reference's sorted-percentile table
    (``tests/analyze_thresholds.py:107-113``)."""
    ds = derive_transcripts(sf_dir).select_columns(["text"])
    vals = _exact_value_quantiles(
        ds, lambda t: pc.utf8_length(t["text"]), TEXT_LEN_QUANTILES, cfg
    )
    return pa.table(
        {
            "quantile": pa.array(list(TEXT_LEN_QUANTILES), pa.float64()),
            "text_len": pa.array(vals, pa.int64()),
        }
    )


def q_tdigest_quantile_error(
    sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG
) -> pa.Table:
    """Driver-visible accuracy meter for the run-path t-digest (the sketch
    the 100 TB stats snapshot ships instead of an exact value histogram —
    ``stages/drift.py``, ``state/snapshot.py``): per-batch digests over text
    length merge on the driver (bounded: one ~δ-centroid row per batch, the
    mergeable-sketch contract), estimated quantiles sit next to the exact
    histogram-exchange values, and the relative error is reported per
    quantile. Rows-only by design (a sketch has no SQL twin); pytest pins
    rel_err ≤ 2 % at every reported quantile."""
    import numpy as np

    from ..functions.sketches import TDigest

    ds = derive_transcripts(sf_dir).select_columns(["text"])

    def partial(t: pa.Table) -> pa.Table:
        lens = (
            pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        m, w = TDigest(cfg.tdigest_compression).add(lens).to_arrays()
        m, w = np.asarray(m, np.float64), np.asarray(w, np.float64)
        return pa.table(
            {
                "td_means": pa.array([m], pa.list_(pa.float64())),
                "td_weights": pa.array([w], pa.list_(pa.float64())),
                # content-derived sort key: t-digest merge is order-sensitive,
                # so the driver merge below sorts partials by these stats to
                # make the final digest independent of batch ARRIVAL order
                # (ADVICE r4: arrival-order merging could drift rel_err
                # against the 2 % pin)
                "td_wsum": pa.array([float(w.sum())], pa.float64()),
                "td_mwsum": pa.array([float((m * w).sum())], pa.float64()),
                "td_mfirst": pa.array(
                    [float(m[0]) if len(m) else 0.0], pa.float64()
                ),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=cfg.batch_size)
        .to_pandas()  # O(batches) sketch rows, KB-scale
        .sort_values(
            ["td_wsum", "td_mwsum", "td_mfirst"], kind="mergesort", ignore_index=True
        )
    )
    td = TDigest(cfg.tdigest_compression)
    for m, w in zip(rows["td_means"], rows["td_weights"]):
        td = td.merge(TDigest.from_arrays(m, w, cfg.tdigest_compression))

    exact = _exact_value_quantiles(
        ds, lambda t: pc.utf8_length(t["text"]), TEXT_LEN_QUANTILES, cfg
    )
    est = [td.quantile(q) for q in TEXT_LEN_QUANTILES]
    rel = [
        round(abs(e - x) / max(x, 1), 6) for e, x in zip(est, exact)
    ]
    return pa.table(
        {
            "quantile": pa.array(list(TEXT_LEN_QUANTILES), pa.float64()),
            "tdigest_len": pa.array([round(e, 3) for e in est], pa.float64()),
            "exact_len": pa.array(exact, pa.int64()),
            "rel_err": pa.array(rel, pa.float64()),
        }
    )


def q_ts_quantiles(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG) -> pa.Table:
    """Exact timestamp quantiles as epoch-microseconds (quantile_disc
    semantics) — the exact twin of the stats snapshot's ts t-digest."""
    ds = derive_transcripts(sf_dir).select_columns(["ts"])
    vals = _exact_value_quantiles(
        ds, lambda t: pc.cast(t["ts"], pa.int64()), TS_QUANTILES, cfg
    )
    return pa.table(
        {
            "quantile": pa.array(list(TS_QUANTILES), pa.float64()),
            "ts_epoch_us": pa.array(vals, pa.int64()),
        }
    )


#: trailing RANGE window width (turn_idx units) for the rolling text-length
#: aggregate; RANGE (not ROWS) so duplicate (conv_id, turn_idx) keys — which
#: the corpus plants — get a deterministic, tie-insensitive frame.
ROLLING_RANGE = 2

#: Tukey-fence multiplier for the length-outlier gate. The classic 1.5 finds
#: nothing on this band-limited corpus (q1=175, q3=419, max 553), so the
#: fence is config-driven like every reference threshold (config.json:58-101).
FENCE_MULT = 0.25


def q_rolling_text_len(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Per-turn trailing windowed aggregate: sum of text lengths over the
    RANGE ``[turn_idx - ROLLING_RANGE, turn_idx]`` within each conversation —
    the per-group sliding window the reference's pairwise repair pass walks
    row-by-row (A4, ``identity_detection.py:189-259``), done set-at-a-time.

    Scale shape: lengths are computed at the scan (text never shuffles);
    conversations land whole in a conv-keyed bucket; inside a bucket the
    window is one composite-key ``searchsorted`` against a prefix-sum —
    no per-row or per-conversation Python loop. RANGE (peer-inclusive)
    semantics make the result deterministic under duplicate turn keys.
    """
    import numpy as np
    import pandas as pd

    ds = derive_transcripts(sf_dir).select_columns(["conv_id", "turn_idx", "text"])

    def bucketize(t: pa.Table) -> pa.Table:
        import polars as pl

        tl = pc.fill_null(pc.utf8_length(t["text"]), 0)
        slim = pa.table(
            {"conv_id": t["conv_id"], "turn_idx": t["turn_idx"], "text_len": tl}
        )
        h = pl.from_arrow(slim.select(["conv_id"])).hash_rows(seed=11).to_numpy()
        return slim.append_column(
            "bucket", pa.array((h % np.uint64(64)).astype(np.int64))
        )

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort", ignore_index=True)
        codes = pd.factorize(g["conv_id"], sort=False)[0].astype(np.int64)
        ti = g["turn_idx"].to_numpy().astype(np.int64)
        # sorted composite key: conversations separated by a 2^32 stride
        k = codes * (1 << 32) + ti
        pre = np.concatenate([[0], np.cumsum(g["text_len"].to_numpy(np.int64))])
        lo = np.searchsorted(k, k - ROLLING_RANGE, side="left")
        hi = np.searchsorted(k, k, side="right")
        return pd.DataFrame(
            {
                "conv_id": g["conv_id"],
                "turn_idx": g["turn_idx"],
                "win_text_len": pre[hi] - pre[lo],
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(window, batch_format="pandas")
    )


def q_len_outliers(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG) -> pa.Table:
    """Tukey-fence length outliers: rows whose text length falls outside
    ``[q1 - FENCE_MULT·IQR, q3 + FENCE_MULT·IQR]`` (exact quantile_disc
    quartiles), tagged 'low' / 'high' — the distribution-driven analog of the
    reference's fixed emptiness/readability thresholds (A8 percentile sweep,
    ``tests/analyze_thresholds.py:91-200``, feeding M13/M14-style gates).

    Two passes over the immutable input: the exact value-histogram exchange
    for the quartiles (bounded distinct lengths), then an embarrassingly
    parallel filter scan against the two broadcast scalar fences.
    """
    ds = derive_transcripts(sf_dir).select_columns(["conv_id", "turn_idx", "text"])
    q1, q3 = _exact_value_quantiles(
        ds, lambda t: pc.utf8_length(t["text"]), (0.25, 0.75), cfg
    )
    lo = q1 - FENCE_MULT * (q3 - q1)
    hi = q3 + FENCE_MULT * (q3 - q1)

    def gate(t: pa.Table) -> pa.Table:
        tl = pc.utf8_length(t["text"])
        is_lo = pc.less(tl, lo)
        is_hi = pc.greater(tl, hi)
        out = pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "text_len": pc.cast(tl, pa.int64()),
                "side": pc.if_else(is_lo, "low", "high"),
            }
        )
        # null text ⇒ null comparison ⇒ dropped (SQL WHERE semantics)
        return out.filter(pc.fill_null(pc.or_(is_lo, is_hi), False))

    return ds.map_batches(gate, batch_format="pyarrow", batch_size=cfg.batch_size)


def q_role_transitions(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Role Markov-transition counts: (prev_role, role, n) over consecutive
    turns within each conversation — the corpus-level sequencing profile the
    per-conversation repeat check (``q_role_sequences``) samples from.

    Conv-keyed exchange; inside a bucket one vectorized shift + pair count.
    Order ties (the planted duplicate keys) are byte-identical rows, so the
    pair counts are order-invariant — same argument as ``q_role_sequences``.
    """
    import numpy as np
    import pandas as pd

    ds = derive_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "ts"]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(t.select(["conv_id"])).hash_rows(seed=11).to_numpy()
        return t.append_column(
            "bucket", pa.array((h % np.uint64(64)).astype(np.int64))
        )

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
        prev = g.groupby("conv_id", sort=False)["role"].shift()
        pairs = pd.DataFrame({"prev_role": prev, "role": g["role"]})
        pairs = pairs[pairs["prev_role"].notna()]
        out = (
            pairs.groupby(["prev_role", "role"], sort=False, dropna=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return out

    partials = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(transitions, batch_format="pandas")
    )
    return hash_bucket_aggregate(
        partials, ["prev_role", "role"], {"n": ("n", "sum")}, num_buckets=4
    )


def q_tool_chain_stats(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Tool-call chain profile: per conversation, the number of maximal runs
    of consecutive ``role='tool'`` turns and the longest such run —
    (conv_id, n_chains, max_chain) for conversations with ≥1 tool turn.
    The agent-transcript diagnostic for tool-use structure: long chains are
    multi-step tool loops, many short chains are scattered single calls.

    Conv-keyed bucket exchange (each conversation lands whole in one
    bucket); inside a bucket one mergesort + a vectorized gaps-and-islands
    pass (run starts via a shifted boolean, lengths via ``bincount`` —
    no Python loop over turns). Null/other roles break runs on both twins;
    duplicate-key tie rows are byte-identical, so tie order cannot change
    any run length (the ``q_role_transitions`` argument)."""
    import numpy as np
    import pandas as pd

    ds = derive_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "ts"]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(t.select(["conv_id"])).hash_rows(seed=11).to_numpy()
        return t.append_column(
            "bucket", pa.array((h % np.uint64(64)).astype(np.int64))
        )

    def chains(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        is_tool = (g["role"] == "tool").to_numpy()
        if not is_tool.any():
            return pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype=object),
                    "n_chains": pd.Series(dtype=np.int64),
                    "max_chain": pd.Series(dtype=np.int64),
                }
            )
        new_conv = np.r_[True, conv[1:] != conv[:-1]]
        prev_tool = np.r_[False, is_tool[:-1]]
        start = is_tool & (new_conv | ~prev_tool)
        chain_id = np.cumsum(start)[is_tool]  # 1-based chain index per tool row
        lengths = np.bincount(chain_id)[1:]
        conv_of_chain = conv[is_tool][np.r_[True, chain_id[1:] != chain_id[:-1]]]
        df = pd.DataFrame({"conv_id": conv_of_chain, "chain_len": lengths})
        out = df.groupby("conv_id", sort=False, as_index=False).agg(
            n_chains=("chain_len", "size"), max_chain=("chain_len", "max")
        )
        return out.astype({"n_chains": "int64", "max_chain": "int64"})

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(chains, batch_format="pandas")
    )


def q_conversation_texts(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Ordered per-conversation text assembly: (conv_id, full_text) with
    turns joined by one space in stable (turn_idx, ts) order — the
    build-documents-from-turns step that feeds the corpus dedup/scoring
    family, and the reference's page→document reconstruction analog.

    Conv-keyed bucket exchange; inside a bucket one mergesort + per-GROUP
    join (work is per conversation, not per row — the inherent cost of
    string assembly). Null turns are skipped (SQL string_agg semantics);
    a conversation whose turns are all null yields NULL full_text on both
    twins. Duplicate-key tie rows are byte-identical, so tie order cannot
    change the assembled string.
    """
    import numpy as np
    import pandas as pd

    ds = derive_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "text", "ts"]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(t.select(["conv_id"])).hash_rows(seed=29).to_numpy()
        return t.append_column(
            "bucket", pa.array((h % np.uint64(64)).astype(np.int64))
        )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")

        def join(s: pd.Series):
            vals = s.dropna()
            return " ".join(vals) if len(vals) else None

        out = (
            g.groupby("conv_id", sort=False)["text"].agg(join).rename("full_text")
        )
        return out.reset_index()

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(assemble, batch_format="pandas")
    )


GROUPED_QUANTILES = (0.50, 0.90)


def q_len_quantiles_by_source(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Exact per-group quantiles: (source, p50_len, p90_len) of document
    text lengths — the grouped form of the A8/A9 percentile table
    (``tests/analyze_thresholds.py:32-172``: per-category min/max/percentile
    stats). Distributed (source, length) → count histogram exchange; the
    driver finishes ≤ sources × distinct-lengths rows with the shared
    ``quantile_disc`` cumsum (the :func:`_exact_value_quantiles` argument,
    per group)."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"source": t["source"], "v": pc.utf8_length(t["text"])})
            .drop_null()
            .group_by(["source", "v"])
            .aggregate([([], "count_all")])
            .rename_columns(["source", "v", "n"])
        )
        return g

    hist = (
        hash_bucket_aggregate(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            ["source", "v"],
            {"n": ("n", "sum")},
            num_buckets=16,
        )
        .to_pandas()
        .sort_values(["source", "v"], ignore_index=True)
    )
    rows = []
    for src, grp in hist.groupby("source", sort=True):
        qs = _exact_quantiles_from_hist(
            pa.table({"v": grp["v"].to_numpy(), "n": grp["n"].to_numpy()}),
            GROUPED_QUANTILES,
        )
        rows.append((src, *qs))
    out = pd.DataFrame(rows, columns=["source", "p50_len", "p90_len"])
    return pa.table(
        {
            "source": pa.array(out["source"], pa.string()),
            "p50_len": pa.array(out["p50_len"].astype("int64")),
            "p90_len": pa.array(out["p90_len"].astype("int64")),
        }
    )


def q_drift_report(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG) -> pa.Table:
    """Corpus drift vs a snapshot of the same corpus' even-conversation half.

    The snapshot goes through the full persistence path (built → saved as
    JSON → reloaded, the production drift input) before the comparison.
    Exact SQL twin: ``oracle.sql_drift_report`` recomputes the role counts
    and the fixed-edge length histogram for both windows inline and applies
    the identical smoothed PSI/KL formula (A1+A2,
    ``modules/identity_detection.py:261-451``)."""
    import tempfile
    from pathlib import Path

    from ..state.snapshot import StatsSnapshot
    from ..stages.drift import build_snapshot, drift_report

    ds = derive_transcripts(sf_dir)

    def even_half(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(partition_id_col(t["conv_id"], 2), 0))

    snap = build_snapshot(
        ds.map_batches(even_half, batch_format="pyarrow", batch_size=cfg.batch_size),
        cfg,
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = Path(tmp) / "snapshot.json"
        snap.save(path)
        snap = StatsSnapshot.load(path)
    return drift_report(ds, snap, cfg)


def q_ts_regressions(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Per-conversation timestamp-monotonicity check: count of turns whose
    ``ts`` moves backwards in ``turn_idx`` order (the `ts_anomalies` fixture
    class; planted via the event_id % 113 shift).

    Ordered-within-group logic via the conv-bucket exchange: conversations
    land whole in a bucket, each bucket sorts and diffs vectorized.
    """
    import numpy as np
    import pandas as pd

    ds = derive_transcripts(sf_dir).select_columns(["conv_id", "turn_idx", "ts"])

    def bucketize(t: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(t.select(["conv_id"])).hash_rows(seed=11).to_numpy()
        return t.append_column("bucket", pa.array((h % np.uint64(64)).astype(np.int64)))

    def regress(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
        prev = g.groupby("conv_id", sort=False)["ts"].shift()
        bad = (g["ts"] < prev).fillna(False)
        out = (
            pd.DataFrame({"conv_id": g["conv_id"], "bad": bad})
            .groupby("conv_id", sort=False)["bad"]
            .sum()
            .reset_index(name="n_regressions")
        )
        out = out[out["n_regressions"] > 0]
        out["n_regressions"] = out["n_regressions"].astype("int64")
        return out

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(regress, batch_format="pandas")
    )


def q_role_sequences(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Per-conversation role-sequencing stats — the A4 pairwise-group-repair
    analog (``identity_detection.py:189-259``): count of consecutive
    same-role turn pairs (e.g. user→user) in ``turn_idx`` order.
    (conv_id, n_repeats) for conversations with at least one repeat."""
    import numpy as np
    import pandas as pd

    ds = derive_transcripts(sf_dir).select_columns(["conv_id", "turn_idx", "role", "ts"])

    def bucketize(t: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(t.select(["conv_id"])).hash_rows(seed=11).to_numpy()
        return t.append_column("bucket", pa.array((h % np.uint64(64)).astype(np.int64)))

    def repeats(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
        prev = g.groupby("conv_id", sort=False)["role"].shift()
        rep = (g["role"] == prev).fillna(False)
        out = (
            pd.DataFrame({"conv_id": g["conv_id"], "rep": rep})
            .groupby("conv_id", sort=False)["rep"]
            .sum()
            .reset_index(name="n_repeats")
        )
        out = out[out["n_repeats"] > 0]
        out["n_repeats"] = out["n_repeats"].astype("int64")
        return out

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(repeats, batch_format="pandas")
    )


def q_conversation_verdicts(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Per-conversation rollup of row verdicts — the grouped-top-1 analog
    (A3, ``app.py:463-501``): (conv_id, n_rows, n_bad_rows, passed)."""
    ds = verdicts(derive_transcripts(sf_dir), cfg)

    def partial(t: pa.Table) -> pa.Table:
        bad = pc.cast(pc.invert(t["valid"]), pa.int64())
        g = (
            pa.table({"conv_id": t["conv_id"], "bad": bad})
            .group_by("conv_id")
            .aggregate([([], "count_all"), ("bad", "sum")])
        )
        return g.rename_columns(["conv_id", "n_rows", "n_bad_rows"])

    rolled = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=cfg.batch_size),
        ["conv_id"],
        {"n_rows": ("n_rows", "sum"), "n_bad_rows": ("n_bad_rows", "sum")},
    )

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column("passed", pc.equal(t["n_bad_rows"], 0))

    return rolled.map_batches(finish, batch_format="pyarrow")


def q_worst_turns(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Per-conversation grouped argmin *with carried label* — the reference's
    top-1-per-page rollup that keeps the winning detection's name and score
    (A3, ``app.py:469-487``): for each conversation, the turn with the lowest
    coalesced valid-char ratio (null/empty text = -1.0, worst) and that
    turn's priority verdict reason. Ties break on (turn_idx, reason).

    Scale shape: per-batch local argmin (one candidate row per conversation
    per batch) → conv-keyed hash-bucket exchange → per-bucket argmin merge.
    Shuffle volume is candidates, not turns.
    """
    import pandas as pd

    from ..functions.quality import valid_char_ratio
    from ..stages.row_checks import verdict_batch

    ds = derive_transcripts(sf_dir)

    def _argmin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["score", "turn_idx", "reason"], kind="mergesort")
        return df.drop_duplicates("conv_id", keep="first")

    def partial(t: pa.Table) -> pa.Table:
        score = pc.fill_null(valid_char_ratio(t["text"]), -1.0)
        reason = verdict_batch(t, cfg)["reason"]
        df = pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "score": score,
                "reason": reason,
            }
        ).to_pandas()
        return pa.Table.from_pandas(_argmin(df), preserve_index=False)

    def bucketize(t: pa.Table) -> pa.Table:
        import numpy as np
        import polars as pl

        h = pl.from_arrow(t.select(["conv_id"])).hash_rows(seed=11).to_numpy()
        return t.append_column("bucket", pa.array((h % np.uint64(64)).astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = _argmin(g)[["conv_id", "turn_idx", "score", "reason"]].copy()
        out["worst_score"] = round_half_away(out.pop("score").to_numpy(), 6)
        return out[["conv_id", "turn_idx", "worst_score", "reason"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=cfg.batch_size)
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


def q_adjusted_scores(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Per-row quality score adjusted by the global role-frequency table —
    the literal two-phase analog of the reference's frequency-based
    confidence adjustment (A1+A2, ``modules/identity_detection.py:261-451``):
    phase B aggregates a small global table, phase C broadcasts it back into
    a per-row map (``ray.put`` once, dict lookup per batch).

    adjusted = round(0.7·valid_char_ratio + 0.3·role_share, 6)
    """
    import ray as _ray

    from ..functions.quality import valid_char_ratio

    ds = derive_transcripts(sf_dir)

    # phase B: global role frequencies (tiny)
    counts = q_role_distribution(sf_dir, cfg).to_pandas()
    total = int(counts["n"].sum())
    share = {r: int(n) / total for r, n in zip(counts["role"], counts["n"])}
    share_ref = _ray.put(share)

    # phase C: broadcast map (vectorized lookup: index_in + take)
    def adjust(t: pa.Table) -> pa.Table:
        sh = _ray.get(share_ref)
        keys = [k for k in sh if k is not None]
        vals = pa.array([sh[k] for k in keys], pa.float64())
        ratio = pc.fill_null(valid_char_ratio(t["text"]), 0.0)
        idx = pc.index_in(t["role"], value_set=pa.array(keys, pa.string()))
        role_share = pc.fill_null(pc.take(vals, idx), 0.0)
        adj = pc_round_half_away(
            pc.add(pc.multiply(ratio, 0.7), pc.multiply(role_share, 0.3)), 6
        )
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "adjusted_score": adj,
            }
        )

    return ds.map_batches(
        adjust, batch_format="pyarrow", batch_size=cfg.batch_size, zero_copy_batch=True
    )


SWEEP_THRESHOLDS = (0.1, 0.3, 0.5, 0.7, 0.9)


def q_threshold_sweep(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG) -> pa.Table:
    """Pass-rate table across candidate quality thresholds — the threshold
    sweep analog (A8, ``tests/analyze_thresholds.py:120-142``). One streaming
    pass computes every threshold's count from the same ratio column."""
    from ..functions.quality import valid_char_ratio

    ds = derive_transcripts(sf_dir).select_columns(["text"])

    def partial(t: pa.Table) -> pa.Table:
        ratio = valid_char_ratio(t["text"])
        counts = [
            pc.sum(
                pc.cast(pc.fill_null(pc.less(ratio, thr), False), pa.int64())
            ).as_py()
            or 0
            for thr in SWEEP_THRESHOLDS
        ]
        return pa.table(
            {
                "threshold": pa.array(SWEEP_THRESHOLDS, pa.float64()),
                "n_below": pa.array(counts, pa.int64()),
                "n_rows": pa.array([t.num_rows] * len(SWEEP_THRESHOLDS), pa.int64()),
            }
        )

    # merge the per-batch 5-row partials in the exchange, not on the driver
    # (O(batches) partial rows is 75M rows at 10^12 turns)
    merged = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=cfg.batch_size),
        ["threshold"],
        {"n_below": ("n_below", "sum"), "n_rows": ("n_rows", "sum")},
        num_buckets=4,
    ).to_pandas()
    return pa.Table.from_pandas(
        merged.sort_values("threshold", ignore_index=True), preserve_index=False
    )


def all_violations(
    ds: ray.data.Dataset, cfg: ValidationConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Union of every violation source in the shared violation-row format.

    Key findings (duplicates + gaps) come from ONE fused conv-keyed exchange
    (:func:`~doc_quality_check_ray.stages.keys.key_finding_violations`) —
    the previous three-lineage union re-derived the input once per family.
    """
    from ..stages.keys import key_finding_violations

    return row_checks(ds, cfg).union(key_finding_violations(ds, cfg))


def q_all_violations(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    return all_violations(derive_transcripts(sf_dir), cfg)


def partition_id_col(conv_id, n_partitions: int):
    """partition_id = numeric conv id % n_partitions (oracle-recomputable).

    At cluster scale this is a hash of conv_id; the modulo form exists so the
    SQL oracle can derive the identical id.
    """
    pid = pc.cast(pc.utf8_slice_codeunits(conv_id, 1, 2**31 - 1), pa.int64())
    return pc.subtract(pid, pc.multiply(pc.divide(pid, n_partitions), n_partitions))


def q_partition_verdicts(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG) -> pa.Table:
    """Per-partition pass/fail manifest (PARTITION_VERDICT_SCHEMA).

    Both sides (row counts, violation counts) are per-batch combined, grouped
    on the ≤``n_partitions`` partition ids, and merged driver-side — the
    output is bounded by the partition count, never by data size.
    """
    ds = derive_transcripts(sf_dir)
    npart = cfg.n_partitions

    def rows_partial(t: pa.Table) -> pa.Table:
        pid = partition_id_col(t["conv_id"], npart)
        g = (
            pa.table({"partition_id": pid})
            .group_by("partition_id")
            .aggregate([([], "count_all")])
            .rename_columns(["partition_id", "n"])
        )
        return g

    rows_per = hash_bucket_aggregate(
        ds.map_batches(rows_partial, batch_format="pyarrow", batch_size=cfg.batch_size),
        ["partition_id"],
        {"n": ("n", "sum")},
        num_buckets=8,
    ).to_pandas()
    viol_per = hash_bucket_aggregate(
        all_violations(ds, cfg).map_batches(
            rows_partial, batch_format="pyarrow", batch_size=cfg.batch_size
        ),
        ["partition_id"],
        {"n": ("n", "sum")},
        num_buckets=8,
    ).to_pandas()

    merged = rows_per.rename(columns={"n": "n_rows"}).merge(
        viol_per.rename(columns={"n": "n_violations"}), on="partition_id", how="left"
    )
    merged["n_violations"] = merged["n_violations"].fillna(0).astype("int64")
    merged["passed"] = merged["n_violations"] == 0
    merged = merged.sort_values("partition_id").reset_index(drop=True)
    return pa.table(
        {
            "partition_id": pa.array(merged["partition_id"].astype("int32")),
            "n_rows": pa.array(merged["n_rows"].astype("int64")),
            "n_violations": pa.array(merged["n_violations"]),
            "passed": pa.array(merged["passed"]),
        }
    )


def q_response_latency(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Per-conversation assistant response latency — the transcript-health
    meter for agent loops: for every assistant turn, latency = its ``ts``
    minus the previous turn's ``ts`` in ``turn_idx`` order (any role);
    aggregated per conversation as (conv_id, n_responses, total_latency_us,
    max_latency_us). All-integer µs arithmetic — no float drift.

    Ordered-within-group logic via the conv-bucket exchange (the
    ``q_ts_regressions`` pattern): conversations land whole in a bucket;
    each bucket sorts once and computes the lag vectorized. Negative
    latencies (the planted ts regressions) flow through unclamped — they
    are the signal the ts-monotonicity check reports.
    """
    import numpy as np
    import pandas as pd

    ds = derive_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "ts"]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(t.select(["conv_id"])).hash_rows(seed=11).to_numpy()
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "role": t["role"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "bucket": pa.array((h % np.uint64(64)).astype(np.int64)),
            }
        )

    def lat(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["conv_id", "turn_idx", "ts_us", "role"], kind="mergesort"
        )
        prev = g.groupby("conv_id", sort=False)["ts_us"].shift()
        mask = (g["role"] == "assistant") & prev.notna()
        d = pd.DataFrame(
            {
                "conv_id": g.loc[mask, "conv_id"],
                "lat": (g.loc[mask, "ts_us"] - prev[mask]).astype("int64"),
            }
        )
        out = (
            d.groupby("conv_id", sort=False)["lat"]
            .agg(n_responses="count", total_latency_us="sum", max_latency_us="max")
            .reset_index()
        )
        for c in ("n_responses", "total_latency_us", "max_latency_us"):
            out[c] = out[c].astype("int64")
        return out

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(lat, batch_format="pandas")
    )


#: repost-suppression window: a row whose identical text re-appears within
#: this many µs of its previous occurrence is a suppressed re-post
REPOST_WINDOW_US = 3_600_000_000


def q_repost_suppression(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Time-windowed duplicate suppression — the crawl/stream dedup rule
    "drop content re-posted within T of its last occurrence": for every turn
    whose exact text already appeared within the past hour, emit
    (conv_id, turn_idx, gap_us). Blank/null texts are exempt (they are the
    emptiness check's business).

    Scale shape: texts are md5-fingerprinted in the scan (32-byte keys move,
    never text — the ``d_exact_dedup`` argument: md5 collisions are
    negligible and the oracle recomputes the same grouping from raw text);
    fingerprint-bucket exchange, then each bucket sorts its runs once and
    lags vectorized. Identical shape to ``q_ts_regressions`` with fp instead
    of conv_id as the partition key.
    """
    import numpy as np
    import pandas as pd

    from ..functions.hashing import md5_fingerprints

    ds = derive_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "text", "ts"]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        import polars as pl

        nonblank = pc.and_(
            pc.is_valid(t["text"]), pc.not_equal(pc.fill_null(t["text"], ""), "")
        )
        t = t.filter(nonblank)
        fp = pa.array(md5_fingerprints(t["text"].to_pylist()), pa.string())
        h = pl.from_arrow(pa.table({"fp": fp})).hash_rows(seed=11).to_numpy()
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "fp": fp,
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "bucket": pa.array((h % np.uint64(64)).astype(np.int64)),
            }
        )

    def suppress(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["fp", "ts_us", "conv_id", "turn_idx"], kind="mergesort"
        )
        prev = g.groupby("fp", sort=False)["ts_us"].shift()
        gap = g["ts_us"] - prev
        hit = prev.notna() & (gap <= REPOST_WINDOW_US)
        out = pd.DataFrame(
            {
                "conv_id": g.loc[hit, "conv_id"],
                "turn_idx": g.loc[hit, "turn_idx"],
                "gap_us": gap[hit].astype("int64"),
            }
        )
        return out

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(suppress, batch_format="pandas")
    )


def q_dup_key_resolution(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Duplicate-key resolution (upsert compaction) — not just FINDING the
    planted duplicate (conv_id, turn_idx) keys but picking the winning row
    per key under a deterministic policy: latest ``ts``, then longest text,
    then role/text ascending. Emits (conv_id, turn_idx, role, ts_us,
    n_candidates) for every resolved multi-row key — what a compaction job
    would keep.

    Null-free total order: ts is µs int64, role is ''-coalesced, and the
    final tie-break is the md5 fingerprint of the text (32 bytes through
    the exchange instead of the text itself — raw text never shuffles;
    DuckDB orders by the same md5). Conv-bucket exchange (conversations
    land whole); each bucket sorts once and takes the per-key head
    vectorized.
    """
    import numpy as np
    import pandas as pd

    ds = derive_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "text", "ts"]
    )

    from ..functions.hashing import md5_fingerprints

    def bucketize(t: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(t.select(["conv_id"])).hash_rows(seed=11).to_numpy()
        text = pc.fill_null(t["text"], "")
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "role": pc.fill_null(t["role"], ""),
                "fp": pa.array(md5_fingerprints(text.to_pylist()), pa.string()),
                "text_len": pc.cast(pc.utf8_length(text), pa.int64()),
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "bucket": pa.array((h % np.uint64(64)).astype(np.int64)),
            }
        )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        counts = g.groupby(["conv_id", "turn_idx"], sort=False)[
            "ts_us"
        ].transform("size")
        g = g[counts > 1].copy()
        if g.empty:
            return pd.DataFrame(
                {
                    "conv_id": pd.array([], dtype="object"),
                    "turn_idx": pd.array([], dtype="int32"),
                    "role": pd.array([], dtype="object"),
                    "ts_us": pd.array([], dtype="int64"),
                    "n_candidates": pd.array([], dtype="int64"),
                }
            )
        g["n_candidates"] = (
            g.groupby(["conv_id", "turn_idx"], sort=False)["ts_us"]
            .transform("size")
            .astype("int64")
        )
        g = g.sort_values(
            ["conv_id", "turn_idx", "ts_us", "text_len", "role", "fp"],
            ascending=[True, True, False, False, True, True],
            kind="mergesort",
        )
        win = g.groupby(["conv_id", "turn_idx"], sort=False, as_index=False).head(1)
        return win[["conv_id", "turn_idx", "role", "ts_us", "n_candidates"]]

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
    )


def q_missing_turn_ranges(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Gap diagnostics beyond the count: the exact missing ``turn_idx``
    RANGES per conversation — for every adjacent pair of present turns with
    a hole between them, emit (conv_id, gap_start, gap_end) covering
    ``prev+1 .. cur-1``. What a repair job would re-request.

    Conv-bucket exchange; each bucket sorts its conversations once, lags
    over DISTINCT turn indices vectorized. (Planted gap conversations make
    the result nonzero; duplicate keys collapse via the distinct step so a
    duplicated turn can't fake a hole's edge.)
    """
    import numpy as np
    import pandas as pd

    ds = derive_transcripts(sf_dir).select_columns(["conv_id", "turn_idx"])

    def bucketize(t: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(t.select(["conv_id"])).hash_rows(seed=11).to_numpy()
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
                "bucket": pa.array((h % np.uint64(64)).astype(np.int64)),
            }
        )

    def ranges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["conv_id", "turn_idx"]).sort_values(
            ["conv_id", "turn_idx"], kind="mergesort"
        )
        prev = g.groupby("conv_id", sort=False)["turn_idx"].shift()
        hole = prev.notna() & (g["turn_idx"] - prev > 1)
        out = pd.DataFrame(
            {
                "conv_id": g.loc[hole, "conv_id"],
                "gap_start": (prev[hole] + 1).astype("int64"),
                "gap_end": (g.loc[hole, "turn_idx"] - 1).astype("int64"),
            }
        )
        return out

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(ranges, batch_format="pandas")
    )


def q_conversation_profile(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Per-conversation profile rollup — the bread-and-butter transcript
    view every downstream consumer joins against: turn count, per-role
    counts, time span, and text-mass stats per conversation.
    (conv_id, n_turns, n_user, n_assistant, n_tool, first_ts_us,
    last_ts_us, sum_text_len, max_text_len).

    Fully combiner-shaped: every statistic is mergeable, so each batch
    pre-aggregates to one partial row per conversation it touches (the
    shuffle carries ~n_convs-per-batch rows, never turns) and ONE conv-keyed
    hash-bucket exchange merges partials. Role counts use fixed role-class
    indicators (mergeable, unlike a distinct-role count).
    """
    import numpy as np

    ds = derive_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "text", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl

        text = pc.fill_null(t["text"], "")
        df = pl.DataFrame(
            {
                "conv_id": pl.from_arrow(
                    t["conv_id"].combine_chunks()
                    if isinstance(t["conv_id"], pa.ChunkedArray)
                    else t["conv_id"]
                ),
                "is_user": pl.from_arrow(
                    pc.cast(pc.equal(pc.fill_null(t["role"], ""), "user"), pa.int64())
                ),
                "is_assistant": pl.from_arrow(
                    pc.cast(
                        pc.equal(pc.fill_null(t["role"], ""), "assistant"), pa.int64()
                    )
                ),
                "is_tool": pl.from_arrow(
                    pc.cast(pc.equal(pc.fill_null(t["role"], ""), "tool"), pa.int64())
                ),
                "ts_us": pl.from_arrow(pc.cast(t["ts"], pa.int64())),
                "text_len": pl.from_arrow(pc.cast(pc.utf8_length(text), pa.int64())),
            }
        )
        agg = df.group_by("conv_id").agg(
            n_turns=pl.len().cast(pl.Int64),
            n_user=pl.col("is_user").sum(),
            n_assistant=pl.col("is_assistant").sum(),
            n_tool=pl.col("is_tool").sum(),
            first_ts_us=pl.col("ts_us").min(),
            last_ts_us=pl.col("ts_us").max(),
            sum_text_len=pl.col("text_len").sum(),
            max_text_len=pl.col("text_len").max(),
        )
        return agg.to_arrow()

    return hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["conv_id"],
        {
            "n_turns": ("n_turns", "sum"),
            "n_user": ("n_user", "sum"),
            "n_assistant": ("n_assistant", "sum"),
            "n_tool": ("n_tool", "sum"),
            "first_ts_us": ("first_ts_us", "min"),
            "last_ts_us": ("last_ts_us", "max"),
            "sum_text_len": ("sum_text_len", "sum"),
            "max_text_len": ("max_text_len", "max"),
        },
        num_buckets=64,
    )


def q_bucket_balance(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Partition-skew observability — the report that makes "partitioning /
    shuffle / skew handled explicitly" inspectable: assign every turn to a
    16-way conversation bucket by the first hex digit of md5(conv_id) (a
    DuckDB-reproducible stand-in for the engine's exchange hash) and emit
    per-bucket (bucket, n_rows, n_convs). A hot conversation shows up as a
    bucket whose n_rows outruns its n_convs share.

    Combiner-shaped: per-batch per-bucket (rows, distinct-conv partials as
    (bucket, conv) pairs) → one tiny keyed exchange. Distinct convs per
    bucket are exact via the (bucket, conv) dedup exchange — conv_ids never
    leave as raw rows, only as distinct pairs.
    """
    import numpy as np
    import pandas as pd

    from ..functions.hashing import md5_fingerprints

    ds = derive_transcripts(sf_dir).select_columns(["conv_id"])

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl

        conv = t["conv_id"]
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        convs = conv.to_pylist()
        # vectorized hex-digit decode: truncate each fp to its first byte
        first = np.array(md5_fingerprints(convs), dtype="S1").view(np.uint8)
        first_hex = np.where(
            first >= ord("a"), first - ord("a") + 10, first - ord("0")
        ).astype(np.int64)
        df = pl.DataFrame({"bkt": first_hex, "conv_id": convs})
        agg = df.group_by(["bkt", "conv_id"]).agg(n_rows=pl.len().cast(pl.Int64))
        return agg.to_arrow()

    per_conv = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["bkt", "conv_id"],
        {"n_rows": ("n_rows", "sum")},
        num_buckets=8,
    )

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("bkt", sort=False, as_index=False).agg(
            n_rows=("n_rows", "sum"), n_convs=("conv_id", "size")
        )
        out = out.rename(columns={"bkt": "bucket"})
        for c in ("bucket", "n_rows", "n_convs"):
            out[c] = out[c].astype("int64")
        return out

    def bucketize2(t: pa.Table) -> pa.Table:
        return t.append_column(
            "b2", pc.cast(pc.bit_wise_and(t["bkt"], 3), pa.int64())
        )

    return (
        per_conv.map_batches(bucketize2, batch_format="pyarrow")
        .groupby("b2")
        .map_groups(rollup, batch_format="pandas")
    )


TRAIN_EXAMPLE_MAX_TOKENS = 48


def q_training_examples(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Chat-formatted training-example assembly — the transcript capstone:
    each conversation becomes one ``role: text`` line per non-null turn in
    stable (turn_idx, ts, line) order, newline-joined, then truncated to
    the first ``TRAIN_EXAMPLE_MAX_TOKENS`` whitespace tokens (context-window
    budgeting). Emits (conv_id, n_tokens_full, n_tokens_kept, example).

    Two stages: the conv-keyed assembly exchange (``q_conversation_texts``
    shape, with the line string itself as the order tie-break so duplicate
    keys with differing payloads still order identically on both twins),
    then an embarrassingly parallel vectorized truncation pass (regex
    split → list_slice → binary_join — no Python rows).
    """
    import numpy as np
    import pandas as pd

    ds = derive_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "text", "ts"]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        import polars as pl

        t = t.filter(pc.is_valid(t["text"]))
        line = pc.binary_join_element_wise(
            pc.fill_null(t["role"], ""), ": ", t["text"], ""
        )
        h = pl.from_arrow(t.select(["conv_id"])).hash_rows(seed=29).to_numpy()
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "ts": t["ts"],
                "line": line,
                "bucket": pa.array((h % np.uint64(64)).astype(np.int64)),
            }
        )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx", "ts", "line"], kind="mergesort")
        out = (
            g.groupby("conv_id", sort=False)["line"]
            .agg(lambda s: "\n".join(s))
            .rename("full")
        )
        return out.reset_index()

    assembled = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(assemble, batch_format="pandas")
    )

    def truncate(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["full"]), r"\s+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_full = pc.cast(pc.list_value_length(toks), pa.int64())
        sliced = pc.list_slice(toks, 0, TRAIN_EXAMPLE_MAX_TOKENS)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "n_tokens_full": n_full,
                "n_tokens_kept": pc.min_element_wise(
                    n_full, pa.scalar(TRAIN_EXAMPLE_MAX_TOKENS, pa.int64())
                ),
                "example": pc.binary_join(sliced, " "),
            }
        )

    return assembled.map_batches(truncate, batch_format="pyarrow", zero_copy_batch=True)


def q_conversation_digest(sf_dir: str, cfg: ValidationConfig = DEFAULT_CONFIG):
    """Per-conversation integrity digest — the driver-visible form of the
    north-rule per-turn text-equality invariant: md5 of the conversation's
    ordered text assembly, so two runs (or two engines) agree on a
    conversation iff their digests match. Emits (conv_id, n_turns, digest).

    Composes the ordered-assembly exchange with one md5 per conversation
    (C-backed, one call per GROUP, not per row). Null turns are skipped in
    the assembly exactly as ``string_agg`` does; all-null conversations
    digest the empty string on both twins.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    ds = derive_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "text", "ts"]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(t.select(["conv_id"])).hash_rows(seed=29).to_numpy()
        return t.append_column(
            "bucket", pa.array((h % np.uint64(64)).astype(np.int64))
        )

    def digest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx", "ts", "text"], kind="mergesort")

        def agg(s: pd.Series):
            vals = s.dropna()
            joined = " ".join(vals) if len(vals) else ""
            return pd.Series(
                {
                    "n_turns": np.int64(len(s)),
                    "digest": hashlib.md5(joined.encode("utf-8")).hexdigest(),
                }
            )

        out = g.groupby("conv_id", sort=False)["text"].apply(agg).unstack()
        out["n_turns"] = out["n_turns"].astype("int64")
        return out.reset_index()

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(digest, batch_format="pandas")
    )
