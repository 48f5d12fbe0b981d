"""Event-stream operators over the ``events`` table.

- :func:`q_parse_props` — the key/value parser analog (M11,
  ``utils/content_extraction.py:150-189``): regex capture over a semi-
  structured string column, vectorized with ``pc.extract_regex``.
- :func:`q_user_sessions` — sessionization: the engine's windowed / ordered
  group operator (ray_guide.md "streaming-shaped workloads"): partition by
  key, sort by time within partition, break sessions on gaps > 30 min.
  Partitioning assumption (documented per SURVEY custom-operator rule): one
  user's events fit one task after per-batch combining.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.exchange import hash_bucket_aggregate

PROPS_K_RE2 = r'"k": (?P<k>\d+)'
SESSION_GAP_SEC = 1800


def q_parse_props(sf_dir: str):
    """(event_type, n, sum_k): parse ``props`` JSON-ish strings by regex
    capture and aggregate — all-Arrow, combiner + tiny exchange."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        k = pc.cast(
            pc.struct_field(pc.extract_regex(t["props"], PROPS_K_RE2), "k"),
            pa.int64(),
        )
        g = (
            pa.table({"event_type": t["event_type"], "k": k})
            .group_by("event_type")
            .aggregate([([], "count_all"), ("k", "sum")])
        )
        return g.rename_columns(["event_type", "n", "sum_k"])

    return hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        {"n": ("n", "sum"), "sum_k": ("sum_k", "sum")},
        num_buckets=4,
    )


def q_user_sessions(sf_dir: str):
    """(user_id, n_events, n_sessions): 30-min-gap sessionization per user."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid % 64).astype(np.int64)))

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = g.groupby("user_id", sort=False)["ts"].shift()
        # exact interval comparison (no truncation) to match the SQL oracle
        gap = (g["ts"] - prev) > pd.Timedelta(seconds=SESSION_GAP_SEC)
        out = (
            pd.DataFrame({"user_id": g["user_id"], "brk": gap.fillna(False)})
            .groupby("user_id", sort=False)
            .agg(n_events=("brk", "size"), brk=("brk", "sum"))
            .reset_index()
        )
        out["n_sessions"] = (out.pop("brk") + 1).astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "n_events", "n_sessions"]]

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(sessions, batch_format="pandas")
    )


SQL_PARSE_PROPS = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT))
            AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""

SQL_USER_SESSIONS = f"""
SELECT user_id, count(*) AS n_events,
       CAST(1 + sum(CASE WHEN prev IS NOT NULL
                          AND ts - prev > INTERVAL {SESSION_GAP_SEC} SECONDS
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
) GROUP BY user_id
"""


def q_hourly_event_counts(sf_dir: str):
    """Tumbling-window aggregate: events per hour with distinct-user counts —
    the engine's windowed-aggregate operator (brief: "a streaming window").
    Two-stage: per-batch (hour, user) partials → (hour, user) exchange
    (dedup+count) → tiny hour-level rollup. Shuffle volume is distinct
    (hour, user) pairs per batch, never raw events."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        g = (
            pa.table({"hour": hour, "user_id": t["user_id"]})
            .group_by(["hour", "user_id"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["hour", "user_id", "n"])

    per_user = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["hour", "user_id"],
        {"n": ("n", "sum")},
        num_buckets=32,
    )

    def rollup(t: pa.Table) -> pa.Table:
        g = t.group_by("hour").aggregate([("n", "sum"), ([], "count_all")])
        return g.rename_columns(["hour", "n", "n_users"])

    # each (hour, user) pair exists exactly once after the exchange, so
    # block-level rollups are disjoint partials — the final merge is bounded
    # by hours × blocks (KB-scale), no second exchange needed
    parts = per_user.map_batches(rollup, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("hour", as_index=False)[["n", "n_users"]]
        .sum()
        .sort_values("hour", ignore_index=True)
    )
    return pa.table(
        {
            "hour": pa.array(out["hour"], pa.timestamp("us")),
            "n": pa.array(out["n"].astype("int64")),
            "n_users": pa.array(out["n_users"].astype("int64")),
        }
    )


SQL_HOURLY_EVENT_COUNTS = """
SELECT date_trunc('hour', ts) AS hour,
       count(*) AS n,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


#: trailing window width for the sliding aggregate (hours)
SLIDING_HOURS = 3


def q_sliding_event_counts(sf_dir: str):
    """Sliding-window aggregate: per hour bucket, the event count of the
    trailing 3-hour window ending at that hour — RANGE (timestamp) window
    semantics, so gaps in the hour sequence are handled like SQL's
    ``RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW``.

    Shape: the distributed tumbling pipeline (per-batch combiner →
    hour-keyed exchange) produces the bounded hour table; the window fold
    runs on the driver over that table (hours = time-range/3600 — KB-scale
    even at years of data; a decade is <90k rows). Output:
    (hour, n, n_window)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        g = (
            pa.table({"hour": hour})
            .group_by("hour")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["hour", "n"])

    hourly = (
        hash_bucket_aggregate(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            ["hour"],
            {"n": ("n", "sum")},
            num_buckets=16,
        )
        .to_pandas()
        .sort_values("hour", ignore_index=True)
    )
    hs = hourly["hour"].to_numpy().astype("datetime64[us]").astype(np.int64)
    counts = hourly["n"].to_numpy().astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(counts)])
    lo = np.searchsorted(hs, hs - (SLIDING_HOURS - 1) * 3_600_000_000, side="left")
    n_window = cum[np.arange(1, len(hs) + 1)] - cum[lo]
    return pa.table(
        {
            "hour": pa.array(hourly["hour"], pa.timestamp("us")),
            "n": pa.array(counts),
            "n_window": pa.array(n_window, pa.int64()),
        }
    )


SQL_SLIDING_EVENT_COUNTS = f"""
WITH h AS (
  SELECT date_trunc('hour', ts) AS hour, count(*) AS n FROM events GROUP BY 1
)
SELECT hour, n,
       CAST(sum(n) OVER (ORDER BY hour
            RANGE BETWEEN INTERVAL {SLIDING_HOURS - 1} HOUR PRECEDING
            AND CURRENT ROW) AS BIGINT) AS n_window
FROM h
"""


#: attribution window after each signup (seconds)
ATTRIB_WINDOW_SEC = 86_400


def q_signup_attribution(sf_dir: str):
    """Interval/range join: for every 'signup' event, the count and value-sum
    of the SAME user's events in the following window ``(ts, ts + 1 day]`` —
    the engine's range-join operator (brief: "range join" as a composition
    Ray Data lacks natively).

    Shape: hash-bucket co-partition by user (one exchange, both sides are
    the same table so it is one pass), then a per-task vectorized interval
    probe — each user's events are time-sorted once and every signup's
    window is resolved with two ``searchsorted`` calls on a composite
    (group, ts) key; window sums come from one ``np.add.reduceat`` pass.
    No row-pair materialization at any point. Partitioning assumption
    (documented per the custom-operator rule): one user's events fit one
    task; salt hot users by time-slice at scale. Sums are rounded half-away
    to 6 on both twins (accumulation-order ulps).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def bucketize(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid % 64).astype(np.int64)))

    win_us = ATTRIB_WINDOW_SEC * 1_000_000

    def attrib(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.rounding import round_half_away

        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        val = g["value"].to_numpy(dtype=np.float64)
        # composite key (group_index, ts - ts_min): SPAN > range + window
        # keeps every user's keys in a disjoint band, so one searchsorted
        # over the whole task resolves all per-user windows at once
        grp = np.r_[0, np.cumsum(uid[1:] != uid[:-1])].astype(np.int64)
        t0 = ts.min() if len(ts) else 0
        span = (ts.max() - t0 if len(ts) else 0) + win_us + 2
        key = grp * span + (ts - t0)
        is_s = (g["event_type"] == "signup").to_numpy()
        ks = key[is_s]
        lo = np.searchsorted(key, ks, side="right")
        hi = np.searchsorted(key, ks + win_us, side="right")
        vpad = np.r_[val, 0.0]
        idx = np.empty(2 * len(ks), dtype=np.int64)
        idx[0::2] = lo
        idx[1::2] = hi
        sums = (
            np.add.reduceat(vpad, idx)[0::2]
            if len(ks)
            else np.empty(0, dtype=np.float64)
        )
        sums = np.where(hi > lo, sums, 0.0)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[is_s],
                "n_follow": (hi - lo).astype("int64"),
                "follow_value": round_half_away(sums, 6),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(attrib, batch_format="pandas")
    )


SQL_SIGNUP_ATTRIBUTION = f"""
SELECT s.event_id,
       CAST(count(e.event_id) AS BIGINT) AS n_follow,
       round(coalesce(sum(e.value), 0.0), 6) AS follow_value
FROM events s LEFT JOIN events e
  ON e.user_id = s.user_id
 AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL {ATTRIB_WINDOW_SEC} SECONDS
WHERE s.event_type = 'signup'
GROUP BY s.event_id
"""


def q_asof_last_signup(sf_dir: str):
    """As-of join: for every event, the most recent prior-or-equal 'signup'
    timestamp of the same user — the engine's range/as-of join operator
    (ray_guide.md "joins": sort both sides by (key, ts) within key buckets,
    ``pd.merge_asof`` per bucket). Partitioning assumption: one user's
    events fit one bucket task.

    Output: (event_id, last_signup_ts nullable).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid % 64).astype(np.int64)))

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        left = g.sort_values(["ts", "event_id"], kind="mergesort")
        right = (
            g[g["event_type"] == "signup"][["user_id", "ts"]]
            .sort_values("ts", kind="mergesort")
            .rename(columns={"ts": "last_signup_ts"})
        )
        out = pd.merge_asof(
            left, right, left_on="ts", right_on="last_signup_ts",
            by="user_id", direction="backward",
        )
        return out[["event_id", "last_signup_ts"]]

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(asof, batch_format="pandas")
    )


SQL_ASOF_LAST_SIGNUP = """
SELECT e.event_id, s.ts AS last_signup_ts
FROM events e ASOF LEFT JOIN
     (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND e.ts >= s.ts
"""


FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel_counts(sf_dir: str):
    """Ordered conversion funnel over the event stream: users with a view,
    users whose first click follows their first view, users whose first
    purchase then follows that click — the product-analytics staple, done
    with per-user first-touch timestamps instead of row-by-row scanning.

    Scale shape: per-batch (user, stage) min-ts combiner → user-keyed hash
    exchange (min merge) → per-bucket vectorized pivot + stage predicates →
    driver sums B 3-row partials. Only (user, stage, ts) triples shuffle.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=pa.array(list(FUNNEL_STAGES))))
        g = (
            t.select(["user_id", "event_type", "ts"])
            .group_by(["user_id", "event_type"])
            .aggregate([("ts", "min")])
        )
        return g.rename_columns(["user_id", "event_type", "first_ts"])

    firsts = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "event_type"],
        {"first_ts": ("first_ts", "min")},
        num_buckets=16,
    )

    def stage_partial(g: pd.DataFrame) -> pd.DataFrame:
        p = g.pivot_table(
            index="user_id", columns="event_type", values="first_ts", aggfunc="min"
        )
        for s in FUNNEL_STAGES:
            if s not in p.columns:
                p[s] = pd.NaT
        s1 = p["view"].notna()
        s2 = s1 & (p["click"] > p["view"])
        s3 = s2 & (p["purchase"] > p["click"])
        return pd.DataFrame(
            {
                "stage": ["view", "view>click", "view>click>purchase"],
                "n_users": [int(s1.sum()), int(s2.sum()), int(s3.sum())],
            }
        )

    # users are disjoint across buckets → the ≤16 3-row partials sum exactly
    import numpy as np

    def bucketize(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("b2", pa.array((uid % 8).astype(np.int64)))

    parts = (
        firsts.map_batches(bucketize, batch_format="pyarrow")
        .groupby("b2")
        .map_groups(stage_partial, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("stage", as_index=False)["n_users"].sum()
    order = {"view": 0, "view>click": 1, "view>click>purchase": 2}
    out = out.sort_values("stage", key=lambda s: s.map(order), ignore_index=True)
    return pa.table(
        {
            "stage": pa.array(out["stage"], pa.string()),
            "n_users": pa.array(out["n_users"].astype("int64")),
        }
    )


SQL_FUNNEL_COUNTS = """
WITH m AS (
  SELECT user_id,
         min(ts) FILTER (event_type = 'view') AS tv,
         min(ts) FILTER (event_type = 'click') AS tc,
         min(ts) FILTER (event_type = 'purchase') AS tp
  FROM events GROUP BY 1
)
SELECT 'view' AS stage, count(*) AS n_users FROM m WHERE tv IS NOT NULL
UNION ALL
SELECT 'view>click', count(*) FROM m WHERE tv IS NOT NULL AND tc > tv
UNION ALL
SELECT 'view>click>purchase', count(*) FROM m
WHERE tv IS NOT NULL AND tc > tv AND tp > tc
"""


def q_cohort_retention(sf_dir: str):
    """Daily cohort-retention triangle: (cohort_day, day_offset, n_users) =
    distinct users whose FIRST event fell on cohort_day and who were active
    day_offset days later — the product-analytics retention matrix, built
    without any per-user driver loop.

    Scale shape: ONE user-keyed exchange — a user's whole history lands in
    one bucket, so the first-touch cohort is an in-bucket grouped min (no
    separate cohort-table exchange, no join). The shuffle carries per-batch
    (user, day, min-ts) combiner partials, not raw events; each bucket
    re-merges them, derives (cohort_day, day_offset, user) triples —
    distinct by construction — and collapses to local counts (a user lives
    in exactly one bucket, so partial distinct-user counts sum exactly);
    a final tiny (cohort, offset) exchange merges.
    """
    import polars as pl

    num_buckets = 16
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = (
            pa.table(
                {"user": pc.cast(t["user_id"], pa.int64()), "day": day, "mn": t["ts"]}
            )
            .group_by(["user", "day"])
            .aggregate([("mn", "min")])
        ).rename_columns(["user", "day", "mn"])
        h = pl.from_arrow(g.select(["user"])).hash_rows(seed=17).to_numpy()
        return g.append_column(
            "__b", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def retention(g: pd.DataFrame) -> pd.DataFrame:
        # re-merge batch partials, then first-touch per user in place
        gg = g.groupby(["user", "day"], as_index=False)["mn"].min()
        cohort = gg.groupby("user", sort=False)["mn"].transform("min").dt.floor("D")
        off = (gg["day"] - cohort).dt.days
        out = (
            pd.DataFrame({"cohort_day": cohort, "day_offset": off})
            .groupby(["cohort_day", "day_offset"], sort=False, dropna=False)
            .size()
            .rename("n_users")
            .reset_index()
        )
        out["day_offset"] = out["day_offset"].astype("int64")
        out["n_users"] = out["n_users"].astype("int64")
        return out

    partials = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(retention, batch_format="pandas")
    )
    return hash_bucket_aggregate(
        partials,
        ["cohort_day", "day_offset"],
        {"n_users": ("n_users", "sum")},
        num_buckets=4,
    )


SQL_COHORT_RETENTION = """
WITH f AS (
  SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
  FROM events GROUP BY 1
)
SELECT f.cohort_day,
       CAST(datediff('day', f.cohort_day, date_trunc('day', e.ts)) AS BIGINT)
         AS day_offset,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN f USING (user_id)
GROUP BY 1, 2
"""


def q_user_arrival_rate(sf_dir: str):
    """Per-user mean inter-event time — arrival-rate estimation, exact from
    a pure combiner: the gaps telescope, so ``mean_gap = (max_ts − min_ts) /
    (n − 1)`` needs only (min, max, count) per user — no ordering, no
    per-event state, fully mergeable. Emits (user_id, n_events,
    span_us, mean_gap_us) for users with ≥ 2 events; all-integer µs except
    the one final division, written identically on both twins.
    """
    import numpy as np
    import pandas as pd

    from ..functions.rounding import round_half_away

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame(
            {
                "user_id": pl.from_arrow(
                    t["user_id"].combine_chunks()
                    if isinstance(t["user_id"], pa.ChunkedArray)
                    else t["user_id"]
                ),
                "ts_us": pl.from_arrow(pc.cast(t["ts"], pa.int64())),
            }
        )
        return df.group_by("user_id").agg(
            n=pl.len().cast(pl.Int64),
            lo=pl.col("ts_us").min(),
            hi=pl.col("ts_us").max(),
        ).to_arrow()

    merged = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        {"n": ("n", "sum"), "lo": ("lo", "min"), "hi": ("hi", "max")},
        num_buckets=16,
    )

    def final(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = t["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = t["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n >= 2
        span = hi[keep] - lo[keep]
        mean_gap = round_half_away(span / (n[keep] - 1).astype(np.float64), 6)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(uid[keep].astype(np.int64)),
                "n_events": pa.array(n[keep]),
                "span_us": pa.array(span),
                "mean_gap_us": pa.array(mean_gap, pa.float64()),
            }
        )

    return merged.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)
