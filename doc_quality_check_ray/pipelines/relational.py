"""Relational operators over the TPC-H-ish side tables — broadcast dimension
joins and classic grouped aggregation, Ray-Data-first.

- :func:`q_pricing_summary` — the canonical filtered grouped aggregation
  (TPC-H Q1 shape): per-batch combiner → tiny hash exchange. Aggregates are
  integer-exact (quantities are integral, counts are counts) so the oracle
  hash cannot drift on float summation order.
- :func:`q_events_by_nation` — fact×dim×dim broadcast join: the two
  KB-scale dimension tables are composed into ONE lookup on the driver,
  ``ray.put`` once, and probed per batch with vectorized ``index_in``/
  ``take`` (ray_guide.md "Joins and lookups": broadcast the small side, never
  shuffle the fact table for a dimension join). Distinct-user counting rides
  the same (key, user) dedup-exchange pattern as the windowed aggregate.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..stages.exchange import hash_bucket_aggregate

PRICING_CUTOFF = datetime.datetime(1998, 9, 2)


def q_pricing_summary(sf_dir: str):
    """(l_returnflag, l_linestatus, sum_qty, n) for shipments up to the
    cutoff — partial aggregation inside every batch, then a ≤9-group merge."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(PRICING_CUTOFF)))
        # quantities are integral-valued doubles; exact as int64
        qty = pc.cast(t["l_quantity"], pa.int64())
        g = (
            pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "l_linestatus": t["l_linestatus"],
                    "qty": qty,
                }
            )
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("qty", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["l_returnflag", "l_linestatus", "sum_qty", "n"])

    return hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": ("sum_qty", "sum"), "n": ("n", "sum")},
        num_buckets=4,
    )


SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       count(*) AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF:%Y-%m-%d}'
GROUP BY 1, 2
"""


def _nation_lookup(sf_dir: str):
    """custkey → nation-name lookup composed from the two dimension tables
    (driver-side; both are KB-scale)."""
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nk = pc.index_in(cust["c_nationkey"], value_set=nation["n_nationkey"].combine_chunks())
    names = pc.take(nation["n_name"].combine_chunks(), nk)
    return (
        pc.cast(cust["c_custkey"], pa.int64()).combine_chunks(),
        names.combine_chunks() if isinstance(names, pa.ChunkedArray) else names,
    )


def q_events_by_nation(sf_dir: str):
    """(n_name, n_events, n_users): every event joined to its user's nation
    via the broadcast lookup; inner-join semantics (unknown users dropped)."""
    keys, names = _nation_lookup(sf_dir)
    lut_ref = ray.put((keys, names))

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        k, nm = ray.get(lut_ref)
        idx = pc.index_in(pc.cast(t["user_id"], pa.int64()), value_set=k)
        nation = pc.take(nm, idx)
        g = (
            pa.table({"n_name": nation, "user_id": t["user_id"]})
            .filter(pc.is_valid(nation))
            .group_by(["n_name", "user_id"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["n_name", "user_id", "n"])

    per_user = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["n_name", "user_id"],
        {"n": ("n", "sum")},
        num_buckets=16,
    )

    def rollup(t: pa.Table) -> pa.Table:
        g = t.group_by("n_name").aggregate([("n", "sum"), ([], "count_all")])
        return g.rename_columns(["n_name", "n_events", "n_users"])

    # (n_name, user) pairs are globally unique after the exchange → block
    # rollups are disjoint partials; final merge bounded by nations × blocks
    parts = per_user.map_batches(rollup, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("n_name", as_index=False)[["n_events", "n_users"]]
        .sum()
        .sort_values("n_name", ignore_index=True)
    )
    return pa.table(
        {
            "n_name": pa.array(out["n_name"], pa.string()),
            "n_events": pa.array(out["n_events"].astype("int64")),
            "n_users": pa.array(out["n_users"].astype("int64")),
        }
    )


SQL_EVENTS_BY_NATION = """
SELECT n.n_name, count(*) AS n_events, count(DISTINCT e.user_id) AS n_users
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""
