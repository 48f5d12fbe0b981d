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


def q_priority_returns(sf_dir: str):
    """(o_orderpriority, n_orders) for orders with at least one returned
    lineitem — the classic EXISTS semi-join (TPC-H Q4 shape).

    Scale design: neither side is broadcast (both fact tables grow with the
    data). Lineitem is filtered + per-batch deduped down to qualifying
    orderkeys, tagged, unioned with orders, and hash-bucketed by orderkey so
    each bucket performs a local vectorized semi-join; each bucket emits a
    ≤5-row priority histogram, and the driver merges B tiny partials.
    """
    import numpy as np
    import pandas as pd
    import polars as pl

    num_buckets = 32

    def _bucketed(keys: pa.Array, n: int) -> pa.Array:
        h = pl.from_arrow(pa.table({"k": keys})).hash_rows(seed=11).to_numpy()
        return pa.array((h % np.uint64(n)).astype(np.int64))

    def tag_orders(t: pa.Table) -> pa.Table:
        key = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "priority": t["o_orderpriority"],
                "__side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "__bucket": _bucketed(key, num_buckets),
            }
        )

    def tag_returned(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        key = pc.unique(pc.cast(t["l_orderkey"], pa.int64()))
        return pa.table(
            {
                "key": key,
                "priority": pa.nulls(len(key), pa.string()),
                "__side": pa.array(np.zeros(len(key), dtype=np.int8)),
                "__bucket": _bucketed(key, num_buckets),
            }
        )

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        qual = set(g.loc[g["__side"] == 0, "key"])
        hits = g[(g["__side"] == 1) & g["key"].isin(qual)]
        out = hits.groupby("priority", sort=False, dropna=False).size()
        return out.rename("n_orders").reset_index()

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    returned = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    ).map_batches(tag_returned, batch_format="pyarrow", zero_copy_batch=True)

    parts = (
        orders.union(returned)
        .groupby("__bucket")
        .map_groups(semi, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby("priority", as_index=False)["n_orders"]
        .sum()
        .sort_values("priority", ignore_index=True)
    )
    return pa.table(
        {
            "o_orderpriority": pa.array(out["priority"], pa.string()),
            "n_orders": pa.array(out["n_orders"].astype("int64")),
        }
    )


SQL_PRIORITY_RETURNS = """
SELECT o.o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
)
GROUP BY 1
"""


def q_customer_order_counts(sf_dir: str):
    """(c_count, n_custs): how many customers placed exactly c_count orders,
    zero included — the LEFT JOIN count distribution (TPC-H Q13 shape).

    Scale design: orders are pre-aggregated per batch to (custkey, partial
    count) so only combiner output shuffles; customers and partials are
    hash-bucketed by custkey, each bucket finishes the per-customer counts
    with missing customers defaulting to 0, then emits a local histogram;
    the driver merges B tiny histograms.
    """
    import numpy as np
    import pandas as pd
    import polars as pl

    num_buckets = 32

    def _bucketed(keys: pa.Array, n: int) -> pa.Array:
        h = pl.from_arrow(pa.table({"k": keys})).hash_rows(seed=11).to_numpy()
        return pa.array((h % np.uint64(n)).astype(np.int64))

    def tag_customers(t: pa.Table) -> pa.Table:
        key = pc.cast(t["c_custkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "n": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "__side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "__bucket": _bucketed(key, num_buckets),
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"key": pc.cast(t["o_custkey"], pa.int64())})
            .group_by("key")
            .aggregate([([], "count_all")])
        ).rename_columns(["key", "n"])
        return pa.table(
            {
                "key": g["key"],
                "n": pc.cast(g["n"], pa.int64()),
                "__side": pa.array(np.zeros(g.num_rows, dtype=np.int8)),
                "__bucket": _bucketed(g["key"], num_buckets),
            }
        )

    def histo(g: pd.DataFrame) -> pd.DataFrame:
        per_cust = g.loc[g["__side"] == 0].groupby("key")["n"].sum()
        custs = g.loc[g["__side"] == 1, "key"]
        counts = per_cust.reindex(custs, fill_value=0)
        out = counts.groupby(counts).size()
        out.index.name = "c_count"
        return out.rename("n_custs").reset_index()

    customers = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(tag_customers, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)

    parts = (
        customers.union(orders)
        .groupby("__bucket")
        .map_groups(histo, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby("c_count", as_index=False)["n_custs"]
        .sum()
        .sort_values("c_count", ignore_index=True)
    )
    return pa.table(
        {
            "c_count": pa.array(out["c_count"].astype("int64")),
            "n_custs": pa.array(out["n_custs"].astype("int64")),
        }
    )


SQL_CUSTOMER_ORDER_COUNTS = """
SELECT c_count, count(*) AS n_custs
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
GROUP BY 1
"""


SHIP_CUTOFF = datetime.datetime(1995, 3, 15)
SHIP_SEGMENT = "BUILDING"
SHIP_TOP_N = 10


def q_shipping_priority(sf_dir: str):
    """Top-10 highest-revenue unshipped orders for one market segment —
    the classic 3-table join + grouped sum + global top-k (TPC-H Q3 shape).

    Scale design: the segment filter runs on the customer DIMENSION first
    and only the qualifying custkey set is broadcast (``ray.put`` once,
    probed per orders batch with ``index_in`` — never a fact-table shuffle
    for a dimension join); lineitem revenue is pre-aggregated per batch to
    (orderkey, partial) so only combiner output shuffles; orders and
    partials meet in an orderkey-bucketed exchange where each bucket joins,
    finishes the sums, and emits only its LOCAL top-10 (buckets are
    key-disjoint, so the global top-10 survives the prune); the driver
    merges ≤ buckets×10 rows. Revenue is exact fixed-point: per-row
    round(p·(1−d)·10⁴) summed as int64 (identical expression in the SQL
    twin), so float summation order cannot move the hash.
    """
    import numpy as np
    import pandas as pd
    import polars as pl

    from ..functions.rounding import pc_round_half_away

    num_buckets = 32

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    qual = pc.cast(
        cust.filter(pc.equal(cust["c_mktsegment"], SHIP_SEGMENT))["c_custkey"],
        pa.int64(),
    ).combine_chunks()
    cust_ref = ray.put(qual)

    def _bucketed(keys: pa.Array) -> pa.Array:
        h = pl.from_arrow(pa.table({"k": keys})).hash_rows(seed=11).to_numpy()
        import numpy as np

        return pa.array((h % np.uint64(num_buckets)).astype(np.int64))

    def tag_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(SHIP_CUTOFF)))
        k = ray.get(cust_ref)
        t = t.filter(pc.is_valid(pc.index_in(pc.cast(t["o_custkey"], pa.int64()), value_set=k)))
        key = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "o_orderdate": t["o_orderdate"],
                "rev": pa.nulls(len(key), pa.int64()),
                "__side": pa.array(np.ones(len(key), dtype=np.int8)),
                "__bucket": _bucketed(key),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(SHIP_CUTOFF)))
        rev = pc.cast(
            pc_round_half_away(
                pc.multiply(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    ),
                    pa.scalar(10000.0),
                ),
                0,
            ),
            pa.int64(),
        )
        g = (
            pa.table({"key": pc.cast(t["l_orderkey"], pa.int64()), "rev": rev})
            .group_by("key")
            .aggregate([("rev", "sum")])
        ).rename_columns(["key", "rev"])
        return pa.table(
            {
                "key": g["key"],
                "o_orderdate": pa.nulls(g.num_rows, pa.timestamp("us")),
                "rev": g["rev"],
                "__side": pa.array(np.zeros(g.num_rows, dtype=np.int8)),
                "__bucket": _bucketed(g["key"]),
            }
        )

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        rev = (
            g.loc[g["__side"] == 0]
            .groupby("key")["rev"]
            .sum()
            .rename("r")
            .reset_index()
        )
        orders = g.loc[g["__side"] == 1, ["key", "o_orderdate"]]
        j = orders.merge(rev, on="key")
        # NaN padding floats the int64 partials; totals are ≪ 2^53 so the
        # float sum is exact — cast back before the fixed-point division
        j["revenue"] = j["r"].astype("int64") / 10000.0
        j = j.sort_values(
            ["revenue", "o_orderdate", "key"],
            ascending=[False, True, True],
            ignore_index=True,
        ).head(SHIP_TOP_N)
        return j[["key", "revenue", "o_orderdate"]]

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(tag_lineitem, batch_format="pyarrow", zero_copy_batch=True)

    parts = (
        orders.union(lineitem)
        .groupby("__bucket")
        .map_groups(local_topk, batch_format="pandas")
        .to_pandas()
    )
    out = parts.sort_values(
        ["revenue", "o_orderdate", "key"],
        ascending=[False, True, True],
        ignore_index=True,
    ).head(SHIP_TOP_N)
    return pa.table(
        {
            "l_orderkey": pa.array(out["key"].astype("int64")),
            "revenue": pa.array(out["revenue"].astype("float64")),
            "o_orderdate": pa.array(out["o_orderdate"]).cast(pa.timestamp("us")),
        }
    )


TOPSUPP_LO = datetime.datetime(1996, 1, 1)
TOPSUPP_HI = datetime.datetime(1996, 4, 1)


def q_top_suppliers(sf_dir: str):
    """Suppliers achieving the maximum quarterly revenue — the
    aggregate → global-scalar → filter shape (TPC-H Q15: a view, its max,
    and the rows attaining it).

    Scale design: lineitem revenue is pre-aggregated per batch (fixed-point
    int64 cents×100 — the Q3 exactness argument) and merged in a
    supplier-keyed exchange; the revenue table (supplier-cardinality, far
    below the fact table) is materialized once, its max folds from
    per-block partials, and the winner filter runs distributed against the
    broadcast scalar; names come from the supplier DIMENSION broadcast the
    events-by-nation way. Ties all surface (max equality, not top-1).
    """
    import numpy as np

    from ..functions.rounding import pc_round_half_away

    def rev_partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(TOPSUPP_LO)),
                pc.less(t["l_shipdate"], pa.scalar(TOPSUPP_HI)),
            )
        )
        rev = pc.cast(
            pc_round_half_away(
                pc.multiply(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    ),
                    pa.scalar(10000.0),
                ),
                0,
            ),
            pa.int64(),
        )
        g = (
            pa.table({"s_suppkey": pc.cast(t["l_suppkey"], pa.int64()), "r": rev})
            .group_by("s_suppkey")
            .aggregate([("r", "sum")])
        )
        return g.rename_columns(["s_suppkey", "r"])

    rev = hash_bucket_aggregate(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        ).map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["s_suppkey"],
        {"r": ("r", "sum")},
        num_buckets=16,
    ).materialize()

    maxes = rev.map_batches(
        lambda t: pa.table(
            {"m": pa.array([pc.max(t["r"]).as_py()], pa.int64())}
        ),
        batch_format="pyarrow",
    ).take_all()
    best = max((row["m"] for row in maxes if row["m"] is not None), default=None)

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    lut_ref = ray.put(
        (pc.cast(supp["s_suppkey"], pa.int64()).combine_chunks(),
         supp["s_name"].combine_chunks())
    )

    def winners(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["r"], pa.scalar(best, pa.int64())))
        keys, names = ray.get(lut_ref)
        nm = pc.take(names, pc.index_in(t["s_suppkey"], value_set=keys))
        return pa.table(
            {
                "s_suppkey": t["s_suppkey"],
                "s_name": nm,
                "total_revenue": pc.divide(
                    pc.cast(t["r"], pa.float64()), pa.scalar(10000.0)
                ),
            }
        )

    return rev.map_batches(winners, batch_format="pyarrow")


SQL_TOP_SUPPLIERS = f"""
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
              AS BIGINT) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TOPSUPP_LO:%Y-%m-%d}'
    AND l_shipdate <  TIMESTAMP '{TOPSUPP_HI:%Y-%m-%d}'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r / 10000.0 AS total_revenue
FROM rev JOIN supplier s USING (s_suppkey)
WHERE r = (SELECT max(r) FROM rev)
"""


SQL_SHIPPING_PRIORITY = f"""
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
            AS BIGINT) / 10000.0 AS revenue,
       o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{SHIP_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{SHIP_CUTOFF:%Y-%m-%d}'
  AND l.l_shipdate > TIMESTAMP '{SHIP_CUTOFF:%Y-%m-%d}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT {SHIP_TOP_N}
"""


PROMO_LO = datetime.datetime(1996, 1, 1)
PROMO_HI = datetime.datetime(1996, 4, 1)


def q_promo_revenue(sf_dir: str):
    """Promotion revenue share for one quarter (TPC-H Q14 shape): the
    fact×dim join whose aggregate is a global ratio scalar.

    Scale design: the part DIMENSION collapses to a partkey→is-promo bit
    lookup broadcast once; each lineitem batch folds to TWO int64 partials
    (promo revenue, total revenue — fixed-point ×10⁴, the Q3 exactness
    argument), so the "shuffle" is O(batches) 16-byte rows. The share is
    computed from the two global int64 sums with the same expression in
    both twins — bit-exact."""
    import numpy as np

    from ..functions.rounding import pc_round_half_away, round_half_away_scalar

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    keys = pc.cast(part["p_partkey"], pa.int64()).combine_chunks()
    promo = pc.equal(part["p_type"], "PROMO").combine_chunks()
    lut_ref = ray.put((keys, promo))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(PROMO_LO)),
                pc.less(t["l_shipdate"], pa.scalar(PROMO_HI)),
            )
        )
        rev = pc.cast(
            pc_round_half_away(
                pc.multiply(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    ),
                    pa.scalar(10000.0),
                ),
                0,
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        k, isp = ray.get(lut_ref)
        idx = pc.index_in(pc.cast(t["l_partkey"], pa.int64()), value_set=k)
        is_promo = (
            pc.fill_null(pc.take(isp, idx), False)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        return pa.table(
            {
                "promo": pa.array([int(rev[is_promo].sum())], pa.int64()),
                "total": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    promo_e4 = int(parts["promo"].sum())
    total_e4 = int(parts["total"].sum())
    share = round_half_away_scalar(
        100.0 * float(promo_e4) / float(total_e4), 6
    )
    return pa.table(
        {
            "promo_revenue": pa.array([promo_e4 / 10000.0], pa.float64()),
            "total_revenue": pa.array([total_e4 / 10000.0], pa.float64()),
            "promo_share": pa.array([share], pa.float64()),
        }
    )


SQL_PROMO_REVENUE = f"""
WITH r AS (
  SELECT CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS rev,
         p.p_type = 'PROMO' AS is_promo
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{PROMO_LO:%Y-%m-%d}'
    AND l.l_shipdate <  TIMESTAMP '{PROMO_HI:%Y-%m-%d}'
), s AS (
  SELECT CAST(sum(CASE WHEN is_promo THEN rev ELSE 0 END) AS BIGINT) AS promo,
         CAST(sum(rev) AS BIGINT) AS total
  FROM r
)
SELECT promo / 10000.0 AS promo_revenue,
       total / 10000.0 AS total_revenue,
       round(100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE), 6) AS promo_share
FROM s
"""


LOCAL_REGION = "ASIA"
LOCAL_LO = datetime.datetime(1996, 1, 1)
LOCAL_HI = datetime.datetime(1997, 1, 1)


def q_local_supplier_volume(sf_dir: str):
    """Per-nation revenue where customer and supplier share the nation, one
    region, one year (TPC-H Q5 shape) — the six-table join: three dimension
    hops collapse to broadcast lookups, the two fact tables meet in ONE
    orderkey-bucketed exchange.

    Scale design: region⋈nation prunes to the target region's nationkeys on
    the driver (KB); customer and supplier collapse to key→nationkey
    lookups broadcast once; orders batches pre-filter (date + customer in
    region) and lineitem batches pre-aggregate is impossible here (the join
    predicate needs c_nation = s_nation), so lineitem ships (orderkey,
    s_nation, rev) triples — still fixed-point int64, never text. Each
    bucket joins locally and emits per-nation partials; the driver merges
    ≤ buckets×nations rows."""
    import numpy as np
    import pandas as pd
    import polars as pl

    from ..functions.rounding import pc_round_half_away

    num_buckets = 32

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    rkey = region.filter(pc.equal(region["r_name"], LOCAL_REGION))["r_regionkey"]
    nat = nation.filter(pc.is_in(nation["n_regionkey"], value_set=rkey.combine_chunks()))
    nat_keys = pc.cast(nat["n_nationkey"], pa.int64()).combine_chunks()
    nat_names = nat["n_name"].combine_chunks()

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cust_in = cust.filter(
        pc.is_in(pc.cast(cust["c_nationkey"], pa.int64()), value_set=nat_keys)
    )
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    supp_in = supp.filter(
        pc.is_in(pc.cast(supp["s_nationkey"], pa.int64()), value_set=nat_keys)
    )
    lut_ref = ray.put(
        (
            pc.cast(cust_in["c_custkey"], pa.int64()).combine_chunks(),
            pc.cast(cust_in["c_nationkey"], pa.int64()).combine_chunks(),
            pc.cast(supp_in["s_suppkey"], pa.int64()).combine_chunks(),
            pc.cast(supp_in["s_nationkey"], pa.int64()).combine_chunks(),
        )
    )

    def _bucketed(keys: pa.Array) -> pa.Array:
        h = pl.from_arrow(pa.table({"k": keys})).hash_rows(seed=11).to_numpy()
        return pa.array((h % np.uint64(num_buckets)).astype(np.int64))

    def tag_orders(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(LOCAL_LO)),
                pc.less(t["o_orderdate"], pa.scalar(LOCAL_HI)),
            )
        )
        ck, cn, _, _ = ray.get(lut_ref)
        idx = pc.index_in(pc.cast(t["o_custkey"], pa.int64()), value_set=ck)
        c_nat = pc.take(cn, idx)
        t = t.filter(pc.is_valid(c_nat))
        c_nat = pc.take(cn, pc.index_in(pc.cast(t["o_custkey"], pa.int64()), value_set=ck))
        key = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "nat": pc.cast(c_nat, pa.int64()),
                "rev": pa.nulls(len(key), pa.int64()),
                "__side": pa.array(np.ones(len(key), dtype=np.int8)),
                "__bucket": _bucketed(key),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        _, _, sk, sn = ray.get(lut_ref)
        idx = pc.index_in(pc.cast(t["l_suppkey"], pa.int64()), value_set=sk)
        s_nat = pc.take(sn, idx)
        t = t.filter(pc.is_valid(s_nat))
        s_nat = pc.take(sn, pc.index_in(pc.cast(t["l_suppkey"], pa.int64()), value_set=sk))
        rev = pc.cast(
            pc_round_half_away(
                pc.multiply(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    ),
                    pa.scalar(10000.0),
                ),
                0,
            ),
            pa.int64(),
        )
        key = pc.cast(t["l_orderkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "nat": pc.cast(s_nat, pa.int64()),
                "rev": rev,
                "__side": pa.array(np.zeros(len(key), dtype=np.int8)),
                "__bucket": _bucketed(key),
            }
        )

    def local_join(g: pd.DataFrame) -> pd.DataFrame:
        orders = g.loc[g["__side"] == 1, ["key", "nat"]]
        items = g.loc[g["__side"] == 0, ["key", "nat", "rev"]]
        j = items.merge(orders, on="key", suffixes=("_s", "_c"))
        j = j[j["nat_s"] == j["nat_c"]]
        out = (
            j.groupby("nat_s", sort=False)["rev"]
            .sum()
            .rename("rev")
            .reset_index()
            .rename(columns={"nat_s": "nat"})
        )
        out["nat"] = out["nat"].astype("int64")
        out["rev"] = out["rev"].astype("int64")
        return out

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(tag_lineitem, batch_format="pyarrow", zero_copy_batch=True)

    parts = (
        orders.union(items)
        .groupby("__bucket")
        .map_groups(local_join, batch_format="pandas")
        .to_pandas()
    )
    merged = parts.groupby("nat", as_index=False)["rev"].sum()
    name_of = dict(
        zip(nat_keys.to_pylist(), nat_names.to_pylist())
    )
    merged["n_name"] = merged["nat"].map(name_of)
    merged["revenue"] = merged["rev"].astype("int64") / 10000.0
    merged = merged.sort_values("n_name", ignore_index=True)
    return pa.table(
        {
            "n_name": pa.array(merged["n_name"], pa.string()),
            "revenue": pa.array(merged["revenue"], pa.float64()),
        }
    )


SQL_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
            AS BIGINT) / 10000.0 AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey AND s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{LOCAL_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{LOCAL_LO:%Y-%m-%d}'
  AND o.o_orderdate <  TIMESTAMP '{LOCAL_HI:%Y-%m-%d}'
GROUP BY 1
"""


# -- Q7 shape: volume shipping between two nations ---------------------------

TRADE_NATION_A = "NATION_18"
TRADE_NATION_B = "NATION_19"
TRADE_LO = datetime.datetime(1996, 1, 1)
TRADE_HI = datetime.datetime(1998, 1, 1)


def q_nation_trade_volume(sf_dir: str):
    """Bilateral shipping volume by year between two nations (TPC-H Q7
    shape): revenue of lineitems shipped in the window where the supplier
    sits in one target nation and the ordering customer in the other,
    grouped by (supp_nation, cust_nation, year).

    Scale design (the Q5 pattern, ``q_local_supplier_volume``): the two
    nation keys prune customer and supplier to key→nationkey lookups
    broadcast once via ``ray.put``; orders ships (orderkey, cust_nat) pairs
    and lineitem ships (orderkey, supp_nat, year, rev) fixed-point int64
    quads; the facts meet in ONE orderkey-bucketed exchange, each bucket
    joins locally, filters to cross-nation pairs, and emits per-(pair, year)
    partials — the driver merges ≤ buckets × 2 × years rows.
    """
    import numpy as np
    import pandas as pd
    import polars as pl

    from ..functions.rounding import pc_round_half_away

    num_buckets = 32

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nat2 = nation.filter(
        pc.is_in(
            nation["n_name"],
            value_set=pa.array([TRADE_NATION_A, TRADE_NATION_B]),
        )
    )
    nat_keys = pc.cast(nat2["n_nationkey"], pa.int64()).combine_chunks()
    name_of = dict(
        zip(nat_keys.to_pylist(), nat2["n_name"].combine_chunks().to_pylist())
    )

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cust_in = cust.filter(
        pc.is_in(pc.cast(cust["c_nationkey"], pa.int64()), value_set=nat_keys)
    )
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    supp_in = supp.filter(
        pc.is_in(pc.cast(supp["s_nationkey"], pa.int64()), value_set=nat_keys)
    )
    lut_ref = ray.put(
        (
            pc.cast(cust_in["c_custkey"], pa.int64()).combine_chunks(),
            pc.cast(cust_in["c_nationkey"], pa.int64()).combine_chunks(),
            pc.cast(supp_in["s_suppkey"], pa.int64()).combine_chunks(),
            pc.cast(supp_in["s_nationkey"], pa.int64()).combine_chunks(),
        )
    )

    def _bucketed(keys: pa.Array) -> pa.Array:
        h = pl.from_arrow(pa.table({"k": keys})).hash_rows(seed=11).to_numpy()
        return pa.array((h % np.uint64(num_buckets)).astype(np.int64))

    def tag_orders(t: pa.Table) -> pa.Table:
        ck, cn, _, _ = ray.get(lut_ref)
        idx = pc.index_in(pc.cast(t["o_custkey"], pa.int64()), value_set=ck)
        c_nat = pc.take(cn, idx)
        t = t.filter(pc.is_valid(c_nat))
        c_nat = pc.take(
            cn, pc.index_in(pc.cast(t["o_custkey"], pa.int64()), value_set=ck)
        )
        key = pc.cast(t["o_orderkey"], pa.int64())
        z = pa.nulls(len(key), pa.int64())
        return pa.table(
            {
                "key": key,
                "nat": pc.cast(c_nat, pa.int64()),
                "yr": z,
                "rev": z,
                "__side": pa.array(np.ones(len(key), dtype=np.int8)),
                "__bucket": _bucketed(key),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(TRADE_LO)),
                pc.less(t["l_shipdate"], pa.scalar(TRADE_HI)),
            )
        )
        _, _, sk, sn = ray.get(lut_ref)
        idx = pc.index_in(pc.cast(t["l_suppkey"], pa.int64()), value_set=sk)
        s_nat = pc.take(sn, idx)
        t = t.filter(pc.is_valid(s_nat))
        s_nat = pc.take(
            sn, pc.index_in(pc.cast(t["l_suppkey"], pa.int64()), value_set=sk)
        )
        rev = pc.cast(
            pc_round_half_away(
                pc.multiply(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    ),
                    pa.scalar(10000.0),
                ),
                0,
            ),
            pa.int64(),
        )
        key = pc.cast(t["l_orderkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "nat": pc.cast(s_nat, pa.int64()),
                "yr": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "rev": rev,
                "__side": pa.array(np.zeros(len(key), dtype=np.int8)),
                "__bucket": _bucketed(key),
            }
        )

    def local_join(g: pd.DataFrame) -> pd.DataFrame:
        orders = g.loc[g["__side"] == 1, ["key", "nat"]]
        items = g.loc[g["__side"] == 0, ["key", "nat", "yr", "rev"]]
        j = items.merge(orders, on="key", suffixes=("_s", "_c"))
        j = j[j["nat_s"] != j["nat_c"]]
        if j.empty:
            return pd.DataFrame(
                {
                    "nat_s": pd.array([], dtype="int64"),
                    "nat_c": pd.array([], dtype="int64"),
                    "yr": pd.array([], dtype="int64"),
                    "rev": pd.array([], dtype="int64"),
                }
            )
        out = (
            j.groupby(["nat_s", "nat_c", "yr"], sort=False)["rev"]
            .sum()
            .reset_index()
        )
        for c in ("nat_s", "nat_c", "yr", "rev"):
            out[c] = out[c].astype("int64")
        return out

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(tag_lineitem, batch_format="pyarrow", zero_copy_batch=True)

    parts = (
        orders.union(items)
        .groupby("__bucket")
        .map_groups(local_join, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:
        return pa.table(
            {
                "supp_nation": pa.array([], pa.string()),
                "cust_nation": pa.array([], pa.string()),
                "l_year": pa.array([], pa.int64()),
                "revenue": pa.array([], pa.float64()),
            }
        )
    merged = parts.groupby(["nat_s", "nat_c", "yr"], as_index=False)["rev"].sum()
    merged["supp_nation"] = merged["nat_s"].map(name_of)
    merged["cust_nation"] = merged["nat_c"].map(name_of)
    merged["revenue"] = merged["rev"].astype("int64") / 10000.0
    merged = merged.sort_values(
        ["supp_nation", "cust_nation", "yr"], ignore_index=True
    )
    return pa.table(
        {
            "supp_nation": pa.array(merged["supp_nation"], pa.string()),
            "cust_nation": pa.array(merged["cust_nation"], pa.string()),
            "l_year": pa.array(merged["yr"], pa.int64()),
            "revenue": pa.array(merged["revenue"], pa.float64()),
        }
    )


SQL_NATION_TRADE_VOLUME = f"""
SELECT n2.n_name AS supp_nation,
       n1.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
            AS BIGINT) / 10000.0 AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{TRADE_NATION_A}' AND n2.n_name = '{TRADE_NATION_B}')
    OR (n1.n_name = '{TRADE_NATION_B}' AND n2.n_name = '{TRADE_NATION_A}'))
  AND l.l_shipdate >= TIMESTAMP '{TRADE_LO:%Y-%m-%d}'
  AND l.l_shipdate <  TIMESTAMP '{TRADE_HI:%Y-%m-%d}'
GROUP BY 1, 2, 3
"""


# -- Q12 shape: priority class counts by line flag ----------------------------

SHIPMODE_LO = datetime.datetime(1996, 1, 1)
SHIPMODE_HI = datetime.datetime(1997, 1, 1)


def q_shipmode_priority(sf_dir: str):
    """Priority-class line counts by return flag (TPC-H Q12 shape —
    conditional aggregation across a fact-fact join): for lineitems shipped
    in the window, per ``l_returnflag``, how many belong to URGENT/HIGH
    orders vs the rest. All-integer, so the oracle compares exactly.

    Scale design: lineitem pre-filters the window and ships (orderkey,
    flag); orders ships (orderkey, is_high) — both fixed-width. One
    orderkey-bucketed exchange; each bucket joins locally and emits
    per-flag partial counts; the driver merges ≤ buckets × flags rows.
    """
    import numpy as np
    import pandas as pd
    import polars as pl

    num_buckets = 32

    def _bucketed(keys: pa.Array) -> pa.Array:
        h = pl.from_arrow(pa.table({"k": keys})).hash_rows(seed=11).to_numpy()
        return pa.array((h % np.uint64(num_buckets)).astype(np.int64))

    def tag_orders(t: pa.Table) -> pa.Table:
        key = pc.cast(t["o_orderkey"], pa.int64())
        is_high = pc.cast(
            pc.is_in(
                t["o_orderpriority"],
                value_set=pa.array(["1-URGENT", "2-HIGH"]),
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "key": key,
                "flag": pa.nulls(len(key), pa.string()),
                "is_high": is_high,
                "__side": pa.array(np.ones(len(key), dtype=np.int8)),
                "__bucket": _bucketed(key),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(SHIPMODE_LO)),
                pc.less(t["l_shipdate"], pa.scalar(SHIPMODE_HI)),
            )
        )
        key = pc.cast(t["l_orderkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "flag": t["l_returnflag"],
                "is_high": pa.nulls(len(key), pa.int64()),
                "__side": pa.array(np.zeros(len(key), dtype=np.int8)),
                "__bucket": _bucketed(key),
            }
        )

    def local_join(g: pd.DataFrame) -> pd.DataFrame:
        orders = g.loc[g["__side"] == 1, ["key", "is_high"]]
        items = g.loc[g["__side"] == 0, ["key", "flag"]]
        j = items.merge(orders, on="key")
        if j.empty:
            return pd.DataFrame(
                {
                    "l_returnflag": pd.array([], dtype="object"),
                    "high_line_count": pd.array([], dtype="int64"),
                    "low_line_count": pd.array([], dtype="int64"),
                }
            )
        # dropna=False: a null return flag is a real group (DuckDB semantics)
        out = (
            j.groupby("flag", sort=False, dropna=False)["is_high"]
            .agg(high_line_count="sum", low_line_count=lambda s: int((1 - s).sum()))
            .reset_index()
            .rename(columns={"flag": "l_returnflag"})
        )
        for c in ("high_line_count", "low_line_count"):
            out[c] = out[c].astype("int64")
        return out

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
    ).map_batches(tag_lineitem, batch_format="pyarrow", zero_copy_batch=True)

    parts = (
        orders.union(items)
        .groupby("__bucket")
        .map_groups(local_join, batch_format="pandas")
        .to_pandas()
    )
    merged = parts.groupby("l_returnflag", as_index=False, dropna=False)[
        ["high_line_count", "low_line_count"]
    ].sum()
    merged = merged.sort_values("l_returnflag", ignore_index=True)
    return pa.table(
        {
            "l_returnflag": pa.array(merged["l_returnflag"], pa.string()),
            "high_line_count": pa.array(merged["high_line_count"].astype("int64")),
            "low_line_count": pa.array(merged["low_line_count"].astype("int64")),
        }
    )


SQL_SHIPMODE_PRIORITY = f"""
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{SHIPMODE_LO:%Y-%m-%d}'
  AND l.l_shipdate <  TIMESTAMP '{SHIPMODE_HI:%Y-%m-%d}'
GROUP BY 1
"""


# -- Q19 shape: disjunctive banded-predicate revenue --------------------------


def q_banded_revenue(sf_dir: str):
    """Disjunctive banded-predicate revenue (TPC-H Q19 shape): revenue of
    lineitems whose part matches one of three (brand, size-band,
    quantity-band) disjuncts — the many-OR pushdown pattern. One row out.

    Scale design: part collapses to broadcast (partkey → brand, size)
    lookups; every disjunct evaluates vectorized inside the lineitem scan
    (no join, no exchange); revenue accumulates as fixed-point int64
    partials, one per batch, merged at the driver.
    """
    import numpy as np

    from ..functions.rounding import pc_round_half_away

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    lut_ref = ray.put(
        (
            pc.cast(part["p_partkey"], pa.int64()).combine_chunks(),
            part["p_brand"].combine_chunks(),
            pc.cast(part["p_size"], pa.int64()).combine_chunks(),
        )
    )

    def partial(t: pa.Table) -> pa.Table:
        pk, pb, psz = ray.get(lut_ref)
        idx = pc.index_in(pc.cast(t["l_partkey"], pa.int64()), value_set=pk)
        brand = pc.take(pb, idx)
        size = pc.take(psz, idx)
        q = t["l_quantity"]

        def band(b: str, slo: int, shi: int, qlo: float, qhi: float):
            return pc.and_(
                pc.and_(
                    pc.equal(pc.fill_null(brand, ""), b),
                    pc.and_(
                        pc.greater_equal(pc.fill_null(size, -1), slo),
                        pc.less_equal(pc.fill_null(size, -1), shi),
                    ),
                ),
                pc.and_(pc.greater_equal(q, qlo), pc.less_equal(q, qhi)),
            )

        hit = pc.or_(
            pc.or_(
                band("Brand#1", 1, 10, 1.0, 20.0),
                band("Brand#2", 5, 20, 5.0, 30.0),
            ),
            band("Brand#3", 10, 40, 10.0, 45.0),
        )
        t2 = t.filter(hit)
        rev = pc.cast(
            pc_round_half_away(
                pc.multiply(
                    pc.multiply(
                        t2["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t2["l_discount"]),
                    ),
                    pa.scalar(10000.0),
                ),
                0,
            ),
            pa.int64(),
        )
        total = pc.sum(rev).as_py() or 0
        return pa.table(
            {
                "rev": pa.array([total], pa.int64()),
                "n": pa.array([t2.num_rows], pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    return pa.table(
        {
            "n_lines": pa.array([int(parts["n"].sum())], pa.int64()),
            "revenue": pa.array(
                [int(parts["rev"].sum()) / 10000.0], pa.float64()
            ),
        }
    )


SQL_BANDED_REVENUE = """
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
            AS BIGINT) / 10000.0 AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
       AND l.l_quantity BETWEEN 5 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 40
       AND l.l_quantity BETWEEN 10 AND 45)
"""


# -- Q10 shape: top returned-revenue customers --------------------------------

RETITEM_LO = datetime.datetime(1996, 1, 1)
RETITEM_HI = datetime.datetime(1996, 7, 1)
RETITEM_K = 20


def q_returned_item_customers(sf_dir: str, k: int = RETITEM_K):
    """Top-k customers by revenue of RETURNED lineitems in a quarter-window
    (TPC-H Q10 shape — the grouped-top-k-over-a-fact-fact-join pattern):
    which customers are returning the most value, with their nation name.

    Scale design: orders pre-filters the window and ships (orderkey,
    custkey); lineitem pre-filters returnflag='R' and ships (orderkey,
    fixed-point revenue); one orderkey-bucketed exchange joins them and
    emits per-customer partials; a second tiny custkey exchange merges
    partials; customer/nation names resolve at the end via broadcast lookup
    over the k winners only (names never join the wide path). Ties on
    revenue break custkey-ascending on both twins; revenue is fixed-point
    int64 so the ordering is exact.
    """
    import numpy as np
    import pandas as pd
    import polars as pl

    from ..functions.rounding import pc_round_half_away

    num_buckets = 32

    def _bucketed(keys: pa.Array) -> pa.Array:
        h = pl.from_arrow(pa.table({"k": keys})).hash_rows(seed=11).to_numpy()
        return pa.array((h % np.uint64(num_buckets)).astype(np.int64))

    def tag_orders(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(RETITEM_LO)),
                pc.less(t["o_orderdate"], pa.scalar(RETITEM_HI)),
            )
        )
        key = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "cust": pc.cast(t["o_custkey"], pa.int64()),
                "rev": pa.nulls(len(key), pa.int64()),
                "__side": pa.array(np.ones(len(key), dtype=np.int8)),
                "__bucket": _bucketed(key),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = pc.cast(
            pc_round_half_away(
                pc.multiply(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    ),
                    pa.scalar(10000.0),
                ),
                0,
            ),
            pa.int64(),
        )
        key = pc.cast(t["l_orderkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "cust": pa.nulls(len(key), pa.int64()),
                "rev": rev,
                "__side": pa.array(np.zeros(len(key), dtype=np.int8)),
                "__bucket": _bucketed(key),
            }
        )

    def local_join(g: pd.DataFrame) -> pd.DataFrame:
        orders = g.loc[g["__side"] == 1, ["key", "cust"]]
        items = g.loc[g["__side"] == 0, ["key", "rev"]]
        j = items.merge(orders, on="key")
        if j.empty:
            return pd.DataFrame(
                {
                    "cust": pd.array([], dtype="int64"),
                    "rev": pd.array([], dtype="int64"),
                }
            )
        out = j.groupby("cust", sort=False, as_index=False)["rev"].sum()
        out["cust"] = out["cust"].astype("int64")
        out["rev"] = out["rev"].astype("int64")
        return out

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(tag_lineitem, batch_format="pyarrow", zero_copy_batch=True)

    joined = (
        orders.union(items)
        .groupby("__bucket")
        .map_groups(local_join, batch_format="pandas")
    )
    totals = hash_bucket_aggregate(
        joined, ["cust"], {"rev": ("rev", "sum")}, num_buckets=8
    ).to_pandas()
    if totals.empty:
        return pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "c_nation": pa.array([], pa.string()),
                "revenue": pa.array([], pa.float64()),
            }
        )
    totals = totals.sort_values(
        ["rev", "cust"], ascending=[False, True], kind="mergesort"
    ).head(k)

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nat_of = dict(
        zip(
            pc.cast(nation["n_nationkey"], pa.int64()).to_pylist(),
            nation["n_name"].to_pylist(),
        )
    )
    cnat = dict(
        zip(
            pc.cast(cust["c_custkey"], pa.int64()).to_pylist(),
            pc.cast(cust["c_nationkey"], pa.int64()).to_pylist(),
        )
    )
    return pa.table(
        {
            "c_custkey": pa.array(totals["cust"].astype("int64")),
            "c_nation": pa.array(
                [nat_of[cnat[c]] for c in totals["cust"]], pa.string()
            ),
            "revenue": pa.array(
                totals["rev"].astype("int64") / 10000.0, pa.float64()
            ),
        }
    )


SQL_RETURNED_ITEM_CUSTOMERS = f"""
SELECT c.c_custkey, n.n_name AS c_nation,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
            AS BIGINT) / 10000.0 AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '{RETITEM_LO:%Y-%m-%d}'
  AND o.o_orderdate <  TIMESTAMP '{RETITEM_HI:%Y-%m-%d}'
GROUP BY 1, 2
ORDER BY sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) DESC,
         c.c_custkey
LIMIT {RETITEM_K}
"""


# -- Q2 shape: argmin-per-group (cheapest supplier per part) ------------------


def q_min_price_supplier(sf_dir: str):
    """Cheapest observed supplier per part (TPC-H Q2's min-cost-supplier
    shape over the tables this corpus has): per ``l_partkey``, the supplier
    with the minimal fixed-point unit price (``extendedprice/quantity``),
    ties broken on the smaller suppkey — the argmin-per-group pattern that
    a naive min()-join gets wrong. Emits (p_partkey, s_suppkey, price).

    Scale design: per-batch LOCAL argmin per part (a combiner — each batch
    forwards at most one candidate row per part it touches) → one
    partkey-bucket exchange → in-bucket argmin. Unit price is half-away
    rounded to 10^-4 fixed-point int64 on both twins, so the ordering is
    exact, never float-fuzzy.
    """
    import numpy as np
    import pandas as pd
    import polars as pl

    from ..functions.rounding import pc_round_half_away

    def local_argmin(t: pa.Table) -> pa.Table:
        price = pc.cast(
            pc_round_half_away(
                pc.multiply(
                    pc.divide(t["l_extendedprice"], t["l_quantity"]),
                    pa.scalar(10000.0),
                ),
                0,
            ),
            pa.int64(),
        )
        df = pd.DataFrame(
            {
                "part": t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "supp": t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "price": price.to_numpy(zero_copy_only=False),
            }
        )
        df = df.sort_values(["part", "price", "supp"], kind="mergesort")
        win = df.drop_duplicates("part", keep="first")
        return pa.Table.from_pandas(win, preserve_index=False)

    def bucketize(t: pa.Table) -> pa.Table:
        h = pl.from_arrow(t.select(["part"])).hash_rows(seed=11).to_numpy()
        return t.append_column(
            "bucket", pa.array((h % np.uint64(32)).astype(np.int64))
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["part", "price", "supp"], kind="mergesort")
        win = g.drop_duplicates("part", keep="first")
        out = win.rename(
            columns={"part": "p_partkey", "supp": "s_suppkey"}
        )[["p_partkey", "s_suppkey", "price"]]
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
        )
        .map_batches(local_argmin, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


SQL_MIN_PRICE_SUPPLIER = """
WITH up AS (
  SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
         CAST(l_suppkey AS BIGINT) AS s_suppkey,
         CAST(round(l_extendedprice / l_quantity * 10000) AS BIGINT) AS price
  FROM lineitem)
SELECT p_partkey, s_suppkey, price FROM (
  SELECT *, row_number() OVER (
    PARTITION BY p_partkey ORDER BY price, s_suppkey) AS rk
  FROM up)
WHERE rk = 1
"""


# -- Q22 shape: scalar-subquery threshold + anti-join -------------------------

DORMANT_CUTOFF = datetime.datetime(2001, 1, 1)


def q_dormant_rich_customers(sf_dir: str):
    """Dormant high-balance customers by nation (TPC-H Q22 shape — the
    scalar-subquery + anti-join pattern): customers whose positive account
    balance beats the corpus average AND who placed no order on/after the
    cutoff, rolled up per nation as (n_name, n_custs, total_acctbal).

    Exactness: balances are ×100 fixed-point int64 and the above-average
    test is the integer cross-multiplication ``bal·count > sum`` — no float
    threshold ever compared. Scale design: customer is the dimension-scale
    side here (the Q5/Q7 lookup convention), read once driver-side for the
    balance scalar and the rich filter; recent orders ship only distinct
    custkeys (per-batch dedup combiner); one custkey-bucket exchange
    anti-joins; per-nation partials merge at the driver and resolve names
    via broadcast. If customers outgrow the driver, the scalar lifts to a
    combiner and the rich filter moves into the scan — the exchange shape
    is unchanged.
    """
    import numpy as np
    import pandas as pd
    import polars as pl

    num_buckets = 32

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )
    from ..functions.rounding import pc_round_half_away

    bal_all = pc.cast(
        pc_round_half_away(pc.multiply(cust["c_acctbal"], 100.0), 0), pa.int64()
    )
    pos = pc.greater(cust["c_acctbal"], 0.0)
    bal_pos = bal_all.filter(pos)
    sb = pc.sum(bal_pos).as_py() or 0
    nb = len(bal_pos)

    fp = pa.table(
        {
            "cust": pc.cast(cust["c_custkey"], pa.int64()),
            "nat": pc.cast(cust["c_nationkey"], pa.int64()),
            "bal": bal_all,
        }
    ).filter(pos)
    rich = fp.filter(
        pc.greater(pc.multiply(fp["bal"], pa.scalar(nb, pa.int64())), sb)
    )
    rich_ds = ray.data.from_arrow(
        rich.append_column(
            "__side", pa.array(np.ones(rich.num_rows, dtype=np.int8))
        )
    )

    def _bucketed(keys: pa.Array) -> pa.Array:
        h = pl.from_arrow(pa.table({"k": keys})).hash_rows(seed=11).to_numpy()
        return pa.array((h % np.uint64(num_buckets)).astype(np.int64))

    def tag_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["o_orderdate"], pa.scalar(DORMANT_CUTOFF)))
        ck = pc.cast(t["o_custkey"], pa.int64())
        u = pa.table({"cust": ck}).group_by("cust").aggregate([])
        n = u.num_rows
        return pa.table(
            {
                "cust": u["cust"],
                "nat": pa.nulls(n, pa.int64()),
                "bal": pa.nulls(n, pa.int64()),
                "__side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__bucket", _bucketed(t["cust"]))

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        active = set(g.loc[g["__side"] == 0, "cust"])
        keep = g[(g["__side"] == 1) & ~g["cust"].isin(active)]
        if keep.empty:
            return pd.DataFrame(
                {
                    "nat": pd.array([], dtype="int64"),
                    "n_custs": pd.array([], dtype="int64"),
                    "bal": pd.array([], dtype="int64"),
                }
            )
        out = keep.groupby("nat", as_index=False).agg(
            n_custs=("cust", "size"), bal=("bal", "sum")
        )
        for c in ("nat", "n_custs", "bal"):
            out[c] = out[c].astype("int64")
        return out

    parts = (
        rich_ds.union(orders)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(anti, batch_format="pandas")
        .to_pandas()
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    name_of = dict(
        zip(
            pc.cast(nation["n_nationkey"], pa.int64()).to_pylist(),
            nation["n_name"].to_pylist(),
        )
    )
    if parts.empty:
        return pa.table(
            {
                "n_name": pa.array([], pa.string()),
                "n_custs": pa.array([], pa.int64()),
                "total_acctbal": pa.array([], pa.float64()),
            }
        )
    merged = parts.groupby("nat", as_index=False).agg(
        n_custs=("n_custs", "sum"), bal=("bal", "sum")
    )
    merged["n_name"] = merged["nat"].map(name_of)
    merged = merged.sort_values("n_name", ignore_index=True)
    return pa.table(
        {
            "n_name": pa.array(merged["n_name"], pa.string()),
            "n_custs": pa.array(merged["n_custs"].astype("int64")),
            "total_acctbal": pa.array(
                merged["bal"].astype("int64") / 100.0, pa.float64()
            ),
        }
    )


SQL_DORMANT_RICH_CUSTOMERS = f"""
WITH fp AS (
  SELECT CAST(c_custkey AS BIGINT) AS cust, CAST(c_nationkey AS BIGINT) AS nat,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal
  FROM customer WHERE c_acctbal > 0),
s AS (SELECT CAST(sum(bal) AS BIGINT) AS sb, CAST(count(*) AS BIGINT) AS nb FROM fp)
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_custs,
       CAST(sum(fp.bal) AS BIGINT) / 100.0 AS total_acctbal
FROM fp JOIN nation n ON fp.nat = n.n_nationkey CROSS JOIN s
WHERE fp.bal * s.nb > s.sb
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = fp.cust
                    AND o.o_orderdate >= TIMESTAMP '{DORMANT_CUTOFF:%Y-%m-%d}')
GROUP BY 1
"""
