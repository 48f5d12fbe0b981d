"""Explicit hash-partitioned aggregation — the engine's workhorse exchange.

Ray Data's native ``groupby().aggregate()`` is a range-partitioned sort
shuffle; at small-to-medium key volumes its constant factors dominate (12s+
for a 400k-row merge measured in this sandbox vs 0.7s for this operator), and
at 10^12-row scale a global sort is far more movement than an aggregation
needs. This module implements the classic hash exchange instead
(ray_guide.md "Joins and lookups" / "Aggregation at scale" pattern):

1. ``map_batches``: project to key+value columns, add
   ``bucket = xxhash64(keys) % B`` (polars, vectorized);
2. ``groupby("bucket").map_groups``: one task per bucket runs a *local*
   vectorized pandas/polars aggregation.

The shuffle key is a single small int (B distinct values), so the underlying
sort is trivial; all real work is hash-local. ``num_buckets`` bounds reduce
parallelism and must scale with cluster size (rule of thumb: 2-4× total
cores). Hot *aggregation keys* are harmless here — aggregation is per-key
within a bucket; hot *buckets* are avoided by hashing the full key tuple.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_AGG_FNS = {"sum", "min", "max", "count", "first"}


def _bucket_of(t: pa.Table, keys: Sequence[str], num_buckets: int) -> np.ndarray:
    import polars as pl

    h = pl.from_arrow(t.select(list(keys))).hash_rows(seed=11).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def hash_bucket_aggregate(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    num_buckets: int = 256,
) -> ray.data.Dataset:
    """``SELECT keys, agg(col) AS alias ... GROUP BY keys`` as a hash exchange.

    ``aggs`` maps output alias → (source column, fn) with fn ∈ {sum, min,
    max, count, first}. 'count' counts rows (source column ignored).
    Input is assumed pre-combined per batch where that matters — pair with a
    per-batch partial aggregation to bound shuffle volume.
    """
    keys = list(keys)
    for alias, (_, fn) in aggs.items():
        if fn not in _AGG_FNS:
            raise ValueError(f"unsupported agg fn {fn} for {alias}")

    src_cols = list(dict.fromkeys(c for c, f in aggs.values() if f != "count"))
    need = list(dict.fromkeys(keys + src_cols))

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.select(need)
        return t.append_column("bucket", pa.array(_bucket_of(t, keys, num_buckets)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: null aggregation keys are real groups (DuckDB/Arrow
        # semantics) — pandas' default would silently drop e.g. null-role rows
        gb = g.groupby(keys, sort=False, dropna=False)
        pieces = []
        for alias, (col, fn) in aggs.items():
            s = gb.size() if fn == "count" else getattr(gb[col], fn)()
            pieces.append(s.rename(alias))
        return pd.concat(pieces, axis=1).reset_index()

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# file-based hash exchange (raw Ray tasks — the documented last resort)
# ---------------------------------------------------------------------------
#
# For exchange inputs that are already checkpointed as Parquet (the phase-1
# partials), Ray Data's sort-based shuffle adds a global sort the aggregation
# doesn't need and anti-scales at sandbox sizes (measured 12-15s for a 12.8M
# row merge at 32 CPUs). This is the textbook two-stage hash shuffle instead:
#
#   map:    one task per file — read, hash keys, split rows into B buckets
#           (num_returns=B object refs, stable within-file order)
#   reduce: one task per bucket — concat that bucket's N file-parts, run a
#           local vectorized merge function
#
# Partitioning contract: all rows of a key land in exactly one bucket
# (bucket = xxhash64(key columns) % B). Skewed *keys* are harmless (merged
# within a bucket); bucket balance follows from hashing. B bounds reduce
# parallelism — scale it with the cluster.


def parquet_hash_exchange(
    files: Sequence[str],
    key_cols: Sequence[str],
    reduce_fn,
    num_buckets: int = 64,
    columns: Sequence[str] | None = None,
    file_tags: dict[str, str] | None = None,
    max_map_tasks: int = 64,
    reduce_format: str = "pandas",
) -> pa.Table:
    """Hash-exchange rows of ``files`` by ``key_cols``; apply ``reduce_fn``
    (pandas DataFrame -> pyarrow Table) per bucket; return the concatenated
    (assumed small) result. ``file_tags`` adds a constant ``src`` column per
    file (e.g. to compare two runs in one exchange).
    ``reduce_format="pyarrow"`` hands ``reduce_fn`` the concatenated Arrow
    table instead — skipping the pandas conversion, which costs more than
    the reduction itself for megarow string-keyed buckets (measured: the
    polars-on-arrow reducer more than halved the 102 M-row key exchange).

    Input files are batched into ≤ ``max_map_tasks`` map tasks: the object
    count is map_tasks × num_buckets, and thousands of tiny files would
    otherwise drown the run in object-management overhead (measured 21s for
    463 small files vs ~2s batched)."""
    import ray

    files = list(files)
    if not files:
        return pa.table({})

    per_task = max(1, -(-len(files) // max_map_tasks))
    file_chunks = [files[i : i + per_task] for i in range(0, len(files), per_task)]

    @ray.remote(num_returns=num_buckets)
    def map_side(chunk: list[str]):
        import numpy as np
        import polars as pl
        import pyarrow.parquet as pq

        tables = []
        for file in chunk:
            t1 = pq.read_table(file, columns=list(columns) if columns else None)
            if file_tags is not None:
                t1 = t1.append_column(
                    "src", pa.array([file_tags[file]] * t1.num_rows, pa.string())
                )
            tables.append(t1)
        t = pa.concat_tables(tables)
        if t.num_rows == 0:
            empty = t.slice(0, 0)
            return tuple([empty] * num_buckets) if num_buckets > 1 else empty
        h = pl.from_arrow(t.select(list(key_cols))).hash_rows(seed=11).to_numpy()
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        order = np.argsort(b, kind="stable")
        t2 = t.take(pa.array(order))
        bs = b[order]
        bounds = np.searchsorted(bs, np.arange(1, num_buckets))
        parts = []
        lo = 0
        for hi in list(bounds) + [t2.num_rows]:
            parts.append(t2.slice(lo, hi - lo))
            lo = hi
        return tuple(parts) if num_buckets > 1 else parts[0]

    @ray.remote
    def reduce_side(*parts):
        tables = [p for p in parts if p.num_rows]
        if not tables:
            return None
        t = pa.concat_tables(tables)
        return reduce_fn(t if reduce_format == "pyarrow" else t.to_pandas())

    refs = [map_side.remote(c) for c in file_chunks]  # refs[chunk][bucket]
    if num_buckets == 1:
        refs = [[r] for r in refs]
    out_refs = [
        reduce_side.remote(*[refs[i][b] for i in range(len(file_chunks))])
        for b in range(num_buckets)
    ]
    results = [r for r in ray.get(out_refs) if r is not None]
    if not results:
        return pa.table({})
    return pa.concat_tables(results)
