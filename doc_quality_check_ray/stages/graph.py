"""Connected components over a near-duplicate pair Dataset — the
"suppression" step that turns pairwise dedup findings into one canonical
document per duplicate cluster.

The reference's IoU suppression keeps one representative per overlapping
group greedily (``modules/document_segmentation.py:143-228``); at corpus
scale near-dup pairs from MinHash/SimHash/cosine form general graphs, so the
canonical id is the component minimum — computed with the standard
iterated min-label propagation (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014 — the hash-join formulation, public):

    label(v) ← min(label(v), min over neighbors u of label(u))

Each round is two hash-bucket exchanges — a tagged label⋈edge join (the
``decontaminate`` pattern: both sides bucketed by the join key, no
broadcast — labels are node-proportional and may not fit one machine) and a
per-node min merge. Plain propagation needs O(component diameter) rounds
(``max_rounds`` bounds pathological chains; the large-star/small-star
O(log n) variant of the paper is the upgrade path) — duplicate clusters are
near-cliques, so 2-3 rounds in practice. Convergence is detected from the
TOTAL LABEL SUM (labels only decrease, so the sum is strictly monotone
until fixpoint) — a scalar aggregate, never a driver-side diff of the
label table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .exchange import hash_bucket_aggregate

COMPONENT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("component_id", pa.int64())])

_MSG_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("kind", pa.int8()),  # 0 = label row (key=node), 1 = edge row (key=src)
        ("key", pa.int64()),
        ("val", pa.int64()),  # label (kind=0) / dst node (kind=1)
    ]
)


def _tag(bucket, kind: int, key, val) -> pa.Table:
    return pa.table(
        {
            "bucket": pa.array(bucket, pa.int64()),
            "kind": pa.array(np.full(len(bucket), kind, dtype=np.int8)),
            "key": pc.cast(key, pa.int64()),
            "val": pc.cast(val, pa.int64()),
        },
        schema=_MSG_SCHEMA,
    )


def _components_driver(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Vectorized min-label propagation on the driver — same kernel as the
    distributed path's in-bucket local fixpoint, over the whole edge list.
    O(E · diameter) numpy work; used only below the adaptive edge gate."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    src, dst = inv[: len(a)], inv[len(a):]
    local = nodes.copy()
    for _ in range(len(nodes)):
        before = local.copy()
        m = np.minimum(local[src], local[dst])
        np.minimum.at(local, src, m)
        np.minimum.at(local, dst, m)
        if np.array_equal(before, local):
            break
    return pa.table(
        {"doc_id": pa.array(nodes, pa.int64()),
         "component_id": pa.array(local, pa.int64())},
        schema=COMPONENT_SCHEMA,
    )


def connected_components(
    pairs: ray.data.Dataset | pa.Table,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 50,
    num_buckets: int = 32,
    mode: str = "auto",
    max_driver_edges: int = 1 << 16,
) -> pa.Table:
    """(doc_id, component_id = min id in its component) for every id that
    appears in ``pairs`` (an undirected edge list).

    Singleton docs (no edges) are their own components and are NOT emitted —
    join the output back to the corpus with fill-null(doc_id) to materialize
    the deduplicated set.

    Adaptive (the minhash ``verify="auto"`` pattern): when the edge count is
    at most ``max_driver_edges`` the whole propagation runs as one bounded
    vectorized pass on the driver — each distributed round costs several Ray
    jobs of fixed overhead, which dwarfs the work on small dup graphs. The
    iterated-exchange path is kept for larger graphs (``mode="distributed"``
    forces it; the two paths are equivalence-tested).
    """
    if isinstance(pairs, pa.Table):
        if mode != "distributed" and len(pairs) <= max_driver_edges:
            return _components_driver(
                pairs[a_col].to_numpy(zero_copy_only=False).astype(np.int64),
                pairs[b_col].to_numpy(zero_copy_only=False).astype(np.int64),
            )
        pairs = ray.data.from_arrow(pairs.select([a_col, b_col]))
    elif mode != "distributed":
        # conservative pre-collect gate on the materialized pair count
        n_edges = pairs.count()
        if n_edges <= max_driver_edges:
            tbl = pa.concat_tables(
                [
                    b.select([a_col, b_col])
                    for b in pairs.iter_batches(
                        batch_format="pyarrow", batch_size=None
                    )
                    if b.num_rows
                ]
            ) if n_edges else pa.table({a_col: pa.array([], pa.int64()),
                                        b_col: pa.array([], pa.int64())})
            return _components_driver(
                tbl[a_col].to_numpy(zero_copy_only=False).astype(np.int64),
                tbl[b_col].to_numpy(zero_copy_only=False).astype(np.int64),
            )

    # double the edges so one directed join produces messages both ways
    def doubled(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return _tag(src % num_buckets, 1, pa.array(src), pa.array(dst))

    edges = pairs.map_batches(doubled, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return COMPONENT_SCHEMA.empty_table()

    # initial labels: identity over the distinct endpoints
    def init_labels(t: pa.Table) -> pa.Table:
        ids = np.unique(t["key"].to_numpy(zero_copy_only=False))
        return _tag(ids % num_buckets, 0, pa.array(ids), pa.array(ids))

    labels = (
        hash_bucket_aggregate(
            edges.map_batches(init_labels, batch_format="pyarrow"),
            ["key"],
            {"val": ("val", "min")},
            num_buckets=num_buckets,
        )
        .map_batches(
            lambda t: _tag(
                t["key"].to_numpy(zero_copy_only=False) % num_buckets,
                0,
                t["key"],
                t["val"],
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def label_sum(lab: ray.data.Dataset) -> int:
        return int(lab.sum("val"))

    prev_sum = label_sum(labels)

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        """Messages from one bucket's edges, after iterating the bucket's
        OWN subgraph to a local fixpoint first — chain segments that landed
        in the same bucket collapse in one global round, so global rounds
        track the number of bucket-crossings on the component's diameter
        path, not the raw diameter."""
        lab = g[g["kind"] == 0]
        e = g[g["kind"] == 1]
        if len(e) == 0:
            return _MSG_SCHEMA.empty_table()
        nodes = np.unique(
            np.concatenate([lab["key"].to_numpy(), e["key"].to_numpy(), e["val"].to_numpy()])
        )
        idx = {n: i for i, n in enumerate(nodes)}
        local = nodes.copy()  # identity fallback for foreign dst nodes
        li = np.fromiter((idx[k] for k in lab["key"]), dtype=np.int64, count=len(lab))
        np.minimum.at(local, li, lab["val"].to_numpy())
        src = np.fromiter((idx[k] for k in e["key"]), dtype=np.int64, count=len(e))
        dst = np.fromiter((idx[k] for k in e["val"]), dtype=np.int64, count=len(e))
        for _ in range(len(nodes)):  # local fixpoint, bounded
            before = local.copy()
            m = np.minimum(local[src], local[dst])
            np.minimum.at(local, src, m)
            np.minimum.at(local, dst, m)
            if np.array_equal(before, local):
                break
        out_nodes = np.unique(np.concatenate([e["key"].to_numpy(), e["val"].to_numpy()]))
        oi = np.fromiter((idx[k] for k in out_nodes), dtype=np.int64, count=len(out_nodes))
        return _tag(
            out_nodes % num_buckets,
            0,
            pa.array(out_nodes, pa.int64()),
            pa.array(local[oi], pa.int64()),
        )

    for _ in range(max_rounds):
        msgs = (
            edges.union(labels)
            .groupby("bucket")
            .map_groups(join_bucket, batch_format="pandas")
        )
        labels = (
            hash_bucket_aggregate(
                msgs.union(labels),
                ["key"],
                {"val": ("val", "min")},
                num_buckets=num_buckets,
            )
            .map_batches(
                lambda t: _tag(
                    t["key"].to_numpy(zero_copy_only=False) % num_buckets,
                    0,
                    t["key"],
                    t["val"],
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        cur = label_sum(labels)
        if cur == prev_sum:  # labels only decrease → fixpoint
            break
        prev_sum = cur

    out = pa.concat_tables(
        [
            b.select(["key", "val"])
            for b in labels.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_rows
        ]
    )
    df = (
        out.rename_columns(["doc_id", "component_id"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False).cast(COMPONENT_SCHEMA)
