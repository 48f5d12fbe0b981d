"""Connected components: multi-node chains and cliques, convergence, and the
min-canonical contract."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from doc_quality_check_ray.stages.graph import connected_components


def _pairs(edges):
    return pa.table(
        {
            "a_id": pa.array([a for a, _ in edges], pa.int64()),
            "b_id": pa.array([b for _, b in edges], pa.int64()),
        }
    )


def test_chain_and_triangle_and_pair():
    # chain 1-2-3-4-5 (diameter 4 → needs >1 propagation round),
    # triangle 10-11-12, disjoint pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    out = connected_components(_pairs(edges)).to_pylist()
    got = {r["doc_id"]: r["component_id"] for r in out}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_from_dataset_and_empty():
    ds = ray.data.from_arrow(_pairs([(7, 3), (3, 9)]))
    got = {r["doc_id"]: r["component_id"] for r in connected_components(ds).to_pylist()}
    assert got == {3: 3, 7: 3, 9: 3}
    empty = connected_components(_pairs([]))
    assert empty.num_rows == 0


def test_long_chain_converges():
    # a path is the worst case for min propagation (rounds track the
    # bucket-crossings along the diameter; the in-bucket local fixpoint
    # collapses same-bucket segments per round — with 2 buckets the doubled
    # edges of this chain collapse in a couple of rounds); forced onto the
    # distributed path so the exchange loop stays covered past the gate
    n = 9
    edges = [(i, i + 1) for i in range(n)]
    out = connected_components(
        _pairs(edges), num_buckets=2, mode="distributed"
    ).to_pylist()
    assert all(r["component_id"] == 0 for r in out)
    assert len(out) == n + 1


def test_driver_and_distributed_paths_agree():
    # random-ish multi-component graph: chains, cliques, self-merging cycles
    import numpy as np

    rng = np.random.RandomState(7)
    edges = [(int(a), int(b)) for a, b in rng.randint(0, 60, size=(120, 2)) if a != b]
    drv = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(_pairs(edges)).to_pylist()
    }
    dist = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(
            _pairs(edges), mode="distributed", num_buckets=4
        ).to_pylist()
    }
    assert drv == dist and len(drv) > 0
