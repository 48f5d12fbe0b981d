"""Connected-components stress evidence at the distributed scale path
(VERDICT r4 #5): a skewed near-clique + long-chain mixed graph at >=10^6
edges, forced onto the one-exchange-per-round loop, with wall / rounds /
buckets reported for BASELINE.md.

The graph's components are known BY CONSTRUCTION (disjoint id ranges per
component), so correctness is verified exactly without an O(E * diameter)
driver pass:

  - one id-permuted chain of ``--chain`` nodes (diameter = chain length —
    the pointer-doubling worst case; permuted ids defeat the in-bucket
    local-fixpoint collapse),
  - one skewed near-clique: ``--hot`` nodes with hub-weighted random edges
    (heavy key skew on the hub — the bucket-balance worst case),
  - scattered small random components filling the edge budget.

Usage:  python tools/cc_stress.py [--edges 1400000] [--buckets 64]
Prints one JSON line: {edges, nodes, buckets, rounds, wall_sec, converged,
correct, diameter, log2_diameter}.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_graph(n_chain: int, n_hot: int, n_edges_total: int, seed: int = 7):
    """Edge list + exact expected (doc_id -> component_min) mapping."""
    rng = np.random.RandomState(seed)

    # ids: three disjoint ranges so components can never bridge
    chain_ids = rng.permutation(np.arange(0, 2 * n_chain, dtype=np.int64))[:n_chain]
    hot_base = np.int64(2 * n_chain)
    hot_ids = hot_base + np.arange(n_hot, dtype=np.int64)
    small_base = hot_base + n_hot

    edges_a = [chain_ids[:-1]]
    edges_b = [chain_ids[1:]]
    expected = {int(i): int(chain_ids.min()) for i in chain_ids}

    # skewed near-clique: hub-weighted endpoints (zipf-ish skew on node 0)
    n_hot_edges = max(n_edges_total // 4, n_hot)
    w = 1.0 / np.arange(1, n_hot + 1)
    p = w / w.sum()
    a = hot_ids[rng.choice(n_hot, n_hot_edges, p=p)]
    b = hot_ids[rng.choice(n_hot, n_hot_edges, p=p)]
    keep = a != b
    a, b = a[keep], b[keep]
    # spanning path guarantees one component regardless of the random draw
    edges_a += [a, hot_ids[:-1]]
    edges_b += [b, hot_ids[1:]]
    expected.update({int(i): int(hot_ids.min()) for i in hot_ids})

    # scattered 8-node random components to fill the budget
    used = (n_chain - 1) + len(a) + (n_hot - 1)
    n_small = max(n_edges_total - used, 0)
    if n_small:
        comp = np.arange(n_small, dtype=np.int64) // 7  # 7 edges per component
        first = small_base + comp * 8
        off_a = rng.randint(0, 8, n_small).astype(np.int64)
        off_b = rng.randint(0, 8, n_small).astype(np.int64)
        bump = off_a == off_b
        off_b[bump] = (off_b[bump] + 1) % 8
        sa, sb = first + off_a, first + off_b
        # spanning chains inside each 8-node block keep membership exact
        blk = np.unique(comp)
        span_first = small_base + blk * 8
        span_a = np.concatenate([span_first + k for k in range(7)])
        span_b = span_a + 1
        edges_a += [sa, span_a]
        edges_b += [sb, span_b]
        for f in span_first:
            for k in range(8):
                expected[int(f + k)] = int(f)

    a_all = np.concatenate(edges_a)
    b_all = np.concatenate(edges_b)
    pairs = pa.table(
        {"a_id": pa.array(a_all, pa.int64()), "b_id": pa.array(b_all, pa.int64())}
    )
    return pairs, expected, n_chain  # diameter = chain length (worst case)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=1_400_000)
    ap.add_argument("--chain", type=int, default=1_000_000)
    ap.add_argument("--hot", type=int, default=2000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from doc_quality_check_ray.stages.graph import connected_components

    pairs, expected, diameter = build_graph(args.chain, args.hot, args.edges)

    stats: dict = {}
    t0 = time.perf_counter()
    out = connected_components(
        pairs, mode="distributed", num_buckets=args.buckets, stats=stats
    )
    # consume stream-side: compare against expectation batch by batch
    n_checked, n_wrong = 0, 0
    for b in out.iter_batches(batch_format="pyarrow", batch_size=65536):
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        lab = b["component_id"].to_numpy(zero_copy_only=False)
        want = np.fromiter((expected[int(i)] for i in ids), np.int64, len(ids))
        n_checked += len(ids)
        n_wrong += int((lab != want).sum())
    wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "edges": pairs.num_rows,
                "nodes": len(expected),
                "buckets": args.buckets,
                "rounds": stats["rounds"],
                "wall_sec": round(wall, 2),
                "converged": stats["converged"],
                "correct": n_wrong == 0 and n_checked == len(expected),
                "n_checked": n_checked,
                "diameter": diameter,
                "log2_diameter": round(math.log2(diameter), 2),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
