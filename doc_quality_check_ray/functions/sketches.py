"""Mergeable sketches for distributed per-column statistics.

The distributed generalization of the reference's percentile analysis
(``tests/analyze_thresholds.py:107-113`` sorts all scores on one machine and
indexes percentiles) — at 10^12 rows the engine instead computes **mergeable
partials per batch** and tree-merges them:

- :class:`Histogram` — fixed-bucket counts (text length / ts ranges), the
  basis of the PSI/KL drift check;
- :class:`TDigest` — approximate quantiles, a from-scratch implementation of
  Dunning & Ertl's t-digest (public algorithm, "Computing Extremely Accurate
  Quantiles Using t-Digests", arXiv:1902.04023): centroids compressed under
  the k1 scale function; merge = concatenate + recompress, so per-batch
  digests combine associatively on the driver or in a reduce stage.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


@dataclasses.dataclass
class Histogram:
    """Fixed-bucket histogram; bucket i counts values in [edges[i], edges[i+1]);
    an overflow bucket catches values >= edges[-1]."""

    edges: tuple[float, ...]
    counts: np.ndarray  # len(edges) buckets (last = overflow)

    @staticmethod
    def empty(edges: tuple[float, ...]) -> "Histogram":
        return Histogram(tuple(edges), np.zeros(len(edges), dtype=np.int64))

    @staticmethod
    def of(values: np.ndarray, edges: tuple[float, ...]) -> "Histogram":
        h = Histogram.empty(edges)
        if len(values):
            idx = np.searchsorted(np.asarray(edges[1:]), values, side="right")
            h.counts += np.bincount(idx, minlength=len(edges)).astype(np.int64)
        return h

    def merge(self, other: "Histogram") -> "Histogram":
        assert self.edges == other.edges
        return Histogram(self.edges, self.counts + other.counts)

    def to_list(self) -> list[int]:
        return self.counts.tolist()


def psi(p_counts: np.ndarray, q_counts: np.ndarray, eps: float = 1e-6) -> float:
    """Population Stability Index between two count vectors (smoothed).

    The drift score the engine gates on — the analog of the reference's
    broadcast frequency-adjustment comparing each record's features against
    the global distribution (``modules/identity_detection.py:329-451``).
    """
    p = np.asarray(p_counts, dtype=np.float64)
    q = np.asarray(q_counts, dtype=np.float64)
    p = np.maximum(p / max(p.sum(), 1.0), eps)
    q = np.maximum(q / max(q.sum(), 1.0), eps)
    return float(np.sum((p - q) * np.log(p / q)))


def kl_divergence(p_counts: np.ndarray, q_counts: np.ndarray, eps: float = 1e-6) -> float:
    p = np.asarray(p_counts, dtype=np.float64)
    q = np.asarray(q_counts, dtype=np.float64)
    p = np.maximum(p / max(p.sum(), 1.0), eps)
    q = np.maximum(q / max(q.sum(), 1.0), eps)
    return float(np.sum(p * np.log(p / q)))


class TDigest:
    """Compact merging t-digest (k1 scale function), numpy-vectorized.

    Centroids are (mean, weight) pairs kept sorted by mean; ``compress``
    re-clusters them so each cluster's k-size stays ≤ 1 at the configured
    compression δ. Accuracy is highest at the tails (the property the
    threshold-sweep analog needs).
    """

    def __init__(self, compression: int = 200):
        self.compression = compression
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    # -- construction ------------------------------------------------------
    def add(self, values: np.ndarray) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return self
        self.means = np.concatenate([self.means, values])
        self.weights = np.concatenate([self.weights, np.ones(len(values))])
        if len(self.means) > 8 * self.compression:
            self.compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.compression)
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        out.compress()
        return out

    # -- internals ---------------------------------------------------------
    @staticmethod
    def _k1(q: np.ndarray, d: float) -> np.ndarray:
        return (d / (2 * math.pi)) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def compress(self) -> None:
        if len(self.means) == 0:
            return
        order = np.argsort(self.means, kind="mergesort")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        d = float(self.compression)
        # cumulative quantile of each centroid's left edge
        q_left = (np.cumsum(weights) - weights) / total
        k = self._k1(q_left, d)
        # vectorized clustering: unit-width bins in k-space (each bin spans a
        # k-size ≤ 1, the t-digest invariant) — fully numpy, no Python loop
        cluster = np.floor(k - k[0]).astype(np.int64)
        # relabel to consecutive ids
        _, cluster = np.unique(cluster, return_inverse=True)
        ncl = int(cluster[-1]) + 1
        w = np.bincount(cluster, weights=weights, minlength=ncl)
        m = np.bincount(cluster, weights=weights * means, minlength=ncl) / w
        self.means, self.weights = m, w

    # -- queries -----------------------------------------------------------
    def quantile(self, q: float) -> float:
        self.compress()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2
        i = np.searchsorted(cum, target)
        if i == 0:
            return float(self.means[0])
        if i >= len(self.means):
            return float(self.means[-1])
        t = (target - cum[i - 1]) / (cum[i] - cum[i - 1])
        return float(self.means[i - 1] + t * (self.means[i] - self.means[i - 1]))

    # -- serialization (rides in Arrow list<double> columns) ---------------
    def to_arrays(self) -> tuple[list[float], list[float]]:
        self.compress()
        return self.means.tolist(), self.weights.tolist()

    @staticmethod
    def from_arrays(means, weights, compression: int = 200) -> "TDigest":
        d = TDigest(compression)
        d.means = np.asarray(means, dtype=np.float64)
        d.weights = np.asarray(weights, dtype=np.float64)
        return d


class HyperLogLog:
    """Mergeable approximate distinct-count sketch (Flajolet et al. 2007,
    with the standard small-range linear-counting correction). numpy-
    vectorized over precomputed 64-bit hashes; register array of 2^p bytes.

    Used for conversation cardinality inside the per-batch stats sketch —
    the exact path (`stages/stats.py::n_distinct_conversations`) needs a key
    shuffle; the sketch rides along in phase 1 for free.
    """

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        h = np.asarray(h, dtype=np.uint64)
        if len(h) == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1, via float64 exponent
        nz = rest != 0
        lz = np.zeros(len(rest), dtype=np.uint8)
        f = rest[nz].astype(np.float64)
        lz[nz] = (63 - np.floor(np.log2(f))).astype(np.uint8) + 1
        np.maximum.at(self.registers, idx, lz)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        zeros = int(np.sum(self.registers == 0))
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)
        return float(est)

    # -- serialization -----------------------------------------------------
    def to_list(self) -> list[int]:
        return self.registers.tolist()

    @staticmethod
    def from_list(regs: list[int], p: int = 12) -> "HyperLogLog":
        h = HyperLogLog(p)
        h.registers = np.asarray(regs, dtype=np.uint8)
        return h
