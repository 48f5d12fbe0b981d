"""Reference stats snapshots — the broadcastable state of the drift check.

Analog of the reference's global keyword-frequency dict: built once over all
records (``modules/identity_detection.py:261-327``), then broadcast back into a
per-record adjustment pass (``:329-451``). Here: per-column distribution
sketches built in one streaming pass, persisted as JSON, `ray.put` once and
read inside every drift-checker actor (SURVEY.md §2.6 A1/A2).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

from ..functions.sketches import Histogram, TDigest


@dataclasses.dataclass
class StatsSnapshot:
    n_rows: int
    role_counts: dict[str, int]  # null key stored as '<null>'
    length_edges: tuple[float, ...]
    length_hist: list[int]
    tdigest_means: list[float]
    tdigest_weights: list[float]
    ts_min: str | None
    ts_max: str | None
    #: t-digest over epoch-microsecond timestamps (the "timestamp-range
    #: histogram" sketch) — quantiles of the time distribution.
    ts_tdigest_means: list[float] = dataclasses.field(default_factory=list)
    ts_tdigest_weights: list[float] = dataclasses.field(default_factory=list)
    #: exact max text length (mergeable via max)
    max_text_len: int | None = None
    #: base64-packed HyperLogLog registers (conversation cardinality sketch)
    hll_b64: str | None = None
    #: max multiplicity of one conversation within any single scanned batch
    #: (mergeable via max) — the hot-conversation probe that auto-selects
    #: the salted key-finding path in phase 2
    max_conv_batch: int | None = None

    def n_convs_estimate(self) -> float | None:
        if not self.hll_b64:
            return None
        import base64

        from ..functions.sketches import HyperLogLog

        regs = np.frombuffer(base64.b64decode(self.hll_b64), dtype=np.uint8)
        return HyperLogLog.from_list(regs).estimate()

    # -- derived exact counts (hist/digest weights are exhaustive over
    # non-null values, so null counts fall out of the totals) --------------
    def null_text_count(self) -> int:
        return self.n_rows - int(sum(self.length_hist))

    def null_role_count(self) -> int:
        return int(self.role_counts.get("<null>", 0))

    def null_ts_count(self) -> int:
        return self.n_rows - int(sum(self.ts_tdigest_weights))

    # -- persistence -------------------------------------------------------
    def save(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(dataclasses.asdict(self), default=str))

    @staticmethod
    def load(path: str | Path) -> "StatsSnapshot":
        raw = json.loads(Path(path).read_text())
        raw["length_edges"] = tuple(raw["length_edges"])
        return StatsSnapshot(**raw)

    # -- views -------------------------------------------------------------
    def role_vector(self, domain: list[str]) -> np.ndarray:
        return np.array([self.role_counts.get(r, 0) for r in domain], dtype=np.int64)

    def length_histogram(self) -> Histogram:
        return Histogram(self.length_edges, np.asarray(self.length_hist, dtype=np.int64))

    def tdigest(self) -> TDigest:
        return TDigest.from_arrays(self.tdigest_means, self.tdigest_weights)

    def ts_tdigest(self) -> TDigest:
        return TDigest.from_arrays(self.ts_tdigest_means, self.ts_tdigest_weights)
