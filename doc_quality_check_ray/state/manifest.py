"""Per-shard completion manifests — resumable output without a metastore.

The reference regenerates its auto-numbered report folder per run
(``test_readability.py:963-975``); at 100 TB a failed run must instead skip
finished work. Layout (SURVEY.md §4.2 "checkpoint/resume"):

    out/
      row_violations/shard=<id>/*.parquet      per-shard violation rows
      key_partials/shard=<id>/*.parquet        distinct-key partial counts
      sketches/shard-<id>.json                 per-shard stats sketch
      _manifest/shard-<id>.json                completion marker + lineage/metrics
      global/...                               phase-2 outputs (idempotent)

A shard is complete **iff** its manifest file exists. Manifests are written
LAST, atomically (temp file + ``os.replace``), after every shard output has
itself been moved into place — a killed run can leave orphan temp dirs but can
never record an unfinished shard as done.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from pathlib import Path
from typing import Any


class RunManifest:
    def __init__(self, out_dir: str | Path):
        self.out = Path(out_dir)
        self.mdir = self.out / "_manifest"
        self.mdir.mkdir(parents=True, exist_ok=True)

    # -- shard lifecycle ---------------------------------------------------
    def completed_shards(self) -> set[str]:
        return {p.stem.removeprefix("shard-") for p in self.mdir.glob("shard-*.json")}

    def shard_entry(self, shard_id: str) -> dict[str, Any]:
        return json.loads((self.mdir / f"shard-{shard_id}.json").read_text())

    def mark_complete(self, shard_id: str, entry: dict[str, Any]) -> None:
        _atomic_write_json(self.mdir / f"shard-{shard_id}.json", entry)

    # -- run-level metadata ------------------------------------------------
    def write_run_summary(self, summary: dict[str, Any]) -> None:
        _atomic_write_json(self.out / "run_summary.json", summary)

    def read_run_summary(self) -> dict[str, Any] | None:
        p = self.out / "run_summary.json"
        return json.loads(p.read_text()) if p.exists() else None


def _atomic_write_json(path: Path, obj: dict[str, Any]) -> None:
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f, default=str)
    os.replace(tmp, path)


def atomic_output_dir(final_dir: str | Path):
    """Context manager: yield a temp dir; on success rename it into place.

    ``os.replace`` of a directory is atomic on POSIX when the target doesn't
    exist; a pre-existing target (from a previous partial attempt whose
    manifest was never written) is removed first — safe because absence of a
    manifest means the shard is incomplete by definition.
    """
    return _AtomicDir(Path(final_dir))


class _AtomicDir:
    def __init__(self, final: Path):
        self.final = final
        self.tmp = final.parent / f".tmp-{final.name}-{os.getpid()}"

    def __enter__(self) -> Path:
        self.final.parent.mkdir(parents=True, exist_ok=True)
        if self.tmp.exists():
            shutil.rmtree(self.tmp)
        self.tmp.mkdir(parents=True)
        return self.tmp

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            if self.final.exists():
                shutil.rmtree(self.final)
            os.replace(self.tmp, self.final)
        else:
            shutil.rmtree(self.tmp, ignore_errors=True)
        return False
