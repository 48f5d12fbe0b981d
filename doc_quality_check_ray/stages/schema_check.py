"""Schema conformance validation — the "schema" half of the engine.

The reference has no declared schema (rows are dicts with conditionally
present keys, ``app.py:383-400``); this engine declares one
(:data:`~doc_quality_check_ray.schema.TRANSCRIPT_SCHEMA`) and validates every
input against it before any row check runs: missing / extra / mistyped
columns become findings with a configurable severity, mirroring how the
reference's per-file guard downgrades malformed inputs to error rows rather
than aborting (M18, ``test_readability.py:257-271``).

Cheap by construction: the check reads only Parquet *metadata* (unified
dataset schema), never data.
"""

from __future__ import annotations

import dataclasses

import pyarrow as pa

from ..schema import TRANSCRIPT_SCHEMA


@dataclasses.dataclass(frozen=True)
class SchemaFinding:
    column: str
    problem: str  # 'missing' | 'extra' | 'type_mismatch'
    expected: str | None
    actual: str | None


def check_schema(
    actual: pa.Schema, expected: pa.Schema = TRANSCRIPT_SCHEMA
) -> list[SchemaFinding]:
    """Compare an input schema against the declared one.

    - ``missing``: declared column absent (Arrow unification will null-fill;
      row checks then flag the nulls — surfaced here so the root cause is
      visible at the schema level).
    - ``type_mismatch``: same name, incompatible type (would abort the read).
    - ``extra``: undeclared column (harmless — projected away — but reported).
    """
    findings: list[SchemaFinding] = []
    actual_by_name = {f.name: f for f in actual}
    for f in expected:
        a = actual_by_name.get(f.name)
        if a is None:
            findings.append(SchemaFinding(f.name, "missing", str(f.type), None))
        elif a.type != f.type:
            findings.append(
                SchemaFinding(f.name, "type_mismatch", str(f.type), str(a.type))
            )
    for name in actual.names:
        if name not in expected.names:
            findings.append(
                SchemaFinding(name, "extra", None, str(actual_by_name[name].type))
            )
    return findings


def check_parquet_schema(
    files: list[str], expected: pa.Schema = TRANSCRIPT_SCHEMA
) -> dict:
    """Metadata-only schema validation over input files.

    Returns ``{ok, findings, per_file}`` where ``per_file`` lists files whose
    physical schema deviates from the unified view (mixed-schema corpora).
    """
    import pyarrow.parquet as pq

    per_file: dict[str, list[dict]] = {}
    all_ok = True
    for f in files:
        s = pq.read_schema(f)
        fnd = check_schema(s, expected)
        if fnd:
            all_ok = all(x.problem == "extra" for x in fnd) and all_ok
            per_file[f] = [dataclasses.asdict(x) for x in fnd]
    return {"ok": all_ok, "n_files_checked": len(files), "per_file": per_file}
