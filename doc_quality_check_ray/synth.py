"""Deterministic synthetic transcript generator with planted violations.

The in-repo analog of the reference's labeled conformance corpus
(``/root/reference/dataset/``: ``valid-pdfs/``, ``empty-pdfs/``,
``unclear-pdfs/``, ``big-pdf-but-readable/`` — ``tests/analyze_thresholds.py:20-26``):
each plant kind is one labeled defect class and the generator returns the
exact expected violation keys, so tests assert planted == reported
(FIXTURES.md).

Pure function of ``(seed, n_convs, turns_per_conv, plant, …)``; fully
vectorized (numpy) so the bench harness can scale it to millions of rows.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa

from .schema import TRANSCRIPT_SCHEMA

_BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")

# Small seeded sentence bank; texts are picked by index (fast at any scale).
_WORDS = (
    "the quick brown fox jumps over a lazy dog while agents plan tools call "
    "results stream batches shuffle merge sort filter join window state "
    "model token prompt answer check verify quality data table row column"
).split()


@dataclasses.dataclass(frozen=True)
class PlantSpec:
    """How many violations of each kind to plant (0 = clean fixture)."""

    empty: int = 0
    whitespace: int = 0
    garbage: int = 0
    bad_role: int = 0
    tool_on_user: int = 0
    tool_missing: int = 0
    dup_rows: int = 0
    gap_convs: int = 0
    #: one extra conversation with this many turns (skew fixture, the
    #: ``big-pdf-but-readable`` analog); 0 = none.
    hot_conv_turns: int = 0


CLEAN = PlantSpec()
DEFAULT_PLANT = PlantSpec(
    empty=5, whitespace=3, garbage=6, bad_role=4, tool_on_user=3,
    tool_missing=3, dup_rows=4, gap_convs=3,
)


def _sentence_bank(rng: np.random.Generator, n: int = 512, length_scale: float = 1.0) -> np.ndarray:
    lens = np.maximum(3, (rng.gamma(4.0, 4.0 * length_scale, n)).astype(int))
    return np.array(
        [" ".join(rng.choice(_WORDS, size=L)) for L in lens], dtype=object
    )


def synth_transcripts(
    n_convs: int = 100,
    turns_per_conv: int = 8,
    seed: int = 7,
    plant: PlantSpec = CLEAN,
    role_weights: tuple[float, float, float] = (0.45, 0.45, 0.10),
    length_scale: float = 1.0,
) -> tuple[pa.Table, dict[str, set]]:
    """Generate a transcript table plus the exact expected violation keys.

    Returns ``(table, expected)`` where ``expected`` maps check_id →
    set of ``(conv_id, turn_idx)`` (row checks / duplicate_key) or set of
    ``conv_id`` (turn_gap).
    """
    rng = np.random.default_rng(seed)
    bank = _sentence_bank(rng, length_scale=length_scale)

    sizes = np.full(n_convs, turns_per_conv, dtype=np.int64)
    if plant.hot_conv_turns:
        sizes = np.concatenate([sizes, [plant.hot_conv_turns]])
    n = int(sizes.sum())
    conv_num = np.repeat(np.arange(len(sizes)), sizes)
    conv_id = np.char.add("s", np.char.zfill(conv_num.astype("U20"), 8)).astype(object)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    turn_idx = (np.arange(n) - np.repeat(starts, sizes)).astype(np.int64)

    # roles: deterministic per-row draw; tool rows get a tool name.
    r = rng.random(n)
    w_user, w_asst, _ = role_weights
    role = np.where(
        r < w_user, "user", np.where(r < w_user + w_asst, "assistant", "tool")
    ).astype(object)
    tool = np.where(role == "tool", "web_search", None)
    text = bank[rng.integers(0, len(bank), n)].copy()
    ts = _BASE_TS + (np.arange(n) * 1_000_000).astype("timedelta64[us]")

    expected: dict[str, set] = {
        "empty_turn": set(),
        "invalid_role": set(),
        "tool_role_consistency": set(),
        "low_quality_text": set(),
        "duplicate_key": set(),
        "turn_gap": set(),
    }

    def key(i):
        return (conv_id[i], int(turn_idx[i]))

    # choose distinct victim rows for row-level plants
    n_row_plants = (
        plant.empty + plant.whitespace + plant.garbage + plant.bad_role
        + plant.tool_on_user + plant.tool_missing
    )
    victims = rng.choice(n, size=min(n_row_plants, n), replace=False)
    it = iter(victims)

    for _ in range(plant.empty):
        i = next(it); text[i] = ""; expected["empty_turn"].add(key(i))
    for _ in range(plant.whitespace):
        i = next(it); text[i] = "   "; expected["empty_turn"].add(key(i))
    for _ in range(plant.garbage):
        i = next(it); text[i] = "???? ???? #### @@@@ %%%%"
        expected["low_quality_text"].add(key(i))
    for _ in range(plant.bad_role):
        i = next(it); role[i] = "agent"
        expected["invalid_role"].add(key(i))
        if tool[i] is not None:  # role no longer 'tool' → unexpected tool
            expected["tool_role_consistency"].add(key(i))
    for _ in range(plant.tool_on_user):
        i = next(it)
        role[i] = "user"; tool[i] = "search"
        expected["tool_role_consistency"].add(key(i))
    for _ in range(plant.tool_missing):
        i = next(it)
        role[i] = "tool"; tool[i] = None
        expected["tool_role_consistency"].add(key(i))

    # gaps: shift turn_idx by +1 from position 2 onward in chosen convs
    gap_convs = rng.choice(n_convs, size=min(plant.gap_convs, n_convs), replace=False)
    for c in gap_convs:
        lo, hi = starts[c], starts[c] + sizes[c]
        turn_idx[lo + 2 : hi] += 1
        expected["turn_gap"].add(f"s{c:08d}")

    cols = {
        "conv_id": conv_id, "turn_idx": turn_idx, "role": role,
        "text": text, "tool": tool, "ts": ts,
    }

    # duplicates: re-append chosen rows (post-gap so keys match final values)
    if plant.dup_rows:
        dup_idx = rng.choice(n, size=min(plant.dup_rows, n), replace=False)
        for i in dup_idx:
            expected["duplicate_key"].add(key(i))
            expected["turn_gap"].add(str(conv_id[i]))
        cols = {k: np.concatenate([v, v[dup_idx]]) for k, v in cols.items()}

    table = pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    return table, expected


def write_transcripts_parquet(
    path: str,
    n_convs: int,
    turns_per_conv: int = 8,
    seed: int = 7,
    plant: PlantSpec = CLEAN,
    convs_per_file: int = 50_000,
    **kw,
) -> None:
    """Write a (possibly large) synthetic corpus as multiple parquet files —
    chunked by conversation range so generation memory stays bounded and the
    layout mirrors a partitioned production table."""
    import pyarrow.parquet as pq
    from pathlib import Path

    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)
    part = 0
    for lo in range(0, n_convs, convs_per_file):
        k = min(convs_per_file, n_convs - lo)
        tbl, _ = synth_transcripts(
            n_convs=k, turns_per_conv=turns_per_conv, seed=seed + part,
            plant=plant, **kw,
        )
        # shift conv ids into this chunk's range for global uniqueness
        nums = np.char.add(
            "s",
            np.char.zfill(
                (np.array([int(c[1:]) for c in tbl["conv_id"].to_pylist()]) + lo)
                .astype("U20"),
                8,
            ),
        )
        tbl = tbl.set_column(0, "conv_id", pa.array(nums.astype(object), pa.string()))
        # modest row groups: Ray parallelizes parquet reads at row-group
        # granularity, so one giant row group serializes the whole file scan
        pq.write_table(tbl, out / f"part-{part:05d}.parquet", row_group_size=32 * 1024)
        part += 1
