"""Deduplication operators over document tables: exact, MinHash-LSH, SimHash,
and exact n-gram Jaccard.

The reference's only dedup ops are set-based file dedup
(``test_readability.py:153-164``) and geometric IoU near-dup suppression
(``modules/document_segmentation.py:143-228``); at training-data scale these
generalize to content dedup (SURVEY.md §2.8 D1-D3):

- **exact**: fingerprint (md5) → hash-partitioned groupby → keep min id.
  Shuffles 16-byte fingerprints, never text.
- **MinHash-LSH**: shingle → minhash → banded signatures → band-bucket
  groupby → candidate pairs → distributed pair-dedup → exact-Jaccard
  verification via hash-bucket joins against the shingle table. No
  data-proportional driver materialization anywhere; band-bucket pair
  blowup is capped with LOGGED truncation.
- **SimHash**: 64-bit sketches, 4×16-bit band buckets, in-reducer Hamming
  verification, distributed pair-dedup.
- **n-gram Jaccard**: exact all-pairs within a partition key (here
  ``source``) via ``groupby.map_groups`` — the brute-force baseline LSH
  recall is measured against.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .exchange import hash_bucket_aggregate
from ..functions.rounding import round_half_away, round_half_away_scalar
from ..functions.hashing import (
    band_hashes,
    gram_hashes,
    hamming_distance,
    jaccard,
    md5_fingerprints,
    minhash_signatures,
    shingle_hashes,
    simhash,
    token_hashes,
)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """One row per distinct content: (fingerprint, keep_id, n_copies).

    md5-keyed so the shuffle carries 32-char keys instead of documents;
    md5 equality stands in for text equality (collision odds ~2^-64 at
    10^12 docs — acceptable for dedup; the oracle uses the same key).
    """

    def partial(t: pa.Table) -> pa.Table:
        fp = pa.array(md5_fingerprints(t[text_col].to_pylist()), pa.string())
        g = (
            pa.table({"fingerprint": fp, id_col: t[id_col]})
            .group_by("fingerprint")
            .aggregate([(id_col, "min"), ([], "count_all")])
        )
        return g.rename_columns(["fingerprint", "keep_id", "n_copies"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return hash_bucket_aggregate(
        partials,
        ["fingerprint"],
        {"keep_id": ("keep_id", "min"), "n_copies": ("n_copies", "sum")},
    )


def exact_dedup_keep_first(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 256,
) -> ray.data.Dataset:
    """The deduplicated dataset itself: first (min-id) row per content.

    One fingerprint-keyed hash-bucket shuffle: every row moves to the bucket
    of its content fingerprint, each bucket keeps the min-id row per
    fingerprint. Nothing data-proportional ever touches the driver (the
    round-1 broadcast-id-set variant pulled one id per distinct content to
    the driver — billions of ids at 100 TB). Null-text rows form one
    fingerprint group (DuckDB ``md5(NULL)`` semantics) and keep their min-id
    representative.
    """
    import numpy as np
    import polars as pl

    def add_bucket(t: pa.Table) -> pa.Table:
        fp = pa.array(md5_fingerprints(t[text_col].to_pylist()), pa.string())
        t = t.append_column("__fp", fp)
        h = pl.from_arrow(pa.table({"f": fp})).hash_rows(seed=11).to_numpy()
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        # null fingerprints (null text) compare equal here — one group
        g = g.drop_duplicates("__fp", keep="first")
        return g.drop(columns=["__fp", "__bucket"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(keep_first, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

logger = logging.getLogger(__name__)


def _signature_batches(
    t: pa.Table, text_col: str, id_col: str, num_perm: int, bands: int, k: int
) -> pa.Table:
    """Batch → exploded (doc_id, band_id, band_hash) rows."""
    toks, offs = token_hashes(t[text_col])
    sh, sh_offs = shingle_hashes(toks, offs, k=k)
    sig = minhash_signatures(sh, sh_offs, num_perm=num_perm)
    bh = band_hashes(sig, bands=bands)
    n = len(bh)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.ravel(), pa.uint64()),
        }
    )


def _grouped_triu_pairs(
    starts: np.ndarray, lens: np.ndarray, d: np.ndarray, max_bucket: int,
    what: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized all-pairs expansion over RLE runs of a sorted-by-group
    array ``d`` (doc ids, ascending and distinct within each run): runs are
    bucketed by length so pair generation is one fancy-index +
    ``triu_indices`` broadcast per DISTINCT run length. Runs longer than
    ``max_bucket`` are clipped to their first ``max_bucket`` ids with a
    logged warning (the cap bounds worst-case pair blowup on degenerate hot
    buckets — truncation reduces recall and the operator says so)."""
    sel = lens > 1
    starts_m, lens_m = starts[sel], lens[sel]
    for m in lens_m[lens_m > max_bucket]:
        logger.warning(
            "%s truncated: keeping %d of %d ids "
            "(%d candidate ids dropped; raise max_bucket to trade memory for recall)",
            what, max_bucket, m, m - max_bucket,
        )
    lens_m = np.minimum(lens_m, max_bucket)
    a_parts, b_parts = [], []
    for m in np.unique(lens_m):
        s_m = starts_m[lens_m == m]
        docs = d[s_m[:, None] + np.arange(m)]
        r, c = np.triu_indices(int(m), k=1)
        a_parts.append(docs[:, r].ravel())
        b_parts.append(docs[:, c].ravel())
    if not a_parts:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    return np.concatenate(a_parts), np.concatenate(b_parts)


def _dedup_pairs(pairs: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """Distributed drop-duplicates on (a_id, b_id) — replaces the round-1
    driver-side ``to_pandas().drop_duplicates()`` (a scale-killer when the
    candidate set is data-proportional)."""

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__pb"] = (
            df["a_id"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ df["b_id"].to_numpy().astype(np.uint64)
        ) % np.uint64(num_buckets)
        df["__pb"] = df["__pb"].astype("int64")
        return df

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a_id", "b_id"]).drop(columns="__pb")

    return (
        pairs.map_batches(bucketize, batch_format="pandas")
        .groupby("__pb")
        .map_groups(dd, batch_format="pandas")
    )


def _shingle_rows(ds, text_col: str, id_col: str, k: int) -> ray.data.Dataset:
    """(doc_id, sh large_list<uint64>) per document — the join payload for
    distributed verification. Arrow throughout (nullable list columns survive
    Ray block concatenation; pandas object columns of ndarrays do not)."""

    def fn(t: pa.Table) -> pa.Table:
        toks, offs = token_hashes(t[text_col])
        sh, so = shingle_hashes(toks, offs, k=k)
        return pa.table(
            {
                "doc_id": pc.cast(t[id_col], pa.int64()),
                "sh": pa.LargeListArray.from_arrays(
                    pa.array(so, pa.int64()), pa.array(sh, pa.uint64())
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_SH_LIST = pa.large_list(pa.uint64())
#: unified row shape for the verification joins (pairs and shingle payloads)
_JOIN_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("kind", pa.int8()),
        ("a_id", pa.int64()),
        ("b_id", pa.int64()),
        ("sh", _SH_LIST),
    ]
)
_VERIFIED_SCHEMA = pa.schema(
    [("a_id", pa.int64()), ("b_id", pa.int64()), ("jaccard", pa.float64())]
)


def _tagged(bucket, kind: int, a_id, b_id, sh) -> pa.Table:
    n = len(bucket)
    return pa.table(
        {
            "bucket": pa.array(bucket, pa.int64()),
            "kind": pa.array([kind] * n, pa.int8()),
            "a_id": pc.cast(a_id, pa.int64()),
            "b_id": pc.cast(b_id, pa.int64()),
            "sh": sh if sh is not None else pa.nulls(n, _SH_LIST),
        },
        schema=_JOIN_SCHEMA,
    )


def _verify_pairs_distributed(
    pairs: ray.data.Dataset,
    shingle_ds: ray.data.Dataset,
    threshold: float,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact-Jaccard verification of candidate pairs as two hash-bucket
    joins — pairs meet the a-side shingle sets in buckets keyed by a_id,
    the half-joined rows meet the b-side sets in buckets keyed by b_id, and
    the second reducer scores + filters. No driver materialization anywhere;
    the shingle table is shuffled twice (proportional to corpus, like the
    signature scan itself), candidates flow bucket-local.
    """

    def tag_pairs_a(df: pd.DataFrame) -> pa.Table:
        a = pa.array(df["a_id"].to_numpy(), pa.int64())
        b = pa.array(df["b_id"].to_numpy(), pa.int64())
        return _tagged(df["a_id"].to_numpy() % num_buckets, 1, a, b, None)

    def tag_sh(t: pa.Table, side: int) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        minus = pa.array(np.full(len(ids), -1, dtype=np.int64))
        col = t["doc_id"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sh = t["sh"]
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        a_id, b_id = (col, minus) if side == 0 else (minus, col)
        return _tagged(ids % num_buckets, 0, a_id, b_id, sh)

    def join_a(g: pa.Table) -> pa.Table:
        p = g.filter(pc.equal(g["kind"], 1))
        if p.num_rows == 0:
            return _JOIN_SCHEMA.empty_table()
        # global pair-dedup happens here for free: every copy of (a, b) has
        # the same a_id, so all copies land in this bucket
        pdf = p.select(["a_id", "b_id"]).to_pandas().drop_duplicates(["a_id", "b_id"])
        srows = g.filter(pc.equal(g["kind"], 0))
        lut = dict(zip(srows["a_id"].to_pylist(), srows["sh"].to_pylist()))
        a_ids = pdf["a_id"].tolist()
        b_ids = pdf["b_id"].tolist()
        return _tagged(
            np.asarray(b_ids, dtype=np.int64) % num_buckets,
            1,
            pa.array(a_ids, pa.int64()),
            pa.array(b_ids, pa.int64()),
            pa.array([lut.get(a) for a in a_ids], _SH_LIST),
        )

    half = (
        pairs.map_batches(tag_pairs_a, batch_format="pandas")
        .union(shingle_ds.map_batches(lambda t: tag_sh(t, 0), batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(join_a, batch_format="pyarrow")
    )

    def join_b(g: pa.Table) -> pa.Table:
        p = g.filter(pc.equal(g["kind"], 1))
        if p.num_rows == 0:
            return _VERIFIED_SCHEMA.empty_table()
        srows = g.filter(pc.equal(g["kind"], 0))
        lut = dict(zip(srows["b_id"].to_pylist(), srows["sh"].to_pylist()))
        out_a, out_b, out_j = [], [], []
        for a, b, a_sh in zip(
            p["a_id"].to_pylist(), p["b_id"].to_pylist(), p["sh"].to_pylist()
        ):
            b_sh = lut.get(b)
            if a_sh is None or b_sh is None:
                continue
            sim = jaccard(
                np.asarray(a_sh, dtype=np.uint64), np.asarray(b_sh, dtype=np.uint64)
            )
            if sim >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(round_half_away_scalar(sim, 6))
        return pa.table(
            {
                "a_id": pa.array(out_a, pa.int64()),
                "b_id": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            },
            schema=_VERIFIED_SCHEMA,
        )

    return (
        half.union(
            shingle_ds.map_batches(lambda t: tag_sh(t, 1), batch_format="pyarrow")
        )
        .groupby("bucket")
        .map_groups(join_b, batch_format="pyarrow")
    )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 256,
    verify: str = "auto",
    max_driver_pairs: int = 65_536,
) -> pa.Table:
    """Near-duplicate pairs (a_id < b_id, jaccard ≥ threshold).

    shingle → minhash → banded signatures → band-bucket exchange →
    candidate pairs → exact-Jaccard verification. Verification is adaptive
    (the broadcast-vs-shuffle join decision): with ``verify="auto"`` a
    candidate set whose PRE-dedup count is at most ``max_driver_pairs``
    (a conservative bound — cross-bucket dedup only shrinks it) verifies
    driver-side against a bounded shingle lookup — the fast path when
    near-dups are rare — while anything larger takes the fully distributed
    hash-bucket joins of :func:`_verify_pairs_distributed` (no
    data-proportional driver materialization; the gate makes the driver
    path's memory bounded by construction). ``verify="distributed"`` forces
    the scale path. Band-bucket pair blowup is capped at ``max_bucket`` ids
    per bucket with logged truncation. Deterministic (seeded permutations);
    jaccard rounded to 6 decimals.
    """
    band_rows = ds.map_batches(
        lambda t: _signature_batches(t, text_col, id_col, num_perm, bands, shingle_k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def bucketize(t: pa.Table) -> pa.Table:
        b = (t["band_hash"].to_numpy(zero_copy_only=False) % np.uint64(256)).astype(
            np.int64
        )
        return t.append_column("bucket", pa.array(b))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized pair expansion over every (band_id, band_hash) group in
        the bucket at once: lexsort-RLE into runs, then
        :func:`_grouped_triu_pairs` — no Python loop over band groups."""
        empty = pd.DataFrame(
            {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64")}
        )
        bid = g["band_id"].to_numpy().astype(np.int64)
        bh = g["band_hash"].to_numpy()
        d = g["doc_id"].to_numpy()
        order = np.lexsort((d, bh, bid))
        b1, b2, dd = bid[order], bh[order], d[order]
        keep = np.ones(len(dd), bool)
        keep[1:] = (b1[1:] != b1[:-1]) | (b2[1:] != b2[:-1]) | (dd[1:] != dd[:-1])
        b1, b2, dd = b1[keep], b2[keep], dd[keep]
        starts = np.flatnonzero(
            np.r_[True, (b1[1:] != b1[:-1]) | (b2[1:] != b2[:-1])]
        )
        lens = np.diff(np.append(starts, len(dd)))
        a, b = _grouped_triu_pairs(starts, lens, dd, max_bucket, "LSH band bucket")
        if not len(a):
            return empty
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        st = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pd.DataFrame(
            {"a_id": a[st].astype("int64"), "b_id": b[st].astype("int64")}
        )

    cand = (
        band_rows.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .materialize()  # consumed by count + verify; pairs are 16 B/row
    )

    empty = pa.table(
        {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())}
    )
    n_cand = cand.count()
    if n_cand == 0:
        return empty

    if verify == "driver" or (verify == "auto" and n_cand <= max_driver_pairs):
        pairs = cand.to_pandas().drop_duplicates(["a_id", "b_id"])
        ids = sorted(set(pairs["a_id"]) | set(pairs["b_id"]))
        shingles = _collect_shingles_bounded(ds, ids, text_col, id_col, shingle_k)
        sims = np.array(
            [
                jaccard(shingles[a], shingles[b])
                for a, b in zip(pairs["a_id"], pairs["b_id"])
            ]
        )
        keep = sims >= threshold
        out = pairs[keep]
        verified = pd.DataFrame(
            {
                "a_id": out["a_id"].astype("int64"),
                "b_id": out["b_id"].astype("int64"),
                "jaccard": round_half_away(sims[keep], 6),
            }
        )
    else:
        verified = _verify_pairs_distributed(
            cand, _shingle_rows(ds, text_col, id_col, shingle_k), threshold
        ).to_pandas()
    if len(verified) == 0:
        return empty
    verified = verified.sort_values(["a_id", "b_id"], ignore_index=True)
    return pa.Table.from_pandas(verified, preserve_index=False)


def _collect_shingles_bounded(ds, ids, text_col, id_col, k) -> dict:
    """Shingle sets for a BOUNDED candidate id set (gated by
    ``max_driver_pairs`` upstream): computed distributed, collected driver-
    side. The distributed join path handles unbounded candidate sets."""
    idset = pa.array(sorted(int(i) for i in ids), pa.int64())

    def only(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(pc.cast(t["doc_id"], pa.int64()), value_set=idset))

    out = {}
    for row in _shingle_rows(ds, text_col, id_col, k).map_batches(
        only, batch_format="pyarrow"
    ).take_all():
        out[int(row["doc_id"])] = np.asarray(row["sh"], dtype=np.uint64)
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_sketches(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(doc_id, simhash uint64) per document."""

    def fn(t: pa.Table) -> pa.Table:
        toks, offs = token_hashes(t[text_col])
        sh = simhash(toks, offs)
        return pa.table({id_col: t[id_col], "simhash": pa.array(sh, pa.uint64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_EMPTY_SIMHASH_PAIRS = pd.DataFrame(
    {
        "a_id": pd.Series(dtype="int64"),
        "b_id": pd.Series(dtype="int64"),
        "hamming": pd.Series(dtype="int64"),
    }
)


def _simhash_bucket_pairs(
    g: pd.DataFrame, max_hamming: int, max_bucket: int
) -> pd.DataFrame:
    """Verified (a_id, b_id, hamming ≤ max_hamming) pairs within one chunk
    bucket — Hamming computed here, vectorized over the pair grid."""
    g = g.drop_duplicates("doc_id").sort_values("doc_id")
    if len(g) > max_bucket:
        logger.warning(
            "SimHash chunk bucket truncated: keeping %d of %d docs "
            "(recall guarantee capped; raise max_bucket to restore it)",
            max_bucket, len(g),
        )
        g = g.head(max_bucket)
    if len(g) < 2:
        return _EMPTY_SIMHASH_PAIRS
    ids = g["doc_id"].to_numpy()
    hs = g["simhash"].to_numpy().astype(np.uint64)
    r, c = np.triu_indices(len(ids), k=1)
    d = hamming_distance(hs[r], hs[c])
    keep = d <= max_hamming
    return pd.DataFrame(
        {
            "a_id": ids[r[keep]].astype("int64"),
            "b_id": ids[c[keep]].astype("int64"),
            "hamming": d[keep].astype("int64"),
        }
    )


def simhash_pairs(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 256,
    dedup: str = "auto",
    max_driver_pairs: int = 65_536,
) -> pa.Table:
    """Near-dup pairs by SimHash: 4×16-bit band buckets → Hamming verify.

    A pair within Hamming distance ≤ 3 of 64 bits must agree exactly on at
    least one of 4 disjoint 16-bit chunks (pigeonhole), so chunk-bucketing
    has perfect recall for the verified distance **provided no chunk bucket
    exceeds ``max_bucket`` docs** — larger buckets are truncated with a
    logged warning (recall is then capped; raise ``max_bucket`` to restore
    the guarantee at the cost of quadratic pair work in that bucket).

    Hamming distance is computed inside the bucket reducers (both hashes are
    present there); pair dedup across the 4 chunk buckets is a distributed
    hash-bucket drop-duplicates. The only driver collect is the final
    verified pair set. ``dedup`` mirrors minhash's ``verify`` knob:
    ``"auto"`` dedups driver-side while the (pre-dedup) candidate count is
    at most ``max_driver_pairs`` — a conservative driver-memory bound — and
    distributed above it; ``"distributed"`` forces the scale path (used by
    the path-equivalence test).
    """
    sk = simhash_sketches(ds, text_col, id_col)

    def explode(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        chunks = np.stack(
            [(h >> np.uint64(16 * c)) & np.uint64(0xFFFF) for c in range(4)], axis=1
        )
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
                "chunk_id": pa.array(np.tile(np.arange(4, dtype=np.int32), len(ids))),
                "chunk": pa.array(chunks.ravel().astype(np.int32)),
                "simhash": pa.array(np.repeat(h, 4), pa.uint64()),
            }
        )

    def bucketize(t: pa.Table) -> pa.Table:
        cid = t["chunk_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ch = t["chunk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array((cid * 65536 + ch) % 256))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs = [
            _simhash_bucket_pairs(sub, max_hamming, max_bucket)
            for _, sub in g.groupby(["chunk_id", "chunk"], sort=False)
        ]
        outs = [o for o in outs if len(o)]
        if not outs:
            return _EMPTY_SIMHASH_PAIRS
        return pd.concat(outs, ignore_index=True)

    cand = (
        sk.map_batches(explode, batch_format="pyarrow")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .materialize()  # consumed by count + dedup; rows are 24 B
    )
    # adaptive dedup across the 4 chunk buckets (same gate as minhash):
    # small candidate sets dedup driver-side, large ones distributed
    if dedup != "distributed" and cand.count() <= max_driver_pairs:
        verified = cand.to_pandas().drop_duplicates(["a_id", "b_id"])
    else:
        verified = _dedup_pairs(cand).to_pandas()
    if len(verified) == 0:
        return pa.table(
            {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64())}
        )
    verified = verified.sort_values(["a_id", "b_id"], ignore_index=True)
    return pa.Table.from_pandas(verified, preserve_index=False)


def decontaminate(
    corpus: ray.data.Dataset,
    blocklist: ray.data.Dataset,
    text_col: str = "text",
    block_text_col: str = "text",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Training-corpus decontamination: drop corpus rows whose normalized
    content fingerprint appears in ``blocklist`` (the benchmark/test-set
    overlap removal every training pipeline needs).

    Distributed ANTI-JOIN on md5 fingerprints: both sides are tagged and
    hash-bucketed by fingerprint, each bucket drops corpus rows matching a
    local blocklist fingerprint. No broadcast (the blocklist may be large)
    and no driver materialization. SQL ``NOT IN`` null semantics: null-text
    corpus rows are dropped (NULL NOT IN (...) is never true).
    """
    import polars as pl

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            col = text_col if side == 1 else block_text_col
            fp = pa.array(md5_fingerprints(t[col].to_pylist()), pa.string())
            h = pl.from_arrow(pa.table({"f": fp})).hash_rows(seed=11).to_numpy()
            cols = {c: t[c] for c in t.column_names} if side == 1 else {}
            cols["__fp"] = fp
            cols["__side"] = pa.array(np.full(t.num_rows, side, dtype=np.int8))
            cols["__bucket"] = pa.array((h % np.uint64(num_buckets)).astype(np.int64))
            return pa.table(cols)

        return fn

    corpus_schema = pa.schema(list(corpus.schema().base_schema))
    corpus_cols = [f.name for f in corpus_schema]

    def anti(g: pd.DataFrame) -> pa.Table:
        block_fps = set(g.loc[g["__side"] == 0, "__fp"])
        keep = g[(g["__side"] == 1) & g["__fp"].notna() & ~g["__fp"].isin(block_fps)]
        # the null-padded blocklist rows float-taint int columns in pandas;
        # cast back to the corpus schema (values are all side-1, no nulls)
        return pa.Table.from_pandas(
            keep[corpus_cols], schema=corpus_schema, preserve_index=False
        )

    # blocklist rows carry only the join key — pad the corpus columns with
    # typed nulls so the union has one schema
    def pad_block(t: pa.Table) -> pa.Table:
        cols = {}
        for f in corpus.schema().base_schema:
            cols[f.name] = t[f.name] if f.name in t.column_names else pa.nulls(
                t.num_rows, f.type
            )
        for extra in ("__fp", "__side", "__bucket"):
            cols[extra] = t[extra]
        return pa.table(cols)

    tagged_corpus = corpus.map_batches(tag(1), batch_format="pyarrow")
    tagged_block = blocklist.map_batches(tag(0), batch_format="pyarrow").map_batches(
        pad_block, batch_format="pyarrow"
    )
    return (
        tagged_corpus.union(tagged_block)
        .groupby("__bucket")
        .map_groups(anti, batch_format="pandas")
    )


def ngram_decontaminate(
    corpus: ray.data.Dataset,
    blocklist: ray.data.Dataset,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Token-n-gram decontamination (the GPT-3 appendix-C overlap rule:
    flag a training doc if it shares any token k-gram with an eval doc) —
    stricter than :func:`decontaminate`'s whole-content anti-join. Returns
    ``(doc_id, n_dirty)`` for corpus docs sharing ≥1 lowercased-whitespace
    token k-gram with the blocklist, n_dirty = the doc's DISTINCT
    contaminated grams.

    Scale shape: per-batch distinct (doc_id, gram-hash) pairs from the flat
    token-hash buffer (:func:`functions.hashing.gram_hashes` — k-1 vector
    ops, no Python rows); tagged gram-keyed hash exchange (NO broadcast —
    the eval suite may itself be large); per-bucket vectorized membership
    (np.isin against the bucket's blocklist grams) emitting per-doc partial
    counts — each gram lives in exactly one bucket and (doc, gram) pairs
    are globally distinct (docs are batch-local), so partials sum exactly;
    final doc-keyed rollup. Hash-vs-string equivalence: the SQL twin joins
    gram STRINGS; counts agree unless two distinct grams collide in 64 bits
    (~2^-64 per pair) — the ngram_jaccard_pairs argument.
    """
    import polars as pl

    def grams(side: int):
        def fn(t: pa.Table) -> pa.Table:
            flat, offsets = token_hashes(t[text_col])
            rows, gh = gram_hashes(flat, offsets, k)
            ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
            tbl = (
                pa.table(
                    {
                        "doc_id": pa.array(ids[rows], pa.int64()),
                        "gram": pa.array(gh.view(np.int64)),
                    }
                )
                .group_by(["doc_id", "gram"])
                .aggregate([])
            )
            h = pl.from_arrow(tbl.select(["gram"])).hash_rows(seed=7).to_numpy()
            return tbl.append_column(
                "blk", pa.array(np.full(tbl.num_rows, side, dtype=np.int8))
            ).append_column(
                "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
            )

        return fn

    def dirty_counts(g: pd.DataFrame) -> pd.DataFrame:
        blkg = g.loc[g["blk"] == 1, "gram"].to_numpy()
        cg = g[g["blk"] == 0]
        hit = cg[np.isin(cg["gram"].to_numpy(), blkg)]
        out = (
            hit.groupby("doc_id", sort=False).size().rename("n_dirty").reset_index()
        )
        out["n_dirty"] = out["n_dirty"].astype("int64")
        return out

    pairs = corpus.map_batches(
        grams(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        blocklist.map_batches(grams(1), batch_format="pyarrow", zero_copy_batch=True)
    )
    partials = pairs.groupby("bucket").map_groups(
        dirty_counts, batch_format="pandas"
    )
    return hash_bucket_aggregate(
        partials, ["doc_id"], {"n_dirty": ("n_dirty", "sum")}, num_buckets=8
    )


def drop_ids(
    corpus: ray.data.Dataset,
    drop: pa.Table | ray.data.Dataset,
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Anti-join the corpus against a drop-id table — the suppression step
    after near-dup clustering (drop list may be corpus-proportional at
    100 TB, so no broadcast: both sides hash-bucket by id, each bucket
    filters locally — the :func:`decontaminate` pattern keyed on ids).
    ``drop`` may be a Dataset (e.g. the connected-components label table) —
    it is padded and bucketed stream-side, never collected to the driver."""

    def tag_corpus(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {c: t[c] for c in t.column_names}
        cols["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        cols["__bucket"] = pa.array(ids % num_buckets)
        return pa.table(cols)

    corpus_schema = pa.schema(list(corpus.schema().base_schema))
    corpus_cols = [f.name for f in corpus_schema]

    def pad_drop(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            f.name: (t[id_col] if f.name == id_col else pa.nulls(t.num_rows, f.type))
            for f in corpus_schema
        }
        cols["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        cols["__bucket"] = pa.array(ids % num_buckets)
        return pa.table(cols)

    def anti(g: pd.DataFrame) -> pa.Table:
        block = set(g.loc[g["__side"] == 0, id_col])
        keep = g[(g["__side"] == 1) & ~g[id_col].isin(block)]
        return pa.Table.from_pandas(
            keep[corpus_cols], schema=corpus_schema, preserve_index=False
        )

    drop_ds = (
        ray.data.from_arrow(pad_drop(drop))
        if isinstance(drop, pa.Table)
        else drop.map_batches(pad_drop, batch_format="pyarrow")
    )
    tagged = corpus.map_batches(tag_corpus, batch_format="pyarrow").union(drop_ds)
    return tagged.groupby("__bucket").map_groups(anti, batch_format="pandas")


# ---------------------------------------------------------------------------
# winnowing (rolling-hash) fingerprint near-dup
# ---------------------------------------------------------------------------


def winnow_pairs(
    ds: ray.data.Dataset,
    min_shared: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    w: int = 8,
    max_bucket: int = 256,
) -> pa.Table:
    """Near-dup pairs by shared winnowing fingerprints (Schleimer et al.
    2003): docs sharing ≥ ``min_shared`` selected rolling-hash minima.

    explode (doc_id, fp) → fp-bucket exchange → per-fp pairs (cap logged) →
    (a, b) count exchange → threshold. Winnowing guarantees any common
    substring of length ≥ k + w - 1 yields a shared fingerprint, so high
    ``n_shared`` indicates long verbatim overlap — the classic
    copy-detection operator, complementary to MinHash's set-overlap view.
    Defaults (k=16, w=8, min_shared=8) were tuned on the synthetic corpus:
    unrelated docs share ≤3 fingerprints (99th pct) while planted near-dups
    share ≥90 — an order-of-magnitude separation.
    """
    from ..functions.hashing import winnow_fingerprints

    def explode(t: pa.Table) -> pa.Table:
        flat, offs = winnow_fingerprints(t[text_col], k=k, w=w)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        counts = np.diff(offs)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
                "fp": pa.array(flat, pa.uint64()),
            }
        )

    def bucketize(t: pa.Table) -> pa.Table:
        b = (t["fp"].to_numpy(zero_copy_only=False) % np.uint64(256)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def fp_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per-fingerprint pair expansion: lexsort-RLE the
        distinct (fp, doc) rows into runs, bucket runs by length so intra-run
        pairs come from one fancy-index + triu broadcast per distinct
        length, then locally combine duplicate (a, b) rows so the pair
        exchange carries one counted row per pair instead of one row per
        shared fingerprint."""
        empty = pd.DataFrame(
            {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
             "one": pd.Series(dtype="int64")}
        )
        fp = g["fp"].to_numpy()
        d = g["doc_id"].to_numpy()
        order = np.lexsort((d, fp))
        f, d = fp[order], d[order]
        keep = np.ones(len(f), bool)
        keep[1:] = (f[1:] != f[:-1]) | (d[1:] != d[:-1])
        f, d = f[keep], d[keep]
        starts = np.flatnonzero(np.r_[True, f[1:] != f[:-1]])
        lens = np.diff(np.append(starts, len(f)))
        a, b = _grouped_triu_pairs(
            starts, lens, d, max_bucket, "winnow fingerprint bucket"
        )
        if not len(a):
            return empty
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        st = np.flatnonzero(np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        cnt = np.diff(np.append(st, len(a)))
        return pd.DataFrame(
            {
                "a_id": a[st].astype("int64"),
                "b_id": b[st].astype("int64"),
                "one": cnt.astype("int64"),
            }
        )

    shared = hash_bucket_aggregate(
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fp_pairs, batch_format="pandas"),
        ["a_id", "b_id"],
        {"n_shared": ("one", "sum")},
        num_buckets=32,
    )

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n_shared"] >= min_shared]

    out = shared.map_batches(keep, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return pa.table(
            {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64()),
             "n_shared": pa.array([], pa.int64())}
        )
    out = out.sort_values(["a_id", "b_id"], ignore_index=True)
    out["n_shared"] = out["n_shared"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (brute force within a partition key)
# ---------------------------------------------------------------------------


def jaccard_pairs_brute(
    ds: ray.data.Dataset,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> set[tuple[int, int]]:
    """Corpus-wide exact all-pairs shingle Jaccard ≥ threshold — the
    quadratic ground truth the LSH recall queries measure against.
    Query-scale only (collects every shingle set); the scale path is
    :func:`minhash_lsh_pairs`."""
    rows = _shingle_rows(ds, text_col, id_col, shingle_k).take_all()
    ids = [int(r["doc_id"]) for r in rows]
    sets = [np.unique(np.asarray(r["sh"], dtype=np.uint64)) for r in rows]
    out = set()
    order = np.argsort(ids)
    for x in range(len(order)):
        for y in range(x + 1, len(order)):
            i, j = order[x], order[y]
            if jaccard(sets[i], sets[j]) >= threshold:
                out.add((ids[i], ids[j]))
    return out


def kgram_overlap_pairs_brute(
    ds: ray.data.Dataset,
    min_shared: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
) -> set[tuple[int, int]]:
    """Ground truth for the winnowing recall meter: pairs sharing at least
    ``min_shared`` distinct full k-char gram hashes — the UN-winnowed
    superset of the selected fingerprints (same rolling hash, every
    position). Winnowing keeps ~1/w of these, so a pair this meter selects
    that winnowing misses is a real recall loss of the window selection.
    Query-scale only (driver pairwise over distinct-gram arrays)."""
    from ..functions.hashing import kgram_hashes

    def fn(t: pa.Table) -> pa.Table:
        vals, offs = kgram_hashes(t[text_col], k=k)
        return pa.table(
            {
                "doc_id": pc.cast(t[id_col], pa.int64()),
                "gh": pa.LargeListArray.from_arrays(
                    pa.array(offs, pa.int64()), pa.array(vals, pa.uint64())
                ),
            }
        )

    rows = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).take_all()
    ids = [int(r["doc_id"]) for r in rows]
    sets = [np.asarray(r["gh"], dtype=np.uint64) for r in rows]
    order = np.argsort(ids)
    out = set()
    for x in range(len(order)):
        for y in range(x + 1, len(order)):
            i, j = order[x], order[y]
            if (
                len(np.intersect1d(sets[i], sets[j], assume_unique=True))
                >= min_shared
            ):
                out.add((ids[i], ids[j]))
    return out


def hamming_pairs_brute(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> set[tuple[int, int]]:
    """Corpus-wide exact all-pairs SimHash Hamming ≤ max_hamming (vectorized
    pair grid) — ground truth for the SimHash recall query. Query-scale only."""
    sk = simhash_sketches(ds, text_col, id_col).to_pandas().sort_values(id_col)
    ids = sk[id_col].to_numpy()
    hs = sk["simhash"].to_numpy().astype(np.uint64)
    r, c = np.triu_indices(len(ids), k=1)
    d = hamming_distance(hs[r], hs[c])
    keep = d <= max_hamming
    return set(zip(ids[r[keep]].tolist(), ids[c[keep]].tolist()))


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.5,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """Exact all-pairs Jaccard within each ``group_col`` group.

    The partitioning assumption (documented per SURVEY.md "custom operators"):
    near-dups co-occur within the group key; cross-group dups are invisible.
    Each group must fit one task — use LSH for unpartitioned corpora."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        """Exact all-pairs Jaccard via co-occurrence counting instead of a
        quadratic pairwise loop: after per-doc shingle dedup, sort the flat
        (hash, doc) pairs by hash — every run of length m contributes its
        m·(m-1)/2 doc pairs one shared-shingle count each. Work is
        Σ m(m-1)/2 over co-occurring shingles (≈ the true intersection
        mass), not n²·set-ops; jaccard = c / (|a| + |b| - c).

        Fully vectorized: runs are bucketed by length so intra-run pairs
        come from one fancy-index + ``triu_indices`` broadcast per DISTINCT
        run length (a handful of numpy calls), and pair counting is a single
        ``np.unique`` over i·n+j keys — no Python loop over runs or pairs."""
        n = len(g)
        toks, offs = token_hashes(pa.array(g[text_col].tolist(), pa.string()))
        sh, so = shingle_hashes(toks, offs, k=shingle_k)
        doc_of = np.repeat(np.arange(n), np.diff(so))
        # distinct (doc, shingle)
        order = np.lexsort((sh, doc_of))
        d, v = doc_of[order], sh[order]
        keep = np.ones(len(d), dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
        d, v = d[keep], v[keep]
        sizes = np.bincount(d, minlength=n).astype(np.int64)
        # runs of equal shingle value across docs
        order = np.argsort(v, kind="mergesort")
        d2, v2 = d[order], v[order]
        run_start = np.ones(len(v2), dtype=bool)
        run_start[1:] = v2[1:] != v2[:-1]
        starts = np.flatnonzero(run_start)
        lens = np.diff(np.append(starts, len(v2)))
        sel = lens > 1
        starts_m, lens_m = starts[sel], lens[sel]
        key_parts = []
        for m in np.unique(lens_m):
            s_m = starts_m[lens_m == m]
            docs = np.sort(d2[s_m[:, None] + np.arange(m)], axis=1)
            r, c = np.triu_indices(int(m), k=1)
            key_parts.append((docs[:, r] * n + docs[:, c]).ravel())
        empty = pd.DataFrame({"a_id": [], "b_id": [], "jaccard": []})
        empty = empty.astype(
            {"a_id": "int64", "b_id": "int64", "jaccard": "float64"}
        )
        if not key_parts:
            return empty
        ukeys, cnt = np.unique(np.concatenate(key_parts), return_counts=True)
        i, j = ukeys // n, ukeys % n
        sim = cnt / (sizes[i] + sizes[j] - cnt)
        ok = sim >= threshold
        if not ok.any():
            return empty
        i, j, sim = i[ok], j[ok], sim[ok]
        ids = g[id_col].to_numpy().astype(np.int64)
        a, b = ids[i], ids[j]
        swap = a > b
        a, b = np.where(swap, b, a), np.where(swap, a, b)
        order = np.lexsort((b, a))
        return pd.DataFrame(
            {
                "a_id": a[order],
                "b_id": b[order],
                "jaccard": round_half_away(sim, 6)[order],
            }
        )

    return ds.groupby(group_col).map_groups(per_group, batch_format="pandas")


def substring_dup_docs(
    ds: ray.data.Dataset,
    k: int = 16,
    min_shared: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact duplicated-substring detection (the doc-level form of Lee et
    al. 2021's exact substring dedup): (doc_id, n_shared) for documents at
    least ``min_shared`` of whose distinct k-char grams occur in some OTHER
    document. Unlike the MinHash/SimHash/winnowing family this ships the
    grams themselves (fixed k-byte keys), so the result is exact — no hash
    collisions, no window selection — with a plain SQL twin.

    Scale shape: per-batch distinct (doc_id, gram) pairs built from ONE flat
    byte buffer via ``sliding_window_view`` (no Python rows; the
    ``kgram_hashes`` layout trick with the hash replaced by the gram bytes);
    gram-keyed hash exchange counts docs per gram and emits per-doc partial
    shared-counts (each gram lives in exactly one bucket, so partials sum
    exactly); final doc-keyed exchange applies the threshold. Gram volume is
    ~len(text) rows of k+8 bytes per doc — the documented cost of exactness;
    at 100 TB run it per shard/source partition or after a cheap candidate
    cut (winnowing), exactly how the paper pipelines it.

    Byte-vs-character caveat: grams are byte windows; rows containing
    non-ASCII text (where codepoints ≠ bytes) take a per-row Python
    fallback so the result still matches the SQL twin's character windows.
    """
    import polars as pl

    def grams(t: pa.Table) -> pa.Table:
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        buf = pc.cast(pc.fill_null(text, ""), pa.binary())
        lens = pc.binary_length(buf).to_numpy(zero_copy_only=False).astype(np.int64)
        ascii_ok = (
            pc.fill_null(pc.equal(pc.utf8_length(text), pc.binary_length(buf)), True)
            .to_numpy(zero_copy_only=False)
        )
        offsets = np.concatenate([[0], np.cumsum(lens)])
        if buf.offset == 0 and buf.buffers()[2] is not None:
            data = np.frombuffer(buf.buffers()[2], dtype=np.uint8)[: offsets[-1]]
        else:
            data = np.frombuffer(b"".join(buf.to_pylist()), dtype=np.uint8)
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)

        if len(data) >= k:
            win = np.lib.stride_tricks.sliding_window_view(data, k)
            pos = np.arange(len(win))
            row_of = np.searchsorted(offsets, pos, side="right") - 1
            valid = (pos + k <= offsets[row_of + 1]) & ascii_ok[row_of]
            g_rows = row_of[valid]
            g_flat = np.ascontiguousarray(win[valid])
        else:
            g_rows = np.zeros(0, dtype=np.int64)
            g_flat = np.zeros((0, k), dtype=np.uint8)

        # length-preserving gram column straight from the window buffer —
        # NOT numpy "S{k}" items, which strip trailing NUL bytes on access
        # and would merge distinct grams ending in 0x00 (ADVICE r3)
        main_grams = pa.Array.from_buffers(
            pa.binary(k), len(g_flat), [None, pa.py_buffer(g_flat)]
        ).cast(pa.binary())

        # rare non-ASCII rows: character windows via a per-row fallback
        extra_rows, extra_grams = [], []
        for i in np.flatnonzero(~ascii_ok):
            s = text[i].as_py() or ""
            extra_rows.extend([i] * max(len(s) - k + 1, 0))
            extra_grams.extend(s[j : j + k] for j in range(max(len(s) - k + 1, 0)))

        tbl = pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([ids[g_rows], ids[extra_rows]])
                    if extra_rows
                    else ids[g_rows],
                    pa.int64(),
                ),
                "gram": pa.concat_arrays(
                    [
                        main_grams,
                        pa.array(
                            [g.encode("utf-8") for g in extra_grams], pa.binary()
                        ),
                    ]
                )
                if extra_rows
                else main_grams,
            }
        )
        # distinct per doc; docs are batch-local so this is globally distinct
        return tbl.group_by(["doc_id", "gram"]).aggregate([])

    def bucketize(t: pa.Table) -> pa.Table:
        h = pl.from_arrow(t.select(["gram"])).hash_rows(seed=11).to_numpy()
        return t.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def shared_partials(g: pd.DataFrame) -> pd.DataFrame:
        n_docs = g.groupby("gram", sort=False)["doc_id"].transform("size")
        hit = g[n_docs >= 2]
        out = hit.groupby("doc_id", sort=False).size().rename("n").reset_index()
        return out

    partials = (
        ds.map_batches(grams, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(shared_partials, batch_format="pandas")
    )
    summed = hash_bucket_aggregate(
        partials, ["doc_id"], {"n_shared": ("n", "sum")}, num_buckets=16
    )
    return summed.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_shared"], min_shared)),
        batch_format="pyarrow",
    )
