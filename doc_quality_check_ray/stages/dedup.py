"""Deduplication operators over document tables: exact, MinHash-LSH, SimHash,
and exact n-gram Jaccard.

The reference's only dedup ops are set-based file dedup
(``test_readability.py:153-164``) and geometric IoU near-dup suppression
(``modules/document_segmentation.py:143-228``); at training-data scale these
generalize to content dedup (SURVEY.md §2.8 D1-D3):

- **exact**: fingerprint (md5) → hash-partitioned groupby → keep min id.
  Shuffles 16-byte fingerprints, never text.
- **MinHash-LSH**: shingle → minhash → banded signatures → band-bucket
  groupby → candidate pairs → exact-Jaccard verification. Candidate
  verification broadcasts only the *candidate* docs' shingle sets (assumed
  ≪ corpus; at cluster scale swap the driver collect for a hash-bucket join
  keyed on doc_id).
- **SimHash**: 64-bit sketches, 4×16-bit band buckets, Hamming verification.
- **n-gram Jaccard**: exact all-pairs within a partition key (here
  ``source``) via ``groupby.map_groups`` — the brute-force baseline LSH
  recall is measured against.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .exchange import hash_bucket_aggregate
from ..functions.rounding import round_half_away, round_half_away_scalar
from ..functions.hashing import (
    band_hashes,
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
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """The deduplicated dataset itself: first (min-id) row per content.

    Broadcast semi-join on the surviving id set (small side = one id per
    distinct content). For corpora where even that is large, switch to a
    hash-bucket join on fingerprint.
    """
    import ray

    keep = exact_dedup_groups(ds, text_col, id_col).select_columns(["keep_id"])
    keep_ids = ray.put(set(r["keep_id"] for r in keep.take_all()))

    def keep_only(t: pa.Table) -> pa.Table:
        ids = ray.get(keep_ids)
        mask = pc.is_in(t[id_col], value_set=pa.array(sorted(ids)))
        return t.filter(mask)

    return ds.map_batches(keep_only, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


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


def _bucket_pairs(g: pd.DataFrame, max_bucket: int = 64) -> pd.DataFrame:
    ids = np.unique(g["doc_id"].to_numpy())[:max_bucket]
    if len(ids) < 2:
        return pd.DataFrame({"a_id": [], "b_id": []}).astype("int64")
    pairs = list(itertools.combinations(ids.tolist(), 2))
    return pd.DataFrame(pairs, columns=["a_id", "b_id"])


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 3,
) -> pa.Table:
    """Near-duplicate pairs (a_id < b_id, jaccard ≥ threshold).

    band collisions → candidates → exact verification. Deterministic output
    (seeded permutations); jaccard rounded to 6 decimals.
    """
    band_rows = ds.map_batches(
        lambda t: _signature_batches(t, text_col, id_col, num_perm, bands, shingle_k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # single-int bucket exchange over (band_id, band_hash); pair generation
    # runs per bucket with a local pandas groupby (see stages/exchange.py)
    def bucketize(t: pa.Table) -> pa.Table:
        b = (t["band_hash"].to_numpy(zero_copy_only=False) % np.uint64(256)).astype(
            np.int64
        )
        return t.append_column("bucket", pa.array(b))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs = [
            _bucket_pairs(sub)
            for _, sub in g.groupby(["band_id", "band_hash"], sort=False)
        ]
        outs = [o for o in outs if len(o)]
        if not outs:
            return pd.DataFrame(
                {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True).drop_duplicates(["a_id", "b_id"])

    pairs = (
        band_rows.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs):
        pairs = pairs.drop_duplicates(["a_id", "b_id"]).reset_index(drop=True)
    if len(pairs) == 0:
        return pa.table(
            {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )

    # exact verification on the candidate subset only
    cand_ids = sorted(set(pairs["a_id"]) | set(pairs["b_id"]))
    shingles = _collect_shingles(ds, cand_ids, text_col, id_col, shingle_k)
    sims = np.array(
        [jaccard(shingles[a], shingles[b]) for a, b in zip(pairs["a_id"], pairs["b_id"])]
    )
    keep = sims >= threshold
    out = pairs[keep].reset_index(drop=True)
    return pa.table(
        {
            "a_id": pa.array(out["a_id"].astype("int64")),
            "b_id": pa.array(out["b_id"].astype("int64")),
            "jaccard": pa.array(round_half_away(sims[keep], 6), pa.float64()),
        }
    )


def _collect_shingles(ds, ids, text_col, id_col, k) -> dict[int, np.ndarray]:
    """Shingle sets for a (small) id set, computed distributed then collected."""
    import ray

    idset = ray.put(set(int(i) for i in ids))

    def only(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[id_col], value_set=pa.array(sorted(ray.get(idset))))
        hit = t.filter(mask)
        toks, offs = token_hashes(hit[text_col])
        sh, sh_offs = shingle_hashes(toks, offs, k=k)
        return pa.table(
            {
                id_col: hit[id_col],
                "shingles": pa.array(
                    [sh[sh_offs[i]: sh_offs[i + 1]].tolist() for i in range(len(hit))],
                    pa.list_(pa.uint64()),
                ),
            }
        )

    out = {}
    for row in ds.map_batches(only, batch_format="pyarrow").take_all():
        out[int(row[id_col])] = np.asarray(row["shingles"], dtype=np.uint64)
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


def simhash_pairs(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Near-dup pairs by SimHash: 4×16-bit band buckets → Hamming verify.

    A pair within Hamming distance ≤ 3 of 64 bits must agree exactly on at
    least one of 4 disjoint 16-bit chunks (pigeonhole), so chunk-bucketing
    has perfect recall for the verified distance."""
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
            _simhash_bucket_pairs(sub)
            for _, sub in g.groupby(["chunk_id", "chunk"], sort=False)
        ]
        outs = [o for o in outs if len(o)]
        if not outs:
            return _simhash_bucket_pairs(g.iloc[:0])
        return pd.concat(outs, ignore_index=True)

    cand = (
        sk.map_batches(explode, batch_format="pyarrow")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    pairs = cand.to_pandas()
    if len(pairs) == 0:
        return pa.table(
            {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64())}
        )
    pairs = pairs.drop_duplicates(["a_id", "b_id"]).reset_index(drop=True)
    d = hamming_distance(
        pairs["a_hash"].to_numpy().astype(np.uint64),
        pairs["b_hash"].to_numpy().astype(np.uint64),
    )
    keep = d <= max_hamming
    out = pairs[keep]
    return pa.table(
        {
            "a_id": pa.array(out["a_id"].astype("int64")),
            "b_id": pa.array(out["b_id"].astype("int64")),
            "hamming": pa.array(d[keep].astype("int64")),
        }
    )


def _simhash_bucket_pairs(g: pd.DataFrame, max_bucket: int = 64) -> pd.DataFrame:
    g = g.drop_duplicates("doc_id").sort_values("doc_id").head(max_bucket)
    if len(g) < 2:
        return pd.DataFrame(
            {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
             "a_hash": pd.Series(dtype="uint64"), "b_hash": pd.Series(dtype="uint64")}
        )
    ids = g["doc_id"].to_numpy()
    hs = g["simhash"].to_numpy()
    rows = [
        (ids[i], ids[j], hs[i], hs[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
    ]
    return pd.DataFrame(rows, columns=["a_id", "b_id", "a_hash", "b_hash"])


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (brute force within a partition key)
# ---------------------------------------------------------------------------


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
        toks, offs = token_hashes(pa.array(g[text_col].tolist(), pa.string()))
        sh, so = shingle_hashes(toks, offs, k=shingle_k)
        sets = [np.unique(sh[so[i]: so[i + 1]]) for i in range(len(g))]
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        rows = []
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                i, j = order[x], order[y]
                sim = jaccard(sets[i], sets[j])
                if sim >= threshold:
                    rows.append(
                        (int(ids[i]), int(ids[j]), round_half_away_scalar(sim, 6))
                    )
        out = pd.DataFrame(rows, columns=["a_id", "b_id", "jaccard"])
        return out.astype({"a_id": "int64", "b_id": "int64", "jaccard": "float64"})

    return ds.groupby(group_col).map_groups(per_group, batch_format="pandas")
