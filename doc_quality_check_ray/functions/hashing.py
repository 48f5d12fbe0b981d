"""Vectorized content hashing: token/shingle hashes, MinHash signatures,
SimHash bit-sketches, and stable content fingerprints.

MinHash/LSH follows the standard public construction (Broder 1997; Leskovec
et al., "Mining of Massive Datasets" ch.3): word-shingle sets → per-permutation
min of a universal hash family → banded signatures whose band collisions are
near-dup candidates. SimHash follows Charikar 2002. All per-batch computation
is numpy over flat token arrays (``reduceat`` per row) — no Python loops over
rows or shingles.

Internal shuffle keys use xxhash via polars (vectorized, native); stable
*output* fingerprints use md5 so the DuckDB oracle can recompute them.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE61 = (1 << 61) - 1


def token_hashes(text: pa.Array | pa.ChunkedArray):
    """(flat_hashes uint64, row_offsets int64) for lowercased whitespace tokens."""
    import polars as pl

    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.fill_null(pc.utf8_lower(text), "")), r"\s+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    h = pl.from_arrow(flat).hash(seed=42).to_numpy().astype(np.uint64)
    return h, offsets


def shingle_hashes(flat_tokens: np.ndarray, offsets: np.ndarray, k: int = 3):
    """Word k-gram hashes per row, computed from flat token hashes.

    Rows shorter than ``k`` contribute their single whole-row combined hash
    (so short docs still dedup). Returns (flat_shingles uint64, offsets).
    Fully vectorized over the flat token array — per-row work is index
    arithmetic, never a Python loop over tokens or shingles.
    """
    n_rows = len(offsets) - 1
    mults = np.array(
        [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9][:k], dtype=np.uint64
    )
    t = flat_tokens
    lengths = np.diff(offsets)

    # full k-gram hashes at every flat position (position p uses tokens [p, p+k))
    if len(t) >= k:
        sh = np.zeros(len(t) - k + 1, dtype=np.uint64)
        for j in range(k):
            sh ^= t[j : len(t) - k + 1 + j] * mults[j]
        sh = (sh >> np.uint64(1)) | np.uint64(1)  # avoid 0
    else:
        sh = np.zeros(0, dtype=np.uint64)

    # keep positions whose whole window lies inside one row (vectorized mask)
    n_counts = np.maximum(lengths - k + 1, 0)  # k-gram count per long row
    long_rows = lengths >= k
    if sh.size:
        pos = np.arange(len(sh))
        row_of = np.searchsorted(offsets, pos, side="right") - 1
        valid = pos + k <= offsets[row_of + 1]
        long_flat = sh[valid]
    else:
        long_flat = sh

    # short rows (0 < len < k): FNV-style fold of the row's tokens, done
    # column-wise — at most k-1 tokens per row, so k-1 vector ops total
    short_rows = (lengths > 0) & (lengths < k)
    short_vals = np.zeros(int(short_rows.sum()), dtype=np.uint64)
    if short_vals.size:
        slo = offsets[:-1][short_rows]
        slen = lengths[short_rows]
        acc = np.full(len(slo), 0x84222325, dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        for j in range(k - 1):
            has = slen > j
            acc[has] = (acc[has] ^ t[slo[has] + j]) * prime
        short_vals = acc | np.uint64(1)

    out_counts = np.where(long_rows, n_counts, 0) + short_rows.astype(np.int64)
    out_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(out_counts, out=out_offsets[1:])
    out = np.zeros(out_offsets[-1], dtype=np.uint64)
    # scatter: long rows take their contiguous slice of long_flat, short rows
    # their single value — placement indices built by repeat/cumsum, no loop
    if long_flat.size:
        long_starts = out_offsets[:-1][long_rows]
        long_lens = n_counts[long_rows]
        idx = np.repeat(long_starts, long_lens) + (
            np.arange(long_lens.sum())
            - np.repeat(np.cumsum(long_lens) - long_lens, long_lens)
        )
        out[idx] = long_flat
    if short_vals.size:
        out[out_offsets[:-1][short_rows]] = short_vals
    return out, out_offsets


def gram_hashes(flat_tokens: np.ndarray, offsets: np.ndarray, k: int):
    """Order-sensitive token k-gram hashes for rows with ≥ k tokens
    (rows shorter than k contribute nothing — the GPT-3 n-gram-overlap
    decontamination rule skips them, unlike :func:`shingle_hashes`).

    Polynomial combine h = ((h·P + t) mod 2^64) over the flat token-hash
    buffer — position-sensitive for any k (``shingle_hashes``'s fixed
    multiplier table stops at k=3). Returns ``(row_idx, hashes)``: the
    batch-row index and 64-bit hash of every in-row k-gram window, fully
    vectorized (k-1 array ops; never a loop over rows or grams).
    """
    n = len(flat_tokens)
    if n < k:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    sh = flat_tokens[: n - k + 1].copy()
    for j in range(1, k):
        sh = sh * prime + flat_tokens[j : n - k + 1 + j]
    pos = np.arange(len(sh))
    row_of = np.searchsorted(offsets, pos, side="right") - 1
    valid = pos + k <= offsets[row_of + 1]
    return row_of[valid].astype(np.int64), sh[valid]


def minhash_signatures(
    flat_shingles: np.ndarray,
    offsets: np.ndarray,
    num_perm: int = 128,
    seed: int = 7,
    chunk: int = 16,
) -> np.ndarray:
    """(n_rows, num_perm) uint64 signatures; permutations chunked to bound
    the temporary (flat × chunk) matrix."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE61, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE61, num_perm, dtype=np.int64).astype(np.uint64)
    n_rows = len(offsets) - 1
    sig = np.full((n_rows, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat_shingles) == 0:
        return sig
    nonempty = np.diff(offsets) > 0
    starts = offsets[:-1][nonempty]
    x = flat_shingles % np.uint64(_MERSENNE61)
    for lo in range(0, num_perm, chunk):
        hi = min(lo + chunk, num_perm)
        # (flat, chunk) universal hashes mod p (uint64 wrap is fine for min-
        # comparisons as long as both sides wrap identically and deterministically)
        hv = (x[:, None] * a[None, lo:hi] + b[None, lo:hi]) % np.uint64(_MERSENNE61)
        mins = np.minimum.reduceat(hv, starts, axis=0)
        sig[nonempty, lo:hi] = mins
    return sig


def band_hashes(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """(n_rows, bands) uint64: one combined hash per signature band."""
    n_rows, num_perm = sig.shape
    r = num_perm // bands
    out = np.zeros((n_rows, bands), dtype=np.uint64)
    mult = np.uint64(0x9E3779B97F4A7C15)
    for b in range(bands):
        acc = np.full(n_rows, np.uint64(0x811C9DC5), dtype=np.uint64)
        for j in range(b * r, (b + 1) * r):
            acc = (acc ^ sig[:, j]) * mult
        out[:, b] = acc
    return out


def simhash(flat_tokens: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """64-bit SimHash per row from flat token hashes (Charikar 2002)."""
    n_rows = len(offsets) - 1
    if len(flat_tokens) == 0:
        return np.zeros(n_rows, dtype=np.uint64)
    bits = np.unpackbits(flat_tokens.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    signed = bits.astype(np.int32) * 2 - 1  # (flat, 64) in {-1, +1}
    nonempty = np.diff(offsets) > 0
    starts = offsets[:-1][nonempty]
    sums = np.add.reduceat(signed, starts, axis=0)
    out = np.zeros((n_rows, 64), dtype=np.uint8)
    out[nonempty] = (sums > 0).astype(np.uint8)
    return np.packbits(out, axis=1, bitorder="little").view(np.uint64).ravel()


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a ^ b).view(np.uint8).reshape(len(a), 8)
    return np.unpackbits(x, axis=1).sum(axis=1)


def jaccard(set_a: np.ndarray, set_b: np.ndarray) -> float:
    """Exact Jaccard of two (unique-ified) shingle-hash arrays."""
    ua, ub = np.unique(set_a), np.unique(set_b)
    if len(ua) == 0 and len(ub) == 0:
        return 1.0
    inter = len(np.intersect1d(ua, ub, assume_unique=True))
    return inter / (len(ua) + len(ub) - inter)


def winnow_fingerprints(
    text: pa.Array | pa.ChunkedArray, k: int = 8, w: int = 4
):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
    the MOSS algorithm): rolling char k-gram hashes → per-window (w) minima
    → distinct selected hashes per document.

    Guarantee: any substring match of length ≥ k + w - 1 between two
    documents shares at least one selected fingerprint. Fully vectorized
    over the batch's flat byte buffer: k shifted multiply-adds for the
    rolling hash, one ``sliding_window_view`` min for window selection,
    lexsort-dedup for the per-row distinct sets — no Python loop over rows,
    grams or windows.

    Returns (flat_fingerprints uint64, row_offsets int64) — distinct
    fingerprints per row, sorted within each row.
    """
    from numpy.lib.stride_tricks import sliding_window_view

    lowered = pc.utf8_lower(pc.fill_null(text, ""))
    if isinstance(lowered, pa.ChunkedArray):
        lowered = lowered.combine_chunks()
    buf = pc.cast(lowered, pa.binary())
    lens = pc.binary_length(buf).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    n_rows = len(lens)
    # flat byte view: a freshly-cast array is offset-0/contiguous; fall back
    # to an explicit join for sliced inputs
    if buf.offset == 0 and buf.buffers()[2] is not None:
        data = np.frombuffer(buf.buffers()[2], dtype=np.uint8)[: offsets[-1]]
    else:
        data = np.frombuffer(b"".join(buf.to_pylist()), dtype=np.uint8)

    # rolling polynomial k-gram hash at every flat position
    mult = np.uint64(0x100000001B3)
    if len(data) >= k:
        h = np.zeros(len(data) - k + 1, dtype=np.uint64)
        for j in range(k):
            h = h * mult + data[j : len(data) - k + 1 + j].astype(np.uint64)
    else:
        h = np.zeros(0, dtype=np.uint64)

    n_grams = np.maximum(lens - k + 1, 0)  # valid gram count per row
    rows_parts, vals_parts = [], []

    # full windows: window starting at flat pos p is valid iff the whole
    # char span [p, p + w + k - 1) stays inside one row
    if len(h) >= w:
        wmin = sliding_window_view(h, w).min(axis=1)
        pos = np.arange(len(wmin))
        row_of = np.searchsorted(offsets, pos, side="right") - 1
        valid = pos + w + k - 1 <= offsets[row_of + 1]
        rows_parts.append(row_of[valid])
        vals_parts.append(wmin[valid])

    # short rows (0 < n_grams < w): no full window — their single
    # fingerprint is the min over the row's grams (reduceat, vectorized)
    short = (n_grams > 0) & (n_grams < w)
    if short.any():
        starts = offsets[:-1][short]
        mins = np.minimum.reduceat(h, starts)
        # reduceat reduces to the NEXT start; clip against row gram ranges by
        # re-reducing exactly: build index arrays per short row
        counts = n_grams[short]
        idx = np.repeat(starts, counts) + (
            np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts, counts)
        )
        seg = np.repeat(np.arange(len(starts)), counts)
        mins = np.full(len(starts), np.iinfo(np.uint64).max, dtype=np.uint64)
        np.minimum.at(mins, seg, h[idx])
        rows_parts.append(np.flatnonzero(short))
        vals_parts.append(mins)

    if not rows_parts:
        return np.zeros(0, np.uint64), np.zeros(n_rows + 1, np.int64)
    rows = np.concatenate(rows_parts)
    vals = np.concatenate(vals_parts)
    # distinct (row, value): lexsort then drop adjacent duplicates
    order = np.lexsort((vals, rows))
    rows, vals = rows[order], vals[order]
    keep = np.ones(len(rows), dtype=bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (vals[1:] != vals[:-1])
    rows, vals = rows[keep], vals[keep]
    out_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n_rows), out=out_offsets[1:])
    return vals, out_offsets


def kgram_hashes(text: pa.Array | pa.ChunkedArray, k: int = 8):
    """Distinct rolling char k-gram hashes per row — the UN-winnowed
    superset of :func:`winnow_fingerprints` (same polynomial hash, every
    position instead of window minima). Ground-truth side of the winnowing
    recall meter.

    Returns (flat_hashes uint64, row_offsets int64), distinct + sorted per
    row.
    """
    lowered = pc.utf8_lower(pc.fill_null(text, ""))
    if isinstance(lowered, pa.ChunkedArray):
        lowered = lowered.combine_chunks()
    buf = pc.cast(lowered, pa.binary())
    lens = pc.binary_length(buf).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    n_rows = len(lens)
    if buf.offset == 0 and buf.buffers()[2] is not None:
        data = np.frombuffer(buf.buffers()[2], dtype=np.uint8)[: offsets[-1]]
    else:
        data = np.frombuffer(b"".join(buf.to_pylist()), dtype=np.uint8)

    mult = np.uint64(0x100000001B3)
    if len(data) >= k:
        h = np.zeros(len(data) - k + 1, dtype=np.uint64)
        for j in range(k):
            h = h * mult + data[j : len(data) - k + 1 + j].astype(np.uint64)
    else:
        h = np.zeros(0, dtype=np.uint64)

    # gram at flat pos p belongs to its row iff the whole k-span stays inside
    pos = np.arange(len(h))
    row_of = np.searchsorted(offsets, pos, side="right") - 1
    valid = pos + k <= offsets[row_of + 1]
    rows, vals = row_of[valid], h[valid]
    order = np.lexsort((vals, rows))
    rows, vals = rows[order], vals[order]
    keep = np.ones(len(rows), dtype=bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (vals[1:] != vals[:-1])
    rows, vals = rows[keep], vals[keep]
    out_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n_rows), out=out_offsets[1:])
    return vals, out_offsets


def md5_fingerprints(texts) -> list[str]:
    """Stable content fingerprint: md5 hex of each string (C-implemented,
    ~1 µs/row; oracle-recomputable via DuckDB ``md5()``)."""
    return [
        hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
        for t in texts
    ]


# ---------------------------------------------------------------------------
# vectorized single-block MD5 (messages ≤ 55 bytes)
# ---------------------------------------------------------------------------

#: round constants floor(abs(sin(i+1))·2^32) and per-round rotations — the
#: public MD5 schedule (RFC 1321)
_MD5_K = np.floor(np.abs(np.sin(np.arange(1, 65))) * 2**32).astype(np.uint64).astype(
    np.uint32
)
_MD5_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)


def _rotl32(x: np.ndarray, s: int) -> np.ndarray:
    return (x << np.uint32(s)) | (x >> np.uint32(32 - s))


def md5_digests_short(msgs: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """MD5 digests of N messages that each fit ONE 512-bit block (≤ 55
    bytes), vectorized across messages — 64 rounds of numpy uint32 ops on
    the whole batch instead of a per-row ``hashlib`` loop.

    ``msgs``: (N, 64) uint8, zero-padded message bytes; ``lens``: (N,) byte
    lengths. Returns (N, 16) uint8 digests, bit-identical to ``hashlib.md5``
    (pinned in tests).
    """
    buf = msgs.copy()
    n = len(buf)
    idx = np.arange(n)
    buf[idx, lens] = 0x80
    bits = (lens.astype(np.uint64) * 8).astype(np.uint64)
    buf[:, 56] = (bits & 0xFF).astype(np.uint8)
    buf[:, 57] = ((bits >> 8) & 0xFF).astype(np.uint8)
    m = np.ascontiguousarray(buf).view("<u4").reshape(n, 16)

    a = np.full(n, 0x67452301, np.uint32)
    b = np.full(n, 0xEFCDAB89, np.uint32)
    c = np.full(n, 0x98BADCFE, np.uint32)
    d = np.full(n, 0x10325476, np.uint32)
    for i in range(64):
        if i < 16:
            f = (b & c) | (~b & d)
            g = i
        elif i < 32:
            f = (d & b) | (~d & c)
            g = (5 * i + 1) % 16
        elif i < 48:
            f = b ^ c ^ d
            g = (3 * i + 5) % 16
        else:
            f = c ^ (b | ~d)
            g = (7 * i) % 16
        x = f + a + _MD5_K[i] + m[:, g]
        a, d, c = d, c, b
        b = b + _rotl32(x, int(_MD5_S[i]))
    a0 = (a + np.uint32(0x67452301)).astype(np.uint32)
    b0 = (b + np.uint32(0xEFCDAB89)).astype(np.uint32)
    c0 = (c + np.uint32(0x98BADCFE)).astype(np.uint32)
    d0 = (d + np.uint32(0x10325476)).astype(np.uint32)
    return np.ascontiguousarray(np.stack([a0, b0, c0, d0], axis=1)).view(np.uint8).reshape(n, 16)


_POW10 = (10 ** np.arange(20, dtype=np.float64)).astype(np.uint64)


def md5_digests_of_prefixed_ints(
    prefix: bytes, ids: np.ndarray, chunk: int = 16384
) -> np.ndarray:
    """(N, 16) digests of ``md5(prefix + str(i))`` per non-negative id,
    fully vectorized — the seeded-permutation kernel of the epoch shuffle
    (oracle twin: DuckDB ``md5(prefix || CAST(id AS VARCHAR))``).

    Single-block schedule: ``len(prefix) + 20`` decimal digits must stay
    ≤ 55 bytes. Digits are produced numerically as in
    :func:`md5_first_byte_of_ints`; rounds run in cache-sized chunks.
    """
    p = np.frombuffer(prefix, dtype=np.uint8)
    np_ = len(p)
    if np_ + 20 > 55:
        raise ValueError("prefix too long for single-block MD5")
    ids_u = np.asarray(ids).astype(np.uint64)
    n = len(ids_u)
    nd = np.maximum(np.searchsorted(_POW10, ids_u, side="right"), 1).astype(np.int64)
    out = np.empty((n, 16), dtype=np.uint8)
    for lo in range(0, n, chunk):
        sl = slice(lo, min(lo + chunk, n))
        v, d = ids_u[sl], nd[sl]
        msgs = np.zeros((len(v), 64), dtype=np.uint8)
        msgs[:, :np_] = p
        for j in range(int(d.max()) if len(d) else 0):
            e = np.clip(d - 1 - j, 0, 19)
            digit = (v // _POW10[e]) % np.uint64(10)
            np.copyto(msgs[:, np_ + j], (48 + digit).astype(np.uint8), where=(j < d))
        out[sl] = md5_digests_short(msgs, d + np_)
    return out


def md5_first_byte_of_ints(ids: np.ndarray, chunk: int = 16384) -> np.ndarray:
    """First digest byte of ``md5(str(i))`` per non-negative id, fully
    vectorized — the hot kernel of deterministic hash sampling
    (``hexdigest()[:2] < 'xx'`` ⟺ ``digest[0] < 0xxx`` for equal-length
    lowercase hex).

    Decimal digits are produced numerically (divmod over a pow-10 table —
    numpy's ``U``/``S`` string casts cost more than the MD5 rounds), and the
    rounds run in cache-sized chunks (measured ~3× faster than one huge
    batch: 64 rounds × a dozen 1M-element temporaries thrash L2).
    """
    ids_u = np.asarray(ids).astype(np.uint64)
    n = len(ids_u)
    nd = np.maximum(np.searchsorted(_POW10, ids_u, side="right"), 1).astype(np.int64)
    out = np.empty(n, dtype=np.uint8)
    for lo in range(0, n, chunk):
        sl = slice(lo, min(lo + chunk, n))
        v, d = ids_u[sl], nd[sl]
        msgs = np.zeros((len(v), 64), dtype=np.uint8)
        for j in range(int(d.max())):
            e = np.clip(d - 1 - j, 0, 19)
            digit = (v // _POW10[e]) % np.uint64(10)
            np.copyto(
                msgs[:, j], (48 + digit).astype(np.uint8), where=(j < d)
            )
        out[sl] = md5_digests_short(msgs, d)[:, 0]
    return out
