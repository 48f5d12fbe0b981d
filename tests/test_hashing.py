"""Vectorized single-block MD5 pinned bit-exact against hashlib."""

from __future__ import annotations

import hashlib

import numpy as np

from doc_quality_check_ray.functions.hashing import (
    md5_digests_short,
    md5_first_byte_of_ints,
)


def test_md5_digests_match_hashlib():
    msgs = [b"", b"a", b"abc", b"message digest", b"1234567890" * 5 + b"12345"]
    buf = np.zeros((len(msgs), 64), dtype=np.uint8)
    lens = np.zeros(len(msgs), dtype=np.int64)
    for i, s in enumerate(msgs):
        buf[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i] = len(s)
    got = md5_digests_short(buf, lens)
    for i, s in enumerate(msgs):
        assert bytes(got[i]) == hashlib.md5(s).digest(), s


def test_md5_first_byte_of_ints_matches_hashlib():
    ids = np.array(
        [0, 1, 7, 42, 499, 10**6, 10**12, 10**12 + 3, 2**62], dtype=np.int64
    )
    got = md5_first_byte_of_ints(ids)
    want = [hashlib.md5(str(i).encode()).digest()[0] for i in ids]
    assert got.tolist() == want
    # the sampling predicate equivalence: hexdigest[:2] < '10' == byte < 0x10
    for i in ids:
        assert (hashlib.md5(str(i).encode()).hexdigest()[:2] < "10") == (
            hashlib.md5(str(i).encode()).digest()[0] < 0x10
        )


def test_md5_digests_of_prefixed_ints_matches_hashlib():
    from doc_quality_check_ray.functions.hashing import md5_digests_of_prefixed_ints

    ids = np.array([0, 1, 7, 499, 10**6, 10**12 + 3, 2**62], dtype=np.int64)
    got = md5_digests_of_prefixed_ints(b"epoch7:", ids.astype(np.uint64))
    for row, i in zip(got, ids):
        assert bytes(row) == hashlib.md5(f"epoch7:{i}".encode()).digest(), i
    # hex-string order == big-endian (hi, lo) numeric order (the epoch
    # shuffle's cross-twin ordering claim)
    hexes = [hashlib.md5(f"epoch7:{i}".encode()).hexdigest() for i in ids]
    hi = got[:, :8].copy().view(">u8").ravel()
    lo = got[:, 8:].copy().view(">u8").ravel()
    order_hex = sorted(range(len(ids)), key=lambda j: hexes[j])
    order_num = sorted(range(len(ids)), key=lambda j: (hi[j], lo[j]))
    assert order_hex == order_num
