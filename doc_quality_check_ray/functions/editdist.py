"""Vectorized batched Levenshtein distance.

One DP over ALL candidate pairs simultaneously: the classic row-by-row
recurrence has a sequential dependency through the insertion term
(``cur[j] = min(..., cur[j-1]+1)``); it is resolved in closed form as a
prefix minimum — ``cur[j] = j + min_{i<=j}(tmp[i] - i)`` — so each DP row
is a handful of numpy kernels over a ``(n_pairs, max_len_b+1)`` matrix and
the only Python loop is over the rows of the shorter side (bounded by the
longest candidate string, not by the pair count).

Unit-cost edits, byte-for-byte equal to DuckDB's ``levenshtein()``
(property-tested in ``tests/test_editdist.py``).
"""

from __future__ import annotations

import numpy as np


def levenshtein_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Unit-cost Levenshtein distance for each aligned pair (a[p], b[p]).

    Vectorized across pairs: O(max_len_a) numpy passes, each over a
    ``(n_pairs, max_len_b+1)`` int64 matrix. UTF-8 BYTE semantics — DuckDB's
    ``levenshtein`` edits bytes, not codepoints (``levenshtein('é','e')`` =
    2), and the oracle twin must agree on non-ASCII input too.
    """
    n = len(a)
    assert len(b) == n
    if n == 0:
        return np.zeros(0, dtype=np.int64)

    def enc(s: str) -> np.ndarray:
        return np.frombuffer(s.encode("utf-8"), dtype=np.uint8)

    ae = [enc(s) for s in a]
    be = [enc(s) for s in b]
    la = np.array([len(x) for x in ae], dtype=np.int64)
    lb = np.array([len(x) for x in be], dtype=np.int64)
    max_a = int(la.max())
    max_b = int(lb.max())

    a_mat = np.zeros((n, max_a), dtype=np.uint8)
    b_mat = np.zeros((n, max_b), dtype=np.uint8)
    for p in range(n):
        a_mat[p, : la[p]] = ae[p]
        b_mat[p, : lb[p]] = be[p]

    j = np.arange(max_b + 1, dtype=np.int64)
    prev = np.broadcast_to(j, (n, max_b + 1)).copy()
    out = np.where(la == 0, lb, 0)

    for i in range(1, max_a + 1):
        neq = (b_mat != a_mat[:, i - 1][:, None]).astype(np.int64)
        tmp = np.minimum(prev[:, :-1] + neq, prev[:, 1:] + 1)  # j = 1..max_b
        t2 = np.concatenate([np.full((n, 1), i, dtype=np.int64), tmp], axis=1)
        cur = np.minimum.accumulate(t2 - j, axis=1) + j
        done = la == i
        if done.any():
            out[done] = cur[done, lb[done]]
        prev = cur
    return out
