"""Winnowing fingerprints (Schleimer et al. 2003): vectorized implementation
pinned to a per-row pure-Python reference; pair operator finds planted
verbatim overlap."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import ray.data

from doc_quality_check_ray.functions.hashing import winnow_fingerprints
from doc_quality_check_ray.stages.dedup import winnow_pairs


def _ref_winnow(texts, k=8, w=4):
    mult, M = 0x100000001B3, 1 << 64
    out = []
    for t in texts:
        b = (t or "").lower().encode()
        grams = []
        for i in range(max(len(b) - k + 1, 0)):
            h = 0
            for j in range(k):
                h = (h * mult + b[i + j]) % M
            grams.append(h)
        if not grams:
            out.append([])
        elif len(grams) < w:
            out.append([min(grams)])
        else:
            out.append(sorted({min(grams[i : i + w]) for i in range(len(grams) - w + 1)}))
    return out


def test_vectorized_winnowing_matches_reference():
    rng = random.Random(3)
    texts = [
        "hello world this is a document about winnowing fingerprints",
        "", None, "short", "a" * 7, "a" * 8, "abcdefghij",
        *(
            "".join(rng.choice("abcd ef") for _ in range(rng.randint(0, 60)))
            for _ in range(100)
        ),
    ]
    flat, offs = winnow_fingerprints(pa.array(texts, pa.string()))
    got = [sorted(flat[offs[i] : offs[i + 1]].tolist()) for i in range(len(texts))]
    assert got == _ref_winnow(texts)


def test_substring_guarantee():
    """Two docs sharing a substring of length >= k + w - 1 share >= 1 print."""
    shared = "this exact sentence appears verbatim in both documents"
    a = "prefix text before. " + shared + " and then a different tail here"
    b = "completely other opening words, " + shared + ", closing differently"
    flat, offs = winnow_fingerprints(pa.array([a, b], pa.string()))
    fa = set(flat[offs[0] : offs[1]].tolist())
    fb = set(flat[offs[1] : offs[2]].tolist())
    assert fa & fb


def test_winnow_pairs_find_planted_overlap():
    rng = np.random.default_rng(5)
    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()
    docs = {i: " ".join(rng.permutation(np.repeat(words, 3)).tolist()) for i in range(30)}
    docs[100] = docs[7]                      # exact copy
    docs[101] = docs[8] + " extra tail words appended here"  # long prefix overlap
    ids = sorted(docs)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([docs[i] for i in ids], pa.string()),
            }
        )
    ).repartition(3)
    pairs = winnow_pairs(ds, min_shared=8).to_pandas()
    found = set(zip(pairs.a_id, pairs.b_id))
    assert (7, 100) in found
    assert (8, 101) in found


def test_winnow_recall_meter_nonempty_exact_set(sf_dir):
    """d_winnow_recall: the full-k-gram ground truth selects the planted
    overlap pairs (n_exact > 0) and winnowing recovers them all."""
    from doc_quality_check_ray.pipelines.documents import q_winnow_recall

    row = q_winnow_recall(sf_dir).to_pylist()[0]
    assert row["n_exact"] > 0
    assert row["recall"] == 1.0
