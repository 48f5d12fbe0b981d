"""Dedup operators on corpora with planted exact and near duplicates."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from doc_quality_check_ray.stages.dedup import (
    exact_dedup_groups,
    exact_dedup_keep_first,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away into "
    "the deep green forest while birds sing old songs about long summer days"
)


def _corpus():
    """60 distinct docs + planted dups: 10↔110 exact, 11↔111 near (one word)."""
    rng = np.random.default_rng(9)
    words = BASE.split()
    docs = {}
    for i in range(60):
        docs[i] = " ".join(rng.permutation(words).tolist())
    # dup ids chosen ≡ their originals mod 3 so they share a source group
    docs[109] = docs[10]  # exact dup (10 ≡ 109 ≡ 1 mod 3)
    near = docs[11].split()
    near[5] = "changed"
    docs[110] = " ".join(near)  # near dup (11 ≡ 110 ≡ 2 mod 3)
    ids = sorted(docs)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([docs[i] for i in ids], pa.string()),
            "source": pa.array(["src" + str(i % 3) for i in ids], pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(4)


def test_exact_dedup_groups_and_keep_first():
    ds = _corpus()
    g = exact_dedup_groups(ds).to_pandas()
    assert len(g) == 61  # 62 rows, one exact dup pair
    dup = g[g.n_copies > 1]
    assert len(dup) == 1 and dup.iloc[0].keep_id == 10 and dup.iloc[0].n_copies == 2

    kept = exact_dedup_keep_first(ds).to_pandas()
    assert len(kept) == 61
    assert 109 not in set(kept.doc_id) and 10 in set(kept.doc_id)


def test_keep_first_null_text_rows_form_one_group():
    """Null-text docs are one fingerprint group (md5(NULL) semantics): the
    min-id representative survives, all columns intact, no driver collect."""
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["a", None, "a", None, "b"], pa.string()),
            "source": pa.array(["s0"] * 5, pa.string()),
        }
    )
    kept = (
        exact_dedup_keep_first(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(kept.doc_id) == [1, 2, 5]
    assert set(kept.columns) == {"doc_id", "text", "source"}


def test_minhash_lsh_finds_planted_pairs():
    pairs = minhash_lsh_pairs(_corpus(), threshold=0.6).to_pandas()
    found = set(zip(pairs.a_id, pairs.b_id))
    assert (10, 109) in found
    assert (11, 110) in found
    exact = pairs[(pairs.a_id == 10) & (pairs.b_id == 109)]
    assert exact.jaccard.iloc[0] == 1.0
    near = pairs[(pairs.a_id == 11) & (pairs.b_id == 110)]
    assert 0.6 <= near.jaccard.iloc[0] < 1.0
    # permuted same-word docs share the full vocabulary but few shingles:
    # no false positives at this threshold beyond the planted pairs
    assert len(pairs) <= 4


def test_minhash_distributed_verify_matches_driver_path():
    """The scale path (hash-bucket join verification) must produce exactly
    the gated driver path's result."""
    fast = minhash_lsh_pairs(_corpus(), threshold=0.6).to_pandas()
    dist = minhash_lsh_pairs(_corpus(), threshold=0.6, verify="distributed").to_pandas()
    assert fast.values.tolist() == dist.values.tolist()


def test_simhash_finds_exact_dup():
    pairs = simhash_pairs(_corpus(), max_hamming=3).to_pandas()
    found = set(zip(pairs.a_id, pairs.b_id))
    assert (10, 109) in found
    d = pairs[(pairs.a_id == 10) & (pairs.b_id == 109)].hamming.iloc[0]
    assert d == 0


def test_simhash_distributed_dedup_matches_driver_path():
    """The distributed pair-dedup branch (the scale path, normally gated
    behind max_driver_pairs candidates) must produce exactly the driver
    path's result."""
    fast = simhash_pairs(_corpus(), max_hamming=3).to_pandas()
    dist = simhash_pairs(_corpus(), max_hamming=3, dedup="distributed").to_pandas()
    assert fast.values.tolist() == dist.values.tolist()


def test_recall_queries_measure_against_exact_twins(sf_dir):
    from doc_quality_check_ray.pipelines.documents import (
        q_minhash_recall,
        q_simhash_recall,
    )

    mh = q_minhash_recall(sf_dir).to_pylist()[0]
    assert mh["n_hit"] <= mh["n_exact"] and 0.0 <= mh["recall"] <= 1.0
    # planted near-dups are high-jaccard: 16-band LSH must find them all
    assert mh["recall"] == 1.0
    sh = q_simhash_recall(sf_dir).to_pylist()[0]
    # pigeonhole guarantee at hamming<=3 with no overflowing buckets
    assert sh["recall"] == 1.0


def test_ngram_jaccard_within_groups():
    # planted pairs share doc_id % 3 → same source group
    pairs = ngram_jaccard_pairs(_corpus(), threshold=0.5).to_pandas()
    found = set(zip(pairs.a_id, pairs.b_id))
    assert (11, 110) in found or (10, 109) in found
    for _, r in pairs.iterrows():
        assert r.a_id % 3 == r.b_id % 3  # partitioning assumption holds


def test_substring_dup_docs_matches_duckdb_including_non_ascii():
    """The byte-window fast path and the non-ASCII char-window fallback must
    both reproduce DuckDB's character-based substring semantics."""
    import duckdb
    import pandas as pd
    import ray.data

    from doc_quality_check_ray.stages.dedup import substring_dup_docs

    shared = "the same long verbatim overlap sentence"
    uni = "héllo wörld — unicode padding çüé " + "x" * 10
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "prefix A " + shared + " tail one",
                "prefix B " + shared + " tail two",
                "completely unrelated content nothing in common here at all",
                uni + shared,          # non-ASCII row sharing the overlap
                uni + " different",    # non-ASCII row sharing only uni prefix
                None,
            ],
        }
    )
    got = (
        substring_dup_docs(ray.data.from_pandas(docs), k=16, min_shared=4)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(
        """
WITH g AS (
  SELECT DISTINCT doc_id, substring(text, i, 16) AS gram
  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text)-15)) AS i
        FROM documents)
), d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2)
SELECT doc_id, count(*) AS n_shared FROM g JOIN d USING (gram)
GROUP BY 1 HAVING count(*) >= 4 ORDER BY doc_id
"""
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)
    # the planted overlap is found, for ASCII and non-ASCII carriers alike
    assert {1, 2, 4} <= set(got["doc_id"])


def test_substring_dup_grams_preserve_trailing_nul_bytes():
    """ADVICE r3: numpy "S{k}" items strip trailing 0x00 on access, which
    would truncate and MERGE distinct grams ending in NUL. The gram column
    is now built length-preserving from the window buffer: two docs whose
    only shared windows end in NUL bytes must still be detected, and a doc
    sharing only the NUL-stripped PREFIX must not be."""
    import pandas as pd
    import ray.data

    from doc_quality_check_ray.stages.dedup import substring_dup_docs

    k = 4
    shared = "ab\x00\x00cdef"  # shared windows include 'b\x00\x00c' etc.
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "XX" + shared,
                "YY" + shared,
                # contains 'ab' + non-NUL tail: under NUL-stripping, the
                # stripped gram 'ab' would falsely match doc 1/2's 'ab\0\0'
                "ZZabQRSTUV",
            ],
        }
    )
    got = (
        substring_dup_docs(ray.data.from_pandas(docs), k=k, min_shared=1)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # python-set ground truth (character windows, exact bytes)
    grams = {
        i: {t[j : j + k] for j in range(len(t) - k + 1)}
        for i, t in zip(docs.doc_id, docs.text)
    }
    want = {
        i: sum(
            1
            for g in grams[i]
            if any(g in grams[j] for j in grams if j != i)
        )
        for i in grams
    }
    want = {i: n for i, n in want.items() if n >= 1}
    assert dict(zip(got.doc_id, got.n_shared)) == want
    assert 3 not in set(got.doc_id)


def test_ngram_decontaminate_planted_overlap():
    """Corpus docs sharing a token 5-gram with the blocklist are flagged
    with their DISTINCT contaminated-gram count; shorter-than-k rows and
    non-overlapping docs contribute nothing."""
    import pandas as pd
    import ray.data

    from doc_quality_check_ray.stages.dedup import ngram_decontaminate

    block = pd.DataFrame(
        {
            "doc_id": [100, 101],
            "text": ["alpha beta gamma delta epsilon zeta", "one two three"],
        }
    )
    corpus = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                # shares both of block doc 100's 5-gram windows
                "x alpha beta gamma delta epsilon zeta y",
                # shares exactly one (the trailing window)
                "q beta gamma delta epsilon zeta",
                "nothing in common here at all whatsoever today",
                "one two three",  # < 5 tokens: skipped by the k-gram rule
                None,
            ],
        }
    )
    got = (
        ngram_decontaminate(
            ray.data.from_pandas(corpus).repartition(2),
            ray.data.from_pandas(block),
            k=5,
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = pd.DataFrame({"doc_id": [1, 2], "n_dirty": [2, 1]})
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)
