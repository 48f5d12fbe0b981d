"""levenshtein_batch must equal DuckDB's levenshtein() cell-for-cell —
the edit-distance oracle twin's exactness rests on this."""

import duckdb
import numpy as np
import pytest

from doc_quality_check_ray.functions.editdist import levenshtein_batch


def _duck_lev(pairs):
    con = duckdb.connect()
    return [
        con.sql("select levenshtein(?, ?)", params=[a, b]).fetchone()[0]
        for a, b in pairs
    ]


def test_known_distances():
    a = ["kitten", "", "abc", "same", "abc"]
    b = ["sitting", "xyz", "", "same", "abc near copy."]
    got = levenshtein_batch(a, b)
    assert list(got) == [3, 3, 3, 0, 11]


def test_matches_duckdb_random():
    rng = np.random.default_rng(7)
    vocab = ["a", "bb", "ccc", "dd dd", "x", ""]
    pairs = []
    for _ in range(300):
        a = " ".join(rng.choice(vocab, size=rng.integers(0, 10)))
        b = " ".join(rng.choice(vocab, size=rng.integers(0, 10)))
        pairs.append((a, b))
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    assert list(got) == _duck_lev(pairs)


def test_matches_duckdb_unicode():
    pairs = [("café", "café"), ("niño", "nino"), ("αβγ", "αβδ")]
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    assert list(got) == _duck_lev(pairs)


def test_empty_input():
    assert levenshtein_batch([], []).tolist() == []


def test_append_suffix_is_its_length():
    # the planted-twin invariant the d_edit_distance_pairs fixture relies on
    texts = ["hello world this is a doc", "short"]
    twins = [t + " near copy." for t in texts]
    assert list(levenshtein_batch(texts, twins)) == [11, 11]


def test_metric_axioms_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts = st.text(alphabet="ab c", max_size=24)

    @settings(max_examples=150, deadline=None)
    @given(texts, texts, texts)
    def check(a, b, c):
        dab, dba, dac, dbc, daa = levenshtein_batch(
            [a, b, a, b, a], [b, a, c, c, a]
        )
        assert daa == 0
        assert dab == dba
        assert dac <= dab + dbc  # triangle inequality

    check()
