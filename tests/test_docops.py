"""Pinned examples for the round-3 document operators: quantization bounds,
token entropy, sequence packing, stratified sampling."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest


def test_quantize_embeddings_bounds_and_roundtrip(sf_dir):
    from doc_quality_check_ray.pipelines.documents import q_quantize_embeddings

    out = q_quantize_embeddings(sf_dir).to_pandas()
    assert out.qval.abs().max() == 127  # the max-|v| element hits full scale
    assert (out.qval.abs() <= 127).all()
    # dequantized error bounded by half a quantization step per element
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas().set_index("vec_id")
    for vid, g in out.groupby("vec_id"):
        v = np.asarray(emb.loc[vid, "embedding"], dtype=np.float64)
        scale = g["scale"].iloc[0]
        deq = g.sort_values("dim_idx")["qval"].to_numpy() / scale
        assert np.abs(deq - v).max() <= 0.5 / scale + 1e-9


def test_token_entropy_pinned():
    from doc_quality_check_ray.pipelines.documents import q_token_entropy
    import ray.data
    from unittest.mock import patch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a a b b", "x x x x", "   ", None], pa.string()),
        }
    )
    with patch(
        "doc_quality_check_ray.pipelines.documents._docs",
        lambda _: ray.data.from_arrow(t),
    ):
        out = q_token_entropy("ignored").to_pandas().set_index("doc_id")
    assert set(out.index) == {1, 2}  # blank/null docs emit no row
    assert out.loc[1, "n_tokens"] == 4
    assert out.loc[1, "entropy"] == pytest.approx(math.log(2), abs=1e-6)
    assert out.loc[2, "entropy"] == 0.0


def test_pack_chunks_capacity_and_order(sf_dir):
    from doc_quality_check_ray.pipelines.documents import (
        PACK_CAPACITY,
        PACK_CHUNK,
        q_pack_chunks,
    )

    out = q_pack_chunks(sf_dir).to_pandas().sort_values(
        ["doc_id", "chunk_idx"], ignore_index=True
    )
    # bins are contiguous non-decreasing in corpus (doc_id, chunk_idx) order
    assert (out["bin_id"].diff().fillna(0) >= 0).all()
    assert out["bin_id"].iloc[0] == 0
    # token mass of chunks STARTING in a bin is bounded by capacity plus one
    # straddling chunk (chunks are <= PACK_CHUNK tokens; doc tails shorter)
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    T = {
        r["doc_id"]: len([w for w in (r["text"] or "").split() if w])
        for r in docs.to_pylist()
    }
    size = np.minimum(
        PACK_CHUNK,
        out["doc_id"].map(T).to_numpy() - out["chunk_idx"].to_numpy() * PACK_CHUNK,
    )
    assert (size > 0).all()
    mass = out.assign(size=size).groupby("bin_id")["size"].sum()
    assert mass.max() <= PACK_CAPACITY + PACK_CHUNK - 1
    # every bin except the last is filled to at least capacity - (chunk - 1)
    assert mass.iloc[:-1].min() >= PACK_CAPACITY - PACK_CHUNK + 1


def test_stratified_sample_quota(sf_dir):
    from doc_quality_check_ray.pipelines.documents import (
        STRATIFIED_K,
        q_stratified_sample,
    )

    out = q_stratified_sample(sf_dir).to_pandas()
    sizes = out.groupby("source").size()
    assert (sizes <= STRATIFIED_K).all()
    assert not out.duplicated(["source", "doc_id"]).any()


def test_dedup_keep_drops_non_canonical(sf_dir):
    from doc_quality_check_ray.pipelines.documents import (
        q_dedup_keep,
        q_dup_components,
    )

    kept = set(q_dedup_keep(sf_dir).to_pandas().doc_id)
    comp = q_dup_components(sf_dir).to_pandas()
    dropped = set(comp[comp.doc_id != comp.component_id].doc_id)
    assert dropped and dropped.isdisjoint(kept)  # non-canonical gone
    assert set(comp.component_id) <= kept  # every cluster keeps its canon


def test_heavy_hitters_mg_guarantee(sf_dir):
    """Misra-Gries bound: est <= true <= est + err_bound for every reported
    token, and every token with true count > err_bound appears in the
    sketch's surviving counters (here: the top-k covers the true top-1)."""
    import duckdb

    from doc_quality_check_ray.pipelines.documents import (
        MG_TOPK,
        q_heavy_hitters,
        q_heavy_hitters_recall,
    )

    hh = q_heavy_hitters(sf_dir).to_pandas()
    assert 0 < len(hh) <= MG_TOPK
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    true = dict(
        con.sql(
            "WITH tok AS (SELECT unnest(string_split_regex(trim(lower(text)),"
            " '\\s+')) AS t FROM documents)"
            " SELECT t, count(*) FROM tok WHERE t <> '' GROUP BY 1"
        ).fetchall()
    )
    err = int(hh["err_bound"].iloc[0])
    for _, r in hh.iterrows():
        tc = true[r["token"]]
        assert r["est_count"] <= tc <= r["est_count"] + err
    top1 = max(true, key=lambda t: (true[t], t))
    assert top1 in set(hh["token"])
    rec = q_heavy_hitters_recall(sf_dir).to_pandas()
    assert rec["n_exact"].iloc[0] == MG_TOPK
    assert 0.0 <= rec["recall"].iloc[0] <= 1.0


def test_pii_redact_plants_and_masks(sf_dir):
    from doc_quality_check_ray.pipelines.documents import q_pii_redact

    out = q_pii_redact(sf_dir).to_pandas().set_index("doc_id")
    # every multiple of 7 planted exactly one email; it is masked
    assert (out.loc[out.index % 7 == 0, "n_email"] == 1).all()
    assert (out.loc[out.index % 7 != 0, "n_email"] == 0).all()
    assert out.loc[7, "redacted"].endswith(" mail <EMAIL> now")
    assert "@" not in " ".join(out.redacted)
    # phones and IPs likewise masked
    assert (out.loc[out.index % 11 == 0, "n_phone"] == 1).all()
    assert (out.loc[out.index % 13 == 0, "n_ip"] == 1).all()
    assert not out.redacted.str.contains(r"\d{3}-\d{3}-\d{4}", regex=True).any()
    assert not out.redacted.str.contains(r"\d+\.\d+\.\d+\.\d+", regex=True).any()
    # doc 0 hits all three classes
    assert out.loc[0, ["n_email", "n_phone", "n_ip"]].tolist() == [1, 1, 1]


def test_hll_distinct_meter(sf_dir):
    from doc_quality_check_ray.pipelines.documents import q_hll_distinct

    m = q_hll_distinct(sf_dir).to_pandas()
    assert len(m) > 0 and (m["n_exact"] > 0).all()
    # p=12 HLL on a band-limited vocabulary: relative error well under 5%
    assert (m["rel_err"] < 0.05).all()


def test_bloom_decontaminate_never_false_keeps(sf_dir):
    from doc_quality_check_ray.pipelines.documents import q_bloom_decontaminate

    m = q_bloom_decontaminate(sf_dir).to_pandas().iloc[0]
    # a Bloom filter can over-drop (false positives) but never under-drop
    assert bool(m["no_false_keeps"])
    assert m["n_kept_bloom"] <= m["n_kept_exact"]
    assert m["n_false_drops"] == m["n_kept_exact"] - m["n_kept_bloom"]
    # the deliberately tiny filter must actually exercise the meter
    assert m["fpr"] > 0


def test_domain_stats_plants(sf_dir):
    from doc_quality_check_ray.pipelines.documents import q_domain_stats

    d = q_domain_stats(sf_dir).to_pandas().set_index("domain")
    # 100 docs per site bucket at 500 docs / mod 5 / 20 sites -> 5 docs each
    org = d[d.index.str.endswith("example.org")]
    net = d[d.index.str.endswith("example.net")]
    assert org["n_urls"].sum() == 100  # 500/5 docs planted one URL each
    assert net["n_urls"].sum() == 34  # ceil(500/15) plants
    assert (d["n_docs"] <= d["n_urls"]).all()


def test_compression_ratio_pinned(sf_dir):
    """zlib level-6 is deterministic; repetitive text compresses harder."""
    import zlib

    from doc_quality_check_ray.pipelines.documents import q_compression_ratio

    out = q_compression_ratio(sf_dir).to_pandas().set_index("doc_id")
    assert (out["ratio"] > 0).all() and (out["comp_len"] > 0).all()
    # pin one row against a direct zlib call
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas().set_index("doc_id")
    d0 = docs.iloc[0]
    raw = d0["text"].encode("utf-8")
    assert out.loc[docs.index[0], "comp_len"] == len(zlib.compress(raw, 6))
    # word-salad corpus still compresses well below 1.0
    assert out["ratio"].median() < 0.7


def test_weighted_sample_matches_exhaustive_selection(sf_dir):
    """The per-batch-top-k + driver-merge path must select exactly the k
    docs an exhaustive driver-side computation of the Efraimidis–Spirakis
    keys selects, and higher-token docs must be overrepresented vs a
    uniform draw (the point of weighting)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from doc_quality_check_ray.functions import textstats as ts
    from doc_quality_check_ray.pipelines.documents import (
        WSAMPLE_K,
        WSAMPLE_SEED,
        q_weighted_sample,
    )

    got = q_weighted_sample(sf_dir).to_pandas()
    assert len(got) == WSAMPLE_K
    assert list(got.columns) == ["doc_id", "source", "n_tokens"]

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_tok = np.asarray(ts.token_counts(t["text"], t.num_rows), dtype=np.int64)
    ids = t["doc_id"].to_numpy().astype(np.int64)
    keep = n_tok > 0
    ids, n_tok = ids[keep], n_tok[keep]
    u = np.array(
        [
            (int(hashlib.md5(f"{WSAMPLE_SEED}{i}".encode()).hexdigest()[:8], 16) + 0.5)
            / 2**32
            for i in ids
        ]
    )
    key = -np.log(u) / n_tok
    want = set(ids[np.argsort(key, kind="mergesort")[:WSAMPLE_K]])
    assert set(got.doc_id) == want
    # weighting bites: the sampled docs' mean token count exceeds the corpus mean
    assert got.n_tokens.mean() > n_tok.mean()


def test_tdigest_quantile_error_meter(sf_dir):
    """Driver-visible t-digest meter: estimates within 2% relative error of
    the exact histogram-exchange quantiles at every reported quantile."""
    from doc_quality_check_ray.pipelines.validate import q_tdigest_quantile_error

    rows = q_tdigest_quantile_error(sf_dir).to_pandas()
    assert len(rows) == 6
    assert (rows.rel_err <= 0.02).all(), rows


def test_dup_rate_by_source_rollup(sf_dir):
    """Per-source dup observability: totals cover the corpus, only sources
    with planted near-dup pairs report nonzero rates, and the rate equals
    n_dup_docs / n_docs."""
    import pyarrow.parquet as pq

    from doc_quality_check_ray.pipelines.documents import q_dup_rate_by_source

    rows = q_dup_rate_by_source(sf_dir).to_pandas().sort_values("source")
    n_corpus = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert rows.n_docs.sum() == n_corpus
    assert (rows.n_dup_docs <= rows.n_docs).all()
    dup = rows[rows.n_pairs > 0]
    assert len(dup) >= 1  # the corpus plants near-dup pairs
    for _, r in rows.iterrows():
        assert r.dup_rate == round(r.n_dup_docs / r.n_docs, 6)


def test_interleave_rb_bits_invariance_and_starvation(sf_dir):
    """The digest-range width is a pure parallelism knob: the emitted slots
    must be identical across widths (ranks order by the full digest; rb is
    its prefix). The starvation counter derives from the slot assignment,
    so its max_slot column also proves per-source rank contiguity."""
    import pandas as pd

    from doc_quality_check_ray.pipelines.documents import (
        q_interleave_sources,
        q_interleave_starvation,
    )

    s6 = q_interleave_sources(sf_dir, rb_bits=6).to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    s4 = q_interleave_sources(sf_dir, rb_bits=4).to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    pd.testing.assert_frame_equal(s6, s4, check_exact=True)

    stv = q_interleave_starvation(sf_dir).to_pandas()
    k = len(stv)
    # rank contiguity: max_slot == (n_docs-1)*K + src_idx for sorted sources
    for i, row in stv.sort_values("source", ignore_index=True).iterrows():
        assert row.max_slot == (row.n_docs - 1) * k + i
    assert (stv.starved_rounds == stv.n_docs.max() - stv.n_docs).all()
    assert (stv.starved_rounds == 0).sum() >= 1  # the longest source never starves


def test_source_cap_matches_exhaustive_selection(sf_dir):
    """The per-batch per-source top-k + source-keyed prune must keep exactly
    the k smallest (seeded-digest, doc_id) rows per source that an
    exhaustive driver-side hashlib computation selects, and never more than
    k per source."""
    import hashlib

    import pandas as pd
    import pyarrow.parquet as pq

    from doc_quality_check_ray.pipelines.documents import (
        SOURCE_CAP_K,
        SOURCE_CAP_SEED,
        q_source_cap,
    )

    got = q_source_cap(sf_dir).to_pandas()
    assert sorted(got.columns) == ["doc_id", "source"]
    assert got.groupby("source").size().max() <= SOURCE_CAP_K

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    docs["v"] = [
        int(hashlib.md5(f"{SOURCE_CAP_SEED}{i}".encode()).hexdigest()[:8], 16)
        for i in docs["doc_id"]
    ]
    want = (
        docs.sort_values(["v", "doc_id"], kind="mergesort")
        .groupby("source", sort=False)
        .head(SOURCE_CAP_K)[["doc_id", "source"]]
    )
    pd.testing.assert_frame_equal(
        got.sort_values(["source", "doc_id"], ignore_index=True),
        want.sort_values(["source", "doc_id"], ignore_index=True),
        check_exact=True,
    )


def test_source_cap_partition_invariant():
    """The per-batch per-source top-k partials must compose to the same
    final k-set whatever the block split (strict (digest, doc_id) total
    order makes the bounded merge exact)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "source"]
    )

    # run the same query body against two partition counts: substitute the
    # repartitioned corpus for the operator's read, keep its own
    # map_batches/groupby pipeline
    def run(n_parts: int) -> pd.DataFrame:
        ds = ray.data.from_arrow(t).repartition(n_parts)
        import doc_quality_check_ray.pipelines.documents as mod

        orig = ray.data.read_parquet
        try:
            ray.data.read_parquet = lambda *a, **k: ds
            out = mod.q_source_cap("/root/testdata/sf0.001").to_pandas()
        finally:
            ray.data.read_parquet = orig
        return out.sort_values(["source", "doc_id"], ignore_index=True)

    a, b = run(2), run(13)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
