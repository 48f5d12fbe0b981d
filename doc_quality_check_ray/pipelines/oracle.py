"""DuckDB-SQL twins of every validation query — the correctness oracle.

Each ``SQL_*`` string, run by DuckDB over the same parquet tables (views
``events``, ``documents`` pre-registered), produces the exact table the
matching ``q_*`` Ray pipeline produces — same column names, same values —
so the driver's order-insensitive value-hash comparison passes.

SQL fragments are *generated from the same ValidationConfig* the Ray stages
use, so thresholds / detail strings cannot drift apart.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, ValidationConfig
from ..functions import textstats as ts
from ..functions.quality import sql_valid_char_ratio_expr
from ..functions.text_norm import sql_normalize_expr
from ..sources.transcripts import TRANSCRIPTS_CTE
from ..stages.row_checks import (
    sql_any_violation_predicate,
    sql_reason_case,
    sql_violation_fragments,
)


def _roles_in(cfg: ValidationConfig) -> str:
    return ", ".join(f"'{r}'" for r in cfg.valid_roles)


def sql_row_violations(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Violation-row union generated from the SAME check registry the engine
    stage runs (stages/row_checks.py) — twins cannot drift apart."""
    return TRANSCRIPTS_CTE + "\n" + "\nUNION ALL\n".join(sql_violation_fragments(cfg))


def _sql_reason_case(cfg: ValidationConfig) -> str:
    return sql_reason_case(cfg)


def sql_verdicts(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    return (
        TRANSCRIPTS_CTE
        + f"""
SELECT conv_id, turn_idx, reason = 'OK' AS valid, reason FROM (
  SELECT conv_id, turn_idx, {_sql_reason_case(cfg)} AS reason
  FROM transcripts
)
"""
    )


def sql_worst_turns(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Twin of q_worst_turns: per conversation the worst turn (lowest
    coalesced valid-char ratio; null/empty text sorts worst at -1) with its
    priority verdict reason carried — the grouped-argmin-with-label rollup
    (reference best-detection-per-page, ``app.py:469-487``)."""
    ratio = sql_valid_char_ratio_expr("text")
    return (
        TRANSCRIPTS_CTE
        + f""",
_scored AS (
  SELECT conv_id, turn_idx,
         coalesce({ratio}, -1.0) AS score,
         {_sql_reason_case(cfg)} AS reason
  FROM transcripts
),
_r AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id ORDER BY score, turn_idx, reason) AS rn
  FROM _scored
)
SELECT conv_id, turn_idx, round(score, 6) AS worst_score, reason
FROM _r WHERE rn = 1
"""
    )


def sql_duplicate_keys(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    return (
        TRANSCRIPTS_CTE
        + """
SELECT conv_id, turn_idx, count(*) AS n_dups
FROM transcripts GROUP BY conv_id, turn_idx HAVING count(*) > 1
"""
    )


def sql_turn_gaps(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    return (
        TRANSCRIPTS_CTE
        + """
SELECT conv_id, count(*) AS n, count(DISTINCT turn_idx) AS n_distinct,
       CAST(min(turn_idx) AS BIGINT) AS min_idx, CAST(max(turn_idx) AS BIGINT) AS max_idx
FROM transcripts GROUP BY conv_id
HAVING NOT (min(turn_idx) = 0 AND max(turn_idx) = count(DISTINCT turn_idx) - 1
            AND count(*) = count(DISTINCT turn_idx))
"""
    )


def sql_column_stats(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    return (
        TRANSCRIPTS_CTE
        + """
SELECT count(*) AS n_rows,
       count(DISTINCT conv_id) AS n_convs,
       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
       CAST(sum(CASE WHEN role IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_role,
       CAST(sum(CASE WHEN tool IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_tool,
       CAST(sum(CASE WHEN ts   IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
       min(length(text)) AS min_text_len,
       max(length(text)) AS max_text_len,
       CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
       min(ts) AS min_ts,
       max(ts) AS max_ts,
       count(DISTINCT role) AS n_roles
FROM transcripts
"""
    )


def sql_role_distribution(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    return TRANSCRIPTS_CTE + "SELECT role, count(*) AS n FROM transcripts GROUP BY role"


def sql_role_drift(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    return (
        TRANSCRIPTS_CTE
        + """,
_h AS (
  SELECT CAST(substring(conv_id, 2) AS BIGINT) % 2 AS half,
         coalesce(role, '<null>') AS r, count(*) AS n
  FROM transcripts GROUP BY 1, 2
),
_tot AS (
  SELECT sum(CASE WHEN half = 0 THEN n END) AS tp,
         sum(CASE WHEN half = 1 THEN n END) AS tq FROM _h
),
_dom AS (SELECT DISTINCT r FROM _h),
_j AS (
  SELECT greatest(coalesce(p.n, 0) / t.tp, 1e-6) AS pf,
         greatest(coalesce(q.n, 0) / t.tq, 1e-6) AS qf
  FROM _dom d CROSS JOIN _tot t
  LEFT JOIN _h p ON p.r = d.r AND p.half = 0
  LEFT JOIN _h q ON q.r = d.r AND q.half = 1
)
SELECT round(sum((pf - qf) * ln(pf / qf)), 6) AS psi_role,
       (SELECT CAST(tp AS BIGINT) FROM _tot) AS n_even,
       (SELECT CAST(tq AS BIGINT) FROM _tot) AS n_odd
FROM _j
"""
    )


def sql_artifact_rows(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Twin of q_artifact_rows — generated from the same registry entry."""
    from ..stages.row_checks import ROW_CHECK_REGISTRY

    frag = ROW_CHECK_REGISTRY["artifact_text"].sql_fragments(cfg)[0]
    return TRANSCRIPTS_CTE + "\n" + frag


def sql_drift_report(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Exact twin of ``validate.q_drift_report``: snapshot = even-conversation
    half, current = full corpus; smoothed PSI/KL over the union role domain
    and the fixed-edge text-length histogram (bucket i of value v = number of
    interior edges ≤ v, matching ``sketches.Histogram.of``'s searchsorted).

    The drifted gate compares the UNROUNDED scores, like the engine."""
    edges = cfg.length_hist_buckets
    n_buckets = len(edges)
    bucket_expr = " + ".join(
        f"(CASE WHEN length(text) >= {e} THEN 1 ELSE 0 END)" for e in edges[1:]
    )
    thr = cfg.psi_threshold
    return (
        TRANSCRIPTS_CTE
        + f""",
_role AS (
  SELECT CAST(substring(conv_id, 2) AS BIGINT) % 2 AS half,
         coalesce(role, '<null>') AS r, count(*) AS n
  FROM transcripts GROUP BY 1, 2
),
_rtot AS (
  SELECT CAST(sum(n) AS DOUBLE) AS t_all,
         CAST(sum(CASE WHEN half = 0 THEN n END) AS DOUBLE) AS t_even
  FROM _role
),
_rdom AS (SELECT DISTINCT r FROM _role),
_rj AS (
  SELECT greatest(coalesce(p.n_all, 0) / t.t_all, 1e-6) AS pf,
         greatest(coalesce(q.n_even, 0) / t.t_even, 1e-6) AS qf
  FROM _rdom d CROSS JOIN _rtot t
  LEFT JOIN (SELECT r, sum(n) AS n_all FROM _role GROUP BY r) p ON p.r = d.r
  LEFT JOIN (SELECT r, n AS n_even FROM _role WHERE half = 0) q ON q.r = d.r
),
_len AS (
  SELECT CAST(substring(conv_id, 2) AS BIGINT) % 2 AS half,
         {bucket_expr} AS b, count(*) AS n
  FROM transcripts WHERE text IS NOT NULL GROUP BY 1, 2
),
_htot AS (
  SELECT CAST(sum(n) AS DOUBLE) AS t_all,
         CAST(sum(CASE WHEN half = 0 THEN n END) AS DOUBLE) AS t_even
  FROM _len
),
_hdom AS (SELECT unnest(generate_series(0, {n_buckets - 1})) AS b),
_hj AS (
  SELECT greatest(coalesce(p.n_all, 0) / t.t_all, 1e-6) AS pf,
         greatest(coalesce(q.n_even, 0) / t.t_even, 1e-6) AS qf
  FROM _hdom d CROSS JOIN _htot t
  LEFT JOIN (SELECT b, sum(n) AS n_all FROM _len GROUP BY b) p ON p.b = d.b
  LEFT JOIN (SELECT b, n AS n_even FROM _len WHERE half = 0) q ON q.b = d.b
)
SELECT (SELECT count(*) FROM transcripts) AS n_rows,
       (SELECT round(sum((pf - qf) * ln(pf / qf)), 6) FROM _rj) AS psi_role,
       (SELECT round(sum(pf * ln(pf / qf)), 6) FROM _rj) AS kl_role,
       (SELECT round(sum((pf - qf) * ln(pf / qf)), 6) FROM _hj) AS psi_len,
       ((SELECT sum((pf - qf) * ln(pf / qf)) FROM _rj) > {thr}
        OR (SELECT sum((pf - qf) * ln(pf / qf)) FROM _hj) > {thr}) AS drifted
"""
    )


def _sql_all_violations_body(cfg: ValidationConfig) -> str:
    """Every violation source as one (conv_id, turn_idx) UNION — registry
    row checks plus the key-level duplicate/gap findings."""
    row_part = "\n  UNION ALL\n".join(
        f"  SELECT conv_id, turn_idx FROM ({frag})" for frag in sql_violation_fragments(cfg)
    )
    return f"""
{row_part}
  UNION ALL
  SELECT conv_id, CAST(min(turn_idx) AS INTEGER) AS turn_idx FROM transcripts
    GROUP BY conv_id, turn_idx HAVING count(*) > 1
  UNION ALL
  SELECT conv_id, CAST(-1 AS INTEGER) AS turn_idx FROM transcripts
    GROUP BY conv_id
    HAVING NOT (min(turn_idx) = 0 AND max(turn_idx) = count(DISTINCT turn_idx) - 1
                AND count(*) = count(DISTINCT turn_idx))
"""


def sql_partition_verdicts(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    n = cfg.n_partitions
    return (
        TRANSCRIPTS_CTE
        + f""",
_viol AS ({_sql_all_violations_body(cfg)}),
_rows_per AS (
  SELECT CAST(substring(conv_id, 2) AS BIGINT) % {n} AS partition_id, count(*) AS n_rows
  FROM transcripts GROUP BY 1
),
_viol_per AS (
  SELECT CAST(substring(conv_id, 2) AS BIGINT) % {n} AS partition_id,
         count(*) AS n_violations
  FROM _viol GROUP BY 1
)
SELECT CAST(r.partition_id AS INTEGER) AS partition_id, r.n_rows,
       coalesce(v.n_violations, 0) AS n_violations,
       coalesce(v.n_violations, 0) = 0 AS passed
FROM _rows_per r LEFT JOIN _viol_per v USING (partition_id)
"""
    )


# ---------------------------------------------------------------------------
# document-table operators (dedup / similarity / text analysis / multimodal)
# ---------------------------------------------------------------------------

SQL_EXACT_DEDUP = """
SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def sql_knn(query_ids=range(10), k: int = 10) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN ({ids})
), s AS (
  SELECT q.qid, e.vec_id AS nid,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 5) AS cos
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid
), r AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM s
)
SELECT qid AS query_id, nid AS neighbor_id, cos AS cosine FROM r WHERE rn <= {k}
"""


def sql_kmeans_assign(centroid_ids=range(8)) -> str:
    """Twin of documents.q_kmeans_assign: rounded cosine argmax with
    row_number tie-break on centroid id."""
    ids = ", ".join(str(i) for i in centroid_ids)
    return f"""
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id IN ({ids})
), s AS (
  SELECT e.vec_id, c.cid,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv), 5) AS cos
  FROM embeddings e CROSS JOIN c
), r AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
  FROM s
)
SELECT vec_id, cid AS centroid_id, cos AS cosine FROM r WHERE rn = 1
"""


def sql_kmeans_iter(centroid_ids=range(8)) -> str:
    """Twin of documents.q_kmeans_iter: seeded assignment (round-5 cosine,
    min-cid ties) → per-cluster rounded(6) raw means reassembled with
    ``list(cv ORDER BY d)`` → second assignment against the new centroids."""
    ids = ", ".join(str(i) for i in centroid_ids)
    return f"""
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id IN ({ids})
), s1 AS (
  SELECT e.vec_id, c.cid,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv), 5) AS cos
  FROM embeddings e CROSS JOIN c
), a1 AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
    FROM s1
  ) WHERE rn = 1
), ex AS (
  SELECT a1.cid, unnest(CAST(e.embedding AS DOUBLE[])) AS v,
         unnest(range(0, len(e.embedding))) AS d
  FROM a1 JOIN embeddings e USING (vec_id)
), m AS (
  SELECT cid, d, round(avg(v), 6) AS cv FROM ex GROUP BY 1, 2
), c2 AS (
  SELECT cid, list(cv ORDER BY d) AS cv FROM m GROUP BY 1
), s2 AS (
  SELECT e.vec_id, c2.cid,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c2.cv), 5) AS cos
  FROM embeddings e CROSS JOIN c2
)
SELECT vec_id, cid AS centroid_id, cos AS cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
  FROM s2
) WHERE rn = 1
"""


def sql_bigram_counts(top_k: int = 30) -> str:
    """Twin of documents.q_bigram_counts: adjacent raw-split tokens, both
    sides non-empty, global top-k with (n desc, bigram asc) tie-break."""
    return rf"""
WITH t AS (
  SELECT string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents
  WHERE text IS NOT NULL
), i AS (
  SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM t
)
SELECT ts[i] || ' ' || ts[i + 1] AS bigram, count(*) AS n
FROM i WHERE ts[i] <> '' AND ts[i + 1] <> ''
GROUP BY 1 ORDER BY n DESC, bigram LIMIT {top_k}
"""


def sql_len_zscores() -> str:
    """Twin of documents.q_len_zscores: identical double expression from the
    same int64 moments — no STDDEV builtin (its stable one-pass algorithm
    differs from the two-pass moments in ulps)."""
    ln = "length(coalesce(text, ''))"
    return f"""
WITH m AS (
  SELECT source, count(*) AS n,
         CAST(sum({ln}) AS BIGINT) AS s1,
         CAST(sum(CAST({ln} AS BIGINT) * {ln}) AS BIGINT) AS s2
  FROM documents GROUP BY 1
)
SELECT d.doc_id, d.source,
       round((CAST(length(coalesce(d.text, '')) AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
             / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n), 6) AS z
FROM documents d JOIN m USING (source)
"""


def sql_label_text_stats() -> str:
    """Twin of documents.q_label_text_stats: the doc↔embedding equi-join
    rollup (label stays INTEGER to match the engine's int32)."""
    return """
SELECT e.label, count(*) AS n_docs,
       CAST(sum(length(coalesce(d.text, ''))) AS BIGINT) AS sum_len
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY 1
"""


def sql_conversation_texts(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Twin of validate.q_conversation_texts: ordered string_agg (NULL turns
    skipped; all-null conversations yield NULL)."""
    return (
        TRANSCRIPTS_CTE
        + """
SELECT conv_id,
       string_agg(text, ' ' ORDER BY turn_idx, ts) AS full_text
FROM transcripts GROUP BY conv_id
"""
    )


def sql_longest_docs_by_source(k: int = 3) -> str:
    """Twin of documents.q_longest_docs_by_source: row_number top-k per
    source, (length desc, doc_id) order."""
    return f"""
SELECT source, doc_id, text_len, rn FROM (
  SELECT source, doc_id,
         CAST(length(coalesce(text, '')) AS BIGINT) AS text_len,
         row_number() OVER (
           PARTITION BY source
           ORDER BY length(coalesce(text, '')) DESC, doc_id
         ) AS rn
  FROM documents
) WHERE rn <= {k}
"""


def sql_len_percentile_rank() -> str:
    """Twin of documents.q_len_percentile_rank (min-rank ties, (r−1)/(n−1))."""
    return """
SELECT doc_id, source,
       percent_rank() OVER (
         PARTITION BY source ORDER BY length(coalesce(text, ''))
       ) AS pct_rank
FROM documents
"""


def sql_source_lang_rollup(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Twin of documents.q_source_lang_rollup: GROUPING SETS over the same
    langid expression the engine's batch pass evaluates."""
    expr = ts.sql_detect_language_expr(
        "text", dict(cfg.lang_keyword_banks), cfg.lang_priority
    )
    return f"""
WITH base AS (
  SELECT source, {expr} AS detected_lang,
         length(coalesce(text, '')) AS len
  FROM documents
)
SELECT source, detected_lang, count(*) AS n_docs,
       CAST(sum(len) AS BIGINT) AS sum_len
FROM base
GROUP BY GROUPING SETS ((source, detected_lang), (source), (detected_lang), ())
"""


def sql_pmi_bigrams(top_k: int = 30, min_n: int = 5) -> str:
    """Twin of documents.q_pmi_bigrams: PMI over the bigram table's own
    marginals, ratio evaluated with the engine's association
    (CAST(n AS DOUBLE)·N) / (CAST(ca AS DOUBLE)·cb) so the doubles are
    bit-equal before ln+round."""
    return rf"""
WITH t AS (
  SELECT string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents
  WHERE text IS NOT NULL
), i AS (
  SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM t
), bc AS (
  SELECT ts[i] AS a, ts[i + 1] AS b, count(*) AS n
  FROM i WHERE ts[i] <> '' AND ts[i + 1] <> ''
  GROUP BY 1, 2
), la AS (SELECT a, CAST(sum(n) AS BIGINT) AS ca FROM bc GROUP BY a),
   rb AS (SELECT b, CAST(sum(n) AS BIGINT) AS cb FROM bc GROUP BY b),
   tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM bc)
SELECT a || ' ' || b AS bigram, n,
       round(ln(CAST(n AS DOUBLE) * nn / (CAST(ca AS DOUBLE) * cb)), 6) AS pmi
FROM bc JOIN la USING (a) JOIN rb USING (b), tot
WHERE n >= {min_n}
ORDER BY pmi DESC, bigram LIMIT {top_k}
"""


def sql_embeddings_planted_cte(
    k: int, alpha: float, offset: int, with_label: bool = False
) -> str:
    """CTE ``emb(vec_id, v DOUBLE[])`` = corpus + the K planted near-dup
    twins — float64 elementwise twin of ``documents._embs_planted``:
    cast-to-double FIRST, then ``v[j] + alpha·v[(j mod d)+1]`` (the 1-based
    rotate matching numpy ``roll(v, -1)``). ``with_label`` carries the
    cluster label (twins inherit their source's label)."""
    lab = "label, " if with_label else ""
    return f"""
WITH _e AS (
  SELECT vec_id, {lab}CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), emb AS (
  SELECT vec_id, {lab}v FROM _e
  UNION ALL
  SELECT vec_id + {offset}, {lab}
         list_transform(generate_series(1, len(v)),
                        j -> v[j] + CAST({alpha} AS DOUBLE) * v[(j % len(v)) + 1])
  FROM _e WHERE vec_id < {k}
)
"""


def sql_cosine_near_dup(
    threshold: float = 0.8,
    plant: tuple[int, float, int] | None = None,
) -> str:
    from .documents import (
        PLANT_NEAR_DUP_ALPHA,
        PLANT_NEAR_DUP_K,
        PLANT_NEAR_DUP_OFFSET,
    )

    k, alpha, offset = plant or (
        PLANT_NEAR_DUP_K, PLANT_NEAR_DUP_ALPHA, PLANT_NEAR_DUP_OFFSET
    )
    return (
        sql_embeddings_planted_cte(k, alpha, offset)
        + f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round(list_cosine_similarity(a.v, b.v), 5) AS cosine
FROM emb a JOIN emb b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {threshold}
"""
    )


def sql_semantic_dedup(threshold: float = 0.8) -> str:
    """Exact twin of ``documents.q_semantic_dedup``: within each label,
    every row with a lower-id cosine-≥-τ neighbor is dropped (DISTINCT
    keeps one row per dropped id)."""
    from .documents import (
        PLANT_NEAR_DUP_ALPHA,
        PLANT_NEAR_DUP_K,
        PLANT_NEAR_DUP_OFFSET,
    )

    return (
        sql_embeddings_planted_cte(
            PLANT_NEAR_DUP_K,
            PLANT_NEAR_DUP_ALPHA,
            PLANT_NEAR_DUP_OFFSET,
            with_label=True,
        )
        + f"""
SELECT DISTINCT b.vec_id AS vec_id, b.label AS label
FROM emb a JOIN emb b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {threshold}
"""
    )


def sql_token_stats() -> str:
    return f"""
SELECT doc_id,
       {ts.sql_token_count_expr('text')} AS n_tokens,
       {ts.sql_stopword_count_expr('text')} AS n_stopwords,
       round({ts.sql_alpha_ratio_expr('text')}, 6) AS alpha_ratio,
       {ts.sql_quality_score_expr('text')} AS quality_score
FROM documents
"""


def sql_langid(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    expr = ts.sql_detect_language_expr(
        "text", dict(cfg.lang_keyword_banks), cfg.lang_priority
    )
    return f"SELECT doc_id, {expr} AS detected_lang FROM documents"


def sql_fingerprints() -> str:
    return f"SELECT doc_id, md5({sql_normalize_expr('text')}) AS fingerprint FROM documents"


def sql_top_terms(top_k: int = 50) -> str:
    # token <> '' (not a space-only trim() on the doc) keeps both twins in
    # agreement on arbitrary whitespace: DuckDB trim() strips spaces only,
    # so tab/newline-framed text would otherwise yield empty tokens here
    # that the engine's utf8_trim_whitespace + token filter never produces.
    return f"""
SELECT token, count(*) AS n FROM (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
  FROM documents
) WHERE token <> '' GROUP BY token ORDER BY n DESC, token LIMIT {top_k}
"""


def sql_tfidf_top_terms(k: int = 3) -> str:
    """Twin of q_tfidf_top_terms: score = round(tf · ln(N/df), 6); top-k per
    doc ordered by (rounded score DESC, token ASC) — the rounded value is
    the sort key on both twins so libm-vs-DuckDB ln ulps cannot reorder."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok WHERE token <> '' GROUP BY 1, 2
), df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM tok WHERE token <> '' GROUP BY 1
), s AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         round(tf.tf * ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / df.df), 6)
           AS score
  FROM tf JOIN df USING (token)
)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, score FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rn
  FROM s
) WHERE rn <= {k}
"""


SQL_REPETITION_SCORES = """
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(coalesce(text, ''))), '\\s+') AS l
  FROM documents
  WHERE trim(coalesce(text, '')) <> ''
), pos AS (
  SELECT doc_id, unnest(l) AS t, unnest(range(1, len(l) + 1)) AS i, len(l) AS n
  FROM tok
), cnt AS (
  SELECT doc_id, t, count(*) AS c FROM pos GROUP BY 1, 2
), top AS (
  SELECT doc_id, max(c) AS mc, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1
), bg AS (
  SELECT a.doc_id, count(DISTINCT a.t || ' ' || b.t) AS dn, count(*) AS cb
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  GROUP BY 1
)
SELECT top.doc_id, top.n AS n_tokens,
       round(top.mc / CAST(top.n AS DOUBLE), 6) AS top_token_frac,
       round(CASE WHEN bg.doc_id IS NULL THEN 0.0
                  ELSE 1.0 - bg.dn / CAST(bg.cb AS DOUBLE) END, 6)
         AS dup_bigram_frac
FROM top LEFT JOIN bg ON top.doc_id = bg.doc_id
"""


def sql_doc_filter_verdicts(min_tokens: int, top_frac: float) -> str:
    """Twin of documents.q_doc_filter_verdicts: same CASE priority, same
    raw int/int double ratio for the repetition predicate."""
    return f"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(coalesce(text, ''))), '\\s+') AS l
  FROM documents WHERE trim(coalesce(text, '')) <> ''
), pos AS (
  SELECT doc_id, unnest(l) AS t FROM tok
), cnt AS (
  SELECT doc_id, t, count(*) AS c FROM pos GROUP BY 1, 2
), top AS (
  SELECT doc_id, max(c) AS mc, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1
)
SELECT d.doc_id,
       CASE WHEN top.doc_id IS NULL THEN 'empty'
            WHEN top.n < {min_tokens} THEN 'too_short'
            WHEN top.mc / CAST(top.n AS DOUBLE) > {top_frac} THEN 'repetitive'
            ELSE 'kept' END AS gate
FROM documents d LEFT JOIN top USING (doc_id)
"""


def sql_curate_keep(min_tokens: int, top_frac: float, hex_lt: str) -> str:
    """Twin of documents.q_curate_keep: the gate ∘ keep-first-dedup ∘
    decontaminate composition as CTEs (gate CTE identical to
    sql_doc_filter_verdicts; dedup = row_number min-id per raw-text md5;
    decontamination = NOT IN the hash-sample's content fingerprints)."""
    return f"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(coalesce(text, ''))), '\\s+') AS l
  FROM documents WHERE trim(coalesce(text, '')) <> ''
), pos AS (
  SELECT doc_id, unnest(l) AS t FROM tok
), cnt AS (
  SELECT doc_id, t, count(*) AS c FROM pos GROUP BY 1, 2
), top AS (
  SELECT doc_id, max(c) AS mc, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1
), kept AS (
  SELECT d.doc_id, d.source, d.text
  FROM documents d JOIN top USING (doc_id)
  WHERE top.n >= {min_tokens}
    AND NOT (top.mc / CAST(top.n AS DOUBLE) > {top_frac})
), dedup AS (
  SELECT doc_id, source, text FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
)
SELECT doc_id, source FROM dedup
WHERE md5(text) NOT IN (
  SELECT md5(text) FROM documents
  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{hex_lt}'
    AND text IS NOT NULL
)
"""


SQL_UNIGRAM_LOGPROB = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+')) AS t
  FROM documents
  WHERE trim(coalesce(text, '')) <> ''
), lm AS (
  SELECT t, count(*) AS c FROM tok GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS T FROM tok
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-ln(lm.c / (SELECT T FROM tot))), 6) AS xent
FROM tok JOIN lm USING (t)
GROUP BY doc_id
"""


def sql_inverted_index(k: int = 20) -> str:
    """Twin of q_inverted_index: per token, df (docs containing), tf (total
    occurrences), and the first-k sorted doc_ids comma-joined."""
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+')) AS t
  FROM documents
  WHERE trim(coalesce(text, '')) <> ''
), dt AS (
  SELECT t AS token, doc_id, count(*) AS c FROM tok WHERE t <> '' GROUP BY 1, 2
), r AS (
  SELECT token, doc_id, c,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
  FROM dt
)
SELECT token,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(c) AS BIGINT) AS tf,
       string_agg(CASE WHEN rn <= {k} THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS postings
FROM r GROUP BY token
"""


def sql_token_budget_sample(seed: str, budget: int) -> str:
    """Twin of q_token_budget_sample: docs in (md5(seed||id), id) order
    while the inclusive running token total stays ≤ budget."""
    return rf"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(
              string_split_regex(trim(lower(coalesce(text, ''))), '\s+'),
              x -> x <> '')) AS BIGINT) AS n_tokens,
         md5('{seed}' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY h, doc_id) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, n_tokens, cum_tokens FROM c WHERE cum_tokens <= {budget}
"""


def sql_epoch_shuffle(seed: str) -> str:
    """Twin of q_epoch_shuffle: pos = 0-based rank of md5(seed || doc_id);
    hex-string order = big-endian digest order, tie-break on doc_id."""
    return f"""
SELECT doc_id,
       CAST(row_number() OVER (
              ORDER BY md5('{seed}' || CAST(doc_id AS VARCHAR)), doc_id) - 1
            AS BIGINT) AS pos
FROM documents
"""


def sql_two_tier_scores(cutoff: float) -> str:
    """Twin of stages.two_tier two-tier scoring over documents: cheap =
    coalesced alpha-ratio, expensive = banded quality score, keep best."""
    ar = f"coalesce({ts.sql_alpha_ratio_expr('text')}, 0.0)"
    q = ts.sql_quality_score_expr("text")
    return f"""
SELECT doc_id,
       round(ar, 6) AS cheap_score,
       round(CASE WHEN ar < {cutoff} THEN greatest(ar, q) ELSE ar END, 6)
         AS final_score,
       ar < {cutoff} AS rescored
FROM (SELECT doc_id, {ar} AS ar, {q} AS q FROM documents)
"""


def sql_subtoken_counts(pattern: str) -> str:
    return rf"""
SELECT doc_id,
       CAST(coalesce(len(regexp_extract_all(text, '{pattern}')), 0) AS BIGINT)
         AS n_subtokens
FROM documents
"""


def sql_decontaminate(hex_lt: str) -> str:
    """Anti-join twin: corpus rows whose content md5 is absent from the
    hash-sample blocklist (NOT IN null semantics drop null-text rows)."""
    return f"""
SELECT d.doc_id, d.text FROM documents d
WHERE md5(d.text) NOT IN (
  SELECT md5(text) FROM documents
  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{hex_lt}'
    AND text IS NOT NULL
)
"""


def sql_sample_documents(hex_lt: str) -> str:
    return f"""
SELECT doc_id, text FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{hex_lt}'
"""


def sql_dup_rate_by_source(threshold: float = 0.25) -> str:
    """Twin of documents.q_dup_rate_by_source: per-source near-dup
    observability over the same within-source exact-Jaccard pair set as
    sql_ngram_jaccard (same shingle CTE, k=3)."""
    jac = (
        "CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / "
        "len(list_distinct(list_concat(a.grams, b.grams)))"
    )
    return rf"""
WITH tok AS (
  SELECT doc_id, source,
         string_split_regex(trim(lower(coalesce(text,''))), '\s+') AS ts
  FROM documents
), sh AS (
  SELECT doc_id, source,
         CASE WHEN len(ts) >= 3 THEN
           list_distinct(list_transform(generate_series(1, len(ts) - 2),
             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
         ELSE [array_to_string(ts, ' ')] END AS grams
  FROM tok
), p AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.source AS source
  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
  WHERE {jac} >= {threshold}
), m AS (
  SELECT DISTINCT doc_id, source FROM (
    SELECT a_id AS doc_id, source FROM p
    UNION ALL SELECT b_id AS doc_id, source FROM p
  )
), d AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1
)
SELECT d.source,
       d.n_docs,
       CAST(coalesce(md.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
       CAST(coalesce(pc.n_pairs, 0) AS BIGINT) AS n_pairs,
       round(CAST(coalesce(md.n_dup_docs, 0) AS DOUBLE) / d.n_docs, 6)
         AS dup_rate
FROM d
LEFT JOIN (SELECT source, count(*) AS n_dup_docs FROM m GROUP BY 1) md
  USING (source)
LEFT JOIN (SELECT source, count(*) AS n_pairs FROM p GROUP BY 1) pc
  USING (source)
"""


def sql_weighted_sample(seed: str, k: int) -> str:
    """Twin of documents.q_weighted_sample: Efraimidis–Spirakis keys
    ``-ln(u)/w`` with u = the seeded-md5 32-bit hex prefix of the doc id
    mapped to (0,1) — DuckDB parses the identical hex prefix via
    ``CAST('0x…' AS UBIGINT)`` and evaluates the identical float64
    expression, so the selected k-set matches bit-for-bit."""
    from ..functions import textstats as ts

    return f"""
WITH w AS (
  SELECT doc_id, source, {ts.sql_token_count_expr('text')} AS n_tokens
  FROM documents
), keyed AS (
  SELECT doc_id, source, n_tokens,
         -ln((CAST(concat('0x', substring(
                md5('{seed}' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
              + 0.5) / 4294967296.0) / n_tokens AS key
  FROM w WHERE n_tokens > 0
)
SELECT doc_id, source, n_tokens FROM keyed ORDER BY key LIMIT {k}
"""


def sql_source_cap(seed: str, k: int) -> str:
    """Twin of documents.q_source_cap: row_number over (source, seeded-md5
    32-bit hex prefix of doc_id, doc_id) ≤ k — DuckDB parses the identical
    8 hex chars as UBIGINT, so the per-source kept k-set matches the
    engine's (digest_prefix, doc_id) order bit-for-bit."""
    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST(concat('0x', substring(
                      md5('{seed}' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT),
                    doc_id
         ) AS rn
  FROM documents
) WHERE rn <= {k}
"""


def sql_ngram_decontaminate(hex_lt: str, k: int = 5) -> str:
    """Twin of documents.q_ngram_decontaminate: distinct contaminated token
    k-grams per unsampled doc, joining gram STRINGS (the engine joins 64-bit
    gram hashes — equal counts modulo ~2^-64 collisions, the
    sql_ngram_jaccard argument). Tokenization matches token_hashes:
    lowercase, trim, split \\s+; rows with < k tokens contribute nothing."""
    return f"""
WITH tok AS (
  SELECT doc_id,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{hex_lt}' AS blk,
         list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
), idx AS (
  SELECT doc_id, blk, ts, unnest(generate_series(1, len(ts) - {k - 1})) AS i
  FROM tok WHERE len(ts) >= {k}
), grams AS (
  SELECT DISTINCT doc_id, blk, array_to_string(list_slice(ts, i, i + {k - 1}), ' ') AS g
  FROM idx
), blkg AS (SELECT DISTINCT g FROM grams WHERE blk)
SELECT doc_id, count(*) AS n_dirty
FROM grams JOIN blkg USING (g) WHERE NOT blk
GROUP BY doc_id
"""


def sql_top_terms_by_source(k: int = 5) -> str:
    # token <> '' instead of a space-only trim() guard — see sql_top_terms
    return r"""
WITH c AS (
  SELECT source, token, count(*) AS n FROM (
    SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
    FROM documents
  ) WHERE token <> '' GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY n DESC, token) AS rn
  FROM c
)
SELECT source, token, n FROM r WHERE rn <= %d
""" % k


def sql_substring_dup_docs(k: int = 16, min_shared: int = 32) -> str:
    """Twin of documents.q_substring_dup_docs: distinct char k-grams per doc,
    grams seen in ≥2 docs, per-doc shared-gram count ≥ min_shared."""
    return f"""
WITH g AS (
  SELECT DISTINCT doc_id, substring(text, i, {k}) AS gram
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - {k - 1})) AS i
        FROM documents)
), d AS (
  SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2
)
SELECT doc_id, count(*) AS n_shared
FROM g JOIN d USING (gram)
GROUP BY 1 HAVING count(*) >= {min_shared}
"""


def sql_domain_stats() -> str:
    """Twin of documents.q_domain_stats: identical in-query URL plants, the
    same URL pattern with the scheme captured out, per-domain doc/url counts."""
    return r"""
WITH p AS (
  SELECT doc_id, coalesce(text, '')
    || CASE WHEN doc_id % 5 = 0
         THEN ' see https://site' || CAST(doc_id % 20 AS VARCHAR)
              || '.example.org/p/' || CAST(doc_id AS VARCHAR) || ' ok'
         ELSE '' END
    || CASE WHEN doc_id % 15 = 0
         THEN ' mirror http://cdn' || CAST(doc_id % 7 AS VARCHAR)
              || '.example.net/x down'
         ELSE '' END AS t
  FROM documents
), u AS (
  SELECT doc_id,
         unnest(regexp_extract_all(t, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain
  FROM p
)
SELECT domain, count(DISTINCT doc_id) AS n_docs, count(*) AS n_urls
FROM u GROUP BY 1
"""


SQL_DISTINCT_TERMS = r"""
SELECT source, count(DISTINCT token) AS n_tokens FROM (
  SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents
) WHERE token <> '' GROUP BY 1
"""


def sql_dup_components(threshold: float = 0.25) -> str:
    """Twin of q_dup_components: recursive min-label propagation over the
    same n-gram Jaccard edge list (component id = min reachable node)."""
    inner = sql_ngram_jaccard(threshold)
    return f"""
WITH RECURSIVE _pairs AS (
  SELECT a_id, b_id FROM ({inner})
), _e AS (
  SELECT a_id AS a, b_id AS b FROM _pairs
  UNION ALL
  SELECT b_id, a_id FROM _pairs
), _nodes AS (SELECT DISTINCT a AS v FROM _e),
walk(v, l) AS (
  SELECT v, v FROM _nodes
  UNION
  SELECT e.b, w.l FROM walk w JOIN _e e ON e.a = w.v
)
SELECT v AS doc_id, CAST(min(l) AS BIGINT) AS component_id FROM walk GROUP BY v
"""


def sql_dup_cluster_sizes(threshold: float = 0.25) -> str:
    """Twin of q_dup_cluster_sizes: size histogram over the same recursive
    component table."""
    comp = sql_dup_components(threshold)
    return f"""
SELECT sz AS cluster_size, count(*) AS n_clusters FROM (
  SELECT component_id, count(*) AS sz FROM ({comp}) GROUP BY 1
) GROUP BY 1
"""


def sql_dedup_keep(threshold: float = 0.25) -> str:
    """Twin of q_dedup_keep: corpus minus non-canonical cluster members."""
    comp = sql_dup_components(threshold)
    return f"""
SELECT d.doc_id, d.text FROM documents d
WHERE d.doc_id NOT IN (
  SELECT doc_id FROM ({comp}) WHERE doc_id <> component_id
)
"""


SQL_LABEL_CENTROIDS = """
WITH e AS (
  SELECT label,
         unnest(embedding) AS v,
         unnest(range(0, len(embedding))) AS d
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(d AS BIGINT) AS dim_idx,
       round(avg(CAST(v AS DOUBLE)), 6) AS centroid
FROM e GROUP BY 1, 2
"""


def sql_quality_gate(q: float = 0.75) -> str:
    """Twin of q_quality_gate: rounded banded score ≥ its quantile_disc."""
    expr = ts.sql_quality_score_expr("text")
    return f"""
WITH s AS (
  SELECT doc_id, round({expr}, 6) AS score FROM documents
), thr AS (
  SELECT quantile_disc(score, {q}) AS t FROM s
)
SELECT doc_id, score FROM s WHERE score >= (SELECT t FROM thr)
"""


def sql_mix_manifest(
    q: float = 0.75, threshold: float = 0.25, seed: str = "split1:"
) -> str:
    """Twin of q_mix_manifest: quality gate ∘ leakage-safe split ∘
    (source, split) rollup, composed from the same CTEs as the parts."""
    expr = ts.sql_quality_score_expr("text")
    comp = sql_dup_components(threshold)
    return rf"""
WITH s AS (
  SELECT doc_id, source, round({expr}, 6) AS score,
         CAST(len(list_filter(
              string_split_regex(trim(lower(coalesce(text, ''))), '\s+'),
              x -> x <> '')) AS BIGINT) AS nt
  FROM documents
), thr AS (
  SELECT quantile_disc(score, {q}) AS t FROM s
), comp AS ({comp}),
k AS (
  SELECT s.source, s.nt, coalesce(c.component_id, s.doc_id) AS rep
  FROM s LEFT JOIN comp c ON s.doc_id = c.doc_id
  WHERE s.score >= (SELECT t FROM thr)
)
SELECT source,
       CASE WHEN substring(md5('{seed}' || CAST(rep AS VARCHAR)), 1, 1)
                 IN ('0', '1') THEN 'val' ELSE 'train' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens
FROM k GROUP BY 1, 2
"""


def sql_split_leakage_safe(threshold: float = 0.25, seed: str = "split1:") -> str:
    """Twin of q_split_leakage_safe: rep = component min-id (self for
    singletons); val iff the first hex char of md5(seed || rep) is 0/1."""
    comp = sql_dup_components(threshold)
    return f"""
WITH comp AS ({comp})
SELECT d.doc_id,
       CAST(coalesce(c.component_id, d.doc_id) AS BIGINT) AS rep,
       CASE WHEN substring(md5('{seed}'
                 || CAST(coalesce(c.component_id, d.doc_id) AS VARCHAR)), 1, 1)
                 IN ('0', '1')
            THEN 'val' ELSE 'train' END AS split
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
"""


def sql_pack_chunks(chunk: int = 32, capacity: int = 512) -> str:
    """Twin of q_pack_chunks: window cumsum over doc_id order. Token count
    = non-empty tokens after a \\s+ split (robust to any whitespace framing,
    equal to the engine's trimmed-split count)."""
    return rf"""
WITH _tok AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                              x -> x <> '')) AS BIGINT) AS t
  FROM documents
), _pre AS (
  SELECT doc_id, t,
         CAST(coalesce(sum(t) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p
  FROM _tok
), _ch AS (
  SELECT doc_id, p,
         unnest(generate_series(0, CAST(ceil(t / {chunk}.0) AS BIGINT) - 1)) AS chunk_idx
  FROM _pre WHERE t > 0
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST((p + {chunk} * chunk_idx) // {capacity} AS BIGINT) AS bin_id
FROM _ch
"""


def sql_stratified_sample(k: int = 20) -> str:
    """Twin of q_stratified_sample: per-source k smallest md5(doc_id)."""
    return f"""
WITH _r AS (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT source, doc_id FROM _r WHERE rn <= {k}
"""


def sql_quantize_embeddings(k_rows: int = 20) -> str:
    """Twin of q_quantize_embeddings: identical float64 chain (cast → scale
    from max|v| → multiply → half-away round), exploded per dimension."""
    return f"""
WITH _e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < {k_rows}
), _s AS (
  SELECT vec_id, v,
         127.0 / greatest(
           list_aggregate(list_transform(v, x -> abs(x)), 'max'), 1e-30) AS scale
  FROM _e
), _j AS (
  SELECT vec_id, v, scale, unnest(generate_series(1, len(v))) AS j FROM _s
)
SELECT vec_id, CAST(j - 1 AS INTEGER) AS dim_idx,
       CAST(round(v[j] * scale) AS INTEGER) AS qval,
       round(scale, 6) AS scale
FROM _j
"""


def sql_token_entropy() -> str:
    """Twin of q_token_entropy: Shannon entropy of each doc's token
    multiset (docs with no tokens produce no row)."""
    return r"""
WITH _tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents
), _tf AS (
  SELECT doc_id, token, count(*) AS c FROM _tok WHERE token <> '' GROUP BY 1, 2
), _n AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens FROM _tf GROUP BY 1
)
SELECT n.doc_id, n.n_tokens,
       round(-sum((tf.c / CAST(n.n_tokens AS DOUBLE))
                  * ln(tf.c / CAST(n.n_tokens AS DOUBLE))), 6) AS entropy
FROM _tf tf JOIN _n n USING (doc_id)
GROUP BY n.doc_id, n.n_tokens
"""


def sql_mm_decode() -> str:
    return """
SELECT doc_id,
       strlen(text) AS n_bytes,
       CAST(trunc((strlen(text) % 640 + 1) *
            least(1.0, 400.0 / (strlen(text) % 640 + 1),
                       400.0 / (strlen(text) * 7 % 480 + 1))) AS BIGINT) AS width,
       CAST(trunc((strlen(text) * 7 % 480 + 1) *
            least(1.0, 400.0 / (strlen(text) % 640 + 1),
                       400.0 / (strlen(text) * 7 % 480 + 1))) AS BIGINT) AS height
FROM documents
"""


def sql_text_len_quantiles(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    from .validate import TEXT_LEN_QUANTILES

    parts = [
        f"""SELECT CAST({q} AS DOUBLE) AS quantile,
       CAST(quantile_disc(length(text), {q}) AS BIGINT) AS text_len
  FROM transcripts"""
        for q in TEXT_LEN_QUANTILES
    ]
    return TRANSCRIPTS_CTE + "\nUNION ALL\n".join(parts)


def sql_ts_quantiles(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    from .validate import TS_QUANTILES

    parts = [
        f"""SELECT CAST({q} AS DOUBLE) AS quantile,
       CAST(quantile_disc(epoch_us(ts), {q}) AS BIGINT) AS ts_epoch_us
  FROM transcripts"""
        for q in TS_QUANTILES
    ]
    return TRANSCRIPTS_CTE + "\nUNION ALL\n".join(parts)


def sql_rolling_text_len(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Twin of validate.q_rolling_text_len: per-conversation trailing RANGE
    window sum of text lengths (peer-inclusive, tie-deterministic)."""
    from .validate import ROLLING_RANGE

    return (
        TRANSCRIPTS_CTE
        + f"""
SELECT conv_id, turn_idx,
       CAST(sum(coalesce(length(text), 0)) OVER (
         PARTITION BY conv_id ORDER BY turn_idx
         RANGE BETWEEN {ROLLING_RANGE} PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS win_text_len
FROM transcripts
"""
    )


def sql_len_outliers(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Twin of validate.q_len_outliers: Tukey fences from exact
    quantile_disc quartiles, FENCE_MULT·IQR beyond q1/q3."""
    from .validate import FENCE_MULT

    return (
        TRANSCRIPTS_CTE
        + f""",
_q AS (
  SELECT quantile_disc(length(text), 0.25) AS q1,
         quantile_disc(length(text), 0.75) AS q3
  FROM transcripts
)
SELECT conv_id, turn_idx,
       CAST(length(text) AS BIGINT) AS text_len,
       CASE WHEN length(text) < q1 - {FENCE_MULT} * (q3 - q1)
            THEN 'low' ELSE 'high' END AS side
FROM transcripts, _q
WHERE length(text) < q1 - {FENCE_MULT} * (q3 - q1)
   OR length(text) > q3 + {FENCE_MULT} * (q3 - q1)
"""
    )


def sql_ngram_jaccard(threshold: float = 0.5, shingle_k: int = 3) -> str:
    """Exact twin of stages.dedup.ngram_jaccard_pairs.

    Same shingle semantics as functions.hashing.shingle_hashes: lowercased
    whitespace tokens; rows with ≥k tokens contribute their distinct
    consecutive k-grams, shorter rows their whole token sequence as one
    element. Tokens contain no whitespace, so a space-joined gram string is
    an injective encoding of the engine's hashed tuple (equal Jaccard modulo
    ~2^-64 hash collisions).
    """
    assert shingle_k == 3, "SQL twin is written for k=3"
    jac = (
        "CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / "
        "len(list_distinct(list_concat(a.grams, b.grams)))"
    )
    return rf"""
WITH tok AS (
  SELECT doc_id, source,
         string_split_regex(trim(lower(coalesce(text,''))), '\s+') AS ts
  FROM documents
), sh AS (
  SELECT doc_id, source,
         CASE WHEN len(ts) >= 3 THEN
           list_distinct(list_transform(generate_series(1, len(ts) - 2),
             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
         ELSE [array_to_string(ts, ' ')] END AS grams
  FROM tok
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id, round({jac}, 6) AS jaccard
FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE {jac} >= {threshold}
"""


def sql_mm_frame_sample(frame_len: int = 64, stride: int = 48, max_frames: int = 8) -> str:
    """Twin of the frame-sampling flat-map: up to max_frames stride-offset
    code-point windows per document."""
    return f"""
WITH f AS (
  SELECT doc_id, text,
         unnest(generate_series(0,
           least({max_frames - 1},
                 CAST(floor((length(text) - {frame_len}) / {stride}) AS INTEGER))
         )) AS frame_idx
  FROM documents
  WHERE length(text) >= {frame_len}
)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       substring(text, frame_idx * {stride} + 1, {frame_len}) AS frame
FROM f
"""


def sql_ts_regressions(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    return (
        TRANSCRIPTS_CTE
        + """
SELECT conv_id, count(*) AS n_regressions FROM (
  SELECT conv_id, ts,
         lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts) AS prev
  FROM transcripts
) WHERE prev IS NOT NULL AND ts < prev
GROUP BY conv_id
"""
    )


def sql_conversation_verdicts(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    bad = sql_any_violation_predicate(cfg)
    return (
        TRANSCRIPTS_CTE
        + f"""
SELECT conv_id, count(*) AS n_rows,
       CAST(sum(CASE WHEN {bad} THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_rows,
       sum(CASE WHEN {bad} THEN 1 ELSE 0 END) = 0 AS passed
FROM transcripts GROUP BY conv_id
"""
    )


def sql_threshold_sweep(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    from .validate import SWEEP_THRESHOLDS

    ratio = sql_valid_char_ratio_expr("text")
    parts = [
        f"""SELECT CAST({thr} AS DOUBLE) AS threshold,
       CAST(sum(CASE WHEN coalesce({ratio} < {thr}, FALSE) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_below,
       count(*) AS n_rows
  FROM transcripts"""
        for thr in SWEEP_THRESHOLDS
    ]
    return TRANSCRIPTS_CTE + "\nUNION ALL\n".join(parts)


def sql_chunk_documents(chunk_tokens: int = 32) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
  FROM documents WHERE trim(coalesce(text, '')) <> ''
), idx AS (
  SELECT doc_id, ts, unnest(generate_series(1, len(ts), {chunk_tokens})) AS start
  FROM tok
)
SELECT doc_id, CAST((start - 1) / {chunk_tokens} AS INTEGER) AS chunk_idx,
       array_to_string(list_slice(ts, start, start + {chunk_tokens} - 1), ' ') AS chunk
FROM idx
"""


def sql_role_sequences(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    return (
        TRANSCRIPTS_CTE
        + """
SELECT conv_id, count(*) AS n_repeats FROM (
  SELECT conv_id, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts) AS prev
  FROM transcripts
) WHERE prev IS NOT NULL AND role = prev
GROUP BY conv_id
"""
    )


def sql_role_transitions(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Twin of validate.q_role_transitions: Markov transition counts over
    consecutive turns per conversation. ``lag`` over (turn_idx, ts) matches
    the engine's mergesort order; tie rows (the planted duplicate keys) are
    byte-identical so the pair multiset is order-invariant. First-turn and
    null-role predecessors both surface as NULL prev and are filtered on
    both sides; a NULL current role is kept as its own group on both sides."""
    return (
        TRANSCRIPTS_CTE
        + """
SELECT prev_role, role, count(*) AS n FROM (
  SELECT role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts) AS prev_role
  FROM transcripts
) WHERE prev_role IS NOT NULL
GROUP BY prev_role, role
"""
    )


def sql_tool_chain_stats() -> str:
    """Twin of validate.q_tool_chain_stats: gaps-and-islands over
    ``role='tool'`` runs per conversation — ``rn − row_number()`` within the
    tool-only subset is constant exactly on maximal consecutive runs.
    ``row_number`` over (turn_idx, ts) matches the engine's mergesort order;
    duplicate-key tie rows are byte-identical so run lengths are
    order-invariant (the sql_role_transitions argument)."""
    return (
        TRANSCRIPTS_CTE
        + """
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_chains,
       CAST(max(chain_len) AS BIGINT) AS max_chain
FROM (
  SELECT conv_id, grp, count(*) AS chain_len
  FROM (
    SELECT conv_id,
           rn - row_number() OVER (PARTITION BY conv_id ORDER BY rn) AS grp
    FROM (
      SELECT conv_id, role,
             row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx, ts) AS rn
      FROM transcripts
    ) WHERE role = 'tool'
  ) GROUP BY conv_id, grp
) GROUP BY conv_id
"""
    )


def sql_len_quantiles_by_source() -> str:
    """Twin of validate.q_len_quantiles_by_source: exact per-source discrete
    quantiles (quantile_disc = sorted element at 1-based ceil(q*n), the same
    rule _exact_quantiles_from_hist implements per group)."""
    from .validate import GROUPED_QUANTILES

    p50, p90 = GROUPED_QUANTILES
    return f"""
SELECT source,
       CAST(quantile_disc(length(text), {p50}) AS BIGINT) AS p50_len,
       CAST(quantile_disc(length(text), {p90}) AS BIGINT) AS p90_len
FROM documents
GROUP BY source
"""


def sql_adjusted_scores(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    ratio = sql_valid_char_ratio_expr("t.text")
    return (
        TRANSCRIPTS_CTE
        + f""",
_share AS (
  SELECT role, CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM transcripts) AS share
  FROM transcripts GROUP BY role
)
SELECT t.conv_id, t.turn_idx,
       round(coalesce({ratio}, 0.0) * 0.7 + coalesce(s.share, 0.0) * 0.3, 6)
         AS adjusted_score
FROM transcripts t LEFT JOIN _share s ON t.role = s.role
"""
    )


def sql_pii_redact() -> str:
    """Exact twin of ``documents.q_pii_redact``: identical RE2 pattern
    strings (DuckDB and Arrow are both RE2-backed), identical deterministic
    plants derived from doc_id, counts over the planted text, redaction
    applied email → phone → IP."""
    from .documents import PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE

    return f"""
WITH planted AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 7 = 0
            THEN ' mail user' || doc_id || '@example.com now' ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' call 415-555-' || (1000 + doc_id % 9000) || ' ok' ELSE '' END
    || CASE WHEN doc_id % 13 = 0
            THEN ' host 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) || ' up'
            ELSE '' END AS t
  FROM documents)
SELECT doc_id,
  CAST(length(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS BIGINT) AS n_email,
  CAST(length(regexp_extract_all(t, '{PII_PHONE_RE}')) AS BIGINT) AS n_phone,
  CAST(length(regexp_extract_all(t, '{PII_IP_RE}')) AS BIGINT) AS n_ip,
  regexp_replace(regexp_replace(regexp_replace(
      t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
         '{PII_PHONE_RE}', '<PHONE>', 'g'),
         '{PII_IP_RE}', '<IP>', 'g') AS redacted
FROM planted
"""


def sql_all_violations(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Full violation-row union (registry row checks + duplicate keys +
    turn gaps) in the shared (conv_id, turn_idx, check_id, detail) format."""
    row_part = "\nUNION ALL\n".join(sql_violation_fragments(cfg))
    return (
        TRANSCRIPTS_CTE
        + f"""
{row_part}
UNION ALL
SELECT conv_id, turn_idx, 'duplicate_key', 'n=' || count(*)
  FROM transcripts GROUP BY conv_id, turn_idx HAVING count(*) > 1
UNION ALL
SELECT conv_id, CAST(-1 AS INTEGER), 'turn_gap',
       'n=' || count(*) || ',distinct=' || count(DISTINCT turn_idx)
        || ',min=' || min(turn_idx) || ',max=' || max(turn_idx)
  FROM transcripts GROUP BY conv_id
  HAVING NOT (min(turn_idx) = 0 AND max(turn_idx) = count(DISTINCT turn_idx) - 1
              AND count(*) = count(DISTINCT turn_idx))
"""
    )


SQL_PLANTED_MULTILINE = """
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'click here to subscribe' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'this paragraph has enough words to pass the gate.' ELSE '' END
    || CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'enable javascript to continue reading this page.' ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN chr(10) || text || ' indeed.' ELSE '' END
    || CASE WHEN doc_id % 19 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet consectetur.' ELSE '' END
    || CASE WHEN doc_id % 23 = 0 THEN chr(10) || 'function() { return 1; }' ELSE '' END AS mt
  FROM documents"""


def sql_c4_line_filter() -> str:
    """Exact twin of ``documents.q_c4_line_filter``: identical planted
    lines, identical keep predicate (word count = spaces+1, terminal-punct
    RE2, javascript substring), list_filter preserves line order exactly as
    the engine's offset-arithmetic reconstruct does."""
    return f"""
WITH m AS ({SQL_PLANTED_MULTILINE}),
f AS (
  SELECT doc_id, mt, string_split(mt, chr(10)) AS ls,
         list_filter(string_split(mt, chr(10)),
                     x -> length(x) - length(replace(x, ' ', '')) + 1 >= 5
                          AND regexp_matches(x, '[.!?"]$')
                          AND NOT contains(x, 'javascript')) AS kept
  FROM m)
SELECT doc_id,
       CAST(len(ls) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       array_to_string(kept, chr(10)) AS clean_text
FROM f
WHERE len(kept) >= 1
  AND NOT contains(mt, 'lorem ipsum')
  AND NOT contains(mt, '{{')
"""


def sql_unicode_normalize() -> str:
    """Exact twin of ``documents.q_unicode_normalize``: identical decomposed
    plants built with chr(769)/chr(771); DuckDB nfc_normalize (utf8proc) vs
    CPython unicodedata NFC agree on the canonical composition; length() and
    utf8_length both count codepoints."""
    return """
WITH m AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 4 = 0 THEN ' cafe' || chr(769) ELSE '' END
    || CASE WHEN doc_id % 6 = 0 THEN ' nin' || chr(771) || 'o' ELSE '' END AS mt
  FROM documents)
SELECT doc_id,
       CAST(length(mt) AS BIGINT) AS len_raw,
       CAST(length(nfc_normalize(mt)) AS BIGINT) AS len_nfc,
       nfc_normalize(mt) AS norm_text
FROM m
"""


def sql_len_token_corr() -> str:
    """Exact twin of ``documents.q_len_token_corr``: integer moments in
    BIGINT, the single float expression written identically (cast the exact
    integer numerator/radicands to DOUBLE, two IEEE sqrts, one divide)."""
    return """
WITH s AS (
  SELECT source, CAST(n_chars AS BIGINT) AS x,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS y
  FROM documents),
a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sx2, CAST(sum(y * y) AS BIGINT) AS sy2
  FROM s GROUP BY source)
SELECT source, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
            * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE))) AS corr_len_tokens
FROM a
"""


def sql_edit_distance_pairs(k: int = 16, prefix_chars: int = 24) -> str:
    """Exact twin of ``documents.q_edit_distance_pairs``: identical planted
    twins (append-only suffix, prefix preserved), identical blocking
    (substr(1,24) prefix + ±k length band), DuckDB levenshtein == the
    engine's vectorized DP (property-tested in tests/test_editdist.py)."""
    return f"""
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || ' near copy.' AS text
  FROM documents WHERE doc_id % 31 = 0),
p AS (
  SELECT doc_id, text, substr(text, 1, {prefix_chars}) AS pre,
         CAST(length(text) AS BIGINT) AS n
  FROM d)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
FROM p a JOIN p b ON a.pre = b.pre AND a.doc_id < b.doc_id
WHERE abs(a.n - b.n) <= {k} AND levenshtein(a.text, b.text) <= {k}
"""


def sql_response_latency(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Exact twin of ``validate.q_response_latency``: lag window ordered by
    (turn_idx, ts, role) — the engine's mergesort key — all-integer µs."""
    return (
        TRANSCRIPTS_CTE
        + """
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_responses,
       CAST(sum(ts_us - prev) AS BIGINT) AS total_latency_us,
       CAST(max(ts_us - prev) AS BIGINT) AS max_latency_us
FROM (
  SELECT conv_id, role, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx, epoch_us(ts), role) AS prev
  FROM transcripts)
WHERE role = 'assistant' AND prev IS NOT NULL
GROUP BY conv_id
"""
    )


def sql_repost_suppression() -> str:
    """Exact twin of ``validate.q_repost_suppression``: lag over the text
    partition (the engine partitions on the md5 fingerprint — same grouping
    absent collisions), identical (ts, conv_id, turn_idx) order, µs ints."""
    return (
        TRANSCRIPTS_CTE
        + """
SELECT conv_id, turn_idx, CAST(ts_us - prev AS BIGINT) AS gap_us
FROM (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (
           PARTITION BY text ORDER BY epoch_us(ts), conv_id, turn_idx) AS prev
  FROM transcripts WHERE text IS NOT NULL AND text <> '')
WHERE prev IS NOT NULL AND ts_us - prev <= 3600000000
"""
    )


def sql_bm25_topk(terms: list[str], k: int = 10) -> str:
    """Exact twin of ``documents.q_bm25_topk``: same tokenization as the
    other token oracles (trim+lower+split, ''-filtered), every literal in
    the one float expression cast to DOUBLE so DuckDB's DECIMAL typing can't
    diverge from numpy float64, round-half-away to 6, row_number ties on
    doc_id ascending."""
    term_values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
    FROM documents) WHERE token <> ''),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(coalesce(sum(dl), 0) AS BIGINT) FROM dl) AS sum_dl),
q(term) AS (VALUES {term_values}),
df AS (SELECT token AS term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM toks JOIN q ON toks.token = q.term GROUP BY token),
tf AS (SELECT token AS term, toks.doc_id, CAST(count(*) AS BIGINT) AS tf
       FROM toks JOIN q ON toks.token = q.term GROUP BY token, toks.doc_id),
scored AS (
  SELECT tf.term, tf.doc_id, tf.tf,
         round(
           ln((CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
              / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
              + CAST(1.0 AS DOUBLE))
           * (CAST(tf.tf AS DOUBLE) * (CAST(1.5 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
           / (CAST(tf.tf AS DOUBLE)
              + CAST(1.5 AS DOUBLE)
                * ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE))
                   + (CAST(0.75 AS DOUBLE) * CAST(dl.dl AS DOUBLE))
                     / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))),
           6) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
SELECT term, doc_id, tf, score FROM (
  SELECT *, row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rk
  FROM scored)
WHERE rk <= {k}
"""


def sql_dup_key_resolution(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Exact twin of ``validate.q_dup_key_resolution``: row_number under the
    identical null-free ordering (µs ints, ''-coalesced strings)."""
    return (
        TRANSCRIPTS_CTE
        + """
SELECT conv_id, turn_idx, role, ts_us, n_candidates FROM (
  SELECT conv_id, turn_idx, coalesce(role, '') AS role, epoch_us(ts) AS ts_us,
         CAST(count(*) OVER (PARTITION BY conv_id, turn_idx) AS BIGINT)
           AS n_candidates,
         row_number() OVER (
           PARTITION BY conv_id, turn_idx
           ORDER BY epoch_us(ts) DESC, length(coalesce(text, '')) DESC,
                    coalesce(role, ''), md5(coalesce(text, ''))) AS rk
  FROM transcripts)
WHERE rk = 1 AND n_candidates > 1
"""
    )


SQL_BIGRAM_LOGPROB = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(lower(coalesce(text, ''))), '\s+') AS ts
  FROM documents WHERE trim(coalesce(text, '')) <> ''
), i AS (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM t)
), hist AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS ch FROM i GROUP BY 1
), big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM i GROUP BY 1, 2
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln(cb / CAST(ch AS DOUBLE))), 6) AS xent
FROM i JOIN big USING (w1, w2) JOIN hist USING (w1)
GROUP BY doc_id
"""


def sql_cluster_balanced_sample(centroid_ids=range(8), k: int = 16) -> str:
    """Twin of ``documents.q_cluster_balanced_sample``: the kmeans-assign
    CTE composed with a per-cluster md5-order quota (the stratified-sample
    pattern with the centroid as stratum)."""
    ids = ", ".join(str(i) for i in centroid_ids)
    return f"""
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id IN ({ids})
), s AS (
  SELECT e.vec_id, c.cid,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv), 5) AS cos
  FROM embeddings e CROSS JOIN c
), r AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
  FROM s
), a AS (
  SELECT CAST(cid AS BIGINT) AS centroid_id, CAST(vec_id AS BIGINT) AS vec_id
  FROM r WHERE rn = 1
), q AS (
  SELECT centroid_id, vec_id,
         row_number() OVER (
           PARTITION BY centroid_id
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn2
  FROM a
)
SELECT centroid_id, vec_id FROM q WHERE rn2 <= {k}
"""


def sql_oov_rate(v: int = 20) -> str:
    """Twin of ``documents.q_oov_rate``: top-V vocabulary with the
    (n desc, token asc) tie-break of the top-terms twin, OOV fraction as
    avg of a 0/1 case — identical to the engine's count/n division."""
    return rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(coalesce(text, ''))), '\s+')) AS t
  FROM documents
  WHERE trim(coalesce(text, '')) <> ''
), v AS (
  SELECT t FROM (
    SELECT t, count(*) AS n FROM tok GROUP BY 1
    ORDER BY n DESC, t LIMIT {v})
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(CASE WHEN t IN (SELECT t FROM v) THEN 0.0 ELSE 1.0 END), 6)
         AS oov_rate
FROM tok GROUP BY doc_id
"""


def sql_line_dedup() -> str:
    """Twin of ``documents.q_line_dedup``: the shared plant fragment,
    list-index explode, row_number keep-first over the raw line string (the
    engine groups on md5 of the line — same grouping absent collisions)."""
    return f"""
WITH m AS ({SQL_PLANTED_MULTILINE}),
l AS (
  SELECT doc_id, ls[i] AS line, CAST(i - 1 AS BIGINT) AS line_idx
  FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i
        FROM (SELECT doc_id, string_split(mt, chr(10)) AS ls FROM m)))
SELECT doc_id, line_idx, line FROM (
  SELECT *, row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) AS rk
  FROM l)
WHERE rk > 1
"""


def sql_keyword_in_context(term: str = "vector", w: int = 24) -> str:
    """Twin of ``documents.q_keyword_in_context``: strpos/substr with the
    same clamped window arithmetic (1-based SQL offsets)."""
    n = len(term)
    return f"""
SELECT doc_id,
       CAST(strpos(text, '{term}') AS BIGINT) AS pos,
       substr(text,
              greatest(strpos(text, '{term}') - {w}, 1),
              (strpos(text, '{term}') + {n} + {w})
                - greatest(strpos(text, '{term}') - {w}, 1)) AS snippet
FROM documents
WHERE strpos(text, '{term}') > 0
"""


def sql_missing_turn_ranges(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Twin of ``validate.q_missing_turn_ranges``: lag over distinct
    (conv_id, turn_idx), holes emitted as inclusive ranges."""
    return (
        TRANSCRIPTS_CTE
        + """
SELECT conv_id,
       CAST(prev + 1 AS BIGINT) AS gap_start,
       CAST(turn_idx - 1 AS BIGINT) AS gap_end
FROM (
  SELECT conv_id, turn_idx,
         lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM (SELECT DISTINCT conv_id, turn_idx FROM transcripts))
WHERE prev IS NOT NULL AND turn_idx - prev > 1
"""
    )


SQL_LEN_GINI = """
WITH s AS (
  SELECT source,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS x
  FROM documents),
r AS (
  SELECT source, x,
         row_number() OVER (PARTITION BY source ORDER BY x) AS rn
  FROM s),
a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(rn * x) AS BIGINT) AS srx
  FROM r GROUP BY source)
SELECT source, n,
       CAST(2 * srx - (n + 1) * sx AS DOUBLE) / CAST(n * sx AS DOUBLE) AS gini
FROM a
"""


def sql_whitespace_anomalies() -> str:
    """Twin of ``documents.q_whitespace_anomalies``: identical plants via
    chr(), identical RE2 classes."""
    from .documents import WS_CTRL_RE, WS_MULTISPACE_RE, WS_TAB_RE

    return f"""
WITH m AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 9 = 0 THEN chr(9) || 'col2' ELSE '' END
    || CASE WHEN doc_id % 10 = 0 THEN '  doubled' ELSE '' END
    || CASE WHEN doc_id % 21 = 0 THEN chr(7) || 'bel' ELSE '' END AS mt
  FROM documents)
SELECT doc_id,
       CAST(length(regexp_extract_all(mt, '{WS_TAB_RE}')) AS BIGINT) AS n_tabs,
       CAST(length(regexp_extract_all(mt, '{WS_MULTISPACE_RE}')) AS BIGINT) AS n_multispace,
       CAST(length(regexp_extract_all(mt, '{WS_CTRL_RE}')) AS BIGINT) AS n_ctrl
FROM m
WHERE length(regexp_extract_all(mt, '{WS_TAB_RE}'))
    + length(regexp_extract_all(mt, '{WS_MULTISPACE_RE}'))
    + length(regexp_extract_all(mt, '{WS_CTRL_RE}')) > 0
"""


def sql_conversation_profile(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Twin of ``validate.q_conversation_profile``: all-integer rollup."""
    return (
        TRANSCRIPTS_CTE
        + """
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN coalesce(role, '') = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
       CAST(sum(CASE WHEN coalesce(role, '') = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant,
       CAST(sum(CASE WHEN coalesce(role, '') = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool,
       CAST(min(epoch_us(ts)) AS BIGINT) AS first_ts_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts_us,
       CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS sum_text_len,
       CAST(max(length(coalesce(text, ''))) AS BIGINT) AS max_text_len
FROM transcripts
GROUP BY conv_id
"""
    )


SQL_SOURCE_MIX_WEIGHTS = """
WITH a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source),
t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS k FROM a)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) AS token_share,
       (CAST(1.0 AS DOUBLE) / CAST(k AS DOUBLE))
         / (CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE)) AS weight
FROM a CROSS JOIN t
"""


SQL_NGRAM_NOVELTY = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(lower(coalesce(text, ''))), '\s+') AS ts
  FROM documents WHERE trim(coalesce(text, '')) <> ''
), g AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS sh
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i
        FROM t WHERE len(ts) >= 3)
), c AS (
  SELECT sh, count(*) AS nd FROM g GROUP BY 1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       round(avg(CASE WHEN nd = 1 THEN 1.0 ELSE 0.0 END), 6) AS novel_frac
FROM g JOIN c USING (sh)
GROUP BY doc_id
"""


def sql_source_js_divergence(v: int = 30) -> str:
    """Twin of ``documents.q_source_js_divergence``: top-V + OOV category
    distributions, identical zero-handling (0·ln → 0), round-6 sums (the
    v_role_drift KL/PSI convention)."""
    return rf"""
WITH tok AS (
  SELECT source,
         unnest(string_split_regex(trim(lower(coalesce(text, ''))), '\s+')) AS t
  FROM documents WHERE trim(coalesce(text, '')) <> ''
), v AS (
  SELECT t FROM (SELECT t, count(*) AS n FROM tok GROUP BY 1
                 ORDER BY n DESC, t LIMIT {v})
), cat AS (
  SELECT source,
         CASE WHEN t IN (SELECT t FROM v) THEN t ELSE '<OOV>' END AS cat
  FROM tok
), c AS (
  SELECT source, cat, CAST(count(*) AS BIGINT) AS n FROM cat GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS tn FROM c GROUP BY 1
), grid AS (
  SELECT s.source, g.cat
  FROM (SELECT DISTINCT source FROM c) s
  CROSS JOIN (SELECT DISTINCT cat FROM c) g
), p AS (
  SELECT grid.source, grid.cat,
         CAST(coalesce(c.n, 0) AS DOUBLE) / tot.tn AS pr
  FROM grid LEFT JOIN c USING (source, cat) JOIN tot ON grid.source = tot.source
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, a.pr AS pa, b.pr AS pb
  FROM p a JOIN p b ON a.cat = b.cat AND a.source < b.source
)
SELECT source_a, source_b,
       round(sum(
           CASE WHEN pa > 0 THEN 0.5 * pa * ln(2 * pa / (pa + pb)) ELSE 0 END
         + CASE WHEN pb > 0 THEN 0.5 * pb * ln(2 * pb / (pa + pb)) ELSE 0 END), 6)
         AS js
FROM pairs GROUP BY 1, 2
"""


SQL_CHAR_ENTROPY = """
WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c
  FROM documents WHERE length(text) > 0
), cc AS (
  SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cn FROM ch GROUP BY 1, 2
), tt AS (
  SELECT doc_id, CAST(sum(cn) AS BIGINT) AS tot FROM cc GROUP BY 1
)
SELECT doc_id, tot AS n_chars,
       round(-sum((CAST(cn AS DOUBLE) / tot) * ln(CAST(cn AS DOUBLE) / tot)), 6)
         AS char_entropy
FROM cc JOIN tt USING (doc_id)
GROUP BY doc_id, tot
"""


SQL_TYPE_TOKEN_RATIO = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(coalesce(text, ''))), '\s+')) AS t
  FROM documents WHERE trim(coalesce(text, '')) <> ''
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT t) AS BIGINT) AS n_types,
       round(CAST(count(DISTINCT t) AS DOUBLE) / count(*), 6) AS ttr
FROM tok GROUP BY doc_id
"""


def sql_bucket_balance(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Twin of ``validate.q_bucket_balance``: first md5 hex digit of the
    conv_id as the 16-way bucket."""
    return (
        TRANSCRIPTS_CTE
        + """
SELECT CAST(CASE substr(md5(conv_id), 1, 1)
        WHEN 'a' THEN 10 WHEN 'b' THEN 11 WHEN 'c' THEN 12
        WHEN 'd' THEN 13 WHEN 'e' THEN 14 WHEN 'f' THEN 15
        ELSE CAST(substr(md5(conv_id), 1, 1) AS INTEGER) END AS BIGINT)
         AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM transcripts
GROUP BY 1
"""
    )


SQL_SNAPSHOT_DIFF = """
WITH v2 AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 17 = 0 THEN ' v2' ELSE '' END AS text
  FROM documents WHERE doc_id % 13 <> 0)
SELECT d.doc_id,
       CASE WHEN v2.doc_id IS NULL THEN 'removed' ELSE 'modified' END AS change
FROM documents d LEFT JOIN v2 USING (doc_id)
WHERE v2.doc_id IS NULL OR md5(d.text) <> md5(v2.text)
"""


def sql_training_examples(
    max_tokens: int = 48, cfg: ValidationConfig = DEFAULT_CONFIG
) -> str:
    """Twin of ``validate.q_training_examples``: string_agg ordered by
    (turn_idx, ts, line), trim-then-regex-split tokens, list-slice
    truncation."""
    return (
        TRANSCRIPTS_CTE
        + rf"""
, lines AS (
  SELECT conv_id, turn_idx, ts,
         coalesce(role, '') || ': ' || text AS line
  FROM transcripts WHERE text IS NOT NULL
), asm AS (
  SELECT conv_id,
         string_agg(line, chr(10) ORDER BY turn_idx, ts, line) AS fulltext
  FROM lines GROUP BY conv_id
), tk AS (
  SELECT conv_id,
         string_split_regex(regexp_replace(regexp_replace(fulltext, '^\s+', ''),
                                           '\s+$', ''), '\s+') AS ts
  FROM asm
)
SELECT conv_id, CAST(len(ts) AS BIGINT) AS n_tokens_full,
       CAST(least(len(ts), {max_tokens}) AS BIGINT) AS n_tokens_kept,
       array_to_string(ts[1:{max_tokens}], ' ') AS example
FROM tk
"""
    )


def sql_conversation_digest(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    """Twin of ``validate.q_conversation_digest``: md5 of the ordered
    assembly with the text itself as the final order tie-break; all-null
    conversations digest ''."""
    return (
        TRANSCRIPTS_CTE
        + """
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
       md5(coalesce(string_agg(text, ' ' ORDER BY turn_idx, ts, text), ''))
         AS digest
FROM transcripts GROUP BY conv_id
"""
    )


SQL_USER_ARRIVAL_RATE = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS span_us,
       round(CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE)
             / (count(*) - 1), 6) AS mean_gap_us
FROM events
GROUP BY user_id
HAVING count(*) >= 2
"""


def sql_curriculum_order(seed: str = "cur1:") -> str:
    """Twin of ``documents.q_curriculum_order``: row_number over
    (score DESC, seeded md5, doc_id), zero-based."""
    expr = ts.sql_quality_score_expr("text")
    return f"""
WITH s AS (SELECT doc_id, round({expr}, 6) AS score FROM documents)
SELECT doc_id, score,
       CAST(row_number() OVER (
         ORDER BY score DESC, md5('{seed}' || doc_id), doc_id) - 1 AS BIGINT)
         AS pos
FROM s
"""


def sql_interleave_sources(seed: str = "il1:") -> str:
    """Twin of ``documents.q_interleave_sources``: per-source seeded-md5
    rank, dense source index, slot = rank·K + idx."""
    return f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('{seed}' || doc_id), doc_id) - 1 AS rk,
         dense_rank() OVER (ORDER BY source) - 1 AS sidx
  FROM documents),
k AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS k FROM documents)
SELECT doc_id, source, CAST(rk * k.k + sidx AS BIGINT) AS slot
FROM r CROSS JOIN k
"""


#: Twin of ``documents.q_interleave_starvation``: per-source round-robin
#: starvation from counts alone — the engine derives the same columns from
#: the emitted slot assignment, so equality also proves rank contiguity.
SQL_INTERLEAVE_STARVATION = """
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
i AS (
  SELECT source, n,
         row_number() OVER (ORDER BY source) - 1 AS src_idx,
         count(*) OVER () AS k,
         max(n) OVER () AS max_n
  FROM c)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       CAST((n - 1) * k + src_idx AS BIGINT) AS max_slot,
       CAST(max_n - n AS BIGINT) AS starved_rounds
FROM i
"""
