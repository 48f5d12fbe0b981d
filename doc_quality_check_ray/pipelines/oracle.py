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
from ..functions.quality import sql_valid_char_ratio_expr
from ..sources.transcripts import TRANSCRIPTS_CTE


def _roles_in(cfg: ValidationConfig) -> str:
    return ", ".join(f"'{r}'" for r in cfg.valid_roles)


def sql_row_violations(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    ratio = sql_valid_char_ratio_expr("text")
    return (
        TRANSCRIPTS_CTE
        + f"""
SELECT conv_id, turn_idx, 'empty_turn' AS check_id, 'text null or blank' AS detail
  FROM transcripts WHERE text IS NULL OR trim(text) = ''
UNION ALL
SELECT conv_id, turn_idx, 'invalid_role', 'role=' || coalesce(role, '<null>')
  FROM transcripts WHERE role IS NULL OR role NOT IN ({_roles_in(cfg)})
UNION ALL
SELECT conv_id, turn_idx, 'tool_role_consistency', 'missing_tool'
  FROM transcripts WHERE coalesce(role, '') = 'tool' AND tool IS NULL
UNION ALL
SELECT conv_id, turn_idx, 'tool_role_consistency', 'unexpected_tool'
  FROM transcripts WHERE coalesce(role, '') <> 'tool' AND tool IS NOT NULL
UNION ALL
SELECT conv_id, turn_idx, 'low_quality_text',
       'valid_char_ratio<{cfg.quality_ratio_threshold}'
  FROM transcripts
 WHERE NOT (text IS NULL OR trim(text) = '')
   AND {ratio} < {cfg.quality_ratio_threshold}
"""
    )


def sql_verdicts(cfg: ValidationConfig = DEFAULT_CONFIG) -> str:
    ratio = sql_valid_char_ratio_expr("text")
    return (
        TRANSCRIPTS_CTE
        + f"""
SELECT conv_id, turn_idx, reason = 'OK' AS valid, reason FROM (
  SELECT conv_id, turn_idx,
    CASE
      WHEN text IS NULL OR trim(text) = '' THEN 'empty_turn'
      WHEN role IS NULL OR role NOT IN ({_roles_in(cfg)}) THEN 'invalid_role'
      WHEN (coalesce(role,'') = 'tool' AND tool IS NULL)
        OR (coalesce(role,'') <> 'tool' AND tool IS NOT NULL) THEN 'tool_role_consistency'
      WHEN {ratio} < {cfg.quality_ratio_threshold} THEN 'low_quality_text'
      ELSE 'OK'
    END AS reason
  FROM transcripts
)
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
       sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS null_text,
       sum(CASE WHEN role IS NULL THEN 1 ELSE 0 END) AS null_role,
       sum(CASE WHEN tool IS NULL THEN 1 ELSE 0 END) AS null_tool,
       sum(CASE WHEN ts   IS NULL THEN 1 ELSE 0 END) AS null_ts,
       min(length(text)) AS min_text_len,
       max(length(text)) AS max_text_len,
       sum(length(text)) AS sum_text_len,
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


def _sql_all_violations_body(cfg: ValidationConfig) -> str:
    """The three violation sources as one UNION (shared by partition rollup)."""
    ratio = sql_valid_char_ratio_expr("text")
    return f"""
  SELECT conv_id, turn_idx FROM transcripts WHERE text IS NULL OR trim(text) = ''
  UNION ALL
  SELECT conv_id, turn_idx FROM transcripts
    WHERE role IS NULL OR role NOT IN ({_roles_in(cfg)})
  UNION ALL
  SELECT conv_id, turn_idx FROM transcripts
    WHERE coalesce(role,'') = 'tool' AND tool IS NULL
  UNION ALL
  SELECT conv_id, turn_idx FROM transcripts
    WHERE coalesce(role,'') <> 'tool' AND tool IS NOT NULL
  UNION ALL
  SELECT conv_id, turn_idx FROM transcripts
    WHERE NOT (text IS NULL OR trim(text) = '')
      AND {ratio} < {cfg.quality_ratio_threshold}
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
