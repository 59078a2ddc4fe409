"""Round-10 registry extensions — each a (query, DuckDB-oracle) pair
like plans/extensions.py. Headline: exact substring-level dedup (Lee et
al. 2022), the one canonical LLM-dedup family the registry's
paragraph/winnow/minhash entries only approximated.

Determinism rules are the repo-wide ones (plans/catalog.py header):
exact integer/ppm arithmetic on every compare path, portable hashes,
bounded outputs, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdcm_etl_spark.plans.extensions import _docs, _t

EXTENSION_I_CATALOG: dict[str, tuple] = {}

__all__ = ["EXTENSION_I_CATALOG"]

_ = (F, _t)  # shared helpers for entries added through the round


def x_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-substring spans at k=16 tokens over the document
    corpus (operators/dedup.py::substring_dedup) — suffix-array
    semantics via sliding-window digests + first-occurrence +
    gaps-and-islands run merging; only (id, pos, digest) ever crosses a
    shuffle."""
    from pdcm_etl_spark.operators.dedup import substring_dedup

    return substring_dedup(_docs(spark, sf_dir), k=16)


SQL_DEDUP_SUBSTRING = """
WITH ws AS (
  SELECT doc_id AS id, string_split(lower(text), ' ') AS w FROM documents
), wins AS (
  SELECT id, i AS pos,
         array_to_string(list_slice(w, i + 1, i + 16), ' ') AS win
  FROM (SELECT id, w, unnest(range(len(w) - 16 + 1)) AS i
        FROM ws WHERE len(w) >= 16)
), dup AS (
  SELECT id, pos FROM (
    SELECT id, pos,
           row_number() OVER (PARTITION BY win ORDER BY id, pos) AS rn
    FROM wins)
  WHERE rn > 1
), isl AS (
  SELECT id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY id ORDER BY pos) < 16
              THEN 0 ELSE 1 END AS brk
  FROM dup
), grp AS (
  SELECT id, pos,
         SUM(brk) OVER (PARTITION BY id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM isl
)
SELECT id AS doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + 15 AS BIGINT) AS span_end,
       CAST(MAX(pos) + 15 - MIN(pos) + 1 AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM grp GROUP BY id, island
"""

EXTENSION_I_CATALOG["dedup_substring"] = (
    x_dedup_substring, SQL_DEDUP_SUBSTRING)


def x_dedup_substring_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicated-token share — the Lee et al. headline
    metric (operators/dedup.py::substring_dup_stats): substring spans
    rolled up per document, joined back (shuffle-hash both ways), and
    aggregated to the feed vocabulary."""
    from pdcm_etl_spark.operators.dedup import substring_dup_stats

    return substring_dup_stats(_docs(spark, sf_dir), k=16)


SQL_DEDUP_SUBSTRING_STATS = f"""
WITH spans AS ({SQL_DEDUP_SUBSTRING}),
per_doc AS (
  SELECT doc_id, SUM(span_tokens) AS dup FROM spans GROUP BY doc_id
), docs AS (
  SELECT doc_id, source,
         len(string_split(lower(text), ' ')) AS tok
  FROM documents
), j AS (
  SELECT d.source, d.tok, COALESCE(p.dup, 0) AS dup
  FROM docs d LEFT JOIN per_doc p USING (doc_id)
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS total_tokens,
       CAST(SUM(dup) AS BIGINT) AS dup_tokens,
       -- HUGEINT discipline: SUM(dup)*1e6 passes int64 at corpus scale
       CAST(CASE WHEN SUM(tok) = 0 THEN 0
            ELSE CAST(SUM(dup) AS HUGEINT) * 1000000 // SUM(tok)
            END AS BIGINT) AS dup_ppm
FROM j GROUP BY source
"""

EXTENSION_I_CATALOG["dedup_substring_stats"] = (
    x_dedup_substring_stats, SQL_DEDUP_SUBSTRING_STATS)


def x_session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-count-vs-gap tuning curve over the event stream
    (operators/temporal.py::session_gap_sensitivity): five candidate
    thresholds from one lag pass — the empirical input to
    sessionize's gap_seconds and the streaming session timeout."""
    from pdcm_etl_spark.operators.temporal import session_gap_sensitivity
    from pdcm_etl_spark.plans.catalog import load_events

    return session_gap_sensitivity(
        load_events(spark, sf_dir),
        gaps_seconds=[300, 900, 1800, 3600, 7200],
    )


SQL_SESSION_GAP_SENSITIVITY = """
WITH lagged AS (
  SELECT CASE WHEN lag(ts) OVER w IS NULL THEN TRUE ELSE FALSE END
           AS first_ev,
         CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) AS d
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), one AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN first_ev THEN 1 ELSE 0 END) AS BIGINT)
           AS n_users,
         CAST(SUM(CASE WHEN first_ev OR d > 300000000 THEN 1 ELSE 0 END)
              AS BIGINT) AS s300,
         CAST(SUM(CASE WHEN first_ev OR d > 900000000 THEN 1 ELSE 0 END)
              AS BIGINT) AS s900,
         CAST(SUM(CASE WHEN first_ev OR d > 1800000000 THEN 1 ELSE 0 END)
              AS BIGINT) AS s1800,
         CAST(SUM(CASE WHEN first_ev OR d > 3600000000 THEN 1 ELSE 0 END)
              AS BIGINT) AS s3600,
         CAST(SUM(CASE WHEN first_ev OR d > 7200000000 THEN 1 ELSE 0 END)
              AS BIGINT) AS s7200
  FROM lagged
), long AS (
  SELECT 300 AS gap_seconds, s300 AS n_sessions, n_users, n_events FROM one
  UNION ALL SELECT 900, s900, n_users, n_events FROM one
  UNION ALL SELECT 1800, s1800, n_users, n_events FROM one
  UNION ALL SELECT 3600, s3600, n_users, n_events FROM one
  UNION ALL SELECT 7200, s7200, n_users, n_events FROM one
)
SELECT CAST(gap_seconds AS BIGINT) AS gap_seconds, n_sessions, n_users,
       n_events,
       -- HUGEINT discipline: n_events*1e6 passes int64 at stream scale
       CAST(CASE WHEN n_sessions = 0 THEN 0
            ELSE CAST(n_events AS HUGEINT) * 1000000 // n_sessions
            END AS BIGINT)
         AS events_per_session_ppm
FROM long
"""

EXTENSION_I_CATALOG["session_gap_sensitivity"] = (
    x_session_gap_sensitivity, SQL_SESSION_GAP_SENSITIVITY)
