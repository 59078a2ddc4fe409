"""Round-8 session-3 registry extensions — each a (query, DuckDB-oracle)
pair like plans/extensions.py: deterministic mode, referential-integrity
pre-flight, cross-source vocabulary overlap, the Heaps'-law vocabulary
growth curve, and cohort churn accounting.

Determinism rules are the repo-wide ones (plans/catalog.py header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdcm_etl_spark.plans.extensions import _t

EXTENSION_F_CATALOG: dict[str, tuple] = {}


def x_mode_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language modal source of the documents corpus
    (operators/analytics.py::mode_group): explicit highest-count /
    smallest-value tie policy — native mode() functions leave ties
    implementation-defined, the exact nondeterminism class the
    determinism screen hunts."""
    from pdcm_etl_spark.operators.analytics import mode_group

    return mode_group(_t(spark, sf_dir, "documents"), "lang", "source")


SQL_MODE_GROUP = """
WITH counts AS (
  SELECT lang AS key, source AS v, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents WHERE source IS NOT NULL GROUP BY 1, 2
), ranked AS (
  SELECT key, v, n,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY n DESC, v) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS ndv
  FROM counts
)
SELECT key, v AS mode_value, n AS mode_n, ndv AS n_distinct_values
FROM ranked WHERE rn = 1
"""

EXTENSION_F_CATALOG["mode_group"] = (x_mode_group, SQL_MODE_GROUP)


def x_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity pre-flight over the lineitem star
    (operators/analytics.py::fk_orphan_audit): per FK edge, null-key
    and orphan counts via broadcast anti joins — one bounded row per
    edge."""
    from pdcm_etl_spark.operators.analytics import fk_orphan_audit

    li = _t(spark, sf_dir, "lineitem")
    return fk_orphan_audit(
        li,
        [
            ("l_orderkey", _t(spark, sf_dir, "orders"), "o_orderkey"),
            ("l_partkey", _t(spark, sf_dir, "part"), "p_partkey"),
            ("l_suppkey", _t(spark, sf_dir, "supplier"), "s_suppkey"),
        ],
        fact_name="lineitem",
    )


SQL_FK_ORPHAN_AUDIT = """
SELECT 'lineitem' AS fact, 'l_orderkey' AS fk_col,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_rows,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
   WHERE l_orderkey IS NULL) AS n_null_fk,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
   WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
     (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    AS n_orphan
UNION ALL
SELECT 'lineitem', 'l_partkey',
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
   WHERE l_partkey IS NULL),
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
   WHERE l.l_partkey IS NOT NULL AND NOT EXISTS
     (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem', 'l_suppkey',
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
   WHERE l_suppkey IS NULL),
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
   WHERE l.l_suppkey IS NOT NULL AND NOT EXISTS
     (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
"""

EXTENSION_F_CATALOG["fk_orphan_audit"] = (
    x_fk_orphan_audit, SQL_FK_ORPHAN_AUDIT)


def x_source_token_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vocabulary Jaccard between every source pair
    (operators/text.py::source_token_overlap): per-token source sets +
    map-side pair explode — no token self-join on the Spark side (the
    oracle may self-join; it is correctness-only)."""
    from pdcm_etl_spark.operators.text import source_token_overlap

    return source_token_overlap(_t(spark, sf_dir, "documents"))


SQL_SOURCE_TOKEN_OVERLAP = """
WITH ts AS (
  SELECT DISTINCT u AS tok, source AS src
  FROM (
    SELECT source,
           unnest(list_filter(string_split(lower(text), ' '),
                  w -> w <> '')) AS u
    FROM documents
  )
), vocab AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS vocab FROM ts GROUP BY 1
), pairs AS (
  SELECT a.src AS source_a, b.src AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM ts a JOIN ts b ON a.tok = b.tok AND a.src < b.src
  GROUP BY 1, 2
)
SELECT p.source_a, p.source_b, va.vocab AS vocab_a, vb.vocab AS vocab_b,
       p.n_shared,
       CAST((CAST(p.n_shared AS HUGEINT) * 1000000)
            // (va.vocab + vb.vocab - p.n_shared) AS BIGINT)
         AS jaccard_ppm
FROM pairs p
JOIN vocab va ON p.source_a = va.src
JOIN vocab vb ON p.source_b = vb.src
"""

EXTENSION_F_CATALOG["source_token_overlap"] = (
    x_source_token_overlap, SQL_SOURCE_TOKEN_OVERLAP)


def x_vocab_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth over 10 doc-id buckets
    (operators/text.py::vocab_accumulation): first-seen decomposition
    on tokens — new-vocab and cumulative vocab per corpus slice."""
    from pdcm_etl_spark.operators.text import vocab_accumulation

    return vocab_accumulation(_t(spark, sf_dir, "documents"))


SQL_VOCAB_ACCUMULATION = """
WITH toks AS (
  SELECT doc_id AS id, u AS tok
  FROM (
    SELECT doc_id,
           unnest(list_distinct(list_filter(string_split(lower(text), ' '),
                  w -> w <> ''))) AS u
    FROM documents
  )
), b AS (
  SELECT CAST(MIN(id) AS BIGINT) AS lo, CAST(MAX(id) AS BIGINT) AS hi
  FROM toks
), fs AS (
  SELECT tok,
         MIN(CAST(((id - lo) * 10) // (hi - lo + 1) AS INTEGER)) AS bucket
  FROM toks, b GROUP BY 1
), pb AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_new_tokens
  FROM fs GROUP BY 1
)
SELECT bucket, n_new_tokens,
       CAST(SUM(n_new_tokens) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_vocab
FROM pb
"""

EXTENSION_F_CATALOG["vocab_accumulation"] = (
    x_vocab_accumulation, SQL_VOCAB_ACCUMULATION)


def x_churn_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-level churn table over the events horizon
    (operators/temporal.py::churn_summary): one user-keyed min/max agg,
    scalar horizon, bounded (week × 2) rollup."""
    from pdcm_etl_spark.operators.temporal import churn_summary
    from pdcm_etl_spark.plans.catalog import load_events

    return churn_summary(
        load_events(spark, sf_dir), user_col="user_id", ts_col="ts"
    )


SQL_CHURN_SUMMARY = """
WITH pu AS (
  SELECT user_id AS u,
         MIN(CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT)) AS first_day,
         MAX(CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT)) AS last_day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
), h AS (
  SELECT MAX(last_day) AS horizon FROM pu
)
SELECT CAST(first_day // 7 AS BIGINT) AS cohort_week,
       last_day < horizon - 7 AS churned,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM pu, h GROUP BY 1, 2
"""

EXTENSION_F_CATALOG["churn_summary"] = (x_churn_summary, SQL_CHURN_SUMMARY)
