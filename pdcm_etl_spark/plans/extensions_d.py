"""Round-8 registry extensions — each a (query, DuckDB-oracle) pair
like plans/extensions.py. Headline: the delta-aware incremental
flagship lives in extensions_c; here are the round-8 analytics /
curation operators.

Determinism rules are the repo-wide ones (plans/catalog.py header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdcm_etl_spark.plans.extensions import _t

EXTENSION_D_CATALOG: dict[str, tuple] = {}


def x_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution over 30-min
    sessions (operators/temporal.py::attribution_position): 40/20/40
    revenue split across pre-conversion touches with EXACT integer
    conservation — end shares by bigint div, the middle pool is the
    exact remainder, its own remainder pinned to the earliest middle
    touch. The multi-touch completion of attribution_touch; same
    two-shuffle session shape, no joins."""
    from pdcm_etl_spark.operators.temporal import attribution_position
    from pdcm_etl_spark.plans.catalog import load_events

    return attribution_position(load_events(spark, sf_dir))


SQL_ATTRIBUTION_POSITION = """
WITH lagged AS (
  SELECT user_id AS u, ts, event_id AS id, event_type AS typ,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v_micro,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS __new
  FROM lagged
), sess AS (
  SELECT u, ts, id, typ, v_micro,
         SUM(__new) OVER (PARTITION BY u ORDER BY ts, id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess
  FROM flagged
), fc AS (
  SELECT u, sess, MIN(ROW(ts, id)) AS cf
  FROM sess WHERE typ = 'purchase' GROUP BY 1, 2
), rev AS (
  SELECT u, sess,
         CAST(COALESCE(SUM(CASE WHEN typ = 'purchase'
                       THEN CAST(v_micro AS HUGEINT) END), 0) AS BIGINT)
           AS rev_micro
  FROM sess GROUP BY 1, 2
), pre AS (
  SELECT s.u, s.sess, s.typ, s.ts, s.id
  FROM sess s JOIN fc ON s.u = fc.u AND s.sess = fc.sess
  WHERE s.typ <> 'purchase' AND ROW(s.ts, s.id) < fc.cf
), ranked AS (
  SELECT u, sess, typ,
         CAST(ROW_NUMBER() OVER (PARTITION BY u, sess ORDER BY ts, id)
              AS BIGINT) AS r,
         CAST(COUNT(*) OVER (PARTITION BY u, sess) AS BIGINT) AS n
  FROM pre
), credits AS (
  SELECT rk.typ AS touch_type,
         CASE
           WHEN rk.n = 1 THEN rv.rev_micro
           WHEN rk.n = 2 AND rk.r = 1
             THEN rv.rev_micro - (rv.rev_micro // 2)
           WHEN rk.n = 2 THEN rv.rev_micro // 2
           WHEN rk.r = 1 THEN (rv.rev_micro * 4000) // 10000
           WHEN rk.r = rk.n THEN (rv.rev_micro * 4000) // 10000
           ELSE (rv.rev_micro - (rv.rev_micro * 4000) // 10000
                             - (rv.rev_micro * 4000) // 10000)
                  // (rk.n - 2)
              + CASE WHEN rk.r = 2 THEN
                  (rv.rev_micro - (rv.rev_micro * 4000) // 10000
                                - (rv.rev_micro * 4000) // 10000)
                    % (rk.n - 2)
                ELSE 0 END
         END AS credit
  FROM ranked rk JOIN rev rv ON rk.u = rv.u AND rk.sess = rv.sess
  UNION ALL
  SELECT 'direct', rv.rev_micro
  FROM fc LEFT JOIN ranked rk ON fc.u = rk.u AND fc.sess = rk.sess
  JOIN rev rv ON fc.u = rv.u AND fc.sess = rv.sess
  WHERE rk.u IS NULL
)
SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(CAST(credit AS HUGEINT)) AS BIGINT) AS credit_micro
FROM credits GROUP BY 1
"""

EXTENSION_D_CATALOG["attribution_position"] = (
    x_attribution_position, SQL_ATTRIBUTION_POSITION)


def x_grouped_gain_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type cumulative gains / lift deciles of the value
    metric as a targeting score for 'purchase-user' rows
    (operators/ml.py::grouped_gain_curve): exact integer ranking,
    bucketing, and cross-multiplied ppm — the gain-chart companion of
    grouped_auc."""
    from pdcm_etl_spark.operators.ml import grouped_gain_curve
    from pdcm_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir)
    metric = (F.col("value").cast("decimal(18,6)") * 1000000).cast("bigint")
    return grouped_gain_curve(
        ev.filter(F.col("event_type").isin("click", "view", "purchase")),
        key_col="event_type",
        id_col="event_id",
        score_micro=metric,
        label_pred=F.col("user_id") % 3 == 0,
    )


SQL_GROUPED_GAIN_CURVE = """
WITH base AS (
  SELECT event_type AS key, event_id AS id,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS s,
         CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS y
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase') AND value IS NOT NULL
), ranked AS (
  SELECT key, y,
         CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY s DESC, id)
              AS BIGINT) AS r,
         CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n,
         CAST(SUM(y) OVER (PARTITION BY key) AS BIGINT) AS tp
  FROM base
), bucketed AS (
  SELECT key, y, n, tp,
         CAST(1 + ((r - 1) * 10) // n AS INTEGER) AS bucket
  FROM ranked
), per_bucket AS (
  SELECT key, bucket,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         MAX(n) AS n, MAX(tp) AS tp
  FROM bucketed GROUP BY 1, 2
), cum AS (
  SELECT *,
         CAST(SUM(n_pos) OVER (PARTITION BY key ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_pos,
         CAST(SUM(n_rows) OVER (PARTITION BY key ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_n
  FROM per_bucket
)
SELECT key, bucket, n_rows, n_pos, cum_pos,
       CAST(CASE WHEN tp = 0 THEN NULL ELSE
            (CAST(cum_pos AS HUGEINT) * 1000000) // tp END AS BIGINT)
         AS gain_ppm,
       CAST(CASE WHEN tp = 0 THEN NULL ELSE
            (CAST(cum_pos AS HUGEINT) * n * 1000000)
              // (CAST(cum_n AS HUGEINT) * tp) END AS BIGINT)
         AS lift_ppm
FROM cum
"""

EXTENSION_D_CATALOG["grouped_gain_curve"] = (
    x_grouped_gain_curve, SQL_GROUPED_GAIN_CURVE)


def x_chisq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square drift decomposition of the event-type mix before vs
    after mid-January (operators/analytics.py::chisq_drift): the exact
    per-category 2xC contribution identity — which categories drove
    the shift, in milli units, one bounded aggregation."""
    from pdcm_etl_spark.operators.analytics import chisq_drift
    from pdcm_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir)
    return chisq_drift(
        ev, "event_type", F.col("ts") >= F.lit("2024-01-16")
    )


SQL_CHISQ_DRIFT = """
WITH cells AS (
  SELECT event_type AS category,
         CAST(SUM(CASE WHEN ts >= '2024-01-16' THEN 0 ELSE 1 END)
              AS BIGINT) AS n_before,
         CAST(SUM(CASE WHEN ts >= '2024-01-16' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_after
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_before) AS BIGINT) AS nb,
         CAST(SUM(n_after) AS BIGINT) AS na
  FROM cells
)
SELECT category, n_before, n_after,
       CAST(CASE WHEN na = 0 OR nb = 0 OR n_before + n_after = 0
            THEN NULL ELSE
            ((CAST(n_after AS HUGEINT) * nb - CAST(n_before AS HUGEINT) * na)
             * (CAST(n_after AS HUGEINT) * nb - CAST(n_before AS HUGEINT) * na)
             * 1000)
              // (CAST(na AS HUGEINT) * nb * (n_before + n_after))
            END AS BIGINT) AS contrib_milli
FROM cells, tot
"""

EXTENSION_D_CATALOG["chisq_drift"] = (x_chisq_drift, SQL_CHISQ_DRIFT)


def x_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram novelty per document (operators/text.py::ngram_novelty):
    ppm of each doc's distinct shingles first seen (min doc_id) in that
    doc — the curation signal between dedup and quality scoring. One
    shingle-keyed window, one doc-keyed agg, no self-join."""
    from pdcm_etl_spark.operators.text import ngram_novelty

    return ngram_novelty(_t(spark, sf_dir, "documents"))


SQL_NGRAM_NOVELTY = """
WITH ws AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
  FROM (
    SELECT doc_id, w, unnest(range(greatest(len(w) - 2, 0))) AS i FROM ws
  )
), firsts AS (
  SELECT doc_id, shingle,
         MIN(doc_id) OVER (PARTITION BY shingle) AS first_id
  FROM sh
), per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN doc_id = first_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM firsts GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(p.n_shingles, 0) AS n_shingles,
       COALESCE(p.n_novel, 0) AS n_novel,
       CAST(CASE WHEN p.n_shingles IS NULL OR p.n_shingles = 0 THEN NULL
            ELSE (CAST(p.n_novel AS HUGEINT) * 1000000) // p.n_shingles
            END AS BIGINT) AS novelty_ppm
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""

EXTENSION_D_CATALOG["ngram_novelty"] = (x_ngram_novelty, SQL_NGRAM_NOVELTY)


def x_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two order rankers per priority class
    (operators/ml.py::rrf_fusion): value rank fused with recency rank,
    integer micro contributions (1e6 div (60+rank)), top-10 per group.
    One group-keyed Exchange carries all three windows."""
    from pdcm_etl_spark.operators.ml import rrf_fusion

    orders = _t(spark, sf_dir, "orders")
    return rrf_fusion(
        orders,
        key_col="o_orderpriority",
        id_col="o_orderkey",
        score_a=(F.col("o_totalprice").cast("decimal(18,2)") * 100),
        score_b=F.unix_date(F.col("o_orderdate").cast("date")),
    )


SQL_RRF_FUSION = """
WITH base AS (
  SELECT o_orderpriority AS key, o_orderkey AS id,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS sa,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS sb
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
), ranked AS (
  SELECT key, id,
         CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY sa DESC, id)
              AS BIGINT) AS rank_a,
         CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY sb DESC, id)
              AS BIGINT) AS rank_b
  FROM base
), fused AS (
  SELECT key, id, rank_a, rank_b,
         CAST(1000000 // (60 + rank_a) + 1000000 // (60 + rank_b)
              AS BIGINT) AS rrf_micro
  FROM ranked
)
SELECT key, id, rank_a, rank_b, rrf_micro
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                               ORDER BY rrf_micro DESC, id) AS fr
  FROM fused
) WHERE fr <= 10
"""

EXTENSION_D_CATALOG["rrf_fusion"] = (x_rrf_fusion, SQL_RRF_FUSION)
