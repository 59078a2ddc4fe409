"""Round-8 session-2 registry extensions — each a (query, DuckDB-oracle)
pair like plans/extensions.py: the weighted/seasonal completions of the
rank kit, growth accounting, collocation mining, and the split-leakage
audit a training pipeline runs before publishing a benchmark split.

Determinism rules are the repo-wide ones (plans/catalog.py header);
signed ratios use the sign-split idiom (Spark ``div`` truncates toward
zero, DuckDB ``//`` floors — magnitudes divide identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdcm_etl_spark.operators import dedup
from pdcm_etl_spark.plans.extensions import _t

EXTENSION_E_CATALOG: dict[str, tuple] = {}

_H60_DOCID = dedup.DUCK_H60.format(col="CAST(doc_id AS VARCHAR)")


def x_weighted_median_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower weighted median of the line-item price per return
    flag, weighted by quantity (operators/ml.py::weighted_median_group)
    — one group-keyed Exchange carries the running-weight window and
    the final aggregation."""
    from pdcm_etl_spark.operators.ml import weighted_median_group

    li = _t(spark, sf_dir, "lineitem")
    return weighted_median_group(
        li,
        key_col="l_returnflag",
        id_col=(F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast(
            "bigint"
        ),
        value_micro=(F.col("l_extendedprice").cast("decimal(18,2)") * 100),
        weight=F.col("l_quantity").cast("bigint"),
    )


SQL_WEIGHTED_MEDIAN_GROUP = """
WITH base AS (
  SELECT l_returnflag AS key,
         l_orderkey * 8 + l_linenumber AS id,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS m,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND CAST(l_quantity AS BIGINT) > 0
), cum AS (
  SELECT key, m,
         SUM(CAST(w AS HUGEINT)) OVER (PARTITION BY key ORDER BY m, id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(CAST(w AS HUGEINT)) OVER (PARTITION BY key) AS tw
  FROM base
)
SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(tw) AS BIGINT) AS total_weight,
       MIN(CASE WHEN cw >= tw - cw THEN m END) AS wmedian_micro
FROM cum GROUP BY 1
"""

EXTENSION_E_CATALOG["weighted_median_group"] = (
    x_weighted_median_group, SQL_WEIGHTED_MEDIAN_GROUP)


def x_concentration_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per nation: ppm of total customer revenue
    held by the nation's top-10 customers
    (operators/analytics.py::concentration_topn) — the CRx curve point
    next to gini_concentration's single coefficient."""
    from pdcm_etl_spark.operators.analytics import concentration_topn

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    rev = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                .cast("bigint")
                .cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("rev_micro")
        )
    )
    return concentration_topn(
        rev,
        key_col="c_nationkey",
        id_col="c_custkey",
        value_micro=F.col("rev_micro"),
        top_n=10,
    )


SQL_CONCENTRATION_TOPN = """
WITH rev AS (
  SELECT c_nationkey AS key, c_custkey AS id,
         CAST(SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS HUGEINT)) AS BIGINT) AS x
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT key, x,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY x DESC, id) AS rn
  FROM rev
)
SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN rn <= 10 THEN CAST(x AS HUGEINT) END)
            AS BIGINT) AS topn_value,
       CAST(SUM(CAST(x AS HUGEINT)) AS BIGINT) AS total_value,
       CAST(CASE WHEN SUM(CAST(x AS HUGEINT)) <= 0 THEN NULL ELSE
            (SUM(CASE WHEN rn <= 10 THEN CAST(x AS HUGEINT) END) * 1000000)
              // SUM(CAST(x AS HUGEINT)) END AS BIGINT) AS topn_share_ppm
FROM ranked GROUP BY 1
"""

EXTENSION_E_CATALOG["concentration_topn"] = (
    x_concentration_topn, SQL_CONCENTRATION_TOPN)


def x_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week-aware anomaly flags on the daily event value total
    per event type (operators/temporal.py::seasonal_anomaly): each day
    is judged against the exact median of its own weekday — the
    seasonality-robust twin of anomaly_iqr/mad."""
    from pdcm_etl_spark.operators.temporal import seasonal_anomaly
    from pdcm_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    return seasonal_anomaly(
        ev,
        key_col="event_type",
        ts_col="ts",
        value_micro=(F.col("value").cast("decimal(18,6)") * 1000000).cast(
            "bigint"
        ),
    )


SQL_SEASONAL_ANOMALY = """
WITH daily AS (
  SELECT event_type AS key,
         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS day_idx,
         CAST(SUM(CAST(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
                        AS BIGINT) AS HUGEINT)) AS BIGINT)
           AS day_total_micro
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), d2 AS (
  SELECT *, CAST(day_idx % 7 AS INTEGER) AS dow FROM daily
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY key, dow
                            ORDER BY day_total_micro, day_idx) AS rn,
         COUNT(*) OVER (PARTITION BY key, dow) AS cnt
  FROM d2
), base AS (
  SELECT key, dow, day_total_micro AS baseline_micro
  FROM ranked WHERE rn = (cnt + 1) // 2
), dev AS (
  SELECT r.key, r.day_idx, r.dow, r.day_total_micro, b.baseline_micro,
         CAST(CASE WHEN b.baseline_micro IS NULL OR b.baseline_micro = 0
              THEN NULL ELSE
              (CASE WHEN r.day_total_micro < b.baseline_micro
                    THEN -1 ELSE 1 END)
              * ((abs(CAST(r.day_total_micro AS HUGEINT)
                      - b.baseline_micro) * 1000000)
                 // abs(CAST(b.baseline_micro AS HUGEINT)))
              END AS BIGINT) AS dev_ppm
  FROM ranked r LEFT JOIN base b ON r.key = b.key AND r.dow = b.dow
)
SELECT key, day_idx, dow, day_total_micro, baseline_micro, dev_ppm,
       COALESCE(abs(dev_ppm) > 500000, FALSE) AS is_anomaly
FROM dev
"""

EXTENSION_E_CATALOG["seasonal_anomaly"] = (
    x_seasonal_anomaly, SQL_SEASONAL_ANOMALY)


def x_user_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event type by day via the
    first-seen decomposition (operators/temporal.py::user_accumulation)
    — growth accounting with no expanding-window COUNT(DISTINCT)."""
    from pdcm_etl_spark.operators.temporal import user_accumulation
    from pdcm_etl_spark.plans.catalog import load_events

    return user_accumulation(
        load_events(spark, sf_dir),
        key_col="event_type",
        user_col="user_id",
        ts_col="ts",
    )


SQL_USER_ACCUMULATION = """
WITH fs AS (
  SELECT event_type AS key, user_id AS u,
         MIN(CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT)) AS day_idx
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2
), daily AS (
  SELECT key, day_idx, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM fs GROUP BY 1, 2
)
SELECT key, day_idx, new_users,
       CAST(SUM(new_users) OVER (PARTITION BY key ORDER BY day_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_users
FROM daily
"""

EXTENSION_E_CATALOG["user_accumulation"] = (
    x_user_accumulation, SQL_USER_ACCUMULATION)


def x_bigram_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 word-bigram collocations by exact-rational PMI rank
    (operators/text.py::bigram_pmi_topk): the multi-word-unit miner —
    vocabulary-sized count joins, TakeOrderedAndProject cut."""
    from pdcm_etl_spark.operators.text import bigram_pmi_topk

    return bigram_pmi_topk(_t(spark, sf_dir, "documents"))


SQL_BIGRAM_PMI_TOPK = """
WITH ws AS (
  SELECT list_filter(string_split(lower(text), ' '), w -> w <> '') AS w
  FROM documents
), bi AS (
  SELECT w[i + 1] AS w1, w[i + 2] AS w2
  FROM (SELECT w, unnest(range(greatest(len(w) - 1, 0))) AS i FROM ws)
), pairs AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_n
  FROM bi GROUP BY 1, 2 HAVING COUNT(*) >= 3
), uni AS (
  SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS w_n
  FROM (SELECT unnest(w) AS u FROM ws) GROUP BY 1
)
SELECT p.w1, p.w2, p.pair_n, u1.w_n AS w1_n, u2.w_n AS w2_n,
       CAST((CAST(p.pair_n AS HUGEINT) * 1000000000000)
            // (CAST(u1.w_n AS HUGEINT) * u2.w_n) AS BIGINT)
         AS pmi_score_e12
FROM pairs p JOIN uni u1 ON p.w1 = u1.w JOIN uni u2 ON p.w2 = u2.w
ORDER BY pmi_score_e12 DESC, p.w1, p.w2
LIMIT 50
"""

EXTENSION_E_CATALOG["bigram_pmi_topk"] = (
    x_bigram_pmi_topk, SQL_BIGRAM_PMI_TOPK)


def x_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content clusters (canonical token-set fingerprints) that straddle
    folds of a deterministic 4-way id-hash split
    (operators/sampling.py::split_leakage_audit) — the train/eval
    leakage audit; one fingerprint-keyed agg, O(n_folds) state."""
    from pdcm_etl_spark.operators.sampling import split_leakage_audit

    return split_leakage_audit(
        _t(spark, sf_dir, "documents"), id_col="doc_id", n_folds=4
    )


SQL_SPLIT_LEAKAGE_AUDIT = f"""
WITH tagged AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(
             string_split(lower(text), ' '))), ' ')) AS fingerprint,
         CAST(({_H60_DOCID}) % 4 AS INTEGER) AS fold
  FROM documents
)
SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT fold) AS INTEGER) AS n_folds_hit,
       array_to_string(list_sort(list(DISTINCT fold)), ',') AS folds,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM tagged GROUP BY 1 HAVING COUNT(DISTINCT fold) >= 2
"""

EXTENSION_E_CATALOG["split_leakage_audit"] = (
    x_split_leakage_audit, SQL_SPLIT_LEAKAGE_AUDIT)
