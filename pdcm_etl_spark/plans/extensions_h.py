"""Round-9 registry extensions — each a (query, DuckDB-oracle) pair
like plans/extensions.py: corpus-curation audits (label noise, per-feed
duplication, char-class composition), Zipf/degree spectra, long-tail
category collapse, stream cadence profiling, stratified k-fold
balancing, and the embedding-health profile.

Determinism rules are the repo-wide ones (plans/catalog.py header):
exact integer/ppm arithmetic on every compare path, portable hashes,
bounded outputs, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdcm_etl_spark.operators import dedup
from pdcm_etl_spark.plans.extensions import _t

EXTENSION_H_CATALOG: dict[str, tuple] = {}

_H60_DOCID = dedup.DUCK_H60.format(col="CAST(doc_id AS VARCHAR)")

_FP = (
    "md5(array_to_string(list_sort(list_distinct("
    "string_split(lower(text), ' '))), ' '))"
)


def x_label_noise_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content clusters carrying conflicting lang labels
    (operators/text.py::label_noise_audit)."""
    from pdcm_etl_spark.operators.text import label_noise_audit

    return label_noise_audit(_t(spark, sf_dir, "documents"))


SQL_LABEL_NOISE_AUDIT = f"""
WITH fp AS (
  SELECT {_FP} AS fingerprint, COALESCE(lang, '') AS lbl FROM documents
), per AS (
  SELECT fingerprint, lbl, CAST(COUNT(*) AS BIGINT) AS n
  FROM fp GROUP BY 1, 2
), agg AS (
  SELECT fingerprint,
         CAST(SUM(n) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS INTEGER) AS n_labels,
         array_to_string(list_sort(list(lbl)), ',') AS labels,
         MIN({{'nn': -n, 'lbl': lbl}}) AS best
  FROM per GROUP BY 1
)
SELECT fingerprint, n_docs, n_labels, labels,
       (best).lbl AS majority_label,
       CAST(-((best).nn) AS BIGINT) AS majority_n
FROM agg WHERE n_labels >= 2
"""

EXTENSION_H_CATALOG["label_noise_audit"] = (
    x_label_noise_audit, SQL_LABEL_NOISE_AUDIT)


def x_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate scorecard
    (operators/text.py::dup_rate_by_source)."""
    from pdcm_etl_spark.operators.text import dup_rate_by_source

    return dup_rate_by_source(_t(spark, sf_dir, "documents"))


SQL_DUP_RATE_BY_SOURCE = f"""
WITH fp AS (
  SELECT COALESCE(source, '') AS src, {_FP} AS fingerprint FROM documents
), per_sf AS (
  SELECT src, fingerprint, CAST(COUNT(*) AS BIGINT) AS n
  FROM fp GROUP BY 1, 2
), gl AS (
  SELECT fingerprint, CAST(COUNT(DISTINCT src) AS INTEGER) AS nsrc
  FROM fp GROUP BY 1
)
SELECT src AS source,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST((SUM(n) - COUNT(*)) * 1000000 // SUM(n) AS BIGINT)
         AS dup_rate_ppm,
       CAST(SUM(CASE WHEN nsrc >= 2 THEN n ELSE 0 END) * 1000000
            // SUM(n) AS BIGINT) AS cross_source_ppm
FROM per_sf JOIN gl USING (fingerprint)
GROUP BY 1
"""

EXTENSION_H_CATALOG["dup_rate_by_source"] = (
    x_dup_rate_by_source, SQL_DUP_RATE_BY_SOURCE)


def x_token_frequency_spectrum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zipf spectrum: vocabulary + occurrence mass per log2-frequency
    bucket with cumulative share from the common end
    (operators/text.py::token_frequency_spectrum)."""
    from pdcm_etl_spark.operators.text import token_frequency_spectrum

    return token_frequency_spectrum(_t(spark, sf_dir, "documents"))


SQL_TOKEN_FREQUENCY_SPECTRUM = """
WITH tok AS (
  SELECT w FROM documents,
         unnest(string_split(lower(text), ' ')) AS u(w)
  WHERE w <> ''
), freqs AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY 1
), buckets AS (
  SELECT CAST(FLOOR(log2(f)) AS INTEGER) AS freq_bucket,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(f) AS BIGINT) AS n_occurrences
  FROM freqs GROUP BY 1
)
SELECT freq_bucket, n_tokens, n_occurrences,
       CAST(SUM(n_occurrences) OVER (ORDER BY freq_bucket DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            * 1000000
            // SUM(n_occurrences) OVER () AS BIGINT) AS cum_share_ppm
FROM buckets
"""

EXTENSION_H_CATALOG["token_frequency_spectrum"] = (
    x_token_frequency_spectrum, SQL_TOKEN_FREQUENCY_SPECTRUM)


def x_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source
    (operators/text.py::char_class_profile)."""
    from pdcm_etl_spark.operators.text import char_class_profile

    return char_class_profile(_t(spark, sf_dir, "documents"))


SQL_CHAR_CLASS_PROFILE = """
WITH per AS (
  SELECT COALESCE(source, '') AS source,
         CAST(length(text) AS BIGINT) AS n,
         CAST(length(text)
              - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
              AS BIGINT) AS a,
         CAST(length(text)
              - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS d,
         CAST(length(text) - length(replace(text, ' ', ''))
              AS BIGINT) AS s
  FROM documents
), agg AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS n_chars,
         CAST(SUM(a) AS BIGINT) AS ta,
         CAST(SUM(d) AS BIGINT) AS td,
         CAST(SUM(s) AS BIGINT) AS ts
  FROM per GROUP BY 1
)
SELECT source, n_chars,
       CAST(ta * 1000000 // n_chars AS BIGINT) AS alpha_ppm,
       CAST(td * 1000000 // n_chars AS BIGINT) AS digit_ppm,
       CAST(ts * 1000000 // n_chars AS BIGINT) AS space_ppm,
       CAST(1000000 - (ta * 1000000 // n_chars)
            - (td * 1000000 // n_chars)
            - (ts * 1000000 // n_chars) AS BIGINT) AS other_ppm
FROM agg WHERE n_chars > 0
"""

EXTENSION_H_CATALOG["char_class_profile"] = (
    x_char_class_profile, SQL_CHAR_CLASS_PROFILE)


def x_rare_category_collapse(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Long-tail collapse of the documents source column at min_n=50
    (operators/analytics.py::rare_category_collapse)."""
    from pdcm_etl_spark.operators.analytics import rare_category_collapse

    return rare_category_collapse(
        _t(spark, sf_dir, "documents"), cat_col="source", min_n=50
    )


SQL_RARE_CATEGORY_COLLAPSE = """
WITH counts AS (
  SELECT COALESCE(source, '') AS category,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM documents GROUP BY 1
)
SELECT CASE WHEN n_rows >= 50 THEN category ELSE '__other__' END
         AS category,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_source_categories
FROM counts GROUP BY 1
"""

EXTENSION_H_CATALOG["rare_category_collapse"] = (
    x_rare_category_collapse, SQL_RARE_CATEGORY_COLLAPSE)


def x_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival cadence profile with exact order
    statistics (operators/temporal.py::interarrival_profile)."""
    from pdcm_etl_spark.operators.temporal import interarrival_profile
    from pdcm_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir)
    return interarrival_profile(
        ev, key_col="event_type", ts_col="ts", id_col="event_id"
    )


SQL_INTERARRIVAL_PROFILE = """
WITH es AS (
  SELECT event_type AS key, ts, event_id,
         CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec
  FROM events
), gaps AS (
  SELECT key, ts, event_id,
         sec - LAG(sec) OVER (PARTITION BY key
                              ORDER BY ts ASC, event_id ASC) AS gap_sec
  FROM es
), g AS (
  SELECT * FROM gaps WHERE gap_sec IS NOT NULL
), ranked AS (
  SELECT key, gap_sec,
         CAST(ROW_NUMBER() OVER (PARTITION BY key
                ORDER BY gap_sec ASC, ts ASC, event_id ASC)
              AS BIGINT) AS r,
         CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n
  FROM g
)
SELECT key,
       CAST(MAX(n) AS BIGINT) AS n_gaps,
       MIN(gap_sec) AS min_gap_sec,
       MAX(CASE WHEN r = (n + 1) // 2 THEN gap_sec END)
         AS median_gap_sec,
       MAX(CASE WHEN r = (9 * n + 9) // 10 THEN gap_sec END)
         AS p90_gap_sec,
       MAX(gap_sec) AS max_gap_sec
FROM ranked GROUP BY 1
"""

EXTENSION_H_CATALOG["interarrival_profile"] = (
    x_interarrival_profile, SQL_INTERARRIVAL_PROFILE)


def x_stratified_kfold_assign(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stratified 4-fold assignment audit over documents by lang
    (operators/sampling.py::stratified_kfold_assign)."""
    from pdcm_etl_spark.operators.sampling import stratified_kfold_assign

    return stratified_kfold_assign(
        _t(spark, sf_dir, "documents"),
        id_col="doc_id",
        class_col="lang",
        n_folds=4,
    )


SQL_STRATIFIED_KFOLD_ASSIGN = f"""
WITH h AS (
  SELECT lang AS class,
         {_H60_DOCID} AS hh, doc_id
  FROM documents
), assigned AS (
  SELECT class,
         CAST((ROW_NUMBER() OVER (PARTITION BY class
                 ORDER BY hh ASC, doc_id ASC) - 1) % 4
              AS INTEGER) AS fold
  FROM h
)
SELECT class, fold, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM assigned GROUP BY 1, 2
"""

EXTENSION_H_CATALOG["stratified_kfold_assign"] = (
    x_stratified_kfold_assign, SQL_STRATIFIED_KFOLD_ASSIGN)


def x_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution histogram of the part→order bipartite graph
    (operators/graph.py::degree_histogram)."""
    from pdcm_etl_spark.operators.graph import degree_histogram

    return degree_histogram(
        _t(spark, sf_dir, "lineitem"),
        src_col="l_partkey",
        dst_col="l_orderkey",
    )


SQL_DEGREE_HISTOGRAM = """
WITH deg AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT DISTINCT l_partkey, l_orderkey FROM lineitem
        WHERE l_partkey IS NOT NULL AND l_orderkey IS NOT NULL)
  GROUP BY 1
)
SELECT CAST(FLOOR(log2(d)) AS INTEGER) AS degree_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(d) AS BIGINT) AS n_edges
FROM deg GROUP BY 1
"""

EXTENSION_H_CATALOG["degree_histogram"] = (
    x_degree_histogram, SQL_DEGREE_HISTOGRAM)


def x_embedding_norm_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-health profile per label
    (operators/ml.py::embedding_norm_profile)."""
    from pdcm_etl_spark.operators.ml import embedding_norm_profile

    return embedding_norm_profile(
        _t(spark, sf_dir, "embeddings"), label_col="label"
    )


SQL_EMBEDDING_NORM_PROFILE = """
WITH per AS (
  SELECT label,
         CAST(len(embedding) AS INTEGER) AS dim,
         CAST(FLOOR(sqrt(list_dot_product(
                CAST(embedding AS DOUBLE[]),
                CAST(embedding AS DOUBLE[]))) * 1000000.0)
              AS BIGINT) AS norm_ppm
  FROM embeddings
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN norm_ppm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero,
       CAST(MAX(dim) AS INTEGER) AS n_dims,
       MIN(norm_ppm) AS min_norm_ppm,
       MAX(norm_ppm) AS max_norm_ppm,
       CAST(SUM(norm_ppm) // COUNT(*) AS BIGINT) AS avg_norm_ppm
FROM per GROUP BY 1
"""

EXTENSION_H_CATALOG["embedding_norm_profile"] = (
    x_embedding_norm_profile, SQL_EMBEDDING_NORM_PROFILE)


def x_pit_tier_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-join point-in-time enrichment: every click gets the user's
    purchase tier (value-micro div 25e6) as of the click instant
    (operators/temporal.py::pit_enrich — union + forward-fill window,
    one key Exchange, no interval table). NULL user ids are dropped on
    both sides (not trackable; NULLS FIRST/LAST rank divergence)."""
    from pdcm_etl_spark.operators.temporal import pit_enrich
    from pdcm_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    facts = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    changes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("chg_id"),
        F.expr(
            "CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
            " div 25000000"
        ).alias("tier"),
    )
    out = pit_enrich(
        facts,
        changes,
        key_col="user_id",
        ts_col="ts",
        attr_col="tier",
        change_id_col="chg_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").alias(
            "click_sec"
        ),
        F.col("attr_at_ts").alias("tier_at_click"),
    )


SQL_PIT_TIER_ENRICH = """
WITH u AS (
  SELECT event_id, user_id, ts, NULL::BIGINT AS tier, 0 AS is_chg,
         NULL::BIGINT AS cid
  FROM events WHERE event_type = 'click' AND user_id IS NOT NULL
  UNION ALL
  SELECT NULL::BIGINT, user_id, ts,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
           // 25000000,
         1, event_id
  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
), filled AS (
  SELECT event_id, user_id, ts, is_chg,
         LAST_VALUE(tier IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts ASC, is_chg DESC, cid ASC NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS tier_at_click
  FROM u
)
SELECT event_id, user_id,
       CAST(epoch_us(ts) // 1000000 AS BIGINT) AS click_sec,
       tier_at_click
FROM filled WHERE is_chg = 0
"""

EXTENSION_H_CATALOG["pit_tier_enrich"] = (
    x_pit_tier_enrich, SQL_PIT_TIER_ENRICH)


def x_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation of customers per nation
    (operators/analytics.py::rfm_segments) — recency on the order-date
    epoch-day, frequency on order count, monetary on micro-exact
    total price; segment table bounded by nations × 5³."""
    from pdcm_etl_spark.operators.analytics import rfm_segments

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_nationkey")
    )
    joined = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    )
    return rfm_segments(
        joined,
        group_col="c_nationkey",
        customer_col="o_custkey",
        ts_col="o_orderdate",
        amount_micro=F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS"
            " DECIMAL(38,0))"
        ),
    )


SQL_RFM_SEGMENTS = """
WITH per_cust AS (
  SELECT c_nationkey AS g, o_custkey AS c,
         CAST(MAX(epoch_us(o_orderdate) // 86400000000) AS BIGINT)
           AS rec,
         CAST(COUNT(*) AS BIGINT) AS frq,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000
                  AS HUGEINT)) AS mon
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT g,
         CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY rec, c)
              AS BIGINT) AS rr,
         CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY frq, c)
              AS BIGINT) AS rf,
         CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY mon, c)
              AS BIGINT) AS rm,
         CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
  FROM per_cust
)
SELECT g AS "group",
       CAST(((rr - 1) * 5) // n AS INTEGER) + 1 AS r_bin,
       CAST(((rf - 1) * 5) // n AS INTEGER) + 1 AS f_bin,
       CAST(((rm - 1) * 5) // n AS INTEGER) + 1 AS m_bin,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM ranked GROUP BY 1, 2, 3, 4
"""

EXTENSION_H_CATALOG["rfm_segments"] = (x_rfm_segments, SQL_RFM_SEGMENTS)


def x_label_distinctive_terms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-5 most distinctive terms per language by exact integer lift
    (operators/text.py::label_distinctive_terms)."""
    from pdcm_etl_spark.operators.text import label_distinctive_terms

    return label_distinctive_terms(
        _t(spark, sf_dir, "documents"), label_col="lang", k=5, min_count=5
    )


SQL_LABEL_DISTINCTIVE_TERMS = """
WITH tok AS (
  SELECT COALESCE(lang, '') AS label, w AS term
  FROM documents, unnest(string_split(lower(text), ' ')) AS u(w)
  WHERE w <> ''
), lt AS (
  SELECT label, term, CAST(COUNT(*) AS BIGINT) AS n_lt
  FROM tok GROUP BY 1, 2
), t AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n_t FROM tok GROUP BY 1
), lab AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_label FROM tok GROUP BY 1
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM tok),
scored AS (
  SELECT label, term, n_lt AS n_in_label,
         CAST((CAST(n_lt AS HUGEINT) * n_total * 1000000)
              // (CAST(n_t AS HUGEINT) * n_label) AS BIGINT) AS lift_ppm
  FROM lt JOIN t USING (term) JOIN lab USING (label), tot
  WHERE n_lt >= 5
)
SELECT label, term, n_in_label, lift_ppm, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY label
            ORDER BY lift_ppm DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""

EXTENSION_H_CATALOG["label_distinctive_terms"] = (
    x_label_distinctive_terms, SQL_LABEL_DISTINCTIVE_TERMS)
