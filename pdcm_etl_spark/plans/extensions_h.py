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
    # customer is data-sized (grows with SF): pin shuffle-hash — the
    # same abortive-broadcast hazard _size_sides documents; rfm's own
    # windows re-shuffle on c_nationkey anyway, so no broadcast win
    joined = orders.join(
        cust.hint("shuffle_hash"), orders["o_custkey"] == cust["c_custkey"]
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


def x_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type ingestion freshness vs the corpus frontier
    (operators/temporal.py::freshness_audit)."""
    from pdcm_etl_spark.operators.temporal import freshness_audit
    from pdcm_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir)
    return freshness_audit(ev, key_col="event_type", ts_col="ts")


SQL_FRESHNESS_AUDIT = """
WITH per AS (
  SELECT event_type AS key,
         CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec
  FROM events
), fr AS (SELECT MAX(sec) AS max_sec FROM per)
SELECT key,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MAX(sec) AS BIGINT) AS last_sec,
       CAST(MAX(max_sec) - MAX(sec) AS BIGINT) AS lag_sec,
       CAST(SUM(CASE WHEN sec >= max_sec - 86400 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_recent,
       CAST(SUM(CASE WHEN sec >= max_sec - 604800 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_window
FROM per, fr GROUP BY 1
"""

EXTENSION_H_CATALOG["freshness_audit"] = (
    x_freshness_audit, SQL_FRESHNESS_AUDIT)


def x_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type audience co-membership matrix over users
    (operators/analytics.py::audience_overlap)."""
    from pdcm_etl_spark.operators.analytics import audience_overlap
    from pdcm_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir)
    return audience_overlap(ev, entity_col="user_id", group_col="event_type")


SQL_AUDIENCE_OVERLAP = """
WITH m AS (
  SELECT DISTINCT user_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
)
SELECT a.event_type AS group_a, b.event_type AS group_b,
       CAST(COUNT(*) AS BIGINT) AS n_entities
FROM m a JOIN m b
  ON a.user_id = b.user_id AND a.event_type <= b.event_type
GROUP BY 1, 2
"""

EXTENSION_H_CATALOG["audience_overlap"] = (
    x_audience_overlap, SQL_AUDIENCE_OVERLAP)


def x_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly net-revenue-retention triangle over purchase events
    (operators/temporal.py::revenue_retention)."""
    from pdcm_etl_spark.operators.temporal import revenue_retention
    from pdcm_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    return revenue_retention(
        ev,
        user_col="user_id",
        ts_col="ts",
        value_micro=F.expr(
            "CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))"
        ),
    )


SQL_REVENUE_RETENTION = """
WITH base AS (
  SELECT user_id AS u,
         CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS w,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS v
  FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL
), first AS (
  SELECT u, MIN(w) AS cohort_week FROM base GROUP BY 1
), cells AS (
  SELECT cohort_week, CAST(w - cohort_week AS INTEGER) AS week_offset,
         SUM(v) AS rev
  FROM base JOIN first USING (u)
  GROUP BY 1, 2
), base0 AS (
  SELECT cohort_week AS cw0, rev AS rev0 FROM cells WHERE week_offset = 0
)
SELECT cohort_week, week_offset,
       CAST(rev AS BIGINT) AS revenue_micro,
       CAST(CASE WHEN rev0 IS NULL OR rev0 = 0 THEN NULL
            ELSE (rev * 1000000) // rev0 END AS BIGINT) AS retention_ppm
FROM cells LEFT JOIN base0 ON cohort_week = cw0
"""

EXTENSION_H_CATALOG["revenue_retention"] = (
    x_revenue_retention, SQL_REVENUE_RETENTION)


def x_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest / current consecutive-day streak per user — the
    gaps-and-islands pattern (operators/temporal.py::activity_streaks)."""
    from pdcm_etl_spark.operators.temporal import activity_streaks
    from pdcm_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir)
    return activity_streaks(ev, user_col="user_id", ts_col="ts")


SQL_ACTIVITY_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id AS "user",
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
  FROM events WHERE user_id IS NOT NULL
), islands AS (
  SELECT "user", d,
         d - ROW_NUMBER() OVER (PARTITION BY "user" ORDER BY d)
           AS island
  FROM days
), per_island AS (
  SELECT "user", island, CAST(COUNT(*) AS BIGINT) AS len,
         MAX(d) AS island_end
  FROM islands GROUP BY 1, 2
)
SELECT "user",
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       MAX(len) AS longest_streak,
       CAST(-((MIN({'ne': -island_end, 'nl': -len})).nl) AS BIGINT)
         AS current_streak
FROM per_island GROUP BY 1
"""

EXTENSION_H_CATALOG["activity_streaks"] = (
    x_activity_streaks, SQL_ACTIVITY_STREAKS)


def x_json_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key/value spread profile of the events props JSON blob
    (operators/analytics.py::json_key_profile)."""
    from pdcm_etl_spark.operators.analytics import json_key_profile
    from pdcm_etl_spark.plans.catalog import load_events

    return json_key_profile(load_events(spark, sf_dir), json_col="props")


SQL_JSON_KEY_PROFILE = """
WITH kv AS (
  SELECT k AS key, json_extract_string(props, '$.' || k) AS value
  FROM events, unnest(json_keys(props)) AS u(k)
)
SELECT key,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT value) AS BIGINT) AS n_distinct_values,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM kv GROUP BY 1
"""

EXTENSION_H_CATALOG["json_key_profile"] = (
    x_json_key_profile, SQL_JSON_KEY_PROFILE)


def x_nzv_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-zero-variance screen over lineitem's portable columns
    (operators/analytics.py::nzv_audit)."""
    from pdcm_etl_spark.operators.analytics import nzv_audit

    return nzv_audit(
        _t(spark, sf_dir, "lineitem"),
        cols=["l_returnflag", "l_linestatus", "l_linenumber",
              "l_suppkey"],
    )


SQL_NZV_AUDIT = """
WITH long AS (
  SELECT 'l_returnflag' AS col_name, CAST(l_returnflag AS VARCHAR) AS val
  FROM lineitem
  UNION ALL
  SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
), counts AS (
  SELECT col_name, val, CAST(COUNT(*) AS BIGINT) AS n
  FROM long GROUP BY 1, 2
)
SELECT col_name,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       (MIN({'nn': -n, 'val': val})).val AS mode_value,
       CAST((-((MIN({'nn': -n, 'val': val})).nn)) * 1000000 // SUM(n)
            AS BIGINT) AS mode_share_ppm
FROM counts GROUP BY 1
"""

EXTENSION_H_CATALOG["nzv_audit"] = (x_nzv_audit, SQL_NZV_AUDIT)


def x_out_of_orderness_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermark-sizing disorder profile per event type, arrival order =
    event id (operators/temporal.py::out_of_orderness_profile)."""
    from pdcm_etl_spark.operators.temporal import out_of_orderness_profile
    from pdcm_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir)
    return out_of_orderness_profile(
        ev, key_col="event_type", ts_col="ts", arrival_col="event_id"
    )


SQL_OUT_OF_ORDERNESS_PROFILE = """
WITH staged AS (
  SELECT event_type AS key,
         MAX(CAST(epoch_us(ts) // 1000000 AS BIGINT)) OVER (
           PARTITION BY event_type ORDER BY event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - CAST(epoch_us(ts) // 1000000 AS BIGINT) AS lag_sec
  FROM events
)
SELECT key,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(lag_sec) AS BIGINT) AS max_disorder_sec,
       CAST(SUM(CASE WHEN lag_sec > 60 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late_a,
       CAST(SUM(CASE WHEN lag_sec > 600 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late_b
FROM staged GROUP BY 1
"""

EXTENSION_H_CATALOG["out_of_orderness_profile"] = (
    x_out_of_orderness_profile, SQL_OUT_OF_ORDERNESS_PROFILE)


def x_snapshot_field_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level churn between the snapshot_diff pair of order
    snapshots (operators/cdc.py::snapshot_field_churn) — which columns
    actually changed among persisting keys."""
    from pdcm_etl_spark.operators.cdc import snapshot_field_churn

    base = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        "date_format(o_orderdate, 'yyyy-MM-dd') AS o_date",
    )
    old = base.filter("o_orderkey % 7 != 0")
    new = base.filter("o_orderkey % 11 != 0").withColumn(
        "o_orderpriority",
        F.expr(
            "CASE WHEN o_orderkey % 5 = 0 "
            "THEN concat(o_orderpriority, '-R2') ELSE o_orderpriority END"
        ),
    )
    return snapshot_field_churn(
        old, new, "o_orderkey",
        fields=["o_orderstatus", "o_orderpriority", "o_date"],
    )


SQL_SNAPSHOT_FIELD_CHURN = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         strftime(o_orderdate, '%Y-%m-%d') AS o_date
  FROM orders
), old AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0),
new AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 5 = 0
              THEN o_orderpriority || '-R2' ELSE o_orderpriority END
           AS o_orderpriority,
         o_date
  FROM base WHERE o_orderkey % 11 <> 0
), one AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COALESCE(SUM(CASE WHEN o.o_orderstatus IS DISTINCT FROM
                            n.o_orderstatus THEN 1 ELSE 0 END), 0)
           AS BIGINT) AS chg_status,
         CAST(COALESCE(SUM(CASE WHEN o.o_orderpriority IS DISTINCT FROM
                            n.o_orderpriority THEN 1 ELSE 0 END), 0)
           AS BIGINT) AS chg_prio,
         CAST(COALESCE(SUM(CASE WHEN o.o_date IS DISTINCT FROM n.o_date
                       THEN 1 ELSE 0 END), 0) AS BIGINT) AS chg_date
  FROM old o JOIN new n USING (o_orderkey)
), long AS (
  SELECT 'o_orderstatus' AS col_name, chg_status AS n_changed, n_rows
  FROM one
  UNION ALL
  SELECT 'o_orderpriority', chg_prio, n_rows FROM one
  UNION ALL
  SELECT 'o_date', chg_date, n_rows FROM one
)
SELECT col_name, n_rows AS n_persisting, n_changed,
       CAST(CASE WHEN n_rows = 0 THEN 0
            ELSE n_changed * 1000000 // n_rows END AS BIGINT) AS churn_ppm
FROM long
"""

EXTENSION_H_CATALOG["snapshot_field_churn"] = (
    x_snapshot_field_churn, SQL_SNAPSHOT_FIELD_CHURN)
