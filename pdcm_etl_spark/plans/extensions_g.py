"""Round-8 session-4 registry extensions — each a (query, DuckDB-oracle)
pair like plans/extensions.py: label-vs-detector language confusion,
duplicate-cluster histogram, deterministic class balancing, field-wise
survivorship merge, and the decile migration matrix.

Determinism rules are the repo-wide ones (plans/catalog.py header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdcm_etl_spark.operators import dedup
from pdcm_etl_spark.plans.extensions import _t

EXTENSION_G_CATALOG: dict[str, tuple] = {}

_H60_DOCID = dedup.DUCK_H60.format(col="CAST(doc_id AS VARCHAR)")

_FP = (
    "md5(array_to_string(list_sort(list_distinct("
    "string_split(lower(text), ' '))), ' '))"
)


def x_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language confusion matrix with per-declared
    shares (operators/text.py::lang_confusion) — the label-quality
    audit before trusting language-filtered training mixes."""
    from pdcm_etl_spark.operators.text import lang_confusion

    return lang_confusion(_t(spark, sf_dir, "documents"))


SQL_LANG_CONFUSION = """
WITH base AS (
  SELECT lang, string_split(lower(text), ' ') AS w FROM documents
), scored AS (
  SELECT lang AS declared_lang,
    CAST(len(list_filter(w, x -> x IN ('the','a','of','and','is')))
         AS BIGINT) AS s_en,
    CAST(len(list_filter(w, x -> x IN ('der','die','und','das','ist')))
         AS BIGINT) AS s_de,
    CAST(len(list_filter(w, x -> x IN ('le','la','et','les','est')))
         AS BIGINT) AS s_fr,
    CAST(len(list_filter(w, x -> x IN ('el','los','y','una','es')))
         AS BIGINT) AS s_es
  FROM base
), pred AS (
  SELECT declared_lang,
    CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
           THEN 'en'
         WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_es THEN 'de'
         WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
         WHEN s_es > 0 THEN 'es'
         ELSE 'unknown' END AS detected_lang
  FROM scored
), cells AS (
  SELECT declared_lang, detected_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM pred GROUP BY 1, 2
)
SELECT declared_lang, detected_lang, n_docs,
       CAST((CAST(n_docs AS HUGEINT) * 1000000)
            // SUM(n_docs) OVER (PARTITION BY declared_lang)
            AS BIGINT) AS share_ppm
FROM cells
"""

EXTENSION_G_CATALOG["lang_confusion"] = (x_lang_confusion, SQL_LANG_CONFUSION)


def x_dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram over content fingerprints
    (operators/text.py::dup_cluster_histogram) — the corpus-health
    one-pager behind the dedup family."""
    from pdcm_etl_spark.operators.text import dup_cluster_histogram

    return dup_cluster_histogram(_t(spark, sf_dir, "documents"))


SQL_DUP_CLUSTER_HISTOGRAM = f"""
WITH f AS (
  SELECT {_FP} AS fp FROM documents
), sizes AS (
  SELECT fp, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM f GROUP BY 1
)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs
FROM sizes GROUP BY 1
"""

EXTENSION_G_CATALOG["dup_cluster_histogram"] = (
    x_dup_cluster_histogram, SQL_DUP_CLUSTER_HISTOGRAM)


def x_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic class balancing of documents by language
    (operators/sampling.py::balanced_downsample): every language keeps
    its first-k docs by portable hash, k = smallest class size."""
    from pdcm_etl_spark.operators.sampling import balanced_downsample

    return balanced_downsample(
        _t(spark, sf_dir, "documents"), class_col="lang", key_col="doc_id"
    )


SQL_BALANCED_DOWNSAMPLE = f"""
WITH base AS (
  SELECT lang AS class, doc_id AS key, ({_H60_DOCID}) AS h
  FROM documents WHERE lang IS NOT NULL
), k AS (
  SELECT MIN(n) AS k
  FROM (SELECT COUNT(*) AS n FROM base GROUP BY class)
), ranked AS (
  SELECT class, key,
         ROW_NUMBER() OVER (PARTITION BY class ORDER BY h, key) AS rn
  FROM base
)
SELECT class, key FROM ranked, k WHERE rn <= k
"""

EXTENSION_G_CATALOG["balanced_downsample"] = (
    x_balanced_downsample, SQL_BALANCED_DOWNSAMPLE)


def x_golden_record_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-wise survivorship merge of exact-content clusters
    (operators/dedup.py::golden_record_merge): min-id anchor, longest
    text, modal attribute, summed provenance — two stacked hash aggs,
    no windows, no joins."""
    from pdcm_etl_spark.operators.dedup import golden_record_merge

    docs = _t(spark, sf_dir, "documents").withColumn(
        "lang", F.coalesce(F.col("lang"), F.lit(""))
    )
    return golden_record_merge(docs)


SQL_GOLDEN_RECORD_MERGE = f"""
WITH t AS (
  SELECT {_FP} AS fingerprint,
         doc_id AS id, COALESCE(lang, '') AS attr,
         CAST(length(text) AS BIGINT) AS len
  FROM documents
), pre AS (
  SELECT fingerprint, attr, CAST(COUNT(*) AS BIGINT) AS cnt,
         MIN(id) AS min_id,
         MIN({{'nl': -len, 'i': id}}) AS best,
         CAST(SUM(CAST(len AS HUGEINT)) AS HUGEINT) AS chars
  FROM t GROUP BY 1, 2
)
SELECT fingerprint,
       CAST(SUM(cnt) AS BIGINT) AS n_docs,
       MIN(min_id) AS golden_id,
       (MIN(best)).i AS best_text_id,
       CAST(-((MIN(best)).nl) AS BIGINT) AS best_text_len,
       (MIN({{'nc': -cnt, 'v': attr}})).v AS attr_mode,
       CAST(SUM(chars) AS BIGINT) AS total_chars
FROM pre GROUP BY 1
"""

EXTENSION_G_CATALOG["golden_record_merge"] = (
    x_golden_record_merge, SQL_GOLDEN_RECORD_MERGE)


def x_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type decile migration of user value between the first
    and second half of January (operators/ml.py::decile_migration) —
    who moved between value deciles across periods."""
    from pdcm_etl_spark.operators.ml import decile_migration
    from pdcm_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir)
    return decile_migration(
        ev,
        key_col="event_type",
        id_col="user_id",
        value_micro=(F.col("value").cast("decimal(18,6)") * 1000000).cast(
            "bigint"
        ),
        period_b_pred=F.col("ts") >= F.lit("2024-01-16"),
    )


SQL_DECILE_MIGRATION = """
WITH rows_ AS (
  SELECT event_type AS key, user_id AS id,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v,
         CASE WHEN ts >= '2024-01-16' THEN 1 ELSE 0 END AS b
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
), per AS (
  SELECT key, id,
         SUM(CASE WHEN b = 0 THEN CAST(v AS HUGEINT) END) AS va,
         SUM(CASE WHEN b = 1 THEN CAST(v AS HUGEINT) END) AS vb
  FROM rows_ GROUP BY 1, 2
), both_p AS (
  SELECT * FROM per WHERE va IS NOT NULL AND vb IS NOT NULL
), ranked AS (
  SELECT key,
         CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY va, id)
              AS BIGINT) AS ra,
         CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY vb, id)
              AS BIGINT) AS rb,
         CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n
  FROM both_p
)
SELECT key, CAST(((ra - 1) * 10) // n AS INTEGER) + 1 AS decile_a,
       CAST(((rb - 1) * 10) // n AS INTEGER) + 1 AS decile_b,
       CAST(COUNT(*) AS BIGINT) AS n_entities
FROM ranked GROUP BY 1, 2, 3
"""

EXTENSION_G_CATALOG["decile_migration"] = (
    x_decile_migration, SQL_DECILE_MIGRATION)
