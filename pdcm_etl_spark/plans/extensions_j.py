"""Round-11 registry extensions — each a (query, DuckDB-oracle) pair
like plans/extensions.py. Headline: the removal half of Lee et al.
2022 exact-substring dedup (the cleaned corpus, not just the spans)
and banded LSH recall (the round-10 verdict's fix for the
trivially-perfect scalar recall number).

Determinism rules are the repo-wide ones (plans/catalog.py header):
exact integer/ppm arithmetic on every compare path, portable hashes,
bounded outputs, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdcm_etl_spark.operators.dedup import DUCK_H60
from pdcm_etl_spark.plans.extensions import _docs, _sql_dedup_minhash_lsh, _t
from pdcm_etl_spark.plans.extensions_i import SQL_DEDUP_SUBSTRING

EXTENSION_J_CATALOG: dict[str, tuple] = {}

__all__ = ["EXTENSION_J_CATALOG"]

_ = (F, _t)  # shared helpers for entries added through the round


def x_dedup_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaned corpus of Lee et al. 2022 exact-substring dedup
    (operators/dedup.py::substring_scrub): every non-first duplicated
    span (k=16 tokens) cut out of its document, survivors reassembled
    in order — the op a training pipeline runs right before
    tokenization."""
    from pdcm_etl_spark.operators.dedup import substring_scrub

    return substring_scrub(_docs(spark, sf_dir), k=16)


# dup_tokens comes from the span rollup and kept_tokens from the
# independent positional filter — the oracle cross-checks the two
# paths that the Spark side claims agree (disjoint maximal spans).
SQL_DEDUP_SUBSTRING_SCRUB = f"""
WITH spans AS ({SQL_DEDUP_SUBSTRING}),
pd AS (
  SELECT doc_id, SUM(span_tokens) AS dup FROM spans GROUP BY doc_id
), docs AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
), toks AS (
  SELECT doc_id, unnest(ws) AS w, unnest(range(len(ws))) AS pos
  FROM docs
), kept AS (
  SELECT t.doc_id, t.w, t.pos
  FROM toks t
  WHERE NOT EXISTS (
    SELECT 1 FROM spans s
    WHERE s.doc_id = t.doc_id
      AND t.pos BETWEEN s.span_start AND s.span_end)
), k AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
         string_agg(w, ' ' ORDER BY pos) AS kept_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(d.ws) AS BIGINT) AS n_tokens,
       CAST(COALESCE(pd.dup, 0) AS BIGINT) AS dup_tokens,
       CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       COALESCE(k.kept_text, '') AS kept_text
FROM docs d
LEFT JOIN pd USING (doc_id)
LEFT JOIN k USING (doc_id)
"""

EXTENSION_J_CATALOG["dedup_substring_scrub"] = (
    x_dedup_substring_scrub, SQL_DEDUP_SUBSTRING_SCRUB)


def x_dedup_recall_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall stratified by exact-Jaccard band on the sampled
    pipeline (operators/dedup.py::banding_recall_banded, sample_bp=2500
    — the 100 TB shape): the per-band miss rate that the scalar
    recall_ppm hides when replica pairs at J=1.0 dominate the truth
    set. The low bands are where bands/rows tuning actually happens."""
    from pdcm_etl_spark.operators.dedup import banding_recall_banded

    return banding_recall_banded(
        _docs(spark, sf_dir), min_ppm=200_000, sample_bp=2500
    )


def _sql_dedup_recall_banded(sample_bp: int | None = None) -> str:
    where = ""
    if sample_bp is not None:
        h = DUCK_H60.format(col="CAST(doc_id AS VARCHAR)")
        where = f" WHERE ({h}) % 10000 < {sample_bp}"
    return f"""
WITH ws AS (
  SELECT doc_id AS id, string_split(lower(text), ' ') AS w
  FROM documents{where}
), d AS (
  SELECT id, list_distinct(list_transform(
           range(greatest(len(w) - 2, 0)),
           i -> array_to_string(list_slice(w, i + 1, i + 3), ' '))) AS toks
  FROM ws
), p AS (
  SELECT a.id AS id_a, b.id AS id_b,
         len(list_intersect(a.toks, b.toks)) AS i,
         len(a.toks) AS na, len(b.toks) AS nb
  FROM d a JOIN d b ON a.id < b.id
  WHERE len(a.toks) > 0 AND len(b.toks) > 0
), truth AS (
  SELECT id_a, id_b, (i * 1000000) // (na + nb - i) AS j_ppm FROM p
  WHERE (i * 1000000) // (na + nb - i) >= 200000
), found AS (
  SELECT id_a, id_b FROM ({_sql_dedup_minhash_lsh(min_bp=2000, where=where)})
), j AS (
  SELECT CASE WHEN t.j_ppm >= 1000000 THEN 1000000
              WHEN t.j_ppm >= 800000 THEN 800000
              WHEN t.j_ppm >= 500000 THEN 500000
              WHEN t.j_ppm >= 300000 THEN 300000
              ELSE 200000 END AS band_lo_ppm,
         CASE WHEN EXISTS (SELECT 1 FROM found f
                           WHERE f.id_a = t.id_a AND f.id_b = t.id_b)
              THEN 1 ELSE 0 END AS hit
  FROM truth t
)
SELECT CAST(band_lo_ppm AS BIGINT) AS band_lo_ppm,
       CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
       CAST(SUM(hit) AS BIGINT) AS n_hit,
       -- HUGEINT discipline per the repo overflow convention
       CAST(CASE WHEN COUNT(*) = 0 THEN NULL
            ELSE (CAST(SUM(hit) AS HUGEINT) * 1000000) // COUNT(*)
            END AS BIGINT) AS recall_ppm
FROM j GROUP BY band_lo_ppm ORDER BY band_lo_ppm
"""


EXTENSION_J_CATALOG["dedup_recall_banded"] = (
    x_dedup_recall_banded, _sql_dedup_recall_banded(sample_bp=2500))


def x_dedup_substring_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental exact-substring dedup demo: docs with doc_id < 250
    play the already-indexed corpus, the rest are the new ingest batch
    (operators/dedup.py::substring_dedup_incremental — same boundary
    convention as dedup_minhash_incremental). Spans reported for new
    docs only, with the corpus-vs-batch window split."""
    from pdcm_etl_spark.operators.dedup import substring_dedup_incremental

    return substring_dedup_incremental(
        _docs(spark, sf_dir), F.col("doc_id") < 250, k=16
    )


SQL_DEDUP_SUBSTRING_INCREMENTAL = """
WITH ws AS (
  SELECT doc_id AS id, doc_id < 250 AS ex,
         string_split(lower(text), ' ') AS w
  FROM documents
), wins AS (
  SELECT id, ex, i AS pos,
         array_to_string(list_slice(w, i + 1, i + 16), ' ') AS win
  FROM (SELECT id, ex, w, unnest(range(len(w) - 16 + 1)) AS i
        FROM ws WHERE len(w) >= 16)
), dup AS (
  SELECT id, pos, kr FROM (
    SELECT id, pos, ex,
           row_number() OVER w AS rn,
           first_value(CASE WHEN ex THEN 0 ELSE 1 END) OVER w AS kr
    FROM wins
    WINDOW w AS (PARTITION BY win
                 ORDER BY CASE WHEN ex THEN 0 ELSE 1 END, id, pos)
  ) WHERE rn > 1 AND NOT ex
), isl AS (
  SELECT id, pos, kr,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY id ORDER BY pos) < 16
              THEN 0 ELSE 1 END AS brk
  FROM dup
), grp AS (
  SELECT id, pos, kr,
         SUM(brk) OVER (PARTITION BY id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM isl
)
SELECT id AS doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + 15 AS BIGINT) AS span_end,
       CAST(MAX(pos) + 15 - MIN(pos) + 1 AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN kr = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_corpus_windows
FROM grp GROUP BY id, island
"""

EXTENSION_J_CATALOG["dedup_substring_incremental"] = (
    x_dedup_substring_incremental, SQL_DEDUP_SUBSTRING_INCREMENTAL)
