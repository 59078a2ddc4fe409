"""Sink layer: parquet lake writes + the Postgres-COPY-shaped TSV export.

Parity targets (semantics):
- array flatten to Postgres literals '{a,b}' with string elements quoted
  (dataframe_functions.py:66-81)
- null → '' (booleans → false), newline → literal \\n
  (parquet_to_tsv_converter.py:40-85, cleaner.py:29-35) — the reference
  does this twice, once in a Python UDF and once via regexp_replace; only
  the column expression survives here (no Python in the export path)
- tab-separated CSV with a NUL quote char (i.e. effectively unquoted)

The parquet writer partitions by provider (``data_source_tmp``) — the lake
layout that makes per-provider reprocessing a partition-pruned scan at
100 TB (SURVEY §4 partitioning row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdcm_etl_spark.functions.cleaner import null_values_to_empty_string
from pdcm_etl_spark.sources.tsv import PROVIDER_COL


def flatten_array_columns(df: DataFrame) -> DataFrame:
    """array<...> → '{a,b}' literal; string elements get double quotes;
    empty/null arrays → null (ref dataframe_functions.py:66-81)."""
    for field in df.schema.fields:
        if not isinstance(field.dataType, T.ArrayType):
            continue
        c = field.name
        elems = F.col(c)
        if isinstance(field.dataType.elementType, T.StringType):
            elems = F.transform(F.col(c), lambda v: F.concat(F.lit('"'), v, F.lit('"')))
        df = df.withColumn(
            c,
            F.when(
                F.col(c).isNotNull() & (F.size(F.col(c)) > 0),
                F.concat(F.lit("{"), F.array_join(elems, ","), F.lit("}")),
            ).otherwise(F.lit(None).cast("string")),
        )
    return df


def escape_newlines(df: DataFrame) -> DataFrame:
    r"""Literal \n so the COPY-style TSV stays one-row-per-line."""
    return df.select(
        *[
            F.regexp_replace(F.col(f.name), "\n", r"\\n").alias(f.name)
            if isinstance(f.dataType, T.StringType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def to_export_frame(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Full export normalization pipeline (drop provenance, flatten arrays,
    null→'', escape newlines) without the write — unit-testable."""
    out = df.drop(PROVIDER_COL)
    out = flatten_array_columns(out)
    if columns:
        out = out.select(columns)
    out = null_values_to_empty_string(out)
    return escape_newlines(out)


def write_tsv(df: DataFrame, path: str, columns: list[str] | None = None) -> None:
    """COPY-compatible TSV (tab sep, NUL quote = unquoted, header)."""
    (
        to_export_frame(df, columns)
        .write.option("sep", "\t")
        .option("quote", "\u0000")
        .option("header", True)
        .mode("overwrite")
        .csv(path)
    )


def write_entity_parquet(
    df: DataFrame, path: str, partition_by_provider: bool = True
) -> None:
    """Lake write; provider partitioning → partition-pruned reprocessing."""
    writer = df.write.mode("overwrite")
    if partition_by_provider and PROVIDER_COL in df.columns:
        writer = writer.partitionBy(PROVIDER_COL)
    writer.parquet(path)

def write_entity_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed + sorted table write — the 100 TB design point for the
    large molecular tables (SURVEY §4: bucket/sort by
    molecular_characterization_id).

    Two tables bucketed on the same key with the same bucket count join
    without a shuffle (SortMergeJoin over pre-bucketed scans — no
    Exchange in the plan), so the fact⋈fact joins the search layer runs
    repeatedly pay the shuffle once at write time, not once per query.
    Bucketing requires the session catalog (``saveAsTable``); plain
    ``.parquet()`` writes cannot carry bucket metadata.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str | None = None,
    properties: dict | None = None,
    batchsize: int = 10_000,
) -> None:
    """DB load path — the engine-side form of the reference's
    truncate + COPY loader (database_manager.py:16-30,122-136). Rows go
    through the same export normalization (arrays → '{a,b}' literals,
    null → '', newline escape) and then partition-parallel JDBC batch
    inserts; the COPY-from-CSV fast path stays available via write_tsv +
    an external COPY for engines where bulk-load beats INSERT."""
    out = to_export_frame(df)
    props = {"batchsize": str(batchsize), **(properties or {})}
    if driver:
        props["driver"] = driver
    out.write.jdbc(url=url, table=table, mode=mode, properties=props)


def read_jdbc(spark, url: str, table: str, driver: str | None = None,
              properties: dict | None = None) -> DataFrame:
    props = dict(properties or {})
    if driver:
        props["driver"] = driver
    return spark.read.jdbc(url=url, table=table, properties=props)
