"""TSV module scan.

Parity with reference ``etl/workflow/spark_reader.py:24-62``:
- explicit all-``StringType`` schema (``:24-28``) — typing happens downstream,
- drop ``#``-comment rows in the first declared column (``:31-37``),
- trim column names (``:40-44``),
- attach provider provenance from the file path (``:54-57``) via
  ``input_file_name()`` + ``regexp_extract``,
- missing-file tolerance → empty DataFrame with the declared schema
  (``:95-107``).

Scale posture: one ``spark.read.csv`` over a path *list* (not a driver loop
of unions); provenance derived per-row from ``input_file_name()`` so a
million files still form one scan. At lake scale, prefer writing the raw
zone partitioned by ``data_source`` so downstream filters partition-prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROVIDER_COL = "data_source_tmp"
# provider dir layout mirrors the reference: .../<root>/<PROVIDER>/<file>.tsv
_PROVIDER_PATTERN = r".*/([^/]+)/[^/]+$"


def string_schema(columns: list[str]) -> T.StructType:
    """All-string schema (ref spark_reader.py:24-28)."""
    return T.StructType([T.StructField(c, T.StringType(), True) for c in columns])


def read_module_tsv(
    spark: SparkSession,
    paths: list[str],
    columns: list[str],
    provider_pattern: str = _PROVIDER_PATTERN,
) -> DataFrame:
    """Read a module's TSV files into one all-string DataFrame.

    Returns an empty DataFrame with the declared schema (+provenance col)
    when no path exists (ref spark_reader.py:95-107).
    """
    from pdcm_etl_spark.functions.local_table import values_table

    schema = string_schema(columns)
    empty = values_table(spark, [], schema).withColumn(
        PROVIDER_COL, F.lit(None).cast("string")
    )
    existing = _existing(spark, paths)
    if not existing:
        return empty

    df = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(existing)
    )
    first = columns[0]
    df = df.filter(~F.coalesce(F.col(first), F.lit("")).startswith("#"))
    df = df.select([F.col(c).alias(c.strip()) for c in df.columns])
    return df.withColumn(
        PROVIDER_COL, F.regexp_extract(F.input_file_name(), provider_pattern, 1)
    )


def _existing(spark: SparkSession, paths: list[str]) -> list[str]:
    """Filter to paths that resolve (glob-aware) on the session's filesystem."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    out = []
    for p in paths:
        try:
            hpath = jvm.org.apache.hadoop.fs.Path(p)
            fs = hpath.getFileSystem(conf)
            matches = fs.globStatus(hpath)
            if matches is not None and len(matches) > 0:
                out.append(p)
        except Exception:
            continue
    return out
