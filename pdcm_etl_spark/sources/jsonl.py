"""JSONL corpus ingestion — the raw-document source a training-data
pipeline actually receives (web-crawl / API dumps as newline-delimited
JSON, frequently with malformed lines).

The reference ingests curated TSV/YAML only (SURVEY §2.1); a 100 TB
document lake needs the messier path:

- **declared schema** (never inferred — schema inference reads the whole
  input once before the real scan, doubling I/O at lake scale);
- **PERMISSIVE parse with a corrupt-record column** — a single bad line
  must not kill a 1000-executor job; bad lines are quarantined, counted,
  and auditable instead;
- **line-splittable**: JSONL (unlike a JSON array) splits on newlines, so
  a 1 TB file still parallelizes across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType = DOCUMENT_SCHEMA,
) -> DataFrame:
    """Read newline-delimited JSON with quarantine semantics: returns all
    rows; malformed lines have every declared column null and the raw
    line in ``_corrupt_record``. Split with :func:`split_corrupt`."""
    full = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(paths)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows without the corrupt column;
    quarantined raw lines for audit. Spark requires the parsed frame to be
    materialized-or-referenced beyond the corrupt column alone, so the
    quarantine keeps the full row."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, quarantine


def write_corpus_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "lang",
    sort_col: str = "doc_id",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Layout-governed corpus write: hive-partition by a low-cardinality
    column (language, source, date) and range-sort within partitions by
    the lookup key, so downstream scans get partition pruning AND
    row-group min/max pruning on the sort key. ``maxRecordsPerFile``
    bounds file size without a coalesce (which would throttle write
    parallelism).

    The repartition-by-range + sortWithinPartitions pair is the
    deterministic layout idiom: range partitioning gives globally ordered
    files per partition value, one shuffle total."""
    (
        df.repartitionByRange(F.col(partition_col), F.col(sort_col))
        .sortWithinPartitions(partition_col, sort_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_col)
        .parquet(path)
    )
