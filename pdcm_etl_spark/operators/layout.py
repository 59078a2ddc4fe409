"""Data-layout operators — how 100 TB gets ORGANIZED so queries can skip
most of it.

Z-ordering (Morton curve) interleaves the bits of two clustering keys so
rows close in EITHER dimension land in the same file. A file then has
tight min/max ranges on BOTH columns at once, and any engine that prunes
on footer statistics (Spark parquet filter pushdown, Delta/Iceberg data
skipping) can skip files for predicates on either key — the thing a
single-column sort gives you for only one key.

Everything here is map-side arithmetic (bit ops in whole-stage codegen)
plus one statistics aggregation; the actual write would be
``df.repartitionByRange(F.col("zval")).write...`` — range-partitioning on
the z-value is Spark's scalable distributed sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def morton_expr(x_col: str, y_col: str, bits: int) -> str:
    """Spark SQL expression interleaving the low ``bits`` bits of two
    non-negative integer columns: x takes even bit positions, y odd.
    Pure bit arithmetic — codegen'd, map-side; the '+' is exact because
    every term occupies a distinct bit."""
    terms = []
    for i in range(bits):
        terms.append(f"(shiftleft((shiftright({x_col}, {i}) & 1), {2 * i}))")
        terms.append(f"(shiftleft((shiftright({y_col}, {i}) & 1), {2 * i + 1}))")
    return " + ".join(terms)


def zorder_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 10,
    n_files: int = 64,
) -> DataFrame:
    """Assign every row to a z-ordered file and emit the per-file footer
    statistics a skipping engine would use: row count and min/max of
    both clustering keys (plus the z-range).

    File assignment is ``zval div width`` — fixed-width z-ranges, so the
    whole layout decision is MAP-SIDE (no global sort; a physical writer
    would instead ``repartitionByRange(zval)`` for balanced files — same
    pruning behavior, one scalable range shuffle). The only shuffle here
    is the final per-file statistics aggregation (n_files groups,
    map-side combined).

    Inputs must be non-negative integers; they are masked to ``bits``
    bits (the caller picks the bucketing, e.g. ``user_id % 1024``).

    Returns (file_id, n_rows, x_min, x_max, y_min, y_max, z_min, z_max)
    — the demo of WHY z-order: both dimensions' per-file ranges are
    tight, where a single-key sort leaves the other dimension's range
    spanning the whole domain.
    """
    mask = (1 << bits) - 1
    width = max(1, (1 << (2 * bits)) // n_files)
    base = (
        df.withColumn("__zx", F.expr(f"cast({x_col} & {mask} as bigint)"))
        .withColumn("__zy", F.expr(f"cast({y_col} & {mask} as bigint)"))
        .withColumn("zval", F.expr(morton_expr("__zx", "__zy", bits)))
        .withColumn("file_id", F.expr(f"zval div {width}").cast("int"))
    )
    return (
        base.groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__zx").alias("x_min"),
            F.max("__zx").alias("x_max"),
            F.min("__zy").alias("y_min"),
            F.max("__zy").alias("y_max"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
    )


def bucketize(
    df: DataFrame,
    key: str,
    n_buckets: int,
    table_name: str,
    path: str,
) -> DataFrame:
    """Write ``df`` as a bucketed parquet table and read it back.

    Bucketing is Spark's persistent co-partitioning: rows are hashed on
    ``key`` into ``n_buckets`` files per write task, and the catalog
    remembers it, so every later join or aggregation keyed on ``key``
    between same-bucket-count tables plans with ZERO Exchange — the
    shuffle is paid once at layout time, not per query. At 100 TB this
    is the difference between re-shuffling fact tables on every join
    and reading co-located buckets; ``n_buckets`` should be sized so a
    bucket of the biggest table fits an executor core (thousands for a
    real lake — the same knob as shuffle partitions, but durable).

    Writes with mode=overwrite to a STABLE path + table name (re-runs
    replace, nothing accumulates) and sorts within buckets so merge
    joins skip their sort too.
    """
    spark = df.sparkSession
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table_name)
    )
    return spark.table(table_name)


def partition_layout(df: DataFrame, part_col: str, path: str) -> DataFrame:
    """Write ``df`` hive-partitioned on ``part_col`` and read it back.

    Directory-per-value layout is the third leg of the skipping story
    (bucketing = co-located joins, z-order = two-key file stats,
    partitioning = whole-directory pruning): a predicate on the
    partition column never touches excluded directories — at 100 TB a
    one-week query over a year-partitioned event lake lists ~2% of the
    files and reads zero bytes of the rest, entirely at PLANNING time
    (``PartitionFilters`` on the scan, before any task launches).

    Rows are repartitioned ON the partition column first so each
    value's rows arrive at one write task → one file per directory.
    Without it every write task emits a file into every directory
    (tasks × partitions small files — the classic 100 TB lake killer).
    A value so hot its single task spills should instead use
    ``repartition(part_col, salt)`` for a files-per-partition budget;
    day-grain event data is uniform enough that one file per day at
    test scale (and size-split files at lake scale) is the right shape.
    """
    df.repartition(F.col(part_col)).write.mode("overwrite").partitionBy(
        part_col
    ).parquet(path)
    return df.sparkSession.read.parquet(path)
