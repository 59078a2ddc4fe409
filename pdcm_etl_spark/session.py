"""SparkSession factory tuned for the engine.

Local test profile: ``local[N]`` single-JVM. The configs below are chosen so
the same code scales to a multi-executor cluster: AQE enabled (runtime
coalescing + skew-join splitting), shuffle partitions sized to cores locally
(a cluster deployment overrides via ``spark_conf``), Arrow enabled for the
pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "pdcm_etl_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults matter at scale:
    - AQE on: runtime partition coalescing, skew-join handling, and
      dynamic join-strategy switching replace hand-tuned shuffle counts.
    - ``spark.sql.session.timeZone=UTC``: deterministic timestamp semantics
      (the correctness oracle compares values).
    - Arrow on: pandas UDF / applyInPandas paths move batches, not rows.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # Every decorated PySpark DataFrame call otherwise makes an EXTRA
        # py4j round trip (PySparkCurrentOrigin.set with the captured
        # Python call site, for error enrichment) plus a stack walk —
        # on the flagship's 60-entity DAG that is thousands of extra
        # driver round trips on the plan-construction critical path
        # (profiled: ~2x the py4j chatter). The engine's errors carry
        # entity names already; trade the call-site decoration away.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # local[32] = 32 concurrent tasks sharing one unified pool, plus
        # the DAG's localCheckpoint blocks live in the same heap — 8g
        # starves execution memory at sf0.1 (UNABLE_TO_ACQUIRE_MEMORY)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # Shuffle/spill codec (guide §2.3): measured r11 on the suite's
        # heaviest shuffler (dedup_prefix_filter, sf0.1): zstd writes
        # 2.2x fewer shuffle bytes (382->174 MB) at equal executor CPU,
        # but local wall is WORSE — local-mode shuffle goes through the
        # page cache at memory bandwidth, so compression CPU is pure
        # overhead. Default stays lz4 (Spark default) locally; a
        # network-shuffling cluster deployment should set
        # SPARK_GRAFT_IO_CODEC=zstd, where 2.2x fewer bytes crossing
        # NICs is the dominant term (guide §1.3 napkin math).
        # NOTE (r12, advisor): spark.io.compression.codec also compresses
        # RDD block storage and broadcasts — including every
        # localCheckpoint block behind the repo's shared()/EntityDag
        # boundaries — so zstd in production recompresses all
        # share-boundary blocks too, a cost the shuffle-only measurement
        # above does not cover; re-measure the flagship (checkpoint-heavy)
        # before flipping it fleet-wide, or scope the change to
        # spark.shuffle.* if only shuffle bytes are intended.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the test-lake parquet tables and register temp views.

    Returns a dict name -> DataFrame. Mirrors the reference's pattern of
    reading every input as parquet (spark_transformation_job.py:6-18) but in
    one app, keeping lineage in memory instead of Luigi's ~60 write/read
    barriers.
    """
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    out = {}
    for n in names:
        path = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(n)
            out[n] = df
    return out
