"""Deterministic sampling operators.

``df.sample()`` draws from a per-partition RNG — resampling changes with
partitioning, retries, and engines, which is poison for reproducible
training-data pipelines. The operators here decide membership from a
portable content hash (first 15 hex chars of md5, the same digest the
dedup family uses), so a row's fate is a pure function of its key:
stable across runs, partitionings, engines (exact DuckDB oracle), and
trivially auditable ("why is this row in the sample?").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdcm_etl_spark.operators.dedup import portable_hash60

BUCKETS = 10_000  # basis-point resolution


def hash_sample(df: DataFrame, key_col: str, rate_bp: int) -> DataFrame:
    """Keep rows whose key hashes into the first ``rate_bp`` of 10000
    buckets — a deterministic ~rate_bp/10000 sample, exact per key."""
    bucket = portable_hash60(F.col(key_col).cast("string")) % BUCKETS
    return df.filter(bucket < rate_bp)


def hash_stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, rates_bp: dict[str, int]
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    rate (basis points); strata absent from ``rates_bp`` are dropped.
    Map-side only — no shuffle, no RNG, scan-parallel at any size."""
    bucket = portable_hash60(F.col(key_col).cast("string")) % BUCKETS
    rate = None
    for stratum, bp in rates_bp.items():
        cond = F.when(F.col(strata_col) == stratum, F.lit(bp))
        rate = cond if rate is None else rate.when(
            F.col(strata_col) == stratum, F.lit(bp)
        )
    rate = (rate.otherwise(F.lit(0)) if rate is not None else F.lit(0))
    return df.filter(bucket < rate)
