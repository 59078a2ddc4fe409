"""Column-availability profiling.

Parity: available_molecular_data_columns_transformer_job.py:151-174 — per
(data_source, molecular table), which columns actually contain data. The
reference aggregates not-null counts then loops driver-side over collected
rows to build the output; here the pivot to (provider, table, column list)
is a pure DataFrame pass: one agg per table, no driver loop over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdcm_etl_spark.sources.tsv import PROVIDER_COL


def available_columns(df: DataFrame, table_name: str, skip: list[str] | None = None) -> DataFrame:
    """(data_source, molecular_characterization_type=table_name,
    available_columns: sorted array of columns with ≥1 non-null value)."""
    skip = set(skip or [PROVIDER_COL])
    cols = [c for c in df.columns if c not in skip]
    counts = df.groupBy(PROVIDER_COL).agg(
        *[F.sum(F.col(c).isNotNull().cast("long")).alias(c) for c in cols]
    )
    pairs = F.array(
        *[F.struct(F.lit(c).alias("name"), F.col(c).alias("n")) for c in cols]
    )
    return counts.select(
        F.col(PROVIDER_COL).alias("data_source"),
        F.lit(table_name).alias("molecular_characterization_type"),
        F.array_sort(
            F.transform(
                F.filter(pairs, lambda p: p["n"] > 0), lambda p: p["name"]
            )
        ).alias("available_columns"),
    )


def available_columns_all(tables: dict[str, DataFrame]) -> DataFrame:
    """Union of availability rows over every molecular table."""
    out = None
    for name, df in tables.items():
        part = available_columns(df, name)
        out = part if out is None else out.unionByName(part)
    return out
