"""Release-info sink (ref etl/workflow/reporter.py:24-49): a tiny
(name, date, providers[]) frame written as a single CSV part."""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def release_info(
    spark: SparkSession,
    release_name: str,
    providers: list[str],
    date: datetime.date | None = None,
) -> DataFrame:
    date = date or datetime.date.today()
    from pdcm_etl_spark.functions.local_table import values_table

    df = values_table(
        spark,
        [(release_name, date.isoformat(), sorted(providers))],
        "name string, date string, providers array<string>",
    )
    return df.withColumn("providers", F.to_json("providers"))


def write_release_info(df: DataFrame, path: str) -> None:
    df.coalesce(1).write.option("header", True).mode("overwrite").csv(path)
