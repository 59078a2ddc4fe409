"""Ontolia regimen-map scan.

Parity with reference ``etl/workflow/readers/ontolia_reader.py:38-66``:
lines of the form ``NCIT_REGIMEN=NCIT_T1,NCIT_T2`` → rows
``(regimen, treatments)`` where ``treatments`` keeps the comma string
(downstream splits it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_ontolia(spark: SparkSession, path: str) -> DataFrame:
    lines = spark.read.text(path)
    valid = lines.filter(F.col("value").contains("="))
    return valid.select(
        F.trim(F.split("value", "=").getItem(0)).alias("regimen"),
        F.trim(F.split("value", "=").getItem(1)).alias("treatments"),
    ).filter((F.col("regimen") != "") & (F.col("treatments") != ""))
