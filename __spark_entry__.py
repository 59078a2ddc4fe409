"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2
(plus the large-scale training-data extensions); ``oracle_sql()`` pairs each
with DuckDB-ANSI SQL over the same parquet tables. Implementations live in
``pdcm_etl_spark/`` — this module only assembles the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full metadata ETL (raw provider modules → entity DAG →
    denormalized search_index) over the synthetic provider workload derived
    from /root/testdata/sf0.001. Fixed column projection → stable schema."""
    from pdcm_etl_spark.plans.synth import run_etl_search_index

    return run_etl_search_index(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdcm_etl_spark.plans.catalog import RELATIONAL_CATALOG

    regs: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (fn, _sql) in RELATIONAL_CATALOG.items():
        regs[name] = fn
    for cat in _optional_catalogs():
        for name, (fn, _sql) in cat.items():
            regs[name] = fn
    return regs


def oracle_sql() -> dict[str, str]:
    from pdcm_etl_spark.plans.catalog import RELATIONAL_CATALOG

    out = {n: sql for n, (fn, sql) in RELATIONAL_CATALOG.items() if sql}
    for cat in _optional_catalogs():
        out.update({n: sql for n, (fn, sql) in cat.items() if sql})
    return out


def _optional_catalogs() -> list[dict]:
    cats = []
    try:
        from pdcm_etl_spark.plans.extensions import EXTENSION_CATALOG

        cats.append(EXTENSION_CATALOG)
    except ImportError:
        pass
    try:
        from pdcm_etl_spark.plans.catalog_extra import EXTRA_CATALOG

        cats.append(EXTRA_CATALOG)
    except ImportError:
        pass
    return cats
