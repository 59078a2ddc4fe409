"""YAML source scan.

Parity: spark_reader.py:145-192 — per-provider ``source.yaml`` parsed into
rows, declared columns selected, one DataFrame across providers.

The reference serializes each YAML to JSON and round-trips through
``spark.read.json(parallelize(...))`` per provider, then unions. Provider
YAMLs are tiny config files, so we parse driver-side (bounded: one file
per provider) into a single ``createDataFrame`` — no per-provider union
chain, one partitionable frame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pdcm_etl_spark.sources.tsv import PROVIDER_COL, string_schema


def read_yaml_module(
    spark: SparkSession,
    paths_by_provider: dict[str, str],
    columns: list[str],
) -> DataFrame:
    """provider → yaml path; returns an all-string DataFrame with declared
    ``columns`` + provenance, tolerant of missing files/keys."""
    try:
        import yaml
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("pyyaml is required for YAML sources") from e

    rows = []
    for provider, path in sorted(paths_by_provider.items()):
        if not os.path.exists(path):
            continue
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        docs = data if isinstance(data, list) else [data]
        for doc in docs:
            rows.append(
                tuple(_as_str(doc.get(c)) for c in columns) + (provider,)
            )
    from pdcm_etl_spark.functions.local_table import values_table

    schema = string_schema(list(columns) + [PROVIDER_COL])
    return values_table(spark, rows, schema)


def _as_str(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, (list, tuple)):
        return ",".join(str(x) for x in v)
    return str(v)
