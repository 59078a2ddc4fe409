"""End-to-end pipeline entry point — the engine's replacement for
``luigi --module etl.workflow.main PdcmEtl``.

Usage (library):
    from pdcm_etl_spark.pipeline import run_pipeline
    entities = run_pipeline(spark, data_dir, output_dir)

Usage (CLI):
    python -m pdcm_etl_spark.pipeline <data_dir> <output_dir> [providers…]

``data_dir`` follows the reference's UPDOG layout: one directory per
provider containing the module TSVs (sources/registry.py patterns) and a
``source.yaml``. Every resolvable entity is written to
``output_dir/<entity>/`` as provider-partitioned parquet, views are
registered, and a release_info CSV is produced. One Spark app, no
per-entity submits, no inter-stage parquet barriers.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession

from pdcm_etl_spark.plans import views as views_mod
from pdcm_etl_spark.plans.dag import build_metadata_dag
from pdcm_etl_spark.sources import registry
from pdcm_etl_spark.sources.release import release_info, write_release_info
from pdcm_etl_spark.sources.sinks import write_entity_parquet
from pdcm_etl_spark.sources.tsv import read_module_tsv
from pdcm_etl_spark.sources.yaml_source import read_yaml_module


def discover_providers(data_dir: str) -> list[str]:
    return sorted(
        d for d in os.listdir(data_dir) if os.path.isdir(os.path.join(data_dir, d))
    )


def extract_raw(
    spark: SparkSession, data_dir: str, providers: list[str]
) -> dict[str, DataFrame]:
    """Config-driven extract: one DataFrame per module across providers
    (ref extractor.py:15-27 + spark_reader.py:111-136)."""
    raw: dict[str, DataFrame] = {}
    for name, mod in registry.MODULES.items():
        if not mod.pattern:
            continue
        if mod.pattern.endswith(".yaml"):
            paths = {
                p: os.path.join(data_dir, mod.pattern.replace("$provider", p))
                for p in providers
            }
            raw[name] = read_yaml_module(spark, paths, mod.columns)
        else:
            paths = [
                os.path.join(data_dir, mod.pattern.replace("$provider", p))
                for p in providers
            ]
            raw[name] = read_module_tsv(spark, paths, mod.columns)
    return raw


def run_pipeline(
    spark: SparkSession,
    data_dir: str,
    output_dir: str | None = None,
    providers: list[str] | None = None,
    release_name: str = "dev-release",
) -> dict[str, DataFrame]:
    providers = providers or discover_providers(data_dir)
    raw = extract_raw(spark, data_dir, providers)
    # drop modules that resolved to empty frames with no rows AND no files
    dag = build_metadata_dag(spark, raw)
    entities = dag.run()

    if output_dir:
        for name, df in entities.items():
            if name.startswith("raw/"):
                continue
            write_entity_parquet(df, os.path.join(output_dir, name))
        write_release_info(
            release_info(spark, release_name, providers),
            os.path.join(output_dir, "release_info"),
        )

    views_mod.register_entities(entities)
    views_mod.create_views(spark)
    return entities


def main(argv: list[str]) -> int:
    from pdcm_etl_spark.session import get_spark

    if len(argv) < 3:
        print("usage: python -m pdcm_etl_spark.pipeline <data_dir> <output_dir> [providers…]")
        return 2
    spark = get_spark("pdcm-etl-pipeline")
    entities = run_pipeline(
        spark, argv[1], argv[2], providers=list(argv[3:]) or None
    )
    for name in sorted(n for n in entities if not n.startswith("raw/")):
        print(name)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
