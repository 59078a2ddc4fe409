"""Imaging cluster + config-as-table restriction entity.

Parity targets (semantics, not code):
- image_study:  image_study_transformer_job.py:26-29 (id over raw rows)
- model_image:  model_image_transformer_job.py:32-48 (dedup + model FK on
  (external_model_id, provider) + id)
- model_images JSON aggregate: model_metadata_transformer_job.py:192-216 —
  the reference strips embedded double-quotes with a regexp before string-
  building JSON; we emit canonical to_json(collect_list(struct(...))) so
  no quote surgery is needed (SURVEY §1.2: compare parsed).
- molecular_data_restriction:
  molecular_data_restriction_transformer_job.py:32-44 — a provider→
  restricted-table config dict materialized as a two-column table.

Scale: image binaries never enter these tables — only URLs + typed
metadata (the multimodal operators in operators/multimodal.py handle
payloads). model_image joins the model spine on a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdcm_etl_spark.functions.ids import add_id
from pdcm_etl_spark.sources.tsv import PROVIDER_COL


def image_study(raw_image_study: DataFrame) -> DataFrame:
    out = raw_image_study.drop_duplicates()
    return add_id(out, "id", key_cols=["study_id", PROVIDER_COL], fact=True)


def model_image(raw_model_image: DataFrame, initial_model_df: DataFrame) -> DataFrame:
    """Images per model with the model FK resolved; rows whose model is
    unknown are dropped (the reference's inner join)."""
    imgs = raw_model_image.drop_duplicates().withColumnRenamed(
        "model_id", "external_model_id"
    )
    models = F.broadcast(
        initial_model_df.select(
            F.col("id").alias("model_id"), "external_model_id", PROVIDER_COL
        )
    )
    out = imgs.join(models, on=["external_model_id", PROVIDER_COL], how="inner")
    return add_id(out, "id", key_cols=["external_model_id", "url", PROVIDER_COL], fact=True)


def model_images_json(model_image_df: DataFrame) -> DataFrame:
    """Per-model JSON array of image records for model_metadata."""
    entries = F.array_sort(
        F.collect_list(
            F.struct(
                "url", "description", "sample_type",
                "passage", "magnification", "staining",
            )
        )
    )
    return model_image_df.groupBy("model_id").agg(
        F.to_json(entries).alias("model_images")
    )


# the reference ships this provider→restricted-tables map as a Luigi
# parameter (luigi_template.cfg:12); it is configuration, not data
DEFAULT_RESTRICTIONS: dict[str, list[str]] = {
    "CRL": [
        "cna_molecular_data",
        "biomarker_molecular_data",
        "mutation_measurement_data",
        "expression_molecular_data",
    ],
}


def molecular_data_restriction(
    spark: SparkSession, restrictions: dict[str, list[str]] | None = None
) -> DataFrame:
    """Config dict → (data_source, molecular_data_table) rows."""
    conf = DEFAULT_RESTRICTIONS if restrictions is None else restrictions
    rows = [(p, t) for p, tables in conf.items() for t in tables]
    from pdcm_etl_spark.functions.local_table import values_table

    return values_table(
        spark, rows, "data_source string, molecular_data_table string"
    ).where("data_source is not null")
