"""Patient-sample cluster: tissue & tumour_type dims + patient_sample.

Parity: tissue_transformer_job / tumour_type_transformer_job (name dims
over sample columns) and patient_sample_transformer_job.py:40-120 —
extract, clean, FK patient (2-key join with provider), tissue FKs for
primary & collection site, tumour_type FK, model name link.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdcm_etl_spark.functions.cleaner import init_cap_and_trim_all, lower_and_trim_all
from pdcm_etl_spark.functions.ids import add_id
from pdcm_etl_spark.functions.joins import transform_to_fk
from pdcm_etl_spark.sources.tsv import PROVIDER_COL


def tissue(raw_sample: DataFrame) -> DataFrame:
    """Distinct lowercased site names from primary + collection site."""
    out = (
        raw_sample.select(lower_and_trim_all("primary_site").alias("name"))
        .unionByName(raw_sample.select(lower_and_trim_all("collection_site").alias("name")))
        .where("name is not null and name != ''")
        .drop_duplicates()
    )
    return add_id(out, "id", key_cols=["name"]).select("id", "name")


def tumour_type(raw_sample: DataFrame) -> DataFrame:
    out = (
        raw_sample.select(init_cap_and_trim_all("tumour_type").alias("name"))
        .where("name is not null and name != ''")
        .drop_duplicates()
    )
    return add_id(out, "id", key_cols=["name"]).select("id", "name")


def patient_sample(
    raw_sample: DataFrame,
    patient_df: DataFrame,
    tissue_df: DataFrame,
    tumour_type_df: DataFrame,
    model_df: DataFrame,
) -> DataFrame:
    ps = (
        raw_sample.select(
            "diagnosis",
            F.col("sample_id").alias("external_patient_sample_id"),
            "grade", "grading_system", "stage", "staging_system",
            F.lower(F.col("primary_site")).alias("primary_site"),
            F.lower(F.col("collection_site")).alias("collection_site"),
            init_cap_and_trim_all("treated_prior_to_collection").alias("prior_treatment"),
            init_cap_and_trim_all("tumour_type").alias("tumour_type"),
            F.col("patient_id").alias("external_patient_id"),
            "age_in_years_at_collection", "collection_event", "collection_date",
            "collection_method", "months_since_collection_1",
            "gene_mutation_status", "treatment_naive_at_collection",
            "treated_at_collection", "response_to_treatment",
            "virology_status", "sharable",
            F.col("model_id").alias("model_name"),
            F.col(PROVIDER_COL),
        )
        .where("external_patient_sample_id is not null")
        .drop_duplicates()
    )

    pat = patient_df.select(
        F.col("id").alias("patient_id"), "external_patient_id", PROVIDER_COL
    )
    ps = ps.join(F.broadcast(pat), on=["external_patient_id", PROVIDER_COL], how="left")

    ps = transform_to_fk(ps, tissue_df, "primary_site", "name", "id", "primary_site_id")
    ps = transform_to_fk(ps, tissue_df, "collection_site", "name", "id", "collection_site_id")
    ps = transform_to_fk(ps, tumour_type_df, "tumour_type", "name", "id", "tumour_type_id")

    mdl = model_df.select(
        F.col("id").alias("model_id"),
        F.col("external_model_id").alias("model_name"),
        PROVIDER_COL,
    )
    ps = ps.join(F.broadcast(mdl), on=["model_name", PROVIDER_COL], how="left")
    return add_id(ps, "id", key_cols=["external_patient_sample_id", PROVIDER_COL])
