"""Patient cluster entities.

Parity: patient_transformer_job.py:36-72 (clean → FK ethnicity → FK
provider_group → external id), patient_sample + patient_snapshot in later
slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdcm_etl_spark.functions.cleaner import init_cap_and_trim_all
from pdcm_etl_spark.functions.ids import add_id
from pdcm_etl_spark.sources.tsv import PROVIDER_COL


def patient(
    raw_patient: DataFrame, ethnicity_df: DataFrame, provider_group_df: DataFrame
) -> DataFrame:
    """One row per patient with ethnicity_id / provider_group_id resolved.

    Scale: both dims broadcast; the patient fact never shuffles for FK
    resolution. Rows lacking patient_id are dropped (ref 'temporary fix',
    patient_transformer_job.py:31-33 — kept as a permanent rule here).
    """
    p = raw_patient.withColumn(
        "patient_ethnicity", init_cap_and_trim_all("ethnicity")
    ).drop("ethnicity").drop_duplicates()

    eth = F.broadcast(
        ethnicity_df.select(
            F.col("id").alias("ethnicity_id"), F.col("name").alias("patient_ethnicity")
        )
    )
    pg = F.broadcast(
        provider_group_df.select(
            F.col("id").alias("provider_group_id"), F.col(PROVIDER_COL)
        )
    )
    out = (
        p.join(eth, "patient_ethnicity", "left")
        .join(pg, PROVIDER_COL, "left")
        .withColumnRenamed("patient_id", "external_patient_id")
        .where("external_patient_id is not null")
    )
    out = add_id(out, "id", key_cols=["external_patient_id", PROVIDER_COL], fact=True)
    # lifestyle/category passthroughs only exist in newer provider
    # submissions (entities_registry PATIENT_ENTITY columns)
    for opt in ("age_category", "smoking_status", "alcohol_status",
                "alcohol_frequency", "family_history_of_cancer"):
        if opt not in out.columns:
            out = out.withColumn(opt, F.lit(None).cast("string"))
    return out.select(
        "id",
        "external_patient_id",
        "sex",
        "history",
        "ethnicity_id",
        "ethnicity_assessment_method",
        "initial_diagnosis",
        "age_at_initial_diagnosis",
        "age_category",
        "smoking_status",
        "alcohol_status",
        "alcohol_frequency",
        "family_history_of_cancer",
        "provider_group_id",
        PROVIDER_COL,
    )
