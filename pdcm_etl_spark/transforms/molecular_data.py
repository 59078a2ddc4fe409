"""Molecular measurement-data tables + per-model search aggregates.

Parity targets (semantics):
- measurement tables (mutation/cna/expression/biomarker/immunemarker):
  per-type transformer jobs — harmonise symbols against the gene marker
  reference, resolve the molecular_characterization FK on
  (sample_id, platform, provider) (molecular_characterization_fk_assigner
  .py:33-36), keep typed measurement columns.
- per-model aggregates for the search index
  (search_index_molecular_data_transformer_job.py):
  markers-with-data sets (:296-315), MSI status (:233-262, marker_type=
  'Model Genomics' AND marker_name='MSI'), HLA types (:264-291), breast-
  cancer biomarkers (:179-230, ERBB2/ESR1/PGR ± display-name map as a
  when-chain instead of the reference's dict-lookup UDF),
  dataset_available (distinct molchar types with data).

Scale: measurement tables are the 100 TB side. The molchar FK join keys
on (sample, platform, provider) — molchar metadata broadcasts; the gene
reference (~40k) broadcasts into the harmonisation cascade; the only
fact-scale shuffle is the per-model collect_set aggregation, which is
map-side-combined sets of short strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdcm_etl_spark.functions.cleaner import trim_all
from pdcm_etl_spark.functions.ids import hash_id
from pdcm_etl_spark.sources.tsv import PROVIDER_COL

BREAST_CANCER_GENES = ["ERBB2", "ESR1", "PGR"]


def measurement_data(
    raw_df: DataFrame,
    molchar_df: DataFrame,
    harmonised: DataFrame | None = None,
) -> DataFrame:
    """Generic measurement-table builder: attach a stable row id, resolve
    the molecular_characterization FK; ``harmonised`` (output of
    molecular.harmonise_marker_symbols over the same raw rows) replaces
    the raw frame when provided."""
    df = harmonised if harmonised is not None else raw_df
    mc = F.broadcast(
        molchar_df.select(
            F.col("id").alias("molecular_characterization_id"),
            F.col("sample_id"),
            F.col("platform_external_id").alias("platform_id"),
            F.col(PROVIDER_COL),
        )
    )
    out = df.join(mc, on=["sample_id", "platform_id", PROVIDER_COL], how="left")
    # stable fact-scale row id: xxhash64 over the full row (no global sort)
    return out.withColumn("id", hash_id(*out.columns))


def model_molchar(molchar_df: DataFrame) -> DataFrame:
    """(mol_char_id, model_id, molchar_type) lookup used by every
    per-model aggregate."""
    return molchar_df.select(
        F.col("id").alias("mol_char_id"),
        "model_id",
        "molchar_type",
    )


def genes_per_model(
    measurement_df: DataFrame, model_molchar_df: DataFrame, column_name: str,
    symbol_col: str = "hgnc_symbol",
) -> DataFrame:
    """Sorted distinct marker list per model for one data type
    (get_list_genes_per_model, :296-315).

    No pre-dedupe: collect_set dedupes during its map-side partial
    aggregation, so a drop_duplicates first is a full extra
    shuffle+aggregate over fact-scale (mc_id, symbol) rows for nothing
    (profiled at sf0.1: a 914k-row 16.7s HashAggregate in the flagship)."""
    md = measurement_df.select(
        "molecular_characterization_id", F.col(symbol_col).alias("symbol")
    )
    joined = model_molchar_df.join(
        md,
        model_molchar_df.mol_char_id == md.molecular_characterization_id,
        "left",
    )
    return joined.groupBy("model_id").agg(
        F.array_sort(F.collect_set("symbol")).alias(column_name)
    )


def msi_status_per_model(immunemarker_df: DataFrame, model_molchar_df: DataFrame) -> DataFrame:
    im = immunemarker_df.filter(
        (F.col("marker_type") == "Model Genomics") & (F.col("marker_name") == "MSI")
    ).select(
        "molecular_characterization_id", F.col("marker_value").alias("msi_status")
    )
    joined = model_molchar_df.join(
        im, model_molchar_df.mol_char_id == im.molecular_characterization_id, "inner"
    )
    return joined.groupBy("model_id").agg(
        F.array_sort(F.collect_set("msi_status")).alias("msi_status")
    )


def hla_types_per_model(immunemarker_df: DataFrame, model_molchar_df: DataFrame) -> DataFrame:
    im = immunemarker_df.filter(F.col("marker_type") == "HLA type").select(
        "molecular_characterization_id", F.col("marker_name").alias("hla_type")
    )
    joined = model_molchar_df.join(
        im, model_molchar_df.mol_char_id == im.molecular_characterization_id, "inner"
    )
    return joined.groupBy("model_id").agg(
        F.array_sort(F.collect_set("hla_type")).alias("hla_types")
    )


def breast_cancer_biomarkers_per_model(
    biomarker_df: DataFrame, model_molchar_df: DataFrame
) -> DataFrame:
    """'HER2/ERBB2 positive'-style display strings per model. The display
    mapping is a when-chain (the reference uses a dict-lookup UDF,
    :191-196)."""
    display = (
        F.when(F.col("biomarker") == "ERBB2", "HER2/ERBB2")
        .when(F.col("biomarker") == "ESR1", "ER/ESR1")
        .when(F.col("biomarker") == "PGR", "PR/PGR")
        .otherwise(F.col("biomarker"))
    )
    bm = (
        biomarker_df.filter(
            F.col("biomarker").isin(BREAST_CANCER_GENES)
            & F.lower(F.col("biomarker_status")).isin(["positive", "negative"])
        )
        .select(
            "molecular_characterization_id",
            F.concat_ws(
                " ", display, F.lower(F.col("biomarker_status"))
            ).alias("breast_cancer_biomarker"),
        )
        .distinct()
    )
    joined = model_molchar_df.join(
        bm, model_molchar_df.mol_char_id == bm.molecular_characterization_id, "inner"
    )
    return joined.groupBy("model_id").agg(
        F.array_sort(F.collect_set("breast_cancer_biomarker")).alias(
            "breast_cancer_biomarkers"
        )
    )


def dataset_available_per_model(model_molchar_df: DataFrame) -> DataFrame:
    """Sorted set of molecular data types available per model."""
    return model_molchar_df.groupBy("model_id").agg(
        F.array_sort(F.collect_set("molchar_type")).alias("dataset_available")
    )
