"""model_metadata — the per-model record with nested JSON aggregate columns
(model_metadata_transformer_job.py:100-233).

The reference assembles these JSON arrays by string concatenation
(``concat(lit("{"), lit("\"k\": "), col(...) ...)``, :137-216) — fragile
(unescaped quotes, a regexp hack for ``""`` in image descriptions). We use
``to_json(collect_list(struct(...)))`` — canonical, escaped, and the
struct fields keep the reference's key names, so consumers parse the same
records (SURVEY §1.2: compare parsed, not byte-level).

Scale: each aggregate is a map-side-combined groupBy on model_id followed
by a left join onto the model spine; aggregates are per-model (small) so
AQE broadcasts them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _json_per_model(
    df: DataFrame, model_key: str, out_name: str, fields: list
) -> DataFrame:
    """groupBy model → JSON array string of struct rows (ordered
    deterministically by all fields, unlike the reference's
    collect_list order)."""
    entries = F.array_sort(F.collect_list(F.struct(*fields)))
    return (
        df.groupBy(F.col(model_key).alias("model_id"))
        .agg(F.to_json(entries).alias(out_name))
    )


def quality_assurance_json(quality_assurance_df: DataFrame) -> DataFrame:
    """:137-162 — per-model JSON array of validation records."""
    return _json_per_model(
        quality_assurance_df,
        "model_id",
        "quality_assurance",
        [
            "validation_technique", "description", "passages_tested",
            "validation_host_strain_nomenclature", "morphological_features",
            "SNP_analysis", "STR_analysis", "tumour_status", "model_purity",
        ],
    )


def xenograft_specimens_json(
    xenograft_model_specimen_df: DataFrame,
    host_strain_df: DataFrame,
    engraftment_site_df: DataFrame,
    engraftment_type_df: DataFrame,
    engraftment_sample_type_df: DataFrame,
    engraftment_sample_state_df: DataFrame,
) -> DataFrame:
    """:164-189 — per-model JSON array of specimen records. Our specimen
    entity carries dim FKs; the display names are resolved back through
    broadcast dim joins before serialization."""
    sp = xenograft_model_specimen_df

    def _name(dim: DataFrame, fk: str, alias: str) -> DataFrame:
        return F.broadcast(dim.select(F.col("id").alias(fk), F.col("name").alias(alias)))

    hs = F.broadcast(
        host_strain_df.select(
            F.col("id").alias("host_strain_id"),
            F.col("name").alias("host_strain_name"),
        )
    )
    sp = (
        sp.join(hs, "host_strain_id", "left")
        .join(_name(engraftment_site_df, "engraftment_site_id", "engraftment_site"),
              "engraftment_site_id", "left")
        .join(_name(engraftment_type_df, "engraftment_type_id", "engraftment_type"),
              "engraftment_type_id", "left")
        .join(_name(engraftment_sample_type_df, "engraftment_sample_type_id",
                    "engraftment_sample_type"), "engraftment_sample_type_id", "left")
        .join(_name(engraftment_sample_state_df, "engraftment_sample_state_id",
                    "engraftment_sample_state"), "engraftment_sample_state_id", "left")
    )
    return _json_per_model(
        sp,
        "model_id",
        "xenograft_model_specimens",
        [
            "host_strain_name", "host_strain_nomenclature", "engraftment_site",
            "engraftment_type", "engraftment_sample_type",
            "engraftment_sample_state", "passage_number",
        ],
    )


def publications_json(initial_model_df: DataFrame) -> DataFrame:
    """(model_id, pdx_model_publications) — JSON array of the model's
    PubMed ids. The reference enriches these with EuropePMC titles via
    HTTP (search_index pdx_model_publications); the lookup is an offline
    concern — here each entry carries the id, and an enrichment table can
    be joined in when available."""
    pubs = initial_model_df.select(
        F.col("id").alias("model_id"), "publications"
    ).where("publications is not null and trim(publications) != ''")
    entry = F.transform(
        F.split("publications", ","),
        lambda p: F.struct(F.trim(p).alias("pub_med_id")),
    )
    return pubs.select(
        "model_id", F.to_json(F.array_sort(entry)).alias("pdx_model_publications")
    )


def dataset_available(molchar_types_per_model: DataFrame) -> DataFrame:
    """:219-245 — distinct molecular characterisation types per model with
    the display renames (biomarker → 'bio markers', immunemarker →
    'immune markers')."""
    renamed = molchar_types_per_model.withColumn(
        "molchar_type",
        F.when(F.col("molchar_type") == "biomarker", "bio markers")
        .when(F.col("molchar_type") == "immunemarker", "immune markers")
        .otherwise(F.col("molchar_type")),
    )
    return (
        renamed.groupBy("model_id")
        .agg(F.array_sort(F.collect_set("molchar_type")).alias("dataset_available"))
    )


def model_metadata(
    model_df: DataFrame,
    aggregates: list[DataFrame],
) -> DataFrame:
    """Model spine (:100-133) left-joined with each per-model JSON/array
    aggregate. Models with no QA/specimen/molecular rows keep NULLs, as in
    the reference's left joins."""
    spine = model_df.select(
        F.col("id").alias("pdcm_model_id"),
        "external_model_id",
        F.col("type").alias("model_type"),
        F.col("data_source_tmp").alias("data_source"),
        "license_name",
        "license_url",
        "external_ids",
        "supplier",
        "supplier_type",
        "catalog_number",
        "vendor_link",
        "rrid",
        "model_name",
        "model_name_aliases",
        "growth_properties",
        "growth_media",
        "media_id",
        "plate_coating",
        "other_plate_coating",
        "passage_number",
        "contaminated",
        "contamination_details",
        "supplements",
        "drug",
        "drug_concentration",
        "date_submitted",
    )
    from pdcm_etl_spark.functions.joins import merge_keyed_aggregates

    merged = merge_keyed_aggregates(
        list(aggregates), "pdcm_model_id", rename_key="model_id"
    )
    if merged is None:
        return spine
    return spine.join(merged, "pdcm_model_id", "left")
