"""Search facets — UI filter metadata built from the search index.

Parity: etl/facets.py facet_definitions (28 entries in the reference; a
representative config here, same shape) + search_facet_transformer_job.py:
64-110 — dynamic facets collect their option sets from the search-index
column (exploding array columns), static facets are config rows.

Idiomatic rewrite: the reference loops per facet with a dummy lit(0)
groupby and unions ~28 single-row frames; here every dynamic facet is one
keyless collect_set aggregate and the union is built once. Option sets are
sorted → deterministic output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdcm_etl_spark.functions.cleaner import lower_and_trim_all

INVALID_FILTER_VALUES = ["not provided", "not collected", "unknown", ""]

FACET_COLUMNS = [
    "index", "facet_section", "facet_name", "facet_description",
    "facet_column", "facet_example", "any_operator", "all_operator",
    "is_boolean", "facet_type", "facet_options",
]

FACET_SCHEMA = T.StructType(
    [
        T.StructField("index", T.IntegerType()),
        T.StructField("facet_section", T.StringType()),
        T.StructField("facet_name", T.StringType()),
        T.StructField("facet_description", T.StringType()),
        T.StructField("facet_column", T.StringType()),
        T.StructField("facet_example", T.StringType()),
        T.StructField("any_operator", T.StringType()),
        T.StructField("all_operator", T.StringType()),
        T.StructField("is_boolean", T.BooleanType()),
        T.StructField("facet_type", T.StringType()),
        T.StructField("facet_options", T.ArrayType(T.StringType())),
    ]
)

def _facet(index, section, name, column, *, desc="", example='""',
           any_op="in", all_op="", boolean=False, ftype="check",
           dynamic=True, options=None, remove_invalid=False) -> dict:
    return dict(index=index, facet_section=section, facet_name=name,
                facet_description=desc, facet_column=column,
                facet_example=example, any_operator=any_op,
                all_operator=all_op, is_boolean=boolean, facet_type=ftype,
                dynamic_values=dynamic, facet_options=options,
                remove_invalid_values=remove_invalid)


# the reference's full facet registry — 28 rows, same sections / columns /
# operator wiring (etl/facets.py:1-371); descriptions re-stated tersely
FACET_DEFINITIONS: list[dict] = [
    _facet(0, "search", "Search", "search_terms", example="Melanoma",
           any_op="ov", ftype=""),
    _facet(1, "model", "Type", "model_type"),
    _facet(2, "model", "Model ID", "external_model_id", example="TM00015",
           ftype="autocomplete", desc="unique cancer-model identifier"),
    _facet(3, "model", "Datasource", "data_source",
           desc="originating laboratory / biobank / CRO"),
    _facet(4, "model", "Dataset available", "dataset_available", any_op="ov",
           desc="datasets associated with the model"),
    _facet(5, "model", "Model Availability", "model_availability_boolean",
           boolean=True, dynamic=False,
           options=["Available for distribution=true"],
           desc="filters out currently unavailable models"),
    _facet(6, "model", "Related Models", "has_relations", boolean=True,
           dynamic=False, options=["related models=true"],
           desc="models sharing a patient or parent model"),
    _facet(7, "model", "Project", "project_name",
           desc="consortium or project"),
    _facet(8, "model", "Paediatric Models", "paediatric", boolean=True,
           dynamic=False, options=["paediatric=true"]),
    _facet(9, "patient_tumour", "Collection Site", "collection_site",
           desc="site of the sampled tissue"),
    _facet(10, "patient_tumour", "Primary Site", "primary_site",
           desc="site of the primary tumour"),
    _facet(11, "patient_tumour", "Patient Ethnicity", "patient_ethnicity",
           desc="patient ethnic group"),
    _facet(12, "patient_tumour", "Cancer system", "cancer_system"),
    _facet(13, "patient_tumour", "Patient age", "patient_age"),
    _facet(14, "patient_tumour", "Tumour type", "tumour_type",
           remove_invalid=True),
    _facet(15, "patient_tumour", "Patient sex", "patient_sex"),
    _facet(16, "molecular_data", "Gene mutation",
           "markers_with_mutation_data", example="RTP3", any_op="ov",
           all_op="cs", ftype="multivalued", desc="models with a mutation"),
    _facet(17, "molecular_data", "Gene Expression",
           "markers_with_expression_data", example="BEST1", any_op="ov",
           all_op="cs", ftype="multivalued", desc="models with mRNA data"),
    _facet(18, "molecular_data", "Copy Number Alteration",
           "markers_with_cna_data", example="RTP3", any_op="ov",
           all_op="cs", ftype="multivalued", desc="models with CNA data"),
    _facet(19, "molecular_data", "Breast cancer biomarkers",
           "breast_cancer_biomarkers", any_op="ov", all_op="cs",
           desc="ER/PR/HER2 biomarker status"),
    _facet(20, "molecular_data", "Bio markers", "markers_with_biomarker_data",
           example="ESR1", any_op="ov", all_op="cs", ftype="multivalued",
           desc="models with biomarker calls"),
    _facet(21, "molecular_data", "HLA types", "hla_types", example="HLA-A",
           any_op="ov", desc="HLA alleles present"),
    _facet(22, "molecular_data", "MSI Status", "msi_status", example="Stable",
           any_op="ov", desc="microsatellite instability status"),
    _facet(23, "patient_treatment", "Patient treatment", "patient_treatments",
           example="radiation therapy", any_op="ov", all_op="cs",
           ftype="multivalued", desc="treatments the patient received"),
    _facet(24, "patient_treatment", "Responses",
           "patient_treatments_responses", example="Partial Response",
           any_op="ov", all_op="cs", ftype="multivalued",
           desc="responses to patient treatments"),
    _facet(25, "patient_treatment", "Treatment type",
           "custom_treatment_type_list", any_op="ov", all_op="cs",
           ftype="multivalued", desc="treatment categories"),
    _facet(26, "model_treatment", "Model treatment", "model_treatments",
           example="cyclophosphamide", any_op="ov", all_op="cs",
           ftype="multivalued", desc="dosing regimens used on the model"),
    _facet(27, "model_treatment", "Responses", "model_treatments_responses",
           example="Partial Response", any_op="ov", all_op="cs",
           ftype="multivalued", desc="responses to dosing regimens"),
]


def search_facets(
    spark: SparkSession,
    search_index_df: DataFrame,
    definitions: list[dict] | None = None,
) -> DataFrame:
    definitions = definitions or FACET_DEFINITIONS
    dtypes = dict(search_index_df.dtypes)
    frames: list[DataFrame] = []
    for d in definitions:
        if d.get("dynamic_values"):
            col_name = d["facet_column"]
            if col_name not in dtypes:
                continue
            src = search_index_df.select(col_name)
            if "array" in dtypes[col_name]:
                src = src.select(F.explode(col_name).alias(col_name))
            if d.get("remove_invalid_values"):
                src = src.withColumn("__f", lower_and_trim_all(col_name)).filter(
                    ~F.col("__f").isin(INVALID_FILTER_VALUES)
                ).drop("__f")
            opts = src.agg(
                F.array_sort(F.collect_set(col_name)).alias("facet_options")
            )
            row = opts.select(
                *[
                    F.lit(d.get(c)).alias(c) if c != "facet_options" else F.col(c)
                    for c in FACET_COLUMNS
                ]
            )
            frames.append(row)
        else:
            from pdcm_etl_spark.functions.local_table import values_table

            static = values_table(
                spark, [tuple(d.get(c) for c in FACET_COLUMNS)], FACET_SCHEMA
            )
            frames.append(static)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.withColumn("index", F.col("index").cast("int"))
