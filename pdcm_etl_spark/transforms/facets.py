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

# representative facet config (same shape as etl/facets.py:1-371)
FACET_DEFINITIONS: list[dict] = [
    dict(index=0, facet_section="search", facet_name="Search",
         facet_description="", facet_column="search_terms",
         facet_example="Melanoma", any_operator="ov", all_operator="",
         is_boolean=False, facet_type="", dynamic_values=True,
         remove_invalid_values=True),
    dict(index=1, facet_section="model", facet_name="Type",
         facet_description="", facet_column="model_type", facet_example='""',
         any_operator="in", all_operator="", is_boolean=False,
         facet_type="check", dynamic_values=True),
    dict(index=2, facet_section="molecular_data", facet_name="Cancer System",
         facet_description="", facet_column="cancer_system",
         facet_example="Breast Cancer", any_operator="in", all_operator="",
         is_boolean=False, facet_type="check", dynamic_values=True,
         remove_invalid_values=True),
    dict(index=3, facet_section="patient", facet_name="Patient Age",
         facet_description="", facet_column="patient_age",
         facet_example="2 - 9", any_operator="in", all_operator="",
         is_boolean=False, facet_type="check", dynamic_values=True,
         remove_invalid_values=True),
    dict(index=4, facet_section="model", facet_name="Has Publications",
         facet_description="", facet_column="has_publications",
         facet_example="", any_operator="in", all_operator="",
         is_boolean=True, facet_type="check", dynamic_values=False,
         facet_options=["true", "false"]),
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
            static = spark.createDataFrame(
                [tuple(d.get(c) for c in FACET_COLUMNS)], FACET_SCHEMA
            )
            frames.append(static)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.withColumn("index", F.col("index").cast("int"))
