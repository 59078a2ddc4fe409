"""Molecular cluster: gene markers + the 5-stage symbol-harmonisation
cascade + molecular characterization.

Parity targets (semantics):
- gene_marker (+ exploded previous/alias side tables):
  gene_marker_transformer_job.py:25-45
- harmonise_marker_symbols: harmonisation/markers_harmonisation.py:27-170 —
  approved → previous (exactly-one-match) → alias (exactly-one-match) →
  ensembl id → ncbi id → no_mapping; each stage splits matched/unmatched
  and results are unioned, the approved symbol is attached as hgnc_symbol.
- molecular_characterization: 3-origin (patient/xenograft/cell) sample
  union + platform FK (molecular_characterization_transformer_job.py).

Scale posture: the marker reference is ~40k genes → every match stage is a
broadcast join against the fact-scale molecular data; the 'exactly one
match' rule is a pre-aggregated count on the broadcast side (the
reference's correlated subquery, decorrelated by hand — same plan Catalyst
would emit, but explicit)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdcm_etl_spark.functions.cleaner import trim_all
from pdcm_etl_spark.functions.ids import add_id
from pdcm_etl_spark.sources.tsv import PROVIDER_COL

# fixed vocabulary (molecular_characterization_type_transformer_job.py:24-25)
MOLCHAR_TYPES = [
    "biomarker", "copy number alteration", "mutation", "expression", "immunemarker",
]


def molecular_characterization_type(spark: SparkSession) -> DataFrame:
    """Static molchar-type dim — values are a fixed vocabulary, so the
    table is generated, not ingested."""
    from pdcm_etl_spark.functions.local_table import values_table

    return values_table(
        spark, list(enumerate(MOLCHAR_TYPES, start=1)), "id long, name string"
    )


def gene_marker(raw_markers: DataFrame) -> DataFrame:
    """HGNC marker reference with deterministic ids."""
    return add_id(raw_markers, "id", key_cols=["approved_symbol", "hgnc_id"])


def _exploded_symbols(gene_marker_df: DataFrame, src: str, out: str) -> DataFrame:
    return (
        gene_marker_df.select("id", src)
        .where(f"{src} is not null")
        .withColumn(out, F.explode(F.split(F.col(src), ",")))
        .withColumn(out, trim_all(out))
        .drop(src)
    )


def previous_symbols(gene_marker_df: DataFrame) -> DataFrame:
    return _exploded_symbols(gene_marker_df, "previous_symbols", "previous_symbol")


def alias_symbols(gene_marker_df: DataFrame) -> DataFrame:
    return _exploded_symbols(gene_marker_df, "alias_symbols", "alias_symbol")


def _unique_lookup(symbols_df: DataFrame, sym_col: str, result_label: str) -> DataFrame:
    """Keep only symbols mapping to exactly one gene (the reference's
    correlated count=1 rule) — pre-aggregated, broadcastable."""
    return (
        symbols_df.groupBy(sym_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("gene_marker_id").alias("gene_marker_id"),
        )
        .where("n = 1")
        .select(
            F.col(sym_col).alias("__sym"),
            "gene_marker_id",
            F.lit(result_label).alias("harmonisation_result"),
        )
    )


def harmonise_marker_symbols(
    molecular_df: DataFrame,
    gene_marker_df: DataFrame,
    previous_symbols_df: DataFrame,
    alias_symbols_df: DataFrame,
) -> DataFrame:
    """5-stage match-and-remainder cascade over marker symbols.

    Ambiguous previous/alias symbols (>1 owning gene) fall through to the
    next stage — matching the reference's count=1 semantics. Output adds
    (gene_marker_id, harmonisation_result, hgnc_symbol, non_harmonised_symbol).
    """
    md = molecular_df.withColumn("non_harmonised_symbol", F.col("symbol"))
    gm = gene_marker_df.withColumnRenamed("id", "gene_marker_id")
    previous_symbols_df = previous_symbols_df.withColumnRenamed("id", "gene_marker_id")
    alias_symbols_df = alias_symbols_df.withColumnRenamed("id", "gene_marker_id")

    # ONE pass over the fact stream (r12; guide §1.2 step 1, §3): the old
    # matched/remainder split + 6-way union re-executed the fact subtree
    # once per branch — the single hottest flagship stage (the
    # harmonised_measurements materialization) re-read and re-projected
    # the raw-module union up to 6 times. Here every stage is a broadcast
    # LEFT join whose condition ALSO requires all earlier stages to have
    # missed — exactly the cascade's remainder semantics (a row matched
    # at stage i can never match at stage j > i, so duplicate lookup keys
    # in a LATER stage cannot multiply already-matched rows, same as the
    # split form) — and one CASE picks the stage label. Identical rows,
    # identical types; re-proven against the DuckDB oracle (flagship +
    # harmonisation queries) like the r11 standalone-cascade restructure.
    stage1 = F.broadcast(
        gm.select(
            F.col("approved_symbol").alias("__sym1"),
            F.col("gene_marker_id").alias("__id1"),
        )
    )
    stage2 = F.broadcast(
        _unique_lookup(previous_symbols_df, "previous_symbol", "previous_symbol")
        .select(F.col("__sym").alias("__sym2"), F.col("gene_marker_id").alias("__id2"))
    )
    stage3 = F.broadcast(
        _unique_lookup(alias_symbols_df, "alias_symbol", "alias_symbol")
        .select(F.col("__sym").alias("__sym3"), F.col("gene_marker_id").alias("__id3"))
    )
    stage4 = F.broadcast(
        gm.where("ensembl_gene_id is not null").select(
            F.col("ensembl_gene_id").alias("__sym4"),
            F.col("gene_marker_id").alias("__id4"),
        )
    )
    stage5 = F.broadcast(
        gm.where("ncbi_gene_id is not null").select(
            F.round(F.col("ncbi_gene_id")).cast("integer").alias("__sym5"),
            F.col("gene_marker_id").alias("__id5"),
        )
    )
    miss1 = F.col("__id1").isNull()
    miss2 = miss1 & F.col("__id2").isNull()
    miss3 = miss2 & F.col("__id3").isNull()
    miss4 = miss3 & F.col("__id4").isNull()
    j = (
        md.join(stage1, md.non_harmonised_symbol == F.col("__sym1"), "left")
        .join(stage2, (F.col("non_harmonised_symbol") == F.col("__sym2")) & miss1, "left")
        .join(stage3, (F.col("non_harmonised_symbol") == F.col("__sym3")) & miss2, "left")
        .join(stage4, (F.col("ensembl_gene_id") == F.col("__sym4")) & miss3, "left")
        .join(
            stage5,
            (F.round(F.col("ncbi_gene_id")).cast("integer") == F.col("__sym5")) & miss4,
            "left",
        )
    )
    result = j.select(
        F.coalesce("__id1", "__id2", "__id3", "__id4", "__id5")
        .cast("bigint")
        .alias("gene_marker_id"),
        *md.columns,
        F.when(F.col("__id1").isNotNull(), F.lit("approved_symbol"))
        .when(F.col("__id2").isNotNull(), F.lit("previous_symbol"))
        .when(F.col("__id3").isNotNull(), F.lit("alias_symbol"))
        .when(F.col("__id4").isNotNull(), F.lit("ensembl_gene_id"))
        .when(F.col("__id5").isNotNull(), F.lit("ncbi_gene_id"))
        .otherwise(F.lit("no_mapping"))
        .alias("harmonisation_result"),
    )
    hgnc = F.broadcast(
        gm.select("gene_marker_id", F.col("approved_symbol").alias("hgnc_symbol"))
    )
    return result.join(hgnc, on="gene_marker_id", how="left")


def molecular_characterization(
    raw_molchar_sample: DataFrame, raw_platform: DataFrame
) -> DataFrame:
    """3-origin union of molecular sample metadata with platform FK
    (molecular_characterization_transformer_job.py:79-168). The origin
    (patient/xenograft/cell) stays a column — one scan, no per-origin
    branches."""
    platform = raw_platform.select(
        trim_all("platform_id").alias("platform_external_id"),
        trim_all("molecular_characterisation_type").alias("molchar_type"),
        "instrument_model",
        "library_strategy",
        F.col(PROVIDER_COL).alias("pl_provider"),
    ).drop_duplicates()
    platform = add_id(platform, "platform_id_internal",
                      key_cols=["platform_external_id", "pl_provider"])

    mc = raw_molchar_sample.select(
        "model_id",
        "sample_id",
        F.lower(trim_all("sample_origin")).alias("sample_origin"),
        "passage",
        "raw_data_url",
        trim_all("platform_id").alias("platform_external_id"),
        F.col(PROVIDER_COL),
    ).drop_duplicates()

    out = mc.join(
        F.broadcast(platform),
        (mc.platform_external_id == platform.platform_external_id)
        & (mc[PROVIDER_COL] == platform.pl_provider),
        "left",
    ).drop(platform.platform_external_id).drop("pl_provider")
    out = add_id(
        out, "id", key_cols=["model_id", "sample_id", "sample_origin",
                             "platform_external_id", PROVIDER_COL],
        fact=True,
    )
    return out.select(
        "id", "model_id", "sample_id", "sample_origin", "passage",
        "raw_data_url", "platform_external_id",
        F.col("platform_id_internal").alias("platform_id"),
        "molchar_type", "instrument_model", "library_strategy", PROVIDER_COL,
    )
