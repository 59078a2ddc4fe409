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


def _split_matched(df: DataFrame):
    return (
        df.where("gene_marker_id is not null"),
        df.where("gene_marker_id is null").drop("gene_marker_id", "harmonisation_result"),
    )


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

    # stage 1: approved symbol (unique by construction)
    approved = F.broadcast(
        gm.select(
            F.col("approved_symbol").alias("__sym"),
            "gene_marker_id",
            F.lit("approved_symbol").alias("harmonisation_result"),
        )
    )
    s1 = md.join(approved, md.non_harmonised_symbol == approved["__sym"], "left").drop("__sym")
    m1, r1 = _split_matched(s1)

    # stage 2: previous symbol, exactly one owning gene
    prev = F.broadcast(_unique_lookup(previous_symbols_df, "previous_symbol", "previous_symbol"))
    s2 = r1.join(prev, r1.non_harmonised_symbol == prev["__sym"], "left").drop("__sym")
    m2, r2 = _split_matched(s2)

    # stage 3: alias symbol, exactly one owning gene
    alias = F.broadcast(_unique_lookup(alias_symbols_df, "alias_symbol", "alias_symbol"))
    s3 = r2.join(alias, r2.non_harmonised_symbol == alias["__sym"], "left").drop("__sym")
    m3, r3 = _split_matched(s3)

    # stage 4: ensembl gene id
    ens = F.broadcast(
        gm.where("ensembl_gene_id is not null")
        .select(
            F.col("ensembl_gene_id").alias("__sym"),
            "gene_marker_id",
            F.lit("ensembl_gene_id").alias("harmonisation_result"),
        )
    )
    s4 = r3.join(ens, r3.ensembl_gene_id == ens["__sym"], "left").drop("__sym")
    m4, r4 = _split_matched(s4)

    # stage 5: ncbi gene id (numeric-normalized, ref :159-160)
    ncbi = F.broadcast(
        gm.where("ncbi_gene_id is not null")
        .select(
            F.round(F.col("ncbi_gene_id")).cast("integer").alias("__sym"),
            "gene_marker_id",
            F.lit("ncbi_gene_id").alias("harmonisation_result"),
        )
    )
    r4n = r4.withColumn("__ncbi", F.round(F.col("ncbi_gene_id")).cast("integer"))
    s5 = r4n.join(ncbi, r4n["__ncbi"] == ncbi["__sym"], "left").drop("__sym", "__ncbi")
    m5, r5 = _split_matched(s5)

    no_map = r5.withColumn("gene_marker_id", F.lit(None).cast("bigint")).withColumn(
        "harmonisation_result", F.lit("no_mapping")
    )

    result = m1.unionByName(m2).unionByName(m3).unionByName(m4).unionByName(m5).unionByName(no_map)

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
