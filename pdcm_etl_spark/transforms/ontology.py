"""Ontology entities: NCIt term tables, branch subsets, ancestor closure,
and the sample→ontology diagnosis mapping.

Parity targets (semantics):
- term rename Neoplasm→Cancer (graph_builder.py:127-135)
- branch extraction by top-level terms (graph_builder.py:7-30 ONTOLOGIES:
  diagnosis NCIT:C3262/C9305, treatment 10 roots, regimen NCIT:C12218)
- ancestors table (graph_builder.py:152-163 — '|'-joined names; ours is
  sorted for determinism, the reference inherits set order)
- sample_to_ontology 4-key case-insensitive mapping join
  (sample_to_ontology_transformer_job.py:100-139)

The reference does all graph work in driver-side networkx; here the DAG
closure is the distributed iterative self-join (operators/graph.py), which
is the piece that survives when the ontology is no longer NCIt-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdcm_etl_spark.functions.cleaner import lower_and_trim_all
from pdcm_etl_spark.functions.ids import add_id
from pdcm_etl_spark.operators.graph import ancestor_closure

DIAGNOSIS_ROOTS = ["NCIT:C3262", "NCIT:C9305"]
TREATMENT_ROOTS = [
    "NCIT:C1932", "NCIT:C1505", "NCIT:C1913", "NCIT:C45678", "NCIT:C1909",
    "NCIT:C1899", "NCIT:C15431", "NCIT:C49236", "NCIT:C15206", "NCIT:C26548",
]
REGIMEN_ROOTS = ["NCIT:C12218"]


def rename_cancer_terms(name_col) -> F.Column:
    """'... Malignant ... Neoplasm ...' → '... ... Cancer ...'; otherwise
    'Neoplasm' → 'Cancer'; whitespace collapsed."""
    c = F.col(name_col) if isinstance(name_col, str) else name_col
    renamed = F.when(
        c.contains("Malignant"),
        F.regexp_replace(c, r"(.*)Malignant(.*)Neoplasm(.*)", r"$1$2Cancer$3"),
    ).otherwise(F.regexp_replace(c, r"(.*)Neoplasm(.*)", r"$1Cancer$2"))
    return F.trim(F.regexp_replace(renamed, r"\s+", " "))


def ontology_term(obo_df: DataFrame) -> DataFrame:
    """All terms with renamed display names and deterministic ids."""
    out = obo_df.select(
        "term_id",
        rename_cancer_terms("term_name").alias("term_name"),
        "term_url",
        "is_a",
    )
    return add_id(out, "id", key_cols=["term_id"])


def term_edges(obo_df: DataFrame) -> DataFrame:
    """(node=child term, parent) rows exploded from the is_a list."""
    return (
        obo_df.where("is_a is not null and is_a != ''")
        .select(
            F.col("term_id").alias("node"),
            F.explode(F.split("is_a", ",")).alias("parent"),
        )
        .withColumn("parent", F.trim("parent"))
        .where("parent != ''")
    )


def term_closure(obo_df: DataFrame) -> DataFrame:
    """Full transitive (node, ancestor, depth) closure of the DAG."""
    return ancestor_closure(term_edges(obo_df), stop_at=None)


def branch_terms(
    ontology_term_df: DataFrame, closure_df: DataFrame, roots: list[str]
) -> DataFrame:
    """Terms under any of ``roots`` (roots included) — the subgraph-compose
    behavior of graph_builder.py:47-64."""
    under = (
        closure_df.filter(F.col("ancestor").isin(roots))
        .select(F.col("node").alias("term_id"))
        .distinct()
    )
    from pdcm_etl_spark.functions.local_table import values_table

    roots_df = values_table(
        under.sparkSession, [(r,) for r in roots], "term_id string"
    )
    keep = under.unionByName(roots_df).distinct()
    return ontology_term_df.join(keep, "term_id", "left_semi")


def ontology_term_diagnosis(ontology_term_df, closure_df) -> DataFrame:
    return branch_terms(ontology_term_df, closure_df, DIAGNOSIS_ROOTS)


def ontology_term_treatment(ontology_term_df, closure_df) -> DataFrame:
    return branch_terms(ontology_term_df, closure_df, TREATMENT_ROOTS)


def ontology_term_regimen(ontology_term_df, closure_df) -> DataFrame:
    return branch_terms(ontology_term_df, closure_df, REGIMEN_ROOTS)


def term_ancestors(ontology_term_df: DataFrame, closure_df: DataFrame) -> DataFrame:
    """Per term: '|'-joined ancestor display names (sorted — deterministic,
    unlike the reference's set iteration order)."""
    names = ontology_term_df.select(
        F.col("term_id").alias("ancestor"), F.col("term_name").alias("ancestor_name")
    )
    return (
        closure_df.join(names, "ancestor")
        .groupBy("node")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("ancestor_name")), "|"
            ).alias("ancestors")
        )
        .withColumnRenamed("node", "term_id")
    )


def sample_to_ontology(
    sample_data_df: DataFrame,
    diagnosis_mappings_df: DataFrame,
    ontology_term_diagnosis_df: DataFrame,
) -> DataFrame:
    """Map each patient sample to a diagnosis ontology term via the curated
    4-key mapping (datasource, diagnosis, primary_tissue, tumor_type),
    case-insensitive. The mapping table is curator-sized → broadcast."""
    mappings = (
        diagnosis_mappings_df.select(
            lower_and_trim_all("datasource").alias("m_datasource"),
            lower_and_trim_all("diagnosis").alias("m_diagnosis"),
            lower_and_trim_all("primary_tissue").alias("m_primary_tissue"),
            lower_and_trim_all("tumor_type").alias("m_tumor_type"),
            F.col("mapped_term_url").alias("term_url"),
        )
        .drop_duplicates()
    )
    terms = ontology_term_diagnosis_df.select(
        F.col("id").alias("ontology_term_id"), "term_url"
    )
    mappings = mappings.join(terms, "term_url", "left")

    s = sample_data_df.select(
        "sample_id",
        lower_and_trim_all("data_source").alias("m_datasource"),
        lower_and_trim_all("diagnosis").alias("m_diagnosis"),
        lower_and_trim_all("primary_tissue").alias("m_primary_tissue"),
        lower_and_trim_all("tumor_type").alias("m_tumor_type"),
    )
    joined = s.join(
        F.broadcast(mappings),
        on=["m_datasource", "m_diagnosis", "m_primary_tissue", "m_tumor_type"],
        how="left",
    )
    return joined.select("sample_id", "ontology_term_id")


def regimen_to_treatment(
    raw_ontolia: DataFrame,
    ontology_term_regimen_df: DataFrame,
    ontology_term_treatment_df: DataFrame,
) -> DataFrame:
    """regimen → component treatment names
    (regimen_to_treatment_transformer_job.py:35-99): explode the ontolia
    comma list, normalize NCIT ids (``_`` → ``:``), resolve both sides to
    display names via inner joins on the (small, broadcast) branch terms."""
    r2t = raw_ontolia.select(
        F.regexp_replace(F.col("regimen"), "_", ":").alias("regimen_ncit_id"),
        F.explode(F.split(F.col("treatments"), ",")).alias("treatment_ncit_id"),
    ).withColumn(
        "treatment_ncit_id", F.regexp_replace(F.col("treatment_ncit_id"), "_", ":")
    )
    reg = F.broadcast(
        ontology_term_regimen_df.select(
            F.col("term_id").alias("regimen_ncit_id"),
            F.col("term_name").alias("regimen"),
        )
    )
    trt = F.broadcast(
        ontology_term_treatment_df.select(
            F.col("term_id").alias("treatment_ncit_id"),
            F.col("term_name").alias("treatment"),
        )
    )
    return (
        r2t.join(reg, "regimen_ncit_id", "inner")
        .join(trt, "treatment_ncit_id", "inner")
        .select("regimen", "treatment")
    )
