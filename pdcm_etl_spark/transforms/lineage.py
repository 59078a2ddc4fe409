"""Patient→sample→model lineage graph (node/edge tables).

Parity: nodes_transformer_job.py:58-230 (patient / patient-sample / model
nodes with to_json(struct(...)) payloads) and edges_transformer_job.py:
57-170 (patient→sample, sample→model, model→model parent edges).

The model-relationship *closure* over these edges (the reference's
recursive Postgres UPDATE, scripts/updates.sql:6-34) is
operators/graph.ancestor_closure over the edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdcm_etl_spark.functions.ids import add_id
from pdcm_etl_spark.sources.tsv import PROVIDER_COL


def nodes(patient_df: DataFrame, patient_sample_df: DataFrame, model_df: DataFrame) -> DataFrame:
    """One row per graph node: (id, internal_id, node_type, node_label,
    data_source, data-json)."""
    patient_nodes = (
        patient_df.select(
            F.col("id").alias("internal_id"),
            F.lit("patient").alias("node_type"),
            F.col("external_patient_id").alias("node_label"),
            F.col(PROVIDER_COL).alias("data_source"),
            F.to_json(F.struct("sex")).alias("data"),
        )
        .drop_duplicates()
    )
    sample_nodes = (
        patient_sample_df.select(
            F.col("id").alias("internal_id"),
            F.lit("patient_sample").alias("node_type"),
            F.col("external_patient_sample_id").alias("node_label"),
            F.col(PROVIDER_COL).alias("data_source"),
            F.to_json(F.struct("diagnosis", "tumour_type_id")).alias("data"),
        )
        .drop_duplicates()
    )
    model_nodes = (
        model_df.select(
            F.col("id").alias("internal_id"),
            F.lit("model").alias("node_type"),
            F.col("external_model_id").alias("node_label"),
            F.col(PROVIDER_COL).alias("data_source"),
            F.to_json(F.struct("type")).alias("data"),
        )
        .drop_duplicates()
    )
    out = patient_nodes.unionByName(sample_nodes).unionByName(model_nodes)
    return add_id(out, "id", key_cols=["node_type", "node_label", "data_source"], fact=True)


def model_relationships(model_df: DataFrame) -> DataFrame:
    """Transitive parent closure over model parent links — the reference's
    recursive Postgres UPDATE (scripts/updates.sql:6-34,
    pdcm_api.get_parents_tree) as a distributed fixpoint join.

    Returns (model_id, ancestor_model_id, depth) over internal ids."""
    from pdcm_etl_spark.operators.graph import ancestor_closure

    m = model_df.select("id", "external_model_id", "parent_id", PROVIDER_COL)
    parents = m.select(
        F.col("external_model_id").alias("parent_external_id"),
        F.col("id").alias("parent_internal_id"),
        F.col(PROVIDER_COL).alias("p_provider"),
    )
    edges_df = (
        m.where("parent_id is not null and parent_id != ''")
        .join(
            parents,
            (m.parent_id == parents.parent_external_id)
            & (m[PROVIDER_COL] == parents.p_provider),
        )
        .select(
            F.col("id").alias("node"),
            F.col("parent_internal_id").alias("parent"),
        )
    )
    return ancestor_closure(edges_df, stop_at=None).select(
        F.col("node").alias("model_id"),
        F.col("ancestor").alias("ancestor_model_id"),
        "depth",
    )


def edges(nodes_df: DataFrame, patient_sample_df: DataFrame, model_df: DataFrame) -> DataFrame:
    """(previous_node, next_node) node-id pairs: patient→sample,
    sample→model, parent-model→model."""
    n = nodes_df.select("id", "internal_id", "node_type")

    def node_ids(node_type: str, alias: str):
        return F.broadcast(
            n.filter(F.col("node_type") == node_type).select(
                F.col("id").alias(alias), F.col("internal_id").alias(f"{alias}_internal")
            )
        )

    ps = patient_sample_df.select("id", "patient_id", "model_id")
    p2s = (
        ps.join(node_ids("patient", "previous_node"),
                ps.patient_id == F.col("previous_node_internal"))
        .join(node_ids("patient_sample", "next_node"),
              ps.id == F.col("next_node_internal"))
        .select("previous_node", "next_node")
    )
    s2m = (
        ps.join(node_ids("patient_sample", "previous_node"),
                ps.id == F.col("previous_node_internal"))
        .join(node_ids("model", "next_node"),
              ps.model_id == F.col("next_node_internal"))
        .select("previous_node", "next_node")
    )
    # parent model edges: model.parent_id names another model's external id
    m = model_df.select(
        "id", "external_model_id", "parent_id", F.col(PROVIDER_COL)
    )
    parents = m.select(
        F.col("external_model_id").alias("parent_external_id"),
        F.col("id").alias("parent_internal_id"),
        F.col(PROVIDER_COL),
    )
    m2m_internal = (
        m.where("parent_id is not null and parent_id != ''")
        .join(
            parents,
            (m.parent_id == parents.parent_external_id)
            & (m[PROVIDER_COL] == parents[PROVIDER_COL]),
        )
        .select(
            F.col("parent_internal_id").alias("prev_internal"),
            F.col("id").alias("next_internal"),
        )
    )
    m2m = (
        m2m_internal.join(node_ids("model", "previous_node"),
                          F.col("prev_internal") == F.col("previous_node_internal"))
        .join(node_ids("model", "next_node"),
              F.col("next_internal") == F.col("next_node_internal"))
        .select("previous_node", "next_node")
    )
    return p2s.unionByName(s2m).unionByName(m2m).drop_duplicates()
