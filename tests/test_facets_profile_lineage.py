"""Tests for facets, column profiling, and the lineage graph entities."""

from test_end_to_end import full_dag  # noqa: F401

import fixtures
from pdcm_etl_spark.transforms import facets, lineage, profile


def test_search_facets(spark, full_dag):  # noqa: F811
    six = full_dag.get("search_index_patient_sample")
    # add a model_type column facet source (normally from search_index)
    six = six.withColumnRenamed("pdcm_model_id", "model_id_x")
    df = six.withColumn("model_type", six["histology"].isNotNull().cast("string"))
    out = facets.search_facets(spark, df)
    rows = {r["facet_name"]: r for r in out.collect()}
    assert rows["Search"]["facet_options"]  # collected from search_terms
    assert rows["Has Publications"]["facet_options"] == ["true", "false"]
    assert rows["Patient Age"]["facet_options"]  # invalid values removed
    assert "Not Provided" not in rows["Patient Age"]["facet_options"]


def test_available_columns_profile(spark):
    mut = fixtures.make_module_df(spark, "mutation", [
        dict(sample_id="S1", symbol="TP53", read_depth="55",
             chromosome=None, data_source_tmp="TRACE"),
        dict(sample_id="S2", symbol="KRAS", read_depth=None,
             chromosome=None, data_source_tmp="TRACE"),
    ])
    out = profile.available_columns(mut, "mutation").collect()[0]
    assert out["data_source"] == "TRACE"
    cols = out["available_columns"]
    assert "symbol" in cols and "read_depth" in cols
    assert "chromosome" not in cols  # all-null column is not available


def test_lineage_nodes_and_edges(full_dag):  # noqa: F811
    patient = full_dag.get("patient")
    ps = full_dag.get("patient_sample")
    model = full_dag.get("initial_model")
    n = lineage.nodes(patient, ps, model)
    types = {r["node_type"] for r in n.collect()}
    assert types == {"patient", "patient_sample", "model"}
    e = lineage.edges(n, ps, model)
    node_by_id = {r["id"]: r for r in n.collect()}
    kinds = {
        (node_by_id[r["previous_node"]]["node_type"],
         node_by_id[r["next_node"]]["node_type"])
        for r in e.collect()
    }
    assert ("patient", "patient_sample") in kinds
    assert ("patient_sample", "model") in kinds
