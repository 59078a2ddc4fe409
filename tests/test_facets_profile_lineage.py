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
    assert rows["Model Availability"]["facet_options"] == [
        "Available for distribution=true"
    ]
    assert rows["Patient age"]["facet_options"]  # dynamic column present


def test_facet_registry_matches_reference():
    # the full 28-facet registry of the reference (etl/facets.py:1-371):
    # same (section, name, column, operators, type) per index
    defs = facets.FACET_DEFINITIONS
    assert len(defs) == 28
    assert [d["index"] for d in defs] == list(range(28))
    by_name = {d["facet_name"]: d for d in defs}
    assert by_name["Search"]["any_operator"] == "ov"
    assert by_name["Gene mutation"]["facet_column"] == "markers_with_mutation_data"
    assert by_name["Gene mutation"]["all_operator"] == "cs"
    assert by_name["MSI Status"]["facet_section"] == "molecular_data"
    assert by_name["Paediatric Models"]["is_boolean"] is True
    sections = {d["facet_section"] for d in defs}
    assert sections == {"search", "model", "patient_tumour", "molecular_data",
                        "patient_treatment", "model_treatment"}


def test_search_facets_on_full_search_index(spark):
    from pdcm_etl_spark.plans.dag import build_metadata_dag
    from pdcm_etl_spark.plans.synth import synthesize_provider_modules

    raw = synthesize_provider_modules(spark, "/root/testdata/sf0.001")
    dag = build_metadata_dag(spark, raw)
    out = dag.run(targets=["search_facet"])
    rows = {r["facet_name"]: r for r in out["search_facet"].collect()}
    # every dynamic facet whose column the synth workload populates has
    # a non-empty option set
    for name in ("Type", "Datasource", "Dataset available", "Patient sex",
                 "Gene mutation", "MSI Status", "HLA types",
                 "Model treatment", "Treatment type", "Responses"):
        assert rows[name]["facet_options"], name


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
