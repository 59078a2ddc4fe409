"""View-layer tests over the end-to-end DAG fixture."""

import json

from test_end_to_end import full_dag  # noqa: F401  (fixture reuse)

from pdcm_etl_spark.plans import views


def test_views_create_and_answer(spark, full_dag):  # noqa: F811
    out = full_dag.run()
    views.register_entities(out)
    created = views.create_views(spark)
    assert {"models_by_type", "provider_model_summary",
            "models_by_cancer_system", "model_dataset_availability",
            "models_by_treatment"} <= set(created)

    types = {r["model_type"]: r["n_models"] for r in spark.table("models_by_type").collect()}
    assert types["PDX"] == 3 and types["cell line"] == 1

    summary = {r["provider"]: r for r in spark.table("provider_model_summary").collect()}
    models = json.loads(summary["TRACE"]["models_json"])
    assert {m["external_model_id"] for m in models} == {"M1", "M2", "C1"}

    avail = {r["model_id"]: r for r in spark.table("model_dataset_availability").collect()}
    assert all(r["model_dataset_type_count"] >= 1 for r in avail.values())

    treat = {r["treatment"]: r["n_models"] for r in spark.table("models_by_treatment").collect()}
    assert treat.get("cisplatin") == 1 and treat.get("gemcitabine") == 1

    # views.sql:1097-1102 — per (cancer_system, histology) counts
    assert "models_by_cancer" in created
    cancers = spark.table("models_by_cancer").collect()
    assert all(r["count"] >= 1 for r in cancers)

    # views.sql:1147-1162 — jsonb_agg → to_json(collect_list(struct(...)))
    assert "dosing_studies" in created
    dosing = spark.table("dosing_studies").collect()
    entries = [e for r in dosing for e in json.loads(r["entries"])]
    assert any(e["name"] for e in entries)

    # views.sql:818-842 — derived columns over search_index; only created
    # when this run's search_index carries dataset_available
    if "search_index_enriched" in created:
        enr = spark.table("search_index_enriched").collect()
        assert all("paediatric" in r.asDict() for r in enr)
        assert "models_by_dataset_availability" in created

    # views.sql:1113-1126 — SPLIT_PART(unnest(...)) over the marker lists
    assert "models_by_mutated_gene" in created
    genes = {r["mutated_gene"]: r["count"]
             for r in spark.table("models_by_mutated_gene").collect()}
    assert genes.get("KRAS") == 1 and genes.get("TP53") == 1
