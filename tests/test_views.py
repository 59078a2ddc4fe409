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
