"""model_metadata: canonical JSON aggregates replacing the reference's
string-concatenated JSON (model_metadata_transformer_job.py:137-216)."""

import json

from pdcm_etl_spark.transforms import metadata as meta_t


def test_quality_assurance_json(spark):
    qa = spark.createDataFrame(
        [
            (10, "Histology", 'desc with "quotes"', "1,2", "NOD", "f", "y", "n",
             "validated", "90%"),
            (10, "STR", "d2", "3", "NOD", "f", "y", "n", "validated", "95%"),
            (11, "Histology", "d3", None, None, None, None, None, None, None),
        ],
        "model_id bigint, validation_technique string, description string, "
        "passages_tested string, validation_host_strain_nomenclature string, "
        "morphological_features string, SNP_analysis string, STR_analysis string, "
        "tumour_status string, model_purity string",
    )
    out = {r["model_id"]: r["quality_assurance"]
           for r in meta_t.quality_assurance_json(qa).collect()}
    recs = json.loads(out[10])
    assert len(recs) == 2
    # sorted deterministically by first struct field
    assert [r["validation_technique"] for r in recs] == ["Histology", "STR"]
    # quotes survive round-trip (the reference's concat-JSON breaks here)
    assert recs[0]["description"] == 'desc with "quotes"'
    assert json.loads(out[11])[0]["validation_technique"] == "Histology"


def test_dataset_available_renames(spark):
    mm = spark.createDataFrame(
        [(10, 1, "mutation"), (10, 2, "biomarker"), (10, 3, "immunemarker")],
        "model_id bigint, mol_char_id bigint, molchar_type string",
    )
    out = meta_t.dataset_available(mm).collect()
    assert out[0]["dataset_available"] == ["bio markers", "immune markers", "mutation"]


def test_model_metadata_spine_left_joins(spark):
    import fixtures

    from pdcm_etl_spark.plans.dag import build_metadata_dag

    dag = build_metadata_dag(spark, fixtures.metadata_fixture(spark))
    model = dag.get("model")
    # ids are hash-derived (functions/ids.py), not dense — pick a real one
    some_model_id = model.select("id").first()["id"]
    qa = spark.createDataFrame(
        [(some_model_id, "Histology", "d",
          None, None, None, None, None, None, None)],
        "model_id bigint, validation_technique string, description string, "
        "passages_tested string, validation_host_strain_nomenclature string, "
        "morphological_features string, SNP_analysis string, STR_analysis string, "
        "tumour_status string, model_purity string",
    )
    mm = meta_t.model_metadata(model, [meta_t.quality_assurance_json(qa)])
    assert mm.count() == model.count()  # left joins keep every model
    with_qa = mm.where("quality_assurance is not null")
    assert with_qa.count() == 1
    assert "model_type" in mm.columns and "license_name" in mm.columns
