"""Scoring tests — semantics of the columnar rewrite vs the reference's
row-wise scorer (validity rules, all-rows JSON rule, 0.9/0.07/0.03 mix)."""

import json

from pdcm_etl_spark.transforms import scoring


def test_metadata_score_single_and_json(spark):
    weights = {
        "patient_sex": 1,
        "histology": 1,
        "quality_assurance.validation_technique": 1,
        "ignored_zero": 0,
    }
    qa_ok = json.dumps([
        {"validation_technique": "STR", "description": "x"},
        {"validation_technique": "SNP", "description": ""},
    ])
    qa_partial = json.dumps([
        {"validation_technique": "STR"},
        {"validation_technique": "Not Provided"},
    ])
    df = spark.createDataFrame(
        [
            (1, "female", "Carcinoma", qa_ok),       # all three earn → 3/3
            (2, "not provided", None, qa_partial),   # nothing earns → 0/3
            (3, "male", "unknown", None),            # only sex earns → 1/3
        ],
        "pdcm_model_id long, patient_sex string, histology string, quality_assurance string",
    )
    out = {r["pdcm_model_id"]: r["score"] for r in scoring.model_score(df, weights).collect()}
    # metadata-only → score = int(pct * 0.9)
    assert out[1] == int(100 * 0.9)
    assert out[2] == 0
    # same float-op order as the reference (earned/max*100*0.9) → 29
    assert out[3] == int(1 / 3 * 100 * 0.9)


def test_raw_data_and_annotation_components(spark):
    df = spark.createDataFrame(
        [
            (1, "female", ["ENA"], ["Civic", "OncoMx"]),
            (2, "female", [], None),
        ],
        "pdcm_model_id long, patient_sex string, raw_data_resources array<string>, "
        "cancer_annotation_resources array<string>",
    )
    out = {
        r["pdcm_model_id"]: r["score"]
        for r in scoring.model_score(
            df, {"patient_sex": 1}, total_cancer_annotation_resources=4
        ).collect()
    }
    assert out[1] == int(100 * 0.9 + 100 * 0.07 + 50 * 0.03)
    assert out[2] == int(100 * 0.9)
