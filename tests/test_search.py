"""Search-layer tests: age binning (incl. the reference's inclusive-upper
boundary quirk), search_terms/cancer_system array logic."""

import pytest
from pyspark.sql import functions as F

from pdcm_etl_spark.transforms import search


@pytest.mark.parametrize(
    "raw,expected",
    [
        (None, "Not Provided"),
        ("Not Collected", "Not Provided"),
        ("3 months", "0 - 23 months"),
        ("1.5", "0 - 23 months"),
        ("2", "2 - 9"),
        ("9.9", "2 - 9"),
        ("10", "2 - 9"),        # boundary belongs to the LOWER bin (ref quirk)
        ("10.5", "10 - 19"),
        ("20", "10 - 19"),
        ("45", "40 - 49"),
        ("99", "90 - 99"),
        ("100", "90 - 99"),
        ("101", "101"),          # out of range passes through
        ("abc", "Not Provided"),
    ],
)
def test_bin_age(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "age string")
    got = df.select(search.bin_age("age").alias("b")).collect()[0]["b"]
    assert got == expected


def test_search_terms_and_cancer_system(spark):
    s2o = spark.createDataFrame(
        [("S1", 1), ("S2", 2), ("S3", None)],
        "sample_id string, ontology_term_id long",
    )
    terms = spark.createDataFrame(
        [
            (1, "Breast Carcinoma", "Breast Cancer|Cancer|Cancer by Site"),
            (2, "Weird Tumor", "Cancer"),
        ],
        "id long, term_name string, ancestors string",
    )
    out = {r["sample_id"]: r for r in
           search.extend_sample_with_ontology(s2o, terms).collect()}
    assert out["S1"]["search_terms"] == ["Breast Carcinoma", "Breast Cancer"]
    assert out["S1"]["cancer_system"] == "Breast Cancer"
    assert out["S1"]["histology"] == "Breast Carcinoma"
    assert out["S2"]["search_terms"] == ["Weird Tumor"]
    assert out["S2"]["cancer_system"] == "Unclassified"
    assert out["S3"]["cancer_system"] == "Unclassified"


def test_normalize_sex(spark):
    df = spark.createDataFrame(
        [("Female",), ("Not Provided",), ("MALE",)], "s string"
    )
    got = [r["n"] for r in df.select(search.normalize_sex("s").alias("n")).collect()]
    assert got == ["female", "Not Provided", "male"]
