"""Ontology tests: OBO parse, Neoplasm→Cancer rename, branch extraction via
distributed closure, ancestors table, 4-key sample mapping."""

import pytest
from pyspark.sql import functions as F

from pdcm_etl_spark.sources.obo import read_obo
from pdcm_etl_spark.transforms import ontology as ont

OBO_TEXT = """format-version: 1.2

[Term]
id: NCIT:C3262
name: Neoplasm

[Term]
id: NCIT:C9305
name: Malignant Neoplasm
is_a: NCIT:C3262 ! Neoplasm

[Term]
id: NCIT:C4872
name: Breast Carcinoma
is_a: NCIT:C9305 ! Malignant Neoplasm

[Term]
id: NCIT:C2926
name: Lung Malignant Glandular Neoplasm
is_a: NCIT:C9305 ! Malignant Neoplasm

[Term]
id: NCIT:C1932
name: Chemical Modifier

[Term]
id: NCIT:C1909
name: Pharmacologic Substance

[Term]
id: NCIT:C583
name: Cisplatin
is_a: NCIT:C1909 ! Pharmacologic Substance

[Term]
id: NCIT:C99999
name: Obsolete Thing
is_obsolete: true

[Term]
id: NCIT:C12218
name: Regimen Root
"""


@pytest.fixture(scope="module")
def obo_df(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("obo") / "mini.obo"
    p.write_text(OBO_TEXT)
    return read_obo(spark, str(p))


def test_obo_parse(obo_df):
    rows = {r["term_id"]: r for r in obo_df.collect()}
    assert "NCIT:C99999" not in rows  # obsolete dropped
    assert rows["NCIT:C4872"]["is_a"] == "NCIT:C9305"
    assert rows["NCIT:C3262"]["term_url"].endswith("NCIT_C3262")
    assert rows["NCIT:C4872"]["term_name"] == "Breast Carcinoma"


def test_term_rename(obo_df):
    terms = ont.ontology_term(obo_df)
    names = {r["term_id"]: r["term_name"] for r in terms.collect()}
    assert names["NCIT:C3262"] == "Cancer"                # Neoplasm → Cancer
    assert names["NCIT:C9305"] == "Cancer"                # Malignant+Neoplasm collapse
    assert names["NCIT:C2926"] == "Lung Glandular Cancer"
    assert names["NCIT:C583"] == "Cisplatin"


def test_branches_via_closure(obo_df):
    terms = ont.ontology_term(obo_df)
    closure = ont.term_closure(obo_df)
    diag = {r["term_id"] for r in ont.ontology_term_diagnosis(terms, closure).collect()}
    treat = {r["term_id"] for r in ont.ontology_term_treatment(terms, closure).collect()}
    assert diag == {"NCIT:C3262", "NCIT:C9305", "NCIT:C4872", "NCIT:C2926"}
    assert treat == {"NCIT:C1932", "NCIT:C1909", "NCIT:C583"}


def test_ancestors(obo_df):
    terms = ont.ontology_term(obo_df)
    closure = ont.term_closure(obo_df)
    anc = {r["term_id"]: r["ancestors"] for r in ont.term_ancestors(terms, closure).collect()}
    # breast carcinoma's two ancestors both render as 'Cancer' → one set entry
    assert anc["NCIT:C4872"] == "Cancer"
    assert anc["NCIT:C583"] == "Pharmacologic Substance"


def test_sample_to_ontology_mapping(spark, obo_df):
    terms = ont.ontology_term(obo_df)
    closure = ont.term_closure(obo_df)
    diag_terms = ont.ontology_term_diagnosis(terms, closure)
    samples = spark.createDataFrame(
        [
            ("S1", "TRACE", "Breast Carcinoma", "Breast", "Primary"),
            ("S2", "TRACE", "Unknown Thing", "Breast", "Primary"),
        ],
        "sample_id string, data_source string, diagnosis string, "
        "primary_tissue string, tumor_type string",
    )
    mappings = spark.createDataFrame(
        [
            ("trace", "breast carcinoma", "breast", "primary",
             "http://purl.obolibrary.org/obo/NCIT_C4872"),
        ],
        "datasource string, diagnosis string, primary_tissue string, "
        "tumor_type string, mapped_term_url string",
    )
    out = {r["sample_id"]: r["ontology_term_id"] for r in
           ont.sample_to_ontology(samples, mappings, diag_terms).collect()}
    expected_id = {r["term_id"]: r["id"] for r in diag_terms.collect()}["NCIT:C4872"]
    assert out["S1"] == expected_id
    assert out["S2"] is None
