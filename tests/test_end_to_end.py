"""End-to-end fixture-provider run: raw modules → full DAG →
search_index_patient_sample — the golden-path test the reference lacks
(SURVEY §5 'no end-to-end pipeline test')."""

import pytest
from pyspark.sql import functions as F

import fixtures
from test_ontology import OBO_TEXT


@pytest.fixture(scope="module")
def full_dag(spark, tmp_path_factory):
    from pdcm_etl_spark.plans.dag import build_metadata_dag
    from pdcm_etl_spark.sources.obo import read_obo

    raw = fixtures.metadata_fixture(spark)
    raw["sample"] = fixtures.make_module_df(spark, "sample", [
        dict(patient_id="P1", sample_id="S1", diagnosis="Breast Carcinoma",
             tumour_type="primary", primary_site="breast", collection_site="breast",
             age_in_years_at_collection="45", stage="II", staging_system="TNM",
             grade="2", grading_system="G", model_id="M1",
             treated_prior_to_collection="yes", data_source_tmp="TRACE"),
        dict(patient_id="P3", sample_id="S2", diagnosis="Mystery Illness",
             tumour_type="metastatic", primary_site="lung", collection_site="lymph node",
             age_in_years_at_collection="10", model_id="M3",
             data_source_tmp="PDMR"),
        dict(patient_id="P2", sample_id="S3", diagnosis="Breast Carcinoma",
             tumour_type="primary", primary_site="breast", collection_site="breast",
             age_in_years_at_collection="4 months", model_id="C1",
             data_source_tmp="TRACE"),
    ])
    raw["diagnosis_mapping"] = fixtures.make_module_df(spark, "diagnosis_mapping", [
        dict(datasource="trace", diagnosis="breast carcinoma",
             primary_tissue="breast", tumor_type="Primary",
             mapped_term_url="http://purl.obolibrary.org/obo/NCIT_C4872",
             data_source_tmp="TRACE"),
    ])
    p = tmp_path_factory.mktemp("obo_e2e") / "mini.obo"
    p.write_text(OBO_TEXT)
    raw["obo"] = read_obo(spark, str(p))
    raw["drug_dosing"] = fixtures.make_module_df(spark, "drug_dosing", [
        dict(model_id="M1", treatment_name="Cisplatin + Gemcitabine",
             treatment_dose="2 mg/kg + 5 mg/kg", treatment_response="Stable Disease",
             response_classification="RECIST", data_source_tmp="TRACE"),
    ])
    raw["patient_treatment"] = fixtures.make_module_df(spark, "patient_treatment", [
        dict(patient_id="P1", treatment_name="Tamoxifen", treatment_dose="20 mg",
             treatment_response="stable disease", response_classification="RECIST",
             model_id="M1", data_source_tmp="TRACE"),
    ])
    raw["molchar_sample"] = fixtures.make_module_df(spark, "molchar_sample", [
        dict(model_id="M1", sample_id="MS1", sample_origin="patient", passage="0",
             platform_id="pl1", data_source_tmp="TRACE"),
    ])
    raw["molchar_platform"] = fixtures.make_module_df(spark, "molchar_platform", [
        dict(platform_id="pl1", molecular_characterisation_type="mutation",
             instrument_model="Illumina", library_strategy="WGS",
             data_source_tmp="TRACE"),
    ])
    raw["mutation"] = fixtures.make_module_df(spark, "mutation", [
        dict(sample_id="MS1", symbol="KRAS", chromosome="12", read_depth="40",
             platform_id="pl1", data_source_tmp="TRACE"),
        dict(sample_id="MS1", symbol="TP53", chromosome="17", read_depth=None,
             platform_id="pl1", data_source_tmp="TRACE"),
    ])
    return build_metadata_dag(spark, raw)


def test_all_entities_resolve(full_dag):
    out = full_dag.run()
    expected = {
        "ethnicity", "provider_group", "patient", "initial_model", "model",
        "tissue", "tumour_type", "patient_sample", "treatment_protocol",
        "treatment", "treatment_component", "molecular_characterization",
        "ontology_term", "ontology_term_diagnosis", "sample_to_ontology",
        "search_index_patient_sample", "platform", "cell_sample",
        "xenograft_sample", "cell_model", "mutation_measurement_data",
        "available_molecular_data_columns", "model_metadata", "node", "edge",
        "search_facet",
    }
    assert expected <= set(out)
    for name in expected:
        assert out[name].count() >= 0  # forces full materialization

    amdc = {r["molecular_characterization_type"]: r["available_columns"]
            for r in out["available_molecular_data_columns"].collect()}
    assert "symbol" in amdc["mutation"] and "read_depth" in amdc["mutation"]

    mmd = out["mutation_measurement_data"].collect()
    assert len(mmd) == 2
    assert all(r["molecular_characterization_id"] is not None for r in mmd)


def test_search_index_patient_sample_end_to_end(full_dag):
    six = full_dag.get("search_index_patient_sample")
    rows = {r["external_patient_sample_id"]: r for r in six.collect()}
    s1 = rows["S1"]
    assert s1["histology"] == "Breast Carcinoma"
    assert s1["cancer_system"] == "Unclassified" or s1["cancer_system"]  # mapped below
    assert s1["patient_age"] == "40 - 49"
    assert s1["patient_sex"] == "female"
    assert s1["cancer_stage"] == "II"
    # unmapped sample: no histology, age binned, still present
    s2 = rows["S2"]
    assert s2["histology"] is None
    assert s2["patient_age"] == "2 - 9"  # boundary: 10 → lower bin
    # months-form age
    assert rows["S3"]["patient_age"] == "0 - 23 months"
    # search terms exclude top-level noise
    assert s1["search_terms"] is not None and "Cancer" not in s1["search_terms"]


def test_search_index_wide_table(full_dag):
    six = full_dag.get("search_index")
    rows = {r["external_model_id"]: r for r in six.collect()}
    assert set(rows) == {"M1", "M2", "M3", "C1", "C2", "C3"}
    m1 = rows["M1"]
    assert m1["model_type"] == "PDX"
    assert m1["histology"] == "Breast Carcinoma"      # via patient-sample slice
    assert m1["dataset_available"] == ["mutation"]     # via molchar aggregate
    assert m1["model_treatments"] == ["cisplatin", "gemcitabine"]
    # models without samples/molecular data still present (left joins)
    assert rows["M2"]["histology"] is None
    assert rows["M2"]["dataset_available"] is None


def test_patient_sample_model_link(full_dag):
    ps = full_dag.get("patient_sample")
    model = full_dag.get("initial_model")
    mid = {r["external_model_id"]: r["id"] for r in model.collect()}
    got = {r["external_patient_sample_id"]: r["model_id"] for r in ps.collect()}
    assert got["S1"] == mid["M1"]
    assert got["S3"] == mid["C1"]
