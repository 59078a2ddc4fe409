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
             platform_id=pl, data_source_tmp="TRACE")
        for pl in ("pl1", "pl2", "pl3", "pl4", "pl5")
    ])
    raw["molchar_platform"] = fixtures.make_module_df(spark, "molchar_platform", [
        dict(platform_id="pl1", molecular_characterisation_type="mutation",
             instrument_model="Illumina", library_strategy="WGS",
             data_source_tmp="TRACE"),
        dict(platform_id="pl2", molecular_characterisation_type="copy number alteration",
             instrument_model="Illumina", library_strategy="WGS",
             data_source_tmp="TRACE"),
        dict(platform_id="pl3", molecular_characterisation_type="expression",
             instrument_model="Illumina", library_strategy="RNA-Seq",
             data_source_tmp="TRACE"),
        dict(platform_id="pl4", molecular_characterisation_type="biomarker",
             instrument_model="IHC", library_strategy="targeted",
             data_source_tmp="TRACE"),
        dict(platform_id="pl5", molecular_characterisation_type="immunemarker",
             instrument_model="IHC", library_strategy="targeted",
             data_source_tmp="TRACE"),
    ])
    raw["cna"] = fixtures.make_module_df(spark, "cna", [
        dict(sample_id="MS1", symbol="MYC", chromosome="8", log2r_cna="2.5",
             copy_number_status="gain", platform_id="pl2", data_source_tmp="TRACE"),
    ])
    raw["expression"] = fixtures.make_module_df(spark, "expression", [
        dict(sample_id="MS1", symbol="ESR1", rnaseq_fpkm="12.5",
             platform_id="pl3", data_source_tmp="TRACE"),
    ])
    raw["biomarker"] = fixtures.make_module_df(spark, "biomarker", [
        dict(sample_id="MS1", biomarker="ERBB2", biomarker_status="Positive",
             platform_id="pl4", data_source_tmp="TRACE"),
        dict(sample_id="MS1", biomarker="ESR1", biomarker_status="Negative",
             platform_id="pl4", data_source_tmp="TRACE"),
    ])
    raw["immunemarker"] = fixtures.make_module_df(spark, "immunemarker", [
        dict(sample_id="MS1", marker_type="Model Genomics", marker_name="MSI",
             marker_value="Stable", platform_id="pl5", data_source_tmp="TRACE"),
        dict(sample_id="MS1", marker_type="HLA type", marker_name="HLA-A*02:01",
             marker_value="present", platform_id="pl5", data_source_tmp="TRACE"),
    ])
    raw["model_validation"] = fixtures.make_module_df(spark, "model_validation", [
        dict(model_id="M1", validation_technique="histology",
             description="matches patient tumour", passages_tested="1,2",
             data_source_tmp="TRACE"),
    ])
    raw["mutation"] = fixtures.make_module_df(spark, "mutation", [
        dict(sample_id="MS1", symbol="KRAS", chromosome="12", read_depth="40",
             platform_id="pl1", data_source_tmp="TRACE"),
        dict(sample_id="MS1", symbol="TP53", chromosome="17", read_depth=None,
             platform_id="pl1", data_source_tmp="TRACE"),
    ])
    raw["image_study"] = fixtures.make_module_df(spark, "image_study", [
        dict(study_id="IS1", title="H&E slides", imaging_method="brightfield",
             data_source_tmp="TRACE"),
    ])
    raw["model_image"] = fixtures.make_module_df(spark, "model_image", [
        dict(model_id="M1", url="http://img/1.png", description='has "quotes"',
             sample_type="xenograft", passage="2", magnification="20x",
             staining="H&E", data_source_tmp="TRACE"),
        dict(model_id="M1", url="http://img/2.png", sample_type="xenograft",
             data_source_tmp="TRACE"),
        dict(model_id="GHOST", url="http://img/3.png",
             data_source_tmp="TRACE"),  # unknown model → dropped (inner join)
    ])
    raw["markers"] = fixtures.make_module_df(spark, "markers", [
        dict(hgnc_id="HGNC:6407", approved_symbol="KRAS", status="Approved",
             previous_symbols="KRAS2", alias_symbols="K-ras, Ki-ras",
             ensembl_gene_id="ENSG00000133703", ncbi_gene_id="3845",
             data_source_tmp="AUX"),
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


def test_static_and_imaging_entities(full_dag):
    import json

    out = full_dag.run()
    # fixed molchar-type vocabulary
    types = {r["name"] for r in out["molecular_characterization_type"].collect()}
    assert types == {"biomarker", "copy number alteration", "mutation",
                     "expression", "immunemarker"}
    # config-as-table restriction entity
    restr = out["molecular_data_restriction"].collect()
    assert {r["data_source"] for r in restr} == {"CRL"}
    # imaging cluster: ghost-model image dropped by the FK inner join
    imgs = out["model_image"].collect()
    assert len(imgs) == 2 and all(r["model_id"] is not None for r in imgs)
    assert out["image_study"].count() == 1
    # model_metadata carries the per-model JSON image aggregate
    mm = {r["external_model_id"]: r for r in out["model_metadata"].collect()}
    images = json.loads(mm["M1"]["model_images"])
    assert {i["url"] for i in images} == {"http://img/1.png", "http://img/2.png"}
    assert any(i.get("description") == 'has "quotes"' for i in images)
    assert mm["M2"]["model_images"] is None
    # gene marker reference + exploded side tables
    gm = out["gene_marker"].collect()
    assert gm[0]["approved_symbol"] == "KRAS"
    aliases = {r["alias_symbol"] for r in out["gene_marker_alias_symbols"].collect()}
    assert aliases == {"K-ras", "Ki-ras"}
    prev = {r["previous_symbol"] for r in out["gene_marker_previous_symbols"].collect()}
    assert prev == {"KRAS2"}


def test_search_index_patient_sample_end_to_end(full_dag):
    six = full_dag.get("search_index_patient_sample")
    rows = {r["patient_sample_id"]: r for r in six.collect()}
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
    # molchar aggregate with the display renames (biomarker → 'bio
    # markers', immunemarker → 'immune markers') + the appended
    # treatment/publication markers (model_metadata_transformer:236-266)
    assert m1["dataset_available"] == [
        "bio markers", "copy number alteration", "expression",
        "immune markers", "mutation",
        "model treatment", "patient treatment", "publication"]
    assert m1["model_treatments"] == ["cisplatin", "gemcitabine"]
    # models without samples/molecular data still present (left joins)
    assert rows["M2"]["histology"] is None
    assert rows["M2"]["dataset_available"] is None


def test_search_index_molecular_and_score_aggregates(full_dag):
    """The per-model aggregate columns the reference's search_index_
    molecular_data job produces (:179-315) + scores JSON."""
    import json as _json

    six = full_dag.get("search_index")
    m1 = {r["external_model_id"]: r for r in six.collect()}["M1"]
    assert m1["markers_with_mutation_data"] == ["KRAS", "TP53"]
    assert m1["markers_with_cna_data"] == ["MYC"]
    assert m1["markers_with_expression_data"] == ["ESR1"]
    assert m1["markers_with_biomarker_data"] == ["ERBB2", "ESR1"]
    assert m1["msi_status"] == ["Stable"]
    assert m1["hla_types"] == ["HLA-A*02:01"]
    assert m1["breast_cancer_biomarkers"] == [
        "ER/ESR1 negative", "HER2/ERBB2 positive"]
    qa = _json.loads(m1["quality_assurance"])
    assert qa[0]["validation_technique"] == "Histology"
    scores = _json.loads(m1["scores"])
    assert 0 < scores["pdx_metadata_score"] <= 100
    pubs = _json.loads(m1["pdx_model_publications"])
    assert all("pub_med_id" in p for p in pubs)


def test_patient_sample_model_link(full_dag):
    ps = full_dag.get("patient_sample")
    model = full_dag.get("initial_model")
    mid = {r["external_model_id"]: r["id"] for r in model.collect()}
    got = {r["external_patient_sample_id"]: r["model_id"] for r in ps.collect()}
    assert got["S1"] == mid["M1"]
    assert got["S3"] == mid["C1"]
