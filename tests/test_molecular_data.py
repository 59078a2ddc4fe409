"""Measurement-data + per-model molecular aggregate tests."""

import pytest
from pyspark.sql import functions as F

import fixtures
from pdcm_etl_spark.transforms import molecular as mol, molecular_data as md


@pytest.fixture(scope="module")
def molchar(spark):
    molchar_sample = fixtures.make_module_df(spark, "molchar_sample", [
        dict(model_id="M1", sample_id="MS1", sample_origin="patient", passage="0",
             platform_id="pl_mut", data_source_tmp="TRACE"),
        dict(model_id="M1", sample_id="MS2", sample_origin="xenograft", passage="1",
             platform_id="pl_bio", data_source_tmp="TRACE"),
        dict(model_id="M2", sample_id="MS3", sample_origin="patient", passage="0",
             platform_id="pl_imm", data_source_tmp="TRACE"),
    ])
    platform = fixtures.make_module_df(spark, "molchar_platform", [
        dict(platform_id="pl_mut", molecular_characterisation_type="mutation",
             data_source_tmp="TRACE"),
        dict(platform_id="pl_bio", molecular_characterisation_type="biomarker",
             data_source_tmp="TRACE"),
        dict(platform_id="pl_imm", molecular_characterisation_type="immunemarker",
             data_source_tmp="TRACE"),
    ])
    return mol.molecular_characterization(molchar_sample, platform)


def test_measurement_data_fk_and_stable_id(spark, molchar):
    raw_mut = fixtures.make_module_df(spark, "mutation", [
        dict(sample_id="MS1", symbol="TP53", platform_id="pl_mut",
             read_depth="44", data_source_tmp="TRACE"),
        dict(sample_id="MS1", symbol="KRAS", platform_id="pl_mut",
             read_depth="10", data_source_tmp="TRACE"),
        dict(sample_id="ORPHAN", symbol="TP53", platform_id="pl_mut",
             read_depth="1", data_source_tmp="TRACE"),
    ])
    out = md.measurement_data(raw_mut, molchar)
    rows = {(r["sample_id"], r["symbol"]): r for r in out.collect()}
    assert rows[("MS1", "TP53")]["molecular_characterization_id"] is not None
    assert rows[("ORPHAN", "TP53")]["molecular_characterization_id"] is None
    # ids stable across rebuilds
    out2 = md.measurement_data(raw_mut, molchar)
    assert {r["id"] for r in out.collect()} == {r["id"] for r in out2.collect()}


def test_per_model_aggregates(spark, molchar):
    mm = md.model_molchar(molchar)
    mc_id = {r["sample_id"]: r["id"] for r in molchar.collect()}

    mut = spark.createDataFrame(
        [(mc_id["MS1"], "TP53"), (mc_id["MS1"], "KRAS")],
        "molecular_characterization_id long, hgnc_symbol string",
    )
    genes = {r["model_id"]: r["markers_with_mutation_data"]
             for r in md.genes_per_model(mut, mm, "markers_with_mutation_data").collect()}
    assert genes["M1"] == ["KRAS", "TP53"]

    imm = spark.createDataFrame(
        [
            (mc_id["MS3"], "Model Genomics", "MSI", "Stable"),
            (mc_id["MS3"], "HLA type", "HLA-A*02", "present"),
        ],
        "molecular_characterization_id long, marker_type string, "
        "marker_name string, marker_value string",
    )
    msi = {r["model_id"]: r["msi_status"] for r in md.msi_status_per_model(imm, mm).collect()}
    assert msi == {"M2": ["Stable"]}
    hla = {r["model_id"]: r["hla_types"] for r in md.hla_types_per_model(imm, mm).collect()}
    assert hla == {"M2": ["HLA-A*02"]}

    bio = spark.createDataFrame(
        [
            (mc_id["MS2"], "ERBB2", "Positive"),
            (mc_id["MS2"], "ESR1", "negative"),
            (mc_id["MS2"], "OTHER", "positive"),
        ],
        "molecular_characterization_id long, biomarker string, biomarker_status string",
    )
    bc = {r["model_id"]: r["breast_cancer_biomarkers"]
          for r in md.breast_cancer_biomarkers_per_model(bio, mm).collect()}
    assert bc["M1"] == ["ER/ESR1 negative", "HER2/ERBB2 positive"]

    avail = {r["model_id"]: r["dataset_available"]
             for r in md.dataset_available_per_model(mm).collect()}
    assert avail["M1"] == ["biomarker", "mutation"]
    assert avail["M2"] == ["immunemarker"]
