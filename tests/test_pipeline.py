"""Pipeline entry-point test: UPDOG-style provider dir (TSV + source.yaml)
→ extract → DAG → parquet lake + views."""

import os

from pdcm_etl_spark.pipeline import discover_providers, run_pipeline


def _write_tsv(path, columns, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\t".join(columns) + "\n")
        for r in rows:
            f.write("\t".join("" if r.get(c) is None else str(r.get(c)) for c in columns) + "\n")


def test_pipeline_from_provider_dir(spark, tmp_path):
    data = tmp_path / "data"
    prov = data / "TRACE"
    _write_tsv(
        str(prov / "TRACE_metadata-patient.tsv"),
        ["patient_id", "sex", "history", "ethnicity", "ethnicity_assessment_method",
         "initial_diagnosis", "age_at_initial_diagnosis", "age_category",
         "smoking_status", "alcohol_status", "alcohol_frequency",
         "family_history_of_cancer"],
        [dict(patient_id="P1", sex="female", ethnicity="caucasian"),
         dict(patient_id="P2", sex="male")],
    )
    _write_tsv(
        str(prov / "TRACE_metadata-pdx_model.tsv"),
        ["model_id", "host_strain_name", "host_strain_nomenclature",
         "engraftment_site", "engraftment_type", "sample_type", "sample_state",
         "passage_number", "publications", "external_ids", "supplier",
         "supplier_type", "catalog_number", "vendor_link", "parent_id",
         "origin_patient_sample_id"],
        [dict(model_id="M1", publications="PMID: 123")],
    )
    _write_tsv(
        str(prov / "TRACE_metadata-cell_model.tsv"),
        ["model_id", "model_name", "model_name_aliases", "type",
         "growth_properties", "growth_media", "media_id", "parent_id",
         "origin_patient_sample_id", "publications", "plate_coating",
         "other_plate_coating", "passage_number", "contaminated",
         "contamination_details", "supplements", "drug", "drug_concentration",
         "external_ids", "supplier", "supplier_type", "catalog_number",
         "vendor_link", "rrid"],
        [dict(model_id="C1", type="cell line", model_name="CL-1")],
    )
    _write_tsv(
        str(prov / "TRACE_metadata-sharing.tsv"),
        ["model_id", "accessibility", "europdx_access_modality", "email", "name",
         "form_url", "database_url", "license", "date_submitted",
         "model_availability"],
        [dict(model_id="M1", accessibility="academia only", license="CC0")],
    )
    (prov / "source.yaml").parent.mkdir(parents=True, exist_ok=True)
    (prov / "source.yaml").write_text(
        "provider_name: Trace Institute\n"
        "provider_abbreviation: TRACE\n"
        "provider_type: Academia\n"
        "project: EurOPDX\n"
    )

    assert discover_providers(str(data)) == ["TRACE"]
    out = tmp_path / "lake"
    entities = run_pipeline(spark, str(data), str(out), release_name="test-r1")

    patients = {r["external_patient_id"] for r in entities["patient"].collect()}
    assert patients == {"P1", "P2"}
    models = {r["external_model_id"]: r["type"] for r in entities["model"].collect()}
    assert models == {"M1": "PDX", "C1": "cell line"}
    pg = entities["provider_group"].collect()[0]
    assert pg["abbreviation"] == "TRACE"

    # lake written per entity + release info
    assert (out / "patient").exists() and (out / "model").exists()
    assert (out / "release_info").exists()
    # views registered
    types = {r["model_type"]: r["n_models"] for r in
             spark.table("models_by_type").collect()}
    assert types == {"PDX": 1, "cell line": 1}
