"""Synthetic raw-module fixtures per FIXTURES.md (all-string columns +
data_source_tmp provenance), mirroring the reference's inline-dict test
style (tests/etl/env.py)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from pdcm_etl_spark.sources.registry import module_columns
from pdcm_etl_spark.sources.tsv import PROVIDER_COL, string_schema


def make_module_df(spark: SparkSession, module: str, rows: list[dict]):
    cols = module_columns(module) + [PROVIDER_COL]
    schema = string_schema(cols)
    data = [tuple(r.get(c) for c in cols) for r in rows]
    return spark.createDataFrame(data, schema)


def metadata_fixture(spark: SparkSession) -> dict:
    """Two providers (TRACE, PDMR) exercising: NBSP/trim cleanup, null
    ethnicity, shared publications, null contact name/email (null-safe
    join), PDX + cell model union, license matching."""
    source = make_module_df(spark, "source", [
        dict(provider_name="Trace Institute", provider_abbreviation="TRACE",
             provider_type="Academia", project="EurOPDX", data_source_tmp="TRACE"),
        dict(provider_name="PDMR Repository", provider_abbreviation="PDMR",
             provider_type="Government", project="PDMR", data_source_tmp="PDMR"),
    ])
    patient = make_module_df(spark, "patient", [
        dict(patient_id="P1", sex="female", ethnicity="  caucasian ",
             age_at_initial_diagnosis="45", data_source_tmp="TRACE"),
        dict(patient_id="P2", sex="male", ethnicity=None,
             age_at_initial_diagnosis="61", data_source_tmp="TRACE"),
        dict(patient_id="P3", sex="female", ethnicity="hispanic",
             age_at_initial_diagnosis="2", data_source_tmp="PDMR"),
        dict(patient_id=None, sex="male", ethnicity="caucasian",
             data_source_tmp="PDMR"),  # dropped: null patient_id
    ])
    model = make_module_df(spark, "model", [
        dict(model_id="M1", publications="PMID: 123", supplier="TRACE",
             data_source_tmp="TRACE"),
        dict(model_id="M2", publications=None, data_source_tmp="TRACE"),
        dict(model_id="M3", publications="PMID: 123", data_source_tmp="PDMR"),
    ])
    cell_model = make_module_df(spark, "cell_model", [
        dict(model_id="C1", type="Cell Line", model_name="CL-1",
             publications="PMID: 999", rrid="CVCL_1", data_source_tmp="TRACE"),
        dict(model_id="C2", type="tumour organoid", model_name="ORG-2",
             data_source_tmp="PDMR"),
        dict(model_id="C3", type="mystery", model_name="X-3",
             data_source_tmp="PDMR"),
    ])
    sharing = make_module_df(spark, "sharing", [
        dict(model_id="M1", accessibility="academia only",
             europdx_access_modality="transnational access", email="a@trace.org",
             name="Dr A", form_url="http://trace.org/form",
             database_url="http://trace.org/db", license="EMBL-EBI",
             data_source_tmp="TRACE"),
        dict(model_id="M2", accessibility="academia and industry",
             europdx_access_modality=None, email=None, name=None,
             form_url=None, database_url=None, license="CC0",
             data_source_tmp="TRACE"),
        dict(model_id="M3", accessibility="academia only",
             europdx_access_modality=None, email="b@pdmr.gov", name=None,
             form_url="http://pdmr.gov/form", database_url=None,
             license="unknown-license", data_source_tmp="PDMR"),
        dict(model_id="C1", accessibility="academia only",
             europdx_access_modality="transnational access", email="a@trace.org",
             name="Dr A", form_url="http://trace.org/form", database_url=None,
             license="EMBL-EBI", data_source_tmp="TRACE"),
        dict(model_id="C2", accessibility="academia and industry",
             europdx_access_modality=None, email=None, name=None, form_url=None,
             database_url=None, license="CC0", data_source_tmp="PDMR"),
    ])
    return {
        "source": source,
        "patient": patient,
        "model": model,
        "cell_model": cell_model,
        "sharing": sharing,
    }
