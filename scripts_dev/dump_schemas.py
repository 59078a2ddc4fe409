"""Dev utility: run the fixture DAG and print every entity's columns.

Usage: python scripts_dev/dump_schemas.py
"""
import os
import sys
import tempfile

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

from pdcm_etl_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="schema-dump")

import fixtures  # noqa: E402
from test_ontology import OBO_TEXT  # noqa: E402

raw = fixtures.metadata_fixture(spark)
mk = fixtures.make_module_df
raw["sample"] = mk(spark, "sample", [
    dict(patient_id="P1", sample_id="S1", diagnosis="Breast Carcinoma",
         tumour_type="primary", primary_site="breast", collection_site="breast",
         age_in_years_at_collection="45", stage="II", staging_system="TNM",
         grade="2", grading_system="G", model_id="M1",
         treated_prior_to_collection="yes", data_source_tmp="TRACE")])
raw["diagnosis_mapping"] = mk(spark, "diagnosis_mapping", [
    dict(datasource="TRACE", samplediagnosis="breast carcinoma", origintissue="breast",
         tumourtype="primary", mappedtermlabel="Breast Carcinoma",
         mappedtermurl="http://purl.obolibrary.org/obo/NCIT_C4872", maptype="direct")])
raw["drug_dosing"] = mk(spark, "drug_dosing", [
    dict(model_id="M1", passage_range="", treatment_name="CisPlatin", treatment_type="",
         treatment_dose="5 mg", treatment_schedule="", treatment_response="stable disease",
         response_classification="RECIST", data_source_tmp="TRACE")])
raw["patient_treatment"] = mk(spark, "patient_treatment", [
    dict(patient_id="P1", treatment_name="Tamoxifen + Carboplatin", treatment_dose="1 mg + 2 mg",
         treatment_response="progressive disease", response_classification="RECIST",
         data_source_tmp="TRACE")])
raw["molchar_sample"] = mk(spark, "molchar_sample", [
    dict(model_id="M1", sample_id="S1", sample_origin="patient", passage="",
         host_strain_nomenclature="", raw_data_url="", platform_id="pl1",
         data_source_tmp="TRACE")])
raw["molchar_platform"] = mk(spark, "molchar_platform", [
    dict(platform_id="pl1", molecular_characterisation_type="mutation",
         instrument_model="illumina", library_strategy="WGS", library_selection="",
         data_source_tmp="TRACE")])
raw["mutation"] = mk(spark, "mutation", [
    dict(sample_id="S1", symbol="TP53", platform_id="pl1", amino_acid_change="p.R1",
         chromosome="17", strand="+", consequence="missense", read_depth="10",
         allele_frequency="0.3", seq_start_position="7577", ref_allele="C", alt_allele="T",
         ncbi_gene_id="", ensembl_gene_id="", biotype="", data_source_tmp="TRACE")])
raw["markers"] = mk(spark, "markers", [
    dict(hgnc_id="HGNC:1", approved_symbol="TP53", approved_name="tp",
         status="Approved", previous_symbols="", alias_symbols="", chromosome="17",
         ensembl_gene_id="ENSG1", ncbi_gene_id="7157", refseq_ids="", alias_names="")])

from pdcm_etl_spark.sources.obo import read_obo  # noqa: E402

obo_path = os.path.join(tempfile.mkdtemp(), "ncit.obo")
with open(obo_path, "w") as f:
    f.write(OBO_TEXT)
raw["obo"] = read_obo(spark, obo_path)

from pdcm_etl_spark.plans.dag import build_metadata_dag  # noqa: E402

dag = build_metadata_dag(spark, raw)
for name in sorted(dag.nodes):
    try:
        df = dag.get(name)
        print(name, "::", ",".join(df.columns))
    except Exception as e:
        print(name, "!!", str(e).split(chr(10))[0][:120])
