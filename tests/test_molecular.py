"""Molecular-cluster tests: symbol-harmonisation cascade (incl. the
ambiguous previous-symbol rule) and molecular characterization union."""

import pytest
from pyspark.sql import functions as F

import fixtures
from pdcm_etl_spark.transforms import molecular as mol


@pytest.fixture(scope="module")
def markers(spark):
    raw = spark.createDataFrame(
        [
            # (hgnc_id, approved_symbol, previous_symbols, alias_symbols, ensembl, ncbi)
            ("HGNC:1", "TP53", "LFS1", "p53", "ENSG01", "7157"),
            ("HGNC:2", "KRAS", "KRAS2, RASK2", "K-ras", "ENSG02", "3845"),
            # AMBIG is a previous symbol of TWO genes -> must not match
            ("HGNC:3", "GENE3", "AMBIG", None, "ENSG03", "111"),
            ("HGNC:4", "GENE4", "AMBIG", None, "ENSG04", "222"),
        ],
        "hgnc_id string, approved_symbol string, previous_symbols string, "
        "alias_symbols string, ensembl_gene_id string, ncbi_gene_id string",
    )
    gm = mol.gene_marker(raw)
    return dict(
        gm=gm,
        prev=mol.previous_symbols(gm),
        alias=mol.alias_symbols(gm),
    )


@pytest.fixture(scope="module")
def harmonised(spark, markers):
    molecular = spark.createDataFrame(
        [
            ("S1", "TP53", None, None),          # approved
            ("S1", "LFS1", None, None),          # previous (unique)
            ("S2", "KRAS2", None, None),         # previous (unique, comma-split)
            ("S2", "p53", None, None),           # alias (unique)
            ("S3", "AMBIG", None, None),         # ambiguous previous -> no_mapping
            ("S3", "UNKNOWN", "ENSG02", None),   # ensembl fallback
            ("S4", "UNKNOWN2", None, "7157"),    # ncbi fallback
            ("S4", "NOPE", None, None),          # no_mapping
        ],
        "sample_id string, symbol string, ensembl_gene_id string, ncbi_gene_id string",
    )
    return mol.harmonise_marker_symbols(
        molecular, markers["gm"], markers["prev"], markers["alias"]
    )


def test_cascade_stages(harmonised):
    got = {
        r["non_harmonised_symbol"]: (r["harmonisation_result"], r["hgnc_symbol"])
        for r in harmonised.collect()
    }
    assert got["TP53"] == ("approved_symbol", "TP53")
    assert got["LFS1"] == ("previous_symbol", "TP53")
    assert got["KRAS2"] == ("previous_symbol", "KRAS")
    assert got["p53"] == ("alias_symbol", "TP53")
    assert got["UNKNOWN"] == ("ensembl_gene_id", "KRAS")
    assert got["UNKNOWN2"] == ("ncbi_gene_id", "TP53")
    assert got["NOPE"] == ("no_mapping", None)


def test_ambiguous_previous_symbol_is_not_matched(harmonised):
    row = harmonised.filter(F.col("non_harmonised_symbol") == "AMBIG").collect()[0]
    assert row["harmonisation_result"] == "no_mapping"
    assert row["gene_marker_id"] is None


def test_row_count_preserved(harmonised):
    assert harmonised.count() == 8


def test_molecular_characterization(spark):
    molchar_sample = fixtures.make_module_df(spark, "molchar_sample", [
        dict(model_id="M1", sample_id="MS1", sample_origin="Patient", passage="0",
             platform_id="pl1", data_source_tmp="TRACE"),
        dict(model_id="M1", sample_id="MS2", sample_origin="xenograft", passage="2",
             platform_id="pl1", data_source_tmp="TRACE"),
        dict(model_id="C1", sample_id="MS3", sample_origin="cell", passage=None,
             platform_id="pl2", data_source_tmp="TRACE"),
    ])
    platform = fixtures.make_module_df(spark, "molchar_platform", [
        dict(platform_id="pl1", molecular_characterisation_type="mutation",
             instrument_model="Illumina", library_strategy="WGS",
             data_source_tmp="TRACE"),
        dict(platform_id="pl2", molecular_characterisation_type="expression",
             instrument_model="Illumina", library_strategy="RNA-Seq",
             data_source_tmp="TRACE"),
    ])
    mc = mol.molecular_characterization(molchar_sample, platform)
    got = {r["sample_id"]: r for r in mc.collect()}
    assert got["MS1"]["sample_origin"] == "patient"
    assert got["MS1"]["molchar_type"] == "mutation"
    assert got["MS3"]["molchar_type"] == "expression"
    assert got["MS1"]["platform_id"] is not None
    assert mc.count() == 3
