"""Link-generation and treatment-type classification tests."""

from pdcm_etl_spark.transforms import links


def test_treatment_types_hof(spark):
    df = spark.createDataFrame(
        [
            ("cisplatin", ["Chemical Substance", "Pharmacologic Substance"]),
            ("tamoxifen", ["Hormone Antagonist", "hormone therapy agent"]),
            ("radiation therapy", None),
            ("mystery", ["Something Else"]),
        ],
        "treatment_name string, ancestors array<string>",
    )
    out = {r["treatment_name"]: r["types"] for r in
           df.select("treatment_name", links.treatment_types().alias("types")).collect()}
    assert out["cisplatin"] == ["Chemotherapy"]
    assert out["tamoxifen"] == ["Hormone Therapy"]
    assert out["radiation therapy"] == ["Radiation Therapy"]
    assert out["mystery"] == []


def test_regex_id_links(spark):
    md = spark.createDataFrame(
        [
            (1, "rs12345"),
            (2, "COSV5678, rs99"),
            (3, "nothing"),
            (4, None),
        ],
        "id long, variation_id string",
    )
    snp = {r["id"]: r["link"] for r in links.dbsnp_links(md).collect()}
    assert snp[1] == "https://www.ncbi.nlm.nih.gov/snp/rs12345"
    assert snp[2] == "https://www.ncbi.nlm.nih.gov/snp/rs99"
    assert snp[3] is None
    assert 4 not in snp
    cos = {r["id"]: r["link"] for r in links.cosmic_links(md).collect()}
    assert cos[2] == "https://cancer.sanger.ac.uk/cosmic/search?q=COSV5678"


def test_resource_lookup_links(spark):
    md = spark.createDataFrame(
        [(1, "TP53", "p.R175H"), (2, "KRAS", "p.G12D"), (3, "NOPE", "p.X1Y")],
        "id long, hgnc_symbol string, amino_acid_change string",
    )
    resources = spark.createDataFrame(
        [
            ("TP53", "Gene", "Civic", "https://civicdb.org/genes/TP53"),
            ("TP53 p.R175H", "Variant", "Civic", "https://civicdb.org/variants/TP53-R175H"),
            ("KRAS", "Gene", "OncoMx", "https://oncomx.org/KRAS"),
        ],
        "entry string, type string, resource string, link string",
    )
    gene = links.resource_lookup_links(md, resources, "hgnc_symbol", ["hgnc_symbol"], "Gene")
    got = {(r["id"], r["resource"]) for r in gene.collect()}
    assert got == {(1, "Civic"), (2, "OncoMx")}
    var = links.resource_lookup_links(
        md, resources, "amino_acid_change", ["hgnc_symbol", "amino_acid_change"], "Variant"
    )
    assert [(r["id"], r["link"]) for r in var.collect()] == [
        (1, "https://civicdb.org/variants/TP53-R175H")
    ]
