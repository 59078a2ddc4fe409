"""Synthetic provider workload: derive a full set of raw provider modules
from the TPC-H-shaped test lake, deterministically, so the REAL entity
pipeline (plans/dag.py → search_index) can be run and benchmarked at any
scale factor — the reference's production workload shape (~56 providers ×
19 modules, SURVEY §6) rather than a hand-written 5-row fixture.

Mapping (all pure column expressions — no UDFs, no randomness):

| TPC table  | becomes                                             |
|------------|-----------------------------------------------------|
| region     | provider (`source` module), 1 provider per region   |
| customer   | `patient` (sex/ethnicity/age from key arithmetic)   |
| orders     | model (`model`/`cell_model` split 9:1), `sample`,   |
|            | `sharing`, `model_validation`, `molchar_sample`     |
| lineitem   | `mutation` rows (line 1..n), `drug_dosing` (line 1),|
|            | `patient_treatment` (line 2), `expression` (key%3=0)|
| range()    | `markers` (HGNC stand-in), obo ontology, mappings   |

Scale design: the only wide joins are orders⋈customer (provider lookup —
hash join on the natural key) and lineitem⋈orders (model/patient ids for
treatments); everything else is key arithmetic on the fact row itself, so
generation is map-side and the pipeline under test does the real work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdcm_etl_spark.sources.registry import module_columns
from pdcm_etl_spark.sources.tsv import PROVIDER_COL

N_DIAGNOSES = 97
N_SITES = 20
N_GENES = 2000
N_MARKERS = 1800  # < N_GENES → ~10% of symbols stay unharmonised
N_TREATMENTS = 50

_ETHNICITIES = ["caucasian", "hispanic", "asian", "african", None]
_RESPONSES = [
    "complete response", "partial response", "stable disease",
    "progressive disease",
]
_SITES_OF_ENGRAFTMENT = ["subcutaneous", "orthotopic", "renal capsule"]


def _finish(df: DataFrame, module: str) -> DataFrame:
    """Project onto the module's declared all-string schema (missing
    declared columns become null strings), provider column last.

    Built as selectExpr strings — one py4j call total instead of one per
    Column object (17 modules × ~15 cols of JVM round trips add up)."""
    have = set(df.columns)
    exprs = [
        f"CAST(`{c}` AS STRING) AS `{c}`"
        if c in have
        else f"CAST(NULL AS STRING) AS `{c}`"
        for c in module_columns(module)
    ]
    exprs.append(f"CAST(`{PROVIDER_COL}` AS STRING) AS `{PROVIDER_COL}`")
    return df.selectExpr(*exprs)


def _pick(col, options: list) -> F.Column:
    """Deterministic member of ``options`` keyed by a bigint column."""
    arr = F.array(*[F.lit(o).cast("string") for o in options])
    return F.element_at(arr, (col % len(options) + 1).cast("int"))


def synthesize_provider_modules(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """Build the full raw-module dict the metadata DAG consumes."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    prov_name = F.regexp_replace(F.col("r_name"), " ", "_")

    # provider registry: one per region
    source = _finish(
        region.select(
            F.col("r_name").alias("provider_name"),
            prov_name.alias("provider_abbreviation"),
            _pick(F.col("r_regionkey").cast("bigint"), ["Academia", "Government"])
            .alias("provider_type"),
            F.lit("SYNTH").alias("project"),
            prov_name.alias(PROVIDER_COL),
        ),
        "source",
    )

    # customer → provider lookup (broadcast both dims onto the fact side)
    cust_prov = customer.join(
        F.broadcast(
            nation.join(
                F.broadcast(region),
                nation.n_regionkey == region.r_regionkey,
            ).select(
                "n_nationkey",
                F.col("n_name").alias("nation_name"),
                prov_name.alias("prov"),
            )
        ),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "nation_name", "prov")
    # shared by patient + the orders spine below; checkpointing mirrors the
    # reference's materialize-raw-extraction-once step (spark_reader.py:108)
    # and truncates lineage so downstream analysis stays O(node)
    cust_prov = cust_prov.localCheckpoint(eager=False)

    patient = _finish(
        cust_prov.select(
            F.concat(F.lit("P"), "c_custkey").alias("patient_id"),
            _pick(F.col("c_custkey"), ["female", "male"]).alias("sex"),
            F.lower("nation_name").alias("ethnicity"),
            (F.lit(20) + F.col("c_custkey") % 60).alias("age_at_initial_diagnosis"),
            F.col("prov").alias(PROVIDER_COL),
        ),
        "patient",
    )

    # orders carry the model/sample spine; resolve provider + patient once
    ork = F.col("o_orderkey").cast("bigint")
    o = orders.join(
        cust_prov, orders.o_custkey == cust_prov.c_custkey
    ).select(
        ork.alias("ok"),
        F.concat(F.lit("P"), "c_custkey").alias("patient_id"),
        "prov",
    )
    is_cell = F.col("ok") % 10 == 0
    o = o.withColumn(
        "model_id",
        F.when(is_cell, F.concat(F.lit("C"), "ok")).otherwise(
            F.concat(F.lit("M"), "ok")
        ),
    ).withColumn("sample_id", F.concat(F.lit("S"), "ok"))
    # the model/sample spine feeds 8 modules — compute the o⋈customer
    # shuffle once (lineage-truncating, see plans/dag.py reuse policy)
    o = o.localCheckpoint(eager=False)

    pdx = o.filter(~is_cell)
    cell = o.filter(is_cell)

    model = _finish(
        pdx.select(
            "model_id",
            _pick(F.col("ok"), ["NOD SCID GAMMA", "NOD SCID", "nude"])
            .alias("host_strain_name"),
            _pick(F.col("ok"), ["NOD.Cg-Prkdc<scid>", "NOD.CB17", "Foxn1<nu>"])
            .alias("host_strain_nomenclature"),
            _pick(F.col("ok"), _SITES_OF_ENGRAFTMENT).alias("engraftment_site"),
            _pick(F.col("ok"), ["heterotopic", "orthotopic"]).alias("engraftment_type"),
            _pick(F.col("ok"), ["tissue fragment", "cell suspension"])
            .alias("sample_type"),
            _pick(F.col("ok"), ["fresh", "frozen"]).alias("sample_state"),
            (F.col("ok") % 9 + 1).alias("passage_number"),
            F.when(F.col("ok") % 5 == 0, F.concat(F.lit("PMID: "), F.col("ok") % 1000))
            .alias("publications"),
            # supplier block (reference model module columns) on every
            # 4th model so the search_index supplier columns populate
            F.when(F.col("ok") % 4 == 0, F.concat(F.lit("Vendor"), F.col("ok") % 7))
            .alias("supplier"),
            F.when(F.col("ok") % 4 == 0, F.lit("commercial")).alias("supplier_type"),
            F.when(F.col("ok") % 4 == 0, F.concat(F.lit("CAT-"), F.col("ok") % 500))
            .alias("catalog_number"),
            F.when(F.col("ok") % 4 == 0,
                   F.concat(F.lit("https://vendor.example.org/"), F.col("ok") % 500))
            .alias("vendor_link"),
            F.col("prov").alias(PROVIDER_COL),
        ),
        "model",
    )
    cell_model = _finish(
        cell.select(
            "model_id",
            F.concat(F.lit("CL-"), "ok").alias("model_name"),
            _pick(F.col("ok"), ["Cell Line", "tumour organoid", "2D: Other"])
            .alias("type"),
            F.when(F.col("ok") % 5 == 0, F.concat(F.lit("PMID: "), F.col("ok") % 1000))
            .alias("publications"),
            F.concat(F.lit("CVCL_"), F.col("ok") % 10000).alias("rrid"),
            F.col("prov").alias(PROVIDER_COL),
        ),
        "cell_model",
    )

    sharing = _finish(
        o.select(
            "model_id",
            _pick(F.col("ok"), ["academia only", "academia and industry"])
            .alias("accessibility"),
            F.when(F.col("ok") % 3 == 0, F.lit("transnational access"))
            .alias("europdx_access_modality"),
            F.when(F.col("ok") % 2 == 0,
                   F.concat(F.lit("contact"), F.col("ok") % 50, F.lit("@"),
                            F.lower("prov"), F.lit(".org"))).alias("email"),
            F.when(F.col("ok") % 2 == 0,
                   F.concat(F.lit("Dr "), F.col("ok") % 50)).alias("name"),
            F.concat(F.lit("http://"), F.lower("prov"), F.lit(".org/form"))
            .alias("form_url"),
            F.concat(F.lit("http://"), F.lower("prov"), F.lit(".org/db"))
            .alias("database_url"),
            _pick(F.col("ok"), ["EMBL-EBI", "CC0", "CC-BY 4.0"]).alias("license"),
            _pick(F.col("ok"), ["available", "unknown", "not available"])
            .alias("model_availability"),
            F.col("prov").alias(PROVIDER_COL),
        ),
        "sharing",
    )

    diag_idx = F.col("ok") % N_DIAGNOSES
    sample = _finish(
        o.select(
            "patient_id",
            "sample_id",
            "model_id",
            (F.lit(20) + F.col("ok") % 65).alias("age_in_years_at_collection"),
            F.concat(F.lit("Diagnosis "), diag_idx).alias("diagnosis"),
            _pick(F.col("ok"), ["primary", "metastatic"]).alias("tumour_type"),
            F.concat(F.lit("site"), diag_idx % N_SITES).alias("primary_site"),
            F.concat(F.lit("site"), (diag_idx + 1) % N_SITES).alias("collection_site"),
            _pick(F.col("ok"), ["I", "II", "III", "IV"]).alias("stage"),
            F.lit("TNM").alias("staging_system"),
            _pick(F.col("ok"), ["1", "2", "3"]).alias("grade"),
            F.lit("G").alias("grading_system"),
            _pick(F.col("ok"), ["yes", "no"]).alias("treated_prior_to_collection"),
            F.col("prov").alias(PROVIDER_COL),
        ),
        "sample",
    )

    model_validation = _finish(
        pdx.filter(F.col("ok") % 7 == 0).select(
            "model_id",
            _pick(F.col("ok"), ["histology", "STR analysis", "SNP analysis"])
            .alias("validation_technique"),
            F.lit("matches patient tumour").alias("description"),
            F.concat(F.col("ok") % 3 + 1).alias("passages_tested"),
            F.col("prov").alias(PROVIDER_COL),
        ),
        "model_validation",
    )

    # treatments: lineitem line 1 → drug dosing (pdx), line 2 → patient tx
    lk = F.col("l_orderkey").cast("bigint")
    li = lineitem.select(
        lk.alias("ok"),
        F.col("l_linenumber").cast("int").alias("ln"),
        F.col("l_partkey").cast("bigint").alias("pk"),
        F.col("l_quantity").cast("int").alias("qty"),
    )
    # lineitem⋈orders feeds 4 modules (dosing, patient tx, mutation,
    # expression) — one shuffle, reused
    li_o = li.join(o, "ok").localCheckpoint(eager=False)
    drug = F.concat(F.lit("drug "), F.col("pk") % N_TREATMENTS)
    # every third protocol is a 2-drug combination ('+'-separated, the
    # reference's posexplode positional-dose shape)
    drug2 = F.concat(drug, F.lit(" + drug "), (F.col("pk") + 1) % N_TREATMENTS)
    dose1 = F.concat(F.col("qty") % 20 + 1, F.lit(" mg"))
    dose2 = F.concat(dose1, F.lit(" + "), F.col("qty") % 10 + 1, F.lit(" mg"))
    drug_dosing = _finish(
        li_o.filter((F.col("ln") == 1) & ~is_cell).select(
            "model_id",
            F.when(F.col("ok") % 3 == 0, drug2).otherwise(drug)
            .alias("treatment_name"),
            F.when(F.col("ok") % 3 == 0, dose2).otherwise(dose1)
            .alias("treatment_dose"),
            _pick(F.col("pk"), _RESPONSES).alias("treatment_response"),
            F.lit("RECIST 1.1").alias("response_classification"),
            F.col("prov").alias(PROVIDER_COL),
        ),
        "drug_dosing",
    )
    patient_treatment = _finish(
        li_o.filter(F.col("ln") == 2).select(
            "patient_id",
            "model_id",
            drug.alias("treatment_name"),
            dose1.alias("treatment_dose"),
            _pick(F.col("pk") + 1, _RESPONSES).alias("treatment_response"),
            F.lit("RECIST 1.1").alias("response_classification"),
            F.col("prov").alias(PROVIDER_COL),
        ),
        "patient_treatment",
    )

    # molecular metadata: every sample sequenced for mutation; every third
    # also has expression; every 4th/5th/6th cna / immunemarker / biomarker
    platforms = source.select(F.col(PROVIDER_COL).alias("prov")).crossJoin(
        spark.createDataFrame(
            [
                ("pl_mut", "mutation", "Illumina NovaSeq", "WGS"),
                ("pl_expr", "expression", "Illumina NovaSeq", "RNA-Seq"),
                ("pl_cna", "copy number alteration", "Affymetrix SNP6", "arrays"),
                ("pl_imm", "immunemarker", "IHC", "targeted"),
                ("pl_bio", "bio markers", "IHC", "targeted"),
            ],
            ["platform_id", "molecular_characterisation_type",
             "instrument_model", "library_strategy"],
        )
    )
    molchar_platform = _finish(
        platforms.select(
            "platform_id", "molecular_characterisation_type",
            "instrument_model", "library_strategy",
            F.col("prov").alias(PROVIDER_COL),
        ),
        "molchar_platform",
    )
    # raw_data_url: alternate archive accessions so raw_data_resources has
    # a deterministic per-model set ('ENA'/'EGA'/none)
    raw_url = (
        F.when(F.col("ok") % 3 == 0,
               F.concat(F.lit("ENA:ERP"), F.col("ok") % 900))
        .when(F.col("ok") % 3 == 1,
              F.concat(F.lit("EGA:EGAS"), F.col("ok") % 900))
    )
    mc_base = o.select(
        "model_id", "sample_id", "ok",
        F.lit("patient").alias("sample_origin"),
        F.lit("0").alias("passage"),
        raw_url.alias("raw_data_url"),
        F.col("prov").alias(PROVIDER_COL),
    )
    molchar_sample = _finish(
        mc_base.withColumn("platform_id", F.lit("pl_mut"))
        .unionByName(
            mc_base.filter(F.col("ok") % 3 == 0)
            .withColumn("platform_id", F.lit("pl_expr"))
        )
        .unionByName(
            mc_base.filter(F.col("ok") % 4 == 0)
            .withColumn("platform_id", F.lit("pl_cna"))
        )
        .unionByName(
            mc_base.filter(F.col("ok") % 5 == 0)
            .withColumn("platform_id", F.lit("pl_imm"))
        )
        .unionByName(
            mc_base.filter(F.col("ok") % 6 == 0)
            .withColumn("platform_id", F.lit("pl_bio"))
        )
        .drop("ok"),
        "molchar_sample",
    )

    gene = F.concat(F.lit("GENE"), F.col("pk") % N_GENES)
    mutation = _finish(
        li_o.select(
            "sample_id",
            gene.alias("symbol"),
            _pick(F.col("pk"), ["missense_variant", "stop_gained", "frameshift"])
            .alias("consequence"),
            (F.col("pk") % 23 + 1).alias("chromosome"),
            F.col("qty").alias("read_depth"),
            (F.col("pk") % 1000).alias("seq_start_position"),
            _pick(F.col("pk"), ["A", "C", "G", "T"]).alias("ref_allele"),
            _pick(F.col("pk") + 1, ["A", "C", "G", "T"]).alias("alt_allele"),
            (F.col("pk") % N_GENES + 100000).alias("ncbi_gene_id"),
            F.lit("pl_mut").alias("platform_id"),
            F.col("prov").alias(PROVIDER_COL),
        ),
        "mutation",
    )
    expression = _finish(
        li_o.filter(F.col("ok") % 3 == 0).select(
            "sample_id",
            gene.alias("symbol"),
            (F.col("qty") * 100 + F.col("pk") % 100).alias("rnaseq_fpkm"),
            F.lit("pl_expr").alias("platform_id"),
            F.col("prov").alias(PROVIDER_COL),
        ),
        "expression",
    )
    cna = _finish(
        li_o.filter(F.col("ok") % 4 == 0).select(
            "sample_id",
            gene.alias("symbol"),
            (F.col("pk") % 23 + 1).alias("chromosome"),
            (F.col("pk") % 1000).alias("seq_start_position"),
            (F.col("pk") % 1000 + 500).alias("seq_end_position"),
            _pick(F.col("pk"), ["gain", "loss", "neutral"])
            .alias("copy_number_status"),
            (F.col("qty") % 5 - 2).alias("gistic_value"),
            F.lit("pl_cna").alias("platform_id"),
            F.col("prov").alias(PROVIDER_COL),
        ),
        "cna",
    )
    # biomarker: line 1 of every 6th order carries a breast-cancer IHC
    # panel gene; other lines carry plain GENE symbols
    bc_gene = _pick(F.col("pk"), ["ERBB2", "ESR1", "PGR"])
    biomarker = _finish(
        li_o.filter(F.col("ok") % 6 == 0).select(
            "sample_id",
            F.when(F.col("ln") == 1, bc_gene).otherwise(gene).alias("biomarker"),
            _pick(F.col("pk") + 1, ["Positive", "Negative", "Undetermined"])
            .alias("biomarker_status"),
            F.lit("essential").alias("essential_or_additional_marker"),
            F.lit("pl_bio").alias("platform_id"),
            F.col("prov").alias(PROVIDER_COL),
        ),
        "biomarker",
    )
    # immunemarker: every 5th order gets an MSI call; every 10th also HLA
    imm_base = o.filter(F.col("ok") % 5 == 0)
    immunemarker = _finish(
        imm_base.select(
            "sample_id",
            F.lit("Model Genomics").alias("marker_type"),
            F.lit("MSI").alias("marker_name"),
            _pick(F.col("ok"), ["Stable", "Instable high", "Instable low"])
            .alias("marker_value"),
            F.lit("pl_imm").alias("platform_id"),
            F.col("prov").alias(PROVIDER_COL),
        )
        .unionByName(
            imm_base.filter(F.col("ok") % 10 == 0).select(
                "sample_id",
                F.lit("HLA type").alias("marker_type"),
                F.concat(F.lit("HLA-A*"), F.col("ok") % 30).alias("marker_name"),
                F.lit("present").alias("marker_value"),
                F.lit("pl_imm").alias("platform_id"),
                F.col("prov").alias(PROVIDER_COL),
            )
        ),
        "immunemarker",
    )
    model_image = _finish(
        pdx.filter(F.col("ok") % 8 == 0).select(
            "model_id",
            F.concat(F.lit("https://images.example.org/"), "model_id",
                     F.lit(".png")).alias("url"),
            F.lit("tumour section").alias("description"),
            _pick(F.col("ok"), ["tumour", "xenograft"]).alias("sample_type"),
            (F.col("ok") % 5).alias("passage"),
            F.lit("20x").alias("magnification"),
            F.lit("H&E").alias("staining"),
            F.col("prov").alias(PROVIDER_COL),
        ),
        "model_image",
    )
    # downloaded annotation-resource entries: fixed gene slices per
    # resource so cancer_annotation_resources is key arithmetic too
    resource_defs = spark.createDataFrame(
        [("CIViC", 0, 400), ("OncoMX", 200, 700), ("ClinGen", 600, 1200),
         ("CancerMine", 1000, 1800)],
        ["resource_name", "lo", "hi"],
    )
    resource = _finish(
        spark.range(N_GENES).alias("g")
        .join(
            F.broadcast(resource_defs),
            (F.col("id") >= F.col("lo")) & (F.col("id") < F.col("hi")),
        )
        .select(
            F.concat(F.lit("GENE"), F.col("id")).alias("entry"),
            F.col("resource_name").alias("resource"),
            F.lit("Gene").alias("type"),
            F.concat(F.lit("https://resources.example.org/"),
                     F.col("resource_name"), F.lit("/"), F.col("id"))
            .alias("link"),
            F.lit("SYNTH").alias(PROVIDER_COL),
        ),
        "resource",
    )

    # HGNC stand-in: the first N_MARKERS genes are approved symbols
    markers = _finish(
        spark.range(N_MARKERS).select(
            F.concat(F.lit("HGNC:"), F.col("id")).alias("hgnc_id"),
            F.concat(F.lit("GENE"), F.col("id")).alias("approved_symbol"),
            F.concat(F.lit("gene "), F.col("id")).alias("approved_name"),
            F.lit("Approved").alias("status"),
            (F.col("id") + 100000).alias("ncbi_gene_id"),
            F.lit("SYNTH").alias(PROVIDER_COL),
        ),
        "markers",
    )

    # mini NCIt: a diagnosis branch, a treatment branch, a regimen root
    diag_terms = spark.range(N_DIAGNOSES).select(
        F.concat(F.lit("NCIT:D"), "id").alias("term_id"),
        F.concat(F.lit("Diagnosis "), F.col("id"), F.lit(" Neoplasm"))
        .alias("term_name"),
        F.concat(F.lit("http://purl.obolibrary.org/obo/NCIT_D"), "id")
        .alias("term_url"),
        F.lit("NCIT:C9305").alias("is_a"),
    )
    # drugs hang off typed intermediate classes so the treatment-type
    # keyword classifier (transforms/links.py KEYWORDS_BY_TYPE) finds
    # matches in the ancestor closure: 1/3 cytotoxic, 1/3 immuno, 1/3
    # unclassified (direct child of the root)
    trt_parent = (
        F.when(F.col("id") % 3 == 0, F.lit("NCIT:TCHEMO"))
        .when(F.col("id") % 3 == 1, F.lit("NCIT:TIMMUNO"))
        .otherwise(F.lit("NCIT:C1932"))
    )
    trt_terms = spark.range(N_TREATMENTS).select(
        F.concat(F.lit("NCIT:T"), "id").alias("term_id"),
        F.concat(F.lit("drug "), F.col("id")).alias("term_name"),
        F.concat(F.lit("http://purl.obolibrary.org/obo/NCIT_T"), "id")
        .alias("term_url"),
        trt_parent.alias("is_a"),
    )
    roots = spark.createDataFrame(
        [
            ("NCIT:C9305", "Malignant Neoplasm",
             "http://purl.obolibrary.org/obo/NCIT_C9305", ""),
            ("NCIT:C1932", "Chemical Modifier",
             "http://purl.obolibrary.org/obo/NCIT_C1932", ""),
            ("NCIT:TCHEMO", "Cytotoxic Chemotherapy Agent",
             "http://purl.obolibrary.org/obo/NCIT_TCHEMO", "NCIT:C1932"),
            ("NCIT:TIMMUNO", "Immunotherapy Agent",
             "http://purl.obolibrary.org/obo/NCIT_TIMMUNO", "NCIT:C1932"),
            ("NCIT:C12218", "Treatment Regimen",
             "http://purl.obolibrary.org/obo/NCIT_C12218", ""),
        ],
        ["term_id", "term_name", "term_url", "is_a"],
    )
    obo = roots.unionByName(diag_terms).unionByName(trt_terms)

    # curated mappings: every (provider, diagnosis, tissue, tumour type)
    # combination the sample generator can emit
    diag_space = spark.range(N_DIAGNOSES).crossJoin(
        source.select(F.col(PROVIDER_COL).alias("datasource"))
    ).crossJoin(
        spark.createDataFrame([("primary",), ("metastatic",)], ["tumor_type"])
    )
    diagnosis_mapping = _finish(
        diag_space.select(
            "datasource",
            F.concat(F.lit("Diagnosis "), "id").alias("diagnosis"),
            F.concat(F.lit("site"), F.col("id") % N_SITES).alias("primary_tissue"),
            "tumor_type",
            F.concat(F.lit("http://purl.obolibrary.org/obo/NCIT_D"), "id")
            .alias("mapped_term_url"),
            F.col("datasource").alias(PROVIDER_COL),
        ),
        "diagnosis_mapping",
    )
    treatment_mapping = _finish(
        spark.range(N_TREATMENTS)
        .crossJoin(source.select(F.col(PROVIDER_COL).alias("datasource")))
        .select(
            "datasource",
            F.concat(F.lit("drug "), "id").alias("treatment"),
            F.concat(F.lit("http://purl.obolibrary.org/obo/NCIT_T"), "id")
            .alias("mapped_term_url"),
            F.col("datasource").alias(PROVIDER_COL),
        ),
        "treatment_mapping",
    )

    return {
        "source": source,
        "patient": patient,
        "model": model,
        "cell_model": cell_model,
        "sharing": sharing,
        "sample": sample,
        "model_validation": model_validation,
        "drug_dosing": drug_dosing,
        "patient_treatment": patient_treatment,
        "molchar_sample": molchar_sample,
        "molchar_platform": molchar_platform,
        "mutation": mutation,
        "expression": expression,
        "cna": cna,
        "biomarker": biomarker,
        "immunemarker": immunemarker,
        "model_image": model_image,
        "resource": resource,
        "markers": markers,
        "obo": obo,
        "diagnosis_mapping": diagnosis_mapping,
        "treatment_mapping": treatment_mapping,
    }


# stable search_index projection for the flagship entry/bench query —
# the REFERENCE's full declared column list, in registry order
# (entities_registry.py:621-692 SEARCH_INDEX_ENTITY
# expected_database_columns). Fixed so the result schema never depends on
# which optional aggregates a module set produces; columns a workload
# doesn't populate surface as null strings (exactly like the reference's
# left-join chain).
SEARCH_INDEX_COLUMNS = [
    "pdcm_model_id", "external_model_id", "data_source", "project_name",
    "provider_name", "model_type", "supplier", "supplier_type",
    "catalog_number", "vendor_link", "rrid", "external_ids", "histology",
    "search_terms", "cancer_system", "dataset_available", "license_name",
    "license_url", "primary_site", "collection_site", "tumour_type",
    "cancer_grade", "cancer_grading_system", "cancer_stage",
    "cancer_staging_system", "patient_id", "patient_age",
    "patient_age_category", "patient_sex", "patient_history",
    "patient_ethnicity", "patient_ethnicity_assessment_method",
    "patient_initial_diagnosis", "patient_age_at_initial_diagnosis",
    "patient_sample_id", "patient_sample_collection_date",
    "patient_sample_collection_event", "patient_sample_collection_method",
    "patient_sample_months_since_collection_1",
    "patient_sample_gene_mutation_status", "patient_sample_virology_status",
    "patient_sample_sharable", "patient_sample_treatment_naive_at_collection",
    "patient_sample_treated_at_collection",
    "patient_sample_treated_prior_to_collection",
    "patient_sample_response_to_treatment", "pdx_model_publications",
    "quality_assurance", "xenograft_model_specimens", "model_images",
    "markers_with_cna_data", "markers_with_mutation_data",
    "markers_with_expression_data", "markers_with_biomarker_data",
    "breast_cancer_biomarkers", "msi_status", "hla_types",
    "patient_treatments", "patient_treatments_responses", "model_treatments",
    "model_treatments_responses", "custom_treatment_type_list",
    "raw_data_resources", "cancer_annotation_resources",
    "model_availability", "date_submitted", "scores",
]

# the 17-column spine (hash-checked against a pure-SQL DuckDB oracle via
# the etl_search_index_spine catalog query)
SEARCH_INDEX_CORE_COLUMNS = [
    "pdcm_model_id", "external_model_id", "data_source", "model_type",
    "provider_name", "project_name", "histology", "cancer_system",
    "primary_site", "collection_site", "tumour_type", "patient_age",
    "patient_sex", "patient_ethnicity", "dataset_available",
    "model_treatments", "markers_with_mutation_data",
]


def _project_columns(six: DataFrame, columns: list[str]) -> DataFrame:
    """Fixed-list projection with array serialization: arrays are
    '|'-joined (sorted upstream) — the reference flattens these to
    `{a,b}` literals at export the same way; the string form also keeps
    the driver canonicalizer hash-stable. Missing columns → null strings
    (the reference's left-join chain yields NULL there too)."""
    from pyspark.sql.types import ArrayType

    array_cols = {f.name for f in six.schema.fields if isinstance(f.dataType, ArrayType)}
    cols = []
    for c in columns:
        if c not in six.columns:
            cols.append(F.lit(None).cast("string").alias(c))
        elif c in array_cols:
            cols.append(F.array_join(F.col(c).cast("array<string>"), "|").alias(c))
        else:
            cols.append(F.col(c).cast("string").alias(c))
    return six.select(*cols)


def run_etl_search_index(
    spark: SparkSession, sf_dir: str, columns: list[str] | None = None
) -> DataFrame:
    """The flagship query: full metadata DAG over the synthetic provider
    workload, returning the denormalized search_index with the
    reference's full declared column list."""
    from pdcm_etl_spark.plans.dag import build_metadata_dag

    raw = synthesize_provider_modules(spark, sf_dir)
    dag = build_metadata_dag(spark, raw)
    out = dag.run(targets=["search_index"])
    return _project_columns(out["search_index"], columns or SEARCH_INDEX_COLUMNS)
