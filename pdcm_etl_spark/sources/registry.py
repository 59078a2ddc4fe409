"""Source-module registry — the engine's equivalent of the reference's
``etl/sources.yaml`` (19 modules in 3 groups) + ``source_files_conf_reader
.py:8-22``. Declarative: module name → declared columns + file pattern.

Raw ingest is all-string (SURVEY §1.2); every module row carries the
``data_source_tmp`` provider column appended by the TSV reader.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Module:
    name: str
    columns: list[str]
    group: str = "metadata"
    # file name pattern inside a provider directory, $provider expands
    pattern: str = ""


MODULES: dict[str, Module] = {
    m.name: m
    for m in [
        Module(
            "source",
            [
                "provider_name", "provider_abbreviation", "provider_type", "project",
                "provider_page_title", "provider_description", "pdcm_resource_description",
            ],
            pattern="$provider/source.yaml",
        ),
        Module(
            "model",
            [
                "model_id", "host_strain_name", "host_strain_nomenclature",
                "engraftment_site", "engraftment_type", "sample_type", "sample_state",
                "passage_number", "publications", "external_ids", "supplier",
                "supplier_type", "catalog_number", "vendor_link", "parent_id",
                "origin_patient_sample_id",
            ],
            pattern="$provider/*_metadata-pdx_model.tsv",
        ),
        Module(
            "cell_model",
            [
                "model_id", "model_name", "model_name_aliases", "type",
                "growth_properties", "growth_media", "media_id", "parent_id",
                "origin_patient_sample_id", "publications", "plate_coating",
                "other_plate_coating", "passage_number", "contaminated",
                "contamination_details", "supplements", "drug", "drug_concentration",
                "external_ids", "supplier", "supplier_type", "catalog_number",
                "vendor_link", "rrid",
            ],
            pattern="$provider/*_metadata-cell_model.tsv",
        ),
        Module(
            "model_validation",
            [
                "model_id", "validation_technique", "description", "passages_tested",
                "validation_host_strain_nomenclature", "morphological_features",
                "SNP_analysis", "STR_analysis", "tumour_status", "model_purity",
                "comments",
            ],
            pattern="$provider/*_metadata-model_validation.tsv",
        ),
        Module(
            "patient",
            [
                "patient_id", "sex", "history", "ethnicity",
                "ethnicity_assessment_method", "initial_diagnosis",
                "age_at_initial_diagnosis", "age_category", "smoking_status",
                "alcohol_status", "alcohol_frequency", "family_history_of_cancer",
            ],
            pattern="$provider/*_metadata-patient.tsv",
        ),
        Module(
            "sample",
            [
                "patient_id", "sample_id", "collection_date", "collection_event",
                "months_since_collection_1", "age_in_years_at_collection", "diagnosis",
                "tumour_type", "primary_site", "collection_site", "stage",
                "staging_system", "grade", "grading_system", "virology_status",
                "sharable", "treatment_naive_at_collection", "treated_at_collection",
                "treated_prior_to_collection", "response_to_treatment", "model_id",
                "collection_method", "gene_mutation_status",
            ],
            pattern="$provider/*_metadata-patient_sample.tsv",
        ),
        Module(
            "sharing",
            [
                "model_id", "accessibility", "europdx_access_modality", "email",
                "name", "form_url", "database_url", "license", "date_submitted",
                "model_availability",
            ],
            pattern="$provider/*_metadata-sharing.tsv",
        ),
        Module(
            "drug_dosing",
            [
                "model_id", "passage_range", "treatment_name", "treatment_dose",
                "administration_route", "treatment_schedule", "treatment_length",
                "treatment_response", "response_classification",
            ],
            group="treatment",
            pattern="$provider/*_drugdosing-*.tsv",
        ),
        Module(
            "patient_treatment",
            [
                "patient_id", "treatment_name", "treatment_type", "treatment_dose",
                "treatment_starting_date", "treatment_duration", "treatment_event",
                "elapsed_time", "treatment_response", "response_classification",
                "model_id",
            ],
            group="treatment",
            pattern="$provider/*_patienttreatment-*.tsv",
        ),
        Module(
            "image_study",
            [
                "study_id", "title", "description", "licence", "contact",
                "sample_organism", "sample_description", "sample_preparation_protocol",
                "imaging_instrument", "image_acquisition_parameters", "imaging_method",
            ],
            pattern="$provider/*_metadata-image_study.tsv",
        ),
        Module(
            "model_image",
            [
                "model_id", "url", "description", "sample_type", "passage",
                "magnification", "staining",
            ],
            pattern="$provider/*_metadata-model_image.tsv",
        ),
        Module(
            "molchar_sample",
            [
                "model_id", "sample_id", "sample_origin", "passage",
                "host_strain_name", "host_strain_nomenclature",
                "engrafted_tumor_collection_site", "raw_data_url", "platform_id",
            ],
            group="molecular-metadata",
            pattern="$provider/*_molecular_metadata-sample.tsv",
        ),
        Module(
            "molchar_platform",
            [
                "platform_id", "molecular_characterisation_type", "instrument_model",
                "library_strategy", "library_selection", "library_notes",
                "genome_assembly",
            ],
            group="molecular-metadata",
            pattern="$provider/*_molecular_metadata-platform.tsv",
        ),
        Module(
            "molchar_platform_web",
            ["platform_id", "molecular_methods_description", "analysis_description"],
            group="molecular-metadata",
            pattern="$provider/*_molecular_metadata-platform_web.tsv",
        ),
        Module(
            "mutation",
            [
                "sample_id", "symbol", "biotype", "coding_sequence_change",
                "variant_class", "codon_change", "amino_acid_change", "consequence",
                "functional_prediction", "read_depth", "allele_frequency",
                "chromosome", "strand", "seq_start_position", "ref_allele",
                "alt_allele", "ucsc_gene_id", "ncbi_gene_id", "ncbi_transcript_id",
                "ensembl_gene_id", "ensembl_transcript_id", "variation_id",
                "platform_id",
            ],
            group="molecular-data",
            pattern="$provider/mut/*.tsv",
        ),
        Module(
            "cna",
            [
                "sample_id", "chromosome", "strand", "seq_start_position",
                "seq_end_position", "symbol", "ucsc_gene_id", "ncbi_gene_id",
                "ensembl_gene_id", "log10r_cna", "log2r_cna", "copy_number_status",
                "gistic_value", "picnic_value", "platform_id",
            ],
            group="molecular-data",
            pattern="$provider/cna/*.tsv",
        ),
        Module(
            "expression",
            [
                "sample_id", "chromosome", "strand", "seq_start_position",
                "seq_end_position", "symbol", "ucsc_gene_id", "ensembl_gene_id",
                "ncbi_gene_id", "rnaseq_coverage", "rnaseq_fpkm", "rnaseq_tpm",
                "rnaseq_count", "affy_hgea_probe_id", "affy_hgea_expression_value",
                "illumina_hgea_probe_id", "illumina_hgea_expression_value", "z_score",
                "platform_id",
            ],
            group="molecular-data",
            pattern="$provider/expression/*.tsv",
        ),
        Module(
            "biomarker",
            [
                "sample_id", "biomarker", "biomarker_status",
                "essential_or_additional_marker", "platform_id",
            ],
            group="molecular-data",
            pattern="$provider/biomarker/*.tsv",
        ),
        Module(
            "immunemarker",
            [
                "sample_id", "marker_type", "marker_name", "marker_value",
                "essential_or_additional_details", "platform_id",
            ],
            group="molecular-data",
            pattern="$provider/immunemarker/*.tsv",
        ),
        # auxiliary (non-per-provider) reference inputs
        Module(
            "diagnosis_mapping",
            ["datasource", "diagnosis", "primary_tissue", "tumor_type",
             "mapped_term_url"],
            group="auxiliary",
        ),
        Module(
            "treatment_mapping",
            ["datasource", "treatment", "mapped_term_url"],
            group="auxiliary",
        ),
        Module(
            "markers",
            ["hgnc_id", "approved_symbol", "approved_name", "status",
             "previous_symbols", "alias_symbols", "accession_numbers",
             "refseq_ids", "alias_names", "ensembl_gene_id", "ncbi_gene_id"],
            group="auxiliary",
        ),
        # downloaded annotation-resource entries (Civic/OncoMx/ClinGen/
        # CancerMine gene & variant lists — SURVEY §2.1 row 9,
        # external_resources_reader.py:62-104): one row per (resource,
        # entry); feeds links + the cancer_annotation_resources aggregate
        Module(
            "resource",
            ["entry", "resource", "type", "link"],
            group="auxiliary",
        ),
    ]
}


def module_columns(name: str) -> list[str]:
    return list(MODULES[name].columns)
