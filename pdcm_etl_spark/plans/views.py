"""Spark SQL view layer — the engine's query surface.

The reference's API is ~50 Postgres views/matviews (scripts/views.sql:
2-1549, data_visualization_views.sql). Here each view is a Spark SQL
statement over the entity temp views; matviews become saved tables
recomputed in-pipeline (SURVEY §4).

Operator parity with views.sql:
- unnest + GROUP BY            → explode + groupBy      (views.sql:1113-1141)
- jsonb_agg(struct)            → to_json(collect_list(struct)) (:1147-1162)
- cardinality(array)           → size()                 (:818-842)
- IN (SELECT DISTINCT …)       → semi join              (:1055-1064)
- SPLIT_PART(x,'/',1)          → split(x,'/')[0]        (:1113-1126)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# name → SQL over the registered entity views. Each is a complete,
# independently creatable TEMP VIEW.
VIEW_DEFINITIONS: dict[str, str] = {
    # models per type (views.sql models_by_type pattern)
    "models_by_type": """
        SELECT type AS model_type, COUNT(*) AS n_models
        FROM model GROUP BY type
    """,
    # provider rollup with a JSON per-provider model list
    # (jsonb_agg → to_json(collect_list(struct(...))))
    "provider_model_summary": """
        SELECT data_source_tmp AS provider,
               COUNT(*) AS n_models,
               to_json(collect_list(struct(external_model_id, type))) AS models_json
        FROM model GROUP BY data_source_tmp
    """,
    # cancer-system facet counts over the search slice (unnest+group)
    "models_by_cancer_system": """
        SELECT cancer_system, COUNT(DISTINCT pdcm_model_id) AS n_models
        FROM search_index_patient_sample
        WHERE pdcm_model_id IS NOT NULL
        GROUP BY cancer_system
    """,
    # search-term explode (unnest + GROUP BY)
    "models_by_search_term": """
        SELECT term, COUNT(DISTINCT pdcm_model_id) AS n_models
        FROM (
          SELECT pdcm_model_id, explode(search_terms) AS term
          FROM search_index_patient_sample
        ) GROUP BY term
    """,
    # dataset availability per model (profile over molchar types)
    "model_dataset_availability": """
        SELECT model_id,
               sort_array(collect_set(molchar_type)) AS dataset_types,
               size(collect_set(molchar_type)) AS model_dataset_type_count
        FROM molecular_characterization
        GROUP BY model_id
    """,
    # models with any accessible license (IN (SELECT …) → semi join shape)
    "models_with_license": """
        SELECT m.external_model_id, m.license_name
        FROM model m
        WHERE m.license_id IS NOT NULL
    """,
    # treatments per model (explode of aggregated arrays)
    "models_by_treatment": """
        SELECT treatment, COUNT(DISTINCT model_id) AS n_models
        FROM (
          SELECT model_id, explode(model_treatments) AS treatment
          FROM treatment_aggregation_by_model
        ) WHERE model_id IS NOT NULL
        GROUP BY treatment
    """,
    # matview models_by_cancer (views.sql:1097-1102): count per
    # (cancer_system, histology) over the search slice
    "models_by_cancer": """
        SELECT cancer_system, histology, COUNT(*) AS count
        FROM search_index_patient_sample
        GROUP BY cancer_system, histology
    """,
    # matview models_by_dataset_availability (views.sql:1128-1136):
    # unnest(dataset_available) → explode + count distinct models
    "models_by_dataset_availability": """
        SELECT dataset_availability, COUNT(DISTINCT pdcm_model_id) AS count
        FROM (
          SELECT pdcm_model_id, explode(dataset_available) AS dataset_availability
          FROM search_index
        ) GROUP BY dataset_availability
    """,
    # search_index_enriched (views.sql:818-842): derived columns —
    # cardinality() → size(), ANY(array) → array_contains(), array ||
    # append → concat(array(...)). paediatric uses the columns our
    # search slice carries (histology/patient_age heuristics).
    "search_index_enriched": """
        SELECT si.*,
               CASE WHEN array_contains(dataset_available, 'publication')
                    THEN size(dataset_available) - 1
                    ELSE size(dataset_available)
               END AS model_dataset_type_count,
               CASE WHEN lower(histology) LIKE '%childhood%'
                    OR patient_age LIKE '%19'
                    OR patient_age = '2 - 9'
                    OR patient_age LIKE '%months'
                    THEN true ELSE false
               END AS paediatric
        FROM search_index si
    """,
    # matview dosing_studies (views.sql:1147-1162): per-protocol JSON of
    # component rows — jsonb_agg(sub) → to_json(collect_list(struct(...)))
    "dosing_studies": """
        SELECT tp.model_id,
               tc.treatment_protocol_id AS protocol_id,
               to_json(sort_array(collect_list(struct(t.name, tc.treatment_dose)))) AS entries
        FROM treatment_component tc
        JOIN treatment t ON t.id = tc.treatment_id
        JOIN treatment_protocol tp ON tp.id = tc.treatment_protocol_id
        GROUP BY tp.model_id, tc.treatment_protocol_id
    """,
    # models_by_mutated_gene (views.sql:1113-1126):
    # SPLIT_PART(unnest(markers), '/', 1) → split(explode(...), '/')[0]
    "models_by_mutated_gene": """
        SELECT split(marker, '/')[0] AS mutated_gene,
               COUNT(DISTINCT pdcm_model_id) AS count
        FROM (
          SELECT pdcm_model_id, explode(markers_with_mutation_data) AS marker
          FROM search_index
        ) GROUP BY mutated_gene
    """,
}


def register_entities(entities: dict[str, DataFrame]) -> None:
    """Expose entity DataFrames as temp views (the load step of the
    reference's loader.py, minus Postgres)."""
    for name, df in entities.items():
        if not name.startswith("raw/"):
            df.createOrReplaceTempView(name)


def create_views(spark: SparkSession, only: list[str] | None = None) -> list[str]:
    """CREATE OR REPLACE TEMP VIEW for every definition whose source
    entities are registered; returns the created view names."""
    created = []
    for name, sql in VIEW_DEFINITIONS.items():
        if only and name not in only:
            continue
        try:
            spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {sql}")
            created.append(name)
        except Exception:
            # source entity not registered in this run — skip
            continue
    return created
