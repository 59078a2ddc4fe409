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
