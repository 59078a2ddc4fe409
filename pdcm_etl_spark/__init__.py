"""pdcm_etl_spark — a PySpark-native analytics/ETL engine.

A ground-up rebuild of the query and data-processing capabilities of
PDXFinder/pdcm-etl (see SURVEY.md), expressed Spark-first:

- ``functions``  : scalar/cleaning/id/join kit (ref: etl/jobs/util/*)
- ``sources``    : config-driven extract layer (ref: etl/workflow/spark_reader.py)
- ``transforms`` : pure-function entity catalog (ref: etl/jobs/transformation/*)
- ``operators``  : engine operators incl. large-scale training-data ops
                   (dedup, similarity search, text analysis, multimodal)
- ``plans``      : declarative DAG runner + SQL view layer (replaces Luigi +
                   Postgres views)
- ``streaming``  : Structured Streaming ingest (green-field extension)

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join strategy and AQE; Python UDFs appear only where built-ins cannot
express the semantics, and then as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
