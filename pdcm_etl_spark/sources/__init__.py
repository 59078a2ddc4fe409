"""Config-driven extract layer (ref: etl/workflow/spark_reader.py,
etl/workflow/readers/*). All-string raw ingest with provider provenance."""

from pdcm_etl_spark.sources.tsv import read_module_tsv, string_schema  # noqa: F401
from pdcm_etl_spark.sources.obo import read_obo  # noqa: F401
from pdcm_etl_spark.sources.ontolia import read_ontolia  # noqa: F401
