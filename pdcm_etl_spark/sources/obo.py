"""OBO ontology scan.

Parity with reference ``etl/workflow/readers/ncit_reader.py:10-50``: parse a
line-oriented OBO file into rows ``(term_id, term_name, term_url, is_a)``
where ``is_a`` is the comma-joined list of parent ids.

The reference parses on the driver; we parse *distributed*: ``spark.read.text``
with a stanza-reassembly pass in ``mapPartitions`` would split stanzas across
partition boundaries, so instead we read the whole file as one record per
``[Term]`` stanza using the text reader's ``lineSep`` trick — robust and still
distributed. NCIt is ~100k terms, so either path is cheap; the distributed
path is kept for scale hygiene.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TERM_URL_PREFIX = "http://purl.obolibrary.org/obo/"


def read_obo(spark: SparkSession, path: str) -> DataFrame:
    """Parse an OBO file into (term_id, term_name, term_url, is_a)."""
    # one row per [Term] stanza
    stanzas = spark.read.text(path, lineSep="\n\n")
    terms = stanzas.filter(F.col("value").startswith("[Term]"))
    term_id = F.regexp_extract("value", r"(?m)^id:\s*(\S+)", 1)
    term_name = F.regexp_extract("value", r"(?m)^name:\s*(.+)$", 1)
    # all is_a parent ids, comma-joined (ref keeps a comma string)
    is_a = F.array_join(
        F.expr(r"regexp_extract_all(value, '(?m)^is_a:\\s*(\\S+)', 1)"), ","
    )
    obsolete = F.col("value").contains("is_obsolete: true")
    return (
        terms.filter(~obsolete)
        .select(
            term_id.alias("term_id"),
            F.trim(term_name).alias("term_name"),
            F.concat(
                F.lit(TERM_URL_PREFIX), F.regexp_replace(term_id, ":", "_")
            ).alias("term_url"),
            is_a.alias("is_a"),
        )
        .filter(F.col("term_id") != "")
    )
