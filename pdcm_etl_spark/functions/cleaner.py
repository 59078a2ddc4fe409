"""String-cleaning kit.

Parity with reference ``etl/jobs/util/cleaner.py:8-44``: NBSP stripping,
trim/initcap/lower compositions, and the export-time null→"" rule.
All pure column expressions (whole-stage codegen; no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# non-breaking space; the reference strips it before trimming
_NBSP = " "


def _strip_nbsp(col: Column) -> Column:
    return F.regexp_replace(col, _NBSP, " ")


def trim_all(col: Column | str) -> Column:
    """Trim after collapsing NBSP (ref cleaner.py:8-13)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(_strip_nbsp(c))


def init_cap_and_trim_all(col: Column | str) -> Column:
    """initcap ∘ trim (ref cleaner.py:16-18)."""
    return F.initcap(trim_all(col))


def lower_and_trim_all(col: Column | str) -> Column:
    """lower ∘ trim (ref cleaner.py:21-23)."""
    return F.lower(trim_all(col))


def null_values_to_empty_string(df: DataFrame) -> DataFrame:
    """Export-time cleanup (ref cleaner.py:29-35): null boolean → false,
    any other null → empty string. Applied only at sink boundaries."""
    exprs = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if isinstance(field.dataType, T.BooleanType):
            exprs.append(F.coalesce(c, F.lit(False)).alias(field.name))
        elif isinstance(field.dataType, T.StringType):
            exprs.append(F.coalesce(c, F.lit("")).alias(field.name))
        else:
            exprs.append(c)
    return df.select(*exprs)
