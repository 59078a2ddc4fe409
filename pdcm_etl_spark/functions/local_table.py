"""JVM-side literal tables — a ``VALUES``-clause replacement for
``spark.createDataFrame(<small python list>)``.

``createDataFrame`` on a Python list parallelizes PICKLED rows across
``defaultParallelism`` slices: the resulting stage runs a PythonRunner
per slice, and the first such stage in a session forks one Python worker
per core (each importing pyspark). Profiled on the flagship at sf0.1
(local[32]): the tiny config-table stages sat early on the entity DAG's
critical path with 32 tasks each showing executor-run ≫ CPU — the
"work" was Python worker spin-up, not data. A ``VALUES`` table is a
Catalyst LocalRelation: no job, no Python workers, participates in
constant folding, and broadcasts for free.

Use for small driver-known tables (config dims, vocabularies, driver
aggregation results that re-enter a plan). Data-sized frames should
never come from the driver at all.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return f"CAST({v} AS BIGINT)"
    if isinstance(v, float):
        # repr() is the shortest exact round-trip of the binary64 value;
        # the D suffix keeps Spark from parsing it as DECIMAL
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_sql_literal(x) for x in v) + ")"
    raise TypeError(
        f"values_table literal of type {type(v).__name__} not supported"
    )


def _split_ddl(ddl: str) -> list[tuple[str, str]]:
    """Split a DDL schema string into (name, type) at top-level commas."""
    parts, depth, cur = [], 0, []
    for ch in ddl:
        # both nesting forms carry commas: struct<a int, b int> AND
        # parameterized types like decimal(18,2) / char(10)
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    out = []
    for p in parts:
        name, _, typ = p.strip().partition(" ")
        out.append((name.strip("` "), typ.strip()))
    return out


def values_table(spark: SparkSession, rows, schema) -> DataFrame:
    """Build a DataFrame from driver-local rows entirely JVM-side.

    ``schema`` is a DDL string (``"id long, name string"``), a list of
    column names (types inferred like createDataFrame: int → bigint,
    float → double, str → string), or a StructType. Semantically a
    drop-in for ``spark.createDataFrame(rows, schema)`` for scalar
    literals (str/int/float/bool/None).
    """
    from pyspark.sql.types import StructType

    if isinstance(schema, StructType):
        cols = [(f.name, f.dataType.simpleString()) for f in schema.fields]
    elif isinstance(schema, str):
        cols = _split_ddl(schema)
    else:
        cols = [(c, None) for c in schema]

    rows = [r if isinstance(r, (list, tuple)) else (r,) for r in rows]
    if not rows:
        return spark.range(0).selectExpr(
            *[f"CAST(NULL AS {t or 'string'}) AS `{n}`" for n, t in cols]
        )
    for r in rows:
        if len(r) != len(cols):
            raise ValueError(
                f"row arity {len(r)} != schema arity {len(cols)}: {r!r}"
            )
    body = ", ".join(
        "(" + ", ".join(_sql_literal(v) for v in r) + ")" for r in rows
    )
    inner_names = ", ".join(f"`__c{i}`" for i in range(len(cols)))
    sel = ", ".join(
        (f"CAST(`__c{i}` AS {t}) AS `{n}`" if t else f"`__c{i}` AS `{n}`")
        for i, (n, t) in enumerate(cols)
    )
    return spark.sql(f"SELECT {sel} FROM (VALUES {body}) AS T({inner_names})")
