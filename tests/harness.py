"""Local replica of the driver's correctness gate.

Runs each Spark query and its DuckDB oracle on the same parquet tables,
compares row count, column names, and order-insensitive canonical values.
Strict by default (exact equality incl. Decimal scale via str()); floats
compared exactly first, reported as 'float-drift' if only within 1e-9.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("ts", datetime.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    if isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v)) if v is not None else ("none",)


def _sortkey(row):
    return tuple(repr(c) for c in row)


def compare(name: str, spark_df, con, sql: str) -> dict:
    spark_cols = list(spark_df.columns)
    spark_rows = spark_df.collect()
    rel = con.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    res = {"name": name, "ok": True, "issues": []}
    if len(spark_rows) != len(duck_rows):
        res["ok"] = False
        res["issues"].append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        res["ok"] = False
        res["issues"].append(f"columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return res

    # sort columns by name (driver behavior), canonicalize, sort rows
    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i].lower())
    s_rows = sorted(
        (tuple(_canon(r[i]) for i in s_order) for r in spark_rows), key=_sortkey
    )
    d_rows = sorted(
        (tuple(_canon(r[i]) for i in d_order) for r in duck_rows), key=_sortkey
    )
    n_mismatch = 0
    float_drift = 0
    example = None
    for a, b in zip(s_rows, d_rows):
        if a == b:
            continue
        if _close(a, b):
            float_drift += 1
            continue
        n_mismatch += 1
        if example is None:
            example = (a, b)
    if n_mismatch:
        res["ok"] = False
        res["issues"].append(f"{n_mismatch} value mismatches, e.g. {example}")
    if float_drift:
        res["issues"].append(f"float-drift rows: {float_drift}")
    return res


def _close(a, b) -> bool:
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        if len(a) == 2 and a[0] == "f" and b[0] == "f":
            return math.isclose(a[1], b[1], rel_tol=1e-9, abs_tol=1e-9)
        if a and a[0] in ("l",):
            return all(_close(x, y) for x, y in zip(a[1], b[1]))
        if a and isinstance(a[0], tuple):
            return all(_close(x, y) for x, y in zip(a, b))
    return a == b


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> list[dict]:
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_con(sf_dir)
    results = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                results.append(compare(name, df, con, oracles[name]))
            else:
                n = df.count()
                results.append(
                    {"name": name, "ok": True, "issues": [f"rows-only check: {n} rows"]}
                )
        except Exception as e:  # surface, keep going
            results.append({"name": name, "ok": False, "issues": [f"EXC {type(e).__name__}: {e}"]})
    return results
