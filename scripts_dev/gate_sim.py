"""Replica of the DRIVER's correctness gate (pandas canonicalization).

The driver (per CORRECTNESS_r01 tracebacks) converts both sides to pandas
(`spark_df.toPandas()` / `duckdb.execute(sql).df()`), sorts columns by
name, sorts rows over all columns, and hashes values.  That path fails on
outputs tests/harness.py would pass:

- DECIMAL columns: Spark yields object-dtype `decimal.Decimal`, DuckDB
  `.df()` yields float64 (or differently-scaled Decimal) -> hash mismatch.
- ARRAY columns: object-dtype lists break `sort_values` / hashing
  (`TypeError: unhashable type: 'list'`).

This script flags those failure modes *as failures* even when the values
agree, so anything green here should be green in the real gate.

Usage: python scripts_dev/gate_sim.py [first_n] [sf_dir]
"""

from __future__ import annotations

import decimal
import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.harness import TABLES  # noqa: E402


def dtype_kind(dtype) -> str:
    """Coarse dtype kind used to detect cross-engine dtype divergence.

    The driver hashes raw pandas values, so int64 8176 vs float64 8176.0
    hash apart even though `.12g` stringification would hide it.  We fold
    the kind into the hash AND surface int-vs-float pairings as issues so
    this sim stays strictly stricter than the driver (round-3 verdict
    item 2: SUM(BIGINT)->HUGEINT->float64 shipped green here, red there).
    """
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if isinstance(dtype, pd.DatetimeTZDtype) or pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    return "other"


def canon_df(df: pd.DataFrame) -> tuple[str, list[str], dict[str, str]]:
    """Column-name-sorted, row-sorted, stringified value hash + issue list
    + per-column dtype-kind map (lowercased column name -> kind)."""
    issues: list[str] = []
    df = df[sorted(df.columns, key=str.lower)]
    kinds_by_col = {str(c).lower(): dtype_kind(df[c].dtype) for c in df.columns}
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            kinds = {type(v).__name__ for v in s.dropna().head(200)}
            if "Decimal" in kinds:
                issues.append(f"col {c}: object/Decimal (driver hash unstable)")
            if kinds & {"list", "ndarray", "tuple", "dict"}:
                issues.append(f"col {c}: object/{kinds} (driver canon throws)")
            if "date" in kinds:
                issues.append(
                    f"col {c}: object/datetime.date (Spark DATE vs DuckDB "
                    "datetime64 hash apart)"
                )
        if pd.api.types.is_float_dtype(s.dtype):
            out[c] = s.map(lambda v: "NaN" if pd.isna(v) else format(float(v), ".12g"))
        elif pd.api.types.is_integer_dtype(s.dtype):
            out[c] = s.astype("Int64").astype(str)
        elif isinstance(s.dtype, pd.DatetimeTZDtype) or pd.api.types.is_datetime64_any_dtype(s.dtype):
            out[c] = pd.to_datetime(s).dt.tz_localize(None).map(
                lambda v: "NaT" if pd.isna(v) else v.isoformat()
            )
        else:
            out[c] = s.map(
                lambda v: "None"
                if v is None or (isinstance(v, float) and pd.isna(v))
                else (format(float(v), ".12g") if isinstance(v, decimal.Decimal) else str(v))
            )
    cdf = pd.DataFrame(out)
    try:
        cdf = cdf.sort_values(by=list(cdf.columns), kind="mergesort").reset_index(drop=True)
    except TypeError as e:
        issues.append(f"sort_values: {e}")
        return "<unsortable>", issues, kinds_by_col
    import hashlib

    h = hashlib.md5()
    # Fold dtype kinds into the digest: the driver hashes raw values, so a
    # kind divergence (int vs float) must break OUR hash too.
    h.update(("|".join(f"{c}:{k}" for c, k in sorted(kinds_by_col.items())) + "\x1d").encode())
    for row in cdf.itertuples(index=False, name=None):
        h.update(("\x1f".join(row) + "\x1e").encode())
    return h.hexdigest(), issues, kinds_by_col


def main() -> None:
    first_n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("gate_sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results = {}
    only = os.environ.get("GATE_ONLY")
    if only:
        names = [n for n in only.split(",") if n in qs]
    else:
        names = list(qs)[:first_n]
    for name in names:
        t0 = time.time()
        row: dict = {}
        try:
            sdf = qs[name](spark, sf_dir)
            pdf_s = sdf.toPandas()
            hash_s, iss_s, kinds_s = canon_df(pdf_s)
            if name not in oracles:
                row = {
                    "status": "rows-only",
                    "spark_rows": len(pdf_s),
                    "issues": iss_s,
                }
            else:
                pdf_d = con.execute(oracles[name]).df()
                hash_d, iss_d, kinds_d = canon_df(pdf_d)
                issues = [f"spark: {i}" for i in iss_s] + [f"duck: {i}" for i in iss_d]
                for c in sorted(set(kinds_s) & set(kinds_d)):
                    if kinds_s[c] != kinds_d[c]:
                        issues.append(
                            f"col {c}: dtype kind spark={kinds_s[c]} vs "
                            f"duck={kinds_d[c]} (driver hashes raw values -> mismatch)"
                        )
                ok = (
                    len(pdf_s) == len(pdf_d)
                    and sorted(c.lower() for c in pdf_s.columns)
                    == sorted(c.lower() for c in pdf_d.columns)
                    and hash_s == hash_d
                    and not issues
                )
                row = {
                    "status": "PASS" if ok else "FAIL",
                    "spark_rows": len(pdf_s),
                    "duck_rows": len(pdf_d),
                    "hash_match": hash_s == hash_d,
                    "issues": issues,
                }
        except Exception as e:  # noqa: BLE001
            row = {"status": "ERR", "err": f"{type(e).__name__}: {e}"[:300]}
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        tag = row["status"]
        extra = "; ".join(row.get("issues", []))[:160]
        print(f"{tag:9} {name:28} {row['sec']:6.2f}s {extra}", flush=True)

    bad = {k: v for k, v in results.items() if v["status"] not in ("PASS", "rows-only")}
    print(f"\n{len(names) - len(bad)}/{len(names)} ok; {len(bad)} bad")
    with open("/tmp/gate_sim.json", "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
