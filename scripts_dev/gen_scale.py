"""Scale-stress table generator (round-3 verdict item 6).

Replicates the sf0.1 fact tables ``m``× with key offsets so the engine
can be exercised an order of magnitude above bench scale without
touching the read-only driver testdata. m=5 ≈ sf0.5, m=10 ≈ sf1.

Replication is a map-side explode (one Generate, no shuffle); keys are
shifted by replica × span so the star-schema joins stay consistent:
orders/lineitem shift o_orderkey together and keep custkey/partkey/
suppkey (dims are NOT scaled — at 100 TB the facts dominate and the
dims stay broadcast-sized, which is exactly the regime the engine
targets). documents/embeddings keep their text/vectors identical across
replicas, which makes the dedup family's load *harder* than organic
data (every doc gains m exact copies → m× bucket growth, m² pair
growth per dup group) — a deliberate stress, not a bug.

Usage: python scripts_dev/gen_scale.py [m] [out_dir]
       (defaults: 5 /tmp/sf0.5)
"""

from __future__ import annotations

import os
import shutil
import sys

SRC = "/root/testdata/sf0.1"
SPAN = 10_000_000  # > every sf0.1 key domain


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.5"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from pdcm_etl_spark.session import get_spark

    spark = get_spark(app_name="gen_scale")
    os.makedirs(out, exist_ok=True)

    shifts = {
        "orders": ["o_orderkey"],
        "lineitem": ["l_orderkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied (dim)")
    for t, keys in shifts.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        rep = df.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(m - 1)))
        )
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + F.col("__r") * F.lit(SPAN))
        rep.drop("__r").write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"{t}: x{m}")
    spark.stop()


if __name__ == "__main__":
    main()
