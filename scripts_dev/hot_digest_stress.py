"""Hot-digest stress for the round-11 skew-safe first-occurrence
rewrite (round-10 verdict item 4 "Done" criterion).

substring_dedup/paragraph_dedup used to pick first occurrences with
row_number() over a digest-partitioned window: a corpus-hot k-gram
(boilerplate repeated ~1e6x) lands every occurrence in ONE digest
partition, which one task must fully SORT. The round-11 shape —
min(struct(id, pos)) map-side partial aggregate + shuffle-hash
join-back — collapses the hot digest to one row per map task before
the shuffle and streams the probe side through a hash lookup, no sort.

This script isolates exactly that stage on a synthetic window stream
with ONE digest repeated `hot` times (default 1e6) over `cold`
distinct background digests (default 1e6), runs both shapes on the
same input, asserts identical duplicate counts, and commits the walls.

Run SOLO:  python scripts_dev/hot_digest_stress.py [hot] [cold] [out]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    hot = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cold = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    out = sys.argv[3] if len(sys.argv) > 3 else (
        "scripts_dev/hot_digest_stress_r11.jsonl"
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pdcm_etl_spark.session import get_spark

    spark = get_spark("hot-digest-stress")
    spark.sparkContext.setLogLevel("ERROR")

    # the window stream: (id, pos, dig) exactly as substring_dedup's
    # generate projection emits it. One digest ('HOT') carries `hot`
    # occurrences; `cold` background digests are unique.
    wins = spark.range(hot + cold).select(
        (F.col("id") % 1000).alias("id"),
        F.col("id").alias("pos"),
        F.when(F.col("id") < hot, F.lit("HOT"))
        .otherwise(F.md5(F.col("id").cast("string")))
        .alias("dig"),
    )
    wins.write.format("noop").mode("overwrite").save()  # warm scan

    def timed(fn):
        t0 = time.time()
        n = fn()
        return round(time.time() - t0, 2), n

    def old_shape():
        w = Window.partitionBy("dig").orderBy("id", "pos")
        return (
            wins.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > 1)
            .count()
        )

    def new_shape():
        keepers = wins.groupBy("dig").agg(
            F.min(F.struct("id", "pos")).alias("__first")
        )
        return (
            wins.hint("shuffle_hash")
            .join(keepers.hint("shuffle_hash"), "dig")
            .filter(
                (F.col("id") != F.col("__first.id"))
                | (F.col("pos") != F.col("__first.pos"))
            )
            .count()
        )

    old_secs, new_secs = [], []
    for _ in range(3):
        s, n_old = timed(old_shape)
        old_secs.append(s)
        s, n_new = timed(new_shape)
        new_secs.append(s)
    assert n_old == n_new == hot - 1, (n_old, n_new, hot)

    rec = {
        "artifact": "hot_digest_first_occurrence_stress",
        "hot_occurrences": hot,
        "cold_digests": cold,
        "n_duplicates": n_old,
        "old_row_number_window_sec": sorted(old_secs)[1],
        "new_min_struct_join_sec": sorted(new_secs)[1],
        "old_runs": old_secs,
        "new_runs": new_secs,
        "note": (
            "medians of 3; identical duplicate sets asserted. The old "
            "shape single-task-sorts the hot partition; the new shape "
            "partial-aggregates it map-side and hash-probes the join."
        ),
    }
    with open(out, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
