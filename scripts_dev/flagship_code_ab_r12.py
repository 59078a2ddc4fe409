"""Interleaved same-JVM A/B of the FULL flagship under old vs new
harmonise_marker_symbols (r12). Same rationale as cascade_ab_r12.py:
cross-JVM solo medians on this host swing several-x within an hour, so
only a paired, alternating comparison inside one JVM is trustworthy.

    python scripts_dev/flagship_code_ab_r12.py [sf_dir] [--pairs N] [--out f]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts_dev.cascade_ab_r12 import harmonise_old, release_blocks  # noqa: E402


def main() -> None:
    args = list(sys.argv[1:])
    pairs = 3
    out = "scripts_dev/flagship_code_ab_r12.jsonl"
    if "--pairs" in args:
        i = args.index("--pairs")
        pairs = int(args[i + 1])
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    from pdcm_etl_spark.session import get_spark
    from pdcm_etl_spark.transforms import molecular as mol_t
    import __spark_entry__ as entry

    harmonise_new = mol_t.harmonise_marker_symbols
    fn = entry.queries()["etl_search_index"]

    spark = get_spark("pdcm-etl-flagship-code-ab")
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for impl in (harmonise_new, harmonise_old):
        mol_t.harmonise_marker_symbols = impl
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        release_blocks(spark)
    # one unrecorded at-scale pass (cold surplus: JIT/page cache)
    mol_t.harmonise_marker_symbols = harmonise_new
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run_once(impl, which: str) -> dict:
        mol_t.harmonise_marker_symbols = impl
        release_blocks(spark)
        t0 = time.time()
        df = fn(spark, sf_dir)
        build = time.time() - t0
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        execu = time.time() - t0
        rec = {"arm": which, "build_sec": round(build, 3),
               "exec_sec": round(execu, 3),
               "total_sec": round(build + execu, 3)}
        print(json.dumps(rec), flush=True)
        return rec

    runs = []
    for p in range(pairs):
        runs.append(run_once(harmonise_new, "new"))
        runs.append(run_once(harmonise_old, "old"))

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    rec = {
        "artifact": "flagship_code_interleaved_ab_r12",
        "sf_dir": sf_dir,
        "pairs": pairs,
        "runs": runs,
        "new_median_total": med([r["total_sec"] for r in runs if r["arm"] == "new"]),
        "old_median_total": med([r["total_sec"] for r in runs if r["arm"] == "old"]),
        "new_median_exec": med([r["exec_sec"] for r in runs if r["arm"] == "new"]),
        "old_median_exec": med([r["exec_sec"] for r in runs if r["arm"] == "old"]),
        "new_median_build": med([r["build_sec"] for r in runs if r["arm"] == "new"]),
        "old_median_build": med([r["build_sec"] for r in runs if r["arm"] == "old"]),
    }
    with open(out, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
