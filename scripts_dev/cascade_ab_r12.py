"""Interleaved same-JVM A/B of the harmonisation cascade rewrite (r12).

Solo cross-JVM flagship medians on this host swing far beyond the
effect size (today: old-cascade cold 197 s vs warm 33 s, new-cascade
rep0 329 s, full-bench cold 55 s — all within two hours). This harness
alternates the OLD (5-stage split + union) and NEW (single-pass 5xBHJ)
``harmonise_marker_symbols`` rep-by-rep inside ONE JVM over just the
``harmonised_measurements`` DAG node (the cascade consumer that
materializes), so host drift hits both arms equally and the PAIRED
delta is the signal.

    python scripts_dev/cascade_ab_r12.py [sf_dir] [--pairs N] [--out f]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def release_blocks(spark) -> None:
    gc.collect()
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().iterator()
    while it.hasNext():
        it.next()._2().unpersist(False)
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    spark.range(10).count()
    time.sleep(0.5)


# ---- OLD implementation (r11, commit 17b0576) -------------------------
def _split_matched(df: DataFrame):
    return (
        df.where("gene_marker_id is not null"),
        df.where("gene_marker_id is null").drop(
            "gene_marker_id", "harmonisation_result"
        ),
    )


def harmonise_old(molecular_df, gene_marker_df, previous_symbols_df,
                  alias_symbols_df):
    from pdcm_etl_spark.transforms.molecular import _unique_lookup

    md = molecular_df.withColumn("non_harmonised_symbol", F.col("symbol"))
    gm = gene_marker_df.withColumnRenamed("id", "gene_marker_id")
    previous_symbols_df = previous_symbols_df.withColumnRenamed(
        "id", "gene_marker_id")
    alias_symbols_df = alias_symbols_df.withColumnRenamed(
        "id", "gene_marker_id")

    approved = F.broadcast(
        gm.select(
            F.col("approved_symbol").alias("__sym"),
            "gene_marker_id",
            F.lit("approved_symbol").alias("harmonisation_result"),
        )
    )
    s1 = md.join(approved, md.non_harmonised_symbol == approved["__sym"],
                 "left").drop("__sym")
    m1, r1 = _split_matched(s1)

    prev = F.broadcast(_unique_lookup(
        previous_symbols_df, "previous_symbol", "previous_symbol"))
    s2 = r1.join(prev, r1.non_harmonised_symbol == prev["__sym"],
                 "left").drop("__sym")
    m2, r2 = _split_matched(s2)

    alias = F.broadcast(_unique_lookup(
        alias_symbols_df, "alias_symbol", "alias_symbol"))
    s3 = r2.join(alias, r2.non_harmonised_symbol == alias["__sym"],
                 "left").drop("__sym")
    m3, r3 = _split_matched(s3)

    ens = F.broadcast(
        gm.where("ensembl_gene_id is not null")
        .select(
            F.col("ensembl_gene_id").alias("__sym"),
            "gene_marker_id",
            F.lit("ensembl_gene_id").alias("harmonisation_result"),
        )
    )
    s4 = r3.join(ens, r3.ensembl_gene_id == ens["__sym"], "left").drop("__sym")
    m4, r4 = _split_matched(s4)

    ncbi = F.broadcast(
        gm.where("ncbi_gene_id is not null")
        .select(
            F.round(F.col("ncbi_gene_id")).cast("integer").alias("__sym"),
            "gene_marker_id",
            F.lit("ncbi_gene_id").alias("harmonisation_result"),
        )
    )
    r4n = r4.withColumn("__ncbi", F.round(F.col("ncbi_gene_id")).cast("integer"))
    s5 = r4n.join(ncbi, r4n["__ncbi"] == ncbi["__sym"], "left").drop(
        "__sym", "__ncbi")
    m5, r5 = _split_matched(s5)

    no_map = r5.withColumn(
        "gene_marker_id", F.lit(None).cast("bigint")
    ).withColumn("harmonisation_result", F.lit("no_mapping"))

    result = (m1.unionByName(m2).unionByName(m3).unionByName(m4)
              .unionByName(m5).unionByName(no_map))

    hgnc = F.broadcast(
        gm.select("gene_marker_id", F.col("approved_symbol").alias("hgnc_symbol"))
    )
    return result.join(hgnc, on="gene_marker_id", how="left")
# -----------------------------------------------------------------------


def main() -> None:
    args = list(sys.argv[1:])
    pairs = 4
    out = "scripts_dev/cascade_ab_r12.jsonl"
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
    from pdcm_etl_spark.plans.synth import synthesize_provider_modules
    from pdcm_etl_spark.plans.dag import build_metadata_dag

    harmonise_new = mol_t.harmonise_marker_symbols  # current tree = new

    spark = get_spark("pdcm-etl-cascade-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(impl, which: str) -> dict:
        mol_t.harmonise_marker_symbols = impl
        release_blocks(spark)
        t0 = time.time()
        raw = synthesize_provider_modules(spark, sf_dir)
        dag = build_metadata_dag(spark, raw)
        node = dag.nodes["harmonised_measurements"]
        args_dfs = [dag.get(d) for d in node.deps]
        df = node.fn(*args_dfs)
        build = time.time() - t0
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        execu = time.time() - t0
        rec = {"arm": which, "build_sec": round(build, 3),
               "exec_sec": round(execu, 3),
               "total_sec": round(build + execu, 3)}
        print(json.dumps(rec), flush=True)
        return rec

    # warm both arms once at tiny scale (codegen classes)
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for impl in (harmonise_new, harmonise_old):
        mol_t.harmonise_marker_symbols = impl
        raw = synthesize_provider_modules(spark, warm_dir)
        dag = build_metadata_dag(spark, raw)
        node = dag.nodes["harmonised_measurements"]
        args_dfs = [dag.get(d) for d in node.deps]
        node.fn(*args_dfs).write.format("noop").mode("overwrite").save()
        release_blocks(spark)

    runs = []
    for p in range(pairs):
        runs.append(run_once(harmonise_new, "new"))
        runs.append(run_once(harmonise_old, "old"))

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    rec = {
        "artifact": "cascade_interleaved_ab_r12",
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
