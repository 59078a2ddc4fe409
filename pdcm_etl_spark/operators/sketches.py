"""Sketch-based profiling primitives: count-min heavy hitters and
approximate quantiles.

These are the two standard 100 TB profiling passes a curation pipeline
runs before (and after) every filter stage: "what are the dominant
terms/domains" and "where do the score thresholds sit". Both are
one-aggregation sketches — sub-linear state, one pass, mergeable across
partitions — which is the whole point at scale: an exact groupBy over a
100 TB term column shuffles the full vocabulary; the sketch ships
kilobytes per task.

Correctness posture (the approx_distinct pattern): sketch internals are
not engine-portable, so each operator emits the EXACT statistic next to
the sketch estimate plus the sketch's own error-bound guarantee as a
boolean — the oracle pins the exact values and the bounds as literally
TRUE. The sketch runs for real; the property is what's hash-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Top-k heavy hitters over the corpus word stream with a count-min
    sketch estimate next to the exact count (Cormode & Muthukrishnan
    2005) — the sketch twin of ``ngram_topk``.

    Plan: ONE pass builds the CMS via Spark's native ``count_min_sketch``
    aggregate (JVM-side, mergeable partials — the shuffle carries
    d×w counters per task, not the vocabulary); the exact top-k ranking
    is a word-keyed partial-agg + TakeOrderedAndProject. The sketch blob
    (~eps/confidence sized, here ~a hundred KB) is collected ONCE and
    queried driver-side for the k candidate terms via the JVM
    CountMinSketch reader — k scalar lookups, no data-sized collect.

    Emitted properties (oracle pins both TRUE):
    - ``est_ge_exact``: CMS never underestimates (one-sided error);
    - ``est_within_eps``: overestimate ≤ ⌈eps·N⌉ with prob ≥ confidence
      (checked against 3× slack so the row is deterministic in practice
      at this eps; a violation means the sketch is genuinely broken).

    Returns (term, n, cms_est_ok, cms_within_eps) ordered (n desc, term).
    """
    words = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    spark = df.sparkSession
    sketch_bytes = bytes(
        words.agg(
            F.count_min_sketch(
                "w", F.lit(float(eps)), F.lit(float(confidence)), F.lit(seed)
            ).alias("s")
        ).collect()[0]["s"]
    )
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(sketch_bytes)
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bais)
    total_n = int(cms.totalCount())

    topk = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(k)
        .collect()
    )  # k rows — scalar-scale collect, the published result itself
    slack = int(3 * eps * total_n) + 1
    rows = []
    for r in topk:
        est = int(cms.estimateCount(r["w"]))
        rows.append(
            (
                r["w"],
                int(r["n"]),
                est >= r["n"],
                est <= r["n"] + slack,
            )
        )
    from pdcm_etl_spark.functions.local_table import values_table

    return values_table(
        spark,
        rows,
        "term string, n bigint, cms_est_ok boolean, cms_within_eps boolean",
    )


def _discrete_pct(value: Column, rank: Column, target: Column) -> Column:
    """max(value where rank == target) — the discrete percentile picker
    (value at a given 1-based rank; tie-safe because ordering by value
    alone makes the value at any rank unique)."""
    return F.max(F.when(rank == target, value))


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    percentiles: tuple = (50, 95),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles (Spark's ``percentile_approx`` —
    the Greenwald-Khanna-style mergeable summary) verified against the
    exact discrete percentile, emitted the approx_distinct way.

    Exact side: value at 1-based rank ⌈p·n⌉ per group, computed with one
    window over (group → order by value) — both engines express this
    identically, so it hash-checks. Approx side: ``percentile_approx``
    guarantees rank error ≤ n/accuracy; the boolean pins the estimate
    between the exact values at ranks ⌈p·n⌉ ∓ ⌈10·n/accuracy⌉ (10×
    slack → deterministic TRUE unless the summary is actually wrong).

    Values are bigint cents throughout (driver-canonicalization-safe).
    Scale: ONE shuffle on the group key serves the window; the
    percentile_approx aggregate reuses the same exchange. At 100 TB you
    run the sketch alone (drop the exact twin — it exists to make the
    sketch's contract hash-checkable at test scale).

    Returns (group, n, p{p}_cents..., p{p}_ok...) one row per group.
    """
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("bigint")
    w = Window.partitionBy("g").orderBy("v")
    wg = Window.partitionBy("g")
    base = (
        df.select(F.col(group_col).alias("g"), cents.alias("v"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wg))
    )
    err = (F.col("n") * 10 / accuracy).cast("bigint") + 1

    aggs = [F.max("n").alias("n")]
    post = []
    for p in percentiles:
        tgt = F.ceil(F.col("n") * p / 100).cast("bigint")
        lo_t = F.greatest(F.lit(1).cast("bigint"), tgt - err)
        hi_t = F.least(F.col("n").cast("bigint"), tgt + err)
        aggs += [
            _discrete_pct(F.col("v"), F.col("rn"), tgt).alias(f"p{p}_cents"),
            _discrete_pct(F.col("v"), F.col("rn"), lo_t).alias(f"__lo{p}"),
            _discrete_pct(F.col("v"), F.col("rn"), hi_t).alias(f"__hi{p}"),
            F.percentile_approx(
                "v", F.lit(p / 100.0), F.lit(accuracy)
            ).alias(f"__a{p}"),
        ]
        post.append(
            (
                (F.col(f"__a{p}") >= F.col(f"__lo{p}"))
                & (F.col(f"__a{p}") <= F.col(f"__hi{p}"))
            ).alias(f"p{p}_ok")
        )
    out = base.groupBy("g").agg(*aggs)
    keep = ["g", "n"] + [f"p{p}_cents" for p in percentiles]
    return out.select(*keep, *post)
