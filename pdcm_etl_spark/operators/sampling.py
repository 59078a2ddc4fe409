"""Deterministic sampling operators.

``df.sample()`` draws from a per-partition RNG — resampling changes with
partitioning, retries, and engines, which is poison for reproducible
training-data pipelines. The operators here decide membership from a
portable content hash (first 15 hex chars of md5, the same digest the
dedup family uses), so a row's fate is a pure function of its key:
stable across runs, partitionings, engines (exact DuckDB oracle), and
trivially auditable ("why is this row in the sample?").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdcm_etl_spark.operators.dedup import portable_hash60

BUCKETS = 10_000  # basis-point resolution


def hash_sample(df: DataFrame, key_col: str, rate_bp: int) -> DataFrame:
    """Keep rows whose key hashes into the first ``rate_bp`` of 10000
    buckets — a deterministic ~rate_bp/10000 sample, exact per key."""
    bucket = portable_hash60(F.col(key_col).cast("string")) % BUCKETS
    return df.filter(bucket < rate_bp)


def hash_stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, rates_bp: dict[str, int]
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    rate (basis points); strata absent from ``rates_bp`` are dropped.
    Map-side only — no shuffle, no RNG, scan-parallel at any size."""
    bucket = portable_hash60(F.col(key_col).cast("string")) % BUCKETS
    rate = None
    for stratum, bp in rates_bp.items():
        cond = F.when(F.col(strata_col) == stratum, F.lit(bp))
        rate = cond if rate is None else rate.when(
            F.col(strata_col) == stratum, F.lit(bp)
        )
    rate = (rate.otherwise(F.lit(0)) if rate is not None else F.lit(0))
    return df.filter(bucket < rate)


def shuffle_shards(
    df: DataFrame, key_col: str, n_shards: int, sub_buckets: int = 64
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training-data
    export: every row gets a (shard, pos) — the reproducible equivalent
    of `df.orderBy(rand()).repartition(n)` that training pipelines
    actually need (an RNG shuffle changes with partitioning and retries;
    this one is a pure function of the key).

    shard = portable_hash(key) % n_shards is map-side.  pos is computed
    with a TWO-LEVEL window (round-3 advice: a window partitioned only by
    shard caps sort parallelism at n_shards — each shard's whole row set
    would sort in a single task):

      1. ``sub`` = range-bucket of the 60-bit hash (monotone in the hash,
         so sub-bucket order IS hash order); the heavy row_number window
         partitions by (shard, sub) → n_shards × sub_buckets parallel
         sorts of ~data/(n_shards·sub_buckets) rows each;
      2. per-(shard, sub) counts (map-side partial agg, n_shards ×
         sub_buckets rows total) get a per-shard running-sum offset on a
         scalar-scale window, broadcast back;
      3. pos = offset + within-bucket row_number — bit-identical to the
         single-window form because sub is monotone in the ordering key.

    Raise ``sub_buckets`` with data size; parallelism = n_shards ×
    sub_buckets regardless of how few output shards the export wants.
    """
    from pyspark.sql import Window

    sub_width = max(1, (1 << 60) // sub_buckets)  # h < 2^60 ⇒ sub < sub_buckets
    base = (
        df.withColumn("__h", portable_hash60(F.col(key_col).cast("string")))
        .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
        .withColumn("__sub", F.expr(f"__h div {sub_width}"))
    )
    counted = base.groupBy("shard", "__sub").agg(F.count(F.lit(1)).alias("__c"))
    w_off = (
        Window.partitionBy("shard")
        .orderBy("__sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counted.select(
        "shard",
        "__sub",
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("shard", "__sub").orderBy("__h", key_col)
    return (
        base.withColumn("__w", F.row_number().over(w_in))
        .join(F.broadcast(offsets), ["shard", "__sub"])
        .withColumn("pos", (F.col("__off") + F.col("__w")).cast("int"))
        .select(*df.columns, "shard", "pos")
    )


def top_percentile_filter(
    df: DataFrame, metric: str, id_col: str, min_pr_bp: int = 9000
) -> DataFrame:
    """Keep rows whose global percent_rank over (metric asc, id asc) is
    ≥ ``min_pr_bp`` basis points, emitting the exact ``pr_bp`` — WITHOUT a
    single-partition global window sort (the 100 TB killer that
    ``Window.orderBy()`` with no partition spec plans).

    Two-pass exact plan:
      1. distributed histogram of the (integer-valued) metric; the
         per-value counts are collected to the driver — bounded by the
         metric's value domain (e.g. basis points → ≤ 10001 rows), a
         scalar-scale collect like the k-means centroid rows;
      2. driver arithmetic finds the cutoff rank ``rn_min`` (smallest rank
         with floor((rn-1)*10^4/(n-1)) ≥ min_pr_bp) and the threshold
         metric value ``t``;
      3. the ``metric ≥ t`` sliver (≈ (10000-min_pr_bp)/10000 of the data)
         gets a within-value row_number — the window is PARTITIONED by the
         metric value, so it parallelizes — and the exact global rank is
         cum_before(value) + within_rank via a broadcast join of the tiny
         cumulative-count table. Integer arithmetic end-to-end ⇒ results
         are bit-identical to the naive global-window form (the DuckDB
         oracle keeps that form).
    """
    from pyspark.sql import Window

    # the histogram collect in step 1 is only bounded because the metric
    # has a small integral value domain — enforce both halves of that
    # precondition instead of trusting the caller (a float or
    # high-cardinality metric would silently become a data-sized collect)
    mtype = df.schema[metric].dataType.simpleString()
    if mtype not in {"tinyint", "smallint", "int", "bigint"}:
        raise TypeError(
            f"top_percentile_filter: metric {metric!r} is {mtype}; the "
            "exact two-pass plan needs an integral metric with a bounded "
            "value domain (e.g. basis points) — bucketize the metric first"
        )
    n_vals = df.agg(
        F.approx_count_distinct(metric).alias("n")
    ).collect()[0]["n"]
    if n_vals > 4 * BUCKETS:
        raise ValueError(
            f"top_percentile_filter: metric {metric!r} has ~{n_vals} "
            f"distinct values (> {4 * BUCKETS}); the histogram collect "
            "would be data-sized — bucketize the metric to a bounded "
            "domain (e.g. basis points) first"
        )
    hist = df.groupBy(metric).agg(F.count(F.lit(1)).alias("cnt")).collect()
    values = sorted((r[metric], r["cnt"]) for r in hist)
    n = sum(c for _, c in values)
    if n == 0:
        return df.withColumn("pr_bp", F.lit(0).cast("bigint")).limit(0)
    d = max(n - 1, 1)  # percent_rank denominator (single row ⇒ pr = 0)
    a = min_pr_bp * d
    rn_min = -(-a // BUCKETS) + 1  # smallest rank with (rn-1)*1e4 ≥ min_pr_bp*(n-1)
    cum = 0
    t = None
    cum_before: list[tuple] = []
    for v, c in values:
        if t is None and cum + c >= rn_min:
            t = v
        if t is not None:
            cum_before.append((v, cum))
        cum += c
    if t is None:  # min_pr_bp past the end — nothing qualifies
        return df.withColumn("pr_bp", F.lit(0).cast("bigint")).limit(0)

    from pdcm_etl_spark.functions.local_table import values_table

    spark = df.sparkSession
    cum_df = values_table(
        spark,
        [(int(v), int(cb)) for v, cb in cum_before],
        f"{metric} bigint, __cumb bigint",
    )
    w = Window.partitionBy(metric).orderBy(id_col)
    return (
        df.filter(F.col(metric) >= t)
        .withColumn("__w", F.row_number().over(w))
        .join(F.broadcast(cum_df), metric)
        .withColumn("__rn", F.col("__cumb") + F.col("__w"))
        .filter(F.col("__rn") >= rn_min)
        .withColumn("pr_bp", F.expr(f"((__rn - 1) * {BUCKETS}) div {d}"))
        .drop("__w", "__cumb", "__rn")
    )


def domain_mix_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    weights: dict[str, int] | None = None,
    weight_expr: F.Column | None = None,
    budget_ppm: int = 500_000,
) -> DataFrame:
    """Rebalance a corpus toward a target domain mix — the data-mixing
    step of training-data pipelines (e.g. up-weighting curated sources
    against a crawl): given per-domain target weights, compute each
    domain's deterministic keep-rate and hash-sample it.

    rate_ppm(domain) = min(1e6, budget_ppm · w_d · N / (W · n_d))
    where n_d = domain rows, N = total rows, W = total weight — i.e. the
    output approximates budget_ppm of the corpus distributed across
    domains ∝ their weights, clipping domains too small to fill their
    share (no upsampling). All arithmetic is integer (ppm) and the
    membership test is the portable content hash, so the sample is a
    pure function of the data — reproducible across runs, partitionings
    and engines (exact DuckDB oracle).

    Scale: one map-side partial count per domain (domain cardinality ≪
    rows), a broadcast join of the tiny rate table, a map-side hash
    filter. No data-sized shuffle at all.

    Returns the sampled rows + (weight, rate_ppm) for auditability.
    """
    w = weight_expr if weight_expr is not None else None
    if w is None and weights is not None:
        w = F.lit(0)
        for dom, wt in weights.items():
            w = F.when(F.col(domain_col) == dom, F.lit(wt)).otherwise(w)
    if w is None:
        raise ValueError("domain_mix_sample: pass weights or weight_expr")

    from pyspark.sql import Window

    counts = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__w", w.cast("bigint"))
    )
    # N and W via an unpartitioned window over the COUNTS table — one row
    # per domain, so the single-partition window is metadata-sized (a
    # crossJoin of the totals aggregate trips Spark's self-join attribute
    # disambiguation here). W sums weights over DISTINCT domains.
    w_all = Window.partitionBy()
    # NB: names must differ case-insensitively from __n/__w — Spark's
    # default case-insensitive resolution makes withColumn("__N") SILENTLY
    # REPLACE __n
    rates = (
        counts
        .withColumn("__ntot", F.sum("__n").over(w_all))
        .withColumn("__wtot", F.sum("__w").over(w_all))
        .select(
            domain_col,
            F.col("__w").alias("weight"),
            F.least(
                F.lit(1_000_000).cast("bigint"),
                F.expr(
                    f"({budget_ppm} * __w * __ntot) div (__wtot * __n)"
                ),
            ).alias("rate_ppm"),
        )
    )
    bucket = portable_hash60(F.col(key_col).cast("string")) % F.lit(1_000_000)
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(bucket < F.col("rate_ppm"))
        .select(*df.columns, "weight", "rate_ppm")
    )


def token_budget_select(
    df: DataFrame,
    domain_col: str,
    quality_col: str,
    tokens_col: str,
    id_col: str,
    budget_tokens: int,
    quality_bucket: int = 1000,
) -> DataFrame:
    """Budget-capped curriculum selection: per domain, keep the
    best-quality documents until the domain's TOKEN budget is filled —
    the data-mixing step where each source contributes a fixed token
    count to a training run, filled in quality order (contrast
    ``domain_mix_sample``, which thins by a RATE; this op fills a
    QUOTA). A row is kept iff the running token total, over
    ``(quality desc, id asc)`` within its domain, stays <= the budget —
    the greedy prefix of the quality ordering, deterministic and
    integer-exact.

    Scale: the naive form is one window over each domain — a single
    task per domain no matter how large the domain (the hot-domain
    trap: one crawl source can be half the corpus). Here the running
    sum is TWO-LEVEL, the shuffle_shards trick: rows split into
    quality-range buckets (``quality div quality_bucket``), the
    within-bucket running sum sorts only its bucket's rows, and bucket
    OFFSETS come from a bucket-cardinality-sized window that re-enters
    on a broadcast join. Sort parallelism = domains x buckets, not
    domains; no data-sized single-task sort anywhere. (A domain whose
    rows all share ONE quality value still lands in one bucket — pick
    ``quality_bucket`` below the quality spread.)

    ``quality_col`` must be non-negative (bucket order uses integer
    division). The offsets table is domains × buckets rows and is
    FORCE-broadcast — right for the data-mixing regime this op targets
    (source domains number in the thousands); a corpus keyed on
    mega-cardinality "domains" (e.g. per-URL) should drop the broadcast
    and let the offsets join shuffle. Returns kept rows: (domain, id,
    quality, n_tokens, cum_tokens)."""
    from pyspark.sql import Window

    base = df.select(
        F.col(domain_col).alias("domain"),
        F.col(id_col).alias("id"),
        F.col(quality_col).cast("bigint").alias("q"),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
        # ascending bucket id == descending quality range; integer DIV
        # (double `/` + cast would lose exactness past 2^53)
        F.expr(
            f"-(CAST({quality_col} AS BIGINT) DIV {int(quality_bucket)})"
        ).alias("__qb"),
    )
    w_in = (
        Window.partitionBy("domain", "__qb")
        .orderBy(F.desc("q"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("__cum_in", F.sum("n_tokens").over(w_in))
    # bucket totals: domains x buckets rows — tiny next to the corpus
    totals = base.groupBy("domain", "__qb").agg(
        F.sum("n_tokens").alias("__tot")
    )
    w_off = (
        Window.partitionBy("domain")
        .orderBy(F.asc("__qb"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "domain",
        "__qb",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        within.join(F.broadcast(offsets), ["domain", "__qb"])
        .select(
            "domain",
            "id",
            F.col("q").alias("quality"),
            "n_tokens",
            (F.col("__off") + F.col("__cum_in")).alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= F.lit(budget_tokens))
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (k items,
    inclusion probability ∝ weight) — the Efraimidis–Spirakis A-ES
    scheme on exponential clocks: each row draws uᵢ from its portable
    content hash and the k smallest −ln(uᵢ)/wᵢ win. One pass, and the
    top-k is orderBy+limit → TakeOrderedAndProject (per-partition
    k-row heaps merged at the driver — no global sort, no shuffle of
    the data itself): the canonical corpus-subsample shape (length- or
    quality-weighted) at 100 TB.

    Determinism without an RNG: uᵢ = (h mod 2³⁰ + 1)/(2³⁰ + 1) from
    the 60-bit md5-fold hash — exactly representable, identical on
    both engines, and u ∈ (0,1) strictly so ln is finite. ln() is
    libm on both sides; the SELECTION is robust to 1-ulp divergence
    unless the k-th and (k+1)-th clocks tie to ~1e-15 relative
    (property-tested margin at gate scale), and the OUTPUT carries no
    float columns at all — membership only, ties broken by key.
    """
    h = portable_hash60(F.col(key_col).cast("string"))
    u = (h % F.lit(1 << 30) + 1) / F.lit(float((1 << 30) + 1))
    clock = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__clock", clock)
        .orderBy(F.col("__clock").asc(), F.col(key_col).asc())
        .limit(k)
        .drop("__clock")
    )


def weighted_sample_grouped(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Per-group deterministic weighted sampling without replacement —
    ``weighted_sample``'s stratified form (k items PER GROUP, inclusion
    ∝ weight): the per-domain curriculum subsample (k best-weighted
    docs per language/source) in one operator.

    Same Efraimidis–Spirakis exponential clocks on the portable hash;
    the top-k is a rank window PARTITIONED BY THE GROUP (one
    group-keyed shuffle, per-group sort — parallelism = group count;
    for few huge groups, fall back to the ungrouped operator per
    group or sub-bucket the window like shuffle_shards). Output is
    float-free membership, ties broken by key.
    """
    from pyspark.sql import Window

    h = portable_hash60(F.col(key_col).cast("string"))
    u = (h % F.lit(1 << 30) + 1) / F.lit(float((1 << 30) + 1))
    clock = -F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(
        clock.asc(), F.col(key_col).asc()
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def split_leakage_audit(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_folds: int = 4,
) -> DataFrame:
    """Train/eval split leakage audit: after a deterministic hash split,
    find CONTENT that straddles folds — documents whose canonical
    fingerprint (md5 of the sorted distinct token set, the dedup
    family's clustering key) appears in more than one fold. An
    id-hash split is clean by construction at the ID level; the leak a
    benchmark cares about is the same TEXT landing in both train and
    eval under different ids. This is the audit a pipeline runs before
    publishing a split.

    Scale shape: fold assignment and fingerprinting are both map-side
    (portable hash / md5 — no shuffle); ONE fingerprint-keyed hash agg
    collects distinct folds + exemplar ids per content cluster
    (collect_set over ≤ n_folds ints and two min/max exemplars — state
    is O(n_folds), never row-sized); leaked clusters are the rows with
    ≥ 2 distinct folds. No self-join on text, no pair explosion.

    Returns (fingerprint, n_docs, n_folds_hit, folds, min_id, max_id)
    for leaked fingerprints only, with folds sorted for determinism.
    """
    from pdcm_etl_spark.operators.text import add_fingerprint

    if n_folds < 2:
        raise ValueError(
            f"split_leakage_audit: n_folds={n_folds} — a split needs at"
            " least 2 folds for leakage to be definable (n_folds=1"
            " makes the audit vacuously empty, and 0 divides by zero)"
        )

    tagged = add_fingerprint(df, text_col=text_col).select(
        F.col(id_col).alias("__id"),
        "fingerprint",
        (portable_hash60(F.col(id_col).cast("string")) % n_folds)
        .cast("int")
        .alias("__fold"),
    )
    return (
        tagged.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.size(F.collect_set("__fold")).cast("int").alias("n_folds_hit"),
            # comma-joined (not an array column: the driver gate hashes
            # pandas values and object-dtype lists are unhashable)
            F.array_join(F.array_sort(F.collect_set("__fold")), ",").alias(
                "folds"
            ),
            F.min("__id").alias("min_id"),
            F.max("__id").alias("max_id"),
        )
        .filter(F.col("n_folds_hit") >= 2)
    )


def balanced_downsample(
    df: DataFrame,
    class_col: str,
    key_col: str,
) -> DataFrame:
    """Deterministic class balancing: downsample every class to the
    size of the SMALLEST class, keeping each class's first-k rows by
    portable content hash — the class-balancing step before training a
    classifier on skewed labels, with the repo's reproducibility
    contract (membership is a pure function of the key: stable across
    runs, partitionings, and engines — df.sample() is none of these).

    Scale shape: one bounded class-count aggregate (the scalar min is
    the only collect — classes-sized, the same k-bounded class the
    centroid collects fall into); then ONE class-partitioned rank
    window ordered (hash, key) with the rank filter. No join.

    Returns (class, key) for the kept rows.
    """
    base = df.select(
        F.col(class_col).alias("class"), F.col(key_col).alias("key")
    ).filter(F.col("class").isNotNull())
    counts = base.groupBy("class").agg(F.count(F.lit(1)).alias("n"))
    k = counts.agg(F.min("n")).first()[0]
    if k is None:
        return base.limit(0)
    w = Window.partitionBy("class").orderBy(
        portable_hash60(F.col("key").cast("string")).asc(), F.col("key").asc()
    )
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .select("class", "key")
    )


def stratified_kfold_assign(
    df: DataFrame,
    id_col: str,
    class_col: str,
    n_folds: int = 5,
) -> DataFrame:
    """Deterministic STRATIFIED k-fold assignment audit: folds are
    assigned round-robin WITHIN each class by portable-hash rank, so
    every fold carries each class in near-equal measure (|counts
    differ| ≤ 1 per class) — the split a per-class-balanced eval needs
    where the plain id-hash split (split_leakage_audit's subject) only
    balances in expectation and starves rare classes in small folds.
    Output is the (class, fold) contingency table — the artifact a
    pipeline commits to prove the split it trained on was balanced.

    Scale shape: fold assignment is one rank window PARTITIONED BY
    CLASS (hash rank ``% n_folds`` — one class-keyed shuffle, the same
    shape as balanced_downsample), and the audit table is a (class,
    fold) count over it — output bounded by classes × folds, state
    O(1) per window row. Determinism: rank over (portable_hash60(id),
    id) — total order, no RNG.

    Returns (class, fold, n_rows).
    """
    w = Window.partitionBy(class_col).orderBy(
        portable_hash60(F.col(id_col).cast("string")).asc(),
        F.col(id_col).asc(),
    )
    assigned = df.select(
        F.col(class_col).alias("class"),
        ((F.row_number().over(w) - 1) % n_folds).cast("int").alias("fold"),
    )
    return assigned.groupBy("class", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
