"""Relational operator catalog.

One named query per operator family in SURVEY.md §2, expressed over the
driver's TPC-H-ish test lake, each paired with a DuckDB-ANSI oracle SQL
(the driver's correctness gate). The Spark side is written the way the
engine means it: DataFrame-first, broadcast hints on dim joins, decimal
casts where cross-engine float determinism matters, aliases matching the
oracle exactly.

Determinism rules used throughout (both sides):
- money / double aggregation goes through DECIMAL casts (exact, engine-
  independent) with an explicit final scale so textual forms also agree;
- ratios use ``floor(x * 10000)`` basis points instead of ``round`` (no
  rounding-mode ambiguity);
- arrays are ``array_sort``-ed (collect_set order is nondeterministic);
- every top-k has a total-order tiebreak.

Scale notes are attached per query: what broadcasts, what shuffles, and
why the plan survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

D182 = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet with `ts` normalized to a microsecond timestamp.

    The generator has shipped two physical types for `ts`: TIMESTAMP(NANOS)
    (rejected by Spark's vectorized reader — read nanos as long, then
    integer-divide; `/1000` double division rounds 1µs off DuckDB's ns→µs
    truncation) and plain µs TIMESTAMP (pass through). Branch on the read
    schema so both vintages work."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


# ---------------------------------------------------------------------------
# Aggregation (SURVEY §2.5)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped groupBy aggregate (the reference's dominant agg shape,
    e.g. search_index_molecular_data_transformer_job.py:219-309).

    Scale: partial (map-side) aggregation then a 2-key shuffle — the
    canonical hash-agg; no skew risk with 6 groups after AQE coalesces.
    """
    li = _t(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast(D182) * (
        F.lit(1).cast(D182) - F.col("l_discount").cast(D182)
    )
    # Aggregation stays exact DECIMAL; the *final projection* is bigint
    # fixed-point (cents / 1e-4 units) so the cross-engine canonical form
    # is an integer on both sides (decimal.Decimal vs float64 textual
    # scale mismatch was the round-1 hash failure).
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(F.col("l_quantity").cast(D182)) * 100)
            .cast("bigint")
            .alias("sum_qty_c"),
            (F.sum(F.col("l_extendedprice").cast(D182)) * 100)
            .cast("bigint")
            .alias("sum_base_price_c"),
            (F.sum(dec) * 10000).cast("bigint").alias("sum_disc_price_x10k"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_c,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_price_c,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS sum_disc_price_x10k,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + predicate + projection (SURVEY §2.3). Both the filter and the
    4-column read schema push down to the parquet scan (verified via
    .explain → PushedFilters / ReadSchema)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_shipdate") >= F.lit("2000-01-01"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        # bigint fixed-point final projection (canonicalization-safe)
        (F.col("l_extendedprice").cast(D182) * 100).cast("bigint").alias("price_c"),
        (
            F.col("l_extendedprice").cast(D182)
            * (F.lit(1).cast(D182) - F.col("l_discount").cast(D182))
            * 10000
        )
        .cast("bigint")
        .alias("disc_price_x10k"),
    )


SQL_FILTER_PROJECT = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS disc_price_x10k
FROM lineitem
WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '2000-01-01'
"""


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.4)
# ---------------------------------------------------------------------------


def q_join_left_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-resolution left joins through two dims (ref dataframe_functions.py:
    7-63 join_left_dfs). Dims broadcast → no shuffle of the fact side."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select("c_custkey", "n_name", "r_name")
    )


SQL_JOIN_LEFT_FK = """
SELECT c_custkey, n_name, r_name
FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
"""


def q_join_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column equi join (ref model_transformer_job.py:88-94,
    molecular_characterization_fk_assigner.py:33-36): lineitem⋈orders on
    (orderkey, status). Single shuffle on the compound key."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderstatus").alias("l_linestatus"),
        "o_orderpriority",
    )
    return (
        li.join(orders, on=["l_orderkey", "l_linestatus"], how="inner")
        .groupBy("l_linestatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


SQL_JOIN_MULTI_KEY = """
SELECT l_linestatus, o_orderpriority, COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey AND l_linestatus = o_orderstatus
GROUP BY l_linestatus, o_orderpriority
"""


def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (ref model_transformer_job.py:103-107 eqNullSafe):
    nulls match nulls; a plain equi join would drop the null group."""
    customer = _t(spark, sf_dir, "customer")
    left = customer.select(
        "c_custkey", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    )
    right = (
        left.select("seg")
        .distinct()
        .select(
            F.col("seg").alias("r_seg"),
            F.concat(F.lit("seg:"), F.coalesce(F.col("seg"), F.lit("NULL"))).alias("label"),
        )
    )
    return (
        left.join(F.broadcast(right), left.seg.eqNullSafe(right.r_seg), "left")
        .groupBy("seg", "label")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


SQL_JOIN_NULLSAFE = """
WITH leftside AS (
  SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg FROM customer
), rightside AS (
  SELECT seg AS r_seg, 'seg:' || COALESCE(seg, 'NULL') AS label
  FROM (SELECT DISTINCT seg FROM leftside)
)
SELECT seg, label, COUNT(*) AS n_customers
FROM leftside LEFT JOIN rightside ON seg IS NOT DISTINCT FROM r_seg
GROUP BY seg, label
"""


def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (ref treatment_data_aggregator_by_model.py:135-137):
    active customers ⟗ per-customer order counts; both sides have
    unmatched rows."""
    customer = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 3000)
    order_counts = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    joined = customer.join(
        order_counts, customer.c_custkey == order_counts.o_custkey, "outer"
    )
    return joined.select(
        F.coalesce(customer.c_custkey, order_counts.o_custkey).alias("custkey"),
        customer.c_custkey.isNotNull().alias("is_active_customer"),
        F.coalesce(order_counts.n_orders, F.lit(0)).alias("n_orders"),
    )


SQL_JOIN_FULL_OUTER = """
WITH active AS (SELECT * FROM customer WHERE c_acctbal > 3000),
oc AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
SELECT COALESCE(c_custkey, o_custkey) AS custkey,
       c_custkey IS NOT NULL AS is_active_customer,
       COALESCE(n_orders, 0) AS n_orders
FROM active FULL OUTER JOIN oc ON c_custkey = o_custkey
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (ref treatment_and_component_helper_transformer_job.py:
    84-85): customers with no orders."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


SQL_JOIN_ANTI = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (ref ontology_term_diagnosis_transformer_job.py:47-50
    rewrites isin(collect) → semi): suppliers that shipped something."""
    supplier = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    return supplier.join(
        li, supplier.s_suppkey == li.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


SQL_JOIN_SEMI = """
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
"""


def q_join_theta_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's expression join `colA || ' ' || colB == entry`
    (molecular_data_links_builder.py:61-64) rewritten as an equi join on a
    precomputed concat key — BroadcastHashJoin instead of BNLJ. That rewrite
    is exactly what survives 100 TB."""
    part = _t(spark, sf_dir, "part")
    entry = F.concat_ws(" ", F.col("p_brand"), F.col("p_type"))
    lookup = (
        part.filter(F.col("p_size") <= 2).select(entry.alias("entry")).distinct()
    )
    return (
        part.withColumn("entry", entry)
        .join(F.broadcast(lookup), "entry", "inner")
        .groupBy("entry")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


SQL_JOIN_THETA_REWRITE = """
WITH lookup AS (
  SELECT DISTINCT p_brand || ' ' || p_type AS entry FROM part WHERE p_size <= 2
)
SELECT entry, COUNT(*) AS n_parts
FROM part JOIN lookup ON p_brand || ' ' || p_type = entry
GROUP BY entry
"""


def q_correlated_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'exactly one match' semantics of the symbol-harmonisation
    correlated subquery (markers_harmonisation.py:99-141), written the
    idiomatic way: pre-aggregate + join (Catalyst would decorrelate the
    subquery into this same plan)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    counts = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        customer.join(
            counts,
            (customer.c_custkey == counts.o_custkey) & (counts.cnt == 1),
            "inner",
        )
        .select("c_custkey", "c_name")
    )


SQL_CORRELATED_COUNT = """
SELECT c_custkey, c_name FROM customer c
WHERE (SELECT COUNT(1) FROM orders o WHERE o.o_custkey = c.c_custkey) = 1
"""


def q_array_equality_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued grouping key (the regimen-detection shape: sorted
    collect_set equality, treatment_data_aggregator_by_model.py:276-278).
    Orders grouped by their canonical returnflag basket."""
    li = _t(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_returnflag")).alias("basket_arr")
    )
    # grouping happens on the *array* (the operator under test); the final
    # projection serializes it so the driver canonicalizer can hash rows
    return (
        baskets.groupBy("basket_arr")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(F.array_join("basket_arr", "|").alias("basket"), "n_orders")
    )


SQL_ARRAY_EQUALITY_GROUP = """
WITH baskets AS (
  SELECT l_orderkey, list_sort(list_distinct(list(l_returnflag))) AS basket_arr
  FROM lineitem GROUP BY l_orderkey
)
SELECT array_to_string(basket_arr, '|') AS basket, COUNT(*) AS n_orders
FROM baskets GROUP BY basket_arr
"""


def q_harmonisation_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential match-and-remainder cascade (markers_harmonisation.py:
    27-62): stage 1 matches against lookup A, the remainder tries lookup B,
    leftovers labelled 'none'.

    r11 shape: the semi/anti-join-per-stage + union form re-scanned the
    fact once per stage AND re-ran the remainder pipeline per consumer
    (8 part scans in one plan). The cascade is label assignment, not
    row routing — so it is ONE fact scan with each lookup's distinct
    keys attached as a broadcast LEFT join hit marker and the stage
    precedence folded into a CASE (exactly the oracle's shape). A null
    join key never matches either way, so null-brand rows fall through
    identically to the anti-join form."""
    part = _t(spark, sf_dir, "part")
    lookup_a = (
        part.filter(F.col("p_size") <= 3)
        .select("p_brand")
        .distinct()
        .withColumn("__a", F.lit(1))
    )
    lookup_b = (
        part.filter(F.col("p_size") >= 45)
        .select("p_type")
        .distinct()
        .withColumn("__b", F.lit(1))
    )
    return (
        part.select("p_partkey", "p_brand", "p_type")
        .join(F.broadcast(lookup_a), "p_brand", "left")
        .join(F.broadcast(lookup_b), "p_type", "left")
        .select(
            "p_partkey",
            F.when(F.col("__a") == 1, F.lit("brand"))
            .when(F.col("__b") == 1, F.lit("type"))
            .otherwise(F.lit("none"))
            .alias("matched_by"),
        )
    )


SQL_HARMONISATION_CASCADE = """
SELECT p_partkey,
       CASE
         WHEN p_brand IN (SELECT DISTINCT p_brand FROM part WHERE p_size <= 3) THEN 'brand'
         WHEN p_type  IN (SELECT DISTINCT p_type  FROM part WHERE p_size >= 45) THEN 'type'
         ELSE 'none'
       END AS matched_by
FROM part
"""


# ---------------------------------------------------------------------------
# Window / sort / top-k (SURVEY §2.6, §2.7)
# ---------------------------------------------------------------------------


def q_sorted_list_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's only window pattern (sorted full list per group,
    treatment_data_aggregator_by_model.py:225-256) in its idiomatic rewrite:
    array_sort(collect_set) — one hash agg, no window sort."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        # serialized in the same expression — the sorted-set semantics are
        # identical; '|'-joined for driver canonicalizer hashability
        F.array_join(
            F.array_sort(F.collect_set("o_orderpriority")), "|"
        ).alias("priorities")
    )


SQL_SORTED_LIST_PER_GROUP = """
SELECT o_custkey,
       array_to_string(list_sort(list_distinct(list(o_orderpriority))), '|') AS priorities
FROM orders GROUP BY o_custkey
"""


def q_window_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window (beyond-reference; needed by the view layer): latest
    order per customer via row_number with a total-order tiebreak."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


SQL_WINDOW_LATEST = """
SELECT o_custkey, o_orderkey, o_orderdate FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1
"""


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (orderBy + limit → TakeOrderedAndProject: per-partition
    heaps + driver merge, no global sort shuffle)."""
    customer = _t(spark, sf_dir, "customer")
    return (
        customer.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .select("c_custkey", "c_name", "c_acctbal")
        .limit(10)
    )


SQL_TOPK = """
SELECT c_custkey, c_name, c_acctbal FROM customer
ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# Set ops (SURVEY §2.8)
# ---------------------------------------------------------------------------


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName + distinct (the reference's standard set op,
    spark_reader.py:190, publication_group_transformer_job.py:37)."""
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .unionByName(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


SQL_UNION_DISTINCT = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


# ---------------------------------------------------------------------------
# Scalar kit (SURVEY §2.9) — strings, regex, explode, conditionals, JSON
# ---------------------------------------------------------------------------


def q_string_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning kit parity (cleaner.py:8-44): trim/lower composition +
    global regexp_replace."""
    from pdcm_etl_spark.functions.cleaner import lower_and_trim_all

    customer = _t(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        lower_and_trim_all(F.col("c_name")).alias("clean_name"),
        F.regexp_replace(F.col("c_name"), "[0-9]+", "#").alias("masked_name"),
    )


SQL_STRING_CLEAN = """
SELECT c_custkey,
       lower(trim(regexp_replace(c_name, ' ', ' ', 'g'))) AS clean_name,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked_name
FROM customer
"""


def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract parity (spark_reader.py:54-56 provider extraction,
    molecular_data_links_builder.py:120,136 rs/COSV ids)."""
    customer = _t(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.regexp_extract(F.col("c_name"), r"Customer#(\d+)", 1).alias("cust_num"),
    )


SQL_REGEXP_EXTRACT = r"""
SELECT c_custkey, regexp_extract(c_name, 'Customer#(\d+)', 1) AS cust_num
FROM customer
"""


def q_posexplode_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + posexplode with positional matching (ref treatment_and_
    component_helper_transformer_job.py:98-133 `+`-separated lists)."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey", F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "word")
    ).select("p_partkey", F.col("pos").cast("int").alias("pos"), "word")


SQL_POSEXPLODE_SPLIT = """
SELECT p_partkey,
       CAST(unnest(range(len(string_split(p_name, ' ')))) AS INTEGER) AS pos,
       unnest(string_split(p_name, ' ')) AS word
FROM part
"""


def q_explode_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unnest + GROUP BY (the views.sql:1113-1141 pattern → explode +
    groupBy().count())."""
    part = _t(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split(F.col("p_name"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_EXPLODE_GROUP_COUNT = """
SELECT word, COUNT(*) AS n FROM (
  SELECT unnest(string_split(p_name, ' ')) AS word FROM part
) GROUP BY word
"""


def q_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise bucket chain — the `_bin_age` UDF
    (search_index_patient_sample_transformer_job.py:154-172) rebuilt as a
    pure column expression (codegen, no Python round-trip)."""
    customer = _t(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "0 - 999")
        .when(F.col("c_acctbal") < 5000, "1000 - 4999")
        .otherwise("5000+")
    )
    return (
        customer.select(bucket.alias("balance_bucket"))
        .groupBy("balance_bucket")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


SQL_CASE_BUCKETS = """
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 1000 THEN '0 - 999'
            WHEN c_acctbal < 5000 THEN '1000 - 4999'
            ELSE '5000+' END AS balance_bucket,
       COUNT(*) AS n_customers
FROM customer GROUP BY 1
"""


def q_collect_set_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """markers-per-model analog (search_index_molecular_data_transformer_job
    .py:307-309): sorted supplier set + cardinality per part."""
    li = _t(spark, sf_dir, "lineitem")
    sset = F.array_sort(F.collect_set("l_suppkey"))
    return li.groupBy("l_partkey").agg(
        # numeric-sorted set, stringified elementwise then '|'-joined so
        # the driver canonicalizer can hash the row
        F.array_join(sset.cast("array<string>"), "|").alias("suppliers"),
        F.size(sset).alias("n_suppliers"),
    )


SQL_COLLECT_SET_MARKERS = """
SELECT l_partkey,
       array_to_string(list_sort(list_distinct(list(l_suppkey))), '|') AS suppliers,
       CAST(len(list_distinct(list(l_suppkey))) AS INTEGER) AS n_suppliers
FROM lineitem GROUP BY l_partkey
"""


def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max(when(...)) conditional aggregation (resources_per_model_util.py:
    100-103)."""
    orders = _t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return orders.groupBy("o_custkey").agg(
        F.max(F.when(urgent, F.lit(1)).otherwise(F.lit(0))).alias("has_urgent"),
        F.min(F.when(urgent, F.col("o_orderdate"))).alias("first_urgent_date"),
    )


SQL_CONDITIONAL_AGG = """
SELECT o_custkey,
       MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS has_urgent,
       MIN(CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderdate END) AS first_urgent_date
FROM orders GROUP BY o_custkey
"""


def q_profile_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling operator (available_molecular_data_columns_
    transformer_job.py:151-158): not-null counts over many columns per
    group, in one pass."""
    events = _t(spark, sf_dir, "events")
    def nn(c: str):
        return F.sum(F.col(c).isNotNull().cast("long")).alias(f"nn_{c}")

    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"), nn("user_id"), nn("value"), nn("props")
    )


SQL_PROFILE_NOTNULL = """
SELECT event_type, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_user_id,
       CAST(SUM(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_value,
       CAST(SUM(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_props
FROM events GROUP BY event_type
"""


def q_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless global aggregate — the reference fakes this with a dummy
    lit(0) key (search_facet_transformer_job.py:72-83); df.agg needs none."""
    region = _t(spark, sf_dir, "region")
    return region.agg(
        F.array_join(F.array_sort(F.collect_set("r_name")), "|").alias("region_names"),
        F.count(F.lit(1)).alias("n_regions"),
    )


SQL_GLOBAL_AGG = """
SELECT array_to_string(list_sort(list_distinct(list(r_name))), '|') AS region_names,
       COUNT(*) AS n_regions
FROM region
"""


def q_json_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json(struct(...)) (nodes_transformer_job.py:119,213) — canonical
    JSON instead of the reference's hand-concatenated strings (§1.2)."""
    nation = _t(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.to_json(F.struct(F.col("n_nationkey"), F.col("n_name"))).alias("node_json"),
    )


SQL_JSON_BUILD = """
SELECT n_nationkey,
       to_json(struct_pack(n_nationkey := n_nationkey, n_name := n_name)) AS node_json
FROM nation
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (resources_per_model_util.py:85-86 from_json):
    pull a key out of the events props JSON string."""
    events = _t(spark, sf_dir, "events")
    return events.select(
        "event_id", F.get_json_object(F.col("props"), "$.k").alias("prop_k")
    )


SQL_JSON_EXTRACT = """
SELECT event_id, json_extract_string(props, '$.k') AS prop_k FROM events
"""


def q_fk_dim_dense_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dim-build + FK-assignment pattern (ethnicity_transformer_job.py:
    26-38 + transform_to_fk) with *deterministic* ids: dense_rank over the
    business key replaces monotonically_increasing_id (see functions/ids.py)."""
    from pdcm_etl_spark.functions.ids import dense_id

    customer = _t(spark, sf_dir, "customer")
    dim = (
        customer.select(F.col("c_mktsegment").alias("segment"))
        .distinct()
        .withColumn("segment_id", dense_id("segment").cast("bigint"))
    )
    return (
        customer.join(F.broadcast(dim), customer.c_mktsegment == dim.segment, "left")
        .groupBy("segment_id", "segment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


SQL_FK_DIM_DENSE_ID = """
WITH dim AS (
  SELECT segment, CAST(DENSE_RANK() OVER (ORDER BY segment) AS BIGINT) AS segment_id
  FROM (SELECT DISTINCT c_mktsegment AS segment FROM customer)
)
SELECT segment_id, segment, COUNT(*) AS n_customers
FROM customer LEFT JOIN dim ON c_mktsegment = segment
GROUP BY segment_id, segment
"""


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (beyond-reference analytics-view shape): qty by returnflag ×
    linestatus."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(D182)))
        # bigint centi-units final projection (canonicalization-safe)
        .select(
            "l_returnflag",
            (F.col("O") * 100).cast("bigint").alias("qty_open_c"),
            (F.col("F") * 100).cast("bigint").alias("qty_filled_c"),
        )
    )


SQL_PIVOT_STATUS = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS qty_open_c,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS qty_filled_c
FROM lineitem GROUP BY l_returnflag
"""


def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation over the events table (batch twin of the
    streaming window job in streaming/)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            # TIMESTAMP day bucket, not DATE: Spark DATE reaches pandas as
            # object-dtype datetime.date while DuckDB DATE arrives as
            # datetime64, so the driver canonicalizer hashes them apart
            F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal sum, final-projected to bigint micro-units
            (F.sum(F.col("value").cast("decimal(18,6)")) * 1000000)
            .cast("bigint")
            .alias("sum_value_micro"),
        )
    )


SQL_EVENTS_DAILY = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS sum_value_micro
FROM events GROUP BY 1, 2
"""


def q_recursive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive ancestor closure (the model-relationships tree,
    scripts/updates.sql:6-34, and the ontology DAG closure) — iterative
    DataFrame self-join to fixpoint; oracle uses WITH RECURSIVE.

    Synthetic hierarchy: parent(k) = k // 10 over part keys."""
    from pdcm_etl_spark.operators.graph import ancestor_closure

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") >= 1)
    edges = part.select(
        F.col("p_partkey").cast("bigint").alias("node"),
        (F.floor(F.col("p_partkey") / 10)).cast("bigint").alias("parent"),
    )
    return ancestor_closure(edges)


SQL_RECURSIVE_CLOSURE = """
WITH RECURSIVE anc AS (
  SELECT CAST(p_partkey AS BIGINT) AS node,
         CAST(p_partkey // 10 AS BIGINT) AS ancestor,
         CAST(1 AS INTEGER) AS depth
  FROM part WHERE p_partkey >= 1
  UNION ALL
  SELECT node, CAST(ancestor // 10 AS BIGINT), depth + 1
  FROM anc WHERE ancestor > 0
)
SELECT node, ancestor, depth FROM anc
"""


RELATIONAL_CATALOG: dict[str, tuple] = {
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "filter_project": (q_filter_project, SQL_FILTER_PROJECT),
    "join_left_fk": (q_join_left_fk, SQL_JOIN_LEFT_FK),
    "join_multi_key": (q_join_multi_key, SQL_JOIN_MULTI_KEY),
    "join_nullsafe": (q_join_nullsafe, SQL_JOIN_NULLSAFE),
    "join_full_outer": (q_join_full_outer, SQL_JOIN_FULL_OUTER),
    "join_anti": (q_join_anti, SQL_JOIN_ANTI),
    "join_semi": (q_join_semi, SQL_JOIN_SEMI),
    "join_theta_rewrite": (q_join_theta_rewrite, SQL_JOIN_THETA_REWRITE),
    "correlated_count": (q_correlated_count, SQL_CORRELATED_COUNT),
    "array_equality_group": (q_array_equality_group, SQL_ARRAY_EQUALITY_GROUP),
    "harmonisation_cascade": (q_harmonisation_cascade, SQL_HARMONISATION_CASCADE),
    "sorted_list_per_group": (q_sorted_list_per_group, SQL_SORTED_LIST_PER_GROUP),
    "window_latest": (q_window_latest, SQL_WINDOW_LATEST),
    "topk": (q_topk, SQL_TOPK),
    "union_distinct": (q_union_distinct, SQL_UNION_DISTINCT),
    "string_clean": (q_string_clean, SQL_STRING_CLEAN),
    "regexp_extract": (q_regexp_extract, SQL_REGEXP_EXTRACT),
    "posexplode_split": (q_posexplode_split, SQL_POSEXPLODE_SPLIT),
    "explode_group_count": (q_explode_group_count, SQL_EXPLODE_GROUP_COUNT),
    "case_buckets": (q_case_buckets, SQL_CASE_BUCKETS),
    "collect_set_markers": (q_collect_set_markers, SQL_COLLECT_SET_MARKERS),
    "conditional_agg": (q_conditional_agg, SQL_CONDITIONAL_AGG),
    "profile_notnull": (q_profile_notnull, SQL_PROFILE_NOTNULL),
    "global_agg": (q_global_agg, SQL_GLOBAL_AGG),
    "json_build": (q_json_build, SQL_JSON_BUILD),
    "json_extract": (q_json_extract, SQL_JSON_EXTRACT),
    "fk_dim_dense_id": (q_fk_dim_dense_id, SQL_FK_DIM_DENSE_ID),
    "pivot_status": (q_pivot_status, SQL_PIVOT_STATUS),
    "events_daily": (q_events_daily, SQL_EVENTS_DAILY),
    "recursive_closure": (q_recursive_closure, SQL_RECURSIVE_CLOSURE),
}
