"""Physical-plan regression tests — the scale contract.

Correctness tests prove the small-SF answer; these prove the *plan* is the
one that survives 100 TB: filters reach the parquet scan, dim joins
broadcast, aggregates are map-side partial, and no row-at-a-time Python
sits in a hot path."""

import contextlib
import io

import pytest


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


def test_filter_pushdown_reaches_scan(spark, sf_dir, queries):
    plan = _plan(queries["filter_project"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    # at least one real predicate pushed (not an empty list)
    assert "PushedFilters: []" not in plan


def test_column_pruning_reaches_scan(spark, sf_dir, queries):
    plan = _plan(queries["filter_project"](spark, sf_dir))
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    # projection of a few columns must not read the full 16-col lineitem
    assert scan.count(",") < 8


def test_fk_join_broadcasts_dim(spark, sf_dir, queries):
    plan = _plan(queries["join_left_fk"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_agg_is_partial_then_final(spark, sf_dir, queries):
    plan = _plan(queries["pricing_summary"](spark, sf_dir))
    # two HashAggregates (partial + final) around one exchange
    assert plan.count("HashAggregate") >= 2
    # map-side combine visible as partial_* functions before the exchange
    assert "partial_sum" in _plan(queries["pricing_summary"](spark, sf_dir), mode="simple")


def test_no_python_udf_in_scalar_paths(spark, sf_dir, queries):
    for name in ("text_quality", "text_langid", "text_tokens",
                 "string_clean", "case_buckets", "dedup_exact"):
        plan = _plan(queries[name](spark, sf_dir), mode="simple")
        assert "BatchEvalPython" not in plan, name
        assert "PythonUDF" not in plan, name


def test_theta_join_is_equi_rewrite(spark, sf_dir, queries):
    # the reference's `expr(a || ' ' || b == entry)` theta join would plan
    # as BroadcastNestedLoopJoin; our precomputed-key rewrite must not
    plan = _plan(queries["join_theta_rewrite"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_is_single_shuffle(spark, sf_dir, queries):
    plan = _plan(queries["asof_join"](spark, sf_dir))
    # union + ordered window: the only exchange is the hash partition on
    # the equality keys — no nested loop, no range explosion
    assert "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_range_join_plans_as_hash_join(spark, sf_dir, queries):
    plan = _plan(queries["range_join"](spark, sf_dir))
    assert "BroadcastNestedLoop" not in plan, plan


def test_sample_is_scan_side_filter(spark, sf_dir, queries):
    plan = _plan(queries["sample_stratified"](spark, sf_dir))
    # membership is a pure row predicate: no shuffle at all
    assert "Exchange" not in plan, plan


def test_annotation_resources_single_join_any_resource_count(spark):
    """cancer_annotation_resources joins the broadcast resource lookup
    ONCE regardless of how many resources are registered — the rewrite of
    the reference's per-resource groupBy loop (resources_per_model_util
    .py:94-112, O(#resources) passes). Join-operator count in the
    optimized plan must not grow with the resource count."""
    from pdcm_etl_spark.transforms.links import cancer_annotation_resources_per_model

    md = spark.createDataFrame(
        [(1, "GENE1"), (1, "GENE2"), (2, "GENE3")],
        "molecular_characterization_id bigint, symbol string",
    )
    mm = spark.createDataFrame(
        [(1, 10, "mutation"), (2, 20, "mutation")],
        "mol_char_id bigint, model_id bigint, molchar_type string",
    )

    def resources(n):
        rows = [(f"GENE{g}", f"R{i}", "Gene", "") for i in range(n) for g in (1, 2, 3)]
        return spark.createDataFrame(rows, "entry string, resource string, type string, link string")

    def n_joins(res_df):
        out = cancer_annotation_resources_per_model([md], mm, res_df)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        return plan.count("Join ")

    assert n_joins(resources(2)) == n_joins(resources(10))


def test_quality_percentile_has_no_unpartitioned_window(spark, sf_dir, queries):
    """The top-decile filter must not plan a single-partition global
    window sort (the round-1 scale-killer): no 'Window' operator with an
    empty partition spec; the rank window partitions by the metric."""
    df = queries["quality_percentile"](spark, sf_dir)
    plan = _plan(df)
    import re

    for m in re.finditer(r"partitionBy=\[(.*?)\]", plan):
        assert m.group(1).strip() != "", "unpartitioned window in plan"


def test_text_chunk_has_no_shuffle(spark, sf_dir, queries):
    """Chunking is per-row: the plan must be Scan → Project/Generate with
    no Exchange (the _docs repartition is gated off when splits ≥ cores,
    so build the operator directly on the raw table)."""
    from pdcm_etl_spark.operators.text import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    plan = _plan(chunk_documents(docs))
    assert "Exchange" not in plan, plan


def test_jaccard_pairs_bucketed_no_freq_join(spark):
    """Round-3 jaccard_pairs plan (round-2 verdict item 5): candidate
    pairs come from in-bucket generation after ONE groupBy on the
    shingle — there must be NO join before the pair aggregation (the old
    plan joined a shingle-frequency table and self-joined the shingle
    table, recomputing the explode 4x), and no data-sized broadcast. The
    only joins left are the two doc-level size attachments."""
    from pyspark.sql import functions as F

    from pdcm_etl_spark.operators.dedup import jaccard_pairs, shingles

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("a b c d e f g h word"), F.col("id") % 7).alias("text"),
    )
    plan = _plan(
        jaccard_pairs(shingles(docs), min_bp=1000, max_shingle_freq=50),
        mode="simple",
    )
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                   "BroadcastNestedLoopJoin", "CartesianProduct"))
    assert n_joins == 2, plan


def test_merged_aggregates_single_shuffle(spark):
    """merge_keyed_aggregates = union (no barrier) + ONE hash aggregate;
    N inputs must not produce N exchanges."""
    from pyspark.sql import functions as F

    from pdcm_etl_spark.functions.joins import merge_keyed_aggregates

    base = spark.range(100).select(F.col("id").alias("k"))
    aggs = [
        base.groupBy("k").agg(F.count(F.lit(1)).alias(f"c{i}")) for i in range(5)
    ]
    merged = merge_keyed_aggregates(aggs, "k")
    plan = _plan(merged)
    # exchanges: one per input groupBy + exactly one for the merged agg
    assert plan.count("Exchange") <= 6, plan


def test_scd2_merge_join_decomposition(spark, sf_dir, queries):
    """The declared single full-outer merge join gets decomposed by
    Catalyst into one specialized join per output branch (the keep /
    close / insert filters eliminate the outer-ness) — assert that
    decomposition: only equi joins, one per branch, no nested loop."""
    plan = _plan(queries["scd2_merge"](spark, sf_dir), mode="simple")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert n_joins == 3, plan


def test_salted_join_spreads_hot_keys(spark, sf_dir, queries):
    """The salted join must keep the salt column in the join key (the
    whole point: hot keys spread over salt_buckets reducers)."""
    plan = _plan(queries["join_salted_skew"](spark, sf_dir))
    assert "__salt" in plan, plan


def test_semantic_dedup_joins_within_cluster_only(spark, sf_dir, queries):
    """No cartesian: the pair scan must be an equi join on the cluster id."""
    plan = _plan(queries["dedup_semantic"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
