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
