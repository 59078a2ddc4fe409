"""values_table — the JVM-side VALUES replacement for
createDataFrame(<python list>). Semantics must match createDataFrame for
scalar literals, and the plan must be a LocalRelation (LocalTableScan):
no job, no PythonRunner stage, no per-core Python worker fork."""

import math

import pytest

from pdcm_etl_spark.functions.local_table import values_table


def test_matches_create_dataframe_scalars(spark):
    rows = [
        (1, "plain", 1.5, True),
        (2, "qu'ote and back\\slash", -0.0, False),
        (3, None, None, None),
    ]
    ddl = "id long, s string, f double, b boolean"
    got = values_table(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    # Names and types match exactly; nullability may be TIGHTER than
    # createDataFrame (VALUES lets Catalyst prove not-null columns).
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in want.schema.fields
    ]
    for g, w in zip(got.schema.fields, want.schema.fields):
        assert (not g.nullable) or w.nullable
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_float_round_trip_is_exact(spark):
    vals = [0.1, 1 / 3, 2**-52, 1e300, -1e-300, math.pi]
    got = values_table(spark, [(v,) for v in vals], "f double").collect()
    assert sorted(r.f for r in got) == sorted(vals)


def test_nan_and_inf(spark):
    got = values_table(
        spark,
        [(float("nan"),), (float("inf"),), (float("-inf"),)],
        "f double",
    ).collect()
    fs = [r.f for r in got]
    assert any(math.isnan(f) for f in fs)
    assert float("inf") in fs and float("-inf") in fs


def test_empty_rows_keep_schema(spark):
    df = values_table(spark, [], "a int, b array<string>")
    assert df.count() == 0
    assert df.schema.simpleString() == "struct<a:int,b:array<string>>"


def test_bare_column_names_infer_like_create_dataframe(spark):
    got = values_table(spark, [("x", 7, 1.5)], ["s", "i", "f"])
    assert got.schema.simpleString() == "struct<s:string,i:bigint,f:double>"


def test_array_literals(spark):
    got = values_table(
        spark, [("k", ["a", "b"])], "k string, arr array<string>"
    ).collect()
    assert got[0].arr == ["a", "b"]


def test_plan_is_local_relation_no_python(spark):
    df = values_table(spark, [(1, "a")], "id long, s string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan or "LocalRelation" in plan, plan
    assert "Python" not in plan, plan


def test_arity_mismatch_raises(spark):
    with pytest.raises(ValueError):
        values_table(spark, [(1, 2)], "a int")


def test_unsupported_type_raises(spark):
    with pytest.raises(TypeError):
        values_table(spark, [(object(),)], "a string")


def test_parenthesized_types_split_at_top_level_only(spark):
    # r5 advice: _split_ddl tracked only <> nesting, so decimal(18,2)'s
    # inner comma split mid-type and produced garbage columns
    from pdcm_etl_spark.functions.local_table import _split_ddl

    assert _split_ddl("v decimal(18,2), name string") == [
        ("v", "decimal(18,2)"),
        ("name", "string"),
    ]
    assert _split_ddl("a map<string, decimal(10,3)>, b char(5)") == [
        ("a", "map<string, decimal(10,3)>"),
        ("b", "char(5)"),
    ]


def test_parenthesized_types_end_to_end(spark):
    import decimal

    rows = [(decimal.Decimal("1.50"), "x"), (decimal.Decimal("-2.25"), "y")]
    ddl = "v decimal(18,2), name string"
    got = values_table(
        spark, [(float(r[0]), r[1]) for r in rows], "v double, name string"
    ).selectExpr("CAST(v AS DECIMAL(18,2)) AS v", "name")
    want = spark.createDataFrame(rows, ddl)
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in want.schema.fields
    ]
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
