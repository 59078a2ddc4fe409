"""Replicates the driver's correctness gate: every queries() entry with an
oracle must match DuckDB exactly (row count + columns + values)."""

import pytest

import harness


def _names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


@pytest.mark.parametrize("name", _names())
def test_oracle_parity(spark, sf_dir, name):
    res = harness.run_all(spark, sf_dir, only=[name])[0]
    assert res["ok"], res["issues"]


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0
