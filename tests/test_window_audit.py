"""Mechanized unpartitioned-window plan audit (round-8 verdict
What's-wrong #3 / round-9 ask 4).

A ``Window`` with no partition spec moves every row to ONE partition —
the single log4j ``WindowExec: No Partition Defined`` WARN in the r8
driver tail was a deliberate bounded-frame site, but nothing
mechanically separated that from an accidental global window (which at
100 TB is a one-task stage over the whole table). This sweeps every
registry query's OPTIMIZED logical plan
(pdcm_etl_spark/plans/audit.py::window_findings) and fails on any
unpartitioned window whose input subtree is not provably bounded (a
grouped aggregate / limit / one-row relation, composed through
row-preserving ops, joins and unions).

The allowlist carries the sites where boundedness is real but flows
through a node the conservative walker refuses to see through (e.g. an
explode of an aggregate's bounded collect_set). Every entry needs the
written argument.
"""

from __future__ import annotations

import pytest

# name -> written boundedness justification for windows the walker
# cannot prove bounded. Keep entries rare and argued.
ALLOWLIST: dict[str, str] = {
    "quantile_normalize": (
        "the flagged window is the bucket-offset running sum over "
        "bcounts (operators/ml.py::quantile_normalize) — input is the "
        "groupBy(__bk) aggregate, ≤ n_buckets (=64) rows by "
        "construction, but it rides a localCheckpoint(eager=True) "
        "whose LogicalRDD hides the aggregate from the walker; the "
        "checkpoint is deliberate (bcounts feeds both the offsets and "
        "the grand total without a second scan)"
    ),
}


def _names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


@pytest.mark.parametrize("name", _names())
def test_no_accidental_global_windows(spark, sf_dir, name):
    if name in ALLOWLIST:
        pytest.skip(f"allowlisted: {ALLOWLIST[name]}")
    import __spark_entry__ as e

    from pdcm_etl_spark.plans.audit import window_findings

    df = e.queries()[name](spark, sf_dir)
    findings = window_findings(df)
    assert findings == [], (
        f"{name}: unpartitioned window over a non-bounded input "
        f"(all rows to one partition at scale):\n  "
        + "\n  ".join(findings)
    )


def test_audit_flags_a_real_global_window(spark):
    """Self-test: the auditor must actually fire on the accidental
    pattern — a global row_number over a raw scan-like input."""
    from pyspark.sql import Window, functions as F

    from pdcm_etl_spark.plans.audit import window_findings

    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert window_findings(df), "auditor missed a global window"

    # and must NOT fire on the bounded-frame idiom: a window over a
    # grouped aggregate's output
    agg = spark.range(100).groupBy((F.col("id") % 3).alias("k")).count()
    ok = agg.withColumn(
        "rn", F.row_number().over(Window.orderBy("k"))
    )
    assert window_findings(ok) == []
