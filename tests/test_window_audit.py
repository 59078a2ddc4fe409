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
written argument. Round 10: EMPTY — the one entry (quantile_normalize's
checkpointed 64-row bucket frame) is now handled mechanically by
``plans.audit.bounded_checkpoint``, which proves the PRE-checkpoint
plan bounded and registers the LogicalRDD id so the walker sees through
the checkpoint; test_bounded_checkpoint_marker below pins both sides of
that mechanism (a proven frame passes, an unproven one still flags).
"""

from __future__ import annotations

import pytest

# name -> written boundedness justification for windows the walker
# cannot prove bounded. Keep entries rare and argued. (Empty since r10.)
ALLOWLIST: dict[str, str] = {}


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


def test_bounded_checkpoint_marker(spark):
    """Both sides of the checkpoint see-through: a checkpointed
    aggregate (provably bounded pre-checkpoint) passes the audit; the
    same window over a checkpointed raw scan still gets flagged."""
    from pyspark.sql import Window, functions as F

    from pdcm_etl_spark.plans.audit import (
        bounded_checkpoint,
        window_findings,
    )

    df = spark.range(100).select(
        (F.col("id") % 4).alias("k"), F.col("id").alias("v")
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)

    agg = df.groupBy("k").agg(F.sum("v").alias("s"))
    proven = bounded_checkpoint(agg).withColumn(
        "run", F.sum("s").over(w)
    )
    assert window_findings(proven) == []

    raw = bounded_checkpoint(df).withColumn("run", F.sum("v").over(w))
    flagged = window_findings(raw)
    assert len(flagged) == 1 and "unpartitioned-window" in flagged[0]


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
