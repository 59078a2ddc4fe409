"""Mechanized int-overflow plan audit (round-6 verdict #1b).

Walks every registry query's ANALYZED Catalyst plan
(pdcm_etl_spark/plans/audit.py) and fails on the r5/r6 ANSI-abort
expression classes:

  * any ``Multiply`` whose result type is int32 (``size()`` /
    ``row_number()`` / ``posexplode`` pos × a scale literal aborts at
    ~2.1e9 under ANSI, silently wraps pre-ANSI);
  * any bigint ``Sum`` whose def-use-resolved child contains a
    ``Multiply`` (products grow value×value — a 64-bit accumulator is
    the first casualty at 100 TB; the fix is a DECIMAL(38,0)
    accumulator cast INSIDE the sum).

This is the mechanization of the audit that caught grouped_moments'
raw-centered-sum overflow in round 6 — and on its first full-registry
sweep it flagged 13 queries, at least two of which were real sf1
hazards (spearman's Σ(rx−ry)² dies at ~2.4e6 rows per group;
target_encode's micro-target sums at ~1.7e7-row categories). All were
fixed rather than allowlisted: the allowlist below is EMPTY and should
stay that way.
"""

from __future__ import annotations

import pytest

# name -> justification. Empty by design; a new entry needs a written
# boundedness argument (config-constant operands, etc.).
ALLOWLIST: dict[str, str] = {}


def _names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


@pytest.mark.parametrize("name", _names())
def test_no_overflow_prone_expressions(spark, sf_dir, name):
    if name in ALLOWLIST:
        pytest.skip(f"allowlisted: {ALLOWLIST[name]}")
    import __spark_entry__ as e

    from pdcm_etl_spark.plans.audit import overflow_findings

    df = e.queries()[name](spark, sf_dir)
    findings = overflow_findings(df)
    assert findings == [], (
        f"{name}: overflow-prone expressions in analyzed plan "
        f"(int32 product or bigint sum-of-product):\n  "
        + "\n  ".join(findings)
    )
