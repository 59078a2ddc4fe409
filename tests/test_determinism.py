"""Mechanized Spark-vs-Spark determinism screen (round-6 verdict #1a).

Runs every tie/rank/window/sample-sensitive registry query TWICE in the
same session (fresh plan each time) and asserts the canonical value
hashes agree. This is the exact check that caught two real bugs the
one-sample oracle gate had passed by luck: spearman_corr's
row_number() tie-break over duplicate lineitem composite ids, and
grouped_moments' int64 raw-centered-sum overflow — both visible only
on a second run / at sf0.1 volume.

Selection is NAME-DRIVEN (regex over the registry) so newly added
tie-prone operators enter the screen automatically, plus an explicit
extras list for the current round's additions regardless of name.
Default scale is sf0.1 (more rows → more ties → more exposure than the
sf0.001 entity fixtures); override with SPARK_GRAFT_DET_SF_DIR. The
full-registry screen remains scripts_dev/determinism_check.py.
"""

from __future__ import annotations

import os
import re

import pytest

TIE_SENSITIVE = re.compile(
    r"topk|rank|quantile|window|sorted|sample|shuffle|ntile|heavy|gini"
    r"|moments|spearman|percentile|agg_ordered|path|latest|keeper"
    r"|neighborhood"
)

# Operators added in the current round — screened by name even when the
# tie-sensitive regex does not match. Rotate each round.
CURRENT_ROUND_EXTRAS: list[str] = [
    # round-11 additions — each double-run hash-screened at sf0.1 the
    # round it ships (prior rounds' extras rotate out once their round's
    # full-registry screen is committed; they stay covered by the
    # regex-selected families below)
    "dedup_substring_scrub",
    "dedup_recall_banded",
    "dedup_substring_incremental",
]

DET_SF_DIR = os.environ.get("SPARK_GRAFT_DET_SF_DIR", "/root/testdata/sf0.1")


def _selection() -> list[str]:
    import __spark_entry__ as e

    names = sorted(e.queries())
    sel = [n for n in names if TIE_SENSITIVE.search(n)]
    sel += [n for n in CURRENT_ROUND_EXTRAS if n in names and n not in sel]
    return sel


@pytest.mark.parametrize("name", _selection())
def test_two_run_hash_stable(spark, name):
    if not os.path.isdir(DET_SF_DIR):
        pytest.skip(f"{DET_SF_DIR} not present")
    import __spark_entry__ as e
    from scripts_dev.gate_sim import canon_df

    q = e.queries()[name]
    h1, _, _ = canon_df(q(spark, DET_SF_DIR).toPandas())
    h2, _, _ = canon_df(q(spark, DET_SF_DIR).toPandas())
    assert h1 == h2, (
        f"{name}: two in-session runs hashed differently — result is "
        f"order/tie/partition-dependent ({h1} vs {h2})"
    )
