"""Compute-once sharing for multi-consumer intermediates INSIDE a query.

Catalyst does not common-subexpression-eliminate repeated SUBTREES, and
AQE's ReusedExchange only fires on byte-identical exchange subplans.
Measured on the dedup pair-generation core (r11 plan capture): the
documents scan + shingle explode executed SIX times per `jaccard_pairs`
call (hot-shingle guard, pair buckets, both size-side probes), and
`itemset_pairs` scanned lineitem 20 times — every consumer of a shared
DataFrame re-runs its whole upstream pipeline. At 100 TB those are full
corpus re-scans.

``shared(df)`` is the fix: a lazy ``localCheckpoint`` — materialized by
the first consumer, replayed from stored blocks (memory-and-disk,
spills gracefully) by the rest; the guide-§8 decide-once pattern and
the same idiom the flagship EntityDag uses for multiply-consumed
entities. ``SPARK_GRAFT_SHARE_INTERMEDIATES=none`` restores recompute
(for clusters where executor-loss recovery matters more than the
scans — localCheckpoint blocks die with their executor; plain persist
keeps lineage but was measured 2× slower on the flagship from
re-analysis cost).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def shared(df: DataFrame) -> DataFrame:
    mode = os.environ.get("SPARK_GRAFT_SHARE_INTERMEDIATES", "checkpoint")
    if mode == "none":
        return df
    if mode == "persist":
        # keeps full lineage: an executor loss recomputes the blocks
        # instead of failing the job (the cluster-safe mode; see module
        # docstring for the measured local cost of the re-analysis)
        from pyspark import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK)
    return df.localCheckpoint(eager=False)
