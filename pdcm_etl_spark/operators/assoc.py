"""Association / co-occurrence analytics over basket-shaped data.

The reference's analytics layer stops at grouped aggregates; a
training-data platform also wants co-occurrence statistics (domain ×
source mixes, tag affinities, co-purchase graphs). The market-basket
pair miner here is the classic distributed formulation: one in-basket
self-join bounded by a basket-size guard, never an Apriori candidate
explosion.

Determinism: support counts are exact integers and lift is emitted in
integer parts-per-million (floor division), so results hash identically
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def itemset_pairs(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item_id",
    min_support: int = 2,
    max_basket: int = 64,
) -> DataFrame:
    """Frequent item PAIRS with support and integer-ppm lift — the
    2-itemset core of market-basket analysis (Agrawal & Srikant's
    Apriori restricted to k=2, which is the distributed-join-friendly
    regime; higher k grows combinatorially for marginal signal).

    Plan: distinct (basket, item) → basket-size guard (baskets larger
    than ``max_basket`` are dropped via anti-join, the same hot-key
    discipline as the dedup blockers: pair generation is bounded by
    ``max_basket``² per basket, never O(n²) in basket size) → one
    self-equi-join on the basket id with ``item_1 < item_2`` → one
    count aggregation. Per-item supports ride in on two broadcastable
    item-keyed joins; the total-basket scalar arrives via a broadcast
    join of the ONE-ROW count aggregate (never a data-sized collect or
    window).

    lift_ppm = floor(1e6 · n_pair · n_baskets / (n_1 · n_2)) — >1e6
    means positive association; exact in int64 for corpora up to ~1e12
    basket-pairs.

    Returns (item_1, item_2, n_pair, n_1, n_2, lift_ppm),
    n_pair >= min_support.
    """
    bi = baskets.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
    ).distinct()
    sizes = bi.groupBy("bk").agg(F.count(F.lit(1)).alias("n_items"))
    hot = sizes.filter(F.col("n_items") > max_basket).select("bk")
    guarded = bi.join(hot, "bk", "left_anti")
    item_n = guarded.groupBy(F.col("it")).agg(F.count(F.lit(1)).alias("n_it"))
    n_baskets = (
        guarded.select("bk")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        # one row — the unpartitioned window is over a single row, not data
        .withColumn("__one", F.lit(1))
    )
    pairs = (
        guarded.select("bk", F.col("it").alias("item_1"))
        .join(guarded.select("bk", F.col("it").alias("item_2")), "bk")
        .filter(F.col("item_1") < F.col("item_2"))
        .groupBy("item_1", "item_2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_support)
    )
    out = (
        pairs.join(
            item_n.select(F.col("it").alias("item_1"), F.col("n_it").alias("n_1")),
            "item_1",
        )
        .join(
            item_n.select(F.col("it").alias("item_2"), F.col("n_it").alias("n_2")),
            "item_2",
        )
        .withColumn("__one", F.lit(1))
        .join(F.broadcast(n_baskets), "__one")
        .drop("__one")
    )
    return out.select(
        "item_1",
        "item_2",
        "n_pair",
        "n_1",
        "n_2",
        F.expr("(1000000 * n_pair * n_baskets) div (n_1 * n_2)")
        .cast("bigint")
        .alias("lift_ppm"),
    )
