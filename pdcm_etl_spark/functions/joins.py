"""Join helpers — FK resolution pattern.

Parity with reference ``etl/jobs/util/dataframe_functions.py:7-63``
(``join_dfs`` / ``join_left_dfs`` / ``transform_to_fk``): resolve a
natural-key column to a dimension id.

Scale posture: dimension sides here are small — we broadcast explicitly so
the plan is a BroadcastHashJoin regardless of statistics availability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_dfs(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    right_side = F.broadcast(right) if broadcast_right else right
    return left.join(right_side, left[left_on] == right_side[right_on], how)


def join_left_dfs(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    broadcast_right: bool = True,
) -> DataFrame:
    """Left join keeping all left rows (ref dataframe_functions.py:24-40)."""
    return join_dfs(left, right, left_on, right_on, "left", broadcast_right)


def transform_to_fk(
    df: DataFrame,
    dim: DataFrame,
    df_natural_key: str,
    dim_natural_key: str,
    dim_id: str,
    fk_name: str,
) -> DataFrame:
    """Replace a natural-key column by the dimension's id column
    (ref dataframe_functions.py:43-63). Dimension is broadcast. The dim's
    columns are aliased first so a fact-side ``id`` never collides."""
    dim_small = F.broadcast(
        dim.select(
            F.col(dim_natural_key).alias("__dim_key"), F.col(dim_id).alias(fk_name)
        )
    )
    joined = df.join(dim_small, df[df_natural_key] == dim_small["__dim_key"], "left")
    return joined.drop("__dim_key").drop(df_natural_key)

def salted_join(
    fact: DataFrame,
    skewed_dim: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-mitigated equi join: salt the fact side, replicate the other.

    When a handful of join-key values dominate (one provider with 100×
    the rows), a plain shuffle join sends each hot key to ONE reducer.
    Salting splits every key into ``salt_buckets`` sub-keys: the fact
    side gets a deterministic per-row salt (xxhash64 of the whole row —
    no rand(), so retried tasks and reruns produce identical plans), the
    other side is exploded ×``salt_buckets`` so every (key, salt)
    combination still meets its match. Hot keys then spread over
    ``salt_buckets`` reducers.

    AQE's skew-join split handles moderate skew automatically; explicit
    salting is for the pathological case (a key too large for one
    executor even after AQE splitting) and for non-AQE deployments.

    Only fact-preserving join types are supported: the dim side is
    replicated ×``salt_buckets``, so right/full-outer would emit each
    unmatched dim row ``salt_buckets`` times — a silent duplication trap.
    """
    if how not in ("inner", "left", "left_semi", "semi", "left_anti", "anti"):
        raise ValueError(
            f"salted_join supports fact-preserving joins only "
            f"(inner/left/left_semi/left_anti), got {how!r}: the replicated "
            f"dim side would duplicate unmatched dim rows {salt_buckets}x"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets))
    salted_fact = fact.withColumn("__salt", salt.cast("int"))
    replicated = skewed_dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    return salted_fact.join(replicated, on + ["__salt"], how).drop("__salt")
