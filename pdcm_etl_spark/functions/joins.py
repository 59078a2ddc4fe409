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
