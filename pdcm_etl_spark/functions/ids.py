"""Deterministic id assignment.

The reference uses ``monotonically_increasing_id()`` (etl/jobs/util/
id_assigner.py:5-6), which is partition-dependent and *not stable across
runs* — it even forces a parquet write/read round-trip to paper over the
nondeterminism (molecular_characterization_links_builder.py:22-26).

We fix that at the root: ids are **dense ranks over the business key**
(stable, reproducible, oracle-checkable) or ``xxhash64`` of the key
(stable, shuffle-free, 100 TB-friendly — no global sort). Choose per call
site: dense ids when the sink needs compact BIGINTs, hash ids when the id
only needs to be a stable join key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_id(*key_cols: str | Column) -> Column:
    """Dense 1-based rank over the ordered business key.

    Scale note: a single un-partitioned window is a global sort. For the
    dim-table use-sites in this engine (≤ millions of rows) that is fine;
    for fact-scale tables use ``hash_id`` instead.
    """
    w = Window.orderBy(*[F.col(c) if isinstance(c, str) else c for c in key_cols])
    return F.dense_rank().over(w)


def add_id(df: DataFrame, id_name: str = "id", key_cols: list[str] | None = None) -> DataFrame:
    """Attach a deterministic id column.

    ``key_cols=None`` orders by all columns (matches the reference's
    semantics of 'give every row an id' but reproducibly).
    """
    keys = key_cols or df.columns
    return df.withColumn(id_name, dense_id(*keys).cast("bigint"))


def hash_id(*key_cols: str | Column) -> Column:
    """Stable 64-bit id from the business key — no shuffle, no window.

    This is the 100 TB path: ids derived purely from data, computed
    map-side. Collision probability over N rows ~ N^2 / 2^65.
    """
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in key_cols])
