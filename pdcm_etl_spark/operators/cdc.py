"""Change-data-capture / slowly-changing-dimension operators.

The reference pipeline rebuilds every entity from scratch each release
(full Luigi re-run); an incremental deployment instead merges a batch of
changed rows into the standing dimension. ``scd2_merge`` is that merge as
one declarative plan — the Type-2 history pattern (close the old row,
insert the new one, keep full validity intervals) without requiring a
transactional table format: the output is the next version of the
dimension, writable as a plain parquet snapshot.

Scale: one full-outer shuffle join on the business key + map-side unions.
No driver loops, no per-row comparisons outside codegen'd expressions —
at 100 TB the cost is the same one shuffle an aggregation over the
dimension would pay.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
    strict: bool = True,
) -> DataFrame:
    """Merge an update batch into a Type-2 dimension.

    ``dim`` rows carry ``keys + tracked + valid_from + valid_to +
    is_current`` (open rows: valid_to IS NULL, is_current true).
    ``updates`` rows carry ``keys + tracked + ts_col``. Within the batch
    only the latest update per key applies (earlier ones are superseded
    before they ever become visible — standard batch-CDC compaction).

    For each key: no open row → insert; open row and every tracked value
    null-safe-equal → keep; otherwise close the open row at the update's
    timestamp and insert the new open row. Closed history rows pass
    through untouched.

    Precondition: update timestamps are monotonic per key w.r.t. the
    standing dimension — each applied update's ``ts_col`` must be ≥ the
    open row's ``valid_from`` (true whenever batches are merged in event
    order, the normal CDC contract). An out-of-order update would close
    the open row with ``valid_to < valid_from``; ``strict=True`` (default)
    detects that inverted interval and raises instead of emitting it.
    """
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), *[F.col(c).desc() for c in tracked]
    )
    upd = (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(k).alias(f"__u_{k}") for k in keys],
            *[F.col(c).alias(f"__u_{c}") for c in tracked],
            F.col(ts_col).alias("__u_ts"),
            # presence marker: side-presence must not be inferred from
            # key-column nullness — a legitimately-NULL business key
            # would then be silently dropped by every branch filter
            F.lit(True).alias("__u_present"),
        )
    )

    open_rows = dim.filter(F.col(current_col))
    closed_rows = dim.filter(~F.col(current_col))
    cond = reduce(
        lambda a, b: a & b, [open_rows[k] == upd[f"__u_{k}"] for k in keys]
    )
    from pdcm_etl_spark.operators.sharing import shared

    # the full-outer join feeds THREE branch filters (keep_open,
    # close_old, insert_new) — without sharing, each re-runs the whole
    # join including both input scans and the update-compaction window
    # (6 source scans in the r11 sweep). Materialize once, filter the
    # stored blocks three ways.
    j = shared(open_rows.join(upd, cond, "full_outer"))

    # is_current is literally true on every open row, so its nullness
    # marks side presence even when a key column is NULL
    has_open = F.col(current_col).isNotNull()
    has_upd = F.col("__u_present").isNotNull()
    same = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"__u_{c}")) for c in tracked],
    )

    out_cols = keys + tracked + [valid_from, valid_to, current_col]

    # open rows that survive unchanged (no update, or update equal)
    keep_open = j.filter(has_open & (~has_upd | same)).select(*out_cols)
    # open rows closed by a differing update; under strict, an update
    # older than the open row's valid_from (inverted validity interval)
    # raises at execution instead of silently emitting valid_to<valid_from
    close_ts = F.col("__u_ts")
    if strict:
        close_ts = F.when(
            F.col("__u_ts") < F.col(valid_from),
            F.raise_error(
                F.concat(
                    F.lit("scd2_merge: out-of-order update (ts "),
                    F.col("__u_ts").cast("string"),
                    F.lit(" < open valid_from "),
                    F.col(valid_from).cast("string"),
                    F.lit(") — batches must be merged in event order"),
                )
            ).cast(dim.schema[valid_from].dataType),
        ).otherwise(F.col("__u_ts"))
    close_old = (
        j.filter(has_open & has_upd & ~same)
        .select(
            *keys,
            *tracked,
            F.col(valid_from),
            close_ts.alias(valid_to),
            F.lit(False).alias(current_col),
        )
    )
    # the new open version (changed key or brand-new key)
    insert_new = (
        j.filter(has_upd & (~has_open | ~same))
        .select(
            *[F.col(f"__u_{k}").alias(k) for k in keys],
            *[F.col(f"__u_{c}").alias(c) for c in tracked],
            F.col("__u_ts").alias(valid_from),
            F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
            F.lit(True).alias(current_col),
        )
    )
    return (
        closed_rows.select(*out_cols)
        .unionByName(keep_open)
        .unionByName(close_old)
        .unionByName(insert_new)
    )


def merge_aggregates(
    snapshot: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    min_cols: list[str] = (),
    max_cols: list[str] = (),
) -> DataFrame:
    """Incremental view maintenance for distributive aggregates: combine
    an aggregated SNAPSHOT with an aggregated DELTA into the aggregate
    of the union — without touching the base data again. This is the
    core of every incremental rollup / materialized-view refresh: at
    100 TB you re-aggregate the day's delta (GBs) and merge, instead of
    re-scanning the lake.

    Correct for distributive/algebraic aggregates only (sum, count as a
    sum, min, max — exactly the mergeable kind); holistic ones (count
    distinct, exact quantiles) are not mergeable and must use sketches.
    Both inputs must share the (keys + measure columns) schema; counts
    ride as sum columns.

    Plan: unionByName + one keyed hash aggregation — map-side combined,
    one shuffle on the group keys.
    """
    merged = snapshot.unionByName(delta)
    dtypes = dict(merged.dtypes)

    def _sum(c):
        # integral measures ride a DECIMAL(38,0) accumulator: the inputs
        # are themselves aggregates (micro-unit sums), so a bigint
        # re-sum is the first thing to abort when partials merge at
        # scale; output dtype stays bigint
        if dtypes.get(c) in ("bigint", "int", "smallint", "tinyint"):
            return F.sum(F.col(c).cast("decimal(38,0)")).cast("bigint").alias(c)
        return F.sum(c).alias(c)

    aggs = (
        [_sum(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return merged.groupBy(*keys).agg(*aggs)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Release-regression diff of two entity snapshots: which keys were
    added, removed, or changed between the old and new parquet output
    (the check an ETL team runs between releases before publishing —
    the reference rebuilds every entity per release, so "what did this
    code change do to the output" is exactly this operator).

    Scale shape: each side is reduced MAP-SIDE to (keys, 16-byte row
    digest) before anything shuffles — the full-outer join on the key
    carries digests, never wide rows, so the exchange cost is
    key+digest width regardless of entity width (a 400-column entity
    diffs as cheaply as a 3-column one). One shuffle per side, no
    driver participation, output is only the delta (at 100 TB almost
    every row is unchanged — emitting them would BE the snapshot).

    The digest is the portable md5 of the NULL-encoded compare columns
    (each coalesced to chr(0) before concat — the portable_hash_id
    rule, so NULL vs empty-string rows don't collide) — exact DuckDB
    twin. Returns (keys..., status in added|removed|changed, old_hash,
    new_hash).
    """

    def digested(df: DataFrame, alias: str) -> DataFrame:
        cols = compare_cols or [c for c in df.columns if c not in keys]
        h = F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in cols
                ],
            )
        )
        return df.select(*keys, h.alias(alias))

    o = digested(old, "old_hash")
    n = digested(new, "new_hash")
    joined = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*keys, "status", "old_hash", "new_hash")
    )


def snapshot_field_churn(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    fields: list[str],
) -> DataFrame:
    """Column-level churn between two snapshots: among keys present in
    BOTH, how many rows changed EACH field — the per-column refinement
    of snapshot_diff's row-level added/removed/changed verdict (a CDC
    feed where 90% of "changes" are one volatile column wants that
    column split out of the SCD2 tracked set; this is the audit that
    finds it).

    NULL-safe comparison (``<=>``): NULL→value and value→NULL both
    count as changes, NULL→NULL does not — the SQL-equality trap that
    undercounts churn on nullable columns.

    Precondition — ``key_col`` must be unique within each snapshot: a
    duplicated key multiplies through the inner join and silently
    inflates ``n_persisting``/``n_changed``. Enforced, not trusted:
    the one-row aggregate also counts DISTINCT keys, and a
    ``raise_error`` branch aborts the job if joined-row count exceeds
    distinct-key count (the same raise-on-violation stance as
    ``top_percentile_filter``; rides the existing single-row frame, no
    extra action).

    Scale shape: ONE key-equi inner join of the two snapshots (both
    sides data-sized — shuffle join, AQE-managed), then a single
    unkeyed conditional aggregate producing one bounded row; the long
    (col_name, n_changed) form comes from stack() over that 1-row
    frame. Output is len(fields) rows.

    Returns (col_name, n_persisting, n_changed, churn_ppm).
    """
    o = old.select(
        F.col(key_col).alias("__k"),
        *[F.col(f).alias(f"__o_{f}") for f in fields],
    )
    n = new.select(
        F.col(key_col).alias("__k"),
        *[F.col(f).alias(f"__n_{f}") for f in fields],
    )
    # both snapshots are data-sized: pin shuffle-hash so Catalyst's
    # size estimate can't broadcast one at test scale (the _size_sides
    # hazard — an abortive build side at 100 TB)
    joined = o.join(n.hint("shuffle_hash"), "__k")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n_rows")]
    for f in fields:
        aggs.append(
            # coalesce: SUM over the empty join (no persisting keys)
            # is NULL — the row must read (0, 0, 0), not NULLs
            F.coalesce(
                F.sum(
                    F.when(
                        ~F.col(f"__o_{f}").eqNullSafe(F.col(f"__n_{f}")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"__chg_{f}")
        )
    aggs.append(
        F.count_distinct(F.col("__k")).cast("bigint").alias("__n_keys")
    )
    one = joined.agg(*aggs).withColumn(
        "__guard",
        F.when(
            F.col("__n_rows") != F.col("__n_keys"),
            F.raise_error(
                F.format_string(
                    "snapshot_field_churn: key column is not unique —"
                    " %d joined rows over %d distinct keys; dedupe the"
                    " snapshots on the key first",
                    F.col("__n_rows"),
                    F.col("__n_keys"),
                )
            ).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    stack_args = ", ".join(f"'{f}', __chg_{f}" for f in fields)
    return one.select(
        F.expr(
            f"stack({len(fields)}, {stack_args}) as (col_name, n_changed)"
        ),
        (F.col("__n_rows") + F.col("__guard")).alias("n_persisting"),
    ).select(
        "col_name",
        "n_persisting",
        "n_changed",
        F.expr(
            "CAST(CASE WHEN n_persisting = 0 THEN 0 ELSE"
            " n_changed * 1000000 DIV n_persisting END AS BIGINT)"
        ).alias("churn_ppm"),
    )
