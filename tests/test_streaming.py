"""Structured Streaming twins vs their batch oracles.

The streaming path has no SQL-expressible oracle, so its correctness
gate is equivalence with the batch implementation over the same lake
(drained with Trigger.AvailableNow → deterministic single emission)."""

from pyspark.sql import functions as F


def test_stream_daily_counts_match_batch(spark, sf_dir):
    from pdcm_etl_spark.plans.catalog import q_events_daily
    from pdcm_etl_spark.streaming.events_stream import run_availablenow

    batch = {
        (r["day"], r["event_type"]): (r["n_events"], r["sum_value_micro"])
        for r in q_events_daily(spark, sf_dir).collect()
    }
    stream = {
        (r["day"], r["event_type"]): (r["n_events"], r["sum_value_micro"])
        for r in run_availablenow(spark, sf_dir, "t_stream_daily").collect()
    }
    assert stream == batch


def test_stream_sessionize_closed_sessions_match_batch(spark, sf_dir):
    from pdcm_etl_spark.plans.catalog import load_events
    from pdcm_etl_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_stream,
    )

    ev = load_events(spark, sf_dir)
    batch = sessionize_batch(ev).collect()
    stream = sessionize_stream(spark, sf_dir).collect()

    # the stream keeps each user's trailing session open in state
    # (NoTimeout + AvailableNow), so it emits every batch session except
    # the last one per user
    def key(r):
        return (r["user_id"], r["session_start"])

    batch_by_user = {}
    for r in batch:
        batch_by_user.setdefault(r["user_id"], []).append(r)
    expected = {}
    for user, rows in batch_by_user.items():
        rows.sort(key=lambda r: r["session_start"])
        for r in rows[:-1]:
            expected[key(r)] = (r["n_events"], r["sum_value_micro"])
    got = {key(r): (r["n_events"], r["sum_value_micro"]) for r in stream}
    assert got.keys() == expected.keys()
    for k, (n, total) in expected.items():
        gn, gtotal = got[k]
        # stream floors each event to integer micros; batch rounds the
        # exact decimal sum — they differ by at most 1 micro per event
        assert gn == n and abs(gtotal - total) <= n, (k, got[k], (n, total))
    assert len(got) > 0


def test_stream_parquet_sink_exactly_once(spark, sf_dir, tmp_path):
    """File sink + checkpoint: one AvailableNow drain lands every closed
    window once; a second drain from the same checkpoint is a no-op (the
    exactly-once guarantee a restart relies on)."""
    from pdcm_etl_spark.plans.catalog import q_events_daily
    from pdcm_etl_spark.streaming.events_stream import run_to_parquet

    out_dir, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    first = run_to_parquet(spark, sf_dir, out_dir, ckpt)
    n_first = first.count()
    assert n_first > 0
    # append mode emits only watermark-closed windows; the final in-flight
    # window may stay open, so the file sink holds a prefix of the batch
    batch = q_events_daily(spark, sf_dir)
    assert n_first <= batch.count()
    batch_vals = {
        (r["day"], r["event_type"]): (r["n_events"], r["sum_value_micro"])
        for r in batch.collect()
    }
    for r in first.collect():
        assert batch_vals[(r["day"], r["event_type"])] == (
            r["n_events"], r["sum_value_micro"]
        ), r
    # idempotent restart: same checkpoint → no duplicate emission
    second = run_to_parquet(spark, sf_dir, out_dir, ckpt)
    assert second.count() == n_first


def test_stream_dq_monitor_counters_match_batch(spark, sf_dir):
    """The streaming DQ counters must equal the batch conditional-agg
    over the same lake (the incremental state is pure counters, so the
    AvailableNow drain is exactly the batch answer)."""
    from pyspark.sql import functions as F

    from pdcm_etl_spark.plans.catalog import load_events
    from pdcm_etl_spark.streaming.events_stream import dq_monitor_stream

    got = {
        r["win_start"]: (r["n_events"], r["v_type"], r["v_value"])
        for r in dq_monitor_stream(spark, sf_dir).collect()
    }
    want = {
        r["d"]: (r["n"], r["vt"], r["vv"])
        for r in load_events(spark, sf_dir)
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    ~F.col("event_type").isin(
                        "click", "view", "signup", "purchase", "error"
                    ),
                    1,
                ).otherwise(0)
            ).alias("vt"),
            F.sum(
                F.when(
                    F.col("value").isNull()
                    | (F.col("value") <= 0)
                    | (F.col("value") > 400),
                    1,
                ).otherwise(0)
            ).alias("vv"),
        )
        .collect()
    }
    assert got == want and got


def test_stream_static_join_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from pdcm_etl_spark.plans.catalog import load_events
    from pdcm_etl_spark.streaming.events_stream import (
        enriched_segment_stream,
    )

    got = {
        (r["win_start"], r["segment"]): (r["n_events"], r["sum_value_micro"])
        for r in enriched_segment_stream(spark, sf_dir).collect()
    }
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        (F.col("c_custkey") - 1).alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    want = {
        (r["d"], r["segment"]): (r["n"], r["v"])
        for r in load_events(spark, sf_dir)
        .join(dim, "user_id")
        .groupBy(F.date_trunc("day", "ts").alias("d"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("value").cast("decimal(18,6)")) * 1000000)
            .cast("bigint")
            .alias("v"),
        )
        .collect()
    }
    assert got == want and got
