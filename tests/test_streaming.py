"""Structured Streaming tests (§2.11): batch parity of the streamed
plans and session-window gap semantics."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from geo_big_data_analysis_spark.streaming.windows import (
    hourly_event_counts_stream,
    run_to_memory,
    session_window_stream,
    stream_events,
)


def test_stream_matches_batch_hourly(spark, sf_dir):
    ev = stream_events(spark, sf_dir)
    got = {
        r["hour_start"]: r["n"]
        for r in run_to_memory(hourly_event_counts_stream(ev)).collect()
    }
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(batch.dtypes)["ts"] == "bigint":
        batch = batch.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    want = {
        r["h"]: r["n"]
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("h")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def _ts(h, m, s=0):
    return datetime(2026, 1, 5, h, m, s)


def test_session_window_gap_semantics(spark):
    # one user: events at 10:00, 10:10, 10:50 (40-min gap splits at 30m),
    # second user: single event
    rows = [
        (1, _ts(10, 0)), (1, _ts(10, 10)), (1, _ts(10, 50)),
        (2, _ts(12, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    # session_window works identically on batch DataFrames — use that to
    # pin semantics without a streaming source
    out = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [1, 2]  # {10:00,10:10} and {10:50}
    assert per_user[2] == [1]


def test_streamed_sessions_match_batch_session_window(spark, sf_dir):
    ev = stream_events(spark, sf_dir)
    streamed = run_to_memory(session_window_stream(ev, gap_minutes=30.0, keys=["user_id"]))
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(batch.dtypes)["ts"] == "bigint":
        batch = batch.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    want = (
        batch.groupBy("user_id", F.session_window("ts", "1800 seconds").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )
    got = streamed.select("user_id", "session_start", "n_events")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_dedup_bounded_state(spark, sf_dir):
    from geo_big_data_analysis_spark.streaming.windows import dedup_stream

    ev = stream_events(spark, sf_dir)
    out = run_to_memory(dedup_stream(ev, ["user_id", "event_type"]), output_mode="append")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = batch.select("user_id", "event_type").distinct().count()
    assert out.count() == want
    # each key appears exactly once
    assert out.groupBy("user_id", "event_type").count().filter(F.col("count") > 1).count() == 0


def test_stateful_user_stats_match_batch(spark, sf_dir):
    from geo_big_data_analysis_spark.streaming.windows import user_running_stats_stream

    ev = stream_events(spark, sf_dir)
    out = run_to_memory(user_running_stats_stream(ev), output_mode="update")
    w = __import__("pyspark").sql.Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = out.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(batch.dtypes)["ts"] == "bigint":
        batch = batch.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    want = batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
    )
    got = {r["user_id"]: (r["n_events"], r["n_types"]) for r in final.collect()}
    exp = {r["user_id"]: (r["n_events"], r["n_types"]) for r in want.collect()}
    assert got == exp


def test_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join (click→purchase within 2h, per user)
    drained availableNow equals the batch interval join over the same
    file — Structured Streaming's incremental-execution promise for
    stateful joins."""
    from geo_big_data_analysis_spark.streaming.windows import interval_join_stream

    clicks = stream_events(spark, sf_dir).filter(F.col("event_type") == "click")
    purchases = stream_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    out = run_to_memory(
        interval_join_stream(clicks, purchases, key="user_id", max_delay_minutes=120),
        output_mode="append",
    )
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(batch.dtypes)["ts"] == "bigint":
        batch = batch.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dict(batch.dtypes)["ts"] == "timestamp_ntz":
        batch = batch.withColumn("ts", F.col("ts").cast("timestamp"))
    c = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    p = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"), "value"
    )
    want = c.join(
        p,
        (F.col("cu") == F.col("pu"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 2 HOURS")),
    )
    got = sorted(
        (r["user_id"], r["l_ts"], r["r_ts"], r["r_value"]) for r in out.collect()
    )
    exp = sorted((r["cu"], r["cts"], r["pts"], r["value"]) for r in want.collect())
    assert got == exp and len(got) > 0


def test_foreach_batch_upsert_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch dynamic-partition-overwrite sink: the maintained
    parquet table equals the batch aggregation, and replaying the whole
    stream (fresh checkpoint, same input) leaves the table unchanged —
    the exactly-once-by-idempotence contract."""
    from geo_big_data_analysis_spark.streaming.sinks import (
        hourly_counts_upsert_stream,
        read_hourly_table,
    )

    out = str(tmp_path / "hourly")

    def run(tag):
        q = hourly_counts_upsert_stream(
            stream_events(spark, sf_dir), out, str(tmp_path / f"ck_{tag}")
        )
        q.awaitTermination()
        return {
            r["hour_start"]: (r["n"], round(r["sum_value"], 6))
            for r in read_hourly_table(spark, out).collect()
        }

    first = run("a")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(batch.dtypes)["ts"] == "bigint":
        batch = batch.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dict(batch.dtypes)["ts"] == "timestamp_ntz":
        batch = batch.withColumn("ts", F.col("ts").cast("timestamp"))
    want = {
        r["h"]: (r["n"], round(r["sv"], 6))
        for r in batch.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .collect()
    }
    assert first == want
    second = run("b")
    assert second == first


def test_eventgen_stream_drains_to_batch_twin(spark):
    """The custom Python streaming source replays deterministically:
    draining it and aggregating per hour equals the pure-batch
    computation of the same generator formula, exactly."""
    import time
    import uuid

    from pyspark.sql import functions as F

    from geo_big_data_analysis_spark.streaming import eventgen as eg

    eg.register(spark)
    max_rows = 600
    name = f"eventgen_out_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("eventgen")
        .option("rows_per_batch", 250)
        .option("max_rows", max_rows)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table(name).count() >= max_rows:
                break
            time.sleep(1)
    finally:
        q.stop()

    streamed = spark.table(name)
    assert streamed.count() == max_rows  # no gaps, no duplicates

    def hourly(df):
        return (
            df.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 6).alias("s"),
                F.countDistinct("user_id").alias("u"),
            )
        )

    got = {tuple(r) for r in hourly(streamed).collect()}
    want = {tuple(r) for r in hourly(eg.eventgen_batch_df(spark, max_rows)).collect()}
    assert got == want


def test_sliding_windows_double_count_invariant(spark, sf_dir):
    """2h/1h sliding windows: every event lands in exactly 2 windows,
    so Σ window counts = 2 × event count."""
    from geo_big_data_analysis_spark.plans.registry import REGISTRY, _t

    out = REGISTRY["streaming_sliding_counts"][0](spark, sf_dir)
    total = sum(r.n for r in out.collect())
    n_events = _t(spark, sf_dir, "events").count()
    assert total == 2 * n_events


def test_streaming_progress_metrics_observable(spark, sf_dir):
    """StreamingQueryProgress observability: a drained stream exposes
    per-batch input-row counts and state-operator metrics — the
    monitoring surface a production pipeline scrapes."""
    from geo_big_data_analysis_spark.streaming.windows import (
        hourly_event_counts_stream,
        scoped_shuffle_partitions,
        stream_events,
    )

    ev = stream_events(spark, sf_dir)
    with scoped_shuffle_partitions(spark):
        q = (
            hourly_event_counts_stream(ev)
            .writeStream.format("memory")
            .queryName("__progress_probe")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progresses = q.recentProgress
    assert progresses, "expected at least one progress record"
    total_in = sum(p["numInputRows"] for p in progresses)
    n_events = ev.sparkSession.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total_in == n_events
    assert any(p.get("stateOperators") for p in progresses)
