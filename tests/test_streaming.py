"""Structured Streaming end-to-end: the batch-first builders under a
real readStream with availableNow trigger (SURVEY.md §2 S)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.streaming import windows as SW


def test_stream_tumbling_matches_batch(spark, sf_dir):
    n_stream = SW.run_stream_smoke(spark, sf_dir, out_table="t_stream_smoke")
    n_batch = SW.tumbling(load_table(spark, sf_dir, "events")).count()
    assert n_stream == n_batch > 0


def test_session_windows_merge(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sessions = SW.session(ev)
    agg = sessions.agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_sessions")).first()
    assert agg["total"] == ev.count()  # every event in exactly one session
    assert 0 < agg["n_sessions"] < ev.count()


def test_horizon_filter(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.expr("ts_ns div 1000"))
    kept = SW.horizon_filter(ev, "ts_us", 86_400_000_000)
    assert 0 < kept.count() < ev.count()


def test_streaming_dedup_matches_batch(spark, sf_dir):
    """S5 under a real stream: dropDuplicates on event_id with a
    watermark, drained with availableNow — one row per distinct id."""
    ev_stream = SW.stream_from_parquet(spark, sf_dir)
    q = (
        ev_stream.dropDuplicates(["event_id"])
        .select("event_id")
        .writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_dedup_stream").count()
    want = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert got == want > 0


def test_streaming_raster_matches_batch(spark, sf_dir):
    """The canvas aggregation under readStream: drain the events
    source and compare every (window, bin) count against the same
    expressions run in batch — identical logical plan, two modes."""
    ev_stream = SW.stream_from_parquet(spark, sf_dir)
    q = (
        SW.streaming_raster(ev_stream)
        .writeStream.format("memory")
        .queryName("t_raster_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win"]["start"], r["bx"]): r["val"]
        for r in spark.table("t_raster_stream").collect()
    }
    ev_batch = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
    )
    want = {
        (r["win"]["start"], r["bx"]): r["val"]
        for r in SW.streaming_raster(ev_batch).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_foreachbatch_sink(spark, sf_dir, tmp_path):
    """Source -> raster -> foreachBatch parquet sink: the durable-sink
    pattern (complete mode, overwrite per microbatch — last batch is
    the full result under availableNow)."""
    out = str(tmp_path / "stream_sink")
    ev = SW.stream_from_parquet(spark, sf_dir)

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(out)

    q = (
        SW.streaming_raster(ev)
        .writeStream.foreachBatch(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    ev_batch = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
    )
    want = SW.streaming_raster(ev_batch).agg(F.sum("val")).first()[0]
    assert back.agg(F.sum("val")).first()[0] == want


def test_stateful_stream_matches_batch(spark, sf_dir):
    """applyInPandasWithState end-to-end: drain the events source with
    availableNow, compare final per-user state against the batch agg."""
    from shadems_spark.streaming import stateful as ST

    ev_stream = SW.stream_from_parquet(spark, sf_dir).select("user_id", "value")
    q = (
        ST.running_totals_stream(ev_stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.table("t_stateful").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in ST.running_totals_batch(ev).collect()
    }
    assert got == want
