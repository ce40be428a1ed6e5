"""Event-time windowed operators, batch-first (SURVEY.md §2 S1-S5).

Each builder takes a DataFrame with an event-time column and works
identically on a batch frame or a ``readStream`` frame; the streaming
entry points add the watermark.  Used by queries/streaming.py (batch,
oracle-checked) and by stream_from_parquet()/run_stream_smoke()
(actual Structured Streaming, exercised in tests with availableNow
trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shadems_spark.catalog import load_table


def tumbling(df: DataFrame, ts: str = "ts", length: str = "1 hour") -> DataFrame:
    """S1: tumbling event-time window aggregation."""
    return (
        df.groupBy(F.window(F.col(ts), length).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def sliding(df: DataFrame, ts: str = "ts", length: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """S2: sliding (hopping) windows — each event lands in
    length/slide windows."""
    return df.groupBy(F.window(F.col(ts), length, slide).alias("win")).agg(
        F.count(F.lit(1)).alias("n")
    )


def session(df: DataFrame, ts: str = "ts", gap: str = "30 minutes", key: str = "user_id") -> DataFrame:
    """S3: session windows — events within ``gap`` of each other merge
    into one session per key."""
    return df.groupBy(F.session_window(F.col(ts), gap).alias("win"), F.col(key)).agg(
        F.count(F.lit(1)).alias("n")
    )


def horizon_filter(df: DataFrame, ts_us: str, horizon_us: int) -> DataFrame:
    """S4 batch analogue of a watermark: keep rows within ``horizon``
    of the frame's max event time (streaming drops older late rows)."""
    mx = df.agg(F.max(F.col(ts_us)).alias("__mx"))
    return df.crossJoin(F.broadcast(mx)).filter(
        F.col(ts_us) >= F.col("__mx") - F.lit(horizon_us)
    ).drop("__mx")


def first_per_key(df: DataFrame, keys: list[str], order: list[str]) -> DataFrame:
    """S5: deterministic dedup — first event per key in event-time
    order (what dropDuplicates-with-watermark converges to on an
    ordered replay)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def stream_from_parquet(spark: SparkSession, sf_dir: str, watermark: str = "1 hour") -> DataFrame:
    """readStream over the events fixture (schema from the batch read;
    ts normalized exactly like catalog.load_table)."""
    load_table(spark, sf_dir, "events")  # applies session tuning (nanosAsLong)
    # take the streaming schema from the actual on-disk layout (fixture
    # rounds differ: TIMESTAMP(NANOS) arrives as long under nanosAsLong,
    # TIMESTAMP(MICROS) arrives as a native timestamp type).
    raw_schema = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet").schema
    raw = (
        spark.readStream.schema(raw_schema)
        # file streaming sources take a directory; glob-filter to the
        # events table only (the dir holds all ten fixture tables).
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    # watermarks want TimestampType; session tz is UTC so the window
    # boundaries match the batch/oracle NTZ arithmetic either way.
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        ev = raw.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    else:
        ev = raw.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
            "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
        )
    return ev.withWatermark("ts", watermark)


def stream_events_dir(
    spark: SparkSession, path: str, watermark: str = "10 minutes"
) -> DataFrame:
    """readStream over a directory of event parquet files, ONE
    micro-batch per file (maxFilesPerTrigger=1, honoured by the
    availableNow trigger) — so a late row planted in a later file
    arrives AFTER the watermark has advanced past it and exercises the
    real ``withWatermark`` drop path, not the batch analogue
    (VERDICT r01 #5; parity asserted in tests/test_streaming.py)."""
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return raw.withWatermark("ts", watermark)


def streaming_raster(
    df: DataFrame,
    x: str = "value",
    x_range: tuple[float, float] = (0.0, 1000.0),
    n_bins: int = 64,
    ts: str = "ts",
    window: str = "1 day",
) -> DataFrame:
    """The shadeMS canvas under Structured Streaming: per event-time
    window, a 1-D binned count raster of ``x`` — EXACTLY the batch
    bin_axis expression (operators/raster.py G1), so the live plot and
    the batch plot are the same logical plan.  Works identically on a
    batch frame (the tests compare the two)."""
    from shadems_spark.operators.raster import bin_axis

    lo, hi = x_range
    c = F.col(x).cast("double")
    return (
        df.filter(c.between(F.lit(lo), F.lit(hi)))
        .withColumn("bx", bin_axis(c, lo, hi, n_bins))
        .groupBy(F.window(F.col(ts), window).alias("win"), F.col("bx"))
        .agg(F.count(F.lit(1)).alias("val"))
    )


def run_stream_smoke(spark: SparkSession, sf_dir: str, out_table: str = "stream_tumbling") -> int:
    """End-to-end Structured Streaming check: events parquet ->
    watermark -> tumbling agg -> memory sink, availableNow trigger.
    Returns the number of result rows."""
    ev = stream_from_parquet(spark, sf_dir)
    q = (
        tumbling(ev)
        .writeStream.format("memory")
        .queryName(out_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(out_table).count()


def interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    key: str = "user_id",
    upper_minutes: int = 30,
) -> DataFrame:
    """Stream-stream interval join: purchase within [click.ts,
    click.ts + upper] for the same key.  The time bound is part of the
    JOIN CONDITION — under Structured Streaming (both sides
    watermarked) it is what lets the engine expire join state, so
    buffered rows stay O(key-rate x interval) instead of unbounded.
    The same builder runs on batch frames (oracle-checked as
    q_stream_join) and on two readStream frames
    (tests/test_streaming.py asserts parity)."""
    c = clicks.select(
        F.col(key).alias("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.select(
        F.col(key).alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {upper_minutes} MINUTES"))
    )
    # exact integer µs gap (session tz is UTC, so the NTZ->TZ cast is
    # identity and both engines subtract the same epoch numbers)
    gap = F.unix_micros(F.col("p_ts").cast("timestamp")) - F.unix_micros(
        F.col("c_ts").cast("timestamp")
    )
    return c.join(p, cond).select(
        "user_id", "click_id", "purchase_id", gap.alias("gap_us")
    )


def enrich(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static broadcast enrichment: join the event stream to
    the (static, broadcast) customer dimension and aggregate per
    market segment.  Under readStream this is Spark's stream-static
    join — the dim is re-broadcast per micro-batch, the stream side
    never shuffles for the join, and the groupBy keeps running totals
    in (tiny, segment-keyed) state.  The same builder runs in batch
    for the oracle."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        "c_mktsegment",
        "c_nationkey",
    )
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def curate_admission(docs: DataFrame) -> DataFrame:
    """Streaming corpus admission: the Gopher quality gate (stateless,
    fuses into the micro-batch scan) followed by content-hash
    dropDuplicates — stateful across micro-batches, so a document seen
    in ANY earlier batch is rejected on arrival.  State is one sha2
    per admitted doc; at 100 TB bound it with
    dropDuplicatesWithinWatermark (admission horizon) or swap in the
    foreachBatch MERGE admission (streaming/stateful.py) when the
    resident corpus lives in a table."""
    from shadems_spark.operators.curation import gopher_rules

    passed = gopher_rules(docs).filter(F.col("passes_gopher") == 1)
    return passed.withColumn("h", F.sha2(F.col("text"), 256)).dropDuplicates(
        ["h"]
    )
