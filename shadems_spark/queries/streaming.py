"""Streaming-analogue queries in batch-checkable form (SURVEY.md §2
S1-S5).  The same builders run under readStream (see
streaming/windows.py + tests/test_streaming.py); here they run on the
batch events frame against gaps-and-islands / time-bucket oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.queries import register
from shadems_spark.streaming import windows as SW

_FMT = "yyyy-MM-dd HH:mm:ss"


def _ev(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@register(
    "q_tumbling",
    sql="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_tumbling(spark, sf_dir):
    """S1: tumbling 1-hour event-time windows (same builder runs under
    readStream with a watermark)."""
    out = SW.tumbling(_ev(spark, sf_dir))
    return out.select(
        F.date_format(F.col("win.start"), _FMT).alias("win_start"),
        "event_type",
        "n",
        "sum_value",
    )


@register(
    "q_sliding",
    sql="""
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
                    - k.k * INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n
    FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) k(k)
    GROUP BY 1
    """,
)
def q_sliding(spark, sf_dir):
    """S2: sliding 1h/15min windows — every event lands in 4 windows;
    the oracle reconstructs the hop arithmetic explicitly."""
    out = SW.sliding(_ev(spark, sf_dir))
    return out.select(
        F.date_format(F.col("win.start"), _FMT).alias("win_start"), "n"
    )


@register(
    "q_session",
    sql="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
    m AS (SELECT user_id, us,
                 CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
    s AS (SELECT user_id, us,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM m)
    SELECT user_id, min(us) AS session_start_us, count(*) AS n
    FROM s GROUP BY user_id, sid
    """,
)
def q_session(spark, sf_dir):
    """S3: 30-minute-gap session windows per user via
    F.session_window; oracle is the gaps-and-islands equivalent
    (sessions split when the µs gap >= 30 min, matching Spark's
    half-open merge semantics)."""
    out = SW.session(_ev(spark, sf_dir))
    return out.select(
        "user_id",
        F.unix_micros(F.col("win.start").cast("timestamp")).alias("session_start_us"),
        "n",
    )


@register(
    "q_watermark",
    sql="""
    SELECT event_type, count(*) AS n FROM events
    WHERE epoch_us(ts) >= (SELECT max(epoch_us(ts)) FROM events) - 86400000000
    GROUP BY event_type
    """,
)
def q_watermark(spark, sf_dir):
    """S4, batch-checkable form: watermark horizon — keep events
    within 24h of max event time.  The REAL ``withWatermark`` late-row
    drop path runs under readStream/availableNow with a planted late
    row and is asserted for parity in tests/test_streaming.py
    (test_watermark_drops_late_rows_tumbling / _dedup / _session);
    this oracle-checked query pins the equivalent horizon filter."""
    ev = _ev(spark, sf_dir).withColumn("ts_us", F.expr("ts_ns div 1000"))
    kept = SW.horizon_filter(ev, "ts_us", 86_400_000_000)
    return kept.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_stream_dedup",
    sql="""
    SELECT event_id, user_id, event_type FROM (
        SELECT event_id, user_id, event_type,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY epoch_us(ts), event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_stream_dedup(spark, sf_dir):
    """S5: stream dedup — deterministic first event per
    (user, event_type) in event-time order (dropDuplicates+watermark
    semantics on an ordered replay)."""
    ev = _ev(spark, sf_dir).withColumn("ts_us", F.expr("ts_ns div 1000"))
    out = SW.first_per_key(ev, ["user_id", "event_type"], ["ts_us", "event_id"])
    return out.select("event_id", "user_id", "event_type")


@register(
    "q_stateful_totals",
    sql="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_stateful_totals(spark, sf_dir):
    """S/L: per-user running totals — the batch form of the
    applyInPandasWithState operator (streaming/stateful.py); the
    streaming GroupState path is exercised in tests."""
    from shadems_spark.streaming.stateful import running_totals_batch

    return running_totals_batch(_ev(spark, sf_dir))


@register(
    "q_gap_fill",
    sql="""
    WITH bounds AS (SELECT min(CAST(ts AS DATE)) lo, max(CAST(ts AS DATE)) hi
                    FROM events),
    days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
             FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    daily AS (SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n,
                     round(sum(value), 2) AS sum_value
              FROM events GROUP BY 1, 2)
    SELECT t.event_type, days.d, coalesce(daily.n, 0) AS n,
           coalesce(daily.sum_value, 0.0) AS sum_value
    FROM types t CROSS JOIN days
    LEFT JOIN daily ON daily.event_type = t.event_type AND daily.d = days.d
    """,
)
def q_gap_fill(spark, sf_dir):
    """Time-series gap fill (resample-to-daily with zero-filled
    missing days): the dense (type × day) grid is built from
    ``sequence()`` over the broadcast min/max bounds — a few hundred
    rows regardless of input size — and left-joins the daily
    aggregate.  The scan happens twice (bounds + daily), both
    all-column-pruned; the grid join is broadcast."""
    ev = _ev(spark, sf_dir).withColumn("d", F.to_date("ts"))
    daily = ev.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    days = (
        ev.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(days))
    return grid.join(daily, ["event_type", "d"], "left").select(
        "event_type",
        "d",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


@register(
    "q_stream_join",
    sql="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 30 MINUTE
    """,
)
def q_stream_join(spark, sf_dir):
    """Stream-stream interval join, batch-checkable form: click ->
    purchase attribution within 30 minutes per user.  The time bound
    lives in the join condition (state-expiry shape under streaming);
    the shuffle key is user_id — bounded state, no cross join."""
    ev = _ev(spark, sf_dir)
    return SW.interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


@register(
    "q_stream_enrich",
    sql="""
    SELECT c.c_mktsegment,
           count(*) AS n_events,
           round(sum(e.value), 2) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def q_stream_enrich(spark, sf_dir):
    """S-extension: stream-static broadcast enrichment in its
    batch-checkable form — event stream joined to the static customer
    dim (broadcast; the stream side never shuffles for the join),
    running per-segment totals.  The identical builder runs under
    readStream + availableNow in tests/test_streaming.py with
    batch parity asserted (streaming/windows.py::enrich)."""
    ev = _ev(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    return SW.enrich(ev, cust).orderBy("c_mktsegment")
