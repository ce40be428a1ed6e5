"""Analytical benchmark-shaped queries + facet engine + format
roundtrips: the rebuild's TPC-H-style checks over the star schema
(SURVEY.md §2 J5 context), exact percentiles, and the --iter-*
faceted-write pipeline.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.operators import raster as R
from shadems_spark.queries import register
from shadems_spark.queries.core import PRICE_RANGE, TIME_RANGE
from shadems_spark.sources import read_csv, write_partitioned
from shadems_spark.vis import vis_sql_from, vis_view


from shadems_spark.queries.analytics._shared import (  # noqa: E501
    _HURST_WS,
    _daily_grid,
)



@register(
    "q_ewma",
    sql="""
    WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
                      count(*) AS n_ev,
                      CAST(sum(CAST(round(value * 1e9) AS BIGINT))
                           AS BIGINT) AS sv_n
               FROM events GROUP BY 1, 2),
    s AS (SELECT user_id, CAST(sum(n_ev) AS BIGINT) AS n,
                 list((sv_n / CAST(n_ev AS DOUBLE)) / 1e9
                      ORDER BY day) AS ys
          FROM d GROUP BY 1)
    SELECT user_id, n,
           round(list_reduce(ys, (a, b) -> 0.25 * b + 0.75 * a), 6) AS ewma
    FROM s ORDER BY user_id
    """,
)
def q_ewma(spark, sf_dir):
    """Exponentially-weighted moving average of each user's DAILY
    mean value (alpha=0.25, seeded at the first observed day) — the
    time-series smoothing primitive windows can't express (a linear
    recurrence).

    Bounded grain (VERDICT r6 #5): the former form folded each
    user's raw event series in one array cell — a hot key with 1e8
    events at 100 TB is a single-row OOM.  The fold input is now the
    per-(user, day) pre-aggregate, CALENDAR-BOUNDED by construction
    (the q_holt shape); the raw-event stage is a map-side-combined
    aggregate, and truly unbounded streams use the O(1)-state
    applyInPandasWithState running form (streaming/stateful.py
    stream_ewma).

    Exactness: per-day sums ride the nano-int protocol (summation-
    order-free), the daily mean is one double division replayed
    identically, and both engines fold left-to-right over the
    identically-ordered day list — hash-exact at 6dp."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_ev"),
            F.sum(F.round(F.col("value") * 1e9).cast("long")).alias("sv_n"),
        )
        .withColumn(
            "y", (F.col("sv_n") / F.col("n_ev").cast("double")) / F.lit(1e9)
        )
    )
    vals = F.transform(
        F.sort_array(F.collect_list(F.struct("day", "y"))),
        lambda s: s["y"],
    )
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda a, x: F.lit(0.25) * x + F.lit(0.75) * a,
    )
    return (
        d.groupBy("user_id")
        .agg(
            F.sum("n_ev").cast("long").alias("n"),
            F.round(ewma, 6).alias("ewma"),
        )
        .orderBy("user_id")
    )


@register(
    "q_anomaly",
    sql="""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                          count(*) AS x
                   FROM events GROUP BY 1, 2),
    st AS (SELECT event_type, count(*) AS n,
                  CAST(sum(x) AS BIGINT) AS s,
                  CAST(sum(x * x) AS BIGINT) AS q
           FROM daily GROUP BY 1)
    SELECT daily.event_type, d, x,
           round((x - s / CAST(n AS DOUBLE))
                 / sqrt((q - s * (s / CAST(n AS DOUBLE))) / n), 6) AS z,
           CAST(abs((x - s / CAST(n AS DOUBLE))
                    / sqrt((q - s * (s / CAST(n AS DOUBLE))) / n)) >= 2.0
                AS INT) AS is_anomaly
    FROM daily JOIN st USING (event_type)
    ORDER BY event_type, d
    """,
)
def q_anomaly(spark, sf_dir):
    """Daily-count anomaly scoring per event type: z-score of each
    day's volume against the type's own mean/std — the first-line
    volume-monitoring alert.  Mean and variance come from EXACT
    integer sums (S, Q over daily counts), so the float arithmetic is
    a fixed expression both engines evaluate identically; every daily
    row is emitted with its z and flag (non-vacuous regardless of
    whether the fixture contains a true spike).  One groupBy over
    events, one type-sized join."""
    daily = (
        load_table(spark, sf_dir, "events")
        .withColumn("d", F.to_date("ts"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    mean = F.col("s") / F.col("n").cast("double")
    std = F.sqrt(
        (F.col("q") - F.col("s") * (F.col("s") / F.col("n").cast("double")))
        / F.col("n")
    )
    z = (F.col("x") - mean) / std
    return (
        daily.join(F.broadcast(st), "event_type")
        .select(
            "event_type", "d", "x",
            F.round(z, 6).alias("z"),
            (F.abs(z) >= 2.0).cast("int").alias("is_anomaly"),
        )
        .orderBy("event_type", "d")
    )


@register(
    "q_cusum",
    sql="""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                          count(*) AS x
                   FROM events GROUP BY 1, 2),
    st AS (SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS s
           FROM daily GROUP BY 1),
    c AS (SELECT daily.event_type, d, n,
                 sum(x) OVER (PARTITION BY daily.event_type ORDER BY d)
                 - (row_number() OVER (PARTITION BY daily.event_type
                                       ORDER BY d))
                   * (s / CAST(n AS DOUBLE)) AS cusum
          FROM daily JOIN st USING (event_type)),
    r AS (SELECT event_type, d, n, cusum,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY abs(cusum) DESC, d) AS rk
          FROM c)
    SELECT event_type, CAST(n AS BIGINT) AS n_days, d AS cp_day,
           round(cusum, 6) AS cusum_at_cp
    FROM r WHERE rk = 1 ORDER BY event_type
    """,
)
def q_cusum(spark, sf_dir):
    """CUSUM changepoint detection per event type: cumulative sum of
    deviations from the series mean over the daily-count series, with
    the candidate changepoint at argmax |CUSUM| (earliest day on
    ties) — the classic level-shift detector behind pipeline-volume
    regression alarms.  Prefix sums are exact integers; the mean
    enters once as a fixed double expression, so the argmax and its
    magnitude are engine- and layout-exact.  One groupBy + one
    type-partitioned window over a days×types-sized frame."""
    daily = (
        load_table(spark, sf_dir, "events")
        .withColumn("d", F.to_date("ts"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    ow = Window.partitionBy("event_type").orderBy("d")
    c = (
        daily.join(F.broadcast(st), "event_type")
        .withColumn(
            "cusum",
            F.sum("x").over(ow)
            - F.row_number().over(ow)
            * (F.col("s") / F.col("n").cast("double")),
        )
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), "d"
    )
    return (
        c.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.col("d").alias("cp_day"),
            F.round("cusum", 6).alias("cusum_at_cp"),
        )
        .orderBy("event_type")
    )


@register(
    "q_seasonality",
    sql="""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS x
                   FROM events GROUP BY 1, 2)
    SELECT event_type, CAST(dayofweek(d) + 1 AS INT) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(x) AS BIGINT) AS n_events,
           round(sum(x) / CAST(count(*) AS DOUBLE), 6) AS mean_daily
    FROM daily GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_seasonality(spark, sf_dir):
    """Day-of-week seasonality profile per event type (mean daily
    volume by weekday) — the baseline every volume-anomaly alarm
    normalizes against before flagging a quiet Sunday.  Integer daily
    counts -> one fixed division; NB Spark's dayofweek is
    1=Sunday..7 while DuckDB's is 0-based — the oracle shifts by 1.  Two tiny aggregates."""
    daily = (
        load_table(spark, sf_dir, "events")
        .withColumn("d", F.to_date("ts"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    return (
        daily.withColumn("dow", F.dayofweek("d").cast("int"))
        .groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("x").alias("n_events"),
            F.round(
                F.sum("x") / F.count(F.lit(1)).cast("double"), 6
            ).alias("mean_daily"),
        )
        .orderBy("event_type", "dow")
    )


@register(
    "q_trend_ols",
    sql="""
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y,
                      CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
               FROM orders GROUP BY 1),
    m AS (SELECT min(day) AS day0 FROM d),
    xy AS (SELECT datediff('day', day0, day) AS x, y FROM d CROSS JOIN m),
    s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
          FROM xy)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS var_num,
           round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 6)
               AS slope_per_day,
           round((sy - sx * ((n * sxy - sx * sy)
                             / CAST(n * sxx - sx * sx AS DOUBLE))) / n, 6)
               AS intercept,
           round((CAST(n * sxy - sx * sy AS DOUBLE)
                  * (n * sxy - sx * sy))
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def q_trend_ols(spark, sf_dir):
    """Exact OLS trend of daily order volume — slope/intercept/R^2 of
    the classic is-traffic-growing dashboard line, computed from the
    closed-form normal equations.

    Exactness: x (day index from the corpus min date) and y (daily
    count) are INTEGERS, so all five sufficient statistics (sx, sy,
    sxx, sxy, syy) and the covariance/variance numerators n*sxy-sx*sy
    and n*sxx-sx^2 are engine-exact bigints; slope, intercept and R^2
    are each one fixed float formula over those integers (R^2 stays
    in factored double form because the bigint product of the two
    variance numerators can overflow 2^63).  Scale: the daily
    aggregate is map-side combined to DATE-cardinality; the
    sufficient-stats reduce is a single 6-value row — the textbook
    distributed-regression shape (per-partition partial sums, one
    combine), embarrassingly parallel at any corpus size."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("y"),
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents"),
    )
    m = d.agg(F.min("day").alias("day0"))
    xy = d.crossJoin(F.broadcast(m)).select(
        F.datediff("day", "day0").cast("long").alias("x"), "y"
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    cov = n * sxy - sx * sy
    var = n * sxx - sx * sx
    slope = cov / var.cast("double")
    return s.select(
        n.cast("long").alias("n_days"),
        cov.cast("long").alias("cov_num"),
        var.cast("long").alias("var_num"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round((sy - sx * slope) / n, 6).alias("intercept"),
        F.round(
            (cov.cast("double") * cov) / (var.cast("double") * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@register(
    "q_acf",
    sql="""
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
               FROM orders GROUP BY 1),
    m AS (SELECT min(day) AS d0, datediff('day', min(day), max(day)) AS span
          FROM d),
    grid AS (SELECT t.x, coalesce(d.y, 0) AS y
             FROM (SELECT unnest(generate_series(0, (SELECT span FROM m)))
                          AS x) t
             LEFT JOIN d ON d.day = (SELECT d0 FROM m) + INTERVAL (t.x) DAY),
    g AS (SELECT count(*) AS n, sum(y) AS sy, sum(y * y) AS syy FROM grid),
    k AS (SELECT unnest(generate_series(1, 7)) AS lag),
    p AS (SELECT k.lag,
                 count(*) AS n_pairs,
                 sum(a.y * b.y) AS axy,
                 sum(a.y) AS s1, sum(b.y) AS s2
          FROM k JOIN grid a ON true
          JOIN grid b ON b.x = a.x + k.lag
          GROUP BY 1)
    SELECT p.lag, CAST(p.n_pairs AS BIGINT) AS n_pairs,
           CAST(g.n * g.n * p.axy - g.n * g.sy * (p.s1 + p.s2)
                + p.n_pairs * g.sy * g.sy AS BIGINT) AS num,
           CAST(g.n * (g.n * g.syy - g.sy * g.sy) AS BIGINT) AS den,
           round((g.n * g.n * p.axy - g.n * g.sy * (p.s1 + p.s2)
                  + p.n_pairs * g.sy * g.sy)
                 / CAST(g.n * (g.n * g.syy - g.sy * g.sy) AS DOUBLE), 6)
               AS acf
    FROM p CROSS JOIN g ORDER BY p.lag
    """,
)
def q_acf(spark, sf_dir):
    """Exact autocorrelation function of the ZERO-FILLED daily order
    series at lags 1..7 — the weekly-seasonality / burst-structure
    detector beside q_seasonality's weekday means and q_cusum's
    changepoints (a spike at lag 7 = weekly cycle; slow decay =
    trend/bursts).

    Exactness: with integer daily counts on a dense calendar grid,
    the biased-estimator numerator scaled by n^2 is the pure INTEGER
    n^2*sum(y_t*y_{t+k}) - n*sy*(S1_k+S2_k) + (n-k)*sy^2 (the
    cross-multiplied mean-centering identity — no float ybar ever
    touches a cross-row sum), and the denominator n*(n*syy - sy^2)
    is likewise integer; acf is ONE division.  Gaps are zero-filled
    from a generated calendar spine, so the lag join is on exact
    integer day indices.  Scale: daily aggregate is map-side
    combined to date cardinality; the 7 lag joins run on the
    DATE-cardinality grid (a few k rows at any corpus size) — the
    heavy input never joins itself."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    m = d.agg(
        F.min("day").alias("d0"),
        F.datediff(F.max("day"), F.min("day")).alias("span"),
    )
    grid = (
        m.select(F.explode(F.sequence(F.lit(0), F.col("span"))).alias("x"), "d0")
        .join(
            d,
            F.expr("date_add(d0, CAST(x AS INT))") == F.col("day"),
            "left",
        )
        .select("x", F.coalesce("y", F.lit(0)).alias("y"))
    )
    # no persist: the grid is DATE-cardinality (a few k rows); its three
    # consumers recompute a tiny agg+join rather than hold a cache slot.
    g = grid.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    k = spark.range(1, 8).select(F.col("id").alias("lag"))
    a, b = grid.alias("a"), grid.alias("b")
    p = (
        F.broadcast(k)
        .join(a)
        .join(b, F.col("b.x") == F.col("a.x") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("a.y") * F.col("b.y")).alias("axy"),
            F.sum(F.col("a.y")).alias("s1"),
            F.sum(F.col("b.y")).alias("s2"),
        )
    )
    n, sy, syy = F.col("n"), F.col("sy"), F.col("syy")
    num = (
        n * n * F.col("axy")
        - n * sy * (F.col("s1") + F.col("s2"))
        + F.col("n_pairs") * sy * sy
    )
    den = n * (n * syy - sy * sy)
    return (
        p.crossJoin(F.broadcast(g))
        .select(
            "lag",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            num.cast("long").alias("num"),
            den.cast("long").alias("den"),
            F.round(num / den.cast("double"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


@register(
    "q_theilsen",
    sql="""
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
               FROM orders GROUP BY 1),
    m AS (SELECT min(day) AS d0, datediff('day', min(day), max(day)) AS span
          FROM d),
    grid AS (SELECT t.x, coalesce(d.y, 0) AS y
             FROM (SELECT unnest(generate_series(0, (SELECT span FROM m)))
                          AS x) t
             LEFT JOIN d ON d.day = (SELECT d0 FROM m) + INTERVAL (t.x) DAY),
    p AS (SELECT a.x AS x1, b.x AS x2,
                 (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS sl
          FROM grid a JOIN grid b ON b.x > a.x),
    r AS (SELECT sl, row_number() OVER (ORDER BY sl, x1, x2) AS rn,
                 count(*) OVER () AS np
          FROM p),
    med AS (SELECT avg(sl) AS slope, max(np) AS np FROM r
            WHERE rn IN (CAST(floor((np + 1) / 2.0) AS BIGINT),
                         CAST(ceil((np + 1) / 2.0) AS BIGINT))),
    ic AS (SELECT g.x, g.y - med.slope * g.x AS resid
           FROM grid g CROSS JOIN med),
    r2 AS (SELECT resid, row_number() OVER (ORDER BY resid, x) AS rn,
                  count(*) OVER () AS n
           FROM ic),
    med2 AS (SELECT avg(resid) AS intercept FROM r2
             WHERE rn IN (CAST(floor((n + 1) / 2.0) AS BIGINT),
                          CAST(ceil((n + 1) / 2.0) AS BIGINT)))
    SELECT CAST(med.np AS BIGINT) AS n_pairs,
           round(med.slope, 6) AS slope_per_day,
           round(med2.intercept, 6) AS intercept
    FROM med CROSS JOIN med2
    """,
)
def q_theilsen(spark, sf_dir):
    """Theil-Sen robust trend of the zero-filled daily order series —
    the median of ALL pairwise slopes (29.3% breakdown point): the
    robust twin of q_trend_ols, immune to the outlier days that drag
    a least-squares line (Sen 1968).

    Exactness: every pairwise slope is one division of integers (the
    same double on any IEEE engine), the median is the exact order
    statistic under the deterministic (slope, x1, x2) order (mean of
    the two middles when the pair count is even — a single float
    add/divide), and the intercept is the exact median residual.
    Scale: pairs grow as days^2 — fine for a DATE-cardinality series
    (2.9M pairs here; still only ~1e9 at a decade of days); at finer
    grains switch to the standard sampled Theil-Sen (random pair
    subsample) or per-partition partial medians.  The heavy input
    table itself never self-joins — only the daily grid does."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    m = d.agg(
        F.min("day").alias("d0"),
        F.datediff(F.max("day"), F.min("day")).alias("span"),
    )
    grid = (
        m.select(F.explode(F.sequence(F.lit(0), F.col("span"))).alias("x"), "d0")
        .join(d, F.expr("date_add(d0, CAST(x AS INT))") == F.col("day"), "left")
        .select("x", F.coalesce("y", F.lit(0)).alias("y"))
    )
    a, b = grid.alias("a"), grid.alias("b")
    # try_divide, not /: downstream isNotNull filters can be pushed
    # INTO this join's condition, where ANSI division would evaluate
    # on the x2 == x1 diagonal BEFORE the x2 > x1 conjunct prunes it
    # and throw DIVIDE_BY_ZERO.  Every condition-surviving pair has
    # divisor >= 1, so values are unchanged.
    p = a.join(b, F.col("b.x") > F.col("a.x")).select(
        F.col("a.x").alias("x1"),
        F.col("b.x").alias("x2"),
        F.try_divide(
            (F.col("b.y") - F.col("a.y")).cast("double"),
            (F.col("b.x") - F.col("a.x")).cast("double"),
        ).alias("sl"),
    )
    # Medians by rank selection over the CONSTANT-bounded pair table
    # (days^2 — calendar-squared, ~2.9M at this fixture's 2400-day
    # span, invariant in corpus size).  A single-partition window
    # over a constant-bounded table is the documented exemption and
    # MEASURED faster here than the distributed alternative: the
    # two-phase global_index route was built and timed in r8 — its
    # extra passes (cut sampling + bucket assignment + per-bucket
    # counts) cost ~5x the one in-partition sort, with zero scale
    # benefit because the input never grows.  Allowlist entry stays.
    wr = Window.orderBy("sl", "x1", "x2")
    wn = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = p.select(
        "sl",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("np"),
    )
    med = r.filter(
        (F.col("rn") == F.floor((F.col("np") + 1) / 2.0).cast("long"))
        | (F.col("rn") == F.ceil((F.col("np") + 1) / 2.0).cast("long"))
    ).agg(F.avg("sl").alias("slope"), F.max("np").alias("np"))
    ic = grid.crossJoin(F.broadcast(med)).select(
        "x", (F.col("y") - F.col("slope") * F.col("x")).alias("resid")
    )
    wr2 = Window.orderBy("resid", "x")
    r2 = ic.select(
        "resid",
        F.row_number().over(wr2).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med2 = r2.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2.0).cast("long"))
        | (F.col("rn") == F.ceil((F.col("n") + 1) / 2.0).cast("long"))
    ).agg(F.avg("resid").alias("intercept"))
    return (
        med.crossJoin(F.broadcast(med2))
        .select(
            F.col("np").cast("long").alias("n_pairs"),
            F.round("slope", 6).alias("slope_per_day"),
            F.round("intercept", 6).alias("intercept"),
        )
    )


@register(
    "q_burstiness",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    b AS (SELECT min(day) AS d0,
                 datediff('day', min(day), max(day)) AS span
          FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    grid AS (SELECT t.event_type, g.x, coalesce(d.y, 0) AS y
             FROM types t
             CROSS JOIN (SELECT unnest(generate_series(0,
                                (SELECT span FROM b))) AS x) g
             LEFT JOIN d ON d.event_type = t.event_type
                        AND d.day = (SELECT d0 FROM b) + INTERVAL (g.x) DAY),
    s AS (SELECT event_type, count(*) AS n, sum(y) AS sy,
                 sum(y * y) AS syy
          FROM grid GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(sy AS BIGINT) AS total,
           CAST(n * syy - sy * sy AS BIGINT) AS var_num,
           round((n * syy - sy * sy) / CAST(n * sy AS DOUBLE), 6)
               AS fano,
           round(CAST(n * syy - sy * sy AS DOUBLE) * n
                 / ((n - 1) * (sy * CAST(sy AS DOUBLE)))
                 - 1.0 / (sy / CAST(n AS DOUBLE)), 6) AS cv2_minus_inv_mean
    FROM s ORDER BY event_type
    """,
)
def q_burstiness(spark, sf_dir):
    """Fano factor (index of dispersion) of daily event counts per
    type over the zero-filled calendar — the burstiness gate: a
    Poisson-arrival stream has fano == 1; fano >> 1 means bursty
    traffic (size partitions and state stores for peaks, not means),
    fano << 1 means regularized arrivals.  cv2_minus_inv_mean is the
    companion excess-variability measure (CV^2 - 1/mean, zero for
    Poisson) on the same integer sums.

    Exactness: integer daily counts on a dense calendar grid; the
    variance numerator n*syy - sy^2 is a pure integer (cross-
    multiplied centering, the q_acf identity) and each output is one
    fixed float formula.  Scale: one (type, day)-key map-side
    aggregate, then per-type constant-size reductions — the grid is
    types x days regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    grid = _daily_grid(ev)
    s = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sy, syy = F.col("n"), F.col("sy"), F.col("syy")
    var_num = n * syy - sy * sy
    return s.select(
        "event_type",
        n.cast("long").alias("n_days"),
        sy.cast("long").alias("total"),
        var_num.cast("long").alias("var_num"),
        F.round(var_num / (n * sy).cast("double"), 6).alias("fano"),
        F.round(
            var_num.cast("double") * n / ((n - 1) * (sy * sy.cast("double")))
            - 1.0 / (sy / n.cast("double")),
            6,
        ).alias("cv2_minus_inv_mean"),
    ).orderBy("event_type")


_STL_SQL = """
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    b AS (SELECT min(day) AS d0,
                 datediff('day', min(day), max(day)) AS span
          FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    grid AS (SELECT t.event_type, g.x, coalesce(d.y, 0) AS y
             FROM types t
             CROSS JOIN (SELECT unnest(generate_series(0,
                                (SELECT span FROM b))) AS x) g
             LEFT JOIN d ON d.event_type = t.event_type
                        AND d.day = (SELECT d0 FROM b) + INTERVAL (g.x) DAY),
    tr AS (SELECT event_type, x, y,
                  sum(y) OVER w AS s7, count(*) OVER w AS c7
           FROM grid
           WINDOW w AS (PARTITION BY event_type ORDER BY x
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    t2 AS (SELECT event_type, x, y, x % 7 AS dow,
                  CASE WHEN c7 = 7 THEN s7 / 7.0 END AS trend,
                  CASE WHEN c7 = 7 THEN
                    CAST(round((y - s7 / 7.0) * 1e9) AS BIGINT) END AS detr_n
           FROM tr),
    sr AS (SELECT event_type, dow,
                  CAST(round(sum(detr_n) / CAST(count(*) AS DOUBLE)) AS BIGINT)
                      AS s_rn
           FROM t2 WHERE detr_n IS NOT NULL GROUP BY 1, 2),
    adj AS (SELECT event_type,
                   CAST(round(sum(s_rn) / CAST(count(*) AS DOUBLE)) AS BIGINT)
                       AS a_n
            FROM sr GROUP BY 1),
    sea AS (SELECT sr.event_type, sr.dow, sr.s_rn - adj.a_n AS seasonal_n
            FROM sr JOIN adj USING (event_type))
    SELECT t2.event_type AS event_type,
           CAST((SELECT d0 FROM b) + INTERVAL (t2.x) DAY AS DATE) AS day,
           CAST(t2.y AS BIGINT) AS y,
           round(t2.trend, 6) AS trend,
           round(sea.seasonal_n / 1e9, 6) AS seasonal,
           round((t2.detr_n - sea.seasonal_n) / 1e9, 6) AS resid
    FROM t2 JOIN sea ON t2.event_type = sea.event_type AND t2.dow = sea.dow
    ORDER BY 1, 2
"""


@register("q_stl_decompose", sql=_STL_SQL)
def q_stl_decompose(spark, sf_dir):
    """Classical additive seasonal-trend decomposition (the moving-
    average core of STL, period 7) of the zero-filled daily event
    series per type: trend = centered 7-day moving average (full
    windows only), seasonal = mean-centered day-of-week means of the
    detrended series, residual = the rest — the decomposition behind
    q_seasonality's weekday profile and q_anomaly's alerts (alert on
    RESIDUALS, not raw counts, and weekly cycles stop paging).

    Exactness: trend is an integer window sum divided by exactly 7;
    every detrended value is nano-int-rounded BEFORE the day-of-week
    mean (order-free sums), seasonal offsets stay BIGINT through the
    centering, and y = trend + seasonal + resid holds exactly in nano
    space (pinned).  dow = x % 7 is a grid index, so no engine
    dayofweek() convention is involved.

    Scale shape: one (type, day)-key map-side aggregate, then every
    window/join runs on the types x days grid (date cardinality, not
    corpus cardinality) with the 7-row-per-type seasonal table
    broadcast back — same footprint as q_acf/q_burstiness at any
    corpus size."""
    from shadems_spark.operators.exprcache import memo

    ev = load_table(spark, sf_dir, "events")
    grid = _daily_grid(ev, keep_d0=True)

    def _t2_cols():
        w7 = Window.partitionBy("event_type").orderBy("x").rowsBetween(-3, 3)
        trend = F.when(
            F.count(F.lit(1)).over(w7) == 7, F.sum("y").over(w7) / F.lit(7.0)
        )
        return [
            (F.col("x") % 7).alias("dow"),
            trend.alias("trend"),
            F.round((F.col("y") - trend) * F.lit(1e9))
            .cast("long").alias("detr_n"),
        ]

    t2 = grid.select(
        "event_type", "x", "d0", "y", *memo(("stl_t2",), _t2_cols)
    )
    sr = (
        t2.filter(F.col("detr_n").isNotNull())
        .groupBy("event_type", "dow")
        .agg(
            memo(
                ("stl_srn",),
                lambda: F.round(
                    F.sum("detr_n") / F.count(F.lit(1)).cast("double")
                ).cast("long").alias("s_rn"),
            )
        )
    )
    adj = sr.groupBy("event_type").agg(
        memo(
            ("stl_adj",),
            lambda: F.round(F.sum("s_rn") / F.count(F.lit(1)).cast("double"))
            .cast("long").alias("a_n"),
        )
    )
    sea = sr.join(adj, "event_type").select(
        "event_type", "dow",
        memo(
            ("stl_sea",),
            lambda: (F.col("s_rn") - F.col("a_n")).alias("seasonal_n"),
        ),
    )
    return (
        t2.join(F.broadcast(sea), ["event_type", "dow"])
        .select(
            "event_type",
            *memo(
                ("stl_out",),
                lambda: [
                    F.expr("date_add(d0, CAST(x AS INT))").alias("day"),
                    F.col("y").cast("long").alias("y"),
                    F.round("trend", 6).alias("trend"),
                    F.round(F.col("seasonal_n") / F.lit(1e9), 6)
                    .alias("seasonal"),
                    F.round(
                        (F.col("detr_n") - F.col("seasonal_n")) / F.lit(1e9), 6
                    ).alias("resid"),
                ],
            ),
        )
        .orderBy("event_type", "day")
    )


_HOLT_SQL = """
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
      FROM events GROUP BY 1, 2),
    bnd AS (SELECT min(day) AS d0,
                   datediff('day', min(day), max(day)) AS span
            FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    ser AS (SELECT t.event_type, g.x + 1 AS t,
                   CAST(coalesce(d.y, 0) AS DOUBLE) AS y
            FROM types t
            CROSS JOIN (SELECT unnest(generate_series(0,
                               (SELECT span FROM bnd))) AS x) g
            LEFT JOIN d ON d.event_type = t.event_type
                       AND d.day = (SELECT d0 FROM bnd) + INTERVAL (g.x) DAY),
    nn AS (SELECT event_type, count(*) AS n FROM ser GROUP BY 1),
    r AS (
      SELECT s1.event_type AS event_type, 1 AS t,
             s1.y AS l, s2.y - s1.y AS b
      FROM ser s1 JOIN ser s2
        ON s1.event_type = s2.event_type AND s1.t = 1 AND s2.t = 2
      UNION ALL
      SELECT r.event_type, r.t + 1,
             0.5 * s.y + 0.5 * (r.l + r.b),
             0.25 * (0.5 * s.y + 0.5 * (r.l + r.b) - r.l) + 0.75 * r.b
      FROM r JOIN ser s
        ON s.event_type = r.event_type AND s.t = r.t + 1)
    SELECT r.event_type AS event_type,
           CAST(nn.n AS BIGINT) AS n_days,
           round(r.l, 6) AS level,
           round(r.b, 6) AS trend,
           round(r.l + 7.0 * r.b, 6) AS forecast_7
    FROM r JOIN nn ON r.event_type = nn.event_type AND r.t = nn.n
    ORDER BY 1
"""


@register("q_holt", sql=_HOLT_SQL)
def q_holt(spark, sf_dir):
    """Holt double-exponential smoothing (level + linear trend,
    alpha=0.5, beta=0.25) of the zero-filled daily event series per
    type, with the 7-day-ahead forecast l_n + 7*b_n — the forecasting
    companion to q_ewma's flat smoother (a trending series needs the
    trend state or the forecast always lags) and to
    q_stl_decompose's descriptive split.

    The recurrence l_t = a*y_t + (1-a)*(l+b); b_t = B*(l_t-l) +
    (1-B)*b is a linear fold that windows cannot express: batch form
    collects each type's ordered series (bounded: date cardinality)
    and runs ONE JVM struct-accumulator fold; initialization l_1=y_1,
    b_1=y_2-y_1.  alpha/beta are exact binary doubles and the DuckDB
    oracle's recursive CTE replays the identical IEEE operation
    sequence step-for-step, so results hash-match at 6dp — same
    protocol as q_ewma, extended to a 2-component state.

    Scale shape: one (type, day)-key map-side aggregate, then
    per-type state is 2 doubles over a date-cardinality list; for
    unbounded streams the same recurrence runs incrementally in
    applyInPandasWithState (streaming/stateful.py pattern)."""
    ev = load_table(spark, sf_dir, "events")
    grid = _daily_grid(ev, y_cast="double")
    ys = F.transform(
        F.sort_array(F.collect_list(F.struct("x", "y"))), lambda s: s["y"]
    )
    agg = grid.groupBy("event_type").agg(ys.alias("ys"))

    y1 = F.element_at(F.col("ys"), 1)
    y2 = F.element_at(F.col("ys"), 2)
    init = F.struct(y1.alias("l"), (y2 - y1).alias("b"))

    def step(acc, y):
        l_new = F.lit(0.5) * y + F.lit(0.5) * (acc["l"] + acc["b"])
        b_new = F.lit(0.25) * (l_new - acc["l"]) + F.lit(0.75) * acc["b"]
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    state = F.aggregate(
        F.slice(F.col("ys"), 2, F.greatest(F.size("ys") - 1, F.lit(0))),
        init,
        step,
    )
    return (
        agg.select(
            "event_type",
            F.size("ys").cast("long").alias("n_days"),
            state.alias("st"),
        )
        .select(
            "event_type",
            "n_days",
            F.round(F.col("st.l"), 6).alias("level"),
            F.round(F.col("st.b"), 6).alias("trend"),
            F.round(F.col("st.l") + F.lit(7.0) * F.col("st.b"), 6).alias(
                "forecast_7"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "q_changepoint",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      count(*) AS y
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, day, y,
                 CAST(row_number() OVER w AS BIGINT) AS t,
                 sum(y) OVER (w ROWS UNBOUNDED PRECEDING) AS cy,
                 sum(y * y) OVER (w ROWS UNBOUNDED PRECEDING) AS cyy,
                 sum(y) OVER (PARTITION BY event_type) AS sy,
                 sum(y * y) OVER (PARTITION BY event_type) AS syy,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    c AS (SELECT *,
                 CAST(round((CAST(cyy AS DOUBLE)
                             - CAST(cy AS DOUBLE) * cy / t
                             + CAST(syy - cyy AS DOUBLE)
                             - CAST(sy - cy AS DOUBLE) * (sy - cy) / (n - t))
                            * 1e9) AS BIGINT) AS cost_n
          FROM r WHERE t < n),
    b AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY cost_n, t) AS rk
          FROM c)
    SELECT event_type, CAST(n AS BIGINT) AS n_days, t AS split_t,
           day AS split_day,
           round(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n, 4)
               AS sse_total,
           round(cost_n / 1e9, 4) AS sse_split,
           round((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
                 - cost_n / 1e9, 4) AS gain,
           round(CAST(cy AS DOUBLE) / t, 4) AS mean_left,
           round(CAST(sy - cy AS DOUBLE) / (n - t), 4) AS mean_right
    FROM b WHERE rk = 1 ORDER BY event_type
    """,
)
def q_changepoint(spark, sf_dir):
    """Single-changepoint detection (binary segmentation, the first
    split of PELT/CUSUM-style segmenters) on the daily count series
    per event type: choose the split minimizing SSE_left + SSE_right,
    report the day, the variance explained (gain) and the two segment
    means — the level-shift detector beside q_cusum's sequential
    drift alarm.

    Exactness: every candidate cost is a fixed float formula over
    exact integer prefix sums (cumsum of y and y^2 down the per-type
    day series), nano-int-rounded so the argmin compares integers
    with a deterministic tie-break on earlier t.  Scale: the day
    series is calendar-bounded per type, so the cumsum windows and
    the O(n) candidate sweep stay constant-size regardless of row
    count; the only data-sized work is the (type, day) map-side
    aggregate."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    wo = W.partitionBy("event_type").orderBy("day")
    wc = wo.rowsBetween(W.unboundedPreceding, 0)
    wp = W.partitionBy("event_type")
    r = d.select(
        "event_type", "day", "y",
        F.row_number().over(wo).cast("long").alias("t"),
        F.sum("y").over(wc).alias("cy"),
        F.sum(F.col("y") * F.col("y")).over(wc).alias("cyy"),
        F.sum("y").over(wp).alias("sy"),
        F.sum(F.col("y") * F.col("y")).over(wp).alias("syy"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    c = F.col
    cost = (
        c("cyy").cast("double") - c("cy").cast("double") * c("cy") / c("t")
        + (c("syy") - c("cyy")).cast("double")
        - (c("sy") - c("cy")).cast("double") * (c("sy") - c("cy"))
        / (c("n") - c("t"))
    )
    cc = r.filter(c("t") < c("n")).withColumn(
        "cost_n", F.round(cost * F.lit(1e9)).cast("long")
    )
    b = cc.withColumn(
        "rk", F.row_number().over(W.partitionBy("event_type").orderBy("cost_n", "t"))
    )
    sst = c("syy").cast("double") - c("sy").cast("double") * c("sy") / c("n")
    return (
        b.filter(c("rk") == 1)
        .select(
            "event_type",
            c("n").cast("long").alias("n_days"),
            c("t").alias("split_t"),
            c("day").alias("split_day"),
            F.round(sst, 4).alias("sse_total"),
            F.round(c("cost_n") / 1e9, 4).alias("sse_split"),
            F.round(sst - c("cost_n") / 1e9, 4).alias("gain"),
            F.round(c("cy").cast("double") / c("t"), 4).alias("mean_left"),
            F.round(
                (c("sy") - c("cy")).cast("double") / (c("n") - c("t")), 4
            ).alias("mean_right"),
        )
        .orderBy("event_type")
    )


@register(
    "q_entropy_rate",
    sql="""
    WITH s AS (SELECT user_id, event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY epoch_us(ts), event_id)
                          AS nxt
               FROM events),
    t AS (SELECT event_type AS src, nxt AS dst, count(*) AS n
          FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
    r AS (SELECT src, CAST(sum(n) AS BIGINT) AS out_n,
                 CAST(count(*) AS BIGINT) AS fanout,
                 CAST(sum(CAST(round(n * ln(n) * 1e9) AS BIGINT))
                      AS BIGINT) AS nln_n
          FROM t GROUP BY 1),
    tot AS (SELECT CAST(sum(out_n) AS BIGINT) AS grand FROM r),
    h AS (SELECT r.src, r.out_n, r.fanout,
                 ln(r.out_n) - r.nln_n / (r.out_n * 1e9) AS h_src
          FROM r),
    z AS (SELECT sum(CAST(round(h.out_n * h.h_src * 1e9 / t2.grand)
                          AS BIGINT)) AS rate_n
          FROM h CROSS JOIN tot t2)
    SELECT h.src, h.out_n, h.fanout,
           round(h.h_src, 6) AS h_conditional,
           round(z.rate_n / 1e9, 6) AS entropy_rate
    FROM h CROSS JOIN z ORDER BY h.src
    """,
)
def q_entropy_rate(spark, sf_dir):
    """Markov entropy rate of the event stream — the predictability
    ceiling of user behavior (Song et al., Science '10 flavor):
    H = sum_src pi(src) * H(next | src), with the stationary weight
    taken as each source's share of observed transitions.  Low rate
    means funnels are deterministic; high rate means next-action
    prediction caps early.  Complements q_markov (the matrix) and
    q_path_analysis (the paths) with the single-number summary.

    Exactness: per-source conditional entropies use the q_ldiversity
    identity H = ln N - (1/N) sum n ln n with nano-int n*ln(n) terms
    (order-free integer sums); the rate re-rounds each source's
    contribution through nano space before the final sum.  Scale: one
    user-partitioned lead() window (the q_markov shuffle), then
    event-type^2-bounded aggregates."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.expr("ts_ns div 1000"), "event_id")
    s = ev.withColumn("nxt", F.lead("event_type").over(w))
    t = (
        s.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    r = t.groupBy("src").agg(
        F.sum("n").cast("long").alias("out_n"),
        F.count(F.lit(1)).cast("long").alias("fanout"),
        F.sum(
            F.round(F.col("n") * F.log("n") * F.lit(1e9)).cast("long")
        ).cast("long").alias("nln_n"),
    )
    tot = r.agg(F.sum("out_n").cast("long").alias("grand"))
    h = r.select(
        "src", "out_n", "fanout",
        (
            F.log("out_n") - F.col("nln_n") / (F.col("out_n") * F.lit(1e9))
        ).alias("h_src"),
    )
    z = (
        h.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                F.col("out_n") * F.col("h_src") * F.lit(1e9) / F.col("grand")
            ).cast("long").alias("c")
        )
        .agg(F.sum("c").alias("rate_n"))
    )
    return (
        h.crossJoin(F.broadcast(z))
        .select(
            "src", "out_n", "fanout",
            F.round("h_src", 6).alias("h_conditional"),
            F.round(F.col("rate_n") / 1e9, 6).alias("entropy_rate"),
        )
        .orderBy("src")
    )


_SAX_SYMS = 6  # alphabet size (equal-frequency breakpoints)


@register(
    "q_sax",
    sql=f"""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, day, y,
                 CAST(row_number() OVER (PARTITION BY event_type
                                         ORDER BY day) - 1 AS BIGINT) AS t,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
          FROM d),
    paa AS (SELECT event_type, t // 7 AS seg,
                   CAST(sum(y) AS BIGINT) AS seg_sum,
                   CAST(count(*) AS BIGINT) AS seg_n
            FROM w WHERE t < n - (n % 7) GROUP BY 1, 2),
    rk AS (SELECT event_type, seg, seg_sum,
                  CAST(row_number() OVER (PARTITION BY event_type
                                          ORDER BY seg_sum, seg)
                       - 1 AS BIGINT) AS r,
                  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                      AS m
           FROM paa),
    sym AS (SELECT event_type, seg,
                   (r * {_SAX_SYMS}) // m AS s
            FROM rk)
    SELECT event_type,
           string_agg(chr(97 + CAST(s AS INT)), '' ORDER BY seg) AS sax,
           CAST(count(*) AS BIGINT) AS n_segments
    FROM sym GROUP BY 1 ORDER BY event_type
    """,
)
def q_sax(spark, sf_dir):
    """SAX symbolization (Lin et al. '03, equal-frequency variant) of
    each type's daily count series: 7-day PAA segments, rank-based
    {_SAX_SYMS}-letter alphabet, one symbol string per type — the
    index-friendly representation motif/anomaly search runs on at
    scale (string equality over symbols replaces numeric distance
    over raw points).

    Exactness: PAA segment sums are integers; symbols come from exact
    integer ranks with a (sum, seg) tie-break — the equal-frequency
    cut (r * a) div m avoids the gaussian-breakpoint table and is
    pure integer math; the final string is an ordered aggregate.
    Scale: the (type, day) map-side aggregate bounds everything
    downstream by the calendar; per-type windows only."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    wo = W.partitionBy("event_type").orderBy("day")
    wp = W.partitionBy("event_type")
    w = d.select(
        "event_type", "day", "y",
        (F.row_number().over(wo) - 1).cast("long").alias("t"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
    )
    paa = (
        w.filter(F.col("t") < F.col("n") - (F.col("n") % 7))
        .groupBy("event_type", F.expr("t div 7").alias("seg"))
        .agg(
            F.sum("y").cast("long").alias("seg_sum"),
            F.count(F.lit(1)).cast("long").alias("seg_n"),
        )
    )
    wr = W.partitionBy("event_type").orderBy("seg_sum", "seg")
    rk = paa.select(
        "event_type", "seg", "seg_sum",
        (F.row_number().over(wr) - 1).cast("long").alias("r"),
        F.count(F.lit(1)).over(W.partitionBy("event_type"))
        .cast("long").alias("m"),
    )
    sym = rk.select(
        "event_type", "seg",
        F.expr(f"(r * {_SAX_SYMS}) div m").alias("s"),
    )
    return (
        sym.groupBy("event_type")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("seg", "s"))),
                    lambda x: F.chr(97 + x["s"].cast("int")),
                ),
            ).alias("sax"),
            F.count(F.lit(1)).cast("long").alias("n_segments"),
        )
        .orderBy("event_type")
    )


_DTW_INF = 10**15


@register(
    "q_dtw",
    sql=f"""
    WITH d AS (SELECT event_type,
                      epoch_us(ts) // 604800000000 AS wk,
                      count(*) AS y
               FROM events GROUP BY 1, 2),
    a AS (SELECT event_type,
                 list(y ORDER BY wk) AS ys
          FROM d GROUP BY 1),
    p AS (SELECT x.event_type AS type_a, z.event_type AS type_b,
                 x.ys AS va, z.ys AS vb
          FROM a x JOIN a z ON x.event_type < z.event_type),
    r AS (SELECT type_a, type_b,
                 len(va) AS n, len(vb) AS m,
                 list_reduce(
                     list_prepend(
                         list_transform(range(0, len(vb) + 1),
                             j -> CASE WHEN j = 0 THEN CAST(0 AS BIGINT)
                                  ELSE CAST({_DTW_INF} AS BIGINT) END),
                         list_transform(va, x -> [x])),
                     (prev, ai) -> list_reduce(
                         list_prepend(
                             [CAST({_DTW_INF} AS BIGINT)],
                             list_transform(range(1, len(vb) + 1),
                                            j -> [CAST(j AS BIGINT)])),
                         (cur, jl) -> list_append(cur,
                             abs(ai[1] - vb[CAST(jl[1] AS INT)])
                             + least(prev[CAST(jl[1] AS INT)],
                                     prev[CAST(jl[1] AS INT) + 1],
                                     cur[len(cur)])))
                 ) AS dp
          FROM p)
    SELECT type_a, type_b,
           CAST(n AS BIGINT) AS n_weeks_a, CAST(m AS BIGINT) AS n_weeks_b,
           CAST(dp[CAST(m AS INT) + 1] AS BIGINT) AS dtw,
           round(dp[CAST(m AS INT) + 1] / CAST(n + m AS DOUBLE), 4)
               AS dtw_per_step
    FROM r ORDER BY type_a, type_b
    """,
)
def q_dtw(spark, sf_dir):
    """Dynamic-time-warping distance between every pair of event-type
    WEEKLY count series — the elastic similarity measure that aligns
    shifted/stretched seasonal patterns where lockstep metrics
    (q_corr/q_kendall) see nothing; dtw_per_step normalizes by path
    length for cross-pair comparison.

    The O(n*m) Bellman recursion runs ENTIRELY in-plan as a nested
    fold (outer over series-a elements carrying the previous DP row,
    inner over series-b positions building the current row with the
    three-way min) — no UDF, no driver loop; DuckDB replays the
    identical recursion with nested list_reduce over list-typed
    accumulators (the list-element-accumulator trick, since DuckDB
    folds require acc type == element type).

    Exactness: weekly sums, costs |a-b| and the DP are pure integer
    arithmetic; the absolute-week index (epoch_us div week) needs no
    anchor row.  Scale: series are calendar-bounded (52/year), so
    each pair's DP is constant work and the pair table is
    |types|^2 rows; the row-sized work is one (type, week) map-side
    aggregate.  At 1e4+-point series, swap in banded DTW (Sakoe-
    Chiba) — same fold with a clamped inner range."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.expr("ts_ns div 1000 div 604800000000").alias("wk"),
    ).agg(F.count(F.lit(1)).alias("y"))
    a = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("wk", "y"))),
            lambda s: s["y"],
        ).alias("ys")
    )
    p = (
        a.select(
            F.col("event_type").alias("type_a"), F.col("ys").alias("va")
        )
        .join(
            a.select(
                F.col("event_type").alias("type_b"), F.col("ys").alias("vb")
            ),
            F.col("type_a") < F.col("type_b"),
        )
    )
    from shadems_spark.operators.series import dtw_fold

    r = p.withColumn("dtw", dtw_fold("va", "vb"))
    return r.select(
        "type_a", "type_b",
        F.size("va").cast("long").alias("n_weeks_a"),
        F.size("vb").cast("long").alias("n_weeks_b"),
        F.col("dtw").cast("long").alias("dtw"),
        F.round(
            F.col("dtw")
            / (F.size("va") + F.size("vb")).cast("double"),
            4,
        ).alias("dtw_per_step"),
    ).orderBy("type_a", "type_b")


_FBT_SQL = """
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
      FROM events GROUP BY 1, 2),
    bnd AS (SELECT min(day) AS d0,
                   datediff('day', min(day), max(day)) AS span
            FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    ser AS (SELECT t.event_type, g.x + 1 AS t,
                   CAST(coalesce(d.y, 0) AS DOUBLE) AS y
            FROM types t
            CROSS JOIN (SELECT unnest(generate_series(0,
                               (SELECT span FROM bnd))) AS x) g
            LEFT JOIN d ON d.event_type = t.event_type
                       AND d.day = (SELECT d0 FROM bnd) + INTERVAL (g.x) DAY),
    nn AS (SELECT event_type, count(*) AS n FROM ser GROUP BY 1),
    cuts AS (SELECT event_type, unnest(generate_series(14,
                    CAST(n - 7 AS INT), 7)) AS c
             FROM nn WHERE n >= 21),
    r AS (
      SELECT s1.event_type AS event_type, cu.c AS c, 1 AS t,
             s1.y AS l, s2.y - s1.y AS b
      FROM ser s1
      JOIN ser s2 ON s1.event_type = s2.event_type
                 AND s1.t = 1 AND s2.t = 2
      JOIN cuts cu ON cu.event_type = s1.event_type
      UNION ALL
      SELECT r.event_type, r.c, r.t + 1,
             0.5 * s.y + 0.5 * (r.l + r.b),
             0.25 * (0.5 * s.y + 0.5 * (r.l + r.b) - r.l) + 0.75 * r.b
      FROM r JOIN ser s
        ON s.event_type = r.event_type AND s.t = r.t + 1
      WHERE r.t < r.c),
    f AS (SELECT r.event_type, r.c,
                 CAST(round(abs(r.l + 7.0 * r.b - sa.y) * 1e9) AS BIGINT)
                     AS err_n,
                 CAST(round(abs(sc.y - sa.y) * 1e9) AS BIGINT) AS nerr_n
          FROM r
          JOIN ser sa ON sa.event_type = r.event_type AND sa.t = r.c + 7
          JOIN ser sc ON sc.event_type = r.event_type AND sc.t = r.c
          WHERE r.t = r.c),
    g AS (SELECT event_type, count(*) AS n_folds,
                 sum(err_n) AS se, sum(nerr_n) AS sn
          FROM f GROUP BY 1)
    SELECT event_type, CAST(n_folds AS BIGINT) AS n_folds,
           round(se / 1e9 / n_folds, 4) AS mae,
           round(sn / 1e9 / n_folds, 4) AS mae_naive,
           CASE WHEN sn > 0
                THEN round(1.0 - CAST(se AS DOUBLE) / sn, 4) END AS skill
    FROM g ORDER BY event_type
"""


@register("q_forecast_backtest", sql=_FBT_SQL)
def q_forecast_backtest(spark, sf_dir):
    """Rolling-origin backtest of the Holt forecaster (the evaluation
    loop every production forecaster ships with): at cutoffs every 7
    days (from day 14), refit on the prefix, forecast 7 days ahead, and score MAE
    against the persistence baseline (skill = 1 - mae/mae_naive; a
    forecaster that can't beat 'tomorrow = today' is noise).

    Exactness: each fold replays the q_holt recurrence (exact IEEE
    step sequence on the zero-filled integer series — the oracle's
    recursive CTE is keyed by (type, cutoff) and iterates to each
    cutoff); per-fold absolute errors are nano-int-rounded before the
    cross-fold sum.  Scale: the series is calendar-bounded, so the
    whole backtest — O(n^2/stride) fold steps — is constant work per
    type after the one (type, day) map-side aggregate; folds ride the
    SAME collected array, exploded per cutoff, never a second scan."""
    ev = load_table(spark, sf_dir, "events")
    grid = _daily_grid(ev, y_cast="double")
    ys = F.transform(
        F.sort_array(F.collect_list(F.struct("x", "y"))), lambda s: s["y"]
    )
    agg = grid.groupBy("event_type").agg(ys.alias("ys"))
    folds = agg.filter(F.size("ys") >= 21).select(
        "event_type", "ys",
        F.explode(
            F.sequence(F.lit(14), F.size("ys") - 7, F.lit(7))
        ).alias("c"),
    )
    y1 = F.element_at(F.col("ys"), 1)
    y2 = F.element_at(F.col("ys"), 2)
    init = F.struct(y1.alias("l"), (y2 - y1).alias("b"))

    def step(acc, y):
        l_new = F.lit(0.5) * y + F.lit(0.5) * (acc["l"] + acc["b"])
        b_new = F.lit(0.25) * (l_new - acc["l"]) + F.lit(0.75) * acc["b"]
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    st = F.aggregate(
        F.slice(F.col("ys"), 2, F.col("c") - 1), init, step
    )
    f = folds.select(
        "event_type", "c",
        F.round(
            F.abs(
                st["l"] + F.lit(7.0) * st["b"]
                - F.element_at("ys", F.col("c") + 7)
            ) * F.lit(1e9)
        ).cast("long").alias("err_n"),
        F.round(
            F.abs(
                F.element_at("ys", F.col("c"))
                - F.element_at("ys", F.col("c") + 7)
            ) * F.lit(1e9)
        ).cast("long").alias("nerr_n"),
    )
    g = f.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_folds"),
        F.sum("err_n").alias("se"),
        F.sum("nerr_n").alias("sn"),
    )
    return g.select(
        "event_type",
        F.col("n_folds").cast("long").alias("n_folds"),
        F.round(F.col("se") / 1e9 / F.col("n_folds"), 4).alias("mae"),
        F.round(F.col("sn") / 1e9 / F.col("n_folds"), 4).alias("mae_naive"),
        F.when(
            F.col("sn") > 0,
            F.round(
                F.lit(1.0) - F.col("se").cast("double") / F.col("sn"), 4
            ),
        ).alias("skill"),
    ).orderBy("event_type")


@register(
    "q_xcorr",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    b AS (SELECT min(day) AS d0 FROM d),
    s AS (SELECT event_type,
                 datediff('day', (SELECT d0 FROM b), day) AS t, y
          FROM d),
    lags AS (SELECT unnest(generate_series(-7, 7)) AS lag),
    p AS (SELECT a.event_type AS type_a, c.event_type AS type_b,
                 l.lag,
                 count(*) AS n,
                 sum(a.y) AS sx, sum(c.y) AS sy,
                 sum(a.y * a.y) AS sxx, sum(c.y * c.y) AS syy,
                 sum(a.y * c.y) AS sxy
          FROM s a
          CROSS JOIN lags l
          JOIN s c ON c.event_type != a.event_type
                  AND c.t = a.t + l.lag
          WHERE a.event_type = 'view' AND c.event_type = 'purchase'
          GROUP BY 1, 2, 3),
    r AS (SELECT *, (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                    / sqrt((n * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * sx)
                           * (n * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * sy)) AS xc
          FROM p),
    best AS (SELECT CAST(lag AS BIGINT) AS best_lag,
                    round(xc, 6) AS best_xcorr
             FROM r ORDER BY CAST(round(xc * 1e9) AS BIGINT) DESC, lag
             LIMIT 1)
    SELECT r.type_a, r.type_b, CAST(r.lag AS BIGINT) AS lag,
           CAST(r.n AS BIGINT) AS n_days,
           round(r.xc, 6) AS xcorr,
           best.best_lag, best.best_xcorr
    FROM r CROSS JOIN best ORDER BY r.lag
    """,
)
def q_xcorr(spark, sf_dir):
    """Lead-lag cross-correlation between the view and purchase daily
    series at lags -7..+7 — does engagement LEAD conversion, and by
    how many days?  The best (most positive) lag is the actionable
    output: a forecaster should feed x shifted by it; argmax
    tie-breaks on the earlier lag via nano-int comparison.

    Exactness: the Pearson sufficient statistics at each lag are
    exact integer sums over the aligned day pairs (the lag join key
    is integer day index); one fixed formula per lag.  Scale: the
    lag join runs on the calendar-bounded per-type series (15 lags x
    days rows), after the one data-sized (type, day) aggregate."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    b = d.agg(F.min("day").alias("d0"))
    s = d.crossJoin(F.broadcast(b)).select(
        "event_type", F.datediff("day", "d0").alias("t"), "y"
    )
    a = s.filter(F.col("event_type") == "view").select(
        F.col("t").alias("ta"), F.col("y").alias("ya")
    )
    cc = s.filter(F.col("event_type") == "purchase").select(
        F.col("t").alias("tc"), F.col("y").alias("yc")
    )
    lags = spark.range(-7, 8).select(F.col("id").cast("int").alias("lag"))
    p = (
        a.crossJoin(F.broadcast(lags))
        .join(cc, F.col("tc") == F.col("ta") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ya").alias("sx"), F.sum("yc").alias("sy"),
            F.sum(F.col("ya") * F.col("ya")).alias("sxx"),
            F.sum(F.col("yc") * F.col("yc")).alias("syy"),
            F.sum(F.col("ya") * F.col("yc")).alias("sxy"),
        )
    )
    c = F.col
    xc = (
        c("n") * c("sxy").cast("double") - c("sx").cast("double") * c("sy")
    ) / F.sqrt(
        (c("n") * c("sxx").cast("double") - c("sx").cast("double") * c("sx"))
        * (c("n") * c("syy").cast("double") - c("sy").cast("double") * c("sy"))
    )
    r = p.withColumn("xc", xc)
    best = (
        r.orderBy(
            F.desc(F.round(c("xc") * 1e9).cast("long")), "lag"
        )
        .limit(1)
        .select(
            c("lag").cast("long").alias("best_lag"),
            F.round("xc", 6).alias("best_xcorr"),
        )
    )
    return (
        r.crossJoin(F.broadcast(best))
        .select(
            F.lit("view").alias("type_a"),
            F.lit("purchase").alias("type_b"),
            c("lag").cast("long").alias("lag"),
            c("n").cast("long").alias("n_days"),
            F.round("xc", 6).alias("xcorr"),
            "best_lag", "best_xcorr",
        )
        .orderBy("lag")
    )


@register(
    "q_granger",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    b AS (SELECT min(day) AS d0 FROM d),
    s AS (SELECT event_type,
                 datediff('day', (SELECT d0 FROM b), day) AS t, y
          FROM d),
    yy AS (SELECT t, y FROM s WHERE event_type = 'purchase'),
    xx AS (SELECT t, y FROM s WHERE event_type = 'view'),
    j AS (SELECT y0.y AS y, y1.y AS yl, x1.y AS xl
          FROM yy y0
          JOIN yy y1 ON y1.t = y0.t - 1
          JOIN xx x1 ON x1.t = y0.t - 1),
    g AS (SELECT count(*) AS n, sum(y) AS sy, sum(yl) AS s1,
                 sum(xl) AS s2,
                 sum(yl * yl) AS s11, sum(yl * xl) AS s12,
                 sum(xl * xl) AS s22,
                 sum(y * yl) AS s1y, sum(y * xl) AS s2y,
                 sum(y * y) AS syy
          FROM j),
    rr AS (SELECT n,
                  -- restricted AR(1): y ~ a + b*yl  (SSE via cov alg.)
                  (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
                  - (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n)
                    * (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n)
                    / (CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                      AS sse_r,
                  -- full: y ~ a + b*yl + c*xl (2-var OLS on centered)
                  (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
                  - ((CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n)
                       * (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n)
                       * (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n)
                     - 2 * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n)
                       * (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n)
                       * (CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n)
                     + (CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                       * (CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n)
                       * (CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n))
                    / ((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                       * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n)
                       - (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n)
                         * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n))
                      AS sse_f
           FROM g)
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(sse_r, 4) AS sse_restricted,
           round(sse_f, 4) AS sse_full,
           round((sse_r - sse_f) / (sse_f / (n - 3)), 6) AS f_stat,
           round(1.0 - sse_f / sse_r, 6) AS r2_gain
    FROM rr
    """,
)
def q_granger(spark, sf_dir):
    """Granger-causality screen (1 lag): does yesterday's VIEW count
    improve today's PURCHASE forecast beyond yesterday's purchases?
    F = ((SSE_r - SSE_f) / q) / (SSE_f / (n - k)) comparing the
    restricted AR(1) against the model with the lagged exogenous
    series — the time-series causality companion to the contemporal
    q_corr/q_xcorr (correlation at lag 0 says nothing about
    direction).

    Exactness: both regressions solve in closed form from ONE set of
    exact integer sufficient statistics (centered covariance algebra
    — no data pass per model); the day-index join keys are integers.
    Scale: the lag self-join runs on the calendar-bounded series; the
    only data-sized stage is the (type, day) aggregate."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    b = d.agg(F.min("day").alias("d0"))
    s = d.crossJoin(F.broadcast(b)).select(
        "event_type", F.datediff("day", "d0").alias("t"), "y"
    )
    yy = s.filter(F.col("event_type") == "purchase").select("t", "y")
    xx = s.filter(F.col("event_type") == "view").select(
        F.col("t").alias("tx"), F.col("y").alias("xl")
    )
    y1 = yy.select(F.col("t").alias("t1"), F.col("y").alias("yl"))
    j = (
        yy.join(y1, F.col("t1") == F.col("t") - 1)
        .join(xx, F.col("tx") == F.col("t") - 1)
        .select("y", "yl", "xl")
    )
    g = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"), F.sum("yl").alias("s1"),
        F.sum("xl").alias("s2"),
        F.sum(F.col("yl") * F.col("yl")).alias("s11"),
        F.sum(F.col("yl") * F.col("xl")).alias("s12"),
        F.sum(F.col("xl") * F.col("xl")).alias("s22"),
        F.sum(F.col("y") * F.col("yl")).alias("s1y"),
        F.sum(F.col("y") * F.col("xl")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    c = F.col

    def ctr(sab, sa, sb):
        return sab.cast("double") - sa.cast("double") * sb / c("n")

    cyy = ctr(c("syy"), c("sy"), c("sy"))
    c11 = ctr(c("s11"), c("s1"), c("s1"))
    c22 = ctr(c("s22"), c("s2"), c("s2"))
    c12 = ctr(c("s12"), c("s1"), c("s2"))
    c1y = ctr(c("s1y"), c("s1"), c("sy"))
    c2y = ctr(c("s2y"), c("s2"), c("sy"))
    sse_r = cyy - c1y * c1y / c11
    sse_f = cyy - (
        c22 * c1y * c1y - 2 * c12 * c1y * c2y + c11 * c2y * c2y
    ) / (c11 * c22 - c12 * c12)
    rr = g.select(
        "n", sse_r.alias("sse_r"), sse_f.alias("sse_f")
    )
    return rr.select(
        c("n").cast("long").alias("n_obs"),
        F.round("sse_r", 4).alias("sse_restricted"),
        F.round("sse_f", 4).alias("sse_full"),
        F.round(
            (c("sse_r") - c("sse_f")) / (c("sse_f") / (c("n") - 3)), 6
        ).alias("f_stat"),
        F.round(F.lit(1.0) - c("sse_f") / c("sse_r"), 6).alias("r2_gain"),
    )


@register(
    "q_hurst",
    sql=f"""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    b AS (SELECT min(day) AS d0,
                 datediff('day', min(day), max(day)) AS span FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    grid AS (SELECT t.event_type, g.x, coalesce(d.y, 0) AS y
             FROM types t
             CROSS JOIN (SELECT unnest(generate_series(0,
                                (SELECT span FROM b))) AS x) g
             LEFT JOIN d ON d.event_type = t.event_type
                        AND d.day = (SELECT d0 FROM b) + INTERVAL (g.x) DAY),
    ww AS (SELECT unnest([{", ".join(str(w) for w in _HURST_WS)}]) AS w),
    cells AS (SELECT g.event_type, ww.w, g.x // ww.w AS blk, g.x, g.y
              FROM grid g CROSS JOIN ww),
    wn AS (SELECT *,
                  CAST(count(*) OVER pb AS BIGINT) AS nb,
                  CAST(sum(y) OVER pb AS BIGINT) AS sy,
                  CAST(sum(y * y) OVER pb AS BIGINT) AS syy,
                  CAST(sum(y) OVER (pb ORDER BY x
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cy,
                  CAST(row_number() OVER (pb ORDER BY x) AS BIGINT) AS j
           FROM cells
           WINDOW pb AS (PARTITION BY event_type, w, blk)),
    dev AS (SELECT event_type, w, blk, nb, sy, syy,
                   w * cy - j * sy AS dev_w
            FROM wn WHERE nb = w),
    blkrs AS (SELECT event_type, w, blk,
                     CAST(round(1e9 *
                       ((max(dev_w) - least(min(dev_w), 0)) / CAST(w AS DOUBLE))
                       / sqrt((syy - CAST(sy AS DOUBLE) * sy / w)
                              / w)) AS BIGINT) AS rs_n
              FROM dev
              GROUP BY event_type, w, blk, sy, syy
              HAVING syy * w > sy * sy),
    mrs AS (SELECT event_type, w, count(*) AS n_blocks,
                   CAST(round(sum(rs_n) / CAST(count(*) AS DOUBLE))
                        AS BIGINT) AS mean_rs_n
            FROM blkrs GROUP BY 1, 2),
    pts AS (SELECT event_type,
                   list_sort(list(ln(CAST(w AS DOUBLE)))) AS lxs,
                   list_sort(list_zip(list(ln(CAST(w AS DOUBLE))),
                                      list(ln(mean_rs_n / 1e9)))) AS pl,
                   count(*) AS np
            FROM mrs GROUP BY 1),
    sl AS (SELECT event_type, np,
                  list_reduce(list_prepend([0.0, 0.0, 0.0, 0.0],
                      list_transform(pl, z -> [z[1], z[2], z[1]*z[1],
                                               z[1]*z[2]])),
                      (a, e) -> [a[1]+e[1], a[2]+e[2], a[3]+e[3],
                                 a[4]+e[4]]) AS s
           FROM pts)
    SELECT mrs.event_type, CAST(mrs.w AS BIGINT) AS w,
           CAST(mrs.n_blocks AS BIGINT) AS n_blocks,
           round(mrs.mean_rs_n / 1e9, 6) AS mean_rs,
           round((sl.np * sl.s[4] - sl.s[1] * sl.s[2])
                 / (sl.np * sl.s[3] - sl.s[1] * sl.s[1]), 6) AS hurst
    FROM mrs JOIN sl USING (event_type)
    ORDER BY mrs.event_type, mrs.w
    """,
)
def q_hurst(spark, sf_dir):
    """Hurst exponent by rescaled-range analysis over the daily count
    series per type — the long-range-dependence diagnostic (H = 0.5
    random walk, H > 0.5 persistent trends, H < 0.5 mean-reverting):
    per block of w days, R/S = (range of mean-adjusted cumulative
    deviations) / population std; H is the log-log slope of mean R/S
    against w in {{8, 16, 32}}.  Capacity planners read H before
    trusting any i.i.d. burst model (q_burstiness measures magnitude,
    Hurst measures MEMORY).

    Exactness: cumulative deviations are carried as exact integers
    (w*cum_j - j*sum — the cross-multiplied centering), each block's
    R/S nano-rounds before the per-w mean, zero-variance blocks drop
    by an integer predicate, and the 3-point regression folds in
    sorted order (deterministic 4-sum accumulator on both engines).
    Scale: block windows partition by (type, w, block) — w-bounded;
    the series is calendar-bounded; the one data-sized stage is the
    (type, day) aggregate."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    grid = _daily_grid(ev)
    ws = spark.createDataFrame([(w,) for w in _HURST_WS], ["w"])
    cells = grid.crossJoin(F.broadcast(ws)).withColumn(
        "blk", F.expr("x div w")
    )
    pb = W.partitionBy("event_type", "w", "blk")
    po = pb.orderBy("x")
    wn = cells.select(
        "event_type", "w", "blk", "x", "y",
        F.count(F.lit(1)).over(pb).cast("long").alias("nb"),
        F.sum("y").over(pb).cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).over(pb).cast("long").alias("syy"),
        F.sum("y").over(po.rowsBetween(W.unboundedPreceding, 0))
        .cast("long").alias("cy"),
        F.row_number().over(po).cast("long").alias("j"),
    )
    dev = wn.filter(F.col("nb") == F.col("w")).withColumn(
        "dev_w", F.col("w") * F.col("cy") - F.col("j") * F.col("sy")
    )
    c = F.col
    blk = (
        dev.groupBy("event_type", "w", "blk", "sy", "syy")
        .agg(F.max("dev_w").alias("mx"), F.min("dev_w").alias("mn"))
        .filter(c("syy") * c("w") > c("sy") * c("sy"))
        .select(
            "event_type", "w",
            F.round(
                F.lit(1e9)
                * ((c("mx") - F.least(c("mn"), F.lit(0))) / c("w").cast("double"))
                / F.sqrt(
                    (c("syy") - c("sy").cast("double") * c("sy") / c("w"))
                    / c("w")
                )
            ).cast("long").alias("rs_n"),
        )
    )
    mrs = blk.groupBy("event_type", "w").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.round(F.sum("rs_n") / F.count(F.lit(1)).cast("double"))
        .cast("long").alias("mean_rs_n"),
    )
    pts = mrs.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.log(c("w").cast("double")).alias("lx"),
                    F.log(c("mean_rs_n") / 1e9).alias("ly"),
                )
            )
        ).alias("pl"),
        F.count(F.lit(1)).alias("np"),
    )
    s = F.aggregate(
        "pl",
        F.struct(
            F.lit(0.0).alias("sx"), F.lit(0.0).alias("sy2"),
            F.lit(0.0).alias("sxx"), F.lit(0.0).alias("sxy"),
        ),
        lambda a, e: F.struct(
            (a["sx"] + e["lx"]).alias("sx"),
            (a["sy2"] + e["ly"]).alias("sy2"),
            (a["sxx"] + e["lx"] * e["lx"]).alias("sxx"),
            (a["sxy"] + e["lx"] * e["ly"]).alias("sxy"),
        ),
    )
    sl = pts.select(
        "event_type", "np", s.alias("s")
    ).select(
        "event_type",
        (
            (c("np") * c("s.sxy") - c("s.sx") * c("s.sy2"))
            / (c("np") * c("s.sxx") - c("s.sx") * c("s.sx"))
        ).alias("hurst"),
    )
    return (
        mrs.join(sl, "event_type")
        .select(
            "event_type",
            c("w").cast("long").alias("w"),
            c("n_blocks").cast("long").alias("n_blocks"),
            F.round(c("mean_rs_n") / 1e9, 6).alias("mean_rs"),
            F.round("hurst", 6).alias("hurst"),
        )
        .orderBy("event_type", "w")
    )


_BURST_SQL = """
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
      FROM events GROUP BY 1, 2),
    bnd AS (SELECT min(day) AS d0,
                   datediff('day', min(day), max(day)) AS span FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    ser AS (SELECT t.event_type, g.x + 1 AS t,
                   CAST(coalesce(d.y, 0) AS DOUBLE) AS y
            FROM types t
            CROSS JOIN (SELECT unnest(generate_series(0,
                               (SELECT span FROM bnd))) AS x) g
            LEFT JOIN d ON d.event_type = t.event_type
                       AND d.day = (SELECT d0 FROM bnd) + INTERVAL (g.x) DAY),
    nn AS (SELECT event_type, count(*) AS n, sum(y) / count(*) AS r0
           FROM ser GROUP BY 1),
    em AS (SELECT s.event_type, s.t,
                  s.y * ln(nn.r0) - nn.r0 AS e0,
                  s.y * ln(2 * nn.r0) - 2 * nn.r0 AS e1
           FROM ser s JOIN nn ON nn.event_type = s.event_type),
    walk(event_type, t, l0, l1, nburst) AS (
      SELECT event_type, t,
             (ln(0.9) + e0) - greatest(ln(0.9) + e0, ln(0.1) + e1),
             (ln(0.1) + e1) - greatest(ln(0.9) + e0, ln(0.1) + e1),
             CASE WHEN exp((ln(0.1) + e1)
                           - greatest(ln(0.9) + e0, ln(0.1) + e1))
                  / (exp((ln(0.9) + e0)
                         - greatest(ln(0.9) + e0, ln(0.1) + e1))
                     + exp((ln(0.1) + e1)
                           - greatest(ln(0.9) + e0, ln(0.1) + e1)))
                  > 0.5 THEN 1 ELSE 0 END
      FROM em WHERE t = 1
      UNION ALL
      SELECT w.event_type, w.t + 1,
             u0 - greatest(u0, u1),
             u1 - greatest(u0, u1),
             w.nburst + CASE WHEN exp(u1 - greatest(u0, u1))
                             / (exp(u0 - greatest(u0, u1))
                                + exp(u1 - greatest(u0, u1)))
                             > 0.5
                        THEN 1 ELSE 0 END
      FROM (SELECT w.event_type, w.t, w.nburst,
                   greatest(w.l0 + ln(0.9), w.l1 + ln(0.1))
                   + ln(1.0 + exp(least(w.l0 + ln(0.9), w.l1 + ln(0.1))
                                  - greatest(w.l0 + ln(0.9),
                                             w.l1 + ln(0.1))))
                   + em.e0 AS u0,
                   greatest(w.l0 + ln(0.1), w.l1 + ln(0.9))
                   + ln(1.0 + exp(least(w.l0 + ln(0.1), w.l1 + ln(0.9))
                                  - greatest(w.l0 + ln(0.1),
                                             w.l1 + ln(0.9))))
                   + em.e1 AS u1
            FROM walk w
            JOIN em ON em.event_type = w.event_type
                   AND em.t = w.t + 1) w)
    SELECT w.event_type AS event_type,
           CAST(nn.n AS BIGINT) AS n_days,
           round(nn.r0, 6) AS rate0,
           CAST(w.nburst AS BIGINT) AS n_burst_days,
           round(exp(w.l1) / (exp(w.l0) + exp(w.l1)), 6) AS p_burst_final
    FROM walk w JOIN nn ON nn.event_type = w.event_type AND w.t = nn.n
    ORDER BY 1
"""


@register("q_burst_hmm", sql=_BURST_SQL)
def q_burst_hmm(spark, sf_dir):
    """Two-state burst detection (the Kleinberg automaton as an HMM
    forward filter): state 0 emits Poisson(r0 = the type's mean daily
    rate), state 1 emits Poisson(2*r0), sticky transitions (0.9 stay
    / 0.1 switch); the filter runs down the zero-filled daily series
    in log space with per-step max normalization and counts the days
    whose filtered burst posterior exceeds 0.5 — the trend/incident
    detector beside q_cusum's cumulative alarm (CUSUM detects one
    level shift; the HMM tracks bursts that switch on AND off).

    Exactness: emissions drop the ln(y!) term common to both states;
    the recurrence is one JVM struct-accumulator fold whose exact
    IEEE operation sequence the oracle's recursive CTE replays
    (the q_holt protocol, extended to a 2-state + counter
    accumulator with log-sum-exp steps).  Scale: one (type, day)
    map-side aggregate; per-type state is 2 doubles + 1 int over a
    calendar-bounded list."""
    from pyspark.sql import Window as W  # noqa: F401 (family convention)

    ev = load_table(spark, sf_dir, "events")
    grid = _daily_grid(ev, y_cast="double")
    ys = F.transform(
        F.sort_array(F.collect_list(F.struct("x", "y"))), lambda st: st["y"]
    )
    agg = grid.groupBy("event_type").agg(
        ys.alias("ys"),
        F.count(F.lit(1)).alias("n"),
        (F.sum("y") / F.count(F.lit(1))).alias("r0"),
    )
    ln = F.log
    l9, l1_ = float(__import__("math").log(0.9)), float(
        __import__("math").log(0.1)
    )

    def lse(a, bb):
        return F.greatest(a, bb) + ln(
            F.lit(1.0) + F.exp(F.least(a, bb) - F.greatest(a, bb))
        )

    def emis(y, r0, burst):
        r = r0 * 2.0 if burst else r0
        return y * ln(r) - r

    y1 = F.element_at(F.col("ys"), 1)
    r0c = F.col("r0")
    u0_1 = F.lit(l9) + emis(y1, r0c, False)
    u1_1 = F.lit(l1_) + emis(y1, r0c, True)
    m1 = F.greatest(u0_1, u1_1)
    p1 = F.exp(u1_1 - m1) / (F.exp(u0_1 - m1) + F.exp(u1_1 - m1))
    init = F.struct(
        (u0_1 - m1).alias("l0"),
        (u1_1 - m1).alias("l1"),
        F.when(p1 > 0.5, 1).otherwise(0).cast("long").alias("nburst"),
    )

    def step(acc, y):
        u0 = lse(acc["l0"] + l9, acc["l1"] + l1_) + emis(y, r0c, False)
        u1 = lse(acc["l0"] + l1_, acc["l1"] + l9) + emis(y, r0c, True)
        m = F.greatest(u0, u1)
        p = F.exp(u1 - m) / (F.exp(u0 - m) + F.exp(u1 - m))
        return F.struct(
            (u0 - m).alias("l0"),
            (u1 - m).alias("l1"),
            (acc["nburst"] + F.when(p > 0.5, 1).otherwise(0)).alias(
                "nburst"
            ),
        )

    st = F.aggregate(
        F.slice(F.col("ys"), 2, F.greatest(F.size("ys") - 1, F.lit(0))),
        init,
        step,
    )
    c = F.col
    return (
        agg.select(
            "event_type",
            c("n").cast("long").alias("n_days"),
            F.round("r0", 6).alias("rate0"),
            st.alias("st"),
        )
        .select(
            "event_type", "n_days", "rate0",
            c("st.nburst").cast("long").alias("n_burst_days"),
            F.round(
                F.exp(c("st.l1"))
                / (F.exp(c("st.l0")) + F.exp(c("st.l1"))),
                6,
            ).alias("p_burst_final"),
        )
        .orderBy("event_type")
    )


@register(
    "q_mann_kendall",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    p AS (SELECT a.event_type,
                 sum(CASE WHEN b.y > a.y THEN 1
                          WHEN b.y < a.y THEN -1 ELSE 0 END) AS s,
                 count(*) AS n_pairs
          FROM d a JOIN d b ON a.event_type = b.event_type
                           AND a.day < b.day
          GROUP BY 1),
    tie AS (SELECT event_type, sum(t * (t - 1) * (2 * t + 5)) AS tsum
            FROM (SELECT event_type, y, count(*) AS t
                  FROM d GROUP BY 1, 2)
            GROUP BY 1),
    nn AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1)
    SELECT p.event_type,
           CAST(nn.n AS BIGINT) AS n_days,
           CAST(p.s AS BIGINT) AS s_statistic,
           round((p.s - CASE WHEN p.s > 0 THEN 1
                             WHEN p.s < 0 THEN -1 ELSE 0 END)
                 / sqrt((nn.n * (nn.n - 1.0) * (2 * nn.n + 5)
                         - coalesce(tie.tsum, 0)) / 18.0), 6) AS z
    FROM p JOIN nn USING (event_type)
           LEFT JOIN tie USING (event_type)
    ORDER BY p.event_type
    """,
)
def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall monotonic-trend test on the daily count series
    per type: S = sum of pairwise sign(y_j - y_i) for i < j in time,
    tie-corrected normal approximation with continuity correction —
    the nonparametric is-it-trending gate beside q_trend_ols's slope
    (MK needs no linearity and shrugs off outliers) and q_theilsen's
    robust slope estimate (MK is its significance test — the classic
    pairing).

    Exactness: S and the tie term t(t-1)(2t+5) are exact integer
    sums; z is one fixed formula.  Scale: the O(days^2) pair join is
    calendar-bounded per type; the row-sized work is the (type, day)
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    b = d.select(
        "event_type", F.col("day").alias("day2"), F.col("y").alias("y2")
    )
    p = (
        d.join(b, "event_type")
        .filter(F.col("day") < F.col("day2"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("y2") > F.col("y"), 1)
                .when(F.col("y2") < F.col("y"), -1)
                .otherwise(0)
            ).alias("s"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    tie = (
        d.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tsum")
        )
    )
    nn = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    c = F.col
    cc = F.when(c("s") > 0, 1).when(c("s") < 0, -1).otherwise(0)
    return (
        p.join(nn, "event_type")
        .join(tie, "event_type", "left")
        .select(
            "event_type",
            c("n").cast("long").alias("n_days"),
            c("s").cast("long").alias("s_statistic"),
            F.round(
                (c("s") - cc)
                / F.sqrt(
                    (
                        c("n") * (c("n") - 1.0) * (2 * c("n") + 5)
                        - F.coalesce(c("tsum"), F.lit(0))
                    ) / 18.0
                ),
                6,
            ).alias("z"),
        )
        .orderBy("event_type")
    )


@register(
    "q_runs_test",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, day, y,
                 CAST(row_number() OVER (PARTITION BY event_type
                                         ORDER BY y, day) AS BIGINT) AS rk,
                 CAST(count(*) OVER (PARTITION BY event_type)
                      AS BIGINT) AS n
          FROM d),
    md AS (SELECT event_type,
                  max(CASE WHEN rk = (n + 1) // 2 THEN y END) AS med
           FROM r GROUP BY 1),
    s AS (SELECT d.event_type, d.day,
                 CASE WHEN d.y > md.med THEN 1 ELSE 0 END AS up
          FROM d JOIN md USING (event_type)),
    f AS (SELECT event_type, up,
                 CASE WHEN lag(up) OVER (PARTITION BY event_type
                                         ORDER BY day) IS NULL
                      OR lag(up) OVER (PARTITION BY event_type
                                       ORDER BY day) != up
                 THEN 1 ELSE 0 END AS new_run
          FROM s),
    g AS (SELECT event_type,
                 CAST(sum(new_run) AS BIGINT) AS runs,
                 CAST(sum(up) AS BIGINT) AS n1,
                 CAST(count(*) - sum(up) AS BIGINT) AS n0
          FROM f GROUP BY 1)
    SELECT event_type, runs, n1, n0,
           round((runs - (2.0 * n1 * n0 / (n1 + n0) + 1))
                 / sqrt(2.0 * n1 * n0 * (2.0 * n1 * n0 - n1 - n0)
                        / ((n1 + n0) * (n1 + n0) * (n1 + n0 - 1.0))),
                 6) AS z
    FROM g ORDER BY event_type
    """,
)
def q_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test on the above/below-median daily
    binarization per type: too FEW runs means clumped regimes (the
    q_burst_hmm signal seen nonparametrically), too MANY means
    oscillation; |z| small means the i.i.d. assumption behind naive
    capacity models is at least not laughed out of the room.

    Exactness: the median is the lower order statistic by integer
    rank (no averaging), run/one counts are integers, z one fixed
    formula.  Scale: everything after the (type, day) aggregate is
    calendar-bounded; the rank and lag windows partition per type."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    wr = W.partitionBy("event_type").orderBy("y", "day")
    r = d.select(
        "event_type", "day", "y",
        F.row_number().over(wr).cast("long").alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("event_type"))
        .cast("long").alias("n"),
    )
    md = r.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rk") == F.expr("(n + 1) div 2"), F.col("y"))
        ).alias("med")
    )
    s = d.join(md, "event_type").select(
        "event_type", "day",
        (F.col("y") > F.col("med")).cast("int").alias("up"),
    )
    wd = W.partitionBy("event_type").orderBy("day")
    f = s.select(
        "event_type", "up",
        F.when(
            F.lag("up").over(wd).isNull()
            | (F.lag("up").over(wd) != F.col("up")),
            1,
        ).otherwise(0).alias("new_run"),
    )
    g = f.groupBy("event_type").agg(
        F.sum("new_run").cast("long").alias("runs"),
        F.sum("up").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("up")).cast("long").alias("n0"),
    )
    c = F.col
    mu = 2.0 * c("n1") * c("n0") / (c("n1") + c("n0")) + 1
    var = (
        2.0 * c("n1") * c("n0")
        * (2.0 * c("n1") * c("n0") - c("n1") - c("n0"))
        / (
            (c("n1") + c("n0"))
            * (c("n1") + c("n0"))
            * (c("n1") + c("n0") - 1.0)
        )
    )
    return g.select(
        "event_type", "runs", "n1", "n0",
        F.round((c("runs") - mu) / F.sqrt(var), 6).alias("z"),
    ).orderBy("event_type")


@register(
    "q_raster_drift",
    sql="""
    WITH li AS (SELECT CASE WHEN CAST(l_shipdate AS DATE)
                            < DATE '1998-07-01' THEN 0 ELSE 1 END
                           AS period,
                       least(greatest(CAST(floor(
                           (l_extendedprice - 900.0)
                           / ((105000.0 - 900.0) / 16)) AS INT), 0), 15)
                           AS bx,
                       least(greatest(CAST(floor(
                           (l_discount - 0.0) / (0.11 / 16)) AS INT),
                           0), 15) AS by
                FROM lineitem),
    c AS (SELECT period, bx, by, count(*) AS n FROM li GROUP BY 1, 2, 3),
    t AS (SELECT period, sum(n) AS tot FROM c GROUP BY 1),
    j AS (SELECT coalesce(a.bx, b.bx) AS bx, coalesce(a.by, b.by) AS by,
                 coalesce(a.n, 0) AS n0, coalesce(b.n, 0) AS n1,
                 t0.tot AS tot0, t1.tot AS tot1
          FROM (SELECT * FROM c WHERE period = 0) a
          FULL OUTER JOIN (SELECT * FROM c WHERE period = 1) b
            ON a.bx = b.bx AND a.by = b.by
          CROSS JOIN (SELECT tot FROM t WHERE period = 0) t0
          CROSS JOIN (SELECT tot FROM t WHERE period = 1) t1),
    p AS (SELECT bx, by, n0, n1,
                 (n0 + 0.5) / (tot0 + 128.0) AS p0,
                 (n1 + 0.5) / (tot1 + 128.0) AS p1
          FROM j),
    k AS (SELECT bx, by, n0, n1,
                 CAST(round((p1 - p0) * ln(p1 / p0) * 1e9) AS BIGINT)
                     AS psi_n
          FROM p),
    s AS (SELECT sum(psi_n) AS psi_total_n FROM k)
    SELECT k.bx, k.by, CAST(k.n0 AS BIGINT) AS n0,
           CAST(k.n1 AS BIGINT) AS n1,
           round(k.psi_n / 1e9, 6) AS psi_cell,
           round(s.psi_total_n / 1e9, 6) AS psi_total
    FROM k CROSS JOIN s
    ORDER BY k.bx, k.by
    """,
)
def q_raster_drift(spark, sf_dir):
    """2-D distribution drift between the two shipping periods on the
    (price, discount) canvas: per-cell PSI contributions with
    Laplace-smoothed cell shares (smoothing keeps cells that exist in
    only one period finite — those ARE the drift) — the raster
    family's answer to 'did the 2-D shape move', where q_psi watches
    one dimension and eyeballing two heatmaps doesn't quantify.

    Exactness: cell counts are integers on the same fixed 16x16
    binning both engines compute; each cell's (p1-p0)*ln(p1/p0) term
    nano-rounds before the sum.  Scale: the shuffle is bounded by the
    canvas (<= 2*16*16 keys) exactly like every raster; the period
    totals join broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    bx = F.least(
        F.greatest(
            F.floor(
                (F.col("l_extendedprice") - 900.0) / ((105000.0 - 900.0) / 16)
            ).cast("int"),
            F.lit(0),
        ),
        F.lit(15),
    )
    by = F.least(
        F.greatest(
            F.floor(F.col("l_discount") / (0.11 / 16)).cast("int"), F.lit(0)
        ),
        F.lit(15),
    )
    s = li.select(
        F.when(
            F.col("l_shipdate").cast("date") < F.lit("1998-07-01"), 0
        ).otherwise(1).alias("period"),
        bx.alias("bx"), by.alias("by"),
    )
    c = s.groupBy("period", "bx", "by").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("period").agg(F.sum("n").alias("tot"))
    a = c.filter(F.col("period") == 0).select(
        "bx", "by", F.col("n").alias("n0")
    )
    b = c.filter(F.col("period") == 1).select(
        F.col("bx").alias("bx1"), F.col("by").alias("by1"),
        F.col("n").alias("n1"),
    )
    t0 = t.filter(F.col("period") == 0).select(F.col("tot").alias("tot0"))
    t1 = t.filter(F.col("period") == 1).select(F.col("tot").alias("tot1"))
    j = (
        a.join(
            b,
            (F.col("bx") == F.col("bx1")) & (F.col("by") == F.col("by1")),
            "full_outer",
        )
        .select(
            F.coalesce("bx", "bx1").alias("bx"),
            F.coalesce("by", "by1").alias("by"),
            F.coalesce("n0", F.lit(0)).alias("n0"),
            F.coalesce("n1", F.lit(0)).alias("n1"),
        )
        .crossJoin(F.broadcast(t0))
        .crossJoin(F.broadcast(t1))
    )
    cc = F.col
    p0 = (cc("n0") + 0.5) / (cc("tot0") + 128.0)
    p1 = (cc("n1") + 0.5) / (cc("tot1") + 128.0)
    k = j.select(
        "bx", "by", "n0", "n1",
        F.round((p1 - p0) * F.log(p1 / p0) * F.lit(1e9))
        .cast("long").alias("psi_n"),
    )
    tot = k.agg(F.sum("psi_n").alias("psi_total_n"))
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            "bx", "by",
            cc("n0").cast("long").alias("n0"),
            cc("n1").cast("long").alias("n1"),
            F.round(cc("psi_n") / 1e9, 6).alias("psi_cell"),
            F.round(cc("psi_total_n") / 1e9, 6).alias("psi_total"),
        )
        .orderBy("bx", "by")
    )


@register(
    "q_page_hinkley",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    a AS (SELECT event_type, list(y ORDER BY day) AS ys,
                 CAST(count(*) AS BIGINT) AS n_days
          FROM d GROUP BY 1),
    f AS (SELECT event_type, n_days,
                 list_reduce(
                   list_prepend([CAST(0 AS BIGINT), 0, 0, 0, 0],
                                list_transform(ys, y -> [y])),
                   (a, x) -> [
                     a[1] + 1,
                     a[2] + x[1],
                     a[3] + CAST(round((x[1] - (a[2] + x[1])
                                        / CAST(a[1] + 1 AS DOUBLE) - 5.0)
                                       * 1e9) AS BIGINT),
                     least(a[4],
                           a[3] + CAST(round((x[1] - (a[2] + x[1])
                                              / CAST(a[1] + 1 AS DOUBLE)
                                              - 5.0) * 1e9) AS BIGINT)),
                     greatest(a[5],
                              (a[3] + CAST(round((x[1] - (a[2] + x[1])
                                                  / CAST(a[1] + 1 AS DOUBLE)
                                                  - 5.0) * 1e9) AS BIGINT))
                              - least(a[4],
                                      a[3] + CAST(round((x[1] - (a[2] + x[1])
                                                         / CAST(a[1] + 1
                                                                AS DOUBLE)
                                                         - 5.0) * 1e9)
                                                  AS BIGINT)))]
                 ) AS st
          FROM a)
    SELECT event_type, n_days,
           round(st[3] / 1e9, 6) AS cum_dev,
           round(st[5] / 1e9, 6) AS ph,
           CAST(CASE WHEN st[5] > 50000000000 THEN 1 ELSE 0 END AS INT)
               AS alarm
    FROM f ORDER BY event_type
    """,
)
def q_page_hinkley(spark, sf_dir):
    """Page-Hinkley upward-drift monitor per event type over daily
    counts: PH_t = max prefix of (cumulative deviation from the
    RUNNING mean, minus tolerance δ=5) minus its running minimum —
    the classic sequential change detector (Page '54) whose state is
    five numbers however long the stream runs (the stateful-
    streaming twin of q_changepoint's offline split).  Alarm at
    PH > λ=50.

    The recurrence needs the running mean INSIDE the fold, so the
    batch form is one calendar-bounded in-plan fold per type (the
    q_holt/q_dtw shape): state [t, Σy, cumdev_n, min_n, ph_n] as a
    5-long array, each deviation nano-rounded from the identical
    fixed float expression before entering the integer state —
    DuckDB replays the fold with the list-of-single-element-lists
    accumulator trick (acc type == element type)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    a = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "y"))),
            lambda s: s["y"],
        ).alias("ys"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    zero = F.lit(0).cast("long")
    init = F.array(zero, zero, zero, zero, zero)

    def step(acc, x):
        e = lambda i: F.element_at(acc, i)
        t1 = e(1) + 1
        s1 = e(2) + x
        devn = F.round(
            (x - s1 / t1.cast("double") - F.lit(5.0)) * 1e9
        ).cast("long")
        cum = e(3) + devn
        mn = F.least(e(4), cum)
        ph = F.greatest(e(5), cum - mn)
        return F.array(t1, s1, cum, mn, ph)

    f = a.select(
        "event_type", "n_days", F.aggregate("ys", init, step).alias("st")
    )
    return f.select(
        "event_type", "n_days",
        F.round(F.element_at("st", 3) / 1e9, 6).alias("cum_dev"),
        F.round(F.element_at("st", 5) / 1e9, 6).alias("ph"),
        (F.element_at("st", 5) > F.lit(50_000_000_000))
        .cast("int").alias("alarm"),
    ).orderBy("event_type")


@register(
    "q_shewhart",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS s,
                 CAST(sum(y * y) AS BIGINT) AS q
          FROM d GROUP BY 1),
    l AS (SELECT event_type, n, s, q,
                 s / CAST(n AS DOUBLE) AS mu,
                 sqrt((q - s * (s / CAST(n AS DOUBLE))) / (n - 1)) AS sd
          FROM g
          WHERE n > 1 AND q - s * (s / CAST(n AS DOUBLE)) > 0),
    zd AS (SELECT d.event_type, d.day, d.y, l.n, l.mu, l.sd,
                  CAST(round((abs(d.y - l.mu) / l.sd) * 1e9) AS BIGINT)
                      AS zn,
                  CASE WHEN d.y > l.mu + 3.0 * l.sd
                        OR d.y < l.mu - 3.0 * l.sd THEN 1 ELSE 0 END AS viol
           FROM d JOIN l USING (event_type)),
    agg AS (SELECT event_type,
                   CAST(max(n) AS BIGINT) AS n_days,
                   round(max(mu), 6) AS center,
                   round(max(mu + 3.0 * sd), 6) AS ucl,
                   round(max(mu - 3.0 * sd), 6) AS lcl,
                   CAST(sum(viol) AS BIGINT) AS n_violations,
                   coalesce(CAST(max(CASE WHEN viol = 1 THEN day END)
                                 AS VARCHAR), '') AS last_violation_day,
                   CAST(max(zn) AS BIGINT) AS max_zn
            FROM zd GROUP BY 1)
    SELECT agg.event_type, agg.n_days, agg.center, agg.ucl, agg.lcl,
           agg.n_violations, agg.last_violation_day,
           round(agg.max_zn / 1e9, 6) AS max_z,
           CAST(min(zd.day) AS VARCHAR) AS max_z_day
    FROM agg JOIN zd ON zd.event_type = agg.event_type
                    AND zd.zn = agg.max_zn
    GROUP BY 1, 2, 3, 4, 5, 6, 7, 8 ORDER BY agg.event_type
    """,
)
def q_shewhart(spark, sf_dir):
    """Shewhart individuals control chart per event type: center line
    and 3-sigma limits from the daily-count series, with the count
    and latest day of out-of-control points — the SPC classic that
    completes the monitoring family (CUSUM catches small persistent
    shifts, Page-Hinkley drifts, Shewhart single large excursions).

    Exactness: daily counts are integers, the per-type (n, Σy, Σy²)
    sufficient statistics are integers, μ/σ/limits are fixed float
    formulas over them, and each violation flag is the SAME
    float compare on both engines.  Scale: the (type, day) aggregate
    is the only data-sized stage; the limits join back by type
    (broadcast, k rows)."""
    from shadems_spark.operators.dedup import tracked_persist

    ev = load_table(spark, sf_dir, "events")
    # the (type, day) table feeds the limit fit AND the z/violation
    # join-back — persist so the events scan runs once (calendar-
    # bounded cache)
    d = tracked_persist(
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(F.count(F.lit(1)).cast("long").alias("y")),
        key="shewhart_daily",
    )
    c = F.col
    g = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(c("y") * c("y")).cast("long").alias("q"),
    )
    mu = c("s") / c("n").cast("double")
    sd = F.sqrt((c("q") - c("s") * (c("s") / c("n").cast("double"))) / (c("n") - 1))
    # a chart needs a spread estimate: drop types with a single active
    # day or constant counts (sd = 0/0 or 0 — the oracle drops the
    # same rows, and zn below would otherwise NaN/NULL-diverge)
    l = g.filter(
        (c("n") > 1)
        & (c("q") - c("s") * (c("s") / c("n").cast("double")) > 0)
    ).select(
        "event_type", "n", mu.alias("mu"), sd.alias("sd"),
    )
    viol = (c("y") > c("mu") + 3.0 * c("sd")) | (c("y") < c("mu") - 3.0 * c("sd"))
    # per-(type, day) z-score nano-int: max_z / max_z_day are real
    # values at ANY fixture (the violation columns are zero on
    # well-behaved data), so the oracle hash verifies the excursion
    # machinery, not just the limits
    zn = F.round((F.abs(c("y") - c("mu")) / c("sd")) * 1e9).cast("long")
    zd = d.join(F.broadcast(l), "event_type").select(
        "event_type", "day", "y", "n", "mu", "sd",
        zn.alias("zn"), viol.cast("int").alias("viol"),
    )
    agg = zd.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_days"),
        F.round(F.max("mu"), 6).alias("center"),
        F.round(F.max(c("mu") + 3.0 * c("sd")), 6).alias("ucl"),
        F.round(F.max(c("mu") - 3.0 * c("sd")), 6).alias("lcl"),
        F.sum("viol").cast("long").alias("n_violations"),
        F.coalesce(
            F.max(F.when(c("viol") == 1, c("day"))).cast("string"),
            F.lit(""),
        ).alias("last_violation_day"),
        F.max("zn").cast("long").alias("max_zn"),
    )
    return (
        agg.join(
            zd.select("event_type", c("zn").alias("max_zn"), "day"),
            ["event_type", "max_zn"],
        )
        .groupBy(
            "event_type", "n_days", "center", "ucl", "lcl",
            "n_violations", "last_violation_day",
            F.round(c("max_zn") / 1e9, 6).alias("max_z"),
        )
        .agg(F.min("day").cast("string").alias("max_z_day"))
        .orderBy("event_type")
    )


#: EWMA chart constants (Roberts '59; Montgomery SPC ch. 9):
#: smoothing lambda = 0.2, control width L = 2.7, and the derived
#: literals both engines share so every float product is identical:
#: (1-lambda)^2 = 0.64 per-step variance decay, and
#: lambda/(2-lambda) evaluated ONCE in Python so the same double
#: lands in the Column expression and the generated SQL.
_EWMA_L = 2.7
_EWMA_Q = 0.2 / 1.8

#: the fold's repeated sub-expressions (DuckDB text) — z', w' and the
#: time-varying half-width are each spelled once here and textually
#: repeated wherever the state update needs them (the q_page_hinkley
#: convention: list_reduce cannot bind intermediates).
_EWMAC_Z1 = (
    "CAST(round((0.2 * x[1] + 0.8 * (acc[2] / 1e9)) * 1e9) AS BIGINT)"
)
_EWMAC_W1 = "CAST(round(acc[3] * 0.64) AS BIGINT)"
_EWMAC_HW = (
    f"CAST(round(((2.7 * l.sd) * sqrt({_EWMA_Q!r} * (1.0 - "
    f"{_EWMAC_W1} / 1e9))) * 1e9) AS BIGINT)"
)
_EWMAC_VIOL = f"abs({_EWMAC_Z1} - l.mun) > {_EWMAC_HW}"

_EWMAC_SQL = f"""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS s,
                 CAST(sum(y * y) AS BIGINT) AS q
          FROM d GROUP BY 1),
    l AS (SELECT event_type,
                 s / CAST(n AS DOUBLE) AS mu,
                 sqrt((q - s * (s / CAST(n AS DOUBLE))) / (n - 1)) AS sd,
                 CAST(round((s / CAST(n AS DOUBLE)) * 1e9) AS BIGINT) AS mun
          FROM g
          WHERE n > 1 AND q - s * (s / CAST(n AS DOUBLE)) > 0),
    a AS (SELECT event_type, list(y ORDER BY day) AS ys,
                 list(CAST(day AS VARCHAR) ORDER BY day) AS days,
                 CAST(count(*) AS BIGINT) AS n_days
          FROM d GROUP BY 1),
    f AS (SELECT a.event_type, a.n_days, a.days, l.mu, l.sd,
                 list_reduce(
                   list_prepend([CAST(0 AS BIGINT), l.mun,
                                 CAST(1000000000 AS BIGINT),
                                 CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                                 CAST(-1000000000000000000 AS BIGINT)],
                                list_transform(a.ys, y -> [y])),
                   (acc, x) -> [
                     acc[1] + 1,
                     {_EWMAC_Z1},
                     {_EWMAC_W1},
                     acc[4] + CASE WHEN {_EWMAC_VIOL} THEN 1 ELSE 0 END,
                     CASE WHEN {_EWMAC_VIOL} THEN acc[1] + 1 ELSE acc[5] END,
                     greatest(acc[6],
                              abs({_EWMAC_Z1} - l.mun) - {_EWMAC_HW})]
                 ) AS st
          FROM a JOIN l USING (event_type))
    SELECT event_type, n_days,
           round(mu, 6) AS center,
           round(st[2] / 1e9, 6) AS ewma_final,
           round(mu + (2.7 * sd) * sqrt({_EWMA_Q!r}), 6) AS ucl_asym,
           round(mu - (2.7 * sd) * sqrt({_EWMA_Q!r}), 6) AS lcl_asym,
           CAST(st[4] AS BIGINT) AS n_violations,
           CASE WHEN st[5] > 0 THEN days[CAST(st[5] AS INT)]
                ELSE '' END AS last_violation_day,
           round(st[6] / 1e9, 6) AS max_margin
    FROM f ORDER BY event_type
"""


@register("q_ewma_control", sql=_EWMAC_SQL)
def q_ewma_control(spark, sf_dir):
    """EWMA control chart per event type over the ordered daily-count
    series (Roberts '59), with the TIME-VARYING limits
    mu +- L*sigma*sqrt(lambda/(2-lambda) * (1 - (1-lambda)^(2t))) —
    the small-shift monitor that completes the SPC family
    (Shewhart: single large excursions; CUSUM/Page-Hinkley:
    persistent shifts; EWMA: small drifts with a memory knob), and
    the one classical monitor the battery lacked (VERDICT r7 #6).

    Exactness (the q_sprt/q_page_hinkley integer-fold protocol): the
    fold state is six BIGINTs — [t, z_nano, (1-lambda)^(2t)_nano,
    n_violations, last_violation_t, max_margin_nano] — with every
    float step (the EWMA recursion, the 0.64 variance-decay power,
    the half-width incl. its sqrt) nano-rounded through IDENTICAL
    expressions on both engines before entering the state; the
    (1-lambda)^(2t) power is computed INSIDE the fold by repeated
    multiplication, so no engine pow() is ever called.  max_margin
    (max over t of |z_t - mu| - halfwidth_t, usually negative) is the
    always-valued companion the vacuity rule requires of the
    violation columns.  Scale: the (type, day) aggregate is the only
    data-sized stage; each fold is calendar-bounded."""
    from shadems_spark.operators.dedup import tracked_persist

    ev = load_table(spark, sf_dir, "events")
    d = tracked_persist(
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(F.count(F.lit(1)).cast("long").alias("y")),
        key="ewmac_daily",
    )
    c = F.col
    g = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(c("y") * c("y")).cast("long").alias("q"),
    )
    mu = c("s") / c("n").cast("double")
    l = g.filter(
        (c("n") > 1) & (c("q") - c("s") * (c("s") / c("n").cast("double")) > 0)
    ).select(
        "event_type",
        mu.alias("mu"),
        F.sqrt(
            (c("q") - c("s") * (c("s") / c("n").cast("double"))) / (c("n") - 1)
        ).alias("sd"),
        F.round(mu * 1e9).cast("long").alias("mun"),
    )
    a = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "y"))),
            lambda s: s["y"],
        ).alias("ys"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "y"))),
            lambda s: s["day"].cast("string"),
        ).alias("days"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    j = a.join(F.broadcast(l), "event_type")
    zero = F.lit(0).cast("long")
    init = F.array(
        zero,
        c("mun"),
        F.lit(1_000_000_000).cast("long"),
        zero,
        zero,
        F.lit(-1_000_000_000_000_000_000).cast("long"),
    )

    def step(acc, x):
        e = lambda i: F.element_at(acc, i)
        z1 = F.round(
            (F.lit(0.2) * x + F.lit(0.8) * (e(2) / F.lit(1e9))) * F.lit(1e9)
        ).cast("long")
        w1 = F.round(e(3) * F.lit(0.64)).cast("long")
        hw = F.round(
            (
                (F.lit(2.7) * c("sd"))
                * F.sqrt(
                    F.lit(_EWMA_Q) * (F.lit(1.0) - w1 / F.lit(1e9))
                )
            )
            * F.lit(1e9)
        ).cast("long")
        dev = F.abs(z1 - c("mun"))
        viol = dev > hw
        return F.array(
            e(1) + 1,
            z1,
            w1,
            e(4) + viol.cast("long"),
            F.when(viol, e(1) + 1).otherwise(e(5)),
            F.greatest(e(6), dev - hw),
        )

    f = j.select(
        "event_type", "n_days", "days", "mu", "sd",
        F.aggregate("ys", init, step).alias("st"),
    )
    # engine sqrt (IEEE correctly-rounded, same on DuckDB), NOT
    # Python's ** 0.5 (pow-based, not guaranteed identical)
    asym = (F.lit(2.7) * c("sd")) * F.sqrt(F.lit(_EWMA_Q))
    e = lambda i: F.element_at("st", i)
    return f.select(
        "event_type", "n_days",
        F.round("mu", 6).alias("center"),
        F.round(e(2) / 1e9, 6).alias("ewma_final"),
        F.round(c("mu") + asym, 6).alias("ucl_asym"),
        F.round(c("mu") - asym, 6).alias("lcl_asym"),
        e(4).cast("long").alias("n_violations"),
        F.when(e(5) > 0, F.element_at("days", e(5).cast("int")))
        .otherwise(F.lit("")).alias("last_violation_day"),
        F.round(e(6) / 1e9, 6).alias("max_margin"),
    ).orderBy("event_type")
