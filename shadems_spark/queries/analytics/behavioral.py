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




@register(
    "q_sessionize",
    sql="""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
               FROM events WHERE user_id % 11 = 0),
    g AS (SELECT *,
                 CASE WHEN ts_us - lag(ts_us) OVER
                          (PARTITION BY user_id ORDER BY ts_us, event_id)
                      > 1800000000 OR lag(ts_us) OVER
                          (PARTITION BY user_id ORDER BY ts_us, event_id)
                      IS NULL THEN 1 ELSE 0 END AS new_sess
          FROM e),
    s AS (SELECT user_id, event_id,
                 CAST(sum(new_sess) OVER
                     (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
          FROM g)
    SELECT user_id, session_no, count(*) AS n_events
    FROM s GROUP BY 1, 2
    """,
)
def q_sessionize(spark, sf_dir):
    """Batch sessionization with explicit session IDs (gaps-and-islands:
    a 30-minute silence starts a new session; running sum of the
    new-session flags numbers them).  Complements session_window (S3),
    which aggregates but never exposes the id.  Both windows share the
    per-user partition, so one shuffle serves the whole chain."""
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 11 == 0)
        .select("user_id", "event_id", F.expr("ts_ns div 1000").alias("ts_us"))
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    new_sess = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn(
        "session_no",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "q_funnel",
    sql="""
    WITH f AS (SELECT user_id,
                      min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
                      min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
                      min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
               FROM events GROUP BY user_id)
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
           CAST(sum(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
           CAST(sum(CASE WHEN t_view < t_click AND t_click < t_buy THEN 1 ELSE 0 END) AS BIGINT) AS step_buy
    FROM f
    """,
)
def q_funnel(spark, sf_dir):
    """Ordered-funnel analysis (view -> click -> purchase): earliest
    per-step timestamps per user in ONE conditional aggregate, then
    ordering comparisons — no self-joins, no per-step scans; the only
    shuffle is the per-user agg."""
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("ts_ns div 1000")
    step = lambda t: F.min(F.when(F.col("event_type") == t, us))
    f = ev.groupBy("user_id").agg(
        step("view").alias("t_view"),
        step("click").alias("t_click"),
        step("purchase").alias("t_buy"),
    )
    return f.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("t_view").isNotNull().cast("int")).cast("long").alias("step_view"),
        F.sum((F.col("t_view") < F.col("t_click")).cast("int")).cast("long").alias("step_click"),
        F.sum(
            ((F.col("t_view") < F.col("t_click")) & (F.col("t_click") < F.col("t_buy"))).cast("int")
        ).cast("long").alias("step_buy"),
    )


@register(
    "q_retention",
    sql="""
    WITH firsts AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
                    FROM events GROUP BY user_id),
    act AS (SELECT DISTINCT e.user_id, f.cohort,
                   date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS day_off
            FROM events e JOIN firsts f USING (user_id))
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort, day_off,
           count(*) AS n_active
    FROM act WHERE day_off <= 7 GROUP BY 1, 2
    """,
)
def q_retention(spark, sf_dir):
    """Cohort retention: users keyed by first-seen day, activity
    counted per (cohort, day-offset) for the first week.  The firsts
    table is per-user (broadcastable at dim scale); the distinct
    rides the same (user, day) shuffle as the join output."""
    ev = load_table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    act = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort",
            F.datediff("d", "cohort").alias("day_off"),
        )
        .distinct()
    )
    return (
        act.filter(F.col("day_off") <= 7)
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"), "day_off"
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "q_latency_bands",
    sql="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY 1
    """,
)
def q_latency_bands(spark, sf_dir):
    """Daily P50/P95/P99 bands over the event value stream — the SLO
    dashboard aggregate.  Exact interpolated percentiles per day key
    (both engines share the definition); at 100 TB the same plan swaps
    percentile for percentile_approx's t-digest without reshaping."""
    ev = load_table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    return ev.groupBy(F.date_format("d", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@register(
    "q_markov",
    sql="""
    WITH s AS (SELECT user_id, event_type, ts, event_id,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS nxt
               FROM events),
    t AS (SELECT event_type AS src, nxt AS dst, count(*) AS n
          FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
    r AS (SELECT src, CAST(sum(n) AS BIGINT) AS out_n FROM t GROUP BY 1)
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           round(n / CAST(out_n AS DOUBLE), 6) AS p
    FROM t JOIN r USING (src) ORDER BY src, dst
    """,
)
def q_markov(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (event-time order, event_id tie-break): the behavioral
    model behind next-action prediction and funnel simulation.
    Transition counts are exact integers from one lead() window per
    user; row-normalized probabilities are one fixed division.  The
    user-partitioned window is the only data-sized operation — the
    matrix itself is event-type² rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.withColumn("nxt", F.lead("event_type").over(w))
    t = (
        s.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    r = t.groupBy("src").agg(F.sum("n").alias("out_n"))
    return (
        t.join(F.broadcast(r), "src")
        .select(
            "src", "dst", F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("out_n").cast("double"), 6).alias("p"),
        )
        .orderBy("src", "dst")
    )


@register(
    "q_freq_pairs",
    sql="""
    WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    n AS (SELECT count(DISTINCT ok) AS n_orders FROM b),
    i AS (SELECT pk, count(*) AS s FROM b GROUP BY 1),
    ms AS (SELECT greatest(3, CAST(ceil(0.00002 * n_orders) AS BIGINT))
                      AS minsup FROM n),
    p AS (SELECT a.pk AS pa, c.pk AS pb, count(*) AS s
          FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
          GROUP BY 1, 2
          HAVING count(*) >= (SELECT minsup FROM ms))
    SELECT p.pa, p.pb, p.s AS pair_support,
           ia.s AS support_a, ib.s AS support_b,
           round(p.s / CAST(ia.s AS DOUBLE), 6) AS conf_a_to_b,
           round(p.s / CAST(ib.s AS DOUBLE), 6) AS conf_b_to_a,
           round(p.s * CAST(n_orders AS DOUBLE) / (ia.s * ib.s), 6) AS lift
    FROM p CROSS JOIN n
    JOIN i ia ON ia.pk = p.pa
    JOIN i ib ON ib.pk = p.pb
    ORDER BY lift DESC, pa, pb
    """,
)
def q_freq_pairs(spark, sf_dir):
    """Apriori frequent-pairs market-basket mining over lineitem
    baskets (Agrawal-Srikant VLDB'94): distinct (order, part) baskets
    -> item supports -> PRUNE to frequent items (downward closure: a
    pair with support >= minsup can only contain items with support
    >= minsup) -> within-basket pair self-join -> support/confidence/
    lift.  The oracle is the UNPRUNED brute definition, so the hash
    match proves the Apriori prune lossless (the q_ppjoin pattern).

    Exactness: support counts are integers; confidence and lift are
    one division each from integers, engine-exact at 6dp.  Scale:
    pair generation is O(k^2) per basket (k <= 13 here; bounded in
    retail schemas — cap or sample mega-baskets at 100 TB), the
    frequent-item table shrinks with minsup and is broadcast to both
    join sides, and the self-join shuffles on the basket key only —
    the classic distributed-Apriori shape; raise minsup with corpus
    size to keep the pair table sublinear."""
    # minsup is a FRACTION of baskets (floored at 3): an absolute
    # threshold lets the frequent-pair table grow with corpus
    # replication (the x10 probe measured 2 -> 1.2M rows at
    # minsup=3); fractional support restores the flat-output Apriori
    # contract.  The fraction is small (2e-5) because TPC-H baskets
    # are uniform-random — co-occurrence dilutes as the part catalog
    # grows with SF; real basket data concentrates instead.
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n = b.agg(F.count_distinct("ok").alias("n_orders"))
    ms = n.select(
        F.greatest(F.lit(3), F.ceil(0.00002 * F.col("n_orders")))
        .cast("long").alias("minsup")
    )
    i = b.groupBy("pk").agg(F.count(F.lit(1)).alias("s"))
    fi = (
        i.crossJoin(F.broadcast(ms))
        .filter(F.col("s") >= F.col("minsup"))
        .select("pk")
    )
    fb = b.join(F.broadcast(fi), "pk")
    p = (
        fb.alias("a")
        .join(fb.alias("c"), "ok")
        .filter(F.col("a.pk") < F.col("c.pk"))
        .groupBy(F.col("a.pk").alias("pa"), F.col("c.pk").alias("pb"))
        .agg(F.count(F.lit(1)).alias("s"))
        .crossJoin(F.broadcast(ms))
        .filter(F.col("s") >= F.col("minsup"))
        .drop("minsup")
    )
    ia = i.select(F.col("pk").alias("pa"), F.col("s").alias("support_a"))
    ib = i.select(F.col("pk").alias("pb"), F.col("s").alias("support_b"))
    return (
        p.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .crossJoin(F.broadcast(n))
        .select(
            "pa", "pb",
            F.col("s").alias("pair_support"),
            "support_a", "support_b",
            F.round(F.col("s") / F.col("support_a").cast("double"), 6)
            .alias("conf_a_to_b"),
            F.round(F.col("s") / F.col("support_b").cast("double"), 6)
            .alias("conf_b_to_a"),
            F.round(
                F.col("s") * F.col("n_orders").cast("double")
                / (F.col("support_a") * F.col("support_b")), 6
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "pa", "pb")
    )


@register(
    "q_rfm",
    sql="""
    WITH cust AS (
        SELECT o_custkey,
               max(CAST(o_orderdate AS DATE)) AS last_order,
               count(*) AS freq,
               CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    a AS (SELECT max(last_order) AS anchor FROM cust),
    s AS (SELECT datediff('day', last_order, anchor) AS recency_days,
                 freq, cents,
                 ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
                 ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f_score,
                 ntile(5) OVER (ORDER BY cents DESC, o_custkey) AS m_score
          FROM cust CROSS JOIN a)
    SELECT r_score, f_score, m_score,
           CASE WHEN r_score <= 2 AND f_score <= 2 AND m_score <= 2
                THEN 'champion'
                WHEN r_score >= 4 AND m_score <= 2 THEN 'at_risk_spender'
                WHEN r_score >= 4 AND f_score >= 4 THEN 'hibernating'
                ELSE 'core' END AS segment,
           count(*) AS customers,
           CAST(max(recency_days) AS BIGINT) AS max_recency_days,
           CAST(sum(freq) AS BIGINT) AS orders_total,
           CAST(sum(cents) AS BIGINT) AS monetary_cents
    FROM s GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3
    """,
)
def q_rfm(spark, sf_dir):
    """RFM (recency/frequency/monetary) customer segmentation — the
    classic retention-marketing cube (Hughes 1994): per-customer last
    order, order count, lifetime spend -> quintile scores (1 = best)
    -> 5x5x5 segment grid with named action buckets.

    Exactness: spend is folded to INTEGER cents before any ordering
    or re-aggregation (o_totalprice values are exact cents, so the
    float sum is within 1e-9 of an integer and round() recovers it
    exactly — no float-order sensitivity anywhere); ntile runs over a
    total order (metric, custkey), so bucket assignment is
    deterministic and both engines share the floor-based ntile fill.

    Scale (the VERDICT r5 #1 production path): the per-customer
    aggregate is the only data-sized shuffle; each quintile score
    rides the TWO-PHASE exact ntile (operators/profile.global_ntile:
    range-partitioned local rank + broadcast offsets + the closed-
    form tile fill) — bit-identical to the global-window ntile at any
    customer cardinality, with NO single-partition stage.  Three
    range shuffles of the customer table replace the three
    single-partition sorts."""
    from shadems_spark.operators.profile import global_ntile

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents"),
    )
    a = cust.agg(F.max("last_order").alias("anchor"))
    # NOTE (r11 measurement): the "ReuseExchange dedupes the identical
    # subtree" claim below does NOT hold in the static plan — per-
    # branch column pruning makes each quintile's sample/window/totals
    # subtree textually different (plans/r11/q_rfm_before.txt: 14
    # parquet scans, zero ReusedExchange).  An explicit persist of
    # this aggregate was A/B-measured SLOWER at sf0.1 (2.95 -> 5.0 s
    # interleaved: the cache-fill barrier serializes branches that ran
    # concurrently); past ~256 MB the trade inverts and the two-phase
    # operators persist their input themselves (profile._share).
    base = cust.repartition("o_custkey")

    def quintile(metric: str, out: str):
        slim = base.select("o_custkey", metric)
        return global_ntile(
            slim, 5, [F.col(metric).desc(), "o_custkey"], out,
            bucket_key=F.col(metric), bucket_desc=True,
        ).select("o_custkey", out)

    scored = (
        base.join(quintile("last_order", "r_score"), "o_custkey")
        .join(quintile("freq", "f_score"), "o_custkey")
        .join(quintile("cents", "m_score"), "o_custkey")
    )
    s = scored.crossJoin(F.broadcast(a)).select(
        F.datediff("anchor", "last_order").alias("recency_days"),
        "freq", "cents", "r_score", "f_score", "m_score",
    )
    seg = (
        F.when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2)
            & (F.col("m_score") <= 2),
            "champion",
        )
        .when((F.col("r_score") >= 4) & (F.col("m_score") <= 2), "at_risk_spender")
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "hibernating")
        .otherwise("core")
    )
    return (
        s.groupBy("r_score", "f_score", "m_score", seg.alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.max("recency_days").cast("long").alias("max_recency_days"),
            F.sum("freq").alias("orders_total"),
            F.sum("cents").alias("monetary_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "q_attribution",
    sql="""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
                      CAST(round(coalesce(value, 0) * 1000000000.0) AS BIGINT)
                          AS v_nano
               FROM events
               WHERE event_type IN ('click', 'view', 'purchase')),
    w AS (SELECT user_id, event_type, v_nano,
                 last_value(CASE WHEN event_type IN ('click', 'view')
                                 THEN event_type END IGNORE NULLS)
                     OVER (PARTITION BY user_id
                           ORDER BY ts_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS touch
          FROM e),
    c AS (SELECT coalesce(touch, 'none') AS touch_type,
                 count(*) AS n_conversions,
                 sum(v_nano) AS sv
          FROM w WHERE event_type = 'purchase' GROUP BY 1)
    SELECT touch_type, CAST(n_conversions AS BIGINT) AS n_conversions,
           round(sv / 1000000000.0, 6) AS attributed_value
    FROM c ORDER BY touch_type
    """,
)
def q_attribution(spark, sf_dir):
    """Last-touch revenue attribution: each purchase's value is
    credited to the user's most recent PRIOR click or view — the
    marketing-analytics workhorse beside q_funnel (ordered steps)
    and q_sessionize; 'none' rows are direct conversions with no
    preceding touch.

    Shape: ONE per-user window ordered by (ts, event_id) with a
    conditional last_value(IGNORE NULLS) over the preceding frame —
    the standard streaming-compatible attribution plan (no self-join
    of conversions to touches; state per user is one value).  The
    purchase values are nano-int rounded before the group sum.
    Scale: the window shuffles once on user_id (millions of small
    per-user partitions — the healthy high-cardinality window case),
    then a 3-key aggregate; at 100 TB this is exactly the
    sessionization shuffle shape, and the same plan runs under
    transformWithState for continuous attribution."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    e = ev.select(
        "user_id", "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
        "event_type",
        F.round(F.coalesce("value", F.lit(0)) * 1000000000.0)
        .cast("long").alias("v_nano"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = e.select(
        "event_type", "v_nano",
        F.last(
            F.when(
                F.col("event_type").isin("click", "view"), F.col("event_type")
            ),
            ignorenulls=True,
        ).over(w).alias("touch"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum("v_nano").alias("sv"),
        )
        .select(
            "touch_type",
            F.col("n_conversions").cast("long").alias("n_conversions"),
            F.round(F.col("sv") / 1000000000.0, 6).alias("attributed_value"),
        )
        .orderBy("touch_type")
    )


_SKY_SQL = """
    WITH pr AS (SELECT round(o_totalprice, 2) AS p,
                       datediff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS d_ep
                FROM orders),
    cand AS (SELECT p, CAST(max(d_ep) AS BIGINT) AS d FROM pr GROUP BY 1),
    m AS (SELECT p, d,
                 max(d) OVER (ORDER BY p
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS m_lt
          FROM cand),
    sky AS (SELECT p, d FROM m WHERE m_lt IS NULL OR m_lt < d),
    cnt AS (SELECT p, d_ep AS d, count(*) AS n FROM pr GROUP BY 1, 2)
    SELECT sky.p AS price,
           CAST(DATE '1970-01-01' + INTERVAL (sky.d) DAY AS DATE) AS day,
           CAST(cnt.n AS BIGINT) AS n_at_point
    FROM sky JOIN cnt ON sky.p = cnt.p AND sky.d = cnt.d
    ORDER BY 1
"""


@register("q_skyline", sql=_SKY_SQL)
def q_skyline(spark, sf_dir):
    """2-D skyline (Pareto front) of orders under (minimize price,
    maximize recency) — the classic dominance operator (Borzsony-
    Kossmann-Stocker ICDE'01): an order point survives iff nothing is
    both cheaper-or-equal and at-least-as-recent (one strict).  The
    result is the Pareto staircase (cheaper survivors are strictly
    older, pricier ones strictly more recent), with
    the multiplicity of each surviving (price, day) point attached.

    2-D reduction: collapse to per-distinct-price max-recency
    candidates (same-price points with smaller d are dominated by
    their own group max; equal (p, d) duplicates merge into one
    multiplicity row), then a point survives iff the EXCLUSIVE prefix
    max of recency over all strictly-cheaper prices is below its own
    — i.e. skyline = one distributed exclusive max-scan
    (operators/profile.global_cummax, the two-phase value-cut shape:
    no single-partition window even though distinct prices grow
    linearly with the corpus).

    Candidate diet (VERDICT r6 #2): the corpus is never shuffled.  A
    broadcast-only dominance pre-prune (profile.prefix_max_prune —
    bucket-level exclusive prefix max of recency over cheaper price
    buckets, applied map-side) cuts the scan to staircase candidates
    BEFORE the per-price groupBy, so both the distinct-price
    aggregate and the exact two-phase max-scan shuffle survivors
    only; the multiplicity count then broadcast-joins the tiny
    skyline back onto the scan and aggregates just the matching
    rows.  Shuffled rows ~ candidates + skyline, not ~ 2x corpus.

    Exactness: prices pre-rounded to cents (the cardinality-bounding
    pre-round is NOT needed for correctness here — the scan is
    two-phase — but keeps float equality grouping deterministic);
    recency is an epoch-day integer; the dominance test is pure
    integer/rounded-double comparison; the pre-prune is lossless by
    the induction in its docstring."""
    from shadems_spark.operators.profile import global_cummax, prefix_max_prune

    o = load_table(spark, sf_dir, "orders")
    pr = o.select(
        F.round("o_totalprice", 2).alias("p"),
        F.unix_date(F.col("o_orderdate").cast("date")).cast("long").alias(
            "d_ep"
        ),
    )
    cand = (
        prefix_max_prune(pr, "p", "d_ep")
        .groupBy("p")
        .agg(F.max("d_ep").cast("long").alias("d"))
    )
    sky = global_cummax(cand, ["p"], "d", "m_lt").filter(
        F.col("m_lt").isNull() | (F.col("m_lt") < F.col("d"))
    )
    skp = sky.select(F.col("p").alias("sp"), F.col("d").alias("sd"))
    cnt = (
        pr.join(
            F.broadcast(skp),
            (F.col("p") == F.col("sp")) & (F.col("d_ep") == F.col("sd")),
        )
        .groupBy("sp", "sd")
        .agg(F.count(F.lit(1)).cast("long").alias("n_at_point"))
    )
    return cnt.select(
        F.col("sp").alias("price"),
        F.date_add(
            F.lit("1970-01-01").cast("date"), F.col("sd").cast("int")
        ).alias("day"),
        "n_at_point",
    ).orderBy("price")


_MA_SWEEPS = 12


def _ma_sql(sweeps: int = _MA_SWEEPS) -> str:
    """Unrolled DuckDB replay of the Markov removal-effect solve:
    the same journey/transition CTEs, then `sweeps` value-iteration
    steps for the base chain (b1..bN) and the per-channel removal
    chains (r1..rN, channel as a data dimension) with every step's
    per-edge contribution round()ed to a nano int before the sum —
    bit-parity with the engine's HOF fold."""
    head = """
    WITH e AS (SELECT user_id, event_type, ts, event_id,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events),
    fp AS (SELECT user_id, min(rn) AS prn FROM e
           WHERE event_type = 'purchase' GROUP BY 1),
    j AS (SELECT e.user_id, e.event_type, e.rn
          FROM e LEFT JOIN fp USING (user_id)
          WHERE fp.prn IS NULL OR e.rn <= fp.prn),
    j2 AS (SELECT user_id, event_type, rn,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY rn) AS nxt
           FROM j),
    trans AS (
      SELECT event_type AS s, coalesce(nxt, 'NULL') AS t
      FROM j2 WHERE event_type != 'purchase'
      UNION ALL
      SELECT 'START' AS s, event_type AS t FROM j2 WHERE rn = 1),
    cnts AS (SELECT s, t, count(*) AS cnt FROM trans GROUP BY 1, 2),
    outd AS (SELECT s, sum(cnt) AS out_n FROM cnts GROUP BY 1),
    mat AS MATERIALIZED (SELECT c.s, c.t, c.cnt, o.out_n
            FROM cnts c JOIN outd o USING (s) WHERE c.t != 'NULL'),
    states AS (SELECT DISTINCT s FROM mat),
    chans AS (SELECT s AS ch FROM states WHERE s != 'START'),
    b0 AS (SELECT s, CAST(0 AS BIGINT) AS p FROM states),
    r0 AS (SELECT c.ch, s.s, CAST(0 AS BIGINT) AS p
           FROM chans c CROSS JOIN states s)"""
    parts = [head]
    for k in range(1, sweeps + 1):
        parts.append(f""",
    b{k} AS (SELECT m.s,
      CAST(sum(round(m.cnt * (CASE WHEN m.t = 'purchase'
                                   THEN 1000000000
                                   ELSE coalesce(p.p, 0) END)
                     / m.out_n)) AS BIGINT) AS p
      FROM mat m LEFT JOIN b{k - 1} p ON p.s = m.t GROUP BY m.s),
    r{k} AS (SELECT c.ch, m.s,
      CAST(sum(round(m.cnt * (CASE WHEN m.t = 'purchase'
                                   THEN 1000000000
                                   WHEN m.t = c.ch THEN 0
                                   ELSE coalesce(p.p, 0) END)
                     / m.out_n)) AS BIGINT) AS p
      FROM chans c JOIN mat m ON true
      LEFT JOIN r{k - 1} p ON p.ch = c.ch AND p.s = m.t
      GROUP BY c.ch, m.s)""")
    parts.append(f""",
    base AS (SELECT p AS base_n FROM b{sweeps} WHERE s = 'START'),
    rem AS (SELECT ch, p AS removed_n FROM r{sweeps} WHERE s = 'START'),
    re AS (SELECT ch AS channel, base_n, removed_n,
                  greatest(base_n - removed_n, 0) AS re_nano
           FROM rem CROSS JOIN base),
    tt AS (SELECT sum(re_nano) AS re_tot FROM re)
    SELECT channel,
           round(base_n / 1e9, 6) AS base_conv,
           round(removed_n / 1e9, 6) AS removed_conv,
           CAST(re_nano AS BIGINT) AS re_nano,
           CASE WHEN tt.re_tot > 0
                THEN round(re_nano / CAST(tt.re_tot AS DOUBLE), 6)
           END AS share
    FROM re CROSS JOIN tt ORDER BY channel""")
    return "".join(parts)


@register("q_markov_attribution", sql=_ma_sql())
def q_markov_attribution(spark, sf_dir):
    """Markov removal-effect attribution (Anderl et al. 2016 — the
    data-driven successor to q_attribution's last-touch rule): model
    per-user journeys START -> events -> first purchase (absorbing) /
    NULL (journey end), then each channel's credit is its REMOVAL
    EFFECT — how much the absorption (conversion) probability drops
    when all mass entering that channel is redirected to NULL.
    Shares normalize the removal effects over channels.

    The absorption probability is 12 fixed value-iteration sweeps of
    p(s) <- sum_t P(s, t) * p(t) with p(purchase) = 1 (the pagerank
    fixed-sweep protocol); removing channel c is exactly "force
    p(c) = 0 in every sweep".  Every per-edge contribution
    round(cnt * p_t / out) is a nano int BEFORE the sum, so sweeps
    are engine/layout-exact and the unrolled-CTE oracle (_ma_sql)
    hash-matches.

    Scale shape: journeys/transitions are per-user windows (keyed,
    data-sized — the only heavy stage); the matrix collapses to
    event-type^2 rows gathered into ONE in-plan row, and ALL 12x5
    sweep evaluations run as higher-order-function folds inside a
    single projection over that row — no per-iteration shuffles, no
    driver-side solve."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select("user_id", "event_type", "ts", "event_id").withColumn(
        "rn", F.row_number().over(w)
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    j = e.join(fp, "user_id", "left").filter(
        F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
    )
    w2 = Window.partitionBy("user_id").orderBy("rn")
    j2 = j.withColumn("nxt", F.lead("event_type").over(w2))
    steps = j2.filter(F.col("event_type") != "purchase").select(
        F.col("event_type").alias("s"),
        F.coalesce("nxt", F.lit("NULL")).alias("t"),
    )
    starts = j2.filter(F.col("rn") == 1).select(
        F.lit("START").alias("s"), F.col("event_type").alias("t")
    )
    counts = (
        steps.unionByName(starts)
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = counts.groupBy("s").agg(F.sum("cnt").alias("out_n"))
    mat = counts.filter(F.col("t") != "NULL").join(F.broadcast(out), "s")
    one = mat.agg(
        F.sort_array(
            F.collect_list(F.struct("s", "t", "cnt", "out_n"))
        ).alias("m"),
        F.array_sort(F.collect_set("s")).alias("states"),
    )

    zero = F.lit(0).cast("long")

    def p_of(acc, t, ch):
        base = F.when(t == F.lit("purchase"), F.lit(10**9).cast("long"))
        if ch is not None:
            base = base.when(t == ch, zero)
        return base.otherwise(F.coalesce(F.element_at(acc, t), zero))

    def solve(ch):
        init = F.map_from_arrays(
            F.col("states"), F.transform(F.col("states"), lambda s: zero)
        )

        def step(acc, _):
            vals = F.transform(
                F.col("states"),
                lambda s: F.aggregate(
                    F.filter(F.col("m"), lambda m: m["s"] == s),
                    zero,
                    lambda a, m: a
                    + F.round(
                        m["cnt"] * p_of(acc, m["t"], ch) / m["out_n"]
                    ).cast("long"),
                ),
            )
            return F.map_from_arrays(F.col("states"), vals)

        final = F.aggregate(
            F.sequence(F.lit(1), F.lit(_MA_SWEEPS)), init, step
        )
        return F.coalesce(F.element_at(final, F.lit("START")), zero)

    row = one.select(
        F.explode(F.array_remove("states", "START")).alias("channel"),
        "m", "states",
    )
    from shadems_spark.operators.exprcache import memo

    sc = row.select(
        "channel",
        memo(("ma_base", _MA_SWEEPS), lambda: solve(None).alias("base_n")),
        memo(
            ("ma_removed", _MA_SWEEPS),
            lambda: solve(F.col("channel")).alias("removed_n"),
        ),
    ).withColumn(
        "re_nano",
        F.greatest(F.col("base_n") - F.col("removed_n"), zero),
    )
    tt = sc.agg(F.sum("re_nano").alias("re_tot"))
    return (
        sc.crossJoin(F.broadcast(tt))
        .select(
            "channel",
            F.round(F.col("base_n") / F.lit(1e9), 6).alias("base_conv"),
            F.round(F.col("removed_n") / F.lit(1e9), 6).alias(
                "removed_conv"
            ),
            F.col("re_nano").cast("long").alias("re_nano"),
            F.when(
                F.col("re_tot") > 0,
                F.round(
                    F.col("re_nano") / F.col("re_tot").cast("double"), 6
                ),
            ).alias("share"),
        )
        .orderBy("channel")
    )


_SHAP_FACT = [(0, 1), (1, 1), (2, 2), (3, 6), (4, 24), (5, 120),
              (6, 720), (7, 5040), (8, 40320)]

_SHAP_SQL = f"""
    WITH e AS (SELECT user_id, event_type, ts, event_id,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events),
    fp AS (SELECT user_id, min(rn) AS prn FROM e
           WHERE event_type = 'purchase' GROUP BY 1),
    j AS (SELECT e.user_id, e.event_type, e.rn
          FROM e LEFT JOIN fp USING (user_id)
          WHERE fp.prn IS NULL OR e.rn <= fp.prn),
    users AS (SELECT user_id,
                     max(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS conv
              FROM j GROUP BY 1),
    touched AS (SELECT DISTINCT user_id, event_type
                FROM j WHERE event_type != 'purchase'),
    tb AS (SELECT event_type,
                  CAST(row_number() OVER (ORDER BY event_type) - 1 AS INT)
                      AS b
           FROM (SELECT DISTINCT event_type FROM touched)),
    kk AS (SELECT count(*) AS k FROM tb),
    um AS (SELECT t.user_id, bit_or(1 << tb.b) AS mask
           FROM touched t JOIN tb USING (event_type) GROUP BY 1),
    mk AS (SELECT coalesce(um.mask, 0) AS mask, u.conv
           FROM users u LEFT JOIN um USING (user_id)),
    magg AS MATERIALIZED (SELECT mask, count(*) AS n, sum(conv) AS nc
                          FROM mk GROUP BY 1),
    subs AS (SELECT unnest(range(0, (SELECT 1 << k FROM kk))) AS s),
    v AS MATERIALIZED (
      SELECT s.s,
             CASE WHEN coalesce(sum(m.n), 0) > 0
                  THEN CAST(round(1e9 * sum(m.nc) / sum(m.n)) AS BIGINT)
                  ELSE 0 END AS v
      FROM subs s LEFT JOIN magg m ON (m.mask & s.s) = m.mask
      GROUP BY s.s),
    fct AS (SELECT * FROM (VALUES
            {", ".join(f"({n}, {f})" for n, f in _SHAP_FACT)}) AS t(n, v)),
    con AS (SELECT c.event_type AS channel,
                   CAST(sum(f1.v * f2.v * (vc.v - vs.v)) AS BIGINT) AS num
            FROM tb c
            JOIN v vs ON (vs.s & (1 << c.b)) = 0
            JOIN v vc ON vc.s = (vs.s | (1 << c.b))
            JOIN fct f1 ON f1.n = bit_count(vs.s)
            JOIN fct f2 ON f2.n = (SELECT k FROM kk) - 1 - bit_count(vs.s)
            GROUP BY 1),
    tot AS (SELECT sum(num) AS t FROM con),
    fk AS (SELECT v AS fkv FROM fct WHERE n = (SELECT k FROM kk))
    SELECT channel,
           CAST(num AS BIGINT) AS num_nano,
           round(num / fkv / 1e9, 6) AS shapley,
           CASE WHEN tot.t != 0
                THEN round(num / CAST(tot.t AS DOUBLE), 6)
           END AS share
    FROM con CROSS JOIN fk CROSS JOIN tot ORDER BY channel
"""


@register("q_shapley_attribution", sql=_SHAP_SQL)
def q_shapley_attribution(spark, sf_dir):
    """Shapley-value channel attribution (the game-theoretic twin of
    q_markov_attribution — together the two canonical data-driven
    attribution models): the coalition value v(S) is the conversion
    rate of journeys whose touched-channel set is CONTAINED in S, and
    each channel's credit is its exact Shapley value
    sum_S |S|! (k-1-|S|)! / k! * (v(S+c) - v(S)).

    Exactness: v(S) is nano-int-rounded from exact conversion/user
    counts; Shapley numerators are pure BIGINT sums of
    fact*fact*(delta-v) terms (|num| <= 8! * 1e9 * 2^k — inside long
    for the k <= 8 contract this query documents); the two divisions
    (k!, 1e9) happen once at the end.  The efficiency law
    sum shapley = v(full) - v(empty) is pinned in tests.

    Scale shape: journeys/touch-sets are per-user keyed aggregates
    (the only data-sized stages); everything after runs on <= 2^k
    coalition masks folded in-plan (broadcast one-row tables) — no
    driver-side solve, no per-coalition scan of the data (the naive
    formulation rescans per coalition; the mask aggregate + subset
    zeta-sum gets all 2^k values from ONE pass)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select("user_id", "event_type", "ts", "event_id").withColumn(
        "rn", F.row_number().over(w)
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    j = e.join(fp, "user_id", "left").filter(
        F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
    )
    users = j.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    touched = (
        j.filter(F.col("event_type") != "purchase")
        .select("user_id", "event_type")
        .distinct()
    )
    # channel bit-index over the types-sized distinct table via the
    # broadcast triangle join — window-free (VERDICT r7 #5)
    from shadems_spark.operators.profile import triangle_rank

    tb = (
        triangle_rank(
            touched.select("event_type").distinct(), ["event_type"], out="__trk"
        )
        .withColumn("b", (F.col("__trk") - 1).cast("int"))
        .drop("__trk")
    )
    um = (
        touched.join(F.broadcast(tb), "event_type")
        .groupBy("user_id")
        .agg(F.bit_or(F.expr("shiftleft(1, b)")).alias("mask"))
    )
    mk = users.join(um, "user_id", "left").select(
        F.coalesce("mask", F.lit(0)).alias("mask"), "conv"
    )
    magg = mk.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("nc")
    )
    chs = tb.agg(
        F.sort_array(F.collect_list(F.struct("event_type", "b"))).alias(
            "chs"
        )
    )
    one = magg.agg(
        F.sort_array(F.collect_list(F.struct("mask", "n", "nc"))).alias("ms")
    ).crossJoin(F.broadcast(chs))

    from shadems_spark.operators.exprcache import memo

    zero = F.lit(0).cast("long")

    def fact(c):
        e_ = F.when(c == 0, F.lit(1).cast("long"))
        for n, f in _SHAP_FACT[1:]:
            e_ = e_.when(c == n, F.lit(f).cast("long"))
        return e_

    def _build_vmap():
        subsets = F.expr("sequence(0, shiftleft(1, size(chs)) - 1)")
        return F.map_from_entries(
            F.transform(
                subsets,
                lambda s: F.struct(
                    s.alias("k"),
                    F.aggregate(
                        F.filter(
                            F.col("ms"),
                            lambda m: m["mask"].bitwiseAND(s) == m["mask"],
                        ),
                        F.struct(zero.alias("n"), zero.alias("nc")),
                        lambda a, m: F.struct(
                            (a["n"] + m["n"]).alias("n"),
                            (a["nc"] + m["nc"]).alias("nc"),
                        ),
                        lambda a: F.when(
                            a["n"] > 0,
                            F.round(
                                F.lit(1e9) * a["nc"] / a["n"]
                            ).cast("long"),
                        ).otherwise(zero),
                    ).alias("v"),
                ),
            )
        ).alias("vm")

    row = one.select(
        F.explode("chs").alias("ch"), "ms", "chs",
        memo(("shap_vmap",), _build_vmap),
    )

    def _build_score():
        k = F.size("chs")
        bit = F.expr("shiftleft(1, ch.b)")
        num = F.aggregate(
            F.filter(
                F.expr("sequence(0, shiftleft(1, size(chs)) - 1)"),
                lambda s: s.bitwiseAND(bit) == 0,
            ),
            zero,
            lambda a, s: a
            + fact(F.bit_count(s))
            * fact(k - 1 - F.bit_count(s))
            * (
                F.element_at(F.col("vm"), s.bitwiseOR(bit))
                - F.element_at(F.col("vm"), s)
            ),
        )
        return [
            F.col("ch")["event_type"].alias("channel"),
            num.cast("long").alias("num_nano"),
            F.round(num / fact(k) / F.lit(1e9), 6).alias("shapley"),
        ]

    sc = row.select(*memo(("shap_score",), _build_score))
    tot = sc.agg(F.sum("num_nano").alias("t"))
    return (
        sc.crossJoin(F.broadcast(tot))
        .select(
            "channel", "num_nano", "shapley",
            F.when(
                F.col("t") != 0,
                F.round(F.col("num_nano") / F.col("t").cast("double"), 6),
            ).alias("share"),
        )
        .orderBy("channel")
    )


@register(
    "q_path_analysis",
    sql="""
    WITH e AS (SELECT user_id, event_id, event_type,
                      epoch_us(ts) AS ts_us
               FROM events),
    g AS (SELECT *,
                 CASE WHEN ts_us - lag(ts_us) OVER
                          (PARTITION BY user_id ORDER BY ts_us, event_id)
                      > 1800000000 OR lag(ts_us) OVER
                          (PARTITION BY user_id ORDER BY ts_us, event_id)
                      IS NULL THEN 1 ELSE 0 END AS new_sess
          FROM e),
    s AS (SELECT *,
                 sum(new_sess) OVER (PARTITION BY user_id
                                     ORDER BY ts_us, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess
          FROM g),
    t AS (SELECT event_type AS t1,
                 lead(event_type, 1) OVER w AS t2,
                 lead(event_type, 2) OVER w AS t3
          FROM s
          WINDOW w AS (PARTITION BY user_id, sess
                       ORDER BY ts_us, event_id)),
    p AS (SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS cnt
          FROM t WHERE t3 IS NOT NULL GROUP BY 1)
    SELECT path, CAST(cnt AS BIGINT) AS cnt
    FROM p ORDER BY cnt DESC, path LIMIT 20
    """,
)
def q_path_analysis(spark, sf_dir):
    """Top-20 within-session event-type trigrams (user-path mining):
    sessionize with the 30-minute gap rule (q_sessionize's gaps-and-
    islands), slide a 3-step window down each session with lead(),
    and count path frequencies — the "what do users do next"
    exploration behind funnel design, feeding q_markov with its
    higher-order context check.

    Exactness: counts are integers; the global top-20 breaks ties on
    the path string.  Scale: all windows partition by user (then by
    session) — bounded per-key sequences; path counts map-side
    combine to a |types|^3-bounded key space and the final top-20
    compiles to TakeOrderedAndProject, never a global sort of the
    counts table."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    wu = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(wu)
    s = ev.withColumn(
        "sess",
        F.sum(
            F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
        ).over(wu.rowsBetween(W.unboundedPreceding, 0)),
    )
    ws = W.partitionBy("user_id", "sess").orderBy("ts_us", "event_id")
    t = s.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(ws).alias("t2"),
        F.lead("event_type", 2).over(ws).alias("t3"),
    )
    p = (
        t.filter(F.col("t3").isNotNull())
        .select(F.concat_ws(">", "t1", "t2", "t3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return p.orderBy(F.desc("cnt"), "path").limit(20)


@register(
    "q_apriori",
    sql="""
    WITH b AS (SELECT DISTINCT l_orderkey,
                      l_partkey % 50 AS item
               FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    ic AS (SELECT item, count(*) AS n_item FROM b GROUP BY 1),
    p AS (SELECT a.item AS item_a, c.item AS item_b, count(*) AS n_pair
          FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                           AND a.item < c.item
          GROUP BY 1, 2
          HAVING count(*) >= 5),
    r AS (SELECT p.item_a, p.item_b, p.n_pair,
                 ia.n_item AS n_a, ib.n_item AS n_b, n.n_orders,
                 round(p.n_pair / CAST(n.n_orders AS DOUBLE), 6) AS support,
                 round(p.n_pair / CAST(ia.n_item AS DOUBLE), 6)
                     AS confidence,
                 round(p.n_pair * CAST(n.n_orders AS DOUBLE)
                       / (ia.n_item * CAST(ib.n_item AS DOUBLE)), 6)
                     AS lift
          FROM p JOIN ic ia ON ia.item = p.item_a
                 JOIN ic ib ON ib.item = p.item_b
                 CROSS JOIN n)
    SELECT CAST(item_a AS BIGINT) AS item_a,
           CAST(item_b AS BIGINT) AS item_b,
           CAST(n_pair AS BIGINT) AS n_pair,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           support, confidence, lift
    FROM r ORDER BY lift DESC, item_a, item_b LIMIT 25
    """,
)
def q_apriori(spark, sf_dir):
    """Frequent-itemset pair mining (the Apriori/market-basket
    primitive): baskets are orders, items are part classes
    (l_partkey % 50 — the category proxy); emits the top-25 pairs by
    lift with support and confidence, min-support-pruned at 5
    baskets.  The shape generalizes to co-occurrence mining over any
    (container, token) relation — docs x shingles, users x domains.

    Exactness: supports are integer basket counts (collect_set per
    basket so multiplicity never inflates them); support/confidence/
    lift are fixed single-division formulas.  Scale: ONE basket-keyed
    shuffle collects each basket's item set; the (size choose 2)
    pairs expand MAP-SIDE via a nested HOF and partially aggregate to
    an |items|^2-bounded key space before their exchange (the
    self-join formulation shuffled every materialized pair — 30 MB /
    1.9M records at sf0.1 vs ~1 MB here, and the HOF form is also
    faster warm); min-support prunes before the broadcast metric
    joins (item vocabulary capped at 50 by the class mapping)."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE basket shuffle: collect each basket's item set, expand the
    # (size choose 2) pairs map-side with a nested HOF (bounded by
    # basket size), and let the pair count partially aggregate before
    # its |items|^2-bounded exchange — the self-join formulation
    # shuffled every materialized pair (measured 30 MB / 1.9M records
    # at sf0.1 vs ~1 MB here)
    baskets = (
        li.select("l_orderkey", (F.col("l_partkey") % 50).alias("item"))
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("item")).alias("items"))
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    ic = baskets.select(F.explode("items").alias("item")).groupBy(
        "item"
    ).agg(F.count(F.lit(1)).alias("n_item"))
    from shadems_spark.operators.exprcache import memo

    pairs = memo(
        ("apriori_pairs",),
        lambda: F.flatten(
            F.transform(
                F.col("items"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("items"), i + 2,
                        F.greatest(F.size("items") - i - 1, F.lit(0)),
                    ),
                    lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
                ),
            )
        ),
    )
    p = (
        baskets.select(F.explode(pairs).alias("pr"))
        .groupBy(
            F.col("pr.item_a").alias("item_a"),
            F.col("pr.item_b").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 5)
    )
    r = (
        p.join(
            F.broadcast(
                ic.select(F.col("item").alias("item_a"),
                          F.col("n_item").alias("n_a"))
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                ic.select(F.col("item").alias("item_b"),
                          F.col("n_item").alias("n_b"))
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(n))
    )
    return (
        r.select(
            *memo(
                ("apriori_out",),
                lambda: [
                    F.col("item_a").cast("long").alias("item_a"),
                    F.col("item_b").cast("long").alias("item_b"),
                    F.col("n_pair").cast("long").alias("n_pair"),
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    F.round(
                        F.col("n_pair") / F.col("n_orders").cast("double"), 6
                    ).alias("support"),
                    F.round(
                        F.col("n_pair") / F.col("n_a").cast("double"), 6
                    ).alias("confidence"),
                    F.round(
                        F.col("n_pair") * F.col("n_orders").cast("double")
                        / (F.col("n_a") * F.col("n_b").cast("double")),
                        6,
                    ).alias("lift"),
                ],
            )
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(25)
    )


@register(
    "q_motif",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    a AS (SELECT event_type,
                 list(y ORDER BY day) AS ys,
                 list(day ORDER BY day) AS days,
                 count(*) AS n
          FROM d GROUP BY 1),
    w AS (SELECT event_type, days, i,
                 list_slice(ys, i, i + 6) AS v
          FROM a, unnest(range(1, CAST(n AS INT) - 5)) AS t(i)),
    p AS (SELECT x.event_type,
                 x.i AS i, z.i AS j, x.days AS days,
                 list_sum(list_transform(list_zip(x.v, z.v),
                          q -> (q[1] - q[2]) * (q[1] - q[2]))) AS ssd
          FROM w x JOIN w z ON x.event_type = z.event_type
                           AND z.i >= x.i + 7),
    b AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY ssd, i, j) AS rk
          FROM p)
    SELECT event_type,
           CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           days[CAST(i AS INT)] AS day_i, days[CAST(j AS INT)] AS day_j,
           CAST(ssd AS BIGINT) AS ssd
    FROM b WHERE rk = 1 ORDER BY event_type
    """,
)
def q_motif(spark, sf_dir):
    """Time-series motif discovery (matrix-profile-lite): the most
    similar pair of non-overlapping 7-day windows in each type's
    daily count series by sum-of-squared-differences — the recurring-
    pattern detector behind anomaly triage ('this week looks exactly
    like the outage week').

    Exactness: window vectors are integer daily counts assembled from
    a sort_array'd per-type collect (deterministic order), SSD is an
    exact integer, and the per-type argmin tie-breaks on (i, j).
    Scale: the series is calendar-bounded per type, so windows
    (n-6 per type) and the O(n^2) pair join are constant-size
    regardless of corpus rows; production matrix profile (STOMP)
    drops in when calendars grow to 1e5+ points."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    a = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "y"))),
            lambda s: s["y"],
        ).alias("ys"),
        F.sort_array(F.collect_list("day")).alias("days"),
        F.count(F.lit(1)).alias("n"),
    )
    # Types with fewer than 7 days can host no window: the oracle's
    # range(1, n-5) is empty for them, but Spark's F.sequence(1, n-6)
    # would auto-DESCEND (e.g. [1, 0]) and F.slice(..., 0, 7) raises
    # "SQL array indices start at 1" at runtime (ADVICE r6).  Filter
    # them out before exploding so both engines drop the same types.
    w = a.filter(F.col("n") >= 7).select(
        "event_type", "days",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - 6),
                lambda i: F.struct(
                    i.alias("i"), F.slice("ys", i, 7).alias("v")
                ),
            )
        ).alias("win"),
    ).select("event_type", "days", F.col("win.i").alias("i"),
             F.col("win.v").alias("v"))
    z = w.select(
        "event_type", F.col("i").alias("j"), F.col("v").alias("v2")
    )
    ssd = F.aggregate(
        F.zip_with("v", "v2", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e,
    )
    p = (
        w.join(z, "event_type")
        .filter(F.col("j") >= F.col("i") + 7)
        .select("event_type", "i", "j", "days", ssd.alias("ssd"))
    )
    from pyspark.sql import Window as W

    b = p.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("event_type").orderBy("ssd", "i", "j")
        ),
    )
    return (
        b.filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            F.element_at("days", F.col("i").cast("int")).alias("day_i"),
            F.element_at("days", F.col("j").cast("int")).alias("day_j"),
            F.col("ssd").cast("long").alias("ssd"),
        )
        .orderBy("event_type")
    )


@register(
    "q_time_to_convert",
    sql="""
    WITH f AS (SELECT user_id,
                      min(CASE WHEN event_type = 'view'
                          THEN epoch_us(ts) END) AS t_view,
                      min(CASE WHEN event_type = 'purchase'
                          THEN epoch_us(ts) END) AS t_buy
               FROM events GROUP BY 1),
    lat AS (SELECT user_id, t_buy - t_view AS lat_us
            FROM f WHERE t_view IS NOT NULL AND t_buy IS NOT NULL
                     AND t_view < t_buy),
    r AS (SELECT lat_us,
                 row_number() OVER (ORDER BY lat_us, user_id) AS rn,
                 count(*) OVER () AS n
          FROM lat),
    q AS (SELECT max(n) AS n,
                 max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                     THEN lat_us END) AS p50_us,
                 max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                     THEN lat_us END) AS p90_us,
                 sum(lat_us) AS s
          FROM r)
    SELECT CAST(n AS BIGINT) AS n_converters,
           round(p50_us / 8.64e10, 4) AS p50_days,
           round(p90_us / 8.64e10, 4) AS p90_days,
           round(s / CAST(n AS DOUBLE) / 8.64e10, 4) AS mean_days
    FROM q
    """,
)
def q_time_to_convert(spark, sf_dir):
    """Time-to-convert distribution (first view -> first purchase per
    user): EXACT p50/p90 and mean latency in days — the funnel's
    missing time axis (q_funnel counts who converts; this measures
    how long the pipeline holds them, sizing attribution windows and
    retargeting delays).

    Exactness: latencies are integer microseconds from the q_funnel
    conditional-min frame; the exact quantiles are the order
    statistics at ceil(q*n) under the (latency, user) total order —
    selected by the two-phase value-cut global numbering
    (operators/profile.global_index), never a single-partition window
    over the converter table (the oracle's global window IS the
    definition; converters are fixture-bounded there).  Scale: one
    per-user conditional aggregate, the two-phase numbering, and a
    1-row reduce."""
    from shadems_spark.operators.profile import global_index

    ev = load_table(spark, sf_dir, "events")
    us = F.expr("ts_ns div 1000")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("t_buy"),
    )
    lat = f.filter(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_view") < F.col("t_buy"))
    ).select("user_id", (F.col("t_buy") - F.col("t_view")).alias("lat_us"))
    r = global_index(lat, ["lat_us", "user_id"], out="rn", with_total="n")
    c = F.col
    q = r.agg(
        F.max("n").alias("n"),
        F.max(
            F.when(
                c("rn") == F.ceil(0.5 * c("n")).cast("long"), c("lat_us")
            )
        ).alias("p50_us"),
        F.max(
            F.when(
                c("rn") == F.ceil(0.9 * c("n")).cast("long"), c("lat_us")
            )
        ).alias("p90_us"),
        F.sum("lat_us").alias("s"),
    )
    return q.select(
        c("n").cast("long").alias("n_converters"),
        F.round(c("p50_us") / 8.64e10, 4).alias("p50_days"),
        F.round(c("p90_us") / 8.64e10, 4).alias("p90_days"),
        F.round(c("s") / c("n").cast("double") / 8.64e10, 4).alias(
            "mean_days"
        ),
    )


@register(
    "q_seq_patterns",
    sql="""
    WITH e AS (SELECT user_id, event_id, event_type,
                      epoch_us(ts) AS ts_us
               FROM events),
    g AS (SELECT *,
                 CASE WHEN ts_us - lag(ts_us) OVER
                          (PARTITION BY user_id ORDER BY ts_us, event_id)
                      > 1800000000 OR lag(ts_us) OVER
                          (PARTITION BY user_id ORDER BY ts_us, event_id)
                      IS NULL THEN 1 ELSE 0 END AS new_sess
          FROM e),
    s AS (SELECT *,
                 sum(new_sess) OVER (PARTITION BY user_id
                                     ORDER BY ts_us, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess
          FROM g),
    fl AS (SELECT user_id, sess, event_type,
                  min(ts_us * 100 + event_id % 100) AS first_k
           FROM s GROUP BY 1, 2, 3),
    pr AS (SELECT a.event_type AS ante, b.event_type AS cons,
                  count(*) AS n_sessions
           FROM fl a JOIN fl b
             ON a.user_id = b.user_id AND a.sess = b.sess
            AND a.event_type != b.event_type
            AND a.first_k < b.first_k
           GROUP BY 1, 2),
    tot AS (SELECT count(*) AS n_total
            FROM (SELECT DISTINCT user_id, sess FROM fl)),
    ac AS (SELECT event_type, count(*) AS n_with
           FROM fl GROUP BY 1)
    SELECT pr.ante, pr.cons,
           CAST(pr.n_sessions AS BIGINT) AS n_sessions,
           round(pr.n_sessions / CAST(t.n_total AS DOUBLE), 6) AS support,
           round(pr.n_sessions / CAST(a.n_with AS DOUBLE), 6)
               AS confidence,
           round(pr.n_sessions * CAST(t.n_total AS DOUBLE)
                 / (a.n_with * CAST(c.n_with AS DOUBLE)), 6) AS lift
    FROM pr
    JOIN ac a ON a.event_type = pr.ante
    JOIN ac c ON c.event_type = pr.cons
    CROSS JOIN tot t
    ORDER BY pr.n_sessions DESC, pr.ante, pr.cons LIMIT 20
    """,
)
def q_seq_patterns(spark, sf_dir):
    """Gapped sequential patterns (the 2-step PrefixSpan core): in
    how many sessions does type A occur strictly BEFORE type B —
    adjacency not required, once per session — with support,
    confidence and lift against the per-type session priors.
    Complements q_path_analysis (contiguous trigrams) and q_markov
    (one-step transitions) with the order-only signal funnel design
    actually needs ('do viewers eventually purchase?'), immune to
    interleaved noise events.

    Exactness: each (session, type) keeps its FIRST occurrence as an
    integer key (ts*100 + id%100 — strict total order within a
    session), pattern counts are session counts (DISTINCT by
    construction — one first-occurrence row per type), and the
    metrics are single divisions.  Scale: the sessionize window is
    per-user; the before-join runs on the (session, type) table —
    |types| rows per session, so fan-out is type-bounded like
    q_apriori's baskets; priors join broadcast."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    wu = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(wu)
    s = ev.withColumn(
        "sess",
        F.sum(
            F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
        ).over(wu.rowsBetween(W.unboundedPreceding, 0)),
    )
    fl = s.groupBy("user_id", "sess", "event_type").agg(
        F.min(F.col("ts_us") * 100 + F.col("event_id") % 100).alias(
            "first_k"
        )
    )
    b = fl.select(
        "user_id", "sess",
        F.col("event_type").alias("cons"),
        F.col("first_k").alias("k2"),
    )
    pr = (
        fl.join(b, ["user_id", "sess"])
        .filter(
            (F.col("event_type") != F.col("cons"))
            & (F.col("first_k") < F.col("k2"))
        )
        .groupBy(F.col("event_type").alias("ante"), "cons")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    tot = fl.select("user_id", "sess").distinct().agg(
        F.count(F.lit(1)).alias("n_total")
    )
    ac = fl.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_with"))
    c = F.col
    return (
        pr.join(
            F.broadcast(
                ac.select(c("event_type").alias("ante"),
                          c("n_with").alias("n_a"))
            ),
            "ante",
        )
        .join(
            F.broadcast(
                ac.select(c("event_type").alias("cons"),
                          c("n_with").alias("n_c"))
            ),
            "cons",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "ante", "cons",
            c("n_sessions").cast("long").alias("n_sessions"),
            F.round(c("n_sessions") / c("n_total").cast("double"), 6)
            .alias("support"),
            F.round(c("n_sessions") / c("n_a").cast("double"), 6)
            .alias("confidence"),
            F.round(
                c("n_sessions") * c("n_total").cast("double")
                / (c("n_a") * c("n_c").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_sessions"), "ante", "cons")
        .limit(20)
    )


@register(
    "q_funnel_windowed",
    sql="""
    WITH v AS (SELECT user_id,
                      min(CASE WHEN event_type = 'view'
                          THEN epoch_us(ts) END) AS t_view
               FROM events GROUP BY 1),
    c AS (SELECT e.user_id,
                 min(CASE WHEN e.event_type = 'click'
                          AND epoch_us(e.ts) >= v.t_view
                          AND epoch_us(e.ts)
                              <= v.t_view + 7 * 86400000000
                     THEN epoch_us(e.ts) END) AS t_click,
                 min(CASE WHEN e.event_type = 'purchase'
                          AND epoch_us(e.ts) >= v.t_view
                          AND epoch_us(e.ts)
                              <= v.t_view + 7 * 86400000000
                     THEN epoch_us(e.ts) END) AS t_buy
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE v.t_view IS NOT NULL
          GROUP BY 1),
    s AS (SELECT count(*) AS step_view,
                 sum(CASE WHEN t_click IS NOT NULL
                     THEN 1 ELSE 0 END) AS step_click,
                 sum(CASE WHEN t_click IS NOT NULL
                          AND t_buy IS NOT NULL AND t_buy >= t_click
                     THEN 1 ELSE 0 END) AS step_buy
          FROM c)
    SELECT CAST(step_view AS BIGINT) AS step_view,
           CAST(step_click AS BIGINT) AS step_click,
           CAST(step_buy AS BIGINT) AS step_buy,
           round(step_click / CAST(step_view AS DOUBLE), 6)
               AS click_rate_7d,
           round(step_buy / CAST(greatest(step_click, 1) AS DOUBLE), 6)
               AS buy_rate_7d
    FROM s
    """,
)
def q_funnel_windowed(spark, sf_dir):
    """TIME-WINDOWED funnel (the windowFunnel of the OLAP engines):
    view -> click -> purchase where every later step must land within
    7 days of the user's FIRST view and in step order — the product
    metric q_funnel approximates when it ignores the conversion
    window (a purchase a year later is not this campaign's win).

    Exactness: step times are integer microseconds; the window
    predicate and ordering comparisons are integer.  Scale: one
    user-keyed aggregate finds anchors, one user-keyed join + second
    conditional aggregate applies the window — both shuffles on
    user_id, no event-level self-join; at k steps the same two-pass
    shape holds (anchor pass + one conditional pass)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("ts_ns div 1000")
    v = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("t_view")
    ).filter(F.col("t_view").isNotNull())
    win = 7 * 86_400_000_000
    j = ev.join(v, "user_id")
    in_win = (us >= F.col("t_view")) & (us <= F.col("t_view") + win)
    c = j.groupBy("user_id").agg(
        F.min(
            F.when((F.col("event_type") == "click") & in_win, us)
        ).alias("t_click"),
        F.min(
            F.when((F.col("event_type") == "purchase") & in_win, us)
        ).alias("t_buy"),
    )
    s = c.agg(
        F.count(F.lit(1)).alias("step_view"),
        F.sum(F.col("t_click").isNotNull().cast("int")).alias("step_click"),
        F.sum(
            (
                F.col("t_click").isNotNull()
                & F.col("t_buy").isNotNull()
                & (F.col("t_buy") >= F.col("t_click"))
            ).cast("int")
        ).alias("step_buy"),
    )
    cc = F.col
    return s.select(
        cc("step_view").cast("long").alias("step_view"),
        cc("step_click").cast("long").alias("step_click"),
        cc("step_buy").cast("long").alias("step_buy"),
        F.round(
            cc("step_click") / cc("step_view").cast("double"), 6
        ).alias("click_rate_7d"),
        F.round(
            cc("step_buy")
            / F.greatest(cc("step_click"), F.lit(1)).cast("double"),
            6,
        ).alias("buy_rate_7d"),
    )
