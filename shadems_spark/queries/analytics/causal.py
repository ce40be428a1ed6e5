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
from shadems_spark.operators.hashing import knuth32
from shadems_spark.queries import register
from shadems_spark.queries.core import PRICE_RANGE, TIME_RANGE
from shadems_spark.sources import read_csv, write_partitioned
from shadems_spark.vis import vis_sql_from, vis_view


from shadems_spark.queries.analytics._shared import (  # noqa: E501
    _SPRT_DN,
    _SPRT_LA,
    _SPRT_LB,
    _SPRT_UP,
)



@register(
    "q_abtest",
    sql="""
    WITH u AS (SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
                      CAST(max(CASE WHEN event_type = 'purchase'
                                    AND value > 95
                               THEN 1 ELSE 0 END) AS INT) AS converted
               FROM events GROUP BY 1),
    g AS (SELECT variant, count(*) AS n,
                 CAST(sum(converted) AS BIGINT) AS conv
          FROM u GROUP BY 1),
    w AS (SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
                 max(CASE WHEN variant = 0 THEN conv END) AS c0,
                 max(CASE WHEN variant = 1 THEN n END) AS n1,
                 max(CASE WHEN variant = 1 THEN conv END) AS c1
          FROM g)
    SELECT CAST(n0 AS BIGINT) AS n_control, CAST(c0 AS BIGINT) AS conv_control,
           CAST(n1 AS BIGINT) AS n_treat, CAST(c1 AS BIGINT) AS conv_treat,
           round(c0 / CAST(n0 AS DOUBLE), 6) AS rate_control,
           round(c1 / CAST(n1 AS DOUBLE), 6) AS rate_treat,
           round((c1 / CAST(n1 AS DOUBLE) - c0 / CAST(n0 AS DOUBLE))
                 / sqrt(((c0 + c1) / CAST(n0 + n1 AS DOUBLE))
                        * (1 - (c0 + c1) / CAST(n0 + n1 AS DOUBLE))
                        * (1.0 / n0 + 1.0 / n1)), 6) AS z
    FROM w
    """,
)
def q_abtest(spark, sf_dir):
    """Two-proportion A/B z-test: per-user conversion (a high-value
    purchase — every user has SOME purchase in this fixture, which
    would degenerate the pooled proportion to 1 and the z denominator
    to 0) split by the deterministic variant hash (user_id parity —
    the assignment IS the experiment bucketing at scale), pooled-
    proportion z statistic.  All inputs are exact integer counts; the
    z expression is one fixed float formula, so the statistic is
    engine-exact at 6dp.  One per-user aggregate + one 2-row pivot —
    the per-user shuffle is the only data-sized move."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase") & (F.col("value") > 95)
            ).cast("int")
        ).alias("converted")
    ).withColumn("variant", (F.col("user_id") % 2).cast("int"))
    g = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    w = g.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    p0 = F.col("c0") / F.col("n0").cast("double")
    p1 = F.col("c1") / F.col("n1").cast("double")
    pp = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1")).cast("double")
    z = (p1 - p0) / F.sqrt(
        pp * (1 - pp) * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    return w.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("c0").cast("long").alias("conv_control"),
        F.col("n1").cast("long").alias("n_treat"),
        F.col("c1").cast("long").alias("conv_treat"),
        F.round(p0, 6).alias("rate_control"),
        F.round(p1, 6).alias("rate_treat"),
        F.round(z, 6).alias("z"),
    )


@register(
    "q_survival",
    sql="""
    WITH u AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_d,
                 max(CAST(ts AS DATE)) AS last_d
          FROM events GROUP BY 1),
    fe AS (SELECT user_id, min(CAST(ts AS DATE)) AS err_d
           FROM events WHERE event_type = 'error' GROUP BY 1),
    l AS (SELECT u.user_id,
                 CAST(CASE WHEN fe.err_d IS NOT NULL
                      THEN fe.err_d - u.first_d
                      ELSE u.last_d - u.first_d END AS BIGINT) AS t,
                 CAST(CASE WHEN fe.err_d IS NOT NULL THEN 1 ELSE 0 END
                      AS INT) AS had_event
          FROM u LEFT JOIN fe USING (user_id)),
    d AS (SELECT t, count(*) AS at_t,
                 CAST(sum(had_event) AS BIGINT) AS d_t
          FROM l GROUP BY 1),
    k AS (SELECT a.t, a.d_t,
                 CAST(sum(b.at_t) AS BIGINT) AS n_t
          FROM d a JOIN d b ON b.t >= a.t GROUP BY 1, 2),
    kn AS (SELECT t, d_t, n_t,
                  CAST(round(ln(1.0 - d_t / CAST(n_t AS DOUBLE)) * 1e9)
                       AS BIGINT) AS ln_n
           FROM k WHERE d_t < n_t),
    s AS (SELECT a.t, a.d_t, a.n_t,
                 round(exp(CAST(sum(b.ln_n) AS BIGINT) / 1e9), 6) AS survival
          FROM kn a JOIN kn b ON b.t <= a.t
          GROUP BY 1, 2, 3)
    SELECT t, n_t AS n_at_risk, d_t AS n_churned, survival
    FROM s WHERE d_t > 0 ORDER BY t
    """,
)
def q_survival(spark, sf_dir):
    """Kaplan-Meier time-to-first-'error' curve: per-user time from
    first activity to first error event, CENSORED at last activity
    for users who never error (the estimator's whole point — a
    churn-based lifetime is degenerate in this fixture: every user
    stays active to the study end), risk sets by reverse-cumulative
    counts, survival as the cumulative product over event times —
    computed as exp(cumsum(ln(1-d/n))) because Spark has no product
    aggregate, with each ln term NANO-INT rounded per row before the
    cross-row sum (integer sums are summation-order-free, so no
    ordered float fold exists anywhere; 6dp output rounding absorbs
    the quantization).  Both cumulatives (the reverse risk-set count
    and the log-survival prefix) ride broadcast triangle joins over
    the lifetimes-sized table — window-free (VERDICT r7 #5).  One
    per-user aggregate is the only data-sized stage."""
    ev = load_table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    u = ev.groupBy("user_id").agg(
        F.min("d").alias("first_d"), F.max("d").alias("last_d")
    )
    fe = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.min("d").alias("err_d"))
    )
    l = u.join(fe, "user_id", "left").select(
        F.when(
            F.col("err_d").isNotNull(), F.datediff("err_d", "first_d")
        ).otherwise(F.datediff("last_d", "first_d"))
        .cast("long").alias("t"),
        F.col("err_d").isNotNull().cast("int").alias("had_event"),
    )
    d = l.groupBy("t").agg(
        F.count(F.lit(1)).alias("at_t"), F.sum("had_event").alias("d_t")
    )
    from shadems_spark.operators.profile import triangle_cumsum

    # reverse-cumulative risk set: descending triangle cumsum on -t
    k = triangle_cumsum(
        d.withColumn("__negt", -F.col("t")), ["__negt"], {"n_t": "at_t"}
    ).drop("__negt")
    kn = k.filter(F.col("d_t") < F.col("n_t")).withColumn(
        "ln_n",
        F.round(
            F.log(F.lit(1.0) - F.col("d_t") / F.col("n_t").cast("double"))
            * F.lit(1e9)
        ).cast("long"),
    )
    s = triangle_cumsum(kn, ["t"], {"__cln": "ln_n"}).withColumn(
        "survival", F.round(F.exp(F.col("__cln") / F.lit(1e9)), 6)
    )
    return (
        s.filter(F.col("d_t") > 0)
        .select(
            "t",
            F.col("n_t").cast("long").alias("n_at_risk"),
            F.col("d_t").alias("n_churned"),
            "survival",
        )
        .orderBy("t")
    )


@register(
    "q_best_split",
    sql="""
    WITH s AS (SELECT round(value, 4) AS value,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
               FROM events
               WHERE event_type IN ('click', 'purchase')
                 AND value IS NOT NULL),
    v AS (SELECT value, count(*) AS n, sum(y) AS pos FROM s GROUP BY 1),
    c AS (SELECT value,
                 sum(n) OVER (ORDER BY value) AS nl,
                 sum(pos) OVER (ORDER BY value) AS pl
          FROM v),
    t AS (SELECT sum(n) AS nt, sum(pos) AS pt FROM v),
    g AS (SELECT value, nl, pl, nt - nl AS nr, pt - pl AS pr, nt, pt
          FROM c CROSS JOIN t WHERE nl < nt),
    sc AS (SELECT value, nl, pl, nr, pr,
                 ((pl * pl + (nl - pl) * (nl - pl)) / CAST(nl AS DOUBLE)
                  + (pr * pr + (nr - pr) * (nr - pr)) / CAST(nr AS DOUBLE))
                     AS s_sum,
                 (pt * CAST(pt AS DOUBLE) + (nt - pt) * CAST(nt - pt AS DOUBLE))
                     / nt AS s_parent,
                 nt
          FROM g)
    SELECT round(value, 6) AS split_value,
           CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
           CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
           round((s_sum - s_parent) / nt, 6) AS gini_gain
    FROM sc ORDER BY (s_sum - s_parent) / nt DESC, value LIMIT 1
    """,
)
def q_best_split(spark, sf_dir):
    """Exact best binary split (value <= v) for predicting purchase
    vs click by Gini impurity decrease — the split-finding primitive
    inside every distributed decision-tree / GBDT learner (XGBoost's
    exact greedy algorithm): ONE sorted cumulative scan over distinct
    feature values scores every candidate threshold.

    Exactness: left/right positive/negative counts at every candidate
    are integer prefix sums; the Gini objective is maximized through
    the equivalent integer-product score S = (posL^2+negL^2)/nL +
    (posR^2+negR^2)/nR (all products < 2^53, so the doubles are
    EXACT integers until the two divisions), and the reported gain =
    (S - S_parent)/N is one fixed float formula; argmax ties break on
    the smallest value.

    Scale (the VERDICT r5 #1/#4 production path): candidate
    thresholds PRE-ROUNDED to 4dp by protocol on both engines — the
    1e-4 grid is a deterministic superset of the quantile-sketch
    candidate sets planet-scale GBDTs use, and it bounds the distinct
    table BY CONSTRUCTION; the prefix-count scan is the two-phase
    range-partitioned cumsum (operators/profile.global_cumsum), so no
    single-partition window over data exists at any cardinality.  The
    per-value aggregate stays map-side combined and the argmax is
    TakeOrdered(1)."""
    from shadems_spark.operators.profile import global_cumsum

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    s = ev.select(
        F.round("value", 4).alias("value"),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )
    v = s.groupBy("value").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    c = global_cumsum(v, ["value"], {"nl": "n", "pl": "pos"}).select(
        "value", "nl", "pl"
    )
    t = v.agg(F.sum("n").alias("nt"), F.sum("pos").alias("pt"))
    g = (
        c.crossJoin(F.broadcast(t))
        .filter(F.col("nl") < F.col("nt"))
        .select(
            "value", "nl", "pl", "nt", "pt",
            (F.col("nt") - F.col("nl")).alias("nr"),
            (F.col("pt") - F.col("pl")).alias("pr"),
        )
    )
    nl, pl, nr, pr = F.col("nl"), F.col("pl"), F.col("nr"), F.col("pr")
    nt, pt = F.col("nt"), F.col("pt")
    s_sum = (pl * pl + (nl - pl) * (nl - pl)) / nl.cast("double") + (
        pr * pr + (nr - pr) * (nr - pr)
    ) / nr.cast("double")
    s_parent = (
        pt * pt.cast("double") + (nt - pt) * (nt - pt).cast("double")
    ) / nt
    gain = (s_sum - s_parent) / nt
    return (
        g.select(
            F.round("value", 6).alias("split_value"),
            nl.cast("long").alias("n_left"),
            pl.cast("long").alias("pos_left"),
            nr.cast("long").alias("n_right"),
            pr.cast("long").alias("pos_right"),
            F.round(gain, 6).alias("gini_gain"),
            gain.alias("_g"),
            F.col("value").alias("_v"),
        )
        .orderBy(F.col("_g").desc(), "_v")
        .limit(1)
        .drop("_g", "_v")
    )


@register(
    "q_did",
    sql="""
    WITH s AS (SELECT CAST(user_id % 2 AS INT) AS treat,
                      CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                           THEN 1 ELSE 0 END AS post,
                      CAST(round(value * 1000000000.0) AS BIGINT) AS v_nano
               FROM events WHERE value IS NOT NULL),
    c AS (SELECT treat, post, count(*) AS n, sum(v_nano) AS sv
          FROM s GROUP BY 1, 2),
    p AS (SELECT
            max(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n00,
            max(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n01,
            max(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n10,
            max(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n11,
            max(CASE WHEN treat = 0 AND post = 0 THEN sv END) AS s00,
            max(CASE WHEN treat = 0 AND post = 1 THEN sv END) AS s01,
            max(CASE WHEN treat = 1 AND post = 0 THEN sv END) AS s10,
            max(CASE WHEN treat = 1 AND post = 1 THEN sv END) AS s11
          FROM c)
    SELECT CAST(n00 AS BIGINT) AS n00, CAST(n01 AS BIGINT) AS n01,
           CAST(n10 AS BIGINT) AS n10, CAST(n11 AS BIGINT) AS n11,
           round(s00 / (n00 * 1000000000.0), 6) AS mean00,
           round(s01 / (n01 * 1000000000.0), 6) AS mean01,
           round(s10 / (n10 * 1000000000.0), 6) AS mean10,
           round(s11 / (n11 * 1000000000.0), 6) AS mean11,
           round((s11 / (n11 * 1000000000.0) - s10 / (n10 * 1000000000.0))
                 - (s01 / (n01 * 1000000000.0) - s00 / (n00 * 1000000000.0)),
                 6) AS did
    FROM p
    """,
)
def q_did(spark, sf_dir):
    """Difference-in-differences point estimate of the treatment
    effect on event value: treatment = deterministic user-id parity
    (the q_abtest bucketing), post-period = the fixture's mid-month
    cutoff — DiD nets out both the stable group gap and the common
    time shock, the workhorse causal estimator for launch analysis
    (Card-Krueger 1994).

    Exactness: each value is nano-int rounded BEFORE the cell sums
    (summation-order-free integer cells), the four cell means are one
    division each, and the DiD contrast is one fixed float formula —
    engine-exact at 6dp.  Invariance laws pinned: adding a constant
    to every value, or any additive group/period effect, leaves DiD
    unchanged.  Scale: one map-side-combined 4-cell aggregate; the
    timestamp predicate rides the scan (partition-prunable on a
    date-partitioned layout)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cutoff_us = 1705363200000000  # 2024-01-16 00:00:00 UTC
    s = ev.select(
        (F.col("user_id") % 2).cast("int").alias("treat"),
        (F.expr("ts_ns div 1000") >= F.lit(cutoff_us))
        .cast("int").alias("post"),
        F.round(F.col("value") * 1000000000.0).cast("long").alias("v_nano"),
    )
    c = s.groupBy("treat", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v_nano").alias("sv")
    )

    def cell(t, p, col):
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), F.col(col))
        )

    p = c.agg(
        cell(0, 0, "n").alias("n00"), cell(0, 1, "n").alias("n01"),
        cell(1, 0, "n").alias("n10"), cell(1, 1, "n").alias("n11"),
        cell(0, 0, "sv").alias("s00"), cell(0, 1, "sv").alias("s01"),
        cell(1, 0, "sv").alias("s10"), cell(1, 1, "sv").alias("s11"),
    )
    mean = lambda s_, n_: F.col(s_) / (F.col(n_) * 1000000000.0)
    return p.select(
        F.col("n00").cast("long").alias("n00"),
        F.col("n01").cast("long").alias("n01"),
        F.col("n10").cast("long").alias("n10"),
        F.col("n11").cast("long").alias("n11"),
        F.round(mean("s00", "n00"), 6).alias("mean00"),
        F.round(mean("s01", "n01"), 6).alias("mean01"),
        F.round(mean("s10", "n10"), 6).alias("mean10"),
        F.round(mean("s11", "n11"), 6).alias("mean11"),
        F.round(
            (mean("s11", "n11") - mean("s10", "n10"))
            - (mean("s01", "n01") - mean("s00", "n00")),
            6,
        ).alias("did"),
    )


@register(
    "q_cuped",
    sql="""
    WITH u AS (SELECT user_id, CAST(user_id % 2 AS INT) AS treat,
                      sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                               THEN CAST(round(value * 1000.0) AS BIGINT)
                               ELSE 0 END) AS x_milli,
                      sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                               THEN CAST(round(value * 1000.0) AS BIGINT)
                               ELSE 0 END) AS y_milli
               FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    g AS (SELECT count(*) AS n, sum(x_milli) AS sx, sum(y_milli) AS sy,
                 sum(x_milli * y_milli) AS sxy,
                 sum(x_milli * x_milli) AS sxx,
                 sum(y_milli * y_milli) AS syy
          FROM u),
    a AS (SELECT treat, count(*) AS na, sum(x_milli) AS sxa,
                 sum(y_milli) AS sya
          FROM u GROUP BY 1),
    p AS (SELECT
            max(CASE WHEN treat = 0 THEN na END) AS n0,
            max(CASE WHEN treat = 1 THEN na END) AS n1,
            max(CASE WHEN treat = 0 THEN sxa END) AS sx0,
            max(CASE WHEN treat = 1 THEN sxa END) AS sx1,
            max(CASE WHEN treat = 0 THEN sya END) AS sy0,
            max(CASE WHEN treat = 1 THEN sya END) AS sy1
          FROM a)
    SELECT CAST(g.n AS BIGINT) AS n_users,
           CAST(p.n0 AS BIGINT) AS n0, CAST(p.n1 AS BIGINT) AS n1,
           round((g.n * g.sxy - g.sx * g.sy)
                 / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE), 6) AS theta,
           round((p.sy1 / (p.n1 * 1000.0) - p.sy0 / (p.n0 * 1000.0)), 6)
               AS diff_raw,
           round((p.sy1 / (p.n1 * 1000.0) - p.sy0 / (p.n0 * 1000.0))
                 - ((g.n * g.sxy - g.sx * g.sy)
                    / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE))
                   * (p.sx1 / (p.n1 * 1000.0) - p.sx0 / (p.n0 * 1000.0)), 6)
               AS diff_cuped,
           round((CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                  * (g.n * g.sxy - g.sx * g.sy))
                 / (CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE)
                    * (g.n * g.syy - g.sy * g.sy)), 6) AS var_reduction
    FROM g CROSS JOIN p
    """,
)
def q_cuped(spark, sf_dir):
    """CUPED variance-reduced experiment readout (Deng et al.
    WSDM'13): per-user PRE-period spend is the control covariate for
    the POST-period metric; theta = cov(X,Y)/var(X) over all users,
    adjusted lift = raw lift - theta * covariate imbalance, and
    var_reduction = rho^2 is the fraction of metric variance the
    covariate removes — the estimator every experimentation platform
    runs on top of the q_abtest/q_did bucketing.

    Exactness: per-user period sums are milli-int (so squares and
    cross-products stay far inside 2^63 at user cardinality), the
    five sufficient statistics are engine-exact integers, and theta /
    lifts / rho^2 are fixed float formulas over them (rho^2 kept in
    factored double form, the q_trend_ols overflow dodge).  X-bar
    cancels in the between-arm contrast, so no mean-centering ever
    touches a cross-row sum.  Scale: ONE user-keyed map-side-combined
    aggregate then two constant-size reductions — the canonical
    two-pass-free CUPED shape; the user aggregate is the same shuffle
    q_sessionize already pays."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cutoff_us = 1705363200000000
    pre = F.expr("ts_ns div 1000") < F.lit(cutoff_us)
    v_milli = F.round(F.col("value") * 1000.0).cast("long")
    u = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("treat")
    ).agg(
        F.sum(F.when(pre, v_milli).otherwise(0)).alias("x_milli"),
        F.sum(F.when(~pre, v_milli).otherwise(0)).alias("y_milli"),
    )
    g = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_milli").alias("sx"),
        F.sum("y_milli").alias("sy"),
        F.sum(F.col("x_milli") * F.col("y_milli")).alias("sxy"),
        F.sum(F.col("x_milli") * F.col("x_milli")).alias("sxx"),
        F.sum(F.col("y_milli") * F.col("y_milli")).alias("syy"),
    )
    a = u.groupBy("treat").agg(
        F.count(F.lit(1)).alias("na"),
        F.sum("x_milli").alias("sxa"),
        F.sum("y_milli").alias("sya"),
    )

    def cell(t, col):
        return F.max(F.when(F.col("treat") == t, F.col(col)))

    p = a.agg(
        cell(0, "na").alias("n0"), cell(1, "na").alias("n1"),
        cell(0, "sxa").alias("sx0"), cell(1, "sxa").alias("sx1"),
        cell(0, "sya").alias("sy0"), cell(1, "sya").alias("sy1"),
    )
    j = g.crossJoin(F.broadcast(p))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    theta = cov / varx.cast("double")
    ybar = lambda s_, n_: F.col(s_) / (F.col(n_) * 1000.0)
    diff_raw = ybar("sy1", "n1") - ybar("sy0", "n0")
    diff_x = ybar("sx1", "n1") - ybar("sx0", "n0")
    return j.select(
        n.cast("long").alias("n_users"),
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(theta, 6).alias("theta"),
        F.round(diff_raw, 6).alias("diff_raw"),
        F.round(diff_raw - theta * diff_x, 6).alias("diff_cuped"),
        F.round(
            (cov.cast("double") * cov) / (varx.cast("double") * (n * syy - sy * sy)),
            6,
        ).alias("var_reduction"),
    )


_PSM_SQL = """
    WITH u AS (
      SELECT user_id,
             count(*) AS n,
             count(DISTINCT CAST(ts AS DATE)) AS days,
             sum(CAST(round(coalesce(value, 0) * 1000) AS BIGINT)) AS total_m
      FROM events GROUP BY 1),
    s AS (SELECT user_id, CAST(user_id % 2 AS INT) AS treat,
                 round(1.0 / (1.0 + exp(-(-2.0 + 0.05 * n + 0.1 * days))), 3)
                     AS score3,
                 CAST(round(total_m * 1000.0 / n) AS BIGINT) AS y_mm
          FROM u),
    cell AS (SELECT treat, score3, count(*) AS n_u,
                    sum(y_mm) AS y_sum
             FROM s GROUP BY 1, 2),
    t AS (SELECT score3, n_u, y_sum FROM cell WHERE treat = 1),
    c AS (SELECT score3 AS c_score3, n_u AS nc, y_sum AS yc_sum
          FROM cell WHERE treat = 0),
    m AS (SELECT t.score3, t.n_u, t.y_sum, c.c_score3, c.nc, c.yc_sum,
                 row_number() OVER (PARTITION BY t.score3
                   ORDER BY abs(t.score3 - c.c_score3), c.c_score3) AS rn
          FROM t CROSS JOIN c)
    SELECT score3,
           CAST(n_u AS BIGINT) AS n_treated,
           round(y_sum / (n_u * 1e6), 6) AS y_treat,
           c_score3 AS ctrl_score3,
           CAST(nc AS BIGINT) AS n_ctrl,
           round(yc_sum / (nc * 1e6), 6) AS y_ctrl,
           round(y_sum / (n_u * 1e6) - yc_sum / (nc * 1e6), 6) AS att_cell
    FROM m WHERE rn = 1 ORDER BY score3
"""


@register("q_propensity_match", sql=_PSM_SQL)
def q_propensity_match(spark, sf_dir):
    """Propensity-score matching at score-cell granularity (Rosenbaum-
    Rubin): users get a deterministic stand-in propensity
    sigmoid(-2 + 0.05*n_events + 0.1*active_days) ROUNDED TO 3dp, and
    every treated score cell is matched to its nearest control cell
    by |score gap| (tie -> lower control score); att_cell is the
    treated-minus-matched-control outcome contrast, completing the
    causal family beside q_abtest (randomized), q_did (parallel
    trends) and q_cuped (variance reduction) for the observational
    case.  Treatment = user parity (the fixture convention); outcome
    = the user's mean event value.

    Exactness: outcomes ride the milli->micro integer ladder (value
    rounded to milli BEFORE the per-user sum, the per-user mean
    rounded to a micro BIGINT before the cell sum), so cell sums are
    order-free; the sigmoid is libm but 3dp rounding absorbs ulp
    variance (the q_quality_classifier precedent).

    Scale shape: the 3dp rounding BOUNDS the matching problem by
    construction — at most 1001 score values per arm regardless of
    user cardinality (the VERDICT r5 #4 protocol: cardinality bounded
    by pre-rounding, not by data).  The match is a broadcast
    cells x cells join + per-cell rank window over <= ~1e6 bounded
    pairs; user-sized data only flows through two map-side-combined
    aggregates."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.col("ts").cast("date")).alias("days"),
        F.sum(
            F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
            .cast("long")
        ).alias("total_m"),
    )
    z = F.lit(-2.0) + F.lit(0.05) * F.col("n") + F.lit(0.1) * F.col("days")
    s = u.select(
        (F.col("user_id") % 2).cast("int").alias("treat"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 3).alias("score3"),
        F.round(F.col("total_m") * F.lit(1000.0) / F.col("n"))
        .cast("long").alias("y_mm"),
    )
    cell = s.groupBy("treat", "score3").agg(
        F.count(F.lit(1)).alias("n_u"), F.sum("y_mm").alias("y_sum")
    )
    t = cell.filter(F.col("treat") == 1).select("score3", "n_u", "y_sum")
    c = cell.filter(F.col("treat") == 0).select(
        F.col("score3").alias("c_score3"),
        F.col("n_u").alias("nc"),
        F.col("y_sum").alias("yc_sum"),
    )
    m = t.crossJoin(F.broadcast(c))
    w = Window.partitionBy("score3").orderBy(
        F.abs(F.col("score3") - F.col("c_score3")), F.col("c_score3")
    )
    yt = F.col("y_sum") / (F.col("n_u") * F.lit(1e6))
    yc = F.col("yc_sum") / (F.col("nc") * F.lit(1e6))
    return (
        m.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "score3",
            F.col("n_u").cast("long").alias("n_treated"),
            F.round(yt, 6).alias("y_treat"),
            F.col("c_score3").alias("ctrl_score3"),
            F.col("nc").cast("long").alias("n_ctrl"),
            F.round(yc, 6).alias("y_ctrl"),
            F.round(yt - yc, 6).alias("att_cell"),
        )
        .orderBy("score3")
    )


_RIDGE_LAM = "1000.0"
_RIDGE_SQL = f"""
    WITH s AS (SELECT CAST(l_quantity AS BIGINT) AS x1,
                      CAST(round(l_discount * 100) AS BIGINT) AS x2,
                      CAST(round(l_extendedprice * 10) AS BIGINT) AS y
               FROM lineitem),
    g AS (SELECT count(*) AS n,
                 sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
                 sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
                 sum(x2 * x2) AS s22,
                 sum(x1 * y) AS s1y, sum(x2 * y) AS s2y,
                 sum(y * y) AS syy
          FROM s),
    a AS (SELECT CAST(n AS DOUBLE) AS a11, CAST(s1 AS DOUBLE) AS a12,
                 CAST(s2 AS DOUBLE) AS a13,
                 CAST(s11 AS DOUBLE) + {_RIDGE_LAM} AS a22,
                 CAST(s12 AS DOUBLE) AS a23,
                 CAST(s22 AS DOUBLE) + {_RIDGE_LAM} AS a33,
                 CAST(sy AS DOUBLE) AS b1, CAST(s1y AS DOUBLE) AS b2,
                 CAST(s2y AS DOUBLE) AS b3,
                 n, s1, s2, s11, s12, s22, s1y, s2y, sy, syy
          FROM g),
    d AS (SELECT *,
                 a11 * (a22 * a33 - a23 * a23)
                 - a12 * (a12 * a33 - a23 * a13)
                 + a13 * (a12 * a23 - a22 * a13) AS det
          FROM a),
    b AS (SELECT *,
                 (b1 * (a22 * a33 - a23 * a23)
                  - a12 * (b2 * a33 - a23 * b3)
                  + a13 * (b2 * a23 - a22 * b3)) / det AS b0,
                 (a11 * (b2 * a33 - a23 * b3)
                  - b1 * (a12 * a33 - a23 * a13)
                  + a13 * (a12 * b3 - b2 * a13)) / det AS bb1,
                 (a11 * (a22 * b3 - b2 * a23)
                  - a12 * (a12 * b3 - b2 * a13)
                  + b1 * (a12 * a23 - a22 * a13)) / det AS bb2
          FROM d)
    SELECT CAST(n AS BIGINT) AS n,
           round(b0, 6) AS beta0, round(bb1, 6) AS beta1,
           round(bb2, 6) AS beta2,
           round((CAST(syy AS DOUBLE)
                  - 2 * (b0 * sy + bb1 * s1y + bb2 * s2y)
                  + (b0 * b0 * n + bb1 * bb1 * s11 + bb2 * bb2 * s22
                     + 2 * b0 * bb1 * s1 + 2 * b0 * bb2 * s2
                     + 2 * bb1 * bb2 * s12)) / n, 4) AS mse,
           round(1.0 - (CAST(syy AS DOUBLE)
                        - 2 * (b0 * sy + bb1 * s1y + bb2 * s2y)
                        + (b0 * b0 * n + bb1 * bb1 * s11
                           + bb2 * bb2 * s22
                           + 2 * b0 * bb1 * s1 + 2 * b0 * bb2 * s2
                           + 2 * bb1 * bb2 * s12))
                      / (CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * sy / n), 6) AS r2
    FROM b
"""


@register("q_ridge", sql=_RIDGE_SQL)
def q_ridge(spark, sf_dir):
    """Closed-form ridge regression (2 features + intercept) of
    deci-dollar extended price on quantity and centi-discount — the
    normal-equations companion to the iterative q_lr_train: X'X and
    X'y are ONE aggregate pass of integer sufficient statistics, the
    3x3 system (ridge lambda=1000 on the feature diagonal, intercept
    unpenalized) is solved by Cramer's rule in a fixed scalar formula,
    and train MSE / R^2 come from the SAME statistics (no second
    scoring scan: sse = y'y - 2 b'X'y + b'X'Xb).

    Exactness: units are chosen so every sufficient statistic is an
    exact int64 (deci-dollar y keeps sum(y^2) < 2^63 through sf10;
    beyond that the squared sums move to DECIMAL(38) — the q_anova
    bound); both engines then evaluate the identical operation
    sequence over identical integers.  Scale: one map-side-combined
    full scan producing a single 10-number row; everything after is
    constant work.  Beats gradient descent at any scale when the
    design matrix is this small."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 10).cast("long").alias("y"),
    )
    c = F.col
    g = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"), F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(c("x1") * c("x1")).alias("s11"),
        F.sum(c("x1") * c("x2")).alias("s12"),
        F.sum(c("x2") * c("x2")).alias("s22"),
        F.sum(c("x1") * c("y")).alias("s1y"),
        F.sum(c("x2") * c("y")).alias("s2y"),
        F.sum(c("y") * c("y")).alias("syy"),
    )
    lam = float(_RIDGE_LAM)
    a = g.select(
        "*",
        c("n").cast("double").alias("a11"),
        c("s1").cast("double").alias("a12"),
        c("s2").cast("double").alias("a13"),
        (c("s11").cast("double") + lam).alias("a22"),
        c("s12").cast("double").alias("a23"),
        (c("s22").cast("double") + lam).alias("a33"),
        c("sy").cast("double").alias("b1"),
        c("s1y").cast("double").alias("b2"),
        c("s2y").cast("double").alias("b3"),
    )
    det = (
        c("a11") * (c("a22") * c("a33") - c("a23") * c("a23"))
        - c("a12") * (c("a12") * c("a33") - c("a23") * c("a13"))
        + c("a13") * (c("a12") * c("a23") - c("a22") * c("a13"))
    )
    d = a.withColumn("det", det)
    b0 = (
        c("b1") * (c("a22") * c("a33") - c("a23") * c("a23"))
        - c("a12") * (c("b2") * c("a33") - c("a23") * c("b3"))
        + c("a13") * (c("b2") * c("a23") - c("a22") * c("b3"))
    ) / c("det")
    bb1 = (
        c("a11") * (c("b2") * c("a33") - c("a23") * c("b3"))
        - c("b1") * (c("a12") * c("a33") - c("a23") * c("a13"))
        + c("a13") * (c("a12") * c("b3") - c("b2") * c("a13"))
    ) / c("det")
    bb2 = (
        c("a11") * (c("a22") * c("b3") - c("b2") * c("a23"))
        - c("a12") * (c("a12") * c("b3") - c("b2") * c("a13"))
        + c("b1") * (c("a12") * c("a23") - c("a22") * c("a13"))
    ) / c("det")
    b = d.withColumn("b0", b0).withColumn("bb1", bb1).withColumn("bb2", bb2)
    sse = (
        c("syy").cast("double")
        - 2 * (c("b0") * c("sy") + c("bb1") * c("s1y") + c("bb2") * c("s2y"))
        + (
            c("b0") * c("b0") * c("n")
            + c("bb1") * c("bb1") * c("s11")
            + c("bb2") * c("bb2") * c("s22")
            + 2 * c("b0") * c("bb1") * c("s1")
            + 2 * c("b0") * c("bb2") * c("s2")
            + 2 * c("bb1") * c("bb2") * c("s12")
        )
    )
    sst = c("syy").cast("double") - c("sy").cast("double") * c("sy") / c("n")
    return b.select(
        c("n").cast("long").alias("n"),
        F.round("b0", 6).alias("beta0"),
        F.round("bb1", 6).alias("beta1"),
        F.round("bb2", 6).alias("beta2"),
        F.round(sse / c("n"), 4).alias("mse"),
        F.round(F.lit(1.0) - sse / sst, 6).alias("r2"),
    )


@register(
    "q_interval_coverage",
    sql="""
    WITH iv AS (SELECT user_id, event_type, event_id,
                       epoch_us(ts) AS s_us,
                       epoch_us(ts)
                       + CAST(round(abs(value) * 1e6) AS BIGINT) AS e_us
                FROM events WHERE value IS NOT NULL),
    m AS (SELECT *,
                 max(e_us) OVER (PARTITION BY user_id, event_type
                                 ORDER BY s_us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS prev_end
          FROM iv),
    f AS (SELECT *,
                 CASE WHEN prev_end IS NULL OR prev_end < s_us
                      THEN 1 ELSE 0 END AS new_island
          FROM m),
    i AS (SELECT *,
                 sum(new_island) OVER (PARTITION BY user_id, event_type
                                       ORDER BY s_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS island
          FROM f),
    g AS (SELECT user_id, event_type, island,
                 count(*) AS n_iv,
                 max(e_us) - min(s_us) AS cov_us
          FROM i GROUP BY 1, 2, 3)
    SELECT event_type,
           CAST(sum(n_iv) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(cov_us) AS BIGINT) AS covered_us,
           CAST(max(cov_us) AS BIGINT) AS max_island_us
    FROM g GROUP BY 1 ORDER BY event_type
    """,
)
def q_interval_coverage(spark, sf_dir):
    """Interval-union coverage (sweep-line gaps-and-islands): each
    event opens an interval of |value| seconds; per (user, type) the
    overlapping intervals merge into islands and the query reports
    union-covered time per event type — the classic "total engaged
    time" / sensor-uptime operator that a naive sum(duration) double-
    counts.  The running max(end) over preceding rows detects overlap
    chains; an island's union length is exactly max(end)-min(start)
    by construction (every member starts before the running max).

    Exactness: all arithmetic in integer epoch-microseconds.  Scale:
    the sweep windows partition by (user, type) — per-key sequence
    lengths, never global; the island reduce is a map-side-combinable
    aggregate and the output is |types| rows."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    iv = ev.select(
        "user_id", "event_type", "event_id",
        F.expr("ts_ns div 1000").alias("s_us"),
        (
            F.expr("ts_ns div 1000")
            + F.round(F.abs(F.col("value")) * 1e6).cast("long")
        ).alias("e_us"),
    )
    w = W.partitionBy("user_id", "event_type").orderBy("s_us", "event_id")
    m = iv.withColumn(
        "prev_end",
        F.max("e_us").over(w.rowsBetween(W.unboundedPreceding, -1)),
    )
    f = m.withColumn(
        "new_island",
        F.when(
            F.col("prev_end").isNull() | (F.col("prev_end") < F.col("s_us")), 1
        ).otherwise(0),
    )
    i = f.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    g = i.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("n_iv"),
        (F.max("e_us") - F.min("s_us")).alias("cov_us"),
    )
    return (
        g.groupBy("event_type")
        .agg(
            F.sum("n_iv").cast("long").alias("n_intervals"),
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.sum("cov_us").cast("long").alias("covered_us"),
            F.max("cov_us").cast("long").alias("max_island_us"),
        )
        .orderBy("event_type")
    )


@register(
    "q_srm",
    sql="""
    WITH u AS (SELECT user_id, CAST(user_id % 2 AS INT) AS variant
               FROM events GROUP BY 1, 2),
    g AS (SELECT variant, count(*) AS n FROM u GROUP BY 1),
    t AS (SELECT sum(n) AS tot FROM g),
    x AS (SELECT g.variant, g.n, t.tot, t.tot / 2.0 AS e,
                 CAST(round((g.n - t.tot / 2.0) * (g.n - t.tot / 2.0)
                            / (t.tot / 2.0) * 1e9) AS BIGINT) AS contrib_n
          FROM g CROSS JOIN t),
    s AS (SELECT sum(contrib_n) AS chi2_n FROM x)
    SELECT x.variant, CAST(x.n AS BIGINT) AS n_users,
           round(x.e, 1) AS expected,
           round(s.chi2_n / 1e9, 6) AS chi2_srm,
           CAST(CASE WHEN s.chi2_n / 1e9 > 10.828 THEN 1 ELSE 0 END
                AS INT) AS srm_alarm
    FROM x CROSS JOIN s ORDER BY x.variant
    """,
)
def q_srm(spark, sf_dir):
    """Sample-ratio-mismatch guard for the q_abtest assignment: a
    chi-square goodness-of-fit of observed variant counts against the
    designed 50/50 split, alarmed at the p < 0.001 threshold
    (chi2 > 10.828, 1 dof) — the FIRST check every experiment
    analysis runs, because a skewed split invalidates every
    downstream metric no matter how significant it looks.

    Exactness: variant counts are exact integers, each (o-e)^2/e term
    nano-rounds before the sum (the q_chisq protocol).  Scale: one
    per-user distinct aggregate then a 2-row reduce."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select(
        "user_id", (F.col("user_id") % 2).cast("int").alias("variant")
    ).distinct()
    g = u.groupBy("variant").agg(F.count(F.lit(1)).alias("n"))
    t = g.agg(F.sum("n").alias("tot"))
    c = F.col
    x = g.crossJoin(F.broadcast(t)).select(
        "variant", "n", "tot",
        (c("tot") / 2.0).alias("e"),
        F.round(
            (c("n") - c("tot") / 2.0) * (c("n") - c("tot") / 2.0)
            / (c("tot") / 2.0) * F.lit(1e9)
        ).cast("long").alias("contrib_n"),
    )
    s = x.agg(F.sum("contrib_n").alias("chi2_n"))
    return (
        x.crossJoin(F.broadcast(s))
        .select(
            "variant",
            c("n").cast("long").alias("n_users"),
            F.round("e", 1).alias("expected"),
            F.round(c("chi2_n") / 1e9, 6).alias("chi2_srm"),
            (c("chi2_n") / 1e9 > 10.828).cast("int").alias("srm_alarm"),
        )
        .orderBy("variant")
    )


_CONF_ALPHA = "0.1"


def _conformal_sql() -> str:
    # the train-split solve below is the _RIDGE_SQL Cramer form
    return f"""
    WITH s AS (SELECT l_orderkey * 10 + l_linenumber AS rk,
                      l_orderkey % 3 AS split,
                      CAST(l_quantity AS BIGINT) AS x1,
                      CAST(round(l_discount * 100) AS BIGINT) AS x2,
                      CAST(round(l_extendedprice * 10) AS BIGINT) AS y
               FROM lineitem),
    g AS (SELECT count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
                 sum(y) AS sy, sum(x1*x1) AS s11, sum(x1*x2) AS s12,
                 sum(x2*x2) AS s22, sum(x1*y) AS s1y, sum(x2*y) AS s2y
          FROM s WHERE split = 0),
    a AS (SELECT CAST(n AS DOUBLE) AS a11, CAST(s1 AS DOUBLE) AS a12,
                 CAST(s2 AS DOUBLE) AS a13,
                 CAST(s11 AS DOUBLE) + {_RIDGE_LAM} AS a22,
                 CAST(s12 AS DOUBLE) AS a23,
                 CAST(s22 AS DOUBLE) + {_RIDGE_LAM} AS a33,
                 CAST(sy AS DOUBLE) AS b1, CAST(s1y AS DOUBLE) AS b2,
                 CAST(s2y AS DOUBLE) AS b3, n
          FROM g),
    d AS (SELECT *,
                 a11 * (a22 * a33 - a23 * a23)
                 - a12 * (a12 * a33 - a23 * a13)
                 + a13 * (a12 * a23 - a22 * a13) AS det
          FROM a),
    b AS (SELECT n AS n_train,
                 (b1 * (a22 * a33 - a23 * a23)
                  - a12 * (b2 * a33 - a23 * b3)
                  + a13 * (b2 * a23 - a22 * b3)) / det AS b0,
                 (a11 * (b2 * a33 - a23 * b3)
                  - b1 * (a12 * a33 - a23 * a13)
                  + a13 * (a12 * b3 - b2 * a13)) / det AS bb1,
                 (a11 * (a22 * b3 - b2 * a23)
                  - a12 * (a12 * b3 - b2 * a13)
                  + b1 * (a12 * a23 - a22 * a13)) / det AS bb2
          FROM d),
    res AS (SELECT s.rk, s.split,
                   CAST(round(abs(s.y - (b.b0 + b.bb1 * s.x1
                                         + b.bb2 * s.x2)) * 100)
                        AS BIGINT) AS r_n
            FROM s CROSS JOIN b WHERE s.split != 0),
    cal AS (SELECT r_n,
                   row_number() OVER (ORDER BY r_n, rk) AS pos,
                   count(*) OVER () AS nc
            FROM res WHERE split = 1),
    qh AS (SELECT max(nc) AS n_calib,
                  max(CASE WHEN pos = CAST(ceil((max_nc + 1) * (1.0 - {_CONF_ALPHA})) AS BIGINT)
                      THEN r_n END) AS q_n
           FROM (SELECT *, max(nc) OVER () AS max_nc FROM cal)),
    tst AS (SELECT count(*) AS n_test,
                   sum(CASE WHEN res.r_n <= qh.q_n THEN 1 ELSE 0 END)
                       AS covered
            FROM res CROSS JOIN qh WHERE split = 2)
    SELECT CAST(b.n_train AS BIGINT) AS n_train,
           CAST(qh.n_calib AS BIGINT) AS n_calib,
           CAST(tst.n_test AS BIGINT) AS n_test,
           round(qh.q_n / 1000.0, 3) AS q_hat_dollars,
           round(tst.covered / CAST(tst.n_test AS DOUBLE), 6)
               AS coverage_test,
           {1.0 - float(_CONF_ALPHA)} AS target
    FROM b CROSS JOIN qh CROSS JOIN tst
    """


@register("q_conformal", sql=_conformal_sql())
def q_conformal(spark, sf_dir):
    """Split-conformal prediction intervals (Vovk; Lei et al.) around
    the q_ridge price model: fit on the train split, take q_hat = the
    ceil((n+1)(1-alpha))-th order statistic of the calibration
    absolute residuals, and the interval prediction +- q_hat covers a
    FRESH point with probability >= 1 - alpha, distribution-free —
    the modern uncertainty wrapper every ML scoring pipeline should
    ship; the test split's empirical coverage is emitted beside the
    target so the guarantee is checkable in-band.

    Exactness: the ridge solve is the q_ridge closed form on the
    train split's integer sufficient statistics; residuals round to
    milli-dollar ints BEFORE ranking, so the order statistic compares
    integers (selected via the two-phase global numbering — no
    single-partition window over the calibration table); coverage is
    an integer comparison count.  Scale: one stats pass, one scoring
    pass, the two-phase rank, a 1-row reduce."""
    from shadems_spark.operators.profile import global_index

    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rk"),
        (F.col("l_orderkey") % 3).alias("split"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 10).cast("long").alias("y"),
    )
    c = F.col
    g = s.filter(c("split") == 0).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"), F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(c("x1") * c("x1")).alias("s11"),
        F.sum(c("x1") * c("x2")).alias("s12"),
        F.sum(c("x2") * c("x2")).alias("s22"),
        F.sum(c("x1") * c("y")).alias("s1y"),
        F.sum(c("x2") * c("y")).alias("s2y"),
    )
    lam = float(_RIDGE_LAM)
    a = g.select(
        "n",
        c("n").cast("double").alias("a11"),
        c("s1").cast("double").alias("a12"),
        c("s2").cast("double").alias("a13"),
        (c("s11").cast("double") + lam).alias("a22"),
        c("s12").cast("double").alias("a23"),
        (c("s22").cast("double") + lam).alias("a33"),
        c("sy").cast("double").alias("b1"),
        c("s1y").cast("double").alias("b2"),
        c("s2y").cast("double").alias("b3"),
    )
    det = (
        c("a11") * (c("a22") * c("a33") - c("a23") * c("a23"))
        - c("a12") * (c("a12") * c("a33") - c("a23") * c("a13"))
        + c("a13") * (c("a12") * c("a23") - c("a22") * c("a13"))
    )
    d = a.withColumn("det", det)
    b = d.select(
        c("n").alias("n_train"),
        (
            (
                c("b1") * (c("a22") * c("a33") - c("a23") * c("a23"))
                - c("a12") * (c("b2") * c("a33") - c("a23") * c("b3"))
                + c("a13") * (c("b2") * c("a23") - c("a22") * c("b3"))
            ) / c("det")
        ).alias("b0"),
        (
            (
                c("a11") * (c("b2") * c("a33") - c("a23") * c("b3"))
                - c("b1") * (c("a12") * c("a33") - c("a23") * c("a13"))
                + c("a13") * (c("a12") * c("b3") - c("b2") * c("a13"))
            ) / c("det")
        ).alias("bb1"),
        (
            (
                c("a11") * (c("a22") * c("b3") - c("b2") * c("a23"))
                - c("a12") * (c("a12") * c("b3") - c("b2") * c("a13"))
                + c("b1") * (c("a12") * c("a23") - c("a22") * c("a13"))
            ) / c("det")
        ).alias("bb2"),
    )
    res = (
        s.filter(c("split") != 0)
        .crossJoin(F.broadcast(b))
        .select(
            "rk", "split", "n_train",
            F.round(
                F.abs(
                    c("y")
                    - (c("b0") + c("bb1") * c("x1") + c("bb2") * c("x2"))
                ) * 100
            ).cast("long").alias("r_n"),
        )
    )
    cal = res.filter(c("split") == 1)
    ranked = global_index(cal, ["r_n", "rk"], out="pos", with_total="nc")
    alpha = float(_CONF_ALPHA)
    qh = ranked.agg(
        F.max("nc").alias("n_calib"),
        F.max(
            F.when(
                c("pos")
                == F.ceil((c("nc") + 1) * (1.0 - alpha)).cast("long"),
                c("r_n"),
            )
        ).alias("q_n"),
    )
    tst = (
        res.filter(c("split") == 2)
        .crossJoin(F.broadcast(qh))
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum((c("r_n") <= c("q_n")).cast("int")).alias("covered"),
            F.max("n_calib").alias("n_calib"),
            F.max("q_n").alias("q_n"),
        )
    )
    return (
        b.select("n_train")
        .crossJoin(F.broadcast(tst))
        .select(
            c("n_train").cast("long").alias("n_train"),
            c("n_calib").cast("long").alias("n_calib"),
            c("n_test").cast("long").alias("n_test"),
            F.round(c("q_n") / 1000.0, 3).alias("q_hat_dollars"),
            F.round(
                c("covered") / c("n_test").cast("double"), 6
            ).alias("coverage_test"),
            F.lit(1.0 - alpha).alias("target"),
        )
    )


@register(
    "q_sprt",
    sql=f"""
    WITH d AS (SELECT CAST(ts AS DATE) AS day, event_type,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    n AS (SELECT day, CAST(sum(y) AS BIGINT) AS n FROM d GROUP BY 1),
    s AS (SELECT d.event_type, d.day, d.y, n.n,
                 CAST(d.y * {_SPRT_LA} + (n.n - d.y) * ({_SPRT_LB})
                      AS BIGINT) AS inc
          FROM d JOIN n USING (day)),
    c AS (SELECT event_type, day,
                 CAST(sum(inc) OVER (PARTITION BY event_type ORDER BY day)
                      AS BIGINT) AS cum,
                 row_number() OVER (PARTITION BY event_type ORDER BY day)
                     AS rn
          FROM s),
    f AS (SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_days,
                 CAST(max(CASE WHEN rn = (SELECT max(rn) FROM c c2
                                          WHERE c2.event_type = c.event_type)
                               THEN cum END) AS BIGINT) AS cum_final,
                 min(CASE WHEN cum >= {_SPRT_UP} THEN rn END) AS up_rn,
                 min(CASE WHEN cum <= {_SPRT_DN} THEN rn END) AS dn_rn
          FROM c GROUP BY event_type)
    SELECT event_type, n_days,
           round(cum_final / 1e9, 6) AS llr,
           CAST(least(coalesce(up_rn, 1 << 30), coalesce(dn_rn, 1 << 30))
                AS BIGINT) AS first_cross,
           CASE WHEN up_rn IS NOT NULL
                     AND (dn_rn IS NULL OR up_rn < dn_rn) THEN 'h1'
                WHEN dn_rn IS NOT NULL THEN 'h0'
                ELSE 'continue' END AS decision
    FROM f ORDER BY event_type
    """,
)
def q_sprt(spark, sf_dir):
    """Wald's sequential probability ratio test, one monitor per
    event type: is this type's share of daily traffic p1 = 25%
    (H1) or p0 = 15% (H0)?  Each day contributes a pure-INTEGER
    log-likelihood increment (y·ln(p1/p0) + (n-y)·ln((1-p1)/(1-p0)),
    nano-int literals precomputed off-engine), the cumulative LLR
    rides a per-type calendar-bounded window, and the decision is
    the FIRST Wald-boundary crossing (±ln 19 at α=β=5%) — the
    always-valid sequential monitor that replaces fixed-horizon
    peeking.  first_cross = 2^30 encodes "never crossed".

    Exactness: integer increments, integer cumulative sums, integer
    boundary compares; only the final display divides by 1e9."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    n = d.groupBy("day").agg(F.sum("y").cast("long").alias("n"))
    s = d.join(F.broadcast(n), "day").select(
        "event_type", "day",
        (F.col("y") * _SPRT_LA + (F.col("n") - F.col("y")) * _SPRT_LB)
        .cast("long").alias("inc"),
    )
    w = W.partitionBy("event_type").orderBy("day")
    c = s.select(
        "event_type",
        F.sum("inc").over(w).cast("long").alias("cum"),
        F.row_number().over(w).alias("rn"),
    )
    big = F.lit(1 << 30)
    f = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max_by("cum", "rn").cast("long").alias("cum_final"),
        F.min(F.when(F.col("cum") >= _SPRT_UP, F.col("rn"))).alias("up_rn"),
        F.min(F.when(F.col("cum") <= _SPRT_DN, F.col("rn"))).alias("dn_rn"),
    )
    return f.select(
        "event_type", "n_days",
        F.round(F.col("cum_final") / 1e9, 6).alias("llr"),
        F.least(
            F.coalesce("up_rn", big), F.coalesce("dn_rn", big)
        ).cast("long").alias("first_cross"),
        F.when(
            F.col("up_rn").isNotNull()
            & (F.col("dn_rn").isNull() | (F.col("up_rn") < F.col("dn_rn"))),
            F.lit("h1"),
        )
        .when(F.col("dn_rn").isNotNull(), F.lit("h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    ).orderBy("event_type")
from math import factorial as _factorial


def _beta_frac(x: int, y: int):
    from fractions import Fraction

    return Fraction(
        _factorial(x - 1) * _factorial(y - 1), _factorial(x + y - 1)
    )


def _p_b_gt_a(aA: int, bA: int, aB: int, bB: int) -> float:
    """P(pB > pA) for pA ~ Beta(aA,bA), pB ~ Beta(aB,bB), all-integer
    parameters — Cook's closed form evaluated in EXACT rational
    arithmetic (python fractions), floated once at the end."""
    return float(
        sum(
            _beta_frac(aA + i, bA + bB)
            / ((bB + i) * _beta_frac(1 + i, bB) * _beta_frac(aA, bA))
            for i in range(aB)
        )
    )


#: n = 7 users per arm (the sf0.001 fixture has exactly 8 even / 7
#: odd users — 7 is the largest cohort reachable at every sf), so
#: the Beta(k+1, 7-k+1) posterior pair has only 8 x 8 reachable
#: states: the WHOLE answer surface P(pB > pA) is precomputed in
#: Python as exact rationals and shipped as a 64-row literal lookup
#: in both engines — zero in-engine transcendentals (VERDICT r7 #7's
#: precomputed-literal route).
_BAYES_N = 7
_BAYES_TABLE = [
    (ka, kb, _p_b_gt_a(ka + 1, _BAYES_N - ka + 1, kb + 1, _BAYES_N - kb + 1))
    for ka in range(_BAYES_N + 1)
    for kb in range(_BAYES_N + 1)
]

_BAYES_SQL = f"""
    WITH u AS (SELECT user_id,
                      CAST(user_id % 2 AS INT) AS arm,
                      (user_id * 2654435761) % 4294967296 AS h,
                      CAST(max(CASE WHEN event_type = 'purchase'
                                     AND value > 95
                               THEN 1 ELSE 0 END) AS INT) AS conv
               FROM events GROUP BY 1, 2, 3),
    pick AS (SELECT arm, conv FROM (
               SELECT arm, conv,
                      row_number() OVER (PARTITION BY arm
                                         ORDER BY h, user_id) AS rk
               FROM u)
             WHERE rk <= {_BAYES_N}),
    k AS (SELECT
            CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
                AS ka,
            CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
                AS kb,
            CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
            CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
          FROM pick),
    t (tka, tkb, p) AS (VALUES {", ".join(
        f"({ka}, {kb}, {p!r})" for ka, kb, p in _BAYES_TABLE)})
    SELECT k.na AS n_a, k.nb AS n_b, k.ka, k.kb,
           round((k.ka + 1) / 9.0, 6) AS post_mean_a,
           round((k.kb + 1) / 9.0, 6) AS post_mean_b,
           CASE WHEN k.na = {_BAYES_N} AND k.nb = {_BAYES_N}
                THEN round(t.p, 6) END AS p_b_beats_a
    FROM k JOIN t ON t.tka = k.ka AND t.tkb = k.kb
"""


@register("q_bayes_ab", sql=_BAYES_SQL)
def q_bayes_ab(spark, sf_dir):
    """Bayesian A/B conversion comparison P(pB > pA) under uniform
    Beta(1,1) priors, on a deterministic 7-user-per-arm cohort (arm =
    user-id parity, cohort = the 7 smallest (knuth-hash, id) users
    per arm; conversion = any HIGH-VALUE purchase, value > 95 — the
    q_abtest/q_mcnemar convention; plain purchase is universal in
    this fixture and would pin ka = kb = n) — shelved in r7
    because Cook's closed form needs lgamma, landed here via the
    precomputed-literal route: with n = 7 fixed, only 64 (ka, kb)
    posterior states exist, so the whole P surface is computed in
    Python with EXACT rational arithmetic (fractions; validated
    against Monte-Carlo in tests/test_stats_replay.py) and shipped
    as a 64-row literal lookup — both engines join the identical
    literals, no in-engine transcendental at all.  p is NULL if
    either arm's cohort is short (n != 7; mirrored guard).

    Scale: one per-user aggregate; the cohort pick is a 2-partition
    rank over the distinct-user table; the lookup is a broadcast of
    64 literal rows."""
    ev = load_table(spark, sf_dir, "events")
    c = F.col
    u = ev.groupBy("user_id").agg(
        F.max(
            ((c("event_type") == "purchase") & (c("value") > 95)).cast("int")
        ).alias("conv")
    ).select(
        "user_id", "conv",
        (c("user_id") % 2).cast("int").alias("arm"),
        # decimal-exact Knuth hash (operators/hashing.py — 64-bit-id
        # safe; pmod == % here: both operands non-negative)
        knuth32("user_id").alias("h"),
    )
    w = Window.partitionBy("arm").orderBy("h", "user_id")
    pick = u.withColumn("rk", F.row_number().over(w)).filter(
        c("rk") <= _BAYES_N
    )
    k = pick.agg(
        F.sum(F.when(c("arm") == 0, c("conv")).otherwise(0))
        .cast("long").alias("ka"),
        F.sum(F.when(c("arm") == 1, c("conv")).otherwise(0))
        .cast("long").alias("kb"),
        F.sum((c("arm") == 0).cast("int")).cast("long").alias("na"),
        F.sum((c("arm") == 1).cast("int")).cast("long").alias("nb"),
    )
    t = ev.sparkSession.createDataFrame(
        _BAYES_TABLE, "tka long, tkb long, p double"
    )
    ok = (c("na") == _BAYES_N) & (c("nb") == _BAYES_N)
    return (
        k.join(
            F.broadcast(t), (c("tka") == c("ka")) & (c("tkb") == c("kb"))
        )
        .select(
            c("na").alias("n_a"),
            c("nb").alias("n_b"),
            "ka", "kb",
            F.round((c("ka") + 1) / 9.0, 6).alias("post_mean_a"),
            F.round((c("kb") + 1) / 9.0, 6).alias("post_mean_b"),
            F.when(ok, F.round(c("p"), 6)).alias("p_b_beats_a"),
        )
    )
