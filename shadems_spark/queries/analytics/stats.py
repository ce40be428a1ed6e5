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
    _CM_SCALE,
    _CM_VARS,
    _daily_grid,
)



@register(
    "q_corr",
    sql="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
           round(covar_pop(l_discount, l_tax), 8) AS cov_disc_tax,
           round(stddev_samp(l_extendedprice), 4) AS sd_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_corr(spark, sf_dir):
    """Column-pair statistics battery (corr / covariances / stddev per
    group) — the one-pass feature-correlation profile step of a data
    audit.  All four moments ride ONE partial-aggregable scan (each is
    sums/products — map-side combine; no second pass per pair)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qty_price"),
        F.round(F.covar_pop("l_discount", "l_tax"), 8).alias("cov_disc_tax"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
    )


@register(
    "q_ks_test",
    sql="""
    WITH s AS (SELECT round(value, 4) AS value,
                      CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g2
               FROM events WHERE event_type IN ('click', 'purchase')),
    v AS (SELECT value, sum(g1) AS a1, sum(g2) AS a2 FROM s GROUP BY 1),
    c AS (SELECT value,
                 sum(a1) OVER (ORDER BY value) AS c1,
                 sum(a2) OVER (ORDER BY value) AS c2
          FROM v),
    t AS (SELECT sum(g1) AS n1, sum(g2) AS n2 FROM s),
    d AS (SELECT value, abs(c1 * n2 - c2 * n1) AS dnum FROM c, t)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(dnum AS BIGINT) AS d_num,
           round(dnum / (n1 * CAST(n2 AS DOUBLE)), 6) AS ks_d,
           round(value, 6) AS at_value
    FROM d, t ORDER BY dnum DESC, value LIMIT 1
    """,
)
def q_ks_test(spark, sf_dir):
    """EXACT two-sample Kolmogorov-Smirnov statistic between the
    click and purchase value distributions — the distribution-drift
    gate beside q_kl_drift (binned, streaming) and q_abtest (mean
    shift): KS catches ANY CDF divergence, not just mean/bin moves.

    Exactness: at every pooled observation the CDF gap is the pure
    INTEGER |c1*N2 - c2*N1| (cross-multiplied empirical CDFs), so
    sup-finding involves no float comparison; the one division
    happens after the argmax.  Emits the witness point (at_value =
    smallest value attaining the sup) — the actionable part of a
    drift alarm.

    Scale (the VERDICT r5 #1/#4 production path): (a) values are
    PRE-ROUNDED to 4dp BY PROTOCOL on both engines, so the distinct-
    value table is bounded BY CONSTRUCTION at <= (range*1e4 + 1) keys
    at any corpus size — for bounded metrics this is a fixed-size
    table, and the KS statistic computed on the rounded grid is the
    sup over a 1e-4-mesh refinement (error <= the mesh's mass, the
    standard binned-KS contract); (b) the cumulative CDF scan is the
    TWO-PHASE range-partitioned prefix sum (operators/profile.
    global_cumsum) — local cumsums per range partition + a broadcast
    <=32-row offsets table — so NO single-partition window over data
    exists at any cardinality.  The per-value aggregate stays
    map-side combined."""
    from shadems_spark.operators.profile import global_cumsum

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    s = ev.select(
        F.round("value", 4).alias("value"),
        (F.col("event_type") == "click").cast("long").alias("g1"),
        (F.col("event_type") == "purchase").cast("long").alias("g2"),
    )
    v = s.groupBy("value").agg(
        F.sum("g1").alias("a1"), F.sum("g2").alias("a2")
    )
    c = global_cumsum(v, ["value"], {"c1": "a1", "c2": "a2"}).select(
        "value", "c1", "c2"
    )
    t = s.agg(F.sum("g1").alias("n1"), F.sum("g2").alias("n2"))
    d = c.crossJoin(F.broadcast(t)).select(
        "value", "n1", "n2",
        F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
        .alias("dnum"),
    )
    return (
        d.orderBy(F.col("dnum").desc(), "value")
        .limit(1)
        .select(
            "n1", "n2",
            F.col("dnum").alias("d_num"),
            F.round(
                F.col("dnum") / (F.col("n1") * F.col("n2").cast("double")), 6
            ).alias("ks_d"),
            F.round("value", 6).alias("at_value"),
        )
    )


@register(
    "q_mannwhitney",
    sql="""
    WITH s AS (SELECT round(value, 4) AS value,
                      CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g2
               FROM events WHERE event_type IN ('click', 'purchase')),
    v AS (SELECT value, sum(g1) AS a1, sum(g2) AS a2, count(*) AS t
          FROM s GROUP BY 1),
    c AS (SELECT a1, a2, t,
                 sum(t) OVER (ORDER BY value) - t AS cb
          FROM v),
    agg AS (SELECT sum(a1) AS n1, sum(a2) AS n2,
                   sum(a1 * (2 * cb + t + 1)) AS r1x2,
                   sum(t * t * t - t) AS ties
            FROM c)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           CAST(2 * n1 * n2 - (r1x2 - n1 * (n1 + 1)) AS BIGINT) AS u2_x2,
           round((r1x2 - n1 * (n1 + 1)) / (2.0 * (n1 * n2)), 6) AS auc,
           round(((r1x2 - n1 * (n1 + 1)) - CAST(n1 * n2 AS DOUBLE)) /
                 (2.0 * sqrt((CAST(n1 * n2 AS DOUBLE) / 12.0) *
                             ((n1 + n2 + 1) -
                              CAST(ties AS DOUBLE) /
                              ((n1 + n2) * (n1 + n2 - 1.0))))), 6) AS z
    FROM agg
    """,
)
def q_mannwhitney(spark, sf_dir):
    """Tie-aware Mann-Whitney U rank-sum test between the click and
    purchase value distributions — the nonparametric drift gate
    beside q_ks_test (sup-CDF-gap) and q_abtest (mean z-test): U
    detects stochastic dominance (P(X>Y) != 1/2) where KS may be
    diluted and a mean test is fooled by outliers.

    Exactness: doubled midranks (2*cum_before + t + 1 per tie group)
    keep every rank sum a pure INTEGER, so U1, U2 and the tie term
    sum(t^3 - t) are engine-exact; AUC (= U1/(n1*n2), the common-
    language effect size — same quantity q_auc computes for the
    classifier) and the tie-corrected normal z are each ONE fixed
    float formula over those integers, identical at 6dp on any
    IEEE-754 engine (the q_abtest protocol).

    Scale (the VERDICT r5 #1/#4 production path): values PRE-ROUNDED
    to 4dp by protocol on both engines — midranks on the rounded grid
    are the tie-aware ranks of the 1e-4-binned test (the standard
    grouped rank-sum form), and the distinct-value table is bounded
    BY CONSTRUCTION; the rank-base scan is the two-phase range-
    partitioned prefix sum (operators/profile.global_cumsum), so no
    single-partition window over data exists at any cardinality.  The
    per-value aggregate stays map-side combined."""
    from shadems_spark.operators.profile import global_cumsum

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    s = ev.select(
        F.round("value", 4).alias("value"),
        (F.col("event_type") == "click").cast("long").alias("g1"),
        (F.col("event_type") == "purchase").cast("long").alias("g2"),
    )
    v = s.groupBy("value").agg(
        F.sum("g1").alias("a1"),
        F.sum("g2").alias("a2"),
        F.count(F.lit(1)).alias("t"),
    )
    c = global_cumsum(v, ["value"], {"ct": "t"}).select(
        "a1", "a2", "t", (F.col("ct") - F.col("t")).alias("cb")
    )
    agg = c.agg(
        F.sum("a1").alias("n1"),
        F.sum("a2").alias("n2"),
        F.sum(F.col("a1") * (2 * F.col("cb") + F.col("t") + 1)).alias("r1x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("ties"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1x2 = F.col("r1x2") - n1 * (n1 + 1)
    nn = (n1 * n2).cast("double")
    sigma2 = (nn / 12.0) * (
        (n1 + n2 + 1)
        - F.col("ties").cast("double") / ((n1 + n2) * (n1 + n2 - 1.0))
    )
    return agg.select(
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        u1x2.cast("long").alias("u1_x2"),
        (2 * n1 * n2 - u1x2).cast("long").alias("u2_x2"),
        F.round(u1x2 / (2.0 * (n1 * n2)), 6).alias("auc"),
        F.round((u1x2 - nn) / (2.0 * F.sqrt(sigma2)), 6).alias("z"),
    )


_BENFORD = [
    (1, 0.3010299957), (2, 0.1760912591), (3, 0.1249387366),
    (4, 0.0969100130), (5, 0.0791812460), (6, 0.0669467896),
    (7, 0.0579919470), (8, 0.0511525224), (9, 0.0457574906),
]


@register(
    "q_benford",
    sql="""
    WITH exp AS (SELECT * FROM (VALUES
        (1, 0.3010299957), (2, 0.1760912591), (3, 0.1249387366),
        (4, 0.0969100130), (5, 0.0791812460), (6, 0.0669467896),
        (7, 0.0579919470), (8, 0.0511525224), (9, 0.0457574906))
        AS t(digit, p)),
    obs AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                                          AS BIGINT) AS VARCHAR), 1, 1)
                        AS INTEGER) AS digit,
                   count(*) AS observed
            FROM orders WHERE o_totalprice > 0 GROUP BY 1),
    n AS (SELECT sum(observed) AS total FROM obs)
    SELECT e.digit,
           coalesce(o.observed, 0) AS observed,
           round(n.total * e.p, 6) AS expected,
           CAST(round((coalesce(o.observed, 0) - n.total * e.p)
                      * (coalesce(o.observed, 0) - n.total * e.p)
                      / (n.total * e.p) * 1e9) AS BIGINT) AS chi2_nano
    FROM exp e LEFT JOIN obs o ON o.digit = e.digit CROSS JOIN n
    ORDER BY e.digit
    """,
)
def q_benford(spark, sf_dir):
    """Benford's-law first-significant-digit audit over order totals
    — the classic fraud / synthetic-data / unit-mixing screen
    (Newcomb 1881, Benford 1938; Nigrini's audit practice): digit
    1..9 observed counts vs N*log10(1+1/d), with per-digit chi-square
    contributions.

    Exactness: the first significant digit is read from the STRING of
    the integer-cents value (round(x*100) is exact for cent-valued
    prices, and BIGINT-to-string is identical on every engine) — NO
    log10/pow on data, so there is no libm or power-of-ten boundary
    risk; the expected probabilities are shared 10dp literals, and
    each chi-square contribution is nano-int rounded (one float
    formula from an integer count and a literal).  Scale: one
    map-side-combined 9-key aggregate over a single pruned column +
    a broadcast of the 9-row expectation table — embarrassingly
    parallel at any corpus size."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    obs = (
        o.select(
            F.substring(
                F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
                1, 1,
            ).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    exp = spark.createDataFrame(_BENFORD, "digit int, p double")
    n = obs.agg(F.sum("observed").alias("total"))
    dev = F.coalesce(F.col("observed"), F.lit(0)) - F.col("total") * F.col("p")
    return (
        F.broadcast(exp)
        .join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce(F.col("observed"), F.lit(0)).alias("observed"),
            F.round(F.col("total") * F.col("p"), 6).alias("expected"),
            F.round(dev * dev / (F.col("total") * F.col("p")) * 1e9)
            .cast("long").alias("chi2_nano"),
        )
        .orderBy("digit")
    )


@register(
    "q_psi",
    sql="""
    WITH ref AS (SELECT value, event_id FROM events
                 WHERE event_type = 'click' AND value IS NOT NULL),
    rk AS (SELECT value,
                  row_number() OVER (ORDER BY value, event_id) AS rn,
                  count(*) OVER () AS n
           FROM ref),
    cut AS (SELECT CAST(ceil(rk.n * k.k / 10.0) AS BIGINT) AS r
            FROM (SELECT unnest(generate_series(1, 9)) AS k) k
            CROSS JOIN (SELECT max(n) AS n FROM rk) rk),
    e AS (SELECT list(value ORDER BY value) AS edges
          FROM rk WHERE rn IN (SELECT r FROM cut)),
    s AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_ref,
                 1 + len(list_filter(e.edges, x -> x < value)) AS bin
          FROM events CROSS JOIN e
          WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
    c AS (SELECT b.bin,
                 coalesce(sum(s.is_ref), 0) AS ref_n,
                 coalesce(sum(1 - s.is_ref), 0) AS cmp_n
          FROM (SELECT unnest(generate_series(1, 10)) AS bin) b
          LEFT JOIN s ON s.bin = b.bin GROUP BY 1),
    t AS (SELECT sum(ref_n) AS nr, sum(cmp_n) AS nc FROM c)
    SELECT bin, CAST(ref_n AS BIGINT) AS ref_n, CAST(cmp_n AS BIGINT) AS cmp_n,
           CAST(round(((ref_n + 1) / CAST(nr + 10 AS DOUBLE)
                       - (cmp_n + 1) / CAST(nc + 10 AS DOUBLE))
                      * ln(((ref_n + 1) / CAST(nr + 10 AS DOUBLE))
                           / ((cmp_n + 1) / CAST(nc + 10 AS DOUBLE)))
                      * 1000000000.0) AS BIGINT) AS psi_nano
    FROM c CROSS JOIN t ORDER BY bin
    """,
)
def q_psi(spark, sf_dir):
    """Population Stability Index between the click (reference) and
    purchase (comparison) value distributions — the industry-standard
    model-monitoring drift score (credit-risk practice; PSI > 0.25 =
    investigate), complementing q_ks_test (sup gap), q_mannwhitney
    (rank shift) and q_kl_drift (token KL): PSI localizes WHICH
    decile of the reference distribution the shift lives in.

    Shape: decile edges are exact order statistics of the reference
    (rank ceil(N*k/10) under the deterministic (value, event_id)
    order), carried as ONE broadcast array row — bin assignment is a
    pure expression (count of edges below the value), no per-row
    join fan-out and no second shuffle; add-one smoothing keeps
    empty comparison bins finite (and is what you want at 100 TB
    where a decile CAN empty out under real drift).  Each bin's
    contribution is nano-int rounded from one fixed float formula
    over integer counts.

    Scale (the VERDICT r5 #1 production path): the exact rank edges
    ride the TWO-PHASE range-partitioned row numbering (operators/
    profile.global_index) — local row_number per range partition + a
    broadcast <=32-row offsets table — so the decile extraction has
    NO single-partition window over reference rows at any
    cardinality; the binned aggregate stays map-side combined and
    10-key.  (The same edges are also available as KLL cutpoints via
    the q_ccnet_buckets_approx pattern when exactness isn't
    oracle-mandated.)"""
    from shadems_spark.operators.exprcache import memo
    from shadems_spark.operators.profile import global_index

    ev = load_table(spark, sf_dir, "events").filter(
        memo(
            ("psi_filter",),
            lambda: F.col("event_type").isin("click", "purchase")
            & F.col("value").isNotNull(),
        )
    )
    ref = ev.filter(F.col("event_type") == "click")
    rk = global_index(
        ref.select("value", "event_id"), ["value", "event_id"],
        out="rn", with_total="n",
    ).select("value", "rn", "n")
    cut = (
        spark.range(1, 10)
        .crossJoin(F.broadcast(rk.agg(F.max("n").alias("n"))))
        .select(
            memo(
                ("psi_cut",),
                lambda: F.ceil(F.col("n") * F.col("id") / 10.0).alias("r"),
            )
        )
    )
    e = (
        rk.join(F.broadcast(cut), rk["rn"] == cut["r"])
        .agg(
            memo(
                ("psi_edges",),
                lambda: F.sort_array(F.collect_list("value")).alias("edges"),
            )
        )
    )
    s = ev.crossJoin(F.broadcast(e)).select(
        *memo(
            ("psi_bin",),
            lambda: [
                (F.col("event_type") == "click").cast("long").alias("is_ref"),
                (
                    1 + F.size(F.filter("edges", lambda x: x < F.col("value")))
                ).alias("bin"),
            ],
        )
    )
    c = (
        spark.range(1, 11).select(F.col("id").cast("int").alias("bin"))
        .join(s, "bin", "left")
        .groupBy("bin")
        .agg(
            *memo(
                ("psi_counts",),
                lambda: [
                    F.coalesce(F.sum("is_ref"), F.lit(0)).alias("ref_n"),
                    F.coalesce(
                        F.sum(1 - F.col("is_ref")), F.lit(0)
                    ).alias("cmp_n"),
                ],
            )
        )
    )
    t = c.agg(F.sum("ref_n").alias("nr"), F.sum("cmp_n").alias("nc"))

    def _psi_out():
        p = (F.col("ref_n") + 1) / (F.col("nr") + 10).cast("double")
        q = (F.col("cmp_n") + 1) / (F.col("nc") + 10).cast("double")
        return [
            F.col("ref_n").cast("long").alias("ref_n"),
            F.col("cmp_n").cast("long").alias("cmp_n"),
            F.round((p - q) * F.log(p / q) * 1000000000.0)
            .cast("long").alias("psi_nano"),
        ]

    return (
        c.crossJoin(F.broadcast(t))
        .select("bin", *memo(("psi_out",), _psi_out))
        .orderBy("bin")
    )


@register(
    "q_hill",
    sql="""
    WITH top AS (SELECT o_totalprice AS x FROM orders
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 101),
    k1 AS (SELECT min(x) AS xk1, count(*) AS n FROM top),
    t AS (SELECT CAST(round(ln(top.x / k1.xk1) * 1000000000.0) AS BIGINT)
                     AS l_nano
          FROM top CROSS JOIN k1)
    SELECT (SELECT n FROM k1) - 1 AS k,
           round((SELECT xk1 FROM k1), 6) AS x_kplus1,
           CAST(sum(l_nano) AS BIGINT) AS sum_ln_nano,
           round(((SELECT n FROM k1) - 1) * 1000000000.0 / sum(l_nano), 6)
               AS hill_alpha
    FROM t
    """,
)
def q_hill(spark, sf_dir):
    """Hill estimator of the power-law tail index over the top-100
    order totals — the heavy-tail gate (Hill 1975): alpha ~< 2 means
    infinite variance (plan for skew: salting, talking to q_salted_
    join/q_skew_split), alpha > 3 means means and variances behave.
    The tail-heaviness twin of q_zipf's rank-frequency fit.

    Shape: the ONLY data-sized step is a distributed top-k
    (TakeOrderedAndProject — per-partition heaps, no global sort);
    everything after runs on k+1 = 101 rows.  The tied-minimum trick
    makes the k+1-st row contribute ln(1) = 0, so no rank window is
    needed at all.  Each log-ratio is nano-int rounded before the
    sum; alpha is one division.  Scale: k is constant — the probe
    cost at 100 TB is the scan behind the top-k heap."""
    o = load_table(spark, sf_dir, "orders")
    top = (
        o.select(F.col("o_totalprice").alias("x"), "o_orderkey")
        .orderBy(F.col("x").desc(), "o_orderkey")
        .limit(101)
    )
    k1 = top.agg(F.min("x").alias("xk1"), F.count(F.lit(1)).alias("n"))
    t = top.crossJoin(F.broadcast(k1)).select(
        "n", "xk1",
        F.round(F.log(F.col("x") / F.col("xk1")) * 1000000000.0)
        .cast("long").alias("l_nano"),
    )
    return t.groupBy("n", "xk1").agg(
        F.sum("l_nano").alias("sum_ln_nano")
    ).select(
        (F.col("n") - 1).cast("long").alias("k"),
        F.round("xk1", 6).alias("x_kplus1"),
        F.col("sum_ln_nano").cast("long").alias("sum_ln_nano"),
        F.round(
            (F.col("n") - 1) * 1000000000.0 / F.col("sum_ln_nano"), 6
        ).alias("hill_alpha"),
    )


@register(
    "q_anova",
    sql="""
    WITH s AS (SELECT event_type,
                      CAST(round(value * 1000.0) AS BIGINT) AS v
               FROM events WHERE value IS NOT NULL),
    g AS (SELECT event_type, count(*) AS ng, sum(v) AS sg,
                 sum(v * v) AS sqg
          FROM s GROUP BY 1),
    t AS (SELECT count(*) AS k, sum(ng) AS n, sum(sg) AS st,
                 sum(sqg) AS sqt,
                 sum(CAST(sg AS DOUBLE) * sg / ng) AS ssb_part
          FROM g)
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n,
           round((ssb_part - CAST(st AS DOUBLE) * st / n)
                 / 1000000.0, 6) AS ss_between,
           round((sqt - ssb_part) / 1000000.0, 6) AS ss_within,
           round(((ssb_part - CAST(st AS DOUBLE) * st / n) / (k - 1))
                 / ((sqt - ssb_part) / (n - k)), 6) AS f_stat,
           round((ssb_part - CAST(st AS DOUBLE) * st / n)
                 / (sqt - CAST(st AS DOUBLE) * st / n), 6) AS eta_squared
    FROM t
    """,
)
def q_anova(spark, sf_dir):
    """One-way ANOVA of event value across the five event types — the
    does-the-metric-differ-by-segment omnibus test beside the
    pairwise drift family (q_ks_test/q_mannwhitney compare two
    groups; ANOVA screens ALL segments in one pass), with eta^2 as
    the variance-explained effect size.

    Exactness: values are milli-int rounded per row (micro overflows
    2^63 in the sum of squares at this fixture's value range; at
    1e12+ rows move the sum-of-squares to DECIMAL(38) or a two-pass
    centered form), the per-group
    sufficient statistics (n, sum, sum-of-squares) are engine-exact
    integers, and SSB/SSW/F/eta^2 are fixed float formulas over them
    (the sum(sg^2/ng) term is accumulated in double over the K=5
    group rows — K-bounded, order-fixed by the single-row reduce).
    Scale: ONE map-side-combined 5-key aggregate then a constant
    reduction — the textbook distributed-ANOVA shape; no window, no
    join, no second scan."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(
        "event_type",
        F.round(F.col("value") * 1000.0).cast("long").alias("v"),
    )
    g = s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("v").alias("sg"),
        F.sum(F.col("v") * F.col("v")).alias("sqg"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("st"),
        F.sum("sqg").alias("sqt"),
        F.sum(F.col("sg").cast("double") * F.col("sg") / F.col("ng"))
        .alias("ssb_part"),
    )
    k, n = F.col("k"), F.col("n")
    st, sqt, ssb_part = F.col("st"), F.col("sqt"), F.col("ssb_part")
    ssb = ssb_part - st.cast("double") * st / n
    ssw = sqt - ssb_part
    sst = sqt - st.cast("double") * st / n
    return t.select(
        k.cast("long").alias("k_groups"),
        n.cast("long").alias("n"),
        F.round(ssb / 1000000.0, 6).alias("ss_between"),
        F.round(ssw / 1000000.0, 6).alias("ss_within"),
        F.round((ssb / (k - 1)) / (ssw / (n - k)), 6).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_squared"),
    )


#: Abramowitz-Stegun 7.1.26 erf polynomial constants — the shared
#: closed-form normal tail both engines evaluate identically (only
#: +,-,*,/ and exp; the result is rounded before any comparison).
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _as_p_sql(z: str) -> str:
    """two-sided p = erfc(|z|/sqrt(2)) via the A-S 7.1.26 polynomial:
    p = (a1 t + a2 t^2 + ... + a5 t^5) * exp(-x^2), t = 1/(1 + p*x),
    x = |z|/sqrt(2).

    The terms are built EXACTLY like the Spark side (_as_p_col /
    q_bh_fdr's fold): each power is the running product tp_{i+1} =
    (tp_i * t) computed FIRST, then multiplied by the coefficient —
    a_i * ((t*t)*t...), NOT ((a_i*t)*t)*t....  The two associations
    differ by ~1 ulp on ~half of inputs; keeping them identical is
    what makes the 9dp rounding bit-identical across engines instead
    of merely almost-always identical."""
    x = f"(abs({z}) / sqrt(2.0))"
    t = f"(1.0 / (1.0 + {_AS_P} * {x}))"
    tp = t
    terms = []
    for a in _AS_A:
        terms.append(f"({a}) * {tp}")
        tp = f"({tp} * {t})"
    poly = " + ".join(terms)
    return f"round(({poly}) * exp(-({x} * {x})), 9)"


def _as_p_col(z):
    """Two-sided normal p-value 1 - erf(|z|/sqrt(2)) via the same
    Abramowitz-Stegun 7.1.26 polynomial _as_p_sql replays in DuckDB
    (the q_bh_fdr machinery, shared): identical literals, identical
    operation order, rounded 9dp on both engines."""
    x = F.abs(z) / F.sqrt(F.lit(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * x)
    poly = None
    tp = t
    for a in _AS_A:
        term = F.lit(a) * tp
        poly = term if poly is None else poly + term
        tp = tp * t
    return F.round(poly * F.exp(-(x * x)), 9)


#: the per-type Welch-z hypothesis table with A-S p-values, ranked by
#: p — the shared front half of both FDR procedures (BH and BY differ
#: only in the step-up threshold).
_RANKED_P_CTES = f"""v AS (SELECT event_type,
                      CAST(round(coalesce(value, 0) * 1000) AS BIGINT) AS vm
               FROM events),
    g0 AS (SELECT event_type, count(*) AS n, sum(vm) AS s,
                  sum(vm * vm) AS q
           FROM v GROUP BY 1),
    tot0 AS (SELECT sum(n) AS n_all, sum(s) AS s_all, sum(q) AS q_all
             FROM g0),
    g AS (SELECT g0.* FROM g0 CROSS JOIN tot0
          WHERE g0.n > 1 AND tot0.n_all - g0.n > 1),
    tot AS (SELECT tot0.n_all, tot0.s_all, tot0.q_all, fam.m
            FROM tot0 CROSS JOIN
                 (SELECT count(*) AS m FROM g) AS fam),
    z AS (SELECT g.event_type, g.n, tot.m,
                 round((g.s / CAST(g.n AS DOUBLE)
                        - (tot.s_all - g.s) / CAST(tot.n_all - g.n AS DOUBLE))
                       / sqrt(
                    (g.q - g.s * (g.s / CAST(g.n AS DOUBLE)))
                        / (CAST(g.n AS DOUBLE) * (g.n - 1))
                    + ((tot.q_all - g.q)
                       - (tot.s_all - g.s)
                         * ((tot.s_all - g.s) / CAST(tot.n_all - g.n AS DOUBLE)))
                        / (CAST(tot.n_all - g.n AS DOUBLE)
                           * (tot.n_all - g.n - 1))), 6)
                 + 0.0 AS z_raw
          FROM g CROSS JOIN tot),
    p AS (SELECT event_type, n, m, z_raw AS z,
                 {_as_p_sql('z_raw')} AS p
          FROM z),
    r AS (SELECT *, CAST(row_number() OVER (ORDER BY p, event_type)
                         AS INTEGER) AS rk
          FROM p)"""

_BH_SQL = f"""
    WITH {_RANKED_P_CTES},
    d AS (SELECT *, round(rk * 0.1 / m, 9) AS bh_thresh,
                 CASE WHEN p <= rk * 0.1 / m THEN rk END AS pass_rk
          FROM r),
    mx AS (SELECT coalesce(max(pass_rk), 0) AS k FROM d)
    SELECT event_type, CAST(n AS BIGINT) AS n, z, p, rk, bh_thresh,
           CAST(CASE WHEN rk <= mx.k THEN 1 ELSE 0 END AS INT) AS discovery
    FROM d CROSS JOIN mx ORDER BY rk
"""


@register("q_bh_fdr", sql=_BH_SQL)
def q_bh_fdr(spark, sf_dir):
    """Benjamini-Hochberg FDR control (q = 0.1) over the per-type
    mean-value contrast tests (each event type vs the rest, Welch z
    from integer sufficient statistics) — the multiple-testing
    discipline the stats battery needs: run q_abtest-style tests per
    segment and WITHOUT a correction ~10% of null segments "alert"
    at p<0.1; BH keeps the expected false-discovery RATE at q.
    discovery = 1 for every rank up to the largest k with
    p_(k) <= k*q/m (the step-up rule: ranks below a passing rank are
    discoveries even if their own threshold check failed).

    Exactness: values ride the milli-int ladder (S, Q, n per group are
    exact integers); z is one fixed float formula rounded 6dp; the
    normal tail is the Abramowitz-Stegun 7.1.26 erfc polynomial
    (+,-,*,/,exp only — no engine erf() dependence) rounded 9dp
    BEFORE ranking, so p-order and every BH comparison are
    engine-identical.

    Scale shape: one map-side-combined per-type aggregate; everything
    after runs on m = type-cardinality rows (the rank window included
    — bounded by the segment domain, not the corpus)."""
    return _fdr_step_up(_ranked_hypotheses(spark, sf_dir), "bh_thresh")


def _ranked_hypotheses(spark, sf_dir):
    """The shared FDR front half: per-type Welch-z contrast tests from
    integer sufficient statistics, A-S p-values, p-ranked via the
    broadcast triangle join (window-free, VERDICT r7 #5).  Types with
    n < 2 (or complement < 2) carry no variance estimate and are
    excluded from the family — m counts TESTED hypotheses.  Returns
    (event_type, n, m, z, p, rk) — m = hypothesis count on every row."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
        .cast("long").alias("vm"),
    )
    g0 = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vm").alias("s"),
        F.sum(F.col("vm") * F.col("vm")).alias("q"),
    )
    # the per-type aggregate feeds full-corpus totals AND the guarded
    # family — persist so the data-sized aggregate runs once
    from shadems_spark.operators.dedup import tracked_persist

    g0 = tracked_persist(g0, key="fdr_type_stats")
    tot0 = g0.agg(
        F.sum("n").alias("n_all"), F.sum("s").alias("s_all"),
        F.sum("q").alias("q_all"),
    )
    # degenerate-group guard (the ADVICE r7 Welch class): a 1-row type
    # (or one whose complement has < 2 rows) admits no variance
    # estimate — it is EXCLUDED from the hypothesis family (m shrinks)
    # while its rows still count toward every other type's complement,
    # so non-degenerate corpora are byte-identical to the unguarded
    # form.
    g = g0.crossJoin(F.broadcast(tot0)).filter(
        (F.col("n") > 1) & (F.col("n_all") - F.col("n") > 1)
    ).select("event_type", "n", "s", "q")
    tot = tot0.crossJoin(
        F.broadcast(g.agg(F.count(F.lit(1)).alias("m")))
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    n2 = F.col("n_all") - n
    s2 = F.col("s_all") - s
    q2 = F.col("q_all") - q
    m1 = s / n.cast("double")
    m2 = s2 / n2.cast("double")
    var1 = (q - s * m1) / (n.cast("double") * (n - 1))
    var2 = (q2 - s2 * m2) / (n2.cast("double") * (n2 - 1))
    z_raw = F.round(
        (m1 - m2) / F.sqrt(var1 + var2), 6
    ) + F.lit(0.0)
    zt = g.crossJoin(F.broadcast(tot)).select(
        "event_type", "n", "m", z_raw.alias("z_raw")
    )

    p_col = _as_p_col(F.col("z_raw"))
    p = zt.select(
        "event_type", "n", "m", F.col("z_raw").alias("z"), p_col.alias("p")
    )
    # rank over the m = |event types| hypothesis rows via the
    # broadcast triangle join — window-free (VERDICT r7 #5)
    from shadems_spark.operators.profile import triangle_rank

    return triangle_rank(p, ["p", "event_type"], out="__trk").withColumn(
        "rk", F.col("__trk").cast("int")
    ).drop("__trk")


def _fdr_step_up(r, thresh_name: str, thresh_col=None):
    """Apply the step-up rule to the ranked hypothesis table: find the
    largest rank whose p clears its threshold; every rank at or below
    it is a discovery.  ``thresh_col`` defaults to the BH line
    rk*q/m (q = 0.1)."""
    if thresh_col is None:
        thresh_col = F.col("rk") * F.lit(0.1) / F.col("m")
    d = r.select(
        "event_type", "n", "m", "z", "p", "rk",
        F.round(thresh_col, 9).alias(thresh_name),
        F.when(F.col("p") <= thresh_col, F.col("rk")).alias("pass_rk"),
    )
    mx = d.agg(F.coalesce(F.max("pass_rk"), F.lit(0)).alias("k"))
    return (
        d.crossJoin(F.broadcast(mx))
        .select(
            "event_type", F.col("n").cast("long").alias("n"), "z", "p",
            "rk", thresh_name,
            (F.col("rk") <= F.col("k")).cast("int").alias("discovery"),
        )
        .orderBy("rk")
    )


_BY_SQL = f"""
    WITH {_RANKED_P_CTES},
    h AS (SELECT sum(CAST(round(1e9 / rk) AS BIGINT)) AS c_nano FROM r),
    d AS (SELECT r.*,
                 round(rk * 0.1 / (m * (h.c_nano / 1e9)), 9) AS by_thresh,
                 CASE WHEN p <= rk * 0.1 / (m * (h.c_nano / 1e9))
                      THEN rk END AS pass_rk
          FROM r CROSS JOIN h),
    mx AS (SELECT coalesce(max(pass_rk), 0) AS k FROM d)
    SELECT event_type, CAST(n AS BIGINT) AS n, z, p, rk, by_thresh,
           CAST(CASE WHEN rk <= mx.k THEN 1 ELSE 0 END AS INT) AS discovery
    FROM d CROSS JOIN mx ORDER BY rk
"""


@register("q_benjamini_yekutieli", sql=_BY_SQL)
def q_benjamini_yekutieli(spark, sf_dir):
    """Benjamini-Yekutieli FDR control (q = 0.1) over the same per-type
    Welch-z hypothesis table as q_bh_fdr — the DEPENDENT-test variant
    (Benjamini & Yekutieli 2001, Ann. Stat. 29(4)): under arbitrary
    dependence between the m tests the BH line must shrink by the
    harmonic factor c(m) = sum_{i=1..m} 1/i, so the step-up threshold
    is rk*q/(m*c(m)).  Overlapping segments (a user's events land in
    several types' complements) make the per-type contrasts
    dependent, which is exactly BY's setting; it discovers a subset
    of BH's discoveries by construction.

    Exactness: the harmonic sum is the ONE new float surface and it
    rides the nano-int protocol — each 1/i is HALF_UP nano-rounded to
    a BIGINT and SUMMED as integers (order-free, both engines
    identical; the 1e-9-per-term quantization is ~1e-8 relative on
    c(m), far inside the 9dp threshold rounding), computed from the
    rank column itself (each hypothesis row holds one rank in 1..m,
    so sum over rows = sum over i).  Everything upstream is the
    q_bh_fdr machinery unchanged (milli-int sufficient statistics,
    6dp z, A-S 9dp p, triangle rank).

    Scale shape: identical to q_bh_fdr — corpus-sized data only flows
    through the one map-side-combined per-type aggregate; the
    harmonic aggregate and step-up run on m = type-cardinality rows."""
    from shadems_spark.operators.dedup import tracked_persist

    # r feeds BOTH the harmonic aggregate and the step-up rows —
    # persist the m-row ranked table so the Welch/rank pipeline
    # compiles and runs once, not twice (plan-snapshot evidence: 80
    # shuffles unpersisted vs q_bh_fdr's 40)
    r = tracked_persist(
        _ranked_hypotheses(spark, sf_dir), key="fdr_ranked"
    )
    h = r.agg(
        F.sum(F.round(F.lit(1e9) / F.col("rk")).cast("long")).alias("c_nano")
    )
    rh = r.crossJoin(F.broadcast(h))
    thresh = (
        F.col("rk") * F.lit(0.1)
        / (F.col("m") * (F.col("c_nano") / F.lit(1e9)))
    )
    return _fdr_step_up(rh, "by_thresh", thresh)


@register(
    "q_chisq",
    sql="""
    WITH c AS (SELECT event_type,
                      (datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       + 4) % 7 AS dow,
                      count(*) AS obs
               FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, dow, obs,
                 sum(obs) OVER (PARTITION BY event_type) AS rt,
                 sum(obs) OVER (PARTITION BY dow) AS ct
          FROM c),
    t AS (SELECT sum(obs) AS n,
                 (count(DISTINCT event_type) - 1)
                 * (count(DISTINCT dow) - 1) AS dof
          FROM c),
    x AS (SELECT event_type, dow, obs, rt, ct, n, dof,
                 rt * CAST(ct AS DOUBLE) / n AS e
          FROM w CROSS JOIN t),
    y AS (SELECT *,
                 CAST(round((obs - e) * (obs - e) / e * 1e9) AS BIGINT)
                     AS contrib_n
          FROM x),
    z AS (SELECT sum(contrib_n) AS chi2_n FROM y)
    SELECT event_type, CAST(dow AS BIGINT) AS dow,
           CAST(obs AS BIGINT) AS obs,
           round(e, 6) AS expected,
           round(contrib_n / 1e9, 6) AS contrib,
           round(chi2_n / 1e9, 6) AS chi2,
           CAST(dof AS BIGINT) AS dof
    FROM y CROSS JOIN z
    ORDER BY event_type, dow
    """,
)
def q_chisq(spark, sf_dir):
    """Chi-square test of independence over the event_type x
    day-of-week contingency table — the categorical drift screen
    beside the value-distribution family (q_ks_test/q_mannwhitney
    compare numeric samples; chi-square asks whether traffic MIX
    depends on weekday).  Emits the full cell table (observed,
    expected, per-cell contribution) plus the omnibus statistic and
    degrees of freedom on every row.

    Exactness: observed counts are integers; day-of-week derives
    arithmetically from epoch days ((d + 4) % 7 — no engine dow()
    convention involved); each cell's (o-e)^2/e is nano-int-rounded
    BEFORE the cross-cell sum, so chi2 is an order-free integer sum.
    Scale: one map-side-combined aggregate to |types| x 7 cells, then
    windows and reductions over that bounded cell table — never
    row-sized; the 1-row totals frame joins back via broadcast."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.select(
            "event_type",
            F.pmod(
                F.datediff(
                    F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
                )
                + 4,
                F.lit(7),
            ).alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    w = c.select(
        "event_type", "dow", "obs",
        F.sum("obs").over(W.partitionBy("event_type")).alias("rt"),
        F.sum("obs").over(W.partitionBy("dow")).alias("ct"),
    )
    t = c.agg(
        F.sum("obs").alias("n"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("dow") - 1)
        ).alias("dof"),
    )
    x = w.crossJoin(F.broadcast(t)).withColumn(
        "e", F.col("rt") * F.col("ct").cast("double") / F.col("n")
    )
    y = x.withColumn(
        "contrib_n",
        F.round(
            (F.col("obs") - F.col("e")) * (F.col("obs") - F.col("e"))
            / F.col("e") * F.lit(1e9)
        ).cast("long"),
    )
    z = y.agg(F.sum("contrib_n").alias("chi2_n"))
    return (
        y.crossJoin(F.broadcast(z))
        .select(
            "event_type",
            F.col("dow").cast("long").alias("dow"),
            F.col("obs").cast("long").alias("obs"),
            F.round("e", 6).alias("expected"),
            F.round(F.col("contrib_n") / 1e9, 6).alias("contrib"),
            F.round(F.col("chi2_n") / 1e9, 6).alias("chi2"),
            F.col("dof").cast("long").alias("dof"),
        )
        .orderBy("event_type", "dow")
    )


@register(
    "q_spearman",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      count(*) AS x,
                      sum(CAST(round(coalesce(value, 0) * 1000)
                          AS BIGINT)) AS y
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, x, y,
                 2 * rank() OVER (PARTITION BY event_type ORDER BY x)
                 + count(*) OVER (PARTITION BY event_type, x) - 1 AS rx2,
                 2 * rank() OVER (PARTITION BY event_type ORDER BY y)
                 + count(*) OVER (PARTITION BY event_type, y) - 1 AS ry2
          FROM d),
    s AS (SELECT event_type, count(*) AS n,
                 sum(rx2) AS sx, sum(ry2) AS sy,
                 sum(rx2 * rx2) AS sxx, sum(ry2 * ry2) AS syy,
                 sum(rx2 * ry2) AS sxy,
                 sum(x) AS vx, sum(y) AS vy,
                 sum(x * x) AS vxx, sum(y * y) AS vyy,
                 sum(x * y) AS vxy
          FROM r GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                        * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),
                 6) AS rho_spearman,
           round((n * CAST(vxy AS DOUBLE) - CAST(vx AS DOUBLE) * vy)
                 / sqrt((n * CAST(vxx AS DOUBLE) - CAST(vx AS DOUBLE) * vx)
                        * (n * CAST(vyy AS DOUBLE) - CAST(vy AS DOUBLE) * vy)),
                 6) AS r_pearson
    FROM s ORDER BY event_type
    """,
)
def q_spearman(spark, sf_dir):
    """Spearman rank correlation (with its Pearson companion) between
    daily event count and daily value volume, per event type — the
    monotone-association screen of the drift family: Pearson answers
    "linear?", Spearman answers "monotone?" and is outlier-robust.
    Tied ranks use the textbook average-rank correction.

    Exactness: average ranks are carried as exact integer HALF-ranks
    (2*rank + ties - 1 — rank() min-rank plus the tie-count shift, no
    fractional rank ever materializes); Pearson inputs are integer
    daily counts and milli-int value sums; every cross-row sum is an
    integer sum, and each coefficient is one fixed float formula per
    group.  (At >=1e9-scale daily value volume, move the y*y sums to
    DECIMAL(38) — documented bound, the q_anova discipline.)
    Scale: a (type, day) map-side aggregate bounds the series by the
    calendar, rank windows partition per type over that bounded
    series, and the final reduce is 5 rows."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(
            F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 1000).cast("long")
        ).alias("y"),
    )
    rx2 = (
        2 * F.rank().over(W.partitionBy("event_type").orderBy("x"))
        + F.count(F.lit(1)).over(W.partitionBy("event_type", "x")) - 1
    )
    ry2 = (
        2 * F.rank().over(W.partitionBy("event_type").orderBy("y"))
        + F.count(F.lit(1)).over(W.partitionBy("event_type", "y")) - 1
    )
    r = d.select("event_type", "x", "y", rx2.alias("rx2"), ry2.alias("ry2"))
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").alias("sx"), F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
        F.sum("x").alias("vx"), F.sum("y").alias("vy"),
        F.sum(F.col("x") * F.col("x")).alias("vxx"),
        F.sum(F.col("y") * F.col("y")).alias("vyy"),
        F.sum(F.col("x") * F.col("y")).alias("vxy"),
    )

    def pearson(n, sx, sy, sxx, syy, sxy):
        num = n * sxy.cast("double") - sx.cast("double") * sy
        den = F.sqrt(
            (n * sxx.cast("double") - sx.cast("double") * sx)
            * (n * syy.cast("double") - sy.cast("double") * sy)
        )
        return F.round(num / den, 6)

    c = F.col
    return s.select(
        "event_type",
        c("n").cast("long").alias("n_days"),
        pearson(c("n"), c("sx"), c("sy"), c("sxx"), c("syy"), c("sxy"))
        .alias("rho_spearman"),
        pearson(c("n"), c("vx"), c("vy"), c("vxx"), c("vyy"), c("vxy"))
        .alias("r_pearson"),
    ).orderBy("event_type")


def _corr_matrix_sql() -> str:
    cols = ", ".join(
        f"CAST(round({v} * {s}) AS BIGINT) AS v{i}"
        for i, (v, s) in enumerate(zip(_CM_VARS, _CM_SCALE))
    )
    stats = []
    for i in range(len(_CM_VARS)):
        stats.append(f"sum(v{i}) AS s{i}")
        for j in range(i, len(_CM_VARS)):
            stats.append(f"sum(v{i} * v{j}) AS s{i}_{j}")
    pairs = []
    for i, vi in enumerate(_CM_VARS):
        for j, vj in enumerate(_CM_VARS):
            a, b = min(i, j), max(i, j)
            pairs.append(
                f"""SELECT '{vi}' AS var_x, '{vj}' AS var_y,
                round((n * CAST(s{a}_{b} AS DOUBLE)
                       - CAST(s{a} AS DOUBLE) * s{b})
                      / sqrt((n * CAST(s{a}_{a} AS DOUBLE)
                              - CAST(s{a} AS DOUBLE) * s{a})
                             * (n * CAST(s{b}_{b} AS DOUBLE)
                                - CAST(s{b} AS DOUBLE) * s{b})), 6)
                    AS corr FROM g"""
            )
    u = "\n            UNION ALL ".join(pairs)
    return f"""
    WITH s AS (SELECT {cols} FROM lineitem),
    g AS (SELECT count(*) AS n, {", ".join(stats)} FROM s)
    SELECT * FROM ({u}) ORDER BY var_x, var_y
    """


@register("q_corr_matrix", sql=_corr_matrix_sql())
def q_corr_matrix(spark, sf_dir):
    """Full pairwise Pearson correlation matrix over the lineitem
    numeric measures in ONE scan — the profiling primitive behind
    feature selection and multicollinearity checks: k variables need
    k + k(k+1)/2 sufficient statistics, all gathered by a single
    map-side-combined aggregate, never k^2 passes or a driver loop.

    Exactness: each variable is rounded to its own integer unit
    (_CM_SCALE — correlation is scale-invariant, so every variable
    picks the coarsest unit whose SQUARED sum keeps int64 headroom;
    deci-dollar prices hold through ~sf1, DECIMAL(38) beyond — the
    q_anova bound), every cross sum is an exact integer, and each
    coefficient is the fixed (n*sxy - sx*sy)/sqrt(...) formula over
    them; the matrix unpivots from the single stats row, so symmetry
    and unit diagonal are structural.  Scale: one scan, one 1-row
    reduce, 16 output rows — adding a variable grows the aggregate
    width, not the pass count."""
    from shadems_spark.operators.exprcache import memo

    li = load_table(spark, sf_dir, "lineitem")
    # the scaled projection, the k+k(k+1)/2-wide aggregate list and
    # the k^2 coefficient cells are all pure functions of _CM_VARS —
    # memoized so re-builds skip ~1.3 s of py4j construction latency
    s = li.select(
        *memo(
            ("cm_proj", tuple(_CM_VARS), tuple(_CM_SCALE)),
            lambda: [
                F.round(F.col(v) * sc).cast("long").alias(f"v{i}")
                for i, (v, sc) in enumerate(zip(_CM_VARS, _CM_SCALE))
            ],
        )
    )

    def _build_aggs():
        aggs = [F.count(F.lit(1)).alias("n")]
        for i in range(len(_CM_VARS)):
            aggs.append(F.sum(F.col(f"v{i}")).alias(f"s{i}"))
            for j in range(i, len(_CM_VARS)):
                aggs.append(
                    F.sum(F.col(f"v{i}") * F.col(f"v{j}")).alias(f"s{i}_{j}")
                )
        return aggs

    g = s.agg(*memo(("cm_aggs", tuple(_CM_VARS)), _build_aggs))

    def _build_cells():
        c = F.col
        cells = []
        for i, vi in enumerate(_CM_VARS):
            for j, vj in enumerate(_CM_VARS):
                a, b = min(i, j), max(i, j)
                num = c("n") * c(f"s{a}_{b}").cast("double") - c(
                    f"s{a}"
                ).cast("double") * c(f"s{b}")
                den = F.sqrt(
                    (
                        c("n") * c(f"s{a}_{a}").cast("double")
                        - c(f"s{a}").cast("double") * c(f"s{a}")
                    )
                    * (
                        c("n") * c(f"s{b}_{b}").cast("double")
                        - c(f"s{b}").cast("double") * c(f"s{b}")
                    )
                )
                cells.append(
                    F.struct(
                        F.lit(vi).alias("var_x"),
                        F.lit(vj).alias("var_y"),
                        F.round(num / den, 6).alias("corr"),
                    )
                )
        return F.explode(F.array(*cells)).alias("c")

    return (
        g.select(memo(("cm_cells", tuple(_CM_VARS)), _build_cells))
        .select("c.var_x", "c.var_y", "c.corr")
        .orderBy("var_x", "var_y")
    )


@register(
    "q_moments",
    sql="""
    WITH s AS (SELECT event_type,
                      CAST(round(value) AS BIGINT) AS v
               FROM events WHERE value IS NOT NULL),
    g AS (SELECT event_type, count(*) AS n, sum(v) AS s1,
                 sum(v * v) AS s2, sum(v * v * v) AS s3,
                 sum(v * v * v * v) AS s4
          FROM s GROUP BY 1),
    m AS (SELECT event_type, n,
                 CAST(s1 AS DOUBLE) / n AS m1,
                 CAST(s2 AS DOUBLE) / n AS r2,
                 CAST(s3 AS DOUBLE) / n AS r3,
                 CAST(s4 AS DOUBLE) / n AS r4
          FROM g),
    c AS (SELECT event_type, n, m1,
                 r2 - m1 * m1 AS mu2,
                 r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1 AS mu3,
                 r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2
                    - 3 * m1 * m1 * m1 * m1 AS mu4
          FROM m)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(m1, 6) AS mean,
           round(sqrt(mu2), 6) AS std_pop,
           round(mu3 / (mu2 * sqrt(mu2)), 6) AS skewness,
           round(mu4 / (mu2 * mu2) - 3.0, 6) AS excess_kurtosis
    FROM c ORDER BY event_type
    """,
)
def q_moments(spark, sf_dir):
    """Higher-moment profile (skewness, excess kurtosis) of event
    value per type from ONE pass of raw power sums — the tail-shape
    screen the mean/variance profile misses: skew > 0 flags the
    long-right-tail metrics that need log transforms, kurtosis >> 0
    flags outlier-dominated ones where winsorization matters.

    Exactness: values are unit-int rounded per row (the 4th-power
    sum bounds int64 through ~1e12 rows at this value range — finer
    rounding would overflow at the 4th power, the documented
    precision/headroom trade; DECIMAL(38) buys finer units), all four
    power sums are exact integers, and central moments come from the
    fixed raw-to-central identities.  Scale: one map-side-combined
    |types|-key aggregate; nothing else."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(
        "event_type", F.round(F.col("value")).cast("long").alias("v")
    )
    v = F.col("v")
    g = s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    c = F.col
    m = g.select(
        "event_type", "n",
        (c("s1").cast("double") / c("n")).alias("m1"),
        (c("s2").cast("double") / c("n")).alias("r2"),
        (c("s3").cast("double") / c("n")).alias("r3"),
        (c("s4").cast("double") / c("n")).alias("r4"),
    )
    mu2 = c("r2") - c("m1") * c("m1")
    mu3 = c("r3") - 3 * c("m1") * c("r2") + 2 * c("m1") * c("m1") * c("m1")
    mu4 = (
        c("r4") - 4 * c("m1") * c("r3")
        + 6 * c("m1") * c("m1") * c("r2")
        - 3 * c("m1") * c("m1") * c("m1") * c("m1")
    )
    cc = m.select(
        "event_type", "n", "m1",
        mu2.alias("mu2"), mu3.alias("mu3"), mu4.alias("mu4"),
    )
    return cc.select(
        "event_type", c("n").cast("long").alias("n"),
        F.round("m1", 6).alias("mean"),
        F.round(F.sqrt(c("mu2")), 6).alias("std_pop"),
        F.round(c("mu3") / (c("mu2") * F.sqrt(c("mu2"))), 6).alias("skewness"),
        F.round(c("mu4") / (c("mu2") * c("mu2")) - 3.0, 6).alias(
            "excess_kurtosis"
        ),
    ).orderBy("event_type")


@register(
    "q_kendall",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      count(*) AS x,
                      sum(CAST(round(coalesce(value, 0) * 1000)
                          AS BIGINT)) AS y
               FROM events GROUP BY 1, 2),
    p AS (SELECT a.event_type,
                 sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                     THEN 1 ELSE 0 END) AS conc,
                 sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                     THEN 1 ELSE 0 END) AS disc,
                 sum(CASE WHEN a.x = b.x AND a.y != b.y
                     THEN 1 ELSE 0 END) AS tie_x,
                 sum(CASE WHEN a.y = b.y AND a.x != b.x
                     THEN 1 ELSE 0 END) AS tie_y,
                 sum(CASE WHEN a.x = b.x AND a.y = b.y
                     THEN 1 ELSE 0 END) AS tie_xy,
                 count(*) AS n_pairs
          FROM d a JOIN d b ON a.event_type = b.event_type
                           AND a.day < b.day
          GROUP BY 1)
    SELECT event_type,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(conc AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           round((conc - disc)
                 / sqrt((n_pairs - tie_x - tie_xy)
                        * CAST(n_pairs - tie_y - tie_xy AS DOUBLE)), 6)
               AS tau_b
    FROM p ORDER BY event_type
    """,
)
def q_kendall(spark, sf_dir):
    """Kendall tau-b rank correlation between daily event count and
    daily value volume per type — the third association measure
    beside q_spearman (tau counts pairwise order inversions, so it
    is the most outlier-robust and has the cleanest confidence
    interpretation; tau-b corrects for ties in either series).

    Exactness: concordant/discordant/tie counts are exact integer
    pair sums over the bounded day series; tau-b is one fixed float
    formula per type.  Scale: the O(days^2) pair join is calendar-
    bounded per type (366 days -> 67k pairs) regardless of corpus
    size — the row-sized work is only the (type, day) map-side
    aggregate; at multi-decade calendars switch to the O(n log n)
    merge-sort inversion count."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(
            F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
            .cast("long")
        ).alias("y"),
    )
    b = d.select(
        "event_type",
        F.col("day").alias("day2"), F.col("x").alias("x2"),
        F.col("y").alias("y2"),
    )
    j = d.join(b, "event_type").filter(F.col("day") < F.col("day2"))
    dx = F.col("x") - F.col("x2")
    dy = F.col("y") - F.col("y2")
    p = j.groupBy("event_type").agg(
        F.sum((dx * dy > 0).cast("int")).alias("conc"),
        F.sum((dx * dy < 0).cast("int")).alias("disc"),
        F.sum(((dx == 0) & (dy != 0)).cast("int")).alias("tie_x"),
        F.sum(((dy == 0) & (dx != 0)).cast("int")).alias("tie_y"),
        F.sum(((dx == 0) & (dy == 0)).cast("int")).alias("tie_xy"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    c = F.col
    return p.select(
        "event_type",
        c("n_pairs").cast("long").alias("n_pairs"),
        c("conc").cast("long").alias("concordant"),
        c("disc").cast("long").alias("discordant"),
        F.round(
            (c("conc") - c("disc"))
            / F.sqrt(
                (c("n_pairs") - c("tie_x") - c("tie_xy"))
                * (c("n_pairs") - c("tie_y") - c("tie_xy")).cast("double")
            ),
            6,
        ).alias("tau_b"),
    ).orderBy("event_type")


@register(
    "q_wilcoxon",
    sql="""
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                          AS x,
                      sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                          AS y
               FROM events GROUP BY 1),
    f AS (SELECT day, x - y AS diff, abs(x - y) AS ad
          FROM d WHERE x != y),
    r AS (SELECT diff, ad,
                 2 * rank() OVER (ORDER BY ad)
                 + count(*) OVER (PARTITION BY ad) - 1 AS r2
          FROM f),
    tie AS (SELECT sum(t * t * t - t) AS t3t
            FROM (SELECT count(*) AS t FROM f GROUP BY ad)),
    s AS (SELECT count(*) AS n,
                 sum(CASE WHEN diff > 0 THEN r2 ELSE 0 END) AS w2
          FROM r)
    SELECT CAST(s.n AS BIGINT) AS n_pairs,
           round(s.w2 / 2.0, 1) AS w_plus,
           round((s.w2 / 2.0 - s.n * (s.n + 1) / 4.0)
                 / sqrt(s.n * (s.n + 1) * (2.0 * s.n + 1) / 24.0
                        - coalesce(tie.t3t, 0) / 48.0), 6) AS z
    FROM s CROSS JOIN tie
    """,
)
def q_wilcoxon(spark, sf_dir):
    """Wilcoxon signed-rank test on the PAIRED daily (view, click)
    counts — the paired companion to q_mannwhitney's two-independent-
    samples test: same days, two metrics, does one systematically
    exceed the other?  Uses average ranks over |diff| (half-rank
    integers, the q_spearman protocol), drops zero diffs, and applies
    the tie-corrected normal approximation.

    Exactness: diffs and half-ranks are exact integers, the tie term
    sum(t^3 - t) is an integer aggregate, and z is one fixed float
    formula.  The rank window is GLOBAL but over the paired-day
    table — calendar-bounded by construction (<= days rows), the
    documented bounded-input exemption (q_auc's per-score
    precedent).  Scale: one conditional (day)-key aggregate is the
    only data-sized stage."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum((F.col("event_type") == "view").cast("int")).alias("x"),
        F.sum((F.col("event_type") == "click").cast("int")).alias("y"),
    )
    f = d.filter(F.col("x") != F.col("y")).select(
        (F.col("x") - F.col("y")).alias("diff"),
        F.abs(F.col("x") - F.col("y")).alias("ad"),
    )
    # Average ranks over |diff| WITHOUT a global window: collapse to
    # the per-distinct-|diff| table (calendar-bounded), take the
    # strict triangle prefix count (cumlt), and expand each tie
    # group's doubled rank sum in closed form — for a group of t tied
    # rows after cumlt smaller ones, every row's doubled average rank
    # is 2*cumlt + t + 1, so the positive-diff rank sum is
    # sum npos * (2*cumlt + t + 1): pure integers, identical to the
    # rank()+count() window values (VERDICT r7 #5 conversion; the
    # oracle keeps DuckDB's own window plan)."""
    from shadems_spark.operators.profile import triangle_cumsum

    fd = f.groupBy("ad").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum((F.col("diff") > 0).cast("int")).cast("long").alias("npos"),
    )
    cl = triangle_cumsum(fd, ["ad"], {"__cumlt": "t"}, strict=True)
    tie = fd.agg(
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("t3t")
    )
    s = cl.agg(
        F.sum("t").alias("n"),
        F.sum(
            F.col("npos") * (2 * F.col("__cumlt") + F.col("t") + 1)
        ).alias("w2"),
    )
    c = F.col
    return (
        s.crossJoin(F.broadcast(tie))
        .select(
            c("n").cast("long").alias("n_pairs"),
            F.round(c("w2") / 2.0, 1).alias("w_plus"),
            F.round(
                (c("w2") / 2.0 - c("n") * (c("n") + 1) / 4.0)
                / F.sqrt(
                    c("n") * (c("n") + 1) * (2.0 * c("n") + 1) / 24.0
                    - F.coalesce(c("t3t"), F.lit(0)) / 48.0
                ),
                6,
            ).alias("z"),
        )
    )


@register(
    "q_friedman",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    b AS (SELECT min(day) AS d0,
                 datediff('day', min(day), max(day)) AS span FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    grid AS (SELECT t.event_type, g.x AS day_i, coalesce(d.y, 0) AS y
             FROM types t
             CROSS JOIN (SELECT unnest(generate_series(0,
                                (SELECT span FROM b))) AS x) g
             LEFT JOIN d ON d.event_type = t.event_type
                        AND d.day = (SELECT d0 FROM b) + INTERVAL (g.x) DAY),
    r AS (SELECT event_type, day_i,
                 2 * rank() OVER (PARTITION BY day_i ORDER BY y)
                 + count(*) OVER (PARTITION BY day_i, y) - 1 AS r2
          FROM grid),
    tie AS (SELECT sum(t * t * t - t) AS t3t
            FROM (SELECT count(*) AS t FROM grid GROUP BY day_i, y)),
    rj AS (SELECT event_type, CAST(sum(r2) AS BIGINT) AS rj2,
                  CAST(count(*) AS BIGINT) AS n
           FROM r GROUP BY 1),
    k AS (SELECT count(*) AS k, max(n) AS n,
                 sum(CAST(rj2 AS DOUBLE) * rj2 / 4.0) AS sr2
          FROM rj),
    chi AS (SELECT k.k, k.n,
                   (12.0 / (k.n * k.k * (k.k + 1)) * k.sr2
                    - 3.0 * k.n * (k.k + 1))
                   / (1.0 - coalesce(tie.t3t, 0)
                      / (CAST(k.n AS DOUBLE) * k.k * (k.k * k.k - 1)))
                       AS chi2
            FROM k CROSS JOIN tie)
    SELECT rj.event_type,
           round(rj.rj2 / 2.0 / rj.n, 4) AS mean_rank,
           CAST(chi.k AS BIGINT) AS k_types,
           CAST(chi.n AS BIGINT) AS n_days,
           round(chi.chi2, 6) AS chi2_f,
           CAST(chi.k - 1 AS BIGINT) AS dof
    FROM rj CROSS JOIN chi ORDER BY rj.event_type
    """,
)
def q_friedman(spark, sf_dir):
    """Friedman test (the nonparametric repeated-measures ANOVA) over
    the zero-filled day x type grid: rank the k types WITHIN each day
    (blocks), compare mean ranks — the k-sample omnibus that, unlike
    q_anova, never assumes normality, and unlike q_kendall/q_spearman
    handles all types at once.  Tie-corrected (average half-ranks +
    the (t^3 - t) denominator adjustment).

    Exactness: half-ranks and the tie sum are exact integers; chi2 is
    one fixed float formula over them.  Scale: rank windows partition
    per DAY (k rows each — perfectly parallel); the grid is the
    types x calendar frame; the only data-sized stage is the
    (type, day) map-side aggregate."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    grid = _daily_grid(ev, x_name="day_i")
    r2 = (
        2 * F.rank().over(W.partitionBy("day_i").orderBy("y"))
        + F.count(F.lit(1)).over(W.partitionBy("day_i", "y")) - 1
    )
    r = grid.select("event_type", "day_i", r2.alias("r2"))
    tie = (
        grid.groupBy("day_i", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("t3t")
        )
    )
    rj = r.groupBy("event_type").agg(
        F.sum("r2").cast("long").alias("rj2"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    k = rj.agg(
        F.count(F.lit(1)).alias("k"),
        F.max("n").alias("n"),
        F.sum(F.col("rj2").cast("double") * F.col("rj2") / 4.0).alias("sr2"),
    )
    c = F.col
    chi = (
        k.crossJoin(F.broadcast(tie))
        .select(
            "k", F.col("n").alias("nn"),
            (
                (
                    12.0 / (c("n") * c("k") * (c("k") + 1)) * c("sr2")
                    - 3.0 * c("n") * (c("k") + 1)
                )
                / (
                    1.0
                    - F.coalesce(c("t3t"), F.lit(0))
                    / (
                        c("n").cast("double") * c("k")
                        * (c("k") * c("k") - 1)
                    )
                )
            ).alias("chi2"),
        )
    )
    return (
        rj.crossJoin(F.broadcast(chi))
        .select(
            "event_type",
            F.round(c("rj2") / 2.0 / c("n"), 4).alias("mean_rank"),
            c("k").cast("long").alias("k_types"),
            c("nn").cast("long").alias("n_days"),
            F.round("chi2", 6).alias("chi2_f"),
            (c("k") - 1).cast("long").alias("dof"),
        )
        .orderBy("event_type")
    )


@register(
    "q_power_analysis",
    sql="""
    WITH u AS (SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
                      CAST(max(CASE WHEN event_type = 'purchase'
                                    AND value > 95
                               THEN 1 ELSE 0 END) AS INT) AS converted
               FROM events GROUP BY 1),
    g AS (SELECT count(*) AS n, CAST(sum(converted) AS BIGINT) AS conv
          FROM u),
    p AS (SELECT n, conv, conv / CAST(n AS DOUBLE) AS p0 FROM g),
    mde AS (SELECT p.n, p.conv, p.p0, m.rel AS rel_mde,
                   p.p0 * m.rel AS delta,
                   -- two-sided alpha=.05, power=.80:
                   -- n/arm = (z_a/2 + z_b)^2 * 2 p(1-p) / delta^2
                   CAST(ceil((1.959963984540054 + 0.8416212335729143)
                             * (1.959963984540054 + 0.8416212335729143)
                             * 2.0 * p.p0 * (1.0 - p.p0)
                             / (p.p0 * m.rel * p.p0 * m.rel))
                        AS BIGINT) AS n_per_arm
            FROM p CROSS JOIN (SELECT unnest([0.01, 0.02, 0.05, 0.10,
                                              0.20]) AS rel) m)
    SELECT round(rel_mde, 2) AS rel_mde,
           CAST(n AS BIGINT) AS n_users_observed,
           round(p0, 6) AS base_rate,
           round(delta, 6) AS abs_mde,
           n_per_arm,
           CAST(CASE WHEN n / 2 >= n_per_arm THEN 1 ELSE 0 END AS INT)
               AS powered_today
    FROM mde ORDER BY rel_mde
    """,
)
def q_power_analysis(spark, sf_dir):
    """Experiment power / sample-size table for the q_abtest
    conversion metric: for each candidate relative MDE, the required
    n per arm at alpha = .05 two-sided, power = .80 (the standard
    (z_{a/2} + z_B)^2 * 2p(1-p) / delta^2), and whether the observed
    population already powers it — the run-it-or-don't gate every
    experimentation platform evaluates before q_abtest ever reads a
    z-score.

    Exactness: the base rate comes from exact integer user counts;
    each row is one fixed float formula with the normal quantiles as
    literals (no engine stats functions involved); ceil is exact on
    both engines.  Scale: one per-user conditional aggregate then a
    constant 5-row table."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase") & (F.col("value") > 95)
            ).cast("int")
        ).alias("converted")
    )
    g = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    rels = spark.createDataFrame(
        [(0.01,), (0.02,), (0.05,), (0.10,), (0.20,)], ["rel"]
    )
    za, zb = 1.959963984540054, 0.8416212335729143
    c = F.col
    p0 = c("conv") / c("n").cast("double")
    m = g.crossJoin(F.broadcast(rels)).select(
        "n", "conv", "rel", p0.alias("p0"),
        (p0 * c("rel")).alias("delta"),
    )
    n_req = F.ceil(
        F.lit((za + zb) * (za + zb))
        * 2.0 * c("p0") * (1.0 - c("p0"))
        / (c("delta") * c("delta"))
    ).cast("long")
    return m.select(
        F.round("rel", 2).alias("rel_mde"),
        c("n").cast("long").alias("n_users_observed"),
        F.round("p0", 6).alias("base_rate"),
        F.round("delta", 6).alias("abs_mde"),
        n_req.alias("n_per_arm"),
        (c("n") / 2 >= n_req).cast("int").alias("powered_today"),
    ).orderBy("rel_mde")


@register(
    "q_weighted_median",
    sql="""
    WITH s AS (SELECT l_returnflag,
                      CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                      CAST(l_quantity AS BIGINT) AS w
               FROM lineitem),
    c AS (SELECT l_returnflag, v, w,
                 sum(w) OVER (PARTITION BY l_returnflag
                              ORDER BY v, w
                              ROWS UNBOUNDED PRECEDING) AS cw,
                 sum(w) OVER (PARTITION BY l_returnflag) AS tw
          FROM s),
    m AS (SELECT l_returnflag, min(v) AS med_centi,
                 max(tw) AS total_weight
          FROM c WHERE 2 * cw >= tw GROUP BY 1)
    SELECT l_returnflag,
           round(med_centi / 100.0, 2) AS weighted_median_price,
           CAST(total_weight AS BIGINT) AS total_weight
    FROM m ORDER BY l_returnflag
    """,
)
def q_weighted_median(spark, sf_dir):
    """Weighted median (lower weighted order statistic: the first
    value whose cumulative weight reaches half the total) of extended
    price weighted by quantity, per return flag — the robust center
    for quantity-weighted pricing where a plain median over-counts
    single-unit lines.

    Exactness: centi-int values, integer weights, and the defining
    inequality 2*cw >= tw compares integers.  Scale: the cumulative
    weights partition per flag here; for an UNGROUPED weighted median
    over unbounded rows the same definition rides the two-phase
    global_cumsum (the q_pr_auc shape) — the partitioned form is
    shown because grouped medians are the common case.  One window
    pass, one filter-aggregate."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    wo = W.partitionBy("l_returnflag").orderBy("v", "w")
    c = s.select(
        "l_returnflag", "v", "w",
        F.sum("w").over(wo.rowsBetween(W.unboundedPreceding, 0)).alias("cw"),
        F.sum("w").over(W.partitionBy("l_returnflag")).alias("tw"),
    )
    m = (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("v").alias("med_centi"),
            F.max("tw").alias("total_weight"),
        )
    )
    return m.select(
        "l_returnflag",
        F.round(F.col("med_centi") / 100.0, 2).alias(
            "weighted_median_price"
        ),
        F.col("total_weight").cast("long").alias("total_weight"),
    ).orderBy("l_returnflag")


# ------------------------------------------------------------------ round 7
# Experimentation/statistics classics the registry lacked: Welch and
# TOST on the purchase/non-purchase split, mean-based Levene, per-type
# MAD, a Simpson-reversal audit, the Lorenz concentration curve, and
# the two sequential monitors (SPRT, Page-Hinkley) over the calendar
# grid.  All follow the nano/milli-int exactness protocol and every
# oracle replays the identical fixed float formulas.


def _welch_stats(ev):
    """One-pass conditional aggregate of the purchase vs non-purchase
    value split: milli-int sums (the q_bh_fdr protocol) so the six
    sufficient statistics are summation-order-free integers."""
    vm = F.round(F.coalesce("value", F.lit(0)) * 1000).cast("long")
    is1 = F.col("event_type") == "purchase"
    return ev.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(~is1, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(is1, vm).otherwise(F.lit(0))).cast("long").alias("s1"),
        F.sum(F.when(~is1, vm).otherwise(F.lit(0))).cast("long").alias("s2"),
        F.sum(F.when(is1, vm * vm).otherwise(F.lit(0))).cast("long").alias("q1"),
        F.sum(F.when(~is1, vm * vm).otherwise(F.lit(0))).cast("long").alias("q2"),
    )


def _welch_moments():
    """The (m1, m2, v1, v2) column expressions over _welch_stats'
    six integer sufficient statistics — ONE definition shared by
    q_welch and q_tost so the milli-int variance formula cannot
    drift between them (it must mirror _WELCH_CTE's `f` CTE
    term-for-term).

    Degenerate-group guard (ADVICE r7): a group with n < 2 has no
    sample variance and n = 0 has no mean — emit NULL instead of a
    div-by-zero NaN/inf (NaN-vs-NULL would diverge between engines;
    NULL propagates identically through +,-,*,/ and the A-S
    polynomial on both)."""
    c = F.col
    m1 = F.when(c("n1") > 0, c("s1") / (c("n1") * 1000.0))
    m2 = F.when(c("n2") > 0, c("s2") / (c("n2") * 1000.0))
    v1 = F.when(
        c("n1") > 1,
        ((c("q1") - c("s1") * (c("s1") / c("n1").cast("double"))) / (c("n1") - 1)) / F.lit(1e6),
    )
    v2 = F.when(
        c("n2") > 1,
        ((c("q2") - c("s2") * (c("s2") / c("n2").cast("double"))) / (c("n2") - 1)) / F.lit(1e6),
    )
    return m1, m2, v1, v2


_WELCH_CTE = """
    v AS (SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
                 CAST(round(coalesce(value, 0) * 1000) AS BIGINT) AS vm
          FROM events),
    w AS (SELECT
            CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
            CAST(sum(CASE WHEN grp = 1 THEN vm ELSE 0 END) AS BIGINT) AS s1,
            CAST(sum(CASE WHEN grp = 0 THEN vm ELSE 0 END) AS BIGINT) AS s2,
            CAST(sum(CASE WHEN grp = 1 THEN vm * vm ELSE 0 END) AS BIGINT) AS q1,
            CAST(sum(CASE WHEN grp = 0 THEN vm * vm ELSE 0 END) AS BIGINT) AS q2
          FROM v),
    f AS (SELECT n1, n2,
                 CASE WHEN n1 > 0 THEN s1 / (n1 * 1000.0) END AS m1,
                 CASE WHEN n2 > 0 THEN s2 / (n2 * 1000.0) END AS m2,
                 CASE WHEN n1 > 1 THEN
                   ((q1 - s1 * (s1 / CAST(n1 AS DOUBLE))) / (n1 - 1)) / 1e6
                 END AS v1,
                 CASE WHEN n2 > 1 THEN
                   ((q2 - s2 * (s2 / CAST(n2 AS DOUBLE))) / (n2 - 1)) / 1e6
                 END AS v2
          FROM w)
"""


@register(
    "q_welch",
    sql=f"""
    WITH {_WELCH_CTE}
    SELECT n1, n2,
           round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t,
           round(((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2))
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)), 4) AS df,
           {_as_p_sql("((m1 - m2) / sqrt(v1 / n1 + v2 / n2))")} AS p
    FROM f
    """,
)
def q_welch(spark, sf_dir):
    """Welch's unequal-variance t-test of purchase vs non-purchase
    event values, with the Welch-Satterthwaite degrees of freedom —
    the default two-sample mean test of any experimentation stack
    (Student's equal-variance form is the anti-pattern at scale).

    Shape: ONE conditional aggregate over the scan (six integer
    sufficient statistics), then a 1-row closed form.  Exactness:
    milli-int value sums; t, df, and the A-S polynomial p are fixed
    float formulas over those integers, identical on both engines."""
    ev = load_table(spark, sf_dir, "events")
    c = F.col
    m1, m2, v1, v2 = _welch_moments()
    se2 = v1 / c("n1") + v2 / c("n2")
    t = (m1 - m2) / F.sqrt(se2)
    df = (se2 * se2) / (
        (v1 / c("n1")) * (v1 / c("n1")) / (c("n1") - 1)
        + (v2 / c("n2")) * (v2 / c("n2")) / (c("n2") - 1)
    )
    return _welch_stats(ev).select(
        "n1", "n2",
        F.round(m1 - m2, 6).alias("mean_diff"),
        F.round(t, 6).alias("t"),
        F.round(df, 4).alias("df"),
        _as_p_col(t).alias("p"),
    )


@register(
    "q_tost",
    sql=f"""
    WITH {_WELCH_CTE},
    e AS (SELECT n1, n2, m1, m2, sqrt(v1 / n1 + v2 / n2) AS se FROM f)
    SELECT n1, n2,
           round(m1 - m2, 6) AS mean_diff,
           round(se, 6) AS se,
           round((m1 - m2 + 0.05) / se, 6) AS t_lower,
           round((m1 - m2 - 0.05) / se, 6) AS t_upper,
           CASE WHEN (m1 - m2 + 0.05) / se >= 0
                THEN {_as_p_sql("((m1 - m2 + 0.05) / se)")} / 2
                ELSE 1.0 - {_as_p_sql("((m1 - m2 + 0.05) / se)")} / 2
           END AS p_lower,
           CASE WHEN (m1 - m2 - 0.05) / se <= 0
                THEN {_as_p_sql("((m1 - m2 - 0.05) / se)")} / 2
                ELSE 1.0 - {_as_p_sql("((m1 - m2 - 0.05) / se)")} / 2
           END AS p_upper,
           CAST((m1 - m2 + 0.05) / se > 1.6448536269514722
                AND (m1 - m2 - 0.05) / se < -1.6448536269514722
                AS INT) AS equivalent
    FROM e
    """,
)
def q_tost(spark, sf_dir):
    """Equivalence test (TOST, Schuirmann '87) on the same purchase /
    non-purchase split with margin ±0.05: two one-sided z-tests —
    H0 "the difference is OUTSIDE the margin" is rejected only when
    BOTH one-sided statistics clear the 5% normal critical value
    (1.6448...).  The ship-it test of A/B platforms: "no difference
    detected" (Welch p > .05) is NOT "equivalent"; TOST is.

    Same six integer sufficient statistics as q_welch (one scan, one
    closed form); the critical value is a shared literal, so the
    equivalent flag is integer-identical across engines.

    p_lower / p_upper are ONE-SIDED tail probabilities (ADVICE r7 —
    the earlier two-sided erfc labeling made equivalent=1 correspond
    to p < 0.10): upper tail P(Z >= t_lower) for the lower-margin
    test, lower tail P(Z <= t_upper) for the upper one, so
    equivalent = 1 iff both p's < 0.05.  Each is the A-S two-sided
    polynomial halved, reflected through 1 - p/2 when the statistic
    sits on the non-rejection side — all IEEE-exact ops over the
    identically-rounded two-sided value, so cross-engine exact."""
    ev = load_table(spark, sf_dir, "events")
    c = F.col
    m1, m2, v1, v2 = _welch_moments()
    se = F.sqrt(v1 / c("n1") + v2 / c("n2"))
    tl = (m1 - m2 + 0.05) / se
    tu = (m1 - m2 - 0.05) / se
    zc = F.lit(1.6448536269514722)
    p_lo = F.when(tl >= 0, _as_p_col(tl) / 2).otherwise(
        F.lit(1.0) - _as_p_col(tl) / 2
    )
    p_up = F.when(tu <= 0, _as_p_col(tu) / 2).otherwise(
        F.lit(1.0) - _as_p_col(tu) / 2
    )
    return _welch_stats(ev).select(
        "n1", "n2",
        F.round(m1 - m2, 6).alias("mean_diff"),
        F.round(se, 6).alias("se"),
        F.round(tl, 6).alias("t_lower"),
        F.round(tu, 6).alias("t_upper"),
        p_lo.alias("p_lower"),
        p_up.alias("p_upper"),
        ((tl > zc) & (tu < -zc)).cast("int").alias("equivalent"),
    )


@register(
    "q_levene",
    sql="""
    WITH v AS (SELECT event_type,
                      CAST(round(coalesce(value, 0) * 1000) AS BIGINT) AS vm
               FROM events),
    g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(vm) AS BIGINT) AS s
          FROM v GROUP BY 1),
    z AS (SELECT v.event_type,
                 CAST(round(abs(v.vm / 1000.0 - g.s / (g.n * 1000.0))
                            * 1e9) AS BIGINT) AS zn,
                 CAST(round(abs(v.vm / 1000.0 - g.s / (g.n * 1000.0))
                            * abs(v.vm / 1000.0 - g.s / (g.n * 1000.0))
                            * 1e9) AS BIGINT) AS zzn
          FROM v JOIN g USING (event_type)),
    gz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(zn) AS BIGINT) AS sz,
                  CAST(sum(zzn) AS BIGINT) AS szz
           FROM z GROUP BY 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nt,
                 CAST(sum(sz) AS BIGINT) AS szt
          FROM gz),
    parts AS (SELECT
        CAST(sum(CAST(round(gz.n * (gz.sz / (gz.n * 1e9) - t.szt / (t.nt * 1e9))
                            * (gz.sz / (gz.n * 1e9) - t.szt / (t.nt * 1e9))
                            * 1e9) AS BIGINT)) AS BIGINT) AS num_n,
        CAST(sum(CAST(round((gz.szz / 1e9
                             - gz.n * (gz.sz / (gz.n * 1e9))
                                    * (gz.sz / (gz.n * 1e9))) * 1e9)
                      AS BIGINT)) AS BIGINT) AS den_n
      FROM gz CROSS JOIN t)
    SELECT t.k, t.nt AS n,
           round((CAST(t.nt - t.k AS DOUBLE) / (t.k - 1))
                 * (parts.num_n / CAST(parts.den_n AS DOUBLE)), 6) AS w
    FROM t CROSS JOIN parts
    """,
)
def q_levene(spark, sf_dir):
    """Levene's test statistic (mean-centered form) for homogeneity
    of value variance across event types — the guard every pooled-
    variance analysis should run first (Welch exists precisely
    because this test usually fails in the wild).

    Two scans: group means from milli-int sums (k-row broadcast
    back), then absolute deviations nano-rounded PER ROW before the
    group sums — both cross-row sums are integer, so W is one fixed
    float formula over integers on both engines."""
    ev = load_table(spark, sf_dir, "events")
    vm = F.round(F.coalesce("value", F.lit(0)) * 1000).cast("long")
    v = ev.select("event_type", vm.alias("vm"))
    g = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("vm").cast("long").alias("s"),
    )
    zdev = F.abs(F.col("vm") / 1000.0 - F.col("s") / (F.col("n") * 1000.0))
    z = v.join(F.broadcast(g), "event_type").select(
        "event_type",
        F.round(zdev * 1e9).cast("long").alias("zn"),
        F.round(zdev * zdev * 1e9).cast("long").alias("zzn"),
    )
    gz = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("zn").cast("long").alias("sz"),
        F.sum("zzn").cast("long").alias("szz"),
    )
    t = gz.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nt"),
        F.sum("sz").cast("long").alias("szt"),
    )
    c = F.col
    zb_i = c("sz") / (c("n") * 1e9)
    zb = c("szt") / (c("nt") * 1e9)
    parts = gz.crossJoin(F.broadcast(t)).agg(
        F.sum(
            F.round(c("n") * (zb_i - zb) * (zb_i - zb) * 1e9).cast("long")
        ).cast("long").alias("num_n"),
        F.sum(
            F.round((c("szz") / 1e9 - c("n") * zb_i * zb_i) * 1e9).cast("long")
        ).cast("long").alias("den_n"),
    )
    return t.crossJoin(F.broadcast(parts)).select(
        "k",
        c("nt").alias("n"),
        F.round(
            ((c("nt") - c("k")).cast("double") / (c("k") - 1))
            * (c("num_n") / c("den_n").cast("double")),
            6,
        ).alias("w"),
    )


@register(
    "q_mad",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    a AS (SELECT event_type, list_sort(list(y)) AS ys,
                 CAST(count(*) AS BIGINT) AS n
          FROM d GROUP BY 1),
    m AS (SELECT event_type, n, ys,
                 ys[CAST((n + 1) // 2 AS INT)] AS med
          FROM a)
    SELECT event_type, n AS n_days, CAST(med AS BIGINT) AS med,
           CAST(list_sort(list_transform(ys, y -> abs(y - med)))
                [CAST((n + 1) // 2 AS INT)] AS BIGINT) AS mad
    FROM m ORDER BY event_type
    """,
)
def q_mad(spark, sf_dir):
    """Median absolute deviation of each type's daily event counts —
    the robust spread estimate behind outlier-day alerting (a spike
    day moves the std but not the MAD; threshold = med ± k·MAD is
    the standard robust band).

    Median convention: LOWER median (element (n+1) div 2 of the
    sorted list) — pure integer selection, no float halving, so both
    engines agree bit-for-bit.  Scale: the only data-sized stage is
    the (type, day) map-side aggregate; each per-type array is
    calendar-bounded."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    a = d.groupBy("event_type").agg(
        F.sort_array(F.collect_list("y")).alias("ys"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    mid = F.floor((F.col("n") + 1) / 2).cast("int")
    med = F.element_at("ys", mid)
    m = a.select("event_type", "n", "ys", med.alias("med"))
    mad = F.element_at(
        F.sort_array(
            F.transform("ys", lambda y: F.abs(y - F.col("med")))
        ),
        mid,
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("med").cast("long").alias("med"),
        mad.cast("long").alias("mad"),
    ).orderBy("event_type")


@register(
    "q_simpson",
    sql="""
    WITH o AS (SELECT o_orderstatus AS segment,
                      CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END AS urgent,
                      CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS big
               FROM orders),
    seg AS (SELECT segment,
                   CAST(sum(urgent) AS BIGINT) AS n_urgent,
                   CAST(sum(1 - urgent) AS BIGINT) AS n_other,
                   CAST(sum(CASE WHEN urgent = 1 THEN big ELSE 0 END)
                        AS BIGINT) AS big_urgent,
                   CAST(sum(CASE WHEN urgent = 0 THEN big ELSE 0 END)
                        AS BIGINT) AS big_other
            FROM o GROUP BY 1
            UNION ALL
            SELECT '__pooled',
                   CAST(sum(urgent) AS BIGINT),
                   CAST(sum(1 - urgent) AS BIGINT),
                   CAST(sum(CASE WHEN urgent = 1 THEN big ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN urgent = 0 THEN big ELSE 0 END) AS BIGINT)
            FROM o),
    r0 AS (SELECT segment, n_urgent, n_other,
                  CASE WHEN n_urgent > 0
                       THEN big_urgent / CAST(n_urgent AS DOUBLE) END AS ru,
                  CASE WHEN n_other > 0
                       THEN big_other / CAST(n_other AS DOUBLE) END AS ro
           FROM seg),
    r AS (SELECT segment, n_urgent, n_other,
                 round(ru, 6) AS rate_urgent,
                 round(ro, 6) AS rate_other,
                 CASE WHEN ru > ro THEN 1
                      WHEN ru < ro THEN -1
                      ELSE 0 END AS sgn
          FROM r0),
    p AS (SELECT sgn AS pooled_sgn FROM r WHERE segment = '__pooled')
    SELECT r.segment, r.n_urgent, r.n_other, r.rate_urgent, r.rate_other,
           CAST(CASE WHEN r.segment <> '__pooled'
                      AND r.sgn * p.pooled_sgn = -1
                THEN 1 ELSE 0 END AS INT) AS reversed
    FROM r CROSS JOIN p ORDER BY r.segment
    """,
)
def q_simpson(spark, sf_dir):
    """Simpson's-paradox audit: the big-order rate (totalprice >
    150k) of urgent vs non-urgent priorities, pooled AND per order-
    status segment, with a `reversed` flag wherever a segment's
    direction contradicts the pooled direction — the aggregation-
    reversal detector every slice-level metric dashboard needs
    before anyone trusts the pooled number.

    One scan builds both the per-segment and pooled contingency rows
    (grouping-sets shape via unionByName of two aggregates of the
    same narrowed frame); rates are single divisions of exact
    integer counts and the sign comparison is pure integer.

    Degenerate-segment guard (ADVICE r7): a segment with zero urgent
    (or zero non-urgent) orders has no rate — emitted NULL on both
    engines (never a div-by-zero inf/NULL mismatch), and its sgn
    falls through the comparison CASE to 0 ("no direction"), so it
    can never flag a reversal."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("segment"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        .cast("int").alias("urgent"),
        (F.col("o_totalprice") > 150000).cast("int").alias("big"),
    )
    aggs = [
        F.sum("urgent").cast("long").alias("n_urgent"),
        F.sum(1 - F.col("urgent")).cast("long").alias("n_other"),
        F.sum(F.when(F.col("urgent") == 1, F.col("big")).otherwise(0))
        .cast("long").alias("big_urgent"),
        F.sum(F.when(F.col("urgent") == 0, F.col("big")).otherwise(0))
        .cast("long").alias("big_other"),
    ]
    seg = o.groupBy("segment").agg(*aggs).unionByName(
        o.agg(*aggs).select(F.lit("__pooled").alias("segment"), *[
            F.col(c) for c in ("n_urgent", "n_other", "big_urgent", "big_other")
        ])
    )
    ru = F.when(
        F.col("n_urgent") > 0,
        F.col("big_urgent") / F.col("n_urgent").cast("double"),
    )
    ro = F.when(
        F.col("n_other") > 0,
        F.col("big_other") / F.col("n_other").cast("double"),
    )
    r = seg.select(
        "segment", "n_urgent", "n_other",
        F.round(ru, 6).alias("rate_urgent"),
        F.round(ro, 6).alias("rate_other"),
        F.when(ru > ro, 1).when(ru < ro, -1).otherwise(0).alias("sgn"),
    )
    p = r.filter(F.col("segment") == "__pooled").select(
        F.col("sgn").alias("pooled_sgn")
    )
    return (
        r.crossJoin(F.broadcast(p))
        .select(
            "segment", "n_urgent", "n_other", "rate_urgent", "rate_other",
            (
                (F.col("segment") != "__pooled")
                & (F.col("sgn") * F.col("pooled_sgn") == -1)
            ).cast("int").alias("reversed"),
        )
        .orderBy("segment")
    )


@register(
    "q_lorenz",
    sql="""
    WITH r AS (SELECT o_custkey,
                      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS rev
               FROM orders GROUP BY 1),
    t AS (SELECT o_custkey, rev,
                 ntile(10) OVER (ORDER BY rev, o_custkey) AS decile
          FROM r),
    g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
                 CAST(sum(rev) AS BIGINT) AS rev_cents
          FROM t GROUP BY 1),
    tot AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS grand FROM g)
    SELECT CAST(decile AS INT) AS decile, n_cust, rev_cents,
           round(sum(rev_cents) OVER (ORDER BY decile)
                 / CAST(grand AS DOUBLE), 6) AS cum_share
    FROM g CROSS JOIN tot ORDER BY decile
    """,
)
def q_lorenz(spark, sf_dir):
    """Lorenz concentration curve of customer revenue: customers in
    ascending-revenue deciles (exact ntile) with each decile's
    cumulative share of total revenue — the concentration view
    behind q_gini's single number ("the top decile carries 40% of
    revenue" is this curve's last two points).

    The decile assignment rides the two-phase value-cut global_ntile
    (bit-identical to ntile(10) OVER (ORDER BY rev, custkey) at any
    cardinality, no data-sized single-partition stage); the cumsum
    over the 10 decile rows is a broadcast triangle join, so the plan
    has NO single-partition window at all.  Revenue is exact integer
    cents."""
    from shadems_spark.operators.profile import global_ntile

    o = load_table(spark, sf_dir, "orders")
    r = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long").alias("rev")
    )
    t = global_ntile(r, 10, ["rev", "o_custkey"], "decile")
    g = t.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("rev").cast("long").alias("rev_cents"),
    )
    tot = g.agg(F.sum("rev_cents").cast("long").alias("grand"))
    # cumulative share over the 10 decile rows as a broadcast triangle
    # join (b.decile <= a.decile) instead of an empty-partition-spec
    # window — same values, no single-partition WindowExec, no
    # allowlist entry, no WARN line in driver tails.
    cum = (
        g.alias("a")
        .join(
            F.broadcast(g.select(
                F.col("decile").alias("bd"), F.col("rev_cents").alias("brc")
            )),
            F.col("bd") <= F.col("a.decile"),
        )
        .groupBy("a.decile", "a.n_cust", "a.rev_cents")
        .agg(F.sum("brc").cast("long").alias("crc"))
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_cust", "rev_cents",
            F.round(F.col("crc") / F.col("grand").cast("double"), 6)
            .alias("cum_share"),
        )
        .orderBy("decile")
    )


#: Tukey studentized-range critical value q_{0.05}(k=5, df=inf) — the
#: standard table literal, shared by both engines so the significance
#: flag is integer-identical.
_TUKEY_Q_CRIT = 3.858


@register(
    "q_tukey",
    sql=f"""
    WITH v AS (SELECT event_type,
                      CAST(round(value * 1000) AS BIGINT) AS vm
               FROM events WHERE value IS NOT NULL),
    g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(vm) AS BIGINT) AS s,
                 CAST(sum(vm * vm) AS BIGINT) AS q
          FROM v GROUP BY 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nt,
                 CAST(sum(CAST(round((g.q / 1e6
                                      - g.s * (g.s / CAST(g.n AS DOUBLE))
                                        / 1e6) * 1e9) AS BIGINT))
                      AS BIGINT) AS ssw_n
          FROM g),
    m AS (SELECT k, nt, (ssw_n / 1e9) / (nt - k) AS msw FROM t),
    p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 a.n AS n_a, b.n AS n_b,
                 a.s / (a.n * 1000.0) - b.s / (b.n * 1000.0) AS diff,
                 sqrt((m.msw / 2.0)
                      * (1.0 / a.n + 1.0 / b.n)) AS se
          FROM g a JOIN g b ON a.event_type < b.event_type
          CROSS JOIN m)
    SELECT type_a, type_b, n_a, n_b,
           round(diff, 6) AS mean_diff,
           round(abs(diff) / se, 6) AS q_stat,
           CAST(CASE WHEN abs(diff) / se > {_TUKEY_Q_CRIT}
                THEN 1 ELSE 0 END AS INT) AS significant
    FROM p ORDER BY type_a, type_b
    """,
)
def q_tukey(spark, sf_dir):
    """Tukey-Kramer HSD post-hoc: all C(k,2) pairwise mean
    comparisons of event value across event types, studentized by the
    pooled within-group variance — the multiple-comparison follow-up
    q_anova's omnibus F demands (10 naive t-tests inflate alpha; the
    studentized range controls the familywise rate).  Unequal-n form
    (Kramer '56): SE_ij = sqrt(MSW/2 * (1/n_i + 1/n_j)); flag at the
    standard table literal q_{{.05}}(5, inf) = 3.858.

    ONE scan -> k-row integer group table (the q_anova sufficient
    statistics); MSW from nano-rounded per-group SSW contributions
    (integer cross-group sum, the q_levene protocol); the pairwise
    grid is a broadcast self-join of k rows.  No window, no second
    scan."""
    from shadems_spark.operators.dedup import tracked_persist

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vm = F.round(F.col("value") * 1000).cast("long")
    # the k-row group table feeds MSW, both pair-grid sides — persist
    # so the events scan runs once (per-branch column pruning defeats
    # ReuseExchange, the r6 lesson)
    g = tracked_persist(
        ev.select("event_type", vm.alias("vm")).groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("vm").cast("long").alias("s"),
            F.sum(F.col("vm") * F.col("vm")).cast("long").alias("q"),
        ),
        key="tukey_groups",
    )
    c = F.col
    t = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nt"),
        F.sum(
            F.round(
                (c("q") / 1e6 - c("s") * (c("s") / c("n").cast("double")) / 1e6)
                * 1e9
            ).cast("long")
        ).cast("long").alias("ssw_n"),
    )
    m = t.select((c("ssw_n") / 1e9 / (c("nt") - c("k"))).alias("msw"))
    a = g.select(
        c("event_type").alias("type_a"), c("n").alias("n_a"),
        c("s").alias("s_a"),
    )
    b = g.select(
        c("event_type").alias("type_b"), c("n").alias("n_b"),
        c("s").alias("s_b"),
    )
    diff = c("s_a") / (c("n_a") * 1000.0) - c("s_b") / (c("n_b") * 1000.0)
    se = F.sqrt(
        (c("msw") / 2.0) * (1.0 / c("n_a") + 1.0 / c("n_b"))
    )
    return (
        a.join(F.broadcast(b), c("type_a") < c("type_b"))
        .crossJoin(F.broadcast(m))
        .select(
            "type_a", "type_b", "n_a", "n_b",
            F.round(diff, 6).alias("mean_diff"),
            F.round(F.abs(diff) / se, 6).alias("q_stat"),
            (F.abs(diff) / se > _TUKEY_Q_CRIT).cast("int")
            .alias("significant"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "q_mcnemar",
    sql=f"""
    WITH u AS (SELECT user_id,
                      CAST(max(CASE WHEN event_type = 'purchase'
                                     AND value > 95
                                     AND CAST(ts AS DATE) < DATE '2024-01-16'
                               THEN 1 ELSE 0 END) AS INT) AS p1,
                      CAST(max(CASE WHEN event_type = 'purchase'
                                     AND value > 95
                                     AND CAST(ts AS DATE) >= DATE '2024-01-16'
                               THEN 1 ELSE 0 END) AS INT) AS p2
               FROM events GROUP BY 1),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS b,
                 CAST(sum(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c
          FROM u)
    SELECT n, b, c,
           round(CASE WHEN b + c > 0
                 THEN greatest(abs(b - c) - 1, 0) * greatest(abs(b - c) - 1, 0)
                      / CAST(b + c AS DOUBLE) ELSE 0 END, 6) AS chi2,
           CASE WHEN b + c > 0 THEN
           {{AS_P}}
           ELSE 1.0 END AS p
    FROM s
    """.replace("{AS_P}", _as_p_sql(
        "(sqrt(CASE WHEN b + c > 0 THEN greatest(abs(b - c) - 1, 0)"
        " * greatest(abs(b - c) - 1, 0)"
        " / CAST(b + c AS DOUBLE) ELSE 0 END))"
    )),
)
def q_mcnemar(spark, sf_dir):
    """McNemar's test of paired binary change: did each user's
    HIGH-VALUE purchase behavior (value > 95 — the q_abtest
    conversion; plain purchase is universal in this fixture and
    degenerates to b = c = 0) flip between the two calendar halves
    (Jan 1-15 vs 16-30)?  Only the discordant pairs carry information — b
    (active -> inactive) vs c (inactive -> active) — and the
    continuity-corrected chi2 = (|b-c|-1)^2/(b+c) tests their
    symmetry.  The within-subject companion to q_abtest's
    between-arm z (paired designs kill between-user variance the
    way CUPED's covariate does).

    ONE per-user aggregate (the only data-sized shuffle) -> a 1-row
    integer contingency reduce -> closed form; p is the shared A-S
    normal polynomial at z = sqrt(chi2) (chi2_1 tail identity),
    identical literals both engines; b + c = 0 degenerates to
    chi2 = 0, p = 1 on both."""
    ev = load_table(spark, sf_dir, "events")
    pre = F.col("ts").cast("date") < F.lit("2024-01-16").cast("date")
    is_p = (F.col("event_type") == "purchase") & (F.col("value") > 95)
    u = ev.groupBy("user_id").agg(
        F.max((is_p & pre).cast("int")).alias("p1"),
        F.max((is_p & ~pre).cast("int")).alias("p2"),
    )
    c = F.col
    s = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(((c("p1") == 1) & (c("p2") == 0)).cast("int"))
        .cast("long").alias("b"),
        F.sum(((c("p1") == 0) & (c("p2") == 1)).cast("int"))
        .cast("long").alias("c"),
    )
    # continuity correction clamped at zero (Edwards '48): with
    # b == c > 0 the uncorrected |b-c|-1 = -1 would square to a
    # SPURIOUS 1/(b+c) — evidence of asymmetry from perfectly
    # symmetric discordance.
    d = F.greatest(F.abs(c("b") - c("c")) - 1, F.lit(0))
    chi2 = F.when(
        c("b") + c("c") > 0,
        d * d / (c("b") + c("c")).cast("double"),
    ).otherwise(F.lit(0.0))
    return s.select(
        "n", "b", "c",
        F.round(chi2, 6).alias("chi2"),
        F.when(c("b") + c("c") > 0, _as_p_col(F.sqrt(chi2)))
        .otherwise(F.lit(1.0)).alias("p"),
    )


@register(
    "q_herfindahl",
    sql="""
    WITH r AS (SELECT c.c_nationkey AS nation, o.o_custkey,
                      CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS rev
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               GROUP BY 1, 2),
    t AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_cust,
                 CAST(sum(rev) AS BIGINT) AS tot
          FROM r GROUP BY 1),
    h AS (SELECT r.nation,
                 CAST(sum(CAST(round((r.rev / CAST(t.tot AS DOUBLE))
                                     * (r.rev / CAST(t.tot AS DOUBLE))
                                     * 1e9) AS BIGINT)) AS BIGINT) AS hhi_n,
                 CAST(max(r.rev) AS BIGINT) AS max_rev
          FROM r JOIN t USING (nation) GROUP BY 1)
    SELECT CAST(t.nation AS BIGINT) AS nation, t.n_cust,
           round(h.hhi_n / 1e9, 6) AS hhi,
           round(h.max_rev / CAST(t.tot AS DOUBLE), 6) AS top_share,
           round(1.0 / t.n_cust, 6) AS hhi_floor
    FROM t JOIN h USING (nation) ORDER BY nation
    """,
)
def q_herfindahl(spark, sf_dir):
    """Herfindahl-Hirschman concentration of customer revenue within
    each nation: HHI = sum of squared revenue shares (1/n at perfect
    equality, 1.0 at monopoly) with the top customer's share and the
    1/n floor alongside — the market-concentration single number
    behind q_lorenz's curve and q_gini's coefficient, per segment.

    Revenue is exact integer cents; each customer's squared share is
    nano-rounded BEFORE the per-nation sum (integer cross-row sums),
    nation totals ride one broadcast join back.  Scale: per-(nation,
    customer) aggregate -> per-nation aggregate, both
    map-side-combined; no window, no self-join."""
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nation"),
    )
    from shadems_spark.operators.dedup import tracked_persist

    # the per-(nation, customer) aggregate is the only data-sized
    # stage and feeds BOTH the nation totals and the squared-share
    # sum — persist so the orders scan + join + shuffle run once
    r = tracked_persist(
        o.select("o_custkey",
                 F.round(F.col("o_totalprice") * 100).cast("long").alias("rc"))
        .join(F.broadcast(cust), "o_custkey")
        .groupBy("nation", "o_custkey")
        .agg(F.sum("rc").cast("long").alias("rev")),
        key="hhi_rev",
    )
    t = r.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("rev").cast("long").alias("tot"),
    )
    c = F.col
    share = c("rev") / c("tot").cast("double")
    h = (
        r.join(F.broadcast(t.select("nation", "tot")), "nation")
        .groupBy("nation")
        .agg(
            F.sum(F.round(share * share * 1e9).cast("long"))
            .cast("long").alias("hhi_n"),
            F.max("rev").cast("long").alias("max_rev"),
        )
    )
    return (
        t.join(F.broadcast(h), "nation")
        .select(
            c("nation").cast("long").alias("nation"),
            "n_cust",
            F.round(c("hhi_n") / 1e9, 6).alias("hhi"),
            F.round(c("max_rev") / c("tot").cast("double"), 6)
            .alias("top_share"),
            F.round(F.lit(1.0) / c("n_cust"), 6).alias("hhi_floor"),
        )
        .orderBy("nation")
    )


@register(
    "q_kruskal",
    sql="""
    WITH v AS (SELECT event_type,
                      CAST(round(value * 1000) AS BIGINT) AS vm
               FROM events WHERE value IS NOT NULL),
    gv AS (SELECT event_type, vm, CAST(count(*) AS BIGINT) AS n_gv
           FROM v GROUP BY 1, 2),
    d AS (SELECT vm, CAST(sum(n_gv) AS BIGINT) AS n_v FROM gv GROUP BY 1),
    r AS (SELECT vm, n_v,
                 CAST(coalesce(sum(n_v) OVER (ORDER BY vm
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS cumlt
          FROM d),
    g AS (SELECT gv.event_type,
                 CAST(sum(gv.n_gv) AS BIGINT) AS n_g,
                 CAST(sum(gv.n_gv * (2 * r.cumlt + r.n_v + 1)) AS BIGINT)
                     AS r2_g
          FROM gv JOIN r USING (vm) GROUP BY 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n_g) AS BIGINT) AS n FROM g),
    ties AS (SELECT sum(CAST(n_v AS HUGEINT) * n_v * n_v - n_v) AS tsum
             FROM d),
    h AS (SELECT t.k, t.n,
                 (12.0 / (CAST(t.n AS DOUBLE) * (t.n + 1)))
                 * (SELECT sum((r2_g / 2.0) * (r2_g / 2.0)
                               / CAST(n_g AS DOUBLE)) FROM g)
                 - 3.0 * (t.n + 1) AS h_raw,
                 1.0 - CAST(ties.tsum AS DOUBLE)
                       / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n) AS c
          FROM t CROSS JOIN ties)
    SELECT k, n, round(h_raw, 6) AS h, round(c, 9) AS tie_c,
           CASE WHEN c > 0 THEN round(h_raw / c, 6) END AS h_corrected
    FROM h
    """,
)
def q_kruskal(spark, sf_dir):
    """Kruskal-Wallis rank-based k-group omnibus test of event value
    across event types — the distribution-free companion to q_anova
    (use this when q_levene rejects variance homogeneity or the
    values are heavy-tailed), with the standard tie correction.

    The interesting part is the RANKS: average ranks over N pooled
    values without any data-sized single-partition stage.  Milli-int
    values collapse to a per-distinct-value count table; the
    exclusive prefix count (cumlt) gives every value's average rank
    as (2*cumlt + n_v + 1)/2 — kept DOUBLED so each group's rank sum
    R2_g = sum n_gv*(2*cumlt + n_v + 1) is a pure INTEGER on both
    engines; H and the tie correction are fixed float formulas over
    (R2_g, n_g, N, sum(t^3 - t)).  In Spark the prefix count rides
    the two-phase global_cumsum over the distinct-value table; the
    oracle uses a plain window (DuckDB's engine is welcome to its
    own plan).  The 12/(N(N+1)) constant and the k-row float sum of
    R_g^2/n_g follow the q_anova convention (K-bounded reduce)."""
    from shadems_spark.operators.dedup import tracked_persist
    from shadems_spark.operators.profile import global_cumsum

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vm = F.round(F.col("value") * 1000).cast("long")
    v = ev.select("event_type", vm.alias("vm"))
    # ONE events scan: the (type, value) counts persist and every
    # other table (distinct-value counts, prefix ranks, ties, group
    # sums) derives from the cache
    gv = tracked_persist(
        v.groupBy("event_type", "vm").agg(
            F.count(F.lit(1)).cast("long").alias("n_gv")
        ),
        key="kruskal_gv",
    )
    d = gv.groupBy("vm").agg(F.sum("n_gv").cast("long").alias("n_v"))
    # exclusive prefix count over ascending distinct values: the
    # two-phase scan (no single-partition window at any cardinality)
    r = global_cumsum(d, ["vm"], {"cum": "n_v"}, )
    r = r.select(
        "vm", "n_v",
        (F.col("cum") - F.col("n_v")).cast("long").alias("cumlt"),
    )
    c = F.col
    g = gv.join(r, "vm").groupBy("event_type").agg(
        F.sum("n_gv").cast("long").alias("n_g"),
        F.sum(c("n_gv") * (2 * c("cumlt") + c("n_v") + 1))
        .cast("long").alias("r2_g"),
    )
    t = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum((c("r2_g") / 2.0) * (c("r2_g") / 2.0) / c("n_g").cast("double"))
        .alias("rr"),
    )
    # t^3 - t in DECIMAL(38) on Spark / HUGEINT in the oracle: one
    # modal value past ~2.1M duplicates would wrap a 64-bit cube
    # silently on Spark and error on DuckDB — wide integers keep the
    # sum exact to n_v ~ 4.6e12, then ONE cast to double at the ratio
    ties = d.agg(
        F.sum(
            c("n_v").cast("decimal(38,0)") * c("n_v") * c("n_v") - c("n_v")
        ).alias("tsum")
    )
    h_raw = (
        (F.lit(12.0) / (c("n").cast("double") * (c("n") + 1))) * c("rr")
        - F.lit(3.0) * (c("n") + 1)
    )
    tie_c = F.lit(1.0) - c("tsum").cast("double") / (
        c("n").cast("double") * c("n") * c("n") - c("n")
    )
    return t.crossJoin(F.broadcast(ties)).select(
        "k", "n",
        F.round(h_raw, 6).alias("h"),
        F.round(tie_c, 9).alias("tie_c"),
        # all-tied input makes tie_c exactly 0: no rank information
        # exists, so the corrected statistic is undefined (NULL on
        # both engines), not inf/NaN-divergent
        F.when(tie_c > 0, F.round(h_raw / tie_c, 6)).alias("h_corrected"),
    )


# ------------------------------------------------------------ round 8
# The two statistics shelved in round 7 for lgamma/libm cross-engine
# ulp divergence, now in integer-grid / precomputed-literal designs
# that keep every cross-engine value either a pure integer or one
# shared double (VERDICT r7 #7).

from math import comb as _comb

#: Pascal rows for the Fisher margins, precomputed in Python and
#: embedded as literals in BOTH engines: the weekend/weekday margin
#: of January 2024 days 1-30 is CALENDAR-FIXED at 8/22, and the day
#: count at 30 — so C(8,k), C(22,j), C(30,m) cover every reachable
#: table.  Max entry C(30,15) = 155,117,520 and max pmf numerator
#: C(8,4)*C(22,11) = 4.94e7: every enumeration value, sum and
#: comparison is exact int64 on both engines; the ONLY float is the
#: final numerator/denominator division of two identical integers.
_C8 = [_comb(8, k) for k in range(9)]
_C22 = [_comb(22, k) for k in range(23)]
_C30 = [_comb(30, k) for k in range(31)]


def _sql_arr(xs) -> str:
    return "[" + ", ".join(f"CAST({x} AS BIGINT)" for x in xs) + "]"


_FISHER_SQL = f"""
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(sum(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS cnt
               FROM events GROUP BY 1),
    f AS (SELECT day, cnt,
                 CASE WHEN (datediff('day', DATE '2024-01-01', day) % 7)
                           IN (5, 6) THEN 1 ELSE 0 END AS wk,
                 CASE WHEN cnt * (SELECT count(*) FROM d)
                           > (SELECT sum(cnt) FROM d) THEN 1 ELSE 0 END AS hi
          FROM d),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(wk) AS BIGINT) AS r1,
                 CAST(sum(hi) AS BIGINT) AS c1,
                 CAST(sum(wk * hi) AS BIGINT) AS a
          FROM f),
    e AS (SELECT n, r1, c1, a,
                 {_sql_arr(_C8)} AS c8,
                 {_sql_arr(_C22)} AS c22,
                 {_sql_arr(_C30)} AS c30
          FROM s),
    p AS (SELECT n, r1, c1, a,
                 c8[CAST(a + 1 AS INT)]
                   * c22[CAST(c1 - a + 1 AS INT)] AS nobs,
                 list_transform(
                   generate_series(greatest(0, c1 - 22), least(8, c1)),
                   k -> c8[CAST(k + 1 AS INT)]
                        * c22[CAST(c1 - k + 1 AS INT)]) AS nks,
                 list_transform(
                   generate_series(a, least(8, c1)),
                   k -> c8[CAST(k + 1 AS INT)]
                        * c22[CAST(c1 - k + 1 AS INT)]) AS gks,
                 c30[CAST(c1 + 1 AS INT)] AS denom
          FROM e)
    SELECT CAST(a AS BIGINT) AS a,
           CAST(r1 - a AS BIGINT) AS b,
           CAST(c1 - a AS BIGINT) AS c,
           CAST(n - r1 - c1 + a AS BIGINT) AS d,
           CASE WHEN n = 30 AND r1 = 8 THEN
             round(CAST(list_sum(list_filter(nks, v -> v <= nobs))
                        AS DOUBLE) / denom, 9)
           END AS p_two_sided,
           CASE WHEN n = 30 AND r1 = 8 THEN
             round(CAST(list_sum(gks) AS DOUBLE) / denom, 9)
           END AS p_greater
    FROM p
"""


@register("q_fisher_exact", sql=_FISHER_SQL)
def q_fisher_exact(spark, sf_dir):
    """Fisher's exact test of weekend vs high-purchase-volume days
    (daily purchase count above the 30-day mean), on the 2x2 table
    over January 2024's 30 days — the small-sample independence test
    q_chisq's approximation breaks down on, shelved in r7 for its
    lgamma form and landed here as a PURE-INTEGER enumeration: the
    weekend margin (8/22) and day count (30) are calendar-fixed, so
    the three Pascal rows C(8,.), C(22,.), C(30,.) ship as Python-
    precomputed literals in both engines; every hypergeometric pmf
    numerator C(8,k)*C(22,c1-k) <= 4.94e7 is an exact int64, the
    two-sided p is the "sum of tables with pmf <= observed"
    convention via integer comparisons only, and the single float op
    is one division of two identical integers.  No lgamma, no exp,
    no libm anywhere.  The 'hi' split compares cnt*30 > total —
    integer cross-multiplication, no division.  Guard: p columns are
    NULL unless (n, r1) == (30, 8) — the bound the literal rows
    cover (mirrored in the oracle).

    Scale: one (day)-key conditional aggregate is the only data-sized
    stage; the enumeration runs on a 1-row frame."""
    ev = load_table(spark, sf_dir, "events")
    c = F.col
    d = ev.groupBy(c("ts").cast("date").alias("day")).agg(
        F.sum((c("event_type") == "purchase").cast("int"))
        .cast("long").alias("cnt")
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("total"),
    )
    wk = (
        F.pmod(F.datediff(c("day"), F.lit("2024-01-01").cast("date")), F.lit(7))
        .isin(5, 6)
    )
    f = d.crossJoin(F.broadcast(tot)).select(
        "n",
        wk.cast("int").alias("wk"),
        (c("cnt") * c("n") > c("total")).cast("int").alias("hi"),
    )
    s = f.groupBy("n").agg(
        F.sum("wk").cast("long").alias("r1"),
        F.sum("hi").cast("long").alias("c1"),
        F.sum(c("wk") * c("hi")).cast("long").alias("a"),
    )
    c8 = F.array(*[F.lit(x).cast("long") for x in _C8])
    c22 = F.array(*[F.lit(x).cast("long") for x in _C22])
    c30 = F.array(*[F.lit(x).cast("long") for x in _C30])
    at = lambda arr, i: F.element_at(arr, i.cast("int"))
    nobs = at(c8, c("a") + 1) * at(c22, c("c1") - c("a") + 1)
    nks = F.transform(
        F.sequence(
            F.greatest(F.lit(0).cast("long"), c("c1") - 22),
            F.least(F.lit(8).cast("long"), c("c1")),
        ),
        lambda k: at(c8, k + 1) * at(c22, c("c1") - k + 1),
    )
    gks = F.transform(
        F.sequence(c("a"), F.least(F.lit(8).cast("long"), c("c1"))),
        lambda k: at(c8, k + 1) * at(c22, c("c1") - k + 1),
    )
    zero = F.lit(0).cast("long")
    lsum = lambda arr: F.aggregate(arr, zero, lambda acc, v: acc + v)
    denom = at(c30, c("c1") + 1)
    ok = (c("n") == 30) & (c("r1") == 8)
    return s.select(
        c("a").alias("a"),
        (c("r1") - c("a")).alias("b"),
        (c("c1") - c("a")).alias("c"),
        (c("n") - c("r1") - c("c1") + c("a")).alias("d"),
        F.when(
            ok,
            F.round(
                lsum(F.filter(nks, lambda v: v <= nobs)).cast("double")
                / denom,
                9,
            ),
        ).alias("p_two_sided"),
        F.when(
            ok, F.round(lsum(gks).cast("double") / denom, 9)
        ).alias("p_greater"),
    )


@register(
    "q_mood_median",
    sql="""
    WITH v AS (SELECT event_type,
                      CAST(round(value * 1000) AS BIGINT) AS vm
               FROM events WHERE value IS NOT NULL),
    gv AS (SELECT event_type, vm, CAST(count(*) AS BIGINT) AS n_gv
           FROM v GROUP BY 1, 2),
    d AS (SELECT vm, CAST(sum(n_gv) AS BIGINT) AS n_v FROM gv GROUP BY 1),
    c AS (SELECT vm, CAST(sum(n_v) OVER (ORDER BY vm
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM d),
    t0 AS (SELECT CAST(sum(n_v) AS BIGINT) AS n FROM d),
    m AS (SELECT min(vm) AS med FROM c CROSS JOIN t0 WHERE 2 * cum >= n),
    g AS (SELECT gv.event_type,
                 CAST(sum(n_gv) AS BIGINT) AS n_j,
                 CAST(sum(CASE WHEN gv.vm > m.med THEN n_gv ELSE 0 END)
                      AS BIGINT) AS a_j
          FROM gv CROSS JOIN m GROUP BY 1),
    tt AS (SELECT CAST(count(*) AS BIGINT) AS k,
                  CAST(sum(n_j) AS BIGINT) AS n,
                  CAST(sum(a_j) AS BIGINT) AS a_tot
           FROM g),
    chi AS (SELECT CAST(sum(CAST(round(
               ((g.a_j - g.n_j * (tt.a_tot / CAST(tt.n AS DOUBLE)))
                * (g.a_j - g.n_j * (tt.a_tot / CAST(tt.n AS DOUBLE))))
               / ((g.n_j * (tt.a_tot / CAST(tt.n AS DOUBLE)))
                  * (1.0 - tt.a_tot / CAST(tt.n AS DOUBLE)))
               * 1e9) AS BIGINT)) AS BIGINT) AS chi_n
            FROM g CROSS JOIN tt)
    SELECT g.event_type, g.n_j AS n, g.a_j AS n_above,
           round(g.n_j * (tt.a_tot / CAST(tt.n AS DOUBLE)), 6) AS e_above,
           round(m.med / 1000.0, 6) AS grand_median,
           CASE WHEN tt.a_tot > 0 AND tt.a_tot < tt.n
                THEN round(chi.chi_n / 1e9, 6) END AS chi2,
           CAST(tt.k - 1 AS BIGINT) AS dof
    FROM g CROSS JOIN tt CROSS JOIN m CROSS JOIN chi
    ORDER BY g.event_type
    """,
)
def q_mood_median(spark, sf_dir):
    """Mood's median test across the k event types: does each type's
    value distribution sit above/below the POOLED median equally
    often?  The coarse, outlier-immune k-group location screen
    beside q_kruskal (Mood trades power for total robustness — only
    the side of the median matters, not ranks).

    Above-split convention: strictly-above the LOWER pooled median
    (first value whose cumulative count reaches half — the
    q_weighted_median inequality, pure integer).  Exactness: the
    pooled median rides the distinct-value count table + two-phase
    global_cumsum (no single-partition stage at any cardinality; the
    q_kruskal shape), the 2xk contingency is exact integers, and
    each chi-square term (a_j - n_j p)^2 / (n_j p (1-p)) is
    nano-rounded per group before the integer cross-group sum.
    Degenerate guard: all values on one side of the median (a_tot =
    0 or N) has no dispersion to test — chi2 NULL on both engines.
    Scale: one (type, value)-key aggregate is the only data-sized
    stage."""
    from shadems_spark.operators.dedup import tracked_persist
    from shadems_spark.operators.profile import global_cumsum

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    c = F.col
    vm = F.round(c("value") * 1000).cast("long")
    gv = tracked_persist(
        ev.select("event_type", vm.alias("vm"))
        .groupBy("event_type", "vm")
        .agg(F.count(F.lit(1)).cast("long").alias("n_gv")),
        key="mood_gv",
    )
    d = gv.groupBy("vm").agg(F.sum("n_gv").cast("long").alias("n_v"))
    cum = global_cumsum(d, ["vm"], {"cum": "n_v"})
    t0 = d.agg(F.sum("n_v").cast("long").alias("n"))
    m = (
        cum.crossJoin(F.broadcast(t0))
        .filter(2 * c("cum") >= c("n"))
        .agg(F.min("vm").alias("med"))
    )
    # the k-row contingency table feeds three consumers (totals, the
    # chi2 reduce, the output rows) and carries the whole two-phase
    # median pipeline as lineage — persist so that pipeline runs
    # once, not once per branch (the r6/r7 reuse lesson)
    g = tracked_persist(
        gv.crossJoin(F.broadcast(m))
        .groupBy("event_type")
        .agg(
            F.sum("n_gv").cast("long").alias("n_j"),
            F.sum(F.when(c("vm") > c("med"), c("n_gv")).otherwise(0))
            .cast("long").alias("a_j"),
        ),
        key="mood_groups",
    )
    tt = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_j").cast("long").alias("n"),
        F.sum("a_j").cast("long").alias("a_tot"),
    )
    p = c("a_tot") / c("n").cast("double")
    term = (
        (c("a_j") - c("n_j") * p) * (c("a_j") - c("n_j") * p)
    ) / ((c("n_j") * p) * (F.lit(1.0) - p))
    chi = (
        g.crossJoin(F.broadcast(tt))
        .agg(
            F.sum(F.round(term * 1e9).cast("long"))
            .cast("long").alias("chi_n")
        )
    )
    return (
        g.crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(chi))
        .select(
            "event_type",
            c("n_j").alias("n"),
            c("a_j").alias("n_above"),
            F.round(c("n_j") * p, 6).alias("e_above"),
            F.round(c("med") / 1000.0, 6).alias("grand_median"),
            F.when(
                (c("a_tot") > 0) & (c("a_tot") < c("n")),
                F.round(c("chi_n") / 1e9, 6),
            ).alias("chi2"),
            (c("k") - 1).cast("long").alias("dof"),
        )
        .orderBy("event_type")
    )


@register(
    "q_cochran_q",
    sql="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    f AS (SELECT event_type, CAST(ts AS DATE) AS day
          FROM events WHERE value > 95 GROUP BY 1, 2),
    x AS (SELECT t.event_type, d.day,
                 CASE WHEN f.event_type IS NOT NULL THEN 1 ELSE 0 END AS x
          FROM types t CROSS JOIN days d
          LEFT JOIN f ON f.event_type = t.event_type AND f.day = d.day),
    r AS (SELECT day, CAST(sum(x) AS BIGINT) AS ri FROM x GROUP BY 1),
    cj AS (SELECT event_type, CAST(sum(x) AS BIGINT) AS c_j
           FROM x GROUP BY 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(c_j) AS BIGINT) AS tot,
                 CAST(sum(c_j * c_j) AS BIGINT) AS sc2
          FROM cj),
    rr AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
                  CAST(sum(ri * ri) AS BIGINT) AS sr2
           FROM r)
    SELECT cj.event_type, cj.c_j AS n_active_days,
           rr.n_days, CAST(t.k - 1 AS BIGINT) AS dof,
           CASE WHEN t.k * t.tot - rr.sr2 > 0
                THEN round((t.k - 1)
                           * CAST(t.k * t.sc2 - t.tot * t.tot AS DOUBLE)
                           / (t.k * t.tot - rr.sr2), 6)
           END AS q
    FROM cj CROSS JOIN t CROSS JOIN rr ORDER BY cj.event_type
    """,
)
def q_cochran_q(spark, sf_dir):
    """Cochran's Q test over the zero-filled day x type grid: did the
    k event types have the SAME daily probability of producing a
    high-value event (value > 95, the q_abtest conversion)?  The
    k-treatment repeated-measures test for BINARY outcomes — the
    missing sibling between q_mcnemar (k = 2 paired binary) and
    q_friedman (k-treatment ordinal): blocks are days, treatments
    are types, response is the 0/1 indicator.

    Q = (k-1) * (k*sum C_j^2 - T^2) / (k*T - sum R_i^2) — EVERY term
    is an exact integer (column totals C_j, row totals R_i, grand
    total T), so the statistic is one division of identical integers
    on both engines; no nano ladder needed.  dof = k-1 (no p: the
    chi-square tail at dof > 1 needs the incomplete gamma — the
    q_friedman convention of emitting the statistic + dof).
    Degenerate guard: denominator sum R_i (k - R_i) = 0 (every day
    all-or-none) -> Q NULL on both engines.  Alias hygiene: the
    types spine renames through a fresh __et before joining the
    flags frame derived from the same parent (_daily_grid's rule).
    Scale: one (type, day) conditional aggregate; the grid is
    types x calendar."""
    ev = load_table(spark, sf_dir, "events")
    c = F.col
    days = ev.select(c("ts").cast("date").alias("day")).distinct()
    types = ev.select(c("event_type").alias("__et")).distinct()
    f = (
        ev.filter(c("value") > 95)
        .groupBy("event_type", c("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    x = (
        types.crossJoin(F.broadcast(days))
        .join(
            f,
            (c("__et") == f["event_type"]) & (days["day"] == f["day"]),
            "left",
        )
        .select(
            c("__et").alias("event_type"),
            days["day"].alias("day"),
            f["__hits"].isNotNull().cast("int").alias("x"),
        )
    )
    from shadems_spark.operators.dedup import tracked_persist

    x = tracked_persist(x, key="cochran_grid")
    r = x.groupBy("day").agg(F.sum("x").cast("long").alias("ri"))
    cj = x.groupBy("event_type").agg(F.sum("x").cast("long").alias("c_j"))
    t = cj.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("c_j").cast("long").alias("tot"),
        F.sum(c("c_j") * c("c_j")).cast("long").alias("sc2"),
    )
    rr = r.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(c("ri") * c("ri")).cast("long").alias("sr2"),
    )
    return (
        cj.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(rr))
        .select(
            "event_type",
            c("c_j").alias("n_active_days"),
            "n_days",
            (c("k") - 1).cast("long").alias("dof"),
            F.when(
                c("k") * c("tot") - c("sr2") > 0,
                F.round(
                    (c("k") - 1)
                    * (c("k") * c("sc2") - c("tot") * c("tot"))
                    .cast("double")
                    / (c("k") * c("tot") - c("sr2")),
                    6,
                ),
            ).alias("q"),
        )
        .orderBy("event_type")
    )


@register(
    "q_theil_entropy",
    sql="""
    WITH r AS (SELECT c.c_nationkey AS nation, o.o_custkey,
                      CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS rev
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               GROUP BY 1, 2),
    g AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_g,
                 CAST(sum(rev) AS BIGINT) AS s_g
          FROM r GROUP BY 1),
    t AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
                 CAST(sum(s_g) AS BIGINT) AS s FROM g),
    w AS (SELECT r.nation,
                 CAST(sum(CAST(round(
                   (r.rev / (g.s_g / CAST(g.n_g AS DOUBLE)))
                   * ln(r.rev / (g.s_g / CAST(g.n_g AS DOUBLE)))
                   * 1e9) AS BIGINT)) AS BIGINT) AS tn
          FROM r JOIN g USING (nation) GROUP BY 1),
    p AS (SELECT g.nation, g.n_g, g.s_g, w.tn,
                 g.s_g / CAST(t.s AS DOUBLE) AS share,
                 CAST(round((g.s_g / CAST(t.s AS DOUBLE))
                            * ((w.tn / 1e9) / g.n_g) * 1e9) AS BIGINT)
                     AS wn,
                 CAST(round((g.s_g / CAST(t.s AS DOUBLE))
                            * ln((g.s_g / CAST(g.n_g AS DOUBLE))
                                 / (t.s / CAST(t.n AS DOUBLE))) * 1e9)
                      AS BIGINT) AS bn
          FROM g JOIN w USING (nation) CROSS JOIN t),
    tot AS (SELECT CAST(sum(wn) AS BIGINT) AS wsum,
                   CAST(sum(bn) AS BIGINT) AS bsum FROM p)
    SELECT CAST(p.nation AS BIGINT) AS nation, p.n_g AS n_cust,
           round(p.share, 6) AS share,
           round((p.tn / 1e9) / p.n_g, 6) AS theil_g,
           round(p.bn / 1e9, 6) AS between_term,
           round(tot.wsum / 1e9, 6) AS t_within,
           round(tot.bsum / 1e9, 6) AS t_between,
           round((tot.wsum + tot.bsum) / 1e9, 6) AS t_total
    FROM p CROSS JOIN tot ORDER BY p.nation
    """,
)
def q_theil_entropy(spark, sf_dir):
    """Theil T inequality index of customer revenue with the exact
    within/between-nation decomposition (Theil '67): T_g = (1/n_g)
    sum (x/mu_g) ln(x/mu_g) per nation, T = sum share_g * T_g + sum
    share_g * ln(mu_g/mu) — the DECOMPOSABLE inequality measure
    q_gini lacks (Gini does not split into within + between; Theil
    does, which is why segment-attribution dashboards use it), and
    the entropy-form companion to q_herfindahl's concentration.

    Exactness: revenue is exact integer cents; each per-customer
    entropy term (x/mu_g) ln(x/mu_g) is nano-rounded BEFORE the
    per-nation integer sum (the q_survival ln protocol — ln/exp at
    nano rounding is the repo-wide accepted libm boundary; lgamma
    was the r7 blocker, not ln), and the k-row within/between
    products are nano-rounded per nation before the integer totals.
    Scale: the per-(nation, customer) aggregate is the only
    data-sized stage (q_herfindahl's shape); nation stats broadcast
    back."""
    from shadems_spark.operators.dedup import tracked_persist

    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nation"),
    )
    c = F.col
    r = tracked_persist(
        o.select(
            "o_custkey",
            F.round(c("o_totalprice") * 100).cast("long").alias("rc"),
        )
        .join(F.broadcast(cust), "o_custkey")
        .groupBy("nation", "o_custkey")
        .agg(F.sum("rc").cast("long").alias("rev")),
        key="theil_rev",
    )
    g = r.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("rev").cast("long").alias("s_g"),
    )
    t = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
    )
    ratio = c("rev") / (c("s_g") / c("n_g").cast("double"))
    w = (
        r.join(F.broadcast(g), "nation")
        .groupBy("nation")
        .agg(
            F.sum(F.round(ratio * F.log(ratio) * 1e9).cast("long"))
            .cast("long").alias("tn")
        )
    )
    share = c("s_g") / c("s").cast("double")
    mu_ratio = (c("s_g") / c("n_g").cast("double")) / (
        c("s") / c("n").cast("double")
    )
    p = (
        g.join(F.broadcast(w), "nation")
        .crossJoin(F.broadcast(t))
        .select(
            "nation", "n_g", "s_g", "tn",
            share.alias("share"),
            F.round(share * ((c("tn") / 1e9) / c("n_g")) * 1e9)
            .cast("long").alias("wn"),
            F.round(share * F.log(mu_ratio) * 1e9)
            .cast("long").alias("bn"),
        )
    )
    tot = p.agg(
        F.sum("wn").cast("long").alias("wsum"),
        F.sum("bn").cast("long").alias("bsum"),
    )
    return (
        p.crossJoin(F.broadcast(tot))
        .select(
            c("nation").cast("long").alias("nation"),
            c("n_g").alias("n_cust"),
            F.round("share", 6).alias("share"),
            F.round((c("tn") / 1e9) / c("n_g"), 6).alias("theil_g"),
            F.round(c("bn") / 1e9, 6).alias("between_term"),
            F.round(c("wsum") / 1e9, 6).alias("t_within"),
            F.round(c("bsum") / 1e9, 6).alias("t_between"),
            F.round((c("wsum") + c("bsum")) / 1e9, 6).alias("t_total"),
        )
        .orderBy("nation")
    )
