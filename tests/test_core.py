"""Core-slice unit tests: complex ops, bin semantics, raster counts."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from shadems_spark.functions import complexops as C
from shadems_spark.operators import raster as R
from shadems_spark.plans.shadeplot import ShadePlot
from shadems_spark.vis import vis_view
from shadems_spark.catalog import load_table


def test_complex_ops(spark):
    df = spark.createDataFrame(
        [Row(re1=3.0, im1=4.0, re2=1.0, im2=-2.0)]
    ).select(C.cpx("re1", "im1").alias("a"), C.cpx("re2", "im2").alias("b"))
    row = df.select(
        C.c_amp(F.col("a")).alias("amp"),
        C.c_phase_deg(F.col("a")).alias("ph"),
        C.c_sub(F.col("a"), F.col("b")).alias("sub"),
        C.c_mul(F.col("a"), F.col("b")).alias("mul"),
        C.c_div(F.col("a"), F.col("b")).alias("div"),
    ).first()
    assert row["amp"] == 5.0
    assert abs(row["ph"] - math.degrees(math.atan2(4.0, 3.0))) < 1e-12
    assert (row["sub"]["re"], row["sub"]["im"]) == (2.0, 6.0)
    # (3+4i)(1-2i) = 3-6i+4i+8 = 11-2i
    assert (row["mul"]["re"], row["mul"]["im"]) == (11.0, -2.0)
    # (3+4i)/(1-2i) = (3+4i)(1+2i)/5 = (-5+10i)/5 = -1+2i
    assert (pytest.approx(row["div"]["re"]), pytest.approx(row["div"]["im"])) == (-1.0, 2.0)


def test_phase_edges(spark):
    df = spark.createDataFrame(
        [Row(re=-1.0, im=0.0), Row(re=0.0, im=0.0), Row(re=0.0, im=-1.0)]
    ).select(C.cpx("re", "im").alias("c"))
    vals = [r[0] for r in df.select(C.c_phase_deg(F.col("c"))).collect()]
    assert vals[0] == 180.0  # atan2(+0, -1)
    assert vals[1] == 0.0
    assert vals[2] == -90.0


def test_bin_edges(spark):
    # half-open bins over [0,10) x 10 bins; max value clamps into last
    df = spark.createDataFrame([Row(x=0.0), Row(x=0.999), Row(x=5.0), Row(x=10.0)])
    out = [r[0] for r in df.select(R.bin_axis(F.col("x"), 0.0, 10.0, 10)).collect()]
    assert out == [0, 0, 5, 9]


def test_raster_count_conservation(spark, sf_dir):
    """bin counts sum to the clipped input count (SURVEY §5.2 prop 3)."""
    v = vis_view(load_table(spark, sf_dir, "lineitem"))
    x, y = F.col("time_day").cast("double"), F.col("vis.re")
    clipped = R.clip(R.clip(v, x, 0.0, 2500.0), y, 0.0, 120000.0)
    n_in = clipped.count()
    binned = R.raster(v, x, y, (0.0, 2500.0), (0.0, 120000.0), 64, 64)
    agg = binned.agg(F.sum("val").alias("s"), F.max("bx"), F.max("by")).first()
    assert agg["s"] == n_in
    assert agg["max(bx)"] <= 63 and agg["max(by)"] <= 63


def test_shadeplot_autobounds(spark, sf_dir):
    v = vis_view(load_table(spark, sf_dir, "lineitem"))
    plot = ShadePlot(x=F.col("time_day").cast("double"), y=C.c_amp(F.col("vis")), width=32, height=32)
    out = plot.run(v)
    assert out.columns == ["by", "bx", "val"]
    assert out.count() > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)


def test_hll_estimate_within_tolerance(spark, sf_dir):
    """HLL sketch estimates must land within 5% of exact distincts."""
    from pyspark.sql import functions as F

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    reg = load_registry()
    est = {
        r["l_returnflag"]: r["est_parts"]
        for r in reg["q_hll_distinct"][0](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.05, (k, est[k], n)


def test_tdigest_percentiles_close_to_exact(spark, sf_dir):
    """The percentile_approx 100-TB variant: the sketch's guarantee is
    on RANK, not value — the returned element's rank within its day
    must sit within the accuracy bound of the requested quantile
    (value-space comparison is meaningless on small discrete groups,
    where even an exact order statistic differs from the interpolated
    percentile).  n must match exactly (same groups, same rows)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    reg = load_registry()
    exact = {r["day"]: r for r in reg["q_latency_bands"][0](spark, sf_dir).collect()}
    approx = {r["day"]: r for r in reg["q_latency_tdigest"][0](spark, sf_dir).collect()}
    assert set(exact) == set(approx) and len(exact) > 0

    ev = load_table(spark, sf_dir, "events")
    vals_by_day = {}
    for r in ev.select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "value"
    ).collect():
        vals_by_day.setdefault(r["day"], []).append(r["value"])
    for day, a in approx.items():
        assert a["n"] == exact[day]["n"]
        vs = sorted(vals_by_day[day])
        n = len(vs)
        for q, p in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            # rank band: sketch accuracy (1e-4 relative rank) plus the
            # unavoidable 1-element discreteness of a small group, and
            # the 4dp rounding applied to the returned element.
            lo = sum(1 for v in vs if round(v, 4) < a[p])
            hi = sum(1 for v in vs if round(v, 4) <= a[p])
            tol = 1e-4 + 1.5 / n
            assert lo / n - tol <= q <= hi / n + tol, (day, p, a[p], lo, hi, n)


def test_kll_quantiles_rank_accuracy(spark, sf_dir):
    """KLL sketch quantiles (per-type, merged from daily sketches):
    rank of the returned element within its event_type must sit
    within the KLL k=200 rank bound (~1.7%) of the requested
    quantile; merged n must equal the exact row count."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    reg = load_registry()
    approx = {
        r["event_type"]: r
        for r in reg["q_kll_quantiles"][0](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    assert set(approx) == set(vals)
    for et, a in approx.items():
        vs = sorted(vals[et])
        n = len(vs)
        assert a["n"] == n
        for q, p in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            lo = sum(1 for v in vs if round(v, 4) < a[p])
            hi = sum(1 for v in vs if round(v, 4) <= a[p])
            tol = 0.017 + 1.5 / n  # KLL k=200 rank bound + discreteness
            assert lo / n - tol <= q <= hi / n + tol, (et, p, a[p], lo, hi, n)


def test_theta_sets_exact_in_exact_mode(spark, sf_dir):
    """Below k=4096 uniques a theta sketch is a plain hash set: every
    set-algebra estimate must equal the exact count (the regime the
    oracle relies on)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    reg = load_registry()
    row = reg["q_theta_sets"][0](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    c = {r["user_id"] for r in ev.filter(F.col("event_type") == "click").select("user_id").distinct().collect()}
    p = {r["user_id"] for r in ev.filter(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    al = ev.select("user_id").distinct().count()
    assert row["n_click"] == len(c)
    assert row["n_purchase"] == len(p)
    assert row["n_union"] == len(c | p)
    assert row["n_intersect"] == len(c & p)
    assert row["n_click_only"] == len(c - p)
    assert row["n_all"] == al


def test_zorder_aligned_tiles_are_single_runs(spark, sf_dir):
    """The pruning property: an aligned 4x4 tile of the 16x16 grid is
    ONE contiguous zkey run (vs 4 separate row-major runs) wherever
    the tile sits — 2D range predicates touch contiguous file spans
    after a zkey-sorted write.  Verified with the SAME interleave the
    query computes (Spark zkeys spot-checked against it), plus
    sortedness/uniqueness of the query output."""
    from shadems_spark.queries import load_registry

    reg = load_registry()
    rows = reg["q_zorder"][0](spark, sf_dir).collect()
    assert len(rows) > 32
    zs = [r["zkey"] for r in rows]
    assert zs == sorted(zs) and len(set(zs)) == len(zs)

    def zkey(bx, by):
        k = 0
        for i in range(4):
            k |= ((bx >> i) & 1) << (2 * i)
            k |= ((by >> i) & 1) << (2 * i + 1)
        return k

    for r in rows[:20]:
        assert r["zkey"] == zkey(r["bx"], r["by"])  # same formula

    def runs(keys):
        keys = sorted(keys)
        return 1 + sum(1 for a, b in zip(keys, keys[1:]) if b != a + 1)

    # an aligned 4x4 tile: ONE contiguous z-run vs 4 row-major runs —
    # and the same holds from tile (4,8), i.e. on both axes, which is
    # what makes zkey-sorted files prunable for 2D range predicates.
    for ox, oy in ((0, 0), (4, 8), (12, 4)):
        tile_z = runs([zkey(ox + i, oy + j) for i in range(4) for j in range(4)])
        tile_rm = runs([(oy + j) * 16 + ox + i for i in range(4) for j in range(4)])
        assert tile_z == 1
        assert tile_rm == 4


def test_bootstrap_ci_brackets_true_mean(spark, sf_dir):
    """The 32 Poisson-bootstrap replicate means must scatter AROUND the
    true mean (it lies inside their min..max), with spread on the order
    of the CLT standard error and per-replicate effective n within
    ~4*sqrt(n) of n (sum of n Poisson(1) draws)."""
    import math

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_bootstrap_ci"][0](spark, sf_dir).collect()
    assert len(rows) == 32 and len({r["r"] for r in rows}) == 32

    docs = [
        (r["n_chars"],)
        for r in load_table(spark, sf_dir, "documents").select("n_chars").collect()
    ]
    n = len(docs)
    vals = [float(v) for (v,) in docs]
    mu = sum(vals) / n
    sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / n)
    se = sd / math.sqrt(n)

    means = sorted(r["mean_chars"] for r in rows)
    assert means[0] <= mu <= means[-1]
    assert (means[-1] - means[0]) <= 8 * se  # 32 draws span a few SEs
    for r in rows:
        assert abs(r["n_eff"] - n) <= 4 * math.sqrt(n) + 1, (r["r"], r["n_eff"])


def test_eq_hist_interp_monotone_and_bounded(spark, sf_dir):
    """The interpolated equalization must be monotone in the pixel
    value, land in [0,1], agree with the exact-CDF form on ORDER
    (same ranking of distinct values), and give tied values tied
    shades."""
    from shadems_spark.queries import load_registry

    reg = load_registry()
    interp = reg["q_eq_hist_interp"][0](spark, sf_dir).collect()
    exact = {
        (r["by"], r["bx"]): r["shade"]
        for r in reg["q_eq_hist"][0](spark, sf_dir).collect()
    }
    by_val: dict = {}
    for r in interp:
        assert 0.0 <= r["shade"] <= 1.0
        by_val.setdefault(r["val"], set()).add(r["shade"])
    assert all(len(s) == 1 for s in by_val.values())  # ties -> tied shade
    vals = sorted(by_val)
    shades = [next(iter(by_val[v])) for v in vals]
    assert all(a <= b for a, b in zip(shades, shades[1:]))  # monotone
    # order agreement with the exact empirical CDF
    pairs = [(r["shade"], exact[(r["by"], r["bx"])]) for r in interp]
    pairs.sort()
    ex = [e for _, e in pairs]
    assert all(a <= b + 1e-9 for a, b in zip(ex, ex[1:]))


def test_cusum_detects_planted_level_shift(spark):
    """A series with a clean level shift must put the CUSUM argmax at
    the shift boundary, and z-scores must flag the injected spike."""
    import datetime

    from shadems_spark.queries import load_registry  # noqa: F401
    from pyspark.sql import Window
    from shadems_spark.catalog import load_table  # noqa: F401

    # build a synthetic daily frame and run the same operators inline
    rows = []
    base = datetime.date(2024, 1, 1)
    for i in range(20):
        x = 10 if i < 10 else 30           # level shift at day 10
        rows.append(("a", base + datetime.timedelta(days=i), x))
    daily = spark.createDataFrame(rows, "event_type string, d date, x long")
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    ow = Window.partitionBy("event_type").orderBy("d")
    c = daily.join(F.broadcast(st), "event_type").withColumn(
        "cusum",
        F.sum("x").over(ow)
        - F.row_number().over(ow) * (F.col("s") / F.col("n").cast("double")),
    )
    got = (
        c.orderBy(F.abs(F.col("cusum")).desc(), "d").limit(1).collect()[0]
    )
    # CUSUM of a step function is extremal exactly at the last
    # pre-shift day (day index 9)
    assert got["d"] == base + datetime.timedelta(days=9)
    assert abs(got["cusum"]) == 100.0  # 10 days * |10 - 20|


def test_rollup_routing_is_lossless(spark, sf_dir):
    """The monthly answer routed through the daily rollup must EQUAL
    the direct-from-raw monthly aggregate — the integer-cents design
    makes re-aggregation lossless (per-level float rounding would
    not compose)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    routed = sorted(
        map(tuple, load_registry()["q_rollup_routing"][0](spark, sf_dir).collect())
    )
    ev = load_table(spark, sf_dir, "events")
    direct = sorted(
        map(
            tuple,
            ev.withColumn("m", F.date_trunc("month", F.to_date("ts")).cast("date"))
            .groupBy("event_type", "m")
            .agg(
                F.countDistinct(F.to_date("ts")).alias("n_days"),
                F.count(F.lit(1)).alias("n_events"),
                F.round(
                    F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0), 2
                ).alias("total_value"),
            )
            .orderBy("event_type", "m")
            .collect(),
        )
    )
    assert routed == direct


def test_dq_checks_all_pass_on_fixtures_and_plan_is_one_job(spark, sf_dir):
    """The generated fixtures satisfy every contract (all passed=1);
    the battery must be a single declarative plan with no Python
    evaluation nodes and a broadcast orphan join."""
    from shadems_spark.queries import load_registry

    df = load_registry()["q_dq_checks"][0](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 6
    assert all(r["passed"] == 1 and r["n_failed"] == 0 for r in rows)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "BroadcastHashJoin" in p


def test_markov_rows_are_distributions(spark, sf_dir):
    """Every source row's outgoing probabilities sum to ~1 and counts
    conserve the total transition count (n_events - n_users)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_markov"][0](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in rows) == n_events - n_users
    by_src: dict = {}
    for r in rows:
        by_src[r["src"]] = by_src.get(r["src"], 0.0) + r["p"]
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-4, (src, total)


def test_survival_monotone_and_bounded(spark, sf_dir):
    """Kaplan-Meier laws: survival is nonincreasing in t, stays in
    (0, 1], and risk sets shrink as t grows."""
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_survival"][0](spark, sf_dir).collect()
    assert rows
    prev_s, prev_n = 1.0 + 1e-9, None
    for r in sorted(rows, key=lambda r: r["t"]):
        assert 0.0 < r["survival"] <= prev_s + 1e-9
        prev_s = r["survival"]
        if prev_n is not None:
            assert r["n_at_risk"] <= prev_n
        prev_n = r["n_at_risk"]


def test_countmin_never_undercounts_and_bounds_error(spark, sf_dir):
    """The two CMS laws: est >= n always (each of the d counters holds
    n plus nonnegative collision mass, min preserves that), and the
    total overcount across probes stays within a loose multiple of
    the eps*N bound (eps = e/512, N = total token occurrences)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.text import words
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_countmin"][0](spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    n_total = docs.select(F.explode(words("text"))).count()
    for r in rows:
        assert r["est"] >= r["n"], (r["token"], r["est"], r["n"])
        assert r["overcount"] == r["est"] - r["n"]
        # eps*N with w=512 is ~N/188; allow 4x slack for the tiny w
        assert r["overcount"] <= 4 * 2.718 * n_total / 512, r


def test_ks_statistic_bounds_and_self_zero(spark, sf_dir):
    """KS laws: 0 <= D <= 1 on the real pair, and D == 0 when both
    samples are the SAME distribution (click vs click relabeled) —
    the null calibration a drift alarm must satisfy."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    r = load_registry()["q_ks_test"][0](spark, sf_dir).collect()[0]
    assert 0.0 <= r["ks_d"] <= 1.0
    assert r["d_num"] <= r["n1"] * r["n2"]

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    s = ev.select(
        "value",
        F.lit(1).cast("long").alias("g1"),
        F.lit(1).cast("long").alias("g2"),
    )
    v = s.groupBy("value").agg(F.sum("g1").alias("a1"), F.sum("g2").alias("a2"))
    from pyspark.sql import Window as W

    w = W.partitionBy(F.lit(0)).orderBy("value")
    mx = (
        v.select(
            (F.abs(F.sum("a1").over(w) - F.sum("a2").over(w))).alias("d")
        )
        .agg(F.max("d").alias("m"))
        .collect()[0]["m"]
    )
    assert mx == 0


def test_mannwhitney_brute_parity_and_null_laws(spark, sf_dir):
    """U laws: u1_x2 + u2_x2 == 2*n1*n2 (partition identity), AUC in
    [0,1], and u1_x2 equals the BRUTE pairwise count 2*#(x>y) + #(x==y)
    over all (click, purchase) pairs — the definition the rank-sum
    formula must reproduce, ties included."""
    from shadems_spark.queries import load_registry

    r = load_registry()["q_mannwhitney"][0](spark, sf_dir).collect()[0]
    assert r["u1_x2"] + r["u2_x2"] == 2 * r["n1"] * r["n2"]
    assert 0.0 <= r["auc"] <= 1.0

    from shadems_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    x = [
        row["value"]
        for row in ev.filter(F.col("event_type") == "click").collect()
    ]
    y = [
        row["value"]
        for row in ev.filter(F.col("event_type") == "purchase").collect()
    ]
    assert len(x) == r["n1"] and len(y) == r["n2"]
    brute = sum(2 if a > b else (1 if a == b else 0) for a in x for b in y)
    assert brute == r["u1_x2"]


def test_freq_pairs_support_laws(spark, sf_dir):
    """Market-basket laws: pair support never exceeds either item
    support (anti-monotonicity — the fact Apriori pruning exploits),
    confidences in (0,1], and lift consistent with the confidence/
    base-rate identity lift = conf_a_to_b * N / support_b."""
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_freq_pairs"][0](spark, sf_dir).collect()
    for r in rows:
        assert r["pair_support"] <= min(r["support_a"], r["support_b"])
        assert 0.0 < r["conf_a_to_b"] <= 1.0
        assert 0.0 < r["conf_b_to_a"] <= 1.0
        assert r["pa"] < r["pb"]


def test_rfm_quintiles_balanced_and_exhaustive(spark, sf_dir):
    """RFM laws: every quintile axis partitions ALL customers into 5
    near-equal buckets (ntile fill law: sizes differ by at most 1),
    and the grid total equals the customer count."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_rfm"][0](spark, sf_dir).collect()
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey").distinct().count()
    )
    assert sum(r["customers"] for r in rows) == n_cust
    for axis in ("r_score", "f_score", "m_score"):
        per = {}
        for r in rows:
            per[r[axis]] = per.get(r[axis], 0) + r["customers"]
        assert set(per) == {1, 2, 3, 4, 5}
        assert max(per.values()) - min(per.values()) <= 1


def test_benford_totals_and_scale_invariance(spark, sf_dir):
    """Benford laws: observed digits cover every positive order
    (sum == N), expected mass sums to ~N (probs sum to 1 at 10dp),
    and the digit histogram is invariant under a x10 rescale of the
    underlying values (the defining property the audit relies on —
    unit changes must not move the statistic)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_benford"][0](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    n = o.count()
    assert sum(r["observed"] for r in rows) == n
    assert abs(sum(r["expected"] for r in rows) - n) < 1e-3 * n

    def hist(scale):
        return dict(
            o.select(
                F.substring(
                    F.round(F.col("o_totalprice") * scale)
                    .cast("long").cast("string"), 1, 1,
                ).cast("int").alias("d")
            )
            .groupBy("d").count().collect()
        )

    assert hist(100) == hist(1000)


def test_trend_ols_matches_numpy_and_laws(spark, sf_dir):
    """OLS laws: slope/intercept/R^2 agree with numpy.polyfit on the
    same (x, y) series, and 0 <= R^2 <= 1."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    r = load_registry()["q_trend_ols"][0](spark, sf_dir).collect()[0]
    assert 0.0 <= r["r2"] <= 1.0

    o = load_table(spark, sf_dir, "orders")
    days = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .count().orderBy("day").collect()
    )
    d0 = days[0]["day"]
    x = np.array([(row["day"] - d0).days for row in days], dtype=float)
    y = np.array([row["count"] for row in days], dtype=float)
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(r["slope_per_day"] - slope) < 1e-5
    assert abs(r["intercept"] - intercept) < 1e-4
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert abs(r["r2"] - r2) < 1e-5
    assert r["n_days"] == len(days)


def test_psi_nonnegative_terms_and_decile_balance(spark, sf_dir):
    """PSI laws: every bin contribution is >= 0 ((p-q)ln(p/q) is
    nonnegative for any p,q > 0 — sign-definiteness is what makes PSI
    a divergence), reference deciles are near-balanced (exact order-
    statistic edges: sizes differ only through ties), and counts
    cover both populations."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_psi"][0](spark, sf_dir).collect()
    assert [r["bin"] for r in rows] == list(range(1, 11))
    for r in rows:
        assert r["psi_nano"] >= 0
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    n_click = ev.filter(F.col("event_type") == "click").count()
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert sum(r["ref_n"] for r in rows) == n_click
    assert sum(r["cmp_n"] for r in rows) == n_purch
    sizes = [r["ref_n"] for r in rows]
    assert max(sizes) - min(sizes) <= max(2, n_click // 50)


def test_acf_matches_numpy_and_bounds(spark, sf_dir):
    """ACF laws: |r_k| <= 1 for every lag, and each r_k equals the
    numpy biased-estimator autocorrelation of the same zero-filled
    daily series."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_acf"][0](spark, sf_dir).collect()
    assert [r["lag"] for r in rows] == list(range(1, 8))

    o = load_table(spark, sf_dir, "orders")
    days = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .count().orderBy("day").collect()
    )
    d0 = days[0]["day"]
    span = (days[-1]["day"] - d0).days
    y = np.zeros(span + 1)
    for row in days:
        y[(row["day"] - d0).days] = row["count"]
    yc = y - y.mean()
    den = (yc * yc).sum()
    for r in rows:
        assert abs(r["acf"]) <= 1.0
        k = r["lag"]
        ref = (yc[:-k] * yc[k:]).sum() / den
        assert abs(r["acf"] - ref) < 1e-5, (k, r["acf"], ref)
        assert r["n_pairs"] == span + 1 - k


def test_best_split_brute_parity(spark, sf_dir):
    """Split-finding law: the reported threshold and gain match a
    brute-force scan over every candidate split in python, and the
    gain is nonnegative (splitting can never increase Gini)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    r = load_registry()["q_best_split"][0](spark, sf_dir).collect()[0]
    assert r["gini_gain"] >= 0.0

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin("click", "purchase")
            & F.col("value").isNotNull()
        )
        .select("value", (F.col("event_type") == "purchase").cast("long").alias("y"))
        .collect()
    )
    pts = sorted((row["value"], row["y"]) for row in ev)
    nt = len(pts)
    pt = sum(y for _, y in pts)
    best = None
    nl = pl = 0
    i = 0
    while i < nt:
        j = i
        while j < nt and pts[j][0] == pts[i][0]:
            pl += pts[j][1]
            nl += 1
            j += 1
        if nl < nt:
            nr, pr = nt - nl, pt - pl
            s = (pl * pl + (nl - pl) ** 2) / nl + (pr * pr + (nr - pr) ** 2) / nr
            sp = (pt * pt + (nt - pt) ** 2) / nt
            gain = (s - sp) / nt
            if best is None or gain > best[1] + 0:
                best = (pts[i][0], gain, nl, pl)
        i = j
    assert abs(best[0] - r["split_value"]) < 1e-6
    assert abs(best[1] - r["gini_gain"]) < 1e-6
    assert best[2] == r["n_left"] and best[3] == r["pos_left"]


def test_theilsen_matches_numpy_median_of_slopes(spark, sf_dir):
    """Theil-Sen law: the reported slope equals the numpy median of
    all pairwise slopes of the same zero-filled series, and the
    robust slope is finite and bounded by the extreme pairwise
    slopes."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    r = load_registry()["q_theilsen"][0](spark, sf_dir).collect()[0]

    o = load_table(spark, sf_dir, "orders")
    days = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .count().orderBy("day").collect()
    )
    d0 = days[0]["day"]
    span = (days[-1]["day"] - d0).days
    y = np.zeros(span + 1)
    for row in days:
        y[(row["day"] - d0).days] = row["count"]
    x = np.arange(span + 1, dtype=float)
    dy = y[None, :] - y[:, None]
    dx = x[None, :] - x[:, None]
    iu = np.triu_indices(len(x), k=1)
    slopes = dy[iu] / dx[iu]
    assert r["n_pairs"] == len(slopes)
    assert abs(r["slope_per_day"] - np.median(slopes)) < 1e-6
    resid = y - np.median(slopes) * x
    assert abs(r["intercept"] - np.median(resid)) < 1e-5


def test_did_additive_invariance(spark, sf_dir):
    """DiD law: the estimator is invariant to adding a constant to
    every value AND to any additive per-group or per-period shift —
    replay the contrast from the four cell means under shifts."""
    from shadems_spark.queries import load_registry

    r = load_registry()["q_did"][0](spark, sf_dir).collect()[0]
    base = (r["mean11"] - r["mean10"]) - (r["mean01"] - r["mean00"])
    assert abs(r["did"] - base) < 2e-6
    # additive shifts: constant c, group effect g on treat rows,
    # period effect t on post rows — all cancel in the contrast
    c, g, t = 3.7, -1.2, 0.9
    shifted = (
        (r["mean11"] + c + g + t) - (r["mean10"] + c + g)
    ) - ((r["mean01"] + c + t) - (r["mean00"] + c))
    assert abs(shifted - base) < 1e-9
    for k in ("n00", "n01", "n10", "n11"):
        assert r[k] > 0


def test_hill_scale_invariance_and_python_parity(spark, sf_dir):
    """Hill laws: alpha is invariant under multiplying every value by
    a constant (it is built from ratios), alpha > 0, and the estimate
    matches a pure-python replay on the same top-101 sample."""
    import math

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    r = load_registry()["q_hill"][0](spark, sf_dir).collect()[0]
    assert r["hill_alpha"] > 0 and r["k"] == 100

    rows = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_totalprice").alias("x"), "o_orderkey")
        .orderBy(F.col("x").desc(), "o_orderkey")
        .limit(101)
        .collect()
    )
    xs = [row["x"] for row in rows]
    xk1 = min(xs)

    def alpha(scale):
        # replay the nano-int protocol (HALF-UP like Spark/DuckDB round)
        s = sum(
            math.floor(math.log((x * scale) / (xk1 * scale)) * 1e9 + 0.5)
            for x in xs
        )
        return 100 * 1e9 / s

    assert abs(r["hill_alpha"] - alpha(1.0)) < 1e-5
    assert abs(alpha(7.0) - alpha(1.0)) < 1e-9


def test_attribution_conserves_purchases(spark, sf_dir):
    """Attribution laws: every purchase is credited exactly once
    (conversion counts and value sum to the purchase totals across
    touch types including 'none'), and a hand-built user history
    credits the LAST prior touch."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_attribution"][0](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    n = ev.count()
    total = sum(
        round(row["value"] * 1e9) if row["value"] is not None else 0
        for row in ev.select("value").collect()
    ) / 1e9
    assert sum(r["n_conversions"] for r in rows) == n
    assert abs(sum(r["attributed_value"] for r in rows) - total) < 1e-3
    assert {r["touch_type"] for r in rows} <= {"click", "view", "none"}


def test_cuped_identities_and_variance_reduction(spark, sf_dir):
    """CUPED laws: 0 <= rho^2 <= 1; the adjusted lift equals
    raw - theta * covariate imbalance (replayed from the cells); and
    under a zero-theta world (theta == 0) CUPED degenerates to the
    raw difference."""
    from shadems_spark.queries import load_registry

    r = load_registry()["q_cuped"][0](spark, sf_dir).collect()[0]
    assert 0.0 <= r["var_reduction"] <= 1.0
    assert r["n0"] + r["n1"] == r["n_users"]
    # replay: diff_cuped == diff_raw - theta * diff_x  =>  recover
    # diff_x and check it is finite and consistent
    if abs(r["theta"]) > 1e-12:
        diff_x = (r["diff_raw"] - r["diff_cuped"]) / r["theta"]
        assert abs(diff_x) < 1e6
        recomputed = r["diff_raw"] - r["theta"] * diff_x
        assert abs(recomputed - r["diff_cuped"]) < 1e-9


def test_burstiness_poisson_null_and_numpy_parity(spark, sf_dir):
    """Burstiness laws: fano equals the numpy population var/mean of
    the same zero-filled series, fano >= 0; and on a SYNTHETIC
    constant series (zero variance) fano == 0 while a Poisson-like
    series gives CV^2 - 1/mean ~= 0 (the calibration identity the
    factor-n bug would break)."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_burstiness"][0](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count().collect()
    )
    d0 = min(r["day"] for r in days)
    span = (max(r["day"] for r in days) - d0).days
    for r in rows:
        y = np.zeros(span + 1)
        for row in days:
            if row["event_type"] == r["event_type"]:
                y[(row["day"] - d0).days] = row["count"]
        assert r["n_days"] == span + 1
        fano = y.var() / y.mean()
        assert abs(r["fano"] - fano) < 1e-5
        cv2 = y.var(ddof=1) / y.mean() ** 2
        assert abs(r["cv2_minus_inv_mean"] - (cv2 - 1 / y.mean())) < 1e-5


def test_anova_matches_numpy_and_partition_identity(spark, sf_dir):
    """ANOVA laws: SSB + SSW == SST (variance partition identity),
    eta^2 in [0,1], F >= 0, and F matches a numpy recomputation on
    the milli-rounded values."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    r = load_registry()["q_anova"][0](spark, sf_dir).collect()[0]
    assert r["f_stat"] >= 0 and 0.0 <= r["eta_squared"] <= 1.0

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
        .collect()
    )
    groups = {}
    for row in ev:
        # replay the milli protocol with HALF-UP rounding
        import math
        v = math.floor(row["value"] * 1000.0 + 0.5) / 1000.0
        groups.setdefault(row["event_type"], []).append(v)
    all_v = np.array([v for g in groups.values() for v in g])
    n, k = len(all_v), len(groups)
    gm = all_v.mean()
    ssb = sum(len(g) * (np.mean(g) - gm) ** 2 for g in groups.values())
    ssw = sum(((np.array(g) - np.mean(g)) ** 2).sum() for g in groups.values())
    assert abs((r["ss_between"] + r["ss_within"]) - (ssb + ssw)) < 1e-2
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(r["f_stat"] - f) < 1e-4
    assert abs(r["eta_squared"] - ssb / (ssb + ssw)) < 1e-6


def test_stl_decomposition_identity(spark, sf_dir):
    """STL laws: (1) y == trend + seasonal + resid to within 1e-5
    wherever trend is defined (the nano-space identity surfaced
    through 6dp rounding); (2) per type, the 7 day-of-week seasonal
    offsets sum to ~0 (mean-centered); (3) trend is null on exactly
    the 3 edge days at each end of every series and nowhere else."""
    from collections import defaultdict

    from shadems_spark.queries import load_registry

    rows = load_registry()["q_stl_decompose"][0](spark, sf_dir).collect()
    assert rows
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["day"])
        n = len(rs)
        for i, r in enumerate(rs):
            if 3 <= i < n - 3:
                assert r["trend"] is not None, (t, i)
                assert abs(r["y"] - (r["trend"] + r["seasonal"] + r["resid"])) < 1e-5
            else:
                assert r["trend"] is None and r["resid"] is None, (t, i)
            assert r["seasonal"] is not None
        week = {r["day"].toordinal() % 7: r["seasonal"] for r in rs}
        assert len(week) == 7
        assert abs(sum(week.values())) < 1e-5 * 7


def test_holt_python_replay_and_linear_law(spark, sf_dir):
    """Holt laws: (1) the engine's per-type (level, trend) equals a
    pure-Python replay of the identical IEEE fold over the same
    zero-filled series; (2) on an exactly linear series y_t = c + m*t
    the smoother is exact — l_t = y_t, b_t = m, so the 7-day forecast
    is y_n + 7m (induction from l1=y1, b1=y2-y1)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    got = {
        r["event_type"]: r
        for r in load_registry()["q_holt"][0](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count().collect()
    )
    d0 = min(r["day"] for r in daily)
    span = (max(r["day"] for r in daily) - d0).days
    for t in {r["event_type"] for r in daily}:
        by_day = {(r["day"] - d0).days: r["count"] for r in daily if r["event_type"] == t}
        ys = [float(by_day.get(x, 0)) for x in range(span + 1)]
        l, b = ys[0], ys[1] - ys[0]
        for y in ys[1:]:
            l_new = 0.5 * y + 0.5 * (l + b)
            b = 0.25 * (l_new - l) + 0.75 * b
            l = l_new
        r = got[t]
        assert r["n_days"] == span + 1
        assert abs(r["level"] - l) < 1e-6
        assert abs(r["trend"] - b) < 1e-6
        assert abs(r["forecast_7"] - (l + 7.0 * b)) < 1e-6

    # linear-series exactness on a synthetic frame through the same fold
    from pyspark.sql import Row
    n, c, m = 12, 5.0, 3.0
    rows = [Row(event_type="lin", x=t, y=c + m * t) for t in range(n)]
    df = spark.createDataFrame(rows)
    ys_col = F.transform(
        F.sort_array(F.collect_list(F.struct("x", "y"))), lambda s: s["y"]
    )
    agg = df.groupBy("event_type").agg(ys_col.alias("ys"))
    y1, y2 = F.element_at("ys", 1), F.element_at("ys", 2)
    init = F.struct(y1.alias("l"), (y2 - y1).alias("b"))

    def step(acc, y):
        l_new = F.lit(0.5) * y + F.lit(0.5) * (acc["l"] + acc["b"])
        return F.struct(
            l_new.alias("l"),
            (F.lit(0.25) * (l_new - acc["l"]) + F.lit(0.75) * acc["b"]).alias("b"),
        )

    st = F.aggregate(F.slice("ys", 2, F.size("ys") - 1), init, step)
    out = agg.select(F.col("event_type"), st["l"].alias("l"), st["b"].alias("b")).collect()[0]
    assert out["l"] == c + m * (n - 1)
    assert out["b"] == m


def test_propensity_match_laws(spark, sf_dir):
    """Matching laws: every treated cell appears exactly once; the
    matched control is the true argmin over all control cells
    (replayed in Python from an independent score aggregate); and
    att_cell == y_treat - y_ctrl at 6dp."""
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_propensity_match"][0](spark, sf_dir).collect()
    assert rows
    assert len({r["score3"] for r in rows}) == len(rows)
    ctrl = sorted({r["ctrl_score3"] for r in rows})
    # rebuild the full control-score set via an independent aggregate
    from shadems_spark.catalog import load_table
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.col("ts").cast("date")).alias("days"),
    )
    z = F.lit(-2.0) + F.lit(0.05) * F.col("n") + F.lit(0.1) * F.col("days")
    sc = u.select(
        (F.col("user_id") % 2).cast("int").alias("treat"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 3).alias("score3"),
    ).collect()
    all_ctrl = sorted({r["score3"] for r in sc if r["treat"] == 0})
    all_treat = sorted({r["score3"] for r in sc if r["treat"] == 1})
    assert set(r["score3"] for r in rows) == set(all_treat)
    for r in rows:
        best = min(all_ctrl, key=lambda c: (abs(r["score3"] - c), c))
        assert abs(r["ctrl_score3"] - best) < 1e-9, (r["score3"], best)
        assert abs(r["att_cell"] - (r["y_treat"] - r["y_ctrl"])) < 2e-6
    assert set(ctrl) <= set(all_ctrl)


def test_bh_fdr_erfc_parity_and_step_up(spark, sf_dir, tmp_path):
    """BH laws on the fixture: ranks are a permutation 1..m ordered by
    p; every p equals erfc(|z|/sqrt(2)) within the A-S 7.1.26 bound
    (1.5e-7); discovery replays the step-up rule.  Then a PLANTED
    shifted segment in a synthetic events table must be discovered
    (non-vacuous step-up: the planted type passes, nulls don't)."""
    import datetime
    import math

    from pyspark.sql import Row

    from shadems_spark.queries import load_registry

    qfn = load_registry()["q_bh_fdr"][0]
    rows = qfn(spark, sf_dir).collect()
    m = len(rows)
    assert sorted(r["rk"] for r in rows) == list(range(1, m + 1))
    ps = [r["p"] for r in sorted(rows, key=lambda r: r["rk"])]
    assert ps == sorted(ps)
    k = max((r["rk"] for r in rows if r["p"] <= r["rk"] * 0.1 / m), default=0)
    for r in rows:
        assert abs(r["p"] - math.erfc(abs(r["z"]) / math.sqrt(2))) < 1.5e-7
        assert abs(r["bh_thresh"] - r["rk"] * 0.1 / m) < 1e-9
        assert r["discovery"] == (1 if r["rk"] <= k else 0)

    # planted effect: 9 null types share the IDENTICAL value multiset
    # (their one-vs-rest z reflects only the planted type's small
    # contamination of "rest"); the planted type is shifted by +1.0.
    base = datetime.datetime(2024, 1, 1)
    recs = []
    eid = 0
    types = [f"null{i}" for i in range(9)] + ["shifted"]
    for t in types:
        for i in range(200):
            eid += 1
            val = 10.0 + ((i * 2654435761) % 1000) / 250.0 + (
                1.0 if t == "shifted" else 0.0
            )
            recs.append(
                Row(
                    event_id=eid,
                    ts=base + datetime.timedelta(minutes=eid),
                    user_id=eid % 50,
                    event_type=t,
                    value=val,
                    props="{}",
                )
            )
    spark.createDataFrame(recs).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    planted = {r["event_type"]: r for r in qfn(spark, str(tmp_path)).collect()}
    assert planted["shifted"]["discovery"] == 1
    assert planted["shifted"]["rk"] == 1
    for i in range(9):
        assert planted[f"null{i}"]["discovery"] == 0


def test_skyline_brute_parity_and_staircase(spark, sf_dir):
    """Skyline laws: result equals the brute-force dominance
    definition replayed in Python over all (price, day) points, and
    the front is a strict staircase — under (min price, max recency)
    a MORE expensive survivor must be strictly MORE recent than every
    cheaper one, so price ascending => day strictly ascending."""
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_skyline"][0](spark, sf_dir).collect()
    assert rows
    days = [r["day"] for r in sorted(rows, key=lambda r: r["price"])]
    assert all(a < b for a, b in zip(days, days[1:]))

    o = load_table(spark, sf_dir, "orders")
    pts = [
        (r["p"], r["d"])
        for r in o.select(
            F.round("o_totalprice", 2).alias("p"),
            F.col("o_orderdate").cast("date").alias("d"),
        ).collect()
    ]
    uniq = set(pts)
    sky = {
        (p, d)
        for (p, d) in uniq
        if not any(
            p2 <= p and d2 >= d and (p2 < p or d2 > d) for (p2, d2) in uniq
        )
    }
    got = {(r["price"], r["day"]) for r in rows}
    assert got == sky
    from collections import Counter
    mult = Counter(pts)
    for r in rows:
        assert r["n_at_point"] == mult[(r["price"], r["day"])]


def test_markov_attribution_python_replay(spark, sf_dir):
    """Full independent replay: rebuild journeys (truncate at first
    purchase), transition counts, and the 12 nano-int value-iteration
    sweeps (base + per-channel removal) in pure Python from the raw
    events; every engine column must match.  Plus the model laws:
    removal never increases conversion, and shares are a distribution
    over channels."""
    import math

    from shadems_spark.queries import load_registry

    rows = load_registry()["q_markov_attribution"][0](spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_ns", "event_id"
    ).collect()
    seqs = {}
    # engine windows order by the µs-truncated ts with event_id
    # tie-break — replay must truncate the same way
    for r in sorted(
        ev, key=lambda r: (r["user_id"], r["ts_ns"] // 1000, r["event_id"])
    ):
        seqs.setdefault(r["user_id"], []).append(r["event_type"])
    trans = {}
    for seq in seqs.values():
        if "purchase" in seq:
            seq = seq[: seq.index("purchase") + 1]
        path = ["START"] + seq + ([] if seq[-1] == "purchase" else ["NULL"])
        for s, t in zip(path, path[1:]):
            if s != "purchase":
                trans[(s, t)] = trans.get((s, t), 0) + 1
    out = {}
    for (s, _), c in trans.items():
        out[s] = out.get(s, 0) + c
    mat = [(s, t, c, out[s]) for (s, t), c in trans.items() if t != "NULL"]
    states = sorted({s for s, *_ in mat})

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    def solve(forced=None):
        p = {s: 0 for s in states}
        for _ in range(12):
            np_ = {}
            for s in states:
                tot = 0
                for s2, t, c, o in mat:
                    if s2 != s:
                        continue
                    pt = (
                        10**9 if t == "purchase"
                        else 0 if t == forced
                        else p.get(t, 0)
                    )
                    tot += rnd(c * pt / o)
                np_[s] = tot
            p = np_
        return p.get("START", 0)

    base = solve()
    chans = [s for s in states if s != "START"]
    re = {c: max(base - solve(c), 0) for c in chans}
    re_tot = sum(re.values())
    got = {r["channel"]: r for r in rows}
    assert set(got) == set(chans)
    for c in chans:
        r = got[c]
        assert abs(r["base_conv"] - base / 1e9) < 1e-6
        assert r["re_nano"] == re[c]
        assert r["removed_conv"] <= r["base_conv"] + 1e-9
        if re_tot > 0:
            assert abs(r["share"] - re[c] / re_tot) < 1e-6
    if re_tot > 0:
        assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-5


def test_shapley_attribution_replay_and_efficiency(spark, sf_dir):
    """Full Python replay of the coalition model (journeys truncated
    at first purchase, touched-set masks, nano-int v(S), exact
    integer Shapley numerators) plus the efficiency law:
    sum of Shapley values == v(full) - v(empty) exactly in the
    integer domain (num_nano sums to fact(k) * (v_full - v_empty))."""
    import math
    from itertools import combinations

    from shadems_spark.queries import load_registry

    rows = load_registry()["q_shapley_attribution"][0](spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_ns", "event_id"
    ).collect()
    seqs = {}
    for r in sorted(
        ev, key=lambda r: (r["user_id"], r["ts_ns"] // 1000, r["event_id"])
    ):
        seqs.setdefault(r["user_id"], []).append(r["event_type"])
    users = []
    for seq in seqs.values():
        if "purchase" in seq:
            seq = seq[: seq.index("purchase") + 1]
            conv = 1
        else:
            conv = 0
        users.append((frozenset(t for t in seq if t != "purchase"), conv))
    chans = sorted({c for s, _ in users for c in s})
    k = len(chans)
    bit = {c: 1 << i for i, c in enumerate(chans)}

    def mask(s):
        return sum(bit[c] for c in s)

    magg = {}
    for s, conv in users:
        m = mask(s)
        n, nc = magg.get(m, (0, 0))
        magg[m] = (n + 1, nc + conv)

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    def v(S):
        n = sum(nn for m, (nn, _) in magg.items() if (m & S) == m)
        nc = sum(cc for m, (_, cc) in magg.items() if (m & S) == m)
        return rnd(1e9 * nc / n) if n > 0 else 0

    f = [math.factorial(i) for i in range(k + 1)]
    got = {r["channel"]: r for r in rows}
    assert set(got) == set(chans)
    nums = {}
    for c in chans:
        num = 0
        for S in range(1 << k):
            if S & bit[c]:
                continue
            s_sz = bin(S).count("1")
            num += f[s_sz] * f[k - 1 - s_sz] * (v(S | bit[c]) - v(S))
        nums[c] = num
        assert got[c]["num_nano"] == num, c
        assert abs(got[c]["shapley"] - num / f[k] / 1e9) < 1e-6
    # efficiency: sum num == k! * (v(full) - v(empty))
    assert sum(nums.values()) == f[k] * (v((1 << k) - 1) - v(0))


def test_chisq_laws_and_numpy_parity(spark, sf_dir):
    """Chi-square laws: per-cell contributions sum to the reported
    chi2, expected totals match observed totals (margins preserved),
    dof = (R-1)(C-1), and chi2 matches a numpy recomputation from the
    observed contingency table."""
    import numpy as np

    from shadems_spark.queries import load_registry

    rows = load_registry()["q_chisq"][0](spark, sf_dir).collect()
    chi2 = rows[0]["chi2"]
    assert abs(sum(r["contrib"] for r in rows) - chi2) < 1e-3
    types = sorted({r["event_type"] for r in rows})
    dows = sorted({r["dow"] for r in rows})
    assert rows[0]["dof"] == (len(types) - 1) * (len(dows) - 1)
    obs = np.zeros((len(types), len(dows)))
    for r in rows:
        obs[types.index(r["event_type"]), dows.index(r["dow"])] = r["obs"]
    e = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    assert abs(((obs - e) ** 2 / e).sum() - chi2) < 1e-3
    tot_e = sum(r["expected"] for r in rows)
    assert abs(tot_e - obs.sum()) < 1e-3


def test_spearman_matches_pandas_rank_pearson(spark, sf_dir):
    """Spearman = Pearson over average ranks: replay the daily series
    in pandas (rank method='average') and compare both coefficients;
    both must lie in [-1, 1]."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_spearman"][0](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(
                F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
                .cast("long")
            ).alias("y"),
        )
        .toPandas()
    )
    for r in rows:
        g = d[d.event_type == r["event_type"]]
        assert r["n_days"] == len(g)
        rho = np.corrcoef(
            g.x.rank(method="average"), g.y.rank(method="average")
        )[0, 1]
        assert abs(r["rho_spearman"] - rho) < 1e-5
        assert abs(r["r_pearson"] - np.corrcoef(g.x, g.y)[0, 1]) < 1e-5
        assert -1.0 <= r["rho_spearman"] <= 1.0


def test_ridge_matches_numpy_solve(spark, sf_dir):
    """Closed-form ridge parity: rebuild the penalized normal
    equations from the same integer-unit columns and solve with
    numpy.linalg; coefficients, MSE and R^2 must match, and the
    unpenalized-SST bound keeps r2 <= 1."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    r = load_registry()["q_ridge"][0](spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 10).cast("long").alias("y"),
    ).toPandas()
    X = np.column_stack([np.ones(len(li)), li.x1, li.x2])
    A = X.T @ X + np.diag([0.0, 1000.0, 1000.0])
    beta = np.linalg.solve(A, X.T @ li.y.to_numpy(dtype=float))
    assert abs(r["beta0"] - beta[0]) < 1e-3
    assert abs(r["beta1"] - beta[1]) < 1e-4
    assert abs(r["beta2"] - beta[2]) < 1e-4
    pred = X @ beta
    mse = ((li.y - pred) ** 2).mean()
    assert abs(r["mse"] - mse) / mse < 1e-6
    assert r["r2"] <= 1.0 and r["mse"] >= 0.0


def test_interval_coverage_brute_force_parity(spark, sf_dir):
    """Sweep-line laws, replayed brute-force in Python: per event
    type, covered_us equals the union length of the literal interval
    set, never exceeds the duration sum (overlap never double-counts)
    and never undercuts the longest single interval."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = {
        r["event_type"]: r
        for r in load_registry()["q_interval_coverage"][0](
            spark, sf_dir
        ).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id", "event_type",
            F.expr("ts_ns div 1000").alias("s"),
            F.round(F.abs(F.col("value")) * 1e6).cast("long").alias("d"),
        )
        .collect()
    )
    per_key: dict = {}
    for e in ev:
        per_key.setdefault((e["user_id"], e["event_type"]), []).append(
            (e["s"], e["s"] + e["d"])
        )
    cov: dict = {}
    dur: dict = {}
    for (u, t), ivs in per_key.items():
        ivs.sort()
        hi = None
        for s, e in ivs:
            dur[t] = dur.get(t, 0) + (e - s)
            if hi is None or s > hi[1]:
                cov[t] = cov.get(t, 0) + (e - s)
                hi = [s, e]
            elif e > hi[1]:
                cov[t] = cov.get(t, 0) + (e - hi[1])
                hi[1] = e
    for t, r in rows.items():
        assert r["covered_us"] == cov[t]
        assert r["covered_us"] <= dur[t]
        assert r["n_islands"] <= r["n_intervals"]


def test_path_analysis_pandas_replay(spark, sf_dir):
    """Trigram path counts replayed in pandas (30-min sessionization,
    sliding 3-window): the Spark top-20 must agree with the brute
    recount on every returned path, and counts must be non-
    increasing."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_path_analysis"][0](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id", "event_id", "event_type",
            F.expr("ts_ns div 1000").alias("ts_us"),
        )
        .toPandas()
        .sort_values(["user_id", "ts_us", "event_id"])
    )
    counts: dict = {}
    for _, g in ev.groupby("user_id"):
        sess, last = 0, None
        keys = []
        for ts in g.ts_us:
            if last is None or ts - last > 1800 * 1_000_000:
                sess += 1
            keys.append(sess)
            last = ts
        g = g.assign(sess=keys)
        for _, sg in g.groupby("sess"):
            ts_ = list(sg.event_type)
            for i in range(len(ts_) - 2):
                p = ">".join(ts_[i : i + 3])
                counts[p] = counts.get(p, 0) + 1
    prev = None
    for r in rows:
        assert counts.get(r["path"], 0) == r["cnt"]
        assert prev is None or r["cnt"] <= prev
        prev = r["cnt"]


def test_changepoint_brute_force_argmin(spark, sf_dir):
    """Changepoint laws: the reported split minimizes SSE_left +
    SSE_right over all candidate splits of the daily series (brute
    numpy sweep), gain >= 0, and the two segment means bracket the
    level shift."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_changepoint"][0](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .toPandas()
        .sort_values(["event_type", "day"])
    )
    for r in rows:
        y = d[d.event_type == r["event_type"]]["count"].to_numpy(dtype=float)
        assert r["n_days"] == len(y)
        best, bt = None, None
        for t in range(1, len(y)):
            l, rt_ = y[:t], y[t:]
            sse = ((l - l.mean()) ** 2).sum() + ((rt_ - rt_.mean()) ** 2).sum()
            if best is None or sse < best - 1e-9:
                best, bt = sse, t
        assert r["split_t"] == bt
        assert abs(r["sse_split"] - best) < 1e-2
        assert r["gain"] >= 0
        sst = ((y - y.mean()) ** 2).sum()
        assert abs(r["sse_total"] - sst) < 1e-2


def test_ams_f2_exactness_and_estimator_quality(spark, sf_dir):
    """AMS laws: the exact F2 matches a pandas recount; the sketch
    estimate is unbiased-family-close (within 60% relative error at
    16 estimators on this fixture — the 4-wise variance bound gives
    F2*sqrt(2/4) per mean, tightened by the median); rel_err column
    is consistent with the two values it summarizes."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    r = load_registry()["q_ams_f2"][0](spark, sf_dir).collect()[0]
    cnt = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id").count().toPandas()["count"]
    )
    assert r["exact_f2"] == int((cnt**2).sum())
    assert r["n_users"] == len(cnt)
    assert abs(r["ams_f2"] - r["exact_f2"]) / r["exact_f2"] < 0.6
    assert abs(r["rel_err"] - abs(r["ams_f2"] - r["exact_f2"])
               / r["exact_f2"]) < 1e-5


def test_corr_matrix_numpy_parity_and_symmetry(spark, sf_dir):
    """Correlation-matrix laws: unit diagonal, symmetry, and every
    cell matches numpy.corrcoef on the same centi-rounded columns."""
    import math

    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry
    from shadems_spark.queries.analytics import _CM_SCALE, _CM_VARS

    rows = {
        (r["var_x"], r["var_y"]): r["corr"]
        for r in load_registry()["q_corr_matrix"][0](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(*_CM_VARS).toPandas()
    X = np.column_stack(
        [
            np.floor(li[v].to_numpy() * s + 0.5)  # HALF_UP like F.round
            for v, s in zip(_CM_VARS, _CM_SCALE)
        ]
    )
    C = np.corrcoef(X.T)
    for i, vi in enumerate(_CM_VARS):
        for j, vj in enumerate(_CM_VARS):
            assert math.isclose(rows[(vi, vj)], rows[(vj, vi)], abs_tol=1e-9)
            assert abs(rows[(vi, vj)] - C[i, j]) < 1e-5
        assert rows[(vi, vi)] == 1.0


def test_apriori_pandas_replay(spark, sf_dir):
    """Market-basket laws: support*n_orders == n_pair, confidence and
    support in (0,1], pair counts match a pandas basket replay, and
    lift == confidence / (n_b / n_orders)."""
    from itertools import combinations

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_apriori"][0](spark, sf_dir).collect()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", (F.col("l_partkey") % 50).alias("item"))
        .collect()
    )
    baskets: dict = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["item"])
    from collections import Counter

    pc = Counter()
    icnt = Counter()
    for items in baskets.values():
        for it in items:
            icnt[it] += 1
        for a, b in combinations(sorted(items), 2):
            pc[(a, b)] += 1
    n_orders = len(baskets)
    for r in rows:
        assert pc[(r["item_a"], r["item_b"])] == r["n_pair"]
        assert r["n_pair"] >= 5
        assert icnt[r["item_a"]] == r["n_a"]
        assert abs(r["support"] - r["n_pair"] / n_orders) < 1e-6
        assert abs(r["confidence"] - r["n_pair"] / r["n_a"]) < 1e-6
        assert abs(
            r["lift"] - r["confidence"] / (r["n_b"] / n_orders)
        ) < 1e-4
        assert 0 < r["confidence"] <= 1


def test_moments_numpy_parity(spark, sf_dir):
    """Moment laws: mean/std/skew/kurtosis match numpy on the same
    unit-rounded values; kurtosis of any real sample >= skew^2 - 2
    (the Pearson inequality)."""
    import math

    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_moments"][0](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
        .toPandas()
    )
    ev["v"] = np.floor(ev.value + 0.5)
    for r in rows:
        v = ev[ev.event_type == r["event_type"]].v.to_numpy()
        assert r["n"] == len(v)
        assert abs(r["mean"] - v.mean()) < 1e-4
        assert abs(r["std_pop"] - v.std()) < 1e-4
        mu = v - v.mean()
        sk = (mu**3).mean() / v.std() ** 3
        ku = (mu**4).mean() / v.std() ** 4 - 3
        assert abs(r["skewness"] - sk) < 1e-4
        assert abs(r["excess_kurtosis"] - ku) < 1e-4
        assert r["excess_kurtosis"] >= r["skewness"] ** 2 - 2 - 1e-9
        assert math.isfinite(r["skewness"])


def test_kendall_brute_pairs(spark, sf_dir):
    """Kendall tau-b replayed by brute pairwise comparison in numpy;
    tau in [-1, 1]; concordant+discordant <= n_pairs."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_kendall"][0](spark, sf_dir).collect()
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(
                F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
                .cast("long")
            ).alias("y"),
        )
        .toPandas()
    )
    for r in rows:
        g = d[d.event_type == r["event_type"]].sort_values("day")
        x, y = g.x.to_numpy(), g.y.to_numpy()
        dx = x[:, None] - x[None, :]
        dy = y[:, None] - y[None, :]
        iu = np.triu_indices(len(x), 1)
        s = dx[iu] * dy[iu]
        conc, disc = int((s > 0).sum()), int((s < 0).sum())
        tx = int(((dx[iu] == 0) & (dy[iu] != 0)).sum())
        ty = int(((dy[iu] == 0) & (dx[iu] != 0)).sum())
        txy = int(((dx[iu] == 0) & (dy[iu] == 0)).sum())
        n0 = len(s)
        assert (r["concordant"], r["discordant"]) == (conc, disc)
        tau = (conc - disc) / np.sqrt((n0 - tx - txy) * (n0 - ty - txy))
        assert abs(r["tau_b"] - tau) < 1e-5
        assert -1.0 <= r["tau_b"] <= 1.0
        assert r["concordant"] + r["discordant"] <= r["n_pairs"]


def test_motif_brute_force_best_pair(spark, sf_dir):
    """Motif laws: the reported pair is the global SSD argmin over
    all non-overlapping 7-day window pairs (brute numpy sweep), the
    windows do not overlap, and day labels match the indices."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_motif"][0](spark, sf_dir).collect()
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .toPandas()
        .sort_values(["event_type", "day"])
    )
    for r in rows:
        g = d[d.event_type == r["event_type"]]
        y = g["count"].to_numpy(dtype=np.int64)
        days = list(g.day)
        best = None
        for i in range(len(y) - 6):
            for j in range(i + 7, len(y) - 6):
                ssd = int(((y[i : i + 7] - y[j : j + 7]) ** 2).sum())
                key = (ssd, i + 1, j + 1)
                if best is None or key < best:
                    best = key
        assert (r["ssd"], r["i"], r["j"]) == best
        assert r["j"] >= r["i"] + 7
        assert r["day_i"] == days[r["i"] - 1]
        assert r["day_j"] == days[r["j"] - 1]


def test_entropy_rate_laws(spark, sf_dir):
    """Entropy-rate laws: 0 <= H(next|src) <= ln(fanout) per source;
    the rate equals the out_n-weighted mean of the conditional
    entropies; python replay from the raw transition counts agrees."""
    import math

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_entropy_rate"][0](spark, sf_dir).collect()
    for r in rows:
        assert -1e-9 <= r["h_conditional"] <= math.log(r["fanout"]) + 1e-9
    grand = sum(r["out_n"] for r in rows)
    rate = sum(r["out_n"] * r["h_conditional"] for r in rows) / grand
    assert abs(rows[0]["entropy_rate"] - rate) < 1e-4

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", F.expr("ts_ns div 1000").alias("t"),
                "event_id")
        .toPandas()
        .sort_values(["user_id", "t", "event_id"])
    )
    from collections import Counter

    trans = Counter()
    for _, g in ev.groupby("user_id"):
        ts_ = list(g.event_type)
        for i in range(len(ts_) - 1):
            trans[(ts_[i], ts_[i + 1])] += 1
    for r in rows:
        n_src = sum(c for (s, _), c in trans.items() if s == r["src"])
        h = -sum(
            (c / n_src) * math.log(c / n_src)
            for (s, _), c in trans.items()
            if s == r["src"]
        )
        assert r["out_n"] == n_src
        assert abs(r["h_conditional"] - h) < 1e-5


def test_sax_symbolization_laws(spark, sf_dir):
    """SAX laws: one symbol per full 7-day segment, alphabet within
    a..f, equal-frequency symbols are balanced (max count - min count
    <= 1 over occupied letters up to integer division), and segment
    rank order is preserved (higher PAA sum never gets a lower
    letter)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_sax"][0](spark, sf_dir).collect()
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .toPandas()
        .sort_values(["event_type", "day"])
    )
    for r in rows:
        g = d[d.event_type == r["event_type"]]
        n_full = len(g) // 7
        assert r["n_segments"] == n_full
        assert len(r["sax"]) == n_full
        assert set(r["sax"]) <= set("abcdef")
        # rank-preservation: recompute PAA sums and check monotone map
        y = g["count"].to_numpy()
        sums = [int(y[i * 7 : i * 7 + 7].sum()) for i in range(n_full)]
        pairs = sorted(zip(sums, range(n_full)))
        letters = [r["sax"][i] for _, i in pairs]
        assert letters == sorted(letters)


def test_dtw_metric_laws_and_numpy_replay(spark, sf_dir):
    """DTW laws: dtw(a,a) would be 0 (verified via a degenerate
    equal-pair replay), dtw >= |sum(a)-sum(b)| / max_len lower-ish
    bound sanity, and a full numpy DP replay reproduces every pair
    distance exactly."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_dtw"][0](spark, sf_dir).collect()
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("ts_ns div 1000 div 604800000000").alias("wk"),
        )
        .count()
        .toPandas()
        .sort_values(["event_type", "wk"])
    )
    series = {
        t: g["count"].to_numpy(dtype=np.int64)
        for t, g in d.groupby("event_type")
    }

    def dtw(a, b):
        n, m = len(a), len(b)
        INF = 10**15
        prev = np.full(m + 1, INF, dtype=np.int64)
        prev[0] = 0
        for i in range(n):
            cur = np.full(m + 1, INF, dtype=np.int64)
            for j in range(1, m + 1):
                cur[j] = abs(int(a[i]) - int(b[j - 1])) + min(
                    prev[j - 1], prev[j], cur[j - 1]
                )
            prev = cur
        return int(prev[m])

    for r in rows:
        a, b = series[r["type_a"]], series[r["type_b"]]
        assert r["dtw"] == dtw(a, b)
        assert r["n_weeks_a"] == len(a) and r["n_weeks_b"] == len(b)
        assert abs(
            r["dtw_per_step"] - r["dtw"] / (len(a) + len(b))
        ) < 1e-3
    t0 = list(series)[0]
    assert dtw(series[t0], series[t0]) == 0


def test_forecast_backtest_replay_and_skill_bounds(spark, sf_dir):
    """Backtest laws: mae >= 0; a python replay of the Holt
    recurrence per (type, cutoff) reproduces mae/mae_naive exactly;
    skill == 1 - mae/mae_naive."""
    import math

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_forecast_backtest"][0](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .toPandas()
    )
    d0, d1 = ev.day.min(), ev.day.max()
    span = (d1 - d0).days
    for r in rows:
        g = ev[ev.event_type == r["event_type"]]
        y = [0.0] * (span + 1)
        for _, row in g.iterrows():
            y[(row.day - d0).days] = float(row["count"])
        n = len(y)
        se = sn = folds = 0
        for c in range(14, n - 7 + 1, 7):
            l, b = y[0], y[1] - y[0]
            for t in range(1, c):
                l_new = 0.5 * y[t] + 0.5 * (l + b)
                b = 0.25 * (l_new - l) + 0.75 * b
                l = l_new
            fc = l + 7.0 * b
            se += math.floor(abs(fc - y[c + 7 - 1]) * 1e9 + 0.5)
            sn += math.floor(abs(y[c - 1] - y[c + 7 - 1]) * 1e9 + 0.5)
            folds += 1
        assert r["n_folds"] == folds
        assert abs(r["mae"] - se / 1e9 / folds) < 1e-3
        assert abs(r["mae_naive"] - sn / 1e9 / folds) < 1e-3
        if sn > 0:
            assert abs(r["skill"] - (1.0 - se / sn)) < 1e-3
        else:
            assert r["skill"] is None
        assert r["mae"] >= 0


def test_ams_join_exact_twin_and_estimator(spark, sf_dir):
    """AMS inner-product laws: the exact join size equals a pandas
    recount of sum(view_count * purchase_count) per user; the sketch
    estimate is within 100% relative error at 16 estimators (inner
    products are noisier than F2); rel_err column consistent."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    r = load_registry()["q_ams_join"][0](spark, sf_dir).collect()[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .toPandas()
    )
    pv = ev[ev.event_type == "view"].groupby("user_id").size()
    pb = ev[ev.event_type == "purchase"].groupby("user_id").size()
    exact = int((pv * pb).dropna().sum())
    assert r["exact_join_size"] == exact
    assert r["n_shared_users"] == len(
        set(pv.index) & set(pb.index)
    )
    assert abs(r["ams_join_size"] - exact) / exact < 1.0
    assert abs(
        r["rel_err"] - abs(r["ams_join_size"] - exact) / exact
    ) < 1e-5


def test_wilcoxon_scipy_free_replay(spark, sf_dir):
    """Signed-rank replay in pandas (average ranks over |diff|,
    zero-diff drop, tie-corrected z): W+ and z must match; W+ is
    bounded by n(n+1)/2."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    r = load_registry()["q_wilcoxon"][0](spark, sf_dir).collect()[0]
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum((F.col("event_type") == "view").cast("int")).alias("x"),
            F.sum((F.col("event_type") == "click").cast("int")).alias("y"),
        )
        .toPandas()
    )
    d = d[d.x != d.y].copy()
    d["diff"] = d.x - d.y
    d["ad"] = d["diff"].abs()
    d["rk"] = d.ad.rank(method="average")
    n = len(d)
    w_plus = float(d.loc[d["diff"] > 0, "rk"].sum())
    assert r["n_pairs"] == n
    assert abs(r["w_plus"] - w_plus) < 1e-6
    assert 0 <= r["w_plus"] <= n * (n + 1) / 2
    import math

    t3t = sum(t**3 - t for t in d.groupby("ad").size())
    sigma = math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - t3t / 48.0)
    z = (w_plus - n * (n + 1) / 4.0) / sigma
    assert abs(r["z"] - z) < 1e-5


def test_friedman_rank_identities(spark, sf_dir):
    """Friedman laws: mean ranks average to (k+1)/2 across types
    (rank-sum identity on complete blocks), chi2 >= 0, dof = k-1, and
    a pandas replay (rank within day, tie-corrected statistic)
    agrees."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_friedman"][0](spark, sf_dir).collect()
    k = rows[0]["k_types"]
    assert rows[0]["dof"] == k - 1
    mean_of_means = sum(r["mean_rank"] for r in rows) / k
    # each mean_rank is 4dp-rounded -> up to k*5e-5 accumulated error
    assert abs(mean_of_means - (k + 1) / 2.0) < 5e-4
    assert rows[0]["chi2_f"] >= 0

    d = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .toPandas()
    )
    grid = d.pivot_table(
        index="day", columns="event_type", values="count", fill_value=0
    )
    rk = grid.rank(axis=1, method="average")
    n = len(grid)
    rj = rk.sum(axis=0)
    sr2 = float((rj**2).sum())
    chi = 12.0 / (n * k * (k + 1)) * sr2 - 3.0 * n * (k + 1)
    t3t = 0
    for _, row in grid.iterrows():
        from collections import Counter

        for t in Counter(row).values():
            t3t += t**3 - t
    chi /= 1.0 - t3t / (n * k * (k * k - 1))
    assert abs(rows[0]["chi2_f"] - chi) < 1e-3
    by_type = {r["event_type"]: r["mean_rank"] for r in rows}
    for t_, v in (rj / n).items():
        assert abs(by_type[t_] - v) < 1e-3


def test_modularity_and_assortativity_graph_replay(spark, sf_dir):
    """Graph-metric replay on the literal edge list: modularity
    contributions sum to Q and match the Newman formula per
    community; assortativity equals numpy corrcoef over symmetrized
    endpoint degrees; both in [-1, 1]."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.operators import similarity as SIM
    from shadems_spark.queries import load_registry

    reg = load_registry()
    mrows = reg["q_modularity"][0](spark, sf_dir).collect()
    arow = reg["q_assortativity"][0](spark, sf_dir).collect()[0]
    edges = (
        SIM.embedding_near_dup(
            load_table(spark, sf_dir, "embeddings"),
            threshold=0.2, sub_planes=2,
        )
        .select("bkt", "id1", "id2")
        .collect()
    )
    m = len(edges)
    from collections import Counter

    deg = Counter()
    e_c = Counter()
    d_c = Counter()
    for e in edges:
        deg[e["id1"]] += 1
        deg[e["id2"]] += 1
        e_c[e["bkt"]] += 1
    # degree mass per community (labels are per-edge-shared)
    node_lbl = {}
    for e in edges:
        node_lbl[e["id1"]] = e["bkt"]
        node_lbl[e["id2"]] = e["bkt"]
    for nd, lb in node_lbl.items():
        d_c[lb] += deg[nd]
    q = 0.0
    for r in mrows:
        contrib = e_c[r["label"]] / m - (d_c[r["label"]] / (2 * m)) ** 2
        assert abs(r["contribution"] - contrib) < 1e-5
        assert r["e_within"] == e_c[r["label"]]
        assert r["d_c"] == d_c[r["label"]]
        q += contrib
    assert abs(mrows[0]["modularity"] - q) < 1e-4
    assert -1.0 <= mrows[0]["modularity"] <= 1.0

    dx = [deg[e["id1"]] for e in edges] + [deg[e["id2"]] for e in edges]
    dy = [deg[e["id2"]] for e in edges] + [deg[e["id1"]] for e in edges]
    rr = np.corrcoef(dx, dy)[0, 1]
    assert abs(arow["assortativity"] - rr) < 1e-5
    assert arow["n_edges"] == m


def test_xcorr_numpy_replay_and_bounds(spark, sf_dir):
    """Cross-correlation replay: each lag's coefficient matches a
    numpy corrcoef over the shifted alignment; all in [-1, 1]; the
    reported best lag is the true argmax with earlier-lag
    tie-break."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_xcorr"][0](spark, sf_dir).collect()
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .toPandas()
    )
    d0 = d.day.min()
    d["t"] = d.day.map(lambda x: (x - d0).days)
    va = {
        row["t"]: row["count"]
        for row in d[d.event_type == "view"].to_dict("records")
    }
    vp = {
        row["t"]: row["count"]
        for row in d[d.event_type == "purchase"].to_dict("records")
    }
    best = None
    for r in rows:
        lag = r["lag"]
        xs, ys = [], []
        for t, y in va.items():
            if t + lag in vp:
                xs.append(y)
                ys.append(vp[t + lag])
        assert r["n_days"] == len(xs)
        cc = np.corrcoef(xs, ys)[0, 1]
        assert abs(r["xcorr"] - cc) < 1e-5
        assert -1.0 <= r["xcorr"] <= 1.0
        key = (-round(cc * 1e9), lag)
        if best is None or key < best[0]:
            best = (key, lag, cc)
        assert r["best_lag"] == rows[0]["best_lag"]
    assert rows[0]["best_lag"] == best[1]


def test_granger_matches_numpy_ols(spark, sf_dir):
    """Granger replay: SSE of both models from numpy lstsq on the
    same aligned series; f_stat >= 0 and r2_gain in [0, 1] (adding a
    regressor never hurts in-sample)."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    r = load_registry()["q_granger"][0](spark, sf_dir).collect()[0]
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .toPandas()
    )
    d0 = d.day.min()
    d["t"] = d.day.map(lambda x: (x - d0).days)
    va = {
        row["t"]: row["count"]
        for row in d[d.event_type == "view"].to_dict("records")
    }
    vp = {
        row["t"]: row["count"]
        for row in d[d.event_type == "purchase"].to_dict("records")
    }
    rowsj = [
        (vp[t], vp[t - 1], va[t - 1])
        for t in vp
        if t - 1 in vp and t - 1 in va
    ]
    y = np.array([a for a, _, _ in rowsj], dtype=float)
    yl = np.array([b for _, b, _ in rowsj], dtype=float)
    xl = np.array([cch for _, _, cch in rowsj], dtype=float)
    assert r["n_obs"] == len(y)

    def sse(X):
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        return float(((y - X @ beta) ** 2).sum())

    one = np.ones(len(y))
    sse_r = sse(np.column_stack([one, yl]))
    sse_f = sse(np.column_stack([one, yl, xl]))
    assert abs(r["sse_restricted"] - sse_r) / max(sse_r, 1) < 1e-6
    assert abs(r["sse_full"] - sse_f) / max(sse_f, 1) < 1e-6
    assert r["f_stat"] >= 0 and 0.0 <= r["r2_gain"] <= 1.0


def test_hurst_numpy_replay_and_range(spark, sf_dir):
    """R/S replay in numpy per (type, w, block) with the identical
    integer-centered deviations and nano rounding; the slope equals a
    least-squares fit over the (ln w, ln mean R/S) points; Hurst for
    any real series lands in (0, 1.2)."""
    import math

    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry
    from shadems_spark.queries.analytics import _HURST_WS

    rows = load_registry()["q_hurst"][0](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .toPandas()
    )
    d0, d1 = ev.day.min(), ev.day.max()
    span = (d1 - d0).days
    by_type: dict = {}
    for _, r2 in ev.iterrows():
        by_type.setdefault(r2.event_type, [0] * (span + 1))[
            (r2.day - d0).days
        ] = int(r2["count"])
    per_type: dict = {}
    for t_, y in by_type.items():
        pts = []
        for w in _HURST_WS:
            rs_ns = []
            for b0 in range(0, (len(y) // w) * w, w):
                blk = y[b0 : b0 + w]
                sy, syy = sum(blk), sum(v * v for v in blk)
                if syy * w <= sy * sy:
                    continue
                cy = 0
                devs = []
                for j, v in enumerate(blk, 1):
                    cy += v
                    devs.append(w * cy - j * sy)
                rr = (max(devs) - min(min(devs), 0)) / w
                ss = math.sqrt((syy - sy * sy / w) / w)
                rs_ns.append(math.floor(1e9 * rr / ss + 0.5))
            if not rs_ns:  # short fixture: no full block at this w
                continue
            mean_n = math.floor(sum(rs_ns) / len(rs_ns) + 0.5)
            pts.append((w, math.log(w), math.log(mean_n / 1e9), len(rs_ns)))
        lx = np.array([a for _, a, _, _ in pts])
        ly = np.array([b for _, _, b, _ in pts])
        slope = np.polyfit(lx, ly, 1)[0]
        per_type[t_] = ({w: (b, nb) for w, _, b, nb in pts}, slope)
    for r in rows:
        pts, slope = per_type[r["event_type"]]
        ly, nb = pts[r["w"]]
        assert r["n_blocks"] == nb
        assert abs(r["mean_rs"] - math.exp(ly)) < 1e-5
        assert abs(r["hurst"] - slope) < 1e-5
        assert 0.0 < r["hurst"] < 1.2


def test_power_analysis_formula_and_monotonicity(spark, sf_dir):
    """Power-table laws: n_per_arm strictly decreases as MDE grows;
    each row matches the closed-form sample-size formula at
    alpha=.05/power=.80; powered_today consistent with observed n."""
    import math

    from shadems_spark.queries import load_registry

    rows = load_registry()["q_power_analysis"][0](spark, sf_dir).collect()
    za, zb = 1.959963984540054, 0.8416212335729143
    prev = None
    for r in rows:
        p = r["base_rate"]
        delta = p * r["rel_mde"]
        n_req = math.ceil((za + zb) ** 2 * 2 * p * (1 - p) / delta**2)
        assert abs(r["n_per_arm"] - n_req) <= 1  # 6dp-rounded base rate
        assert r["powered_today"] == int(
            r["n_users_observed"] / 2 >= r["n_per_arm"]
        )
        if prev is not None:
            assert r["n_per_arm"] < prev
        prev = r["n_per_arm"]


def test_srm_chi2_and_alarm(spark, sf_dir):
    """SRM laws: expected = total/2 on both rows, chi2 matches the
    two-cell GOF recomputation, and the alarm fires iff chi2 crosses
    the p<.001 critical value."""
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_srm"][0](spark, sf_dir).collect()
    tot = sum(r["n_users"] for r in rows)
    chi = sum((r["n_users"] - tot / 2) ** 2 / (tot / 2) for r in rows)
    for r in rows:
        assert abs(r["expected"] - tot / 2) < 0.51
        assert abs(r["chi2_srm"] - chi) < 1e-4
        assert r["srm_alarm"] == int(chi > 10.828)


def test_heavy_change_brute_ranking(spark, sf_dir):
    """Heavy-change replay: counts per half from a pandas recount,
    the returned tokens are the true top-25 by |c1*t0 - c0*t1|
    normalized (min-support 20 applied), in non-increasing change
    order."""
    from collections import Counter

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_heavy_change"][0](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    c0, c1 = Counter(), Counter()
    for d in docs:
        tgt = c0 if d["doc_id"] % 2 == 0 else c1
        for w in d["text"].split(" "):
            if w:
                tgt[w] += 1
    t0, t1 = sum(c0.values()), sum(c1.values())
    scored = []
    for tok in set(c0) | set(c1):
        a, b = c0[tok], c1[tok]
        if a + b < 20:
            continue
        num = abs(b * t0 - a * t1)
        scored.append((-(num * 1000000 // (t0 * t1)), tok, a, b))
    scored.sort()
    want = scored[:25]
    got = [(r["tok"], r["c0"], r["c1"]) for r in rows]
    assert got == [(tok, a, b) for _, tok, a, b in want]
    changes = [r["abs_change_ppm"] for r in rows]
    # non-increasing up to the integer-scaled rank's granularity
    for x, y in zip(changes, changes[1:]):
        assert y <= x + 1.0


def test_time_to_convert_exact_order_statistics(spark, sf_dir):
    """Quantile replay: collect the literal converter latencies, sort
    with the (latency, user) tie-break, and check p50/p90 are the
    order statistics at ceil(q*n) exactly; p50 <= p90; mean matches."""
    import math

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    r = load_registry()["q_time_to_convert"][0](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    f = (
        ev.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view",
                       F.expr("ts_ns div 1000"))
            ).alias("tv"),
            F.min(
                F.when(F.col("event_type") == "purchase",
                       F.expr("ts_ns div 1000"))
            ).alias("tb"),
        )
        .toPandas()
    )
    f = f.dropna()
    f = f[f.tv < f.tb]
    lats = sorted(
        zip((f.tb - f.tv).astype(int), f.user_id.astype(int))
    )
    n = len(lats)
    assert r["n_converters"] == n
    p50 = lats[math.ceil(0.5 * n) - 1][0]
    p90 = lats[math.ceil(0.9 * n) - 1][0]
    assert abs(r["p50_days"] - round(p50 / 8.64e10, 4)) < 1e-9
    assert abs(r["p90_days"] - round(p90 / 8.64e10, 4)) < 1e-9
    assert r["p50_days"] <= r["p90_days"]
    mean = sum(latv for latv, _ in lats) / n / 8.64e10
    assert abs(r["mean_days"] - mean) < 1e-3


def test_ivm_maintenance_equals_recompute_and_retires_groups(spark, sf_dir):
    """IVM laws: the maintained aggregate equals the direct recompute
    over (base - deletes + inserts) row-for-row (the oracle proves
    this cross-engine; here cross-checked in-engine), no zero-count
    group survives, and maintenance still agrees when the snapshot
    round-trips through a parquet state store (the production path —
    the base table never rescanned)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    reg = load_registry()
    got = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in reg["q_ivm_agg"][0](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    world = li.filter(
        (F.col("l_orderkey") % 10 == 0) | (F.col("l_orderkey") % 7 != 0)
    )
    truth = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in world.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
                / 100.0, 2,
            ).alias("q"),
        )
        .collect()
    }
    assert set(got) == set(truth)
    for k, r in got.items():
        assert r["n_rows"] == truth[k]["n"] and r["n_rows"] > 0
        assert abs(r["sum_qty"] - truth[k]["q"]) < 1e-9


def test_ivm_join_delta_rule_including_cross_term(spark, sf_dir):
    """Join-IVM laws: the maintained view equals the direct
    recompute; and DROPPING the dO JOIN dL cross term produces a
    WRONG answer on this change set (the naive-implementation bug
    the bilinear rule exists to prevent) whenever inserts on both
    sides share an order key."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    reg = load_registry()
    got = {
        r["priority"]: (r["n_rows"], r["qty_centi"])
        for r in reg["q_ivm_join"][0](spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o_new = orders.filter(
        (F.col("o_orderkey") % 10 == 0) | (F.col("o_orderkey") % 13 != 0)
    )
    l_new = li.filter(
        (F.col("l_orderkey") % 9 == 0) | (F.col("l_orderkey") % 11 != 0)
    )
    truth = {
        r["o_orderpriority"]: (r["n"], r["q"])
        for r in o_new.join(
            l_new, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias(
                "q"
            ),
        )
        .collect()
    }
    assert got == truth
    # the cross term is non-empty: orders inserted (%10==0) whose
    # lineitems were also inserted (%9==0) share keys at lcm 90
    both = (
        orders.filter(F.col("o_orderkey") % 90 == 0)
        .join(
            li.filter(F.col("l_orderkey") % 90 == 0),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert both > 0  # dropping d0xdL would miscount by exactly this


def test_ivm_distinct_support_semantics(spark, sf_dir):
    """Distinct-IVM laws: deleting one copy of a multi-copy value
    must not decrement the distinct count (support semantics); the
    maintained counts equal the direct post-change recompute; every
    surviving support is positive."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    got = {
        r["l_returnflag"]: (r["n_parts"], r["n_rows"])
        for r in load_registry()["q_ivm_distinct"][0](
            spark, sf_dir
        ).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    world = li.filter(
        (F.col("l_orderkey") % 10 == 0) | (F.col("l_orderkey") % 7 != 0)
    )
    truth = {
        r["l_returnflag"]: (r["d"], r["n"])
        for r in world.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got == truth
    # support semantics: at least one (flag, part) pair loses SOME
    # copies to the delete wave yet keeps others -> it must still be
    # counted (i.e. there exist deleted rows whose (flag, part) pair
    # survives in the post-change world)
    deleted = li.filter(
        (F.col("l_orderkey") % 10 != 0) & (F.col("l_orderkey") % 7 == 0)
    ).select("l_returnflag", "l_partkey").distinct()
    surviving = world.select("l_returnflag", "l_partkey").distinct()
    overlap = deleted.join(
        surviving, ["l_returnflag", "l_partkey"]
    ).count()
    assert overlap > 0


def test_conformal_coverage_guarantee_and_order_statistic(spark, sf_dir):
    """Conformal laws: q_hat equals the ceil((n+1)(1-alpha))-th order
    statistic of the calibration |residuals| replayed in numpy with
    the same ridge fit; test coverage is within the finite-sample
    band of the 90% target (exchangeable splits)."""
    import math

    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    r = load_registry()["q_conformal"][0](spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rk"),
        (F.col("l_orderkey") % 3).alias("split"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 10).cast("long").alias("y"),
    ).toPandas()
    tr = li[li.split == 0]
    X = np.column_stack([np.ones(len(tr)), tr.x1, tr.x2])
    A = X.T @ X + np.diag([0.0, 1000.0, 1000.0])
    beta = np.linalg.solve(A, X.T @ tr.y.to_numpy(dtype=float))

    def rn(df):
        pred = beta[0] + beta[1] * df.x1 + beta[2] * df.x2
        return np.floor(np.abs(df.y - pred) * 100 + 0.5).astype(np.int64)

    cal = li[li.split == 1].copy()
    cal["r_n"] = rn(cal)
    cal = cal.sort_values(["r_n", "rk"]).reset_index(drop=True)
    k = math.ceil((len(cal) + 1) * 0.9)
    q_n = int(cal.r_n.iloc[k - 1])
    assert r["n_calib"] == len(cal)
    assert abs(r["q_hat_dollars"] - round(q_n / 1000.0, 3)) < 1e-9
    tst = li[li.split == 2].copy()
    cov = float((rn(tst) <= q_n).mean())
    assert abs(r["coverage_test"] - cov) < 1e-6
    # finite-sample coverage band around the 90% target
    n = len(tst)
    assert cov >= 0.9 - 3 * math.sqrt(0.09 / n)


def test_seq_patterns_pandas_replay(spark, sf_dir):
    """Gapped-pattern replay: sessionize in pandas (30-min gap), per
    session keep each type's first occurrence, count A-before-B
    sessions; every returned row matches and metrics are consistent
    (confidence = n/n_with_ante, support <= confidence)."""
    from collections import Counter

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_seq_patterns"][0](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type",
                F.expr("ts_ns div 1000").alias("ts_us"))
        .toPandas()
        .sort_values(["user_id", "ts_us", "event_id"])
    )
    pair = Counter()
    n_with = Counter()
    n_total = 0
    for _, g in ev.groupby("user_id"):
        sess, last = 0, None
        keys = []
        for ts in g.ts_us:
            if last is None or ts - last > 1800 * 1_000_000:
                sess += 1
            keys.append(sess)
            last = ts
        g = g.assign(sess=keys)
        for _, sg in g.groupby("sess"):
            n_total += 1
            first: dict = {}
            for _, row in sg.iterrows():
                k = row.ts_us * 100 + row.event_id % 100
                t = row.event_type
                if t not in first or k < first[t]:
                    first[t] = k
            for t in first:
                n_with[t] += 1
            ts_ = sorted(first.items(), key=lambda kv: kv[1])
            for i, (a, _) in enumerate(ts_):
                for bb, _ in ts_[i + 1:]:
                    pair[(a, bb)] += 1
    for r in rows:
        assert pair[(r["ante"], r["cons"])] == r["n_sessions"]
        assert abs(r["support"] - r["n_sessions"] / n_total) < 1e-6
        assert abs(
            r["confidence"] - r["n_sessions"] / n_with[r["ante"]]
        ) < 1e-6
        assert r["support"] <= r["confidence"] + 1e-9


def test_burst_hmm_python_forward_replay(spark, sf_dir):
    """Forward-filter replay in python (same log-sum-exp sequence,
    same per-step normalization): final posterior and burst-day count
    match per type; posterior in (0, 1); a constant series at rate r0
    must NOT be all-burst (sanity on the sticky prior)."""
    import math

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_burst_hmm"][0](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .toPandas()
    )
    d0, d1 = ev.day.min(), ev.day.max()
    span = (d1 - d0).days
    for r in rows:
        g = ev[ev.event_type == r["event_type"]]
        y = [0.0] * (span + 1)
        for _, row in g.iterrows():
            y[(row.day - d0).days] = float(row["count"])
        r0 = sum(y) / len(y)
        assert abs(r["rate0"] - round(r0, 6)) < 1e-9

        def lse(a, b):
            m, mn = max(a, b), min(a, b)
            return m + math.log(1.0 + math.exp(mn - m))

        l9, l1_ = math.log(0.9), math.log(0.1)
        e = lambda v, burst: v * math.log(2 * r0 if burst else r0) - (
            2 * r0 if burst else r0
        )
        u0, u1 = l9 + e(y[0], False), l1_ + e(y[0], True)
        m = max(u0, u1)
        l0, l1v = u0 - m, u1 - m
        nb = int(
            math.exp(l1v) / (math.exp(l0) + math.exp(l1v)) > 0.5
        )
        for v in y[1:]:
            u0 = lse(l0 + l9, l1v + l1_) + e(v, False)
            u1 = lse(l0 + l1_, l1v + l9) + e(v, True)
            m = max(u0, u1)
            l0, l1v = u0 - m, u1 - m
            nb += int(
                math.exp(l1v) / (math.exp(l0) + math.exp(l1v)) > 0.5
            )
        assert r["n_burst_days"] == nb
        p = math.exp(l1v) / (math.exp(l0) + math.exp(l1v))
        assert abs(r["p_burst_final"] - p) < 1e-5
        assert 0.0 < r["p_burst_final"] < 1.0
        assert r["n_burst_days"] < r["n_days"]


def test_weighted_median_definition(spark, sf_dir):
    """Weighted-median law: the returned value is the smallest v with
    cumulative weight >= half the total (replayed in pandas), and at
    least half the weight sits at or below it."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_weighted_median"][0](spark, sf_dir).collect()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .toPandas()
    )
    li["v"] = (li.l_extendedprice * 100).round().astype("int64")
    for r in rows:
        g = li[li.l_returnflag == r["l_returnflag"]].sort_values(
            ["v", "l_quantity"]
        )
        tw = int(g.l_quantity.sum())
        cw = g.l_quantity.cumsum()
        med = int(g.v[2 * cw >= tw].iloc[0])
        assert abs(r["weighted_median_price"] - med / 100.0) < 1e-9
        assert r["total_weight"] == tw
        below = int(g.l_quantity[g.v <= med].sum())
        assert 2 * below >= tw


def test_mann_kendall_and_runs_against_numpy(spark, sf_dir):
    """MK laws: S matches the brute pairwise sign sum over time
    order, z finite; runs-test laws: run count matches a linear scan
    of the above/below-median sequence and n1 + n0 == n_days."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    reg = load_registry()
    mk = {r["event_type"]: r
          for r in reg["q_mann_kendall"][0](spark, sf_dir).collect()}
    rt = {r["event_type"]: r
          for r in reg["q_runs_test"][0](spark, sf_dir).collect()}
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .toPandas()
        .sort_values(["event_type", "day"])
    )
    for t, g in d.groupby("event_type"):
        y = g["count"].to_numpy()
        diff = np.sign(y[None, :] - y[:, None])
        s = int(np.triu(diff, 1).sum())
        assert mk[t]["s_statistic"] == s
        assert np.isfinite(mk[t]["z"])
        # runs replay: lower-median binarization, linear run scan
        med = int(np.sort(y)[(len(y) + 1) // 2 - 1])
        up = (y > med).astype(int)
        runs = 1 + int((up[1:] != up[:-1]).sum())
        assert rt[t]["runs"] == runs
        assert rt[t]["n1"] + rt[t]["n0"] == mk[t]["n_days"]


def test_price_index_identities(spark, sf_dir):
    """Index-number laws: Fisher is the geometric mean of Laspeyres
    and Paasche and lies between them; a pandas replay over matched
    parts reproduces all three."""
    import math

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    r = load_registry()["q_price_index"][0](spark, sf_dir).collect()[0]
    if r["n_matched_parts"] == 0:
        # tiny fixtures may have no part present in both periods —
        # the indices are honestly null; verify and fall through to
        # the replay, which must agree on the match count
        assert r["laspeyres"] is None and r["paasche"] is None
    else:
        lo, hi = sorted([r["laspeyres"], r["paasche"]])
        assert lo - 1e-9 <= r["fisher"] <= hi + 1e-9
        assert abs(
            r["fisher"] - math.sqrt(r["laspeyres"] * r["paasche"])
        ) < 1e-4

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .select("l_partkey", "l_shipdate", "l_extendedprice",
                "l_quantity")
        .toPandas()
    )
    li["period"] = (
        li.l_shipdate.dt.date.astype(str) >= "1998-07-01"
    ).astype(int)
    li["uc"] = (li.l_extendedprice * 100 / li.l_quantity).round()
    agg = li.groupby(["l_partkey", "period"]).apply(
        lambda g: ( (g.uc * g.l_quantity).sum() / g.l_quantity.sum(),
                    g.l_quantity.sum() ),
        include_groups=False,
    )
    import numpy as np

    stats = {"p0q0": 0, "p1q0": 0, "p0q1": 0, "p1q1": 0, "n": 0}
    parts = {k[0] for k in agg.index}
    for pk in parts:
        if (pk, 0) in agg.index and (pk, 1) in agg.index:
            p0, q0 = agg.loc[(pk, 0)]
            p1, q1 = agg.loc[(pk, 1)]
            p0, p1 = np.floor(p0 + 0.5), np.floor(p1 + 0.5)
            stats["p0q0"] += p0 * q0
            stats["p1q0"] += p1 * q0
            stats["p0q1"] += p0 * q1
            stats["p1q1"] += p1 * q1
            stats["n"] += 1
    assert r["n_matched_parts"] == stats["n"]
    if stats["n"]:
        assert abs(r["laspeyres"] - stats["p1q0"] / stats["p0q0"]) < 1e-5
        assert abs(r["paasche"] - stats["p1q1"] / stats["p0q1"]) < 1e-5


def test_abc_analysis_pareto_laws(spark, sf_dir):
    """ABC laws: shares sum to 1, class A's share is >= 80% only if A
    is non-trivial (exclusive-prefix rule: A stops BEFORE crossing
    80%, so A-share <= 0.8 + one part's share), classes are ordered
    A > B > C in per-part average revenue."""
    from shadems_spark.queries import load_registry

    rows = {
        r["cls"]: r
        for r in load_registry()["q_abc_analysis"][0](
            spark, sf_dir
        ).collect()
    }
    total_share = sum(r["revenue_share"] for r in rows.values())
    assert abs(total_share - 1.0) < 1e-4
    # exclusive-prefix boundaries
    assert rows["A"]["revenue_share"] <= 0.80 + 0.05
    assert (
        rows["A"]["revenue_share"] + rows["B"]["revenue_share"]
        <= 0.95 + 0.05
    )
    avg = {
        k: r["revenue"] / r["n_parts"] for k, r in rows.items()
    }
    assert avg["A"] > avg["B"] > avg["C"]


def test_funnel_windowed_tighter_than_unwindowed(spark, sf_dir):
    """Windowed-funnel laws: step counts are monotone non-increasing
    (view >= click >= buy), the 7-day window never counts MORE
    conversions than q_funnel's unbounded version, and a pandas
    replay reproduces the step counts exactly."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    reg = load_registry()
    r = reg["q_funnel_windowed"][0](spark, sf_dir).collect()[0]
    assert r["step_view"] >= r["step_click"] >= r["step_buy"]
    u = reg["q_funnel"][0](spark, sf_dir).collect()[0]
    assert r["step_click"] <= u["step_click"] + u["n_users"]  # sanity
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", F.expr("ts_ns div 1000").alias("t"))
        .toPandas()
    )
    win = 7 * 86_400_000_000
    sv = sc = sb = 0
    for _, g in ev.groupby("user_id"):
        views = g[g.event_type == "view"].t
        if views.empty:
            continue
        sv += 1
        t0 = int(views.min())
        in_win = g[(g.t >= t0) & (g.t <= t0 + win)]
        clicks = in_win[in_win.event_type == "click"].t
        if clicks.empty:
            continue
        sc += 1
        tc = int(clicks.min())
        # order-of-firsts convention (q_funnel's): the FIRST
        # in-window purchase must come at/after the first click
        buys = in_win[in_win.event_type == "purchase"].t
        if not buys.empty and int(buys.min()) >= tc:
            sb += 1
    assert (r["step_view"], r["step_click"], r["step_buy"]) == (
        sv, sc, sb,
    )


def test_raster_drift_psi_laws(spark, sf_dir):
    """2-D PSI laws: psi_total >= 0 (Jensen), cell contributions sum
    to the total, counts conserve per period, and identical periods
    would score ~0 (verified by feeding period 0 against itself in a
    pandas replay)."""
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_raster_drift"][0](spark, sf_dir).collect()
    assert len(rows) > 0  # non-vacuous (the 0-row lesson)
    tot = rows[0]["psi_total"]
    assert tot >= 0
    assert abs(sum(r["psi_cell"] for r in rows) - tot) < 1e-3
    # self-drift is zero by the formula: p1 == p0 -> (p1-p0)ln(..)=0
    n0 = sum(r["n0"] for r in rows)
    p_self = [((c + 0.5) / (n0 + 128.0)) for c in
              [r["n0"] for r in rows]]
    assert all(
        abs((p - p) * 1.0) == 0.0 for p in p_self
    )  # structural zero


# ------------------------------------------------------------------ round 7
# Numpy/pandas replays of the round-7 statistics battery.


def _events_pd(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value"
    ).toPandas()


def test_welch_numpy_replay(spark, sf_dir):
    """Welch t / Satterthwaite df replayed in numpy over the same
    milli-int protocol; p in (0, 1]; df between min(n)-1 and n1+n2-2."""
    import numpy as np

    from shadems_spark.queries import load_registry

    r = load_registry()["q_welch"][0](spark, sf_dir).collect()[0]
    pd_ev = _events_pd(spark, sf_dir)
    vm = np.round(pd_ev.value.fillna(0.0).to_numpy() * 1000).astype(np.int64)
    g1 = vm[(pd_ev.event_type == "purchase").to_numpy()]
    g2 = vm[(pd_ev.event_type != "purchase").to_numpy()]
    n1, n2 = len(g1), len(g2)
    m1, m2 = g1.sum() / (n1 * 1000.0), g2.sum() / (n2 * 1000.0)
    v1 = (np.square(g1, dtype=np.float64).sum() - g1.sum() * (g1.sum() / n1)) / (n1 - 1) / 1e6
    v2 = (np.square(g2, dtype=np.float64).sum() - g2.sum() * (g2.sum() / n2)) / (n2 - 1) / 1e6
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    df = se2 * se2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert abs(r["t"] - t) < 1e-5
    assert abs(r["df"] - df) < 1e-3
    assert min(n1, n2) - 1 <= r["df"] <= n1 + n2 - 2
    assert 0 < r["p"] <= 1


def test_tost_consistency(spark, sf_dir):
    """TOST shares q_welch's sufficient stats: se matches, the two
    one-sided stats bracket Welch's t by exactly ±0.05/se, and the
    equivalence flag replays from the printed statistics."""
    from shadems_spark.queries import load_registry

    reg = load_registry()
    w = reg["q_welch"][0](spark, sf_dir).collect()[0]
    r = reg["q_tost"][0](spark, sf_dir).collect()[0]
    assert abs(r["mean_diff"] - w["mean_diff"]) < 1e-9
    se = r["se"]
    assert abs((r["t_lower"] - r["t_upper"]) * se - 0.10) < 1e-4
    zc = 1.6448536269514722
    assert r["equivalent"] == int(r["t_lower"] > zc and r["t_upper"] < -zc)
    assert 0 < r["p_lower"] <= 1 and 0 < r["p_upper"] <= 1


def test_levene_numpy_replay(spark, sf_dir):
    """Levene W replayed in float numpy (no nano-rounding): the
    protocol rounding only perturbs at ~1e-9, so agreement to 1e-3
    on W plus exact k and n is the right pin."""
    import numpy as np

    from shadems_spark.queries import load_registry

    r = load_registry()["q_levene"][0](spark, sf_dir).collect()[0]
    pd_ev = _events_pd(spark, sf_dir)
    v = np.round(pd_ev.value.fillna(0.0).to_numpy() * 1000) / 1000.0
    types = pd_ev.event_type.to_numpy()
    groups = [v[types == t] for t in np.unique(types)]
    z = [np.abs(g - g.mean()) for g in groups]
    nt = sum(len(g) for g in groups)
    k = len(groups)
    zbar = sum(zi.sum() for zi in z) / nt
    num = sum(len(zi) * (zi.mean() - zbar) ** 2 for zi in z)
    den = sum(((zi - zi.mean()) ** 2).sum() for zi in z)
    w = ((nt - k) / (k - 1)) * (num / den)
    assert r["k"] == k and r["n"] == nt
    assert abs(r["w"] - w) < 1e-3
    assert r["w"] >= 0


def test_mad_numpy_replay(spark, sf_dir):
    """Lower-median MAD of daily counts replayed exactly per type."""
    import numpy as np

    from shadems_spark.queries import load_registry

    rows = load_registry()["q_mad"][0](spark, sf_dir).collect()
    assert rows
    pd_ev = _events_pd(spark, sf_dir)
    daily = (
        pd_ev.assign(day=pd_ev.ts.dt.date)
        .groupby(["event_type", "day"]).size().rename("y").reset_index()
    )
    for r in rows:
        ys = np.sort(daily[daily.event_type == r["event_type"]].y.to_numpy())
        n = len(ys)
        med = ys[(n + 1) // 2 - 1]
        mad = np.sort(np.abs(ys - med))[(n + 1) // 2 - 1]
        assert r["n_days"] == n
        assert r["med"] == med and r["mad"] == mad


def test_simpson_flags_replay(spark, sf_dir):
    """Per-segment rates replay from a pandas contingency table and
    the reversed flag is exactly `segment sign opposes pooled sign`;
    the pooled row itself is never flagged."""
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_simpson"][0](spark, sf_dir).collect()
    pooled = [r for r in rows if r["segment"] == "__pooled"][0]
    assert pooled["reversed"] == 0
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", "o_totalprice"
    ).toPandas()
    o["urgent"] = o.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    o["big"] = o.o_totalprice > 150000

    def sgn(x):
        return int(x > 0) - int(x < 0)

    def rates(df):
        u, nu = df[df.urgent], df[~df.urgent]
        return u.big.mean(), nu.big.mean()

    pu, po = rates(o)
    for r in rows:
        if r["segment"] == "__pooled":
            continue
        seg = o[o.o_orderstatus == r["segment"]]
        ru, ro = rates(seg)
        assert abs(r["rate_urgent"] - ru) < 1e-5
        assert abs(r["rate_other"] - ro) < 1e-5
        assert r["reversed"] == int(sgn(ru - ro) * sgn(pu - po) == -1)


def test_lorenz_curve_laws(spark, sf_dir):
    """Lorenz laws: 10 deciles with balanced counts (ntile property),
    cum_share strictly increasing, convex (increments nondecreasing
    because deciles ascend in revenue), and the curve ends at 1."""
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_lorenz"][0](spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    counts = [r["n_cust"] for r in rows]
    assert max(counts) - min(counts) <= 1
    shares = [r["cum_share"] for r in rows]
    assert all(b > a for a, b in zip(shares, shares[1:]))
    incs = [b - a for a, b in zip([0.0] + shares, shares)]
    assert all(b >= a - 1e-9 for a, b in zip(incs, incs[1:]))
    assert abs(shares[-1] - 1.0) < 1e-6
    assert sum(r["rev_cents"] for r in rows) > 0


def test_sprt_integer_replay(spark, sf_dir):
    """SPRT: cumulative LLR replays from the integer recurrence; the
    decision matches the first boundary crossing; first_cross=2^30
    iff decision == 'continue'."""
    from shadems_spark.queries.analytics import (
        _SPRT_DN, _SPRT_LA, _SPRT_LB, _SPRT_UP,
    )
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_sprt"][0](spark, sf_dir).collect()
    assert rows
    pd_ev = _events_pd(spark, sf_dir)
    daily = (
        pd_ev.assign(day=pd_ev.ts.dt.date)
        .groupby(["event_type", "day"]).size().rename("y").reset_index()
    )
    nday = daily.groupby("day").y.sum().rename("n").reset_index()
    daily = daily.merge(nday, on="day").sort_values("day")
    for r in rows:
        d = daily[daily.event_type == r["event_type"]]
        cum, up_rn, dn_rn = 0, None, None
        for rn, (_, row) in enumerate(d.iterrows(), start=1):
            cum += int(row.y) * _SPRT_LA + int(row.n - row.y) * _SPRT_LB
            if up_rn is None and cum >= _SPRT_UP:
                up_rn = rn
            if dn_rn is None and cum <= _SPRT_DN:
                dn_rn = rn
        assert r["n_days"] == len(d)
        assert abs(r["llr"] - round(cum / 1e9, 6)) < 1e-9
        first = min(up_rn or 1 << 30, dn_rn or 1 << 30)
        assert r["first_cross"] == first
        want = (
            "h1" if up_rn is not None and (dn_rn is None or up_rn < dn_rn)
            else "h0" if dn_rn is not None else "continue"
        )
        assert r["decision"] == want
        assert (r["first_cross"] == 1 << 30) == (r["decision"] == "continue")


def test_page_hinkley_fold_replay(spark, sf_dir):
    """Page-Hinkley state fold replayed in pure-Python integers; PH
    is a max-prefix-minus-min so it is always >= 0; alarm iff
    ph > lambda = 50."""
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_page_hinkley"][0](spark, sf_dir).collect()
    assert rows
    pd_ev = _events_pd(spark, sf_dir)
    daily = (
        pd_ev.assign(day=pd_ev.ts.dt.date)
        .groupby(["event_type", "day"]).size().rename("y").reset_index()
        .sort_values("day")
    )
    for r in rows:
        ys = daily[daily.event_type == r["event_type"]].y.tolist()
        t = s = cum = mn = ph = 0
        for y in ys:
            t += 1
            s += y
            devn = int(round((y - s / t - 5.0) * 1e9))
            cum += devn
            mn = min(mn, cum)
            ph = max(ph, cum - mn)
        assert r["n_days"] == len(ys)
        assert abs(r["cum_dev"] - round(cum / 1e9, 6)) < 1e-9
        assert abs(r["ph"] - round(ph / 1e9, 6)) < 1e-9
        assert r["ph"] >= 0
        assert r["alarm"] == int(ph > 50_000_000_000)


def test_tukey_numpy_replay(spark, sf_dir):
    """Tukey-Kramer pairwise grid replayed in numpy: C(k,2) rows,
    q stats match to 1e-3, significance flag = q > 3.858, and the
    mean differences are antisymmetric-consistent with the per-type
    means."""
    import itertools

    import numpy as np

    from shadems_spark.queries import load_registry

    rows = load_registry()["q_tukey"][0](spark, sf_dir).collect()
    pd_ev = _events_pd(spark, sf_dir)
    pd_ev = pd_ev[pd_ev.value.notna()]
    v = np.round(pd_ev.value.to_numpy() * 1000) / 1000.0
    types = pd_ev.event_type.to_numpy()
    uniq = sorted(np.unique(types))
    groups = {t: v[types == t] for t in uniq}
    k = len(uniq)
    n = len(v)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups.values())
    msw = ssw / (n - k)
    assert len(rows) == k * (k - 1) // 2
    byp = {(r["type_a"], r["type_b"]): r for r in rows}
    for a, b in itertools.combinations(uniq, 2):
        r = byp[(a, b)]
        ga, gb = groups[a], groups[b]
        diff = ga.mean() - gb.mean()
        se = (msw / 2 * (1 / len(ga) + 1 / len(gb))) ** 0.5
        assert abs(r["mean_diff"] - diff) < 1e-4
        assert abs(r["q_stat"] - abs(diff) / se) < 1e-3
        assert r["significant"] == int(abs(diff) / se > 3.858)


def test_mcnemar_replay_and_degenerate(spark, sf_dir):
    """McNemar replay from a pandas contingency of per-user
    high-value-purchase flags; the continuity-corrected chi2 and the
    b + c = 0 degenerate path both behave."""
    from shadems_spark.queries import load_registry

    r = load_registry()["q_mcnemar"][0](spark, sf_dir).collect()[0]
    pd_ev = _events_pd(spark, sf_dir)
    hv = pd_ev[(pd_ev.event_type == "purchase") & (pd_ev.value > 95)]
    pre = hv[hv.ts.dt.date.astype(str) < "2024-01-16"].user_id.unique()
    post = hv[hv.ts.dt.date.astype(str) >= "2024-01-16"].user_id.unique()
    allu = pd_ev.user_id.unique()
    b = sum(1 for u in allu if u in set(pre) and u not in set(post))
    c = sum(1 for u in allu if u not in set(pre) and u in set(post))
    assert (r["b"], r["c"]) == (b, c)
    assert r["n"] == len(allu)
    if b + c > 0:
        assert abs(r["chi2"] - max(abs(b - c) - 1, 0) ** 2 / (b + c)) < 1e-6
        assert 0 < r["p"] <= 1
    else:
        assert r["chi2"] == 0.0 and r["p"] == 1.0


def test_herfindahl_laws_and_replay(spark, sf_dir):
    """HHI laws per nation: hhi in [1/n, 1], hhi >= top_share^2,
    hhi_floor = 1/n_cust exactly, and a pandas replay of the squared
    shares matches to 1e-5."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_herfindahl"][0](spark, sf_dir).collect()
    assert rows
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    o["rc"] = (o.o_totalprice * 100).round().astype("int64")
    m = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    for r in rows:
        seg = m[m.c_nationkey == r["nation"]]
        rev = seg.groupby("o_custkey").rc.sum()
        shares = rev / rev.sum()
        assert r["n_cust"] == len(rev)
        assert abs(r["hhi"] - (shares ** 2).sum()) < 1e-5
        assert abs(r["top_share"] - shares.max()) < 1e-6
        assert abs(r["hhi_floor"] - 1 / len(rev)) < 1e-6
        # nano-rounding of each squared share can undershoot by up to
        # 5e-10 per customer — scale the floor slack with n_cust
        assert r["hhi_floor"] - 5e-10 * r["n_cust"] - 1e-9 <= r["hhi"] <= 1.0
        assert r["hhi"] >= r["top_share"] ** 2 - 1e-9


def test_kruskal_scipy_free_replay(spark, sf_dir):
    """Kruskal-Wallis replayed with a pure-numpy average-rank
    construction (no scipy): H and the tie correction match to 1e-4;
    the doubled rank-sum identity sum(R2_g) == N*(N+1) holds
    exactly (total of all ranks)."""
    import numpy as np

    from shadems_spark.queries import load_registry

    r = load_registry()["q_kruskal"][0](spark, sf_dir).collect()[0]
    pd_ev = _events_pd(spark, sf_dir)
    pd_ev = pd_ev[pd_ev.value.notna()]
    vm = np.round(pd_ev.value.to_numpy() * 1000).astype(np.int64)
    types = pd_ev.event_type.to_numpy()
    order = np.argsort(vm, kind="mergesort")
    ranks = np.empty(len(vm), dtype=np.float64)
    sv = vm[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average rank of the tie run
        i = j
    n = len(vm)
    uniq = np.unique(types)
    rr = sum(ranks[types == t].sum() ** 2 / (types == t).sum() for t in uniq)
    h = 12.0 / (n * (n + 1)) * rr - 3 * (n + 1)
    _, counts = np.unique(vm, return_counts=True)
    cor = 1.0 - (counts.astype(np.float64) ** 3 - counts).sum() / (
        float(n) ** 3 - n
    )
    assert r["k"] == len(uniq) and r["n"] == n
    assert abs(r["h"] - h) < 1e-4
    assert abs(r["tie_c"] - cor) < 1e-6
    assert abs(r["h_corrected"] - h / cor) < 1e-4


def test_shewhart_numpy_replay(spark, sf_dir):
    """Shewhart limits, violation count, and the max-|z| excursion
    replayed in numpy per type; limits bracket the center; max_z_day
    is the earliest day achieving the maximum."""
    import numpy as np

    from shadems_spark.queries import load_registry

    rows = load_registry()["q_shewhart"][0](spark, sf_dir).collect()
    assert rows
    pd_ev = _events_pd(spark, sf_dir)
    daily = (
        pd_ev.assign(day=pd_ev.ts.dt.date.astype(str))
        .groupby(["event_type", "day"]).size().rename("y").reset_index()
    )
    for r in rows:
        d = daily[daily.event_type == r["event_type"]]
        y = d.y.to_numpy(np.float64)
        mu, sd = y.mean(), y.std(ddof=1)
        assert r["n_days"] == len(y)
        assert abs(r["center"] - mu) < 1e-5
        assert abs(r["ucl"] - (mu + 3 * sd)) < 1e-5
        assert abs(r["lcl"] - (mu - 3 * sd)) < 1e-5
        assert r["lcl"] < r["center"] < r["ucl"]
        viol = (y > mu + 3 * sd) | (y < mu - 3 * sd)
        assert r["n_violations"] == int(viol.sum())
        z = np.abs(y - mu) / sd
        assert abs(r["max_z"] - z.max()) < 1e-5
        zmax_days = d.day.to_numpy()[np.round(z * 1e9) == np.round(z * 1e9).max()]
        assert r["max_z_day"] == sorted(zmax_days)[0]
