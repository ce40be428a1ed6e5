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
    _POIS_T,
    _ams_coeffs,
)



@register("q_approx_distinct", sql=None)  # HLL sketch: engine-specific
def q_approx_distinct(spark, sf_dir):
    """G11 approximate variant: HLL sketch distinct counts (rows-only:
    sketch estimates are engine-specific by nature)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
    )


@register(
    "q_weighted_sample",
    sql="""
    WITH w AS (SELECT doc_id, lang, n_chars,
                      least(1.0, sqrt(n_chars) / 40.0) AS keep_rate,
                      ((doc_id * 2654435761) % 4294967296) / 4294967296.0 AS u
               FROM documents)
    SELECT lang, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS key_sum
    FROM w WHERE u < keep_rate GROUP BY lang
    """,
)
def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted Bernoulli sampling: per-row keep rate
    from a weight column (here sqrt(n_chars), the length-balanced
    sampling a curation pipeline uses), decided by a multiplicative
    key hash — identical on every run/engine/retry, unlike rand();
    map-side only, no shuffle before the audit agg."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.least(F.lit(1.0), F.sqrt(F.col("n_chars")) / F.lit(40.0))
    # decimal-exact Knuth hash (operators/hashing.py): the long form
    # overflowed on the r10 x100 probe's ~9.9e9 shifted doc_ids —
    # values identical in-range, 64-bit-id safe at corpus scale
    u = knuth32("doc_id") / F.lit(float(1 << 32))
    return (
        docs.filter(u < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("key_sum"),
        )
    )


@register("q_latency_tdigest", sql=None)  # sketch percentiles: engine-specific
def q_latency_tdigest(spark, sf_dir):
    """q_latency_bands' documented 100-TB path (VERDICT r03 #8): the
    exact per-day percentile sorts every group's values; this variant
    swaps in percentile_approx — Spark's bounded-memory quantile
    sketch (GK/t-digest-style, mergeable across partitions), accuracy
    set to 1/10000 relative rank.  Same plan shape, fixed-size
    aggregate state per (day) key regardless of group row count.
    Rows-only by nature (sketch estimates are engine-specific);
    accuracy vs the exact form is pinned in tests/test_core.py."""
    ev = load_table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    return ev.groupBy(F.date_format("d", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile_approx("value", F.lit(0.5), F.lit(10000)), 4).alias("p50"),
        F.round(F.percentile_approx("value", F.lit(0.95), F.lit(10000)), 4).alias("p95"),
        F.round(F.percentile_approx("value", F.lit(0.99), F.lit(10000)), 4).alias("p99"),
    )


@register(
    "q_theta_sets",
    sql="""
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    a AS (SELECT DISTINCT user_id FROM events)
    SELECT (SELECT count(*) FROM c) AS n_click,
           (SELECT count(*) FROM p) AS n_purchase,
           (SELECT count(*) FROM (SELECT * FROM c UNION SELECT * FROM p))
             AS n_union,
           (SELECT count(*) FROM (SELECT * FROM c INTERSECT SELECT * FROM p))
             AS n_intersect,
           (SELECT count(*) FROM (SELECT * FROM c EXCEPT SELECT * FROM p))
             AS n_click_only,
           (SELECT count(*) FROM a) AS n_all
    """,
)
def q_theta_sets(spark, sf_dir):
    """Theta-sketch set algebra (DataSketches, Spark 4 builtins):
    per-event-type user sketches, then union / intersection /
    difference estimates WITHOUT re-touching the raw data — the
    mergeable-sketch workflow that replaces exact distinct at 100 TB
    (persist the per-partition sketches, answer any set-algebra
    question later from kilobytes).  At the harness scales the
    distinct user count (<=1500) is far below the sketch's k=4096
    exact-mode bound, so every estimate is EXACT and the query runs
    under the same exact-count oracle as any other — the estimate
    semantics, not the error bound, are what is being verified.
    [R] SURVEY §2 G11 extension."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("t")
    )
    c = sk.filter(F.col("event_type") == "click").select(F.col("t").alias("tc"))
    p = sk.filter(F.col("event_type") == "purchase").select(
        F.col("t").alias("tp")
    )
    allu = sk.agg(F.expr("theta_union_agg(t)").alias("ta"))
    return (
        c.crossJoin(p)
        .crossJoin(allu)
        .select(
            F.theta_sketch_estimate("tc").alias("n_click"),
            F.theta_sketch_estimate("tp").alias("n_purchase"),
            F.theta_sketch_estimate(F.expr("theta_union(tc, tp)")).alias(
                "n_union"
            ),
            F.theta_sketch_estimate(
                F.expr("theta_intersection(tc, tp)")
            ).alias("n_intersect"),
            F.theta_sketch_estimate(F.expr("theta_difference(tc, tp)")).alias(
                "n_click_only"
            ),
            F.theta_sketch_estimate("ta").alias("n_all"),
        )
    )


@register("q_kll_quantiles", sql=None)  # sketch estimates: no exact SQL form
def q_kll_quantiles(spark, sf_dir):
    """KLL quantile sketches (DataSketches, Spark 4 builtins): one
    sketch per (event_type, day), then kll_merge_agg_double rolls the
    daily sketches up per event_type — the re-mergeable fixed-size
    quantile state that lets a 100-TB pipeline persist per-partition
    sketches once and serve any later percentile question (or any
    regrouping: day->week->all) from the stored bytes, never
    re-scanning values.  Rank accuracy vs the exact per-type
    percentiles is pinned in tests (the KLL guarantee is on rank,
    ~1.7% at the default k=200)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("event_type", "day")
        .agg(F.kll_sketch_agg_double("value").alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(F.expr("kll_merge_agg_double(sk)").alias("m"))
        .select(
            "event_type",
            F.round(
                F.kll_sketch_get_quantile_double(F.col("m"), F.lit(0.5)), 4
            ).alias("p50"),
            F.round(
                F.kll_sketch_get_quantile_double(F.col("m"), F.lit(0.95)), 4
            ).alias("p95"),
            F.round(
                F.kll_sketch_get_quantile_double(F.col("m"), F.lit(0.99)), 4
            ).alias("p99"),
            F.kll_sketch_get_n_double("m").alias("n"),
        )
        .orderBy("event_type")
    )
_POIS_CASE_SQL = (
    "CASE "
    + " ".join(f"WHEN h < {t} THEN {k}" for k, t in enumerate(_POIS_T))
    + " ELSE 6 END"
)


@register(
    "q_bootstrap_ci",
    sql=f"""
    WITH reps AS (SELECT unnest(range(32)) AS r),
    x AS (SELECT d.n_chars, reps.r,
                 (d.doc_id * 1103515245 + reps.r * 12345 + 6789) % 1000003 AS h
          FROM documents d CROSS JOIN reps),
    w AS (SELECT r, n_chars, {_POIS_CASE_SQL} AS wt FROM x)
    SELECT r, CAST(sum(wt) AS BIGINT) AS n_eff,
           round(sum(wt * n_chars) / CAST(sum(wt) AS DOUBLE), 4) AS mean_chars
    FROM w GROUP BY r ORDER BY r
    """,
)
def q_bootstrap_ci(spark, sf_dir):
    """Poisson bootstrap of mean document length, 32 replicates in ONE
    scan (the large-scale resampling shape: per (row, replicate) a
    deterministic Poisson(1) weight approximates multinomial
    resampling, so the bootstrap needs no shuffling of the data into
    R resamples — Chamandy et al., 'Estimating uncertainty for
    massive data streams', Google 2012).  The replicate axis is an
    exploded literal sequence (no join); weights come from an integer
    LCG hash of (doc_id, r) bucketed by the Poisson(1) CDF in EXACT
    integer thresholds (_POIS_T), so every engine and layout draws the
    identical resamples — a Monte-Carlo method with a hash-exact
    oracle.  The 32 replicate means ARE the sampling distribution;
    percentile CI = quantiles of this 32-row result (pinned in
    tests).

    Scale shape: rows expand x32 BEFORE a map-side-combined aggregate,
    so the shuffle is 32 rows per partition regardless of corpus size;
    nothing else moves.  At 100 TB this is the only practical
    bootstrap — resample-and-recompute would be 32 full jobs."""
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        "doc_id", "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("r"),
    ).withColumn(
        "h",
        (F.col("doc_id") * F.lit(1103515245) + F.col("r") * F.lit(12345)
         + F.lit(6789)) % F.lit(1000003),
    )
    wt = F.lit(6)
    for k, t in reversed(list(enumerate(_POIS_T))):
        wt = F.when(F.col("h") < t, F.lit(k)).otherwise(wt)
    return (
        x.withColumn("wt", wt)
        .groupBy("r")
        .agg(
            F.sum("wt").alias("n_eff"),
            F.round(
                F.sum(F.col("wt") * F.col("n_chars"))
                / F.sum("wt").cast("double"),
                4,
            ).alias("mean_chars"),
        )
        .orderBy("r")
    )


_CMS_W, _CMS_D, _CMS_Q = 512, 3, 20


def _cms_hash_sql(col: str) -> str:
    """DuckDB replay of operators/text.py::poly_hash over ``col``."""
    return f"""list_reduce(
        list_prepend(CAST(0 AS BIGINT),
                     list_transform(string_split({col}, ''),
                                    c -> CAST(ascii(c) AS BIGINT))),
        (a, c) -> (a * 31 + c) % 1000000007)"""


def _cms_buckets_sql() -> str:
    """The d probe buckets off an ``h`` column — the identical affine
    family operators/profile.py::bloom_bits_from_hash derives."""
    return ", ".join(
        f"(h * {2 * j + 1} + {97 * j}) % 1000000007 % {_CMS_W}"
        for j in range(_CMS_D)
    )


@register(
    "q_countmin",
    sql=f"""
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
    oh AS (SELECT t, {_cms_hash_sql('t')} AS h FROM w),
    cells AS (SELECT j, bucket, count(*) AS c
              FROM (SELECT unnest([{', '.join(str(j) for j in range(_CMS_D))}]) AS j,
                           unnest([{_cms_buckets_sql()}]) AS bucket
                    FROM oh)
              GROUP BY 1, 2),
    truth AS (SELECT t, count(*) AS n FROM w GROUP BY 1),
    topq AS (SELECT t, n FROM truth ORDER BY n DESC, t LIMIT {_CMS_Q}),
    qh AS (SELECT t, n, {_cms_hash_sql('t')} AS h FROM topq),
    probes AS (SELECT t, n,
                      unnest([{', '.join(str(j) for j in range(_CMS_D))}]) AS j,
                      unnest([{_cms_buckets_sql()}]) AS bucket
               FROM qh),
    est AS (SELECT t, n, min(c) AS est
            FROM probes JOIN cells USING (j, bucket) GROUP BY 1, 2)
    SELECT t AS token, CAST(n AS BIGINT) AS n, CAST(est AS BIGINT) AS est,
           CAST(est - n AS BIGINT) AS overcount
    FROM est ORDER BY n DESC, token
    """,
)
def q_countmin(spark, sf_dir):
    """Count-Min sketch frequency estimation (Cormode & Muthukrishnan
    2005) over corpus word occurrences — the last member of the
    mergeable-sketch family (HLL / theta / KLL / t-digest / bloom all
    registered): d=3 rows x w=512 buckets, point query =
    MIN over the d counters a token hashes to.  Because the hash
    family is the deterministic bloom affine family over the
    cross-engine poly hash, the sketch — collisions, overcounts and
    all — is bit-identical on any engine, so a probabilistic
    structure gets a hash-exact SQL oracle (q_bloom_decontaminate's
    trick, applied to counting).

    Scale shape: the sketch build is ONE map-side-combined aggregate
    whose key space is d*w = fixed 1,536 cells — per-partition
    combiners emit at most that many rows regardless of corpus size,
    the defining property that lets CMS count 100 TB of tokens
    through a KB-sized shuffle; the probe side broadcast-joins the
    cell table.  The exact ``truth``/top-q aggregate here is the
    in-query AUDIT (and deterministic query-token pick) — production
    probes the sketch only, never building the vocabulary aggregate
    (q_heavy_hitters documents the same contrast).  The CMS
    guarantee est >= n (never undercounts) and the eps*N overcount
    bound are pinned in tests/test_analytics.py."""
    from shadems_spark.operators.profile import bloom_bits_from_hash
    from shadems_spark.operators.text import poly_hash, words

    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(F.explode(words("text")).alias("t"))
    # two-step: char-fold each occurrence ONCE, derive the d buckets
    # from the hash COLUMN (the q_bloom_decontaminate duplication
    # note).  Measured r11: the Arrow poly_hash_fast twin is SLOWER
    # here (1.15 -> 1.25 s interleaved) — tokens are short, so the
    # Python boundary transfer of the exploded string column costs
    # more than the per-char fold it saves; the JVM fold stays.
    oh = occ.select(poly_hash("t").alias("h"))
    cells = (
        oh.select(
            F.posexplode(
                bloom_bits_from_hash(F.col("h"), _CMS_W, _CMS_D)
            ).alias("j", "bucket")
        )
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    truth = occ.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    # top-q probe terms: orderBy+limit plans TakeOrderedAndProject —
    # the rank was only ever a selection device, so no window (and no
    # rank column) is needed at all (VERDICT r7 #5)
    topq = truth.orderBy(F.col("n").desc(), "t").limit(_CMS_Q)
    probes = topq.select(
        "t", "n",
        F.posexplode(
            bloom_bits_from_hash(poly_hash("t"), _CMS_W, _CMS_D)
        ).alias("j", "bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("t", "n")
        .agg(F.min("c").alias("est"))
        .select(
            F.col("t").alias("token"), "n", "est",
            (F.col("est") - F.col("n")).alias("overcount"),
        )
        .orderBy(F.col("n").desc(), "token")
    )


def _ams_sql() -> str:
    from shadems_spark.operators.text import FP_MOD

    p = FP_MOD
    sign_terms = []
    for r, (a, b, c, d) in enumerate(_ams_coeffs()):
        h = f"CAST({a} AS BIGINT)"
        for coef in (b, c, d):
            h = f"(({h}) * u + {coef}) % {p}"
        sign_terms.append(
            f"sum((1 - 2 * (({h}) % 2)) * cnt) AS y{r}"
        )
    ys = ",\n                 ".join(sign_terms)
    est_list = ", ".join(
        f"(y{4 * g} * y{4 * g} + y{4 * g + 1} * y{4 * g + 1}"
        f" + y{4 * g + 2} * y{4 * g + 2} + y{4 * g + 3} * y{4 * g + 3})"
        for g in range(4)
    )
    return f"""
    WITH g AS (SELECT user_id % {p} AS u, count(*) AS cnt
               FROM events GROUP BY 1),
    s AS (SELECT count(*) AS n_users,
                 sum(cnt * cnt) AS f2,
                 {ys}
          FROM g),
    m AS (SELECT *, list_sort([{est_list}]) AS sums FROM s)
    SELECT CAST(n_users AS BIGINT) AS n_users,
           CAST(f2 AS BIGINT) AS exact_f2,
           round((sums[2] + sums[3]) / 8.0, 1) AS ams_f2,
           round(abs((sums[2] + sums[3]) / 8.0 - f2) / f2, 6) AS rel_err
    FROM m
    """


@register("q_ams_f2", sql=_ams_sql())
def q_ams_f2(spark, sf_dir):
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy '96)
    of the per-user event counts, beside the exact F2 = sum(cnt^2) it
    estimates: 16 independent {-1,+1} sign hashes (4-wise via a cubic
    over GF(1e9+7)) fold the whole stream into 16 integers Y_r;
    median-of-4-means of Y_r^2 is the estimate.  F2 drives join-size
    and self-join-cardinality planning at scale, where the sketch is
    one map-side-combined pass of 16 counters while the exact form
    needs the full per-key aggregate.

    Exactness: both engines fold the SAME SplitMix64-derived literals
    through the same Horner chain (products < p * p fit int64), Y_r
    and the exact F2 are integer sums, and the median-of-means is an
    integer half-sum — the whole output is determined before the two
    final divisions.  Scale: the sketch path is a constant-width
    aggregate (16 ints); the per-user pre-aggregate here only serves
    the exact-F2 comparison column."""
    from shadems_spark.operators.text import FP_MOD

    p = FP_MOD
    g = (
        load_table(spark, sf_dir, "events")
        .select((F.col("user_id") % p).alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    aggs = [
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("f2"),
    ]
    for r, (a, b, c, d) in enumerate(_ams_coeffs()):
        h = F.lit(a)
        for coef in (b, c, d):
            h = (h * F.col("u") + F.lit(coef)) % F.lit(p)
        aggs.append(F.sum((1 - 2 * (h % 2)) * F.col("cnt")).alias(f"y{r}"))
    s = g.agg(*aggs)
    est = [
        sum(F.col(f"y{4 * gi + j}") * F.col(f"y{4 * gi + j}") for j in range(4))
        for gi in range(4)
    ]
    m = s.withColumn("sums", F.sort_array(F.array(*est)))
    med2 = F.element_at("sums", 2) + F.element_at("sums", 3)
    return m.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("f2").cast("long").alias("exact_f2"),
        F.round(med2 / 8.0, 1).alias("ams_f2"),
        F.round(F.abs(med2 / 8.0 - F.col("f2")) / F.col("f2"), 6).alias(
            "rel_err"
        ),
    )


def _ams_join_sql() -> str:
    from shadems_spark.operators.text import FP_MOD

    p = FP_MOD
    ya, yb = [], []
    for r, (a, b, c, d) in enumerate(_ams_coeffs()):
        h = f"CAST({a} AS BIGINT)"
        for coef in (b, c, d):
            h = f"(({h}) * u + {coef}) % {p}"
        sgn = f"(1 - 2 * (({h}) % 2))"
        ya.append(f"sum({sgn} * ca) AS a{r}")
        yb.append(f"sum({sgn} * cb) AS b{r}")
    cols = ",\n                 ".join(ya + yb)
    est_list = ", ".join(
        f"(a{4 * g} * b{4 * g} + a{4 * g + 1} * b{4 * g + 1}"
        f" + a{4 * g + 2} * b{4 * g + 2} + a{4 * g + 3} * b{4 * g + 3})"
        for g in range(4)
    )
    return f"""
    WITH g AS (SELECT user_id % {p} AS u,
                      sum(CASE WHEN event_type = 'view'
                          THEN 1 ELSE 0 END) AS ca,
                      sum(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS cb
               FROM events GROUP BY 1),
    s AS (SELECT sum(ca * cb) AS exact_sz,
                 sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END)
                     AS n_shared,
                 {cols}
          FROM g),
    m AS (SELECT *, list_sort([{est_list}]) AS sums FROM s)
    SELECT CAST(n_shared AS BIGINT) AS n_shared_users,
           CAST(exact_sz AS BIGINT) AS exact_join_size,
           round((sums[2] + sums[3]) / 8.0, 1) AS ams_join_size,
           round(abs((sums[2] + sums[3]) / 8.0 - exact_sz)
                 / exact_sz, 6) AS rel_err
    FROM m
    """


@register("q_ams_join", sql=_ams_join_sql())
def q_ams_join(spark, sf_dir):
    """AMS join-size estimation (the inner-product generalization of
    q_ams_f2, Alon-Gibbons-Matias-Szegedy '99): |view ⋈ purchase on
    user_id| = sum_u cA(u)*cB(u), estimated by the product of the two
    streams' sign-sketch counters — the cardinality estimator a
    cost-based optimizer consults BEFORE committing to a join
    strategy, one constant-width pass per stream instead of building
    the join.  The exact join size rides beside it for the audit.

    Exactness: both sketches fold the SAME SplitMix64 cubic sign
    hashes as q_ams_f2 (4-wise, engine-identical literals), all
    estimator arithmetic is integer until the final two divisions,
    and median-of-4-means is an integer half-sum.  Scale: the sketch
    is 32 integer counters from ONE map-side-combined pass; the
    per-user pre-aggregate serves only the exact twin."""
    from shadems_spark.operators.text import FP_MOD

    p = FP_MOD
    g = (
        load_table(spark, sf_dir, "events")
        .select(
            (F.col("user_id") % p).alias("u"),
            (F.col("event_type") == "view").cast("long").alias("va"),
            (F.col("event_type") == "purchase").cast("long").alias("vb"),
        )
        .groupBy("u")
        .agg(F.sum("va").alias("ca"), F.sum("vb").alias("cb"))
    )
    aggs = [
        F.sum(F.col("ca") * F.col("cb")).alias("exact_sz"),
        F.sum(((F.col("ca") > 0) & (F.col("cb") > 0)).cast("int")).alias(
            "n_shared"
        ),
    ]
    for r, (a, b, c, d) in enumerate(_ams_coeffs()):
        h = F.lit(a)
        for coef in (b, c, d):
            h = (h * F.col("u") + F.lit(coef)) % F.lit(p)
        sgn = 1 - 2 * (h % 2)
        aggs.append(F.sum(sgn * F.col("ca")).alias(f"a{r}"))
        aggs.append(F.sum(sgn * F.col("cb")).alias(f"b{r}"))
    s = g.agg(*aggs)
    est = [
        sum(
            F.col(f"a{4 * gi + j}") * F.col(f"b{4 * gi + j}")
            for j in range(4)
        )
        for gi in range(4)
    ]
    m = s.withColumn("sums", F.sort_array(F.array(*est)))
    med2 = F.element_at("sums", 2) + F.element_at("sums", 3)
    return m.select(
        F.col("n_shared").cast("long").alias("n_shared_users"),
        F.col("exact_sz").cast("long").alias("exact_join_size"),
        F.round(med2 / 8.0, 1).alias("ams_join_size"),
        F.round(
            F.abs(med2 / 8.0 - F.col("exact_sz")) / F.col("exact_sz"), 6
        ).alias("rel_err"),
    )


@register(
    "q_heavy_change",
    sql="""
    WITH w AS (SELECT doc_id % 2 AS half,
                      unnest(list_filter(string_split(text, ' '),
                                         x -> len(x) > 0)) AS tok
               FROM documents),
    c AS (SELECT tok,
                 sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c0,
                 sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c1
          FROM w GROUP BY 1),
    t AS (SELECT sum(c0) AS t0, sum(c1) AS t1 FROM c),
    r AS (SELECT c.tok, c.c0, c.c1, t.t0, t.t1,
                 abs(c.c1 * t.t0 - c.c0 * t.t1) AS change_num
          FROM c CROSS JOIN t
          WHERE c.c0 + c.c1 >= 20)
    SELECT tok, CAST(c0 AS BIGINT) AS c0, CAST(c1 AS BIGINT) AS c1,
           round(c0 / CAST(t0 AS DOUBLE) * 1e6, 4) AS rate0_ppm,
           round(c1 / CAST(t1 AS DOUBLE) * 1e6, 4) AS rate1_ppm,
           round(CAST(change_num AS DOUBLE)
                 / (CAST(t0 AS DOUBLE) * t1) * 1e6, 4) AS abs_change_ppm
    FROM r
    ORDER BY change_num * 1000000 / (CAST(t0 AS HUGEINT) * t1) DESC,
             tok
    LIMIT 25
    """,
)
def q_heavy_change(spark, sf_dir):
    """Heavy-CHANGE detection (the drift-mining twin of
    q_heavy_hitters, Cormode-Muthukrishnan's delta problem): the 25
    tokens whose relative frequency moved most between the two corpus
    halves (doc_id parity standing in for time slices) — heavy
    hitters tell you what dominates, heavy changers tell you what is
    HAPPENING; with a min-support floor so rare-token noise can't
    crowd the board.

    Exactness: the change score compares exact integer cross products
    |c1*t0 - c0*t1| (no per-token division before ranking — the
    q_tcloseness trick), and the top-25 orders by an integer-scaled
    key with token tie-break.  Scale: one (half, token) map-side
    aggregate, vocabulary-sized everything, TakeOrderedAndProject
    tail; the streaming face keeps two CM sketches and diffs them."""
    from shadems_spark.operators.text import words

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.filter(words("text"), lambda x: F.length(x) > 0))
        .alias("tok"),
    )
    c = (
        w.groupBy("tok")
        .agg(
            F.sum((F.col("half") == 0).cast("int")).alias("c0"),
            F.sum((F.col("half") == 1).cast("int")).alias("c1"),
        )
    )
    t = c.agg(F.sum("c0").alias("t0"), F.sum("c1").alias("t1"))
    cc = F.col
    r = (
        c.filter(cc("c0") + cc("c1") >= 20)
        .crossJoin(F.broadcast(t))
        .withColumn(
            "change_num",
            F.abs(
                cc("c1").cast("decimal(38,0)") * cc("t0")
                - cc("c0").cast("decimal(38,0)") * cc("t1")
            ),
        )
    )
    return (
        r.select(
            "tok",
            cc("c0").cast("long").alias("c0"),
            cc("c1").cast("long").alias("c1"),
            F.round(cc("c0") / cc("t0").cast("double") * 1e6, 4).alias(
                "rate0_ppm"
            ),
            F.round(cc("c1") / cc("t1").cast("double") * 1e6, 4).alias(
                "rate1_ppm"
            ),
            F.round(
                cc("change_num").cast("double")
                / (cc("t0").cast("double") * cc("t1")) * 1e6,
                4,
            ).alias("abs_change_ppm"),
            (
                cc("change_num") * 1000000
                / (cc("t0").cast("decimal(38,0)") * cc("t1"))
            ).cast("long").alias("__rk"),
        )
        .orderBy(F.desc("__rk"), "tok")
        .limit(25)
        .drop("__rk")
    )
