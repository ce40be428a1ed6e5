"""Join queries (SURVEY.md §2 D: J1-J6).

J1-J3 are the reference's dim-enrichment shapes (DDID->SPW/POL,
antenna names, chan freqs); J5/J6 are the rebuild's fact×fact,
range and as-of joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.operators import joins as J
from shadems_spark.operators import mappers as M
from shadems_spark.queries import register


@register(
    "q_join_dim",
    sql="""
    SELECT r_name, round(sum(l_extendedprice), 2) AS revenue, count(*) AS n
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_join_dim(spark, sf_dir):
    """J1: chained broadcast dim lookups — nation->region plays the
    reference's DATA_DESCRIPTION -> SPECTRAL_WINDOW/POLARIZATION
    two-hop resolve ([R] ms_info.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    df = J.dim_enrich(li, sup, li.l_suppkey == sup.s_suppkey)
    df = J.dim_enrich(df, nat, df.s_nationkey == nat.n_nationkey)
    df = J.dim_enrich(df, reg, df.n_regionkey == reg.r_regionkey)
    return df.groupBy("r_name").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_join_names",
    sql="""
    SELECT l_orderkey AS row_key, l_linenumber AS line_no,
           s_name AS a1_name, p_name AS a2_name
    FROM lineitem
    LEFT JOIN supplier ON l_suppkey = s_suppkey
    LEFT JOIN part     ON l_partkey = p_partkey
    WHERE l_orderkey % 20 = 0
    """,
)
def q_join_names(spark, sf_dir):
    """J2: antenna-index -> name resolution for labels/legends
    ([R] ms_info.py::NamedList), as two aliased broadcast left joins."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    sup = load_table(spark, sf_dir, "supplier")
    prt = load_table(spark, sf_dir, "part")
    df = J.dim_enrich(li, sup, li.l_suppkey == sup.s_suppkey, "left")
    df = J.dim_enrich(df, prt, df.l_partkey == prt.p_partkey, "left")
    return df.select(
        F.col("l_orderkey").alias("row_key"),
        F.col("l_linenumber").alias("line_no"),
        F.col("s_name").alias("a1_name"),
        F.col("p_name").alias("a2_name"),
    )


@register(
    "q_join_chanfreq",
    sql=f"""
    SELECT e.vec_id, e.pos, c.freq, e.val
    FROM (SELECT vec_id, i AS pos, embedding[i + 1] AS val
          FROM embeddings, generate_series(0, 7) t(i)
          WHERE vec_id % 10 = 0) e
    JOIN {M.chan_freqs_sql(8)} c ON e.pos = c.chan
    """,
)
def q_join_chanfreq(spark, sf_dir):
    """J3: channel-index -> CHAN_FREQ attach (the P7/P9 outer product
    realized as a broadcast join on chan position)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    exploded = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).filter(F.col("pos") < 8).select(
        "vec_id", F.col("pos").cast("long").alias("pos"), "val"
    )
    chans = M.chan_freqs(spark, n_chan=8)
    return J.dim_enrich(exploded, chans, exploded.pos == chans.chan).select(
        "vec_id", "pos", "freq", "val"
    )


@register(
    "q_join_fact",
    sql="""
    SELECT o_orderstatus,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def q_join_fact(spark, sf_dir):
    """J5: fact×fact equi-join (orders×lineitem).  Sort-merge or
    broadcast by size — AQE decides at runtime; both sides shuffle on
    the join key only when neither fits in memory."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q_range_join",
    sql="""
    SELECT o_orderstatus, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND CAST(l_shipdate AS DATE) BETWEEN CAST(o_orderdate AS DATE)
                                      AND CAST(o_orderdate AS DATE) + 60
    GROUP BY o_orderstatus
    """,
)
def q_range_join(spark, sf_dir):
    """J6: equi + interval-containment join (ship within 60 days of
    order).  The equi key keeps it hash-join + residual filter."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    ship = li.l_shipdate.cast("date")
    odate = o.o_orderdate.cast("date")
    joined = J.range_join(
        li, o, li.l_orderkey == o.o_orderkey, odate, F.date_add(odate, 60), ship
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "q_asof_join",
    sql="""
    SELECT p.event_id, p.user_id,
           (SELECT max(epoch_us(c.ts)) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts <= p.ts) AS asof_click_us
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def q_asof_join(spark, sf_dir):
    """J6 (as-of): latest prior click per purchase, via the scalable
    union+window pattern (operators/joins.asof_join) — one shuffle on
    user_id, no correlated subquery, no quadratic join."""
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("ts_ns div 1000")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", us.alias("ts_us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("ts_us"), us.alias("click_us")
    )
    out = J.asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="ts_us",
        right_ts="ts_us",
        right_vals=["click_us"],
    )
    return out.select(
        "event_id", "user_id", F.col("asof_click_us").alias("asof_click_us")
    )


@register(
    "q_asof_cogroup",
    sql="""
    SELECT p.event_id, p.user_id,
           (SELECT max(epoch_us(c.ts)) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts <= p.ts) AS asof_click_us
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def q_asof_cogroup(spark, sf_dir):
    """J6 via the cogrouped-pandas path: groupBy(user_id).cogroup +
    applyInPandas(merge_asof) — the sanctioned Arrow escape hatch for
    ordered per-key merges, result-identical to the JVM union+window
    form (same oracle as q_asof_join).  Scale shape: ONE co-shuffle of
    both sides on user_id, then per-key pandas merges sized by a
    single user's history; Arrow batches, never row-at-a-time."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    us = F.expr("ts_ns div 1000")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", us.alias("ts_us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("click_us")
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values("ts_us")
        # the key rides the left frame; keep only the value column on
        # the right (a shared user_id column would suffix-collide).
        right = (
            right[["click_us"]]
            .rename(columns={"click_us": "asof_click_us"})
            .sort_values("asof_click_us")
        )
        out = pd.merge_asof(
            left,
            right,
            left_on="ts_us",
            right_on="asof_click_us",
            direction="backward",
        )
        return out[["event_id", "user_id", "asof_click_us"]]

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            merge, "event_id long, user_id long, asof_click_us long"
        )
    )
