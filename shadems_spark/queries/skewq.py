"""Skew-mitigation queries (extension; SURVEY.md §4 skew row).

The salting rewrites are algebraic no-ops on results, so their oracle
is simply the UNSALTED SQL — the driver's hash compare proves the
rewrite exact while the Spark side runs the salted physical shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.operators.skew import salted_join, skew_split_join, two_phase_agg
from shadems_spark.queries import register


@register(
    "q_salted_join",
    sql="""
    SELECT o_orderpriority, count(*) AS n,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_salted_join(spark, sf_dir):
    """Salted fact×dim equi-join — result-identical to the plain join
    (the oracle IS the unsalted query)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(
        li, orders, "l_orderkey", n_salt=8,
        salt_by=["l_orderkey", "l_linenumber"],  # retry-deterministic
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )


@register(
    "q_two_phase_agg",
    sql="""
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_extendedprice), 2) AS revenue,
           count(DISTINCT l_suppkey) AS n_supp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_two_phase_agg(spark, sf_dir):
    """Two-phase salted aggregation including a distinct-heavy state —
    merges to exactly the single-phase result."""
    li = load_table(spark, sf_dir, "lineitem")
    return two_phase_agg(
        li,
        ["l_returnflag"],
        partials={
            "n": F.count(F.lit(1)),
            "rev": F.sum("l_extendedprice"),
            "supps": F.collect_set("l_suppkey"),
        },
        finals={
            "n": F.sum("n").cast("long"),
            "revenue": F.round(F.sum("rev"), 2),
            "n_supp": F.size(F.array_distinct(F.flatten(F.collect_list("supps")))).cast("long"),
        },
        salt_by=["l_orderkey", "l_linenumber"],  # retry-deterministic
    )


@register(
    "q_skew_split",
    sql="""
    SELECT o_orderpriority, count(*) AS n,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_skew_split(spark, sf_dir):
    """Hot-key split join: the hot keys' dim slice broadcasts (their
    fact rows never shuffle), the remainder joins normally; union is
    result-identical to the plain join (the oracle IS the plain SQL).
    Hot keys enumerated from the dim, as key stats would supply."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    hot = [r[0] for r in orders.orderBy("l_orderkey").limit(5).collect()]
    joined = skew_split_join(li, orders, "l_orderkey", hot)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )
