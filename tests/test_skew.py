"""Salting rewrites must be result-identical to the unsalted plan and
must actually spread hot keys across buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.operators.skew import SALT, salted_join, two_phase_agg


def _skewed(spark):
    """90% of rows share one key — the pathological fact table."""
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 3 % 101).alias("v"),
    )


def test_salted_join_matches_plain(spark):
    fact = _skewed(spark)
    dim = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 2).alias("d"))
    plain = fact.join(dim, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("d").alias("s"))
    salted = salted_join(fact, dim, "k", n_salt=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("d").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched_once(spark):
    fact = _skewed(spark)
    dim = spark.range(5).select(F.col("id").alias("k"), F.lit(1).alias("d"))  # most keys unmatched
    plain = fact.join(dim, "k", "left").count()
    salted = salted_join(fact, dim, "k", n_salt=8, how="left").count()
    assert plain == salted == fact.count()


def test_salt_spreads_hot_key(spark):
    """The hot key's rows must occupy every salt bucket, not one."""
    fact = _skewed(spark)
    dim = spark.range(50).select(F.col("id").alias("k"))
    n_buckets = (
        salted_join(fact.withColumn("kk", F.col("k")), dim, "k", n_salt=8)
        .filter(F.col("kk") == 7)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert n_buckets > 1


def test_two_phase_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    )
    salted = two_phase_agg(
        li,
        ["l_returnflag"],
        partials={"n": F.count(F.lit(1)), "q": F.sum("l_quantity")},
        finals={"n": F.sum("n").cast("long"), "q": F.round(F.sum("q"), 2)},
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_distinct_state_bounded(spark):
    """Distinct-heavy agg: per-(key,salt) sets merge to the exact
    global distinct count per key."""
    df = _skewed(spark)
    plain = df.groupBy("k").agg(F.countDistinct("v").alias("nd"))
    salted = two_phase_agg(
        df,
        ["k"],
        partials={"vs": F.collect_set("v")},
        finals={"nd": F.size(F.array_distinct(F.flatten(F.collect_list("vs")))).cast("long")},
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
