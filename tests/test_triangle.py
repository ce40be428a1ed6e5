"""The broadcast-triangle prefix primitives (profile.triangle_cumsum /
triangle_rank — the r8 window-allowlist replacements) must be
value-identical to the window forms they replaced, on any bounded
table shape including ties, negatives and multi-key orders."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from shadems_spark.operators.profile import triangle_cumsum, triangle_rank


def _fixture(spark):
    # keys with duplicates in k1, ties broken by k2; negative values
    rows = [
        (3, "b", 10), (1, "a", -4), (3, "a", 7), (2, "c", 0),
        (1, "b", 5), (2, "a", 2), (4, "a", -1),
    ]
    return spark.createDataFrame(rows, "k1 int, k2 string, v long")


def test_triangle_cumsum_matches_window(spark):
    df = _fixture(spark)
    got = {
        (r["k1"], r["k2"]): r["cum"]
        for r in triangle_cumsum(df, ["k1", "k2"], {"cum": "v"}).collect()
    }
    w = Window.orderBy("k1", "k2").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r["k1"], r["k2"]): r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_triangle_cumsum_strict_is_exclusive(spark):
    df = _fixture(spark)
    got = {
        (r["k1"], r["k2"]): r["cum"]
        for r in triangle_cumsum(
            df, ["k1", "k2"], {"cum": "v"}, strict=True
        ).collect()
    }
    w = Window.orderBy("k1", "k2").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        (r["k1"], r["k2"]): r["cum"] if r["cum"] is not None else 0
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want  # empty prefix -> 0, not NULL


def test_triangle_rank_matches_row_number_on_total_order(spark):
    df = _fixture(spark)
    got = {
        (r["k1"], r["k2"]): r["rk"]
        for r in triangle_rank(df, ["k1", "k2"]).collect()
    }
    w = Window.orderBy("k1", "k2")
    want = {
        (r["k1"], r["k2"]): r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert got == want


def test_triangle_rank_ties_share_rank(spark):
    df = _fixture(spark)
    got = {
        (r["k1"], r["k2"]): r["rk"]
        for r in triangle_rank(df, ["k1"]).collect()
    }
    want = {
        (r["k1"], r["k2"]): r["rk"]
        for r in df.withColumn(
            "rk", F.rank().over(Window.orderBy("k1"))
        ).collect()
    }
    assert got == want


def test_triangle_plans_broadcast_no_window(spark):
    """The whole point: a BroadcastNestedLoopJoin, zero WindowExec."""
    df = _fixture(spark)
    p = (
        triangle_cumsum(df, ["k1", "k2"], {"cum": "v"})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in p
    assert "Window" not in p
