"""r11 optimization pins for operators/profile._share: the two-phase /
triangle operators persist their multiply-referenced input (always for
bounded triangle self-joins; size-thresholded for the data-sized
_bucketed input) so sibling plan branches stop re-executing the whole
lineage.  These tests pin (a) result equivalence of the shared and
inline paths and (b) that the sharing actually lands in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from shadems_spark.operators.dedup import release_persist
from shadems_spark.operators.profile import (
    global_cumsum,
    global_ntile,
    triangle_rank,
)


def _base(spark):
    return spark.range(0, 997).select(
        F.col("id"),
        (F.pmod(F.col("id") * 131 + 7, F.lit(911))).alias("v"),
    )


def test_bucketed_share_threshold_equivalence(spark):
    """global_ntile/global_cumsum results are identical whether the
    input is inlined (size under threshold — the default at test
    scale) or persisted (threshold forced to 0)."""
    df = _base(spark)
    inline_nt = global_ntile(df, 7, ["v", "id"], "t").orderBy("id").collect()
    inline_cs = (
        global_cumsum(df.select("v").distinct(), ["v"], {"c": "v"})
        .orderBy("v")
        .collect()
    )
    spark.conf.set("spark.shadems.share.threshold", "0")
    try:
        shared_nt = (
            global_ntile(df, 7, ["v", "id"], "t").orderBy("id").collect()
        )
        shared_cs = (
            global_cumsum(df.select("v").distinct(), ["v"], {"c": "v"})
            .orderBy("v")
            .collect()
        )
    finally:
        spark.conf.unset("spark.shadems.share.threshold")
        release_persist()
        spark.catalog.clearCache()
    assert shared_nt == inline_nt
    assert shared_cs == inline_cs


def test_bucketed_share_fires_past_threshold(spark):
    """With the threshold forced to 0 the _bucketed input is cached:
    the plan reads InMemoryTableScan instead of re-deriving the input
    lineage per branch."""
    spark.conf.set("spark.shadems.share.threshold", "0")
    try:
        plan = global_ntile(
            _base(spark), 7, ["v", "id"], "t"
        )._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.shadems.share.threshold")
        release_persist()
        spark.catalog.clearCache()
    assert "InMemoryTableScan" in plan


def test_triangle_share_in_plan_and_single_lineage(spark):
    """triangle_rank persists its input unconditionally (bounded by
    operator contract): both self-join sides read the cache, so the
    input lineage appears ONCE (as the cached plan), not once per
    side."""
    df = (
        _base(spark)
        .groupBy((F.col("v") % 13).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = triangle_rank(df, ["n", "g"], out="rk")
    try:
        plan = ranked._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 2  # both join sides
        rows = {r["g"]: r["rk"] for r in ranked.collect()}
        # rank parity with a driver-side sort of the same table
        base = sorted(
            ((r["n"], r["g"]) for r in df.collect()),
        )
        expect = {g: i + 1 for i, (_n, g) in enumerate(base)}
        assert rows == expect
    finally:
        release_persist()
        spark.catalog.clearCache()
