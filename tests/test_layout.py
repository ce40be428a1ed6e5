"""Partitioned-layout tests (SURVEY.md §4 "partition skipping"):
the reference never reads unselected (field, ddid, scan) groups; on a
hive-partitioned layout the engine's F1 group selection must become
partition PRUNING — unselected directories never open — and facet
writes must produce that layout (A5/step 7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.operators.selection import select_groups
from shadems_spark.vis import vis_view


@pytest.fixture(scope="module")
def partitioned(spark, sf_dir, tmp_path_factory):
    """vis view written partitioned by the group key — the MS layout
    analogue (dask-ms group_cols = partition dirs)."""
    out = str(tmp_path_factory.mktemp("layout") / "vis_by_field")
    vis_view(load_table(spark, sf_dir, "lineitem")).write.partitionBy(
        "field_label"
    ).parquet(out)
    return out


def test_group_selection_prunes_partitions(spark, partitioned):
    df = select_groups(spark.read.parquet(partitioned), "field_label", ["O"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the filter must reach the scan as a partition filter, not a
    # post-scan predicate over all groups
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert m, plan
    assert re.search(r"field_label#\d+ (= O|IN \(O\))", m.group(0)), m.group(0)


def test_pruned_read_matches_filter(spark, sf_dir, partitioned):
    want = (
        vis_view(load_table(spark, sf_dir, "lineitem"))
        .filter(F.col("field_label") == "O")
        .count()
    )
    got = spark.read.parquet(partitioned).filter(F.col("field_label") == "O").count()
    assert got == want > 0


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    """SURVEY §4: bucketing for co-located fact×fact joins — two
    tables bucketed+sorted on the join key must sort-merge join with
    NO Exchange on either side (the 100 TB join strategy: shuffle paid
    once at write time, amortized over every downstream join)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    import shutil

    for t in ("li_bkt", "ord_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # the in-memory catalog is per-session but the warehouse dir
        # outlives it — clear stale locations from earlier sessions
        shutil.rmtree(f"/tmp/shadems-warehouse/{t}", ignore_errors=True)
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(
        "li_bkt", mode="overwrite"
    )
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        "ord_bkt", mode="overwrite"
    )
    # force the sort-merge path: at fixture scale AQE would broadcast,
    # which is exactly what a 100 TB fact×fact join cannot do
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bkt").join(
            spark.table("ord_bkt"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket layout reused
        # and the result matches the plain (shuffling) join
        plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert joined.count() == plain > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_facet_write_layout(spark, sf_dir, tmp_path):
    """run_faceted must emit one directory per facet key value."""
    import os

    from shadems_spark.plans.shadeplot import ShadePlot

    v = vis_view(load_table(spark, sf_dir, "lineitem"))
    plot = ShadePlot(
        x=F.col("time_day").cast("double"),
        y=F.col("vis.re"),
        width=16,
        height=16,
    )
    out = str(tmp_path / "facets")
    plot.run_faceted(v, ["field_label"], out)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("field_label="))
    assert len(dirs) >= 2
    back = spark.read.parquet(out)
    assert {"field_label", "by", "bx", "val"} <= set(back.columns)
    # reading one facet opens only its directory (partition pruning)
    one = back.filter(F.col("field_label") == dirs[0].split("=", 1)[1])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and one.count() > 0


def test_facet_scan_spw_write_layout(spark, sf_dir, tmp_path):
    """--iter scan/spw layout: two-level scan_no=<v>/spw_id=<v>
    directories, partition-pruned read-back."""
    import os

    from shadems_spark.plans.shadeplot import ShadePlot

    v = vis_view(load_table(spark, sf_dir, "lineitem"))
    plot = ShadePlot(
        x=F.col("time_day").cast("double"),
        y=F.col("vis.re"),
        width=8,
        height=8,
    )
    out = str(tmp_path / "facets_scan")
    plot.run_faceted(v, ["scan_no", "spw_id"], out)
    scans = sorted(d for d in os.listdir(out) if d.startswith("scan_no="))
    assert len(scans) >= 2
    spws = sorted(
        d for d in os.listdir(os.path.join(out, scans[0])) if d.startswith("spw_id=")
    )
    assert len(spws) >= 2
    back = spark.read.parquet(out)
    one = back.filter((F.col("scan_no") == 0) & (F.col("spw_id") == 1))
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
