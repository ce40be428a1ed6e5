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
