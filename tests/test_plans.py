"""Plan-quality regression tests: the scale properties SURVEY.md §4
promises must stay visible in the physical plan (pushdown, pruning,
broadcast shape, partial aggregation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shadems_spark.queries import load_registry

SF = "/root/testdata/sf0.001"


def _plan(spark, qname):
    reg = load_registry()
    return reg[qname][0](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown(spark):
    p = _plan(spark, "q_scan")
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,10.0)]" in p


def test_raster_prunes_columns(spark):
    """The raster touches 11-column lineitem but must read only the
    two axis columns."""
    p = _plan(spark, "q_raster_count")
    assert "ReadSchema: struct<l_extendedprice:double,l_shipdate:timestamp_ntz>" in p


def test_raster_partial_aggregate(spark):
    p = _plan(spark, "q_raster_count")
    assert "partial_count" in p  # map-side combine before the shuffle


def test_dim_joins_broadcast(spark):
    """Dim enrichment must never shuffle the fact side."""
    p = _plan(spark, "q_join_dim")
    assert p.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in p


def test_semijoin_broadcast(spark):
    p = _plan(spark, "q_semijoin")
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
