"""Graph-operator tests: fixed-point PageRank invariants."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from shadems_spark.operators.graph import SCALE, pagerank_fixed, symmetric_edges


def _star(spark):
    # hub 0 connected to 1..4
    e = spark.createDataFrame(
        [Row(src=0, dst=i) for i in range(1, 5)], "src long, dst long"
    )
    return symmetric_edges(e)


def test_pagerank_hub_dominates(spark):
    edges = _star(spark)
    n = edges.select("src").distinct().count()
    out = {r["node"]: r["r"] for r in pagerank_fixed(edges, n, iters=5).collect()}
    assert out[0] == max(out.values())
    leaves = [out[i] for i in range(1, 5)]
    assert len(set(leaves)) == 1  # symmetric leaves tie exactly


def test_pagerank_mass_conserved_within_truncation(spark):
    """Integer div truncates <1e-9 per node per step; total mass stays
    within n_nodes*iters ulps of SCALE."""
    edges = _star(spark)
    n = edges.select("src").distinct().count()
    iters = 5
    total = (
        pagerank_fixed(edges, n, iters=iters)
        .agg(F.sum("r").alias("t"))
        .collect()[0]["t"]
    )
    assert SCALE - n * (iters + 1) * 100 <= total <= SCALE


def test_pagerank_deterministic_across_runs(spark):
    edges = _star(spark)
    n = edges.select("src").distinct().count()
    a = sorted(map(tuple, pagerank_fixed(edges, n).collect()))
    b = sorted(map(tuple, pagerank_fixed(edges, n).collect()))
    assert a == b


def test_symmetric_edges_no_dangling(spark):
    e = spark.createDataFrame([Row(src=7, dst=8)], "src long, dst long")
    out = symmetric_edges(e).collect()
    assert {(r["src"], r["dst"]) for r in out} == {(7, 8), (8, 7)}


def test_pagerank_tol_converges_early_and_matches_fixed(spark):
    """tol-mode must stop once ranks are stable and return the same
    table a long fixed run produces (integer ranks make convergence
    exact)."""
    edges = _star(spark)
    n = edges.select("src").distinct().count()
    fixed = {tuple(r) for r in pagerank_fixed(edges, n, iters=30).collect()}
    conv = {tuple(r) for r in pagerank_fixed(edges, n, iters=30, tol=0).collect()}
    assert conv == fixed
