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
from shadems_spark.queries import register
from shadems_spark.queries.core import PRICE_RANGE, TIME_RANGE
from shadems_spark.sources import read_csv, write_partitioned
from shadems_spark.vis import vis_sql_from, vis_view




def _pagerank_oracle(iters: int = 5, damping_pct: int = 85, topk: int = 20) -> str:
    """Unrolled fixed-point PageRank: r0..r{iters} CTEs, all integer
    arithmetic (DuckDB `//` == Spark `div` for positives), so every
    iteration is bit-identical to operators/graph.py::pagerank_fixed
    regardless of summation order."""
    parts = [
        """
    WITH e1 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                WHERE o_orderkey % 3 = 0),
    edges AS (SELECT src, dst FROM e1 UNION SELECT dst, src FROM e1),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST(1000000000 // n AS BIGINT) AS r FROM nodes, nn)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
    r{t} AS (SELECT agg.node,
                    CAST((100 - {damping_pct}) * CAST(1000000000 AS BIGINT) // 100 // nn.n
                         + ({damping_pct} * agg.s) // 100 AS BIGINT) AS r
             FROM (SELECT e.dst AS node, sum(r{t-1}.r // deg.d) AS s
                   FROM edges e
                   JOIN r{t-1} ON r{t-1}.node = e.src
                   JOIN deg ON deg.src = e.src
                   GROUP BY e.dst) agg, nn)"""
        )
    parts.append(
        f"""
    SELECT node, r FROM r{iters} ORDER BY r DESC, node LIMIT {topk}"""
    )
    return "".join(parts)


@register("q_pagerank", sql=_pagerank_oracle())
def q_pagerank(spark, sf_dir):
    """Distributed PageRank over the symmetric customer<->supplier
    co-purchase graph (operators/graph.py::pagerank_fixed): 5
    fixed-point sweeps — rank-to-edge join + integer groupBy sum per
    iteration, the canonical distributed-PageRank step.  Fixed-point
    1e9-scaled integer arithmetic makes the whole iteration
    summation-order-free, so the unrolled oracle matches exactly.
    Driver state is ONE integer (the node count); top-20 exits via
    TakeOrdered."""
    from shadems_spark.operators.graph import pagerank_fixed, symmetric_edges

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 3 == 0
    )
    li = load_table(spark, sf_dir, "lineitem")
    e1 = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    from shadems_spark.operators.dedup import tracked_persist

    # the edge table feeds every sweep (5 joins) plus deg and the node
    # count; without a persist each iteration's lineage re-scans the
    # orders x lineitem join — the one thing a 100-TB PageRank must
    # never do.  The n_nodes count also materializes the cache.
    edges = tracked_persist(symmetric_edges(e1), key="pagerank_edges")
    n_nodes = edges.select("src").distinct().count()
    ranks = pagerank_fixed(edges, n_nodes, iters=5, damping_pct=85)
    return ranks.orderBy(F.col("r").desc(), F.col("node")).limit(20)


@register(
    "q_khop",
    sql="""
    WITH RECURSIVE e0 AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey % 3 = 0),
    e AS (SELECT src, dst FROM e0
          UNION SELECT dst, src FROM e0),
    seeds AS (SELECT DISTINCT src AS node FROM e
              WHERE src % 2 = 0 AND (src // 2) % 50 = 0),
    r AS (
        SELECT node, 0 AS d FROM seeds
        UNION
        SELECT e.dst AS node, r.d + 1 AS d
        FROM r JOIN e ON e.src = r.node WHERE r.d < 3
    ),
    m AS (SELECT node, min(d) AS dist FROM r GROUP BY 1)
    SELECT dist, count(*) AS n_nodes, CAST(sum(node) AS BIGINT) AS node_sum
    FROM m GROUP BY 1 ORDER BY 1
    """,
)
def q_khop(spark, sf_dir):
    """Bounded BFS reachability: nodes within 3 hops of the seed set
    (every 50th customer) over the symmetric co-purchase graph — the
    neighborhood-expansion primitive under graph sampling and
    influence audits.  Level-synchronous frontier expansion: per hop
    one edge join + distinct + anti-join against the visited set, so
    the frontier is NODE-bounded per level (never path-enumerated —
    the oracle's recursive CTE gets the same property from UNION
    dedup on (node, d)).  Min-hop distance falls out of visiting
    order; per-level counts and exact node-id sums are the integer
    comparison surface.

    Scale: 3 bounded self-joins on the persisted edge table (the
    pagerank edge cache pattern); at 100 TB the frontier join
    partitions by src and the visited anti-join by node — both
    narrow-key shuffles bounded by the reachable set."""
    from shadems_spark.operators.dedup import tracked_persist
    from shadems_spark.operators.graph import symmetric_edges

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 3 == 0
    )
    li = load_table(spark, sf_dir, "lineitem")
    e1 = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = tracked_persist(symmetric_edges(e1), key="khop_edges")
    seeds = (
        edges.select("src")
        .filter((F.col("src") % 2 == 0) & F.expr("(src div 2) % 50 = 0"))
        .select(F.col("src").alias("node"))
        .distinct()
    )
    visited = seeds.withColumn("dist", F.lit(0))
    frontier = seeds
    for d in range(1, 4):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        visited = visited.unionByName(nxt.withColumn("dist", F.lit(d)))
        frontier = nxt
    return (
        visited.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("node").alias("node_sum"),
        )
        .orderBy("dist")
    )
