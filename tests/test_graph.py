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


def _brute_components(edges):
    """Driver-side union-find ground truth."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_star_components_match_union_find(spark):
    """large-star/small-star must produce exactly the min-id
    components of a union-find ground truth on assorted graphs:
    chain, two cliques bridged, singleton-free cycles, random."""
    from shadems_spark.operators.graph import connected_components_star

    cases = [
        [(1, 2), (2, 3), (3, 4), (10, 11)],                # chain + pair
        [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9), (3, 7)],  # bridged cliques
        [(5, 6), (6, 7), (7, 5)],                          # cycle
        [(i, (i * 7) % 23 + 30) for i in range(20)],       # pseudo-random bipartite-ish
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["component"]
            for r in connected_components_star(df).collect()
        }
        want = _brute_components(edges)
        assert got == want, (edges, got, want)


def test_star_components_distributed_path_matches_fast_path(spark):
    """ADVICE r9: the default small_cap (64 Ki edges) captures every
    fixture-scale graph, so the distributed star loop — the actual
    100 TB path, including the lazy-localCheckpoint convergence probe
    — needs its own pin.  small_cap=0 forces the distributed loop on
    multi-component graphs (bridged cliques, chain + isolated pair,
    pseudo-random) and must agree exactly with both the driver-side
    union-find fast path and brute ground truth."""
    from shadems_spark.operators.graph import connected_components_star

    cases = [
        [(1, 2), (2, 3), (3, 4), (10, 11)],
        [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9), (3, 7), (40, 41)],
        [(i, (i * 7) % 23 + 30) for i in range(20)] + [(99, 98)],
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "src long, dst long")
        distributed = {
            r["node"]: r["component"]
            for r in connected_components_star(df, small_cap=0).collect()
        }
        fast = {
            r["node"]: r["component"]
            for r in connected_components_star(df).collect()
        }
        want = _brute_components(edges)
        assert distributed == fast == want, (edges, distributed, fast, want)


def test_star_components_match_label_propagation(spark, sf_dir):
    """On the minhash dup-pair graph, the star algorithm must agree
    with the existing min-label propagation (q_dedup_clusters)."""
    from shadems_spark.operators.graph import connected_components_star
    from shadems_spark.queries import load_registry

    reg = load_registry()
    lp = {
        r["doc_id"]: r["cluster_id"]
        for r in reg["q_dedup_clusters"][0](spark, sf_dir).collect()
    }
    import pyspark.sql.functions as F

    from shadems_spark.catalog import load_table
    from shadems_spark.operators.dedup import minhash_dedup, release_persist

    pairs = minhash_dedup(
        load_table(spark, sf_dir, "documents"), threshold=0.2
    ).select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    star = {
        r["node"]: r["component"]
        for r in connected_components_star(pairs).collect()
    }
    release_persist()
    assert star == lp and len(star) > 0


def test_kcore_peels_chains_keeps_cliques(spark):
    """2-core: a triangle survives, a pendant chain hanging off it is
    peeled entirely (including the intermediate node whose degree
    drops below 2 only after the leaf goes)."""
    from shadems_spark.operators.graph import kcore

    edges = [(1, 2), (2, 3), (1, 3),   # triangle
             (3, 4), (4, 5)]           # chain: 5 then 4 peel off
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["degree"] for r in kcore(df, k=2).collect()}
    assert set(out) == {1, 2, 3}
    assert all(d == 2 for d in out.values())


def test_kcore_brute_parity(spark):
    """Arbitrary graph: parity with a driver-side peel."""
    from shadems_spark.operators.graph import kcore

    edges = [(i, (i * 7) % 13) for i in range(13)] + [(1, 5), (2, 9), (4, 11)]
    edges = [(a, b) for a, b in edges if a != b]

    def brute(pairs, k):
        pairs = {(max(a, b), min(a, b)) for a, b in pairs}
        while True:
            deg = {}
            for a, b in pairs:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            keep = {n for n, d in deg.items() if d >= k}
            new = {(a, b) for a, b in pairs if a in keep and b in keep}
            if new == pairs:
                return deg, keep
            pairs = new

    deg, keep = brute(edges, 2)
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["degree"] for r in kcore(df, k=2).collect()}
    assert set(out) == keep
    assert out == {n: deg[n] for n in keep}


def test_khop_bfs_levels_on_known_graph(spark):
    """BFS level law on a path graph 0-1-2-3-4-5 seeded at 0: levels
    are exactly {0:[0], 1:[1], 2:[2], 3:[3]} within 3 hops (4 and 5
    unreachable), replayed through the same frontier-expansion shape
    the query uses."""
    from pyspark.sql import functions as F

    from shadems_spark.operators.graph import symmetric_edges

    e1 = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    edges = symmetric_edges(e1)
    seeds = spark.createDataFrame([(0,)], "node long")
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
    got = {r["node"]: r["dist"] for r in visited.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
