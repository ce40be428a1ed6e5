"""Similarity search over embedding columns (SURVEY.md §2 M3):
brute-force cosine top-k as the exact baseline, and a random-
hyperplane LSH-bucketed variant as the 100 TB scale path.

Dot products are `zip_with` + `aggregate` — JVM higher-order
functions, sequential fold, deterministic; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from shadems_spark.operators.hashing import knuth32


def as_double(arr: Column | str) -> Column:
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast the (small) query set against the full
    collection — one scan of the big side, per-partition partial
    top-k via the rank window on (q_id)."""
    q = queries.select(
        F.col(id_col).alias("q_id"), as_double(vec).alias("q_vec")
    )
    c = emb.select(F.col(id_col).alias("cand_id"), as_double(vec).alias("c_vec"))
    from shadems_spark.operators.exprcache import memo

    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("q_id"))
        .withColumn(
            "cos",
            memo(
                ("qc_cos",),
                lambda: F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6),
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "cand_id", "cos", "rank")
    )


def brute_topk_vectorized(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec: str = "embedding",
) -> DataFrame:
    """brute_topk's Arrow fast path: queries are collected into a
    numpy matrix (they are small by contract) and each Arrow batch of
    candidates is scored as ONE matmul — the per-element HOF fold
    becomes BLAS.  Same results as brute_topk (tests pin equality);
    use this form when the scoring stage dominates (wide vectors,
    many queries).  The big side is still scanned once, never
    shuffled; the window top-k is unchanged."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    q_rows = queries.select(F.col(id_col).alias("q_id"), as_double(vec).alias("q_vec")).collect()
    q_ids = [int(r["q_id"]) for r in q_rows]
    qm = np.array([r["q_vec"] for r in q_rows], dtype=np.float64)
    qm_unit = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    @pandas_udf("array<double>")
    def score(vecs):
        import pandas as pd

        m = np.vstack(vecs.map(np.asarray, na_action=None).to_numpy()).astype(np.float64)
        m_unit = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        cos = m_unit @ qm_unit.T  # (batch, n_queries)
        # HALF_UP like Spark's F.round (np.round is half-to-even: a
        # boundary value would flip the rank tie-break vs brute_topk)
        cos = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6
        return pd.Series(list(cos))

    c = emb.select(F.col(id_col).alias("cand_id"), as_double(vec).alias("c_vec"))
    scored = c.withColumn("__cos", score("c_vec")).select(
        "cand_id",
        F.posexplode("__cos").alias("__qi", "cos"),
    )
    qmap = F.array(*[F.lit(i) for i in q_ids])
    scored = scored.withColumn("q_id", F.element_at(qmap, F.col("__qi") + 1)).filter(
        F.col("cand_id") != F.col("q_id")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "cand_id", "cos", "rank")
    )


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mixer (public SplitMix64 constants) — used
    to derive hyperplane components driver-side so the plan carries
    small literal arrays instead of per-row hash expression trees."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def hyperplane_bucket(
    vec: Column | str, n_planes: int = 8, dim: int = 64, seed: int = 0
) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of dot(v, plane_j).
    Planes are fixed literals (seeded SplitMix64 -> [-1, 1]) — every
    executor sees identical planes with no broadcast state and the
    expression tree stays small (n_planes literal arrays).  ``seed``
    offsets the plane family so multiple independent hash tables
    (OR-amplification) draw disjoint planes.

    Pass ``vec`` as a plain column NAME to enable the expression memo
    (the simhash text_key pattern): a str is an unambiguous cache key,
    whereas stringifying an arbitrary Column costs a py4j round-trip
    per call and could alias two different DataFrames' columns that
    print identically (ADVICE r11).  Column input stays supported but
    is built uncached."""
    from shadems_spark.operators.exprcache import memo

    def _build_bucket():
        v = F.col(vec) if isinstance(vec, str) else vec
        bucket = None
        for j in range(n_planes):
            comps = [
                (_splitmix64((seed + j) * 1024 + i) % 2001) / 1000.0 - 1.0
                for i in range(dim)
            ]
            plane = F.array(*[F.lit(c) for c in comps])
            d = dot(v, plane)
            bit = (
                F.when(d > 0, F.lit(1).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            )
            term = F.shiftleft(bit, j)
            bucket = term if bucket is None else bucket.bitwiseOR(term)
        return bucket

    if isinstance(vec, str):
        return memo(("hp_bucket", vec, n_planes, dim, seed), _build_bucket)
    return _build_bucket()


def embedding_dim(emb: DataFrame, vec: str = "embedding") -> int:
    """Width of the embedding column, read from one row (a single
    row-group read, not a scan).  Hyperplanes MUST span the full
    vector: a short plane would null out dot products via zip_with
    padding and collapse every vector into bucket 0."""
    row = emb.select(F.size(F.col(vec)).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot derive embedding dim from column {vec!r}")
    return int(row["d"])


def lsh_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec: str = "embedding", n_planes: int = 4,
    n_tables: int = 6, dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH (the standard
    AND-OR amplification): each of ``n_tables`` independent tables
    ANDs ``n_planes`` sign bits into a bucket; a candidate is scored
    if it shares the query's bucket in ANY table.

    A single table (round-1 form) has collision probability
    (1-θ/π)^n_planes per pair — at 8 planes that measured recall 0.0
    for top-k neighbours on the sf0.01 fixture; OR-ing 6 tables of 4
    planes lifts pair recall to 1-(1-p)^6 (measured 0.67 there, pinned
    in tests) while keeping per-table buckets ~|data|/2^n_planes.
    Scale shape: the big side is scanned
    once, exploded ×n_tables into (table, bucket) keys, joined against
    the broadcast query buckets, and a pair scored in several tables
    dedups BEFORE the rank window.  ``dim`` defaults to the data's
    actual embedding width (ADVICE r01: a hardcoded 64 silently
    bucketed mismatched widths into bucket 0)."""
    dim = dim or embedding_dim(emb, vec)

    def tabled(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        base = df.select(F.col(id_col).alias(out_id), as_double(vec).alias(out_vec))
        tb = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        hyperplane_bucket(
                            out_vec, n_planes, dim, seed=t * n_planes
                        ).alias("b"),
                    )
                    for t in range(n_tables)
                ]
            )
        )
        return base.withColumn("__tb", tb).select(
            out_id, out_vec, F.col("__tb.t").alias("tbl"), F.col("__tb.b").alias("bucket")
        )

    c = tabled(emb, "cand_id", "c_vec")
    q = tabled(queries, "q_id", "q_vec")
    scored = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("cand_id") != F.col("q_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
        .select("q_id", "cand_id", "cos")
        .distinct()  # a pair colliding in several tables scores once
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "cand_id", "cos", "rank")
    )


def _unit(c: list[float]) -> list[float]:
    import math

    n = math.sqrt(sum(x * x for x in c)) or 1.0
    return [x / n for x in c]


def ivf_assign(emb: DataFrame, centroids: list[list[float]], vec: str = "c_vec") -> DataFrame:
    """Assign each vector to its nearest coarse centroid (max cosine).
    Centroids ride the plan as literal arrays (k is small — IVF coarse
    quantizers are 2^8..2^12 cells even at billion-vector scale), so
    assignment is a pure projection: no shuffle, no UDF.

    Two things keep this linear in k (a chained-when argmax measured
    ~50x slower — each branch re-nests every prior cosine subtree, and
    interpreted HOFs get no CSE):
    - centroids are unit-normalized driver-side, so argmax cosine ==
      argmax dot (the row's own norm is a constant divisor);
    - the argmax is one array_sort over k (score, cell) structs, each
      dot evaluated exactly once."""
    from shadems_spark.operators.exprcache import memo

    def _build_best():
        scores = F.array(
            *[
                F.struct(
                    (
                        -dot(
                            F.col(vec),
                            F.array(*[F.lit(x) for x in _unit(c)]),
                        )
                    ).alias("neg"),
                    F.lit(i).alias("cell"),
                )
                for i, c in enumerate(centroids)
            ]
        )
        return F.element_at(F.array_sort(scores), 1)["cell"]

    # keyed on the centroid VALUES: the sampling/refinement jobs that
    # produced them still run on every build — only the expression
    # construction is cached (identical plan, nothing skipped)
    ckey = tuple(tuple(c) for c in centroids)
    return emb.withColumn("cell", memo(("ivf_best", ckey, vec), _build_best))


#: cross-engine id-sampler constants (SplitMix64-derived literals over
#: the poly-hash prime): h(id) = (A*id + B) mod M — plain BIGINT
#: arithmetic on both engines, so a DuckDB oracle replays WHICH rows
#: became centroids (the q_ann_lsh seed-replay play for IVF).
XE_IVF_M = 1_000_000_007
XE_IVF_A = _splitmix64(101) % (XE_IVF_M - 1) + 1
XE_IVF_B = _splitmix64(102) % XE_IVF_M

#: block-cap sampler constants (same family, independent seeds): ranks
#: nodes within a (label, sub-bucket) block so a degree cap keeps a
#: deterministic, DuckDB-replayable uniform subsample of each block.
XE_CAP_A = _splitmix64(103) % (XE_IVF_M - 1) + 1
XE_CAP_B = _splitmix64(104) % XE_IVF_M


def xe_affine(col: Column | str, a: int = XE_IVF_A, b: int = XE_IVF_B) -> Column:
    """Overflow-safe affine id hash h(id) = (a·(id mod M) + b) mod M —
    the id is reduced mod M BEFORE the multiply (pmod so negative ids
    stay in range), bounding the product at a·(M−1)+b ≈ 3.1e17, far
    inside LONG for ANY signed-64-bit id.  The raw ``a*id + b`` form
    overflows once ids reach ~3.0e10 — the same snowflake-id bracket
    class knuth32 closed in r10.  For ids in [0, M) (every fixture,
    hence every oracle-checked domain) the value is bit-identical to
    the raw form.  Defaults are the IVF sampler constants; pass
    (XE_CAP_A, XE_CAP_B) for the block-cap family — ONE tested
    implementation for every xe-affine site."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.lit(a) * F.pmod(c, F.lit(XE_IVF_M)) + F.lit(b)) % F.lit(XE_IVF_M)


def xe_affine_sql(expr: str, a: int = XE_IVF_A, b: int = XE_IVF_B) -> str:
    """DuckDB mirror of :func:`xe_affine` — same mod-first reduction
    (double-% for the positive residue), same in-range values as the
    historical raw form.  The BIGINT cast guards the product when
    ``expr`` is a narrower integer type."""
    m = XE_IVF_M
    return (
        f"(CAST({a} AS BIGINT) * ((({expr}) % {m} + {m}) % {m}) + {b}) % {m}"
    )


def xe_dot_sql(a: str, b: str) -> str:
    """DuckDB sequential-fold dot product — the SAME add order as the
    Spark ``F.aggregate`` fold and driver-side Python ``sum``, so both
    engines see bit-identical IEEE sums.  One definition for every
    hash-exact oracle that replays a dot product (IVF, IVFPQ, PQ,
    coverage)."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), z -> z[1] * z[2])), "
        f"(s, x) -> s + x)"
    )


def xe_norm_sql(a: str) -> str:
    """DuckDB sequential-fold L2 norm — mirrors :func:`norm`'s
    ``s + x*x`` fold element-for-element."""
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({a}, t -> t * t)), (s, x) -> s + x))"
    )


def sample_centroids(
    emb: DataFrame, k: int = 8, id_col: str = "vec_id", vec: str = "embedding",
    sampler: str = "xx",
) -> list[list[float]]:
    """Deterministic coarse centroids: the k ids hashing lowest — a
    uniform, order-free sample in ONE pass (TakeOrderedAndProject; no
    count job, no full sort).  The sampled quantizer alone bounds the
    search to O(rows/k) per probe — the scale property; pass the
    result through :func:`refine_centroids` for a Lloyd iteration when
    recall matters more than setup cost.  ``sampler="xe"`` orders by
    the affine id hash (ties by id) instead of xxhash64 so the sample
    is DuckDB-replayable."""
    if sampler == "xe":
        order = [xe_affine(id_col), F.col(id_col)]
    else:
        order = [F.xxhash64(F.col(id_col))]
    rows = (
        emb.orderBy(*order)
        .limit(k)
        .select(as_double(vec).alias("v"))
        .collect()
    )
    return [list(r["v"]) for r in rows]


def refine_centroids(
    emb: DataFrame, centroids: list[list[float]],
    id_col: str = "vec_id", vec: str = "embedding", iters: int = 1,
) -> list[list[float]]:
    """Lloyd (k-means) refinement of the sampled coarse quantizer:
    assign every vector to its cell (ivf_assign — pure projection, no
    shuffle), then average each cell's members component-wise.

    The mean is computed via posexplode + groupBy(cell, idx).avg —
    shuffle rows are (int, int, double), map-side combined, and the
    collected result is k × dim scalars: driver traffic is the
    quantizer itself, never the data.  One iteration markedly evens
    out cell sizes vs. raw sampling (recall pinned in
    tests/test_llm_ops.py); more iterations are diminishing returns
    for a COARSE quantizer."""
    cents = centroids
    for _ in range(iters):
        assigned = ivf_assign(
            emb.select(F.col(id_col).alias("cand_id"), as_double(vec).alias("c_vec")),
            cents,
        )
        means = (
            assigned.select("cell", F.posexplode("c_vec").alias("idx", "x"))
            .groupBy("cell", "idx")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(int(r["cell"]), {})[int(r["idx"])] = float(r["m"])
        # empty cells keep their previous centroid (standard Lloyd fix)
        cents = [
            [by_cell[i][j] for j in sorted(by_cell[i])] if i in by_cell else c
            for i, c in enumerate(cents)
        ]
    return cents


def ivf_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec: str = "embedding",
    n_cells: int = 8, n_probe: int = 2, refine_iters: int = 0,
    sampler: str = "xx",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the collection once,
    probe the query's ``n_probe`` nearest cells — candidates are
    O(n_probe/n_cells) of the collection instead of all of it.

    The probe set is a tiny exploded (q_id, cell) frame broadcast into
    the candidate join, so the big side is scanned once and never
    shuffled."""
    cents = sample_centroids(emb, k=n_cells, id_col=id_col, vec=vec, sampler=sampler)
    if refine_iters:
        cents = refine_centroids(emb, cents, id_col, vec, iters=refine_iters)
    c = ivf_assign(
        emb.select(F.col(id_col).alias("cand_id"), as_double(vec).alias("c_vec")),
        cents,
    )
    # per query: rank all cells by centroid cosine, keep n_probe
    from shadems_spark.operators.exprcache import memo

    q = queries.select(F.col(id_col).alias("q_id"), as_double(vec).alias("q_vec"))

    def _build_probe():
        probe_cols = []
        for i, cent in enumerate(cents):
            cvec = F.array(*[F.lit(float(x)) for x in cent])
            probe_cols.append(
                F.struct(
                    cosine(F.col("q_vec"), cvec).alias("cos"),
                    F.lit(i).alias("cell"),
                )
            )
        return F.explode(
            F.slice(F.reverse(F.array_sort(F.array(*probe_cols))), 1, n_probe)
        )

    ckey = tuple(tuple(c) for c in cents)
    probes = q.withColumn(
        "__p", memo(("ivf_probe", ckey, n_probe), _build_probe)
    ).select("q_id", "q_vec", F.col("__p.cell").alias("cell"))
    scored = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("cand_id") != F.col("q_id"))
        .withColumn(
            "cos",
            memo(
                ("qc_cos",),
                lambda: F.round(
                    cosine(F.col("q_vec"), F.col("c_vec")), 6
                ),
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "cell", "cand_id", "cos", "rank")
    )


def hyperplane_bucket_sql(
    vec_expr: str, n_planes: int = 8, dim: int = 64, seed: int = 0
) -> str:
    """DuckDB mirror of :func:`hyperplane_bucket` — same SplitMix64
    plane literals, same sequential-fold dot product, so both engines
    assign identical buckets (used by the q_dedup_embedding oracle)."""
    terms = []
    for j in range(n_planes):
        comps = [(_splitmix64((seed + j) * 1024 + i) % 2001) / 1000.0 - 1.0 for i in range(dim)]
        arr = "[" + ", ".join(repr(c) for c in comps) + "]"
        dot = f"list_sum(list_transform(list_zip({vec_expr}, {arr}), z -> z[1] * z[2]))"
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def embedding_near_dup(
    emb: DataFrame, id_col: str = "vec_id", vec: str = "embedding",
    bucket_col: str = "label", threshold: float = 0.99,
    sub_planes: int = 2, dim: int | None = None,
    node_cap: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking bucket
    (coarse cluster / label) — the IVF-style "only compare within the
    cell" pattern.

    The join key is (label, hyperplane sub-bucket), not label alone:
    a hot label would otherwise make the self-join O(bucket²)
    (VERDICT r01 #2).  The sub-bucket bounds worst-case candidate
    pairs to ~O((bucket / 2^sub_planes)²) per label, at a documented
    recall trade: a true pair at cosine c lands in the same sub-bucket
    with probability (1 - arccos(c)/π)^sub_planes (≈0.91 at c=0.99
    with the default 2 planes).  Set ``sub_planes=0`` to recover the
    exact-within-label behaviour when labels are known to be small.

    ``node_cap`` (VERDICT r6 #6, the graph-metric guard): keep at most
    that many nodes per (label, sub-bucket) block — the cap-lowest by
    the affine XE_CAP hash of the id (ties by id), a deterministic
    UNIFORM subsample of the block that both engines replay exactly.
    Below the cap the graph is exact; above it, metrics computed on
    the capped graph are uniform-per-block subsample estimators, and
    the worst-case pair count per block is cap²/2 regardless of how
    pathologically a real corpus piles ids into one label — the
    documented bracket that stops label-shared blowup (the measured
    x10->x100 candidate-pair growth) from going quadratic."""
    dim = dim or embedding_dim(emb, vec)
    base = emb.select(
        F.col(bucket_col).alias("bkt"),
        F.col(id_col).alias("id"),
        as_double(vec).alias("v"),
    )
    if sub_planes > 0:
        base = base.withColumn("hp", hyperplane_bucket("v", sub_planes, dim))
    else:
        base = base.withColumn("hp", F.lit(0))
    if node_cap is not None:
        from pyspark.sql import Window

        # xe_affine with the cap constants: mod-first reduction keeps
        # the product < ~1e18 for ANY id (Spark wraps silently while
        # DuckDB errors on BIGINT overflow — ADVICE r7), every
        # non-overflowing hash value unchanged.
        rk = F.row_number().over(
            Window.partitionBy("bkt", "hp").orderBy(
                xe_affine("id", XE_CAP_A, XE_CAP_B),
                F.col("id"),
            )
        )
        base = (
            base.withColumn("__rk", rk)
            .filter(F.col("__rk") <= node_cap)
            .drop("__rk")
        )
    side = lambda tag: base.select(
        "bkt", "hp", F.col("id").alias(f"id{tag}"), F.col("v").alias(f"v{tag}")
    )
    pairs = side(1).join(side(2), ["bkt", "hp"]).filter(F.col("id1") < F.col("id2"))
    return (
        pairs.withColumn("cos", F.round(cosine(F.col("v1"), F.col("v2")), 4))
        .filter(F.col("cos") >= threshold)
        .select("bkt", "id1", "id2", "cos")
    )


def power_top_component(
    emb: DataFrame,
    vec: str = "embedding",
    d: int | None = None,
    iters: int = 8,
) -> tuple[list[float], list[float]]:
    """Distributed PCA top component by power iteration.

    Returns ``(mean, component)`` as plain d-vectors.  Each iteration
    is ONE map-side aggregate over the data: per row the scalar
    projection t = (x - mu) . v, then d partial sums of t * (x - mu)_i
    — the classic v <- A v step with A = covariance, computed without
    ever materializing the d x d covariance.  Driver state is two
    d-vectors (like IVF centroids) — legitimate small state, not a
    collect of data rows.  Cost per pass is O(rows * d) map-side with
    no shuffle beyond the final partial-agg merge, so the shape holds
    at any corpus size; iters bounds total passes.

    Deterministic AND engine/layout-exact (the nano-int protocol, r6):
    every cross-row float sum — the per-dim mean numerators and the
    per-iteration A·v partial sums — rounds its contributions to
    nano-ints BEFORE summation, so the fitted (mean, component) are
    bit-identical on any partition layout and replayable by the DuckDB
    oracle (the q_lr_train play for iterative linear algebra).  The
    previous F.avg/F.sum float aggregates were summation-order-
    dependent — a latent layout nondeterminism this rewrite removes.
    Fixed uniform init, fixed iteration count, and a canonical sign
    (first non-tiny coordinate positive) pin the +/-v ambiguity.
    """
    import math

    from shadems_spark.operators.similarity import embedding_dim

    d = d or embedding_dim(emb, vec)
    # materialize the double array ONCE per row; element_at on the
    # attribute then costs O(1) — inlining as_double(vec) into each of
    # the d accesses would re-run the transform per access (O(d^2)/row)
    dv = emb.select(as_double(vec).alias("__v"))
    xs = [F.element_at(F.col("__v"), i + 1) for i in range(d)]
    mu_row = dv.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.round(x * 1e9).cast("long")).alias(f"m{i}")
            for i, x in enumerate(xs)
        ],
    ).first()
    n_rows = int(mu_row["__n"]) or 1
    mu = [float(mu_row[f"m{i}"] or 0) / 1e9 / n_rows for i in range(d)]
    v = [1.0 / math.sqrt(d)] * d
    centered = dv.select(*[(xs[i] - F.lit(mu[i])).alias(f"c{i}") for i in range(d)])
    for _ in range(iters):
        t = F.lit(0.0)
        for i in range(d):
            t = t + F.col(f"c{i}") * F.lit(v[i])
        proj = centered.withColumn("__t", t)
        srow = proj.agg(
            *[
                F.sum(
                    F.round(F.col("__t") * F.col(f"c{i}") * 1e9).cast("long")
                ).alias(f"s{i}")
                for i in range(d)
            ]
        ).first()
        s = [float(srow[i] or 0) / 1e9 for i in range(d)]
        nrm = math.sqrt(sum(x * x for x in s)) or 1.0
        v = [x / nrm for x in s]
    for x in v:
        if abs(x) > 1e-9:
            if x < 0:
                v = [-y for y in v]
            break
    return mu, v


def pca_project(
    emb: DataFrame,
    mean: list[float],
    component: list[float],
    id_col: str = "vec_id",
    vec: str = "embedding",
    out: str = "pc1",
    ndigits: int = 4,
) -> DataFrame:
    """Project every vector onto a fitted component: one scan, pure
    Column arithmetic (the fitted (mean, component) ride the plan as
    literals — broadcast-by-construction)."""
    c = as_double(vec)
    mu = F.array(*[F.lit(m) for m in mean])
    cv = F.array(*[F.lit(w) for w in component])
    proj = dot(F.zip_with(c, mu, lambda a, b: a - b), cv)
    return emb.select(id_col, F.round(proj, ndigits).alias(out))


def unit(vec: Column) -> Column:
    """Unit-normalize an array<double> vector (zero-safe).

    NOTE: the norm subtree is embedded in every element's division and
    Catalyst does no CSE inside HOF lambdas — O(d^2) per row.  Fine
    for small collected query sets; for corpus-wide projections use
    :func:`with_unit`, which binds the norm once as a column."""
    n = norm(vec)
    return F.transform(vec, lambda x: x / F.when(n == 0, F.lit(1.0)).otherwise(n))


def with_unit(df: DataFrame, vec: str, out: str) -> DataFrame:
    """Corpus-scale unit normalization: materialize the double array
    and its norm as columns FIRST, then divide — each row computes the
    norm once (O(d)), not once per element (O(d^2), what inlining
    ``unit()`` into a projection costs)."""
    return (
        df.withColumn("__dv", as_double(vec))
        .withColumn("__n", norm(F.col("__dv")))
        .withColumn(
            out,
            F.transform(
                F.col("__dv"),
                lambda x: x / F.when(F.col("__n") == 0, F.lit(1.0)).otherwise(F.col("__n")),
            ),
        )
        .drop("__dv", "__n")
    )


def pq_train(
    emb: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    m: int = 32,
    k: int = 16,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: split the d-dim space into
    ``m`` contiguous subspaces and take ``k`` deterministic sample
    vectors' subvectors as each subspace's centroids (same
    hash-ordered TakeOrdered sampling as the IVF quantizer — one small
    job, no count pass, no RNG).  Returns centroids[m][k][d/m].

    Driver state is m*k*(d/m) = k*d floats — codebook-sized, like IVF
    centroids; the data never leaves the cluster."""
    d = embedding_dim(emb, vec)
    if m > d:
        raise ValueError(f"pq_train: m={m} subspaces > embedding dim d={d}")
    if d % m != 0:
        # silently truncating the tail dims would drop them from every
        # codebook/code/LUT and quietly corrupt rankings
        raise ValueError(
            f"pq_train: embedding dim d={d} not divisible by m={m}; "
            f"choose m from the divisors of d"
        )
    sub = d // m
    h = knuth32(id_col)  # decimal-exact: 64-bit-id safe, same values
    rows = (
        with_unit(emb, vec, "v")
        .select("v", F.col(id_col).alias("__id"), h.alias("h"))
        # id tiebreak: a hash collision would otherwise make the
        # codebook order nondeterministic AND un-replayable by the
        # DuckDB oracle (same convention as the xe IVF sampler)
        .orderBy("h", "__id")
        .limit(k)
        .collect()
    )
    return [
        [[float(r["v"][mi * sub + i]) for i in range(sub)] for r in rows]
        for mi in range(m)
    ]


def pq_encode(
    emb: DataFrame,
    centroids: list[list[list[float]]],
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector to ``m`` small codes (nearest centroid per
    subspace).  Output rows are (id, array<int> codes): m ints instead
    of d floats — the 8x-16x storage/shuffle compression that makes
    billion-vector ANN fit a cluster's memory.

    Arrow-vectorized pandas encode (sanctioned fast path, same policy
    as brute_topk_vectorized): the per-batch argmin is one numpy
    broadcast per subspace.  The Column-expression alternative needs
    m*k*sub distance terms (1024 at the defaults) — its codegen
    compile dominated wall time (~20 s fixed cost per plan) while the
    numpy path runs the same encode in <2 s and scans the data once
    either way.  Codebooks ride into the UDF as a closure literal
    (k*d floats — broadcast-by-construction)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    m = len(centroids)
    sub = len(centroids[0][0])
    cents = [np.asarray(centroids[mi], dtype=np.float64) for mi in range(m)]

    @pandas_udf("array<int>")
    def encode(vecs):
        import pandas as pd

        x = np.vstack(vecs.map(np.asarray, na_action=None).to_numpy()).astype(
            np.float64
        )
        # sequential-fold normalization — ((0 + x0²) + x1²) + … per
        # row, NOT np.linalg.norm (pairwise summation): the add order
        # must match the Column-side norm() fold and the DuckDB
        # oracle's list_reduce so normalized components are
        # bit-identical across engines (the q_pq_topk/q_ivfpq
        # hash-exact graduation).  Zero-guard mirrors with_unit.
        ss = np.zeros(x.shape[0], dtype=np.float64)
        for i in range(x.shape[1]):
            ss = ss + x[:, i] * x[:, i]
        nrm = np.sqrt(ss)
        x = x / np.where(nrm == 0.0, 1.0, nrm)[:, None]
        codes = np.empty((x.shape[0], m), dtype=np.int32)
        for mi in range(m):
            s = x[:, mi * sub : (mi + 1) * sub]
            # (batch, k) squared distances, accumulated one subspace
            # dim at a time (same sequential order as the oracle's
            # explicit term sum); stable argmin = lowest j wins
            d2 = np.zeros((x.shape[0], cents[mi].shape[0]), dtype=np.float64)
            for i in range(sub):
                diff = s[:, i][:, None] - cents[mi][None, :, i]
                d2 = d2 + diff * diff
            codes[:, mi] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return emb.select(id_col, encode(as_double(vec)).alias("codes"))


def _adc_luts(qv, centroids: list[list[list[float]]]) -> list[list[float]]:
    """Per-query ADC lookup tables: luts[mi][j] = <query subvector mi,
    codebook centroid j> — m×k floats, computed driver-side (the query
    set is small by contract)."""
    m = len(centroids)
    sub = len(centroids[0][0])
    return [
        [
            float(sum(qv[mi * sub + i] * centroids[mi][j][i] for i in range(sub)))
            for j in range(len(centroids[mi]))
        ]
        for mi in range(m)
    ]


def _adc_score_col(codes_col: str = "codes") -> Column:
    """ADC score from a broadcast ``luts array<array<double>>`` column
    zipped against the candidate's ``codes array<int>``: left-fold sum
    of luts[mi][codes[mi]] — the same sequential add order as the
    literal-LUT chain, so both strategies are bit-identical."""
    from shadems_spark.operators.exprcache import memo

    def _build():
        picked = F.zip_with(
            F.col("luts"), F.col(codes_col),
            lambda lut, c: F.element_at(lut, c + 1),
        )
        return F.aggregate(picked, F.lit(0.0), lambda s, x: s + x)

    return memo(("adc_score", codes_col), _build)


#: above this many queries the literal-LUT strategy's plan cost
#: (m*k literals + one TakeOrdered job PER query, unioned) dominates —
#: switch to the broadcast-LUT join, whose plan size and job count are
#: flat in |queries| (ADVICE r03 / VERDICT r03 'What's wrong' #3).
LUT_JOIN_THRESHOLD = 8


def pq_topk(
    emb: DataFrame,
    centroids: list[list[list[float]]],
    k: int = 3,
    id_col: str = "vec_id",
    vec: str = "embedding",
    query_mod: int = 100,
    lut_strategy: str = "auto",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: each query's exact subvectors
    dot the candidates' centroid codes through a per-query lookup
    table — scoring touches only the m int codes per candidate (never
    the raw vectors), so the scan payload is the compressed table.

    Two physical strategies, identical results (parity pinned in
    tests/test_retrieval.py):

    - ``literal`` (small query sets): LUTs folded into the plan as
      literals, one TakeOrdered job per query over a shared persisted
      code table.  Plan size is O(|queries|·m·k) — fine for a handful
      of queries, Catalyst-analysis-bound beyond that.
    - ``join`` (default above LUT_JOIN_THRESHOLD queries): LUTs ship
      as a broadcast (q_id, luts) table; ONE broadcast join over the
      code table + a per-q_id rank window.  One job and a
      constant-size plan regardless of query count, and the code
      table is consumed exactly once so it needs no persist/unpersist
      lifecycle at all."""
    m = len(centroids)
    qrows = (
        with_unit(
            emb.filter(F.col(id_col) % query_mod == 0), vec, "qv"
        )
        .select(F.col(id_col).alias("q_id"), "qv")
        .collect()
    )
    if not qrows:
        return emb.sparkSession.createDataFrame(
            [], "q_id long, cand_id long, adc_score double"
        )
    use_join = lut_strategy == "join" or (
        lut_strategy == "auto" and len(qrows) > LUT_JOIN_THRESHOLD
    )

    if use_join:
        codes = pq_encode(emb, centroids, vec, id_col)
        luts = emb.sparkSession.createDataFrame(
            [(qr["q_id"], _adc_luts(qr["qv"], centroids)) for qr in qrows],
            "q_id long, luts array<array<double>>",
        )
        scored = (
            codes.join(F.broadcast(luts), F.col(id_col) != F.col("q_id"))
            .select(
                "q_id",
                F.col(id_col).alias("cand_id"),
                F.round(_adc_score_col(), 6).alias("adc_score"),
            )
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("adc_score").desc(), F.col("cand_id")
        )
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k)
            .drop("__r")
        )

    from shadems_spark.operators.dedup import tracked_persist

    from shadems_spark.operators.exprcache import memo

    codes = tracked_persist(pq_encode(emb, centroids, vec, id_col), key="pq_codes")
    outs = []
    for qr in qrows:
        luts = _adc_luts(qr["qv"], centroids)

        def _lut_score(luts=luts):
            score = F.lit(0.0)
            for mi in range(m):
                lut = F.array(*[F.lit(x) for x in luts[mi]])
                score = score + F.element_at(
                    lut, F.element_at("codes", mi + 1) + 1
                )
            return score

        # keyed on the LUT VALUES (the r11 ivf_best rule: the collect
        # + pq_train jobs that produce them still run every build, so
        # nothing data-dependent is skipped — VERDICT r11 #3)
        score = memo(
            ("pq_lut", tuple(tuple(r) for r in luts)), _lut_score
        )
        scored = codes.filter(F.col(id_col) != qr["q_id"]).select(
            F.lit(qr["q_id"]).alias("q_id"),
            F.col(id_col).alias("cand_id"),
            F.round(score, 6).alias("adc_score"),
        )
        outs.append(
            scored.orderBy(F.col("adc_score").desc(), F.col("cand_id")).limit(k)
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def ivfpq_topk(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 32,
    pq_k: int = 16,
    query_mod: int = 100,
    lut_strategy: str = "auto",
) -> DataFrame:
    """IVF+PQ (IVFADC) — the layout billion-vector ANN actually ships:
    a coarse quantizer routes each vector to a cell (inverted list),
    vectors are stored as PQ codes, and a query scans only its
    ``n_probe`` nearest cells scoring codes by asymmetric distance.

    Work per query = (n_probe/n_cells) of the collection x m code
    lookups; storage = m ints + 1 cell id per vector.  Both index
    passes (assign + encode) share one scan each and the code table is
    persisted across queries.  Composes the existing deterministic
    pieces: sample_centroids/ivf_assign (coarse) + pq_train/pq_encode
    (fine) — no new sampling or RNG anywhere.  The coarse sample rides
    the cross-engine affine id hash (sampler="xe", the q_ann_ivf
    bridge) so the DuckDB oracle replays centroid selection exactly."""
    cents = sample_centroids(emb, k=n_cells, id_col=id_col, vec=vec, sampler="xe")
    cb = pq_train(emb, vec=vec, id_col=id_col, m=m, k=pq_k)
    sub = len(cb[0][0])

    assigned = ivf_assign(
        emb.select(F.col(id_col).alias("cand_id"), as_double(vec).alias("c_vec")),
        cents,
    ).select("cand_id", "cell")
    code_table = (
        pq_encode(emb, cb, vec=vec, id_col=id_col)
        .withColumnRenamed(id_col, "cand_id")
        .join(assigned, "cand_id")
    )

    qrows = (
        with_unit(
            emb.filter(F.col(id_col) % query_mod == 0), vec, "qv"
        )
        .select(F.col(id_col).alias("q_id"), "qv")
        .collect()
    )
    if not qrows:
        return emb.sparkSession.createDataFrame(
            [], "q_id long, cand_id long, cell int, adc_score double"
        )
    import math

    def _probe(qv) -> list[int]:
        # probe cells by centroid cosine (centroids unit-normalized);
        # sequential Python arithmetic — NOT a BLAS dot — so the fold
        # order matches the DuckDB oracle's list_reduce replay exactly
        # (ties -> lowest cell, mirroring the SQL ORDER BY)
        sims = []
        for c in cents:
            n = math.sqrt(sum(x * x for x in c)) or 1.0
            sims.append(sum(q * (x / n) for q, x in zip(qv, c)))
        return sorted(range(len(sims)), key=lambda i: (-sims[i], i))[:n_probe]

    use_join = lut_strategy == "join" or (
        lut_strategy == "auto" and len(qrows) > LUT_JOIN_THRESHOLD
    )

    if use_join:
        luts = emb.sparkSession.createDataFrame(
            [
                (
                    qr["q_id"],
                    _adc_luts(qr["qv"], cb),
                    _probe(qr["qv"]),
                )
                for qr in qrows
            ],
            "q_id long, luts array<array<double>>, probe array<int>",
        )
        # explode the probe list to (q_id, cell) rows and equi-join on
        # cell: a BroadcastHashJoin that routes each code row straight
        # to the queries probing its cell, instead of a
        # BroadcastNestedLoopJoin evaluating array_contains over every
        # (code row x query) pair — |C|·|Q| predicate evals (4e8 at
        # the x100 probe) collapse to hash lookups; the scored-row
        # count is identical, so results are too (parity pinned in
        # test_pq_lut_join_matches_literal).
        probes = luts.select(
            "q_id", "luts", F.explode("probe").alias("cell")
        )
        scored = (
            code_table.join(F.broadcast(probes), "cell")
            .filter(F.col("cand_id") != F.col("q_id"))
            .select(
                "q_id",
                "cand_id",
                "cell",
                F.round(_adc_score_col(), 6).alias("adc_score"),
            )
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("adc_score").desc(), F.col("cand_id")
        )
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k)
            .drop("__r")
        )

    from shadems_spark.operators.dedup import tracked_persist

    codes = tracked_persist(code_table, key="ivfpq_codes")
    outs = []
    for qr in qrows:
        qv = qr["qv"]
        probe = _probe(qv)
        luts = _adc_luts(qv, cb)
        score = F.lit(0.0)
        for mi in range(len(cb)):
            lut = F.array(*[F.lit(x) for x in luts[mi]])
            score = score + F.element_at(lut, F.element_at("codes", mi + 1) + 1)
        scored = (
            codes.filter(F.col("cell").isin(probe))
            .filter(F.col("cand_id") != qr["q_id"])
            .select(
                F.lit(qr["q_id"]).alias("q_id"),
                F.col("cand_id"),
                F.col("cell"),
                F.round(score, 6).alias("adc_score"),
            )
        )
        outs.append(
            scored.orderBy(F.col("adc_score").desc(), F.col("cand_id")).limit(k)
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def pq_refine(
    emb: DataFrame,
    centroids: list[list[list[float]]],
    vec: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 1,
) -> list[list[list[float]]]:
    """One-or-more Lloyd iterations over every subspace jointly:
    re-encode, explode each vector into its m (subspace, code,
    position, value) cells, and average per (subspace, code, position)
    — a single partial-aggregable shuffle of n*d fixed-width rows per
    iteration, no driver data collection beyond the m*k*(d/m)-float
    codebook itself.  Empty cells keep their previous centroid (the
    standard k-means dead-cell rule)."""
    m = len(centroids)
    sub = len(centroids[0][0])
    for _ in range(iters):
        codes = pq_encode(emb, centroids, vec, id_col)
        uv = with_unit(emb.select(id_col, vec), vec, "uv").select(id_col, "uv")
        cells = (
            codes.join(uv, id_col)
            .select(
                F.posexplode(
                    F.array(
                        *[
                            F.struct(
                                F.element_at("codes", mi + 1).alias("code"),
                                F.slice("uv", mi * sub + 1, sub).alias("sv"),
                            )
                            for mi in range(m)
                        ]
                    )
                ).alias("mi", "cell")
            )
            .select("mi", F.col("cell.code").alias("code"),
                    F.posexplode(F.col("cell.sv")).alias("pos", "val"))
        )
        means = (
            cells.groupBy("mi", "code", "pos")
            .agg(F.avg("val").alias("mu"))
            .collect()
        )
        new = [
            [[centroids[mi][j][i] for i in range(sub)] for j in range(len(centroids[mi]))]
            for mi in range(m)
        ]
        for r in means:
            new[r["mi"]][r["code"]][r["pos"]] = float(r["mu"])
        centroids = new
    return centroids


def exemplar_assign(
    e: DataFrame,
    n_clusters: int,
    brute: bool = False,
) -> DataFrame:
    """EXACT nearest-exemplar assignment for :func:`semdedup` — every
    row of ``e`` (columns vid, v) gets its max-cosine exemplar among
    the rows with vid < n_clusters.  Returns (vid, v, cluster_id,
    c_cos, nv) with c_cos 6dp-rounded and ties broken to the smallest
    exemplar id, bit-identical to the brute argmax at ANY scale.

    The scale path (default) is the IVF probe shape with an
    Elkan-style triangle-inequality filter (Elkan ICML'03; the same
    bound IVF implementations use for exact re-ranking), so it stays
    EXACT — the oracle contract — while pruning most exemplar
    comparisons when the space is clustered:

    - a deterministic ~sqrt(k) subset of the exemplars becomes the
      coarse quantizer (collected driver-side: <= sqrt(k) rows even at
      the paper's k=50k — codebook-sized driver state);
    - exemplars are assigned to their nearest coarse cell by angle
      (literal-array projection, O(k*sqrt(k)) on the k-row table) and
      each cell's angular RADIUS r_c = max angle(center, member) rides
      one broadcast map row;
    - each data row computes its angle to every coarse center
      (O(sqrt(k)) literal dots), a reachable LOWER bound on its best
      cosine, LB = max_c cos(theta_c + r_c) (every cell is nonempty —
      its center is its own member), and keeps only cells whose UPPER
      bound cos(max(0, theta_c - r_c)) >= LB - 1e-6 (the 1e-6 slack
      covers the 6dp output rounding, so an exemplar that ties the
      best AFTER rounding is never pruned);
    - candidates = (row x exemplars of surviving cells) via a
      broadcast join, reduced by map-side-combined max_by — no n*k-row
      shuffle and no window sort anywhere (the r5 brute form pushed
      n*k rows through a per-vid row_number window: the measured
      115x at the x100/k=800 probe).

    acos/cos here are pruning-internal only — they never reach the
    output, so libm differences cannot move the result (the filter is
    conservative on both engines' IEEE doubles: inputs are clamped to
    [-1, 1] and the bound is relaxed by the rounding slack).

    ``brute=True`` keeps the all-pairs broadcast-join + max_by form
    (no window, still no n*k shuffle) — the parity twin the tests
    compare against."""
    import math

    k = n_clusters
    e = e.withColumn("nv", norm(F.col("v")))
    cents = e.filter(F.col("vid") < k).select(
        F.col("vid").alias("c_id"), F.col("v").alias("cv"),
        F.col("nv").alias("cnv"),
    )

    def reduce_best(pairs: DataFrame) -> DataFrame:
        sel = F.max_by(
            F.struct("c_id", "c_cos", "v", "nv"),
            F.struct(F.col("c_cos"), (-F.col("c_id")).alias("nid")),
        ).alias("b")
        return pairs.groupBy("vid").agg(sel).select(
            "vid", F.col("b.v").alias("v"),
            F.col("b.c_id").alias("cluster_id"),
            F.col("b.c_cos").alias("c_cos"), F.col("b.nv").alias("nv"),
        )

    c_cos = F.round(
        dot(F.col("v"), F.col("cv")) / (F.col("nv") * F.col("cnv")), 6
    )
    if brute:
        return reduce_best(
            e.join(F.broadcast(cents), F.lit(True)).withColumn("c_cos", c_cos)
        )

    n_coarse = max(1, math.isqrt(k))
    step = -(-k // n_coarse)
    coarse_rows = sorted(
        (int(r["vid"]), list(r["v"]))
        for r in e.filter(
            F.col("vid").isin(list(range(0, k, step)))
        ).select("vid", "v").collect()
    )
    coarse = [_unit([float(x) for x in v]) for _, v in coarse_rows]
    if not coarse:
        # no exemplars at all (empty input): the brute join is empty
        # and cheap — and F.array() of zero literals has VOID type,
        # which the HOF lambdas below cannot consume.
        return reduce_best(
            e.join(F.broadcast(cents), F.lit(True)).withColumn("c_cos", c_cos)
        )

    from shadems_spark.operators.exprcache import memo

    ckey = tuple(tuple(c) for c in coarse)

    def theta_arr(vcol: Column, nvcol: Column, kname: str) -> Column:
        """array<struct<th double, cell int>>: clamped angle to every
        coarse center (centers unit-normalized driver-side).  Memoized
        on the coarse-center VALUES + the column names (the collect
        that produced the centers still runs every build)."""

        def _build():
            return F.array(*[
                F.struct(
                    F.acos(
                        F.greatest(
                            F.lit(-1.0),
                            F.least(
                                F.lit(1.0),
                                dot(vcol, F.array(*[F.lit(x) for x in cv]))
                                / nvcol,
                            ),
                        )
                    ).alias("th"),
                    F.lit(ci).alias("cell"),
                )
                for ci, cv in enumerate(coarse)
            ])

        return memo(("sd_theta", ckey, kname), _build)

    eassign = cents.withColumn(
        "__best",
        F.element_at(F.array_sort(F.transform(
            theta_arr(F.col("cv"), F.col("cnv"), "cv"),
            lambda t: F.struct(t["th"].alias("th"), t["cell"].alias("cell")),
        )), 1),
    ).select(
        "c_id", "cv", "cnv",
        F.col("__best.cell").alias("cell"), F.col("__best.th").alias("th"),
    )
    radii = eassign.groupBy("cell").agg(F.max("th").alias("r")).agg(
        F.map_from_entries(
            F.collect_list(F.struct("cell", "r"))
        ).alias("__rmap")
    )
    ta = theta_arr(F.col("v"), F.col("nv"), "v")
    rm = F.col("__rmap")
    # cos is decreasing only on [0, pi]: cap the summed angle there,
    # else a sum past pi would RAISE the bound and wrongly prune.
    lb = F.array_max(F.transform(
        "__ta",
        lambda t: F.cos(F.least(
            t["th"] + F.element_at(rm, t["cell"]), F.lit(math.pi)
        )),
    ))
    cand = F.filter(
        "__ta",
        lambda t: F.cos(
            F.greatest(t["th"] - F.element_at(rm, t["cell"]), F.lit(0.0))
        ) >= F.col("__lb") - F.lit(1e-6),
    )
    probed = (
        e.crossJoin(F.broadcast(radii))
        .withColumn("__ta", ta)
        .withColumn("__lb", lb)
        .select(
            "vid", "v", "nv",
            F.explode(F.transform(cand, lambda t: t["cell"])).alias("cell"),
        )
    )
    pairs = probed.join(
        F.broadcast(eassign.select("cell", "c_id", "cv", "cnv")), "cell"
    ).withColumn("c_cos", c_cos)
    return reduce_best(pairs)


def semdedup(
    emb: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec: str = "embedding",
    brute_assign: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then drop any
    member whose cosine to a lower-id member of the SAME cluster
    meets ``threshold``.  Fully declarative — no UDF, no iteration.

    Spark-first shape and the 100-TB contract:

    - exemplar centroids are the ``n_clusters`` smallest ids — a
      deterministic closed-form seed rule so the pipeline has an exact
      DuckDB oracle; production runs swap in ``sample_centroids`` +
      ``refine_centroids`` (the IVF Lloyd step) where cross-engine
      bit-parity is not required;
    - assignment rides the IVF probe path (:func:`exemplar_assign`):
      an Elkan triangle-inequality filter over a ~sqrt(k) coarse
      quantizer prunes exemplar comparisons while staying EXACT (the
      oracle contract), and the candidate reduction is a map-side-
      combined max_by — the corpus is scanned once, never pushed
      through an n*k-row window (the r5 115x at the x100/k=800
      probe);
    - the near-dup scan self-joins ONLY within a cluster (shuffle
      key = cluster_id), so candidate pairs are O(sum cluster_size^2)
      — the SemDeDup trade.  At 100 TB you bound cluster size by
      raising ``n_clusters`` (size ~ n/k; the paper runs k=50k on
      LAION) — pair cost per cluster then falls quadratically;
    - the keep rule "drop x iff ANY y < x in-cluster has
      cos >= threshold" is the conservative pair-based variant
      (similarity chains collapse to their lowest id; a sequential
      greedy scan would re-instate chain members whose predecessor
      was itself dropped).  It is one distinct + one anti-join — no
      iteration — and errs toward dropping more, the safe direction
      for dedup.

    Returns kept rows: (id_col, cluster_id, c_cos) where c_cos is the
    rounded cosine to the assigned exemplar.
    """
    e = emb.select(F.col(id_col).alias("vid"), as_double(vec).alias("v"))
    from shadems_spark.operators.dedup import tracked_persist

    # assigned feeds three consumers (both sides of the pair join and
    # the final anti-join); persisting trades one materialization of
    # (id, vec, cluster) rows for two recomputes of the assignment.
    # nv carries each vector's norm from the assignment pass
    # (bit-identical to the per-pair recompute — same fold), halving
    # per-pair flops in the quadratic stage below.
    assigned = tracked_persist(
        exemplar_assign(e, n_clusters, brute=brute_assign),
        key="semdedup_assigned",
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    pair_cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nv") * F.col("b.nv"))
    dropped = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("b.vid") < F.col("a.vid")),
        )
        .filter(F.round(pair_cos, 6) >= threshold)
        .select(F.col("a.vid").alias("vid"))
        .distinct()
    )
    return (
        assigned.join(dropped, "vid", "left_anti")
        .select(F.col("vid").alias(id_col), "cluster_id", "c_cos")
        .orderBy(id_col)
    )


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> tuple[list[list[int]], list[int]]:
    """Distributed k-means (Lloyd) with the cross-engine exactness
    protocol: the iterative clustering primitive behind SemDeDup-style
    curation at scale, as train-on-aggregates (each iteration = one
    assignment projection + ONE map-side-combined (cell, dim) integer
    aggregate; driver state = the k x d micro-int codebook, the
    IVF-centroid precedent).

    Exactness (same family as train_quality_lr's nano-int gradients):
    centroids are MICRO-SCALED INTEGERS.  Assignment computes squared
    distance row-locally (sequential fold over dims — both engines
    evaluate the identical operation order), rounds it at 6dp, and
    argmins with ties to the lowest cell id; the update sums
    micro-int vector components exactly (order-free) and floors the
    mean.  Every iteration is therefore bit-identical on Spark, on
    the unrolled-CTE DuckDB oracle, and under any partition layout.

    Init = the first k vectors by id (deterministic); empty cells
    keep their previous centroid (standard Lloyd fix).  Returns
    (centroids as micro-int lists, final cluster sizes)."""
    base = emb.select(
        F.col(id_col).alias("vid"),
        as_double(vec).alias("v"),
    ).withColumn(
        "vm",
        F.transform(
            F.col("v"), lambda x: F.round(x * F.lit(1_000_000.0)).cast("long")
        ),
    ).persist()
    init = base.filter(F.col("vid") < k).orderBy("vid").select("vm").collect()
    cents: list[list[int]] = [list(r["vm"]) for r in init]
    sizes: list[int] = [0] * k
    for _ in range(iters):
        score_structs = []
        for i, cm in enumerate(cents):
            carr = F.array(*[F.lit(int(c)) / F.lit(1_000_000.0) for c in cm])
            d2 = F.aggregate(
                F.zip_with(F.col("v"), carr, lambda x, c: (x - c) * (x - c)),
                F.lit(0.0),
                lambda a, b: a + b,
            )
            score_structs.append(
                F.struct(F.round(d2, 6).alias("d"), F.lit(i).alias("cell"))
            )
        best = F.element_at(F.array_sort(F.array(*score_structs)), 1)["cell"]
        stats = (
            base.withColumn("cell", best)
            .select("cell", F.posexplode("vm").alias("pos0", "xm"))
            .groupBy("cell", "pos0")
            .agg(F.sum("xm").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        import math

        sizes = [0] * k
        new_cents = [list(c) for c in cents]  # empty cells keep previous
        for r in stats:
            cell, pos = int(r["cell"]), int(r["pos0"])
            new_cents[cell][pos] = math.floor(r["s"] / r["n"])
            sizes[cell] = int(r["n"])
        cents = new_cents
    base.unpersist()
    return cents, sizes
