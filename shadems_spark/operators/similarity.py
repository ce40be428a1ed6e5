"""Similarity search over embedding columns (SURVEY.md §2 M3):
brute-force cosine top-k as the exact baseline, and a random-
hyperplane LSH-bucketed variant as the 100 TB scale path.

Dot products are `zip_with` + `aggregate` — JVM higher-order
functions, sequential fold, deterministic; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("q_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
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
        return pd.Series(list(np.round(cos, 6)))

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


def hyperplane_bucket(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of dot(v, plane_j).
    Planes are fixed literals (seeded SplitMix64 -> [-1, 1]) — every
    executor sees identical planes with no broadcast state and the
    expression tree stays small (n_planes literal arrays)."""
    bucket = None
    for j in range(n_planes):
        comps = [
            (_splitmix64(j * 1024 + i) % 2001) / 1000.0 - 1.0 for i in range(dim)
        ]
        plane = F.array(*[F.lit(c) for c in comps])
        d = dot(vec, plane)
        bit = F.when(d > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        bucket = term if bucket is None else bucket.bitwiseOR(term)
    return bucket


def lsh_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec: str = "embedding", n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket — the scale path (bucket join instead of full cross join;
    recall traded via n_planes)."""
    dim = 64
    c = emb.select(
        F.col(id_col).alias("cand_id"),
        as_double(vec).alias("c_vec"),
    ).withColumn("bucket", hyperplane_bucket(F.col("c_vec"), n_planes, dim))
    q = queries.select(
        F.col(id_col).alias("q_id"), as_double(vec).alias("q_vec")
    ).withColumn("bucket", hyperplane_bucket(F.col("q_vec"), n_planes, dim))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("q_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "bucket", "cand_id", "cos", "rank")
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
    scores = F.array(
        *[
            F.struct(
                (-dot(F.col(vec), F.array(*[F.lit(x) for x in _unit(c)]))).alias("neg"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.element_at(F.array_sort(scores), 1)
    return emb.withColumn("cell", best["cell"])


def sample_centroids(
    emb: DataFrame, k: int = 8, id_col: str = "vec_id", vec: str = "embedding"
) -> list[list[float]]:
    """Deterministic coarse centroids: the k ids hashing lowest — a
    uniform, order-free sample in ONE pass (TakeOrderedAndProject; no
    count job, no full sort).  A k-means refinement would iterate
    ivf_assign + groupBy(cell).avg — the sampled quantizer is enough
    to bound the search to O(rows/k) per probe, the scale property."""
    rows = (
        emb.orderBy(F.xxhash64(F.col(id_col)))
        .limit(k)
        .select(as_double(vec).alias("v"))
        .collect()
    )
    return [list(r["v"]) for r in rows]


def ivf_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec: str = "embedding",
    n_cells: int = 8, n_probe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the collection once,
    probe the query's ``n_probe`` nearest cells — candidates are
    O(n_probe/n_cells) of the collection instead of all of it.

    The probe set is a tiny exploded (q_id, cell) frame broadcast into
    the candidate join, so the big side is scanned once and never
    shuffled."""
    cents = sample_centroids(emb, k=n_cells, id_col=id_col, vec=vec)
    c = ivf_assign(
        emb.select(F.col(id_col).alias("cand_id"), as_double(vec).alias("c_vec")),
        cents,
    )
    # per query: rank all cells by centroid cosine, keep n_probe
    q = queries.select(F.col(id_col).alias("q_id"), as_double(vec).alias("q_vec"))
    probe_cols = []
    for i, cent in enumerate(cents):
        cvec = F.array(*[F.lit(float(x)) for x in cent])
        probe_cols.append(F.struct(cosine(F.col("q_vec"), cvec).alias("cos"), F.lit(i).alias("cell")))
    probes = q.withColumn(
        "__p",
        F.explode(F.slice(F.reverse(F.array_sort(F.array(*probe_cols))), 1, n_probe)),
    ).select("q_id", "q_vec", F.col("__p.cell").alias("cell"))
    scored = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("cand_id") != F.col("q_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "cell", "cand_id", "cos", "rank")
    )


def embedding_near_dup(
    emb: DataFrame, id_col: str = "vec_id", vec: str = "embedding",
    bucket_col: str = "label", threshold: float = 0.99,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking bucket
    (coarse cluster / label) — the IVF-style "only compare within the
    cell" pattern."""
    side = lambda tag: emb.select(
        F.col(bucket_col).alias("bkt"),
        F.col(id_col).alias(f"id{tag}"),
        as_double(vec).alias(f"v{tag}"),
    )
    pairs = side(1).join(side(2), "bkt").filter(F.col("id1") < F.col("id2"))
    return (
        pairs.withColumn("cos", F.round(cosine(F.col("v1"), F.col("v2")), 4))
        .filter(F.col("cos") >= threshold)
        .select("bkt", "id1", "id2", "cos")
    )
