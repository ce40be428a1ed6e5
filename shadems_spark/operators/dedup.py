"""Deduplication operators (SURVEY.md §2 M1/M2 + north-star dedup
suite): exact, MinHash+LSH banding, SimHash block-bucketed, exact
n-gram Jaccard verification, and embedding-cosine near-dup.

Scale design (per the distributed set-similarity-join literature in
PAPERS.md): candidate generation NEVER compares all pairs — LSH bands
/ signature blocks / label buckets bound each join key's bucket, and
verification runs only on candidates.  All hashing is Spark's
xxhash64 (fixed seed, deterministic across runs/executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from shadems_spark.operators.text import ngram_hashes, words


def exact_dedup(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """M1: exact dedup — group identical texts (hash-groupBy), keep
    the lowest id as canonical.  sha2 pre-hash keeps the shuffle key
    narrow at 100 TB (no full-text shuffle)."""
    return (
        df.withColumn("__h", F.sha2(F.col(text), 256))
        .groupBy("__h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("__h")
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text: str = "text",
    n_hashes: int = 32, ngram: int = 3,
) -> DataFrame:
    """MinHash signature per document, exploded-aggregate form: one
    row per (doc, shingle), each shingle hashed n_hashes times ONCE,
    then a partial/final hash aggregate of per-hash minima.

    This is the distributed-minhash shape that scales: the inline
    per-row alternative (array_min over transform, repeated per hash)
    re-evaluates the shingle array n_hashes times per row — measured
    ~20x slower at sf0.1.  Here map-side combine reduces each
    partition to one partial signature per doc before the shuffle,
    and collect_list carries the (distinct) shingle set through the
    same single shuffle for the verify stage.

    Shingles are 64-bit gram hashes (text.ngram_hashes), so the
    n_hashes min-hash family is xxhash64(h, j) over two longs — far
    cheaper than re-hashing the gram string per hash function, and the
    carried shingle sets are fixed-width longs, not strings."""
    shingled = df.select(id_col, ngram_hashes(words(text), ngram).alias("shingles"))
    ex = shingled.select(id_col, F.explode("shingles").alias("s"))
    mins = [
        F.min(F.xxhash64(F.col("s"), F.lit(j))).alias(f"h{j}")
        for j in range(n_hashes)
    ]
    agg = ex.groupBy(id_col).agg(*mins, F.collect_list("s").alias("shingles"))
    return agg.select(
        id_col,
        F.array(*[F.col(f"h{j}") for j in range(n_hashes)]).alias("sig"),
        "shingles",
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 8, rows: int = 4
) -> DataFrame:
    """M2 banding: hash each band of the signature; docs sharing any
    (band, band_hash) bucket are candidates.  The join key is the
    bucket — skew-bounded by band width, never all-pairs."""
    banded = sigs.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.element_at("sig", b * rows + r + 1) for r in range(rows)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, sigs: DataFrame, id_col: str = "doc_id", threshold: float = 0.2
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only (array_intersect
    over the stored shingle sets)."""
    s1 = sigs.select(F.col(id_col).alias("id1"), F.col("shingles").alias("sh1"))
    s2 = sigs.select(F.col(id_col).alias("id2"), F.col("shingles").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2")).cast("double")
    union = (F.size("sh1") + F.size("sh2")).cast("double") - inter
    return (
        pairs.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def minhash_dedup(
    df: DataFrame, id_col: str = "doc_id", text: str = "text", threshold: float = 0.2
) -> DataFrame:
    """M2 end-to-end: shingle -> minhash -> band -> bucket-join ->
    exact-Jaccard verify.

    The signature table feeds three operators (banding + both sides of
    the verify join); persisting it trades one small materialization
    (one row per doc, ~narrow) for recomputing the shingle scan three
    times — the right trade at any scale since sigs ≪ corpus."""
    sigs = minhash_signatures(df, id_col, text).persist()
    cands = lsh_candidate_pairs(sigs, id_col)
    return jaccard_verify(cands, sigs, id_col, threshold)


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text: str = "text", bits: int = 64
) -> DataFrame:
    """SimHash: sign-sum of word-hash bits.  Explode words, one
    conditional sum per bit (JVM codegen), reassemble the signature
    and its 4 x 16-bit blocks for bucketed candidate search."""
    toks = df.select(id_col, F.explode(words(text)).alias("w")).withColumn(
        "h", F.xxhash64("w")
    )
    bit_sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)  # bit 63 wraps to the sign bit, as intended
        sig = term if sig is None else sig.bitwiseOR(term)
    return bit_sums.select(id_col, sig.alias("simhash"))


def simhash_candidates(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Near-dup candidates: docs sharing any 16-bit block of the
    signature (guarantees recall for hamming distance <= 3)."""
    blocks = sigs.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(*[F.shiftright(F.col("simhash"), 16 * b).bitwiseAND(F.lit(0xFFFF)) for b in range(4)])
        ).alias("blk", "blk_val"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .distinct()
    )
    return pairs.withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
