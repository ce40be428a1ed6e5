"""Incremental corpus-maintenance queries: merge/upsert and
batch-vs-corpus dedup (operators/incremental.py).

The reference has no write path at all ([R] shade_ms — read-only
plotter); these queries cover the north-star pipeline's snapshot
maintenance: admit a new batch by MERGE, dedup it against the
resident corpus without reprocessing the corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.operators.incremental import (
    incremental_embedding_near_dup,
    incremental_jaccard,
    merge_upsert,
)
from shadems_spark.operators.similarity import hyperplane_bucket_sql
from shadems_spark.queries import register

#: far above any o_orderkey at test scale factors.
_INSERT_SHIFT = 100_000_000

#: DuckDB mirror of q_incremental_embedding (same plane literals).
_EMB_ADMIT_SQL = f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
               FROM embeddings),
    h AS (SELECT vec_id, v, {hyperplane_bucket_sql("v", 2, 64)} AS hp FROM e),
    n AS (SELECT vec_id AS new_id, v AS nv, hp FROM h WHERE vec_id % 10 = 0),
    c AS (SELECT vec_id AS corpus_id, v AS cv, hp FROM h WHERE vec_id % 10 != 0)
    SELECT new_id, corpus_id,
           round(list_sum(list_transform(list_zip(nv, cv), z -> z[1] * z[2]))
                 / (sqrt(list_sum(list_transform(nv, x -> x*x)))
                    * sqrt(list_sum(list_transform(cv, x -> x*x)))), 4) AS cos
    FROM n JOIN c USING (hp)
    WHERE round(list_sum(list_transform(list_zip(nv, cv), z -> z[1] * z[2]))
                / (sqrt(list_sum(list_transform(nv, x -> x*x)))
                   * sqrt(list_sum(list_transform(cv, x -> x*x)))), 4) >= 0.3
"""


@register(
    "q_merge_upsert",
    sql=f"""
    WITH base AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
    ),
    upd AS (
        SELECT o_orderkey, o_orderpriority, round(o_totalprice + 1000.0, 2) AS o_totalprice
        FROM orders WHERE o_orderkey % 100 = 0
    ),
    ins AS (
        SELECT o_orderkey + {_INSERT_SHIFT} AS o_orderkey, o_orderpriority, o_totalprice
        FROM orders WHERE o_orderkey % 500 = 0
    ),
    updates AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
    merged AS (
        SELECT * FROM base
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        UNION ALL SELECT * FROM updates
    )
    SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM merged GROUP BY o_orderpriority
    """,
)
def q_merge_upsert(spark, sf_dir):
    """MERGE semantics as an algebraic rewrite (anti-join + union):
    modified rows win by key, untouched base rows survive, new keys
    insert.  The anti join broadcasts the (small) batch side under
    AQE, so the resident side never shuffles."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = orders.filter(F.col("o_orderkey") % 10 == 0)
    upd = orders.filter(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") + 1000.0, 2)
    )
    ins = orders.filter(F.col("o_orderkey") % 500 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + _INSERT_SHIFT
    )
    merged = merge_upsert(base, upd.unionByName(ins), "o_orderkey")
    return merged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "q_incremental_dedup",
    sql="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_distinct([ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                                       for i in range(len(ws) - 2)])) AS ng
          FROM w),
    s AS (SELECT doc_id, count(*) sz FROM g GROUP BY doc_id),
    inter AS (SELECT a.doc_id new_id, b.doc_id corpus_id, count(*) c
              FROM g a JOIN g b ON a.ng = b.ng
              WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
              GROUP BY 1, 2)
    SELECT new_id, corpus_id,
           round(c / (sa.sz + sb.sz - c), 6) AS jaccard
    FROM inter
    JOIN s sa ON new_id = sa.doc_id
    JOIN s sb ON corpus_id = sb.doc_id
    WHERE c / (sa.sz + sb.sz - c) >= 0.2
    """,
)
def q_incremental_dedup(spark, sf_dir):
    """Admission dedup: exact n-gram Jaccard of a NEW batch (doc_id %
    5 = 0) against the RESIDENT corpus (the rest) — join shape is
    new×corpus, never corpus×corpus.  Grams join by 64-bit hash;
    identical counts absent xxhash64 collisions (oracle confirms)."""
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return incremental_jaccard(new, corpus, threshold=0.2)


@register(
    "q_incremental_embedding",
    sql=_EMB_ADMIT_SQL,
)
def q_incremental_embedding(spark, sf_dir):
    """Embedding-batch admission: new (vec_id % 10 = 0) × resident
    corpus cosine near-dup, blocked on the shared 2-plane hyperplane
    bucket — the join is new×corpus, never corpus×corpus, and each new
    vector scores ~corpus/4 candidates.  Oracle applies identical
    plane literals (similarity.hyperplane_bucket_sql)."""
    emb = load_table(spark, sf_dir, "embeddings")
    new = emb.filter(F.col("vec_id") % 10 == 0)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    return incremental_embedding_near_dup(new, corpus, threshold=0.3)


@register(
    "q_snapshot_diff",
    sql="""
    WITH a AS (SELECT lang, count(*) n_a FROM documents
               WHERE doc_id % 3 != 0 GROUP BY lang),
    b AS (SELECT lang, count(*) n_b FROM documents GROUP BY lang)
    SELECT lang,
           coalesce(n_a, 0) AS n_a,
           coalesce(n_b, 0) AS n_b,
           coalesce(n_b, 0) - coalesce(n_a, 0) AS delta,
           round(coalesce(n_b, 0) / CAST((SELECT count(*) FROM documents) AS DOUBLE)
                 - coalesce(n_a, 0)
                   / CAST((SELECT count(*) FROM documents WHERE doc_id % 3 != 0)
                          AS DOUBLE), 6) AS share_delta
    FROM a FULL OUTER JOIN b USING (lang)
    """,
)
def q_snapshot_diff(spark, sf_dir):
    """Snapshot drift report: per-language doc counts and mixture-
    share deltas between the prior snapshot (doc_id % 3 != 0 stands in
    for it) and the current corpus.  FULL OUTER join keeps languages
    that appear or vanish; totals ride a 1-row broadcast aggregate
    over the tiny per-language table (window-free)."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 3 != 0).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_a")
    )
    b = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_b"))
    j = a.join(b, "lang", "full_outer").select(
        "lang",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    # totals as one 1-row broadcast aggregate (exact long sums)
    # instead of whole-frame windows — window-free (VERDICT r7 #5)
    tot = j.agg(
        F.sum("n_a").alias("__ta"), F.sum("n_b").alias("__tb")
    )
    return j.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_a",
        "n_b",
        (F.col("n_b") - F.col("n_a")).alias("delta"),
        F.round(
            F.col("n_b") / F.col("__tb") - F.col("n_a") / F.col("__ta"),
            6,
        ).alias("share_delta"),
    )


_ADMIT2_SQL = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_distinct([ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                                       for i in range(len(ws) - 2)])) AS ng
          FROM w),
    s AS (SELECT doc_id, count(*) sz FROM g GROUP BY doc_id),
    inter AS (SELECT a.doc_id id1, b.doc_id id2, count(*) c
              FROM g a JOIN g b ON a.ng = b.ng AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    p AS (SELECT id1, id2 FROM inter
          JOIN s sa ON id1 = sa.doc_id
          JOIN s sb ON id2 = sb.doc_id
          WHERE c / (sa.sz + sb.sz - c) >= 0.2),
    d AS (SELECT doc_id, doc_id % 2 AS batch FROM documents),
    rejw AS (SELECT DISTINCT id2 AS doc_id FROM p WHERE id1 % 2 = id2 % 2),
    adm1 AS (SELECT doc_id FROM d WHERE batch = 0
             AND doc_id NOT IN (SELECT doc_id FROM rejw)),
    crossp AS (SELECT CASE WHEN id1 % 2 = 0 THEN id2 ELSE id1 END AS b2_id,
                      CASE WHEN id1 % 2 = 0 THEN id1 ELSE id2 END AS b1_id
               FROM p WHERE id1 % 2 <> id2 % 2),
    rej2 AS (SELECT b2_id AS doc_id FROM crossp
             WHERE b1_id IN (SELECT doc_id FROM adm1)
             UNION SELECT doc_id FROM rejw WHERE doc_id % 2 = 1),
    adm2 AS (SELECT doc_id FROM d WHERE batch = 1
             AND doc_id NOT IN (SELECT doc_id FROM rej2))
    SELECT CAST(0 AS INT) AS batch, doc_id FROM adm1
    UNION ALL
    SELECT CAST(1 AS INT) AS batch, doc_id FROM adm2
    ORDER BY batch, doc_id
"""


@register("q_admission_2phase", sql=_ADMIT2_SQL)
def q_admission_2phase(spark, sf_dir):
    """Two-phase corpus admission, the BATCH twin of
    streaming/stateful.py::stream_minhash_admission with the same
    batch-granular semantics (reject a doc that near-dups an earlier
    ADMITTED doc, or a smaller-id doc of its own batch whether or not
    that doc survives): batch 0 = even doc_ids admits first, batch 1
    admits against batch 0's survivors.  The pair relation here is
    the EXACT n-gram Jaccard join (SQL-expressible, so the oracle is
    exact); production admission uses the banded-minhash candidates —
    the streaming route's parity tests pin that the two relations
    drive identical admission decisions on planted dups."""
    from shadems_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    grams = D.tracked_persist(D.doc_grams(docs, ngram=3), key="admit_grams")
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    g = grams.withColumnRenamed("s", "ng")
    a, b = g.alias("a"), g.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.ng") == F.col("b.ng"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s1 = sizes.select(F.col("doc_id").alias("id1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("id2"), F.col("sz").alias("sz2"))
    jac = F.col("c") / (F.col("sz1") + F.col("sz2") - F.col("c"))
    pairs = (
        inter.join(F.broadcast(s1), "id1")
        .join(F.broadcast(s2), "id2")
        .filter(jac >= 0.2)
        .select("id1", "id2")
    )
    same = F.col("id1") % 2 == F.col("id2") % 2
    rejw = pairs.filter(same).select(F.col("id2").alias("doc_id")).distinct()
    b1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    b2 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id")
    adm1 = b1.join(rejw, "doc_id", "left_anti")
    crossp = pairs.filter(~same).select(
        F.when(F.col("id1") % 2 == 0, F.col("id2")).otherwise(F.col("id1")).alias("b2_id"),
        F.when(F.col("id1") % 2 == 0, F.col("id1")).otherwise(F.col("id2")).alias("b1_id"),
    )
    rej2_cross = (
        crossp.join(adm1.withColumnRenamed("doc_id", "b1_id"), "b1_id", "left_semi")
        .select(F.col("b2_id").alias("doc_id"))
    )
    rej2 = rej2_cross.union(
        rejw.join(b2, "doc_id", "left_semi")
    ).distinct()
    adm2 = b2.join(rej2, "doc_id", "left_anti")
    out = adm1.select(F.lit(0).cast("int").alias("batch"), "doc_id").unionByName(
        adm2.select(F.lit(1).cast("int").alias("batch"), "doc_id")
    )
    # no release here: the result is returned LAZY, so the keyed
    # persist must outlive this call — tracked_persist evicts the
    # previous "admit_grams" occupant on the next run instead.
    return out.orderBy("batch", "doc_id")
