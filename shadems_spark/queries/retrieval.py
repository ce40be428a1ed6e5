"""Retrieval / corpus-prep queries (north-star suite): TF-IDF keyword
extraction, BM25 ranked retrieval, fixed-window chunking, int8
quantized similarity, and the deterministic stratified-split report.

All five carry exact DuckDB oracles: ln-based scores are rounded 6dp
(libm convention), quantization uses the same integer HALF_UP
expression on both engines, and the split hash is plain bigint
arithmetic both sides.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.operators import retrieval as R
from shadems_spark.queries import register

_BM25_TERMS = ["spark", "hash", "window"]


@register(
    "q_tfidf",
    sql="""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
               FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
    scored AS (
      SELECT doc_id, term, tf, df_t,
             round(tf * (ln((n + 1.0) / (df_t + 1.0)) + 1.0), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    rk AS (SELECT *, row_number() OVER
             (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
           FROM scored)
    SELECT doc_id, term, tf, df_t, tfidf, rk FROM rk WHERE rk <= 3
    """,
)
def q_tfidf(spark, sf_dir):
    """TF-IDF top-3 keywords per document.  Two shuffles total —
    (doc, term) counts with map-side combine, then the vocabulary-
    sized document-frequency aggregate joined back by broadcast; the
    corpus size N rides a broadcast 1-row aggregate, not a separate
    driver action."""
    docs = load_table(spark, sf_dir, "documents")
    # terms feeds three consumers, but Catalyst's ReuseExchange
    # already dedups the identical (doc, term) shuffle across them —
    # an explicit persist MEASURED SLOWER (1.8 s vs 1.0 s warm at
    # sf0.1: materialization + cache reads for a reuse the optimizer
    # gives free).  Persist only pays when consumer plans diverge
    # BEFORE the shuffle (see q_span_dedup).
    return R.tf_idf(R.doc_terms(docs), top_per_doc=3)


@register(
    "q_bm25",
    sql=f"""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents),
    hits AS (SELECT doc_id, term FROM toks
             WHERE term IN ('spark', 'hash', 'window')),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM hits GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
    lens AS (SELECT doc_id, len(string_split(text, ' ')) AS dl
             FROM documents),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens),
    scored AS (
      SELECT tf.doc_id,
             round(sum(
               ln(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
               * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             ), 6) AS score
      FROM tf JOIN dfreq USING (term)
              JOIN lens ON tf.doc_id = lens.doc_id
              CROSS JOIN stats
      GROUP BY tf.doc_id)
    SELECT doc_id, score, rank FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored)
    WHERE rank <= 20
    """,
)
def q_bm25(spark, sf_dir):
    """BM25 top-20 for the query {{'spark','hash','window'}}
    (k1=1.2, b=0.75).  The query-term filter sits BELOW the first
    shuffle, so only matching postings are aggregated — O(matching
    postings), not O(corpus tokens), at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return R.bm25(docs, _BM25_TERMS, k=20)


@register(
    "q_chunk",
    sql="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
               WHERE doc_id % 7 = 0),
    s AS (SELECT doc_id, len(ws) AS doc_tokens, ws,
                 unnest(range(1, greatest(len(ws), 1) + 1, 24)) AS start
          FROM w)
    SELECT doc_id, doc_tokens,
           CAST((start - 1) // 24 + 1 AS BIGINT) AS chunk_idx,
           CAST(start AS BIGINT) AS start,
           CAST(len(ws[start : start + 31]) AS BIGINT) AS n_tokens,
           array_to_string(ws[start : start + 31], ' ') AS chunk_text
    FROM s
    """,
)
def q_chunk(spark, sf_dir):
    """Fixed-window chunking (32-token windows, stride 24) over a 1/7
    document sample: sequence + posexplode + slice, zero shuffles.
    chunk_idx derives from the start offset, so both engines agree
    without any ordinality dependence."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    return R.chunk_docs(docs, chunk_size=32, stride=24)


@register(
    "q_quantize_topk",
    sql="""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
               FROM embeddings),
    m AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS mx
          FROM e),
    q AS (SELECT vec_id,
                 list_transform(v, x -> CAST(CASE WHEN mx = 0 THEN 0
                     ELSE sign(x) * floor(abs(x) * 127.0 / mx + 0.5)
                     END AS INTEGER)) AS qv
          FROM m),
    qs AS (SELECT vec_id AS q_id, qv AS q_vec FROM q WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q_id, c.vec_id AS cand_id,
             round(
               list_sum(list_transform(list_zip(q_vec, c.qv),
                                       z -> CAST(z[1] * z[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q_vec, x -> CAST(x*x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(c.qv, x -> CAST(x*x AS DOUBLE))))),
               6) AS cos
      FROM qs CROSS JOIN q c WHERE c.vec_id != q_id)
    SELECT q_id, cand_id, cos, rank FROM (
      SELECT q_id, cand_id, cos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, cand_id) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
)
def q_quantize_topk(spark, sf_dir):
    """Int8-quantized cosine top-5: vectors quantize to int8 with an
    integer HALF_UP rule identical on both engines, the scale cancels
    in cosine, and the scoring join ships 1-byte components instead of
    8-byte doubles — the payload shape that matters at 100 TB.  Query
    set = vec_id % 100 = 0 (small by contract, broadcast)."""
    emb = load_table(spark, sf_dir, "embeddings")
    from shadems_spark.operators.similarity import as_double

    # quantize once and precompute each vector's norm ONCE instead of
    # per pair (the naive quantized_cosine refolds both norms for
    # every (query, candidate) pair — 3x the HOF fold work; the win
    # grows with the query fan-out since each saved fold is reused
    # n_queries / n_candidates times).
    from shadems_spark.operators.exprcache import memo

    q = emb.select(
        "vec_id",
        memo(
            ("qt_qv",),
            lambda: R.quantize_vec(as_double("embedding")).alias("qv"),
        ),
    ).withColumn(
        "nrm",
        memo(
            ("qt_nrm",),
            lambda: F.sqrt(
                F.aggregate(
                    F.transform(F.col("qv"), lambda x: (x * x).cast("double")),
                    F.lit(0.0),
                    lambda s, x: s + x,
                )
            ),
        ),
    )
    queries = q.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("qv").alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
    )
    dotq = memo(
        ("qt_dotq",),
        lambda: F.aggregate(
            F.zip_with(
                F.col("q_vec"),
                F.col("c_vec"),
                lambda x, y: (x * y).cast("double"),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        ),
    )
    scored = (
        q.select(
            F.col("vec_id").alias("cand_id"),
            F.col("qv").alias("c_vec"),
            F.col("nrm").alias("c_nrm"),
        )
        .crossJoin(F.broadcast(queries))
        .filter(F.col("cand_id") != F.col("q_id"))
        .withColumn(
            "cos", F.round(dotq / (F.col("q_nrm") * F.col("c_nrm")), 6)
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "cand_id", "cos", "rank")
    )


@register(
    "q_split_stratified",
    sql="""
    WITH s AS (SELECT lang,
                      CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80
                             THEN 'train'
                           WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90
                             THEN 'val'
                           ELSE 'test' END AS split
               FROM documents),
    c AS (SELECT lang, split, count(*) AS n FROM s GROUP BY 1, 2)
    SELECT lang, split, n,
           round(n / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE), 6)
             AS share
    FROM c
    """,
)
def q_split_stratified(spark, sf_dir):
    """Deterministic 80/10/10 split via Knuth multiplicative hash on
    doc_id, reported per (lang, split) with within-language shares.
    Pure per-row bigint arithmetic — identical under retry and across
    engines; the report aggregate is language x 3 rows."""
    docs = load_table(spark, sf_dir, "documents")
    return R.split_report(R.stratified_split(docs), strat_col="lang")


@register(
    "q_profile",
    sql="""
    WITH n AS (SELECT count(*) AS n_rows FROM lineitem)
    SELECT 'l_quantity' AS column, n_rows,
           (SELECT count(*) FROM lineitem WHERE l_quantity IS NULL) AS n_null,
           (SELECT count(DISTINCT l_quantity) FROM lineitem) AS n_distinct,
           (SELECT CAST(min(l_quantity) AS DOUBLE) FROM lineitem) AS min_num,
           (SELECT CAST(max(l_quantity) AS DOUBLE) FROM lineitem) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM n
    UNION ALL
    SELECT 'l_discount', n_rows,
           (SELECT count(*) FROM lineitem WHERE l_discount IS NULL),
           (SELECT count(DISTINCT l_discount) FROM lineitem),
           (SELECT CAST(min(l_discount) AS DOUBLE) FROM lineitem),
           (SELECT CAST(max(l_discount) AS DOUBLE) FROM lineitem),
           NULL, NULL
    FROM n
    UNION ALL
    SELECT 'l_returnflag', n_rows,
           (SELECT count(*) FROM lineitem WHERE l_returnflag IS NULL),
           (SELECT count(DISTINCT l_returnflag) FROM lineitem),
           NULL, NULL,
           (SELECT min(l_returnflag) FROM lineitem),
           (SELECT max(l_returnflag) FROM lineitem)
    FROM n
    UNION ALL
    SELECT 'l_linestatus', n_rows,
           (SELECT count(*) FROM lineitem WHERE l_linestatus IS NULL),
           (SELECT count(DISTINCT l_linestatus) FROM lineitem),
           NULL, NULL,
           (SELECT min(l_linestatus) FROM lineitem),
           (SELECT max(l_linestatus) FROM lineitem)
    FROM n
    """,
)
def q_profile(spark, sf_dir):
    """One-pass column profile of lineitem (2 numeric + 2 string
    columns): nulls, exact distinct, min/max — ONE aggregation job for
    all columns (the oracle's per-column scalar subqueries are the
    readable spec; Spark does it in a single scan)."""
    from shadems_spark.operators.profile import profile

    li = load_table(spark, sf_dir, "lineitem")
    return profile(li, ["l_quantity", "l_discount", "l_returnflag", "l_linestatus"])


@register(
    "q_vocab",
    sql="""
    WITH wc AS (SELECT unnest(string_split(text, ' ')) AS w
                FROM documents),
    c AS (SELECT w, count(*) AS n FROM wc GROUP BY w),
    r AS (SELECT w, n,
                 row_number() OVER (ORDER BY n DESC, w) AS rk,
                 sum(n) OVER (ORDER BY n DESC, w
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(n) OVER () AS total
          FROM c)
    SELECT w, n, rk, round(cum / CAST(total AS DOUBLE), 6) AS coverage
    FROM r WHERE rk <= 100
    """,
)
def q_vocab(spark, sf_dir):
    """Tokenizer-vocab coverage curve: top-100 words with cumulative
    corpus-coverage share.  The corpus-sized stage is the word-count
    aggregation; the ordered window only ever sees the vocabulary-
    sized table."""
    from shadems_spark.operators.profile import vocab_coverage

    docs = load_table(spark, sf_dir, "documents")
    return vocab_coverage(docs, top=100)


@register(
    "q_chunk_udtf",
    sql="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
               WHERE doc_id % 31 = 0),
    s AS (SELECT doc_id, ws,
                 unnest(range(1, greatest(len(ws), 1) + 1, 24)) AS start
          FROM w)
    SELECT doc_id, CAST(start AS INTEGER) AS start,
           array_to_string(ws[start : start + 31], ' ') AS chunk_text
    FROM s
    """,
)
def q_chunk_udtf(spark, sf_dir):
    """Python UDTF surface (Spark 4 @udtf + LATERAL): the chunker as a
    user-defined TABLE function, cross-validated against q_chunk's
    pure-Column semantics via the same slicing oracle.  Row-Python is
    the slow path by policy — this exists to cover the API (the
    production chunker is the zero-shuffle Column form); the lateral
    join still fans out executor-side with no driver involvement."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="start int, chunk_text string")
    class Chunker:
        def eval(self, text: str, size: int, stride: int):
            ws = text.split(" ")
            for s in range(0, max(len(ws), 1), stride):
                yield s + 1, " ".join(ws[s : s + size])

    spark.udtf.register("chunker", Chunker)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 31 == 0
    )
    docs.createOrReplaceTempView("__chunk_docs")
    return spark.sql(
        "SELECT d.doc_id, c.start, c.chunk_text "
        "FROM __chunk_docs d, LATERAL chunker(d.text, 32, 24) c"
    )


@register(
    "q_global_index",
    sql="""
    SELECT event_id,
           row_number() OVER (ORDER BY epoch_us(ts), event_id) AS gid
    FROM events
    """,
)
def q_global_index(spark, sf_dir):
    """Scalable global row numbering over 10k events in (ts, event_id)
    order: range-partition + local row_number + broadcast cumulative
    offsets (operators/profile.global_index) — numbering identical to
    a global window without ever moving the data to one partition."""
    from shadems_spark.operators.profile import global_index

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.expr("ts_ns div 1000").alias("ts_us")
    )
    return global_index(ev, ["ts_us", "event_id"]).select("event_id", "gid")


@register(
    "q_pmi",
    sql="""
    WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
    big AS (SELECT ws[i] AS a, ws[i+1] AS b
            FROM w, LATERAL unnest(range(1, len(ws))) t(i)),
    bc AS (SELECT a, b, count(*) AS nab FROM big GROUP BY 1, 2),
    uni AS (SELECT unnest(string_split(text, ' ')) AS u FROM documents),
    uc AS (SELECT u, count(*) AS nu FROM uni GROUP BY 1),
    tot AS (SELECT (SELECT sum(nab) FROM bc) AS nb,
                   (SELECT sum(nu) FROM uc) AS n1)
    SELECT a, b, nab,
           round(ln((nab / CAST(nb AS DOUBLE))
                    / ((ua.nu / CAST(n1 AS DOUBLE))
                       * (ub.nu / CAST(n1 AS DOUBLE)))), 6) AS pmi
    FROM bc JOIN uc ua ON bc.a = ua.u
            JOIN uc ub ON bc.b = ub.u
            CROSS JOIN tot
    WHERE nab >= 40
    """,
)
def q_pmi(spark, sf_dir):
    """Bigram collocation mining by pointwise mutual information:
    PMI(a,b) = ln(p(ab) / p(a)p(b)) for bigrams seen >= 40 times.
    Corpus-sized work is two counted explodes (bigrams via zip_with
    on shifted slices, unigrams); the PMI join runs on the counted
    tables with the unigram side broadcast and totals riding 1-row
    broadcast aggregates."""
    from shadems_spark.operators.text import words

    docs = load_table(spark, sf_dir, "documents")
    ws = words("text")
    length = F.greatest(F.size(ws) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(ws, 1, length),
        F.slice(ws, 2, length),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    bc = (
        docs.select(F.explode(pairs).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("nab"))
    )
    uc = (
        docs.select(F.explode(ws).alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("nu"))
    )
    tot = bc.agg(F.sum("nab").alias("nb")).crossJoin(
        uc.agg(F.sum("nu").alias("n1"))
    )
    ua = uc.select(F.col("u").alias("a"), F.col("nu").alias("nu_a"))
    ub = uc.select(F.col("u").alias("b"), F.col("nu").alias("nu_b"))
    p_ab = F.col("nab") / F.col("nb")
    p_a = F.col("nu_a") / F.col("n1")
    p_b = F.col("nu_b") / F.col("n1")
    return (
        bc.filter(F.col("nab") >= 40)
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a", "b", "nab", F.round(F.log(p_ab / (p_a * p_b)), 6).alias("pmi")
        )
    )


def _pca_xe_sql(d: int = 64, iters: int = 8) -> str:
    """DuckDB replay of the FULL power-iteration PCA (fit + project):
    the r6 nano-int protocol makes every cross-row sum an integer
    (per-dim mean numerators, per-iteration A·v partials), so the
    evolving state vector is bit-identical on both engines and the
    sequential-fold dot products mirror Spark's HOF folds
    element-for-element.  Iterations unroll as MATERIALIZED CTE
    triples (projection, nano partial sums, normalize) — the
    q_lr_train play for iterative linear algebra, extended to
    vector-valued state."""
    import math

    def fold(terms: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {terms}), "
            f"(s, x) -> s + x)"
        )

    def dotz(a: str, b: str) -> str:
        return fold(f"list_transform(list_zip({a}, {b}), z -> z[1] * z[2])")

    init = repr(1.0 / math.sqrt(d))
    ctes = [
        """e AS (SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings)""",
        "nn AS (SELECT count(*) AS c FROM e)",
        f"""muN AS MATERIALIZED (SELECT j,
                  sum(CAST(round(v[j + 1] * 1000000000.0) AS BIGINT)) AS s
            FROM e, unnest(range({d})) t(j) GROUP BY 1)""",
        """mu AS MATERIALIZED (SELECT list(s / 1000000000.0 / nn.c ORDER BY j)
                  AS m
            FROM muN, nn GROUP BY nn.c)""",
        """ce AS MATERIALIZED (SELECT e.vec_id,
                  list_transform(list_zip(e.v, mu.m), z -> z[1] - z[2]) AS cv
            FROM e, mu)""",
        f"w0 AS (SELECT list_transform(range({d}), i -> {init}) AS v)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""t{i} AS MATERIALIZED (SELECT c.vec_id, c.cv,
                  {dotz("c.cv", "w.v")} AS t
            FROM ce c, w{i - 1} w)"""
        )
        ctes.append(
            f"""sN{i} AS MATERIALIZED (SELECT j,
                  sum(CAST(round(t * cv[j + 1] * 1000000000.0) AS BIGINT)) AS s
            FROM t{i}, unnest(range({d})) u(j) GROUP BY 1)"""
        )
        ctes.append(
            f"""w{i} AS MATERIALIZED (SELECT list_transform(sl, x -> x / nrm)
                  AS v
            FROM (SELECT sl, CASE WHEN nrm0 = 0 THEN 1.0 ELSE nrm0 END AS nrm
                  FROM (SELECT sl,
                               sqrt({fold("list_transform(sl, x -> x * x)")})
                                   AS nrm0
                        FROM (SELECT list(s / 1000000000.0 ORDER BY j) AS sl
                              FROM sN{i}))))"""
        )
    ctes.append(
        f"""wf AS (SELECT list_transform(v, x -> x * flip) AS v
            FROM (SELECT v,
                         CASE WHEN coalesce(
                                  list_filter(v, x -> abs(x) > 1e-9)[1],
                                  1.0) < 0
                              THEN -1.0 ELSE 1.0 END AS flip
                  FROM w{iters}))"""
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT c.vec_id, round({dotz("c.cv", "w.v")}, 4) AS pc1
    FROM ce c, wf w ORDER BY c.vec_id
    """


@register("q_pca", sql=_pca_xe_sql())
def q_pca(spark, sf_dir):
    """Distributed PCA (top principal component) over the embedding
    table by power iteration — d-vector driver state only, one
    map-side aggregate pass per iteration, then a single projection
    scan (operators/similarity.power_top_component).  Verified in
    tests/test_retrieval.py against a local numpy run of the same
    algorithm (agreement ~1e-6) plus a Rayleigh-quotient bound vs the
    exact top eigenvalue — and, since r6's nano-int rewrite of the
    fit's cross-row sums, hash-exact against a DuckDB replay of the
    full iteration (_pca_xe_sql); the fit is also layout-independent
    now (float partial sums were summation-order-dependent)."""
    from shadems_spark.operators.similarity import pca_project, power_top_component

    emb = load_table(spark, sf_dir, "embeddings")
    mean, comp = power_top_component(emb, iters=8)
    return pca_project(emb, mean, comp)


# shared bit-exactness-critical fold helpers (ONE definition,
# operators/similarity.py — the same strings every xe oracle replays)
from shadems_spark.operators.similarity import (  # noqa: E402
    xe_dot_sql as _xe_dotf,
    xe_norm_sql as _xe_normf,
)


def _pq_cte_block(d: int, m: int, k_cent: int, query_mod: int) -> str:
    """Shared PQ CTEs (unit-normalize -> knuth-sampled codebook ->
    per-subspace argmin codes -> unit queries): the fit+encode half of
    both the q_pq_topk and q_ivfpq oracles.  Every float op mirrors
    the engine fold-for-fold — with_unit's guarded norm, pq_train's
    (knuth32, id)-ordered sample, pq_encode's sequential
    squared-distance accumulation with lowest-j tie wins."""
    from shadems_spark.operators.hashing import knuth_sql

    sub = d // m
    hk = knuth_sql("vec_id")
    d2 = " + ".join(
        f"((un.u[{sub} * t.mi + {i + 1}] - cb.u[{sub} * t.mi + {i + 1}]) * "
        f"(un.u[{sub} * t.mi + {i + 1}] - cb.u[{sub} * t.mi + {i + 1}]))"
        for i in range(sub)
    )
    return f"""
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    un AS MATERIALIZED (
        SELECT vec_id, list_transform(v, x -> x / nz) AS u
        FROM (SELECT vec_id, v,
                     CASE WHEN {_xe_normf("v")} = 0 THEN 1.0
                          ELSE {_xe_normf("v")} END AS nz
              FROM e)),
    cb AS MATERIALIZED (
        SELECT CAST(row_number() OVER (ORDER BY hk, vec_id) - 1 AS INT) AS j, u
        FROM (SELECT vec_id, u, {hk} AS hk FROM un ORDER BY hk, vec_id
              LIMIT {k_cent})),
    codes AS MATERIALIZED (
        SELECT vec_id, mi, code FROM (
            SELECT un.vec_id, CAST(t.mi AS INT) AS mi, cb.j AS code,
                   row_number() OVER (PARTITION BY un.vec_id, t.mi
                                      ORDER BY {d2}, cb.j) AS rn
            FROM un, unnest(range({m})) t(mi), cb
        ) WHERE rn = 1),
    q AS (SELECT vec_id AS q_id, u AS qu FROM un
          WHERE vec_id % {query_mod} = 0)"""


def _pq_lut_term(d: int, m: int) -> str:
    """ADC term for subspace ``cd.mi``: <query subvector, codebook
    centroid subvector> — explicit per-dim sum, matching _adc_luts'
    sequential Python ``sum``."""
    sub = d // m
    return " + ".join(
        f"(q.qu[{sub} * cd.mi + {i + 1}] * cb.u[{sub} * cd.mi + {i + 1}])"
        for i in range(sub)
    )


def _pq_xe_sql(
    d: int = 64, m: int = 32, k_cent: int = 16, k: int = 3,
    query_mod: int = 100,
) -> str:
    """DuckDB replay of the ENTIRE PQ path — codebook fit (the
    (knuth32, id)-lowest sample of unit vectors), per-subspace
    argmin encode, per-query ADC lookup-table scoring (sequential
    fold over the m picked terms, exactly F.lit(0.0) + t0 + ... +
    t{m-1}) and the final top-k by (score desc, cand_id).  The r6
    LSH/IVF sampler-replay bridge applied to the last non-oracled ANN
    family (VERDICT r10 #2)."""
    return f"""
    WITH {_pq_cte_block(d, m, k_cent, query_mod)},
    terms AS (
        SELECT q.q_id, cd.vec_id AS cand_id, cd.mi,
               ({_pq_lut_term(d, m)}) AS t
        FROM codes cd JOIN cb ON cb.j = cd.code, q
        WHERE cd.vec_id != q.q_id),
    sc AS (
        SELECT q_id, cand_id,
               round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list(t ORDER BY mi)), (s, x) -> s + x), 6) AS adc_score
        FROM terms GROUP BY q_id, cand_id)
    SELECT q_id, cand_id, adc_score FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY adc_score DESC, cand_id) AS rk
        FROM sc) WHERE rk <= {k}
    """


def _ivfpq_xe_sql(
    d: int = 64, m: int = 32, k_cent: int = 16, k: int = 3,
    n_cells: int = 8, n_probe: int = 2, query_mod: int = 100,
) -> str:
    """DuckDB replay of the composed IVFADC index: the PQ block
    (_pq_cte_block) plus the affine-xe coarse sample, unit-centroid
    argmax assignment (ties -> lowest cell, ivf_assign's struct-sort
    order), per-query top-n_probe cells (ties -> lowest cell,
    _probe's (-sim, i) sort key) and ADC scoring restricted to the
    probed slice."""
    from shadems_spark.operators.similarity import xe_affine_sql

    xk = xe_affine_sql("vec_id")
    return f"""
    WITH {_pq_cte_block(d, m, k_cent, query_mod)},
    cu AS MATERIALIZED (
        SELECT CAST(row_number() OVER (ORDER BY xk, vec_id) - 1 AS INT)
                   AS cell,
               u AS cv
        FROM (SELECT vec_id, u, {xk} AS xk
              FROM un ORDER BY xk, vec_id LIMIT {n_cells})),
    asg AS MATERIALIZED (
        SELECT vec_id AS cand_id, cell FROM (
            SELECT e.vec_id, cu.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_xe_dotf("e.v", "cu.cv")} DESC,
                                               cu.cell) AS rn
            FROM e, cu) WHERE rn = 1),
    pr AS (
        SELECT q_id, cell FROM (
            SELECT q.q_id, cu.cell,
                   row_number() OVER (PARTITION BY q.q_id
                                      ORDER BY {_xe_dotf("q.qu", "cu.cv")} DESC,
                                               cu.cell) AS rn
            FROM q, cu) WHERE rn <= {n_probe}),
    terms AS (
        SELECT q.q_id, cd.vec_id AS cand_id, a.cell, cd.mi,
               ({_pq_lut_term(d, m)}) AS t
        FROM codes cd JOIN cb ON cb.j = cd.code
             JOIN asg a ON a.cand_id = cd.vec_id
             JOIN q ON cd.vec_id != q.q_id
             JOIN pr ON pr.q_id = q.q_id AND pr.cell = a.cell),
    sc AS (
        SELECT q_id, cand_id, cell,
               round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list(t ORDER BY mi)), (s, x) -> s + x), 6) AS adc_score
        FROM terms GROUP BY q_id, cand_id, cell)
    SELECT q_id, cand_id, cell, adc_score FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY adc_score DESC, cand_id) AS rk
        FROM sc) WHERE rk <= {k}
    """


@register("q_pq_topk", sql=_pq_xe_sql())
def q_pq_topk(spark, sf_dir):
    """Product-quantization ANN: deterministic codebooks (m=32 two-dim
    subspaces x k=16 centroids), vectors encoded to 32 int codes (16x
    storage/shuffle compression vs 64 float64s), queries scored by
    asymmetric distance through literal lookup tables over the
    persisted code table.  Recall@5 0.68 vs exact cosine at sf0.01
    (BASELINE.md), floor pinned in tests/test_retrieval.py.

    Hash-exact since r11 (VERDICT r10 #2, the r6 LSH/IVF sampler
    bridge): the codebook is the (knuth32, id)-lowest sample, encode
    accumulates norms/distances in the same sequential fold order as
    the oracle's list_reduce, and _pq_xe_sql replays fit + encode +
    ADC end-to-end in DuckDB."""
    from shadems_spark.operators.similarity import pq_topk, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_train(emb)
    return pq_topk(emb, cb, k=3)


@register("q_ivfpq", sql=_ivfpq_xe_sql())
def q_ivfpq(spark, sf_dir):
    """IVF+PQ (IVFADC) composed index: coarse cells route the scan,
    PQ codes compress the payload, asymmetric-distance LUTs score only
    the probed slice — the standard billion-vector ANN layout, built
    from the repo's deterministic IVF and PQ pieces.  Recall vs exact
    cosine pinned in tests/test_retrieval.py.

    Hash-exact since r11 (VERDICT r10 #2): the coarse sampler moved
    from xxhash64 to the affine xe family (the q_ann_ivf bridge), the
    probe ranking runs sequential Python folds instead of BLAS dots,
    and _ivfpq_xe_sql replays coarse fit + assignment + probing + PQ
    fit/encode + ADC end-to-end in DuckDB."""
    from shadems_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(emb, k=3)


def _mmr_oracle(k: int = 5, n: int = 20, lam: float = 0.7, q_ids: str = "0, 1, 2") -> str:
    """Unrolled greedy-MMR oracle: k chained CTE steps, each an argmax
    window over the not-yet-selected candidates with a max-sim penalty
    to the union of prior steps.  The blended score uses the same
    exact scaled-integer form as the operator (lam_i/1000 over
    1e6-scaled rel/pen) so no rounding boundary can split the
    engines (see operators/retrieval.py::mmr_topk)."""

    def cos(x: str, y: str) -> str:
        return (
            f"round(list_sum(list_transform(list_zip({x}, {y}), z -> z[1]*z[2]))"
            f" / (sqrt(list_sum(list_transform({x}, t -> t*t)))"
            f" * sqrt(list_sum(list_transform({y}, t -> t*t)))), 6)"
        )

    lam_i = int(round(lam * 1000))
    s1_mmr = f"({lam_i} * CAST(round(rel*1000000) AS BIGINT)) / 1000000000.0"
    st_mmr = (
        f"({lam_i} * CAST(round(rel*1000000) AS BIGINT)"
        f" - {1000 - lam_i} * CAST(round(pen*1000000) AS BIGINT))"
        f" / 1000000000.0"
    )
    parts = [
        f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
               FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id IN ({q_ids})),
    scored AS (SELECT q.q_id, e.vec_id AS cand_id, e.v, {cos('q.qv', 'e.v')} AS rel
               FROM e CROSS JOIN q WHERE e.vec_id != q.q_id),
    cand AS (SELECT q_id, cand_id, v, rel FROM (
               SELECT *, row_number() OVER (PARTITION BY q_id
                                            ORDER BY rel DESC, cand_id) rk
               FROM scored) WHERE rk <= {n}),
    sim AS (SELECT a.q_id, a.cand_id AS ia, b.cand_id AS ib, {cos('a.v', 'b.v')} AS s
            FROM cand a JOIN cand b
              ON a.q_id = b.q_id AND a.cand_id != b.cand_id),
    s1 AS (SELECT q_id, cand_id, rel, 1 AS step, {s1_mmr} AS mmr FROM (
             SELECT *, row_number() OVER (PARTITION BY q_id
                        ORDER BY {s1_mmr} DESC, cand_id) rk
             FROM cand) WHERE rk = 1)"""
    ]
    prev = ["s1"]
    for t in range(2, k + 1):
        selprev = " UNION ALL ".join(
            f"SELECT q_id, cand_id FROM {p}" for p in prev
        )
        parts.append(
            f""",
    sel{t} AS ({selprev}),
    p{t} AS (SELECT c.q_id, c.cand_id, c.rel, max(sim.s) AS pen
             FROM cand c
             JOIN sim ON sim.q_id = c.q_id AND sim.ia = c.cand_id
             JOIN sel{t} sp ON sp.q_id = sim.q_id AND sp.cand_id = sim.ib
             WHERE NOT EXISTS (SELECT 1 FROM sel{t} z
                               WHERE z.q_id = c.q_id AND z.cand_id = c.cand_id)
             GROUP BY 1, 2, 3),
    s{t} AS (SELECT q_id, cand_id, rel, {t} AS step, mmr FROM (
               SELECT *, {st_mmr} AS mmr,
                      row_number() OVER (PARTITION BY q_id
                        ORDER BY {st_mmr} DESC, cand_id) rk
               FROM p{t}) WHERE rk = 1)"""
        )
        prev.append(f"s{t}")
    union = " UNION ALL ".join(
        f"SELECT q_id, step, cand_id, mmr FROM {p}" for p in prev
    )
    parts.append(f"\n    {union} ORDER BY q_id, step")
    return "".join(parts)


@register("q_mmr", sql=_mmr_oracle())
def q_mmr(spark, sf_dir):
    """Maximal-marginal-relevance diversified retrieval (Carbonell &
    Goldstein 1998): distributed candidate scan -> k declarative
    greedy re-rank steps keyed on q_id, nothing collected
    (operators/retrieval.py::mmr_topk).  The oracle unrolls the same
    greedy recursion into chained CTEs with identical 6dp rounding
    points, so the full pick sequence hash-matches."""
    from shadems_spark.operators.similarity import embedding_dim  # noqa: F401

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
    return R.mmr_topk(emb, queries, k=5, n_candidates=20, lam=0.7)


_MARGIN_COS = (
    "round(list_sum(list_transform(list_zip({x}, {y}), z -> z[1]*z[2]))"
    " / (sqrt(list_sum(list_transform({x}, t -> t*t)))"
    " * sqrt(list_sum(list_transform({y}, t -> t*t)))), 6)"
)


@register(
    "q_bitext_margin",
    sql=f"""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) v
               FROM embeddings),
    xs AS (SELECT vec_id AS x_id, v AS xv FROM e WHERE label = 0),
    ys AS (SELECT vec_id AS y_id, v AS yv FROM e WHERE label = 1),
    sc AS (SELECT x_id, y_id, {_MARGIN_COS.format(x='xv', y='yv')} AS cos
           FROM xs CROSS JOIN ys),
    xk AS (SELECT x_id, avg(cos) AS x_knn FROM (
             SELECT *, row_number() OVER (PARTITION BY x_id
                        ORDER BY cos DESC, y_id) rk FROM sc)
           WHERE rk <= 4 GROUP BY x_id),
    yk AS (SELECT y_id, avg(cos) AS y_knn FROM (
             SELECT *, row_number() OVER (PARTITION BY y_id
                        ORDER BY cos DESC, x_id) rk FROM sc)
           WHERE rk <= 4 GROUP BY y_id),
    top1 AS (SELECT x_id, y_id, cos FROM (
               SELECT *, row_number() OVER (PARTITION BY x_id
                          ORDER BY cos DESC, y_id) rk FROM sc)
             WHERE rk = 1)
    SELECT t.x_id, t.y_id, t.cos,
           round(t.cos / ((xk.x_knn + yk.y_knn) / 2), 6) AS margin
    FROM top1 t JOIN xk ON t.x_id = xk.x_id JOIN yk ON t.y_id = yk.y_id
    ORDER BY t.x_id
    """,
)
def q_bitext_margin(spark, sf_dir):
    """Margin-based bitext mining (Artetxe & Schwenk 2019,
    arXiv:1811.01136): candidate pair score = cos(x, y) normalized by
    the mean of both sides' k-NN cosines — the standard mined-parallel-
    corpus scoring that absorbs hubness.  Two label groups stand in
    for the two languages.  Spark shape: one scored table feeds BOTH
    k-NN means (windows keyed on either side) and the top-1 pick —
    scored is built once; at 100 TB the cross join becomes the ANN
    candidate generator (LSH/IVF) and this exact form verifies the
    survivors.  avg() over exactly 4 rounded values divides by the
    same power of two on both engines, so margins hash-match."""
    from shadems_spark.operators.similarity import as_double, cosine

    emb = load_table(spark, sf_dir, "embeddings")
    xs = emb.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("x_id"), as_double("embedding").alias("xv")
    )
    ys = emb.filter(F.col("label") == 1).select(
        F.col("vec_id").alias("y_id"), as_double("embedding").alias("yv")
    )
    sc = (
        xs.crossJoin(ys)
        .withColumn("cos", F.round(cosine(F.col("xv"), F.col("yv")), 6))
        .select("x_id", "y_id", "cos")
    )
    from shadems_spark.operators.dedup import tracked_persist

    sc = tracked_persist(sc, key="bitext_scored")
    wx = Window.partitionBy("x_id").orderBy(F.col("cos").desc(), F.col("y_id"))
    wy = Window.partitionBy("y_id").orderBy(F.col("cos").desc(), F.col("x_id"))
    xk = (
        sc.withColumn("rk", F.row_number().over(wx))
        .filter(F.col("rk") <= 4)
        .groupBy("x_id")
        .agg(F.avg("cos").alias("x_knn"))
    )
    yk = (
        sc.withColumn("rk", F.row_number().over(wy))
        .filter(F.col("rk") <= 4)
        .groupBy("y_id")
        .agg(F.avg("cos").alias("y_knn"))
    )
    top1 = (
        sc.withColumn("rk", F.row_number().over(wx))
        .filter(F.col("rk") == 1)
        .select("x_id", "y_id", "cos")
    )
    return (
        top1.join(xk, "x_id")
        .join(yk, "y_id")
        .select(
            "x_id",
            "y_id",
            "cos",
            F.round(
                F.col("cos") / ((F.col("x_knn") + F.col("y_knn")) / F.lit(2)),
                6,
            ).alias("margin"),
        )
        .orderBy("x_id")
    )


@register(
    "q_cdc_chunk",
    sql="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents WHERE doc_id % 13 = 0),
    t AS (SELECT doc_id,
                 unnest([{'pos': i, 'w': ws[i+1]} for i in range(len(ws))],
                        recursive := true)
          FROM w),
    h AS (SELECT doc_id, pos, w,
                 CASE WHEN list_reduce(
                          list_prepend(CAST(0 AS BIGINT),
                                       list_transform(string_split(w, ''),
                                                      c -> CAST(ascii(c) AS BIGINT))),
                          (a, c) -> (a * 31 + c) % 1000000007) % 8 = 0
                      OR pos = 0
                      THEN 1 ELSE 0 END AS boundary
          FROM t),
    c AS (SELECT doc_id, pos, w,
                 sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos) AS chunk_id
          FROM h)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           count(*) AS n_tokens,
           string_agg(w, ' ' ORDER BY pos) AS chunk_text
    FROM c GROUP BY 1, 2 ORDER BY doc_id, chunk_id
    """,
)
def q_cdc_chunk(spark, sf_dir):
    """Content-defined chunking (the FastCDC/rsync idea at word
    granularity): a chunk boundary falls where the word's polynomial
    hash lands in a fixed residue class (1-in-8 -> ~8-word expected
    chunks), NOT at fixed offsets — so inserting or deleting text
    reshapes only the chunks around the edit while every later chunk
    keeps its identity (pinned in tests).  The dedup-friendly
    chunker: stable chunks make chunk-level exact dedup catch
    near-identical revisions that fixed windows miss.  Per-doc
    positional explode + per-word hash + running boundary sum —
    shuffles keyed on doc_id only."""
    from pyspark.sql import Window

    from shadems_spark.operators.text import FP_MOD, words

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    t = docs.select(
        "doc_id", F.posexplode(words("text")).alias("pos", "w")
    )
    whash = F.aggregate(
        F.transform(F.split(F.col("w"), ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda a, c: (a * F.lit(31) + c) % F.lit(FP_MOD),
    )
    h = t.withColumn(
        "boundary",
        F.when((whash % 8 == 0) | (F.col("pos") == 0), 1).otherwise(0),
    )
    wdw = Window.partitionBy("doc_id").orderBy("pos")
    c = h.withColumn("chunk_id", F.sum("boundary").over(wdw))
    return (
        c.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_id")
    )


_JL_OUT = 16


def _jl_sign(i: str, j: int) -> str:
    return f"((({i} * 2654435761 + {j} * 40503) % 4294967296) % 2 * 2 - 1)"


def _jl_oracle() -> str:
    cols = ",\n           ".join(
        f"round(list_sum([v[i+1] * {_jl_sign('i', j)} for i in range(len(v))])"
        f" / 4.0, 6) AS y{j}"
        for j in range(_JL_OUT)
    )
    return f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
               FROM embeddings WHERE vec_id % 3 = 0)
    SELECT vec_id,
           {cols}
    FROM e ORDER BY vec_id
    """


@register("q_random_projection", sql=_jl_oracle())
def q_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss random projection 64 -> 16 dims with a
    deterministic {{+1,-1}} sign matrix (hash of (input, output)
    index) scaled by 1/sqrt(16) — the cheap distance-preserving
    reduction that shrinks every downstream ANN/dedup payload 4x
    with bounded pairwise distortion (pinned in tests).  Pure
    integer sign arithmetic + JVM fold per output dim: stateless,
    no training pass (the contrast to PCA), identical on any engine
    or executor count."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 3 == 0
    )
    from shadems_spark.operators.similarity import as_double

    v = as_double("embedding")

    def signed(j):
        # closure factory: a `j=j` default would make PySpark treat
        # the lambda as THREE-argument (the q_feature_hash pitfall's
        # sibling); exactly (element, index) params here.
        def fn(x, i):
            s = (
                ((i * F.lit(2654435761) + F.lit(j * 40503)) % F.lit(1 << 32))
                % 2 * 2 - 1
            )
            return x * s.cast("double")

        return F.transform(v, fn)

    cols = []
    for j in range(_JL_OUT):
        y = F.aggregate(signed(j), F.lit(0.0), lambda a, x: a + x) / F.lit(4.0)
        cols.append(F.round(y, 6).alias(f"y{j}"))
    return emb.select("vec_id", *cols).orderBy("vec_id")


@register(
    "q_heavy_hitters",
    sql="""
    WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
    b AS (SELECT unnest([ws[i+1] || ' ' || ws[i+2]
                         for i in range(len(ws) - 1)]) AS bg
          FROM w),
    t AS (SELECT count(*) AS n_total FROM b),
    c AS (SELECT bg, count(*) AS n FROM b GROUP BY 1)
    SELECT bg, n, n_total,
           round(n / CAST(n_total AS DOUBLE), 6) AS freq
    FROM c, t WHERE n * 1000 > n_total
    ORDER BY n DESC, bg
    """,
)
def q_heavy_hitters(spark, sf_dir):
    """phi-heavy-hitters over corpus word bigrams, phi = 0.1%
    (operators/profile.py::heavy_hitters): per-Arrow-batch threshold
    candidates (the Misra-Gries superset guarantee, vectorized) ->
    broadcast semi-join prune -> exact recount -> pure-BIGINT final
    filter, so the result is EXACT and layout-independent while the
    plan never builds the full-vocabulary aggregate on the heavy path.
    The oracle is the plain GROUP BY ... HAVING definition.  NB: this
    fixture's bigram distribution is nearly flat (~70-90% of the 916
    bigrams are heavy at phi=0.1%), so phase-1 pruning is modest here;
    on a Zipfian web corpus the candidate set is orders of magnitude
    smaller than the vocabulary, which is the point of the shape."""
    from shadems_spark.operators.profile import heavy_hitters
    from shadems_spark.operators.text import _sliding, words

    docs = load_table(spark, sf_dir, "documents")
    bigrams = docs.select(
        F.explode(
            _sliding(words("text"), 2, lambda a, x: F.concat(a, F.lit(" "), x))
        ).alias("bg")
    )
    hh = heavy_hitters(bigrams, "bg", m=1000)
    return hh.select(
        "bg", "n", "n_total",
        F.round(F.col("n") / F.col("n_total"), 6).alias("freq"),
    ).orderBy(F.col("n").desc(), "bg")


@register(
    "q_centroid_sim",
    sql="""
    WITH e AS (SELECT label, k, CAST(round(CAST(v AS DOUBLE) * 1000000.0)
                                     AS BIGINT) AS vi
               FROM (SELECT label, unnest(embedding) AS v,
                            generate_subscripts(embedding, 1) - 1 AS k
                     FROM embeddings)),
    s AS (SELECT label, k, CAST(sum(vi) AS BIGINT) AS sv, count(*) AS n
          FROM e GROUP BY 1, 2),
    c AS (SELECT label, list(sv / (1000000.0 * n) ORDER BY k) AS cen,
                 any_value(n) AS n
          FROM s GROUP BY 1),
    p AS (SELECT a.label AS label_a, b.label AS label_b,
                 a.n AS n_a, b.n AS n_b,
                 list_reduce(list_prepend(0.0,
                     [a.cen[i+1] * b.cen[i+1] for i in range(64)]),
                     (x, y) -> x + y) AS dot,
                 sqrt(list_reduce(list_prepend(0.0,
                     [a.cen[i+1] * a.cen[i+1] for i in range(64)]),
                     (x, y) -> x + y)) AS na,
                 sqrt(list_reduce(list_prepend(0.0,
                     [b.cen[i+1] * b.cen[i+1] for i in range(64)]),
                     (x, y) -> x + y)) AS nb
          FROM c a JOIN c b ON a.label < b.label)
    SELECT label_a, label_b, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round(dot / (na * nb), 6) AS cos_sim
    FROM p ORDER BY label_a, label_b
    """,
)
def q_centroid_sim(spark, sf_dir):
    """Cluster-separation audit: cosine similarity between per-LABEL
    embedding centroids — the dashboard that tells you whether your
    class/domain clusters are collapsing (centroids drifting
    together) before you waste a training run.

    Exactness for float aggregation: each float32 component rounds to
    a MICRO int before the cross-row sum (order-free exact integers);
    the centroid mean divides once, and the 64-term cosine folds in
    component order on both engines — so a floating-point vector
    statistic gets a hash-exact oracle.  Scale: one posexplode +
    (label, k) aggregate (map-side combined, labels×64 rows out);
    the pairwise step touches a labels-sized table."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "label", F.posexplode("embedding").alias("k", "v")
    ).select(
        "label", "k",
        F.round(F.col("v").cast("double") * F.lit(1_000_000.0))
        .cast("long").alias("vi"),
    )
    s = e.groupBy("label", "k").agg(
        F.sum("vi").alias("sv"), F.count(F.lit(1)).alias("n")
    )
    c = s.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("k", "sv", "n"))),
            lambda x: x["sv"] / (F.lit(1_000_000.0) * x["n"]),
        ).alias("cen"),
        F.first("n").alias("n"),
    )
    a = c.select(
        F.col("label").alias("label_a"), F.col("cen").alias("ca"),
        F.col("n").alias("n_a"),
    )
    b = c.select(
        F.col("label").alias("label_b"), F.col("cen").alias("cb"),
        F.col("n").alias("n_b"),
    )
    dot = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nrm = lambda col: F.sqrt(
        F.aggregate(
            F.zip_with(col, col, lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a", "label_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(dot / (nrm("ca") * nrm("cb")), 6).alias("cos_sim"),
        )
        .orderBy("label_a", "label_b")
    )


@register(
    "q_embed_outliers",
    sql="""
    WITH e AS (SELECT vec_id, label, k,
                      CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT) AS vi
               FROM (SELECT vec_id, label, unnest(embedding) AS v,
                            generate_subscripts(embedding, 1) - 1 AS k
                     FROM embeddings)),
    c AS (SELECT label, k, CAST(sum(vi) AS BIGINT) AS sv, count(*) AS n
          FROM e GROUP BY 1, 2),
    d AS (SELECT e.vec_id, e.label,
                 sum((e.vi / 1000000.0 - c.sv / (1000000.0 * c.n))
                     * (e.vi / 1000000.0 - c.sv / (1000000.0 * c.n))) AS d2
          FROM e JOIN c USING (label, k) GROUP BY 1, 2),
    r AS (SELECT vec_id, label, round(sqrt(d2), 6) AS dist,
                 row_number() OVER (PARTITION BY label
                                    ORDER BY round(sqrt(d2), 6) DESC,
                                             vec_id) AS rk
          FROM d)
    SELECT vec_id, label, dist FROM r WHERE rk <= 3
    ORDER BY label, dist DESC, vec_id
    """,
)
def q_embed_outliers(spark, sf_dir):
    """Embedding outlier detection: per LABEL, the 3 vectors farthest
    (euclidean) from their own label centroid — the mislabeled-or-
    garbage screen run before fine-tuning on labeled embeddings.

    Exactness (the q_centroid_sim protocol, one step weaker):
    components micro-int-rounded once and centroids from exact
    integer sums, but the per-vector d2 is a 64-term float sum whose
    ORDER a hash aggregate does not fix — so the comparison surface
    is the 6dp-ROUNDED distance (with vec_id tie-break): 64-term sums
    at these magnitudes agree to ~1e-12 across summation orders, far
    inside the rounding, and both the ranking and the driver hash use
    only the rounded column.  Scale: one posexplode, a (label, k)
    centroid aggregate, one join back; top-3 via label-partitioned
    window."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("k", "v")
    ).select(
        "vec_id", "label", "k",
        F.round(F.col("v").cast("double") * F.lit(1_000_000.0))
        .cast("long").alias("vi"),
    )
    c = e.groupBy("label", "k").agg(
        F.sum("vi").alias("sv"), F.count(F.lit(1)).alias("n")
    )
    diff = (
        F.col("vi") / F.lit(1_000_000.0)
        - F.col("sv") / (F.lit(1_000_000.0) * F.col("n"))
    )
    d = (
        e.join(c, ["label", "k"])
        .groupBy("vec_id", "label")
        .agg(F.sum(diff * diff).alias("d2"))
    )
    rk = Window.partitionBy("label").orderBy(
        F.round(F.sqrt("d2"), 6).desc(), "vec_id"
    )
    return (
        d.withColumn("dist", F.round(F.sqrt("d2"), 6))
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= 3)
        .select("vec_id", "label", "dist")
        .orderBy("label", F.col("dist").desc(), "vec_id")
    )


@register(
    "q_inverted_index",
    sql="""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
               FROM documents),
    tf AS (SELECT term, doc_id, count(*) AS tf FROM w GROUP BY 1, 2),
    agg AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
                   string_agg(doc_id || ':' || tf, '|'
                              ORDER BY tf DESC, doc_id) AS all_postings
            FROM tf GROUP BY 1)
    SELECT term, CAST(df AS BIGINT) AS df, cf,
           CASE WHEN len(string_split(all_postings, '|')) <= 5
                THEN all_postings
                ELSE array_to_string(string_split(all_postings, '|')[1:5], '|')
           END AS postings_head
    FROM agg WHERE df >= 3 ORDER BY term
    """,
)
def q_inverted_index(spark, sf_dir):
    """Inverted-index build — the retrieval-infrastructure primitive
    under q_bm25: per term, document frequency, collection frequency,
    and the posting list head (top-5 by tf, doc_id tie-break,
    serialized 'doc:tf|...' — a STRING, not an array, because the
    driver's result canonicalizer cannot sort array cells; the full
    list shape is the same expression unbounded).  df >= 3 prunes the
    hapax tail the way real indexes shard it out.

    Scale shape: one (term, doc) aggregate (map-side combined), one
    term-keyed aggregate with an ordered collect bounded per term —
    the posting shuffle carries (term, doc, tf) triples once; at
    100 TB the same plan partitions by term into posting-list shards,
    which IS the index layout."""
    from shadems_spark.operators.text import words

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(words("text")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    agg = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.slice(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct((-F.col("tf")).alias("ntf"), "doc_id"))
                ),
                lambda x: F.concat_ws(
                    ":", x["doc_id"].cast("string"), (-x["ntf"]).cast("string")
                ),
            ),
            1, 5,
        ).alias("head"),
    )
    return (
        agg.filter(F.col("df") >= 3)
        .select(
            "term", F.col("df").cast("long").alias("df"), "cf",
            F.concat_ws("|", "head").alias("postings_head"),
        )
        .orderBy("term")
    )


_RRF_SQL = """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents),
    hits AS (SELECT doc_id, term FROM toks
             WHERE term IN ('spark', 'hash', 'window')),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM hits GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
    lens AS (SELECT doc_id, len(string_split(text, ' ')) AS dl
             FROM documents),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens),
    bscore AS (
      SELECT tf.doc_id,
             round(sum(
               ln(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
               * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             ), 6) AS score
      FROM tf JOIN dfreq USING (term)
              JOIN lens ON tf.doc_id = lens.doc_id
              CROSS JOIN stats
      GROUP BY tf.doc_id),
    lex AS (SELECT doc_id AS id, r_lex FROM (
              SELECT doc_id, CAST(row_number() OVER
                (ORDER BY score DESC, doc_id) AS INTEGER) AS r_lex
              FROM bscore) WHERE r_lex <= 20),
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
          FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    cscore AS (
      SELECT e.vec_id,
             round(list_sum(list_transform(list_zip(qv, e.v), z -> z[1] * z[2]))
                   / (sqrt(list_sum(list_transform(qv, x -> x*x)))
                      * sqrt(list_sum(list_transform(e.v, x -> x*x)))), 6) AS cos
      FROM e CROSS JOIN q WHERE e.vec_id != 0),
    sem AS (SELECT vec_id AS id, r_sem FROM (
              SELECT vec_id, CAST(row_number() OVER
                (ORDER BY cos DESC, vec_id) AS INTEGER) AS r_sem
              FROM cscore) WHERE r_sem <= 20),
    fused AS (
      SELECT id,
             COALESCE(r_lex, 0) AS r_lex,
             COALESCE(r_sem, 0) AS r_sem,
             COALESCE(CAST(floor(1000000000.0 / (60 + r_lex)) AS BIGINT), 0)
             + COALESCE(CAST(floor(1000000000.0 / (60 + r_sem)) AS BIGINT), 0)
               AS rrf
      FROM lex FULL JOIN sem USING (id))
    SELECT id, r_lex, r_sem, rrf, fused_rank FROM (
      SELECT *, CAST(row_number() OVER (ORDER BY rrf DESC, id) AS INTEGER)
                  AS fused_rank
      FROM fused)
    WHERE fused_rank <= 10
"""


@register("q_rrf_fusion", sql=_RRF_SQL)
def q_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    SIGIR'09): the BM25 top-20 for the fixed term query and the
    cosine top-20 for the vec_id=0 embedding query fuse by
    RRF(d) = sum_r 1/(60 + rank_r(d)) over the rankers that returned
    d — the standard lexical+dense hybrid-search combiner (rank-only,
    so no score calibration between incomparable scales is needed).

    Exactness: each contribution is floor(1e9/(60+rank)) — an integer
    from an integer rank, identical on both engines — so the fused
    score is an exact BIGINT sum and the fused order is engine- and
    layout-independent.

    Scale shape: both rankers end in candidate-bounded top-k (BM25 via
    TakeOrderedAndProject, cosine via the broadcast-query brute scan),
    so the fusion join and its rank window touch <= 40 rows by
    construction regardless of corpus size; the two corpus scans are
    the only data-sized work and run independently."""
    from shadems_spark.operators import similarity as SIM

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = R.bm25(docs, _BM25_TERMS, k=20).select(
        F.col("doc_id").alias("id"), F.col("rank").alias("r_lex")
    )
    sem = SIM.brute_topk(emb, emb.filter(F.col("vec_id") == 0), k=20).select(
        F.col("cand_id").alias("id"), F.col("rank").alias("r_sem")
    )

    def contrib(r):
        return F.coalesce(
            F.floor(F.lit(1000000000.0) / (F.lit(60) + r)).cast("long"),
            F.lit(0).cast("long"),
        )

    fused = lex.join(sem, ["id"], "full_outer").select(
        "id",
        F.coalesce(F.col("r_lex"), F.lit(0)).alias("r_lex"),
        F.coalesce(F.col("r_sem"), F.lit(0)).alias("r_sem"),
        (contrib(F.col("r_lex")) + contrib(F.col("r_sem"))).alias("rrf"),
    )
    # top-10 fused rank, window-free in ONE pass: the fused table is
    # <= 40 rows by construction (two top-20 rankers), so a single
    # global collect_list -> sort_array -> slice -> posexplode ranks
    # it with one exchange and no self-referencing subtree.  The r8
    # triangle-rank version referenced the fused table on both sides
    # of a broadcast join, rebuilding BM25 + cosine twice (VERDICT r8
    # #2: 1.07 s -> 1.79 s); this packs the same exact order (negated
    # BIGINT rrf asc = rrf desc, id tie-break) into a bounded array —
    # scale-safe because the array size is candidate-bounded, not
    # corpus-sized.
    packed = fused.groupBy().agg(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.col("rrf")).alias("nr"), "id", "r_lex", "r_sem"
                    )
                )
            ),
            1, 10,
        ).alias("top")
    )
    return packed.select(
        F.posexplode("top").alias("pos", "s")
    ).select(
        F.col("s.id").alias("id"),
        F.col("s.r_lex").alias("r_lex"),
        F.col("s.r_sem").alias("r_sem"),
        (-F.col("s.nr")).alias("rrf"),
        (F.col("pos") + 1).cast("int").alias("fused_rank"),
    )
