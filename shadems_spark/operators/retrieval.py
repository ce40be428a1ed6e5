"""Text retrieval + corpus-preparation operators for training-data
pipelines (north-star suite, beyond SURVEY.md §2): TF-IDF term
weighting, BM25 ranked retrieval, fixed-window document chunking,
int8 embedding quantization, and deterministic stratified splits.

Design for 100 TB:
- the (doc, term) table is built ONCE per pipeline with map-side
  combine (explode -> groupBy count); every consumer shares it;
- document-frequency / corpus totals are tiny aggregates carried via
  broadcast join or a whole-frame window over an already-small table,
  never a driver collect on the fact side;
- BM25 pushes the query-term filter BELOW the aggregation, so only
  rows matching the handful of query terms survive the shuffle;
- chunking and quantization are pure per-row Column expressions —
  no shuffle at all;
- the stratified split is hash-deterministic (Knuth multiplicative),
  so re-runs and task retries assign every document identically with
  zero coordination state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from shadems_spark.operators.hashing import knuth32
from shadems_spark.operators.text import words


def doc_terms(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """The shared (doc, term, tf) table: explode whitespace tokens and
    count per (doc, term).  ONE shuffle keyed on (doc, term) with
    map-side combine; every retrieval consumer reuses this."""
    return (
        df.select(id_col, F.explode(words(text)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Per-document token counts (the BM25 length normalizer)."""
    return df.select(id_col, F.size(words(text)).cast("long").alias("dl"))


def tf_idf(
    terms: DataFrame,
    id_col: str = "doc_id",
    top_per_doc: int | None = 3,
) -> DataFrame:
    """TF-IDF over a (doc, term, tf) table.

    df(term) is a groupBy on the already-aggregated term table —
    second shuffle keyed on term, output ~vocabulary-sized.  N rides a
    whole-frame window over that SMALL table (no extra corpus count
    job).  idf = ln((N+1)/(df+1)) + 1 (smoothed); score = tf * idf,
    rounded 6dp (libm ln — harness rounding convention).

    ``top_per_doc`` keeps the highest-scoring terms per document
    (score desc, term asc tie-break) — the usual keyword-extraction
    shape and a bounded output at any corpus size."""
    dfreq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = terms.select(F.countDistinct(id_col).alias("n"))
    scored = (
        terms.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n") + 1.0) / (F.col("df_t") + 1.0))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
        .select(id_col, "term", "tf", "df_t", "tfidf")
    )
    if top_per_doc is None:
        return scored
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_per_doc)
        .select(id_col, "term", "tf", "df_t", "tfidf", "rk")
    )


def bm25(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval for one query (a list of terms).

    Scale shape: the exploded token stream is FILTERED to the query
    terms before any shuffle — for a q-term query only matching
    (doc, term) rows reach the aggregation, so the shuffle is
    O(matching postings), not O(corpus tokens).  Document frequencies
    and avgdl are tiny aggregates joined by broadcast.  Final top-k is
    a single whole-frame window over per-doc scores that already
    collapsed to <= one row per matching doc.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5));
    score = sum_t idf_t * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
    rounded 6dp."""
    toks = docs.select(id_col, F.explode(words(text)).alias("term"))
    hits = toks.filter(F.col("term").isin(query_terms))
    tf = hits.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    lens = doc_lengths(docs, id_col, text)
    stats = lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    contrib = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    # Two-phase global top-k: orderBy().limit(k) compiles to
    # TakeOrderedAndProject (per-partition partial top-k, merged) —
    # the corpus-sized scored table never lands on one partition.
    # The k survivors rank via the broadcast triangle join (negated
    # score = exact desc order on a 6dp-rounded double): no
    # WindowExec anywhere in the plan (VERDICT r7 #5).
    from shadems_spark.operators.profile import triangle_rank

    topk = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    ranked = triangle_rank(
        topk.withColumn("__negs", -F.col("score")),
        ["__negs", id_col],
        out="rank",
    )
    return ranked.select(
        id_col, "score", F.col("rank").cast("int").alias("rank")
    )


def chunk_docs(
    df: DataFrame,
    chunk_size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Fixed-window document chunking with overlap (the pre-tokenize
    split step of a training pipeline): windows of ``chunk_size``
    tokens starting every ``stride`` tokens.

    Pure per-row Column expressions — sequence of window starts,
    posexplode, slice — NO shuffle; output rows ~ tokens/stride per
    document.  chunk_idx derives from the start offset so it is
    order-free (no ordinality dependence between engines)."""
    ws = words(text)
    starts = F.sequence(F.lit(1), F.greatest(F.size(ws), F.lit(1)), F.lit(stride))
    exploded = df.select(
        id_col,
        F.size(ws).cast("long").alias("doc_tokens"),
        F.explode(starts).alias("start"),
        ws.alias("__ws"),
    )
    chunk = F.slice(F.col("__ws"), F.col("start"), F.lit(chunk_size))
    return exploded.select(
        id_col,
        "doc_tokens",
        ((F.col("start") - 1) / stride + 1).cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def quantize_vec(vec: Column, out_scale: str | None = None) -> Column:
    """Symmetric int8 quantization of a double array: q_i = round
    HALF_UP(x_i / max|x| * 127).  Keeps sign structure; the scale
    cancels in cosine, so quantized cosine needs no dequantization.
    8 bytes -> 1 byte per component: a 4-8x smaller shuffle/storage
    payload for every downstream ANN stage at 100 TB."""
    m = F.aggregate(
        vec, F.lit(0.0), lambda s, x: F.greatest(s, F.abs(x))
    )
    # floor(x*127/m + 0.5) with sign handling = HALF_UP, matching both
    # engines exactly in integer space.
    return F.transform(
        vec,
        lambda x: F.when(m == 0, F.lit(0))
        .otherwise(
            F.signum(x) * F.floor(F.abs(x) * 127.0 / m + 0.5)
        )
        .cast("int"),
    )


def quantized_cosine(qa: Column, qb: Column) -> Column:
    """Cosine over int8-quantized vectors — integer dot products in
    double accumulation (exact: |sum| < 127^2 * dim << 2^53)."""
    d = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(qa, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(qb, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    return d / (na * nb)


def stratified_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = Knuth
    multiplicative hash of the id mod 100.  Pure per-row arithmetic —
    identical under task retry, re-run, and engine (the oracle mirrors
    the same integer expression); no sampling state, no shuffle."""
    # decimal-exact product (operators/hashing.py): the long form
    # overflows for ids >= ~3.47e9 (snowflake-scale); values identical
    # in-range, so the integer-mirroring oracles still hash-match
    bucket = knuth32(id_col) % 100
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def split_report(df: DataFrame, strat_col: str = "lang") -> DataFrame:
    """Per-(stratum, split) counts + within-stratum share — the
    verification report that the hash split is balanced."""
    counts = df.groupBy(strat_col, "split").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(strat_col)
    return counts.select(
        strat_col,
        "split",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("share"),
    )

def mmr_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998): greedily pick argmax of
    ``lam*relevance - (1-lam)*max_sim_to_already_selected``.

    Spark-first shape: candidate generation is the fully distributed
    ``brute_topk`` scan (broadcast queries, one pass over the corpus);
    relevances AND candidate-candidate sims are computed JVM-side
    (zip_with/aggregate left fold, rounded 6dp — the house
    cross-engine convention).  The greedy loop itself is inherently
    sequential per query but bounded (n_candidates rows by contract),
    so it runs as ONE cogrouped applyInPandas keyed on q_id — a
    single shuffle of |q|*n_candidates fixed-width rows; ten or ten
    thousand queries re-rank in the same stage, nothing collects to
    the driver and no k-deep iterative plan is built.

    Cross-engine determinism: the blended score is EXACT integer
    arithmetic — lam as the rational round(lam*1000)/1000 over
    1e6-scaled rel/pen — so no round() ever lands on a half-way
    boundary (Spark rounds the shortest-decimal repr, DuckDB the
    exact binary double).  mmr = (lam_i*rel_i - (1000-lam_i)*pen_i)
    / 1e9; ordering and tie-breaks compare the scaled integers.

    Returns (q_id, step, cand_id, mmr) — step is the 1-based greedy
    pick order.
    """
    import pandas as pd

    from shadems_spark.operators.similarity import as_double, brute_topk, cosine

    lam_i = int(round(lam * 1000))

    cand = brute_topk(emb, queries, k=n_candidates, id_col=id_col, vec=vec)
    vecs = emb.select(F.col(id_col).alias("cand_id"), as_double(vec).alias("cv"))
    # cv feeds three consumers, but A/B measured a persist as a wash
    # here (the corpus-scan exchange is reused within the one job and
    # the candidate table is tiny) — keep the plan stateless.
    cv = cand.join(vecs, "cand_id").select(
        "q_id", "cand_id", F.col("cos").alias("rel"), "cv"
    )
    a, b = cv.alias("a"), cv.alias("b")
    sims = a.join(
        b,
        (F.col("a.q_id") == F.col("b.q_id"))
        & (F.col("a.cand_id") != F.col("b.cand_id")),
    ).select(
        F.col("a.q_id").alias("q_id"),
        F.col("a.cand_id").alias("ia"),
        F.col("b.cand_id").alias("ib"),
        F.round(cosine(F.col("a.cv"), F.col("b.cv")), 6).alias("s"),
    )

    def greedy(key, cands: pd.DataFrame, spdf: pd.DataFrame) -> pd.DataFrame:
        ids = cands["cand_id"].to_numpy()
        rel_i = (cands["rel"].to_numpy() * 1e6).round().astype("int64")
        pos = {int(c): i for i, c in enumerate(ids)}
        n = len(ids)
        # scaled-integer sim matrix (missing pair => no penalty contribution)
        smat = [[None] * n for _ in range(n)]
        for ia, ib, s in zip(spdf["ia"], spdf["ib"], spdf["s"]):
            smat[pos[int(ia)]][pos[int(ib)]] = int(round(s * 1e6))
        taken: list[int] = []
        out = []
        for step in range(1, min(k, n) + 1):
            best = None
            for i in range(n):
                if i in taken:
                    continue
                pen = max((smat[i][j] for j in taken if smat[i][j] is not None),
                          default=0)
                score = lam_i * int(rel_i[i]) - (1000 - lam_i) * pen
                cand_key = (-score, int(ids[i]))
                if best is None or cand_key < best[0]:
                    best = (cand_key, i, score)
            _, i, score = best
            taken.append(i)
            out.append((int(key[0]), step, int(ids[i]), score / 1e9))
        return pd.DataFrame(out, columns=["q_id", "step", "cand_id", "mmr"])

    return (
        cv.drop("cv")
        .groupBy("q_id")
        .cogroup(sims.groupBy("q_id"))
        .applyInPandas(
            greedy, "q_id long, step int, cand_id long, mmr double"
        )
        .orderBy("q_id", "step")
    )
