"""Corpus-curation operators for training-data pipelines:
benchmark decontamination, repetition-based quality filtering, PII
scrubbing, deterministic stratified sampling (domain mixing), and
sequence packing.

The reference has no curation surface at all ([R] shade_ms is a
read-only plotter); these cover the north-star LLM-pipeline ops the
driver's ``documents`` table exists for.  Design rules: pure Column
expressions or single-shuffle aggregations only — every operator here
is a linear scan plus at most one shuffle, the shape that survives a
100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from shadems_spark.operators.text import ngram_hashes, words

#: PII patterns (Java regex and RE2 compatible — no lookbehind).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]\d{3,4}",
}


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: per-document fraction of word
    ``n``-grams that also occur in the benchmark set.

    The benchmark gram table (distinct hashed grams) is tiny relative
    to the corpus — Spark broadcast-joins it, so the corpus side never
    shuffles: one scan, map-side join, one groupBy(doc) on data
    already partitioned by the explode.  Grams compare by xxhash64
    (8 bytes each) exactly as operators/dedup.py does.

    Returns (id_col, matched, total, overlap) for every document that
    shares at least one gram; callers threshold on ``overlap``.
    """
    bench_grams = (
        benchmark.select(F.explode(ngram_hashes(words(text), n)).alias("g"))
        .distinct()
    )
    # total rides along through the explode so the corpus is scanned
    # exactly once and no totals join is needed afterwards.
    doc_grams = docs.withColumn("_grams", ngram_hashes(words(text), n)).select(
        id_col,
        F.size("_grams").alias("total"),
        F.explode("_grams").alias("g"),
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("matched"),
            F.first("total").alias("total"),
        )
        .select(
            id_col,
            "matched",
            "total",
            F.round(F.col("matched") / F.col("total"), 6).alias("overlap"),
        )
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Gopher-style repetition metrics per document:

    - ``dup_frac``  = 1 − distinct_words / words (duplicate-word mass)
    - ``top_frac``  = count(most frequent word) / words

    Computed by explode → two-level hash aggregate; the first level
    (doc, word) is partial-aggregated map-side, so the shuffle carries
    one row per distinct (doc, word), not per token.
    """
    toks = df.select(id_col, F.explode(words(text)).alias("w"))
    per_word = toks.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("n"))
    return per_word.groupBy(id_col).agg(
        F.sum("n").alias("n_words"),
        F.count(F.lit(1)).alias("n_uniq"),
        F.round(F.max("n") / F.sum("n"), 6).alias("top_frac"),
        F.round(F.lit(1.0) - F.count(F.lit(1)) / F.sum("n"), 6).alias("dup_frac"),
    )


def scrub_pii(
    df: DataFrame, col: str, out: str = "clean", patterns: dict[str, str] | None = None
) -> DataFrame:
    """PII scrubbing: replace every match of each pattern with
    ``[<NAME>]`` and count redactions per row (``n_redacted``).

    Pure regexp_replace/regexp_count chain — JVM-side, codegen'd, no
    UDF.  Patterns avoid lookaround so the same strings run under
    Java regex (Spark) and RE2 (DuckDB oracle).
    """
    pats = patterns or PII_PATTERNS
    clean = F.col(col)
    count = F.lit(0)
    for name, pat in pats.items():
        count = count + F.regexp_count(clean, F.lit(pat))
        clean = F.regexp_replace(clean, pat, f"[{name.upper()}]")
    return df.withColumns({out: clean, "n_redacted": count.cast("long")})


def stratified_sample(
    df: DataFrame,
    rates: DataFrame,
    key_col: str,
    stratum_col: str,
    denom: int = 1000,
) -> DataFrame:
    """Deterministic stratified (systematic) sampling — the "domain
    mixing" primitive: keep a row iff ``key % denom < rate·denom`` for
    its stratum's rate.

    ``rates`` is a (stratum, rate) table — broadcast-joined, so the
    corpus never shuffles and the same rows are kept on every run and
    every engine (unlike ``df.sample``, which is rng/partitioning
    dependent).  Resampling a 100 TB corpus to a target domain mixture
    is one map-side scan.
    """
    r = rates.select(
        F.col(stratum_col),
        (F.col("rate") * denom).cast("long").alias("_cut"),
    )
    return (
        df.join(F.broadcast(r), stratum_col)
        .filter(F.pmod(F.col(key_col), F.lit(denom)) < F.col("_cut"))
        .drop("_cut")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "tokens",
    stream_col: str = "lang",
) -> DataFrame:
    """Sequence packing (concat-then-chunk): documents of one stream,
    in ``id_col`` order, concatenate into a token stream that is cut
    into fixed ``budget``-token contexts; a document's pack is the
    chunk its first token lands in.

    ``pack_id = (running_sum − tokens) // budget`` — a window
    cumulative sum per stream.  The only shuffle is the partition-by-
    stream sort; at 100 TB the stream key should be (domain, shard) so
    each sorted run fits an executor, which this exposes via
    ``stream_col``.  Integer arithmetic end-to-end, so any SQL engine
    reproduces it bit-exactly.
    """
    w = (
        Window.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return df.withColumn(
        "pack_id", ((cum - F.col(token_col)) / budget).cast("long")
    )


def gopher_rules(df: DataFrame, text: str = "text") -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1, the
    public heuristics): word count bounds, mean word length bounds,
    symbol-to-word ratio, and the fraction of words containing an
    alphabetic character.  Pure Column expressions — one pruned scan,
    no UDF; each rule is exposed as a column plus a combined pass
    flag so pipelines can filter or audit rule-by-rule."""
    ws = F.split(F.col(text), " ")
    n_words = F.size(ws)
    mean_wl = F.round(
        F.aggregate(
            ws, F.lit(0.0), lambda a, w: a + F.length(w).cast("double")
        )
        / n_words,
        4,
    )
    symbols = F.length(F.col(text)) - F.length(
        F.regexp_replace(F.col(text), "[^A-Za-z0-9 ]", "")
    )
    sym_ratio = F.round(symbols.cast("double") / n_words, 6)
    alpha_frac = F.round(
        F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).cast("double") / n_words,
        6,
    )
    passes = (
        n_words.between(3, 100000)
        & mean_wl.between(2.0, 12.0)
        & (sym_ratio < 1.0)
        & (alpha_frac >= 0.8)
    )
    return df.withColumns(
        {
            "n_words": n_words.cast("long"),
            "mean_word_len": mean_wl,
            "symbol_ratio": sym_ratio,
            "alpha_word_frac": alpha_frac,
            "passes_gopher": passes.cast("int"),
        }
    )
