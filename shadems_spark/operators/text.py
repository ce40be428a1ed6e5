"""Text-analysis operators for training-data pipelines (SURVEY.md §2
M4/M5 + north-star text ops): tokenization, document stats, quality
scoring, token counting, rolling-hash fingerprinting, and an n-gram
language-ID heuristic.

Everything except lang-ID profiles is a pure Column expression over
`split`/`transform`/`aggregate` — JVM-side, no UDFs, linear scans that
scale to any corpus size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FP_MOD = 1_000_000_007


def words(text: Column | str) -> Column:
    """Whitespace tokenization."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def _sliding(ws: Column, n: int, combine) -> Column:
    """Sliding-window fold over ``n`` aligned shifted slices of ``ws``.

    zip_with over pre-shifted slices is O(len) total per row; the naive
    transform(sequence, i -> f(slice(ws, i, n))) alternative re-slices
    per position (O(len·n)) and measured 4x slower at sf0.1."""
    length = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    acc = F.slice(ws, 1, length)
    for i in range(2, n + 1):
        acc = F.zip_with(acc, F.slice(ws, i, length), combine)
    return acc


def word_ngrams(ws: Column, n: int = 3, distinct: bool = True) -> Column:
    """Sequence-sensitive word n-grams (the shingle set for dedup)."""
    grams = _sliding(ws, n, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(grams) if distinct else grams


def ngram_hashes(ws: Column, n: int = 3, distinct: bool = True) -> Column:
    """Hashed word n-grams: xxhash64 each word once, combine windows
    with xxhash64(a, b) — pure int64 arithmetic, no string concat.

    Equality on the 64-bit gram hash stands in for gram equality
    (collision odds ~ birthday(2^64); negligible below ~10^9 distinct
    shingles per join key space).  This keeps shingle shuffles and
    join keys at 8 bytes/gram regardless of document size — the shape
    that survives a 100 TB corpus."""
    wh = F.transform(ws, lambda w: F.xxhash64(w))
    grams = _sliding(wh, n, lambda a, b: F.xxhash64(a, b))
    return F.array_distinct(grams) if distinct else grams


def text_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """M4: per-document stats — chars, words, distinct words,
    mean word length."""
    ws = words(text)
    return df.withColumns(
        {
            "n_chars_c": F.length(text).cast("long"),
            "n_words": F.size(ws).cast("long"),
            "n_uniq": F.size(F.array_distinct(ws)).cast("long"),
            "mean_word_len": F.round(
                F.aggregate(
                    F.transform(ws, lambda w: F.length(w).cast("double")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / F.size(ws),
                4,
            ),
        }
    )


def token_count(df: DataFrame, text: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish estimate
    (ceil(chars/4) — the standard subword-per-4-chars heuristic)."""
    return df.withColumns(
        {
            "ws_tokens": F.size(words(text)).cast("long"),
            "bpe_tokens": F.ceil(F.length(text) / F.lit(4.0)).cast("long"),
        }
    )


def quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Quality scoring: bounded components for length, word length
    sanity, and lexical diversity — deterministic arithmetic so the
    oracle can mirror it exactly."""
    ws = words(text)
    n_words = F.size(ws).cast("double")
    n_uniq = F.size(F.array_distinct(ws)).cast("double")
    len_score = F.least(F.lit(1.0), F.length(text).cast("double") / F.lit(400.0))
    diversity = n_uniq / n_words
    return df.withColumn(
        "quality", F.round((len_score + diversity) / F.lit(2.0), 6)
    )


def fingerprint(df: DataFrame, text: str = "text", out: str = "fp") -> DataFrame:
    """Rolling-hash document fingerprint: fold (acc*31 + elem) mod p
    over per-word codes — order-sensitive, so reordered documents get
    different fingerprints (unlike bag-of-words hashes)."""
    elems = F.transform(
        words(text),
        lambda w: (F.length(w) * F.lit(7) + F.ascii(F.substring(w, 1, 1))).cast("long"),
    )
    acc = F.aggregate(
        elems,
        F.lit(0).cast("long"),
        lambda a, e: (a * F.lit(31) + e) % F.lit(FP_MOD),
    )
    return df.withColumn(out, acc)


def lang_profiles(df: DataFrame, text: str = "text", lang: str = "lang", top: int = 40) -> DataFrame:
    """Language-ID training pass: the ``top`` most frequent words per
    labeled language (an n-gram/stopword profile).  One aggregation
    over the corpus; the profile table is tiny and broadcastable."""
    from pyspark.sql import Window

    w = (
        df.select(lang, F.explode(words(text)).alias("w"))
        .groupBy(lang, "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rk = Window.partitionBy(lang).orderBy(F.col("n").desc(), F.col("w"))
    return w.withColumn("rk", F.row_number().over(rk)).filter(F.col("rk") <= top).drop("rk")


def lang_id(df: DataFrame, profiles: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Language-ID scoring pass: explode doc words, broadcast-join the
    profile table, pick argmax(match count, tie-break lang name) per
    doc.  Scales as one shuffle on doc_id."""
    from pyspark.sql import Window

    toks = df.select(id_col, F.explode(words(text)).alias("w"))
    scored = (
        toks.join(F.broadcast(profiles.select(F.col("lang").alias("cand"), "w")), "w")
        .groupBy(id_col, "cand")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    pick = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("cand"))
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(id_col, F.col("cand").alias("pred_lang"), "score")
    )


def nfc_udf():
    """Unicode NFC normalization as an Arrow-batched pandas UDF — Spark
    has no normalization builtin (collations normalize for COMPARISON
    only); the per-batch ICU-equivalent (unicodedata) call is the
    sanctioned vectorized Python path.  Pure per-row map: no shuffle,
    embarrassingly parallel at any scale."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc


def strip_accents_udf():
    """Accent folding: NFD-decompose then drop combining marks (Mn) —
    the same rule utf8proc's strip_accents applies, so DuckDB can
    oracle-check it exactly for Latin text."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _strip(s: pd.Series) -> pd.Series:
        import unicodedata

        def f(x):
            if x is None:
                return None
            return "".join(
                ch
                for ch in unicodedata.normalize("NFD", x)
                if unicodedata.category(ch) != "Mn"
            )

        return s.map(f)

    return _strip
