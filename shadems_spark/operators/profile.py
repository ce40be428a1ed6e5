"""Data-quality profiling (north-star pipeline utility): one-pass
per-column statistics and vocabulary coverage.

Scale shape: `profile` computes EVERY column's stats in a SINGLE
aggregation job — one scan of the table regardless of column count —
then pivots the one-row result into (column, stat) rows with a
plain Column `stack`, driver-free.  The multi-countDistinct agg uses
Spark's Expand-based rewrite (rows × n_distinct_aggs before the
partial agg); for a 100 TB profile swap ``exact=False`` to
approx_count_distinct, which keeps the scan single-pass and the
state HLL-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType


def profile(df: DataFrame, cols: list[str] | None = None, exact: bool = True) -> DataFrame:
    """Per-column stats in one scan: rows, nulls, distinct, numeric
    min/max (null for strings), string min/max (null for numerics).

    Returns (column, n_rows, n_null, n_distinct, min_num, max_num,
    min_str, max_str), one row per profiled column."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = cols or [
        n for n, t in fields.items()
        if isinstance(t, (NumericType, StringType))
    ]
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        num = isinstance(fields[c], NumericType)
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__null"),
            distinct(F.col(c)).alias(f"{c}__dist"),
            (F.min(c).cast("double") if num else F.lit(None).cast("double")).alias(f"{c}__minn"),
            (F.max(c).cast("double") if num else F.lit(None).cast("double")).alias(f"{c}__maxn"),
            (F.lit(None).cast("string") if num else F.min(c)).alias(f"{c}__mins"),
            (F.lit(None).cast("string") if num else F.max(c)).alias(f"{c}__maxs"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__null`, `{c}__dist`, `{c}__minn`, `{c}__maxn`, `{c}__mins`, `{c}__maxs`"
        for c in cols
    )
    return one.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_null, n_distinct, min_num, max_num, min_str, max_str)",
    ).select(
        "column", "n_rows", "n_null", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )


def vocab_coverage(
    df: DataFrame, text: str = "text", top: int = 100
) -> DataFrame:
    """Vocabulary build + coverage curve: top-``top`` words by corpus
    frequency with rank and cumulative coverage share (the how-big-
    must-the-vocab-be question of tokenizer design).

    The corpus-sized work is the (word, count) aggregation with
    map-side combine; the ordered cumulative window then runs on the
    VOCABULARY-sized table only (single-partition by nature, small by
    construction — document-scale data never enters the window)."""
    from pyspark.sql import Window

    from shadems_spark.operators.text import words

    wc = (
        df.select(F.explode(words(text)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # vocabulary-sized table (≤ distinct words).  The cumulative
    # coverage curve needs ONE totally-ordered pass by construction;
    # the constant partition key says so explicitly.  At true 100 TB
    # vocab (~1e8 rows) this single partition is the known cost of an
    # exact CDF — cap upstream (min-count filter) before calling.
    order = Window.partitionBy(F.lit(0)).orderBy(F.col("n").desc(), F.col("w"))
    total = Window.partitionBy(F.lit(0))
    return (
        wc.withColumn("rk", F.row_number().over(order))
        .withColumn(
            "coverage",
            F.round(
                F.sum("n").over(order.rowsBetween(Window.unboundedPreceding, 0))
                / F.sum("n").over(total),
                6,
            ),
        )
        .filter(F.col("rk") <= top)
        .select("w", "n", "rk", "coverage")
    )


def global_index(
    df: DataFrame,
    order: list[str],
    out: str = "gid",
    n_parts: int = 32,
) -> DataFrame:
    """Scalable global row numbering in total ``order`` (must be a
    total order — include a unique key as the last column).

    The naive row_number() over a global window moves EVERY row to one
    partition; this is the two-pass shape that scales: range-partition
    on the order key, number rows within each partition, then add each
    partition's cumulative offset (a partitions-sized table whose
    cumsum rides a tiny window, broadcast back).  No driver collect,
    no single-partition stage over the data; numbering is invariant to
    the sampled partition boundaries because ``order`` is total."""
    from pyspark.sql import Window

    cols = [F.col(c) for c in order]
    parts = df.repartitionByRange(n_parts, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(*cols)
    local = parts.withColumn("__rn", F.row_number().over(w_local))
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.partitionBy(F.lit(0)).orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )


def heavy_hitters(items: DataFrame, col: str, m: int) -> DataFrame:
    """EXACT phi-heavy-hitters (phi = 1/m) in two phases — the shape
    frequency estimation takes at corpus scale, where a plain
    GROUP BY over every distinct key would shuffle the full vocabulary
    but only the tiny heavy tail is wanted.

    Phase 1 (candidates, one scan, no shuffle of data rows): every
    Arrow batch counts its own items vectorized (pandas value_counts)
    and emits only those with batch_count * m > batch_size.  By
    pigeonhole this is a SUPERSET of the true heavy hitters: an item
    with global count > N/m must exceed n_b/m in at least one batch of
    any partition of the stream (if it never did, summing the per-
    batch bound gives count <= N/m).  Each batch emits fewer than m
    items, so candidate volume is bounded by batches x m and in
    practice by the Zipf head.  This is the Misra-Gries guarantee with
    exact per-batch counting in place of the counter-eviction loop —
    same bound, Arrow-vectorized instead of a per-row Python dict.

    Phase 2 (exact recount): the distinct candidate set broadcasts
    back onto the stream as a semi-join prune, the survivors get an
    exact map-side-combined count, and the final filter
    ``n * m > N`` runs in pure BIGINT arithmetic — so the OUTPUT is
    exactly the true heavy-hitter set with exact counts, independent
    of batch/partition layout (phase 1 only ever over-selects).
    That layout-independence is what lets a sketch-shaped plan carry
    a hash-exact SQL oracle.

    Returns (col, n BIGINT, n_total BIGINT) for every item with
    n * m > n_total."""
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    def _candidates(batches):
        for pdf in batches:
            vc = pdf[col].value_counts()
            yield pd.DataFrame({col: vc[vc * m > len(pdf)].index})

    cand = items.mapInPandas(_candidates, schema=f"{col} string").distinct()
    n_total = items.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (
        items.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return exact.crossJoin(F.broadcast(n_total)).filter(
        F.col("n") * m > F.col("n_total")
    )


def bloom_bits(gram, m: int, k: int):
    """The k bit positions a gram string sets/probes in an m-bit Bloom
    filter, as an array<long> Column.

    Cross-engine-exact by construction: the base hash is the shared
    31-polynomial char fold mod FP_MOD (operators/text.word_buckets —
    the hash every DuckDB oracle reproduces with list_reduce), and the
    k probe positions derive from it with pure-integer double hashing
    ``(h*(2j+1) + 97j) % FP_MOD % m`` — so Spark, the SQL oracle, and
    any partition layout set the IDENTICAL bit set, false positives
    included.  That determinism is what lets a probabilistic structure
    carry a hash-exact oracle.

    100-TB shape: the filter itself is the POINT at scale — a
    benchmark gram set too big to broadcast collapses to m bits
    (distinct set-bit rows here, a bitmap in a production sink), so
    membership probing is a broadcast join however large the source
    set was.  Spark's built-in stat.bloomFilter builds the same
    structure JVM-side but is not reproducible outside Spark, hence
    this declarative twin."""
    from shadems_spark.operators.text import FP_MOD, poly_hash

    g = F.col(gram) if isinstance(gram, str) else gram
    return bloom_bits_from_hash(poly_hash(g), m, k)


def bloom_bits_from_hash(h, m: int, k: int):
    """The k probe positions given an ALREADY-COMPUTED base hash
    Column.  Use this two-step form on data-sized frames: the fused
    ``bloom_bits`` re-evaluates the char-fold hash once per probe
    (k x; same duplication mode the winnowing operator documents) —
    compute ``poly_hash`` in its own select, then derive the k
    positions from the column with pure integer arithmetic."""
    from shadems_spark.operators.text import FP_MOD as _MOD

    return F.array(
        *[
            (h * F.lit(2 * j + 1) + F.lit(97 * j)) % F.lit(_MOD) % F.lit(m)
            for j in range(k)
        ]
    )
