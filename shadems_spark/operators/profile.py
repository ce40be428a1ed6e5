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

from itertools import count

from pyspark.sql import Column, DataFrame
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
    map-side combine.  Only the ``top`` survivors are ranked: the
    head extraction is TakeOrderedAndProject (per-partition partial
    top-k, merged), the grand total rides a 1-row broadcast, and the
    rank + cumulative count over the ``top``-row head ride the
    broadcast triangle join (negated count = exact desc order on a
    long) — window-free end to end (VERDICT r7 #5; the r6 form still
    planned a bounded single-partition window here)."""
    from shadems_spark.operators.text import words

    wc = (
        df.select(F.explode(words(text)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = wc.agg(F.sum("n").alias("__tot"))
    head = wc.orderBy(F.col("n").desc(), "w").limit(top).withColumn(
        "__negn", -F.col("n")
    )
    ranked = triangle_rank(head, ["__negn", "w"], out="rk")
    cum = triangle_cumsum(ranked, ["__negn", "w"], {"__cum": "n"})
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            "w", "n",
            F.col("rk").cast("int").alias("rk"),
            F.round(F.col("__cum") / F.col("__tot"), 6).alias("coverage"),
        )
    )


# Memo of df-independent Column fragments (see operators/exprcache
# for the rationale and rules): the two-phase operators' HOF
# fragments cost hundreds of py4j round-trips each to construct, paid
# on every bench rep because builders re-run per rep.
from shadems_spark.operators.exprcache import memo as _memo


def _offsets_row(counts: DataFrame, srcs: list[str]) -> DataFrame:
    """Fold the <= n_parts-row per-bucket totals table (keyed ``__b``)
    into ONE row carrying, per source column, (a) a ``__offmap_<src>``
    map from bucket id to that column's EXCLUSIVE prefix sum in bucket
    order and (b) the grand total ``__tot_<src>``.

    Why this shape: the offsets side of every two-phase rank/cumsum
    operator must reach the data rows somehow, and each extra join or
    aggregate is another blocking AQE materialization (~0.1 s of pure
    scheduling per call at fixture scale).  Collapsing offsets AND
    totals into a single 1-row broadcast costs one collect_list
    aggregate and an O(n_parts^2) array HOF — nothing at n_parts <=
    a few thousand — and leaves ZERO empty-partition-spec WindowExec
    nodes in the plan (the `No Partition Defined` warning class the
    bench tail must stay free of, VERDICT r5 #1 done-criterion)."""
    srcs_t = tuple(srcs)
    pn = _memo(
        ("offs_pn", srcs_t),
        lambda: F.sort_array(
            F.collect_list(
                F.struct(F.col("__b"), *[F.col(s) for s in srcs])
            )
        ).alias("__pn"),
    )
    row = counts.agg(pn)

    def _build_outs():
        outs = []
        for s in srcs:
            # Null map on EMPTY input: with zero buckets ``__pn`` is
            # [], F.sequence(1, 0) auto-descends and element_at(.., 0)
            # errors (ADVICE r6).  CaseWhen is lazily evaluated, so
            # the guarded branch never runs on the empty row — and no
            # data row exists to look the null map up, so downstream
            # stays empty-correct.
            outs.append(
                F.when(
                    F.size("__pn") > 0,
                    F.map_from_entries(
                        F.transform(
                            F.sequence(F.lit(1), F.size("__pn")),
                            lambda i: F.struct(
                                F.element_at("__pn", i)["__b"].alias("k"),
                                F.aggregate(
                                    F.slice("__pn", F.lit(1), i - 1),
                                    F.lit(0).cast("long"),
                                    lambda a, x: a + x[s],
                                ).alias("v"),
                            ),
                        )
                    ),
                ).alias(f"__offmap_{s}")
            )
            outs.append(
                F.aggregate(
                    "__pn", F.lit(0).cast("long"), lambda a, x: a + x[s]
                ).alias(f"__tot_{s}")
            )
        return outs

    return row.select(*_memo(("offs_outs", srcs_t), _build_outs))


_SHARE_SEQ = count()

#: persist the _bucketed input only when its estimated size crosses
#: this threshold (bytes).  Runtime-overridable via the SQL conf
#: ``spark.shadems.share.threshold`` — set "0" to always share (the
#: unit tests pin result-equivalence of the shared path that way).
_SHARE_THRESHOLD = 256 * 1024 * 1024


def _est_bytes(df: DataFrame) -> int:
    """Catalyst's size-in-bytes estimate of the frame's analyzed plan
    (driver-only; no job).  Unknown -> 0 (inline: the local-safe
    choice — at production scale parquet-derived estimates exist)."""
    try:
        return int(df._jdf.queryExecution().analyzed().stats().sizeInBytes())
    except Exception:  # pragma: no cover - stats visitor always works
        return 0


def _share(df: DataFrame, tag: str, bounded: bool = True) -> DataFrame:
    """Persist (MEMORY_AND_DISK, tracked) a frame this operator is
    about to reference from MULTIPLE physical plan branches — when the
    saved recomputation plausibly outweighs the materialization
    barrier.

    Why (r11 optimization, guide §2.4/§5): every two-phase operator
    here fans its input into 2-3 sibling subtrees (value-cut sample +
    windowed data + per-bucket totals; both sides of a triangle
    self-join).  Catalyst's per-branch column pruning makes those
    subtrees textually DIFFERENT, so ReuseExchange never dedupes them
    and the input's whole lineage — typically a scan + aggregate of a
    data-sized table — executes once PER BRANCH (measured r11: q_rfm's
    static plan held 14 parquet scans of orders, q_skyline 17, with
    zero ReusedExchange nodes).

    Measured policy (r11, interleaved A/B at sf0.1 local[32]):

    * ``bounded=True`` (triangle self-joins — inputs <= ~4k rows by
      operator contract, but with arbitrarily deep lineage): persist
      ALWAYS.  The cache write is a few KB; the win is one whole saved
      execution of the lineage (at 100 TB, one full pass).  Local
      bench: q_bm25 1.03 -> 0.87 s, q_shapley/q_rrf neutral.
    * ``bounded=False`` (_bucketed — the input is the DATA-SIZED table
      being ranked): persist only past a SIZE THRESHOLD.  Measured at
      sf0.1, an unconditional persist made every ntile/cumsum consumer
      SLOWER (q_rfm 2.95 -> 5.6 s, q_lorenz 1.68 -> 3.03 s, q_abc
      1.44 -> 2.02 s interleaved medians): the blocking cache
      materialization serializes AQE stages that previously ran as
      concurrent (redundant) branches — redundant compute is free on
      an under-utilized local box, barriers are not.  Past the
      threshold that trade inverts: each avoided branch is a full
      scan+shuffle pass over the input, and 2 extra passes of a
      >256 MB table dwarf one cache write.  Cost-based, like
      autoBroadcastJoinThreshold — NOT a local[32]-only tuning.

    Keys are unique per call (no two operator calls evict each other);
    the bench/oracle harnesses release them at query boundaries via
    release_persist().  Streaming frames pass through unpersisted
    (persist is illegal on them).

    100 TB storage note (VERDICT r11 #3): an above-threshold persist is
    MEMORY_AND_DISK — a full serialize+write pass of the input and a
    local-disk capacity exposure, traded for 1-2 saved recompute
    passes; on executor loss the lost blocks RECOMPUTE through the
    full lineage (persist keeps lineage, unlike checkpoint), so the
    trade degrades gracefully rather than failing.  localCheckpoint
    was considered and rejected for this site: it TRUNCATES lineage,
    so an executor loss there kills the job (Spark's own docstring
    caveat), and it saves nothing over persist here because these
    inputs' lineages are deep but cheap-per-branch — exactly the case
    where recompute-on-loss is the right fallback.  Clusters where the
    disk pass is the binding cost can lower
    spark.shadems.share.threshold to re-inline, or raise it to persist
    less."""
    if df.isStreaming:
        return df
    if not bounded:
        try:
            thr = int(
                df.sparkSession.conf.get(
                    "spark.shadems.share.threshold", str(_SHARE_THRESHOLD)
                )
            )
        except Exception:  # pragma: no cover - conf always readable
            thr = _SHARE_THRESHOLD
        if _est_bytes(df) < thr:
            return df
    from shadems_spark.operators.dedup import tracked_persist

    return tracked_persist(df, key=f"profile_{tag}_{next(_SHARE_SEQ)}")


def _order_cols(order) -> list:
    """Accept plain names or Column sort-order expressions (e.g.
    ``F.col("x").desc()``) — both repartitionByRange and Window.orderBy
    take either, so the two-phase operators can serve descending
    rankings without materializing negated keys."""
    return [F.col(c) if isinstance(c, str) else c for c in order]


def _resolve_nparts(df: DataFrame, n_parts: int | None) -> int:
    """Default the rank/cumsum bucket count to the SESSION's declared
    parallelism (spark.sql.shuffle.partitions) — the knob a production
    cluster already sizes to its executor count — capped at 1024: the
    per-row bucket lookup is an O(n_parts) literal-array filter and
    the offsets fold is O(n_parts^2), both trivial at 1024.  1024
    buckets of a rank table is ~1e8 rows each at 1e11 input rows —
    fine for the narrow (key, count) rows these operators shuffle;
    raise explicitly when a wider fan-out is worth the lookup cost."""
    if n_parts is not None:
        return n_parts
    try:
        conf = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        conf = 200
    return max(1, min(conf, 1024))


def _cuts_row(df: DataFrame, key: Column, n_parts: int, desc: bool) -> DataFrame:
    """Deterministic, LAYOUT-INDEPENDENT bucket cutpoints as a 1-row
    broadcastable frame (column ``__cuts``): a hash-uniform sample of
    the key's DISTINCT values, evenly strided into <= n_parts - 1
    distinct cuts in sort direction.  Stays IN PLAN (no driver action:
    builders remain lazy and the sample rides one broadcast stage).

    Sampling shape (ADVICE r6 skew fix): distinct values hash-bucket
    into ``n_sample`` groups (pmod(xxhash64, n_sample)) and each group
    keeps its min-(hash, value) representative via a struct-min
    aggregate.  The representative set is a pure function of the
    distinct-value SET — duplicate frequencies cannot collapse the
    sample, so a 99%-one-value key still yields ~min(D, n_sample)
    spread-out cuts.  Map-side combine bounds the exchange at
    n_sample rows per input partition; one scan, no sort.

    Why not repartitionByRange: RangePartitioner seeds its sampler
    from the runtime RDD id, so two physical instantiations of the
    same exchange can draw DIFFERENT boundaries — and Catalyst's
    per-branch column pruning can make the window branch and the
    totals branch non-identical, defeating ReuseExchange.  The r6
    local[3] full gate caught exactly that: q_mannwhitney's offsets
    were computed under one boundary set and applied under another
    (nondeterministic rank sums).  Hash-derived VALUE sampling makes
    the cuts a pure function of the data, so every plan branch —
    however many times the planner instantiates it — assigns
    identical buckets by construction."""
    n_sample = min(n_parts * 32, 100_000)
    samp = (
        df.select(key.alias("__k"))
        .filter(F.col("__k").isNotNull())
        .withColumn(
            "__h",
            _memo(
                ("cuts_xh",),
                lambda: F.xxhash64(F.col("__k").cast("string")),
            ),
        )
        .groupBy(
            _memo(
                ("cuts_hb", n_sample),
                lambda: F.pmod("__h", F.lit(n_sample)).alias("__hb"),
            )
        )
        .agg(
            _memo(
                ("cuts_minrep",),
                lambda: F.min(
                    F.struct(F.col("__h").alias("h"), F.col("__k").alias("k"))
                )["k"].alias("__k"),
            )
        )
        .agg(
            _memo(
                ("cuts_vals", desc),
                lambda: F.array_distinct(
                    F.sort_array(F.collect_list("__k"), asc=not desc)
                ).alias("__vals"),
            )
        )
    )

    def _build_cuts():
        k = F.size("__vals")
        pos = F.transform(
            F.sequence(F.lit(1), F.lit(n_parts - 1)),
            lambda i: F.round(i * k / n_parts).cast("int"),
        )
        return F.array_distinct(
            F.filter(
                F.transform(
                    pos,
                    lambda j: F.when(
                        (j > 0) & (j < k), F.element_at("__vals", j + 1)
                    ),
                ),
                lambda c: c.isNotNull(),
            )
        ).alias("__cuts")

    if n_parts > 1:
        return samp.select(_memo(("cuts_cuts", n_parts), _build_cuts))
    return samp.select(
        _memo(("cuts_empty",), lambda: F.slice("__vals", 1, 0).alias("__cuts"))
    )


def _bucketed(
    df: DataFrame,
    order: list,
    n_parts: int | None,
    bucket_key: Column | None,
    bucket_desc: bool,
):
    """Shared bucket-assignment front end: resolve the bucket key
    (defaults to the first order column when it is a plain name),
    attach the broadcast cuts row, and return df + ``__b`` (cuts
    column dropped).  Bucket id = how many cuts the key has passed in
    sort direction — a pure expression over DATA values (never the
    physical partition id), so every plan branch agrees.  Null keys
    land in bucket 0 (matching ascending nulls-first; descending
    callers pass non-null keys by contract)."""
    key_name = None
    if bucket_key is None:
        if not isinstance(order[0], str):
            raise ValueError(
                "pass bucket_key= explicitly when order[0] is a Column "
                "expression (e.g. a .desc() sort order)"
            )
        key_name = order[0]
        bucket_key = F.col(order[0])
    # One materialization for the THREE sibling branches every
    # two-phase caller builds over df (cuts sample, windowed data,
    # per-bucket totals) — size-thresholded, see _share.
    df = _share(df, "bucketed", bounded=False)
    cuts = _cuts_row(df, bucket_key, _resolve_nparts(df, n_parts), bucket_desc)

    def _build_b():
        passed = (
            F.filter("__cuts", lambda c: bucket_key <= c)
            if bucket_desc
            else F.filter("__cuts", lambda c: bucket_key >= c)
        )
        return F.coalesce(F.size(passed), F.lit(0))

    b = (
        _memo(("bucketed_b", key_name, bucket_desc), _build_b)
        if key_name is not None
        else _build_b()  # Column-expression keys are not memo-keyable
    )
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn("__b", b)
        .drop("__cuts")
    )


def global_index(
    df: DataFrame,
    order: list,
    out: str = "gid",
    n_parts: int | None = None,
    with_total: str | None = None,
    bucket_key: Column | None = None,
    bucket_desc: bool = False,
) -> DataFrame:
    """Scalable global row numbering in total ``order`` (must be a
    total order — include a unique key as the last column).

    The naive row_number() over a global window moves EVERY row to one
    partition; this is the two-pass shape that scales: assign each row
    a bucket from DETERMINISTIC VALUE CUTS over the primary order
    column (:func:`_value_cuts` — a pure function of the data, so
    every plan branch agrees by construction; repartitionByRange's
    runtime-seeded sampler does NOT give that guarantee, the r6
    local[3]-gate lesson), number rows within each bucket, then add
    each bucket's cumulative offset (ONE broadcast row holding a
    bucket->offset map, bounded by n_parts BY CONSTRUCTION — see
    :func:`_offsets_row`).  No single-partition stage over data at any
    cardinality; equal keys share a bucket because cuts are key
    values and the comparison is inclusive.

    ``bucket_key``/``bucket_desc``: the bucketing expression and its
    direction — defaults to ascending ``order[0]`` when that is a
    plain column name; REQUIRED explicitly for .desc() orders.
    ``with_total``: also attach the total row count as a column of
    that name (derived from the same per-bucket counts)."""
    from pyspark.sql import Window

    cols = _order_cols(order)
    parts = _bucketed(df, order, n_parts, bucket_key, bucket_desc)
    w_local = Window.partitionBy("__b").orderBy(*cols)
    local = parts.withColumn("__rn", F.row_number().over(w_local))
    counts = parts.groupBy("__b").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    res = (
        local.crossJoin(F.broadcast(_offsets_row(counts, ["__n"])))
        .withColumn(
            out,
            (F.element_at("__offmap___n", F.col("__b")) + F.col("__rn"))
            .cast("long"),
        )
    )
    if with_total is not None:
        res = res.withColumn(with_total, F.col("__tot___n"))
    return res.drop("__b", "__rn", "__offmap___n", "__tot___n")


def global_cumsum(
    df: DataFrame,
    order: list,
    sums: dict[str, str],
    n_parts: int | None = None,
    bucket_key: Column | None = None,
    bucket_desc: bool = False,
) -> DataFrame:
    """Exact inclusive prefix sums in total ``order`` without a
    single-partition window — the distributed scan primitive under the
    exact KS / Mann-Whitney / split-finding family.

    ``sums`` maps output column name -> input column to accumulate.
    Same two-phase shape as :func:`global_index`: deterministic
    value-cut buckets over the order key (layout-independent by
    construction — see _value_cuts), LOCAL cumulative sums within
    each bucket, then add each bucket's total-so-far (one broadcast
    row holding a bucket->offset map, see :func:`_offsets_row`).
    Sums must be integer-valued (they ride a long fold — every caller
    here sums counts or nano-int-protocol integers anyway).
    The order key must be total (callers pass distinct keys —
    the groupBy upstream of every cumsum here guarantees it), so
    peers never straddle a bucket boundary and the local+offset
    decomposition is exactly the global prefix sum."""
    from pyspark.sql import Window

    cols = _order_cols(order)
    parts = _bucketed(df, order, n_parts, bucket_key, bucket_desc)
    w_local = Window.partitionBy("__b").orderBy(*cols)
    out = parts
    for name, src in sums.items():
        out = out.withColumn(name, F.sum(src).over(w_local))
    totals = parts.groupBy("__b").agg(
        *[
            F.sum(src).cast("long").alias(f"__t_{name}")
            for name, src in sums.items()
        ]
    )
    res = out.crossJoin(
        F.broadcast(_offsets_row(totals, [f"__t_{name}" for name in sums]))
    )
    for name in sums:
        res = res.withColumn(
            name,
            F.col(name) + F.element_at(f"__offmap___t_{name}", F.col("__b")),
        )
    return res.drop(
        "__b",
        *[f"__offmap___t_{name}" for name in sums],
        *[f"__tot___t_{name}" for name in sums],
    )


def global_ntile(
    df: DataFrame,
    n_tiles: int,
    order: list,
    out: str,
    n_parts: int | None = None,
    bucket_key: Column | None = None,
    bucket_desc: bool = False,
) -> DataFrame:
    """Exact ntile(k) in total ``order`` without a single-partition
    window: two-phase global rank (:func:`global_index`) + the closed-
    form tile fill both Spark and DuckDB implement — with n rows and k
    tiles, the first ``n mod k`` tiles hold ``n div k + 1`` rows and
    the rest ``n div k``, so tile(rank) is pure integer arithmetic on
    the global rank and total.  Output is bit-identical to
    ``ntile(k) OVER (ORDER BY ...)`` for any total order, at any
    cardinality, with no data-sized single-partition stage."""
    gi = global_index(
        df, order, out="__grk", n_parts=n_parts, with_total="__n",
        bucket_key=bucket_key, bucket_desc=bucket_desc,
    )
    grk, n = F.col("__grk"), F.col("__n")
    q = F.floor(n / n_tiles).cast("long")
    r = n % n_tiles
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading tiles
    tile = F.when(
        grk <= big, F.floor((grk - 1) / (q + 1)).cast("long") + 1
    ).otherwise(
        r + F.floor((grk - big - 1) / F.greatest(q, F.lit(1))).cast("long") + 1
    )
    return gi.withColumn(out, tile.cast("int")).drop("__grk", "__n")


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


def _offsets_row_max(maxima: DataFrame, src: str) -> DataFrame:
    """Max-scan sibling of :func:`_offsets_row`: fold the <= n_parts
    per-bucket maxima (keyed ``__b``) into one broadcast row with a
    ``__offmap_<src>`` map from bucket id to the EXCLUSIVE prefix MAX
    over prior buckets (null for the first bucket / all-prior-null —
    the scan identity, since max has no integer zero).  Same shape
    and the same zero-empty-partition-window property."""
    pn = _memo(
        ("offsmax_pn", src),
        lambda: F.sort_array(
            F.collect_list(F.struct(F.col("__b"), F.col(src)))
        ).alias("__pn"),
    )
    row = maxima.agg(pn)

    # Same empty-input guard as _offsets_row (ADVICE r6).
    def _build_offmap():
        return F.when(
            F.size("__pn") > 0,
            F.map_from_entries(
                F.transform(
                    F.sequence(F.lit(1), F.size("__pn")),
                    lambda i: F.struct(
                        F.element_at("__pn", i)["__b"].alias("k"),
                        F.aggregate(
                            F.slice("__pn", F.lit(1), i - 1),
                            F.lit(None).cast("long"),
                            lambda a, x: F.greatest(a, x[src]),
                        ).alias("v"),
                    ),
                )
            ),
        ).alias(f"__offmap_{src}")

    return row.select(_memo(("offsmax_map", src), _build_offmap))


def prefix_max_prune(
    df: DataFrame,
    key: str,
    src: str,
    n_parts: int | None = None,
) -> DataFrame:
    """Broadcast-only dominance PRE-PRUNE for the skyline/staircase
    family (VERDICT r6 #2): drop every row whose ``src`` (long) is
    <= the max of ``src`` over all rows in strictly-earlier value-cut
    buckets of ``key`` — such a row is dominated by a point with a
    strictly smaller key and at-least-equal measure, so it cannot be
    on the Pareto front.

    Shuffle shape: bucket ids are broadcast-cut expressions (no data
    exchange), the per-bucket maxima aggregate map-side-combines to
    <= n_parts rows per input partition, and the prefix-max map rides
    ONE broadcast row back onto the scan — the corpus itself is never
    shuffled.  Survivors are roughly the bucket-level staircase
    (points above the running max of everything cheaper), so the
    exact downstream pass sees candidates, not data.

    Lossless by induction: a pruned row y is dominated by the
    earlier-bucket max point z_1; if z_1 is itself pruned it is
    dominated by a strictly-earlier z_2 with measure >= z_1's, and so
    on down to bucket 0 whose points are never pruned — so every
    pruned row is dominated by a SURVIVOR and the survivor set's
    skyline equals the true skyline."""
    parts = _bucketed(df, [key], n_parts, None, False)
    maxima = parts.groupBy("__b").agg(F.max(src).cast("long").alias("__m"))
    prior = F.element_at("__offmap___m", F.col("__b"))
    return (
        parts.crossJoin(F.broadcast(_offsets_row_max(maxima, "__m")))
        .filter(prior.isNull() | (F.col(src) > prior))
        .drop("__b", "__offmap___m")
    )


def global_cummax(
    df: DataFrame,
    order: list,
    src: str,
    out: str,
    n_parts: int | None = None,
    bucket_key: Column | None = None,
) -> DataFrame:
    """EXCLUSIVE prefix maximum of ``src`` (long) in total ``order``
    without a single-partition window — the scan primitive under the
    skyline/staircase family (dominance tests reduce to "max of a
    measure over everything strictly before me").

    Two-phase like :func:`global_cumsum`: deterministic value-cut
    buckets, a LOCAL exclusive running max within each bucket
    (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING), then greatest() with
    the prior buckets' max from one broadcast offsets row.  ``out``
    is null when nothing precedes the row (the scan identity).
    The order must be total (callers pass distinct keys), so peers
    never straddle the exclusive boundary."""
    from pyspark.sql import Window

    cols = _order_cols(order)
    parts = _bucketed(df, order, n_parts, bucket_key, False)
    w_local = (
        Window.partitionBy("__b")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parts.withColumn("__lm", F.max(src).over(w_local))
    maxima = parts.groupBy("__b").agg(
        F.max(src).cast("long").alias("__m")
    )
    res = (
        local.crossJoin(F.broadcast(_offsets_row_max(maxima, "__m")))
        .withColumn(
            out,
            F.greatest(
                F.col("__lm"),
                F.element_at("__offmap___m", F.col("__b")),
            ),
        )
    )
    return res.drop("__b", "__lm", "__offmap___m")


def _lex_lt(order: list[str], b_prefix: str = "__tb_") -> Column:
    """b <lex a over the order tuple (b columns carry ``b_prefix``)."""
    lt = F.lit(False)
    eq = F.lit(True)
    for c in order:
        bc, ac = F.col(f"{b_prefix}{c}"), F.col(c)
        lt = lt | (eq & (bc < ac))
        eq = eq & (bc == ac)
    return lt


def triangle_cumsum(
    df: DataFrame, order: list[str], sums: dict[str, str],
    strict: bool = False,
) -> DataFrame:
    """Prefix sums over a BOUNDED table via a broadcast non-equi
    self-join (the q_lorenz k-row-cumsum pattern): b rows with
    b <=lex a (``strict`` -> <lex) sum into each a row.  No
    WindowExec, no single-partition stage, no allowlist entry —
    O(k^2) join pairs, so ONLY for tables bounded by construction
    (canvas, calendar, codebook, bin axis, decile table; k <= ~4k).

    ``sums`` maps output name -> source column (integer-valued, the
    long-fold protocol).  ``order`` must be a total order (distinct
    tuples — every caller's upstream groupBy guarantees it); rows
    with an empty prefix get 0 (inclusive always has >= 1 term)."""
    df = _share(df, "tri")  # referenced by BOTH join sides — see _share
    b = df.select(
        *[F.col(c).alias(f"__tb_{c}") for c in order],
        *[F.col(src).alias(f"__tv_{name}") for name, src in sums.items()],
    )
    lt = _lex_lt(order)
    eqs = F.lit(True)
    for c in order:
        eqs = eqs & (F.col(f"__tb_{c}") == F.col(c))
    cond = lt if strict else (lt | eqs)
    joined = df.join(F.broadcast(b), cond, "left")
    return joined.groupBy(*[F.col(c) for c in df.columns]).agg(
        *[
            F.coalesce(F.sum(f"__tv_{name}"), F.lit(0))
            .cast("long").alias(name)
            for name in sums
        ]
    )


def triangle_rank(df: DataFrame, order: list[str], out: str = "rk") -> DataFrame:
    """rank() over a BOUNDED table via the same broadcast triangle
    join: rank = 1 + count of rows strictly before in the order (ties
    share a rank; pass a tie-broken total order for row_number
    semantics).  Order columns must be non-null."""
    df = _share(df, "tri")  # referenced by BOTH join sides — see _share
    b = df.select(*[F.col(c).alias(f"__tb_{c}") for c in order])
    joined = df.join(F.broadcast(b), _lex_lt(order), "left")
    return joined.groupBy(*[F.col(c) for c in df.columns]).agg(
        (F.count(F.col(f"__tb_{order[0]}")) + 1).cast("long").alias(out)
    )
