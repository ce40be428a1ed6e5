"""Custom stateful streaming operator (SURVEY.md §2 S + L surface):
per-user running aggregates via applyInPandasWithState — the shape a
bespoke sessionizer/accumulator takes when session_window/groupBy
can't express the semantics.

Batch-first like everything else: ``running_totals_batch`` computes
the same result with a window spec (used for the oracle-checked
query); ``running_totals_stream`` is the GroupState implementation,
exercised end-to-end in tests with availableNow."""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_totals_batch(ev: DataFrame) -> DataFrame:
    """Batch equivalent: final per-user count/sum (what the stateful
    stream converges to after draining the source)."""
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def _update(key, pdfs: Iterator, state: GroupState):
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_totals_stream(ev_stream: DataFrame) -> DataFrame:
    """S/L: arbitrary stateful processing — per-user GroupState updated
    per micro-batch, Arrow-batched pandas on the executor side."""
    return ev_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TWS_OUT_SCHEMA = "user_id long, n_events long, max_value double"


def running_max_batch(ev: DataFrame) -> DataFrame:
    """Batch equivalent of the transformWithState processor below."""
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("max_value"),
    )


def _tws_processor():
    """Build the Spark 4 transformWithStateInPandas processor lazily.

    The new typed-state API (StatefulProcessor + ValueState — the
    successor to applyInPandasWithState, with per-key typed state
    handles, timers, and RocksDB backing).  Its Python driver worker
    needs the ``google.protobuf`` package, which is broken in this
    container — so construction is deferred and the operator raises a
    clear EnvironmentError here; the code path itself is the real one
    and runs wherever protobuf is installed (see
    tests/test_streaming.py::test_transform_with_state guard)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment gate
        raise EnvironmentError(
            "transformWithStateInPandas needs the google.protobuf package "
            "(not installed in this container)"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningMax(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("agg", "n long, mx double")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            cur = self._st.get()
            n, mx = (cur[0], cur[1]) if cur else (0, float("-inf"))
            for pdf in rows:
                n += len(pdf)
                mx = max(mx, float(pdf["value"].max()))
            self._st.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    return RunningMax()


class _scoped_conf:
    """Set session confs for the duration of a block, then restore the
    previous values (or unset keys that were unset).  Session-global
    conf mutation leaking past an operator was ADVICE r03's top
    finding — a streaming sink flipping partitionOverwriteMode or the
    state-store provider silently changed the semantics of every later
    writer/stream in the session."""

    def __init__(self, spark, **confs: str):
        self._spark, self._confs, self._saved = spark, confs, {}

    def __enter__(self):
        for k, v in self._confs.items():
            self._saved[k] = self._spark.conf.get(k, None)
            self._spark.conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, prior in self._saved.items():
            if prior is None:
                self._spark.conf.unset(k)
            else:
                self._spark.conf.set(k, prior)
        return False


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def running_max_tws(ev_stream: DataFrame) -> DataFrame:
    """S/L (Spark 4): per-user running max via transformWithStateInPandas
    — typed ValueState, Update mode.  Same semantics as
    running_max_batch after draining the source.

    The processor is constructed first so the environment gate
    (missing protobuf) raises before any session state is touched.
    The RocksDB state-store provider is NOT set here: the conf is
    read at query *start*, which happens in the caller — use
    :func:`run_tws_to_memory` to execute with RocksDB scoped to the
    query (set → start → drain → restore), per ADVICE r03."""
    processor = _tws_processor()  # env gate fires here, pre-mutation
    return ev_stream.groupBy("user_id").transformWithStateInPandas(
        processor,
        outputStructType=TWS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_tws_to_memory(ev_stream: DataFrame, name: str = "tws_max") -> DataFrame:
    """Drain the transformWithState stream into a memory sink with the
    RocksDB provider active only for this query's lifetime (restored
    in finally), returning the sink table."""
    spark = ev_stream.sparkSession
    out = running_max_tws(ev_stream)
    with _scoped_conf(
        spark, **{"spark.sql.streaming.stateStore.providerClass": _ROCKSDB_PROVIDER}
    ):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    return spark.table(name)


def stream_merge_into(
    ev_stream: DataFrame,
    table_path: str,
    key: str = "user_id",
) -> None:
    """Streaming upsert sink via foreachBatch — each micro-batch's
    per-key PARTIAL aggregate lands in its own ``batch_id=N``
    partition (dynamic-partition overwrite of exactly that partition),
    so a replayed batch — foreachBatch's documented at-least-once
    failure mode — overwrites its own partition instead of
    double-counting into an accumulated table.  Readers fold the
    partials with :func:`read_merged_totals` (sums are associative;
    rounding happens once, at read).  Drains the source under
    availableNow; parity with the one-shot batch aggregate is asserted
    in tests/test_streaming.py.

    Dynamic-partition overwrite is requested per-write via the
    DataFrameWriter option, NOT a session conf — other writers in the
    same session keep static overwrite-whole-path semantics (ADVICE
    r03: the session-wide set leaked into shadeplot/incremental/io
    overwrites and could leave stale partitions)."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        agg = batch_df.groupBy(key).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),  # unrounded partial
        )
        agg.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "batch_id"
        ).parquet(table_path)

    q = (
        ev_stream.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", table_path + ".ckpt")
        .start()
    )
    q.awaitTermination(180)


def read_merged_totals(spark, table_path: str, key: str = "user_id") -> DataFrame:
    """Fold the per-batch partial aggregates written by
    :func:`stream_merge_into` into final per-key totals (round once
    here, matching running_totals_batch exactly)."""
    parts = spark.read.parquet(table_path)
    return parts.groupBy(key).agg(
        F.sum("n_events").alias("n_events"),
        F.round(F.sum("sum_value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------- admission

def _band_buckets(
    docs: DataFrame, n_hashes: int, bands: int, rows: int, ngram: int
) -> DataFrame:
    """(doc_id, band, bucket) rows for a doc batch — the same banding
    family as operators/dedup.py::lsh_candidate_pairs, refactored to
    return the one-sided bucket table an admission join needs."""
    from shadems_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=n_hashes, ngram=ngram)
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[F.element_at("sig", b * rows + r + 1) for r in range(rows)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )


def stream_minhash_admission(
    doc_stream: DataFrame,
    store_path: str,
    n_hashes: int = 32,
    bands: int = 8,
    rows: int = 4,
    ngram: int = 3,
    timeout: int = 180,
) -> None:
    """Streaming NEAR-dup corpus admission via foreachBatch (VERDICT r4
    #7): the banded-minhash route, upgrading ``curate_admission``'s
    exact-content-hash gate to fuzzy dedup against everything admitted
    so far.

    Per micro-batch:

    1. minhash-band the batch docs (fixed-width signature rows — the
       batch text is shingled once, the resident corpus never);
    2. reject any doc sharing a (band, bucket) with the RESIDENT
       admitted store — a band-key equi-join against narrow bucket
       rows, never a text comparison, so the per-batch cost is
       O(batch × bucket-collisions), independent of corpus text size;
    3. within the batch, reject any doc sharing a bucket with a
       smaller-id batch doc (batch-granular greedy: the smaller-id doc
       wins the bucket whether or not the resident store also rejects
       it — documented semantics, pinned in tests);
    4. append the ADMITTED docs and their bucket rows to the store,
       both partitioned by batch_id with dynamic-partition overwrite,
       so a replayed batch — foreachBatch's at-least-once mode —
       overwrites its own partition instead of double-admitting.

    Replay safety for the admission DECISION: the resident read
    filters ``batch_id < current`` (partition-pruned), so a replayed
    batch never sees its own partial writes and re-decides
    identically.  Reads: admitted docs at ``store_path + "/admitted"``,
    bucket rows at ``store_path + "/buckets"``."""
    buckets_path = store_path + "/buckets"
    admitted_path = store_path + "/admitted"

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        banded = _band_buckets(batch_df, n_hashes, bands, rows, ngram)
        try:
            resident = spark.read.parquet(buckets_path).filter(
                F.col("batch_id") < batch_id
            )
            hit_resident = (
                banded.join(
                    resident.select("band", "bucket"), ["band", "bucket"], "left_semi"
                )
                .select("doc_id")
                .distinct()
            )
        except Exception:  # first batch: no store yet
            hit_resident = None
        w = Window.partitionBy("band", "bucket")
        hit_batch = (
            banded.withColumn("mn", F.min("doc_id").over(w))
            .filter(F.col("doc_id") > F.col("mn"))
            .select("doc_id")
            .distinct()
        )
        rejected = (
            hit_batch if hit_resident is None
            else hit_resident.union(hit_batch).distinct()
        )
        admitted = batch_df.join(rejected, "doc_id", "left_anti")
        adm_buckets = banded.join(admitted.select("doc_id"), "doc_id", "left_semi")
        for frame, path in ((admitted, admitted_path), (adm_buckets, buckets_path)):
            (
                frame.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(path)
            )

    q = (
        doc_stream.writeStream.foreachBatch(admit)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_path + "/.ckpt")
        .start()
    )
    q.awaitTermination(timeout)


def stream_heavy_hitters(
    item_stream: DataFrame,
    store_path: str,
    col: str = "w",
    m: int = 100,
    timeout: int = 180,
) -> None:
    """Streaming phi-heavy-hitter DISCOVERY (phi = 1/m): maintain a
    mergeable Misra-Gries summary of the item stream via foreachBatch
    — the streaming face of operators/profile.py::heavy_hitters.

    Per micro-batch: (1) exact batch item counts (one map-side-combined
    aggregate); (2) merge with the RESIDENT summary (count sum);
    (3) Misra-Gries compress — subtract the (m+1)-th largest merged
    count from everything and drop the non-positives, leaving <= m
    rows.  The compress step is the Agarwal-et-al mergeable-summaries
    rule, so after any number of batches every item with true count
    > N/m still has a positive counter (undercount is bounded by
    N/(m+1) end-to-end) — the summary support is a guaranteed
    SUPERSET of the true heavy set, same invariant as the batch
    operator's per-Arrow-batch phase 1.

    The summary snapshot is written per batch, partitioned by
    batch_id with dynamic-partition overwrite, and each batch merges
    against the LATEST snapshot with ``batch_id < current`` — so a
    replayed batch (foreachBatch's at-least-once mode) re-reads the
    same resident state and overwrites its own partition with the
    identical result.

    Driver state per batch is the (m+1)-row threshold lookup — the
    summary itself never exceeds m rows, so every step is
    codebook-sized however long the stream runs.  Exact final answers
    come from ``heavy_hitters_finalize`` (one bounded recount job
    over the at-rest corpus), which matches the batch operator
    row-for-row."""
    summary_path = store_path + "/summary"

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bc = batch_df.groupBy(col).agg(F.sum(F.lit(1)).alias("cnt"))
        merged = bc
        try:
            snaps = spark.read.parquet(summary_path).filter(
                F.col("batch_id") < batch_id
            )
            mx = snaps.agg(F.max("batch_id")).first()[0]
            if mx is not None:
                resident = snaps.filter(F.col("batch_id") == mx).select(col, "cnt")
                merged = (
                    resident.unionByName(bc)
                    .groupBy(col)
                    .agg(F.sum("cnt").alias("cnt"))
                )
        except Exception:  # first batch: no store yet
            pass
        # (m+1)-th largest merged count = the MG decrement (0 if <= m
        # distinct items).  Bounded collect: m+1 rows, by construction.
        top = merged.orderBy(F.col("cnt").desc(), col).limit(m + 1).collect()
        d = top[m]["cnt"] if len(top) > m else 0
        out = merged.select(
            col, (F.col("cnt") - F.lit(int(d))).alias("cnt")
        ).filter(F.col("cnt") > 0)
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(summary_path)
        )

    q = (
        item_stream.writeStream.foreachBatch(step)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_path + "/.ckpt")
        .start()
    )
    q.awaitTermination(timeout)


def heavy_hitters_finalize(
    items: DataFrame, store_path: str, col: str = "w", m: int = 100
) -> DataFrame:
    """Exact phase-2 recount for ``stream_heavy_hitters``: take the
    final summary's support as the candidate set (a guaranteed
    superset of the true heavy set — see the MG bound above), prune
    the at-rest corpus with a broadcast semi-join, recount exactly,
    and apply the pure-BIGINT ``n * m > N`` filter.  Because phase 1
    only ever over-selects, the output is IDENTICAL to the batch
    operator's (operators/profile.py::heavy_hitters) — parity is
    pinned in tests/test_streaming.py."""
    spark = items.sparkSession
    snaps = spark.read.parquet(store_path + "/summary")
    mx = snaps.agg(F.max("batch_id")).first()[0]
    cand = snaps.filter(F.col("batch_id") == mx).select(col).distinct()
    n_total = items.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (
        items.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return exact.crossJoin(F.broadcast(n_total)).filter(
        F.col("n") * m > F.col("n_total")
    )


def stream_kl_drift(
    doc_stream: DataFrame,
    store_path: str,
    text: str = "text",
    timeout: int = 180,
) -> None:
    """Streaming domain-drift monitor: per micro-batch, KL(batch
    unigram dist || resident corpus dist) — the online face of
    q_kl_drift, the alarm that fires when a crawl slice's language
    suddenly diverges from everything ingested so far.

    Per batch: (1) batch unigram counts (one aggregate); (2) read the
    LATEST resident count snapshot (``batch_id < current`` — replay-
    safe like every store here); (3) if a resident exists, compute
    the drift with Laplace-smoothed reference probabilities
    p_ref = (n_ref + 1) / (N_ref + V_union)  (V_union = distinct
    words across resident+batch; smoothing keeps novel words finite —
    they are exactly the drift signal) and write ONE drift row
    (batch_id, n_tokens, vocab, novel_words, kl_nano, kl);
    (4) write the merged count snapshot, partitioned by batch_id with
    dynamic overwrite.

    The nano-int protocol applies: each word's KL contribution rounds
    to round(p_b * ln(p_b/p_ref) * 1e9) BEFORE the sum, so the drift
    value is layout-independent and the batch-replay parity test can
    recompute it bit-for-bit in plain Python.

    Scale: every frame touched is vocabulary-sized (counts, joins,
    snapshots); the documents themselves are scanned once for the
    count aggregate and never stored."""
    from shadems_spark.operators.text import words

    counts_path = store_path + "/counts"
    drift_path = store_path + "/drift"
    nano = F.lit(1_000_000_000.0)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bc = (
            batch_df.select(F.explode(words(text)).alias("u"))
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("nb"))
        )
        resident = None
        try:
            snaps = spark.read.parquet(counts_path).filter(
                F.col("batch_id") < batch_id
            )
            mx = snaps.agg(F.max("batch_id")).first()[0]
            if mx is not None:
                resident = snaps.filter(F.col("batch_id") == mx).select("u", "nr")
        except Exception:  # first batch: no store yet
            pass
        if resident is not None:
            j = bc.join(resident, "u", "full_outer").select(
                "u",
                F.coalesce(F.col("nb"), F.lit(0)).alias("nb"),
                F.coalesce(F.col("nr"), F.lit(0)).alias("nr"),
            )
            # n.b. aliases must not collide case-insensitively with
            # j's nb/nr (Spark's default resolver is case-insensitive)
            tot = j.agg(
                F.sum("nb").alias("nb_tot"),
                F.sum("nr").alias("nr_tot"),
                F.count(F.lit(1)).alias("v_union"),
                F.sum(
                    ((F.col("nb") > 0) & (F.col("nr") == 0)).cast("long")
                ).alias("novel"),
            )
            pb = F.col("nb") / F.col("nb_tot").cast("double")
            pref = (F.col("nr") + 1) / (
                F.col("nr_tot") + F.col("v_union")
            ).cast("double")
            drift = (
                j.filter(F.col("nb") > 0)
                .crossJoin(F.broadcast(tot))
                .select(
                    F.round(pb * F.log(pb / pref) * nano)
                    .cast("long").alias("t"),
                    "nb_tot", "v_union", "novel",
                )
                .groupBy("nb_tot", "v_union", "novel")
                .agg(F.sum("t").alias("kl_nano"))
                .select(
                    F.lit(batch_id).alias("batch_id"),
                    F.col("nb_tot").alias("n_tokens"),
                    F.col("v_union").alias("vocab"),
                    F.col("novel").alias("novel_words"),
                    "kl_nano",
                    F.round(F.col("kl_nano") / nano, 6).alias("kl"),
                )
            )
            (
                drift.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(drift_path)
            )
            merged = j.select(
                "u", (F.col("nb") + F.col("nr")).alias("nr")
            ).filter(F.col("nr") > 0)
        else:
            merged = bc.select("u", F.col("nb").alias("nr"))
        (
            merged.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(counts_path)
        )

    q = (
        doc_stream.writeStream.foreachBatch(step)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_path + "/.ckpt")
        .start()
    )
    q.awaitTermination(timeout)


def stream_bootstrap(
    doc_stream: DataFrame,
    store_path: str,
    val: str = "n_chars",
    id_col: str = "doc_id",
    n_reps: int = 32,
    timeout: int = 180,
) -> None:
    """Streaming Poisson bootstrap — the mergeable-statistic face of
    q_bootstrap_ci: each micro-batch contributes exact-integer partial
    sums (sum of weights, sum of weight*value) per replicate, merged
    into the resident snapshot.  Because the per-(row, replicate)
    Poisson(1) weight is a pure function of (id, r) — the same
    integer-LCG + CDF-threshold lookup the batch query uses — and the
    partials are BIGINT sums, the final replicate means are
    BIT-IDENTICAL to the batch operator's however the stream is
    batched (parity pinned in tests).  This is why the Poisson
    bootstrap, and not resample-and-recompute, is the streaming /
    distributed bootstrap: the whole state is n_reps rows of two
    integers.

    Snapshots land partitioned by batch_id with dynamic overwrite
    (replay-idempotent, the house store recipe); read the final
    means with ``bootstrap_finalize``."""
    from shadems_spark.queries.analytics import _POIS_T

    sums_path = store_path + "/sums"

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        x = batch_df.select(
            F.col(id_col).alias("rid"), F.col(val).alias("x"),
            F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1))).alias("r"),
        ).withColumn(
            "h",
            (F.col("rid") * F.lit(1103515245) + F.col("r") * F.lit(12345)
             + F.lit(6789)) % F.lit(1000003),
        )
        wt = F.lit(6)
        for k, t in reversed(list(enumerate(_POIS_T))):
            wt = F.when(F.col("h") < t, F.lit(k)).otherwise(wt)
        part = (
            x.withColumn("wt", wt)
            .groupBy("r")
            .agg(
                F.sum("wt").alias("sw"),
                F.sum(F.col("wt") * F.col("x")).alias("swx"),
            )
        )
        merged = part
        try:
            snaps = spark.read.parquet(sums_path).filter(
                F.col("batch_id") < batch_id
            )
            mx = snaps.agg(F.max("batch_id")).first()[0]
            if mx is not None:
                resident = snaps.filter(F.col("batch_id") == mx).select(
                    "r", "sw", "swx"
                )
                merged = (
                    resident.unionByName(part)
                    .groupBy("r")
                    .agg(F.sum("sw").alias("sw"), F.sum("swx").alias("swx"))
                )
        except Exception:  # first batch
            pass
        (
            merged.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(sums_path)
        )

    q = (
        doc_stream.writeStream.foreachBatch(step)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_path + "/.ckpt")
        .start()
    )
    q.awaitTermination(timeout)


def bootstrap_finalize(spark, store_path: str) -> DataFrame:
    """Replicate means from the final ``stream_bootstrap`` snapshot:
    (r, n_eff, mean) with the same rounding as q_bootstrap_ci."""
    snaps = spark.read.parquet(store_path + "/sums")
    mx = snaps.agg(F.max("batch_id")).first()[0]
    return (
        snaps.filter(F.col("batch_id") == mx)
        .select(
            "r",
            F.col("sw").alias("n_eff"),
            F.round(F.col("swx") / F.col("sw").cast("double"), 4).alias(
                "mean_chars"
            ),
        )
        .orderBy("r")
    )


# ---------------------------------------------------------------------------
# Streaming Holt smoothing (the online twin of queries/analytics.q_holt)

HOLT_OUT_SCHEMA = (
    "event_type string, n_days long, level double, trend double,"
    " forecast_7 double"
)
HOLT_STATE_SCHEMA = "days array<long>, counts array<long>"


def _round6_half_up(x: float) -> float:
    """HALF_UP at 6dp (engine round semantics; Python round() is
    banker's and would diverge on exact .5 boundaries)."""
    import math

    s = math.floor(abs(x) * 1e6 + 0.5) / 1e6
    return -s if x < 0 else s


def holt_fit(day_counts: dict) -> tuple[int, float, float, float]:
    """The shared Holt fold (alpha=0.5, beta=0.25), zero-filling the
    key's own [min_day, max_day] span — the identical IEEE operation
    sequence as q_holt's JVM fold (which zero-fills the GLOBAL span:
    per-key results coincide whenever the key's first/last active day
    touch the global bounds, pinned in tests)."""
    d0, d1 = min(day_counts), max(day_counts)
    ys = [float(day_counts.get(d, 0)) for d in range(d0, d1 + 1)]
    l = ys[0]
    b = ys[1] - ys[0] if len(ys) > 1 else 0.0
    for y in ys[1:]:
        l_new = 0.5 * y + 0.5 * (l + b)
        b = 0.25 * (l_new - l) + 0.75 * b
        l = l_new
    return len(ys), l, b, l + 7.0 * b


def _holt_update(key, pdfs: Iterator, state: GroupState):
    import pandas as pd

    if state.exists:
        days, counts = state.get
        acc = dict(zip(days, counts))
    else:
        acc = {}
    for pdf in pdfs:
        for d, c in pdf.groupby("day_idx").size().items():
            acc[int(d)] = acc.get(int(d), 0) + int(c)
    state.update((list(acc.keys()), list(acc.values())))
    n, level, trend, f7 = holt_fit(acc)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_days": [n],
            "level": [_round6_half_up(level)],
            "trend": [_round6_half_up(trend)],
            "forecast_7": [_round6_half_up(f7)],
        }
    )


def stream_holt(ev_stream: DataFrame) -> DataFrame:
    """Streaming Holt level+trend forecast per event type — the
    applyInPandasWithState form the q_holt docstring prescribes for
    unbounded streams: state is the key's per-DAY count map (date
    cardinality — bounded the same way the batch query's grid is,
    NOT event cardinality), refolded per micro-batch so every
    emission is the exact fit of all data so far.  Late events are
    handled for free: a late row bumps its day's count and the next
    refold repairs the whole fit (an incremental-state variant would
    have to rewind).  Replay-idempotent: counts merge additively and
    the fold is a pure function of the merged state."""
    src = ev_stream.select(
        "event_type",
        F.expr("ts_ns div 86400000000000").alias("day_idx"),
    )
    return src.groupBy("event_type").applyInPandasWithState(
        _holt_update,
        HOLT_OUT_SCHEMA,
        HOLT_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def stream_ams(
    ev_stream: DataFrame,
    store_path: str,
    key: str = "user_id",
    timeout: int = 180,
) -> None:
    """Streaming AMS F2 sketch over ``key`` — the mergeable face of
    queries/analytics.q_ams_f2: each micro-batch folds its rows into
    the 16 sign counters (Y_r += sum sign_r(u) per row) and ADDS them
    to the resident counters; by linearity the merged counters equal
    the batch sketch over the union, so the streaming estimate is
    bit-identical to the batch one on the same data (pinned in
    tests).  This is the whole point of linear sketches at 100 TB:
    per-partition/per-batch sketches merge by vector addition — no
    per-key state, no shuffle of raw keys, a 17-number snapshot at
    any moment.

    Per batch: (1) one aggregate -> (n_rows, y0..y15) deltas;
    (2) read the LATEST snapshot (batch_id < current — replay-safe);
    (3) write counters + deltas, partitioned by batch_id with
    dynamic overwrite.  Estimate materializes in ams_finalize."""
    from shadems_spark.queries.analytics import _ams_coeffs
    from shadems_spark.operators.text import FP_MOD

    p = FP_MOD
    counters_path = store_path + "/counters"

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        u = F.col(key) % p
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for r, (a, b, c, d) in enumerate(_ams_coeffs()):
            h = F.lit(a)
            for coef in (b, c, d):
                h = (h * u + F.lit(coef)) % F.lit(p)
            # coalesce: F.sum over an EMPTY micro-batch is NULL, and
            # int(None) below would kill the streaming query (ADVICE r6).
            aggs.append(
                F.coalesce(F.sum(1 - 2 * (h % 2)), F.lit(0)).alias(f"y{r}")
            )
        delta = batch_df.agg(*aggs).first()
        prev = {f"y{r}": 0 for r in range(16)}
        prev["n_rows"] = 0
        try:
            snaps = spark.read.parquet(counters_path).filter(
                F.col("batch_id") < batch_id
            )
            mx = snaps.agg(F.max("batch_id")).first()[0]
            if mx is not None:
                row = snaps.filter(F.col("batch_id") == mx).first()
                prev = {k: row[k] for k in prev}
        except Exception:  # first batch: no store yet
            pass
        merged = {k: int(prev[k]) + int(delta[k]) for k in prev}
        out = spark.createDataFrame(
            [tuple([batch_id] + [merged[k] for k in sorted(merged)])],
            ["batch_id"] + sorted(merged),
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(counters_path)
        )

    q = (
        ev_stream.writeStream.foreachBatch(step)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_path + "/.ckpt")
        .start()
    )
    q.awaitTermination(timeout)


def ams_finalize(spark, store_path: str) -> dict:
    """Median-of-4-means F2 estimate from the latest counter
    snapshot — the identical integer half-sum the batch query
    computes (sums[1] + sums[2]) / 8."""
    snaps = spark.read.parquet(store_path + "/counters")
    mx = snaps.agg(F.max("batch_id")).first()[0]
    row = snaps.filter(F.col("batch_id") == mx).first()
    sums = sorted(
        sum(row[f"y{4 * g + j}"] ** 2 for j in range(4)) for g in range(4)
    )
    return {
        "n_rows": row["n_rows"],
        "ams_f2": (sums[1] + sums[2]) / 8.0,
        "batch_id": mx,
    }


def stream_ivm(
    change_stream: DataFrame,
    store_path: str,
    timeout: int = 180,
) -> None:
    """Streaming incremental view maintenance — q_ivm_agg's abelian
    delta algebra applied per micro-batch: the change stream carries
    (l_returnflag, l_linestatus, qty_centi, mult) rows with mult =
    +1 inserts / -1 deletes; each batch aggregates ONLY its rows
    (sum(mult), sum(mult*qty)) and merges into the resident snapshot
    by group-keyed addition, retiring zero-count groups.  State is
    group-cardinality forever; the base data is never rescanned and
    never stored.

    Snapshots write partitioned by batch_id with dynamic overwrite —
    replay-idempotent like every store here (a replayed batch
    rewrites ITS partition; the read side takes the latest
    batch_id < current)."""
    snap_path = store_path + "/snapshot"

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        key = ["l_returnflag", "l_linestatus"]
        delta = batch_df.groupBy(*key).agg(
            F.sum("mult").alias("d_n"),
            F.sum(F.col("mult") * F.col("qty_centi")).alias("d_q"),
        )
        prev = None
        try:
            snaps = spark.read.parquet(snap_path).filter(
                F.col("batch_id") < batch_id
            )
            mx = snaps.agg(F.max("batch_id")).first()[0]
            if mx is not None:
                prev = snaps.filter(F.col("batch_id") == mx).select(
                    *key,
                    F.col("n").alias("o_n"),
                    F.col("q").alias("o_q"),
                )
        except Exception:  # first batch: no store yet
            pass
        if prev is None:
            merged = delta.select(
                *key,
                F.col("d_n").alias("n"),
                F.col("d_q").alias("q"),
            )
        else:
            merged = (
                prev.join(delta, key, "full_outer")
                .select(
                    *key,
                    (
                        F.coalesce("o_n", F.lit(0))
                        + F.coalesce("d_n", F.lit(0))
                    ).alias("n"),
                    (
                        F.coalesce("o_q", F.lit(0))
                        + F.coalesce("d_q", F.lit(0))
                    ).alias("q"),
                )
            )
        (
            merged.filter(F.col("n") != 0)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(snap_path)
        )

    q = (
        change_stream.writeStream.foreachBatch(step)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_path + "/.ckpt")
        .start()
    )
    q.awaitTermination(timeout)


def ivm_snapshot(spark, store_path: str) -> DataFrame:
    """Latest maintained view from the snapshot store."""
    snaps = spark.read.parquet(store_path + "/snapshot")
    mx = snaps.agg(F.max("batch_id")).first()[0]
    return snaps.filter(F.col("batch_id") == mx).select(
        "l_returnflag", "l_linestatus", "n", "q"
    )


SESS_OUT_SCHEMA = (
    "user_id long, session_no long, n_events long, "
    "start_us long, end_us long, closed int"
)
SESS_STATE_SCHEMA = (
    "session_no long, n_events long, start_us long, end_us long"
)
_SESS_GAP_US = 30 * 60 * 1_000_000


def _sessionize_update(key, pdfs: Iterator, state: GroupState):
    """Per-user stateful sessionizer: carry ONLY the open session
    (4 numbers), close it whenever a gap > 30 min appears inside or
    before the batch, emit closed sessions immediately and the open
    one as a provisional row (closed = 0).  Event-time order inside a
    batch comes from sorting the batch — cross-batch late rows older
    than the open session's end are clamped into it (documented
    at-least-once semantics; watermarking upstream bounds the skew)."""
    import pandas as pd

    if state.exists:
        sess_no, n_ev, start_us, end_us = state.get
    else:
        sess_no, n_ev, start_us, end_us = 0, 0, None, None
    out = []
    rows = pd.concat(list(pdfs)) if pdfs else pd.DataFrame()
    if len(rows):
        rows = rows.sort_values(["ts_us", "event_id"])
        for ts in rows.ts_us.astype("int64"):
            ts = int(ts)
            if n_ev == 0:
                sess_no += 1
                n_ev, start_us, end_us = 1, ts, ts
            elif ts - end_us > _SESS_GAP_US:
                out.append((key[0], sess_no, n_ev, start_us, end_us, 1))
                sess_no += 1
                n_ev, start_us, end_us = 1, ts, ts
            else:
                n_ev += 1
                end_us = max(end_us, ts)
    state.update((sess_no, n_ev, start_us, end_us))
    if n_ev:
        out.append((key[0], sess_no, n_ev, start_us, end_us, 0))
    yield pd.DataFrame(
        out,
        columns=[
            "user_id", "session_no", "n_events",
            "start_us", "end_us", "closed",
        ],
    )


def stream_sessionize(ev_stream: DataFrame) -> DataFrame:
    """Streaming sessionization with EXPLICIT session ids — the
    stateful twin of q_sessionize (the built-in session_window
    aggregates but never exposes the id, S3): per-user state is the
    OPEN session only (4 longs — constant per key, never event
    history), closed sessions emit as soon as the closing gap is
    seen, and the open session emits provisionally (closed = 0) so
    downstream consumers can show live counts.

    Batch parity pinned in tests: replaying the events table in
    micro-batches yields exactly q_sessionize's (user, session_no,
    n_events) rows once provisional rows are resolved by the final
    emission per session."""
    src = ev_stream.select(
        "user_id", "event_id", F.expr("ts_ns div 1000").alias("ts_us")
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _sessionize_update,
        SESS_OUT_SCHEMA,
        SESS_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------------ round 7
# Streaming twins of the two sequential monitors (q_sprt /
# q_page_hinkley).  Sequential tests are BORN streaming — the batch
# queries replay history because the driver contract is batch+oracle;
# these are the forms a live deployment runs.  Both follow the
# stream_holt discipline: state is a calendar-bounded daily-count map
# (date cardinality, never event cardinality), refolded per
# micro-batch so every emission is the exact decision over all data
# so far, and late rows repair the fold for free.

SPRT_OUT_SCHEMA = (
    "event_type string, n_days long, llr double, first_cross long,"
    " decision string"
)
#: one state group holds the (day, type) count matrix — SPRT needs
#: each day's TOTAL across types, so the state cannot shard per type.
#: Size = active days x active types (calendar x enum bounded).
SPRT_STATE_SCHEMA = (
    "days array<long>, types array<string>, counts array<long>"
)

PH_OUT_SCHEMA = (
    "event_type string, n_days long, cum_dev double, ph double,"
    " alarm int"
)
PH_STATE_SCHEMA = "days array<long>, counts array<long>"


def _round_nano_half_up(x: float) -> int:
    """HALF_UP nano-int (Spark F.round semantics; Python round() is
    banker's and would diverge on exact .5 boundaries)."""
    import math

    s = math.floor(abs(x) * 1e9 + 0.5)
    return -s if x < 0 else s


def sprt_fold(day_type_counts: dict) -> list[tuple]:
    """The shared SPRT fold: {(day, type): count} -> per-type
    (type, n_days, llr, first_cross, decision) rows — the identical
    integer recurrence as q_sprt's window plan (nano-int log-literal
    increments, first Wald-boundary crossing), shared by the
    streaming twin and the parity test."""
    from shadems_spark.queries.analytics import (
        _SPRT_DN, _SPRT_LA, _SPRT_LB, _SPRT_UP,
    )

    day_totals: dict = {}
    per_type: dict = {}
    for (d, t), c in day_type_counts.items():
        day_totals[d] = day_totals.get(d, 0) + c
        per_type.setdefault(t, {})[d] = c
    out = []
    for t in sorted(per_type):
        cum, up_rn, dn_rn = 0, None, None
        days = sorted(per_type[t])
        for rn, d in enumerate(days, start=1):
            y = per_type[t][d]
            cum += y * _SPRT_LA + (day_totals[d] - y) * _SPRT_LB
            if up_rn is None and cum >= _SPRT_UP:
                up_rn = rn
            if dn_rn is None and cum <= _SPRT_DN:
                dn_rn = rn
        decision = (
            "h1" if up_rn is not None and (dn_rn is None or up_rn < dn_rn)
            else "h0" if dn_rn is not None else "continue"
        )
        out.append((
            t, len(days), _round6_half_up(cum / 1e9),
            min(up_rn or 1 << 30, dn_rn or 1 << 30), decision,
        ))
    return out


def _sprt_update(key, pdfs: Iterator, state: GroupState):
    import pandas as pd

    if state.exists:
        days, types, counts = state.get
        acc = {(int(d), t): int(c) for d, t, c in zip(days, types, counts)}
    else:
        acc = {}
    for pdf in pdfs:
        for (d, t), c in pdf.groupby(["day_idx", "event_type"]).size().items():
            k = (int(d), t)
            acc[k] = acc.get(k, 0) + int(c)
    state.update((
        [d for d, _ in acc], [t for _, t in acc], list(acc.values()),
    ))
    rows = sprt_fold(acc)
    yield pd.DataFrame(
        rows,
        columns=["event_type", "n_days", "llr", "first_cross", "decision"],
    )


def stream_sprt(ev_stream: DataFrame) -> DataFrame:
    """Streaming Wald SPRT — the applyInPandasWithState twin of
    q_sprt: ONE state group carries the (day, type) count matrix
    (SPRT's per-day increment needs the day's total across types, so
    the state cannot shard by type; it is calendar x enum bounded
    regardless of stream length), refolded per micro-batch.  Every
    emission is the exact all-data-so-far decision table; a late row
    bumps its (day, type) cell and the next refold repairs every
    type's LLR path.  Replay-idempotent: counts merge additively and
    the fold is a pure function of the merged state."""
    src = ev_stream.select(
        "event_type",
        F.expr("ts_ns div 86400000000000").alias("day_idx"),
        F.lit(0).alias("g"),
    )
    return src.groupBy("g").applyInPandasWithState(
        _sprt_update,
        SPRT_OUT_SCHEMA,
        SPRT_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def page_hinkley_fold(day_counts: dict) -> tuple[int, int, int]:
    """The shared Page-Hinkley fold (delta=5, nano-int state):
    {day: count} -> (n_days, cum_dev_n, ph_n) — the identical
    integer recurrence as q_page_hinkley's JVM fold (running mean
    inside the recurrence, HALF_UP nano rounding of each deviation
    before it enters the integer state)."""
    t = s = cum = mn = ph = 0
    for d in sorted(day_counts):
        y = day_counts[d]
        t += 1
        s += y
        devn = _round_nano_half_up(y - s / t - 5.0)
        cum += devn
        mn = min(mn, cum)
        ph = max(ph, cum - mn)
    return t, cum, ph


def _ph_update(key, pdfs: Iterator, state: GroupState):
    import pandas as pd

    if state.exists:
        days, counts = state.get
        acc = dict(zip((int(d) for d in days), (int(c) for c in counts)))
    else:
        acc = {}
    for pdf in pdfs:
        for d, c in pdf.groupby("day_idx").size().items():
            acc[int(d)] = acc.get(int(d), 0) + int(c)
    state.update((list(acc.keys()), list(acc.values())))
    n, cum, ph = page_hinkley_fold(acc)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_days": [n],
            "cum_dev": [_round6_half_up(cum / 1e9)],
            "ph": [_round6_half_up(ph / 1e9)],
            "alarm": [int(ph > 50_000_000_000)],
        }
    )


def stream_page_hinkley(ev_stream: DataFrame) -> DataFrame:
    """Streaming Page-Hinkley drift monitor per event type — the
    applyInPandasWithState twin of q_page_hinkley.  State is the
    type's daily-count map (calendar-bounded); the refold keeps the
    running mean exact under ANY batching — an incremental-state
    variant would drift as soon as a late row changed an early
    day's mean contribution.  Emissions carry (cum_dev, ph, alarm)
    after every micro-batch; replay-idempotent by the same additive-
    merge argument as stream_holt."""
    src = ev_stream.select(
        "event_type",
        F.expr("ts_ns div 86400000000000").alias("day_idx"),
    )
    return src.groupBy("event_type").applyInPandasWithState(
        _ph_update,
        PH_OUT_SCHEMA,
        PH_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


CUSUM_OUT_SCHEMA = (
    "event_type string, n_days long, cp_day date, cusum_at_cp double"
)
CUSUM_STATE_SCHEMA = "days array<long>, counts array<long>"


def cusum_fold(day_counts: dict) -> tuple[int, int, float]:
    """The shared CUSUM fold: {day_idx: count} -> (n_days,
    cp_day_idx, cusum_at_cp) — the identical IEEE sequence as
    q_cusum's window plan (integer prefix sums, the full-series mean
    entering once as rn * (s/n), argmax |CUSUM| with earliest-day
    tie-break, HALF_UP 6dp on the emitted magnitude)."""
    days = sorted(day_counts)
    n = len(days)
    s = sum(day_counts[d] for d in days)
    mean = s / n
    prefix = 0
    best_d, best_c, best_abs = None, 0.0, -1.0
    for rn, d in enumerate(days, start=1):
        prefix += day_counts[d]
        cusum = prefix - rn * mean
        a = abs(cusum)
        if a > best_abs:
            best_abs, best_d, best_c = a, d, cusum
    return n, best_d, _round6_half_up(best_c)


def _cusum_update(key, pdfs: Iterator, state: GroupState):
    import datetime

    import pandas as pd

    if state.exists:
        days, counts = state.get
        acc = dict(zip((int(d) for d in days), (int(c) for c in counts)))
    else:
        acc = {}
    for pdf in pdfs:
        for d, c in pdf.groupby("day_idx").size().items():
            acc[int(d)] = acc.get(int(d), 0) + int(c)
    state.update((list(acc.keys()), list(acc.values())))
    n, cp_idx, cusum = cusum_fold(acc)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_days": [n],
            "cp_day": [
                datetime.date(1970, 1, 1) + datetime.timedelta(days=cp_idx)
            ],
            "cusum_at_cp": [cusum],
        }
    )


def stream_cusum(ev_stream: DataFrame) -> DataFrame:
    """Streaming CUSUM changepoint monitor per event type — the
    applyInPandasWithState twin of q_cusum, completing the sequential
    monitor family (stream_sprt / stream_page_hinkley / this).  The
    retrospective statistic needs the FULL-series mean, which an
    incremental CUSUM cannot revise — the daily-count-map refold
    recomputes it exactly per micro-batch, so every emission is the
    exact offline answer over all data so far and late rows repair
    both the mean and the argmax for free.  State is calendar-bounded
    (one long per active day per type); replay-idempotent by
    additive merge."""
    src = ev_stream.select(
        "event_type",
        F.expr("ts_ns div 86400000000000").alias("day_idx"),
    )
    return src.groupBy("event_type").applyInPandasWithState(
        _cusum_update,
        CUSUM_OUT_SCHEMA,
        CUSUM_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


EWMAC_OUT_SCHEMA = (
    "event_type string, n_days long, center double, ewma_final double,"
    " ucl_asym double, lcl_asym double, n_violations long,"
    " last_violation_day string, max_margin double"
)
EWMAC_STATE_SCHEMA = "days array<long>, counts array<long>"


def _round_half_up(x: float) -> int:
    import math

    s = math.floor(abs(x) + 0.5)
    return -s if x < 0 else s


def ewma_control_fold(day_counts: dict):
    """The shared EWMA-chart fold: {day_idx: count} -> the
    q_ewma_control output row (or None when no spread estimate
    exists: n < 2 or constant counts — the batch l-filter).  Mirrors
    the query's integer fold step-for-step: nano-int z and margins,
    the (1-lambda)^(2t) decay by repeated 0.64 multiplication
    (HALF_UP at every step), limits from the same float expressions
    — so parity with the batch plan is bit-for-bit."""
    import datetime
    import math

    lam_q = 0.2 / 1.8
    days = sorted(day_counts)
    n = len(days)
    if n < 2:
        return None
    s = sum(day_counts[d] for d in days)
    q = sum(day_counts[d] * day_counts[d] for d in days)
    var_num = q - s * (s / float(n))
    if var_num <= 0:
        return None
    mu = s / float(n)
    sd = math.sqrt(var_num / (n - 1))
    mun = _round_nano_half_up(mu)
    z, w = mun, 1_000_000_000
    nviol, last_t, maxm = 0, 0, -1_000_000_000_000_000_000
    for t, d in enumerate(days, start=1):
        y = day_counts[d]
        z = _round_nano_half_up(0.2 * y + 0.8 * (z / 1e9))
        w = _round_half_up(w * 0.64)
        hw = _round_half_up(
            ((2.7 * sd) * math.sqrt(lam_q * (1.0 - w / 1e9))) * 1e9
        )
        dev = abs(z - mun)
        if dev > hw:
            nviol += 1
            last_t = t
        maxm = max(maxm, dev - hw)
    asym = (2.7 * sd) * math.sqrt(lam_q)
    last_day = (
        (
            datetime.date(1970, 1, 1)
            + datetime.timedelta(days=days[last_t - 1])
        ).isoformat()
        if last_t > 0
        else ""
    )
    return (
        n,
        _round6_half_up(mu),
        _round6_half_up(z / 1e9),
        _round6_half_up(mu + asym),
        _round6_half_up(mu - asym),
        nviol,
        last_day,
        _round6_half_up(maxm / 1e9),
    )


def _ewmac_update(key, pdfs: Iterator, state: GroupState):
    import pandas as pd

    if state.exists:
        days, counts = state.get
        acc = dict(zip((int(d) for d in days), (int(c) for c in counts)))
    else:
        acc = {}
    for pdf in pdfs:
        for d, c in pdf.groupby("day_idx").size().items():
            acc[int(d)] = acc.get(int(d), 0) + int(c)
    state.update((list(acc.keys()), list(acc.values())))
    row = ewma_control_fold(acc)
    if row is None:  # no spread estimate yet — nothing to chart
        return
    n, center, ewma, ucl, lcl, nviol, last_day, maxm = row
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_days": [n],
            "center": [center],
            "ewma_final": [ewma],
            "ucl_asym": [ucl],
            "lcl_asym": [lcl],
            "n_violations": [nviol],
            "last_violation_day": [last_day],
            "max_margin": [maxm],
        }
    )


def stream_ewma_control(ev_stream: DataFrame) -> DataFrame:
    """Streaming EWMA control chart per event type — the
    applyInPandasWithState twin of q_ewma_control, completing the
    monitor family's streaming coverage (stream_sprt /
    stream_page_hinkley / stream_cusum / this).  Like CUSUM, the
    chart's center and sigma are RETROSPECTIVE (full-series
    sufficient statistics an incremental estimate cannot revise), so
    the calendar-bounded daily-count-map state refolds per
    micro-batch: every emission is the exact offline chart over all
    data so far, late rows repair center/limits/EWMA for free, and
    batching granularity cannot change any emission
    (replay-idempotent by additive merge — the stream_holt
    discipline)."""
    src = ev_stream.select(
        "event_type",
        F.expr("ts_ns div 86400000000000").alias("day_idx"),
    )
    return src.groupBy("event_type").applyInPandasWithState(
        _ewmac_update,
        EWMAC_OUT_SCHEMA,
        EWMAC_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
