"""Structured Streaming end-to-end: the batch-first builders under a
real readStream with availableNow trigger (SURVEY.md §2 S)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.streaming import stateful as ST
from shadems_spark.streaming import windows as SW


def test_stream_tumbling_matches_batch(spark, sf_dir):
    n_stream = SW.run_stream_smoke(spark, sf_dir, out_table="t_stream_smoke")
    n_batch = SW.tumbling(load_table(spark, sf_dir, "events")).count()
    assert n_stream == n_batch > 0


def test_session_windows_merge(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sessions = SW.session(ev)
    agg = sessions.agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_sessions")).first()
    assert agg["total"] == ev.count()  # every event in exactly one session
    assert 0 < agg["n_sessions"] < ev.count()


def test_horizon_filter(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.expr("ts_ns div 1000"))
    kept = SW.horizon_filter(ev, "ts_us", 86_400_000_000)
    assert 0 < kept.count() < ev.count()


def test_streaming_dedup_matches_batch(spark, sf_dir):
    """S5 under a real stream: dropDuplicates on event_id with a
    watermark, drained with availableNow — one row per distinct id."""
    ev_stream = SW.stream_from_parquet(spark, sf_dir)
    q = (
        ev_stream.dropDuplicates(["event_id"])
        .select("event_id")
        .writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_dedup_stream").count()
    want = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert got == want > 0


def test_streaming_raster_matches_batch(spark, sf_dir):
    """The canvas aggregation under readStream: drain the events
    source and compare every (window, bin) count against the same
    expressions run in batch — identical logical plan, two modes."""
    ev_stream = SW.stream_from_parquet(spark, sf_dir)
    q = (
        SW.streaming_raster(ev_stream)
        .writeStream.format("memory")
        .queryName("t_raster_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win"]["start"], r["bx"]): r["val"]
        for r in spark.table("t_raster_stream").collect()
    }
    ev_batch = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
    )
    want = {
        (r["win"]["start"], r["bx"]): r["val"]
        for r in SW.streaming_raster(ev_batch).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_foreachbatch_sink(spark, sf_dir, tmp_path):
    """Source -> raster -> foreachBatch parquet sink: the durable-sink
    pattern (complete mode, overwrite per microbatch — last batch is
    the full result under availableNow)."""
    out = str(tmp_path / "stream_sink")
    ev = SW.stream_from_parquet(spark, sf_dir)

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(out)

    q = (
        SW.streaming_raster(ev)
        .writeStream.foreachBatch(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    ev_batch = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
    )
    want = SW.streaming_raster(ev_batch).agg(F.sum("val")).first()[0]
    assert back.agg(F.sum("val")).first()[0] == want


#: final watermark of the planted-late fixture: 06:35 fresh row - 10'
_WM_FINAL = "2024-01-01 06:25:00"


def _planted_late_dir(spark, tmp_path):
    """Three parquet files = three micro-batches (the watermark a
    batch FILTERS with is the one computed from the batches before the
    previous one, so the late file must arrive two batches after the
    advancer).  File 2 advances event time to 06:35; file 3 carries a
    LATE row (02:30, far behind the 06:25 watermark -> dropped).
    Returns (dir, on_time_df, late_df)."""
    import os
    import time

    mk = lambda eid, hhmm, typ, uid: (
        eid, f"2024-01-01 {hhmm}:00", uid, typ, float(eid),
    )
    batches = [
        [
            mk(1, "01:05", "click", 1),
            mk(2, "01:15", "click", 1),
            mk(3, "02:10", "view", 2),
            mk(4, "03:20", "click", 2),
        ],
        [mk(5, "05:50", "view", 1), mk(7, "06:35", "view", 3)],
        [mk(6, "02:30", "click", 3)],  # the planted late row
    ]
    d = str(tmp_path / "late_events")
    cols = "event_id long, ts_s string, user_id long, event_type string, value double"
    to_df = lambda rows: (
        spark.createDataFrame(rows, cols)
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
                "user_id", "event_type", "value")
    )
    # one flat dir; file mtimes force the source's processing order
    os.makedirs(d + "/in", exist_ok=True)
    now = time.time()
    for i, rows in enumerate(batches):
        to_df(rows).coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
        src = next(
            f for f in os.listdir(f"{d}/b{i}") if f.endswith(".parquet")
        )
        dst = f"{d}/in/batch_{i}.parquet"
        os.rename(f"{d}/b{i}/{src}", dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    return d + "/in", to_df(batches[0] + batches[1]), to_df(batches[2])


def test_watermark_drops_late_rows_tumbling(spark, sf_dir, tmp_path):
    """S4 for real: tumbling agg under withWatermark + availableNow,
    append mode.  The planted late row must NOT be counted, and the
    emitted windows must equal the batch tumbling agg over the on-time
    rows restricted to windows closed by the final watermark."""
    src, on_time, late_df = _planted_late_dir(spark, tmp_path)
    ev = SW.stream_events_dir(spark, src, watermark="10 minutes")
    q = (
        SW.tumbling(ev)
        .writeStream.format("memory")
        .queryName("t_wm_tumbling")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win"]["start"].isoformat(), r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.table("t_wm_tumbling").collect()
    }
    # final watermark 06:25 -> the 06:00-07:00 window stays open and
    # must not have been emitted
    want = {
        (r["win"]["start"].isoformat(), r["event_type"]): (r["n"], r["sum_value"])
        for r in SW.tumbling(on_time)
        .filter(F.col("win.end") <= F.lit(_WM_FINAL).cast("timestamp"))
        .collect()
    }
    assert got == want and len(want) > 0
    # the late row's (02:00 window, click, user 3) contribution is absent
    assert got[("2024-01-01T02:00:00", "view")] == (1, 3.0)
    assert ("2024-01-01T02:00:00", "click") not in got


def test_watermark_drops_late_rows_dedup(spark, sf_dir, tmp_path):
    """S5 for real: dropDuplicates under the watermark — a brand-new
    id arriving behind the watermark is dropped, so the stream output
    is the batch distinct of the ON-TIME rows only."""
    src, on_time, _late = _planted_late_dir(spark, tmp_path)
    ev = SW.stream_events_dir(spark, src, watermark="10 minutes")
    q = (
        ev.dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
        .writeStream.format("memory")
        .queryName("t_wm_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_id"] for r in spark.table("t_wm_dedup").collect()}
    assert got == {r["event_id"] for r in on_time.collect()} == {1, 2, 3, 4, 5, 7}


def test_watermark_session_parity(spark, sf_dir, tmp_path):
    """S3 under the watermark: sessions closed by the final watermark
    match the batch session windows over the on-time rows."""
    src, on_time, _late = _planted_late_dir(spark, tmp_path)
    ev = SW.stream_events_dir(spark, src, watermark="10 minutes")
    q = (
        SW.session(ev)
        .writeStream.format("memory")
        .queryName("t_wm_session")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["win"]["start"].isoformat(), r["n"])
        for r in spark.table("t_wm_session").collect()
    }
    closed = SW.session(on_time).filter(
        F.col("win.end") <= F.lit(_WM_FINAL).cast("timestamp")
    )
    want = {
        (r["user_id"], r["win"]["start"].isoformat(), r["n"])
        for r in closed.collect()
    }
    assert got == want and len(want) > 0


def test_stream_static_join_matches_batch(spark, sf_dir):
    """Stream-static enrichment: the streaming events frame joins a
    static dimension (broadcastable per micro-batch); drained with
    availableNow it must equal the batch join + aggregate."""
    ev_batch = load_table(spark, sf_dir, "events")
    dim = ev_batch.select("user_id").distinct().withColumn(
        "tier", F.when(F.col("user_id") % 3 == 0, "gold").otherwise("std")
    )
    ev_stream = SW.stream_from_parquet(spark, sf_dir).select("user_id", "value")
    q = (
        ev_stream.join(F.broadcast(dim), "user_id")
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .writeStream.format("memory")
        .queryName("t_static_join")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["tier"]: (r["n"], r["s"]) for r in spark.table("t_static_join").collect()}
    want = {
        r["tier"]: (r["n"], r["s"])
        for r in ev_batch.join(dim, "user_id")
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    assert got == want and len(want) == 2


def test_stateful_stream_matches_batch(spark, sf_dir):
    """applyInPandasWithState end-to-end: drain the events source with
    availableNow, compare final per-user state against the batch agg."""
    from shadems_spark.streaming import stateful as ST

    ev_stream = SW.stream_from_parquet(spark, sf_dir).select("user_id", "value")
    q = (
        ST.running_totals_stream(ev_stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.table("t_stateful").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in ST.running_totals_batch(ev).collect()
    }
    assert got == want


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join for real: two watermarked readStream
    frames (clicks, purchases), joined with the time-bound condition,
    drained with availableNow — output must equal the batch
    interval_join on the same events."""
    clicks = SW.stream_from_parquet(spark, sf_dir).filter(
        F.col("event_type") == "click"
    )
    purchases = SW.stream_from_parquet(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    q = (
        SW.interval_join(clicks, purchases)
        .writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["gap_us"])
        for r in spark.table("t_ssjoin").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["gap_us"])
        for r in SW.interval_join(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_transform_with_state_parity_or_env_gate(spark, sf_dir):
    """Spark 4 transformWithStateInPandas running-max: parity with the
    batch form when the environment can run it; otherwise the operator
    must fail loud with the documented EnvironmentError (its Python
    driver worker needs google.protobuf, absent in this container)."""
    import pytest

    from shadems_spark.catalog import load_table

    try:
        from google.protobuf import descriptor  # noqa: F401
        have_protobuf = True
    except ImportError:
        have_protobuf = False

    ev_stream = SW.stream_from_parquet(spark, sf_dir)
    if not have_protobuf:
        with pytest.raises(EnvironmentError, match="protobuf"):
            ST.running_max_tws(ev_stream)
        return

    provider_before = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    sink = ST.run_tws_to_memory(ev_stream)
    # RocksDB provider must be scoped to the query, not left switched
    # for every later streaming query in the session (ADVICE r03).
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        == provider_before
    )
    # Update-mode sink may hold one row per key per micro-batch; the
    # updates are monotone, so reduce to the final state per key
    # (max n_events) instead of relying on collect() row order.
    final = {}
    for r in sink.collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["max_value"])
    got = final
    want = {
        r["user_id"]: (r["n_events"], r["max_value"])
        for r in ST.running_max_batch(load_table(spark, sf_dir, "events")).collect()
    }
    assert got == want


def test_foreach_batch_merge_parity(spark, sf_dir, tmp_path):
    """foreachBatch streaming merge: after draining the events source,
    the merged table equals the one-shot batch aggregate."""
    import shutil

    from shadems_spark.catalog import load_table

    out = str(tmp_path / "totals.parquet")
    ev = SW.stream_from_parquet(spark, sf_dir)
    ST.stream_merge_into(ev, out)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in ST.read_merged_totals(spark, out).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in ST.running_totals_batch(load_table(spark, sf_dir, "events")).collect()
    }
    assert got == want
    shutil.rmtree(out + ".ckpt", ignore_errors=True)


def test_stream_static_enrich_matches_batch(spark, sf_dir):
    """Stream-static broadcast join: the event stream enriched with
    the (batch) customer dim under availableNow, complete mode — the
    per-segment running totals must equal the batch run of the same
    builder."""
    cust = load_table(spark, sf_dir, "customer")
    ev_stream = SW.stream_from_parquet(spark, sf_dir)
    q = (
        SW.enrich(ev_stream, cust)
        .writeStream.format("memory")
        .queryName("t_enrich_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["c_mktsegment"]: (r["n_events"], r["sum_value"])
        for r in spark.table("t_enrich_stream").collect()
    }
    want = {
        r["c_mktsegment"]: (r["n_events"], r["sum_value"])
        for r in SW.enrich(load_table(spark, sf_dir, "events"), cust).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_corpus_admission_matches_batch(spark, tmp_path):
    """The LLM-curation admission pipeline under a real stream:
    Gopher gate + content-hash dedup across micro-batches.  A dup
    planted in a LATER file must be rejected (cross-batch state);
    the admitted text set equals the batch pipeline's."""
    import os
    import time

    d = str(tmp_path)
    batches = [
        [(1, "the quick brown fox jumps over the lazy dog today ok fine"),
         (2, "xx")],                                     # 2 fails gopher (too short)
        [(3, "a completely different document about engines and scale here"),
         (4, "the quick brown fox jumps over the lazy dog today ok fine")],  # dup of 1
    ]

    def to_df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    os.makedirs(d + "/in", exist_ok=True)
    now = time.time()
    for i, rows in enumerate(batches):
        to_df(rows).coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
        src = next(f for f in os.listdir(f"{d}/b{i}") if f.endswith(".parquet"))
        dst = f"{d}/in/batch_{i}.parquet"
        os.rename(f"{d}/b{i}/{src}", dst)
        os.utime(dst, (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/in")
    )
    q = (
        SW.curate_admission(stream)
        .select("doc_id", "text")
        .writeStream.format("memory")
        .queryName("t_admission")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["text"] for r in spark.table("t_admission").collect()}
    batch_all = to_df(batches[0] + batches[1])
    want = {r["text"] for r in SW.curate_admission(batch_all).collect()}
    assert got == want
    assert len(got) == 2  # doc2 quality-rejected, doc4 dedup-rejected


def test_python_streaming_source_matches_batch_source(spark, tmp_path):
    """Spark 4 custom PYTHON streaming DataSource (simpleStreamReader):
    drained under availableNow in row-count micro-batches, the stream
    must deliver exactly the batch source's rows (same deterministic
    generator, same schema) — the replayable-offsets contract."""
    from shadems_spark.sources.pysource import (
        register_synthgen,
        register_synthstream,
    )

    import time

    register_synthgen(spark)
    register_synthstream(spark)
    # availableNow snapshots ONE read() window for a simple stream
    # reader, so drain with a fast processing-time trigger instead:
    # micro-batches advance {"pos"} by batchRows until exhausted.
    q = (
        spark.readStream.format("synthstream")
        .option("rows", 500)
        .option("batchRows", 120)
        .load()
        .writeStream.format("memory")
        .queryName("t_synthstream")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.table("t_synthstream").count() >= 500:
            break
        time.sleep(0.5)
    q.stop()
    got = {tuple(r) for r in spark.table("t_synthstream").collect()}
    want = {
        tuple(r)
        for r in spark.read.format("synthgen").option("rows", 500).load().collect()
    }
    assert got == want and len(got) == 500


def _write_doc_batches(spark, tmp_path, batches):
    """One parquet file per batch under in/, mtime-ordered so
    maxFilesPerTrigger=1 drains them as separate micro-batches."""
    import os
    import time

    d = str(tmp_path)
    os.makedirs(d + "/in", exist_ok=True)
    now = time.time()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
        src = next(f for f in os.listdir(f"{d}/b{i}") if f.endswith(".parquet"))
        dst = f"{d}/in/batch_{i}.parquet"
        os.rename(f"{d}/b{i}/{src}", dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/in")
    )


_ADMIT_DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # dup of 1
    (3, "one two three four five six seven eight nine ten eleven twelve"),
    (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # dup of 1
    (5, "one two three four five six seven eight nine ten eleven twelve"),  # dup of 3
    (6, "entirely different text about spark shuffles and partition pruning"),
]


def _candidate_pairs(spark):
    """The pairwise near-dup relation, computed ONCE in batch by the
    same banding family the stream uses — the reference implementations
    below replay admission policies over this relation in Python."""
    from shadems_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    docs = spark.createDataFrame(_ADMIT_DOCS, "doc_id long, text string")
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=32, ngram=3)
    raw = lsh_candidate_pairs(sigs, "doc_id").collect()
    return {frozenset((r[0], r[1])) for r in raw}


def test_stream_minhash_admission_sequential_greedy(spark, tmp_path):
    """One doc per micro-batch => the stream IS the sequential greedy
    scan: admit a doc iff it shares no band bucket with an already-
    ADMITTED doc.  Reference: Python greedy over the batch-computed
    candidate-pair relation (rejected docs never block later docs —
    their buckets are never written to the store)."""
    stream = _write_doc_batches(spark, tmp_path, [[r] for r in _ADMIT_DOCS])
    store = str(tmp_path / "store")
    ST.stream_minhash_admission(stream, store)

    pairs = _candidate_pairs(spark)
    admitted = []
    for i in sorted(r[0] for r in _ADMIT_DOCS):
        if not any(frozenset((i, j)) in pairs for j in admitted):
            admitted.append(i)
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(store + "/admitted").collect()
    )
    assert got == admitted
    assert 1 in got and 2 not in got and 4 not in got  # dups of 1 rejected
    # replayed-batch safety: the store's bucket rows cover exactly the
    # admitted docs (rejected docs must never gate future batches)
    bucket_ids = {
        r["doc_id"] for r in spark.read.parquet(store + "/buckets").collect()
    }
    assert bucket_ids == set(admitted)


def test_stream_minhash_admission_batch_granular(spark, tmp_path):
    """Multi-doc micro-batches => the documented batch-granular rule:
    reject a doc that buckets with any resident ADMITTED doc, or with
    any smaller-id doc of its own batch (whether or not that doc is
    itself rejected).  Reference replays the same rule in Python over
    the batch-computed pair relation."""
    batches = [_ADMIT_DOCS[:3], _ADMIT_DOCS[3:]]
    stream = _write_doc_batches(spark, tmp_path, batches)
    store = str(tmp_path / "store")
    ST.stream_minhash_admission(stream, store)

    pairs = _candidate_pairs(spark)
    admitted: set[int] = set()
    for rows in batches:
        ids = sorted(r[0] for r in rows)
        keep = [
            i for i in ids
            if not any(frozenset((i, j)) in pairs for j in admitted)
            and not any(frozenset((i, j)) in pairs for j in ids if j < i)
        ]
        admitted |= set(keep)
    got = {r["doc_id"] for r in spark.read.parquet(store + "/admitted").collect()}
    assert got == admitted and 1 in got and 6 in got


def _write_word_batches(spark, tmp_path, batches):
    """One parquet file per word batch under win/, mtime-ordered (the
    _write_doc_batches recipe for a bare item stream)."""
    import os
    import time

    d = str(tmp_path)
    os.makedirs(d + "/win", exist_ok=True)
    now = time.time()
    for i, ws in enumerate(batches):
        df = spark.createDataFrame([(w,) for w in ws], "w string")
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/wb{i}")
        src = next(f for f in os.listdir(f"{d}/wb{i}") if f.endswith(".parquet"))
        dst = f"{d}/win/batch_{i}.parquet"
        os.rename(f"{d}/wb{i}/{src}", dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    return (
        spark.readStream.schema("w string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/win")
    )


def test_stream_heavy_hitters_matches_batch(spark, tmp_path):
    """MG summary across micro-batches + exact finalize == the batch
    two-phase operator, row for row — including a skewed item whose
    mass is SPREAD over batches (each batch alone below threshold, so
    only cross-batch state finds it) — and every snapshot honors the
    <= m size bound."""
    from shadems_spark.operators.profile import heavy_hitters

    m = 5
    # hot/hot2 are the true heavy set (24*5 and 28*5 > N=108); warm
    # accumulates across batches but stays below phi (8*5 < 108); the
    # cold tail is distinct per batch (vocab churn stresses MG).
    batches = [
        ["hot"] * 6 + ["hot2"] * 7 + ["warm"] * 2
        + [f"c{b}_{i}" for i in range(12)]
        for b in range(4)
    ]
    stream = _write_word_batches(spark, tmp_path, batches)
    store = str(tmp_path / "hh_store")
    ST.stream_heavy_hitters(stream, store, col="w", m=m)

    allw = [w for b in batches for w in b]
    static = spark.createDataFrame([(w,) for w in allw], "w string")
    got = sorted(
        map(tuple, ST.heavy_hitters_finalize(static, store, col="w", m=m).collect())
    )
    want = sorted(map(tuple, heavy_hitters(static, "w", m=m).collect()))
    assert got == want
    assert {r[0] for r in got} == {"hot", "hot2"}

    # per-snapshot size bound
    snaps = spark.read.parquet(store + "/summary")
    sizes = (
        snaps.groupBy("batch_id").count().collect()
    )
    assert sizes and all(r["count"] <= m for r in sizes)


def test_stream_kl_drift_parity_and_signal(spark, tmp_path):
    """Replay three batches; recompute every drift row bit-for-bit in
    plain Python (same Laplace reference, same nano-int rounding —
    HALF_UP like Spark's round), and check the monitoring signal: an
    in-distribution batch scores LOWER drift than a vocabulary-shifted
    one."""
    import math
    from collections import Counter

    base = "aa bb cc aa bb aa"
    batches = [
        [(0, base), (1, "aa bb cc cc")],
        [(2, base), (3, "aa bb aa cc")],        # in-distribution
        [(4, "xx yy zz xx yy xx zz")],          # shifted vocabulary
    ]
    stream = _write_doc_batches(spark, tmp_path, batches)
    store = str(tmp_path / "drift_store")
    ST.stream_kl_drift(stream, store)

    rows = {
        r["batch_id"]: r
        for r in spark.read.parquet(store + "/drift").collect()
    }
    assert set(rows) == {1, 2}  # batch 0 has no resident reference

    def half_up(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    resident = Counter()
    expect = {}
    for i, b in enumerate(batches):
        bc = Counter(w for _, t in b for w in t.split(" "))
        if i > 0:
            vu = len(set(resident) | set(bc))
            nb_tot, nr_tot = sum(bc.values()), sum(resident.values())
            kl_nano = sum(
                half_up(
                    (n / nb_tot)
                    * math.log(
                        (n / nb_tot)
                        / ((resident[w] + 1) / (nr_tot + vu))
                    )
                    * 1e9
                )
                for w, n in bc.items()
            )
            novel = sum(1 for w in bc if w not in resident)
            expect[i] = (nb_tot, vu, novel, kl_nano)
        resident += bc

    for i in (1, 2):
        r = rows[i]
        assert (
            r["n_tokens"], r["vocab"], r["novel_words"], r["kl_nano"]
        ) == expect[i], (i, dict(r.asDict()), expect[i])
    assert rows[2]["kl"] > rows[1]["kl"]  # the shifted batch alarms
    assert rows[2]["novel_words"] == 3 and rows[1]["novel_words"] == 0


def test_stream_bootstrap_matches_batch_bitwise(spark, tmp_path, sf_dir):
    """Mergeable-statistic parity: streaming the documents table in 3
    micro-batches must reproduce q_bootstrap_ci's 32 replicate rows
    BIT-FOR-BIT (integer partial sums + a pure (id, r) weight
    function make batching irrelevant)."""
    import os

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    rows = docs.collect()
    third = len(rows) // 3
    batches = [rows[:third], rows[third:2 * third], rows[2 * third:]]

    d = str(tmp_path)
    os.makedirs(d + "/bin", exist_ok=True)
    import time as _t
    now = _t.time()
    for i, b in enumerate(batches):
        df = spark.createDataFrame(b, "doc_id long, n_chars long")
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/bb{i}")
        src = next(
            f for f in os.listdir(f"{d}/bb{i}") if f.endswith(".parquet")
        )
        dst = f"{d}/bin/batch_{i}.parquet"
        os.rename(f"{d}/bb{i}/{src}", dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    stream = (
        spark.readStream.schema("doc_id long, n_chars long")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/bin")
    )
    store = str(tmp_path / "bs_store")
    ST.stream_bootstrap(stream, store)

    got = [
        (r["r"], r["n_eff"], r["mean_chars"])
        for r in ST.bootstrap_finalize(spark, store).collect()
    ]
    want = [
        (r["r"], r["n_eff"], r["mean_chars"])
        for r in load_registry()["q_bootstrap_ci"][0](spark, sf_dir).collect()
    ]
    assert got == want and len(got) == 32


def test_stream_holt_matches_replay_and_batch(spark, sf_dir):
    """Streaming Holt twin: drain the events source with availableNow;
    the final per-type emission must equal the pure-Python fold over
    that type's own daily-count span (holt_fit), and — for types whose
    first/last active day touch the global span — equal q_holt's
    batch result exactly."""
    from shadems_spark.queries import load_registry
    from shadems_spark.streaming import stateful as ST

    ev_stream = SW.stream_from_parquet(spark, sf_dir).select(
        "event_type", "ts_ns"
    )
    q = (
        ST.stream_holt(ev_stream)
        .writeStream.format("memory")
        .queryName("t_holt")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_holt").collect()
    got = {}
    for r in rows:  # update mode re-emits per batch; keep the fullest fit
        cur = got.get(r["event_type"])
        if cur is None or r["n_days"] >= cur["n_days"]:
            got[r["event_type"]] = r

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.expr("ts_ns div 86400000000000").alias("d")
        ).count().collect()
    )
    acc = {}
    for r in daily:
        acc.setdefault(r["event_type"], {})[r["d"]] = r["count"]
    g0 = min(min(m) for m in acc.values())
    g1 = max(max(m) for m in acc.values())
    batch = {
        r["event_type"]: r
        for r in load_registry()["q_holt"][0](spark, sf_dir).collect()
    }
    for t, m in acc.items():
        n, level, trend, f7 = ST.holt_fit(m)
        r = got[t]
        assert r["n_days"] == n
        assert abs(r["level"] - level) < 1e-6
        assert abs(r["trend"] - trend) < 1e-6
        assert abs(r["forecast_7"] - f7) < 1e-6
        if min(m) == g0 and max(m) == g1:
            assert r["n_days"] == batch[t]["n_days"]
            assert abs(r["level"] - batch[t]["level"]) < 2e-6
            assert abs(r["trend"] - batch[t]["trend"]) < 2e-6


def test_stream_ams_merges_to_batch_sketch_bitwise(spark, tmp_path, sf_dir):
    """Linear-sketch mergeability, pinned bit-for-bit: stream the
    events table through stream_ams in 3 micro-batches; the merged
    sign counters must equal one batch fold over the union (replayed
    in python with the same coefficients), and ams_finalize's
    estimate must equal the batch q_ams_f2's ams_f2 column on the
    SAME rows."""
    import os
    import time

    from shadems_spark.catalog import load_table
    from shadems_spark.operators.text import FP_MOD
    from shadems_spark.queries import load_registry
    from shadems_spark.queries.analytics import _ams_coeffs

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    pdf = ev.toPandas().sort_values("event_id")
    third = len(pdf) // 3
    d = str(tmp_path)
    os.makedirs(d + "/in", exist_ok=True)
    now = time.time()
    for i in range(3):
        chunk = pdf.iloc[i * third : (i + 1) * third if i < 2 else len(pdf)]
        df = spark.createDataFrame(chunk)
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
        src = next(
            f for f in os.listdir(f"{d}/b{i}") if f.endswith(".parquet")
        )
        dst = f"{d}/in/batch_{i}.parquet"
        os.rename(f"{d}/b{i}/{src}", dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/in")
    )
    store = str(tmp_path / "ams_store")
    ST.stream_ams(stream, store)

    # python replay of the merged counters over ALL rows
    p = FP_MOD
    ys = [0] * 16
    for u in pdf.user_id:
        u = int(u) % p
        for r, (a, b, c, dd) in enumerate(_ams_coeffs()):
            h = a
            for coef in (b, c, dd):
                h = (h * u + coef) % p
            ys[r] += 1 - 2 * (h % 2)
    fin = ST.ams_finalize(spark, store)
    assert fin["n_rows"] == len(pdf)
    snaps = spark.read.parquet(store + "/counters")
    row = snaps.filter(F.col("batch_id") == fin["batch_id"]).first()
    assert [row[f"y{r}"] for r in range(16)] == ys

    batch = load_registry()["q_ams_f2"][0](spark, sf_dir).collect()[0]
    assert fin["ams_f2"] == batch["ams_f2"]


def test_stream_ivm_maintains_aggregate_across_batches(spark, tmp_path, sf_dir):
    """Streaming IVM parity: feed three change batches (inserts then
    a delete wave) through stream_ivm; the final snapshot must equal
    the direct aggregate over the NET rows (inserts minus deletes),
    and a group fully deleted mid-stream must be absent from the
    final snapshot."""
    import os
    import time

    from shadems_spark.catalog import load_table
    from shadems_spark.streaming import stateful as STF

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag", "l_linestatus",
            F.round(F.col("l_quantity") * 100).cast("long").alias(
                "qty_centi"
            ),
            "l_orderkey",
        )
    )
    pdf = li.toPandas()
    b0 = pdf[pdf.l_orderkey % 2 == 0].assign(mult=1)
    b1 = pdf[pdf.l_orderkey % 2 == 1].assign(mult=1)
    # delete wave: remove every row of one (flag, status) group plus
    # a slice of another
    victim = (pdf.l_returnflag.iloc[0], pdf.l_linestatus.iloc[0])
    d2 = pdf[
        (pdf.l_returnflag == victim[0]) & (pdf.l_linestatus == victim[1])
    ].assign(mult=-1)
    b2 = d2
    d = str(tmp_path)
    os.makedirs(d + "/in", exist_ok=True)
    now = time.time()
    cols = ["l_returnflag", "l_linestatus", "qty_centi", "mult"]
    for i, chunk in enumerate([b0, b1, b2]):
        df = spark.createDataFrame(chunk[cols])
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
        src = next(
            f for f in os.listdir(f"{d}/b{i}") if f.endswith(".parquet")
        )
        dst = f"{d}/in/batch_{i}.parquet"
        os.rename(f"{d}/b{i}/{src}", dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    stream = (
        spark.readStream.schema(
            "l_returnflag string, l_linestatus string, "
            "qty_centi long, mult long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/in")
    )
    store = str(tmp_path / "ivm_store")
    STF.stream_ivm(stream, store)

    snap = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["q"])
        for r in STF.ivm_snapshot(spark, store).collect()
    }
    net = pdf[
        ~(
            (pdf.l_returnflag == victim[0])
            & (pdf.l_linestatus == victim[1])
        )
    ]
    truth = {
        k: (len(g), int(g.qty_centi.sum()))
        for k, g in net.groupby(["l_returnflag", "l_linestatus"])
    }
    assert snap == truth
    assert victim not in snap  # retired group


def test_stream_sessionize_matches_batch_ids(spark, tmp_path, sf_dir):
    """Stateful-sessionizer parity: replay the %11 users' events in 3
    time-ordered micro-batches; the LAST emission per (user, session)
    must equal q_sessionize's batch rows exactly (same ids, same
    counts), sessions split across batches must merge (state carries
    the open session), and closed flags must be final for all but at
    most one session per user."""
    import os
    import time

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry
    from shadems_spark.streaming import stateful as STF

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 11 == 0)
        .select("user_id", "event_id", "ts_ns")
    )
    pdf = ev.toPandas().sort_values("ts_ns")
    third = len(pdf) // 3
    d = str(tmp_path)
    os.makedirs(d + "/in", exist_ok=True)
    now = time.time()
    for i in range(3):
        chunk = pdf.iloc[i * third : (i + 1) * third if i < 2 else len(pdf)]
        df = spark.createDataFrame(chunk)
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
        src = next(
            f for f in os.listdir(f"{d}/b{i}") if f.endswith(".parquet")
        )
        dst = f"{d}/in/batch_{i}.parquet"
        os.rename(f"{d}/b{i}/{src}", dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts_ns long")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/in")
    )
    out = STF.stream_sessionize(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM sess_stream").collect()
    # final emission per (user, session): the row with the max
    # n_events (sessions only grow) — provisional rows are superseded
    final: dict = {}
    for r in rows:
        k = (r["user_id"], r["session_no"])
        # later emissions have >= n_events; on ties the CLOSED row is
        # the later one (a session can close with no new events)
        rank = (r["n_events"], r["closed"])
        if k not in final or rank > (
            final[k]["n_events"], final[k]["closed"]
        ):
            final[k] = r
    got = {k: v["n_events"] for k, v in final.items()}
    batch = {
        (r["user_id"], r["session_no"]): r["n_events"]
        for r in load_registry()["q_sessionize"][0](spark, sf_dir).collect()
    }
    assert got == batch
    # at most one open (closed = 0 in its final emission) per user
    from collections import Counter

    open_per_user = Counter(
        k[0] for k, v in final.items() if v["closed"] == 0
    )
    assert all(c == 1 for c in open_per_user.values())


def test_stream_sprt_matches_batch(spark, sf_dir):
    """Streaming SPRT twin: drain the events source with availableNow;
    the final emission must equal q_sprt's batch decision table
    row-for-row (integer LLR recurrence shared via sprt_fold)."""
    from shadems_spark.queries import load_registry

    ev_stream = SW.stream_from_parquet(spark, sf_dir).select(
        "event_type", "ts_ns"
    )
    q = (
        ST.stream_sprt(ev_stream)
        .writeStream.format("memory")
        .queryName("t_sprt")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_sprt").collect()
    got = {}
    for r in rows:  # update mode re-emits per batch; keep the fullest
        cur = got.get(r["event_type"])
        if cur is None or r["n_days"] >= cur["n_days"]:
            got[r["event_type"]] = r
    batch = {
        r["event_type"]: r
        for r in load_registry()["q_sprt"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(batch)
    for t, b in batch.items():
        g = got[t]
        assert g["n_days"] == b["n_days"]
        assert abs(g["llr"] - b["llr"]) < 1e-9
        assert g["first_cross"] == b["first_cross"]
        assert g["decision"] == b["decision"]


def test_stream_page_hinkley_matches_batch(spark, sf_dir):
    """Streaming Page-Hinkley twin: final per-type emission equals
    q_page_hinkley's batch fold bit-for-bit (shared integer
    recurrence, HALF_UP nano rounding)."""
    from shadems_spark.queries import load_registry

    ev_stream = SW.stream_from_parquet(spark, sf_dir).select(
        "event_type", "ts_ns"
    )
    q = (
        ST.stream_page_hinkley(ev_stream)
        .writeStream.format("memory")
        .queryName("t_ph")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_ph").collect()
    got = {}
    for r in rows:
        cur = got.get(r["event_type"])
        if cur is None or r["n_days"] >= cur["n_days"]:
            got[r["event_type"]] = r
    batch = {
        r["event_type"]: r
        for r in load_registry()["q_page_hinkley"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(batch)
    for t, b in batch.items():
        g = got[t]
        assert g["n_days"] == b["n_days"]
        assert abs(g["cum_dev"] - b["cum_dev"]) < 1e-9
        assert abs(g["ph"] - b["ph"]) < 1e-9
        assert g["alarm"] == b["alarm"]


def test_stream_sprt_batch_granularity_invariance(spark, sf_dir):
    """The refold-from-state design makes the decision table a pure
    function of the merged counts: folding the full fixture in ONE
    batch (the availableNow drain above may use several) must equal
    the pure-Python fold over the batch-computed matrix."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            F.expr("ts_ns div 86400000000000").alias("d"), "event_type"
        ).count().collect()
    )
    acc = {(r["d"], r["event_type"]): r["count"] for r in d}
    rows = ST.sprt_fold(acc)
    assert len(rows) == len({t for _, t in acc})
    for t, n_days, llr, first_cross, decision in rows:
        assert n_days == len({d for d, tt in acc if tt == t})
        assert decision in ("h0", "h1", "continue")
        assert (first_cross == 1 << 30) == (decision == "continue")


def test_stream_cusum_matches_batch(spark, sf_dir):
    """Streaming CUSUM twin: the final per-type emission equals
    q_cusum's batch row exactly (changepoint day, 6dp magnitude) —
    the refold recomputes the full-series mean per micro-batch, which
    an incremental CUSUM cannot."""
    from shadems_spark.queries import load_registry

    ev_stream = SW.stream_from_parquet(spark, sf_dir).select(
        "event_type", "ts_ns"
    )
    q = (
        ST.stream_cusum(ev_stream)
        .writeStream.format("memory")
        .queryName("t_cusum")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_cusum").collect()
    got = {}
    for r in rows:
        cur = got.get(r["event_type"])
        if cur is None or r["n_days"] >= cur["n_days"]:
            got[r["event_type"]] = r
    batch = {
        r["event_type"]: r
        for r in load_registry()["q_cusum"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(batch)
    for t, b in batch.items():
        g = got[t]
        assert g["n_days"] == b["n_days"]
        assert g["cp_day"] == b["cp_day"]
        assert abs(g["cusum_at_cp"] - b["cusum_at_cp"]) < 1e-9


def test_stream_ewma_control_matches_batch(spark, sf_dir):
    """Streaming EWMA-chart twin: final per-type emission equals
    q_ewma_control's batch fold bit-for-bit (shared integer
    recurrence incl. the in-fold (1-lambda)^(2t) decay, HALF_UP nano
    rounding, retrospective center/sigma refolded per batch)."""
    from shadems_spark.queries import load_registry

    ev_stream = SW.stream_from_parquet(spark, sf_dir).select(
        "event_type", "ts_ns"
    )
    q = (
        ST.stream_ewma_control(ev_stream)
        .writeStream.format("memory")
        .queryName("t_ewmac")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_ewmac").collect()
    got = {}
    for r in rows:
        cur = got.get(r["event_type"])
        if cur is None or r["n_days"] >= cur["n_days"]:
            got[r["event_type"]] = r
    batch = {
        r["event_type"]: r
        for r in load_registry()["q_ewma_control"][0](spark, sf_dir).collect()
    }
    assert set(got) == set(batch)
    for t, b in batch.items():
        g = got[t]
        assert g["n_days"] == b["n_days"]
        for colname in ("center", "ewma_final", "ucl_asym", "lcl_asym",
                        "max_margin"):
            assert abs(g[colname] - b[colname]) < 1e-9, (t, colname)
        assert g["n_violations"] == b["n_violations"]
        assert g["last_violation_day"] == b["last_violation_day"]


def test_ewma_control_fold_batching_invariance(spark, sf_dir):
    """The refold-from-state design makes every emission a pure
    function of the merged counts: the pure-Python fold over the
    batch-computed daily counts must equal the batch query row —
    independent of how many micro-batches delivered the rows."""
    from shadems_spark.queries import load_registry
    from shadems_spark.streaming.stateful import ewma_control_fold

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            "event_type", F.expr("ts_ns div 86400000000000").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("y"))
        .collect()
    )
    per_type: dict = {}
    for r in d:
        per_type.setdefault(r["event_type"], {})[int(r["d"])] = int(r["y"])
    batch = {
        r["event_type"]: r
        for r in load_registry()["q_ewma_control"][0](spark, sf_dir).collect()
    }
    for t, counts in per_type.items():
        row = ewma_control_fold(counts)
        if t not in batch:
            assert row is None
            continue
        b = batch[t]
        n, center, ewma, ucl, lcl, nviol, last_day, maxm = row
        assert n == b["n_days"]
        assert abs(center - b["center"]) < 1e-9
        assert abs(ewma - b["ewma_final"]) < 1e-9
        assert abs(ucl - b["ucl_asym"]) < 1e-9
        assert abs(maxm - b["max_margin"]) < 1e-9
        assert nviol == b["n_violations"]
        assert last_day == b["last_violation_day"]
