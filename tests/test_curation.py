"""Curation operators: decontamination overlap, repetition metrics,
PII scrubbing, deterministic stratified sampling, sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from shadems_spark.operators.curation import (
    decontaminate,
    pack_sequences,
    repetition_stats,
    scrub_pii,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_overlap_fraction(spark):
    # doc 1 shares exactly its first 3-gram with the benchmark doc.
    bench = _docs(spark, [(0, "a b c x y z")])
    docs = _docs(spark, [(1, "a b c d e"), (2, "p q r s t")])
    got = {r["doc_id"]: r for r in decontaminate(docs, bench).collect()}
    # "a b c d e" -> grams {abc, bcd, cde}: 1 of 3 matched.
    assert got[1]["matched"] == 1 and got[1]["total"] == 3
    assert abs(got[1]["overlap"] - 1 / 3) < 1e-6
    assert 2 not in got  # no shared grams -> no row


def test_decontaminate_broadcasts_benchmark(spark):
    bench = _docs(spark, [(0, "a b c")])
    docs = _docs(spark, [(1, "a b c d")])
    plan = (
        decontaminate(docs, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_repetition_stats(spark):
    df = _docs(spark, [(1, "a a a b"), (2, "a b c d")])
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["n_words"] == 4 and got[1]["n_uniq"] == 2
    assert abs(got[1]["top_frac"] - 0.75) < 1e-6
    assert abs(got[1]["dup_frac"] - 0.5) < 1e-6
    assert got[2]["dup_frac"] == 0.0


def test_scrub_pii_counts_and_replaces(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@x.org ip 10.0.0.1 tel +1-555-123-4567 end")],
        "id long, t string",
    )
    row = scrub_pii(df, "t").collect()[0]
    assert row["n_redacted"] == 3
    assert row["clean"] == "mail [EMAIL] ip [IPV4] tel [PHONE] end"


def test_stratified_sample_deterministic_rates(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(1000)],
        "doc_id long, lang string",
    )
    rates = spark.createDataFrame([("en", 0.5), ("zh", 0.0)], "lang string, rate double")
    kept = stratified_sample(df, rates, "doc_id", "lang").collect()
    # en: even ids with id % 1000 < 500 -> 250 rows; zh: rate 0 -> none.
    assert len(kept) == 250
    assert all(r["lang"] == "en" and r["doc_id"] % 1000 < 500 for r in kept)
    again = stratified_sample(df, rates, "doc_id", "lang").collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in kept)


def test_pack_sequences_concat_then_chunk(spark):
    df = spark.createDataFrame(
        [(i, "s", 300) for i in range(1, 5)],
        "doc_id long, lang string, tokens long",
    )
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(df, budget=512, stream_col="lang").collect()
    }
    # starting offsets 0, 300, 600, 900 -> packs 0, 0, 1, 1.
    assert got == {1: 0, 2: 0, 3: 1, 4: 1}
