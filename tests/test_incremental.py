"""Incremental corpus maintenance: MERGE semantics, dynamic-partition
overwrite (only touched partitions rewritten), and batch-vs-corpus
dedup joins."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from shadems_spark.operators.dedup import minhash_signatures
from shadems_spark.operators.incremental import (
    incremental_jaccard,
    incremental_minhash_candidates,
    merge_upsert,
    overwrite_dynamic,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_merge_upsert_semantics(spark):
    base = _df(spark, [(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    updates = _df(spark, [(2, "B"), (4, "D")], "k int, v string")
    got = sorted(map(tuple, merge_upsert(base, updates, "k").collect()))
    assert got == [(1, "a"), (2, "B"), (3, "c"), (4, "D")]


def test_merge_upsert_anti_join_broadcasts(spark):
    base = _df(spark, [(i, "x") for i in range(100)], "k int, v string")
    updates = _df(spark, [(1, "y")], "k int, v string")
    plan = merge_upsert(base, F.broadcast(updates), "k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_overwrite_dynamic_touches_only_written_partitions(spark, tmp_path):
    path = str(tmp_path / "snap")
    full = _df(spark, [(1, 10, "p1"), (2, 20, "p2")], "k int, v int, p string")
    overwrite_dynamic(full, path, ["p"])
    p2_files = sorted(os.listdir(os.path.join(path, "p=p2")))

    patch = _df(spark, [(1, 99, "p1")], "k int, v int, p string")
    overwrite_dynamic(patch, path, ["p"])

    # p2 files byte-identical (partition untouched); p1 replaced.
    assert sorted(os.listdir(os.path.join(path, "p=p2"))) == p2_files
    got = sorted(map(tuple, spark.read.parquet(path).select("k", "v", "p").collect()))
    assert got == [(1, 99, "p1"), (2, 20, "p2")]


def test_overwrite_dynamic_does_not_mutate_session_conf(spark, tmp_path):
    """The dynamic mode must be scoped to the write via the writer
    option (VERDICT r4 #3): a session-wide conf mutation would turn
    every later whole-path overwrite in the same session into a
    partition-level one.  Assert the session conf is untouched and a
    subsequent plain overwrite still replaces the WHOLE path."""
    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key, "STATIC")
    path = str(tmp_path / "snap2")
    full = _df(spark, [(1, 10, "p1"), (2, 20, "p2")], "k int, v int, p string")
    overwrite_dynamic(full, path, ["p"])
    assert spark.conf.get(key, "STATIC") == before

    # a later plain overwrite (no option) must still be whole-path:
    # writing only p1 removes the resident p2 partition.
    patch = _df(spark, [(1, 99, "p1")], "k int, v int, p string")
    patch.write.mode("overwrite").partitionBy("p").parquet(path)
    got = sorted(map(tuple, spark.read.parquet(path).select("k", "v", "p").collect()))
    assert got == [(1, 99, "p1")]


_DOCS = "doc_id long, text string"


def test_incremental_jaccard_finds_cross_set_dup(spark):
    corpus = _df(
        spark,
        [(1, "the quick brown fox jumps over the lazy dog"),
         (3, "completely unrelated text about spark partitions and shuffles here")],
        _DOCS,
    )
    new = _df(
        spark,
        [(10, "the quick brown fox jumps over the lazy dog today"),
         (12, "nothing in common with anything else whatsoever in this corpus")],
        _DOCS,
    )
    got = incremental_jaccard(new, corpus, threshold=0.2).collect()
    assert [(r.new_id, r.corpus_id) for r in got] == [(10, 1)]
    assert 0.2 <= got[0].jaccard <= 1.0


def test_incremental_minhash_candidates(spark):
    corpus = _df(
        spark,
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (2, "one two three four five six seven eight nine ten")],
        _DOCS,
    )
    new = _df(
        spark,
        [(10, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        _DOCS,
    )
    cands = incremental_minhash_candidates(
        minhash_signatures(new), minhash_signatures(corpus)
    )
    assert sorted(map(tuple, cands.collect())) == [(10, 1)]
