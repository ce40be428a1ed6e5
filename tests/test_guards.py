"""Empty/degenerate-input guards (ADVICE r6): the in-plan fold
operators must return empty/NULL results — not runtime errors — when
their inputs are empty, because F.sequence(1, n) auto-DESCENDS for
n <= 0 and element_at(arr, 0) always raises in Spark.
"""

from pyspark.sql import functions as F


def test_global_ops_empty_input(spark):
    """global_index / global_cumsum / global_ntile / global_cummax on
    an EMPTY frame return empty frames (e.g. q_time_to_convert with
    zero converters), instead of erroring inside _offsets_row."""
    from shadems_spark.operators.profile import (
        global_cummax,
        global_cumsum,
        global_index,
        global_ntile,
    )

    empty = spark.createDataFrame([], "k long, v long")
    assert global_index(empty, ["k"]).count() == 0
    assert global_cumsum(empty, ["k"], {"cs": "v"}).count() == 0
    assert global_ntile(empty, 4, ["k"], "t").count() == 0
    assert global_cummax(empty, ["k"], "v", "m").count() == 0


def test_dtw_fold_empty_series_null(spark):
    """dtw_fold returns NULL (not an array-index error) when either
    side is empty; non-empty pairs still fold exactly."""
    from shadems_spark.operators.series import dtw_fold

    df = spark.createDataFrame(
        [([1, 2], []), ([], [1]), ([], []), ([1, 2], [2, 2])],
        "va array<long>, vb array<long>",
    )
    got = [r["d"] for r in df.select(dtw_fold("va", "vb").alias("d")).collect()]
    assert got == [None, None, None, 1]


def test_motif_short_series_dropped(spark, sf_dir):
    """q_motif drops event types with < 7 distinct days (the oracle's
    range(1, n-5) is empty there) instead of crashing on F.slice with
    a descending index sequence."""
    from shadems_spark.queries import load_registry

    fn = load_registry()["q_motif"][0]
    df = fn(spark, sf_dir)
    # plan must execute even if some type has a short calendar; every
    # surviving (i, j) pair is a valid non-overlapping window pair.
    for r in df.collect():
        assert r["j"] >= r["i"] + 7


def test_cuts_row_skew_resistant(spark):
    """_cuts_row samples DISTINCT values: a 99%-one-value key still
    yields spread-out cuts (the old row-sampler collapsed to ~1
    distinct sample value, re-concentrating the two-phase scan)."""
    from shadems_spark.operators.profile import _cuts_row

    rows = [(0,)] * 5000 + [(i,) for i in range(1, 65)]
    df = spark.createDataFrame(rows, "k long")
    cuts = _cuts_row(df, F.col("k"), 8, False).collect()[0]["__cuts"]
    # 7 cuts requested over 65 distinct values; skew must not shrink
    # the usable cut set below a healthy fraction of that.
    assert len(cuts) >= 5
    assert len(set(cuts)) == len(cuts)


def test_prefix_max_prune_lossless_and_empty(spark):
    """prefix_max_prune (the q_skyline candidate diet): the pruned
    set must contain EVERY Pareto-staircase point of the full data
    (losslessness-by-induction claim), only ever shrink the input,
    and return empty on empty input.  Staircase replayed in Python:
    per-distinct-key max measure, survivor iff measure > max over
    all strictly-smaller keys."""
    from shadems_spark.operators.profile import prefix_max_prune

    # deterministic pseudo-random (key, measure) pairs with heavy
    # key duplication and measure ties — the hazard cases.
    rows = [
        ((i * 2654435761) % 97, (i * 40503) % 251)
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "k long, v long")

    def staircase(pairs):
        best = {}
        for k, v in pairs:
            best[k] = max(best.get(k, -1), v)
        sky, run = set(), -1
        for k in sorted(best):
            if best[k] > run:
                sky.add((k, best[k]))
            run = max(run, best[k])
        return sky

    full_sky = staircase(rows)
    pruned = [(r["k"], r["v"]) for r in prefix_max_prune(df, "k", "v").collect()]
    assert len(pruned) <= len(rows)
    assert staircase(pruned) == full_sky
    assert full_sky <= set(pruned)  # every skyline point survives the prune

    empty = spark.createDataFrame([], "k long, v long")
    assert prefix_max_prune(empty, "k", "v").count() == 0


def test_ngram_stop_gram_prune_binds(spark, tmp_path):
    """The stop-gram df cap binds on NO driver fixture (max df 25 at
    x100), so this synthetic corpus forces it: 1,100 docs all share
    one 3-gram (df 1,100 > NGRAM_STOP_DF), and doc pairs (2k, 2k+1)
    are otherwise identical.  With the hot gram pruned, exactly the
    550 twin pairs qualify at jaccard 1.0 over their 2 surviving
    grams; if the prune failed to bind, every cross pair would share
    the hot gram at jaccard 1/5 = 0.2 >= threshold and the result
    would balloon to ~604k rows.  Also A/Bs the TWO-PHASE discovery
    (hash-df prefilter -> string recount) against the direct
    single-phase string-df aggregate — row-for-row identical, the
    losslessness claim (hash-df >= string-df) under a binding cap."""
    import pandas as pd

    import __spark_entry__ as entry
    from shadems_spark.operators import text as T
    from shadems_spark.queries.llm_ops import NGRAM_STOP_DF

    n = NGRAM_STOP_DF + 100
    texts = [f"common alpha beta w{i // 2}x w{i // 2}y" for i in range(n)]
    pd.DataFrame(
        {
            "doc_id": range(n),
            "text": texts,
            "lang": "en",
            "source": "synthetic",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(f"{tmp_path}/documents.parquet", index=False)

    got = (
        entry.queries()["q_ngram_jaccard"](spark, str(tmp_path))
        .toPandas()
        .sort_values(["id1", "id2"])
        .reset_index(drop=True)
    )
    assert len(got) == n // 2  # twins only — the hot gram is gone
    assert (got["jaccard"] == 1.0).all()
    assert (got["id2"] - got["id1"] == 1).all() and (got["id1"] % 2 == 0).all()

    # single-phase reference: direct string-df aggregate, same prune
    docs = spark.read.parquet(f"{tmp_path}/documents.parquet")
    grams = docs.select(
        "doc_id", F.explode(T.word_ngrams(T.words("text"), 3)).alias("ng")
    )
    stop = (
        grams.groupBy("ng").agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > NGRAM_STOP_DF).select("ng")
    )
    pruned = grams.join(F.broadcast(stop), "ng", "left_anti").select(
        "doc_id", F.xxhash64("ng").alias("h")
    )
    sizes = pruned.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = pruned.alias("a"), pruned.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = F.col("c") / (
        F.col("sz1") + F.col("sz2") - F.col("c")
    )
    ref = (
        inter.join(
            F.broadcast(sizes.select(F.col("doc_id").alias("id1"), F.col("sz").alias("sz1"))),
            "id1",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("id2"), F.col("sz").alias("sz2"))),
            "id2",
        )
        .filter(jac >= 0.2)
        .select("id1", "id2", F.round(jac, 6).alias("jaccard"))
        .toPandas()
        .sort_values(["id1", "id2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)

    # and the DuckDB oracle replays the BINDING prune identically —
    # the sf0.01 gate never exercises the cap, this corpus does
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = (
        con.execute(entry.oracle_sql()["q_ngram_jaccard"])
        .df()
        .sort_values(["id1", "id2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, oracle, check_dtype=False, check_exact=False, atol=1e-9
    )


def test_node_cap_binds_at_pathological_ids(spark, tmp_path):
    """The graph-metric node cap (128 per (label, hp) block) binds on
    NO driver fixture; this synthetic table forces it AND uses vec_ids
    ~1e10 — the exact scale where the pre-fix rank hash overflowed
    int64 (Spark wrapped silently, DuckDB errored; ADVICE r7: pmod
    BEFORE the multiply).  600 one-label vectors fan out over <= 4
    hyperplane sub-buckets, so pigeonhole forces a binding block; edge
    membership depends on WHICH ids survive (angles spread past the
    cos >= 0.2 cutoff), so Spark and the DuckDB oracle only agree on
    n_edges/n_nodes/n_triangles if their capped SELECTIONS are
    identical."""
    import math

    import pandas as pd

    import __spark_entry__ as entry
    from shadems_spark.operators import similarity as SIM

    n, dim = 600, 8
    rows = []
    for i in range(n):
        theta = 2.0 * i / n
        v = [math.cos(theta), math.sin(theta)] + [0.05] * (dim - 2)
        rows.append((10_000_000_000 + 17 * i, v, 0))
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).astype(
        {"vec_id": "int64", "label": "int32"}
    ).to_parquet(f"{tmp_path}/embeddings.parquet", index=False)

    emb = spark.read.parquet(f"{tmp_path}/embeddings.parquet")
    occupancy = (
        emb.select(
            SIM.hyperplane_bucket(
                F.col("embedding").cast("array<double>"), 2, dim
            ).alias("hp")
        )
        .groupBy("hp").count().agg(F.max("count")).first()[0]
    )
    assert occupancy > 128, "fixture must make the cap bind"

    got = entry.queries()["q_triangles"](spark, str(tmp_path)).first()

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    oracle = con.execute(entry.oracle_sql()["q_triangles"]).df().iloc[0]
    assert got["n_edges"] == oracle["n_edges"] > 0
    assert got["n_nodes"] == oracle["n_nodes"]
    assert got["n_triangles"] == oracle["n_triangles"]


def test_arrow_gram_udfs_match_jvm_twins(spark, sf_dir):
    """The round-9 Arrow gram builders exist ONLY as faster twins of
    the JVM HOF expressions — their correctness claim is exact value
    equality, so pin it (the docstrings' one-off exceptAll checks are
    not regression protection).  Covers the fixture corpus PLUS the
    edge rows the corpus lacks: null text, empty string, double
    spaces (empty tokens), fewer words than n."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.text import (
        ngram_hashes_xe,
        word_ngrams,
        word_ngrams_arrow,
        words,
        xe_gram_hashes_arrow,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edge = spark.createDataFrame(
        [
            (90001, None),
            (90002, ""),
            (90003, "one"),
            (90004, "one two"),
            (90005, "a  b   c d"),  # empty tokens between double spaces
            (90006, "x y z x y z x y z"),  # repeated grams (dedup path)
        ],
        schema="doc_id long, text string",
    )
    df = docs.unionByName(edge)

    for jvm_col, arrow_col in [
        (ngram_hashes_xe(words("text"), 3), xe_gram_hashes_arrow("text", 3)),
        (word_ngrams(words("text"), 3), word_ngrams_arrow("text", 3)),
    ]:
        a = df.select("doc_id", F.explode_outer(jvm_col).alias("g"))
        b = df.select("doc_id", F.explode_outer(arrow_col).alias("g"))
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0


def test_winnow_arrow_matches_jvm(spark, sf_dir, monkeypatch):
    """winnow()'s vectorized Arrow fingerprint column must equal the
    original JVM Column pipeline exactly — same grams, same poly char
    hash, same window mins, same first-occurrence dedup — over the
    fixture corpus plus edge rows (empty tokens kept by words(), docs
    shorter than w+k-1, null text)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.text import winnow

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edge = spark.createDataFrame(
        [
            (91001, None),
            (91002, ""),
            (91003, "one two"),
            (91004, "a  b   c d e f g"),
            (91005, "x y z x y z x y z x y z"),
        ],
        schema="doc_id long, text string",
    )
    df = docs.unionByName(edge)

    monkeypatch.setenv("SHADEMS_POLY_IMPL", "jvm")
    a = winnow(df).select("doc_id", F.explode_outer("fps").alias("fp"))
    monkeypatch.delenv("SHADEMS_POLY_IMPL")
    b = winnow(df).select("doc_id", F.explode_outer("fps").alias("fp"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_poly_hash_fast_matches_jvm(spark, sf_dir):
    """poly_hash_fast (vectorized Arrow twin) must equal the JVM
    poly_hash Column fold exactly over corpus grams and edge strings
    (null, empty, unicode, spaces)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.text import poly_hash, poly_hash_fast, words

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(F.explode_outer(words("text")).alias("t"))
    edge = spark.createDataFrame(
        [(None,), ("",), (" ",), ("é你 😀",), ("a b",)], "t string"
    )
    df = toks.unionByName(edge)
    got = df.select("t", poly_hash_fast("t").alias("h"))
    want = df.select("t", poly_hash("t").alias("h"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_word_buckets_arrow_matches_jvm(spark, sf_dir, monkeypatch):
    """word_buckets' vectorized fast path must equal the JVM HOF form
    exactly over the corpus plus edge rows."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.text import word_buckets

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edge = spark.createDataFrame(
        [(92001, None), (92002, ""), (92003, "a  b   c")],
        schema="doc_id long, text string",
    )
    df = docs.unionByName(edge)
    monkeypatch.setenv("SHADEMS_POLY_IMPL", "jvm")
    a = df.select("doc_id", F.explode_outer(word_buckets("text", 16)).alias("b"))
    monkeypatch.delenv("SHADEMS_POLY_IMPL")
    b = df.select("doc_id", F.explode_outer(word_buckets("text", 16)).alias("b"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
