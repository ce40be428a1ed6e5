"""LLM-pipeline operator tests: dedup recall, simhash sanity,
similarity ranking, text analysis, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.operators import dedup as D
from shadems_spark.operators import multimodal as MM
from shadems_spark.operators import similarity as SIM
from shadems_spark.operators import text as T


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="the quick brown fox jumps over the lazy dog tonight"),
            Row(doc_id=3, text="completely different words about spark engines and scale"),
            Row(doc_id=4, text="the quick brown fox jumps over the lazy dog today"),
        ]
    )


def test_exact_dedup(spark):
    out = D.exact_dedup(_docs(spark)).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in out}
    assert by_keep[1] == 2  # docs 1 and 4 identical
    assert by_keep[2] == 1 and by_keep[3] == 1


def test_minhash_finds_near_dups(spark):
    pairs = D.minhash_dedup(_docs(spark), threshold=0.5).collect()
    found = {(r["id1"], r["id2"]) for r in pairs}
    assert (1, 4) in found  # identical docs always collide
    assert (1, 2) in found or (2, 4) in found  # one-word-off near-dup
    assert all(3 not in p for p in found)


def test_simhash_near_dup_ordering(spark):
    sigs = D.simhash_signatures(_docs(spark))
    cands = {(r["id1"], r["id2"]): r["hamming"] for r in D.simhash_candidates(sigs).collect()}
    assert cands[(1, 4)] == 0  # identical -> identical signature
    near = cands.get((1, 2), 64)
    assert near < 20  # near-dup much closer than unrelated doc


def test_cosine_topk_self_similarity(spark):
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),
            Row(vec_id=3, embedding=[-1.0, 0.0, 0.0]),
        ]
    )
    out = SIM.brute_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    order = [r["cand_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order == [1, 2, 3]  # by decreasing cosine


def test_vectorized_topk_matches_hof(spark, sf_dir):
    """The Arrow/BLAS scorer must return exactly the HOF-expression
    results (same rounding, same tie-break ranks)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(0, 1, 2))
    a = {tuple(r) for r in SIM.brute_topk(emb, q, k=5).collect()}
    b = {tuple(r) for r in SIM.brute_topk_vectorized(emb, q, k=5).collect()}
    assert a == b


def test_ivf_full_probe_matches_brute(spark, sf_dir):
    """With n_probe == n_cells IVF degenerates to exact search: its
    top-k must equal brute force; with fewer probes it returns a
    subset-quality result (recall check)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1))
    brute = {
        (r["q_id"], r["cand_id"]) for r in SIM.brute_topk(emb, queries, k=5).collect()
    }
    full = {
        (r["q_id"], r["cand_id"])
        for r in SIM.ivf_topk(emb, queries, k=5, n_cells=4, n_probe=4).collect()
    }
    assert full == brute
    probe1 = {
        (r["q_id"], r["cand_id"])
        for r in SIM.ivf_topk(emb, queries, k=5, n_cells=4, n_probe=2).collect()
    }
    recall = len(probe1 & brute) / len(brute)
    assert recall >= 0.4  # partial probing trades recall for candidates


#: recall is pinned at sf0.01 (deterministic: fixed data, fixed plane
#: seeds, fixed centroid sample) so an ANN regression can't pass the
#: rows-only driver check silently (VERDICT r01 #3).
_RECALL_SF = "/root/testdata/sf0.01"


def _recall(approx, brute):
    got = {(r["q_id"], r["cand_id"]) for r in approx.collect()}
    return len(got & brute) / len(brute)


def test_ann_recall_pinned(spark):
    emb = load_table(spark, _RECALL_SF, "embeddings")
    q = emb.filter(F.col("vec_id").isin(0, 1, 2))
    brute = {(r["q_id"], r["cand_id"]) for r in SIM.brute_topk(emb, q, k=5).collect()}
    # multi-table LSH (4 planes x 6 tables): measured 0.667
    assert _recall(SIM.lsh_topk(emb, q, k=5), brute) >= 0.6
    # IVF, sampled quantizer, 2 of 8 cells probed: measured 0.6
    assert _recall(SIM.ivf_topk(emb, q, k=5, n_cells=8, n_probe=2), brute) >= 0.6


def test_ivf_refined_centroids(spark):
    """One Lloyd iteration must keep recall in range and even out the
    coarse cells (min cell 38 -> 57 at sf0.01); on this near-uniform
    synthetic fixture it cannot IMPROVE recall (no cluster structure),
    so the pin is a floor, not a gain claim."""
    emb = load_table(spark, _RECALL_SF, "embeddings")
    q = emb.filter(F.col("vec_id").isin(0, 1, 2))
    brute = {(r["q_id"], r["cand_id"]) for r in SIM.brute_topk(emb, q, k=5).collect()}
    refined = SIM.ivf_topk(emb, q, k=5, n_cells=8, n_probe=2, refine_iters=1)
    assert _recall(refined, brute) >= 0.5  # measured 0.533
    cents = SIM.sample_centroids(emb, k=8)
    r1 = SIM.refine_centroids(emb, cents, iters=1)
    assert len(r1) == 8 and all(len(c) == SIM.embedding_dim(emb) for c in r1)
    assigned = SIM.ivf_assign(
        emb.select(F.col("vec_id").alias("cand_id"), SIM.as_double("embedding").alias("c_vec")),
        r1,
    )
    sizes = [r["count"] for r in assigned.groupBy("cell").count().collect()]
    assert min(sizes) >= 40  # raw sample measured a 38-row cell


def test_embedding_near_dup_bounded_buckets(spark):
    """One hot label must NOT produce O(label²) candidate pairs: the
    hyperplane sub-bucket splits it (VERDICT r01 #2).  threshold=-1
    keeps every scored pair, so the row count IS the candidate count."""
    rows = [
        Row(
            vec_id=i,
            label=0,  # everything in one hot label
            embedding=[float((i * 37 + j * 11) % 13 - 6) for j in range(8)],
        )
        for i in range(120)
    ]
    emb = spark.createDataFrame(rows)
    n_all = 120 * 119 // 2
    n_flat = SIM.embedding_near_dup(emb, threshold=-1.0, sub_planes=0).count()
    n_sub = SIM.embedding_near_dup(emb, threshold=-1.0, sub_planes=2).count()
    assert n_flat == n_all
    assert n_sub < 0.5 * n_all  # 2 planes ≈ quarter the pairs


def test_minhash_pair_counts_pinned(spark, sf_dir):
    """The fixed-width co-count verify must reproduce the round-1
    array-intersect results exactly — pinned against the independent
    exact n-gram Jaccard join on the same fixture."""
    from shadems_spark.queries import load_registry

    reg = load_registry()
    mh = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in reg["q_dedup_minhash"][0](spark, sf_dir).collect()
    }
    exact = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in reg["q_ngram_jaccard"][0](spark, sf_dir).collect()
    }
    assert mh == exact  # banding at these thresholds loses no pair


def test_bottomk_exact_for_small_docs(spark):
    """A doc with ≤ k grams sketches to its full gram set, so the
    bottom-k estimate must be EXACT: identical docs -> 1.0, the
    one-word-off pair -> 7/9 (7 shared of 9 union grams)."""
    docs = _docs(spark)
    sk = D.bottomk_sketch(docs, k=64)
    pairs = spark.createDataFrame([(1, 2), (1, 4)], "id1 long, id2 long")
    est = {
        (r["id1"], r["id2"]): r["jaccard_est"]
        for r in D.bottomk_jaccard(pairs, sk, k=64, threshold=0.0).collect()
    }
    assert est[(1, 4)] == 1.0
    assert abs(est[(1, 2)] - round(7 / 9, 6)) < 1e-9


def test_bottomk_estimate_tracks_exact(spark):
    """On sf0.01 (docs ~100 words > k=64 grams) the estimator must
    stay within the O(1/sqrt(k)) band of the exact Jaccard join."""
    from shadems_spark.queries import load_registry

    reg = load_registry()
    est = {
        (r["id1"], r["id2"]): r["jaccard_est"]
        for r in reg["q_dedup_bottomk"][0](spark, _RECALL_SF).collect()
    }
    exact = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in reg["q_ngram_jaccard"][0](spark, _RECALL_SF).collect()
    }
    common = set(est) & set(exact)
    assert len(common) >= 0.8 * len(exact)  # borderline pairs may flip
    errs = [abs(est[p] - exact[p]) for p in common]
    assert max(errs) <= 0.25 and sum(errs) / len(errs) <= 0.1


def test_connected_components_labels(spark):
    """Min-label propagation: a 4-node path (needs >1 iteration), a
    separate pair, and min-id canonical labels."""
    pairs = spark.createDataFrame(
        [(3, 4), (1, 2), (2, 3), (10, 11)], "id1 long, id2 long"
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in D.connected_components(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_checkpoints(spark):
    """An 18-edge path has diameter 18, so min-label propagation runs
    >15 iterations and exercises the %5 lineage-truncation branch
    (checkpoint swap + persisted-frame release) several times — the
    r10 review found that branch leaked one cache per truncation and
    it previously had zero CI coverage.  Labels must still be the min
    reachable id, and the CacheManager must be EMPTY afterwards (the
    builder releases every persist it takes; checkpoint blocks are
    ContextCleaner-owned and excluded from this assertion)."""
    spark.catalog.clearCache()
    edges = [(i, i + 1) for i in range(1, 19)] + [(100, 101)]
    pairs = spark.createDataFrame(edges, "id1 long, id2 long")
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in D.connected_components(pairs).collect()
    }
    want = {i: 1 for i in range(1, 20)}
    want.update({100: 100, 101: 100})
    assert out == want
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma"), Row(doc_id=2, text="gamma beta alpha")]
    )
    fps = {r["doc_id"]: r["fp"] for r in T.fingerprint(df).collect()}
    assert fps[1] != fps[2]  # rolling hash is order-sensitive


def test_lang_id_completeness(spark, sf_dir):
    """The synthetic corpus shares one 31-word vocabulary across all
    five langs (verified: no n-gram signal exists — even a full NB
    unigram classifier scores 0.33), so this asserts the pipeline
    contract, not accuracy: exactly one prediction per doc, from the
    label set, with a positive overlap score."""
    docs = load_table(spark, sf_dir, "documents")
    pred = T.lang_id(docs, T.lang_profiles(docs))
    assert pred.count() == docs.count()
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    rows = pred.collect()
    assert all(r["pred_lang"] in langs and r["score"] > 0 for r in rows)


def test_multimodal_resize_shape(spark, sf_dir):
    """Resize: 1:1 rows, every output exactly width*height bytes,
    deterministic across runs."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    blobs = MM.blob_table(docs)
    out = MM.resize_images(blobs, width=4, height=4)
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(len(r["pixels"]) == 16 for r in rows)
    again = {r["doc_id"]: r["pixels"] for r in MM.resize_images(blobs, 4, 4).collect()}
    assert all(again[r["doc_id"]] == r["pixels"] for r in rows)


def test_multimodal_frame_sampling(spark, sf_dir):
    """Frame sampling: 1:N row expansion; every_n-th window kept and
    per-doc frame counts consistent."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    blobs = MM.blob_table(docs)
    out = MM.sample_frames(blobs, frame_bytes=64, every_n=3).collect()
    assert len(out) > len(docs.collect())  # row-expanding stage
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        assert len(doc_rows) == doc_rows[0]["n_frames"]
        assert all(r["frame_idx"] % 3 == 0 for r in doc_rows)


def test_multimodal_stub_gate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    blobs = MM.blob_table(docs)
    feats = MM.decode_features(blobs).collect()
    assert len(feats) == 10
    assert all(r["n_bytes"] > 0 and r["kind"] == "text/plain" for r in feats)
    with pytest.raises(NotImplementedError):
        MM.decode_features(blobs, real_decode=True)


def test_map_in_arrow_matches_pandas_path(spark, sf_dir):
    """The mapInArrow feature extractor must be result-identical to
    the mapInPandas one (same schema, same rows)."""
    from pyspark.sql import functions as F

    from shadems_spark.catalog import load_table
    from shadems_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 9 == 0)
    blobs = MM.blob_table(docs)
    a = sorted(map(tuple, MM.decode_features(blobs).collect()))
    b = sorted(map(tuple, MM.decode_features_arrow(blobs).collect()))
    assert a == b and len(a) > 0


def test_map_in_arrow_empty_and_zero_blob(spark):
    """ADVICE r03 edge cases: a partition with zero rows must emit the
    declared types (not value-inferred nulls), and all-empty blobs must
    produce long-typed first_byte=-1 / checksum=0 rows."""
    from pyspark.sql import functions as F

    from shadems_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(1, "", "a", 0), (2, "", "a", 0)],
        "doc_id long, text string, source string, n_chars long",
    ).repartition(8)  # most partitions are empty
    blobs = MM.blob_table(docs)
    out = MM.decode_features_arrow(blobs)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "string", "bigint", "bigint", "bigint"
    ]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert (r["n_bytes"], r["first_byte"], r["checksum"]) == (0, -1, 0)


def test_tracked_persist_keyed_scopes(spark):
    """VERDICT r03 #4: two operators persisting concurrently (distinct
    keys) must not evict each other; re-persisting the SAME key
    releases only its own stale predecessor."""
    from shadems_spark.operators import dedup as D

    a = spark.range(10).withColumnRenamed("id", "a")
    b = spark.range(10).withColumnRenamed("id", "b")
    D.tracked_persist(a, key="ka")
    D.tracked_persist(b, key="kb")
    assert a.is_cached and b.is_cached  # no cross-key eviction

    a2 = spark.range(20).withColumnRenamed("id", "a")
    D.tracked_persist(a2, key="ka")
    assert not a.is_cached and a2.is_cached and b.is_cached

    D.release_persist("kb")
    assert not b.is_cached and a2.is_cached
    D.release_persist()
    assert not a2.is_cached


def test_simhash_block_recall_pinned(spark):
    """VERDICT r03 #9: quantitative pin for the rows-only simhash
    query — the 16-bit-block candidate set must recover >=85% of the
    exact n-gram-Jaccard near-dup pairs at sf0.01 (measured 0.92 on
    the deterministic fixture; simhash's bit-sign similarity is a
    different metric than Jaccard, so 100% is not expected)."""
    from shadems_spark.queries import load_registry

    sf = "/root/testdata/sf0.01"
    reg = load_registry()
    exact = {
        (r["id1"], r["id2"])
        for r in reg["q_ngram_jaccard"][0](spark, sf).collect()
    }
    docs = load_table(spark, sf, "documents")
    cands = {
        (r["id1"], r["id2"])
        for r in D.simhash_candidates(D.simhash_signatures(docs)).collect()
    }
    assert len(exact) > 0
    assert len(exact & cands) / len(exact) >= 0.85


def test_approx_distinct_within_tolerance(spark):
    """VERDICT r03 #9: pin for the rows-only q_approx_distinct — HLL
    estimates within 5% of exact (measured 2.7% / 3.0% at sf0.01)."""
    from shadems_spark.queries import load_registry

    sf = "/root/testdata/sf0.01"
    reg = load_registry()
    row = reg["q_approx_distinct"][0](spark, sf).collect()[0]
    li = load_table(spark, sf, "lineitem")
    ex = li.agg(
        F.countDistinct("l_partkey").alias("p"),
        F.countDistinct("l_suppkey").alias("s"),
    ).collect()[0]
    assert abs(row["approx_parts"] - ex["p"]) / ex["p"] < 0.05
    assert abs(row["approx_supps"] - ex["s"]) / ex["s"] < 0.05


# ---------------------------------------------------------------- semdedup


def test_semdedup_drops_planted_near_dup(spark):
    """Two near-identical vectors landing in the same cluster: the
    higher id is dropped, the lower kept; orthogonal members stay."""
    from pyspark.sql import Row

    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),   # exemplar c0
        Row(vec_id=1, embedding=[0.0, 1.0, 0.0, 0.0]),   # exemplar c1
        Row(vec_id=10, embedding=[0.8, 0.6, 0.0, 0.0]),   # -> c0, far from exemplar
        Row(vec_id=11, embedding=[0.79, 0.62, 0.0, 0.0]),  # near-dup of 10 -> drop
        Row(vec_id=12, embedding=[0.6, 0.0, 0.8, 0.0]),   # c0, diverse -> keep
    ]
    emb = spark.createDataFrame(rows)
    kept = SIM.semdedup(emb, n_clusters=2, threshold=0.95).collect()
    ids = {r["vec_id"] for r in kept}
    assert 10 in ids and 11 not in ids  # greedy keep-lowest-id rule
    assert 0 in ids and 1 in ids
    clusters = {r["vec_id"]: r["cluster_id"] for r in kept}
    assert clusters[10] == 0 and clusters[0] == 0 and clusters[1] == 1


def test_semdedup_keep_rule_is_pairwise_conservative(spark):
    """A chain a~b, b~c with a!~c keeps only a: the EXISTS rule drops
    against ALL lower-id members — kept or themselves dropped — so a
    similarity chain collapses to its lowest id (the conservative
    pair-based rule; a sequential greedy scan would re-instate c)."""
    from pyspark.sql import Row

    # unit vectors at 0, ~25, ~50 degrees: cos(0,25)≈.906, cos(25,50)≈.906, cos(0,50)≈.643
    import math

    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0, 0.0]

    emb = spark.createDataFrame(
        [Row(vec_id=0, embedding=v(0)), Row(vec_id=1, embedding=v(25)),
         Row(vec_id=2, embedding=v(50))]
    )
    kept = {r["vec_id"] for r in SIM.semdedup(emb, n_clusters=1, threshold=0.9).collect()}
    assert kept == {0}


def test_exemplar_assign_ivf_parity_with_brute(spark, sf_dir):
    """VERDICT r5 #2 done-criterion: the Elkan-filtered IVF-probe
    assignment must equal the brute all-pairs argmax EXACTLY —
    (cluster_id, c_cos) per row — on the fixture embeddings, for
    several k including k whose sqrt splits unevenly."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        F.col("vec_id").alias("vid"),
        SIM.as_double("embedding").alias("v"),
    )
    for k in (2, 5, 8, 13):
        fast = {
            r["vid"]: (r["cluster_id"], r["c_cos"])
            for r in SIM.exemplar_assign(e, k).collect()
        }
        brute = {
            r["vid"]: (r["cluster_id"], r["c_cos"])
            for r in SIM.exemplar_assign(e, k, brute=True).collect()
        }
        assert fast == brute, f"k={k}"


def test_semdedup_fixture_prune_rate(spark, sf_dir):
    """sf0.001 fixture: output is a subset of input, deterministic
    across runs (same kept set)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n_in = emb.count()
    k1 = [r["vec_id"] for r in SIM.semdedup(emb).collect()]
    k2 = [r["vec_id"] for r in SIM.semdedup(emb).collect()]
    assert k1 == k2
    assert 0 < len(k1) <= n_in


# ---------------------------------------------------------------- mmr


def test_mmr_first_pick_is_relevance_argmax(spark):
    """Step 1 ignores diversity: it must equal brute top-1."""
    from shadems_spark.operators.retrieval import mmr_topk

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") == 0)
    out = mmr_topk(emb, queries, k=3, n_candidates=10).collect()
    top1 = SIM.brute_topk(emb, queries, k=1).collect()[0]
    first = [r for r in out if r["step"] == 1][0]
    assert first["cand_id"] == top1["cand_id"]


def test_mmr_diversifies_vs_plain_topk(spark):
    """Planted redundant cluster: plain top-k takes all near-dups;
    MMR's second pick must skip to the diverse candidate."""
    from pyspark.sql import Row

    from shadems_spark.operators.retrieval import mmr_topk

    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),    # query
        Row(vec_id=1, embedding=[0.99, 0.1, 0.0, 0.0]),   # rel ~1
        Row(vec_id=2, embedding=[0.99, 0.11, 0.0, 0.0]),  # redundant with 1
        Row(vec_id=3, embedding=[0.7, 0.0, 0.7, 0.0]),    # less rel, diverse
    ]
    emb = spark.createDataFrame(rows)
    queries = emb.filter(F.col("vec_id") == 0)
    plain = [r["cand_id"] for r in SIM.brute_topk(emb, queries, k=2).collect()]
    mmr = [r["cand_id"] for r in
           mmr_topk(emb, queries, k=2, n_candidates=3, lam=0.5).collect()]
    assert plain == [1, 2]
    assert mmr == [1, 3]


def test_mmr_steps_unique_and_bounded(spark, sf_dir):
    from shadems_spark.operators.retrieval import mmr_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1))
    out = mmr_topk(emb, queries, k=4, n_candidates=8).collect()
    for q in (0, 1):
        rows = [r for r in out if r["q_id"] == q]
        assert [r["step"] for r in sorted(rows, key=lambda r: r["step"])] == [1, 2, 3, 4]
        assert len({r["cand_id"] for r in rows}) == 4


# ---------------------------------------------------------------- normalize


def test_nfc_and_accent_fold(spark):
    from pyspark.sql import Row

    from shadems_spark.operators.text import nfc_udf, strip_accents_udf

    df = spark.createDataFrame([Row(t="Café über niño")])
    out = df.select(
        nfc_udf()(F.col("t")).alias("nfc"),
        strip_accents_udf()(F.col("t")).alias("folded"),
    ).collect()[0]
    assert out["nfc"] == "Café über niño"
    assert out["folded"] == "Cafe uber nino"


# ---------------------------------------------------------------- bpe


def test_bpe_train_merge_order(spark):
    """Hand-checkable corpus: 'aaab aaab ab' — the most frequent pair
    is (a,a); after merging it, ('aa','ab')... ties break
    lexicographically, so the sequence is deterministic."""
    from pyspark.sql import Row

    from shadems_spark.operators.text import bpe_train

    df = spark.createDataFrame([Row(doc_id=0, text="aaab aaab ab")])
    merges = bpe_train(df, n_merges=3, sample_docs=10)
    assert merges[0] == ("a", "a")
    assert len(merges) == 3


def test_bpe_roundtrip_lossless(spark, sf_dir):
    """Concatenating a word's BPE tokens must reproduce the word
    exactly (merges only ever join adjacent symbols)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.text import bpe_tokenize_udf, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=30, sample_docs=50)
    tok = bpe_tokenize_udf(merges)
    rows = (
        docs.filter(F.col("doc_id") < 20)
        .select("text", tok(F.col("text")).alias("toks"))
        .collect()
    )
    assert rows
    for r in rows:
        assert "".join(r["toks"]) == r["text"].replace(" ", "")


def test_bpe_compresses_vs_chars_and_is_deterministic(spark, sf_dir):
    from shadems_spark.queries import load_registry

    reg = load_registry()
    a = reg["q_bpe_tokenize"][0](spark, sf_dir).collect()
    b = reg["q_bpe_tokenize"][0](spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    for r in a:
        # fewer tokens than non-space chars, at least one per word
        assert r["ws_tokens"] <= r["bpe_tokens"] < r["n_chars_c"]


def test_hard_negatives_label_mismatch_and_order(spark, sf_dir):
    from shadems_spark.queries import load_registry

    reg = load_registry()
    rows = reg["q_hard_negatives"][0](spark, sf_dir).collect()
    assert rows
    by_anchor = {}
    for r in rows:
        assert r["neg_label"] != r["anchor_label"]
        by_anchor.setdefault(r["anchor_id"], []).append(r["cos"])
    for cs in by_anchor.values():
        assert len(cs) == 3
        assert cs == sorted(cs, reverse=True)


def test_empty_inputs_degrade_gracefully(spark):
    """Empty corpora flow through the extension operators without
    error: zero rows out, empty merge tables, empty token lists."""
    from shadems_spark.operators.dedup import exact_dedup
    from shadems_spark.operators.graph import symmetric_edges
    from shadems_spark.operators.retrieval import mmr_topk
    from shadems_spark.operators.text import bpe_tokenize_udf, bpe_train

    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_edges = spark.createDataFrame([], "src long, dst long")
    assert SIM.semdedup(empty_emb).count() == 0
    assert SIM.brute_topk(empty_emb, empty_emb).count() == 0
    assert mmr_topk(empty_emb, empty_emb).count() == 0
    assert exact_dedup(empty_docs).count() == 0
    assert bpe_train(empty_docs) == []
    assert symmetric_edges(empty_edges).count() == 0
    tok = bpe_tokenize_udf([("a", "b")])
    one = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert one.select(tok(F.col("text")).alias("t")).collect()[0]["t"] == []


def test_kmeans_partition_invariant_and_separates(spark):
    """The micro-int Lloyd protocol must produce identical codebooks
    under any partition layout, and two well-separated blobs must land
    in different cells with the blob means as centroids."""
    from pyspark.sql import functions as F

    from shadems_spark.operators.similarity import kmeans_lloyd

    rows = []
    for i in range(20):
        # blob A near (1, 0, ...), blob B near (-1, 0.5, ...)
        base = [1.0, 0.0] if i % 2 == 0 else [-1.0, 0.5]
        rows.append((i, [base[0] + (i % 5) * 0.01, base[1]] + [0.0] * 6))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c1, n1 = kmeans_lloyd(emb.coalesce(1), k=2, iters=3)
    c2, n2 = kmeans_lloyd(emb.repartition(7), k=2, iters=3)
    assert c1 == c2 and n1 == n2
    assert sorted(n1) == [10, 10]
    # cell centroids sit at the blob means (first component sign splits)
    signs = sorted(c[0] > 0 for c in c1)
    assert signs == [False, True]


def test_calibration_ece_and_conservation(spark, sf_dir):
    """Bin counts conserve the corpus; per-bin mean score lies inside
    the bin's nominal range (rounded-bin edges +/- rounding); ECE =
    sum(gap*n)/N is a finite value in [0, 1]."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_calibration"][0](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    for r in rows:
        lo, hi = r["bin"] / 10.0, (r["bin"] + 1) / 10.0
        if r["bin"] == 9:
            hi = 1.0 + 1e-9
        assert lo - 1e-6 <= r["mean_score"] <= hi + 1e-6, dict(r.asDict())
    ece = sum(r["gap"] * r["n"] for r in rows) / n_docs
    assert 0.0 <= ece <= 1.0


def test_auc_reference_and_confusion_conservation(spark, sf_dir):
    """AUC invariants (exactness itself is the oracle's job): counts
    conserve the corpus and the statistic is a valid probability; the
    confusion matrix conserves the held-out doc count and its
    diagonal matches q_naive_bayes's correct count."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    reg = load_registry()
    row = reg["q_auc"][0](spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").count()
    assert row["n_pos"] + row["n_neg"] == docs
    assert 0.0 <= row["auc"] <= 1.0

    conf = reg["q_confusion"][0](spark, sf_dir).collect()
    nb = reg["q_naive_bayes"][0](spark, sf_dir).collect()
    assert sum(r["n"] for r in conf) == len(nb)
    diag = sum(r["n"] for r in conf if r["actual"] == r["pred"])
    assert diag == sum(r["correct"] for r in nb)


def test_precision_recall_identities(spark, sf_dir):
    """Micro-averaged identities: sum(tp) = NB correct count;
    sum(pred_pos) = sum(actual_pos) = held-out size; F1 between
    min(P,R) and max(P,R) for every class with tp > 0."""
    from shadems_spark.queries import load_registry

    reg = load_registry()
    rows = reg["q_precision_recall"][0](spark, sf_dir).collect()
    nb = reg["q_naive_bayes"][0](spark, sf_dir).collect()
    assert sum(r["tp"] for r in rows) == sum(r["correct"] for r in nb)
    assert sum(r["pred_pos"] for r in rows) == len(nb)
    assert sum(r["actual_pos"] for r in rows) == len(nb)
    for r in rows:
        if r["tp"] > 0:
            lo, hi = sorted((r["precision"], r["recall"]))
            assert lo - 1e-6 <= r["f1"] <= hi + 1e-6


def test_ndcg_laws(spark, sf_dir):
    """NDCG invariants: in [0,1]; =1 iff every relevant hit is ranked
    before every miss (in particular n_rel=5 -> ndcg=1); =0 iff
    n_rel=0; and the labeled clusters make retrieval informative
    (mean ndcg well above the ~0.1 random-labels baseline)."""
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_ndcg"][0](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ndcg"] <= 1.0
        if r["n_rel"] == 5 or r["n_rel"] == 0:
            assert r["ndcg"] == (1.0 if r["n_rel"] == 5 else 0.0)
    mean = sum(r["ndcg"] for r in rows) / len(rows)
    assert mean > 0.3, mean


def test_mrr_consistent_with_ndcg(spark, sf_dir):
    """Cross-metric law: a query with rr == 1 (top hit relevant) must
    have ndcg > 0; a query with first_rel == 0 within top-10 implies
    n_rel == 0 in the top-5 too; rr in {0} U (0.1, 1]."""
    from shadems_spark.queries import load_registry

    reg = load_registry()
    mrr = {r["q_id"]: r for r in reg["q_mrr"][0](spark, sf_dir).collect()}
    ndcg = {r["q_id"]: r for r in reg["q_ndcg"][0](spark, sf_dir).collect()}
    assert set(mrr) == set(ndcg)
    for q, r in mrr.items():
        assert r["rr"] == 0.0 or 0.1 <= r["rr"] <= 1.0
        if r["rr"] == 1.0:
            assert ndcg[q]["ndcg"] > 0
        if r["first_rel"] == 0:
            assert ndcg[q]["n_rel"] == 0


def test_ppjoin_matches_brute_force_and_prunes(spark, sf_dir):
    """The prefix-filter theorem, checked against the in-Spark brute
    force at sf0.001: identical pair sets, and the prefix join's
    candidate-pair count strictly below the sharing-any-gram pair
    count (the pruning that makes it subquadratic)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.dedup import prefix_filter_join
    from shadems_spark.operators.text import _sliding, words

    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["un"])
        for r in prefix_filter_join(docs, t_num=3, t_den=5, ngram=3).collect()
    }
    g3 = F.array_distinct(
        _sliding(words("text"), 3, lambda a, x: F.concat(a, F.lit(" "), x))
    )
    g = docs.select("doc_id", F.explode(g3).alias("g"))
    a = g.select(F.col("doc_id").alias("ia"), "g")
    b = g.select(F.col("doc_id").alias("ib"), "g")
    allp = (
        a.join(b, "g")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    brute = {}
    n_by = {r["doc_id"]: r["n"] for r in sz.collect()}
    n_sharing = 0
    for r in allp.collect():
        n_sharing += 1
        un = n_by[r["ia"]] + n_by[r["ib"]] - r["inter"]
        if 5 * r["inter"] >= 3 * un:
            brute[(r["ia"], r["ib"])] = (r["inter"], un)
    assert got == brute and got  # theorem: no pair lost, none invented
    assert len(got) < n_sharing  # and the threshold actually prunes


def test_link_predict_excludes_edges_and_bounds(spark, sf_dir):
    """Link-prediction laws: no predicted pair is an existing edge,
    common <= min(deg) (a shared neighbor is a neighbor of both),
    and jaccard in (0, 1] with the cn/(d1+d2-cn) identity."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators import similarity as SIM
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_link_predict"][0](spark, sf_dir).collect()
    edges = {
        (r["id1"], r["id2"])
        for r in SIM.embedding_near_dup(
            load_table(spark, sf_dir, "embeddings"), threshold=0.2, sub_planes=2
        ).select("id1", "id2").collect()
    }
    for r in rows:
        assert (r["u1"], r["u2"]) not in edges
        assert 1 <= r["common"] <= min(r["deg1"], r["deg2"])
        denom = r["deg1"] + r["deg2"] - r["common"]
        assert abs(r["jaccard"] - r["common"] / denom) < 1e-6


def test_isotonic_monotone_conserving_and_pav_parity(spark, sf_dir):
    """PAV laws: fit is monotone nondecreasing in bin, conserves the
    weighted mean (sum n*fit == sum pos up to rounding), and matches
    a pure-python pool-adjacent-violators run on the same bins."""
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_isotonic"][0](spark, sf_dir).collect()
    for a, b in zip(rows, rows[1:]):
        assert a["iso"] <= b["iso"] + 1e-9
    tot_n = sum(r["n"] for r in rows)
    assert abs(
        sum(r["n"] * r["iso"] for r in rows) - sum(r["pos"] for r in rows)
    ) <= 1e-5 * tot_n

    # pure-python PAV: pool adjacent violating blocks
    blocks = [[r["pos"], r["n"]] for r in rows]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] * blocks[i + 1][1] > blocks[i + 1][0] * blocks[i][1]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    # expand blocks back over their member bins
    expanded = []
    bi = 0
    for pos, n in blocks:
        covered = 0
        while covered < n:
            covered += rows[bi]["n"]
            expanded.append(pos / n)
            bi += 1
        assert covered == n
    assert len(expanded) == len(rows)
    for r, f in zip(rows, expanded):
        assert abs(r["iso"] - f) < 1e-6, (r["bin"], r["iso"], f)


def test_gains_monotone_and_endpoints(spark, sf_dir):
    """Gains-curve laws: capture is nondecreasing walking deeper
    (bins descending), ends at exactly 1.0; lift is >= 1 at the top
    for any better-than-random ranker whose top bin over-captures,
    and equals 1.0 at full depth; cum_pos <= cum_n everywhere."""
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_gains"][0](spark, sf_dir).collect()
    assert rows, "gains curve empty"
    caps = [r["capture"] for r in rows]
    assert caps == sorted(caps)
    assert abs(caps[-1] - 1.0) < 1e-9
    assert abs(rows[-1]["lift"] - 1.0) < 1e-9
    for r in rows:
        assert r["cum_pos"] <= r["cum_n"]


def test_clustering_coeff_laws_and_triangle_consistency(spark, sf_dir):
    """LCC laws: 0 <= lcc <= 1, tri(v) <= C(deg,2), and the sum of
    per-node triangle incidences equals exactly 3x the global
    triangle count q_triangles reports on the SAME edge set."""
    from shadems_spark.queries import load_registry

    reg = load_registry()
    rows = reg["q_clustering_coeff"][0](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["lcc"] <= 1.0
        assert r["tri_count"] <= r["degree"] * (r["degree"] - 1) // 2
    tri_global = reg["q_triangles"][0](spark, sf_dir).collect()[0]["n_triangles"]
    assert sum(r["tri_count"] for r in rows) == 3 * tri_global


def test_dedup_eval_metric_laws(spark, sf_dir):
    """Candidate-eval laws: tp <= min(n_truth, n_cand); metrics are
    the exact count ratios; non-vacuous (the fixture has dup pairs);
    and the banding candidate set is consistent with q_dedup_minhash
    (every verified dup pair was a candidate, so tp == n_truth
    implies recall 1.0 and the verified-output size equals n_truth)."""
    from shadems_spark.queries import load_registry

    reg = load_registry()
    r = reg["q_dedup_eval"][0](spark, sf_dir).collect()[0]
    assert r["n_truth"] > 0
    assert r["tp"] <= min(r["n_truth"], r["n_cand"])
    assert abs(r["precision"] - r["tp"] / r["n_cand"]) < 1e-6
    assert abs(r["recall"] - r["tp"] / r["n_truth"]) < 1e-6
    assert abs(r["f1"] - 2 * r["tp"] / (r["n_cand"] + r["n_truth"])) < 1e-6
    if r["recall"] == 1.0:
        verified = reg["q_dedup_minhash"][0](spark, sf_dir).count()
        assert verified == r["n_truth"]


def test_tokenizer_fertility_laws(spark, sf_dir):
    """Fertility laws: BPE can only SPLIT whitespace words (fertility
    >= 1 — a merge never crosses a space because words are segmented
    independently); chars_per_token >= 1 once separators count;
    per-lang sums reconcile with the q_bpe_tokenize per-doc table
    joined to document languages."""
    from collections import defaultdict

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    reg = load_registry()
    rows = reg["q_tokenizer_fertility"][0](spark, sf_dir).collect()
    assert rows
    per_doc = reg["q_bpe_tokenize"][0](spark, sf_dir).collect()
    lang_of = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang").collect()
    }
    agg = defaultdict(lambda: [0, 0, 0])
    for r in per_doc:
        a = agg[lang_of[r["doc_id"]]]
        a[0] += 1
        a[1] += r["ws_tokens"]
        a[2] += r["bpe_tokens"]
    assert {r["lang"] for r in rows} == set(agg)
    for r in rows:
        n, w, b = agg[r["lang"]]
        assert (r["n_docs"], r["words"], r["bpe_tokens"]) == (n, w, b)
        assert r["fertility"] >= 1.0
        assert r["chars_per_token"] >= 1.0


def test_embedding_coverage_conservation_and_planted_ood(spark, sf_dir):
    """Coverage laws: cell occupancies partition the corpus (sums
    equal split sizes); val_share consistent.  Then a PLANTED far-off
    val-only cluster must surface: append vectors orthogonal to the
    corpus (val ids only) and re-run the same operators — some cell
    containing planted vectors must be train-empty (ood = 1)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators import similarity as SIM
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_embedding_coverage"][0](spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    n_train = emb.filter(F.col("vec_id") % 5 != 0).count()
    n_val = emb.filter(F.col("vec_id") % 5 == 0).count()
    assert sum(r["n_train"] for r in rows) == n_train
    assert sum(r["n_val"] for r in rows) == n_val
    for r in rows:
        tot = r["n_train"] + r["n_val"]
        assert abs(r["val_share"] - r["n_val"] / tot) < 1e-6
        assert r["ood"] == (1 if r["n_train"] == 0 and r["n_val"] > 0 else 0)

    # planted orthogonal val-only cluster: it cannot mint a cell
    # (centroids are train-only), so the signal is assignment FIT —
    # every planted vector's best-centroid cosine must sit far below
    # the corpus's typical fit.
    from shadems_spark.queries.llm_ops import coverage_assign

    # centroids are train-only and planted ids are val, so the
    # quantizer is unchanged by planting — compute it first and plant
    # the NEGATED centroid sum: its dot with every centroid is
    # negative, the worst possible fit.
    from shadems_spark.operators.similarity import _unit

    pre = SIM.sample_centroids(
        emb.filter(F.col("vec_id") % 5 != 0), k=8, sampler="xe"
    )
    units = [_unit(c) for c in pre]
    anti = [-50.0 * sum(u[i] for u in units) for i in range(len(units[0]))]
    planted = spark.createDataFrame(
        [(10_000_000 + 5 * i, anti, 0) for i in range(4)],
        emb.schema,
    )
    aug = emb.unionByName(planted)
    cents = SIM.sample_centroids(
        aug.filter(F.col("vec_id") % 5 != 0), k=8, sampler="xe"
    )
    asg = coverage_assign(
        aug.select(
            F.col("vec_id").alias("cand_id"),
            SIM.as_double("embedding").alias("c_vec"),
        ),
        cents,
    ).collect()
    planted_ci = [r["ci"] for r in asg if r["cand_id"] >= 10_000_000]
    corpus_ci = sorted(r["ci"] for r in asg if r["cand_id"] < 10_000_000)
    p10 = corpus_ci[len(corpus_ci) // 10]
    assert planted_ci and all(ci < p10 for ci in planted_ci)


def test_map_eval_laws_and_replay(spark, sf_dir):
    """MAP laws: ap in [0,1]; ap == 1 whenever all top-10 hits are
    relevant up to the denominator; map equals the mean of the
    returned ap column; and a brute numpy replay of AP@10 from the
    raw embeddings agrees."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_map_eval"][0](spark, sf_dir).collect()
    assert all(0.0 <= r["ap"] <= 1.0 for r in rows)
    m = np.mean([r["ap"] for r in rows])
    assert abs(rows[0]["map"] - m) < 2e-6

    emb = load_table(spark, sf_dir, "embeddings").collect()
    V = {e["vec_id"]: np.array(e["embedding"], dtype=float) for e in emb}
    L = {e["vec_id"]: e["label"] for e in emb}
    from collections import Counter

    lc = Counter(L.values())
    by_id = {r["q_id"]: r for r in rows}
    for qid in list(by_id)[:5]:
        qv = V[qid]
        scored = []
        for cid, cv in V.items():
            if cid == qid:
                continue
            cos = round(
                float(qv @ cv) / (np.linalg.norm(qv) * np.linalg.norm(cv)), 6
            )
            scored.append((-cos, cid))
        scored.sort()
        top = scored[:10]
        denom = min(lc[L[qid]] - 1, 10)
        cum, ap = 0, 0.0
        for k, (_, cid) in enumerate(top, 1):
            if L[cid] == L[qid]:
                cum += 1
                ap += cum / k
        ap = ap / denom if denom else 0.0
        assert abs(by_id[qid]["ap"] - ap) < 1e-5
        assert by_id[qid]["n_rel_top10"] == cum


def test_pr_auc_laws_and_brute_replay(spark, sf_dir):
    """PR-AUC laws: in (0, 1]; at least the prevalence baseline for
    this better-than-random classifier; equals the brute numpy
    average-precision over descending distinct 6dp scores."""
    import numpy as np

    from shadems_spark.queries import load_registry

    reg = load_registry()
    r = reg["q_pr_auc"][0](spark, sf_dir).collect()[0]
    assert 0.0 < r["pr_auc"] <= 1.0
    assert abs(
        r["prevalence"] - r["n_pos"] / (r["n_pos"] + r["n_neg"])
    ) < 1e-6

    # brute replay: rebuild the identical (y, score) frame via the
    # same module-level scorer pieces, then compute AP in numpy over
    # descending distinct scores
    from functools import reduce

    from shadems_spark.catalog import load_table
    from shadems_spark.operators.text import FP_MOD, words
    from shadems_spark.queries.llm_ops import _FH_DIM, _qc_weights

    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(words("text"), lambda w: F.length(w) > 0)
    word_hash = lambda w: (
        F.aggregate(
            F.transform(F.split(w, ""), lambda c: F.ascii(c).cast("long")),
            F.lit(0).cast("long"),
            lambda a, c: (a * F.lit(31) + c) % F.lit(FP_MOD),
        )
        % F.lit(_FH_DIM)
    )
    buckets = F.transform(ws, word_hash)
    terms = [
        F.lit(int(round(w * 1000)))
        * F.size(F.filter(buckets, lambda x: x == F.lit(b))).cast("long")
        for b, w in enumerate(_qc_weights())
    ]
    z = reduce(lambda a, c: a + c, terms, F.lit(100).cast("long"))
    zr = z / (F.lit(1000.0) * (F.lit(1) + F.size(ws)))
    s = docs.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-zr)), 6).alias("score"),
    ).toPandas()
    g = s.groupby("score").agg(n=("y", "size"), np=("y", "sum"))
    g = g.sort_index(ascending=False)
    cum_tp = g.np.cumsum()
    cum_n = g.n.cumsum()
    n_pos = g.np.sum()
    ap = float(((g.np / n_pos) * (cum_tp / cum_n)).sum())
    assert abs(r["pr_auc"] - ap) < 1e-5
    assert r["n_pos"] == n_pos


def test_grid_dbscan_density_laws_and_replay(spark, sf_dir):
    """Grid-DBSCAN laws: core cells have >= minPts points; every core
    cell gets a cluster; adjacent core cells share a cluster (brute
    union-find replay over the returned cell table); noise cells
    (cluster = -1) have no core neighbor; total points equal the
    corpus size."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_grid_dbscan"][0](spark, sf_dir).collect()
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_points"] for r in rows) == n_emb
    core = {(r["cx"], r["cy"]): r for r in rows if r["is_core"]}
    for r in rows:
        if r["is_core"]:
            assert r["n_points"] >= 5 and r["cluster"] != -1

    # union-find replay over core-cell 8-adjacency
    parent = {c: c for c in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (x, y) in core:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (x + dx, y + dy)
                if nb in core and nb != (x, y):
                    ra, rb = find((x, y)), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    groups: dict = {}
    for c in core:
        groups.setdefault(find(c), set()).add(c)
    for comp in groups.values():
        labels = {core[c]["cluster"] for c in comp}
        assert len(labels) == 1  # one cluster per connected component
    for r in rows:
        if not r["is_core"]:
            has_core_nb = any(
                (r["cx"] + dx, r["cy"] + dy) in core
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            )
            assert (r["cluster"] != -1) == has_core_nb


def test_silhouette_numpy_replay_and_range(spark, sf_dir):
    """Simplified-silhouette replay in numpy (label-mean centroids
    from the same nano-int coordinate sums, per-point (b-a)/max):
    every per-label mean matches; all values in [-1, 1]; the global
    mean is the n-weighted mean of label means."""
    import math

    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_silhouette"][0](spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings").collect()
    V = np.array([e["embedding"] for e in emb], dtype=float)
    L = np.array([e["label"] for e in emb])
    cents = {}
    for lb in np.unique(L):
        X = V[L == lb]
        sx = np.floor(np.abs(X) * 1e9 + 0.5) * np.sign(X)  # HALF_UP
        cents[lb] = sx.sum(0) / 1e9 / len(X)
    per_label: dict = {}
    for v, lb in zip(V, L):
        a = math.sqrt(((v - cents[lb]) ** 2).sum())
        b = min(
            math.sqrt(((v - cents[o]) ** 2).sum())
            for o in cents
            if o != lb
        )
        s = (b - a) / max(a, b, 1e-12)
        per_label.setdefault(lb, []).append(
            math.floor(abs(s) * 1e9 + 0.5) * (1 if s >= 0 else -1)
        )
    for r in rows:
        ss = per_label[r["label"]]
        mean_n = math.floor(abs(sum(ss) / len(ss)) + 0.5) * (
            1 if sum(ss) >= 0 else -1
        )
        assert abs(r["mean_silhouette"] - mean_n / 1e9) < 2e-6
        assert -1.0 <= r["mean_silhouette"] <= 1.0
        assert r["n"] == len(ss)
    glob = sum(r["mean_silhouette"] * r["n"] for r in rows) / sum(
        r["n"] for r in rows
    )
    assert abs(rows[0]["global_silhouette"] - glob) < 1e-4


def test_knn_eval_majority_vote_replay(spark, sf_dir):
    """k-NN replay: brute top-10 by 6dp cosine with id tie-break,
    majority vote with smaller-label tie-break; accuracies match at
    every k and are monotone-sane (within [0, 1]; k=1 equals the
    nearest-neighbor label rate)."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = {
        r["k"]: r
        for r in load_registry()["q_knn_eval"][0](spark, sf_dir).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings").collect()
    V = {e["vec_id"]: np.array(e["embedding"], dtype=float) for e in emb}
    L = {e["vec_id"]: e["label"] for e in emb}
    qids = [i for i in V if i % 25 == 0]
    correct = {1: 0, 5: 0, 10: 0}
    from collections import Counter

    for qid in qids:
        qv = V[qid]
        scored = sorted(
            (
                -round(
                    float(qv @ cv)
                    / (np.linalg.norm(qv) * np.linalg.norm(cv)),
                    6,
                ),
                cid,
            )
            for cid, cv in V.items()
            if cid != qid
        )[:10]
        for k in (1, 5, 10):
            votes = Counter(L[cid] for _, cid in scored[:k])
            pred = sorted(votes.items(), key=lambda t: (-t[1], t[0]))[0][0]
            correct[k] += int(pred == L[qid])
    for k in (1, 5, 10):
        assert rows[k]["n_queries"] == len(qids)
        assert rows[k]["n_correct"] == correct[k]
        assert 0.0 <= rows[k]["accuracy"] <= 1.0


def test_mmd_null_vs_planted_shift(spark, sf_dir):
    """MMD laws: the parity split (same distribution) scores near 0;
    the planted +0.5/dim shift scores clearly higher; a numpy replay
    of the linear-time estimator (same quadruples, same RBF, same
    nano rounding) reproduces both values."""
    import math

    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry
    from shadems_spark.queries.llm_ops import _MMD_SIGMA2

    rows = {
        r["split"]: r
        for r in load_registry()["q_mmd"][0](spark, sf_dir).collect()
    }
    assert rows["shifted"]["mmd2"] > rows["null"]["mmd2"] + 0.01
    assert abs(rows["null"]["mmd2"]) < 0.05

    emb = load_table(spark, sf_dir, "embeddings").collect()
    V = {e["vec_id"]: np.array(e["embedding"], dtype=float) for e in emb}

    def kern(a, b):
        return math.exp(-float(((a - b) ** 2).sum()) / (2 * _MMD_SIGMA2))

    for split, off in [("null", 0.0), ("shifted", 0.5)]:
        hs = []
        k = 0
        while True:
            ids = [4 * k, 4 * k + 2, 4 * k + 1, 4 * k + 3]
            if any(i not in V for i in ids):
                break
            x1, x2 = V[ids[0]], V[ids[1]]
            y1, y2 = V[ids[2]] + off, V[ids[3]] + off
            h = kern(x1, x2) + kern(y1, y2) - kern(x1, y2) - kern(x2, y1)
            hs.append(math.floor(abs(h) * 1e9 + 0.5) * (1 if h >= 0 else -1))
            k += 1
        mmd2 = sum(hs) / 1e9 / len(hs)
        assert rows[split]["n_quads"] == len(hs)
        assert abs(rows[split]["mmd2"] - mmd2) < 2e-6


def test_texttiling_brute_replay_and_boundary_laws(spark, sf_dir):
    """TextTiling replay in python (same windows, same Jaccard nano
    rounding, same 3-neighbor depth): best gap, sim and depth match
    per doc; depth >= 0 (peaks never below the valley); a document
    made of two disjoint-vocabulary halves puts the boundary at the
    seam with sim == 0."""
    import math

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = {
        r["doc_id"]: r
        for r in load_registry()["q_texttiling"][0](spark, sf_dir).collect()
    }
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select("doc_id", "text")
        .collect()
    )
    W_, S_ = 10, 5
    for d in docs:
        toks = [w for w in d["text"].split(" ") if w]
        if len(toks) < 2 * W_:
            assert d["doc_id"] not in rows
            continue
        sims = []
        for gap in range(W_, len(toks) - W_ + 1, S_):
            a = set(toks[gap - W_:gap])
            b = set(toks[gap:gap + W_])
            u = max(len(a | b), 1)
            sims.append(
                (gap, math.floor(1e9 * len(a & b) / u + 0.5))
            )
        best = None
        for i, (gap, s) in enumerate(sims):
            lp = max([s] + [x for _, x in sims[max(0, i - 3):i]])
            rp = max([s] + [x for _, x in sims[i + 1:i + 4]])
            depth = lp + rp - 2 * s
            key = (-depth, gap)
            if best is None or key < best[0]:
                best = (key, gap, s, depth)
        r = rows[d["doc_id"]]
        assert (r["best_gap"], r["n_gaps"]) == (best[1], len(sims))
        assert abs(r["gap_sim"] - round(best[2] / 1e9, 6)) < 1e-9
        assert abs(r["depth"] - round(best[3] / 1e9, 6)) < 1e-9
        assert r["depth"] >= 0

    # synthetic two-topic doc: boundary lands at the vocabulary seam
    half_a = " ".join(f"alpha{i % 7}" for i in range(20))
    half_b = " ".join(f"beta{i % 7}" for i in range(20))
    df = spark.createDataFrame(
        [(0, half_a + " " + half_b)], "doc_id long, text string"
    )
    from shadems_spark.operators.text import words as _w  # noqa: F401

    # reuse the query expressions via a temp table + same module fn
    # (builder reads documents; replicate inline instead)
    toks = [f"alpha{i % 7}" for i in range(20)] + [
        f"beta{i % 7}" for i in range(20)
    ]
    sims = []
    for gap in range(10, len(toks) - 10 + 1, 5):
        a, b = set(toks[gap - 10:gap]), set(toks[gap:gap + 10])
        sims.append((gap, len(a & b) / max(len(a | b), 1)))
    seam_gap = min(sims, key=lambda t: t[1])[0]
    assert seam_gap == 20  # the valley is exactly the topic seam
