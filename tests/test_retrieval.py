"""Retrieval-family tests: TF-IDF / BM25 semantics, chunk coverage
invariants, quantization error bounds, split determinism — plus plan
pins for the scale shapes the module docstrings promise."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.operators import retrieval as R
from shadems_spark.queries import load_registry

SF = "/root/testdata/sf0.001"


def _plan(spark, qname):
    reg = load_registry()
    return reg[qname][0](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_tfidf_idf_math(spark):
    """A term present in every document gets idf ln(1)=0 -> score tf*1
    (the +1 smoothing floor); a rarer term scores strictly higher per
    occurrence."""
    df = spark.sql(
        "SELECT * FROM VALUES (0, 'a a b'), (1, 'a c') AS t(doc_id, text)"
    )
    out = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in R.tf_idf(R.doc_terms(df), top_per_doc=None).collect()
    }
    # 'a' in both docs: idf = ln(3/3)+1 = 1 -> doc0 score 2.0, doc1 1.0
    assert out[(0, "a")] == 2.0 and out[(1, "a")] == 1.0
    # 'b' df=1: idf = ln(3/2)+1
    assert out[(0, "b")] == round(math.log(3 / 2) + 1, 6)


def test_bm25_ranks_tf_and_rarity(spark):
    """More hits of a rarer term outrank fewer hits of a common one;
    longer docs are penalized at equal tf."""
    df = spark.sql(
        """SELECT * FROM VALUES
        (0, 'x x y pad pad'),
        (1, 'x pad pad pad pad'),
        (2, 'pad pad pad pad pad')
        AS t(doc_id, text)"""
    )
    out = R.bm25(df, ["x", "y"], k=10).collect()
    ranks = {r["doc_id"]: r["rank"] for r in out}
    assert ranks[0] == 1 and ranks[1] == 2 and 2 not in ranks


def test_chunks_cover_every_token(spark):
    """Stride <= chunk_size -> every token index falls in >= 1 chunk,
    first chunk starts at 1, and n_tokens <= chunk_size."""
    docs = load_table(spark, SF, "documents").limit(50)
    ch = R.chunk_docs(docs, chunk_size=32, stride=24)
    bad = ch.filter(
        (F.col("n_tokens") > 32)
        | (F.col("start") + F.col("n_tokens") - 1 > F.col("doc_tokens"))
    ).count()
    assert bad == 0
    agg = (
        ch.groupBy("doc_id", "doc_tokens")
        .agg(
            F.min("start").alias("first"),
            F.max(F.col("start") + F.col("n_tokens") - 1).alias("covered"),
        )
        .filter((F.col("first") != 1) | (F.col("covered") != F.col("doc_tokens")))
        .count()
    )
    assert agg == 0


def test_quantized_cosine_close_to_exact(spark):
    """Int8 quantization keeps cosine within ~1e-2 of the exact value
    on real embeddings (64-dim)."""
    from shadems_spark.operators.similarity import as_double, cosine

    emb = load_table(spark, SF, "embeddings").limit(64)
    a = emb.select("vec_id", as_double("embedding").alias("v"),
                   R.quantize_vec(as_double("embedding")).alias("qv"))
    b = a.select(
        F.col("vec_id").alias("vid2"), F.col("v").alias("v2"), F.col("qv").alias("qv2")
    )
    pairs = a.crossJoin(b).filter(F.col("vec_id") < F.col("vid2")).limit(200)
    err = pairs.select(
        F.max(
            F.abs(
                cosine(F.col("v"), F.col("v2"))
                - R.quantized_cosine(F.col("qv"), F.col("qv2"))
            )
        ).alias("e")
    ).collect()[0]["e"]
    assert err < 0.01


def test_split_deterministic_and_complete(spark):
    """Same ids -> same split on every run; every row lands in exactly
    one of train/val/test."""
    docs = load_table(spark, SF, "documents")
    s1 = R.stratified_split(docs).groupBy("split").count().collect()
    s2 = R.stratified_split(docs).groupBy("split").count().collect()
    d1 = {r["split"]: r["count"] for r in s1}
    assert d1 == {r["split"]: r["count"] for r in s2}
    assert sum(d1.values()) == docs.count()
    assert set(d1) <= {"train", "val", "test"}


# ------------------------------------------------------------- plans

def test_chunk_plan_has_no_shuffle(spark):
    """Chunking is per-row generate+project — any Exchange means a
    regression."""
    p = _plan(spark, "q_chunk")
    assert "Exchange" not in p
    assert "Generate" in p


def test_bm25_filters_below_aggregation(spark):
    """The query-term IN-filter must sit directly above the token
    Generate (i.e. in the scan stage, below every Exchange), so only
    matching postings shuffle."""
    p = _plan(spark, "q_bm25")
    i = p.index("IN (spark,hash,window)")
    between = p[i : p.index("Generate", i)]
    assert "Exchange" not in between  # filter feeds the explode directly


def test_quantize_broadcasts_queries(spark):
    p = _plan(spark, "q_quantize_topk")
    assert "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_global_index_matches_global_window(spark):
    """Two-pass numbering equals the single-partition window form and
    is stable across runs."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.profile import global_index
    from pyspark.sql import Window

    ev = load_table(spark, SF, "events").select(
        "event_id", F.expr("ts_ns div 1000").alias("ts_us")
    )
    got = {
        r["event_id"]: r["gid"]
        for r in global_index(ev, ["ts_us", "event_id"]).collect()
    }
    w = Window.orderBy("ts_us", "event_id")
    want = {
        r["event_id"]: r["gid"]
        for r in ev.withColumn("gid", F.row_number().over(w)).collect()
    }
    assert got == want
    again = {
        r["event_id"]: r["gid"]
        for r in global_index(ev, ["ts_us", "event_id"]).collect()
    }
    assert got == again


def test_global_index_plan_range_partitions(spark):
    """The data-sized stage must partition on the deterministic value
    bucket (never a SinglePartition exchange of the full input; the
    only SinglePartition allowed is the buckets-sized offsets
    table)."""
    reg = load_registry()
    df = reg["q_global_index"][0](spark, SF)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__b" in p
    # offsets side: SinglePartition windows appear only above the
    # per-partition count aggregate, never directly over the scan
    for seg in p.split("Exchange SinglePartition")[1:]:
        assert "HashAggregate" in seg[:2000] or "count" in seg[:2000]


def test_pca_matches_numpy_power_iteration(spark):
    """The distributed fit must reproduce a local numpy run of the
    SAME algorithm (same init, same iteration count) almost exactly —
    that pins the distributed arithmetic.  The fixture embeddings are
    near-isotropic (random vectors: tiny eigengap), so alignment with
    the exact eigenvector is NOT a fair bound in finitely many passes;
    instead assert the Rayleigh quotient reaches >=90% of the true top
    eigenvalue (found a genuinely high-variance direction)."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.operators.similarity import (
        pca_project,
        power_top_component,
    )

    emb = load_table(spark, SF, "embeddings")
    iters = 12
    mean, comp = power_top_component(emb, iters=iters)

    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mu = X.mean(axis=0)
    Xc = X - mu
    assert np.allclose(mean, mu, atol=1e-9)

    d = X.shape[1]
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(iters):
        s = Xc.T @ (Xc @ v)
        v = s / np.linalg.norm(s)
    lead = v[np.argmax(np.abs(v) > 1e-9)]
    if lead < 0:
        v = -v
    got_v = np.array(comp)
    # same algorithm, different summation order: agreement to ~1e-6
    assert abs(float(got_v @ v)) > 1.0 - 1e-6

    cov = Xc.T @ Xc
    lam_top = np.linalg.eigvalsh(cov)[-1]
    rayleigh = float(got_v @ cov @ got_v)
    assert rayleigh >= 0.9 * lam_top

    got = {r["vec_id"]: r["pc1"] for r in pca_project(emb, mean, comp).collect()}
    want = Xc @ got_v
    for i, vid in enumerate(ids):
        assert abs(got[vid] - round(float(want[i]), 4)) < 2e-3


def test_pca_deterministic_and_sign_canonical(spark):
    """Same fit twice -> identical component; leading non-tiny
    coordinate is positive (sign canonicalization)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.similarity import power_top_component

    emb = load_table(spark, SF, "embeddings")
    _, c1 = power_top_component(emb, iters=6)
    _, c2 = power_top_component(emb, iters=6)
    assert c1 == c2
    lead = next(x for x in c1 if abs(x) > 1e-9)
    assert lead > 0


def test_pq_recall_and_compression(spark):
    """PQ ADC ranking must recover a meaningful share of the exact
    cosine top-5 (recall floor pinned on the deterministic fixture)
    and the code table must actually be compressed (m ints/vector)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.similarity import (
        brute_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = load_table(spark, SF, "embeddings")
    cb = pq_train(emb)

    codes = pq_encode(emb, cb)
    assert codes.schema["codes"].dataType.simpleString() == "array<int>"
    # m=32 codes (~32B conceptual) vs 64 float64s (512B): 16x compression
    assert all(len(r["codes"]) == 32 for r in codes.limit(5).collect())

    k = 5
    exact = brute_topk(emb, emb.filter(F.col("vec_id") % 100 == 0), k=k)
    approx = pq_topk(emb, cb, k=k)
    want: dict = {}
    for r in exact.collect():
        want.setdefault(r["q_id"], set()).add(r["cand_id"])
    got: dict = {}
    for r in approx.collect():
        got.setdefault(r["q_id"], set()).add(r["cand_id"])
    assert set(got) == set(want)
    hits = sum(len(want[q] & got[q]) for q in want)
    total = sum(len(want[q]) for q in want)
    recall = hits / total
    # deterministic fixture: measured 0.68 @ sf0.01 / sub=2-dim
    # subspaces (see BASELINE.md); generous floor against env drift
    assert recall >= 0.4, recall


def test_ivfpq_recall_and_probe_bound(spark):
    """IVFADC must (a) only ever score candidates from probed cells,
    (b) recover a meaningful share of the exact top-5 — lower than
    plain PQ since the probe can miss a neighbour's cell: that gap IS
    the IVF trade; floor pinned on the deterministic fixture."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.similarity import brute_topk, ivfpq_topk

    emb = load_table(spark, SF, "embeddings")
    k = 5
    approx = ivfpq_topk(emb, k=k).collect()
    cells_per_q: dict = {}
    got: dict = {}
    for r in approx:
        got.setdefault(r["q_id"], set()).add(r["cand_id"])
        cells_per_q.setdefault(r["q_id"], set()).add(r["cell"])
    assert all(len(c) <= 2 for c in cells_per_q.values())  # n_probe=2

    exact = brute_topk(emb, emb.filter(F.col("vec_id") % 100 == 0), k=k)
    want: dict = {}
    for r in exact.collect():
        want.setdefault(r["q_id"], set()).add(r["cand_id"])
    hits = sum(len(want[q] & got.get(q, set())) for q in want)
    total = sum(len(want[q]) for q in want)
    assert hits / total >= 0.2, hits / total


def test_pq_train_rejects_bad_subspace_split(spark):
    """d % m != 0 or m > d must raise, never silently truncate dims."""
    import pytest

    from shadems_spark.operators.similarity import pq_train

    df = spark.createDataFrame(
        [(i, [float(i + j) for j in range(6)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=4)
    with pytest.raises(ValueError, match="> embedding dim"):
        pq_train(df, m=8)


def test_pq_topk_empty_query_set_returns_empty(spark):
    """No id hits the query contract -> empty result with the right
    schema, not an IndexError."""
    from shadems_spark.operators.similarity import pq_topk, pq_train

    df = spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(1, 10)],
        "vec_id long, embedding array<double>",
    )
    cb = pq_train(df, m=4, k=4)
    out = pq_topk(df, cb, k=3, query_mod=100)  # ids 1..9: no multiples
    assert out.count() == 0
    assert set(out.columns) == {"q_id", "cand_id", "adc_score"}


def test_pq_refine_improves_or_holds_distortion(spark):
    """Lloyd refinement must not increase total quantization
    distortion (k-means' monotonicity law) — measured as the sum of
    squared distances from each subvector to its assigned centroid."""
    import numpy as np

    from shadems_spark.catalog import load_table
    from shadems_spark.operators.similarity import (
        pq_encode,
        pq_refine,
        pq_train,
        with_unit,
    )

    emb = load_table(spark, SF, "embeddings")
    cb0 = pq_train(emb)
    cb1 = pq_refine(emb, cb0, iters=1)

    uv = {
        r["vec_id"]: np.asarray(r["uv"], dtype=np.float64)
        for r in with_unit(emb, "embedding", "uv").select("vec_id", "uv").collect()
    }

    def distortion(cb):
        m = len(cb)
        sub = len(cb[0][0])
        codes = {
            r["vec_id"]: r["codes"] for r in pq_encode(emb, cb).collect()
        }
        tot = 0.0
        for vid, cs in codes.items():
            x = uv[vid]
            for mi in range(m):
                c = np.asarray(cb[mi][cs[mi]])
                s = x[mi * sub : (mi + 1) * sub]
                tot += float(((s - c) ** 2).sum())
        return tot

    assert distortion(cb1) <= distortion(cb0) + 1e-9


def test_pq_encode_layout_independent(spark):
    """Codes must not depend on row layout: the r11 sequential-fold
    rewrite of pq_encode's normalization/distance accumulation is
    per-row arithmetic, so any repartitioning (different Arrow batch
    boundaries AND batch membership) must yield identical codes — the
    property that makes the encode safe on a 1000-executor layout and
    keeps the hash-exact oracle valid regardless of partitioning."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.similarity import pq_encode, pq_train

    emb = load_table(spark, SF, "embeddings")
    cb = pq_train(emb)
    a = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    b = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb.repartition(7), cb).collect()
    }
    assert a == b and len(a) > 0


def test_pq_lut_join_matches_literal(spark):
    """The broadcast-LUT join strategy must return exactly the
    literal-LUT results (same fold order -> bit-identical scores),
    for both PQ and IVFPQ (VERDICT r03 #7 / ADVICE r03)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.similarity import ivfpq_topk, pq_topk, pq_train

    emb = load_table(spark, SF, "embeddings")
    cb = pq_train(emb)
    lit = {tuple(r) for r in pq_topk(emb, cb, k=5, lut_strategy="literal").collect()}
    jn = {tuple(r) for r in pq_topk(emb, cb, k=5, lut_strategy="join").collect()}
    assert jn == lit and len(lit) > 0

    lit2 = {tuple(r) for r in ivfpq_topk(emb, k=5, lut_strategy="literal").collect()}
    jn2 = {tuple(r) for r in ivfpq_topk(emb, k=5, lut_strategy="join").collect()}
    assert jn2 == lit2 and len(lit2) > 0


def test_ivfpq_join_strategy_has_no_nested_loop_join(spark):
    """The many-query IVFPQ path must route codes to queries via the
    exploded (q_id, cell) equi-join — a BroadcastHashJoin — never the
    array_contains nested-loop form whose predicate-eval count is
    |codes| x |queries| (r11: 4e8 at the x100 probe, 93.8 -> 79.6 s
    after the rewrite)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, SF, "embeddings")
    df = ivfpq_topk(emb, k=3, lut_strategy="join")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_pq_join_plan_flat_in_query_count(spark):
    """The join strategy's plan must not grow with |queries| — one
    broadcast join + one window regardless (the literal form's plan is
    O(|queries|*m*k) literals and one job per query)."""
    from shadems_spark.catalog import load_table
    from shadems_spark.operators.similarity import pq_topk, pq_train

    emb = load_table(spark, SF, "embeddings")
    cb = pq_train(emb)
    plans = []
    for mod in (100, 10):  # 10x more queries
        df = pq_topk(emb, cb, k=3, query_mod=mod, lut_strategy="join")
        plans.append(df._jdf.queryExecution().executedPlan().toString())
    assert len(plans[1]) < 1.5 * len(plans[0])
    assert all(p.count("Window [") == 1 for p in plans)


def test_bitext_margin_absorbs_hubness(spark):
    """A 'hub' y close to every x gets its cos divided by a high
    y-side k-NN mean, so a mutually-exclusive pair out-margins it."""
    from pyspark.sql import Row

    from shadems_spark.queries import load_registry

    rows = [
        # language X
        Row(vec_id=0, label=0, embedding=[1.0, 0.0, 0.0, 0.2]),
        Row(vec_id=1, label=0, embedding=[0.0, 1.0, 0.0, 0.2]),
        Row(vec_id=2, label=0, embedding=[0.0, 0.0, 1.0, 0.2]),
        # language Y: 10 is a hub (mid of everything), 11 pairs with 0
        Row(vec_id=10, label=1, embedding=[0.5, 0.5, 0.5, 0.2]),
        Row(vec_id=11, label=1, embedding=[0.99, 0.0, 0.0, 0.2]),
        Row(vec_id=12, label=1, embedding=[0.0, 0.0, 0.9, -0.4]),
    ]
    import tempfile, os
    d = tempfile.mkdtemp()
    spark.createDataFrame(rows).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    # reuse fixture layout for the other tables via sf0.001 symlinks
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents"]:
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{d}/{t}.parquet")
    reg = load_registry()
    out = {r["x_id"]: r for r in reg["q_bitext_margin"][0](spark, d).collect()}
    assert set(out) == {0, 1, 2}
    # x=0 must pair with the dedicated translation 11, not the hub 10
    assert out[0]["y_id"] == 11
    # margins exceed 1 for true pairs (cos above the neighborhood mean)
    assert out[0]["margin"] > 1.0


def test_cdc_chunks_stable_under_insertion(spark):
    """The content-defined property: prepending words to a document
    changes only the chunking BEFORE the next boundary — every later
    chunk survives verbatim (fixed-offset windows would shift every
    chunk)."""
    from pyspark.sql import Row

    import os
    import tempfile

    from shadems_spark.queries import load_registry

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi omicron pi rho sigma tau upsilon"
    edited = "INSERTED words here " + base

    def chunks(text):
        d = tempfile.mkdtemp()
        spark.createDataFrame(
            [Row(doc_id=0, text=text, lang="en", source="s", n_chars=len(text))]
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"]:
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{d}/{t}.parquet")
        reg = load_registry()
        return [r["chunk_text"] for r in reg["q_cdc_chunk"][0](spark, d).collect()]

    c_base, c_edit = chunks(base), chunks(edited)
    # every base chunk except possibly the first survives the edit
    surviving = set(c_base[1:]) & set(c_edit)
    assert surviving == set(c_base[1:]) and len(c_base) > 2


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL property: 16-dim projected pairwise distances approximate
    the 64-dim originals — median relative distortion of sampled
    pairs bounded (the k=16 JL regime is loose; the pin is that the
    projection is distance-CORRELATED, not metric-destroying)."""
    import math

    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    reg = load_registry()
    rows = reg["q_random_projection"][0](spark, sf_dir).collect()
    proj = {r["vec_id"]: [r[f"y{j}"] for j in range(16)] for r in rows}
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, sf_dir, "embeddings")
        .filter((F.col("vec_id") % 3 == 0) & (F.col("vec_id") < 60))
        .collect()
    }

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ids = sorted(emb)
    distortions = []
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        d0, d1 = dist(emb[a], emb[b]), dist(proj[a], proj[b])
        assert d0 > 0
        distortions.append(d1 / d0)
    distortions.sort()
    med = distortions[len(distortions) // 2]
    assert 0.6 <= med <= 1.4, med  # centered near 1, k=16 tolerance


def test_heavy_hitters_exact_and_layout_independent(spark):
    """The two-phase heavy-hitter output must equal the textbook
    GROUP BY ... HAVING n*m > N set with exact counts, and must not
    change when the input is laid out into different partitions
    (phase 1 only ever over-selects; phase 2 is exact)."""
    from shadems_spark.operators.profile import heavy_hitters

    vals = ["hot"] * 40 + ["warm"] * 12 + [f"cold{i}" for i in range(48)]
    df = spark.createDataFrame([(v,) for v in vals], "w string")

    def run(partitions):
        out = heavy_hitters(df.repartition(partitions), "w", m=10)
        return sorted((r["w"], r["n"], r["n_total"]) for r in out.collect())

    expect = [("hot", 40, 100), ("warm", 12, 100)]  # n*10 > 100
    assert run(1) == expect
    assert run(7) == expect


def test_heavy_hitters_threshold_is_strict(spark):
    """An item with n*m == N exactly is NOT a phi-heavy hitter
    (strict inequality, integer arithmetic — no float rounding)."""
    from shadems_spark.operators.profile import heavy_hitters

    vals = ["edge"] * 10 + [f"x{i}" for i in range(90)]  # 10*10 == 100
    df = spark.createDataFrame([(v,) for v in vals], "w string")
    assert heavy_hitters(df, "w", m=10).count() == 0


def test_centroid_sim_bounds_and_self_separation(spark, sf_dir):
    """Cosine values in [-1, 1]; all label pairs present exactly once
    (K choose 2 rows); and the fixture's labeled clusters are
    separated — mean inter-centroid cosine stays below 0.9 (collapse
    would push everything toward 1)."""
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_centroid_sim"][0](spark, sf_dir).collect()
    labels = {r["label_a"] for r in rows} | {r["label_b"] for r in rows}
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert -1.0 - 1e-9 <= r["cos_sim"] <= 1.0 + 1e-9
        assert r["label_a"] < r["label_b"]
    mean = sum(r["cos_sim"] for r in rows) / len(rows)
    assert mean < 0.9, mean


def test_embed_outliers_planted_far_vector(spark):
    """A vector far from its label's cluster must rank as that
    label's #1 outlier (operator logic replayed on a synthetic
    frame via the same SQL the query registers)."""
    from shadems_spark.queries import load_registry  # noqa: F401

    rows = [(i, 0, [0.1] * 4) for i in range(8)]
    rows.append((99, 0, [5.0, -5.0, 5.0, -5.0]))  # planted outlier
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    e = df.select(
        "vec_id", "label", F.posexplode("embedding").alias("k", "v")
    ).select(
        "vec_id", "label", "k",
        F.round(F.col("v").cast("double") * 1_000_000.0).cast("long").alias("vi"),
    )
    c = e.groupBy("label", "k").agg(
        F.sum("vi").alias("sv"), F.count(F.lit(1)).alias("n")
    )
    diff = F.col("vi") / 1_000_000.0 - F.col("sv") / (1_000_000.0 * F.col("n"))
    d = (
        e.join(c, ["label", "k"])
        .groupBy("vec_id", "label")
        .agg(F.sum(diff * diff).alias("d2"))
    )
    top = d.orderBy(F.col("d2").desc()).first()
    assert top["vec_id"] == 99


def test_kanon_flags_small_cells(spark, sf_dir):
    """Every class with k < 5 (and only those) carries suppress=1, and
    class sizes sum to the table's row count."""
    from shadems_spark.catalog import load_table
    from shadems_spark.queries import load_registry

    rows = load_registry()["q_kanon"][0](spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "documents").count()
    assert sum(r["k"] for r in rows) == n
    for r in rows:
        assert r["suppress"] == (1 if r["k"] < 5 else 0)
    assert any(r["suppress"] == 1 for r in rows)  # fixture has small cells


def test_global_cumsum_matches_global_window(spark):
    """Two-phase prefix sums equal the single-partition window form
    (including negative addends — the offsets join must add partition
    TOTALS, not maxima)."""
    from pyspark.sql import Window

    from shadems_spark.operators.profile import global_cumsum

    df = spark.range(500).select(
        F.col("id"),
        ((F.col("id") * 37) % 101 - 50).alias("v"),
        ((F.col("id") * 13) % 7).alias("c"),
    )
    got = {
        r["id"]: (r["cv"], r["cc"])
        for r in global_cumsum(df, ["id"], {"cv": "v", "cc": "c"}, n_parts=7)
        .collect()
    }
    w = Window.partitionBy(F.lit(0)).orderBy("id")
    want = {
        r["id"]: (r["cv"], r["cc"])
        for r in df.select(
            "id", F.sum("v").over(w).alias("cv"), F.sum("c").over(w).alias("cc")
        ).collect()
    }
    assert got == want


def test_global_ntile_matches_window_ntile(spark):
    """The closed-form tile fill must be bit-identical to window
    ntile(k) for asc/desc orders, k dividing and not dividing n, and
    the n < k degenerate case."""
    from pyspark.sql import Window

    from shadems_spark.operators.profile import global_ntile

    df = spark.range(103).select(
        F.col("id"), ((F.col("id") * 31) % 997).alias("v")
    )
    for k, order, bk, bd in [
        (4, [F.col("v").desc(), "id"], F.col("v"), True),
        (5, ["v", "id"], None, False),
        (7, [F.col("v").desc(), "id"], F.col("v"), True),
        (500, ["v", "id"], None, False),  # n < k: tile == rank
    ]:
        got = {
            r["id"]: r["t"]
            for r in global_ntile(
                df, k, order, "t", n_parts=6,
                bucket_key=bk, bucket_desc=bd,
            ).collect()
        }
        want = {
            r["id"]: r["t"]
            for r in df.select(
                "id",
                F.ntile(k).over(
                    Window.partitionBy(F.lit(0)).orderBy(*order)
                ).alias("t"),
            ).collect()
        }
        assert got == want, f"k={k}"


def test_global_cumsum_deterministic_across_instantiations(spark):
    """The r6 local[3]-gate regression, pinned: bucket assignment must
    be a pure function of DATA values, so repeated physical
    instantiations of the same cumsum (separate actions, separate AQE
    plans — the condition under which repartitionByRange's
    runtime-seeded sampler produced divergent boundaries and WRONG
    offsets in q_mannwhitney) return identical results."""
    from shadems_spark.operators.profile import global_cumsum

    df = spark.range(2000).select(
        ((F.col("id") * 131) % 997 / 7.0).alias("v"),
        (F.col("id") % 5 + 1).alias("t"),
    ).groupBy("v").agg(F.sum("t").alias("t"))
    runs = [
        sorted(
            (r["v"], r["ct"])
            for r in global_cumsum(df, ["v"], {"ct": "t"}, n_parts=3)
            .collect()
        )
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]
    # and it equals the single-partition window truth
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(0)).orderBy("v")
    want = sorted(
        (r["v"], r["ct"])
        for r in df.select("v", F.sum("t").over(w).alias("ct")).collect()
    )
    assert runs[0] == want


def test_global_index_degenerate_constant_key(spark):
    """All-equal primary keys: no cuts exist, every row lands in one
    bucket, and the numbering must still equal the window truth (the
    tie-break column does the ordering)."""
    from pyspark.sql import Window

    from shadems_spark.operators.profile import global_index

    df = spark.range(300).select(F.lit(7).alias("k"), F.col("id"))
    got = {
        r["id"]: r["g"]
        for r in global_index(df, ["k", "id"], out="g", n_parts=8).collect()
    }
    w = Window.partitionBy(F.lit(0)).orderBy("k", "id")
    want = {
        r["id"]: r["g"]
        for r in df.select("id", F.row_number().over(w).alias("g")).collect()
    }
    assert got == want


def test_rrf_fusion_laws(spark):
    """RRF invariants: every fused row appeared in at least one
    ranker's top-20 (a zero rank means 'absent from that ranker', so
    both-zero is impossible); the fused score is exactly the sum of
    the two integer contributions; and a doc present in BOTH lists
    outscores a doc holding the same best rank in only one."""
    from shadems_spark.queries.retrieval import q_rrf_fusion

    rows = q_rrf_fusion(spark, SF).collect()
    assert len(rows) == 10
    assert len({r["id"] for r in rows}) == 10

    def c(rank):
        return 10**9 // (60 + rank) if rank > 0 else 0

    for r in rows:
        assert r["r_lex"] > 0 or r["r_sem"] > 0
        assert r["rrf"] == c(r["r_lex"]) + c(r["r_sem"])
    both = [r for r in rows if r["r_lex"] > 0 and r["r_sem"] > 0]
    for r in both:
        best = min(x for x in (r["r_lex"], r["r_sem"]) if x > 0)
        assert r["rrf"] > c(best)
