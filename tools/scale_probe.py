"""Scale probe: measure how headline queries scale when the fact
tables grow xN (default 10), holding dims fixed.

The 100 TB design claims in SURVEY.md §4 are analytical (bounded
raster shuffle, broadcast dims, bucket-bounded dedup joins); this tool
turns them into MEASURED evidence on this machine: it materializes a
xN copy of the big fixtures (key-shifted unions — same distributions,
N times the rows), runs the headline queries at both scales in one
warm JVM, and reports sec + output rows at each scale.

Reading the report:
- scan-bound queries (rasters, minmax, aggregates, windows, joins to
  dims) should scale ~linearly (ratio <= N, usually well under N on
  local[32] because partitions parallelize);
- raster/binned outputs should have IDENTICAL output rows at both
  scales (the shuffle is bounded by the canvas, not the data);
- dedup on an xN duplicated corpus is expected superlinear in
  CANDIDATE PAIRS (each doc gains N-1 planted near-dups: the workload
  itself grows ~N^2/2 pairs inside each duplicate group) — the probe
  reports it for honesty, the linearity claim applies to the
  signature stage, not the planted-pair explosion.

Usage: python tools/scale_probe.py [N] [base_sf_dir] [--dedup]
Prints one JSON line (plus a human table on stderr).

--dedup runs the dedup-family probe (minhash / simhash / exact /
n-gram Jaccard / decontaminate) and builds ONLY the xN documents
table, with per-copy word mutation: naively unioning the corpus N
times plants N-1 near-dups per doc, growing the candidate-pair
WORKLOAD ~N²/2 regardless of engine quality.  Suffixing every word
with its copy index keeps copies fully dissimilar, so gram/bucket
fan-outs match a genuinely larger corpus and the measured growth is
the ENGINE's, not the planted-pair explosion.  x100 from sf0.1 =
500k docs, the largest corpus this sandbox holds comfortably.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from shadems_spark.catalog import TABLES, load_table  # noqa: E402
from shadems_spark.operators import OperatorRefusal  # noqa: E402
from shadems_spark.queries import load_registry  # noqa: E402
from shadems_spark.session import get_spark  # noqa: E402

#: probe set: one representative per engine family whose scaling claim
#: is "linear in input" (plus dedup, reported with its caveat above).
PROBE = [
    "q_raster_count",
    "q_raster_count_cat",
    "q_minmax",
    "q_eq_hist",
    "q_pricing_summary",
    "q_join_fact",
    "q_local_supplier",
    "q_salted_join",
    "q_skew_split",
    "q_tumbling",
    "q_session",
    "q_cosine_topk",
    "q_curation",
    "q_dedup_minhash",
    "q_decontaminate",
    "q_repetition",
    "q_pii_scrub",
    "q_domain_mix",
    "q_seq_pack",
]

#: raster/shading-family probe (--raster, VERDICT r8 #4): lineitem-only
#: xN.  The canvas-bounded claim — shuffle and OUTPUT bounded by the
#: pixel grid regardless of input rows — should show ~flat-to-linear
#: wall (the scan grows; the aggregate state does not) and IDENTICAL
#: output rows at xN for the raster aggregates and eq_hist (quantile
#: bins over the same value distribution).  q_bin2d is the per-sample
#: projection (output = rows/50 by construction), so its OUTPUT grows
#: xN — reported for honesty; its shuffle is still zero (map-only).
PROBE_RASTER = [
    "q_raster_count",
    "q_raster_count_cat",
    "q_bin2d",
    "q_minmax",
    "q_eq_hist",
]

#: dedup-family probe (--dedup): documents-only workloads whose scale
#: claim is "bounded candidate generation, never all-pairs".
PROBE_DEDUP = [
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_ngram_jaccard",
    "q_decontaminate",
]

#: retrieval-family probe (--retrieval): documents-only workloads.
#: Copies are word-mutated, so the x10 corpus has ~10x the VOCABULARY
#: too — the stress case for tfidf/vocab (df table grows with N, not
#: just postings) and the honest case for bm25 (query terms hit only
#: copy 0, so its match-bounded claim is visible: near-flat wall).
PROBE_RETRIEVAL = [
    "q_tfidf",
    "q_bm25",
    "q_vocab",
    "q_chunk",
    "q_split_stratified",
]

#: round-3 probe (--round3): corpus + behavioral-analytics families
#: added in round 3.  Documents are word-mutated (vocabulary grows
#: with N — the stress case for unigram-LM and span-dedup);  events
#: copies keep their user_id, so each user's history grows xN — the
#: stress case for the per-user windows in sessionize/funnel/retention
#: (state per key grows, key count does not: the honest worst case).
PROBE_R3 = [
    "q_unigram_lm",
    "q_span_dedup",
    "q_zipf",
    "q_weighted_sample",
    "q_sessionize",
    "q_funnel",
    "q_retention",
    "q_variant",
    "q_recursive_cte",
]

#: round-4 probe (--round4): all big tables xN.  Expectations:
#: q_mmr — candidate stage is bounded (|q|*n_candidates), only the
#: one corpus scan grows: ~linear.  q_pagerank — copies repeat the
#: same (cust, supp) pairs, so the DISTINCT edge graph is unchanged
#: and only the pre-distinct scan grows: sublinear.  q_pipeline_e2e /
#: q_text_normalize / q_xml_funcs — scan-bound: ~linear.  q_semdedup
#: is probed separately (probe_semdedup_k) because its honest scale
#: story is "raise n_clusters with N", not fixed-k growth.
#: Super-linear BY WORKLOAD, not engine (measured x10: 4-7x wall):
#: q_hard_negatives / q_bitext_margin — the probe grows BOTH the
#: anchor/query side (% selectors) and the corpus, so the scored
#: pairs grow x100; the operators' contracts bound one side (the
#: docstrings' ANN-candidates-at-scale note).  q_triangles —
#: embedding copies are IDENTICAL vectors, so planted near-dup edges
#: (and wedges) explode exactly as the dedup-probe docstring
#: describes for unmutated corpora.
PROBE_R4 = [
    "q_mmr",
    "q_pagerank",
    "q_pipeline_e2e",
    "q_text_normalize",
    "q_xml_funcs",
    "q_ewma",
    "q_bigram_lm",
    "q_hard_negatives",
    "q_bitext_margin",
    "q_quality_classifier",
    "q_triangles",
    "q_theta_sets",
    "q_kll_quantiles",
    "q_stream_enrich",
    "q_bpe_tokenize",
    # late round-4 batch: weighted_reservoir / url / zorder scan-bound
    # (~linear); components_star rounds grow with log(diameter) only;
    # sql_sugar/quality_classifier scan-bound.
    "q_weighted_reservoir",
    "q_url_funcs",
    "q_zorder",
    "q_components_star",
    "q_sql_sugar",
    # scan-bound per-doc transforms: ~linear expected
    "q_cdc_chunk",
    "q_random_projection",
]

#: focused x100 probe (--r4x100; VERDICT r4 #6): the round-4 extension
#: operators that had only x10 evidence.  Builds x100 copies of
#: documents/embeddings/lineitem/orders only; documents word-mutated,
#: embeddings ROTATED per copy (cyclic shift by the copy index — norm
#: and distribution preserved, copies ~orthogonal to the originals) so
#: neither corpus plants identical payloads and the measured growth is
#: the engine's, not a planted-duplicate explosion.  q_semdedup is
#: probed alongside via its own k-rule (n_clusters scaled with N so
#: n/k stays fixed — the paper's regime) rather than fixed-k.
PROBE_R4X100 = [
    "q_mmr",
    "q_pagerank",
    "q_pipeline_e2e",
]

#: round-5 probe (--round5): the new train/score/sketch operators.
#: Documents word-mutated, embeddings rotated (the r4x100 recipe) so
#: growth is the engine's.  Expectations: q_dsir / q_naive_bayes /
#: q_ccnet_buckets / q_bloom_decontaminate / q_heavy_hitters — one or
#: two corpus scans + a word- or bit-keyed join whose right side is
#: vocab/filter-sized: ~linear.  q_lr_train / q_kmeans — fixed
#: iteration count, each ONE aggregate over the xN table with
#: codebook-sized driver state: ~linear.  q_ann_recall — the recall
#: audit joins brute-force truth against IVF candidates for a FIXED
#: query set, so only the corpus side of both scans grows: ~linear
#: (the truth side is the audit, not the serving path).
#: q_admission_2phase — per-batch candidate set bounded by the batch,
#: corpus-side gram join grows with the store: ~linear.
PROBE_R5 = [
    "q_dsir",
    "q_lr_train",
    "q_kmeans",
    "q_ann_recall",
    "q_heavy_hitters",
    "q_naive_bayes",
    "q_ccnet_buckets",
    "q_bloom_decontaminate",
    "q_admission_2phase",
    # second round-5 batch.  q_winnow — selection is a projection,
    # only minima shuffle: ~linear.  q_kl_drift — vocab-sized join
    # tables: ~linear.  q_backoff_lm — held-out stream vs vocab-sized
    # LM tables: ~linear (mutation grows the vocab too, the honest
    # stress).  q_bootstrap_ci — one scan, 32-row/partition shuffle:
    # ~linear, flat output.
    "q_winnow",
    "q_kl_drift",
    "q_backoff_lm",
    "q_bootstrap_ci",
    # third round-5 batch.  q_doremi / q_kl_drift-shaped: vocab-sized
    # joins, K-row EG step: ~linear.  q_curriculum — per-domain window
    # + global ntile: the ntile caveat (documented production swap).
    # q_anomaly / q_cusum — days x types frames after one aggregate:
    # ~linear in the scan.  q_centroid_sim — (label, k) aggregate then
    # labels-sized pairs: ~linear.  q_eq_hist_interp — raster-bounded.
    "q_doremi",
    "q_curriculum",
    "q_anomaly",
    "q_cusum",
    "q_centroid_sim",
    "q_eq_hist_interp",
    # late round-5: group-keyed projection / index build / bounded
    # BFS — all ~linear in the scan (khop's frontier is node-bounded).
    "q_group_folds",
    "q_inverted_index",
    "q_khop",
]

#: round-5 statistics/analytics batch (--r5stats): the drift, causal,
#: trend, and mining operators added in the closing session.  Scale
#: claims: q_ks_test / q_mannwhitney / q_psi / q_best_split — one
#: map-side value aggregate then DISTINCT-value windows (value
#: cardinality, not rows): sublinear-to-linear.  q_did /
#: q_mi_categorical — fixed-cell aggregates: ~linear scan.
#: q_trend_ols / q_acf / q_theilsen — date-cardinality grids: scan-
#: linear (same days, xN rows per day).  q_freq_pairs — per-basket
#: O(k^2) pairs with broadcast frequent-item prune: ~linear in
#: baskets.  q_rfm / q_benford — customer/9-digit aggregates.
#: q_jsd_matrix / q_readability — token-keyed joins / stateless row
#: exprs.  q_isotonic — bin-bounded minimax (constant past the bin
#: agg).  q_link_predict — wedge join on the bucketed near-dup graph.
PROBE_R5STATS = [
    "q_ks_test",
    "q_mannwhitney",
    "q_psi",
    "q_best_split",
    "q_did",
    "q_mi_categorical",
    "q_trend_ols",
    "q_acf",
    "q_theilsen",
    "q_freq_pairs",
    "q_rfm",
    "q_benford",
    "q_jsd_matrix",
    "q_readability",
    "q_isotonic",
    "q_link_predict",
]

#: round-6 session probe (--round6): fusion retrieval, time-series
#: decomposition/forecast, privacy audits, causal matching, FDR,
#: skyline and the two attribution models.
PROBE_R6 = [
    "q_rrf_fusion",
    "q_stl_decompose",
    "q_holt",
    "q_skyline",
    "q_markov_attribution",
    "q_shapley_attribution",
    "q_propensity_match",
    "q_bh_fdr",
    "q_dp_count",
    "q_ldiversity",
]

#: round-6 third batch (--r6b3).  Expectations: the calendar-bounded
#: series family (spearman/kendall/motif/changepoint) grows ONLY its
#: (type, day) pre-aggregate scan — the O(days^2) tails are constant;
#: one-pass sufficient-stats queries (chisq/ridge/corr_matrix/moments/
#: ams_f2) and the per-user-window pair (interval_coverage/
#: path_analysis) are scan-bound ~linear; q_apriori's per-basket
#: fan-out is fixed so the pair join grows ~linearly with baskets;
#: q_kn_lm / q_pr_auc / q_tcloseness / q_adaboost_stumps are
#: scan-bound aggregates (adaboost: fixed 3 rounds xN rows each).
#: q_map_eval grows BOTH sides (the % query selector picks N times
#: the queries on an N-times corpus -> x(N^2) scored pairs, the
#: q_hard_negatives workload caveat) — reported for honesty; the
#: serving-path contract bounds the query set, not the probe.
PROBE_R6B3 = [
    "q_chisq",
    "q_spearman",
    "q_kendall",
    "q_motif",
    "q_changepoint",
    "q_interval_coverage",
    "q_path_analysis",
    "q_moments",
    "q_ams_f2",
    "q_ridge",
    "q_corr_matrix",
    "q_apriori",
    "q_tcloseness",
    "q_fd_discovery",
    "q_kn_lm",
    "q_pr_auc",
    "q_adaboost_stumps",
    "q_map_eval",
]

#: round-6 closing wave (--r6b4).  Expectations: series/statistics
#: tails are calendar-bounded (hurst/xcorr/granger/wilcoxon/friedman/
#: sax/dtw/entropy_rate/forecast_backtest — only the (type, day|week)
#: or per-user-transition pre-aggregate grows); q_time_to_convert and
#: q_heavy_change are scan + bounded-key aggregates; the IVM pair's
#: change batches grow with the tables (~linear by construction);
#: q_small_qty_revenue is the Q17 part-agg + join-back (~linear);
#: graph metrics ride the bucketed edge generator (its x10 dedup
#: caveat applies to the EDGE workload, not the metric tails);
#: q_power_analysis / q_srm are one per-user aggregate each.
PROBE_R6B4 = [
    "q_hurst",
    "q_xcorr",
    "q_granger",
    "q_wilcoxon",
    "q_friedman",
    "q_sax",
    "q_dtw",
    "q_entropy_rate",
    "q_forecast_backtest",
    "q_time_to_convert",
    "q_heavy_change",
    "q_ivm_agg",
    "q_ivm_join",
    "q_small_qty_revenue",
    "q_power_analysis",
    "q_srm",
    "q_modularity",
    "q_assortativity",
    "q_grid_dbscan",
    "q_motif",
    "q_ams_join",
]

#: round-7 probe (--round7): the statistics batch.  Expectations:
#: q_welch / q_tost / q_levene / q_simpson are one- or two-pass
#: conditional aggregates — pure scan-bound ~linear; q_mad / q_sprt /
#: q_page_hinkley grow ONLY the (type, day) pre-aggregate scan (the
#: per-type folds stay calendar-bounded); q_lorenz grows the
#: per-customer revenue aggregate and its two-phase global_ntile
#: ~linearly (value-cut buckets shard with cardinality — the design
#: point the r6 two-phase migration bought).
PROBE_R7 = [
    "q_welch",
    "q_tost",
    "q_levene",
    "q_mad",
    "q_simpson",
    "q_lorenz",
    "q_sprt",
    "q_page_hinkley",
    # second batch: tukey/mcnemar scan xN events (k-row / 1-row
    # reductions); herfindahl's per-(nation, customer) aggregate grows
    # with orders, its per-nation stage stays 25-row.
    "q_tukey",
    "q_mcnemar",
    "q_herfindahl",
    # third batch: kruskal's distinct-value rank table grows with the
    # milli-int value domain (two-phase prefix count shards it);
    # shewhart grows only the (type, day) pre-aggregate.
    "q_kruskal",
    "q_shewhart",
]

#: round-8 probe (--round8): the new monitors/tests plus the queries
#: whose execution shape changed this round.  Expectations:
#: q_ewma_control grows only the (type, day) pre-aggregate (the fold
#: is calendar-bounded); q_fisher_exact / q_bayes_ab grow one
#: conditional day/user aggregate and run constant-size enumerations
#: after; q_survival's triangle cumsums run on the lifetimes table
#: (calendar-bounded); q_ngram_jaccard re-probed after the
#: string-identity df change; q_vocab / q_bm25 / q_dsir re-probed
#: after the window-free rank conversions (TakeOrdered + triangle).
PROBE_R8 = [
    "q_ewma_control",
    "q_fisher_exact",
    "q_bayes_ab",
    "q_survival",
    "q_wilcoxon",
    "q_ngram_jaccard",
    "q_vocab",
    "q_bm25",
    "q_dsir",
    "q_eq_hist_interp",
    # second batch: mood's two-phase pooled median shards with the
    # distinct-value domain; cochran is a (type, day) conditional
    # aggregate + a calendar-bounded grid; theil is the herfindahl
    # per-(nation, customer) shape with nano-int entropy terms.
    "q_mood_median",
    "q_cochran_q",
    "q_theil_entropy",
    # third batch: BY shares q_bh_fdr's one data-sized per-type
    # aggregate; the harmonic sum runs on m = |types| rows.
    "q_benjamini_yekutieli",
]

#: round-9 probe (--round9): the wall-reclaim rewrites (VERDICT r8
#: #2/#3) — re-measure their scale shapes after the plan changes.
#: documents word-mutated + events xN (user histories grow).
#: Expectations: lr_train — the persisted table is now one row per
#: doc (array payload), iterations aggregate-only: ~linear in docs;
#: adaboost — T one-job aggregates over the persisted features:
#: ~linear; als — pair matrix grows with events, type codebook fixed:
#: ~linear; grid_dbscan — cell/edge tables grid-bounded, the
#: union-find fast path stays under its 64Ki cap here (the
#: distributed sweeps are the beyond-cap path); dedup_minhash — the
#: Arrow gram stage is per-row: ~linear with the usual banding
#: caveats; rrf_fusion — two corpus scans + a <= 40-row fusion:
#: ~linear in the scans, flat tail.
PROBE_R9 = [
    "q_lr_train",
    "q_adaboost_stumps",
    "q_als",
    "q_grid_dbscan",
    "q_dedup_minhash",
    "q_rrf_fusion",
]

#: round-10 join-family probe (--joins; VERDICT r9 #4): the one §2
#: family whose shuffle grows with data — fact x fact joins.  Builds
#: xN lineitem + orders ONLY (keys shifted consistently per copy so
#: l_orderkey = o_orderkey holds copy-by-copy; o_custkey is NOT
#: shifted, so each customer gains N times the orders — the honest
#: per-key skew stress for the customer-side joins).  Beyond wall and
#: rows, this mode records the AQE-FINAL join strategy (broadcast vs
#: sort-merge vs shuffled-hash counts) and total spill at BOTH scales:
#: the 100 TB claim is "AQE picks broadcast only while a side fits,
#: degrades to SMJ without spill when it doesn't".
PROBE_JOINS = [
    "q_join_fact",
    "q_bucketed_join",
    "q_salted_join",
    "q_skew_split",
    "q_ship_priority",
]

#: round-11 ANN/retrieval probe (--annx; VERDICT r10 #3): the one
#: family still on x10-only evidence.  Embeddings-only xN, ROTATED
#: copies (the r5 protocol — cyclic shift keeps norms/distribution,
#: decorrelates copies).  Expectations: q_cosine_topk / q_ann_recall
#: scan |Q|x|C| pairs with |Q| fixed at 3, so wall grows ~linearly;
#: lsh/ivf candidate sets grow ~linearly (buckets/cells grow with the
#: collection, query count fixed) — ann_candidates() records the
#: actual pair counts so scan-bounded vs output-driven growth is
#: separable in the artifact; q_quantize_topk's query set is defined
#: as vec_id%100==0, so its WORKLOAD grows ~N² by definition — above
#: ANN_PAIR_BUDGET the probe records that analytically instead of
#: burning hours proving arithmetic scales quadratically.
PROBE_ANN = [
    "q_cosine_topk",
    "q_ann_lsh",
    "q_ann_ivf",
    "q_quantize_topk",
    "q_pq_topk",
    "q_ivfpq",
    "q_ann_recall",
]

#: round-12 heavy-family probe (--r12heavy; VERDICT r11 #1): the
#: top-10 most expensive headline bench paths.  At sf0.1 the published
#: walls are dominated by driver build + fixed AQE stage scheduling, so
#: the 8-core and 32-core bench sweeps coincide and the bench exerts no
#: optimization pressure on executor-side work; this probe re-times the
#: heavy families at x10 input (all five big tables, word-mutated docs,
#: rotated embeddings — the r5stats recipe) where executor work
#: dominates, and is meant to be run at BOTH core counts
#: (SPARK_GRAFT_CPUS=32 / =8 with --reuse) so core sensitivity is
#: measured where the executors actually feel it.  q_quantize_topk's
#: query set grows with the collection (|Q|x|C| ~ N^2 by contract —
#: the annx budget note); it stays in the set for the x10 record with
#: that caveat.
PROBE_R12HEAVY = [
    "q_ngram_jaccard",
    "q_skyline",
    "q_als",
    "q_dedup_minhash",
    "q_semdedup",
    "q_quantize_topk",
    "q_lr_train",
    "q_bloom_decontaminate",
    "q_rfm",
    "q_dsir",
    "q_apriori",
    "q_bigram_lm",
]


#: scored-pair ceiling for the annx probe's workload-bound members
#: (the vec_id%100==0-query family, whose |Q| grows with N).  Scored
#: pairs per member: quantize/pq = |Q|·(|C|-1) raw scans; ivfpq =
#: |Q|·|C|·(n_probe/n_cells) — the cell routing's 4x cut is visible
#: in which members survive which N.
ANN_PAIR_BUDGET = 100_000_000

def _ivfpq_pairs(nq: int, nc: int) -> int:
    """Derive ivfpq's scored-pair estimate from ivfpq_topk's OWN
    n_probe/n_cells defaults, so the budget decision cannot silently
    drift from the operator's routing ratio."""
    import inspect

    from shadems_spark.operators.similarity import ivfpq_topk

    p = inspect.signature(ivfpq_topk).parameters
    return nq * nc * p["n_probe"].default // p["n_cells"].default


#: scored-pair estimators for the workload-bound annx members, given
#: (n_queries, n_rows).
ANN_WORKLOAD_PAIRS = {
    "q_quantize_topk": lambda nq, nc: nq * (nc - 1),
    "q_pq_topk": lambda nq, nc: nq * (nc - 1),
    "q_ivfpq": _ivfpq_pairs,
}

#: key shift per copy — far above any real key at these scale factors.
SHIFT = 100_000_000


def build_scaled(
    spark, base_dir: str, out_dir: str, n: int,
    only: list[str] | None = None, mutate_docs: bool = False,
    mutate_embeddings: bool = False,
) -> None:
    """Materialize the xN fixture dir: fact tables unioned n times with
    shifted keys (so joins stay consistent copy-by-copy), dims copied
    through unchanged.  ``only`` restricts which tables get the xN
    treatment — the rest copy through 1x so the dir is a complete
    catalog (queries that register every view still run).
    ``mutate_docs`` suffixes every word of each non-zero copy with its
    copy index (see module docstring)."""
    shifted_keys = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey"],
        "events": ["event_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        df = load_table(spark, base_dir, name)
        if only is not None and name not in only:
            df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
            continue
        if name in shifted_keys:
            emb_dim = (
                len(df.first()["embedding"])
                if mutate_embeddings and name == "embeddings" else 0
            )
            copies = []
            for i in range(n):
                c = df
                for k in shifted_keys[name]:
                    c = c.withColumn(k, F.col(k) + F.lit(i * SHIFT))
                if mutate_embeddings and name == "embeddings" and i > 0:
                    # cyclic rotation by the copy index: cheap, exact,
                    # keeps norms/distribution, decorrelates copies.
                    dim = emb_dim
                    r = i % dim or 1
                    c = c.withColumn(
                        "embedding",
                        F.concat(
                            F.slice("embedding", r + 1, dim - r),
                            F.slice("embedding", 1, r),
                        ),
                    )
                if mutate_docs and name == "documents" and i > 0:
                    tag = F.lit(f"_{i}")
                    c = c.withColumn(
                        "text",
                        F.array_join(
                            F.transform(F.split("text", " "), lambda w: F.concat(w, tag)),
                            " ",
                        ),
                    )
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        else:
            out = df
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def ann_candidates(spark, sf_dir: str) -> dict:
    """Candidate-pair counts for the ANN family (VERDICT r10 #3): how
    many (query, candidate) pairs each index actually scores — the
    number that separates scan-bounded growth (lsh/ivf: candidates
    grow ~linearly because buckets/cells grow with the collection
    while |Q| stays 3) from workload-driven growth (brute/quantize:
    |Q|x|C| by definition).  Mirrors each query's exact construction:
    lsh_topk's 6x4 hyperplane tables, ivf_topk's xe sample + top-2
    probe."""
    from shadems_spark.operators import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    n_rows = emb.count()
    dim = SIM.embedding_dim(emb)
    out = {"rows": n_rows}
    base = emb.select(
        F.col("vec_id").alias("cand_id"), SIM.as_double("embedding").alias("v")
    )
    qb = (
        emb.filter(F.col("vec_id").isin(0, 1, 2))
        .select(F.col("vec_id").alias("q_id"), SIM.as_double("embedding").alias("qv"))
    )
    out["cosine_pairs"] = 3 * (n_rows - 1)
    nq = emb.filter(F.col("vec_id") % 100 == 0).count()
    out["quantize_queries"] = nq
    out["quantize_pairs"] = nq * (n_rows - 1)
    parts = []
    for t in range(6):
        cb = base.select(
            "cand_id",
            SIM.hyperplane_bucket(F.col("v"), 4, dim, seed=t * 4).alias("b"),
        )
        qq = qb.select(
            "q_id",
            SIM.hyperplane_bucket(F.col("qv"), 4, dim, seed=t * 4).alias("b"),
        )
        parts.append(
            cb.join(F.broadcast(qq), "b")
            .filter(F.col("cand_id") != F.col("q_id"))
            .select("q_id", "cand_id")
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    out["lsh_pairs_scored"] = allp.count()
    out["lsh_pairs_distinct"] = allp.distinct().count()
    cents = SIM.sample_centroids(emb, k=8, sampler="xe")
    assigned = SIM.ivf_assign(base, cents, vec="v").select("cand_id", "cell")
    probe_cols = [
        F.struct(
            SIM.cosine(F.col("qv"), F.array(*[F.lit(float(x)) for x in c])).alias(
                "cos"
            ),
            F.lit(i).alias("cell"),
        )
        for i, c in enumerate(cents)
    ]
    probes = (
        qb.withColumn(
            "__p",
            F.explode(F.slice(F.reverse(F.array_sort(F.array(*probe_cols))), 1, 2)),
        )
        .select("q_id", F.col("__p.cell").alias("cell"))
    )
    out["ivf_pairs"] = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("cand_id") != F.col("q_id"))
        .count()
    )
    return out


def _join_evidence(df) -> dict:
    """Walk the AQE-FINAL executed plan: join-strategy node counts +
    total spill (VERDICT r9 #4).  Requires the frame to have been
    executed via collect() on its OWN QueryExecution (count() builds a
    separate one whose metrics this walk would not see)."""
    acc = {"bhj": 0, "smj": 0, "shj": 0, "spill_bytes": 0}

    def walk(node):
        name = node.getClass().getSimpleName()
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "spillSize":
                # un-updated SQLMetrics sit at -1; never subtract
                acc["spill_bytes"] += max(kv._2().value(), 0)
        if name.startswith("BroadcastHashJoin"):
            acc["bhj"] += 1
        elif name.startswith("SortMergeJoin"):
            acc["smj"] += 1
        elif name.startswith("ShuffledHashJoin"):
            acc["shj"] += 1
        # joins/spill inside scalar or dynamic-pruning subqueries
        # would otherwise be invisible to the walk (ADVICE r10);
        # ReusedSubqueryExec wraps an already-walked subquery — skip
        # it or its metrics double-count
        sq = node.subqueries()
        for i in range(sq.size()):
            s = sq.apply(i)
            if not s.getClass().getSimpleName().startswith("ReusedSubquery"):
                walk(s)
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        elif name.endswith("QueryStageExec"):
            walk(node.plan())
        else:
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    acc["spill_mb"] = round(acc.pop("spill_bytes") / 1e6, 3)
    return acc


def run_probe(
    spark, registry, sf_dir: str, names: list[str], warm: str = "q_scan",
    join_detail: bool = False,
) -> dict[str, dict]:
    registry[warm][0](spark, sf_dir).count()  # warm footers
    out: dict[str, dict] = {}
    for name in names:
        fn, _sql = registry[name]
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if join_detail:
                # collect (results are k-row aggregates by design) so
                # the frame's own QueryExecution carries final metrics
                rows = len(df.collect())
                sec = round(time.time() - t0, 3)
                out[name] = {"sec": sec, "rows": rows, **_join_evidence(df)}
            else:
                rows = df.count()
                out[name] = {"sec": round(time.time() - t0, 3), "rows": rows}
        except OperatorRefusal as e:
            # a deliberate operator refusal (e.g. salted_join's
            # replicated-dim budget at xN) IS the scale result —
            # record it instead of killing the probe (r10: the x100
            # joins probe is exactly where such guards fire).  ONLY
            # the typed refusal in joins mode is tolerated: any other
            # ValueError (bad arg, shape mismatch) is a regression
            # the probe must fail loudly on (ADVICE r10).
            if not join_detail:
                raise
            out[name] = {"sec": None, "rows": None, "err": str(e)[:200]}
            print(f"{name}: REFUSED — {e}", file=sys.stderr)
    return out


def probe_semdedup(spark, sf_dir: str, n_clusters: int) -> dict:
    """One semdedup run at its k-rule setting (n/k fixed as the corpus
    grows — operators/similarity.py::semdedup's documented regime)."""
    from shadems_spark.catalog import load_table as lt
    from shadems_spark.operators import similarity as SIM

    t0 = time.time()
    rows = SIM.semdedup(
        lt(spark, sf_dir, "embeddings"), n_clusters=n_clusters, threshold=0.35
    ).count()
    return {"sec": round(time.time() - t0, 3), "rows": rows, "k": n_clusters}


def main() -> None:
    dedup = "--dedup" in sys.argv
    retrieval = "--retrieval" in sys.argv
    round3 = "--round3" in sys.argv
    round4 = "--round4" in sys.argv
    r4x100 = "--r4x100" in sys.argv
    round5 = "--round5" in sys.argv
    r5stats = "--r5stats" in sys.argv
    round6 = "--round6" in sys.argv
    r6b3 = "--r6b3" in sys.argv
    r6b4 = "--r6b4" in sys.argv
    round7 = "--round7" in sys.argv
    round8 = "--round8" in sys.argv
    raster = "--raster" in sys.argv
    round9 = "--round9" in sys.argv
    joins = "--joins" in sys.argv
    annx = "--annx" in sys.argv
    r12heavy = "--r12heavy" in sys.argv
    docs_only = dedup or retrieval
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(pos[0]) if pos else 10
    base = pos[1] if len(pos) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    suffix = (
        "_docs" if docs_only else "_r3" if round3 else "_r4" if round4
        else "_r4x100" if r4x100 else "_r5" if round5
        else "_r5stats" if r5stats else "_r6" if round6
        else "_r6b3" if r6b3 else "_r6b4" if r6b4
        else "_r7" if round7 else "_r8" if round8
        else "_raster" if raster else "_r9" if round9
        else "_joins" if joins else "_annx" if annx
        else "_r12heavy" if r12heavy else ""
    )
    scaled = os.path.join(repo, ".scratch", f"sfx{n}" + suffix)

    spark = get_spark("shadems-scale-probe")
    registry = load_registry()
    probe_set = (
        PROBE_DEDUP if dedup
        else PROBE_RETRIEVAL if retrieval
        else PROBE_R3 if round3
        else PROBE_R4 if round4
        else PROBE_R4X100 if r4x100
        else PROBE_R5 if round5
        else PROBE_R5STATS if r5stats
        else PROBE_R6 if round6
        else PROBE_R6B3 if r6b3
        else PROBE_R6B4 if r6b4
        else PROBE_R7 if round7
        else PROBE_R8 if round8
        else PROBE_RASTER if raster
        else PROBE_R9 if round9
        else PROBE_JOINS if joins
        else PROBE_ANN if annx
        else PROBE_R12HEAVY if r12heavy
        else PROBE
    )
    names = [q for q in probe_set if q in registry]
    warm = "q_dedup_exact" if (docs_only or round3) else "q_scan"

    t0 = time.time()
    # --reuse: accept a previously-built scaled dir ONLY if every
    # table landed (build_scaled writes table-by-table, so a crashed
    # build leaves a partial dir whose mixed scales would silently
    # corrupt the evidence).  The dir name encodes n + mode, so a
    # different-N leftover never matches this path.
    reuse = (
        "--reuse" in sys.argv
        and os.path.isdir(scaled)
        and all(
            os.path.exists(os.path.join(scaled, f"{t}.parquet/_SUCCESS"))
            for t in TABLES
        )
    )
    if reuse:
        print(f"reusing existing {scaled}", file=sys.stderr)
    else:
        build_scaled(
            spark, base, scaled, n,
            only=(
                ["documents"] if docs_only
                else ["documents", "events"] if round3
                else ["documents", "embeddings", "lineitem", "orders"]
                if r4x100
                else ["documents", "embeddings", "events"] if round5
                else ["documents", "embeddings", "events", "orders"]
                if round6
                else ["events", "orders"] if round7
                else ["documents", "events", "orders", "lineitem"] if round8
                else ["lineitem"] if raster
                else ["lineitem", "orders"] if joins
                else ["documents", "events", "embeddings"] if round9
                else ["embeddings"] if annx
                else [
                    "documents", "embeddings", "events", "orders", "lineitem"
                ]
                if r5stats or r6b3 or r6b4 or r12heavy
                else None
            ),
            mutate_docs=docs_only or round3 or r4x100 or round5 or r5stats
            or round8 or round9
            or r6b3 or r6b4 or r12heavy,
            mutate_embeddings=r4x100 or round5 or r5stats or r6b3 or r6b4
            or annx or r12heavy,
        )
    build_s = round(time.time() - t0, 1)

    scaled_names = names
    skipped: dict[str, str] = {}
    cand_evidence = None
    if annx:
        cand_evidence = {
            "base": ann_candidates(spark, base),
            "xN": ann_candidates(spark, scaled),
        }
        nq = cand_evidence["xN"]["quantize_queries"]
        nc = cand_evidence["xN"]["rows"]
        for q, est in ANN_WORKLOAD_PAIRS.items():
            pairs = est(nq, nc)
            if pairs > ANN_PAIR_BUDGET and q in scaled_names:
                scaled_names = [x for x in scaled_names if x != q]
                skipped[q] = (
                    "workload-bound: query set is vec_id%100==0 by "
                    f"contract, so ~{pairs:.2e} scored pairs at x{n} "
                    f"(|Q|={nq} x |C|={nc}) — the workload grows ~N^2 by "
                    "DEFINITION (query count scales with the collection, "
                    "not an engine bottleneck); see the smaller-N "
                    "measurement"
                )
                print(
                    f"{q}: SKIPPED at x{n} — {pairs:.2e} scored pairs "
                    "(workload-bound)", file=sys.stderr,
                )

    base_r = run_probe(spark, registry, base, names, warm, join_detail=joins)
    scaled_r = run_probe(
        spark, registry, scaled, scaled_names, warm, join_detail=joins
    )
    for q, why in skipped.items():
        scaled_r[q] = {"sec": None, "rows": None, "err": why}
    if r4x100:
        # semdedup under its k-rule: base k=8, scaled k=8*N (n/k fixed)
        base_r["q_semdedup_krule"] = probe_semdedup(spark, base, 8)
        scaled_r["q_semdedup_krule"] = probe_semdedup(spark, scaled, 8 * n)
        names = names + ["q_semdedup_krule"]

    report = {}
    for q in names:
        b, s = base_r[q], scaled_r[q]
        report[q] = {
            "base_sec": b["sec"],
            "xN_sec": s["sec"],
            "ratio": (
                round(s["sec"] / b["sec"], 2) if b["sec"] and s["sec"] else None
            ),
            "base_rows": b["rows"],
            "xN_rows": s["rows"],
        }
        for side, r in (("base", b), ("xN", s)):
            if r.get("err"):
                report[q][f"{side}_err"] = r["err"]
            elif joins:
                report[q][f"{side}_join"] = {
                    k: r[k] for k in ("bhj", "smj", "shj", "spill_mb")
                }
        if b.get("err") or s.get("err"):
            print(
                f"{q:24s} REFUSED: {s.get('err') or b.get('err')}",
                file=sys.stderr,
            )
            continue
        print(
            f"{q:24s} {b['sec']:7.2f}s -> {s['sec']:7.2f}s  "
            f"x{report[q]['ratio']:<6} rows {b['rows']} -> {s['rows']}"
            + (
                f"  join {b['bhj']}b/{b['smj']}m/{b['shj']}h "
                f"spill {b['spill_mb']} -> {s['bhj']}b/{s['smj']}m/"
                f"{s['shj']}h spill {s['spill_mb']}"
                if joins else ""
            ),
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": (
                    "scale_probe_r12heavy" if r12heavy
                    else "scale_probe_dedup" if dedup
                    else "scale_probe_retrieval" if retrieval
                    else "scale_probe_r4x100" if r4x100
                    else "scale_probe_r5" if round5
                    else "scale_probe_r5stats" if r5stats
                    else "scale_probe_joins" if joins
                    else "scale_probe_annx" if annx
                    else "scale_probe"
                ),
                "n": n,
                "base": base,
                "build_sec": build_s,
                "effective_parallelism": spark.sparkContext.defaultParallelism,
                "master": spark.sparkContext.master,
                "queries": report,
                **({"candidates": cand_evidence} if cand_evidence else {}),
            }
        )
    )
    # --reuse implies keep: deleting a fixture the caller explicitly
    # asked to reuse would defeat the next --reuse run.
    if "--keep" not in sys.argv and "--reuse" not in sys.argv:
        shutil.rmtree(scaled, ignore_errors=True)


if __name__ == "__main__":
    main()
