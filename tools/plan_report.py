"""Emit PLANS.md: formatted physical plans of representative queries
with the scale property each plan is supposed to exhibit — the
".explain and iterate" record.  Regenerate after plan-affecting
changes: python tools/plan_report.py > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shadems_spark.queries import load_registry  # noqa: E402
from shadems_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

#: (qname, what to look for in the plan)
SHOWCASE = [
    ("q_scan", "PushedFilters + ReadSchema pruning reach the parquet scan"),
    ("q_raster_count", "partial_count before the exchange — shuffle is O(W*H), not O(rows)"),
    ("q_join_dim", "three BroadcastHashJoins, zero SortMergeJoin — the fact side never shuffles for dims"),
    ("q_cosine_topk", "BroadcastNestedLoopJoin (query set broadcast) + single rank window — one scan of the corpus"),
    ("q_dedup_minhash", "banded signature agg with map-side combine; bucket join, never all-pairs"),
    ("q_semdedup", "broadcast centroid assignment; cached assignment table (InMemoryTableScan) feeds pair scan + anti-join"),
    ("q_mmr", "exactly one FlatMapCoGroupsInPandas — the greedy re-rank is a single Arrow stage"),
    ("q_pipeline_e2e", "two hash exchanges total: dedup window + final agg; Gopher gate fused into the scan"),
    ("q_stream_enrich", "BroadcastHashJoin only — stream side never shuffles for the dim"),
    ("q_bucketed_join", "SortMergeJoin with NO Exchange on either side (bucketed layout)"),
    ("q_zorder", "Morton bit-interleave as pure integer projections over the partial-agg raster"),
    ("q_cdc_chunk", "content-defined chunking: one doc_id-keyed shuffle carries boundary sums and chunk reassembly"),
    ("q_theta_sets", "sketch aggregates: per-type theta sketches merged without re-touching raw data"),
    # round-5 additions
    ("q_heavy_hitters", "MapInPandas candidate scan (no full-vocab aggregate) -> broadcast semi-join prune -> exact recount"),
    ("q_winnow", "fingerprint selection behind a projection boundary — ONE char-fold in the plan, no pushed fused-expression scan filter"),
    ("q_bloom_decontaminate", "two broadcast joins: the m-bit filter and the diagnostic bench-gram set; corpus side never shuffles for the probe"),
    ("q_bootstrap_ci", "x32 replicate expansion BEFORE partial_sum — 32 rows/partition shuffle, no join"),
    # round-6 session additions
    ("q_skyline", "broadcast-only dominance pre-prune (map-side bucket prefix-max) cuts the scan to staircase candidates BEFORE any exchange; the two-phase exclusive max-scan then shuffles survivors only — shuffled rows ~ candidates, not ~ 2x corpus"),
    ("q_rrf_fusion", "both rankers end candidate-bounded (TakeOrderedAndProject / broadcast-query scan) before the full-outer fusion join — the rank window sees <= 40 rows"),
    ("q_markov_attribution", "per-user windows are the only data-sized stages; all 12x5 value-iteration sweeps live in ONE projection over a single collected matrix row (no per-iteration exchanges)"),
    ("q_shapley_attribution", "coalition zeta-sums and Shapley folds as HOF expressions over one mask-aggregate row; journeys/touch-sets are the only keyed shuffles"),
    ("q_slice_finder", "ONE Aggregate over an Expand (6 grouping sets, map-side combined); persisted slice table (InMemoryTableScan) feeds totals without re-scanning the corpus"),
    ("q_als", "4 half-sweeps alternate broadcast-join + map-side-combined aggregates over ONE persisted pair matrix; factors never collect to the driver"),
    ("q_corr_matrix", "ONE scan -> one 1-row reduce carrying k + k(k+1)/2 integer sums; the 16-cell matrix unpivots from that row (no joins, no windows)"),
    ("q_apriori", "pair self-join keyed on the basket only; min-support HAVING prunes BEFORE the broadcast item-total joins; top-25 is TakeOrderedAndProject"),
    ("q_adaboost_stumps", "3 training rounds = 3 wide conditional aggregates over one InMemoryTableScan of the feature table; chosen stumps re-enter as 1-row broadcasts (BroadcastNestedLoopJoin)"),
    ("q_pr_auc", "descending-score prefix sums ride hashpartitioning(__b...) — the two-phase value-cut scan; the scored rows persist so sibling branches reuse one HOF scoring pass"),
    ("q_dtw", "the O(n*m) DP is a nested HOF fold inside a single projection — |types|^2 rows of constant work after the (type, week) map-side aggregate"),
    ("q_grid_dbscan", "projection scan + (cx, cy) map-side aggregate is the ONLY data-sized work; components/border joins run on the grid-bounded cell table"),
    ("q_ivm_join", "three delta-term joins each bounded by a change batch; the snapshot merge is a group-keyed full-outer join — maintenance never re-executes base x base"),
    ("q_small_qty_revenue", "Q17 decorrelated: exactly two lineitem scans (per-part aggregate + fact join-back), integer cross-product predicate, no correlated re-scan"),
    # round-7 additions
    ("q_welch", "ONE conditional aggregate carries all six sufficient statistics (partial_sum before the single exchange); t/df/p are a 1-row projection — no second scan, no window"),
    ("q_lorenz", "decile assignment rides the two-phase global_ntile (hashpartitioning value-cut buckets); the 10-row cumsum is a broadcast triangle join — NO WindowExec anywhere in the plan"),
    ("q_sprt", "per-type calendar windows over day-aggregates (partitionBy event_type) — integer LLR cumsum; daily totals re-enter as a broadcast join, the corpus shuffles once into (day, type) cells"),
]


def main() -> None:
    spark = get_spark("plan-report")
    reg = load_registry()
    print("# PLANS — physical-plan showcase\n")
    print(
        "Generated by `tools/plan_report.py` at sf0.001 (plan SHAPE is\n"
        "scale-free; sizes/stats change with data, operators do not —\n"
        "AQE may further coalesce at runtime).  Each section states the\n"
        "scale property the plan must exhibit; `tests/test_plans.py`\n"
        "pins these shapes so regressions fail CI, not review.\n"
    )
    for q, why in SHOWCASE:
        if q not in reg:
            continue
        df = reg[q][0](spark, SF)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        print(f"## {q}\n\n**Property:** {why}\n")
        print("```")
        print(plan.strip())
        print("```\n")


if __name__ == "__main__":
    main()
