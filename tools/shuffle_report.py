"""Measure per-query SHUFFLE cost (bytes, records, spills) from the
executed plan's SQLMetrics — the numeric evidence behind the
"minimize shuffles" design claims.  Walks the AQE-final physical plan
after running each headline query at the given sf dir and prints a
markdown table plus one JSON line.

Caveats: metrics cover the query's FINAL plan only — work done in
separate jobs during plan construction (codebook fits, PageRank
sweeps, persisted-table builds) is not attributed; broadcast
exchanges move dims, not the fact side, and are reported separately.

Usage: python tools/shuffle_report.py [sf_dir] > SHUFFLES.md
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shadems_spark.queries import load_registry  # noqa: E402
from shadems_spark.session import get_spark  # noqa: E402


def _metrics(node, out):
    name = node.getClass().getSimpleName()
    m = node.metrics()
    it = m.iterator()
    mm = {}
    while it.hasNext():
        kv = it.next()
        mm[kv._1()] = kv._2().value()
    out.append((name, mm))
    if name == "AdaptiveSparkPlanExec":
        _metrics(node.executedPlan(), out)
    elif name.endswith("QueryStageExec"):
        _metrics(node.plan(), out)
    else:
        ch = node.children()
        for i in range(ch.size()):
            _metrics(ch.apply(i), out)
    return out


def profile(df) -> dict:
    df.collect()
    nodes = _metrics(df._jdf.queryExecution().executedPlan(), [])
    shuffles = [mm for n, mm in nodes if n == "ShuffleExchangeExec"]
    bcasts = [mm for n, mm in nodes if n == "BroadcastExchangeExec"]
    scans = [mm for n, mm in nodes if n == "FileSourceScanExec"]
    spill = sum(mm.get("spillSize", 0) for _, mm in nodes)
    return {
        "exchanges": len(shuffles),
        "shuffle_mb": round(sum(m.get("dataSize", 0) for m in shuffles) / 1e6, 3),
        "shuffle_records": int(sum(m.get("recordsRead", 0) for m in shuffles)),
        "broadcasts": len(bcasts),
        "broadcast_mb": round(sum(m.get("dataSize", 0) for m in bcasts) / 1e6, 3),
        "scan_rows": int(sum(m.get("numOutputRows", 0) for m in scans)),
        "spill_mb": round(spill / 1e6, 3),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from bench import HEADLINE  # the bench headline set

    spark = get_spark("shuffle-report")
    reg = load_registry()
    rows = {}
    for q in HEADLINE:
        if q not in reg:
            continue
        try:
            rows[q] = profile(reg[q][0](spark, sf_dir))
        except Exception as e:  # streaming-only/etc: record and move on
            rows[q] = {"error": str(e)[:80]}
    print("# SHUFFLES — measured shuffle cost per headline query\n")
    print(f"sf_dir: {sf_dir} — see tools/shuffle_report.py for caveats.\n")
    print("| query | exchanges | shuffle MB | shuffled rows | broadcasts | bcast MB | scan rows | spill MB |")
    print("|---|---|---|---|---|---|---|---|")
    for q, r in rows.items():
        if "error" in r:
            print(f"| {q} | error: {r['error']} | | | | | | |")
            continue
        print(
            f"| {q} | {r['exchanges']} | {r['shuffle_mb']} | {r['shuffle_records']} "
            f"| {r['broadcasts']} | {r['broadcast_mb']} | {r['scan_rows']} | {r['spill_mb']} |"
        )
    print()
    print("```json")
    print(json.dumps({"metric": "shuffle_report", "sf_dir": sf_dir, "queries": rows}))
    print("```")


if __name__ == "__main__":
    main()
