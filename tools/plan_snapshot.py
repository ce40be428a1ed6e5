"""Plan-signature snapshot: freeze each registered query's physical
plan SHAPE (shuffle exchanges, broadcast exchanges, sorts, windows)
into PLAN_SNAPSHOT.json so an unintended plan regression — a lost
broadcast that becomes a sort-merge join, a new shuffle sneaking into
a map-side pipeline, a window reappearing where a triangle join was
— fails tests/test_plan_snapshot.py loudly instead of shipping as a
silent 100-TB slowdown.

The per-query guardrails in tests/test_plans.py pin ABSOLUTE
properties (no CartesianProduct, no undocumented single-partition
windows, specific broadcasts on flagship queries); this snapshot pins
EVERYTHING ELSE by diff: any edit that changes any query's exchange
topology must either be intentional (re-run this tool with --update
and commit the diff, which makes the change reviewable) or is a bug.

Counts are of the INITIAL static plan (pre-AQE), built at sf0.001
under the test session (SPARK_GRAFT_CPUS=8) — the same environment
tests/test_plans.py uses, so signatures are deterministic.

Usage:
    python tools/plan_snapshot.py            # verify (exit 1 on drift)
    python tools/plan_snapshot.py --update   # rewrite PLAN_SNAPSHOT.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
SNAPSHOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLAN_SNAPSHOT.json",
)

#: queries whose plan TEXT is legitimately nondeterministic — excluded
#: from the snapshot (measured drifting across back-to-back fresh
#: sessions with identical code).  Keep this list justified and short:
#: an entry needs a mechanism, not just an observed flake.
VOLATILE: dict[str, str] = {
    # (q_dedup_clusters was here r3–r9: its builder executed
    # convergence sweeps and returned the nested AQE-FINAL lineage,
    # whose runtime-adaptive exchange topology varied 768-vs-810
    # shuffles run-to-run.  Fixed at the root in r10: the converged
    # labels are localCheckpointed on return — already materialized in
    # cache, so the checkpoint is a block copy — and the returned plan
    # is a deterministic RDD scan.  Exclusion list now EMPTY: 357/357
    # frozen.)
    # (the FDR pair was here briefly: tracked_persist's ASYNC unpersist
    # raced re-persists of identical plans, making InMemoryRelation
    # substitution — and so plan text — timing-dependent.  Fixed at the
    # root with unpersist(blocking=True); cache state per build step is
    # now deterministic and the pair freezes cleanly.)
}

#: plan-text markers counted into the signature.  "Exchange " prefixes
#: every shuffle flavor (hashpartitioning / rangepartitioning /
#: SinglePartition) but NOT BroadcastExchange; ReusedExchange counts
#: separately (a reuse turning into a recompute is also a regression).
MARKERS = {
    "shuffles": "Exchange ",
    "broadcasts": "BroadcastExchange ",
    "reused": "ReusedExchange ",
    "sorts": "Sort [",
    "windows": "Window [",
    "smj": "SortMergeJoin ",
}


def signature(plan: str) -> dict[str, int]:
    # every marker is LINE-ANCHORED after stripping tree art + codegen
    # ids — a ReusedExchange line embeds its child's full description
    # ("ReusedExchange [..], BroadcastExchange ...") and must not
    # double-count the child.
    flat = "\n" + "\n".join(
        line.lstrip(" +-:*()0123456789") for line in plan.splitlines()
    )
    return {k: flat.count("\n" + m) for k, m in MARKERS.items()}


def build(spark) -> dict[str, dict[str, int]]:
    from shadems_spark.queries import load_registry

    out = {}
    for q, (fn, _) in sorted(load_registry().items()):
        if q in VOLATILE:
            continue
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        out[q] = signature(plan)
    return out


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from shadems_spark.session import get_spark

    spark = get_spark("plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    current = build(spark)
    if "--update" in sys.argv:
        with open(SNAPSHOT, "w") as fh:
            json.dump(current, fh, indent=1, sort_keys=True)
        print(f"wrote {SNAPSHOT} ({len(current)} queries)")
        return
    with open(SNAPSHOT) as fh:
        frozen = json.load(fh)
    drift = {
        q: (frozen.get(q), sig)
        for q, sig in current.items()
        if frozen.get(q) != sig
    }
    gone = sorted(set(frozen) - set(current))
    for q, (old, new) in sorted(drift.items()):
        print(f"DRIFT {q}: {old} -> {new}")
    for q in gone:
        print(f"REMOVED {q} (still in snapshot)")
    if drift or gone:
        sys.exit(1)
    print(f"ok: {len(current)} plan signatures unchanged")


if __name__ == "__main__":
    main()
