"""Full-registry plan-signature freeze (tools/plan_snapshot.py).

The targeted pins in test_plans.py assert absolute plan properties on
flagship queries; this test pins EVERY query's exchange topology by
diff against the committed PLAN_SNAPSHOT.json.  An edit that changes
any query's shuffle/broadcast/sort/window count must be intentional:
verify the new plan is the one you want, then
`python tools/plan_snapshot.py --update` and commit the diff — which
makes the plan change reviewable history instead of a silent
regression (a broadcast degrading to SortMergeJoin, a shuffle
sneaking into a map-side pipeline, a window replacing a triangle
join)."""

from __future__ import annotations

import json

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import plan_snapshot  # noqa: E402


def test_plan_signatures_frozen(spark):
    # start from the tool's baseline: a fresh session has ZERO cached
    # frames, and cache state shifts plan text (InMemoryRelation
    # substitution into matching subtrees).  Clear whatever earlier
    # test modules left behind so the build pass accumulates exactly
    # the caches the tool's pass does, in the same order.
    from shadems_spark.operators.dedup import release_persist

    release_persist()
    spark.catalog.clearCache()
    with open(plan_snapshot.SNAPSHOT) as fh:
        frozen = json.load(fh)
    current = plan_snapshot.build(spark)
    drift = {
        q: {"frozen": frozen.get(q), "current": sig}
        for q, sig in current.items()
        if frozen.get(q) != sig
    }
    gone = sorted(set(frozen) - set(current))
    assert not drift and not gone, (
        "plan signatures drifted — if intentional, re-run "
        "`python tools/plan_snapshot.py --update` and commit:\n"
        + json.dumps(drift, indent=1, sort_keys=True)
        + ("\nremoved: " + ", ".join(gone) if gone else "")
    )
