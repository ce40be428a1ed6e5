"""Count py4j gateway round-trips per query BUILD (r11/r12 exprcache
evidence; guide §7.3 — driver/planning overhead).

Each Column/DataFrame method call crosses the py4j socket once
(~0.3 ms); deep fragment construction makes thousands of crossings per
build, and the bench re-builds every query each rep.  This tool counts
`ClientServerConnection.send_command` invocations during the build
call alone (jobs a builder runs — sanctioned collects — are included,
which is why build wall is printed alongside: a high count with low
wall is pure construction latency).

Two builds are timed per query: build#0 populates the expression memo
(cold), build#1 shows the steady-state cost every later bench rep and
driver invocation pays.

Usage: python tools/py4j_count.py q_psi q_apriori [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shadems_spark.queries import load_registry  # noqa: E402
from shadems_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    registry = load_registry()
    spark = get_spark("shadems-py4j-count")

    from py4j.clientserver import ClientServerConnection

    orig = ClientServerConnection.send_command
    box = {"n": 0}

    def counted(self, *a, **k):
        box["n"] += 1
        return orig(self, *a, **k)

    ClientServerConnection.send_command = counted
    registry["q_scan"][0](spark, sf_dir)  # warm imports/footers
    for name in names:
        for rep in range(2):
            box["n"] = 0
            t0 = time.time()
            registry[name][0](spark, sf_dir)
            wall = time.time() - t0
            print(
                f"{name} build#{rep}: {box['n']:6d} py4j calls"
                f"  {wall:6.3f}s build wall"
            )


if __name__ == "__main__":
    main()
