"""Dump .explain("formatted") for named queries to plans/<round>/<q>_<tag>.txt
(round dir from $SHADEMS_PLANS_DIR, default r12).

Usage: python tools/explain_dump.py before q_rfm q_skyline ...
       python tools/explain_dump.py after  q_rfm

The judge checks plan claims against these committed files (the round
deliverable); built at the bench environment's sf (default sf0.1) so
the captured plan is the one the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shadems_spark.queries import load_registry  # noqa: E402
from shadems_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans",
    os.environ.get("SHADEMS_PLANS_DIR", "r12"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT, exist_ok=True)
    registry = load_registry()
    spark = get_spark("shadems-explain")
    for name in names:
        df = registry[name][0](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
