"""Warm per-query micro-bench: replicate bench.py's conditions (one
session, q_scan warm-up, count() execution) for a named subset of
queries, printing per-query [runs] + median and, with --jobs, the
Spark job count and in-job time per run (REST /api/v1 jobs endpoint,
grouped via setJobGroup) so driver-think time = wall - job time is
attributable (VERDICT r8 #3).

Usage: python tools/qbench.py q_rrf_fusion q_lr_train [--reps 3]
       [--sf /root/testdata/sf0.1] [--jobs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the jobs endpoint needs the UI server; session.py reads this env at
# builder time (get_spark is called lazily below, after this line).
os.environ.setdefault("SPARK_GRAFT_UI", "true")

from shadems_spark.queries import load_registry  # noqa: E402
from shadems_spark.session import get_spark  # noqa: E402


def _jobs_for_group(sc, group: str) -> list[dict]:
    """All completed jobs tagged with ``group`` via the local UI REST
    API (available in local mode; returns [] if the UI is disabled)."""
    try:
        base = sc.uiWebUrl  # e.g. http://host:4040
        app = sc.applicationId
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs",
                                    timeout=5) as fh:
            jobs = json.load(fh)
        return [j for j in jobs if j.get("jobGroup") == group]
    except Exception:
        return []


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 3
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    want_jobs = "--jobs" in args
    if want_jobs:
        args.remove("--jobs")
    names = args
    reg = load_registry()
    spark = get_spark("shadems-qbench")
    sc = spark.sparkContext
    reg["q_scan"][0](spark, sf_dir).count()
    seq = 0
    for name in names:
        fn, _sql = reg[name]
        walls: list[float] = []
        job_lines: list[str] = []
        for rep in range(reps):
            # seq keeps groups unique when a name repeats on the CLI
            # (same-name groups double-count jobs across blocks)
            group = f"{name}#{seq}"
            seq += 1
            sc.setJobGroup(group, name)
            t0 = time.time()
            fn(spark, sf_dir).count()
            wall = time.time() - t0
            sc.setJobGroup("", "")
            walls.append(wall)
            if want_jobs:
                jobs = _jobs_for_group(sc, group)
                jt = 0.0
                for j in jobs:
                    try:
                        sub = j["submissionTime"]
                        comp = j["completionTime"]
                        # GMT ISO strings; parse as epoch diff
                        from datetime import datetime
                        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                        jt += (datetime.strptime(comp, fmt)
                               - datetime.strptime(sub, fmt)).total_seconds()
                    except Exception:
                        pass
                job_lines.append(
                    f"jobs={len(jobs)} job_time={jt:.3f} "
                    f"think={wall - jt:.3f}"
                )
        med = statistics.median(walls)
        print(f"{name}: median={med:.3f} runs="
              f"{[round(w, 3) for w in walls]}")
        for ln in job_lines:
            print(f"  {ln}")
    load1 = os.getloadavg()[0]
    print(f"load1={load1:.2f}")


if __name__ == "__main__":
    main()
