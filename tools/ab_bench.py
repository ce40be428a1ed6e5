"""Interleaved A/B micro-bench: time one query under several env-gated
code variants ALTERNATING within one session, so host-throughput drift
(the documented quiet-machine swing) cancels out of the comparison.

Usage:
    python tools/ab_bench.py q_rfm --reps 4 --variants \
        "A:SHADEMS_NO_SHARE=1" "B:" "C:SHADEMS_NO_SHARE=1,SHADEMS_EXP_QP=1"

Each variant is NAME:k=v,k=v (env set before the query BUILD — gates
must be read at build time).  Reports per-variant medians of reps 2+
(rep 1 of each variant absorbs codegen/cache warmup).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shadems_spark.queries import load_registry  # noqa: E402
from shadems_spark.session import get_spark  # noqa: E402


def _isolate(spark) -> None:
    from shadems_spark.operators.dedup import release_persist

    release_persist()
    spark.catalog.clearCache()
    try:
        for _rid, jrdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            jrdd.unpersist()
    except Exception:
        pass


def main() -> None:
    args = sys.argv[1:]
    reps = 4
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    variants: list[tuple[str, dict[str, str]]] = []
    if "--variants" in args:
        i = args.index("--variants")
        for spec in args[i + 1 :]:
            name, _, kvs = spec.partition(":")
            env = dict(kv.split("=", 1) for kv in kvs.split(",") if kv)
            variants.append((name, env))
        args = args[:i]
    names = args
    all_keys = {k for _, env in variants for k in env}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_registry()
    spark = get_spark("shadems-ab")
    registry["q_scan"][0](spark, sf_dir).count()  # warm
    _isolate(spark)
    walls: dict[tuple[str, str], list[float]] = {}
    for rep in range(reps):
        # alternate variant order per rep: the first variant of a pair
        # systematically pays residual warmup (page cache, JIT, shuffle
        # dirs) — measured ~0.2-0.3 s on sub-second queries (r12), large
        # enough to flip a verdict when the real delta is comparable.
        ordered = variants if rep % 2 == 0 else variants[::-1]
        for q in names:
            for vname, env in ordered:
                for k in all_keys:
                    os.environ.pop(k, None)
                os.environ.update(env)
                t0 = time.time()
                registry[q][0](spark, sf_dir).count()
                w = time.time() - t0
                walls.setdefault((q, vname), []).append(round(w, 3))
                _isolate(spark)
    for k in all_keys:
        os.environ.pop(k, None)
    for (q, vname), ws in walls.items():
        med = statistics.median(ws[1:] if len(ws) > 1 else ws)
        print(f"{q} [{vname}] median(post-warm)={med:.3f} runs={ws}")


if __name__ == "__main__":
    main()
