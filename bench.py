"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Self-adjudication (VERDICT r9 #1): the committed r8/r9 records were
load-contaminated and the single end-of-run loadavg sample could not
show it, so the artifact now adjudicates itself:
  * AMBIENT CPU is measured across every query execution (per rep):
    total busy jiffies from /proc/stat MINUS our own process tree's
    jiffies (this python + the JVM child), divided by the query wall —
    i.e. "how many foreign cores ran while this query ran".  load1
    cannot do this job: the bench's own 32 threads push load1 to ~2-4,
    so a load threshold flags quiet runs (measured: a fully quiet
    86.9 s sweep read load1 2.3 at exit purely from self-load).
    load1 is still sampled per query for context in the side artifact.
  * a query is FLAGGED when its [min, max] spread exceeds 3x with a
    >0.3 s absolute delta, or when ambient CPU exceeded ~1 foreign
    core during any of its reps.
  * flagged queries get ONE extra rep after the main sweep — the
    cheap honest re-run the judge had to do by hand in r8/r9.
  * PUBLISHED medians use CLEAN reps only (ambient <= the threshold)
    whenever at least one clean rep exists — the mechanized form of
    the judge's hand-computed "quiet median".  A transient 20-core
    burst during 2 of 3 reps (observed live while building this: a
    sweep read 112 s vs the quiet 87 s band) now pollutes nothing but
    the spread record.
  * the final driver line carries `"contaminated": true` when >10% of
    queries remain suspect after the re-run (NO clean rep at all, or
    published median still >2x the quiet minimum) — a marker the
    judge / driver can trust without forensics.

Isolation (VERDICT r9 #2): tracked persists + localCheckpoint blocks
from one query no longer squat in the block manager during the next —
every query boundary clears the cache and unpersists surviving RDDs,
so per-query walls are isolation-equivalent (q_als's ~0.6 s residency
overhang was the motivating case).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shadems_spark.queries import load_registry  # noqa: E402
from shadems_spark.session import get_spark  # noqa: E402

#: headline set — the queries whose wall time we publish.  Kept to the
#: representative heavy hitters per family; extended as families land.
HEADLINE = [
    "q_raster_count",
    "q_raster_count_cat",
    "q_minmax",
    "q_join_fact",
    "q_eq_hist",
    "q_tumbling",
    "q_session",
    "q_dedup_minhash",
    "q_cosine_topk",
    "q_ngram_jaccard",
    "q_salted_join",
    "q_skew_split",
    "q_curation",
    "q_ann_ivf",
    "q_decontaminate",
    "q_repetition",
    "q_domain_mix",
    "q_seq_pack",
    "q_tfidf",
    "q_bm25",
    "q_quantize_topk",
    "q_stream_join",
    "q_bucketed_join",
    # round-3 families
    "q_span_dedup",
    "q_unigram_lm",
    "q_sessionize",
    "q_funnel",
    "q_variant",
    # round-4 additions: the MS-adapter scan surface and the t-digest
    # percentile path (both cheap; comparability of the r1-r3 subset
    # is unaffected — the driver record keys timings per query).
    "q_ms_main",
    "q_latency_tdigest",
    "q_semdedup",
    "q_pipeline_e2e",
    "q_theta_sets",
    "q_ewma",
    "q_bigram_lm",
    "q_mmr",
    # round-5 additions: DSIR data selection and the distributed LR
    # trainer (both multi-job: their wall is dominated by fixed
    # per-job overhead at sf0.1, documented in BASELINE.md round 5).
    "q_dsir",
    "q_lr_train",
    # round-5 second batch: two-phase heavy hitters, one-plan NB
    # train+predict, winnowing fingerprints, bloom decontamination,
    # Poisson bootstrap — the new train/sketch/fingerprint surface.
    "q_heavy_hitters",
    "q_naive_bayes",
    "q_winnow",
    "q_bloom_decontaminate",
    "q_bootstrap_ci",
    "q_kl_drift",
    "q_backoff_lm",
    # round-5 closing statistics batch: drift (psi/ks), segmentation
    # (rfm), attribution, and the Benford audit — each a distinct
    # plan family (broadcast-array binning, customer ntile windows,
    # per-user IGNORE NULLS window, digit-string aggregate).
    "q_psi",
    "q_ks_test",
    "q_rfm",
    "q_attribution",
    "q_benford",
    # round-6 session additions: hybrid retrieval fusion, the
    # time-series decomposition/forecast pair, the skyline max-scan,
    # and the two data-driven attribution models (each a distinct
    # plan family: dual-ranker fusion join, grid windows + HOF fold,
    # two-phase exclusive max-scan, in-plan value-iteration /
    # coalition-zeta folds).
    "q_rrf_fusion",
    "q_stl_decompose",
    "q_holt",
    "q_skyline",
    "q_markov_attribution",
    "q_shapley_attribution",
    "q_als",
    "q_slice_finder",
    # round-6 third batch: statistics/mining/eval closure — each a
    # distinct plan family (contingency windows + broadcast totals,
    # one-pass k^2 sufficient stats, sweep-line islands, session
    # trigram TakeOrdered, basket self-join, wide-aggregate boosting
    # rounds with broadcast choice rows).
    "q_chisq",
    "q_corr_matrix",
    "q_interval_coverage",
    "q_path_analysis",
    "q_apriori",
    "q_adaboost_stumps",
    # round-6 closing additions: the in-plan nested-fold DP, the
    # cell-density clustering over the star components operator, the
    # bilinear join-delta maintenance and the Q17 decorrelation.
    "q_dtw",
    "q_grid_dbscan",
    "q_ivm_join",
    "q_small_qty_revenue",
    # second wave: HMM fold, Pareto on the two-phase scan, matched-
    # part index joins.
    "q_burst_hmm",
    "q_abc_analysis",
    "q_price_index",
    # round-7 additions: the Lorenz decile curve (two-phase
    # global_ntile family) and the integer-LLR SPRT monitor (calendar
    # window family) represent the 8-query statistics batch; the
    # other six are 1-row/k-row closed forms too cheap to move the
    # wall (q_welch/q_tost share one conditional aggregate).
    "q_lorenz",
    "q_sprt",
]

#: contamination thresholds (VERDICT r9 #1).  A query is suspect when
#: its spread ratio exceeds SPREAD_RATIO with an absolute delta above
#: SPREAD_FLOOR seconds (the floor keeps trivial 50-vs-200 ms queries
#: out), or when more than AMBIENT_CORES foreign cores were measured
#: busy during a rep (self-load excluded — see module docstring).
SPREAD_RATIO = 3.0
SPREAD_FLOOR = 0.3
AMBIENT_CORES = 1.0
#: the run is CONTAMINATED when more than this fraction of queries
#: remain flagged after the one-shot re-run.
CONTAM_FRAC = 0.10

_HZ = os.sysconf("SC_CLK_TCK") or 100


def _clean_walls(walls: list[float], ambients: list[float]) -> list[float]:
    """Walls of reps measured with <= AMBIENT_CORES of foreign CPU —
    the samples a quiet machine would have produced."""
    return [w for w, a in zip(walls, ambients) if a <= AMBIENT_CORES]


def _published(walls: list[float], ambients: list[float]) -> float:
    """The per-query number the driver line publishes: median of the
    CLEAN reps when any exist, else of everything (a query with zero
    clean reps stays suspect — see _is_suspect(final=True))."""
    cw = _clean_walls(walls, ambients)
    return statistics.median(cw if cw else walls)


def _is_suspect(
    walls: list[float], ambients: list[float], final: bool = False
) -> bool:
    """final=False: ANY spike (max/min or median/min) or measured
    foreign-CPU interference triggers the re-run.  final=True: only a
    query with NO clean rep at all, or whose PUBLISHED (clean-rep)
    median is still elevated (median > 2x min with >SPREAD_FLOOR
    delta — a lone spike cannot hold a median up) stays flagged;
    these decide `contaminated`.

    The re-run trigger is a SUPERSET of the final criterion: anything
    that could decide `contaminated` must first have received its
    exonerating extra rep (walls [1.0, 2.5, 2.6] trip median>2x but
    not max>3x — without the median clause in the initial pass such a
    query would be condemned unmeasured).  Pure function: pinned in
    tests/test_bench_adjudication.py against the scenarios observed
    live in round 10."""
    lo = min(walls)
    if final:
        med = _published(walls, ambients)
        wide = med > 2.0 * lo and med - lo > SPREAD_FLOOR
        hot = not _clean_walls(walls, ambients)
    else:
        hi = max(walls)
        med = statistics.median(walls)
        wide = len(walls) > 1 and (
            (hi > SPREAD_RATIO * lo and hi - lo > SPREAD_FLOOR)
            or (med > 2.0 * lo and med - lo > SPREAD_FLOOR)
        )
        hot = any(v > AMBIENT_CORES for v in ambients)
    return wide or hot


def _load1() -> float | None:
    try:
        return os.getloadavg()[0]
    except OSError:  # pragma: no cover - getloadavg always works on linux
        return None


def _cpu_jiffies() -> tuple[int, int]:
    """(total busy jiffies across all cpus, our process TREE's
    jiffies).  The tree walk matters: the Spark JVM is a child of this
    python, and its utime/stime already aggregate all 32 executor
    threads."""
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    # busy = everything except idle (f[4]) and iowait (f[5]); guest
    # and guest_nice (f[9], f[10]) are ALREADY folded into user/nice
    # by the kernel, so counting them again would double-bill VM time
    # and falsely flag quiet reps on a VM host (ADVICE r10)
    busy = sum(int(x) for x in f[1:]) - int(f[4]) - int(f[5])
    if len(f) > 10:
        busy -= int(f[9]) + int(f[10])
    me = os.getpid()
    kids: dict[int, list[int]] = {}
    stats: dict[int, int] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                rest = fh.read().rsplit(") ", 1)[1].split(" ")
        except (OSError, IndexError):
            continue
        # after the comm field: state ppid ... utime(11) stime(12)
        # cutime(13) cstime(14).  cutime/cstime matter: a pyspark UDF
        # worker that exits mid-rep moves its jiffies into its reaper's
        # cutime — without them (ours1-ours0) drops while busy keeps
        # the work, inflating "ambient" on a quiet box.  Live children
        # are counted once via their own utime/stime (a child enters
        # cutime only AFTER it is reaped), so there is no double count.
        ppid = int(rest[1])
        stats[int(pid)] = (
            int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        )
        kids.setdefault(ppid, []).append(int(pid))
    ours, stack = 0, [me]
    while stack:
        p = stack.pop()
        ours += stats.get(p, 0)
        stack.extend(kids.get(p, ()))
    return busy, ours


def _isolate(spark) -> None:
    """Query-boundary isolation (VERDICT r9 #2): drop every cached
    DataFrame and unpersist surviving RDD blocks (localCheckpoints
    from iterative builds) so the next query's wall does not pay or
    profit from this one's block-manager residency."""
    try:
        from shadems_spark.operators.dedup import release_persist

        release_persist()  # drain the tracked-persist registry first
    except Exception:  # pragma: no cover - import always succeeds
        pass
    try:
        spark.catalog.clearCache()
    except Exception:  # pragma: no cover - catalog always present
        pass
    try:
        # localCheckpoint blocks live as persistent RDDs outside the
        # catalog; py4j's JavaMap is dict-like.
        for _rid, jrdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            jrdd.unpersist()
    except Exception:  # pragma: no cover - private API, best-effort
        pass


def _timed(spark, sc, fn, sf_dir, group, name):
    """One measured execution: returns
    (wall_sec, job_count, max_load1, ambient_foreign_cores)."""
    lo = _load1()
    busy0, ours0 = _cpu_jiffies()
    sc.setJobGroup(group, name)
    t0 = time.time()
    df = fn(spark, sf_dir)
    n = df.count()  # full execution; result sizes small by design
    wall = time.time() - t0
    sc.setJobGroup("", "")
    assert n >= 0
    busy1, ours1 = _cpu_jiffies()
    hi = _load1()
    samples = [v for v in (lo, hi) if v is not None]
    load = max(samples) if samples else None
    # foreign cores busy while the query ran (never negative: jiffy
    # sampling races can land a hair under zero)
    ambient = max(0.0, ((busy1 - busy0) - (ours1 - ours0)) / _HZ / wall)
    try:
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    except Exception:  # pragma: no cover - tracker always local
        jobs = None
    _isolate(spark)
    return wall, jobs, load, ambient


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # --median-of N (VERDICT r5 #7 / r6 #7): run the headline set N
    # times and publish per-query MEDIANS plus the min/max spread, so
    # the ±30-50% ambient host swing stops dominating round-over-round
    # comparison.  DEFAULT 3 — the driver's plain `python bench.py`
    # now records medians; pass `--median-of 1` for a quick single
    # pass while iterating.
    reps = 3
    if "--median-of" in sys.argv:
        reps = max(1, int(sys.argv[sys.argv.index("--median-of") + 1]))
    registry = load_registry()
    names = [n for n in HEADLINE if n in registry]
    spark = get_spark("shadems-bench")
    sc = spark.sparkContext
    # warm the JVM + parquet footers once so timings reflect the query,
    # not session bootstrap.
    registry["q_scan"][0](spark, sf_dir).count()
    _isolate(spark)
    per_q: dict[str, list[float]] = {n: [] for n in names}
    jobs_per_q: dict[str, list[int]] = {n: [] for n in names}
    loads_per_q: dict[str, list[float]] = {n: [] for n in names}
    amb_per_q: dict[str, list[float]] = {n: [] for n in names}
    t_all = time.time()
    for rep in range(reps):
        for name in names:
            wall, jobs, load, amb = _timed(
                spark, sc, registry[name][0], sf_dir, f"{name}#r{rep}", name
            )
            per_q[name].append(wall)
            amb_per_q[name].append(amb)
            if jobs is not None:
                jobs_per_q[name].append(jobs)
            if load is not None:
                loads_per_q[name].append(load)
    # raw sweep wall (includes isolation work + any interference the
    # clean-median logic filters out of the per-query record) — kept
    # in the side artifact as `sweep_sec`; the published `value` is
    # the SUM OF PUBLISHED MEDIANS, so the headline number and the
    # per-query record can never contradict each other (observed
    # while building: a 108 s sweep whose clean medians summed 76 s).
    sweep = round((time.time() - t_all) / reps, 3)

    def clean_walls(n: str) -> list[float]:
        return _clean_walls(per_q[n], amb_per_q[n])

    def published(n: str) -> float:
        return _published(per_q[n], amb_per_q[n])

    def suspects(final: bool = False) -> list[str]:
        return [
            n
            for n in names
            if _is_suspect(per_q[n], amb_per_q[n], final=final)
        ]

    # one-shot quiet re-run of flagged queries (VERDICT r9 #1): an
    # extra rep folds into the median, shrinking a one-off spike's
    # leverage from 1-of-3 samples to 1-of-4.
    flagged = suspects() if reps > 1 else []
    for name in flagged:
        wall, jobs, load, amb = _timed(
            spark, sc, registry[name][0], sf_dir, f"{name}#rerun", name
        )
        per_q[name].append(wall)
        amb_per_q[name].append(amb)
        if jobs is not None:
            jobs_per_q[name].append(jobs)
        if load is not None:
            loads_per_q[name].append(load)
    if reps > 1:
        still = suspects(final=True)
    else:
        # --median-of 1: no spread and no re-run budget, but the
        # ambient evidence still exists — a single-rep record taken
        # against >1 foreign core per query must not publish
        # contaminated=false (the r8/r9 failure mode verbatim).
        still = [n for n in names if not clean_walls(n)]
    contaminated = len(still) > CONTAM_FRAC * len(names)

    # 2dp in the compact driver line (10 ms precision suffices for the
    # headline medians and buys ~70 bytes of tail-capture margin);
    # full 3dp values live in the spread side artifact.  Medians are
    # over CLEAN reps when any exist (see module docstring).
    timings = {n: round(published(n), 2) for n in names}
    # host-load attribution: end-of-run loadavg snapshot for context;
    # the per-query samples in the side artifact are the real evidence.
    # `cpus` is the EFFECTIVE parallelism of this run (VERDICT r11 #1:
    # os.cpu_count() printed 32 in the driver's 8-core sweep, feeding
    # the false `suspect_cpus_ignored` alarm); the master string makes
    # the core count the bench actually honored auditable, and the
    # box's physical count moves to the side artifact.
    host: dict[str, object] = {
        "cpus": sc.defaultParallelism,
        "master": sc.master,
    }
    try:
        load1, load5, load15 = os.getloadavg()
        host.update(
            load1=round(load1, 2),
            load5=round(load5, 2),
            load15=round(load15, 2),
        )
    except OSError:  # pragma: no cover
        pass
    try:
        running = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as fh:
                    if fh.read().rsplit(") ", 1)[1].split(" ", 1)[0] == "R":
                        running += 1
            except OSError:
                continue
        host["n_running_procs"] = running
    except OSError:  # pragma: no cover
        pass
    # The driver captures only a ~2 KB TAIL of stdout and parses the
    # final JSON line; round 7's spread-enriched single line outgrew
    # that window and BENCH_r07.json recorded "parsed": null (VERDICT
    # r7 #2).  Keep the LAST stdout line compact — per-query medians
    # only — and emit the [min, max] spread, per-rep job counts
    # (ADVICE r9: a list, not the nondeterministic last rep), and
    # per-query max-load samples as an EARLIER stdout line plus a
    # committed side artifact (BENCH_SPREAD.json).
    out = {
        "metric": "headline_queries_wall",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "host": host,
        "contaminated": contaminated,
    }
    if reps > 1:
        out["median_of"] = reps
        side = {
            "median_of": reps,
            "sf": float(sf),
            "sweep_sec": sweep,
            "os_cpus": os.cpu_count(),
            "effective_parallelism": sc.defaultParallelism,
            "master": sc.master,
            "spread": {
                n: [round(min(per_q[n]), 3), round(max(per_q[n]), 3)]
                for n in names
            },
            "jobs": jobs_per_q,
            "load1_max": {
                n: round(max(v), 2) for n, v in loads_per_q.items() if v
            },
            "ambient_cores_max": {
                n: round(max(v), 2) for n, v in amb_per_q.items() if v
            },
            "clean_reps": {n: len(clean_walls(n)) for n in names},
            "flagged": flagged,
            "flagged_after_rerun": still,
            "contaminated": contaminated,
        }
        print(json.dumps(side))
        try:
            with open(
                os.path.join(os.path.dirname(__file__), "BENCH_SPREAD.json"),
                "w",
            ) as fh:
                json.dump(side, fh, indent=1)
        except OSError:  # pragma: no cover - repo dir is writable
            pass
    line = json.dumps(out)
    # the driver captures only ~2 KB of stdout tail and parses the
    # LAST line (BENCH_r07 was lost to an oversized line — VERDICT r7
    # #2); warn loudly while there is still headroom so growth of the
    # headline set is caught in-session, not in the round record
    # (VERDICT r8 #7).
    if len(line) > 1900:  # pragma: no cover - guarded by set size
        print(
            f"WARNING: bench line {len(line)} B exceeds the 1.9 KB "
            "guard (driver tail capture ~2 KB) — trim the headline "
            "set or precision",
            file=sys.stderr,
        )
    print(f"bench line bytes: {len(line)}", file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
