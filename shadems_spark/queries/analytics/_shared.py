"""Analytical benchmark-shaped queries + facet engine + format
roundtrips: the rebuild's TPC-H-style checks over the star schema
(SURVEY.md §2 J5 context), exact percentiles, and the --iter-*
faceted-write pipeline.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.operators import raster as R
from shadems_spark.queries import register
from shadems_spark.queries.core import PRICE_RANGE, TIME_RANGE
from shadems_spark.sources import read_csv, write_partitioned
from shadems_spark.vis import vis_sql_from, vis_view



def _scratch_root() -> str:
    """Per-PROCESS scratch dir (.scratch/p<pid>): two concurrent
    harness processes (e.g. the default and local[3] oracle gates)
    must never rmtree/overwrite each other's sink fixtures mid-scan
    (observed: q_binary_ingest flake under concurrent gates).  Stale
    siblings from dead pids are best-effort reaped on import.

    Anchored on the shadems_spark PACKAGE parent (the repo/install
    root), not a fixed dirname() count — the round-9 analytics split
    moved this file one level deeper and a copied 3x dirname silently
    relocated the scratch root INSIDE the source package."""
    import shadems_spark

    base = os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.abspath(shadems_spark.__file__))
        ),
        ".scratch",
    )
    me = os.path.join(base, f"p{os.getpid()}")
    try:
        for d in os.listdir(base):
            if d.startswith("p") and d[1:].isdigit() and int(d[1:]) != os.getpid():
                try:
                    os.kill(int(d[1:]), 0)
                except ProcessLookupError:
                    import shutil

                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)
                except PermissionError:
                    pass
    except FileNotFoundError:
        pass
    return me


_SCRATCH = _scratch_root()


#: Poisson(1) CDF boundaries scaled to the u-hash modulus 1000003
#: (floor(CDF_k * 1000003) for k = 0..5; mass beyond 6 truncated,
#: ~1e-4): the weight lookup both engines replay in exact integers.
_POIS_T = [367880, 735761, 919701, 981014, 996343, 999408]


def _daily_grid(ev, x_name: str = "x", y_cast: str | None = None,
                keep_d0: bool = False):
    """Dense (event_type x calendar-day) grid of daily event counts
    with zero-filled gaps — the shared front end of the time-series
    family (burstiness / STL / Holt / backtest / Friedman / Hurst /
    burst-HMM).  Columns: event_type, ``x_name`` (0-based day index),
    ``y`` (count, optionally cast), plus ``d0`` when ``keep_d0``.

    Alias hygiene (VERDICT r6 'What's wrong' #1): the distinct-types
    frame derives from the same parent as the join's right side, so a
    naive ``types["event_type"] == d["event_type"]`` resolves BOTH
    sides to one attribute — a trivially-true conjunct that would
    silently turn into a partial cross product if the date conjunct
    were ever dropped.  Renaming the types side through a fresh
    ``__et`` attribute makes every join conjunct bind distinct
    attributes by construction (no `trivially true equals predicate`
    warning anywhere in the gate/bench tails).

    Scale: one (type, day)-key map-side aggregate is the only
    data-sized stage; the grid itself is types x days regardless of
    corpus size, and the 1-row bounds frame broadcasts."""
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    b = d.agg(
        F.min("day").alias("d0"),
        F.datediff(F.max("day"), F.min("day")).alias("span"),
    )
    types = d.select(F.col("event_type").alias("__et")).distinct()
    spine = b.select(
        F.explode(F.sequence(F.lit(0), F.col("span"))).alias(x_name), "d0"
    )
    y = F.coalesce("y", F.lit(0))
    if y_cast is not None:
        y = y.cast(y_cast)
    cols = [F.col("__et").alias("event_type"), F.col(x_name)]
    if keep_d0:
        cols.append(F.col("d0"))
    return (
        types.crossJoin(F.broadcast(spine))
        .join(
            d,
            (F.expr(f"date_add(d0, CAST({x_name} AS INT))") == F.col("day"))
            & (F.col("__et") == d["event_type"]),
            "left",
        )
        .select(*cols, y.alias("y"))
    )


def _ams_coeffs(n_est: int = 16) -> list[tuple[int, int, int, int]]:
    """4-wise-independent sign-hash coefficients (cubic over GF(p)),
    SplitMix64-derived so the Spark expressions and the generated
    DuckDB SQL embed the SAME literals (the xe protocol)."""
    from shadems_spark.operators.similarity import _splitmix64
    from shadems_spark.operators.text import FP_MOD

    out = []
    for r in range(n_est):
        a = _splitmix64(9100 + 4 * r) % (FP_MOD - 1) + 1
        b = _splitmix64(9101 + 4 * r) % FP_MOD
        c = _splitmix64(9102 + 4 * r) % FP_MOD
        d = _splitmix64(9103 + 4 * r) % FP_MOD
        out.append((a, b, c, d))
    return out


_CM_VARS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
#: per-variable integer units — correlation is scale-invariant, so each
#: variable picks the coarsest unit that keeps its SQUARED sum inside
#: int64 headroom: quantity is integral (x1), price in deci-dollars
#: (~1.1e6 -> squared sums < 2^63 through ~sf1; DECIMAL(38) beyond),
#: discount/tax in exact centi-units.
_CM_SCALE = [1, 10, 100, 100]


_HURST_WS = [8, 16, 32]


#: SPRT literals (H0: the type is p0 = 15% of daily traffic; H1: 25%),
#: nano-int logs precomputed in Python so BOTH engines fold pure
#: integers: per-success ln(p1/p0), per-failure ln((1-p1)/(1-p0)),
#: and the Wald boundaries ln(19), ln(1/19) at alpha = beta = 0.05.
_SPRT_LA = 510825624
_SPRT_LB = -125163143
_SPRT_UP = 2944438979
_SPRT_DN = -2944438979
