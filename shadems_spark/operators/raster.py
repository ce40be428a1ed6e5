"""2-D binned aggregation — the datashader-canvas analogue.

The reference's physical aggregation engine is datashader's
``Canvas(W, H, x_range, y_range).points(ddf, x, y, agg=...)``:
per-partition numba-compiled binned partial aggregates, tree-combined
([R] shade_ms/data_plots.py::create_plot ≈L60-260; SURVEY.md §3.3).
That is exactly Spark's partial/final hash aggregate, so the whole
raster layer is groupBy over computed bin keys — no UDFs, no custom
partitioning.  The shuffle is inherently tiny: ≤ W·H·ncat keys
regardless of input size, which is why this plan scales to 100 TB by
construction (SURVEY.md §4).

Bin semantics (must match the oracle SQL exactly — SURVEY.md §7
risks): half-open bins, out-of-range rows dropped, the max value
clamped into the last bin:

    bx = least(W-1, floor((x - lo) / (hi - lo) * W))   for lo<=x<=hi
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: reduction name -> aggregate builder over a value column (G2-G5).
#: datashader's std is population std -> stddev_pop.
REDUCTIONS = {
    "count": lambda v: F.count(F.lit(1)),
    "sum": lambda v: F.sum(v),
    "mean": lambda v: F.avg(v),
    "min": lambda v: F.min(v),
    "max": lambda v: F.max(v),
    "std": lambda v: F.stddev_pop(v),
    # r4: the rest of datashader's order-free reduction set ([R]
    # ds.reductions; shadeMS --ared).  var is population variance like
    # std; any marks pixel occupancy (1 where any non-null sample
    # landed).  first/last/mode are deliberately absent: they depend
    # on row order, which a distributed scan does not define.
    "var": lambda v: F.var_pop(v),
    "any": lambda v: F.max(F.when(v.isNotNull(), 1).otherwise(0)),
}


def bin_axis(col: Column, lo: float, hi: float, n: int) -> Column:
    """G1: pixel index of ``col`` on an n-bin axis over [lo, hi]."""
    return F.least(F.lit(n - 1).cast("long"), F.floor((col - lo) / (hi - lo) * n))


def bin_axis_sql(expr: str, lo: float, hi: float, n: int) -> str:
    """The formula-identical DuckDB fragment for :func:`bin_axis`."""
    return (
        f"least(CAST({n - 1} AS BIGINT), "
        f"CAST(FLOOR(({expr} - {lo!r}) / ({hi!r} - {lo!r}) * {n}) AS BIGINT))"
    )


def clip(df: DataFrame, col: Column, lo: float, hi: float) -> DataFrame:
    """F7 range clipping: rows outside [lo, hi] fall off the canvas."""
    return df.filter(col.between(F.lit(lo), F.lit(hi)))


def minmax(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """G6: the batched bounds pre-pass ([R] data_plots.py::
    compute_bounds) — ONE job computing every unknown limit."""
    aggs = []
    for name, c in cols.items():
        aggs.append(F.min(c).alias(f"{name}_min"))
        aggs.append(F.max(c).alias(f"{name}_max"))
    return df.agg(*aggs)


def robust_bounds(
    df: DataFrame, cols: dict[str, Column], q: float = 0.02
) -> DataFrame:
    """Robust-limits mode (SURVEY.md §4 optional extension): axis
    bounds from the [q, 1-q] quantiles instead of min/max, so a single
    cosmic-ray sample can't stretch the canvas to uselessness.

    Same single-job batched shape as :func:`minmax` —
    percentile_approx is a mergeable sketch (partial/final aggregate),
    so the pass stays one scan + O(sketch) shuffle at any input size;
    exact percentile would need a full sort per axis."""
    aggs = []
    for name, c in cols.items():
        aggs.append(F.percentile_approx(c, q, 10000).alias(f"{name}_min"))
        aggs.append(F.percentile_approx(c, 1.0 - q, 10000).alias(f"{name}_max"))
    return df.agg(*aggs)


def raster(
    df: DataFrame,
    x: Column,
    y: Column,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    width: int,
    height: int,
    reduction: str = "count",
    value: Column | None = None,
    category: Column | None = None,
) -> DataFrame:
    """G1-G5: the canvas aggregation as a single groupBy plan.

    Returns the binned table (bx, by[, cat], val) ordered by bin —
    the engine's raster result; rendering is a thin driver-side
    consumer (SURVEY.md §1.2 PNG-sink row).
    """
    (xlo, xhi), (ylo, yhi) = x_range, y_range
    binned = (
        clip(clip(df, x, xlo, xhi), y, ylo, yhi)
        .withColumn("bx", bin_axis(x, xlo, xhi, width))
        .withColumn("by", bin_axis(y, ylo, yhi, height))
    )
    keys = ["by", "bx"] + (["cat"] if category is not None else [])
    if category is not None:
        binned = binned.withColumn("cat", category)
    agg = REDUCTIONS[reduction](value).alias("val")
    return binned.groupBy(*keys).agg(agg).orderBy(*keys)
