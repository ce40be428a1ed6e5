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


def grid_raster(
    df: DataFrame,
    combos: list[tuple[Column, Column, bool]],
    width: int,
    height: int,
    reduction: str = "count",
    value: Column | None = None,
    robust: bool = False,
    fixed: dict[str, float] | None = None,
):
    """Multi-plot grid as ONE extract ([R] main.py axis-list loop,
    SURVEY.md §4 axis-dedup): N (x, y) axis pairs rasterized from a
    SINGLE scan of the input.

    Each combo is (x Column, y Column, mirror) — ``mirror=True`` adds
    the conjugate (-x, -y) sample per row (the u/v symmetry fill), as
    an extra array element rather than a union, so the mirror costs no
    second scan either.  The per-row projection explodes into
    (p, xv, yv) samples; bounds come back from one N-row aggregate
    (driver-bounded: one row per plot), and the binning pass indexes
    per-combo ranges out of literal arrays — so the raster job's plan
    contains exactly ONE scan of the source regardless of grid size,
    and the shuffle stays ≤ N·W·H keys by construction.

    Returns (binned, ranges): ``binned`` has (p, by, bx, val) and
    ``ranges[p] = (xlo, xhi, ylo, yhi)``.
    """
    elems = []
    for i, (x, y, mirror) in enumerate(combos):
        xd, yd = x.cast("double"), y.cast("double")
        elems.append(
            F.struct(F.lit(i).alias("p"), xd.alias("xv"), yd.alias("yv"))
        )
        if mirror:
            elems.append(
                F.struct(
                    F.lit(i).alias("p"),
                    (-xd).alias("xv"), (-yd).alias("yv"),
                )
            )
    cols = [F.explode(F.array(*elems)).alias("e")]
    if value is not None:
        cols.append(value.cast("double").alias("av"))
    pts = df.select(*cols).select(
        "e.*", *(["av"] if value is not None else [])
    )
    finite = pts.filter(
        ~F.isnan("xv") & ~F.isnan("yv")
        & F.col("xv").isNotNull() & F.col("yv").isNotNull()
    )
    fixed = fixed or {}
    if robust:
        bounds = finite.groupBy("p").agg(
            F.percentile_approx("xv", 0.02, 10000).alias("xlo"),
            F.percentile_approx("xv", 0.98, 10000).alias("xhi"),
            F.percentile_approx("yv", 0.02, 10000).alias("ylo"),
            F.percentile_approx("yv", 0.98, 10000).alias("yhi"),
        )
    else:
        bounds = finite.groupBy("p").agg(
            F.min("xv").alias("xlo"), F.max("xv").alias("xhi"),
            F.min("yv").alias("ylo"), F.max("yv").alias("yhi"),
        )
    ranges: dict[int, tuple[float, float, float, float]] = {}
    for r in bounds.collect():
        ranges[int(r["p"])] = (
            fixed.get("xmin", r["xlo"]), fixed.get("xmax", r["xhi"]),
            fixed.get("ymin", r["ylo"]), fixed.get("ymax", r["yhi"]),
        )
    n = len(combos)

    def lits(idx: int) -> Column:
        # per-combo range literals indexed by p (combos with no finite
        # samples bin nothing: their filter below keeps zero rows)
        return F.element_at(
            F.array(*[
                F.lit(float(ranges.get(i, (0.0, 0.0, 0.0, 0.0))[idx]))
                for i in range(n)
            ]),
            F.col("p") + 1,
        )

    xlo, xhi, ylo, yhi = lits(0), lits(1), lits(2), lits(3)
    xspan = F.when(xhi > xlo, xhi - xlo).otherwise(F.lit(1.0))
    yspan = F.when(yhi > ylo, yhi - ylo).otherwise(F.lit(1.0))
    binned = (
        finite.filter(
            F.col("xv").between(xlo, xhi) & F.col("yv").between(ylo, yhi)
        )
        .withColumn(
            "bx",
            F.least(
                F.lit(width - 1).cast("long"),
                F.floor((F.col("xv") - xlo) / xspan * width),
            ),
        )
        .withColumn(
            "by",
            F.least(
                F.lit(height - 1).cast("long"),
                F.floor((F.col("yv") - ylo) / yspan * height),
            ),
        )
    )
    agg = REDUCTIONS[reduction](F.col("av") if value is not None else None)
    return (
        binned.groupBy("p", "by", "bx").agg(agg.alias("val")),
        ranges,
    )
