"""The shadeMS plot lifecycle as a two-job Spark plan.

Mirrors [R] shade_ms/main.py + data_plots.py (SURVEY.md §3.1): axis
registration -> selection -> (job 1) batched min/max bounds pass when
limits are unset ([R] compute_bounds) -> (job 2) binned canvas
aggregation ([R] create_plot) -> ordered binned table.  The binned
result (≤ W·H·ncat rows) is what a renderer consumes; collecting it
to the driver is the PNG-sink analogue and is cheap by construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shadems_spark.operators import raster as R


@dataclass
class ShadePlot:
    """One plot spec = one logical query (axes, ranges, reduction).

    ``x``/``y`` are arbitrary Column expressions (the DataMapper
    output, SURVEY.md §2 B); ``category`` is the --colour-by axis;
    ``reduction``/``value`` the --ared/--aaxis pair.
    """

    x: Column
    y: Column
    width: int = 256
    height: int = 256
    x_range: tuple[float, float] | None = None
    y_range: tuple[float, float] | None = None
    reduction: str = "count"
    value: Column | None = None
    category: Column | None = None
    #: robust=True: bounds from 2%/98% quantile sketches instead of
    #: min/max — outlier samples can't stretch the canvas (§4 ext).
    robust: bool = False
    _bounds: dict = field(default_factory=dict, repr=False)

    def bounds(self, df: DataFrame) -> tuple[tuple[float, float], tuple[float, float]]:
        """Job 1 — only runs if a range is unset; both axes batched
        into one aggregate ([R] compute_bounds batches all unknown
        limits into a single dask compute)."""
        if self.x_range is not None and self.y_range is not None:
            return self.x_range, self.y_range
        pass_fn = R.robust_bounds if self.robust else R.minmax
        row = pass_fn(df, {"x": self.x, "y": self.y}).first()
        xr = self.x_range or (float(row["x_min"]), float(row["x_max"]))
        yr = self.y_range or (float(row["y_min"]), float(row["y_max"]))
        return xr, yr

    def run(self, df: DataFrame) -> DataFrame:
        """Job 2 — the canvas aggregation; returns the binned table."""
        xr, yr = self.bounds(df)
        return R.raster(
            df,
            self.x,
            self.y,
            xr,
            yr,
            self.width,
            self.height,
            reduction=self.reduction,
            value=self.value,
            category=self.category,
        )

    def run_with_ranges(self, df: DataFrame, xr, yr) -> DataFrame:
        """Job 2 with externally-supplied bounds (see run_plots)."""
        return R.raster(
            df, self.x, self.y, xr, yr, self.width, self.height,
            reduction=self.reduction, value=self.value, category=self.category,
        )

    def run_faceted(self, df: DataFrame, facet_keys: list[str], out_path: str) -> None:
        """A7/iteration (--iter-field/--iter-scan...): ONE plan whose
        groupBy includes the facet keys, written partitioned — the
        one-PNG-per-group loop without per-group jobs (scales to any
        number of facets in a single shuffle)."""
        xr, yr = self.bounds(df)
        binned = (
            R.clip(R.clip(df, self.x, *xr), self.y, *yr)
            .withColumn("bx", R.bin_axis(self.x, xr[0], xr[1], self.width))
            .withColumn("by", R.bin_axis(self.y, yr[0], yr[1], self.height))
            .groupBy(*facet_keys, "by", "bx")
            .agg(R.REDUCTIONS[self.reduction](self.value).alias("val"))
        )
        binned.write.mode("overwrite").partitionBy(*facet_keys).parquet(out_path)


def run_plots(df: DataFrame, plots: list[ShadePlot], cache: bool = True) -> list[DataFrame]:
    """Render several plots of ONE data extract with ONE bounds job.

    The reference batches every unset axis limit of every requested
    plot into a single dask compute ([R] shade_ms/data_plots.py::
    compute_bounds) and shares the extracted dataframe across plots
    (axis dedup, [R] DataAxis.register).  Spark equivalent: union all
    unknown (plot, axis) ranges into one agg job over the (optionally
    cached) extract, then instantiate each raster with its resolved
    ranges — N plots cost 1 bounds scan + N small agg jobs, not 2N
    scans."""
    needed: dict[str, object] = {}
    for i, p in enumerate(plots):
        if p.x_range is None:
            needed[f"p{i}x"] = p.x
        if p.y_range is None:
            needed[f"p{i}y"] = p.y
    if cache and needed:
        df = df.persist()
    row = R.minmax(df, needed).first() if needed else None
    out = []
    for i, p in enumerate(plots):
        xr = p.x_range or (float(row[f"p{i}x_min"]), float(row[f"p{i}x_max"]))
        yr = p.y_range or (float(row[f"p{i}y_min"]), float(row[f"p{i}y_max"]))
        out.append(p.run_with_ranges(df, xr, yr))
    return out
