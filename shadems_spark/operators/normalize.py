"""Raster normalization — the tf.shade(how=...) analogue
(SURVEY.md §2 W), applied to the *binned* table, not raw rows
([R] shade_ms/data_plots.py::create_plot shading ≈L200-300).

The binned table is ≤ W·H(·ncat) rows regardless of input scale, so
these window computations are inherently tiny — a single-partition
window here is fine even at the 100 TB input target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def eq_hist(binned: DataFrame, val: str = "val", out: str = "shade") -> DataFrame:
    """W1: histogram equalization — each non-empty pixel mapped to its
    empirical CDF rank (datashader's default for counts).  cume_dist
    gives ties identical shade, matching the empirical-CDF definition
    over non-empty pixels."""
    # partitionBy(lit(0)): the whole (bounded) raster is ONE window by
    # design — the constant key states that explicitly instead of
    # tripping WindowExec's no-partition warning on every run.
    w = Window.partitionBy(F.lit(0)).orderBy(F.col(val))
    return binned.withColumn(out, F.cume_dist().over(w))


def norm(binned: DataFrame, how: str, val: str = "val", out: str = "shade") -> DataFrame:
    """W2: log/cbrt/linear normalization rescaled to [0,1] by the
    raster's min/max (an empty-frame window: the binned table is
    small by construction)."""
    v = F.col(val).cast("double")
    if how == "log":
        t = F.log(F.lit(1.0) + v)  # ln(1+v): same formula in the oracle
    elif how == "cbrt":
        t = F.cbrt(v)
    elif how == "linear":
        t = v
    else:
        raise ValueError(f"unknown norm {how!r}")
    w = Window.partitionBy(F.lit(0))  # whole raster, one explicit partition
    lo, hi = F.min(t).over(w), F.max(t).over(w)
    return binned.withColumn(out, (t - lo) / (hi - lo))


def eq_hist_interp(
    binned: DataFrame, val: str = "val", out: str = "shade", n_bins: int = 64
) -> DataFrame:
    """W1 interpolation variant: datashader's ACTUAL eq_hist for
    non-integer data — an n_bins histogram over [lo, hi], the CDF
    evaluated at bin centers, and each pixel shaded by PIECEWISE-
    LINEAR interpolation between the two neighboring center points
    (np.interp semantics, clamped at both ends).  Distinct from
    ``eq_hist`` above (exact empirical CDF via cume_dist): ties get
    identical shade in both, but values BETWEEN histogram centers
    grade smoothly here instead of stepping — the subtlety that
    separates the two on float-valued aggregates (mean/std rasters).

    Deterministic, engine-replayable arithmetic throughout (bin
    index, cumsum over a DENSE generated bin axis, one clamp) — so
    unlike a sketch this interpolation carries an exact SQL oracle.
    Scale: the histogram is an n_bins-row aggregate of the (already
    bounded) raster; the shade pass is one broadcast join against the
    segment table."""
    v = F.col(val).cast("double")
    w = Window.partitionBy(F.lit(0))  # whole raster, one explicit partition
    lo, hi = F.min(v).over(w), F.max(v).over(w)
    step = (hi - lo) / F.lit(float(n_bins))
    k = F.least(
        F.greatest(F.floor((v - lo) / step), F.lit(0)), F.lit(n_bins - 1)
    ).cast("int")
    withbin = binned.withColumn("__lo", lo).withColumn("__hi", hi).withColumn(
        "__k", F.when(hi == lo, F.lit(0)).otherwise(k)
    )
    hist = withbin.groupBy("__k").agg(F.count(F.lit(1)).alias("h"))
    dense = (
        binned.sparkSession.range(n_bins)
        .select(F.col("id").cast("int").alias("__k"))
        .join(hist, "__k", "left")
        .select("__k", F.coalesce(F.col("h"), F.lit(0)).alias("h"))
    )
    cw = Window.partitionBy(F.lit(0)).orderBy("__k")
    cdf = dense.select(
        "__k",
        (
            F.sum("h").over(cw)
            / F.sum("h").over(Window.partitionBy(F.lit(0)))
        ).alias("cdf"),
    )
    seg = cdf.select(
        "__k",
        F.col("cdf").alias("cdf_k"),
        F.lead("cdf", 1, None).over(cw).alias("cdf_next"),
    )
    # interp segment j = clamp(floor((v - c_0)/step), 0, n_bins-2);
    # t clamped to [0,1] gives np.interp's end behavior for free
    c0 = F.col("__lo") + (F.col("__hi") - F.col("__lo")) * F.lit(0.5 / n_bins)
    stp = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    j = F.least(
        F.greatest(F.floor((v - c0) / stp), F.lit(0)), F.lit(n_bins - 2)
    ).cast("int")
    t = F.least(
        F.greatest((v - (c0 + j.cast("double") * stp)) / stp, F.lit(0.0)),
        F.lit(1.0),
    )
    shaded = (
        withbin.withColumn("__j", F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(j))
        .join(F.broadcast(seg.withColumnRenamed("__k", "__j")), "__j")
        .withColumn(
            out,
            F.when(F.col("__hi") == F.col("__lo"), F.lit(1.0)).otherwise(
                F.col("cdf_k")
                + t * (F.coalesce(F.col("cdf_next"), F.col("cdf_k")) - F.col("cdf_k"))
            ),
        )
    )
    return shaded.drop("__lo", "__hi", "__k", "__j", "cdf_k", "cdf_next")
