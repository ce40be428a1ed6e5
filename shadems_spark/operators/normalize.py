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
