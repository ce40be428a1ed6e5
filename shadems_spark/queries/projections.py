"""Projection / derived-column queries (SURVEY.md §2 B: P1-P13).

Each exercises one DataMapper through the engine's mapper registry
(operators/mappers.py) against its closed-form DuckDB oracle.  Subset
filters (row_key % k) keep per-row outputs modest for hashing; the
operators themselves are full-scan streaming projections.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.functions import complexops as C
from shadems_spark.operators import mappers as M
from shadems_spark.queries import register
from shadems_spark.vis import vis_sql_from, vis_view

_VIS = vis_sql_from("lineitem")


def _v(spark, sf_dir, mod: int = 20):
    v = vis_view(load_table(spark, sf_dir, "lineitem"))
    return v.filter(F.col("row_key") % mod == 0) if mod else v


_SUB = "row_key % 20 = 0"


@register(
    "q_project",
    sql=f"SELECT row_key, line_no, time_day, a1, a2 FROM {_VIS} v WHERE {_SUB}",
)
def q_project(spark, sf_dir):
    """P1: identity mapper '_' — raw column passthrough."""
    return _v(spark, sf_dir).select("row_key", "line_no", "time_day", "a1", "a2")


@register(
    "q_col_arith",
    sql=f"""
    SELECT row_key, line_no,
           re - mre AS res_re,
           im - mim AS res_im,
           (re * mre + im * mim) / (mre * mre + mim * mim) AS rat_re,
           (im * mre - re * mim) / (mre * mre + mim * mim) AS rat_im
    FROM {_VIS} v WHERE {_SUB}
    """,
)
def q_col_arith(spark, sf_dir):
    """P2: --col DATA-MODEL_DATA / DATA/MODEL_DATA complex arithmetic
    ([R] data_mappers.py::DataAxis spec grammar)."""
    res = M.parse_axis("DATA-MODEL_DATA:_")
    rat = M.parse_axis("DATA/MODEL_DATA:_")
    return _v(spark, sf_dir).select(
        "row_key",
        "line_no",
        C.c_re(res).alias("res_re"),
        C.c_im(res).alias("res_im"),
        C.c_re(rat).alias("rat_re"),
        C.c_im(rat).alias("rat_im"),
    )


@register(
    "q_amp",
    sql=f"SELECT row_key, line_no, sqrt(re*re + im*im) AS amp FROM {_VIS} v WHERE {_SUB}",
)
def q_amp(spark, sf_dir):
    """P3: amp = |vis| ([R] data_mappers.py mapper 'amp')."""
    return _v(spark, sf_dir).select("row_key", "line_no", M.parse_axis("DATA:amp").alias("amp"))


@register(
    "q_phase",
    sql=f"""
    SELECT row_key, line_no,
           round(atan2(im, re) * {M.DEG_PER_RAD!r}, 6) AS phase_deg
    FROM {_VIS} v WHERE {_SUB}
    """,
)
def q_phase(spark, sf_dir):
    """P4: phase in degrees.  atan2 is libm (can differ by 1 ulp
    between JVM and DuckDB) -> rounded to 6 dp on both sides."""
    return _v(spark, sf_dir).select(
        "row_key", "line_no", F.round(M.parse_axis("DATA:phase"), 6).alias("phase_deg")
    )


@register(
    "q_real_imag",
    sql=f"SELECT row_key, line_no, re, im FROM {_VIS} v WHERE {_SUB}",
)
def q_real_imag(spark, sf_dir):
    """P5: component extraction."""
    return _v(spark, sf_dir).select(
        "row_key",
        "line_no",
        M.parse_axis("DATA:real").alias("re"),
        M.parse_axis("DATA:imag").alias("im"),
    )


@register(
    "q_uvdist",
    sql=f"SELECT row_key, line_no, sqrt(u*u + v*v) AS uvdist FROM {_VIS} v WHERE {_SUB}",
)
def q_uvdist(spark, sf_dir):
    """P6: uvdist = sqrt(u²+v²) ([R] mapper 'uv')."""
    return _v(spark, sf_dir).select(
        "row_key", "line_no", M.parse_axis("uvdist").alias("uvdist")
    )


@register(
    "q_uvwave",
    sql=f"""
    SELECT v.row_key, v.line_no, c.chan,
           sqrt(v.u*v.u + v.v*v.v) * c.freq / 299792458.0 AS uvwave
    FROM {_VIS} v CROSS JOIN {M.chan_freqs_sql(8)} c
    WHERE v.row_key % 100 = 0
    """,
)
def q_uvwave(spark, sf_dir):
    """P7: uvdist in wavelengths — the row-shaped × chan-shaped outer
    product ([R] mapper 'uvwave', extras=chan_freqs).  The channel dim
    is tiny -> broadcast cross join, no shuffle of the fact side."""
    v = _v(spark, sf_dir, mod=100)
    chans = M.chan_freqs(spark, n_chan=8)
    return v.crossJoin(F.broadcast(chans)).select(
        "row_key",
        "line_no",
        "chan",
        (M.parse_axis("uvdist") * F.col("freq") / F.lit(M.LIGHTSPEED)).alias("uvwave"),
    )


@register(
    "q_uvw",
    sql=f"SELECT row_key, line_no, u, v, w FROM {_VIS} v WHERE {_SUB}",
)
def q_uvw(spark, sf_dir):
    """P8: UVW components (conjugate mirroring is q_conj_union)."""
    return _v(spark, sf_dir).select("row_key", "line_no", "u", "v", "w")


@register("q_freq", sql=f"SELECT chan, freq, wavel FROM {M.chan_freqs_sql(64)} c")
def q_freq(spark, sf_dir):
    """P9: per-channel FREQ/WAVEL dim ([R] SPECTRAL_WINDOW CHAN_FREQ)."""
    return M.chan_freqs(spark, n_chan=64)


@register(
    "q_index_axes",
    sql=f"""
    SELECT row_key, line_no,
           row_number() OVER (ORDER BY row_key, line_no) AS row_idx
    FROM {_VIS} v WHERE {_SUB}
    """,
)
def q_index_axes(spark, sf_dir):
    """P10: ROW index axis as a deterministic ranking over the natural
    key (chan/corr indices come from posexplode positions: q_explode).
    Numbered via the two-phase global_index (range-partition + local
    row_number + broadcast offsets) — identical output to a global
    window without moving the scan to a single partition."""
    from shadems_spark.operators.profile import global_index

    v = _v(spark, sf_dir).select("row_key", "line_no")
    return global_index(v, ["row_key", "line_no"], out="row_idx").withColumn(
        "row_idx", F.col("row_idx").cast("int")
    )


@register(
    "q_baseline_id",
    sql=f"SELECT row_key, line_no, a1, a2, {M.baseline_index_sql()} AS baseline FROM {_VIS} v WHERE {_SUB}",
)
def q_baseline_id(spark, sf_dir):
    """P11: triangular baseline index ([R] ms_info.py numbering)."""
    return _v(spark, sf_dir).select(
        "row_key",
        "line_no",
        "a1",
        "a2",
        M.baseline_index(F.col("a1"), F.col("a2")).alias("baseline"),
    )


@register(
    "q_reltime",
    sql=f"""
    SELECT row_key, line_no, field_label,
           time_day - min(time_day) OVER (PARTITION BY field_label) AS rel_day
    FROM {_VIS} v WHERE {_SUB}
    """,
)
def q_reltime(spark, sf_dir):
    """P12/W3: relative-time axis t - min(t) per group ([R]
    data_plots.py time-axis offset)."""
    w = Window.partitionBy("field_label")
    return _v(spark, sf_dir).select(
        "row_key",
        "line_no",
        "field_label",
        (F.col("time_day") - F.min("time_day").over(w)).alias("rel_day"),
    )


@register(
    "q_weight",
    sql=f"""
    SELECT row_key, line_no, w AS weight, re * w AS weighted_re
    FROM {_VIS} v WHERE {_SUB}
    """,
)
def q_weight(spark, sf_dir):
    """P13: WEIGHT axis as a plottable quantity (w plays WEIGHT)."""
    return _v(spark, sf_dir).select(
        "row_key",
        "line_no",
        F.col("w").alias("weight"),
        (F.col("vis.re") * F.col("w")).alias("weighted_re"),
    )
