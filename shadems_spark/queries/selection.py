"""Selection / predicate queries (SURVEY.md §2 C: F1-F8, J4 semi/anti)
through operators/selection.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.functions import complexops as C
from shadems_spark.operators import selection as S
from shadems_spark.queries import register
from shadems_spark.vis import vis_sql_from, vis_view

_VIS = vis_sql_from("lineitem")


def _v(spark, sf_dir):
    return vis_view(load_table(spark, sf_dir, "lineitem"))


@register(
    "q_sel_field",
    sql=f"""
    SELECT row_key, line_no, field_label, corr_label FROM {_VIS} v
    WHERE field_label IN ('F') AND row_key % 10 = 0
    """,
)
def q_sel_field(spark, sf_dir):
    """F1: group-key selection (--field); becomes partition pruning on
    layouts partitioned by the key."""
    v = S.select_groups(_v(spark, sf_dir), "field_label", ["F"])
    return v.filter(F.col("row_key") % 10 == 0).select(
        "row_key", "line_no", "field_label", "corr_label"
    )


@register(
    "q_sel_ant",
    sql=f"""
    SELECT row_key, line_no, a1, a2 FROM {_VIS} v
    WHERE a1 IN (3, 5, 8) OR a2 IN (3, 5, 8)
    """,
)
def q_sel_ant(spark, sf_dir):
    """F2: --ant selection: either antenna of the pair matches."""
    return S.select_antennas(_v(spark, sf_dir), [3, 5, 8]).select(
        "row_key", "line_no", "a1", "a2"
    )


@register(
    "q_sel_baseline",
    sql=f"""
    SELECT row_key, line_no, a1, a2 FROM {_VIS} v
    WHERE (least(a1,a2) = 70 AND greatest(a1,a2) = 207)
       OR (least(a1,a2) = 10 AND greatest(a1,a2) = 80)
       OR (least(a1,a2) = 25 AND greatest(a1,a2) = 32)
    """,
)
def q_sel_baseline(spark, sf_dir):
    """F3: --baseline specific unordered antenna pairs."""
    return S.select_baselines(
        _v(spark, sf_dir), [(70, 207), (10, 80), (25, 32)]
    ).select("row_key", "line_no", "a1", "a2")


@register(
    "q_sel_corr",
    sql=f"""
    SELECT row_key, line_no, corr_label,
           CASE corr_label WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END AS corr_idx
    FROM {_VIS} v
    WHERE (CASE corr_label WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END) IN (0, 2)
      AND row_key % 10 = 0
    """,
)
def q_sel_corr(spark, sf_dir):
    """F4: --corr XX,YY selection by correlation index
    ([R] DataAxis.get_column_slice)."""
    idx = (
        F.when(F.col("corr_label") == "A", 0)
        .when(F.col("corr_label") == "N", 1)
        .otherwise(2)
    )
    return (
        _v(spark, sf_dir)
        .withColumn("corr_idx", idx)
        .filter(F.col("corr_idx").isin(0, 2) & (F.col("row_key") % 10 == 0))
        .select("row_key", "line_no", "corr_label", "corr_idx")
    )


@register(
    "q_chan_slice",
    sql=f"""
    SELECT row_key, line_no FROM {_VIS} v
    WHERE line_no >= 2 AND line_no < 7 AND (line_no - 2) % 2 = 0
    """,
)
def q_chan_slice(spark, sf_dir):
    """F5: --chan start:stop:step positional slice (line_no plays the
    channel index)."""
    return S.chan_slice(_v(spark, sf_dir), "line_no", 2, 7, 2).select("row_key", "line_no")


@register(
    "q_flags",
    sql=f"""
    SELECT corr_label, count(*) AS n_kept FROM {_VIS} v
    WHERE NOT (flag OR flag_row)
    GROUP BY corr_label
    """,
)
def q_flags(spark, sf_dir):
    """F6: FLAG | FLAG_ROW application before aggregation
    ([R] get_plot_data da.where masking)."""
    return (
        S.apply_flags(_v(spark, sf_dir))
        .groupBy("corr_label")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


@register(
    "q_range_clip",
    sql=f"""
    SELECT count(*) AS n, round(sum(u), 2) AS sum_u FROM {_VIS} v
    WHERE u BETWEEN -20000.0 AND 20000.0 AND v BETWEEN -40000.0 AND 40000.0
    """,
)
def q_range_clip(spark, sf_dir):
    """F7: explicit --xmin/--xmax/--ymin/--ymax canvas clipping."""
    v = _v(spark, sf_dir)
    v = v.filter(F.col("u").between(-20000.0, 20000.0) & F.col("v").between(-40000.0, 40000.0))
    return v.agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("u"), 2).alias("sum_u"))


@register(
    "q_nan_filter",
    sql=f"""
    SELECT count(*) AS n_finite FROM (
        SELECT CASE WHEN line_no = 1 THEN 'NaN'::DOUBLE
                    WHEN line_no = 2 THEN NULL
                    ELSE sqrt(re*re + im*im) END AS val
        FROM {_VIS} v
    ) WHERE val IS NOT NULL AND NOT isnan(val)
    """,
)
def q_nan_filter(spark, sf_dir):
    """F8: NaN/null hygiene — non-finite samples never reach the
    raster (datashader skip semantics)."""
    val = (
        F.when(F.col("line_no") == 1, F.lit(float("nan")))
        .when(F.col("line_no") == 2, F.lit(None).cast("double"))
        .otherwise(C.c_amp(F.col("vis")))
    )
    v = _v(spark, sf_dir).select(val.alias("val"))
    return S.drop_nonfinite(v, F.col("val")).agg(F.count(F.lit(1)).alias("n_finite"))


@register(
    "q_semijoin",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND o_orderkey % 5 = 0
    """,
)
def q_semijoin(spark, sf_dir):
    """J4: name-based selection as a left-semi join against the
    selected dim subset (the isin-mask generalization)."""
    orders = load_table(spark, sf_dir, "orders")
    dim = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        orders.join(
            F.broadcast(dim), orders.o_custkey == dim.c_custkey, "left_semi"
        )
        .filter(F.col("o_orderkey") % 5 == 0)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "q_antijoin",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND o_orderkey % 5 = 0
    """,
)
def q_antijoin(spark, sf_dir):
    """J4: the complement selection (left-anti join)."""
    orders = load_table(spark, sf_dir, "orders")
    dim = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        orders.join(
            F.broadcast(dim), orders.o_custkey == dim.c_custkey, "left_anti"
        )
        .filter(F.col("o_orderkey") % 5 == 0)
        .select("o_orderkey", "o_totalprice")
    )
