"""Shape-transform queries (SURVEY.md §2 X: explode / zip / union) —
the engine's long-format flatten, replacing the reference's
dask broadcast+ravel ([R] shade_ms/dask_utils.py::dataframe_factory).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.queries import register
from shadems_spark.vis import vis_sql_from, vis_view

_VIS = vis_sql_from("lineitem")


@register(
    "q_explode",
    sql="""
    SELECT vec_id, i AS pos, embedding[i + 1] AS val
    FROM embeddings, generate_series(0, 63) t(i)
    WHERE vec_id % 5 = 0
    """,
)
def q_explode(spark, sf_dir):
    """X1: cube flatten — (row, chan) array cells raveled to long
    format via posexplode; scalar columns broadcast for free."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", F.col("pos").cast("long").alias("pos"), "val")


@register(
    "q_arrays_zip",
    sql=f"""
    SELECT row_key, line_no, p.pos,
           CASE p.pos WHEN 0 THEN l_quantity WHEN 1 THEN l_discount ELSE l_tax END AS v1,
           CASE p.pos WHEN 0 THEN l_extendedprice
                      WHEN 1 THEN l_extendedprice * l_discount
                      ELSE l_extendedprice * l_tax END AS v2
    FROM (SELECT l_orderkey AS row_key, l_linenumber AS line_no,
                 l_quantity, l_discount, l_tax, l_extendedprice
          FROM lineitem WHERE l_orderkey % 100 = 0) li
    CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (1), (2)) p(pos)
    """,
)
def q_arrays_zip(spark, sf_dir):
    """X2: multi-column flatten — same-shaped arrays raveled into
    aligned columns (arrays_zip keeps alignment through the explode)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    a1 = F.array("l_quantity", "l_discount", "l_tax")
    a2 = F.array(
        F.col("l_extendedprice"),
        F.col("l_extendedprice") * F.col("l_discount"),
        F.col("l_extendedprice") * F.col("l_tax"),
    )
    z = li.select(
        F.col("l_orderkey").alias("row_key"),
        F.col("l_linenumber").alias("line_no"),
        F.posexplode(F.arrays_zip(a1.alias("a"), a2.alias("b"))).alias("pos", "z"),
    )
    return z.select(
        "row_key",
        "line_no",
        F.col("pos").cast("long").alias("pos"),
        F.col("z.a").alias("v1"),
        F.col("z.b").alias("v2"),
    )


@register(
    "q_union_groups",
    sql=f"""
    SELECT * FROM (
        SELECT row_key, line_no, 'grpF' AS grp FROM {_VIS} v
        WHERE field_label = 'F' AND row_key % 50 = 0
        UNION ALL
        SELECT row_key, line_no, 'grpO' AS grp FROM {_VIS} v
        WHERE field_label = 'O' AND row_key % 50 = 0
    )
    """,
)
def q_union_groups(spark, sf_dir):
    """X3/U1: per-(field,ddid,scan) frames concatenated into one
    logical frame ([R] get_plot_data tail dask concat) — unionByName
    over group slices; at scale this is a single partitioned scan."""
    v = vis_view(load_table(spark, sf_dir, "lineitem")).filter(F.col("row_key") % 50 == 0)
    part = lambda lbl, tag: (
        v.filter(F.col("field_label") == lbl).select(
            "row_key", "line_no", F.lit(tag).alias("grp")
        )
    )
    return part("F", "grpF").unionByName(part("O", "grpO"))
