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


@register(
    "q_pivot",
    sql=f"""
    SELECT field_label,
           CAST(sum(CASE WHEN corr_label = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN corr_label = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_n,
           CAST(sum(CASE WHEN corr_label = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r
    FROM {_VIS} v GROUP BY field_label
    """,
)
def q_pivot(spark, sf_dir):
    """X4: long->wide pivot (df.groupBy().pivot() with EXPLICIT pivot
    values, so no extra distinct-discovery job runs and the output
    schema is static — the scale-safe pivot form; oracle is the
    equivalent CASE-WHEN aggregate)."""
    v = vis_view(load_table(spark, sf_dir, "lineitem"))
    p = (
        v.groupBy("field_label")
        .pivot("corr_label", ["A", "N", "R"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "field_label",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(f"n_{c.lower()}")
            for c in ("A", "N", "R")
        ],
    )


@register(
    "q_unpivot",
    sql="""
    SELECT l_orderkey AS row_key, l_linenumber AS line_no, metric, val
    FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
        FROM lineitem WHERE l_orderkey % 20 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem WHERE l_orderkey % 20 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        FROM lineitem WHERE l_orderkey % 20 = 0
    )
    """,
)
def q_unpivot(spark, sf_dir):
    """X5: wide->long unpivot/melt (DataFrame.unpivot — one Expand
    node over a single scan, not N self-unions; oracle spells out the
    UNION ALL it is equivalent to)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_discount", "l_tax"],
            "metric",
            "val",
        )
        .select(
            F.col("l_orderkey").alias("row_key"),
            F.col("l_linenumber").alias("line_no"),
            "metric",
            "val",
        )
    )


@register(
    "q_union_by_name",
    sql="""
    SELECT doc_id,
           coalesce(lang, '??') AS lang,
           coalesce(n_chars, CAST(-1 AS BIGINT)) AS n_chars
    FROM (
        SELECT doc_id, lang, NULL::BIGINT AS n_chars
        FROM documents WHERE doc_id % 5 = 0
        UNION ALL BY NAME
        SELECT n_chars, doc_id FROM documents WHERE doc_id % 7 = 0
    )
    """,
)
def q_union_by_name(spark, sf_dir):
    """X6: schema-evolution union — two extracts with different column
    sets/orders combined by NAME (unionByName allowMissingColumns),
    the operation that concatenates corpus snapshots whose schemas
    drifted.  Missing columns null-fill then coalesce to sentinels so
    both engines emit stable dtypes."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "lang")
    b = docs.filter(F.col("doc_id") % 7 == 0).select("n_chars", "doc_id")
    u = a.unionByName(b, allowMissingColumns=True)
    return u.select(
        "doc_id",
        F.coalesce("lang", F.lit("??")).alias("lang"),
        F.coalesce("n_chars", F.lit(-1).cast("long")).alias("n_chars"),
    )
