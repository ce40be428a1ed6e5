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


from shadems_spark.queries.analytics._shared import (  # noqa: E501
    _SCRATCH,
)


_VIS = vis_sql_from("lineitem")


@register(
    "q_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the canonical streaming-aggregate over the main
    fact — one pruned scan, partial/final hash agg on a 6-key space."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_top_orders",
    sql="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, revenue, rk FROM (
        SELECT o_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(row_number() OVER (
                   ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 2) DESC,
                            o_orderkey) AS INTEGER) AS rk
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
        GROUP BY o_orderkey, o_orderdate
    ) WHERE rk <= 10
    """,
)
def q_top_orders(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> fact x fact join ->
    grouped revenue -> deterministic top-k (rank on the rounded value
    with key tiebreak)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    # TakeOrderedAndProject top-10, then rank the 10 survivors via
    # the broadcast triangle join (negated revenue = exact desc order
    # on a 2dp-rounded double) — the grouped-revenue table never
    # collapses to a single partition and the plan is window-free.
    from shadems_spark.operators.profile import triangle_rank

    order = [F.col("revenue").desc(), F.col("o_orderkey")]
    top = rev.orderBy(*order).limit(10).withColumn(
        "__negr", -F.col("revenue")
    )
    return (
        triangle_rank(top, ["__negr", "o_orderkey"], out="__trk")
        .withColumn("rk", F.col("__trk").cast("int"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "revenue",
            "rk",
        )
    )


@register(
    "q_percentile",
    sql="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile(spark, sf_dir):
    """Exact interpolated percentiles per group (robust axis limits —
    the percentile-based --xmin/--xmax mode the reference approximates
    with min/max)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("qty_p50"),
    )


@register(
    "q_facet",
    sql=f"""
    SELECT field_label, {R.bin_axis_sql('re', *PRICE_RANGE, 16)} AS by,
           {R.bin_axis_sql('time_day', *TIME_RANGE, 16)} AS bx,
           count(*) AS val
    FROM {_VIS} v
    WHERE time_day BETWEEN {TIME_RANGE[0]!r} AND {TIME_RANGE[1]!r}
      AND re BETWEEN {PRICE_RANGE[0]!r} AND {PRICE_RANGE[1]!r}
    GROUP BY 1, 2, 3
    """,
)
def q_facet(spark, sf_dir):
    """A5/§7-step-7 facet engine: the --iter-field loop as ONE plan —
    facet key joins the groupBy, result written partitionBy(facet) and
    read back.  One shuffle for any number of facets (the reference
    loops plots; here Catalyst sees a single job)."""
    from shadems_spark.plans.shadeplot import ShadePlot

    v = vis_view(load_table(spark, sf_dir, "lineitem"))
    plot = ShadePlot(
        x=F.col("time_day").cast("double"),
        y=F.col("vis.re"),
        width=16,
        height=16,
        x_range=TIME_RANGE,
        y_range=PRICE_RANGE,
    )
    out_path = os.path.join(_SCRATCH, "facet_raster")
    plot.run_faceted(v, ["field_label"], out_path)
    back = spark.read.parquet(out_path)
    return back.select(
        "field_label", "by", "bx", "val"
    )


@register(
    "q_facet_scan",
    sql=f"""
    SELECT scan_no, spw_id, {R.bin_axis_sql('re', *PRICE_RANGE, 16)} AS by,
           {R.bin_axis_sql('time_day', *TIME_RANGE, 16)} AS bx,
           count(*) AS val
    FROM {_VIS} v
    WHERE time_day BETWEEN {TIME_RANGE[0]!r} AND {TIME_RANGE[1]!r}
      AND re BETWEEN {PRICE_RANGE[0]!r} AND {PRICE_RANGE[1]!r}
    GROUP BY 1, 2, 3, 4
    """,
)
def q_facet_scan(spark, sf_dir):
    """--iter scan/--iter spw facet engine ([R] main.py iteration
    axes beyond field/corr/ant): TWO facet keys ride one raster
    groupBy, written partitionBy(scan_no, spw_id) and read back —
    still one shuffle for the full facet grid.  Partition-column
    types are re-cast on read (partition discovery infers int)."""
    from shadems_spark.plans.shadeplot import ShadePlot

    v = vis_view(load_table(spark, sf_dir, "lineitem"))
    plot = ShadePlot(
        x=F.col("time_day").cast("double"),
        y=F.col("vis.re"),
        width=16,
        height=16,
        x_range=TIME_RANGE,
        y_range=PRICE_RANGE,
    )
    out_path = os.path.join(_SCRATCH, "facet_scan_raster")
    plot.run_faceted(v, ["scan_no", "spw_id"], out_path)
    back = spark.read.parquet(out_path)
    return back.select(
        F.col("scan_no").cast("long").alias("scan_no"),
        F.col("spw_id").cast("long").alias("spw_id"),
        "by", "bx", "val",
    )


@register(
    "q_local_supplier",
    sql="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'AMERICA')
      AND CAST(o_orderdate AS DATE) >= DATE '1998-07-01'
    GROUP BY n_name
    """,
)
def q_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: the six-table star join — Catalyst orders the
    joins and broadcasts every dim (region/nation/supplier/customer);
    only the fact×orders edge can need a real shuffle, and AQE decides
    that at runtime from actual sizes."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") >= F.lit("1998-07-01").cast("date")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "AMERICA")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@register(
    "q_csv_roundtrip",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem WHERE l_orderkey % 200 = 0
    """,
)
def q_csv_roundtrip(spark, sf_dir):
    """Source adapter check: subset -> CSV (header, full-precision
    doubles) -> read back with explicit schema."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 200 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
    )
    path = os.path.join(_SCRATCH, "csv_roundtrip")
    li.write.mode("overwrite").option("header", "true").csv(path)
    return read_csv(
        spark,
        path,
        schema="l_orderkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_returnflag string",
    )


@register(
    "q_orc_roundtrip",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem WHERE l_orderkey % 200 = 0
    """,
)
def q_orc_roundtrip(spark, sf_dir):
    """ORC adapter check: columnar alternate format, same vectorized
    scan + pushdown properties as parquet."""
    from shadems_spark.sources.io import read_orc, write_orc

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 200 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
    )
    path = os.path.join(_SCRATCH, "orc_roundtrip")
    write_orc(li, path)
    return read_orc(spark, path)


@register(
    "q_json_roundtrip",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem WHERE l_orderkey % 200 = 0
    """,
)
def q_json_roundtrip(spark, sf_dir):
    """JSON-lines adapter check: row format for interchange with
    non-columnar producers; explicit schema on read-back avoids the
    double inference pass (a full extra scan at 100 TB)."""
    from shadems_spark.sources.io import read_json

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 200 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
    )
    path = os.path.join(_SCRATCH, "json_roundtrip")
    li.write.mode("overwrite").json(path)
    return read_json(
        spark,
        path,
        schema="l_orderkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_returnflag string",
    )


@register(
    "q_bucketed_join",
    sql="""
    SELECT o_orderpriority,
           count(*) AS n_lines,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderkey % 25 = 0
    GROUP BY o_orderpriority
    """,
)
def q_bucketed_join(spark, sf_dir):
    """Co-located fact x fact join on pre-bucketed tables: both sides
    are written ONCE with bucketBy(8, orderkey) + sortBy, so the join
    (and any later orderkey aggregation) runs with no Exchange and no
    Sort on either side — the write-time shuffle is amortized across
    every downstream consumer, the standard layout for a 100 TB fact
    table that joins on the same key daily.  tests/test_plans pins
    the Exchange-free plan; the merge hint keeps the demo honest
    (broadcast would hide the property at toy scale)."""
    from shadems_spark.sources.io import write_bucketed

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 25 == 0)
        .select("l_orderkey", "l_extendedprice")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 25 == 0)
        .select("o_orderkey", "o_orderpriority")
    )
    write_bucketed(li, "b_lineitem", "l_orderkey", 8)
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    bl = spark.table("b_lineitem").hint("merge")
    bo = spark.table("b_orders").hint("merge")
    return (
        bl.join(bo, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@register(
    "q_ship_priority",
    sql="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q_ship_priority(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): segment-filtered customer
    dim broadcast into orders, orders' surviving keys join lineitem,
    revenue aggregate, global top-10 via TakeOrdered (never a full
    sort).  Both date filters reach their scans as pushed predicates."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    return (
        # only the segment-filtered customer KEY LIST broadcasts; the
        # orders x lineitem join shuffles on orderkey (or AQE picks
        # broadcast at toy scale) — at 100 TB both sides are facts.
        li.join(
            orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q_pysource",
    sql="""
    SELECT (i * 2654435761) % 4294967296 % 100 AS bucket,
           count(*) AS n,
           round(sum(((i * 2654435761) % 4294967296 % 1000000)
                     / 1000000.0), 6) AS sum_val
    FROM range(0, 20000) t(i)
    GROUP BY 1
    """,
)
def q_pysource(spark, sf_dir):
    """Custom Python DataSource end-to-end: read 20k rows from the
    synthgen format (partition-planned, executor-side generation) and
    aggregate per bucket.  The oracle reproduces the source's
    arithmetic from range() — checking the full read path, not just
    the aggregate."""
    from shadems_spark.sources.pysource import register_synthgen

    register_synthgen(spark)
    df = (
        spark.read.format("synthgen")
        .option("rows", 20000)
        .option("partitions", 8)
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("val"), 6).alias("sum_val"),
    )


@register(
    "q_binary_ingest",
    sql="""
    SELECT doc_id, 'application/octet-stream' AS kind,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           ascii(substring(text, 1, 1)) AS first_byte,
           CAST(list_sum(list_transform(string_split(text, ''), x -> ascii(x)))
                % 2147483647 AS BIGINT) AS checksum
    FROM documents WHERE doc_id % 40 = 0
    """,
)
def q_binary_ingest(spark, sf_dir):
    """A8: raw-blob ingestion via Spark's ``binaryFile`` source — the
    entry path for image/audio payloads that never existed as rows.  A
    deterministic mini blob store (one .bin per selected document,
    corpus text is ASCII so byte == codepoint for the oracle) is laid
    down once, then the DISTRIBUTED part under test runs: binaryFile
    scan -> filename-key extraction -> Arrow mapInPandas feature
    extraction (operators/multimodal.decode_features — same stage the
    parquet-blob path uses).  At scale the store is an object-store
    prefix and the scan parallelizes per file; the driver-side writer
    here is fixture setup, not the operator."""
    import shutil

    from shadems_spark.operators import multimodal as MM

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 40 == 0)
        .select("doc_id", "text")
    )
    store = os.path.join(_SCRATCH, "blob_store")
    shutil.rmtree(store, ignore_errors=True)
    os.makedirs(store, exist_ok=True)
    for r in docs.collect():  # small by contract: 1/40 of documents
        with open(os.path.join(store, f"doc_{r['doc_id']}.bin"), "wb") as fh:
            fh.write(r["text"].encode("utf-8"))

    bf = spark.read.format("binaryFile").load(store)
    blobs = bf.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("blob"),
        F.struct(
            F.lit("application/octet-stream").alias("kind"),
            F.lit("blob_store").alias("origin"),
            F.length("content").cast("long").alias("declared_size"),
        ).alias("meta"),
    )
    return MM.decode_features(blobs)


@register(
    "q_recursive_cte",
    sql="""
    WITH RECURSIVE anc AS (
        SELECT doc_id, doc_id AS node, 0 AS depth
        FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT doc_id, node // 10 AS node, depth + 1
        FROM anc WHERE node > 0
    )
    SELECT doc_id, CAST(max(depth) AS BIGINT) AS depth,
           CAST(count(*) AS BIGINT) AS n_ancestors
    FROM anc GROUP BY doc_id
    """,
)
def q_recursive_cte(spark, sf_dir):
    """Recursive CTE (Spark 4): ancestor walk over a synthetic decimal
    tree (parent = node div 10 — the category-tree / org-chart
    traversal shape).  Spark iterates the recursion as successive
    joins with AQE on each step; depth is bounded by the key width so
    the loop terminates in ~log10(max_id) rounds at any scale."""
    from shadems_spark.catalog import sql as catalog_sql

    return catalog_sql(
        spark,
        """
        WITH RECURSIVE anc AS (
            SELECT doc_id, doc_id AS node, 0 AS depth
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT doc_id, node div 10 AS node, depth + 1
            FROM anc WHERE node > 0
        )
        SELECT doc_id, CAST(max(depth) AS BIGINT) AS depth,
               CAST(count(*) AS BIGINT) AS n_ancestors
        FROM anc GROUP BY doc_id
        """,
        sf_dir,
    )


@register(
    "q_pipe_syntax",
    sql="""
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_extendedprice), 2) AS rev
    FROM lineitem WHERE l_orderkey % 10 = 0
    GROUP BY l_returnflag
    """,
)
def q_pipe_syntax(spark, sf_dir):
    """SQL pipe syntax (Spark 4): the same scan -> filter -> aggregate
    chain written as |> stages — compiles to the identical Catalyst
    plan as the GROUP BY form (the oracle), so it is pure surface
    coverage, verified by the same value hash."""
    from shadems_spark.catalog import sql as catalog_sql

    return catalog_sql(
        spark,
        """
        FROM lineitem
        |> WHERE l_orderkey % 10 = 0
        |> AGGREGATE count(*) AS n, round(sum(l_extendedprice), 2) AS rev
           GROUP BY l_returnflag
        """,
        sf_dir,
    )


@register(
    "q_dq_audit",
    sql="""
    WITH o AS (SELECT DISTINCT o_orderkey FROM orders)
    SELECT
      count(*) AS n_rows,
      CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
      CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_qty,
      CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS bad_discount,
      CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT)
          AS bad_flag,
      CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS orphan_rows,
      count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS dup_keys
    FROM lineitem l LEFT JOIN o ON l.l_orderkey = o.o_orderkey
    """,
)
def q_dq_audit(spark, sf_dir):
    """Data-quality audit battery: null / range / domain / referential
    -integrity / duplicate-key violation counts for the main fact in
    ONE pass — the expectations check that gates a pipeline promote.
    The FK probe is a broadcastable left join against the distinct
    parent keys; the duplicate check is the only extra aggregate and
    shares the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey").distinct()
    j = li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey, "left")
    flag = lambda c: F.sum(c.cast("int")).cast("long")
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        flag(F.col("l_quantity").isNull()).alias("null_qty"),
        flag(F.col("l_quantity") <= 0).alias("nonpos_qty"),
        flag((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias("bad_discount"),
        flag(~F.col("l_returnflag").isin("A", "N", "R")).alias("bad_flag"),
        flag(F.col("o_orderkey").isNull()).alias("orphan_rows"),
        (
            F.count(F.lit(1))
            - F.countDistinct(F.struct("l_orderkey", "l_linenumber"))
        ).alias("dup_keys"),
    )


@register(
    "q_rollup_routing",
    sql="""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                          count(*) AS n,
                          CAST(sum(CAST(round(value * 100) AS BIGINT))
                               AS BIGINT) AS cents
                   FROM events GROUP BY 1, 2)
    SELECT event_type, date_trunc('month', d) AS m,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(n) AS BIGINT) AS n_events,
           round(sum(cents) / 100.0, 2) AS total_value
    FROM daily GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_rollup_routing(spark, sf_dir):
    """Materialized-rollup ROUTING: the monthly report computed FROM
    the daily rollup instead of re-scanning raw events — the
    pre-aggregation pattern that turns a 100 TB fact re-scan into a
    days×types-sized read for every coarser grain.  Values aggregate
    as CENTS (round(value*100) per event, then BIGINT sums at both
    levels), so re-aggregation is lossless by construction — the
    rollup-routed answer EQUALS the direct-from-raw answer exactly,
    which the companion test asserts; floats rounded per level would
    not compose.  Two map-side-combined aggregates, the second over
    the already-tiny rollup."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("d", F.to_date("ts"))
        .groupBy("event_type", "d")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    return (
        daily.withColumn("m", F.date_trunc("month", "d").cast("date"))
        .groupBy("event_type", "m")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n").alias("n_events"),
            F.round(F.sum("cents") / F.lit(100.0), 2).alias("total_value"),
        )
        .orderBy("event_type", "m")
    )


@register(
    "q_dq_checks",
    sql="""
    WITH checks AS (
        SELECT 'lineitem_qty_range' AS chk,
               (SELECT count(*) FROM lineitem) AS n_checked,
               (SELECT count(*) FROM lineitem
                WHERE l_quantity < 1 OR l_quantity > 50) AS n_failed
        UNION ALL
        SELECT 'lineitem_orphan_orderkey',
               (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem
                WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        UNION ALL
        SELECT 'orders_custkey_not_null',
               (SELECT count(*) FROM orders),
               (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
        UNION ALL
        SELECT 'orders_orderkey_unique',
               (SELECT count(*) FROM orders),
               (SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                FROM orders)
        UNION ALL
        SELECT 'docs_nchars_matches_text',
               (SELECT count(*) FROM documents),
               (SELECT count(*) FROM documents
                WHERE n_chars != length(text))
        UNION ALL
        SELECT 'events_value_nonneg',
               (SELECT count(*) FROM events),
               (SELECT count(*) FROM events WHERE value < 0))
    SELECT chk, CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_failed AS BIGINT) AS n_failed,
           CAST(CASE WHEN n_failed = 0 THEN 1 ELSE 0 END AS INT) AS passed
    FROM checks ORDER BY chk
    """,
)
def q_dq_checks(spark, sf_dir):
    """Data-contract validation battery (the dbt-test / Deequ shape):
    range, referential-integrity, not-null, uniqueness, derived-column
    consistency, and sign constraints — one row per check with checked
    /failed counts.  The battery is ONE declarative plan: every check
    collapses to a single-row aggregate (fail predicates as summed
    indicators; the orphan check rides a broadcast left join's null
    marker; uniqueness is count - countDistinct) unioned together —
    no driver-side count loop, so at 100 TB the whole battery is a
    handful of map-side-combined scans in one job."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")

    def agg_check(name, df, fail_cond):
        return df.agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(fail_cond.cast("long")).alias("n_failed"),
        ).select(F.lit(name).alias("chk"), "n_checked", "n_failed")

    orphan = li.join(
        F.broadcast(
            orders.select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.lit(1).alias("__hit"),
            )
        ),
        "l_orderkey", "left",
    )
    checks = [
        agg_check(
            "lineitem_qty_range", li,
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
        ),
        agg_check("lineitem_orphan_orderkey", orphan, F.col("__hit").isNull()),
        agg_check(
            "orders_custkey_not_null", orders, F.col("o_custkey").isNull()
        ),
        orders.agg(
            F.count(F.lit(1)).alias("n_checked"),
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
            .alias("n_failed"),
        ).select(
            F.lit("orders_orderkey_unique").alias("chk"),
            "n_checked", "n_failed",
        ),
        agg_check(
            "docs_nchars_matches_text", docs,
            F.col("n_chars") != F.length("text"),
        ),
        agg_check("events_value_nonneg", ev, F.col("value") < 0),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.select(
        "chk",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_failed").cast("long").alias("n_failed"),
        (F.col("n_failed") == 0).cast("int").alias("passed"),
    ).orderBy("chk")


@register(
    "q_ivm_agg",
    sql="""
    -- the DIRECT recompute over (base - deletes + inserts): hash
    -- equality against the Spark side's maintained result PROVES the
    -- incremental algebra correct
    WITH world AS (SELECT * FROM lineitem
                   WHERE l_orderkey % 10 = 0
                      OR l_orderkey % 7 != 0)
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 2)
               AS sum_qty,
           round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                 / 100.0, 2) AS sum_price
    FROM world GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_ivm_agg(spark, sf_dir):
    """Incremental view maintenance of a grouped aggregate under a
    change batch (the DBSP / Materialize delta-multiplicity algebra):
    yesterday's aggregate snapshot absorbs today's inserts (+1) and
    deletes (-1) by ADDING a delta aggregate — sum(mult),
    sum(mult * x) — through a full-outer merge on the group key, with
    zero-count groups retired.  The base table is NEVER rescanned;
    maintenance cost is O(|changes| + |groups|).

    The simulated world: base = lineitem with l_orderkey % 10 != 0;
    inserts = the % 10 == 0 rows; deletes = base rows with
    l_orderkey % 7 == 0.  The ORACLE computes the direct recompute
    over (base - deletes + inserts), so the driver's hash equality is
    a PROOF that maintained == recomputed — the correctness property
    IVM systems certify.

    Exactness: counts and centi-int measure sums form an abelian
    group under addition (the whole point — deletes are additive
    inverses), so maintenance is engine- and layout-exact.  Scale:
    the maintained path aggregates ONLY the change batch plus a
    group-cardinality merge join; at 100 TB that is the difference
    between touching a day's delta and rescanning the lake."""
    li = load_table(spark, sf_dir, "lineitem")
    key = ["l_returnflag", "l_linestatus"]
    qty = F.round(F.col("l_quantity") * 100).cast("long")
    price = F.round(F.col("l_extendedprice") * 100).cast("long")

    def agg(df, mult):
        return df.groupBy(*key).agg(
            F.sum(mult).alias("d_n"),
            F.sum(mult * qty).alias("d_qty"),
            F.sum(mult * price).alias("d_price"),
        )

    base = li.filter(F.col("l_orderkey") % 10 != 0)
    inserts = li.filter(F.col("l_orderkey") % 10 == 0)
    deletes = base.filter(F.col("l_orderkey") % 7 == 0)
    # yesterday's snapshot (in production: read from the state store)
    old = agg(base, F.lit(1))
    # today's delta: ONE aggregate over the change batch only
    changes = inserts.withColumn("mult", F.lit(1)).unionByName(
        deletes.withColumn("mult", F.lit(-1))
    )
    delta = agg(changes, F.col("mult"))
    merged = (
        old.select(
            *key,
            F.col("d_n").alias("o_n"),
            F.col("d_qty").alias("o_qty"),
            F.col("d_price").alias("o_price"),
        )
        .join(delta, key, "full_outer")
        .select(
            *key,
            (
                F.coalesce("o_n", F.lit(0)) + F.coalesce("d_n", F.lit(0))
            ).alias("n"),
            (
                F.coalesce("o_qty", F.lit(0)) + F.coalesce("d_qty", F.lit(0))
            ).alias("q"),
            (
                F.coalesce("o_price", F.lit(0))
                + F.coalesce("d_price", F.lit(0))
            ).alias("p"),
        )
        .filter(F.col("n") > 0)  # retire emptied groups
    )
    return merged.select(
        *key,
        F.col("n").cast("long").alias("n_rows"),
        F.round(F.col("q") / 100.0, 2).alias("sum_qty"),
        F.round(F.col("p") / 100.0, 2).alias("sum_price"),
    ).orderBy(*key)


@register(
    "q_ivm_join",
    sql="""
    -- direct recompute of the join view over the post-change state:
    -- hash equality vs the Spark side's delta-rule maintenance
    -- certifies the bilinear join algebra
    WITH o_new AS (SELECT * FROM orders
                   WHERE o_orderkey % 10 = 0
                      OR o_orderkey % 13 != 0),
    l_new AS (SELECT * FROM lineitem
              WHERE l_orderkey % 9 = 0
                 OR l_orderkey % 11 != 0)
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_centi
    FROM o_new o JOIN l_new l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def q_ivm_join(spark, sf_dir):
    """Incremental maintenance of a JOIN view under changes to BOTH
    sides — the bilinear delta rule every IVM engine implements:
    d(O JOIN L) = dO JOIN L_old + O_old JOIN dL + dO JOIN dL, with
    joined-row multiplicity = mult_o * mult_l, then the q_ivm_agg
    abelian merge into the snapshot.  Maintenance never re-executes
    the base-times-base join — each delta term is bounded by a change
    batch on at least one side.  (This simulation materializes
    yesterday's snapshot live as fixture setup; production reads it
    from the state store, leaving only the three delta terms.)

    Simulated world: O loses o_orderkey % 13 rows and gains the
    % 10 == 0 partition; L loses l_orderkey % 11 rows and gains
    % 9 == 0.  The ORACLE recomputes the view directly over the
    post-change tables, so the driver's hash equality certifies
    maintained == recomputed for a two-sided change set —
    including the dO JOIN dL cross term naive implementations drop.

    Exactness: multiplicities and centi-int measures form the
    abelian group; every term is an exact integer sum.  Scale: the
    delta joins shuffle only change batches against the other side
    (or each other); the final merge is group-cardinality."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity") * 100).cast("long")

    o_base = orders.filter(F.col("o_orderkey") % 10 != 0)
    do = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("mo", F.lit(1))
        .unionByName(
            o_base.filter(F.col("o_orderkey") % 13 == 0)
            .withColumn("mo", F.lit(-1))
        )
        .select("o_orderkey", "o_orderpriority", "mo")
    )
    l_base = li.filter(F.col("l_orderkey") % 9 != 0)
    dl = (
        li.filter(F.col("l_orderkey") % 9 == 0)
        .withColumn("ml", F.lit(1))
        .unionByName(
            l_base.filter(F.col("l_orderkey") % 11 == 0)
            .withColumn("ml", F.lit(-1))
        )
        .select("l_orderkey", qty.alias("qc"), "ml")
    )
    ob = o_base.select("o_orderkey", "o_orderpriority")
    lb = l_base.select("l_orderkey", qty.alias("qc"))

    def term(odf, ldf, mult):
        return (
            odf.join(ldf, odf["o_orderkey"] == ldf["l_orderkey"])
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(
                F.sum(mult).alias("d_n"),
                F.sum(mult * F.col("qc")).alias("d_q"),
            )
        )

    old = term(ob, lb, F.lit(1))
    d1 = term(do, lb, F.col("mo"))
    d2 = term(ob, dl, F.col("ml"))
    d3 = term(do, dl, F.col("mo") * F.col("ml"))
    delta = d1.unionByName(d2).unionByName(d3).groupBy("priority").agg(
        F.sum("d_n").alias("d_n"), F.sum("d_q").alias("d_q")
    )
    merged = (
        old.select(
            "priority",
            F.col("d_n").alias("o_n"), F.col("d_q").alias("o_q"),
        )
        .join(delta, "priority", "full_outer")
        .select(
            "priority",
            (
                F.coalesce("o_n", F.lit(0)) + F.coalesce("d_n", F.lit(0))
            ).alias("n"),
            (
                F.coalesce("o_q", F.lit(0)) + F.coalesce("d_q", F.lit(0))
            ).alias("q"),
        )
        .filter(F.col("n") > 0)
    )
    return merged.select(
        "priority",
        F.col("n").cast("long").alias("n_rows"),
        F.col("q").cast("long").alias("qty_centi"),
    ).orderBy("priority")


@register(
    "q_small_qty_revenue",
    sql="""
    WITH pa AS (SELECT l_partkey,
                       sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sq,
                       count(*) AS n
                FROM lineitem GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_small,
           round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                 / 100.0 / 7.0, 2) AS avg_weekly_revenue
    FROM lineitem l JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE CAST(round(l.l_quantity * 100) AS BIGINT) * pa.n * 5 < pa.sq
    """,
)
def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): lineitems
    whose quantity is below 20% of their part's average — the
    correlated-scalar-subquery classic, decorrelated the Spark way
    into one per-part aggregate joined back to the fact table; the
    predicate compares integer cross products (q * n * 5 < sum_q), so
    no per-part division and no float threshold.

    Exactness: centi-int quantities/prices, integer predicate, one
    final division pair.  Scale: the per-part aggregate is
    part-cardinality and map-side combined; the join back is
    key-partitioned fact x part-agg (AQE broadcasts it when small) —
    the plan Q17 wants at any scale, with no correlated re-scan."""
    li = load_table(spark, sf_dir, "lineitem")
    qc = F.round(F.col("l_quantity") * 100).cast("long")
    pa = li.groupBy("l_partkey").agg(
        F.sum(qc).alias("sq"), F.count(F.lit(1)).alias("n")
    )
    j = li.join(pa, "l_partkey").filter(qc * F.col("n") * 5 < F.col("sq"))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_small"),
        F.round(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            / 100.0 / 7.0,
            2,
        ).alias("avg_weekly_revenue"),
    )


@register(
    "q_ivm_distinct",
    sql="""
    -- direct recompute of the post-change DISTINCT counts
    WITH world AS (SELECT * FROM lineitem
                   WHERE l_orderkey % 10 = 0
                      OR l_orderkey % 7 != 0)
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM world GROUP BY 1 ORDER BY 1
    """,
)
def q_ivm_distinct(spark, sf_dir):
    """Incremental maintenance of COUNT(DISTINCT) — the NON-abelian
    aggregate the q_ivm_agg algebra alone cannot handle: distinct
    counts don't subtract (deleting one of two copies of a value must
    NOT decrement).  The standard fix is one level of support
    counting: maintain per-(group, value) multiplicity totals (an
    abelian view!), then distinct = COUNT of values with support > 0.
    Same simulated change set as q_ivm_agg; the oracle recomputes the
    post-change distinct counts directly, so the hash match certifies
    the two-level construction.

    Exactness: support counts are integer sums.  Scale: maintenance
    aggregates only the change batch to (group, value) deltas and
    merges into the support store — the store is value-cardinality
    (that's the price of exact distinct under deletes; the
    sketch-path alternative, q_theta_sets, trades it away when
    deletes don't happen)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_orderkey") % 10 != 0)
    inserts = li.filter(F.col("l_orderkey") % 10 == 0)
    deletes = base.filter(F.col("l_orderkey") % 7 == 0)
    key = ["l_returnflag", "l_partkey"]
    # yesterday's support store (production: read from the store)
    old = base.groupBy(*key).agg(F.count(F.lit(1)).alias("s"))
    changes = inserts.withColumn("mult", F.lit(1)).unionByName(
        deletes.withColumn("mult", F.lit(-1))
    )
    delta = changes.groupBy(*key).agg(F.sum("mult").alias("d"))
    support = (
        old.join(delta, key, "full_outer")
        .select(
            "l_returnflag", "l_partkey",
            (
                F.coalesce("s", F.lit(0)) + F.coalesce("d", F.lit(0))
            ).alias("s"),
        )
        .filter(F.col("s") > 0)
    )
    return (
        support.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("s").cast("long").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_price_index",
    sql="""
    WITH li AS (SELECT l_partkey,
                       CASE WHEN CAST(l_shipdate AS DATE)
                                 < DATE '1998-07-01'
                            THEN 0 ELSE 1 END AS period,
                       CAST(round(l_extendedprice * 100 / l_quantity)
                            AS BIGINT) AS unit_centi,
                       CAST(l_quantity AS BIGINT) AS q
                FROM lineitem WHERE l_quantity > 0),
    pp AS (SELECT l_partkey, period,
                  CAST(round(sum(unit_centi * q)
                             / CAST(sum(q) AS DOUBLE)) AS BIGINT) AS p,
                  sum(q) AS q
           FROM li GROUP BY 1, 2),
    m AS (SELECT a.l_partkey, a.p AS p0, a.q AS q0, b.p AS p1, b.q AS q1
          FROM pp a JOIN pp b
            ON a.l_partkey = b.l_partkey AND a.period = 0
           AND b.period = 1),
    s AS (SELECT count(*) AS n_parts,
                 sum(p0 * q0) AS p0q0, sum(p1 * q0) AS p1q0,
                 sum(p0 * q1) AS p0q1, sum(p1 * q1) AS p1q1
          FROM m)
    SELECT CAST(n_parts AS BIGINT) AS n_matched_parts,
           round(CAST(p1q0 AS DOUBLE) / p0q0, 6) AS laspeyres,
           round(CAST(p1q1 AS DOUBLE) / p0q1, 6) AS paasche,
           round(sqrt((CAST(p1q0 AS DOUBLE) / p0q0)
                      * (CAST(p1q1 AS DOUBLE) / p0q1)), 6) AS fisher
    FROM s
    """,
)
def q_price_index(spark, sf_dir):
    """Price-index numbers across two periods (pre/post 1998-07, the
    fixture's midpoint): Laspeyres (base-period basket), Paasche
    (current basket) and their Fisher geometric mean over the MATCHED
    part set — the economics-grade answer to 'did prices move or did
    the mix move', which a naive average-price delta conflates.

    Exactness: per-(part, period) unit prices are quantity-weighted
    centi-int means rounded once; the four index numerators/
    denominators are exact integer products and sums; each index is
    one division.  Scale: two part-keyed map-side aggregates and a
    part-keyed self-join — part-cardinality throughout, never
    line-level past the first combine."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .select(
            "l_partkey",
            F.when(
                F.col("l_shipdate").cast("date") < F.lit("1998-07-01"), 0
            ).otherwise(1).alias("period"),
            F.round(
                F.col("l_extendedprice") * 100 / F.col("l_quantity")
            ).cast("long").alias("unit_centi"),
            F.col("l_quantity").cast("long").alias("q"),
        )
    )
    pp = li.groupBy("l_partkey", "period").agg(
        F.round(
            F.sum(F.col("unit_centi") * F.col("q"))
            / F.sum("q").cast("double")
        ).cast("long").alias("p"),
        F.sum("q").alias("q"),
    )
    a = pp.filter(F.col("period") == 0).select(
        "l_partkey", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    b = pp.filter(F.col("period") == 1).select(
        "l_partkey", F.col("p").alias("p1"), F.col("q").alias("q1")
    )
    m = a.join(b, "l_partkey")
    c = F.col
    s = m.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(c("p0") * c("q0")).alias("p0q0"),
        F.sum(c("p1") * c("q0")).alias("p1q0"),
        F.sum(c("p0") * c("q1")).alias("p0q1"),
        F.sum(c("p1") * c("q1")).alias("p1q1"),
    )
    lasp = c("p1q0").cast("double") / c("p0q0")
    paas = c("p1q1").cast("double") / c("p0q1")
    return s.select(
        c("n_parts").cast("long").alias("n_matched_parts"),
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


@register(
    "q_abc_analysis",
    sql="""
    WITH pr AS (SELECT l_partkey,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                           AS rev
                FROM lineitem GROUP BY 1),
    c AS (SELECT l_partkey, rev,
                 sum(rev) OVER (ORDER BY rev DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS crev,
                 sum(rev) OVER () AS trev
          FROM pr),
    k AS (SELECT l_partkey, rev,
                 CASE WHEN (crev - rev) * 100 < trev * 80 THEN 'A'
                      WHEN (crev - rev) * 100 < trev * 95 THEN 'B'
                      ELSE 'C' END AS cls
          FROM c)
    SELECT cls,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(rev) / 100.0, 2) AS revenue,
           round(sum(rev) / CAST(max(t.trev) AS DOUBLE), 6)
               AS revenue_share
    FROM k CROSS JOIN (SELECT max(trev) AS trev FROM c) t
    GROUP BY cls ORDER BY cls
    """,
)
def q_abc_analysis(spark, sf_dir):
    """ABC / Pareto classification of parts by revenue (A = the head
    carrying the first 80% of cumulative revenue, B to 95%, C the
    tail) — the inventory-management classic and the 'what fraction
    of the corpus carries the value' question data-pruning asks of
    documents.  Class assignment uses the EXCLUSIVE prefix (crev -
    rev), so the part that crosses a boundary still belongs to the
    class it completes.

    Exactness: revenues are centi-ints, class boundaries compare
    integer cross products (crev*100 < trev*80 — no float shares
    before the final report).  Scale: the part-revenue table GROWS
    with the catalog, so the descending cumsum rides the two-phase
    value-cut global_cumsum (order on the negated revenue — the
    q_pr_auc shape; no single-partition window at any catalog size);
    the 1-row total joins back broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("rev")
    )
    from shadems_spark.operators.profile import global_cumsum

    # total order: revenue DESC (negated for the ascending scan)
    # then part key ASC — matching the oracle's tie-break exactly
    pr2 = pr.withColumn("nrev", -F.col("rev"))
    cs = global_cumsum(pr2, ["nrev", "l_partkey"], {"crev": "rev"})
    tot = pr.agg(F.sum("rev").alias("trev"))
    c = cs.crossJoin(F.broadcast(tot)).select(
        "l_partkey", "rev", "crev", "trev"
    )
    cls = F.when(
        (F.col("crev") - F.col("rev")) * 100 < F.col("trev") * 80, "A"
    ).when(
        (F.col("crev") - F.col("rev")) * 100 < F.col("trev") * 95, "B"
    ).otherwise("C")
    k = c.select("l_partkey", "rev", "trev", cls.alias("cls"))
    return (
        k.groupBy("cls")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(F.sum("rev") / 100.0, 2).alias("revenue"),
            F.round(
                F.sum("rev") / F.max("trev").cast("double"), 6
            ).alias("revenue_share"),
        )
        .orderBy("cls")
    )
