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

_VIS = vis_sql_from("lineitem")

def _scratch_root() -> str:
    """Per-PROCESS scratch dir (.scratch/p<pid>): two concurrent
    harness processes (e.g. the default and local[3] oracle gates)
    must never rmtree/overwrite each other's sink fixtures mid-scan
    (observed: q_binary_ingest flake under concurrent gates).  Stale
    siblings from dead pids are best-effort reaped on import."""
    base = os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
        ".scratch",
    )
    me = os.path.join(base, f"p{os.getpid()}")
    try:
        for d in os.listdir(base):
            if d.startswith("p") and d[1:].isdigit() and int(d[1:]) != os.getpid():
                try:
                    os.kill(int(d[1:]), 0)
                except ProcessLookupError:
                    import shutil

                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)
                except PermissionError:
                    pass
    except FileNotFoundError:
        pass
    return me


_SCRATCH = _scratch_root()


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


@register("q_approx_distinct", sql=None)  # HLL sketch: engine-specific
def q_approx_distinct(spark, sf_dir):
    """G11 approximate variant: HLL sketch distinct counts (rows-only:
    sketch estimates are engine-specific by nature)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
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
    "q_corr",
    sql="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
           round(covar_pop(l_discount, l_tax), 8) AS cov_disc_tax,
           round(stddev_samp(l_extendedprice), 4) AS sd_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_corr(spark, sf_dir):
    """Column-pair statistics battery (corr / covariances / stddev per
    group) — the one-pass feature-correlation profile step of a data
    audit.  All four moments ride ONE partial-aggregable scan (each is
    sums/products — map-side combine; no second pass per pair)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qty_price"),
        F.round(F.covar_pop("l_discount", "l_tax"), 8).alias("cov_disc_tax"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
    )


@register(
    "q_sessionize",
    sql="""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
               FROM events WHERE user_id % 11 = 0),
    g AS (SELECT *,
                 CASE WHEN ts_us - lag(ts_us) OVER
                          (PARTITION BY user_id ORDER BY ts_us, event_id)
                      > 1800000000 OR lag(ts_us) OVER
                          (PARTITION BY user_id ORDER BY ts_us, event_id)
                      IS NULL THEN 1 ELSE 0 END AS new_sess
          FROM e),
    s AS (SELECT user_id, event_id,
                 CAST(sum(new_sess) OVER
                     (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
          FROM g)
    SELECT user_id, session_no, count(*) AS n_events
    FROM s GROUP BY 1, 2
    """,
)
def q_sessionize(spark, sf_dir):
    """Batch sessionization with explicit session IDs (gaps-and-islands:
    a 30-minute silence starts a new session; running sum of the
    new-session flags numbers them).  Complements session_window (S3),
    which aggregates but never exposes the id.  Both windows share the
    per-user partition, so one shuffle serves the whole chain."""
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 11 == 0)
        .select("user_id", "event_id", F.expr("ts_ns div 1000").alias("ts_us"))
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    new_sess = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn(
        "session_no",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "q_funnel",
    sql="""
    WITH f AS (SELECT user_id,
                      min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
                      min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
                      min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
               FROM events GROUP BY user_id)
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
           CAST(sum(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
           CAST(sum(CASE WHEN t_view < t_click AND t_click < t_buy THEN 1 ELSE 0 END) AS BIGINT) AS step_buy
    FROM f
    """,
)
def q_funnel(spark, sf_dir):
    """Ordered-funnel analysis (view -> click -> purchase): earliest
    per-step timestamps per user in ONE conditional aggregate, then
    ordering comparisons — no self-joins, no per-step scans; the only
    shuffle is the per-user agg."""
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("ts_ns div 1000")
    step = lambda t: F.min(F.when(F.col("event_type") == t, us))
    f = ev.groupBy("user_id").agg(
        step("view").alias("t_view"),
        step("click").alias("t_click"),
        step("purchase").alias("t_buy"),
    )
    return f.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("t_view").isNotNull().cast("int")).cast("long").alias("step_view"),
        F.sum((F.col("t_view") < F.col("t_click")).cast("int")).cast("long").alias("step_click"),
        F.sum(
            ((F.col("t_view") < F.col("t_click")) & (F.col("t_click") < F.col("t_buy"))).cast("int")
        ).cast("long").alias("step_buy"),
    )


@register(
    "q_retention",
    sql="""
    WITH firsts AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
                    FROM events GROUP BY user_id),
    act AS (SELECT DISTINCT e.user_id, f.cohort,
                   date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS day_off
            FROM events e JOIN firsts f USING (user_id))
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort, day_off,
           count(*) AS n_active
    FROM act WHERE day_off <= 7 GROUP BY 1, 2
    """,
)
def q_retention(spark, sf_dir):
    """Cohort retention: users keyed by first-seen day, activity
    counted per (cohort, day-offset) for the first week.  The firsts
    table is per-user (broadcastable at dim scale); the distinct
    rides the same (user, day) shuffle as the join output."""
    ev = load_table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    act = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort",
            F.datediff("d", "cohort").alias("day_off"),
        )
        .distinct()
    )
    return (
        act.filter(F.col("day_off") <= 7)
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"), "day_off"
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "q_weighted_sample",
    sql="""
    WITH w AS (SELECT doc_id, lang, n_chars,
                      least(1.0, sqrt(n_chars) / 40.0) AS keep_rate,
                      ((doc_id * 2654435761) % 4294967296) / 4294967296.0 AS u
               FROM documents)
    SELECT lang, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS key_sum
    FROM w WHERE u < keep_rate GROUP BY lang
    """,
)
def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted Bernoulli sampling: per-row keep rate
    from a weight column (here sqrt(n_chars), the length-balanced
    sampling a curation pipeline uses), decided by a multiplicative
    key hash — identical on every run/engine/retry, unlike rand();
    map-side only, no shuffle before the audit agg."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.least(F.lit(1.0), F.sqrt(F.col("n_chars")) / F.lit(40.0))
    u = ((F.col("doc_id") * F.lit(2654435761)) % F.lit(1 << 32)) / F.lit(
        float(1 << 32)
    )
    return (
        docs.filter(u < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("key_sum"),
        )
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
    "q_latency_bands",
    sql="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY 1
    """,
)
def q_latency_bands(spark, sf_dir):
    """Daily P50/P95/P99 bands over the event value stream — the SLO
    dashboard aggregate.  Exact interpolated percentiles per day key
    (both engines share the definition); at 100 TB the same plan swaps
    percentile for percentile_approx's t-digest without reshaping."""
    ev = load_table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    return ev.groupBy(F.date_format("d", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@register("q_latency_tdigest", sql=None)  # sketch percentiles: engine-specific
def q_latency_tdigest(spark, sf_dir):
    """q_latency_bands' documented 100-TB path (VERDICT r03 #8): the
    exact per-day percentile sorts every group's values; this variant
    swaps in percentile_approx — Spark's bounded-memory quantile
    sketch (GK/t-digest-style, mergeable across partitions), accuracy
    set to 1/10000 relative rank.  Same plan shape, fixed-size
    aggregate state per (day) key regardless of group row count.
    Rows-only by nature (sketch estimates are engine-specific);
    accuracy vs the exact form is pinned in tests/test_core.py."""
    ev = load_table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    return ev.groupBy(F.date_format("d", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile_approx("value", F.lit(0.5), F.lit(10000)), 4).alias("p50"),
        F.round(F.percentile_approx("value", F.lit(0.95), F.lit(10000)), 4).alias("p95"),
        F.round(F.percentile_approx("value", F.lit(0.99), F.lit(10000)), 4).alias("p99"),
    )


def _pagerank_oracle(iters: int = 5, damping_pct: int = 85, topk: int = 20) -> str:
    """Unrolled fixed-point PageRank: r0..r{iters} CTEs, all integer
    arithmetic (DuckDB `//` == Spark `div` for positives), so every
    iteration is bit-identical to operators/graph.py::pagerank_fixed
    regardless of summation order."""
    parts = [
        """
    WITH e1 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                WHERE o_orderkey % 3 = 0),
    edges AS (SELECT src, dst FROM e1 UNION SELECT dst, src FROM e1),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST(1000000000 // n AS BIGINT) AS r FROM nodes, nn)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
    r{t} AS (SELECT agg.node,
                    CAST((100 - {damping_pct}) * CAST(1000000000 AS BIGINT) // 100 // nn.n
                         + ({damping_pct} * agg.s) // 100 AS BIGINT) AS r
             FROM (SELECT e.dst AS node, sum(r{t-1}.r // deg.d) AS s
                   FROM edges e
                   JOIN r{t-1} ON r{t-1}.node = e.src
                   JOIN deg ON deg.src = e.src
                   GROUP BY e.dst) agg, nn)"""
        )
    parts.append(
        f"""
    SELECT node, r FROM r{iters} ORDER BY r DESC, node LIMIT {topk}"""
    )
    return "".join(parts)


@register("q_pagerank", sql=_pagerank_oracle())
def q_pagerank(spark, sf_dir):
    """Distributed PageRank over the symmetric customer<->supplier
    co-purchase graph (operators/graph.py::pagerank_fixed): 5
    fixed-point sweeps — rank-to-edge join + integer groupBy sum per
    iteration, the canonical distributed-PageRank step.  Fixed-point
    1e9-scaled integer arithmetic makes the whole iteration
    summation-order-free, so the unrolled oracle matches exactly.
    Driver state is ONE integer (the node count); top-20 exits via
    TakeOrdered."""
    from shadems_spark.operators.graph import pagerank_fixed, symmetric_edges

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 3 == 0
    )
    li = load_table(spark, sf_dir, "lineitem")
    e1 = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    from shadems_spark.operators.dedup import tracked_persist

    # the edge table feeds every sweep (5 joins) plus deg and the node
    # count; without a persist each iteration's lineage re-scans the
    # orders x lineitem join — the one thing a 100-TB PageRank must
    # never do.  The n_nodes count also materializes the cache.
    edges = tracked_persist(symmetric_edges(e1), key="pagerank_edges")
    n_nodes = edges.select("src").distinct().count()
    ranks = pagerank_fixed(edges, n_nodes, iters=5, damping_pct=85)
    return ranks.orderBy(F.col("r").desc(), F.col("node")).limit(20)


@register(
    "q_theta_sets",
    sql="""
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    a AS (SELECT DISTINCT user_id FROM events)
    SELECT (SELECT count(*) FROM c) AS n_click,
           (SELECT count(*) FROM p) AS n_purchase,
           (SELECT count(*) FROM (SELECT * FROM c UNION SELECT * FROM p))
             AS n_union,
           (SELECT count(*) FROM (SELECT * FROM c INTERSECT SELECT * FROM p))
             AS n_intersect,
           (SELECT count(*) FROM (SELECT * FROM c EXCEPT SELECT * FROM p))
             AS n_click_only,
           (SELECT count(*) FROM a) AS n_all
    """,
)
def q_theta_sets(spark, sf_dir):
    """Theta-sketch set algebra (DataSketches, Spark 4 builtins):
    per-event-type user sketches, then union / intersection /
    difference estimates WITHOUT re-touching the raw data — the
    mergeable-sketch workflow that replaces exact distinct at 100 TB
    (persist the per-partition sketches, answer any set-algebra
    question later from kilobytes).  At the harness scales the
    distinct user count (<=1500) is far below the sketch's k=4096
    exact-mode bound, so every estimate is EXACT and the query runs
    under the same exact-count oracle as any other — the estimate
    semantics, not the error bound, are what is being verified.
    [R] SURVEY §2 G11 extension."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("t")
    )
    c = sk.filter(F.col("event_type") == "click").select(F.col("t").alias("tc"))
    p = sk.filter(F.col("event_type") == "purchase").select(
        F.col("t").alias("tp")
    )
    allu = sk.agg(F.expr("theta_union_agg(t)").alias("ta"))
    return (
        c.crossJoin(p)
        .crossJoin(allu)
        .select(
            F.theta_sketch_estimate("tc").alias("n_click"),
            F.theta_sketch_estimate("tp").alias("n_purchase"),
            F.theta_sketch_estimate(F.expr("theta_union(tc, tp)")).alias(
                "n_union"
            ),
            F.theta_sketch_estimate(
                F.expr("theta_intersection(tc, tp)")
            ).alias("n_intersect"),
            F.theta_sketch_estimate(F.expr("theta_difference(tc, tp)")).alias(
                "n_click_only"
            ),
            F.theta_sketch_estimate("ta").alias("n_all"),
        )
    )


@register("q_kll_quantiles", sql=None)  # sketch estimates: no exact SQL form
def q_kll_quantiles(spark, sf_dir):
    """KLL quantile sketches (DataSketches, Spark 4 builtins): one
    sketch per (event_type, day), then kll_merge_agg_double rolls the
    daily sketches up per event_type — the re-mergeable fixed-size
    quantile state that lets a 100-TB pipeline persist per-partition
    sketches once and serve any later percentile question (or any
    regrouping: day->week->all) from the stored bytes, never
    re-scanning values.  Rank accuracy vs the exact per-type
    percentiles is pinned in tests (the KLL guarantee is on rank,
    ~1.7% at the default k=200)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("event_type", "day")
        .agg(F.kll_sketch_agg_double("value").alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(F.expr("kll_merge_agg_double(sk)").alias("m"))
        .select(
            "event_type",
            F.round(
                F.kll_sketch_get_quantile_double(F.col("m"), F.lit(0.5)), 4
            ).alias("p50"),
            F.round(
                F.kll_sketch_get_quantile_double(F.col("m"), F.lit(0.95)), 4
            ).alias("p95"),
            F.round(
                F.kll_sketch_get_quantile_double(F.col("m"), F.lit(0.99)), 4
            ).alias("p99"),
            F.kll_sketch_get_n_double("m").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "q_ewma",
    sql="""
    WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
                      count(*) AS n_ev,
                      CAST(sum(CAST(round(value * 1e9) AS BIGINT))
                           AS BIGINT) AS sv_n
               FROM events GROUP BY 1, 2),
    s AS (SELECT user_id, CAST(sum(n_ev) AS BIGINT) AS n,
                 list((sv_n / CAST(n_ev AS DOUBLE)) / 1e9
                      ORDER BY day) AS ys
          FROM d GROUP BY 1)
    SELECT user_id, n,
           round(list_reduce(ys, (a, b) -> 0.25 * b + 0.75 * a), 6) AS ewma
    FROM s ORDER BY user_id
    """,
)
def q_ewma(spark, sf_dir):
    """Exponentially-weighted moving average of each user's DAILY
    mean value (alpha=0.25, seeded at the first observed day) — the
    time-series smoothing primitive windows can't express (a linear
    recurrence).

    Bounded grain (VERDICT r6 #5): the former form folded each
    user's raw event series in one array cell — a hot key with 1e8
    events at 100 TB is a single-row OOM.  The fold input is now the
    per-(user, day) pre-aggregate, CALENDAR-BOUNDED by construction
    (the q_holt shape); the raw-event stage is a map-side-combined
    aggregate, and truly unbounded streams use the O(1)-state
    applyInPandasWithState running form (streaming/stateful.py
    stream_ewma).

    Exactness: per-day sums ride the nano-int protocol (summation-
    order-free), the daily mean is one double division replayed
    identically, and both engines fold left-to-right over the
    identically-ordered day list — hash-exact at 6dp."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_ev"),
            F.sum(F.round(F.col("value") * 1e9).cast("long")).alias("sv_n"),
        )
        .withColumn(
            "y", (F.col("sv_n") / F.col("n_ev").cast("double")) / F.lit(1e9)
        )
    )
    vals = F.transform(
        F.sort_array(F.collect_list(F.struct("day", "y"))),
        lambda s: s["y"],
    )
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda a, x: F.lit(0.25) * x + F.lit(0.75) * a,
    )
    return (
        d.groupBy("user_id")
        .agg(
            F.sum("n_ev").cast("long").alias("n"),
            F.round(ewma, 6).alias("ewma"),
        )
        .orderBy("user_id")
    )


#: Poisson(1) CDF boundaries scaled to the u-hash modulus 1000003
#: (floor(CDF_k * 1000003) for k = 0..5; mass beyond 6 truncated,
#: ~1e-4): the weight lookup both engines replay in exact integers.
_POIS_T = [367880, 735761, 919701, 981014, 996343, 999408]
_POIS_CASE_SQL = (
    "CASE "
    + " ".join(f"WHEN h < {t} THEN {k}" for k, t in enumerate(_POIS_T))
    + " ELSE 6 END"
)


@register(
    "q_bootstrap_ci",
    sql=f"""
    WITH reps AS (SELECT unnest(range(32)) AS r),
    x AS (SELECT d.n_chars, reps.r,
                 (d.doc_id * 1103515245 + reps.r * 12345 + 6789) % 1000003 AS h
          FROM documents d CROSS JOIN reps),
    w AS (SELECT r, n_chars, {_POIS_CASE_SQL} AS wt FROM x)
    SELECT r, CAST(sum(wt) AS BIGINT) AS n_eff,
           round(sum(wt * n_chars) / CAST(sum(wt) AS DOUBLE), 4) AS mean_chars
    FROM w GROUP BY r ORDER BY r
    """,
)
def q_bootstrap_ci(spark, sf_dir):
    """Poisson bootstrap of mean document length, 32 replicates in ONE
    scan (the large-scale resampling shape: per (row, replicate) a
    deterministic Poisson(1) weight approximates multinomial
    resampling, so the bootstrap needs no shuffling of the data into
    R resamples — Chamandy et al., 'Estimating uncertainty for
    massive data streams', Google 2012).  The replicate axis is an
    exploded literal sequence (no join); weights come from an integer
    LCG hash of (doc_id, r) bucketed by the Poisson(1) CDF in EXACT
    integer thresholds (_POIS_T), so every engine and layout draws the
    identical resamples — a Monte-Carlo method with a hash-exact
    oracle.  The 32 replicate means ARE the sampling distribution;
    percentile CI = quantiles of this 32-row result (pinned in
    tests).

    Scale shape: rows expand x32 BEFORE a map-side-combined aggregate,
    so the shuffle is 32 rows per partition regardless of corpus size;
    nothing else moves.  At 100 TB this is the only practical
    bootstrap — resample-and-recompute would be 32 full jobs."""
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        "doc_id", "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("r"),
    ).withColumn(
        "h",
        (F.col("doc_id") * F.lit(1103515245) + F.col("r") * F.lit(12345)
         + F.lit(6789)) % F.lit(1000003),
    )
    wt = F.lit(6)
    for k, t in reversed(list(enumerate(_POIS_T))):
        wt = F.when(F.col("h") < t, F.lit(k)).otherwise(wt)
    return (
        x.withColumn("wt", wt)
        .groupBy("r")
        .agg(
            F.sum("wt").alias("n_eff"),
            F.round(
                F.sum(F.col("wt") * F.col("n_chars"))
                / F.sum("wt").cast("double"),
                4,
            ).alias("mean_chars"),
        )
        .orderBy("r")
    )


@register(
    "q_anomaly",
    sql="""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                          count(*) AS x
                   FROM events GROUP BY 1, 2),
    st AS (SELECT event_type, count(*) AS n,
                  CAST(sum(x) AS BIGINT) AS s,
                  CAST(sum(x * x) AS BIGINT) AS q
           FROM daily GROUP BY 1)
    SELECT daily.event_type, d, x,
           round((x - s / CAST(n AS DOUBLE))
                 / sqrt((q - s * (s / CAST(n AS DOUBLE))) / n), 6) AS z,
           CAST(abs((x - s / CAST(n AS DOUBLE))
                    / sqrt((q - s * (s / CAST(n AS DOUBLE))) / n)) >= 2.0
                AS INT) AS is_anomaly
    FROM daily JOIN st USING (event_type)
    ORDER BY event_type, d
    """,
)
def q_anomaly(spark, sf_dir):
    """Daily-count anomaly scoring per event type: z-score of each
    day's volume against the type's own mean/std — the first-line
    volume-monitoring alert.  Mean and variance come from EXACT
    integer sums (S, Q over daily counts), so the float arithmetic is
    a fixed expression both engines evaluate identically; every daily
    row is emitted with its z and flag (non-vacuous regardless of
    whether the fixture contains a true spike).  One groupBy over
    events, one type-sized join."""
    daily = (
        load_table(spark, sf_dir, "events")
        .withColumn("d", F.to_date("ts"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    mean = F.col("s") / F.col("n").cast("double")
    std = F.sqrt(
        (F.col("q") - F.col("s") * (F.col("s") / F.col("n").cast("double")))
        / F.col("n")
    )
    z = (F.col("x") - mean) / std
    return (
        daily.join(F.broadcast(st), "event_type")
        .select(
            "event_type", "d", "x",
            F.round(z, 6).alias("z"),
            (F.abs(z) >= 2.0).cast("int").alias("is_anomaly"),
        )
        .orderBy("event_type", "d")
    )


@register(
    "q_cusum",
    sql="""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                          count(*) AS x
                   FROM events GROUP BY 1, 2),
    st AS (SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS s
           FROM daily GROUP BY 1),
    c AS (SELECT daily.event_type, d, n,
                 sum(x) OVER (PARTITION BY daily.event_type ORDER BY d)
                 - (row_number() OVER (PARTITION BY daily.event_type
                                       ORDER BY d))
                   * (s / CAST(n AS DOUBLE)) AS cusum
          FROM daily JOIN st USING (event_type)),
    r AS (SELECT event_type, d, n, cusum,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY abs(cusum) DESC, d) AS rk
          FROM c)
    SELECT event_type, CAST(n AS BIGINT) AS n_days, d AS cp_day,
           round(cusum, 6) AS cusum_at_cp
    FROM r WHERE rk = 1 ORDER BY event_type
    """,
)
def q_cusum(spark, sf_dir):
    """CUSUM changepoint detection per event type: cumulative sum of
    deviations from the series mean over the daily-count series, with
    the candidate changepoint at argmax |CUSUM| (earliest day on
    ties) — the classic level-shift detector behind pipeline-volume
    regression alarms.  Prefix sums are exact integers; the mean
    enters once as a fixed double expression, so the argmax and its
    magnitude are engine- and layout-exact.  One groupBy + one
    type-partitioned window over a days×types-sized frame."""
    daily = (
        load_table(spark, sf_dir, "events")
        .withColumn("d", F.to_date("ts"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    ow = Window.partitionBy("event_type").orderBy("d")
    c = (
        daily.join(F.broadcast(st), "event_type")
        .withColumn(
            "cusum",
            F.sum("x").over(ow)
            - F.row_number().over(ow)
            * (F.col("s") / F.col("n").cast("double")),
        )
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), "d"
    )
    return (
        c.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.col("d").alias("cp_day"),
            F.round("cusum", 6).alias("cusum_at_cp"),
        )
        .orderBy("event_type")
    )


@register(
    "q_khop",
    sql="""
    WITH RECURSIVE e0 AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey % 3 = 0),
    e AS (SELECT src, dst FROM e0
          UNION SELECT dst, src FROM e0),
    seeds AS (SELECT DISTINCT src AS node FROM e
              WHERE src % 2 = 0 AND (src // 2) % 50 = 0),
    r AS (
        SELECT node, 0 AS d FROM seeds
        UNION
        SELECT e.dst AS node, r.d + 1 AS d
        FROM r JOIN e ON e.src = r.node WHERE r.d < 3
    ),
    m AS (SELECT node, min(d) AS dist FROM r GROUP BY 1)
    SELECT dist, count(*) AS n_nodes, CAST(sum(node) AS BIGINT) AS node_sum
    FROM m GROUP BY 1 ORDER BY 1
    """,
)
def q_khop(spark, sf_dir):
    """Bounded BFS reachability: nodes within 3 hops of the seed set
    (every 50th customer) over the symmetric co-purchase graph — the
    neighborhood-expansion primitive under graph sampling and
    influence audits.  Level-synchronous frontier expansion: per hop
    one edge join + distinct + anti-join against the visited set, so
    the frontier is NODE-bounded per level (never path-enumerated —
    the oracle's recursive CTE gets the same property from UNION
    dedup on (node, d)).  Min-hop distance falls out of visiting
    order; per-level counts and exact node-id sums are the integer
    comparison surface.

    Scale: 3 bounded self-joins on the persisted edge table (the
    pagerank edge cache pattern); at 100 TB the frontier join
    partitions by src and the visited anti-join by node — both
    narrow-key shuffles bounded by the reachable set."""
    from shadems_spark.operators.dedup import tracked_persist
    from shadems_spark.operators.graph import symmetric_edges

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 3 == 0
    )
    li = load_table(spark, sf_dir, "lineitem")
    e1 = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = tracked_persist(symmetric_edges(e1), key="khop_edges")
    seeds = (
        edges.select("src")
        .filter((F.col("src") % 2 == 0) & F.expr("(src div 2) % 50 = 0"))
        .select(F.col("src").alias("node"))
        .distinct()
    )
    visited = seeds.withColumn("dist", F.lit(0))
    frontier = seeds
    for d in range(1, 4):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        visited = visited.unionByName(nxt.withColumn("dist", F.lit(d)))
        frontier = nxt
    return (
        visited.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("node").alias("node_sum"),
        )
        .orderBy("dist")
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
    "q_abtest",
    sql="""
    WITH u AS (SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
                      CAST(max(CASE WHEN event_type = 'purchase'
                                    AND value > 95
                               THEN 1 ELSE 0 END) AS INT) AS converted
               FROM events GROUP BY 1),
    g AS (SELECT variant, count(*) AS n,
                 CAST(sum(converted) AS BIGINT) AS conv
          FROM u GROUP BY 1),
    w AS (SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
                 max(CASE WHEN variant = 0 THEN conv END) AS c0,
                 max(CASE WHEN variant = 1 THEN n END) AS n1,
                 max(CASE WHEN variant = 1 THEN conv END) AS c1
          FROM g)
    SELECT CAST(n0 AS BIGINT) AS n_control, CAST(c0 AS BIGINT) AS conv_control,
           CAST(n1 AS BIGINT) AS n_treat, CAST(c1 AS BIGINT) AS conv_treat,
           round(c0 / CAST(n0 AS DOUBLE), 6) AS rate_control,
           round(c1 / CAST(n1 AS DOUBLE), 6) AS rate_treat,
           round((c1 / CAST(n1 AS DOUBLE) - c0 / CAST(n0 AS DOUBLE))
                 / sqrt(((c0 + c1) / CAST(n0 + n1 AS DOUBLE))
                        * (1 - (c0 + c1) / CAST(n0 + n1 AS DOUBLE))
                        * (1.0 / n0 + 1.0 / n1)), 6) AS z
    FROM w
    """,
)
def q_abtest(spark, sf_dir):
    """Two-proportion A/B z-test: per-user conversion (a high-value
    purchase — every user has SOME purchase in this fixture, which
    would degenerate the pooled proportion to 1 and the z denominator
    to 0) split by the deterministic variant hash (user_id parity —
    the assignment IS the experiment bucketing at scale), pooled-
    proportion z statistic.  All inputs are exact integer counts; the
    z expression is one fixed float formula, so the statistic is
    engine-exact at 6dp.  One per-user aggregate + one 2-row pivot —
    the per-user shuffle is the only data-sized move."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase") & (F.col("value") > 95)
            ).cast("int")
        ).alias("converted")
    ).withColumn("variant", (F.col("user_id") % 2).cast("int"))
    g = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    w = g.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    p0 = F.col("c0") / F.col("n0").cast("double")
    p1 = F.col("c1") / F.col("n1").cast("double")
    pp = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1")).cast("double")
    z = (p1 - p0) / F.sqrt(
        pp * (1 - pp) * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    return w.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("c0").cast("long").alias("conv_control"),
        F.col("n1").cast("long").alias("n_treat"),
        F.col("c1").cast("long").alias("conv_treat"),
        F.round(p0, 6).alias("rate_control"),
        F.round(p1, 6).alias("rate_treat"),
        F.round(z, 6).alias("z"),
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
    "q_seasonality",
    sql="""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS x
                   FROM events GROUP BY 1, 2)
    SELECT event_type, CAST(dayofweek(d) + 1 AS INT) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(x) AS BIGINT) AS n_events,
           round(sum(x) / CAST(count(*) AS DOUBLE), 6) AS mean_daily
    FROM daily GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_seasonality(spark, sf_dir):
    """Day-of-week seasonality profile per event type (mean daily
    volume by weekday) — the baseline every volume-anomaly alarm
    normalizes against before flagging a quiet Sunday.  Integer daily
    counts -> one fixed division; NB Spark's dayofweek is
    1=Sunday..7 while DuckDB's is 0-based — the oracle shifts by 1.  Two tiny aggregates."""
    daily = (
        load_table(spark, sf_dir, "events")
        .withColumn("d", F.to_date("ts"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    return (
        daily.withColumn("dow", F.dayofweek("d").cast("int"))
        .groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("x").alias("n_events"),
            F.round(
                F.sum("x") / F.count(F.lit(1)).cast("double"), 6
            ).alias("mean_daily"),
        )
        .orderBy("event_type", "dow")
    )


@register(
    "q_markov",
    sql="""
    WITH s AS (SELECT user_id, event_type, ts, event_id,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS nxt
               FROM events),
    t AS (SELECT event_type AS src, nxt AS dst, count(*) AS n
          FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
    r AS (SELECT src, CAST(sum(n) AS BIGINT) AS out_n FROM t GROUP BY 1)
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           round(n / CAST(out_n AS DOUBLE), 6) AS p
    FROM t JOIN r USING (src) ORDER BY src, dst
    """,
)
def q_markov(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (event-time order, event_id tie-break): the behavioral
    model behind next-action prediction and funnel simulation.
    Transition counts are exact integers from one lead() window per
    user; row-normalized probabilities are one fixed division.  The
    user-partitioned window is the only data-sized operation — the
    matrix itself is event-type² rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.withColumn("nxt", F.lead("event_type").over(w))
    t = (
        s.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    r = t.groupBy("src").agg(F.sum("n").alias("out_n"))
    return (
        t.join(F.broadcast(r), "src")
        .select(
            "src", "dst", F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("out_n").cast("double"), 6).alias("p"),
        )
        .orderBy("src", "dst")
    )


@register(
    "q_survival",
    sql="""
    WITH u AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_d,
                 max(CAST(ts AS DATE)) AS last_d
          FROM events GROUP BY 1),
    fe AS (SELECT user_id, min(CAST(ts AS DATE)) AS err_d
           FROM events WHERE event_type = 'error' GROUP BY 1),
    l AS (SELECT u.user_id,
                 CAST(CASE WHEN fe.err_d IS NOT NULL
                      THEN fe.err_d - u.first_d
                      ELSE u.last_d - u.first_d END AS BIGINT) AS t,
                 CAST(CASE WHEN fe.err_d IS NOT NULL THEN 1 ELSE 0 END
                      AS INT) AS had_event
          FROM u LEFT JOIN fe USING (user_id)),
    d AS (SELECT t, count(*) AS at_t,
                 CAST(sum(had_event) AS BIGINT) AS d_t
          FROM l GROUP BY 1),
    k AS (SELECT a.t, a.d_t,
                 CAST(sum(b.at_t) AS BIGINT) AS n_t
          FROM d a JOIN d b ON b.t >= a.t GROUP BY 1, 2),
    kn AS (SELECT t, d_t, n_t,
                  CAST(round(ln(1.0 - d_t / CAST(n_t AS DOUBLE)) * 1e9)
                       AS BIGINT) AS ln_n
           FROM k WHERE d_t < n_t),
    s AS (SELECT a.t, a.d_t, a.n_t,
                 round(exp(CAST(sum(b.ln_n) AS BIGINT) / 1e9), 6) AS survival
          FROM kn a JOIN kn b ON b.t <= a.t
          GROUP BY 1, 2, 3)
    SELECT t, n_t AS n_at_risk, d_t AS n_churned, survival
    FROM s WHERE d_t > 0 ORDER BY t
    """,
)
def q_survival(spark, sf_dir):
    """Kaplan-Meier time-to-first-'error' curve: per-user time from
    first activity to first error event, CENSORED at last activity
    for users who never error (the estimator's whole point — a
    churn-based lifetime is degenerate in this fixture: every user
    stays active to the study end), risk sets by reverse-cumulative
    counts, survival as the cumulative product over event times —
    computed as exp(cumsum(ln(1-d/n))) because Spark has no product
    aggregate, with each ln term NANO-INT rounded per row before the
    cross-row sum (integer sums are summation-order-free, so no
    ordered float fold exists anywhere; 6dp output rounding absorbs
    the quantization).  Both cumulatives (the reverse risk-set count
    and the log-survival prefix) ride broadcast triangle joins over
    the lifetimes-sized table — window-free (VERDICT r7 #5).  One
    per-user aggregate is the only data-sized stage."""
    ev = load_table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    u = ev.groupBy("user_id").agg(
        F.min("d").alias("first_d"), F.max("d").alias("last_d")
    )
    fe = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.min("d").alias("err_d"))
    )
    l = u.join(fe, "user_id", "left").select(
        F.when(
            F.col("err_d").isNotNull(), F.datediff("err_d", "first_d")
        ).otherwise(F.datediff("last_d", "first_d"))
        .cast("long").alias("t"),
        F.col("err_d").isNotNull().cast("int").alias("had_event"),
    )
    d = l.groupBy("t").agg(
        F.count(F.lit(1)).alias("at_t"), F.sum("had_event").alias("d_t")
    )
    from shadems_spark.operators.profile import triangle_cumsum

    # reverse-cumulative risk set: descending triangle cumsum on -t
    k = triangle_cumsum(
        d.withColumn("__negt", -F.col("t")), ["__negt"], {"n_t": "at_t"}
    ).drop("__negt")
    kn = k.filter(F.col("d_t") < F.col("n_t")).withColumn(
        "ln_n",
        F.round(
            F.log(F.lit(1.0) - F.col("d_t") / F.col("n_t").cast("double"))
            * F.lit(1e9)
        ).cast("long"),
    )
    s = triangle_cumsum(kn, ["t"], {"__cln": "ln_n"}).withColumn(
        "survival", F.round(F.exp(F.col("__cln") / F.lit(1e9)), 6)
    )
    return (
        s.filter(F.col("d_t") > 0)
        .select(
            "t",
            F.col("n_t").cast("long").alias("n_at_risk"),
            F.col("d_t").alias("n_churned"),
            "survival",
        )
        .orderBy("t")
    )


_CMS_W, _CMS_D, _CMS_Q = 512, 3, 20


def _cms_hash_sql(col: str) -> str:
    """DuckDB replay of operators/text.py::poly_hash over ``col``."""
    return f"""list_reduce(
        list_prepend(CAST(0 AS BIGINT),
                     list_transform(string_split({col}, ''),
                                    c -> CAST(ascii(c) AS BIGINT))),
        (a, c) -> (a * 31 + c) % 1000000007)"""


def _cms_buckets_sql() -> str:
    """The d probe buckets off an ``h`` column — the identical affine
    family operators/profile.py::bloom_bits_from_hash derives."""
    return ", ".join(
        f"(h * {2 * j + 1} + {97 * j}) % 1000000007 % {_CMS_W}"
        for j in range(_CMS_D)
    )


@register(
    "q_countmin",
    sql=f"""
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
    oh AS (SELECT t, {_cms_hash_sql('t')} AS h FROM w),
    cells AS (SELECT j, bucket, count(*) AS c
              FROM (SELECT unnest([{', '.join(str(j) for j in range(_CMS_D))}]) AS j,
                           unnest([{_cms_buckets_sql()}]) AS bucket
                    FROM oh)
              GROUP BY 1, 2),
    truth AS (SELECT t, count(*) AS n FROM w GROUP BY 1),
    topq AS (SELECT t, n FROM truth ORDER BY n DESC, t LIMIT {_CMS_Q}),
    qh AS (SELECT t, n, {_cms_hash_sql('t')} AS h FROM topq),
    probes AS (SELECT t, n,
                      unnest([{', '.join(str(j) for j in range(_CMS_D))}]) AS j,
                      unnest([{_cms_buckets_sql()}]) AS bucket
               FROM qh),
    est AS (SELECT t, n, min(c) AS est
            FROM probes JOIN cells USING (j, bucket) GROUP BY 1, 2)
    SELECT t AS token, CAST(n AS BIGINT) AS n, CAST(est AS BIGINT) AS est,
           CAST(est - n AS BIGINT) AS overcount
    FROM est ORDER BY n DESC, token
    """,
)
def q_countmin(spark, sf_dir):
    """Count-Min sketch frequency estimation (Cormode & Muthukrishnan
    2005) over corpus word occurrences — the last member of the
    mergeable-sketch family (HLL / theta / KLL / t-digest / bloom all
    registered): d=3 rows x w=512 buckets, point query =
    MIN over the d counters a token hashes to.  Because the hash
    family is the deterministic bloom affine family over the
    cross-engine poly hash, the sketch — collisions, overcounts and
    all — is bit-identical on any engine, so a probabilistic
    structure gets a hash-exact SQL oracle (q_bloom_decontaminate's
    trick, applied to counting).

    Scale shape: the sketch build is ONE map-side-combined aggregate
    whose key space is d*w = fixed 1,536 cells — per-partition
    combiners emit at most that many rows regardless of corpus size,
    the defining property that lets CMS count 100 TB of tokens
    through a KB-sized shuffle; the probe side broadcast-joins the
    cell table.  The exact ``truth``/top-q aggregate here is the
    in-query AUDIT (and deterministic query-token pick) — production
    probes the sketch only, never building the vocabulary aggregate
    (q_heavy_hitters documents the same contrast).  The CMS
    guarantee est >= n (never undercounts) and the eps*N overcount
    bound are pinned in tests/test_analytics.py."""
    from shadems_spark.operators.profile import bloom_bits_from_hash
    from shadems_spark.operators.text import poly_hash, words

    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(F.explode(words("text")).alias("t"))
    # two-step: char-fold each occurrence ONCE, derive the d buckets
    # from the hash COLUMN (the q_bloom_decontaminate duplication note)
    oh = occ.select(poly_hash("t").alias("h"))
    cells = (
        oh.select(
            F.posexplode(
                bloom_bits_from_hash(F.col("h"), _CMS_W, _CMS_D)
            ).alias("j", "bucket")
        )
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    truth = occ.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    # top-q probe terms: orderBy+limit plans TakeOrderedAndProject —
    # the rank was only ever a selection device, so no window (and no
    # rank column) is needed at all (VERDICT r7 #5)
    topq = truth.orderBy(F.col("n").desc(), "t").limit(_CMS_Q)
    probes = topq.select(
        "t", "n",
        F.posexplode(
            bloom_bits_from_hash(poly_hash("t"), _CMS_W, _CMS_D)
        ).alias("j", "bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("t", "n")
        .agg(F.min("c").alias("est"))
        .select(
            F.col("t").alias("token"), "n", "est",
            (F.col("est") - F.col("n")).alias("overcount"),
        )
        .orderBy(F.col("n").desc(), "token")
    )


@register(
    "q_ks_test",
    sql="""
    WITH s AS (SELECT round(value, 4) AS value,
                      CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g2
               FROM events WHERE event_type IN ('click', 'purchase')),
    v AS (SELECT value, sum(g1) AS a1, sum(g2) AS a2 FROM s GROUP BY 1),
    c AS (SELECT value,
                 sum(a1) OVER (ORDER BY value) AS c1,
                 sum(a2) OVER (ORDER BY value) AS c2
          FROM v),
    t AS (SELECT sum(g1) AS n1, sum(g2) AS n2 FROM s),
    d AS (SELECT value, abs(c1 * n2 - c2 * n1) AS dnum FROM c, t)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(dnum AS BIGINT) AS d_num,
           round(dnum / (n1 * CAST(n2 AS DOUBLE)), 6) AS ks_d,
           round(value, 6) AS at_value
    FROM d, t ORDER BY dnum DESC, value LIMIT 1
    """,
)
def q_ks_test(spark, sf_dir):
    """EXACT two-sample Kolmogorov-Smirnov statistic between the
    click and purchase value distributions — the distribution-drift
    gate beside q_kl_drift (binned, streaming) and q_abtest (mean
    shift): KS catches ANY CDF divergence, not just mean/bin moves.

    Exactness: at every pooled observation the CDF gap is the pure
    INTEGER |c1*N2 - c2*N1| (cross-multiplied empirical CDFs), so
    sup-finding involves no float comparison; the one division
    happens after the argmax.  Emits the witness point (at_value =
    smallest value attaining the sup) — the actionable part of a
    drift alarm.

    Scale (the VERDICT r5 #1/#4 production path): (a) values are
    PRE-ROUNDED to 4dp BY PROTOCOL on both engines, so the distinct-
    value table is bounded BY CONSTRUCTION at <= (range*1e4 + 1) keys
    at any corpus size — for bounded metrics this is a fixed-size
    table, and the KS statistic computed on the rounded grid is the
    sup over a 1e-4-mesh refinement (error <= the mesh's mass, the
    standard binned-KS contract); (b) the cumulative CDF scan is the
    TWO-PHASE range-partitioned prefix sum (operators/profile.
    global_cumsum) — local cumsums per range partition + a broadcast
    <=32-row offsets table — so NO single-partition window over data
    exists at any cardinality.  The per-value aggregate stays
    map-side combined."""
    from shadems_spark.operators.profile import global_cumsum

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    s = ev.select(
        F.round("value", 4).alias("value"),
        (F.col("event_type") == "click").cast("long").alias("g1"),
        (F.col("event_type") == "purchase").cast("long").alias("g2"),
    )
    v = s.groupBy("value").agg(
        F.sum("g1").alias("a1"), F.sum("g2").alias("a2")
    )
    c = global_cumsum(v, ["value"], {"c1": "a1", "c2": "a2"}).select(
        "value", "c1", "c2"
    )
    t = s.agg(F.sum("g1").alias("n1"), F.sum("g2").alias("n2"))
    d = c.crossJoin(F.broadcast(t)).select(
        "value", "n1", "n2",
        F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
        .alias("dnum"),
    )
    return (
        d.orderBy(F.col("dnum").desc(), "value")
        .limit(1)
        .select(
            "n1", "n2",
            F.col("dnum").alias("d_num"),
            F.round(
                F.col("dnum") / (F.col("n1") * F.col("n2").cast("double")), 6
            ).alias("ks_d"),
            F.round("value", 6).alias("at_value"),
        )
    )


@register(
    "q_mannwhitney",
    sql="""
    WITH s AS (SELECT round(value, 4) AS value,
                      CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g2
               FROM events WHERE event_type IN ('click', 'purchase')),
    v AS (SELECT value, sum(g1) AS a1, sum(g2) AS a2, count(*) AS t
          FROM s GROUP BY 1),
    c AS (SELECT a1, a2, t,
                 sum(t) OVER (ORDER BY value) - t AS cb
          FROM v),
    agg AS (SELECT sum(a1) AS n1, sum(a2) AS n2,
                   sum(a1 * (2 * cb + t + 1)) AS r1x2,
                   sum(t * t * t - t) AS ties
            FROM c)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           CAST(2 * n1 * n2 - (r1x2 - n1 * (n1 + 1)) AS BIGINT) AS u2_x2,
           round((r1x2 - n1 * (n1 + 1)) / (2.0 * (n1 * n2)), 6) AS auc,
           round(((r1x2 - n1 * (n1 + 1)) - CAST(n1 * n2 AS DOUBLE)) /
                 (2.0 * sqrt((CAST(n1 * n2 AS DOUBLE) / 12.0) *
                             ((n1 + n2 + 1) -
                              CAST(ties AS DOUBLE) /
                              ((n1 + n2) * (n1 + n2 - 1.0))))), 6) AS z
    FROM agg
    """,
)
def q_mannwhitney(spark, sf_dir):
    """Tie-aware Mann-Whitney U rank-sum test between the click and
    purchase value distributions — the nonparametric drift gate
    beside q_ks_test (sup-CDF-gap) and q_abtest (mean z-test): U
    detects stochastic dominance (P(X>Y) != 1/2) where KS may be
    diluted and a mean test is fooled by outliers.

    Exactness: doubled midranks (2*cum_before + t + 1 per tie group)
    keep every rank sum a pure INTEGER, so U1, U2 and the tie term
    sum(t^3 - t) are engine-exact; AUC (= U1/(n1*n2), the common-
    language effect size — same quantity q_auc computes for the
    classifier) and the tie-corrected normal z are each ONE fixed
    float formula over those integers, identical at 6dp on any
    IEEE-754 engine (the q_abtest protocol).

    Scale (the VERDICT r5 #1/#4 production path): values PRE-ROUNDED
    to 4dp by protocol on both engines — midranks on the rounded grid
    are the tie-aware ranks of the 1e-4-binned test (the standard
    grouped rank-sum form), and the distinct-value table is bounded
    BY CONSTRUCTION; the rank-base scan is the two-phase range-
    partitioned prefix sum (operators/profile.global_cumsum), so no
    single-partition window over data exists at any cardinality.  The
    per-value aggregate stays map-side combined."""
    from shadems_spark.operators.profile import global_cumsum

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    s = ev.select(
        F.round("value", 4).alias("value"),
        (F.col("event_type") == "click").cast("long").alias("g1"),
        (F.col("event_type") == "purchase").cast("long").alias("g2"),
    )
    v = s.groupBy("value").agg(
        F.sum("g1").alias("a1"),
        F.sum("g2").alias("a2"),
        F.count(F.lit(1)).alias("t"),
    )
    c = global_cumsum(v, ["value"], {"ct": "t"}).select(
        "a1", "a2", "t", (F.col("ct") - F.col("t")).alias("cb")
    )
    agg = c.agg(
        F.sum("a1").alias("n1"),
        F.sum("a2").alias("n2"),
        F.sum(F.col("a1") * (2 * F.col("cb") + F.col("t") + 1)).alias("r1x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("ties"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1x2 = F.col("r1x2") - n1 * (n1 + 1)
    nn = (n1 * n2).cast("double")
    sigma2 = (nn / 12.0) * (
        (n1 + n2 + 1)
        - F.col("ties").cast("double") / ((n1 + n2) * (n1 + n2 - 1.0))
    )
    return agg.select(
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        u1x2.cast("long").alias("u1_x2"),
        (2 * n1 * n2 - u1x2).cast("long").alias("u2_x2"),
        F.round(u1x2 / (2.0 * (n1 * n2)), 6).alias("auc"),
        F.round((u1x2 - nn) / (2.0 * F.sqrt(sigma2)), 6).alias("z"),
    )


@register(
    "q_freq_pairs",
    sql="""
    WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    n AS (SELECT count(DISTINCT ok) AS n_orders FROM b),
    i AS (SELECT pk, count(*) AS s FROM b GROUP BY 1),
    ms AS (SELECT greatest(3, CAST(ceil(0.00002 * n_orders) AS BIGINT))
                      AS minsup FROM n),
    p AS (SELECT a.pk AS pa, c.pk AS pb, count(*) AS s
          FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
          GROUP BY 1, 2
          HAVING count(*) >= (SELECT minsup FROM ms))
    SELECT p.pa, p.pb, p.s AS pair_support,
           ia.s AS support_a, ib.s AS support_b,
           round(p.s / CAST(ia.s AS DOUBLE), 6) AS conf_a_to_b,
           round(p.s / CAST(ib.s AS DOUBLE), 6) AS conf_b_to_a,
           round(p.s * CAST(n_orders AS DOUBLE) / (ia.s * ib.s), 6) AS lift
    FROM p CROSS JOIN n
    JOIN i ia ON ia.pk = p.pa
    JOIN i ib ON ib.pk = p.pb
    ORDER BY lift DESC, pa, pb
    """,
)
def q_freq_pairs(spark, sf_dir):
    """Apriori frequent-pairs market-basket mining over lineitem
    baskets (Agrawal-Srikant VLDB'94): distinct (order, part) baskets
    -> item supports -> PRUNE to frequent items (downward closure: a
    pair with support >= minsup can only contain items with support
    >= minsup) -> within-basket pair self-join -> support/confidence/
    lift.  The oracle is the UNPRUNED brute definition, so the hash
    match proves the Apriori prune lossless (the q_ppjoin pattern).

    Exactness: support counts are integers; confidence and lift are
    one division each from integers, engine-exact at 6dp.  Scale:
    pair generation is O(k^2) per basket (k <= 13 here; bounded in
    retail schemas — cap or sample mega-baskets at 100 TB), the
    frequent-item table shrinks with minsup and is broadcast to both
    join sides, and the self-join shuffles on the basket key only —
    the classic distributed-Apriori shape; raise minsup with corpus
    size to keep the pair table sublinear."""
    # minsup is a FRACTION of baskets (floored at 3): an absolute
    # threshold lets the frequent-pair table grow with corpus
    # replication (the x10 probe measured 2 -> 1.2M rows at
    # minsup=3); fractional support restores the flat-output Apriori
    # contract.  The fraction is small (2e-5) because TPC-H baskets
    # are uniform-random — co-occurrence dilutes as the part catalog
    # grows with SF; real basket data concentrates instead.
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n = b.agg(F.count_distinct("ok").alias("n_orders"))
    ms = n.select(
        F.greatest(F.lit(3), F.ceil(0.00002 * F.col("n_orders")))
        .cast("long").alias("minsup")
    )
    i = b.groupBy("pk").agg(F.count(F.lit(1)).alias("s"))
    fi = (
        i.crossJoin(F.broadcast(ms))
        .filter(F.col("s") >= F.col("minsup"))
        .select("pk")
    )
    fb = b.join(F.broadcast(fi), "pk")
    p = (
        fb.alias("a")
        .join(fb.alias("c"), "ok")
        .filter(F.col("a.pk") < F.col("c.pk"))
        .groupBy(F.col("a.pk").alias("pa"), F.col("c.pk").alias("pb"))
        .agg(F.count(F.lit(1)).alias("s"))
        .crossJoin(F.broadcast(ms))
        .filter(F.col("s") >= F.col("minsup"))
        .drop("minsup")
    )
    ia = i.select(F.col("pk").alias("pa"), F.col("s").alias("support_a"))
    ib = i.select(F.col("pk").alias("pb"), F.col("s").alias("support_b"))
    return (
        p.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .crossJoin(F.broadcast(n))
        .select(
            "pa", "pb",
            F.col("s").alias("pair_support"),
            "support_a", "support_b",
            F.round(F.col("s") / F.col("support_a").cast("double"), 6)
            .alias("conf_a_to_b"),
            F.round(F.col("s") / F.col("support_b").cast("double"), 6)
            .alias("conf_b_to_a"),
            F.round(
                F.col("s") * F.col("n_orders").cast("double")
                / (F.col("support_a") * F.col("support_b")), 6
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "pa", "pb")
    )


@register(
    "q_rfm",
    sql="""
    WITH cust AS (
        SELECT o_custkey,
               max(CAST(o_orderdate AS DATE)) AS last_order,
               count(*) AS freq,
               CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    a AS (SELECT max(last_order) AS anchor FROM cust),
    s AS (SELECT datediff('day', last_order, anchor) AS recency_days,
                 freq, cents,
                 ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
                 ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f_score,
                 ntile(5) OVER (ORDER BY cents DESC, o_custkey) AS m_score
          FROM cust CROSS JOIN a)
    SELECT r_score, f_score, m_score,
           CASE WHEN r_score <= 2 AND f_score <= 2 AND m_score <= 2
                THEN 'champion'
                WHEN r_score >= 4 AND m_score <= 2 THEN 'at_risk_spender'
                WHEN r_score >= 4 AND f_score >= 4 THEN 'hibernating'
                ELSE 'core' END AS segment,
           count(*) AS customers,
           CAST(max(recency_days) AS BIGINT) AS max_recency_days,
           CAST(sum(freq) AS BIGINT) AS orders_total,
           CAST(sum(cents) AS BIGINT) AS monetary_cents
    FROM s GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3
    """,
)
def q_rfm(spark, sf_dir):
    """RFM (recency/frequency/monetary) customer segmentation — the
    classic retention-marketing cube (Hughes 1994): per-customer last
    order, order count, lifetime spend -> quintile scores (1 = best)
    -> 5x5x5 segment grid with named action buckets.

    Exactness: spend is folded to INTEGER cents before any ordering
    or re-aggregation (o_totalprice values are exact cents, so the
    float sum is within 1e-9 of an integer and round() recovers it
    exactly — no float-order sensitivity anywhere); ntile runs over a
    total order (metric, custkey), so bucket assignment is
    deterministic and both engines share the floor-based ntile fill.

    Scale (the VERDICT r5 #1 production path): the per-customer
    aggregate is the only data-sized shuffle; each quintile score
    rides the TWO-PHASE exact ntile (operators/profile.global_ntile:
    range-partitioned local rank + broadcast offsets + the closed-
    form tile fill) — bit-identical to the global-window ntile at any
    customer cardinality, with NO single-partition stage.  Three
    range shuffles of the customer table replace the three
    single-partition sorts."""
    from shadems_spark.operators.profile import global_ntile

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents"),
    )
    a = cust.agg(F.max("last_order").alias("anchor"))
    # one shared hash exchange under all three quintile rankings: the
    # orders aggregate runs ONCE (ReuseExchange dedupes the identical
    # subtree) and each ranking's range-sampling pass reads shuffle
    # files, never the scan.  Scores are computed on slim independent
    # (custkey, metric) branches and joined back on the customer key.
    base = cust.repartition("o_custkey")

    def quintile(metric: str, out: str):
        slim = base.select("o_custkey", metric)
        return global_ntile(
            slim, 5, [F.col(metric).desc(), "o_custkey"], out,
            bucket_key=F.col(metric), bucket_desc=True,
        ).select("o_custkey", out)

    scored = (
        base.join(quintile("last_order", "r_score"), "o_custkey")
        .join(quintile("freq", "f_score"), "o_custkey")
        .join(quintile("cents", "m_score"), "o_custkey")
    )
    s = scored.crossJoin(F.broadcast(a)).select(
        F.datediff("anchor", "last_order").alias("recency_days"),
        "freq", "cents", "r_score", "f_score", "m_score",
    )
    seg = (
        F.when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2)
            & (F.col("m_score") <= 2),
            "champion",
        )
        .when((F.col("r_score") >= 4) & (F.col("m_score") <= 2), "at_risk_spender")
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "hibernating")
        .otherwise("core")
    )
    return (
        s.groupBy("r_score", "f_score", "m_score", seg.alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.max("recency_days").cast("long").alias("max_recency_days"),
            F.sum("freq").alias("orders_total"),
            F.sum("cents").alias("monetary_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


_BENFORD = [
    (1, 0.3010299957), (2, 0.1760912591), (3, 0.1249387366),
    (4, 0.0969100130), (5, 0.0791812460), (6, 0.0669467896),
    (7, 0.0579919470), (8, 0.0511525224), (9, 0.0457574906),
]


@register(
    "q_benford",
    sql="""
    WITH exp AS (SELECT * FROM (VALUES
        (1, 0.3010299957), (2, 0.1760912591), (3, 0.1249387366),
        (4, 0.0969100130), (5, 0.0791812460), (6, 0.0669467896),
        (7, 0.0579919470), (8, 0.0511525224), (9, 0.0457574906))
        AS t(digit, p)),
    obs AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                                          AS BIGINT) AS VARCHAR), 1, 1)
                        AS INTEGER) AS digit,
                   count(*) AS observed
            FROM orders WHERE o_totalprice > 0 GROUP BY 1),
    n AS (SELECT sum(observed) AS total FROM obs)
    SELECT e.digit,
           coalesce(o.observed, 0) AS observed,
           round(n.total * e.p, 6) AS expected,
           CAST(round((coalesce(o.observed, 0) - n.total * e.p)
                      * (coalesce(o.observed, 0) - n.total * e.p)
                      / (n.total * e.p) * 1e9) AS BIGINT) AS chi2_nano
    FROM exp e LEFT JOIN obs o ON o.digit = e.digit CROSS JOIN n
    ORDER BY e.digit
    """,
)
def q_benford(spark, sf_dir):
    """Benford's-law first-significant-digit audit over order totals
    — the classic fraud / synthetic-data / unit-mixing screen
    (Newcomb 1881, Benford 1938; Nigrini's audit practice): digit
    1..9 observed counts vs N*log10(1+1/d), with per-digit chi-square
    contributions.

    Exactness: the first significant digit is read from the STRING of
    the integer-cents value (round(x*100) is exact for cent-valued
    prices, and BIGINT-to-string is identical on every engine) — NO
    log10/pow on data, so there is no libm or power-of-ten boundary
    risk; the expected probabilities are shared 10dp literals, and
    each chi-square contribution is nano-int rounded (one float
    formula from an integer count and a literal).  Scale: one
    map-side-combined 9-key aggregate over a single pruned column +
    a broadcast of the 9-row expectation table — embarrassingly
    parallel at any corpus size."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    obs = (
        o.select(
            F.substring(
                F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
                1, 1,
            ).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    exp = spark.createDataFrame(_BENFORD, "digit int, p double")
    n = obs.agg(F.sum("observed").alias("total"))
    dev = F.coalesce(F.col("observed"), F.lit(0)) - F.col("total") * F.col("p")
    return (
        F.broadcast(exp)
        .join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce(F.col("observed"), F.lit(0)).alias("observed"),
            F.round(F.col("total") * F.col("p"), 6).alias("expected"),
            F.round(dev * dev / (F.col("total") * F.col("p")) * 1e9)
            .cast("long").alias("chi2_nano"),
        )
        .orderBy("digit")
    )


@register(
    "q_trend_ols",
    sql="""
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y,
                      CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
               FROM orders GROUP BY 1),
    m AS (SELECT min(day) AS day0 FROM d),
    xy AS (SELECT datediff('day', day0, day) AS x, y FROM d CROSS JOIN m),
    s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
          FROM xy)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS var_num,
           round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 6)
               AS slope_per_day,
           round((sy - sx * ((n * sxy - sx * sy)
                             / CAST(n * sxx - sx * sx AS DOUBLE))) / n, 6)
               AS intercept,
           round((CAST(n * sxy - sx * sy AS DOUBLE)
                  * (n * sxy - sx * sy))
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def q_trend_ols(spark, sf_dir):
    """Exact OLS trend of daily order volume — slope/intercept/R^2 of
    the classic is-traffic-growing dashboard line, computed from the
    closed-form normal equations.

    Exactness: x (day index from the corpus min date) and y (daily
    count) are INTEGERS, so all five sufficient statistics (sx, sy,
    sxx, sxy, syy) and the covariance/variance numerators n*sxy-sx*sy
    and n*sxx-sx^2 are engine-exact bigints; slope, intercept and R^2
    are each one fixed float formula over those integers (R^2 stays
    in factored double form because the bigint product of the two
    variance numerators can overflow 2^63).  Scale: the daily
    aggregate is map-side combined to DATE-cardinality; the
    sufficient-stats reduce is a single 6-value row — the textbook
    distributed-regression shape (per-partition partial sums, one
    combine), embarrassingly parallel at any corpus size."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("y"),
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents"),
    )
    m = d.agg(F.min("day").alias("day0"))
    xy = d.crossJoin(F.broadcast(m)).select(
        F.datediff("day", "day0").cast("long").alias("x"), "y"
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    cov = n * sxy - sx * sy
    var = n * sxx - sx * sx
    slope = cov / var.cast("double")
    return s.select(
        n.cast("long").alias("n_days"),
        cov.cast("long").alias("cov_num"),
        var.cast("long").alias("var_num"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round((sy - sx * slope) / n, 6).alias("intercept"),
        F.round(
            (cov.cast("double") * cov) / (var.cast("double") * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@register(
    "q_psi",
    sql="""
    WITH ref AS (SELECT value, event_id FROM events
                 WHERE event_type = 'click' AND value IS NOT NULL),
    rk AS (SELECT value,
                  row_number() OVER (ORDER BY value, event_id) AS rn,
                  count(*) OVER () AS n
           FROM ref),
    cut AS (SELECT CAST(ceil(rk.n * k.k / 10.0) AS BIGINT) AS r
            FROM (SELECT unnest(generate_series(1, 9)) AS k) k
            CROSS JOIN (SELECT max(n) AS n FROM rk) rk),
    e AS (SELECT list(value ORDER BY value) AS edges
          FROM rk WHERE rn IN (SELECT r FROM cut)),
    s AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_ref,
                 1 + len(list_filter(e.edges, x -> x < value)) AS bin
          FROM events CROSS JOIN e
          WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
    c AS (SELECT b.bin,
                 coalesce(sum(s.is_ref), 0) AS ref_n,
                 coalesce(sum(1 - s.is_ref), 0) AS cmp_n
          FROM (SELECT unnest(generate_series(1, 10)) AS bin) b
          LEFT JOIN s ON s.bin = b.bin GROUP BY 1),
    t AS (SELECT sum(ref_n) AS nr, sum(cmp_n) AS nc FROM c)
    SELECT bin, CAST(ref_n AS BIGINT) AS ref_n, CAST(cmp_n AS BIGINT) AS cmp_n,
           CAST(round(((ref_n + 1) / CAST(nr + 10 AS DOUBLE)
                       - (cmp_n + 1) / CAST(nc + 10 AS DOUBLE))
                      * ln(((ref_n + 1) / CAST(nr + 10 AS DOUBLE))
                           / ((cmp_n + 1) / CAST(nc + 10 AS DOUBLE)))
                      * 1000000000.0) AS BIGINT) AS psi_nano
    FROM c CROSS JOIN t ORDER BY bin
    """,
)
def q_psi(spark, sf_dir):
    """Population Stability Index between the click (reference) and
    purchase (comparison) value distributions — the industry-standard
    model-monitoring drift score (credit-risk practice; PSI > 0.25 =
    investigate), complementing q_ks_test (sup gap), q_mannwhitney
    (rank shift) and q_kl_drift (token KL): PSI localizes WHICH
    decile of the reference distribution the shift lives in.

    Shape: decile edges are exact order statistics of the reference
    (rank ceil(N*k/10) under the deterministic (value, event_id)
    order), carried as ONE broadcast array row — bin assignment is a
    pure expression (count of edges below the value), no per-row
    join fan-out and no second shuffle; add-one smoothing keeps
    empty comparison bins finite (and is what you want at 100 TB
    where a decile CAN empty out under real drift).  Each bin's
    contribution is nano-int rounded from one fixed float formula
    over integer counts.

    Scale (the VERDICT r5 #1 production path): the exact rank edges
    ride the TWO-PHASE range-partitioned row numbering (operators/
    profile.global_index) — local row_number per range partition + a
    broadcast <=32-row offsets table — so the decile extraction has
    NO single-partition window over reference rows at any
    cardinality; the binned aggregate stays map-side combined and
    10-key.  (The same edges are also available as KLL cutpoints via
    the q_ccnet_buckets_approx pattern when exactness isn't
    oracle-mandated.)"""
    from shadems_spark.operators.profile import global_index

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    ref = ev.filter(F.col("event_type") == "click")
    rk = global_index(
        ref.select("value", "event_id"), ["value", "event_id"],
        out="rn", with_total="n",
    ).select("value", "rn", "n")
    cut = (
        spark.range(1, 10)
        .crossJoin(F.broadcast(rk.agg(F.max("n").alias("n"))))
        .select(F.ceil(F.col("n") * F.col("id") / 10.0).alias("r"))
    )
    e = (
        rk.join(F.broadcast(cut), rk["rn"] == cut["r"])
        .agg(F.sort_array(F.collect_list("value")).alias("edges"))
    )
    s = ev.crossJoin(F.broadcast(e)).select(
        (F.col("event_type") == "click").cast("long").alias("is_ref"),
        (
            1 + F.size(F.filter("edges", lambda x: x < F.col("value")))
        ).alias("bin"),
    )
    c = (
        spark.range(1, 11).select(F.col("id").cast("int").alias("bin"))
        .join(s, "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(F.sum("is_ref"), F.lit(0)).alias("ref_n"),
            F.coalesce(F.sum(1 - F.col("is_ref")), F.lit(0)).alias("cmp_n"),
        )
    )
    t = c.agg(F.sum("ref_n").alias("nr"), F.sum("cmp_n").alias("nc"))
    p = (F.col("ref_n") + 1) / (F.col("nr") + 10).cast("double")
    q = (F.col("cmp_n") + 1) / (F.col("nc") + 10).cast("double")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "bin",
            F.col("ref_n").cast("long").alias("ref_n"),
            F.col("cmp_n").cast("long").alias("cmp_n"),
            F.round((p - q) * F.log(p / q) * 1000000000.0)
            .cast("long").alias("psi_nano"),
        )
        .orderBy("bin")
    )


@register(
    "q_acf",
    sql="""
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
               FROM orders GROUP BY 1),
    m AS (SELECT min(day) AS d0, datediff('day', min(day), max(day)) AS span
          FROM d),
    grid AS (SELECT t.x, coalesce(d.y, 0) AS y
             FROM (SELECT unnest(generate_series(0, (SELECT span FROM m)))
                          AS x) t
             LEFT JOIN d ON d.day = (SELECT d0 FROM m) + INTERVAL (t.x) DAY),
    g AS (SELECT count(*) AS n, sum(y) AS sy, sum(y * y) AS syy FROM grid),
    k AS (SELECT unnest(generate_series(1, 7)) AS lag),
    p AS (SELECT k.lag,
                 count(*) AS n_pairs,
                 sum(a.y * b.y) AS axy,
                 sum(a.y) AS s1, sum(b.y) AS s2
          FROM k JOIN grid a ON true
          JOIN grid b ON b.x = a.x + k.lag
          GROUP BY 1)
    SELECT p.lag, CAST(p.n_pairs AS BIGINT) AS n_pairs,
           CAST(g.n * g.n * p.axy - g.n * g.sy * (p.s1 + p.s2)
                + p.n_pairs * g.sy * g.sy AS BIGINT) AS num,
           CAST(g.n * (g.n * g.syy - g.sy * g.sy) AS BIGINT) AS den,
           round((g.n * g.n * p.axy - g.n * g.sy * (p.s1 + p.s2)
                  + p.n_pairs * g.sy * g.sy)
                 / CAST(g.n * (g.n * g.syy - g.sy * g.sy) AS DOUBLE), 6)
               AS acf
    FROM p CROSS JOIN g ORDER BY p.lag
    """,
)
def q_acf(spark, sf_dir):
    """Exact autocorrelation function of the ZERO-FILLED daily order
    series at lags 1..7 — the weekly-seasonality / burst-structure
    detector beside q_seasonality's weekday means and q_cusum's
    changepoints (a spike at lag 7 = weekly cycle; slow decay =
    trend/bursts).

    Exactness: with integer daily counts on a dense calendar grid,
    the biased-estimator numerator scaled by n^2 is the pure INTEGER
    n^2*sum(y_t*y_{t+k}) - n*sy*(S1_k+S2_k) + (n-k)*sy^2 (the
    cross-multiplied mean-centering identity — no float ybar ever
    touches a cross-row sum), and the denominator n*(n*syy - sy^2)
    is likewise integer; acf is ONE division.  Gaps are zero-filled
    from a generated calendar spine, so the lag join is on exact
    integer day indices.  Scale: daily aggregate is map-side
    combined to date cardinality; the 7 lag joins run on the
    DATE-cardinality grid (a few k rows at any corpus size) — the
    heavy input never joins itself."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    m = d.agg(
        F.min("day").alias("d0"),
        F.datediff(F.max("day"), F.min("day")).alias("span"),
    )
    grid = (
        m.select(F.explode(F.sequence(F.lit(0), F.col("span"))).alias("x"), "d0")
        .join(
            d,
            F.expr("date_add(d0, CAST(x AS INT))") == F.col("day"),
            "left",
        )
        .select("x", F.coalesce("y", F.lit(0)).alias("y"))
    )
    # no persist: the grid is DATE-cardinality (a few k rows); its three
    # consumers recompute a tiny agg+join rather than hold a cache slot.
    g = grid.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    k = spark.range(1, 8).select(F.col("id").alias("lag"))
    a, b = grid.alias("a"), grid.alias("b")
    p = (
        F.broadcast(k)
        .join(a)
        .join(b, F.col("b.x") == F.col("a.x") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("a.y") * F.col("b.y")).alias("axy"),
            F.sum(F.col("a.y")).alias("s1"),
            F.sum(F.col("b.y")).alias("s2"),
        )
    )
    n, sy, syy = F.col("n"), F.col("sy"), F.col("syy")
    num = (
        n * n * F.col("axy")
        - n * sy * (F.col("s1") + F.col("s2"))
        + F.col("n_pairs") * sy * sy
    )
    den = n * (n * syy - sy * sy)
    return (
        p.crossJoin(F.broadcast(g))
        .select(
            "lag",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            num.cast("long").alias("num"),
            den.cast("long").alias("den"),
            F.round(num / den.cast("double"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


@register(
    "q_best_split",
    sql="""
    WITH s AS (SELECT round(value, 4) AS value,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
               FROM events
               WHERE event_type IN ('click', 'purchase')
                 AND value IS NOT NULL),
    v AS (SELECT value, count(*) AS n, sum(y) AS pos FROM s GROUP BY 1),
    c AS (SELECT value,
                 sum(n) OVER (ORDER BY value) AS nl,
                 sum(pos) OVER (ORDER BY value) AS pl
          FROM v),
    t AS (SELECT sum(n) AS nt, sum(pos) AS pt FROM v),
    g AS (SELECT value, nl, pl, nt - nl AS nr, pt - pl AS pr, nt, pt
          FROM c CROSS JOIN t WHERE nl < nt),
    sc AS (SELECT value, nl, pl, nr, pr,
                 ((pl * pl + (nl - pl) * (nl - pl)) / CAST(nl AS DOUBLE)
                  + (pr * pr + (nr - pr) * (nr - pr)) / CAST(nr AS DOUBLE))
                     AS s_sum,
                 (pt * CAST(pt AS DOUBLE) + (nt - pt) * CAST(nt - pt AS DOUBLE))
                     / nt AS s_parent,
                 nt
          FROM g)
    SELECT round(value, 6) AS split_value,
           CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
           CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
           round((s_sum - s_parent) / nt, 6) AS gini_gain
    FROM sc ORDER BY (s_sum - s_parent) / nt DESC, value LIMIT 1
    """,
)
def q_best_split(spark, sf_dir):
    """Exact best binary split (value <= v) for predicting purchase
    vs click by Gini impurity decrease — the split-finding primitive
    inside every distributed decision-tree / GBDT learner (XGBoost's
    exact greedy algorithm): ONE sorted cumulative scan over distinct
    feature values scores every candidate threshold.

    Exactness: left/right positive/negative counts at every candidate
    are integer prefix sums; the Gini objective is maximized through
    the equivalent integer-product score S = (posL^2+negL^2)/nL +
    (posR^2+negR^2)/nR (all products < 2^53, so the doubles are
    EXACT integers until the two divisions), and the reported gain =
    (S - S_parent)/N is one fixed float formula; argmax ties break on
    the smallest value.

    Scale (the VERDICT r5 #1/#4 production path): candidate
    thresholds PRE-ROUNDED to 4dp by protocol on both engines — the
    1e-4 grid is a deterministic superset of the quantile-sketch
    candidate sets planet-scale GBDTs use, and it bounds the distinct
    table BY CONSTRUCTION; the prefix-count scan is the two-phase
    range-partitioned cumsum (operators/profile.global_cumsum), so no
    single-partition window over data exists at any cardinality.  The
    per-value aggregate stays map-side combined and the argmax is
    TakeOrdered(1)."""
    from shadems_spark.operators.profile import global_cumsum

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    s = ev.select(
        F.round("value", 4).alias("value"),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )
    v = s.groupBy("value").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    c = global_cumsum(v, ["value"], {"nl": "n", "pl": "pos"}).select(
        "value", "nl", "pl"
    )
    t = v.agg(F.sum("n").alias("nt"), F.sum("pos").alias("pt"))
    g = (
        c.crossJoin(F.broadcast(t))
        .filter(F.col("nl") < F.col("nt"))
        .select(
            "value", "nl", "pl", "nt", "pt",
            (F.col("nt") - F.col("nl")).alias("nr"),
            (F.col("pt") - F.col("pl")).alias("pr"),
        )
    )
    nl, pl, nr, pr = F.col("nl"), F.col("pl"), F.col("nr"), F.col("pr")
    nt, pt = F.col("nt"), F.col("pt")
    s_sum = (pl * pl + (nl - pl) * (nl - pl)) / nl.cast("double") + (
        pr * pr + (nr - pr) * (nr - pr)
    ) / nr.cast("double")
    s_parent = (
        pt * pt.cast("double") + (nt - pt) * (nt - pt).cast("double")
    ) / nt
    gain = (s_sum - s_parent) / nt
    return (
        g.select(
            F.round("value", 6).alias("split_value"),
            nl.cast("long").alias("n_left"),
            pl.cast("long").alias("pos_left"),
            nr.cast("long").alias("n_right"),
            pr.cast("long").alias("pos_right"),
            F.round(gain, 6).alias("gini_gain"),
            gain.alias("_g"),
            F.col("value").alias("_v"),
        )
        .orderBy(F.col("_g").desc(), "_v")
        .limit(1)
        .drop("_g", "_v")
    )


@register(
    "q_theilsen",
    sql="""
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
               FROM orders GROUP BY 1),
    m AS (SELECT min(day) AS d0, datediff('day', min(day), max(day)) AS span
          FROM d),
    grid AS (SELECT t.x, coalesce(d.y, 0) AS y
             FROM (SELECT unnest(generate_series(0, (SELECT span FROM m)))
                          AS x) t
             LEFT JOIN d ON d.day = (SELECT d0 FROM m) + INTERVAL (t.x) DAY),
    p AS (SELECT a.x AS x1, b.x AS x2,
                 (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS sl
          FROM grid a JOIN grid b ON b.x > a.x),
    r AS (SELECT sl, row_number() OVER (ORDER BY sl, x1, x2) AS rn,
                 count(*) OVER () AS np
          FROM p),
    med AS (SELECT avg(sl) AS slope, max(np) AS np FROM r
            WHERE rn IN (CAST(floor((np + 1) / 2.0) AS BIGINT),
                         CAST(ceil((np + 1) / 2.0) AS BIGINT))),
    ic AS (SELECT g.x, g.y - med.slope * g.x AS resid
           FROM grid g CROSS JOIN med),
    r2 AS (SELECT resid, row_number() OVER (ORDER BY resid, x) AS rn,
                  count(*) OVER () AS n
           FROM ic),
    med2 AS (SELECT avg(resid) AS intercept FROM r2
             WHERE rn IN (CAST(floor((n + 1) / 2.0) AS BIGINT),
                          CAST(ceil((n + 1) / 2.0) AS BIGINT)))
    SELECT CAST(med.np AS BIGINT) AS n_pairs,
           round(med.slope, 6) AS slope_per_day,
           round(med2.intercept, 6) AS intercept
    FROM med CROSS JOIN med2
    """,
)
def q_theilsen(spark, sf_dir):
    """Theil-Sen robust trend of the zero-filled daily order series —
    the median of ALL pairwise slopes (29.3% breakdown point): the
    robust twin of q_trend_ols, immune to the outlier days that drag
    a least-squares line (Sen 1968).

    Exactness: every pairwise slope is one division of integers (the
    same double on any IEEE engine), the median is the exact order
    statistic under the deterministic (slope, x1, x2) order (mean of
    the two middles when the pair count is even — a single float
    add/divide), and the intercept is the exact median residual.
    Scale: pairs grow as days^2 — fine for a DATE-cardinality series
    (2.9M pairs here; still only ~1e9 at a decade of days); at finer
    grains switch to the standard sampled Theil-Sen (random pair
    subsample) or per-partition partial medians.  The heavy input
    table itself never self-joins — only the daily grid does."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    m = d.agg(
        F.min("day").alias("d0"),
        F.datediff(F.max("day"), F.min("day")).alias("span"),
    )
    grid = (
        m.select(F.explode(F.sequence(F.lit(0), F.col("span"))).alias("x"), "d0")
        .join(d, F.expr("date_add(d0, CAST(x AS INT))") == F.col("day"), "left")
        .select("x", F.coalesce("y", F.lit(0)).alias("y"))
    )
    a, b = grid.alias("a"), grid.alias("b")
    # try_divide, not /: downstream isNotNull filters can be pushed
    # INTO this join's condition, where ANSI division would evaluate
    # on the x2 == x1 diagonal BEFORE the x2 > x1 conjunct prunes it
    # and throw DIVIDE_BY_ZERO.  Every condition-surviving pair has
    # divisor >= 1, so values are unchanged.
    p = a.join(b, F.col("b.x") > F.col("a.x")).select(
        F.col("a.x").alias("x1"),
        F.col("b.x").alias("x2"),
        F.try_divide(
            (F.col("b.y") - F.col("a.y")).cast("double"),
            (F.col("b.x") - F.col("a.x")).cast("double"),
        ).alias("sl"),
    )
    # Medians by rank selection over the CONSTANT-bounded pair table
    # (days^2 — calendar-squared, ~2.9M at this fixture's 2400-day
    # span, invariant in corpus size).  A single-partition window
    # over a constant-bounded table is the documented exemption and
    # MEASURED faster here than the distributed alternative: the
    # two-phase global_index route was built and timed in r8 — its
    # extra passes (cut sampling + bucket assignment + per-bucket
    # counts) cost ~5x the one in-partition sort, with zero scale
    # benefit because the input never grows.  Allowlist entry stays.
    wr = Window.orderBy("sl", "x1", "x2")
    wn = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = p.select(
        "sl",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("np"),
    )
    med = r.filter(
        (F.col("rn") == F.floor((F.col("np") + 1) / 2.0).cast("long"))
        | (F.col("rn") == F.ceil((F.col("np") + 1) / 2.0).cast("long"))
    ).agg(F.avg("sl").alias("slope"), F.max("np").alias("np"))
    ic = grid.crossJoin(F.broadcast(med)).select(
        "x", (F.col("y") - F.col("slope") * F.col("x")).alias("resid")
    )
    wr2 = Window.orderBy("resid", "x")
    r2 = ic.select(
        "resid",
        F.row_number().over(wr2).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med2 = r2.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2.0).cast("long"))
        | (F.col("rn") == F.ceil((F.col("n") + 1) / 2.0).cast("long"))
    ).agg(F.avg("resid").alias("intercept"))
    return (
        med.crossJoin(F.broadcast(med2))
        .select(
            F.col("np").cast("long").alias("n_pairs"),
            F.round("slope", 6).alias("slope_per_day"),
            F.round("intercept", 6).alias("intercept"),
        )
    )


@register(
    "q_did",
    sql="""
    WITH s AS (SELECT CAST(user_id % 2 AS INT) AS treat,
                      CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                           THEN 1 ELSE 0 END AS post,
                      CAST(round(value * 1000000000.0) AS BIGINT) AS v_nano
               FROM events WHERE value IS NOT NULL),
    c AS (SELECT treat, post, count(*) AS n, sum(v_nano) AS sv
          FROM s GROUP BY 1, 2),
    p AS (SELECT
            max(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n00,
            max(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n01,
            max(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n10,
            max(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n11,
            max(CASE WHEN treat = 0 AND post = 0 THEN sv END) AS s00,
            max(CASE WHEN treat = 0 AND post = 1 THEN sv END) AS s01,
            max(CASE WHEN treat = 1 AND post = 0 THEN sv END) AS s10,
            max(CASE WHEN treat = 1 AND post = 1 THEN sv END) AS s11
          FROM c)
    SELECT CAST(n00 AS BIGINT) AS n00, CAST(n01 AS BIGINT) AS n01,
           CAST(n10 AS BIGINT) AS n10, CAST(n11 AS BIGINT) AS n11,
           round(s00 / (n00 * 1000000000.0), 6) AS mean00,
           round(s01 / (n01 * 1000000000.0), 6) AS mean01,
           round(s10 / (n10 * 1000000000.0), 6) AS mean10,
           round(s11 / (n11 * 1000000000.0), 6) AS mean11,
           round((s11 / (n11 * 1000000000.0) - s10 / (n10 * 1000000000.0))
                 - (s01 / (n01 * 1000000000.0) - s00 / (n00 * 1000000000.0)),
                 6) AS did
    FROM p
    """,
)
def q_did(spark, sf_dir):
    """Difference-in-differences point estimate of the treatment
    effect on event value: treatment = deterministic user-id parity
    (the q_abtest bucketing), post-period = the fixture's mid-month
    cutoff — DiD nets out both the stable group gap and the common
    time shock, the workhorse causal estimator for launch analysis
    (Card-Krueger 1994).

    Exactness: each value is nano-int rounded BEFORE the cell sums
    (summation-order-free integer cells), the four cell means are one
    division each, and the DiD contrast is one fixed float formula —
    engine-exact at 6dp.  Invariance laws pinned: adding a constant
    to every value, or any additive group/period effect, leaves DiD
    unchanged.  Scale: one map-side-combined 4-cell aggregate; the
    timestamp predicate rides the scan (partition-prunable on a
    date-partitioned layout)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cutoff_us = 1705363200000000  # 2024-01-16 00:00:00 UTC
    s = ev.select(
        (F.col("user_id") % 2).cast("int").alias("treat"),
        (F.expr("ts_ns div 1000") >= F.lit(cutoff_us))
        .cast("int").alias("post"),
        F.round(F.col("value") * 1000000000.0).cast("long").alias("v_nano"),
    )
    c = s.groupBy("treat", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v_nano").alias("sv")
    )

    def cell(t, p, col):
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), F.col(col))
        )

    p = c.agg(
        cell(0, 0, "n").alias("n00"), cell(0, 1, "n").alias("n01"),
        cell(1, 0, "n").alias("n10"), cell(1, 1, "n").alias("n11"),
        cell(0, 0, "sv").alias("s00"), cell(0, 1, "sv").alias("s01"),
        cell(1, 0, "sv").alias("s10"), cell(1, 1, "sv").alias("s11"),
    )
    mean = lambda s_, n_: F.col(s_) / (F.col(n_) * 1000000000.0)
    return p.select(
        F.col("n00").cast("long").alias("n00"),
        F.col("n01").cast("long").alias("n01"),
        F.col("n10").cast("long").alias("n10"),
        F.col("n11").cast("long").alias("n11"),
        F.round(mean("s00", "n00"), 6).alias("mean00"),
        F.round(mean("s01", "n01"), 6).alias("mean01"),
        F.round(mean("s10", "n10"), 6).alias("mean10"),
        F.round(mean("s11", "n11"), 6).alias("mean11"),
        F.round(
            (mean("s11", "n11") - mean("s10", "n10"))
            - (mean("s01", "n01") - mean("s00", "n00")),
            6,
        ).alias("did"),
    )


@register(
    "q_hill",
    sql="""
    WITH top AS (SELECT o_totalprice AS x FROM orders
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 101),
    k1 AS (SELECT min(x) AS xk1, count(*) AS n FROM top),
    t AS (SELECT CAST(round(ln(top.x / k1.xk1) * 1000000000.0) AS BIGINT)
                     AS l_nano
          FROM top CROSS JOIN k1)
    SELECT (SELECT n FROM k1) - 1 AS k,
           round((SELECT xk1 FROM k1), 6) AS x_kplus1,
           CAST(sum(l_nano) AS BIGINT) AS sum_ln_nano,
           round(((SELECT n FROM k1) - 1) * 1000000000.0 / sum(l_nano), 6)
               AS hill_alpha
    FROM t
    """,
)
def q_hill(spark, sf_dir):
    """Hill estimator of the power-law tail index over the top-100
    order totals — the heavy-tail gate (Hill 1975): alpha ~< 2 means
    infinite variance (plan for skew: salting, talking to q_salted_
    join/q_skew_split), alpha > 3 means means and variances behave.
    The tail-heaviness twin of q_zipf's rank-frequency fit.

    Shape: the ONLY data-sized step is a distributed top-k
    (TakeOrderedAndProject — per-partition heaps, no global sort);
    everything after runs on k+1 = 101 rows.  The tied-minimum trick
    makes the k+1-st row contribute ln(1) = 0, so no rank window is
    needed at all.  Each log-ratio is nano-int rounded before the
    sum; alpha is one division.  Scale: k is constant — the probe
    cost at 100 TB is the scan behind the top-k heap."""
    o = load_table(spark, sf_dir, "orders")
    top = (
        o.select(F.col("o_totalprice").alias("x"), "o_orderkey")
        .orderBy(F.col("x").desc(), "o_orderkey")
        .limit(101)
    )
    k1 = top.agg(F.min("x").alias("xk1"), F.count(F.lit(1)).alias("n"))
    t = top.crossJoin(F.broadcast(k1)).select(
        "n", "xk1",
        F.round(F.log(F.col("x") / F.col("xk1")) * 1000000000.0)
        .cast("long").alias("l_nano"),
    )
    return t.groupBy("n", "xk1").agg(
        F.sum("l_nano").alias("sum_ln_nano")
    ).select(
        (F.col("n") - 1).cast("long").alias("k"),
        F.round("xk1", 6).alias("x_kplus1"),
        F.col("sum_ln_nano").cast("long").alias("sum_ln_nano"),
        F.round(
            (F.col("n") - 1) * 1000000000.0 / F.col("sum_ln_nano"), 6
        ).alias("hill_alpha"),
    )


@register(
    "q_attribution",
    sql="""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
                      CAST(round(coalesce(value, 0) * 1000000000.0) AS BIGINT)
                          AS v_nano
               FROM events
               WHERE event_type IN ('click', 'view', 'purchase')),
    w AS (SELECT user_id, event_type, v_nano,
                 last_value(CASE WHEN event_type IN ('click', 'view')
                                 THEN event_type END IGNORE NULLS)
                     OVER (PARTITION BY user_id
                           ORDER BY ts_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS touch
          FROM e),
    c AS (SELECT coalesce(touch, 'none') AS touch_type,
                 count(*) AS n_conversions,
                 sum(v_nano) AS sv
          FROM w WHERE event_type = 'purchase' GROUP BY 1)
    SELECT touch_type, CAST(n_conversions AS BIGINT) AS n_conversions,
           round(sv / 1000000000.0, 6) AS attributed_value
    FROM c ORDER BY touch_type
    """,
)
def q_attribution(spark, sf_dir):
    """Last-touch revenue attribution: each purchase's value is
    credited to the user's most recent PRIOR click or view — the
    marketing-analytics workhorse beside q_funnel (ordered steps)
    and q_sessionize; 'none' rows are direct conversions with no
    preceding touch.

    Shape: ONE per-user window ordered by (ts, event_id) with a
    conditional last_value(IGNORE NULLS) over the preceding frame —
    the standard streaming-compatible attribution plan (no self-join
    of conversions to touches; state per user is one value).  The
    purchase values are nano-int rounded before the group sum.
    Scale: the window shuffles once on user_id (millions of small
    per-user partitions — the healthy high-cardinality window case),
    then a 3-key aggregate; at 100 TB this is exactly the
    sessionization shuffle shape, and the same plan runs under
    transformWithState for continuous attribution."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    e = ev.select(
        "user_id", "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
        "event_type",
        F.round(F.coalesce("value", F.lit(0)) * 1000000000.0)
        .cast("long").alias("v_nano"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = e.select(
        "event_type", "v_nano",
        F.last(
            F.when(
                F.col("event_type").isin("click", "view"), F.col("event_type")
            ),
            ignorenulls=True,
        ).over(w).alias("touch"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum("v_nano").alias("sv"),
        )
        .select(
            "touch_type",
            F.col("n_conversions").cast("long").alias("n_conversions"),
            F.round(F.col("sv") / 1000000000.0, 6).alias("attributed_value"),
        )
        .orderBy("touch_type")
    )


@register(
    "q_cuped",
    sql="""
    WITH u AS (SELECT user_id, CAST(user_id % 2 AS INT) AS treat,
                      sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                               THEN CAST(round(value * 1000.0) AS BIGINT)
                               ELSE 0 END) AS x_milli,
                      sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                               THEN CAST(round(value * 1000.0) AS BIGINT)
                               ELSE 0 END) AS y_milli
               FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    g AS (SELECT count(*) AS n, sum(x_milli) AS sx, sum(y_milli) AS sy,
                 sum(x_milli * y_milli) AS sxy,
                 sum(x_milli * x_milli) AS sxx,
                 sum(y_milli * y_milli) AS syy
          FROM u),
    a AS (SELECT treat, count(*) AS na, sum(x_milli) AS sxa,
                 sum(y_milli) AS sya
          FROM u GROUP BY 1),
    p AS (SELECT
            max(CASE WHEN treat = 0 THEN na END) AS n0,
            max(CASE WHEN treat = 1 THEN na END) AS n1,
            max(CASE WHEN treat = 0 THEN sxa END) AS sx0,
            max(CASE WHEN treat = 1 THEN sxa END) AS sx1,
            max(CASE WHEN treat = 0 THEN sya END) AS sy0,
            max(CASE WHEN treat = 1 THEN sya END) AS sy1
          FROM a)
    SELECT CAST(g.n AS BIGINT) AS n_users,
           CAST(p.n0 AS BIGINT) AS n0, CAST(p.n1 AS BIGINT) AS n1,
           round((g.n * g.sxy - g.sx * g.sy)
                 / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE), 6) AS theta,
           round((p.sy1 / (p.n1 * 1000.0) - p.sy0 / (p.n0 * 1000.0)), 6)
               AS diff_raw,
           round((p.sy1 / (p.n1 * 1000.0) - p.sy0 / (p.n0 * 1000.0))
                 - ((g.n * g.sxy - g.sx * g.sy)
                    / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE))
                   * (p.sx1 / (p.n1 * 1000.0) - p.sx0 / (p.n0 * 1000.0)), 6)
               AS diff_cuped,
           round((CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                  * (g.n * g.sxy - g.sx * g.sy))
                 / (CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE)
                    * (g.n * g.syy - g.sy * g.sy)), 6) AS var_reduction
    FROM g CROSS JOIN p
    """,
)
def q_cuped(spark, sf_dir):
    """CUPED variance-reduced experiment readout (Deng et al.
    WSDM'13): per-user PRE-period spend is the control covariate for
    the POST-period metric; theta = cov(X,Y)/var(X) over all users,
    adjusted lift = raw lift - theta * covariate imbalance, and
    var_reduction = rho^2 is the fraction of metric variance the
    covariate removes — the estimator every experimentation platform
    runs on top of the q_abtest/q_did bucketing.

    Exactness: per-user period sums are milli-int (so squares and
    cross-products stay far inside 2^63 at user cardinality), the
    five sufficient statistics are engine-exact integers, and theta /
    lifts / rho^2 are fixed float formulas over them (rho^2 kept in
    factored double form, the q_trend_ols overflow dodge).  X-bar
    cancels in the between-arm contrast, so no mean-centering ever
    touches a cross-row sum.  Scale: ONE user-keyed map-side-combined
    aggregate then two constant-size reductions — the canonical
    two-pass-free CUPED shape; the user aggregate is the same shuffle
    q_sessionize already pays."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cutoff_us = 1705363200000000
    pre = F.expr("ts_ns div 1000") < F.lit(cutoff_us)
    v_milli = F.round(F.col("value") * 1000.0).cast("long")
    u = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("treat")
    ).agg(
        F.sum(F.when(pre, v_milli).otherwise(0)).alias("x_milli"),
        F.sum(F.when(~pre, v_milli).otherwise(0)).alias("y_milli"),
    )
    g = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_milli").alias("sx"),
        F.sum("y_milli").alias("sy"),
        F.sum(F.col("x_milli") * F.col("y_milli")).alias("sxy"),
        F.sum(F.col("x_milli") * F.col("x_milli")).alias("sxx"),
        F.sum(F.col("y_milli") * F.col("y_milli")).alias("syy"),
    )
    a = u.groupBy("treat").agg(
        F.count(F.lit(1)).alias("na"),
        F.sum("x_milli").alias("sxa"),
        F.sum("y_milli").alias("sya"),
    )

    def cell(t, col):
        return F.max(F.when(F.col("treat") == t, F.col(col)))

    p = a.agg(
        cell(0, "na").alias("n0"), cell(1, "na").alias("n1"),
        cell(0, "sxa").alias("sx0"), cell(1, "sxa").alias("sx1"),
        cell(0, "sya").alias("sy0"), cell(1, "sya").alias("sy1"),
    )
    j = g.crossJoin(F.broadcast(p))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    theta = cov / varx.cast("double")
    ybar = lambda s_, n_: F.col(s_) / (F.col(n_) * 1000.0)
    diff_raw = ybar("sy1", "n1") - ybar("sy0", "n0")
    diff_x = ybar("sx1", "n1") - ybar("sx0", "n0")
    return j.select(
        n.cast("long").alias("n_users"),
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(theta, 6).alias("theta"),
        F.round(diff_raw, 6).alias("diff_raw"),
        F.round(diff_raw - theta * diff_x, 6).alias("diff_cuped"),
        F.round(
            (cov.cast("double") * cov) / (varx.cast("double") * (n * syy - sy * sy)),
            6,
        ).alias("var_reduction"),
    )


def _daily_grid(ev, x_name: str = "x", y_cast: str | None = None,
                keep_d0: bool = False):
    """Dense (event_type x calendar-day) grid of daily event counts
    with zero-filled gaps — the shared front end of the time-series
    family (burstiness / STL / Holt / backtest / Friedman / Hurst /
    burst-HMM).  Columns: event_type, ``x_name`` (0-based day index),
    ``y`` (count, optionally cast), plus ``d0`` when ``keep_d0``.

    Alias hygiene (VERDICT r6 'What's wrong' #1): the distinct-types
    frame derives from the same parent as the join's right side, so a
    naive ``types["event_type"] == d["event_type"]`` resolves BOTH
    sides to one attribute — a trivially-true conjunct that would
    silently turn into a partial cross product if the date conjunct
    were ever dropped.  Renaming the types side through a fresh
    ``__et`` attribute makes every join conjunct bind distinct
    attributes by construction (no `trivially true equals predicate`
    warning anywhere in the gate/bench tails).

    Scale: one (type, day)-key map-side aggregate is the only
    data-sized stage; the grid itself is types x days regardless of
    corpus size, and the 1-row bounds frame broadcasts."""
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    b = d.agg(
        F.min("day").alias("d0"),
        F.datediff(F.max("day"), F.min("day")).alias("span"),
    )
    types = d.select(F.col("event_type").alias("__et")).distinct()
    spine = b.select(
        F.explode(F.sequence(F.lit(0), F.col("span"))).alias(x_name), "d0"
    )
    y = F.coalesce("y", F.lit(0))
    if y_cast is not None:
        y = y.cast(y_cast)
    cols = [F.col("__et").alias("event_type"), F.col(x_name)]
    if keep_d0:
        cols.append(F.col("d0"))
    return (
        types.crossJoin(F.broadcast(spine))
        .join(
            d,
            (F.expr(f"date_add(d0, CAST({x_name} AS INT))") == F.col("day"))
            & (F.col("__et") == d["event_type"]),
            "left",
        )
        .select(*cols, y.alias("y"))
    )


@register(
    "q_burstiness",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    b AS (SELECT min(day) AS d0,
                 datediff('day', min(day), max(day)) AS span
          FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    grid AS (SELECT t.event_type, g.x, coalesce(d.y, 0) AS y
             FROM types t
             CROSS JOIN (SELECT unnest(generate_series(0,
                                (SELECT span FROM b))) AS x) g
             LEFT JOIN d ON d.event_type = t.event_type
                        AND d.day = (SELECT d0 FROM b) + INTERVAL (g.x) DAY),
    s AS (SELECT event_type, count(*) AS n, sum(y) AS sy,
                 sum(y * y) AS syy
          FROM grid GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(sy AS BIGINT) AS total,
           CAST(n * syy - sy * sy AS BIGINT) AS var_num,
           round((n * syy - sy * sy) / CAST(n * sy AS DOUBLE), 6)
               AS fano,
           round(CAST(n * syy - sy * sy AS DOUBLE) * n
                 / ((n - 1) * (sy * CAST(sy AS DOUBLE)))
                 - 1.0 / (sy / CAST(n AS DOUBLE)), 6) AS cv2_minus_inv_mean
    FROM s ORDER BY event_type
    """,
)
def q_burstiness(spark, sf_dir):
    """Fano factor (index of dispersion) of daily event counts per
    type over the zero-filled calendar — the burstiness gate: a
    Poisson-arrival stream has fano == 1; fano >> 1 means bursty
    traffic (size partitions and state stores for peaks, not means),
    fano << 1 means regularized arrivals.  cv2_minus_inv_mean is the
    companion excess-variability measure (CV^2 - 1/mean, zero for
    Poisson) on the same integer sums.

    Exactness: integer daily counts on a dense calendar grid; the
    variance numerator n*syy - sy^2 is a pure integer (cross-
    multiplied centering, the q_acf identity) and each output is one
    fixed float formula.  Scale: one (type, day)-key map-side
    aggregate, then per-type constant-size reductions — the grid is
    types x days regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    grid = _daily_grid(ev)
    s = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sy, syy = F.col("n"), F.col("sy"), F.col("syy")
    var_num = n * syy - sy * sy
    return s.select(
        "event_type",
        n.cast("long").alias("n_days"),
        sy.cast("long").alias("total"),
        var_num.cast("long").alias("var_num"),
        F.round(var_num / (n * sy).cast("double"), 6).alias("fano"),
        F.round(
            var_num.cast("double") * n / ((n - 1) * (sy * sy.cast("double")))
            - 1.0 / (sy / n.cast("double")),
            6,
        ).alias("cv2_minus_inv_mean"),
    ).orderBy("event_type")


@register(
    "q_anova",
    sql="""
    WITH s AS (SELECT event_type,
                      CAST(round(value * 1000.0) AS BIGINT) AS v
               FROM events WHERE value IS NOT NULL),
    g AS (SELECT event_type, count(*) AS ng, sum(v) AS sg,
                 sum(v * v) AS sqg
          FROM s GROUP BY 1),
    t AS (SELECT count(*) AS k, sum(ng) AS n, sum(sg) AS st,
                 sum(sqg) AS sqt,
                 sum(CAST(sg AS DOUBLE) * sg / ng) AS ssb_part
          FROM g)
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n,
           round((ssb_part - CAST(st AS DOUBLE) * st / n)
                 / 1000000.0, 6) AS ss_between,
           round((sqt - ssb_part) / 1000000.0, 6) AS ss_within,
           round(((ssb_part - CAST(st AS DOUBLE) * st / n) / (k - 1))
                 / ((sqt - ssb_part) / (n - k)), 6) AS f_stat,
           round((ssb_part - CAST(st AS DOUBLE) * st / n)
                 / (sqt - CAST(st AS DOUBLE) * st / n), 6) AS eta_squared
    FROM t
    """,
)
def q_anova(spark, sf_dir):
    """One-way ANOVA of event value across the five event types — the
    does-the-metric-differ-by-segment omnibus test beside the
    pairwise drift family (q_ks_test/q_mannwhitney compare two
    groups; ANOVA screens ALL segments in one pass), with eta^2 as
    the variance-explained effect size.

    Exactness: values are milli-int rounded per row (micro overflows
    2^63 in the sum of squares at this fixture's value range; at
    1e12+ rows move the sum-of-squares to DECIMAL(38) or a two-pass
    centered form), the per-group
    sufficient statistics (n, sum, sum-of-squares) are engine-exact
    integers, and SSB/SSW/F/eta^2 are fixed float formulas over them
    (the sum(sg^2/ng) term is accumulated in double over the K=5
    group rows — K-bounded, order-fixed by the single-row reduce).
    Scale: ONE map-side-combined 5-key aggregate then a constant
    reduction — the textbook distributed-ANOVA shape; no window, no
    join, no second scan."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(
        "event_type",
        F.round(F.col("value") * 1000.0).cast("long").alias("v"),
    )
    g = s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("v").alias("sg"),
        F.sum(F.col("v") * F.col("v")).alias("sqg"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("st"),
        F.sum("sqg").alias("sqt"),
        F.sum(F.col("sg").cast("double") * F.col("sg") / F.col("ng"))
        .alias("ssb_part"),
    )
    k, n = F.col("k"), F.col("n")
    st, sqt, ssb_part = F.col("st"), F.col("sqt"), F.col("ssb_part")
    ssb = ssb_part - st.cast("double") * st / n
    ssw = sqt - ssb_part
    sst = sqt - st.cast("double") * st / n
    return t.select(
        k.cast("long").alias("k_groups"),
        n.cast("long").alias("n"),
        F.round(ssb / 1000000.0, 6).alias("ss_between"),
        F.round(ssw / 1000000.0, 6).alias("ss_within"),
        F.round((ssb / (k - 1)) / (ssw / (n - k)), 6).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_squared"),
    )


_STL_SQL = """
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    b AS (SELECT min(day) AS d0,
                 datediff('day', min(day), max(day)) AS span
          FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    grid AS (SELECT t.event_type, g.x, coalesce(d.y, 0) AS y
             FROM types t
             CROSS JOIN (SELECT unnest(generate_series(0,
                                (SELECT span FROM b))) AS x) g
             LEFT JOIN d ON d.event_type = t.event_type
                        AND d.day = (SELECT d0 FROM b) + INTERVAL (g.x) DAY),
    tr AS (SELECT event_type, x, y,
                  sum(y) OVER w AS s7, count(*) OVER w AS c7
           FROM grid
           WINDOW w AS (PARTITION BY event_type ORDER BY x
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    t2 AS (SELECT event_type, x, y, x % 7 AS dow,
                  CASE WHEN c7 = 7 THEN s7 / 7.0 END AS trend,
                  CASE WHEN c7 = 7 THEN
                    CAST(round((y - s7 / 7.0) * 1e9) AS BIGINT) END AS detr_n
           FROM tr),
    sr AS (SELECT event_type, dow,
                  CAST(round(sum(detr_n) / CAST(count(*) AS DOUBLE)) AS BIGINT)
                      AS s_rn
           FROM t2 WHERE detr_n IS NOT NULL GROUP BY 1, 2),
    adj AS (SELECT event_type,
                   CAST(round(sum(s_rn) / CAST(count(*) AS DOUBLE)) AS BIGINT)
                       AS a_n
            FROM sr GROUP BY 1),
    sea AS (SELECT sr.event_type, sr.dow, sr.s_rn - adj.a_n AS seasonal_n
            FROM sr JOIN adj USING (event_type))
    SELECT t2.event_type AS event_type,
           CAST((SELECT d0 FROM b) + INTERVAL (t2.x) DAY AS DATE) AS day,
           CAST(t2.y AS BIGINT) AS y,
           round(t2.trend, 6) AS trend,
           round(sea.seasonal_n / 1e9, 6) AS seasonal,
           round((t2.detr_n - sea.seasonal_n) / 1e9, 6) AS resid
    FROM t2 JOIN sea ON t2.event_type = sea.event_type AND t2.dow = sea.dow
    ORDER BY 1, 2
"""


@register("q_stl_decompose", sql=_STL_SQL)
def q_stl_decompose(spark, sf_dir):
    """Classical additive seasonal-trend decomposition (the moving-
    average core of STL, period 7) of the zero-filled daily event
    series per type: trend = centered 7-day moving average (full
    windows only), seasonal = mean-centered day-of-week means of the
    detrended series, residual = the rest — the decomposition behind
    q_seasonality's weekday profile and q_anomaly's alerts (alert on
    RESIDUALS, not raw counts, and weekly cycles stop paging).

    Exactness: trend is an integer window sum divided by exactly 7;
    every detrended value is nano-int-rounded BEFORE the day-of-week
    mean (order-free sums), seasonal offsets stay BIGINT through the
    centering, and y = trend + seasonal + resid holds exactly in nano
    space (pinned).  dow = x % 7 is a grid index, so no engine
    dayofweek() convention is involved.

    Scale shape: one (type, day)-key map-side aggregate, then every
    window/join runs on the types x days grid (date cardinality, not
    corpus cardinality) with the 7-row-per-type seasonal table
    broadcast back — same footprint as q_acf/q_burstiness at any
    corpus size."""
    ev = load_table(spark, sf_dir, "events")
    grid = _daily_grid(ev, keep_d0=True)
    w7 = Window.partitionBy("event_type").orderBy("x").rowsBetween(-3, 3)
    trend = F.when(
        F.count(F.lit(1)).over(w7) == 7, F.sum("y").over(w7) / F.lit(7.0)
    )
    t2 = grid.select(
        "event_type", "x", "d0", "y",
        (F.col("x") % 7).alias("dow"),
        trend.alias("trend"),
        F.round((F.col("y") - trend) * F.lit(1e9)).cast("long").alias("detr_n"),
    )
    sr = (
        t2.filter(F.col("detr_n").isNotNull())
        .groupBy("event_type", "dow")
        .agg(
            F.round(
                F.sum("detr_n") / F.count(F.lit(1)).cast("double")
            ).cast("long").alias("s_rn")
        )
    )
    adj = sr.groupBy("event_type").agg(
        F.round(F.sum("s_rn") / F.count(F.lit(1)).cast("double"))
        .cast("long").alias("a_n")
    )
    sea = sr.join(adj, "event_type").select(
        "event_type", "dow", (F.col("s_rn") - F.col("a_n")).alias("seasonal_n")
    )
    return (
        t2.join(F.broadcast(sea), ["event_type", "dow"])
        .select(
            "event_type",
            F.expr("date_add(d0, CAST(x AS INT))").alias("day"),
            F.col("y").cast("long").alias("y"),
            F.round("trend", 6).alias("trend"),
            F.round(F.col("seasonal_n") / F.lit(1e9), 6).alias("seasonal"),
            F.round(
                (F.col("detr_n") - F.col("seasonal_n")) / F.lit(1e9), 6
            ).alias("resid"),
        )
        .orderBy("event_type", "day")
    )


_HOLT_SQL = """
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
      FROM events GROUP BY 1, 2),
    bnd AS (SELECT min(day) AS d0,
                   datediff('day', min(day), max(day)) AS span
            FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    ser AS (SELECT t.event_type, g.x + 1 AS t,
                   CAST(coalesce(d.y, 0) AS DOUBLE) AS y
            FROM types t
            CROSS JOIN (SELECT unnest(generate_series(0,
                               (SELECT span FROM bnd))) AS x) g
            LEFT JOIN d ON d.event_type = t.event_type
                       AND d.day = (SELECT d0 FROM bnd) + INTERVAL (g.x) DAY),
    nn AS (SELECT event_type, count(*) AS n FROM ser GROUP BY 1),
    r AS (
      SELECT s1.event_type AS event_type, 1 AS t,
             s1.y AS l, s2.y - s1.y AS b
      FROM ser s1 JOIN ser s2
        ON s1.event_type = s2.event_type AND s1.t = 1 AND s2.t = 2
      UNION ALL
      SELECT r.event_type, r.t + 1,
             0.5 * s.y + 0.5 * (r.l + r.b),
             0.25 * (0.5 * s.y + 0.5 * (r.l + r.b) - r.l) + 0.75 * r.b
      FROM r JOIN ser s
        ON s.event_type = r.event_type AND s.t = r.t + 1)
    SELECT r.event_type AS event_type,
           CAST(nn.n AS BIGINT) AS n_days,
           round(r.l, 6) AS level,
           round(r.b, 6) AS trend,
           round(r.l + 7.0 * r.b, 6) AS forecast_7
    FROM r JOIN nn ON r.event_type = nn.event_type AND r.t = nn.n
    ORDER BY 1
"""


@register("q_holt", sql=_HOLT_SQL)
def q_holt(spark, sf_dir):
    """Holt double-exponential smoothing (level + linear trend,
    alpha=0.5, beta=0.25) of the zero-filled daily event series per
    type, with the 7-day-ahead forecast l_n + 7*b_n — the forecasting
    companion to q_ewma's flat smoother (a trending series needs the
    trend state or the forecast always lags) and to
    q_stl_decompose's descriptive split.

    The recurrence l_t = a*y_t + (1-a)*(l+b); b_t = B*(l_t-l) +
    (1-B)*b is a linear fold that windows cannot express: batch form
    collects each type's ordered series (bounded: date cardinality)
    and runs ONE JVM struct-accumulator fold; initialization l_1=y_1,
    b_1=y_2-y_1.  alpha/beta are exact binary doubles and the DuckDB
    oracle's recursive CTE replays the identical IEEE operation
    sequence step-for-step, so results hash-match at 6dp — same
    protocol as q_ewma, extended to a 2-component state.

    Scale shape: one (type, day)-key map-side aggregate, then
    per-type state is 2 doubles over a date-cardinality list; for
    unbounded streams the same recurrence runs incrementally in
    applyInPandasWithState (streaming/stateful.py pattern)."""
    ev = load_table(spark, sf_dir, "events")
    grid = _daily_grid(ev, y_cast="double")
    ys = F.transform(
        F.sort_array(F.collect_list(F.struct("x", "y"))), lambda s: s["y"]
    )
    agg = grid.groupBy("event_type").agg(ys.alias("ys"))

    y1 = F.element_at(F.col("ys"), 1)
    y2 = F.element_at(F.col("ys"), 2)
    init = F.struct(y1.alias("l"), (y2 - y1).alias("b"))

    def step(acc, y):
        l_new = F.lit(0.5) * y + F.lit(0.5) * (acc["l"] + acc["b"])
        b_new = F.lit(0.25) * (l_new - acc["l"]) + F.lit(0.75) * acc["b"]
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    state = F.aggregate(
        F.slice(F.col("ys"), 2, F.greatest(F.size("ys") - 1, F.lit(0))),
        init,
        step,
    )
    return (
        agg.select(
            "event_type",
            F.size("ys").cast("long").alias("n_days"),
            state.alias("st"),
        )
        .select(
            "event_type",
            "n_days",
            F.round(F.col("st.l"), 6).alias("level"),
            F.round(F.col("st.b"), 6).alias("trend"),
            F.round(F.col("st.l") + F.lit(7.0) * F.col("st.b"), 6).alias(
                "forecast_7"
            ),
        )
        .orderBy("event_type")
    )


_PSM_SQL = """
    WITH u AS (
      SELECT user_id,
             count(*) AS n,
             count(DISTINCT CAST(ts AS DATE)) AS days,
             sum(CAST(round(coalesce(value, 0) * 1000) AS BIGINT)) AS total_m
      FROM events GROUP BY 1),
    s AS (SELECT user_id, CAST(user_id % 2 AS INT) AS treat,
                 round(1.0 / (1.0 + exp(-(-2.0 + 0.05 * n + 0.1 * days))), 3)
                     AS score3,
                 CAST(round(total_m * 1000.0 / n) AS BIGINT) AS y_mm
          FROM u),
    cell AS (SELECT treat, score3, count(*) AS n_u,
                    sum(y_mm) AS y_sum
             FROM s GROUP BY 1, 2),
    t AS (SELECT score3, n_u, y_sum FROM cell WHERE treat = 1),
    c AS (SELECT score3 AS c_score3, n_u AS nc, y_sum AS yc_sum
          FROM cell WHERE treat = 0),
    m AS (SELECT t.score3, t.n_u, t.y_sum, c.c_score3, c.nc, c.yc_sum,
                 row_number() OVER (PARTITION BY t.score3
                   ORDER BY abs(t.score3 - c.c_score3), c.c_score3) AS rn
          FROM t CROSS JOIN c)
    SELECT score3,
           CAST(n_u AS BIGINT) AS n_treated,
           round(y_sum / (n_u * 1e6), 6) AS y_treat,
           c_score3 AS ctrl_score3,
           CAST(nc AS BIGINT) AS n_ctrl,
           round(yc_sum / (nc * 1e6), 6) AS y_ctrl,
           round(y_sum / (n_u * 1e6) - yc_sum / (nc * 1e6), 6) AS att_cell
    FROM m WHERE rn = 1 ORDER BY score3
"""


@register("q_propensity_match", sql=_PSM_SQL)
def q_propensity_match(spark, sf_dir):
    """Propensity-score matching at score-cell granularity (Rosenbaum-
    Rubin): users get a deterministic stand-in propensity
    sigmoid(-2 + 0.05*n_events + 0.1*active_days) ROUNDED TO 3dp, and
    every treated score cell is matched to its nearest control cell
    by |score gap| (tie -> lower control score); att_cell is the
    treated-minus-matched-control outcome contrast, completing the
    causal family beside q_abtest (randomized), q_did (parallel
    trends) and q_cuped (variance reduction) for the observational
    case.  Treatment = user parity (the fixture convention); outcome
    = the user's mean event value.

    Exactness: outcomes ride the milli->micro integer ladder (value
    rounded to milli BEFORE the per-user sum, the per-user mean
    rounded to a micro BIGINT before the cell sum), so cell sums are
    order-free; the sigmoid is libm but 3dp rounding absorbs ulp
    variance (the q_quality_classifier precedent).

    Scale shape: the 3dp rounding BOUNDS the matching problem by
    construction — at most 1001 score values per arm regardless of
    user cardinality (the VERDICT r5 #4 protocol: cardinality bounded
    by pre-rounding, not by data).  The match is a broadcast
    cells x cells join + per-cell rank window over <= ~1e6 bounded
    pairs; user-sized data only flows through two map-side-combined
    aggregates."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.col("ts").cast("date")).alias("days"),
        F.sum(
            F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
            .cast("long")
        ).alias("total_m"),
    )
    z = F.lit(-2.0) + F.lit(0.05) * F.col("n") + F.lit(0.1) * F.col("days")
    s = u.select(
        (F.col("user_id") % 2).cast("int").alias("treat"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 3).alias("score3"),
        F.round(F.col("total_m") * F.lit(1000.0) / F.col("n"))
        .cast("long").alias("y_mm"),
    )
    cell = s.groupBy("treat", "score3").agg(
        F.count(F.lit(1)).alias("n_u"), F.sum("y_mm").alias("y_sum")
    )
    t = cell.filter(F.col("treat") == 1).select("score3", "n_u", "y_sum")
    c = cell.filter(F.col("treat") == 0).select(
        F.col("score3").alias("c_score3"),
        F.col("n_u").alias("nc"),
        F.col("y_sum").alias("yc_sum"),
    )
    m = t.crossJoin(F.broadcast(c))
    w = Window.partitionBy("score3").orderBy(
        F.abs(F.col("score3") - F.col("c_score3")), F.col("c_score3")
    )
    yt = F.col("y_sum") / (F.col("n_u") * F.lit(1e6))
    yc = F.col("yc_sum") / (F.col("nc") * F.lit(1e6))
    return (
        m.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "score3",
            F.col("n_u").cast("long").alias("n_treated"),
            F.round(yt, 6).alias("y_treat"),
            F.col("c_score3").alias("ctrl_score3"),
            F.col("nc").cast("long").alias("n_ctrl"),
            F.round(yc, 6).alias("y_ctrl"),
            F.round(yt - yc, 6).alias("att_cell"),
        )
        .orderBy("score3")
    )


#: Abramowitz-Stegun 7.1.26 erf polynomial constants — the shared
#: closed-form normal tail both engines evaluate identically (only
#: +,-,*,/ and exp; the result is rounded before any comparison).
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _as_p_sql(z: str) -> str:
    """two-sided p = erfc(|z|/sqrt(2)) via the A-S 7.1.26 polynomial:
    p = (a1 t + a2 t^2 + ... + a5 t^5) * exp(-x^2), t = 1/(1 + p*x),
    x = |z|/sqrt(2).

    The terms are built EXACTLY like the Spark side (_as_p_col /
    q_bh_fdr's fold): each power is the running product tp_{i+1} =
    (tp_i * t) computed FIRST, then multiplied by the coefficient —
    a_i * ((t*t)*t...), NOT ((a_i*t)*t)*t....  The two associations
    differ by ~1 ulp on ~half of inputs; keeping them identical is
    what makes the 9dp rounding bit-identical across engines instead
    of merely almost-always identical."""
    x = f"(abs({z}) / sqrt(2.0))"
    t = f"(1.0 / (1.0 + {_AS_P} * {x}))"
    tp = t
    terms = []
    for a in _AS_A:
        terms.append(f"({a}) * {tp}")
        tp = f"({tp} * {t})"
    poly = " + ".join(terms)
    return f"round(({poly}) * exp(-({x} * {x})), 9)"


def _as_p_col(z):
    """Two-sided normal p-value 1 - erf(|z|/sqrt(2)) via the same
    Abramowitz-Stegun 7.1.26 polynomial _as_p_sql replays in DuckDB
    (the q_bh_fdr machinery, shared): identical literals, identical
    operation order, rounded 9dp on both engines."""
    x = F.abs(z) / F.sqrt(F.lit(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * x)
    poly = None
    tp = t
    for a in _AS_A:
        term = F.lit(a) * tp
        poly = term if poly is None else poly + term
        tp = tp * t
    return F.round(poly * F.exp(-(x * x)), 9)


#: the per-type Welch-z hypothesis table with A-S p-values, ranked by
#: p — the shared front half of both FDR procedures (BH and BY differ
#: only in the step-up threshold).
_RANKED_P_CTES = f"""v AS (SELECT event_type,
                      CAST(round(coalesce(value, 0) * 1000) AS BIGINT) AS vm
               FROM events),
    g0 AS (SELECT event_type, count(*) AS n, sum(vm) AS s,
                  sum(vm * vm) AS q
           FROM v GROUP BY 1),
    tot0 AS (SELECT sum(n) AS n_all, sum(s) AS s_all, sum(q) AS q_all
             FROM g0),
    g AS (SELECT g0.* FROM g0 CROSS JOIN tot0
          WHERE g0.n > 1 AND tot0.n_all - g0.n > 1),
    tot AS (SELECT tot0.n_all, tot0.s_all, tot0.q_all, fam.m
            FROM tot0 CROSS JOIN
                 (SELECT count(*) AS m FROM g) AS fam),
    z AS (SELECT g.event_type, g.n, tot.m,
                 round((g.s / CAST(g.n AS DOUBLE)
                        - (tot.s_all - g.s) / CAST(tot.n_all - g.n AS DOUBLE))
                       / sqrt(
                    (g.q - g.s * (g.s / CAST(g.n AS DOUBLE)))
                        / (CAST(g.n AS DOUBLE) * (g.n - 1))
                    + ((tot.q_all - g.q)
                       - (tot.s_all - g.s)
                         * ((tot.s_all - g.s) / CAST(tot.n_all - g.n AS DOUBLE)))
                        / (CAST(tot.n_all - g.n AS DOUBLE)
                           * (tot.n_all - g.n - 1))), 6)
                 + 0.0 AS z_raw
          FROM g CROSS JOIN tot),
    p AS (SELECT event_type, n, m, z_raw AS z,
                 {_as_p_sql('z_raw')} AS p
          FROM z),
    r AS (SELECT *, CAST(row_number() OVER (ORDER BY p, event_type)
                         AS INTEGER) AS rk
          FROM p)"""

_BH_SQL = f"""
    WITH {_RANKED_P_CTES},
    d AS (SELECT *, round(rk * 0.1 / m, 9) AS bh_thresh,
                 CASE WHEN p <= rk * 0.1 / m THEN rk END AS pass_rk
          FROM r),
    mx AS (SELECT coalesce(max(pass_rk), 0) AS k FROM d)
    SELECT event_type, CAST(n AS BIGINT) AS n, z, p, rk, bh_thresh,
           CAST(CASE WHEN rk <= mx.k THEN 1 ELSE 0 END AS INT) AS discovery
    FROM d CROSS JOIN mx ORDER BY rk
"""


@register("q_bh_fdr", sql=_BH_SQL)
def q_bh_fdr(spark, sf_dir):
    """Benjamini-Hochberg FDR control (q = 0.1) over the per-type
    mean-value contrast tests (each event type vs the rest, Welch z
    from integer sufficient statistics) — the multiple-testing
    discipline the stats battery needs: run q_abtest-style tests per
    segment and WITHOUT a correction ~10% of null segments "alert"
    at p<0.1; BH keeps the expected false-discovery RATE at q.
    discovery = 1 for every rank up to the largest k with
    p_(k) <= k*q/m (the step-up rule: ranks below a passing rank are
    discoveries even if their own threshold check failed).

    Exactness: values ride the milli-int ladder (S, Q, n per group are
    exact integers); z is one fixed float formula rounded 6dp; the
    normal tail is the Abramowitz-Stegun 7.1.26 erfc polynomial
    (+,-,*,/,exp only — no engine erf() dependence) rounded 9dp
    BEFORE ranking, so p-order and every BH comparison are
    engine-identical.

    Scale shape: one map-side-combined per-type aggregate; everything
    after runs on m = type-cardinality rows (the rank window included
    — bounded by the segment domain, not the corpus)."""
    return _fdr_step_up(_ranked_hypotheses(spark, sf_dir), "bh_thresh")


def _ranked_hypotheses(spark, sf_dir):
    """The shared FDR front half: per-type Welch-z contrast tests from
    integer sufficient statistics, A-S p-values, p-ranked via the
    broadcast triangle join (window-free, VERDICT r7 #5).  Types with
    n < 2 (or complement < 2) carry no variance estimate and are
    excluded from the family — m counts TESTED hypotheses.  Returns
    (event_type, n, m, z, p, rk) — m = hypothesis count on every row."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
        .cast("long").alias("vm"),
    )
    g0 = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vm").alias("s"),
        F.sum(F.col("vm") * F.col("vm")).alias("q"),
    )
    # the per-type aggregate feeds full-corpus totals AND the guarded
    # family — persist so the data-sized aggregate runs once
    from shadems_spark.operators.dedup import tracked_persist

    g0 = tracked_persist(g0, key="fdr_type_stats")
    tot0 = g0.agg(
        F.sum("n").alias("n_all"), F.sum("s").alias("s_all"),
        F.sum("q").alias("q_all"),
    )
    # degenerate-group guard (the ADVICE r7 Welch class): a 1-row type
    # (or one whose complement has < 2 rows) admits no variance
    # estimate — it is EXCLUDED from the hypothesis family (m shrinks)
    # while its rows still count toward every other type's complement,
    # so non-degenerate corpora are byte-identical to the unguarded
    # form.
    g = g0.crossJoin(F.broadcast(tot0)).filter(
        (F.col("n") > 1) & (F.col("n_all") - F.col("n") > 1)
    ).select("event_type", "n", "s", "q")
    tot = tot0.crossJoin(
        F.broadcast(g.agg(F.count(F.lit(1)).alias("m")))
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    n2 = F.col("n_all") - n
    s2 = F.col("s_all") - s
    q2 = F.col("q_all") - q
    m1 = s / n.cast("double")
    m2 = s2 / n2.cast("double")
    var1 = (q - s * m1) / (n.cast("double") * (n - 1))
    var2 = (q2 - s2 * m2) / (n2.cast("double") * (n2 - 1))
    z_raw = F.round(
        (m1 - m2) / F.sqrt(var1 + var2), 6
    ) + F.lit(0.0)
    zt = g.crossJoin(F.broadcast(tot)).select(
        "event_type", "n", "m", z_raw.alias("z_raw")
    )

    p_col = _as_p_col(F.col("z_raw"))
    p = zt.select(
        "event_type", "n", "m", F.col("z_raw").alias("z"), p_col.alias("p")
    )
    # rank over the m = |event types| hypothesis rows via the
    # broadcast triangle join — window-free (VERDICT r7 #5)
    from shadems_spark.operators.profile import triangle_rank

    return triangle_rank(p, ["p", "event_type"], out="__trk").withColumn(
        "rk", F.col("__trk").cast("int")
    ).drop("__trk")


def _fdr_step_up(r, thresh_name: str, thresh_col=None):
    """Apply the step-up rule to the ranked hypothesis table: find the
    largest rank whose p clears its threshold; every rank at or below
    it is a discovery.  ``thresh_col`` defaults to the BH line
    rk*q/m (q = 0.1)."""
    if thresh_col is None:
        thresh_col = F.col("rk") * F.lit(0.1) / F.col("m")
    d = r.select(
        "event_type", "n", "m", "z", "p", "rk",
        F.round(thresh_col, 9).alias(thresh_name),
        F.when(F.col("p") <= thresh_col, F.col("rk")).alias("pass_rk"),
    )
    mx = d.agg(F.coalesce(F.max("pass_rk"), F.lit(0)).alias("k"))
    return (
        d.crossJoin(F.broadcast(mx))
        .select(
            "event_type", F.col("n").cast("long").alias("n"), "z", "p",
            "rk", thresh_name,
            (F.col("rk") <= F.col("k")).cast("int").alias("discovery"),
        )
        .orderBy("rk")
    )


_BY_SQL = f"""
    WITH {_RANKED_P_CTES},
    h AS (SELECT sum(CAST(round(1e9 / rk) AS BIGINT)) AS c_nano FROM r),
    d AS (SELECT r.*,
                 round(rk * 0.1 / (m * (h.c_nano / 1e9)), 9) AS by_thresh,
                 CASE WHEN p <= rk * 0.1 / (m * (h.c_nano / 1e9))
                      THEN rk END AS pass_rk
          FROM r CROSS JOIN h),
    mx AS (SELECT coalesce(max(pass_rk), 0) AS k FROM d)
    SELECT event_type, CAST(n AS BIGINT) AS n, z, p, rk, by_thresh,
           CAST(CASE WHEN rk <= mx.k THEN 1 ELSE 0 END AS INT) AS discovery
    FROM d CROSS JOIN mx ORDER BY rk
"""


@register("q_benjamini_yekutieli", sql=_BY_SQL)
def q_benjamini_yekutieli(spark, sf_dir):
    """Benjamini-Yekutieli FDR control (q = 0.1) over the same per-type
    Welch-z hypothesis table as q_bh_fdr — the DEPENDENT-test variant
    (Benjamini & Yekutieli 2001, Ann. Stat. 29(4)): under arbitrary
    dependence between the m tests the BH line must shrink by the
    harmonic factor c(m) = sum_{i=1..m} 1/i, so the step-up threshold
    is rk*q/(m*c(m)).  Overlapping segments (a user's events land in
    several types' complements) make the per-type contrasts
    dependent, which is exactly BY's setting; it discovers a subset
    of BH's discoveries by construction.

    Exactness: the harmonic sum is the ONE new float surface and it
    rides the nano-int protocol — each 1/i is HALF_UP nano-rounded to
    a BIGINT and SUMMED as integers (order-free, both engines
    identical; the 1e-9-per-term quantization is ~1e-8 relative on
    c(m), far inside the 9dp threshold rounding), computed from the
    rank column itself (each hypothesis row holds one rank in 1..m,
    so sum over rows = sum over i).  Everything upstream is the
    q_bh_fdr machinery unchanged (milli-int sufficient statistics,
    6dp z, A-S 9dp p, triangle rank).

    Scale shape: identical to q_bh_fdr — corpus-sized data only flows
    through the one map-side-combined per-type aggregate; the
    harmonic aggregate and step-up run on m = type-cardinality rows."""
    from shadems_spark.operators.dedup import tracked_persist

    # r feeds BOTH the harmonic aggregate and the step-up rows —
    # persist the m-row ranked table so the Welch/rank pipeline
    # compiles and runs once, not twice (plan-snapshot evidence: 80
    # shuffles unpersisted vs q_bh_fdr's 40)
    r = tracked_persist(
        _ranked_hypotheses(spark, sf_dir), key="fdr_ranked"
    )
    h = r.agg(
        F.sum(F.round(F.lit(1e9) / F.col("rk")).cast("long")).alias("c_nano")
    )
    rh = r.crossJoin(F.broadcast(h))
    thresh = (
        F.col("rk") * F.lit(0.1)
        / (F.col("m") * (F.col("c_nano") / F.lit(1e9)))
    )
    return _fdr_step_up(rh, "by_thresh", thresh)


_SKY_SQL = """
    WITH pr AS (SELECT round(o_totalprice, 2) AS p,
                       datediff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS d_ep
                FROM orders),
    cand AS (SELECT p, CAST(max(d_ep) AS BIGINT) AS d FROM pr GROUP BY 1),
    m AS (SELECT p, d,
                 max(d) OVER (ORDER BY p
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS m_lt
          FROM cand),
    sky AS (SELECT p, d FROM m WHERE m_lt IS NULL OR m_lt < d),
    cnt AS (SELECT p, d_ep AS d, count(*) AS n FROM pr GROUP BY 1, 2)
    SELECT sky.p AS price,
           CAST(DATE '1970-01-01' + INTERVAL (sky.d) DAY AS DATE) AS day,
           CAST(cnt.n AS BIGINT) AS n_at_point
    FROM sky JOIN cnt ON sky.p = cnt.p AND sky.d = cnt.d
    ORDER BY 1
"""


@register("q_skyline", sql=_SKY_SQL)
def q_skyline(spark, sf_dir):
    """2-D skyline (Pareto front) of orders under (minimize price,
    maximize recency) — the classic dominance operator (Borzsony-
    Kossmann-Stocker ICDE'01): an order point survives iff nothing is
    both cheaper-or-equal and at-least-as-recent (one strict).  The
    result is the Pareto staircase (cheaper survivors are strictly
    older, pricier ones strictly more recent), with
    the multiplicity of each surviving (price, day) point attached.

    2-D reduction: collapse to per-distinct-price max-recency
    candidates (same-price points with smaller d are dominated by
    their own group max; equal (p, d) duplicates merge into one
    multiplicity row), then a point survives iff the EXCLUSIVE prefix
    max of recency over all strictly-cheaper prices is below its own
    — i.e. skyline = one distributed exclusive max-scan
    (operators/profile.global_cummax, the two-phase value-cut shape:
    no single-partition window even though distinct prices grow
    linearly with the corpus).

    Candidate diet (VERDICT r6 #2): the corpus is never shuffled.  A
    broadcast-only dominance pre-prune (profile.prefix_max_prune —
    bucket-level exclusive prefix max of recency over cheaper price
    buckets, applied map-side) cuts the scan to staircase candidates
    BEFORE the per-price groupBy, so both the distinct-price
    aggregate and the exact two-phase max-scan shuffle survivors
    only; the multiplicity count then broadcast-joins the tiny
    skyline back onto the scan and aggregates just the matching
    rows.  Shuffled rows ~ candidates + skyline, not ~ 2x corpus.

    Exactness: prices pre-rounded to cents (the cardinality-bounding
    pre-round is NOT needed for correctness here — the scan is
    two-phase — but keeps float equality grouping deterministic);
    recency is an epoch-day integer; the dominance test is pure
    integer/rounded-double comparison; the pre-prune is lossless by
    the induction in its docstring."""
    from shadems_spark.operators.profile import global_cummax, prefix_max_prune

    o = load_table(spark, sf_dir, "orders")
    pr = o.select(
        F.round("o_totalprice", 2).alias("p"),
        F.unix_date(F.col("o_orderdate").cast("date")).cast("long").alias(
            "d_ep"
        ),
    )
    cand = (
        prefix_max_prune(pr, "p", "d_ep")
        .groupBy("p")
        .agg(F.max("d_ep").cast("long").alias("d"))
    )
    sky = global_cummax(cand, ["p"], "d", "m_lt").filter(
        F.col("m_lt").isNull() | (F.col("m_lt") < F.col("d"))
    )
    skp = sky.select(F.col("p").alias("sp"), F.col("d").alias("sd"))
    cnt = (
        pr.join(
            F.broadcast(skp),
            (F.col("p") == F.col("sp")) & (F.col("d_ep") == F.col("sd")),
        )
        .groupBy("sp", "sd")
        .agg(F.count(F.lit(1)).cast("long").alias("n_at_point"))
    )
    return cnt.select(
        F.col("sp").alias("price"),
        F.date_add(
            F.lit("1970-01-01").cast("date"), F.col("sd").cast("int")
        ).alias("day"),
        "n_at_point",
    ).orderBy("price")


_MA_SWEEPS = 12


def _ma_sql(sweeps: int = _MA_SWEEPS) -> str:
    """Unrolled DuckDB replay of the Markov removal-effect solve:
    the same journey/transition CTEs, then `sweeps` value-iteration
    steps for the base chain (b1..bN) and the per-channel removal
    chains (r1..rN, channel as a data dimension) with every step's
    per-edge contribution round()ed to a nano int before the sum —
    bit-parity with the engine's HOF fold."""
    head = """
    WITH e AS (SELECT user_id, event_type, ts, event_id,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events),
    fp AS (SELECT user_id, min(rn) AS prn FROM e
           WHERE event_type = 'purchase' GROUP BY 1),
    j AS (SELECT e.user_id, e.event_type, e.rn
          FROM e LEFT JOIN fp USING (user_id)
          WHERE fp.prn IS NULL OR e.rn <= fp.prn),
    j2 AS (SELECT user_id, event_type, rn,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY rn) AS nxt
           FROM j),
    trans AS (
      SELECT event_type AS s, coalesce(nxt, 'NULL') AS t
      FROM j2 WHERE event_type != 'purchase'
      UNION ALL
      SELECT 'START' AS s, event_type AS t FROM j2 WHERE rn = 1),
    cnts AS (SELECT s, t, count(*) AS cnt FROM trans GROUP BY 1, 2),
    outd AS (SELECT s, sum(cnt) AS out_n FROM cnts GROUP BY 1),
    mat AS MATERIALIZED (SELECT c.s, c.t, c.cnt, o.out_n
            FROM cnts c JOIN outd o USING (s) WHERE c.t != 'NULL'),
    states AS (SELECT DISTINCT s FROM mat),
    chans AS (SELECT s AS ch FROM states WHERE s != 'START'),
    b0 AS (SELECT s, CAST(0 AS BIGINT) AS p FROM states),
    r0 AS (SELECT c.ch, s.s, CAST(0 AS BIGINT) AS p
           FROM chans c CROSS JOIN states s)"""
    parts = [head]
    for k in range(1, sweeps + 1):
        parts.append(f""",
    b{k} AS (SELECT m.s,
      CAST(sum(round(m.cnt * (CASE WHEN m.t = 'purchase'
                                   THEN 1000000000
                                   ELSE coalesce(p.p, 0) END)
                     / m.out_n)) AS BIGINT) AS p
      FROM mat m LEFT JOIN b{k - 1} p ON p.s = m.t GROUP BY m.s),
    r{k} AS (SELECT c.ch, m.s,
      CAST(sum(round(m.cnt * (CASE WHEN m.t = 'purchase'
                                   THEN 1000000000
                                   WHEN m.t = c.ch THEN 0
                                   ELSE coalesce(p.p, 0) END)
                     / m.out_n)) AS BIGINT) AS p
      FROM chans c JOIN mat m ON true
      LEFT JOIN r{k - 1} p ON p.ch = c.ch AND p.s = m.t
      GROUP BY c.ch, m.s)""")
    parts.append(f""",
    base AS (SELECT p AS base_n FROM b{sweeps} WHERE s = 'START'),
    rem AS (SELECT ch, p AS removed_n FROM r{sweeps} WHERE s = 'START'),
    re AS (SELECT ch AS channel, base_n, removed_n,
                  greatest(base_n - removed_n, 0) AS re_nano
           FROM rem CROSS JOIN base),
    tt AS (SELECT sum(re_nano) AS re_tot FROM re)
    SELECT channel,
           round(base_n / 1e9, 6) AS base_conv,
           round(removed_n / 1e9, 6) AS removed_conv,
           CAST(re_nano AS BIGINT) AS re_nano,
           CASE WHEN tt.re_tot > 0
                THEN round(re_nano / CAST(tt.re_tot AS DOUBLE), 6)
           END AS share
    FROM re CROSS JOIN tt ORDER BY channel""")
    return "".join(parts)


@register("q_markov_attribution", sql=_ma_sql())
def q_markov_attribution(spark, sf_dir):
    """Markov removal-effect attribution (Anderl et al. 2016 — the
    data-driven successor to q_attribution's last-touch rule): model
    per-user journeys START -> events -> first purchase (absorbing) /
    NULL (journey end), then each channel's credit is its REMOVAL
    EFFECT — how much the absorption (conversion) probability drops
    when all mass entering that channel is redirected to NULL.
    Shares normalize the removal effects over channels.

    The absorption probability is 12 fixed value-iteration sweeps of
    p(s) <- sum_t P(s, t) * p(t) with p(purchase) = 1 (the pagerank
    fixed-sweep protocol); removing channel c is exactly "force
    p(c) = 0 in every sweep".  Every per-edge contribution
    round(cnt * p_t / out) is a nano int BEFORE the sum, so sweeps
    are engine/layout-exact and the unrolled-CTE oracle (_ma_sql)
    hash-matches.

    Scale shape: journeys/transitions are per-user windows (keyed,
    data-sized — the only heavy stage); the matrix collapses to
    event-type^2 rows gathered into ONE in-plan row, and ALL 12x5
    sweep evaluations run as higher-order-function folds inside a
    single projection over that row — no per-iteration shuffles, no
    driver-side solve."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select("user_id", "event_type", "ts", "event_id").withColumn(
        "rn", F.row_number().over(w)
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    j = e.join(fp, "user_id", "left").filter(
        F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
    )
    w2 = Window.partitionBy("user_id").orderBy("rn")
    j2 = j.withColumn("nxt", F.lead("event_type").over(w2))
    steps = j2.filter(F.col("event_type") != "purchase").select(
        F.col("event_type").alias("s"),
        F.coalesce("nxt", F.lit("NULL")).alias("t"),
    )
    starts = j2.filter(F.col("rn") == 1).select(
        F.lit("START").alias("s"), F.col("event_type").alias("t")
    )
    counts = (
        steps.unionByName(starts)
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = counts.groupBy("s").agg(F.sum("cnt").alias("out_n"))
    mat = counts.filter(F.col("t") != "NULL").join(F.broadcast(out), "s")
    one = mat.agg(
        F.sort_array(
            F.collect_list(F.struct("s", "t", "cnt", "out_n"))
        ).alias("m"),
        F.array_sort(F.collect_set("s")).alias("states"),
    )

    zero = F.lit(0).cast("long")

    def p_of(acc, t, ch):
        base = F.when(t == F.lit("purchase"), F.lit(10**9).cast("long"))
        if ch is not None:
            base = base.when(t == ch, zero)
        return base.otherwise(F.coalesce(F.element_at(acc, t), zero))

    def solve(ch):
        init = F.map_from_arrays(
            F.col("states"), F.transform(F.col("states"), lambda s: zero)
        )

        def step(acc, _):
            vals = F.transform(
                F.col("states"),
                lambda s: F.aggregate(
                    F.filter(F.col("m"), lambda m: m["s"] == s),
                    zero,
                    lambda a, m: a
                    + F.round(
                        m["cnt"] * p_of(acc, m["t"], ch) / m["out_n"]
                    ).cast("long"),
                ),
            )
            return F.map_from_arrays(F.col("states"), vals)

        final = F.aggregate(
            F.sequence(F.lit(1), F.lit(_MA_SWEEPS)), init, step
        )
        return F.coalesce(F.element_at(final, F.lit("START")), zero)

    row = one.select(
        F.explode(F.array_remove("states", "START")).alias("channel"),
        "m", "states",
    )
    sc = row.select(
        "channel",
        solve(None).alias("base_n"),
        solve(F.col("channel")).alias("removed_n"),
    ).withColumn(
        "re_nano",
        F.greatest(F.col("base_n") - F.col("removed_n"), zero),
    )
    tt = sc.agg(F.sum("re_nano").alias("re_tot"))
    return (
        sc.crossJoin(F.broadcast(tt))
        .select(
            "channel",
            F.round(F.col("base_n") / F.lit(1e9), 6).alias("base_conv"),
            F.round(F.col("removed_n") / F.lit(1e9), 6).alias(
                "removed_conv"
            ),
            F.col("re_nano").cast("long").alias("re_nano"),
            F.when(
                F.col("re_tot") > 0,
                F.round(
                    F.col("re_nano") / F.col("re_tot").cast("double"), 6
                ),
            ).alias("share"),
        )
        .orderBy("channel")
    )


_SHAP_FACT = [(0, 1), (1, 1), (2, 2), (3, 6), (4, 24), (5, 120),
              (6, 720), (7, 5040), (8, 40320)]

_SHAP_SQL = f"""
    WITH e AS (SELECT user_id, event_type, ts, event_id,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events),
    fp AS (SELECT user_id, min(rn) AS prn FROM e
           WHERE event_type = 'purchase' GROUP BY 1),
    j AS (SELECT e.user_id, e.event_type, e.rn
          FROM e LEFT JOIN fp USING (user_id)
          WHERE fp.prn IS NULL OR e.rn <= fp.prn),
    users AS (SELECT user_id,
                     max(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS conv
              FROM j GROUP BY 1),
    touched AS (SELECT DISTINCT user_id, event_type
                FROM j WHERE event_type != 'purchase'),
    tb AS (SELECT event_type,
                  CAST(row_number() OVER (ORDER BY event_type) - 1 AS INT)
                      AS b
           FROM (SELECT DISTINCT event_type FROM touched)),
    kk AS (SELECT count(*) AS k FROM tb),
    um AS (SELECT t.user_id, bit_or(1 << tb.b) AS mask
           FROM touched t JOIN tb USING (event_type) GROUP BY 1),
    mk AS (SELECT coalesce(um.mask, 0) AS mask, u.conv
           FROM users u LEFT JOIN um USING (user_id)),
    magg AS MATERIALIZED (SELECT mask, count(*) AS n, sum(conv) AS nc
                          FROM mk GROUP BY 1),
    subs AS (SELECT unnest(range(0, (SELECT 1 << k FROM kk))) AS s),
    v AS MATERIALIZED (
      SELECT s.s,
             CASE WHEN coalesce(sum(m.n), 0) > 0
                  THEN CAST(round(1e9 * sum(m.nc) / sum(m.n)) AS BIGINT)
                  ELSE 0 END AS v
      FROM subs s LEFT JOIN magg m ON (m.mask & s.s) = m.mask
      GROUP BY s.s),
    fct AS (SELECT * FROM (VALUES
            {", ".join(f"({n}, {f})" for n, f in _SHAP_FACT)}) AS t(n, v)),
    con AS (SELECT c.event_type AS channel,
                   CAST(sum(f1.v * f2.v * (vc.v - vs.v)) AS BIGINT) AS num
            FROM tb c
            JOIN v vs ON (vs.s & (1 << c.b)) = 0
            JOIN v vc ON vc.s = (vs.s | (1 << c.b))
            JOIN fct f1 ON f1.n = bit_count(vs.s)
            JOIN fct f2 ON f2.n = (SELECT k FROM kk) - 1 - bit_count(vs.s)
            GROUP BY 1),
    tot AS (SELECT sum(num) AS t FROM con),
    fk AS (SELECT v AS fkv FROM fct WHERE n = (SELECT k FROM kk))
    SELECT channel,
           CAST(num AS BIGINT) AS num_nano,
           round(num / fkv / 1e9, 6) AS shapley,
           CASE WHEN tot.t != 0
                THEN round(num / CAST(tot.t AS DOUBLE), 6)
           END AS share
    FROM con CROSS JOIN fk CROSS JOIN tot ORDER BY channel
"""


@register("q_shapley_attribution", sql=_SHAP_SQL)
def q_shapley_attribution(spark, sf_dir):
    """Shapley-value channel attribution (the game-theoretic twin of
    q_markov_attribution — together the two canonical data-driven
    attribution models): the coalition value v(S) is the conversion
    rate of journeys whose touched-channel set is CONTAINED in S, and
    each channel's credit is its exact Shapley value
    sum_S |S|! (k-1-|S|)! / k! * (v(S+c) - v(S)).

    Exactness: v(S) is nano-int-rounded from exact conversion/user
    counts; Shapley numerators are pure BIGINT sums of
    fact*fact*(delta-v) terms (|num| <= 8! * 1e9 * 2^k — inside long
    for the k <= 8 contract this query documents); the two divisions
    (k!, 1e9) happen once at the end.  The efficiency law
    sum shapley = v(full) - v(empty) is pinned in tests.

    Scale shape: journeys/touch-sets are per-user keyed aggregates
    (the only data-sized stages); everything after runs on <= 2^k
    coalition masks folded in-plan (broadcast one-row tables) — no
    driver-side solve, no per-coalition scan of the data (the naive
    formulation rescans per coalition; the mask aggregate + subset
    zeta-sum gets all 2^k values from ONE pass)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select("user_id", "event_type", "ts", "event_id").withColumn(
        "rn", F.row_number().over(w)
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    j = e.join(fp, "user_id", "left").filter(
        F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
    )
    users = j.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    touched = (
        j.filter(F.col("event_type") != "purchase")
        .select("user_id", "event_type")
        .distinct()
    )
    # channel bit-index over the types-sized distinct table via the
    # broadcast triangle join — window-free (VERDICT r7 #5)
    from shadems_spark.operators.profile import triangle_rank

    tb = (
        triangle_rank(
            touched.select("event_type").distinct(), ["event_type"], out="__trk"
        )
        .withColumn("b", (F.col("__trk") - 1).cast("int"))
        .drop("__trk")
    )
    um = (
        touched.join(F.broadcast(tb), "event_type")
        .groupBy("user_id")
        .agg(F.bit_or(F.expr("shiftleft(1, b)")).alias("mask"))
    )
    mk = users.join(um, "user_id", "left").select(
        F.coalesce("mask", F.lit(0)).alias("mask"), "conv"
    )
    magg = mk.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("nc")
    )
    chs = tb.agg(
        F.sort_array(F.collect_list(F.struct("event_type", "b"))).alias(
            "chs"
        )
    )
    one = magg.agg(
        F.sort_array(F.collect_list(F.struct("mask", "n", "nc"))).alias("ms")
    ).crossJoin(F.broadcast(chs))

    zero = F.lit(0).cast("long")

    def fact(c):
        e_ = F.when(c == 0, F.lit(1).cast("long"))
        for n, f in _SHAP_FACT[1:]:
            e_ = e_.when(c == n, F.lit(f).cast("long"))
        return e_

    k = F.size("chs")
    subsets = F.expr("sequence(0, shiftleft(1, size(chs)) - 1)")
    v_map = F.map_from_entries(
        F.transform(
            subsets,
            lambda s: F.struct(
                s.alias("k"),
                F.aggregate(
                    F.filter(
                        F.col("ms"),
                        lambda m: m["mask"].bitwiseAND(s) == m["mask"],
                    ),
                    F.struct(zero.alias("n"), zero.alias("nc")),
                    lambda a, m: F.struct(
                        (a["n"] + m["n"]).alias("n"),
                        (a["nc"] + m["nc"]).alias("nc"),
                    ),
                    lambda a: F.when(
                        a["n"] > 0,
                        F.round(F.lit(1e9) * a["nc"] / a["n"]).cast("long"),
                    ).otherwise(zero),
                ).alias("v"),
            ),
        )
    )
    row = one.select(
        F.explode("chs").alias("ch"), "ms", "chs", v_map.alias("vm")
    )
    bit = F.expr("shiftleft(1, ch.b)")
    num = F.aggregate(
        F.filter(
            F.expr("sequence(0, shiftleft(1, size(chs)) - 1)"),
            lambda s: s.bitwiseAND(bit) == 0,
        ),
        zero,
        lambda a, s: a
        + fact(F.bit_count(s))
        * fact(k - 1 - F.bit_count(s))
        * (
            F.element_at(F.col("vm"), s.bitwiseOR(bit))
            - F.element_at(F.col("vm"), s)
        ),
    )
    sc = row.select(
        F.col("ch")["event_type"].alias("channel"),
        num.cast("long").alias("num_nano"),
        F.round(num / fact(k) / F.lit(1e9), 6).alias("shapley"),
    )
    tot = sc.agg(F.sum("num_nano").alias("t"))
    return (
        sc.crossJoin(F.broadcast(tot))
        .select(
            "channel", "num_nano", "shapley",
            F.when(
                F.col("t") != 0,
                F.round(F.col("num_nano") / F.col("t").cast("double"), 6),
            ).alias("share"),
        )
        .orderBy("channel")
    )


@register(
    "q_chisq",
    sql="""
    WITH c AS (SELECT event_type,
                      (datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       + 4) % 7 AS dow,
                      count(*) AS obs
               FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, dow, obs,
                 sum(obs) OVER (PARTITION BY event_type) AS rt,
                 sum(obs) OVER (PARTITION BY dow) AS ct
          FROM c),
    t AS (SELECT sum(obs) AS n,
                 (count(DISTINCT event_type) - 1)
                 * (count(DISTINCT dow) - 1) AS dof
          FROM c),
    x AS (SELECT event_type, dow, obs, rt, ct, n, dof,
                 rt * CAST(ct AS DOUBLE) / n AS e
          FROM w CROSS JOIN t),
    y AS (SELECT *,
                 CAST(round((obs - e) * (obs - e) / e * 1e9) AS BIGINT)
                     AS contrib_n
          FROM x),
    z AS (SELECT sum(contrib_n) AS chi2_n FROM y)
    SELECT event_type, CAST(dow AS BIGINT) AS dow,
           CAST(obs AS BIGINT) AS obs,
           round(e, 6) AS expected,
           round(contrib_n / 1e9, 6) AS contrib,
           round(chi2_n / 1e9, 6) AS chi2,
           CAST(dof AS BIGINT) AS dof
    FROM y CROSS JOIN z
    ORDER BY event_type, dow
    """,
)
def q_chisq(spark, sf_dir):
    """Chi-square test of independence over the event_type x
    day-of-week contingency table — the categorical drift screen
    beside the value-distribution family (q_ks_test/q_mannwhitney
    compare numeric samples; chi-square asks whether traffic MIX
    depends on weekday).  Emits the full cell table (observed,
    expected, per-cell contribution) plus the omnibus statistic and
    degrees of freedom on every row.

    Exactness: observed counts are integers; day-of-week derives
    arithmetically from epoch days ((d + 4) % 7 — no engine dow()
    convention involved); each cell's (o-e)^2/e is nano-int-rounded
    BEFORE the cross-cell sum, so chi2 is an order-free integer sum.
    Scale: one map-side-combined aggregate to |types| x 7 cells, then
    windows and reductions over that bounded cell table — never
    row-sized; the 1-row totals frame joins back via broadcast."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.select(
            "event_type",
            F.pmod(
                F.datediff(
                    F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
                )
                + 4,
                F.lit(7),
            ).alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    w = c.select(
        "event_type", "dow", "obs",
        F.sum("obs").over(W.partitionBy("event_type")).alias("rt"),
        F.sum("obs").over(W.partitionBy("dow")).alias("ct"),
    )
    t = c.agg(
        F.sum("obs").alias("n"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("dow") - 1)
        ).alias("dof"),
    )
    x = w.crossJoin(F.broadcast(t)).withColumn(
        "e", F.col("rt") * F.col("ct").cast("double") / F.col("n")
    )
    y = x.withColumn(
        "contrib_n",
        F.round(
            (F.col("obs") - F.col("e")) * (F.col("obs") - F.col("e"))
            / F.col("e") * F.lit(1e9)
        ).cast("long"),
    )
    z = y.agg(F.sum("contrib_n").alias("chi2_n"))
    return (
        y.crossJoin(F.broadcast(z))
        .select(
            "event_type",
            F.col("dow").cast("long").alias("dow"),
            F.col("obs").cast("long").alias("obs"),
            F.round("e", 6).alias("expected"),
            F.round(F.col("contrib_n") / 1e9, 6).alias("contrib"),
            F.round(F.col("chi2_n") / 1e9, 6).alias("chi2"),
            F.col("dof").cast("long").alias("dof"),
        )
        .orderBy("event_type", "dow")
    )


@register(
    "q_spearman",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      count(*) AS x,
                      sum(CAST(round(coalesce(value, 0) * 1000)
                          AS BIGINT)) AS y
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, x, y,
                 2 * rank() OVER (PARTITION BY event_type ORDER BY x)
                 + count(*) OVER (PARTITION BY event_type, x) - 1 AS rx2,
                 2 * rank() OVER (PARTITION BY event_type ORDER BY y)
                 + count(*) OVER (PARTITION BY event_type, y) - 1 AS ry2
          FROM d),
    s AS (SELECT event_type, count(*) AS n,
                 sum(rx2) AS sx, sum(ry2) AS sy,
                 sum(rx2 * rx2) AS sxx, sum(ry2 * ry2) AS syy,
                 sum(rx2 * ry2) AS sxy,
                 sum(x) AS vx, sum(y) AS vy,
                 sum(x * x) AS vxx, sum(y * y) AS vyy,
                 sum(x * y) AS vxy
          FROM r GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                        * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),
                 6) AS rho_spearman,
           round((n * CAST(vxy AS DOUBLE) - CAST(vx AS DOUBLE) * vy)
                 / sqrt((n * CAST(vxx AS DOUBLE) - CAST(vx AS DOUBLE) * vx)
                        * (n * CAST(vyy AS DOUBLE) - CAST(vy AS DOUBLE) * vy)),
                 6) AS r_pearson
    FROM s ORDER BY event_type
    """,
)
def q_spearman(spark, sf_dir):
    """Spearman rank correlation (with its Pearson companion) between
    daily event count and daily value volume, per event type — the
    monotone-association screen of the drift family: Pearson answers
    "linear?", Spearman answers "monotone?" and is outlier-robust.
    Tied ranks use the textbook average-rank correction.

    Exactness: average ranks are carried as exact integer HALF-ranks
    (2*rank + ties - 1 — rank() min-rank plus the tie-count shift, no
    fractional rank ever materializes); Pearson inputs are integer
    daily counts and milli-int value sums; every cross-row sum is an
    integer sum, and each coefficient is one fixed float formula per
    group.  (At >=1e9-scale daily value volume, move the y*y sums to
    DECIMAL(38) — documented bound, the q_anova discipline.)
    Scale: a (type, day) map-side aggregate bounds the series by the
    calendar, rank windows partition per type over that bounded
    series, and the final reduce is 5 rows."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(
            F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 1000).cast("long")
        ).alias("y"),
    )
    rx2 = (
        2 * F.rank().over(W.partitionBy("event_type").orderBy("x"))
        + F.count(F.lit(1)).over(W.partitionBy("event_type", "x")) - 1
    )
    ry2 = (
        2 * F.rank().over(W.partitionBy("event_type").orderBy("y"))
        + F.count(F.lit(1)).over(W.partitionBy("event_type", "y")) - 1
    )
    r = d.select("event_type", "x", "y", rx2.alias("rx2"), ry2.alias("ry2"))
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").alias("sx"), F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
        F.sum("x").alias("vx"), F.sum("y").alias("vy"),
        F.sum(F.col("x") * F.col("x")).alias("vxx"),
        F.sum(F.col("y") * F.col("y")).alias("vyy"),
        F.sum(F.col("x") * F.col("y")).alias("vxy"),
    )

    def pearson(n, sx, sy, sxx, syy, sxy):
        num = n * sxy.cast("double") - sx.cast("double") * sy
        den = F.sqrt(
            (n * sxx.cast("double") - sx.cast("double") * sx)
            * (n * syy.cast("double") - sy.cast("double") * sy)
        )
        return F.round(num / den, 6)

    c = F.col
    return s.select(
        "event_type",
        c("n").cast("long").alias("n_days"),
        pearson(c("n"), c("sx"), c("sy"), c("sxx"), c("syy"), c("sxy"))
        .alias("rho_spearman"),
        pearson(c("n"), c("vx"), c("vy"), c("vxx"), c("vyy"), c("vxy"))
        .alias("r_pearson"),
    ).orderBy("event_type")


_RIDGE_LAM = "1000.0"
_RIDGE_SQL = f"""
    WITH s AS (SELECT CAST(l_quantity AS BIGINT) AS x1,
                      CAST(round(l_discount * 100) AS BIGINT) AS x2,
                      CAST(round(l_extendedprice * 10) AS BIGINT) AS y
               FROM lineitem),
    g AS (SELECT count(*) AS n,
                 sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
                 sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
                 sum(x2 * x2) AS s22,
                 sum(x1 * y) AS s1y, sum(x2 * y) AS s2y,
                 sum(y * y) AS syy
          FROM s),
    a AS (SELECT CAST(n AS DOUBLE) AS a11, CAST(s1 AS DOUBLE) AS a12,
                 CAST(s2 AS DOUBLE) AS a13,
                 CAST(s11 AS DOUBLE) + {_RIDGE_LAM} AS a22,
                 CAST(s12 AS DOUBLE) AS a23,
                 CAST(s22 AS DOUBLE) + {_RIDGE_LAM} AS a33,
                 CAST(sy AS DOUBLE) AS b1, CAST(s1y AS DOUBLE) AS b2,
                 CAST(s2y AS DOUBLE) AS b3,
                 n, s1, s2, s11, s12, s22, s1y, s2y, sy, syy
          FROM g),
    d AS (SELECT *,
                 a11 * (a22 * a33 - a23 * a23)
                 - a12 * (a12 * a33 - a23 * a13)
                 + a13 * (a12 * a23 - a22 * a13) AS det
          FROM a),
    b AS (SELECT *,
                 (b1 * (a22 * a33 - a23 * a23)
                  - a12 * (b2 * a33 - a23 * b3)
                  + a13 * (b2 * a23 - a22 * b3)) / det AS b0,
                 (a11 * (b2 * a33 - a23 * b3)
                  - b1 * (a12 * a33 - a23 * a13)
                  + a13 * (a12 * b3 - b2 * a13)) / det AS bb1,
                 (a11 * (a22 * b3 - b2 * a23)
                  - a12 * (a12 * b3 - b2 * a13)
                  + b1 * (a12 * a23 - a22 * a13)) / det AS bb2
          FROM d)
    SELECT CAST(n AS BIGINT) AS n,
           round(b0, 6) AS beta0, round(bb1, 6) AS beta1,
           round(bb2, 6) AS beta2,
           round((CAST(syy AS DOUBLE)
                  - 2 * (b0 * sy + bb1 * s1y + bb2 * s2y)
                  + (b0 * b0 * n + bb1 * bb1 * s11 + bb2 * bb2 * s22
                     + 2 * b0 * bb1 * s1 + 2 * b0 * bb2 * s2
                     + 2 * bb1 * bb2 * s12)) / n, 4) AS mse,
           round(1.0 - (CAST(syy AS DOUBLE)
                        - 2 * (b0 * sy + bb1 * s1y + bb2 * s2y)
                        + (b0 * b0 * n + bb1 * bb1 * s11
                           + bb2 * bb2 * s22
                           + 2 * b0 * bb1 * s1 + 2 * b0 * bb2 * s2
                           + 2 * bb1 * bb2 * s12))
                      / (CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * sy / n), 6) AS r2
    FROM b
"""


@register("q_ridge", sql=_RIDGE_SQL)
def q_ridge(spark, sf_dir):
    """Closed-form ridge regression (2 features + intercept) of
    deci-dollar extended price on quantity and centi-discount — the
    normal-equations companion to the iterative q_lr_train: X'X and
    X'y are ONE aggregate pass of integer sufficient statistics, the
    3x3 system (ridge lambda=1000 on the feature diagonal, intercept
    unpenalized) is solved by Cramer's rule in a fixed scalar formula,
    and train MSE / R^2 come from the SAME statistics (no second
    scoring scan: sse = y'y - 2 b'X'y + b'X'Xb).

    Exactness: units are chosen so every sufficient statistic is an
    exact int64 (deci-dollar y keeps sum(y^2) < 2^63 through sf10;
    beyond that the squared sums move to DECIMAL(38) — the q_anova
    bound); both engines then evaluate the identical operation
    sequence over identical integers.  Scale: one map-side-combined
    full scan producing a single 10-number row; everything after is
    constant work.  Beats gradient descent at any scale when the
    design matrix is this small."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 10).cast("long").alias("y"),
    )
    c = F.col
    g = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"), F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(c("x1") * c("x1")).alias("s11"),
        F.sum(c("x1") * c("x2")).alias("s12"),
        F.sum(c("x2") * c("x2")).alias("s22"),
        F.sum(c("x1") * c("y")).alias("s1y"),
        F.sum(c("x2") * c("y")).alias("s2y"),
        F.sum(c("y") * c("y")).alias("syy"),
    )
    lam = float(_RIDGE_LAM)
    a = g.select(
        "*",
        c("n").cast("double").alias("a11"),
        c("s1").cast("double").alias("a12"),
        c("s2").cast("double").alias("a13"),
        (c("s11").cast("double") + lam).alias("a22"),
        c("s12").cast("double").alias("a23"),
        (c("s22").cast("double") + lam).alias("a33"),
        c("sy").cast("double").alias("b1"),
        c("s1y").cast("double").alias("b2"),
        c("s2y").cast("double").alias("b3"),
    )
    det = (
        c("a11") * (c("a22") * c("a33") - c("a23") * c("a23"))
        - c("a12") * (c("a12") * c("a33") - c("a23") * c("a13"))
        + c("a13") * (c("a12") * c("a23") - c("a22") * c("a13"))
    )
    d = a.withColumn("det", det)
    b0 = (
        c("b1") * (c("a22") * c("a33") - c("a23") * c("a23"))
        - c("a12") * (c("b2") * c("a33") - c("a23") * c("b3"))
        + c("a13") * (c("b2") * c("a23") - c("a22") * c("b3"))
    ) / c("det")
    bb1 = (
        c("a11") * (c("b2") * c("a33") - c("a23") * c("b3"))
        - c("b1") * (c("a12") * c("a33") - c("a23") * c("a13"))
        + c("a13") * (c("a12") * c("b3") - c("b2") * c("a13"))
    ) / c("det")
    bb2 = (
        c("a11") * (c("a22") * c("b3") - c("b2") * c("a23"))
        - c("a12") * (c("a12") * c("b3") - c("b2") * c("a13"))
        + c("b1") * (c("a12") * c("a23") - c("a22") * c("a13"))
    ) / c("det")
    b = d.withColumn("b0", b0).withColumn("bb1", bb1).withColumn("bb2", bb2)
    sse = (
        c("syy").cast("double")
        - 2 * (c("b0") * c("sy") + c("bb1") * c("s1y") + c("bb2") * c("s2y"))
        + (
            c("b0") * c("b0") * c("n")
            + c("bb1") * c("bb1") * c("s11")
            + c("bb2") * c("bb2") * c("s22")
            + 2 * c("b0") * c("bb1") * c("s1")
            + 2 * c("b0") * c("bb2") * c("s2")
            + 2 * c("bb1") * c("bb2") * c("s12")
        )
    )
    sst = c("syy").cast("double") - c("sy").cast("double") * c("sy") / c("n")
    return b.select(
        c("n").cast("long").alias("n"),
        F.round("b0", 6).alias("beta0"),
        F.round("bb1", 6).alias("beta1"),
        F.round("bb2", 6).alias("beta2"),
        F.round(sse / c("n"), 4).alias("mse"),
        F.round(F.lit(1.0) - sse / sst, 6).alias("r2"),
    )


@register(
    "q_interval_coverage",
    sql="""
    WITH iv AS (SELECT user_id, event_type, event_id,
                       epoch_us(ts) AS s_us,
                       epoch_us(ts)
                       + CAST(round(abs(value) * 1e6) AS BIGINT) AS e_us
                FROM events WHERE value IS NOT NULL),
    m AS (SELECT *,
                 max(e_us) OVER (PARTITION BY user_id, event_type
                                 ORDER BY s_us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS prev_end
          FROM iv),
    f AS (SELECT *,
                 CASE WHEN prev_end IS NULL OR prev_end < s_us
                      THEN 1 ELSE 0 END AS new_island
          FROM m),
    i AS (SELECT *,
                 sum(new_island) OVER (PARTITION BY user_id, event_type
                                       ORDER BY s_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS island
          FROM f),
    g AS (SELECT user_id, event_type, island,
                 count(*) AS n_iv,
                 max(e_us) - min(s_us) AS cov_us
          FROM i GROUP BY 1, 2, 3)
    SELECT event_type,
           CAST(sum(n_iv) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(cov_us) AS BIGINT) AS covered_us,
           CAST(max(cov_us) AS BIGINT) AS max_island_us
    FROM g GROUP BY 1 ORDER BY event_type
    """,
)
def q_interval_coverage(spark, sf_dir):
    """Interval-union coverage (sweep-line gaps-and-islands): each
    event opens an interval of |value| seconds; per (user, type) the
    overlapping intervals merge into islands and the query reports
    union-covered time per event type — the classic "total engaged
    time" / sensor-uptime operator that a naive sum(duration) double-
    counts.  The running max(end) over preceding rows detects overlap
    chains; an island's union length is exactly max(end)-min(start)
    by construction (every member starts before the running max).

    Exactness: all arithmetic in integer epoch-microseconds.  Scale:
    the sweep windows partition by (user, type) — per-key sequence
    lengths, never global; the island reduce is a map-side-combinable
    aggregate and the output is |types| rows."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    iv = ev.select(
        "user_id", "event_type", "event_id",
        F.expr("ts_ns div 1000").alias("s_us"),
        (
            F.expr("ts_ns div 1000")
            + F.round(F.abs(F.col("value")) * 1e6).cast("long")
        ).alias("e_us"),
    )
    w = W.partitionBy("user_id", "event_type").orderBy("s_us", "event_id")
    m = iv.withColumn(
        "prev_end",
        F.max("e_us").over(w.rowsBetween(W.unboundedPreceding, -1)),
    )
    f = m.withColumn(
        "new_island",
        F.when(
            F.col("prev_end").isNull() | (F.col("prev_end") < F.col("s_us")), 1
        ).otherwise(0),
    )
    i = f.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    g = i.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("n_iv"),
        (F.max("e_us") - F.min("s_us")).alias("cov_us"),
    )
    return (
        g.groupBy("event_type")
        .agg(
            F.sum("n_iv").cast("long").alias("n_intervals"),
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.sum("cov_us").cast("long").alias("covered_us"),
            F.max("cov_us").cast("long").alias("max_island_us"),
        )
        .orderBy("event_type")
    )


@register(
    "q_path_analysis",
    sql="""
    WITH e AS (SELECT user_id, event_id, event_type,
                      epoch_us(ts) AS ts_us
               FROM events),
    g AS (SELECT *,
                 CASE WHEN ts_us - lag(ts_us) OVER
                          (PARTITION BY user_id ORDER BY ts_us, event_id)
                      > 1800000000 OR lag(ts_us) OVER
                          (PARTITION BY user_id ORDER BY ts_us, event_id)
                      IS NULL THEN 1 ELSE 0 END AS new_sess
          FROM e),
    s AS (SELECT *,
                 sum(new_sess) OVER (PARTITION BY user_id
                                     ORDER BY ts_us, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess
          FROM g),
    t AS (SELECT event_type AS t1,
                 lead(event_type, 1) OVER w AS t2,
                 lead(event_type, 2) OVER w AS t3
          FROM s
          WINDOW w AS (PARTITION BY user_id, sess
                       ORDER BY ts_us, event_id)),
    p AS (SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS cnt
          FROM t WHERE t3 IS NOT NULL GROUP BY 1)
    SELECT path, CAST(cnt AS BIGINT) AS cnt
    FROM p ORDER BY cnt DESC, path LIMIT 20
    """,
)
def q_path_analysis(spark, sf_dir):
    """Top-20 within-session event-type trigrams (user-path mining):
    sessionize with the 30-minute gap rule (q_sessionize's gaps-and-
    islands), slide a 3-step window down each session with lead(),
    and count path frequencies — the "what do users do next"
    exploration behind funnel design, feeding q_markov with its
    higher-order context check.

    Exactness: counts are integers; the global top-20 breaks ties on
    the path string.  Scale: all windows partition by user (then by
    session) — bounded per-key sequences; path counts map-side
    combine to a |types|^3-bounded key space and the final top-20
    compiles to TakeOrderedAndProject, never a global sort of the
    counts table."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    wu = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(wu)
    s = ev.withColumn(
        "sess",
        F.sum(
            F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
        ).over(wu.rowsBetween(W.unboundedPreceding, 0)),
    )
    ws = W.partitionBy("user_id", "sess").orderBy("ts_us", "event_id")
    t = s.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(ws).alias("t2"),
        F.lead("event_type", 2).over(ws).alias("t3"),
    )
    p = (
        t.filter(F.col("t3").isNotNull())
        .select(F.concat_ws(">", "t1", "t2", "t3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return p.orderBy(F.desc("cnt"), "path").limit(20)


@register(
    "q_changepoint",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      count(*) AS y
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, day, y,
                 CAST(row_number() OVER w AS BIGINT) AS t,
                 sum(y) OVER (w ROWS UNBOUNDED PRECEDING) AS cy,
                 sum(y * y) OVER (w ROWS UNBOUNDED PRECEDING) AS cyy,
                 sum(y) OVER (PARTITION BY event_type) AS sy,
                 sum(y * y) OVER (PARTITION BY event_type) AS syy,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    c AS (SELECT *,
                 CAST(round((CAST(cyy AS DOUBLE)
                             - CAST(cy AS DOUBLE) * cy / t
                             + CAST(syy - cyy AS DOUBLE)
                             - CAST(sy - cy AS DOUBLE) * (sy - cy) / (n - t))
                            * 1e9) AS BIGINT) AS cost_n
          FROM r WHERE t < n),
    b AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY cost_n, t) AS rk
          FROM c)
    SELECT event_type, CAST(n AS BIGINT) AS n_days, t AS split_t,
           day AS split_day,
           round(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n, 4)
               AS sse_total,
           round(cost_n / 1e9, 4) AS sse_split,
           round((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
                 - cost_n / 1e9, 4) AS gain,
           round(CAST(cy AS DOUBLE) / t, 4) AS mean_left,
           round(CAST(sy - cy AS DOUBLE) / (n - t), 4) AS mean_right
    FROM b WHERE rk = 1 ORDER BY event_type
    """,
)
def q_changepoint(spark, sf_dir):
    """Single-changepoint detection (binary segmentation, the first
    split of PELT/CUSUM-style segmenters) on the daily count series
    per event type: choose the split minimizing SSE_left + SSE_right,
    report the day, the variance explained (gain) and the two segment
    means — the level-shift detector beside q_cusum's sequential
    drift alarm.

    Exactness: every candidate cost is a fixed float formula over
    exact integer prefix sums (cumsum of y and y^2 down the per-type
    day series), nano-int-rounded so the argmin compares integers
    with a deterministic tie-break on earlier t.  Scale: the day
    series is calendar-bounded per type, so the cumsum windows and
    the O(n) candidate sweep stay constant-size regardless of row
    count; the only data-sized work is the (type, day) map-side
    aggregate."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    wo = W.partitionBy("event_type").orderBy("day")
    wc = wo.rowsBetween(W.unboundedPreceding, 0)
    wp = W.partitionBy("event_type")
    r = d.select(
        "event_type", "day", "y",
        F.row_number().over(wo).cast("long").alias("t"),
        F.sum("y").over(wc).alias("cy"),
        F.sum(F.col("y") * F.col("y")).over(wc).alias("cyy"),
        F.sum("y").over(wp).alias("sy"),
        F.sum(F.col("y") * F.col("y")).over(wp).alias("syy"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    c = F.col
    cost = (
        c("cyy").cast("double") - c("cy").cast("double") * c("cy") / c("t")
        + (c("syy") - c("cyy")).cast("double")
        - (c("sy") - c("cy")).cast("double") * (c("sy") - c("cy"))
        / (c("n") - c("t"))
    )
    cc = r.filter(c("t") < c("n")).withColumn(
        "cost_n", F.round(cost * F.lit(1e9)).cast("long")
    )
    b = cc.withColumn(
        "rk", F.row_number().over(W.partitionBy("event_type").orderBy("cost_n", "t"))
    )
    sst = c("syy").cast("double") - c("sy").cast("double") * c("sy") / c("n")
    return (
        b.filter(c("rk") == 1)
        .select(
            "event_type",
            c("n").cast("long").alias("n_days"),
            c("t").alias("split_t"),
            c("day").alias("split_day"),
            F.round(sst, 4).alias("sse_total"),
            F.round(c("cost_n") / 1e9, 4).alias("sse_split"),
            F.round(sst - c("cost_n") / 1e9, 4).alias("gain"),
            F.round(c("cy").cast("double") / c("t"), 4).alias("mean_left"),
            F.round(
                (c("sy") - c("cy")).cast("double") / (c("n") - c("t")), 4
            ).alias("mean_right"),
        )
        .orderBy("event_type")
    )


def _ams_coeffs(n_est: int = 16) -> list[tuple[int, int, int, int]]:
    """4-wise-independent sign-hash coefficients (cubic over GF(p)),
    SplitMix64-derived so the Spark expressions and the generated
    DuckDB SQL embed the SAME literals (the xe protocol)."""
    from shadems_spark.operators.similarity import _splitmix64
    from shadems_spark.operators.text import FP_MOD

    out = []
    for r in range(n_est):
        a = _splitmix64(9100 + 4 * r) % (FP_MOD - 1) + 1
        b = _splitmix64(9101 + 4 * r) % FP_MOD
        c = _splitmix64(9102 + 4 * r) % FP_MOD
        d = _splitmix64(9103 + 4 * r) % FP_MOD
        out.append((a, b, c, d))
    return out


def _ams_sql() -> str:
    from shadems_spark.operators.text import FP_MOD

    p = FP_MOD
    sign_terms = []
    for r, (a, b, c, d) in enumerate(_ams_coeffs()):
        h = f"CAST({a} AS BIGINT)"
        for coef in (b, c, d):
            h = f"(({h}) * u + {coef}) % {p}"
        sign_terms.append(
            f"sum((1 - 2 * (({h}) % 2)) * cnt) AS y{r}"
        )
    ys = ",\n                 ".join(sign_terms)
    est_list = ", ".join(
        f"(y{4 * g} * y{4 * g} + y{4 * g + 1} * y{4 * g + 1}"
        f" + y{4 * g + 2} * y{4 * g + 2} + y{4 * g + 3} * y{4 * g + 3})"
        for g in range(4)
    )
    return f"""
    WITH g AS (SELECT user_id % {p} AS u, count(*) AS cnt
               FROM events GROUP BY 1),
    s AS (SELECT count(*) AS n_users,
                 sum(cnt * cnt) AS f2,
                 {ys}
          FROM g),
    m AS (SELECT *, list_sort([{est_list}]) AS sums FROM s)
    SELECT CAST(n_users AS BIGINT) AS n_users,
           CAST(f2 AS BIGINT) AS exact_f2,
           round((sums[2] + sums[3]) / 8.0, 1) AS ams_f2,
           round(abs((sums[2] + sums[3]) / 8.0 - f2) / f2, 6) AS rel_err
    FROM m
    """


@register("q_ams_f2", sql=_ams_sql())
def q_ams_f2(spark, sf_dir):
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy '96)
    of the per-user event counts, beside the exact F2 = sum(cnt^2) it
    estimates: 16 independent {-1,+1} sign hashes (4-wise via a cubic
    over GF(1e9+7)) fold the whole stream into 16 integers Y_r;
    median-of-4-means of Y_r^2 is the estimate.  F2 drives join-size
    and self-join-cardinality planning at scale, where the sketch is
    one map-side-combined pass of 16 counters while the exact form
    needs the full per-key aggregate.

    Exactness: both engines fold the SAME SplitMix64-derived literals
    through the same Horner chain (products < p * p fit int64), Y_r
    and the exact F2 are integer sums, and the median-of-means is an
    integer half-sum — the whole output is determined before the two
    final divisions.  Scale: the sketch path is a constant-width
    aggregate (16 ints); the per-user pre-aggregate here only serves
    the exact-F2 comparison column."""
    from shadems_spark.operators.text import FP_MOD

    p = FP_MOD
    g = (
        load_table(spark, sf_dir, "events")
        .select((F.col("user_id") % p).alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    aggs = [
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("f2"),
    ]
    for r, (a, b, c, d) in enumerate(_ams_coeffs()):
        h = F.lit(a)
        for coef in (b, c, d):
            h = (h * F.col("u") + F.lit(coef)) % F.lit(p)
        aggs.append(F.sum((1 - 2 * (h % 2)) * F.col("cnt")).alias(f"y{r}"))
    s = g.agg(*aggs)
    est = [
        sum(F.col(f"y{4 * gi + j}") * F.col(f"y{4 * gi + j}") for j in range(4))
        for gi in range(4)
    ]
    m = s.withColumn("sums", F.sort_array(F.array(*est)))
    med2 = F.element_at("sums", 2) + F.element_at("sums", 3)
    return m.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("f2").cast("long").alias("exact_f2"),
        F.round(med2 / 8.0, 1).alias("ams_f2"),
        F.round(F.abs(med2 / 8.0 - F.col("f2")) / F.col("f2"), 6).alias(
            "rel_err"
        ),
    )


_CM_VARS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
#: per-variable integer units — correlation is scale-invariant, so each
#: variable picks the coarsest unit that keeps its SQUARED sum inside
#: int64 headroom: quantity is integral (x1), price in deci-dollars
#: (~1.1e6 -> squared sums < 2^63 through ~sf1; DECIMAL(38) beyond),
#: discount/tax in exact centi-units.
_CM_SCALE = [1, 10, 100, 100]


def _corr_matrix_sql() -> str:
    cols = ", ".join(
        f"CAST(round({v} * {s}) AS BIGINT) AS v{i}"
        for i, (v, s) in enumerate(zip(_CM_VARS, _CM_SCALE))
    )
    stats = []
    for i in range(len(_CM_VARS)):
        stats.append(f"sum(v{i}) AS s{i}")
        for j in range(i, len(_CM_VARS)):
            stats.append(f"sum(v{i} * v{j}) AS s{i}_{j}")
    pairs = []
    for i, vi in enumerate(_CM_VARS):
        for j, vj in enumerate(_CM_VARS):
            a, b = min(i, j), max(i, j)
            pairs.append(
                f"""SELECT '{vi}' AS var_x, '{vj}' AS var_y,
                round((n * CAST(s{a}_{b} AS DOUBLE)
                       - CAST(s{a} AS DOUBLE) * s{b})
                      / sqrt((n * CAST(s{a}_{a} AS DOUBLE)
                              - CAST(s{a} AS DOUBLE) * s{a})
                             * (n * CAST(s{b}_{b} AS DOUBLE)
                                - CAST(s{b} AS DOUBLE) * s{b})), 6)
                    AS corr FROM g"""
            )
    u = "\n            UNION ALL ".join(pairs)
    return f"""
    WITH s AS (SELECT {cols} FROM lineitem),
    g AS (SELECT count(*) AS n, {", ".join(stats)} FROM s)
    SELECT * FROM ({u}) ORDER BY var_x, var_y
    """


@register("q_corr_matrix", sql=_corr_matrix_sql())
def q_corr_matrix(spark, sf_dir):
    """Full pairwise Pearson correlation matrix over the lineitem
    numeric measures in ONE scan — the profiling primitive behind
    feature selection and multicollinearity checks: k variables need
    k + k(k+1)/2 sufficient statistics, all gathered by a single
    map-side-combined aggregate, never k^2 passes or a driver loop.

    Exactness: each variable is rounded to its own integer unit
    (_CM_SCALE — correlation is scale-invariant, so every variable
    picks the coarsest unit whose SQUARED sum keeps int64 headroom;
    deci-dollar prices hold through ~sf1, DECIMAL(38) beyond — the
    q_anova bound), every cross sum is an exact integer, and each
    coefficient is the fixed (n*sxy - sx*sy)/sqrt(...) formula over
    them; the matrix unpivots from the single stats row, so symmetry
    and unit diagonal are structural.  Scale: one scan, one 1-row
    reduce, 16 output rows — adding a variable grows the aggregate
    width, not the pass count."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        *[
            F.round(F.col(v) * sc).cast("long").alias(f"v{i}")
            for i, (v, sc) in enumerate(zip(_CM_VARS, _CM_SCALE))
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(len(_CM_VARS)):
        aggs.append(F.sum(F.col(f"v{i}")).alias(f"s{i}"))
        for j in range(i, len(_CM_VARS)):
            aggs.append(
                F.sum(F.col(f"v{i}") * F.col(f"v{j}")).alias(f"s{i}_{j}")
            )
    g = s.agg(*aggs)
    c = F.col
    cells = []
    for i, vi in enumerate(_CM_VARS):
        for j, vj in enumerate(_CM_VARS):
            a, b = min(i, j), max(i, j)
            num = c("n") * c(f"s{a}_{b}").cast("double") - c(
                f"s{a}"
            ).cast("double") * c(f"s{b}")
            den = F.sqrt(
                (
                    c("n") * c(f"s{a}_{a}").cast("double")
                    - c(f"s{a}").cast("double") * c(f"s{a}")
                )
                * (
                    c("n") * c(f"s{b}_{b}").cast("double")
                    - c(f"s{b}").cast("double") * c(f"s{b}")
                )
            )
            cells.append(
                F.struct(
                    F.lit(vi).alias("var_x"),
                    F.lit(vj).alias("var_y"),
                    F.round(num / den, 6).alias("corr"),
                )
            )
    return (
        g.select(F.explode(F.array(*cells)).alias("c"))
        .select("c.var_x", "c.var_y", "c.corr")
        .orderBy("var_x", "var_y")
    )


@register(
    "q_apriori",
    sql="""
    WITH b AS (SELECT DISTINCT l_orderkey,
                      l_partkey % 50 AS item
               FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    ic AS (SELECT item, count(*) AS n_item FROM b GROUP BY 1),
    p AS (SELECT a.item AS item_a, c.item AS item_b, count(*) AS n_pair
          FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                           AND a.item < c.item
          GROUP BY 1, 2
          HAVING count(*) >= 5),
    r AS (SELECT p.item_a, p.item_b, p.n_pair,
                 ia.n_item AS n_a, ib.n_item AS n_b, n.n_orders,
                 round(p.n_pair / CAST(n.n_orders AS DOUBLE), 6) AS support,
                 round(p.n_pair / CAST(ia.n_item AS DOUBLE), 6)
                     AS confidence,
                 round(p.n_pair * CAST(n.n_orders AS DOUBLE)
                       / (ia.n_item * CAST(ib.n_item AS DOUBLE)), 6)
                     AS lift
          FROM p JOIN ic ia ON ia.item = p.item_a
                 JOIN ic ib ON ib.item = p.item_b
                 CROSS JOIN n)
    SELECT CAST(item_a AS BIGINT) AS item_a,
           CAST(item_b AS BIGINT) AS item_b,
           CAST(n_pair AS BIGINT) AS n_pair,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           support, confidence, lift
    FROM r ORDER BY lift DESC, item_a, item_b LIMIT 25
    """,
)
def q_apriori(spark, sf_dir):
    """Frequent-itemset pair mining (the Apriori/market-basket
    primitive): baskets are orders, items are part classes
    (l_partkey % 50 — the category proxy); emits the top-25 pairs by
    lift with support and confidence, min-support-pruned at 5
    baskets.  The shape generalizes to co-occurrence mining over any
    (container, token) relation — docs x shingles, users x domains.

    Exactness: supports are integer basket counts (collect_set per
    basket so multiplicity never inflates them); support/confidence/
    lift are fixed single-division formulas.  Scale: ONE basket-keyed
    shuffle collects each basket's item set; the (size choose 2)
    pairs expand MAP-SIDE via a nested HOF and partially aggregate to
    an |items|^2-bounded key space before their exchange (the
    self-join formulation shuffled every materialized pair — 30 MB /
    1.9M records at sf0.1 vs ~1 MB here, and the HOF form is also
    faster warm); min-support prunes before the broadcast metric
    joins (item vocabulary capped at 50 by the class mapping)."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE basket shuffle: collect each basket's item set, expand the
    # (size choose 2) pairs map-side with a nested HOF (bounded by
    # basket size), and let the pair count partially aggregate before
    # its |items|^2-bounded exchange — the self-join formulation
    # shuffled every materialized pair (measured 30 MB / 1.9M records
    # at sf0.1 vs ~1 MB here)
    baskets = (
        li.select("l_orderkey", (F.col("l_partkey") % 50).alias("item"))
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("item")).alias("items"))
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    ic = baskets.select(F.explode("items").alias("item")).groupBy(
        "item"
    ).agg(F.count(F.lit(1)).alias("n_item"))
    pairs = F.flatten(
        F.transform(
            F.col("items"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("items"), i + 2,
                    F.greatest(F.size("items") - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    p = (
        baskets.select(F.explode(pairs).alias("pr"))
        .groupBy(
            F.col("pr.item_a").alias("item_a"),
            F.col("pr.item_b").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 5)
    )
    r = (
        p.join(
            F.broadcast(
                ic.select(F.col("item").alias("item_a"),
                          F.col("n_item").alias("n_a"))
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                ic.select(F.col("item").alias("item_b"),
                          F.col("n_item").alias("n_b"))
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(n))
    )
    return (
        r.select(
            F.col("item_a").cast("long").alias("item_a"),
            F.col("item_b").cast("long").alias("item_b"),
            F.col("n_pair").cast("long").alias("n_pair"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(
                F.col("n_pair") / F.col("n_orders").cast("double"), 6
            ).alias("support"),
            F.round(
                F.col("n_pair") / F.col("n_a").cast("double"), 6
            ).alias("confidence"),
            F.round(
                F.col("n_pair") * F.col("n_orders").cast("double")
                / (F.col("n_a") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(25)
    )


@register(
    "q_moments",
    sql="""
    WITH s AS (SELECT event_type,
                      CAST(round(value) AS BIGINT) AS v
               FROM events WHERE value IS NOT NULL),
    g AS (SELECT event_type, count(*) AS n, sum(v) AS s1,
                 sum(v * v) AS s2, sum(v * v * v) AS s3,
                 sum(v * v * v * v) AS s4
          FROM s GROUP BY 1),
    m AS (SELECT event_type, n,
                 CAST(s1 AS DOUBLE) / n AS m1,
                 CAST(s2 AS DOUBLE) / n AS r2,
                 CAST(s3 AS DOUBLE) / n AS r3,
                 CAST(s4 AS DOUBLE) / n AS r4
          FROM g),
    c AS (SELECT event_type, n, m1,
                 r2 - m1 * m1 AS mu2,
                 r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1 AS mu3,
                 r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2
                    - 3 * m1 * m1 * m1 * m1 AS mu4
          FROM m)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(m1, 6) AS mean,
           round(sqrt(mu2), 6) AS std_pop,
           round(mu3 / (mu2 * sqrt(mu2)), 6) AS skewness,
           round(mu4 / (mu2 * mu2) - 3.0, 6) AS excess_kurtosis
    FROM c ORDER BY event_type
    """,
)
def q_moments(spark, sf_dir):
    """Higher-moment profile (skewness, excess kurtosis) of event
    value per type from ONE pass of raw power sums — the tail-shape
    screen the mean/variance profile misses: skew > 0 flags the
    long-right-tail metrics that need log transforms, kurtosis >> 0
    flags outlier-dominated ones where winsorization matters.

    Exactness: values are unit-int rounded per row (the 4th-power
    sum bounds int64 through ~1e12 rows at this value range — finer
    rounding would overflow at the 4th power, the documented
    precision/headroom trade; DECIMAL(38) buys finer units), all four
    power sums are exact integers, and central moments come from the
    fixed raw-to-central identities.  Scale: one map-side-combined
    |types|-key aggregate; nothing else."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(
        "event_type", F.round(F.col("value")).cast("long").alias("v")
    )
    v = F.col("v")
    g = s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    c = F.col
    m = g.select(
        "event_type", "n",
        (c("s1").cast("double") / c("n")).alias("m1"),
        (c("s2").cast("double") / c("n")).alias("r2"),
        (c("s3").cast("double") / c("n")).alias("r3"),
        (c("s4").cast("double") / c("n")).alias("r4"),
    )
    mu2 = c("r2") - c("m1") * c("m1")
    mu3 = c("r3") - 3 * c("m1") * c("r2") + 2 * c("m1") * c("m1") * c("m1")
    mu4 = (
        c("r4") - 4 * c("m1") * c("r3")
        + 6 * c("m1") * c("m1") * c("r2")
        - 3 * c("m1") * c("m1") * c("m1") * c("m1")
    )
    cc = m.select(
        "event_type", "n", "m1",
        mu2.alias("mu2"), mu3.alias("mu3"), mu4.alias("mu4"),
    )
    return cc.select(
        "event_type", c("n").cast("long").alias("n"),
        F.round("m1", 6).alias("mean"),
        F.round(F.sqrt(c("mu2")), 6).alias("std_pop"),
        F.round(c("mu3") / (c("mu2") * F.sqrt(c("mu2"))), 6).alias("skewness"),
        F.round(c("mu4") / (c("mu2") * c("mu2")) - 3.0, 6).alias(
            "excess_kurtosis"
        ),
    ).orderBy("event_type")


@register(
    "q_kendall",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      count(*) AS x,
                      sum(CAST(round(coalesce(value, 0) * 1000)
                          AS BIGINT)) AS y
               FROM events GROUP BY 1, 2),
    p AS (SELECT a.event_type,
                 sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                     THEN 1 ELSE 0 END) AS conc,
                 sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                     THEN 1 ELSE 0 END) AS disc,
                 sum(CASE WHEN a.x = b.x AND a.y != b.y
                     THEN 1 ELSE 0 END) AS tie_x,
                 sum(CASE WHEN a.y = b.y AND a.x != b.x
                     THEN 1 ELSE 0 END) AS tie_y,
                 sum(CASE WHEN a.x = b.x AND a.y = b.y
                     THEN 1 ELSE 0 END) AS tie_xy,
                 count(*) AS n_pairs
          FROM d a JOIN d b ON a.event_type = b.event_type
                           AND a.day < b.day
          GROUP BY 1)
    SELECT event_type,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(conc AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           round((conc - disc)
                 / sqrt((n_pairs - tie_x - tie_xy)
                        * CAST(n_pairs - tie_y - tie_xy AS DOUBLE)), 6)
               AS tau_b
    FROM p ORDER BY event_type
    """,
)
def q_kendall(spark, sf_dir):
    """Kendall tau-b rank correlation between daily event count and
    daily value volume per type — the third association measure
    beside q_spearman (tau counts pairwise order inversions, so it
    is the most outlier-robust and has the cleanest confidence
    interpretation; tau-b corrects for ties in either series).

    Exactness: concordant/discordant/tie counts are exact integer
    pair sums over the bounded day series; tau-b is one fixed float
    formula per type.  Scale: the O(days^2) pair join is calendar-
    bounded per type (366 days -> 67k pairs) regardless of corpus
    size — the row-sized work is only the (type, day) map-side
    aggregate; at multi-decade calendars switch to the O(n log n)
    merge-sort inversion count."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(
            F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 1000)
            .cast("long")
        ).alias("y"),
    )
    b = d.select(
        "event_type",
        F.col("day").alias("day2"), F.col("x").alias("x2"),
        F.col("y").alias("y2"),
    )
    j = d.join(b, "event_type").filter(F.col("day") < F.col("day2"))
    dx = F.col("x") - F.col("x2")
    dy = F.col("y") - F.col("y2")
    p = j.groupBy("event_type").agg(
        F.sum((dx * dy > 0).cast("int")).alias("conc"),
        F.sum((dx * dy < 0).cast("int")).alias("disc"),
        F.sum(((dx == 0) & (dy != 0)).cast("int")).alias("tie_x"),
        F.sum(((dy == 0) & (dx != 0)).cast("int")).alias("tie_y"),
        F.sum(((dx == 0) & (dy == 0)).cast("int")).alias("tie_xy"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    c = F.col
    return p.select(
        "event_type",
        c("n_pairs").cast("long").alias("n_pairs"),
        c("conc").cast("long").alias("concordant"),
        c("disc").cast("long").alias("discordant"),
        F.round(
            (c("conc") - c("disc"))
            / F.sqrt(
                (c("n_pairs") - c("tie_x") - c("tie_xy"))
                * (c("n_pairs") - c("tie_y") - c("tie_xy")).cast("double")
            ),
            6,
        ).alias("tau_b"),
    ).orderBy("event_type")


@register(
    "q_motif",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    a AS (SELECT event_type,
                 list(y ORDER BY day) AS ys,
                 list(day ORDER BY day) AS days,
                 count(*) AS n
          FROM d GROUP BY 1),
    w AS (SELECT event_type, days, i,
                 list_slice(ys, i, i + 6) AS v
          FROM a, unnest(range(1, CAST(n AS INT) - 5)) AS t(i)),
    p AS (SELECT x.event_type,
                 x.i AS i, z.i AS j, x.days AS days,
                 list_sum(list_transform(list_zip(x.v, z.v),
                          q -> (q[1] - q[2]) * (q[1] - q[2]))) AS ssd
          FROM w x JOIN w z ON x.event_type = z.event_type
                           AND z.i >= x.i + 7),
    b AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY ssd, i, j) AS rk
          FROM p)
    SELECT event_type,
           CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           days[CAST(i AS INT)] AS day_i, days[CAST(j AS INT)] AS day_j,
           CAST(ssd AS BIGINT) AS ssd
    FROM b WHERE rk = 1 ORDER BY event_type
    """,
)
def q_motif(spark, sf_dir):
    """Time-series motif discovery (matrix-profile-lite): the most
    similar pair of non-overlapping 7-day windows in each type's
    daily count series by sum-of-squared-differences — the recurring-
    pattern detector behind anomaly triage ('this week looks exactly
    like the outage week').

    Exactness: window vectors are integer daily counts assembled from
    a sort_array'd per-type collect (deterministic order), SSD is an
    exact integer, and the per-type argmin tie-breaks on (i, j).
    Scale: the series is calendar-bounded per type, so windows
    (n-6 per type) and the O(n^2) pair join are constant-size
    regardless of corpus rows; production matrix profile (STOMP)
    drops in when calendars grow to 1e5+ points."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    a = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "y"))),
            lambda s: s["y"],
        ).alias("ys"),
        F.sort_array(F.collect_list("day")).alias("days"),
        F.count(F.lit(1)).alias("n"),
    )
    # Types with fewer than 7 days can host no window: the oracle's
    # range(1, n-5) is empty for them, but Spark's F.sequence(1, n-6)
    # would auto-DESCEND (e.g. [1, 0]) and F.slice(..., 0, 7) raises
    # "SQL array indices start at 1" at runtime (ADVICE r6).  Filter
    # them out before exploding so both engines drop the same types.
    w = a.filter(F.col("n") >= 7).select(
        "event_type", "days",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - 6),
                lambda i: F.struct(
                    i.alias("i"), F.slice("ys", i, 7).alias("v")
                ),
            )
        ).alias("win"),
    ).select("event_type", "days", F.col("win.i").alias("i"),
             F.col("win.v").alias("v"))
    z = w.select(
        "event_type", F.col("i").alias("j"), F.col("v").alias("v2")
    )
    ssd = F.aggregate(
        F.zip_with("v", "v2", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e,
    )
    p = (
        w.join(z, "event_type")
        .filter(F.col("j") >= F.col("i") + 7)
        .select("event_type", "i", "j", "days", ssd.alias("ssd"))
    )
    from pyspark.sql import Window as W

    b = p.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("event_type").orderBy("ssd", "i", "j")
        ),
    )
    return (
        b.filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            F.element_at("days", F.col("i").cast("int")).alias("day_i"),
            F.element_at("days", F.col("j").cast("int")).alias("day_j"),
            F.col("ssd").cast("long").alias("ssd"),
        )
        .orderBy("event_type")
    )


@register(
    "q_entropy_rate",
    sql="""
    WITH s AS (SELECT user_id, event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY epoch_us(ts), event_id)
                          AS nxt
               FROM events),
    t AS (SELECT event_type AS src, nxt AS dst, count(*) AS n
          FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
    r AS (SELECT src, CAST(sum(n) AS BIGINT) AS out_n,
                 CAST(count(*) AS BIGINT) AS fanout,
                 CAST(sum(CAST(round(n * ln(n) * 1e9) AS BIGINT))
                      AS BIGINT) AS nln_n
          FROM t GROUP BY 1),
    tot AS (SELECT CAST(sum(out_n) AS BIGINT) AS grand FROM r),
    h AS (SELECT r.src, r.out_n, r.fanout,
                 ln(r.out_n) - r.nln_n / (r.out_n * 1e9) AS h_src
          FROM r),
    z AS (SELECT sum(CAST(round(h.out_n * h.h_src * 1e9 / t2.grand)
                          AS BIGINT)) AS rate_n
          FROM h CROSS JOIN tot t2)
    SELECT h.src, h.out_n, h.fanout,
           round(h.h_src, 6) AS h_conditional,
           round(z.rate_n / 1e9, 6) AS entropy_rate
    FROM h CROSS JOIN z ORDER BY h.src
    """,
)
def q_entropy_rate(spark, sf_dir):
    """Markov entropy rate of the event stream — the predictability
    ceiling of user behavior (Song et al., Science '10 flavor):
    H = sum_src pi(src) * H(next | src), with the stationary weight
    taken as each source's share of observed transitions.  Low rate
    means funnels are deterministic; high rate means next-action
    prediction caps early.  Complements q_markov (the matrix) and
    q_path_analysis (the paths) with the single-number summary.

    Exactness: per-source conditional entropies use the q_ldiversity
    identity H = ln N - (1/N) sum n ln n with nano-int n*ln(n) terms
    (order-free integer sums); the rate re-rounds each source's
    contribution through nano space before the final sum.  Scale: one
    user-partitioned lead() window (the q_markov shuffle), then
    event-type^2-bounded aggregates."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.expr("ts_ns div 1000"), "event_id")
    s = ev.withColumn("nxt", F.lead("event_type").over(w))
    t = (
        s.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    r = t.groupBy("src").agg(
        F.sum("n").cast("long").alias("out_n"),
        F.count(F.lit(1)).cast("long").alias("fanout"),
        F.sum(
            F.round(F.col("n") * F.log("n") * F.lit(1e9)).cast("long")
        ).cast("long").alias("nln_n"),
    )
    tot = r.agg(F.sum("out_n").cast("long").alias("grand"))
    h = r.select(
        "src", "out_n", "fanout",
        (
            F.log("out_n") - F.col("nln_n") / (F.col("out_n") * F.lit(1e9))
        ).alias("h_src"),
    )
    z = (
        h.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                F.col("out_n") * F.col("h_src") * F.lit(1e9) / F.col("grand")
            ).cast("long").alias("c")
        )
        .agg(F.sum("c").alias("rate_n"))
    )
    return (
        h.crossJoin(F.broadcast(z))
        .select(
            "src", "out_n", "fanout",
            F.round("h_src", 6).alias("h_conditional"),
            F.round(F.col("rate_n") / 1e9, 6).alias("entropy_rate"),
        )
        .orderBy("src")
    )


_SAX_SYMS = 6  # alphabet size (equal-frequency breakpoints)


@register(
    "q_sax",
    sql=f"""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, day, y,
                 CAST(row_number() OVER (PARTITION BY event_type
                                         ORDER BY day) - 1 AS BIGINT) AS t,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
          FROM d),
    paa AS (SELECT event_type, t // 7 AS seg,
                   CAST(sum(y) AS BIGINT) AS seg_sum,
                   CAST(count(*) AS BIGINT) AS seg_n
            FROM w WHERE t < n - (n % 7) GROUP BY 1, 2),
    rk AS (SELECT event_type, seg, seg_sum,
                  CAST(row_number() OVER (PARTITION BY event_type
                                          ORDER BY seg_sum, seg)
                       - 1 AS BIGINT) AS r,
                  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                      AS m
           FROM paa),
    sym AS (SELECT event_type, seg,
                   (r * {_SAX_SYMS}) // m AS s
            FROM rk)
    SELECT event_type,
           string_agg(chr(97 + CAST(s AS INT)), '' ORDER BY seg) AS sax,
           CAST(count(*) AS BIGINT) AS n_segments
    FROM sym GROUP BY 1 ORDER BY event_type
    """,
)
def q_sax(spark, sf_dir):
    """SAX symbolization (Lin et al. '03, equal-frequency variant) of
    each type's daily count series: 7-day PAA segments, rank-based
    {_SAX_SYMS}-letter alphabet, one symbol string per type — the
    index-friendly representation motif/anomaly search runs on at
    scale (string equality over symbols replaces numeric distance
    over raw points).

    Exactness: PAA segment sums are integers; symbols come from exact
    integer ranks with a (sum, seg) tie-break — the equal-frequency
    cut (r * a) div m avoids the gaussian-breakpoint table and is
    pure integer math; the final string is an ordered aggregate.
    Scale: the (type, day) map-side aggregate bounds everything
    downstream by the calendar; per-type windows only."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    wo = W.partitionBy("event_type").orderBy("day")
    wp = W.partitionBy("event_type")
    w = d.select(
        "event_type", "day", "y",
        (F.row_number().over(wo) - 1).cast("long").alias("t"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
    )
    paa = (
        w.filter(F.col("t") < F.col("n") - (F.col("n") % 7))
        .groupBy("event_type", F.expr("t div 7").alias("seg"))
        .agg(
            F.sum("y").cast("long").alias("seg_sum"),
            F.count(F.lit(1)).cast("long").alias("seg_n"),
        )
    )
    wr = W.partitionBy("event_type").orderBy("seg_sum", "seg")
    rk = paa.select(
        "event_type", "seg", "seg_sum",
        (F.row_number().over(wr) - 1).cast("long").alias("r"),
        F.count(F.lit(1)).over(W.partitionBy("event_type"))
        .cast("long").alias("m"),
    )
    sym = rk.select(
        "event_type", "seg",
        F.expr(f"(r * {_SAX_SYMS}) div m").alias("s"),
    )
    return (
        sym.groupBy("event_type")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("seg", "s"))),
                    lambda x: F.chr(97 + x["s"].cast("int")),
                ),
            ).alias("sax"),
            F.count(F.lit(1)).cast("long").alias("n_segments"),
        )
        .orderBy("event_type")
    )


_DTW_INF = 10**15


@register(
    "q_dtw",
    sql=f"""
    WITH d AS (SELECT event_type,
                      epoch_us(ts) // 604800000000 AS wk,
                      count(*) AS y
               FROM events GROUP BY 1, 2),
    a AS (SELECT event_type,
                 list(y ORDER BY wk) AS ys
          FROM d GROUP BY 1),
    p AS (SELECT x.event_type AS type_a, z.event_type AS type_b,
                 x.ys AS va, z.ys AS vb
          FROM a x JOIN a z ON x.event_type < z.event_type),
    r AS (SELECT type_a, type_b,
                 len(va) AS n, len(vb) AS m,
                 list_reduce(
                     list_prepend(
                         list_transform(range(0, len(vb) + 1),
                             j -> CASE WHEN j = 0 THEN CAST(0 AS BIGINT)
                                  ELSE CAST({_DTW_INF} AS BIGINT) END),
                         list_transform(va, x -> [x])),
                     (prev, ai) -> list_reduce(
                         list_prepend(
                             [CAST({_DTW_INF} AS BIGINT)],
                             list_transform(range(1, len(vb) + 1),
                                            j -> [CAST(j AS BIGINT)])),
                         (cur, jl) -> list_append(cur,
                             abs(ai[1] - vb[CAST(jl[1] AS INT)])
                             + least(prev[CAST(jl[1] AS INT)],
                                     prev[CAST(jl[1] AS INT) + 1],
                                     cur[len(cur)])))
                 ) AS dp
          FROM p)
    SELECT type_a, type_b,
           CAST(n AS BIGINT) AS n_weeks_a, CAST(m AS BIGINT) AS n_weeks_b,
           CAST(dp[CAST(m AS INT) + 1] AS BIGINT) AS dtw,
           round(dp[CAST(m AS INT) + 1] / CAST(n + m AS DOUBLE), 4)
               AS dtw_per_step
    FROM r ORDER BY type_a, type_b
    """,
)
def q_dtw(spark, sf_dir):
    """Dynamic-time-warping distance between every pair of event-type
    WEEKLY count series — the elastic similarity measure that aligns
    shifted/stretched seasonal patterns where lockstep metrics
    (q_corr/q_kendall) see nothing; dtw_per_step normalizes by path
    length for cross-pair comparison.

    The O(n*m) Bellman recursion runs ENTIRELY in-plan as a nested
    fold (outer over series-a elements carrying the previous DP row,
    inner over series-b positions building the current row with the
    three-way min) — no UDF, no driver loop; DuckDB replays the
    identical recursion with nested list_reduce over list-typed
    accumulators (the list-element-accumulator trick, since DuckDB
    folds require acc type == element type).

    Exactness: weekly sums, costs |a-b| and the DP are pure integer
    arithmetic; the absolute-week index (epoch_us div week) needs no
    anchor row.  Scale: series are calendar-bounded (52/year), so
    each pair's DP is constant work and the pair table is
    |types|^2 rows; the row-sized work is one (type, week) map-side
    aggregate.  At 1e4+-point series, swap in banded DTW (Sakoe-
    Chiba) — same fold with a clamped inner range."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.expr("ts_ns div 1000 div 604800000000").alias("wk"),
    ).agg(F.count(F.lit(1)).alias("y"))
    a = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("wk", "y"))),
            lambda s: s["y"],
        ).alias("ys")
    )
    p = (
        a.select(
            F.col("event_type").alias("type_a"), F.col("ys").alias("va")
        )
        .join(
            a.select(
                F.col("event_type").alias("type_b"), F.col("ys").alias("vb")
            ),
            F.col("type_a") < F.col("type_b"),
        )
    )
    from shadems_spark.operators.series import dtw_fold

    r = p.withColumn("dtw", dtw_fold("va", "vb"))
    return r.select(
        "type_a", "type_b",
        F.size("va").cast("long").alias("n_weeks_a"),
        F.size("vb").cast("long").alias("n_weeks_b"),
        F.col("dtw").cast("long").alias("dtw"),
        F.round(
            F.col("dtw")
            / (F.size("va") + F.size("vb")).cast("double"),
            4,
        ).alias("dtw_per_step"),
    ).orderBy("type_a", "type_b")


_FBT_SQL = """
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
      FROM events GROUP BY 1, 2),
    bnd AS (SELECT min(day) AS d0,
                   datediff('day', min(day), max(day)) AS span
            FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    ser AS (SELECT t.event_type, g.x + 1 AS t,
                   CAST(coalesce(d.y, 0) AS DOUBLE) AS y
            FROM types t
            CROSS JOIN (SELECT unnest(generate_series(0,
                               (SELECT span FROM bnd))) AS x) g
            LEFT JOIN d ON d.event_type = t.event_type
                       AND d.day = (SELECT d0 FROM bnd) + INTERVAL (g.x) DAY),
    nn AS (SELECT event_type, count(*) AS n FROM ser GROUP BY 1),
    cuts AS (SELECT event_type, unnest(generate_series(14,
                    CAST(n - 7 AS INT), 7)) AS c
             FROM nn WHERE n >= 21),
    r AS (
      SELECT s1.event_type AS event_type, cu.c AS c, 1 AS t,
             s1.y AS l, s2.y - s1.y AS b
      FROM ser s1
      JOIN ser s2 ON s1.event_type = s2.event_type
                 AND s1.t = 1 AND s2.t = 2
      JOIN cuts cu ON cu.event_type = s1.event_type
      UNION ALL
      SELECT r.event_type, r.c, r.t + 1,
             0.5 * s.y + 0.5 * (r.l + r.b),
             0.25 * (0.5 * s.y + 0.5 * (r.l + r.b) - r.l) + 0.75 * r.b
      FROM r JOIN ser s
        ON s.event_type = r.event_type AND s.t = r.t + 1
      WHERE r.t < r.c),
    f AS (SELECT r.event_type, r.c,
                 CAST(round(abs(r.l + 7.0 * r.b - sa.y) * 1e9) AS BIGINT)
                     AS err_n,
                 CAST(round(abs(sc.y - sa.y) * 1e9) AS BIGINT) AS nerr_n
          FROM r
          JOIN ser sa ON sa.event_type = r.event_type AND sa.t = r.c + 7
          JOIN ser sc ON sc.event_type = r.event_type AND sc.t = r.c
          WHERE r.t = r.c),
    g AS (SELECT event_type, count(*) AS n_folds,
                 sum(err_n) AS se, sum(nerr_n) AS sn
          FROM f GROUP BY 1)
    SELECT event_type, CAST(n_folds AS BIGINT) AS n_folds,
           round(se / 1e9 / n_folds, 4) AS mae,
           round(sn / 1e9 / n_folds, 4) AS mae_naive,
           CASE WHEN sn > 0
                THEN round(1.0 - CAST(se AS DOUBLE) / sn, 4) END AS skill
    FROM g ORDER BY event_type
"""


@register("q_forecast_backtest", sql=_FBT_SQL)
def q_forecast_backtest(spark, sf_dir):
    """Rolling-origin backtest of the Holt forecaster (the evaluation
    loop every production forecaster ships with): at cutoffs every 7
    days (from day 14), refit on the prefix, forecast 7 days ahead, and score MAE
    against the persistence baseline (skill = 1 - mae/mae_naive; a
    forecaster that can't beat 'tomorrow = today' is noise).

    Exactness: each fold replays the q_holt recurrence (exact IEEE
    step sequence on the zero-filled integer series — the oracle's
    recursive CTE is keyed by (type, cutoff) and iterates to each
    cutoff); per-fold absolute errors are nano-int-rounded before the
    cross-fold sum.  Scale: the series is calendar-bounded, so the
    whole backtest — O(n^2/stride) fold steps — is constant work per
    type after the one (type, day) map-side aggregate; folds ride the
    SAME collected array, exploded per cutoff, never a second scan."""
    ev = load_table(spark, sf_dir, "events")
    grid = _daily_grid(ev, y_cast="double")
    ys = F.transform(
        F.sort_array(F.collect_list(F.struct("x", "y"))), lambda s: s["y"]
    )
    agg = grid.groupBy("event_type").agg(ys.alias("ys"))
    folds = agg.filter(F.size("ys") >= 21).select(
        "event_type", "ys",
        F.explode(
            F.sequence(F.lit(14), F.size("ys") - 7, F.lit(7))
        ).alias("c"),
    )
    y1 = F.element_at(F.col("ys"), 1)
    y2 = F.element_at(F.col("ys"), 2)
    init = F.struct(y1.alias("l"), (y2 - y1).alias("b"))

    def step(acc, y):
        l_new = F.lit(0.5) * y + F.lit(0.5) * (acc["l"] + acc["b"])
        b_new = F.lit(0.25) * (l_new - acc["l"]) + F.lit(0.75) * acc["b"]
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    st = F.aggregate(
        F.slice(F.col("ys"), 2, F.col("c") - 1), init, step
    )
    f = folds.select(
        "event_type", "c",
        F.round(
            F.abs(
                st["l"] + F.lit(7.0) * st["b"]
                - F.element_at("ys", F.col("c") + 7)
            ) * F.lit(1e9)
        ).cast("long").alias("err_n"),
        F.round(
            F.abs(
                F.element_at("ys", F.col("c"))
                - F.element_at("ys", F.col("c") + 7)
            ) * F.lit(1e9)
        ).cast("long").alias("nerr_n"),
    )
    g = f.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_folds"),
        F.sum("err_n").alias("se"),
        F.sum("nerr_n").alias("sn"),
    )
    return g.select(
        "event_type",
        F.col("n_folds").cast("long").alias("n_folds"),
        F.round(F.col("se") / 1e9 / F.col("n_folds"), 4).alias("mae"),
        F.round(F.col("sn") / 1e9 / F.col("n_folds"), 4).alias("mae_naive"),
        F.when(
            F.col("sn") > 0,
            F.round(
                F.lit(1.0) - F.col("se").cast("double") / F.col("sn"), 4
            ),
        ).alias("skill"),
    ).orderBy("event_type")


def _ams_join_sql() -> str:
    from shadems_spark.operators.text import FP_MOD

    p = FP_MOD
    ya, yb = [], []
    for r, (a, b, c, d) in enumerate(_ams_coeffs()):
        h = f"CAST({a} AS BIGINT)"
        for coef in (b, c, d):
            h = f"(({h}) * u + {coef}) % {p}"
        sgn = f"(1 - 2 * (({h}) % 2))"
        ya.append(f"sum({sgn} * ca) AS a{r}")
        yb.append(f"sum({sgn} * cb) AS b{r}")
    cols = ",\n                 ".join(ya + yb)
    est_list = ", ".join(
        f"(a{4 * g} * b{4 * g} + a{4 * g + 1} * b{4 * g + 1}"
        f" + a{4 * g + 2} * b{4 * g + 2} + a{4 * g + 3} * b{4 * g + 3})"
        for g in range(4)
    )
    return f"""
    WITH g AS (SELECT user_id % {p} AS u,
                      sum(CASE WHEN event_type = 'view'
                          THEN 1 ELSE 0 END) AS ca,
                      sum(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS cb
               FROM events GROUP BY 1),
    s AS (SELECT sum(ca * cb) AS exact_sz,
                 sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END)
                     AS n_shared,
                 {cols}
          FROM g),
    m AS (SELECT *, list_sort([{est_list}]) AS sums FROM s)
    SELECT CAST(n_shared AS BIGINT) AS n_shared_users,
           CAST(exact_sz AS BIGINT) AS exact_join_size,
           round((sums[2] + sums[3]) / 8.0, 1) AS ams_join_size,
           round(abs((sums[2] + sums[3]) / 8.0 - exact_sz)
                 / exact_sz, 6) AS rel_err
    FROM m
    """


@register("q_ams_join", sql=_ams_join_sql())
def q_ams_join(spark, sf_dir):
    """AMS join-size estimation (the inner-product generalization of
    q_ams_f2, Alon-Gibbons-Matias-Szegedy '99): |view ⋈ purchase on
    user_id| = sum_u cA(u)*cB(u), estimated by the product of the two
    streams' sign-sketch counters — the cardinality estimator a
    cost-based optimizer consults BEFORE committing to a join
    strategy, one constant-width pass per stream instead of building
    the join.  The exact join size rides beside it for the audit.

    Exactness: both sketches fold the SAME SplitMix64 cubic sign
    hashes as q_ams_f2 (4-wise, engine-identical literals), all
    estimator arithmetic is integer until the final two divisions,
    and median-of-4-means is an integer half-sum.  Scale: the sketch
    is 32 integer counters from ONE map-side-combined pass; the
    per-user pre-aggregate serves only the exact twin."""
    from shadems_spark.operators.text import FP_MOD

    p = FP_MOD
    g = (
        load_table(spark, sf_dir, "events")
        .select(
            (F.col("user_id") % p).alias("u"),
            (F.col("event_type") == "view").cast("long").alias("va"),
            (F.col("event_type") == "purchase").cast("long").alias("vb"),
        )
        .groupBy("u")
        .agg(F.sum("va").alias("ca"), F.sum("vb").alias("cb"))
    )
    aggs = [
        F.sum(F.col("ca") * F.col("cb")).alias("exact_sz"),
        F.sum(((F.col("ca") > 0) & (F.col("cb") > 0)).cast("int")).alias(
            "n_shared"
        ),
    ]
    for r, (a, b, c, d) in enumerate(_ams_coeffs()):
        h = F.lit(a)
        for coef in (b, c, d):
            h = (h * F.col("u") + F.lit(coef)) % F.lit(p)
        sgn = 1 - 2 * (h % 2)
        aggs.append(F.sum(sgn * F.col("ca")).alias(f"a{r}"))
        aggs.append(F.sum(sgn * F.col("cb")).alias(f"b{r}"))
    s = g.agg(*aggs)
    est = [
        sum(
            F.col(f"a{4 * gi + j}") * F.col(f"b{4 * gi + j}")
            for j in range(4)
        )
        for gi in range(4)
    ]
    m = s.withColumn("sums", F.sort_array(F.array(*est)))
    med2 = F.element_at("sums", 2) + F.element_at("sums", 3)
    return m.select(
        F.col("n_shared").cast("long").alias("n_shared_users"),
        F.col("exact_sz").cast("long").alias("exact_join_size"),
        F.round(med2 / 8.0, 1).alias("ams_join_size"),
        F.round(
            F.abs(med2 / 8.0 - F.col("exact_sz")) / F.col("exact_sz"), 6
        ).alias("rel_err"),
    )


@register(
    "q_wilcoxon",
    sql="""
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                          AS x,
                      sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                          AS y
               FROM events GROUP BY 1),
    f AS (SELECT day, x - y AS diff, abs(x - y) AS ad
          FROM d WHERE x != y),
    r AS (SELECT diff, ad,
                 2 * rank() OVER (ORDER BY ad)
                 + count(*) OVER (PARTITION BY ad) - 1 AS r2
          FROM f),
    tie AS (SELECT sum(t * t * t - t) AS t3t
            FROM (SELECT count(*) AS t FROM f GROUP BY ad)),
    s AS (SELECT count(*) AS n,
                 sum(CASE WHEN diff > 0 THEN r2 ELSE 0 END) AS w2
          FROM r)
    SELECT CAST(s.n AS BIGINT) AS n_pairs,
           round(s.w2 / 2.0, 1) AS w_plus,
           round((s.w2 / 2.0 - s.n * (s.n + 1) / 4.0)
                 / sqrt(s.n * (s.n + 1) * (2.0 * s.n + 1) / 24.0
                        - coalesce(tie.t3t, 0) / 48.0), 6) AS z
    FROM s CROSS JOIN tie
    """,
)
def q_wilcoxon(spark, sf_dir):
    """Wilcoxon signed-rank test on the PAIRED daily (view, click)
    counts — the paired companion to q_mannwhitney's two-independent-
    samples test: same days, two metrics, does one systematically
    exceed the other?  Uses average ranks over |diff| (half-rank
    integers, the q_spearman protocol), drops zero diffs, and applies
    the tie-corrected normal approximation.

    Exactness: diffs and half-ranks are exact integers, the tie term
    sum(t^3 - t) is an integer aggregate, and z is one fixed float
    formula.  The rank window is GLOBAL but over the paired-day
    table — calendar-bounded by construction (<= days rows), the
    documented bounded-input exemption (q_auc's per-score
    precedent).  Scale: one conditional (day)-key aggregate is the
    only data-sized stage."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum((F.col("event_type") == "view").cast("int")).alias("x"),
        F.sum((F.col("event_type") == "click").cast("int")).alias("y"),
    )
    f = d.filter(F.col("x") != F.col("y")).select(
        (F.col("x") - F.col("y")).alias("diff"),
        F.abs(F.col("x") - F.col("y")).alias("ad"),
    )
    # Average ranks over |diff| WITHOUT a global window: collapse to
    # the per-distinct-|diff| table (calendar-bounded), take the
    # strict triangle prefix count (cumlt), and expand each tie
    # group's doubled rank sum in closed form — for a group of t tied
    # rows after cumlt smaller ones, every row's doubled average rank
    # is 2*cumlt + t + 1, so the positive-diff rank sum is
    # sum npos * (2*cumlt + t + 1): pure integers, identical to the
    # rank()+count() window values (VERDICT r7 #5 conversion; the
    # oracle keeps DuckDB's own window plan)."""
    from shadems_spark.operators.profile import triangle_cumsum

    fd = f.groupBy("ad").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum((F.col("diff") > 0).cast("int")).cast("long").alias("npos"),
    )
    cl = triangle_cumsum(fd, ["ad"], {"__cumlt": "t"}, strict=True)
    tie = fd.agg(
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("t3t")
    )
    s = cl.agg(
        F.sum("t").alias("n"),
        F.sum(
            F.col("npos") * (2 * F.col("__cumlt") + F.col("t") + 1)
        ).alias("w2"),
    )
    c = F.col
    return (
        s.crossJoin(F.broadcast(tie))
        .select(
            c("n").cast("long").alias("n_pairs"),
            F.round(c("w2") / 2.0, 1).alias("w_plus"),
            F.round(
                (c("w2") / 2.0 - c("n") * (c("n") + 1) / 4.0)
                / F.sqrt(
                    c("n") * (c("n") + 1) * (2.0 * c("n") + 1) / 24.0
                    - F.coalesce(c("t3t"), F.lit(0)) / 48.0
                ),
                6,
            ).alias("z"),
        )
    )


@register(
    "q_friedman",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    b AS (SELECT min(day) AS d0,
                 datediff('day', min(day), max(day)) AS span FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    grid AS (SELECT t.event_type, g.x AS day_i, coalesce(d.y, 0) AS y
             FROM types t
             CROSS JOIN (SELECT unnest(generate_series(0,
                                (SELECT span FROM b))) AS x) g
             LEFT JOIN d ON d.event_type = t.event_type
                        AND d.day = (SELECT d0 FROM b) + INTERVAL (g.x) DAY),
    r AS (SELECT event_type, day_i,
                 2 * rank() OVER (PARTITION BY day_i ORDER BY y)
                 + count(*) OVER (PARTITION BY day_i, y) - 1 AS r2
          FROM grid),
    tie AS (SELECT sum(t * t * t - t) AS t3t
            FROM (SELECT count(*) AS t FROM grid GROUP BY day_i, y)),
    rj AS (SELECT event_type, CAST(sum(r2) AS BIGINT) AS rj2,
                  CAST(count(*) AS BIGINT) AS n
           FROM r GROUP BY 1),
    k AS (SELECT count(*) AS k, max(n) AS n,
                 sum(CAST(rj2 AS DOUBLE) * rj2 / 4.0) AS sr2
          FROM rj),
    chi AS (SELECT k.k, k.n,
                   (12.0 / (k.n * k.k * (k.k + 1)) * k.sr2
                    - 3.0 * k.n * (k.k + 1))
                   / (1.0 - coalesce(tie.t3t, 0)
                      / (CAST(k.n AS DOUBLE) * k.k * (k.k * k.k - 1)))
                       AS chi2
            FROM k CROSS JOIN tie)
    SELECT rj.event_type,
           round(rj.rj2 / 2.0 / rj.n, 4) AS mean_rank,
           CAST(chi.k AS BIGINT) AS k_types,
           CAST(chi.n AS BIGINT) AS n_days,
           round(chi.chi2, 6) AS chi2_f,
           CAST(chi.k - 1 AS BIGINT) AS dof
    FROM rj CROSS JOIN chi ORDER BY rj.event_type
    """,
)
def q_friedman(spark, sf_dir):
    """Friedman test (the nonparametric repeated-measures ANOVA) over
    the zero-filled day x type grid: rank the k types WITHIN each day
    (blocks), compare mean ranks — the k-sample omnibus that, unlike
    q_anova, never assumes normality, and unlike q_kendall/q_spearman
    handles all types at once.  Tie-corrected (average half-ranks +
    the (t^3 - t) denominator adjustment).

    Exactness: half-ranks and the tie sum are exact integers; chi2 is
    one fixed float formula over them.  Scale: rank windows partition
    per DAY (k rows each — perfectly parallel); the grid is the
    types x calendar frame; the only data-sized stage is the
    (type, day) map-side aggregate."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    grid = _daily_grid(ev, x_name="day_i")
    r2 = (
        2 * F.rank().over(W.partitionBy("day_i").orderBy("y"))
        + F.count(F.lit(1)).over(W.partitionBy("day_i", "y")) - 1
    )
    r = grid.select("event_type", "day_i", r2.alias("r2"))
    tie = (
        grid.groupBy("day_i", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("t3t")
        )
    )
    rj = r.groupBy("event_type").agg(
        F.sum("r2").cast("long").alias("rj2"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    k = rj.agg(
        F.count(F.lit(1)).alias("k"),
        F.max("n").alias("n"),
        F.sum(F.col("rj2").cast("double") * F.col("rj2") / 4.0).alias("sr2"),
    )
    c = F.col
    chi = (
        k.crossJoin(F.broadcast(tie))
        .select(
            "k", F.col("n").alias("nn"),
            (
                (
                    12.0 / (c("n") * c("k") * (c("k") + 1)) * c("sr2")
                    - 3.0 * c("n") * (c("k") + 1)
                )
                / (
                    1.0
                    - F.coalesce(c("t3t"), F.lit(0))
                    / (
                        c("n").cast("double") * c("k")
                        * (c("k") * c("k") - 1)
                    )
                )
            ).alias("chi2"),
        )
    )
    return (
        rj.crossJoin(F.broadcast(chi))
        .select(
            "event_type",
            F.round(c("rj2") / 2.0 / c("n"), 4).alias("mean_rank"),
            c("k").cast("long").alias("k_types"),
            c("nn").cast("long").alias("n_days"),
            F.round("chi2", 6).alias("chi2_f"),
            (c("k") - 1).cast("long").alias("dof"),
        )
        .orderBy("event_type")
    )


@register(
    "q_xcorr",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    b AS (SELECT min(day) AS d0 FROM d),
    s AS (SELECT event_type,
                 datediff('day', (SELECT d0 FROM b), day) AS t, y
          FROM d),
    lags AS (SELECT unnest(generate_series(-7, 7)) AS lag),
    p AS (SELECT a.event_type AS type_a, c.event_type AS type_b,
                 l.lag,
                 count(*) AS n,
                 sum(a.y) AS sx, sum(c.y) AS sy,
                 sum(a.y * a.y) AS sxx, sum(c.y * c.y) AS syy,
                 sum(a.y * c.y) AS sxy
          FROM s a
          CROSS JOIN lags l
          JOIN s c ON c.event_type != a.event_type
                  AND c.t = a.t + l.lag
          WHERE a.event_type = 'view' AND c.event_type = 'purchase'
          GROUP BY 1, 2, 3),
    r AS (SELECT *, (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                    / sqrt((n * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * sx)
                           * (n * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * sy)) AS xc
          FROM p),
    best AS (SELECT CAST(lag AS BIGINT) AS best_lag,
                    round(xc, 6) AS best_xcorr
             FROM r ORDER BY CAST(round(xc * 1e9) AS BIGINT) DESC, lag
             LIMIT 1)
    SELECT r.type_a, r.type_b, CAST(r.lag AS BIGINT) AS lag,
           CAST(r.n AS BIGINT) AS n_days,
           round(r.xc, 6) AS xcorr,
           best.best_lag, best.best_xcorr
    FROM r CROSS JOIN best ORDER BY r.lag
    """,
)
def q_xcorr(spark, sf_dir):
    """Lead-lag cross-correlation between the view and purchase daily
    series at lags -7..+7 — does engagement LEAD conversion, and by
    how many days?  The best (most positive) lag is the actionable
    output: a forecaster should feed x shifted by it; argmax
    tie-breaks on the earlier lag via nano-int comparison.

    Exactness: the Pearson sufficient statistics at each lag are
    exact integer sums over the aligned day pairs (the lag join key
    is integer day index); one fixed formula per lag.  Scale: the
    lag join runs on the calendar-bounded per-type series (15 lags x
    days rows), after the one data-sized (type, day) aggregate."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    b = d.agg(F.min("day").alias("d0"))
    s = d.crossJoin(F.broadcast(b)).select(
        "event_type", F.datediff("day", "d0").alias("t"), "y"
    )
    a = s.filter(F.col("event_type") == "view").select(
        F.col("t").alias("ta"), F.col("y").alias("ya")
    )
    cc = s.filter(F.col("event_type") == "purchase").select(
        F.col("t").alias("tc"), F.col("y").alias("yc")
    )
    lags = spark.range(-7, 8).select(F.col("id").cast("int").alias("lag"))
    p = (
        a.crossJoin(F.broadcast(lags))
        .join(cc, F.col("tc") == F.col("ta") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ya").alias("sx"), F.sum("yc").alias("sy"),
            F.sum(F.col("ya") * F.col("ya")).alias("sxx"),
            F.sum(F.col("yc") * F.col("yc")).alias("syy"),
            F.sum(F.col("ya") * F.col("yc")).alias("sxy"),
        )
    )
    c = F.col
    xc = (
        c("n") * c("sxy").cast("double") - c("sx").cast("double") * c("sy")
    ) / F.sqrt(
        (c("n") * c("sxx").cast("double") - c("sx").cast("double") * c("sx"))
        * (c("n") * c("syy").cast("double") - c("sy").cast("double") * c("sy"))
    )
    r = p.withColumn("xc", xc)
    best = (
        r.orderBy(
            F.desc(F.round(c("xc") * 1e9).cast("long")), "lag"
        )
        .limit(1)
        .select(
            c("lag").cast("long").alias("best_lag"),
            F.round("xc", 6).alias("best_xcorr"),
        )
    )
    return (
        r.crossJoin(F.broadcast(best))
        .select(
            F.lit("view").alias("type_a"),
            F.lit("purchase").alias("type_b"),
            c("lag").cast("long").alias("lag"),
            c("n").cast("long").alias("n_days"),
            F.round("xc", 6).alias("xcorr"),
            "best_lag", "best_xcorr",
        )
        .orderBy("lag")
    )


@register(
    "q_granger",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    b AS (SELECT min(day) AS d0 FROM d),
    s AS (SELECT event_type,
                 datediff('day', (SELECT d0 FROM b), day) AS t, y
          FROM d),
    yy AS (SELECT t, y FROM s WHERE event_type = 'purchase'),
    xx AS (SELECT t, y FROM s WHERE event_type = 'view'),
    j AS (SELECT y0.y AS y, y1.y AS yl, x1.y AS xl
          FROM yy y0
          JOIN yy y1 ON y1.t = y0.t - 1
          JOIN xx x1 ON x1.t = y0.t - 1),
    g AS (SELECT count(*) AS n, sum(y) AS sy, sum(yl) AS s1,
                 sum(xl) AS s2,
                 sum(yl * yl) AS s11, sum(yl * xl) AS s12,
                 sum(xl * xl) AS s22,
                 sum(y * yl) AS s1y, sum(y * xl) AS s2y,
                 sum(y * y) AS syy
          FROM j),
    rr AS (SELECT n,
                  -- restricted AR(1): y ~ a + b*yl  (SSE via cov alg.)
                  (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
                  - (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n)
                    * (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n)
                    / (CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                      AS sse_r,
                  -- full: y ~ a + b*yl + c*xl (2-var OLS on centered)
                  (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
                  - ((CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n)
                       * (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n)
                       * (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n)
                     - 2 * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n)
                       * (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n)
                       * (CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n)
                     + (CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                       * (CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n)
                       * (CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n))
                    / ((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                       * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n)
                       - (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n)
                         * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n))
                      AS sse_f
           FROM g)
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(sse_r, 4) AS sse_restricted,
           round(sse_f, 4) AS sse_full,
           round((sse_r - sse_f) / (sse_f / (n - 3)), 6) AS f_stat,
           round(1.0 - sse_f / sse_r, 6) AS r2_gain
    FROM rr
    """,
)
def q_granger(spark, sf_dir):
    """Granger-causality screen (1 lag): does yesterday's VIEW count
    improve today's PURCHASE forecast beyond yesterday's purchases?
    F = ((SSE_r - SSE_f) / q) / (SSE_f / (n - k)) comparing the
    restricted AR(1) against the model with the lagged exogenous
    series — the time-series causality companion to the contemporal
    q_corr/q_xcorr (correlation at lag 0 says nothing about
    direction).

    Exactness: both regressions solve in closed form from ONE set of
    exact integer sufficient statistics (centered covariance algebra
    — no data pass per model); the day-index join keys are integers.
    Scale: the lag self-join runs on the calendar-bounded series; the
    only data-sized stage is the (type, day) aggregate."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    b = d.agg(F.min("day").alias("d0"))
    s = d.crossJoin(F.broadcast(b)).select(
        "event_type", F.datediff("day", "d0").alias("t"), "y"
    )
    yy = s.filter(F.col("event_type") == "purchase").select("t", "y")
    xx = s.filter(F.col("event_type") == "view").select(
        F.col("t").alias("tx"), F.col("y").alias("xl")
    )
    y1 = yy.select(F.col("t").alias("t1"), F.col("y").alias("yl"))
    j = (
        yy.join(y1, F.col("t1") == F.col("t") - 1)
        .join(xx, F.col("tx") == F.col("t") - 1)
        .select("y", "yl", "xl")
    )
    g = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"), F.sum("yl").alias("s1"),
        F.sum("xl").alias("s2"),
        F.sum(F.col("yl") * F.col("yl")).alias("s11"),
        F.sum(F.col("yl") * F.col("xl")).alias("s12"),
        F.sum(F.col("xl") * F.col("xl")).alias("s22"),
        F.sum(F.col("y") * F.col("yl")).alias("s1y"),
        F.sum(F.col("y") * F.col("xl")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    c = F.col

    def ctr(sab, sa, sb):
        return sab.cast("double") - sa.cast("double") * sb / c("n")

    cyy = ctr(c("syy"), c("sy"), c("sy"))
    c11 = ctr(c("s11"), c("s1"), c("s1"))
    c22 = ctr(c("s22"), c("s2"), c("s2"))
    c12 = ctr(c("s12"), c("s1"), c("s2"))
    c1y = ctr(c("s1y"), c("s1"), c("sy"))
    c2y = ctr(c("s2y"), c("s2"), c("sy"))
    sse_r = cyy - c1y * c1y / c11
    sse_f = cyy - (
        c22 * c1y * c1y - 2 * c12 * c1y * c2y + c11 * c2y * c2y
    ) / (c11 * c22 - c12 * c12)
    rr = g.select(
        "n", sse_r.alias("sse_r"), sse_f.alias("sse_f")
    )
    return rr.select(
        c("n").cast("long").alias("n_obs"),
        F.round("sse_r", 4).alias("sse_restricted"),
        F.round("sse_f", 4).alias("sse_full"),
        F.round(
            (c("sse_r") - c("sse_f")) / (c("sse_f") / (c("n") - 3)), 6
        ).alias("f_stat"),
        F.round(F.lit(1.0) - c("sse_f") / c("sse_r"), 6).alias("r2_gain"),
    )


_HURST_WS = [8, 16, 32]


@register(
    "q_hurst",
    sql=f"""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    b AS (SELECT min(day) AS d0,
                 datediff('day', min(day), max(day)) AS span FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    grid AS (SELECT t.event_type, g.x, coalesce(d.y, 0) AS y
             FROM types t
             CROSS JOIN (SELECT unnest(generate_series(0,
                                (SELECT span FROM b))) AS x) g
             LEFT JOIN d ON d.event_type = t.event_type
                        AND d.day = (SELECT d0 FROM b) + INTERVAL (g.x) DAY),
    ww AS (SELECT unnest([{", ".join(str(w) for w in _HURST_WS)}]) AS w),
    cells AS (SELECT g.event_type, ww.w, g.x // ww.w AS blk, g.x, g.y
              FROM grid g CROSS JOIN ww),
    wn AS (SELECT *,
                  CAST(count(*) OVER pb AS BIGINT) AS nb,
                  CAST(sum(y) OVER pb AS BIGINT) AS sy,
                  CAST(sum(y * y) OVER pb AS BIGINT) AS syy,
                  CAST(sum(y) OVER (pb ORDER BY x
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cy,
                  CAST(row_number() OVER (pb ORDER BY x) AS BIGINT) AS j
           FROM cells
           WINDOW pb AS (PARTITION BY event_type, w, blk)),
    dev AS (SELECT event_type, w, blk, nb, sy, syy,
                   w * cy - j * sy AS dev_w
            FROM wn WHERE nb = w),
    blkrs AS (SELECT event_type, w, blk,
                     CAST(round(1e9 *
                       ((max(dev_w) - least(min(dev_w), 0)) / CAST(w AS DOUBLE))
                       / sqrt((syy - CAST(sy AS DOUBLE) * sy / w)
                              / w)) AS BIGINT) AS rs_n
              FROM dev
              GROUP BY event_type, w, blk, sy, syy
              HAVING syy * w > sy * sy),
    mrs AS (SELECT event_type, w, count(*) AS n_blocks,
                   CAST(round(sum(rs_n) / CAST(count(*) AS DOUBLE))
                        AS BIGINT) AS mean_rs_n
            FROM blkrs GROUP BY 1, 2),
    pts AS (SELECT event_type,
                   list_sort(list(ln(CAST(w AS DOUBLE)))) AS lxs,
                   list_sort(list_zip(list(ln(CAST(w AS DOUBLE))),
                                      list(ln(mean_rs_n / 1e9)))) AS pl,
                   count(*) AS np
            FROM mrs GROUP BY 1),
    sl AS (SELECT event_type, np,
                  list_reduce(list_prepend([0.0, 0.0, 0.0, 0.0],
                      list_transform(pl, z -> [z[1], z[2], z[1]*z[1],
                                               z[1]*z[2]])),
                      (a, e) -> [a[1]+e[1], a[2]+e[2], a[3]+e[3],
                                 a[4]+e[4]]) AS s
           FROM pts)
    SELECT mrs.event_type, CAST(mrs.w AS BIGINT) AS w,
           CAST(mrs.n_blocks AS BIGINT) AS n_blocks,
           round(mrs.mean_rs_n / 1e9, 6) AS mean_rs,
           round((sl.np * sl.s[4] - sl.s[1] * sl.s[2])
                 / (sl.np * sl.s[3] - sl.s[1] * sl.s[1]), 6) AS hurst
    FROM mrs JOIN sl USING (event_type)
    ORDER BY mrs.event_type, mrs.w
    """,
)
def q_hurst(spark, sf_dir):
    """Hurst exponent by rescaled-range analysis over the daily count
    series per type — the long-range-dependence diagnostic (H = 0.5
    random walk, H > 0.5 persistent trends, H < 0.5 mean-reverting):
    per block of w days, R/S = (range of mean-adjusted cumulative
    deviations) / population std; H is the log-log slope of mean R/S
    against w in {{8, 16, 32}}.  Capacity planners read H before
    trusting any i.i.d. burst model (q_burstiness measures magnitude,
    Hurst measures MEMORY).

    Exactness: cumulative deviations are carried as exact integers
    (w*cum_j - j*sum — the cross-multiplied centering), each block's
    R/S nano-rounds before the per-w mean, zero-variance blocks drop
    by an integer predicate, and the 3-point regression folds in
    sorted order (deterministic 4-sum accumulator on both engines).
    Scale: block windows partition by (type, w, block) — w-bounded;
    the series is calendar-bounded; the one data-sized stage is the
    (type, day) aggregate."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    grid = _daily_grid(ev)
    ws = spark.createDataFrame([(w,) for w in _HURST_WS], ["w"])
    cells = grid.crossJoin(F.broadcast(ws)).withColumn(
        "blk", F.expr("x div w")
    )
    pb = W.partitionBy("event_type", "w", "blk")
    po = pb.orderBy("x")
    wn = cells.select(
        "event_type", "w", "blk", "x", "y",
        F.count(F.lit(1)).over(pb).cast("long").alias("nb"),
        F.sum("y").over(pb).cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).over(pb).cast("long").alias("syy"),
        F.sum("y").over(po.rowsBetween(W.unboundedPreceding, 0))
        .cast("long").alias("cy"),
        F.row_number().over(po).cast("long").alias("j"),
    )
    dev = wn.filter(F.col("nb") == F.col("w")).withColumn(
        "dev_w", F.col("w") * F.col("cy") - F.col("j") * F.col("sy")
    )
    c = F.col
    blk = (
        dev.groupBy("event_type", "w", "blk", "sy", "syy")
        .agg(F.max("dev_w").alias("mx"), F.min("dev_w").alias("mn"))
        .filter(c("syy") * c("w") > c("sy") * c("sy"))
        .select(
            "event_type", "w",
            F.round(
                F.lit(1e9)
                * ((c("mx") - F.least(c("mn"), F.lit(0))) / c("w").cast("double"))
                / F.sqrt(
                    (c("syy") - c("sy").cast("double") * c("sy") / c("w"))
                    / c("w")
                )
            ).cast("long").alias("rs_n"),
        )
    )
    mrs = blk.groupBy("event_type", "w").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.round(F.sum("rs_n") / F.count(F.lit(1)).cast("double"))
        .cast("long").alias("mean_rs_n"),
    )
    pts = mrs.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.log(c("w").cast("double")).alias("lx"),
                    F.log(c("mean_rs_n") / 1e9).alias("ly"),
                )
            )
        ).alias("pl"),
        F.count(F.lit(1)).alias("np"),
    )
    s = F.aggregate(
        "pl",
        F.struct(
            F.lit(0.0).alias("sx"), F.lit(0.0).alias("sy2"),
            F.lit(0.0).alias("sxx"), F.lit(0.0).alias("sxy"),
        ),
        lambda a, e: F.struct(
            (a["sx"] + e["lx"]).alias("sx"),
            (a["sy2"] + e["ly"]).alias("sy2"),
            (a["sxx"] + e["lx"] * e["lx"]).alias("sxx"),
            (a["sxy"] + e["lx"] * e["ly"]).alias("sxy"),
        ),
    )
    sl = pts.select(
        "event_type", "np", s.alias("s")
    ).select(
        "event_type",
        (
            (c("np") * c("s.sxy") - c("s.sx") * c("s.sy2"))
            / (c("np") * c("s.sxx") - c("s.sx") * c("s.sx"))
        ).alias("hurst"),
    )
    return (
        mrs.join(sl, "event_type")
        .select(
            "event_type",
            c("w").cast("long").alias("w"),
            c("n_blocks").cast("long").alias("n_blocks"),
            F.round(c("mean_rs_n") / 1e9, 6).alias("mean_rs"),
            F.round("hurst", 6).alias("hurst"),
        )
        .orderBy("event_type", "w")
    )


@register(
    "q_power_analysis",
    sql="""
    WITH u AS (SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
                      CAST(max(CASE WHEN event_type = 'purchase'
                                    AND value > 95
                               THEN 1 ELSE 0 END) AS INT) AS converted
               FROM events GROUP BY 1),
    g AS (SELECT count(*) AS n, CAST(sum(converted) AS BIGINT) AS conv
          FROM u),
    p AS (SELECT n, conv, conv / CAST(n AS DOUBLE) AS p0 FROM g),
    mde AS (SELECT p.n, p.conv, p.p0, m.rel AS rel_mde,
                   p.p0 * m.rel AS delta,
                   -- two-sided alpha=.05, power=.80:
                   -- n/arm = (z_a/2 + z_b)^2 * 2 p(1-p) / delta^2
                   CAST(ceil((1.959963984540054 + 0.8416212335729143)
                             * (1.959963984540054 + 0.8416212335729143)
                             * 2.0 * p.p0 * (1.0 - p.p0)
                             / (p.p0 * m.rel * p.p0 * m.rel))
                        AS BIGINT) AS n_per_arm
            FROM p CROSS JOIN (SELECT unnest([0.01, 0.02, 0.05, 0.10,
                                              0.20]) AS rel) m)
    SELECT round(rel_mde, 2) AS rel_mde,
           CAST(n AS BIGINT) AS n_users_observed,
           round(p0, 6) AS base_rate,
           round(delta, 6) AS abs_mde,
           n_per_arm,
           CAST(CASE WHEN n / 2 >= n_per_arm THEN 1 ELSE 0 END AS INT)
               AS powered_today
    FROM mde ORDER BY rel_mde
    """,
)
def q_power_analysis(spark, sf_dir):
    """Experiment power / sample-size table for the q_abtest
    conversion metric: for each candidate relative MDE, the required
    n per arm at alpha = .05 two-sided, power = .80 (the standard
    (z_{a/2} + z_B)^2 * 2p(1-p) / delta^2), and whether the observed
    population already powers it — the run-it-or-don't gate every
    experimentation platform evaluates before q_abtest ever reads a
    z-score.

    Exactness: the base rate comes from exact integer user counts;
    each row is one fixed float formula with the normal quantiles as
    literals (no engine stats functions involved); ceil is exact on
    both engines.  Scale: one per-user conditional aggregate then a
    constant 5-row table."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase") & (F.col("value") > 95)
            ).cast("int")
        ).alias("converted")
    )
    g = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    rels = spark.createDataFrame(
        [(0.01,), (0.02,), (0.05,), (0.10,), (0.20,)], ["rel"]
    )
    za, zb = 1.959963984540054, 0.8416212335729143
    c = F.col
    p0 = c("conv") / c("n").cast("double")
    m = g.crossJoin(F.broadcast(rels)).select(
        "n", "conv", "rel", p0.alias("p0"),
        (p0 * c("rel")).alias("delta"),
    )
    n_req = F.ceil(
        F.lit((za + zb) * (za + zb))
        * 2.0 * c("p0") * (1.0 - c("p0"))
        / (c("delta") * c("delta"))
    ).cast("long")
    return m.select(
        F.round("rel", 2).alias("rel_mde"),
        c("n").cast("long").alias("n_users_observed"),
        F.round("p0", 6).alias("base_rate"),
        F.round("delta", 6).alias("abs_mde"),
        n_req.alias("n_per_arm"),
        (c("n") / 2 >= n_req).cast("int").alias("powered_today"),
    ).orderBy("rel_mde")


@register(
    "q_srm",
    sql="""
    WITH u AS (SELECT user_id, CAST(user_id % 2 AS INT) AS variant
               FROM events GROUP BY 1, 2),
    g AS (SELECT variant, count(*) AS n FROM u GROUP BY 1),
    t AS (SELECT sum(n) AS tot FROM g),
    x AS (SELECT g.variant, g.n, t.tot, t.tot / 2.0 AS e,
                 CAST(round((g.n - t.tot / 2.0) * (g.n - t.tot / 2.0)
                            / (t.tot / 2.0) * 1e9) AS BIGINT) AS contrib_n
          FROM g CROSS JOIN t),
    s AS (SELECT sum(contrib_n) AS chi2_n FROM x)
    SELECT x.variant, CAST(x.n AS BIGINT) AS n_users,
           round(x.e, 1) AS expected,
           round(s.chi2_n / 1e9, 6) AS chi2_srm,
           CAST(CASE WHEN s.chi2_n / 1e9 > 10.828 THEN 1 ELSE 0 END
                AS INT) AS srm_alarm
    FROM x CROSS JOIN s ORDER BY x.variant
    """,
)
def q_srm(spark, sf_dir):
    """Sample-ratio-mismatch guard for the q_abtest assignment: a
    chi-square goodness-of-fit of observed variant counts against the
    designed 50/50 split, alarmed at the p < 0.001 threshold
    (chi2 > 10.828, 1 dof) — the FIRST check every experiment
    analysis runs, because a skewed split invalidates every
    downstream metric no matter how significant it looks.

    Exactness: variant counts are exact integers, each (o-e)^2/e term
    nano-rounds before the sum (the q_chisq protocol).  Scale: one
    per-user distinct aggregate then a 2-row reduce."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select(
        "user_id", (F.col("user_id") % 2).cast("int").alias("variant")
    ).distinct()
    g = u.groupBy("variant").agg(F.count(F.lit(1)).alias("n"))
    t = g.agg(F.sum("n").alias("tot"))
    c = F.col
    x = g.crossJoin(F.broadcast(t)).select(
        "variant", "n", "tot",
        (c("tot") / 2.0).alias("e"),
        F.round(
            (c("n") - c("tot") / 2.0) * (c("n") - c("tot") / 2.0)
            / (c("tot") / 2.0) * F.lit(1e9)
        ).cast("long").alias("contrib_n"),
    )
    s = x.agg(F.sum("contrib_n").alias("chi2_n"))
    return (
        x.crossJoin(F.broadcast(s))
        .select(
            "variant",
            c("n").cast("long").alias("n_users"),
            F.round("e", 1).alias("expected"),
            F.round(c("chi2_n") / 1e9, 6).alias("chi2_srm"),
            (c("chi2_n") / 1e9 > 10.828).cast("int").alias("srm_alarm"),
        )
        .orderBy("variant")
    )


@register(
    "q_heavy_change",
    sql="""
    WITH w AS (SELECT doc_id % 2 AS half,
                      unnest(list_filter(string_split(text, ' '),
                                         x -> len(x) > 0)) AS tok
               FROM documents),
    c AS (SELECT tok,
                 sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c0,
                 sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c1
          FROM w GROUP BY 1),
    t AS (SELECT sum(c0) AS t0, sum(c1) AS t1 FROM c),
    r AS (SELECT c.tok, c.c0, c.c1, t.t0, t.t1,
                 abs(c.c1 * t.t0 - c.c0 * t.t1) AS change_num
          FROM c CROSS JOIN t
          WHERE c.c0 + c.c1 >= 20)
    SELECT tok, CAST(c0 AS BIGINT) AS c0, CAST(c1 AS BIGINT) AS c1,
           round(c0 / CAST(t0 AS DOUBLE) * 1e6, 4) AS rate0_ppm,
           round(c1 / CAST(t1 AS DOUBLE) * 1e6, 4) AS rate1_ppm,
           round(CAST(change_num AS DOUBLE)
                 / (CAST(t0 AS DOUBLE) * t1) * 1e6, 4) AS abs_change_ppm
    FROM r
    ORDER BY change_num * 1000000 / (CAST(t0 AS HUGEINT) * t1) DESC,
             tok
    LIMIT 25
    """,
)
def q_heavy_change(spark, sf_dir):
    """Heavy-CHANGE detection (the drift-mining twin of
    q_heavy_hitters, Cormode-Muthukrishnan's delta problem): the 25
    tokens whose relative frequency moved most between the two corpus
    halves (doc_id parity standing in for time slices) — heavy
    hitters tell you what dominates, heavy changers tell you what is
    HAPPENING; with a min-support floor so rare-token noise can't
    crowd the board.

    Exactness: the change score compares exact integer cross products
    |c1*t0 - c0*t1| (no per-token division before ranking — the
    q_tcloseness trick), and the top-25 orders by an integer-scaled
    key with token tie-break.  Scale: one (half, token) map-side
    aggregate, vocabulary-sized everything, TakeOrderedAndProject
    tail; the streaming face keeps two CM sketches and diffs them."""
    from shadems_spark.operators.text import words

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.filter(words("text"), lambda x: F.length(x) > 0))
        .alias("tok"),
    )
    c = (
        w.groupBy("tok")
        .agg(
            F.sum((F.col("half") == 0).cast("int")).alias("c0"),
            F.sum((F.col("half") == 1).cast("int")).alias("c1"),
        )
    )
    t = c.agg(F.sum("c0").alias("t0"), F.sum("c1").alias("t1"))
    cc = F.col
    r = (
        c.filter(cc("c0") + cc("c1") >= 20)
        .crossJoin(F.broadcast(t))
        .withColumn(
            "change_num",
            F.abs(
                cc("c1").cast("decimal(38,0)") * cc("t0")
                - cc("c0").cast("decimal(38,0)") * cc("t1")
            ),
        )
    )
    return (
        r.select(
            "tok",
            cc("c0").cast("long").alias("c0"),
            cc("c1").cast("long").alias("c1"),
            F.round(cc("c0") / cc("t0").cast("double") * 1e6, 4).alias(
                "rate0_ppm"
            ),
            F.round(cc("c1") / cc("t1").cast("double") * 1e6, 4).alias(
                "rate1_ppm"
            ),
            F.round(
                cc("change_num").cast("double")
                / (cc("t0").cast("double") * cc("t1")) * 1e6,
                4,
            ).alias("abs_change_ppm"),
            (
                cc("change_num") * 1000000
                / (cc("t0").cast("decimal(38,0)") * cc("t1"))
            ).cast("long").alias("__rk"),
        )
        .orderBy(F.desc("__rk"), "tok")
        .limit(25)
        .drop("__rk")
    )


@register(
    "q_time_to_convert",
    sql="""
    WITH f AS (SELECT user_id,
                      min(CASE WHEN event_type = 'view'
                          THEN epoch_us(ts) END) AS t_view,
                      min(CASE WHEN event_type = 'purchase'
                          THEN epoch_us(ts) END) AS t_buy
               FROM events GROUP BY 1),
    lat AS (SELECT user_id, t_buy - t_view AS lat_us
            FROM f WHERE t_view IS NOT NULL AND t_buy IS NOT NULL
                     AND t_view < t_buy),
    r AS (SELECT lat_us,
                 row_number() OVER (ORDER BY lat_us, user_id) AS rn,
                 count(*) OVER () AS n
          FROM lat),
    q AS (SELECT max(n) AS n,
                 max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                     THEN lat_us END) AS p50_us,
                 max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                     THEN lat_us END) AS p90_us,
                 sum(lat_us) AS s
          FROM r)
    SELECT CAST(n AS BIGINT) AS n_converters,
           round(p50_us / 8.64e10, 4) AS p50_days,
           round(p90_us / 8.64e10, 4) AS p90_days,
           round(s / CAST(n AS DOUBLE) / 8.64e10, 4) AS mean_days
    FROM q
    """,
)
def q_time_to_convert(spark, sf_dir):
    """Time-to-convert distribution (first view -> first purchase per
    user): EXACT p50/p90 and mean latency in days — the funnel's
    missing time axis (q_funnel counts who converts; this measures
    how long the pipeline holds them, sizing attribution windows and
    retargeting delays).

    Exactness: latencies are integer microseconds from the q_funnel
    conditional-min frame; the exact quantiles are the order
    statistics at ceil(q*n) under the (latency, user) total order —
    selected by the two-phase value-cut global numbering
    (operators/profile.global_index), never a single-partition window
    over the converter table (the oracle's global window IS the
    definition; converters are fixture-bounded there).  Scale: one
    per-user conditional aggregate, the two-phase numbering, and a
    1-row reduce."""
    from shadems_spark.operators.profile import global_index

    ev = load_table(spark, sf_dir, "events")
    us = F.expr("ts_ns div 1000")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("t_buy"),
    )
    lat = f.filter(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_view") < F.col("t_buy"))
    ).select("user_id", (F.col("t_buy") - F.col("t_view")).alias("lat_us"))
    r = global_index(lat, ["lat_us", "user_id"], out="rn", with_total="n")
    c = F.col
    q = r.agg(
        F.max("n").alias("n"),
        F.max(
            F.when(
                c("rn") == F.ceil(0.5 * c("n")).cast("long"), c("lat_us")
            )
        ).alias("p50_us"),
        F.max(
            F.when(
                c("rn") == F.ceil(0.9 * c("n")).cast("long"), c("lat_us")
            )
        ).alias("p90_us"),
        F.sum("lat_us").alias("s"),
    )
    return q.select(
        c("n").cast("long").alias("n_converters"),
        F.round(c("p50_us") / 8.64e10, 4).alias("p50_days"),
        F.round(c("p90_us") / 8.64e10, 4).alias("p90_days"),
        F.round(c("s") / c("n").cast("double") / 8.64e10, 4).alias(
            "mean_days"
        ),
    )


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


_CONF_ALPHA = "0.1"


def _conformal_sql() -> str:
    # the train-split solve below is the _RIDGE_SQL Cramer form
    return f"""
    WITH s AS (SELECT l_orderkey * 10 + l_linenumber AS rk,
                      l_orderkey % 3 AS split,
                      CAST(l_quantity AS BIGINT) AS x1,
                      CAST(round(l_discount * 100) AS BIGINT) AS x2,
                      CAST(round(l_extendedprice * 10) AS BIGINT) AS y
               FROM lineitem),
    g AS (SELECT count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
                 sum(y) AS sy, sum(x1*x1) AS s11, sum(x1*x2) AS s12,
                 sum(x2*x2) AS s22, sum(x1*y) AS s1y, sum(x2*y) AS s2y
          FROM s WHERE split = 0),
    a AS (SELECT CAST(n AS DOUBLE) AS a11, CAST(s1 AS DOUBLE) AS a12,
                 CAST(s2 AS DOUBLE) AS a13,
                 CAST(s11 AS DOUBLE) + {_RIDGE_LAM} AS a22,
                 CAST(s12 AS DOUBLE) AS a23,
                 CAST(s22 AS DOUBLE) + {_RIDGE_LAM} AS a33,
                 CAST(sy AS DOUBLE) AS b1, CAST(s1y AS DOUBLE) AS b2,
                 CAST(s2y AS DOUBLE) AS b3, n
          FROM g),
    d AS (SELECT *,
                 a11 * (a22 * a33 - a23 * a23)
                 - a12 * (a12 * a33 - a23 * a13)
                 + a13 * (a12 * a23 - a22 * a13) AS det
          FROM a),
    b AS (SELECT n AS n_train,
                 (b1 * (a22 * a33 - a23 * a23)
                  - a12 * (b2 * a33 - a23 * b3)
                  + a13 * (b2 * a23 - a22 * b3)) / det AS b0,
                 (a11 * (b2 * a33 - a23 * b3)
                  - b1 * (a12 * a33 - a23 * a13)
                  + a13 * (a12 * b3 - b2 * a13)) / det AS bb1,
                 (a11 * (a22 * b3 - b2 * a23)
                  - a12 * (a12 * b3 - b2 * a13)
                  + b1 * (a12 * a23 - a22 * a13)) / det AS bb2
          FROM d),
    res AS (SELECT s.rk, s.split,
                   CAST(round(abs(s.y - (b.b0 + b.bb1 * s.x1
                                         + b.bb2 * s.x2)) * 100)
                        AS BIGINT) AS r_n
            FROM s CROSS JOIN b WHERE s.split != 0),
    cal AS (SELECT r_n,
                   row_number() OVER (ORDER BY r_n, rk) AS pos,
                   count(*) OVER () AS nc
            FROM res WHERE split = 1),
    qh AS (SELECT max(nc) AS n_calib,
                  max(CASE WHEN pos = CAST(ceil((max_nc + 1) * (1.0 - {_CONF_ALPHA})) AS BIGINT)
                      THEN r_n END) AS q_n
           FROM (SELECT *, max(nc) OVER () AS max_nc FROM cal)),
    tst AS (SELECT count(*) AS n_test,
                   sum(CASE WHEN res.r_n <= qh.q_n THEN 1 ELSE 0 END)
                       AS covered
            FROM res CROSS JOIN qh WHERE split = 2)
    SELECT CAST(b.n_train AS BIGINT) AS n_train,
           CAST(qh.n_calib AS BIGINT) AS n_calib,
           CAST(tst.n_test AS BIGINT) AS n_test,
           round(qh.q_n / 1000.0, 3) AS q_hat_dollars,
           round(tst.covered / CAST(tst.n_test AS DOUBLE), 6)
               AS coverage_test,
           {1.0 - float(_CONF_ALPHA)} AS target
    FROM b CROSS JOIN qh CROSS JOIN tst
    """


@register("q_conformal", sql=_conformal_sql())
def q_conformal(spark, sf_dir):
    """Split-conformal prediction intervals (Vovk; Lei et al.) around
    the q_ridge price model: fit on the train split, take q_hat = the
    ceil((n+1)(1-alpha))-th order statistic of the calibration
    absolute residuals, and the interval prediction +- q_hat covers a
    FRESH point with probability >= 1 - alpha, distribution-free —
    the modern uncertainty wrapper every ML scoring pipeline should
    ship; the test split's empirical coverage is emitted beside the
    target so the guarantee is checkable in-band.

    Exactness: the ridge solve is the q_ridge closed form on the
    train split's integer sufficient statistics; residuals round to
    milli-dollar ints BEFORE ranking, so the order statistic compares
    integers (selected via the two-phase global numbering — no
    single-partition window over the calibration table); coverage is
    an integer comparison count.  Scale: one stats pass, one scoring
    pass, the two-phase rank, a 1-row reduce."""
    from shadems_spark.operators.profile import global_index

    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rk"),
        (F.col("l_orderkey") % 3).alias("split"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 10).cast("long").alias("y"),
    )
    c = F.col
    g = s.filter(c("split") == 0).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"), F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(c("x1") * c("x1")).alias("s11"),
        F.sum(c("x1") * c("x2")).alias("s12"),
        F.sum(c("x2") * c("x2")).alias("s22"),
        F.sum(c("x1") * c("y")).alias("s1y"),
        F.sum(c("x2") * c("y")).alias("s2y"),
    )
    lam = float(_RIDGE_LAM)
    a = g.select(
        "n",
        c("n").cast("double").alias("a11"),
        c("s1").cast("double").alias("a12"),
        c("s2").cast("double").alias("a13"),
        (c("s11").cast("double") + lam).alias("a22"),
        c("s12").cast("double").alias("a23"),
        (c("s22").cast("double") + lam).alias("a33"),
        c("sy").cast("double").alias("b1"),
        c("s1y").cast("double").alias("b2"),
        c("s2y").cast("double").alias("b3"),
    )
    det = (
        c("a11") * (c("a22") * c("a33") - c("a23") * c("a23"))
        - c("a12") * (c("a12") * c("a33") - c("a23") * c("a13"))
        + c("a13") * (c("a12") * c("a23") - c("a22") * c("a13"))
    )
    d = a.withColumn("det", det)
    b = d.select(
        c("n").alias("n_train"),
        (
            (
                c("b1") * (c("a22") * c("a33") - c("a23") * c("a23"))
                - c("a12") * (c("b2") * c("a33") - c("a23") * c("b3"))
                + c("a13") * (c("b2") * c("a23") - c("a22") * c("b3"))
            ) / c("det")
        ).alias("b0"),
        (
            (
                c("a11") * (c("b2") * c("a33") - c("a23") * c("b3"))
                - c("b1") * (c("a12") * c("a33") - c("a23") * c("a13"))
                + c("a13") * (c("a12") * c("b3") - c("b2") * c("a13"))
            ) / c("det")
        ).alias("bb1"),
        (
            (
                c("a11") * (c("a22") * c("b3") - c("b2") * c("a23"))
                - c("a12") * (c("a12") * c("b3") - c("b2") * c("a13"))
                + c("b1") * (c("a12") * c("a23") - c("a22") * c("a13"))
            ) / c("det")
        ).alias("bb2"),
    )
    res = (
        s.filter(c("split") != 0)
        .crossJoin(F.broadcast(b))
        .select(
            "rk", "split", "n_train",
            F.round(
                F.abs(
                    c("y")
                    - (c("b0") + c("bb1") * c("x1") + c("bb2") * c("x2"))
                ) * 100
            ).cast("long").alias("r_n"),
        )
    )
    cal = res.filter(c("split") == 1)
    ranked = global_index(cal, ["r_n", "rk"], out="pos", with_total="nc")
    alpha = float(_CONF_ALPHA)
    qh = ranked.agg(
        F.max("nc").alias("n_calib"),
        F.max(
            F.when(
                c("pos")
                == F.ceil((c("nc") + 1) * (1.0 - alpha)).cast("long"),
                c("r_n"),
            )
        ).alias("q_n"),
    )
    tst = (
        res.filter(c("split") == 2)
        .crossJoin(F.broadcast(qh))
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum((c("r_n") <= c("q_n")).cast("int")).alias("covered"),
            F.max("n_calib").alias("n_calib"),
            F.max("q_n").alias("q_n"),
        )
    )
    return (
        b.select("n_train")
        .crossJoin(F.broadcast(tst))
        .select(
            c("n_train").cast("long").alias("n_train"),
            c("n_calib").cast("long").alias("n_calib"),
            c("n_test").cast("long").alias("n_test"),
            F.round(c("q_n") / 1000.0, 3).alias("q_hat_dollars"),
            F.round(
                c("covered") / c("n_test").cast("double"), 6
            ).alias("coverage_test"),
            F.lit(1.0 - alpha).alias("target"),
        )
    )


@register(
    "q_seq_patterns",
    sql="""
    WITH e AS (SELECT user_id, event_id, event_type,
                      epoch_us(ts) AS ts_us
               FROM events),
    g AS (SELECT *,
                 CASE WHEN ts_us - lag(ts_us) OVER
                          (PARTITION BY user_id ORDER BY ts_us, event_id)
                      > 1800000000 OR lag(ts_us) OVER
                          (PARTITION BY user_id ORDER BY ts_us, event_id)
                      IS NULL THEN 1 ELSE 0 END AS new_sess
          FROM e),
    s AS (SELECT *,
                 sum(new_sess) OVER (PARTITION BY user_id
                                     ORDER BY ts_us, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess
          FROM g),
    fl AS (SELECT user_id, sess, event_type,
                  min(ts_us * 100 + event_id % 100) AS first_k
           FROM s GROUP BY 1, 2, 3),
    pr AS (SELECT a.event_type AS ante, b.event_type AS cons,
                  count(*) AS n_sessions
           FROM fl a JOIN fl b
             ON a.user_id = b.user_id AND a.sess = b.sess
            AND a.event_type != b.event_type
            AND a.first_k < b.first_k
           GROUP BY 1, 2),
    tot AS (SELECT count(*) AS n_total
            FROM (SELECT DISTINCT user_id, sess FROM fl)),
    ac AS (SELECT event_type, count(*) AS n_with
           FROM fl GROUP BY 1)
    SELECT pr.ante, pr.cons,
           CAST(pr.n_sessions AS BIGINT) AS n_sessions,
           round(pr.n_sessions / CAST(t.n_total AS DOUBLE), 6) AS support,
           round(pr.n_sessions / CAST(a.n_with AS DOUBLE), 6)
               AS confidence,
           round(pr.n_sessions * CAST(t.n_total AS DOUBLE)
                 / (a.n_with * CAST(c.n_with AS DOUBLE)), 6) AS lift
    FROM pr
    JOIN ac a ON a.event_type = pr.ante
    JOIN ac c ON c.event_type = pr.cons
    CROSS JOIN tot t
    ORDER BY pr.n_sessions DESC, pr.ante, pr.cons LIMIT 20
    """,
)
def q_seq_patterns(spark, sf_dir):
    """Gapped sequential patterns (the 2-step PrefixSpan core): in
    how many sessions does type A occur strictly BEFORE type B —
    adjacency not required, once per session — with support,
    confidence and lift against the per-type session priors.
    Complements q_path_analysis (contiguous trigrams) and q_markov
    (one-step transitions) with the order-only signal funnel design
    actually needs ('do viewers eventually purchase?'), immune to
    interleaved noise events.

    Exactness: each (session, type) keeps its FIRST occurrence as an
    integer key (ts*100 + id%100 — strict total order within a
    session), pattern counts are session counts (DISTINCT by
    construction — one first-occurrence row per type), and the
    metrics are single divisions.  Scale: the sessionize window is
    per-user; the before-join runs on the (session, type) table —
    |types| rows per session, so fan-out is type-bounded like
    q_apriori's baskets; priors join broadcast."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    wu = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(wu)
    s = ev.withColumn(
        "sess",
        F.sum(
            F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
        ).over(wu.rowsBetween(W.unboundedPreceding, 0)),
    )
    fl = s.groupBy("user_id", "sess", "event_type").agg(
        F.min(F.col("ts_us") * 100 + F.col("event_id") % 100).alias(
            "first_k"
        )
    )
    b = fl.select(
        "user_id", "sess",
        F.col("event_type").alias("cons"),
        F.col("first_k").alias("k2"),
    )
    pr = (
        fl.join(b, ["user_id", "sess"])
        .filter(
            (F.col("event_type") != F.col("cons"))
            & (F.col("first_k") < F.col("k2"))
        )
        .groupBy(F.col("event_type").alias("ante"), "cons")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    tot = fl.select("user_id", "sess").distinct().agg(
        F.count(F.lit(1)).alias("n_total")
    )
    ac = fl.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_with"))
    c = F.col
    return (
        pr.join(
            F.broadcast(
                ac.select(c("event_type").alias("ante"),
                          c("n_with").alias("n_a"))
            ),
            "ante",
        )
        .join(
            F.broadcast(
                ac.select(c("event_type").alias("cons"),
                          c("n_with").alias("n_c"))
            ),
            "cons",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "ante", "cons",
            c("n_sessions").cast("long").alias("n_sessions"),
            F.round(c("n_sessions") / c("n_total").cast("double"), 6)
            .alias("support"),
            F.round(c("n_sessions") / c("n_a").cast("double"), 6)
            .alias("confidence"),
            F.round(
                c("n_sessions") * c("n_total").cast("double")
                / (c("n_a") * c("n_c").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_sessions"), "ante", "cons")
        .limit(20)
    )


_BURST_SQL = """
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
      FROM events GROUP BY 1, 2),
    bnd AS (SELECT min(day) AS d0,
                   datediff('day', min(day), max(day)) AS span FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    ser AS (SELECT t.event_type, g.x + 1 AS t,
                   CAST(coalesce(d.y, 0) AS DOUBLE) AS y
            FROM types t
            CROSS JOIN (SELECT unnest(generate_series(0,
                               (SELECT span FROM bnd))) AS x) g
            LEFT JOIN d ON d.event_type = t.event_type
                       AND d.day = (SELECT d0 FROM bnd) + INTERVAL (g.x) DAY),
    nn AS (SELECT event_type, count(*) AS n, sum(y) / count(*) AS r0
           FROM ser GROUP BY 1),
    em AS (SELECT s.event_type, s.t,
                  s.y * ln(nn.r0) - nn.r0 AS e0,
                  s.y * ln(2 * nn.r0) - 2 * nn.r0 AS e1
           FROM ser s JOIN nn ON nn.event_type = s.event_type),
    walk(event_type, t, l0, l1, nburst) AS (
      SELECT event_type, t,
             (ln(0.9) + e0) - greatest(ln(0.9) + e0, ln(0.1) + e1),
             (ln(0.1) + e1) - greatest(ln(0.9) + e0, ln(0.1) + e1),
             CASE WHEN exp((ln(0.1) + e1)
                           - greatest(ln(0.9) + e0, ln(0.1) + e1))
                  / (exp((ln(0.9) + e0)
                         - greatest(ln(0.9) + e0, ln(0.1) + e1))
                     + exp((ln(0.1) + e1)
                           - greatest(ln(0.9) + e0, ln(0.1) + e1)))
                  > 0.5 THEN 1 ELSE 0 END
      FROM em WHERE t = 1
      UNION ALL
      SELECT w.event_type, w.t + 1,
             u0 - greatest(u0, u1),
             u1 - greatest(u0, u1),
             w.nburst + CASE WHEN exp(u1 - greatest(u0, u1))
                             / (exp(u0 - greatest(u0, u1))
                                + exp(u1 - greatest(u0, u1)))
                             > 0.5
                        THEN 1 ELSE 0 END
      FROM (SELECT w.event_type, w.t, w.nburst,
                   greatest(w.l0 + ln(0.9), w.l1 + ln(0.1))
                   + ln(1.0 + exp(least(w.l0 + ln(0.9), w.l1 + ln(0.1))
                                  - greatest(w.l0 + ln(0.9),
                                             w.l1 + ln(0.1))))
                   + em.e0 AS u0,
                   greatest(w.l0 + ln(0.1), w.l1 + ln(0.9))
                   + ln(1.0 + exp(least(w.l0 + ln(0.1), w.l1 + ln(0.9))
                                  - greatest(w.l0 + ln(0.1),
                                             w.l1 + ln(0.9))))
                   + em.e1 AS u1
            FROM walk w
            JOIN em ON em.event_type = w.event_type
                   AND em.t = w.t + 1) w)
    SELECT w.event_type AS event_type,
           CAST(nn.n AS BIGINT) AS n_days,
           round(nn.r0, 6) AS rate0,
           CAST(w.nburst AS BIGINT) AS n_burst_days,
           round(exp(w.l1) / (exp(w.l0) + exp(w.l1)), 6) AS p_burst_final
    FROM walk w JOIN nn ON nn.event_type = w.event_type AND w.t = nn.n
    ORDER BY 1
"""


@register("q_burst_hmm", sql=_BURST_SQL)
def q_burst_hmm(spark, sf_dir):
    """Two-state burst detection (the Kleinberg automaton as an HMM
    forward filter): state 0 emits Poisson(r0 = the type's mean daily
    rate), state 1 emits Poisson(2*r0), sticky transitions (0.9 stay
    / 0.1 switch); the filter runs down the zero-filled daily series
    in log space with per-step max normalization and counts the days
    whose filtered burst posterior exceeds 0.5 — the trend/incident
    detector beside q_cusum's cumulative alarm (CUSUM detects one
    level shift; the HMM tracks bursts that switch on AND off).

    Exactness: emissions drop the ln(y!) term common to both states;
    the recurrence is one JVM struct-accumulator fold whose exact
    IEEE operation sequence the oracle's recursive CTE replays
    (the q_holt protocol, extended to a 2-state + counter
    accumulator with log-sum-exp steps).  Scale: one (type, day)
    map-side aggregate; per-type state is 2 doubles + 1 int over a
    calendar-bounded list."""
    from pyspark.sql import Window as W  # noqa: F401 (family convention)

    ev = load_table(spark, sf_dir, "events")
    grid = _daily_grid(ev, y_cast="double")
    ys = F.transform(
        F.sort_array(F.collect_list(F.struct("x", "y"))), lambda st: st["y"]
    )
    agg = grid.groupBy("event_type").agg(
        ys.alias("ys"),
        F.count(F.lit(1)).alias("n"),
        (F.sum("y") / F.count(F.lit(1))).alias("r0"),
    )
    ln = F.log
    l9, l1_ = float(__import__("math").log(0.9)), float(
        __import__("math").log(0.1)
    )

    def lse(a, bb):
        return F.greatest(a, bb) + ln(
            F.lit(1.0) + F.exp(F.least(a, bb) - F.greatest(a, bb))
        )

    def emis(y, r0, burst):
        r = r0 * 2.0 if burst else r0
        return y * ln(r) - r

    y1 = F.element_at(F.col("ys"), 1)
    r0c = F.col("r0")
    u0_1 = F.lit(l9) + emis(y1, r0c, False)
    u1_1 = F.lit(l1_) + emis(y1, r0c, True)
    m1 = F.greatest(u0_1, u1_1)
    p1 = F.exp(u1_1 - m1) / (F.exp(u0_1 - m1) + F.exp(u1_1 - m1))
    init = F.struct(
        (u0_1 - m1).alias("l0"),
        (u1_1 - m1).alias("l1"),
        F.when(p1 > 0.5, 1).otherwise(0).cast("long").alias("nburst"),
    )

    def step(acc, y):
        u0 = lse(acc["l0"] + l9, acc["l1"] + l1_) + emis(y, r0c, False)
        u1 = lse(acc["l0"] + l1_, acc["l1"] + l9) + emis(y, r0c, True)
        m = F.greatest(u0, u1)
        p = F.exp(u1 - m) / (F.exp(u0 - m) + F.exp(u1 - m))
        return F.struct(
            (u0 - m).alias("l0"),
            (u1 - m).alias("l1"),
            (acc["nburst"] + F.when(p > 0.5, 1).otherwise(0)).alias(
                "nburst"
            ),
        )

    st = F.aggregate(
        F.slice(F.col("ys"), 2, F.greatest(F.size("ys") - 1, F.lit(0))),
        init,
        step,
    )
    c = F.col
    return (
        agg.select(
            "event_type",
            c("n").cast("long").alias("n_days"),
            F.round("r0", 6).alias("rate0"),
            st.alias("st"),
        )
        .select(
            "event_type", "n_days", "rate0",
            c("st.nburst").cast("long").alias("n_burst_days"),
            F.round(
                F.exp(c("st.l1"))
                / (F.exp(c("st.l0")) + F.exp(c("st.l1"))),
                6,
            ).alias("p_burst_final"),
        )
        .orderBy("event_type")
    )


@register(
    "q_weighted_median",
    sql="""
    WITH s AS (SELECT l_returnflag,
                      CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                      CAST(l_quantity AS BIGINT) AS w
               FROM lineitem),
    c AS (SELECT l_returnflag, v, w,
                 sum(w) OVER (PARTITION BY l_returnflag
                              ORDER BY v, w
                              ROWS UNBOUNDED PRECEDING) AS cw,
                 sum(w) OVER (PARTITION BY l_returnflag) AS tw
          FROM s),
    m AS (SELECT l_returnflag, min(v) AS med_centi,
                 max(tw) AS total_weight
          FROM c WHERE 2 * cw >= tw GROUP BY 1)
    SELECT l_returnflag,
           round(med_centi / 100.0, 2) AS weighted_median_price,
           CAST(total_weight AS BIGINT) AS total_weight
    FROM m ORDER BY l_returnflag
    """,
)
def q_weighted_median(spark, sf_dir):
    """Weighted median (lower weighted order statistic: the first
    value whose cumulative weight reaches half the total) of extended
    price weighted by quantity, per return flag — the robust center
    for quantity-weighted pricing where a plain median over-counts
    single-unit lines.

    Exactness: centi-int values, integer weights, and the defining
    inequality 2*cw >= tw compares integers.  Scale: the cumulative
    weights partition per flag here; for an UNGROUPED weighted median
    over unbounded rows the same definition rides the two-phase
    global_cumsum (the q_pr_auc shape) — the partitioned form is
    shown because grouped medians are the common case.  One window
    pass, one filter-aggregate."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    wo = W.partitionBy("l_returnflag").orderBy("v", "w")
    c = s.select(
        "l_returnflag", "v", "w",
        F.sum("w").over(wo.rowsBetween(W.unboundedPreceding, 0)).alias("cw"),
        F.sum("w").over(W.partitionBy("l_returnflag")).alias("tw"),
    )
    m = (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("v").alias("med_centi"),
            F.max("tw").alias("total_weight"),
        )
    )
    return m.select(
        "l_returnflag",
        F.round(F.col("med_centi") / 100.0, 2).alias(
            "weighted_median_price"
        ),
        F.col("total_weight").cast("long").alias("total_weight"),
    ).orderBy("l_returnflag")


@register(
    "q_mann_kendall",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
               FROM events GROUP BY 1, 2),
    p AS (SELECT a.event_type,
                 sum(CASE WHEN b.y > a.y THEN 1
                          WHEN b.y < a.y THEN -1 ELSE 0 END) AS s,
                 count(*) AS n_pairs
          FROM d a JOIN d b ON a.event_type = b.event_type
                           AND a.day < b.day
          GROUP BY 1),
    tie AS (SELECT event_type, sum(t * (t - 1) * (2 * t + 5)) AS tsum
            FROM (SELECT event_type, y, count(*) AS t
                  FROM d GROUP BY 1, 2)
            GROUP BY 1),
    nn AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1)
    SELECT p.event_type,
           CAST(nn.n AS BIGINT) AS n_days,
           CAST(p.s AS BIGINT) AS s_statistic,
           round((p.s - CASE WHEN p.s > 0 THEN 1
                             WHEN p.s < 0 THEN -1 ELSE 0 END)
                 / sqrt((nn.n * (nn.n - 1.0) * (2 * nn.n + 5)
                         - coalesce(tie.tsum, 0)) / 18.0), 6) AS z
    FROM p JOIN nn USING (event_type)
           LEFT JOIN tie USING (event_type)
    ORDER BY p.event_type
    """,
)
def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall monotonic-trend test on the daily count series
    per type: S = sum of pairwise sign(y_j - y_i) for i < j in time,
    tie-corrected normal approximation with continuity correction —
    the nonparametric is-it-trending gate beside q_trend_ols's slope
    (MK needs no linearity and shrugs off outliers) and q_theilsen's
    robust slope estimate (MK is its significance test — the classic
    pairing).

    Exactness: S and the tie term t(t-1)(2t+5) are exact integer
    sums; z is one fixed formula.  Scale: the O(days^2) pair join is
    calendar-bounded per type; the row-sized work is the (type, day)
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    b = d.select(
        "event_type", F.col("day").alias("day2"), F.col("y").alias("y2")
    )
    p = (
        d.join(b, "event_type")
        .filter(F.col("day") < F.col("day2"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("y2") > F.col("y"), 1)
                .when(F.col("y2") < F.col("y"), -1)
                .otherwise(0)
            ).alias("s"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    tie = (
        d.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tsum")
        )
    )
    nn = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    c = F.col
    cc = F.when(c("s") > 0, 1).when(c("s") < 0, -1).otherwise(0)
    return (
        p.join(nn, "event_type")
        .join(tie, "event_type", "left")
        .select(
            "event_type",
            c("n").cast("long").alias("n_days"),
            c("s").cast("long").alias("s_statistic"),
            F.round(
                (c("s") - cc)
                / F.sqrt(
                    (
                        c("n") * (c("n") - 1.0) * (2 * c("n") + 5)
                        - F.coalesce(c("tsum"), F.lit(0))
                    ) / 18.0
                ),
                6,
            ).alias("z"),
        )
        .orderBy("event_type")
    )


@register(
    "q_runs_test",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, day, y,
                 CAST(row_number() OVER (PARTITION BY event_type
                                         ORDER BY y, day) AS BIGINT) AS rk,
                 CAST(count(*) OVER (PARTITION BY event_type)
                      AS BIGINT) AS n
          FROM d),
    md AS (SELECT event_type,
                  max(CASE WHEN rk = (n + 1) // 2 THEN y END) AS med
           FROM r GROUP BY 1),
    s AS (SELECT d.event_type, d.day,
                 CASE WHEN d.y > md.med THEN 1 ELSE 0 END AS up
          FROM d JOIN md USING (event_type)),
    f AS (SELECT event_type, up,
                 CASE WHEN lag(up) OVER (PARTITION BY event_type
                                         ORDER BY day) IS NULL
                      OR lag(up) OVER (PARTITION BY event_type
                                       ORDER BY day) != up
                 THEN 1 ELSE 0 END AS new_run
          FROM s),
    g AS (SELECT event_type,
                 CAST(sum(new_run) AS BIGINT) AS runs,
                 CAST(sum(up) AS BIGINT) AS n1,
                 CAST(count(*) - sum(up) AS BIGINT) AS n0
          FROM f GROUP BY 1)
    SELECT event_type, runs, n1, n0,
           round((runs - (2.0 * n1 * n0 / (n1 + n0) + 1))
                 / sqrt(2.0 * n1 * n0 * (2.0 * n1 * n0 - n1 - n0)
                        / ((n1 + n0) * (n1 + n0) * (n1 + n0 - 1.0))),
                 6) AS z
    FROM g ORDER BY event_type
    """,
)
def q_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test on the above/below-median daily
    binarization per type: too FEW runs means clumped regimes (the
    q_burst_hmm signal seen nonparametrically), too MANY means
    oscillation; |z| small means the i.i.d. assumption behind naive
    capacity models is at least not laughed out of the room.

    Exactness: the median is the lower order statistic by integer
    rank (no averaging), run/one counts are integers, z one fixed
    formula.  Scale: everything after the (type, day) aggregate is
    calendar-bounded; the rank and lag windows partition per type."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    wr = W.partitionBy("event_type").orderBy("y", "day")
    r = d.select(
        "event_type", "day", "y",
        F.row_number().over(wr).cast("long").alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("event_type"))
        .cast("long").alias("n"),
    )
    md = r.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rk") == F.expr("(n + 1) div 2"), F.col("y"))
        ).alias("med")
    )
    s = d.join(md, "event_type").select(
        "event_type", "day",
        (F.col("y") > F.col("med")).cast("int").alias("up"),
    )
    wd = W.partitionBy("event_type").orderBy("day")
    f = s.select(
        "event_type", "up",
        F.when(
            F.lag("up").over(wd).isNull()
            | (F.lag("up").over(wd) != F.col("up")),
            1,
        ).otherwise(0).alias("new_run"),
    )
    g = f.groupBy("event_type").agg(
        F.sum("new_run").cast("long").alias("runs"),
        F.sum("up").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("up")).cast("long").alias("n0"),
    )
    c = F.col
    mu = 2.0 * c("n1") * c("n0") / (c("n1") + c("n0")) + 1
    var = (
        2.0 * c("n1") * c("n0")
        * (2.0 * c("n1") * c("n0") - c("n1") - c("n0"))
        / (
            (c("n1") + c("n0"))
            * (c("n1") + c("n0"))
            * (c("n1") + c("n0") - 1.0)
        )
    )
    return g.select(
        "event_type", "runs", "n1", "n0",
        F.round((c("runs") - mu) / F.sqrt(var), 6).alias("z"),
    ).orderBy("event_type")


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


@register(
    "q_funnel_windowed",
    sql="""
    WITH v AS (SELECT user_id,
                      min(CASE WHEN event_type = 'view'
                          THEN epoch_us(ts) END) AS t_view
               FROM events GROUP BY 1),
    c AS (SELECT e.user_id,
                 min(CASE WHEN e.event_type = 'click'
                          AND epoch_us(e.ts) >= v.t_view
                          AND epoch_us(e.ts)
                              <= v.t_view + 7 * 86400000000
                     THEN epoch_us(e.ts) END) AS t_click,
                 min(CASE WHEN e.event_type = 'purchase'
                          AND epoch_us(e.ts) >= v.t_view
                          AND epoch_us(e.ts)
                              <= v.t_view + 7 * 86400000000
                     THEN epoch_us(e.ts) END) AS t_buy
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE v.t_view IS NOT NULL
          GROUP BY 1),
    s AS (SELECT count(*) AS step_view,
                 sum(CASE WHEN t_click IS NOT NULL
                     THEN 1 ELSE 0 END) AS step_click,
                 sum(CASE WHEN t_click IS NOT NULL
                          AND t_buy IS NOT NULL AND t_buy >= t_click
                     THEN 1 ELSE 0 END) AS step_buy
          FROM c)
    SELECT CAST(step_view AS BIGINT) AS step_view,
           CAST(step_click AS BIGINT) AS step_click,
           CAST(step_buy AS BIGINT) AS step_buy,
           round(step_click / CAST(step_view AS DOUBLE), 6)
               AS click_rate_7d,
           round(step_buy / CAST(greatest(step_click, 1) AS DOUBLE), 6)
               AS buy_rate_7d
    FROM s
    """,
)
def q_funnel_windowed(spark, sf_dir):
    """TIME-WINDOWED funnel (the windowFunnel of the OLAP engines):
    view -> click -> purchase where every later step must land within
    7 days of the user's FIRST view and in step order — the product
    metric q_funnel approximates when it ignores the conversion
    window (a purchase a year later is not this campaign's win).

    Exactness: step times are integer microseconds; the window
    predicate and ordering comparisons are integer.  Scale: one
    user-keyed aggregate finds anchors, one user-keyed join + second
    conditional aggregate applies the window — both shuffles on
    user_id, no event-level self-join; at k steps the same two-pass
    shape holds (anchor pass + one conditional pass)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("ts_ns div 1000")
    v = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("t_view")
    ).filter(F.col("t_view").isNotNull())
    win = 7 * 86_400_000_000
    j = ev.join(v, "user_id")
    in_win = (us >= F.col("t_view")) & (us <= F.col("t_view") + win)
    c = j.groupBy("user_id").agg(
        F.min(
            F.when((F.col("event_type") == "click") & in_win, us)
        ).alias("t_click"),
        F.min(
            F.when((F.col("event_type") == "purchase") & in_win, us)
        ).alias("t_buy"),
    )
    s = c.agg(
        F.count(F.lit(1)).alias("step_view"),
        F.sum(F.col("t_click").isNotNull().cast("int")).alias("step_click"),
        F.sum(
            (
                F.col("t_click").isNotNull()
                & F.col("t_buy").isNotNull()
                & (F.col("t_buy") >= F.col("t_click"))
            ).cast("int")
        ).alias("step_buy"),
    )
    cc = F.col
    return s.select(
        cc("step_view").cast("long").alias("step_view"),
        cc("step_click").cast("long").alias("step_click"),
        cc("step_buy").cast("long").alias("step_buy"),
        F.round(
            cc("step_click") / cc("step_view").cast("double"), 6
        ).alias("click_rate_7d"),
        F.round(
            cc("step_buy")
            / F.greatest(cc("step_click"), F.lit(1)).cast("double"),
            6,
        ).alias("buy_rate_7d"),
    )


@register(
    "q_raster_drift",
    sql="""
    WITH li AS (SELECT CASE WHEN CAST(l_shipdate AS DATE)
                            < DATE '1998-07-01' THEN 0 ELSE 1 END
                           AS period,
                       least(greatest(CAST(floor(
                           (l_extendedprice - 900.0)
                           / ((105000.0 - 900.0) / 16)) AS INT), 0), 15)
                           AS bx,
                       least(greatest(CAST(floor(
                           (l_discount - 0.0) / (0.11 / 16)) AS INT),
                           0), 15) AS by
                FROM lineitem),
    c AS (SELECT period, bx, by, count(*) AS n FROM li GROUP BY 1, 2, 3),
    t AS (SELECT period, sum(n) AS tot FROM c GROUP BY 1),
    j AS (SELECT coalesce(a.bx, b.bx) AS bx, coalesce(a.by, b.by) AS by,
                 coalesce(a.n, 0) AS n0, coalesce(b.n, 0) AS n1,
                 t0.tot AS tot0, t1.tot AS tot1
          FROM (SELECT * FROM c WHERE period = 0) a
          FULL OUTER JOIN (SELECT * FROM c WHERE period = 1) b
            ON a.bx = b.bx AND a.by = b.by
          CROSS JOIN (SELECT tot FROM t WHERE period = 0) t0
          CROSS JOIN (SELECT tot FROM t WHERE period = 1) t1),
    p AS (SELECT bx, by, n0, n1,
                 (n0 + 0.5) / (tot0 + 128.0) AS p0,
                 (n1 + 0.5) / (tot1 + 128.0) AS p1
          FROM j),
    k AS (SELECT bx, by, n0, n1,
                 CAST(round((p1 - p0) * ln(p1 / p0) * 1e9) AS BIGINT)
                     AS psi_n
          FROM p),
    s AS (SELECT sum(psi_n) AS psi_total_n FROM k)
    SELECT k.bx, k.by, CAST(k.n0 AS BIGINT) AS n0,
           CAST(k.n1 AS BIGINT) AS n1,
           round(k.psi_n / 1e9, 6) AS psi_cell,
           round(s.psi_total_n / 1e9, 6) AS psi_total
    FROM k CROSS JOIN s
    ORDER BY k.bx, k.by
    """,
)
def q_raster_drift(spark, sf_dir):
    """2-D distribution drift between the two shipping periods on the
    (price, discount) canvas: per-cell PSI contributions with
    Laplace-smoothed cell shares (smoothing keeps cells that exist in
    only one period finite — those ARE the drift) — the raster
    family's answer to 'did the 2-D shape move', where q_psi watches
    one dimension and eyeballing two heatmaps doesn't quantify.

    Exactness: cell counts are integers on the same fixed 16x16
    binning both engines compute; each cell's (p1-p0)*ln(p1/p0) term
    nano-rounds before the sum.  Scale: the shuffle is bounded by the
    canvas (<= 2*16*16 keys) exactly like every raster; the period
    totals join broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    bx = F.least(
        F.greatest(
            F.floor(
                (F.col("l_extendedprice") - 900.0) / ((105000.0 - 900.0) / 16)
            ).cast("int"),
            F.lit(0),
        ),
        F.lit(15),
    )
    by = F.least(
        F.greatest(
            F.floor(F.col("l_discount") / (0.11 / 16)).cast("int"), F.lit(0)
        ),
        F.lit(15),
    )
    s = li.select(
        F.when(
            F.col("l_shipdate").cast("date") < F.lit("1998-07-01"), 0
        ).otherwise(1).alias("period"),
        bx.alias("bx"), by.alias("by"),
    )
    c = s.groupBy("period", "bx", "by").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("period").agg(F.sum("n").alias("tot"))
    a = c.filter(F.col("period") == 0).select(
        "bx", "by", F.col("n").alias("n0")
    )
    b = c.filter(F.col("period") == 1).select(
        F.col("bx").alias("bx1"), F.col("by").alias("by1"),
        F.col("n").alias("n1"),
    )
    t0 = t.filter(F.col("period") == 0).select(F.col("tot").alias("tot0"))
    t1 = t.filter(F.col("period") == 1).select(F.col("tot").alias("tot1"))
    j = (
        a.join(
            b,
            (F.col("bx") == F.col("bx1")) & (F.col("by") == F.col("by1")),
            "full_outer",
        )
        .select(
            F.coalesce("bx", "bx1").alias("bx"),
            F.coalesce("by", "by1").alias("by"),
            F.coalesce("n0", F.lit(0)).alias("n0"),
            F.coalesce("n1", F.lit(0)).alias("n1"),
        )
        .crossJoin(F.broadcast(t0))
        .crossJoin(F.broadcast(t1))
    )
    cc = F.col
    p0 = (cc("n0") + 0.5) / (cc("tot0") + 128.0)
    p1 = (cc("n1") + 0.5) / (cc("tot1") + 128.0)
    k = j.select(
        "bx", "by", "n0", "n1",
        F.round((p1 - p0) * F.log(p1 / p0) * F.lit(1e9))
        .cast("long").alias("psi_n"),
    )
    tot = k.agg(F.sum("psi_n").alias("psi_total_n"))
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            "bx", "by",
            cc("n0").cast("long").alias("n0"),
            cc("n1").cast("long").alias("n1"),
            F.round(cc("psi_n") / 1e9, 6).alias("psi_cell"),
            F.round(cc("psi_total_n") / 1e9, 6).alias("psi_total"),
        )
        .orderBy("bx", "by")
    )


# ------------------------------------------------------------------ round 7
# Experimentation/statistics classics the registry lacked: Welch and
# TOST on the purchase/non-purchase split, mean-based Levene, per-type
# MAD, a Simpson-reversal audit, the Lorenz concentration curve, and
# the two sequential monitors (SPRT, Page-Hinkley) over the calendar
# grid.  All follow the nano/milli-int exactness protocol and every
# oracle replays the identical fixed float formulas.


def _welch_stats(ev):
    """One-pass conditional aggregate of the purchase vs non-purchase
    value split: milli-int sums (the q_bh_fdr protocol) so the six
    sufficient statistics are summation-order-free integers."""
    vm = F.round(F.coalesce("value", F.lit(0)) * 1000).cast("long")
    is1 = F.col("event_type") == "purchase"
    return ev.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(~is1, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(is1, vm).otherwise(F.lit(0))).cast("long").alias("s1"),
        F.sum(F.when(~is1, vm).otherwise(F.lit(0))).cast("long").alias("s2"),
        F.sum(F.when(is1, vm * vm).otherwise(F.lit(0))).cast("long").alias("q1"),
        F.sum(F.when(~is1, vm * vm).otherwise(F.lit(0))).cast("long").alias("q2"),
    )


def _welch_moments():
    """The (m1, m2, v1, v2) column expressions over _welch_stats'
    six integer sufficient statistics — ONE definition shared by
    q_welch and q_tost so the milli-int variance formula cannot
    drift between them (it must mirror _WELCH_CTE's `f` CTE
    term-for-term).

    Degenerate-group guard (ADVICE r7): a group with n < 2 has no
    sample variance and n = 0 has no mean — emit NULL instead of a
    div-by-zero NaN/inf (NaN-vs-NULL would diverge between engines;
    NULL propagates identically through +,-,*,/ and the A-S
    polynomial on both)."""
    c = F.col
    m1 = F.when(c("n1") > 0, c("s1") / (c("n1") * 1000.0))
    m2 = F.when(c("n2") > 0, c("s2") / (c("n2") * 1000.0))
    v1 = F.when(
        c("n1") > 1,
        ((c("q1") - c("s1") * (c("s1") / c("n1").cast("double"))) / (c("n1") - 1)) / F.lit(1e6),
    )
    v2 = F.when(
        c("n2") > 1,
        ((c("q2") - c("s2") * (c("s2") / c("n2").cast("double"))) / (c("n2") - 1)) / F.lit(1e6),
    )
    return m1, m2, v1, v2


_WELCH_CTE = """
    v AS (SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
                 CAST(round(coalesce(value, 0) * 1000) AS BIGINT) AS vm
          FROM events),
    w AS (SELECT
            CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
            CAST(sum(CASE WHEN grp = 1 THEN vm ELSE 0 END) AS BIGINT) AS s1,
            CAST(sum(CASE WHEN grp = 0 THEN vm ELSE 0 END) AS BIGINT) AS s2,
            CAST(sum(CASE WHEN grp = 1 THEN vm * vm ELSE 0 END) AS BIGINT) AS q1,
            CAST(sum(CASE WHEN grp = 0 THEN vm * vm ELSE 0 END) AS BIGINT) AS q2
          FROM v),
    f AS (SELECT n1, n2,
                 CASE WHEN n1 > 0 THEN s1 / (n1 * 1000.0) END AS m1,
                 CASE WHEN n2 > 0 THEN s2 / (n2 * 1000.0) END AS m2,
                 CASE WHEN n1 > 1 THEN
                   ((q1 - s1 * (s1 / CAST(n1 AS DOUBLE))) / (n1 - 1)) / 1e6
                 END AS v1,
                 CASE WHEN n2 > 1 THEN
                   ((q2 - s2 * (s2 / CAST(n2 AS DOUBLE))) / (n2 - 1)) / 1e6
                 END AS v2
          FROM w)
"""


@register(
    "q_welch",
    sql=f"""
    WITH {_WELCH_CTE}
    SELECT n1, n2,
           round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t,
           round(((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2))
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)), 4) AS df,
           {_as_p_sql("((m1 - m2) / sqrt(v1 / n1 + v2 / n2))")} AS p
    FROM f
    """,
)
def q_welch(spark, sf_dir):
    """Welch's unequal-variance t-test of purchase vs non-purchase
    event values, with the Welch-Satterthwaite degrees of freedom —
    the default two-sample mean test of any experimentation stack
    (Student's equal-variance form is the anti-pattern at scale).

    Shape: ONE conditional aggregate over the scan (six integer
    sufficient statistics), then a 1-row closed form.  Exactness:
    milli-int value sums; t, df, and the A-S polynomial p are fixed
    float formulas over those integers, identical on both engines."""
    ev = load_table(spark, sf_dir, "events")
    c = F.col
    m1, m2, v1, v2 = _welch_moments()
    se2 = v1 / c("n1") + v2 / c("n2")
    t = (m1 - m2) / F.sqrt(se2)
    df = (se2 * se2) / (
        (v1 / c("n1")) * (v1 / c("n1")) / (c("n1") - 1)
        + (v2 / c("n2")) * (v2 / c("n2")) / (c("n2") - 1)
    )
    return _welch_stats(ev).select(
        "n1", "n2",
        F.round(m1 - m2, 6).alias("mean_diff"),
        F.round(t, 6).alias("t"),
        F.round(df, 4).alias("df"),
        _as_p_col(t).alias("p"),
    )


@register(
    "q_tost",
    sql=f"""
    WITH {_WELCH_CTE},
    e AS (SELECT n1, n2, m1, m2, sqrt(v1 / n1 + v2 / n2) AS se FROM f)
    SELECT n1, n2,
           round(m1 - m2, 6) AS mean_diff,
           round(se, 6) AS se,
           round((m1 - m2 + 0.05) / se, 6) AS t_lower,
           round((m1 - m2 - 0.05) / se, 6) AS t_upper,
           CASE WHEN (m1 - m2 + 0.05) / se >= 0
                THEN {_as_p_sql("((m1 - m2 + 0.05) / se)")} / 2
                ELSE 1.0 - {_as_p_sql("((m1 - m2 + 0.05) / se)")} / 2
           END AS p_lower,
           CASE WHEN (m1 - m2 - 0.05) / se <= 0
                THEN {_as_p_sql("((m1 - m2 - 0.05) / se)")} / 2
                ELSE 1.0 - {_as_p_sql("((m1 - m2 - 0.05) / se)")} / 2
           END AS p_upper,
           CAST((m1 - m2 + 0.05) / se > 1.6448536269514722
                AND (m1 - m2 - 0.05) / se < -1.6448536269514722
                AS INT) AS equivalent
    FROM e
    """,
)
def q_tost(spark, sf_dir):
    """Equivalence test (TOST, Schuirmann '87) on the same purchase /
    non-purchase split with margin ±0.05: two one-sided z-tests —
    H0 "the difference is OUTSIDE the margin" is rejected only when
    BOTH one-sided statistics clear the 5% normal critical value
    (1.6448...).  The ship-it test of A/B platforms: "no difference
    detected" (Welch p > .05) is NOT "equivalent"; TOST is.

    Same six integer sufficient statistics as q_welch (one scan, one
    closed form); the critical value is a shared literal, so the
    equivalent flag is integer-identical across engines.

    p_lower / p_upper are ONE-SIDED tail probabilities (ADVICE r7 —
    the earlier two-sided erfc labeling made equivalent=1 correspond
    to p < 0.10): upper tail P(Z >= t_lower) for the lower-margin
    test, lower tail P(Z <= t_upper) for the upper one, so
    equivalent = 1 iff both p's < 0.05.  Each is the A-S two-sided
    polynomial halved, reflected through 1 - p/2 when the statistic
    sits on the non-rejection side — all IEEE-exact ops over the
    identically-rounded two-sided value, so cross-engine exact."""
    ev = load_table(spark, sf_dir, "events")
    c = F.col
    m1, m2, v1, v2 = _welch_moments()
    se = F.sqrt(v1 / c("n1") + v2 / c("n2"))
    tl = (m1 - m2 + 0.05) / se
    tu = (m1 - m2 - 0.05) / se
    zc = F.lit(1.6448536269514722)
    p_lo = F.when(tl >= 0, _as_p_col(tl) / 2).otherwise(
        F.lit(1.0) - _as_p_col(tl) / 2
    )
    p_up = F.when(tu <= 0, _as_p_col(tu) / 2).otherwise(
        F.lit(1.0) - _as_p_col(tu) / 2
    )
    return _welch_stats(ev).select(
        "n1", "n2",
        F.round(m1 - m2, 6).alias("mean_diff"),
        F.round(se, 6).alias("se"),
        F.round(tl, 6).alias("t_lower"),
        F.round(tu, 6).alias("t_upper"),
        p_lo.alias("p_lower"),
        p_up.alias("p_upper"),
        ((tl > zc) & (tu < -zc)).cast("int").alias("equivalent"),
    )


@register(
    "q_levene",
    sql="""
    WITH v AS (SELECT event_type,
                      CAST(round(coalesce(value, 0) * 1000) AS BIGINT) AS vm
               FROM events),
    g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(vm) AS BIGINT) AS s
          FROM v GROUP BY 1),
    z AS (SELECT v.event_type,
                 CAST(round(abs(v.vm / 1000.0 - g.s / (g.n * 1000.0))
                            * 1e9) AS BIGINT) AS zn,
                 CAST(round(abs(v.vm / 1000.0 - g.s / (g.n * 1000.0))
                            * abs(v.vm / 1000.0 - g.s / (g.n * 1000.0))
                            * 1e9) AS BIGINT) AS zzn
          FROM v JOIN g USING (event_type)),
    gz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(zn) AS BIGINT) AS sz,
                  CAST(sum(zzn) AS BIGINT) AS szz
           FROM z GROUP BY 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nt,
                 CAST(sum(sz) AS BIGINT) AS szt
          FROM gz),
    parts AS (SELECT
        CAST(sum(CAST(round(gz.n * (gz.sz / (gz.n * 1e9) - t.szt / (t.nt * 1e9))
                            * (gz.sz / (gz.n * 1e9) - t.szt / (t.nt * 1e9))
                            * 1e9) AS BIGINT)) AS BIGINT) AS num_n,
        CAST(sum(CAST(round((gz.szz / 1e9
                             - gz.n * (gz.sz / (gz.n * 1e9))
                                    * (gz.sz / (gz.n * 1e9))) * 1e9)
                      AS BIGINT)) AS BIGINT) AS den_n
      FROM gz CROSS JOIN t)
    SELECT t.k, t.nt AS n,
           round((CAST(t.nt - t.k AS DOUBLE) / (t.k - 1))
                 * (parts.num_n / CAST(parts.den_n AS DOUBLE)), 6) AS w
    FROM t CROSS JOIN parts
    """,
)
def q_levene(spark, sf_dir):
    """Levene's test statistic (mean-centered form) for homogeneity
    of value variance across event types — the guard every pooled-
    variance analysis should run first (Welch exists precisely
    because this test usually fails in the wild).

    Two scans: group means from milli-int sums (k-row broadcast
    back), then absolute deviations nano-rounded PER ROW before the
    group sums — both cross-row sums are integer, so W is one fixed
    float formula over integers on both engines."""
    ev = load_table(spark, sf_dir, "events")
    vm = F.round(F.coalesce("value", F.lit(0)) * 1000).cast("long")
    v = ev.select("event_type", vm.alias("vm"))
    g = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("vm").cast("long").alias("s"),
    )
    zdev = F.abs(F.col("vm") / 1000.0 - F.col("s") / (F.col("n") * 1000.0))
    z = v.join(F.broadcast(g), "event_type").select(
        "event_type",
        F.round(zdev * 1e9).cast("long").alias("zn"),
        F.round(zdev * zdev * 1e9).cast("long").alias("zzn"),
    )
    gz = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("zn").cast("long").alias("sz"),
        F.sum("zzn").cast("long").alias("szz"),
    )
    t = gz.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nt"),
        F.sum("sz").cast("long").alias("szt"),
    )
    c = F.col
    zb_i = c("sz") / (c("n") * 1e9)
    zb = c("szt") / (c("nt") * 1e9)
    parts = gz.crossJoin(F.broadcast(t)).agg(
        F.sum(
            F.round(c("n") * (zb_i - zb) * (zb_i - zb) * 1e9).cast("long")
        ).cast("long").alias("num_n"),
        F.sum(
            F.round((c("szz") / 1e9 - c("n") * zb_i * zb_i) * 1e9).cast("long")
        ).cast("long").alias("den_n"),
    )
    return t.crossJoin(F.broadcast(parts)).select(
        "k",
        c("nt").alias("n"),
        F.round(
            ((c("nt") - c("k")).cast("double") / (c("k") - 1))
            * (c("num_n") / c("den_n").cast("double")),
            6,
        ).alias("w"),
    )


@register(
    "q_mad",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    a AS (SELECT event_type, list_sort(list(y)) AS ys,
                 CAST(count(*) AS BIGINT) AS n
          FROM d GROUP BY 1),
    m AS (SELECT event_type, n, ys,
                 ys[CAST((n + 1) // 2 AS INT)] AS med
          FROM a)
    SELECT event_type, n AS n_days, CAST(med AS BIGINT) AS med,
           CAST(list_sort(list_transform(ys, y -> abs(y - med)))
                [CAST((n + 1) // 2 AS INT)] AS BIGINT) AS mad
    FROM m ORDER BY event_type
    """,
)
def q_mad(spark, sf_dir):
    """Median absolute deviation of each type's daily event counts —
    the robust spread estimate behind outlier-day alerting (a spike
    day moves the std but not the MAD; threshold = med ± k·MAD is
    the standard robust band).

    Median convention: LOWER median (element (n+1) div 2 of the
    sorted list) — pure integer selection, no float halving, so both
    engines agree bit-for-bit.  Scale: the only data-sized stage is
    the (type, day) map-side aggregate; each per-type array is
    calendar-bounded."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    a = d.groupBy("event_type").agg(
        F.sort_array(F.collect_list("y")).alias("ys"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    mid = F.floor((F.col("n") + 1) / 2).cast("int")
    med = F.element_at("ys", mid)
    m = a.select("event_type", "n", "ys", med.alias("med"))
    mad = F.element_at(
        F.sort_array(
            F.transform("ys", lambda y: F.abs(y - F.col("med")))
        ),
        mid,
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("med").cast("long").alias("med"),
        mad.cast("long").alias("mad"),
    ).orderBy("event_type")


@register(
    "q_simpson",
    sql="""
    WITH o AS (SELECT o_orderstatus AS segment,
                      CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END AS urgent,
                      CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS big
               FROM orders),
    seg AS (SELECT segment,
                   CAST(sum(urgent) AS BIGINT) AS n_urgent,
                   CAST(sum(1 - urgent) AS BIGINT) AS n_other,
                   CAST(sum(CASE WHEN urgent = 1 THEN big ELSE 0 END)
                        AS BIGINT) AS big_urgent,
                   CAST(sum(CASE WHEN urgent = 0 THEN big ELSE 0 END)
                        AS BIGINT) AS big_other
            FROM o GROUP BY 1
            UNION ALL
            SELECT '__pooled',
                   CAST(sum(urgent) AS BIGINT),
                   CAST(sum(1 - urgent) AS BIGINT),
                   CAST(sum(CASE WHEN urgent = 1 THEN big ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN urgent = 0 THEN big ELSE 0 END) AS BIGINT)
            FROM o),
    r0 AS (SELECT segment, n_urgent, n_other,
                  CASE WHEN n_urgent > 0
                       THEN big_urgent / CAST(n_urgent AS DOUBLE) END AS ru,
                  CASE WHEN n_other > 0
                       THEN big_other / CAST(n_other AS DOUBLE) END AS ro
           FROM seg),
    r AS (SELECT segment, n_urgent, n_other,
                 round(ru, 6) AS rate_urgent,
                 round(ro, 6) AS rate_other,
                 CASE WHEN ru > ro THEN 1
                      WHEN ru < ro THEN -1
                      ELSE 0 END AS sgn
          FROM r0),
    p AS (SELECT sgn AS pooled_sgn FROM r WHERE segment = '__pooled')
    SELECT r.segment, r.n_urgent, r.n_other, r.rate_urgent, r.rate_other,
           CAST(CASE WHEN r.segment <> '__pooled'
                      AND r.sgn * p.pooled_sgn = -1
                THEN 1 ELSE 0 END AS INT) AS reversed
    FROM r CROSS JOIN p ORDER BY r.segment
    """,
)
def q_simpson(spark, sf_dir):
    """Simpson's-paradox audit: the big-order rate (totalprice >
    150k) of urgent vs non-urgent priorities, pooled AND per order-
    status segment, with a `reversed` flag wherever a segment's
    direction contradicts the pooled direction — the aggregation-
    reversal detector every slice-level metric dashboard needs
    before anyone trusts the pooled number.

    One scan builds both the per-segment and pooled contingency rows
    (grouping-sets shape via unionByName of two aggregates of the
    same narrowed frame); rates are single divisions of exact
    integer counts and the sign comparison is pure integer.

    Degenerate-segment guard (ADVICE r7): a segment with zero urgent
    (or zero non-urgent) orders has no rate — emitted NULL on both
    engines (never a div-by-zero inf/NULL mismatch), and its sgn
    falls through the comparison CASE to 0 ("no direction"), so it
    can never flag a reversal."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("segment"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        .cast("int").alias("urgent"),
        (F.col("o_totalprice") > 150000).cast("int").alias("big"),
    )
    aggs = [
        F.sum("urgent").cast("long").alias("n_urgent"),
        F.sum(1 - F.col("urgent")).cast("long").alias("n_other"),
        F.sum(F.when(F.col("urgent") == 1, F.col("big")).otherwise(0))
        .cast("long").alias("big_urgent"),
        F.sum(F.when(F.col("urgent") == 0, F.col("big")).otherwise(0))
        .cast("long").alias("big_other"),
    ]
    seg = o.groupBy("segment").agg(*aggs).unionByName(
        o.agg(*aggs).select(F.lit("__pooled").alias("segment"), *[
            F.col(c) for c in ("n_urgent", "n_other", "big_urgent", "big_other")
        ])
    )
    ru = F.when(
        F.col("n_urgent") > 0,
        F.col("big_urgent") / F.col("n_urgent").cast("double"),
    )
    ro = F.when(
        F.col("n_other") > 0,
        F.col("big_other") / F.col("n_other").cast("double"),
    )
    r = seg.select(
        "segment", "n_urgent", "n_other",
        F.round(ru, 6).alias("rate_urgent"),
        F.round(ro, 6).alias("rate_other"),
        F.when(ru > ro, 1).when(ru < ro, -1).otherwise(0).alias("sgn"),
    )
    p = r.filter(F.col("segment") == "__pooled").select(
        F.col("sgn").alias("pooled_sgn")
    )
    return (
        r.crossJoin(F.broadcast(p))
        .select(
            "segment", "n_urgent", "n_other", "rate_urgent", "rate_other",
            (
                (F.col("segment") != "__pooled")
                & (F.col("sgn") * F.col("pooled_sgn") == -1)
            ).cast("int").alias("reversed"),
        )
        .orderBy("segment")
    )


@register(
    "q_lorenz",
    sql="""
    WITH r AS (SELECT o_custkey,
                      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS rev
               FROM orders GROUP BY 1),
    t AS (SELECT o_custkey, rev,
                 ntile(10) OVER (ORDER BY rev, o_custkey) AS decile
          FROM r),
    g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
                 CAST(sum(rev) AS BIGINT) AS rev_cents
          FROM t GROUP BY 1),
    tot AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS grand FROM g)
    SELECT CAST(decile AS INT) AS decile, n_cust, rev_cents,
           round(sum(rev_cents) OVER (ORDER BY decile)
                 / CAST(grand AS DOUBLE), 6) AS cum_share
    FROM g CROSS JOIN tot ORDER BY decile
    """,
)
def q_lorenz(spark, sf_dir):
    """Lorenz concentration curve of customer revenue: customers in
    ascending-revenue deciles (exact ntile) with each decile's
    cumulative share of total revenue — the concentration view
    behind q_gini's single number ("the top decile carries 40% of
    revenue" is this curve's last two points).

    The decile assignment rides the two-phase value-cut global_ntile
    (bit-identical to ntile(10) OVER (ORDER BY rev, custkey) at any
    cardinality, no data-sized single-partition stage); the cumsum
    over the 10 decile rows is a broadcast triangle join, so the plan
    has NO single-partition window at all.  Revenue is exact integer
    cents."""
    from shadems_spark.operators.profile import global_ntile

    o = load_table(spark, sf_dir, "orders")
    r = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long").alias("rev")
    )
    t = global_ntile(r, 10, ["rev", "o_custkey"], "decile")
    g = t.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("rev").cast("long").alias("rev_cents"),
    )
    tot = g.agg(F.sum("rev_cents").cast("long").alias("grand"))
    # cumulative share over the 10 decile rows as a broadcast triangle
    # join (b.decile <= a.decile) instead of an empty-partition-spec
    # window — same values, no single-partition WindowExec, no
    # allowlist entry, no WARN line in driver tails.
    cum = (
        g.alias("a")
        .join(
            F.broadcast(g.select(
                F.col("decile").alias("bd"), F.col("rev_cents").alias("brc")
            )),
            F.col("bd") <= F.col("a.decile"),
        )
        .groupBy("a.decile", "a.n_cust", "a.rev_cents")
        .agg(F.sum("brc").cast("long").alias("crc"))
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_cust", "rev_cents",
            F.round(F.col("crc") / F.col("grand").cast("double"), 6)
            .alias("cum_share"),
        )
        .orderBy("decile")
    )


#: SPRT literals (H0: the type is p0 = 15% of daily traffic; H1: 25%),
#: nano-int logs precomputed in Python so BOTH engines fold pure
#: integers: per-success ln(p1/p0), per-failure ln((1-p1)/(1-p0)),
#: and the Wald boundaries ln(19), ln(1/19) at alpha = beta = 0.05.
_SPRT_LA = 510825624
_SPRT_LB = -125163143
_SPRT_UP = 2944438979
_SPRT_DN = -2944438979


@register(
    "q_sprt",
    sql=f"""
    WITH d AS (SELECT CAST(ts AS DATE) AS day, event_type,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    n AS (SELECT day, CAST(sum(y) AS BIGINT) AS n FROM d GROUP BY 1),
    s AS (SELECT d.event_type, d.day, d.y, n.n,
                 CAST(d.y * {_SPRT_LA} + (n.n - d.y) * ({_SPRT_LB})
                      AS BIGINT) AS inc
          FROM d JOIN n USING (day)),
    c AS (SELECT event_type, day,
                 CAST(sum(inc) OVER (PARTITION BY event_type ORDER BY day)
                      AS BIGINT) AS cum,
                 row_number() OVER (PARTITION BY event_type ORDER BY day)
                     AS rn
          FROM s),
    f AS (SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_days,
                 CAST(max(CASE WHEN rn = (SELECT max(rn) FROM c c2
                                          WHERE c2.event_type = c.event_type)
                               THEN cum END) AS BIGINT) AS cum_final,
                 min(CASE WHEN cum >= {_SPRT_UP} THEN rn END) AS up_rn,
                 min(CASE WHEN cum <= {_SPRT_DN} THEN rn END) AS dn_rn
          FROM c GROUP BY event_type)
    SELECT event_type, n_days,
           round(cum_final / 1e9, 6) AS llr,
           CAST(least(coalesce(up_rn, 1 << 30), coalesce(dn_rn, 1 << 30))
                AS BIGINT) AS first_cross,
           CASE WHEN up_rn IS NOT NULL
                     AND (dn_rn IS NULL OR up_rn < dn_rn) THEN 'h1'
                WHEN dn_rn IS NOT NULL THEN 'h0'
                ELSE 'continue' END AS decision
    FROM f ORDER BY event_type
    """,
)
def q_sprt(spark, sf_dir):
    """Wald's sequential probability ratio test, one monitor per
    event type: is this type's share of daily traffic p1 = 25%
    (H1) or p0 = 15% (H0)?  Each day contributes a pure-INTEGER
    log-likelihood increment (y·ln(p1/p0) + (n-y)·ln((1-p1)/(1-p0)),
    nano-int literals precomputed off-engine), the cumulative LLR
    rides a per-type calendar-bounded window, and the decision is
    the FIRST Wald-boundary crossing (±ln 19 at α=β=5%) — the
    always-valid sequential monitor that replaces fixed-horizon
    peeking.  first_cross = 2^30 encodes "never crossed".

    Exactness: integer increments, integer cumulative sums, integer
    boundary compares; only the final display divides by 1e9."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    n = d.groupBy("day").agg(F.sum("y").cast("long").alias("n"))
    s = d.join(F.broadcast(n), "day").select(
        "event_type", "day",
        (F.col("y") * _SPRT_LA + (F.col("n") - F.col("y")) * _SPRT_LB)
        .cast("long").alias("inc"),
    )
    w = W.partitionBy("event_type").orderBy("day")
    c = s.select(
        "event_type",
        F.sum("inc").over(w).cast("long").alias("cum"),
        F.row_number().over(w).alias("rn"),
    )
    big = F.lit(1 << 30)
    f = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max_by("cum", "rn").cast("long").alias("cum_final"),
        F.min(F.when(F.col("cum") >= _SPRT_UP, F.col("rn"))).alias("up_rn"),
        F.min(F.when(F.col("cum") <= _SPRT_DN, F.col("rn"))).alias("dn_rn"),
    )
    return f.select(
        "event_type", "n_days",
        F.round(F.col("cum_final") / 1e9, 6).alias("llr"),
        F.least(
            F.coalesce("up_rn", big), F.coalesce("dn_rn", big)
        ).cast("long").alias("first_cross"),
        F.when(
            F.col("up_rn").isNotNull()
            & (F.col("dn_rn").isNull() | (F.col("up_rn") < F.col("dn_rn"))),
            F.lit("h1"),
        )
        .when(F.col("dn_rn").isNotNull(), F.lit("h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    ).orderBy("event_type")


@register(
    "q_page_hinkley",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    a AS (SELECT event_type, list(y ORDER BY day) AS ys,
                 CAST(count(*) AS BIGINT) AS n_days
          FROM d GROUP BY 1),
    f AS (SELECT event_type, n_days,
                 list_reduce(
                   list_prepend([CAST(0 AS BIGINT), 0, 0, 0, 0],
                                list_transform(ys, y -> [y])),
                   (a, x) -> [
                     a[1] + 1,
                     a[2] + x[1],
                     a[3] + CAST(round((x[1] - (a[2] + x[1])
                                        / CAST(a[1] + 1 AS DOUBLE) - 5.0)
                                       * 1e9) AS BIGINT),
                     least(a[4],
                           a[3] + CAST(round((x[1] - (a[2] + x[1])
                                              / CAST(a[1] + 1 AS DOUBLE)
                                              - 5.0) * 1e9) AS BIGINT)),
                     greatest(a[5],
                              (a[3] + CAST(round((x[1] - (a[2] + x[1])
                                                  / CAST(a[1] + 1 AS DOUBLE)
                                                  - 5.0) * 1e9) AS BIGINT))
                              - least(a[4],
                                      a[3] + CAST(round((x[1] - (a[2] + x[1])
                                                         / CAST(a[1] + 1
                                                                AS DOUBLE)
                                                         - 5.0) * 1e9)
                                                  AS BIGINT)))]
                 ) AS st
          FROM a)
    SELECT event_type, n_days,
           round(st[3] / 1e9, 6) AS cum_dev,
           round(st[5] / 1e9, 6) AS ph,
           CAST(CASE WHEN st[5] > 50000000000 THEN 1 ELSE 0 END AS INT)
               AS alarm
    FROM f ORDER BY event_type
    """,
)
def q_page_hinkley(spark, sf_dir):
    """Page-Hinkley upward-drift monitor per event type over daily
    counts: PH_t = max prefix of (cumulative deviation from the
    RUNNING mean, minus tolerance δ=5) minus its running minimum —
    the classic sequential change detector (Page '54) whose state is
    five numbers however long the stream runs (the stateful-
    streaming twin of q_changepoint's offline split).  Alarm at
    PH > λ=50.

    The recurrence needs the running mean INSIDE the fold, so the
    batch form is one calendar-bounded in-plan fold per type (the
    q_holt/q_dtw shape): state [t, Σy, cumdev_n, min_n, ph_n] as a
    5-long array, each deviation nano-rounded from the identical
    fixed float expression before entering the integer state —
    DuckDB replays the fold with the list-of-single-element-lists
    accumulator trick (acc type == element type)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    a = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "y"))),
            lambda s: s["y"],
        ).alias("ys"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    zero = F.lit(0).cast("long")
    init = F.array(zero, zero, zero, zero, zero)

    def step(acc, x):
        e = lambda i: F.element_at(acc, i)
        t1 = e(1) + 1
        s1 = e(2) + x
        devn = F.round(
            (x - s1 / t1.cast("double") - F.lit(5.0)) * 1e9
        ).cast("long")
        cum = e(3) + devn
        mn = F.least(e(4), cum)
        ph = F.greatest(e(5), cum - mn)
        return F.array(t1, s1, cum, mn, ph)

    f = a.select(
        "event_type", "n_days", F.aggregate("ys", init, step).alias("st")
    )
    return f.select(
        "event_type", "n_days",
        F.round(F.element_at("st", 3) / 1e9, 6).alias("cum_dev"),
        F.round(F.element_at("st", 5) / 1e9, 6).alias("ph"),
        (F.element_at("st", 5) > F.lit(50_000_000_000))
        .cast("int").alias("alarm"),
    ).orderBy("event_type")


#: Tukey studentized-range critical value q_{0.05}(k=5, df=inf) — the
#: standard table literal, shared by both engines so the significance
#: flag is integer-identical.
_TUKEY_Q_CRIT = 3.858


@register(
    "q_tukey",
    sql=f"""
    WITH v AS (SELECT event_type,
                      CAST(round(value * 1000) AS BIGINT) AS vm
               FROM events WHERE value IS NOT NULL),
    g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(vm) AS BIGINT) AS s,
                 CAST(sum(vm * vm) AS BIGINT) AS q
          FROM v GROUP BY 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nt,
                 CAST(sum(CAST(round((g.q / 1e6
                                      - g.s * (g.s / CAST(g.n AS DOUBLE))
                                        / 1e6) * 1e9) AS BIGINT))
                      AS BIGINT) AS ssw_n
          FROM g),
    m AS (SELECT k, nt, (ssw_n / 1e9) / (nt - k) AS msw FROM t),
    p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 a.n AS n_a, b.n AS n_b,
                 a.s / (a.n * 1000.0) - b.s / (b.n * 1000.0) AS diff,
                 sqrt((m.msw / 2.0)
                      * (1.0 / a.n + 1.0 / b.n)) AS se
          FROM g a JOIN g b ON a.event_type < b.event_type
          CROSS JOIN m)
    SELECT type_a, type_b, n_a, n_b,
           round(diff, 6) AS mean_diff,
           round(abs(diff) / se, 6) AS q_stat,
           CAST(CASE WHEN abs(diff) / se > {_TUKEY_Q_CRIT}
                THEN 1 ELSE 0 END AS INT) AS significant
    FROM p ORDER BY type_a, type_b
    """,
)
def q_tukey(spark, sf_dir):
    """Tukey-Kramer HSD post-hoc: all C(k,2) pairwise mean
    comparisons of event value across event types, studentized by the
    pooled within-group variance — the multiple-comparison follow-up
    q_anova's omnibus F demands (10 naive t-tests inflate alpha; the
    studentized range controls the familywise rate).  Unequal-n form
    (Kramer '56): SE_ij = sqrt(MSW/2 * (1/n_i + 1/n_j)); flag at the
    standard table literal q_{{.05}}(5, inf) = 3.858.

    ONE scan -> k-row integer group table (the q_anova sufficient
    statistics); MSW from nano-rounded per-group SSW contributions
    (integer cross-group sum, the q_levene protocol); the pairwise
    grid is a broadcast self-join of k rows.  No window, no second
    scan."""
    from shadems_spark.operators.dedup import tracked_persist

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vm = F.round(F.col("value") * 1000).cast("long")
    # the k-row group table feeds MSW, both pair-grid sides — persist
    # so the events scan runs once (per-branch column pruning defeats
    # ReuseExchange, the r6 lesson)
    g = tracked_persist(
        ev.select("event_type", vm.alias("vm")).groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("vm").cast("long").alias("s"),
            F.sum(F.col("vm") * F.col("vm")).cast("long").alias("q"),
        ),
        key="tukey_groups",
    )
    c = F.col
    t = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nt"),
        F.sum(
            F.round(
                (c("q") / 1e6 - c("s") * (c("s") / c("n").cast("double")) / 1e6)
                * 1e9
            ).cast("long")
        ).cast("long").alias("ssw_n"),
    )
    m = t.select((c("ssw_n") / 1e9 / (c("nt") - c("k"))).alias("msw"))
    a = g.select(
        c("event_type").alias("type_a"), c("n").alias("n_a"),
        c("s").alias("s_a"),
    )
    b = g.select(
        c("event_type").alias("type_b"), c("n").alias("n_b"),
        c("s").alias("s_b"),
    )
    diff = c("s_a") / (c("n_a") * 1000.0) - c("s_b") / (c("n_b") * 1000.0)
    se = F.sqrt(
        (c("msw") / 2.0) * (1.0 / c("n_a") + 1.0 / c("n_b"))
    )
    return (
        a.join(F.broadcast(b), c("type_a") < c("type_b"))
        .crossJoin(F.broadcast(m))
        .select(
            "type_a", "type_b", "n_a", "n_b",
            F.round(diff, 6).alias("mean_diff"),
            F.round(F.abs(diff) / se, 6).alias("q_stat"),
            (F.abs(diff) / se > _TUKEY_Q_CRIT).cast("int")
            .alias("significant"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "q_mcnemar",
    sql=f"""
    WITH u AS (SELECT user_id,
                      CAST(max(CASE WHEN event_type = 'purchase'
                                     AND value > 95
                                     AND CAST(ts AS DATE) < DATE '2024-01-16'
                               THEN 1 ELSE 0 END) AS INT) AS p1,
                      CAST(max(CASE WHEN event_type = 'purchase'
                                     AND value > 95
                                     AND CAST(ts AS DATE) >= DATE '2024-01-16'
                               THEN 1 ELSE 0 END) AS INT) AS p2
               FROM events GROUP BY 1),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS b,
                 CAST(sum(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c
          FROM u)
    SELECT n, b, c,
           round(CASE WHEN b + c > 0
                 THEN greatest(abs(b - c) - 1, 0) * greatest(abs(b - c) - 1, 0)
                      / CAST(b + c AS DOUBLE) ELSE 0 END, 6) AS chi2,
           CASE WHEN b + c > 0 THEN
           {{AS_P}}
           ELSE 1.0 END AS p
    FROM s
    """.replace("{AS_P}", _as_p_sql(
        "(sqrt(CASE WHEN b + c > 0 THEN greatest(abs(b - c) - 1, 0)"
        " * greatest(abs(b - c) - 1, 0)"
        " / CAST(b + c AS DOUBLE) ELSE 0 END))"
    )),
)
def q_mcnemar(spark, sf_dir):
    """McNemar's test of paired binary change: did each user's
    HIGH-VALUE purchase behavior (value > 95 — the q_abtest
    conversion; plain purchase is universal in this fixture and
    degenerates to b = c = 0) flip between the two calendar halves
    (Jan 1-15 vs 16-30)?  Only the discordant pairs carry information — b
    (active -> inactive) vs c (inactive -> active) — and the
    continuity-corrected chi2 = (|b-c|-1)^2/(b+c) tests their
    symmetry.  The within-subject companion to q_abtest's
    between-arm z (paired designs kill between-user variance the
    way CUPED's covariate does).

    ONE per-user aggregate (the only data-sized shuffle) -> a 1-row
    integer contingency reduce -> closed form; p is the shared A-S
    normal polynomial at z = sqrt(chi2) (chi2_1 tail identity),
    identical literals both engines; b + c = 0 degenerates to
    chi2 = 0, p = 1 on both."""
    ev = load_table(spark, sf_dir, "events")
    pre = F.col("ts").cast("date") < F.lit("2024-01-16").cast("date")
    is_p = (F.col("event_type") == "purchase") & (F.col("value") > 95)
    u = ev.groupBy("user_id").agg(
        F.max((is_p & pre).cast("int")).alias("p1"),
        F.max((is_p & ~pre).cast("int")).alias("p2"),
    )
    c = F.col
    s = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(((c("p1") == 1) & (c("p2") == 0)).cast("int"))
        .cast("long").alias("b"),
        F.sum(((c("p1") == 0) & (c("p2") == 1)).cast("int"))
        .cast("long").alias("c"),
    )
    # continuity correction clamped at zero (Edwards '48): with
    # b == c > 0 the uncorrected |b-c|-1 = -1 would square to a
    # SPURIOUS 1/(b+c) — evidence of asymmetry from perfectly
    # symmetric discordance.
    d = F.greatest(F.abs(c("b") - c("c")) - 1, F.lit(0))
    chi2 = F.when(
        c("b") + c("c") > 0,
        d * d / (c("b") + c("c")).cast("double"),
    ).otherwise(F.lit(0.0))
    return s.select(
        "n", "b", "c",
        F.round(chi2, 6).alias("chi2"),
        F.when(c("b") + c("c") > 0, _as_p_col(F.sqrt(chi2)))
        .otherwise(F.lit(1.0)).alias("p"),
    )


@register(
    "q_herfindahl",
    sql="""
    WITH r AS (SELECT c.c_nationkey AS nation, o.o_custkey,
                      CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS rev
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               GROUP BY 1, 2),
    t AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_cust,
                 CAST(sum(rev) AS BIGINT) AS tot
          FROM r GROUP BY 1),
    h AS (SELECT r.nation,
                 CAST(sum(CAST(round((r.rev / CAST(t.tot AS DOUBLE))
                                     * (r.rev / CAST(t.tot AS DOUBLE))
                                     * 1e9) AS BIGINT)) AS BIGINT) AS hhi_n,
                 CAST(max(r.rev) AS BIGINT) AS max_rev
          FROM r JOIN t USING (nation) GROUP BY 1)
    SELECT CAST(t.nation AS BIGINT) AS nation, t.n_cust,
           round(h.hhi_n / 1e9, 6) AS hhi,
           round(h.max_rev / CAST(t.tot AS DOUBLE), 6) AS top_share,
           round(1.0 / t.n_cust, 6) AS hhi_floor
    FROM t JOIN h USING (nation) ORDER BY nation
    """,
)
def q_herfindahl(spark, sf_dir):
    """Herfindahl-Hirschman concentration of customer revenue within
    each nation: HHI = sum of squared revenue shares (1/n at perfect
    equality, 1.0 at monopoly) with the top customer's share and the
    1/n floor alongside — the market-concentration single number
    behind q_lorenz's curve and q_gini's coefficient, per segment.

    Revenue is exact integer cents; each customer's squared share is
    nano-rounded BEFORE the per-nation sum (integer cross-row sums),
    nation totals ride one broadcast join back.  Scale: per-(nation,
    customer) aggregate -> per-nation aggregate, both
    map-side-combined; no window, no self-join."""
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nation"),
    )
    from shadems_spark.operators.dedup import tracked_persist

    # the per-(nation, customer) aggregate is the only data-sized
    # stage and feeds BOTH the nation totals and the squared-share
    # sum — persist so the orders scan + join + shuffle run once
    r = tracked_persist(
        o.select("o_custkey",
                 F.round(F.col("o_totalprice") * 100).cast("long").alias("rc"))
        .join(F.broadcast(cust), "o_custkey")
        .groupBy("nation", "o_custkey")
        .agg(F.sum("rc").cast("long").alias("rev")),
        key="hhi_rev",
    )
    t = r.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("rev").cast("long").alias("tot"),
    )
    c = F.col
    share = c("rev") / c("tot").cast("double")
    h = (
        r.join(F.broadcast(t.select("nation", "tot")), "nation")
        .groupBy("nation")
        .agg(
            F.sum(F.round(share * share * 1e9).cast("long"))
            .cast("long").alias("hhi_n"),
            F.max("rev").cast("long").alias("max_rev"),
        )
    )
    return (
        t.join(F.broadcast(h), "nation")
        .select(
            c("nation").cast("long").alias("nation"),
            "n_cust",
            F.round(c("hhi_n") / 1e9, 6).alias("hhi"),
            F.round(c("max_rev") / c("tot").cast("double"), 6)
            .alias("top_share"),
            F.round(F.lit(1.0) / c("n_cust"), 6).alias("hhi_floor"),
        )
        .orderBy("nation")
    )


@register(
    "q_kruskal",
    sql="""
    WITH v AS (SELECT event_type,
                      CAST(round(value * 1000) AS BIGINT) AS vm
               FROM events WHERE value IS NOT NULL),
    gv AS (SELECT event_type, vm, CAST(count(*) AS BIGINT) AS n_gv
           FROM v GROUP BY 1, 2),
    d AS (SELECT vm, CAST(sum(n_gv) AS BIGINT) AS n_v FROM gv GROUP BY 1),
    r AS (SELECT vm, n_v,
                 CAST(coalesce(sum(n_v) OVER (ORDER BY vm
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS cumlt
          FROM d),
    g AS (SELECT gv.event_type,
                 CAST(sum(gv.n_gv) AS BIGINT) AS n_g,
                 CAST(sum(gv.n_gv * (2 * r.cumlt + r.n_v + 1)) AS BIGINT)
                     AS r2_g
          FROM gv JOIN r USING (vm) GROUP BY 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n_g) AS BIGINT) AS n FROM g),
    ties AS (SELECT sum(CAST(n_v AS HUGEINT) * n_v * n_v - n_v) AS tsum
             FROM d),
    h AS (SELECT t.k, t.n,
                 (12.0 / (CAST(t.n AS DOUBLE) * (t.n + 1)))
                 * (SELECT sum((r2_g / 2.0) * (r2_g / 2.0)
                               / CAST(n_g AS DOUBLE)) FROM g)
                 - 3.0 * (t.n + 1) AS h_raw,
                 1.0 - CAST(ties.tsum AS DOUBLE)
                       / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n) AS c
          FROM t CROSS JOIN ties)
    SELECT k, n, round(h_raw, 6) AS h, round(c, 9) AS tie_c,
           CASE WHEN c > 0 THEN round(h_raw / c, 6) END AS h_corrected
    FROM h
    """,
)
def q_kruskal(spark, sf_dir):
    """Kruskal-Wallis rank-based k-group omnibus test of event value
    across event types — the distribution-free companion to q_anova
    (use this when q_levene rejects variance homogeneity or the
    values are heavy-tailed), with the standard tie correction.

    The interesting part is the RANKS: average ranks over N pooled
    values without any data-sized single-partition stage.  Milli-int
    values collapse to a per-distinct-value count table; the
    exclusive prefix count (cumlt) gives every value's average rank
    as (2*cumlt + n_v + 1)/2 — kept DOUBLED so each group's rank sum
    R2_g = sum n_gv*(2*cumlt + n_v + 1) is a pure INTEGER on both
    engines; H and the tie correction are fixed float formulas over
    (R2_g, n_g, N, sum(t^3 - t)).  In Spark the prefix count rides
    the two-phase global_cumsum over the distinct-value table; the
    oracle uses a plain window (DuckDB's engine is welcome to its
    own plan).  The 12/(N(N+1)) constant and the k-row float sum of
    R_g^2/n_g follow the q_anova convention (K-bounded reduce)."""
    from shadems_spark.operators.dedup import tracked_persist
    from shadems_spark.operators.profile import global_cumsum

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vm = F.round(F.col("value") * 1000).cast("long")
    v = ev.select("event_type", vm.alias("vm"))
    # ONE events scan: the (type, value) counts persist and every
    # other table (distinct-value counts, prefix ranks, ties, group
    # sums) derives from the cache
    gv = tracked_persist(
        v.groupBy("event_type", "vm").agg(
            F.count(F.lit(1)).cast("long").alias("n_gv")
        ),
        key="kruskal_gv",
    )
    d = gv.groupBy("vm").agg(F.sum("n_gv").cast("long").alias("n_v"))
    # exclusive prefix count over ascending distinct values: the
    # two-phase scan (no single-partition window at any cardinality)
    r = global_cumsum(d, ["vm"], {"cum": "n_v"}, )
    r = r.select(
        "vm", "n_v",
        (F.col("cum") - F.col("n_v")).cast("long").alias("cumlt"),
    )
    c = F.col
    g = gv.join(r, "vm").groupBy("event_type").agg(
        F.sum("n_gv").cast("long").alias("n_g"),
        F.sum(c("n_gv") * (2 * c("cumlt") + c("n_v") + 1))
        .cast("long").alias("r2_g"),
    )
    t = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum((c("r2_g") / 2.0) * (c("r2_g") / 2.0) / c("n_g").cast("double"))
        .alias("rr"),
    )
    # t^3 - t in DECIMAL(38) on Spark / HUGEINT in the oracle: one
    # modal value past ~2.1M duplicates would wrap a 64-bit cube
    # silently on Spark and error on DuckDB — wide integers keep the
    # sum exact to n_v ~ 4.6e12, then ONE cast to double at the ratio
    ties = d.agg(
        F.sum(
            c("n_v").cast("decimal(38,0)") * c("n_v") * c("n_v") - c("n_v")
        ).alias("tsum")
    )
    h_raw = (
        (F.lit(12.0) / (c("n").cast("double") * (c("n") + 1))) * c("rr")
        - F.lit(3.0) * (c("n") + 1)
    )
    tie_c = F.lit(1.0) - c("tsum").cast("double") / (
        c("n").cast("double") * c("n") * c("n") - c("n")
    )
    return t.crossJoin(F.broadcast(ties)).select(
        "k", "n",
        F.round(h_raw, 6).alias("h"),
        F.round(tie_c, 9).alias("tie_c"),
        # all-tied input makes tie_c exactly 0: no rank information
        # exists, so the corrected statistic is undefined (NULL on
        # both engines), not inf/NaN-divergent
        F.when(tie_c > 0, F.round(h_raw / tie_c, 6)).alias("h_corrected"),
    )


@register(
    "q_shewhart",
    sql="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS s,
                 CAST(sum(y * y) AS BIGINT) AS q
          FROM d GROUP BY 1),
    l AS (SELECT event_type, n, s, q,
                 s / CAST(n AS DOUBLE) AS mu,
                 sqrt((q - s * (s / CAST(n AS DOUBLE))) / (n - 1)) AS sd
          FROM g
          WHERE n > 1 AND q - s * (s / CAST(n AS DOUBLE)) > 0),
    zd AS (SELECT d.event_type, d.day, d.y, l.n, l.mu, l.sd,
                  CAST(round((abs(d.y - l.mu) / l.sd) * 1e9) AS BIGINT)
                      AS zn,
                  CASE WHEN d.y > l.mu + 3.0 * l.sd
                        OR d.y < l.mu - 3.0 * l.sd THEN 1 ELSE 0 END AS viol
           FROM d JOIN l USING (event_type)),
    agg AS (SELECT event_type,
                   CAST(max(n) AS BIGINT) AS n_days,
                   round(max(mu), 6) AS center,
                   round(max(mu + 3.0 * sd), 6) AS ucl,
                   round(max(mu - 3.0 * sd), 6) AS lcl,
                   CAST(sum(viol) AS BIGINT) AS n_violations,
                   coalesce(CAST(max(CASE WHEN viol = 1 THEN day END)
                                 AS VARCHAR), '') AS last_violation_day,
                   CAST(max(zn) AS BIGINT) AS max_zn
            FROM zd GROUP BY 1)
    SELECT agg.event_type, agg.n_days, agg.center, agg.ucl, agg.lcl,
           agg.n_violations, agg.last_violation_day,
           round(agg.max_zn / 1e9, 6) AS max_z,
           CAST(min(zd.day) AS VARCHAR) AS max_z_day
    FROM agg JOIN zd ON zd.event_type = agg.event_type
                    AND zd.zn = agg.max_zn
    GROUP BY 1, 2, 3, 4, 5, 6, 7, 8 ORDER BY agg.event_type
    """,
)
def q_shewhart(spark, sf_dir):
    """Shewhart individuals control chart per event type: center line
    and 3-sigma limits from the daily-count series, with the count
    and latest day of out-of-control points — the SPC classic that
    completes the monitoring family (CUSUM catches small persistent
    shifts, Page-Hinkley drifts, Shewhart single large excursions).

    Exactness: daily counts are integers, the per-type (n, Σy, Σy²)
    sufficient statistics are integers, μ/σ/limits are fixed float
    formulas over them, and each violation flag is the SAME
    float compare on both engines.  Scale: the (type, day) aggregate
    is the only data-sized stage; the limits join back by type
    (broadcast, k rows)."""
    from shadems_spark.operators.dedup import tracked_persist

    ev = load_table(spark, sf_dir, "events")
    # the (type, day) table feeds the limit fit AND the z/violation
    # join-back — persist so the events scan runs once (calendar-
    # bounded cache)
    d = tracked_persist(
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(F.count(F.lit(1)).cast("long").alias("y")),
        key="shewhart_daily",
    )
    c = F.col
    g = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(c("y") * c("y")).cast("long").alias("q"),
    )
    mu = c("s") / c("n").cast("double")
    sd = F.sqrt((c("q") - c("s") * (c("s") / c("n").cast("double"))) / (c("n") - 1))
    # a chart needs a spread estimate: drop types with a single active
    # day or constant counts (sd = 0/0 or 0 — the oracle drops the
    # same rows, and zn below would otherwise NaN/NULL-diverge)
    l = g.filter(
        (c("n") > 1)
        & (c("q") - c("s") * (c("s") / c("n").cast("double")) > 0)
    ).select(
        "event_type", "n", mu.alias("mu"), sd.alias("sd"),
    )
    viol = (c("y") > c("mu") + 3.0 * c("sd")) | (c("y") < c("mu") - 3.0 * c("sd"))
    # per-(type, day) z-score nano-int: max_z / max_z_day are real
    # values at ANY fixture (the violation columns are zero on
    # well-behaved data), so the oracle hash verifies the excursion
    # machinery, not just the limits
    zn = F.round((F.abs(c("y") - c("mu")) / c("sd")) * 1e9).cast("long")
    zd = d.join(F.broadcast(l), "event_type").select(
        "event_type", "day", "y", "n", "mu", "sd",
        zn.alias("zn"), viol.cast("int").alias("viol"),
    )
    agg = zd.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_days"),
        F.round(F.max("mu"), 6).alias("center"),
        F.round(F.max(c("mu") + 3.0 * c("sd")), 6).alias("ucl"),
        F.round(F.max(c("mu") - 3.0 * c("sd")), 6).alias("lcl"),
        F.sum("viol").cast("long").alias("n_violations"),
        F.coalesce(
            F.max(F.when(c("viol") == 1, c("day"))).cast("string"),
            F.lit(""),
        ).alias("last_violation_day"),
        F.max("zn").cast("long").alias("max_zn"),
    )
    return (
        agg.join(
            zd.select("event_type", c("zn").alias("max_zn"), "day"),
            ["event_type", "max_zn"],
        )
        .groupBy(
            "event_type", "n_days", "center", "ucl", "lcl",
            "n_violations", "last_violation_day",
            F.round(c("max_zn") / 1e9, 6).alias("max_z"),
        )
        .agg(F.min("day").cast("string").alias("max_z_day"))
        .orderBy("event_type")
    )


#: EWMA chart constants (Roberts '59; Montgomery SPC ch. 9):
#: smoothing lambda = 0.2, control width L = 2.7, and the derived
#: literals both engines share so every float product is identical:
#: (1-lambda)^2 = 0.64 per-step variance decay, and
#: lambda/(2-lambda) evaluated ONCE in Python so the same double
#: lands in the Column expression and the generated SQL.
_EWMA_L = 2.7
_EWMA_Q = 0.2 / 1.8

#: the fold's repeated sub-expressions (DuckDB text) — z', w' and the
#: time-varying half-width are each spelled once here and textually
#: repeated wherever the state update needs them (the q_page_hinkley
#: convention: list_reduce cannot bind intermediates).
_EWMAC_Z1 = (
    "CAST(round((0.2 * x[1] + 0.8 * (acc[2] / 1e9)) * 1e9) AS BIGINT)"
)
_EWMAC_W1 = "CAST(round(acc[3] * 0.64) AS BIGINT)"
_EWMAC_HW = (
    f"CAST(round(((2.7 * l.sd) * sqrt({_EWMA_Q!r} * (1.0 - "
    f"{_EWMAC_W1} / 1e9))) * 1e9) AS BIGINT)"
)
_EWMAC_VIOL = f"abs({_EWMAC_Z1} - l.mun) > {_EWMAC_HW}"

_EWMAC_SQL = f"""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS s,
                 CAST(sum(y * y) AS BIGINT) AS q
          FROM d GROUP BY 1),
    l AS (SELECT event_type,
                 s / CAST(n AS DOUBLE) AS mu,
                 sqrt((q - s * (s / CAST(n AS DOUBLE))) / (n - 1)) AS sd,
                 CAST(round((s / CAST(n AS DOUBLE)) * 1e9) AS BIGINT) AS mun
          FROM g
          WHERE n > 1 AND q - s * (s / CAST(n AS DOUBLE)) > 0),
    a AS (SELECT event_type, list(y ORDER BY day) AS ys,
                 list(CAST(day AS VARCHAR) ORDER BY day) AS days,
                 CAST(count(*) AS BIGINT) AS n_days
          FROM d GROUP BY 1),
    f AS (SELECT a.event_type, a.n_days, a.days, l.mu, l.sd,
                 list_reduce(
                   list_prepend([CAST(0 AS BIGINT), l.mun,
                                 CAST(1000000000 AS BIGINT),
                                 CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                                 CAST(-1000000000000000000 AS BIGINT)],
                                list_transform(a.ys, y -> [y])),
                   (acc, x) -> [
                     acc[1] + 1,
                     {_EWMAC_Z1},
                     {_EWMAC_W1},
                     acc[4] + CASE WHEN {_EWMAC_VIOL} THEN 1 ELSE 0 END,
                     CASE WHEN {_EWMAC_VIOL} THEN acc[1] + 1 ELSE acc[5] END,
                     greatest(acc[6],
                              abs({_EWMAC_Z1} - l.mun) - {_EWMAC_HW})]
                 ) AS st
          FROM a JOIN l USING (event_type))
    SELECT event_type, n_days,
           round(mu, 6) AS center,
           round(st[2] / 1e9, 6) AS ewma_final,
           round(mu + (2.7 * sd) * sqrt({_EWMA_Q!r}), 6) AS ucl_asym,
           round(mu - (2.7 * sd) * sqrt({_EWMA_Q!r}), 6) AS lcl_asym,
           CAST(st[4] AS BIGINT) AS n_violations,
           CASE WHEN st[5] > 0 THEN days[CAST(st[5] AS INT)]
                ELSE '' END AS last_violation_day,
           round(st[6] / 1e9, 6) AS max_margin
    FROM f ORDER BY event_type
"""


@register("q_ewma_control", sql=_EWMAC_SQL)
def q_ewma_control(spark, sf_dir):
    """EWMA control chart per event type over the ordered daily-count
    series (Roberts '59), with the TIME-VARYING limits
    mu +- L*sigma*sqrt(lambda/(2-lambda) * (1 - (1-lambda)^(2t))) —
    the small-shift monitor that completes the SPC family
    (Shewhart: single large excursions; CUSUM/Page-Hinkley:
    persistent shifts; EWMA: small drifts with a memory knob), and
    the one classical monitor the battery lacked (VERDICT r7 #6).

    Exactness (the q_sprt/q_page_hinkley integer-fold protocol): the
    fold state is six BIGINTs — [t, z_nano, (1-lambda)^(2t)_nano,
    n_violations, last_violation_t, max_margin_nano] — with every
    float step (the EWMA recursion, the 0.64 variance-decay power,
    the half-width incl. its sqrt) nano-rounded through IDENTICAL
    expressions on both engines before entering the state; the
    (1-lambda)^(2t) power is computed INSIDE the fold by repeated
    multiplication, so no engine pow() is ever called.  max_margin
    (max over t of |z_t - mu| - halfwidth_t, usually negative) is the
    always-valued companion the vacuity rule requires of the
    violation columns.  Scale: the (type, day) aggregate is the only
    data-sized stage; each fold is calendar-bounded."""
    from shadems_spark.operators.dedup import tracked_persist

    ev = load_table(spark, sf_dir, "events")
    d = tracked_persist(
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(F.count(F.lit(1)).cast("long").alias("y")),
        key="ewmac_daily",
    )
    c = F.col
    g = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(c("y") * c("y")).cast("long").alias("q"),
    )
    mu = c("s") / c("n").cast("double")
    l = g.filter(
        (c("n") > 1) & (c("q") - c("s") * (c("s") / c("n").cast("double")) > 0)
    ).select(
        "event_type",
        mu.alias("mu"),
        F.sqrt(
            (c("q") - c("s") * (c("s") / c("n").cast("double"))) / (c("n") - 1)
        ).alias("sd"),
        F.round(mu * 1e9).cast("long").alias("mun"),
    )
    a = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "y"))),
            lambda s: s["y"],
        ).alias("ys"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "y"))),
            lambda s: s["day"].cast("string"),
        ).alias("days"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    j = a.join(F.broadcast(l), "event_type")
    zero = F.lit(0).cast("long")
    init = F.array(
        zero,
        c("mun"),
        F.lit(1_000_000_000).cast("long"),
        zero,
        zero,
        F.lit(-1_000_000_000_000_000_000).cast("long"),
    )

    def step(acc, x):
        e = lambda i: F.element_at(acc, i)
        z1 = F.round(
            (F.lit(0.2) * x + F.lit(0.8) * (e(2) / F.lit(1e9))) * F.lit(1e9)
        ).cast("long")
        w1 = F.round(e(3) * F.lit(0.64)).cast("long")
        hw = F.round(
            (
                (F.lit(2.7) * c("sd"))
                * F.sqrt(
                    F.lit(_EWMA_Q) * (F.lit(1.0) - w1 / F.lit(1e9))
                )
            )
            * F.lit(1e9)
        ).cast("long")
        dev = F.abs(z1 - c("mun"))
        viol = dev > hw
        return F.array(
            e(1) + 1,
            z1,
            w1,
            e(4) + viol.cast("long"),
            F.when(viol, e(1) + 1).otherwise(e(5)),
            F.greatest(e(6), dev - hw),
        )

    f = j.select(
        "event_type", "n_days", "days", "mu", "sd",
        F.aggregate("ys", init, step).alias("st"),
    )
    # engine sqrt (IEEE correctly-rounded, same on DuckDB), NOT
    # Python's ** 0.5 (pow-based, not guaranteed identical)
    asym = (F.lit(2.7) * c("sd")) * F.sqrt(F.lit(_EWMA_Q))
    e = lambda i: F.element_at("st", i)
    return f.select(
        "event_type", "n_days",
        F.round("mu", 6).alias("center"),
        F.round(e(2) / 1e9, 6).alias("ewma_final"),
        F.round(c("mu") + asym, 6).alias("ucl_asym"),
        F.round(c("mu") - asym, 6).alias("lcl_asym"),
        e(4).cast("long").alias("n_violations"),
        F.when(e(5) > 0, F.element_at("days", e(5).cast("int")))
        .otherwise(F.lit("")).alias("last_violation_day"),
        F.round(e(6) / 1e9, 6).alias("max_margin"),
    ).orderBy("event_type")


# ------------------------------------------------------------ round 8
# The two statistics shelved in round 7 for lgamma/libm cross-engine
# ulp divergence, now in integer-grid / precomputed-literal designs
# that keep every cross-engine value either a pure integer or one
# shared double (VERDICT r7 #7).

from math import comb as _comb
from math import factorial as _factorial

#: Pascal rows for the Fisher margins, precomputed in Python and
#: embedded as literals in BOTH engines: the weekend/weekday margin
#: of January 2024 days 1-30 is CALENDAR-FIXED at 8/22, and the day
#: count at 30 — so C(8,k), C(22,j), C(30,m) cover every reachable
#: table.  Max entry C(30,15) = 155,117,520 and max pmf numerator
#: C(8,4)*C(22,11) = 4.94e7: every enumeration value, sum and
#: comparison is exact int64 on both engines; the ONLY float is the
#: final numerator/denominator division of two identical integers.
_C8 = [_comb(8, k) for k in range(9)]
_C22 = [_comb(22, k) for k in range(23)]
_C30 = [_comb(30, k) for k in range(31)]


def _sql_arr(xs) -> str:
    return "[" + ", ".join(f"CAST({x} AS BIGINT)" for x in xs) + "]"


_FISHER_SQL = f"""
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(sum(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS cnt
               FROM events GROUP BY 1),
    f AS (SELECT day, cnt,
                 CASE WHEN (datediff('day', DATE '2024-01-01', day) % 7)
                           IN (5, 6) THEN 1 ELSE 0 END AS wk,
                 CASE WHEN cnt * (SELECT count(*) FROM d)
                           > (SELECT sum(cnt) FROM d) THEN 1 ELSE 0 END AS hi
          FROM d),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(wk) AS BIGINT) AS r1,
                 CAST(sum(hi) AS BIGINT) AS c1,
                 CAST(sum(wk * hi) AS BIGINT) AS a
          FROM f),
    e AS (SELECT n, r1, c1, a,
                 {_sql_arr(_C8)} AS c8,
                 {_sql_arr(_C22)} AS c22,
                 {_sql_arr(_C30)} AS c30
          FROM s),
    p AS (SELECT n, r1, c1, a,
                 c8[CAST(a + 1 AS INT)]
                   * c22[CAST(c1 - a + 1 AS INT)] AS nobs,
                 list_transform(
                   generate_series(greatest(0, c1 - 22), least(8, c1)),
                   k -> c8[CAST(k + 1 AS INT)]
                        * c22[CAST(c1 - k + 1 AS INT)]) AS nks,
                 list_transform(
                   generate_series(a, least(8, c1)),
                   k -> c8[CAST(k + 1 AS INT)]
                        * c22[CAST(c1 - k + 1 AS INT)]) AS gks,
                 c30[CAST(c1 + 1 AS INT)] AS denom
          FROM e)
    SELECT CAST(a AS BIGINT) AS a,
           CAST(r1 - a AS BIGINT) AS b,
           CAST(c1 - a AS BIGINT) AS c,
           CAST(n - r1 - c1 + a AS BIGINT) AS d,
           CASE WHEN n = 30 AND r1 = 8 THEN
             round(CAST(list_sum(list_filter(nks, v -> v <= nobs))
                        AS DOUBLE) / denom, 9)
           END AS p_two_sided,
           CASE WHEN n = 30 AND r1 = 8 THEN
             round(CAST(list_sum(gks) AS DOUBLE) / denom, 9)
           END AS p_greater
    FROM p
"""


@register("q_fisher_exact", sql=_FISHER_SQL)
def q_fisher_exact(spark, sf_dir):
    """Fisher's exact test of weekend vs high-purchase-volume days
    (daily purchase count above the 30-day mean), on the 2x2 table
    over January 2024's 30 days — the small-sample independence test
    q_chisq's approximation breaks down on, shelved in r7 for its
    lgamma form and landed here as a PURE-INTEGER enumeration: the
    weekend margin (8/22) and day count (30) are calendar-fixed, so
    the three Pascal rows C(8,.), C(22,.), C(30,.) ship as Python-
    precomputed literals in both engines; every hypergeometric pmf
    numerator C(8,k)*C(22,c1-k) <= 4.94e7 is an exact int64, the
    two-sided p is the "sum of tables with pmf <= observed"
    convention via integer comparisons only, and the single float op
    is one division of two identical integers.  No lgamma, no exp,
    no libm anywhere.  The 'hi' split compares cnt*30 > total —
    integer cross-multiplication, no division.  Guard: p columns are
    NULL unless (n, r1) == (30, 8) — the bound the literal rows
    cover (mirrored in the oracle).

    Scale: one (day)-key conditional aggregate is the only data-sized
    stage; the enumeration runs on a 1-row frame."""
    ev = load_table(spark, sf_dir, "events")
    c = F.col
    d = ev.groupBy(c("ts").cast("date").alias("day")).agg(
        F.sum((c("event_type") == "purchase").cast("int"))
        .cast("long").alias("cnt")
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("total"),
    )
    wk = (
        F.pmod(F.datediff(c("day"), F.lit("2024-01-01").cast("date")), F.lit(7))
        .isin(5, 6)
    )
    f = d.crossJoin(F.broadcast(tot)).select(
        "n",
        wk.cast("int").alias("wk"),
        (c("cnt") * c("n") > c("total")).cast("int").alias("hi"),
    )
    s = f.groupBy("n").agg(
        F.sum("wk").cast("long").alias("r1"),
        F.sum("hi").cast("long").alias("c1"),
        F.sum(c("wk") * c("hi")).cast("long").alias("a"),
    )
    c8 = F.array(*[F.lit(x).cast("long") for x in _C8])
    c22 = F.array(*[F.lit(x).cast("long") for x in _C22])
    c30 = F.array(*[F.lit(x).cast("long") for x in _C30])
    at = lambda arr, i: F.element_at(arr, i.cast("int"))
    nobs = at(c8, c("a") + 1) * at(c22, c("c1") - c("a") + 1)
    nks = F.transform(
        F.sequence(
            F.greatest(F.lit(0).cast("long"), c("c1") - 22),
            F.least(F.lit(8).cast("long"), c("c1")),
        ),
        lambda k: at(c8, k + 1) * at(c22, c("c1") - k + 1),
    )
    gks = F.transform(
        F.sequence(c("a"), F.least(F.lit(8).cast("long"), c("c1"))),
        lambda k: at(c8, k + 1) * at(c22, c("c1") - k + 1),
    )
    zero = F.lit(0).cast("long")
    lsum = lambda arr: F.aggregate(arr, zero, lambda acc, v: acc + v)
    denom = at(c30, c("c1") + 1)
    ok = (c("n") == 30) & (c("r1") == 8)
    return s.select(
        c("a").alias("a"),
        (c("r1") - c("a")).alias("b"),
        (c("c1") - c("a")).alias("c"),
        (c("n") - c("r1") - c("c1") + c("a")).alias("d"),
        F.when(
            ok,
            F.round(
                lsum(F.filter(nks, lambda v: v <= nobs)).cast("double")
                / denom,
                9,
            ),
        ).alias("p_two_sided"),
        F.when(
            ok, F.round(lsum(gks).cast("double") / denom, 9)
        ).alias("p_greater"),
    )


def _beta_frac(x: int, y: int):
    from fractions import Fraction

    return Fraction(
        _factorial(x - 1) * _factorial(y - 1), _factorial(x + y - 1)
    )


def _p_b_gt_a(aA: int, bA: int, aB: int, bB: int) -> float:
    """P(pB > pA) for pA ~ Beta(aA,bA), pB ~ Beta(aB,bB), all-integer
    parameters — Cook's closed form evaluated in EXACT rational
    arithmetic (python fractions), floated once at the end."""
    return float(
        sum(
            _beta_frac(aA + i, bA + bB)
            / ((bB + i) * _beta_frac(1 + i, bB) * _beta_frac(aA, bA))
            for i in range(aB)
        )
    )


#: n = 7 users per arm (the sf0.001 fixture has exactly 8 even / 7
#: odd users — 7 is the largest cohort reachable at every sf), so
#: the Beta(k+1, 7-k+1) posterior pair has only 8 x 8 reachable
#: states: the WHOLE answer surface P(pB > pA) is precomputed in
#: Python as exact rationals and shipped as a 64-row literal lookup
#: in both engines — zero in-engine transcendentals (VERDICT r7 #7's
#: precomputed-literal route).
_BAYES_N = 7
_BAYES_TABLE = [
    (ka, kb, _p_b_gt_a(ka + 1, _BAYES_N - ka + 1, kb + 1, _BAYES_N - kb + 1))
    for ka in range(_BAYES_N + 1)
    for kb in range(_BAYES_N + 1)
]

_BAYES_SQL = f"""
    WITH u AS (SELECT user_id,
                      CAST(user_id % 2 AS INT) AS arm,
                      (user_id * 2654435761) % 4294967296 AS h,
                      CAST(max(CASE WHEN event_type = 'purchase'
                                     AND value > 95
                               THEN 1 ELSE 0 END) AS INT) AS conv
               FROM events GROUP BY 1, 2, 3),
    pick AS (SELECT arm, conv FROM (
               SELECT arm, conv,
                      row_number() OVER (PARTITION BY arm
                                         ORDER BY h, user_id) AS rk
               FROM u)
             WHERE rk <= {_BAYES_N}),
    k AS (SELECT
            CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
                AS ka,
            CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
                AS kb,
            CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
            CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
          FROM pick),
    t (tka, tkb, p) AS (VALUES {", ".join(
        f"({ka}, {kb}, {p!r})" for ka, kb, p in _BAYES_TABLE)})
    SELECT k.na AS n_a, k.nb AS n_b, k.ka, k.kb,
           round((k.ka + 1) / 9.0, 6) AS post_mean_a,
           round((k.kb + 1) / 9.0, 6) AS post_mean_b,
           CASE WHEN k.na = {_BAYES_N} AND k.nb = {_BAYES_N}
                THEN round(t.p, 6) END AS p_b_beats_a
    FROM k JOIN t ON t.tka = k.ka AND t.tkb = k.kb
"""


@register("q_bayes_ab", sql=_BAYES_SQL)
def q_bayes_ab(spark, sf_dir):
    """Bayesian A/B conversion comparison P(pB > pA) under uniform
    Beta(1,1) priors, on a deterministic 7-user-per-arm cohort (arm =
    user-id parity, cohort = the 7 smallest (knuth-hash, id) users
    per arm; conversion = any HIGH-VALUE purchase, value > 95 — the
    q_abtest/q_mcnemar convention; plain purchase is universal in
    this fixture and would pin ka = kb = n) — shelved in r7
    because Cook's closed form needs lgamma, landed here via the
    precomputed-literal route: with n = 7 fixed, only 64 (ka, kb)
    posterior states exist, so the whole P surface is computed in
    Python with EXACT rational arithmetic (fractions; validated
    against Monte-Carlo in tests/test_stats_replay.py) and shipped
    as a 64-row literal lookup — both engines join the identical
    literals, no in-engine transcendental at all.  p is NULL if
    either arm's cohort is short (n != 7; mirrored guard).

    Scale: one per-user aggregate; the cohort pick is a 2-partition
    rank over the distinct-user table; the lookup is a broadcast of
    64 literal rows."""
    ev = load_table(spark, sf_dir, "events")
    c = F.col
    u = ev.groupBy("user_id").agg(
        F.max(
            ((c("event_type") == "purchase") & (c("value") > 95)).cast("int")
        ).alias("conv")
    ).select(
        "user_id", "conv",
        (c("user_id") % 2).cast("int").alias("arm"),
        F.pmod(c("user_id") * F.lit(2654435761), F.lit(4294967296)).alias("h"),
    )
    w = Window.partitionBy("arm").orderBy("h", "user_id")
    pick = u.withColumn("rk", F.row_number().over(w)).filter(
        c("rk") <= _BAYES_N
    )
    k = pick.agg(
        F.sum(F.when(c("arm") == 0, c("conv")).otherwise(0))
        .cast("long").alias("ka"),
        F.sum(F.when(c("arm") == 1, c("conv")).otherwise(0))
        .cast("long").alias("kb"),
        F.sum((c("arm") == 0).cast("int")).cast("long").alias("na"),
        F.sum((c("arm") == 1).cast("int")).cast("long").alias("nb"),
    )
    t = ev.sparkSession.createDataFrame(
        _BAYES_TABLE, "tka long, tkb long, p double"
    )
    ok = (c("na") == _BAYES_N) & (c("nb") == _BAYES_N)
    return (
        k.join(
            F.broadcast(t), (c("tka") == c("ka")) & (c("tkb") == c("kb"))
        )
        .select(
            c("na").alias("n_a"),
            c("nb").alias("n_b"),
            "ka", "kb",
            F.round((c("ka") + 1) / 9.0, 6).alias("post_mean_a"),
            F.round((c("kb") + 1) / 9.0, 6).alias("post_mean_b"),
            F.when(ok, F.round(c("p"), 6)).alias("p_b_beats_a"),
        )
    )


@register(
    "q_mood_median",
    sql="""
    WITH v AS (SELECT event_type,
                      CAST(round(value * 1000) AS BIGINT) AS vm
               FROM events WHERE value IS NOT NULL),
    gv AS (SELECT event_type, vm, CAST(count(*) AS BIGINT) AS n_gv
           FROM v GROUP BY 1, 2),
    d AS (SELECT vm, CAST(sum(n_gv) AS BIGINT) AS n_v FROM gv GROUP BY 1),
    c AS (SELECT vm, CAST(sum(n_v) OVER (ORDER BY vm
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM d),
    t0 AS (SELECT CAST(sum(n_v) AS BIGINT) AS n FROM d),
    m AS (SELECT min(vm) AS med FROM c CROSS JOIN t0 WHERE 2 * cum >= n),
    g AS (SELECT gv.event_type,
                 CAST(sum(n_gv) AS BIGINT) AS n_j,
                 CAST(sum(CASE WHEN gv.vm > m.med THEN n_gv ELSE 0 END)
                      AS BIGINT) AS a_j
          FROM gv CROSS JOIN m GROUP BY 1),
    tt AS (SELECT CAST(count(*) AS BIGINT) AS k,
                  CAST(sum(n_j) AS BIGINT) AS n,
                  CAST(sum(a_j) AS BIGINT) AS a_tot
           FROM g),
    chi AS (SELECT CAST(sum(CAST(round(
               ((g.a_j - g.n_j * (tt.a_tot / CAST(tt.n AS DOUBLE)))
                * (g.a_j - g.n_j * (tt.a_tot / CAST(tt.n AS DOUBLE))))
               / ((g.n_j * (tt.a_tot / CAST(tt.n AS DOUBLE)))
                  * (1.0 - tt.a_tot / CAST(tt.n AS DOUBLE)))
               * 1e9) AS BIGINT)) AS BIGINT) AS chi_n
            FROM g CROSS JOIN tt)
    SELECT g.event_type, g.n_j AS n, g.a_j AS n_above,
           round(g.n_j * (tt.a_tot / CAST(tt.n AS DOUBLE)), 6) AS e_above,
           round(m.med / 1000.0, 6) AS grand_median,
           CASE WHEN tt.a_tot > 0 AND tt.a_tot < tt.n
                THEN round(chi.chi_n / 1e9, 6) END AS chi2,
           CAST(tt.k - 1 AS BIGINT) AS dof
    FROM g CROSS JOIN tt CROSS JOIN m CROSS JOIN chi
    ORDER BY g.event_type
    """,
)
def q_mood_median(spark, sf_dir):
    """Mood's median test across the k event types: does each type's
    value distribution sit above/below the POOLED median equally
    often?  The coarse, outlier-immune k-group location screen
    beside q_kruskal (Mood trades power for total robustness — only
    the side of the median matters, not ranks).

    Above-split convention: strictly-above the LOWER pooled median
    (first value whose cumulative count reaches half — the
    q_weighted_median inequality, pure integer).  Exactness: the
    pooled median rides the distinct-value count table + two-phase
    global_cumsum (no single-partition stage at any cardinality; the
    q_kruskal shape), the 2xk contingency is exact integers, and
    each chi-square term (a_j - n_j p)^2 / (n_j p (1-p)) is
    nano-rounded per group before the integer cross-group sum.
    Degenerate guard: all values on one side of the median (a_tot =
    0 or N) has no dispersion to test — chi2 NULL on both engines.
    Scale: one (type, value)-key aggregate is the only data-sized
    stage."""
    from shadems_spark.operators.dedup import tracked_persist
    from shadems_spark.operators.profile import global_cumsum

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    c = F.col
    vm = F.round(c("value") * 1000).cast("long")
    gv = tracked_persist(
        ev.select("event_type", vm.alias("vm"))
        .groupBy("event_type", "vm")
        .agg(F.count(F.lit(1)).cast("long").alias("n_gv")),
        key="mood_gv",
    )
    d = gv.groupBy("vm").agg(F.sum("n_gv").cast("long").alias("n_v"))
    cum = global_cumsum(d, ["vm"], {"cum": "n_v"})
    t0 = d.agg(F.sum("n_v").cast("long").alias("n"))
    m = (
        cum.crossJoin(F.broadcast(t0))
        .filter(2 * c("cum") >= c("n"))
        .agg(F.min("vm").alias("med"))
    )
    # the k-row contingency table feeds three consumers (totals, the
    # chi2 reduce, the output rows) and carries the whole two-phase
    # median pipeline as lineage — persist so that pipeline runs
    # once, not once per branch (the r6/r7 reuse lesson)
    g = tracked_persist(
        gv.crossJoin(F.broadcast(m))
        .groupBy("event_type")
        .agg(
            F.sum("n_gv").cast("long").alias("n_j"),
            F.sum(F.when(c("vm") > c("med"), c("n_gv")).otherwise(0))
            .cast("long").alias("a_j"),
        ),
        key="mood_groups",
    )
    tt = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_j").cast("long").alias("n"),
        F.sum("a_j").cast("long").alias("a_tot"),
    )
    p = c("a_tot") / c("n").cast("double")
    term = (
        (c("a_j") - c("n_j") * p) * (c("a_j") - c("n_j") * p)
    ) / ((c("n_j") * p) * (F.lit(1.0) - p))
    chi = (
        g.crossJoin(F.broadcast(tt))
        .agg(
            F.sum(F.round(term * 1e9).cast("long"))
            .cast("long").alias("chi_n")
        )
    )
    return (
        g.crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(chi))
        .select(
            "event_type",
            c("n_j").alias("n"),
            c("a_j").alias("n_above"),
            F.round(c("n_j") * p, 6).alias("e_above"),
            F.round(c("med") / 1000.0, 6).alias("grand_median"),
            F.when(
                (c("a_tot") > 0) & (c("a_tot") < c("n")),
                F.round(c("chi_n") / 1e9, 6),
            ).alias("chi2"),
            (c("k") - 1).cast("long").alias("dof"),
        )
        .orderBy("event_type")
    )


@register(
    "q_cochran_q",
    sql="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    f AS (SELECT event_type, CAST(ts AS DATE) AS day
          FROM events WHERE value > 95 GROUP BY 1, 2),
    x AS (SELECT t.event_type, d.day,
                 CASE WHEN f.event_type IS NOT NULL THEN 1 ELSE 0 END AS x
          FROM types t CROSS JOIN days d
          LEFT JOIN f ON f.event_type = t.event_type AND f.day = d.day),
    r AS (SELECT day, CAST(sum(x) AS BIGINT) AS ri FROM x GROUP BY 1),
    cj AS (SELECT event_type, CAST(sum(x) AS BIGINT) AS c_j
           FROM x GROUP BY 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(c_j) AS BIGINT) AS tot,
                 CAST(sum(c_j * c_j) AS BIGINT) AS sc2
          FROM cj),
    rr AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
                  CAST(sum(ri * ri) AS BIGINT) AS sr2
           FROM r)
    SELECT cj.event_type, cj.c_j AS n_active_days,
           rr.n_days, CAST(t.k - 1 AS BIGINT) AS dof,
           CASE WHEN t.k * t.tot - rr.sr2 > 0
                THEN round((t.k - 1)
                           * CAST(t.k * t.sc2 - t.tot * t.tot AS DOUBLE)
                           / (t.k * t.tot - rr.sr2), 6)
           END AS q
    FROM cj CROSS JOIN t CROSS JOIN rr ORDER BY cj.event_type
    """,
)
def q_cochran_q(spark, sf_dir):
    """Cochran's Q test over the zero-filled day x type grid: did the
    k event types have the SAME daily probability of producing a
    high-value event (value > 95, the q_abtest conversion)?  The
    k-treatment repeated-measures test for BINARY outcomes — the
    missing sibling between q_mcnemar (k = 2 paired binary) and
    q_friedman (k-treatment ordinal): blocks are days, treatments
    are types, response is the 0/1 indicator.

    Q = (k-1) * (k*sum C_j^2 - T^2) / (k*T - sum R_i^2) — EVERY term
    is an exact integer (column totals C_j, row totals R_i, grand
    total T), so the statistic is one division of identical integers
    on both engines; no nano ladder needed.  dof = k-1 (no p: the
    chi-square tail at dof > 1 needs the incomplete gamma — the
    q_friedman convention of emitting the statistic + dof).
    Degenerate guard: denominator sum R_i (k - R_i) = 0 (every day
    all-or-none) -> Q NULL on both engines.  Alias hygiene: the
    types spine renames through a fresh __et before joining the
    flags frame derived from the same parent (_daily_grid's rule).
    Scale: one (type, day) conditional aggregate; the grid is
    types x calendar."""
    ev = load_table(spark, sf_dir, "events")
    c = F.col
    days = ev.select(c("ts").cast("date").alias("day")).distinct()
    types = ev.select(c("event_type").alias("__et")).distinct()
    f = (
        ev.filter(c("value") > 95)
        .groupBy("event_type", c("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    x = (
        types.crossJoin(F.broadcast(days))
        .join(
            f,
            (c("__et") == f["event_type"]) & (days["day"] == f["day"]),
            "left",
        )
        .select(
            c("__et").alias("event_type"),
            days["day"].alias("day"),
            f["__hits"].isNotNull().cast("int").alias("x"),
        )
    )
    from shadems_spark.operators.dedup import tracked_persist

    x = tracked_persist(x, key="cochran_grid")
    r = x.groupBy("day").agg(F.sum("x").cast("long").alias("ri"))
    cj = x.groupBy("event_type").agg(F.sum("x").cast("long").alias("c_j"))
    t = cj.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("c_j").cast("long").alias("tot"),
        F.sum(c("c_j") * c("c_j")).cast("long").alias("sc2"),
    )
    rr = r.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(c("ri") * c("ri")).cast("long").alias("sr2"),
    )
    return (
        cj.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(rr))
        .select(
            "event_type",
            c("c_j").alias("n_active_days"),
            "n_days",
            (c("k") - 1).cast("long").alias("dof"),
            F.when(
                c("k") * c("tot") - c("sr2") > 0,
                F.round(
                    (c("k") - 1)
                    * (c("k") * c("sc2") - c("tot") * c("tot"))
                    .cast("double")
                    / (c("k") * c("tot") - c("sr2")),
                    6,
                ),
            ).alias("q"),
        )
        .orderBy("event_type")
    )


@register(
    "q_theil_entropy",
    sql="""
    WITH r AS (SELECT c.c_nationkey AS nation, o.o_custkey,
                      CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS rev
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               GROUP BY 1, 2),
    g AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_g,
                 CAST(sum(rev) AS BIGINT) AS s_g
          FROM r GROUP BY 1),
    t AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
                 CAST(sum(s_g) AS BIGINT) AS s FROM g),
    w AS (SELECT r.nation,
                 CAST(sum(CAST(round(
                   (r.rev / (g.s_g / CAST(g.n_g AS DOUBLE)))
                   * ln(r.rev / (g.s_g / CAST(g.n_g AS DOUBLE)))
                   * 1e9) AS BIGINT)) AS BIGINT) AS tn
          FROM r JOIN g USING (nation) GROUP BY 1),
    p AS (SELECT g.nation, g.n_g, g.s_g, w.tn,
                 g.s_g / CAST(t.s AS DOUBLE) AS share,
                 CAST(round((g.s_g / CAST(t.s AS DOUBLE))
                            * ((w.tn / 1e9) / g.n_g) * 1e9) AS BIGINT)
                     AS wn,
                 CAST(round((g.s_g / CAST(t.s AS DOUBLE))
                            * ln((g.s_g / CAST(g.n_g AS DOUBLE))
                                 / (t.s / CAST(t.n AS DOUBLE))) * 1e9)
                      AS BIGINT) AS bn
          FROM g JOIN w USING (nation) CROSS JOIN t),
    tot AS (SELECT CAST(sum(wn) AS BIGINT) AS wsum,
                   CAST(sum(bn) AS BIGINT) AS bsum FROM p)
    SELECT CAST(p.nation AS BIGINT) AS nation, p.n_g AS n_cust,
           round(p.share, 6) AS share,
           round((p.tn / 1e9) / p.n_g, 6) AS theil_g,
           round(p.bn / 1e9, 6) AS between_term,
           round(tot.wsum / 1e9, 6) AS t_within,
           round(tot.bsum / 1e9, 6) AS t_between,
           round((tot.wsum + tot.bsum) / 1e9, 6) AS t_total
    FROM p CROSS JOIN tot ORDER BY p.nation
    """,
)
def q_theil_entropy(spark, sf_dir):
    """Theil T inequality index of customer revenue with the exact
    within/between-nation decomposition (Theil '67): T_g = (1/n_g)
    sum (x/mu_g) ln(x/mu_g) per nation, T = sum share_g * T_g + sum
    share_g * ln(mu_g/mu) — the DECOMPOSABLE inequality measure
    q_gini lacks (Gini does not split into within + between; Theil
    does, which is why segment-attribution dashboards use it), and
    the entropy-form companion to q_herfindahl's concentration.

    Exactness: revenue is exact integer cents; each per-customer
    entropy term (x/mu_g) ln(x/mu_g) is nano-rounded BEFORE the
    per-nation integer sum (the q_survival ln protocol — ln/exp at
    nano rounding is the repo-wide accepted libm boundary; lgamma
    was the r7 blocker, not ln), and the k-row within/between
    products are nano-rounded per nation before the integer totals.
    Scale: the per-(nation, customer) aggregate is the only
    data-sized stage (q_herfindahl's shape); nation stats broadcast
    back."""
    from shadems_spark.operators.dedup import tracked_persist

    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nation"),
    )
    c = F.col
    r = tracked_persist(
        o.select(
            "o_custkey",
            F.round(c("o_totalprice") * 100).cast("long").alias("rc"),
        )
        .join(F.broadcast(cust), "o_custkey")
        .groupBy("nation", "o_custkey")
        .agg(F.sum("rc").cast("long").alias("rev")),
        key="theil_rev",
    )
    g = r.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("rev").cast("long").alias("s_g"),
    )
    t = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
    )
    ratio = c("rev") / (c("s_g") / c("n_g").cast("double"))
    w = (
        r.join(F.broadcast(g), "nation")
        .groupBy("nation")
        .agg(
            F.sum(F.round(ratio * F.log(ratio) * 1e9).cast("long"))
            .cast("long").alias("tn")
        )
    )
    share = c("s_g") / c("s").cast("double")
    mu_ratio = (c("s_g") / c("n_g").cast("double")) / (
        c("s") / c("n").cast("double")
    )
    p = (
        g.join(F.broadcast(w), "nation")
        .crossJoin(F.broadcast(t))
        .select(
            "nation", "n_g", "s_g", "tn",
            share.alias("share"),
            F.round(share * ((c("tn") / 1e9) / c("n_g")) * 1e9)
            .cast("long").alias("wn"),
            F.round(share * F.log(mu_ratio) * 1e9)
            .cast("long").alias("bn"),
        )
    )
    tot = p.agg(
        F.sum("wn").cast("long").alias("wsum"),
        F.sum("bn").cast("long").alias("bsum"),
    )
    return (
        p.crossJoin(F.broadcast(tot))
        .select(
            c("nation").cast("long").alias("nation"),
            c("n_g").alias("n_cust"),
            F.round("share", 6).alias("share"),
            F.round((c("tn") / 1e9) / c("n_g"), 6).alias("theil_g"),
            F.round(c("bn") / 1e9, 6).alias("between_term"),
            F.round(c("wsum") / 1e9, 6).alias("t_within"),
            F.round(c("bsum") / 1e9, 6).alias("t_between"),
            F.round((c("wsum") + c("bsum")) / 1e9, 6).alias("t_total"),
        )
        .orderBy("nation")
    )
