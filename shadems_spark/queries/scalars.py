"""Scalar-function battery (SURVEY.md §2 SF) + sinks (A4/A5):
string / date / JSON / array functions on the driver tables, the
filename-templating sink and the parquet write→read-back roundtrip.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from shadems_spark.catalog import load_table
from shadems_spark.operators import raster as R
from shadems_spark.queries import register
from shadems_spark.queries.core import PRICE_RANGE, TIME_RANGE
from shadems_spark.vis import vis_sql_from, vis_view

_VIS = vis_sql_from("lineitem")


@register(
    "q_string_funcs",
    sql="""
    SELECT doc_id,
           lower(lang) AS lang_lc,
           upper(source) AS source_uc,
           substring(text, 1, 12) AS head,
           length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           regexp_extract(text, '^[a-z]+') AS first_word,
           trim(concat('  ', lang, '  ')) AS trimmed
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def q_string_funcs(spark, sf_dir):
    """SF: lower/upper/trim/substring/split/regexp_extract/length."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return d.select(
        "doc_id",
        F.lower("lang").alias("lang_lc"),
        F.upper("source").alias("source_uc"),
        F.substring("text", 1, 12).alias("head"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.regexp_extract("text", "^[a-z]+", 0).alias("first_word"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias("trimmed"),
    )


@register(
    "q_date_funcs",
    sql="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           CAST(o_orderdate AS DATE) + 90 AS due_date
    FROM orders WHERE o_orderkey % 20 = 0
    """,
)
def q_date_funcs(spark, sf_dir):
    """SF: year/month/day/date_trunc/datediff/date_add."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    od = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year(od).cast("long").alias("yr"),
        F.month(od).cast("long").alias("mon"),
        F.dayofmonth(od).cast("long").alias("dom"),
        F.date_trunc("month", od).cast("date").alias("month_start"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
        F.date_add(od, 90).alias("due_date"),
    )


@register(
    "q_json_funcs",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events WHERE event_id % 7 = 0
    """,
)
def q_json_funcs(spark, sf_dir):
    """SF: JSON scalar extraction over events.props."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", k.alias("k"), (k % 10).alias("k_bucket"))


@register(
    "q_map_funcs",
    sql="""
    SELECT event_id,
           len(json_keys(props)) AS n_keys,
           array_to_string(json_keys(props), ',') AS keys_csv,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           len(json_keys(props)) + 1 AS n_keys2
    FROM events WHERE event_id % 11 = 0
    """,
)
def q_map_funcs(spark, sf_dir):
    """SF: map functions — from_json to map<string,long>, size,
    map_keys, element_at, map_concat/create_map."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    m = F.from_json("props", "map<string,bigint>")
    m2 = F.map_concat(m, F.create_map(F.lit("extra"), F.lit(1).cast("bigint")))
    return ev.select(
        "event_id",
        F.size(m).cast("bigint").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.element_at(m, "k").alias("k_val"),
        F.size(m2).cast("bigint").alias("n_keys2"),
    )


@register(
    "q_array_funcs",
    sql="""
    SELECT vec_id,
           len(embedding) AS n_dim,
           embedding[1] AS first_elem,
           embedding[len(embedding)] AS last_elem,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
           round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS vec_norm
    FROM embeddings WHERE vec_id % 7 = 0
    """,
)
def q_array_funcs(spark, sf_dir):
    """SF: size/element_at/transform/aggregate over the embedding
    array column — all JVM-side higher-order functions, no UDFs."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 7 == 0)
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    vec_sum = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x)
    vec_norm = F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.element_at("embedding", -1).alias("last_elem"),
        F.round(vec_sum, 4).alias("vec_sum"),
        F.round(vec_norm, 4).alias("vec_norm"),
    )


@register(
    "q_name_template",
    sql=f"""
    SELECT DISTINCT field_label, corr_label,
           concat('plot-F', field_label, '-C', corr_label, '.png') AS png_name
    FROM {_VIS} v
    """,
)
def q_name_template(spark, sf_dir):
    """A5: deterministic output-filename templating with {field}/{corr}
    tokens ([R] shade_ms/main.py --png template expansion ≈L500-560)."""
    v = vis_view(load_table(spark, sf_dir, "lineitem"))
    return v.select("field_label", "corr_label").distinct().select(
        "field_label",
        "corr_label",
        F.format_string("plot-F%s-C%s.png", "field_label", "corr_label").alias("png_name"),
    )


@register(
    "q_sink_roundtrip",
    sql=f"""
    SELECT {R.bin_axis_sql('re', *PRICE_RANGE, 32)} AS by,
           {R.bin_axis_sql('time_day', *TIME_RANGE, 32)} AS bx,
           count(*) AS val
    FROM {_VIS} v
    WHERE time_day BETWEEN {TIME_RANGE[0]!r} AND {TIME_RANGE[1]!r}
      AND re BETWEEN {PRICE_RANGE[0]!r} AND {PRICE_RANGE[1]!r}
    GROUP BY 1, 2
    """,
)
def q_sink_roundtrip(spark, sf_dir):
    """A4: sink — binned raster written to parquet and read back
    (the engine-side output is the binned table; PNG rendering is a
    driver-side consumer, SURVEY.md §1.2)."""
    out = R.raster(
        vis_view(load_table(spark, sf_dir, "lineitem")),
        F.col("time_day").cast("double"),
        F.col("vis.re"),
        TIME_RANGE,
        PRICE_RANGE,
        32,
        32,
    )
    from shadems_spark.queries.analytics import _SCRATCH

    path = os.path.join(_SCRATCH, "sink_roundtrip")
    out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@register(
    "q_variant",
    sql="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_sum,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_min,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_max
    FROM events WHERE event_id % 3 = 0
    GROUP BY event_type
    """,
)
def q_variant(spark, sf_dir):
    """SF-variant: semi-structured payloads through Spark 4's VARIANT
    type — parse_json once at the scan, typed variant_get extraction
    downstream (the open-schema path for event/props columns where a
    fixed struct schema can't be declared up front).  The binary
    variant encoding prunes and predicate-pushes better than repeated
    get_json_object string re-parses at scale."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 3 == 0)
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


@register(
    "q_collation",
    sql="""
    WITH m AS (SELECT doc_id, lang,
                      CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END
                          AS mixed
               FROM documents)
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN lower(mixed) = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_eq_en_ci,
           count(DISTINCT lower(mixed)) AS n_distinct_ci
    FROM m GROUP BY lang
    """,
)
def q_collation(spark, sf_dir):
    """SF-collation: case-insensitive string semantics via Spark 4
    collations (UTF8_LCASE) — collation-aware equality and DISTINCT
    instead of wrapping every comparison in lower() (the collated
    comparison stays codegen'd and sargable; the oracle spells out the
    lower() equivalent)."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = F.when(
        F.col("doc_id") % 2 == 0, F.upper("lang")
    ).otherwise(F.col("lang"))
    ci = F.collate(mixed, "UTF8_LCASE")
    return docs.select("lang", ci.alias("ci")).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("ci") == F.lit("en")).cast("int")).cast("long").alias("n_eq_en_ci"),
        F.countDistinct("ci").alias("n_distinct_ci"),
    )


@register(
    "q_hof_funcs",
    sql="""
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           CAST(list_sum(list_transform(embedding,
                x -> CASE WHEN x > 0.5 THEN 1 ELSE 0 END)) AS BIGINT) AS n_big,
           CASE WHEN len(list_filter(embedding, x -> x > 2.0)) > 0
                THEN 1 ELSE 0 END AS has_gt2,
           CASE WHEN len(list_filter(embedding, x -> abs(x) <= 10.0)) = len(embedding)
                THEN 1 ELSE 0 END AS all_small,
           round(list_max(list_transform(embedding, x -> CAST(abs(x) AS DOUBLE))), 6)
               AS max_abs,
           round(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE), 6)
               AS zip_head
    FROM embeddings WHERE vec_id % 9 = 0
    """,
)
def q_hof_funcs(spark, sf_dir):
    """SF-HOF: the higher-order-function battery — filter / transform /
    exists / forall / reduce-style folds over array cells, all JVM
    lambda expressions (no UDF, no explode): the per-cell compute path
    for tensor-shaped columns at scale."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 9 == 0)
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.aggregate(
            F.transform("embedding", lambda x: F.when(x > 0.5, 1).otherwise(0)),
            F.lit(0),
            lambda a, x: a + x,
        ).cast("long").alias("n_big"),
        F.exists("embedding", lambda x: x > 2.0).cast("int").alias("has_gt2"),
        F.forall("embedding", lambda x: F.abs(x) <= 10.0).cast("int").alias("all_small"),
        F.round(F.array_max(F.transform(dbl, F.abs)), 6).alias("max_abs"),
        F.round(
            F.aggregate(F.slice(dbl, 1, 2), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("zip_head"),
    )


@register(
    "q_null_funcs",
    sql="""
    SELECT doc_id,
           coalesce(nullif(lang, 'en'), 'english') AS lang_or_default,
           CASE WHEN nullif(n_chars, 0) IS NULL THEN -1 ELSE n_chars END AS nz_chars,
           ifnull(nullif(source, source), 'same') AS ifnull_demo,
           CASE WHEN lang = 'en' THEN NULL ELSE lang END IS NOT DISTINCT FROM NULL
               AS en_is_nulled
    FROM documents WHERE doc_id % 13 = 0
    """,
)
def q_null_funcs(spark, sf_dir):
    """SF-null: null-handling battery — nullif / coalesce / ifnull /
    null-safe equality (<=>), the guards every production projection
    chain leans on."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    en_nulled = F.when(F.col("lang") == "en", F.lit(None)).otherwise(F.col("lang"))
    return docs.select(
        "doc_id",
        F.coalesce(F.nullif("lang", F.lit("en")), F.lit("english")).alias(
            "lang_or_default"
        ),
        F.when(F.nullif("n_chars", F.lit(0)).isNull(), F.lit(-1))
        .otherwise(F.col("n_chars"))
        .alias("nz_chars"),
        F.ifnull(F.nullif("source", F.col("source")), F.lit("same")).alias(
            "ifnull_demo"
        ),
        en_nulled.eqNullSafe(F.lit(None)).alias("en_is_nulled"),
    )


@register(
    "q_xml_funcs",
    sql="""
    SELECT o_orderkey,
           o_orderkey AS xid,
           o_orderstatus AS status,
           o_custkey AS ckey,
           strftime(o_orderdate, '%Y-%m-%d') AS odate,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           o_custkey AS xp_c,
           o_orderstatus AS xp_st
    FROM orders WHERE o_orderkey % 11 = 0 ORDER BY o_orderkey
    """,
)
def q_xml_funcs(spark, sf_dir):
    """SF-xml: Spark 4 native XML battery — build an XML record from
    row values, parse it back with from_xml (attributes via the
    default '_' prefix) and XPath extractors (xpath_long /
    xpath_string).  The oracle is the identity round-trip: DuckDB has
    no XML type, so it simply selects the source columns the XML was
    built from — any parse/extract defect breaks the hash.  Money
    rides as integer cents and dates as ISO strings so no
    double-formatting ambiguity enters the markup."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 11 == 0
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    odate = F.date_format("o_orderdate", "yyyy-MM-dd")
    xml = F.concat(
        F.lit('<o id="'), F.col("o_orderkey"),
        F.lit('" st="'), F.col("o_orderstatus"),
        F.lit('"><c>'), F.col("o_custkey"),
        F.lit("</c><d>"), odate,
        F.lit("</d><cents>"), cents,
        F.lit("</cents></o>"),
    )
    parsed = F.from_xml(
        xml, "_id LONG, _st STRING, c LONG, d STRING, cents LONG"
    )
    return (
        orders.select("o_orderkey", xml.alias("x"), parsed.alias("p"))
        .select(
            "o_orderkey",
            F.col("p._id").alias("xid"),
            F.col("p._st").alias("status"),
            F.col("p.c").alias("ckey"),
            F.col("p.d").alias("odate"),
            F.col("p.cents").alias("cents"),
            F.xpath_long(F.col("x"), F.lit("/o/c")).alias("xp_c"),
            F.xpath_string(F.col("x"), F.lit("/o/@st")).alias("xp_st"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q_sql_sugar",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           CAST(round(sum(o_totalprice)) AS BIGINT) AS rev
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority, n, rev
    """,
)
def q_sql_sugar(spark, sf_dir):
    """Spark 4 SQL-sugar battery: GROUP BY ALL (group on every
    non-aggregate select item), ORDER BY ALL, and SELECT * EXCEPT
    (schema subtraction) in one statement — the analyst-surface
    idioms a migrating SQL user expects to keep.  The oracle states
    the same query in explicit ANSI form, proving the sugar resolves
    to identical semantics."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("o_sugar")
    return spark.sql(
        """
        SELECT * EXCEPT (rev_raw) FROM (
          SELECT o_orderstatus, o_orderpriority,
                 count(*) AS n,
                 sum(o_totalprice) AS rev_raw,
                 CAST(round(sum(o_totalprice)) AS BIGINT) AS rev
          FROM o_sugar GROUP BY ALL
        ) ORDER BY ALL
        """
    )


@register(
    "q_url_funcs",
    sql="""
    SELECT doc_id,
           'www.' || source || '.example.com' AS host,
           '/docs/' || lang || '/' || doc_id AS path,
           'id=' || doc_id || '&ref=feed' AS query,
           CAST(doc_id AS VARCHAR) AS id_param,
           source || '.example.com' AS canon_host
    FROM documents WHERE doc_id % 9 = 0 ORDER BY doc_id
    """,
)
def q_url_funcs(spark, sf_dir):
    """SF-url: URL parsing battery — build a URL from row values,
    take it apart with Spark's parse_url (HOST / PATH / QUERY /
    keyed QUERY param) and canonicalize the host (strip the www
    prefix, the web-corpus dedup-key normalization).  DuckDB has no
    URL parser, so the oracle is the identity round-trip on the
    constructed parts — any extraction defect breaks the hash."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 9 == 0)
    url = F.concat(
        F.lit("https://www."), F.col("source"), F.lit(".example.com/docs/"),
        F.col("lang"), F.lit("/"), F.col("doc_id"),
        F.lit("?id="), F.col("doc_id"), F.lit("&ref=feed"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    return docs.select(
        "doc_id",
        host.alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("id_param"),
        F.regexp_replace(host, "^www\\.", "").alias("canon_host"),
    ).orderBy("doc_id")
