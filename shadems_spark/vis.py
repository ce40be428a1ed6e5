"""The "visibility view": maps the driver's lineitem fixture onto the
reference's MS MAIN-table concepts (FIXTURES.md "plays the role of").

shadeMS's data model is row(time, antenna pair, uvw, complex vis,
flags) ([R] shade_ms/ms_info.py + SURVEY.md §1.1).  The fixtures have
no MS, so this module defines the *engine-wide deterministic mapping*
used by every shadems-semantics query AND its DuckDB oracle:

    time_day  = datediff(day, DATE '1995-01-01', l_shipdate)   (TIME)
    a1, a2    = l_suppkey, l_partkey                    (ANTENNA1/2)
    re, im    = l_extendedprice, l_extendedprice*l_discount   (DATA)
    mre, mim  = l_quantity*1000, l_quantity*l_tax*1000  (MODEL_DATA)
    u, v, w   = price-centered / discount-scaled / quantity-scaled
    flag      = l_returnflag = 'R'                            (FLAG)
    flag_row  = l_orderkey % 97 = 0                       (FLAG_ROW)

The SQL fragment mirrors (VIS_SQL_COLS) MUST stay formula-identical —
IEEE arithmetic on identical inputs gives bit-identical doubles in
both engines, which is what makes the driver's value hashes stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shadems_spark.functions.complexops import cpx

#: Triangular baseline-index antenna count (P11).  Any constant
#: > max(a2) works; 2048 covers part keys at every sf the driver uses
#: for correctness (sf0.01: p_partkey <= 2000).
N_ANT = 2048

EPOCH = "1995-01-01"
LIGHTSPEED = 299792458.0


def vis_view(lineitem: DataFrame) -> DataFrame:
    """Project lineitem into the visibility-shaped frame (P1 context).

    Pure Column expressions — stays inside whole-stage codegen; the
    parquet scan still prunes to only the referenced lineitem columns.
    """
    from shadems_spark.operators.exprcache import memo

    return lineitem.select(*memo(("vis_view_cols",), _vis_cols))


def _vis_cols() -> list:
    return [
        F.col("l_orderkey").alias("row_key"),
        F.col("l_linenumber").alias("line_no"),
        F.datediff(F.col("l_shipdate").cast("date"), F.lit(EPOCH).cast("date"))
        .cast("long")
        .alias("time_day"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_suppkey").alias("a1"),
        F.col("l_partkey").alias("a2"),
        cpx(F.col("l_extendedprice"), F.col("l_extendedprice") * F.col("l_discount")).alias("vis"),
        cpx(F.col("l_quantity") * F.lit(1000.0), F.col("l_quantity") * F.col("l_tax") * F.lit(1000.0)).alias("model"),
        (F.col("l_extendedprice") - F.lit(30000.0)).alias("u"),
        ((F.col("l_discount") - F.lit(0.05)) * F.lit(1000000.0)).alias("v"),
        (F.col("l_quantity") * F.lit(100.0)).alias("w"),
        (F.col("l_returnflag") == F.lit("R")).alias("flag"),
        (F.col("l_orderkey") % F.lit(97) == F.lit(0)).alias("flag_row"),
        F.col("l_returnflag").alias("corr_label"),
        F.col("l_linestatus").alias("field_label"),
        # facet keys ([R] main.py --iter-scan/-spw): 90-day scans,
        # 4-way synthetic DATA_DESC_ID
        F.floor(
            F.datediff(F.col("l_shipdate").cast("date"), F.lit(EPOCH).cast("date"))
            / F.lit(90)
        ).alias("scan_no"),
        (F.col("l_orderkey") % F.lit(4)).alias("spw_id"),
    ]


#: DuckDB-side mirrors of the same derived columns (formula-identical;
#: see module docstring).  Used by __spark_entry__.oracle_sql().
VIS_SQL_COLS: dict[str, str] = {
    "row_key": "l_orderkey",
    "line_no": "l_linenumber",
    "time_day": "datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE))",
    "ship_date": "CAST(l_shipdate AS DATE)",
    "a1": "l_suppkey",
    "a2": "l_partkey",
    "re": "l_extendedprice",
    "im": "l_extendedprice * l_discount",
    "mre": "l_quantity * 1000.0",
    "mim": "l_quantity * l_tax * 1000.0",
    "u": "l_extendedprice - 30000.0",
    "v": "(l_discount - 0.05) * 1000000.0",
    "w": "l_quantity * 100.0",
    "flag": "l_returnflag = 'R'",
    "flag_row": "l_orderkey % 97 = 0",
    "corr_label": "l_returnflag",
    "field_label": "l_linestatus",
    "scan_no": (
        "CAST(floor(datediff('day', DATE '1995-01-01',"
        " CAST(l_shipdate AS DATE)) / 90.0) AS BIGINT)"
    ),
    "spw_id": "l_orderkey % 4",
}


def vis_sql_from(sf_frag: str = "lineitem") -> str:
    """A DuckDB inline view equivalent to :func:`vis_view`."""
    cols = ",\n        ".join(f"{expr} AS {name}" for name, expr in VIS_SQL_COLS.items())
    return f"(SELECT\n        {cols}\n    FROM {sf_frag})"
