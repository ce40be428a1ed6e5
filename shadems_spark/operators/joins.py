"""Join operators (SURVEY.md §2 D).

Reference joins are dimension enrichments only (fact × tiny metadata,
[R] shade_ms/ms_info.py NamedList resolution) — always broadcast-hash
shaped.  The rebuild adds fact×fact equi-joins, range joins, and an
as-of join the reference lacks (J5/J6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dim_enrich(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """J1/J2: broadcast-hash dim lookup — the DDID->SPW/POL and
    antenna-name resolution shape.  Explicit broadcast(): at 100 TB
    the fact side must never shuffle for a 25-row dim."""
    return fact.join(F.broadcast(dim), on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """J6: as-of join — for each left row, the latest right row with
    right_ts <= left_ts within the same keys.

    Implemented as the scalable union+window pattern (single shuffle
    on ``keys``, no quadratic blowup, no correlated subquery):
    tag both sides, sort-merge within key on time, carry the last
    right value forward with last(..., ignoreNulls=True).
    """
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = (
        right.withColumn("__ts", F.col(right_ts))
        .withColumn("__side", F.lit(0))
        .select(
            *keys,
            "__ts",
            "__side",
            *[F.col(c).alias(f"__r_{c}") for c in right_vals],
        )
    )
    lcols = [c for c in left.columns]
    lt = lt.select(*lcols, "__ts", "__side", *[F.lit(None).cast(rt.schema[f"__r_{c}"].dataType).alias(f"__r_{c}") for c in right_vals])
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at the same timestamp,
    # so a right row AT the left timestamp is visible (<= semantics).
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_vals
        ],
    )
    return carried.filter(F.col("__side") == 1).drop(
        "__ts", "__side", *[f"__r_{c}" for c in right_vals]
    )


def range_join(
    left: DataFrame, right: DataFrame, equi: Column, lo: Column, hi: Column, probe: Column
) -> DataFrame:
    """J6: interval containment join: equi key + probe BETWEEN lo AND
    hi.  With an equi key Catalyst uses hash join + post-filter; pure
    range joins should bucket the range first (see operators/similarity
    for the LSH analogue)."""
    return left.join(right, equi & probe.between(lo, hi))
