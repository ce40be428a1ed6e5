"""Series operators: in-plan folds over collected, calendar-bounded
sequences (the batch faces of recurrences windows cannot express).

These helpers return Column expressions over ARRAY columns — the
caller owns the (key, sorted array) aggregation, which bounds the
array by construction (dates, weeks) before any fold runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: larger than any reachable DTW path cost at int-count magnitudes
#: (costs <= ~1e9 per step, path length <= ~1e5) yet far from int64
#: overflow when one more cost is added.
DTW_INF = 10**15


def dtw_fold(va: Column | str, vb: Column | str) -> Column:
    """Dynamic-time-warping distance between two integer ARRAY
    columns as a nested in-plan fold — no UDF, no driver loop.

    The outer aggregate steps once per ``va`` element carrying the
    previous DP row; the inner aggregate builds the current row
    left-to-right (the ``cur[size(cur)]`` reference is the sequential
    j-1 dependency).  Pure integer arithmetic: exact on any engine
    and any partition layout.  Cost is O(|va|*|vb|) element ops per
    row — callers keep arrays calendar-bounded; at 1e4+ points swap
    in a Sakoe-Chiba band (same fold, clamped inner range).

    DuckDB replay: nested list_reduce folding a list-of-single-
    element-lists (acc type must equal element type there)."""
    va = F.col(va) if isinstance(va, str) else va
    vb = F.col(vb) if isinstance(vb, str) else vb
    inf = F.lit(DTW_INF).cast("long")
    m = F.size(vb)
    n = F.size(va)
    init_row = F.transform(
        F.sequence(F.lit(0), m),
        lambda j: F.when(j == 0, F.lit(0).cast("long")).otherwise(inf),
    )
    dp = F.aggregate(
        va,
        init_row,
        lambda prev, ai: F.aggregate(
            F.sequence(F.lit(1), m),
            F.array(inf),
            lambda cur, j: F.concat(
                cur,
                F.array(
                    F.abs(ai - F.element_at(vb, j))
                    + F.least(
                        F.element_at(prev, j),
                        F.element_at(prev, j + 1),
                        F.element_at(cur, F.size(cur)),
                    )
                ),
            ),
        ),
    )
    # Empty-series guard (ADVICE r6): with |vb| = 0 the inner
    # F.sequence(1, 0) auto-descends to j = 0 and element_at(vb, 0)
    # always errors.  DTW against an empty series is undefined —
    # return NULL (CaseWhen evaluates lazily, so the fold never runs).
    return F.when((n > 0) & (m > 0), F.element_at(dp, m + 1))
