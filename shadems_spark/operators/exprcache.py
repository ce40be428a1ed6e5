"""Driver-side memo for df-independent Column fragments (r11
optimization; guide §7.3 — planning/driver overhead).

A PySpark Column is an immutable UNRESOLVED expression tree wrapping a
Java object; Catalyst re-resolves it per plan, so the same Column
object can be embedded in any number of DataFrames.  Constructing deep
fragments (HOF folds, unrolled dot products, wide aggregate lists)
costs one py4j round-trip (~0.3 ms of pure driver latency) per Column
method call — hundreds to thousands per operator build — and query
builders re-run on every bench rep and driver invocation.  Memoizing
the finished fragments by their SCALAR parameters removes that cost
without changing what any plan computes: results and plans are
byte-identical because they embed the very same expression objects.

Rules for call sites:
- key on every parameter that influences the expression (names, ints,
  direction flags) — never on Column objects (no stable identity);
- only cache fragments built from literals/column NAMES, never ones
  closing over a DataFrame;
- the cache is automatically scoped to the live JVM gateway, so a
  session restart within one process can never serve stale Java refs.

``SHADEMS_NO_EXPR_MEMO=1`` disables caching (A/B measurement).
"""

from __future__ import annotations

import os

_CACHE: dict = {}


def memo(key: tuple, build):
    """Return ``build()`` cached under ``key`` (+ the live gateway)."""
    if os.environ.get("SHADEMS_NO_EXPR_MEMO"):  # A/B gate
        return build()
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    key = (id(sc._gateway) if sc is not None else None,) + key
    col = _CACHE.get(key)
    if col is None:
        col = _CACHE[key] = build()
    return col
