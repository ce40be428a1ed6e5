"""Overflow-safe deterministic hashing helpers.

The engine's deterministic sampling / splitting / bucketing relies on
the Knuth multiplicative hash ``(id * 2654435761) % 2**32`` — chosen
over ``rand()`` / ``xxhash64`` where the DuckDB oracle must replay the
identical arithmetic.  As a LONG expression that product overflows
(ANSI: ARITHMETIC_OVERFLOW) once ids reach ~3.47e9 — found live by the
round-10 x100 events/documents probe (key-shifted ids ~9.9e9), and
exactly the range of real snowflake-style 64-bit ids in a 100 TB
corpus.

``knuth32`` computes the product in decimal(38,0) — exact integer
arithmetic to 1e38, so any 64-bit id is safe — then reduces mod 2**32
and returns a LONG.  For in-range inputs the value is bit-identical to
the long form (and to the BIGINT arithmetic the sf0.01 oracles run);
out-of-range inputs now get the mathematically correct hash instead of
an error.  Same trade as q_als's decimal sufficient statistics
(BASELINE.md round 9): exactness and order-freedom first, the decimal
cost is one map-side projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Knuth's 32-bit multiplicative constant (golden-ratio prime).
KNUTH32 = 2654435761
#: 2**32 — the reduction modulus.
MOD32 = 1 << 32


def knuth32(col: Column | str) -> Column:
    """``pmod(col * 2654435761, 2**32)`` as a LONG, computed via
    decimal(38,0) so 64-bit ids cannot overflow.  pmod, not ``%``:
    Spark's ``%`` follows the dividend's sign, so a negative id would
    yield a NEGATIVE hash that silently lands below every
    ``bucket < pct`` split threshold — pmod keeps the result in
    [0, 2**32) for the full signed-64-bit domain.  For non-negative
    ids the two reductions agree, so in-range values stay
    bit-identical to the historical long form (pinned in
    tests/test_hashing.py against Python's arbitrary-precision
    arithmetic across the overflow bracket)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.pmod(c.cast("decimal(38,0)") * F.lit(KNUTH32), F.lit(MOD32))
    return h.cast("long")


def knuth_sql(expr: str) -> str:
    """DuckDB mirror of :func:`knuth32`, defined over the FULL signed
    64-bit domain (ADVICE r10): HUGEINT product — exact, like the
    decimal(38,0) Spark form — then a positive modulo (pmod).  For
    the non-negative in-range ids of the sf fixtures the value is
    bit-identical to the historical raw ``(id * 2654435761) %
    4294967296`` BIGINT form, so swapping an oracle onto this helper
    never changes its sf0.01 result."""
    p = f"(CAST({expr} AS HUGEINT) * {KNUTH32})"
    return f"CAST(((({p}) % {MOD32}) + {MOD32}) % {MOD32} AS BIGINT)"
