"""Pin operators/hashing.knuth32 across the long-overflow bracket
that motivated it (round 10: the x100 probe's ~9.9e9 key-shifted ids
aborted q_weighted_sample with ARITHMETIC_OVERFLOW; the sf0.01
oracles only ever exercise small ids where long and decimal forms
coincide).  Ground truth is Python's arbitrary-precision arithmetic;
the negative-id rows pin the pmod reduction (Spark's % follows the
dividend sign — a plain %-reduction would emit NEGATIVE hashes that
silently land below every `bucket < pct` split threshold)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shadems_spark.operators.hashing import KNUTH32, MOD32, knuth32

IDS = [
    0,
    1,
    4999,                 # fixture scale (where the oracles verify)
    3_470_000_000,        # just above the long-overflow bracket edge
    9_900_000_000,        # the x100 probe's shifted-id magnitude
    (1 << 63) - 1,        # Long.MAX — the full 64-bit id contract
    -1,
    -9_900_000_000,       # negative ids: pmod keeps hash in [0, 2^32)
    -(1 << 63),           # Long.MIN
]


def test_knuth32_matches_arbitrary_precision_everywhere(spark):
    df = spark.createDataFrame([(i,) for i in IDS], "id long")
    got = {
        r["id"]: r["h"]
        for r in df.select("id", knuth32("id").alias("h")).collect()
    }
    want = {i: (i * KNUTH32) % MOD32 for i in IDS}  # Python % == pmod
    assert got == want
    assert all(0 <= h < MOD32 for h in got.values())


def test_knuth32_equals_long_form_in_range(spark):
    """Where the historical long expression is defined (no overflow),
    the decimal form must be bit-identical — the property that kept
    all 12 migrated hash-exact oracles green without edits."""
    ids = [0, 1, 7, 4999, 100_000, 1_000_000_000]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    out = df.select(
        knuth32("id").alias("dec"),
        ((F.col("id") * F.lit(KNUTH32)) % F.lit(MOD32)).alias("lng"),
    ).collect()
    assert all(r["dec"] == r["lng"] for r in out)
