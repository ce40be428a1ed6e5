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


def test_knuth_sql_matches_knuth32_over_full_domain():
    """The DuckDB mirror (hashing.knuth_sql, ADVICE r10) must agree
    with Python's arbitrary-precision ground truth — and hence with
    Spark's knuth32 — over the same bracket IDS, including Long.MIN/
    MAX and negatives.  This is the helper any future oracle over
    large/negative id fixtures swaps onto; the sf0.01 oracles' raw
    BIGINT form stays valid because their ids are small non-negative."""
    import duckdb

    from shadems_spark.operators.hashing import knuth_sql

    con = duckdb.connect()
    expr = knuth_sql("id")
    got = {
        i: con.execute(f"SELECT {expr} AS h FROM (SELECT CAST({i} AS BIGINT) AS id)").fetchone()[0]
        for i in IDS
    }
    want = {i: (i * KNUTH32) % MOD32 for i in IDS}
    assert got == want


def test_knuth_sql_equals_raw_bigint_form_in_range():
    """On the fixtures' small non-negative ids the raw oracle form
    `(id * 2654435761) % 4294967296` and knuth_sql are bit-identical —
    the invariant that lets existing sf0.01 oracle strings stay
    untouched."""
    import duckdb

    from shadems_spark.operators.hashing import knuth_sql

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT (id * {KNUTH32}) % {MOD32} AS raw, {knuth_sql('id')} AS h "
        "FROM (SELECT unnest(range(0, 5000)) AS id)"
    ).fetchall()
    assert all(r[0] == r[1] for r in rows)


def test_xe_affine_matches_arbitrary_precision_everywhere(spark):
    """The affine xe sampler hash (similarity.xe_affine) across the
    same 64-bit bracket: the r11 mod-first hardening — the raw
    ``A*id + B`` product overflows LONG once ids reach ~3.0e10 (the
    x100 probe's 9.9e9 ids had only ~3x headroom).  Ground truth is
    Python bignum; the DuckDB mirror (xe_affine_sql) must agree on
    every id too, including negatives and Long.MIN/MAX."""
    import duckdb

    from shadems_spark.operators.similarity import (
        XE_IVF_A,
        XE_IVF_B,
        XE_IVF_M,
        xe_affine,
        xe_affine_sql,
    )

    df = spark.createDataFrame([(i,) for i in IDS], "id long")
    got = {
        r["id"]: r["h"]
        for r in df.select("id", xe_affine("id").alias("h")).collect()
    }
    want = {i: (XE_IVF_A * (i % XE_IVF_M) + XE_IVF_B) % XE_IVF_M for i in IDS}
    assert got == want
    con = duckdb.connect()
    expr = xe_affine_sql("id")
    duck = {
        i: con.execute(
            f"SELECT {expr} AS h FROM (SELECT CAST({i} AS BIGINT) AS id)"
        ).fetchone()[0]
        for i in IDS
    }
    assert duck == want


def test_xe_affine_equals_raw_form_in_range(spark):
    """For ids in [0, M) — every fixture id, hence every oracle-
    checked domain — the mod-first form is bit-identical to the
    historical raw ``A*id + B`` expression, so the r6-era xe oracles
    needed only their hk string swapped, never a value change."""
    from pyspark.sql import functions as F

    from shadems_spark.operators.similarity import (
        XE_IVF_A,
        XE_IVF_B,
        XE_IVF_M,
        xe_affine,
    )

    ids = [0, 1, 4999, 100_000_000, XE_IVF_M - 1]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    out = df.select(
        xe_affine("id").alias("new"),
        ((F.col("id") * F.lit(XE_IVF_A) + F.lit(XE_IVF_B)) % F.lit(XE_IVF_M)).alias(
            "raw"
        ),
    ).collect()
    assert all(r["new"] == r["raw"] for r in out)
