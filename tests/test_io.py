"""IO layer: compacted writer sizing and the one-call SQL surface."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from shadems_spark import catalog
from shadems_spark.sources.io import write_compacted


def test_write_compacted_bounds_file_count(spark, sf_dir, tmp_path):
    """A tiny frame must compact to ONE file no matter how many tasks
    produced it (the small-files guard)."""
    df = catalog.load_table(spark, sf_dir, "lineitem").repartition(16)
    out = str(tmp_path / "compacted")
    n = write_compacted(df, out, target_mb=128)
    assert n == 1
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 1
    assert spark.read.parquet(out).count() == df.count()


def test_write_compacted_splits_when_large(spark, sf_dir, tmp_path):
    """With a tiny target the same data must fan out to several
    right-sized files."""
    df = catalog.load_table(spark, "/root/testdata/sf0.1", "lineitem")
    out = str(tmp_path / "small_target")
    n = write_compacted(df, out, target_mb=1)
    files = glob.glob(f"{out}/part-*.parquet")
    assert n > 1 and len(files) == n


def test_sql_surface(spark, sf_dir):
    df = catalog.sql(
        spark,
        """
        SELECT l_returnflag, count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_returnflag
        """,
        sf_dir,
    )
    rows = {r["l_returnflag"]: r["n"] for r in df.collect()}
    li = catalog.load_table(spark, sf_dir, "lineitem")
    assert sum(rows.values()) == li.count()  # every lineitem has an order
