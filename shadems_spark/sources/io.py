"""Format adapters.  Thin by design: `spark.read` IS the scan layer
(column pruning, predicate pushdown, partition pruning are Catalyst's
job, SURVEY.md §4) — these wrappers only pin the options that matter
for correctness parity across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from shadems_spark.session import tune


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return tune(spark).read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """CSV with explicit schema (inference is a full extra pass and
    non-deterministic across samples — never at 100 TB)."""
    r = tune(spark).read.option("header", "true")
    if schema:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    r = tune(spark).read
    if schema:
        r = r.schema(schema)
    return r.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC: same vectorized-read + pushdown properties as parquet
    (both columnar DataSource V2 formats)."""
    return tune(spark).read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def write_partitioned(df: DataFrame, path: str, partition_by: list[str], fmt: str = "parquet") -> None:
    """The facet sink: one directory per group key — the engine-side
    analogue of one-PNG-per-group ([R] shade_ms/main.py --iter-*)."""
    df.write.mode("overwrite").format(fmt).partitionBy(*partition_by).save(path)


def write_compacted(df: DataFrame, path: str, target_mb: int = 128) -> int:
    """Small-files-aware writer: size the output file count from the
    optimizer's row-size statistics so each file lands near
    ``target_mb`` (the classic 100 TB sink problem — a 32-task plan
    writing 32 x 4 KB files per day strangles the downstream scan).

    Uses Catalyst's estimated sizeInBytes (free — no extra job) and
    repartition(n); AQE may still coalesce below n if the estimate ran
    high, which is the right direction.  Returns the partition count
    chosen."""
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    n = max(1, min(10000, size // (target_mb * 1024 * 1024) + 1))
    df.repartition(n).write.mode("overwrite").parquet(path)
    return n


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Bucketed managed table: pre-shuffles ONCE at write time so every
    later equi-join/aggregation on ``bucket_col`` against a co-bucketed
    table runs with NO Exchange — the canonical way to amortize the
    dominant shuffle of a repeatedly-joined 100 TB fact table.
    ``sortBy`` additionally removes the join Sort when both sides
    declare it.  Requires saveAsTable (bucket metadata lives in the
    catalog, not the parquet footer)."""
    import shutil

    spark = df.sparkSession
    # the warehouse dir outlives the per-session metastore: a stale
    # location with no catalog entry makes saveAsTable refuse even
    # with mode=overwrite, so clear both.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    if wh:
        shutil.rmtree(f"{wh.rstrip('/')}/{table}", ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)
