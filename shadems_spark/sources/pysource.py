"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the extension point for ingesting formats Spark has no built-in
reader for (instrument telemetry, proprietary binary logs, service
APIs).

The demo source generates a deterministic synthetic stream:
``spark.read.format("synthgen").option("rows", N)`` — but the shape
is the real one: `partitions()` plans N independent splits
driver-side (like DataSource V2 partition planning), and each
`read(partition)` runs ON AN EXECUTOR, yielding only its split's
rows — so ingestion parallelism scales with the cluster, and no row
ever passes through the driver.  Rows derive from the id by pure
arithmetic (Knuth multiplicative hash), which is what lets the DuckDB
oracle mirror the source exactly from `range()`.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_KNUTH32 = 2654435761
_MOD32 = 1 << 32


class SynthDataSource(DataSource):
    """`format("synthgen")`: rows (id, bucket, val) with
    bucket = knuth(id) % 100 and val = (knuth(id) % 1e6) / 1e6."""

    @classmethod
    def name(cls) -> str:
        return "synthgen"

    def schema(self) -> str:
        return "id bigint, bucket int, val double"

    def reader(self, schema) -> "SynthReader":
        return SynthReader(self.options)


class SynthReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_parts = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_parts)]

    def read(self, partition):
        # round-robin split: this partition owns ids i, i+P, i+2P, ...
        start = partition.value
        for i in range(start, self.rows, self.num_parts):
            h = (i * _KNUTH32) % _MOD32
            yield (i, h % 100, (h % 1_000_000) / 1_000_000)


def register_synthgen(spark) -> None:
    """Idempotent registration of the synthgen format."""
    spark.dataSource.register(SynthDataSource)


class SynthStreamReader(SimpleDataSourceStreamReader):
    """Spark 4 `simpleStreamReader`: the same deterministic generator
    as a STREAMING source.  Offsets are row counts ({"pos": n});
    each micro-batch advances by ``batch_rows`` until ``rows`` is
    exhausted, then the stream idles (empty batches).  Replayable by
    construction: `readBetweenOffsets` regenerates any offset window
    bit-identically (the exactly-once recovery contract a real
    connector needs), because rows derive from the id by pure
    arithmetic."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.batch_rows = int(options.get("batchRows", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _gen(self, lo: int, hi: int):
        for i in range(lo, hi):
            h = (i * _KNUTH32) % _MOD32
            yield (i, h % 100, (h % 1_000_000) / 1_000_000)

    def read(self, start: dict):
        # a LIST, not a generator: the runtime pickles this batch to
        # replay it if the micro-batch restarts before commit.
        lo = start["pos"]
        hi = min(lo + self.batch_rows, self.rows)
        return list(self._gen(lo, hi)), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._gen(start["pos"], end["pos"]))

    def commit(self, end: dict) -> None:
        pass


class SynthStreamDataSource(DataSource):
    """`spark.readStream.format("synthstream")` — the streaming twin
    of synthgen, same schema and row formula."""

    @classmethod
    def name(cls) -> str:
        return "synthstream"

    def schema(self) -> str:
        return "id bigint, bucket int, val double"

    def simpleStreamReader(self, schema) -> "SynthStreamReader":
        return SynthStreamReader(self.options)


def register_synthstream(spark) -> None:
    """Idempotent registration of the synthstream streaming format."""
    spark.dataSource.register(SynthStreamDataSource)


class CsvPartFile(WriterCommitMessage):
    """Commit message: the task-local temp file + its row count."""

    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class CsvSinkWriter(DataSourceWriter):
    """Executor side of the Python sink: each task writes its
    partition to a UNIQUELY-NAMED temp file and reports it in the
    commit message; nothing is visible until the driver's commit()
    renames the complete set into place.  That two-phase shape is
    the real V2 commit protocol — task retries produce orphan temp
    files (cleaned by abort()), never duplicate visible data."""

    def __init__(self, path: str):
        self.path = path

    def write(self, iterator):
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tmp = os.path.join(self.path, f"_tmp_{pid}_{uuid.uuid4().hex}.csv")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(",".join(str(v) for v in row) + "\n")
                n += 1
        return CsvPartFile(tmp, n)

    def commit(self, messages):
        import os

        for i, m in enumerate(messages):
            os.rename(m.path, os.path.join(self.path, f"part-{i:05d}.csv"))

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class CsvSinkDataSource(DataSource):
    """`df.write.format("pycsvsink").option("path", dir)` — a custom
    Python batch sink exercising the executor-write / driver-commit
    protocol (pyspark.sql.datasource writer API)."""

    @classmethod
    def name(cls) -> str:
        return "pycsvsink"

    def schema(self) -> str:
        return "id bigint, bucket int, val double"

    def writer(self, schema, overwrite: bool) -> "CsvSinkWriter":
        import os

        path = self.options["path"]
        os.makedirs(path, exist_ok=True)
        return CsvSinkWriter(path)


def register_pycsvsink(spark) -> None:
    """Idempotent registration of the pycsvsink format."""
    spark.dataSource.register(CsvSinkDataSource)
