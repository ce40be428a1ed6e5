"""Custom stateful streaming operator (SURVEY.md §2 S + L surface):
per-user running aggregates via applyInPandasWithState — the shape a
bespoke sessionizer/accumulator takes when session_window/groupBy
can't express the semantics.

Batch-first like everything else: ``running_totals_batch`` computes
the same result with a window spec (used for the oracle-checked
query); ``running_totals_stream`` is the GroupState implementation,
exercised end-to-end in tests with availableNow."""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_totals_batch(ev: DataFrame) -> DataFrame:
    """Batch equivalent: final per-user count/sum (what the stateful
    stream converges to after draining the source)."""
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def _update(key, pdfs: Iterator, state: GroupState):
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_totals_stream(ev_stream: DataFrame) -> DataFrame:
    """S/L: arbitrary stateful processing — per-user GroupState updated
    per micro-batch, Arrow-batched pandas on the executor side."""
    return ev_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
