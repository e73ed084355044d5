"""Custom stateful streaming operators (SURVEY.md §2B Streaming:
``applyInPandasWithState``) — the Spark-native replacement for the
reference's only stateful construct, the in-memory Batcher buffer
(src/rabbithole/batcher.py:49,69), which kept unbounded per-flow state
in process memory with no fault tolerance.

Here state lives in Spark's checkpointed state store: partitioned by
key across executors, snapshotted per micro-batch, recovered on
restart. At 100 TB the state shuffles once per batch on the group key
and each group's state must stay bounded — store aggregates, never raw
rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_totals_with_state"]

#: Output schema of :func:`running_totals_with_state`.
RUNNING_TOTALS_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, n_batches bigint"
)
_STATE_SCHEMA = "count bigint, total double, batches bigint"


def running_totals_with_state(grouped_stream: DataFrame) -> DataFrame:
    """Cumulative per-user event count / value sum across micro-batches.

    Each micro-batch folds its rows into the per-key state tuple
    ``(count, total, batches)`` and emits the updated running totals —
    the canonical "custom stateful operator" shape: arbitrary Python
    aggregation logic, Arrow-batched input, bounded per-key state.

    Expects the input grouped by ``user_id`` with a ``value`` column.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        count, total, batches = (
            state.get if state.exists else (0, 0.0, 0)
        )
        for pdf in pdfs:
            count += int(len(pdf))
            total += float(pdf["value"].fillna(0.0).sum())
        batches += 1
        state.update((count, total, batches))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [count],
                # round: float sum order varies with Arrow batch split
                "total_value": [round(total, 6)],
                "n_batches": [batches],
            }
        )

    return grouped_stream.applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
