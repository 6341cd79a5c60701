"""Custom stateful streaming operators via ``applyInPandasWithState`` —
arbitrary per-key state the built-in windowed aggregations can't express
(running totals that survive across micro-batches, inactivity-timeout
session summaries with custom payloads).

Scale design: state lives in the state store keyed by the group column —
partitioned across executors by the shuffle, checkpointed incrementally;
the Python function sees one key's rows per call as Arrow batches. State
size is O(1) per key here (a few counters), so a 100 TB stream's state is
bounded by key cardinality, not event volume. Watermark-driven timeouts
evict idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

#: Output of :func:`running_user_totals` — one row per user per micro-batch
#: in which that user had events.
RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

#: State: the running counters carried across micro-batches.
_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value) maintained across
    micro-batches — the custom-state operator shape (the built-in
    aggregations could express this particular reduction, but the operator
    demonstrates arbitrary state: swap the counters for a sketch, a decay
    model, or a fraud heuristic without changing the plan).

    Emits the updated totals for every user seen in each micro-batch
    (``update`` output mode). The state-update function is nested and
    global-free so cloudpickle ships it by value — workers don't need
    this package importable (external drivers load it off sys.path).
    """

    def update_totals(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
