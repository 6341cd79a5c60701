"""Custom stateful streaming operators via ``applyInPandasWithState`` —
arbitrary per-key state the built-in windowed aggregations can't express
(running totals that survive across micro-batches, inactivity-timeout
session summaries with custom payloads).

Scale design: state lives in the state store keyed by the group column —
partitioned across executors by the shuffle, checkpointed incrementally;
the Python function sees one key's rows per call as Arrow batches. State
size is O(1) per key here (a few counters), so a 100 TB stream's state is
bounded by key cardinality, not event volume. Key-cardinality honesty:
``running_user_totals`` keeps its default ``NoTimeout`` (the gate drains
a bounded fixture and the hash contract needs every key's final total),
so on an unbounded stream with churning keys state grows with total keys
ever seen — pass ``idle_timeout_ms`` to enable processing-time eviction
(the production lever for churn-heavy key spaces; an evicted key that
reappears restarts from zero, the standard timeout semantics).
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


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running (n_events, total_value) maintained across
    micro-batches — the custom-state operator shape (the built-in
    aggregations could express this particular reduction, but the operator
    demonstrates arbitrary state: swap the counters for a sketch, a decay
    model, or a fraud heuristic without changing the plan).

    Emits the updated totals for every user seen in each micro-batch
    (``update`` output mode). The state-update function is nested and
    global-free so cloudpickle ships it by value — workers don't need
    this package importable (external drivers load it off sys.path).

    ``idle_timeout_ms``: processing-time eviction for keys idle that
    long — the state-growth lever for unbounded streams with churning
    key spaces (see the module docstring). Default ``None`` keeps every
    key forever: right for bounded drains and the hash-gated totals row,
    where an eviction would drop a key's final answer. Drain-mode
    gotcha (MEASURED, the hard version): with a processing-time timeout
    set, an ``availableNow`` drain did not terminate AT ALL on this
    Spark version (12+ minutes with a 3 s timeout — the engine keeps
    scheduling micro-batches around pending/fired timeouts), so the
    option is strictly for continuously-running ingest that the caller
    stops via ``query.stop()``; never combine it with availableNow.
    """

    def update_totals(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
