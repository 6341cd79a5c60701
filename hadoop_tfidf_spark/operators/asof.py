"""As-of (point-in-time) join — an operator Spark lacks natively
(SURVEY.md §2 gap table names it as engine surface the reference also
doesn't have).

Implemented as a composition of built-in DataFrame ops — the union +
conditional window trick: tag both sides, union on the shared key/time
axis, sort within key, and carry the most recent right-side row forward
with ``last(..., ignorenulls=True)``. One shuffle on the join key; no
range explosion, no cross join, no Python.

Scale design: the window partitions by the join key (high-cardinality —
user_id / instrument id), so state per task is one key-group at a time and
Spark's window spills as needed. This is the standard distributed as-of
strategy (vs. the broadcast-interval-tree approach, which only fits small
right sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row with the same
    ``on`` key: ``right_time <= left_time`` taking the latest
    (``direction="backward"``, the default) or ``right_time >= left_time``
    taking the earliest (``direction="forward"``) — both inclusive.

    Returns all left columns plus ``{v}{suffix}`` for each requested right
    value column (NULL when no right row matches). For deterministic
    output the right side must be unique per (key, time) — pre-aggregate
    duplicates (the declared query does ``max(value)`` per (user, ts)).

    Both directions are the same single-shuffle union+window plan; forward
    just flips the within-key scan (first over the following frame instead
    of last over the preceding one).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lt, rt = F.col(left_time), F.col(right_time)
    # Each right value rides inside a marker struct that is non-null for
    # every right row — last(ignorenulls=True) then selects by row recency,
    # not value nullity, so a genuinely NULL right value still wins as the
    # most recent match (a bare last(value, ignorenulls) would skip it and
    # wrongly carry an older non-NULL value forward; DuckDB ASOF picks the
    # latest row regardless of value nullity).
    def _wrap(v: str):
        return F.struct(F.col(v).alias("v"))

    l_tag = left.select(
        F.col(on).alias("_k"),
        lt.alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        *[
            F.lit(None)
            .cast(f"struct<v:{right.schema[v].dataType.simpleString()}>")
            .alias(f"_rv_{v}")
            for v in right_values
        ],
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        rt.alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        *[_wrap(v).alias(f"_rv_{v}") for v in right_values],
    )
    unioned = l_tag.unionByName(r_tag)
    if direction == "backward":
        # right rows sort BEFORE left rows at equal time (_is_left asc):
        # a right row at exactly left_time is visible to that left row (<=)
        w = (
            Window.partitionBy("_k")
            .orderBy(F.asc("_t"), F.asc("_is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last
    else:
        # forward: scan the following frame; right rows sort AFTER left
        # rows at equal time (_is_left desc) so an equal-time right row is
        # still visible (>= inclusive)
        w = (
            Window.partitionBy("_k")
            .orderBy(F.asc("_t"), F.desc("_is_left"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first
    carried = unioned.select(
        "_is_left",
        "_l",
        *[
            pick(f"_rv_{v}", ignorenulls=True).over(w).alias(f"_rv_{v}")
            for v in right_values
        ],
    )
    out = carried.where(F.col("_is_left") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rv_{v}.v").alias(f"{v}{suffix}") for v in right_values],
    )
    return out
