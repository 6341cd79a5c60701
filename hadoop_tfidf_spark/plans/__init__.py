"""Plan introspection and scale-assertion helpers.

The engine's optimizer IS Catalyst (SURVEY.md §4: zero custom rules are
needed for reference parity) — what this package adds is *verification*
that the plans Catalyst produces are the plans a 100 TB deployment needs:
broadcast joins where expected, no stray cartesian products, bounded
shuffle counts, pushed filters. Used by tests/test_plans.py as executable
documentation of the engine's physical behavior.
"""

from hadoop_tfidf_spark.plans.inspect import (
    executed_plan,
    plan_stats,
    plan_stats_from_string,
    streaming_executed_plan,
)

__all__ = [
    "executed_plan",
    "plan_stats",
    "plan_stats_from_string",
    "streaming_executed_plan",
]
