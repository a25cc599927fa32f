"""Plan audit: assert the physical properties that make a query scale.

The reference gets pruning/pushdown/partial-agg from Pinot's engine
(SURVEY §4); on Spark these come from Catalyst — but only if the query is
expressed so Catalyst can see them.  This module extracts the facts that
matter from the executed plan so tests can pin them:

- filters pushed into the parquet scan (``PushedFilters``),
- column pruning (``ReadSchema`` width),
- join strategy (broadcast for dims vs shuffle for fact-fact),
- ``TakeOrderedAndProject`` for order-by+limit (per-partition top-k,
  no global sort),
- no row-at-a-time Python in the hot path,
- no accidental ``CartesianProduct``,
- shuffle (Exchange) count — the number that decides 100 TB behavior.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanFacts:
    pushed_filters: bool
    partition_filters: bool
    read_schemas: tuple[str, ...]
    broadcast_joins: int
    sortmerge_joins: int
    shuffled_hash_joins: int
    bnl_joins: int
    cartesian: bool
    take_ordered: bool
    python_eval: bool
    arrow_eval: bool
    exchanges: int
    text: str

    def scan_column_counts(self) -> list[int]:
        """Number of columns each parquet scan actually reads (pruning check)."""
        counts = []
        for rs in self.read_schemas:
            counts.append(0 if rs == "struct<>" else rs.count(":"))
        return counts


def audit_plan(df: DataFrame) -> PlanFacts:
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schemas = tuple(re.findall(r"ReadSchema: (struct<[^>]*>?)", plan))
    return PlanFacts(
        pushed_filters=bool(re.search(r"PushedFilters: \[(?!\])", plan)),
        # Pinot prunes whole segments by time metadata before scatter
        # (SURVEY §4); Spark's analog is Hive-style partition pruning — the
        # scan must carry a non-empty PartitionFilters list.
        partition_filters=bool(re.search(r"PartitionFilters: \[(?!\])", plan)),
        read_schemas=read_schemas,
        broadcast_joins=plan.count("BroadcastHashJoin"),
        sortmerge_joins=plan.count("SortMergeJoin"),
        shuffled_hash_joins=plan.count("ShuffledHashJoin"),
        bnl_joins=plan.count("BroadcastNestedLoopJoin"),
        cartesian="CartesianProduct" in plan,
        take_ordered="TakeOrderedAndProject" in plan,
        python_eval="BatchEvalPython" in plan,  # row-at-a-time Python: never
        arrow_eval=("ArrowEvalPython" in plan) or ("MapInPandas" in plan),
        exchanges=plan.count("Exchange"),
        text=plan,
    )
