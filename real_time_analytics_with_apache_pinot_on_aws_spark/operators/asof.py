"""As-of join: each left row gets the latest right row with ts <= left.ts.

Not a Pinot operator (extension, SURVEY §2.C spirit): the canonical
time-series enrichment for training-data pipelines — "the most recent price /
feature / state as of this event".  DuckDB ships it natively (``ASOF JOIN``),
which doubles as the correctness oracle.

Spark-first plan: NO join at all.  Union the two sides, then one window pass
per key ordered by time carries the last non-null right-side value forward
(``last(..., ignoreNulls=True)``).  Cost = one shuffle on the key — the same
as a co-partitioned join but with no range-condition blowup: a range-condition
join (``l.ts >= r.ts``) would be a per-key cartesian that AQE cannot save at
100 TB; the union+window form is linear in rows per key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by_cols: Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + latest-prior ``value_cols`` from ``right`` (ties: a right
    row at exactly left.ts counts, matching ASOF JOIN's ``>=``).

    ``right`` needs ``by_cols + [time_col] + value_cols``; output keeps every
    left column plus one ``<value><suffix>`` per value column (null when no
    prior right row exists).
    """
    left_only = [c for c in left.columns if c not in by_cols and c != time_col]
    l = left.select(
        *by_cols,
        time_col,
        *left_only,
        *[F.lit(None).cast(dict(right.dtypes)[v]).alias(f"__r_{v}") for v in value_cols],
        F.lit(1).alias("__side"),
    )
    r = right.select(
        *by_cols,
        time_col,
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in left_only],
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
        F.lit(0).alias("__side"),
    )
    # at equal ts the right row sorts first (__side 0 < 1) so it is visible
    # to the left row — the inclusive (>=) ASOF semantics
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(time_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        "*",
        *[
            F.last(f"__r_{v}", ignorenulls=True).over(w).alias(f"{v}{suffix}")
            for v in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).select(
        *by_cols, time_col, *left_only, *[f"{v}{suffix}" for v in value_cols]
    )
