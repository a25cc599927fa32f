"""Gapfill: fill missing time buckets in aggregated time series (SURVEY B34).

Pinot's ``GapFill(...)`` [P1.2] fills holes in time-bucketed group-by results
with ``FILL(col, 'FILL_DEFAULT_VALUE'|'FILL_PREVIOUS_VALUE')`` modes.
Spark-first shape: generate the bucket spine with ``sequence()`` + ``explode``,
cross-join the group dimension values, left-join the aggregate, then
``coalesce`` (default-value mode) or ``last(..., ignorenulls)`` over a
per-group time-ordered window (previous-value mode / forward fill).

Scale: the spine is tiny (buckets x groups — thousands of rows even for a year
of minutes x many groups) so Catalyst broadcasts it; the aggregated side has
already been reduced by the group-by. No extra shuffle of raw data; the
previous-value window partitions by the group columns over the already-small
filled relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gapfill(
    agg: DataFrame,
    time_col: str,
    step: str,
    group_cols: list[str],
    fill: dict[str, float | str],
    start: Column | None = None,
    end: Column | None = None,
) -> DataFrame:
    """Fill missing ``time_col`` buckets (spaced by ``step``, an INTERVAL
    literal like ``'1 hour'``) per combination of ``group_cols``.

    ``agg`` must already be one row per (time bucket, *group_cols).
    ``fill`` maps metric column -> fill spec: a literal value (Pinot
    FILL_DEFAULT_VALUE) or the string ``"previous"`` (FILL_PREVIOUS_VALUE —
    forward fill from the group's last seen bucket; leading holes stay NULL,
    matching Pinot's semantics when no previous value exists).

    When BOTH bounds are given they are caller literals and the spine is
    generated from a one-row range independent of the input — an empty
    (or fully filtered) input still yields the full spine of filled
    buckets, Pinot's explicit-bounds semantics.  Data-derived bounds
    (either side omitted) must aggregate over the input.
    """
    if start is not None and end is not None:
        bounds = agg.sparkSession.range(1).select(
            start.alias("lo"), end.alias("hi")
        )
    else:
        bounds = agg.select(
            (start if start is not None else F.min(time_col)).alias("lo"),
            (end if end is not None else F.max(time_col)).alias("hi"),
        )
    spine = bounds.select(
        F.explode(F.expr(f"sequence(lo, hi, interval {step})")).alias(time_col)
    )
    if group_cols:
        dims = agg.select(*group_cols).distinct()
        spine = spine.crossJoin(dims)
    filled = spine.join(agg, on=[time_col, *group_cols], how="left")
    ffill_window = (
        Window.partitionBy(*group_cols)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for col, value in fill.items():
        if isinstance(value, str) and value.lower() == "previous":
            filled = filled.withColumn(
                col, F.last(F.col(col), ignorenulls=True).over(ffill_window)
            )
        else:
            filled = filled.withColumn(col, F.coalesce(F.col(col), F.lit(value)))
    return filled
