"""Mergeable quantile sketches (SURVEY B22: PERCENTILEEST/TDIGEST/KLL analog)
in pure relational algebra — DDSketch-style logarithmic buckets.

Spark's ``percentile_approx`` answers the query-time form; Pinot's percentile
sketch family additionally supports *stored, mergeable* sketches rolled up
across segments/days **[P1.2]**.  DDSketch (Masson et al., VLDB'19 — public
algorithm) is the relational-friendly choice: a value ``x > 0`` lands in
bucket ``ceil(log_gamma(x))``, giving a guaranteed relative error
``alpha = (gamma-1)/(gamma+1)`` per quantile; a sketch is just (bucket ->
count), so:

- build  = one groupBy count            (partial-merged map-side)
- merge  = sum counts per bucket        (exactly lossless)
- query  = cumulative-count walk        (one window over ~hundreds of rows)

Zero and negative values get dedicated buckets (DDSketch's standard
extension).  Encoding keeps the cumulative walk in VALUE order: a positive
value's raw log-bucket ``b`` (which is itself negative for x < 1) is stored
as ``b + _OFF``, zero as the sentinel ``0``, and a negative value's raw
bucket as ``-b - _OFF`` — so every negative-range code < 0 < every
positive-range code, and within each range codes sort by value.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_OFF = 10**9  # sentinel offset separating negative / zero / positive ranges


def _gamma(alpha: float) -> float:
    return (1 + alpha) / (1 - alpha)


def dd_sketch(
    df: DataFrame, group_cols: Sequence[str], value_col: str, alpha: float = 0.01
) -> DataFrame:
    """(group, bucket, n) sketch rows with relative-error ``alpha``.

    One hash aggregate; the sketch is ~log_gamma(max/min) rows per group
    (a few hundred for doubles at alpha=1%) regardless of row count.
    """
    g = _gamma(alpha)
    v = F.col(value_col).cast("double")
    log_g = math.log(g)
    bucket = (
        F.when(v > 0, F.ceil(F.log(v) / F.lit(log_g)).cast("long") + F.lit(_OFF))
        .when(v < 0, -F.ceil(F.log(-v) / F.lit(log_g)).cast("long") - F.lit(_OFF))
        .otherwise(F.lit(0))
    )
    return (
        df.filter(v.isNotNull())
        .groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


def dd_merge(sketches: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Merge sketch rows (e.g. per-day partials) — losslessly, by summing
    counts per bucket."""
    return sketches.groupBy(*group_cols, "bucket").agg(F.sum("n").alias("n"))


def dd_quantile(
    sketch: DataFrame, group_cols: Sequence[str], q: float, alpha: float = 0.01
) -> DataFrame:
    """Per-group quantile estimate from a sketch: the value of the first
    bucket whose cumulative count reaches ``q * total``.

    Bucket -> representative value: the geometric midpoint
    ``2 * gamma^bucket / (gamma + 1)``, which realizes the alpha guarantee.
    """
    g = _gamma(alpha)
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    neg = F.col("bucket") < 0
    pos = F.col("bucket") > 0
    raw_bucket = (
        F.when(neg, -(F.col("bucket") + F.lit(_OFF)))
        .otherwise(F.col("bucket") - F.lit(_OFF))
    )
    rep = (
        F.when(F.col("bucket") == 0, F.lit(0.0))
        .when(
            neg,
            -F.lit(2.0) * F.pow(F.lit(g), raw_bucket.cast("double")) / F.lit(g + 1),
        )
        .when(pos, F.lit(2.0) * F.pow(F.lit(g), raw_bucket.cast("double")) / F.lit(g + 1))
    )
    ranked = sketch.select(
        *group_cols,
        "bucket",
        rep.alias("_rep"),
        F.sum("n").over(w_cum).alias("_cum"),
        F.sum("n").over(w_all).alias("_total"),
    )
    hits = ranked.filter(F.col("_cum") >= F.lit(q) * F.col("_total"))
    w_first = Window.partitionBy(*group_cols).orderBy("bucket")
    return (
        hits.withColumn("_rn", F.row_number().over(w_first))
        .filter(F.col("_rn") == 1)
        .select(*group_cols, F.col("_rep").alias(f"q{int(q * 100)}"))
    )
