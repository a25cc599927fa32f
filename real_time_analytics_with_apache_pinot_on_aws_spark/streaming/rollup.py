"""Star-tree analog: incremental pre-aggregated rollup (SURVEY §4, extension).

Pinot's star-tree index pre-aggregates metric columns over dimension
combinations inside each segment, so group-by queries on those dimensions read
pre-agg'd cells instead of raw rows **[P1.2]** (the feature is NOT configured
in the reference deployment — kinesisTableConfigFile.json:12-27 has no
``starTreeIndexConfigs`` — so this is an extension, flagged out of minimum
scope by SURVEY §4 and built here because it is *the* scale lever for
dashboard workloads: the flagship clickstream query drops from scanning every
event to scanning one row per (dims × day) cell).

Spark-first design — no custom Catalyst rule, just algebra:

- :func:`rollup_batch` partial-aggregates one micro-batch (segment analog)
  to (dims…, partial metrics).  Appended per batch by the ingest pipeline,
  the rollup table is an append-only log of partial cells — same lifecycle
  as the data itself, no read-modify-write, safe under concurrent appends.
- :func:`serve` answers a group-by on any SUBSET of the rollup dimensions by
  merging partials (sum of partial sums/counts, min of mins, max of maxes;
  avg = merged sum / merged count).  This is exactly Spark's own
  partial/final aggregation split, materialized across time instead of
  across tasks.

Mergeability rule: only algebraic aggregates (sum/count/min/max, and avg as
sum+count) may live in a rollup; holistic ones (exact distinct, percentile)
are rejected at spec time rather than silently wrong.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL_FNS = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_MERGE_FNS = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


@dataclass(frozen=True)
class RollupSpec:
    """Which dimensions and metrics the rollup maintains.

    ``metrics`` maps output column -> (fn, input column), fn in
    sum/count/min/max.  ``avg`` requests are expressed by the caller as a
    sum and a count metric and divided at serve time.
    """

    dims: tuple[str, ...]
    metrics: dict[str, tuple[str, str]] = field(default_factory=dict)

    def __post_init__(self) -> None:
        for out, (fn, _col) in self.metrics.items():
            if fn not in _PARTIAL_FNS:
                raise ValueError(
                    f"rollup metric {out!r}: {fn!r} is not mergeable "
                    f"(algebraic only: {sorted(_PARTIAL_FNS)})"
                )


def rollup_batch(batch_df: DataFrame, spec: RollupSpec) -> DataFrame:
    """Partial-aggregate one micro-batch / segment into rollup cells."""
    return batch_df.groupBy(*spec.dims).agg(
        *[_PARTIAL_FNS[fn](col).alias(out) for out, (fn, col) in spec.metrics.items()]
    )


def serve(
    rollup_df: DataFrame,
    spec: RollupSpec,
    dims: Sequence[str],
    avgs: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Answer ``GROUP BY dims`` (any subset of spec.dims) from the rollup.

    ``avgs`` maps output column -> (sum metric, count metric) computed as
    merged-sum / merged-count.  Reads |cells| rows instead of |events| —
    at 100 TB the rollup is typically 3-6 orders of magnitude smaller.
    """
    missing = set(dims) - set(spec.dims)
    if missing:
        raise ValueError(f"cannot serve dims {sorted(missing)}: not in rollup {spec.dims}")
    merged = rollup_df.groupBy(*dims).agg(
        *[_MERGE_FNS[fn](out).alias(out) for out, (fn, _col) in spec.metrics.items()]
    )
    for out, (s, c) in (avgs or {}).items():
        merged = merged.withColumn(out, F.col(s) / F.col(c))
    return merged
