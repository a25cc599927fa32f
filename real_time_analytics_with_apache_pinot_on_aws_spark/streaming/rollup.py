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

# "hll" = Pinot's DISTINCTCOUNTHLL functionColumnPair **[P1.2]**: the cell
# stores a DataSketches HLL sketch (Spark's native hll_sketch_agg, a
# ~KB binary regardless of cardinality); merge = hll_union_agg (register
# max — union of per-batch sketches is EXACTLY the sketch of the union,
# pinned), estimate applied at serve time.  The one non-trivially-algebraic
# Pinot star-tree metric, mergeable because the SKETCH is the stored value.
_PARTIAL_FNS = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "hll": F.hll_sketch_agg,
}
_MERGE_FNS = {
    "sum": F.sum,
    "count": F.sum,
    "min": F.min,
    "max": F.max,
    "hll": F.hll_union_agg,
}


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
                    f"(algebraic or sketch only: {sorted(_PARTIAL_FNS)})"
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
    for out, (fn, _col) in spec.metrics.items():
        if fn == "hll":
            # callers read the ESTIMATE (bigint, what Pinot's
            # DISTINCTCOUNTHLL returns), not the merged binary sketch;
            # coalesced to 0 like the SQL surface (round 9) — a group
            # whose values are all NULL has ZERO distinct values, and an
            # estimate-vs-0 split between routed and scanned answers
            # would break the bit-for-bit contract
            merged = merged.withColumn(
                out, F.coalesce(F.hll_sketch_estimate(out), F.lit(0))
            )
    for out, (s, c) in (avgs or {}).items():
        merged = merged.withColumn(out, F.col(s) / F.col(c))
    return merged


# ---------------------------------------------------------------------------
# Star-tree SELECTION analog: Pinot doesn't just *store* star-trees, its
# servers automatically ROUTE a matching group-by to the pre-agg and fall
# back to the raw scan otherwise **[P1.2]**.  RollupRouter is that decision,
# made once per request at the API layer (SURVEY §4 rules out a custom
# Catalyst rule; the routing algebra is identical either way).
# ---------------------------------------------------------------------------

from typing import Callable  # noqa: E402

_SERVABLE = ("sum", "count", "min", "max", "avg", "distinctcounthll")


@dataclass(frozen=True)
class AggRequest:
    """A declarative group-by request: the shape star-tree routing matches.

    ``aggs`` maps output column -> (fn, input column), fn in
    sum/count/min/max/avg; ``dim_filters`` maps dimension -> allowed values
    (IN semantics).  Pinot's star-tree applies under the same conditions:
    group-bys and filters on indexed dimensions, algebraic aggregates on
    indexed metrics.
    """

    dims: tuple[str, ...]
    aggs: dict[str, tuple[str, str]]
    dim_filters: dict[str, tuple] = field(default_factory=dict)


class RollupRouter:
    """Route an :class:`AggRequest` to a covering rollup, else the raw scan.

    A rollup covers a request iff (a) the requested dims AND filtered dims
    are a subset of the rollup dims, and (b) every aggregate is derivable
    from stored metrics: sum/count/min/max need an exact (fn, col) metric;
    avg needs ('sum', col) + ('count', col).  Holistic aggregates (exact
    distinct, percentile) can never match — RollupSpec already rejects them
    at build time, so routing stays sound by construction.

    At 100 TB the routed path reads |cells| pre-agg rows (typically 3-6
    orders of magnitude fewer bytes) with the same single shuffle; the
    fallback is exactly the query the caller would have written by hand —
    routing never changes results, only the scan (pinned by tests).
    """

    def __init__(self, base_scan: Callable[[], DataFrame]) -> None:
        self._base_scan = base_scan
        self._rollups: list[tuple[str, Callable[[], DataFrame], RollupSpec]] = []

    def register(
        self, name: str, rollup_scan: Callable[[], DataFrame], spec: RollupSpec
    ) -> None:
        self._rollups.append((name, rollup_scan, spec))

    @staticmethod
    def _metric_map(spec: RollupSpec, req: AggRequest) -> dict[str, tuple] | None:
        """out -> ('direct', fn, stored) | ('avg', sum_stored, cnt_stored)."""
        by_pair = {pair: out for out, pair in spec.metrics.items()}
        mapping: dict[str, tuple] = {}
        for out, (fn, col) in req.aggs.items():
            if fn not in _SERVABLE:
                return None
            if fn == "avg":
                s, c = by_pair.get(("sum", col)), by_pair.get(("count", col))
                if s is None or c is None:
                    return None
                mapping[out] = ("avg", s, c)
            elif fn == "distinctcounthll":
                stored = by_pair.get(("hll", col))
                if stored is None:
                    return None
                mapping[out] = ("hll", stored)
            else:
                stored = by_pair.get((fn, col))
                if stored is None:
                    return None
                mapping[out] = ("direct", fn, stored)
        return mapping

    def _covering(self, req: AggRequest):
        needed = set(req.dims) | set(req.dim_filters)
        for name, scan, spec in self._rollups:
            if not needed <= set(spec.dims):
                continue
            mapping = self._metric_map(spec, req)
            if mapping is not None:
                return name, scan, mapping
        return None

    def answer(self, req: AggRequest) -> tuple[DataFrame, str]:
        """(result, route) where route is 'rollup:<name>' or 'scan'."""
        choice = self._covering(req)
        if choice is None:
            df = self._base_scan()
            for dim, values in req.dim_filters.items():
                df = df.filter(F.col(dim).isin(list(values)))
            # the fallback accepts ANY Spark aggregate (median, percentile,
            # count distinct, ...) — routing restricts what a ROLLUP can
            # serve, never what the engine can answer
            def scan_expr(fn: str, col: str) -> str:
                if fn == "distinctcounthll":
                    # the SAME DataSketches estimator the rollup path uses,
                    # so routed and scanned answers agree bit-for-bit
                    # (union of per-batch sketches == sketch of the union)
                    return (
                        "coalesce(hll_sketch_estimate("
                        f"hll_sketch_agg({col})), 0)"
                    )
                return f"{fn}({col})"

            out = df.groupBy(*req.dims).agg(
                *[
                    F.expr(scan_expr(fn, col)).alias(o)
                    for o, (fn, col) in req.aggs.items()
                ]
            )
            return out, "scan"
        name, scan, mapping = choice
        cells = scan()
        for dim, values in req.dim_filters.items():
            cells = cells.filter(F.col(dim).isin(list(values)))
        merge_exprs = []
        hll_outs = []
        for out, m in mapping.items():
            if m[0] == "direct":
                _, fn, stored = m
                merge_exprs.append(_MERGE_FNS[fn](stored).alias(out))
            elif m[0] == "hll":
                merge_exprs.append(F.hll_union_agg(m[1]).alias(out))
                hll_outs.append(out)
        # avg components merge under temp names, divided after
        avg_parts: dict[str, tuple[str, str]] = {}
        for out, m in mapping.items():
            if m[0] == "avg":
                _, s, c = m
                merge_exprs.append(F.sum(s).alias(f"__{out}_sum"))
                merge_exprs.append(F.sum(c).alias(f"__{out}_cnt"))
                avg_parts[out] = (f"__{out}_sum", f"__{out}_cnt")
        merged = cells.groupBy(*req.dims).agg(*merge_exprs)
        for out in hll_outs:
            merged = merged.withColumn(
                out, F.coalesce(F.hll_sketch_estimate(out), F.lit(0))
            )
        for out, (s, c) in avg_parts.items():
            merged = merged.withColumn(out, F.col(s) / F.col(c))
        merged = merged.select(*req.dims, *req.aggs)
        return merged, f"rollup:{name}"
