"""Upsert / dedup table semantics (SURVEY §2.B B62) + skew-safe aggregation.

Pinot's upsert-enabled realtime tables (a Pinot 1.2 feature, not configured in
the reference deployment — kinesisTableConfigFile.json has no ``upsertConfig``)
keep every ingested row in immutable segments and resolve "the current row per
primary key" at query time via a validDocIds bitmap **[P1.2]**.  That design —
append-only storage, query-time resolution — is exactly what scales, and it
maps to Spark directly: the table stays an append-only parquet log (see
streaming/ingest.py) and these operators compute the resolved view.

Two Pinot modes are mirrored:

- **Full upsert**: the latest row per key wins (:func:`latest_by_key`).
- **Partial upsert**: per-column merge strategies (``OVERWRITE``, ``IGNORE``,
  ``SUM``, ``MAX``, ``MIN``, ``APPEND``) **[P1.2]** (:func:`partial_upsert`).

Both are single hash aggregations — ``max_by(struct(...), order)`` — not
row_number windows: an aggregate partial-merges map-side and needs no sort,
so the resolved view of a 100 TB log is one shuffle on the primary key.

``salted_agg`` is the skew-safety pattern for exactly that shuffle when one
key is hot (the reference's clickstream shape: one viral campaign can be 30%
of events): pre-aggregate on (key, salt) so the hot key fans out over N
reducers, then finish on key.  AQE's skew-join handling covers joins; salting
covers aggregation skew, which AQE does not rebalance.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _order_struct(order_cols: Sequence[str]) -> Column:
    """Lexicographic comparator for max_by/min_by — last writer wins needs a
    total order, so callers must include a unique tiebreaker column."""
    return F.struct(*[F.col(c) for c in order_cols])


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Full-upsert resolved view: the row with the greatest ``order_cols``
    per ``key_cols`` (Pinot: comparison column, default the time column).

    One hash aggregate — ``max_by(struct(payload), struct(order))`` — with
    map-side partial merge; the only shuffle is on the primary key.  Column
    order and names of ``df`` are preserved.

    ``delete_col`` mirrors Pinot's upsert ``deleteRecordColumn`` **[P1.2]**:
    a boolean column marking tombstone records.  If the LATEST version of a
    key is a tombstone, the key disappears from the resolved view (soft
    delete, still query-time — the append-only log keeps every version).
    The flag rides the same aggregate; no second pass.
    """
    payload = [c for c in df.columns if c not in key_cols]
    agg = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), _order_struct(order_cols)).alias("_latest")
    )
    if delete_col is not None:
        agg = agg.filter(~F.coalesce(F.col(f"_latest.{delete_col}"), F.lit(False)))
    out_cols = [c for c in payload if c != delete_col]
    return agg.select(*key_cols, *[F.col(f"_latest.{c}").alias(c) for c in out_cols])


def first_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """Dedup-table resolved view: the EARLIEST row per key **[P1.2]**.

    Pinot's ``dedupConfig`` (a sibling of upsertConfig) drops any record
    whose primary key was already ingested — first writer wins, the mirror
    image of upsert's last-writer-wins.  Same single ``min_by(struct(...))``
    hash aggregate as :func:`latest_by_key`, same one primary-key shuffle;
    Pinot enforces it at ingest with server-side key metadata, we resolve at
    query time over the append-only log (the log stays available raw, which
    Pinot's in-place drop cannot offer).
    """
    payload = [c for c in df.columns if c not in key_cols]
    agg = df.groupBy(*key_cols).agg(
        F.min_by(F.struct(*payload), _order_struct(order_cols)).alias("_first")
    )
    return agg.select(*key_cols, *[F.col(f"_first.{c}").alias(c) for c in payload])


#: Pinot partial-upsert strategies **[P1.2]** -> aggregate expression builders.
#: OVERWRITE = value from the latest row; IGNORE = value from the earliest row
#: (Pinot: keep the first seen, ignore updates); SUM/MAX/MIN accumulate;
#: APPEND concatenates in arrival order.
_STRATEGIES = {
    "OVERWRITE": lambda c, order: F.max_by(F.col(c), order),
    "IGNORE": lambda c, order: F.min_by(F.col(c), order),
    "SUM": lambda c, order: F.sum(c),
    "MAX": lambda c, order: F.max(c),
    "MIN": lambda c, order: F.min(c),
    "APPEND": lambda c, order: F.array_sort(
        F.collect_list(F.struct(order.alias("o"), F.col(c).alias("v")))
    ).getField("v"),
}


def partial_upsert(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    strategies: dict[str, str],
    delete_col: str | None = None,
) -> DataFrame:
    """Partial-upsert resolved view: per-column merge strategies.

    ``strategies`` maps column -> one of OVERWRITE/IGNORE/SUM/MAX/MIN/APPEND
    (Pinot's ``partialUpsertStrategies`` **[P1.2]**); unlisted payload columns
    default to OVERWRITE, matching Pinot's default.  Still one hash aggregate.

    ``delete_col`` defines the PARTIAL-mode ``deleteRecordColumn`` interplay
    (Pinot 1.2 semantics **[P1.2]**): a tombstone discards ALL accumulated
    state up to and including itself — later partials REBUILD the row from
    scratch (the merge restarts against an empty base, so e.g. a SUM column
    resumes from the post-tombstone rows only), and a key whose latest
    version is a tombstone disappears from the view entirely.  Implemented
    as: last-tombstone position per key (one aggregate), then the strategy
    merge over the strictly-later rows — the tombstone aggregate, the
    rewind join, and the final merge all hash-partition on the primary key,
    so the resolved view of a 100 TB log stays co-partitioned end-to-end.
    """
    order = _order_struct(order_cols)
    if delete_col is not None:
        tombs = (
            df.filter(F.coalesce(F.col(delete_col), F.lit(False)))
            .groupBy(*key_cols)
            .agg(F.max(order).alias("_tomb"))
        )
        df = (
            df.join(tombs, list(key_cols), "left")
            .filter(F.col("_tomb").isNull() | (order > F.col("_tomb")))
            .drop("_tomb", delete_col)
        )
    aggs = []
    for c in df.columns:
        if c in key_cols:
            continue
        strat = strategies.get(c, "OVERWRITE").upper()
        if strat not in _STRATEGIES:
            raise ValueError(f"unknown partial-upsert strategy {strat!r} for column {c!r}")
        aggs.append(_STRATEGIES[strat](c, order).alias(c))
    return df.groupBy(*key_cols).agg(*aggs)


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe two-phase aggregation for algebraic aggregates.

    ``aggs`` maps output column -> (fn, input column) with fn in
    {sum, count, min, max}.  Phase 1 aggregates on (key, salt) where salt is a
    deterministic hash-spread of the row, fanning a hot key over ``n_salts``
    reducers; phase 2 merges the per-salt partials on the key alone.  Results
    are identical to the direct aggregate (tested against it); the cost is one
    extra — but tiny, pre-aggregated — shuffle.

    count re-merges as sum of partial counts; avg callers compose sum/count.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for out, (fn, col) in aggs.items():
        if fn not in phase1_fn:
            raise ValueError(f"salted_agg supports {sorted(phase1_fn)}, got {fn!r} for {out!r}")

    salt = (F.xxhash64(*[F.col(c) for c in df.columns]) % n_salts).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*[phase1_fn[fn](col).alias(out) for out, (fn, col) in aggs.items()])
    )
    return partial.groupBy(*key_cols).agg(
        *[merge_fn[fn](out).alias(out) for out, (fn, _col) in aggs.items()]
    )
