"""Mergeable frequent-items (heavy-hitters) summaries (SURVEY B21 family).

Pinot 1.2 ships ``FREQUENTSTRINGSSKETCH`` / ``FREQUENTLONGSSKETCH`` **[P1.2]**
— Apache DataSketches frequent-items sketches stored per segment and merged
at the broker.  This module re-expresses that as relational algebra using the
mergeable-summaries result of Agarwal et al. (PODS'12): a truncated exact
counter set per segment IS a Misra-Gries/SpaceSaving summary, and summaries
merge by summing stored counts while accumulating each segment's truncation
error.

Build (one fact scan, everything after the first aggregate is tiny):

    events -> (segment, item, cnt)        exact hash aggregate, map-side combined
           -> top-k per segment           window rank over segment-local counts
           -> eps per segment             largest dropped count (0 if none)

Merge (operates on segments x k rows — the "stored sketch" scale):

    lower(i) = sum of stored counts of i
    upper(i) = lower(i) + sum of eps over segments where i was NOT stored

Guarantees (deterministic, oracle-reproducible — no randomness anywhere):

- ``lower(i) <= true_count(i) <= upper(i)`` for every stored item;
- any item with ``true_count > sum(eps)`` is stored in at least one segment
  summary, so the merged result cannot miss a true heavy hitter.

At 100 TB the per-segment summaries persist as k-row segment columns (like
Pinot's serialized sketches); merging S segments shuffles S*k rows, never the
fact table.  Ties rank deterministically (count desc, item asc) so the DuckDB
oracle replicates the entire sketch bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def segment_counts(df: DataFrame, seg_col: str, item_col: str) -> DataFrame:
    """Exact per-(segment, item) counts — the operator's ONLY full-data
    shuffle (hash aggregate, map-side combined).  Shared by the summary
    build and the exact side of self-validation, so Spark's exchange reuse
    pays the fact scan once."""
    return (
        df.groupBy(F.col(seg_col).alias("seg"), F.col(item_col).alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# The cached per-segment summary relations (size-1 lifecycle, same pattern
# as similarity._CAND_CACHE): each frequent_summaries call releases the
# previous call's blocks.
_SUMMARY_CACHE: list = []


def frequent_summaries(counts: DataFrame, k: int = 8) -> tuple[DataFrame, DataFrame]:
    """Per-segment truncated counter summaries over ``segment_counts`` output.

    Returns ``(kept, eps)``: ``kept`` holds the top-k (count desc, item asc)
    ``(seg, item, cnt)`` rows per segment; ``eps`` holds one row per segment
    with its truncation error bound (largest dropped count, 0 when nothing
    was dropped).

    Round 11: both outputs derive from ONE cached ``rn <= k+1`` relation —
    the materialized form of exactly what Pinot persists per segment (the
    k-row sketch plus its error bound).  The former shape re-ran the
    upstream fact aggregate + window once per consumer — and the merge /
    validation composition downstream has MANY consumers (total_eps
    broadcast, per-item join, missed-heavy check), several of which execute
    concurrently as broadcast-exchange futures; the b21 query measured 11 s
    from ~10 re-evaluations of the fact aggregate.  Cached, the fact
    pipeline runs once.  ``eps`` is unchanged math: the window orders
    ``cnt`` DESC, so the largest dropped count — ``max(cnt) WHERE rn > k``
    — IS the count at ``rn = k+1`` (pinned by
    test_frequent_eps_from_rank_k_plus_1_matches_max_over_dropped).
    """
    rn = F.row_number().over(
        W.partitionBy("seg").orderBy(F.col("cnt").desc(), F.col("item"))
    )
    summary = counts.withColumn("rn", rn).filter(F.col("rn") <= k + 1).cache()
    while _SUMMARY_CACHE:
        try:
            _SUMMARY_CACHE.pop().unpersist()
        except Exception:
            pass
    _SUMMARY_CACHE.append(summary)
    kept = summary.filter(F.col("rn") <= k).drop("rn")
    eps = summary.groupBy("seg").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == k + 1, F.col("cnt"))), F.lit(0).cast("bigint")
        ).alias("eps")
    )
    return kept, eps


def frequent_merge(kept: DataFrame, eps: DataFrame) -> DataFrame:
    """Merge per-segment summaries into global ``(item, lower, upper)`` bounds.

    ``upper = lower + total_eps - eps_seen`` where ``eps_seen`` is the error
    budget of the segments that DID store the item (their counts are exact
    there, so their eps doesn't apply).  Inputs are segment-summary sized;
    the 1-row ``total_eps`` aggregate broadcasts.
    """
    total = eps.agg(F.sum("eps").alias("total_eps"))
    per_item = (
        kept.join(eps, "seg")
        .groupBy("item")
        .agg(F.sum("cnt").alias("lower"), F.sum("eps").alias("eps_seen"))
    )
    return (
        per_item.join(F.broadcast(total))
        .select(
            "item",
            F.col("lower").cast("bigint").alias("lower"),
            (F.col("lower") + F.col("total_eps") - F.col("eps_seen"))
            .cast("bigint")
            .alias("upper"),
            F.col("total_eps").cast("bigint").alias("total_eps"),
        )
    )
