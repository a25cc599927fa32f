"""Mergeable HyperLogLog sketches in pure relational algebra (SURVEY B20/B21).

Spark's ``approx_count_distinct`` answers the *count* form of Pinot's
``DISTINCTCOUNTHLL`` **[P1.2]** but keeps its sketch internal — Pinot's
sketch family (``DISTINCTCOUNTTHETASKETCH`` etc.) additionally supports
set algebra over *stored* sketches **[P1.2]**.  This module materializes the
sketch itself as a column (``array<int>`` of HLL registers), built and merged
with nothing but hash aggregates:

    values -> (group, bucket, rho)    one narrow projection
           -> max(rho) per bucket     partial-merged map-side
           -> dense register array    one collect per group

Registers are UNION-mergeable (element-wise max) — the property that makes
sketches work at 100 TB: per-partition/per-day sketches persist tiny and
roll up exactly, like Pinot storing sketches in segment columns.
Intersection estimates use inclusion-exclusion over union merges.

Accuracy: standard HLL, relative error ~= 1.04/sqrt(2^p) (~1.6% at p=12),
with linear-counting small-range correction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_sketch(
    df: DataFrame, group_cols: Sequence[str], value_col: str, p: int = 12
) -> DataFrame:
    """Per-group HLL register array for ``value_col``.

    Two hash aggregates (both partial-merged map-side): max rho per (group,
    bucket), then a dense ``registers`` array per group.  The sketch column
    is ~2^p small ints regardless of cardinality.
    """
    m = 1 << p
    h = F.xxhash64(F.col(value_col))  # 64-bit hash
    bucket = (h.bitwiseAND(F.lit(m - 1))).alias("_bucket")
    # rho = leading-zero run length (+1) of the remaining 64-p bits: position
    # of the lowest set bit in the value shifted right by p, capped at 64-p+1.
    rest = F.shiftrightunsigned(h, p)
    rho = F.when(rest == 0, F.lit(64 - p + 1)).otherwise(
        # lowest set bit index via bit trick: log2(x & -x) + 1
        (F.log2(rest.bitwiseAND(-rest)) + 1).cast("int")
    )
    per_bucket = (
        df.select(*group_cols, bucket, rho.alias("_rho"))
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_rho").alias("_rho"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_regmap"), i.cast("int")), F.lit(0)),
    )
    return (
        per_bucket.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_bucket").cast("int"), F.col("_rho")))
            ).alias("_regmap")
        )
        .select(*group_cols, dense.alias("registers"))
    )


def hll_merge(registers: Sequence[Column | str]) -> Column:
    """Union of sketches: element-wise max of register arrays (exact —
    merging per-day sketches equals sketching the union)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in registers]
    out = cols[0]
    for c in cols[1:]:
        out = F.zip_with(out, c, lambda a, b: F.greatest(a, b))
    return out


def hll_estimate(registers: Column | str, p: int = 12) -> Column:
    """Cardinality estimate from a register array (double).

    Raw HLL estimate with the standard small-range linear-counting
    correction; alpha constants per Flajolet et al.
    """
    regs = F.col(registers) if isinstance(registers, str) else registers
    m = 1 << p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    inv_sum = F.aggregate(
        regs, F.lit(0.0), lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double"))
    )
    raw = F.lit(alpha * m * m) / inv_sum
    zeros = F.size(F.filter(regs, lambda r: r == 0))
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)


def hll_intersect_estimate(a: Column | str, b: Column | str, p: int = 12) -> Column:
    """|A ∩ B| estimate by inclusion-exclusion: |A| + |B| − |A ∪ B|.

    Error compounds for small intersections (inherent to HLL algebra — theta
    sketches do better; Pinot documents the same caveat)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return hll_estimate(ca, p) + hll_estimate(cb, p) - hll_estimate(hll_merge([ca, cb]), p)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketches — the theta-sketch analog **[P1.2]**
# (DISTINCTCOUNTTHETASKETCH): bounded-size distinct sketches whose set
# algebra (esp. intersection) is far more accurate than HLL
# inclusion-exclusion, because the sketch retains an actual uniform sample
# of the hash space.
# ---------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame, group_cols: Sequence[str], value_col: str, k: int = 256
) -> DataFrame:
    """Per-group sorted array of the k smallest distinct value hashes.

    Scale-safe build: distinct (group, hash) -> per-group window rank ->
    keep k -> collect.  Memory is O(k) per group everywhere; the rank+filter
    happens BEFORE any collect, so no group ever materializes its full
    distinct set.
    """
    from pyspark.sql import Window

    h = F.xxhash64(F.col(value_col))
    distinct = df.select(*group_cols, h.alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        distinct.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("_h")).alias("kmv"))
    )


def _frac(h: Column) -> Column:
    """Map a signed 64-bit hash to (0, 1) uniformly."""
    return h.cast("double") / F.lit(float(2**64)) + F.lit(0.5)


def kmv_estimate(kmv: Column | str, k: int = 256) -> Column:
    """Distinct-count estimate: exact below k; else (k-1)/frac(kth min)."""
    arr = F.col(kmv) if isinstance(kmv, str) else kmv
    exact = F.size(arr).cast("double")
    kth = _frac(F.element_at(arr, k))
    return F.when(F.size(arr) < k, exact).otherwise(F.lit(float(k - 1)) / kth)


def kmv_union(a: Column | str, b: Column | str, k: int = 256) -> Column:
    """Union sketch: k smallest of the merged samples (lossless merge —
    identical to sketching the union)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.slice(F.array_sort(F.array_union(ca, cb)), 1, k)


def kmv_intersect_estimate(a: Column | str, b: Column | str, k: int = 256) -> Column:
    """|A ∩ B| via the standard KMV Jaccard estimator: among the union
    sketch's samples, the fraction present in both sketches, scaled by the
    union estimate."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    u = kmv_union(ca, cb, k)
    in_both = F.size(F.array_intersect(F.array_intersect(u, ca), cb)).cast("double")
    jaccard = in_both / F.size(u).cast("double")
    return jaccard * kmv_estimate(u, k)


# ---------------------------------------------------------------------------
# Tuple sketch — the Integer-Sum Tuple sketch analog **[P1.2]**
# (DISTINCTCOUNTTUPLESKETCH / SUMVALUESINTEGERSUMTUPLESKETCH /
# AVGVALUEINTEGERSUMTUPLESKETCH, Pinot 1.2's org.apache.datasketches Tuple
# family): a KMV-style bounded sketch that retains, for each of the k
# smallest distinct key hashes, an aggregated VALUE (the per-key sum).
# Beyond distinct counting it answers "what is the total/average of X over
# the DISTINCT keys" from the same bounded state: the retained entries are
# a uniform sample of the key space, so sum(values)/theta estimates the
# all-keys sum (theta = sampled hash fraction).
# ---------------------------------------------------------------------------


def tuple_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group Tuple sketch: sorted array of structs
    ``(h: key hash, v: per-key summed value)`` for the k smallest distinct
    key hashes.

    Scale-safe build (same posture as :func:`kmv_sketch`): one per-(group,
    key-hash) partial-merged aggregate computes the EXACT per-key sums,
    a per-group window rank keeps k rows before anything collects, and the
    final collect materializes at most k structs per group — O(k) memory
    per group at any cardinality.
    """
    from pyspark.sql import Window

    h = F.xxhash64(F.col(key_col))
    per_key = (
        df.groupBy(*group_cols, h.alias("_h"))
        .agg(F.sum(F.col(value_col).cast("double")).alias("_v"))
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        per_key.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        # struct arrays sort by their first field — the hash — so the
        # retained entries stay in KMV order
        .agg(F.array_sort(F.collect_list(F.struct("_h", "_v"))).alias("tuples"))
    )


def _tuple_theta(tuples: Column, k: int) -> Column:
    """Sampled fraction of the hash space: 1 when the sketch is exact
    (fewer than k retained keys), else frac(kth smallest hash)."""
    exact = F.size(tuples) < k
    kth = _frac(F.element_at(tuples, k).getField("_h"))
    return F.when(exact, F.lit(1.0)).otherwise(kth)


def tuple_distinct_estimate(tuples: Column | str, k: int = 256) -> Column:
    """Distinct-key estimate — identical math to :func:`kmv_estimate`
    (DISTINCTCOUNTTUPLESKETCH)."""
    arr = F.col(tuples) if isinstance(tuples, str) else tuples
    return kmv_estimate(F.transform(arr, lambda x: x.getField("_h")), k)


def tuple_sum_estimate(tuples: Column | str, k: int = 256) -> Column:
    """SUMVALUESINTEGERSUMTUPLESKETCH analog: the retained entries are a
    uniform hash-space sample of the distinct keys, so the all-keys sum is
    sum(retained values) / theta; exact below k."""
    arr = F.col(tuples) if isinstance(tuples, str) else tuples
    s = F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + x.getField("_v")
    )
    return s / _tuple_theta(arr, k)


def tuple_avg_estimate(tuples: Column | str, k: int = 256) -> Column:
    """AVGVALUEINTEGERSUMTUPLESKETCH analog: mean per-key value over the
    retained sample (theta cancels between the sum and count estimates —
    the ratio estimator the DataSketches Tuple family uses)."""
    arr = F.col(tuples) if isinstance(tuples, str) else tuples
    s = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.getField("_v"))
    return s / F.size(arr).cast("double")


def tuple_union(a: Column | str, b: Column | str, k: int = 256) -> Column:
    """Union of two Tuple sketches: duplicate key hashes MERGE BY SUMMING
    their values (the Integer-Sum Tuple union rule), then the k smallest
    survive.  Pure codegen, and LINEAR in the sketch size: each side's
    hashes are distinct by construction, so any hash appears at most
    TWICE in the sorted concatenation, and the merge zips the sorted
    array against one-element-shifted copies of itself — the shifts are
    built from ONE ``slice``/``concat`` each, OUTSIDE any lambda, so no
    per-element re-evaluation happens (round-7 ADVICE: the previous
    form probed neighbors with ``F.get(merged, i±1)`` INSIDE a
    ``transform`` lambda; higher-order lambdas are interpreted with no
    common-subexpression elimination, so the O(n log n) sort re-ran ~2n
    times per row and the pass was still ~O(n^2 log n) at large k).
    ``zip_with`` null-pads the shorter side, which supplies the
    run-boundary sentinel at both ends; the leading typed-null for the
    prev-shift comes from an out-of-bounds ``F.get``."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    merged = F.array_sort(F.concat(ca, cb))
    n = F.size(merged)
    # next-neighbor: merged shifted left one slot (length n-1; zip_with
    # pads the last position with null)
    nxts = F.slice(merged, 2, F.greatest(n - F.lit(1), F.lit(0)))
    summed = F.zip_with(
        merged,
        nxts,
        lambda x, nx: F.struct(
            x.getField("_h").alias("_h"),
            (
                x.getField("_v")
                + F.coalesce(
                    F.when(
                        nx.getField("_h") == x.getField("_h"),
                        nx.getField("_v"),
                    ),
                    F.lit(0.0),
                )
            ).alias("_v"),
        ),
    )
    # prev-neighbor: merged shifted right one slot behind a typed null
    # (F.get at index -1 is a null of the element type, never an error)
    prevs = F.slice(F.concat(F.array(F.get(merged, -1)), merged), 1, n)
    deduped = F.zip_with(
        summed,
        prevs,
        lambda e, p: F.when(
            F.coalesce(p.getField("_h") != e.getField("_h"), F.lit(True)),
            e,
        ),
    )
    folded = F.filter(deduped, lambda e: e.isNotNull())
    return F.slice(folded, 1, k)
