"""Training-corpus export sink (C30): deterministic shards + manifest.

The last stage of a pretraining data pipeline: after curation/dedup/packing,
the corpus ships to the trainer as N fixed shards that (a) are assigned
deterministically — the same document lands in the same shard on any engine,
any cluster, any rerun, so shard-level resume/caching works — and (b) carry a
manifest the training job can trust without re-scanning the data.  Not a
reference surface (the reference's engine stops at SQL analytics —
SURVEY §0); a brief-mandated pipeline extension alongside C1-C29.

Spark shape (100 TB posture):
- shard id = ``md5_u32(id) % n_shards`` — the same deterministic hash family
  as curation.shuffle_shards (32-bit so residue-class imbalance stays below
  n_shards/2^32), computed map-side;
- exactly ONE shuffle: ``repartition(n_shards, shard)`` co-locates each
  shard before a ``partitionBy('shard')`` write, so every shard directory is
  written by one task (no small-file explosion: files-per-shard == 1 per
  write, not tasks x shards);
- the manifest is a per-shard aggregate of narrow columns (counts, token
  sums, id bounds) written next to the data — re-derivable, never trusted
  blindly (``verify_shards`` recomputes it from the data);
- reads prune: ``read_training_shards(..., shards=[...])`` filters on the
  Hive partition column, so a 1-shard resume reads 1/N of the bytes
  (PartitionFilters, pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.curation import _md5_u32

MANIFEST_DIR = "_manifest"


def shard_assignment(id_col: str, n_shards: int):
    """Deterministic shard id in [0, n_shards): ``md5_u32(id) % n_shards``."""
    if not 1 <= n_shards <= 65536:
        raise ValueError(f"n_shards must be in [1, 65536], got {n_shards}")
    return F.pmod(_md5_u32(id_col), F.lit(n_shards)).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """Write ``df`` as ``n_shards`` deterministic Hive-partitioned shards
    plus a manifest; returns the manifest DataFrame (one row per shard:
    ``shard, n_docs, n_tokens, min_id, max_id``; ``n_tokens`` is null when
    no ``token_col`` is given).

    Rows inside a shard are sorted by id (``sortWithinPartitions``) so the
    byte layout — not just the membership — is reproducible.
    """
    sharded = df.withColumn("shard", shard_assignment(id_col, n_shards))
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    manifest = _manifest_of(sharded, id_col, token_col)
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/{MANIFEST_DIR}")
    return manifest


def _manifest_of(
    sharded: DataFrame, id_col: str, token_col: str | None
) -> DataFrame:
    tok = (
        F.sum(F.col(token_col)).cast("long")
        if token_col
        else F.lit(None).cast("long")
    )
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            tok.alias("n_tokens"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
        .orderBy("shard")
    )


def read_training_shards(
    spark: SparkSession,
    path: str,
    shards: list[int] | None = None,
) -> DataFrame:
    """Read shards back; ``shards`` prunes to the listed partition ids (the
    filter sits on the Hive partition column, so unlisted shard directories
    are never read — PartitionFilters, pinned)."""
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.where(F.col("shard").isin([int(s) for s in shards]))
    return df


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/{MANIFEST_DIR}").orderBy("shard")


def verify_shards(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """Recompute the manifest from the written data and diff it against the
    stored one — the trust-but-verify audit a training job runs before a
    multi-week burn.  Returns rows that DISAGREE (empty == verified)."""
    actual = _manifest_of(
        spark.read.parquet(path), id_col, token_col
    ).withColumnsRenamed(
        {"n_docs": "a_docs", "n_tokens": "a_tokens",
         "min_id": "a_min", "max_id": "a_max"}
    )
    stored = read_manifest(spark, path)
    joined = stored.join(actual, "shard", "full_outer")
    return joined.where(
        ~(
            (F.col("n_docs") == F.col("a_docs"))
            & (F.coalesce(F.col("n_tokens") == F.col("a_tokens"), F.lit(True)))
            & (F.col("min_id") == F.col("a_min"))
            & (F.col("max_id") == F.col("a_max"))
        )
        | F.col("n_docs").isNull()
        | F.col("a_docs").isNull()
    )
