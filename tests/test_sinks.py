"""C30 training-shard export sink: determinism, balance, conservation,
manifest audit, and partition-pruned resume reads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_analytics_with_apache_pinot_on_aws_spark import sinks as S
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    from real_time_analytics_with_apache_pinot_on_aws_spark import queries as Q

    Q._prep(spark, SF_DIR)
    return spark.table("documents").select("doc_id", "text", "lang", "n_chars")


def test_shard_write_round_trip_conserves_everything(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    manifest = S.write_training_shards(
        docs, path, n_shards=8, token_col="n_chars"
    ).collect()
    back = S.read_training_shards(spark, path)
    # conservation: every doc exactly once, token totals intact
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    assert (
        back.agg(F.sum("n_chars")).first()[0]
        == docs.agg(F.sum("n_chars")).first()[0]
    )
    # manifest sums match the data
    assert sum(r["n_docs"] for r in manifest) == docs.count()
    assert {r["shard"] for r in manifest} == set(range(8))
    # stored manifest survives the round trip
    stored = S.read_manifest(spark, path).collect()
    assert [tuple(r) for r in stored] == [tuple(r) for r in manifest]


def test_shard_assignment_is_deterministic_and_balanced(spark, docs, tmp_path):
    a = {
        r["doc_id"]: r["shard"]
        for r in docs.select(
            "doc_id", S.shard_assignment("doc_id", 32).alias("shard")
        ).collect()
    }
    b = {
        r["doc_id"]: r["shard"]
        for r in docs.select(
            "doc_id", S.shard_assignment("doc_id", 32).alias("shard")
        ).collect()
    }
    assert a == b
    # md5-uniform: 500 docs over 32 shards, every shard populated, no shard
    # grossly hot (binomial p=1/32, mean ~15.6)
    from collections import Counter

    sizes = Counter(a.values())
    assert set(sizes) == set(range(32))
    assert max(sizes.values()) <= 32 and min(sizes.values()) >= 4
    with pytest.raises(ValueError, match="n_shards"):
        S.shard_assignment("doc_id", 0)


def test_shard_read_prunes_partitions(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    S.write_training_shards(docs, path, n_shards=8)
    pruned = S.read_training_shards(spark, path, shards=[3, 5])
    assert set(r["shard"] for r in pruned.select("shard").distinct().collect()) == {3, 5}
    # the filter reaches the Hive partition column: unlisted shard dirs are
    # never read (a 1-shard resume reads 1/N of the bytes)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan
    assert pruned.rdd.getNumPartitions() <= 8


def test_manifest_audit_catches_tampering(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    S.write_training_shards(docs, path, n_shards=4, token_col="n_chars")
    assert S.verify_shards(spark, path, token_col="n_chars").count() == 0
    # tamper: overwrite the stored manifest with a wrong doc count
    bad = S.read_manifest(spark, path).withColumn(
        "n_docs", F.col("n_docs") + F.lit(1)
    )
    bad.coalesce(1).write.mode("overwrite").parquet(f"{path}/{S.MANIFEST_DIR}")
    assert S.verify_shards(spark, path, token_col="n_chars").count() == 4


def test_shard_layout_is_reproducible(spark, docs, tmp_path):
    """Two writes of the same data produce identical shard membership AND
    identical within-shard order (sortWithinPartitions by id)."""
    p1, p2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    S.write_training_shards(docs, p1, n_shards=8)
    S.write_training_shards(docs, p2, n_shards=8)
    a = [
        (r["shard"], r["doc_id"])
        for r in S.read_training_shards(spark, p1)
        .orderBy("shard", "doc_id")
        .select("shard", "doc_id")
        .collect()
    ]
    b = [
        (r["shard"], r["doc_id"])
        for r in S.read_training_shards(spark, p2)
        .orderBy("shard", "doc_id")
        .select("shard", "doc_id")
        .collect()
    ]
    assert a == b and len(a) == docs.count()
