"""End-to-end LLM pretraining-data pipeline on this engine.

Chains the C-operator suite the way a production corpus run does — quality
gates, three dedup granularities, decontamination, target-domain selection,
deterministic split, packing accounting, and the sharded export a trainer
consumes — all pure DataFrame plans over the driver's own test fixtures.
Runs standalone:

    python examples/corpus_to_shards.py [sf_dir]   # default /root/testdata/sf0.01
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

from pyspark.sql import functions as F

from real_time_analytics_with_apache_pinot_on_aws_spark import catalog, sinks
from real_time_analytics_with_apache_pinot_on_aws_spark.operators import curation as cur
from real_time_analytics_with_apache_pinot_on_aws_spark.operators import dedup
from real_time_analytics_with_apache_pinot_on_aws_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="corpus_to_shards")
    docs = catalog.load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. rule-based quality gates: Gopher rules, then C4 line shape (the
    #    fixture is unpunctuated word soup, so C4 runs on constructed lines
    #    the same way queries.c29 does)
    gq = cur.gopher_rules(docs, min_words=30, min_stop_hits=1)
    docs = docs.join(gq.where("passes").select("doc_id"), "doc_id", "left_semi")
    n1 = docs.count()

    # 2. dedup, three granularities: exact line boilerplate -> document
    #    near-dup (MinHash-LSH keep-one) -> exact repeated substrings
    lined = docs.select(
        "doc_id", "lang", "source",
        F.regexp_replace("text", r"((\S+ ){7}\S+) ", "$1\n").alias("text"),
    )
    cleaned = dedup.line_dedup(lined).select(
        "doc_id", F.col("clean_text").alias("text")
    ).join(docs.select("doc_id", "lang", "source"), "doc_id")
    pairs = dedup.minhash_lsh_pairs(
        cleaned, "doc_id", "text", num_hashes=16, bands=8, jaccard_threshold=0.5
    )
    drop = pairs.select(F.greatest("id_a", "id_b").alias("doc_id")).distinct()
    cleaned = cleaned.join(drop, "doc_id", "left_anti")
    scrubbed = dedup.exact_substring_dedup(
        cleaned, k=5, min_count=2, min_span_tokens=10
    ).select("doc_id", F.col("clean_text").alias("text")).join(
        cleaned.select("doc_id", "lang", "source"), "doc_id"
    )
    n2 = scrubbed.count()

    # 3. benchmark decontamination (fixture stand-in eval set)
    eval_set = scrubbed.where("doc_id % 97 = 3")
    decon = cur.decontaminate(scrubbed, eval_set, n=3, min_overlap=5)
    train_pool = scrubbed.join(
        decon.where("contaminated").select("doc_id"), "doc_id", "left_anti"
    )
    n3 = train_pool.count()

    # 4. target-domain selection (DSIR toward source 'src0'), then the
    #    deterministic split
    scored = cur.dsir_scores(train_pool, F.col("source") == "src0")
    keep = scored.orderBy(F.desc("sel_key")).limit(max(n3 // 2, 1)).select("doc_id")
    selected = train_pool.join(F.broadcast(keep), "doc_id", "left_semi")
    split = cur.hash_split(selected)

    # 5. packing accounting + sharded export of the train split
    train = split.where("split = 'train'").withColumn(
        "n_tokens", cur.whitespace_token_count(F.col("text"))
    )
    packed = cur.pack_sequences(train, "lang", "n_tokens", 2048)
    out_dir = tempfile.mkdtemp(prefix="shards_")
    manifest = sinks.write_training_shards(
        train, out_dir, n_shards=8, token_col="n_tokens"
    )
    audit = sinks.verify_shards(spark, out_dir, token_col="n_tokens")

    print(f"corpus          : {n0} docs")
    print(f"after quality   : {n1}")
    print(f"after dedup     : {n2}")
    print(f"after decontam  : {n3}")
    print(f"train split     : {train.count()} docs, "
          f"{train.agg(F.sum('n_tokens')).first()[0]} tokens, "
          f"{packed.agg(F.max('first_chunk') + 1).first()[0]} packed chunks")
    print(f"shards          : {manifest.count()} -> {out_dir}")
    print(f"manifest audit  : {'CLEAN' if audit.count() == 0 else 'MISMATCH'}")
    spark.stop()


if __name__ == "__main__":
    main()
