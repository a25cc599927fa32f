"""Replicate the sf0.1 fixture N x into an sf1-equivalent directory.

Usage: python tools/make_big_sf.py <out_dir> [factor]

Key offsets are applied CONSISTENTLY across fact/dim tables so every join
keeps its selectivity (lineitem.l_orderkey matches the replicated orders,
o_custkey the replicated customers, ...); nation/region are genuine
broadcast dims and stay as-is.  documents get a per-replica token appended
(realistic near-dup corpus, not manufactured identical-text groups — same
rationale as tools/scale_probe.py); embeddings/events replicate with id
offsets only.  Output: <out_dir>/<table>.parquet, one file per table, the
same single-file layout as the fixtures.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from real_time_analytics_with_apache_pinot_on_aws_spark import catalog as C  # noqa: E402
from real_time_analytics_with_apache_pinot_on_aws_spark.session import build_session  # noqa: E402

O, CK, S, P, E, U, D, V = (
    10_000_000, 10_000_000, 10_000_000, 10_000_000,
    10_000_000, 1_000_000, 10_000_000, 10_000_000,
)

OFFSETS = {
    "lineitem": lambda df, i: df.withColumns(
        {
            "l_orderkey": F.col("l_orderkey") + i * O,
            "l_partkey": F.col("l_partkey") + i * P,
            "l_suppkey": F.col("l_suppkey") + i * S,
        }
    ),
    "orders": lambda df, i: df.withColumns(
        {"o_orderkey": F.col("o_orderkey") + i * O, "o_custkey": F.col("o_custkey") + i * CK}
    ),
    "customer": lambda df, i: df.withColumn("c_custkey", F.col("c_custkey") + i * CK),
    "supplier": lambda df, i: df.withColumn("s_suppkey", F.col("s_suppkey") + i * S),
    "part": lambda df, i: df.withColumn("p_partkey", F.col("p_partkey") + i * P),
    "events": lambda df, i: df.withColumns(
        {"event_id": F.col("event_id") + i * E, "user_id": F.col("user_id") + i * U}
    ),
    "documents": lambda df, i: df.withColumns(
        {
            "doc_id": F.col("doc_id") + i * D,
            "text": F.concat(F.col("text"), F.lit(f" replica{i}")) if i else F.col("text"),
        }
    ),
    "embeddings": lambda df, i: df.withColumn("vec_id", F.col("vec_id") + i * V),
    "nation": None,
    "region": None,
}


def main() -> None:
    out = Path(sys.argv[1])
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out.mkdir(parents=True, exist_ok=True)
    spark = build_session(app_name="make_big_sf")
    base_sf = "/root/testdata/sf0.1"
    for table, repl in OFFSETS.items():
        base = C.load_table(spark, base_sf, table)
        if repl is None:
            big = base
        else:
            big = repl(base, 0)
            for i in range(1, factor):
                big = big.unionByName(repl(base, i))
        big.coalesce(1).write.mode("overwrite").parquet(f"{out}/_{table}")
        # move the single part file to <table>.parquet (fixture layout)
        part = next(Path(f"{out}/_{table}").glob("part-*.parquet"))
        part.rename(out / f"{table}.parquet")
        import shutil

        shutil.rmtree(out / f"_{table}")
        print(f"{table}: written", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
