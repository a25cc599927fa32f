"""Scale probe: replicate the sf0.1 events table Nx into /tmp and compare
headline-query latency against the sf0.1 base — evidence that plans scale
linearly (no super-linear shuffle/spill cliffs) beyond fixture sizes.

Run: python tools/scale_probe.py [replication_factor]

Each replica offsets event_id/user_id so keys grow with data (realistic for
user-keyed aggregations); timestamps are left as-is (same day-partition
profile, denser days).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from real_time_analytics_with_apache_pinot_on_aws_spark.session import build_session  # noqa: E402
from real_time_analytics_with_apache_pinot_on_aws_spark import queries as Q  # noqa: E402

PROBES = (
    "flagship_dashboard",
    "b62_upsert_latest",
    "c5_sessionization",
    "b43_ranking_windows",
)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    base_sf = "/root/testdata/sf0.1"
    spark = build_session(app_name="scale_probe")
    from real_time_analytics_with_apache_pinot_on_aws_spark import catalog as C

    ev = C.load_table(spark, base_sf, "events")  # ts surfaced as TimestampType
    n_base = ev.count()

    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    big_dir = f"{tmp}/events_big"
    replicas = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
        .withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000))
        for i in range(factor)
    ]
    big = replicas[0]
    for r in replicas[1:]:
        big = big.unionByName(r)
    big.write.mode("overwrite").parquet(big_dir)

    results = {}
    reg = Q.all_queries()
    for name in PROBES:
        # base timing (warm once, then time)
        reg[name].builder(spark, base_sf).count()
        t0 = time.perf_counter()
        reg[name].builder(spark, base_sf).count()
        base_t = time.perf_counter() - t0
        # big timing: swap the 'events' view to the replicated table.  _prep
        # skips re-registration while sf_dir is unchanged, so the swapped view
        # is what the builder reads.
        spark.read.parquet(big_dir).createOrReplaceTempView("events")
        big_df = reg[name].builder(spark, base_sf)
        big_df.count()  # warm (file listing, codegen for the new scan)
        t0 = time.perf_counter()
        reg[name].builder(spark, base_sf).count()
        big_t = time.perf_counter() - t0
        results[name] = {
            "base_sec": round(base_t, 3),
            f"x{factor}_sec": round(big_t, 3),
            "ratio": round(big_t / base_t, 2),
        }
        # restore the real view for the next probe
        spark._rtap_sf_dir = None  # type: ignore[attr-defined]
    print(json.dumps({"rows_base": n_base, "factor": factor, "probes": results}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
