"""Full-registry sweep: time EVERY registered query with the noop sink.

Usage: python tools/registry_sweep.py [out_json] [reps] [name ...]

Methodology (guide §1.4): each query is materialized with the noop sink
(every column of every row computed, nothing written), caches cleared before
every rep so intra-query .cache() materialization is paid inside the timed
region, min of ``reps`` (default 2) reported.  One warm rep at sf0.001 pays
session one-time costs, mirroring bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from real_time_analytics_with_apache_pinot_on_aws_spark import queries as Q  # noqa: E402
from real_time_analytics_with_apache_pinot_on_aws_spark.session import build_session  # noqa: E402


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/sweep.json")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="registry_sweep")
    registry = Q.all_queries()
    names = sys.argv[3:] or sorted(registry)

    warm_dir = "/root/testdata/sf0.001"
    timings: dict[str, float] = {}
    for name in names:
        try:
            registry[name].builder(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"{name}: WARM FAIL {e}", flush=True)
            continue
        best = float("inf")
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"sweep:{name}")
            t0 = time.perf_counter()
            registry[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}", flush=True)
    out.write_text(json.dumps(timings, indent=1))
    total = sum(v for v in timings.values() if v > 0)
    print(f"TOTAL {round(total, 1)}s over {len(timings)} queries -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
