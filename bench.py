"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed as a full execution to collect (analysis + optimization +
execution), after a warm-up query that pays one-time session costs.
"""

from __future__ import annotations

import json
import os
import time

from real_time_analytics_with_apache_pinot_on_aws_spark import queries as Q
from real_time_analytics_with_apache_pinot_on_aws_spark.session import build_session

# Headline set: scan-heavy agg, multi-join, window, top-k, JSON extraction —
# the shapes that dominate the reference's dashboard workload plus the joins
# the MSQE engine adds.
HEADLINE = (
    "flagship_dashboard",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_type_profit",
    "tpch_q18_large_volume_customer",
    "tpch_q21_suppliers_who_kept_waiting",
    "b19_distinctcount",
    "b22_percentile_exact",
    "b39_lookup_join",
    "b41_subqueries_cte",
    "b43_ranking_windows",
    "b48_topk_early_termination",
    "b14_json_match",
    "c5_sessionization",
    "c1_dedup_minhash_lsh",
    "c2_cosine_topk",
    "b62_upsert_latest",
    "c6_startree_rollup",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session(app_name="bench")

    registry = Q.all_queries()
    names = [n for n in HEADLINE if n in registry]

    # Warm-up: run every headline query once at sf0.001 so one-time costs
    # (JIT/whole-stage-codegen compile, broadcast machinery, file listing)
    # are paid outside the timed region — a long-lived cluster amortizes
    # these across thousands of queries; the metric is steady-state latency.
    warm_dir = "/root/testdata/sf0.001"
    warm = warm_dir if os.path.isdir(warm_dir) else sf_dir
    for name in names:
        registry[name].builder(spark, warm).count()
    # One touch at the target SF: view re-registration + file listing.
    registry["flagship_dashboard"].builder(spark, sf_dir).count()

    # Min of two runs: steady-state latency, insulated from one-off GC pauses
    # and cache-materialization jitter (each run re-plans from scratch, so
    # this never measures a stale cached result — only warmed JIT/code paths).
    timings: dict[str, float] = {}
    for name in names:
        # JVM quiesce between queries so late queries aren't taxed for
        # earlier queries' garbage.
        spark.sparkContext._jvm.System.gc()
        # min-of-3: the minimum is the statistic least sensitive to transient
        # machine load (anything above the min is interference, not the plan)
        best = float("inf")
        for _ in range(3):
            # Drop cached relations BEFORE EVERY rep (outside the timed
            # region): queries that .cache() internally (e.g. minhash LSH's
            # shingle relation) must pay materialization in each rep — the
            # min must never time a cached re-run.
            spark.catalog.clearCache()
            start = time.perf_counter()
            df = registry[name].builder(spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - start)
            assert n >= 0
        timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
