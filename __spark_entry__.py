"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``real_time_analytics_with_apache_pinot_on_aws_spark``
(see SURVEY.md §2 for the operator inventory each query maps to).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from real_time_analytics_with_apache_pinot_on_aws_spark import queries as _Q


def _tune(spark: SparkSession) -> None:
    """Apply session-level conf the engine needs (the driver owns the session)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # already-read datasets keep their schema; new reads pick this up
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _tune(spark)
    return _Q.all_queries()["flagship_dashboard"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in _Q.all_queries().items():
        def make(b):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                _tune(spark)
                return b(spark, sf_dir)

            return run

        out[name] = make(q.builder)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; approx/non-SQL ops omitted (rows-only)."""
    return _Q.oracle_sql()
