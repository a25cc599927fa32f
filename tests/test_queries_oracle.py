"""The pre-flight for the driver's t2 gate: every registry query vs DuckDB."""

from __future__ import annotations

import pytest

from real_time_analytics_with_apache_pinot_on_aws_spark import queries as Q
from tests.conftest import SF_DIR
from tests.oracle_utils import compare

ALL = Q.all_queries()


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_against_oracle(name, spark, duck):
    q = ALL[name]
    df = q.builder(spark, SF_DIR)
    if q.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert len(df.take(1)) >= 0
        assert df.count() >= 0
        return
    problems = compare(df, duck, q.oracle)
    assert not problems, f"{name}: {problems}"


def test_stdistance_sanity(spark):
    """Known pair: Paris (2.3522, 48.8566) -> London (-0.1276, 51.5072) is
    ~343.5 km great-circle."""
    from real_time_analytics_with_apache_pinot_on_aws_spark import functions as pfn

    pfn.register_all(spark)
    km = spark.sql(
        "SELECT STDISTANCE(2.3522, 48.8566, -0.1276, 51.5072) / 1000 AS km"
    ).collect()[0]["km"]
    assert abs(km - 343.5) < 1.5
