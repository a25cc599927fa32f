from __future__ import annotations

import pytest

from real_time_analytics_with_apache_pinot_on_aws_spark.session import build_session

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    from tests.oracle_utils import duck_connection

    return duck_connection(SF_DIR)
