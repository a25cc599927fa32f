from __future__ import annotations

import os

import pytest

from real_time_analytics_with_apache_pinot_on_aws_spark.session import build_session

# Override with SPARK_GRAFT_TEST_SF=/root/testdata/sf0.001 to run the whole
# gate at another scale factor (the driver adjudicates at sf0.01; the
# self-validating thresholds are calibrated to hold at 0.001 and 0.01 both).
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    from tests.oracle_utils import duck_connection

    return duck_connection(SF_DIR)
