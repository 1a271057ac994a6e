from __future__ import annotations

import pytest

from energy_data_pipeline_project_spark.session import get_spark_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: sf0.1-scale gates (run by default; deselect with -m 'not slow')",
    )


@pytest.fixture(scope="session")
def spark():
    spark = get_spark_session(app_name="engine-tests", master="local[4]",
                              shuffle_partitions=8)
    yield spark
    spark.stop()

