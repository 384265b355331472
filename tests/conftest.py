from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from chat_data_pipeline_spark import get_spark

    spark = get_spark(app_name="cdp-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()
