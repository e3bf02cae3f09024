import pytest

from pyspark_entity_resolution_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="er-engine-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
