import pytest

from dbp_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dbp-etl-spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
