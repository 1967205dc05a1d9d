import pytest

from scalable_blocking_for_privacy_preserving_record_linkage_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pprl-tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
