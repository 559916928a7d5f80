import pytest

from open_tlm_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("open-tlm-spark-tests", shuffle_partitions=8)
    yield s
