import pytest

from paper_layout_parser_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="plp-tests", master="local[4]", shuffle_partitions=8)
    yield s
