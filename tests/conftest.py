import pytest

from shc_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("shc-tests", cpus=8)
    yield s
