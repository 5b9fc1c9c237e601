import pytest


@pytest.fixture(scope="session")
def spark():
    from earthmover_spark import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
