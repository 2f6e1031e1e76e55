import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from hoover_spark.session import get_spark

    s = get_spark("hoover_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
