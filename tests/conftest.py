import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
# tests exercise every path hundreds of times — session warm-start
# priming would only re-run what the suite runs anyway
os.environ.setdefault("SPARK_GRAFT_WARM_START", "0")


@pytest.fixture(scope="session")
def spark():
    from xml_to_es_spark.session import get_spark

    s = get_spark(app="tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
