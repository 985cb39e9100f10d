from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")
# Spark python workers must resolve chopin_spark AND the test modules
# whose functions ride inside UDF closures.
os.environ["PYTHONPATH"] = (
    "/root/repo:/root/repo/tests:" + os.environ.get("PYTHONPATH", "")
)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from chopin_spark.session import get_session

    s = get_session(master="local[8]", app_name="chopin-tests",
                    shuffle_partitions=8)
    yield s
    s.stop()
