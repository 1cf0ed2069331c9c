from __future__ import annotations

import pytest

from mypipe_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mypipe_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


def drain_stream(q):
    """processAllAvailable + guaranteed stop — a raising drain must
    not leak a running StreamingQuery into the session-scoped spark
    fixture shared by later tests."""
    try:
        q.processAllAvailable()
    finally:
        q.stop()
