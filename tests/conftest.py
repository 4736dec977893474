from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixelspark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # local[8], not local[$SPARK_GRAFT_CPUS]: the suite is thousands of
    # tiny actions over tiny frames, where per-task scheduling and
    # per-file costs dominate — measured 274 s -> 226 s on
    # tests/test_matview.py alone at local[8] vs local[32] (r13).
    # Tests verify semantics, never performance, so the bench's CPU
    # contract does not apply here.
    s = get_spark("pixelspark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
