from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# BEFORE the session import: session.py snapshots these into module
# constants at import time, so the old fixture-scope setdefault never
# took effect — the test suite silently ran at local[32], paying the
# 32-way scheduling floor on every tiny action (r14: the 8-core suite
# is measurably faster at test scale, and 32 streaming state stores
# per stateful operator were pure commit overhead).
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

from crypto_lakehouse_spark.session import get_spark_session

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Width caps live at module level above (import-time constants in
    # session.py). Streaming state-store count is pinned by
    # spark.sql.shuffle.partitions at the first micro-batch — 32
    # stores x 4-5 stateful operators per tiny test stream was pure
    # commit overhead (measured: the slowest streaming test 71 s ->
    # 56 s at 8). Cluster/bench runs are untouched (their envs are set
    # externally; these are setdefaults).
    s = get_spark_session("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_ORACLE
