"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over crypto_lakehouse_spark.queries: every operator from
SURVEY.md §2 (and the extended large-scale pipeline surface) is
registered there as a (spark_fn, oracle_sql) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crypto_lakehouse_spark import queries as _queries  # noqa: E402
from crypto_lakehouse_spark.queries.registry import REGISTRY  # noqa: E402

_queries.load_all()

_FLAGSHIP = "ohlcv_1m"
_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY[_FLAGSHIP].spark_fn(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Presented in REGISTRY order on purpose: `queries.load_all()` has
    already reordered the registry so that queries without a driver-
    green row in any past CORRECTNESS_r*.json come FIRST — the
    driver's correctness gate checks the first 50 entries, so every
    round's newest operators land inside the checked window with zero
    manual bookkeeping (VERDICT r8 item 10)."""
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted => rows-only)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
