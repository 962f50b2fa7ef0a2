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


# Newest operators this round, presented LAST: the driver's
# correctness sample favors the head and tail of the listing, so the
# queries with the least sampling history rotate into the tail —
# keeping every round's newest additions inside the driver's check
# (VERDICT r8 item 10).
_NEWEST_THIS_ROUND = [
    "idf_cosine_thresholded",
    "multimodal_png_roundtrip",
    "ivf_pq_topk",
    "lsh_band_sweep_eval",
    "bigram_lm_doc_score",
    "zipf_slope_by_source",
    "token_burstiness_dispersion",
    "variance_ratio_daily",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    newest = [n for n in _NEWEST_THIS_ROUND if n in REGISTRY]
    ordered = [n for n in REGISTRY if n not in newest] + newest
    return {name: REGISTRY[name].spark_fn for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted => rows-only)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
