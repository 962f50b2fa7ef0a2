"""Declarative quality suites over the live pipeline tables, plus
failure-path coverage (the reference swallows GE failures; we raise).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_lakehouse_spark.pipeline.lakehouse import Lakehouse
from crypto_lakehouse_spark.pipeline.quality import (
    Check,
    Unique,
    bronze_suite,
    enforce,
    run_checks,
    silver_suite,
)
from crypto_lakehouse_spark.sources.trade_feed import trade_feed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lakehouse(spark, tmp_path_factory):
    lh = Lakehouse(spark, str(tmp_path_factory.mktemp("wh_quality")))
    lh.ingest_feed(trade_feed(spark, SF))
    lh.bronze_to_silver(lookback_hours=None)
    return lh


def test_bronze_suite_passes(lakehouse):
    results = enforce(lakehouse.bronze.read(), bronze_suite())
    assert all(r.passed for r in results)


def test_silver_suite_passes(lakehouse):
    results = enforce(lakehouse.silver.read(), silver_suite())
    assert {r.name for r in results} >= {"trade_id_unique", "price_positive"}


def test_corrupt_data_fails_and_counts(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (1, -2.0), (2, 3.0)], ["trade_id", "price"]
    )
    results = run_checks(
        df,
        [Unique("trade_id_unique", ("trade_id",)), Check("price_positive", F.col("price") > 0)],
    )
    by_name = {r.name: r for r in results}
    assert not by_name["trade_id_unique"].passed
    assert by_name["trade_id_unique"].n_failed == 1  # one extra copy
    assert by_name["price_positive"].n_failed == 1
    with pytest.raises(AssertionError, match="price_positive"):
        enforce(df, [Check("price_positive", F.col("price") > 0)])
