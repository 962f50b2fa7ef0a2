"""Bucketed co-located joins: the pre-shuffle strategy for repeated
big-big joins (SURVEY §4 / the 100 TB story for orders ⋈ lineitem).

Writing both sides bucketed by the join key with the same bucket count
lets Spark plan the join with NO exchange of either side — at 100 TB
that's the difference between a full-network shuffle per query and
none. The test pins that plan property.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_lakehouse_spark.io import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucket_db(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdemo LOCATION '{tmp_path}'")
    yield "buckdemo"
    spark.sql("DROP DATABASE IF EXISTS buckdemo CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    lineitem = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(f"{bucket_db}.orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"{bucket_db}.lineitem_b")
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(f"{bucket_db}.orders_b").join(
            spark.table(f"{bucket_db}.lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle either side"
        # And it still computes the right thing.
        n = joined.count()
        expected = (
            load_table(spark, SF, "lineitem")
            .join(load_table(spark, SF, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
