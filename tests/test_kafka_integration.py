"""Kafka connector integration (VERDICT r6 item 6): the one seam a
real user hits first — `kafka_reader` reproduces the reference's
options but the spark-sql-kafka jar is absent here, so everything
downstream of `.load()` is proven via the wire-schema simulation
(tests/test_streaming_medallion.py). This module closes the seam the
moment the environment allows: it SKIPS unless BOTH the kafka
connector classes are on the session classpath AND a broker address
is provided via SPARK_GRAFT_KAFKA_BOOTSTRAP; when both hold, it
round-trips parse_kafka_feed against the real source end-to-end."""

from __future__ import annotations

import json
import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")


def _kafka_classes_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def test_kafka_roundtrip_parse_feed(spark, tmp_path):
    if not BOOTSTRAP:
        pytest.skip("SPARK_GRAFT_KAFKA_BOOTSTRAP not set (no broker)")
    if not _kafka_classes_on_classpath(spark):
        pytest.skip("spark-sql-kafka jar not on the session classpath")

    from pyspark.sql import functions as F

    from crypto_lakehouse_spark.streaming.file_stream import (
        kafka_reader,
        parse_kafka_feed,
    )

    topic = f"spark_graft_it_{uuid.uuid4().hex[:8]}"
    trades = [
        {"trade_id": "t1", "product_id": "BTC-USD", "price": "100.5",
         "size": "0.25", "side": "buy", "time": "2024-03-01T00:00:00Z"},
        {"trade_id": "t2", "product_id": "ETH-USD", "price": "20.25",
         "size": "1.5", "side": "sell", "time": "2024-03-01T00:00:01Z"},
    ]
    # Produce through Spark's own kafka batch sink: no extra client lib.
    (
        spark.createDataFrame([(json.dumps(t),) for t in trades], "value string")
        .select(F.col("value").cast("binary").alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )
    name = f"kafka_sink_{uuid.uuid4().hex[:8]}"
    q = (
        parse_kafka_feed(
            kafka_reader(spark, BOOTSTRAP, topic, starting_offsets="earliest").load()
        )
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).collect()
    assert {r.trade_id for r in rows} == {"t1", "t2"}
    got = {r.trade_id: r for r in rows}
    assert got["t1"].product_id == "BTC-USD"
    assert float(got["t1"].price) == 100.5
    assert all(r._raw_payload for r in rows)  # raw payload preserved
    assert all(r._kafka_offset is not None for r in rows)
    assert all(r._ingestion_date is not None for r in rows)
