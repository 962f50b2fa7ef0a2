"""Raw trade-feed source: JSON messages shaped like the reference's
websocket `match` events (FIXTURES.md A1; reference
tests/unit/test_coinbase_producer.py:48-59).

Derived deterministically from the driver's events parquet — the
engine's test-time stand-in for the Kafka topic. Emits a Kafka-envelope
DataFrame: (key, value JSON string, offset, partition, ingested_at)
including heartbeat rows (null trade_id — must be filtered, T7),
duplicate deliveries, and malformed payloads for the DLQ path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_lakehouse_spark.io import load_table


def trade_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-envelope rows: ~2% heartbeats, dup deliveries of
    event_id % 7 == 0, malformed JSON for event_id % 131 == 0."""
    ev = load_table(spark, sf_dir, "events")

    def payload(dup: bool) -> DataFrame:
        df = ev.filter(F.col("event_id") % 7 == 0) if dup else ev
        lag = (F.col("event_id") % 600 + (30 if dup else 0)).cast("int")
        json_value = F.to_json(
            F.struct(
                F.lit("match").alias("type"),
                F.col("event_id").cast("string").alias("trade_id"),
                F.col("event_id").cast("string").alias("sequence"),
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("time"),
                F.col("event_type").alias("product_id"),
                (F.get_json_object("props", "$.k").cast("int") + 1)
                .cast("string")
                .alias("size"),
                F.col("value").cast("string").alias("price"),
                F.when(F.col("event_id") % 2 == 0, "buy").otherwise("sell").alias("side"),
            )
        )
        # Malformed payloads exercise the DLQ route (S9 analog).
        value = F.when(
            (F.col("event_id") % 131 == 0) & F.lit(not dup), F.lit("{not json")
        ).otherwise(json_value)
        # Heartbeats: null trade_id messages interleaved (T7).
        return df.select(
            F.col("event_type").alias("key"),
            value.alias("value"),
            (F.col("event_id") + (10_000_000 if dup else 0)).alias("offset"),
            (F.col("event_id") % 4).cast("int").alias("partition"),
            (F.col("ts") + lag * F.expr("INTERVAL 1 SECOND")).alias("ingested_at"),
        )

    heartbeats = (
        ev.filter(F.col("event_id") % 50 == 0)
        .select(
            F.col("event_type").alias("key"),
            F.to_json(F.struct(F.lit("heartbeat").alias("type"))).alias("value"),
            (F.col("event_id") + 20_000_000).alias("offset"),
            (F.col("event_id") % 4).cast("int").alias("partition"),
            F.col("ts").alias("ingested_at"),
        )
    )
    return payload(False).unionByName(payload(True)).unionByName(heartbeats)
