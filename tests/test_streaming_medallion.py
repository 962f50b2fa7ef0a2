"""Streaming-vs-batch convergence: running the medallion pipeline
incrementally inside foreachBatch micro-batches (ingest -> silver
MERGE -> gold candle MERGE per batch) must land byte-identical silver
and gold tables to the one-shot batch pipeline. This exercises the
MERGE matched-update path across batches (batch 2 updates candles
batch 1 created) — the reference's hourly incremental mode
(orchestration/dags/bronze_to_silver.py:42) compressed into a test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_lakehouse_spark.pipeline.lakehouse import Lakehouse
from crypto_lakehouse_spark.sources.trade_feed import trade_feed
from crypto_lakehouse_spark.streaming.file_stream import run_stream_ingest

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*[F.col(c) for c in cols]).collect())


def test_streaming_medallion_converges_to_batch(spark, tmp_path):
    gold_builds = []

    def each_batch(lh: Lakehouse, batch_id: int) -> None:
        lh.bronze_to_silver(lookback_hours=None)
        gold_builds.append(lh.build_ohlcv("minute", lookback=None))

    lh_stream, metrics = run_stream_ingest(
        spark, SF, str(tmp_path / "stream_wh"), each_batch=each_batch
    )
    assert len(metrics) == 2 and len(gold_builds) == 2

    lh_batch = Lakehouse(spark, str(tmp_path / "batch_wh"))
    lh_batch.ingest_feed(trade_feed(spark, SF))
    lh_batch.bronze_to_silver(lookback_hours=None)
    lh_batch.build_ohlcv("minute", lookback=None)

    s_cols = ["trade_id", "product_id", "price", "size", "side", "trade_time"]
    assert _rows(lh_stream.silver.read(), s_cols) == _rows(lh_batch.silver.read(), s_cols)

    g_cols = ["product_id", "window_start", "open", "high", "low", "close", "volume", "trade_count"]
    stream_gold = _rows(lh_stream.gold["ohlcv_1m"].read(), g_cols)
    batch_gold = _rows(lh_batch.gold["ohlcv_1m"].read(), g_cols)
    assert stream_gold == batch_gold
    # Batch 2 must have UPDATED candles created by batch 1, not only
    # inserted new ones — otherwise this test isn't exercising MERGE.
    assert gold_builds[1] >= gold_builds[0] > 0
