"""Structured Streaming queries registered for the correctness gate.

These run REAL streaming plans (file-source replay -> stateful
windowed aggregation -> availableNow drain into a memory sink) and are
still deterministic, so they carry full DuckDB oracles — stronger than
the rows-only fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from crypto_lakehouse_spark.queries.registry import query
from crypto_lakehouse_spark.session import configure_session
from crypto_lakehouse_spark.streaming.file_stream import (
    run_streaming_dedup,
    run_watermarked_counts,
    run_windowed_counts,
)


@query(
    "streaming_window_counts",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
""",
    tags=("streaming", "window"),
    bench=False,
)
def streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 as a real Structured Streaming tumbling window (F.window) —
    oracle-equivalent to batch date_trunc bucketing per SURVEY §2.7."""
    configure_session(spark)
    return run_windowed_counts(spark, sf_dir)


@query(
    "streaming_watermarked_counts",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
FROM events
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
      <= (SELECT MAX(ts) FROM events) - INTERVAL 30 MINUTE
GROUP BY 1, 2
""",
    tags=("streaming", "watermark", "late-data"),
    bench=False,
)
def streaming_watermarked_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 extension: real event-time watermark, append-mode windowed
    aggregation, deterministic late-batch replay proven dropped — the
    oracle filters to windows finalized under max_ts - delay and counts
    each event once (late re-emissions excluded)."""
    configure_session(spark)
    return run_watermarked_counts(spark, sf_dir)


@query(
    "streaming_dedup_counts",
    oracle="""
SELECT event_type, COUNT(DISTINCT event_id) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("streaming", "dedup"),
    bench=False,
)
def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: streaming dropDuplicates on the event key, then counts."""
    configure_session(spark)
    return run_streaming_dedup(spark, sf_dir)
