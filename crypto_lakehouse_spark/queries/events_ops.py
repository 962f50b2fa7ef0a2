"""Event-stream operators: as-of join and sessionization, registered
with full oracles (DuckDB has native ASOF JOIN to check ours against;
sessionization is replicated lag/cumsum SQL with truncated-second gap
semantics pinned in both engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crypto_lakehouse_spark.functions import fmt_ts
from crypto_lakehouse_spark.io import load_table
from crypto_lakehouse_spark.operators.asof import asof_join
from crypto_lakehouse_spark.operators.sessionize import session_stats
from crypto_lakehouse_spark.queries.registry import query


@query(
    "asof_join_purchase_click",
    oracle="""
WITH purchases AS (
    SELECT user_id, event_id, ts, value FROM events
    WHERE event_type = 'purchase'
),
clicks AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT p.user_id,
       p.event_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       p.value AS purchase_value,
       c.value AS asof_click_value
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.user_id, p.event_id
""",
    tags=("events", "asof-join"),
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/asof.py): latest click value at or
    before each purchase, per user. Checked against DuckDB's native
    ASOF JOIN. One shuffle on user_id; window carry-forward, no range
    explosion."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        value_cols=["click_value"],
    )
    return joined.select(
        "user_id",
        "event_id",
        fmt_ts("ts", micros=True).alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        F.col("asof_click_value"),
    ).orderBy("user_id", "event_id").withColumnRenamed("asof_click_value", "asof_click_value")


@query(
    "sessionization",
    oracle="""
WITH flagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN prev_ts IS NULL
                     OR (epoch_us(ts) // 1000000)
                        - (epoch_us(prev_ts) // 1000000) > 1800
                THEN 1 ELSE 0 END AS new_session
    FROM (
        SELECT user_id, event_id, ts, value,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    )
),
numbered AS (
    SELECT *,
           SUM(new_session) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS session_seq
    FROM flagged
)
SELECT user_id,
       CAST(user_id AS STRING) || '#' || CAST(session_seq AS STRING)
           AS session_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
FROM numbered
GROUP BY user_id, session_seq
ORDER BY user_id, session_id
""",
    tags=("events", "sessionization", "window"),
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/sessionize.py): 30-min gap,
    lag->flag->running-sum composition, per-session rollup."""
    ev = load_table(spark, sf_dir, "events")
    stats = session_stats(ev, gap_minutes=30)
    return stats.select(
        "user_id",
        "session_id",
        fmt_ts("session_start", micros=True).alias("session_start"),
        fmt_ts("session_end", micros=True).alias("session_end"),
        "n_events",
        F.col("value_sum").cast("double").alias("value_sum"),
    ).orderBy("user_id", "session_id")


@query(
    "approx_distinct_users",
    oracle=None,  # HLL sketch: approximate by construction ->
    # rows-only gate; pytest bounds the relative error vs exact.
    tags=("events", "approx", "sketch"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type — the
    sketch path for cardinality at scale (exact distinct shuffles every
    key; HLL ships fixed-size sketches)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


@query(
    "asof_forward_next_click",
    oracle="""
WITH purchases AS (
    SELECT user_id, event_id, ts, value FROM events
    WHERE event_type = 'purchase'
),
clicks AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT p.user_id,
       p.event_id,
       CASE WHEN c.ts <= p.ts + INTERVAL 10 MINUTE THEN c.value END
           AS next_click_value
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts <= c.ts
ORDER BY p.user_id, p.event_id
""",
    tags=("events", "asof-join"),
)
def asof_forward_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance (operators/asof.py
    direction="forward"): the next click value within 10 minutes after
    each purchase, checked against DuckDB's native forward ASOF JOIN
    plus a tolerance CASE. Same single-shuffle carry plan as backward,
    time-reversed."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        value_cols=["click_value"],
        tolerance=F.expr("INTERVAL 10 MINUTES"),
        direction="forward",
    )
    return (
        joined.select(
            "user_id",
            "event_id",
            F.col("asof_click_value").alias("next_click_value"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "twap_hourly",
    oracle="""
WITH ordered AS (
    SELECT event_type AS product_id, ts, value,
           date_trunc('hour', ts) AS bucket,
           LEAD(ts) OVER (PARTITION BY event_type, date_trunc('hour', ts)
                          ORDER BY ts, event_id) AS next_ts
    FROM events
),
weighted AS (
    SELECT product_id, bucket,
           CAST(value AS DECIMAL(18,4))
               * (epoch_us(COALESCE(next_ts,
                                    bucket + INTERVAL 1 HOUR)) - epoch_us(ts))
               AS wv,
           epoch_us(COALESCE(next_ts, bucket + INTERVAL 1 HOUR))
               - epoch_us(ts) AS w
    FROM ordered
)
SELECT product_id,
       strftime(bucket, '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(SUM(wv) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS twap
FROM weighted
GROUP BY product_id, bucket
ORDER BY product_id, window_start
""",
    tags=("events", "twap", "window", "aggregation"),
)
def twap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per (product, hour): each
    observation is weighted by how long it was the live value — LEAD to
    the next observation, the last one in a bucket held to the bucket
    edge. The interval-weighted aggregation the reference's VWAP
    doesn't cover (A2 weights by size, this weights by time). Weights
    are integer microseconds and prices exact decimals, so the sums
    are order-free; one window + one aggregation on the same
    (product, bucket) key — the window's shuffle is reused by the
    groupBy."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", F.date_trunc("hour", "ts")).orderBy(
        "ts", "event_id"
    )
    ordered = ev.select(
        F.col("event_type").alias("product_id"),
        "ts",
        "value",
        F.date_trunc("hour", "ts").alias("bucket"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    end = F.coalesce(
        F.col("next_ts"), F.col("bucket") + F.expr("INTERVAL 1 HOUR")
    )
    weighted = ordered.select(
        "product_id",
        "bucket",
        (
            F.col("value").cast("decimal(18,4)")
            * (F.unix_micros(end) - F.unix_micros("ts"))
        ).alias("wv"),
        (F.unix_micros(end) - F.unix_micros("ts")).alias("w"),
    )
    return (
        weighted.groupBy("product_id", "bucket")
        .agg((F.sum("wv").cast("double") / F.sum("w").cast("double")).alias("twap"))
        .select(
            "product_id",
            fmt_ts("bucket").alias("window_start"),
            "twap",
        )
        .orderBy("product_id", "window_start")
    )
