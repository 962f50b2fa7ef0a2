"""As-of join — the canonical time-series operator the reference only
approximates implicitly (SURVEY §2.3: the OHLC first/last join J1 is
an as-of-like pattern).

Spark-first implementation as a *composition of built-ins* (SURVEY
§7 "custom operators" option (a)): union left/right with a side tag,
one window sort per key, `last_value(ignoreNulls)` carries the most
recent right-side value forward onto left rows. Exactly one shuffle
on the join key; no range-explosion, no per-row lookups; scales as
sort-merge within key partitions (skewed keys handled by AQE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row per `on` key:
    `direction="backward"` (default) takes the latest right with
    right_time <= left_time; `"forward"` takes the earliest right with
    right_time >= left_time. Ties on equal timestamps are inclusive in
    both directions (the right row is visible at its own timestamp).

    `tolerance`: optional max time distance interval; right values
    further than tolerance from left_time become NULL.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        "*",
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # Right rows sort before left rows at equal timestamps so an
    # equal-time right value is visible to the left row (inclusive).
    # Forward direction = the same carry over time reversed.
    order_t = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(order_t, "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
        F.last(F.when(F.col("_is_left") == 0, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias("_asof_t"),
    )
    out = carried.filter(F.col("_is_left") == 1)
    if tolerance is not None:
        in_range = (
            F.col("_asof_t") >= F.col("_t") - tolerance
            if direction == "backward"
            else F.col("_asof_t") <= F.col("_t") + tolerance
        )
        for c in value_cols:
            out = out.withColumn(
                f"_asof_{c}", F.when(in_range, F.col(f"_asof_{c}"))
            )
    drop = ["_k", "_t", "_is_left", "_asof_t"] + [f"_r_{c}" for c in value_cols]
    return out.drop(*drop).withColumnsRenamed({f"_asof_{c}": f"asof_{c}" for c in value_cols})
