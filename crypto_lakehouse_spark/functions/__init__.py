"""Engine-neutral column helpers used across queries and pipelines.

These encode the determinism rules that make Spark results
hash-identical to a DuckDB oracle (see queries/registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_SECONDS = "yyyy-MM-dd HH:mm:ss"
TS_MICROS = "yyyy-MM-dd HH:mm:ss.SSSSSS"
# DuckDB strftime equivalents for the two formats above.
ORACLE_TS_SECONDS = "%Y-%m-%d %H:%M:%S"
ORACLE_TS_MICROS = "%Y-%m-%d %H:%M:%S.%f"


def fmt_ts(col: Column | str, micros: bool = False) -> Column:
    """Format a timestamp as an engine-neutral string (UTC session TZ)."""
    return F.date_format(col, TS_MICROS if micros else TS_SECONDS)


def fmt_date(col: Column | str) -> Column:
    return F.date_format(col, "yyyy-MM-dd")


def ddiv(num: Column, den: Column) -> Column:
    """Order-deterministic division: cast both sides to DOUBLE first,
    NULL on zero denominator (NULLIF semantics, reference
    ohlcv_1m.sql:62)."""
    return num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0))


def dec(col: Column | str, precision: int = 18, scale: int = 8) -> Column:
    """Cast to exact decimal before aggregation (order-independent sums)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")
