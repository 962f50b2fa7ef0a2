"""Table loading + temp-view registration for the driver testdata.

The driver's synthetic parquet (TESTDATA.md) stores timestamps at
nanosecond precision, which Spark's vectorized parquet reader rejects.
With ``spark.sql.legacy.parquet.nanosAsLong=true`` they arrive as
BIGINT nanos; every value in the dataset is microsecond-aligned
(ns % 1000 == 0 for all rows, verified), so converting via
``timestamp_micros(ns / 1000)`` is lossless and matches what DuckDB
sees for the same files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_lakehouse_spark.session import configure_session

# Timestamp-typed columns per testdata table (stored as ns in parquet).
TIMESTAMP_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# (session id, sf_dir, table) -> DataFrame. Re-reading parquet repeats
# file listing + footer reads; the logical plan is immutable, so the
# memo is safe and drops per-query fixed cost across a suite run.
_TABLE_MEMO: dict[tuple[int, str, str], DataFrame] = {}

# (session id, view name) -> sf_dir currently backing the temp view.
_VIEW_OWNER: dict[tuple[int, str], str] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, restoring TIMESTAMP columns."""
    key = (id(spark), sf_dir, name)
    memo = _TABLE_MEMO.get(key)
    if memo is not None:
        return memo
    configure_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in TIMESTAMP_COLS.get(name, []):
        if dict(df.dtypes).get(c) == "bigint":
            # Integer division — double division loses precision on
            # epoch-nanos magnitudes (> 2^53).
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    _TABLE_MEMO[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each testdata table as a temp view (bare name).

    Mirrors the DuckDB oracle environment, where the same parquet
    files are pre-registered as views with the same names.

    Registration is memoized: a view is only (re)registered when this
    session doesn't already have it pointing at the requested sf_dir,
    so suite runs don't pay repeated registration, while switching
    scale factors still swaps the views.
    """
    for name in tables or TABLES:
        key = (id(spark), name)
        if _VIEW_OWNER.get(key) == sf_dir:
            continue
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        _VIEW_OWNER[key] = sf_dir
