"""Declarative data-quality checks — the engine-side analog of the
reference's Great Expectations suites
(quality/great_expectations/expectations/bronze_trades_suite.json:8-85,
silver_trades_suite.json:8-98, executed by
orchestration/dags/data_quality.py:30-72).

Design: every row-predicate check in a suite is evaluated in ONE
aggregation pass over the table — `SUM(CASE WHEN NOT pred THEN 1)` per
check — so a 40-check suite costs one scan, not 40 (the reference runs
each expectation as its own Spark job). Uniqueness checks need a
distinct and run as a second single aggregation. Unlike the reference,
failures are surfaced, not swallowed (its DAG catches and logs only,
data_quality.py:47-50): `enforce()` raises.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    predicate: Column  # True = row passes


@dataclass(frozen=True)
class Unique:
    name: str
    columns: tuple[str, ...]


@dataclass(frozen=True)
class CheckResult:
    name: str
    passed: bool
    n_failed: int


def run_checks(df: DataFrame, checks: list[Check | Unique]) -> list[CheckResult]:
    """Evaluate a suite: all row predicates in one aggregation, all
    uniqueness constraints in one more."""
    results: list[CheckResult] = []
    row_checks = [c for c in checks if isinstance(c, Check)]
    if row_checks:
        aggs = [
            F.sum(F.when(~c.predicate, 1).otherwise(0)).alias(c.name)
            for c in row_checks
        ]
        row = df.agg(*aggs).first()
        results += [
            CheckResult(c.name, (row[c.name] or 0) == 0, row[c.name] or 0)
            for c in row_checks
        ]
    for u in (c for c in checks if isinstance(c, Unique)):
        n_dup = (
            df.groupBy(*u.columns)
            .count()
            .filter(F.col("count") > 1)
            .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)))
            .first()[0]
        )
        results.append(CheckResult(u.name, n_dup == 0, int(n_dup)))
    return results


def enforce(df: DataFrame, checks: list[Check | Unique]) -> list[CheckResult]:
    """run_checks, raising on any failure (the reference swallows
    failures; we gate)."""
    results = run_checks(df, checks)
    failed = [r for r in results if not r.passed]
    if failed:
        raise AssertionError(
            "data-quality failures: "
            + ", ".join(f"{r.name} ({r.n_failed} rows)" for r in failed)
        )
    return results


# Suites mirroring the reference's GE expectations.
def bronze_suite() -> list[Check | Unique]:
    """bronze_trades_suite.json: not-nulls + value sets."""
    return [
        Check("trade_id_not_null", F.col("trade_id").isNotNull()),
        Check("product_id_not_null", F.col("product_id").isNotNull()),
        Check("side_in_set", F.col("side").isin("buy", "sell")),
        Check("ingested_at_not_null", F.col("_ingested_at").isNotNull()),
    ]


def silver_suite() -> list[Check | Unique]:
    """silver_trades_suite.json: uniqueness + strict positivity +
    value sets + non-negative latency."""
    return [
        Unique("trade_id_unique", ("trade_id",)),
        Check("price_positive", F.col("price") > 0),
        Check("size_positive", F.col("size") > 0),
        Check("side_in_set", F.col("side").isin("buy", "sell")),
        Check("latency_non_negative", F.col("_source_latency_ms") >= 0),
        Check("trade_time_not_null", F.col("trade_time").isNotNull()),
    ]
