"""Registry of declared queries with DuckDB-oracle counterparts.

Each query is a callable (spark, sf_dir) -> DataFrame plus (usually) an
ANSI-SQL string DuckDB can run over the same parquet tables. The
driver hash-compares the two at sf0.01; `tests/test_oracle.py` runs the
same comparison locally.

Determinism rules every query here follows (SURVEY §7 "hard parts"):
- no raw DOUBLE aggregation: doubles are cast to DECIMAL before
  SUM/AVG (exact, order-independent), then cast back to DOUBLE at the
  very end — bit-identical across engines;
- timestamps in output are formatted strings (engine-neutral);
- every window ORDER BY carries a unique tie-break column;
- no now()-relative predicates: "now" is a deterministic scalar
  (max timestamp in the data) per SURVEY §2.8.7.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""
    bench: bool = field(default=True)  # include in bench.py headline set
    # When set, bench.py times THIS plan instead of spark_fn. Used by
    # sketch queries whose correctness-checked spark_fn adds an
    # exactness gate (the only way a nondeterministic estimate can be
    # value-checked): the gate's exact aggregate would dominate the
    # bench and misrepresent the deployed sketch-only plan, so the
    # bench path stays pure while the driver hash-checks the gated
    # twin. bench_fn output is a superset check: the SAME sketch
    # expression feeds both plans.
    bench_fn: Callable[[SparkSession, str], DataFrame] | None = None


REGISTRY: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = True,
    bench_fn: Callable[[SparkSession, str], DataFrame] | None = None,
) -> Callable:
    """Decorator registering a query implementation.

    The decorated function has signature (spark, sf_dir) -> DataFrame
    and is responsible for loading what it needs via
    `crypto_lakehouse_spark.io` (which registers temp views).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name=name,
            spark_fn=fn,
            oracle=oracle,
            tags=tags,
            doc=(fn.__doc__ or "").strip(),
            bench=bench,
            bench_fn=bench_fn,
        )
        return fn

    return deco
