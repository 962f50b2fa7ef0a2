"""crypto_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference crypto-lakehouse (medallion pipeline:
streaming ingest -> bronze -> silver -> gold OHLCV/metrics), built
Spark-first: DataFrame/SQL plans optimized by Catalyst, partitioned
parquet storage with partition-overwrite MERGE, Structured Streaming
for ingest, and an extended large-scale data-pipeline surface
(dedup, similarity search, text analysis, multimodal columns).

Designed for 100 TB scale: every operator is expressed as a
declarative plan (predicate pushdown / column pruning / broadcast
reach the scan), no driver-side materialization in any data path.
"""

__version__ = "0.1.0"

from crypto_lakehouse_spark.session import get_spark_session  # noqa: F401
