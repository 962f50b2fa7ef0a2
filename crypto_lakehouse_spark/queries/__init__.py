"""Query registry — every SURVEY §2 operator (and the extended
large-scale data-pipeline surface) is registered here as a named
(spark_fn, oracle_sql) pair for differential correctness checking.
"""

from crypto_lakehouse_spark.queries.registry import REGISTRY, Query, query  # noqa: F401


def load_all() -> None:
    """Import all query modules so their @query decorators register."""
    import crypto_lakehouse_spark.queries.reference_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.relational  # noqa: F401
    import crypto_lakehouse_spark.queries.tpch_ext  # noqa: F401
    import crypto_lakehouse_spark.queries.text_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.dedup_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.similarity_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.streaming_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.events_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.multimodal_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.pipeline_ext  # noqa: F401
    import crypto_lakehouse_spark.queries.scale_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.breadth_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.sampling_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.udf_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.trainprep_ops  # noqa: F401
