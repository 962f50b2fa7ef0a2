"""SparkSession factory.

Spark-first analog of the reference's session factory
(reference: processing/spark_jobs/spark_config.py:9-52) minus the
Iceberg/Nessie/S3A wiring: local warehouse, AQE on, UTC session
timezone (required for oracle-exact timestamp semantics), snappy
parquet. Every knob is env-overridable like the reference's.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the local[32] test harness; on a real cluster the
# submitter overrides master/shuffle-partitions (AQE coalesces anyway).
DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
# local[N] runs all N task slots inside the driver JVM, whose stock 1g
# heap starves 32 concurrent tasks (checkpointed iteratives OOM'd at
# sf0.1). Sized for the 128 GiB harness box; cluster submitters set
# executor/driver memory themselves.
DEFAULT_DRIVER_MEMORY = os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "16g")
DEFAULT_MASTER = os.environ.get(
    "SPARK_GRAFT_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
)


def get_spark_session(app_name: str = "crypto-lakehouse-spark") -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine.

    All settings are chosen for scale-out correctness:
    - AQE on (runtime coalescing + skew-join splitting),
    - UTC session timezone (timestamp determinism vs any oracle),
    - snappy parquet (reference parity:
      streaming_bronze_writer.py:85-88),
    - nanosAsLong so nanosecond-precision parquet (the driver
      testdata) is readable; `io.load_table` converts to
      microsecond TIMESTAMP losslessly.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Shuffle width is sized PER QUERY, not globally: the registry
        # applies `initialPartitionNum` on every query call (default =
        # core count; heavy queries declare registry.WIDE_SHUFFLE so
        # multi-GB shuffle intermediates start wide and AQE coalesces).
        # A blanket wide start measured 2-3x slower on the sub-second
        # tier; a blanket narrow one spilled 2.7x on the sf10 ramp.
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.ui.explainMode", "formatted")
        # Reliable-mode checkpoint FILES (sessions with a checkpoint
        # dir) are only ever deleted by the driver's ContextCleaner
        # when the RDD is GC'd; without this flag they accumulate
        # unboundedly as memo fixtures are superseded on sf_dir
        # switches. Local-mode blocks are released eagerly by
        # operators.checkpointing.release_lineage.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    master = os.environ.get("SPARK_GRAFT_MASTER_OVERRIDE", "")
    if not SparkSession.getActiveSession():
        builder = builder.master(master or DEFAULT_MASTER).config(
            "spark.driver.memory", DEFAULT_DRIVER_MEMORY
        )
    spark = builder.getOrCreate()
    configure_session(spark)
    return spark


def configure_session(spark: SparkSession) -> None:
    """Apply runtime-settable confs to an externally provided session.

    The correctness driver hands us its own SparkSession; these runtime
    confs make it behave identically to one we built ourselves.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        # Required for the Python DataSource pushFilters seam
        # (sources/pyarrow_source.py); Spark errors on a reader that
        # implements pushFilters while this is off.
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    except Exception:
        pass
