"""Lineage truncation for driver-loop iterative algorithms (PageRank,
connected components, k-means steps): without a cut, each round's plan
embeds every previous round's, and both planning time and recovery
cost grow without bound.

Two modes, selected by whether the session has a RELIABLE checkpoint
directory configured (VERDICT r6 item 3):

- `spark.sparkContext.setCheckpointDir(dir)` set => `checkpoint()`:
  the round's rows are materialized to the (HDFS/object-store) dir —
  they survive executor loss, which is what lets a multi-hour
  iterative job on a preemptible/spot 1000-executor cluster resume a
  round instead of restarting from round zero.
- no dir => `localCheckpoint()`: executor-memory blocks, zero I/O —
  the right default on a stable cluster and in local mode, but lost
  with the executor.

The flag is the checkpoint dir itself: cluster operators already set
it exactly when they want reliability. Both modes are semantically
identical (same rows out), which `tests/test_checkpointing.py` pins on
the convergence-gated PageRank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def truncate_lineage(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Cut `df`'s lineage: reliable `checkpoint()` when the session
    has a checkpoint dir, `localCheckpoint()` otherwise (both eager —
    the iteration's NEXT round must not re-trigger this one)."""
    if spark.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
