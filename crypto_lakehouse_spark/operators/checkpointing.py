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


def release_lineage(df: DataFrame) -> None:
    """Free the storage behind a `truncate_lineage` result.

    `DataFrame.unpersist()` is a NO-OP on checkpointed frames: it only
    clears CacheManager entries, while (local)checkpoint data lives as
    RDD-level blocks on the INTERNAL RDD wrapped by the plan's
    LogicalRDD node.  This reaches that RDD through the analyzed plan
    and unpersists it directly, so superseded sf_dir fixtures release
    executor memory immediately instead of waiting for the JVM to GC
    the RDD (driver-side ContextCleaner).

    Best-effort by design: the LogicalRDD traversal uses py4j access
    to Catalyst internals, so any mismatch (future Spark renames,
    Connect sessions without a JVM plan) falls back to the GC path —
    correctness never depends on the eager release.  Reliable-mode
    checkpoint FILES are cleaned by the GC path only, which is why
    the session builder sets
    `spark.cleaner.referenceTracking.cleanCheckpoints=true`.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()  # noqa: SLF001
        # truncate_lineage returns a Dataset whose analyzed plan IS the
        # LogicalRDD (no operators above it), so no tree walk needed.
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
            return
    except Exception:
        pass
    try:  # non-checkpointed (plain persisted) frames: the normal path
        df.unpersist()
    except Exception:
        pass
