"""Parquet-native lakehouse table layer.

The reference stores bronze/silver/gold in Iceberg with MERGE upserts
(bronze_to_silver.py:156-188) and partition layouts chosen for pruning
(SURVEY §4). This environment ships no Delta/Iceberg runtime, so the
engine implements the same contract directly on partitioned parquet
with Spark's *dynamic partition overwrite* — which is also the honest
100 TB story: a MERGE only ever rewrites the partitions the source
touches, never the table.

MERGE INTO t USING s ON key == (per touched partition):
    (target rows NOT matched by key)  UNION  (all source rows)
written with partitionOverwriteMode=dynamic, so untouched partitions
are untouched bytes. Matched rows are replaced by the source row
(WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *, reference
bronze_to_silver.py:171-186).

Requirements shared with Delta's MERGE: source must be unique on the
merge keys (SURVEY §2.8.6) — enforced here with a fail-fast check
(Delta throws on multiple matches; so do we).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LakehouseTable:
    """A partitioned parquet table with append / overwrite / merge."""

    def __init__(self, spark: SparkSession, path: str, partition_by: list[str] | None = None):
        self.spark = spark
        self.path = path
        self.partition_by = partition_by or []

    # -- reads -------------------------------------------------------------
    def exists(self) -> bool:
        return os.path.isdir(self.path) and bool(os.listdir(self.path))

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    # -- writes ------------------------------------------------------------
    def _writer(self, df: DataFrame, mode: str):
        w = df.write.mode(mode)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        return w

    def _refresh(self) -> None:
        # Invalidate Spark's cached FileIndex for this path — required
        # after any in-place rewrite, or later reads see stale files.
        self.spark.catalog.refreshByPath(self.path)

    def append(self, df: DataFrame) -> None:
        self._writer(df, "append").parquet(self.path)
        self._refresh()

    def overwrite(self, df: DataFrame) -> None:
        self._writer(df, "overwrite").parquet(self.path)
        self._refresh()

    def overwrite_partitions(self, df: DataFrame) -> None:
        """Dynamic partition overwrite: replaces only the partitions
        present in `df`. Requires partitionOverwriteMode=dynamic (set
        by the session factory)."""
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        self._writer(df, "overwrite").parquet(self.path)
        self._refresh()

    # -- merge -------------------------------------------------------------
    def merge(self, source: DataFrame, keys: list[str]) -> None:
        """Upsert `source` by `keys` (MERGE WHEN MATCHED UPDATE SET * /
        WHEN NOT MATCHED INSERT *). Rewrites only touched partitions.
        """
        dup = source.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
        if dup:
            raise ValueError(
                f"MERGE source is not unique on keys {keys} "
                "(same contract as Delta: multiple source matches are an error)"
            )
        if not self.exists():
            self.overwrite(source)
            return

        target = self.read().select(*source.columns)  # align column order
        if self.partition_by:
            # Prune target read to touched partitions; at scale this is
            # partition pruning on the parquet scan, not a full read.
            parts = source.select(*self.partition_by).distinct()
            target = target.join(F.broadcast(parts), self.partition_by, "left_semi")
        keep = target.join(source.select(*keys).distinct(), keys, "left_anti")
        merged = keep.unionByName(source)
        if self.partition_by:
            self.overwrite_partitions(merged)
        else:
            # Unpartitioned: stage then swap (full rewrite is inherent).
            tmp = f"{self.path}__staging_{int(time.time() * 1000)}"
            merged.write.mode("overwrite").parquet(tmp)
            bak = f"{self.path}__old"
            shutil.rmtree(bak, ignore_errors=True)
            os.rename(self.path, bak)
            os.rename(tmp, self.path)
            shutil.rmtree(bak, ignore_errors=True)
            self._refresh()

    # -- maintenance (reference compaction.py analog) ----------------------
    def compact(self, target_files_per_partition: int = 1) -> None:
        """Small-file compaction (reference compaction.py:30-42,
        rewrite_data_files analog): rewrite each partition's files into
        `target_files_per_partition` via a partition-local coalesce —
        no shuffle of table data across partitions."""
        df = self.read()
        if self.partition_by:
            out = df.repartition(target_files_per_partition, *self.partition_by)
            self.overwrite_partitions(out)
        else:
            self.overwrite(df.coalesce(target_files_per_partition))

    def vacuum_staging(self) -> int:
        """Remove leftover staging/backup dirs (orphan-file cleanup
        analog of compaction.py:66-79). Returns count removed."""
        parent, base = os.path.split(self.path.rstrip("/"))
        removed = 0
        for n in os.listdir(parent or "."):
            if n.startswith(base + "__"):
                shutil.rmtree(os.path.join(parent, n), ignore_errors=True)
                removed += 1
        return removed
