"""VersionedTable: snapshots, time travel, COW merge, maintenance.

Covers the reference's declared Iceberg capabilities on the
parquet-native layer: time travel (README.md:157), schema evolution
(README.md:159), compaction / snapshot expiry / orphan cleanup
(compaction.py:30-79), and the MERGE contract
(bronze_to_silver.py:156-188 + SURVEY §2.8.6).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from crypto_lakehouse_spark.pipeline.versioned import VersionedTable


def _df(spark, rows, cols=("k", "day", "v")):
    return spark.createDataFrame(rows, list(cols))


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "t"), partition_by=["day"])


def test_append_and_time_travel(spark, table):
    table.append(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    table.append(_df(spark, [(3, "a", 30)]))
    assert table.versions() == [0, 1]
    assert table.read(version=0).count() == 2
    assert table.read().count() == 3
    ops = [h["op"] for h in table.history()]
    assert ops == ["append", "append"]


def test_merge_updates_and_inserts(spark, table):
    table.append(_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]))
    table.merge(_df(spark, [(2, "a", 99), (4, "a", 40)]), keys=["k"])
    got = {(r.k, r.v) for r in table.read().collect()}
    assert got == {(1, 10), (2, 99), (3, 30), (4, 40)}
    # Time travel still sees the pre-merge snapshot.
    old = {(r.k, r.v) for r in table.read(version=0).collect()}
    assert old == {(1, 10), (2, 20), (3, 30)}


def test_merge_rewrites_only_touched_partitions(spark, table):
    table.append(_df(spark, [(1, "a", 10), (3, "b", 30)]))
    files_before = set(table._load(0)["files"])
    table.merge(_df(spark, [(1, "a", 11)]), keys=["k"])
    files_after = set(table._load(1)["files"])
    # Partition b's file is carried over byte-identical; a's replaced.
    carried = files_before & files_after
    assert carried and all(f.startswith("day=b") for f in carried)


def test_merge_rejects_duplicate_source_keys(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    with pytest.raises(ValueError, match="not unique"):
        table.merge(_df(spark, [(1, "a", 1), (1, "a", 2)]), keys=["k"])


def test_schema_evolution_on_read(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    evolved = _df(spark, [(2, "b", 20, "x")], cols=("k", "day", "v", "extra"))
    table.append(evolved)
    got = table.read(merge_schema=True)
    assert "extra" in got.columns
    rows = {r.k: r.extra for r in got.collect()}
    assert rows == {1: None, 2: "x"}


def test_compact_then_expire_removes_orphans(spark, table):
    for i in range(3):
        table.append(_df(spark, [(i, "a", i)]))
    n_files_before = len(glob.glob(f"{table.path}/day=*/*.parquet"))
    v = table.compact(target_files_per_partition=1)
    assert table.read(version=v).count() == 3
    # All versions still readable pre-expiry.
    assert table.read(version=0).count() == 1

    stats = table.expire_snapshots(retain_last=1)
    assert stats["expired_versions"] == 3
    n_files_after = len(glob.glob(f"{table.path}/day=*/*.parquet"))
    assert n_files_after == 1 and n_files_before >= 3
    assert table.read().count() == 3


def test_partition_pruning_on_snapshot_read(spark, table):
    table.append(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    plan = (
        table.read()
        .filter(F.col("day") == "a")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_crashed_staging_swept(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    os.makedirs(os.path.join(table.path, "_staging-deadbeef/day=z"))
    table.expire_snapshots(retain_last=5)
    assert not glob.glob(f"{table.path}/_staging-*")
