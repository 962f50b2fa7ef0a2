"""Incremental clustering on VersionedTable (Delta liquid-clustering
analog): the first optimize_incremental records cluster columns,
z-space bounds, and the clustered file set; later calls z-sort ONLY
files appended since, leaving clustered files byte-identical, and the
new files tile the SAME z-space so two-dimensional data skipping keeps
working across increments.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crypto_lakehouse_spark.pipeline.versioned import VersionedTable


def _grid(spark, lo, hi, tag):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 100).cast("double").alias("x"),
            ((F.col("id") * 7) % 100).cast("double").alias("y"),
            F.lit(tag).alias("tag"),
        )
        .repartition(4)
    )


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "t"))


def test_initial_call_full_clusters_and_records(spark, table):
    table.append(_grid(spark, 0, 2000, "a"))
    res = table.optimize_incremental(cluster_by=["x", "y"], target_file_mb=0.01)
    assert not res["skipped"]
    block = table._load(table.current_version())["clustering"]
    assert block["cols"] == ["x", "y"] and len(block["bounds"]) == 4
    assert sorted(block["clustered"]) == sorted(
        table._load(table.current_version())["files"]
    )


def test_incremental_clusters_only_new_files(spark, table):
    table.append(_grid(spark, 0, 2000, "a"))
    table.optimize_incremental(cluster_by=["x", "y"], target_file_mb=0.01)
    v1 = table.current_version()
    clustered_files = set(table._load(v1)["files"])
    table.append(_grid(spark, 2000, 2600, "b"))
    res = table.optimize_incremental()
    assert not res["skipped"]
    assert res["files_carried"] == len(clustered_files)
    snap = table._load(table.current_version())
    # Every originally-clustered file carried byte-identical (same
    # rel path => same immutable file).
    assert clustered_files <= set(snap["files"])
    # Everything in the new manifest is now marked clustered.
    assert sorted(snap["clustering"]["clustered"]) == sorted(snap["files"])
    # Contents intact.
    assert table.read().count() == 2600
    assert table.read().filter("tag = 'b'").count() == 600


def test_incremental_noop_when_no_new_files(spark, table):
    table.append(_grid(spark, 0, 1000, "a"))
    table.optimize_incremental(cluster_by=["x", "y"])
    res = table.optimize_incremental()
    assert res["skipped"] and res["reason"] == "no new files"


def test_incremental_requires_initial_cols(spark, table):
    table.append(_grid(spark, 0, 100, "a"))
    with pytest.raises(ValueError, match="no recorded clustering"):
        table.optimize_incremental()


def test_data_skipping_works_across_increments(spark, table):
    table.append(_grid(spark, 0, 4000, "a"))
    table.optimize_incremental(cluster_by=["x", "y"], target_file_mb=0.005)
    table.append(_grid(spark, 4000, 8000, "b"))
    table.optimize_incremental(target_file_mb=0.005)
    files, total = table.files_for_scan(
        between={"x": (0.0, 10.0), "y": (0.0, 10.0)}
    )
    # Both the original clustered set and the incremental batch were
    # z-laid over the SAME bounds, so a tight 2-D box prunes files
    # from both generations.
    assert total >= 4 and len(files) < total
    got = table.read(between={"x": (0.0, 10.0), "y": (0.0, 10.0)}).count()
    exact = table.read().filter(
        "x BETWEEN 0.0 AND 10.0 AND y BETWEEN 0.0 AND 10.0"
    ).count()
    assert got == exact > 0


def test_incremental_with_row_tracking(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "rt"), row_tracking=True)
    t.append(_grid(spark, 0, 500, "a"))
    t.optimize_incremental(cluster_by=["x", "y"])
    ids0 = {r.k: r._row_id for r in t.read(with_row_ids=True).collect()}
    t.append(_grid(spark, 500, 700, "b"))
    t.optimize_incremental()
    ids1 = {r.k: r._row_id for r in t.read(with_row_ids=True).collect()}
    assert {k: v for k, v in ids1.items() if k < 500} == ids0
    assert len(set(ids1.values())) == 700


def test_cluster_by_change_reclusters_fully(spark, table):
    table.append(_grid(spark, 0, 1000, "a"))
    table.optimize_incremental(cluster_by=["x", "y"])
    res = table.optimize_incremental(cluster_by=["y", "x"])
    assert not res["skipped"]
    block = table._load(table.current_version())["clustering"]
    assert block["cols"] == ["y", "x"]
    assert table.read().count() == 1000
