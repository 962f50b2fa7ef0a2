"""Deletion vectors on VersionedTable (Delta DV analog, VERDICT r11
item 6): row-level delete via positional sidecar instead of COW
rewrite, read-time reconciliation everywhere (read / time travel /
file-subset rewrites / MERGE), and OPTIMIZE compacting DVs away —
with COW-equivalence pinned against `delete()` on the same data.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crypto_lakehouse_spark.pipeline.versioned import VersionedTable


def _df(spark, rows, cols=("k", "day", "v")):
    return spark.createDataFrame(rows, list(cols))


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "t"), partition_by=["day"])


ROWS = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40), (5, "b", 50)]


def test_delete_dv_basic_and_files_untouched(spark, table):
    table.append(_df(spark, ROWS))
    files_before = sorted(table._load(0)["files"])
    res = table.delete_dv("v >= 30 AND day = 'b'")
    assert not res["skipped"]
    assert res["n_deleted"] == 3
    # Data files are byte-identical and all carried — only the
    # manifest's DV map changed.
    assert sorted(table._load(res["version"])["files"]) == files_before
    got = {(r.k, r.v) for r in table.read().collect()}
    assert got == {(1, 10), (2, 20)}
    assert table.detail()["num_dv_files"] >= 1


def test_delete_dv_time_travel_sees_predv_rows(spark, table):
    table.append(_df(spark, ROWS))
    table.delete_dv("k = 1")
    assert table.read(version=0).count() == 5
    assert table.read().count() == 4


def test_delete_dv_idempotent_and_incremental(spark, table):
    table.append(_df(spark, ROWS))
    r1 = table.delete_dv("k <= 2")
    assert r1["n_deleted"] == 2
    # Re-running the same predicate: every matching row already dead.
    r2 = table.delete_dv("k <= 2")
    assert r2["skipped"]
    # A wider predicate only records the NEWLY dead rows.
    r3 = table.delete_dv("k <= 3")
    assert r3["n_deleted"] == 1
    assert {r.k for r in table.read().collect()} == {4, 5}


def test_delete_dv_null_condition_keeps_row(spark, table):
    table.append(_df(spark, [(1, "a", None), (2, "a", 20)]))
    res = table.delete_dv("v < 100")
    assert res["n_deleted"] == 1
    assert {r.k for r in table.read().collect()} == {1}


def test_delete_dv_matches_cow_delete(spark, tmp_path):
    cow = VersionedTable(spark, str(tmp_path / "cow"), partition_by=["day"])
    dv = VersionedTable(spark, str(tmp_path / "dv"), partition_by=["day"])
    for t in (cow, dv):
        t.append(_df(spark, ROWS))
    cond = "v = 20 OR day = 'b' AND k >= 4"
    cow.delete(cond)
    dv.delete_dv(cond)
    a = {tuple(r) for r in cow.read().select("k", "day", "v").collect()}
    b = {tuple(r) for r in dv.read().select("k", "day", "v").collect()}
    assert a == b == {(1, "a", 10), (3, "b", 30)}


def test_merge_after_dv_delete_does_not_resurrect(spark, table):
    table.append(_df(spark, ROWS))
    table.delete_dv("k = 3")
    # MERGE touches partition b (k=4 update): the rewrite reads the
    # reconciled rows, so k=3 stays dead in the rewritten file.
    table.merge(_df(spark, [(4, "b", 99)]), keys=["k", "day"])
    got = {(r.k, r.v) for r in table.read().collect()}
    assert got == {(1, 10), (2, 20), (4, 99), (5, 50)}
    # Partition b rewrote: its DV entry must be gone from the head.
    head = table._load(table.current_version())
    assert not any(
        f.startswith("day=b") for f in head.get("deletion_vectors", {})
    )


def test_cow_delete_on_dvd_file_keeps_dv_rows_dead(spark, table):
    table.append(_df(spark, ROWS))
    table.delete_dv("k = 5")
    table.delete("k = 4")  # COW rewrite of the same day=b file
    assert {r.k for r in table.read().collect()} == {1, 2, 3}


def test_optimize_purges_dvs(spark, table):
    table.append(_df(spark, ROWS))
    table.compact(1)  # layout within target => optimize takes the
    v = table.delete_dv("k = 2")["version"]  # DV-purge branch
    assert table._load(v)["deletion_vectors"]
    res = table.optimize()
    assert not res["skipped"] and res.get("dv_files_purged", 0) >= 1
    head = table._load(table.current_version())
    assert head.get("deletion_vectors", {}) == {}
    assert {r.k for r in table.read().collect()} == {1, 3, 4, 5}
    # Untouched partitions carried byte-identical through the purge.
    carried = set(table._load(v)["files"]) & set(head["files"])
    assert carried and all(f.startswith("day=b") for f in carried)


def test_optimize_skips_when_no_dvs_and_layout_fine(spark, table):
    table.append(_df(spark, ROWS))
    table.compact(1)
    assert table.optimize()["skipped"]


def test_expire_keeps_live_dv_sidecars(spark, table):
    table.append(_df(spark, ROWS))
    rel = table.delete_dv("k = 1")["dv_file"]
    table.expire_snapshots(retain_last=1, orphan_retention_s=0.0)
    assert os.path.exists(os.path.join(table.path, rel))
    assert table.read().count() == 4
    # Once the purge rewrites and history expires, the sidecar is an
    # orphan and the sweep removes it.
    table.optimize()
    table.expire_snapshots(retain_last=1, orphan_retention_s=0.0)
    assert not os.path.exists(os.path.join(table.path, rel))


def test_delete_dv_after_rename_and_added_column(spark, table):
    table.append(_df(spark, ROWS))
    table.add_column("flag", "int", default=7)
    table.rename_column("v", "val")
    res = table.delete_dv("val >= 40 AND flag = 7")
    assert res["n_deleted"] == 2
    got = {(r.k, r.val, r.flag) for r in table.read().collect()}
    assert got == {(1, 10, 7), (2, 20, 7), (3, 30, 7)}


def test_dv_stats_skipping_still_sound(spark, table):
    table.append(_df(spark, ROWS))
    table.delete_dv("k = 4")
    # between-scan over the DV'd range: stats skipping may read the
    # file but the DV must still filter the row.
    got = {r.k for r in table.read(between={"k": (3, 5)}).collect()}
    assert got == {3, 5}
