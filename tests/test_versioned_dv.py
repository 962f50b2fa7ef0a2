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


def test_merge_dv_matches_cow_merge(spark, tmp_path):
    cow = VersionedTable(spark, str(tmp_path / "mc"), partition_by=["day"])
    dv = VersionedTable(spark, str(tmp_path / "md"), partition_by=["day"])
    for t in (cow, dv):
        t.append(_df(spark, ROWS))
    src = _df(spark, [(2, "a", 99), (6, "c", 60)])
    cow.merge(src, keys=["k"])
    dv.merge_dv(src, keys=["k"])
    a = {tuple(r) for r in cow.read().select("k", "day", "v").collect()}
    b = {tuple(r) for r in dv.read().select("k", "day", "v").collect()}
    assert a == b
    assert (2, "a", 99) in b and (6, "c", 60) in b and (2, "a", 20) not in b


def test_merge_dv_carries_all_files_and_write_tracks_source(spark, table):
    table.append(_df(spark, ROWS))
    before = set(table._load(0)["files"])
    table.merge_dv(_df(spark, [(1, "a", 11)]), keys=["k"])
    head = table._load(table.current_version())
    # Every pre-existing file carried byte-identical; only source-sized
    # new files appended.
    assert before <= set(head["files"])
    assert head["deletion_vectors"], "matched row not marked dead"
    got = {(r.k, r.v) for r in table.read().collect()}
    assert got == {(1, 11), (2, 20), (3, 30), (4, 40), (5, 50)}


def test_merge_dv_pure_insert_writes_no_dv(spark, table):
    table.append(_df(spark, ROWS))
    table.merge_dv(_df(spark, [(9, "c", 90)]), keys=["k"])
    head = table._load(table.current_version())
    assert head.get("deletion_vectors", {}) == {}
    assert table.read().count() == 6


def test_merge_dv_then_optimize_purges(spark, table):
    table.append(_df(spark, ROWS))
    table.compact(1)
    table.merge_dv(_df(spark, [(4, "b", 44)]), keys=["k"])
    # The appended source file pushes the layout over target, so
    # optimize may purge via the full bin-pack rather than the
    # DV-only branch — either way the head must come out DV-free.
    res = table.optimize()
    assert not res["skipped"]
    assert table._load(table.current_version()).get(
        "deletion_vectors", {}
    ) == {}
    got = {(r.k, r.v) for r in table.read().collect()}
    assert got == {(1, 10), (2, 20), (3, 30), (4, 44), (5, 50)}


def test_merge_dv_after_delete_dv_does_not_resurrect(spark, table):
    table.append(_df(spark, ROWS))
    table.delete_dv("k = 5")
    # k=5 is DV-dead: the merge source row for k=5 is an INSERT, and
    # the dead row must stay dead (position diff excludes it).
    table.merge_dv(_df(spark, [(5, "b", 55)]), keys=["k"])
    got = {(r.k, r.v) for r in table.read().collect()}
    assert got == {(1, 10), (2, 20), (3, 30), (4, 40), (5, 55)}


def test_merge_dv_rejects_duplicate_keys_and_new_columns(spark, table):
    table.append(_df(spark, ROWS))
    with pytest.raises(ValueError, match="not unique"):
        table.merge_dv(
            _df(spark, [(1, "a", 1), (1, "a", 2)]), keys=["k"]
        )
    wide = spark.createDataFrame([(1, "a", 1, 9)], "k long, day string, v long, extra long")
    with pytest.raises(ValueError, match="schema evolution"):
        table.merge_dv(wide, keys=["k"])


def test_merge_dv_time_travel(spark, table):
    table.append(_df(spark, ROWS))
    table.merge_dv(_df(spark, [(1, "a", 111)]), keys=["k"])
    assert {r.v for r in table.read(version=0).filter("k = 1").collect()} == {10}
    assert {r.v for r in table.read().filter("k = 1").collect()} == {111}


def test_table_changes_sees_dv_delete(spark, table):
    """CDF across a DV commit: the snapshot-diff formulation reads
    both versions through DV reconciliation, so a delete_dv commit
    must surface as plain delete rows."""
    table.append(_df(spark, ROWS))
    table.delete_dv("k = 2")
    changes = {
        (r["k"], r["_change_type"])
        for r in table.table_changes(["k"], 0, 1).collect()
    }
    assert changes == {(2, "delete")}


def test_dml_on_zero_file_snapshot(spark, table):
    """Regression (round 12): _touched_files/merge_dv scan raw files
    directly now — a zero-file snapshot (every row deleted) must
    no-op deletes and treat every merge_dv source row as an insert
    instead of raising on an empty reader path list."""
    table.append(_df(spark, [(1, "a", 10)]))
    table.delete("k = 1")  # rewrites to a zero-file snapshot
    assert table.read().count() == 0
    assert table.delete("k = 1")["skipped"]
    assert table.delete_dv("k = 1")["skipped"]
    table.merge_dv(_df(spark, [(2, "b", 20)]), keys=["k"])
    assert {(r.k, r.v) for r in table.read().collect()} == {(2, 20)}


def test_restore_across_delete_dv(spark, table):
    """ADVICE r12: restore() must pin the TARGET snapshot's DV map.
    delete_dv is metadata-only (file list unchanged), so inheriting
    the DV map from HEAD would make restore-to-pre-delete keep the
    rows dead — and the reverse restore resurrect them."""
    table.append(_df(spark, ROWS))          # v0: 5 rows, no DVs
    table.delete_dv("k <= 2")               # v1: DV kills k=1,2
    assert table.read().count() == 3
    v2 = table.restore(0)                   # back before the delete
    assert table.read().count() == 5
    assert table._load(v2).get("deletion_vectors", {}) == {}
    v3 = table.restore(1)                   # forward to the DV'd state
    assert {r.k for r in table.read().collect()} == {3, 4, 5}
    assert table._load(v3)["deletion_vectors"]


def test_restore_across_drop_column(spark, table):
    """Restore must also pin dropped_columns: restoring to the
    pre-drop version brings the column back, and restoring to the
    post-drop version from a drop-free HEAD re-hides it."""
    table.append(_df(spark, ROWS))          # v0
    table.drop_column("v")                  # v1
    assert "v" not in table.read().columns
    table.restore(0)                        # v2: column back
    assert "v" in table.read().columns
    assert {r.v for r in table.read().collect()} == {10, 20, 30, 40, 50}
    table.restore(1)                        # v3: hidden again
    assert "v" not in table.read().columns


def test_clone_carries_dvs_and_sidecars(spark, table, tmp_path):
    """ADVICE r12: shallow clone of a table with outstanding DVs must
    carry the DV map AND hard-link the _dv/ sidecars — otherwise the
    clone resurrects deleted rows (or can't read at all)."""
    table.append(_df(spark, ROWS))
    table.delete_dv("day = 'b'")
    assert table.read().count() == 2
    dest = table.clone_to(str(tmp_path / "c"))
    assert {(r.k, r.v) for r in dest.read().collect()} == {(1, 10), (2, 20)}
    m = dest._load(0)
    assert m["deletion_vectors"]
    for rels in m["deletion_vectors"].values():
        for rel in rels:
            assert os.path.exists(os.path.join(dest.path, rel))
    # Independence: deleting more in the source doesn't touch the clone.
    table.delete_dv("k = 1")
    assert dest.read().count() == 2


def test_clone_carries_drop_rename_constraints(spark, tmp_path):
    """Clone must carry dropped_columns, column_mapping and CHECK
    constraints — a clone missing them resurrects dropped columns and
    silently drops governance."""
    src = VersionedTable(spark, str(tmp_path / "s"), partition_by=["day"])
    src.append(
        spark.createDataFrame(
            [(1, "a", 10, "x"), (2, "b", 20, "y")], ["k", "day", "v", "note"]
        )
    )
    src.rename_column("v", "val")
    src.add_constraint("v_pos", "val > 0")
    src.drop_column("note")
    dest = src.clone_to(str(tmp_path / "d"))
    assert set(dest.read().columns) == {"k", "day", "val"}
    m = dest._load(0)
    assert "note" in m["dropped_columns"]
    assert m["column_mapping"].get("val") == "v"
    assert "v_pos" in m["constraints"]
    with pytest.raises(ValueError, match="v_pos"):
        dest.append(
            spark.createDataFrame([(3, "a", -1)], ["k", "day", "val"])
        )


def test_merge_schema_rejects_dropped_name(spark, table):
    """ADVICE r12: merge(merge_schema=True) evolving in a column named
    like a DROPped column must be rejected (mirrors add_column) — the
    data would land in new files but every read would exclude it."""
    table.append(_df(spark, ROWS))
    table.drop_column("v")
    with pytest.raises(ValueError, match="reserved"):
        table.merge(
            _df(spark, [(1, "a", 99)]), keys=["k", "day"], merge_schema=True
        )
