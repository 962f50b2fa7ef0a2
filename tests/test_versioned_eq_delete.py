"""Equality deletes on VersionedTable (Iceberg v2 equality-delete-file
analog): delete-by-value with NO data-file read — an O(|values|)
metadata commit whose sidecar suppresses matching rows in exactly the
files that existed at delete time. Later appends with the same key
values are NOT covered (the Iceberg sequence-number rule), reads
reconcile everywhere, OPTIMIZE folds the sidecars away, and the
mechanism composes with DVs, row tracking, restore, and clone.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crypto_lakehouse_spark.pipeline.versioned import VersionedTable

ROWS = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40), (5, "b", 50)]


def _df(spark, rows, cols=("k", "day", "v")):
    return spark.createDataFrame(rows, list(cols))


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "t"), partition_by=["day"])


def _keys(t, version=None):
    return sorted(r.k for r in t.read(version=version).collect())


def test_delete_eq_basic_no_data_read(spark, table):
    table.append(_df(spark, ROWS))
    files_before = sorted(table._load(0)["files"])
    res = table.delete_eq(["k"], spark.createDataFrame([(2,), (4,)], ["k"]))
    assert not res["skipped"] and res["n_delete_values"] == 2
    # Data files byte-identical and all carried — metadata-only.
    assert sorted(table._load(res["version"])["files"]) == files_before
    assert _keys(table) == [1, 3, 5]
    assert table.detail()["num_equality_deletes"] == 1


def test_delete_eq_later_appends_uncovered(spark, table):
    """The Iceberg sequence-number rule: a row appended AFTER the
    delete with a deleted key value is visible."""
    table.append(_df(spark, ROWS))
    table.delete_eq(["k"], spark.createDataFrame([(2,)], ["k"]))
    table.append(_df(spark, [(2, "a", 999)]))
    got = sorted((r.k, r.v) for r in table.read().collect())
    assert got == [(1, 10), (2, 999), (3, 30), (4, 40), (5, 50)]


def test_delete_eq_multi_column_and_nulls(spark, table):
    table.append(_df(spark, ROWS + [(None, "a", 60)]))
    table.delete_eq(
        ["k", "day"],
        spark.createDataFrame([(3, "b"), (None, "a")], ["k", "day"]),
    )
    got = sorted(
        (r.k, r.v) for r in table.read().collect() if r.k is not None
    )
    assert got == [(1, 10), (2, 20), (4, 40), (5, 50)]
    assert table.read().count() == 4  # null-key row died (null-safe eq)


def test_delete_eq_time_travel(spark, table):
    table.append(_df(spark, ROWS))
    table.delete_eq(["k"], spark.createDataFrame([(1,)], ["k"]))
    assert _keys(table, version=0) == [1, 2, 3, 4, 5]
    assert _keys(table) == [2, 3, 4, 5]


def test_optimize_folds_eq_deletes(spark, table):
    table.append(_df(spark, ROWS))
    table.compact()  # layout within target -> next optimize = purge path
    table.delete_eq(["k"], spark.createDataFrame([(5,)], ["k"]))
    res = table.optimize()
    assert not res["skipped"] and res["dv_files_purged"] >= 1
    snap = table._load(table.current_version())
    assert snap.get("equality_deletes", []) == []
    assert _keys(table) == [1, 2, 3, 4]
    # Idempotent once folded.
    assert table.optimize()["skipped"]


def test_cow_rewrite_bakes_in_and_uncovers(spark, table):
    table.append(_df(spark, ROWS))
    table.delete_eq(["k"], spark.createDataFrame([(3,)], ["k"]))
    # COW delete touching day=b rewrites that file: the eq delete
    # must not resurrect k=3 nor kill a rewritten survivor.
    table.delete("v >= 50")
    assert _keys(table) == [1, 2, 4]
    # Coverage only ever SHRINKS: rewritten (post-delete) files must
    # not be covered — every covered file predates the eq delete.
    v0_files = set(table._load(0)["files"])
    eqs = table._load(table.current_version())["equality_deletes"]
    assert all(f in v0_files for e in eqs for f in e["applies_to"])
    # And a full compaction uncovers everything.
    table.compact()
    assert table._load(table.current_version())["equality_deletes"] == []
    assert _keys(table) == [1, 2, 4]


def test_delete_eq_composes_with_dv(spark, table):
    table.append(_df(spark, ROWS))
    table.delete_eq(["k"], spark.createDataFrame([(1,)], ["k"]))
    table.delete_dv("k = 4")
    assert _keys(table) == [2, 3, 5]


def test_delete_eq_with_row_tracking(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "rt"), row_tracking=True)
    t.append(_df(spark, ROWS))
    before = {
        r.k: r._row_id for r in t.read(with_row_ids=True).collect()
    }
    t.delete_eq(["k"], spark.createDataFrame([(2,)], ["k"]))
    ids = {r.k: r._row_id for r in t.read(with_row_ids=True).collect()}
    assert ids == {k: v for k, v in before.items() if k != 2}
    t.optimize()
    assert {
        r.k: r._row_id for r in t.read(with_row_ids=True).collect()
    } == ids


def test_restore_and_clone_carry_eq_deletes(spark, table, tmp_path):
    table.append(_df(spark, ROWS))
    table.delete_eq(["k"], spark.createDataFrame([(2,)], ["k"]))
    v_eq = table.current_version()
    table.restore(0)
    assert _keys(table) == [1, 2, 3, 4, 5]  # pre-delete state back
    table.restore(v_eq)
    assert _keys(table) == [1, 3, 4, 5]  # delete state back
    dest = table.clone_to(str(tmp_path / "c"))
    assert _keys(dest) == [1, 3, 4, 5]
    assert os.path.exists(
        os.path.join(
            dest.path,
            dest._load(0)["equality_deletes"][0]["file"],
        )
    )


def test_rename_drop_guards(spark, table):
    table.append(_df(spark, ROWS))
    table.delete_eq(["k"], spark.createDataFrame([(1,)], ["k"]))
    with pytest.raises(ValueError, match="equality delete"):
        table.rename_column("k", "kk")
    with pytest.raises(ValueError, match="equality delete"):
        table.drop_column("k")
    # Folding clears the restriction.
    table.optimize()
    table.rename_column("k", "kk")
    assert sorted(r.kk for r in table.read().collect()) == [2, 3, 4, 5]


def test_delete_eq_empty_and_missing_key(spark, table):
    table.append(_df(spark, ROWS))
    res = table.delete_eq(["k"], spark.createDataFrame([], "k bigint"))
    assert res["skipped"]
    with pytest.raises(ValueError, match="not in table columns"):
        table.delete_eq(["nope"], spark.createDataFrame([(1,)], ["nope"]))


def test_expire_keeps_live_eq_sidecars(spark, table):
    table.append(_df(spark, ROWS))
    table.delete_eq(["k"], spark.createDataFrame([(1,)], ["k"]))
    rel = table._load(table.current_version())["equality_deletes"][0]["file"]
    table.expire_snapshots(retain_last=1, orphan_retention_s=0.0)
    assert os.path.exists(os.path.join(table.path, rel))
    assert _keys(table) == [2, 3, 4, 5]


# --- metadata-only aggregates (summarize_metadata) ---------------------------


def test_summarize_metadata_exact(spark, table):
    table.append(_df(spark, ROWS))
    row = table.summarize_metadata(["k", "v"]).collect()[0]
    assert (row.n_rows, row.min_k, row.max_k, row.min_v, row.max_v) == (
        5, 1, 5, 10, 50,
    )


def test_summarize_metadata_version_and_evolution(spark, table):
    table.append(_df(spark, ROWS))
    table.delete("k = 5")
    assert table.summarize_metadata(["k"]).collect()[0].max_k == 4
    assert (
        table.summarize_metadata(["k"], version=0).collect()[0].max_k == 5
    )
    table.rename_column("k", "kk")
    row = table.summarize_metadata(["kk"]).collect()[0]
    assert (row.min_kk, row.max_kk) == (1, 4)


def test_summarize_metadata_refuses_inexact(spark, table):
    table.append(_df(spark, ROWS))
    with pytest.raises(ValueError, match="no footer stats"):
        table.summarize_metadata(["day"])  # partition col: no file stats
    table.add_column("extra", "int", default=7)
    with pytest.raises(ValueError, match="manifest-added"):
        table.summarize_metadata(["extra"])
    table.delete_dv("k = 1")
    with pytest.raises(ValueError, match="over-count"):
        table.summarize_metadata(["v"])
    table.optimize()  # folds the DV -> exact again
    row = table.summarize_metadata(["v"]).collect()[0]
    assert (row.n_rows, row.min_v, row.max_v) == (4, 20, 50)
