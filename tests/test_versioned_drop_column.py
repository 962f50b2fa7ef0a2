"""ALTER TABLE DROP COLUMN on VersionedTable: metadata-only drop,
read-time exclusion on every path, time travel across the drop,
physical purge on rewrite, and the name-reservation guards that keep
stale physical data from resurrecting.
"""

from __future__ import annotations

import os

import pytest

from crypto_lakehouse_spark.pipeline.versioned import VersionedTable


def _df(spark, rows, cols=("k", "day", "v", "note")):
    return spark.createDataFrame(rows, list(cols))


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"), partition_by=["day"])
    t.append(_df(spark, [(1, "a", 10, "x"), (2, "b", 20, "y")]))
    return t


def test_drop_column_metadata_only_and_read(spark, table):
    files_before = sorted(table._load(0)["files"])
    v = table.drop_column("note")
    assert sorted(table._load(v)["files"]) == files_before
    assert set(table.read().columns) == {"k", "day", "v"}
    got = {(r.k, r.v) for r in table.read().collect()}
    assert got == {(1, 10), (2, 20)}


def test_drop_column_time_travel_sees_predrop(spark, table):
    table.drop_column("note")
    assert "note" in table.read(version=0).columns
    assert "note" not in table.read().columns


def test_drop_column_guards(spark, table):
    with pytest.raises(ValueError, match="no column"):
        table.drop_column("nope")
    with pytest.raises(ValueError, match="partition column"):
        table.drop_column("day")
    table.add_constraint("v_pos", "v >= 0")
    with pytest.raises(ValueError, match="constraint"):
        table.drop_column("v")
    table.drop_constraint("v_pos")
    table.drop_column("v")
    assert "v" not in table.read().columns


def test_readd_dropped_name_rejected_until_rewrite(spark, table):
    table.drop_column("note")
    with pytest.raises(ValueError, match="DROPPED"):
        table.add_column("note", "string")
    with pytest.raises(ValueError, match="physical storage name|reserved"):
        table.rename_column("v", "note")
    # A rewrite (compact reads the dropped-free frame and writes fresh
    # files) purges the physical data... the reservation is recorded in
    # the manifest and carried, so the guard still stands until the
    # metadata is reset by an overwrite path that clears it. Re-adding
    # under a NEW name always works.
    table.add_column("note2", "string", default="z")
    assert {r.note2 for r in table.read().collect()} == {"z"}


def test_rewrite_purges_dropped_column_physically(spark, table):
    import pyarrow.parquet as pq

    table.drop_column("note")
    table.compact(1)
    head = table._load(table.current_version())
    for f in head["files"]:
        schema = pq.ParquetFile(os.path.join(table.path, f)).schema_arrow
        assert "note" not in schema.names
    assert {(r.k, r.v) for r in table.read().collect()} == {(1, 10), (2, 20)}


def test_drop_after_rename_uses_physical(spark, table):
    table.rename_column("note", "comment")
    table.drop_column("comment")
    cols = set(table.read().columns)
    assert cols == {"k", "day", "v"}
    # Pre-drop version still shows the renamed logical name.
    assert "comment" in table.read(version=1).columns


def test_dml_after_drop(spark, table):
    table.drop_column("note")
    table.merge(
        spark.createDataFrame([(2, "b", 99)], "k long, day string, v long"),
        keys=["k"],
    )
    table.delete_dv("k = 1")
    assert {(r.k, r.v) for r in table.read().collect()} == {(2, 99)}
    # The merge rewrite of partition b dropped the physical column.
    import pyarrow.parquet as pq

    head = table._load(table.current_version())
    rewritten = [f for f in head["files"] if f.startswith("day=b")]
    assert rewritten
    for f in rewritten:
        schema = pq.ParquetFile(os.path.join(table.path, f)).schema_arrow
        assert "note" not in schema.names


def test_drop_added_column(spark, table):
    table.add_column("flag", "int", default=3)
    assert {r.flag for r in table.read().collect()} == {3}
    table.drop_column("flag")
    assert "flag" not in table.read().columns
