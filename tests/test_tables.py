"""LakehouseTable semantics: MERGE upsert, dynamic partition
overwrite isolation, duplicate-source rejection (SURVEY §2.8.6),
compaction."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from crypto_lakehouse_spark.tables import LakehouseTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k BIGINT, v STRING, p STRING")


def test_merge_insert_update(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "t"), ["p"])
    t.merge(_df(spark, [(1, "a", "x"), (2, "b", "y")]), ["k"])
    t.merge(_df(spark, [(2, "B", "y"), (3, "c", "y")]), ["k"])
    got = {(r.k, r.v, r.p) for r in t.read().collect()}
    assert got == {(1, "a", "x"), (2, "B", "y"), (3, "c", "y")}


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "t"), ["p"])
    with pytest.raises(ValueError, match="not unique"):
        t.merge(_df(spark, [(1, "a", "x"), (1, "b", "x")]), ["k"])


def test_merge_touches_only_affected_partitions(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "t"), ["p"])
    t.merge(_df(spark, [(1, "a", "x"), (2, "b", "y")]), ["k"])
    before = set(glob.glob(str(tmp_path / "t" / "p=x" / "*.parquet")))
    t.merge(_df(spark, [(2, "B", "y")]), ["k"])
    after = set(glob.glob(str(tmp_path / "t" / "p=x" / "*.parquet")))
    assert before == after, "untouched partition files must not be rewritten"
    got = {(r.k, r.v) for r in t.read().filter(F.col("p") == "y").collect()}
    assert got == {(2, "B")}


def test_compact_reduces_files(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "t"), ["p"])
    for i in range(4):
        t.append(_df(spark, [(i, "v", "x")]))
    assert len(glob.glob(str(tmp_path / "t" / "p=x" / "*.parquet"))) >= 4
    t.compact()
    assert len(glob.glob(str(tmp_path / "t" / "p=x" / "*.parquet"))) == 1
    assert t.read().count() == 4


def test_unpartitioned_merge_swap(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "u"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k BIGINT, v STRING")
    t.merge(df, ["k"])
    t.merge(spark.createDataFrame([(2, "B")], "k BIGINT, v STRING"), ["k"])
    assert {(r.k, r.v) for r in t.read().collect()} == {(1, "a"), (2, "B")}
    assert t.vacuum_staging() == 0  # swap cleaned up after itself


def test_add_column_sidecar_old_new_mix(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "t"), ["p"])
    t.append(_df(spark, [(1, "a", "x")]))
    t.add_column("score", "double")
    got = t.read()
    assert "score" in got.columns
    assert [r.score for r in got.collect()] == [None]
    # New files carry real values; old files read NULL, merged on read.
    t.append(
        spark.createDataFrame(
            [(2, "b", "x", 0.7)], "k BIGINT, v STRING, p STRING, score DOUBLE"
        )
    )
    vals = {(r.k, r.score) for r in t.read().collect()}
    assert vals == {(1, None), (2, 0.7)}


def test_add_column_with_default_lakehouse(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "t"), ["p"])
    t.append(_df(spark, [(1, "a", "x")]))
    t.add_column("lang", "string", default="en")
    assert [r.lang for r in t.read().collect()] == ["en"]


def test_merge_rejects_partition_moving_key_lakehouse(spark, tmp_path):
    import pytest

    t = LakehouseTable(spark, str(tmp_path / "t"), ["p"])
    t.merge(_df(spark, [(1, "a", "x"), (2, "b", "y")]), ["k"])
    with pytest.raises(ValueError, match="outside the source's partitions"):
        t.merge(_df(spark, [(1, "A", "y")]), ["k"])
    # Table unchanged by the failed merge.
    assert {(r.k, r.p) for r in t.read().collect()} == {(1, "x"), (2, "y")}


# --- MERGE WHEN MATCHED DELETE ---------------------------------------------


def test_merge_delete_matched(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "t"), ["p"])
    t.merge(_df(spark, [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")]), ["k"])
    # k=2 deleted, k=3 updated, k=4 inserted; k=9 delete-of-absent is a no-op.
    t.merge(
        _df(spark, [(2, "DEL", "x"), (3, "c2", "y"), (4, "d", "y"), (9, "DEL", "x")]),
        ["k"],
        delete_match="v = 'DEL'",
    )
    got = {(r.k, r.v, r.p) for r in t.read().collect()}
    assert got == {(1, "a", "x"), (3, "c2", "y"), (4, "d", "y")}


def test_merge_delete_empties_whole_partition(spark, tmp_path):
    import os

    t = LakehouseTable(spark, str(tmp_path / "t"), ["p"])
    t.merge(_df(spark, [(1, "a", "x"), (2, "b", "y")]), ["k"])
    # Deleting the only row of partition p=x must remove the partition
    # itself — dynamic overwrite alone would leave it behind.
    t.merge(_df(spark, [(1, "DEL", "x")]), ["k"], delete_match="v = 'DEL'")
    assert {(r.k, r.p) for r in t.read().collect()} == {(2, "y")}
    assert not os.path.isdir(os.path.join(t.path, "p=x"))


def test_merge_delete_unpartitioned(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path / "t"))
    t.merge(_df(spark, [(1, "a", "x"), (2, "b", "y")]), ["k"])
    t.merge(_df(spark, [(2, "DEL", "y")]), ["k"], delete_match="v = 'DEL'")
    assert {(r.k, r.v) for r in t.read().collect()} == {(1, "a")}


def test_merge_delete_empties_escaped_partition(spark, tmp_path):
    """ADVICE r5 (tables.py merge cleanup): partition values Spark
    escapes on disk ('a:b' → 'a%3Ab') must still be found and removed
    when a MERGE delete empties the partition — previously the
    f"{col}={val}" path missed the escaped name and the rows survived."""
    t = LakehouseTable(spark, str(tmp_path / "t"), ["p"])
    t.merge(_df(spark, [(1, "a", "a:b"), (2, "b", "ok")]), ["k"])
    assert glob.glob(str(tmp_path / "t" / "p=a%3Ab" / "*.parquet"))
    t.merge(_df(spark, [(1, "DEL", "a:b")]), ["k"], delete_match="v = 'DEL'")
    assert {(r.k, r.p) for r in t.read().collect()} == {(2, "ok")}
    assert not glob.glob(str(tmp_path / "t" / "p=a%3Ab"))


def test_merge_delete_empties_null_partition(spark, tmp_path):
    """NULL partition value lands in __HIVE_DEFAULT_PARTITION__;
    emptying it via MERGE delete must remove that directory."""
    t = LakehouseTable(spark, str(tmp_path / "t"), ["p"])
    t.merge(_df(spark, [(1, "a", None), (2, "b", "ok")]), ["k"])
    assert glob.glob(str(tmp_path / "t" / "p=__HIVE_DEFAULT_PARTITION__"))
    t.merge(_df(spark, [(1, "DEL", None)]), ["k"], delete_match="v = 'DEL'")
    assert {(r.k, r.p) for r in t.read().collect()} == {(2, "ok")}
    assert not glob.glob(str(tmp_path / "t" / "p=__HIVE_DEFAULT_PARTITION__"))


def test_merge_upsert_preserves_null_partition_rows(spark, tmp_path):
    """Pruned-rewrite join must be NULL-safe: merging into the NULL
    partition must keep its unmatched target rows."""
    t = LakehouseTable(spark, str(tmp_path / "t"), ["p"])
    t.merge(_df(spark, [(1, "a", None), (2, "b", None)]), ["k"])
    t.merge(_df(spark, [(1, "A", None)]), ["k"])
    assert {(r.k, r.v) for r in t.read().collect()} == {(1, "A"), (2, "b")}
