"""Generated columns on VersionedTable (Delta GENERATED ALWAYS AS
analog): declared at CREATE (usable as partition columns) or later via
add_generated_column; writes compute-or-validate, UPDATE recomputes,
reads backfill pre-declaration files, and schema-evolution guards keep
the name-bound declarations sound.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from crypto_lakehouse_spark.pipeline.versioned import VersionedTable


def _df(spark, rows, cols=("k", "ts", "v")):
    return spark.createDataFrame(rows, list(cols))


TS = datetime.datetime(2024, 3, 1, 12, 0, 0)
ROWS = [
    (1, TS, 10.0),
    (2, TS + datetime.timedelta(days=1), 20.0),
    (3, TS + datetime.timedelta(days=1), 30.0),
    (4, TS + datetime.timedelta(days=2), 40.0),
]


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedTable(
        spark,
        str(tmp_path / "t"),
        partition_by=["event_date"],
        generated_columns={
            "event_date": {"expr": "CAST(ts AS DATE)", "type": "date"}
        },
    )


def test_partition_by_generated_column(spark, table):
    """The Delta flagship pattern: PARTITIONED BY a generated date —
    writers never supply it, and date filters prune partitions."""
    table.append(_df(spark, ROWS))
    got = {(r.k, str(r.event_date)) for r in table.read().collect()}
    assert got == {
        (1, "2024-03-01"),
        (2, "2024-03-02"),
        (3, "2024-03-02"),
        (4, "2024-03-03"),
    }
    files, total = table.files_for_scan(
        between={"event_date": ("2024-03-02", "2024-03-02")}
    )
    assert 0 < len(files) < total  # partition-dir pruning bites


def test_write_validates_provided_values(spark, table):
    table.append(_df(spark, ROWS))
    bad = _df(
        spark,
        [(9, TS, 1.0, datetime.date(1999, 1, 1))],
        cols=("k", "ts", "v", "event_date"),
    )
    with pytest.raises(ValueError, match="disagrees"):
        table.append(bad)
    ok = _df(
        spark,
        [(9, TS, 1.0, datetime.date(2024, 3, 1))],
        cols=("k", "ts", "v", "event_date"),
    )
    table.append(ok)
    assert table.read().count() == 5


def test_update_recomputes_generated(spark, table):
    table.append(_df(spark, ROWS))
    with pytest.raises(ValueError, match="generated column"):
        table.update("k = 1", {"event_date": "DATE'2020-01-01'"})
    # Updating v is fine and leaves the generated value consistent.
    table.update("k = 1", {"v": "v + 1"})
    row = [r for r in table.read().collect() if r.k == 1][0]
    assert (row.v, str(row.event_date)) == (11.0, "2024-03-01")


def test_add_generated_column_backfills_on_read(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "g"))
    t.append(_df(spark, ROWS))
    t.add_generated_column("day_of_month", "DAY(ts)", "int")
    got = {r.k: r.day_of_month for r in t.read().collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 3}
    # Post-declaration writes store it physically; old files keep
    # backfilling — mixed scan stays consistent.
    t.append(_df(spark, [(5, TS, 50.0)]))
    got = {r.k: r.day_of_month for r in t.read().collect()}
    assert got[5] == 1 and got[2] == 2
    # Time travel to the pre-declaration version has no such column.
    assert "day_of_month" not in t.read(version=0).columns


def test_merge_computes_generated_for_source(spark, table):
    table.append(_df(spark, ROWS))
    src = _df(spark, [(2, TS + datetime.timedelta(days=1), 222.0),
                      (9, TS, 90.0)])
    table.merge(src, keys=["k", "event_date"])
    got = {r.k: (r.v, str(r.event_date)) for r in table.read().collect()}
    assert got[2] == (222.0, "2024-03-02")
    assert got[9] == (90.0, "2024-03-01")


def test_rename_drop_guards(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "g2"))
    t.append(_df(spark, ROWS))
    t.add_generated_column("day_of_month", "DAY(ts)", "int")
    with pytest.raises(ValueError, match="generated"):
        t.rename_column("ts", "event_ts")
    with pytest.raises(ValueError, match="generated"):
        t.drop_column("ts")
    # Dropping the generated column itself removes the declaration.
    t.drop_column("day_of_month")
    assert "day_of_month" not in t.read().columns
    assert t._load(t.current_version())["generated_columns"] == {}
    t.rename_column("ts", "event_ts")  # now legal
    assert "event_ts" in t.read().columns


def test_add_generated_column_rejects_bad_expr(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "g3"))
    t.append(_df(spark, ROWS))
    with pytest.raises(Exception):
        t.add_generated_column("x", "NO_SUCH_FN(q)", "int")
    assert "generated_columns" not in t._load(t.current_version()) or not t._load(
        t.current_version()
    )["generated_columns"]


def test_generated_with_row_tracking_and_delete(spark, tmp_path):
    t = VersionedTable(
        spark,
        str(tmp_path / "g4"),
        row_tracking=True,
        generated_columns={
            "vk": {"expr": "CAST(v AS INT) * 100 + k", "type": "int"}
        },
    )
    t.append(_df(spark, ROWS))
    before = {r.k: r._row_id for r in t.read(with_row_ids=True).collect()}
    t.delete("k = 4")
    ids = {r.k: r._row_id for r in t.read(with_row_ids=True).collect()}
    assert ids == {k: v for k, v in before.items() if k != 4}
    got = {r.k: r.vk for r in t.read().collect()}
    assert got == {1: 1001, 2: 2002, 3: 3003}
