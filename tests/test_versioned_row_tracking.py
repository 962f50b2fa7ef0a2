"""Row tracking on VersionedTable (Delta row-tracking analog): every
row gets a stable `_row_id` assigned at first commit (per-file base +
row position) that SURVIVES compact / OPTIMIZE / COW DELETE / UPDATE /
MERGE / DV MERGE / restore / clone, because every rewrite materializes
surviving rows' ids into the new files and fresh rows draw from a
monotone per-table counter (no reuse, no collision).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_lakehouse_spark.pipeline.versioned import VersionedTable

ROWS = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40), (5, "b", 50)]


def _df(spark, rows, cols=("k", "day", "v")):
    return spark.createDataFrame(rows, list(cols))


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedTable(
        spark, str(tmp_path / "t"), partition_by=["day"], row_tracking=True
    )


@pytest.fixture()
def flat(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "f"), row_tracking=True)


def _ids(t, version=None):
    return {
        r.k: r._row_id
        for r in t.read(version=version, with_row_ids=True).collect()
    }


def test_initial_ids_dense_and_unique(spark, table):
    table.append(_df(spark, ROWS))
    ids = _ids(table)
    assert sorted(ids.values()) == [0, 1, 2, 3, 4]
    assert table._load(0)["row_tracking"]["next"] == 5


def test_append_extends_id_space(spark, table):
    table.append(_df(spark, ROWS))
    table.append(_df(spark, [(6, "c", 60), (7, "c", 70)]))
    ids = _ids(table)
    assert sorted(ids.values()) == [0, 1, 2, 3, 4, 5, 6]
    # Pre-existing rows kept their ids (their files were carried).
    assert {k: v for k, v in ids.items() if k <= 5} == {
        k: v for k, v in _ids(table, version=0).items()
    }


def test_compact_preserves_ids(spark, table):
    table.append(_df(spark, ROWS))
    before = _ids(table)
    table.compact()
    assert _ids(table) == before
    # The compacted files physically materialized the ids.
    snap = table._load(table.current_version())
    fields = {f["name"] for f in snap["table_schema"]["fields"]}
    assert "__row_id" in fields


def test_plain_read_never_leaks_id_columns(spark, table):
    table.append(_df(spark, ROWS))
    table.compact()  # files now physically hold __row_id
    cols = set(table.read().columns)
    assert "__row_id" not in cols and "_row_id" not in cols


def test_cow_delete_preserves_survivor_ids(spark, table):
    table.append(_df(spark, ROWS))
    before = _ids(table)
    table.delete("v >= 40")
    ids = _ids(table)
    assert ids == {k: v for k, v in before.items() if k in (1, 2, 3)}


def test_update_preserves_ids(spark, table):
    table.append(_df(spark, ROWS))
    before = _ids(table)
    table.update("k = 3", {"v": "v * 10"})
    ids = _ids(table)
    assert ids == before
    got = {r.k: r.v for r in table.read().collect()}
    assert got[3] == 300


def test_update_rejects_id_assignment(spark, table):
    table.append(_df(spark, ROWS))
    with pytest.raises(ValueError, match="row-tracking id"):
        table.update("k = 1", {"__row_id": "99"})


def test_merge_matched_keeps_id_insert_gets_fresh(spark, table):
    table.append(_df(spark, ROWS))
    before = _ids(table)
    nxt = table._load(0)["row_tracking"]["next"]
    src = _df(spark, [(3, "b", 333), (9, "b", 90)])
    table.merge(src, keys=["k", "day"])
    ids = _ids(table)
    assert ids[3] == before[3]  # UPDATE preserves identity
    assert ids[9] >= nxt  # insert drew from the monotone counter
    assert {k: v for k, v in ids.items() if k in (1, 2, 4, 5)} == {
        k: v for k, v in before.items() if k in (1, 2, 4, 5)
    }
    assert len(set(ids.values())) == len(ids)


def test_merge_dv_matched_keeps_id_insert_gets_fresh(spark, table):
    table.append(_df(spark, ROWS))
    before = _ids(table)
    nxt = table._load(0)["row_tracking"]["next"]
    src = _df(spark, [(2, "a", 222), (9, "c", 90)])
    table.merge_dv(src, keys=["k", "day"])
    ids = _ids(table)
    assert ids[2] == before[2]
    assert ids[9] >= nxt
    assert len(set(ids.values())) == len(ids)
    got = {r.k: r.v for r in table.read().collect()}
    assert got[2] == 222 and got[9] == 90


def test_delete_dv_then_optimize_keeps_ids(spark, table):
    table.append(_df(spark, ROWS))
    before = _ids(table)
    table.delete_dv("k = 4")
    ids_dv = _ids(table)
    assert ids_dv == {k: v for k, v in before.items() if k != 4}
    table.optimize()  # purges the DV by rewriting the file
    assert _ids(table) == ids_dv
    assert not table._load(table.current_version()).get("deletion_vectors")


def test_optimize_zorder_preserves_ids(spark, flat):
    flat.append(_df(spark, ROWS))
    before = _ids(flat)
    flat.optimize(target_file_mb=0.0001, cluster_by=["k", "v"])
    assert _ids(flat) == before


def test_time_travel_ids(spark, table):
    table.append(_df(spark, ROWS))
    v0 = _ids(table, version=0)
    table.delete("k <= 2")
    assert _ids(table, version=0) == v0
    assert _ids(table) == {k: v for k, v in v0.items() if k > 2}


def test_restore_preserves_ids(spark, table):
    table.append(_df(spark, ROWS))
    v0 = _ids(table)
    table.delete("k = 1")
    table.restore(0)
    assert _ids(table) == v0
    # Counter stayed monotone across the restore: a later insert
    # cannot reuse a historical id.
    rt = table._load(table.current_version())["row_tracking"]
    assert rt["next"] >= 5


def test_clone_preserves_ids(spark, table, tmp_path):
    table.append(_df(spark, ROWS))
    table.delete_dv("k = 5")
    src_ids = _ids(table)
    dest = table.clone_to(str(tmp_path / "c"))
    assert _ids(dest) == src_ids


def test_untracked_table_unaffected(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "u"))
    t.append(_df(spark, ROWS))
    assert "row_tracking" not in t._load(0)
    with pytest.raises(ValueError, match="row_tracking"):
        t.read(with_row_ids=True).collect()


def test_reopen_without_flag_maintains_ids(spark, table, tmp_path):
    table.append(_df(spark, ROWS))
    before = _ids(table)
    # A different writer process opens the table WITHOUT the flag:
    # once enabled, the block must survive its commits.
    t2 = VersionedTable(spark, table.path, partition_by=["day"])
    t2.append(_df(spark, [(6, "c", 60)]))
    ids = _ids(t2)
    assert {k: v for k, v in ids.items() if k <= 5} == before
    assert ids[6] == 5


def test_reserved_names_rejected(spark, table):
    table.append(_df(spark, ROWS))
    with pytest.raises(ValueError, match="reserved"):
        table.add_column("__row_id", "bigint")
    with pytest.raises(ValueError, match="reserved"):
        table.rename_column("v", "_row_id")
    with pytest.raises(ValueError, match="row-tracking|reserve"):
        table.merge(
            _df(spark, [(1, "a", 1, 7)], cols=("k", "day", "v", "_row_id")),
            keys=["k", "day"],
            merge_schema=True,
        )


def test_schema_evolution_interplay(spark, table):
    """Ids survive add_column / rename_column / drop_column (metadata
    commits carry the block; rewrites materialize through mapping)."""
    table.append(_df(spark, ROWS))
    before = _ids(table)
    table.add_column("note", "string", default="x")
    table.rename_column("v", "val")
    assert _ids(table) == before
    table.update("k = 2", {"val": "val + 1"})
    assert _ids(table) == before
    table.drop_column("note")
    assert _ids(table) == before
    df = table.read(with_row_ids=True)
    assert set(df.columns) == {"k", "day", "val", "_row_id"}


def test_cdc_by_row_id_classifies_without_keys(spark, flat):
    flat.append(_df(spark, ROWS))
    flat.delete("k = 2")
    flat.update("k = 3", {"v": "v + 5"})
    flat.merge(_df(spark, [(9, "c", 90)]), keys=["k"])
    ch = {
        (r.k, r._change_type)
        for r in flat.table_changes_by_row_id(0).collect()
    }
    assert ch == {
        (2, "delete"),
        (3, "update_preimage"),
        (3, "update_postimage"),
        (9, "insert"),
    }


def test_cdc_by_row_id_compaction_invisible(spark, flat):
    flat.append(_df(spark, ROWS))
    v = flat.current_version()
    flat.compact()
    flat.optimize(target_file_mb=0.0001)
    assert flat.table_changes_by_row_id(v).count() == 0


def test_cdc_by_row_id_handles_duplicate_rows(spark, flat):
    """The case key-less value-diffing cannot solve: two IDENTICAL
    rows, one deleted — row ids tell exactly one 'delete' apart."""
    flat.append(_df(spark, [(1, "a", 10), (1, "a", 10)]))
    flat.delete_dv("k = 1")  # kills both
    ch = [r._change_type for r in flat.table_changes_by_row_id(0).collect()]
    assert ch == ["delete", "delete"]
