"""Delta backend seam (VERDICT r6 item 4): the whole module skips when
delta-spark is absent (this environment), and exercises the full
`open_table` surface the moment the package lands — the same
jar-boundary discipline as the kafka_reader integration test."""

from __future__ import annotations

import pytest

from crypto_lakehouse_spark.tables import LakehouseTable, open_table


def test_open_table_falls_back_to_parquet_without_delta(spark, tmp_path):
    """Runs in THIS environment: with delta-spark absent, the factory
    must return the parquet-native layer (and forcing backend='delta'
    must fail loudly, never silently downgrade)."""
    from crypto_lakehouse_spark.delta_tables import delta_available

    if delta_available():
        pytest.skip("delta-spark present: fallback path not reachable")
    t = open_table(spark, str(tmp_path / "t"), partition_by=["day"])
    assert isinstance(t, LakehouseTable)
    with pytest.raises(ImportError):
        open_table(spark, str(tmp_path / "t2"), backend="delta")
    with pytest.raises(ValueError):
        open_table(spark, str(tmp_path / "t3"), backend="iceberg")


def _delta_missing() -> bool:
    from crypto_lakehouse_spark.delta_tables import delta_available

    return not delta_available()


# Everything below needs the real package + jar.
needs_delta = pytest.mark.skipif(
    _delta_missing(), reason="delta-spark not installed in this environment"
)


@pytest.fixture()
def dtable(spark, tmp_path):
    t = open_table(spark, str(tmp_path / "d"), partition_by=["day"])
    from crypto_lakehouse_spark.delta_tables import DeltaLakehouseTable

    assert isinstance(t, DeltaLakehouseTable)
    return t


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, day string, v int")


@needs_delta
def test_delta_append_read_roundtrip(spark, dtable):
    dtable.overwrite(_df(spark, [(1, "a", 10)]))
    dtable.append(_df(spark, [(2, "b", 20)]))
    assert {(r.k, r.v) for r in dtable.read().collect()} == {(1, 10), (2, 20)}


@needs_delta
def test_delta_merge_upsert_and_delete_clause(spark, dtable):
    dtable.overwrite(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    src = spark.createDataFrame(
        [(1, "a", 11, False), (3, "c", 30, False), (2, "b", 0, True)],
        "k int, day string, v int, is_delete boolean",
    )
    dtable.merge(src.select("k", "day", "v", "is_delete"),
                 keys=["k", "day"], delete_match="is_delete")
    got = {(r.k, r.v) for r in dtable.read().select("k", "v").collect()}
    assert got == {(1, 11), (3, 30)}


@needs_delta
def test_delta_add_column_metadata_only(spark, dtable):
    dtable.overwrite(_df(spark, [(1, "a", 10)]))
    dtable.add_column("ccy", "string")
    assert "ccy" in dtable.read().columns
    with pytest.raises(NotImplementedError):
        dtable.add_column("x", "int", default=7)


@needs_delta
def test_delta_compact_runs(spark, dtable):
    dtable.overwrite(_df(spark, [(1, "a", 10)]))
    dtable.append(_df(spark, [(2, "a", 20)]))
    dtable.compact()
    assert dtable.read().count() == 2


def test_qualify_rewrites_bare_source_columns():
    """Delta merge conditions reject bare column references (target and
    source share the schema); _qualify pins them to the source alias
    without touching already-qualified or backticked names."""
    from crypto_lakehouse_spark.delta_tables import _qualify

    assert _qualify("v < 0", ["k", "v"], "s") == "s.v < 0"
    assert _qualify("s.v < 0 AND k = 1", ["k", "v"], "s") == "s.v < 0 AND s.k = 1"
    assert _qualify("t.v < 0", ["k", "v"], "s") == "t.v < 0"
    # longest-first ordering keeps overlapping names intact
    assert _qualify("value < val", ["val", "value"], "s") == "s.value < s.val"
