"""Input-layout robustness — the round-3 incident, pinned as a contract.

The driver regenerated its testdata as single-file/single-row-group
parquet with TIMESTAMP_NTZ columns; the engine silently serialized
every scan onto one core (3.6x bench collapse) and two queries failed
analysis. These tests freeze the recovery behavior: whatever physical
encoding/layout the input arrives in, `io.load_table` must (a) restore
TIMESTAMP columns exactly and (b) hand downstream stages a scan with
real parallelism.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from crypto_lakehouse_spark.io import load_table, parquet_layout

SRC = "/root/testdata/sf0.001"


def _write_single_row_group(tbl: pa.Table, dest: str) -> None:
    # One huge row group => Spark cannot split the scan by byte range.
    pq.write_table(tbl, dest, row_group_size=1_000_000_000)


def _as_ntz_micros(tbl: pa.Table, col: str) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, col, tbl.column(col).cast(pa.timestamp("us")))


def _as_bigint_nanos(tbl: pa.Table, col: str) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    nanos = pc.multiply(
        tbl.column(col).cast(pa.timestamp("us")).cast(pa.int64()), 1000
    )
    return tbl.set_column(i, col, nanos)


@pytest.mark.parametrize("encoding", ["ntz_micros", "bigint_nanos"])
def test_unsplittable_input_reparallelized_and_normalized(spark, tmp_path, encoding):
    convert = _as_ntz_micros if encoding == "ntz_micros" else _as_bigint_nanos
    for name, col in [("events", "ts"), ("orders", "o_orderdate")]:
        tbl = convert(pq.read_table(f"{SRC}/{name}.parquet"), col)
        _write_single_row_group(tbl, str(tmp_path / f"{name}.parquet"))
        rows, groups = parquet_layout(str(tmp_path / f"{name}.parquet"))
        assert groups == 1, "fixture must be a genuinely unsplittable layout"

        df = load_table(spark, str(tmp_path), name)
        # (a) type normalization: TIMESTAMP (instant), never NTZ/bigint.
        assert dict(df.dtypes)[col] == "timestamp", (name, encoding, df.dtypes)
        # (b) scan re-parallelization: downstream stages must not
        # inherit the single-task scan.
        assert df.rdd.getNumPartitions() > 1, (name, encoding)
        assert df.count() == rows  # nothing dropped/mangled by either step


def test_values_identical_across_encodings(spark, tmp_path):
    """The two physical encodings of the same instants must load to
    byte-identical rows — the exact property the round-3 streaming
    replay violated (10 rows instead of 868, silently)."""
    tbl = pq.read_table(f"{SRC}/events.parquet")
    (tmp_path / "ntz").mkdir()
    (tmp_path / "ns").mkdir()
    _write_single_row_group(_as_ntz_micros(tbl, "ts"), str(tmp_path / "ntz/events.parquet"))
    _write_single_row_group(_as_bigint_nanos(tbl, "ts"), str(tmp_path / "ns/events.parquet"))
    a = load_table(spark, str(tmp_path / "ntz"), "events")
    b = load_table(spark, str(tmp_path / "ns"), "events")
    assert a.schema == b.schema
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_string_timestamp_encoding_normalized(spark, tmp_path):
    """A future regeneration could ship timestamps as ISO text — the
    dtype-keyed rule must restore TIMESTAMP from that too."""
    tbl = pq.read_table(f"{SRC}/events.parquet")
    i = tbl.schema.get_field_index("ts")
    # pyarrow's %S already carries the fractional seconds (%f is not
    # expanded), so the format stops at %S.
    iso = pc.strftime(
        tbl.column("ts").cast(pa.timestamp("us")), format="%Y-%m-%d %H:%M:%S"
    )
    _write_single_row_group(
        tbl.set_column(i, "ts", iso), str(tmp_path / "events.parquet")
    )
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    ref = load_table(spark, SRC, "events")
    assert df.select("event_id", "ts").exceptAll(
        ref.select("event_id", "ts")
    ).isEmpty()


def test_directory_shaped_table_loads(spark, tmp_path):
    """Tables may arrive as a DIRECTORY of parquet files instead of a
    single {name}.parquet — load_table must resolve and (when the
    layout is unsplittable) still re-parallelize."""
    d = tmp_path / "events"
    d.mkdir()
    tbl = _as_ntz_micros(pq.read_table(f"{SRC}/events.parquet"), "ts")
    _write_single_row_group(tbl, str(d / "part-0.parquet"))
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() == tbl.num_rows
    assert df.rdd.getNumPartitions() > 1


def test_splittable_input_not_repartitioned(spark, tmp_path):
    """The gate must NOT fire on healthy multi-row-group input — on a
    real cluster table the extra exchange would be pure waste."""
    tbl = _as_ntz_micros(pq.read_table(f"{SRC}/events.parquet"), "ts")
    target = spark.sparkContext.defaultParallelism
    pq.write_table(
        tbl,
        str(tmp_path / "events.parquet"),
        row_group_size=max(1, tbl.num_rows // (target + 1)),
    )
    rows, groups = parquet_layout(str(tmp_path / "events.parquet"))
    assert groups >= target
    df = load_table(spark, str(tmp_path), "events")
    assert "RoundRobinPartitioning" not in df._jdf.queryExecution().toString()
