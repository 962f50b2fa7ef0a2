"""Text-format source connectors: typed roundtrips and T9 DLQ routing
for CSV / JSON-lines landing zones (sources/text_formats.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_lakehouse_spark.io import load_table
from crypto_lakehouse_spark.sources.text_formats import (
    read_events_csv,
    read_events_jsonl,
    read_with_dlq,
)

SF = "/root/testdata/sf0.001"


def _stage(spark, tmp_path, fmt):
    ev = load_table(spark, SF, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "event_type", "value"
    )
    out = str(tmp_path / fmt)
    if fmt == "csv":
        ev.write.option("header", "true").csv(out)
    else:
        ev.write.json(out)
    return out


def test_csv_roundtrip_exact(spark, tmp_path):
    path = _stage(spark, tmp_path, "csv")
    back = read_events_csv(spark, path)
    orig = load_table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    assert dict(back.dtypes)["ts"] == "timestamp"
    assert back.exceptAll(orig).isEmpty() and orig.exceptAll(back).isEmpty()


def test_jsonl_roundtrip_exact(spark, tmp_path):
    path = _stage(spark, tmp_path, "jsonl")
    back = read_events_jsonl(spark, path)
    orig = load_table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    assert back.exceptAll(orig).isEmpty() and orig.exceptAll(back).isEmpty()


def test_csv_malformed_rows_route_to_dlq(spark, tmp_path):
    bad_dir = tmp_path / "bad_csv"
    bad_dir.mkdir()
    (bad_dir / "part-0.csv").write_text(
        "event_id,ts_us,event_type,value\n"
        "1,1700000000000000,click,1.5\n"
        "not_a_number,1700000000000001,click,2.5\n"  # bad event_id
        "3,1700000000000002,purchase,oops\n"  # bad value
        "4,1700000000000003,view,4.0\n"
    )
    good, dlq = read_with_dlq(spark, str(bad_dir), "csv")
    assert good.count() == 2
    assert sorted(r.event_id for r in good.collect()) == [1, 4]
    bad_rows = dlq.collect()
    assert len(bad_rows) == 2
    assert all(r.error == "csv_parse_error" for r in bad_rows)
    assert all(r.original_message for r in bad_rows)  # raw line kept


def test_jsonl_malformed_rows_route_to_dlq(spark, tmp_path):
    bad_dir = tmp_path / "bad_jsonl"
    bad_dir.mkdir()
    (bad_dir / "part-0.json").write_text(
        '{"event_id": 1, "ts_us": 1700000000000000, "event_type": "click", "value": 1.5}\n'
        "{this is not json}\n"
        '{"event_id": 3, "ts_us": 1700000000000002, "event_type": "view", "value": 3.0}\n'
    )
    good, dlq = read_with_dlq(spark, str(bad_dir), "jsonl")
    assert sorted(r.event_id for r in good.collect()) == [1, 3]
    assert dlq.count() == 1


# --- custom Python data source: write path ----------------------------------


def test_arrow_parquet_writer_roundtrip_and_overwrite(spark, sf_dir, tmp_path):
    from crypto_lakehouse_spark.io import load_table
    from crypto_lakehouse_spark.sources.pyarrow_source import register

    register(spark)
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = str(tmp_path / "pyds_write")
    ev.write.format("arrow_parquet").option("path", out).mode("append").save()
    import os

    assert os.path.isfile(os.path.join(out, "_SUCCESS"))
    assert not os.path.isdir(os.path.join(out, "_staging"))  # staging cleaned
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert {r.event_id for r in back.collect()} == {
        r.event_id for r in ev.collect()
    }
    # Overwrite replaces previous part files.
    ev.limit(7).write.format("arrow_parquet").option("path", out).mode(
        "overwrite"
    ).save()
    spark.catalog.refreshByPath(out)
    assert spark.read.parquet(out).count() == 7


def test_arrow_parquet_filter_pushdown_prunes_row_groups(spark, tmp_path):
    """VERDICT r5 item 2: pushFilters + footer min/max must plan FEWER
    row-group partitions under a selective predicate, with values
    exactly equal to the native parquet read (partial pushdown — Spark
    re-evaluates every filter, pruning is physical only)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crypto_lakehouse_spark.sources.pyarrow_source import register

    register(spark)
    # 10 row groups of 100 rows each, k strictly increasing => tight
    # disjoint per-group [min, max] on k.
    path = str(tmp_path / "rg.parquet")
    tbl = pa.table(
        {
            "k": pa.array(range(1000), pa.int64()),
            "v": pa.array([float(i % 7) for i in range(1000)], pa.float64()),
        }
    )
    pq.write_table(tbl, path, row_group_size=100)

    df = spark.read.format("arrow_parquet").option("path", path).load()
    assert df.rdd.getNumPartitions() == 10

    sel = df.filter((F.col("k") >= 250) & (F.col("k") < 450))
    # k in [250, 450) spans row groups 2..4 only.
    assert sel.rdd.getNumPartitions() == 3
    native = spark.read.parquet(path).filter(
        (F.col("k") >= 250) & (F.col("k") < 450)
    )
    assert sorted((r.k, r.v) for r in sel.collect()) == sorted(
        (r.k, r.v) for r in native.collect()
    )

    # All-pruned scan: empty result, never an error.
    assert df.filter(F.col("k") > 10_000).count() == 0

    # Renamed timestamp column: predicate on ts_us maps back to the
    # file's ts stats (datetime encoding) for pruning.
    path2 = str(tmp_path / "ts.parquet")
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    tbl2 = pa.table(
        {
            "ts": pa.array(
                [base + dt.timedelta(minutes=i) for i in range(1000)],
                pa.timestamp("us"),
            ),
            "v": pa.array(range(1000), pa.int64()),
        }
    )
    pq.write_table(tbl2, path2, row_group_size=100)
    df2 = spark.read.format("arrow_parquet").option("path", path2).load()
    cut = int((base + dt.timedelta(minutes=900)).timestamp() * 1_000_000)
    sel2 = df2.filter(F.col("ts_us") >= cut)
    assert sel2.rdd.getNumPartitions() == 1
    assert sel2.count() == 100


def test_versioned_stream_rejects_non_append_history(spark, tmp_path):
    """The versioned-table streaming source refuses a version that
    removed files (Delta default), and streams the added files when
    ignore_changes is set."""
    import pytest

    from crypto_lakehouse_spark.pipeline.versioned import VersionedTable
    from crypto_lakehouse_spark.sources.versioned_stream import register

    register(spark)
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "k BIGINT, v STRING").coalesce(1)
    )
    t.delete("k = 1")  # v1 removes a file

    def _drain(ignore: str):
        q = (
            spark.readStream.format("versioned_table")
            .option("path", t.path)
            .option("ignore_changes", ignore)
            .load()
            .writeStream.format("memory")
            .queryName(f"vs_{ignore}")
            .option("checkpointLocation", str(tmp_path / f"ck_{ignore}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(f"vs_{ignore}")

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        _drain("false")
    out = _drain("true")
    # v0's file + v1's rewritten file both stream (re-emission under
    # ignore_changes, exactly Delta's documented semantics).
    assert sorted(r.k for r in out.collect()) == [1, 2, 2]


def test_arrow_parquet_stream_checkpoint_restart_no_duplicates(spark, tmp_path):
    """ADVICE r5 (ArrowParquetStreamReader offsets): restarting a
    drained stream from its checkpoint must not replay or duplicate
    rows — the reader folds checkpointed offsets seen via
    partitions()/commit() into its cursor so planning stays
    monotonic even though the python process is fresh."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crypto_lakehouse_spark.sources.pyarrow_source import register

    register(spark)
    path = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"k": pa.array(range(100), pa.int64())}), path
    )
    ckpt = str(tmp_path / "ckpt")
    seen: list[int] = []

    def _writer(sink: list):
        def _process(batch_df, batch_id):
            sink.append(batch_df.count())

        return _process

    # First drain: processingTime trigger walks the chunked offsets
    # (one chunk per trigger — the micro-batch demonstration path).
    import time as _t

    q = (
        spark.readStream.format("arrow_parquet")
        .option("path", path)
        .option("n_batches", "4")
        .load()
        .writeStream.foreachBatch(_writer(seen))
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    # Synchronize on full offset COMMIT, not just foreachBatch side
    # effects: stop() racing an uncommitted batch would make the
    # restart legitimately replay it (the at-least-once contract),
    # which is not what this test probes.
    q.processAllAvailable()
    q.stop()
    assert sum(seen) == 100

    # Restart from the checkpoint in a fresh reader process:
    # initialOffset is skipped, so latestOffset reports the durable
    # total (== committed offset) and NOTHING replays.
    replayed: list[int] = []
    q2 = (
        spark.readStream.format("arrow_parquet")
        .option("path", path)
        .option("n_batches", "4")
        .load()
        .writeStream.foreachBatch(_writer(replayed))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert sum(replayed) == 0, f"checkpoint restart replayed rows: {replayed}"


def test_versioned_stream_checkpoint_restart_tails_only_new_versions(
    spark, tmp_path
):
    """Restart-proof version offsets: drain v0..v1, commit v2 while
    the stream is DOWN, restart from the checkpoint — only v2's files
    stream (latestOffset reads the durable manifest log, so a fresh
    reader process cannot regress)."""
    from crypto_lakehouse_spark.pipeline.versioned import VersionedTable
    from crypto_lakehouse_spark.sources.versioned_stream import register

    register(spark)
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1,), (2,)], "k BIGINT").coalesce(1))
    t.append(spark.createDataFrame([(3,)], "k BIGINT").coalesce(1))
    ckpt = str(tmp_path / "ckpt")
    batches: list[list[int]] = []

    def _drain(sink):
        q = (
            spark.readStream.format("versioned_table")
            .option("path", t.path)
            .load()
            .writeStream.foreachBatch(
                lambda df, bid: sink.append(sorted(r.k for r in df.collect()))
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _drain(batches)
    assert sorted(k for b in batches for k in b) == [1, 2, 3]

    t.append(spark.createDataFrame([(4,), (5,)], "k BIGINT").coalesce(1))
    replay: list[list[int]] = []
    _drain(replay)
    assert sorted(k for b in replay for k in b) == [4, 5], (
        f"restart must stream only the new version, got {replay}"
    )


def test_versioned_stream_decimal_bool_date_as_string(spark, tmp_path):
    """ADVICE r6 (versioned_stream schema mismatch): decimal, boolean
    and date columns are DECLARED as STRING by schema() — read() must
    yield them cast to string so the batch matches the declaration
    instead of failing with an Arrow/Spark type mismatch; a binary
    column fails loudly at planning time with the column named."""
    import pytest

    from crypto_lakehouse_spark.pipeline.versioned import VersionedTable
    from crypto_lakehouse_spark.sources.versioned_stream import register

    register(spark)
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(
        spark.sql(
            "SELECT 1 AS k, CAST(100.5 AS DECIMAL(10,4)) AS price, "
            "TRUE AS flag, DATE '2024-03-01' AS d"
        ).coalesce(1)
    )
    q = (
        spark.readStream.format("versioned_table")
        .option("path", t.path)
        .load()
        .writeStream.format("memory")
        .queryName("vs_types")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    row = spark.table("vs_types").collect()[0]
    assert row.k == 1
    assert row.price == "100.5000" and isinstance(row.price, str)
    assert row.flag == "true"
    assert row.d == "2024-03-01"

    # Binary column: descriptive planning-time error, not a runtime
    # Arrow mismatch.
    t2 = VersionedTable(spark, str(tmp_path / "t2"))
    t2.append(
        spark.sql("SELECT 1 AS k, CAST('ab' AS BINARY) AS blob").coalesce(1)
    )
    with pytest.raises(Exception, match="blob"):
        (
            spark.readStream.format("versioned_table")
            .option("path", t2.path)
            .load()
        )
