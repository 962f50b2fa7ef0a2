"""Custom Python data source (Spark 4 `pyspark.sql.datasource` API):
a pyarrow-backed parquet reader with explicit partition planning.

Why this exists: the reference's source surface is fixed-format
(Kafka JSON + Iceberg parquet); a complete engine must also expose
the CONNECTOR extension point, and Spark 4's Python DataSource API is
the idiomatic one (no JVM jar required). This source demonstrates all
three contract pieces a real connector needs:

- driver-side `schema()` — reads the parquet footer only (no data
  scan) and normalizes the timestamp column to the epoch-micros
  BIGINT wire rule used by every other landing-zone format here
  (sources/text_formats.py), regardless of whether the file encodes
  ts as TIMESTAMP[us/ns/ms] or int64-nanos (both have shipped in
  driver testdata — see io.normalize_timestamps);
- `partitions()` — one InputPartition per (file, row group), so a
  multi-file / multi-row-group table fans out across executors
  exactly like the native reader. A single-row-group file yields one
  partition — the custom source inherits the same physical-layout
  limits as the JVM scan, which is why io.py's compaction cache
  exists;
- executor-side `read(partition)` — yields pyarrow RecordBatches
  (the Arrow fast path of the API — zero row-at-a-time Python).

Scale posture: the Python worker pays one fork + Arrow IPC per
partition vs the JVM-native scan — use for formats Spark lacks, not
parquet in production (this is the demonstration vehicle with an
exact oracle available). Options: `path` (file or directory),
`columns` (comma list to prune — pushed to pyarrow's column reader).
"""

from __future__ import annotations

import os

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)


class ArrowParquetDataSource(DataSource):
    """format("arrow_parquet") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "arrow_parquet"

    def _files(self) -> list[str]:
        path = self.options["path"]
        if os.path.isdir(path):
            return sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        return [path]

    def _columns(self) -> list[str] | None:
        cols = self.options.get("columns")
        return [c.strip() for c in cols.split(",")] if cols else None

    def schema(self) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        arrow_schema = pq.ParquetFile(self._files()[0]).schema_arrow
        cols = self._columns() or arrow_schema.names
        out = []
        for name in cols:
            typ = arrow_schema.field(name).type
            if pa.types.is_timestamp(typ) or (
                name == "ts" and pa.types.is_int64(typ)
            ):
                out.append(f"{name}_us BIGINT")
            elif pa.types.is_int64(typ) or pa.types.is_int32(typ):
                out.append(f"{name} BIGINT")
            elif pa.types.is_floating(typ):
                out.append(f"{name} DOUBLE")
            else:
                out.append(f"{name} STRING")
        return ", ".join(out)

    def reader(self, schema) -> "ArrowParquetReader":
        return ArrowParquetReader(self._files(), self._columns())


class ArrowParquetReader(DataSourceReader):
    def __init__(self, files: list[str], columns: list[str] | None):
        self.files = files
        self.columns = columns
        # (output column name, op, literal) triples accepted by
        # pushFilters; consulted by partitions() for row-group pruning.
        self.pushed: list[tuple[str, str, object]] = []

    def pushFilters(self, filters):
        """Spark 4.1 pushdown seam (requires
        spark.sql.python.filterPushdown.enabled, set by
        configure_session). Comparison filters on top-level columns are
        recorded and used to SKIP whole row groups whose footer min/max
        proves them empty — the same stats partitions() already reads
        for planning. This is deliberately PARTIAL pushdown: every
        filter is returned for Spark to re-evaluate row-by-row, so the
        pruning is a pure physical optimization and can never change
        results (the same contract as parquet row-group skipping in the
        native reader)."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
        }
        for f in filters:
            op = ops.get(type(f))
            if op is not None and len(f.attribute) == 1:
                self.pushed.append((f.attribute[0], op, f.value))
        return filters  # partial pushdown: Spark still evaluates all

    @staticmethod
    def _stat_bounds(stats, out_name: str, file_col: str):
        """(min, max) of a row-group column in OUTPUT units, or None
        when stats are absent. `*_us` outputs need the footer's
        native encoding (datetime for TIMESTAMP, int64 nanos for the
        driver's bigint-ts files) converted to epoch micros."""
        import datetime as _dt

        if stats is None or not stats.has_min_max:
            return None
        lo, hi = stats.min, stats.max
        if out_name == f"{file_col}_us":
            def to_us(v):
                if isinstance(v, _dt.datetime):
                    epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
                    return int((v - epoch).total_seconds() * 1_000_000)
                return int(v) // 1000  # int64 nanos
            return to_us(lo), to_us(hi)
        return lo, hi

    def _rg_survives(self, pf, rg: int, out_cols: list[str]) -> bool:
        """False iff some pushed predicate is provably false on this
        row group's [min, max] — conservative: missing stats or
        unmapped columns keep the group."""
        if not self.pushed:
            return True
        md = pf.metadata.row_group(rg)
        file_cols = {md.column(i).path_in_schema: i for i in range(md.num_columns)}
        for name, op, val in self.pushed:
            file_col = (
                name
                if name in file_cols
                else (name[: -len("_us")] if name.endswith("_us") else None)
            )
            if file_col is None or file_col not in file_cols:
                continue
            bounds = self._stat_bounds(
                md.column(file_cols[file_col]).statistics, name, file_col
            )
            if bounds is None:
                continue
            lo, hi = bounds
            try:
                if (
                    (op == "=" and (val < lo or val > hi))
                    or (op == ">" and hi <= val)
                    or (op == ">=" and hi < val)
                    or (op == "<" and lo >= val)
                    or (op == "<=" and lo > val)
                ):
                    return False
            except TypeError:
                continue  # incomparable literal/stat types: keep group
        return True

    def partitions(self) -> list[InputPartition]:
        import pyarrow.parquet as pq

        out_cols = self.columns or []
        parts = []
        for fi, f in enumerate(self.files):
            pf = pq.ParquetFile(f)
            for rg in range(pf.metadata.num_row_groups):
                if self._rg_survives(pf, rg, out_cols):
                    parts.append(InputPartition((fi, rg)))
        # An all-pruned scan still needs >=1 (empty) partition.
        return parts or [InputPartition((0, -1))]

    def read(self, partition: InputPartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        fi, rg = partition.value
        if rg < 0:  # placeholder partition of an all-pruned scan
            return
        pf = pq.ParquetFile(self.files[fi])
        cols = self.columns or pf.schema_arrow.names
        table = pf.read_row_group(rg, columns=cols)
        arrays, names = [], []
        for name in cols:
            arr = table.column(name).combine_chunks()
            typ = arr.type
            if pa.types.is_timestamp(typ):
                scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[typ.unit]
                as_int = arr.cast(pa.int64())
                if scale is None:  # nanos -> integer floor-div to micros
                    as_int = pc.divide(as_int, 1000)
                elif scale != 1:
                    as_int = pc.multiply(as_int, scale)
                arrays.append(as_int)
                names.append(f"{name}_us")
            elif name == "ts" and pa.types.is_int64(typ):
                # driver's nanos-as-bigint encoding (io.py contract)
                arrays.append(pc.divide(arr, 1000))
                names.append("ts_us")
            elif pa.types.is_int32(typ):
                arrays.append(arr.cast(pa.int64()))
                names.append(name)
            elif pa.types.is_floating(typ) and not pa.types.is_float64(typ):
                arrays.append(arr.cast(pa.float64()))
                names.append(name)
            else:
                arrays.append(arr)
                names.append(name)
        yield from pa.table(arrays, names=names).to_batches()


def register(spark) -> None:
    """Idempotent per-session registration of the custom format."""
    spark.dataSource.register(ArrowParquetDataSource)
    try:
        # The reader implements pushFilters; Spark refuses to plan it
        # unless the pushdown conf is on. Set it at registration so a
        # vanilla (driver-provided) session works.
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass


class ArrowParquetStreamReader(DataSourceStreamReader):
    """Streaming half of the connector contract (Spark 4
    DataSourceStreamReader): replays the parquet table as a bounded
    stream. Offsets are ROW positions ({"rows": n} — JSON-dict
    offsets, exactly-once via the checkpoint like any source);
    latestOffset() always reports the durable total (offsets are
    opaque to Spark and reader instances are not shared across
    planning calls, so any call-counting scheme would regress after a
    checkpoint restart and record the regression — see the
    restart test in tests/test_sources.py), and partitions(start, end)
    splits the planned range into `n_batches` chunk-sized input
    partitions for executor parallelism (production would split on
    row-group boundaries).
    """

    def __init__(self, files: list[str], columns: list[str] | None, n_batches: int):
        self.files = files
        self.columns = columns
        import pyarrow.parquet as pq

        self.total = sum(pq.ParquetFile(f).metadata.num_rows for f in self.files)
        self.chunk = max(1, -(-self.total // n_batches))

    def initialOffset(self) -> dict:
        return {"rows": 0}

    def _observe(self, off: dict) -> None:
        """Restart recovery (ADVICE r5): `_cur` is in-memory and starts
        at 0 in a fresh process, but after a checkpoint restart Spark
        hands us the committed offsets through partitions()/commit() —
        fold every offset we see into `_cur` so latestOffset() never
        plans an end behind the committed start."""
        self._cur = max(getattr(self, "_cur", 0), int(off.get("rows", 0)))

    def latestOffset(self) -> dict:
        # Restart safety (ADVICE r5 follow-through, hardened): offsets
        # are OPAQUE to Spark — it compares them only for equality — so
        # any call-counting offset scheme regresses after a restart
        # (fresh process, cursor reset) and the regressed offset would
        # be RECORDED in the checkpoint, replaying data on the next
        # restart. Reader instances are not even shared between
        # planning calls, so in-process state cannot fix this. The only
        # safe signal for an immutable file set is the durable total:
        # always report everything available, exactly like Spark's own
        # file sources. Micro-batch CHUNKING therefore moves to
        # partitions(), which splits the planned range into
        # `n_batches` parallel input partitions.
        return {"rows": self.total}

    def partitions(self, start: dict, end: dict):
        self._observe(start)
        self._observe(end)
        lo, hi = int(start["rows"]), int(end["rows"])
        if hi <= lo:
            return [InputPartition((lo, lo))]
        return [
            InputPartition((s, min(s + self.chunk, hi)))
            for s in range(lo, hi, self.chunk)
        ]

    def commit(self, end: dict) -> None:
        # Files are immutable — nothing to release — but record the
        # committed offset for monotonic restart planning.
        self._observe(end)

    def read(self, partition: InputPartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        lo, hi = partition.value
        if hi <= lo:
            return
        tables = []
        seen = 0
        for f in self.files:
            pf = pq.ParquetFile(f)
            n = pf.metadata.num_rows
            if seen + n <= lo or seen >= hi:
                seen += n
                continue
            cols = self.columns or pf.schema_arrow.names
            t = pf.read(columns=cols)
            t = t.slice(max(0, lo - seen), min(hi, seen + n) - max(lo, seen))
            tables.append(t)
            seen += n
        if not tables:
            return
        table = pa.concat_tables(tables)
        arrays, names = [], []
        for name in table.schema.names:
            arr = table.column(name).combine_chunks()
            typ = arr.type
            if pa.types.is_timestamp(typ):
                scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[typ.unit]
                as_int = arr.cast(pa.int64())
                if scale is None:
                    as_int = pc.divide(as_int, 1000)
                elif scale != 1:
                    as_int = pc.multiply(as_int, scale)
                arrays.append(as_int)
                names.append(f"{name}_us")
            elif name == "ts" and pa.types.is_int64(typ):
                arrays.append(pc.divide(arr, 1000))
                names.append("ts_us")
            else:
                arrays.append(arr)
                names.append(name)
        yield from pa.table(arrays, names=names).to_batches()


def _patched_stream_reader(self, schema):
    return ArrowParquetStreamReader(
        self._files(), self._columns(), int(self.options.get("n_batches", "4"))
    )


ArrowParquetDataSource.streamReader = _patched_stream_reader


@dataclass
class _PartFileCommit(WriterCommitMessage):
    """Per-task commit message: the staged file this task produced."""

    staged: str
    rows: int


class ArrowParquetWriter(DataSourceArrowWriter):
    """Write half of the connector contract: a two-phase-commit batch
    writer. Each task streams its Arrow record batches into ONE
    staged parquet file (task-uuid name — no coordination needed) and
    reports it in its commit message; the driver's commit() publishes
    all staged files atomically-enough for a filesystem (rename into
    the final dir, then `_SUCCESS`), and abort() removes the staging
    dir so failed jobs leave no partial output — the same
    task-commit/job-commit split as Spark's own FileOutputCommitter.
    """

    def __init__(self, path: str, overwrite: bool, schema=None):
        self.path = path
        self.overwrite = overwrite
        self.staging = os.path.join(path, "_staging")
        self.schema = schema  # Spark StructType, for empty-job commits

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = list(iterator)
        os.makedirs(self.staging, exist_ok=True)
        staged = os.path.join(self.staging, f"part-{uuid.uuid4().hex}.parquet")
        table = (
            pa.Table.from_batches(batches)
            if batches
            else None
        )
        if table is None or table.num_rows == 0:
            return _PartFileCommit(staged="", rows=0)
        pq.write_table(table, staged)
        return _PartFileCommit(staged=staged, rows=table.num_rows)

    def commit(self, messages) -> None:
        import shutil

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".parquet"):
                    os.remove(os.path.join(self.path, f))
        published = 0
        for m in messages:
            if m and m.staged:
                os.rename(
                    m.staged,
                    os.path.join(self.path, os.path.basename(m.staged)),
                )
                published += 1
        if published == 0 and self.schema is not None and not any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        ):
            # Zero rows in the whole job and no pre-existing data:
            # publish ONE empty schema-bearing part file, exactly as
            # Spark's FileOutputCommitter does — a later read of the
            # directory must infer the schema, not fail.
            import uuid

            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import to_arrow_schema

            pq.write_table(
                to_arrow_schema(self.schema).empty_table(),
                os.path.join(
                    self.path, f"part-{uuid.uuid4().hex}.parquet"
                ),
            )
        shutil.rmtree(self.staging, ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write("")

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


def _patched_writer(self, schema, overwrite: bool):
    path = self.options["path"]
    os.makedirs(path, exist_ok=True)
    return ArrowParquetWriter(path, overwrite, schema=schema)


ArrowParquetDataSource.writer = _patched_writer
