"""Structured Streaming source over a VersionedTable — the Delta
streaming-source analog (`spark.readStream.format("delta")`) for the
engine's manifest-based table format.

Offsets are TABLE VERSIONS ({"v": N} JSON offsets, checkpoint-tracked
like any source), so exactly-once falls out of the commit protocol:
each micro-batch is precisely the set of data files the versions in
(start_v, end_v] ADDED relative to their predecessor — for an
append-only table that is exactly the new rows, the same contract as
Delta's streaming source. A version that REMOVES files (overwrite /
merge / delete / compact) is not representable as an append batch and
raises, matching Delta's default behavior without
ignoreChanges/ignoreDeletes; pass option("ignore_changes", "true") to
stream only the added files of such commits (Delta ignoreChanges
semantics: rewritten rows may re-emit — the consumer dedups).

Driver-side planning reads ONLY manifests (JSON file lists — no data
scan, no Spark job); executors read their assigned parquet files
through pyarrow Arrow batches. Partition-column values live in dir
names, not file bytes, so partitioned tables stream without their
partition columns — keep streamed tables unpartitioned or carry the
column in the data (noted limitation; Delta stores partition values
in the log and backfills, which the manifest does not record per-row).

At 100 TB: a micro-batch's cost is the added files' bytes, never the
table's; version listing is one readdir.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_MANIFEST_DIR = "_manifests"


def _versions(path: str) -> list[int]:
    d = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(n[1:-5])
        for n in os.listdir(d)
        if n.startswith("v") and n.endswith(".json")
    )


def _manifest(path: str, v: int) -> dict:
    with open(os.path.join(path, _MANIFEST_DIR, f"v{v:06d}.json")) as f:
        return json.load(f)


class VersionedTableDataSource(DataSource):
    """format("versioned_table") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def _first_file(self) -> str:
        path = self.options["path"]
        vs = _versions(path)
        if not vs:
            raise FileNotFoundError(f"{path}: no committed version")
        files = _manifest(path, vs[-1])["files"]
        if not files:
            raise FileNotFoundError(f"{path}: current snapshot is empty")
        return os.path.join(path, files[0])

    def schema(self) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        arrow_schema = pq.ParquetFile(self._first_file()).schema_arrow
        out = []
        for name in arrow_schema.names:
            typ = arrow_schema.field(name).type
            if pa.types.is_timestamp(typ) or (
                name == "ts" and pa.types.is_int64(typ)
            ):
                out.append(f"{name}_us BIGINT")
            elif pa.types.is_int64(typ) or pa.types.is_int32(typ):
                out.append(f"{name} BIGINT")
            elif pa.types.is_floating(typ):
                out.append(f"{name} DOUBLE")
            elif pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
                # A binary column cannot be faithfully surfaced as
                # STRING (arbitrary bytes are not UTF-8); fail at
                # planning time with the column named rather than with
                # an opaque Arrow/Spark type mismatch at runtime.
                raise ValueError(
                    f"versioned_table stream source: column {name!r} has "
                    f"unsupported binary type {typ}; drop or re-encode it "
                    "(e.g. base64 string) before streaming this table"
                )
            else:
                # decimal/boolean/date/etc. are DECLARED as STRING here
                # and CAST to string in read() — declaration and data
                # must agree or Spark fails with an Arrow type mismatch
                # deep in the exchange.
                out.append(f"{name} STRING")
        return ", ".join(out)

    def streamReader(self, schema) -> "VersionedTableStreamReader":
        return VersionedTableStreamReader(
            self.options["path"],
            self.options.get("ignore_changes", "false").lower() == "true",
        )


class VersionedTableStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, ignore_changes: bool):
        self.path = path
        self.ignore_changes = ignore_changes

    def initialOffset(self) -> dict:
        return {"v": -1}

    def latestOffset(self) -> dict:
        vs = _versions(self.path)
        return {"v": vs[-1] if vs else -1}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["v"]), int(end["v"])
        added: list[str] = []
        prev_files: set[str] = (
            set(_manifest(self.path, s)["files"]) if s >= 0 else set()
        )
        for v in range(s + 1, e + 1):
            m = _manifest(self.path, v)
            cur = set(m["files"])
            removed = prev_files - cur
            if removed and not self.ignore_changes:
                raise ValueError(
                    f"{self.path}: version {v} ({m['op']}) removed "
                    f"{len(removed)} file(s); the streaming source only "
                    "supports append-only history (Delta semantics) — "
                    "set option('ignore_changes', 'true') to stream the "
                    "added files anyway"
                )
            added.extend(sorted(cur - prev_files))
            prev_files = cur
        return [
            InputPartition(os.path.join(self.path, f)) for f in added
        ] or [InputPartition("")]

    def commit(self, end: dict) -> None:
        pass  # manifests are immutable

    def read(self, partition: InputPartition):
        if not partition.value:
            return
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        table = pq.ParquetFile(partition.value).read()
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
            elif pa.types.is_int64(typ):
                arrays.append(arr)
                names.append(name)
            elif pa.types.is_int32(typ):
                arrays.append(arr.cast(pa.int64()))
                names.append(name)
            elif pa.types.is_floating(typ):
                if not pa.types.is_float64(typ):
                    arr = arr.cast(pa.float64())
                arrays.append(arr)
                names.append(name)
            else:
                # Everything else was declared STRING by schema() —
                # cast decimal/boolean/date/string alike so the batch
                # matches the declaration (no-op for string columns).
                arrays.append(arr.cast(pa.string()))
                names.append(name)
        yield from pa.table(arrays, names=names).to_batches()


def register(spark) -> None:
    """Idempotent per-session registration of the streaming format."""
    spark.dataSource.register(VersionedTableDataSource)
