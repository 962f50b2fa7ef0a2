"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched Pandas functions over `mapInPandas`.

The Spark-side plumbing (schema, partitioning, UDF signature, batch
shape) is real and tested; the actual codecs (PIL/ffmpeg et al.) are
NOT in this container, so decoding is stubbed: `decode_image` raises
NotImplementedError unless PIL is importable, and the tested path uses
`fake_decode` — a deterministic byte-pattern "decoder" with the same
interface, so the distributed execution shape is exercised end-to-end.

Scale notes: blobs stay columnar in parquet; mapInPandas streams
Arrow record batches so one task never holds more than
`spark.sql.execution.arrow.maxRecordsPerBatch` blobs; feature
extraction is a narrow map (no shuffle)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = (
    "doc_id BIGINT, media_type STRING, width INT, height INT, blob BINARY"
)

FEATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes BIGINT, "
    "mean_byte DOUBLE, max_byte INT, byte_hist STRING"
)

try:  # the real decoder path, gated on the codec library
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover - PIL absent in this container
    _HAS_PIL = False


def attach_blobs(documents: DataFrame) -> DataFrame:
    """Derive a deterministic synthetic blob per document (repeated
    md5 bytes sized by n_chars) + typed metadata — the test-time
    stand-in for real image bytes."""
    return documents.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        (F.col("n_chars") % 64 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 48 + 1).cast("int").alias("height"),
        F.repeat(F.unhex(F.md5("text")), F.expr("CAST(n_chars div 16 AS INT) + 1"))
        .cast("binary")
        .alias("blob"),
    )


def decode_image(blob: bytes):  # pragma: no cover - requires PIL
    """Real decode path; unavailable in this container by design."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decoding requires PIL, which is not installed; "
            "use fake_decode / extract_features for the plumbing path"
        )
    import io

    return PIL.Image.open(io.BytesIO(blob))


def fake_decode(blob: bytes) -> bytes:
    """Deterministic stand-in decoder: identity over the raw bytes."""
    return blob


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary columns via
    mapInPandas: byte statistics + an 4-bin histogram fingerprint."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, mt, blob in zip(pdf["doc_id"], pdf["media_type"], pdf["blob"]):
                raw = fake_decode(bytes(blob))
                hist = [0, 0, 0, 0]
                total = 0
                mx = 0
                for b in raw:
                    hist[b >> 6] += 1
                    total += b
                    mx = max(mx, b)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": mt,
                        "n_bytes": len(raw),
                        "mean_byte": total / len(raw) if raw else 0.0,
                        "max_byte": mx,
                        "byte_hist": ",".join(str(h) for h in hist),
                    }
                )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(blobs: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """'Frame sampling' over the opaque blob: slice every Nth 16-byte
    frame (the video-path plumbing shape: explode one blob row into
    many frame rows, each re-encoded as binary)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_no": [], "frame": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                raw = bytes(blob)
                for i, off in enumerate(range(0, len(raw), every_n_bytes)):
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame"].append(raw[off : off + every_n_bytes])
            yield pd.DataFrame(out)

    return blobs.mapInPandas(batches, schema="doc_id BIGINT, frame_no INT, frame BINARY")
