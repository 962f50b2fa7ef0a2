"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched Pandas functions over `mapInPandas`.

The Spark-side plumbing (schema, partitioning, UDF signature, batch
shape) is real and tested. Decoding has two tiers:

- `decode_blob` — a REAL pure-numpy decoder for the engine's synthetic
  raw-byte format (cyclic byte stream + width/height metadata →
  uint8 pixel array), with `resize_nearest` as the numpy resize op.
  Both are exercised end-to-end and value-checked against a DuckDB
  oracle (`multimodal_decode_resize`): the blob is md5-derived, so
  every pixel is reproducible as md5_byte[(y*w + x) mod 16].
- `decode_image` — the codec-library path for standard formats
  (PNG/JPEG), gated on PIL which is NOT in this container; it raises
  NotImplementedError with instructions. Swapping it in changes one
  function, not the plumbing.

Scale notes: blobs stay columnar in parquet; mapInPandas streams
Arrow record batches so one task never holds more than
`spark.sql.execution.arrow.maxRecordsPerBatch` blobs; feature
extraction is a narrow map (no shuffle)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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
    stand-in for real image bytes. A NULL-text document has no media
    to derive — excluded here and in every consuming oracle
    (WHERE text IS NOT NULL), instead of md5(NULL) producing a NULL
    blob that crashes the byte kernels."""
    return documents.filter(F.col("text").isNotNull()).select(
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


def decode_blob(blob: bytes, width: int, height: int) -> np.ndarray:
    """Decode the synthetic raw-byte format into a (height, width)
    uint8 pixel array: the byte stream is read cyclically until the
    frame is filled (np.resize tiles). Pure numpy — no codec library
    — and fully deterministic, so the DuckDB oracle can recompute any
    pixel from the md5 hex."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros((height, width), dtype=np.uint8)
    return np.resize(arr, (height, width))


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (floor index mapping: src = out * in
    // out), the standard integer-exact downsample — reproducible in
    SQL, unlike any interpolating resampler."""
    h, w = img.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys[:, None], xs[None, :]]


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary columns via
    mapInPandas: byte statistics + an 4-bin histogram fingerprint."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, mt, blob in zip(pdf["doc_id"], pdf["media_type"], pdf["blob"]):
                raw = np.frombuffer(fake_decode(bytes(blob)), dtype=np.uint8)
                # Vectorized byte stats: bincount over the top-2 bits
                # for the 4-bin histogram, int64 sum for the mean.
                hist = np.bincount(raw >> 6, minlength=4)
                n = int(raw.size)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": mt,
                        "n_bytes": n,
                        "mean_byte": float(raw.sum(dtype=np.int64)) / n if n else 0.0,
                        "max_byte": int(raw.max()) if n else 0,
                        "byte_hist": ",".join(str(int(h)) for h in hist),
                    }
                )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(batches, schema=FEATURE_SCHEMA)


DECODE_RESIZE_SCHEMA = (
    "doc_id BIGINT, width INT, height INT, "
    "resized_mean DOUBLE, px00 INT, px77 INT"
)


def decode_resize_features(blobs: DataFrame, out: int = 8) -> DataFrame:
    """The REAL decode path, end-to-end: decode each blob into its
    (height, width) pixel array (`decode_blob`), nearest-neighbor
    resize to out x out (`resize_nearest`), and emit integer-exact
    summary pixels. The mean divides by out*out (a power of two), so
    the double is bit-identical to the oracle's."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, w, h, blob in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["blob"]
            ):
                img = decode_blob(bytes(blob), int(w), int(h))
                small = resize_nearest(img, out, out)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": int(w),
                        "height": int(h),
                        "resized_mean": float(small.sum(dtype=np.int64))
                        / (out * out),
                        "px00": int(small[0, 0]),
                        "px77": int(small[out - 1, out - 1]),
                    }
                )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(batches, schema=DECODE_RESIZE_SCHEMA)


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


# --- perceptual-hash (aHash) near-duplicate detection ----------------------
# The image-dedup tier of the pipeline: render each document as a
# deterministic 8x8 "thumbnail" (a 64-bin md5-token-histogram blob —
# stands in for a real decoded+resized image; with PIL installed,
# decode_image + resize_nearest produce the same 8x8 input from real
# bytes), average-hash it (bit i = pixel_i * 64 >= sum(pixels) — the
# classic aHash threshold in overflow-free integer form), and emit the
# 64-bit signature as four 16-bit bands. Banding makes candidate
# generation an equi-join: any pair within Hamming distance 3 differs
# in at most 3 bands (pigeonhole), so joining on band equality finds
# EVERY such pair — the same guarantee structure as the SimHash
# prefix buckets in queries/dedup_ops.py.

AHASH_SCHEMA = "doc_id BIGINT, b0 INT, b1 INT, b2 INT, b3 INT"


def attach_token_histogram_blobs(documents: DataFrame) -> DataFrame:
    """Encode each doc as a 64-byte binary blob: byte k = count of
    tokens whose md5 leading byte mod 64 == k (clipped at 255). A
    real pipeline would carry decoded image bytes here; the histogram
    blob keeps every downstream step (binary column, decode, hash)
    identical while remaining oracle-reproducible."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Token -> bucket memo, shared across the worker's batches:
        # natural-language vocabularies are far smaller than token
        # counts, so hashing each OCCURRENCE is pure waste.
        bucket_of: dict[str, int] = {}

        def _bucket(tok: str) -> int:
            b = bucket_of.get(tok)
            if b is None:
                b = int(hashlib.md5(tok.encode()).hexdigest()[:2], 16) % 64
                bucket_of[tok] = b
            return b

        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                counts = np.zeros(64, dtype=np.int64)
                for tok in (text or "").split(" "):
                    counts[_bucket(tok)] += 1
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": "image/fake",
                        "width": 8,
                        "height": 8,
                        "blob": bytes(np.minimum(counts, 255).astype(np.uint8)),
                    }
                )
            yield pd.DataFrame(rows)

    return documents.select("doc_id", "text").mapInPandas(
        batches, schema=BLOB_SCHEMA
    )


def ahash_bands(blobs: DataFrame) -> DataFrame:
    """Decode each 8x8 blob and compute its aHash as four 16-bit
    bands (b0..b3, bit j of band k = aHash bit 16k+j)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, w, h, blob in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["blob"]
            ):
                img = decode_blob(bytes(blob), int(w), int(h))
                px = img.astype(np.int64).ravel()
                total = int(px.sum())
                bits = (px * 64 >= total).astype(np.int64)
                bands = [
                    int((bits[16 * k : 16 * k + 16] << np.arange(16)).sum())
                    for k in range(4)
                ]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "b0": bands[0],
                        "b1": bands[1],
                        "b2": bands[2],
                        "b3": bands[3],
                    }
                )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(batches, schema=AHASH_SCHEMA)
