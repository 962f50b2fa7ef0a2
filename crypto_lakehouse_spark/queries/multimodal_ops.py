"""Multimodal plumbing queries. `multimodal_features` carries a full
oracle: the synthetic blob is md5-derived, and DuckDB can reproduce
the byte statistics from the hex digits — so even the Pandas-UDF path
is hash-checked, not just rows-only."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_lakehouse_spark.io import load_table
from crypto_lakehouse_spark.operators.multimodal import attach_blobs, extract_features
from crypto_lakehouse_spark.queries.registry import query


@query(
    "multimodal_features",
    oracle="""
WITH hexes AS (
    SELECT doc_id,
           n_chars,
           md5(text) AS h,
           CAST(n_chars // 16 AS INTEGER) + 1 AS reps
    FROM documents
),
bytes_per_doc AS (
    SELECT doc_id, reps,
           list_transform(range(0, 16),
               i -> CAST(('0x' || substr(h, i * 2 + 1, 2)) AS INTEGER))
               AS bs
    FROM hexes
)
SELECT doc_id,
       'image/fake' AS media_type,
       CAST(16 * reps AS BIGINT) AS n_bytes,
       CAST(list_sum(bs) * reps AS DOUBLE) / (16 * reps) AS mean_byte,
       CAST(list_max(bs) AS INTEGER) AS max_byte,
       CAST(len(list_filter(bs, b -> b // 64 = 0)) * reps AS STRING) || ','
         || CAST(len(list_filter(bs, b -> b // 64 = 1)) * reps AS STRING) || ','
         || CAST(len(list_filter(bs, b -> b // 64 = 2)) * reps AS STRING) || ','
         || CAST(len(list_filter(bs, b -> b // 64 = 3)) * reps AS STRING)
           AS byte_hist
FROM bytes_per_doc
ORDER BY doc_id
""",
    tags=("multimodal", "pandas-udf"),
    bench=False,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction through the Arrow/mapInPandas
    path (operators/multimodal.py) — byte stats over deterministic
    synthetic blobs, oracle-reproduced from md5 hex in DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_blobs(docs)).orderBy("doc_id")


@query(
    "multimodal_frame_sample",
    oracle="""
WITH hexes AS (
    SELECT doc_id, md5(text) AS h,
           CAST(n_chars // 16 AS INTEGER) + 1 AS reps
    FROM documents
)
SELECT doc_id,
       CAST(i AS INTEGER) AS frame_no,
       16 AS frame_bytes,
       h AS frame_hex
FROM hexes, range(0, 256) t(i)
WHERE i < reps
ORDER BY doc_id, frame_no
""",
    tags=("multimodal", "pandas-udf"),
    bench=False,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one blob row -> many frame rows via
    mapInPandas (video path shape). Full VALUE oracle: the blob is
    unhex(md5) repeated, frames are 16-byte aligned, so every frame's
    exact content is the md5 byte string — compared via hex."""
    from crypto_lakehouse_spark.operators.multimodal import frame_sample

    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(attach_blobs(docs)).select(
        "doc_id",
        "frame_no",
        F.length("frame").cast("int").alias("frame_bytes"),
        F.lower(F.hex("frame")).alias("frame_hex"),
    ).orderBy("doc_id", "frame_no")


@query(
    "multimodal_decode_resize",
    oracle="""
WITH hexes AS (
    SELECT doc_id, n_chars, md5(text) AS h,
           CAST(n_chars % 64 + 1 AS INTEGER) AS w,
           CAST(n_chars % 48 + 1 AS INTEGER) AS hp
    FROM documents
),
pix AS (
    SELECT doc_id, w, hp,
           list_transform(range(0, 16),
               i -> CAST(('0x' || substr(h, i * 2 + 1, 2)) AS INTEGER)) AS bs
    FROM hexes
),
resized AS (
    SELECT doc_id, w, hp,
           list_transform(range(0, 64),
               i -> bs[1 + ((((i // 8) * hp) // 8) * w
                           + (((i % 8) * w) // 8)) % 16]) AS rs
    FROM pix
)
SELECT doc_id,
       w AS width,
       hp AS height,
       CAST(list_sum(rs) AS DOUBLE) / 64 AS resized_mean,
       CAST(rs[1] AS INTEGER) AS px00,
       CAST(rs[64] AS INTEGER) AS px77
FROM resized
ORDER BY doc_id
""",
    tags=("multimodal", "pandas-udf", "decode"),
    bench=False,
)
def multimodal_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode path end-to-end: pure-numpy `decode_blob` to a
    (height, width) uint8 array, nearest-neighbor `resize_nearest` to
    8x8, integer-exact summary pixels. Every output pixel is
    md5_byte[(src_y*w + src_x) mod 16], which the DuckDB oracle
    recomputes from the hex digits — the decode is value-checked, not
    plumbing-only."""
    from crypto_lakehouse_spark.operators.multimodal import decode_resize_features

    docs = load_table(spark, sf_dir, "documents")
    return decode_resize_features(attach_blobs(docs)).orderBy("doc_id")


@query(
    "multimodal_ahash_near_dup",
    oracle="""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
b AS (
    SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 2)) AS INT) % 64 AS bk,
           CAST(COUNT(*) AS INT) AS c
    FROM toks GROUP BY doc_id, CAST(('0x' || substr(md5(tok), 1, 2)) AS INT) % 64
),
cell AS (
    SELECT d.doc_id, t.i, COALESCE(b.c, 0) AS v
    FROM (SELECT DISTINCT doc_id FROM b) d
    CROSS JOIN range(0, 64) t(i)
    LEFT JOIN b ON b.doc_id = d.doc_id AND b.bk = t.i
),
px AS (SELECT doc_id, list(LEAST(v, 255) ORDER BY i) AS p FROM cell GROUP BY doc_id),
hashed AS (SELECT doc_id, p, list_sum(p) AS s FROM px),
bits AS (
    SELECT doc_id,
           list_transform(range(0, 64),
                          i -> CASE WHEN p[i + 1] * 64 >= s THEN 1 ELSE 0 END) AS bt
    FROM hashed
),
pairs AS (
    SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
           len(list_filter(range(0, 64), i -> a.bt[i + 1] <> b2.bt[i + 1])) AS ham
    FROM bits a JOIN bits b2 ON a.doc_id < b2.doc_id
)
SELECT CAST(ham AS BIGINT) AS hamming,
       COUNT(*) AS n_pairs,
       CAST(SUM(doc_a + doc_b) AS BIGINT) AS pair_id_checksum,
       COUNT(DISTINCT doc_a) AS n_left_docs
FROM pairs WHERE ham <= 3
GROUP BY ham
ORDER BY hamming
""",
    tags=("multimodal", "dedup", "ahash", "perceptual-hash"),
)
def multimodal_ahash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup: encode each doc as an 8x8
    histogram thumbnail BLOB (operators/multimodal.py
    attach_token_histogram_blobs — a real pipeline carries decoded
    image bytes through the identical path), decode + average-hash it
    into four 16-bit bands (ahash_bands), then find all pairs within
    Hamming distance 3 via four band equi-joins (pigeonhole-complete
    for <=3, the SimHash-bucket guarantee) and a bit_count(xor)
    verify. The oracle recomputes every pixel, bit, and distance
    relationally via the all-pairs definition — the banded plan must
    produce EXACTLY the exhaustive answer. At 100 TB the band join is
    the only pair generator (no all-pairs product). Hot band values
    are the known LSH failure mode: on THIS corpus (pathologically
    self-similar) the four joins emit ~4M candidates for ~277k true
    pairs at sf0.1 — an irreducible volume, since the exhaustive
    answer itself is that large; a corpus with normal near-dup rates
    collapses the buckets. Production knobs when buckets do run hot:
    wider bands (lower collision rate, same <=3 guarantee needs more
    bands) or a bucket-size cap (the df-cap pattern from the shingle
    joins — explicitly sacrificing completeness for capped buckets,
    which this oracle-exact query does not do). Output is the per-distance
    pair census (count + id checksum + distinct-left-doc count) —
    the pair SET is fully determined up to checksum collisions
    while the result stays linear in docs, not quadratic in
    near-dup pairs."""
    from crypto_lakehouse_spark.operators.multimodal import (
        ahash_bands,
        attach_token_histogram_blobs,
    )

    docs = load_table(spark, sf_dir, "documents")
    sig = ahash_bands(attach_token_histogram_blobs(docs))
    sig.createOrReplaceTempView("ahash_sig")
    return spark.sql(
        """
WITH ham AS (
    -- hamming computed inline per band branch (both rows' bands are
    -- on hand after the equi-join) and filtered BEFORE the distinct,
    -- so only true near-dup pairs are ever materialized — no
    -- candidate relation, no verify re-join.
    SELECT a.doc_id AS da, b.doc_id AS db,
           bit_count(a.b0 ^ b.b0) + bit_count(a.b1 ^ b.b1)
         + bit_count(a.b2 ^ b.b2) + bit_count(a.b3 ^ b.b3) AS hamming
    FROM ahash_sig a JOIN ahash_sig b
      ON a.b0 = b.b0 AND a.doc_id < b.doc_id
    WHERE bit_count(a.b0 ^ b.b0) + bit_count(a.b1 ^ b.b1)
         + bit_count(a.b2 ^ b.b2) + bit_count(a.b3 ^ b.b3) <= 3
    UNION
    SELECT a.doc_id AS da, b.doc_id AS db,
           bit_count(a.b0 ^ b.b0) + bit_count(a.b1 ^ b.b1)
         + bit_count(a.b2 ^ b.b2) + bit_count(a.b3 ^ b.b3) AS hamming
    FROM ahash_sig a JOIN ahash_sig b
      ON a.b1 = b.b1 AND a.doc_id < b.doc_id
    WHERE bit_count(a.b0 ^ b.b0) + bit_count(a.b1 ^ b.b1)
         + bit_count(a.b2 ^ b.b2) + bit_count(a.b3 ^ b.b3) <= 3
    UNION
    SELECT a.doc_id AS da, b.doc_id AS db,
           bit_count(a.b0 ^ b.b0) + bit_count(a.b1 ^ b.b1)
         + bit_count(a.b2 ^ b.b2) + bit_count(a.b3 ^ b.b3) AS hamming
    FROM ahash_sig a JOIN ahash_sig b
      ON a.b2 = b.b2 AND a.doc_id < b.doc_id
    WHERE bit_count(a.b0 ^ b.b0) + bit_count(a.b1 ^ b.b1)
         + bit_count(a.b2 ^ b.b2) + bit_count(a.b3 ^ b.b3) <= 3
    UNION
    SELECT a.doc_id AS da, b.doc_id AS db,
           bit_count(a.b0 ^ b.b0) + bit_count(a.b1 ^ b.b1)
         + bit_count(a.b2 ^ b.b2) + bit_count(a.b3 ^ b.b3) AS hamming
    FROM ahash_sig a JOIN ahash_sig b
      ON a.b3 = b.b3 AND a.doc_id < b.doc_id
    WHERE bit_count(a.b0 ^ b.b0) + bit_count(a.b1 ^ b.b1)
         + bit_count(a.b2 ^ b.b2) + bit_count(a.b3 ^ b.b3) <= 3
)
SELECT CAST(hamming AS BIGINT) AS hamming,
       COUNT(*) AS n_pairs,
       CAST(SUM(da + db) AS BIGINT) AS pair_id_checksum,
       COUNT(DISTINCT da) AS n_left_docs
FROM ham WHERE hamming <= 3
GROUP BY hamming
ORDER BY hamming
"""
    )
