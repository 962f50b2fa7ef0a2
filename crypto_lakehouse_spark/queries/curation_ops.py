"""Corpus-curation operators — round-8 widening of the LLM-data
pipeline surface (reference scope: processing/spark_jobs quality tier,
BASELINE.json north star):

- paragraph-level dedup with document reassembly (the CCNet shape:
  drop duplicated paragraphs corpus-wide, keep each doc's surviving
  paragraphs in order). Distinct from `substring_span_dedup` (span
  census) and `doc_exact_dedup` (whole-doc): the unit is a fixed
  16-token paragraph and the OUTPUT is the rebuilt document.
- hashed-linear quality classifier (the fastText shape: token ->
  hash bucket -> learned weight -> mean -> threshold). Weights here
  are a deterministic function of the bucket id, so both engines
  compute them without a side table; a real deployment swaps in a
  broadcast weight array with the identical plan.
- MinHash estimator error: measured |estimate - exact Jaccard| over
  the LSH candidate pairs — the "measure, don't guess" companion to
  `minhash_lsh_dedup` (same spirit as `pq_recall_at_10` /
  `ann_recall_at_5` for the ANN tier): the number that tells you
  whether K=8 hashes are enough before you commit a 100 TB dedup run
  to them.

Scale shapes (100 TB framing):
- paragraph dedup: one narrow explode (16-token chunks), ONE shuffle
  on md5(paragraph) for the keep-first window, one groupBy(doc_id)
  for reassembly. Same class as exact dedup plus a re-agg; no
  self-joins, no row blowup beyond tokens/16 per doc.
- classifier: ZERO shuffles — the whole score is a per-row
  higher-order `aggregate` over the token array inside whole-stage
  codegen; at 100 TB this is a pure map-side scan.
- estimator error: bounded by the SAME candidate set the LSH dedup
  already materializes (band equi-join, never all-pairs); the extra
  cost is one 8-column signature join on the candidates.

All hashing md5-based (portable Spark<->DuckDB, see dedup_ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from crypto_lakehouse_spark.io import register_views
from crypto_lakehouse_spark.queries.dedup_ops import (
    _BANDKEY_DUCK,
    _BANDKEY_SPARK,
    _DUP_UNION_SPARK,
    _K,
    _MINHASH_DUCK,
    _MINHASH_SPARK,
    _SH_DUCK,
    _SH_PERSISTED,
    cached_shingles,
)
from crypto_lakehouse_spark.queries.registry import query


def _pair(name: str, spark_sql: str, duck_sql: str, tags: tuple[str, ...]) -> None:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, ["documents"])
        return spark.sql(spark_sql)

    fn.__name__ = name
    fn.__doc__ = (
        "Paired-dialect SQL (semantics in the module docstring). "
        f"Spark SQL:\n{spark_sql}"
    )
    query(name, oracle=duck_sql, tags=tags)(fn)


# --- paragraph-level dedup with reassembly --------------------------------
# Paragraph = 16 consecutive whitespace tokens (last one may be short).
# Keep rule: global first occurrence by (doc_id, para_idx).
#
# Plan shape: NOT a row_number window over md5(para) — a window
# partitioned on the content hash has no map-side combiner and no AQE
# skew mitigation, so one boilerplate paragraph repeated across 10% of
# a crawl lands its entire partition on one task. Instead:
# MIN(struct(doc_id, para_idx)) GROUP BY hash (partial aggregation
# absorbs the hot key on the map side) joined back on the hash (AQE
# skew-join can split it). keep = (doc_id, para_idx) == global min.
# Reassembly: order-stabilized concat of surviving paragraphs (hashed
# in the output to keep rows narrow). Input includes the synthetic
# +1_000_000 full duplicates (same derivation as doc_exact_dedup) so
# the operator provably drops duplicate documents paragraph-by-
# paragraph.
_P = 16

_PARA_TAIL = """
firsts AS (
    SELECT md5(para) AS h,
           MIN({ordkey}) AS first_key
    FROM paras
    GROUP BY md5(para)
),
keep AS (
    SELECT p.doc_id, p.para_idx, p.para,
           CASE WHEN {ordkey_p} = f.first_key THEN 1 ELSE 0 END AS is_first
    FROM paras p
    JOIN firsts f ON f.h = md5(p.para)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_paras,
       CAST(COUNT(CASE WHEN is_first = 1 THEN 1 END) AS BIGINT) AS n_kept,
       CAST(COUNT(CASE WHEN is_first = 1 THEN 1 END) AS DOUBLE) / COUNT(*)
           AS kept_frac,
       md5({reassembled}) AS kept_text_hash
FROM keep
GROUP BY doc_id
ORDER BY doc_id
"""

# Portable total order on (doc_id, para_idx): doc_id < 1e9 and
# para_idx < 1e6 in every fixture (runtime-asserted margins are
# generous — 16-token paragraphs of a 2^63-safe composite), so a
# single BIGINT composite key gives MIN() the lexicographic
# (doc_id, para_idx) semantics in both engines.
_ORDKEY = "({a}doc_id * 1000000 + {a}para_idx)"

_REASSEMBLE_SPARK = (
    "array_join(transform(array_sort("
    "collect_list(struct(para_idx, para)) FILTER (WHERE is_first = 1)"
    "), s -> s.para), ' ')"
)
_REASSEMBLE_DUCK = (
    "COALESCE(string_agg(para, ' ' ORDER BY para_idx) "
    "FILTER (WHERE is_first = 1), '')"
)

_pair(
    "paragraph_dedup_reassemble",
    f"""
WITH corpus AS ({_DUP_UNION_SPARK}),
toks AS (SELECT doc_id, split(text, ' ') AS ws FROM corpus),
paras AS (
    SELECT doc_id, pos AS para_idx, para
    FROM toks
    LATERAL VIEW posexplode(transform(
        sequence(0, CAST(ceil(size(ws) / {_P}.0) AS INT) - 1),
        i -> array_join(slice(ws, i * {_P} + 1, {_P}), ' '))) t AS pos, para
),
"""
    + _PARA_TAIL.format(
        reassembled=_REASSEMBLE_SPARK,
        ordkey=_ORDKEY.format(a=""),
        ordkey_p=_ORDKEY.format(a="p."),
    ),
    f"""
WITH corpus AS ({_DUP_UNION_SPARK}),
toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
paras AS (
    SELECT doc_id, u.para_idx AS para_idx, u.para AS para
    FROM (
        SELECT doc_id, unnest(list_transform(
            range(0, CAST(ceil(len(ws) / {_P}.0) AS INT)),
            i -> {{'para_idx': i,
                   'para': array_to_string(
                       list_slice(ws, i * {_P} + 1, i * {_P} + {_P}), ' ')}}))
            AS u
        FROM toks
    )
),
"""
    + _PARA_TAIL.format(
        reassembled=_REASSEMBLE_DUCK,
        ordkey=_ORDKEY.format(a=""),
        ordkey_p=_ORDKEY.format(a="p."),
    ),
    tags=("dedup", "paragraph", "curation"),
)

# --- hashed-linear quality classifier -------------------------------------
# bucket(t) = first 16 bits of md5(t) mod 1024; weight numerator
# w(b) = (b * 2654435761) % 4096 - 2048  (Knuth multiplicative hash ->
# integer weight in [-2048, 2047]; mean_w = sum / (2048 * n) lands in
# [-1, 1)). Integer sums keep both engines bit-exact; the one double
# division at the end is IEEE-exact. label_keep = sign threshold.
_W_SPARK = (
    "(CAST(conv(substr(md5(t), 1, 4), 16, 10) AS BIGINT) % 1024) "
    "* 2654435761 % 4096 - 2048"
)
_W_DUCK = (
    "(CAST(('0x' || substr(md5(t), 1, 4)) AS BIGINT) % 1024) "
    "* 2654435761 % 4096 - 2048"
)

_pair(
    "hashed_classifier_score",
    f"""
SELECT doc_id, lang, source,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(score_num AS BIGINT) AS score_num,
       CAST(score_num AS DOUBLE) / (2048.0 * n_tok) AS mean_w,
       CASE WHEN score_num >= 0 THEN 1 ELSE 0 END AS label_keep
FROM (
    SELECT doc_id, lang, source, size(ws) AS n_tok,
           aggregate(ws, 0L, (acc, t) -> acc + ({_W_SPARK})) AS score_num
    FROM (SELECT doc_id, lang, source, split(text, ' ') AS ws
          FROM documents)
)
ORDER BY doc_id
""",
    f"""
SELECT doc_id, lang, source,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(score_num AS BIGINT) AS score_num,
       CAST(score_num AS DOUBLE) / (2048.0 * len(ws)) AS mean_w,
       CASE WHEN score_num >= 0 THEN 1 ELSE 0 END AS label_keep
FROM (
    SELECT doc_id, lang, source, ws,
           CAST(list_sum(list_transform(ws, t -> ({_W_DUCK})))
                AS BIGINT) AS score_num
    FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS ws
          FROM documents)
)
ORDER BY doc_id
""",
    tags=("text", "classifier", "curation"),
)

# --- MinHash estimator error over LSH candidates --------------------------
_EST_MATCHES = " + ".join(
    f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(_K)
)

_EST_TAIL = f"""
bands AS (
    -- floor, not CAST(i/4 AS INT): double->int CAST truncates in
    -- Spark but ROUNDS in DuckDB, which silently shifts the band
    -- boundaries (the verified LSH query tolerates that because its
    -- exact-Jaccard >= 0.5 gate absorbs candidate-set differences;
    -- the raw candidate set exposed here does not).
    SELECT doc_id, CAST(floor(i / 4.0) AS INT) AS band,
           {{bandkey}} AS band_key
    FROM minhash
    GROUP BY doc_id, CAST(floor(i / 4.0) AS INT)
),
candidates AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
    FROM candidates c
    JOIN shingles sa ON sa.doc_id = c.doc_a
    JOIN shingles sb ON sb.doc_id = c.doc_b AND sa.s = sb.s
    GROUP BY c.doc_a, c.doc_b
),
est AS (
    SELECT c.doc_a, c.doc_b, {_EST_MATCHES} AS n_match
    FROM candidates c
    JOIN minhash_wide a ON a.doc_id = c.doc_a
    JOIN minhash_wide b ON b.doc_id = c.doc_b
)
SELECT e.doc_a, e.doc_b,
       CAST(e.n_match AS DOUBLE) / {_K} AS jaccard_est,
       CAST(COALESCE(i.inter, 0) AS DOUBLE)
           / (za.n + zb.n - COALESCE(i.inter, 0)) AS jaccard_exact,
       ABS(CAST(e.n_match AS DOUBLE) / {_K}
           - CAST(COALESCE(i.inter, 0) AS DOUBLE)
             / (za.n + zb.n - COALESCE(i.inter, 0))) AS abs_err
FROM est e
LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
JOIN sizes za ON za.doc_id = e.doc_a
JOIN sizes zb ON zb.doc_id = e.doc_b
ORDER BY e.doc_a, e.doc_b
"""


@query(
    "minhash_estimate_error",
    oracle="WITH "
    + _SH_DUCK
    + ","
    + _MINHASH_DUCK
    + ","
    + _EST_TAIL.format(bandkey=_BANDKEY_DUCK),
    tags=("dedup", "minhash", "measure", "curation"),
)
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-candidate-pair |MinHash estimate - exact Jaccard| over the
    LSH candidate set (module docstring has the contract and scale
    notes). Reads the persisted shingle relation."""
    cached_shingles(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _SH_PERSISTED
        + ","
        + _MINHASH_SPARK
        + ","
        + _EST_TAIL.format(bandkey=_BANDKEY_SPARK)
    )
