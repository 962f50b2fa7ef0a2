"""Similarity search over the `embeddings` table (array<float>, 64-d).

Two paths, per the scale contract:
- brute-force cosine top-k: the exact baseline. Cross join queries x
  corpus; at scale the query side is broadcast and the corpus scan is
  embarrassingly parallel (no shuffle until the per-query top-k, which
  is a windowed rank over |Q| x k rows).
- LSH-bucketed ANN (random hyperplanes): the scale path. Each vector
  maps to a signature of sign-bits of md5-derived +/-1 hyperplane
  projections; near neighbors collide in buckets, so candidate
  generation is a bucket equi-join instead of a cross join.

Determinism: dot products are computed as *sequential left folds*
over the array in both engines (Spark `aggregate`, DuckDB
`list_reduce` over the element-product list), on float32 values cast
to double — bit-identical results, no rounding needed. Cosines are
additionally rounded to 9 decimals as belt-and-braces for the final
rank comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from crypto_lakehouse_spark.io import register_views
from crypto_lakehouse_spark.queries.registry import query


def _pair(name: str, spark_sql: str, duck_sql: str, tags: tuple[str, ...]) -> None:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, ["embeddings"])
        return spark.sql(spark_sql)

    fn.__name__ = name
    fn.__doc__ = (
        "Paired-dialect SQL (semantics documented in the module "
        f"docstring). Spark SQL:\n{spark_sql}"
    )
    query(name, oracle=duck_sql, tags=tags)(fn)


# Sequential-fold dot product of two double arrays.
_DOT_SPARK = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
_DOT_DUCK = "list_reduce(list_transform(range(1, 65), i -> {a}[i] * {b}[i]), (acc, v) -> acc + v)"

_D_SPARK = "transform({e}, x -> CAST(x AS DOUBLE))"
_D_DUCK = "list_transform({e}, x -> CAST(x AS DOUBLE))"


def _topk_sql(dot: str, dbl: str) -> str:
    qa = dbl.format(e="q.embedding")
    ca = dbl.format(e="c.embedding")
    dot_qc = dot.format(a="q.vec", b="c.vec")
    dot_qq = dot.format(a="q.vec", b="q.vec")
    dot_cc = dot.format(a="c.vec", b="c.vec")
    return f"""
WITH qs AS (
    SELECT vec_id, {dbl.format(e='embedding')} AS vec
    FROM embeddings q WHERE vec_id < 5
),
corpus AS (
    SELECT vec_id, label, {dbl.format(e='embedding')} AS vec
    FROM embeddings c
),
scored AS (
    SELECT q.vec_id AS query_id,
           c.vec_id AS neighbor_id,
           c.label AS neighbor_label,
           ROUND({dot.format(a='q.vec', b='c.vec')}
                 / (SQRT({dot.format(a='q.vec', b='q.vec')})
                    * SQRT({dot.format(a='c.vec', b='c.vec')})), 9)
               AS cosine
    FROM qs q
    CROSS JOIN corpus c
    WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, neighbor_label, cosine,
       CAST(rn AS BIGINT) AS rank
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rn
    FROM scored
)
WHERE rn <= 5
ORDER BY query_id, rank
"""


_pair(
    "embedding_cosine_topk",
    _topk_sql(_DOT_SPARK, _D_SPARK),
    _topk_sql(_DOT_DUCK, _D_DUCK),
    tags=("similarity", "ann"),
)

# --- label centroids (element-wise mean per label) -------------------------
_pair(
    "embedding_label_centroids",
    """
SELECT label,
       CAST(pos AS BIGINT) AS dim,
       ROUND(SUM(v) / COUNT(*), 6) AS centroid
FROM (
    SELECT label, pos, CAST(v AS DOUBLE) AS v
    FROM embeddings
    LATERAL VIEW posexplode(embedding) t AS pos, v
)
GROUP BY label, pos
ORDER BY label, dim
""",
    """
SELECT label,
       CAST(i - 1 AS BIGINT) AS dim,
       ROUND(SUM(CAST(embedding[i] AS DOUBLE)) / COUNT(*), 6) AS centroid
FROM embeddings, range(1, 65) t(i)
GROUP BY label, i
ORDER BY label, dim
""",
    tags=("similarity", "aggregation"),
)

# --- random-hyperplane LSH buckets -----------------------------------------
# Plane p (0..7), dim d (0..63): weight +1 iff the first hex digit of
# md5(p:d) has its high bit set; signature bit = sign of the projection.
_PLANES = 8


def _lsh_sql(dot_like: str, dbl: str, mkarr: str, agg: str) -> str:
    return f"""
WITH planes AS ({mkarr}),
sigs AS (
    SELECT e.vec_id, p.p,
           CASE WHEN {dot_like} >= 0 THEN '1' ELSE '0' END AS bit
    FROM embeddings e CROSS JOIN planes p
),
buckets AS (
    SELECT vec_id, {agg} AS bucket
    FROM sigs
    GROUP BY vec_id
)
SELECT bucket,
       COUNT(*) AS n_vectors,
       MIN(vec_id) AS min_vec_id,
       MAX(vec_id) AS max_vec_id
FROM buckets
GROUP BY bucket
ORDER BY bucket
"""


_LSH_DOT_SPARK = (
    "aggregate(zip_with(transform(e.embedding, x -> CAST(x AS DOUBLE)), "
    "transform(sequence(0, 63), d -> CASE WHEN substr(md5(CAST(p.p AS STRING) || ':' || CAST(d AS STRING)), 1, 1) "
    "IN ('8','9','a','b','c','d','e','f') THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END), "
    "(x, w) -> x * w), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_LSH_DOT_DUCK = (
    "list_reduce(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * "
    "(CASE WHEN substr(md5(CAST(p.p AS STRING) || ':' || CAST(i - 1 AS STRING)), 1, 1) "
    "IN ('8','9','a','b','c','d','e','f') THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)), "
    "(acc, v) -> acc + v)"
)

_pair(
    "embedding_lsh_buckets",
    _lsh_sql(
        _LSH_DOT_SPARK,
        _D_SPARK,
        "SELECT explode(sequence(0, 7)) AS p",
        "array_join(array_sort(collect_list(lpad(CAST(p AS STRING), 2, '0') || ':' || bit)), '')",
    ),
    _lsh_sql(
        _LSH_DOT_DUCK,
        _D_DUCK,
        "SELECT unnest(range(0, 8)) AS p",
        "string_agg(lpad(CAST(p AS STRING), 2, '0') || ':' || bit, '' "
        "ORDER BY lpad(CAST(p AS STRING), 2, '0') || ':' || bit)",
    ),
    tags=("similarity", "lsh"),
)
