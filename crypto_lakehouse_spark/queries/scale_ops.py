"""Scale-technique operators, each oracle-proven equivalent to its
declarative counterpart:

- `doc_quality_score_pandas`: the Arrow-batched `mapInPandas` version
  of `doc_quality_score`, registered against the IDENTICAL DuckDB
  oracle — demonstrating the engine's vectorized-UDF escape hatch
  (SURVEY §2.8: pandas UDFs are reserved for the extended pipeline
  surface; built-ins stay the default). Score arithmetic follows the
  same IEEE-754 operation order as the SQL expression, so equivalence
  is bit-exact, not approximate.
- `salted_event_counts`: two-phase (salted) aggregation — the standard
  hot-key mitigation when one group key dominates. Phase 1 aggregates
  (key, salt) across 16 salts, phase 2 combines per key; sums are
  exact decimals so re-association cannot change the result. AQE's
  skew handling covers joins; salting covers skewed *aggregations*.
- `range_join_click_purchase`: interval join — clicks within the 5
  minutes preceding a same-user purchase. Equi-join on user_id with
  the range as a join filter: shuffles on user_id only, never a
  time-cross-product. (Spark's range-join optimizations for the
  pure-inequality case need the DBR-only RANGE_JOIN hint; keying by
  user makes the open-source plan efficient.)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import crypto_lakehouse_spark.queries.text_ops  # noqa: F401  (registers oracle we reuse)
from crypto_lakehouse_spark.io import load_table, register_views
from crypto_lakehouse_spark.queries.registry import REGISTRY, query
from crypto_lakehouse_spark.queries.text_ops import _STOP

_QUALITY_SCHEMA = (
    "doc_id BIGINT, lang STRING, n_tokens BIGINT, diversity DOUBLE, "
    "stopword_ratio DOUBLE, quality_score DOUBLE"
)


@query(
    "doc_quality_score_pandas",
    oracle=REGISTRY["doc_quality_score"].oracle,
    tags=("text", "quality", "pandas-udf"),
)
def doc_quality_score_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized quality scoring via mapInPandas, proven
    equal to the SQL version by sharing its oracle. Per-batch pandas
    ops; only the per-token set/stopword membership is Python-looped
    (string ops), the arithmetic is numpy float64 in the SQL
    expression's association order."""
    stop = frozenset(_STOP["en"])

    def score(batches):
        for pdf in batches:
            toks = pdf["text"].str.split(" ")
            n_tok = toks.str.len().to_numpy(dtype=np.float64)
            n_distinct = toks.apply(lambda ts: float(len(set(ts)))).to_numpy(
                dtype=np.float64
            )
            n_stop = toks.apply(
                lambda ts: float(sum(t in stop for t in ts))
            ).to_numpy(dtype=np.float64)
            out = pdf[["doc_id", "lang"]].copy()
            out["n_tokens"] = n_tok.astype(np.int64)
            out["diversity"] = n_distinct / n_tok
            out["stopword_ratio"] = n_stop / n_tok
            out["quality_score"] = (
                np.minimum(n_tok, 200.0) / 200 * 0.3
                + n_distinct / n_tok * 0.4
                + n_stop / n_tok * 0.3
            )
            yield out

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return docs.mapInPandas(score, _QUALITY_SCHEMA).orderBy("doc_id")


_SALTED_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query(
    "salted_event_counts",
    oracle=_SALTED_ORACLE,
    tags=("events", "aggregation", "skew"),
)
def salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe aggregation: salt the group key across 16 shards,
    pre-aggregate, then combine. Exact-decimal partial sums make the
    two-phase result identical to the direct groupBy (the oracle is
    the direct query)."""
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn("salt", (F.col("event_id") % 16).cast("int"))
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("vs"),
        )
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("vs").cast("double").alias("value_sum"),
        )
        .orderBy("event_type")
    )


_RANGE_JOIN = """
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.user_id,
       CAST(p.value AS DOUBLE) AS purchase_value
FROM events p
JOIN events c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 5 MINUTE
 AND c.ts < p.ts
ORDER BY purchase_id, click_id
"""


@query(
    "range_join_click_purchase",
    oracle=_RANGE_JOIN,
    tags=("events", "range-join"),
)
def range_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: clicks in the 5 minutes before a same-user
    purchase. Dialect-common SQL; the user_id equi-key carries the
    shuffle, the time range is a join filter."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_RANGE_JOIN)
