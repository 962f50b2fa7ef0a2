"""Deterministic sf10 fixture: third-decade ramp evidence (VERDICT r7
item 3). Derived as 10 replicas of the sf1 fixture (run
scripts/gen_sf1.py first), which is itself 10 replicas of the driver's
sf0.1 — so sf10 is 100x the driver's benchmark scale.

Generates every table the three-decade tier reads: documents,
embeddings, lineitem, orders, events (the dimension tables are never
touched at this scale). Pass table names as argv to regenerate a
subset (`python scripts/gen_sf10.py lineitem orders events`).

Shape rules match gen_sf1.py so each family's asymptotics stay honest:

- documents: replica q>0 prefixes every token with `s{q}~` — layered on
  sf1's `r{r}~` prefixes this yields 100 pairwise-DISJOINT token
  universes, so near-dup cluster SIZES stay as at sf0.1 while cluster
  COUNT scales 100x (the boilerplate-crawl growth shape);
- embeddings: deterministic per-replica component jitter (vectors stay
  in their source cluster, no exact copies), vec_id offset 100M per
  replica (clear of sf1's 10M offsets and the semdedup +100000 /
  contamination +200000 synthetic-id windows);
- lineitem/orders: orderkeys offset 100M per replica AND
  l_suppkey/o_custkey offset too — gen_sf1.py offsets only orderkeys,
  so its replicas share supplier/customer node ids and the
  supplier->customer edge set collapses under DISTINCT (sf0.1 -> sf1
  grows the lineitem x orders join 10x but NOT the graph); offsetting
  the node keys here makes each sf10 replica a node-disjoint copy of
  the sf1 graph, so sf1 -> sf10 is an honest 10x on BOTH the join
  input and the graph itself (node/edge count, component count);
- events: event_id/user_id offset per replica — 10x disjoint
  per-user series of unchanged length, the per-key as-of shape.

Pure column transforms of sf1 data — bit-identical across runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crypto_lakehouse_spark.session import get_spark_session

DEFAULT_SRC = "/tmp/spark_graft_sf1"
DEFAULT_OUT = "/tmp/spark_graft_sf10"
OFFSET = 100_000_000
REPS = 10


def _replicate(df, rep_col_exprs):
    parts = []
    for rep in range(REPS):
        out = df
        for col, fn in rep_col_exprs.items():
            out = out.withColumn(col, fn(rep))
        parts.append(out)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


def main() -> int:
    src_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", DEFAULT_SRC)
    out_dir = os.environ.get("SPARK_GRAFT_SF10_DIR", DEFAULT_OUT)
    if not os.path.isdir(src_dir):
        print(f"missing {src_dir}; run scripts/gen_sf1.py first", file=sys.stderr)
        return 1
    spark = get_spark_session("gen-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    def src(name):
        return spark.read.parquet(f"{src_dir}/{name}.parquet")

    only = set(sys.argv[1:])

    def write(df, name, parts):
        if only and name not in only:
            return
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        n = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
        print(f"{name}: {n} rows")

    write(
        _replicate(
            src("documents"),
            {
                "doc_id": lambda q: F.col("doc_id") + F.lit(q * OFFSET),
                "text": lambda q: (
                    F.col("text")
                    if q == 0
                    else F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda x: F.concat(F.lit(f"s{q}~"), x),
                        ),
                        " ",
                    )
                ),
            },
        ).withColumn("n_chars", F.length("text").cast("bigint")),
        "documents",
        parts=64,
    )

    write(
        _replicate(
            src("embeddings"),
            {
                "vec_id": lambda q: F.col("vec_id") + F.lit(q * OFFSET),
                "embedding": lambda q: (
                    F.col("embedding")
                    if q == 0
                    else F.transform(
                        F.col("embedding"),
                        lambda x, i: (
                            x
                            + (
                                (
                                    (F.col("vec_id") * 13 + i * 29 + F.lit(q * 3))
                                    % 11
                                )
                                - 5
                            ).cast("float")
                            * F.lit(0.002)
                        ).cast("float"),
                    )
                ),
            },
        ),
        "embeddings",
        parts=32,
    )

    write(
        _replicate(
            src("lineitem"),
            {
                "l_orderkey": lambda q: F.col("l_orderkey") + F.lit(q * OFFSET),
                "l_suppkey": lambda q: F.col("l_suppkey") + F.lit(q * OFFSET),
            },
        ),
        "lineitem",
        parts=64,
    )
    write(
        _replicate(
            src("orders"),
            {
                "o_orderkey": lambda q: F.col("o_orderkey") + F.lit(q * OFFSET),
                "o_custkey": lambda q: F.col("o_custkey") + F.lit(q * OFFSET),
            },
        ),
        "orders",
        parts=32,
    )
    write(
        _replicate(
            src("events"),
            {
                "event_id": lambda q: F.col("event_id") + F.lit(q * OFFSET),
                "user_id": lambda q: F.col("user_id") + F.lit(q * OFFSET),
            },
        ),
        "events",
        parts=32,
    )
    print("sf10 fixture at", out_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
