"""Deterministic sf1 fixture: 10x replication of the driver's sf0.1
tables (VERDICT r6 item 5 — two-decade ramp evidence sf0.01 -> sf1).

The driver ships sf0.001/0.01/0.1 only and its dirs are read-only, so
sf1 is derived here, OUTSIDE the repo (default /tmp/spark_graft_sf1;
override with SPARK_GRAFT_SF1_DIR). Derivation rules keep each
query family's asymptotic structure honest at 10x:

- fact tables (documents, embeddings, events, orders, lineitem):
  10 replicas with key offsets of 10M per replica;
- documents: replica r>0 prefixes EVERY token with `r{r}~`, making
  each replica a DISJOINT shingle/token universe — near-dup cluster
  SIZES stay as at sf0.1 while cluster COUNT scales 10x (replicating
  text verbatim would instead inflate every cluster 10x and turn the
  within-cluster n^2 into a different, unfairly harder workload);
- embeddings: deterministic per-replica component jitter (keeps
  cluster geometry, avoids 10 exact copies of every vector);
- events: user/event ids offset (per-user session structure repeats
  per replica, user cardinality scales 10x), timestamps unchanged;
- orders/lineitem: order keys offset; cust/part/supp foreign keys
  left in range so dimension joins stay valid (fact-only scaling,
  the usual warehouse growth shape);
- dimensions (region nation customer supplier part): copied as-is.

Everything is a pure column transform of driver data — bit-identical
across runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crypto_lakehouse_spark.session import get_spark_session

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = "/tmp/spark_graft_sf1"
OFFSET = 10_000_000
REPS = 10


def _replicate(df, rep_col_exprs):
    """Union REPS copies of df, applying {col: fn(rep)} per replica."""
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
    out_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", DEFAULT_OUT)
    spark = get_spark_session("gen-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    def src(name):
        return spark.read.parquet(f"{SRC}/{name}.parquet")

    def write(df, name, parts=8):
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"{name}: {spark.read.parquet(f'{out_dir}/{name}.parquet').count()} rows")

    # dimensions: verbatim
    for name in ("region", "nation", "customer", "supplier", "part"):
        write(src(name), name, parts=1)

    docs = src("documents")
    write(
        _replicate(
            docs,
            {
                "doc_id": lambda r: F.col("doc_id") + F.lit(r * OFFSET),
                # r>0: disjoint token universe per replica (see module
                # docstring); n_chars updated to match the new text.
                "text": lambda r: (
                    F.col("text")
                    if r == 0
                    else F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda x: F.concat(F.lit(f"r{r}~"), x),
                        ),
                        " ",
                    )
                ),
            },
        ).withColumn("n_chars", F.length("text").cast("bigint")),
        "documents",
    )

    emb = src("embeddings")
    write(
        _replicate(
            emb,
            {
                "vec_id": lambda r: F.col("vec_id") + F.lit(r * OFFSET),
                # Deterministic jitter ~0.2% per component: replicas
                # stay in their source's cluster but are not exact
                # copies.
                "embedding": lambda r: (
                    F.col("embedding")
                    if r == 0
                    else F.transform(
                        F.col("embedding"),
                        lambda x, i: (
                            x
                            + (
                                (
                                    (F.col("vec_id") * 31 + i * 17 + F.lit(r * 7))
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
    )

    ev = src("events")
    write(
        _replicate(
            ev,
            {
                "event_id": lambda r: F.col("event_id") + F.lit(r * OFFSET),
                "user_id": lambda r: F.col("user_id") + F.lit(r * OFFSET),
            },
        ),
        "events",
        parts=16,
    )

    orders = src("orders")
    write(
        _replicate(
            orders,
            {"o_orderkey": lambda r: F.col("o_orderkey") + F.lit(r * OFFSET)},
        ),
        "orders",
        parts=16,
    )

    li = src("lineitem")
    write(
        _replicate(
            li,
            {"l_orderkey": lambda r: F.col("l_orderkey") + F.lit(r * OFFSET)},
        ),
        "lineitem",
        parts=32,
    )
    print("sf1 fixture at", out_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
