"""Deterministic sf10 fixture: third-decade ramp evidence (VERDICT r7
item 3). Derived as 10 replicas of the sf1 fixture (run
scripts/gen_sf1.py first), which is itself 10 replicas of the driver's
sf0.1 — so sf10 is 100x the driver's benchmark scale.

Only the tables the declared scale-path tier reads are generated —
documents and embeddings (the five tier queries
`multimodal_ahash_near_dup_capped_only`, `ngram_jaccard_prefix_filtered`,
`semdedup_clustered`, `contamination_bloom`, `leakage_safe_split` touch
nothing else); generating 60M-row lineitem replicas would cost minutes
of wall and GBs of disk for queries nobody runs at this scale.

Shape rules match gen_sf1.py so each family's asymptotics stay honest:

- documents: replica q>0 prefixes every token with `s{q}~` — layered on
  sf1's `r{r}~` prefixes this yields 100 pairwise-DISJOINT token
  universes, so near-dup cluster SIZES stay as at sf0.1 while cluster
  COUNT scales 100x (the boilerplate-crawl growth shape);
- embeddings: deterministic per-replica component jitter (vectors stay
  in their source cluster, no exact copies), vec_id offset 100M per
  replica (clear of sf1's 10M offsets and the semdedup +100000 /
  contamination +200000 synthetic-id windows).

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

    def write(df, name, parts):
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
    print("sf10 fixture at", out_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
