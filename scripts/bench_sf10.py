"""sf10 spot-bench of the expensive tier: extends the ramp from two
decades (sf0.01->sf1) to three (sf0.1->sf1->sf10, 100x the driver's
benchmark scale) for EVERY query that costs >2 s at sf0.1 — the same
membership rule as the sf1 tier, one decade further. Writes
BENCH_SF10.json {query: {sf1: s, sf10: s, ratio: x}}; the declared
gate (BASELINE.md ramp section) is ratio <= 20 at 10x data — i.e.
measurably sub-quadratic with headroom for fixed-cost amortization
shifts, against a quadratic's 100x. Run scripts/gen_sf1.py and
scripts/gen_sf10.py first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_lakehouse_spark import queries as qmod
from crypto_lakehouse_spark.queries.registry import REGISTRY
from crypto_lakehouse_spark.session import get_spark_session

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")

# Membership = the sf1 tier rule applied one decade up: every query
# >2 s at sf0.1 (BENCH_FULL_r08.json), plus the originally-declared
# scale paths that since dropped under 2 s. Covers each 100 TB-critical
# family: multimodal near-dup, lexical near-dup, semantic dedup (flat +
# hierarchical), decontamination (bloom + minhash-fuzzy), leakage-safe
# splitting, dup clustering, inverted-index cosine, tokenization,
# graph iteration, and the cogrouped as-of join.
TIER = [
    "multimodal_ahash_near_dup_capped_only",
    "ngram_jaccard_prefix_filtered",
    "semdedup_clustered",
    "semdedup_hierarchical",
    "contamination_bloom",
    "contamination_minhash_fuzzy",
    "leakage_safe_split",
    "dup_clusters_cc_star",
    # idf_cosine_topk dropped from this tier in round 10 (VERDICT r9
    # item 2): it is the family's documented brute-force exactness
    # anchor (see its docstring — unthresholded exact top-k is
    # intrinsically all-pairs); idf_cosine_thresholded below is the
    # family's scale path and carries the sf10 ramp row.
    "wordpiece_tokenize_recursive",
    "pagerank_iterated",
    "asof_join_cogroup",
    # round-8 widening additions that crossed the >2s-at-sf0.1 rule
    "triangle_census_copurchase",
    "rrf_hybrid_topk",
    "dedup_survivor_weights",
    # round-9: the thresholded all-pairs twin whose whole point is the
    # sf10 number (VERDICT r8 item 1)
    "idf_cosine_thresholded",
    # round-10: the four queries ramped at sf1 this round (VERDICT r9
    # item 1) all exceed 2 s there, so the rule carries them one
    # decade further
    "ks_statistic_priority_pairs",
    "lsh_band_sweep_eval",
    "variance_ratio_daily",
    "pagerank_one_iter",
    # round-10 close: the newly-ramped queries that are >2 s at sf1
    # (BENCH_SF1.json) carry one decade further
    "bigram_lm_doc_score",
    "ngram_singleton_decay",
    # containment_topk is the family's EXACT anchor (one/two-sided
    # prefix bounds cannot cut genuinely-shared rare shingles on a
    # small-vocab corpus: 46M real candidate pairs at sf10, measured);
    # the deployable stop-shingle-capped twin carries the sf10 row,
    # same policy as ngram_jaccard_capped.
    "containment_topk_capped",
    "return_acf_daily",
    "ivf_pq_topk",
    # round-10 continuation: >2 s at sf1 (BENCH_SF1.json), so the rule
    # carries the new peel loop and the curve-locality eval one decade
    # further
    "kcore_peel_bounded",
    "curve_locality_eval",
    # round-11: >2 s at sf1 (BENCH_SF1.json: 6.7 s), so the rule
    # carries the BPE training loop one decade further
    "bpe_train_iterated",
]

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))


def _bench(spark, name: str, sf_dir: str) -> float:
    q = REGISTRY[name]
    fn = q.bench_fn or q.spark_fn
    best = float("inf")
    for _ in range(RUNS):  # first run doubles as the memo/codegen warm-up
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    for d in (SF1, SF10):
        if not os.path.isdir(d):
            print(f"missing {d}; run the gen scripts first", file=sys.stderr)
            return 1
    qmod.load_all()
    spark = get_spark_session("bench-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SF10.json",
    )
    # Resumable: measured queries persist after each one; re-run with
    # SPARK_GRAFT_FRESH=1 (or delete the file) to re-measure everything.
    out = {}
    if os.path.exists(path) and not os.environ.get("SPARK_GRAFT_FRESH"):
        with open(path) as f:
            out = {
                k: v
                for k, v in json.load(f).get("queries", {}).items()
                # keep TIER members AND any live-registry ad-hoc
                # measurement (the argv force path) — the old
                # TIER-only filter silently erased those on the next
                # resume; renamed/retired queries still age out.
                if k in TIER or k in REGISTRY
            }
    todo = [n for n in TIER if n not in out] + (
        sys.argv[1:] if len(sys.argv) > 1 else []
    )
    for name in dict.fromkeys(todo):
        s1 = _bench(spark, name, SF1)
        s10 = _bench(spark, name, SF10)
        out[name] = {
            "sf1": s1,
            "sf10": s10,
            "ratio": round(s10 / max(s1, 0.05), 1),
        }
        print(name, out[name], flush=True)
        with open(path, "w") as f:
            json.dump(
                {"sf10_dir": SF10, "runs_best_of": RUNS, "queries": out},
                f,
                indent=1,
            )
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
