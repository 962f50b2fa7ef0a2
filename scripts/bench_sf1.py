"""sf1 spot-bench of the expensive query tier (VERDICT r6 item 5):
turns the sub-quadratic scale claims from a one-decade (sf0.01->0.1)
into a two-decade (sf0.01->sf1) measurement. Writes BENCH_SF1.json
{query: {sf1: s, sf01: s, ratio: x}}; the sf1 numbers are the
declared baseline for the same 2x-regression gate BASELINE.md applies
to the sf0.1 suite. Run scripts/gen_sf1.py first.
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
SF01 = "/root/testdata/sf0.1"

# The expensive tier: every query over 2s in the round-6 sf0.1 bench,
# plus the round-7 capped-only scale path, plus the round-7 registry
# additions that crossed the >2s-at-sf0.1 tier rule after the table
# was first recorded (VERDICT r7 item 4: bm25_prf_rerank,
# contamination_semantic, and the semdedup ladder post-sqrt-k-fix).
TIER = [
    "multimodal_ahash_near_dup",
    "multimodal_ahash_near_dup_capped",
    "multimodal_ahash_near_dup_capped_only",
    "idf_cosine_topk",
    "ngram_jaccard_prefix_filtered",
    "semdedup_clustered",
    "semdedup_hierarchical",
    "contamination_minhash_fuzzy",
    "contamination_semantic",
    "bm25_prf_rerank",
    "dup_clusters_cc_star",
    "pagerank_iterated",
    "near_dup_keep",
    "levenshtein_blocked_linkage",
    "asof_join_cogroup",
    "leakage_safe_split",
    "wordpiece_tokenize_recursive",
    # round-8 widening additions that crossed the >2s-at-sf0.1 rule
    # (BENCH_FULL_r08.json: 3.96 / 3.78 / 3.01 s)
    "triangle_census_copurchase",
    "rrf_hybrid_topk",
    "dedup_survivor_weights",
    # round-9/10: the thresholded scale path, plus the four queries
    # that were >2 s in BENCH_FULL_r09 without a ramp row (VERDICT r9
    # item 1 — the rule is now machine-checked by scripts/dev_check.py
    # ramp_rule_violations). ks_statistic_priority_pairs was rewritten
    # to ~2 s this round but keeps its row: the rule keys off the last
    # RECORDED bench.
    "idf_cosine_thresholded",
    "ks_statistic_priority_pairs",
    "lsh_band_sweep_eval",
    "variance_ratio_daily",
    "pagerank_one_iter",
    # round-10 close: everything >2 s in the clean round-10 BENCH_FULL
    # that was not already ramped (flagged by dev_check's
    # ramp_rule_violations — the rule is machine-checked now), incl.
    # the two new >2 s round-10 operators
    "bigram_lm_doc_score",
    "ivf_pq_topk",
    "ngram_singleton_decay",
    "recursive_amortization",
    "containment_topk",
    "containment_topk_capped",
    "return_acf_daily",
    # round-10 continuation: the new checkpointed peel loop measures
    # ~4.6 s at sf0.1 (>2 s tier rule); the curve-locality eval
    # crossed 2 s in the final continuation bench
    "kcore_peel_bounded",
    "curve_locality_eval",
    # crept over 2 s in the final continuation bench (1.24 -> 2.12 s,
    # within the regression gate; the ramp rule keys off the record)
    "dsir_importance_resample",
    # round-11: the full BPE training loop measures ~3 s at sf0.1
    # (8 census rounds; corpus-linear type census per round)
    "bpe_train_iterated",
    # round-12: hovers at the 2 s boundary across runs (1.76 / 1.80 /
    # 2.21 s on identical code) — ramped so boundary jitter can never
    # trip the machine-checked rule again
    "nn_descent_round_recall",
    # round-12: the BPE train+apply loop also straddles the boundary
    # (1.69 / 2.05 s on identical code) — same treatment
    "bpe_fertility_census",
    # round-12: crept to the boundary across rounds (1.54 / 1.93 /
    # 2.24 s) — same treatment
    "bbit_minhash_estimate_error",
    # round-13: four more 2 s-boundary hoverers observed straddling
    # the line across quiet runs on identical code (event_funnel
    # 1.35/1.85/2.08, ngram_lm_doc_score 1.12/1.99, ngram_jaccard_capped
    # 1.63/2.69, coreset_kcenter_greedy 1.56/2.03) — ramped so jitter
    # can never trip the machine-checked rule (same r12 treatment)
    "event_funnel",
    "ngram_lm_doc_score",
    "ngram_jaccard_capped",
    "coreset_kcenter_greedy",
    # round-13: the unigram-LM EM step is a genuinely multi-round
    # operator (census + 3 materialized DP rounds + recursive walk);
    # ~4.3 s at sf0.1 — ramp evidence required by the >2 s rule
    "unigram_lm_em_step",
    # round-13: the pruned second EM round runs TWO DP passes over the
    # shared census — same treatment
    "unigram_lm_em_pruned",
    # round-13: 9 gram sizes exploded per doc make this the heaviest
    # text census (~3-6 s at sf0.1) — ramp evidence required
    "gopher_repetition_rules",
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
    if not os.path.isdir(SF1):
        print(f"missing {SF1}; run scripts/gen_sf1.py first", file=sys.stderr)
        return 1
    qmod.load_all()
    spark = get_spark_session("bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SF1.json",
    )
    # Resumable, same protocol as bench_sf10: measured queries persist
    # per query; SPARK_GRAFT_FRESH=1 (or deleting the file) re-measures
    # everything; extra argv names force a re-measure of just those.
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
        s01 = _bench(spark, name, SF01)
        s1 = _bench(spark, name, SF1)
        out[name] = {
            "sf01": s01,
            "sf1": s1,
            "ratio": round(s1 / max(s01, 0.05), 1),
        }
        print(name, out[name], flush=True)
        with open(path, "w") as f:
            json.dump(
                {"sf1_dir": SF1, "runs_best_of": RUNS, "queries": out},
                f,
                indent=1,
            )
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
