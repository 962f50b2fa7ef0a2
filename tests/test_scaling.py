"""Scale-ramp smoke: the cheap local proxy for the 100x question.

Runs the most expensive bench queries at sf0.01 and sf0.1 (10x the
rows) and asserts wall-time grows sub-quadratically. An accidental
all-pairs join or driver-side loop shows up as a ~100x ratio here long
before a cluster run would; a healthy shuffle-bounded plan lands near
the 10x data ratio plus fixed overhead.

The bound is deliberately loose (RATIO_MAX = 30): local[32] timings at
these scales carry scheduling noise and fixed per-query overhead, and
the target failure mode (quadratic blowup, ratio ~100) is an order of
magnitude away from it. Sub-second baselines are floored so overhead
doesn't fake a high ratio.
"""

from __future__ import annotations

import time

import pytest

from crypto_lakehouse_spark import queries as qmod
from crypto_lakehouse_spark.queries.registry import REGISTRY

qmod.load_all()

SMALL = "/root/testdata/sf0.01"
BIG = "/root/testdata/sf0.1"

# The bench's most expensive queries (BENCH_FULL.json, sf0.1) — the
# ones whose asymptotics matter most; each family's scale posture is
# documented in its module.
RAMP_QUERIES = [
    "idf_cosine_topk",
    "ngram_jaccard_prefix_filtered",
    "near_dup_keep",
    "dup_clusters_cc_star",
    "levenshtein_blocked_linkage",
    "minute_gap_fill_ffill",
    # round-5 additions to the expensive tier
    "pagerank_iterated",
    "multimodal_ahash_near_dup",
    "asof_join_cogroup",
    # round-6: the hot-band-capped scale path + recall census
    "multimodal_ahash_near_dup_capped",
]

RATIO_MAX = 30.0
FLOOR_SEC = 0.35  # below this, fixed overhead dominates the numerator


def _time(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    REGISTRY[name].spark_fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


@pytest.mark.parametrize("name", RAMP_QUERIES)
def test_ramp_subquadratic(spark, name):
    # Warm both scales once (codegen, scan caches) so the measured pair
    # compares plan asymptotics, not first-touch compilation.
    _time(spark, name, SMALL)
    small = max(_time(spark, name, SMALL), FLOOR_SEC)
    big = _time(spark, name, BIG)
    ratio = big / small
    assert ratio < RATIO_MAX, (
        f"{name}: sf0.01 {small:.2f}s -> sf0.1 {big:.2f}s "
        f"(x{ratio:.1f}); 10x data should not cost ~100x time"
    )
