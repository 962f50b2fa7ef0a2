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
from pyspark.sql import functions as F

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
    "contamination_minhash_fuzzy",
    # round-7: vectorized semantic dedup (Arrow kernels) and its
    # pure-SQL hierarchical-assignment twin
    "semdedup_clustered",
    "semdedup_hierarchical",
    # round-10: the capped containment scale path and CDC chunking
    "containment_topk_capped",
    "cdc_chunk_boundaries",
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
    # Time BIG first, then re-time SMALL: the session fixtures
    # (shingles / prefixes / CC labels / ...) are memoized per
    # (session, sf_dir) and EVICTED on an sf_dir switch, so each timed
    # run below pays its own scale's full fixture build — a fair
    # asymptotic ratio. (Timing small right after its warm-up instead
    # measured a memo hit against a cold big build: the fixture-thin
    # consumers like near_dup_keep then compare ~0 s to a full build
    # and the ratio explodes for measurement, not asymptotic, reasons
    # — r13 optimization round.)
    big = _time(spark, name, BIG)
    small = max(_time(spark, name, SMALL), FLOOR_SEC)
    ratio = big / small
    assert ratio < RATIO_MAX, (
        f"{name}: sf0.01 {small:.2f}s -> sf0.1 {big:.2f}s "
        f"(x{ratio:.1f}); 10x data should not cost ~100x time"
    )


# --- Zipf-skewed stress fixture (VERDICT r5 item 7) -----------------------
# The sub-quadratic claims for the shingle/LSH/CC dedup tier rest on
# map-side combiners absorbing hot keys. The driver's documents corpus
# is fairly uniform; this fixture is deliberately Zipf-skewed — a few
# boilerplate tokens appear in nearly every doc, cluster sizes follow
# s ~ rank^-1, and one giant near-dup cluster dominates — so the skew
# story is machine-checked, not docstring-claimed. Two scales (10x
# docs), same ramp assertion as the driver corpus.

SKEW_DEDUP_QUERIES = [
    "ngram_jaccard_prefix_filtered",
    "dup_clusters_cc_star",
    "near_dup_keep",
    "idf_cosine_topk",
    "substring_span_dedup",
    "contamination_minhash_fuzzy",
    # The deployable capped aHash path (VERDICT r6 item 1): hot band
    # buckets — exactly what this Zipf corpus manufactures — must be
    # pruned from candidate generation, not just flagged.
    "multimodal_ahash_near_dup_capped_only",
    # Hybrid retrieval (VERDICT r8 item 7): the Zipf head tokens ARE
    # the BM25 query terms (see _zipf_documents), so the lexical leg's
    # tf/df aggregates and the dense centroid rerank both run against
    # maximal term skew.
    "rrf_hybrid_topk",
]


# BM25/RRF query terms baked into text_ops._rrf_pre — reused as the
# Zipf head so retrieval hits the skewed mass.
_QUERY_TERMS = [
    "query", "table", "scan", "stream", "window", "batch",
    "merge", "join", "hash",
]


def _zipf_documents(spark, path: str, n_docs: int) -> None:
    """Deterministic Zipf corpus: token t_k drawn with p ~ 1/k over a
    2000-token vocab; doc d in cluster c = floor(sqrt(d)) shares its
    cluster's base text (giant cluster 0) plus per-doc suffix noise.
    Also writes a matching embeddings table (vec_id = doc_id, 64 dims
    deterministic from the id) so hybrid lexical+dense queries run on
    the fixture."""
    import os

    if os.path.exists(os.path.join(path, "documents.parquet")):
        return
    rows = []
    vocab = 2000
    for d in range(n_docs):
        c = int(d**0.5)
        # Cluster base: tokens chosen by a fixed LCG over Zipf ranks.
        seed = c * 2654435761 % (2**31)
        toks = []
        for i in range(60):
            seed = (seed * 1103515245 + 12345) % (2**31)
            # Zipf-ish: map uniform to rank via inverse-power
            u = (seed % 10_000) / 10_000 + 1e-9
            rank = int(vocab * (u**3)) + 1  # heavy mass on low ranks
            # The 9 hottest ranks are the rrf/bm25 query terms, so the
            # retrieval queries exercise this fixture's skew head-on
            # (every query term is a near-stopword here).
            toks.append(_QUERY_TERMS[rank - 1] if rank <= 9 else f"tok{rank}")
        # Per-doc noise tail so cluster members are NEAR dups.
        seed2 = d * 48271 % (2**31)
        for i in range(6):
            seed2 = (seed2 * 1103515245 + 12345) % (2**31)
            toks.append(f"noise{seed2 % 50_000}")
        text = " ".join(toks)
        rows.append((d, text, "en", f"src{d % 7}", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    emb = [
        (
            d,
            [((d * 31 + i * 17) % 97) / 97.0 - 0.5 for i in range(64)],
            d % 5,
        )
        for d in range(n_docs)
    ]
    spark.createDataFrame(
        emb, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).coalesce(4).write.mode("overwrite").parquet(
        os.path.join(path, "embeddings.parquet")
    )


@pytest.fixture(scope="module")
def skew_dirs(spark, tmp_path_factory):
    small = str(tmp_path_factory.mktemp("skew_small"))
    big = str(tmp_path_factory.mktemp("skew_big"))
    _zipf_documents(spark, small, 500)
    _zipf_documents(spark, big, 5000)
    return small, big


@pytest.mark.parametrize("name", SKEW_DEDUP_QUERIES)
def test_ramp_subquadratic_on_zipf_skew(spark, name, skew_dirs):
    small_dir, big_dir = skew_dirs
    _time(spark, name, small_dir)  # warm
    # big first, then small cold again — see test_ramp_subquadratic.
    big = _time(spark, name, big_dir)
    small = max(_time(spark, name, small_dir), FLOOR_SEC)
    ratio = big / small
    assert ratio < RATIO_MAX, (
        f"{name} on Zipf-skewed corpus: {small:.2f}s -> {big:.2f}s "
        f"(x{ratio:.1f}); combiners/caps should absorb the hot keys"
    )


# --- Giant-component CC ramp (VERDICT r7 item 5) ---------------------------
# The Zipf fixture above stresses hot KEYS; this one stresses the
# connected-components LOOP that `dup_clusters_cc*` and
# `leakage_safe_split` share. Shape: the near-dup graph of a
# boilerplate-heavy crawl — one giant component holding 10% of the
# corpus, built as a template-drift CHAIN (doc i near-dups doc i+1),
# so the component's DIAMETER grows linearly with corpus size while
# its edge count stays linear (no clique blowup). This is the shape
# that kills a fixed-round one-hop propagation loop: diameter exceeds
# any constant cap one decade out, and a silent cap returns WRONG
# labels. `_cc_labels` pointer-doubles (comp(comp(v)) shortcut join),
# so rounds grow as log2(diameter) and the ramp below stays flat in
# rounds and sub-quadratic in wall time.

GIANT_CC_QUERIES = ["dup_clusters_cc", "dup_clusters_cc_star", "leakage_safe_split"]


def _chain_documents(spark, path: str, n_docs: int) -> None:
    """One giant chain component (10% of docs: doc i shares a sliding
    6-token window with doc i+1 over a common token stream, 3-gram
    Jaccard ~0.6-0.93 to its +-2 neighbors => diameter ~ chain/2) plus
    90% singleton docs with disjoint vocabularies."""
    import os

    if os.path.exists(os.path.join(path, "documents.parquet")):
        return
    chain = n_docs // 10
    L = 6
    rows = []
    for d in range(chain):
        toks = [f"w{d + j}" for j in range(L)]
        rows.append((d, " ".join(toks), "en", f"src{d % 7}", 0))
    for d in range(chain, n_docs):
        toks = [f"u{d}x{j}" for j in range(L)]
        rows.append((d, " ".join(toks), "en", f"src{d % 7}", 0))
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    df.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )


@pytest.fixture(scope="module")
def giant_cc_dirs(spark, tmp_path_factory):
    small = str(tmp_path_factory.mktemp("giant_cc_small"))
    big = str(tmp_path_factory.mktemp("giant_cc_big"))
    _chain_documents(spark, small, 400)   # chain 40, diameter ~20
    _chain_documents(spark, big, 4000)    # chain 400, diameter ~200
    return small, big


def test_cc_pointer_doubling_converges_on_long_chain(spark):
    """Pure-loop probe: a 2000-edge path graph has diameter 2000; the
    shortcutted loop must converge inside the 32-round bound (plain
    one-hop propagation needs 2000 rounds and the old fixed cap of 20
    returned silently-wrong labels) and label every node with the
    chain head."""
    from crypto_lakehouse_spark.queries.dedup_ops import _cc_labels

    n = 2000
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a BIGINT, doc_b BIGINT"
    ).repartition(8)
    lbl = _cc_labels(spark, edges)  # raises if not converged
    comps = lbl.select("component").distinct().collect()
    assert [r.component for r in comps] == [0]
    assert lbl.count() == n + 1


def test_giant_component_labels_are_exact(spark, giant_cc_dirs):
    """On the crawl-shaped corpus both CC variants must agree with the
    ground truth: one component of exactly chain-size docs labeled by
    the chain head, everything else singleton-free (no edges)."""
    _, big = giant_cc_dirs
    for name in ("dup_clusters_cc", "dup_clusters_cc_star"):
        out = REGISTRY[name].spark_fn(spark, big).collect()
        by_comp = {}
        for r in out:
            by_comp.setdefault(r.component, []).append(r.doc_id)
        assert set(by_comp) == {0}, f"{name}: expected one chain component"
        assert sorted(by_comp[0]) == list(range(400)), name


@pytest.mark.parametrize("name", GIANT_CC_QUERIES)
def test_ramp_subquadratic_on_giant_component(spark, name, giant_cc_dirs):
    small_dir, big_dir = giant_cc_dirs
    _time(spark, name, small_dir)  # warm
    # big first, then small cold again — see test_ramp_subquadratic.
    big = _time(spark, name, big_dir)
    small = max(_time(spark, name, small_dir), FLOOR_SEC)
    ratio = big / small
    # 10x docs AND 10x component diameter: rounds grow +log2(10) ~ +3,
    # per-round cost grows ~10x => the quadratic failure mode (~100x,
    # or non-convergence) sits an order of magnitude above the gate.
    assert ratio < RATIO_MAX, (
        f"{name} on giant-component corpus: {small:.2f}s -> {big:.2f}s "
        f"(x{ratio:.1f}, exponent {__import__('math').log10(max(ratio, 1e-9)):.2f}); "
        "the CC loop should be O(log diameter) rounds x linear shuffle"
    )


# --- hot-hub fixture for the bipartite projection ---------------------------
# The co-purchase projection's scale claim rests on the per-customer
# candidate cap absorbing hub customers (one mega-customer linked to S
# suppliers otherwise emits S^2/2 pairs). The driver's orders are
# near-uniform, so this fixture manufactures the hub: customer 0 links
# to EVERY supplier, everyone else to 3. Two scales grow BOTH the
# customer count and the hub's width 10x — uncapped, the hub's pair
# output alone would grow 100x and trip the ramp bound.

COPURCHASE_QUERIES = ["copurchase_supplier_topk", "triangle_census_copurchase"]


def _hub_tables(spark, path: str, n_cust: int, n_supp: int) -> None:
    import os

    if os.path.exists(os.path.join(path, "orders.parquet")):
        return
    orders = [(c, c) for c in range(n_cust)]  # one order per customer
    lineitem = [(0, s) for s in range(n_supp)]  # the hub: every supplier
    for c in range(1, n_cust):
        for j in range(3):
            lineitem.append((c, (c * 48271 + j * 7919) % n_supp))
    spark.createDataFrame(
        orders, "o_orderkey BIGINT, o_custkey BIGINT"
    ).coalesce(4).write.mode("overwrite").parquet(
        os.path.join(path, "orders.parquet")
    )
    spark.createDataFrame(
        lineitem, "l_orderkey BIGINT, l_suppkey BIGINT"
    ).coalesce(4).write.mode("overwrite").parquet(
        os.path.join(path, "lineitem.parquet")
    )


@pytest.fixture(scope="module")
def hub_dirs(spark, tmp_path_factory):
    small = str(tmp_path_factory.mktemp("hub_small"))
    big = str(tmp_path_factory.mktemp("hub_big"))
    _hub_tables(spark, small, 200, 100)
    _hub_tables(spark, big, 2000, 1000)
    return small, big


@pytest.mark.parametrize("name", COPURCHASE_QUERIES)
def test_ramp_subquadratic_on_hub_customer(spark, name, hub_dirs):
    small_dir, big_dir = hub_dirs
    _time(spark, name, small_dir)  # warm
    # big first, then small cold again — see test_ramp_subquadratic.
    big = _time(spark, name, big_dir)
    small = max(_time(spark, name, small_dir), FLOOR_SEC)
    ratio = big / small
    assert ratio < RATIO_MAX, (
        f"{name} on hub-customer graph: {small:.2f}s -> {big:.2f}s "
        f"(x{ratio:.1f}); the per-customer cap should absorb the hub"
    )


def test_copurchase_cap_bounds_hub_fanout(spark, hub_dirs):
    """The projection's pair count must be bounded by customers x
    C(20,2), hub included — i.e. the cap provably truncated the
    mega-customer before pair generation."""
    from crypto_lakehouse_spark.io import register_views
    from crypto_lakehouse_spark.queries.graph_ops import _COPURCHASE_BASE

    _, big_dir = hub_dirs
    register_views(spark, big_dir, ["lineitem", "orders"])
    n_pairs = spark.sql(
        "WITH " + _COPURCHASE_BASE + "\nSELECT COUNT(*) AS c FROM pairs"
    ).first()[0]
    assert n_pairs <= 2000 * 190, n_pairs
    # And the hub's own contribution is exactly C(20, 2), not C(1000, 2).
    hub_pairs = spark.sql(
        "WITH " + _COPURCHASE_BASE.replace(
            "FROM links", "FROM links WHERE c = 0", 1
        )
        + "\nSELECT COUNT(*) AS c FROM pairs"
    ).first()[0]
    assert hub_pairs == 190, hub_pairs
