"""Distribution-fit / shift-detection operators — round-9 widening of
the data-quality surface. Everything here is the statistics a
training-data pipeline runs to DECIDE things (is this source drifting?
is the mix balanced? does the corpus still look like language?) rather
than to transform rows:

- Heaps-law vocabulary growth (V(n) ~ k * n^beta): sub-linear beta is
  the signature of natural text; beta near 1 means every document
  brings its own vocabulary (id-stuffed or synthetic), beta near 0
  means templated. Curve checkpoints + exact-decimal least squares.
- Jensen-Shannon divergence of each source's token distribution from
  the corpus: the mixture-drift number per ingest source, in bits.
- Two-sample Kolmogorov-Smirnov over order values for every priority
  pair: the classic distribution test, computed with INTEGER
  cross-multiplied ECDF differences (exact argmax; one double division
  at emission).
- Mutual information between event type and weekday (epoch-day
  arithmetic, convention-free across engines): the coupling number a
  seasonality model needs to justify itself.
- Per-source Gini concentration of document lengths: the inequality
  summary that flags a source whose "documents" are one giant page
  plus stubs.
- Population Stability Index per source (round 10): the standard
  model-monitoring drift number over NTILE-deterministic doc-length
  deciles, Laplace-smoothed, with conventional stable/moderate/
  shifted bands.
- Pearson chi-square independence test + Cramer's V over the same
  event_type x weekday contingency as the MI query (round 10): the
  frequentist alarm number, in the empty-cell-free algebraic form
  chi2 = n * sum(o^2/(rt*ct)) - n.
- PMI bigram collocations (round 10): Church-Hanks pointwise mutual
  information over adjacent word pairs with a min-count floor — the
  multiword-expression detector a tokenizer pipeline runs.

Cross-engine determinism: the house discipline throughout — integer
sufficient statistics wherever possible, ROUND(...,12)-then-DECIMAL
sums where a float term must be aggregated, one double expression per
emitted value, ROUND(...,9) on emission.

Scale notes: every query is scan -> one or two grouped aggregates;
the only joins are against per-group scalar relations (sources,
priorities, event types — broadcast-sized by construction). The
Heaps checkpoint join fans the first-occurrence relation out by the
~14 checkpoints (a bounded constant), not by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from crypto_lakehouse_spark.io import register_views
from crypto_lakehouse_spark.queries.registry import query


def _pair(
    name: str,
    spark_sql: str,
    duck_sql: str,
    tags: tuple[str, ...],
    tables: list[str] | None = None,
) -> None:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, tables or ["documents"])
        return spark.sql(spark_sql)

    fn.__name__ = name
    fn.__doc__ = (
        "Paired-dialect SQL (semantics in the module docstring). "
        f"Spark SQL:\n{spark_sql}"
    )
    query(name, oracle=duck_sql, tags=tags)(fn)


# --- Heaps-law vocabulary growth ---------------------------------------------
# Checkpoints at powers of two over the doc_id-ordered corpus prefix;
# V(n) = tokens whose FIRST occurrence falls within the first n docs.
# beta/k from exact-decimal least squares on (ln n, ln V) — the same
# DECIMAL(18,12) bound as zipf_slope_by_source (the cross product must
# stay inside Spark's 38-digit cap without scale loss).
_HEAPS_TAIL = """
ranked_docs AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rnk FROM docs
),
firsts AS (
    SELECT t, MIN(r.rnk) AS fr
    FROM toks JOIN ranked_docs r ON r.doc_id = toks.doc_id
    GROUP BY t
),
maxr AS (SELECT MAX(rnk) AS m FROM ranked_docs),
checkpoints AS (
    SELECT DISTINCT n FROM (
        SELECT CAST(POW(2, e) AS BIGINT) AS n FROM exps CROSS JOIN maxr
        WHERE CAST(POW(2, e) AS BIGINT) <= m
        UNION ALL
        SELECT m AS n FROM maxr
    ) u
),
vg AS (
    SELECT c.n, COUNT(*) AS v
    FROM checkpoints c JOIN firsts f ON f.fr <= c.n
    GROUP BY c.n
),
pts AS (
    SELECT CAST(ROUND(LN(CAST(n AS DOUBLE)), 12) AS DECIMAL(18, 12)) AS x,
           CAST(ROUND(LN(CAST(v AS DOUBLE)), 12) AS DECIMAL(18, 12)) AS y
    FROM vg
),
sums AS (
    SELECT COUNT(*) AS np,
           CAST(SUM(x) AS DOUBLE) AS sx,
           CAST(SUM(y) AS DOUBLE) AS sy,
           CAST(SUM(x * y) AS DOUBLE) AS sxy,
           CAST(SUM(x * x) AS DOUBLE) AS sxx
    FROM pts
)
SELECT CAST(vg.n AS BIGINT) AS checkpoint_docs,
       CAST(vg.v AS BIGINT) AS vocab_size,
       ROUND((s.np * s.sxy - s.sx * s.sy)
             / (s.np * s.sxx - s.sx * s.sx), 9) AS heaps_beta,
       ROUND(EXP((s.sy - ((s.np * s.sxy - s.sx * s.sy)
                          / (s.np * s.sxx - s.sx * s.sx)) * s.sx)
                 / s.np), 9) AS heaps_k
FROM vg CROSS JOIN sums s
ORDER BY checkpoint_docs
"""


def _heaps_sql(tok: str, split: str, exps: str) -> str:
    return f"""
WITH docs AS (
    SELECT doc_id FROM documents WHERE text IS NOT NULL
),
toks AS (
    SELECT doc_id, {tok} AS t FROM (
        SELECT doc_id, {split}(lower(text), ' ') AS ws
        FROM documents WHERE text IS NOT NULL
    )
),
exps AS ({exps}),
{_HEAPS_TAIL.lstrip()}"""


_pair(
    "heaps_law_vocab_growth",
    _heaps_sql(
        "explode(ws)", "split", "SELECT explode(sequence(3, 24)) AS e"
    ),
    _heaps_sql(
        "unnest(ws)", "string_split", "SELECT unnest(range(3, 25)) AS e"
    ),
    tags=("text", "heaps-law", "vocabulary", "distribution"),
)


# --- Jensen-Shannon divergence per source --------------------------------------
# JS(p_source || q_corpus) in bits: one row per (source, corpus token)
# with p possibly 0 (LEFT JOIN miss -> the p*ln(p/m) term is 0 by the
# 0*ln(0) = 0 convention, handled explicitly). Terms are
# ROUND(...,12)-then-decimal summed per source; the /ln(2) bits
# conversion is one double expression at emission.
_JS_TAIL = """
sc AS (SELECT source, t, COUNT(*) AS c FROM toks GROUP BY source, t),
stot AS (SELECT source, SUM(c) AS n FROM sc GROUP BY source),
ct AS (SELECT t, SUM(c) AS c FROM sc GROUP BY t),
tot AS (SELECT SUM(c) AS n FROM ct),
terms AS (
    SELECT st.source,
           CAST(ROUND(
               CASE WHEN s.c IS NULL THEN 0.0
                    ELSE 0.5 * (CAST(s.c AS DOUBLE) / st.n)
                         * LN((CAST(s.c AS DOUBLE) / st.n)
                              / ((CAST(s.c AS DOUBLE) / st.n
                                  + CAST(ct.c AS DOUBLE) / t.n) / 2))
               END
               + 0.5 * (CAST(ct.c AS DOUBLE) / t.n)
                 * LN((CAST(ct.c AS DOUBLE) / t.n)
                      / ((COALESCE(CAST(s.c AS DOUBLE), 0.0) / st.n
                          + CAST(ct.c AS DOUBLE) / t.n) / 2)),
               12) AS DECIMAL(18, 12)) AS term
    FROM stot st
    CROSS JOIN ct
    CROSS JOIN tot t
    LEFT JOIN sc s ON s.source = st.source AND s.t = ct.t
),
present AS (SELECT source, COUNT(*) AS n_tokens FROM sc GROUP BY source)
SELECT st.source,
       CAST(p.n_tokens AS BIGINT) AS n_distinct_tokens,
       CAST(st.n AS BIGINT) AS n_tokens_total,
       ROUND(CAST(SUM(tm.term) AS DOUBLE) / LN(2), 9) AS js_divergence_bits
FROM terms tm
JOIN stot st ON st.source = tm.source
JOIN present p ON p.source = tm.source
GROUP BY st.source, p.n_tokens, st.n
ORDER BY st.source
"""


def _js_sql(tok: str, split: str) -> str:
    return f"""
WITH toks AS (
    SELECT source, {tok} AS t FROM (
        SELECT source, {split}(lower(text), ' ') AS ws
        FROM documents WHERE text IS NOT NULL
    )
),
{_JS_TAIL.lstrip()}"""


_pair(
    "js_divergence_by_source",
    _js_sql("explode(ws)", "split"),
    _js_sql("unnest(ws)", "string_split"),
    tags=("text", "divergence", "distribution", "drift"),
)


# --- two-sample Kolmogorov-Smirnov over priority pairs --------------------------
# D = max over the pooled value grid of |ECDF_a - ECDF_b|, computed as
# integer |cum_a * n_b - cum_b * n_a| (exact argmax — no float until
# the single division at emission). Every one of the C(5,2) priority
# pairs is tested in one pass: the pooled per-value counts are grouped
# per pair, cumulated by one window, and reduced by one MAX.
_KS_SQL = """
WITH vals AS (
    SELECT o_orderpriority AS pr, o_totalprice AS v FROM orders
),
base AS (SELECT pr, v, COUNT(*) AS c FROM vals GROUP BY pr, v),
ns AS (SELECT pr, COUNT(*) AS n FROM vals GROUP BY pr),
prs AS (SELECT pr FROM ns),
pairs AS (
    SELECT a.pr AS pa, b.pr AS pb
    FROM prs a JOIN prs b ON a.pr < b.pr
),
pooled AS (
    SELECT p.pa, p.pb, b.v,
           SUM(CASE WHEN b.pr = p.pa THEN b.c ELSE 0 END) AS ca,
           SUM(CASE WHEN b.pr = p.pb THEN b.c ELSE 0 END) AS cb
    FROM pairs p JOIN base b ON b.pr = p.pa OR b.pr = p.pb
    GROUP BY p.pa, p.pb, b.v
),
cum AS (
    SELECT pa, pb, v,
           SUM(ca) OVER (PARTITION BY pa, pb ORDER BY v) AS cca,
           SUM(cb) OVER (PARTITION BY pa, pb ORDER BY v) AS ccb
    FROM pooled
)
SELECT c.pa AS priority_a,
       c.pb AS priority_b,
       CAST(na.n AS BIGINT) AS n_a,
       CAST(nb.n AS BIGINT) AS n_b,
       ROUND(CAST(MAX(ABS(c.cca * nb.n - c.ccb * na.n)) AS DOUBLE)
             / (na.n * nb.n), 9) AS ks_statistic
FROM cum c
JOIN ns na ON na.pr = c.pa
JOIN ns nb ON nb.pr = c.pb
GROUP BY c.pa, c.pb, na.n, nb.n
ORDER BY priority_a, priority_b
"""

# Spark-side plan (VERDICT r9 item 4, taken further): the pooled form
# above replicates every (priority, value) row into each of its 4
# containing pairs and window-sorts 10 pair-partitions (~4x the grid).
# This form computes the FIVE per-priority cumulative counts over the
# global value grid ONCE, then reduces all C(5,2) pair statistics from
# that single grid with 10 map-side MAX aggregates — no row
# replication at all. Two further cuts (measured — each intermediate
# shuffle stage costs ~1-1.5 s on this box even at 150k rows):
# - NO distinct-value pre-grouping: the windows use the default RANGE
#   frame, under which every row tied on v sees the cumulative
#   INCLUDING all tied rows — exactly the ECDF at v — so the raw scan
#   feeds the window directly (values are near-unique anyway, the
#   grouping saved nothing and cost a shuffle).
# - Bucketed two-phase prefix sum instead of one global ORDER BY
#   window (which would drag the corpus into a single WindowExec
#   partition): 32 percentile_approx range buckets -> per-bucket
#   partitioned windows + a 32-row bucket-offset window over
#   per-bucket totals taken straight off the scan. Bucket boundaries
#   only affect PARTITIONING, never the value (cum counts are exact
#   integers regardless of where the cuts land), so approx
#   percentiles are safe.
# The DuckDB oracle keeps the independent pooled form — the
# differential check compares two genuinely different algorithms.
# The 5 pivot slots assume o_orderpriority's fixed TPC-H domain
# (pr_idx joins are inner, so FEWER present priorities degrade
# gracefully; more than 5 would need more slots).
# Integer exactness: s_i*n_j products are BIGINT (max ~1e14 at sf10,
# bound 9.2e18 holds to ~1e9 rows/priority; beyond that widen to
# DECIMAL(38,0) — noted, not needed at any benched scale).
_KS_SPARK_SQL = """
WITH pr_idx AS (
    SELECT pr, n, ROW_NUMBER() OVER (ORDER BY pr) AS i
    FROM (SELECT o_orderpriority AS pr, COUNT(*) AS n
          FROM orders GROUP BY 1)
),
bounds AS (
    SELECT percentile_approx(
               o_totalprice,
               array(1/32d,  2/32d,  3/32d,  4/32d,  5/32d,  6/32d,
                     7/32d,  8/32d,  9/32d, 10/32d, 11/32d, 12/32d,
                    13/32d, 14/32d, 15/32d, 16/32d, 17/32d, 18/32d,
                    19/32d, 20/32d, 21/32d, 22/32d, 23/32d, 24/32d,
                    25/32d, 26/32d, 27/32d, 28/32d, 29/32d, 30/32d,
                    31/32d)
           ) AS bs
    FROM orders
),
raw AS (
    SELECT p.i, o.o_totalprice AS v,
           aggregate(b.bs, 0,
                     (acc, x) -> acc + IF(o.o_totalprice > x, 1, 0)
           ) AS bkt
    FROM orders o
    JOIN pr_idx p ON p.pr = o.o_orderpriority
    CROSS JOIN bounds b
),
boff AS (
    SELECT bkt,
           COALESCE(SUM(t1) OVER w, 0) AS o1,
           COALESCE(SUM(t2) OVER w, 0) AS o2,
           COALESCE(SUM(t3) OVER w, 0) AS o3,
           COALESCE(SUM(t4) OVER w, 0) AS o4,
           COALESCE(SUM(t5) OVER w, 0) AS o5
    FROM (SELECT bkt,
                 COUNT(IF(i = 1, 1, NULL)) AS t1,
                 COUNT(IF(i = 2, 1, NULL)) AS t2,
                 COUNT(IF(i = 3, 1, NULL)) AS t3,
                 COUNT(IF(i = 4, 1, NULL)) AS t4,
                 COUNT(IF(i = 5, 1, NULL)) AS t5
          FROM raw GROUP BY bkt)
    WINDOW w AS (ORDER BY bkt
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
cum AS (
    -- RANGE frame (the default with ORDER BY): rows tied on v all see
    -- the cumulative INCLUDING every tied row — exactly the ECDF at v
    -- — so no distinct-value pre-grouping is needed at all.
    SELECT o.o1 + COUNT(IF(r.i = 1, 1, NULL)) OVER w AS s1,
           o.o2 + COUNT(IF(r.i = 2, 1, NULL)) OVER w AS s2,
           o.o3 + COUNT(IF(r.i = 3, 1, NULL)) OVER w AS s3,
           o.o4 + COUNT(IF(r.i = 4, 1, NULL)) OVER w AS s4,
           o.o5 + COUNT(IF(r.i = 5, 1, NULL)) OVER w AS s5
    FROM raw r JOIN boff o ON o.bkt = r.bkt
    WINDOW w AS (PARTITION BY r.bkt ORDER BY r.v
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
npiv AS (
    SELECT MAX(CASE WHEN i = 1 THEN n END) AS n1,
           MAX(CASE WHEN i = 2 THEN n END) AS n2,
           MAX(CASE WHEN i = 3 THEN n END) AS n3,
           MAX(CASE WHEN i = 4 THEN n END) AS n4,
           MAX(CASE WHEN i = 5 THEN n END) AS n5
    FROM pr_idx
),
dm AS (
    SELECT MAX(ABS(s1 * n2 - s2 * n1)) AS d12,
           MAX(ABS(s1 * n3 - s3 * n1)) AS d13,
           MAX(ABS(s1 * n4 - s4 * n1)) AS d14,
           MAX(ABS(s1 * n5 - s5 * n1)) AS d15,
           MAX(ABS(s2 * n3 - s3 * n2)) AS d23,
           MAX(ABS(s2 * n4 - s4 * n2)) AS d24,
           MAX(ABS(s2 * n5 - s5 * n2)) AS d25,
           MAX(ABS(s3 * n4 - s4 * n3)) AS d34,
           MAX(ABS(s3 * n5 - s5 * n3)) AS d35,
           MAX(ABS(s4 * n5 - s5 * n4)) AS d45
    FROM cum CROSS JOIN npiv
),
flat AS (
    SELECT t.ia, t.ib, t.d
    FROM dm
    LATERAL VIEW stack(10,
        1, 2, d12,  1, 3, d13,  1, 4, d14,  1, 5, d15,
        2, 3, d23,  2, 4, d24,  2, 5, d25,
        3, 4, d34,  3, 5, d35,  4, 5, d45) t AS ia, ib, d
)
SELECT pa.pr AS priority_a,
       pb.pr AS priority_b,
       CAST(pa.n AS BIGINT) AS n_a,
       CAST(pb.n AS BIGINT) AS n_b,
       ROUND(CAST(f.d AS DOUBLE) / (pa.n * pb.n), 9) AS ks_statistic
FROM flat f
JOIN pr_idx pa ON pa.i = f.ia
JOIN pr_idx pb ON pb.i = f.ib
ORDER BY priority_a, priority_b
"""

_pair(
    "ks_statistic_priority_pairs",
    _KS_SPARK_SQL,
    _KS_SQL,
    tags=("statistics", "ks-test", "distribution", "data-quality"),
    tables=["orders"],
)


# --- mutual information: event type x weekday -----------------------------------
# MI in bits between the categorical event type and the weekday
# (epoch-day modulo arithmetic — convention-free across engines, same
# trick as weekday_seasonality_index). Emitted per event type as the
# type's contribution sum_w p(t,w) * log2(p(t,w) / (p(t) p(w))), with
# the corpus total repeated per row (single-row outputs hash too
# weakly). Integer counts everywhere; each term is one rounded double.
# Split at the cells boundary so the Spark fns can swap the cells CTE
# for the shared materialized fixture (r13); the oracles compose the
# two parts into the original single statement.
_MI_AFTER_CELLS = """
mt AS (SELECT event_type, SUM(c) AS c FROM cells GROUP BY event_type),
mw AS (SELECT wd, SUM(c) AS c FROM cells GROUP BY wd),
tot AS (SELECT SUM(c) AS n FROM cells),
terms AS (
    SELECT cl.event_type,
           CAST(ROUND(
               (CAST(cl.c AS DOUBLE) / t.n)
               * LN((CAST(cl.c AS DOUBLE) * t.n)
                    / (CAST(mt.c AS DOUBLE) * mw.c)) / LN(2),
               12) AS DECIMAL(18, 12)) AS term
    FROM cells cl
    JOIN mt ON mt.event_type = cl.event_type
    JOIN mw ON mw.wd = cl.wd
    CROSS JOIN tot t
),
contrib AS (
    SELECT event_type, CAST(SUM(term) AS DOUBLE) AS mi_bits
    FROM terms GROUP BY event_type
),
total AS (SELECT CAST(SUM(term) AS DOUBLE) AS mi FROM terms)
SELECT c.event_type,
       CAST(mt.c AS BIGINT) AS n_events,
       ROUND(c.mi_bits, 9) AS mi_contribution_bits,
       ROUND(t.mi, 9) AS total_mi_bits
FROM contrib c
JOIN mt ON mt.event_type = c.event_type
CROSS JOIN total t
ORDER BY c.event_type
"""


_CELLS_CTE = """cells AS (
    SELECT event_type, epoch_day % 7 AS wd, COUNT(*) AS c
    FROM base GROUP BY event_type, epoch_day % 7
),"""


def _mi_sql(epoch_day: str) -> str:
    return f"""
WITH base AS (
    SELECT event_type, {epoch_day} AS epoch_day FROM events
),
{_CELLS_CTE}
{_MI_AFTER_CELLS.lstrip()}"""


# Shared (event_type x weekday) contingency fixture (r13 optimization
# round): the MI and chi-square twins consume the IDENTICAL `cells`
# relation, and CTE inlining re-ran the events groupBy once per
# consumer (mt, mw, tot, terms = 4x per query, 8x per suite). One
# checkpointed ~|types|x7-row table serves every margin derivation in
# both queries; the oracles keep the inline form, so the hashes prove
# the fixture path exact.
_CELLS_VIEW = "type_weekday_cells_mat"
_CELLS_MEMO: dict[tuple[str, str], DataFrame] = {}


def cached_type_weekday_cells(spark: SparkSession, sf_dir: str) -> str:
    from crypto_lakehouse_spark.io import session_key
    from crypto_lakehouse_spark.operators.checkpointing import (
        release_lineage,
        truncate_lineage,
    )

    skey = session_key(spark)
    key = (skey, sf_dir)
    if key not in _CELLS_MEMO:
        for (sid, other), old in list(_CELLS_MEMO.items()):
            if sid == skey:
                release_lineage(old)
                del _CELLS_MEMO[(sid, other)]
        register_views(spark, sf_dir, ["events"])
        from crypto_lakehouse_spark.queries.fixture_meter import (
            build_t0,
            record_build,
        )

        t0 = build_t0()
        df = truncate_lineage(
            spark.sql(
                """
SELECT event_type,
       CAST(floor(unix_timestamp(ts) / 86400.0) AS BIGINT) % 7 AS wd,
       COUNT(*) AS c
FROM events
GROUP BY event_type,
         CAST(floor(unix_timestamp(ts) / 86400.0) AS BIGINT) % 7"""
            ),
            spark,
        )
        df.createOrReplaceTempView(_CELLS_VIEW)
        _CELLS_MEMO[key] = df
        record_build("type_weekday_cells", sf_dir, t0)
    return _CELLS_VIEW


def _mi_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information over the shared contingency fixture."""
    view = cached_type_weekday_cells(spark, sf_dir)
    return spark.sql(
        f"WITH cells AS (SELECT event_type, wd, c FROM {view}),\n"
        + _MI_AFTER_CELLS.lstrip()
    )


_mi_fn.__name__ = "mutual_information_type_weekday"
query(
    "mutual_information_type_weekday",
    oracle=_mi_sql("CAST(floor(epoch(ts) / 86400.0) AS BIGINT)"),
    tags=("events", "mutual-information", "statistics", "seasonality"),
)(_mi_fn)


# --- Gini concentration of document lengths per source --------------------------
# G = (2 * sum(i * x_i)) / (n * sum(x)) - (n + 1) / n over the
# length-sorted (doc_id tie-break) docs of each source. All-integer
# sufficient statistics; one double expression at emission.
_GINI_SQL = """
WITH ranked AS (
    SELECT source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS i
    FROM documents WHERE n_chars IS NOT NULL
),
g AS (
    SELECT source, COUNT(*) AS n, SUM(n_chars) AS s,
           SUM(i * n_chars) AS si
    FROM ranked GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       CAST(s AS BIGINT) AS total_chars,
       ROUND(2.0 * si / (n * CAST(s AS DOUBLE))
             - CAST(n + 1 AS DOUBLE) / n, 9) AS gini
FROM g
ORDER BY source
"""

_pair(
    "gini_doc_length_by_source",
    _GINI_SQL,
    _GINI_SQL,
    tags=("statistics", "gini", "concentration", "data-quality"),
)


# --- Hill tail-index estimator over document lengths ----------------------------
# alpha_hat(k) = k / sum_{i=1..k} ln(x_(i) / x_(k+1)) over the k
# largest lengths — the standard heavy-tail exponent estimator
# (Hill 1975). Reported at three k fractions (5/10/20% of n) because
# the estimator's STABILITY across k is the actual diagnostic: stable
# alpha ~ 1-3 means a genuine power-law tail (one mega-document class
# dominating token budgets); alpha drifting upward means the tail is
# thinner than it looks. ln ratios are ROUND(...,12) decimal-summed
# (order-free); the division is one double expression per row.
_HILL_SQL = """
WITH ranked AS (
    SELECT CAST(n_chars AS DOUBLE) AS x,
           ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r
    FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
),
nn AS (SELECT COUNT(*) AS n FROM ranked),
ks AS (
    -- FLOOR before the cast: DuckDB ROUNDS decimal->bigint casts while
    -- Spark TRUNCATES, so a bare CAST(frac * n AS BIGINT) picks different
    -- k whenever frac*n has fractional part >= 0.5 (e.g. n % 20 in 10..19
    -- for the 5% tier). Explicit FLOOR makes both engines truncate.
    SELECT CAST(FLOOR(frac * n) AS BIGINT) AS k
    FROM (SELECT 0.05 AS frac UNION ALL SELECT 0.10
          UNION ALL SELECT 0.20) f
    CROSS JOIN nn
    WHERE CAST(FLOOR(frac * n) AS BIGINT) >= 2
),
terms AS (
    SELECT k.k,
           CAST(ROUND(LN(r1.x / rk.x), 12) AS DECIMAL(24, 12)) AS lt
    FROM ks k
    JOIN ranked rk ON rk.r = k.k + 1
    JOIN ranked r1 ON r1.r <= k.k
)
SELECT CAST(k AS BIGINT) AS k_top,
       ROUND(CAST(k AS DOUBLE)
             / CAST(SUM(lt) AS DOUBLE), 9) AS hill_alpha
FROM terms
GROUP BY k
ORDER BY k_top
"""

_pair(
    "hill_tail_index_doc_lengths",
    _HILL_SQL,
    _HILL_SQL,
    tags=("statistics", "heavy-tail", "hill", "distribution"),
)


# --- Population Stability Index per source --------------------------------------
# PSI = sum over bins of (p_source - p_corpus) * ln(p_source /
# p_corpus) — the standard model-monitoring drift number, here over
# doc-length deciles: the per-ingest-source alarm a corpus pipeline
# fires when a source's length mix shifts from the corpus shape
# (scraper regression, template flood). Bins are NTILE(10) over the
# deterministic total order (n_chars, doc_id), so bin membership is
# identical in both engines with no percentile-interpolation
# convention in play. Laplace (+1 per bin) smoothing keeps every
# log argument finite without zero-guards, identically on both
# sides; per-bin terms are ROUND(...,12)-then-DECIMAL summed (the
# house float discipline), one double division at emission.
# Conventional reading: PSI < 0.1 stable, 0.1-0.25 moderate shift,
# > 0.25 action. Scale: one global NTILE window (the corpus decile
# assignment — at 100 TB this becomes the two-phase bucketed prefix
# sum used by ks_statistic_priority_pairs above, or plain
# percentile_approx boundaries since bin EDGES need not be exact for
# a drift alarm), then integer group counts and a 20x10-row reduce.
_PSI_SQL = """
WITH binned AS (
    SELECT source,
           NTILE(10) OVER (ORDER BY n_chars, doc_id) AS bin
    FROM documents WHERE n_chars IS NOT NULL
),
corpus AS (SELECT bin, COUNT(*) AS nb FROM binned GROUP BY bin),
ntot AS (SELECT COUNT(*) AS n FROM binned),
per_source AS (
    SELECT source, bin, COUNT(*) AS nsb FROM binned GROUP BY source, bin
),
stot AS (SELECT source, COUNT(*) AS ns FROM binned GROUP BY source),
terms AS (
    -- CAST(... AS DOUBLE) before each division: a bare 1.0 literal is
    -- DECIMAL in both engines but their decimal-division scale rules
    -- differ, which shifted the 7th decimal of the summed PSI.
    SELECT st.source,
           CAST(ROUND(
               (
                   CAST(COALESCE(ps.nsb, 0) + 1 AS DOUBLE) / (st.ns + 10)
                   - CAST(c.nb + 1 AS DOUBLE) / (t.n + 10)
               )
               * LN((CAST(COALESCE(ps.nsb, 0) + 1 AS DOUBLE) / (st.ns + 10))
                    / (CAST(c.nb + 1 AS DOUBLE) / (t.n + 10))),
               12) AS DECIMAL(18, 12)) AS term
    FROM stot st
    CROSS JOIN corpus c
    CROSS JOIN ntot t
    LEFT JOIN per_source ps
      ON ps.source = st.source AND ps.bin = c.bin
),
psi AS (
    SELECT source, CAST(SUM(term) AS DOUBLE) AS psi
    FROM terms GROUP BY source
)
SELECT p.source,
       CAST(st.ns AS BIGINT) AS n_docs,
       ROUND(p.psi, 9) AS psi,
       CASE WHEN p.psi < 0.1 THEN 'stable'
            WHEN p.psi < 0.25 THEN 'moderate'
            ELSE 'shifted' END AS drift_band
FROM psi p JOIN stot st ON st.source = p.source
ORDER BY p.source
"""

_pair(
    "psi_drift_by_source",
    _PSI_SQL,
    _PSI_SQL,
    tags=("statistics", "psi", "drift", "data-quality"),
)


# --- Pearson chi-square independence test (event_type x weekday) ---------------
# The frequentist twin of mutual_information_type_weekday above: same
# contingency table, but the test statistic a pipeline alarms on.
# Algebraic form that needs NO empty-cell fan-out:
#   chi2 = n * sum_observed(o^2 / (rt * ct)) - n
#   row contribution (incl. that row's empty cells) = sum_row(term) - rt
# where term = o^2 * n / (rt * ct) — derived from
# sum (o-e)^2/e = sum o^2/e - 2n + n and sum_row e = rt. Integer
# sufficient statistics throughout; each term is one double expression
# ROUND(...,12)-then-DECIMAL(26,12) summed; Cramer's V and the final
# subtraction happen once at emission. Weekday is epoch-day % 7
# (convention-free across engines, same as the MI query).
# Scale: one grouped count over the event scan, then joins against
# the <=|types| and 7-row margin relations — broadcast-sized by
# construction.
_CHI2_AFTER_CELLS = """
mt AS (SELECT event_type, SUM(c) AS c FROM cells GROUP BY event_type),
mw AS (SELECT wd, SUM(c) AS c FROM cells GROUP BY wd),
tot AS (SELECT SUM(c) AS n FROM cells),
dims AS (
    SELECT (SELECT COUNT(*) FROM mt) AS r, (SELECT COUNT(*) FROM mw) AS w
),
terms AS (
    SELECT cl.event_type,
           CAST(ROUND(
               CAST(cl.c AS DOUBLE) * cl.c * t.n
               / (CAST(mt.c AS DOUBLE) * mw.c),
               12) AS DECIMAL(26, 12)) AS term
    FROM cells cl
    JOIN mt ON mt.event_type = cl.event_type
    JOIN mw ON mw.wd = cl.wd
    CROSS JOIN tot t
),
rowsums AS (
    SELECT event_type, CAST(SUM(term) AS DOUBLE) AS s
    FROM terms GROUP BY event_type
),
total AS (SELECT CAST(SUM(term) AS DOUBLE) AS s FROM terms)
SELECT r.event_type,
       CAST(mt.c AS BIGINT) AS n_events,
       ROUND(r.s - mt.c, 9) AS chi2_row_contribution,
       ROUND(tt.s - t.n, 9) AS chi2_total,
       CAST((d.r - 1) * (d.w - 1) AS BIGINT) AS dof,
       ROUND(SQRT((tt.s - t.n)
                  / (t.n * CAST(LEAST(d.r - 1, d.w - 1) AS DOUBLE))),
             9) AS cramers_v
FROM rowsums r
JOIN mt ON mt.event_type = r.event_type
CROSS JOIN total tt
CROSS JOIN tot t
CROSS JOIN dims d
ORDER BY r.event_type
"""


def _chi2_sql(epoch_day: str) -> str:
    return f"""
WITH base AS (
    SELECT event_type, {epoch_day} AS epoch_day FROM events
),
{_CELLS_CTE}
{_CHI2_AFTER_CELLS.lstrip()}"""


def _chi2_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test over the shared contingency
    fixture (see cached_type_weekday_cells)."""
    view = cached_type_weekday_cells(spark, sf_dir)
    return spark.sql(
        f"WITH cells AS (SELECT event_type, wd, c FROM {view}),\n"
        + _CHI2_AFTER_CELLS.lstrip()
    )


_chi2_fn.__name__ = "chi_square_type_weekday"
query(
    "chi_square_type_weekday",
    oracle=_chi2_sql("CAST(floor(epoch(ts) / 86400.0) AS BIGINT)"),
    tags=("events", "chi-square", "statistics", "independence"),
)(_chi2_fn)


# --- PMI bigram collocations ---------------------------------------------------
# Pointwise mutual information over adjacent word pairs:
#   pmi(w1,w2) = ln( (c_b / N) / ((c_w1 / U) * (c_w2 / U)) )
# with N = total bigrams, U = total tokens — the standard collocation
# detector (Church & Hanks 1990): high-PMI pairs are multiword
# expressions a tokenizer/phrase-miner should treat as units. A
# min-count floor (>= 5) removes the low-frequency PMI pathology
# (hapax pairs otherwise saturate the top of the ranking). All counts
# integer; pmi is ONE double expression over five integers, so both
# engines feed identical doubles to ROUND; ranked on the rounded
# value with the bigram string as tie-break. Words cannot contain the
# split delimiter, so re-splitting the bigram to its margin words is
# lossless.
# Scale: two grouped counts over the token explode (bigram + unigram),
# then a counts-sized self-join keyed on words — corpus-sized data is
# touched exactly once; the margins relation is vocabulary-sized.
_PMI_TAIL = """
bc AS (SELECT b, COUNT(*) AS cb FROM bigrams GROUP BY b),
nb AS (SELECT SUM(cb) AS n FROM bc),
uc AS (SELECT t, COUNT(*) AS ct FROM toks GROUP BY t),
ut AS (SELECT SUM(ct) AS u FROM uc),
scored AS (
    SELECT bc.b,
           CAST(bc.cb AS BIGINT) AS pair_count,
           ROUND(LN(CAST(bc.cb AS DOUBLE) * ut.u * ut.u
                    / (CAST(nb.n AS DOUBLE) * u1.ct * u2.ct)),
                 9) AS pmi
    FROM bc
    JOIN uc u1 ON u1.t = {w1}
    JOIN uc u2 ON u2.t = {w2}
    CROSS JOIN nb
    CROSS JOIN ut
    WHERE bc.cb >= 5
)
SELECT b AS bigram, pair_count, pmi
FROM scored
ORDER BY pmi DESC, b
LIMIT 25
"""


def _pmi_sql(
    split: str, bgexpr: str, size: str, tok: str, w1: str, w2: str
) -> str:
    return f"""
WITH ws AS (
    SELECT {split}(lower(text), ' ') AS ws
    FROM documents WHERE text IS NOT NULL
),
bigrams AS (
    -- the >= 2 guard is load-bearing on the Spark side: sequence(1, 0)
    -- generates a DESCENDING [1, 0], not an empty array
    SELECT {bgexpr} AS b FROM ws WHERE {size}(ws) >= 2
),
toks AS (SELECT {tok} AS t FROM ws),
{_PMI_TAIL.lstrip().format(w1=w1, w2=w2)}"""


_pair(
    "pmi_bigram_collocations",
    _pmi_sql(
        "split",
        "explode(transform(sequence(1, size(ws) - 1), "
        "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1))))",
        "size",
        "explode(ws)",
        "element_at(split(bc.b, ' '), 1)",
        "element_at(split(bc.b, ' '), 2)",
    ),
    _pmi_sql(
        "string_split",
        "unnest(list_transform(range(1, len(ws)), "
        "i -> ws[i] || ' ' || ws[i + 1]))",
        "len",
        "unnest(ws)",
        "string_split(bc.b, ' ')[1]",
        "string_split(bc.b, ' ')[2]",
    ),
    tags=("text", "pmi", "collocation", "lm-data"),
)


# --- RFM user segmentation -------------------------------------------------------
# Classic recency/frequency/monetary quartile segmentation over the
# event stream — the first model a growth pipeline ships. "Now" is
# the corpus max timestamp (deterministic, house rule); recency is
# whole epoch-days since the user's last event; monetary sums event
# values in exact DECIMAL. Quartiles are NTILE(4) over the fully
# deterministic (metric, user_id) order, so bin membership is
# engine-identical with no percentile-interpolation convention in
# play (same device as the PSI deciles above). R is INVERTED
# (5 - ntile) so that 4 = most recent, matching the F/M polarity
# where 4 = most active / highest spend. Output is the 4x4x4 segment
# grid with its population and value mass — bounded at 64 rows.
# Scale: one grouped aggregate over the event scan (per-user
# sufficient statistics), three NTILE windows over the USER relation
# (users << events), one 64-cell reduce.
_RFM_TAIL = """
per_user AS (
    SELECT user_id,
           MAX(epoch_s) AS last_s,
           COUNT(*) AS freq,
           SUM(CAST(value AS DECIMAL(18, 6))) AS monetary
    FROM base GROUP BY user_id
),
nowts AS (SELECT MAX(last_s) AS now_s FROM per_user),
scored AS (
    SELECT u.user_id,
           -- FLOOR before the cast (Hill-k lesson above): DuckDB
           -- ROUNDS double->bigint casts while Spark TRUNCATES.
           CAST(FLOOR((t.now_s - u.last_s) / 86400.0) AS BIGINT)
               AS recency_days,
           u.freq, u.monetary
    FROM per_user u CROSS JOIN nowts t
),
binned AS (
    SELECT user_id, recency_days, freq, monetary,
           5 - NTILE(4) OVER (ORDER BY recency_days, user_id) AS r_q,
           NTILE(4) OVER (ORDER BY freq, user_id) AS f_q,
           NTILE(4) OVER (ORDER BY monetary, user_id) AS m_q
    FROM scored
)
SELECT CAST(r_q AS INT) AS r_quartile,
       CAST(f_q AS INT) AS f_quartile,
       CAST(m_q AS INT) AS m_quartile,
       COUNT(*) AS n_users,
       CAST(SUM(freq) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(monetary) AS DOUBLE), 6) AS total_value
FROM binned
GROUP BY r_q, f_q, m_q
ORDER BY r_quartile, f_quartile, m_quartile
"""


def _rfm_sql(epoch_s: str) -> str:
    return f"""
WITH base AS (
    SELECT user_id, value, {epoch_s} AS epoch_s FROM events
),
{_RFM_TAIL.lstrip()}"""


_pair(
    "rfm_user_segments",
    _rfm_sql("CAST(unix_timestamp(ts) AS BIGINT)"),
    _rfm_sql("CAST(floor(epoch(ts)) AS BIGINT)"),
    tags=("events", "rfm", "segmentation", "statistics"),
    tables=["events"],
)


# --- Mann-Whitney U rank-sum test (doc lengths, source pairs) --------------------
# Two-sample location test between every pair of ingest sources over
# document lengths — the rank-based complement of the KS statistic
# above (KS alarms on ANY shape difference; U targets a location
# shift). Computed WITHOUT materializing ranks, from the value-count
# grid identity:
#   2*U_a = sum_v  c_a(v) * (2 * cum_b(<v) + c_b(v))
# (each a-observation beats everything of b strictly below it and
# half-ties at its own value — doubled to stay integer). The z-score
# uses the tie-corrected variance
#   var = n_a*n_b/12 * ((n+1) - sum_t(t^3 - t) / (n*(n-1))),
# t = c_a(v)+c_b(v), uncorrected-for-continuity by documented
# convention. EVERYTHING before z is integer arithmetic (DECIMAL(38,0)
# sums — a single dominating value makes t^3 brush int64 at corpus
# scale); z is one double expression. Scale shape: the corpus is
# scanned ONCE into the per-(value, source) count grid; the pair
# fan-out (each grid row lands in |sources|-1 pairs) and the
# cumulative window run on the GRID, which is distinct-value sized,
# not corpus sized.
_MWU_GRID_SQL = """
SELECT source, n_chars AS v, COUNT(*) AS c
FROM documents WHERE n_chars IS NOT NULL
GROUP BY source, n_chars
"""

_MWU_TAIL = """
srcs AS (SELECT DISTINCT source FROM sc),
prs AS (
    SELECT a.source AS sa, b.source AS sb
    FROM srcs a JOIN srcs b ON a.source < b.source
),
pv AS (
    -- two equi-joins + union, NOT a disjunctive join (which would
    -- degrade to a nested-loop product against the grid)
    SELECT sa, sb, v, SUM(ca) AS ca, SUM(cb) AS cb FROM (
        SELECT p.sa, p.sb, g.v, g.c AS ca, 0 AS cb
        FROM prs p JOIN sc g ON g.source = p.sa
        UNION ALL
        SELECT p.sa, p.sb, g.v, 0 AS ca, g.c AS cb
        FROM prs p JOIN sc g ON g.source = p.sb
    ) u
    GROUP BY sa, sb, v
),
cumed AS (
    SELECT sa, sb, v, ca, cb,
           COALESCE(SUM(cb) OVER (PARTITION BY sa, sb ORDER BY v
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0) AS cub
    FROM pv
),
s AS (
    SELECT sa, sb,
           SUM(CAST(ca AS DECIMAL(38, 0))) AS na,
           SUM(CAST(cb AS DECIMAL(38, 0))) AS nb,
           SUM(CAST(ca AS DECIMAL(38, 0)) * (2 * cub + cb)) AS u2,
           SUM(CAST(ca + cb AS DECIMAL(38, 0)) * (ca + cb) * (ca + cb)
               - (ca + cb)) AS t3
    FROM cumed GROUP BY sa, sb
)
SELECT sa AS source_a, sb AS source_b,
       CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       CAST(u2 AS BIGINT) AS u2_a,
       ROUND((CAST(u2 AS DOUBLE) - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
             / NULLIF(2 * SQRT(
                   CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12
                   * ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1)
                      - CAST(t3 AS DOUBLE)
                        / ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                           * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 1)))),
                      0),
             9) AS z_score
FROM s
ORDER BY source_a, source_b
"""

# The Spark side materializes the grid (one corpus scan — Spark
# inlines CTEs, so the two union branches would otherwise each
# re-scan documents); the DuckDB oracle marks it MATERIALIZED for the
# same reason.
_MWU_PREV: dict[str, DataFrame] = {}


def mann_whitney_u_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired-dialect SQL over the materialized (value, source) count
    grid (semantics in the module docstring)."""
    from crypto_lakehouse_spark.io import session_key
    from crypto_lakehouse_spark.operators.checkpointing import (
        release_lineage,
        truncate_lineage,
    )

    register_views(spark, sf_dir, ["documents"])
    grid = truncate_lineage(spark.sql(_MWU_GRID_SQL), spark)
    skey = session_key(spark)
    prev = _MWU_PREV.get(skey)
    if prev is not None:
        release_lineage(prev)
    _MWU_PREV[skey] = grid
    grid.createOrReplaceTempView("mwu_grid_mat")
    return spark.sql(
        "WITH sc AS (SELECT source, v, c FROM mwu_grid_mat),\n" + _MWU_TAIL
    )


query(
    "mann_whitney_u_doc_lengths",
    oracle=(
        "WITH sc AS MATERIALIZED (" + _MWU_GRID_SQL + "),\n" + _MWU_TAIL
    ),
    tags=("statistics", "mann-whitney", "rank-sum", "data-quality"),
)(mann_whitney_u_doc_lengths)


# --- Poisson-bootstrap confidence interval (mean doc length per source) ----------
# The DISTRIBUTED bootstrap: instead of resampling n docs with
# replacement (a global operation), each doc contributes an
# independent Poisson(1) weight to each of B=100 replicas — the
# standard large-n approximation whose replica totals converge to the
# multinomial bootstrap (Chamandy et al., "Estimating Uncertainty for
# Massive Data Streams", Google 2012). Weights are DETERMINISTIC:
# a Knuth-style integer hash of (doc_id, replica) maps to a uniform
# in [0,1) (exact integer arithmetic, identical in both engines),
# inverted through the Poisson(1) CDF as a fixed CASE ladder
# (P(k<=6) covers 0.9999997; the tail is clamped to 7). Replica
# means are integer-sum ratios ROUND(...,9); the 95% interval is the
# 3rd / 98th of the 100 ordered replica means ((floor(alpha*B)+1)-th
# from each end — the deterministic order-statistic convention,
# replica id as tie-break). Scale shape: one corpus scan exploded by
# the CONSTANT B (the bootstrap's honest cost; the explode carries
# only (source, n_chars)), two grouped integer aggregates, one
# 100-row-per-source rank.
_BOOT_SQL = """
WITH reps AS (
    SELECT CAST(r.r AS BIGINT) AS b FROM {range_src} r
),
weighted AS (
    SELECT d.source, d.n_chars, reps.b,
           CASE
               WHEN u < 0.367879441 THEN 0
               WHEN u < 0.735758882 THEN 1
               WHEN u < 0.919698603 THEN 2
               WHEN u < 0.981011843 THEN 3
               WHEN u < 0.996340153 THEN 4
               WHEN u < 0.999405815 THEN 5
               WHEN u < 0.999916758 THEN 6
               ELSE 7
           END AS w
    FROM (
        SELECT source, n_chars, doc_id FROM documents
        WHERE n_chars IS NOT NULL
    ) d
    CROSS JOIN reps
    CROSS JOIN LATERAL (
        SELECT ((d.doc_id * 2654435761 + reps.b * 40503) % 4294967296)
               / 4294967296.0 AS u
    ) h
),
rep_means AS (
    SELECT source, b,
           SUM(w) AS nw,
           ROUND(CAST(SUM(CAST(w AS BIGINT) * n_chars) AS DOUBLE)
                 / SUM(w), 9) AS m
    FROM weighted
    GROUP BY source, b
    HAVING SUM(w) > 0
),
ranked AS (
    SELECT source, m,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY m, b) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS nb
    FROM rep_means
),
full_mean AS (
    SELECT source, COUNT(*) AS n_docs,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 9) AS mean_len
    FROM documents WHERE n_chars IS NOT NULL
    GROUP BY source
)
SELECT f.source,
       CAST(f.n_docs AS BIGINT) AS n_docs,
       f.mean_len,
       lo.m AS ci_lo,
       hi.m AS ci_hi
FROM full_mean f
JOIN ranked lo ON lo.source = f.source AND lo.rn = 3
JOIN ranked hi ON hi.source = f.source AND hi.rn = lo.nb - 2
ORDER BY f.source
"""

_pair(
    "poisson_bootstrap_ci_doclen",
    _BOOT_SQL.format(
        range_src="(SELECT explode(sequence(0, 99)) AS r)"
    ),
    _BOOT_SQL.format(range_src="(SELECT unnest(range(0, 100)) AS r)"),
    tags=("statistics", "bootstrap", "confidence-interval", "data-quality"),
)


# --- classifier calibration bins + Brier score -----------------------------------
# Reliability diagram for the hashed linear quality classifier
# (curation_ops.hashed_classifier_score): score mapped to a [0,1)
# probability proxy p = (mean_w + 1) / 2, binned into 10 equal-width
# cells; per cell the mean predicted p vs the observed positive rate
# (label = English), plus the overall Brier score repeated per row
# (hash-pinned). Both engines compute p from the SAME integer
# (score_num, n_tok) pair, so the double and its bin are
# bit-identical; per-row Brier terms are ROUND(...,12)-then-DECIMAL
# summed. Scale: one corpus scan with a higher-order-fold score, one
# 10-cell grouped aggregate.
_CALIB_TAIL = """
scored AS (
    SELECT doc_id,
           (CAST(score_num AS DOUBLE) / (2048.0 * n_tok) + 1) / 2 AS p,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
    FROM raw WHERE n_tok > 0
),
binned AS (
    SELECT LEAST(CAST(floor(p * 10) AS INT), 9) AS bin, p, y,
           CAST(ROUND((p - y) * (p - y), 12) AS DECIMAL(18, 12)) AS bt
    FROM scored
),
cells AS (
    SELECT bin, COUNT(*) AS n, SUM(y) AS pos,
           CAST(ROUND(p, 12) AS DECIMAL(18, 12)) AS pr
    FROM (SELECT bin, p, y FROM binned) b
    GROUP BY bin, CAST(ROUND(p, 12) AS DECIMAL(18, 12))
),
agg AS (
    SELECT bin, SUM(n) AS n, SUM(pos) AS pos,
           SUM(pr * n) AS sp
    FROM cells GROUP BY bin
),
brier AS (
    SELECT CAST(SUM(bt) AS DOUBLE) / COUNT(*) AS b FROM binned
)
SELECT CAST(a.bin AS INT) AS bin,
       CAST(a.n AS BIGINT) AS n_docs,
       ROUND(CAST(a.sp AS DOUBLE) / a.n, 9) AS mean_predicted,
       ROUND(CAST(a.pos AS DOUBLE) / a.n, 9) AS observed_positive_rate,
       ROUND(br.b, 9) AS brier_score
FROM agg a CROSS JOIN brier br
ORDER BY bin
"""


def _calib_sql(size_fn: str, split_fn: str, agg_expr: str) -> str:
    return f"""
WITH raw AS (
    SELECT doc_id, lang, {size_fn}(ws) AS n_tok,
           {agg_expr} AS score_num
    FROM (SELECT doc_id, lang, {split_fn}(text, ' ') AS ws
          FROM documents WHERE text IS NOT NULL)
),
{_CALIB_TAIL.lstrip()}"""


_W_SPARK_CAL = (
    "(CAST(conv(substr(md5(t), 1, 4), 16, 10) AS BIGINT) % 1024) "
    "* 2654435761 % 4096 - 2048"
)
_W_DUCK_CAL = (
    "(CAST(('0x' || substr(md5(t), 1, 4)) AS BIGINT) % 1024) "
    "* 2654435761 % 4096 - 2048"
)

_pair(
    "score_calibration_bins",
    _calib_sql(
        "size",
        "split",
        f"aggregate(ws, 0L, (acc, t) -> acc + ({_W_SPARK_CAL}))",
    ),
    _calib_sql(
        "len",
        "string_split",
        f"CAST(list_sum(list_transform(ws, t -> ({_W_DUCK_CAL}))) AS BIGINT)",
    ),
    tags=("statistics", "calibration", "brier", "quality-eval"),
)


# --- bigram conditional entropy per source ---------------------------------------
# H(w2 | w1) = -sum_{w1,w2} p(w1,w2) * ln(p(w2|w1)) in bits — the
# predictability-of-next-token number that sits next to the JS and MI
# diagnostics: near-zero means templated text (every token determines
# its successor), near the unigram entropy means token order carries
# no signal. Integer bigram/left-margin counts; each term is one
# double expression ROUND(...,12)-then-DECIMAL summed per source;
# /ln(2) at emission. Scale: one bigram explode + two grouped counts,
# then a counts-sized join keyed on (source, w1).
# Split at the bc boundary so the Spark fn can swap the bc CTE for a
# materialized view while the oracle keeps the single statement.
_CONDENT_AFTER_BC = """
lc AS (SELECT source, w1, SUM(c) AS cw FROM bc GROUP BY source, w1),
nt AS (SELECT source, SUM(c) AS n FROM bc GROUP BY source),
terms AS (
    SELECT bc.source,
           CAST(ROUND(
               -(CAST(bc.c AS DOUBLE) / nt.n)
               * LN(CAST(bc.c AS DOUBLE) / lc.cw),
               12) AS DECIMAL(18, 12)) AS term
    FROM bc
    JOIN lc ON lc.source = bc.source AND lc.w1 = bc.w1
    JOIN nt ON nt.source = bc.source
)
SELECT t.source,
       CAST(n.n AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(t.term) AS DOUBLE) / LN(2), 9)
           AS cond_entropy_bits
FROM terms t JOIN nt n ON n.source = t.source
GROUP BY t.source, n.n
ORDER BY t.source
"""


def _condent_sql(split: str, bgexpr: str, size: str) -> str:
    return f"""
WITH ws AS (
    SELECT source, {split}(lower(text), ' ') AS ws
    FROM documents WHERE text IS NOT NULL
),
bigrams AS (
    SELECT source, {bgexpr} FROM ws WHERE {size}(ws) >= 2
),
bc AS (SELECT source, w1, w2, COUNT(*) AS c FROM bigrams
       GROUP BY source, w1, w2),
{_CONDENT_AFTER_BC.lstrip()}"""


_CONDENT_PREV: dict[str, DataFrame] = {}


def _condent_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional entropy per source (block comment above).
    r13 optimization round: the inlined `bc` CTE was re-executed by
    every consumer (lc, nt x2, terms — 4 bigram explode+count passes,
    8 documents scans in the before-plan); the Spark side now
    materializes bc once and derives the margins from the view.
    Unchanged DuckDB oracle proves equivalence."""
    from crypto_lakehouse_spark.io import session_key
    from crypto_lakehouse_spark.operators.checkpointing import (
        release_lineage,
        truncate_lineage,
    )

    register_views(spark, sf_dir, ["documents"])
    bc = truncate_lineage(
        spark.sql(
            """
SELECT source, w1, w2, COUNT(*) AS c FROM (
    SELECT source,
           inline(transform(sequence(1, size(ws) - 1),
               i -> struct(element_at(ws, i) AS w1,
                           element_at(ws, i + 1) AS w2)))
    FROM (SELECT source, split(lower(text), ' ') AS ws
          FROM documents WHERE text IS NOT NULL)
    WHERE size(ws) >= 2
) GROUP BY source, w1, w2"""
        ),
        spark,
    )
    bc.createOrReplaceTempView("condent_bc_mat")
    skey = session_key(spark)
    prev = _CONDENT_PREV.pop(skey, None)
    if prev is not None:
        release_lineage(prev)
    _CONDENT_PREV[skey] = bc
    return spark.sql(
        "WITH bc AS (SELECT source, w1, w2, c FROM condent_bc_mat),\n"
        + _CONDENT_AFTER_BC.lstrip()
    )


_condent_fn.__name__ = "bigram_conditional_entropy"
query(
    "bigram_conditional_entropy",
    oracle=_condent_sql(
        "string_split",
        "unnest(list_transform(range(1, len(ws)), "
        "i -> {'w1': ws[i], 'w2': ws[i + 1]}), recursive := true)",
        "len",
    ),
    tags=("text", "entropy", "information", "data-quality"),
)(_condent_fn)


# --- daily event-volume MAD outliers ----------------------------------------------
# Robust anomaly detection on the ops counter every pipeline watches:
# daily event counts per type, scored by the modified z-score
# 0.6745 * (x - median) / MAD (Iglewicz-Hoaglin), flagged at
# |z| > 3.5 — the same estimator family as embedding_norm_mad_outliers
# but over the TIME axis, where a spike means an ingest incident.
# Median and MAD use the deterministic lower-median convention
# (position (n+1) DIV 2 under a (value, day) total order — no
# interpolation); counts are integers; one double expression per
# emitted row. Scale: one grouped count, two ranks over the
# days-per-type relation (365 rows/year per type).
_MAD_EVENTS_SQL = """
WITH daily AS (
    SELECT event_type,
           CAST(floor({epoch} / 86400.0) AS BIGINT) AS d,
           COUNT(*) AS c
    FROM events GROUP BY event_type, CAST(floor({epoch} / 86400.0) AS BIGINT)
),
med AS (
    SELECT event_type, c AS median_c FROM (
        SELECT event_type, c,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY c, d) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ) r WHERE rn = (n + 1) {intdiv} 2
),
dev AS (
    SELECT dl.event_type, dl.d, dl.c, m.median_c,
           ABS(dl.c - m.median_c) AS ad
    FROM daily dl JOIN med m ON m.event_type = dl.event_type
),
mad AS (
    SELECT event_type, ad AS mad_c FROM (
        SELECT event_type, ad,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ad, d) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM dev
    ) r WHERE rn = (n + 1) {intdiv} 2
),
scored AS (
    SELECT d.event_type, d.d, d.c, d.median_c,
           -- explicit DOUBLE: a bare 0.6745 literal is DECIMAL in
           -- both engines with DIFFERENT division scale rules
           CAST(0.6745 AS DOUBLE) * (d.c - d.median_c)
               / NULLIF(m.mad_c, 0) AS z
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    WHERE m.mad_c > 0
)
-- top-3 |z| days per type are ALWAYS emitted (a small fixture has no
-- 3.5-sigma day and a 0-row result is a weak oracle); the flag keeps
-- the alarm threshold in the hashed output.
SELECT event_type,
       CAST(d AS BIGINT) AS epoch_day,
       CAST(c AS BIGINT) AS n_events,
       CAST(median_c AS BIGINT) AS median_daily,
       ROUND(z, 9) AS modified_z,
       CASE WHEN ABS(z) > 3.5 THEN 1 ELSE 0 END AS is_outlier
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY ABS(z) DESC, d) AS rn
    FROM scored
) r WHERE rn <= 3
ORDER BY event_type, epoch_day
"""

_pair(
    "event_volume_mad_outliers",
    _MAD_EVENTS_SQL.format(
        epoch="unix_timestamp(ts)", intdiv="DIV"
    ),
    _MAD_EVENTS_SQL.format(epoch="epoch(ts)", intdiv="//"),
    tags=("events", "anomaly", "mad", "robust"),
    tables=["events"],
)


# --- bigram overlap precision per source (self-BLEU-style diversity) -------------
# For each source: modified bigram precision of its token stream
# against the REST of the corpus as reference —
# P_s = sum_b min(c_s(b), c_rest(b)) / sum_b c_s(b) — the self-BLEU
# idea specialized to order-2. High P_s means the source repeats
# corpus phrasing (template flood / mirror of another feed); low P_s
# means it contributes novel continuations. distinct_ratio (types /
# tokens over bigrams) rides along as the within-source diversity
# number. All-integer counts; two double divisions at emission.
# Scale: one bigram explode, one grouped count, one counts-sized join
# keyed on the bigram (rest counts derived as total - own, so the
# corpus grid is built once).
_SELF_BLEU_TAIL = """
bc AS (SELECT source, b, COUNT(*) AS c FROM bigrams GROUP BY source, b),
tb AS (SELECT b, SUM(c) AS ctot FROM bc GROUP BY b),
s AS (
    SELECT bc.source,
           SUM(bc.c) AS n_bigrams,
           COUNT(*) AS n_distinct,
           SUM(LEAST(bc.c, tb.ctot - bc.c)) AS n_matched
    FROM bc JOIN tb ON tb.b = bc.b
    GROUP BY bc.source
)
SELECT source,
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(n_distinct AS BIGINT) AS n_distinct_bigrams,
       ROUND(CAST(n_matched AS DOUBLE) / n_bigrams, 9)
           AS overlap_precision,
       ROUND(CAST(n_distinct AS DOUBLE) / n_bigrams, 9)
           AS distinct_ratio
FROM s
ORDER BY source
"""


def _self_bleu_sql(split: str, bgexpr: str, size: str) -> str:
    return f"""
WITH ws AS (
    SELECT source, {split}(lower(text), ' ') AS ws
    FROM documents WHERE text IS NOT NULL
),
bigrams AS (
    SELECT source, {bgexpr} AS b FROM ws WHERE {size}(ws) >= 2
),
{_SELF_BLEU_TAIL.lstrip()}"""


_pair(
    "bigram_overlap_precision_by_source",
    _self_bleu_sql(
        "split",
        "explode(transform(sequence(1, size(ws) - 1), "
        "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1))))",
        "size",
    ),
    _self_bleu_sql(
        "string_split",
        "unnest(list_transform(range(1, len(ws)), "
        "i -> ws[i] || ' ' || ws[i + 1]))",
        "len",
    ),
    tags=("text", "self-bleu", "diversity", "data-quality"),
)


# --- one-way ANOVA F (event value by weekday) ------------------------------------
# The continuous-response companion to chi_square_type_weekday:
# F = (SSB / (k-1)) / (SSW / (n-k)) over event values grouped by
# epoch-day weekday, computed from per-group sufficient statistics
# only — SSB = sum_g n_g*(m_g - m)^2 and SSW = sum_g (ss_g - n_g*m_g^2)
# need just (n_g, sum_g, sumsq_g), so the corpus is scanned ONCE and
# everything after is a 7-row reduce. Values are ROUND(9)-stabilized
# DECIMAL(15,9) first; sums and sums of squares are exact decimal
# (the (15,9)x(15,9) product is exact at scale 18); F and eta^2 are
# single double expressions at emission.
_ANOVA_TAIL = """
g AS (
    SELECT wd, COUNT(*) AS n,
           SUM(v) AS s,
           SUM(v * v) AS ss
    FROM base GROUP BY wd
),
tot AS (
    SELECT SUM(n) AS n, SUM(s) AS s, SUM(ss) AS ss, COUNT(*) AS k
    FROM g
),
terms AS (
    -- ROUND(...,12)-then-DECIMAL per group BEFORE the 7-term sum:
    -- a raw double SUM's accumulation order is engine-specific and
    -- moved the 9th decimal (found live at sf0.001).
    SELECT CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 12)
                AS DECIMAL(28, 12)) AS gsq
    FROM g
),
parts AS (
    SELECT t.k, t.n,
           CAST(tm.gs AS DOUBLE)
               - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n AS ssb,
           CAST(t.ss AS DOUBLE) - CAST(tm.gs AS DOUBLE) AS ssw
    FROM (SELECT SUM(gsq) AS gs FROM terms) tm CROSS JOIN tot t
)
SELECT CAST(k AS INT) AS n_groups,
       CAST(n AS BIGINT) AS n_events,
       -- ROUND(...,6), not 9: the sums carry ~14 significant digits,
       -- where the engines' decimal->double conversions can differ by
       -- an ulp that a 9-decimal round still exposes at this
       -- magnitude (found live at sf0.001).
       ROUND(ssb, 6) AS ss_between,
       ROUND(ssw, 6) AS ss_within,
       ROUND((ssb / (k - 1)) / NULLIF(ssw / (n - k), 0), 9) AS f_stat,
       ROUND(ssb / NULLIF(ssb + ssw, 0), 9) AS eta_squared
FROM parts
"""


def _anova_sql(epoch: str) -> str:
    return f"""
WITH base AS (
    SELECT CAST(floor({epoch} / 86400.0) AS BIGINT) % 7 AS wd,
           CAST(ROUND(value, 9) AS DECIMAL(15, 9)) AS v
    FROM events WHERE value IS NOT NULL
),
{_ANOVA_TAIL.lstrip()}"""


_pair(
    "anova_value_by_weekday",
    _anova_sql("unix_timestamp(ts)"),
    _anova_sql("epoch(ts)"),
    tags=("events", "anova", "statistics", "seasonality"),
    tables=["events"],
)


# --- Benford first-digit census ----------------------------------------------
# The classic anomaly/quality diagnostic: the first significant digit
# of naturally-occurring positive amounts follows log10(1 + 1/d);
# systematic deviation flags synthetic, truncated, or manipulated
# values. Digit extraction avoids engine-variant LOG10 edge behavior
# entirely: the value is shifted to an exact integer (floor(v*100 +
# 0.5) — the corpus stores 2-decimal amounts) and the leading digit
# read off its STRING form, so both engines agree bit-for-bit. The
# Benford expectations are Python-precomputed literals (identical
# text in both dialects, no constant-folding drift), per-digit rows
# carry observed vs expected fractions, and the chi-square statistic
# is summed over DECIMAL-quantized per-digit contributions (exact,
# order-free) before the final double cast. One scan, 9-group
# aggregate, map-side combined.

_BENFORD_SQL = """
WITH expect(d, p) AS (VALUES
    (1, CAST(0.301029995664 AS DOUBLE)),
    (2, CAST(0.176091259056 AS DOUBLE)),
    (3, CAST(0.124938736608 AS DOUBLE)),
    (4, CAST(0.096910013008 AS DOUBLE)),
    (5, CAST(0.079181246048 AS DOUBLE)),
    (6, CAST(0.066946789631 AS DOUBLE)),
    (7, CAST(0.057991946978 AS DOUBLE)),
    (8, CAST(0.051152522447 AS DOUBLE)),
    (9, CAST(0.045757490561 AS DOUBLE))
),
digits AS (
    SELECT CAST(substring(CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                               AS STRING), 1, 1) AS INT) AS d
    FROM events WHERE value IS NOT NULL AND value > 0
),
obs AS (
    SELECT d, COUNT(*) AS n FROM digits GROUP BY d
),
tot AS (SELECT SUM(n) AS total FROM obs),
per AS (
    SELECT e.d,
           COALESCE(o.n, 0) AS n,
           t.total,
           e.p,
           CAST(COALESCE(o.n, 0) AS DOUBLE) / t.total AS f_obs,
           CAST(ROUND(
               (COALESCE(o.n, 0) - t.total * e.p)
               * (COALESCE(o.n, 0) - t.total * e.p)
               / (t.total * e.p), 9) AS DECIMAL(28, 9)) AS chi_part
    FROM expect e
    LEFT JOIN obs o ON o.d = e.d
    CROSS JOIN tot t
)
SELECT d AS digit,
       CAST(n AS BIGINT) AS n_values,
       ROUND(f_obs, 9) AS observed_frac,
       ROUND(p, 9) AS benford_frac,
       ROUND(f_obs - p, 9) AS excess,
       CAST((SELECT CAST(SUM(chi_part) AS DOUBLE) FROM per) AS DOUBLE)
           AS chi_square_total
FROM per
ORDER BY digit
"""

_pair(
    "benford_digit_census",
    _BENFORD_SQL.replace("AS STRING", "AS STRING"),
    _BENFORD_SQL.replace("AS STRING", "AS VARCHAR"),
    tags=("events", "statistics", "benford", "quality"),
    tables=["events"],
)
