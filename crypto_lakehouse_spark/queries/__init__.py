"""Query registry — every SURVEY §2 operator (and the extended
large-scale data-pipeline surface) is registered here as a named
(spark_fn, oracle_sql) pair for differential correctness checking.

Registration ORDER matters: the driver's correctness gate checks the
first 50 queries in registration order each round. `load_all()`
therefore reorders the registry after import so that queries WITHOUT a
driver-green row in any past `CORRECTNESS_r*.json` come first (in a
curated family-coverage order — at least one flagship per operator
family in the window), and already-verified queries rotate to the
back. Every registered query earns a driver-green row within
ceil(unverified/50) rounds, with zero manual bookkeeping: drop a new
round's CORRECTNESS file in the repo root and the next load reorders.
"""

from __future__ import annotations

import glob
import json
import os

from crypto_lakehouse_spark.queries.registry import REGISTRY, Query, query  # noqa: F401

# Curated priority for the never-verified set: covers every operator
# family (streaming S1/S3/T1-T8, dedup, similarity, text, trainprep,
# sampling, events, UDF/Arrow surface, json/variant, multimodal) inside
# the driver's 50-query window. Names absent from this list keep their
# registration order after the listed ones.
_PRIORITY = [
    # fixed round-1 reds — must re-earn green first
    "silver_stats",
    "q12_priority_by_band",
    # streaming family (S1/S3/T1-T8)
    "streaming_window_counts",
    "streaming_watermarked_counts",
    "stream_ingest_bronze",
    "streaming_dedup_counts",
    "streaming_dedup_within_watermark",
    "streaming_stream_stream_join",
    # dedup flagships
    "doc_exact_dedup",
    "minhash_lsh_dedup",
    "simhash_fingerprints",
    "dup_clusters_cc",
    "levenshtein_blocked_linkage",
    "ngram_jaccard_prefix_filtered",
    # similarity / ANN / embedding
    "embedding_cosine_topk",
    "embedding_lsh_buckets",
    "embedding_ivf_topk",
    "ann_recall_at_5",
    "kmeans_one_step",
    "int8_quantization_error",
    # text analysis
    "doc_token_stats",
    "doc_quality_score",
    "doc_langid",
    "doc_chunk_windows",
    "doc_fingerprint_winnow",
    # training-data prep
    "contamination_4gram",
    "boilerplate_4gram_fraction",
    "pack_concat_chunks",
    "domain_mixture_resample",
    "intra_doc_repetition",
    # sampling / statistics
    "deterministic_split",
    "stratified_sample_docs",
    "percentile_cont_events",
    # events / time-series
    "salted_event_counts",
    "asof_join_purchase_click",
    "sessionization",
    "range_join_click_purchase",
    # UDF / Arrow escape hatches
    "embedding_norms_pandas",
    "geomean_value_pandas_udaf",
    "props_entries_udtf",
    "source_profile_arrow",
    # multimodal
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_decode_resize",
    # semi-structured + oracle-cast fixes needing fresh green rows
    "props_map_entries",
    "props_variant_stats",
    "regexp_extract_numbers",
    "recursive_amortization",
    # lakehouse write-path checks (S4/S5/S7/J4 driver rows)
    "merge_upsert_result",
    "medallion_gold_ohlcv",
    # rotate in when slots remain (family coverage already in window)
    "embedding_near_dup",
    "twap_hourly",
    "zorder_morton_cells",
    "doc_quality_score_pandas",
]

# Verified-in-a-past-round queries that still deserve a fresh driver
# row THIS round, ahead of the long verified tail: the set broken (or
# last checked before) the round-3 testdata regeneration — their old
# green rows predate the current physical encoding (VERDICT r3 §8).
_RECHECK = [
    "twap_hourly",
    "zorder_morton_cells",
    "streaming_window_counts",
    "streaming_watermarked_counts",
    "streaming_stream_stream_join",
    "streaming_dedup_counts",
    "streaming_dedup_within_watermark",
    "stream_ingest_bronze",
    "price_latest",
    "incremental_lookback",
    "collect_order_statuses",
    "date_funcs_orders",
]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _driver_verified() -> set[str]:
    """Names with a green row in any past driver CORRECTNESS file.

    Green = rows+schema matched and the value hash (when checked) did
    not fail. Files are the driver's per-round records at the repo
    root; unreadable files are ignored.
    """
    verified: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            ok = (
                rec.get("err") is None
                and rec.get("rows_match") is True
                and rec.get("schema_match") is not False
                and rec.get("hash_match") is not False
            )
            if ok:
                verified.add(name)
    return verified


def _reorder() -> None:
    """Rebuild REGISTRY insertion order: unverified first (curated
    priority, then original order), then the regeneration re-check
    tier, then the verified tail (original order)."""
    verified = _driver_verified()
    original = list(REGISTRY)
    rank = {n: i for i, n in enumerate(_PRIORITY)}
    unverified = [n for n in original if n not in verified]
    unverified.sort(key=lambda n: (rank.get(n, len(_PRIORITY)), original.index(n)))
    recheck = [n for n in _RECHECK if n in verified and n in REGISTRY]
    tail = [n for n in original if n in verified and n not in recheck]
    ordered = unverified + recheck + tail
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    for n in ordered:
        REGISTRY[n] = snapshot[n]


def load_all() -> None:
    """Import all query modules so their @query decorators register,
    then put never-driver-verified queries in the front window."""
    import crypto_lakehouse_spark.queries.reference_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.relational  # noqa: F401
    import crypto_lakehouse_spark.queries.tpch_ext  # noqa: F401
    import crypto_lakehouse_spark.queries.text_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.dedup_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.similarity_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.streaming_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.events_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.multimodal_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.pipeline_ext  # noqa: F401
    import crypto_lakehouse_spark.queries.scale_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.breadth_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.sampling_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.udf_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.trainprep_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.lakehouse_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.formats_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.lmdata_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.graph_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.curation_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.ta_ops  # noqa: F401
    import crypto_lakehouse_spark.queries.statfit_ops  # noqa: F401
    _reorder()
