"""NULL-payload robustness: rows with NULL text / NULL embedding /
NULL props must flow through every operator under a DEFINED contract,
never crash a kernel.

Real corpora carry them (failed extraction, empty crawl record,
missing modality). The SQL paths already behave: NULL propagates
through split/transform/fold expressions and the row drops out or
carries NULL. The round-8 sweep found the Arrow/numpy kernels did
NOT mirror that — np.stack over a None vector raises, bytes(None)
raises, set(None) raises. The contract each fix encodes, mirrored in
the DuckDB oracles so the twins stay hash-equal even on NULL-bearing
data:

- vector kernels (semdedup family, contamination_semantic): a NULL
  embedding cannot participate — excluded via `embedding IS NOT NULL`
  in BOTH engines.
- quality scoring (SQL + pandas twin): NULL text is unscoreable —
  excluded via `text IS NOT NULL` in both twins and the shared oracle.
- embedding_norms_pandas: NULL in, NULL out — the pandas kernel
  propagates None exactly like the oracle's list_reduce-over-NULL.
- multimodal blob derivation (attach_blobs): a NULL-text document has
  no media — excluded at attach and in every consuming oracle
  (attach_token_histogram_blobs already treated None as "").
"""

from __future__ import annotations

import pytest

from crypto_lakehouse_spark import queries as qmod
from crypto_lakehouse_spark.queries.registry import REGISTRY

qmod.load_all()

# The 8 round-8 NULL crashers + SQL-twin controls proving both sides
# of each shared oracle agree on the contract.
NULL_SAFE_QUERIES = [
    "semdedup_clustered",
    "semdedup_hierarchical",
    "contamination_semantic",
    "doc_quality_score",
    "doc_quality_score_pandas",
    "embedding_norms_pandas",
    "multimodal_decode_resize",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_ahash_near_dup",
    "embedding_cosine_topk",
    "doc_token_stats",
    # round-11 additions — all twelve also HASH-MATCH their oracles on
    # the null fixture (differentially swept before listing; e.g.
    # kmeans_converged drops the NULLed seed and converges to 3
    # clusters identically in both engines)
    "kmeans_converged",
    "nn_descent_converged",
    "bpe_train_iterated",
    "url_canonical_dedup",
    "host_dup_census",
    "pii_regex_census",
    "pii_redact_stats",
    "countmin_sketch_error",
    "jl_projection_distortion",
    "stratified_kfold_assignment",
    "contrastive_negatives_mine",
    "html_strip_extract",
    # round-12 additions — all three also HASH-MATCH their oracles on
    # the null fixture (differentially swept before listing): NULL
    # text drops at the length filter (bpb, doremi); NULL n_chars
    # flows through SUM/share identically in both engines (gating)
    "compression_bpb_census",
    "robots_license_gating",
    "doremi_one_step",
    "encoding_hygiene_census",  # NULL text drops at the seed filter
    "bpe_fertility_census",  # NULL text drops at the length filter
    "coreset_kcenter_greedy",  # NULL embedding excluded at the scan
    "kmeans_simplified_silhouette",  # NULL embedding excluded; NULLed
    # seed drops to 3 clusters identically in both engines
    "rho_excess_loss_selection",  # NULL text drops at the length filter
    "temperature_mixture_weights",  # NULL text drops at the seed filter
]


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory) -> str:
    """sf0.001 with every 7th row's payload column NULLed (text,
    embedding, props); keys and dimensions intact."""
    import duckdb

    out = tmp_path_factory.mktemp("sf_null")
    con = duckdb.connect()
    src = "/root/testdata/sf0.001"
    con.execute(
        f"COPY (SELECT * REPLACE ("
        f"CASE WHEN doc_id % 7 = 3 THEN NULL ELSE text END AS text, "
        f"CASE WHEN doc_id % 7 = 3 THEN NULL ELSE n_chars END AS n_chars)"
        f" FROM read_parquet('{src}/documents.parquet'))"
        f" TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * REPLACE ("
        f"CASE WHEN vec_id % 7 = 3 THEN NULL ELSE embedding END AS embedding)"
        f" FROM read_parquet('{src}/embeddings.parquet'))"
        f" TO '{out}/embeddings.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * REPLACE ("
        f"CASE WHEN event_id % 7 = 3 THEN NULL ELSE props END AS props)"
        f" FROM read_parquet('{src}/events.parquet'))"
        f" TO '{out}/events.parquet' (FORMAT PARQUET)"
    )
    for t in "region nation customer supplier part orders lineitem".split():
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
            f" TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(out)


@pytest.mark.parametrize("name", NULL_SAFE_QUERIES)
def test_query_survives_null_payloads(spark, null_sf_dir, name):
    rows = REGISTRY[name].spark_fn(spark, null_sf_dir).collect()
    assert rows is not None  # contract: defined result, no kernel crash


def test_null_embedding_norm_propagates(spark, null_sf_dir):
    """The pandas twin mirrors SQL NULL propagation: NULL embedding ->
    row present with NULL l2_norm (not dropped, not a crash)."""
    out = {
        r["vec_id"]: r["l2_norm"]
        for r in REGISTRY["embedding_norms_pandas"]
        .spark_fn(spark, null_sf_dir)
        .collect()
    }
    nulled = [v for v in out if v % 7 == 3]
    assert nulled and all(out[v] is None for v in nulled)
    assert all(out[v] is not None for v in out if v % 7 != 3)
