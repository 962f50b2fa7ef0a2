"""Focused tests for registry._strip_trailing_sort (r13 optimization
round): the executed plan of a registered query drops exactly one
top-level presentation ORDER BY, result SETS are unchanged, top-k
sorts survive, and the kill-switch restores ordered output."""

from __future__ import annotations

import os

import pytest

from crypto_lakehouse_spark import queries as qmod
from crypto_lakehouse_spark.queries.registry import (
    REGISTRY,
    _strip_trailing_sort,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    qmod.load_all()


def _top(df) -> str:
    return df._jdf.queryExecution().logical().getClass().getSimpleName()


def test_plain_sort_is_stripped(spark):
    # doc_normalize's declared SQL ends in ORDER BY doc_id with no CTE.
    df = REGISTRY["doc_normalize"].spark_fn(spark, SF)
    assert _top(df) != "Sort"
    assert "Sort" not in df._jdf.queryExecution().executedPlan().toString()


def test_cte_wrapped_sort_is_stripped(spark):
    # unimax_mixture_weights parses to UnresolvedWith(Sort(...)).
    df = REGISTRY["unimax_mixture_weights"].spark_fn(spark, SF)
    lp = df._jdf.queryExecution().logical()
    assert lp.getClass().getSimpleName() == "UnresolvedWith"
    assert lp.child().getClass().getSimpleName() != "Sort"


def test_result_set_identical_to_kept_sort(spark):
    name = "gopher_quality_rules"
    stripped = REGISTRY[name].spark_fn(spark, SF).collect()
    os.environ["SPARK_GRAFT_KEEP_FINAL_SORT"] = "1"
    try:
        kept = REGISTRY[name].spark_fn(spark, SF).collect()
    finally:
        del os.environ["SPARK_GRAFT_KEEP_FINAL_SORT"]
    assert sorted(map(tuple, stripped)) == sorted(map(tuple, kept))
    assert len(kept) > 0


def test_kill_switch_keeps_the_sort(spark):
    os.environ["SPARK_GRAFT_KEEP_FINAL_SORT"] = "1"
    try:
        df = REGISTRY["doc_normalize"].spark_fn(spark, SF)
        assert _top(df) == "Sort"
    finally:
        del os.environ["SPARK_GRAFT_KEEP_FINAL_SORT"]


def test_topk_limit_keeps_its_sort(spark):
    # q3_shipping_priority ends ORDER BY ... LIMIT 10: the Sort decides
    # WHICH rows survive and must never be elided.
    df = REGISTRY["q3_shipping_priority"].spark_fn(spark, SF)
    lp = df._jdf.queryExecution().logical()
    assert lp.getClass().getSimpleName() == "GlobalLimit"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan or "Sort" in plan


def test_strip_is_identity_on_sortless_frames(spark):
    df = spark.range(5)
    assert _strip_trailing_sort(df) is df
