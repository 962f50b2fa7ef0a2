"""Differential tests: every registered query vs its DuckDB oracle
(the same comparison the driver's t2 gate runs, at sf0.001 for speed;
set SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 for the full-size run).
"""

from __future__ import annotations

import pytest

from crypto_lakehouse_spark import queries as qmod
from crypto_lakehouse_spark.oracle import compare
from crypto_lakehouse_spark.queries.registry import REGISTRY

qmod.load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name: str, spark, sf_dir: str):
    res = compare(REGISTRY[name], spark, sf_dir)
    assert res.ok, res.detail


def test_every_query_has_doc():
    for q in REGISTRY.values():
        assert q.doc, f"{q.name} lacks a docstring"
