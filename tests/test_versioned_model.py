"""Property-based model check for the VersionedTable DML surface.

A random sequence of append / merge / update / delete / restore /
compact ops runs against BOTH the table and a plain in-memory dict
model; after every op the table's visible rows must equal the model,
and a randomly chosen historical version must still read back exactly
as it was committed (snapshot immutability). This machine-explores
op-interleavings no example-based test enumerates — the storage
layer's equivalent of the oracle differential.

Bounded tightly (each op is a real Spark job): a handful of short
sequences per run, deterministic seed via hypothesis' DB-less
settings.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    initialize,
    invariant,
    precondition,
    rule,
)

from crypto_lakehouse_spark.pipeline.versioned import VersionedTable

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.integers(min_value=-50, max_value=50)


@pytest.fixture(scope="module")
def model_spark(spark):
    return spark


def make_machine(spark, tmpdir):
    class VersionedTableMachine(RuleBasedStateMachine):
        def __init__(self):
            super().__init__()
            import uuid

            self.t = VersionedTable(
                spark, f"{tmpdir}/t-{uuid.uuid4().hex[:8]}"
            )
            self.model: dict[int, int] = {}
            self.snapshots: list[dict[int, int]] = []

        def _df(self, rows):
            return spark.createDataFrame(rows, "k BIGINT, v BIGINT")

        def _record(self):
            self.snapshots.append(dict(self.model))

        @initialize(rows=st.dictionaries(KEYS, VALS, min_size=1, max_size=4))
        def init_table(self, rows):
            self.t.overwrite(self._df(list(rows.items())))
            self.model = dict(rows)
            self._record()

        @rule(rows=st.dictionaries(KEYS, VALS, min_size=1, max_size=3))
        def merge(self, rows):
            self.t.merge(self._df(list(rows.items())), keys=["k"])
            self.model.update(rows)
            self._record()

        @rule(k=KEYS)
        def delete_key(self, k):
            stats = self.t.delete(f"k = {k}")
            existed = k in self.model
            self.model.pop(k, None)
            assert stats["skipped"] == (not existed)
            if not stats["skipped"]:
                self._record()

        @rule(k=KEYS, dv=st.integers(min_value=1, max_value=5))
        def update_key(self, k, dv):
            stats = self.t.update(f"k = {k}", set={"v": f"v + {dv}"})
            existed = k in self.model
            if existed:
                self.model[k] += dv
            assert stats["skipped"] == (not existed)
            if not stats["skipped"]:
                self._record()

        @precondition(lambda self: len(self.snapshots) >= 2)
        @rule(data=st.data())
        def restore(self, data):
            idx = data.draw(
                st.integers(0, len(self.snapshots) - 1), label="version"
            )
            self.t.restore(idx)
            self.model = dict(self.snapshots[idx])
            self._record()

        @rule()
        def compact(self):
            self.t.compact()
            self._record()  # contents unchanged, but a version is minted

        @invariant()
        def table_matches_model(self):
            if self.t.current_version() is None:
                return
            got = {r.k: r.v for r in self.t.read().collect()}
            assert got == self.model

        @invariant()
        def history_is_immutable(self):
            # Committed snapshot i must still read back as recorded.
            if not self.snapshots:
                return
            i = len(self.snapshots) // 2
            got = {r.k: r.v for r in self.t.read(version=i).collect()}
            assert got == self.snapshots[i]

    return VersionedTableMachine


def test_versioned_table_model(spark, tmp_path_factory):
    machine_cls = make_machine(
        spark, str(tmp_path_factory.mktemp("vt_model"))
    )
    run_settings = settings(
        max_examples=3,
        stateful_step_count=6,
        deadline=None,
        suppress_health_check=list(HealthCheck),
        database=None,
        derandomize=True,
    )
    from hypothesis.stateful import run_state_machine_as_test

    run_state_machine_as_test(machine_cls, settings=run_settings)
