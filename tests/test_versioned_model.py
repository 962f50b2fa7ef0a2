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
            # Logical name of the value column — rename_column flips it
            # between 'v' and 'w' mid-sequence, so every other rule
            # (merge source schema, update SET, reads) must keep
            # working through the column mapping.
            self.vcol = "v"
            self.snapshots: list[tuple[dict[int, int], str]] = []

        def _df(self, rows):
            return spark.createDataFrame(rows, f"k BIGINT, {self.vcol} BIGINT")

        def _record(self):
            self.snapshots.append((dict(self.model), self.vcol))

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

        @rule()
        def rename_value_column(self):
            # v -> w records a mapping (physical name stays 'v');
            # w -> v collapses it. Either way it's a metadata-only
            # commit that every later write/read must translate.
            new = "w" if self.vcol == "v" else "v"
            self.t.rename_column(self.vcol, new)
            self.vcol = new
            self._record()

        @rule(k=KEYS)
        def delete_key(self, k):
            stats = self.t.delete(f"k = {k}")
            existed = k in self.model
            self.model.pop(k, None)
            assert stats["skipped"] == (not existed)
            if not stats["skipped"]:
                self._record()

        @rule(rows=st.dictionaries(KEYS, VALS, min_size=1, max_size=3))
        def merge_dv(self, rows):
            # DV merge must be model-indistinguishable from COW merge.
            self.t.merge_dv(self._df(list(rows.items())), keys=["k"])
            self.model.update(rows)
            self._record()

        @rule(k=KEYS)
        def delete_key_dv(self, k):
            # Deletion-vector delete must be model-indistinguishable
            # from COW delete: same visibility, same skip contract
            # (a key that is only DV-dead re-deletes as a no-op).
            stats = self.t.delete_dv(f"k = {k}")
            existed = k in self.model
            self.model.pop(k, None)
            assert stats["skipped"] == (not existed)
            if not stats["skipped"]:
                self._record()

        @rule()
        def optimize(self):
            # Purges outstanding DVs (rewriting only DV'd files) or
            # bin-packs; contents never change. Records only when a
            # version was actually minted (skip = no commit).
            res = self.t.optimize()
            if not res["skipped"]:
                self._record()

        @rule(k=KEYS, dv=st.integers(min_value=1, max_value=5))
        def update_key(self, k, dv):
            stats = self.t.update(
                f"k = {k}", set={self.vcol: f"{self.vcol} + {dv}"}
            )
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
            self.model, self.vcol = (
                dict(self.snapshots[idx][0]),
                self.snapshots[idx][1],
            )
            self._record()

        @rule()
        def compact(self):
            self.t.compact()
            self._record()  # contents unchanged, but a version is minted

        @invariant()
        def table_matches_model(self):
            if self.t.current_version() is None:
                return
            got = {
                r["k"]: r[self.vcol] for r in self.t.read().collect()
            }
            assert got == self.model

        @invariant()
        def history_is_immutable(self):
            # Committed snapshot i must still read back as recorded.
            if not self.snapshots:
                return
            i = len(self.snapshots) // 2
            rows, vcol = self.snapshots[i]
            got = {
                r["k"]: r[vcol] for r in self.t.read(version=i).collect()
            }
            assert got == rows

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


# --- randomized model check of the commit-rebase protocol ------------------
# The round-7 rebase rules (benign classes auto-merge, lost-update
# shapes raise) are pure manifest logic — no Spark job runs in
# _commit — so hundreds of random interleavings are cheap. A mirror
# model predicts, for every stale commit, whether it must succeed
# (and the exact resulting file set) or raise; any divergence is a
# protocol bug (e.g. a rebase that silently drops another writer's
# files, or a conflict that should have auto-merged).


def test_commit_rebase_protocol_model(spark, tmp_path):
    import random

    from crypto_lakehouse_spark.pipeline.versioned import (
        CommitConflictError,
        VersionedTable,
    )

    rng = random.Random(20260814)
    parts = ["day=a", "day=b", "day=c", "day=d"]

    for trial in range(12):
        t = VersionedTable(spark, str(tmp_path / f"m{trial}"))
        # committed[v] = (op_class, partitions); files = current set
        t._commit([], "overwrite", base=None)  # v0: empty full commit
        committed = [("full", set())]
        files: list[str] = []
        fid = 0

        for _ in range(18):
            head = len(committed) - 1
            base = rng.randint(max(0, head - 3), head)  # possibly stale
            kind = rng.choice(["append", "merge", "full"])
            my_parts = set(rng.sample(parts, rng.randint(1, 2)))
            fid += 1
            added = [f"{p}/f{fid}.parquet" for p in sorted(my_parts)]
            base_files = t._load(base)["files"]

            if kind == "append":
                conflict = {
                    "class": "append",
                    "added": added,
                    "partitions": sorted(my_parts),
                }
                removed: list[str] = []
                attempt = base_files + added
            elif kind == "merge":
                removed = [
                    f for f in base_files if f.split("/")[0] in my_parts
                ]
                conflict = {
                    "class": "partitioned",
                    "added": added,
                    "removed": removed,
                    "partitions": sorted(my_parts),
                }
                attempt = [f for f in base_files if f not in removed] + added
            else:  # full overwrite
                conflict = None
                removed = base_files
                attempt = added

            # Mirror model: predict raise/success.
            intervening = committed[base + 1 : head + 1]
            if kind == "full":
                ok = not intervening
            elif kind == "append":
                ok = all(c != "full" for c, _ in intervening)
            else:
                ok = all(
                    c != "full" and not (p & my_parts)
                    for c, p in intervening
                ) and set(removed) <= set(files)

            try:
                t._commit(attempt, kind, base=base, conflict=conflict)
                raised = False
            except CommitConflictError:
                raised = True
            assert raised == (not ok), (
                f"trial {trial}: {kind} base={base} head={head} "
                f"parts={my_parts} expected ok={ok}"
            )
            if ok:
                files = [f for f in files if f not in set(removed)] + added
                committed.append(
                    (
                        "full" if kind == "full" else
                        ("append" if kind == "append" else "partitioned"),
                        set() if kind == "full" else my_parts,
                    )
                )
                assert sorted(t._load(t.current_version())["files"]) == sorted(
                    files
                ), f"trial {trial}: file set diverged after {kind}"
