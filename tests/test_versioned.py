"""VersionedTable: snapshots, time travel, COW merge, maintenance.

Covers the reference's declared Iceberg capabilities on the
parquet-native layer: time travel (README.md:157), schema evolution
(README.md:159), compaction / snapshot expiry / orphan cleanup
(compaction.py:30-79), and the MERGE contract
(bronze_to_silver.py:156-188 + SURVEY §2.8.6).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from crypto_lakehouse_spark.pipeline.versioned import VersionedTable


def _df(spark, rows, cols=("k", "day", "v")):
    return spark.createDataFrame(rows, list(cols))


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "t"), partition_by=["day"])


def test_append_and_time_travel(spark, table):
    table.append(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    table.append(_df(spark, [(3, "a", 30)]))
    assert table.versions() == [0, 1]
    assert table.read(version=0).count() == 2
    assert table.read().count() == 3
    ops = [h["op"] for h in table.history()]
    assert ops == ["append", "append"]


def test_merge_updates_and_inserts(spark, table):
    table.append(_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]))
    table.merge(_df(spark, [(2, "a", 99), (4, "a", 40)]), keys=["k"])
    got = {(r.k, r.v) for r in table.read().collect()}
    assert got == {(1, 10), (2, 99), (3, 30), (4, 40)}
    # Time travel still sees the pre-merge snapshot.
    old = {(r.k, r.v) for r in table.read(version=0).collect()}
    assert old == {(1, 10), (2, 20), (3, 30)}


def test_merge_rewrites_only_touched_partitions(spark, table):
    table.append(_df(spark, [(1, "a", 10), (3, "b", 30)]))
    files_before = set(table._load(0)["files"])
    table.merge(_df(spark, [(1, "a", 11)]), keys=["k"])
    files_after = set(table._load(1)["files"])
    # Partition b's file is carried over byte-identical; a's replaced.
    carried = files_before & files_after
    assert carried and all(f.startswith("day=b") for f in carried)


def test_merge_rejects_duplicate_source_keys(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    with pytest.raises(ValueError, match="not unique"):
        table.merge(_df(spark, [(1, "a", 1), (1, "a", 2)]), keys=["k"])


def test_schema_evolution_on_read(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    evolved = _df(spark, [(2, "b", 20, "x")], cols=("k", "day", "v", "extra"))
    table.append(evolved)
    got = table.read(merge_schema=True)
    assert "extra" in got.columns
    rows = {r.k: r.extra for r in got.collect()}
    assert rows == {1: None, 2: "x"}


def test_compact_then_expire_removes_orphans(spark, table):
    for i in range(3):
        table.append(_df(spark, [(i, "a", i)]))
    n_files_before = len(glob.glob(f"{table.path}/day=*/*.parquet"))
    v = table.compact(target_files_per_partition=1)
    assert table.read(version=v).count() == 3
    # All versions still readable pre-expiry.
    assert table.read(version=0).count() == 1

    stats = table.expire_snapshots(retain_last=1, orphan_retention_s=0.0)
    assert stats["expired_versions"] == 3
    n_files_after = len(glob.glob(f"{table.path}/day=*/*.parquet"))
    assert n_files_after == 1 and n_files_before >= 3
    assert table.read().count() == 3


def test_partition_pruning_on_snapshot_read(spark, table):
    table.append(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    plan = (
        table.read()
        .filter(F.col("day") == "a")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_crashed_staging_swept(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    os.makedirs(os.path.join(table.path, "_staging-deadbeef/day=z"))
    table.expire_snapshots(retain_last=5, orphan_retention_s=0.0)
    assert not glob.glob(f"{table.path}/_staging-*")


# -- manifest column stats + data skipping ---------------------------------
def test_file_skipping_prunes_sorted_layout(spark, tmp_path):
    """Range-sorted write → tight per-file min/max → bounded reads
    skip most files; result still exactly equals the full-scan filter.
    The unsorted layout proves the layout half matters: same data,
    same predicate, no files skipped."""
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "user_id", "value")
    )

    sorted_t = VersionedTable(spark, str(tmp_path / "sorted"))
    sorted_t.append(ev.repartitionByRange(8, "value"))
    sel, total = sorted_t.files_for_scan(between={"value": (100.0, 120.0)})
    assert total == 8
    assert len(sel) < total, "sorted layout must allow file skipping"

    shuffled = VersionedTable(spark, str(tmp_path / "shuffled"))
    shuffled.append(ev.repartition(8))
    sel2, total2 = shuffled.files_for_scan(between={"value": (100.0, 120.0)})
    assert total2 == 8
    assert len(sel2) == total2, "random layout has nothing to skip"

    expect = sorted(
        r.event_id
        for r in ev.where(F.col("value").between(100.0, 120.0)).collect()
    )
    got = sorted(
        r.event_id
        for r in sorted_t.read(between={"value": (100.0, 120.0)}).collect()
    )
    assert got == expect


def test_file_skipping_carries_stats_through_commits(spark, tmp_path):
    """Stats recorded at write time survive append/merge commits that
    carry the file forward (files are immutable, so stats are too),
    and a fully-disjoint bound yields an empty-but-typed frame."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "d1", 10.0), (2, "d1", 20.0)]))
    t.append(_df(spark, [(3, "d2", 1000.0)]))
    sel, total = t.files_for_scan(between={"v": (900.0, 1100.0)})
    assert len(sel) < total
    empty = t.read(between={"v": (-50.0, -40.0)})
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "day", "v"}


# --- schema evolution (reference README.md:159) ----------------------------


def test_add_column_is_metadata_only(spark, table):
    table.append(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    files_v0 = table._load(0)["files"]
    v = table.add_column("score", "double")
    assert v == 1
    # Metadata-only: the data file set is byte-identical.
    assert table._load(1)["files"] == files_v0
    got = table.read()
    assert "score" in got.columns
    assert got.schema["score"].dataType.simpleString() == "double"
    assert all(r.score is None for r in got.collect())
    # Time travel: the pre-evolution snapshot has no such column.
    assert "score" not in table.read(version=0).columns


def test_add_column_old_and_new_files_mix(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    table.add_column("score", "double")
    table.append(
        spark.createDataFrame(
            [(2, "a", 20, 0.5)], "k BIGINT, day STRING, v BIGINT, score DOUBLE"
        )
    )
    got = {(r.k, r.score) for r in table.read().collect()}
    assert got == {(1, None), (2, 0.5)}


def test_add_column_with_default(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    table.add_column("lang", "string", default="unknown")
    assert [r.lang for r in table.read().collect()] == ["unknown"]


def test_add_column_duplicate_rejected(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    with pytest.raises(ValueError, match="already exists"):
        table.add_column("v", "bigint")


# --- optimistic concurrency (the ACID gap of parquet+manifest) -------------


def test_concurrent_writers_one_loses_cleanly(spark, table):
    from crypto_lakehouse_spark.pipeline.versioned import CommitConflictError

    table.append(_df(spark, [(1, "a", 10)]))

    # Writer A reads snapshot v0 and stages its files...
    base_a = table.current_version()
    prev_a = table._load(base_a)["files"]
    staged_a = table._write_files(_df(spark, [(2, "a", 20)]))

    # ...meanwhile writer B commits v1 first.
    writer_b = VersionedTable(spark, table.path, partition_by=["day"])
    assert writer_b.append(_df(spark, [(3, "b", 30)])) == 1

    # A's CAS publish must fail atomically — no manifest, no corruption.
    with pytest.raises(CommitConflictError):
        table._commit(prev_a + staged_a, "append", base=base_a)

    # Table state is exactly B's commit; A's rows are invisible.
    assert table.versions() == [0, 1]
    got = {r.k for r in table.read().collect()}
    assert got == {1, 3}

    # A retries from the fresh snapshot and succeeds.
    base_retry = table.current_version()
    prev_retry = table._load(base_retry)["files"]
    table._commit(prev_retry + staged_a, "append", base=base_retry)
    assert {r.k for r in table.read().collect()} == {1, 2, 3}


def test_conflict_loser_files_are_orphans(spark, table):
    from crypto_lakehouse_spark.pipeline.versioned import CommitConflictError

    table.append(_df(spark, [(1, "a", 10)]))
    base = table.current_version()
    staged = table._write_files(_df(spark, [(9, "z", 90)]))
    VersionedTable(spark, table.path, partition_by=["day"]).append(
        _df(spark, [(2, "a", 20)])
    )
    with pytest.raises(CommitConflictError):
        table._commit(table._load(base)["files"] + staged, "append", base=base)
    # The loser's staged bytes exist on disk but no manifest references
    # them; expire_snapshots' orphan sweep removes them.
    on_disk = {
        os.path.relpath(p, table.path)
        for p in glob.glob(os.path.join(table.path, "**", "*.parquet"), recursive=True)
    }
    assert set(staged) <= on_disk
    table.expire_snapshots(retain_last=10, orphan_retention_s=0.0)
    on_disk_after = {
        os.path.relpath(p, table.path)
        for p in glob.glob(os.path.join(table.path, "**", "*.parquet"), recursive=True)
    }
    assert not (set(staged) & on_disk_after)
    assert {r.k for r in table.read().collect()} == {1, 2}


# --- partition-stability merge guard ---------------------------------------


def test_merge_rejects_partition_moving_key(spark, table):
    table.append(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    # k=1 lives in day=a; the "correction" claims it moved to day=b.
    with pytest.raises(ValueError, match="outside the source's partitions"):
        table.merge(_df(spark, [(1, "b", 99)]), keys=["k"])
    # Unchanged table.
    assert {(r.k, r.day) for r in table.read().collect()} == {(1, "a"), (2, "b")}


def test_merge_partition_key_in_merge_keys_skips_guard(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    # With the partition column in the keys, (1, b) is a plain insert.
    table.merge(_df(spark, [(1, "b", 99)]), keys=["k", "day"])
    got = {(r.k, r.day, r.v) for r in table.read().collect()}
    assert got == {(1, "a", 10), (1, "b", 99)}


# --- size-targeted OPTIMIZE -------------------------------------------------


def test_optimize_bin_packs_small_files(spark, table):
    # Ten 1-row appends -> >= 10 small files across 2 partitions.
    for i in range(10):
        table.append(_df(spark, [(i, "a" if i % 2 else "b", i)]))
    before = len(table._load(table.current_version())["files"])
    assert before >= 10
    # Any sane MB target dwarfs these tiny files -> 1 file/partition.
    res = table.optimize(target_file_mb=128)
    assert res["skipped"] is False
    assert res["files_after"] <= 2  # one per partition
    assert table.read().count() == 10
    # Content identical through the rewrite.
    got = {(r.k, r.day, r.v) for r in table.read().collect()}
    assert got == {(i, "a" if i % 2 else "b", i) for i in range(10)}
    # Pre-optimize snapshot still time-travels to the old layout.
    assert table.read(version=res["version"] - 1).count() == 10
    # Second run is a metadata-only no-op: no new version committed.
    v = table.current_version()
    res2 = table.optimize(target_file_mb=128)
    assert res2["skipped"] is True
    assert table.current_version() == v


def test_optimize_empty_table_is_noop(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "empty"))
    assert t.optimize()["skipped"] is True


# --- RESTORE / shallow CLONE ------------------------------------------------


def test_restore_to_old_version(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))           # v0
    table.append(_df(spark, [(2, "b", 20)]))           # v1
    table.overwrite(_df(spark, [(9, "a", 90)]))        # v2
    v = table.restore(1)
    assert v == 3
    assert {(r.k, r.v) for r in table.read().collect()} == {(1, 10), (2, 20)}
    # History preserved: the pre-restore state still time-travels.
    assert {r.k for r in table.read(version=2).collect()} == {9}
    # Restore is itself undoable.
    table.restore(2)
    assert {r.k for r in table.read().collect()} == {9}


def test_restore_unknown_version_raises(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    import pytest as _pt

    with _pt.raises(ValueError, match="not in"):
        table.restore(7)


def test_shallow_clone_is_independent(spark, table, tmp_path):
    table.append(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    clone = table.clone_to(str(tmp_path / "clone"))
    assert {(r.k, r.v) for r in clone.read().collect()} == {(1, 10), (2, 20)}
    # Diverge both sides; neither sees the other's writes.
    clone.append(_df(spark, [(3, "a", 30)]))
    table.append(_df(spark, [(4, "b", 40)]))
    assert {r.k for r in clone.read().collect()} == {1, 2, 3}
    assert {r.k for r in table.read().collect()} == {1, 2, 4}
    # Zero-copy: the cloned v0 files are hard links (same inode).
    import os

    rel = clone._load(0)["files"][0]
    assert os.stat(os.path.join(clone.path, rel)).st_ino == os.stat(
        os.path.join(table.path, rel)
    ).st_ino


# --- Change Data Feed -------------------------------------------------------


def test_table_changes_covers_all_change_types(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "cdf"))
    t.overwrite(_df(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)]))  # v0
    # v1: update k=1, delete nothing via merge... use overwrite to get
    # a delete too: k=3 gone, k=4 new, k=1 changed, k=2 unchanged.
    t.overwrite(_df(spark, [(1, "a", 11), (2, "b", 20), (4, "d", 40)]))  # v1
    rows = {
        (r.k, r.day, r.v, r._change_type)
        for r in t.table_changes(["k"], 0, 1).collect()
    }
    assert rows == {
        (1, "a", 10, "update_preimage"),
        (1, "a", 11, "update_postimage"),
        (3, "c", 30, "delete"),
        (4, "d", 40, "insert"),
    }
    # Unchanged k=2 emitted nowhere.
    assert not any(r[0] == 2 for r in rows)


def test_orphan_retention_protects_inflight_writer(spark, table):
    """ADVICE r5 (versioned.py expire_snapshots): a racing writer's
    freshly-moved but not-yet-committed data files must survive the
    orphan sweep under the default retention window; only age-expired
    orphans are removed. The writer then commits and its snapshot
    references intact files."""
    table.append(_df(spark, [(1, "a", 10)]))
    staged = table._write_files(_df(spark, [(7, "q", 70)]))
    stats = table.expire_snapshots(retain_last=5)  # default 1h retention
    on_disk = {
        os.path.relpath(p, table.path)
        for p in glob.glob(os.path.join(table.path, "**", "*.parquet"), recursive=True)
    }
    assert set(staged) <= on_disk, "fresh orphan deleted inside retention window"
    assert stats["removed_files"] == 0
    base = table.current_version()
    table._commit(table._load(base)["files"] + staged, "append", base=base)
    assert {r.k for r in table.read().collect()} == {1, 7}


def test_optimize_zorder_improves_2d_file_skipping(spark, tmp_path):
    """VERDICT r5 item 4: OPTIMIZE ZORDER BY (x, y) must make
    files_for_scan prune MORE files than an x-sorted layout under a
    box predicate bounding BOTH dimensions, with read(between=...)
    values unchanged."""
    import pyspark.sql.functions as SF

    t = VersionedTable(spark, str(tmp_path / "z"))
    n = 20_000
    # x-sorted, y uncorrelated: a y-bound alone prunes nothing.
    df = (
        spark.range(n)
        .select(
            SF.col("id").alias("x"),
            ((SF.col("id") * 2654435761) % 10_000).alias("y"),
            SF.col("id").alias("payload"),
        )
        .orderBy("x")
        .coalesce(1)
    )
    t.overwrite(df)
    # Rewrite into ~16 files in x order (leading-column sort layout).
    t._commit(
        t._write_files(t.read().repartitionByRange(16, "x").sortWithinPartitions("x")),
        "sort-by-x",
        base=t.current_version(),
    )
    box = {"x": (2_000, 4_000), "y": (1_000, 2_000)}
    sel_sorted, total_sorted = t.files_for_scan(between=box)
    expect = sorted(
        (r.x, r.y) for r in t.read(between=box).select("x", "y").collect()
    )

    stats = t.optimize(target_file_mb=0.01, cluster_by=["x", "y"])
    assert not stats["skipped"] and stats["files_after"] >= 8
    sel_z, total_z = t.files_for_scan(between=box)
    frac_sorted = len(sel_sorted) / total_sorted
    frac_z = len(sel_z) / total_z
    assert frac_z < frac_sorted, (
        f"z-order should scan a smaller file fraction: "
        f"sorted {len(sel_sorted)}/{total_sorted} vs z {len(sel_z)}/{total_z}"
    )
    got = sorted(
        (r.x, r.y) for r in t.read(between=box).select("x", "y").collect()
    )
    assert got == expect

    # The textbook case: a bound on the NON-leading dimension alone.
    # The x-sorted layout can never prune on y (every file spans all
    # of y); the z-ordered layout must.
    ybox = {"y": (1_000, 2_000)}
    sel_y, tot_y = t.files_for_scan(version=1, between=ybox)  # sorted layout
    assert len(sel_y) == tot_y, "x-sorted layout cannot prune on y"
    sel_yz, tot_yz = t.files_for_scan(between=ybox)  # z-ordered layout
    assert len(sel_yz) / tot_yz < 0.8, (
        f"z-order must prune on the second dimension: {len(sel_yz)}/{tot_yz}"
    )


# --- OCC conflict-class matrix (VERDICT r5 item 8 / r6 item 2) -------------
# The CAS publish is version-granular, but `_commit` now REBASES the
# benign conflict classes instead of surfacing every race (Delta/
# Iceberg semantics): blind appends rebase over any non-full commit,
# and partition-pruned merges rebase over disjoint-partition commits.
# Same-partition rewrites, row-level DML, restores and metadata
# changes stay manifest-coarse — the loser raises. Interleaving is
# simulated by staging the loser's operation against a captured base
# version, letting the winner commit, then publishing the loser's
# stale commit with its conflict descriptor.


def test_occ_append_vs_append_auto_rebases(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    base = table.current_version()
    staged = table._write_files(_df(spark, [(2, "b", 20)]))  # loser A
    winner = VersionedTable(spark, table.path, partition_by=["day"])
    winner.append(_df(spark, [(3, "c", 30)]))  # B publishes first
    # A's stale publish REBASES onto B's head: no error, no recompute,
    # both writers' rows land (append/append is conflict-free by
    # construction — disjoint new files).
    v = table._commit(
        table._load(base)["files"] + staged,
        "append",
        base=base,
        conflict={
            "class": "append",
            "added": staged,
            "partitions": sorted({os.path.dirname(f) for f in staged}),
        },
    )
    assert v == 2 and table.versions() == [0, 1, 2]
    assert {r.k for r in table.read().collect()} == {1, 2, 3}
    # WITHOUT a descriptor (legacy callers / unknown class) the loser
    # still raises — rebase is opt-in by declared class.
    from crypto_lakehouse_spark.pipeline.versioned import CommitConflictError

    staged2 = table._write_files(_df(spark, [(4, "d", 40)]))
    with pytest.raises(CommitConflictError):
        table._commit(
            table._load(base)["files"] + staged2, "append", base=base
        )


def test_occ_merge_vs_merge_disjoint_partitions_auto_rebases(spark, table):
    table.append(
        _df(spark, [(1, "a", 10), (2, "b", 20)])
    )  # partitions day=a, day=b
    base = table.current_version()
    # Loser A: merge touching ONLY day=a, staged against `base`.
    a_out = _df(spark, [(1, "a", 11)])
    a_new = table._write_files(a_out)
    base_files = table._load(base)["files"]
    a_removed = [f for f in base_files if "day=a" in f]
    a_carried = [f for f in base_files if "day=b" in f]
    # Winner B: merge touching ONLY day=b, commits first.
    winner = VersionedTable(spark, table.path, partition_by=["day"])
    winner.merge(_df(spark, [(2, "b", 22)]), keys=["k", "day"])
    # Disjoint partition sets: A's stale publish rebases onto B's head
    # (Iceberg/Delta admit both), preserving BOTH updates with no
    # recompute and no error.
    v = table._commit(
        a_carried + a_new,
        "merge",
        base=base,
        conflict={
            "class": "partitioned",
            "added": a_new,
            "removed": a_removed,
            "partitions": ["day=a"],
        },
    )
    assert v == 2
    assert {(r.k, r.v) for r in table.read().collect()} == {(1, 11), (2, 22)}


def test_occ_merge_vs_merge_same_partition_lost_update_raises(spark, table):
    """The lost-update shape MUST still fail: two merges rewriting the
    SAME partition — the loser's output was computed against rows the
    winner just replaced; rebasing would silently drop the winner's
    update."""
    table.append(_df(spark, [(1, "a", 10)]))
    base = table.current_version()
    base_files = table._load(base)["files"]
    a_new = table._write_files(_df(spark, [(1, "a", 11)]))
    winner = VersionedTable(spark, table.path, partition_by=["day"])
    winner.merge(_df(spark, [(1, "a", 99)]), keys=["k", "day"])
    from crypto_lakehouse_spark.pipeline.versioned import CommitConflictError

    with pytest.raises(CommitConflictError):
        table._commit(
            a_new,
            "merge",
            base=base,
            conflict={
                "class": "partitioned",
                "added": a_new,
                "removed": base_files,
                "partitions": ["day=a"],
            },
        )
    # Winner's update intact; loser's rows invisible.
    assert {(r.k, r.v) for r in table.read().collect()} == {(1, 99)}


def test_occ_partitioned_vs_append_same_partition_raises(spark, table):
    """ConcurrentAppendException analog: a partition-pruned merge must
    NOT rebase over an append that landed rows in one of its touched
    partitions — those rows never entered the merge's computation."""
    table.append(_df(spark, [(1, "a", 10)]))
    base = table.current_version()
    base_files = table._load(base)["files"]
    a_new = table._write_files(_df(spark, [(1, "a", 11)]))
    winner = VersionedTable(spark, table.path, partition_by=["day"])
    winner.append(_df(spark, [(5, "a", 50)]))  # lands in day=a
    from crypto_lakehouse_spark.pipeline.versioned import CommitConflictError

    with pytest.raises(CommitConflictError):
        table._commit(
            a_new,
            "merge",
            base=base,
            conflict={
                "class": "partitioned",
                "added": a_new,
                "removed": base_files,
                "partitions": ["day=a"],
            },
        )


def test_occ_public_appends_never_conflict(spark, table):
    """The public API path: many appends racing from a shared stale
    snapshot all land (each rebases in turn) — the many-writer
    liveness the hourly-job shape needs."""
    table.append(_df(spark, [(1, "a", 10)]))
    writers = [
        VersionedTable(spark, table.path, partition_by=["day"])
        for _ in range(3)
    ]
    for i, w in enumerate(writers):
        w.append(_df(spark, [(10 + i, "b", i)]))
    assert {r.k for r in table.read().collect()} == {1, 10, 11, 12}
    assert table.current_version() == 3


def test_occ_restore_vs_append_retry_restores_over_append(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))  # v0
    table.append(_df(spark, [(2, "b", 20)]))  # v1
    base = table.current_version()
    snap0 = table._load(0)
    # Winner B: appends v2 while A prepares restore(0) against v1.
    winner = VersionedTable(spark, table.path, partition_by=["day"])
    winner.append(_df(spark, [(3, "c", 30)]))
    from crypto_lakehouse_spark.pipeline.versioned import CommitConflictError

    with pytest.raises(CommitConflictError):
        table._commit(snap0["files"], "restore(v0)", base=base)
    # Retry via the public API: restore WINS over the concurrent
    # append — the restored snapshot shows exactly v0's rows; the
    # append is not merged in, but remains readable as v2 history.
    table.restore(0)
    assert {r.k for r in table.read().collect()} == {1}
    assert {r.k for r in table.read(version=2).collect()} == {1, 2, 3}


# --- row-level DELETE + timestamp time travel (round 6) --------------------


def test_delete_rewrites_only_touched_files(spark, table):
    table.append(_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]))
    before = set(table._load(table.current_version())["files"])
    b_files = {f for f in before if f.startswith("day=b")}
    stats = table.delete("v = 10")
    assert not stats["skipped"] and stats["files_rewritten"] >= 1
    after = set(table._load(table.current_version())["files"])
    assert b_files <= after, "untouched partition file must carry byte-identical"
    assert {(r.k, r.v) for r in table.read().collect()} == {(2, 20), (3, 30)}
    # Pre-delete snapshot intact (COW).
    assert {r.k for r in table.read(version=0).collect()} == {1, 2, 3}


def test_delete_no_match_is_noop(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    v = table.current_version()
    stats = table.delete("v = 999")
    assert stats["skipped"] and table.current_version() == v


def test_delete_all_rows_in_touched_file(spark, table):
    table.append(_df(spark, [(1, "a", 10), (3, "b", 30)]))
    table.delete("day = 'a'")
    assert {r.k for r in table.read().collect()} == {3}


def test_version_as_of_timestamp(spark, table):
    import time as _t

    table.append(_df(spark, [(1, "a", 10)]))  # v0
    t_between = _t.time()
    _t.sleep(0.05)
    table.append(_df(spark, [(2, "b", 20)]))  # v1
    assert table.version_as_of(t_between) == 0
    assert table.version_as_of(_t.time()) == 1
    assert {r.k for r in table.read(version=table.version_as_of(t_between)).collect()} == {1}
    with pytest.raises(ValueError, match="no version committed"):
        table.version_as_of(0.0)


def test_update_rewrites_only_touched_files(spark, table):
    table.append(_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]))
    b_files = {
        f for f in table._load(table.current_version())["files"]
        if f.startswith("day=b")
    }
    stats = table.update("k = 1", set={"v": "v + 5"})
    assert not stats["skipped"]
    after = set(table._load(table.current_version())["files"])
    assert b_files <= after
    assert {(r.k, r.v) for r in table.read().collect()} == {
        (1, 15), (2, 20), (3, 30)
    }
    assert {(r.k, r.v) for r in table.read(version=0).collect()} == {
        (1, 10), (2, 20), (3, 30)
    }


def test_update_rejects_partition_column_assignment(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    with pytest.raises(ValueError, match="partition column"):
        table.update("k = 1", set={"day": "'b'"})


def test_update_no_match_is_noop(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    v = table.current_version()
    assert table.update("k = 99", set={"v": "0"})["skipped"]
    assert table.current_version() == v


def test_snapshot_isolation_reader_unaffected_by_concurrent_commit(spark, table):
    """ACID isolation: a reader resolving version V sees V's exact
    rows even after later commits rewrite/delete — data files are
    immutable and manifests never mutate."""
    table.append(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    v = table.current_version()
    snapshot = table.read(version=v)  # plan pinned to v's file list
    table.update("k = 1", set={"v": "999"})
    table.delete("k = 2")
    # The pre-commit plan still evaluates to the old rows.
    assert {(r.k, r.v) for r in snapshot.collect()} == {(1, 10), (2, 20)}
    assert {(r.k, r.v) for r in table.read().collect()} == {(1, 999)}


# --- CHECK constraints + idempotent txn appends (round 6) ------------------


def test_check_constraint_blocks_violating_writes(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    table.add_constraint("v_positive", "v > 0")
    with pytest.raises(ValueError, match="v_positive"):
        table.append(_df(spark, [(2, "b", -5)]))
    # Nothing committed by the failed write.
    assert {r.k for r in table.read().collect()} == {1}
    table.append(_df(spark, [(2, "b", 5)]))  # valid write passes
    with pytest.raises(ValueError, match="v_positive"):
        table.update("k = 2", set={"v": "-1"})
    with pytest.raises(ValueError, match="v_positive"):
        table.merge(_df(spark, [(3, "a", 0)]), keys=["k"])
    table.drop_constraint("v_positive")
    table.append(_df(spark, [(4, "a", -1)]))  # allowed after drop
    assert {r.k for r in table.read().collect()} == {1, 2, 4}


def test_add_constraint_rejects_existing_violations(spark, table):
    table.append(_df(spark, [(1, "a", -10)]))
    with pytest.raises(ValueError, match="existing rows violate"):
        table.add_constraint("v_positive", "v > 0")


def test_txn_append_is_idempotent(spark, table):
    """Delta txnAppId/txnVersion: a replayed foreachBatch batch id is
    skipped; a new batch id lands; a second app's watermark is
    independent."""
    table.append(_df(spark, [(1, "a", 10)]), txn=("ingest", 1))
    v = table.current_version()
    assert table.append(_df(spark, [(1, "a", 10)]), txn=("ingest", 1)) == v
    assert table.read().count() == 1  # replay skipped
    table.append(_df(spark, [(2, "b", 20)]), txn=("ingest", 2))
    assert table.read().count() == 2
    table.append(_df(spark, [(3, "a", 30)]), txn=("backfill", 1))
    assert table.read().count() == 3
    assert table.last_txn_version("ingest") == 2
    assert table.last_txn_version("backfill") == 1


def test_merge_schema_evolution(spark, table):
    """Delta schema.autoMerge: a wider MERGE source declares the new
    column; carried files backfill NULL on read; without the flag the
    wider source is an explicit error."""
    table.append(_df(spark, [(1, "a", 10), (3, "b", 30)]))
    wider = spark.createDataFrame(
        [(1, "a", 11, "gold"), (2, "a", 20, "silver")],
        "k BIGINT, day STRING, v BIGINT, tier STRING",
    )
    with pytest.raises(ValueError, match="merge_schema=True"):
        table.merge(wider, keys=["k"])
    table.merge(wider, keys=["k"], merge_schema=True)
    got = {(r.k, r.v, r.tier) for r in table.read().collect()}
    assert got == {(1, 11, "gold"), (2, 20, "silver"), (3, 30, None)}
    # Pre-evolution snapshot unchanged.
    assert "tier" not in table.read(version=0).columns


def test_expire_dry_run_touches_nothing(spark, table):
    import glob as _g

    for i in range(3):
        table.append(_df(spark, [(i, "a", i)]))
    table.compact(target_files_per_partition=1)
    before = set(_g.glob(f"{table.path}/day=*/*.parquet"))
    stats = table.expire_snapshots(
        retain_last=1, orphan_retention_s=0.0, dry_run=True
    )
    assert stats["expired_versions"] == 3 and stats["removed_files"] >= 3
    # Nothing actually removed; all versions still readable.
    assert set(_g.glob(f"{table.path}/day=*/*.parquet")) == before
    assert table.read(version=0).count() == 1


def test_describe_detail(spark, table):
    table.append(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    table.add_constraint("v_pos", "v > 0")
    d = table.detail()
    assert d["version"] == 1 and d["num_files"] >= 2
    assert d["partition_columns"] == ["day"]
    assert d["constraints"] == {"v_pos": "v > 0"}
    assert d["size_bytes"] > 0 and d["last_op"] == "add_constraint(v_pos)"


def test_bloom_index_prunes_point_lookups(spark, tmp_path):
    """Bloom-filter file index (Delta bloom index analog): point
    lookups on a high-cardinality, randomly-laid-out key — where
    min/max overlaps every file and prunes nothing — skip most files
    via the per-file Bloom recorded at write time, with exact results."""
    import hashlib

    import pyspark.sql.functions as SF

    t = VersionedTable(spark, str(tmp_path / "b"), bloom_columns=["key"])
    # md5-style keys in random layout: every file's [min, max] spans
    # nearly the whole key space.
    df = spark.range(4000).select(
        SF.md5(SF.col("id").cast("string")).alias("key"),
        SF.col("id").alias("v"),
    )
    t.append(df.repartition(16))

    probe = hashlib.md5(b"1234").hexdigest()
    sel, total = t.files_for_scan(point={"key": probe})
    assert total == 16
    assert len(sel) <= 4, f"bloom should prune most files, kept {len(sel)}"
    rows = t.read(point={"key": probe}).collect()
    assert [(r.key, r.v) for r in rows] == [(probe, 1234)]

    # Absent key: typically every file pruned; result must be empty
    # regardless of how many files the Bloom FP-keeps.
    assert t.read(point={"key": "not-a-real-key"}).count() == 0

    # Files written WITHOUT the index (another handle) stay scannable.
    t2 = VersionedTable(spark, str(tmp_path / "b"))
    t2.append(df.limit(1))
    sel2, total2 = t2.files_for_scan(point={"key": probe})
    assert total2 == 17 and len(sel2) >= 1


def test_write_stream_sink_roundtrip(spark, tmp_path):
    """writeStream -> VersionedTable sink helper: drains a file
    stream into the table with txn-idempotent appends."""
    feed = tmp_path / "feed"
    feed.mkdir()
    src = spark.createDataFrame([(i, f"r{i}") for i in range(10)], "k BIGINT, v STRING")
    src.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "stage"))
    import glob as _g
    import os as _o

    for i, p in enumerate(sorted(_g.glob(str(tmp_path / "stage" / "*.parquet")))):
        _o.rename(p, str(feed / f"{i:03d}.parquet"))

    t = VersionedTable(spark, str(tmp_path / "t"))
    stream = (
        spark.readStream.schema("k BIGINT, v STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = t.write_stream(stream, str(tmp_path / "ckpt"), app_id="test_sink")
    q.awaitTermination()
    assert sorted(r.k for r in t.read().collect()) == list(range(10))
    assert t.last_txn_version("test_sink") is not None


def test_partition_value_pruning_in_files_for_scan(spark, table):
    """Partition columns have no footer stats; their dir-name values
    must still prune at the manifest level (exact min=max), including
    escaped values."""
    table.append(_df(spark, [(1, "a", 10), (2, "b", 20), (3, "c:x", 30)]))
    sel, total = table.files_for_scan(between={"day": ("a", "a")})
    assert total >= 3 and len(sel) < total
    assert all("day=a" in f for f in sel)
    # Escaped partition value decodes for comparison.
    sel2, _ = table.files_for_scan(between={"day": ("c:x", "c:x")})
    assert sel2 and all("day=c%3Ax" in f for f in sel2)
    # Values still exact through the read path.
    got = {r.k for r in table.read(between={"day": ("a", "a")}).collect()}
    assert got == {1}


def test_consume_changes_durable_cursor(spark, table, tmp_path):
    """At-least-once CDC consumption with an atomic durable cursor:
    first call sees the full snapshot as inserts, later calls see only
    new versions' row-level changes, a no-change call is None, and a
    crashed process (exception before cursor advance) replays."""
    cursor = str(tmp_path / "cursor")
    table.append(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    seen: list[tuple[int, int, dict]] = []

    def _proc(df, fv, tv):
        rows = {(r.k, r._change_type) for r in df.collect()}
        seen.append((fv, tv, rows))

    assert table.consume_changes(["k"], cursor, _proc) == (0, 0)
    assert seen[-1][2] == {(1, "insert"), (2, "insert")}
    assert table.consume_changes(["k"], cursor, _proc) is None

    table.merge(_df(spark, [(1, "a", 11), (3, "c", 30)]), keys=["k"])
    table.delete("k = 2")

    def _boom(df, fv, tv):
        raise RuntimeError("consumer crash")

    with pytest.raises(RuntimeError):
        table.consume_changes(["k"], cursor, _boom)
    # Cursor NOT advanced: retry replays the same change batch.
    assert table.consume_changes(["k"], cursor, _proc) == (0, 2)
    assert seen[-1][2] == {
        (1, "update_preimage"),
        (1, "update_postimage"),
        (2, "delete"),
        (3, "insert"),
    }
    assert table.consume_changes(["k"], cursor, _proc) is None


# --- ADVICE r6 regression tests -------------------------------------------


def test_delete_keeps_null_condition_rows(spark, table):
    """DELETE removes only rows where the condition is TRUE: a row
    whose predicate column is NULL evaluates the condition to NULL and
    MUST survive the rewrite, even when it is co-located in a touched
    file with rows that do match (ADVICE r6, high)."""
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", None), (3, "a", 5)],
        "k int, day string, v int",
    ).coalesce(1)  # one file: NULL row co-located with matching rows
    table.append(df)
    stats = table.delete("v > 7")
    assert not stats["skipped"] and stats["files_rewritten"] == 1
    got = sorted((r.k, r.v) for r in table.read().collect())
    assert got == [(2, None), (3, 5)], (
        "NULL-condition row must be kept by DELETE"
    )


def test_bloom_numeric_value_canonicalization(spark, tmp_path):
    """Bloom probes canonicalize numerics: a DOUBLE column written as
    100.0 must be found when probed with int 100, float 100.0, or
    Decimal('100.0000') — a formatting mismatch must never let the
    Bloom 'prove' absence and prune a file whose rows Spark's residual
    cast-equality WOULD match (ADVICE r6, medium)."""
    from decimal import Decimal

    t = VersionedTable(spark, str(tmp_path / "bn"), bloom_columns=["price"])
    df = spark.range(400).select(
        (F.col("id") + 100.0).cast("double").alias("price"),
        F.col("id").alias("v"),
    )
    t.append(df.repartition(8))
    for probe in (100, 100.0, Decimal("100.0000")):
        rows = t.read(point={"price": probe}).collect()
        assert [(r.price, r.v) for r in rows] == [(100.0, 0)], (
            f"probe {probe!r} must find the row"
        )
    # And the index still prunes: an absent value keeps few/no files.
    sel, total = t.files_for_scan(point={"price": 1e9})
    assert total == 8 and len(sel) <= 2


def test_delete_update_on_schema_evolved_table(spark, table):
    """delete()/update() rewrites route through the mergeSchema +
    added-column backfill read path: a touched set mixing pre- and
    post-evolution files must keep the evolved column's real values
    and honor conditions referencing it (ADVICE r6, medium)."""
    table.append(_df(spark, [(1, "a", 10)]))           # pre-evolution file
    table.merge(
        spark.createDataFrame([(2, "a", 20, "eur")], "k int, day string, v int, ccy string"),
        keys=["k", "day"],
        merge_schema=True,
    )  # evolves schema; day=a now mixes pre- and post-evolution files
    stats = table.update("v >= 10", {"v": "v + 1"})
    assert not stats["skipped"]
    got = sorted((r.k, r.v, r.ccy) for r in table.read().collect())
    assert got == [(1, 11, None), (2, 21, "eur")], (
        "evolved column values must survive the rewrite"
    )
    # Condition on the evolved column itself.
    stats = table.delete("ccy = 'eur'")
    assert not stats["skipped"]
    got = sorted((r.k, r.v, r.ccy) for r in table.read().collect())
    assert got == [(1, 11, None)], "NULL-ccy row kept, eur row deleted"


def test_delete_touched_files_matched_with_partition_dirs(spark, table):
    """Touched-file resolution with one dynamic-partition write
    emitting part files into day=a/ and day=b/: a delete hitting only
    day=a must rewrite exactly that one file (ADVICE r6, low).
    Originally the single task produced the SAME basename in both
    dirs; since row tracking, _write_files guarantees table-unique
    basenames (its base map is keyed on them), so this also pins that
    invariant — resolution still matches the partition-dir-qualified
    relative path either way."""
    # repartition(1): a single task writes both partition dirs under
    # one commit prefix.
    table.append(_df(spark, [(1, "a", 10), (2, "b", 20)]).repartition(1))
    files = table._load(table.current_version())["files"]
    assert len(files) == 2
    assert len({os.path.basename(f) for f in files}) == 2, (
        "dynamic-partition files must get table-unique basenames "
        "(row-tracking base maps are keyed on them)"
    )
    stats = table.delete("day = 'a'")
    assert stats["files_rewritten"] == 1, (
        f"touched-file resolution over-marked files: {stats}"
    )
    got = sorted((r.k, r.day) for r in table.read().collect())
    assert got == [(2, "b")]


def test_occ_threaded_appends_all_land(spark, table):
    """REAL concurrency (not simulated interleaving): 6 writers on 3
    threads race appends through the public API; the CAS + rebase
    loop must land every commit exactly once with no conflict error
    surfacing and a linear version history."""
    import threading

    table.append(_df(spark, [(0, "z", 0)]))
    errors: list[Exception] = []

    def _writer(wid: int):
        try:
            t = VersionedTable(spark, table.path, partition_by=["day"])
            for j in range(2):
                t.append(_df(spark, [(100 * wid + j, f"d{wid}", j)]))
        except Exception as e:  # pragma: no cover - failure detail
            errors.append(e)

    threads = [threading.Thread(target=_writer, args=(i,)) for i in (1, 2, 3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    got = {r.k for r in table.read().collect()}
    assert got == {0, 100, 101, 200, 201, 300, 301}
    # One version per commit, no gaps, no lost writes.
    assert table.versions() == list(range(7))


# -- RENAME COLUMN / column mapping (VERDICT r10 item 5) ---------------------


def test_rename_column_metadata_only_old_files_readable(spark, table):
    table.append(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    files_before = set(table._load(0)["files"])
    v = table.rename_column("v", "amount")
    assert v == 1
    assert set(table._load(1)["files"]) == files_before, "data files touched"
    got = {(r.k, r.amount) for r in table.read().collect()}
    assert got == {(1, 10), (2, 20)}
    assert "v" not in table.read().columns


def test_rename_then_merge_then_time_travel(spark, table):
    # The full chain the verdict asks for: rename -> merge (writes
    # post-rename files under the stable physical name) -> time travel
    # back across the rename.
    table.append(_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]))
    table.rename_column("v", "amount")
    src = spark.createDataFrame([(2, "a", 99), (4, "a", 40)],
                                ["k", "day", "amount"])
    table.merge(src, keys=["k"])
    got = {(r.k, r.amount) for r in table.read().collect()}
    assert got == {(1, 10), (2, 99), (3, 30), (4, 40)}
    # Post-rename files still store the PHYSICAL name: mixed-vintage
    # reads need no mergeSchema union beyond the usual path.
    import pyarrow.parquet as pq

    newest = sorted(
        set(table._load(2)["files"]) - set(table._load(0)["files"])
    )
    for f in newest:
        names = pq.ParquetFile(os.path.join(table.path, f)).schema_arrow.names
        assert "v" in names and "amount" not in names
    # Time travel: v0 predates the rename and shows the old name.
    old = table.read(version=0)
    assert "v" in old.columns and "amount" not in old.columns
    assert {(r.k, r.v) for r in old.collect()} == {(1, 10), (2, 20), (3, 30)}
    # v1 (the rename commit itself) shows the new name over old files.
    assert "amount" in table.read(version=1).columns


def test_rename_column_roundtrip_and_stats_skipping(spark, tmp_path):
    # File skipping must translate logical bounds through the mapping:
    # stats are keyed by the physical name.
    t = VersionedTable(spark, str(tmp_path / "t2"))
    t.append(spark.createDataFrame([(i, i * 10) for i in range(100)],
                                   ["k", "v"]).coalesce(1))
    t.append(spark.createDataFrame([(i, i * 10) for i in range(100, 200)],
                                   ["k", "v"]).coalesce(1))
    t.rename_column("v", "amount")
    sel, total = t.files_for_scan(between={"amount": (0, 500)})
    assert total == 2 and len(sel) == 1, "logical bound did not skip files"
    rows = t.read(between={"amount": (0, 500)}).collect()
    assert {r.amount for r in rows} == {i * 10 for i in range(51)}
    # Rename back: mapping entry collapses (new == physical).
    t.rename_column("amount", "v")
    assert t._column_mapping() == {}
    assert {r.v for r in t.read(between={"v": (0, 20)}).collect()} == {0, 10, 20}


def test_rename_column_guards(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    with pytest.raises(ValueError, match="no column"):
        table.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        table.rename_column("v", "k")
    with pytest.raises(ValueError, match="partition column"):
        table.rename_column("day", "dt")
    table.rename_column("v", "val")
    # Adding a column under the physical storage name is rejected.
    with pytest.raises(ValueError, match="physical storage name"):
        table.add_column("v", "bigint")
    # And renaming another column ONTO a physical name is rejected.
    with pytest.raises(ValueError, match="physical storage name"):
        table.rename_column("k", "v")


def test_rename_column_constraint_reference_blocks(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    table.add_constraint("v_positive", "v > 0")
    with pytest.raises(ValueError, match="constraint"):
        table.rename_column("v", "amount")
    table.drop_constraint("v_positive")
    table.rename_column("v", "amount")
    assert "amount" in table.read().columns


def test_rename_column_add_column_interplay(spark, table):
    # Renaming a metadata-only added column moves its added_columns
    # spec, and the default still backfills under the new name.
    table.append(_df(spark, [(1, "a", 10)]))
    table.add_column("score", "double", default=1.5)
    table.rename_column("score", "quality")
    row = table.read().collect()[0]
    assert row.quality == 1.5
    assert "score" not in table.read().columns


def test_rename_survives_restore(spark, table):
    table.append(_df(spark, [(1, "a", 10)]))
    table.rename_column("v", "amount")
    table.append(spark.createDataFrame([(2, "b", 20)], ["k", "day", "amount"]))
    table.restore(1)  # restore to the rename commit's snapshot
    df = table.read()
    assert "amount" in df.columns and df.count() == 1
    table.restore(0)  # restore to BEFORE the rename: old logical name
    df0 = table.read()
    assert "v" in df0.columns and "amount" not in df0.columns


def test_restore_restores_constraints_with_schema(spark, table):
    """ADVICE r11: restore() must take the target snapshot's
    CONSTRAINTS along with its column_mapping — keeping the head's
    constraint over a post-rename name while restoring the pre-rename
    schema would fail every later append with an unresolved column."""
    table.append(_df(spark, [(1, "a", 10)]))  # v0
    table.rename_column("v", "val")  # v1
    table.add_constraint("val_pos", "val >= 0")  # v2
    table.restore(0)  # pre-rename, pre-constraint
    assert table.detail()["constraints"] == {}
    # Appends against the restored schema must work again.
    table.append(_df(spark, [(2, "b", 20)]))
    got = {(r.k, r.v) for r in table.read().collect()}
    assert got == {(1, 10), (2, 20)}
