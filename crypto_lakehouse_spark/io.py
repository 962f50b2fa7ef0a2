"""Table loading + temp-view registration for the driver testdata.

The driver's synthetic parquet (TESTDATA.md) has shipped two different
physical encodings across regenerations, and the engine owns robustness
to both:

- nanosecond-precision timestamps (Spark's vectorized reader rejects
  them; with ``spark.sql.legacy.parquet.nanosAsLong=true`` they arrive
  as BIGINT nanos — every value is microsecond-aligned, so
  ``timestamp_micros(ns div 1000)`` is lossless);
- microsecond TIMESTAMP_NTZ (parquet ``timestamp[us]`` without a UTC
  flag). The session timezone is pinned UTC (session.py), so casting
  NTZ -> TIMESTAMP is value-identical and matches what DuckDB computes
  for the same files.

Normalization is keyed off the ACTUAL dtype after read, never off an
assumed encoding — a lesson from the round-3 regeneration, where a
hard-coded physical type silently produced wrong answers.

The regenerated files are also single-file/single-ROW-GROUP parquet:
Spark cannot split a row group, so every scan serialized onto one of
32 cores (round-3 bench collapsed 3.6x). ``load_table`` therefore
inspects the parquet footer and, when the layout provides fewer row
groups than ``defaultParallelism``, COMPACTS the table once per
(source, layout, parallelism) into a multi-file cache and scans that —
the standard lakehouse small-file/row-group compaction maintenance
pass (same contract as ``pipeline/versioned.py``'s compaction), run
lazily at read time. The cache is keyed on the source file's
mtime+size, so a driver-side regeneration invalidates it
automatically. Scans of the compacted copy parallelize natively with
full pushdown/pruning and ZERO per-query exchange; if the rewrite is
impossible (read-only tmp), the fallback is one in-plan round-robin
repartition. On a real cluster reading many-file 100 TB tables the
gate never fires and neither path activates.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_lakehouse_spark.session import configure_session

# Timestamp-typed columns per testdata table (stored as ns in parquet).
TIMESTAMP_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def session_key(spark: SparkSession) -> str:
    """Session-lifetime memo key. `id(spark)` is NOT safe here: after a
    session is GC'd, a new one can allocate at the same address and
    alias the dead session's memo — handing out DataFrames bound to a
    stopped JVM session. A uuid stamped ON the session object can never
    alias: a new object never carries an old object's attribute."""
    k = getattr(spark, "_clh_session_uid", None)
    if k is None:
        k = uuid.uuid4().hex
        spark._clh_session_uid = k
    return k


# (session key, sf_dir, table) -> DataFrame. Re-reading parquet repeats
# file listing + footer reads; the logical plan is immutable, so the
# memo is safe and drops per-query fixed cost across a suite run.
_TABLE_MEMO: dict[tuple[str, str, str], DataFrame] = {}

# (session key, view name) -> sf_dir currently backing the temp view.
_VIEW_OWNER: dict[tuple[str, str], str] = {}


# Tables whose downstream stages are CPU-heavy enough that an
# unsplittable scan serializes real work (shingle explode + md5, JSON
# parse, window dedup, vector math). Tiny dims (region/nation/...)
# are excluded: they broadcast anyway and an exchange would only add
# noise to join-size estimation.
_WIDE_TABLES = {"events", "orders", "lineitem", "documents", "embeddings", "customer", "part"}


def normalize_timestamps(df: DataFrame, cols: list[str]) -> DataFrame:
    """Restore TIMESTAMP columns from whichever physical encoding the
    input parquet actually used (dtype-keyed, see module docstring).
    Handles every encoding the driver has shipped or plausibly could:
    bigint epoch-nanos, TIMESTAMP_NTZ, and ISO text."""
    dtypes = dict(df.dtypes)
    for c in cols:
        dt = dtypes.get(c)
        if dt == "bigint":
            # Integer division — double division loses precision on
            # epoch-nanos magnitudes (> 2^53).
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dt == "timestamp_ntz":
            # Session TZ is pinned UTC, so this cast is value-exact.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        elif dt == "string":
            # STRICT: with ANSI off, to_timestamp yields NULL (not an
            # error) for unparseable text — a regeneration shipping an
            # unrecognized format would silently null every timestamp,
            # the exact silent-mangling this module exists to prevent.
            # Probe with try_to_timestamp (NULL-safe under BOTH ansi
            # modes) for any non-null value the default parse drops and
            # fail loudly with the offending sample. One early-exit
            # job, paid only on the (currently unused) text encoding,
            # once per memoized load.
            dropped = F.col(c).isNotNull() & F.try_to_timestamp(F.col(c)).isNull()
            bad = df.where(dropped).select(c).limit(1).collect()
            if bad:
                raise ValueError(
                    f"normalize_timestamps: column {c!r} holds text "
                    f"timestamps the default parser cannot read (e.g. "
                    f"{bad[0][0]!r}); refusing to degrade to NULLs — "
                    f"add the format explicitly"
                )
            df = df.withColumn(c, F.to_timestamp(F.col(c)))
    return df


def parquet_layout(path: str) -> tuple[int, int]:
    """(total rows, total row groups) from parquet footers — the true
    upper bound on scan parallelism Spark can extract from the layout."""
    import pyarrow.parquet as pq

    files = [path] if os.path.isfile(path) else sorted(
        glob.glob(os.path.join(path, "*.parquet"))
    )
    rows = groups = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        rows += md.num_rows
        groups += md.num_row_groups
    return rows, groups


# Per-user cache root (uid in the path, mode 0700). A fixed world-shared
# path would let another local user pre-create the root and plant a
# '{name}-{mtime}-{size}-p{target}' entry, silently substituting table
# data (cache poisoning). The uid suffix keeps users on distinct roots;
# the ownership check below refuses a root someone else created first.
_CACHE_ROOT = os.environ.get(
    "SPARK_GRAFT_LAYOUT_CACHE",
    os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_layout-{os.getuid() if hasattr(os, 'getuid') else 'u'}",
    ),
)


def _trusted_cache_root() -> bool:
    """Create/verify the cache root: must exist, be OWNED by this uid,
    and be private (0700). Never trust — or write under — a root owned
    by anyone else."""
    try:
        os.makedirs(_CACHE_ROOT, mode=0o700, exist_ok=True)
        st = os.stat(_CACHE_ROOT)
        if hasattr(os, "getuid") and st.st_uid != os.getuid():
            return False
        os.chmod(_CACHE_ROOT, 0o700)
        return True
    except OSError:
        return False


def _prune_stale_entries(prefix: str, keep: str) -> None:
    """Drop cache entries for the same SOURCE (name + path hash) whose
    mtime+size key no longer matches — regenerations otherwise
    accumulate dead copies unboundedly. Scoped by source-path hash so
    two live tables that merely share a name never evict each other.

    Entries that share the LIVE mtime+size key but differ only in the
    -p{parallelism} suffix are kept: sessions with different core
    counts cache side-by-side, and pruning a sibling here yanked
    part files out from under a concurrent session's in-flight scan
    (round-12 incident: a local[8] probe evicted the local[32]
    sweep's entry mid-read)."""
    stem = os.path.basename(keep).rsplit("-p", 1)[0]  # {prefix}-{mtime}-{size}
    try:
        for d in glob.glob(os.path.join(_CACHE_ROOT, f"{prefix}-*")):
            if not os.path.basename(d).startswith(f"{stem}-p"):
                shutil.rmtree(d, ignore_errors=True)
    except OSError:
        pass


def _compacted_path(spark: SparkSession, path: str, name: str, target: int) -> str | None:
    """Compact an unsplittable table into a `target`-file parquet copy,
    once per (source path+mtime+size, parallelism); return the cached
    dir, or None if the rewrite isn't possible. Atomic-rename
    publication makes concurrent sessions safe (first writer wins)."""
    import hashlib

    if not _trusted_cache_root():
        return None
    st = os.stat(path)
    src_key = hashlib.sha256(os.path.abspath(path).encode()).hexdigest()[:12]
    prefix = f"{name}-{src_key}"
    dest = os.path.join(
        _CACHE_ROOT, f"{prefix}-{st.st_mtime_ns}-{st.st_size}-p{target}"
    )
    if os.path.isdir(dest):
        _prune_stale_entries(prefix, dest)
        return dest
    try:
        tmp = tempfile.mkdtemp(prefix=f"{name}_compact_", dir=_CACHE_ROOT)
        out = os.path.join(tmp, "data")
        # Write NORMALIZED rows so the cached files carry clean
        # TIMESTAMP types — re-reads skip conversion entirely.
        normalize_timestamps(
            spark.read.parquet(path), TIMESTAMP_COLS.get(name, [])
        ).repartition(target).write.mode("overwrite").parquet(out)
        try:
            os.rename(out, dest)
        except OSError:
            pass  # another session published first — use theirs
        shutil.rmtree(tmp, ignore_errors=True)
        if os.path.isdir(dest):
            _prune_stale_entries(prefix, dest)
            return dest
        return None
    except Exception:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, restoring TIMESTAMP columns and
    re-parallelizing unsplittable single-row-group layouts."""
    key = (session_key(spark), sf_dir, name)
    memo = _TABLE_MEMO.get(key)
    if memo is not None:
        return memo
    configure_session(spark)
    path = f"{sf_dir}/{name}.parquet"
    if not os.path.exists(path) and os.path.isdir(os.path.join(sf_dir, name)):
        # Directory-shaped table (multi-file) — the other layout a
        # driver regeneration could plausibly switch to.
        path = os.path.join(sf_dir, name)
    df = None
    if name in _WIDE_TABLES:
        target = spark.sparkContext.defaultParallelism
        rows, groups = parquet_layout(path)
        # Gate on the footer, not a guess: a many-file cluster table
        # already splits and must pay neither compaction nor exchange.
        if groups < target and rows > 0:
            cached = _compacted_path(spark, path, name, target)
            if cached is not None:
                df = spark.read.parquet(cached)  # already normalized
            else:
                # Read-only tmp etc.: fall back to an in-plan fan-out.
                df = normalize_timestamps(
                    spark.read.parquet(path), TIMESTAMP_COLS.get(name, [])
                ).repartition(target)
    if df is None:
        df = normalize_timestamps(
            spark.read.parquet(path), TIMESTAMP_COLS.get(name, [])
        )
    _TABLE_MEMO[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each testdata table as a temp view (bare name).

    Mirrors the DuckDB oracle environment, where the same parquet
    files are pre-registered as views with the same names.

    Registration is memoized: a view is only (re)registered when this
    session doesn't already have it pointing at the requested sf_dir,
    so suite runs don't pay repeated registration, while switching
    scale factors still swaps the views.
    """
    skey = session_key(spark)
    for name in tables or TABLES:
        key = (skey, name)
        if _VIEW_OWNER.get(key) == sf_dir:
            continue
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        _VIEW_OWNER[key] = sf_dir
