"""Parquet table sources for the synthetic test data.

The driver materializes TPC-H-ish tables plus ``events`` /
``documents`` / ``embeddings`` under ``/root/testdata/sf*/``
(TESTDATA.md).  The reconciliation operators (SURVEY.md §2.4) compare
a *source* table against a *target* replica; since the harness ships
no target copy, we derive one **deterministically** so the same
construction is expressible in the DuckDB oracle SQL:

- ``m = (l_orderkey*31 + l_linenumber) % 97``
- rows with ``m = 0``  are dropped          → MISSING_IN_TARGET
- rows with ``m = 1``  get ``l_quantity+1`` → DATA_MISMATCH
- rows with ``m = 2``  are duplicated into the target under key
  ``l_orderkey + 2000000000``               → MISSING_IN_SOURCE

This mirrors the drift classes the reference detects
(``src/models/reconciliation_mismatch.py:15-20``) with a reproducible
fixture instead of a live Cassandra/Postgres pair.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cass_cdc_pg_spark.session import configure

TABLES = (
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
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: lineitem composite primary key (mirrors the keyed-table model of
#: the reference's replicated tables, init-db.sql:146-195).
LINEITEM_PK = ("l_orderkey", "l_linenumber")


#: (applicationId, resolved path, stat fingerprint) → the loaded
#: DataFrame.  Catalog-style RELATION-METADATA memo (r16): every
#: ``spark.read.parquet`` call re-resolves the datasource and re-reads
#: the parquet footer schema (~150 ms of driver time per call on this
#: box), and query builders load 2-4 tables per construction — paid on
#: every timed pass of every query.  The memo returns the same
#: immutable DataFrame (a logical plan — no data, no results; every
#: execution still scans the parquet), exactly what a catalog table
#: does for a real deployment.  The stat fingerprint (size + mtime_ns)
#: invalidates on fixture regeneration, the applicationId on session
#: restart.
_TABLE_DF_CACHE: dict[tuple, DataFrame] = {}


def _stat_fingerprint(path: str):
    """Content fingerprint for the relation memo: for a file, its
    (size, mtime_ns); for a directory, the sorted (name, size,
    mtime_ns) of its entries — NOT the directory's own mtime, which
    ``_ensure_layout`` utime-touches on every LRU access.  A rebuild
    (rmtree + atomic rename) changes the entries' stats and
    invalidates; ``None`` (missing path) never caches a failed read's
    absence."""
    try:
        st = os.stat(path)
        if not os.path.isdir(path):
            return (st.st_size, st.st_mtime_ns)
        return tuple(
            sorted(
                (e.name, e.stat().st_size, e.stat().st_mtime_ns)
                for e in os.scandir(path)
            )
        )
    except OSError:
        return None


def read_parquet_cached(spark: SparkSession, path: str) -> DataFrame:
    """Relation-metadata-memoized ``spark.read.parquet`` (see
    ``_TABLE_DF_CACHE``) — shared by the source tables and the
    persisted index/artifact readers (standing containment index, LM
    count relations, band tables, IVF×PQ codes), whose per-build
    footer re-reads cost the same ~150 ms each."""
    fp = _stat_fingerprint(path)
    key = (spark.sparkContext.applicationId, path, fp)
    if key not in _TABLE_DF_CACHE or fp is None:
        configure(spark)
        # evict superseded entries for the SAME (appId, path) — a
        # rebuilt fixture/index leaves its old-fingerprint entry dead,
        # and the old wholesale clear() at >256 keys dropped LIVE
        # entries with it (r16 advice); insertion order makes the
        # overflow guard an oldest-first trim instead
        stale = [
            k for k in _TABLE_DF_CACHE
            if k[0] == key[0] and k[1] == path and k[2] != fp
        ]
        for k in stale:
            del _TABLE_DF_CACHE[k]
        while len(_TABLE_DF_CACHE) > 256:
            del _TABLE_DF_CACHE[next(iter(_TABLE_DF_CACHE))]
        _TABLE_DF_CACHE[key] = spark.read.parquet(path)
    return _TABLE_DF_CACHE[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_cached(spark, f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def events_with_micros(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts_us`` (µs since epoch, bigint).

    µs since epoch is the engine's canonical event-time: a plain
    bigint sorts/joins/windows without timezone semantics, and it is
    the shared precision with the DuckDB oracle (``epoch_us(ts)``).
    The physical ``ts`` column is dispatched on dtype, since parquet
    writers differ: TIMESTAMP(NANOS) arrives as bigint *nanoseconds*
    (via nanosAsLong) and is integer-divided; TIMESTAMP(MICROS)
    arrives as timestamp/timestamp_ntz and converts via
    ``unix_micros`` (the session timezone is pinned UTC in
    ``configure()``, so the NTZ→LTZ cast is the identity wall-clock
    mapping, exactly DuckDB's naive-as-UTC reading).
    """
    ev = load_table(spark, sf_dir, "events")
    dtype = dict(ev.dtypes).get("ts")
    if dtype == "bigint":
        ts_us = F.expr("ts div 1000")
    else:  # timestamp / timestamp_ntz at µs precision
        ts_us = F.expr("unix_micros(cast(ts as timestamp))")
    return ev.withColumn("ts_us", ts_us)


def _lineitem_mod(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "_m", (F.col("l_orderkey") * F.lit(31) + F.col("l_linenumber")) % F.lit(97)
    )


def perturbed_lineitem_target(lineitem: DataFrame) -> DataFrame:
    """Deterministic 'target replica' of lineitem (see module doc)."""
    src = _lineitem_mod(lineitem)
    kept = src.filter(F.col("_m") != 0)
    mutated = kept.withColumn(
        "l_quantity",
        F.when(F.col("_m") == 1, F.col("l_quantity") + 1).otherwise(F.col("l_quantity")),
    )
    extras = src.filter(F.col("_m") == 2).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(2000000000)
    )
    return mutated.unionByName(extras).drop("_m")


def perturbed_orders_target(orders: DataFrame) -> DataFrame:
    """Target replica of orders: ``m = o_orderkey % 89``; drop m=0,
    ``o_totalprice+1`` when m=1, duplicate m=2 under key+2e9."""
    src = orders.withColumn("_m", F.col("o_orderkey") % F.lit(89))
    kept = src.filter(F.col("_m") != 0)
    mutated = kept.withColumn(
        "o_totalprice",
        F.when(F.col("_m") == 1, F.col("o_totalprice") + 1).otherwise(
            F.col("o_totalprice")
        ),
    )
    extras = src.filter(F.col("_m") == 2).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(2000000000)
    )
    return mutated.unionByName(extras).drop("_m")


#: bump when the perturbation formulas change — invalidates the cache
PERTURB_VERSION = "v1"

_TARGET_BUILDERS = {
    "orders": perturbed_orders_target,
    "lineitem": perturbed_lineitem_target,
}


def _source_fingerprint(sf_dir: str, table: str) -> str:
    """Content fingerprint (sizes + mtimes) of the source parquet —
    regenerating the fixture at the same path invalidates every cache
    derived from it (ADVICE r2: a stale /tmp target replica must not
    survive a fixture rebuild)."""
    h = hashlib.md5()
    for f in sorted(_parquet_files(table_path(sf_dir, table))):
        st = os.stat(f)
        h.update(f"{f}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:12]


def _target_cache_dir(sf_dir: str, table: str) -> str:
    key = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    fp = _source_fingerprint(sf_dir, table)
    return f"/tmp/spark_graft_targets/{key}-{PERTURB_VERSION}/{table}-{fp}"


def ensure_target(spark: SparkSession, sf_dir: str, table: str) -> str:
    """Build the target replica if absent; return its path without
    opening a reader (Q1 counts it from parquet footers alone)."""
    path = _target_cache_dir(sf_dir, table)
    if not os.path.exists(f"{path}/_SUCCESS"):
        df = _TARGET_BUILDERS[table](load_table(spark, sf_dir, table))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the build race
    return path


def materialized_target(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """The 'target replica' as a **materialized parquet table**.

    The reference's target is a real Postgres table, not a view
    (``docker/postgres/init-db.sql:146-195``) — reconciliation scans
    it directly.  Deriving the perturbation inline instead makes every
    reconciliation query re-scan the source 2-3× (filter+union+mutate
    branches) and blocks parquet aggregate pushdown.  Materializing
    once per sf dir restores the real shape: target-side COUNT(*) is
    answered from parquet footer statistics, and filters/column
    pruning push into the target scan.

    The write is atomic (tmp dir + rename); concurrent builders race
    benignly — the loser discards its tmp dir.
    """
    return spark.read.parquet(ensure_target(spark, sf_dir, table))


def ensure_targets(spark: SparkSession, sf_dir: str) -> None:
    """Pre-materialize all target replicas (bench warmup hook)."""
    for t in _TARGET_BUILDERS:
        materialized_target(spark, sf_dir, t)


#: PKs for the bucketed reconciliation pairs.  32 buckets = one per
#: local core; at cluster scale this is sized to executor count.
RECON_BUCKETS = 32


def bucketed_pair(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    pk: list[str],
    checksum_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Source + target replica as catalog tables hash-bucketed and
    sorted on the PK — the 100 TB reconciliation shape: bucket both
    sides once at write time, then every checksum_diff full-outer join
    plans with **no Exchange and no Sort** (scans are already
    partitioned+sorted on the join key).  The reference re-scans
    Postgres/Cassandra per reconciliation run
    (``reconciliation_engine.py:423-459``); bucketing amortizes that
    into the write path instead.

    With *checksum_cols*, each side is written with a ``_ck`` canonical
    checksum column so per-run reconciliation never recomputes
    sha256/canonicalization — the run is a narrow (pk, _ck) scan plus
    a zipped sort-merge join (``checksum_diff_precomputed``).

    Spark's in-memory catalog forgets bucketing metadata between
    sessions, so the pair is (re)built per session; within a session
    it is built once and reused.
    """
    from cass_cdc_pg_spark.functions.checksum import row_checksum
    from cass_cdc_pg_spark.operators.reconcile import register_bucketed

    key = hashlib.md5(
        f"{os.path.realpath(sf_dir)}:{_source_fingerprint(sf_dir, table)}".encode()
    ).hexdigest()[:8]
    ck = "ck" if checksum_cols else "raw"
    names = (f"recon_{table}_src_{ck}_{key}", f"recon_{table}_tgt_{ck}_{key}")
    if all(spark.catalog.tableExists(n) for n in names):
        return spark.table(names[0]), spark.table(names[1])

    def _with_ck(df: DataFrame) -> DataFrame:
        if not checksum_cols:
            return df
        return df.withColumn("_ck", row_checksum(df, checksum_cols))

    s = register_bucketed(
        spark,
        _with_ck(load_table(spark, sf_dir, table)),
        names[0],
        pk,
        RECON_BUCKETS,
    )
    t = register_bucketed(
        spark,
        _with_ck(materialized_target(spark, sf_dir, table)),
        names[1],
        pk,
        RECON_BUCKETS,
    )
    return s, t


def _parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        )
    return out


def _footer_rows(f: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f).metadata.num_rows


#: (file-set fingerprint) → row count; footer re-reads are pure waste
#: when the files haven't changed (reconciliation re-counts the same
#: replica every run).
_FOOTER_COUNT_CACHE: dict[str, int] = {}


def stats_row_count(spark: SparkSession, path: str) -> int:
    """COUNT(*) answered from parquet footer statistics — the same
    metadata-only count DuckDB and DSv2 ``PushedAggregation: COUNT(*)``
    perform; no data pages are read.

    Counts are memoized per (file name, size, mtime) set — a stat()
    sweep per call, footer opens only when something changed.  Footers
    are read on the driver up to a file-count threshold; past it the
    reads fan out as one Spark task per ~64 files, so a 100 TB table
    with 100k files counts in one tiny metadata-only job instead of a
    full scan.
    """
    files = _parquet_files(path)
    h = hashlib.md5()
    for f in sorted(files):
        st = os.stat(f)
        h.update(f"{f}:{st.st_size}:{st.st_mtime_ns}".encode())
    key = h.hexdigest()
    if key in _FOOTER_COUNT_CACHE:
        return _FOOTER_COUNT_CACHE[key]
    if len(files) <= 1024:
        n = sum(_footer_rows(f) for f in files)
    else:
        sc = spark.sparkContext
        slices = max(1, len(files) // 64)
        n = sc.parallelize(files, slices).map(_footer_rows).sum()
    _FOOTER_COUNT_CACHE[key] = n
    return n


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


#: SQL fragments recreating the same perturbations for the DuckDB
#: oracle.  Any change here must stay in lock-step with the DataFrame
#: builders above.
LINEITEM_TGT_SQL = """
    SELECT * REPLACE (
        CASE WHEN (l_orderkey*31 + l_linenumber) % 97 = 1
             THEN l_quantity + 1 ELSE l_quantity END AS l_quantity)
    FROM lineitem
    WHERE (l_orderkey*31 + l_linenumber) % 97 <> 0
    UNION ALL
    SELECT * REPLACE (l_orderkey + 2000000000 AS l_orderkey)
    FROM lineitem
    WHERE (l_orderkey*31 + l_linenumber) % 97 = 2
"""

ORDERS_TGT_SQL = """
    SELECT * REPLACE (
        CASE WHEN o_orderkey % 89 = 1
             THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice)
    FROM orders
    WHERE o_orderkey % 89 <> 0
    UNION ALL
    SELECT * REPLACE (o_orderkey + 2000000000 AS o_orderkey)
    FROM orders
    WHERE o_orderkey % 89 = 2
"""
