"""Bucketed-parquet keyed table with LWW merge — the engine's
replicated-table store.

Plays the role of the reference's Postgres ``cdc_{table}`` tables
(``docker/postgres/init-db.sql:146-195``): current row state per key,
metadata columns ``_cdc_deleted`` / ``_cdc_timestamp_micros`` /
``_last_event_id`` / ``_ttl_expiry_timestamp_us``, maintained by the
conditional LWW upsert (``timestamp_conflict_resolver.py:247-285``).

This container ships no Delta/Iceberg, so MERGE is implemented
directly over parquet with the same *partition-pruned rewrite* shape
those formats use:

- rows live under ``bucket=<pmod(xxhash64(key), n)>`` partitions;
- a merge hashes the incoming batch to its buckets, reads **only
  those buckets** (partition pruning on the bucket filter), unions,
  LWW-reduces per key, and rewrites **only those buckets** (dynamic
  partition overwrite).

Cost per merge is O(touched buckets), not O(table) — the property
that keeps upsert viable at 100 TB (with Delta/Iceberg you'd swap
``_merge_impl`` for ``MERGE INTO``; the surrounding semantics are
identical and the tests pin them).

Writes are made atomic-by-rename: each merge writes the new bucket
files to a staging dir, then swaps pointers via an fsync'd manifest —
a crash mid-merge leaves the previous manifest (and thus the previous
snapshot) intact, which is what makes ``foreachBatch`` replays
idempotent (C5 / crash tests ``test_crash_recovery.py:41-343``).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cass_cdc_pg_spark.operators.lww import lww_latest

META_COLS = (
    "_cdc_deleted",
    "_cdc_timestamp_micros",
    "_last_event_id",
    "_ttl_expiry_timestamp_us",
)


class KeyedTable:
    """Upsert-maintained current-state table keyed on *key_cols*."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        num_buckets: int = 32,
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.key_cols = list(key_cols)
        self.num_buckets = num_buckets
        os.makedirs(self.path, exist_ok=True)

    # -- manifest -----------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return f"{self.path}/_manifest.json"

    def _read_manifest(self) -> dict[str, str]:
        """bucket-id (str) → snapshot dir currently holding that bucket."""
        try:
            with open(self._manifest_path) as f:
                return json.load(f)["buckets"]
        except FileNotFoundError:
            return {}

    def _write_manifest(self, buckets: dict[str, str]) -> None:
        tmp = f"{self._manifest_path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"buckets": buckets, "updated_at": time.time()}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)

    # -- helpers ------------------------------------------------------------

    def _bucket_col(self):
        return F.pmod(F.xxhash64(*self.key_cols), F.lit(self.num_buckets))

    def exists(self) -> bool:
        return bool(self._read_manifest())

    def read(self, buckets: list[int] | None = None) -> DataFrame:
        """Current state (all rows, incl. soft-deleted tombstones)."""
        manifest = self._read_manifest()
        if not manifest:
            raise FileNotFoundError(f"empty keyed table at {self.path}")
        wanted = (
            manifest.items()
            if buckets is None
            else [(b, manifest[str(b)]) for b in map(str, buckets) if b in manifest]
        )
        dirs = sorted({f"{snap}/bucket={b}" for b, snap in wanted})
        if not dirs:
            return None  # no state for these buckets yet
        # mergeSchema: buckets written before an ADD_COLUMN evolution
        # lack the new column; the merged read backfills it as NULL
        return self.spark.read.option("mergeSchema", "true").parquet(*dirs)

    def read_live(self) -> DataFrame:
        """Visible rows: not soft-deleted, TTL not expired (T10 view)."""
        now_us = int(time.time() * 1_000_000)
        df = self.read()
        return df.filter(~F.col("_cdc_deleted")).filter(
            F.col("_ttl_expiry_timestamp_us").isNull()
            | (F.col("_ttl_expiry_timestamp_us") >= F.lit(now_us))
        )

    # -- merge --------------------------------------------------------------

    def merge(self, batch: DataFrame) -> None:
        """LWW-upsert *batch* (must carry key cols + META_COLS).

        The batch need not be pre-deduped; the LWW reduce handles
        intra-batch duplicates and replays in the same pass (C1+C5).
        """
        missing = [c for c in (*self.key_cols, *META_COLS) if c not in batch.columns]
        if missing:
            raise ValueError(f"merge batch missing columns: {missing}")

        batch = batch.withColumn("_bucket", self._bucket_col())
        # Small CDC microbatches: the touched-bucket set is tiny; at
        # scale this collect is ≤ num_buckets ints, never data rows.
        touched = [r[0] for r in batch.select("_bucket").distinct().collect()]
        if not touched:
            return

        manifest = self._read_manifest()
        current = self.read(buckets=touched) if manifest else None
        if current is not None:
            current = current.withColumn("_bucket", self._bucket_col())
            # align schemas (schema evolution: new cols appear as NULL
            # in old snapshots — ADD_COLUMN path, `auto.evolve`)
            for c in batch.columns:
                if c not in current.columns:
                    current = current.withColumn(
                        c, F.lit(None).cast(batch.schema[c].dataType)
                    )
            current = current.select(*batch.columns)
            merged = lww_latest(
                current.unionByName(batch),
                [*self.key_cols, "_bucket"],
                ts_col="_cdc_timestamp_micros",
                tiebreak_col="_last_event_id",
            )
        else:
            merged = lww_latest(
                batch,
                [*self.key_cols, "_bucket"],
                ts_col="_cdc_timestamp_micros",
                tiebreak_col="_last_event_id",
            )

        self._publish(merged, touched)

    def _publish(self, df_with_bucket: DataFrame, touched: list[int]) -> None:
        """Write *df_with_bucket* (must carry ``_bucket``) as the new
        content of the *touched* buckets and swap the manifest
        atomically.  A bucket that ends up empty gets an empty-schema
        marker dir so reads stay consistent."""
        snap = f"{self.path}/snap-{uuid.uuid4().hex[:12]}"
        (
            df_with_bucket.repartition(max(len(touched), 1), "_bucket")
            .write.partitionBy("_bucket")
            .mode("overwrite")
            .parquet(snap)
        )
        # parquet writer materializes dirs named `_bucket=<n>`; keep
        # manifest keys as plain bucket ids
        manifest = dict(self._read_manifest())
        for b in touched:
            src_dir = f"{snap}/_bucket={b}"
            if os.path.isdir(src_dir):
                os.rename(src_dir, f"{snap}/bucket={b}")
            else:
                # bucket emptied entirely: write an empty marker dir
                df_with_bucket.drop("_bucket").limit(0).write.mode(
                    "overwrite"
                ).parquet(f"{snap}/bucket={b}")
            manifest[str(b)] = snap
        self._write_manifest(manifest)
        self._gc(manifest)

    def _gc(self, manifest: dict[str, str]) -> None:
        """Drop snapshot dirs no bucket points at anymore."""
        live = {os.path.basename(s) for s in manifest.values()}
        for d in os.listdir(self.path):
            if d.startswith("snap-") and d not in live:
                shutil.rmtree(f"{self.path}/{d}", ignore_errors=True)

    # -- maintenance (T10/T12/Q18/Q19) -------------------------------------

    def delete_where(self, predicate) -> int:
        """Hard delete (T12/Q18): rewrite buckets dropping matches.

        NULL-safe: a predicate evaluating to NULL on a row (e.g. a
        comparison against a NULL column) means "no match" — the row
        is KEPT and not counted, never silently dropped.  (GDPR-erasure
        path; silent loss here would be unrecoverable.)

        Returns number of rows removed."""
        hit = F.coalesce(predicate, F.lit(False))
        df = self.read().withColumn("_bucket", self._bucket_col())
        hits = df.filter(hit)
        touched = [r[0] for r in hits.select("_bucket").distinct().collect()]
        if not touched:
            return 0
        n = hits.count()
        keep = (
            self.read(buckets=touched)
            .withColumn("_bucket", self._bucket_col())
            .filter(~hit)
        )
        self._publish(keep, touched)
        return n

    def soft_delete_all(self, ts_us: int, event_id: str = "") -> int:
        """TRUNCATE semantics (``change_event.py:115``): soft-delete
        every current row the truncate event wins over by LWW order
        ((ts, event_id) strictly greater than the row's).  Losing rows
        (written after the truncate) are untouched, so out-of-order
        delivery converges exactly like C1-C4.

        Returns number of rows tombstoned."""
        if not self.exists():
            return 0
        wins = (F.col("_cdc_timestamp_micros") < F.lit(ts_us)) | (
            (F.col("_cdc_timestamp_micros") == F.lit(ts_us))
            & (F.col("_last_event_id") < F.lit(event_id))
        )
        df = self.read().withColumn("_bucket", self._bucket_col())
        df = df.withColumn("_trunc_win", F.coalesce(wins, F.lit(False)))
        n = df.filter(F.col("_trunc_win") & ~F.col("_cdc_deleted")).count()
        updated = (
            df.withColumn(
                "_cdc_deleted",
                F.when(F.col("_trunc_win"), F.lit(True)).otherwise(F.col("_cdc_deleted")),
            )
            .withColumn(
                "_cdc_timestamp_micros",
                F.when(F.col("_trunc_win"), F.lit(ts_us)).otherwise(
                    F.col("_cdc_timestamp_micros")
                ),
            )
            .withColumn(
                "_last_event_id",
                F.when(F.col("_trunc_win"), F.lit(event_id)).otherwise(
                    F.col("_last_event_id")
                ),
            )
            .drop("_trunc_win")
        )
        touched = [int(b) for b in self._read_manifest()]
        self._publish(updated, touched)
        return n

    def expire_ttl(self, now_us: int | None = None) -> int:
        """TTL sweep (T10): hard-delete rows whose expiry passed."""
        now_us = now_us or int(time.time() * 1_000_000)
        return self.delete_where(
            F.col("_ttl_expiry_timestamp_us").isNotNull()
            & (F.col("_ttl_expiry_timestamp_us") < F.lit(now_us))
        )
