"""Bucketed-parquet keyed table with LWW merge — the engine's
replicated-table store.

Plays the role of the reference's Postgres ``cdc_{table}`` tables
(``docker/postgres/init-db.sql:146-195``): current row state per key,
metadata columns ``_cdc_deleted`` / ``_cdc_timestamp_micros`` /
``_last_event_id`` / ``_ttl_expiry_timestamp_us``, maintained by the
conditional LWW upsert (``timestamp_conflict_resolver.py:247-285``).

This container ships no Delta/Iceberg, so MERGE is implemented
directly over parquet with the **LSM shape** those formats use for
merge-on-read:

- rows live under ``bucket = pmod(xxhash64(key), n)``; each bucket has
  a *base* file set plus an ordered list of *delta* file sets;
- a merge LWW-reduces the incoming batch (intra-batch dedup) and
  appends it as a new delta, partitioned by bucket — **cost is
  O(batch), never O(table)**: base files are not read and not
  rewritten;
- reads union base+deltas and LWW-reduce per key (merge-on-read);
  buckets with no deltas skip the reduce;
- a bucket whose delta count exceeds ``compact_threshold`` is
  compacted (base∪deltas → LWW reduce → new base) — the amortized
  O(table/threshold) background cost that keeps reads fast.

At 100 TB this is exactly the upsert cost model of Delta/Hudi MoR:
ingest throughput is bounded by batch size, not table size; bucket
count spreads compaction work (thousands of buckets for TB-scale
tables — set ``num_buckets`` accordingly; it is fixed at table
creation like any hash-bucketing scheme).

Writes are atomic-by-manifest: delta/base dirs are written first, then
the fsync'd manifest swaps in one ``os.replace`` — a crash mid-merge
leaves the previous manifest (and thus the previous snapshot) intact,
which is what makes ``foreachBatch`` replays idempotent (C5 / crash
tests ``test_crash_recovery.py:41-343``).  Orphaned dirs from crashed
writes are garbage-collected on the next successful commit.

Filesystem note: commit atomicity relies on POSIX ``os.replace`` of
the single manifest file (data dirs are immutable once written, so
only the pointer swap needs atomicity).  On an object store (S3/GCS)
replace that one operation with a conditional PUT (If-Match /
x-goog-if-generation-match) or a DynamoDB/ZooKeeper-style commit lock
— the same adaptation every manifest-pointer table format (Delta,
Iceberg) ships for S3.  Everything else is plain immutable-object
writes that object stores already provide.
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
        compact_threshold: int = 8,
        keep_versions: int = 2,
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.key_cols = list(key_cols)
        self.num_buckets = num_buckets
        self.compact_threshold = compact_threshold
        self.keep_versions = keep_versions
        os.makedirs(self.path, exist_ok=True)
        # bucket count is a property of the TABLE, fixed at creation
        # (like any hash-bucketing scheme) — an existing manifest
        # overrides the constructor arg, so opening a table with the
        # wrong count can't mis-prune reads or mis-route merges
        try:
            with open(self._manifest_path) as f:
                m = json.load(f)
            if m.get("num_buckets"):
                self.num_buckets = m["num_buckets"]
            # key columns are likewise a fixed property of the table;
            # the persisted value is what discovery reports and what
            # reopening with a mismatched ctor arg must not corrupt
            if m.get("key_cols"):
                self.key_cols = list(m["key_cols"])
        except FileNotFoundError:
            pass

    # -- manifest -----------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return f"{self.path}/_manifest.json"

    def _read_manifest(self) -> dict[str, dict]:
        """bucket-id (str) → {"base": dir|None, "deltas": [dir, ...]}."""
        try:
            with open(self._manifest_path) as f:
                buckets = json.load(f)["buckets"]
        except FileNotFoundError:
            return {}
        # migrate the pre-LSM format (bucket → snapshot dir string)
        return {
            b: (e if isinstance(e, dict) else {"base": e, "deltas": []})
            for b, e in buckets.items()
        }

    def _write_manifest(
        self,
        buckets: dict[str, dict],
        op: str = "unknown",
        added: list[str] | None = None,
    ) -> None:
        version = self._current_version() + 1
        doc = {
            "buckets": buckets,
            "num_buckets": self.num_buckets,
            "key_cols": self.key_cols,
            "updated_at": time.time(),
            "version": version,
            # change-feed provenance: what kind of commit this was and
            # which data dirs it ADDED (see read_changes)
            "op": op,
            "added": list(added or ()),
        }
        tmp = f"{self._manifest_path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(doc, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)
        # version log AFTER the pointer swap: the swap is the commit;
        # a crash here costs only this version's history entry (reads
        # of the CURRENT version never consult the log), never
        # correctness of the committed snapshot
        os.makedirs(self._log_dir, exist_ok=True)
        log_tmp = f"{self._log_dir}/.tmp.{uuid.uuid4().hex}"
        with open(log_tmp, "w") as f:
            json.dump(doc, f)
        os.replace(log_tmp, f"{self._log_dir}/manifest.v{version:012d}.json")

    # -- versioned history / time travel ------------------------------------

    @property
    def _log_dir(self) -> str:
        return f"{self.path}/_log"

    def _current_version(self) -> int:
        try:
            with open(self._manifest_path) as f:
                return int(json.load(f).get("version", 0))
        except FileNotFoundError:
            return 0

    def _log_versions(self) -> dict[int, str]:
        try:
            names = os.listdir(self._log_dir)
        except FileNotFoundError:
            return {}
        out = {}
        for n in names:
            if n.startswith("manifest.v") and n.endswith(".json"):
                out[int(n[len("manifest.v"):-len(".json")])] = f"{self._log_dir}/{n}"
        return out

    def history(self) -> list[dict]:
        """Retained versions, ascending: version, updated_at,
        n_buckets.  The time-travel analog of a manifest-pointer
        format's transaction log (Delta's ``DESCRIBE HISTORY``); the
        reference instead audits mutations to a Postgres audit table
        (``src/services/audit_service.py``) — same operational need,
        storage-level here so reads can actually bind to a version."""
        out = []
        for v, p in sorted(self._log_versions().items()):
            try:
                with open(p) as f:
                    doc = json.load(f)
            except (FileNotFoundError, json.JSONDecodeError):
                continue
            out.append(
                {
                    "version": v,
                    "updated_at": doc.get("updated_at"),
                    "n_buckets": len(doc.get("buckets", {})),
                }
            )
        return out

    def _manifest_at(self, version: int) -> dict[str, dict]:
        cur = self._current_version()
        if version == cur:
            return self._read_manifest()
        path = self._log_versions().get(version)
        if path is None:
            raise FileNotFoundError(
                f"version {version} not retained at {self.path} "
                f"(keep_versions={self.keep_versions}, current={cur})"
            )
        with open(path) as f:
            buckets = json.load(f)["buckets"]
        return {
            b: (e if isinstance(e, dict) else {"base": e, "deltas": []})
            for b, e in buckets.items()
        }

    def _version_doc(self, version: int) -> dict:
        path = self._log_versions().get(version)
        if path is not None:
            with open(path) as f:
                return json.load(f)
        if version == self._current_version():
            # the pointer swap committed but the crash window ate the
            # log copy — the manifest itself carries the same doc
            with open(self._manifest_path) as f:
                return json.load(f)
        raise FileNotFoundError(
            f"version {version} not retained at {self.path} "
            f"(keep_versions={self.keep_versions}, "
            f"current={self._current_version()})"
        )

    def read_changes(
        self, since_version: int, to_version: int | None = None
    ) -> DataFrame | None:
        """Change feed: the rows upserted by every **merge** commit in
        ``(since_version, to_version]``, stamped with
        ``_change_version`` — the Delta-CDF analog over the version
        log, and the input contract of the incremental materialized
        views (``streaming/incremental_view.py``).

        Cost is O(changed rows): each merge commit's ``added`` delta
        dirs are read directly — base files are never touched, no
        snapshot diff, no shuffle (the reader applies its own LWW
        fold if it needs net-effect rather than per-commit rows).
        Deletes arrive as rows with ``_cdc_deleted = true`` (the
        tombstone contract of the merge path), so the feed is
        self-contained for downstream state maintenance.

        Compaction commits are skipped (they rewrite bytes, not
        state).  Any OTHER commit kind in the range — retention
        rewrites, GDPR erasure, TTL sweeps (``op="rewrite"``) —
        raises ``ValueError``: those change state without leaving
        per-row deltas, so a feed consumer must resync from a
        snapshot, exactly the "non-append change breaks streaming
        reads" contract of Delta/Iceberg CDF.  A range older than
        *keep_versions* raises ``FileNotFoundError``."""
        to_version = (
            self._current_version() if to_version is None else to_version
        )
        dirs: list[tuple[str, int]] = []
        for v in range(since_version + 1, to_version + 1):
            doc = self._version_doc(v)
            op = doc.get("op", "unknown")
            if op == "compact":
                continue
            if op != "merge":
                raise ValueError(
                    f"version {v} is a {op!r} commit — state changed "
                    "without per-row deltas; resync from read("
                    f"version={v}) and restart the feed from there"
                )
            dirs.extend((d, v) for d in doc.get("added", ()))
        if not dirs:
            return None
        out = None
        for d, v in dirs:
            part = (
                self.spark.read.parquet(f"{self.path}/{d}")
                .drop("bucket")
                .withColumn("_change_version", F.lit(v).cast("int"))
            )
            # allowMissingColumns: commits from before an ADD_COLUMN
            # evolution lack the new column; the feed backfills NULL,
            # same as the snapshot read's mergeSchema
            out = (
                part
                if out is None
                else out.unionByName(part, allowMissingColumns=True)
            )
        return out

    # -- helpers ------------------------------------------------------------

    def _require_keys(self) -> None:
        # A legacy manifest without persisted key_cols plus an empty
        # constructor list would make _reduce group by NOTHING —
        # lww_latest would collapse every bucket to one row.  Refuse
        # loudly rather than silently destroy data (a maintenance verb
        # like compact() rewrites bases durably).
        if not self.key_cols:
            raise ValueError(
                f"KeyedTable at {self.path} has no key columns: the "
                "manifest predates key_cols persistence and none were "
                "passed to the constructor. Re-open the table with "
                "explicit key_cols before reading or compacting."
            )

    def _bucket_col(self):
        self._require_keys()
        return F.pmod(F.xxhash64(*self.key_cols), F.lit(self.num_buckets))

    def exists(self) -> bool:
        return bool(self._read_manifest())

    def _bucket_dirs(self, b: str, entry: dict) -> list[str]:
        dirs = []
        if entry.get("base"):
            dirs.append(f"{self.path}/{entry['base']}/bucket={b}")
        dirs.extend(f"{self.path}/{d}/bucket={b}" for d in entry.get("deltas", ()))
        return dirs

    def _reduce(self, df: DataFrame) -> DataFrame:
        self._require_keys()
        return lww_latest(
            df,
            self.key_cols,
            ts_col="_cdc_timestamp_micros",
            tiebreak_col="_last_event_id",
        )

    def read(
        self, buckets: list[int] | None = None, version: int | None = None
    ) -> DataFrame:
        """State per key (incl. soft-deleted tombstones) — the current
        snapshot, or, with *version*, a retained historical one (time
        travel: data dirs are immutable and the version log pins which
        ones each version saw, so a historical read is just a scan of
        that version's dir set; raises FileNotFoundError for a version
        GC'd past *keep_versions*).

        Merge-on-read: buckets carrying deltas are LWW-reduced; a
        fully-compacted table is a plain parquet scan."""
        manifest = (
            self._read_manifest()
            if version is None
            else self._manifest_at(version)
        )
        if not manifest:
            raise FileNotFoundError(f"empty keyed table at {self.path}")
        wanted = (
            manifest.items()
            if buckets is None
            else [(b, manifest[b]) for b in map(str, buckets) if b in manifest]
        )
        dirs: list[str] = []
        has_deltas = False
        for b, entry in wanted:
            dirs.extend(self._bucket_dirs(b, entry))
            has_deltas = has_deltas or bool(entry.get("deltas"))
        if not dirs:
            return None  # no state for these buckets yet
        # mergeSchema: buckets/deltas written before an ADD_COLUMN
        # evolution lack the new column; the merged read backfills NULL
        df = self.spark.read.option("mergeSchema", "true").parquet(*sorted(set(dirs)))
        return self._reduce(df) if has_deltas else df

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

        O(batch): the intra-batch LWW reduce (C1a) plus one delta
        write.  Base files are neither read nor rewritten — conflict
        resolution against existing state happens lazily at read time
        and durably at compaction (C1b), both through the same total
        order, so any interleaving/replay converges (C5/C6).
        """
        missing = [c for c in (*self.key_cols, *META_COLS) if c not in batch.columns]
        if missing:
            raise ValueError(f"merge batch missing columns: {missing}")

        reduced = lww_latest(
            batch.withColumn("_bucket", self._bucket_col()),
            [*self.key_cols, "_bucket"],
            ts_col="_cdc_timestamp_micros",
            tiebreak_col="_last_event_id",
        )
        delta = f"delta-{uuid.uuid4().hex[:12]}"
        (
            reduced.repartition("_bucket")
            .write.partitionBy("_bucket")
            .mode("overwrite")
            .parquet(f"{self.path}/{delta}")
        )
        # the written partition dirs ARE the touched-bucket set — no
        # extra job needed to discover it
        touched = []
        for d in os.listdir(f"{self.path}/{delta}"):
            if d.startswith("_bucket="):
                b = d.split("=", 1)[1]
                os.rename(f"{self.path}/{delta}/{d}", f"{self.path}/{delta}/bucket={b}")
                touched.append(b)
        if not touched:
            shutil.rmtree(f"{self.path}/{delta}", ignore_errors=True)
            return
        manifest = self._read_manifest()
        for b in touched:
            entry = manifest.setdefault(b, {"base": None, "deltas": []})
            entry["deltas"].append(delta)
        self._write_manifest(manifest, op="merge", added=[delta])
        self._compact_if_needed(manifest)
        self._gc(self._read_manifest())

    def upsert(self, rows: DataFrame, now_us: int | None = None) -> None:
        """Q14 unconditional upsert (``postgresql_repository.py:179-247``,
        ``INSERT … ON CONFLICT DO UPDATE`` with no guard): the incoming
        rows replace current state for their keys regardless of event
        time.  Expressed in the LWW engine by stamping the batch with
        wall-clock now (which outranks any replicated event timestamp)
        — the same effective semantics as the reference's last-writer
        unconditional form.  *rows* carries key + payload columns only;
        metadata is stamped here."""
        now_us = now_us or int(time.time() * 1_000_000)
        stamped = (
            rows.withColumn("_cdc_deleted", F.lit(False))
            .withColumn("_cdc_timestamp_micros", F.lit(now_us).cast("long"))
            .withColumn("_last_event_id", F.expr("uuid()"))
            .withColumn("_ttl_expiry_timestamp_us", F.lit(None).cast("long"))
        )
        self.merge(stamped)

    def overwrite(self, state: DataFrame) -> None:
        """Replace the ENTIRE table state with *state* (key cols +
        META_COLS + payload) in ONE atomic rewrite commit — the
        restore/resync verb (consumer side of the CDF rewrite
        contract, ``streaming/follower.py``).  Every bucket is
        republished, so rows absent from *state* — e.g. GDPR
        hard-deleted upstream, with no tombstone — are gone afterward,
        which a merge could never do.  Commits as ``op="rewrite"``:
        this table's OWN feed consumers must resync in turn."""
        missing = [c for c in (*self.key_cols, *META_COLS) if c not in state.columns]
        if missing:
            raise ValueError(f"overwrite state missing columns: {missing}")
        reduced = self._reduce(state).withColumn("_bucket", self._bucket_col())
        self._publish(reduced, list(range(self.num_buckets)), op="rewrite")

    # -- compaction ---------------------------------------------------------

    def _compact_if_needed(self, manifest: dict[str, dict]) -> None:
        over = [
            int(b)
            for b, e in manifest.items()
            if len(e.get("deltas", ())) >= self.compact_threshold
        ]
        if over:
            self.compact(over)

    def compact(self, buckets: list[int] | None = None) -> int:
        """Fold deltas into a new base for *buckets* (default: every
        bucket carrying deltas).  Returns number of buckets compacted."""
        manifest = self._read_manifest()
        targets = [
            b
            for b, e in manifest.items()
            if e.get("deltas")
            and (buckets is None or int(b) in set(buckets))
        ]
        if not targets:
            return 0
        dirs: list[str] = []
        for b in targets:
            dirs.extend(self._bucket_dirs(b, manifest[b]))
        df = self.spark.read.option("mergeSchema", "true").parquet(*sorted(set(dirs)))
        merged = self._reduce(df).withColumn("_bucket", self._bucket_col())
        self._publish(merged, targets, op="compact")
        return len(targets)

    def _publish(
        self, df_with_bucket: DataFrame, buckets: list, op: str = "rewrite"
    ) -> None:
        """Write *df_with_bucket* as the new **base** of *buckets*
        (deltas cleared) and swap the manifest atomically.  A bucket
        that ends up empty gets an empty-schema marker dir."""
        snap_name = f"snap-{uuid.uuid4().hex[:12]}"
        snap = f"{self.path}/{snap_name}"
        (
            df_with_bucket.repartition(max(len(buckets), 1), "_bucket")
            .write.partitionBy("_bucket")
            .mode("overwrite")
            .parquet(snap)
        )
        manifest = self._read_manifest()
        for b in map(str, buckets):
            src_dir = f"{snap}/_bucket={b}"
            if os.path.isdir(src_dir):
                os.rename(src_dir, f"{snap}/bucket={b}")
            else:
                df_with_bucket.drop("_bucket").limit(0).write.mode(
                    "overwrite"
                ).parquet(f"{snap}/bucket={b}")
            manifest[b] = {"base": snap_name, "deltas": []}
        self._write_manifest(manifest, op=op, added=[snap_name])
        self._gc(manifest)

    def _gc(self, manifest: dict[str, dict]) -> None:
        """Drop snapshot/delta dirs nothing points at anymore — where
        "anything" includes the retained version log: a dir referenced
        only by a historical version stays until that version ages
        past *keep_versions* (so time travel keeps working), exactly
        the retention/VACUUM contract of manifest-pointer formats.
        Log files older than the retention window are pruned first,
        which is what releases their dirs."""
        cur = self._current_version()
        for v, p in self._log_versions().items():
            if v <= cur - self.keep_versions:
                try:
                    os.remove(p)
                except OSError:
                    pass
        live = set()
        for e in manifest.values():
            if e.get("base"):
                live.add(e["base"])
            live.update(e.get("deltas", ()))
        for v, p in self._log_versions().items():
            try:
                with open(p) as f:
                    for e in json.load(f)["buckets"].values():
                        if isinstance(e, dict):
                            if e.get("base"):
                                live.add(e["base"])
                            live.update(e.get("deltas", ()))
                        else:
                            live.add(e)
            except (OSError, json.JSONDecodeError, KeyError):
                continue
        for d in os.listdir(self.path):
            if (d.startswith("snap-") or d.startswith("delta-")) and d not in live:
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
        self._publish(updated, list(self._read_manifest()))
        return n

    def expire_ttl(self, now_us: int | None = None) -> int:
        """TTL sweep (T10): hard-delete rows whose expiry passed."""
        now_us = now_us or int(time.time() * 1_000_000)
        return self.delete_where(
            F.col("_ttl_expiry_timestamp_us").isNotNull()
            & (F.col("_ttl_expiry_timestamp_us") < F.lit(now_us))
        )
