"""CDC ingest pipeline (SURVEY.md §3.1) on Structured Streaming.

Source → parse (S2/S3) → validate/split (T7/S5) → unwrap+type (T1/T8)
→ cdc metadata+TTL (T4-T6/T9) → intra-batch LWW dedup (C1a) →
keyed-table merge (C1b/S4), with the DLQ appended per batch.

One streaming query serves all tables (the reference's
``subscribePattern cdc-events-.*``): ``foreachBatch`` fans out by
``source_table``.  Checkpointing is Spark's ``checkpointLocation`` —
offsets+commits replace the reference's ``_cdc_checkpoints`` table —
and end-to-end effectively-once = checkpoint replay + idempotent LWW
merge (C5).

Backpressure (C8 / FR-024): ``maxFilesPerTrigger`` here,
``maxOffsetsPerTrigger`` on a Kafka source — native rate limiting.

Test transport is a JSONL directory source (file streams are the
Kafka stand-in this container supports); ``kafka_stream`` shows the
production wiring, gated on the connector jar being present.
"""

from __future__ import annotations

import os
import time as _time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cass_cdc_pg_spark.monitoring import METRICS
from cass_cdc_pg_spark.plans.keyed_table import KeyedTable
from cass_cdc_pg_spark.schema import CHANGE_EVENT_SCHEMA
from cass_cdc_pg_spark.streaming import transforms
from cass_cdc_pg_spark.streaming.reliability import CircuitBreaker, retry_with_backoff


def jsonl_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("multiLine", "false")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(events_dir)


def parse_change_events(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """S2's deserialization stage: binary/string Kafka values → typed
    ChangeEvent rows.  Factored out of :func:`kafka_stream` so the
    parse logic is testable without the Kafka connector jar (same
    DataFrame op either way — `from_json` over the envelope schema;
    unparseable values yield all-NULL envelopes that T7 validation
    routes to the DLQ as SCHEMA_MISMATCH rather than failing the
    batch)."""
    return raw.select(
        F.from_json(F.col(value_col).cast("string"), CHANGE_EVENT_SCHEMA).alias("e")
    ).select("e.*")


def kafka_stream(
    spark: SparkSession, bootstrap: str, pattern: str = "cdc-events-.*"
) -> DataFrame:
    """Kafka wiring (S1/S2): per-table topics, JSON values.

    Requires the spark-sql-kafka package on the classpath; not
    available in the test container, so only :func:`parse_change_events`
    (the non-socket half) is exercised by tests.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribePattern", pattern)
        .option("startingOffsets", "earliest")
        .load()
    )
    return parse_change_events(raw)


def discover_cdc_tables(warehouse: str) -> dict[str, dict]:
    """CDC-tables catalog discovery (S9): the Spark-warehouse analog of
    the reference's ``get_cdc_enabled_tables`` + ``read_schema``
    (``src/repositories/cassandra_repository.py:257-295,110-150``) —
    enumerate the warehouse "keyspace", treat a ``cdc_*`` KeyedTable
    manifest as the per-table cdc-enabled extension flag, and
    introspect key columns + bucket count from the table manifest and
    payload columns from the schema registry.

    Driver-side metadata reads only (two small JSON files per table);
    returns ``name → {key_cols, num_buckets, columns}`` where
    ``columns`` is the registered payload schema as ``col → ddl-type``
    (empty if the table was never registered).
    """
    import json as _json

    from cass_cdc_pg_spark.streaming.schema_evolution import SchemaRegistry

    warehouse = warehouse.rstrip("/")
    registry = SchemaRegistry(f"{warehouse}/_schema_meta")
    out: dict[str, dict] = {}
    try:
        entries = sorted(os.listdir(warehouse))
    except FileNotFoundError:
        return out
    for d in entries:
        if not d.startswith("cdc_"):
            continue
        manifest = f"{warehouse}/{d}/_manifest.json"
        try:
            with open(manifest) as fh:
                m = _json.load(fh)
        except (FileNotFoundError, ValueError):
            continue  # dir exists but no manifest -> not cdc-live
        name = d[len("cdc_"):]
        try:
            columns = registry.current_columns(name)
        except KeyError:
            columns = {}
        out[name] = {
            "key_cols": list(m.get("key_cols") or []),
            "num_buckets": m.get("num_buckets"),
            "columns": columns,
        }
    return out


class CdcIngest:
    """Assembles and runs the ingest pipeline for a set of tables.

    ``table_schemas``: per-table pinned payload StructType (schema
    registry stand-in, §1.2).
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        table_schemas: dict[str, T.StructType],
        key_cols: dict[str, list[str]],
        num_buckets: int = 32,
        auto_evolve: bool = True,
        compatibility: str = "BACKWARD",
    ) -> None:
        from cass_cdc_pg_spark.streaming.schema_evolution import SchemaRegistry

        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        self.table_schemas = dict(table_schemas)
        self.key_cols = key_cols
        self.num_buckets = num_buckets
        self.auto_evolve = auto_evolve
        self.breaker = CircuitBreaker()
        os.makedirs(self.warehouse, exist_ok=True)
        self.schema_registry = SchemaRegistry(f"{self.warehouse}/_schema_meta")
        for name, schema in self.table_schemas.items():
            self.schema_registry.register(name, schema, compatibility)
        self._views: dict[str, list] = {}

    # -- incremental materialized views -------------------------------------

    def register_view(
        self,
        table_name: str,
        view_name: str,
        group_cols: list[str],
        value_col: str,
        compact_threshold: int = 8,
    ):
        """Attach an ``IncrementalAggView`` to *table_name*: every
        processed microbatch maintains it in the same foreachBatch
        (delta cost O(batch), replay-exactly-once via the batch_id
        high-water mark) — the answer the reference recomputes per
        request (`src/api/main.py:79-83` stats routes) stays
        materialized here.  Registration is per-process, like
        ``table_schemas``; the view state itself lives in the
        warehouse and reattaches across restarts."""
        from cass_cdc_pg_spark.streaming.incremental_view import (
            IncrementalAggView,
        )

        view = IncrementalAggView(
            self.spark,
            f"{self.warehouse}/{table_name}__view__{view_name}",
            self.table(table_name),
            group_cols,
            value_col,
            compact_threshold=compact_threshold,
        )
        self._views.setdefault(table_name, []).append(view)
        return view

    # -- schema evolution (FR-017, auto.evolve) -----------------------------

    def evolve_table_schema(
        self, name: str, new_schema: T.StructType
    ) -> tuple[bool, int, list]:
        """Propose a new payload schema for *name* through the
        compatibility gate.  Accepted (e.g. ADD_COLUMN): the pinned
        schema advances — new merges carry the column, old buckets
        backfill NULL via mergeSchema, nothing is rewritten.  Rejected
        (e.g. MODIFY_COLUMN under BACKWARD): the version is recorded
        REJECTED and events carrying it are DLQ'd as SCHEMA_MISMATCH."""
        ok, version, changes = self.schema_registry.evolve(name, new_schema)
        if ok:
            self.table_schemas[name] = new_schema
        return ok, version, changes

    def _auto_add_columns(self, name: str, unknown_keys: list[str]) -> None:
        """auto.evolve (``postgres-sink.json:13-14``): unseen payload
        keys become nullable string columns (the map transport carries
        no richer type).  Retyping one later is a MODIFY_COLUMN, which
        the BACKWARD gate rejects by design (FR-017) — it requires
        registering the table's schema with compatibility NONE, exactly
        as a manual ``ALTER`` on the reference's target would."""
        schema = self.table_schemas[name]
        fields = list(schema.fields) + [
            T.StructField(k, T.StringType(), True) for k in sorted(unknown_keys)
        ]
        self.evolve_table_schema(name, T.StructType(fields))

    def table(self, name: str) -> KeyedTable:
        return KeyedTable(
            self.spark,
            f"{self.warehouse}/cdc_{name}",
            self.key_cols[name],
            self.num_buckets,
        )

    @classmethod
    def discover(
        cls, spark: SparkSession, warehouse: str, **kwargs
    ) -> "CdcIngest":
        """Construct an ingest pipeline from warehouse discovery alone
        (S9): table set, key columns, and payload schemas all come from
        the catalog — the config-dict parameters of ``__init__`` are
        the connector-config path; this is the
        ``get_cdc_enabled_tables`` path."""
        found = discover_cdc_tables(warehouse)
        schemas, keys = {}, {}
        for name, info in found.items():
            if not info["key_cols"] or not info["columns"]:
                continue  # never merged / never registered — not live
            ddl = ", ".join(f"{c} {t}" for c, t in info["columns"].items())
            schemas[name] = T.StructType.fromDDL(ddl)
            keys[name] = info["key_cols"]
        return cls(spark, warehouse, schemas, keys, **kwargs)

    @property
    def dlq_path(self) -> str:
        return f"{self.warehouse}/dlq_records"

    def dlq_table(self) -> KeyedTable:
        """The DLQ as a keyed table (S5/S12 storage): status changes
        are atomic LWW merges, never full-file rewrites — a crash
        mid-replay can only lose the *pending* status flip, never DLQ
        records (the never-lose-errors guarantee)."""
        return KeyedTable(self.spark, self.dlq_path, ["dlq_id"], num_buckets=8)

    def dlq(self) -> DataFrame:
        from cass_cdc_pg_spark.plans.keyed_table import META_COLS

        return self.dlq_table().read_live().drop(*META_COLS)

    def seed_snapshot(
        self, name: str, snapshot: DataFrame, ts_us: int = 0
    ) -> None:
        """S1 ``snapshot.mode=initial``: batch-load the source table's
        current rows into the keyed table before streaming starts.
        Seed rows carry timestamp *ts_us* (default 0), so any CDC event
        — including ones captured concurrently with the snapshot scan —
        wins over its seed row by LWW, which is exactly why
        snapshot-then-stream converges without coordination."""
        from cass_cdc_pg_spark.streaming.transforms import check_payload_schema

        check_payload_schema(self.table_schemas[name])
        stamped = (
            snapshot.withColumn("_cdc_deleted", F.lit(False))
            .withColumn("_cdc_timestamp_micros", F.lit(ts_us).cast("long"))
            .withColumn("_last_event_id", F.lit(""))
            .withColumn("_ttl_expiry_timestamp_us", F.lit(None).cast("long"))
        )
        self.table(name).merge(stamped)

    # -- batch core (also used directly by tests and replay) ---------------

    def process_batch(self, events: DataFrame, batch_id: int = 0) -> None:
        """Validate → split → per-table unwrap/convert/merge.

        One summary aggregation up front tells us which tables the
        batch actually touches, whether any rows failed validation, and
        the winning TRUNCATE per table — so a microbatch for one table
        costs jobs proportional to that table, not to the configured
        table count.  The same pass feeds the RED metrics
        (``monitoring.METRICS``) at zero extra job cost.
        """
        _t0 = _time.time()
        # T3 addEventId runs before validation, as in the reference's
        # source connector (cassandra-source.json:48-50)
        events = transforms.add_event_id(events).persist()
        try:
            tagged = events.withColumn(
                "_error_type", transforms.validation_status()
            )
            aggs = [
                F.count(F.lit(1)).alias("n"),
                F.max(F.struct("timestamp_micros", "event_id")).alias("mx"),
            ]
            if self.auto_evolve:
                # schema-change detection costs one more agg expression
                # in the same pass — skipped entirely when evolution is
                # pinned off
                aggs.append(
                    F.array_distinct(
                        F.flatten(
                            F.collect_set(
                                F.map_keys(F.coalesce(F.col("after"), F.col("before")))
                            )
                        )
                    ).alias("payload_keys")
                )
            stats = (
                tagged.groupBy("source_table", "operation_type", "_error_type")
                .agg(*aggs)
                .collect()
            )
            any_bad = any(r["_error_type"] is not None for r in stats)
            row_tables: set[str] = set()
            truncates: dict[str, tuple[int, str]] = {}
            seen_keys: dict[str, set[str]] = {}
            for r in stats:
                if r["_error_type"] is not None:
                    METRICS.inc(
                        "cdc_errors_total", {"error_type": r["_error_type"]}, by=r["n"]
                    )
                    METRICS.inc(
                        "cdc_dlq_events_total",
                        {"table": r["source_table"] or "?",
                         "error_type": r["_error_type"]},
                        by=r["n"],
                    )
                    continue
                METRICS.inc(
                    "cdc_events_processed_total",
                    {"table": r["source_table"], "operation": r["operation_type"]},
                    by=r["n"],
                )
                if r["operation_type"] == "TRUNCATE":
                    cand = (r["mx"]["timestamp_micros"], r["mx"]["event_id"])
                    if r["source_table"] not in truncates or cand > truncates[r["source_table"]]:
                        truncates[r["source_table"]] = cand
                else:
                    row_tables.add(r["source_table"])
                    if self.auto_evolve:
                        seen_keys.setdefault(r["source_table"], set()).update(
                            r["payload_keys"] or ()
                        )

            # schema-change detection (auto.evolve): unseen payload keys
            # advance the pinned schema through the compatibility gate
            if self.auto_evolve:
                for name in row_tables:
                    if name not in self.table_schemas:
                        continue
                    known = {f.name for f in self.table_schemas[name].fields}
                    unknown = seen_keys.get(name, set()) - known
                    if unknown:
                        self._auto_add_columns(name, sorted(unknown))

            dlq_parts = []
            if any_bad:
                bad = tagged.filter(F.col("_error_type").isNotNull())
                dlq_parts.append(
                    transforms.to_dlq_rows(
                        bad,
                        events.columns,
                        F.col("_error_type"),
                        F.concat(F.lit("validation failed: "), F.col("_error_type")),
                    )
                )
            good = tagged.filter(F.col("_error_type").isNull()).drop("_error_type")

            # Valid events for tables with no registered schema must
            # not vanish (ADVICE r2): route them to the DLQ as
            # UNKNOWN_TABLE so misrouted / unconfigured-table events
            # stay visible and replayable once the table is registered.
            unknown_tables = (row_tables | set(truncates)) - set(self.table_schemas)
            if unknown_tables:
                unk = good.filter(F.col("source_table").isin(*sorted(unknown_tables)))
                dlq_parts.append(
                    transforms.to_dlq_rows(
                        unk,
                        events.columns,
                        F.lit("UNKNOWN_TABLE"),
                        F.concat(
                            F.lit("no registered schema for table "),
                            F.col("source_table"),
                        ),
                    )
                )
                for r in stats:
                    if r["_error_type"] is None and r["source_table"] in unknown_tables:
                        METRICS.inc(
                            "cdc_dlq_events_total",
                            {"table": r["source_table"], "error_type": "UNKNOWN_TABLE"},
                            by=r["n"],
                        )

            for name, payload_schema in self.table_schemas.items():
                if name in row_tables:
                    subset = good.filter(
                        (F.col("source_table") == name)
                        & (F.col("operation_type") != "TRUNCATE")
                    )
                    # FR-017: events written under a REJECTED schema
                    # version go to the DLQ as SCHEMA_MISMATCH
                    rejected = self.schema_registry.rejected_versions(name)
                    if rejected:
                        rej = subset.filter(F.col("schema_version").isin(*rejected))
                        dlq_parts.append(
                            transforms.to_dlq_rows(
                                rej,
                                events.columns,
                                F.lit("SCHEMA_MISMATCH"),
                                F.concat(
                                    F.lit("rejected schema version "),
                                    F.col("schema_version").cast("string"),
                                ),
                            )
                        )
                        subset = subset.filter(
                            ~F.col("schema_version").isin(*rejected)
                        )
                    # T8 error contract: raw-non-null → typed-null rows
                    # go to the DLQ as TYPE_CONVERSION_ERROR, never
                    # merged as NULL columns (type_mapper.py:88-134).
                    ok, conv_dlq = transforms.split_convertible(subset, payload_schema)
                    dlq_parts.append(conv_dlq)
                    rows = transforms.unwrap(ok, payload_schema)
                    rows = transforms.add_cdc_metadata(rows)
                    target = self.table(name)
                    # materialized views fold the batch BEFORE the
                    # table merge (their old-state read must not
                    # already include it); the batch_id high-water
                    # mark makes crash-replay exactly-once
                    for view in self._views.get(name, ()):
                        view.apply_batch(rows, batch_id=batch_id)
                    commit = lambda r=rows, t=target: t.merge(r)  # noqa: E731
                    self.breaker.call(lambda: retry_with_backoff(commit, max_attempts=3))
                # TRUNCATE: table-level operation, applied via LWW
                # soft-delete-all — never merged as a row (ADVICE r1).
                if name in truncates:
                    ts_us, eid = truncates[name]
                    self.table(name).soft_delete_all(ts_us, eid)
                    # table-level ops bypass the delta path; reconcile
                    # attached views with a full rebuild (rare event)
                    for view in self._views.get(name, ()):
                        view.rebuild(batch_id=batch_id)

            if dlq_parts:
                # DLQ merge (S5): deterministic dlq_id + LWW merge make
                # replays idempotent — no duplicate PENDING rows, never
                # a lost error (`errors.tolerance=all` semantics).
                dlq = dlq_parts[0]
                for p in dlq_parts[1:]:
                    dlq = dlq.unionByName(p)
                self.dlq_table().merge(dlq)
        finally:
            events.unpersist()
            METRICS.observe(
                "cdc_processing_latency_seconds",
                _time.time() - _t0,
                {"stage": "process_batch"},
            )

    # -- streaming ---------------------------------------------------------

    def start(
        self,
        source: DataFrame,
        checkpoint: str,
        trigger_once: bool = False,
        processing_time: str = "1 second",
    ):
        writer = (
            source.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    # -- DLQ replay (Q21, ``dlq_service.py:165-301``) ----------------------

    def replay_dlq(self, dlq_ids: list[str]) -> int:
        """Re-run selected DLQ events through the pipeline, then mark
        them MANUAL_RESOLVED via an atomic status merge.

        Replay is safe end-to-end: the table merge is idempotent (C5);
        the status flip is a keyed merge stamped with wall time, which
        outranks the deterministic failure timestamp — so even if the
        replayed event fails again (same dlq_id re-merged), the final
        state is a single MANUAL_RESOLVED row with retry_count bumped,
        not a duplicate PENDING.  A crash between replay and status
        merge leaves the DLQ fully readable with the rows still
        PENDING — re-running the replay converges."""
        import time as _time

        dt = self.dlq_table()
        # small, bounded selection (explicit id list) — materialize it
        # before process_batch re-merges the DLQ underneath the plan
        selected = dt.read_live().filter(F.col("dlq_id").isin(dlq_ids)).collect()
        if not selected:
            return 0
        events = self.spark.createDataFrame(
            [(r["original_event"],) for r in selected], "j string"
        ).select(
            F.from_json(F.col("j"), CHANGE_EVENT_SCHEMA).alias("e")
        ).select("e.*")
        self.process_batch(events)

        now_us = int(_time.time() * 1_000_000)
        resolved = self.spark.createDataFrame(
            [
                (
                    r["dlq_id"],
                    r["source_table"],
                    r["original_event"],
                    r["error_type"],
                    r["error_message"],
                    r["retry_count"] + 1,
                    r["first_failed_at_us"],
                    now_us,
                    "MANUAL_RESOLVED",
                    False,
                    now_us,
                    r["_last_event_id"],
                    None,
                )
                for r in selected
            ],
            "dlq_id string, source_table string, original_event string, "
            "error_type string, error_message string, retry_count int, "
            "first_failed_at_us long, last_retry_at_us long, "
            "resolution_status string, _cdc_deleted boolean, "
            "_cdc_timestamp_micros long, _last_event_id string, "
            "_ttl_expiry_timestamp_us long",
        )
        dt.merge(resolved)
        for r in selected:
            METRICS.inc(
                "cdc_dlq_replay_success_total", {"table": r["source_table"]}
            )
        return len(selected)
