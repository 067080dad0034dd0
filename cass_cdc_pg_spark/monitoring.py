"""Monitoring: RED metrics, health, reconciliation scheduler, alerts.

Reproduces the reference's observability surface on Spark primitives:

- **Metrics** (``src/monitoring/metrics.py:8-213``): the same metric
  names/labels (``cdc_events_processed_total{table,operation}``,
  ``cdc_errors_total{error_type}``, ``cdc_processing_latency_seconds``,
  ``cdc_dlq_events_total``, …) kept in an in-process registry with a
  Prometheus-text renderer.  Streaming rates/lag come from
  ``StreamingQueryProgress`` via ``CdcStreamingListener`` instead of
  instrumenting every handler — Spark already measures the pipeline.
- **Scheduler** (``src/services/reconciliation_scheduler.py:81-211``):
  interval-driven per-table reconciliation jobs, one instance per
  table, persisting ReconciliationJob rows and firing alerts above
  thresholds.
- **Alerts** (``src/services/alert_service.py:135-210``): severity =
  critical at ≥5% drift, warning at ≥1% (``settings.py:98-99``);
  alert records are appended locally and optionally pushed through an
  injected pusher callable (the Prometheus pushgateway HTTP POST in a
  real deployment — no network in this container).
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from collections import defaultdict
from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

# ---------------------------------------------------------------------------
# metrics registry
# ---------------------------------------------------------------------------


class MetricsCollector:
    """Label-aware counter/gauge/histogram-observation registry using
    the reference's metric names.  Thread-safe; renders the Prometheus
    text exposition format."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: dict[tuple, float] = defaultdict(float)
        self._gauges: dict[tuple, float] = {}
        self._observations: dict[tuple, list[float]] = defaultdict(list)

    @staticmethod
    def _key(name: str, labels: dict[str, str] | None) -> tuple:
        return (name, tuple(sorted((labels or {}).items())))

    def inc(self, name: str, labels: dict[str, str] | None = None, by: float = 1) -> None:
        with self._lock:
            self._counters[self._key(name, labels)] += by

    def set_gauge(self, name: str, value: float, labels: dict[str, str] | None = None) -> None:
        with self._lock:
            self._gauges[self._key(name, labels)] = value

    def observe(self, name: str, value: float, labels: dict[str, str] | None = None) -> None:
        with self._lock:
            self._observations[self._key(name, labels)].append(value)

    def value(self, name: str, labels: dict[str, str] | None = None) -> float:
        key = self._key(name, labels)
        with self._lock:
            if key in self._counters:
                return self._counters[key]
            return self._gauges.get(key, 0.0)

    def observations(self, name: str, labels: dict[str, str] | None = None) -> list[float]:
        with self._lock:
            return list(self._observations[self._key(name, labels)])

    @staticmethod
    def _fmt_labels(labels: tuple) -> str:
        if not labels:
            return ""
        inner = ",".join(f'{k}="{v}"' for k, v in labels)
        return "{" + inner + "}"

    def render_prometheus(self) -> str:
        """Prometheus text exposition (counters+gauges; observations as
        _count/_sum pairs, the pushgateway-compatible subset)."""
        lines: list[str] = []
        with self._lock:
            for (name, labels), v in sorted(self._counters.items()):
                lines.append(f"{name}{self._fmt_labels(labels)} {v}")
            for (name, labels), v in sorted(self._gauges.items()):
                lines.append(f"{name}{self._fmt_labels(labels)} {v}")
            for (name, labels), obs in sorted(self._observations.items()):
                lines.append(f"{name}_count{self._fmt_labels(labels)} {len(obs)}")
                lines.append(f"{name}_sum{self._fmt_labels(labels)} {sum(obs)}")
        return "\n".join(lines) + "\n"


#: process-wide default registry (the reference uses module-level
#: prometheus_client metrics the same way)
METRICS = MetricsCollector()


# ---------------------------------------------------------------------------
# streaming listener → RED metrics
# ---------------------------------------------------------------------------


class CdcStreamingListener(StreamingQueryListener):
    """Maps ``StreamingQueryProgress`` onto the reference's RED metric
    names: rows/sec → throughput, batch duration → latency histogram,
    source backlog → ``cdc_backlog_depth``."""

    def __init__(self, metrics: MetricsCollector | None = None) -> None:
        self.metrics = metrics or METRICS

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        self.metrics.inc("cdc_streaming_queries_started_total")

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        m = self.metrics
        m.inc("cdc_events_processed_total", {"table": "*", "operation": "*"},
              by=p.get("numInputRows", 0) or 0)
        m.set_gauge("cdc_input_rows_per_second", p.get("inputRowsPerSecond") or 0.0)
        m.set_gauge("cdc_processed_rows_per_second",
                    p.get("processedRowsPerSecond") or 0.0)
        dur = (p.get("durationMs") or {}).get("triggerExecution")
        if dur is not None:
            m.observe("cdc_processing_latency_seconds", dur / 1000.0,
                      {"stage": "microbatch"})
        for s in p.get("sources", ()):  # backlog ≈ unconsumed input
            desc = (s.get("description") or "source")[:80]
            lag = s.get("numInputRows")
            if lag is not None:
                m.set_gauge("cdc_backlog_depth", lag, {"topic": desc})

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.metrics.inc("cdc_streaming_queries_terminated_total")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def register_listener(
    spark: SparkSession, metrics: MetricsCollector | None = None
) -> CdcStreamingListener:
    listener = CdcStreamingListener(metrics)
    spark.streams.addListener(listener)
    return listener


# ---------------------------------------------------------------------------
# deep health probes (FR-028, ``src/monitoring/health_check.py:28-302``)
# ---------------------------------------------------------------------------

HEALTHY = "healthy"
DEGRADED = "degraded"
UNHEALTHY = "unhealthy"


class HealthCheckService:
    """Deep component probes with latency and an aggregated status —
    the Spark-engine analog of the reference's Cassandra/PG/Kafka/Vault
    checks (``health_check.py:28-302``): *source readable* (one parquet
    footer actually opened), *target writable* (a probe file round-trips
    through the warehouse dir), *stream alive* (active query with
    recent progress), *schema registry readable*.  Unconfigured
    components report ``degraded`` ("Repository not initialized" in
    the reference); probe failures report ``unhealthy`` with the error
    and the latency of the failed attempt.  Aggregation matches
    ``check_all`` exactly: all healthy → healthy, any unhealthy →
    unhealthy, else degraded."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        source_path: str | None = None,
        target_warehouse: str | None = None,
        schema_registry=None,
        stream_stale_after_sec: float = 60.0,
        secrets=None,
    ) -> None:
        self.spark = spark
        self.source_path = source_path
        self.target_warehouse = target_warehouse
        self.schema_registry = schema_registry
        self.stream_stale_after_sec = stream_stale_after_sec
        self.secrets = secrets

    @staticmethod
    def _probe(service: str, configured: bool, fn: Callable[[], dict]) -> dict:
        if not configured:
            return {
                "service": service,
                "status": DEGRADED,
                "details": {"connected": False, "message": "not configured"},
            }
        t0 = time.time()
        try:
            details = fn()
            details["latency_ms"] = round((time.time() - t0) * 1000, 2)
            status = details.pop("_status", HEALTHY)
            return {"service": service, "status": status, "details": details}
        except Exception as e:  # noqa: BLE001 — a probe never raises
            return {
                "service": service,
                "status": UNHEALTHY,
                "details": {
                    "connected": False,
                    "latency_ms": round((time.time() - t0) * 1000, 2),
                    "error": str(e)[:200],
                },
            }

    def check_source(self) -> dict:
        """Source readable: list the parquet dir and open one footer —
        proves bytes are servable, not just that the path exists."""

        def probe() -> dict:
            import pyarrow.parquet as pq

            from cass_cdc_pg_spark.sources.tables import _parquet_files

            files = _parquet_files(self.source_path)
            if not files:
                raise FileNotFoundError(f"no parquet files under {self.source_path}")
            meta = pq.ParquetFile(files[0]).metadata
            return {"connected": True, "files": len(files),
                    "probe_rows": meta.num_rows}

        return self._probe("source", self.source_path is not None, probe)

    def check_target(self) -> dict:
        """Target writable: round-trip a probe file through the
        warehouse dir (the same durability path every merge commit
        takes — manifest writes use os.replace in this dir)."""

        def probe() -> dict:
            os.makedirs(self.target_warehouse, exist_ok=True)
            tmp = os.path.join(self.target_warehouse,
                               f"_health_probe.{uuid.uuid4().hex[:8]}")
            with open(tmp, "w") as fh:
                fh.write("ok")
                fh.flush()
                os.fsync(fh.fileno())
            with open(tmp) as fh:
                ok = fh.read() == "ok"
            os.remove(tmp)
            if not ok:
                raise IOError("probe file round-trip mismatch")
            return {"connected": True, "writable": True}

        return self._probe("target", self.target_warehouse is not None, probe)

    def check_stream(self) -> dict:
        """Stream alive: ≥1 active streaming query whose last progress
        is fresher than ``stream_stale_after_sec`` (a hung query is
        degraded, not healthy — the condition a deployment pages on)."""

        def probe() -> dict:
            active = self.spark.streams.active
            if not active:
                return {"_status": DEGRADED, "active_queries": 0,
                        "message": "no active streaming query"}
            import datetime

            stale = []
            for q in active:
                lp = q.lastProgress
                if lp is None:
                    continue  # just started; not stale
                ts = lp["timestamp"] if isinstance(lp, dict) else json.loads(q.lastProgress.json)["timestamp"]
                age = (
                    datetime.datetime.now(datetime.timezone.utc)
                    - datetime.datetime.fromisoformat(ts.replace("Z", "+00:00"))
                ).total_seconds()
                if age > self.stream_stale_after_sec:
                    stale.append(q.name or q.id)
            if stale:
                return {"_status": DEGRADED, "active_queries": len(active),
                        "stale_queries": [str(s) for s in stale]}
            return {"active_queries": len(active)}

        return self._probe("stream", self.spark is not None, probe)

    def check_schema_registry(self) -> dict:
        def probe() -> dict:
            tables = self.schema_registry.tables()
            return {"connected": True, "subject_count": len(tables)}

        return self._probe(
            "schema_registry", self.schema_registry is not None, probe
        )

    def check_secrets(self) -> dict:
        """Vault-probe analog: the credentials store must be readable
        (``vault_repository.py:63-96``)."""

        def probe() -> dict:
            if not self.secrets.health_check():
                raise IOError("secrets store unreadable")
            return {"connected": True}

        return self._probe("secrets", self.secrets is not None, probe)

    def check_all(self) -> dict:
        components = {
            "source": self.check_source(),
            "target": self.check_target(),
            "stream": self.check_stream(),
            "schema_registry": self.check_schema_registry(),
        }
        # the Vault component only reports when a provider is wired —
        # an unconfigured secrets store is normal for local mode
        if self.secrets is not None:
            components["secrets"] = self.check_secrets()
        statuses = [c["status"] for c in components.values()]
        if all(s == HEALTHY for s in statuses):
            overall = HEALTHY
        elif any(s == UNHEALTHY for s in statuses):
            overall = UNHEALTHY
        else:
            overall = DEGRADED
        return {"status": overall, "components": components}


# ---------------------------------------------------------------------------
# alerts
# ---------------------------------------------------------------------------


class AlertService:
    """Drift alerting (``alert_service.py:135-210``): severity
    thresholds, local alert log, pluggable push."""

    def __init__(
        self,
        warning_threshold: float = 1.0,
        critical_threshold: float = 5.0,
        pusher: Callable[[dict], None] | None = None,
        metrics: MetricsCollector | None = None,
    ) -> None:
        self.warning_threshold = warning_threshold
        self.critical_threshold = critical_threshold
        self.pusher = pusher
        self.metrics = metrics or METRICS
        self.alerts: list[dict] = []

    def determine_severity(self, drift_percentage: float) -> str | None:
        if drift_percentage >= self.critical_threshold:
            return "critical"
        if drift_percentage >= self.warning_threshold:
            return "warning"
        return None

    def send_reconciliation_alert(
        self, table: str, drift_percentage: float, mismatch_count: int, job_id: str
    ) -> dict | None:
        severity = self.determine_severity(drift_percentage)
        if severity is None:
            return None
        alert = {
            "alertname": "CDCReconciliationDrift",
            "severity": severity,
            "table": table,
            "drift_percentage": drift_percentage,
            "mismatch_count": mismatch_count,
            "job_id": job_id,
            "fired_at": time.time(),
        }
        self.alerts.append(alert)
        self.metrics.inc("cdc_reconciliation_alerts_total",
                         {"table": table, "severity": severity})
        if self.pusher is not None:
            self.pusher(alert)
        return alert


# ---------------------------------------------------------------------------
# reconciliation scheduler
# ---------------------------------------------------------------------------


class ReconciliationScheduler:
    """Interval-driven per-table reconciliation
    (``reconciliation_scheduler.py:81-211``): each tick runs ROW_COUNT
    validation per table (one instance per table — ticks skip tables
    still running), persists a ReconciliationJob row, and alerts above
    thresholds.

    *table_sources*: ``{table: () -> (src_df, tgt_df)}`` thunks so each
    run re-reads current state."""

    def __init__(
        self,
        spark: SparkSession,
        table_sources: dict[str, Callable[[], tuple]],
        jobs_path: str,
        alert_service: AlertService | None = None,
        interval_seconds: float = 3600.0,
        metrics: MetricsCollector | None = None,
    ) -> None:
        self.spark = spark
        self.table_sources = table_sources
        self.jobs_path = jobs_path.rstrip("/")
        self.alerts = alert_service or AlertService()
        self.interval_seconds = interval_seconds
        self.metrics = metrics or METRICS
        self._running: set[str] = set()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        os.makedirs(self.jobs_path, exist_ok=True)

    def run_once(self, table: str, job_type: str = "HOURLY_SCHEDULED") -> dict | None:
        """Run one reconciliation job for *table*; returns the job row
        (None if an instance is already running — max_instances=1)."""
        with self._lock:
            if table in self._running:
                return None
            self._running.add(table)
        try:
            from cass_cdc_pg_spark.operators.reconcile import row_count_validation

            started = time.time()
            src_df, tgt_df = self.table_sources[table]()
            row = row_count_validation(src_df, tgt_df).collect()[0]
            severity = self.alerts.determine_severity(row["drift_pct"])
            job = {
                "job_id": str(uuid.uuid4()),
                "table_name": table,
                "job_type": job_type,
                "validation_strategy": "ROW_COUNT",
                "source_count": row["src_count"],
                "target_count": row["tgt_count"],
                "mismatch_count": row["mismatch_count"],
                "drift_percentage": float(row["drift_pct"]),
                "status": "COMPLETED",
                "alert_fired": severity is not None,
                "started_at": started,
                "completed_at": time.time(),
            }
            self._append_job(job)
            self.metrics.inc("cdc_reconciliation_jobs_total",
                             {"table": table, "strategy": "ROW_COUNT"})
            self.metrics.set_gauge("cdc_reconciliation_drift_percentage",
                                   job["drift_percentage"], {"table": table})
            self.alerts.send_reconciliation_alert(
                table, job["drift_percentage"], job["mismatch_count"], job["job_id"]
            )
            return job
        finally:
            with self._lock:
                self._running.discard(table)

    def _append_job(self, job: dict) -> None:
        df = self.spark.createDataFrame(
            [tuple(job.values())],
            "job_id string, table_name string, job_type string, "
            "validation_strategy string, source_count long, target_count long, "
            "mismatch_count long, drift_percentage double, status string, "
            "alert_fired boolean, started_at double, completed_at double",
        )
        df.write.mode("append").parquet(self.jobs_path)

    def jobs(self):
        return self.spark.read.parquet(self.jobs_path)

    # -- loop ---------------------------------------------------------------

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()

        def loop() -> None:
            while not self._stop.wait(self.interval_seconds):
                for table in list(self.table_sources):
                    if self._stop.is_set():
                        return
                    try:
                        self.run_once(table)
                    except Exception:  # noqa: BLE001 — scheduler must survive
                        self.metrics.inc("cdc_reconciliation_job_errors_total",
                                         {"table": table})

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
