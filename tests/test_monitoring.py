"""Metrics / scheduler / alert path (SURVEY §2.7).

Local-mode ports of the reference's observability behavior:
RED metrics with the reference's names (``metrics.py:8-213``),
threshold alerting (``alert_service.py:135-151``: critical ≥5%,
warning ≥1%), and the hourly per-table reconciliation loop
(``reconciliation_scheduler.py:81-211``) with max one instance per
table.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cass_cdc_pg_spark.monitoring import (
    METRICS,
    AlertService,
    CdcStreamingListener,
    MetricsCollector,
    ReconciliationScheduler,
    register_listener,
)


def test_metrics_collector_counters_and_render():
    m = MetricsCollector()
    m.inc("cdc_events_processed_total", {"table": "users", "operation": "CREATE"}, by=5)
    m.inc("cdc_events_processed_total", {"table": "users", "operation": "CREATE"})
    m.set_gauge("cdc_backlog_depth", 42, {"topic": "cdc-events-users"})
    m.observe("cdc_processing_latency_seconds", 0.25, {"stage": "microbatch"})
    assert m.value("cdc_events_processed_total",
                   {"table": "users", "operation": "CREATE"}) == 6
    text = m.render_prometheus()
    assert 'cdc_events_processed_total{operation="CREATE",table="users"} 6' in text
    assert 'cdc_backlog_depth{topic="cdc-events-users"} 42' in text
    assert "cdc_processing_latency_seconds_count" in text


def test_alert_severity_thresholds():
    a = AlertService()
    assert a.determine_severity(0.5) is None
    assert a.determine_severity(1.0) == "warning"
    assert a.determine_severity(4.99) == "warning"
    assert a.determine_severity(5.0) == "critical"


def test_drift_5pct_fires_critical_alert(spark, tmp_path):
    """VERDICT r1 'done' criterion: a drift-5% run emits a critical
    alert record."""
    pushed = []
    alerts = AlertService(pusher=pushed.append)
    src = spark.range(100).select(F.col("id"))
    tgt = spark.range(95).select(F.col("id"))  # 5% drift
    sched = ReconciliationScheduler(
        spark,
        {"users": lambda: (src, tgt)},
        str(tmp_path / "jobs"),
        alert_service=alerts,
    )
    job = sched.run_once("users")
    assert job["drift_percentage"] == 5.0
    assert job["alert_fired"] is True
    assert len(alerts.alerts) == 1
    assert alerts.alerts[0]["severity"] == "critical"
    assert pushed == alerts.alerts  # pusher hook saw the same record
    # job row persisted
    rows = sched.jobs().collect()
    assert len(rows) == 1 and rows[0]["status"] == "COMPLETED"
    assert rows[0]["validation_strategy"] == "ROW_COUNT"


def test_scheduler_no_alert_below_threshold(spark, tmp_path):
    alerts = AlertService()
    src = spark.range(1000)
    tgt = spark.range(999)  # 0.1% drift
    sched = ReconciliationScheduler(
        spark, {"t": lambda: (src, tgt)}, str(tmp_path / "jobs"),
        alert_service=alerts,
    )
    job = sched.run_once("t")
    assert job["alert_fired"] is False
    assert alerts.alerts == []


def test_scheduler_max_one_instance_per_table(spark, tmp_path):
    sched = ReconciliationScheduler(
        spark, {"t": lambda: (spark.range(10), spark.range(10))},
        str(tmp_path / "jobs"),
    )
    sched._running.add("t")  # simulate a job in flight
    assert sched.run_once("t") is None
    sched._running.discard("t")
    assert sched.run_once("t") is not None


def test_ingest_feeds_red_metrics(spark, tmp_path):
    """process_batch feeds cdc_events_processed_total /
    cdc_errors_total / cdc_dlq_events_total from its summary pass."""
    from cass_cdc_pg_spark.streaming.ingest import CdcIngest

    schema = T.StructType([T.StructField("id", T.StringType())])
    ingest = CdcIngest(spark, str(tmp_path / "wh"), {"users": schema},
                       {"users": ["id"]}, num_buckets=2)
    before_ok = METRICS.value("cdc_events_processed_total",
                              {"table": "users", "operation": "CREATE"})
    before_err = METRICS.value("cdc_errors_total",
                               {"error_type": "SCHEMA_MISMATCH"})
    u1 = str(uuid.UUID(int=1))
    ingest.process_batch(spark.createDataFrame(
        [
            (u1, "users", "CREATE", 1000, None, {"id": "a"}, 1, None, False),
            ("bad-uuid", "users", "CREATE", 1000, None, {"id": "b"}, 1, None, False),
        ],
        "event_id string, source_table string, operation_type string, "
        "timestamp_micros long, before map<string,string>, after map<string,string>, "
        "schema_version int, ttl_seconds int, is_tombstone boolean",
    ))
    assert METRICS.value("cdc_events_processed_total",
                         {"table": "users", "operation": "CREATE"}) == before_ok + 1
    assert METRICS.value("cdc_errors_total",
                         {"error_type": "SCHEMA_MISMATCH"}) == before_err + 1
    assert METRICS.observations("cdc_processing_latency_seconds",
                                {"stage": "process_batch"})


def test_streaming_listener_maps_progress(spark, tmp_path):
    """The StreamingQueryListener maps StreamingQueryProgress onto the
    reference metric names."""
    import json as _json
    import os
    import time

    m = MetricsCollector()
    listener = CdcStreamingListener(m)
    spark.streams.addListener(listener)
    try:
        src_dir = str(tmp_path / "in")
        os.makedirs(src_dir)
        with open(f"{src_dir}/a.jsonl", "w") as f:
            f.write(_json.dumps({"v": 1}) + "\n")
        q = (
            spark.readStream.schema("v long").json(src_dir)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        deadline = time.time() + 15
        while time.time() < deadline:
            if m.value("cdc_events_processed_total",
                       {"table": "*", "operation": "*"}) >= 1:
                break
            time.sleep(0.25)
        assert m.value("cdc_events_processed_total",
                       {"table": "*", "operation": "*"}) >= 1
        assert m.value("cdc_streaming_queries_started_total") >= 1
    finally:
        spark.streams.removeListener(listener)


# ---------------------------------------------------------------------------
# deep health probes (FR-028)
# ---------------------------------------------------------------------------


def test_health_all_green(spark, tmp_path):
    import json
    import os

    from cass_cdc_pg_spark.monitoring import HEALTHY, HealthCheckService
    from cass_cdc_pg_spark.streaming.schema_evolution import SchemaRegistry

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    spark.range(10).write.parquet(f"{src_dir}/t.parquet")
    reg = SchemaRegistry(str(tmp_path / "reg"))

    # a live stream so the stream probe is healthy
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    with open(f"{in_dir}/a.jsonl", "w") as fh:
        fh.write(json.dumps({"x": 1}) + "\n")
    q = (
        spark.readStream.schema("x long").json(in_dir)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        hc = HealthCheckService(
            spark,
            source_path=src_dir,
            target_warehouse=str(tmp_path / "wh"),
            schema_registry=reg,
        )
        out = hc.check_all()
    finally:
        q.stop()
    assert out["status"] == HEALTHY, out
    # one footer is opened (readability proof), not the whole table
    assert out["components"]["source"]["details"]["probe_rows"] > 0
    assert out["components"]["target"]["details"]["writable"] is True
    assert out["components"]["stream"]["details"]["active_queries"] >= 1
    assert all(
        c["details"].get("latency_ms") is not None
        for c in out["components"].values()
    )


def test_health_probe_failures(spark, tmp_path):
    """Forced failure per probe: missing source -> unhealthy; unwritable
    target -> unhealthy; no active stream -> degraded; unconfigured
    registry -> degraded; aggregate -> unhealthy."""
    from cass_cdc_pg_spark.monitoring import (
        DEGRADED,
        UNHEALTHY,
        HealthCheckService,
    )

    hc = HealthCheckService(
        spark,
        source_path=str(tmp_path / "nope"),
        target_warehouse="/proc/definitely-not-writable/wh",
        schema_registry=None,
    )
    out = hc.check_all()
    assert out["status"] == UNHEALTHY
    assert out["components"]["source"]["status"] == UNHEALTHY
    assert "error" in out["components"]["source"]["details"]
    assert out["components"]["target"]["status"] == UNHEALTHY
    assert out["components"]["stream"]["status"] == DEGRADED  # no active query
    assert out["components"]["schema_registry"]["status"] == DEGRADED


def test_health_stale_stream_degraded(spark, tmp_path):
    """A hung stream (old progress) is degraded, not healthy."""
    import json
    import os

    from cass_cdc_pg_spark.monitoring import DEGRADED, HealthCheckService

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    with open(f"{in_dir}/a.jsonl", "w") as fh:
        fh.write(json.dumps({"x": 1}) + "\n")
    q = (
        spark.readStream.schema("x long").json(in_dir)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(processingTime="100 seconds")  # no further progress
        .start()
    )
    try:
        q.processAllAvailable()
        hc = HealthCheckService(spark, stream_stale_after_sec=0.0)
        got = hc.check_stream()
    finally:
        q.stop()
    assert got["status"] == DEGRADED
    assert got["details"]["stale_queries"]
