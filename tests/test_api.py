"""End-to-end tests for the HTTP listener (``cass_cdc_pg_spark/api.py``)
— real sockets, real requests, the reference's route surface
(``src/api/main.py:79-83``, ``src/api/routes/*``)."""

from __future__ import annotations

import contextlib
import json
import urllib.error
import urllib.request

from pyspark.sql import types as T

from cass_cdc_pg_spark.api import CdcApiServer, CdcApiService
from cass_cdc_pg_spark.streaming.ingest import CdcIngest

USERS_DDL = "id string, username string, age int"
U1 = "11111111-1111-1111-1111-111111111111"

CHANGE_EVENT_DDL = (
    "event_id string, source_table string, operation_type string, "
    "timestamp_micros long, before map<string,string>, after map<string,string>, "
    "schema_version int, ttl_seconds int, is_tombstone boolean"
)

SF = "/root/testdata/sf0.001"


def _seed_warehouse(spark, wh: str) -> None:
    ingest = CdcIngest(
        spark,
        wh,
        table_schemas={"users": T.StructType.fromDDL(USERS_DDL)},
        key_cols={"users": ["id"]},
        num_buckets=2,
    )
    ingest.process_batch(
        spark.createDataFrame(
            [
                ("22222222-2222-4222-8222-222222222222", "users", "CREATE", 1000,
                 None, {"id": U1, "username": "a", "age": "30"}, 1, None, False),
                (None, "users", "CREATE", None, None,
                 {"id": "x"}, 1, None, False),  # invalid → DLQ
            ],
            CHANGE_EVENT_DDL,
        )
    )


@contextlib.contextmanager
def _server(spark, wh=None, sf_dir=None, cfg=None, rate_limit_state=None):
    svc = CdcApiService(spark, sf_dir=sf_dir, warehouse=wh, table_config=cfg)
    srv = CdcApiServer(svc, rate_limit_state=rate_limit_state)
    host, port = srv.start()
    try:
        yield f"http://{host}:{port}"
    finally:
        srv.stop()


def _req(base: str, method: str, path: str, body=None, headers=None):
    """Returns (status, headers, parsed-body)."""
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(base + path, data=data, method=method,
                                 headers=headers or {})
    if data is not None:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            raw, hdrs, status = resp.read(), resp.headers, resp.status
    except urllib.error.HTTPError as e:
        raw, hdrs, status = e.read(), e.headers, e.code
    ctype = hdrs.get("Content-Type", "")
    parsed = json.loads(raw) if "json" in ctype else raw.decode()
    return status, hdrs, parsed


def test_api_health_metrics_request_id_and_routing(spark, tmp_path):
    wh = str(tmp_path / "wh")
    _seed_warehouse(spark, wh)
    with _server(spark, wh=wh, sf_dir=SF) as base:
        st, hdrs, out = _req(base, "GET", "/health",
                             headers={"X-Request-ID": "req-7"})
        assert st == 200
        assert hdrs["X-Request-ID"] == "req-7"  # header echo (middleware)
        assert out["components"]["source"]["status"] == "healthy"
        assert out["components"]["target"]["status"] == "healthy"

        st, _, comp = _req(base, "GET", "/health/source")
        assert st == 200 and comp["service"] == "source"
        st, _, err = _req(base, "GET", "/health/nope")
        assert st == 404 and "unknown component" in err["detail"]

        st, hdrs, text = _req(base, "GET", "/metrics")
        assert st == 200 and "cdc_events_processed_total" in text
        assert hdrs["X-Request-ID"]  # generated when absent

        # routing contract: unknown path → 404, wrong method → 405
        st, _, _ = _req(base, "GET", "/nope")
        assert st == 404
        st, _, _ = _req(base, "POST", "/health")
        assert st == 405


def test_api_dlq_surface(spark, tmp_path):
    wh = str(tmp_path / "wh")
    _seed_warehouse(spark, wh)
    cfg = {"tables": {"users": {"ddl": USERS_DDL, "keys": ["id"]}}}
    with _server(spark, wh=wh, sf_dir=SF, cfg=cfg) as base:
        st, _, recs = _req(base, "GET", "/dlq/records")
        assert st == 200 and len(recs) == 1
        assert recs[0]["resolution_status"] == "PENDING"
        dlq_id = recs[0]["dlq_id"]

        st, _, none = _req(base, "GET", "/dlq/records?status=IGNORED")
        assert st == 200 and none == []

        st, _, stats = _req(base, "GET", "/dlq/stats")
        assert st == 200 and stats["total"] == 1
        assert stats["resolution_status"] == {"PENDING": 1}

        st, _, err = _req(base, "POST", "/dlq/replay", body={"event_ids": []})
        assert st == 422
        st, _, out = _req(base, "POST", "/dlq/replay",
                          body={"event_ids": [dlq_id]})
        assert st == 200 and out["replayed"] == 1


def test_api_reconciliation_flow(spark, tmp_path):
    wh = str(tmp_path / "wh")
    with _server(spark, wh=wh, sf_dir=SF) as base:
        st, _, job = _req(base, "POST", "/reconciliation/trigger",
                          body={"strategy": "row_count"})
        assert st == 200 and job["status"] == "completed"
        assert {"src_count", "tgt_count", "severity"} <= set(job["rows"][0])

        st, _, jobs = _req(base, "GET", "/reconciliation/jobs")
        assert st == 200 and [j["job_id"] for j in jobs] == [job["job_id"]]
        st, _, got = _req(base, "GET",
                          f"/reconciliation/jobs/{job['job_id']}")
        assert st == 200 and got["strategy"] == "row_count"
        st, _, _ = _req(base, "GET", "/reconciliation/jobs/deadbeef")
        assert st == 404

        st, _, bad = _req(base, "POST", "/reconciliation/trigger",
                          body={"strategy": "full_scan"})
        assert st == 422 and "unknown strategy" in bad["detail"]

        # checksum trigger persists durable mismatch records
        st, _, cj = _req(base, "POST", "/reconciliation/trigger",
                         body={"strategy": "checksum", "limit": 10})
        assert st == 200 and cj["mismatch_count"] > 0
        st, _, mms = _req(base, "GET", "/reconciliation/mismatches?limit=5")
        assert st == 200 and 0 < len(mms) <= 5
        assert mms[0]["resolution_status"] == "PENDING"
        assert json.loads(mms[0]["detail"])  # row payload round-trips

        mid = mms[0]["mismatch_id"]
        st, _, res = _req(base, "POST",
                          f"/reconciliation/mismatches/{mid}/resolve",
                          body={"status": "IGNORED", "notes": "test"})
        assert st == 200 and res["resolution_status"] == "IGNORED"
        st, _, ign = _req(base, "GET",
                          "/reconciliation/mismatches?status=IGNORED")
        assert st == 200 and [m["mismatch_id"] for m in ign] == [mid]
        assert ign[0]["resolution_notes"] == "test"

        st, _, _ = _req(base, "POST",
                        "/reconciliation/mismatches/none/resolve", body={})
        assert st == 404


def test_api_gdpr_delete(spark, tmp_path):
    wh = str(tmp_path / "wh")
    _seed_warehouse(spark, wh)
    cfg = {"tables": {"users": {"ddl": USERS_DDL, "keys": ["id"]}}}
    with _server(spark, wh=wh, cfg=cfg) as base:
        st, _, out = _req(base, "DELETE", f"/records/cdc/users/{U1}")
        assert st == 200 and out["status"] == "success"
        assert out["deleted_from_source"] is True

        st, _, _ = _req(base, "DELETE", f"/records/cdc/users/{U1}")
        assert st == 404  # already erased
        st, _, _ = _req(base, "DELETE", f"/records/cdc/unknown/{U1}")
        assert st == 404  # unregistered table
        st, _, err = _req(base, "DELETE", "/records/cdc/users/%24%7Bbad%7D")
        assert st == 422 and "invalid primary_key" in err["detail"]


def test_api_rate_limit(spark, tmp_path):
    from cass_cdc_pg_spark.middleware import RateLimiter

    state = str(tmp_path / "rl.json")
    rl = RateLimiter(state)
    for _ in range(100):  # exhaust the minute window out-of-band
        rl.check("GET metrics")
    with _server(spark, rate_limit_state=state) as base:
        st, hdrs, err = _req(base, "GET", "/metrics")
        assert st == 429
        assert int(hdrs["Retry-After"]) > 0
        assert "detail" in err
        # a different route still has quota
        st, _, _ = _req(base, "GET", "/health")
        assert st == 200


def test_api_table_history_and_changes(spark, tmp_path):
    """GET /tables/{t}/history lists retained versions; /changes
    streams the feed rows with _change_version; 422 without since,
    404 for unknown/empty tables, 410 past retention."""
    wh = str(tmp_path / "wh")
    ingest = CdcIngest(
        spark, wh,
        table_schemas={"users": T.StructType.fromDDL(USERS_DDL)},
        key_cols={"users": ["id"]},
        num_buckets=2,
    )
    mk = lambda eid, op, ts, before, after: (  # noqa: E731
        eid, "users", op, ts, before, after, 1, None, False)
    ingest.process_batch(spark.createDataFrame(
        [mk("44444444-4444-4444-8444-444444444441", "CREATE", 1000, None,
            {"id": U1, "username": "a", "age": "30"})], CHANGE_EVENT_DDL))
    ingest.process_batch(spark.createDataFrame(
        [mk("44444444-4444-4444-8444-444444444442", "UPDATE", 2000,
            {"id": U1, "username": "a", "age": "30"},
            {"id": U1, "username": "b", "age": "31"})], CHANGE_EVENT_DDL))

    cfg = {"tables": {"users": {"ddl": USERS_DDL, "keys": ["id"]}}}
    with _server(spark, wh=wh, cfg=cfg) as base:
        st, _, hist = _req(base, "GET", "/tables/users/history")
        assert st == 200 and len(hist) >= 2
        assert all("version" in h for h in hist)

        st, _, rows = _req(base, "GET", "/tables/users/changes?since=0")
        assert st == 200
        assert sorted(r["username"] for r in rows) == ["a", "b"]
        assert len({r["_change_version"] for r in rows}) == 2

        last = max(r["_change_version"] for r in rows)
        st, _, rows = _req(base, "GET", f"/tables/users/changes?since={last}")
        assert st == 200 and rows == []

        st, _, err = _req(base, "GET", "/tables/users/changes")
        assert st == 422 and "since" in err["detail"]
        # malformed to/limit are 422 validation errors, not 500s
        st, _, _ = _req(base, "GET", "/tables/users/changes?since=0&to=zzz")
        assert st == 422
        st, _, _ = _req(base, "GET", "/tables/users/changes?since=0&limit=x")
        assert st == 422
        st, _, _ = _req(base, "GET", "/tables/ghost/changes?since=0")
        assert st == 404
        st, _, _ = _req(base, "GET", "/tables/ghost/history")
        assert st == 404


def test_api_changes_conflict_after_rewrite(spark, tmp_path):
    """A GDPR erasure (rewrite commit) in the requested range returns
    409 with the resync message — the error contract of the CDF
    surface."""
    wh = str(tmp_path / "wh")
    ingest = CdcIngest(
        spark, wh,
        table_schemas={"users": T.StructType.fromDDL(USERS_DDL)},
        key_cols={"users": ["id"]},
        num_buckets=2,
    )
    ingest.process_batch(spark.createDataFrame(
        [("55555555-5555-4555-8555-555555555551", "users", "CREATE", 1000,
          None, {"id": U1, "username": "a", "age": "30"}, 1, None, False)],
        CHANGE_EVENT_DDL))
    cfg = {"tables": {"users": {"ddl": USERS_DDL, "keys": ["id"]}}}
    with _server(spark, wh=wh, cfg=cfg) as base:
        st, _, _ = _req(base, "DELETE", f"/records/cdc/users/{U1}")
        assert st == 200
        st, _, err = _req(base, "GET", "/tables/users/changes?since=0")
        assert st == 409 and "rewrite" in err["detail"]


def test_api_hot_route_cache_and_invalidation(spark, tmp_path):
    """The short-TTL read cache: repeated dlq_stats within the TTL
    reuses the computed answer (no extra Spark actions); any mutating
    route invalidates, so read-your-writes holds; cache_ttl=0
    disables caching entirely."""
    wh = str(tmp_path / "wh")
    _seed_warehouse(spark, wh)  # seeds one invalid event -> one DLQ row

    from cass_cdc_pg_spark.api import CdcApiService

    svc = CdcApiService(spark, sf_dir=None, warehouse=wh, cache_ttl=60.0)
    first = svc.dlq_stats()
    assert first["total"] == 1
    calls = []
    orig = svc._dlq_stats_compute
    svc._dlq_stats_compute = lambda: calls.append(1) or orig()
    assert svc.dlq_stats() == first  # served from cache
    assert calls == []
    svc._invalidate_cache()
    assert svc.dlq_stats() == first  # recomputed after invalidation
    assert calls == [1]

    nocache = CdcApiService(spark, sf_dir=None, warehouse=wh, cache_ttl=0)
    seen = []
    inner = nocache._dlq_stats_compute
    nocache._dlq_stats_compute = lambda: seen.append(1) or inner()
    nocache.dlq_stats(); nocache.dlq_stats()
    assert seen == [1, 1]  # every call computes


def test_api_async_reconciliation_trigger(spark, tmp_path):
    """The reference trigger contract (reconciliation.py:73-119):
    async returns status=running immediately; polling /jobs/{id}
    eventually shows completed with the same fields the sync path
    returns."""
    import time as _time

    wh = str(tmp_path / "wh")
    with _server(spark, wh=wh, sf_dir=SF) as base:
        st, _, job = _req(base, "POST", "/reconciliation/trigger",
                          body={"strategy": "row_count", "async": True})
        assert st == 200 and job["status"] == "running"
        jid = job["job_id"]
        for _ in range(120):
            st, _, got = _req(base, "GET", f"/reconciliation/jobs/{jid}")
            assert st == 200
            if got["status"] != "running":
                break
            _time.sleep(0.5)
        assert got["status"] == "completed", got
        assert {"src_count", "tgt_count", "severity"} <= set(got["rows"][0])
