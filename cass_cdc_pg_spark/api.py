"""HTTP service surface on the stdlib ``http.server`` — the actual
listener for the route surface the CLI facade (``cli.py``) already
maps 1:1.  The reference serves these over FastAPI/uvicorn
(``src/api/main.py:79-83``); no web framework ships in this
container, so the server is a ``ThreadingHTTPServer`` with a small
regex router, which keeps the dependency surface at zero while the
request/response contracts stay reference-shaped.

Routes (reference ``src/api/routes/*``):

- ``GET    /health``                          (``health.py:63``)
- ``GET    /health/{component}``              (``health.py:111``)
- ``GET    /metrics``                         (``metrics.py:13``)
- ``GET    /dlq/records``                     (``dlq.py:118-225``)
- ``GET    /dlq/stats``                       (``dlq.py:227``)
- ``POST   /dlq/replay``                      (``dlq.py:67-114``)
- ``POST   /reconciliation/trigger``          (``reconciliation.py:73-119``)
- ``GET    /reconciliation/jobs``             (``reconciliation.py:123``)
- ``GET    /reconciliation/jobs/{job_id}``    (``reconciliation.py:169``)
- ``GET    /reconciliation/mismatches``       (``reconciliation.py:199``)
- ``POST   /reconciliation/mismatches/{id}/resolve`` (``reconciliation.py:245``)
- ``DELETE /records/{keyspace}/{table}/{primary_key}`` (``gdpr.py:38``)
- ``GET    /tables/{table}/history``           (beyond-reference: version log)
- ``GET    /tables/{table}/changes?since=``    (beyond-reference: change feed;
  410 past retention, 409 across a rewrite)

Middleware parity (reference ``src/middleware/*``): every response
carries an ``X-Request-ID`` (echoed from the request header or
generated), an optional fixed-window rate limiter returns 429 with
``Retry-After``, and each request runs inside a tracing span.  Errors
use FastAPI's ``{"detail": ...}`` envelope.

Persistence: reconciliation jobs live in an in-process registry (the
reference keeps them in Postgres; a server-lifetime store is the
single-process analog).  Mismatches are durable — written through the
LSM ``KeyedTable`` merge path under ``{warehouse}/recon_mismatches``
so resolve survives restarts and exercises the real upsert engine.
"""

from __future__ import annotations

import json
import re
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cass_cdc_pg_spark import middleware

_IDENT_RE = re.compile(r"^[A-Za-z0-9_.\-:]{1,128}$")

MISMATCH_DDL = (
    "mismatch_id string, job_id string, strategy string, detail string, "
    "resolution_status string, resolution_notes string"
)

RESOLUTION_STATUSES = ("PENDING", "MANUAL_RESOLVED", "AUTO_RESOLVED", "IGNORED")


class ApiError(Exception):
    """Maps to an HTTP status + FastAPI-style ``{"detail": ...}`` body."""

    def __init__(self, status: int, detail: str) -> None:
        super().__init__(detail)
        self.status = status
        self.detail = detail


def _validate_identifier(value: str, kind: str) -> str:
    """Reference ``gdpr.py:235`` — reject path-traversal / injection
    shaped identifiers before they reach the engine."""
    if not _IDENT_RE.match(value or ""):
        raise ApiError(422, f"invalid {kind}: {value!r}")
    return value


class CdcApiService:
    """Engine-facing handlers, one method per route; transport-free so
    tests can call them directly and the HTTP layer stays thin."""

    def __init__(
        self,
        spark,
        *,
        sf_dir: str | None = None,
        warehouse: str | None = None,
        table_config: dict | None = None,
        secrets=None,
        cache_ttl: float = 2.0,
    ) -> None:
        self.spark = spark
        self.sf_dir = sf_dir
        self.warehouse = warehouse.rstrip("/") if warehouse else None
        self.table_config = table_config or {"tables": {}}
        self.secrets = secrets
        self._jobs: dict[str, dict] = {}
        self._jobs_lock = threading.Lock()
        self.cache_ttl = cache_ttl
        self._cache: dict[str, tuple[float, object]] = {}
        self._cache_lock = threading.Lock()
        self._cache_epoch = 0  # bumped by every invalidation
        self._cache_max_entries = 256

    # -- shared plumbing ----------------------------------------------------

    def _cached(self, key: str, compute):
        """Short-TTL cache for hot READ-ONLY routes whose answers cost
        Spark actions (health probes, DLQ stats).  Under concurrent
        load every request was paying driver-side job latency for an
        answer that changes at microbatch cadence — the reference's
        dashboard polling has the same shape and caches at the proxy.
        Any mutating route calls ``_invalidate_cache`` so the server
        keeps read-your-writes semantics; ``cache_ttl=0`` disables."""
        import copy

        if self.cache_ttl <= 0:
            return compute()
        now = time.monotonic()
        with self._cache_lock:
            hit = self._cache.get(key)
            if hit is not None and hit[0] > now:
                # defensive copy (r7 ADVICE): the stored dicts/lists
                # are mutable — a handler that edits its response in
                # place (request ids, pagination trims) must not
                # poison every later hit within the TTL
                return copy.deepcopy(hit[1])
            epoch = self._cache_epoch
        val = compute()
        with self._cache_lock:
            # an invalidation DURING compute means this value may
            # predate a mutation — serve it, but don't cache it, or a
            # pre-mutation answer would outlive the invalidation and
            # break the read-your-writes promise
            if self._cache_epoch == epoch:
                if len(self._cache) >= self._cache_max_entries:
                    # purge expired first; if still full, drop the
                    # soonest-to-expire (client-supplied param combos
                    # must not grow the cache without bound)
                    for k in [k for k, v in self._cache.items() if v[0] <= now]:
                        del self._cache[k]
                    while len(self._cache) >= self._cache_max_entries:
                        del self._cache[min(self._cache, key=lambda k: self._cache[k][0])]
                # store a private copy too: the first caller gets the
                # original and may mutate it after this returns
                self._cache[key] = (now + self.cache_ttl, copy.deepcopy(val))
        return val

    def _invalidate_cache(self, *prefixes: str) -> None:
        """Drop cached entries whose key starts with any *prefix* (all
        entries when none given).  Mutating routes invalidate only the
        families they can affect — a reconciliation trigger must not
        force every health probe and DLQ read to recompute.  Bumps the
        epoch so in-flight computes started before the mutation are
        not cached after it."""
        with self._cache_lock:
            self._cache_epoch += 1
            if not prefixes:
                self._cache.clear()
                return
            for k in [
                k for k in self._cache
                if any(k.startswith(p) for p in prefixes)
            ]:
                del self._cache[k]

    def _require_warehouse(self) -> str:
        if not self.warehouse:
            raise ApiError(503, "warehouse not configured")
        return self.warehouse

    def _dlq_table(self):
        from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

        return KeyedTable(
            self.spark, f"{self._require_warehouse()}/dlq_records", ["dlq_id"],
            num_buckets=8,
        )

    def _mismatch_table(self):
        from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

        return KeyedTable(
            self.spark,
            f"{self._require_warehouse()}/recon_mismatches",
            ["mismatch_id"],
            num_buckets=4,
        )

    def _ingest(self):
        from cass_cdc_pg_spark.streaming.ingest import CdcIngest

        tables = self.table_config["tables"]
        if not tables:
            raise ApiError(503, "table config not provided")
        return CdcIngest(
            self.spark,
            self._require_warehouse(),
            table_schemas={
                n: T.StructType.fromDDL(c["ddl"]) for n, c in tables.items()
            },
            key_cols={n: c["keys"] for n, c in tables.items()},
        )

    # -- health / metrics ---------------------------------------------------

    def _health_service(self):
        from cass_cdc_pg_spark.monitoring import HealthCheckService
        from cass_cdc_pg_spark.streaming.schema_evolution import SchemaRegistry

        reg = (
            SchemaRegistry(f"{self.warehouse}/_schema_meta")
            if self.warehouse
            else None
        )
        return HealthCheckService(
            self.spark,
            source_path=self.sf_dir,
            target_warehouse=self.warehouse,
            schema_registry=reg,
            secrets=self.secrets,
        )

    def health(self) -> tuple[int, dict]:
        out = self._cached("health", lambda: self._health_service().check_all())
        return (503 if out["status"] == "unhealthy" else 200), out

    def health_component(self, component: str) -> tuple[int, dict]:
        svc = self._health_service()
        probes = {
            "source": svc.check_source,
            "target": svc.check_target,
            "stream": svc.check_stream,
            "schema_registry": svc.check_schema_registry,
            "secrets": svc.check_secrets,
        }
        if component not in probes:
            raise ApiError(404, f"unknown component: {component}")
        out = self._cached(f"health:{component}", probes[component])
        return (503 if out["status"] == "unhealthy" else 200), out

    def metrics(self) -> str:
        from cass_cdc_pg_spark.monitoring import METRICS

        return METRICS.render_prometheus()

    # -- dlq ----------------------------------------------------------------

    def dlq_records(self, params: dict) -> list[dict]:
        key = "dlq_records:" + json.dumps(
            {k: params[k] for k in sorted(params)}, sort_keys=True
        )
        return self._cached(key, lambda: self._dlq_records_compute(params))

    def _dlq_records_compute(self, params: dict) -> list[dict]:
        from cass_cdc_pg_spark.operators.listings import listing
        from cass_cdc_pg_spark.plans.keyed_table import META_COLS

        df = self._dlq_table().read_live().drop(*META_COLS)
        preds = []
        for qp, col in (
            ("error_type", "error_type"),
            ("status", "resolution_status"),
            ("table", "source_table"),
        ):
            if params.get(qp):
                preds.append(F.col(col) == params[qp])
        out = listing(
            df,
            preds,
            [F.desc("first_failed_at_us"), F.asc("dlq_id")],
            limit=int(params.get("limit", 50)),
            offset=int(params.get("offset", 0)),
        )
        return [r.asDict() for r in out.collect()]

    def dlq_stats(self) -> dict:
        return self._cached("dlq_stats", self._dlq_stats_compute)

    def _dlq_stats_compute(self) -> dict:
        # ONE Spark action: group on the full dim triple (bounded by
        # distinct error/status/table combinations, tiny by contract)
        # and marginalize driver-side — was 4 actions (3 groupBys +
        # count), i.e. 4 job latencies per request under load
        df = self._dlq_table().read_live()
        dims = ("error_type", "resolution_status", "source_table")
        rows = df.groupBy(*dims).count().collect()
        by: dict = {dim: {} for dim in dims}
        total = 0
        for r in rows:
            total += r["count"]
            for dim in dims:
                k = str(r[dim])
                by[dim][k] = by[dim].get(k, 0) + r["count"]
        out = {dim: dict(sorted(by[dim].items())) for dim in dims}
        out["total"] = total
        return out

    def dlq_replay(self, body: dict) -> dict:
        ids = body.get("event_ids") or body.get("ids")
        if not isinstance(ids, list) or not ids:
            raise ApiError(422, "event_ids must be a non-empty list")
        n = self._ingest().replay_dlq([str(i) for i in ids])
        self._invalidate_cache("dlq", "health")
        return {"replayed": n, "resolution_status": "MANUAL_RESOLVED"}

    # -- reconciliation -----------------------------------------------------

    _STRATEGIES = ("row_count", "checksum", "timestamp_range", "sample")

    def reconciliation_trigger(self, body: dict) -> dict:
        """Sync by default (job completes in-request; the CLI/test
        contract).  ``{"async": true}`` matches the REFERENCE contract
        (``reconciliation.py:73-119`` returns ``status=RUNNING`` and
        the client polls ``/jobs/{id}``): the job registers as
        ``running``, the reconcile runs on a worker thread, and the
        response returns at registration latency instead of
        Spark-job latency."""
        strategy = body.get("strategy", "row_count")
        if strategy not in self._STRATEGIES:
            raise ApiError(422, f"unknown strategy: {strategy}")
        sf_dir = body.get("sf_dir") or self.sf_dir
        if not sf_dir:
            raise ApiError(503, "sf_dir not configured")
        limit = int(body.get("limit", 100))
        job_id = uuid.uuid4().hex
        if body.get("async"):
            job = {
                "job_id": job_id,
                "strategy": strategy,
                "status": "running",
                "row_count": None,
                "mismatch_count": None,
                "rows": [],
            }
            with self._jobs_lock:
                self._jobs[job_id] = job

            def _worker() -> None:
                try:
                    self._run_reconciliation(job_id, strategy, sf_dir, limit)
                except Exception as e:  # surface via job status, not a socket
                    with self._jobs_lock:
                        self._jobs[job_id] = {
                            "job_id": job_id,
                            "strategy": strategy,
                            "status": "failed",
                            "detail": str(e),
                            "row_count": None,
                            "mismatch_count": None,
                            "rows": [],
                        }

            threading.Thread(target=_worker, daemon=True).start()
            return dict(job)
        return self._run_reconciliation(job_id, strategy, sf_dir, limit)

    def _run_reconciliation(
        self, job_id: str, strategy: str, sf_dir: str, limit: int
    ) -> dict:
        from cass_cdc_pg_spark import registry

        q = {
            "row_count": registry.q1_row_count,
            "checksum": registry.q3_checksum_diff,
            "timestamp_range": registry.q5_range_diff,
            "sample": registry.q6_sample,
        }[strategy]
        rows = [r.asDict() for r in q(self.spark, sf_dir).limit(limit).collect()]
        # checksum / timestamp_range rows each name a divergent key →
        # durable mismatch records through the real LSM merge path;
        # id = content digest so re-triggering upserts, not duplicates
        if strategy in ("checksum", "timestamp_range") and rows:
            import hashlib

            def _mid(r: dict) -> str:
                detail = json.dumps(r, default=str, sort_keys=True)
                return f"{strategy}:{hashlib.sha1(detail.encode()).hexdigest()[:16]}"

            mm = self.spark.createDataFrame(
                [
                    (
                        _mid(r),
                        job_id,
                        strategy,
                        json.dumps(r, default=str, sort_keys=True),
                        "PENDING",
                        None,
                    )
                    for r in rows
                ],
                MISMATCH_DDL,
            )
            self._mismatch_table().upsert(mm)
        job = {
            "job_id": job_id,
            "strategy": strategy,
            "status": "completed",
            "row_count": len(rows),
            "mismatch_count": len(rows)
            if strategy in ("checksum", "timestamp_range")
            else 0,
            "rows": rows[: min(limit, 20)],
        }
        with self._jobs_lock:
            self._jobs[job_id] = job
        # job listings and mismatch reads are served uncached (jobs
        # live in-memory; mismatches hit the LSM table directly), so
        # there is nothing to invalidate here today — revisit if those
        # routes ever gain cache entries
        return job

    def reconciliation_jobs(self) -> list[dict]:
        with self._jobs_lock:
            return [
                {k: v for k, v in j.items() if k != "rows"}
                for j in self._jobs.values()
            ]

    def reconciliation_job(self, job_id: str) -> dict:
        with self._jobs_lock:
            job = self._jobs.get(job_id)
        if job is None:
            raise ApiError(404, f"job {job_id} not found")
        return job

    def reconciliation_mismatches(self, params: dict) -> list[dict]:
        from cass_cdc_pg_spark.operators.listings import listing
        from cass_cdc_pg_spark.plans.keyed_table import META_COLS

        t = self._mismatch_table()
        if not t.exists():
            return []
        df = t.read_live().drop(*META_COLS)
        preds = []
        if params.get("status"):
            preds.append(F.col("resolution_status") == params["status"])
        out = listing(
            df,
            preds,
            [F.asc("mismatch_id")],
            limit=int(params.get("limit", 50)),
            offset=int(params.get("offset", 0)),
        )
        return [r.asDict() for r in out.collect()]

    def reconciliation_resolve(self, mismatch_id: str, body: dict) -> dict:
        status = body.get("status", "MANUAL_RESOLVED")
        if status not in RESOLUTION_STATUSES:
            raise ApiError(422, f"unknown status: {status}")
        from cass_cdc_pg_spark.plans.keyed_table import META_COLS

        t = self._mismatch_table()
        if not t.exists():
            raise ApiError(404, f"mismatch {mismatch_id} not found")
        df = t.read_live().drop(*META_COLS)
        hit = df.filter(F.col("mismatch_id") == mismatch_id)
        updated = hit.withColumn("resolution_status", F.lit(status)).withColumn(
            "resolution_notes", F.lit(body.get("notes"))
        )
        if not updated.take(1):
            raise ApiError(404, f"mismatch {mismatch_id} not found")
        t.upsert(updated)
        return {"mismatch_id": mismatch_id, "resolution_status": status}

    # -- gdpr ---------------------------------------------------------------

    def gdpr_delete(self, keyspace: str, table: str, primary_key: str) -> dict:
        from cass_cdc_pg_spark.ops import AuditLog, GdprService
        from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

        _validate_identifier(keyspace, "keyspace")
        _validate_identifier(table, "table")
        _validate_identifier(primary_key, "primary_key")
        cfg = self.table_config["tables"].get(table)
        if cfg is None:
            raise ApiError(404, f"unknown table: {table}")
        wh = self._require_warehouse()
        src = KeyedTable(self.spark, f"{wh}/cdc_{table}", cfg["keys"])
        audit = AuditLog(self.spark, f"{wh}/_cdc_audit_log")
        key_col = cfg["keys"][0]
        pred = F.col(key_col).cast("string") == primary_key
        try:
            out = GdprService(self.spark, audit).erase(
                src, src, pred, table, primary_key, requester="api_user"
            )
        except KeyError as e:
            raise ApiError(404, str(e)) from e
        self._invalidate_cache("health", "tables")
        return out


    def table_history(self, table: str) -> list[dict]:
        _validate_identifier(table, "table")
        t = self._keyed_table_or_404(table)
        return t.history()

    def table_changes(self, table: str, params: dict) -> list[dict]:
        """Change feed over HTTP (the CDF surface of `table changes`):
        410 Gone when the range fell out of retention, 409 Conflict
        when it crosses a rewrite commit (resync required)."""
        _validate_identifier(table, "table")
        t = self._keyed_table_or_404(table)
        try:
            since = int(params["since"])
            to = int(params["to"]) if "to" in params else None
            limit = min(int(params.get("limit", 100)), 1000)
        except (KeyError, ValueError) as e:
            raise ApiError(
                422, "query params 'since' (int, required), 'to'/'limit' "
                "(int) malformed"
            ) from e
        try:
            df = t.read_changes(since, to)
        except FileNotFoundError as e:
            raise ApiError(410, str(e)) from e
        except ValueError as e:
            raise ApiError(409, str(e)) from e
        if df is None:
            return []
        return [r.asDict(recursive=True) for r in df.limit(limit).collect()]

    def _keyed_table_or_404(self, table: str):
        import os

        from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

        cfg = self.table_config["tables"].get(table)
        if cfg is None:
            raise ApiError(404, f"unknown table: {table}")
        wh = self._require_warehouse()
        path = f"{wh}/cdc_{table}"
        if not os.path.exists(f"{path}/_manifest.json"):
            raise ApiError(404, f"table {table} has no data yet")
        return KeyedTable(self.spark, path, cfg["keys"])


# ---------------------------------------------------------------------------
# transport
# ---------------------------------------------------------------------------

_ROUTES: list[tuple[str, re.Pattern, str]] = [
    ("GET", re.compile(r"^/health$"), "health"),
    ("GET", re.compile(r"^/health/(?P<component>[^/]+)$"), "health_component"),
    ("GET", re.compile(r"^/metrics$"), "metrics"),
    ("GET", re.compile(r"^/dlq/records$"), "dlq_records"),
    ("GET", re.compile(r"^/dlq/stats$"), "dlq_stats"),
    ("POST", re.compile(r"^/dlq/replay$"), "dlq_replay"),
    ("POST", re.compile(r"^/reconciliation/trigger$"), "reconciliation_trigger"),
    ("GET", re.compile(r"^/reconciliation/jobs$"), "reconciliation_jobs"),
    ("GET", re.compile(r"^/reconciliation/jobs/(?P<job_id>[^/]+)$"),
     "reconciliation_job"),
    ("GET", re.compile(r"^/reconciliation/mismatches$"),
     "reconciliation_mismatches"),
    ("POST",
     re.compile(r"^/reconciliation/mismatches/(?P<mismatch_id>[^/]+)/resolve$"),
     "reconciliation_resolve"),
    ("DELETE",
     re.compile(r"^/records/(?P<keyspace>[^/]+)/(?P<table>[^/]+)/(?P<primary_key>[^/]+)$"),
     "gdpr_delete"),
    ("GET", re.compile(r"^/tables/(?P<table>[^/]+)/history$"), "table_history"),
    ("GET", re.compile(r"^/tables/(?P<table>[^/]+)/changes$"), "table_changes"),
]


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    # route dispatch ---------------------------------------------------------

    def _dispatch(self, method: str) -> None:
        server: CdcApiServer = self.server  # type: ignore[assignment]
        split = urlsplit(self.path)
        params = {k: v[0] for k, v in parse_qs(split.query).items()}
        rid = middleware.request_id(self.headers.get("X-Request-ID"))
        match = name = None
        path_allowed: set[str] = set()
        for m, pat, nm in _ROUTES:
            got = pat.match(split.path)
            if got:
                path_allowed.add(m)
                if m == method:
                    match, name = got, nm
                    break
        try:
            if match is None:
                if path_allowed:
                    raise ApiError(405, f"method {method} not allowed")
                raise ApiError(404, f"no route for {split.path}")
            if server.rate_limiter is not None:
                try:
                    server.rate_limiter.check(f"{method} {name}")
                except middleware.RateLimitExceeded as e:
                    self._send(429, {"detail": str(e)}, rid,
                               extra={"Retry-After": str(int(e.retry_after))})
                    return
            with server.tracer.span(f"http.{name}", request_id=rid,
                                    method=method, path=split.path):
                out = self._invoke(server.service, name, match.groupdict(),
                                   params, method)
            if name == "metrics":
                self._send_text(200, out, rid)
            elif isinstance(out, tuple):
                self._send(out[0], out[1], rid)
            else:
                self._send(200, out, rid)
        except ApiError as e:
            self._send(e.status, {"detail": e.detail}, rid)
        except Exception as e:  # engine failure → 500, never a hung socket
            self._send(500, {"detail": f"{type(e).__name__}: {e}"}, rid)

    def _invoke(self, svc: CdcApiService, name: str, path_args: dict,
                params: dict, method: str):
        body = {}
        if method in ("POST", "DELETE"):
            n = int(self.headers.get("Content-Length") or 0)
            if n:
                try:
                    body = json.loads(self.rfile.read(n))
                except json.JSONDecodeError as e:
                    raise ApiError(422, f"invalid JSON body: {e}") from e
        dispatch = {
            "health": lambda: svc.health(),
            "health_component": lambda: svc.health_component(**path_args),
            "metrics": lambda: svc.metrics(),
            "dlq_records": lambda: svc.dlq_records(params),
            "dlq_stats": lambda: svc.dlq_stats(),
            "dlq_replay": lambda: svc.dlq_replay(body),
            "reconciliation_trigger": lambda: svc.reconciliation_trigger(body),
            "reconciliation_jobs": lambda: svc.reconciliation_jobs(),
            "reconciliation_job": lambda: svc.reconciliation_job(**path_args),
            "reconciliation_mismatches":
                lambda: svc.reconciliation_mismatches(params),
            "reconciliation_resolve":
                lambda: svc.reconciliation_resolve(
                    path_args["mismatch_id"], body),
            "gdpr_delete": lambda: svc.gdpr_delete(**path_args),
            "table_history": lambda: svc.table_history(**path_args),
            "table_changes":
                lambda: svc.table_changes(path_args["table"], params),
        }
        return dispatch[name]()

    # response helpers -------------------------------------------------------

    def _send(self, status: int, payload, rid: str,
              extra: dict | None = None) -> None:
        data = json.dumps(payload, default=str, sort_keys=True).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.send_header("X-Request-ID", rid)
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(data)

    def _send_text(self, status: int, text: str, rid: str) -> None:
        data = text.encode()
        self.send_response(status)
        self.send_header("Content-Type", "text/plain; version=0.0.4")
        self.send_header("Content-Length", str(len(data)))
        self.send_header("X-Request-ID", rid)
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        self._dispatch("GET")

    def do_POST(self) -> None:  # noqa: N802
        self._dispatch("POST")

    def do_DELETE(self) -> None:  # noqa: N802
        self._dispatch("DELETE")

    def log_message(self, fmt: str, *args) -> None:  # silence default stderr
        pass


class CdcApiServer(ThreadingHTTPServer):
    """Threaded listener bound to *host:port* (port 0 → ephemeral).

    ``start()`` serves on a daemon thread and returns the bound
    ``(host, port)``; ``stop()`` shuts the socket down.  Spark job
    submission is thread-safe, so concurrent requests are fine."""

    daemon_threads = True

    def __init__(self, service: CdcApiService, host: str = "127.0.0.1",
                 port: int = 0, rate_limit_state: str | None = None) -> None:
        super().__init__((host, port), _Handler)
        self.service = service
        self.tracer = middleware.Tracer()
        self.rate_limiter = (
            middleware.RateLimiter(rate_limit_state) if rate_limit_state else None
        )
        self._thread: threading.Thread | None = None

    def start(self) -> tuple[str, int]:
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()
        return self.server_address[0], self.server_address[1]

    def stop(self) -> None:
        self.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        self.server_close()
