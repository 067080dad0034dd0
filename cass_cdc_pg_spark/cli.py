"""Thin service facade: the reference's HTTP route surface as CLI
subcommands over the existing engine functions (no web framework).

Maps ``src/api/routes/*``:

- ``reconcile run``      → POST /reconciliation/trigger
  (``reconciliation.py:73-119``) — runs the chosen validation strategy
  and prints the job row / mismatch rows.
- ``dlq list``           → GET /dlq/records (``dlq.py:117-225``)
- ``dlq stats``          → GET /dlq/stats (``dlq.py:227-...``)
- ``dlq replay``         → POST /dlq/replay (``dlq.py:67-114``)
- ``dlq resolve``        → POST resolve (``dlq_service.py:246-255``)
- ``gdpr erase``         → DELETE /gdpr/users/{id} (``gdpr.py:37-216``)
- ``health``             → GET /health (``routes/health.py``)
- ``metrics dump``       → GET /metrics (``routes/metrics.py``)

Beyond the reference surface (storage-level features the reference's
Postgres target gets from the database itself):

- ``table history``      → retained snapshot versions of a keyed table
- ``table read``         → current or ``--version`` time-travel read
- ``table changes``      → change feed between retained versions (CDF)
- ``table compact``      → fold LSM deltas into fresh bases (OPTIMIZE)
- ``table sync``         → follow a change feed into a derived table (auto-resync)

Table metadata comes from a config JSON (the connector-config analog):

    {"tables": {"events": {"ddl": "event_id long, user_id long",
                           "keys": ["event_id"]}}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _load_config(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def _ingest(spark, warehouse: str, config: dict):
    from cass_cdc_pg_spark.streaming.ingest import CdcIngest

    tables = config["tables"]
    return CdcIngest(
        spark,
        warehouse,
        table_schemas={
            n: T.StructType.fromDDL(c["ddl"]) for n, c in tables.items()
        },
        key_cols={n: c["keys"] for n, c in tables.items()},
    )


def _dlq_df(spark, warehouse: str):
    from cass_cdc_pg_spark.plans.keyed_table import META_COLS, KeyedTable

    t = KeyedTable(spark, f"{warehouse.rstrip('/')}/dlq_records", ["dlq_id"],
                   num_buckets=8)
    return t, t.read_live().drop(*META_COLS)


def _emit(rows) -> None:
    for r in rows:
        print(json.dumps(r.asDict() if hasattr(r, "asDict") else r,
                         default=str, sort_keys=True))


def cmd_reconcile_run(args, spark) -> int:
    from cass_cdc_pg_spark import registry

    q = {
        "row_count": registry.q1_row_count,
        "checksum": registry.q3_checksum_diff,
        "timestamp_range": registry.q5_range_diff,
        "sample": registry.q6_sample,
    }[args.strategy]
    _emit(q(spark, args.sf_dir).limit(args.limit).collect())
    return 0


def cmd_dlq_list(args, spark) -> int:
    from cass_cdc_pg_spark.operators.listings import listing

    _, df = _dlq_df(spark, args.warehouse)
    preds = []
    if args.error_type:
        preds.append(F.col("error_type") == args.error_type)
    if args.status:
        preds.append(F.col("resolution_status") == args.status)
    if args.table:
        preds.append(F.col("source_table") == args.table)
    out = listing(
        df,
        preds,
        [F.desc("first_failed_at_us"), F.asc("dlq_id")],
        limit=args.limit,
        offset=args.offset,
    )
    _emit(out.collect())
    return 0


def cmd_dlq_stats(args, spark) -> int:
    _, df = _dlq_df(spark, args.warehouse)
    for dim in ("error_type", "resolution_status", "source_table"):
        for r in df.groupBy(dim).count().orderBy(dim).collect():
            print(json.dumps({"by": dim, dim: r[dim], "count": r["count"]},
                             sort_keys=True))
    print(json.dumps({"total": df.count()}))
    return 0


def cmd_dlq_replay(args, spark) -> int:
    ingest = _ingest(spark, args.warehouse, _load_config(args.config))
    n = ingest.replay_dlq(args.ids)
    print(json.dumps({"replayed": n, "resolution_status": "MANUAL_RESOLVED"}))
    return 0


def cmd_dlq_resolve(args, spark) -> int:
    """Status update without replay (``dlq_service.py:246-255``): an
    atomic keyed merge stamped with wall time (outranks the
    deterministic failure timestamp, so the flip always wins)."""
    t, df = _dlq_df(spark, args.warehouse)
    row = df.filter(F.col("dlq_id") == args.id).collect()
    if not row:
        print(json.dumps({"error": f"dlq_id {args.id} not found"}),
              file=sys.stderr)
        return 1
    now_us = int(time.time() * 1_000_000)
    updated = (
        df.filter(F.col("dlq_id") == args.id)
        .withColumn("resolution_status", F.lit(args.status))
        .withColumn("_cdc_deleted", F.lit(False))
        .withColumn("_cdc_timestamp_micros", F.lit(now_us))
        .withColumn("_last_event_id", F.lit(f"resolve-{uuid.uuid4().hex[:8]}"))
        .withColumn("_ttl_expiry_timestamp_us", F.lit(None).cast("long"))
    )
    t.merge(updated)
    print(json.dumps({"dlq_id": args.id, "resolution_status": args.status}))
    return 0


def cmd_gdpr_erase(args, spark) -> int:
    from cass_cdc_pg_spark.ops import AuditLog, GdprService
    from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

    cfg = _load_config(args.config)["tables"][args.table]
    wh = args.warehouse.rstrip("/")
    src = KeyedTable(spark, f"{wh}/cdc_{args.table}", cfg["keys"])
    tgt = (
        KeyedTable(spark, f"{args.target_warehouse.rstrip('/')}/cdc_{args.table}",
                   cfg["keys"])
        if args.target_warehouse
        else src
    )
    audit = AuditLog(spark, f"{wh}/_cdc_audit_log")
    key_col, key_val = cfg["keys"][0], args.id
    pred = F.col(key_col).cast("string") == key_val
    result = GdprService(spark, audit).erase(
        src, tgt, pred, args.table, key_val, requester=args.requester
    )
    print(json.dumps(result, default=str, sort_keys=True))
    return 0 if result["status"] == "success" else 1


def cmd_health(args, spark) -> int:
    from cass_cdc_pg_spark.monitoring import HealthCheckService
    from cass_cdc_pg_spark.streaming.schema_evolution import SchemaRegistry

    reg = (
        SchemaRegistry(f"{args.warehouse.rstrip('/')}/_schema_meta")
        if args.warehouse
        else None
    )
    out = HealthCheckService(
        spark,
        source_path=args.sf_dir,
        target_warehouse=args.warehouse,
        schema_registry=reg,
    ).check_all()
    print(json.dumps(out, sort_keys=True))
    return 0 if out["status"] != "unhealthy" else 1


def cmd_metrics_dump(args, spark) -> int:
    from cass_cdc_pg_spark.monitoring import METRICS

    sys.stdout.write(METRICS.render_prometheus())
    return 0


def _require_table(warehouse: str, table: str) -> str | None:
    """Existence gate BEFORE KeyedTable is constructed: the ctor
    os.makedirs its path, so probing a misspelled --table would
    silently create an empty warehouse directory and then surface as
    a confusing empty-table/version error (or exit 0 with no output
    for history).  A table exists iff its _manifest.json does."""
    path = f"{warehouse.rstrip('/')}/{table}"
    if not os.path.exists(os.path.join(path, "_manifest.json")):
        print(
            json.dumps({"error": "table_not_found", "table": table}),
            file=sys.stderr,
        )
        return None
    return path


def cmd_table_history(args, spark) -> int:
    """Retained snapshot versions of a keyed table (the DESCRIBE
    HISTORY analog; versions come from the manifest log, see
    ``plans/keyed_table.py``)."""
    from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

    path = _require_table(args.warehouse, args.table)
    if path is None:
        return 1
    t = KeyedTable(spark, path, [])
    for h in t.history():
        print(json.dumps(h, sort_keys=True))
    return 0


def cmd_table_read(args, spark) -> int:
    """Read a keyed table's current — or, with ``--version``, a
    retained historical — snapshot (time travel)."""
    from cass_cdc_pg_spark.plans.keyed_table import META_COLS, KeyedTable

    path = _require_table(args.warehouse, args.table)
    if path is None:
        return 1
    t = KeyedTable(spark, path, [])
    try:
        df = t.read(version=args.version)
    except FileNotFoundError as e:
        print(json.dumps({"error": "version_not_retained", "detail": str(e)}),
              file=sys.stderr)
        return 1
    if not args.meta:
        df = df.drop(*META_COLS)
    _emit(df.limit(args.limit).collect())
    return 0


def cmd_table_changes(args, spark) -> int:
    """Change feed between two retained versions (the Delta-CDF
    analog — see ``KeyedTable.read_changes``): merge-commit rows with
    ``_change_version``; errors distinctly when the range crosses a
    rewrite (resync required) or falls outside retention."""
    from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

    path = _require_table(args.warehouse, args.table)
    if path is None:
        return 1
    t = KeyedTable(spark, path, [])
    try:
        df = t.read_changes(args.since, args.to)
    except FileNotFoundError as e:
        print(json.dumps({"error": "version_not_retained", "detail": str(e)}),
              file=sys.stderr)
        return 1
    except ValueError as e:
        print(json.dumps({"error": "rewrite_in_range", "detail": str(e)}),
              file=sys.stderr)
        return 1
    _emit([] if df is None else df.limit(args.limit).collect())
    return 0


def cmd_table_compact(args, spark) -> int:
    """Fold LSM deltas into fresh bases (the OPTIMIZE verb); prints
    the number of buckets compacted."""
    from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

    path = _require_table(args.warehouse, args.table)
    if path is None:
        return 1
    t = KeyedTable(spark, path, [])
    if not t.key_cols:
        # legacy manifest without persisted key_cols: compacting would
        # LWW-reduce with zero group keys — one row per bucket, durable
        # data loss from a maintenance verb. Refuse.
        print(
            json.dumps(
                {
                    "error": "no_key_cols",
                    "detail": "manifest has no key_cols; re-create the "
                    "table or pass keys explicitly before compacting",
                }
            ),
            file=sys.stderr,
        )
        return 1
    n = t.compact()
    print(json.dumps({"table": args.table, "buckets_compacted": n}))
    return 0


def cmd_table_sync(args, spark) -> int:
    """Advance a derived table from a source table's change feed —
    incremental when the range is clean, automatic snapshot resync
    across rewrite commits (``streaming/follower.py``)."""
    from cass_cdc_pg_spark.plans.keyed_table import KeyedTable
    from cass_cdc_pg_spark.streaming.follower import ChangeFeedFollower

    src_path = _require_table(args.warehouse, args.table)
    if src_path is None:
        return 1
    source = KeyedTable(spark, src_path, [])
    if not source.key_cols:
        print(json.dumps({"error": "no_key_cols",
                          "detail": "source manifest has no key_cols"}),
              file=sys.stderr)
        return 1
    target = KeyedTable(
        spark, f"{args.warehouse.rstrip('/')}/{args.target}", source.key_cols,
        num_buckets=source.num_buckets,
    )
    st = ChangeFeedFollower(spark, source, target).sync()
    print(json.dumps({"table": args.table, "target": args.target, **st}))
    return 0


def cmd_serve(args, spark) -> int:
    """Run the HTTP listener (``api.py``) — the uvicorn analog
    (``src/api/main.py``).  Blocks until interrupted."""
    from cass_cdc_pg_spark.api import CdcApiServer, CdcApiService

    service = CdcApiService(
        spark,
        sf_dir=args.sf_dir,
        warehouse=args.warehouse,
        table_config=_load_config(args.config) if args.config else None,
    )
    server = CdcApiServer(service, host=args.host, port=args.port,
                          rate_limit_state=args.rate_limit_state)
    host, port = server.start()
    print(json.dumps({"listening": f"http://{host}:{port}"}))
    try:
        server._thread.join()
    except KeyboardInterrupt:
        server.stop()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="cass-cdc-pg-spark")
    # middleware analogs (src/middleware/*): X-Request-ID header →
    # --request-id flag; slowapi limits → --rate-limit-state file
    p.add_argument("--request-id", default=None,
                   help="propagated into output and trace context; "
                        "generated if absent (X-Request-ID analog)")
    p.add_argument("--rate-limit-state", default=None,
                   help="JSON state file enabling 100/min + 1000/hour "
                        "fixed-window rate limiting across invocations")
    p.add_argument("--trace", action="store_true",
                   help="emit a span line per command (tracing analog)")
    sub = p.add_subparsers(dest="cmd", required=True)

    rec = sub.add_parser("reconcile").add_subparsers(dest="sub", required=True)
    run = rec.add_parser("run")
    run.add_argument("--sf-dir", required=True)
    run.add_argument("--strategy", default="row_count",
                     choices=["row_count", "checksum", "timestamp_range", "sample"])
    run.add_argument("--limit", type=int, default=100)
    run.set_defaults(fn=cmd_reconcile_run)

    dlq = sub.add_parser("dlq").add_subparsers(dest="sub", required=True)
    ls = dlq.add_parser("list")
    ls.add_argument("--warehouse", required=True)
    ls.add_argument("--error-type")
    ls.add_argument("--status")
    ls.add_argument("--table")
    ls.add_argument("--limit", type=int, default=50)
    ls.add_argument("--offset", type=int, default=0)
    ls.set_defaults(fn=cmd_dlq_list)
    st = dlq.add_parser("stats")
    st.add_argument("--warehouse", required=True)
    st.set_defaults(fn=cmd_dlq_stats)
    rp = dlq.add_parser("replay")
    rp.add_argument("--warehouse", required=True)
    rp.add_argument("--config", required=True)
    rp.add_argument("--ids", nargs="+", required=True)
    rp.set_defaults(fn=cmd_dlq_replay)
    rs = dlq.add_parser("resolve")
    rs.add_argument("--warehouse", required=True)
    rs.add_argument("--id", required=True)
    rs.add_argument("--status", default="MANUAL_RESOLVED",
                    choices=["MANUAL_RESOLVED", "AUTO_RESOLVED", "IGNORED",
                             "PENDING"])
    rs.set_defaults(fn=cmd_dlq_resolve)

    gd = sub.add_parser("gdpr").add_subparsers(dest="sub", required=True)
    er = gd.add_parser("erase")
    er.add_argument("--warehouse", required=True)
    er.add_argument("--target-warehouse")
    er.add_argument("--config", required=True)
    er.add_argument("--table", required=True)
    er.add_argument("--id", required=True)
    er.add_argument("--requester", default="cli_user")
    er.set_defaults(fn=cmd_gdpr_erase)

    he = sub.add_parser("health")
    he.add_argument("--sf-dir")
    he.add_argument("--warehouse")
    he.set_defaults(fn=cmd_health)

    me = sub.add_parser("metrics").add_subparsers(dest="sub", required=True)
    du = me.add_parser("dump")
    du.set_defaults(fn=cmd_metrics_dump)

    tb = sub.add_parser("table").add_subparsers(dest="sub", required=True)
    hi = tb.add_parser("history")
    hi.add_argument("--warehouse", required=True)
    hi.add_argument("--table", required=True)
    hi.set_defaults(fn=cmd_table_history)
    rd = tb.add_parser("read")
    rd.add_argument("--warehouse", required=True)
    rd.add_argument("--table", required=True)
    rd.add_argument("--version", type=int, default=None)
    rd.add_argument("--limit", type=int, default=100)
    rd.add_argument("--meta", action="store_true",
                    help="include _cdc_* metadata columns")
    rd.set_defaults(fn=cmd_table_read)
    ch = tb.add_parser("changes")
    ch.add_argument("--warehouse", required=True)
    ch.add_argument("--table", required=True)
    ch.add_argument("--since", type=int, required=True,
                    help="emit merge commits AFTER this version")
    ch.add_argument("--to", type=int, default=None)
    ch.add_argument("--limit", type=int, default=100)
    ch.set_defaults(fn=cmd_table_changes)
    co = tb.add_parser("compact")
    co.add_argument("--warehouse", required=True)
    co.add_argument("--table", required=True)
    co.set_defaults(fn=cmd_table_compact)
    sy = tb.add_parser("sync")
    sy.add_argument("--warehouse", required=True)
    sy.add_argument("--table", required=True,
                    help="source table (the feed to follow)")
    sy.add_argument("--target", required=True,
                    help="derived table dir name under the warehouse")
    sy.set_defaults(fn=cmd_table_sync)

    sv = sub.add_parser("serve")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--sf-dir")
    sv.add_argument("--warehouse")
    sv.add_argument("--config")
    sv.set_defaults(fn=cmd_serve)
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    from cass_cdc_pg_spark import middleware

    args = build_parser().parse_args(argv)
    rid = middleware.request_id(args.request_id)
    if args.rate_limit_state:
        try:
            middleware.RateLimiter(args.rate_limit_state).check(
                f"{args.cmd}.{getattr(args, 'sub', '')}"
            )
        except middleware.RateLimitExceeded as e:
            print(json.dumps({"error": "rate_limit_exceeded",
                              "request_id": rid, "detail": str(e)}),
                  file=sys.stderr)
            return 429 % 256  # HTTP-analog exit code
    if spark is None:
        from cass_cdc_pg_spark.session import get_spark

        spark = get_spark(app_name="cass-cdc-pg-spark-cli")
    tracer = middleware.Tracer()
    with tracer.span(f"cli.{args.cmd}", trace_id=rid.replace("-", "")
                     if args.request_id else None,
                     command=args.cmd, request_id=rid):
        rc = args.fn(args, spark)
    if args.trace:
        for sp in tracer.spans:
            print(json.dumps({"span": sp}, default=str), file=sys.stderr)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
