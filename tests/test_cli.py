"""Smoke tests for the CLI service facade (reference route surface)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from cass_cdc_pg_spark.cli import main
from cass_cdc_pg_spark.streaming.ingest import CdcIngest

USERS_DDL = "id string, username string, age int"
U1 = "11111111-1111-1111-1111-111111111111"

CHANGE_EVENT_DDL = (
    "event_id string, source_table string, operation_type string, "
    "timestamp_micros long, before map<string,string>, after map<string,string>, "
    "schema_version int, ttl_seconds int, is_tombstone boolean"
)


def _seed_warehouse(spark, wh: str) -> None:
    """One good user row + one DLQ'd event (bad timestamp)."""
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
                ("22222222-2222-4222-8222-222222222222", "users", "CREATE", 1000, None,
                 {"id": U1, "username": "a", "age": "30"}, 1, None, False),
                (None, "users", "CREATE", None, None,
                 {"id": "x"}, 1, None, False),  # invalid → DLQ
            ],
            CHANGE_EVENT_DDL,
        )
    )


def _cfg(tmp_path) -> str:
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(
        {"tables": {"users": {"ddl": USERS_DDL, "keys": ["id"]}}}
    ))
    return str(p)


def test_cli_full_surface(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    _seed_warehouse(spark, wh)
    cfg = _cfg(tmp_path)

    # dlq list / stats
    assert main(["dlq", "list", "--warehouse", wh], spark) == 0
    rows = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 1 and rows[0]["resolution_status"] == "PENDING"
    dlq_id = rows[0]["dlq_id"]

    assert main(["dlq", "stats", "--warehouse", wh], spark) == 0
    out = capsys.readouterr().out
    assert '"total": 1' in out

    # dlq resolve flips the status atomically
    assert main(["dlq", "resolve", "--warehouse", wh, "--id", dlq_id,
                 "--status", "IGNORED"], spark) == 0
    capsys.readouterr()
    assert main(["dlq", "list", "--warehouse", wh, "--status", "IGNORED"],
                spark) == 0
    rows = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 1

    # dlq replay (invalid event fails again; replay still resolves it)
    assert main(["dlq", "replay", "--warehouse", wh, "--config", cfg,
                 "--ids", dlq_id], spark) == 0
    assert json.loads(capsys.readouterr().out)["replayed"] == 1

    # gdpr erase removes the user and exits 0
    assert main(["gdpr", "erase", "--warehouse", wh, "--config", cfg,
                 "--table", "users", "--id", U1], spark) == 0
    result = json.loads(capsys.readouterr().out)
    assert result["status"] == "success"

    # metrics dump renders the prometheus text format
    assert main(["metrics", "dump"], spark) == 0
    assert "cdc_events_processed_total" in capsys.readouterr().out


def test_cli_reconcile_and_health(spark, tmp_path, capsys):
    sf = "/root/testdata/sf0.001"
    assert main(["reconcile", "run", "--sf-dir", sf,
                 "--strategy", "row_count"], spark) == 0
    row = json.loads(capsys.readouterr().out)
    assert {"src_count", "tgt_count", "drift_pct", "severity"} <= set(row)

    wh = str(tmp_path / "wh")
    _seed_warehouse(spark, wh)
    assert main(["health", "--sf-dir", sf, "--warehouse", wh], spark) == 0
    health = json.loads(capsys.readouterr().out)
    assert health["components"]["source"]["status"] == "healthy"
    assert health["components"]["target"]["status"] == "healthy"
    assert health["components"]["schema_registry"]["details"]["subject_count"] == 1
