"""Schema evolution: detect → compat gate → evolve/DLQ.

Local-mode ports of the reference's integration scenarios:
- ADD_COLUMN propagates and old rows backfill NULL
  (``test_schema_add_column.py:52``)
- MODIFY_COLUMN is rejected under BACKWARD and events carrying the
  rejected version are DLQ'd as SCHEMA_MISMATCH
  (``test_schema_type_change.py:51-228``, ``test_schema_incompatible.py:68``,
  FR-017 ``spec.md:172``)
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cass_cdc_pg_spark.streaming.ingest import CdcIngest
from cass_cdc_pg_spark.streaming.schema_evolution import (
    ADD_COLUMN,
    BACKWARD,
    DROP_COLUMN,
    FULL,
    MODIFY_COLUMN,
    NONE,
    SchemaRegistry,
    check_compatibility,
    detect_changes,
)

U1 = "11111111-1111-1111-1111-111111111111"
U2 = "22222222-2222-2222-2222-222222222222"

CHANGE_EVENT_DDL = (
    "event_id string, source_table string, operation_type string, "
    "timestamp_micros long, before map<string,string>, after map<string,string>, "
    "schema_version int, ttl_seconds int, is_tombstone boolean"
)

V1 = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("username", T.StringType()),
        T.StructField("age", T.IntegerType()),
    ]
)


def _eid(n):
    return str(uuid.UUID(int=n))


def _ev(eid, ts, after, version=1):
    return (_eid(eid), "users", "CREATE", ts, None, after, version, None, False)


@pytest.fixture()
def ingest(spark, tmp_path):
    return CdcIngest(
        spark,
        str(tmp_path / "wh"),
        table_schemas={"users": V1},
        key_cols={"users": ["id"]},
        num_buckets=4,
    )


# -- detector + gate (unit level) -------------------------------------------

def test_detect_changes_all_three_kinds():
    old = {"a": "int", "b": "string", "c": "double"}
    new = {"a": "int", "b": "bigint", "d": "string"}
    got = {(c["type"], c["column"]) for c in detect_changes(old, new)}
    assert got == {
        (ADD_COLUMN, "d"),
        (DROP_COLUMN, "c"),
        (MODIFY_COLUMN, "b"),
    }


def test_compat_rules():
    modify = [{"type": MODIFY_COLUMN, "column": "x", "old_type": "int", "new_type": "string"}]
    add_nullable = [{"type": ADD_COLUMN, "column": "x", "old_type": None, "new_type": "string"}]
    drop = [{"type": DROP_COLUMN, "column": "x", "old_type": "int", "new_type": None}]
    assert check_compatibility(modify, BACKWARD)[0] is False
    assert check_compatibility(modify, FULL)[0] is False
    assert check_compatibility(modify, NONE)[0] is True
    assert check_compatibility(add_nullable, BACKWARD, {"x": True})[0] is True
    assert check_compatibility(add_nullable, BACKWARD, {"x": False})[0] is False
    assert check_compatibility(drop, BACKWARD)[0] is True


def test_registry_versions_and_rejection(tmp_path):
    reg = SchemaRegistry(str(tmp_path / "meta"))
    assert reg.register("users", V1) == 1
    assert reg.register("users", V1) == 1  # idempotent
    v2 = T.StructType([*V1.fields, T.StructField("email", T.StringType())])
    ok, ver, changes = reg.evolve("users", v2)
    assert ok and ver == 2 and changes[0]["type"] == ADD_COLUMN
    bad = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("username", T.StringType()),
            T.StructField("age", T.StringType()),  # int → string
            T.StructField("email", T.StringType()),
        ]
    )
    ok, ver, changes = reg.evolve("users", bad)
    assert not ok and ver == 3
    assert reg.rejected_versions("users") == {3}
    assert reg.current_version("users") == 2  # active stays at v2
    assert len(reg.history("users")) == 3


# -- end-to-end through the ingest loop -------------------------------------

def test_add_column_auto_evolves_and_backfills(spark, ingest):
    """Port of test_schema_add_column.py:52 — a payload with an unseen
    column evolves the schema; the new column lands typed (string) and
    pre-evolution rows backfill NULL."""
    ingest.process_batch(spark.createDataFrame(
        [_ev(1, 1000, {"id": U1, "username": "a", "age": "30"})], CHANGE_EVENT_DDL))
    ingest.process_batch(spark.createDataFrame(
        [_ev(2, 2000, {"id": U2, "username": "b", "age": "31",
                       "test_column": "value_x"}, version=2)], CHANGE_EVENT_DDL))
    rows = {r["id"]: r.asDict() for r in ingest.table("users").read().collect()}
    assert rows[U2]["test_column"] == "value_x"
    assert rows[U1]["test_column"] is None  # NULL backfill, no rewrite
    assert ingest.schema_registry.current_version("users") == 2


def test_type_change_rejected_routes_to_dlq(spark, ingest):
    """Port of test_schema_type_change/test_schema_incompatible — a
    MODIFY_COLUMN evolution is rejected under BACKWARD; events carrying
    the rejected version land in the DLQ as SCHEMA_MISMATCH and NOT in
    the table."""
    ingest.process_batch(spark.createDataFrame(
        [_ev(1, 1000, {"id": U1, "username": "a", "age": "30"})], CHANGE_EVENT_DDL))

    bad_schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("username", T.StringType()),
            T.StructField("age", T.StringType()),  # type change
        ]
    )
    ok, rejected_version, changes = ingest.evolve_table_schema("users", bad_schema)
    assert not ok
    assert any(c["type"] == MODIFY_COLUMN for c in changes)

    ingest.process_batch(spark.createDataFrame(
        [_ev(2, 2000, {"id": U2, "username": "b", "age": "not-an-int"},
             version=rejected_version)], CHANGE_EVENT_DDL))
    # not merged
    assert {r["id"] for r in ingest.table("users").read().collect()} == {U1}
    dlq = ingest.dlq().collect()
    assert len(dlq) == 1
    assert dlq[0]["error_type"] == "SCHEMA_MISMATCH"
    assert "rejected schema version" in dlq[0]["error_message"]


def test_drop_column_is_compatible(spark, ingest):
    """BACKWARD allows DROP_COLUMN: writes under the narrowed schema
    merge cleanly; existing rows keep their old values."""
    ingest.process_batch(spark.createDataFrame(
        [_ev(1, 1000, {"id": U1, "username": "a", "age": "30"})], CHANGE_EVENT_DDL))
    narrowed = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("username", T.StringType())]
    )
    ok, ver, changes = ingest.evolve_table_schema("users", narrowed)
    assert ok and changes[0]["type"] == DROP_COLUMN
    ingest.process_batch(spark.createDataFrame(
        [_ev(2, 2000, {"id": U2, "username": "b"}, version=ver)], CHANGE_EVENT_DDL))
    rows = {r["id"]: r.asDict() for r in ingest.table("users").read().collect()}
    assert rows[U1]["age"] == 30       # mergeSchema keeps the old column
    assert rows[U2]["username"] == "b"
