"""Cassandra type-matrix hardening (SC-002, ``type_mapper.py:16-86``):
the exotic types SURVEY §1.2 names as risks — varint, time, inet,
frozen collections — through schema mapping, typed extraction, and the
full ingest path with the T8 DLQ contract."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import types as T

from cass_cdc_pg_spark.schema import cassandra_type_to_spark
from cass_cdc_pg_spark.streaming.ingest import CdcIngest

CHANGE_EVENT_DDL = (
    "event_id string, source_table string, operation_type string, "
    "timestamp_micros long, before map<string,string>, after map<string,string>, "
    "schema_version int, ttl_seconds int, is_tombstone boolean"
)

#: the users fixture's exotic subset (init-schema.cql:8-46) plus the
#: named risk types
EXOTIC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),                       # uuid
        T.StructField("net_worth", T.DecimalType(38, 0)),          # varint
        T.StructField("wake_time", T.LongType()),                  # time (nanos-of-day)
        T.StructField("last_ip", T.StringType()),                  # inet
        T.StructField("tags", T.ArrayType(T.StringType())),        # frozen<set<text>>
        T.StructField("prefs", T.MapType(T.StringType(), T.StringType())),  # map
        T.StructField("scores", T.ArrayType(T.IntegerType())),     # list<int>
        T.StructField(                                             # tuple/UDT
            "address",
            T.StructType(
                [
                    T.StructField("city", T.StringType()),
                    T.StructField("zip", T.IntegerType()),
                ]
            ),
        ),
    ]
)

U = "11111111-1111-4111-8111-11111111111{}"


def _eid(n: int) -> str:
    return U.format(n)


def test_cql_type_mapping_pins_risk_types():
    """The SC-002 rows the reference maps specially
    (``type_mapper.py:19-40,63-78``)."""
    assert cassandra_type_to_spark("varint") == T.DecimalType(38, 0)
    assert cassandra_type_to_spark("time") == T.LongType()
    assert cassandra_type_to_spark("inet") == T.StringType()
    assert cassandra_type_to_spark("counter") == T.LongType()
    # frozen<X> unwraps to X at every nesting level
    assert cassandra_type_to_spark("frozen<set<text>>") == T.ArrayType(T.StringType())
    assert cassandra_type_to_spark("frozen<map<text, int>>") == T.MapType(
        T.StringType(), T.IntegerType()
    )
    assert cassandra_type_to_spark("list<frozen<set<int>>>") == T.ArrayType(
        T.ArrayType(T.IntegerType())
    )
    # unknown types take the TEXT fallback (type_mapper.py:81)
    assert cassandra_type_to_spark("duration") == T.StringType()


def test_exotic_types_ingest_and_dlq(spark, tmp_path):
    """Good exotic values merge typed; each unconvertible value routes
    its event to the DLQ as TYPE_CONVERSION_ERROR naming the column."""
    ingest = CdcIngest(
        spark,
        str(tmp_path / "wh"),
        table_schemas={"users": EXOTIC_SCHEMA},
        key_cols={"users": ["id"]},
        num_buckets=2,
    )
    good_after = {
        "id": _eid(1),
        "net_worth": "123456789012345678901234567890",  # 30-digit varint
        "wake_time": "27000000000000",                  # 07:30 as nanos-of-day
        "last_ip": "2001:db8::1",
        "tags": '["a", "b"]',
        "prefs": '{"theme": "dark"}',
        "scores": "[1, 2, 3]",
        "address": '{"city": "Oslo", "zip": 150}',
    }
    bad_varint = dict(good_after, id=_eid(2), net_worth="not-a-number")
    bad_list = dict(good_after, id=_eid(3), scores="totally-not-json")
    events = spark.createDataFrame(
        [
            (_eid(1), "users", "CREATE", 1000, None, good_after, 1, None, False),
            (_eid(2), "users", "CREATE", 1100, None, bad_varint, 1, None, False),
            (_eid(3), "users", "CREATE", 1200, None, bad_list, 1, None, False),
        ],
        CHANGE_EVENT_DDL,
    )
    ingest.process_batch(events)

    rows = ingest.table("users").read_live().collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["net_worth"] == Decimal("123456789012345678901234567890")
    assert r["wake_time"] == 27_000_000_000_000
    assert r["last_ip"] == "2001:db8::1"
    assert sorted(r["tags"]) == ["a", "b"]
    assert r["prefs"]["theme"] == "dark"
    assert list(r["scores"]) == [1, 2, 3]
    assert r["address"]["city"] == "Oslo" and r["address"]["zip"] == 150

    dlq = {r["error_message"]: r for r in ingest.dlq().collect()}
    assert len(dlq) == 2
    assert all(r["error_type"] == "TYPE_CONVERSION_ERROR" for r in dlq.values())
    assert any("net_worth" in m for m in dlq)
    assert any("scores" in m for m in dlq)


def test_varint_overflow_routes_to_dlq(spark, tmp_path):
    """A varint wider than decimal(38,0) cannot be represented — it
    must DLQ, never silently truncate."""
    ingest = CdcIngest(
        spark,
        str(tmp_path / "wh"),
        table_schemas={"users": EXOTIC_SCHEMA},
        key_cols={"users": ["id"]},
        num_buckets=2,
    )
    after = {"id": _eid(4), "net_worth": "9" * 45}  # 45 digits > 38 precision
    ingest.process_batch(
        spark.createDataFrame(
            [(_eid(4), "users", "CREATE", 1000, None, after, 1, None, False)],
            CHANGE_EVENT_DDL,
        )
    )
    assert ingest.table("users").exists() is False or (
        ingest.table("users").read_live().count() == 0
    )
    dlq = ingest.dlq().collect()
    assert len(dlq) == 1 and dlq[0]["error_type"] == "TYPE_CONVERSION_ERROR"
    assert "net_worth" in dlq[0]["error_message"]
