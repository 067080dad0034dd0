"""ChangeEvent schema + Cassandra→Spark type mapping.

ChangeEvent mirrors the reference's Pydantic model
(``src/models/change_event.py:17-71``) and Avro contract
(``specs/001-cass-cdc-pg/contracts/kafka-topics.md:90-167``):
``before``/``after`` are semi-structured maps of stringified values;
a per-table pinned StructType is applied downstream during type
conversion (T8).
"""

from __future__ import annotations

from pyspark.sql import types as T

OPERATIONS = ("CREATE", "UPDATE", "DELETE", "TRUNCATE")

#: the streaming-ingest envelope (one row per change event)
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("source_table", T.StringType(), False),
        T.StructField("operation_type", T.StringType(), False),
        T.StructField("timestamp_micros", T.LongType(), False),
        T.StructField("before", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("after", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("schema_version", T.IntegerType(), True),
        T.StructField("ttl_seconds", T.IntegerType(), True),
        T.StructField("is_tombstone", T.BooleanType(), True),
    ]
)

#: Cassandra → Spark type map (``src/services/type_mapper.py:19-40``;
#: richer table ``specs/001-cass-cdc-pg/data-model.md:590-612``).
CASSANDRA_TO_SPARK: dict[str, T.DataType] = {
    "text": T.StringType(),
    "varchar": T.StringType(),
    "ascii": T.StringType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "counter": T.LongType(),
    "smallint": T.ShortType(),
    "tinyint": T.ByteType(),
    "varint": T.DecimalType(38, 0),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "decimal": T.DecimalType(38, 18),
    "boolean": T.BooleanType(),
    "uuid": T.StringType(),
    "timeuuid": T.StringType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "time": T.LongType(),  # nanos-of-day; Spark has no TIME type
    "blob": T.BinaryType(),
    "inet": T.StringType(),
}


def cassandra_type_to_spark(cql_type: str) -> T.DataType:
    """Map a CQL type string (incl. collections/frozen) to Spark."""
    s = cql_type.strip().lower()
    if s.startswith("frozen<") and s.endswith(">"):
        return cassandra_type_to_spark(s[7:-1])  # unwrap (type_mapper.py:76-78)
    if s.startswith(("list<", "set<")) and s.endswith(">"):
        inner = s[s.index("<") + 1 : -1]
        return T.ArrayType(cassandra_type_to_spark(inner))
    if s.startswith("map<") and s.endswith(">"):
        k, v = s[4:-1].split(",", 1)
        return T.MapType(cassandra_type_to_spark(k), cassandra_type_to_spark(v))
    return CASSANDRA_TO_SPARK.get(s, T.StringType())  # TEXT fallback


#: Valid UUID (canonical form) — validators.py:18-24
UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
