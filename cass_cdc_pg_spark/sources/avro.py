"""Avro + schema-registry deserialization (S3).

The reference consumes Avro-encoded change events whose writer schema
is resolved by registry id (``docker/connectors/cassandra-source.json:33-36``,
``src/services/schema_service.py:36-95``).  Spark's equivalent is
``from_avro(value, writer_schema_json)`` from the ``spark-avro``
package — an external jar not shipped with pip pyspark, so the wiring
is gated: present → real decode; absent → a clear error naming the
dependency (tests pin the gate).  JSON transport remains the in-repo
test path, exactly as the reference's tests bypass the registry.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Spark type → Avro type for the registry stand-in
#: (``schema_service.py:450-484`` maps Cassandra → Avro the same way).
_AVRO_TYPES = {
    "string": "string",
    "int": "int",
    "bigint": "long",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "binary": "bytes",
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
}


def avro_schema_for(payload: T.StructType, name: str) -> str:
    """Avro record schema JSON for a pinned payload StructType — what
    the reference registers per table/version."""
    fields = []
    for f in payload.fields:
        avro_t = _AVRO_TYPES.get(f.dataType.simpleString(), "string")
        fields.append({"name": f.name, "type": ["null", avro_t]})
    return json.dumps(
        {"type": "record", "name": name, "fields": fields}
    )


def avro_available() -> bool:
    try:
        from pyspark.sql.avro.functions import from_avro  # noqa: F401

        return True
    except ImportError:
        return False


def decode_avro_value(
    raw: DataFrame, payload: T.StructType, record_name: str, value_col: str = "value"
) -> DataFrame:
    """Decode an Avro-encoded binary column with the table's registered
    writer schema.  Requires the spark-avro package on the classpath
    (``--packages org.apache.spark:spark-avro_2.13:<spark-version>``)."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover - import always succeeds in pyspark>=3
        raise NotImplementedError(
            "Avro decode requires the spark-avro package "
            "(org.apache.spark:spark-avro_2.13) on the Spark classpath"
        ) from e
    schema_json = avro_schema_for(payload, record_name)
    return raw.select(
        from_avro(F.col(value_col), schema_json).alias("e")
    ).select("e.*")
