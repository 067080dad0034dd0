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


# ---------------------------------------------------------------------------
# pure-Python Avro binary codec (Avro 1.11 spec §binary encoding) for
# the schema subset avro_schema_for emits: records of ["null", prim]
# unions.  Lets the decode path execute — and be tested bit-for-bit —
# without the spark-avro jar or fastavro, neither of which ships in
# this container.
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _primitive(avro_t) -> str:
    return avro_t["type"] if isinstance(avro_t, dict) else avro_t


def encode_avro_record(schema_json: str, values: dict) -> bytes:
    """Binary-encode one record under an ``avro_schema_for`` schema."""
    import struct

    schema = json.loads(schema_json)
    out = bytearray()
    for f in schema["fields"]:
        v = values.get(f["name"])
        if v is None:
            out += _zigzag_encode(0)  # union branch: null
            continue
        out += _zigzag_encode(1)  # union branch: the value type
        t = _primitive(f["type"][1])
        if t in ("long", "int"):
            out += _zigzag_encode(int(v))
        elif t == "string":
            b = str(v).encode()
            out += _zigzag_encode(len(b)) + b
        elif t == "bytes":
            out += _zigzag_encode(len(v)) + bytes(v)
        elif t == "double":
            out += struct.pack("<d", float(v))
        elif t == "float":
            out += struct.pack("<f", float(v))
        elif t == "boolean":
            out += b"\x01" if v else b"\x00"
        else:  # pragma: no cover — schema generator never emits others
            raise NotImplementedError(f"avro type {t}")
    return bytes(out)


def decode_avro_record(schema_json: str, data: bytes) -> dict:
    """Mirror of :func:`encode_avro_record`."""
    import struct

    schema = json.loads(schema_json)
    pos = 0
    out: dict = {}
    for f in schema["fields"]:
        branch, pos = _zigzag_decode(data, pos)
        if branch == 0:
            out[f["name"]] = None
            continue
        t = _primitive(f["type"][1])
        if t in ("long", "int"):
            out[f["name"]], pos = _zigzag_decode(data, pos)
        elif t in ("string", "bytes"):
            ln, pos = _zigzag_decode(data, pos)
            raw = data[pos : pos + ln]
            pos += ln
            out[f["name"]] = raw.decode() if t == "string" else raw
        elif t == "double":
            out[f["name"]] = struct.unpack("<d", data[pos : pos + 8])[0]
            pos += 8
        elif t == "float":
            out[f["name"]] = struct.unpack("<f", data[pos : pos + 4])[0]
            pos += 4
        elif t == "boolean":
            out[f["name"]] = data[pos] == 1
            pos += 1
        else:  # pragma: no cover
            raise NotImplementedError(f"avro type {t}")
    return out


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


def decode_avro_value_python(
    raw: DataFrame, payload: T.StructType, record_name: str, value_col: str = "value"
) -> DataFrame:
    """Jar-free S3 decode: the same binary-Avro → typed-columns
    contract as :func:`decode_avro_value`, executed by the pure-Python
    codec inside Arrow-batched ``mapInPandas``.  Use when the
    spark-avro package cannot be deployed; undecodable values yield an
    all-NULL row the T7 validation stage DLQs (same failure contract
    as ``parse_change_events``)."""
    import pandas as pd

    schema_json = avro_schema_for(payload, record_name)
    names = [f.name for f in payload.fields]

    def run(batches):
        for pdf in batches:
            rows = []
            for v in pdf[value_col]:
                try:
                    rec = decode_avro_record(schema_json, bytes(v))
                    rows.append([rec.get(n) for n in names])
                except Exception:  # noqa: BLE001 — route, don't fail
                    rows.append([None] * len(names))
            yield pd.DataFrame(rows, columns=names)

    return raw.select(value_col).mapInPandas(run, payload)
