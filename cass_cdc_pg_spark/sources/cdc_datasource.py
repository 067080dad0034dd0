"""Custom Python DataSource for the CDC event transport (S1/S2).

``spark.read.format("cdc_events")`` / ``spark.readStream.format(
"cdc_events")`` over a directory of JSONL envelope files — the
Spark-4 Python DataSource API expression of the reference's
Kafka-connector source (``docker/connectors/cassandra-source.json``):
the streaming reader keeps a **checkpointable offset** (count of
files consumed from the deterministic sorted listing), giving the
same replay/exactly-once semantics as Kafka partition offsets —
``startingOffsets``, incremental discovery, bounded triggers — with
no JVM connector jar.

Scale + role: a Python data source pays one Python hop per row, so
the production path for a real deployment stays JVM-side
(``kafka_stream`` + ``from_avro`` when the jars exist); this source
is the *contract surface* — offset management, restart resumption,
backpressure (``max_files_per_trigger``) — executable and testable
in-container.  Partition planning is one input partition per file,
so batch reads parallelize across executors like any file source.

Register per session:  ``spark.dataSource.register(CdcEventsDataSource)``.

Trigger note: Python micro-batch streams do not implement
``Trigger.AvailableNow`` — Spark logs a warning and falls back to
single-batch execution, which consumes everything available at start;
restart-resumption is still exact via the checkpointed offset (pinned
by ``tests/test_cdc_datasource.py``).
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from cass_cdc_pg_spark.schema import CHANGE_EVENT_SCHEMA

_FIELDS = [f.name for f in CHANGE_EVENT_SCHEMA.fields]


def _list_files(path: str) -> list[str]:
    try:
        return sorted(
            f"{path}/{n}" for n in os.listdir(path) if n.endswith(".jsonl")
        )
    except FileNotFoundError:
        return []


def _decode_payload(e: dict, schemas: dict[str, str]) -> dict:
    """Avro transport mode (S3): ``before``/``after`` arrive as base64
    Avro binary under the per-table registered schema; decode to the
    envelope's map<string,string> with the same stringification the
    JVM ``from_avro`` path produces."""
    import base64

    from cass_cdc_pg_spark.sources.avro import decode_avro_record

    schema = schemas.get(e.get("source_table"))
    out = dict(e)
    for side in ("before", "after"):
        v = e.get(side)
        if v is None or isinstance(v, dict):
            continue
        if schema is None:
            raise ValueError(
                f"avro payload for unregistered table {e.get('source_table')!r}"
            )
        rec = decode_avro_record(schema, base64.b64decode(v))
        out[side] = {
            k: (None if x is None else str(x)) for k, x in rec.items()
        }
    return out


def _rows(path: str, avro_schemas: dict[str, str] | None = None) -> Iterator[Tuple]:
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            e = json.loads(line)
            if avro_schemas is not None:
                e = _decode_payload(e, avro_schemas)
            yield tuple(e.get(k) for k in _FIELDS)


class CdcEventsBatchReader(DataSourceReader):
    def __init__(self, path: str, avro_schemas: dict[str, str] | None) -> None:
        self.files = _list_files(path)
        self.avro_schemas = avro_schemas

    def partitions(self):
        return [InputPartition(i) for i in range(len(self.files))]

    def read(self, partition: InputPartition) -> Iterator[Tuple]:
        return _rows(self.files[partition.value], self.avro_schemas)


class CdcEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset = number of files consumed from the sorted listing.

    The listing is append-only in a CDC landing dir (connectors write
    new segment files, never mutate old ones), so a count is a total
    order exactly like a Kafka partition offset; ``readBetweenOffsets``
    replays any committed range deterministically after a restart.
    """

    def __init__(
        self,
        path: str,
        max_files_per_trigger: int | None,
        avro_schemas: dict[str, str] | None = None,
    ) -> None:
        self.path = path
        self.max_files = max_files_per_trigger
        self.avro_schemas = avro_schemas

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        files = _list_files(self.path)
        lo = start["index"]
        hi = len(files)
        if self.max_files is not None:
            hi = min(hi, lo + self.max_files)  # backpressure (C8)
        rows = [r for p in files[lo:hi] for r in _rows(p, self.avro_schemas)]
        return iter(rows), {"index": hi}

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[Tuple]:
        files = _list_files(self.path)
        return iter(
            [r for p in files[start["index"]:end["index"]]
             for r in _rows(p, self.avro_schemas)]
        )

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; nothing source-side to ack


class CdcEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_events"

    def schema(self):
        return CHANGE_EVENT_SCHEMA

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("cdc_events requires .option('path', <dir>)")
        return path

    def _avro_schemas(self) -> dict[str, str] | None:
        """option("avro_schemas", '{"table": "<avro schema json>"}') —
        the Schema-Registry handoff for the Avro transport mode (S3)."""
        raw = self.options.get("avro_schemas")
        return json.loads(raw) if raw else None

    def reader(self, schema) -> CdcEventsBatchReader:
        return CdcEventsBatchReader(self._path(), self._avro_schemas())

    def simpleStreamReader(self, schema) -> CdcEventsStreamReader:
        mft = self.options.get("max_files_per_trigger")
        return CdcEventsStreamReader(
            self._path(), int(mft) if mft else None, self._avro_schemas()
        )
