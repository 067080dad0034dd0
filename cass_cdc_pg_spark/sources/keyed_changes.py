"""Streaming (and batch) DataSource over a KeyedTable's change feed.

``spark.readStream.format("keyed_changes").option("path", <table>)``
is the Delta-streaming-source analog for the engine's LSM tables: the
**streaming offset IS the table version** (`plans/keyed_table.py`
version log), so Structured Streaming's checkpoint/replay contract
maps 1:1 onto the table's own commit history — `read(start)` returns
every merge commit in ``(start.version, current]``,
``readBetweenOffsets`` replays any committed range deterministically
from the immutable delta dirs, and a restart resumes at the
checkpointed version with no loss and no duplicates.

Semantics (same as ``KeyedTable.read_changes``): merge commits emit
their upserted rows stamped ``_change_version`` (soft deletes arrive
as ``_cdc_deleted = true`` tombstones); compaction commits emit
nothing; retention/GDPR/TTL **rewrites fail the stream** with a
resync-required error — the non-append-breaks-streaming contract of
CDF sources.  Size the table's ``keep_versions`` to cover the longest
restart gap you need to replay.

Scale + role: like ``cdc_events``, a Python data source pays one
Python hop per row, so this is the executable *contract surface* —
offsets, restart, replay — while a production deployment would read
the same delta dirs JVM-side.  Batch mode
(``spark.read.format("keyed_changes")``) parallelizes one input
partition per (commit, bucket dir).
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


def _current_version(path: str) -> int:
    try:
        with open(f"{path}/_manifest.json") as f:
            return int(json.load(f).get("version", 0))
    except FileNotFoundError:
        return 0


def _version_doc(path: str, version: int) -> dict:
    log = f"{path}/_log/manifest.v{version:012d}.json"
    if os.path.exists(log):
        with open(log) as f:
            return json.load(f)
    if version == _current_version(path):
        with open(f"{path}/_manifest.json") as f:
            return json.load(f)
    raise FileNotFoundError(
        f"version {version} not retained at {path} — raise keep_versions "
        "to cover the stream's restart horizon"
    )


def _oldest_retained(path: str) -> int:
    """Smallest version whose commit doc is still on disk (retention
    prunes `_log/` oldest-first; the live `_manifest.json` always
    covers the current version)."""
    log_dir = f"{path}/_log"
    versions = []
    if os.path.isdir(log_dir):
        for n in os.listdir(log_dir):
            if n.startswith("manifest.v") and n.endswith(".json"):
                versions.append(int(n[len("manifest.v"):-len(".json")]))
    cur = _current_version(path)
    return min(versions) if versions else cur


def _merge_dirs(path: str, lo: int, hi: int) -> list[tuple[int, str]]:
    """(version, data dir) for every merge commit in (lo, hi]."""
    out: list[tuple[int, str]] = []
    for v in range(lo + 1, hi + 1):
        doc = _version_doc(path, v)
        op = doc.get("op", "unknown")
        if op == "compact":
            continue
        if op != "merge":
            raise ValueError(
                f"version {v} is a {op!r} commit — state changed without "
                "per-row deltas; restart the feed from a fresh snapshot"
            )
        out.extend((v, f"{path}/{d}") for d in doc.get("added", ()))
    return out


def _payload_files(data_dir: str) -> list[str]:
    files = []
    for b in sorted(os.listdir(data_dir)):
        sub = f"{data_dir}/{b}"
        if b.startswith("bucket=") and os.path.isdir(sub):
            files.extend(
                f"{sub}/{n}" for n in sorted(os.listdir(sub))
                if n.endswith(".parquet")
            )
    return files


def _rows(files: list[str], fields: list[str], version: int) -> Iterator[Tuple]:
    import pyarrow.parquet as pq

    for f in files:
        for rec in pq.read_table(f).to_pylist():
            yield tuple(
                version if name == "_change_version" else rec.get(name)
                for name in fields
            )


class KeyedChangesBatchReader(DataSourceReader):
    """Full-feed batch read from ``since_version`` (default: the
    oldest retained version boundary): one input partition per
    merge-commit data dir."""

    def __init__(self, path: str, since: int, fields: list[str]) -> None:
        self.parts = _merge_dirs(path, since, _current_version(path))
        self.fields = fields

    def partitions(self):
        return [InputPartition(i) for i in range(len(self.parts))]

    def read(self, partition: InputPartition) -> Iterator[Tuple]:
        v, d = self.parts[partition.value]
        return _rows(_payload_files(d), self.fields, v)


class KeyedChangesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, path: str, starting: int | None, fields: list[str]) -> None:
        self.path = path
        self.starting = starting
        self.fields = fields

    def initialOffset(self) -> dict:
        # default: changes from NOW on (Delta's `latest` semantics);
        # starting_version replays retained history from that commit
        v = self.starting if self.starting is not None else _current_version(self.path)
        return {"version": v}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        lo, hi = start["version"], _current_version(self.path)
        rows = [
            r
            for v, d in _merge_dirs(self.path, lo, hi)
            for r in _rows(_payload_files(d), self.fields, v)
        ]
        return iter(rows), {"version": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        return iter(
            [
                r
                for v, d in _merge_dirs(self.path, start["version"], end["version"])
                for r in _rows(_payload_files(d), self.fields, v)
            ]
        )

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint


class KeyedChangesDataSource(DataSource):
    """Register per session:
    ``spark.dataSource.register(KeyedChangesDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "keyed_changes"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("keyed_changes requires .option('path', <table dir>)")
        return path.rstrip("/")

    def schema(self):
        """Inferred from the newest merge commit's parquet footer (the
        table's current write schema) + the ``_change_version`` stamp."""
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import IntegerType, StructField, StructType

        path = self._path()
        cur = _current_version(path)
        for v in range(cur, 0, -1):
            try:
                doc = _version_doc(path, v)
            except FileNotFoundError:
                break
            if doc.get("op") == "merge" and doc.get("added"):
                files = _payload_files(f"{path}/{doc['added'][0]}")
                if files:
                    base = from_arrow_schema(pq.read_schema(files[0]))
                    return StructType(
                        [*base.fields,
                         StructField("_change_version", IntegerType(), False)]
                    )
        raise ValueError(
            f"no retained merge commit to infer a schema from at {path}"
        )

    def _fields(self) -> list[str]:
        return [f.name for f in self.schema().fields]

    def reader(self, schema) -> KeyedChangesBatchReader:
        # Default = everything still RETAINED, not version 0: on any
        # table whose earliest versions aged past keep_versions a
        # bare spark.read would otherwise always fail FileNotFoundError.
        # An explicit since_version keeps strict semantics (and the
        # not-retained error) — callers asking for a specific range
        # must not silently get a shorter one.
        sv = self.options.get("since_version")
        path = self._path()
        since = int(sv) if sv is not None else max(0, _oldest_retained(path) - 1)
        return KeyedChangesBatchReader(path, since, self._fields())

    def simpleStreamReader(self, schema) -> KeyedChangesStreamReader:
        sv = self.options.get("starting_version")
        return KeyedChangesStreamReader(
            self._path(), int(sv) if sv is not None else None, self._fields()
        )
