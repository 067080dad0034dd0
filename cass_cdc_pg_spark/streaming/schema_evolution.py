"""Schema evolution: detect → compatibility-gate → evolve or reject.

Mirrors the reference's schema service semantics
(``src/services/schema_service.py:155-207`` detect,
``:260-360`` compatibility rules; behavior pinned by
``tests/integration/test_schema_add_column.py:52``,
``test_schema_type_change.py:51-228``,
``test_schema_incompatible.py:68``; FR-017
``specs/001-cass-cdc-pg/spec.md:172``):

- **detect**: diff two column sets → ADD_COLUMN / DROP_COLUMN /
  MODIFY_COLUMN change records;
- **compatibility** (per table mode, default BACKWARD):
  - BACKWARD: adds must be nullable-or-defaulted; drops OK; type
    changes never compatible;
  - FORWARD: adds OK; type changes never compatible;
  - FULL: both; NONE: everything passes;
- **evolve**: a compatible new schema becomes the next ACTIVE version
  (ADD_COLUMN rides the keyed table's ``mergeSchema`` read — old
  buckets backfill NULL, nothing is rewritten); an incompatible one is
  recorded REJECTED and events carrying its ``schema_version`` are
  DLQ'd as SCHEMA_MISMATCH by the ingest loop.

The registry itself is metadata (a handful of versions per table — the
reference keeps it in a Postgres table ``_cdc_schema_metadata``,
``docker/postgres/init-db.sql:4-22``); it lives in one fsync'd JSON
manifest, same durability model as the KeyedTable manifest.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import types as T

ADD_COLUMN = "ADD_COLUMN"
DROP_COLUMN = "DROP_COLUMN"
MODIFY_COLUMN = "MODIFY_COLUMN"

BACKWARD = "BACKWARD"
FORWARD = "FORWARD"
FULL = "FULL"
NONE = "NONE"


class SchemaCompatibilityError(ValueError):
    """Raised when an evolution violates the table's compatibility mode."""


def canonical_type(dt: T.DataType) -> str:
    """Engine-portable type name (Spark ``simpleString``)."""
    return dt.simpleString()


def struct_columns(st: T.StructType) -> dict[str, str]:
    return {f.name: canonical_type(f.dataType) for f in st.fields}


def detect_changes(
    old: dict[str, str], new: dict[str, str]
) -> list[dict[str, str | None]]:
    """Diff two {column → canonical type} maps.

    Returns change records ``{"type", "column", "old_type", "new_type"}``
    — the same shape the reference logs
    (``schema_service.py:155-207``).  Deterministic order: adds, then
    drops/modifies, each sorted by column name.
    """
    changes: list[dict[str, str | None]] = []
    for col in sorted(new):
        if col not in old:
            changes.append(
                {"type": ADD_COLUMN, "column": col, "old_type": None, "new_type": new[col]}
            )
    for col in sorted(old):
        if col not in new:
            changes.append(
                {"type": DROP_COLUMN, "column": col, "old_type": old[col], "new_type": None}
            )
        elif old[col] != new[col]:
            changes.append(
                {
                    "type": MODIFY_COLUMN,
                    "column": col,
                    "old_type": old[col],
                    "new_type": new[col],
                }
            )
    return changes


def check_compatibility(
    changes: list[dict[str, str | None]],
    mode: str = BACKWARD,
    new_nullable: dict[str, bool] | None = None,
) -> tuple[bool, str | None]:
    """(compatible?, reason-if-not) under *mode*.

    *new_nullable*: nullability of added columns (BACKWARD requires
    adds be nullable or defaulted; absent → assumed nullable, which is
    how map-sourced CDC payloads arrive).
    """
    if mode == NONE:
        return True, None
    for ch in changes:
        if ch["type"] == MODIFY_COLUMN:
            return False, (
                f"MODIFY_COLUMN {ch['column']}: {ch['old_type']} -> "
                f"{ch['new_type']} is never compatible"
            )
        if (
            ch["type"] == ADD_COLUMN
            and mode in (BACKWARD, FULL)
            and new_nullable is not None
            and not new_nullable.get(ch["column"], True)
        ):
            return False, (
                f"ADD_COLUMN {ch['column']}: non-nullable without default "
                f"is backward-incompatible"
            )
    return True, None


class SchemaRegistry:
    """Versioned per-table schema metadata (S8 + SchemaMetadata).

    One JSON manifest holding, per table: the version list (columns,
    change records, ACTIVE/REJECTED status, registration time) and the
    compatibility mode."""

    def __init__(self, path: str) -> None:
        self.path = path.rstrip("/")
        os.makedirs(self.path, exist_ok=True)

    @property
    def _manifest(self) -> str:
        return f"{self.path}/_schema_registry.json"

    def _load(self) -> dict:
        try:
            with open(self._manifest) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"tables": {}}

    def _save(self, data: dict) -> None:
        tmp = f"{self._manifest}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(data, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest)

    # -- API ----------------------------------------------------------------

    def register(
        self, table: str, schema: T.StructType, compatibility: str = BACKWARD
    ) -> int:
        """Idempotently register schema v1 for *table* (INITIAL)."""
        data = self._load()
        if table in data["tables"]:
            return self.current_version(table)
        data["tables"][table] = {
            "compatibility": compatibility,
            "versions": [
                {
                    "version": 1,
                    "columns": struct_columns(schema),
                    "nullable": {f.name: f.nullable for f in schema.fields},
                    "changes": [{"type": "INITIAL", "column": None,
                                 "old_type": None, "new_type": None}],
                    "status": "ACTIVE",
                    "registered_at": time.time(),
                }
            ],
        }
        self._save(data)
        return 1

    def _active(self, entry: dict) -> dict:
        return [v for v in entry["versions"] if v["status"] == "ACTIVE"][-1]

    def tables(self) -> list[str]:
        """Registered table names (the registry's 'subjects')."""
        return sorted(self._load()["tables"])

    def current_version(self, table: str) -> int:
        return self._active(self._load()["tables"][table])["version"]

    def current_columns(self, table: str) -> dict[str, str]:
        return dict(self._active(self._load()["tables"][table])["columns"])

    def rejected_versions(self, table: str) -> set[int]:
        entry = self._load()["tables"].get(table)
        if not entry:
            return set()
        return {v["version"] for v in entry["versions"] if v["status"] == "REJECTED"}

    def evolve(self, table: str, new_schema: T.StructType) -> tuple[bool, int, list]:
        """Propose *new_schema* as the next version.

        Returns (accepted, version, changes).  Compatible → recorded
        ACTIVE; incompatible → recorded REJECTED (events carrying the
        rejected version must be DLQ'd as SCHEMA_MISMATCH, FR-017)."""
        data = self._load()
        entry = data["tables"][table]
        active = self._active(entry)
        new_cols = struct_columns(new_schema)
        changes = detect_changes(active["columns"], new_cols)
        if not changes:
            return True, active["version"], []
        ok, reason = check_compatibility(
            changes,
            entry["compatibility"],
            {f.name: f.nullable for f in new_schema.fields},
        )
        version = entry["versions"][-1]["version"] + 1
        entry["versions"].append(
            {
                "version": version,
                "columns": new_cols,
                "nullable": {f.name: f.nullable for f in new_schema.fields},
                "changes": changes,
                "status": "ACTIVE" if ok else "REJECTED",
                "reason": reason,
                "registered_at": time.time(),
            }
        )
        self._save(data)
        return ok, version, changes

    def history(self, table: str) -> list[dict]:
        """Full version history (the S8 metadata-table query)."""
        return list(self._load()["tables"][table]["versions"])
