"""The SMT transform chain (SURVEY.md §2.2, T1-T16) as pure
DataFrame→DataFrame functions over the ChangeEvent envelope.

Chain order matches the reference connector config
(``docker/connectors/cassandra-source.json:38-50`` →
``docker/connectors/postgres-sink.json:32-46``):
unwrap → validate → convert → cdc-metadata → ttl.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cass_cdc_pg_spark.schema import OPERATIONS, UUID_RE

#: validation skew allowance (validators.py:27-41): 1 minute
FUTURE_SKEW_US = 60 * 1_000_000


def validation_status(now_us: Column | None = None) -> Column:
    """T7: classify an event row → NULL if valid, else the DLQ
    error_type (``src/models/dlq_record.py:10-17``).

    Rules (``src/utils/validators.py:44-83``): required fields, UUID
    format, timestamp not in the future beyond 1-min skew, and the
    op-specific before/after invariants
    (``src/models/change_event.py:93-117``).
    """
    now_us = now_us if now_us is not None else F.unix_micros(F.current_timestamp())
    op = F.col("operation_type")
    return (
        F.when(F.col("event_id").isNull() | ~F.col("event_id").rlike(UUID_RE),
               F.lit("SCHEMA_MISMATCH"))
        .when(F.col("source_table").isNull() | (F.col("source_table") == ""),
              F.lit("SCHEMA_MISMATCH"))
        .when(~op.isin(*OPERATIONS), F.lit("SCHEMA_MISMATCH"))
        .when(F.col("timestamp_micros").isNull() | (F.col("timestamp_micros") <= 0),
              F.lit("SCHEMA_MISMATCH"))
        .when(F.col("timestamp_micros") > now_us + F.lit(FUTURE_SKEW_US),
              F.lit("CONSTRAINT_VIOLATION"))
        .when((op == "CREATE") & (F.col("after").isNull() | F.col("before").isNotNull()),
              F.lit("SCHEMA_MISMATCH"))
        .when((op == "UPDATE") & (F.col("after").isNull() | F.col("before").isNull()),
              F.lit("SCHEMA_MISMATCH"))
        .when((op == "DELETE") & F.col("after").isNotNull(),
              F.lit("SCHEMA_MISMATCH"))
        .when((op == "DELETE") & F.col("before").isNull()
              & ~F.coalesce(F.col("is_tombstone"), F.lit(False)),
              F.lit("SCHEMA_MISMATCH"))
        .when((op == "TRUNCATE")
              & (F.col("before").isNotNull() | F.col("after").isNotNull()),
              F.lit("SCHEMA_MISMATCH"))
    )


def split_valid(events: DataFrame, now_us: Column | None = None) -> tuple[DataFrame, DataFrame]:
    """T7+S5: (valid events, DLQ rows with error metadata)."""
    tagged = events.withColumn("_error_type", validation_status(now_us))
    good = tagged.filter(F.col("_error_type").isNull()).drop("_error_type")
    bad = tagged.filter(F.col("_error_type").isNotNull())
    dlq = bad.select(
        F.expr("uuid()").alias("dlq_id"),
        F.col("source_table"),
        F.to_json(F.struct(*events.columns)).alias("original_event"),
        F.col("_error_type").alias("error_type"),
        F.concat(F.lit("validation failed: "), F.col("_error_type")).alias("error_message"),
        F.lit(0).alias("retry_count"),
        F.unix_micros(F.current_timestamp()).alias("first_failed_at_us"),
        F.lit(None).cast("long").alias("last_retry_at_us"),
        F.lit("PENDING").alias("resolution_status"),
    )
    return good, dlq


def unwrap(events: DataFrame, payload_type: T.StructType) -> DataFrame:
    """T1 ExtractNewRecordState: row = after (or before for DELETE),
    typed via the pinned per-table schema (T8), plus envelope fields.

    ``before``/``after`` arrive as map<string,string>; each payload
    column is extracted and ``try_cast`` to its pinned type (T8,
    ``type_mapper.py:88-134``) — ANSI-safe: a value that cannot
    convert becomes NULL instead of failing the batch, and the caller
    routes rows whose raw value was non-null but typed value is null
    to the DLQ as TYPE_CONVERSION_ERROR.
    """
    body = F.when(F.col("operation_type") == "DELETE", F.col("before")).otherwise(
        F.col("after")
    )
    typed = [
        body.getItem(f.name).try_cast(f.dataType).alias(f.name)
        for f in payload_type.fields
    ]
    return events.select(
        *typed,
        "event_id",
        "source_table",
        "operation_type",
        "timestamp_micros",
        "ttl_seconds",
        "is_tombstone",
    )


def add_cdc_metadata(rows: DataFrame) -> DataFrame:
    """T4/T5/T6/T9: sink-side metadata columns
    (``postgres-sink.json:32-46``, ``type_mapper.py:136-168``)."""
    return (
        rows.withColumn("_cdc_deleted", F.col("operation_type") == "DELETE")
        .withColumn("_cdc_timestamp_micros", F.col("timestamp_micros"))
        .withColumn("_last_event_id", F.col("event_id"))
        .withColumn(
            "_ttl_expiry_timestamp_us",
            F.when(
                F.col("ttl_seconds").isNotNull() & (F.col("ttl_seconds") > 0),
                F.col("timestamp_micros")
                + F.col("ttl_seconds").cast("long") * F.lit(1_000_000),
            ),
        )
        .drop("operation_type", "timestamp_micros", "event_id", "ttl_seconds",
              "is_tombstone", "source_table")
    )


def apply_column_rules(
    rows: DataFrame,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    masks: dict[str, str] | None = None,
    renames: dict[str, str] | None = None,
    computed: dict[str, str] | None = None,
) -> DataFrame:
    """T13-T15: declarative transformation rules
    (``specs/001-cass-cdc-pg/data-model.md:396-421``):
    include/exclude projection, MASK (regexp_replace to '***'),
    RENAME, COMPUTE (SQL expression)."""
    out = rows
    if include:
        out = out.select(*include)
    if exclude:
        out = out.drop(*exclude)
    for col, pattern in (masks or {}).items():
        out = out.withColumn(col, F.regexp_replace(F.col(col), pattern, "***"))
    for old, new in (renames or {}).items():
        out = out.withColumnRenamed(old, new)
    for col, expr in (computed or {}).items():
        out = out.withColumn(col, F.expr(expr))
    return out
