"""Skip-gated Kafka/Avro JVM-path integration tests (S2/S3).

The production transport (``streaming/ingest.kafka_stream`` +
``sources/avro.decode_avro_value``) needs two things this container
does not ship: the ``spark-sql-kafka``/``spark-avro`` jars and a
reachable broker.  These tests activate the moment the environment
provides them — mirroring the reference's skip-gated integration
suite (``reference/tests/integration/test_end_to_end_replication.py:12-20``,
which skips without its docker compose stack) — so the env-gated code
stops being dead the day it can run:

    spark-submit --packages \
        org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>,\
        org.apache.spark:spark-avro_2.13:<spark-version> ...
    export KAFKA_BOOTSTRAP=broker:9092
    pytest tests/test_kafka_integration.py

Everything here is self-contained given jar + broker: test data is
PRODUCED through Spark's own kafka sink (no Python kafka client
needed), then read back through the exact streaming path production
uses.
"""

from __future__ import annotations

import json
import os
import socket
import uuid

import pytest


def _kafka_jar_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def _broker_reachable(bootstrap: str) -> bool:
    host, _, port = bootstrap.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=3):
            return True
    except OSError:
        return False


@pytest.fixture()
def kafka_env(spark):
    bootstrap = os.environ.get("KAFKA_BOOTSTRAP")
    if not bootstrap:
        pytest.skip("KAFKA_BOOTSTRAP not set (no broker in this environment)")
    if not _kafka_jar_present(spark):
        pytest.skip("spark-sql-kafka jars not on the classpath "
                    "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13)")
    if not _broker_reachable(bootstrap):
        pytest.skip(f"broker {bootstrap} not reachable")
    return bootstrap


def test_kafka_stream_parses_change_events_end_to_end(kafka_env, spark, tmp_path):
    """Produce ChangeEvent JSON through Spark's kafka sink, read it
    back through kafka_stream (subscribePattern + from_json parse) —
    the full S2 JVM transport."""
    from cass_cdc_pg_spark.streaming.ingest import kafka_stream

    topic = f"cdc-events-users-{uuid.uuid4().hex[:8]}"
    payload = {
        "event_id": "33333333-3333-4333-8333-333333333301",
        "source_table": "users",
        "operation_type": "CREATE",
        "timestamp_micros": 1000,
        "after": {"id": "u1", "username": "a"},
        "schema_version": 1,
        "is_tombstone": False,
    }
    (
        spark.createDataFrame([(json.dumps(payload),)], "value string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", kafka_env)
        .option("topic", topic)
        .save()
    )
    q = (
        kafka_stream(spark, kafka_env, pattern=topic)
        .writeStream.format("memory")
        .queryName("kafka_e2e")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM kafka_e2e").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["event_id"] == payload["event_id"]
    assert r["source_table"] == "users"
    assert r["operation_type"] == "CREATE"
    assert r["after"]["username"] == "a"


def test_jvm_from_avro_agrees_with_python_codec(kafka_env, spark, tmp_path):
    """Round-trip the schema-registry contract over the wire: encode
    with the pure-Python writer, produce to Kafka, consume, and decode
    BOTH ways — the jar's from_avro and the jar-free Python codec must
    produce identical typed rows."""
    from pyspark.sql import types as T

    from cass_cdc_pg_spark.sources.avro import (
        avro_available,
        avro_schema_for,
        decode_avro_value,
        decode_avro_value_python,
        encode_avro_record,
    )

    if not avro_available():
        pytest.skip("spark-avro jars not on the classpath "
                    "(--packages org.apache.spark:spark-avro_2.13)")

    payload = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("age", T.IntegerType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    schema_json = avro_schema_for(payload, "users")
    topic = f"cdc-avro-users-{uuid.uuid4().hex[:8]}"
    blobs = [
        encode_avro_record(schema_json, {"id": "u1", "age": 30, "score": 1.5}),
        encode_avro_record(schema_json, {"id": "u2", "age": None, "score": 2.0}),
    ]
    (
        spark.createDataFrame([(b,) for b in blobs], "value binary")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", kafka_env)
        .option("topic", topic)
        .save()
    )
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", kafka_env)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    via_jar = {
        tuple(r) for r in decode_avro_value(raw, payload, "users").collect()
    }
    via_py = {
        tuple(r)
        for r in decode_avro_value_python(raw, payload, "users").collect()
    }
    assert via_jar == via_py == {("u1", 30, 1.5), ("u2", None, 2.0)}
