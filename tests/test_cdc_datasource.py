"""Custom Python DataSource (cdc_events): batch parallel read,
streaming offsets, restart resumption, backpressure."""

from __future__ import annotations

import json
import os

import pytest


def _write(path, name, events):
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/{name}.jsonl", "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")


def _ev(i, table="users"):
    import uuid

    return {
        "event_id": str(uuid.UUID(int=i)), "source_table": table,
        "operation_type": "CREATE", "timestamp_micros": 1000 + i,
        "before": None, "after": {"id": str(i)},
        "schema_version": 1, "ttl_seconds": None, "is_tombstone": False,
    }


@pytest.fixture()
def registered(spark):
    from cass_cdc_pg_spark.sources.cdc_datasource import CdcEventsDataSource

    spark.dataSource.register(CdcEventsDataSource)
    return spark


def test_batch_read_schema_and_rows(registered, tmp_path):
    spark = registered
    src = str(tmp_path / "in")
    _write(src, "a", [_ev(1), _ev(2)])
    _write(src, "b", [_ev(3)])
    df = spark.read.format("cdc_events").option("path", src).load()
    from cass_cdc_pg_spark.schema import CHANGE_EVENT_SCHEMA

    assert [f.name for f in df.schema.fields] == \
        [f.name for f in CHANGE_EVENT_SCHEMA.fields]
    import uuid
    rows = {r["event_id"]: r for r in df.collect()}
    assert set(rows) == {str(uuid.UUID(int=i)) for i in (1, 2, 3)}
    assert rows[str(uuid.UUID(int=2))]["after"] == {"id": "2"}
    assert rows[str(uuid.UUID(int=3))]["timestamp_micros"] == 1003
    # one input partition per file -> parallel scan
    assert df.rdd.getNumPartitions() == 2


def test_stream_offsets_restart_no_duplicates(registered, tmp_path):
    """A restart with new files resumes from the checkpointed offset —
    no loss, no duplicates (the Kafka-offset analog)."""
    import uuid

    spark = registered
    src, cp = str(tmp_path / "in"), str(tmp_path / "cp")
    _write(src, "a", [_ev(1)])
    _write(src, "b", [_ev(2)])

    out = str(tmp_path / "out")

    def run():
        # memory sink cannot recover from a checkpoint; foreachBatch
        # (the same sink shape CdcIngest uses) can
        q = (
            spark.readStream.format("cdc_events")
            .option("path", src).load()
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out))
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got1 = [r["event_id"] for r in spark.read.parquet(out).collect()]
    assert sorted(got1) == [str(uuid.UUID(int=i)) for i in (1, 2)]
    # restart with one new file: only the delta arrives
    _write(src, "c", [_ev(3)])
    run()
    got2 = [r["event_id"] for r in spark.read.parquet(out).collect()]
    assert sorted(got2) == [str(uuid.UUID(int=i)) for i in (1, 2, 3)]


def test_stream_reader_backpressure_and_replay(tmp_path):
    """Reader-level contract: max_files_per_trigger bounds each batch
    (C8), offsets advance monotonically, and readBetweenOffsets
    replays any committed range byte-identically."""
    from cass_cdc_pg_spark.sources.cdc_datasource import CdcEventsStreamReader

    src = str(tmp_path / "in")
    for i in (1, 2, 3):
        _write(src, f"f{i}", [_ev(i)])
    r = CdcEventsStreamReader(src, max_files_per_trigger=1)
    off = r.initialOffset()
    batches = []
    for _ in range(3):
        rows, off = r.read(off)
        batches.append(list(rows))
    assert [len(b) for b in batches] == [1, 1, 1]
    assert off == {"index": 3}
    rows, off2 = r.read(off)
    assert list(rows) == [] and off2 == {"index": 3}  # caught up
    replay = list(r.readBetweenOffsets({"index": 0}, {"index": 2}))
    assert replay == batches[0] + batches[1]


def test_stream_feeds_ingest_pipeline(registered, tmp_path):
    """The custom source plugs straight into CdcIngest.start in place
    of jsonl_stream (same envelope schema end-to-end)."""
    from pyspark.sql import types as T

    from cass_cdc_pg_spark.streaming.ingest import CdcIngest

    spark = registered
    schema = T.StructType([
        T.StructField("id", T.StringType()),
    ])
    ingest = CdcIngest(
        spark, str(tmp_path / "wh"),
        {"users": schema}, {"users": ["id"]}, num_buckets=2)
    src = str(tmp_path / "in")
    _write(src, "a", [_ev(1), _ev(2)])
    stream = (
        spark.readStream.format("cdc_events").option("path", src).load()
    )
    q = ingest.start(stream, checkpoint=str(tmp_path / "cp"),
                     trigger_once=True)
    q.awaitTermination(120)
    assert ingest.table("users").read_live().count() == 2


def test_avro_payload_mode_round_trip(registered, tmp_path):
    """S3 transport through the custom source: base64 Avro payloads
    decode to the same map<string,string> envelope the JSON mode
    carries, under the per-table registered schema."""
    import base64
    import uuid as _uuid

    from pyspark.sql import types as T

    from cass_cdc_pg_spark.sources.avro import avro_schema_for, encode_avro_record

    spark = registered
    payload = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("ok", T.BooleanType()),
    ])
    schema_json = avro_schema_for(payload, "users")
    vals = {"id": "u1", "n": 42, "ok": True}
    enc = base64.b64encode(
        encode_avro_record(schema_json, vals)).decode()

    src = str(tmp_path / "in")
    e = _ev(1)
    e["after"] = enc  # Avro transport: payload is a b64 string
    _write(src, "a", [e])
    df = (
        spark.read.format("cdc_events").option("path", src)
        .option("avro_schemas", json.dumps({"users": schema_json}))
        .load()
    )
    row = df.collect()[0]
    assert row["after"] == {"id": "u1", "n": "42", "ok": "True"}
    assert row["before"] is None

    # unregistered table fails loudly, not silently
    e2 = _ev(2, table="ghost")
    e2["after"] = enc
    _write(src, "b", [e2])
    with pytest.raises(Exception):
        df2 = (
            spark.read.format("cdc_events").option("path", src)
            .option("avro_schemas", json.dumps({"users": schema_json}))
            .load()
        )
        df2.collect()
