"""keyed_changes DataSource: the streaming offset IS the KeyedTable
version — batch full-feed read, streaming resumption across restarts,
rewrite commits failing the stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

DDL = ("id string, val string, _cdc_deleted boolean, "
       "_cdc_timestamp_micros long, _last_event_id string, "
       "_ttl_expiry_timestamp_us long")


def _batch(spark, rows):
    return spark.createDataFrame(rows, DDL)


@pytest.fixture()
def registered(spark):
    from cass_cdc_pg_spark.sources.keyed_changes import KeyedChangesDataSource

    spark.dataSource.register(KeyedChangesDataSource)
    return spark


def _table(spark, tmp_path, **kw):
    kw.setdefault("num_buckets", 2)
    kw.setdefault("keep_versions", 20)
    return KeyedTable(spark, str(tmp_path / "t"), ["id"], **kw)


def test_batch_read_full_feed_with_versions(registered, tmp_path):
    spark = registered
    t = _table(spark, tmp_path)
    t.merge(_batch(spark, [("a", "v1", False, 100, "e1", None)]))
    v1 = t._current_version()
    t.merge(_batch(spark, [("a", "v2", False, 200, "e2", None),
                           ("b", "w1", False, 150, "e3", None)]))

    df = spark.read.format("keyed_changes").option("path", t.path).load()
    assert "_change_version" in df.columns
    rows = {(r["id"], r["_change_version"]): r["val"] for r in df.collect()}
    assert rows == {("a", v1): "v1", ("a", v1 + 1): "v2", ("b", v1 + 1): "w1"}
    # one partition per commit data dir -> parallel scan
    assert df.rdd.getNumPartitions() == 2
    # since_version scopes the feed
    tail = (spark.read.format("keyed_changes")
            .option("path", t.path).option("since_version", str(v1)).load())
    assert {r["id"] for r in tail.collect()} == {"a", "b"}
    assert tail.filter(F.col("val") == "v1").count() == 0


def test_stream_resumes_at_checkpointed_version(registered, tmp_path):
    """starting_version=0 replays history; a restarted stream with new
    merges emits ONLY the new commits (offset = version, no loss, no
    duplicates)."""
    spark = registered
    t = _table(spark, tmp_path)
    t.merge(_batch(spark, [("a", "v1", False, 100, "e1", None)]))
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")

    def run():
        q = (
            spark.readStream.format("keyed_changes")
            .option("path", t.path).option("starting_version", "0").load()
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out))
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = {(r["id"], r["val"]) for r in spark.read.parquet(out).collect()}
    assert got == {("a", "v1")}

    t.merge(_batch(spark, [("b", "w1", False, 200, "e2", None)]))
    t.merge(_batch(spark, [("a", "v2", False, 300, "e3", None)]))
    run()
    rows = spark.read.parquet(out).collect()
    got = sorted((r["id"], r["val"], r["_change_version"]) for r in rows)
    assert [g[:2] for g in got] == [("a", "v1"), ("a", "v2"), ("b", "w1")]
    assert len(rows) == 3  # replayed nothing


def test_compaction_emits_nothing_rewrite_fails_stream(registered, tmp_path):
    spark = registered
    t = _table(spark, tmp_path, compact_threshold=100)
    t.merge(_batch(spark, [("a", "v1", False, 100, "e1", None)]))
    t.merge(_batch(spark, [("a", "v2", False, 200, "e2", None)]))
    t.compact()
    df = spark.read.format("keyed_changes").option("path", t.path).load()
    assert sorted(r["val"] for r in df.collect()) == ["v1", "v2"]

    t.delete_where(F.col("id") == "a")  # rewrite commit
    with pytest.raises(Exception, match="rewrite"):
        spark.read.format("keyed_changes").option("path", t.path).load().collect()


def test_default_start_is_current_version(registered, tmp_path):
    """Without starting_version the stream begins at NOW — history
    before the stream started is not replayed."""
    spark = registered
    t = _table(spark, tmp_path)
    t.merge(_batch(spark, [("a", "v1", False, 100, "e1", None)]))
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")
    q = (
        spark.readStream.format("keyed_changes")
        .option("path", t.path).load()
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out))
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    import os

    assert not os.path.exists(out) or not [
        f for f in os.listdir(out) if f.endswith(".parquet")
    ] or spark.read.parquet(out).count() == 0


def test_derived_table_pipeline_converges(registered, tmp_path):
    """Chained CDC: stream table A's change feed into derived table B
    (foreachBatch → LWW merge). After two runs with new commits in
    between, B's live state equals A's — the exactly-once derived-table
    pipeline, composed entirely from engine pieces (feed source +
    idempotent merge)."""
    spark = registered
    a = KeyedTable(spark, str(tmp_path / "a"), ["id"], num_buckets=2,
                   keep_versions=20)
    b = KeyedTable(spark, str(tmp_path / "b"), ["id"], num_buckets=4,
                   keep_versions=20)
    a.merge(_batch(spark, [("x", "v1", False, 100, "e1", None),
                           ("y", "w1", False, 100, "e2", None)]))
    cp = str(tmp_path / "cp")

    def run():
        q = (
            spark.readStream.format("keyed_changes")
            .option("path", a.path).option("starting_version", "0").load()
            .writeStream.foreachBatch(
                lambda df, bid: b.merge(df.drop("_change_version")))
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert {(r["id"], r["val"]) for r in b.read_live().collect()} == \
        {("x", "v1"), ("y", "w1")}

    a.merge(_batch(spark, [("x", "v2", False, 200, "e3", None),
                           ("y", "w1", True, 200, "e4", None)]))  # delete y
    run()
    live = {(r["id"], r["val"]) for r in b.read_live().collect()}
    assert live == {("x", "v2")}  # update applied, tombstone deleted y
    assert b.read().count() == 2  # tombstone retained in full state


def test_batch_default_reads_retained_window_after_retention(registered, tmp_path):
    """A bare batch read on a table whose earliest versions aged past
    keep_versions must NOT fail — the default since_version is the
    oldest RETAINED boundary, so it returns exactly the retained
    commits. An explicit since_version keeps strict semantics and
    still errors when the requested range is gone."""
    spark = registered
    t = _table(spark, tmp_path, keep_versions=2)
    for i in range(6):
        t.merge(_batch(spark, [("a", f"v{i}", False, 100 + i, f"e{i}", None)]))
    cur = t._current_version()

    df = spark.read.format("keyed_changes").option("path", t.path).load()
    versions = sorted({r["_change_version"] for r in df.collect()})
    assert versions  # does not raise, returns the retained tail
    assert versions[-1] == cur
    assert all(v > cur - 4 for v in versions)

    with pytest.raises(Exception, match="not retained"):
        (spark.read.format("keyed_changes")
         .option("path", t.path).option("since_version", "0").load().collect())
