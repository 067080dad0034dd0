"""KeyedTable merge semantics: upsert, LWW guard, soft delete, TTL."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

# multi-minute Spark-heavy suite: excluded from the tight red-green
# loop (`pytest -m "not slow"`); the round gate runs it always
pytestmark = pytest.mark.slow

from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

SCHEMA = (
    "id string, val string, _cdc_deleted boolean, _cdc_timestamp_micros long, "
    "_last_event_id string, _ttl_expiry_timestamp_us long"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def table(spark, tmp_path):
    return KeyedTable(spark, str(tmp_path / "t"), ["id"], num_buckets=4)


def _state(t: KeyedTable):
    return {
        r["id"]: (r["val"], r["_cdc_deleted"], r["_cdc_timestamp_micros"])
        for r in t.read().collect()
    }


def test_insert_then_update(table, spark):
    table.merge(_batch(spark, [("a", "v1", False, 100, "e1", None)]))
    table.merge(_batch(spark, [("a", "v2", False, 200, "e2", None)]))
    assert _state(table) == {"a": ("v2", False, 200)}


def test_stale_update_rejected(table, spark):
    table.merge(_batch(spark, [("a", "v2", False, 200, "e2", None)]))
    table.merge(_batch(spark, [("a", "v1", False, 100, "e1", None)]))
    assert _state(table) == {"a": ("v2", False, 200)}


def test_merge_is_idempotent_on_replay(table, spark):
    b = _batch(spark, [("a", "v1", False, 100, "e1", None), ("b", "w", False, 50, "e0", None)])
    table.merge(b)
    before = _state(table)
    table.merge(b)  # replay same microbatch (crash-recovery, C5)
    assert _state(table) == before
    assert table.read().count() == 2


def test_soft_delete_keeps_tombstone(table, spark):
    table.merge(_batch(spark, [("a", "v1", False, 100, "e1", None)]))
    table.merge(_batch(spark, [("a", "v1", True, 200, "e2", None)]))
    assert _state(table) == {"a": ("v1", True, 200)}
    assert table.read_live().count() == 0
    assert table.read().count() == 1


def test_multi_bucket_partial_rewrite(table, spark):
    rows = [(f"k{i}", "v", False, 100, f"e{i}", None) for i in range(20)]
    table.merge(_batch(spark, rows))
    # second merge touches a single key → only its bucket rewritten
    table.merge(_batch(spark, [("k3", "v2", False, 200, "x", None)]))
    st = _state(table)
    assert len(st) == 20
    assert st["k3"] == ("v2", False, 200)
    assert st["k7"] == ("v", False, 100)


def test_ttl_expiry_sweep(table, spark):
    table.merge(
        _batch(
            spark,
            [
                ("a", "v", False, 100, "e1", 1_000),      # expired long ago
                ("b", "v", False, 100, "e2", None),        # no TTL
                ("c", "v", False, 100, "e3", 2**62),       # far future
            ],
        )
    )
    removed = table.expire_ttl(now_us=1_000_000)
    assert removed == 1
    assert set(_state(table)) == {"b", "c"}


def test_hard_delete_where(table, spark):
    table.merge(
        _batch(spark, [(f"k{i}", "v", False, 100, f"e{i}", None) for i in range(10)])
    )
    n = table.delete_where(F.col("id").isin("k1", "k2"))
    assert n == 2
    assert set(_state(table)) == {f"k{i}" for i in range(10)} - {"k1", "k2"}


def test_schema_evolution_add_column(table, spark):
    table.merge(_batch(spark, [("a", "v1", False, 100, "e1", None)]))
    evolved = spark.createDataFrame(
        [("b", "v2", "extra", False, 200, "e2", None)],
        "id string, val string, new_col string, _cdc_deleted boolean, "
        "_cdc_timestamp_micros long, _last_event_id string, _ttl_expiry_timestamp_us long",
    )
    table.merge(evolved)
    rows = {r["id"]: r.asDict() for r in table.read().collect()}
    assert rows["a"]["new_col"] is None  # backfilled NULL (ADD_COLUMN)
    assert rows["b"]["new_col"] == "extra"


def _base_file_state(path):
    """(file → (size, mtime_ns)) for every base snapshot parquet file."""
    import os

    out = {}
    for root, _dirs, files in os.walk(path):
        if "/snap-" not in root and not os.path.basename(root).startswith("snap-"):
            continue
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out[p] = (st.st_size, st.st_mtime_ns)
    return out


def test_merge_is_o_batch_base_files_untouched(spark, tmp_path):
    """A merge appends a delta; existing base files are not rewritten
    (the 100 TB ingest property: cost O(batch), not O(table))."""
    import os

    from pyspark.sql import functions as F

    from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

    t = KeyedTable(spark, str(tmp_path / "kt"), ["id"], num_buckets=256)
    big = spark.range(2000).select(
        F.col("id").cast("string").alias("id"),
        F.lit(False).alias("_cdc_deleted"),
        F.lit(1000).cast("long").alias("_cdc_timestamp_micros"),
        F.lit("e1").alias("_last_event_id"),
        F.lit(None).cast("long").alias("_ttl_expiry_timestamp_us"),
    )
    t.merge(big)
    t.compact()  # establish a base across ~all 256 buckets
    before = _base_file_state(t.path)
    assert before, "expected base files after compaction"

    tiny = spark.createDataFrame(
        [("5", False, 2000, "e2", None), ("6", False, 2000, "e2", None)],
        "id string, _cdc_deleted boolean, _cdc_timestamp_micros long, "
        "_last_event_id string, _ttl_expiry_timestamp_us long",
    )
    t.merge(tiny)
    after = _base_file_state(t.path)
    assert before == after  # byte-for-byte: no base file touched
    deltas = [d for d in os.listdir(t.path) if d.startswith("delta-")]
    assert len(deltas) == 1  # exactly one delta dir for the tiny batch
    # and the merged view reflects the update
    got = {r["id"]: r["_cdc_timestamp_micros"] for r in t.read().collect()}
    assert got["5"] == 2000 and got["7"] == 1000
    assert len(got) == 2000


def test_compaction_folds_deltas_and_preserves_state(spark, tmp_path):
    from pyspark.sql import functions as F

    from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

    t = KeyedTable(spark, str(tmp_path / "kt"), ["id"], num_buckets=4,
                   compact_threshold=100)  # no auto-compaction
    for ts in (1000, 2000, 3000):
        batch = spark.createDataFrame(
            [("a", False, ts, f"e{ts}", None)],
            "id string, _cdc_deleted boolean, _cdc_timestamp_micros long, "
            "_last_event_id string, _ttl_expiry_timestamp_us long",
        )
        t.merge(batch)
    before = sorted(r.asDict() for r in t.read().collect())
    n = t.compact()
    assert n >= 1
    after = sorted(r.asDict() for r in t.read().collect())
    assert before == after
    assert after[0]["_cdc_timestamp_micros"] == 3000
    # post-compaction manifest carries no deltas
    assert all(not e["deltas"] for e in t._read_manifest().values())


def test_auto_compaction_triggers_at_threshold(spark, tmp_path):
    import os

    from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

    t = KeyedTable(spark, str(tmp_path / "kt"), ["id"], num_buckets=2,
                   compact_threshold=3)
    for ts in (1, 2, 3, 4):
        batch = spark.createDataFrame(
            [("k", False, ts * 1000, f"e{ts}", None)],
            "id string, _cdc_deleted boolean, _cdc_timestamp_micros long, "
            "_last_event_id string, _ttl_expiry_timestamp_us long",
        )
        t.merge(batch)
    # threshold 3 → at most 2 uncompacted deltas survive at any time
    deltas = [d for d in os.listdir(t.path) if d.startswith("delta-")]
    assert len(deltas) < 3
    assert t.read().collect()[0]["_cdc_timestamp_micros"] == 4000


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=6, deadline=None)
@given(
    split=st.lists(st.integers(min_value=0, max_value=7), min_size=8, max_size=8),
)
def test_lsm_merge_batch_partitioning_invariance(spark, tmp_path_factory, split):
    """C5/C6 as a property: however an event multiset is partitioned
    into merge batches (including duplicates across batches), the
    table converges to the same per-key LWW state as one big merge."""
    from pyspark.sql import functions as F

    from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

    ddl = ("id string, v long, _cdc_deleted boolean, _cdc_timestamp_micros long, "
           "_last_event_id string, _ttl_expiry_timestamp_us long")
    events = [
        (f"k{i % 3}", i, False, 1000 + (i % 4) * 100, f"e{i}", None)
        for i in range(8)
    ]
    # partition events into up to 8 batches by the drawn assignment
    batches: dict[int, list] = {}
    for ev, b in zip(events, split):
        batches.setdefault(b, []).append(ev)

    base = tmp_path_factory.mktemp("lsm_prop")
    t_ref = KeyedTable(spark, str(base / "ref"), ["id"], num_buckets=2)
    t_ref.merge(spark.createDataFrame(events, ddl))
    expected = sorted(tuple(r) for r in t_ref.read().collect())

    t = KeyedTable(spark, str(base / "split"), ["id"], num_buckets=2,
                   compact_threshold=3)  # exercise auto-compaction too
    for b in sorted(batches):
        t.merge(spark.createDataFrame(batches[b], ddl))
    got = sorted(tuple(r) for r in t.read().collect())
    assert got == expected


def test_bucket_count_persisted_in_manifest(spark, tmp_path):
    """num_buckets is a table property: reopening with a different
    constructor value must use the persisted count (wrong pruning in
    delete_where/point reads otherwise)."""
    from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

    rows = [(str(i), False, 1000, "e", None) for i in range(20)]
    ddl = ("id string, _cdc_deleted boolean, _cdc_timestamp_micros long, "
           "_last_event_id string, _ttl_expiry_timestamp_us long")
    t = KeyedTable(spark, str(tmp_path / "t"), ["id"], num_buckets=2)
    t.merge(spark.createDataFrame(rows, ddl))

    reopened = KeyedTable(spark, str(tmp_path / "t"), ["id"], num_buckets=32)
    assert reopened.num_buckets == 2
    from pyspark.sql import functions as F

    assert reopened.delete_where(F.col("id") == "7") == 1
    assert reopened.read().count() == 19


def test_time_travel_reads_prior_versions(spark, tmp_path):
    """Each merge/compaction commits a version; read(version=) binds
    to the retained manifest and sees exactly that snapshot's state."""
    t = KeyedTable(spark, str(tmp_path / "tt"), ["id"], num_buckets=2)
    t.merge(_batch(spark, [("a", "v1", False, 1000, "e1", None)]))
    v1 = t.history()[-1]["version"]
    t.merge(_batch(spark, [("a", "v2", False, 2000, "e2", None),
                           ("b", "w1", False, 2000, "e3", None)]))
    v2 = t.history()[-1]["version"]
    assert v2 > v1
    now = {r["id"]: r["val"] for r in t.read().collect()}
    assert now == {"a": "v2", "b": "w1"}
    old = {r["id"]: r["val"] for r in t.read(version=v1).collect()}
    assert old == {"a": "v1"}
    # history ascending with timestamps
    hist = t.history()
    assert [h["version"] for h in hist] == sorted(h["version"] for h in hist)
    assert all(h["updated_at"] is not None for h in hist)


def test_time_travel_survives_compaction_gc(spark, tmp_path):
    """Compaction rewrites bases and GC runs — but dirs referenced by
    retained historical versions must survive, so a pre-compaction
    version still reads correctly afterwards."""
    t = KeyedTable(spark, str(tmp_path / "tt"), ["id"], num_buckets=2,
                   compact_threshold=100,  # manual compaction only
                   keep_versions=3)  # v1 must survive merge+merge+compact
    t.merge(_batch(spark, [("a", "v1", False, 1000, "e1", None)]))
    v1 = t.history()[-1]["version"]
    t.merge(_batch(spark, [("a", "v2", False, 2000, "e2", None)]))
    t.compact()
    assert {r["val"] for r in t.read().collect()} == {"v2"}
    assert {r["val"] for r in t.read(version=v1).collect()} == {"v1"}


def test_version_retention_prunes_log_and_dirs(spark, tmp_path):
    """Versions past keep_versions are pruned: their log entries go,
    reads of them fail with a clear error, and dirs referenced by no
    retained version are reclaimed."""
    import os

    t = KeyedTable(spark, str(tmp_path / "tt"), ["id"], num_buckets=1,
                   compact_threshold=2, keep_versions=2)
    t.merge(_batch(spark, [("a", "v1", False, 1000, "e1", None)]))
    v1 = t.history()[-1]["version"]
    for i in range(2, 7):
        t.merge(_batch(spark, [("a", f"v{i}", False, 1000 * i, f"e{i}", None)]))
    assert {r["val"] for r in t.read().collect()} == {"v6"}
    retained = [h["version"] for h in t.history()]
    assert v1 not in retained
    assert len(retained) <= 2
    with pytest.raises(FileNotFoundError):
        t.read(version=v1)
    # compaction + retention bounded the on-disk dir count
    dirs = [d for d in os.listdir(t.path)
            if d.startswith("snap-") or d.startswith("delta-")]
    assert len(dirs) <= 2 + 2 * t.keep_versions, dirs


# -- change feed (read_changes) ---------------------------------------------


def test_read_changes_emits_merge_rows_with_versions(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "cf"), ["id"], num_buckets=4,
                   keep_versions=10)
    t.merge(_batch(spark, [("a", "v1", False, 100, "e1", None)]))
    v1 = t._current_version()
    t.merge(_batch(spark, [("a", "v2", False, 200, "e2", None),
                           ("b", "w1", False, 150, "e3", None)]))
    ch = t.read_changes(0)
    rows = {(r["id"], r["_change_version"]): r["val"] for r in ch.collect()}
    assert rows == {("a", v1): "v1", ("a", v1 + 1): "v2", ("b", v1 + 1): "w1"}
    # incremental tail: only the second commit
    tail = {(r["id"], r["val"]) for r in t.read_changes(v1).collect()}
    assert tail == {("a", "v2"), ("b", "w1")}
    # empty range
    assert t.read_changes(t._current_version()) is None


def test_read_changes_carries_delete_tombstones(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "cf"), ["id"], num_buckets=4,
                   keep_versions=10)
    t.merge(_batch(spark, [("a", "v1", False, 100, "e1", None)]))
    v1 = t._current_version()
    t.merge(_batch(spark, [("a", "v1", True, 200, "e2", None)]))
    ch = t.read_changes(v1).collect()
    assert len(ch) == 1 and ch[0]["_cdc_deleted"] is True


def test_read_changes_skips_compaction_commits(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "cf"), ["id"], num_buckets=2,
                   compact_threshold=100, keep_versions=20)
    for i in range(3):
        t.merge(_batch(spark, [("a", f"v{i}", False, 100 + i, f"e{i}", None)]))
    t.compact()
    t.merge(_batch(spark, [("b", "w", False, 500, "e9", None)]))
    ch = t.read_changes(0)
    vals = sorted(r["val"] for r in ch.collect())
    assert vals == ["v0", "v1", "v2", "w"]  # compaction emitted nothing


def test_read_changes_raises_across_rewrites(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "cf"), ["id"], num_buckets=2,
                   keep_versions=20)
    t.merge(_batch(spark, [("a", "v1", False, 100, "e1", None),
                           ("b", "w1", False, 100, "e2", None)]))
    t.delete_where(F.col("id") == "b")  # op="rewrite": no per-row deltas
    t.merge(_batch(spark, [("c", "x1", False, 300, "e3", None)]))
    with pytest.raises(ValueError, match="rewrite"):
        t.read_changes(0)
    # a range past the rewrite still works
    after = t._current_version()
    assert {r["id"] for r in t.read_changes(after - 1).collect()} == {"c"}


def test_read_changes_outside_retention_raises(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "cf"), ["id"], num_buckets=2,
                   keep_versions=2)
    for i in range(5):
        t.merge(_batch(spark, [("a", f"v{i}", False, 100 + i, f"e{i}", None)]))
    with pytest.raises(FileNotFoundError, match="not retained"):
        t.read_changes(0)


def test_read_changes_across_schema_evolution(spark, tmp_path):
    """A feed range spanning an ADD_COLUMN evolution backfills NULL
    for commits from before the new column existed (the mergeSchema
    contract of the snapshot read, carried into the feed)."""
    t = KeyedTable(spark, str(tmp_path / "cf"), ["id"], num_buckets=2,
                   keep_versions=10)
    t.merge(_batch(spark, [("a", "v1", False, 100, "e1", None)]))
    wide = spark.createDataFrame(
        [("b", "w1", "extra", False, 200, "e2", None)],
        "id string, val string, new_col string, _cdc_deleted boolean, "
        "_cdc_timestamp_micros long, _last_event_id string, "
        "_ttl_expiry_timestamp_us long")
    t.merge(wide)
    ch = {r["id"]: r for r in t.read_changes(0).collect()}
    assert ch["a"]["new_col"] is None
    assert ch["b"]["new_col"] == "extra"


def test_legacy_manifest_without_keys_refuses_reduce_and_compact(spark, tmp_path):
    """A pre-LSM manifest with no persisted key_cols, opened with an
    empty constructor list, must REFUSE to LWW-reduce or compact —
    grouping by zero keys would collapse every bucket to one row
    (silent durable data loss from a maintenance verb)."""
    import json

    path = str(tmp_path / "legacy")
    t = KeyedTable(spark, path, ["id"], num_buckets=2)
    t.merge(_batch(spark, [("a", "v1", False, 100, "e1", None),
                           ("b", "v1", False, 100, "e2", None)]))

    # simulate the legacy manifest: drop the persisted key_cols
    with open(f"{path}/_manifest.json") as f:
        m = json.load(f)
    m.pop("key_cols", None)
    with open(f"{path}/_manifest.json", "w") as f:
        json.dump(m, f)

    legacy = KeyedTable(spark, path, [])
    assert legacy.key_cols == []
    with pytest.raises(ValueError, match="no key columns"):
        legacy.compact()
    with pytest.raises(ValueError, match="no key columns"):
        legacy.read().collect()
    # rows are untouched: reopening with explicit keys still sees both
    again = KeyedTable(spark, path, ["id"])
    assert again.read().count() == 2
