"""ChangeFeedFollower: incremental apply + automatic snapshot resync
across rewrite commits (the consumer half of the CDF 409 contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cass_cdc_pg_spark.plans.keyed_table import KeyedTable
from cass_cdc_pg_spark.streaming.follower import ChangeFeedFollower

DDL = ("id string, val string, _cdc_deleted boolean, "
       "_cdc_timestamp_micros long, _last_event_id string, "
       "_ttl_expiry_timestamp_us long")


def _batch(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _live(t):
    return {(r["id"], r["val"]) for r in t.read_live().collect()}


def test_follower_converges_across_gdpr_rewrite_no_manual_step(spark, tmp_path):
    """End-to-end: merges apply incrementally; a GDPR hard delete
    (rewrite commit) mid-stream triggers an AUTOMATIC snapshot resync
    on the next sync(); the erased key is gone from the target (a
    merge could never remove it) and later merges go back to the
    incremental path."""
    a = KeyedTable(spark, str(tmp_path / "a"), ["id"], num_buckets=2,
                   keep_versions=20)
    b = KeyedTable(spark, str(tmp_path / "b"), ["id"], num_buckets=4,
                   keep_versions=20)
    f = ChangeFeedFollower(spark, a, b)

    a.merge(_batch(spark, [("x", "v1", False, 100, "e1", None),
                           ("y", "w1", False, 100, "e2", None)]))
    st = f.sync()
    assert st["resynced"] is False
    assert _live(b) == {("x", "v1"), ("y", "w1")}

    # ordinary update: still incremental
    a.merge(_batch(spark, [("x", "v2", False, 200, "e3", None)]))
    st = f.sync()
    assert st["resynced"] is False
    assert _live(b) == {("x", "v2"), ("y", "w1")}

    # GDPR hard delete (rewrite commit, no tombstone) + a later merge
    assert a.delete_where(F.col("id") == "y") == 1
    a.merge(_batch(spark, [("z", "n1", False, 300, "e4", None)]))
    st = f.sync()
    assert st["resynced"] is True  # converged with NO manual step
    assert _live(b) == _live(a) == {("x", "v2"), ("z", "n1")}
    assert b.read().filter(F.col("id") == "y").count() == 0

    # stream resumes incrementally after the resync
    a.merge(_batch(spark, [("z", "n2", False, 400, "e5", None)]))
    st = f.sync()
    assert st["resynced"] is False
    assert _live(b) == {("x", "v2"), ("z", "n2")}

    # idle sync is a no-op
    st = f.sync()
    assert st["from"] == st["to"] and st["resynced"] is False


def test_follower_bootstraps_via_snapshot_when_history_pruned(spark, tmp_path):
    """A FRESH follower on a source whose early versions aged past
    keep_versions cannot replay from 0 — it must bootstrap from the
    snapshot automatically (snapshot.mode=initial semantics)."""
    a = KeyedTable(spark, str(tmp_path / "a"), ["id"], num_buckets=2,
                   keep_versions=2)
    for i in range(6):
        a.merge(_batch(spark, [("k", f"v{i}", False, 100 + i, f"e{i}", None)]))
    b = KeyedTable(spark, str(tmp_path / "b"), ["id"], num_buckets=2)
    f = ChangeFeedFollower(spark, a, b)
    st = f.sync()
    assert st["resynced"] is True
    assert _live(b) == {("k", "v5")}


def test_follower_crash_between_merge_and_cursor_is_idempotent(spark, tmp_path):
    """Replaying a range after a crash (cursor not advanced) converges
    to the same state — merge is LWW-idempotent."""
    a = KeyedTable(spark, str(tmp_path / "a"), ["id"], num_buckets=2,
                   keep_versions=20)
    b = KeyedTable(spark, str(tmp_path / "b"), ["id"], num_buckets=2,
                   keep_versions=20)
    f = ChangeFeedFollower(spark, a, b)
    a.merge(_batch(spark, [("x", "v1", False, 100, "e1", None)]))
    f.sync()
    # simulate the crash: rewind the cursor, sync again
    f._write_cursor(0)
    st = f.sync()
    assert st["resynced"] is False
    assert _live(b) == {("x", "v1")}
    assert b.read().count() == 1


def test_overwrite_requires_meta_cols(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "t"), ["id"], num_buckets=2)
    with pytest.raises(ValueError, match="missing columns"):
        t.overwrite(spark.createDataFrame([("a",)], "id string"))


def test_overwrite_commits_rewrite_so_downstream_feeds_resync(spark, tmp_path):
    """The cascading contract: an overwritten table's own change feed
    refuses the range, exactly like any other rewrite commit."""
    t = KeyedTable(spark, str(tmp_path / "t"), ["id"], num_buckets=2,
                   keep_versions=20)
    t.merge(_batch(spark, [("a", "v1", False, 100, "e1", None)]))
    mark = t._current_version()
    t.overwrite(_batch(spark, [("a", "v2", False, 200, "e2", None)]))
    assert _live(t) == {("a", "v2")}
    with pytest.raises(ValueError, match="rewrite"):
        t.read_changes(mark)


def test_follower_repointed_at_different_source_forces_resync(spark, tmp_path):
    """r7 ADVICE: a cursor written while following source A must not
    be trusted against source C — C's versions index a different
    commit log.  Worst case pre-fix: C's current version <= A's stale
    cursor made sync() a silent no-op and the target kept A's data
    forever.  The fix treats the mismatch as a forced snapshot
    OVERWRITE (not a merge — a merge could never remove A's rows)."""
    a = KeyedTable(spark, str(tmp_path / "a"), ["id"], num_buckets=2,
                   keep_versions=20)
    b = KeyedTable(spark, str(tmp_path / "b"), ["id"], num_buckets=2,
                   keep_versions=20)
    for i in range(3):
        a.merge(_batch(spark, [("ak", f"v{i}", False, 100 + i, f"e{i}", None)]))
    f = ChangeFeedFollower(spark, a, b)
    st = f.sync()
    assert st["resynced"] is False and _live(b) == {("ak", "v2")}

    c = KeyedTable(spark, str(tmp_path / "c"), ["id"], num_buckets=2,
                   keep_versions=20)
    c.merge(_batch(spark, [("ck", "c1", False, 500, "ce1", None)]))
    # same target dir, different source: C's version (1) <= stale cursor (3)
    f2 = ChangeFeedFollower(spark, c, b)
    st = f2.sync()
    assert st["resynced"] is True
    assert _live(b) == _live(c) == {("ck", "c1")}
    assert b.read().filter(F.col("id") == "ak").count() == 0

    # and the follow continues incrementally against the new source
    c.merge(_batch(spark, [("ck", "c2", False, 600, "ce2", None)]))
    st = f2.sync()
    assert st["resynced"] is False and _live(b) == {("ck", "c2")}


def test_follower_add_column_mid_feed_stays_incremental(spark, tmp_path):
    """r7 verdict item 6: an ADD_COLUMN evolution arriving BETWEEN
    incremental applies must flow through sync() with NULL backfill
    and WITHOUT a snapshot resync (compatible adds are merge-safe:
    read_changes reads old commits with allowMissingColumns and merge
    writes the widened schema with mergeSchema).  Reference scenario:
    tests/integration/test_schema_add_column.py:52."""
    wide_ddl = DDL + ", extra string"
    a = KeyedTable(spark, str(tmp_path / "a"), ["id"], num_buckets=2,
                   keep_versions=20)
    b = KeyedTable(spark, str(tmp_path / "b"), ["id"], num_buckets=2,
                   keep_versions=20)
    f = ChangeFeedFollower(spark, a, b)

    a.merge(_batch(spark, [("x", "v1", False, 100, "e1", None)]))
    st = f.sync()
    assert st["resynced"] is False and _live(b) == {("x", "v1")}

    # the evolution: a wider batch lands on the source mid-feed
    a.merge(spark.createDataFrame(
        [("y", "w1", False, 200, "e2", None, "bonus")], wide_ddl))
    st = f.sync()
    assert st["resynced"] is False  # compatible add: NO resync needed
    out = {(r["id"], r["val"], r["extra"])
           for r in b.read_live().collect()}
    assert out == {("x", "v1", None), ("y", "w1", "bonus")}

    # post-evolution narrow writes still apply (old producers linger)
    a.merge(_batch(spark, [("x", "v2", False, 300, "e3", None)]))
    st = f.sync()
    assert st["resynced"] is False
    out = {(r["id"], r["val"], r["extra"])
           for r in b.read_live().collect()}
    assert out == {("x", "v2", None), ("y", "w1", "bonus")}


def test_follower_repointed_at_empty_source_defers_resync(spark, tmp_path):
    """Re-pointing at a source with NO commits yet must not crash (no
    snapshot exists to seed from) and must still resync at the new
    source's first commit."""
    a = KeyedTable(spark, str(tmp_path / "a"), ["id"], num_buckets=2,
                   keep_versions=20)
    b = KeyedTable(spark, str(tmp_path / "b"), ["id"], num_buckets=2,
                   keep_versions=20)
    a.merge(_batch(spark, [("x", "v1", False, 100, "e1", None)]))
    ChangeFeedFollower(spark, a, b).sync()

    c = KeyedTable(spark, str(tmp_path / "c"), ["id"], num_buckets=2,
                   keep_versions=20)
    f2 = ChangeFeedFollower(spark, c, b)
    st = f2.sync()  # empty new source: no-op, no crash
    assert st == {"from": 0, "to": 0, "resynced": False}
    assert _live(b) == {("x", "v1")}  # stale but intact

    c.merge(_batch(spark, [("ck", "c1", False, 500, "ce1", None)]))
    st = f2.sync()  # first commit on the new source: forced re-seed
    assert st["resynced"] is True
    assert _live(b) == {("ck", "c1")}
