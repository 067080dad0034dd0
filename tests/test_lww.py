"""LWW conflict-resolution semantics (SURVEY.md §2.3).

Scenarios transcribed from the reference's executable spec
``tests/integration/test_out_of_order_events.py`` (newer-wins,
stale-reject, event_id tiebreak, out-of-order convergence,
delete-vs-create) plus a Hypothesis permutation-convergence property.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cass_cdc_pg_spark.operators.lww import lww_latest, lww_merge, lww_window

COLS = ["key", "event_id", "timestamp_micros", "payload"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, event_id string, timestamp_micros long, payload string")


def _state(df):
    return {r["key"]: (r["event_id"], r["timestamp_micros"], r["payload"]) for r in df.collect()}


def test_out_of_order_triple_converges_to_latest(spark):
    # t3, t1, t2 arrival order → final state = t3 (test_out_of_order_events.py:346-428)
    rows = [
        ("k1", "e3", 3000, "v3"),
        ("k1", "e1", 1000, "v1"),
        ("k1", "e2", 2000, "v2"),
    ]
    out = _state(lww_latest(_df(spark, rows), ["key"], "timestamp_micros", "event_id"))
    assert out == {"k1": ("e3", 3000, "v3")}


def test_equal_timestamp_tiebreak_greater_event_id_wins(spark):
    # test_out_of_order_events.py:259-340
    rows = [
        ("k1", "aaaa", 1000, "first"),
        ("k1", "zzzz", 1000, "second"),
        ("k1", "mmmm", 1000, "third"),
    ]
    out = _state(lww_latest(_df(spark, rows), ["key"], "timestamp_micros", "event_id"))
    assert out == {"k1": ("zzzz", 1000, "second")}


def test_window_and_aggregate_formulations_agree(spark):
    rows = [
        ("k1", "e1", 1000, "a"),
        ("k1", "e2", 2000, "b"),
        ("k2", "e3", 500, "c"),
        ("k2", "e4", 500, "d"),
        ("k3", "e5", 9, "e"),
    ]
    df = _df(spark, rows)
    a = _state(lww_latest(df, ["key"], "timestamp_micros", "event_id"))
    b = _state(lww_window(df, ["key"], "timestamp_micros", "event_id"))
    assert a == b


def test_cross_batch_merge_stale_reject(spark):
    current = _df(spark, [("k1", "e5", 5000, "current")])
    stale_batch = _df(spark, [("k1", "e2", 2000, "stale")])
    out = _state(
        lww_merge(current, stale_batch, ["key"], "timestamp_micros", "event_id")
    )
    assert out == {"k1": ("e5", 5000, "current")}


def test_duplicate_replay_is_idempotent(spark):
    batch = _df(spark, [("k1", "e1", 1000, "v"), ("k1", "e1", 1000, "v")])
    once = lww_latest(batch, ["key"], "timestamp_micros", "event_id")
    twice = lww_merge(once, batch, ["key"], "timestamp_micros", "event_id")
    assert _state(once) == _state(twice)
    assert twice.count() == 1


@settings(max_examples=10, deadline=None)
@given(perm=st.permutations(list(range(6))))
def test_any_permutation_converges(spark, perm):
    # commutativity: any arrival order yields the same final state
    events = [
        ("k1", f"e{i}", 1000 * (i // 2), f"v{i}")  # includes ts ties
        for i in range(6)
    ]
    shuffled = [events[i] for i in perm]
    out = _state(lww_latest(_df(spark, shuffled), ["key"], "timestamp_micros", "event_id"))
    # expected winner: max by (ts, event_id) = e5 (ts=2000, id 'e5')
    assert out == {"k1": ("e5", 2000, "v5")}


def test_delete_vs_create_ordering(spark):
    """Newer DELETE beats older CREATE arriving later (C4)."""
    from pyspark.sql import functions as F

    rows = [
        ("k1", "e-del", 2000, "DELETE"),
        ("k1", "e-create", 1000, "CREATE"),
    ]
    df = spark.createDataFrame(
        rows, "key string, event_id string, timestamp_micros long, operation_type string"
    )
    latest = lww_latest(df, ["key"], "timestamp_micros", "event_id")
    row = latest.withColumn(
        "_cdc_deleted", F.col("operation_type") == "DELETE"
    ).collect()[0]
    assert row["_cdc_deleted"] is True
    assert row["timestamp_micros"] == 2000
