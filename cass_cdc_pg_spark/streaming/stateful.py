"""Custom stateful streaming operators (``applyInPandasWithState``).

The batch engine answers sessionization with gaps-and-islands
(``operators/windows.sessionize``); on an unbounded stream the same
semantics need per-key state that outlives a microbatch.  This module
is the engine's custom-stateful-operator surface: Arrow-batched pandas
state functions over ``groupBy(key).applyInPandasWithState`` — the
Spark-idiomatic replacement for hand-rolled operator state (the
reference keeps conflict-resolver state in Postgres rows instead;
``timestamp_conflict_resolver.py:40-121``).

Scale: state lives in the executor state store partitioned by key —
the same shuffle partitioning as the groupBy, no driver state, bounded
by (#live keys × state row size).  A processing-time timeout closes
idle sessions so state cannot grow without bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_us: int = 30 * 60 * 1_000_000,
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
    idle_timeout_ms: int = 60_000,
) -> DataFrame:
    """Streaming sessionization with per-key state: a session CLOSES
    (and is emitted) when a later event arrives more than *gap_us*
    after its end, or when the key goes idle past *idle_timeout_ms*
    (processing time).  The open session stays in the state store
    across microbatches.

    Same output schema as the batch ``sessionize`` — closed sessions
    only; the still-open tail is in state, exactly the batch/stream
    split Structured Streaming's append semantics require.

    Events are sorted within each microbatch, so intra-batch disorder
    is free; cross-batch lateness beyond the open session reopens a
    new session (document the watermark bound in deployments that
    need stronger guarantees — the reference accepts any lateness and
    lets reconciliation catch drift, C7).
    """
    import pandas as pd

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        cols = ["user_id", "session_start_us", "session_end_us", "n_events"]
        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield pd.DataFrame([[user, s, e, n]], columns=cols)
            return
        ts = sorted(t for pdf in pdfs for t in pdf[ts_us_col])
        s, e, n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in ts:
            t = int(t)
            if s is None:
                s, e, n = t, t, 1
            elif t - e > gap_us:
                closed.append((s, e, n))
                s, e, n = t, t, 1
            else:
                e, n = max(e, t), n + 1
        state.update((s, e, n))
        state.setTimeoutDuration(idle_timeout_ms)
        if closed:
            yield pd.DataFrame(
                [[user, a, b, c] for a, b, c in closed], columns=cols
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def deduplicate_stream(
    events: DataFrame,
    id_cols: list[str] | None = None,
    ts_col: str = "_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-level exactly-once dedup: drop events whose id was
    already seen within the watermark horizon
    (``dropDuplicatesWithinWatermark``).

    This is the *first* dedup line — it bounds the duplicate rate
    reaching the merge; the KeyedTable batch manifest remains the
    durable exactly-once guarantee across restarts (C5).  Unlike plain
    ``dropDuplicates`` on a stream, the within-watermark variant evicts
    state older than the horizon, so state is bounded by
    (event rate × watermark) instead of growing forever — the only
    state shape that survives an unbounded 100 TB/day stream.

    ``id_cols`` defaults to ``["event_id"]``.  *ts_col* must be the
    event-time timestamp column the watermark is declared on.
    """
    keys = list(id_cols or ["event_id"])
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
