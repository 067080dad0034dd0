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
    idle_timeout_ms: int | None = 60_000,
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

    ``idle_timeout_ms=None`` disables the idle flush entirely
    (``NoTimeout``).  This is REQUIRED for bounded
    ``trigger(availableNow=True)`` replays: once processing-time
    timers are registered, the engine keeps scheduling timer-check
    microbatches and the "run until available data is processed" run
    NEVER terminates (measured r9: ~450 empty batches in 2 minutes on
    a 3-row input — the engine is polling timers, not data).  A
    bounded replay closes its sessions with a past-gap sentinel event
    instead; long-running deployments keep the timeout, where the
    continuous trigger is the point.
    """
    import pandas as pd

    use_timeout = idle_timeout_ms is not None

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
        if use_timeout:
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
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
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


FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("signup_ts_us", T.LongType()),
        T.StructField("first_purchase_ts_us", T.LongType()),
        T.StructField("converted", T.IntegerType()),
        T.StructField("secs_to_convert", T.LongType()),
    ]
)

_FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("signup_ts_us", T.LongType()),
        T.StructField("purchase_ts_us", T.LongType()),
    ]
)

_FUNNEL_STATE_BUF_SCHEMA = T.StructType(
    [
        T.StructField("signup_ts_us", T.LongType()),
        T.StructField("purchase_ts_us", T.LongType()),
        T.StructField("conv_buf", T.ArrayType(T.LongType())),
    ]
)


def funnel_stream(
    events: DataFrame,
    start_type: str = "signup",
    convert_type: str = "purchase",
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
    buffer_conversions: int = 0,
) -> DataFrame:
    """Streaming funnel conversion — the per-key-state twin of the
    batch ``features.funnel_conversion``: O(1) state per user
    (earliest start ts, earliest qualifying convert ts), a row
    re-emitted whenever the user's funnel state changes (update
    semantics).

    Exactness contract: identical to the batch answer whenever each
    user's events arrive in event-time order across microbatches
    (intra-batch disorder is free — the batch is sorted before the
    fold).  Under cross-batch retrograde arrival (a start event
    arriving AFTER a conversion already seen), the conversion is
    re-qualified from the tracked earliest-conversion bound, which is
    exact unless an even-earlier non-minimal conversion fell between
    the new start and the old one — O(1) state cannot distinguish
    that case, exactly the classic stream/batch trade; the batch
    query is the reconciler (same stance as the windowed features'
    HLL distinct).  Convergence to the batch answer is pinned by
    test.

    ``buffer_conversions = k > 0`` switches to bounded-buffer state
    (+k longs per user): the k EARLIEST conversion timestamps ever
    seen persist across microbatches, and the first qualifying
    conversion is recomputed from the buffer whenever an earlier start
    retrogrades in.  This CLOSES the divergence window whenever any
    buffered conversion qualifies: evicted conversions are all later
    than every buffered one, so the buffered minimum-qualifying is
    globally minimal.  The only residual divergence needs ALL k
    buffered conversions to precede the final start while an evicted
    (later) one qualifies — i.e. more than k distinct pre-start
    conversions for one user.  k=0 (default) keeps the O(1) state.
    """
    import pandas as pd

    if buffer_conversions > 0:
        return _funnel_stream_buffered(
            events, start_type, convert_type, key_col, ts_us_col,
            buffer_conversions,
        )

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        s, p = state.get if state.exists else (None, None)
        p_any = None  # earliest conversion seen THIS batch, pre-start
        rows = sorted(
            (int(t), et)
            for pdf in pdfs
            for t, et in zip(pdf[ts_us_col], pdf["event_type"])
        )
        changed = False
        for t, et in rows:
            if et == start_type and (s is None or t < s):
                s, changed = t, True
                # re-qualify conversions seen before this earlier start
                for cand in (p_any, p):
                    if cand is not None and cand >= s and (p is None or cand < p):
                        p, changed = cand, True
            elif et == convert_type:
                if p_any is None or t < p_any:
                    p_any = t
                if s is not None and t >= s and (p is None or t < p):
                    p, changed = t, True
        state.update((s, p))
        if changed and s is not None:
            yield pd.DataFrame(
                [[
                    user, s, p,
                    1 if p is not None else 0,
                    (p - s) // 1_000_000 if p is not None else None,
                ]],
                columns=[f.name for f in FUNNEL_SCHEMA.fields],
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _funnel_stream_buffered(
    events: DataFrame,
    start_type: str,
    convert_type: str,
    key_col: str,
    ts_us_col: str,
    k: int,
) -> DataFrame:
    """Bounded-buffer funnel state (see ``funnel_stream``): per user,
    (earliest start, first qualifying conversion, k earliest
    conversions).  Order-insensitive within and across batches — all
    three state fields are monotone minima, so the fold is a pure
    min-merge and retrograde arrival of either event kind converges
    without replay."""
    import pandas as pd

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        s, p, buf = state.get if state.exists else (None, None, [])
        buf = list(buf or [])
        starts, convs = [], []
        for pdf in pdfs:
            for t, et in zip(pdf[ts_us_col], pdf["event_type"]):
                if et == start_type:
                    starts.append(int(t))
                elif et == convert_type:
                    convs.append(int(t))
        s_vals = [t for t in (s, *starts) if t is not None]
        new_s = min(s_vals) if s_vals else None
        # qualify against EVERYTHING visible this batch — the old
        # buffer AND all current-batch conversions (a batch conversion
        # evicted from the k-truncated buffer must still qualify NOW;
        # only cross-batch retro-qualification is buffer-bounded) —
        # then persist the k earliest for future retrogrades
        live = set(buf) | set(convs)
        buf = sorted(live)[:k]
        cands = [c for c in live if new_s is not None and c >= new_s]
        if p is not None:
            cands.append(p)
        new_p = min(cands) if cands and new_s is not None else None
        changed = new_s is not None and (new_s, new_p) != (s, p)
        state.update((new_s, new_p, buf))
        if changed:
            yield pd.DataFrame(
                [[
                    user, new_s, new_p,
                    1 if new_p is not None else 0,
                    (new_p - new_s) // 1_000_000 if new_p is not None else None,
                ]],
                columns=[f.name for f in FUNNEL_SCHEMA.fields],
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE_BUF_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
