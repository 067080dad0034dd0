"""Tumbling-window aggregates over the event stream (SURVEY §2.5).

The reference's only time-bucketed computations are Prometheus-side
rates over ``cdc_events_processed_total``
(``src/monitoring/metrics.py:8-34``); here they're first-class
tumbling-window aggregates via ``F.window`` — the identical code path
works on a static DataFrame (batch backfill) and on a streaming
DataFrame (`readStream` + watermark), which is the Structured
Streaming contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def frozen_range_pid(df: DataFrame, order: list[Column]) -> DataFrame:
    """Range-partition *df* on *order*, stamp the partition id as
    ``_pid``, and FREEZE the result (lazy ``localCheckpoint``) so every
    downstream branch reads the SAME materialized partitioning.

    This is the backbone of the distributed two-phase rank
    (``row_number`` per range slice + broadcast prefix offsets —
    ``token_budget_select``, ``customer_value_deciles``).  The freeze
    is a CORRECTNESS requirement, not an optimization (r8 ADVICE,
    high): without it, each branch compiles its own
    ``ShuffleExchange`` with its own ``RangePartitioner`` — Catalyst's
    column pruning makes the branch plans differ, so exchange reuse
    cannot unify them, and RangePartitioner samples boundaries
    per-exchange with per-RDD seeds.  At real scale, rows that tie
    near a boundary can then land in DIFFERENT ``_pid``s in the rank
    branch vs the counts branch, silently corrupting
    ``global rank = prefix_offset + local row_number``.  Tiny-SF
    oracles can't catch it (sampling there is exhaustive), which is
    exactly what makes it a 100 TB landmine.

    ``eager=False`` keeps query BUILD action-free apart from the range
    boundary sampling that creating the shuffle dependency always
    pays; the blocks materialize on the first real action and both
    branches then read them (verified: zero ``_pid`` disagreement
    between branches, one ``Scan ExistingRDD`` shared by both).  Bonus
    at any scale: the upstream pipeline (scan → aggregate/tokenize →
    range exchange) now runs ONCE instead of once per branch.  On a
    multi-executor cluster ``localCheckpoint`` blocks are not
    fault-tolerant — a lost executor recomputes nothing; swap for
    ``persist(MEMORY_AND_DISK)`` + reliable checkpointing where
    re-run-on-failure is not acceptable (same trade
    ``dedup.connected_components`` documents).
    """
    return (
        df.repartitionByRange(*order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )


def sessionize(
    events: DataFrame,
    gap_us: int = 30 * 60 * 1_000_000,
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
) -> DataFrame:
    """Gaps-and-islands sessionization: consecutive events of the same
    key closer than *gap_us* belong to one session.

    Output: key, session_start_us, session_end_us, n_events.

    Plan shape at 100 TB: one shuffle on the key (the window
    partition), then running-sum session ids and the aggregate reuse
    that same partitioning — Catalyst elides the second Exchange.
    Equal-timestamp ties never open a session (diff 0 < gap), so the
    result is deterministic regardless of tie order within the sort.
    """
    w = Window.partitionBy(key_col).orderBy(ts_us_col)
    ts = F.col(ts_us_col)
    new_session = F.when(
        ts - F.lag(ts).over(w) > F.lit(gap_us), F.lit(1)
    ).otherwise(F.lit(0))  # first row: lag NULL → comparison NULL → 0
    sess = events.withColumn(
        "_sess", F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy(key_col, "_sess")
        .agg(
            F.min(ts).alias("session_start_us"),
            F.max(ts).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_sess")
    )


def sessionize_native(
    events: DataFrame,
    gap_us: int = 30 * 60 * 1_000_000,
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
    watermark: str | None = None,
) -> DataFrame:
    """Sessionization via the built-in ``F.session_window`` — the
    JVM-side scale path that runs UNCHANGED on batch and streaming
    DataFrames (pass *watermark*, e.g. ``"1 hour"``, for streams; the
    session-merge state then lives in the executor state store and is
    evicted by the watermark).  Prefer this over the
    ``applyInPandasWithState`` sessionizer
    (``streaming.stateful.sessionize_stream``) whenever plain
    gap-sessions are enough: no Python workers, no Arrow transfer,
    whole-stage-codegen aggregation, and Spark merges sessions that
    span microbatches natively.

    Same output schema as :func:`sessionize`, including at the exact
    gap boundary: session windows merge when the next event lands at
    or before ``prev + gap`` (window end inclusive for merging), the
    same ``diff > gap``-opens rule as the gaps-and-islands
    formulation — agreement pinned in tests.
    """
    with_ts = events.withColumn("_ts", F.timestamp_micros(F.col(ts_us_col)))
    if watermark is not None:
        with_ts = with_ts.withWatermark("_ts", watermark)
    return (
        with_ts.groupBy(
            key_col,
            F.session_window("_ts", f"{gap_us} microseconds").alias("_w"),
        )
        .agg(
            F.min(ts_us_col).alias("session_start_us"),
            F.max(ts_us_col).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_w")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts_col: str,
    right_ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """As-of join: attach to each left row the *value_cols* of the
    latest right row with ``right_ts <= left_ts`` for the same key
    (inclusive at equality) — the standard event-time enrichment join
    (attach latest state/checkpoint/price to each event).

    Spark has no native as-of join; the naive formulation is a range
    join (equality + inequality), which Catalyst executes as a
    per-key cartesian then filter — quadratic per key.  This
    implementation is the **tagged-union + window last-non-null**
    composition instead: union both sides ordered by (ts, side) so a
    right row sorts before left rows at the same timestamp, then one
    running ``last(value, ignoreNulls=True)`` per key carries the
    latest right values forward onto every left row.  Exactly ONE
    shuffle (the key partition), O(n log n) per key, no row
    amplification — the same plan shape as sessionize, at any scale.

    Determinism requires unique (key, right_ts) pairs on the right
    side (true for session starts, state snapshots, price ticks);
    left rows preceding every right row get NULLs.  *value_cols* must
    not collide with left column names.
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    l = left.withColumn("_t", F.col(left_ts_col)).withColumn("_side", F.lit(1))
    r = right.select(
        key_col, F.col(right_ts_col).alias("_t"), *value_cols
    ).withColumn("_side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side", "_t", *value_cols)
    for c in value_cols:
        out = out.withColumnRenamed(f"_asof_{c}", c)
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts_col: str,
    start_col: str,
    end_col: str,
    bucket_us: int,
    key_col: str | None = None,
) -> DataFrame:
    """Range join: pair each left row with every right interval
    ``[start, end]`` (inclusive) containing its timestamp, optionally
    also matching on *key_col*.

    The naive equality+inequality formulation plans as a broadcast
    nested loop (per-key cartesian) — quadratic.  This is the
    **time-bucketed** formulation: a point lands in exactly one
    ``bucket_us`` chunk, an interval explodes to the chunks it covers,
    the join is a plain hash equi-join on (key, chunk), and the exact
    containment predicate filters afterwards.  Each (point, interval)
    pair meets at most once (the point's single chunk), so no dedup is
    needed.  Row amplification is interval_length/bucket_us on the
    interval side only — size *bucket_us* near the typical interval
    length, exactly like choosing a partition size.

    Works for arbitrary OVERLAPPING intervals (unlike an as-of join,
    which resolves to the single latest match).
    """
    lb = F.floor(F.col(left_ts_col) / F.lit(bucket_us)).cast("long")
    rb = F.explode(
        F.sequence(
            F.floor(F.col(start_col) / F.lit(bucket_us)).cast("long"),
            F.floor(F.col(end_col) / F.lit(bucket_us)).cast("long"),
        )
    )
    l = left.withColumn("_chunk", lb)
    r = right.withColumn("_chunk", rb)
    on = ["_chunk"] + ([key_col] if key_col else [])
    return (
        l.join(r, on)
        .filter(
            (F.col(left_ts_col) >= F.col(start_col))
            & (F.col(left_ts_col) <= F.col(end_col))
        )
        .drop("_chunk")
    )


def throughput_by_window(
    events: DataFrame,
    ts_us_col: str = "ts_us",
    window_duration: str = "1 minute",
    watermark: str | None = None,
    slide_duration: str | None = None,
) -> DataFrame:
    """Events/users per tumbling window — or hopping windows when
    *slide_duration* < *window_duration* (each event lands in
    window/slide overlapping windows; ``F.window`` expands the row
    set by that factor BEFORE the aggregate, so the shuffle carries
    window/slide× keys — size the slide accordingly at scale).

    Output: window_start_us, n_events, n_users — window start in µs so
    batch results hash-compare against arithmetic bucketing.  Pass
    *watermark* (e.g. ``"5 minutes"``) on a streaming input to bound
    state for late data.
    """
    with_ts = events.withColumn("_ts", F.timestamp_micros(F.col(ts_us_col)))
    if watermark is not None:
        with_ts = with_ts.withWatermark("_ts", watermark)
    # exact distinct in batch; streaming state stores forbid exact
    # distinct, so the stream path uses the HLL sketch (documented
    # approximation — the batch backfill is the exact reconciler)
    n_users = (
        F.approx_count_distinct(F.col("user_id"))
        if events.isStreaming
        else F.count_distinct(F.col("user_id"))
    )
    win = (
        F.window("_ts", window_duration, slide_duration)
        if slide_duration is not None
        else F.window("_ts", window_duration)
    )
    return (
        with_ts.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            n_users.alias("n_users"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "n_users",
        )
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
) -> DataFrame:
    """Ranking window: the k best rows per group with a total order
    (callers MUST tiebreak on a unique key, or pagination is
    nondeterministic).

    Plan shape at 100 TB: one shuffle on the group key; within each
    partition the sort is bounded by Spark's rank-limit pushdown
    (``WindowGroupLimit`` inserts a per-partition top-k heap before
    the full window sort), so skewed groups don't sort their entire
    extent.  Output carries ``rank`` (1-based).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    unique_col: str,
) -> DataFrame:
    """Deterministic per-stratum quota sample — the training-data-mix
    primitive: cap every stratum (language, source, event type, …) at
    *n_per_stratum* rows, chosen by a uniform-but-reproducible order
    (md5 of the unique key, which both engines can replay — the
    reference's unseeded ``random.sample``,
    ``reconciliation_engine.py:461-499``, cannot be oracle-checked).

    Same WindowGroupLimit-bounded plan as :func:`top_k_per_group` —
    one shuffle on the strata, per-partition heaps, no full sort of
    dominant strata.
    """
    order = [F.md5(F.col(unique_col).cast("string")).asc(), F.col(unique_col).asc()]
    return top_k_per_group(df, strata_cols, order, n_per_stratum).drop("rank")
