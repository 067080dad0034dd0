"""Feature-engineering operators over the event stream — the
aggregation step that turns raw events into per-entity training
features (the reference exposes the raw tables; a training pipeline
at 100 TB needs the per-user/per-source rollups computed in-engine,
one shuffle, partial aggs map-side).

Determinism contract: every emitted value is integer arithmetic or a
DECIMAL-summed monetary value cast to double at the end — no
floating-point accumulation whose result depends on partitioning
(``SUM(double)`` is order-sensitive; ``SUM(decimal)`` is exact and
associative, so any partition order yields the same bits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_features(events: DataFrame) -> DataFrame:
    """Per-user behavioral feature vector.

    - ``n_events``, ``n_types``: activity volume / diversity.
    - ``total_value_micros``, ``avg_value_micros``: spend in exact
      integer micro-units — the DECIMAL(18,6) sum is exact and
      associative (partition-order independent), scaling by 10⁶ and
      the integer-DIV mean stay exact.  Emitting a ROUND(double, n)
      instead is a latent flake: a mean that lands exactly on a
      .xxxx5 boundary rounds half-up in Spark (BigDecimal of the
      shortest decimal string) but half-down in engines that round
      the raw binary double — observed live at sf0.1
      (49.19125 → 49.1913 vs 49.1912).
    - ``first_ts_us`` / ``last_ts_us`` / ``span_us``: activity window.
    - ``avg_gap_us``: mean inter-event gap ``span // (n-1)`` in pure
      integer arithmetic (NULL for single-event users).

    One hash aggregation on ``user_id`` with map-side partials; no
    window, no second shuffle.  At 100 TB this is the canonical
    "billions of rows into hundreds of millions of feature rows"
    reduction — AQE coalesces the post-shuffle partitions.
    """
    dec = F.col("value").cast("decimal(18,6)")
    n = F.count(F.lit(1))
    agg = events.groupBy("user_id").agg(
        n.cast("long").alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.sum(dec).alias("_total_dec"),
        F.min("ts_us").alias("first_ts_us"),
        F.max("ts_us").alias("last_ts_us"),
    )
    span = F.col("last_ts_us") - F.col("first_ts_us")
    total_micros = (F.col("_total_dec") * F.lit(1_000_000)).cast("long")
    return agg.select(
        "user_id",
        "n_events",
        "n_types",
        total_micros.alias("total_value_micros"),
        "first_ts_us",
        "last_ts_us",
        span.alias("span_us"),
        F.when(
            F.col("n_events") > 1,
            F.expr("(last_ts_us - first_ts_us) DIV (n_events - 1)"),
        ).cast("long").alias("avg_gap_us"),
    ).withColumn(
        "avg_value_micros",
        F.expr("total_value_micros DIV n_events").cast("long"),
    ).select(
        "user_id", "n_events", "n_types", "total_value_micros",
        "avg_value_micros", "first_ts_us", "last_ts_us", "span_us",
        "avg_gap_us",
    )


def user_features_windowed(
    events: DataFrame,
    window_duration: str = "5 minutes",
    ts_us_col: str = "ts_us",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user features per tumbling window — ONE code path for batch
    and streaming (pass *watermark* on a streaming input to bound
    state; late rows past it are dropped, on-time rows re-aggregate).

    ``n_types`` is an exact distinct in batch; streaming state stores
    forbid exact distinct, so the stream path uses the HLL sketch
    (exact in its sparse regime, i.e. for the small per-user-window
    cardinalities this tracks; the batch backfill is the exact
    reconciler).  Spend accumulates as DECIMAL → integer micros, same
    determinism contract as :func:`user_features`.

    Scale: one shuffle on (window, user_id) with map-side partials;
    streaming state is one row per open (window, user) pruned by the
    watermark.
    """
    with_ts = events.withColumn("_ts", F.timestamp_micros(F.col(ts_us_col)))
    if watermark is not None:
        with_ts = with_ts.withWatermark("_ts", watermark)
    n_types = (
        F.approx_count_distinct("event_type")
        if events.isStreaming
        else F.count_distinct("event_type")
    )
    dec = F.col("value").cast("decimal(18,6)")
    return (
        with_ts.groupBy(
            F.window("_ts", window_duration).alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            n_types.cast("long").alias("n_types"),
            F.sum(dec).alias("_total"),
            F.min(ts_us_col).alias("first_ts_us"),
            F.max(ts_us_col).alias("last_ts_us"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "user_id",
            "n_events",
            "n_types",
            (F.col("_total") * F.lit(1_000_000)).cast("long").alias(
                "total_value_micros"
            ),
            "first_ts_us",
            "last_ts_us",
        )
    )


def funnel_conversion(
    events: DataFrame,
    start_type: str = "signup",
    convert_type: str = "purchase",
    ts_us_col: str = "ts_us",
    user_col: str = "user_id",
) -> DataFrame:
    """Funnel step: for every user who emitted a *start_type* event,
    the earliest *convert_type* event at-or-after their first start —
    the signup→purchase conversion join the reference's consumers run
    against the replicated events table (analytics on
    ``docker/postgres/init-db.sql``'s events), expressed as ONE
    shuffle.

    Shape: a running ``min(start ts)`` window with a **range** frame
    (``ORDER BY ts RANGE UNBOUNDED PRECEDING``) marks, per event, the
    earliest start at-or-before it — a range frame so ties on the
    timestamp are handled set-wise (a conversion in the same
    microsecond as the start counts, independent of intra-tie row
    order; a rows frame would be order-dependent there and
    irreproducible between engines).  The per-user aggregate then
    reuses the window's hash partitioning, so Catalyst elides its
    Exchange — one shuffle total, same pattern as sessionization.

    Output: user_id, signup_ts_us, first_purchase_ts_us (NULL when
    never converted), converted (0/1), secs_to_convert (integer
    seconds, NULL when never converted).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_us_col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    started = F.min(
        F.when(F.col("event_type") == start_type, F.col(ts_us_col))
    ).over(w)
    e = events.select(user_col, ts_us_col, "event_type").withColumn(
        "_start_ts", started
    )
    return (
        e.groupBy(user_col)
        .agg(
            F.min(
                F.when(F.col("event_type") == start_type, F.col(ts_us_col))
            ).alias("signup_ts_us"),
            F.min(
                F.when(
                    (F.col("event_type") == convert_type)
                    & F.col("_start_ts").isNotNull(),
                    F.col(ts_us_col),
                )
            ).alias("first_purchase_ts_us"),
        )
        .filter(F.col("signup_ts_us").isNotNull())
        .select(
            user_col,
            "signup_ts_us",
            "first_purchase_ts_us",
            F.col("first_purchase_ts_us").isNotNull().cast("int").alias(
                "converted"
            ),
            F.expr(
                "(first_purchase_ts_us - signup_ts_us) div 1000000"
            ).alias("secs_to_convert"),
        )
    )


def retention_cohorts(
    events: DataFrame,
    ts_us_col: str = "ts_us",
    user_col: str = "user_id",
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day
    (cohort), counted once per (cohort, day-offset) they were active —
    the classic growth-analytics rollup over the events table.

    Scale shape: the per-user first-day comes from a partition-only
    window (``min(day) OVER (PARTITION BY user)``, no ordering → no
    sort), and the following per-(user, cohort, offset) dedup reuses
    that hash partitioning (user_id is a subset of the dedup keys, so
    its clustering satisfies the distinct's distribution and the
    Exchange is elided).  Only the final (cohort, offset) count pays a
    second shuffle, and it carries one row per user-day — two
    Exchanges total, text-free ~24-byte rows.

    Day arithmetic is integer (``ts div bucket``): at µs-since-epoch
    magnitudes a double division misfloors near bucket boundaries.

    Output: cohort_day, day_offset, n_users (cohort_day in integer
    days since epoch; day_offset 0 = the cohort's first day).
    """
    from pyspark.sql import Window

    e = events.select(
        user_col, F.expr(f"{ts_us_col} div {bucket_us}").alias("_day")
    )
    w = Window.partitionBy(user_col)
    return (
        e.withColumn("cohort_day", F.min("_day").over(w))
        .select(
            user_col,
            "cohort_day",
            (F.col("_day") - F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def value_anomaly_stats(events: DataFrame) -> DataFrame:
    """Per-event-type value anomaly profile: n, exact mean (micro
    units), the 3σ threshold, and how many events exceed it — the
    monitoring-style outlier rollup, built so a DISTRIBUTED run is
    bit-deterministic.

    The naive formulation (``avg``/``stddev`` over doubles) is
    partition-order dependent — float sums reassociate across
    partitionings, so the same data can yield different thresholds on
    different cluster layouts (and can never hash-match an oracle).
    Here every accumulation is exact: values quantize to integer
    micro-units through the engine's proven ``DECIMAL(18,6)`` cast,
    Σv sums as BIGINT and Σv² as DECIMAL(38,0) (both associative),
    and the only float arithmetic is a fixed expression over those
    exact totals (casts, one sqrt, divisions — each IEEE
    correctly-rounded, hence identical on any engine).
    ``threshold_micros = (S + 3·√((n·Q − S²)/n)) / n`` in µ-units.

    Two passes over events: the per-type totals (a tiny aggregate,
    map-side partials), then a re-scan counting values above the
    broadcast per-type thresholds — at scale the second pass is a
    scan+filter with a broadcast hash join on a handful of rows, no
    extra shuffle of the fact table.
    """
    v_mu = "CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    e = events.select("event_type", F.expr(v_mu).alias("v_mu"))
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("v_mu").alias("_s"),
        F.sum(F.expr("CAST(v_mu * v_mu AS DECIMAL(38,0))")).alias("_q"),
    )
    stats = agg.select(
        "event_type",
        "n_events",
        F.expr("_s div n_events").cast("long").alias("mean_value_micros"),
        # GREATEST(0, ·) clamps the radicand: n·Q and S² round
        # independently through doubles, so a zero-variance group at
        # large magnitude can land epsilon-negative — Spark would
        # return NaN but DuckDB raises on sqrt(<0), aborting a whole
        # oracle run instead of mismatching one query.  Clamped
        # identically in ANOMALY_SQL.
        F.expr(
            "(CAST(_s AS DOUBLE) + 3.0 * SQRT(GREATEST(CAST(0 AS DOUBLE), "
            "(CAST(n_events AS DOUBLE) * CAST(_q AS DOUBLE)"
            " - CAST(_s AS DOUBLE) * CAST(_s AS DOUBLE))"
            " / CAST(n_events AS DOUBLE))))"
            " / CAST(n_events AS DOUBLE)"
        ).alias("threshold_micros"),
    )
    flagged = (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.col("v_mu").cast("double") > F.col("threshold_micros"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_anomalies"))
    )
    return stats.join(flagged, "event_type", "left").select(
        "event_type",
        "n_events",
        "mean_value_micros",
        "threshold_micros",
        F.coalesce(F.col("n_anomalies"), F.lit(0)).cast("long").alias(
            "n_anomalies"
        ),
    )
