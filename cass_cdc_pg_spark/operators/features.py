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
