"""Events-stream analytics tier of the declared-query registry
(split from ``registry.py`` in r14, fifth tranche of the r12 verdict
#6 decomposition): windowed/sessionized/statistical queries over the
``events`` fact with their DuckDB oracle twins.  ``registry.py``
re-exports every name unchanged; back-references use the same
call-time module proxy as ``registry_ann``."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cass_cdc_pg_spark.sources import tables as src



class _RegistryProxy:
    """Call-time proxy into ``registry`` (the registry_ann pattern):
    imported lazily inside __getattr__ so the module can be imported
    while registry.py itself is still mid-import."""

    def __getattr__(self, name: str):
        from cass_cdc_pg_spark import registry

        return getattr(registry, name)


_reg = _RegistryProxy()


def _li(spark, sf_dir):
    return src.load_table(spark, sf_dir, "lineitem")


def _ord(spark, sf_dir):
    return src.load_table(spark, sf_dir, "orders")


def _ev(spark, sf_dir):
    return src.events_with_micros(spark, sf_dir)



def events_stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data-mix quota sampling: at most 100 events per
    event_type, selected by a deterministic uniform order (md5 of the
    unique key) so the sample is reproducible and oracle-checkable."""
    from cass_cdc_pg_spark.operators.windows import stratified_sample

    ev = _ev(spark, sf_dir).select("event_id", "user_id", "event_type", "value")
    return stratified_sample(ev, ["event_type"], 100, "event_id")


STRATIFIED_SAMPLE_SQL = """
SELECT event_id, user_id, event_type, value FROM (
  SELECT event_id, user_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
  FROM events) t
WHERE rn <= 100
"""


def events_top3_per_user_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: each user's 3 highest-value events (total order
    via the event_id tiebreak)."""
    from cass_cdc_pg_spark.operators.windows import top_k_per_group

    ev = _ev(spark, sf_dir).select("event_id", "user_id", "event_type", "value")
    return top_k_per_group(
        ev, ["user_id"], [F.col("value").desc(), F.col("event_id").asc()], 3
    )


TOP3_PER_USER_SQL = """
SELECT event_id, user_id, event_type, value, rank FROM (
  SELECT event_id, user_id, event_type, value,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY value DESC, event_id) AS INT) AS rank
  FROM events) t
WHERE rank <= 3
"""


def events_user_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral feature vector (volume, diversity, spend,
    activity window, mean gap) — event-stream feature engineering."""
    from cass_cdc_pg_spark.operators.features import user_features

    return user_features(_ev(spark, sf_dir))


USER_FEATURES_SQL = """
WITH ev AS (SELECT user_id, event_type, value, epoch_us(ts) AS ts_us FROM events),
agg AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS total_value_micros,
         MIN(ts_us) AS first_ts_us,
         MAX(ts_us) AS last_ts_us
  FROM ev GROUP BY user_id)
SELECT user_id, n_events, n_types, total_value_micros,
       total_value_micros // n_events AS avg_value_micros,
       first_ts_us, last_ts_us,
       last_ts_us - first_ts_us AS span_us,
       CASE WHEN n_events > 1
            THEN (last_ts_us - first_ts_us) // (n_events - 1) END AS avg_gap_us
FROM agg
"""


def events_user_features_5min_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed per-user features — the batch twin of the streaming
    aggregation (same code path, exact distinct in batch)."""
    from cass_cdc_pg_spark.operators.features import user_features_windowed

    return user_features_windowed(_ev(spark, sf_dir), "5 minutes")


USER_FEATURES_5MIN_SQL = """
WITH ev AS (SELECT user_id, event_type, value, epoch_us(ts) AS ts_us FROM events)
SELECT (ts_us // 300000000) * 300000000 AS window_start_us,
       user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS total_value_micros,
       MIN(ts_us) AS first_ts_us,
       MAX(ts_us) AS last_ts_us
FROM ev GROUP BY 1, 2
"""


def events_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel conversion per user — sequential event
    analytics in ONE shuffle (range-frame running-min window + an
    aggregate that reuses the window's partitioning)."""
    from cass_cdc_pg_spark.operators.features import funnel_conversion

    return funnel_conversion(_ev(spark, sf_dir))


FUNNEL_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
s AS (SELECT user_id, MIN(ts_us) AS signup_ts_us
      FROM e WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT e.user_id, MIN(e.ts_us) AS first_purchase_ts_us
      FROM e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts_us >= s.signup_ts_us
      GROUP BY 1)
SELECT s.user_id, s.signup_ts_us, p.first_purchase_ts_us,
       CAST(p.first_purchase_ts_us IS NOT NULL AS INT) AS converted,
       (p.first_purchase_ts_us - s.signup_ts_us) // 1000000 AS secs_to_convert
FROM s LEFT JOIN p ON s.user_id = p.user_id
"""


def users_retention_cohorts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (first-activity day × active-day
    offset × distinct users) — two text-free shuffles."""
    from cass_cdc_pg_spark.operators.features import retention_cohorts

    return retention_cohorts(_ev(spark, sf_dir))


RETENTION_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1),
d AS (SELECT DISTINCT e.user_id, f.cohort_day, e.day - f.cohort_day AS day_offset
      FROM e JOIN f USING (user_id))
SELECT cohort_day, day_offset, CAST(COUNT(*) AS BIGINT) AS n_users
FROM d GROUP BY 1, 2
"""


def events_anomaly_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 3σ value-anomaly rollup with bit-deterministic
    distributed statistics (exact integer/decimal accumulation; the
    only float math is a fixed correctly-rounded expression over
    exact totals)."""
    from cass_cdc_pg_spark.operators.features import value_anomaly_stats

    return value_anomaly_stats(_ev(spark, sf_dir))


ANOMALY_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v_mu
  FROM events),
agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         SUM(v_mu) AS s, SUM(CAST(v_mu * v_mu AS DECIMAL(38,0))) AS q
  FROM e GROUP BY 1),
stats AS (
  SELECT event_type, n_events,
         CAST(s // n_events AS BIGINT) AS mean_value_micros,
         (CAST(s AS DOUBLE) + 3.0 * SQRT(GREATEST(CAST(0 AS DOUBLE),
            (CAST(n_events AS DOUBLE) * CAST(q AS DOUBLE)
             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
            / CAST(n_events AS DOUBLE))))
         / CAST(n_events AS DOUBLE) AS threshold_micros
  FROM agg),
flagged AS (
  SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_anomalies
  FROM e JOIN stats USING (event_type)
  WHERE CAST(e.v_mu AS DOUBLE) > stats.threshold_micros
  GROUP BY 1)
SELECT s.event_type, s.n_events, s.mean_value_micros, s.threshold_micros,
       CAST(COALESCE(f.n_anomalies, 0) AS BIGINT) AS n_anomalies
FROM stats s LEFT JOIN flagged f ON s.event_type = f.event_type
"""


def events_type_transitions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (the Markov-chain edge
    list behavioral models train on): for each consecutive event pair
    in a user's timeline, count (prev_type → next_type).

    ONE shuffle: the lag window partitions by user and orders by
    (ts, event_id) — a total order, so ties cannot reorder between
    engines — and the global (prev,next) rollup aggregates partially
    map-side before its tiny Exchange."""
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


TRANSITIONS_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
p AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS prev_type,
         event_type AS next_type
  FROM e)
SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM p WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


def events_moving_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 5-event moving average and step delta — the rolling
    smoothing/differencing pass of time-series feature extraction
    (reference analog: the verification sampler's per-user recent
    windows, `scripts/benchmark.py:293-450`).

    One shuffle: both window functions share the same
    (user_id)/(ts_us, event_id) partition/order spec, so Spark plans a
    single Exchange + Sort and evaluates both frames in one Window
    node.  Values go through the exact integer-micros path (the
    ANOMALY_SQL convention): the sliding SUM aggregates BIGINTs, which
    is associative-exact, so DuckDB's segment-tree window evaluation
    and Spark's frame-order evaluation agree bit-for-bit; the single
    double division happens once per row after the exact sums."""
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir)
    v_mu = F.col("value").cast("decimal(18,6)") * 1000000
    base = ev.select(
        "event_id",
        "user_id",
        "ts_us",
        v_mu.cast("bigint").alias("_v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wf = w.rowsBetween(-4, 0)
    return base.select(
        "event_id",
        "user_id",
        "ts_us",
        F.round(
            F.sum("_v").over(wf).cast("double")
            / F.count(F.lit(1)).over(wf).cast("double"),
            4,
        ).alias("moving_avg_micros"),
        (F.col("_v") - F.lag("_v").over(w)).alias("delta_micros"),
    )


MOVING_STATS_SQL = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v_mu
  FROM events)
SELECT event_id, user_id, ts_us,
       ROUND(CAST(SUM(v_mu) OVER w AS DOUBLE)
             / CAST(COUNT(*) OVER w AS DOUBLE), 4) AS moving_avg_micros,
       v_mu - LAG(v_mu) OVER (PARTITION BY user_id
                              ORDER BY ts_us, event_id) AS delta_micros
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


def events_props_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type profile of the semi-structured ``props`` JSON payload
    (the reference replicates Cassandra JSON columns through the same
    typed-extract contract — `src/transforms/type_conversion`, SC-002).

    ``get_json_object`` runs JVM-side inside the scan projection — no
    Python, no second pass — and the rollup is a standard two-phase
    aggregate; COUNT(DISTINCT) adds the usual expand+reshuffle, both
    map-side partialed.  Sums are exact BIGINT so the one double
    division per group is deterministic."""
    ev = src.load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("_k").cast("long").alias("sum_k"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
            F.countDistinct("_k").cast("long").alias("n_distinct_k"),
        )
        .select(
            "event_type",
            "n_events",
            "sum_k",
            F.round(
                F.col("sum_k").cast("double") / F.col("n_events").cast("double"), 4
            ).alias("avg_k"),
            "min_k",
            "max_k",
            "n_distinct_k",
        )
    )


PROPS_STATS_SQL = """
WITH e AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       ROUND(CAST(SUM(k) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS avg_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
FROM e GROUP BY 1
"""


def events_cube_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event counts over CUBE(event_type, epoch-hour) — every
    grouping-set combination (cell, per-type, per-hour, grand total)
    in one pass; the other half of the GROUPING SETS surface next to
    ``sales_rollup_totals``'s ROLLUP.

    The hour bucket is integer division of ``ts_us`` (``DIV``) —
    timezone-free and identical in both engines.  Spark expands the
    four grouping sets before the partial aggregate, so the Exchange
    carries one row per (set, key) per partition, not four scans."""
    ev = _ev(spark, sf_dir)
    return (
        ev.select("event_type", F.expr("ts_us DIV 3600000000").alias("hr"))
        .cube("event_type", "hr")
        .agg(
            F.grouping_id().cast("int").alias("lvl"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


CUBE_COUNTS_SQL = """
WITH e AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr FROM events)
SELECT event_type, hr,
       CAST(GROUPING(event_type, hr) AS INT) AS lvl,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM e GROUP BY CUBE (event_type, hr)
"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_type_pivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-cohort × event-type contingency table via ``pivot`` — the
    wide-format crosstab fed to per-cohort behavior dashboards.

    Pivot values are pinned, and the pivot lowers to conditional
    aggregates (count-if per pinned value) rather than DataFrame
    ``.pivot()`` — Spark's pivot operator plans a two-level aggregate
    (an extra Exchange on (cohort, event_type)) even with pinned
    values, while this lowering is ONE partial-aggregated shuffle on
    the cohort key: the physical shape the oracle's FILTER
    formulation describes, and the one you'd want when the fact table
    is 100 TB and the pivoted dimension is an enum."""
    ev = src.load_table(spark, sf_dir, "events")
    counts = [
        F.count(F.when(F.col("event_type") == t, F.lit(1)))
        .cast("long")
        .alias(t)
        for t in _EVENT_TYPES
    ]
    return (
        ev.select((F.col("user_id") % 10).alias("cohort"), "event_type")
        .groupBy("cohort")
        .agg(*counts, F.count(F.lit(1)).cast("long").alias("n_total"))
    )


TYPE_PIVOT_SQL = """
SELECT user_id % 10 AS cohort,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view,
       CAST(COUNT(*) AS BIGINT) AS n_total
FROM events GROUP BY 1
"""


def events_daily_active_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users — the canonical engagement gauge: per UTC
    day, event count and EXACT distinct users.

    The day bucket is integer division of ``ts_us`` (timezone-free,
    identical in both engines).  Spark plans the single exact distinct
    as a two-phase aggregate — partial dedup on (day, user) map-side,
    one shuffle keyed by day+user, then the per-day rollup — no
    Expand (that only appears with MULTIPLE distinct aggregates; the
    plain count rides along as a non-distinct partial).  At 100 TB
    the shuffle carries one row per (day, user-seen-that-day) per map
    task; for dashboards where ±2% suffices, swap to
    ``approx_count_distinct`` (HLL) and the shuffle drops to one
    sketch per day per task — the exact form stays as the
    reconciliation twin (pinned within 5% by pytest)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.select(
            F.expr("ts_us DIV 86400000000").alias("day_no"), "user_id"
        )
        .groupBy("day_no")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_active_users"),
        )
    )


DAILY_ACTIVE_SQL = """
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day_no, user_id FROM events)
SELECT day_no,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users
FROM e GROUP BY 1
"""


def events_key_skew_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest user keys with share-of-total — the
    ``operators/skew.key_skew_profile`` diagnostic as a declared,
    oracle-checked query: the number you read before choosing
    broadcast vs AQE vs salting for any user-keyed join/agg.

    One partial-aggregated shuffle on user_id; the share divides by a
    window total over the AGGREGATED rows (no second scan of events);
    the top-10 cut is a ``TakeOrderedAndProject`` with user_id
    tiebreak, deterministic in both engines."""
    from cass_cdc_pg_spark.operators.skew import key_skew_profile

    ev = src.load_table(spark, sf_dir, "events")
    return key_skew_profile(ev.select("user_id"), ["user_id"], top=10)


KEY_SKEW_SQL = """
WITH counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY 1)
SELECT user_id, n_rows,
       ROUND(CAST(n_rows AS DOUBLE)
             / CAST(SUM(n_rows) OVER () AS DOUBLE), 6) AS share
FROM counts
ORDER BY n_rows DESC, user_id
LIMIT 10
"""


def events_gap_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event think-time per event type: for every event, the gap
    to the SAME USER's previous event (any type), rolled up by the
    current event's type — the arrival-process profile behind session
    gap tuning.

    The lag window is PARTITIONED by user (state = one row per user
    per task — scale-safe, unlike the unpartitioned windows r7
    removed), the (ts, event_id) order is total so both engines pick
    identical predecessors, and the rollup is exact integer µs."""
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir).select("user_id", "event_type", "ts_us", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    return (
        ev.select("event_type", gap.alias("_gap"))
        .filter(F.col("_gap").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("_gap").cast("long").alias("total_gap_us"),
            F.min("_gap").cast("long").alias("min_gap_us"),
            F.max("_gap").cast("long").alias("max_gap_us"),
        )
    )


GAP_STATS_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
g AS (
  SELECT event_type,
         ts_us - LAG(ts_us) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS gap
  FROM e)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(gap) AS BIGINT) AS total_gap_us,
       CAST(MIN(gap) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap) AS BIGINT) AS max_gap_us
FROM g WHERE gap IS NOT NULL
GROUP BY 1
"""


def events_robust_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) daily outlier gauge per (event_type, day):
    exact median and exact median-absolute-deviation via explicit
    rank selection — each engine picks the SAME one or two stored
    doubles per group and does one add + one halving, so the
    statistics are bit-identical by construction (no percentile UDAF
    interpolation formulas to reconcile across engines).  Outliers
    are |value − median| > 3·MAD.

    Scale shape: every Exchange in the plan keys on the SAME
    (event_type, day_no) — the relation is never re-keyed — and the
    rank-window subtree referenced by both the median pick and the
    deviation pass is physically shared at runtime (AQE plans a
    ReusedExchange for the duplicate, so the events scan shuffles
    once); the only other fact movement is the MAD re-sort of the
    deviations on the same key.  Pinned by
    ``test_robust_outliers_one_key_reused_shuffle``.  The group key
    is high-cardinality (types × days), so per-group sorts
    parallelize.  The 3σ twin is ``events_anomaly_stats``; this is
    the heavy-tail-safe variant a monitoring pipeline runs next to
    it."""
    ev = _ev(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.expr("ts_us DIV 86400000000").alias("day_no"),
        "value",
    )
    grp = ["event_type", "day_no"]
    wrk = Window.partitionBy(*grp).orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    wn = Window.partitionBy(*grp)
    ranked = ev.withColumn("rn", F.row_number().over(wrk)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    med = (
        ranked.filter(
            (F.col("rn") == F.expr("(n + 1) DIV 2"))
            | (F.col("rn") == F.expr("(n + 2) DIV 2"))
        )
        .groupBy(*grp)
        .agg((F.sum("value") / F.count(F.lit(1))).alias("median"))
    )
    dev = (
        ranked.select("event_id", *grp, "value")
        .join(med, grp)
        .select(
            "event_id",
            *grp,
            "value",
            F.abs(F.col("value") - F.col("median")).alias("dev"),
            "median",
        )
    )
    wdk = Window.partitionBy(*grp).orderBy(
        F.col("dev").asc(), F.col("event_id").asc()
    )
    dranked = dev.withColumn("rn", F.row_number().over(wdk)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    mad = (
        dranked.filter(
            (F.col("rn") == F.expr("(n + 1) DIV 2"))
            | (F.col("rn") == F.expr("(n + 2) DIV 2"))
        )
        .groupBy(*grp)
        .agg((F.sum("dev") / F.count(F.lit(1))).alias("mad"))
    )
    return (
        dev.join(mad, grp)
        .groupBy(*grp)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("median").alias("median"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "day_no",
            "n_events",
            F.round("median", 6).alias("median"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n_events"), 6).alias(
                "outlier_frac"
            ),
        )
    )


ROBUST_OUTLIERS_SQL = """
WITH e AS (
  SELECT event_id, event_type, epoch_us(ts) // 86400000000 AS day_no, value
  FROM events),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, day_no
                               ORDER BY value ASC, event_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, day_no) AS n
  FROM e),
med AS (
  SELECT event_type, day_no, SUM(value) / COUNT(*) AS median
  FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY 1, 2),
d AS (
  SELECT e.event_id, e.event_type, e.day_no, e.value,
         ABS(e.value - m.median) AS dev, m.median
  FROM e JOIN med m USING (event_type, day_no)),
dr AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, day_no
                               ORDER BY dev ASC, event_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, day_no) AS n
  FROM d),
mad AS (
  SELECT event_type, day_no, SUM(dev) / COUNT(*) AS mad
  FROM dr WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY 1, 2)
SELECT d.event_type, d.day_no,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(MIN(d.median), 6) AS median,
       ROUND(MIN(mad.mad), 6) AS mad,
       CAST(SUM(CASE WHEN d.dev > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers,
       ROUND(CAST(SUM(CASE WHEN d.dev > 3 * mad.mad THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS outlier_frac
FROM d JOIN mad USING (event_type, day_no)
GROUP BY 1, 2
"""


def events_weekly_active_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily vs trailing-7-day active users per day (DAU/WAU and the
    stickiness ratio) — the sliding-window COUNT DISTINCT that a naive
    per-day sum gets wrong (a user active twice in a week counts
    once).

    Scale shape: NO range join and NO window function — each distinct
    (day, user) row contributes itself to the 7 trailing windows it
    belongs to via a constant ``sequence`` explode (pure column
    algebra), and both distincts are two-phase hash aggregates on
    high-cardinality (day, user) keys with map-side partials; the
    final per-day counts are partial-aggregated to ~one row per day
    before their Exchange, and the DAU⋈WAU join moves only
    day-cardinality relations."""
    du = (
        _ev(spark, sf_dir)
        .select(
            F.expr("ts_us DIV 86400000000").alias("day_no"), "user_id"
        )
        .distinct()
    )
    dau = du.groupBy("day_no").agg(
        F.count(F.lit(1)).cast("long").alias("n_daily")
    )
    wau = (
        du.select(
            F.explode(
                F.sequence(F.col("day_no"), F.col("day_no") + F.lit(6))
            ).alias("day_no"),
            "user_id",
        )
        .distinct()
        .groupBy("day_no")
        .agg(F.count(F.lit(1)).cast("long").alias("n_weekly"))
    )
    return (
        dau.join(wau, "day_no")
        .select(
            "day_no",
            "n_daily",
            "n_weekly",
            F.round(
                F.col("n_daily").cast("double")
                / F.col("n_weekly").cast("double"),
                6,
            ).alias("dau_wau_ratio"),
        )
    )


WEEKLY_ACTIVE_SQL = """
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day_no, user_id
  FROM events),
dau AS (
  SELECT day_no, CAST(COUNT(*) AS BIGINT) AS n_daily
  FROM du GROUP BY 1),
contrib AS (
  SELECT DISTINCT day_no + i AS day_no, user_id
  FROM du, (SELECT unnest(range(0, 7)) AS i) ii),
wau AS (
  SELECT day_no, CAST(COUNT(*) AS BIGINT) AS n_weekly
  FROM contrib GROUP BY 1)
SELECT d.day_no, d.n_daily, w.n_weekly,
       ROUND(CAST(d.n_daily AS DOUBLE) / CAST(w.n_weekly AS DOUBLE), 6)
           AS dau_wau_ratio
FROM dau d JOIN wau w USING (day_no)
"""
