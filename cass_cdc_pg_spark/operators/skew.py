"""Skew mitigation: salted joins and salted aggregation.

At 100 TB the failure mode of a shuffle join or groupBy is not total
volume — it is ONE key (the null user, the default tenant, the
heartbeat event type) owning 10% of the rows, so one reducer runs for
hours while 999 executors idle.  Spark's first two answers are
broadcast (kills the shuffle entirely — used throughout this repo)
and AQE skew-join splitting (`spark.sql.adaptive.skewJoin.*`, on by
default in `session.configure`), which splits oversized partitions of
a sort-merge join at runtime.  AQE does NOT help when the skewed side
must build a hash relation, when the skew is in an AGGREGATION, or in
streaming microbatches (no AQE).  These operators are the explicit
fallback for those cases — the same salting the reference's Kafka
layer gets from partition-count tuning (`plan.md:840-849` routes hot
tables to 8-16 partitions for exactly this reason).

Both transformations are result-identical to their unsalted forms —
pinned by tests/test_skew.py — so callers trade shuffle-row
replication (xN on the small/replicated side) for an upper bound of
(hot-key rows / n_salts) per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where *left* is large and skewed on *on* and *right*
    is too big to broadcast but far smaller than left.

    left rows scatter uniformly over ``n_salts`` sub-keys; every right
    row replicates to ALL salts (explode of a compile-time literal
    array — a map-side projection, no extra job or shuffle).  The join
    key becomes (*on*, salt), so a key holding K rows shuffles into
    ceil(K / n_salts)-row slices instead of one K-row reducer.

    The salt value never affects the result — any left row meets every
    replica of its matching right rows exactly once per salt value it
    carries — so a nondeterministic-per-retry salt is safe here (only
    placement changes on retry, not the join output).  Supported hows:
    inner / left (right-side multiplicity is preserved because each
    right row appears once per salt, and each left row carries exactly
    one salt).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    l = left.withColumn(
        _SALT, (F.rand(seed=0) * n_salts).cast("int") % n_salts
    )
    r = right.withColumn(_SALT, F.explode(salts))
    out = l.join(r, [*on, _SALT], how)
    return out.drop(_SALT)


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
    merge: dict[str, object] | None = None,
) -> DataFrame:
    """Two-level aggregation for skewed groupBy keys, for aggregates
    with an associative merge.  ``aggs`` maps output name → the
    level-1 expression (evaluated per (key, salt)); ``merge`` maps
    name → the level-2 re-aggregator as a function of the column name
    (default ``F.sum`` — correct for sums, and for counts expressed
    as ``F.count(...)`` at level 1, since merging counts IS a sum;
    pass ``F.min`` / ``F.max`` for those).

    Level 1 groups by (*keys*, salt) — the hot key's rows split over
    n_salts reducers; level 2 merges the ≤ n_salts partial rows per
    key.  This matters DESPITE Spark's map-side partial aggregation:
    partials still converge on one reducer per key, and when the hot
    key dominates (or the hash aggregate falls back to sort-based),
    that single reducer is the bottleneck salting removes.
    """
    merge = merge or {}
    salted = df.withColumn(
        _SALT, (F.rand(seed=0) * n_salts).cast("int") % n_salts
    )
    partial = salted.groupBy(*keys, _SALT).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.get(name, F.sum)(name).alias(name) for name in aggs]
    )


def auto_salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    sample_fraction: float = 0.01,
    hot_share: float = 0.05,
    seed: int = 0,
    how: str = "inner",
    stats: dict | None = None,
) -> DataFrame:
    """Salt only when it pays: profile a SAMPLE of *left*'s join keys
    (one cheap pass over ~``sample_fraction`` of the rows, seeded —
    deterministic per data layout) and apply :func:`salted_join` only
    if the heaviest sampled key owns at least ``hot_share`` of the
    sampled rows; otherwise join plain and skip the ×``n_salts``
    right-side replication entirely.

    This is the decision a planner would make from statistics, made
    explicit: salting uniform data WASTES shuffle volume (every right
    row replicated n_salts times for no reducer relief), while not
    salting a 10%-hot key leaves one reducer running for hours at
    100 TB.  The result is identical either way (both branches pinned
    result-identical by tests/test_skew.py); ``stats["salted"]``
    reports the decision and ``stats["hot_share"]`` the measured
    share, so operators can log why."""
    prof = key_skew_profile(
        left.sample(fraction=sample_fraction, seed=seed), on, top=1
    ).collect()
    share = float(prof[0]["share"]) if prof else 0.0
    salted = share >= hot_share
    if stats is not None:
        stats["salted"] = salted
        stats["hot_share"] = share
        if prof:
            stats["hot_key"] = tuple(prof[0][k] for k in on)
    if salted:
        return salted_join(left, right, on, n_salts=n_salts, how=how)
    return left.join(right, on, how)


def key_skew_profile(df: DataFrame, keys: list[str], top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts with share-of-total for the
    heaviest *top* keys — the number you look at before choosing
    broadcast vs AQE vs salting.

    One partial-aggregated shuffle for the per-key counts; the total
    is a SCALAR aggregate over those counts, broadcast back as a
    one-row join.  The two branches share the same groupBy subtree, so
    exchange reuse runs the count shuffle once — the total costs one
    tiny extra job over already-shuffled partials, never a second
    scan.  The previous form (``F.sum over Window.partitionBy()``)
    funnelled every distinct key through ONE task — at 100× with
    1e7-1e8 distinct keys, a single-task sort inside the very operator
    meant to diagnose skew.  The top-k finish is
    ``TakeOrderedAndProject`` (per-partition heap + driver merge), not
    a global sort."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            F.round(
                F.col("n_rows").cast("double")
                / F.col("__total").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(top)
    )
