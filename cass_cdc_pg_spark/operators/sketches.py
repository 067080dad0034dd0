"""Mergeable distinct-count sketches — the pre-aggregation pattern
that makes COUNT(DISTINCT) over arbitrary ranges O(buckets) at 100 TB.

Exact distinct over a chosen time range needs a full scan of that
range per question.  The sketch table inverts the cost: ONE pass
builds a per-bucket (e.g. per-day) HLL sketch column (Spark's
built-in Apache DataSketches HllSketch — JVM-side, mergeable,
~1-2% error at default lgK=12), and any later "distinct users between
X and Y" unions the covered buckets' sketches — reading B tiny binary
rows instead of re-scanning the fact table.  Unions are associative
and idempotent, so rollups compose (days → months → years) and
re-merges are safe.

Caveat (documented, inherent): sketches are insert-only — they cannot
retract, so a sketch table over a CDC stream answers "distinct ever
inserted", not "distinct currently live".  The exact batch query is
the reconciler, same stance as the windowed features' HLL mode.

Reference analog: the reference's dashboards recompute distincts per
request from Postgres (`src/api/routes/*`); a 100 TB deployment
pre-aggregates exactly like this.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    bucket: Column,
    value_col: str,
    bucket_name: str = "bucket",
    lg_k: int = 12,
) -> DataFrame:
    """One row per *bucket*: a mergeable HLL sketch of *value_col*
    plus the exact per-bucket distinct for audit.  One
    partial-aggregated shuffle; the sketch column is ~2^lg_k bytes
    max, independent of row count."""
    return (
        df.select(bucket.alias(bucket_name), F.col(value_col).alias("_v"))
        .groupBy(bucket_name)
        .agg(
            F.hll_sketch_agg("_v", F.lit(lg_k)).alias("sketch"),
            F.count_distinct(F.col("_v")).alias("exact_distinct"),
        )
    )


def distinct_over(
    sketches: DataFrame,
    predicate: Column | None = None,
) -> DataFrame:
    """Distinct estimate for the union of every bucket matching
    *predicate* (all buckets when None): reads only the sketch rows,
    never the fact table.  Returns one row
    (n_buckets, distinct_estimate)."""
    s = sketches if predicate is None else sketches.filter(predicate)
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("long")
        .alias("distinct_estimate"),
    )


def rollup_sketches(
    sketches: DataFrame,
    coarser: Column,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Fold fine buckets into coarser ones (days → months) by sketch
    union — no fact-table access, associativity makes the hierarchy
    exact-in-sketch (the month sketch IS the union of its days)."""
    return (
        sketches.select(coarser.alias(bucket_name), "sketch")
        .groupBy(bucket_name)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )
