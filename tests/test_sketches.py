"""Mergeable HLL distinct sketches: accuracy vs exact, range-union
answers without fact re-scans, rollup associativity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cass_cdc_pg_spark.operators.sketches import (
    distinct_over,
    distinct_sketches,
    rollup_sketches,
)


def _events(spark, n=50_000, days=30, users=4000):
    return spark.range(n).selectExpr(
        f"CAST(id % {days} AS INT) AS day",
        # deterministic, overlapping user sets across days
        f"(id * 48271) % {users} AS user_id",
    )


def test_sketch_estimate_close_to_exact(spark):
    ev = _events(spark)
    sk = distinct_sketches(ev, F.col("day"), "user_id", bucket_name="day")
    rows = sk.collect()
    assert len(rows) == 30
    # per-bucket estimate within 5% of the exact distinct it carries
    for r in rows:
        est = (
            sk.filter(F.col("day") == r["day"])
            .select(F.hll_sketch_estimate("sketch").alias("e"))
            .first()["e"]
        )
        assert abs(est - r["exact_distinct"]) <= max(1, 0.05 * r["exact_distinct"])


def test_range_union_matches_exact_within_tolerance(spark):
    ev = _events(spark)
    sk = distinct_sketches(ev, F.col("day"), "user_id", bucket_name="day")
    got = distinct_over(sk, F.col("day") < 10).first()
    exact = (
        ev.filter(F.col("day") < 10).select("user_id").distinct().count()
    )
    assert got["n_buckets"] == 10
    assert abs(got["distinct_estimate"] - exact) <= max(1, 0.05 * exact)


def test_rollup_union_is_associative(spark):
    """days → weeks → total must estimate the same as days → total:
    sketch union is associative, so the hierarchy introduces no extra
    error."""
    ev = _events(spark)
    days = distinct_sketches(ev, F.col("day"), "user_id", bucket_name="day")
    weeks = rollup_sketches(
        days, (F.col("day") / 7).cast("int"), bucket_name="week"
    )
    via_days = distinct_over(days).first()["distinct_estimate"]
    via_weeks = distinct_over(weeks).first()["distinct_estimate"]
    assert via_days == via_weeks


def test_sketch_plan_partial_aggregates_and_stays_jvm(spark):
    ev = _events(spark)
    sk = distinct_sketches(ev, F.col("day"), "user_id", bucket_name="day")
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "partial_hll_sketch_agg" in plan, plan
    assert "EvalPython" not in plan, plan
