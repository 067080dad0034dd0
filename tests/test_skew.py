"""Skew toolkit: salted forms must be result-identical to the plain
forms, and the plans must show the salt doing its job (join key
extended with the salt; right side replicated map-side, no extra
shuffle or job for the replication)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cass_cdc_pg_spark.operators.skew import (
    key_skew_profile,
    salted_aggregate,
    salted_join,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _skewed(spark, n=20_000):
    # ~half the rows land on key 0 — the hot-key shape
    return spark.range(n).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 0 ELSE id % 50 END AS k",
        "id AS v",
    )


def test_salted_inner_join_matches_plain(spark):
    left = _skewed(spark)
    right = spark.range(50).selectExpr("id AS k", "id * 100 AS r")
    plain = left.join(right, ["k"], "inner").selectExpr("k", "v", "r")
    salted = salted_join(left, right, ["k"], n_salts=8).selectExpr(
        "k", "v", "r"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_left_join_preserves_unmatched(spark):
    left = spark.range(100).selectExpr("id % 7 AS k", "id AS v")
    right = spark.range(3).selectExpr("id AS k", "id * 10 AS r")
    plain = left.join(right, ["k"], "left").selectExpr("k", "v", "r")
    salted = salted_join(left, right, ["k"], n_salts=4, how="left").selectExpr(
        "k", "v", "r"
    )
    assert sorted(
        map(tuple, salted.fillna(-1).collect())
    ) == sorted(map(tuple, plain.fillna(-1).collect()))


def test_salted_join_key_includes_salt_no_extra_shuffle(spark):
    left = _skewed(spark)
    right = spark.range(50).selectExpr("id AS k", "id * 100 AS r")
    plan = _plan(salted_join(left, right, ["k"], n_salts=8))
    # the join condition must carry the salt column...
    assert "__salt" in plan, plan
    # ...and the replication side is a Generate (explode) projection,
    # not a join against a salts relation
    assert "Generate explode" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.n, r.total, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.n, r.total, r.mx)
        for r in salted_aggregate(
            df,
            ["k"],
            {
                "n": F.count(F.lit(1)),
                "total": F.sum("v"),
                "mx": F.max("v"),
            },
            n_salts=8,
            merge={"mx": F.max},
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_two_level_plan(spark):
    df = _skewed(spark)
    plan = _plan(
        salted_aggregate(df, ["k"], {"n": F.count(F.lit(1))}, n_salts=8)
    )
    # two hash-partitioned Exchanges: (k, salt) then (k)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "__salt" in plan, plan


def test_key_skew_profile_finds_hot_key(spark):
    prof = key_skew_profile(_skewed(spark), ["k"], top=3).collect()
    assert prof[0].k == 0
    assert prof[0].share > 0.4
    plan = _plan(key_skew_profile(_skewed(spark), ["k"], top=3))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan  # share total is a scalar agg, not a window


def test_auto_salted_join_salts_hot_keys_and_matches_plain(spark):
    from cass_cdc_pg_spark.operators.skew import auto_salted_join

    left = _skewed(spark)  # key 0 owns ~half the rows
    right = spark.range(50).selectExpr("id AS k", "concat('n', id) AS name")
    stats = {}
    out = auto_salted_join(left, right, ["k"], sample_fraction=0.2,
                           stats=stats)
    assert stats["salted"] is True
    assert stats["hot_share"] > 0.3
    assert stats["hot_key"] == (0,)
    plain = left.join(right, ["k"]).groupBy("k").count()
    got = out.groupBy("k").count()
    assert {(r.k, r["count"]) for r in got.collect()} == \
        {(r.k, r["count"]) for r in plain.collect()}
    assert "__salt" in _plan(out)


def test_auto_salted_join_skips_salting_uniform_keys(spark):
    from cass_cdc_pg_spark.operators.skew import auto_salted_join

    left = spark.range(20_000).selectExpr("id % 1000 AS k", "id AS v")
    right = spark.range(1000).selectExpr("id AS k", "concat('n', id) AS name")
    stats = {}
    out = auto_salted_join(left, right, ["k"], sample_fraction=0.2,
                           stats=stats)
    assert stats["salted"] is False  # ~0.1% per key: salting would waste
    assert "__salt" not in _plan(out)
    assert out.count() == 20_000
