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


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def test_mg_candidates_contain_all_guaranteed_heavy_tokens(spark):
    """The Misra-Gries guarantee made a test: every token whose global
    count exceeds n/(capacity+1) MUST survive in the candidate union,
    even against an adversarial stream of singletons engineered to
    force constant summary evictions."""
    from cass_cdc_pg_spark.operators.sketches import heavy_hitter_candidates

    # 5 heavy tokens x200 + 5000 distinct singletons, n = 6000;
    # capacity 64 -> threshold n/65 ~ 92 < 200: h0..h4 must survive.
    df = spark.range(6000).selectExpr(
        "CASE WHEN id < 1000 THEN array(concat('h', CAST(id % 5 AS STRING))) "
        "ELSE array(concat('s', CAST(id AS STRING))) END AS tk"
    ).repartition(4)
    cands = {
        r.token
        for r in heavy_hitter_candidates(df, F.col("tk"), capacity=64).collect()
    }
    assert {f"h{i}" for i in range(5)} <= cands, sorted(cands)[:20]


def test_heavy_hitters_exact_certified_top5(spark):
    """When the certification bound holds, the sketch pipeline's
    output IS the exact global top-k: counts match a plain groupBy and
    certified=True on every row."""
    from cass_cdc_pg_spark.operators.sketches import heavy_hitters

    df = spark.range(6000).selectExpr(
        "CASE WHEN id < 1000 THEN array(concat('h', CAST(id % 5 AS STRING))) "
        "ELSE array(concat('s', CAST(id AS STRING))) END AS tk"
    ).repartition(4)
    rows = heavy_hitters(df, F.col("tk"), k=5, capacity=64).collect()
    got = {(r.token, r.n_occurrences) for r in rows}
    assert got == {(f"h{i}", 200) for i in range(5)}, got
    assert all(r.certified for r in rows), rows


def test_heavy_hitters_uniform_stream_yields_no_survivors(spark):
    """Honesty under uniformity: a uniform stream has no heavy
    hitters, and the MG compress provably evicts everything (every
    stored count equals the eviction threshold), so the pipeline
    returns an EMPTY result rather than an arbitrary unprovable
    top-k.  Note the design consequence: a token GUARANTEED to
    survive (count > n/(capacity+1)) also certifies the kth bound, so
    any undersized/lucky output can only carry certified=False — a
    full certified list is exact by construction."""
    from cass_cdc_pg_spark.operators.sketches import heavy_hitters

    df = spark.range(2000).selectExpr(
        "array(concat('t', CAST(id % 1000 AS STRING))) AS tk"
    ).repartition(4)
    rows = heavy_hitters(df, F.col("tk"), k=5, capacity=8).collect()
    assert rows == [], rows


def test_heavy_hitters_null_and_empty_arrays_ignored(spark):
    """Null token arrays and empty arrays contribute nothing — the MG
    pass must not crash on them and the totals must exclude them."""
    from cass_cdc_pg_spark.operators.sketches import heavy_hitters

    df = spark.range(100).selectExpr(
        "CASE WHEN id % 3 = 0 THEN CAST(NULL AS ARRAY<STRING>) "
        "WHEN id % 3 = 1 THEN array() "
        "ELSE array('x', 'y') END AS tk"
    )
    rows = heavy_hitters(df, F.col("tk"), k=2, capacity=16).collect()
    got = sorted((r.token, r.n_occurrences) for r in rows)
    assert got == [("x", 33), ("y", 33)], got
    assert all(r.certified for r in rows)


def test_mg_summary_skips_null_elements(spark):
    """Null ELEMENTS inside token arrays are excluded from both the
    candidate Counter and the certification denominator — pass 2's
    explode drops them, so counting them in pass 1 would inflate
    total_tokens and make certification needlessly conservative
    (r9 ADVICE)."""
    from cass_cdc_pg_spark.operators.sketches import _mg_summaries

    df = spark.range(50).selectExpr(
        "array('x', CAST(NULL AS STRING), 'y', CAST(NULL AS STRING)) AS tk"
    ).coalesce(1)
    rows = _mg_summaries(df, F.col("tk"), capacity=16).collect()
    total = [r.w for r in rows if r.token is None]
    assert total == [100], rows  # 2 live tokens x 50 rows, nulls excluded
    assert sorted(r.token for r in rows if r.token is not None) == ["x", "y"]


def test_mg_compress_stream_guarantee_property():
    """Property (no Spark): for ANY stream and ANY batch split, a
    token whose total count exceeds n/(capacity+1) survives the
    repeated update+compress cycle, and every survivor's stored count
    under-counts its true count by at most n/(capacity+1) in total —
    the Misra-Gries bound the candidate pass relies on."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cass_cdc_pg_spark.operators.sketches import mg_compress

    @settings(max_examples=200, deadline=None)
    @given(
        stream=st.lists(st.integers(min_value=0, max_value=30), max_size=300),
        capacity=st.integers(min_value=1, max_value=12),
        splits=st.lists(st.integers(min_value=1, max_value=50), max_size=20),
    )
    def run(stream, capacity, splits):
        truth = Counter(stream)
        n = len(stream)
        counts: Counter = Counter()
        i = 0
        for w in splits + [len(stream)]:
            batch = stream[i : i + w]
            i += w
            counts.update(batch)
            counts = mg_compress(counts, capacity)
        bound = n / (capacity + 1)
        for tok, true_count in truth.items():
            if true_count > bound:
                assert tok in counts, (tok, true_count, bound, counts)
            if tok in counts:
                assert counts[tok] <= true_count
                assert true_count - counts[tok] <= bound + 1e-9
        assert len(counts) <= capacity

    run()


def test_heavy_hitters_undersized_candidate_set_never_certifies(spark):
    """Certification hole closed (r9 review): when the candidate set
    is SMALLER than k, the missing ranks could legitimately be held
    by tokens evicted in every partition, so the (short) output must
    carry certified=False — even though the kth bound over the short
    list alone would pass."""
    from cass_cdc_pg_spark.operators.sketches import heavy_hitters

    # 2 heavy tokens x1000 + 60 distinct singletons, capacity 8:
    # singletons all evict, candidates = {h0, h1} (< k = 5); the true
    # top-5 contains 3 singletons the sketch cannot see.
    df = spark.range(2060).selectExpr(
        "CASE WHEN id < 2000 THEN array(concat('h', CAST(id % 2 AS STRING))) "
        "ELSE array(concat('s', CAST(id AS STRING))) END AS tk"
    ).repartition(4)
    rows = heavy_hitters(df, F.col("tk"), k=5, capacity=8).collect()
    assert 0 < len(rows) < 5, rows
    assert {r.token for r in rows} == {"h0", "h1"}, rows
    assert all(not r.certified for r in rows), rows


def test_mg_summary_bounded_within_one_arrow_batch(spark):
    """The per-ROW compress trigger (r9 review): a single huge token
    array — one row, one Arrow batch — must not grow the in-flight
    summary past 4x capacity.  Before the fix the compress ran only
    per batch, so one long document could materialize its whole
    dictionary in the Python worker."""
    from collections import Counter

    from cass_cdc_pg_spark.operators.sketches import mg_compress

    # pure-python replica of the generator's loop invariant
    capacity, limit = 16, 64
    counts: Counter = Counter()
    peak = 0
    for i in range(10_000):
        counts.update([f"t{i}"])
        peak = max(peak, len(counts))
        if len(counts) >= limit:
            counts = mg_compress(counts, capacity)
    assert peak <= limit, peak
    assert len(counts) <= limit


# ---------------------------------------------------------------------------
# co-purchase heavy-hitter sketch (r16): deterministic basket sampling
# ---------------------------------------------------------------------------


def _heavy_hitter_lineitem(spark):
    """Synthetic baskets with planted heavy pairs: parts (1, 2) ride
    together in 300 orders and (3, 4) in 200, over a 1500-order noise
    floor of rotating singleton pairs (each noise pair co-occurs in
    ≤2 orders).  Order keys stride by 7 so the multiplicative draw
    sees a scattered key population, like real orderkeys."""
    rows = []
    for i in range(300):
        ok = 7 * i
        rows += [(ok, 1), (ok, 2)]
    for i in range(200):
        ok = 7 * (300 + i)
        rows += [(ok, 3), (ok, 4)]
    for i in range(1500):
        ok = 7 * (500 + i)
        rows += [(ok, 100 + i % 750), (ok, 2000 + i % 750)]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_copurchase_sketch_exact_at_full_rate(spark):
    """t = MOD keeps every basket: the sketch IS the exact ranking
    with est_n_orders == n_sampled — the no-op-guard regime the gate
    fixtures run in, asserted rather than assumed."""
    from cass_cdc_pg_spark.registry_sales import (
        _COPURCHASE_SAMPLE_MOD,
        _copurchase_pair_counts,
        _copurchase_sketch,
    )

    li = _heavy_hitter_lineitem(spark)
    sk = _copurchase_sketch(li, _COPURCHASE_SAMPLE_MOD, 10).collect()
    exact = (
        _copurchase_pair_counts(li, "n_orders")
        .orderBy(F.col("n_orders").desc(), "p1", "p2")
        .limit(10)
        .collect()
    )
    assert [(r["p1"], r["p2"], r["n_sampled"]) for r in sk] == [
        (r["p1"], r["p2"], r["n_orders"]) for r in exact
    ]
    assert all(r["est_n_orders"] == r["n_sampled"] for r in sk)


def test_copurchase_sketch_contains_heavy_hitters_under_sampling(spark):
    """The verdict-prescribed error-bound pin: at a forced ~1/8
    sampling rate the exact top-2 heavy pairs (counts 300 and 200 —
    the rows a heavy-hitter query exists to surface) appear in the
    sketch's top-K, and their scale-back estimates land within 50% of
    truth (Binomial concentration at these counts; the draw is
    deterministic so this is a fixed arithmetic fact, not a flaky
    sample)."""
    from cass_cdc_pg_spark.registry_sales import _copurchase_sketch

    li = _heavy_hitter_lineitem(spark)
    t = 1250  # ~1/8 of the 10000 modulus
    sk = _copurchase_sketch(li, t, 50).collect()
    got = {(r["p1"], r["p2"]): r for r in sk}
    assert (1, 2) in got and (3, 4) in got
    # sampled ranking puts the two planted pairs at the top
    top2 = {(r["p1"], r["p2"]) for r in sk[:2]}
    assert top2 == {(1, 2), (3, 4)}
    for pair, truth in [((1, 2), 300), ((3, 4), 200)]:
        est = got[pair]["est_n_orders"]
        assert abs(est - truth) <= 0.5 * truth, (pair, est, truth)


def test_copurchase_sketch_estimator_integer_scaleback(spark):
    """est_n_orders is the exact integer n_sampled * MOD DIV t on
    every row — the cross-engine-identical arithmetic the oracle
    mirrors."""
    from cass_cdc_pg_spark.registry_sales import (
        _COPURCHASE_SAMPLE_MOD,
        _copurchase_sketch,
    )

    li = _heavy_hitter_lineitem(spark)
    t = 1250
    for r in _copurchase_sketch(li, t, 50).collect():
        assert r["est_n_orders"] == r["n_sampled"] * _COPURCHASE_SAMPLE_MOD // t
