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


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters — bounded-memory top-k over huge key spaces
# ---------------------------------------------------------------------------


def heavy_hitter_candidates(
    df: DataFrame, arr: Column, capacity: int = 4096
) -> DataFrame:
    """Per-partition Misra-Gries candidate summaries over an
    ``array<string>`` column — the bounded-memory half of exact top-k
    when the key space is too large to hash-aggregate.

    A plain ``groupBy(token)`` over 100 TB shuffles the FULL term
    dictionary (billions of distinct keys); this pass instead keeps a
    Misra-Gries summary of at most *capacity* tokens per partition and
    emits only the surviving candidate keys — the shuffle-side volume
    is ``capacity × partitions`` rows, independent of corpus size.

    Guarantee (mergeable-summaries form, Agarwal et al. 2012): each
    per-partition summary under-counts any token by at most
    ``n_p / (capacity+1)``; a token whose GLOBAL count exceeds
    ``n / (capacity+1)`` must survive in at least one partition
    (pigeonhole over the per-partition bound), so the union of
    candidates contains every such token.  The compress step (subtract
    the (capacity+1)-th largest stored count, drop non-positives) runs
    whenever the summary reaches 4×capacity keys — checked per ROW,
    not per Arrow batch, because a single 10k-row batch of long
    documents can otherwise push ~10^8 distinct keys into the Python
    dict before the first compress and OOM the very memory this
    function exists to bound.  The check is an O(1) ``len()``; the
    hot loop stays C-speed ``Counter.update`` per token array, and
    each compress amortizes over the ≥3×capacity fresh keys that
    triggered it.

    Reference analog: the reference profiles term frequency via a full
    Postgres GROUP BY (`src/api/routes` dashboards); at 100 TB the
    sketch pass is the only way the dictionary never materializes.
    """
    return _mg_summaries(df, arr, capacity).filter(
        F.col("token").isNotNull()
    ).select("token")


def _mg_summaries(df: DataFrame, arr: Column, capacity: int) -> DataFrame:
    """One corpus pass emitting, per partition, the MG candidate
    tokens PLUS one ``token IS NULL`` row whose ``w`` is the
    partition's total token count — so :func:`heavy_hitters` gets its
    certification denominator from the SAME scan instead of a third
    read of the corpus."""
    import pandas as pd

    src_df = df.select(arr.alias("tk"))
    limit = 4 * capacity

    def mg(batches):
        from collections import Counter

        counts: Counter = Counter()
        total = 0
        for pdf in batches:
            for toks in pdf["tk"]:
                if toks is not None:
                    counts.update(toks)
                    # Drop null ELEMENTS: pass 2's explode drops them,
                    # so counting them here (a None Counter key + an
                    # inflated `total`) would make certification
                    # needlessly conservative relative to the exact
                    # oracle's denominator.  Popping right after each
                    # update keeps the hot loop C-speed: the popped
                    # count is exactly this row's null count because
                    # compress never runs between update and pop.
                    total += len(toks) - counts.pop(None, 0)
                    if len(counts) >= limit:
                        counts = mg_compress(counts, capacity)
            counts = mg_compress(counts, capacity)
        yield pd.DataFrame(
            {
                "token": list(counts) + [None],
                "w": [None] * len(counts) + [total],
            }
        )

    return src_df.mapInPandas(mg, "token string, w long")


def mg_compress(counts, capacity: int):
    """One Misra-Gries compress step: subtract the (capacity+1)-th
    largest stored count from every entry and drop non-positives —
    the merge/compress of Agarwal et al.'s mergeable-summaries form.
    Every entry's stored count drops by at most ``thresh``, and
    ``thresh × (capacity+1) ≤`` (weight currently stored), so the
    cumulative under-count after any sequence of updates+compresses
    is ≤ n/(capacity+1).  Pure function, property-tested directly in
    ``tests/test_sketches.py``."""
    if len(counts) <= capacity:
        return counts
    from collections import Counter

    vals = sorted(counts.values(), reverse=True)
    thresh = vals[capacity]  # (capacity+1)-th largest
    return Counter({k: v - thresh for k, v in counts.items() if v > thresh})


def heavy_hitters(
    df: DataFrame, arr: Column, k: int = 20, capacity: int = 4096
) -> DataFrame:
    """Exact, certified top-*k* tokens by total occurrence count using
    the two-pass sketch-then-confirm pattern.

    Pass 1 (:func:`_mg_summaries`): bounded-memory Misra-Gries
    candidates PLUS the per-partition token totals — one corpus scan,
    ≤ ``capacity × partitions + partitions`` emitted rows, frozen
    behind a lazy ``localCheckpoint`` so the candidate set and the
    certification denominator read ONE materialization.
    Pass 2: EXACT counts of candidates only — the corpus scan filters
    map-side through a broadcast of the candidate set, so the only
    aggregation shuffle carries candidate tokens, never the full
    dictionary.  The candidate count table is frozen the same way so
    the top-k rows and the kth aggregate share one materialization.
    TWO corpus scans total, both documented.

    ``certified`` is the honest-sketch contract made a column: TRUE
    iff ``kth_count × (capacity+1) > total_tokens`` AND at least *k*
    candidates were counted.  The first clause means NO non-candidate
    token can reach the k-th count (its global count is ≤
    ``n/(capacity+1)`` by the MG guarantee); the second closes the
    undersized-output hole — with FEWER than k candidates the kth
    bound is computed over a short list, and tokens evicted everywhere
    (each ≤ n/(capacity+1)) could legitimately occupy the missing
    ranks, so a short result must say certified=False rather than
    claim a provable top-k it cannot see.  With the default capacity
    the flag holds at every tested SF, which is why a plain exact-SQL
    oracle hash-matches this sketch pipeline.
    """
    summ = _mg_summaries(df, arr, capacity).localCheckpoint(eager=False)
    cands = summ.filter(F.col("token").isNotNull()).select("token").distinct()
    total = summ.filter(F.col("token").isNull()).agg(
        F.sum("w").cast("long").alias("_n")
    )
    toks = df.select(F.explode(arr).alias("token"))
    counts = (
        toks.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .localCheckpoint(eager=False)
    )
    topk = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("token").asc()
    ).limit(k)
    kth = topk.agg(F.min("n_occurrences").alias("_kth"))
    n_cands = counts.agg(F.count(F.lit(1)).alias("_nc"))
    return (
        topk.crossJoin(F.broadcast(kth))
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(n_cands))
        .select(
            "token",
            "n_occurrences",
            (
                (F.col("_kth") * F.lit(capacity + 1) > F.col("_n"))
                & (F.col("_nc") >= F.lit(k))
            ).alias("certified"),
        )
    )
