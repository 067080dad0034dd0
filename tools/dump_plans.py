"""Regenerate PLANS.md — formatted physical plans for the queries
whose plan shape IS the scale contract.

For each selected query this dumps ``explain("formatted")`` at the
given sf_dir plus a one-line summary of the properties the plan tests
pin (pushdown, pruned ReadSchema, join strategy, partial aggregation,
absence of single-partition exchanges).  The artifact exists so a
reviewer can see the executed plan without running Spark; regenerate
with::

    python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries whose plans carry the scale argument, with the property
#: each plan is supposed to exhibit (mirrors tests/test_plan_shapes.py)
SELECTED: list[tuple[str, str]] = [
    ("q1_row_count", "footer-count scan; no full-table Exchange"),
    ("q3_checksum_diff",
     "pre-bucketed zipped SMJ: no Exchange, no Sort on either 'replica'"),
    ("q11_listing_orders",
     "PushedFilters + pruned ReadSchema + TakeOrderedAndProject(offset) top-k"),
    ("c1_lww_state", "partial_max_by map-side combine before the key shuffle"),
    ("dedup_exact_groups", "hash-groupBy on digest; text never shuffles"),
    ("dedup_minhash_lsh",
     "banded bucket join, candidate pairs only; first-agreeing-band "
     "filter (r8) replaces the pair-dedup Exchange"),
    ("ann_cosine_topk", "corpus never shuffles; query side broadcast"),
    ("ann_ivf_topk", "assignment is a projection; probes broadcast"),
    ("ann_knn_within",
     "Arrow cell kernel (r7): per-cell gram matrix in one "
     "FlatMapGroupsInPandas, only top-k-reachable candidates reach "
     "the ranking shuffle (JVM fold path retained, bit-identical)"),
    ("docs_token_budget",
     "frozen two-phase cumsum (r9): the ranged relation is ONE lazy "
     "localCheckpoint (Scan ExistingRDD, no rangepartitioning in this "
     "plan) read by both the running-sum window (_pid-partitioned) "
     "and the broadcast-offsets branch; no Exchange SinglePartition"),
    ("dedup_incremental_pairs",
     "daily-batch near-dup (r9): new-side band table broadcast "
     "against base-corpus bands; no base x base self-join, no "
     "CartesianProduct"),
    ("docs_chunk_windows",
     "overlapping token-window chunking (r9): per-row HOF pipeline, "
     "ZERO Exchange"),
    ("docs_block_dedup",
     "duplicated-block removal (r9): partial-agg (hash -> count + "
     "first-occurrence) shuffle; join-back moves count>1 rows only"),
    ("docs_quality_budget_by_source",
     "per-source token budget (r9): PARTIAL WindowGroupLimit below "
     "the single hash Exchange; both windows share it"),
    ("embedding_cluster_sample",
     "cluster-balanced sample (r9): shuffle-free assignment + "
     "partial WindowGroupLimit; one Exchange of O(cells*m) rows"),
    ("lineitem_small_qty_revenue",
     "correlated-avg join-back (r9, Q17 family): brand parts + "
     "per-part averages both broadcast; lineitem rows never shuffle "
     "(single partial-agg Exchange of (partkey, partials))"),
    ("orders_big_basket_customers",
     "having-threshold join-back (r9, Q18 family): per-order partial "
     "agg + >300 filter BEFORE the joins; distributed top-k"),
    ("supplier_sole_late_blame",
     "Q21 family rewritten as ONE fact shuffle (r9): both per-order "
     "aggregates reuse the lineitem x orders join partitioning; "
     "<=3 hash Exchanges total"),
    ("customer_dormant_balance",
     "scalar-subquery + anti-join (r9, Q22 family): broadcast LEFT "
     "ANTI against recent orders; 1-row avg broadcast; exact "
     "multiply-form threshold"),
    ("docs_heavy_hitters",
     "Misra-Gries sketch-then-confirm (r9): MapInPandas candidates, "
     "broadcast-filtered exact confirm, counts frozen behind "
     "localCheckpoint (Scan ExistingRDD), distributed top-k"),
    ("nation_trade_flows",
     "two-sided nation dim (r9 wave 4, Q7 family): 25-row dim "
     "broadcasts onto BOTH fact ends; ship-date filter pushed; one "
     "matrix-rollup Exchange at toy SF"),
    ("lineitem_bracket_revenue",
     "disjunctive brackets (r9 wave 4, Q19 family): explicit hulls "
     "pushed to BOTH parquet scans (qty<=30 on lineitem, brand-IN on "
     "part); residual OR evaluated post-broadcast-join"),
    ("customer_returns_ranking",
     "rank-then-enrich (r9 wave 4, Q10 family): returnflag + quarter "
     "filters pushed; per-customer rollup BEFORE the customer join; "
     "distributed top-k on exact DECIMAL revenue"),
    ("part_supplier_diversity",
     "count-distinct cascade (r9 wave 4, Q16 family): three strictly-"
     "shrinking hash dedups, no Expand, part dim broadcast"),
    ("nation_profit_by_year",
     "profit rollup (r9 wave 4, Q9 family): StringStartsWith pushed "
     "to the part scan; filtered parts broadcast-cut lineitem BEFORE "
     "the orderkey join; DECIMAL-exact profit terms"),
    ("dedup_best_of_cluster",
     "quality-aware canonical selection (r9 wave 4): ONE max_by "
     "aggregate over a packed ordering struct, partial map-side — "
     "never a window sort over cluster members"),
    ("docs_length_bucketing",
     "padding-waste report (r9 wave 4): integer-exact bucket edges, "
     "zero-shuffle bucketing + one tiny rollup Exchange"),
    ("dedup_minhash_precision",
     "sketch-precision eval (r9 wave 4): exact Jaccard ONLY on "
     "memoized candidate pairs — pair side broadcasts into both "
     "shingle-set joins, zero new Exchange"),
    ("events_zorder_scan",
     "z-order clustered read (r10): BOTH band predicates pushed to "
     "the layout scan as literals (footer min/max file skipping on "
     "either z-column); one rollup Exchange"),
    ("ann_pq_topk",
     "PQ-ADC top-k (r10): constant-folded encode projection (no "
     "Exchange, no Python), Arrow kernel reads (id, codes) only — "
     "vectors never cross the Python boundary; keep-min pruned "
     "candidates reach the ranking shuffle"),
    ("ann_ivfpq_topk",
     "IVFxPQ composed index (r10): cell + codes constant-folded, "
     "probe side a tiny literal relation with per-query ADC tables, "
     "broadcast hash join on cell, ADC a JVM fold — ZERO Python"),
    ("nation_market_share",
     "two-level share (r10, Q8 family): conditional-sum share inside "
     "ONE aggregate — no second pass, no window; part filter pushed "
     "and broadcast-cut before the fact shuffles"),
    ("customer_order_distribution",
     "order-count histogram (r10, Q13 family): per-custkey partial "
     "counts BEFORE the join, LEFT join keeps the zero bucket, "
     "rollup carries O(distinct counts)"),
    ("docs_weighted_sample",
     "deterministic weighted sample (r10): per-row LCG/weight "
     "priority, partial WindowGroupLimit below ONE Exchange"),
    ("docs_fuzzy_pairs",
     "edit-distance similarity join (r10): (first-token, length-band) "
     "equi-join blocking with a 3-band explode so each pair joins "
     "once; broadcast anti-join cap on degenerate blocks; codegen "
     "levenshtein verify — no cartesian, no Python"),
    ("multimodal_real_decode",
     "real PPM + WAV decode (r10/r11): two chained MapInPandas "
     "(encode, decode), ZERO Exchange — per-row media pipeline with "
     "the png error route inside the same plan"),
    ("sales_promo_bundles",
     "disjunctive bundles (r11, Q19 family): OR-of-ANDs pushed to "
     "BOTH scans (part verbatim, derived quantity hulls on "
     "lineitem); filtered part broadcast; per-bundle conditional "
     "DECIMAL sums inside ONE aggregate"),
    ("lineitem_part_copurchase",
     "market-basket pairs (rewritten r15): ONE collect_set "
     "aggregation, map-side array pair emission, no join — exactly "
     "two hash Exchanges; global top-20 as TakeOrderedAndProject"),
    ("docs_vocab_coverage",
     "top-K vocabulary via TakeOrdered, broadcast back over the "
     "token stream; no global window, one per-source rollup "
     "Exchange"),
    ("events_robust_outliers",
     "exact median/MAD by explicit rank selection (r11): every "
     "Exchange keys on (event_type, day_no); AQE reuses the "
     "duplicated rank-window subtree at runtime"),
    ("docs_pack_sequences", "exactly one Exchange, on the shard key"),
    ("docs_source_stats",
     "one text scan; shuffles carry hashes/counters only"),
    ("events_user_features",
     "two-phase COUNT(DISTINCT) aggregate; bounded Exchanges"),
    ("events_user_features_5min",
     "windowed (window,user) aggregate; identical plan shape streams "
     "with watermark state"),
    ("sales_by_nation_quarter",
     "broadcast nation dim; partial_sum on DECIMAL revenue"),
    ("events_asof_session", "tagged-union as-of join: one key Exchange"),
    ("events_interval_session", "time-chunk bucketed hash equi-join"),
    ("events_funnel",
     "range-frame running-min window + per-user agg sharing ONE Exchange"),
    ("users_retention_cohorts",
     "dedup reuses the user window partitioning; two Exchanges total"),
    ("docs_ngram_topk",
     "partial_count pre-shuffle; TakeOrderedAndProject, no global Sort"),
    ("embeddings_cell_stats",
     "constant-folded assignment projection; one (cell, partials) shuffle"),
    ("docs_tfidf_topterms",
     "ONE tokenize pass (df via window, no self-join); WindowGroupLimit"),
    ("docs_source_token_quantiles",
     "bounded (value,count) histogram rollup; state O(distinct lengths)"),
    ("docs_quality_tiers",
     "histogram thresholds broadcast over docs; no O(rows) agg buffer"),
    ("events_moving_stats",
     "dual window sharing ONE Exchange + Sort"),
    ("events_type_pivot",
     "pinned-value pivot lowered to conditional aggs; one shuffle"),
    ("sales_region_share",
     "dim chain collapses to broadcast; one big-big orderkey join"),
    ("orders_priority_late",
     "EXISTS as LEFT SEMI with non-equi residual; no nested loop"),
    ("part_min_cost_supplier",
     "decimal-exact argmin; WindowGroupLimit after partial agg"),
    ("customer_value_deciles",
     "exact NTILE over a FROZEN range partitioning (r9): rank and "
     "offset branches read one localCheckpoint RDD (Scan ExistingRDD; "
     "a rangepartitioning Exchange here would mean the branches "
     "re-sample boundaries independently — the r8 ADVICE bug); window "
     "PARTITIONED on _pid, broadcast offsets, no Exchange "
     "SinglePartition"),
    ("segment_status_revenue",
     "big-big custkey shuffle join, projections pruned pre-Exchange"),
    ("events_daily_active",
     "single exact distinct: two-phase (day,user) dedup, no Expand"),
    ("lineitem_profile",
     "unpivot + two-phase distinct rollup; no Expand, one scan"),
    ("dedup_cluster_sizes",
     "LSH pairs -> pointer-doubled components -> two tiny rollups"),
    ("events_key_skew",
     "partial-aggregated user shuffle; scalar total broadcast back "
     "(ReusedExchange), no Window"),
    ("orders_fulfillment_lag",
     "big-big orderkey shuffle join, 2-3 column scans, 5-row rollup"),
    ("docs_dup_rate_by_source",
     "digest-grouped dup counts joined back on the hash; no all-pairs"),
    ("customer_order_recency",
     "scalar anchor broadcast over a one-column scan; no Window"),
    ("events_gap_stats",
     "lag window PARTITIONED by user; partial-aggregated rollup"),
    ("docs_bigram_logprob",
     "index-backed LM score (r14): both count relations are parquet "
     "reads of the persisted standing artifact; ONE bigram explode; "
     "count-fetch joins on xxhash64 keys; lp table broadcast"),
    ("unigram_logprob_incremental_parity",
     "maintained-LM merge-delta (r14): standing counts read from "
     "parquet, O(batch) delta aggregate, union+sum merge behind a "
     "lazy localCheckpoint; score join reuses the index-backed shape"),
    ("dedup_containment_incremental",
     "daily containment feed (r14): corpus postings cross NO "
     "Exchange — batch shingles broadcast into one map-side pass; "
     "stop guard composes df from the standing relation map-side"),
    ("docs_lm_admission",
     "LM admission (r15): batch-sized left join onto the memoized "
     "backoff score, integer tier CASE — nothing corpus-sized moves"),
    ("containment_index_append_parity",
     "maintained containment index (r15): standing relations read "
     "from parquet, O(batch) delta, additive df merge, bounded "
     "3x64-row digest"),
    ("minhash_index_append_parity",
     "maintained band table (r15): corpus side a plain parquet "
     "scan, batch side checkpointed minhash append, bounded "
     "72-row digest"),
    ("dedup_containment_day2",
     "day-2 composition feed (r15): day-0 index read + batch-1 "
     "merge + batch-2 feed; merged corpus side crosses no Exchange"),
]


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same as explain()
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from cass_cdc_pg_spark import registry
    from cass_cdc_pg_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", shuffle_partitions=8)
    out = [
        "# PLANS — formatted physical plans of the scale-critical queries",
        "",
        f"Generated by `tools/dump_plans.py` at `{sf_dir}`. Each plan is",
        "followed by the property the repo's plan tests pin for it",
        "(`tests/test_plan_shapes.py`). Regenerate after plan-affecting",
        "changes; do not hand-edit.",
        "",
    ]
    for name, contract in SELECTED:
        df = registry.QUERIES[name](spark, sf_dir)
        plan = _formatted(df)
        # strip the volatile ids so regenerations diff cleanly
        plan = re.sub(r"#\d+L?", "#x", plan)
        plan = re.sub(r"plan_id=\d+", "plan_id=x", plan)
        plan = re.sub(r"Location: \S+", "Location: <sf_dir>", plan)
        codegen = len(re.findall(r"WholeStageCodegen", plan))
        exchanges = len(re.findall(r"\bExchange\b", plan))
        out += [
            f"## {name}",
            "",
            f"**Contract:** {contract}",
            f"**WholeStageCodegen spans:** {codegen} · **Exchanges:** {exchanges}",
            "",
            "```",
            plan.rstrip(),
            "```",
            "",
        ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"PLANS.md written ({len(SELECTED)} plans)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
