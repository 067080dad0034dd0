"""One-off scale spot-proof (r7 verdict item 7): replay the heaviest
pipeline entries at 1x and 10x data volume and report how wall time
scales, to empirically separate the per-query session constant from
the data-proportional work that the BASELINE.md posture notes argue
about.

10x inputs are synthesized from sf0.1 by replicating with id offsets;
document text gets a deterministic per-replica tag on EVERY token so
replicas are NOT near-duplicates of each other (the workload keeps
its per-doc dedup character instead of degenerating into a 10-way
near-dup stress test), and orders keep their per-customer
distribution with shifted customer ids.

Token-level tagging is load-bearing (r9 verdict watch item): the
previous single PREFIX token left every 3-token shingle past the
first two intact, so the 10 replicas of each doc were ~99%%
Jaccard-similar 10-cliques — the LSH pair graph grew 780x
(329 -> 256,899 pairs at sf0.1) instead of 10x, and the measured
dedup_components "scale ratio" (2.49) was really a quadratic-pairs
stress test, not a data-volume curve.  Tagging every token rewrites
every shingle, which preserves shingle EQUALITY within a replica
(both sides of any within-replica match get the same tag) and kills
it across replicas, so pairs scale exactly 10x — the independent-
corpus growth the curve claims to measure.  The proof JSON records
pairs/nodes/fixpoint rounds at both scales so the claim is checkable.

Usage:  python tools/scale_proof.py [sf_dir] [out_json]
Writes a JSON summary (default scale_proof.json) and prints it.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

REPLICAS = 10


def _replicate_docs(
    spark, sf_dir: str, out: str, replicas: int | None = None
) -> None:
    from pyspark.sql import functions as F

    replicas = REPLICAS if replicas is None else replicas
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    parts = []
    for i in range(replicas):
        # tag EVERY token, not just a prefix: shingle equality survives
        # within a replica and is impossible across replicas (see module
        # docstring — a prefix-only tag made replicas 10-cliques)
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                F.regexp_replace(
                    F.col("text"), r"(\S+)", f"r{i}_$1"
                ).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(f"{out}/documents.parquet")


def _replicate_orders(
    spark, sf_dir: str, out: str, replicas: int | None = None
) -> tuple[int, int]:
    from pyspark.sql import functions as F

    replicas = REPLICAS if replicas is None else replicas
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hi_k = orders.agg(F.max("o_orderkey")).first()[0] + 1
    # custkey stride must clear BOTH tables' key spaces: customers
    # with no orders can hold keys above any o_custkey, and a stride
    # from orders alone would make replicated c_custkeys collide
    # across replicas (fan-out joins masquerading as scale data)
    hi_c = max(
        orders.agg(F.max("o_custkey")).first()[0],
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .agg(F.max("c_custkey")).first()[0],
    ) + 1
    parts = []
    for i in range(replicas):
        parts.append(
            orders.select(
                (F.col("o_orderkey") + F.lit(i * hi_k)).alias("o_orderkey"),
                (F.col("o_custkey") + F.lit(i * hi_c)).alias("o_custkey"),
                *[
                    c
                    for c in orders.columns
                    if c not in ("o_orderkey", "o_custkey")
                ],
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(f"{out}/orders.parquet")
    return hi_k, hi_c


def _replicate_lineitem(
    spark, sf_dir: str, out: str, hi_k: int, replicas: int | None = None
) -> None:
    """10x lineitem with l_orderkey shifted by the SAME stride as the
    orders replication, so order⋈lineitem referential integrity holds
    in the grown corpus (the Q18/Q21-analog joins stay honest);
    suppliers/parts are dims and stay fixed, matching a fact-grows
    deployment."""
    from pyspark.sql import functions as F

    replicas = REPLICAS if replicas is None else replicas
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    parts = []
    for i in range(replicas):
        parts.append(
            li.select(
                (F.col("l_orderkey") + F.lit(i * hi_k)).alias("l_orderkey"),
                *[c for c in li.columns if c != "l_orderkey"],
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")


def _replicate_customer(spark, sf_dir: str, out: str, hi_c: int) -> None:
    """10x customer with c_custkey shifted by the orders replication's
    custkey stride — every replicated order keeps a matching customer."""
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    parts = []
    for i in range(REPLICAS):
        parts.append(
            cust.select(
                (F.col("c_custkey") + F.lit(i * hi_c)).alias("c_custkey"),
                *[c for c in cust.columns if c != "c_custkey"],
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(f"{out}/customer.parquet")


def _copy_dims(spark, sf_dir: str, out: str) -> None:
    """Dims the new-entry loaders touch, unreplicated (dims don't grow
    10x when the fact tables do)."""
    for t in ("supplier", "nation", "part", "region"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")


def _replicate_events(
    spark, sf_dir: str, out: str, replicas: int | None = None
) -> None:
    from pyspark.sql import functions as F

    replicas = REPLICAS if replicas is None else replicas
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hi_e = ev.agg(F.max("event_id")).first()[0] + 1
    hi_u = ev.agg(F.max("user_id")).first()[0] + 1
    parts = []
    for i in range(replicas):
        # shift BOTH ids: distinct keys scale 10x while each key keeps
        # its per-user row distribution — the grown-corpus shape the
        # skew profiler must stay sub-linear on (hot-key share is
        # scale-free, so the profile's answer stays comparable)
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(i * hi_e)).alias("event_id"),
                (F.col("user_id") + F.lit(i * hi_u)).alias("user_id"),
                *[
                    c
                    for c in ev.columns
                    if c not in ("event_id", "user_id")
                ],
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(f"{out}/events.parquet")


def _replicate_embeddings(spark, sf_dir: str, out: str) -> None:
    """10x embeddings with shifted vec_ids; component 0 is perturbed
    per replica so replicas are not bit-identical vectors (the
    assignment workload keeps real per-row variety)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    parts = []
    for i in range(REPLICAS):
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
                F.concat(
                    F.array((F.element_at("embedding", 1) + F.lit(i * 0.01)).cast("float")),
                    F.slice("embedding", 2, 100000),
                ).alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            )
        )
    big = parts[0]
    for q in parts[1:]:
        big = big.unionByName(q)
    big.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")



def _force_full(df) -> None:
    """Full-column execution via the noop sink (r15, same fix as
    bench.force_full): .count() let Catalyst's outer-join eliminator
    drop the dominant joins of the admission/decision and recall
    queries, so their timed rows measured a degenerate scan.  Every
    timed query action below goes through this."""
    df.write.format("noop").mode("overwrite").save()

def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def main() -> None:
    import os
    import tempfile

    # time the real per-call dedup pipeline, not the session-scoped
    # materialized-pairs memo (registry._dedup_shared) — with the memo
    # on, a warmed run measures a few hundred cached rows
    os.environ["SPARK_GRAFT_NO_DEDUP_MEMO"] = "1"
    # the proof harness sizes the local JVM itself (r13 advice): two
    # of six r13 100x runs OOM'd the self-join stage on an 8g heap.
    # Sized through the memory-aware probe (r14 advice, same fix as
    # bench.py): a flat 24g OOM-kills the JVM under a <24 GiB cgroup
    # limit; on the 128 GiB bench box the probe still clamps to 24g.
    from cass_cdc_pg_spark.session import _default_driver_memory

    os.environ.setdefault("SPARK_DRIVER_MEMORY", _default_driver_memory())

    from cass_cdc_pg_spark.registry import (
        ann_ivfpq_append_parity_q,
        ann_ivfpq_day2_q,
        embedding_hard_negatives_q,
        docs_unigram_logprob_q,
        docs_bigram_logprob_q,
        unigram_logprob_incremental_parity_q,
        bigram_logprob_incremental_parity_q,
        dedup_containment_incremental_q,
        docs_bigram_backoff_logprob_q,
        dedup_containment_admission_q,
        docs_shard_balance_q,
        dedup_containment_pairs_q,
        embedding_cell_drift_q,
        ann_ivfpq_topk_q,
        ann_pq_refine_topk_q,
        ann_pq_topk_q,
        docs_fuzzy_pairs_q,
        docs_ngram_novelty_q,
        docs_source_distinctive_terms_q,
        docs_vocab_coverage_q,
        docs_weighted_sample_q,
        embedding_pq_codes_q,
        events_robust_outliers_q,
        events_weekly_active_q,
        events_zorder_scan_q,
        lineitem_copurchase_sketch_q,
        lineitem_part_copurchase_q,
        multimodal_real_decode_q,
        sales_promo_bundles_q,
        customer_value_deciles_q,
        dedup_cluster_sizes_q,
        docs_duplicated_spans_q,
        dedup_components_q,
        docs_heavy_hitters_q,
        events_key_skew_q,
        orders_big_basket_customers_q,
        supplier_sole_late_blame_q,
        nation_trade_flows_q,
        part_supplier_diversity_q,
        customer_returns_ranking_q,
        dedup_incremental_pairs_q,
        ann_ivf_incremental_assign_q,
        docs_lm_admission_q,
        containment_index_append_parity_q,
        minhash_index_append_parity_q,
        dedup_containment_day2_q,
        dedup_minhash_day2_q,
        text_repetition_q,
        part_min_cost_supplier_q,
        sales_rollup_totals_q,
    )
    from cass_cdc_pg_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "scale_proof.json"
    spark = get_spark(app_name="scale-proof")
    spark.range(1000).selectExpr("sum(id)").collect()

    queries = {
        "dedup_cluster_sizes": dedup_cluster_sizes_q,
        "dedup_components": dedup_components_q,
        "docs_duplicated_spans": docs_duplicated_spans_q,
        "customer_value_deciles": customer_value_deciles_q,
        # r9 (r8 verdict #5): the second floor-bound perf entry joins
        # the measured-scaling record alongside deciles
        "events_key_skew": events_key_skew_q,
        # r9 wave 3: the two heaviest new analytics shapes (floor-bound
        # vs DuckDB raw at toy SF — the scaling ratio is the posture
        # evidence) and the MG sketch pipeline (its shuffle volume is
        # data-size INDEPENDENT, so the ratio isolates scan+python cost)
        "orders_big_basket_customers": orders_big_basket_customers_q,
        "supplier_sole_late_blame": supplier_sole_late_blame_q,
        "docs_heavy_hitters": docs_heavy_hitters_q,
        # r9 wave 4: the two-fact-join Q7 matrix (both data Exchanges
        # grow with the fact), the Q16 dedup cascade (every stage's
        # volume grows 10x), and the Q10 rank-then-enrich (filters cut
        # before both shuffles — the ratio shows how much of the toy-SF
        # wall was session floor)
        "nation_trade_flows": nation_trade_flows_q,
        "part_supplier_diversity": part_supplier_diversity_q,
        "customer_returns_ranking": customer_returns_ranking_q,
        # r9 wave 4 (incremental tier): the daily-batch ops' whole
        # claim is O(new batch) work — the carve-out grows 10x with
        # the corpus, so the ratio should track the BATCH, and the
        # memo bypass times the real from-scratch band build
        "dedup_incremental_pairs": dedup_incremental_pairs_q,
        "ann_ivf_incremental_assign": ann_ivf_incremental_assign_q,
        # the two largest remaining pipeline walls at sf0.1 — ratio
        # evidence closes their floor argument like the others'
        "part_min_cost_supplier": part_min_cost_supplier_q,
        "sales_rollup_totals": sales_rollup_totals_q,
        # r10: the PQ tier (bulk Arrow encode over 10x vectors, ADC
        # scan over 10x codes, probe over the 10x persisted IVFPQ
        # index — codebooks/centroids/index are trained+built on the
        # 10x fixture in the warmup call, so the timed ratio is the
        # standing-index daily shape), the z-order band scan over 10x
        # events (layout likewise built in warmup), and the real-codec
        # decode (two Python hops, linear by construction)
        "embedding_pq_codes": embedding_pq_codes_q,
        "ann_pq_topk": ann_pq_topk_q,
        "ann_ivfpq_topk": ann_ivfpq_topk_q,
        # r11: the two-stage refine (shortlist ADC + exact re-rank of
        # ≤ Q·50 rows — the re-rank volume is corpus-size independent,
        # so the ratio tracks the ADC scan alone)
        "ann_pq_refine_topk": ann_pq_refine_topk_q,
        "events_zorder_scan": events_zorder_scan_q,
        "multimodal_real_decode": multimodal_real_decode_q,
        # r10 late: the blocked fuzzy join (pair volume tracks the
        # per-replica block sizes — replicas never cross-match because
        # every token carries the replica tag, so blocks AND pairs
        # scale ~10x) and the weighted sample (top-k per group:
        # output constant, scan linear)
        "docs_fuzzy_pairs": docs_fuzzy_pairs_q,
        "docs_weighted_sample": docs_weighted_sample_q,
        # r12 (r11 verdict #4): measured 10x rows for the five r11
        # additions — the copurchase self-join (fan-out bounded by
        # basket size), the double-rank outliers, the TakeOrdered
        # vocab broadcast, the disjunction-pushdown star join, and
        # the first-owner MIN novelty curve
        "sales_promo_bundles": sales_promo_bundles_q,
        "lineitem_part_copurchase": lineitem_part_copurchase_q,
        "docs_vocab_coverage": docs_vocab_coverage_q,
        "events_robust_outliers": events_robust_outliers_q,
        "docs_ngram_novelty": docs_ngram_novelty_q,
        # r12 additions: the daily index append (warmup builds the
        # 10x standing base index + codebooks; the timed ratio is the
        # O(new batch) delta pass), the odds-ratio term ranker, and
        # the sequence-explode sliding distinct
        "ann_ivfpq_append_parity": ann_ivfpq_append_parity_q,
        "docs_source_distinctive_terms": docs_source_distinctive_terms_q,
        "events_weekly_active": events_weekly_active_q,
        # r12 past-cap addition: shortlist -> broadcast-anti-join ->
        # re-rank; every stage is bounded by Q*shortlist except the
        # corpus scan, so the ratio tracks the cosine kernel alone
        "embedding_hard_negatives": embedding_hard_negatives_q,
        # r13 additions: the unigram-LM scorer (token explode + count
        # join — the heaviest new shuffle), containment (inverted-
        # index self-join), cell drift + shard balance (single
        # partial-agg shuffles), and the maintained-view replay
        # (compute surface is the 5-batch CDC replay; ratio tracks
        # the per-batch maintenance volume)
        "docs_unigram_logprob": docs_unigram_logprob_q,
        "docs_bigram_logprob": docs_bigram_logprob_q,
        "docs_shard_balance": docs_shard_balance_q,
        "dedup_containment_pairs": dedup_containment_pairs_q,
        "embedding_cell_drift": embedding_cell_drift_q,
        # r14: the maintained-LM parity pair — the timed shape is the
        # daily job (standing-count read + O(batch) delta + merge +
        # score); the ratio tracks batch+score volume, the standing
        # artifact is built in the warmup call
        "unigram_logprob_incremental_parity":
            unigram_logprob_incremental_parity_q,
        "bigram_logprob_incremental_parity":
            bigram_logprob_incremental_parity_q,
        # r14 (r13 verdict #2's flatten lever): the daily containment
        # feed — warmup builds the 10x standing inverted index; the
        # timed ratio is the batch-vs-index broadcast join + the
        # batch self-join, the O(batch) claim
        "dedup_containment_incremental": dedup_containment_incremental_q,
        # r14: held-out backoff scoring — O(batch) explode + three
        # count-fetch joins against the standing base relations
        "docs_bigram_backoff_logprob": docs_bigram_backoff_logprob_q,
        # r14: the admission decision on top of the containment feed —
        # pure composition, O(batch + candidate pairs)
        "dedup_containment_admission": dedup_containment_admission_q,
        # r15: the LM admission decision (memoized backoff feed + a
        # batch-sized left join — ratio tracks the held-out score)
        # and the containment index append parity (standing index
        # read + batch delta + df merge + bounded 192-row digest)
        "docs_lm_admission": docs_lm_admission_q,
        "containment_index_append_parity":
            containment_index_append_parity_q,
        # r15: the LSH band-table maintenance parity (standing table
        # read + O(batch) minhash append + bounded 72-row digest)
        "minhash_index_append_parity": minhash_index_append_parity_q,
        # r15 late: the day-2 composition feed (day-0 index read +
        # batch-1 merge + batch-2 feed — O(two batches) moving parts)
        "dedup_containment_day2": dedup_containment_day2_q,
        # r16: the routine-cadence copurchase heavy-hitter sketch —
        # the basket-sample draw keeps ~TARGET orders at ANY corpus
        # size (t re-sized per fixture from the orders row count), so
        # both post-filter shuffles are volume-pinned and only the
        # lineitem scan grows with the decade; the exact count it
        # replaces is now the audit line below
        "lineitem_copurchase_sketch": lineitem_copurchase_sketch_q,
        # r16: the LSH-tier day-2 composition feed (day-0 band-table
        # read + batch-1 band append + batch-2 broadcast probe —
        # O(two batches) moving parts, corpus crosses no Exchange)
        "dedup_minhash_day2": dedup_minhash_day2_q,
        # r16: the ANN-tier day-2 probe (warmup builds the 10x day-0
        # base index; the timed shape is O(batch-1 encode) + the
        # cell-pruned partition-filtered probe — the full-codes scan
        # never happens, so the ratio tracks the delta encode + the
        # probed cells alone)
        "ann_ivfpq_day2": ann_ivfpq_day2_q,
        # r16: the rewritten repetition metrics (r15 verdict #5 — the
        # lambda-binding de-recompute; zero-shuffle per-doc folds, the
        # ratio tracks the one tokenize + three O(n log n) array ops)
        "text_repetition_stats": text_repetition_q,
    }

    with tempfile.TemporaryDirectory() as tmp:
        _replicate_docs(spark, sf_dir, tmp)
        hi_k, hi_c = _replicate_orders(spark, sf_dir, tmp)
        _replicate_lineitem(spark, sf_dir, tmp, hi_k)
        _replicate_customer(spark, sf_dir, tmp, hi_c)
        _copy_dims(spark, sf_dir, tmp)
        _replicate_events(spark, sf_dir, tmp)
        _replicate_embeddings(spark, sf_dir, tmp)
        # the 10x dir needs every table the query loaders touch; the
        # remaining tables are only read by loaders we don't call here
        report: dict = {
            "sf_dir": sf_dir,
            "replicas": REPLICAS,
            # r15: timed actions force ALL columns via the noop sink
            # (.count() eliminated the dominant joins of 12 queries);
            # pre-r15 rows for those entries measured a pruned plan
            "action": "noop_full_columns",
            "queries": {},
        }
        for name, fn in queries.items():
            _force_full(fn(spark, sf_dir))  # warm (codegen, file listing)
            t1 = min(
                _timed(lambda: _force_full(fn(spark, sf_dir)))
                for _ in range(2)
            )
            _force_full(fn(spark, tmp))
            t10 = min(
                _timed(lambda: _force_full(fn(spark, tmp)))
                for _ in range(2)
            )
            report["queries"][name] = {
                "sec_1x": t1,
                "sec_10x": t10,
                "scale_ratio": round(t10 / t1, 2) if t1 else None,
            }
            print(f"# {name}: 1x={t1}s 10x={t10}s ratio={t10/t1:.2f}")
        # LM count-table build capex at both scales (r13 advice #5):
        # the timed ratios above measure the memoized SCORING plan
        # (the artifact is a standing index from r14); this block
        # makes the excluded capex visible in the same artifact by
        # dropping each persisted count layout and rebuilding it timed
        import shutil as _sh

        from cass_cdc_pg_spark import registry_corpus as _regc

        lm_detail: dict = {}
        for tier, dirfn, buildfn in (
            ("unigram", _regc._lm_unigram_dir, _regc._lm_unigram_counts),
            ("bigram", _regc._lm_bigram_dir, _regc._lm_bigram_counts),
        ):
            row = {}
            for label, d in (("1x", sf_dir), ("10x", tmp)):
                _sh.rmtree(dirfn(d), ignore_errors=True)
                row[f"build_sec_{label}"] = _timed(
                    lambda d=d, f=buildfn: f(spark, d)
                )
            lm_detail[tier] = row
        report["lm_count_build_detail"] = lm_detail
        print(f"# lm_count_build_detail: {lm_detail}")

        # dedup_components detail: pairs/nodes/fixpoint rounds at both
        # scales, making the curve's workload checkable (pairs must be
        # ~10x, rounds must grow at most logarithmically — if pairs
        # blow up the REPLICATION is broken, not the operator)
        from cass_cdc_pg_spark.operators import dedup as _dedup
        from cass_cdc_pg_spark.registry import _DEDUP_PAIR_PARAMS
        from cass_cdc_pg_spark.sources import tables as _src

        detail = {}
        for label, d in (("1x", sf_dir), ("10x", tmp)):
            pairs = _dedup.minhash_lsh_pairs(
                _src.load_table(spark, d, "documents"), **_DEDUP_PAIR_PARAMS
            ).localCheckpoint(eager=True)
            st: dict = {}
            cc = _dedup.connected_components(
                pairs.select("doc_a", "doc_b"), stats=st
            )
            detail[label] = {
                "pairs": pairs.count(),
                "nodes": cc.count(),
                "fixpoint_rounds": st["rounds"],
            }
        report["dedup_components_detail"] = detail
        print(f"# dedup_components_detail: {detail}")

        # ---- drill-downs for the two ratios nearest the ≤2 line
        # (r10 verdict #4, the dedup_components precedent): commit the
        # WORKLOAD counters at both scales next to the wall split, so
        # the record itself shows data-proportional work growing 10×
        # while the wall grows ~1.8× — i.e. the ratio is scan+shuffle
        # amortization over the fixed session/plan floor, not a
        # super-linear operator.  scan_sec times ONLY the pruned fact
        # scan the query starts from (count of the same projection +
        # filter); the remainder of the wall is join/agg/rank work.
        from pyspark.sql import functions as _F

        def _deciles_counters(d: str) -> dict:
            o = _src.load_table(spark, d, "orders").select(
                "o_custkey",
                _F.col("o_totalprice").cast("decimal(18,6)").alias("_p"),
            )
            scan = _timed(lambda: o.count())
            spend = o.groupBy("o_custkey").agg(_F.sum("_p").alias("spend"))
            spend_sec = _timed(lambda: spend.count())
            return {
                "fact_rows": o.count(),
                "rank_rows": o.select("o_custkey").distinct().count(),
                "output_rows": 10,
                "scan_sec": scan,
                # the data-proportional phase (fact shuffle + DECIMAL
                # agg), timed alone: if this stays ~flat while the
                # full wall grows, the wall growth is the rank
                # machinery's fixed multi-job floor (range-boundary
                # sampling, checkpoint materialization, counts branch)
                # amortizing — not super-linear operator work
                "spend_agg_sec": spend_sec,
            }

        def _flows_counters(d: str) -> dict:
            li = _src.load_table(spark, d, "lineitem").select(
                "l_orderkey", "l_shipdate"
            ).filter(
                (_F.col("l_shipdate") >= _F.lit("1996-01-01").cast("timestamp"))
                & (_F.col("l_shipdate") < _F.lit("1998-01-01").cast("timestamp"))
            )
            scan = _timed(lambda: li.count())
            return {"fact_rows_after_filter": li.count(), "scan_sec": scan}

        def _rollup_counters(d: str) -> dict:
            """sales_rollup_totals phase split (r11 verdict #5, the
            nation_trade_flows_detail precedent): the pruned fact
            scan and the first fact⋈fact join timed alone — if these
            data-proportional phases grow ~1x-2x while the full wall
            grows toward 2x, the wall growth is rollup-expansion +
            session floor amortizing, not super-linear work."""
            li = _src.load_table(spark, d, "lineitem").select(
                "l_orderkey", "l_extendedprice", "l_discount"
            )
            scan = _timed(lambda: li.count())
            o = _src.load_table(spark, d, "orders").select(
                "o_orderkey", "o_custkey", "o_orderdate"
            )
            joined = li.join(
                o, _F.col("l_orderkey") == _F.col("o_orderkey")
            )
            join_sec = _timed(lambda: joined.count())
            return {
                "fact_rows": li.count(),
                "scan_sec": scan,
                "li_join_orders_sec": join_sec,
            }

        report["customer_value_deciles_detail"] = {
            "1x": _deciles_counters(sf_dir),
            "10x": _deciles_counters(tmp),
        }
        report["nation_trade_flows_detail"] = {
            "1x": _flows_counters(sf_dir),
            "10x": _flows_counters(tmp),
        }
        report["sales_rollup_totals_detail"] = {
            "1x": _rollup_counters(sf_dir),
            "10x": _rollup_counters(tmp),
        }
        print(f"# deciles_detail: {report['customer_value_deciles_detail']}")
        print(f"# flows_detail: {report['nation_trade_flows_detail']}")
        print(f"# rollup_detail: {report['sales_rollup_totals_detail']}")

        # ---- workload counters for the two entries whose toy walls
        # sit past (or at) the ≤2 line: both shuffle volumes genuinely
        # grow 10× (the detail makes that checkable), so on a fixed
        # box the wall must converge toward 10× as real work outgrows
        # the session floor — per-row throughput RISING is the claim.
        def _novelty_counters(d: str) -> dict:
            docs = _src.load_table(spark, d, "documents")
            n_docs = docs.count()
            toks = docs.select(
                "doc_id",
                _F.explode(
                    _F.filter(
                        _F.split(_F.col("text"), " "), lambda t: t != ""
                    )
                ).alias("tok"),
            )
            wall = report["queries"]["docs_ngram_novelty"][
                "sec_1x" if d == sf_dir else "sec_10x"
            ]
            return {
                "n_docs": n_docs,
                "token_rows": toks.count(),
                "docs_per_sec": round(n_docs / wall, 1),
            }

        def _weekly_counters(d: str) -> dict:
            ev = _src.load_table(spark, d, "events")
            n_ev = ev.count()
            wall = report["queries"]["events_weekly_active"][
                "sec_1x" if d == sf_dir else "sec_10x"
            ]
            return {
                "n_events": n_ev,
                "events_per_sec": round(n_ev / wall, 1),
            }

        def _copurchase_counters(d: str) -> dict:
            """lineitem_part_copurchase workload, matched to the r15
            single-aggregation plan: the table is scanned ONCE into a
            collect_set on orderkey (lineitem_rows is that shuffle's
            input volume) and pairs are emitted map-side from the
            per-order arrays (emitted_pairs is the second shuffle's
            volume) — if both grow ~10x while rows/sec rises, the >2
            toy wall is the two shuffles' real volume emerging from
            the floor, not quadratic fan-out (baskets are
            size-bounded, so pairs/order is a constant)."""
            li = _src.load_table(spark, d, "lineitem").select(
                "l_orderkey", "l_partkey"
            )
            n_lines = li.count()
            agg = (
                li.groupBy("l_orderkey")
                .agg(
                    _F.countDistinct("l_partkey").alias("k")
                )
                .filter(_F.col("k") >= 2)
                .agg(
                    _F.count(_F.lit(1)).alias("orders"),
                    _F.sum(_F.expr("k * (k - 1) DIV 2")).alias("pairs"),
                )
                .first()
            )
            wall = report["queries"]["lineitem_part_copurchase"][
                "sec_1x" if d == sf_dir else "sec_10x"
            ]
            return {
                "lineitem_rows": n_lines,
                "orders_with_pairs": int(agg["orders"]),
                "emitted_pairs": int(agg["pairs"]),
                "rows_per_sec": round(n_lines / wall, 1),
            }

        def _unigram_counters(d: str) -> dict:
            """docs_unigram_logprob workload: the token explode is the
            shuffle volume (count aggregate + count-fetch join, both
            on the 8-byte xxhash64 token key); docs/sec must rise as
            that volume outgrows the session floor."""
            docs = _src.load_table(spark, d, "documents")
            n_docs = docs.count()
            tok_rows = docs.select(
                _F.explode(
                    _F.filter(
                        _F.split(_F.col("text"), " "), lambda t: t != ""
                    )
                ).alias("tok")
            ).count()
            wall = report["queries"]["docs_unigram_logprob"][
                "sec_1x" if d == sf_dir else "sec_10x"
            ]
            return {
                "n_docs": n_docs,
                "token_rows": tok_rows,
                "docs_per_sec": round(n_docs / wall, 1),
            }

        # r16 (r15 verdict #8): attribute the novelty 10x ratio — the
        # 3.93 high-water row sat on a sub-second 1x wall, so measure
        # the session's per-action floor (min-of-5 trivial noop jobs,
        # the bench.py headline_floor discipline) and publish the
        # floor-adjusted ratio beside the raw one: if the adjusted
        # ratio lands near the data ratio with docs/sec rising, the
        # >2 raw reading was floor emergence, now said by the record
        # rather than inferred.
        _floor_probe = (
            spark.read.parquet(f"{sf_dir}/region.parquet")
            .groupBy("r_regionkey")
            .count()
        )
        _force_full(_floor_probe)
        proof_floor = round(
            min(
                _timed(lambda: _force_full(_floor_probe))
                for _ in range(5)
            ),
            4,
        )
        report["session_floor_sec"] = proof_floor
        report["docs_ngram_novelty_detail"] = {
            "1x": _novelty_counters(sf_dir),
            "10x": _novelty_counters(tmp),
            "session_floor_sec": proof_floor,
            "ratio_10x_raw": round(
                report["queries"]["docs_ngram_novelty"]["sec_10x"]
                / report["queries"]["docs_ngram_novelty"]["sec_1x"],
                2,
            ),
            "ratio_10x_floor_adj": round(
                max(
                    report["queries"]["docs_ngram_novelty"]["sec_10x"]
                    - proof_floor,
                    0.0,
                )
                / max(
                    report["queries"]["docs_ngram_novelty"]["sec_1x"]
                    - proof_floor,
                    1e-9,
                ),
                2,
            ),
        }
        report["docs_unigram_logprob_detail"] = {
            "1x": _unigram_counters(sf_dir),
            "10x": _unigram_counters(tmp),
        }
        print(
            f"# unigram_detail: {report['docs_unigram_logprob_detail']}"
        )
        report["events_weekly_active_detail"] = {
            "1x": _weekly_counters(sf_dir),
            "10x": _weekly_counters(tmp),
        }
        def _hardneg_counters(d: str) -> dict:
            """embedding_hard_negatives workload (index-backed from
            r13): the dominant phase is the ADC pass over the
            PERSISTED IVF×PQ codes (m ints per corpus row — the
            vectors are only read by the bounded Q·50 re-rank fetch)
            — vectors/sec must RISE as the code scan outgrows the
            session floor; the shortlist/exclusion/re-rank stages are
            all bounded by Q*shortlist."""
            n_vec = _src.load_table(spark, d, "embeddings").count()
            wall = report["queries"]["embedding_hard_negatives"][
                "sec_1x" if d == sf_dir else "sec_10x"
            ]
            return {
                "corpus_vectors": n_vec,
                "vectors_per_sec": round(n_vec / wall, 1),
            }

        report["lineitem_part_copurchase_detail"] = {
            "1x": _copurchase_counters(sf_dir),
            "10x": _copurchase_counters(tmp),
        }
        report["embedding_hard_negatives_detail"] = {
            "1x": _hardneg_counters(sf_dir),
            "10x": _hardneg_counters(tmp),
        }
        print(f"# novelty_detail: {report['docs_ngram_novelty_detail']}")
        print(f"# weekly_detail: {report['events_weekly_active_detail']}")
        print(
            f"# copurchase_detail: "
            f"{report['lineitem_part_copurchase_detail']}"
        )
        print(
            f"# hardneg_detail: "
            f"{report['embedding_hard_negatives_detail']}"
        )

    # ---- 100× decade check (r10 verdict #5): replay the three
    # heaviest document-tier entries on a 100× corpus and record the
    # 100×-vs-10× (one further decade) ratio.  Only documents is
    # replicated: all three read nothing else.
    #
    # READING THE DECADE RATIO: the ≤2-per-10× ratios at toy walls
    # measure fixed-cost amortization — as real work rises out of the
    # multi-job session floor, the wall ratio on a FIXED 32-core box
    # must converge toward the data ratio (10).  The posture claim at
    # 100 TB is therefore per-row cost, not wall: docs_per_sec must
    # RISE (or hold) decade over decade.  Wall flatness at constant
    # per-row cost is what scale-OUT (the 1000-executor premise)
    # buys, not what a fixed box can show.  dedup_components also
    # records its 100× fixpoint rounds: pointer-doubling adds rounds
    # logarithmically, one extra pass per ~decade of diameter growth.
    from cass_cdc_pg_spark.operators import dedup as _dedup2
    from cass_cdc_pg_spark.registry import _DEDUP_PAIR_PARAMS as _PP
    from cass_cdc_pg_spark.registry import dedup_cluster_sizes_q as _dcs
    from cass_cdc_pg_spark.registry import dedup_components_q as _dcc
    from cass_cdc_pg_spark.registry import docs_fuzzy_pairs_q as _dfp

    from cass_cdc_pg_spark.registry import docs_ngram_novelty_q as _dnn
    from cass_cdc_pg_spark.registry import docs_unigram_logprob_q as _dul
    from cass_cdc_pg_spark.registry import docs_bigram_logprob_q as _dbl
    from cass_cdc_pg_spark.registry import (
        dedup_containment_pairs_q as _dcp,
    )

    hundred = {
        "docs_fuzzy_pairs": _dfp,
        "dedup_components": _dcc,
        "dedup_cluster_sizes": _dcs,
        # r13: the unigram scorer entered at a floor-bound >2 ratio
        # with rising docs/sec; the decade point is its settle-or-fix
        # evidence, same as the novelty curve got.  From r14 both LM
        # scorers read PERSISTED counts — the decade point measures
        # the index-backed score; the build capex has its own row in
        # lm_count_build_detail.
        "docs_unigram_logprob": _dul,
        # r14 (r13 verdict #2): the claim to prove is that the
        # df>1000 stop-shingle guard holds the within-bucket
        # quadratic — wall-per-decade converging while docs/sec rises
        "dedup_containment_pairs": _dcp,
        # r13 (r12 verdict #4): the novelty curve's 10x ratio sat at
        # 3.3-4.5 for two rounds with honest counters; the decade
        # point is the dedup-trio treatment — docs/sec must rise as
        # the shingle shuffle's real volume outgrows the session floor
        "docs_ngram_novelty": _dnn,
        # r14 (r13 verdict #6): the bigram tier gets the same decade
        # treatment as its unigram sibling.  The LM-artifact-building
        # entries run LAST on purpose: their warm calls pay the
        # 100x count builds (~60s for bigram), whose JVM residue
        # inflated the row that followed in the r14 closing run
        # (the fuzzy-pairs 14.54-vs-4.27 recheck episode).
        "docs_bigram_logprob": _dbl,
        # r15: decade follow-through for the r14 maintained-LM tier
        "unigram_logprob_incremental_parity":
            unigram_logprob_incremental_parity_q,
        "bigram_logprob_incremental_parity":
            bigram_logprob_incremental_parity_q,
        "docs_bigram_backoff_logprob": docs_bigram_backoff_logprob_q,
        # r14: the admission decision on top of the containment feed —
        # pure composition, O(batch + candidate pairs)
        "dedup_containment_admission": dedup_containment_admission_q,
        # r15: decade rows from birth for the two new entries, plus
        # the incremental containment feed itself (previously covered
        # only through the admission composition)
        "dedup_containment_incremental": dedup_containment_incremental_q,
        "docs_lm_admission": docs_lm_admission_q,
        "containment_index_append_parity":
            containment_index_append_parity_q,
        "minhash_index_append_parity": minhash_index_append_parity_q,
        "dedup_containment_day2": dedup_containment_day2_q,
        # r16: decade row from birth for the LSH-tier day-2 feed
        "dedup_minhash_day2": dedup_minhash_day2_q,
    }
    n_docs_1x = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    with tempfile.TemporaryDirectory() as tmp100:
        _replicate_docs(spark, sf_dir, tmp100, replicas=100)
        report["100x"] = {}
        for name, fn in hundred.items():
            t10 = report["queries"][name]["sec_10x"]
            _force_full(fn(spark, tmp100))  # warm (codegen, file listing)
            t100 = min(
                _timed(lambda: _force_full(fn(spark, tmp100)))
                for _ in range(2)
            )
            report["100x"][name] = {
                "sec_10x": t10,
                "sec_100x": t100,
                "ratio_per_decade_10x_to_100x": round(t100 / t10, 2)
                if t10
                else None,
                "docs_per_sec_10x": round(10 * n_docs_1x / t10, 1),
                "docs_per_sec_100x": round(100 * n_docs_1x / t100, 1),
            }
            print(f"# 100x {name}: 10x={t10}s 100x={t100}s "
                  f"decade ratio={t100 / t10:.2f}")
        # 100× LM count-build capex — measured AFTER the query loop:
        # the r14 closing run timed it first and the 59.8s bigram
        # build's JVM residue (GC pressure, spill files) inflated the
        # very next decade row (docs_fuzzy_pairs read 14.54 vs 4.27
        # isolated — the recheck block); the warm calls in the loop
        # above build the artifacts themselves, so nothing here is
        # needed before them.  rmtree+rebuild is value-identical, so
        # the memoized plans reading these paths stay correct.
        for tier, dirfn, buildfn in (
            ("unigram", _regc._lm_unigram_dir, _regc._lm_unigram_counts),
            ("bigram", _regc._lm_bigram_dir, _regc._lm_bigram_counts),
        ):
            _sh.rmtree(dirfn(tmp100), ignore_errors=True)
            report["lm_count_build_detail"][tier]["build_sec_100x"] = (
                _timed(lambda d=tmp100, f=buildfn: f(spark, d))
            )
        print(
            f"# lm_count_build_detail(+100x): "
            f"{report['lm_count_build_detail']}"
        )

        st100: dict = {}
        pairs100 = None

        def _gen_pairs():
            nonlocal pairs100
            pairs100 = _dedup2.minhash_lsh_pairs(
                spark.read.parquet(f"{tmp100}/documents.parquet"), **_PP
            ).localCheckpoint(eager=True)

        # r15 (r14 verdict #6): PHASE-SPLIT the cluster pipeline at
        # 100× the way copurchase was attributed — pair generation
        # (tokenize/minhash/band join), the pointer-doubling fixpoint,
        # and the two size rollups are timed separately against
        # materialized inputs, so the dedup_cluster_sizes decade row
        # (pairs + fixpoint + rollup in ONE cold call under
        # NO_DEDUP_MEMO) has its dominant phase named instead of one
        # opaque wall.
        pairs_sec = _timed(_gen_pairs)
        cc100 = None

        def _run_cc():
            nonlocal cc100
            cc100 = _dedup2.connected_components(
                pairs100.select("doc_a", "doc_b"), stats=st100
            ).localCheckpoint(eager=True)

        fix_sec = _timed(_run_cc)
        docs100 = spark.read.parquet(f"{tmp100}/documents.parquet")

        def _rollups():
            from pyspark.sql import functions as _F2

            cid = _F2.coalesce(_F2.col("component"), _F2.col("doc_id"))
            (
                docs100.select("doc_id")
                .join(
                    cc100.select(
                        _F2.col("node").alias("doc_id"), "component"
                    ),
                    "doc_id",
                    "left",
                )
                .select(cid.alias("_cid"))
                .groupBy("_cid")
                .agg(_F2.count(_F2.lit(1)).alias("cluster_size"))
                .groupBy("cluster_size")
                .agg(_F2.count(_F2.lit(1)).alias("n_clusters"))
                .count()
            )

        rollup_sec = _timed(_rollups)
        report["100x"]["dedup_components"].update(
            pairs_100x=pairs100.count(),
            nodes_100x=cc100.count(),
            fixpoint_rounds_100x=st100["rounds"],
        )
        wall_cs = report["100x"]["dedup_cluster_sizes"]["sec_100x"]
        report["dedup_cluster_sizes_detail"] = {
            "pairs_sec_100x": round(pairs_sec, 3),
            "fixpoint_sec_100x": round(fix_sec, 3),
            "rollup_sec_100x": round(rollup_sec, 3),
            "fixpoint_rounds_100x": st100["rounds"],
            "wall_100x": wall_cs,
            "dominant_phase": max(
                (
                    ("pair_generation", pairs_sec),
                    ("fixpoint", fix_sec),
                    ("rollups", rollup_sec),
                ),
                key=lambda kv: kv[1],
            )[0],
        }
        print(f"# 100x components detail: "
              f"{report['100x']['dedup_components']}")
        print(f"# cluster_sizes_detail: "
              f"{report['dedup_cluster_sizes_detail']}")

        # r16 (r15 verdict #6): PHASE-SPLIT the incremental
        # containment feed at 100× — the largest incremental wall
        # without an attribution.  Cumulative-prefix timings against
        # the PERSISTED standing index (the warm loop above built
        # it): batch_shingle_sec materializes the carve-out batch's
        # shingle/hash relation (the tokenize term);
        # index_probe_sec counts the stop-guarded new×base candidate
        # rows off the postings scan + broadcast join (the
        # corpus-linear term); the remainder of the feed wall is the
        # batch self-join + pair aggregation + scoring.  The
        # dominant phase is the scale-out lever.
        def _containment_inc_phases(d: str, wall: float) -> dict:
            from pyspark.sql import functions as _F3

            from cass_cdc_pg_spark.operators.dedup import (
                DEFAULT_MAX_DOC_FREQ,
                _token_hash,
                shingles,
            )
            from cass_cdc_pg_spark.registry import _carveout_col

            docs = _src.load_table(spark, d, "documents")
            new = docs.filter(_carveout_col("doc_id"))
            postings, _sizes, df_rel = _regc._containment_index(spark, d)
            t0 = time.time()
            new_sh = (
                shingles(new, _regc._CONTAINMENT_N)
                .select(
                    "doc_id",
                    _token_hash(_F3.col("shingle")).alias("sh_h"),
                )
                .localCheckpoint(eager=True)
            )
            batch_shingle_sec = round(time.time() - t0, 3)
            n_batch_sh = new_sh.count()
            new_df = new_sh.groupBy("sh_h").agg(
                _F3.count(_F3.lit(1)).cast("long").alias("_df_new")
            )
            stop = (
                df_rel.join(_F3.broadcast(new_df), "sh_h", "left")
                .filter(
                    _F3.col("df")
                    + _F3.coalesce(_F3.col("_df_new"), _F3.lit(0))
                    > DEFAULT_MAX_DOC_FREQ
                )
                .select("sh_h")
                .unionByName(
                    new_df.filter(
                        _F3.col("_df_new") > DEFAULT_MAX_DOC_FREQ
                    ).select("sh_h")
                )
                .distinct()
            )
            probe = (
                postings.join(_F3.broadcast(stop), "sh_h", "left_anti")
                .join(
                    _F3.broadcast(
                        new_sh.join(
                            _F3.broadcast(stop), "sh_h", "left_anti"
                        ).withColumnRenamed("doc_id", "_new_id")
                    ),
                    "sh_h",
                )
            )
            t0 = time.time()
            n_cand = probe.count()
            index_probe_sec = round(time.time() - t0, 3)
            pair_agg_sec = round(
                max(0.0, wall - batch_shingle_sec - index_probe_sec), 3
            )
            return {
                "batch_shingle_sec": batch_shingle_sec,
                "index_probe_sec": index_probe_sec,
                "pair_agg_sec_derived": pair_agg_sec,
                "batch_shingle_rows": n_batch_sh,
                "newxbase_candidate_rows": n_cand,
                "wall_100x": wall,
                "dominant_phase": max(
                    (
                        ("batch_shingle_build", batch_shingle_sec),
                        ("index_probe", index_probe_sec),
                        ("pair_agg_and_score", pair_agg_sec),
                    ),
                    key=lambda kv: kv[1],
                )[0],
            }

        report["dedup_containment_incremental_detail"] = (
            _containment_inc_phases(
                tmp100,
                report["100x"]["dedup_containment_incremental"][
                    "sec_100x"
                ],
            )
        )
        print(
            f"# containment_incremental_detail: "
            f"{report['dedup_containment_incremental_detail']}"
        )

    # ---- 100× decade point for customer_value_deciles (r11 verdict
    # #5: it crossed the ≤2-per-10× line at 2.03, and its committed
    # detail block says the growth is the frozen two-phase rank's
    # fixed multi-job floor amortizing — the decade point is the test:
    # on a fixed box, orders/sec must RISE decade over decade as real
    # work outgrows that floor).  Only orders is replicated: the
    # query reads nothing else.
    n_ord_1x = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    with tempfile.TemporaryDirectory() as tmpo:
        _replicate_orders(spark, sf_dir, tmpo, replicas=100)
        t10 = report["queries"]["customer_value_deciles"]["sec_10x"]
        _force_full(customer_value_deciles_q(spark, tmpo))  # warm
        t100 = min(
            _timed(lambda: _force_full(customer_value_deciles_q(spark, tmpo)))
            for _ in range(2)
        )
        report["100x"]["customer_value_deciles"] = {
            "sec_10x": t10,
            "sec_100x": t100,
            "ratio_per_decade_10x_to_100x": round(t100 / t10, 2)
            if t10
            else None,
            "orders_per_sec_10x": round(10 * n_ord_1x / t10, 1),
            "orders_per_sec_100x": round(100 * n_ord_1x / t100, 1),
        }
        print(f"# 100x customer_value_deciles: 10x={t10}s 100x={t100}s "
              f"decade ratio={t100 / t10:.2f}")

    # ---- 100× decade point for lineitem_part_copurchase (r12 watch
    # item 4: 10× at 1.90 with honest counters — the entry nearest the
    # line whose self-join shape most deserves the decade test).  Only
    # lineitem is replicated (the query reads nothing else); the
    # orderkey stride comes from lineitem itself since referential
    # integrity with orders is irrelevant to a lineitem-only read.
    from pyspark.sql import functions as _F2

    li_1x = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_li_1x = li_1x.count()
    hi_lk = li_1x.agg(_F2.max("l_orderkey")).first()[0] + 1
    with tempfile.TemporaryDirectory() as tmpl:
        _replicate_lineitem(spark, sf_dir, tmpl, hi_lk, replicas=100)
        t10 = report["queries"]["lineitem_part_copurchase"]["sec_10x"]
        _force_full(lineitem_part_copurchase_q(spark, tmpl))  # warm
        t100 = min(
            _timed(lambda: _force_full(lineitem_part_copurchase_q(spark, tmpl)))
            for _ in range(2)
        )
        report["100x"]["lineitem_part_copurchase"] = {
            "sec_10x": t10,
            "sec_100x": t100,
            "ratio_per_decade_10x_to_100x": round(t100 / t10, 2)
            if t10
            else None,
            "lineitem_rows_per_sec_10x": round(10 * n_li_1x / t10, 1),
            "lineitem_rows_per_sec_100x": round(100 * n_li_1x / t100, 1),
        }
        print(f"# 100x lineitem_part_copurchase: 10x={t10}s 100x={t100}s "
              f"decade ratio={t100 / t10:.2f}")

        # phase split at 100×, matched to the r15 single-aggregation
        # plan (r13 verdict #4 attributed the old distinct+self-join
        # wall; r14 verdict #3 retired that build).  Cumulative-prefix
        # timings: collect_sec times the one collect_set aggregation
        # (the orderkey shuffle — the only pass over the table);
        # pairs_cum_sec times aggregation + the map-side array pair
        # emission; the full wall adds the (p1,p2) aggregate + top-k.
        def _copurchase_phases(d: str, wall: float) -> dict:
            li = _src.load_table(spark, d, "lineitem").select(
                "l_orderkey", "l_partkey"
            )
            per = (
                li.groupBy("l_orderkey")
                .agg(
                    _F2.sort_array(
                        _F2.collect_set("l_partkey")
                    ).alias("_parts")
                )
                .filter(_F2.size("_parts") >= 2)
            )
            t0 = time.time()
            order_rows = per.count()
            collect_sec = round(time.time() - t0, 3)
            pair_expr = _F2.expr(
                "flatten(transform(_parts, (x, i) -> "
                "transform(slice(_parts, i + 2, size(_parts)), y -> "
                "struct(x AS p1, y AS p2))))"
            )
            t0 = time.time()
            pairs = per.select(
                _F2.explode(pair_expr).alias("_pr")
            ).count()
            pairs_cum_sec = round(time.time() - t0, 3)
            return {
                "orders_with_pairs": order_rows,
                "emitted_pairs": pairs,
                "collect_sec": collect_sec,
                "pairs_cum_sec": pairs_cum_sec,
                "agg_topk_sec_derived": round(max(0.0, wall - pairs_cum_sec), 3),
                "pairs_per_order": round(pairs / order_rows, 3),
            }

        report["100x"]["lineitem_part_copurchase"]["phases_100x"] = (
            _copurchase_phases(tmpl, t100)
        )
        print(
            f"# 100x copurchase phases: "
            f"{report['100x']['lineitem_part_copurchase']['phases_100x']}"
        )
        # the exact count is the AUDIT-cadence budget line as of r16
        # (bench times it under audit_lineitem_part_copurchase_sec);
        # its linear-in-emitted-pairs decade is the recorded posture,
        # not a routine-pipeline wall
        report["100x"]["lineitem_part_copurchase"]["cadence"] = "audit"

        # ---- r16: decade point for the ROUTINE-cadence sketch in the
        # same 100× dir.  The threshold literal is sized from the
        # orders row count, so orders replicates alongside lineitem
        # (key alignment is irrelevant — only the metadata row count
        # is read); at 100× t bottoms out near TARGET/total and the
        # post-filter pair volume is pinned at the ~TARGET-order
        # budget: the wall should converge to the linear scan term
        # with rows/sec rising faster than the exact query's.
        _replicate_orders(spark, sf_dir, tmpl, replicas=100)
        t10s = report["queries"]["lineitem_copurchase_sketch"]["sec_10x"]
        _force_full(lineitem_copurchase_sketch_q(spark, tmpl))  # warm
        t100s = min(
            _timed(
                lambda: _force_full(
                    lineitem_copurchase_sketch_q(spark, tmpl)
                )
            )
            for _ in range(2)
        )
        from cass_cdc_pg_spark.registry_sales import (
            _copurchase_sample_threshold as _cp_t,
        )

        report["100x"]["lineitem_copurchase_sketch"] = {
            "sec_10x": t10s,
            "sec_100x": t100s,
            "ratio_per_decade_10x_to_100x": round(t100s / t10s, 2)
            if t10s
            else None,
            "lineitem_rows_per_sec_10x": round(10 * n_li_1x / t10s, 1),
            "lineitem_rows_per_sec_100x": round(100 * n_li_1x / t100s, 1),
            "sample_threshold_100x_of_10000": _cp_t(tmpl),
            "cadence": "routine",
        }
        print(
            f"# 100x lineitem_copurchase_sketch: 10x={t10s}s "
            f"100x={t100s}s decade ratio={t100s / t10s:.2f} "
            f"t={_cp_t(tmpl)}/10000"
        )

    # ---- 100× decade point for events_weekly_active (r13: its 10×
    # ratio drifted into the 1.6-2.2 band across rounds; the decade
    # point settles whether the constant-7× contribution explode
    # stays aggregate-bound).  Only events is replicated.
    n_ev_1x = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    with tempfile.TemporaryDirectory() as tmpe:
        _replicate_events(spark, sf_dir, tmpe, replicas=100)
        t10 = report["queries"]["events_weekly_active"]["sec_10x"]
        _force_full(events_weekly_active_q(spark, tmpe))  # warm
        t100 = min(
            _timed(lambda: _force_full(events_weekly_active_q(spark, tmpe)))
            for _ in range(2)
        )
        report["100x"]["events_weekly_active"] = {
            "sec_10x": t10,
            "sec_100x": t100,
            "ratio_per_decade_10x_to_100x": round(t100 / t10, 2)
            if t10
            else None,
            "events_per_sec_10x": round(10 * n_ev_1x / t10, 1),
            "events_per_sec_100x": round(100 * n_ev_1x / t100, 1),
        }
        print(f"# 100x events_weekly_active: 10x={t10}s 100x={t100}s "
              f"decade ratio={t100 / t10:.2f}")

    with open(out_json, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
