"""End-to-end curation pipeline composition: quality gate → exact
dedup → train/val/test split → sequence packing, as ONE lazily
composed Spark plan — the flow a real training-data run executes.

Each stage is an individually-tested operator; this suite pins the
INVARIANTS that must survive composition: conservation (no doc lost
or duplicated across stages), disjointness (splits partition the
survivors), split stability (dedup before vs after split assigns
identical memberships), and token accounting (packed totals equal
the surviving train docs' totals)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cass_cdc_pg_spark.operators import dedup, text

# multi-minute Spark-heavy suite: excluded from the tight red-green
# loop (`pytest -m "not slow"`); the round gate runs it always
import pytest

pytestmark = pytest.mark.slow


def _corpus(spark, n=400):
    # every third doc is an exact dup of its predecessor; every
    # seventh is too short to pass the quality gate
    return spark.range(n).selectExpr(
        "id AS doc_id",
        """CASE
             WHEN id % 7 = 0 THEN 'short doc'
             WHEN id % 3 = 2 THEN concat('body ', CAST(id - 1 AS STRING), ' ',
                  concat_ws(' ', transform(sequence(0, 24), i -> concat('w', i))))
             ELSE concat('body ', CAST(id AS STRING), ' ',
                  concat_ws(' ', transform(sequence(0, 24), i -> concat('w', i))))
           END AS text""",
        "'en' AS lang",
        "element_at(array('web','books'), CAST(id % 2 AS INT) + 1) AS source",
        "100 AS n_chars",
    )


def test_pipeline_conservation_and_disjoint_splits(spark):
    docs = _corpus(spark)
    n_total = docs.count()

    ok = (
        text.quality_score(docs)
        .filter(F.col("quality_bucket") == "ok")
        .select("doc_id")
    )
    surviving = dedup.exact_dedup(docs.join(ok, "doc_id"))
    n_ok = ok.count()
    n_surv = surviving.count()
    assert 0 < n_surv < n_ok < n_total  # each stage really dropped docs

    split = text.train_val_test_split(surviving)
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n_surv  # disjoint + exhaustive
    assert counts.get("train", 0) > counts.get("val", 0) + counts.get("test", 0)

    # conservation through packing: every surviving train doc appears
    # exactly once, and packed token totals match the doc totals
    train = split.filter(F.col("split") == "train")
    packed = text.pack_sequences(train, seq_len=64, n_shards=4)
    assert packed.count() == train.count()
    tok_docs = train.select(
        F.sum(F.size(text.tokens(F.col("text")))).alias("t")
    ).first()["t"]
    tok_packed = packed.select(F.sum("n_tokens").alias("t")).first()["t"]
    assert tok_docs == tok_packed


def test_split_assignment_commutes_with_dedup(spark):
    """Split-then-dedup and dedup-then-split give every surviving doc
    the SAME split — the id-keyed draw is independent of corpus
    membership, so curation stages can be reordered/incrementalized
    without shuffling docs between splits."""
    docs = _corpus(spark)
    deduped = dedup.exact_dedup(docs)

    a = {r["doc_id"]: r["split"]
         for r in text.train_val_test_split(deduped).collect()}
    b_full = {r["doc_id"]: r["split"]
              for r in text.train_val_test_split(docs).collect()}
    assert a == {i: b_full[i] for i in a}


def test_pipeline_is_one_lazy_plan_no_intermediate_actions(spark):
    """The composed flow stays ONE DataFrame plan until an action:
    building quality→dedup→split triggers no Spark jobs (packing is
    excluded here — its shard offsets need a driver pass by design)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup() or [])
    docs = _corpus(spark)
    ok = (
        text.quality_score(docs)
        .filter(F.col("quality_bucket") == "ok")
        .select("doc_id")
    )
    out = text.train_val_test_split(dedup.exact_dedup(docs.join(ok, "doc_id")))
    jobs_after = len(tracker.getJobIdsForGroup() or [])
    assert jobs_after == jobs_before  # no action ran while composing
    assert out.columns[-1] == "split"


def test_ensure_layout_hard_cap_bounds_cache_even_within_age_window(tmp_path):
    """A burst of fixture variants must not grow the cache root
    unbounded just because nothing is 6h old yet (r11 advice): beyond
    4x KEEP, entries evict on the much shorter over-cap age floor.
    The floor is not zero (r12 advice): a layout a concurrent session
    just opened (touched minutes ago) survives even over-cap, so a
    burst can never rmtree a live read out from under its reader."""
    import os

    from cass_cdc_pg_spark import registry

    import time

    now = time.time()
    for i in range(20):
        d = tmp_path / f"pfx_{i:02d}"
        d.mkdir()
        # oldest 17 are past the over-cap age floor (evictable when
        # the cap is breached); the newest 3 were touched seconds ago
        # (a concurrent session mid-read) and must survive regardless
        age = (
            registry._INC_INDEX_OVERCAP_AGE_S + 100 - i
            if i < 17
            else 20 - i
        )
        os.utime(d, (now - age, now - age))

    def build(tmp: str) -> None:
        os.makedirs(tmp)

    registry._ensure_layout(str(tmp_path / "pfx_new"), "pfx_", build)
    remaining = sorted(p.name for p in tmp_path.iterdir())
    cap = 4 * registry._INC_INDEX_KEEP
    # 21 dirs → 9 over cap; all 9 candidates are past the over-cap
    # floor (the just-touched 3 sit inside the newest KEEP+cap band)
    assert len(remaining) == cap
    assert "pfx_new" in remaining and "pfx_00" not in remaining
    # the freshly-touched dirs survived
    for i in (17, 18, 19):
        assert f"pfx_{i:02d}" in remaining
