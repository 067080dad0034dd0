"""Deduplication operators over the ``documents`` table.

Four tiers, cheapest first — the standard large-corpus dedup ladder:

1. **exact**        — hash-groupBy on md5(text).  One shuffle on a
   32-hex key; at 100 TB, group on the hash (never the full text) so
   shuffle rows are ~40 bytes.
2. **ngram-jaccard** — token-shingle inverted index + self-join;
   exact set similarity, quadratic only within shingle buckets.
3. **MinHash-LSH**  — signature bands → candidate buckets → verify;
   sub-quadratic near-dup at corpus scale.
4. **SimHash**      — 64-bit fingerprints, hamming-near buckets.

Token hashing is md5-based (`_token_hash`) rather than xxhash64 so
the DuckDB oracle can reproduce signatures bit-for-bit (both engines
ship md5; they do not share any cheaper hash).
"""

from __future__ import annotations

import string as _string

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cass_cdc_pg_spark.operators.text import tokens

#: MinHash modulus — small enough that (h % P) * a fits in int64
#: under ANSI arithmetic: both factors < 2^30·... (P ≈ 2^30, so the
#: product is < 2^60).
MINHASH_P = 1_000_000_007


def _token_hash(col: Column) -> Column:
    """Portable 60-bit token hash: first 15 hex chars of md5 → bigint.

    15 hex = 60 bits, safely inside a signed 64-bit integer, so the
    same `CAST(CONCAT('0x', SUBSTR(md5(t),1,15)) AS BIGINT)` is
    expressible in DuckDB (`('0x'||substr(md5(t),1,15))::BIGINT`).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dup_groups(documents: DataFrame) -> DataFrame:
    """Exact dedup: one row per distinct text with count + keeper id."""
    return (
        documents.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per distinct text."""
    keep = exact_dup_groups(documents).select(F.col("keep_doc_id").alias("doc_id"))
    return documents.join(keep, "doc_id", "left_semi")


def shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct n-token shingles per document.

    Gram construction is the shared :func:`text.zipped_grams` (the
    zipped shifted-view formulation this module introduced in r6 —
    4.8× faster map side than per-position slices; see its
    docstring); shingling is the dominant map-side cost of the whole
    MinHash pipeline, so that formulation is what matters at 100 TB.
    Documents with fewer than *n* tokens produce no shingles."""
    from cass_cdc_pg_spark.operators.text import zipped_grams

    sh = F.array_distinct(zipped_grams(tokens(F.col("text")), n))
    return documents.select("doc_id", F.explode(sh).alias("shingle"))


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted index.

    Plan: shingle → self-join on shingle (only docs sharing ≥1
    shingle ever meet) → per-pair intersection count → Jaccard.

    *max_doc_freq* is the 100 TB scale guard: a shingle appearing in
    more than that many documents is a **stop-shingle** and is dropped
    from the join (the self-join is quadratic *within* a shingle
    bucket, so one corpus-common bigram otherwise explodes the
    candidate set).  Dropping it undercounts intersections for the
    affected pairs, so computed Jaccard becomes a lower bound — the
    standard trade (set it high enough that only boilerplate shingles
    are hit).  ``None`` (exact mode, the oracle-checked default)
    keeps everything.
    """
    # the join keys on the 60-bit shingle hash, not the shingle
    # string: the key never reaches the output (only intersection
    # COUNTS do), hash equality == string equality absent a 60-bit
    # collision (P ≈ n_shingles²/2⁶¹; the oracle hash-match run
    # verifies none exists in the fixture), and the self-join's
    # shuffle — the volume term of this whole operator — carries an
    # 8-byte long instead of a ~20-byte string with string compares
    # in the probe loop (measured 1.8× end-to-end at sf0.1)
    sh = shingles(documents, n).select(
        "doc_id", _token_hash(F.col("shingle")).alias("sh_h")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_doc_freq is not None:
        # broadcast the (small) stop set, not its (huge) complement.
        # The df is counted on the HASH, the oracle counts it on the
        # shingle STRING — same collision caveat as the join key
        # above: a 60-bit collision merging two shingles' df past the
        # cap would drop both on this side only.  P ≈ n_shingles²/2⁶¹
        # and the hash-match run pins the fixtures collision-free;
        # counting df on the string instead would put ~20-byte strings
        # back on this groupBy's shuffle — the exact volume term the
        # hash exists to remove (r13 advice: documented trade).
        stop = (
            sh.groupBy("sh_h")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("sh_h")
        )
        sh = sh.join(F.broadcast(stop), "sh_h", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.sh_h") == F.col("b.sh_h"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def shingle_containment_pairs(
    documents: DataFrame,
    n: int = 2,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric shingle-containment near-dup pairs:
    containment(A→B) = |A∩B| / |A| over distinct n-gram shingle sets.

    The case symmetric Jaccard structurally misses: a short document
    quoted whole inside a much longer one (boilerplate-wrapped
    articles, quote-expansions, excerpt pages) has |A∩B| ≈ |A| but
    Jaccard ≈ |A|/|B| → 0 as the wrapper grows.  Training-data dedup
    wants these pairs — the contained doc contributes no new text —
    so the pair qualifies when EITHER direction's containment clears
    *threshold*; both directions are reported (plus Jaccard for
    context) and the keep/drop policy stays with the caller, like
    ``ngram_jaccard_pairs``.

    Plan: identical inverted-index shape to ``ngram_jaccard_pairs``
    (reference parity: the validation/reconcile tier's set-overlap
    checks) — shingle → 60-bit hash → self-join within shingle
    buckets only → per-pair intersection count → two divisions.  The
    shuffle carries 8-byte hashes; *max_doc_freq* is the same
    stop-shingle guard (containment becomes a lower bound when set)."""
    sh = shingles(documents, n).select(
        "doc_id", _token_hash(F.col("shingle")).alias("sh_h")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_doc_freq is not None:
        # df counted on the hash, oracle counts it on the string —
        # the documented 60-bit-collision trade; see the identical
        # guard in ngram_jaccard_pairs for the full caveat
        stop = (
            sh.groupBy("sh_h")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("sh_h")
        )
        sh = sh.join(F.broadcast(stop), "sh_h", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.sh_h") == F.col("b.sh_h"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _containment_scores(inter, sizes, threshold)


def _containment_scores(
    inter: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """Shared score tail of the containment operators: join per-doc
    shingle-set sizes onto the per-pair intersection counts, compute
    both containment directions + Jaccard (ONE expression shape, so
    the full and incremental variants cannot drift), keep pairs where
    either direction clears *threshold*."""
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("sz_b"))
    c_a = F.round(F.col("inter").cast("double") / F.col("sz_a"), 4)
    c_b = F.round(F.col("inter").cast("double") / F.col("sz_b"), 4)
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            c_a.alias("containment_a"),
            c_b.alias("containment_b"),
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(
            F.greatest(F.col("containment_a"), F.col("containment_b"))
            >= threshold
        )
    )


def containment_index_relations(
    documents: DataFrame, n: int = 3
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The standing inverted index of the incremental containment
    path, as three relations a daily pipeline persists beside the
    corpus snapshot: postings (doc_id, sh_h), sizes (doc_id, n_sh),
    and the document-frequency table (sh_h, df).  df is stored — not
    recomputed per batch — so the stop-shingle guard at admission
    time is a map-side lookup over the standing relation, never a
    corpus-wide re-aggregation.

    MAINTAINED, not rebuilt (r15): after a batch is admitted, the
    pipeline merges it into these three relations via
    :func:`merge_containment_index` and persists the result as the
    next snapshot's standing index — the incremental pair feed and
    the admission decision then read the maintained index without
    drift (``containment_index_append_parity`` hash-proves merged ==
    rebuilt against a full-corpus recompute oracle)."""
    sh = shingles(documents, n).select(
        "doc_id", _token_hash(F.col("shingle")).alias("sh_h")
    ).localCheckpoint(eager=False)  # feeds all three aggregates
    return (
        sh,
        sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh")),
        sh.groupBy("sh_h").agg(F.count(F.lit(1)).cast("long").alias("df")),
    )


def merge_containment_index(
    postings: DataFrame,
    sizes: DataFrame,
    df_rel: DataFrame,
    new_docs: DataFrame,
    n: int = 3,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Merge an ADMITTED batch into the standing containment inverted
    index (new r15, r14 verdict #5) — the maintenance step that keeps
    the daily-feed story closed: without it the index the admission
    path probes goes stale after the first admitted batch.  Postings
    and sizes APPEND (batch doc ids are disjoint from the corpus by
    the carve-out construction, so union IS the merged relation —
    no dedup, no shuffle), and the document-frequency table merges
    ADDITIVELY (union + sum per shingle hash — the
    ``text.merge_counts`` posture; df is a count, and counts are
    additive across disjoint doc sets), so merged == rebuilt EXACTLY,
    relation for relation — the ``containment_index_append_parity``
    query hash-proves it against a full-corpus recompute oracle.

    Scale shape: the standing postings/sizes never move — the only
    shuffle is the batch's own shingle aggregation plus the df merge,
    a (sh_h) shuffle of vocabulary-sized count relations (8-byte
    keys), exactly the LM tier's merge-delta cost model.  A pipeline
    persists the three returned relations as the next snapshot's
    standing index (the ``_ensure_layout`` protocol)."""
    new_sh = shingles(new_docs, n).select(
        "doc_id", _token_hash(F.col("shingle")).alias("sh_h")
    ).localCheckpoint(eager=False)  # feeds postings, sizes, df delta
    new_sizes = new_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh")
    )
    new_df = new_sh.groupBy("sh_h").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    merged_df = (
        df_rel.unionByName(new_df)
        .groupBy("sh_h")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    return (
        postings.unionByName(new_sh),
        sizes.unionByName(new_sizes),
        merged_df,
    )


def incremental_containment_pairs(
    base_postings: DataFrame,
    base_sizes: DataFrame,
    base_df: DataFrame,
    new_docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    broadcast_new: bool = True,
) -> DataFrame:
    """Containment near-dup pairs INVOLVING a new daily batch, against
    a STANDING inverted index (r13 verdict #2's flatten lever): the
    corpus postings/sizes/df are read from the persisted index —
    never re-shingled, never re-aggregated — the batch's shingles
    broadcast into one map-side pass over the postings (new×base
    candidates), and the batch self-joins for new×new pairs (bounded
    by batch size).  Semantics: exactly the new-involving subset of
    :func:`shingle_containment_pairs` over base ∪ batch — the oracle
    posture is the full recompute restricted to new-involving pairs.

    The stop-shingle guard composes across the split: a shingle is
    stopped iff its TOTAL df (standing df + batch df) exceeds
    *max_doc_freq* — identical to the full operator's corpus-wide df,
    because counts are additive.  The standing df relation is scanned
    once map-side (broadcast batch df), so the guard costs O(index
    scan), not a shuffle.

    Scale shape: the corpus crosses NO shuffle — one pruned scan of
    the postings with a broadcast hash join; everything shuffled is
    O(batch + candidate pairs).

    *broadcast_new* (r14 advice): the broadcast side is the BATCH
    SHINGLE-POSTINGS relation — ~16 bytes per distinct (doc, shingle)
    — so the hard bound is executor/driver broadcast memory in batch
    *shingles*, not batch docs; a jumbo backfill (or a carve-out
    proportional to a huge corpus) can exceed Spark's broadcast
    limits and fail with an OOM rather than degrade.  Set it False
    there and both intersection joins fall back to a shuffled hash
    join on ``sh_h`` — the corpus side then shuffles once, which is
    still linear (the minhash tier's ``broadcast_new`` trade at
    ``incremental_minhash_pairs``)."""
    new_sh = (
        shingles(new_docs, n)
        .select("doc_id", _token_hash(F.col("shingle")).alias("sh_h"))
        # feeds sizes, batch df, both intersection joins
        .localCheckpoint(eager=False)
    )
    new_sizes = new_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh")
    )
    if max_doc_freq is not None:
        new_df = new_sh.groupBy("sh_h").agg(
            F.count(F.lit(1)).cast("long").alias("_df_new")
        )
        # total df = standing + batch (additive, so identical to the
        # full operator's corpus-wide count): one map-side pass over
        # the standing df relation + the batch-only complement
        stop = (
            base_df.join(F.broadcast(new_df), "sh_h", "left")
            .filter(
                F.col("df") + F.coalesce(F.col("_df_new"), F.lit(0))
                > max_doc_freq
            )
            .select("sh_h")
            .unionByName(
                new_df.filter(F.col("_df_new") > max_doc_freq).select(
                    "sh_h"
                )
            )
            .distinct()
        )
        # r17 (was: unconditional freeze + anti-join on BOTH sides,
        # r16): in broadcast mode the base-postings stop anti-join is
        # REDUNDANT — the nb join is an inner join against the
        # already-stop-filtered batch side, so stopped base postings
        # can never match; they stream through one broadcast probe
        # either way.  Dropping it leaves the stop set with ONE
        # consumer, so its subtree inlines into the filtered-batch
        # materialization below — no separate checkpoint blocks, no
        # stop broadcast build (2 AQE jobs off every
        # incremental-family execution, results row-identical).
        if not broadcast_new:
            # shuffled-join fallback: base postings DO shuffle on
            # sh_h, and a stopped boilerplate shingle is exactly the
            # hot key that must not reach that exchange — keep the
            # anti-join and freeze the now-twice-consumed stop set
            # (without the freeze the stop subtree re-expands into
            # every consumer — the r16 4×-plan-growth disease).
            # Cluster caveat (Spark's localCheckpoint contract): the
            # blocks are executor-local and NON-replicated — an
            # executor loss fails downstream consumers instead of
            # recomputing, and dynamic allocation can reap the
            # holder.  Acceptable here because every query execution
            # re-materializes its own tiny checkpoint (no cross-run
            # state); a deployment running under dynamic allocation
            # should swap these for persist(DISK_ONLY_2) or a real
            # checkpoint directory.
            stop = stop.localCheckpoint(eager=False)
            base_postings = base_postings.join(
                F.broadcast(stop), "sh_h", "left_anti"
            )
        new_sh = new_sh.join(
            F.broadcast(stop), "sh_h", "left_anti"
        ).localCheckpoint(eager=False)  # 3 consumers: nb, nn.a, nn.b
    # new×base: ids are disjoint by construction (the carve-out), so
    # no self-pair filter is needed; orientation normalized below
    new_probe = new_sh.withColumnRenamed("doc_id", "_new_id")
    nb_pre = (
        base_postings.withColumnRenamed("doc_id", "_base_id")
        .join(
            F.broadcast(new_probe) if broadcast_new else new_probe,
            "sh_h",
        )
        .select(
            F.least("_base_id", "_new_id").alias("doc_a"),
            F.greatest("_base_id", "_new_id").alias("doc_b"),
        )
    )
    # new×new: the full operator's within-bucket self-join, batch-bounded
    a = new_sh.alias("a")
    b = new_sh.alias("b")
    nn_pre = (
        a.join(b, F.col("a.sh_h") == F.col("b.sh_h"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
    )
    # ONE per-pair aggregate over the unioned branches instead of one
    # per branch (r17): the nb (base×new) and nn (new×new) pair key
    # spaces are disjoint — batch ids never appear in the standing
    # index — so count-over-union equals the old union-of-counts row
    # for row, and the plan carries ONE (doc_a, doc_b) Exchange where
    # it carried two (partial aggregation still folds each branch
    # map-side before the shuffle).
    inter = (
        nb_pre.unionByName(nn_pre)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = base_sizes.unionByName(new_sizes)
    return _containment_scores(inter, sizes, threshold)


#: pipeline default for the stop-shingle cap: a shingle shared by more
#: documents than this is boilerplate (headers, licence text), and the
#: quadratic-within-bucket join must never see it at corpus scale
DEFAULT_MAX_DOC_FREQ = 1000


def ngram_jaccard_pairs_scalable(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = DEFAULT_MAX_DOC_FREQ,
) -> DataFrame:
    """The production entry point for n-gram Jaccard dedup: identical
    to :func:`ngram_jaccard_pairs` but with the stop-shingle cap ON by
    default — at 100 TB a single corpus-common shingle makes the exact
    self-join quadratic in corpus size, so unbounded mode must be the
    opt-in, not the default (the exact variant stays the oracle-checked
    declared query, where the fixture is cap-free by construction)."""
    return ngram_jaccard_pairs(
        documents, n=n, threshold=threshold, max_doc_freq=max_doc_freq
    )


def minhash_coeffs(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """The fixed seeded (a_i, b_i) table — shared with the DuckDB
    oracle generator so signatures are bit-identical across engines."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    documents: DataFrame, num_hashes: int = 32, n: int = 3
) -> DataFrame:
    """(doc_id, sig: array<bigint>) MinHash signatures.

    hash_i(s) = (a_i * h(s) + b_i) mod P with h = portable md5-based
    token hash, (a_i, b_i) from a fixed seeded table — deterministic
    across runs and engines.
    """
    coeffs = minhash_coeffs(num_hashes)
    sh = shingles(documents, n).withColumn(
        "h", _token_hash(F.col("shingle")) % F.lit(MINHASH_P)
    )
    # one parsed SQL string per agg instead of ~8 py4j expression
    # calls each (r16): building the 32 min-aggs operator-by-operator
    # cost ~0.5 s of DRIVER time per constructed plan — paid on every
    # timed pass of every minhash-family query.  `{a}L` long literals
    # reproduce the old lit(int)->long promotion exactly (verified by
    # row-identical output and the oracle hash).
    aggs = [
        F.expr(f"min((h * {a}L + {b}L) % {MINHASH_P}L) AS mh{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id",
        F.expr(
            "array(" + ",".join(f"mh{i}" for i in range(num_hashes)) + ") AS sig"
        ),
    )


def banded_signatures(
    documents: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """(doc_id, sig, band, bucket) — the LSH band table: one row per
    (doc, band) with the band's md5 bucket and the full signature.

    This is the relation a production pipeline MATERIALIZES once per
    corpus snapshot: same-corpus dedup joins it against itself
    (:func:`minhash_lsh_pairs`) and a daily new-doc batch joins
    against the STORED table (:func:`incremental_minhash_pairs`)
    instead of re-hashing the whole corpus."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(documents, num_hashes, n)
    # single parsed expression for the whole band-struct array (r16):
    # the per-band struct/md5/element_at construction was ~100 py4j
    # round trips of driver time per constructed plan.  `sig[i]` is
    # the 0-based GetArrayItem — identical to the old
    # element_at(sig, i + 1).
    bb = "array(" + ",".join(
        f"struct({bi} AS band, md5(concat_ws(',', "
        + ",".join(
            f"sig[{bi * rows_per_band + r}]" for r in range(rows_per_band)
        )
        + ")) AS bucket)"
        for bi in range(bands)
    ) + ")"
    return sig.select(
        "doc_id", "sig", F.explode(F.expr(bb)).alias("bb")
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def _sig_agreement(num_hashes: int):
    """Estimated Jaccard from the two signatures on a joined
    (a, b)-aliased row — symmetric, map-side."""
    return F.expr(
        "cast(size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y),"
        f" eq -> eq)) as double) / {num_hashes}"
    )


def _first_agreeing_band(num_hashes: int, bands: int):
    """0-based index of the first band on which the (a, b)-aliased
    signatures agree element-wise — the map-side pair-dedup key (r8):
    a pair matching k bands joins k times, and emitting it only where
    ``a.band == first_agreeing_band`` replaces the old
    ``dropDuplicates`` Exchange (a real shuffle at 100 TB) with a
    filter computed from the two signatures already on the row."""
    rows_per_band = num_hashes // bands
    bands_sql = ",".join(
        "(" + " AND ".join(
            f"a.sig[{bi * rows_per_band + r}] = "
            f"b.sig[{bi * rows_per_band + r}]"
            for r in range(rows_per_band)
        ) + ")"
        for bi in range(bands)
    )
    return F.expr(f"array_position(array({bands_sql}), true) - 1")


def minhash_lsh_pairs(
    documents: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, Jaccard-estimated.

    rows-per-band = num_hashes/bands; docs agreeing on any full band
    become candidates (join on band hash — the classic LSH bucket
    join); candidates are scored by signature agreement fraction.

    est_jaccard is computed AT THE JOIN OUTPUT and the threshold is
    applied BEFORE the pair dedup: a pair matching k bands re-scores
    its 32-element zip_with k times (map-side CPU, bounded by bands),
    but only 24-byte above-threshold (doc_a, doc_b, est) rows flow
    on — at 100 TB any pair shuffle is the volume term, the
    re-scoring is noise.  Each pair is emitted ONLY from its first
    agreeing band (see :func:`_first_agreeing_band` — the r8 dedup
    Exchange removal); side effect: a pure md5 bucket collision
    (buckets equal, band values not) never yields a candidate, which
    matches the oracle's join-on-band-values semantics exactly.
    """
    return lsh_pairs_from_bands(
        banded_signatures(documents, num_hashes, bands, n),
        num_hashes,
        bands,
        threshold,
    )


def lsh_pairs_from_bands(
    banded: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """The self-join stage of :func:`minhash_lsh_pairs`, taking an
    already-built (possibly MATERIALIZED) band table — so a pipeline
    that stores its band table per corpus snapshot
    (:func:`banded_signatures`) can re-derive same-corpus pairs
    without re-shingling, the same way the incremental path probes
    it.  ``minhash_lsh_pairs(docs, ...)`` ≡
    ``lsh_pairs_from_bands(banded_signatures(docs, ...), ...)`` —
    identical plan by composition."""
    a = banded.alias("a")
    b = banded.alias("b")
    est = _sig_agreement(num_hashes)
    first_band = _first_agreeing_band(num_hashes, bands)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(F.col("a.band") == first_band)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(est, 4).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


def merge_band_table(
    band_table: DataFrame,
    new_docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Merge an ADMITTED batch into the standing MinHash band table
    (new r15 — the maintenance step the containment index got this
    round, applied to the LSH tier): a document's signature and band
    buckets are functions of ITS OWN shingles only, so appending the
    batch's :func:`banded_signatures` rows to the stored table (doc
    ids disjoint by the carve-out construction — union IS the merge,
    nothing reshuffles and the corpus rows never move) yields EXACTLY
    the table a full-corpus rebuild would produce — the
    ``minhash_index_append_parity`` query hash-proves it against a
    full recompute oracle.  Without this step the standing table
    :func:`incremental_minhash_pairs` probes goes stale after the
    first admitted batch.  Cost: O(batch) tokenize/minhash + the
    append; a pipeline persists the result as the next snapshot's
    standing index (the ``_ensure_layout`` protocol).

    Only the BATCH side rides a lazy checkpoint: consumers that run
    several actions over the merged table (the parity digest's two
    branches) must not re-pay the batch minhash per action, while the
    corpus side stays a plain parquet scan — materializing the whole
    merged table would trade cheap re-scans for an O(corpus) block
    write, the wrong trade at 100 TB."""
    nb = banded_signatures(new_docs, num_hashes, bands, n).localCheckpoint(
        eager=False
    )
    return band_table.select("doc_id", "sig", "band", "bucket").unionByName(nb)


def incremental_minhash_pairs(
    band_table: DataFrame,
    new_docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    broadcast_new: bool = True,
) -> DataFrame:
    """Incremental corpus dedup, pair stage: near-dup pairs involving
    at least one NEW document — the join a training-data pipeline
    runs DAILY (new crawl batch vs the standing corpus) instead of
    re-deduping 100 TB from scratch.

    *band_table* is the existing corpus's MATERIALIZED
    :func:`banded_signatures` relation ((doc_id, sig, band, bucket) —
    stored once per corpus snapshot); *new_docs* is the raw new batch
    (doc ids must be disjoint from the corpus).  Only the new batch
    is shingled/hashed; the corpus is never re-tokenized and NEVER
    self-joined — candidates are (new × (corpus ∪ new)) band-bucket
    matches, so the base×base quadratic term is gone entirely and the
    big side is touched exactly once, as a probe target.

    With *broadcast_new* (default) the new band table broadcasts
    (#new_docs × bands rows ≈ ~300 B each — a daily batch fits in
    memory at any corpus size) and the corpus side never shuffles AT
    ALL; set it False for a jumbo backfill batch and the join
    degrades to a hash shuffle on (band, bucket), which is still
    linear in corpus size.

    Exactness: a pair's emission depends only on ITS two signatures,
    so {pairs on grown corpus} = {pairs on old corpus} ∪ {this} —
    disjointly.  Emission discipline matches
    :func:`minhash_lsh_pairs`: first agreeing band only, scored at
    the join output, ``doc_a < doc_b``; old–new pairs emit from the
    (new, old) side once, new–new pairs are ordered by id.
    """
    # lazy-checkpoint the new batch's band table: it feeds BOTH join
    # sides (broadcast probe + the corpus union), and without the
    # freeze each side would re-tokenize/shingle/minhash the batch —
    # 2× the daily hash work for nothing (r9 review)
    nb = banded_signatures(new_docs, num_hashes, bands, n).localCheckpoint(
        eager=False
    )
    corpus = band_table.select("doc_id", "sig", "band", "bucket").withColumn(
        "_new", F.lit(False)
    )
    both = corpus.unionByName(nb.withColumn("_new", F.lit(True)))
    a = (F.broadcast(nb) if broadcast_new else nb).alias("a")
    b = both.alias("b")
    est = _sig_agreement(num_hashes)
    first_band = _first_agreeing_band(num_hashes, bands)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            # old partner: always emit (the old side can't emit it);
            # new partner: order by id so new-new pairs emit once
            & (
                (~F.col("b._new"))
                | (F.col("a.doc_id") < F.col("b.doc_id"))
            ),
        )
        .filter(F.col("a.band") == first_band)
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
            F.round(est, 4).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


def simhash(documents: DataFrame, bits: int = 64) -> DataFrame:
    """(doc_id, simhash) — 64-bit per-token md5 bit-vote fingerprint.

    bit b of the fingerprint = 1 iff more distinct tokens have bit b
    set than clear.  Bits 0-31 vote from the first md5 half, bits
    32-63 from the second (two independent 60-bit hashes — a single
    60-bit hash cannot feed 64 independent bits).  Pure column
    algebra: explode tokens → per-bit votes via shiftright/AND → sum →
    reassemble; bit 63 is assembled with ``shiftleft`` so the sign bit
    lands without 64-bit literal overflow.
    """
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")
    md5 = F.md5(F.col("t"))
    tok = (
        documents.select(
            "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("t")
        )
        .withColumn("h1", F.conv(F.substring(md5, 1, 15), 16, 10).cast("long"))
        .withColumn("h2", F.conv(F.substring(md5, 17, 15), 16, 10).cast("long"))
    )

    def _vote_src(b: int):
        return F.col("h1") if b < 32 else F.col("h2")

    votes = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.shiftright(_vote_src(b), b % 32).bitwiseAND(F.lit(1))).alias(f"b{b}")
            for b in range(bits)
        ],
    )
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"b{b}") * 2 > F.col("n"), F.lit(1)).otherwise(F.lit(0))
        term = F.shiftleft(bit.cast("long"), b)
        fp = term if fp is None else fp + term
    return votes.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_pairs(
    documents: DataFrame,
    bits: int = 64,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairing stage: (doc_a, doc_b, hamming) for all
    pairs within *max_hamming* fingerprint bits.

    Banded exact-match join (``bands`` equal-width slices of the
    fingerprint): by pigeonhole, a pair differing in ≤ ``bands - 1``
    bits agrees on at least one full band, so with the defaults
    (4 bands, hamming ≤ 3) recall is 1.0 — no all-pairs comparison,
    candidates only meet inside a band bucket, exactly the MinHash-LSH
    join shape.  Verification is one ``bit_count(xor)`` per candidate.
    """
    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    width = bits // bands
    mask = (1 << width) - 1
    fp = simhash(documents, bits)
    banded = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("simhash"), b * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")

    # First-agreeing-band dedup (r8, same trade as minhash_lsh_pairs):
    # a pair agreeing on k bands joins k times; band agreement is
    # EXACTLY bucket equality here (the bucket IS the band slice), so
    # "emit only from the first agreeing band" is a map-side filter on
    # the two fingerprints already on the row — the old dropDuplicates
    # was a full Exchange over the candidate pairs.
    def _slice(col, bi):
        return F.shiftright(col, bi * width).bitwiseAND(F.lit(mask))

    band_agree = F.array(
        *[
            _slice(F.col("a.simhash"), bi) == _slice(F.col("b.simhash"), bi)
            for bi in range(bands)
        ]
    )
    first_band = F.array_position(band_agree, F.lit(True)) - 1
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(F.col("a.band") == first_band)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.simhash").alias("fp_b"),
        )
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components by min-label propagation with pointer
    doubling — the final stage of a dedup pipeline: near-dup *pairs*
    (any tier above) become *clusters*, each labelled by its smallest
    member (the canonical document to keep).

    Each round does two steps:

    1. propagate: ``label(v) = min(label(v), min over neighbours)``
    2. shortcut (pointer doubling): ``label(v) = label(label(v))`` —
       every label is itself a node id, so one self-join re-points each
       node at its label's label, halving min-chain depth.

    Propagation alone needs diameter-many rounds — fine for near-dup
    graphs (unions of dense clusters, diameter ≲ 2-3) but pathological
    on a long path, where it would hit the round cap unconverged.  With
    the shortcut the label reach follows ``k ← 2k + 2``, so a path of n
    nodes converges in ~log2(n) rounds (the Kiveris et al. "Connected
    Components in MapReduce" contraction, expressed as label algebra).

    Cost discipline: exactly TWO driver actions per round.  The previous
    label rides through the round's own aggregation (a null-safe
    ``min`` over the self row), so the convergence flag ``chg`` is a
    plain column of the round's output — no old-vs-new join, no extra
    shuffle.  Job 1 materialises the round (eager ``localCheckpoint``,
    which also cuts lineage so the plan stays flat); job 2 is a
    single-stage ``max(chg)`` over the just-cached partitions (an
    aggregate, not ``limit(1).count()``, so it can't escalate into
    multiple limit-probe jobs).  ``tests/test_plan_shapes.py`` pins the
    2-actions-per-round budget via a job-group count (with AQE and
    auto-broadcast normalised off so one action == one job id).

    Output: (node, component) for every node appearing in *edges*.
    If *stats* is given, ``stats["rounds"]`` records rounds executed.
    """
    # Materialise the symmetrised edge list FIRST and derive the vertex
    # set from it: `edges` is typically the tail of an expensive
    # candidate-generation pipeline (MinHash-LSH bands etc.), and
    # computing verts and sym independently would execute that whole
    # upstream twice.  sym holds both directions, so its `u` column
    # already covers every endpoint.
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Neighbour-min label init (r8): label(v) = min(v, direct
    # neighbours) — one aggregation folded into the labels-checkpoint
    # job that the identity init already paid for.  This IS round 1's
    # propagate step, so unions of cliques (the near-dup shape, where
    # every member sees the minimum directly) converge in ONE loop
    # round (the confirming pass) instead of two.  Any
    # label(v) ≤ v naming a same-component node is a valid state for
    # min-label + pointer doubling, so the fixpoint is unchanged.
    labels = (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("_mn"))
        .select(
            "node", F.least(F.col("node"), F.col("_mn")).alias("component")
        )
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        cur = labels.select("node", "component")
        neighbour = (
            sym.join(cur, sym["v"] == cur["node"])
            .select(
                F.col("u").alias("node"),
                "component",
                F.lit(None).cast(cur.schema["component"].dataType).alias("old"),
            )
        )
        # self rows carry the previous label in `old`; min() skips the
        # neighbour rows' nulls, so one groupBy yields BOTH the new
        # minimum label and the label it replaced.
        propagated = (
            cur.withColumn("old", F.col("component"))
            .unionByName(neighbour)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min("old").alias("old"),
            )
        )
        # shortcut: labels are node ids, so label(label(v)) is one
        # self-join away; left join because a component min may have
        # already reached its fixpoint row (label(m) = m)
        mapping = propagated.select(
            F.col("node").alias("_lbl_node"), F.col("component").alias("_lbl_comp")
        )
        new_labels = (
            propagated.join(
                mapping, propagated["component"] == mapping["_lbl_node"], "left"
            )
            .select(
                "node",
                F.coalesce("_lbl_comp", "component").alias("component"),
                (F.coalesce("_lbl_comp", "component") != F.col("old")).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.agg(F.max("chg")).first()[0]
        labels = new_labels
        if not changed:
            break
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select("node", "component")


def incremental_components(
    base_labels: DataFrame,
    new_edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
    stats: dict | None = None,
    broadcast_remap: bool = True,
) -> DataFrame:
    """Incremental corpus dedup, cluster stage: merge a new batch's
    near-dup edges (:func:`incremental_minhash_pairs`) into an
    EXISTING component assignment without recomputing the global
    fixpoint — the daily-batch companion of
    :func:`connected_components`.

    Algorithm (exact, not approximate):

    1. **Condense**: map each new-edge endpoint to its existing
       component label (nodes the base assignment has never seen —
       i.e. new docs — represent themselves); drop edges whose two
       endpoints condense to the same label (already merged).
    2. **Solve small**: run the pointer-doubling fixpoint on the
       condensed graph only — its vertices are (touched base labels ∪
       new doc ids), so the iterative work is O(new batch), never
       O(corpus), regardless of corpus size.
    3. **Remap**: base nodes whose component label appears in the
       condensed solution take its merged label (broadcast join of
       the tiny remap relation against the base assignment — one
       map-side pass over the big side); new nodes take their
       condensed label directly.

    Exactness: every base label is the MIN id of its base component,
    and a condensed component's label is the min over its members
    (base labels and new ids) — which IS the global min of the merged
    cluster, so labels equal a full recompute's, member for member
    (pinned by test and by the driver oracle of
    ``dedup_incremental_components``, whose DuckDB twin recomputes
    the full graph).  The output covers exactly the nodes a full
    recompute would: every base node plus every new node touching an
    edge.

    *broadcast_remap* assumes the condensed solution is small (daily
    batches touch few components); a backfill that merges a large
    fraction of the corpus should set it False to fall back to a
    shuffled equi-join on the label.
    """
    e = new_edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    lu = base_labels.select(F.col("node").alias("u"), F.col("component").alias("cu"))
    lv = base_labels.select(F.col("node").alias("v"), F.col("component").alias("cv"))
    cond = (
        e.join(lu, "u", "left")
        .join(lv, "v", "left")
        .select(
            F.coalesce("cu", "u").alias("a"), F.coalesce("cv", "v").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
    )
    cc = connected_components(cond, "a", "b", max_iter=max_iter, stats=stats)
    remap = cc.select(
        F.col("node").alias("_k"), F.col("component").alias("_c")
    )
    if broadcast_remap:
        remap = F.broadcast(remap)
    base_out = (
        base_labels.join(remap, base_labels["component"] == remap["_k"], "left")
        .select("node", F.coalesce("_c", "component").alias("component"))
    )
    new_nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .join(base_labels.select("node"), "node", "left_anti")
    )
    new_out = (
        new_nodes.join(remap, new_nodes["node"] == remap["_k"], "left")
        .select("node", F.coalesce("_c", F.col("node")).alias("component"))
    )
    return base_out.unionByName(new_out)


def incremental_admission(
    merged_labels: DataFrame,
    new_ids: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental corpus dedup, decision stage: which NEW docs are
    ADMITTED into the corpus — the output a daily ingestion job
    actually acts on (pairs and clusters are evidence; this is the
    verdict).

    First-seen wins: a new doc is admitted iff its near-dup cluster
    (on the grown graph — *merged_labels* from
    :func:`incremental_components`; absent nodes are singletons)
    contains NO incumbent (base) doc AND the doc is the lowest-id new
    member of its cluster.  An incumbent is never displaced — even by
    a new doc with a smaller id — which is what distinguishes
    admission from the label's ``is_canonical`` flag (labels are
    min-ids; incumbency is seniority).

    Scale shape — NO corpus-wide join anywhere (r9 review): an
    incumbent whose cluster is touched by a new doc is connected to
    that new doc, so it necessarily appears in *merged_labels* — an
    isolated base doc's cluster is just itself and can never contain
    a new doc.  Incumbent counting therefore never consults the
    corpus id list: the merged assignment (the materialized table a
    pipeline stores) is scanned ONCE, semi-filtered map-side by the
    broadcast touched-cluster set (O(new batch) ids), and the new
    batch — which fits in memory by the same standing assumption the
    pair stage's ``broadcast_new`` makes — broadcasts into every
    other join, so nothing big ever shuffles.

    *new_ids*: one-column id DataFrame of the new batch (ids disjoint
    from the corpus).  Output: (id_col, component_id, admit) for
    every new doc.
    """
    lbl = merged_labels.withColumnRenamed("node", id_col)
    # the new batch's own labels: restrict the big assignment to new
    # ids map-side (broadcast semi), then resolve singletons
    lbl_new = lbl.join(F.broadcast(new_ids), id_col, "left_semi")
    new_assign = (
        new_ids.join(F.broadcast(lbl_new), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("component_id"),
        )
    )
    touched = new_assign.select("component_id").distinct()
    # incumbents in touched clusters = touched-cluster members of the
    # merged assignment that are NOT new docs (see docstring for why
    # this loses no incumbent)
    n_base = (
        lbl.join(
            F.broadcast(touched),
            lbl["component"] == touched["component_id"],
            "left_semi",
        )
        .join(F.broadcast(new_ids), id_col, "left_anti")
        .groupBy(F.col("component").alias("component_id"))
        .agg(F.count(F.lit(1)).alias("_n_base"))
    )
    first_new = new_assign.groupBy("component_id").agg(
        F.min(id_col).alias("_first_new")
    )
    return (
        new_assign.join(F.broadcast(n_base), "component_id", "left")
        .join(F.broadcast(first_new), "component_id")
        .select(
            id_col,
            "component_id",
            (
                F.col("_n_base").isNull()
                & (F.col(id_col) == F.col("_first_new"))
            ).alias("admit"),
        )
    )


#: character classes for the fuzzy-join histogram sketch: the ASCII
#: alphabet partitioned by codepoint mod 16.  Class 15 is never listed
#: explicitly — its count is the RESIDUAL (prefix length minus the 15
#: explicit classes), which also absorbs any non-ASCII character, so
#: the 16 buckets partition EVERY possible string and the L1 bound
#: stays sound on arbitrary input.
_FUZZY_SKETCH_CLASSES = [
    "".join(
        c
        for c in (
            _string.ascii_letters
            + _string.digits
            + _string.punctuation
            + " "
        )
        if ord(c) % 16 == b
    )
    for b in range(15)
]


def _char_hist_packed(col: Column) -> tuple[Column, Column]:
    """(h1, h2): the 16-bucket character histogram of *col* packed 8
    bits a bucket into two longs.  Each bucket count is a codegen'd
    ``length(col) - length(translate(col, class, ''))`` delta; the
    residual bucket is ``length(translate(col, union-of-classes, ''))``
    (chars in no explicit class, including non-ASCII)."""
    counts = [
        F.length(col) - F.length(F.translate(col, cls, ""))
        for cls in _FUZZY_SKETCH_CLASSES
    ]
    counts.append(
        F.length(F.translate(col, "".join(_FUZZY_SKETCH_CLASSES), ""))
    )
    h1 = h2 = None
    for i in range(8):
        t1 = F.shiftleft(counts[i].cast("long"), 8 * i)
        t2 = F.shiftleft(counts[8 + i].cast("long"), 8 * i)
        h1 = t1 if h1 is None else h1 + t1
        h2 = t2 if h2 is None else h2 + t2
    return h1, h2


def _packed_l1(a: Column, b: Column) -> Column:
    """L1 distance between two 8-lane byte-packed histograms."""
    out = None
    for i in range(8):
        d = F.abs(
            F.shiftrightunsigned(a, 8 * i).bitwiseAND(F.lit(255))
            - F.shiftrightunsigned(b, 8 * i).bitwiseAND(F.lit(255))
        )
        out = d if out is None else out + d
    return out


def edit_distance_pairs(
    documents: DataFrame,
    prefix_chars: int = 48,
    max_dist: int = 6,
    max_block: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Approximate-string similarity join (the fuzzy-join tier the
    LSH family doesn't cover): pairs of documents whose *prefix_chars*
    head is within Levenshtein distance *max_dist* — the
    title/headline near-match shape (typo'd duplicates, trailing-date
    variants) that token-set measures miss because one edit changes a
    whole token.

    Blocking, not all-pairs: candidates must share their FIRST TOKEN
    and sit in the same or adjacent length band (band width
    ``max_dist + 1``, so any pair within distance necessarily lands
    ≤1 band apart — lengths can differ by at most max_dist).  The
    left side explodes to its three neighbouring bands and the right
    side keeps one, so each unordered pair joins on EXACTLY one
    (token, band) key and the ``id_a < id_b`` filter needs no
    distinct.  Verification is the built-in ``levenshtein`` (same DP
    metric in DuckDB, integer-exact cross-engine).

    ``max_block`` guards the within-block quadratic exactly like the
    stop-shingle cap in the MinHash tier: blocks larger than the cap
    (a degenerate blocking key — every title starting 'the') are
    dropped from BOTH sides via a broadcast anti-join, bounding any
    task at max_block² comparisons.  At 100 TB the blocking key is
    the lever: add a second token or a source column to the key
    rather than raising the cap.

    r17, two verify-volume levers (guide §3.2 posture — drop
    definitely-non-matching pairs before the expensive step):

    - the blocked base relation is FROZEN (lazy ``localCheckpoint``)
      — it feeds both join sides, and without the freeze the whole
      subtree (document scan + blocking aggregate + its Exchange)
      textually re-expanded and RE-EXECUTED once per side (4 parquet
      scans + 2 shuffled aggregations per run, visible in the r16
      plan dump).  Same executor-loss caveat as the containment stop
      set (non-replicated blocks; see
      ``incremental_containment_pairs``).
    - a packed CHARACTER-HISTOGRAM sketch pre-filters the pair feed
      before the DP: one unit edit moves the histogram-L1 between
      two strings by at most 2 (insert/delete touch one bucket,
      substitute two), so ``L1 > 2·max_dist`` proves
      ``dist > max_dist`` — no false negatives, verified
      row-identical at sf0.1 where it rejects ~70% of the 417 k
      candidate pairs before any ``levenshtein`` call (wall 1.67 →
      0.66 s with the freeze).  16 buckets (char class = codepoint
      mod 16 over the ASCII alphabet; everything else folds into the
      residual bucket — still a partition, so the bound holds for
      any input), packed 8 bits a bucket into two longs per row;
      per-row cost is 15 codegen'd ``translate`` length deltas, paid
      O(docs) — the rejection saves O(pairs) DP calls."""
    band_w = max_dist + 1
    base = documents.select(
        F.col(id_col).alias("_id"),
        F.substring(F.col(text_col), 1, prefix_chars).alias("_prefix"),
        F.split(F.col(text_col), " ").getItem(0).alias("_tok"),
    ).filter(F.length("_tok") > 0)
    base = base.withColumn(
        "_band", (F.length("_prefix") / F.lit(band_w)).cast("int")
    )
    big = (
        base.groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_block)
        .select("_tok")
    )
    base = base.join(F.broadcast(big), "_tok", "left_anti")
    # histogram sketch is sound only while a bucket count fits its
    # 8-bit lane (counts are bounded by the prefix length)
    use_sketch = prefix_chars <= 255
    if use_sketch:
        h1, h2 = _char_hist_packed(F.col("_prefix"))
        base = base.withColumn("_h1", h1).withColumn("_h2", h2)
    base = base.localCheckpoint(eager=False)  # feeds BOTH join sides
    sketch_a = [F.col("_h1").alias("_h1a"), F.col("_h2").alias("_h2a")]
    sketch_b = [F.col("_h1").alias("_h1b"), F.col("_h2").alias("_h2b")]
    left = base.select(
        F.col("_id").alias("_ida"),
        F.col("_prefix").alias("_pa"),
        *(sketch_a if use_sketch else []),
        "_tok",
        F.explode(
            F.array(
                F.col("_band") - F.lit(1),
                F.col("_band"),
                F.col("_band") + F.lit(1),
            )
        ).alias("_jb"),
    )
    right = base.select(
        F.col("_id").alias("_idb"),
        F.col("_prefix").alias("_pb"),
        *(sketch_b if use_sketch else []),
        "_tok",
        F.col("_band").alias("_jb"),
    )
    pairs = left.join(right, ["_tok", "_jb"]).filter(
        F.col("_ida") < F.col("_idb")
    )
    if use_sketch:
        l1 = _packed_l1(F.col("_h1a"), F.col("_h1b")) + _packed_l1(
            F.col("_h2a"), F.col("_h2b")
        )
        pairs = pairs.filter(l1 <= 2 * max_dist)
    return (
        pairs
        # 3-arg levenshtein: banded DP, O(max_dist·n) per pair instead
        # of O(n²), returning -1 above the bound — for kept rows the
        # value equals the full distance, so the plain-levenshtein
        # oracle hashes identically.  This is the within-block
        # constant-factor lever (measured 8.7 s → ~2 s at sf0.1).
        .withColumn(
            "dist",
            F.levenshtein(F.col("_pa"), F.col("_pb"), int(max_dist)),
        )
        # banded levenshtein returns -1 above the bound and the true
        # distance (necessarily ≤ max_dist) otherwise, so `>= 0` alone
        # is the full predicate — one DP evaluation per pair in the
        # merged join condition instead of two (r17; the old
        # two-sided filter re-evaluated the non-CSE'd levenshtein
        # call once per comparison)
        .filter(F.col("dist") >= 0)
        .select(
            F.col("_ida").alias("doc_a"),
            F.col("_idb").alias("doc_b"),
            F.col("dist").cast("int").alias("dist"),
        )
    )
