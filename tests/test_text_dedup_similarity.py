"""Unit tests for the training-data pipeline operators."""

from __future__ import annotations

import pytest

# multi-minute Spark-heavy suite: excluded from the tight red-green
# loop (`pytest -m "not slow"`); the round gate runs it always
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from cass_cdc_pg_spark.operators import dedup, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "s", 44),
        (2, "the quick brown fox jumps over the lazy dog", "en", "s", 44),  # exact dup
        (3, "the quick brown fox jumps over a lazy dog", "en", "s", 42),    # near dup
        (4, "completely different words entirely unrelated text", "en", "s", 50),
        (5, "el gato la casa de madrid y barcelona", "es", "s", 37),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_exact_dedup(docs):
    kept = dedup.exact_dedup(docs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == {1, 3, 4, 5}  # doc 2 collapses into 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0
    assert (1, 4) not in got


def test_containment_catches_subdoc_that_jaccard_misses(spark):
    """The operator's reason to exist: a short doc quoted whole inside
    a long wrapper has containment_a = 1.0 while Jaccard dilutes
    toward |A|/|B| — below any useful symmetric threshold."""
    short = "alpha beta gamma delta epsilon"
    wrapper = short + " " + " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, short), (2, wrapper), (3, " ".join(f"z{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in dedup.shingle_containment_pairs(
            docs, n=2, threshold=0.9
        ).collect()
    }
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r["containment_a"] == 1.0  # every shingle of A is in B
    assert r["jaccard"] < 0.1  # the symmetric score that misses it
    assert (1, 3) not in rows and (2, 3) not in rows


def test_containment_bounds_and_symmetry_with_jaccard(docs):
    """Invariants on real pair output: jaccard ≤ min(containments) ≤
    max(containments) ≤ 1, and pairs agree with the Jaccard operator
    where both qualify (same inverted index, same intersection)."""
    pairs = dedup.shingle_containment_pairs(
        docs, n=2, threshold=0.0
    ).collect()
    assert pairs
    for r in pairs:
        lo, hi = sorted([r["containment_a"], r["containment_b"]])
        assert r["jaccard"] <= lo + 1e-9
        assert hi <= 1.0 + 1e-9
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.5).collect()
    }
    cont = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    for k, v in jac.items():
        assert k in cont and abs(cont[k] - v) < 1e-9


def test_minhash_lsh_agrees_with_exact_on_dups(docs):
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=2, threshold=0.5)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # identical docs always collide in every band


def test_simhash_identical_docs_same_fingerprint(docs):
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[4]


def test_lang_id_marker_scoring(docs):
    out = {r["doc_id"]: r["predicted_lang"] for r in text.lang_id(docs).collect()}
    assert out[1] == "en"
    assert out[5] == "es"  # el/la/de/y markers


def test_quality_and_tokens(docs):
    stats = {r["doc_id"]: r.asDict() for r in text.token_stats(docs).collect()}
    assert stats[1]["n_tokens"] == 9
    assert stats[1]["n_unique"] == 8  # 'the' twice
    q = {r["doc_id"]: r.asDict() for r in text.quality_score(docs).collect()}
    assert q[1]["quality_bucket"] == "too_short"  # < 20 tokens
    assert 0 < q[1]["stopword_ratio"] < 1


def test_fingerprint_order_insensitive(spark):
    rows = [(1, "alpha beta gamma", "en", "s", 1), (2, "gamma alpha beta", "en", "s", 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    fp = {r["doc_id"]: r["fp"] for r in text.fingerprint(df).collect()}
    assert fp[1] == fp[2]


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.95, 0.05]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(vectors):
    out = similarity.cosine_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=2)
    rows = sorted((r["rank"], r["neighbor_id"]) for r in out.collect())
    assert rows == [(1, 1), (2, 2)] or rows[0] == (1, 1)


def test_lsh_recall_on_close_pairs(vectors):
    # identical-direction vectors share every hyperplane sign → same bucket
    out = similarity.lsh_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=2, bits=4, dim=3)
    neighbors = {r["neighbor_id"] for r in out.collect()}
    assert 1 in neighbors  # the near neighbor is found


def test_embedding_neardup(vectors):
    pairs = similarity.embedding_neardup_pairs(vectors, threshold=0.95, bits=2, dim=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got


def test_shingles_short_doc_no_crash(spark):
    """Docs with fewer than n tokens produce zero shingles instead of
    crashing slice() with INVALID_PARAMETER_VALUE.START (ADVICE r1)."""
    docs = spark.createDataFrame(
        [(1, "one"), (2, "two tokens"), (3, "a b c d e")],
        "doc_id long, text string",
    )
    sh = dedup.shingles(docs, n=3).collect()
    by_doc = {}
    for r in sh:
        by_doc.setdefault(r["doc_id"], []).append(r["shingle"])
    assert 1 not in by_doc and 2 not in by_doc
    assert len(by_doc[3]) == 3
    # downstream operators survive short docs too
    assert dedup.minhash_signatures(docs, num_hashes=4, n=3).count() == 1


def test_stop_shingle_drop_bounds_join(spark):
    """max_doc_freq drops corpus-common shingles from the inverted
    index; Jaccard becomes a lower bound for affected pairs."""
    docs = spark.createDataFrame(
        [
            (1, "common common alpha beta"),
            (2, "common common gamma delta"),
            (3, "common common alpha beta"),
        ],
        "doc_id long, text string",
    )
    # 'common common' appears in all 3 docs; cap df at 2 → dropped
    capped = dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.01, max_doc_freq=2)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert (1, 3) in got          # still found via their unique shingles
    assert (1, 2) not in got      # only shared the stop-shingle


def test_cosine_topk_arrow_jvm_bit_identical(spark):
    """The vectorized numpy kernel must reproduce the JVM fold's
    results bit-for-bit (same float64 op sequence, see _scored_arrow)."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 5)
    a = sorted(tuple(r) for r in similarity.cosine_topk(emb, q, k=4, kernel="arrow").collect())
    j = sorted(tuple(r) for r in similarity.cosine_topk(emb, q, k=4, kernel="jvm").collect())
    assert a == j


def test_simhash_pairs_finds_exact_and_near_dups(docs):
    """Identical docs are hamming-0 pairs; recall for hamming<=3 is
    guaranteed by the 4-band pigeonhole construction."""
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_pairs(docs).collect()}
    assert pairs.get((1, 2)) == 0          # exact dup
    assert (1, 4) not in pairs             # unrelated text


def test_exact_jaccard_pairs_contained_in_minhash_candidates(docs):
    """Containment oracle (VERDICT r1 #6): every exact-Jaccard>=0.5
    pair must surface as a MinHash-LSH candidate at a loose band
    threshold (recall check, not just cardinality)."""
    exact = {(r["doc_a"], r["doc_b"])
             for r in dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.5).collect()}
    cand = {(r["doc_a"], r["doc_b"])
            for r in dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=8, n=2,
                                             threshold=0.3).collect()}
    assert exact <= cand


def test_ivf_topk_recall_and_full_probe_exactness(spark):
    """IVF vs the exact baseline on the sf0.001 embeddings:
    - probing 2 of 8 cells recovers >=70% of the exact top-5
      (measured 84%; the bound leaves headroom, not slack in design);
    - probing ALL cells ranks every candidate exactly, so the result
      must equal brute force row-for-row."""
    from cass_cdc_pg_spark.sources import tables as src

    sf = "/root/testdata/sf0.001"
    emb = src.load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    cent = similarity.train_ivf_centroids(src.table_path(sf, "embeddings"))

    exact = {(r["query_id"], r["neighbor_id"])
             for r in similarity.cosine_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in similarity.ivf_topk(emb, q, cent, k=5, nprobe=2).collect()}
    assert len(exact & approx) / len(exact) >= 0.7

    full = sorted(tuple(r) for r in
                  similarity.ivf_topk(emb, q, cent, k=5, nprobe=len(cent)).collect())
    brute = sorted(tuple(r) for r in similarity.cosine_topk(emb, q, k=5).collect())
    assert full == brute


def test_train_ivf_centroids_deterministic(spark):
    from cass_cdc_pg_spark.sources import tables as src

    path = src.table_path("/root/testdata/sf0.001", "embeddings")
    assert similarity.train_ivf_centroids(path) == similarity.train_ivf_centroids(path)


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's defining property: two docs sharing any substring of
    length k + window - 1 (= 8 at defaults) must share at least one
    fingerprint; disjoint-alphabet docs share none."""
    shared = "abcdefgh"  # k+w-1 = 5+4-1 = 8
    docs = spark.createDataFrame(
        [
            (1, f"xxxx{shared}yyyy"),
            (2, f"qqq{shared}zzzzzz"),
            (3, "0123456789012345"),  # disjoint alphabet
            (4, "ab"),                # shorter than k -> empty set
        ],
        "doc_id long, text string",
    )
    # compare raw fingerprint sets, not digests
    from cass_cdc_pg_spark.operators.text import winnow_fingerprints

    out = {r["doc_id"]: r for r in winnow_fingerprints(docs).collect()}
    assert out[4]["n_fps"] == 0
    # rebuild the sets via a second run keeping mins (digest equality
    # implies set equality only for identical docs, so probe via a
    # one-doc union trick: shared fp count must exceed disjoint case)
    import pyspark.sql.functions as F2
    from cass_cdc_pg_spark.operators import text as T2

    n_grams = F2.length(F2.col("text")) - 5 + 1
    grams = F2.transform(
        F2.sequence(F2.lit(1), n_grams),
        lambda i: F2.md5(F2.col("text").substr(i, F2.lit(5))),
    )
    g = F2.size(F2.col("grams"))
    mins = F2.when(
        g >= 4,
        F2.transform(
            F2.sequence(F2.lit(1), g - F2.lit(4) + 1),
            lambda j: F2.array_min(F2.slice(F2.col("grams"), j, 4)),
        ),
    ).otherwise(F2.array(F2.array_min(F2.col("grams"))))
    sets = {
        r["doc_id"]: set(r["fps"])
        for r in docs.filter(F2.col("doc_id") < 4)
        .select("doc_id", grams.alias("grams"))
        .select("doc_id", F2.array_distinct(mins).alias("fps"))
        .collect()
    }
    assert sets[1] & sets[2], "shared 8-char substring must share a fingerprint"
    assert not (sets[1] & sets[3]), "disjoint docs share none"


def test_boilerplate_shingle_does_not_explode_candidates(spark):
    """Scale guard pin: a boilerplate shingle shared by every document
    must not make the candidate set quadratic.  60 docs sharing one
    footer bigram → exact mode meets all C(60,2)=1770 pairs; the
    scalable variant (cap on) only meets the 2 planted true dup pairs."""
    rows = [(i, f"unique{i} token{i} LEGAL FOOTER") for i in range(60)]
    rows[58] = (58, rows[0][1])  # true duplicate of doc 0
    rows[59] = (59, rows[1][1])  # true duplicate of doc 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    exact = dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.0)
    assert exact.count() == 60 * 59 // 2  # the quadratic blowup, demonstrated

    capped = dedup.ngram_jaccard_pairs_scalable(
        docs, n=2, threshold=0.0, max_doc_freq=10
    )
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert got == {(0, 58), (1, 59)}  # candidate set bounded to real dups


def test_connected_components_chain_and_clusters(spark):
    """Min-label propagation across a diameter-3 chain, a separate
    2-cluster, and untouched vertices never in the edge list."""
    edges = spark.createDataFrame(
        [(2, 9), (9, 4), (4, 7),   # chain {2,4,7,9} -> 2
         (5, 6)],                  # pair {5,6} -> 5
        "doc_a long, doc_b long",
    )
    got = {r["node"]: r["component"]
           for r in dedup.connected_components(edges).collect()}
    assert got == {2: 2, 9: 2, 4: 2, 7: 2, 5: 5, 6: 5}


def test_top_k_per_group_and_stratified_sample(spark):
    from pyspark.sql import functions as F

    from cass_cdc_pg_spark.operators.windows import (
        stratified_sample,
        top_k_per_group,
    )

    rows = [(i, i % 3, float(i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, grp long, v double")

    top = top_k_per_group(df, ["grp"], [F.col("v").desc(), F.col("id").asc()], 2)
    assert top.count() == 6
    assert top.filter(F.col("rank") > 2).count() == 0
    # per-group best is the max v with the smallest id tiebreak
    best = {r["grp"]: r["id"] for r in top.filter(F.col("rank") == 1).collect()}
    for g, i in best.items():
        assert rows[i][2] == max(v for (j, gg, v) in rows if gg == g)

    # rank-limit pushdown: the plan bounds per-partition sort work
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan

    s1 = stratified_sample(df, ["grp"], 5, "id")
    s2 = stratified_sample(df, ["grp"], 5, "id")
    assert s1.count() == 15
    assert {tuple(r) for r in s1.collect()} == {tuple(r) for r in s2.collect()}


def test_length_histogram_integer_exact_buckets(spark):
    """Bucket edges are integer-exact: powers of two land in their own
    bucket (the float-log2 hazard), empty docs in bucket -1."""
    from cass_cdc_pg_spark.operators.text import length_histogram

    docs = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "a b c d e f g h"),  # 0, 1, 8 tokens
         (4, " ".join(["t"] * 7))],                   # 7 tokens
        "doc_id long, text string",
    )
    got = {r["log2_bucket"]: (r["n_docs"], r["min_tokens"], r["max_tokens"])
           for r in length_histogram(docs).collect()}
    assert got[-1] == (1, 0, 0)   # empty doc
    assert got[0] == (1, 1, 1)    # 1 token -> bucket 0
    assert got[2] == (1, 7, 7)    # 7 -> bucket 2
    assert got[3] == (1, 8, 8)    # 8 exactly -> bucket 3, not 2


def test_repetition_stats_known_values(spark):
    """Hand-computed Gopher repetition metrics, incl. short-doc NULLs."""
    from cass_cdc_pg_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),      # top token a:3/4; bigrams [a a, a a, a b] top 2/3
            (2, "x y x y x"),    # top token x:3/5; bigrams [x y, y x, x y, y x] top 2/4
            (3, "solo"),         # 1 token: bigram/trigram NULL
            (4, ""),             # empty: all NULL
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["top_token_frac"] == 0.75
    assert got[1]["top_bigram_frac"] == round(2 / 3, 4)
    # trigrams of doc1: [a a a, a a b] -> no dup
    assert got[1]["dup_trigram_frac"] == 0.0
    assert got[2]["top_token_frac"] == 0.6
    assert got[2]["top_bigram_frac"] == 0.5
    # trigrams of doc2: [x y x, y x y, x y x] -> 1 dup of 3
    assert got[2]["dup_trigram_frac"] == round(1 / 3, 4)
    assert got[3]["top_token_frac"] == 1.0
    assert got[3]["top_bigram_frac"] is None
    assert got[4]["top_token_frac"] is None


def test_decontaminate_flags_overlap_and_broadcasts(spark):
    """A corpus doc sharing an n-gram with the benchmark is flagged;
    clean docs report zero; the benchmark side is broadcast."""
    from cass_cdc_pg_spark.operators.text import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (1, "lazy dog saw the quick brown fox leap"),  # shares 3-grams
            (2, "completely unrelated words here now"),     # clean
            (3, "ab"),                                      # shorter than n
        ],
        "doc_id long, text string",
    )
    out = decontaminate(corpus, bench, n=3)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["contaminated"] and got[1]["n_hit_grams"] == 2
    assert not got[2]["contaminated"] and got[2]["n_hit_grams"] == 0
    assert got[3]["n_grams"] == 0 and not got[3]["contaminated"]

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_decontaminate_null_text(spark):
    """NULL-text docs read n_grams = 0 / contaminated = false (r15
    advice closure): greatest() skips the NULL `size - k` operand, so
    the arithmetic gram total lands on 0 — the same branch the DuckDB
    oracle's `CASE WHEN len(tk) >= n ... ELSE 0` takes on NULL, so
    the two engines agree.  The pre-r15 `size(grams)` shape yielded
    NULL here and would have diverged from the oracle; this pins the
    cross-engine-consistent behavior, not an accident."""
    from cass_cdc_pg_spark.operators.text import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, None), (2, "the quick brown fox runs")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=3).collect()}
    assert got[1]["n_grams"] == 0
    assert got[1]["n_hit_grams"] == 0
    assert got[1]["contaminated"] is False
    assert got[2]["contaminated"] and got[2]["n_hit_grams"] == 2


def test_pii_scrub_counts_and_redacts(spark):
    from cass_cdc_pg_spark.operators.text import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.com please"),
            (2, "server 10.0.42.7 answered"),
            (3, "call +1 415-555-0199 or 415 555 0123"),
            (4, "ssn 123-45-6789 leaked"),
            (5, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert got[1]["n_pii_email"] == 1 and "[EMAIL]" in got[1]["text"]
    assert "jane" not in got[1]["text"]
    assert got[2]["n_pii_ipv4"] == 1 and "[IPV4]" in got[2]["text"]
    assert got[3]["n_pii_phone"] == 2
    assert got[4]["n_pii_ssn"] == 1 and "123-45-6789" not in got[4]["text"]
    assert got[5]["text"] == "nothing sensitive here"
    assert all(got[5][f"n_pii_{k}"] == 0 for k in ("email", "ipv4", "phone", "ssn"))


def test_token_percentiles_exact_interpolation(spark):
    """p50/p90 interpolate at rank p*(N-1): lengths 1..5 -> p50=3, p90=4.6."""
    from cass_cdc_pg_spark.operators.text import token_percentiles

    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * i)) for i in range(1, 6)],
        "doc_id long, text string",
    )
    row = token_percentiles(docs).collect()[0]
    assert row["n_docs"] == 5
    assert row["p50_tokens"] == 3.0
    assert abs(row["p90_tokens"] - 4.6) < 1e-9


def test_pack_sequences_chunking_and_shards(spark):
    """Docs concatenate in doc_id order per shard; packs split at
    seq_len; offsets wrap; shards are independent streams."""
    from cass_cdc_pg_spark.operators.text import pack_sequences

    # one shard (n_shards=1): lengths 6,6,6 with seq_len=10
    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * 6)) for i in range(3)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           pack_sequences(docs, seq_len=10, n_shards=1).collect()}
    assert (got[0]["pack_id"], got[0]["offset_in_pack"]) == (0, 0)
    assert (got[1]["pack_id"], got[1]["offset_in_pack"]) == (0, 6)   # starts at 6
    assert (got[2]["pack_id"], got[2]["offset_in_pack"]) == (1, 2)   # starts at 12

    # two shards: evens and odds pack independently from offset 0
    got2 = {r["doc_id"]: r for r in
            pack_sequences(docs, seq_len=10, n_shards=2).collect()}
    assert got2[0]["offset_in_pack"] == 0 and got2[1]["offset_in_pack"] == 0
    assert got2[2]["shard"] == 0 and got2[2]["offset_in_pack"] == 6


def test_chunk_documents_coverage_and_overlap(spark):
    """chunk_documents (r9): every token covered, consecutive chunks
    share exactly `overlap` tokens, only the last chunk runs short,
    ids deterministic, zero-token docs emit nothing, and the plan has
    NO Exchange (pure per-row work)."""
    import hashlib

    from cass_cdc_pg_spark.operators.text import chunk_documents

    # doc 1: 25 tokens / chunk 10 overlap 3 (stride 7):
    #   chunks at 0,7,14,21 -> last covers [21,25) = 4 tokens
    # doc 2: 10 tokens -> exactly one full window
    # doc 3: 3 tokens (shorter than window) -> one short chunk
    # doc 4: empty text -> nothing
    toks1 = [f"w{i}" for i in range(25)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(toks1)),
            (2, " ".join(f"x{i}" for i in range(10))),
            (3, "a b c"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=10, overlap=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    rows = sorted(
        out.collect(), key=lambda r: (r["doc_id"], r["chunk_index"])
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2, 3}
    c1 = by_doc[1]
    assert [r["start_token"] for r in c1] == [0, 7, 14, 21]
    assert [r["n_chunk_tokens"] for r in c1] == [10, 10, 10, 4]
    # coverage: concatenating stride-slices of the chunks == the doc
    rebuilt = c1[0]["chunk_text"].split(" ")
    for r in c1[1:]:
        rebuilt += r["chunk_text"].split(" ")[3:]  # drop the overlap
    assert rebuilt == toks1
    # overlap: chunk i's last 3 tokens == chunk i+1's first 3
    for a, b in zip(c1, c1[1:]):
        assert a["chunk_text"].split(" ")[-3:] == b["chunk_text"].split(" ")[:3]
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 10
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_chunk_tokens"] == 3
    # deterministic engine-portable id
    assert c1[2]["chunk_id"] == hashlib.md5(b"1:2").hexdigest()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=10, overlap=10)


def test_token_rarity_known_counts(spark):
    """corpus = 'a a b' + 'a c': freq a=3,b=1,c=1."""
    from cass_cdc_pg_spark.operators.text import token_rarity

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in token_rarity(docs).collect()}
    assert got[1]["sum_freq"] == 3 + 3 + 1
    assert got[1]["mean_token_freq"] == round(7 / 3, 4)
    assert got[2]["sum_freq"] == 3 + 1 and got[2]["mean_token_freq"] == 2.0


def test_quantize_int8_bounds_and_zero_vector(spark):
    """Max |element| maps to ±127, zero vectors quantize to zeros, and
    dequantized values stay within scale/2 of the input."""
    from cass_cdc_pg_spark.operators.similarity import quantize_int8

    rows = [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    s = got[1]["scale"]
    assert abs(s - 1.0 / 127) < 1e-12
    # q = floor(x/scale + 0.5) = [127, -63, 32, 0] -> sum 96
    assert got[1]["q_max"] == 127
    assert got[1]["q_sum"] == 96
    assert got[2]["scale"] == 0.0 and got[2]["q_sum"] == 0 and got[2]["q_max"] == 0


def test_mix_upsample_deterministic_copies(spark):
    """weight 2.3: 2 copies + 1 iff (id*48271)%1000 < 300; weight 0.4
    drops docs failing the draw entirely; unlisted source = 1 copy."""
    from cass_cdc_pg_spark.operators.text import mix_upsample

    docs = spark.createDataFrame(
        [(1, "hot", "x"), (3, "hot", "x"), (11, "cold", "x"), (13, "cold", "x"),
         (21, "plain", "x")],
        "doc_id long, source string, text string",
    )
    out = mix_upsample(docs, {"hot": 2.3, "cold": 0.4})
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r["copy_n"])
    # id 1: 1*48271%1000=271 < 300 -> 3 copies; id 3: 813 -> 2 copies
    assert sorted(got[1]) == [0, 1, 2] and sorted(got[3]) == [0, 1]
    # id 11: 11*48271%1000=981 >= 400 -> dropped; id 13: 523 >= 400 -> dropped
    assert 11 not in got and 13 not in got
    assert got[21] == [0]  # default weight 1
    # fully deterministic across runs
    again = mix_upsample(docs, {"hot": 2.3, "cold": 0.4}).collect()
    assert sorted(map(tuple, again)) == sorted(
        map(tuple, out.collect()))


def test_token_budget_select_cutoff(spark):
    """Docs admitted in quality-desc order until the budget line; the
    crossing doc is admitted, everything after is not."""
    from cass_cdc_pg_spark.operators.text import token_budget_select

    docs = spark.createDataFrame(
        [(1, "a b c d"),           # quality 1.0, 4 tokens
         (2, "a a b b"),           # quality 0.5, 4 tokens
         (3, "a a a a"),           # quality 0.25, 4 tokens
         (4, "a a a a a a a a")],  # quality 0.125, 8 tokens
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_budget_select(docs, 10).collect()}
    # running: d1=4, d2=8, d3=12 (starts at 8 < 10 -> admitted, crosses),
    # d4 starts at 12 >= 10 -> excluded
    assert set(got) == {1, 2, 3}
    assert got[3]["running_tokens"] == 12


def test_connected_components_path_graph_converges_in_log_rounds(spark):
    """Worst case for pure propagation: a 1000-node path (diameter 999)
    would hit the 25-round cap unconverged.  Pointer doubling makes the
    label reach follow k <- 2k + 2, so convergence (+1 fixpoint-detect
    round) lands at ~log2(n): 10 rounds for n=1000."""
    from cass_cdc_pg_spark.operators import dedup

    edges = spark.range(999).selectExpr("id AS doc_a", "id + 1 AS doc_b")
    stats = {}
    out = dedup.connected_components(edges, stats=stats)
    rows = out.collect()
    assert len(rows) == 1000
    assert all(r["component"] == 0 for r in rows)
    assert stats["rounds"] <= 12, stats


def _greedy_model(n_ids, pairs):
    """Sequential SemDeDup sweep: ids ascending, keep iff no KEPT
    lower neighbor — the semantics the distributed fixpoint must match."""
    nbrs = {}
    for a, b in pairs:
        nbrs.setdefault(b, set()).add(a)
    kept = set()
    for i in sorted(n_ids):
        if not (nbrs.get(i, set()) & kept):
            kept.add(i)
    return kept


def test_semdedup_greedy_matches_sequential_model(spark):
    """semdedup_greedy_survivors == the exact sequential greedy on
    randomized pair graphs (seeded), including chains where the
    one-pass rule over-drops."""
    import random

    rng = random.Random(7)
    for trial in range(5):
        n = 40
        ids = list(range(n))
        pairs = sorted(
            {
                tuple(sorted(rng.sample(ids, 2)))
                for _ in range(rng.randint(5, 60))
            }
        )
        pdf = spark.createDataFrame(
            [(a, b) for a, b in pairs] or [(0, 1)][:0],
            "id_a long, id_b long",
        ) if pairs else spark.createDataFrame([], "id_a long, id_b long")
        all_ids = spark.createDataFrame([(i,) for i in ids], "vec_id long")
        stats = {}
        got = {
            r["id"]
            for r in similarity.semdedup_greedy_survivors(
                pdf, all_ids, stats=stats
            ).collect()
        }
        want = _greedy_model(ids, pairs)
        assert got == want, (trial, sorted(got ^ want), stats)
        assert stats.get("converged", True) is True


def test_semdedup_greedy_rescues_chain_overdrop(spark):
    """On the chain 0-1-2 (0~1, 1~2, 0!~2): one-pass drops {1, 2};
    greedy keeps 2 because its only lower neighbor 1 was itself
    dropped.  This is exactly the over-drop bias the one-pass
    docstring documents."""
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    all_ids = spark.createDataFrame([(i,) for i in range(3)], "vec_id long")
    stats = {}
    got = {
        r["id"]
        for r in similarity.semdedup_greedy_survivors(
            pairs, all_ids, stats=stats
        ).collect()
    }
    assert got == {0, 2}
    one_pass = {0, 1, 2} - {b for _, b in [(0, 1), (1, 2)]}
    assert one_pass == {0}  # over-drops vec 2
    # one round: 0 kept (no lower neighbor), 1 dropped, and dropping 1
    # removes its out-edge, so 2's survival needs no second round
    assert stats["rounds"] == 1 and stats["converged"]


def test_semdedup_greedy_round_cap_falls_back_conservatively(spark):
    """A long path with max_iter=1: round 1 decides the head; the
    fallback one-pass-drops the remaining undecided high sides, so the
    result is a SUBSET of the exact greedy (never an over-keep) and
    converged=False is reported."""
    path = [(i, i + 1) for i in range(10)]
    pairs = spark.createDataFrame(path, "id_a long, id_b long")
    all_ids = spark.createDataFrame([(i,) for i in range(11)], "vec_id long")
    stats = {}
    got = {
        r["id"]
        for r in similarity.semdedup_greedy_survivors(
            pairs, all_ids, max_iter=1, stats=stats
        ).collect()
    }
    exact = _greedy_model(range(11), path)  # evens
    assert stats["converged"] is False
    assert got <= exact
    assert 0 in got  # decided in round 1


def test_knn_within_arrow_kernel_bit_identical_to_jvm(spark):
    """The r7 Arrow cell kernel must return EXACTLY the JVM fold's
    rows — same dimension-at-a-time float64 op sequence, same 6-dp
    rounding, same (sim desc, neighbor_id) ranking — including on
    near-tie vectors and a 2-vector cell."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(60):
        lbl = i % 4
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, [float(x) for x in base], lbl))
    # a near-tie pair in one cell, a minimal 2-vector cell, and a
    # SINGLETON cell (must vanish silently, not crash the kernel's
    # empty-frame Arrow conversion)
    rows.append((100, rows[0][1], 0))          # duplicate vector: sim 1.0 tie
    rows.append((200, [1.0] * 8, 9))
    rows.append((201, [1.0] * 8, 9))
    rows.append((300, [0.5] * 8, 77))          # alone in its cell
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    jvm = {tuple(r) for r in similarity.knn_within(emb, k=3).collect()}
    arr = {
        tuple(r)
        for r in similarity.knn_within(emb, k=3, kernel="arrow").collect()
    }
    assert jvm == arr
    assert len(jvm) > 0


def test_knn_within_degenerate_inputs_parity(spark):
    """NULL labels, NULL vectors, and zero-norm vectors (undefined
    cosine; ANSI mode would error on the division) are EXCLUDED by
    both kernels identically — the remaining well-formed rows still
    rank each other."""
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.8, 0.2], 0),
        (3, [0.0, 0.0], 0),     # zero norm: excluded (cosine undefined)
        (4, [1.0, 1.0], None),  # NULL label: excluded
        (5, None, 0),           # NULL vector: excluded
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    jvm = {tuple(r) for r in similarity.knn_within(emb, k=2).collect()}
    arr = {
        tuple(r)
        for r in similarity.knn_within(emb, k=2, kernel="arrow").collect()
    }
    assert jvm == arr
    ids_seen = {t[0] for t in jvm} | {t[1] for t in jvm}
    assert ids_seen == {1, 2}  # only the well-formed pair survives


def test_duplicated_span_stats_known_counts(spark):
    """Hand-checkable span accounting: doc 1 and 2 share their full
    8-token prefix; doc 3 is unique; doc 4 repeats a span WITHIN
    itself (intra-doc repeats are duplicated surface too)."""
    shared = "a b c d e f g h"
    rows = [
        (1, shared + " tail one", "s1"),
        (2, shared + " tail two", "s1"),
        (3, "q r s t u v w x y z", "s2"),
        (4, " ".join(["p1 p2 p3 p4 p5 p6 p7 p8"] * 2), "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in
           text.duplicated_span_stats(docs, span_tokens=8).collect()}

    s1 = out["s1"]
    # each s1 doc has 10 tokens -> 3 windows; the docs share a 9-token
    # prefix ("a..h tail"), so TWO of each doc's windows ([a..h] and
    # [b..tail]) occur twice corpus-wide -> 4 duplicated windows, and
    # 2 of 3 windows duplicated makes both docs majority-dup
    assert s1["n_docs"] == 2 and s1["total_windows"] == 6
    assert s1["dup_windows"] == 4
    assert s1["n_docs_majority_dup"] == 2

    s2 = out["s2"]
    # doc 3: 10 tokens -> 3 unique windows. doc 4: 16 tokens -> 9
    # windows; the repeated 8-token block occurs at offsets 1 and 9
    # (identical window twice) -> 2 duplicated windows
    assert s2["n_docs"] == 2 and s2["total_windows"] == 12
    assert s2["dup_windows"] == 2
    assert s2["n_docs_majority_dup"] == 0


def test_duplicated_span_short_docs_contribute_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "too short", "s"), (2, " ".join(f"t{i}" for i in range(8)), "s")],
        "doc_id long, text string, source string",
    )
    out = text.duplicated_span_stats(docs, span_tokens=8).collect()
    assert len(out) == 1
    r = out[0]
    # only doc 2 reaches 8 tokens: exactly one window, not duplicated
    assert (r["n_docs"], r["total_windows"], r["dup_windows"]) == (1, 1, 0)


def test_knn_within_arrow_block_boundary_parity(spark):
    """r8: the Arrow cell kernel accumulates the gram matrix in
    512-query column blocks (r7 ADVICE memory fix).  A single cell
    LARGER than one block must produce exactly the JVM rows — the
    block seams (query 511/512, final partial block) are where an
    off-by-one in the self-mask or column indexing would bite."""
    import random

    rng = random.Random(23)
    n = 530  # > one 512 block, with a 18-wide final partial block
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(4)], 1) for i in range(n)
    ]
    rows.append((n, rows[0][1], 1))  # cross-block exact tie with id 0
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    jvm = {tuple(r) for r in similarity.knn_within(emb, k=2).collect()}
    arr = {
        tuple(r)
        for r in similarity.knn_within(emb, k=2, kernel="arrow").collect()
    }
    assert jvm == arr
    assert len({q for q, *_ in jvm}) == n + 1  # every vector answered


def test_lsh_first_band_emission_equals_dedup_reference(spark):
    """r8: minhash_lsh_pairs emits each candidate pair exactly once
    via the first-agreeing-band filter (no post-join dedup shuffle).
    Pin: the output has no duplicate (doc_a, doc_b) rows AND equals
    the reference formulation (join on every agreeing band, then
    distinct) on a corpus dense with multi-band near-dup families."""
    import math
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for fam in range(12):
        base = [rng.choice(vocab) for _ in range(30)]
        for rep in range(3):  # 3 siblings per family: many shared bands
            doc = list(base)
            for _ in range(rep):  # light mutation
                doc[rng.randrange(len(doc))] = rng.choice(vocab)
            rows.append((fam * 10 + rep, " ".join(doc)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=32, bands=8, n=2, threshold=0.2
    )
    got = [(r["doc_a"], r["doc_b"], r["est_jaccard"]) for r in pairs.collect()]
    assert len(got) == len({(a, b) for a, b, _ in got}), "duplicate pairs"

    # reference: signatures -> all-band agreement -> distinct pairs
    sig = {
        r["doc_id"]: r["sig"]
        for r in dedup.minhash_signatures(docs, 32, 2).collect()
    }
    ref = set()
    ids = sorted(sig)
    rpb = 32 // 8
    for i, da in enumerate(ids):
        for db in ids[i + 1:]:
            sa, sb = sig[da], sig[db]
            if any(
                sa[bi * rpb:(bi + 1) * rpb] == sb[bi * rpb:(bi + 1) * rpb]
                for bi in range(8)
            ):
                frac = sum(x == y for x, y in zip(sa, sb)) / 32.0
                est = math.floor(frac * 10000 + 0.5) / 10000  # half-up, like F.round
                if est >= 0.2:
                    ref.add((da, db, est))
    assert {(a, b, e) for a, b, e in got} == ref
    assert len(ref) > 10  # the fixture really exercises multi-band hits


def test_dedup_shared_memo_invalidates_on_fixture_change(spark, tmp_path):
    """r8: the session-scoped pair/components memo must key on the
    documents fixture's (realpath, mtime_ns) — a regenerated fixture
    at the same path serves FRESH results, and the
    SPARK_GRAFT_NO_DEDUP_MEMO escape hatch bypasses the cache."""
    import os
    import time as _time

    from cass_cdc_pg_spark.registry import dedup_minhash_lsh_q

    sf_dir = str(tmp_path)
    p = os.path.join(sf_dir, "documents.parquet")

    def write_docs(texts):
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(p + ".tmpdir")
        part = [
            f for f in os.listdir(p + ".tmpdir") if f.endswith(".parquet")
        ][0]
        os.replace(os.path.join(p + ".tmpdir", part), p)

    dup = "the same text repeated here " * 4
    write_docs([dup, dup, "something entirely different words zebra"])
    n1 = dedup_minhash_lsh_q(spark, sf_dir).count()
    assert n1 == 1  # docs 0,1 are identical -> one pair

    _time.sleep(0.01)  # ensure a distinct mtime_ns
    write_docs([dup, "now unique alpha beta gamma", "delta epsilon zeta"])
    n2 = dedup_minhash_lsh_q(spark, sf_dir).count()
    assert n2 == 0  # fresh fixture, no near-dups: memo must not serve n1

    os.environ["SPARK_GRAFT_NO_DEDUP_MEMO"] = "1"
    try:
        assert dedup_minhash_lsh_q(spark, sf_dir).count() == 0
    finally:
        del os.environ["SPARK_GRAFT_NO_DEDUP_MEMO"]


def test_ivf_assign_known_cells_and_shuffle_free(spark):
    """ivf_assign (r9): nearest-centroid assignment by cosine with
    ties to the lowest cell, sim = rounded winning cosine, and the
    projection plan has NO Exchange (index maintenance must be
    map-side at any batch size)."""
    from cass_cdc_pg_spark.operators.similarity import ivf_assign

    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [10.0, 1.0]),   # cell 1
        (2, [0.5, 8.0]),    # cell 2
        (3, [3.0, 3.0]),    # exact tie -> lowest cell (1)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ivf_assign(df, cents)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {r["vec_id"]: (r["cell"], r["sim"]) for r in out.collect()}
    assert got[1][0] == 1 and got[2][0] == 2 and got[3][0] == 1
    import math

    assert abs(got[1][1] - 10.0 / math.sqrt(101.0)) < 1e-6
    assert abs(got[3][1] - round(1 / math.sqrt(2), 6)) < 1e-6


_INC_BASE_TEXTS = {
    1: "alpha beta gamma delta epsilon zeta eta theta",
    2: "alpha beta gamma delta epsilon zeta eta iota",  # near-dup of 1
    3: "completely different words about spark engines here",
    10: "one two three four five six seven eight nine ten",
    11: "one two three four five six seven eight nine eleven",  # ~10
}
#: doc 0 sits BELOW every base id (its id must become the merged
#: label); doc 5 bridges base components {1,2} and {10,11}; doc 7
#: matches nothing
_INC_NEW_TEXTS = {
    0: "one two three four five six seven eight nine ten",
    5: "alpha beta gamma delta epsilon zeta eta theta"
       " one two three four five six seven eight nine ten",
    7: "unrelated fresh content token stream nothing shared",
}
_INC_PARAMS = dict(num_hashes=32, bands=8, n=2, threshold=0.2)


def _inc_docs(spark, texts):
    return spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )


def test_incremental_minhash_pairs_equals_full_restriction(spark):
    """r9: the incremental pair stage (new batch vs the base corpus's
    band table) emits EXACTLY the full-recompute pairs that touch a
    new doc — same (doc_a, doc_b, est_jaccard) triples — and the base
    pairs are exactly the rest, so incremental ∪ previous == full.
    The plan must broadcast the new side (the corpus never
    shuffles)."""
    from pyspark.sql import functions as F

    from cass_cdc_pg_spark.operators.dedup import (
        banded_signatures,
        incremental_minhash_pairs,
        minhash_lsh_pairs,
    )

    base = _inc_docs(spark, _INC_BASE_TEXTS)
    new = _inc_docs(spark, _INC_NEW_TEXTS)
    grown = base.unionByName(new)
    new_ids = set(_INC_NEW_TEXTS)

    full = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in minhash_lsh_pairs(grown, **_INC_PARAMS).collect()
    }
    assert full, "fixture must produce pairs"
    want_inc = {p for p in full if p[0] in new_ids or p[1] in new_ids}
    assert want_inc, "fixture must produce cross-batch pairs"

    bt = banded_signatures(
        base, _INC_PARAMS["num_hashes"], _INC_PARAMS["bands"], _INC_PARAMS["n"]
    )
    inc = incremental_minhash_pairs(bt, new, **_INC_PARAMS)
    got_inc = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"]) for r in inc.collect()
    }
    assert got_inc == want_inc
    got_base = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in minhash_lsh_pairs(base, **_INC_PARAMS).collect()
    }
    assert got_base == full - want_inc
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_incremental_components_equal_full_recompute(spark):
    """r9: merging the new batch's edges into the base component
    assignment yields label-for-label the full recompute on the grown
    corpus — including the two hard cases: a new doc MERGING two base
    components, and a new doc whose id is smaller than every base
    label (it must become the merged cluster's label)."""
    from cass_cdc_pg_spark.operators.dedup import (
        banded_signatures,
        connected_components,
        incremental_components,
        incremental_minhash_pairs,
        minhash_lsh_pairs,
    )

    base = _inc_docs(spark, _INC_BASE_TEXTS)
    new = _inc_docs(spark, _INC_NEW_TEXTS)
    grown = base.unionByName(new)

    base_cc = connected_components(minhash_lsh_pairs(base, **_INC_PARAMS))
    bt = banded_signatures(
        base, _INC_PARAMS["num_hashes"], _INC_PARAMS["bands"], _INC_PARAMS["n"]
    )
    inc_pairs = incremental_minhash_pairs(bt, new, **_INC_PARAMS)
    got = {
        (r["node"], r["component"])
        for r in incremental_components(base_cc, inc_pairs).collect()
    }
    want = {
        (r["node"], r["component"])
        for r in connected_components(
            minhash_lsh_pairs(grown, **_INC_PARAMS)
        ).collect()
    }
    assert got == want
    # the bridge doc merged {1,2} with {10,11}, and the sub-minimal
    # new id 0 is the merged label
    labels = dict(got)
    assert labels[1] == labels[10] == labels[5] == labels[0] == 0
    # an empty new batch is a no-op: assignment passes through intact
    empty = inc_pairs.limit(0)
    unchanged = {
        (r["node"], r["component"])
        for r in incremental_components(base_cc, empty).collect()
    }
    assert unchanged == {
        (r["node"], r["component"]) for r in base_cc.collect()
    }


def test_incremental_admission_first_seen_wins(spark):
    """r9: admission is SENIORITY, not min-id canonicality — a new doc
    whose cluster holds any incumbent is rejected even when its id is
    the cluster minimum; among incumbent-free clusters only the
    lowest-id new member is admitted; singleton new docs are
    admitted."""
    from cass_cdc_pg_spark.operators.dedup import (
        banded_signatures,
        connected_components,
        incremental_admission,
        incremental_components,
        incremental_minhash_pairs,
        minhash_lsh_pairs,
    )

    base = _inc_docs(spark, _INC_BASE_TEXTS)
    new = _inc_docs(spark, _INC_NEW_TEXTS)
    p = _INC_PARAMS
    base_cc = connected_components(minhash_lsh_pairs(base, **p))
    bt = banded_signatures(base, p["num_hashes"], p["bands"], p["n"])
    inc_pairs = incremental_minhash_pairs(bt, new, **p)
    merged = incremental_components(base_cc, inc_pairs)
    got = {
        r["doc_id"]: (r["component_id"], r["admit"])
        for r in incremental_admission(
            merged, new.select("doc_id")
        ).collect()
    }
    assert set(got) == set(_INC_NEW_TEXTS)
    # doc 0 duplicates incumbent 10 and is the cluster's MIN id — the
    # label says canonical, admission says rejected (incumbency wins)
    assert got[0] == (0, False)
    # doc 5 bridges two incumbent clusters — rejected
    assert got[5][1] is False
    # doc 7 matches nothing — admitted as a singleton
    assert got[7] == (7, True)


def test_incremental_dedup_composes_with_change_feed(spark, tmp_path):
    """r9 (r8 verdict #3): the daily-batch wiring end-to-end — the
    corpus lives in a KeyedTable, the new batch arrives as a merge
    commit, read_changes() IS the new-docs input, and the incremental
    ladder over the feed matches the full recompute over
    read_live()."""
    from pyspark.sql import functions as F

    from cass_cdc_pg_spark.operators.dedup import (
        banded_signatures,
        connected_components,
        incremental_components,
        incremental_minhash_pairs,
        minhash_lsh_pairs,
    )
    from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

    def as_rows(texts, ts):
        return spark.createDataFrame(
            [(i, t) for i, t in sorted(texts.items())],
            "doc_id long, text string",
        ).select(
            "doc_id", "text",
            F.lit(False).alias("_cdc_deleted"),
            F.lit(ts).cast("long").alias("_cdc_timestamp_micros"),
            F.lit("").alias("_last_event_id"),
            F.lit(None).cast("long").alias("_ttl_expiry_timestamp_us"),
        )

    t = KeyedTable(spark, str(tmp_path / "corpus"), ["doc_id"], num_buckets=4)
    t.merge(as_rows(_INC_BASE_TEXTS, 1))
    v_base = t._current_version()
    t.merge(as_rows(_INC_NEW_TEXTS, 2))

    base = t.read(version=v_base).filter(~F.col("_cdc_deleted")).select("doc_id", "text")
    feed = t.read_changes(v_base)
    new = feed.filter(~F.col("_cdc_deleted")).select("doc_id", "text")
    assert {r["doc_id"] for r in new.collect()} == set(_INC_NEW_TEXTS)

    bt = banded_signatures(
        base, _INC_PARAMS["num_hashes"], _INC_PARAMS["bands"], _INC_PARAMS["n"]
    )
    base_cc = connected_components(minhash_lsh_pairs(base, **_INC_PARAMS))
    inc_pairs = incremental_minhash_pairs(bt, new, **_INC_PARAMS)
    got = {
        (r["node"], r["component"])
        for r in incremental_components(base_cc, inc_pairs).collect()
    }
    live = t.read_live().select("doc_id", "text")
    want = {
        (r["node"], r["component"])
        for r in connected_components(
            minhash_lsh_pairs(live, **_INC_PARAMS)
        ).collect()
    }
    assert got == want and got


def test_shared_memo_eviction_is_lru_not_fifo():
    """r9 (r8 verdict #3): cycling 5 fixtures through a cap-4 cache
    while fixture A stays hot must evict a COLD fixture, never A —
    the old FIFO `_evict_oldest` dropped the oldest-INSERTED entry
    even when it was the hottest."""
    from cass_cdc_pg_spark.registry import (
        _SHARED_CACHE_MAX,
        _evict_oldest,
        _lru_hit,
    )

    cache: dict = {}

    def get_or_insert(key):
        hit = _lru_hit(cache, key)
        if hit is None:
            _evict_oldest(cache)
            hit = cache[key] = {"fixture": key}
        return hit

    assert _SHARED_CACHE_MAX == 4
    hot = "A"
    get_or_insert(hot)  # inserted FIRST — FIFO would evict it first
    for cold in ("B", "C", "D", "E", "F"):
        get_or_insert(cold)
        assert _lru_hit(cache, hot) is not None, (cold, list(cache))
        assert len(cache) <= _SHARED_CACHE_MAX
    # and the LRU cold entries are the ones that left
    assert "B" not in cache and "C" not in cache
    # re-miss of an evicted key repopulates without exceeding the cap
    get_or_insert("B")
    assert len(cache) <= _SHARED_CACHE_MAX and "A" in cache


def test_remove_duplicated_blocks_known_accounting(spark):
    """Hand-checkable block accounting (block_tokens=4): the globally
    FIRST occurrence of every duplicated block survives (ordered by
    doc_id then block index), repeats are cut — including repeats
    WITHIN one doc — and a short tail block must never alias the
    prefix of a full block (the length-finalized hash)."""
    rows = [
        (1, "a b c d e f g h", "s1"),        # 2 full blocks, both first
        (2, "a b c d x y", "s1"),            # blk0 dup of doc1, tail unique
        (3, "a b c d a b c d", "s2"),        # both blocks repeat doc1's blk0
        (4, "a b", "s2"),                    # partial block == doc1 prefix
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = {
        r["doc_id"]: r
        for r in text.remove_duplicated_blocks(docs, block_tokens=4).collect()
    }
    assert len(out) == 4
    # doc 1: first occurrence of [a b c d] and [e f g h] — keeps all
    assert (out[1]["n_blocks"], out[1]["n_blocks_removed"]) == (2, 0)
    assert (out[1]["tokens_total"], out[1]["tokens_kept"]) == (8, 8)
    # doc 2: [a b c d] is a repeat (doc1 blk0 came first); [x y] unique
    assert (out[2]["n_blocks"], out[2]["n_blocks_removed"]) == (2, 1)
    assert (out[2]["tokens_total"], out[2]["tokens_kept"]) == (6, 2)
    # doc 3: BOTH blocks repeat [a b c d] — intra-doc repeats cut too
    assert (out[3]["n_blocks"], out[3]["n_blocks_removed"]) == (2, 2)
    assert (out[3]["tokens_total"], out[3]["tokens_kept"]) == (8, 0)
    # doc 4: 2-token partial [a b] must NOT collide with the 4-token
    # block [a b c d] whose fold passes through the same prefix state
    assert (out[4]["n_blocks"], out[4]["n_blocks_removed"]) == (1, 0)
    assert (out[4]["tokens_total"], out[4]["tokens_kept"]) == (2, 2)


def test_remove_duplicated_blocks_omits_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "", "s"), (2, "a b c", "s")],
        "doc_id long, text string, source string",
    )
    out = text.remove_duplicated_blocks(docs, block_tokens=4).collect()
    assert [r["doc_id"] for r in out] == [2]
    assert out[0]["n_blocks"] == 1 and out[0]["tokens_kept"] == 3


def test_quality_token_budget_by_source_gate_order_and_cut(spark):
    """The quality gate (>=20 tokens, unique_ratio>=0.3) filters
    first; within a source admission is by unique_ratio DESC then
    doc_id, cut at the running-token budget (strict fit)."""
    uniq = " ".join(f"w{i}" for i in range(20))          # ur = 1.0
    # 16 repeats + 4 distinct = 20 tokens, 5 distinct -> ur 0.25 < 0.3
    # (a 14+6 split gives 0.35 and would pass the gate, leaving the
    # repetitive branch untested — r9 review)
    mostly = "x " * 16 + " ".join(f"y{i}" for i in range(4))
    mid = " ".join(f"w{i % 12}" for i in range(20))      # ur = 0.6
    rows = [
        (1, uniq, "s1"),       # ur 1.0, 20 tokens — admitted first
        (2, mid, "s1"),        # ur 0.6, 20 tokens — admitted second
        (3, uniq, "s1"),       # ur 1.0 but doc_id>1 — admitted after 1
        (4, "too short", "s1"),    # < 20 tokens — gated out
        (5, mostly, "s1"),     # repetitive — gated out
        (6, mid, "s2"),        # other source has its own budget
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = text.quality_token_budget_by_source(docs, budget_tokens=45)
    got = {r["doc_id"]: r for r in out.collect()}
    # s1 order: doc1 (run 20), doc3 (run 40), doc2 would hit 60 > 45
    assert set(got) == {1, 3, 6}
    assert got[1]["running_tokens"] == 20
    assert got[3]["running_tokens"] == 40
    assert got[6]["running_tokens"] == 20 and got[6]["source"] == "s2"


def test_cluster_sample_balanced_and_ranked(spark):
    """Every cell contributes at most per_cell members, ranked by
    rounded cosine-to-centroid with id tie-break — a dense cluster
    cannot crowd out a sparse one."""
    # two orthogonal centroids; 5 vectors near c0, 1 near c1
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [(i, [1.0, 0.01 * i]) for i in range(5)] + [(9, [0.05, 2.0])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.cluster_sample(vecs, cents, per_cell=2).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append((r["cell_rank"], r["vec_id"]))
    assert set(by_cell) == {1, 2}
    assert len(by_cell[1]) == 2 and len(by_cell[2]) == 1
    # cell 1: vec 0 has cosine exactly 1.0 (rank 1); vec 1 next
    assert sorted(by_cell[1]) == [(1, 0), (2, 1)]
    assert by_cell[2] == [(1, 9)]


def test_best_of_cluster_upgrades_to_quality_choice(spark, tmp_path):
    """dedup_best_of_cluster (r9 wave 4): when two near-dups are both
    quality-'ok' with equal vocabulary diversity, the LONGER doc wins
    even though it has the higher id — ``upgraded`` marks that the
    quality rule disagreed with min-id canonicality; singletons never
    appear in the report."""
    from cass_cdc_pg_spark.registry import dedup_best_of_cluster_q

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lamda mu nu xi omicron pi rho sigma tau upsilon phi"
    )
    longer = base + " extra"
    rows = [
        (0, base, "en", "s", len(base)),
        (1, longer, "en", "s", len(longer)),
        (2, "totally different unrelated content words zebra yak "
            "xylophone quark jolt vex wimp dozy fjord glyph nymph "
            "crwth squib zarf pique jambs vodka fuzzy", "en", "s", 120),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = dedup_best_of_cluster_q(spark, str(tmp_path)).collect()
    assert len(out) == 1  # doc 2 is a singleton -> excluded
    r = out[0]
    assert r.component_id == 0 and r.cluster_size == 2
    assert r.min_doc_id == 0 and r.best_doc_id == 1
    assert r.best_quality == "ok" and bool(r.upgraded) is True


def test_padding_waste_bucket_edges_exact(spark):
    """padding_waste (r9 wave 4): bucket edges are integer-exact — a
    32-token doc lands in bucket 32 (zero pad), 33 tokens in bucket
    64; the waste ratio divides exact longs."""
    from cass_cdc_pg_spark.operators.text import padding_waste

    rows = [
        (1, " ".join(["t"] * 32)),
        (2, " ".join(["t"] * 33)),
        (3, " ".join(["t"] * 31)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.bucket_len: (r.n_docs, r.total_tokens, r.padding_tokens, r.waste_ratio)
        for r in padding_waste(df).collect()
    }
    assert got[32] == (2, 63, 1, round(1 / 64, 4))
    assert got[64] == (1, 33, 31, round(31 / 64, 4))


def test_minhash_precision_exact_on_identical_docs(spark, tmp_path):
    """dedup_minhash_precision (r9 wave 4): identical documents must
    report exact_num == exact_den (Jaccard 1), est 1.0, and never be
    flagged underestimated; the disjoint third doc contributes no
    pair."""
    from cass_cdc_pg_spark.registry import dedup_minhash_precision_q

    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, dup, "en", "s", len(dup)),
        (1, dup, "en", "s", len(dup)),
        (2, "different words entirely about other things zebra yak",
         "en", "s", 55),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = dedup_minhash_precision_q(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (0, 1)
    assert r.exact_num == r.exact_den > 0
    assert r.est_jaccard == 1.0
    assert bool(r.underestimated) is False


# ---------------------------------------------------------------------------
# Product quantization tier
# ---------------------------------------------------------------------------


def test_train_pq_codebooks_deterministic_and_shaped(spark):
    from cass_cdc_pg_spark.sources import tables as src

    path = src.table_path("/root/testdata/sf0.001", "embeddings")
    b1 = similarity.train_pq_codebooks(path, m=8, ksub=16)
    b2 = similarity.train_pq_codebooks(path, m=8, ksub=16)
    assert b1 == b2
    assert len(b1) == 8 and all(len(book) == 16 for book in b1)
    assert all(len(c) == 8 for book in b1 for c in book)


def test_pq_encode_codes_in_range_and_centroid_exact(spark):
    """Codes are valid indices, and a vector assembled FROM sub-
    centroids encodes to exactly those codes (zero quantization
    error beats every other centroid)."""
    from cass_cdc_pg_spark.sources import tables as src

    sf = "/root/testdata/sf0.001"
    emb = src.load_table(spark, sf, "embeddings")
    books = similarity.train_pq_codebooks(src.table_path(sf, "embeddings"))
    codes = similarity.pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])

    picked = [3, 0, 15, 7, 9, 1, 12, 5]
    vec = [v for j, c in enumerate(picked) for v in books[j][c]]
    df = spark.createDataFrame(
        [(0, vec)], "vec_id long, embedding array<float>"
    )
    # float32 storage rounds the float64 centroids, so the assembled
    # vector is NEAR each picked centroid, not exactly on it — still
    # decisively nearest (codebook cells are far apart vs 1-ulp noise)
    out = similarity.pq_encode(df, books).collect()[0]["codes"]
    assert list(out) == picked


def test_pq_topk_matches_driver_side_adc_recompute(spark):
    """The distributed ADC pipeline (codegen encode + Arrow kernel +
    pruned window top-k) must equal a straight driver-side recompute
    of the same math over the same fixture — catches pruning bugs,
    code/table misalignment, and tie-rule drift."""
    import numpy as np

    from cass_cdc_pg_spark.sources import tables as src

    sf = "/root/testdata/sf0.001"
    emb = src.load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    books = similarity.train_pq_codebooks(src.table_path(sf, "embeddings"))

    got = sorted(
        tuple(r) for r in similarity.pq_topk(emb, q, books, k=5).collect()
    )

    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    cent = np.array(books, dtype=np.float64)  # m x ksub x sub
    m, ksub, sub = cent.shape
    # encode: per subspace argmin of the same left-to-right fold
    codes = np.zeros((len(ids), m), dtype=np.int64)
    for j in range(m):
        d = np.zeros((len(ids), ksub))
        for dd in range(sub):
            diff = x[:, j * sub + dd, None] - cent[None, j, :, dd]
            d += diff * diff
        codes[:, j] = np.argmin(d, axis=1)
    qmask = ids < 10
    qtab = np.zeros((int(qmask.sum()), m, ksub))
    for j in range(m):
        for dd in range(sub):
            diff = x[qmask, j * sub + dd, None] - cent[None, j, :, dd]
            qtab[:, j, :] += diff * diff
    expected = []
    for qi, qid in enumerate(ids[qmask]):
        dist = np.zeros(len(ids))
        for j in range(m):
            dist += qtab[qi, j, codes[:, j]]
        cand = [
            (round(float(d), 6), int(n))
            for d, n in zip(dist, ids)
            if n != qid
        ]
        cand.sort()
        for rank, (d, n) in enumerate(cand[:5], 1):
            expected.append((int(qid), n, rank, d))
    assert got == sorted(expected)


def test_l2_topk_and_pq_recall_floor(spark):
    """Exact-L2 kernel equals a numpy recompute; PQ recall@5 against
    it stays above the measured floor (conservative: leaves headroom
    for fixture regeneration, not design slack)."""
    import numpy as np

    from cass_cdc_pg_spark.sources import tables as src

    sf = "/root/testdata/sf0.001"
    emb = src.load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)

    got = {
        (r["query_id"], r["neighbor_id"]): r["rank"]
        for r in similarity.l2_topk(emb, q, k=5).collect()
    }
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    for qid in range(10):
        d = ((x - x[ids == qid]) ** 2).sum(axis=1)
        order = sorted(
            (round(float(dd), 6), int(n))
            for dd, n in zip(d, ids)
            if n != qid
        )
        for rank, (_, n) in enumerate(order[:5], 1):
            assert got[(qid, n)] == rank

    # the registry's production params (m=16, ksub=256 — one byte per
    # subspace, the FAISS default resolution): measured recall 0.80 on
    # this fixture (vs 0.28 at the r10 ksub=16 tier) — 0.6 is the r10
    # verdict's floor and leaves regeneration headroom, not design
    # slack
    books = similarity.train_pq_codebooks(
        src.table_path(sf, "embeddings"), m=16, ksub=256
    )
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.pq_topk(emb, q, books, k=5).collect()
    }
    exact = set(got)
    assert len(exact & approx) / len(exact) >= 0.6


def test_pq_encode_kernels_bit_identical(spark):
    """Arrow-kernel encode == JVM-expression encode, code for code —
    the same cross-check contract cosine_topk's two kernels carry."""
    from cass_cdc_pg_spark.sources import tables as src

    sf = "/root/testdata/sf0.001"
    emb = src.load_table(spark, sf, "embeddings")
    books = similarity.train_pq_codebooks(
        src.table_path(sf, "embeddings"), m=16, ksub=16
    )
    a = {r["vec_id"]: list(r["codes"])
         for r in similarity.pq_encode(emb, books).collect()}
    j = {r["vec_id"]: list(r["codes"])
         for r in similarity.pq_encode(emb, books, kernel="jvm").collect()}
    assert a == j


def test_weighted_sample_deterministic_bounded_and_weighted(spark):
    """weighted_sample_by_group: (a) two runs pick the identical
    sample; (b) at most k rows per group; (c) the scheme is actually
    weight-sensitive — heavier docs are over-represented vs a uniform
    sample (the kept set's mean token count exceeds the corpus
    mean)."""
    from cass_cdc_pg_spark.sources import tables as src

    sf = "/root/testdata/sf0.001"
    docs = src.load_table(spark, sf, "documents")
    a = sorted(map(tuple, text.weighted_sample_by_group(docs, k=5).collect()))
    b = sorted(map(tuple, text.weighted_sample_by_group(docs, k=5).collect()))
    assert a == b and a
    from collections import Counter

    per_group = Counter(r[0] for r in a)
    assert all(v <= 5 for v in per_group.values())
    kept_mean = sum(r[2] for r in a) / len(a)
    corpus_mean = (
        docs.selectExpr(
            "avg(size(filter(split(text, ' '), t -> t != ''))) AS m"
        ).first()["m"]
    )
    assert kept_mean > corpus_mean, (kept_mean, corpus_mean)


def test_edit_distance_pairs_known_and_exactly_once(spark):
    """edit_distance_pairs: finds the typo'd near-match, emits each
    unordered pair EXACTLY once (the three-band explode joins each
    pair on one key — no distinct needed), respects the threshold,
    and the oversized-block cap drops a degenerate blocking key from
    both sides."""
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delts"),       # dist 1 to doc 1
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (4, "omega completely different text here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(tuple, dedup.edit_distance_pairs(docs, prefix_chars=24, max_dist=3).collect())
    )
    # docs 1-3 share the first token; doc 1's full text is its 22-char
    # prefix and doc 3's 24-char prefix appends " e" -> dist 2; doc 2
    # is 1 edit away from doc 1
    assert (1, 2, 1) in got
    assert (1, 3, 2) in got
    assert all(a < b for a, b, _ in got)
    assert len(got) == len(set((a, b) for a, b, _ in got))  # exactly once
    assert not [p for p in got if p[2] > 3]

    # cap: with max_block=2 the 3-doc 'alpha' block is dropped entirely
    capped = dedup.edit_distance_pairs(
        docs, prefix_chars=24, max_dist=3, max_block=2
    ).collect()
    assert capped == []


def test_edit_distance_pairs_cross_band_neighbors_found(spark):
    """A pair whose prefix lengths straddle a band boundary must still
    match (the adjacent-band explode exists for exactly this)."""
    # band width = max_dist+1 = 3: lengths 11 and 13 land in bands 3
    # and 4, distance 2 <= max_dist
    rows = [(1, "aa bbbbbbbb"), (2, "aa bbbbbbbbbb")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in dedup.edit_distance_pairs(
        docs, prefix_chars=20, max_dist=2
    ).collect()]
    assert got == [(1, 2, 2)]


def test_ivfpq_full_probe_equals_full_scan_adc(spark):
    """IVFPQ exactness pin (the IVF full-probe test's PQ analog):
    probing ALL cells makes the candidate set the whole corpus, so
    the composed index must equal full-scan ADC (pq_topk) row for
    row — any divergence is a probe/assignment bug, since the ADC
    math is shared."""
    from cass_cdc_pg_spark import registry
    from cass_cdc_pg_spark.sources import tables as src

    sf = "/root/testdata/sf0.001"
    emb = src.load_table(spark, sf, "embeddings")
    books = registry._pq_codebooks(sf)
    cent = registry._ivf_centroids(sf)
    q_rows = (
        emb.filter(F.col("vec_id") < 10)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    full_probe = sorted(
        tuple(r)
        for r in similarity.ivfpq_topk(
            similarity.ivfpq_index(emb, cent, books),
            spark,
            q_rows,
            cent,
            books,
            k=5,
            nprobe=len(cent),
        ).collect()
    )
    full_scan = sorted(
        tuple(r)
        for r in similarity.pq_topk(
            emb, emb.filter(F.col("vec_id") < 10), books, k=5
        ).collect()
    )
    assert full_probe == full_scan


def test_pq_encode_kernels_bit_identical_at_production_ksub(spark):
    """The kernels-bit-identical contract at the PRODUCTION resolution
    (m=16, ksub=256 — 8-bit sub-quantizers): the registry runs the
    Arrow kernel in bulk and the 4096-fold JVM expression exists as
    the cross-check, so the pin must hold where the codebooks actually
    live, not only at the toy ksub=16.  Bounded to 50 vectors: the
    JVM expression's cost is analysis (plan-size), not rows."""
    from cass_cdc_pg_spark import registry
    from cass_cdc_pg_spark.sources import tables as src

    sf = "/root/testdata/sf0.001"
    emb = src.load_table(spark, sf, "embeddings").filter(
        F.col("vec_id") < 50
    )
    books = registry._pq_codebooks(sf)
    assert len(books[0]) == 256  # production resolution under test
    a = {r["vec_id"]: list(r["codes"])
         for r in similarity.pq_encode(emb, books).collect()}
    j = {r["vec_id"]: list(r["codes"])
         for r in similarity.pq_encode(emb, books, kernel="jvm").collect()}
    assert a == j and len(a) == 50


def test_pq_refine_recovers_exact_topk(spark):
    """Search-then-refine (r11): re-ranking the ADC top-50 by exact L2
    must reproduce the exact top-5 VERBATIM on this fixture (measured
    recall 1.0 at sf0.001 and sf0.01 — the true neighbors sit inside
    the shortlist), i.e. the refine stage recovers the exactness the
    16-byte codes gave up."""
    from cass_cdc_pg_spark import registry
    from cass_cdc_pg_spark.sources import tables as src

    sf = "/root/testdata/sf0.001"
    emb = src.load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    books = registry._pq_codebooks(sf)
    exact = sorted(
        tuple(r) for r in similarity.l2_topk(emb, q, k=5).collect()
    )
    refined = sorted(
        tuple(r)
        for r in similarity.pq_refine_topk(
            emb, q, books, k=5, shortlist=50
        ).collect()
    )
    assert refined == exact


def test_ivfpq_append_equals_full_rebuild(spark):
    """Incremental index maintenance (r12, r11 verdict #3): appending
    the 10% batch onto an index built from the other 90% must equal
    the full rebuild row for row — cell assignment and codes depend
    only on the trained literals, never on corpus membership — and a
    shortlist smaller than k must clamp (r11 advice) instead of
    silently returning fewer than k rows."""
    from cass_cdc_pg_spark import registry
    from cass_cdc_pg_spark.sources import tables as src

    sf = "/root/testdata/sf0.001"
    emb = src.load_table(spark, sf, "embeddings")
    books = registry._pq_codebooks(sf)
    cent = registry._ivf_centroids(sf)
    base = emb.filter(F.col("vec_id") % 10 != 7)
    new = emb.filter(F.col("vec_id") % 10 == 7)
    appended = sorted(
        (r["neighbor_id"], r["cell"], tuple(r["codes"]))
        for r in similarity.ivfpq_append(
            similarity.ivfpq_index(base, cent, books), new, cent, books
        ).collect()
    )
    rebuilt = sorted(
        (r["neighbor_id"], r["cell"], tuple(r["codes"]))
        for r in similarity.ivfpq_index(emb, cent, books).collect()
    )
    assert appended == rebuilt and len(appended) == emb.count()
    # shortlist < k clamps to k (r11 advice): still k rows per query
    q = emb.filter(F.col("vec_id") < 3)
    out = similarity.pq_refine_topk(emb, q, books, k=5, shortlist=2)
    counts = {r["query_id"]: r["n"] for r in out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {0: 5, 1: 5, 2: 5}


def test_unigram_logprob_ranks_rare_token_docs_low(spark):
    """The scorer's reason to exist: a document of corpus-common
    tokens must out-score one of hapax tokens, every mean is ≤ 0
    (P(t) ≤ 1), and the per-doc token counts cover the corpus."""
    common = "the cat sat on the mat " * 5
    rare = "zqx1 zqx2 zqx3 zqx4 zqx5 zqx6"
    docs = spark.createDataFrame(
        [(1, common.strip()), (2, common.strip()), (3, rare)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.unigram_logprob(docs).collect()}
    assert out[3]["mean_logprob"] < out[1]["mean_logprob"] <= 0.0
    assert out[1]["mean_logprob"] == out[2]["mean_logprob"]  # same text
    n_total = sum(r["n_tokens"] for r in out.values())
    assert n_total == 30 + 30 + 6
    # exact-integer contract: sum_logprob_micros is the rounded
    # per-token table summed, so equal docs have EQUAL sums
    assert out[1]["sum_logprob_micros"] == out[2]["sum_logprob_micros"]


def test_shard_balance_covers_corpus(spark):
    """Hash sharding must partition the corpus: shard ids in [0, N),
    doc totals reconcile, imbalance is share·N."""
    from cass_cdc_pg_spark import registry

    sf = "/root/testdata/sf0.001"
    rows = registry.docs_shard_balance_q(spark, sf).collect()
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(0 <= r["shard"] < registry._SHARD_N for r in rows)
    tot = sum(r["total_tokens"] for r in rows)
    for r in rows:
        assert abs(r["token_share"] - r["total_tokens"] / tot) < 1e-5
        assert abs(r["imbalance"] - r["token_share"] * registry._SHARD_N) < 1e-4


def test_cell_drift_consistent_with_cell_stats(spark):
    """embedding_cell_drift invariants on the real fixture: per-cell
    base+new counts reconcile with the cell-stats assignment (same
    constant-folded argmax), totals cover the corpus with the 90/10
    batch carve-out, shares sum to 1 per side, and the micros-exact
    means sit in [0, 2] (cosine distance range)."""
    from cass_cdc_pg_spark import registry

    sf = "/root/testdata/sf0.001"
    drift = registry.embedding_cell_drift_q(spark, sf).collect()
    stats = {
        r["cell"]: r["n_vectors"]
        for r in registry.embeddings_cell_stats_q(spark, sf).collect()
    }
    n = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    assert sum(r["n_base"] + r["n_new"] for r in drift) == n
    assert sum(r["n_new"] for r in drift) == n // 10  # vec_id ≡ 7 (mod 10)
    for r in drift:
        assert r["n_base"] + r["n_new"] == stats[r["cell"]]
        for m in (r["mean_cosdist_base"], r["mean_cosdist_new"]):
            if m is not None:
                assert 0.0 <= m <= 2.0
    assert abs(sum(r["share_base"] for r in drift) - 1.0) < 1e-4
    assert abs(sum(r["share_new"] for r in drift) - 1.0) < 1e-4


def test_pq_recall_floors_hold_at_sf01(spark):
    """The r11 recall pins re-run where the bench measures (sf0.1,
    2000 vectors; r11 verdict #6).  ADC-only recall@5 degrades with
    corpus density at fixed 16 code bytes — measured 0.80 at 500
    vectors, 0.56 at 2000 (more true neighbors land inside one
    quantization cell's distance band) — so its sf0.1 floor is 0.5,
    justified as the compression-only tier's documented decay; the
    PRODUCTION answer is the refine tier, pinned here to recover the
    exact top-5 VERBATIM at this scale (measured recall 1.0 — the
    true neighbors sit inside the ADC shortlist of 50), which is the
    FAISS posture: the codes prune, the re-rank restores exactness."""
    from cass_cdc_pg_spark import registry
    from cass_cdc_pg_spark.sources import tables as src

    sf = "/root/testdata/sf0.1"
    emb = src.load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    books = registry._pq_codebooks(sf)
    exact_rows = similarity.l2_topk(emb, q, k=5).collect()
    exact = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.pq_topk(emb, q, books, k=5).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.5
    refined = sorted(
        tuple(r)
        for r in similarity.pq_refine_topk(
            emb, q, books, k=5, shortlist=50
        ).collect()
    )
    assert refined == sorted(tuple(r) for r in exact_rows)
    # the hard-negative mining depth (r13): refine@k=10 recall at this
    # density (measured 0.93 — at 2000 vectors a handful of true
    # top-10 members sit outside the ADC top-50).  This is WHY the
    # mining query's oracle expresses the analytic ADC-shortlist
    # pipeline rather than the exact scan: exact-oracle parity would
    # silently depend on recall staying 1.0 as the corpus grows.
    exact10 = {(r["query_id"], r["neighbor_id"]) for r in
               similarity.l2_topk(emb, q, k=10).collect()}
    refined10 = {(r["query_id"], r["neighbor_id"]) for r in
                 similarity.pq_refine_topk(
                     emb, q, books, k=10, shortlist=50
                 ).collect()}
    assert len(exact10 & refined10) / len(exact10) >= 0.9


def test_incremental_containment_equals_full_restricted(spark):
    """The incremental containment feed's whole claim (r14): pairs
    computed batch-vs-standing-index == the full-corpus recompute
    restricted to new-involving pairs — INCLUDING the stop-shingle
    guard, which must compose additively across the split (standing
    df + batch df = corpus df).  The fixture plants a boilerplate
    shingle whose corpus df crosses the cap only when base and batch
    counts are SUMMED, so a guard applied on either side alone gives
    a different (wrong) answer."""
    boiler = "common header line"
    base_rows = [
        (1, f"{boiler} alpha beta gamma delta"),
        (2, f"{boiler} alpha beta gamma epsilon"),
        (3, f"{boiler} zeta eta theta iota"),
        (4, "totally unrelated base document text here"),
    ]
    new_rows = [
        (10, f"{boiler} alpha beta gamma delta"),      # near-dup of 1
        (11, f"{boiler} kappa lambda mu nu"),
        (12, "totally unrelated base document text here"),  # dup of 4
        (13, "brand new content nothing shared anywhere"),
        (14, "brand new content nothing shared anywhere at all"),  # nn pair
    ]
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    full = base.unionByName(new)
    cap = 4  # boiler trigram df: 3 in base + 2 in new = 5 > 4 — only combined
    postings, sizes, df_rel = dedup.containment_index_relations(base, n=3)
    inc = {
        (r["doc_a"], r["doc_b"]): (
            r["containment_a"], r["containment_b"], r["jaccard"]
        )
        for r in dedup.incremental_containment_pairs(
            postings, sizes, df_rel, new, n=3, threshold=0.3, max_doc_freq=cap
        ).collect()
    }
    new_ids = {r[0] for r in new_rows}
    ref = {
        (r["doc_a"], r["doc_b"]): (
            r["containment_a"], r["containment_b"], r["jaccard"]
        )
        for r in dedup.shingle_containment_pairs(
            full, n=3, threshold=0.3, max_doc_freq=cap
        ).collect()
        if r["doc_a"] in new_ids or r["doc_b"] in new_ids
    }
    assert inc == ref
    assert inc  # non-vacuous: the fixture produces new-involving pairs
    assert (13, 14) in inc  # the within-batch (new x new) side
    assert (1, 10) in inc  # the batch-vs-index side
    # the guard actually bit: the stopped boiler shingles undercount
    # the (1, 10) intersection relative to an unguarded run
    unguarded = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.shingle_containment_pairs(
            full, n=3, threshold=0.3
        ).collect()
    }
    assert unguarded[(1, 10)] > inc[(1, 10)][2]


def test_containment_admission_policy_branches(spark, monkeypatch, tmp_path):
    """The admission decision's three branches (late r14), driven on a
    synthetic fixture where the gate corpus is too tame: (1) a new doc
    ≥90% contained in an INCUMBENT is rejected, the incumbent is never
    tested; (2) MUTUAL new×new containment keeps the lower id
    (first-seen-wins); (3) one-directional new×new containment rejects
    the contained side even when it has the LOWER id."""
    from cass_cdc_pg_spark import registry, registry_corpus

    # carve-out residues: ((id % 10000) * 48271) % 10000 < 1000
    def is_new(i):
        return ((i % 10000) * 48271) % 10000 < 1000

    new_ids = [i for i in range(1, 2000) if is_new(i)]
    base_ids = [i for i in range(1, 2000) if not is_new(i)]
    text_a = " ".join(f"w{j}" for j in range(30))          # 28 trigrams
    wrapper = text_a + " " + " ".join(f"x{j}" for j in range(40))
    text_c = " ".join(f"y{j}" for j in range(30))
    rows = [
        (base_ids[0], wrapper),              # incumbent wrapping text_a
        (new_ids[0], text_a),                # (1) contained in incumbent
        (new_ids[1], text_c),                # (2) mutual pair, lower id
        (new_ids[2], text_c),                # (2) mutual pair, higher id
        (new_ids[3], text_c + " " + " ".join(f"z{j}" for j in range(40))),
        # ^ wrapper for (3): new_ids[1]/[2] are also contained in it,
        #   but the branch under test is that a CONTAINED lower id
        #   loses to one-directional containment
        (base_ids[1], " ".join(f"q{j}" for j in range(30))),  # unrelated
        (new_ids[4], " ".join(f"r{j}" for j in range(30))),   # clean admit
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sf = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: (r["admit"], r["n_rejecting_pairs"])
        for r in registry.dedup_containment_admission_q(spark, sf).collect()
    }
    assert got[new_ids[0]][0] is False          # branch (1)
    assert got[new_ids[1]][0] is False          # contained in [2]? mutual
    assert got[new_ids[2]][0] is False          # mutual loser + contained in [3]
    assert got[new_ids[3]][0] is True           # the wrapper itself survives
    assert got[new_ids[4]][0] is True           # clean content admitted
    # first-seen-wins on the mutual pair alone: [1] is rejected only
    # via one-directional containment in [3]'s wrapper, never by [2]
    # (mutual keeps the lower id) — so removing [3] must admit [1].
    docs2 = spark.createDataFrame(
        [r for r in rows if r[0] != new_ids[3]],
        "doc_id long, text string",
    )
    sf2 = str(tmp_path / "v2")
    docs2.write.mode("overwrite").parquet(f"{sf2}/documents.parquet")
    got2 = {
        r["doc_id"]: r["admit"]
        for r in registry.dedup_containment_admission_q(spark, sf2).collect()
    }
    assert got2[new_ids[1]] is True             # mutual winner (lower id)
    assert got2[new_ids[2]] is False            # mutual loser


def test_merge_containment_index_equals_rebuild(spark):
    """merge_containment_index (r15): merging a disjoint batch into a
    standing index must equal a from-scratch rebuild over the union,
    relation for relation — postings/sizes append on disjoint ids, df
    is additive.  Exact row-set comparison on a hand-built corpus."""
    from cass_cdc_pg_spark.operators import dedup

    base = spark.createDataFrame(
        [
            (1, "a b c a b c"),
            (2, "a b c d e f"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "a b c x y z"),
            (11, "x y z x y z"),
        ],
        "doc_id long, text string",
    )
    both = base.unionByName(batch)
    p0, s0, d0 = dedup.containment_index_relations(base, n=3)
    mp, ms, md = dedup.merge_containment_index(p0, s0, d0, batch, n=3)
    rp, rs, rd = dedup.containment_index_relations(both, n=3)
    for merged, rebuilt in ((mp, rp), (ms, rs), (md, rd)):
        got = sorted(map(tuple, merged.collect()))
        want = sorted(map(tuple, rebuilt.collect()))
        assert got == want and len(got) > 0


def test_merge_band_table_equals_rebuild(spark):
    """merge_band_table (r15): appending a disjoint batch's band rows
    to a standing band table must equal a from-scratch rebuild over
    the union — a doc's signature depends only on its own shingles.
    Exact row-set comparison on a hand-built corpus."""
    from cass_cdc_pg_spark.operators import dedup

    base = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d x y z w"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "a b c d e f g q"), (11, "p q r s t u v w")],
        "doc_id long, text string",
    )
    both = base.unionByName(batch)
    bt = dedup.banded_signatures(base, num_hashes=16, bands=4, n=2)
    merged = dedup.merge_band_table(bt, batch, num_hashes=16, bands=4, n=2)
    rebuilt = dedup.banded_signatures(both, num_hashes=16, bands=4, n=2)
    got = sorted((r.doc_id, tuple(r.sig), r.band, r.bucket)
                 for r in merged.collect())
    want = sorted((r.doc_id, tuple(r.sig), r.band, r.bucket)
                  for r in rebuilt.collect())
    assert got == want and len(got) == 4 * 4  # 4 docs x 4 bands


def test_incremental_containment_shuffle_fallback_parity(spark):
    """incremental_containment_pairs broadcast_new=False (the r14
    advice fallback for jumbo batches): the shuffled-hash-join path
    must return exactly the broadcast path's rows — the flag is a
    plan choice, never a semantics choice."""
    from cass_cdc_pg_spark.operators import dedup

    base = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "k l m n o p q r s t"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "a b c d e f g h x y"), (11, "a b c d z w v u s t")],
        "doc_id long, text string",
    )
    postings, sizes, dfr = dedup.containment_index_relations(base, n=3)
    kw = dict(n=3, threshold=0.2, max_doc_freq=1000)
    bc = dedup.incremental_containment_pairs(
        postings, sizes, dfr, batch, broadcast_new=True, **kw
    )
    sh = dedup.incremental_containment_pairs(
        postings, sizes, dfr, batch, broadcast_new=False, **kw
    )
    got_bc = sorted(map(tuple, bc.collect()))
    got_sh = sorted(map(tuple, sh.collect()))
    assert got_bc == got_sh and len(got_bc) > 0


def test_merge_band_table_empty_sides(spark):
    """merge_band_table (r15) edge cases: an empty batch leaves the
    standing table unchanged; an empty standing table makes the merge
    exactly the batch's band table; docs with fewer tokens than the
    shingle width contribute no rows on either path."""
    from cass_cdc_pg_spark.operators import dedup

    schema = "doc_id long, text string"
    base = spark.createDataFrame([(1, "a b c d"), (2, "x")], schema)
    empty = spark.createDataFrame([], schema)
    kw = dict(num_hashes=16, bands=4, n=2)
    bt = dedup.banded_signatures(base, **kw)

    def rows(df):
        return sorted((r.doc_id, tuple(r.sig), r.band, r.bucket)
                      for r in df.collect())

    # empty batch: merge == standing (doc 2 is unshingleable at n=2,
    # so only doc 1's 4 band rows exist)
    assert rows(dedup.merge_band_table(bt, empty, **kw)) == rows(bt)
    assert len(rows(bt)) == 4
    # empty standing table: merge == batch bands
    empty_bt = dedup.banded_signatures(empty, **kw)
    batch = spark.createDataFrame([(10, "p q r s")], schema)
    assert rows(dedup.merge_band_table(empty_bt, batch, **kw)) == rows(
        dedup.banded_signatures(batch, **kw)
    )


def test_minhash_signature_matches_pure_python_recompute(spark):
    """r16 (expr-built signature constructors): the minhash signature
    and band-bucket relation must equal a fully independent pure-Python
    recompute — 60-bit md5 token hash, (h*a+b) mod P per coefficient,
    min over distinct shingles, md5 band buckets over the comma-joined
    per-band signature slice.  Pins the exact arithmetic/typing of the
    single-string SQL construction (long literals, 0-based sig[i])
    against the documented spec, not against another Spark plan."""
    import hashlib

    from cass_cdc_pg_spark.operators import dedup

    num_hashes, bands, n = 8, 4, 2
    rows = [(1, "a b c d e"), (2, "c d e f"), (3, "a b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def tok_hash(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    coeffs = dedup.minhash_coeffs(num_hashes)
    P = dedup.MINHASH_P
    expect_sig = {}
    for doc_id, text in rows:
        tk = [t for t in text.split(" ") if t]
        sh = list(dict.fromkeys(
            " ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)
        ))
        if not sh:
            continue
        hs = [tok_hash(s) % P for s in sh]
        expect_sig[doc_id] = [
            min((h * a + b) % P for h in hs) for (a, b) in coeffs
        ]

    got_sig = {
        r.doc_id: list(r.sig)
        for r in dedup.minhash_signatures(docs, num_hashes, n).collect()
    }
    assert got_sig == expect_sig

    rpb = num_hashes // bands
    expect_bands = {
        (doc_id, bi): hashlib.md5(
            ",".join(str(v) for v in sig[bi * rpb:(bi + 1) * rpb]).encode()
        ).hexdigest()
        for doc_id, sig in expect_sig.items()
        for bi in range(bands)
    }
    got_bands = {
        (r.doc_id, r.band): r.bucket
        for r in dedup.banded_signatures(docs, num_hashes, bands, n).collect()
    }
    assert got_bands == expect_bands
