"""Property tests: new corpus operators against brute-force Python
models on randomized inputs (the same strategy test_keyed_table uses
for LSM convergence)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from cass_cdc_pg_spark.operators import dedup as dedup_mod
from cass_cdc_pg_spark.operators import text as text_ops

# multi-minute Spark-heavy suite: excluded from the tight red-green
# loop (`pytest -m "not slow"`); the round gate runs it always
import pytest

pytestmark = pytest.mark.slow

_tok = st.text(alphabet="abc", min_size=1, max_size=2)
_doc = st.lists(_tok, min_size=0, max_size=20).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=8))
def test_repetition_stats_matches_bruteforce(spark, docs):
    from cass_cdc_pg_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for i, d in enumerate(docs):
        toks = [t for t in d.split(" ") if t]
        n = len(toks)
        r = got[i]
        if n == 0:
            assert r["top_token_frac"] is None
            continue
        assert r["top_token_frac"] == round(
            Counter(toks).most_common(1)[0][1] / n, 4)
        if n > 1:
            bg = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            assert r["top_bigram_frac"] == round(
                Counter(bg).most_common(1)[0][1] / len(bg), 4)
        if n > 2:
            tg = [" ".join(toks[j:j + 3]) for j in range(n - 2)]
            assert r["dup_trigram_frac"] == round(
                (len(tg) - len(set(tg))) / len(tg), 4)


@settings(max_examples=5, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=12),
    seq_len=st.integers(min_value=4, max_value=16),
)
def test_pack_sequences_running_total_invariants(spark, lens, seq_len):
    """Single shard: every doc's (pack_id, offset) equals the running
    token total divided/mod'd by seq_len; offsets never reach seq_len."""
    from cass_cdc_pg_spark.operators.text import pack_sequences

    docs = [(i, " ".join(["t"] * n)) for i, n in enumerate(lens)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           pack_sequences(df, seq_len=seq_len, n_shards=1).collect()}
    start = 0
    for i, n in enumerate(lens):
        r = got[i]
        assert r["n_tokens"] == n
        assert r["pack_id"] == start // seq_len
        assert r["offset_in_pack"] == start % seq_len < seq_len
        start += n
    # pack ids are monotone in doc order
    ids = [got[i]["pack_id"] for i in range(len(lens))]
    assert ids == sorted(ids)


@settings(max_examples=5, deadline=None)
@given(vec=st.lists(
    st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
    min_size=1, max_size=8))
def test_quantize_int8_reconstruction_bound(spark, vec):
    """|dequant - x| <= scale/2 and q in [-127, 127] for every element
    (checked via the exported sum/max and a Python re-quantization)."""
    import math

    from cass_cdc_pg_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    r = quantize_int8(df).collect()[0]
    xs = [float(x) for x in
          spark.createDataFrame([(vec,)], "v array<float>")
          .selectExpr("transform(v, x -> cast(x as double)) v")
          .collect()[0]["v"]]  # float32 -> double exactly as Spark sees it
    scale = max(abs(x) for x in xs) / 127.0
    assert abs(r["scale"] - scale) < 1e-15
    if scale == 0:
        assert r["q_sum"] == 0 and r["q_max"] == 0
        return
    q = [math.floor(x / scale + 0.5) for x in xs]
    assert r["q_sum"] == sum(q) and r["q_max"] == max(q)
    assert all(-127 <= qi <= 127 for qi in q)
    assert all(abs(qi * scale - x) <= scale / 2 + 1e-12 for qi, x in zip(q, xs))


@settings(max_examples=5, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=8), n=st.integers(2, 4))
def test_shingles_matches_bruteforce(spark, docs, n):
    """The zipped shifted-array shingle formulation (the perf-critical
    r6 rewrite) against the obvious Python model: distinct n-token
    shingles per doc, short docs yielding none, empties filtered."""
    from cass_cdc_pg_spark.operators.dedup import shingles

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {(r["doc_id"], r["shingle"]) for r in shingles(df, n).collect()}
    want = set()
    for i, d in enumerate(docs):
        toks = [t for t in d.split(" ") if t]
        for k in range(len(toks) - n + 1):
            want.add((i, " ".join(toks[k:k + n])))
    assert got == want


def test_train_val_test_split_disjoint_stable_and_shuffle_free(spark):
    """Split assignment: disjoint+exhaustive, stable under appends
    (existing docs never move), approximately weighted, and a pure
    projection (no Exchange, no Python)."""
    from pyspark.sql import functions as F

    from cass_cdc_pg_spark.operators.text import train_val_test_split

    docs = spark.range(10_000).selectExpr("id AS doc_id", "'t' AS text")
    out = train_val_test_split(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan

    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 10_000
    assert 0.85 <= counts["train"] / 10_000 <= 0.95
    assert counts["val"] + counts["test"] <= 0.15 * 10_000

    # append stability: the first 10k docs' assignments are unchanged
    # when the corpus doubles
    bigger = train_val_test_split(
        spark.range(20_000).selectExpr("id AS doc_id", "'t' AS text"))
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"]
         for r in bigger.filter(F.col("doc_id") < 10_000).collect()}
    assert a == b


def test_zipped_grams_equals_per_position_formulation(spark):
    """The shared fast gram builder must equal the naive per-position
    transform+slice formulation (the definition) for every n and doc
    length, including n > len, n == len, and empty docs."""
    from pyspark.sql import functions as F

    from cass_cdc_pg_spark.operators.text import tokens, zipped_grams

    docs = spark.createDataFrame(
        [(0, ""), (1, "a"), (2, "a b"), (3, "a b c"),
         (4, "a b c d e"), (5, "x x x x")],
        "doc_id long, text string",
    )
    for n in (2, 3, 4):
        toks = tokens(F.col("text"))
        naive = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        rows = docs.select(
            "doc_id",
            zipped_grams(toks, n).alias("fast"),
            naive.alias("slow"),
        ).collect()
        for r in rows:
            assert list(r["fast"]) == list(r["slow"]), (n, r["doc_id"])


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_edit_distance_pairs_equals_blocked_brute_force(spark, data):
    """edit_distance_pairs == a driver-side brute force of the SAME
    blocking contract (shared first token, lengths within max_dist,
    levenshtein <= max_dist) on arbitrary corpora — pins the band
    explode, the exactly-once join, and the threshold levenshtein
    against a trivially-auditable model."""
    words = st.sampled_from(["alpha", "beta", "gamma", "del", "epsilonn"])
    docs = data.draw(
        st.lists(
            st.lists(words, min_size=1, max_size=6).map(" ".join),
            min_size=2,
            max_size=10,
        )
    )
    rows = [(i, t) for i, t in enumerate(docs)]
    max_dist, prefix = 3, 16
    got = sorted(
        tuple(r)
        for r in dedup_mod.edit_distance_pairs(
            spark.createDataFrame(rows, "doc_id long, text string"),
            prefix_chars=prefix,
            max_dist=max_dist,
        ).collect()
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    expected = []
    for i, ta in rows:
        for j, tb in rows:
            if i >= j:
                continue
            pa, pb = ta[:prefix], tb[:prefix]
            if ta.split(" ")[0] != tb.split(" ")[0]:
                continue
            if abs(len(pa) - len(pb)) > max_dist:
                continue
            d = lev(pa, pb)
            if d <= max_dist:
                expected.append((i, j, d))
    assert got == sorted(expected)


@settings(max_examples=5, deadline=None)
@given(
    n=st.integers(min_value=3, max_value=30),
    k=st.integers(min_value=1, max_value=4),
)
def test_weighted_sample_equals_priority_model(spark, n, k):
    """weighted_sample_by_group == the closed-form priority model on
    arbitrary corpora: sort by (LCG-uniform / token-count, id) per
    group and take k."""
    rows = [
        (i, "s" + str(i % 3), "w " * (1 + (i * 7) % 9))
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = sorted(
        (r["source"], r["doc_id"], r["rank"])
        for r in text_ops.weighted_sample_by_group(docs, k=k).collect()
    )
    model = []
    for i, src_name, t in rows:
        ntok = len([w for w in t.split(" ") if w])
        u = ((i * 48271 + 11) % 104729 + 1) / 104730.0
        model.append((src_name, u / max(ntok, 1), i))
    expected = []
    from itertools import groupby

    for g, grp in groupby(sorted(model), key=lambda x: x[0]):
        members = sorted(grp, key=lambda x: (x[1], x[2]))
        for rank, (_, _, i) in enumerate(members[:k], 1):
            expected.append((g, i, rank))
    assert got == sorted(expected)


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_robust_outliers_matches_numpy_model(spark, data):
    """events_robust_outliers (r11): the explicit rank-selection
    median/MAD must equal a numpy recompute group for group on random
    inputs — medians, MADs, outlier counts, and fractions.  The two
    engines' agreement rests on both picking the SAME stored doubles;
    this pins the Spark side to the mathematical model."""
    import tempfile

    import numpy as np

    from cass_cdc_pg_spark import registry

    n = data.draw(st.integers(4, 40))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                data.draw(st.sampled_from(["x", "y"])),
                # two UTC days' worth of microsecond offsets
                data.draw(st.integers(0, 2 * 86400 - 1)) * 1_000_000,
                float(
                    data.draw(
                        st.floats(
                            min_value=-100,
                            max_value=100,
                            allow_nan=False,
                            allow_infinity=False,
                            width=64,
                        )
                    )
                ),
            )
        )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                # naive-UTC value for the UTC-pinned session
                # (utcfromtimestamp is deprecated since 3.12)
                (
                    eid,
                    et,
                    __import__("datetime")
                    .datetime.fromtimestamp(
                        us / 1e6, tz=__import__("datetime").timezone.utc
                    )
                    .replace(tzinfo=None),
                    uid,
                    v,
                )
                for (eid, et, us, v), uid in zip(rows, range(n))
            ],
            "event_id long, event_type string, ts timestamp, user_id long, value double",
        ).write.parquet(f"{d}/events.parquet")
        got = {
            (r["event_type"], r["day_no"]): r
            for r in registry.events_robust_outliers_q(spark, d).collect()
        }
    groups: dict = {}
    for eid, et, us, v in rows:
        groups.setdefault((et, us // 86_400_000_000), []).append(v)
    assert set(got) == set(groups)
    for key, vals in groups.items():
        a = np.array(sorted(vals))
        med = float(np.median(a))
        mad = float(np.median(np.abs(np.array(vals) - med)))
        n_out = sum(1 for v in vals if abs(v - med) > 3 * mad)
        r = got[key]
        assert r["n_events"] == len(vals)
        assert r["median"] == round(med, 6), (key, r["median"], med)
        assert r["mad"] == round(mad, 6), (key, r["mad"], mad)
        assert r["n_outliers"] == n_out
        assert r["outlier_frac"] == round(n_out / len(vals), 6)


@settings(max_examples=5, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=8))
def test_ngram_novelty_matches_bruteforce(spark, docs):
    """docs_ngram_novelty (r11): per-doc distinct-3-gram novelty vs a
    sequential pure-Python sweep (the definitional model: a shingle is
    novel at the LOWEST doc_id owning it)."""
    import tempfile

    from cass_cdc_pg_spark import registry

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)],
            "doc_id long, text string, lang string, source string, n_chars int",
        ).write.parquet(f"{d}/documents.parquet")
        got = {
            r["doc_id"]: r
            for r in registry.docs_ngram_novelty_q(spark, d).collect()
        }
    first: dict = {}
    expected: dict = {}
    for i, t in enumerate(docs):
        toks = [x for x in t.split(" ") if x]
        sh = {
            " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
        }
        if not sh:
            continue
        for s in sh:
            first.setdefault(s, i)
        novel = sum(1 for s in sh if first[s] == i)
        expected[i] = (len(sh), novel)
    assert set(got) == set(expected)
    for i, (n_sh, novel) in expected.items():
        r = got[i]
        assert (r["n_shingles"], r["n_novel"]) == (n_sh, novel)
        assert r["novelty_rate"] == round(novel / n_sh, 6)


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_distinctive_terms_matches_bruteforce_model(spark, data):
    """docs_source_distinctive_terms (r12): the smoothed odds-ratio
    ranking must equal a pure-Python recompute on random corpora —
    counts, the IEEE double ratio, and the per-source top-10 with
    token-asc tie-breaks.  Python floats are the same IEEE doubles
    the two engines use, so the model is exact, not approximate."""
    import tempfile

    from cass_cdc_pg_spark import registry

    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    n = data.draw(st.integers(4, 20))
    rows = []
    for i in range(n):
        toks = data.draw(
            st.lists(st.sampled_from(vocab), min_size=3, max_size=30)
        )
        src_name = data.draw(st.sampled_from(["s1", "s2"]))
        rows.append((i, " ".join(toks), "en", src_name, 0))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars int",
        ).write.parquet(f"{d}/documents.parquet")
        got = sorted(
            tuple(r)
            for r in registry.docs_source_distinctive_terms_q(
                spark, d
            ).collect()
        )
    from collections import Counter

    tc: Counter = Counter()
    for _, t, _, s, _ in rows:
        for tok in t.split(" "):
            if tok:
                tc[(s, tok)] += 1
    tok_tot = Counter()
    src_tot = Counter()
    for (s, tok), a in tc.items():
        tok_tot[tok] += a
        src_tot[s] += a
    grand = sum(src_tot.values())
    expected = []
    for s in src_tot:
        scored = []
        for (s2, tok), a in tc.items():
            if s2 != s or a < registry._DISTINCT_TERMS_MIN:
                continue
            b = tok_tot[tok] - a
            num = float(a + 1) * float((grand - src_tot[s]) - b + 1)
            den = float(src_tot[s] - a + 1) * float(b + 1)
            scored.append((-(num / den), tok, a, b))
        scored.sort()
        for rank, (neg, tok, a, b) in enumerate(
            scored[: registry._DISTINCT_TERMS_K], 1
        ):
            # engines round HALF_UP on the shortest decimal repr;
            # Python round() is banker's — at an exactly-representable
            # 6-dp tie (e.g. 13/128 = 0.1015625) they disagree, so
            # model the engines (the packing-sweep model's fix)
            from decimal import ROUND_HALF_UP, Decimal

            score6 = float(
                Decimal(repr(-neg)).quantize(
                    Decimal("1e-6"), ROUND_HALF_UP
                )
            )
            expected.append((s, tok, a, b, score6, rank))
    assert got == sorted(expected)


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_weekly_active_matches_bruteforce_model(spark, data):
    """events_weekly_active (r12): the sequence-explode trailing-7-day
    distinct must equal the definitional model (users with any event
    in [d-6, d]) for every day that has events — the exact invariant a
    per-day-sum shortcut gets wrong."""
    import datetime
    import tempfile

    from cass_cdc_pg_spark import registry

    n = data.draw(st.integers(3, 40))
    rows = []
    for i in range(n):
        day = data.draw(st.integers(0, 20))
        sec = data.draw(st.integers(0, 86399))
        uid = data.draw(st.integers(0, 6))
        ts = datetime.datetime.fromtimestamp(
            day * 86400 + sec, tz=datetime.timezone.utc
        ).replace(tzinfo=None)
        rows.append((i, "click", ts, uid, 1.0))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, event_type string, ts timestamp, "
            "user_id long, value double",
        ).write.parquet(f"{d}/events.parquet")
        got = {
            r["day_no"]: (r["n_daily"], r["n_weekly"], r["dau_wau_ratio"])
            for r in registry.events_weekly_active_q(spark, d).collect()
        }
    by_day: dict = {}
    for _, _, ts, uid, _ in rows:
        dno = int(ts.replace(tzinfo=datetime.timezone.utc).timestamp()) // 86400
        by_day.setdefault(dno, set()).add(uid)
    expected = {}
    for dno, users in by_day.items():
        weekly = set()
        for back in range(7):
            weekly |= by_day.get(dno - back, set())
        expected[dno] = (
            len(users),
            len(weekly),
            round(len(users) / len(weekly), 6),
        )
    assert got == expected


@settings(max_examples=5, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=12))
def test_packing_efficiency_matches_bruteforce_model(spark, docs):
    """docs_packing_efficiency (r12): per-length padded-slot sums and
    waste fractions equal the integer-exact Python model (pad each doc
    to ceil(n/L)*L) for every sweep length, empty docs included."""
    import tempfile

    from cass_cdc_pg_spark import registry

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)],
            "doc_id long, text string, lang string, source string, n_chars int",
        ).write.parquet(f"{d}/documents.parquet")
        got = {
            r["seq_len"]: r
            for r in registry.docs_packing_efficiency_q(spark, d).collect()
        }
    lens = [len([w for w in t.split(" ") if w]) for t in docs]
    for L in registry._PACK_SWEEP_LENS:
        chunks = [(n + L - 1) // L for n in lens]
        padded = sum(c * L for c in chunks)
        r = got[L]
        assert r["n_docs"] == len(docs)
        assert r["total_tokens"] == sum(lens)
        assert r["total_chunks"] == sum(chunks)
        assert r["padded_tokens"] == padded
        # Spark/DuckDB ROUND is half-up on the double's shortest
        # decimal repr; Python's round() is banker's — model the
        # engines, not Python
        from decimal import ROUND_HALF_UP, Decimal

        expect_waste = (
            float(
                Decimal(repr((padded - sum(lens)) / padded)).quantize(
                    Decimal("1e-6"), ROUND_HALF_UP
                )
            )
            if padded
            else None
        )
        assert r["waste_frac"] == expect_waste


@settings(max_examples=5, deadline=None)
@given(docs=st.lists(_doc, min_size=2, max_size=8))
def test_containment_pairs_match_bruteforce(spark, docs):
    """shingle_containment_pairs against the set-algebra definition:
    for every unordered pair with a non-empty shingle intersection,
    containment per direction and Jaccard equal the Python-set
    recompute, and the threshold filter keeps exactly the pairs where
    either direction clears it."""
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in dedup_mod.shingle_containment_pairs(
            df, n=2, threshold=0.3
        ).collect()
    }

    def sh(d):
        toks = [t for t in d.split(" ") if t]
        return {" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)}

    expect = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = sh(docs[a]), sh(docs[b])
            inter = len(sa & sb)
            if not inter:
                continue
            ca, cb = round(inter / len(sa), 4), round(inter / len(sb), 4)
            if max(ca, cb) >= 0.3:
                expect[(a, b)] = (
                    ca, cb, round(inter / len(sa | sb), 4))
    assert set(got) == set(expect)
    for k, (ca, cb, j) in expect.items():
        r = got[k]
        assert (r["containment_a"], r["containment_b"], r["jaccard"]) == (
            ca, cb, j)


@settings(max_examples=5, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=6))
def test_unigram_logprob_matches_bruteforce(spark, docs):
    """unigram_logprob against the Python model: identical count→
    micros table, identical integer sums, identical single divide."""
    import math

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in text_ops.unigram_logprob(df).collect()}
    toks_all = [t for d in docs for t in d.split(" ") if t]
    if not toks_all:
        assert got == {}
        return
    counts = Counter(toks_all)
    total = sum(counts.values())
    t_mu = int(round(round(math.log10(total), 6) * 1_000_000))
    for i, d in enumerate(docs):
        toks = [t for t in d.split(" ") if t]
        if not toks:
            assert i not in got
            continue
        s = sum(
            int(round(round(math.log10(counts[t]), 6) * 1_000_000))
            for t in toks
        ) - len(toks) * t_mu
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["sum_logprob_micros"] == s
        # integer half-away mean (the operator's tie-proof formula)
        if s < 0:
            mean_mu = -((-s * 2 + len(toks)) // (2 * len(toks)))
        else:
            mean_mu = (s * 2 + len(toks)) // (2 * len(toks))
        assert got[i]["mean_logprob"] == mean_mu / 1_000_000.0


@settings(max_examples=5, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=6))
def test_bigram_logprob_matches_bruteforce(spark, docs):
    """bigram_logprob against the Python conditional-MLE model:
    identical count→micros table over BOTH relations (bigram and
    prefix counts), identical integer sums, tie-proof mean."""
    import math

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in text_ops.bigram_logprob(df).collect()}
    bg_all, pfx_all = Counter(), Counter()
    per_doc = {}
    for i, d in enumerate(docs):
        toks = [t for t in d.split(" ") if t]
        pairs = list(zip(toks, toks[1:]))
        per_doc[i] = pairs
        for p, t in pairs:
            bg_all[(p, t)] += 1
            pfx_all[p] += 1
    if not bg_all:
        assert got == {}
        return

    def mu(c):
        return int(round(round(math.log10(c), 6) * 1_000_000))

    for i, pairs in per_doc.items():
        if not pairs:
            assert i not in got
            continue
        s = sum(mu(bg_all[(p, t)]) - mu(pfx_all[p]) for p, t in pairs)
        n = len(pairs)
        if s < 0:
            mean_mu = -((-s * 2 + n) // (2 * n))
        else:
            mean_mu = (s * 2 + n) // (2 * n)
        assert got[i]["n_bigrams"] == n
        assert got[i]["sum_logprob_micros"] == s
        assert got[i]["mean_logprob"] == mean_mu / 1_000_000.0


def test_bigram_logprob_ranks_scrambled_order_low(spark):
    """The conditional tier's reason to exist: same unigram profile,
    different word ORDER — the fluent doc must out-score the
    scrambled one (unigram_logprob cannot separate them)."""
    fluent = "the cat sat on the mat " * 6
    # same multiset of tokens, order scrambled deterministically
    toks = fluent.split()
    scrambled = " ".join(
        toks[i] for i in sorted(range(len(toks)), key=lambda i: (i * 17) % len(toks))
    )
    df = spark.createDataFrame(
        [(1, fluent.strip()), (2, scrambled)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in text_ops.bigram_logprob(df).collect()}
    assert got[1]["mean_logprob"] > got[2]["mean_logprob"]
    uni = {r["doc_id"]: r for r in text_ops.unigram_logprob(df).collect()}
    assert (
        abs(uni[1]["mean_logprob"] - uni[2]["mean_logprob"]) < 0.02
    )  # unigram barely separates them


def test_bigram_backoff_three_tiers_exact(spark):
    """The held-out backoff scorer (r14): a hand-built batch drives
    all three tiers — seen bigram (MLE), unseen bigram of seen
    tokens (0.4 x unigram MLE), and OOV token (0.4/total floor) —
    and the integer-micros sum must equal the Python model exactly
    (the gate fixture's vocabulary is too repetitive to exercise
    tiers 2-3, so this is their correctness pin)."""
    import math

    from cass_cdc_pg_spark.operators import text

    base = spark.createDataFrame(
        [
            (1, "a b a b c"),   # bigrams: ab, ba, ab, bc ; tokens a2 b2 c1
            (2, "a b"),         # bigram ab              ; tokens a1 b1
        ],
        "doc_id long, text string",
    )
    # batch: "a b" seen (c=3); "b a" seen (c=1); "c a" UNSEEN bigram,
    # 'a' seen (c=3); "a z" -> z OOV
    batch = spark.createDataFrame(
        [(10, "a b a"), (11, "c a z")], "doc_id long, text string"
    )
    uni = text.unigram_counts(base)
    bg, pfx = text.bigram_counts(base)
    rows = {
        r["doc_id"]: r
        for r in text.bigram_backoff_logprob(batch, bg, pfx, uni).collect()
    }
    lp = lambda c: int(round(round(math.log10(c), 6) * 1_000_000))
    total = 7  # a:3 b:3 c:1
    # doc 10: "a b"(c_bg=3, c_pfx('a')=3) + "b a"(c_bg=1; 'b' holds
    # the PREFIX position twice in base — (b,a) and (b,c) — so
    # c_pfx('b')=2, the prefix-position count, not the token count)
    exp10 = (lp(3) - lp(3)) + (lp(1) - lp(2))
    assert rows[10]["n_positions"] == 2
    assert rows[10]["n_backoff"] == 0
    assert rows[10]["sum_logprob_micros"] == exp10
    # doc 11: "c a" unseen bigram, 'a' seen c=3 -> tier 2;
    #         "a z" -> 'z' OOV -> tier 3
    exp11 = (text.BACKOFF_MICROS + lp(3) - lp(total)) + (
        text.BACKOFF_MICROS - lp(total)
    )
    assert rows[11]["n_positions"] == 2
    assert rows[11]["n_backoff"] == 2
    assert rows[11]["sum_logprob_micros"] == exp11
    # the mean is the tie-proof half-away integer division
    m = rows[11]["sum_logprob_micros"]
    expected_mean = -((-m * 2 + 2) // 4) / 1_000_000.0
    assert rows[11]["mean_logprob"] == expected_mean


def test_lm_admission_three_tiers_both_signals(spark, tmp_path):
    """docs_lm_admission (r15): a hand-built fixture drives every
    tier through BOTH decision signals — keep (in-distribution,
    mean ~0), flag by the mean band (P = 1/31 lands between the flag
    and drop thresholds), flag by backoff RATE with the mean still in
    the keep band (proves the rate signal acts independently), drop
    by the mean band (P = 1/32 falls just below -1.505), drop with
    saturated backoff, and the unscorable (<2 tokens) doc that is
    flagged, never dropped.  Batch membership is pmod(doc_id,10)=7;
    base ids avoid that residue."""
    from cass_cdc_pg_spark.registry import docs_lm_admission_q

    base_x = "x " + " x ".join(f"a{i}" for i in range(32))  # c_pfx(x)=32
    base_y = "y " + " y ".join(f"b{i}" for i in range(31))  # c_pfx(y)=31
    base_z = "z w z w z w z w z"  # z<->w alternation: every ratio = 1
    rate_flag = " ".join(["z w"] * 25) + " x"  # 50 pos, 1 backoff (2%)
    rows = [
        (1, base_x), (2, base_y), (3, base_z),  # standing base corpus
        (7, "z w"),       # keep: seen bigram, c_bg == c_pfx -> mean 0
        (17, "y b0"),     # flag: mean = -log10(31) = -1.491361
        (27, "x a0"),     # drop: mean = -log10(32) = -1.505150
        (37, rate_flag),  # flag: backoff 1/50 > 1%, mean in keep band
        (57, "q9 q8"),    # drop: 1/1 positions backoff (> 10%)
        (47, "solo"),     # unscorable: 1 token -> flag, admitted
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["doc_id"]: r
        for r in docs_lm_admission_q(spark, str(tmp_path)).collect()
    }
    assert set(got) == {7, 17, 27, 37, 47, 57}  # batch only, no base ids
    assert got[7]["tier"] == "keep" and got[7]["admit"]
    assert got[17]["tier"] == "flag" and got[17]["admit"]
    assert got[27]["tier"] == "drop" and not got[27]["admit"]
    assert got[37]["tier"] == "flag" and got[37]["admit"]
    assert got[37]["n_backoff"] == 1 and got[37]["n_positions"] == 50
    assert got[37]["mean_logprob"] >= -1.49  # keep band: rate alone flags
    assert got[57]["tier"] == "drop" and not got[57]["admit"]
    assert got[57]["n_backoff"] == got[57]["n_positions"] == 1
    assert got[47]["tier"] == "flag" and got[47]["admit"]
    assert got[47]["n_positions"] == 0
    assert got[47]["mean_logprob"] is None


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e", "f"]),
            min_size=0,
            max_size=12,
        ),
        min_size=0,
        max_size=10,
    ),
    st.integers(min_value=0, max_value=10),
)
def test_merge_containment_index_additivity_property(spark, docs, split):
    """merge_containment_index (r15): for ANY corpus and ANY disjoint
    base/batch split — including empty sides and docs too short to
    shingle — merged postings/sizes/df must equal a from-scratch
    rebuild over the union, relation for relation.  The property the
    whole maintenance tier rests on: shingle df is additive across
    disjoint doc sets."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    split = min(split, len(rows))
    df_all = spark.createDataFrame(
        rows or [(0, "")], "doc_id long, text string"
    )
    if not rows:
        df_all = df_all.filter("doc_id < 0")  # genuinely empty corpus
    base = df_all.filter(f"doc_id < {split}")
    batch = df_all.filter(f"doc_id >= {split}")
    p0, s0, d0 = dedup_mod.containment_index_relations(base, n=3)
    mp, ms, md = dedup_mod.merge_containment_index(p0, s0, d0, batch, n=3)
    rp, rs, rd = dedup_mod.containment_index_relations(df_all, n=3)
    for merged, rebuilt in ((mp, rp), (ms, rs), (md, rd)):
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, rebuilt.collect())
        )


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=0,
            max_size=10,
        ),
        min_size=0,
        max_size=9,
    ),
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=0, max_value=9),
)
def test_minhash_day2_composition_property(spark, docs, cut1, cut2):
    """dedup_minhash_day2's composition claim as a property (r16, the
    containment-additivity pattern): for ANY corpus and ANY 3-way
    day0/batch1/batch2 split, the incremental feed of batch 2 against
    merge_band_table(bands(day0), batch1) equals the full-corpus LSH
    pair set restricted to batch-2-involving pairs — pair emission
    depends only on the two signatures, so maintenance-by-append
    composes across days."""
    lo, hi = sorted((min(cut1, len(docs)), min(cut2, len(docs))))
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df_all = spark.createDataFrame(
        rows or [(0, "")], "doc_id long, text string"
    )
    if not rows:
        df_all = df_all.filter("doc_id < 0")
    batch1 = df_all.filter(f"doc_id < {lo}")
    batch2 = df_all.filter(f"doc_id >= {lo} AND doc_id < {hi}")
    day0 = df_all.filter(f"doc_id >= {hi}")
    kw = dict(num_hashes=16, bands=4, n=2)
    merged = dedup_mod.merge_band_table(
        dedup_mod.banded_signatures(day0, **kw), batch1, **kw
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in dedup_mod.incremental_minhash_pairs(
            merged, batch2, threshold=0.0, **kw
        ).collect()
    )
    b2 = set(range(lo, hi))
    want = sorted(
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in dedup_mod.minhash_lsh_pairs(
            df_all, threshold=0.0, **kw
        ).collect()
        if r["doc_a"] in b2 or r["doc_b"] in b2
    )
    assert got == want
