"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline surface: token counting, quality
scoring, language ID, document fingerprinting.  All expressions are
JVM-side builtins (split / array ops / md5) so they stay inside
whole-stage codegen; nothing here is a Python UDF.

Portability: every function has a DuckDB-SQL twin in the oracle
registry; canonical tokenization is ``split on single space`` (the
synthetic corpus is single-space separated) with empty tokens
dropped, so both engines agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language marker lexicons for the n-gram/stopword heuristic
#: language-ID.  Deterministic and reproducible in plain SQL.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "y"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "de", "et"),
    "zh": ("de5", "shi4", "le5", "he2"),  # pinyin-ish placeholders
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: Column) -> Column:
    """Whitespace tokens with empties removed."""
    return F.filter(F.split(col, " "), lambda t: t != F.lit(""))


#: GPT-2-style pre-tokenizer, lookahead-free so the same pattern runs
#: under Java regex (Spark) and RE2 (DuckDB oracle) with identical
#: leftmost-first alternation: an optional leading space glued to a
#: letter-run, digit-run, or punctuation-run; residual whitespace runs
#: count as their own token (BPE treats them as bytes too).
BPE_ISH_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"


def bpe_token_count(documents: DataFrame) -> DataFrame:
    """doc_id, n_bpe_tokens: pre-tokenizer match count — the standard
    cheap proxy for LLM token cost (actual BPE merges only split
    *within* these matches, so this lower-bounds and tracks the real
    token count).  Pure ``regexp_count`` — whole-stage codegen, no
    shuffle, trivially data-parallel at 100 TB."""
    return documents.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(BPE_ISH_RE)).alias("n_bpe_tokens"),
    )


def token_stats(documents: DataFrame) -> DataFrame:
    """doc_id, n_tokens, n_unique, avg_token_len (4 dp)."""
    toks = tokens(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.round(
            F.aggregate(
                toks, F.lit(0), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """doc_id, n_chars, stopword_ratio, unique_ratio, quality_bucket.

    The length/stopword/uniqueness heuristics of C4-style corpus
    filtering, as pure column expressions.
    """
    toks = tokens(F.col("text"))
    n = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    uniq = F.size(F.array_distinct(toks))
    stop_ratio = F.round(stop_hits.cast("double") / n, 4)
    uniq_ratio = F.round(uniq.cast("double") / n, 4)
    bucket = (
        F.when(n < 20, F.lit("too_short"))
        .when(uniq_ratio < 0.3, F.lit("repetitive"))
        .otherwise(F.lit("ok"))
    )
    return documents.select(
        "doc_id",
        F.col("n_chars"),
        stop_ratio.alias("stopword_ratio"),
        uniq_ratio.alias("unique_ratio"),
        bucket.alias("quality_bucket"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """doc_id, fp = md5 of the sorted distinct token set.

    Content-defined fingerprint: word-order-insensitive, so texts that
    are permutations of the same vocabulary collide — the cheap first
    stage of near-dup detection.
    """
    toks = tokens(F.col("text"))
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return documents.select("doc_id", F.md5(canon).alias("fp"))


def winnow_fingerprints(
    documents: DataFrame, k: int = 5, window: int = 4
) -> DataFrame:
    """doc_id, n_fps, fp_digest — winnowing fingerprints (the
    rolling-hash document-fingerprint scheme): hash every character
    *k*-gram, slide a *window* over the hash sequence, keep each
    window's minimum; the distinct minima are the document's
    fingerprint set, digested to one md5.

    Winnowing guarantees any shared substring of length
    ``k + window - 1`` contributes a shared fingerprint, so plagiarism
    /near-dup overlap survives sampling.  The classic Rabin-Karp
    *rolling* update is a single-scan micro-optimization; in a column
    engine every gram hashes independently inside one higher-order
    ``transform`` (codegen, no shuffle, no Python) — same output, data
    parallel.  Short docs degrade gracefully: fewer grams than the
    window → one global minimum; shorter than *k* → empty set.
    """
    n_grams = F.length(F.col("text")) - F.lit(k) + 1
    grams = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.md5(F.col("text").substr(i, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    with_grams = documents.select("doc_id", grams.alias("grams"))
    g = F.size(F.col("grams"))
    mins = (
        F.when(
            g >= window,
            F.transform(
                F.sequence(F.lit(1), g - F.lit(window) + 1),
                lambda j: F.array_min(F.slice(F.col("grams"), j, window)),
            ),
        )
        .when(g >= 1, F.array(F.array_min(F.col("grams"))))
        .otherwise(F.array().cast("array<string>"))
    )
    fps = F.array_sort(F.array_distinct(mins))
    return with_grams.select(
        "doc_id",
        F.size(fps).alias("n_fps"),
        F.md5(F.concat_ws("", fps)).alias("fp_digest"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """doc_id, declared lang, predicted lang by marker-word hits.

    Scoring: count of marker-lexicon hits per language over the
    distinct token set; ties broken by language code ascending —
    fully deterministic.
    """
    toks = F.array_distinct(tokens(F.col("text")))

    def _hits(markers: tuple[str, ...]):
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = [
        F.struct(
            _hits(ws).alias("hits"),
            # negate the lexicographic rank so greatest() favors the
            # alphabetically-first language on tied hit counts
            F.lit(-i).alias("rank"),
            F.lit(lang).alias("lang"),
        )
        for i, (lang, ws) in enumerate(sorted(LANG_MARKERS.items()))
    ]
    best = F.greatest(*scores)
    return documents.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        best["lang"].alias("predicted_lang"),
    )


def length_histogram(documents: DataFrame) -> DataFrame:
    """Corpus length distribution: docs bucketed by floor(log2(token
    count)) — the standard training-data length histogram (mix design,
    truncation budgeting).

    The bucket is computed INTEGER-exact as bit_length(n)-1 (binary
    string length), never via float ``log2`` — ``log(n)/log(2)`` lands
    below the integer at exact powers of two on some engines, which
    would put boundary docs in the wrong bucket nondeterministically.
    One scan + one tiny aggregate; trivially parallel at 100 TB.
    """
    n = F.size(tokens(F.col("text")))
    bucket = (
        F.when(n <= 0, F.lit(-1))
        .otherwise(F.length(F.conv(n.cast("string"), 10, 2)) - 1)
        .cast("int")
    )
    return (
        documents.select(bucket.alias("log2_bucket"), n.alias("n"))
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("total_tokens"),
            F.min("n").cast("long").alias("min_tokens"),
            F.max("n").cast("long").alias("max_tokens"),
        )
    )
