"""Similarity search over the ``embeddings`` table (array<float>).

- ``cosine_topk``: brute-force exact top-k — broadcast the (small)
  query set against the (huge) corpus; per-partition top-k heap via
  ``TakeOrderedAndProject``-style window, no corpus shuffle.
- ``lsh_topk``: random-hyperplane (sign-LSH) bucketed variant — the
  scale path: corpus is pre-bucketed once, probes only touch matching
  buckets, turning O(|Q|·|C|) into O(|Q|·|C|/2^bits) expected.

Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM higher-order
functions, evaluated left-to-right in array order, which keeps results
bit-identical with a left-to-right fold in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def recall_vs_exact(
    exact: DataFrame, approx: DataFrame, k: int
) -> DataFrame:
    """Per-query recall@k of *approx* against the *exact* baseline —
    the shared tail of the four ANN recall gauges (r16: previously
    each of them referenced the exact relation TWICE — once inner-
    joined for hits, once distinct-ed for the zero-hit-preserving
    base — so the brute-force baseline executed two times per run;
    a LEFT join from exact with a non-null hit marker yields the
    identical rows from ONE pass over each side: every exact query
    appears, matches count as hits, zero-hit queries read 0).
    Inputs are (query_id, neighbor_id) relations with unique rows."""
    marked = approx.withColumn("_hit", F.lit(1))
    return (
        exact.join(marked, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("_hit").cast("long").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            (F.col("n_hits") / F.lit(float(k))).alias(f"recall_at_{k}"),
        )
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _np_seq_dot(np, a, b):
    """Row-wise dot product accumulated ONE DIMENSION AT A TIME across
    the whole batch — the exact float64 op sequence of the JVM
    left-to-right fold (and the oracle's ``list_reduce``), just
    vectorized across rows.  Shared by every Arrow kernel so the
    bit-identity discipline lives in one place (a plain ``np.dot``
    uses pairwise/SIMD summation and can differ in the last ulp, which
    6-dp rounding may amplify across a rounding boundary)."""
    acc = np.zeros(a.shape[0])
    for d in range(a.shape[1]):
        acc += a[:, d] * b[:, d]
    return acc


def _scored_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    prune_k: int | None = None,
) -> DataFrame:
    """All (query, corpus) cosine scores via an Arrow-batched numpy
    kernel (``mapInPandas``): the small query matrix ships in the
    closure; the corpus never shuffles.

    Bit-compatibility contract: the JVM path folds the dot product
    left-to-right over array order (``F.aggregate``), as does the
    DuckDB oracle (``list_reduce``).  The kernel reproduces the exact
    same float64 operation sequence — accumulate one dimension at a
    time across the whole batch (``acc += x_d * y_d``) — so scores are
    bit-identical to both, just vectorized across rows instead of
    evaluated per element.  (A plain ``np.dot`` uses pairwise/SIMD
    summation and can differ in the last ulp, which 6-dp rounding may
    amplify across a rounding boundary.)

    *prune_k*: when set, each TASK emits only candidates that can
    still reach a per-query top-*prune_k* after 6-dp rounding, instead
    of all N×Q scores.  Exactness: rounding moves a score by at most
    5e-7, so a row with unrounded sim < (k-th best unrounded) - 1e-6
    rounds strictly below the k-th best's rounded value and can never
    displace it; only such rows are dropped.  Self-matches are excluded
    before picking the k-th value so they never occupy a slot.  The
    per-query candidate pool FOLDS ACROSS BATCHES inside the task
    (r17; previously each Arrow batch emitted its own top-k-reachable
    rows), so the downstream window top-k (a shuffle) ranks
    O(k·Q·partitions) rows rather than O(k·Q·batches) — at 100 TB a
    scan partition holds tens of batches, so this is another order of
    magnitude off the only Exchange in the plan.  Scores are computed
    per batch with the identical float-op sequence; the fold only
    drops rows the per-batch guard provably could never rank.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()  # query side is small by contract
    qids = [r[0] for r in q_rows]
    qm = np.array([list(r[1]) for r in q_rows], dtype=np.float64)  # Q x D

    def seq_dot(a: "np.ndarray", b: "np.ndarray") -> "np.ndarray":
        return _np_seq_dot(np, a, b)

    qnorm = np.sqrt(seq_dot(qm, qm))
    id_type = corpus.schema[id_col].dataType.simpleString()

    def score(batches):
        qid_arr = np.array(qids)
        nq = len(qids)
        # per-query candidate pool across batches: (ids, sims) kept
        # top-k-reachable under the 1e-6 guard — O(k) per query
        pool_n = [None] * nq
        pool_s = [None] * nq
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            cm = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )  # N x D
            cnorm = np.sqrt(seq_dot(cm, cm))
            acc = np.zeros((len(ids), nq))
            for d in range(cm.shape[1]):
                acc += np.outer(cm[:, d], qm[:, d])
            sims = acc / np.outer(cnorm, qnorm)
            n, q = sims.shape
            if prune_k is None:
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(qid_arr, n),
                        "neighbor_id": np.tile(ids, q),
                        "sim": sims.T.reshape(-1),
                    }
                )
                continue
            for j in range(q):
                col = sims[:, j]
                cids = ids
                if pool_n[j] is not None:  # fold the standing pool in
                    cids = np.concatenate([pool_n[j], ids])
                    col = np.concatenate([pool_s[j], col])
                if len(col) > prune_k:
                    cand = col.copy()
                    cand[cids == qid_arr[j]] = -np.inf  # self holds no slot
                    kth = np.partition(cand, -prune_k)[-prune_k]
                    keep = col >= kth - 1e-6
                    cids, col = cids[keep], col[keep]
                pool_n[j], pool_s[j] = cids, col
        if prune_k is not None and any(p is not None for p in pool_n):
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(
                        [
                            np.full(len(pool_n[j]), qid_arr[j])
                            for j in range(nq)
                            if pool_n[j] is not None
                        ]
                    ),
                    "neighbor_id": np.concatenate(
                        [p for p in pool_n if p is not None]
                    ),
                    "sim": np.concatenate(
                        [p for p in pool_s if p is not None]
                    ),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"query_id {id_type}, neighbor_id {id_type}, sim double"
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "arrow",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: query_id, neighbor_id, rank (1-based), sim (6 dp).
    Ties at 6 dp break on neighbor_id ascending (deterministic).

    *kernel*: ``"arrow"`` (default) scores with the vectorized numpy
    kernel — ~10× the JVM higher-order-function path, bit-identical
    results (see ``_scored_arrow``); ``"jvm"`` keeps everything in
    whole-stage codegen (no Python workers) as the cross-check path.
    """
    if kernel == "arrow":
        scored = _scored_arrow(corpus, queries, id_col, vec_col, prune_k=k).filter(
            F.col("neighbor_id") != F.col("query_id")
        ).select(
            "query_id", "neighbor_id", F.round(F.col("sim"), 6).alias("sim")
        )
        return _topk(scored, k)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    return _topk(scored, k)


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def sign_lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit b = 1 iff dot(vec, plane_b) >= 0."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        d = _dot(vec, F.array(*[F.lit(x) for x in plane]))
        bucket = bucket + F.when(d >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket.

    At 100 TB the corpus side is written out partitioned by ``bucket``
    once; each probe prunes to one partition (multi-probe = flip one
    bit per extra bucket).  Recall < 1.0 by construction; the exact
    variant is the correctness baseline.
    """
    planes = _hyperplanes(dim, bits)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def train_ivf_centroids(
    embeddings_path: str, ncentroids: int = 8, iters: int = 4
) -> list[list[float]]:
    """IVF build phase: spherical k-means centroids, fully
    deterministic (init = first *ncentroids* vectors in vec_id order,
    fixed Lloyd iteration count, float64 throughout) so the Spark
    query and the DuckDB oracle can share the exact same centroid
    literals.

    Runs driver-side over a bounded sample — training reads one
    parquet file via pyarrow, never a Spark job; at 100 TB you train
    on a sample exactly like this and only the *assignment* pass is
    distributed."""
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    order = np.argsort(tbl["vec_id"].to_numpy(), kind="stable")
    x = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)[order]
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cent = x[:ncentroids].copy()
    for _ in range(iters):
        cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)
        assign = np.argmax(xn @ cn.T, axis=1)  # ties → lowest cell
        for j in range(ncentroids):
            members = x[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
    return [[float(v) for v in row] for row in cent]


def _seq_sqnorm(vec: list[float]) -> float:
    """Left-to-right float64 sum of squares — the exact op sequence of
    the JVM ``aggregate(zip_with(v, v, x*y), 0, +)`` fold and the
    oracle's ``list_reduce``, evaluated driver-side (Python floats ARE
    IEEE float64, and a sequential ``+=`` is the same add order)."""
    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return acc


def _cell_scores(vec_col: str, centroids: list[list[float]]) -> Column:
    """Array of cosine(vec, centroid_i) — order-pinned fold per
    centroid, identical float sequence to the oracle SQL.

    Built as ONE SQL string parsed in a single driver call: the
    Column-composition equivalent creates ncentroids*dim literal
    nodes through individual Py4J round trips (512 for 8x64), which
    dominates query-build latency on a high-RTT driver.

    r17 tree shrink: the centroid matrix rides in ONE ``from_json``
    string literal (Catalyst constant-folds it to a single complex
    Literal node — verified in the optimized plan — so the analyzer/
    optimizer walk ~20 nodes instead of ~1,500 ncentroids·dim CAST
    nodes on every fresh QueryExecution), the centroid norms are
    precomputed driver-side literals (same left-to-right float64
    fold, so bit-identical to the constant-folded ``SQRT(fold(c,c))``
    they replace), and the ROW norm is bound once via a single-element
    ``transform`` scope instead of re-evaluating its 64-element fold
    once per centroid.  Per-value semantics are unchanged — JSON
    shortest-repr round-trips float64 exactly like ``CAST('<repr>' AS
    DOUBLE)``, and the division/multiplication order is identical —
    verified row-identical against the old formulation and
    oracle-hash-green at both fixtures."""
    import json as _json
    import math as _math

    js = _json.dumps([[float(x) for x in c] for c in centroids])
    norms = ", ".join(
        f"CAST('{_math.sqrt(_seq_sqnorm(c))!r}' AS DOUBLE)" for c in centroids
    )

    def _fold(a: str, b: str) -> str:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> "
            f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )

    body = (
        f"element_at(transform(array(SQRT({_fold(vec_col, vec_col)})), "
        f"vn -> zip_with(from_json('{js}', 'array<array<double>>'), "
        f"array({norms}), "
        f"(ctr, nm) -> {_fold(vec_col, 'ctr')} / (vn * nm))), 1)"
    )
    return F.expr(body)


def _cell_assign(scores: Column) -> Column:
    """``struct(cell, mx)`` — argmax cell (ties → lowest) and the max
    score — with the cell-score ARRAY evaluated exactly once (r17).
    The naive ``array_position(scores, array_max(scores))`` (and the
    ``round(array_max(scores), 6)`` beside it in ``ivf_assign``)
    re-evaluates the whole ncentroids·dim interpreted fold per
    reference — HOF expressions are codegen fallbacks, so there is no
    common-subexpression elimination to save you.  Single-element
    ``transform`` scopes bind the array and its max once; values are
    unchanged."""
    return F.element_at(
        F.transform(
            F.array(scores),
            lambda s: F.element_at(
                F.transform(
                    F.array(F.array_max(s)),
                    lambda m: F.struct(
                        F.array_position(s, m).alias("cell"),
                        m.alias("mx"),
                    ),
                ),
                1,
            ),
        ),
        1,
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus rows are assigned to their
    nearest-centroid cell (argmax cosine, ties → lowest cell); each
    query probes its *nprobe* best cells and ranks candidates there
    exactly.

    Scale path: the assignment is a pure projection (codegen, no
    shuffle) and in a real deployment the corpus is written out
    partitioned by ``cell`` once, so a probe reads nprobe/ncentroids
    of the table — the inverted-file pruning that IVF is for.  The
    probe side is tiny and broadcast.  Recall < 1.0 by construction;
    ``cosine_topk`` is the exact baseline (recall bound pinned by
    test).

    (r17 measured dead end, recorded: computing the probe cells
    driver-side as a literal relation — the ``ivfpq_topk`` shape —
    cut the job count 4→3 but measured consistently SLOWER
    interleaved (1.64 vs 1.28 s best) than this in-plan probe, whose
    tiny query-side stage overlaps the corpus stage under AQE.
    Kept the in-plan probe.)"""
    scores = _cell_scores(f"`{vec_col}`", centroids)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _cell_assign(scores)["cell"].alias("cell"),
    )
    q_cells = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.posexplode(scores).alias("pos", "cs"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cs").desc(), F.col("pos").asc()
                )
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", (F.col("pos") + 1).cast("long").alias("cell"))
    )
    scored = (
        c.join(F.broadcast(q_cells), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    return _topk(scored, k)


def ivf_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign vectors to their nearest EXISTING centroid (argmax
    cosine, ties → lowest cell) without retraining — the index
    maintenance step a daily embedding batch runs against a standing
    IVF index (r9, the ANN sibling of the incremental dedup path:
    the index is materialized state, the batch is a delta).

    Pure constant-folded projection (``_cell_scores`` — the same
    assignment expression ``ivf_topk`` and the cell-stats profile
    use): no shuffle, no Python, embarrassingly parallel at any batch
    size; downstream per-cell rollups decide when assignment quality
    has drifted enough to retrain.  Output: (id, cell, sim) with sim
    rounded to 6 dp so downstream min/max stats are partition-order
    independent and engine-exact."""
    # two projections on purpose: referencing both struct fields in
    # ONE select would re-evaluate the whole fold per field (HOFs are
    # codegen fallbacks — no CSE); CollapseProject keeps the split
    # because the aliased expression is non-cheap and multiply-used
    a = vectors.select(
        F.col(id_col),
        _cell_assign(_cell_scores(f"`{vec_col}`", centroids)).alias("_a"),
    )
    return a.select(
        F.col(id_col),
        F.col("_a")["cell"].alias("cell"),
        F.round(F.col("_a")["mx"], 6).alias("sim"),
    )


def cluster_sample(
    vectors: DataFrame,
    centroids: list[list[float]],
    per_cell: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced diversity sample: assign every vector to its
    nearest standing IVF centroid (:func:`ivf_assign` — the same
    constant-folded projection the probe path uses) and keep the
    *per_cell* most-representative members of each cell (highest
    cosine to centroid, ties → lowest id).  Equal representation per
    cell regardless of cell population is the coverage-sampling step
    of training-data curation — the cheap distributed stand-in for
    k-center selection (every region of embedding space contributes,
    a dominant dense cluster cannot crowd the sample).

    Scale shape: assignment is a shuffle-free codegen projection;
    the ``row_number() <= per_cell`` prune compiles to
    WindowGroupLimit, so every input partition forwards at most
    ``per_cell`` rows PER CELL map-side and the single exchange
    carries O(ncentroids · per_cell · n_partitions) 24-byte rows —
    never the corpus, no matter how hot a cell is.  Ranking orders by
    the 6-dp ROUNDED sim (what :func:`ivf_assign` emits) with id
    tie-break, so the sample is partition-order independent and
    engine-exact."""
    assigned = ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("cell").orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        assigned.withColumn(
            "cell_rank", F.row_number().over(w).cast("int")
        )
        .filter(F.col("cell_rank") <= per_cell)
        .select(id_col, "cell", "sim", "cell_rank")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join."""
    planes = _hyperplanes(dim, bits)
    v = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        sign_lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def semdedup_greedy_survivors(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """EXACT SemDeDup greedy selection over near-dup candidate pairs:
    process ids ascending, keep an id iff no already-KEPT lower id is
    within the threshold.  This is the lexicographically-first maximal
    independent set of the pair graph — the semantics the SemDeDup
    paper's sequential sweep computes (reference behavior analog:
    keep-one-per-duplicate-cluster; cf. the one-pass rule in
    ``registry.embedding_semdedup_keep_q``, which drops ANY id with a
    lower near-dup neighbor and therefore over-drops — a dropped
    vector still kills its own higher-id neighbors there).

    Distributed rounds-bounded fixpoint (same loop discipline as
    ``dedup.connected_components``):

    1. kept_now  = ids that appear only as the LOW side of remaining
       edges (no undecided lower neighbor can drop them)
    2. dropped_now = high sides of edges whose low side was just kept
    3. remaining edges drop every edge touching a decided id —
       crucially including edges OUT of dropped ids, which is exactly
       the correction over the one-pass rule

    Each round is two distinct-aggregations and three anti-joins over
    the shrinking edge set — never the corpus — plus ONE driver action
    (``isEmpty`` on the checkpointed edge set).  Near-dup graphs are
    unions of dense clusters: a clique decides in one round, so rounds
    ≈ the longest id-ordered dependency chain (2-3 in practice).  A
    path graph is the pathological case (n/2 rounds); if ``max_iter``
    is hit, the remaining undecided ids fall back to the conservative
    one-pass rule (over-drop bounded to the unconverged remainder) and
    ``stats["converged"]`` reports False rather than looping forever.

    *pairs* must satisfy ``id_a < id_b`` per row (the shape
    ``embedding_neardup_pairs`` emits).  Returns a one-column ``id``
    DataFrame of survivors drawn from *all_ids* (ids with no pairs at
    all always survive)."""
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dropped = None  # accumulated drop list, unioned per round
    rounds, converged = 0, True
    for _ in range(max_iter):
        if edges.isEmpty():
            break
        rounds += 1
        kept_now = (
            edges.select(F.col("a").alias("id"))
            .distinct()
            .join(
                edges.select(F.col("b").alias("id")).distinct(),
                "id",
                "left_anti",
            )
        )
        dropped_now = (
            edges.join(kept_now, edges["a"] == kept_now["id"])
            .select("b")
            .distinct()
            .localCheckpoint(eager=True)
        )
        edges = (
            edges.join(dropped_now, "b", "left_anti")
            .join(
                dropped_now.select(F.col("b").alias("a")), "a", "left_anti"
            )
            .localCheckpoint(eager=True)
        )
        new_drops = dropped_now.select(F.col("b").alias("id"))
        dropped = new_drops if dropped is None else dropped.unionByName(new_drops)
    else:
        if not edges.isEmpty():
            converged = False
            # conservative fallback for the unconverged remainder:
            # one-pass "any lower undecided neighbor drops you"
            rest = edges.select(F.col("b").alias("id")).distinct()
            dropped = rest if dropped is None else dropped.unionByName(rest)
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    out_col = all_ids.columns[0]
    survivors = all_ids.select(F.col(out_col).alias("id"))
    if dropped is None:
        return survivors
    return survivors.join(dropped.distinct(), "id", "left_anti")


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 vector quantization: per vector, scale =
    max(|x|)/127, q_i = floor(x_i/scale + 0.5) — the standard
    compression step before ANN at scale (4× smaller than float32,
    SIMD-friendly dot products).  ``floor(x + 0.5)`` is used instead
    of ``round`` because engines disagree on half-even vs half-away
    ties; floor+0.5 is bit-deterministic everywhere.

    Emits scalar columns (scale, element sum, digest of the quantized
    array) rather than the array itself so results canonicalize; the
    quantized vectors stay an internal ``select`` away.  Pure column
    algebra per row — codegen, no shuffle, no Python.
    """
    v = F.col(vec_col).cast("array<double>")  # float32 widens exactly
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    with_scale = embeddings.select(
        F.col(id_col).alias("vec_id"), v.alias("v"), scale.alias("scale")
    )
    q = F.when(
        F.col("scale") == 0,
        F.transform(F.col("v"), lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            F.col("v"),
            lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("int"),
        )
    )
    return with_scale.select(
        "vec_id",
        "scale",
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.array_max(q).cast("int").alias("q_max"),
        F.md5(F.concat_ws(",", F.transform(q, lambda x: x.cast("string")))).alias(
            "q_digest"
        ),
    )


def knn_within(
    embeddings: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    kernel: str = "jvm",
) -> DataFrame:
    """Exact k-NN similarity self-join within a coarse partition — the
    intra-cell refinement stage of a quantized ANN pipeline: after a
    coarse assignment (IVF cell, LSH bucket, or a semantic label like
    here), each vector's nearest neighbors are sought only inside its
    own cell.

    ``query_id, neighbor_id, <group_col>, rank, sim`` (sim 6 dp, the
    ANN contract shared with the DuckDB oracle).

    Scale shape: one Exchange on the group key for each join side,
    then the pairwise scores never leave their partition until the
    final per-query top-k (WindowGroupLimit prunes to k rows per
    query *before* that shuffle).  Work is quadratic only within a
    cell — bounded by cell capacity in a real IVF layout (tens of
    thousands), not corpus size; a skewed cell is an AQE skew-join
    split, not a planning failure.  Dot products are the same
    left-to-right ``F.zip_with``/``F.aggregate`` fold as
    ``cosine_topk``, bit-identical with the oracle's ``list_reduce``.

    ``kernel="arrow"``: same answer, computed per cell by the
    ``_scored_arrow`` numpy discipline (dimension-at-a-time float64
    accumulation — the exact op sequence of the JVM fold, so sims are
    bit-identical) inside ``applyInPandas``, emitting only the rows
    that can still reach the top-k after 6-dp rounding (the same
    1e-6 guard as ``cosine_topk``'s pruning); Spark then rounds and
    ranks the tiny candidate set.  ~5× faster than evaluating the
    higher-order fold per pair, and the downstream window shuffles
    O(k·N) instead of O(N²/cells) rows.
    """
    if kernel == "arrow":
        return _knn_within_arrow(embeddings, group_col, id_col, vec_col, k)
    # degenerate-row contract, identical in both kernels: NULL-group
    # rows can never match (the equi-join drops NULL keys anyway),
    # NULL-vector rows are excluded rather than producing null sims,
    # and zero-norm vectors are excluded because cosine is undefined
    # for them (under ANSI mode the division would error, not NaN)
    embeddings = embeddings.filter(
        F.col(group_col).isNotNull()
        & F.col(vec_col).isNotNull()
        & (_dot(F.col(vec_col), F.col(vec_col)) > 0)
    )
    g = F.col(group_col)
    # norms precomputed once per vector, not once per pair: the pair
    # loop then runs ONE array fold (the dot product) instead of
    # three.  sqrt-then-multiply matches cosine()'s op order exactly,
    # so scores stay bit-identical to the per-pair formulation (and
    # the oracle's).
    left = embeddings.select(
        g.alias(group_col),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    right = embeddings.select(
        g.alias(group_col),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        left.join(right, group_col)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            group_col,
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / (F.col("qn") * F.col("cn")),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", group_col, "rank", "sim")
    )


def _knn_within_arrow(
    embeddings: DataFrame,
    group_col: str,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Arrow cell kernel for :func:`knn_within` — see its docstring.
    Emits UNROUNDED candidate sims (top-k-reachable under the 1e-6
    guard, self excluded); the caller-visible rounding and ranking
    stay Spark-side so the result is bit-identical to the JVM path.

    Degenerate-input parity with the JVM path (pinned by test):
    NULL-group, NULL-vector, and zero-norm rows are excluded up front
    in BOTH kernels — cosine is undefined for a zero vector, and
    under ANSI mode the JVM division would error rather than NaN."""
    import numpy as np
    import pandas as pd

    id_type = embeddings.schema[id_col].dataType.simpleString()
    grp_type = embeddings.schema[group_col].dataType.simpleString()

    def cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                columns=[group_col, "query_id", "neighbor_id", "_sim_raw"]
            )
        ids = pdf[id_col].to_numpy()
        grp = pdf[group_col].iloc[0]
        m = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            norm = np.sqrt(_np_seq_dot(np, m, m))
        kk = min(k, n - 1)
        out_q, out_n, out_s = [], [], []
        # Query-column BLOCKS (r7 ADVICE): the full n×n gram matrix is
        # 16·n² bytes inside one Python worker — tens of GB at the
        # documented cell bound.  Accumulating sims[:, j0:j1] a block
        # at a time keeps peak memory O(n·block) while staying
        # dimension-at-a-time in the same d order, so every element
        # sees the identical float-op sequence (bit-identical output).
        block = 512
        for j0 in range(0, n, block):
            j1 = min(j0 + block, n)
            acc = np.zeros((n, j1 - j0))
            for d in range(m.shape[1]):
                acc += np.outer(m[:, d], m[j0:j1, d])
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = acc / np.outer(norm, norm[j0:j1])
            for j in range(j0, j1):
                col = sims[:, j - j0]
                # Spark DESC orders NaN first; mirror that in the
                # numpy top-k by mapping NaN→+inf for selection only
                cmp = np.where(np.isnan(col), np.inf, col)
                cmp[j] = -np.inf  # self never scores or holds a slot
                kth = np.partition(cmp, -kk)[-kk]
                keep = cmp >= kth - 1e-6
                out_q.append(np.full(int(keep.sum()), ids[j]))
                out_n.append(ids[keep])
                out_s.append(col[keep])
        return pd.DataFrame(
            {
                group_col: np.repeat(grp, sum(len(x) for x in out_q)),
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "_sim_raw": np.concatenate(out_s),
            }
        )

    cand = embeddings.select(group_col, id_col, vec_col).filter(
        F.col(group_col).isNotNull()
        & F.col(vec_col).isNotNull()
        & (_dot(F.col(vec_col), F.col(vec_col)) > 0)
    ).groupBy(
        group_col
    ).applyInPandas(
        cell,
        schema=(
            f"{group_col} {grp_type}, query_id {id_type}, "
            f"neighbor_id {id_type}, _sim_raw double"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("sim", F.round(F.col("_sim_raw"), 6))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", group_col, "rank", "sim")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory/IO lever for 100 TB embedding
# search: each dim-D float32 vector (4·D bytes) compresses to m code
# bytes (one nearest-sub-centroid id per subspace), and top-k runs as
# asymmetric distance computation (ADC) over the CODES — the full
# vectors are never read at query time.  At dim=64, m=8 that is 32×
# less data scanned per query than the exact path; PQ composes with
# IVF (encode only the probed cells) exactly like FAISS's IVFPQ.
# Training is driver-side over a bounded sample (same posture as
# train_ivf_centroids); encode is a vectorized Arrow kernel by default
# (the constant-folded JVM expression is the bit-identical cross-check
# — at ksub=256 its m·ksub=4096-fold tree costs ~18 s of analysis and
# a 27 MiB task binary, measured r11, so it is never the bulk path);
# ADC ships only (id, codes) across the Arrow boundary.
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    embeddings_path: str, m: int = 8, ksub: int = 16, iters: int = 4
) -> list[list[list[float]]]:
    """PQ build phase: per subspace j, k-means (squared L2) over the
    j-th vector slice — fully deterministic (init = first *ksub*
    subvectors in vec_id order, fixed Lloyd iteration count, float64
    throughout, ties → lowest code) so the Spark encode expression and
    the DuckDB oracle share the exact same centroid literals.

    Driver-side over one parquet file via pyarrow, never a Spark job —
    at 100 TB you train on a sample exactly like this and only the
    encode pass is distributed."""
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    order = np.argsort(tbl["vec_id"].to_numpy(), kind="stable")
    x = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)[order]
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cent = xs[:ksub].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # ties → lowest code
            for c in range(ksub):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append([[float(v) for v in row] for row in cent])
    return books


def _pq_dist_exprs(vec_col: str, codebooks: list[list[list[float]]]) -> list[str]:
    """Per-subspace SQL expression: array of squared-L2 distances from
    the row's j-th vector slice to each of that subspace's *ksub*
    centroid literals.  One SQL string per subspace (single driver
    parse — same Py4J-storm avoidance as ``_cell_scores``).

    The fold is the left-to-right ``aggregate(zip_with(...))`` sum,
    the shared bit-identity discipline of this module.  (Measured
    dead end, r10: expanding the fold to explicit ``(e[i]-c)*(e[i]-c)
    + …`` arithmetic to reach whole-stage codegen blows janino's
    64 KB method limit at m·ksub·sub = 1024 terms — codegen FAILS and
    the stage runs fully interpreted, 4× slower than the HOF path.
    The fast path for bulk encode is the Arrow kernel in
    ``pq_encode``; this expression is its JVM cross-check and the
    query-time path for ``ivfpq_topk``.)"""

    def _dlit(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    def _fold(a: str, b: str) -> str:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> "
            f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
            f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )

    sub = len(codebooks[0][0])
    exprs = []
    for j, book in enumerate(codebooks):
        sl = f"slice({vec_col}, {j * sub + 1}, {sub})"
        ds = ", ".join(
            _fold(sl, f"array({', '.join(_dlit(float(x)) for x in c)})")
            for c in book
        )
        exprs.append(f"array({ds})")
    return exprs


def _pq_codes_np(np, x, cent):
    """Vectorized PQ encode of an (N, dim) float64 block against
    (m, ksub, sub) codebooks: per-dimension accumulation (the module's
    fold discipline, bit-identical to the JVM/DuckDB left-to-right
    folds), ``np.argmin`` ties → lowest code.  Shared by the bulk
    ``pq_encode`` kernel and the ``ivfpq_index`` build pass."""
    m, ksub, sub = cent.shape
    codes = np.zeros((len(x), m), dtype=np.int32)
    for j in range(m):
        d = np.zeros((len(x), ksub))
        for dd in range(sub):  # per-dim accumulation = fold
            diff = x[:, j * sub + dd, None] - cent[None, j, :, dd]
            d += diff * diff
        codes[:, j] = np.argmin(d, axis=1)  # ties → lowest code
    return codes


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "arrow",
) -> DataFrame:
    """Encode vectors to PQ codes: (id, codes array<int>), one nearest
    sub-centroid per subspace, argmin ties → lowest code.  This is the
    pass a daily embedding batch runs against standing codebooks,
    emitting m small ints per row (the 16× compression a deployment
    PERSISTS; queries then read codes, never vectors).

    *kernel*: ``"arrow"`` (default) computes distances in a vectorized
    numpy kernel — Spark interprets higher-order-function lambdas
    per element, so the expression path is ~4× slower on bulk encode;
    bit-identical results (per-dimension accumulation, the module's
    fold discipline; ``np.argmin`` ties → lowest code like
    ``array_position``-of-min).  ``"jvm"`` keeps the constant-folded
    expression (no Python workers) as the cross-check path and the
    in-plan variant ``ivfpq_topk`` composes with."""
    if kernel == "jvm":
        exprs = _pq_dist_exprs(f"`{vec_col}`", codebooks)
        codes = ", ".join(
            f"CAST(array_position({e}, array_min({e})) - 1 AS INT)"
            for e in exprs
        )
        return vectors.select(
            F.col(id_col), F.expr(f"array({codes})").alias("codes")
        )

    import numpy as np
    import pandas as pd

    cent = np.array(codebooks, dtype=np.float64)  # m x ksub x sub
    id_type = vectors.schema[id_col].dataType.simpleString()

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = _pq_codes_np(np, x, cent)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes.tolist())}
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        enc, schema=f"{id_col} {id_type}, codes array<int>"
    )


def _pq_query_tables(np, queries_rows, codebooks):
    """(qids, qtab[q][j][c]) — per-query ADC lookup tables in float64,
    accumulated ONE DIMENSION AT A TIME (``acc += (q_d - c_d)**2``) so
    every entry is bit-identical to the JVM/DuckDB left-to-right fold
    over the same centroid literals."""
    qids = [r[0] for r in queries_rows]
    qm = np.array([list(r[1]) for r in queries_rows], dtype=np.float64)
    m = len(codebooks)
    ksub = len(codebooks[0])
    sub = len(codebooks[0][0])
    cent = np.array(codebooks, dtype=np.float64)  # m x ksub x sub
    qtab = np.zeros((len(qids), m, ksub))
    for j in range(m):
        qs = qm[:, j * sub : (j + 1) * sub]  # Q x sub
        for d in range(sub):
            diff = qs[:, d, None] - cent[None, j, :, d]
            qtab[:, j, :] += diff * diff
    return qids, qtab


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ-ADC approximate top-k (squared-L2 metric, smaller = closer):
    corpus rows are their codes; each query's distance to a row is the
    left-to-right sum over subspaces of its precomputed lookup-table
    entry for that row's code.

    Scale shape: encode is the vectorized Arrow kernel (`pq_encode`
    default; the JVM expression is its cross-check), and the ADC
    kernel receives ONLY (id, codes) — m ints per row, never the
    vectors —
    and per-task keep-min pruning (folded across batches, r17) keeps
    the downstream top-k shuffle at O(k·Q·partitions).  Exactness of
    the prune: 6-dp rounding moves a
    distance by at most 5e-7, so a row with unrounded dist > (k-th
    best unrounded) + 1e-6 rounds strictly above the k-th best's
    rounded value and can never displace it.  Output: query_id,
    neighbor_id, rank, dist (6 dp; ties → neighbor_id asc).

    *codes*: optional precomputed (id_col, codes) relation — e.g. the
    PERSISTED IVF×PQ index's (neighbor_id, codes) projection.  When
    given, the per-call ``pq_encode`` pass is skipped entirely and the
    ADC kernel reads the stored codes; codes MUST have been produced
    by the same *codebooks* (codes are a pure function of the trained
    literals, so stored == re-encoded by construction)."""
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()  # small by contract
    qids, qtab = _pq_query_tables(np, q_rows, codebooks)
    qid_arr = np.array(qids)
    m = len(codebooks)
    id_type = corpus.schema[id_col].dataType.simpleString()
    codes_df = (
        codes.select(id_col, "codes")
        if codes is not None
        else pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)
    )

    def score(batches):
        # per-query keep-min candidate pool folded ACROSS batches
        # (r17, the _scored_arrow discipline): the task emits one
        # top-k-reachable set, so the ranking Exchange sees
        # O(k·Q·partitions) rows, not O(k·Q·batches)
        nq = len(qids)
        pool_n = [None] * nq
        pool_s = [None] * nq
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            cm = np.array([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            acc = np.zeros((len(ids), nq))
            for j in range(m):  # left-to-right over subspaces
                acc += qtab[:, j, :][:, cm[:, j]].T
            for qi in range(nq):
                col = acc[:, qi]
                cids = ids
                if pool_n[qi] is not None:
                    cids = np.concatenate([pool_n[qi], ids])
                    col = np.concatenate([pool_s[qi], col])
                if len(col) > k:
                    cand = col.copy()
                    cand[cids == qid_arr[qi]] = np.inf  # self holds no slot
                    kth = np.partition(cand, k - 1)[k - 1]
                    keep = col <= kth + 1e-6
                    cids, col = cids[keep], col[keep]
                pool_n[qi], pool_s[qi] = cids, col
        if any(p is not None for p in pool_n):
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(
                        [
                            np.full(len(pool_n[qi]), qid_arr[qi])
                            for qi in range(nq)
                            if pool_n[qi] is not None
                        ]
                    ),
                    "neighbor_id": np.concatenate(
                        [p for p in pool_n if p is not None]
                    ),
                    "dist": np.concatenate(
                        [p for p in pool_s if p is not None]
                    ),
                }
            )

    scored = (
        codes_df.mapInPandas(
            score,
            schema=f"query_id {id_type}, neighbor_id {id_type}, dist double",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(F.col("dist"), 6).alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist")
    )


def l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by squared L2 (the metric PQ approximates — its
    recall baseline, as ``cosine_topk`` is for IVF/LSH).  Same Arrow
    kernel discipline as ``_scored_arrow``: per-dimension accumulation
    matches the left-to-right fold bit-for-bit, the query matrix ships
    in the closure (corpus never shuffles), per-task keep-min pruning
    folded across batches bounds the top-k shuffle at
    O(k·Q·partitions) (same 1e-6 guard band as ``pq_topk``)."""
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()  # small by contract
    qids = [r[0] for r in q_rows]
    qm = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    qid_arr = np.array(qids)
    id_type = corpus.schema[id_col].dataType.simpleString()

    def score(batches):
        # keep-min pool folded across batches (r17 — see pq_topk)
        nq = len(qids)
        pool_n = [None] * nq
        pool_s = [None] * nq
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            cm = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            acc = np.zeros((len(ids), nq))
            for d in range(cm.shape[1]):  # left-to-right over dims
                diff = cm[:, d, None] - qm[None, :, d]
                acc += diff * diff
            for qi in range(nq):
                col = acc[:, qi]
                cids = ids
                if pool_n[qi] is not None:
                    cids = np.concatenate([pool_n[qi], ids])
                    col = np.concatenate([pool_s[qi], col])
                if len(col) > k:
                    cand = col.copy()
                    cand[cids == qid_arr[qi]] = np.inf
                    kth = np.partition(cand, k - 1)[k - 1]
                    keep = col <= kth + 1e-6
                    cids, col = cids[keep], col[keep]
                pool_n[qi], pool_s[qi] = cids, col
        if any(p is not None for p in pool_n):
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(
                        [
                            np.full(len(pool_n[qi]), qid_arr[qi])
                            for qi in range(nq)
                            if pool_n[qi] is not None
                        ]
                    ),
                    "neighbor_id": np.concatenate(
                        [p for p in pool_n if p is not None]
                    ),
                    "dist": np.concatenate(
                        [p for p in pool_s if p is not None]
                    ),
                }
            )

    scored = (
        corpus.select(id_col, vec_col)
        .mapInPandas(
            score,
            schema=f"query_id {id_type}, neighbor_id {id_type}, dist double",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(F.col("dist"), 6).alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist")
    )


def pq_refine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Two-stage retrieval (the FAISS search-then-refine pattern): the
    ADC pass over CODES produces a *shortlist* of candidates per query,
    and only those ≤ Q·shortlist rows are re-ranked by EXACT squared
    L2 on the full vectors — the standard production shape where the
    compressed index bounds how many real vectors a query ever touches
    (at shortlist=50 a query reads 50 vectors out of the corpus, at
    any corpus size).

    Scale shape: the shortlist (tiny by construction) BROADCASTS back
    against the corpus for the vector fetch — the corpus is scanned
    once and never shuffled; the query vectors broadcast as a literal
    relation; the exact distance is the module's left-to-right JVM
    fold (bit-identical to ``_L2DIST_SQL``); only the ≤ Q·shortlist
    scored rows reach the ranking Exchange."""
    # the shortlist bounds the candidate pool, so shortlist < k would
    # silently return fewer than k rows per query (r11 advice)
    shortlist = max(shortlist, k)
    sl = pq_topk(
        corpus, queries, codebooks, k=shortlist,
        id_col=id_col, vec_col=vec_col, codes=codes,
    ).select("query_id", "neighbor_id")
    nvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    l2 = (
        "aggregate(zip_with(_qv, _nv, (x, y) -> "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        nvec.join(F.broadcast(sl), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id", "neighbor_id", F.round(F.expr(l2), 6).alias("dist")
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist")
    )


def ivfpq_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the IVF×PQ index relation (the FAISS ``IVFPQ`` layout):
    (neighbor_id, cell, codes) — each row's IVF cell (inverted-file
    pruning key) and PQ codes (compressed ranking payload).  This is
    the artifact a deployment PERSISTS, partitioned by cell, once per
    corpus snapshot; queries read it instead of the vectors.  One
    pass, no shuffle: cell assignment is the constant-folded JVM
    cosine expression (ncentroids terms — small), codes come from the
    vectorized Arrow kernel (`_pq_codes_np`, bit-identical to the JVM
    expression per the kernels pin) because at ksub=256 the folded
    encode tree is m·ksub=4096 expressions — ~18 s of analysis and a
    27 MiB task binary (measured r11) for a pass that is pure batch
    math.  Build cost is paid once per snapshot either way."""
    import numpy as np
    import pandas as pd

    scores = _cell_scores(f"`{vec_col}`", centroids)
    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _cell_assign(scores)["cell"].alias("cell"),
        F.col(vec_col),
    )
    cent = np.array(codebooks, dtype=np.float64)  # m x ksub x sub
    id_type = corpus.schema[id_col].dataType.simpleString()

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = _pq_codes_np(np, x, cent)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"],
                    "cell": pdf["cell"],
                    "codes": list(codes.tolist()),
                }
            )

    return assigned.mapInPandas(
        enc,
        schema=f"neighbor_id {id_type}, cell bigint, codes array<int>",
    )


def ivfpq_append(
    index: DataFrame,
    new_batch: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental IVF×PQ index maintenance (the FAISS ``add`` on a
    trained index): cell-assign + PQ-encode ONLY the new batch against
    the STANDING centroids/codebooks and append the delta to the
    persisted index relation — the daily-embedding-batch operation a
    deployment actually runs, completing the incremental symmetry with
    the dedup standing index (delta admission) and ``ivf_assign``.

    Scale shape: the standing index is READ (a pruned parquet scan of
    (neighbor_id, cell, codes) — m ints per row, never vectors) and
    never recomputed or shuffled; the delta pass is the same one-pass
    no-shuffle constant-folded cell assignment + Arrow-kernel encode
    as the snapshot build, over the batch alone.  Work per day is
    O(|new batch|), not O(|corpus|).

    Parity contract (the oracle): cell assignment and codes depend
    only on the TRAINED literals, never on corpus membership, so
    ``append(index(base), new) == index(base ∪ new)`` row-for-row —
    the ``dedup_incremental_components`` precedent."""
    delta = ivfpq_index(
        new_batch, centroids, codebooks, id_col=id_col, vec_col=vec_col
    )
    # explicit LONG on both sides: a standing index materialized as
    # cell-partitioned parquet comes back with 'cell' as INT (partition
    # -column inference) while the fresh delta carries LONG
    # (array_position); relying on implicit set-op widening makes the
    # union schema depend on HOW the index was stored (r12 advice)
    cast_cell = lambda df: df.withColumn(  # noqa: E731
        "cell", F.col("cell").cast("long")
    )
    return cast_cell(
        index.select("neighbor_id", "cell", "codes")
    ).unionByName(cast_cell(delta))


def ivfpq_topk(
    index: DataFrame,
    spark,
    queries_rows: list,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 2,
    prune_cells: bool = True,
) -> DataFrame:
    """IVF×PQ probe over a prebuilt :func:`ivfpq_index` relation —
    the production ANN query shape at 100 TB: a query probes its
    *nprobe* best cells and ranks ONLY those candidates by ADC over
    the stored codes; vectors are never read at query time.

    Entirely JVM: the query side is a tiny literal relation carrying
    each query's precomputed ADC lookup table (``qtab``), the cell
    join is a broadcast hash join (reading nprobe/ncentroids of a
    cell-partitioned index), and the distance is a left-to-right
    ``aggregate(zip_with(codes, qtab, ...))`` of m table lookups —
    no Python stage anywhere.

    *queries_rows* is the collected (id, vector) list (small by
    contract); probe cells and qtab are computed driver-side with the
    module's per-dimension float64 accumulation, bit-identical to the
    JVM and DuckDB folds over the same literals."""
    import numpy as np

    cent = np.array(centroids, dtype=np.float64)  # nc x dim
    qids, qtab = _pq_query_tables(np, queries_rows, codebooks)
    qm = np.array([list(r[1]) for r in queries_rows], dtype=np.float64)
    # probe cells: cosine to each centroid with seq-dot accumulation
    qdot = np.zeros((len(qids), len(cent)))
    for d in range(qm.shape[1]):
        qdot += np.outer(qm[:, d], cent[:, d])
    qn = np.sqrt(_np_seq_dot(np, qm, qm))
    cn = np.sqrt(_np_seq_dot(np, cent, cent))
    qcos = qdot / np.outer(qn, cn)
    probe_rows = []
    for qi, qid in enumerate(qids):
        # ties → lowest cell: sort on (-cos, cell)
        order = sorted(range(len(cent)), key=lambda c: (-qcos[qi, c], c))
        for cell in order[:nprobe]:
            probe_rows.append(
                (qid, cell + 1, [[float(v) for v in row] for row in qtab[qi]])
            )
    q_df = spark.createDataFrame(
        probe_rows,
        "query_id long, cell long, qtab array<array<double>>",
    )
    if prune_cells:
        # the probed cell set is known driver-side, so make the
        # partition pruning EXPLICIT (r16): an isin literal filter on
        # a cell-partitioned index becomes a parquet PartitionFilter
        # (nprobe/ncentroids of the files are LISTED, not just
        # join-filtered) instead of leaning on runtime DPP; join
        # output is unchanged — the broadcast join on cell restricts
        # to these cells anyway.
        probe_cells = sorted({c for (_qid, c, _t) in probe_rows})
        index = index.filter(F.col("cell").isin(probe_cells))

    adc = (
        "aggregate(zip_with(codes, qtab, (c, t) -> element_at(t, c + 1)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    scored = (
        index.join(F.broadcast(q_df), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.expr(adc), 6).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist")
    )
