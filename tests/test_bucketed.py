"""plans/bucketed.py: write-side bucketing must actually remove the
Exchange (and, with sortBy, the Sort) from joins and aggregations on
the bucket key — the whole point of paying the write-time shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cass_cdc_pg_spark.plans.bucketed import (
    colocated_join,
    is_bucketed,
    save_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    facts = spark.range(5000).selectExpr(
        "id % 500 AS k", "id AS v", "CAST(id AS DOUBLE) AS amount"
    )
    dims = spark.range(500).selectExpr("id AS k", "concat('n', id) AS name")
    save_bucketed(
        facts, "t_facts", "k", 8, path=str(tmp_path / "facts"), sorted_by="k"
    )
    save_bucketed(
        dims, "t_dims", "k", 8, path=str(tmp_path / "dims"), sorted_by="k"
    )
    yield "t_facts", "t_dims"
    spark.sql("DROP TABLE IF EXISTS t_facts")
    spark.sql("DROP TABLE IF EXISTS t_dims")


def test_colocated_join_has_no_exchange(spark, bucketed_pair):
    """Same-bucketed sides joined on the bucket key: the SMJ's
    children are the bucketed scans with ZERO Exchange — no network
    movement of either side.  (The partition-local Sorts remain:
    since Spark 3.0 the scan doesn't advertise the sortBy ordering
    unless `spark.sql.legacy.bucketedTableScan.outputOrdering` is on
    — they're CPU-only, no shuffle.)"""
    lt, rt = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, lt, rt, "k")
        plan = _plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        got = j.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == 5000


def test_one_file_per_bucket(spark, bucketed_pair, tmp_path):
    """save_bucketed's pre-repartition keeps the layout to exactly one
    data file per bucket — no tasks×buckets small-file explosion."""
    import glob

    files = glob.glob(str(tmp_path / "facts" / "*.parquet"))
    assert len(files) == 8, files


def test_bucketed_aggregation_skips_exchange(spark, bucketed_pair):
    """groupBy on the bucket key reuses the write-time partitioning:
    the aggregate runs in one phase directly on the scan, no
    Exchange."""
    lt, _ = bucketed_pair
    agg = spark.table(lt).groupBy("k").agg(F.sum("v").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 500


def test_join_off_bucket_key_still_shuffles(spark, bucketed_pair):
    """Negative control: joining on a NON-bucket column must plan its
    Exchanges as usual — proves the elision above is the bucket
    metadata, not something about the fixture."""
    lt, _ = bucketed_pair
    other = spark.range(500).selectExpr("id AS v2", "id AS z")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(lt).join(other, F.col("v") == F.col("v2"))
        plan = _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" in plan, plan


def test_colocated_join_refuses_unbucketed_side(spark, bucketed_pair, tmp_path):
    """The layout contract is checked up front: an unbucketed side
    raises instead of silently re-shuffling."""
    lt, _ = bucketed_pair
    spark.range(10).selectExpr("id AS k", "id AS w").write.mode(
        "overwrite"
    ).option("path", str(tmp_path / "plain")).saveAsTable("t_plain")
    try:
        assert is_bucketed(spark, lt)
        assert not is_bucketed(spark, "t_plain")
        with pytest.raises(ValueError, match="not a bucketed table"):
            colocated_join(spark, lt, "t_plain", "k")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_plain")


def test_bucketed_files_are_plain_parquet(spark, bucketed_pair, tmp_path):
    """The data files stay readable as plain parquet by a reader with
    no catalog — bucketing is metadata, not a format fork."""
    df = spark.read.parquet(str(tmp_path / "facts"))
    assert df.count() == 5000
    assert set(df.columns) == {"k", "v", "amount"}


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """save_partitioned: an equality filter on the partition column
    appears as a PartitionFilter (directory pruning — zero I/O for
    non-matching partitions), NOT merely a PushedFilter, and only the
    matching partition's rows are read."""
    from cass_cdc_pg_spark.plans.bucketed import save_partitioned

    df = spark.range(1000).selectExpr(
        "id", "CAST(id % 10 AS INT) AS day", "id * 2 AS v"
    )
    p = str(tmp_path / "part")
    save_partitioned(df, p, ["day"])

    q = spark.read.parquet(p).filter(F.col("day") == 3).select("id", "v")
    plan = _plan(q)
    assert "PartitionFilters: [isnotnull(day" in plan or "PartitionFilters: [(day" in plan, plan
    assert q.count() == 100
    # the layout really is one directory per day value
    import os

    assert sorted(
        d for d in os.listdir(p) if d.startswith("day=")
    ) == [f"day={i}" for i in range(10)]


def test_colocated_join_refuses_mismatched_bucket_count(spark, bucketed_pair, tmp_path):
    """Same column but DIFFERENT bucket counts: Spark would silently
    re-shuffle one side — the guard must catch it, not just
    'is bucketed at all'."""
    lt, _ = bucketed_pair
    from cass_cdc_pg_spark.plans.bucketed import save_bucketed

    other = spark.range(100).selectExpr("id AS k", "id AS w")
    save_bucketed(other, "t_b16", "k", 16, path=str(tmp_path / "b16"))
    try:
        with pytest.raises(ValueError, match="bucket layouts differ"):
            colocated_join(spark, lt, "t_b16", "k")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_b16")


def test_colocated_join_refuses_mismatched_bucket_column(spark, bucketed_pair, tmp_path):
    lt, _ = bucketed_pair
    from cass_cdc_pg_spark.plans.bucketed import save_bucketed

    other = spark.range(100).selectExpr("id AS k", "id AS w")
    save_bucketed(other, "t_colw", "w", 8, path=str(tmp_path / "colw"))
    try:
        with pytest.raises(ValueError, match="bucket layouts differ"):
            colocated_join(spark, lt, "t_colw", "k")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_colw")


def test_colocated_join_refuses_join_key_off_bucket_column(spark, bucketed_pair):
    """Both sides identically bucketed on k, but the requested join is
    on a non-bucket column: the layout can't satisfy the join's
    distribution, so the guard raises instead of shuffling."""
    lt, rt = bucketed_pair
    with pytest.raises(ValueError, match="do not cover bucket columns"):
        colocated_join(spark, lt, rt, "v")


def test_bucket_spec_reads_catalog(spark, bucketed_pair):
    from cass_cdc_pg_spark.plans.bucketed import bucket_spec

    lt, rt = bucketed_pair
    assert bucket_spec(spark, lt) == (8, ("k",))
    assert bucket_spec(spark, rt) == (8, ("k",))


def test_zorder_prunes_files_on_both_dims(spark, tmp_path):
    """save_zordered: with footer stats as the measure (wall-clock at
    toy SF is session floor), a z-ordered layout must prune files for
    range predicates on EITHER clustered column, where a linear sort
    prunes only its own sort column; both layouts return identical
    rows."""
    from cass_cdc_pg_spark.plans.bucketed import candidate_files, save_zordered

    df = spark.range(200_000).selectExpr(
        "id", "id % 1000 AS a", "(id * 7919) % 1000 AS b"
    )
    lin = str(tmp_path / "linear")
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.parquet(lin)
    )
    zo = str(tmp_path / "zordered")
    save_zordered(df, zo, ["a", "b"], n_files=16)

    # linear layout: the b-filter must open every file
    lin_b, lin_total = candidate_files(lin, "b", 100, 160)
    assert lin_total == 16 and lin_b == 16, (lin_b, lin_total)
    # z-order: BOTH dims prune to at most half the files
    zo_a, zo_total = candidate_files(zo, "a", 100, 160)
    zo_b, _ = candidate_files(zo, "b", 100, 160)
    assert zo_total == 16
    assert zo_a <= 8, zo_a
    assert zo_b <= 8, zo_b
    # and the linear layout still prunes its own sort column
    lin_a, _ = candidate_files(lin, "a", 100, 160)
    assert lin_a <= 3, lin_a

    # layouts are a physical property only: identical answers
    for pred in ("b BETWEEN 100 AND 160", "a BETWEEN 100 AND 160"):
        n_lin = spark.read.parquet(lin).where(pred).count()
        n_zo = spark.read.parquet(zo).where(pred).count()
        assert n_lin == n_zo, (pred, n_lin, n_zo)


def test_zorder_value_interleaves_and_clamps(spark):
    """zorder_value: bit interleave is exact on known points, and
    out-of-range values clamp to the edge cell instead of wrapping."""
    from pyspark.sql import functions as F

    from cass_cdc_pg_spark.plans.bucketed import zorder_value

    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (99, -5)], "x int, y int"
    )
    z = zorder_value(["x", "y"], [0, 0], [3, 3], bits=2)
    got = [r[0] for r in df.select(z).collect()]
    # 2-bit interleave: x bits land at even positions, y at odd
    assert got[0] == 0          # (00, 00)
    assert got[1] == 0b0101     # x=11 -> bits 0 and 2
    assert got[2] == 0b1010     # y=11 -> bits 1 and 3
    assert got[3] == 0b1111
    assert got[4] == 0b0101     # x clamps to 3, y clamps to 0


def test_zorder_value_matches_reference_interleave_exhaustively(spark):
    """zorder_value: over the full 64x64 grid (bits=6), the column
    expression must equal the Python reference bit-interleave for
    every point — and therefore be a bijection on the grid."""
    from cass_cdc_pg_spark.plans.bucketed import zorder_value

    def ref(x, y, bits=6):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    top = 63
    df = spark.range(64 * 64).selectExpr(
        "CAST(id % 64 AS INT) AS x", "CAST(id DIV 64 AS INT) AS y"
    )
    z = zorder_value(["x", "y"], [0, 0], [top, top], bits=6)
    got = {(r.x, r.y): r.z for r in df.select("x", "y", z.alias("z")).collect()}
    assert all(got[(x, y)] == ref(x, y) for x in range(64) for y in range(64))
    assert len(set(got.values())) == 64 * 64


def test_zorder_value_nulls_land_in_bottom_cell(spark):
    """zorder_value: NULL coordinates map to cell 0 on their
    dimension (not the TOP cell — least/greatest skip nulls, so the
    clamp alone would silently co-locate nulls with the largest
    rows); all-NULL stats raise a ValueError naming the column."""
    import pytest

    from cass_cdc_pg_spark.plans.bucketed import zorder_value

    df = spark.createDataFrame([(None, 3), (0, None), (None, None)],
                               "x int, y int")
    z = zorder_value(["x", "y"], [0, 0], [3, 3], bits=2)
    got = [r[0] for r in df.select(z).collect()]
    assert got[0] == 0b1010  # x null -> 0, y=3 -> odd bits
    assert got[1] == 0       # y null -> 0
    assert got[2] == 0
    with pytest.raises(ValueError, match="'x'"):
        zorder_value(["x"], [None], [None], bits=4)


def test_zorder_events_layout_prunes_declared_query_bands(spark, tmp_path, monkeypatch):
    """The DECLARED z-order read path (registry.events_zorder_scan):
    the persisted layout must prune files on BOTH band dimensions the
    query filters on — the structural pin behind the driver's
    value-level oracle check (r9 verdict #6)."""
    from cass_cdc_pg_spark import registry
    from cass_cdc_pg_spark.plans.bucketed import candidate_files

    sf = "/root/testdata/sf0.001"
    monkeypatch.setenv("SPARK_GRAFT_CACHE_DIR", str(tmp_path))
    d = registry._zorder_events_layout(spark, sf)

    ev = spark.read.parquet(d)
    b = ev.agg(
        F.min("ts_epoch").alias("t0"),
        F.max("ts_epoch").alias("t1"),
        F.max("user_id").alias("mu"),
    ).first()
    u_lo = b.mu // 4
    u_hi = u_lo + max(1, b.mu // 16)
    t_lo = b.t0 + (b.t1 - b.t0) // 4
    t_hi = b.t0 + (b.t1 - b.t0) // 2

    u_cand, total = candidate_files(d, "user_id", u_lo, u_hi)
    t_cand, _ = candidate_files(d, "ts_epoch", t_lo, t_hi)
    assert total == registry._ZORDER_FILES, total
    # the ~6% user band must skip at least half the files, the time
    # quartile at least a third — conservative floors of the measured
    # 8/16 so fixture regeneration noise can't flake the pin
    assert u_cand <= total // 2, (u_cand, total)
    assert t_cand <= (2 * total) // 3, (t_cand, total)

    # the declared query runs over the same layout and stays
    # file-skip-eligible: its scan pushes BOTH band predicates down
    # (raise the metadata print cap — the default 100 chars truncates
    # the PushedFilters list mid-entry)
    old = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = registry.events_zorder_scan_q(
            spark, sf
        )._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    assert "PushedFilters:" in plan
    for col in ("user_id", "ts_epoch"):
        assert f"GreaterThanOrEqual({col}" in plan, col
        assert f"LessThanOrEqual({col}" in plan, col


def test_zorder_events_layout_is_reused_not_rebuilt(spark, tmp_path, monkeypatch):
    """Second call serves the persisted dir (mtime-touched, same
    path) — the layout is durable state like the IVF centroid cache,
    not a per-query rewrite."""
    import os

    from cass_cdc_pg_spark import registry

    sf = "/root/testdata/sf0.001"
    monkeypatch.setenv("SPARK_GRAFT_CACHE_DIR", str(tmp_path))
    d1 = registry._zorder_events_layout(spark, sf)
    ino1 = os.stat(d1).st_ino
    d2 = registry._zorder_events_layout(spark, sf)
    assert d1 == d2 and os.stat(d2).st_ino == ino1
