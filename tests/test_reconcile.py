"""Reconciliation operator unit tests on tiny in-memory tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from cass_cdc_pg_spark.operators.reconcile import (
    checksum_diff,
    field_diff,
    row_count_validation,
)

SRC = [
    (1, "a", 10.0),
    (2, "b", 20.0),
    (3, "c", 30.0),
]
TGT = [
    (1, "a", 10.0),     # identical
    (2, "b", 99.0),     # mutated → DATA_MISMATCH
    # 3 missing          → MISSING_IN_TARGET
    (4, "d", 40.0),     # extra → MISSING_IN_SOURCE
]
DDL = "id long, name string, amount double"


def test_row_count_and_drift(spark):
    src = spark.createDataFrame(SRC, DDL)
    tgt = spark.createDataFrame(TGT, DDL)
    row = row_count_validation(src, tgt).collect()[0]
    assert row["src_count"] == 3 and row["tgt_count"] == 3
    assert row["mismatch_count"] == 0 and row["severity"] == "ok"


def test_checksum_diff_classifies_all_three(spark):
    src = spark.createDataFrame(SRC, DDL)
    tgt = spark.createDataFrame(TGT, DDL)
    out = {
        r["id"]: r["mismatch_type"]
        for r in checksum_diff(src, tgt, ["id"], ["name", "amount"]).collect()
    }
    assert out == {
        2: "DATA_MISMATCH",
        3: "MISSING_IN_TARGET",
        4: "MISSING_IN_SOURCE",
    }


def test_field_diff_pinpoints_column(spark):
    src = spark.createDataFrame(SRC, DDL)
    tgt = spark.createDataFrame(TGT, DDL)
    rows = field_diff(src, tgt, ["id"], ["name", "amount"]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id"], r["column"]) == (2, "amount")
    assert r["src_val"] == "20.0000" and r["tgt_val"] == "99.0000"


def test_drift_severity_thresholds(spark):
    from cass_cdc_pg_spark.operators.reconcile import drift_severity

    df = spark.range(1).select(
        drift_severity(F.lit(0.5)).alias("a"),
        drift_severity(F.lit(1.0)).alias("b"),
        drift_severity(F.lit(7.2)).alias("c"),
    )
    r = df.collect()[0]
    assert (r["a"], r["b"], r["c"]) == ("ok", "warning", "critical")


def test_checksum_null_canonicalization(spark):
    """Rows differing only in WHICH column is NULL, or NULL-vs-empty,
    must produce different checksums (ADVICE r1)."""
    from cass_cdc_pg_spark.functions.checksum import row_checksum

    df = spark.createDataFrame(
        [(1, "a", None), (2, None, "a"), (3, "", None), (4, None, None)],
        "id long, x string, y string",
    )
    cks = [r["c"] for r in df.select(row_checksum(df, ["x", "y"]).alias("c")).collect()]
    assert len(set(cks)) == 4  # all four rows distinct


def test_field_diff_reports_null_vs_value(spark):
    from cass_cdc_pg_spark.operators.reconcile import field_diff

    src = spark.createDataFrame([(1, "a"), (2, None)], "id long, v string")
    tgt = spark.createDataFrame([(1, None), (2, None)], "id long, v string")
    got = field_diff(src, tgt, ["id"], ["v"]).collect()
    assert len(got) == 1
    assert got[0]["id"] == 1 and got[0]["src_val"] == "a" and got[0]["tgt_val"] is None


def test_bucketed_checksum_diff_is_shuffle_free(spark, tmp_path):
    """The 100 TB reconciliation plan: both sides bucketed on the PK →
    checksum_diff's full-outer join plans with NO Exchange (the scans
    are already partitioned+sorted on the join key)."""
    from cass_cdc_pg_spark.operators.reconcile import (
        checksum_diff,
        register_bucketed,
    )

    src = spark.range(1000).selectExpr("id AS pk", "id * 2 AS v")
    tgt = spark.range(990).selectExpr("id AS pk", "id * 2 AS v")
    s = register_bucketed(spark, src, "recon_src_b", ["pk"], num_buckets=8)
    t = register_bucketed(spark, tgt, "recon_tgt_b", ["pk"], num_buckets=8)
    diff = checksum_diff(s, t, ["pk"], ["v"])
    plan = diff._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert diff.count() == 10  # the 10 missing keys


def test_incremental_checksum_diff_scopes_to_changed_keys(spark, tmp_path):
    """incremental_checksum_diff: only keys the source's change feed
    touched after since_version are compared — a divergence introduced
    earlier is invisible (the periodic full job's business), a
    divergence in the range is flagged, matching keys in the range
    produce no row, and an empty range returns None."""
    from cass_cdc_pg_spark.operators.reconcile import (
        DATA_MISMATCH,
        MISSING_IN_TARGET,
        incremental_checksum_diff,
    )
    from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

    ddl = ("id string, val string, _cdc_deleted boolean, "
           "_cdc_timestamp_micros long, _last_event_id string, "
           "_ttl_expiry_timestamp_us long")
    mk = lambda rows: spark.createDataFrame(rows, ddl)  # noqa: E731
    src = KeyedTable(spark, str(tmp_path / "src"), ["id"], num_buckets=4,
                     keep_versions=10)
    tgt = KeyedTable(spark, str(tmp_path / "tgt"), ["id"], num_buckets=8,
                     keep_versions=10)

    # seeded in sync — except 'stale' already diverges BEFORE the mark
    src.merge(mk([("a", "v1", False, 100, "e1", None),
                  ("stale", "x-src", False, 100, "e2", None)]))
    tgt.merge(mk([("a", "v1", False, 100, "e1", None),
                  ("stale", "x-tgt", False, 100, "e2", None)]))
    mark = src._current_version()

    # in-range: 'a' updated on both sides identically (clean), 'b' only
    # in source (missing in target), 'c' diverges in value
    src.merge(mk([("a", "v2", False, 200, "e3", None),
                  ("b", "new", False, 200, "e4", None),
                  ("c", "src-val", False, 200, "e5", None)]))
    tgt.merge(mk([("a", "v2", False, 200, "e3", None),
                  ("c", "tgt-val", False, 200, "e6", None)]))

    out = incremental_checksum_diff(src, tgt, mark, ["val"])
    got = {r["id"]: r["mismatch_type"] for r in out.collect()}
    assert got == {"b": MISSING_IN_TARGET, "c": DATA_MISMATCH}

    assert incremental_checksum_diff(src, tgt, src._current_version(),
                                     ["val"]) is None


def test_incremental_checksum_diff_key_order_mismatch(spark, tmp_path):
    """xxhash64 is argument-order-sensitive: when the two tables
    persist the SAME key set in DIFFERENT order, target buckets must
    be hashed with the target's own order — the old code used the
    source's order for both, skipped live target rows, and falsely
    reported MISSING_IN_TARGET."""
    from cass_cdc_pg_spark.operators.reconcile import (
        incremental_checksum_diff,
    )
    from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

    ddl = ("k1 string, k2 string, val string, _cdc_deleted boolean, "
           "_cdc_timestamp_micros long, _last_event_id string, "
           "_ttl_expiry_timestamp_us long")
    mk = lambda rows: spark.createDataFrame(rows, ddl)  # noqa: E731
    src = KeyedTable(spark, str(tmp_path / "src"), ["k1", "k2"],
                     num_buckets=8, keep_versions=10)
    tgt = KeyedTable(spark, str(tmp_path / "tgt"), ["k2", "k1"],
                     num_buckets=8, keep_versions=10)
    rows = [(f"a{i}", f"b{i}", "v", False, 100, f"e{i}", None)
            for i in range(20)]
    src.merge(mk(rows))
    mark = src._current_version()
    upd = [(f"a{i}", f"b{i}", "v2", False, 200, f"x{i}", None)
           for i in range(20)]
    src.merge(mk(upd))
    tgt.merge(mk(upd))

    # all 20 changed keys are IDENTICAL on both sides -> no mismatch rows
    out = incremental_checksum_diff(src, tgt, mark, ["val"])
    assert out.count() == 0


def test_incremental_checksum_diff_rejects_different_key_sets(spark, tmp_path):
    import pytest

    from cass_cdc_pg_spark.operators.reconcile import (
        incremental_checksum_diff,
    )
    from cass_cdc_pg_spark.plans.keyed_table import KeyedTable

    src = KeyedTable(spark, str(tmp_path / "s2"), ["a"], num_buckets=2)
    tgt = KeyedTable(spark, str(tmp_path / "t2"), ["b"], num_buckets=2)
    with pytest.raises(ValueError, match="share key columns"):
        incremental_checksum_diff(src, tgt, 0, ["val"])
