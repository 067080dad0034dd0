"""Guard against oracle dtype drift in the driver's pandas canonicalizer.

The driver's correctness harness canonicalizes DuckDB oracle output via
pandas (``fetchdf``).  Types outside a narrow canonical-safe set silently
change representation on that path and cause value-hash mismatches even
when the Spark answer is correct.  Two rounds in a row lost green rows to
this class:

- r2: ``multimodal_features`` (``array<float>`` column)
- r3: ``docs_length_histogram`` / ``text_token_rarity`` /
  ``docs_token_budget`` — DuckDB ``SUM`` over integers returns HUGEINT,
  which pandas renders as float64 (``166763.0`` vs Spark's ``166763``).

This test runs EVERY declared oracle against DuckDB (binding only — no
row fetch) and asserts each output column's type is canonical-safe:
no HUGEINT, no DECIMAL, no LIST/STRUCT/MAP.  A new oracle that would
re-introduce the class fails here, in pytest, before the driver sees it.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# DuckDB logical types that survive the driver's pandas canonicalizer
# with the same textual value Spark produces.
SAFE_TYPES = {
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
}


def _oracles() -> dict[str, str]:
    import __spark_entry__ as entrymod

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
    return entrymod.oracle_sql()


def _connect() -> duckdb.DuckDBPyConnection:
    from cass_cdc_pg_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_every_oracle_output_type_is_canonical_safe():
    oracles = _oracles()
    con = _connect()
    bad: list[str] = []
    for name, sql in sorted(oracles.items()):
        rel = con.sql(sql)  # binds + plans; does not fetch rows
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            # DECIMAL(38,0) etc. — normalize parameterized names first
            base = re.sub(r"\(.*\)", "", t).strip()
            if base not in SAFE_TYPES:
                bad.append(f"{name}.{col}: {t}")
    assert not bad, (
        "oracle output columns with canonicalizer-unsafe DuckDB types "
        "(HUGEINT/DECIMAL/LIST/STRUCT drift silently through the driver's "
        f"pandas path): {bad}"
    )


# Engine-type → comparison class.  The driver hashes VALUES (ints of
# any width stringify identically), so width differences are benign;
# what breaks the hash is a column-NAME mismatch or a numeric-CLASS
# drift (INT 5 vs FLOAT 5.0, or a DECIMAL rendering with a scale
# suffix).  Classes below are the equivalence the hash actually needs.
_SPARK_CLASS = {
    "tinyint": "INT", "smallint": "INT", "int": "INT", "bigint": "INT",
    "float": "FLOAT", "double": "FLOAT",
    "string": "STR", "boolean": "BOOL", "date": "DATE",
    "timestamp": "TS", "timestamp_ntz": "TS",
}
_DUCK_CLASS = {
    "TINYINT": "INT", "SMALLINT": "INT", "INTEGER": "INT",
    "BIGINT": "INT", "UTINYINT": "INT", "USMALLINT": "INT",
    "UINTEGER": "INT",
    "FLOAT": "FLOAT", "DOUBLE": "FLOAT",
    "VARCHAR": "STR", "BOOLEAN": "BOOL", "DATE": "DATE",
    "TIMESTAMP": "TS", "TIMESTAMP WITH TIME ZONE": "TS",
}


def test_spark_twin_schema_matches_oracle_schema(spark):
    """Both engines' output schemas, compared for all declared queries:
    column-name sets must be identical and every shared column's
    numeric class must agree — a Spark-side type drift (e.g. a future
    DECIMAL aggregate output) fails here before the driver's value
    hash turns red.  Schema-only: the Spark side is resolved via
    ``.schema`` (no job), the DuckDB side via a bind (no fetch)."""
    import __spark_entry__ as entrymod

    oracles = _oracles()
    queries = entrymod.queries()
    con = _connect()
    bad: list[str] = []
    for name in sorted(oracles):
        sdf = queries[name](spark, SF_DIR)
        stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        rel = con.sql(oracles[name])
        dtypes = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
        if set(stypes) != set(dtypes):
            bad.append(
                f"{name}: column names differ — spark-only "
                f"{sorted(set(stypes) - set(dtypes))}, oracle-only "
                f"{sorted(set(dtypes) - set(stypes))}"
            )
            continue
        for col in stypes:
            s_cls = _SPARK_CLASS.get(stypes[col])
            d_cls = _DUCK_CLASS.get(
                re.sub(r"\(.*\)", "", dtypes[col]).strip()
            )
            if s_cls is None:
                bad.append(
                    f"{name}.{col}: spark type {stypes[col]} is outside "
                    "the canonicalizer-safe set"
                )
            elif s_cls != d_cls:
                bad.append(
                    f"{name}.{col}: class mismatch spark={stypes[col]} "
                    f"oracle={dtypes[col]}"
                )
    assert not bad, "\n".join(bad)


def test_every_declared_query_has_an_oracle_or_documented_exemption():
    """Every ``queries()`` key should carry an oracle twin.  Keep the
    exemption list explicit so a silently dropped oracle is caught."""
    import __spark_entry__ as entrymod

    queries = set(entrymod.queries())
    oracles = set(_oracles())
    # iterative greedy MIS is not SQL-expressible (recursion with
    # negation); exactness is pinned against a sequential model in
    # tests/test_text_dedup_similarity.py instead
    rows_only_ok = {"embedding_semdedup_greedy"}
    missing = queries - oracles - rows_only_ok
    assert not missing, f"declared queries lacking an oracle: {sorted(missing)}"
    assert rows_only_ok <= queries  # exemptions must stay real
