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


def test_every_declared_query_has_an_oracle_or_documented_exemption():
    """Every ``queries()`` key should carry an oracle twin.  Keep the
    exemption list explicit so a silently dropped oracle is caught."""
    import __spark_entry__ as entrymod

    queries = set(entrymod.queries())
    oracles = set(_oracles())
    rows_only_ok = set()  # no exemptions today
    missing = queries - oracles - rows_only_ok
    assert not missing, f"declared queries lacking an oracle: {sorted(missing)}"
