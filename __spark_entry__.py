"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query: the full-outer checksum
reconciliation (SURVEY.md §2.4 Q3) between the lineitem "source" and
its deterministically perturbed "target replica", summarized per
mismatch type.  Exercises the canonical-checksum function surface, the
keyed full-outer join, and the drift classification in one plan.

``queries()`` / ``oracle_sql()`` — the declared operator inventory,
re-exported from :mod:`cass_cdc_pg_spark.registry`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cass_cdc_pg_spark.registry import q3_checksum_diff

    diff = q3_checksum_diff(spark, "/root/testdata/sf0.001")
    return (
        diff.groupBy("mismatch_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("mismatch_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cass_cdc_pg_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    import os

    from cass_cdc_pg_spark.registry import oracle_sql as _oracle_sql

    return _oracle_sql(
        os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    )
