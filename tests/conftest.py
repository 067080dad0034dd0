from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from cass_cdc_pg_spark.session import get_spark

    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark(app_name="cass-cdc-pg-spark-tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _no_stray_streams():
    """Stop any streaming query a test leaked; later tests (e.g. the
    health probes) assume a clean session with no active queries."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        for q in s.streams.active:
            try:
                q.stop()
            except Exception:
                pass
