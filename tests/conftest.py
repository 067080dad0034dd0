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
