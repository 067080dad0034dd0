from cass_cdc_pg_spark.functions.checksum import (  # noqa: F401
    canonical_cols,
    canonical_sql,
    row_checksum,
    row_checksum_sql,
)
