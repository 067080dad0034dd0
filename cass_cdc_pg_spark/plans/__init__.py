from cass_cdc_pg_spark.plans.keyed_table import KeyedTable  # noqa: F401
