from cass_cdc_pg_spark.sources.tables import (  # noqa: F401
    TABLES,
    events_with_micros,
    load_table,
    load_tables,
    perturbed_lineitem_target,
    perturbed_orders_target,
)
