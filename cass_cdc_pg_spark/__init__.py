"""cass_cdc_pg_spark — a PySpark-native engine with the query and
data-processing capabilities of the reference CDC pipeline
(NhaLeTruc/cass-cdc-pg), re-expressed Spark-first.

Layout (mirrors SURVEY.md §7):

- ``session``    — SparkSession construction + runtime conf.
- ``schema``     — Cassandra→Spark type mapping, ChangeEvent schema.
- ``sources``    — parquet table loading, event-stream bindings.
- ``functions``  — scalar surface: checksums, validation, TTL math.
- ``operators``  — batch query layer: reconciliation, listings, LWW,
                   dedup, similarity search, text analysis.
- ``plans``      — keyed upsert table (bucketed parquet, LWW merge).
- ``streaming``  — Structured Streaming ingest, DLQ, reliability.

Everything here is built on the public PySpark DataFrame/SQL API; no
RDD code, no row-at-a-time Python UDFs on hot paths.
"""

__version__ = "0.1.0"
