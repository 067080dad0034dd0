"""One-pass column profiling — the table-shape summary a data engineer
pulls before writing any pipeline against an unfamiliar 100 TB table,
and the generalization of the reference's reconciliation samplers
(``src/services/reconciliation_engine.py:461-499`` profiles a
distribution by sampling; this profiles it exactly in one scan).

Formulation: the profiled columns UNPIVOT to (col_name, value) rows —
a map-side projection, no shuffle, row amplification = number of
profiled columns — then a two-phase aggregate on (col_name, value)
computes the distinct-value rollup, and a second tiny rollup on
col_name folds it into per-column stats.  Compared to a single wide
aggregate with N ``count(distinct)``s (which Spark plans as an Expand
×(N+1) feeding ONE reducer row), this shape keeps both aggregations
partial-aggregated and parallel: the wide shuffle carries
(col_name, value, partial_count) triples — bounded by the number of
DISTINCT values per column per map task, not by row count — and the
final rollup reduces N rows.

Sums are exact: each distinct double casts to DECIMAL(18,6) once and
multiplies by its BIGINT count (decimal arithmetic is associative,
so Spark's two-level fold and DuckDB's single-level fold agree
bit-for-bit); the single double conversion happens per output row.

At 100 TB the same shape holds — profile cost is one scan plus a
shuffle of per-task distinct triples; for genuinely high-cardinality
columns swap the exact distinct rollup for ``approx_count_distinct``
(HLL) and drop the value grouping, which this module exposes via
``approximate=True`` (not oracle-checked: HLL estimates are
engine-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str], approximate: bool = False
) -> DataFrame:
    """Per-column stats over numeric *cols*: row count, null count,
    exact distinct count, min, max, and an exact DECIMAL-accumulated
    sum (surfaced as a rounded double).  One scan of *df*."""
    unpivoted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("u")
    ).select("u.col_name", "u.v")

    if approximate:
        return unpivoted.groupBy("col_name").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.count(F.lit(1)) - F.count("v")).cast("long").alias("n_null"),
            # rsd=0.01 → HLL++ precision ~14 (a ~16 KiB sketch per
            # (column, task) — still O(1) state, unlike the exact
            # rollup's O(distinct)); the default 0.05 sketch misses
            # the 5%-of-exact bound the pytest pins
            F.approx_count_distinct("v", rsd=0.01)
            .cast("long")
            .alias("n_distinct"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.round(
                F.sum(F.col("v").cast("decimal(18,6)")).cast("double"), 4
            ).alias("sum_v"),
        )

    per_value = unpivoted.groupBy("col_name", "v").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    nn = F.col("v").isNotNull()
    return per_value.groupBy("col_name").agg(
        F.sum("_n").cast("long").alias("n_rows"),
        F.sum(F.when(~nn, F.col("_n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_null"),
        F.sum(F.when(nn, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_distinct"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.round(
            F.sum(F.col("v").cast("decimal(18,6)") * F.col("_n")).cast(
                "double"
            ),
            4,
        ).alias("sum_v"),
    )
