"""Filtered / sorted / paginated listings (SURVEY.md §2.4 Q11-Q13).

The reference builds dynamic ``WHERE … ORDER BY ts DESC LIMIT ?
OFFSET ?`` strings (``src/services/dlq_service.py:83-113``,
``src/repositories/reconciliation_repository.py:170-229``).

Scale notes: ``orderBy().limit(n)`` compiles to
``TakeOrderedAndProject`` — a distributed top-k (per-partition heap +
driver-side k-way merge), NOT a global sort.  OFFSET is applied on the
already-reduced top ``limit+offset`` rows, so the window that numbers
them sees at most ``limit+offset`` rows on one partition — constant
work regardless of table size.  Order must be made total (tiebreak on
a unique key), otherwise pagination is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def listing(
    df: DataFrame,
    predicates: list[Column] | None,
    order_by: list[Column],
    limit: int,
    offset: int = 0,
) -> DataFrame:
    out = df
    for p in predicates or []:
        out = out.filter(p)
    topk = out.orderBy(*order_by).limit(limit + offset)
    if offset == 0:
        return topk
    w = Window.orderBy(*order_by)
    return (
        topk.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > offset)
        .drop("_rn")
    )
