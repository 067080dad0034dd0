"""Filtered / sorted / paginated listings (SURVEY.md §2.4 Q11-Q13).

The reference builds dynamic ``WHERE … ORDER BY ts DESC LIMIT ?
OFFSET ?`` strings (``src/services/dlq_service.py:83-113``,
``src/repositories/reconciliation_repository.py:170-229``).

Scale notes: ``orderBy().limit(n)`` compiles to
``TakeOrderedAndProject`` — a distributed top-k (per-partition heap +
driver-side k-way merge), NOT a global sort.  OFFSET uses the native
``DataFrame.offset`` (Spark ≥3.4): the planner folds it into the same
``TakeOrderedAndProject(limit+offset, skip=offset)`` node, so the skip
happens during the driver-side merge — no extra shuffle, no
single-partition window.  Order must be made total (tiebreak on a
unique key), otherwise pagination is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


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
    out = out.orderBy(*order_by)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)
