"""Anti-pattern lint over EVERY registered query's physical plan.

`tests/test_plan_shapes.py` pins the plans whose shape IS the scale
contract; this tool is the broad net behind it: it builds all 102
registered queries at a small sf_dir and fails if any executed-plan
string shows one of the anti-patterns that silently kill a 100 TB run:

- ``CartesianProduct`` — an unconditional all-pairs join (the
  bounded, deliberate tiny-relation cross joins plan as broadcast
  nested loops and are allowlisted by query name below);
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan (the
  engine's contract is Arrow-vectorized Python only:
  ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas);
- ``Exchange SinglePartition`` feeding a ``Window`` — the global
  window that funnels the whole relation through one task (scalar
  aggregates over map-side partials also plan a SinglePartition
  exchange; those carry O(#partitions) rows and are fine, so the
  lint keys on the Window adjacency, not the exchange alone).

Usage: python tools/plan_lint.py [sf_dir]   (exit 0 = clean)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries whose BroadcastNestedLoopJoin / cross join is a deliberate,
#: bounded tiny-relation pattern (documented in their docstrings):
#: O(#partitions)² offset relations (deciles/token budget) and 1-row
#: scalar-aggregate broadcasts (share-of-total, corpus anchor date).
CROSS_JOIN_ALLOWED = {
    "customer_value_deciles",
    "docs_token_budget",
    "events_key_skew",          # counts × 1-row total (share-of-total)
    "customer_order_recency",   # join × 1-row max-date anchor
    "customer_dormant_balance",  # customers × 1-row avg-balance scalar
    "docs_heavy_hitters",       # k-row top-k × two 1-row certify aggs
    "docs_source_distinctive_terms",  # scored × 1-row grand-total scalar
    "embedding_cell_drift",  # per-cell rollup × 1-row corpus totals
    "docs_shard_balance",    # per-shard rollup × 1-row token total
}

#: queries whose single-partition window is deliberately bounded: it
#: runs over an AGGREGATED relation (a histogram of distinct values),
#: never the raw rows — the docstring documents the O(distinct) bound.
GLOBAL_WINDOW_ALLOWED = {
    "docs_quality_tiers",  # cumsum over the n_tokens histogram
}


def lint_plan(name: str, plan: str) -> list[str]:
    problems = []
    if "CartesianProduct" in plan:
        problems.append("CartesianProduct (unconditional all-pairs join)")
    if "BatchEvalPython" in plan:
        problems.append("BatchEvalPython (row-at-a-time Python UDF)")
    if (
        "BroadcastNestedLoopJoin" in plan
        and name not in CROSS_JOIN_ALLOWED
    ):
        problems.append(
            "BroadcastNestedLoopJoin outside the allowlisted "
            "tiny-relation patterns"
        )
    # SinglePartition exchange directly under a Window = global window
    if name not in GLOBAL_WINDOW_ALLOWED:
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" in line:
                for j in range(max(0, i - 3), i):
                    if re.search(r"\bWindow\b", lines[j]):
                        problems.append(
                            "Exchange SinglePartition feeding a Window "
                            "(global-order window)"
                        )
                        break
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from cass_cdc_pg_spark.registry import QUERIES
    from cass_cdc_pg_spark.session import get_spark

    spark = get_spark(app_name="plan-lint")
    failures: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # build failure is its own finding
            failures[name] = [f"build error: {type(exc).__name__}: {exc}"]
            continue
        problems = lint_plan(name, plan)
        if problems:
            failures[name] = problems
        print(f"{'FAIL' if problems else 'ok  '} {name}"
              + (f"  {problems}" if problems else ""))
    spark.stop()
    if failures:
        print(f"\n{len(failures)} queries with plan anti-patterns:")
        for name, probs in failures.items():
            print(f"  {name}: {probs}")
        return 1
    print(f"\nALL CLEAN ({len(QUERIES)} plans)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
