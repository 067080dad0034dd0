"""Optimization-loop helper (r16): time named registry queries with
the same full-column noop action bench.py uses (warm, best-of-N), and
optionally dump their ``explain("formatted")`` plans.

Usage:
    python tools/time_query.py [--sf DIR] [--repeats N] [--plan-dir D] \
        [--all-pipeline] [query ...]

Prints one line per query: ``name  best  runs...`` and, with
--plan-dir, writes ``<dir>/<name>.txt`` with the formatted plan.
This is an iteration tool only — the record of note stays bench.py's.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--all-pipeline", action="store_true")
    ap.add_argument("--no-time", action="store_true",
                    help="plans only, skip the timed passes")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from cass_cdc_pg_spark.session import _default_driver_memory

    os.environ.setdefault("SPARK_DRIVER_MEMORY", _default_driver_memory())
    from cass_cdc_pg_spark.registry import QUERIES
    from cass_cdc_pg_spark.session import get_spark

    names = list(args.queries)
    if args.all_pipeline:
        import bench

        # keep explicitly-requested queries (an AUDIT-only name was
        # silently dropped by the old rebuild — r16 advice), then the
        # standard sweep, deduped in order
        base = names + bench.HEADLINE + bench.PIPELINE + bench.AUDIT
        seen: set[str] = set()
        names = [n for n in base if not (n in seen or seen.add(n))]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="time-query")
    spark.range(1000).selectExpr("sum(id)").collect()
    from cass_cdc_pg_spark.sources.tables import ensure_targets

    ensure_targets(spark, args.sf)

    if args.plan_dir:
        os.makedirs(args.plan_dir, exist_ok=True)

    for name in names:
        fn = QUERIES[name]
        if args.plan_dir:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plan_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        if args.no_time:
            print(f"{name}  (plan dumped)")
            continue
        spark.sparkContext.setJobDescription(f"time_query warm {name}")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"time_query {name} pass{i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}  best={min(runs)}  runs={runs}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
