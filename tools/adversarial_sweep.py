"""Adversarial-config oracle sweep: every declared query must produce
the SAME answer under a hostile runtime configuration —

- ``spark.sql.shuffle.partitions = 7`` (prime, != the 8/32 the tests
  and bench run with): catches results that silently depend on
  partition layout (the r8 ADVICE deciles hazard class — split-lineage
  range partitioning, per-partition accumulators, first-row-wins).
- ``spark.sql.exchange.reuse = false``: catches correctness that
  rests on two plan branches being served by ONE physical exchange
  (the other half of the same r8 ADVICE item).
- AQE fully off: catches answers that only hold after runtime
  replanning (coalescing, skew splits).

Anything config-dependent is a silent wrong answer waiting for a
cluster with different defaults.  Usage:

    python tools/adversarial_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from check_oracle import canon_value, hash_rows  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    import duckdb

    import __spark_entry__ as entrymod
    from cass_cdc_pg_spark.session import get_spark
    from cass_cdc_pg_spark.sources.tables import TABLES

    spark = get_spark()
    ADVERSARIAL = {
        "spark.sql.shuffle.partitions": "7",
        "spark.sql.exchange.reuse": "false",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.skewJoin.enabled": "false",
    }

    def arm() -> None:
        for k, v in ADVERSARIAL.items():
            spark.conf.set(k, v)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    unknown = only - set(queries)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        # re-arm per query: loaders call session.configure(), which
        # restores the AQE flags it owns — the sweep must re-break
        # them so every query PLANS under the hostile config
        arm()
        try:
            sdf = fn(spark, sf_dir)
            arm()  # build may have re-configured; actions run hostile
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(s_rows)} (rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        res = con.execute(oracles[name])
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(
                f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}"
            )
        if sorted(s_cols) != sorted(d_cols):
            problems.append("column mismatch")
        if not problems and hash_rows(s_cols, s_rows) != hash_rows(
            d_cols, d_rows
        ):
            problems.append("value-hash mismatch")
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            set_s = {
                "\x1f".join(canon_value(r[i]) for i in order_s)
                for r in s_rows
            }
            set_d = {
                "\x1f".join(canon_value(r[i]) for i in order_d)
                for r in d_rows
            }
            for x in list(set_s - set_d)[:3]:
                print(f"  spark-only: {x!r}")
            for x in list(set_d - set_s)[:3]:
                print(f"  duck-only:  {x!r}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(
                f"ok   {name}: rows={len(s_rows)} hash-match "
                f"[{time.time()-t0:.1f}s]"
            )

    print(
        f"\n{len(failures)} failures: {failures}"
        if failures
        else "\nALL OK under adversarial config"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
