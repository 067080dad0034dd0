"""TPC-H-ish sales analytics tier of the declared-query registry
(split from ``registry.py`` in r14, fourth tranche of the r12 verdict
#6 decomposition): the orders/lineitem/customer/part/supplier/nation
star-schema queries with their DuckDB oracle twins.  ``registry.py``
re-exports every name unchanged; back-references use the same
call-time module proxy as ``registry_ann``."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cass_cdc_pg_spark.operators import profile
from cass_cdc_pg_spark.sources import tables as src



class _RegistryProxy:
    """Call-time proxy into ``registry`` (the registry_ann pattern):
    imported lazily inside __getattr__ so the module can be imported
    while registry.py itself is still mid-import."""

    def __getattr__(self, name: str):
        from cass_cdc_pg_spark import registry

        return getattr(registry, name)


_reg = _RegistryProxy()


def _li(spark, sf_dir):
    return src.load_table(spark, sf_dir, "lineitem")


def _ord(spark, sf_dir):
    return src.load_table(spark, sf_dir, "orders")


def _ev(spark, sf_dir):
    return src.events_with_micros(spark, sf_dir)



def sales_by_nation_quarter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema revenue rollup (TPC-H Q5-shaped): lineitem ⋈ orders
    ⋈ customer ⋈ nation, revenue per nation per quarter.

    Scale shape: the two fact-side joins shuffle on their keys
    (l_orderkey, o_custkey) with AQE free to broadcast whichever side
    shrinks below threshold at runtime; the nation dim is explicitly
    ``broadcast()`` (25 rows at any scale).  Revenue multiplies in
    double (IEEE-identical in any engine) and accumulates as
    DECIMAL(18,6) — exact, associative, partition-order independent;
    a double SUM here would be nondeterministic across partitionings.
    """
    li = _li(spark, sf_dir).select("l_orderkey", "l_extendedprice", "l_discount")
    o = src.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = src.load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = src.load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    # r16 rewrite (guide §2.3 "aggregate before you shuffle"): each
    # order belongs to exactly ONE (nation, yr, qtr) group — o_orderkey
    # is the orders PK, o_orderdate/c_nationkey are order-level — so
    # COUNT(DISTINCT o_orderkey) per group equals a plain COUNT(*) over
    # order-level pre-aggregates, and the decimal revenue sum is
    # associative across the two levels.  Pre-aggregating lineitem by
    # l_orderkey first (map-side partials collapse the fact's ~4
    # rows/order before the only fact-wide exchange) removes the
    # two-phase distinct re-shuffle of every joined fact row on
    # (nation, yr, qtr, o_orderkey) and shrinks the three dimension
    # joins to order-level cardinality.  Hash-identical output
    # (oracle-green at both fixtures): inner-join semantics are
    # preserved because pre-aggregation keeps exactly the orderkeys
    # present in lineitem.
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_items"),
        F.sum(rev).alias("_rev"),
    )
    return (
        per_order.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
            F.quarter("o_orderdate").cast("int").alias("qtr"),
        )
        .agg(
            F.sum("_items").cast("long").alias("n_items"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("_rev").alias("_rev"),
        )
        .select(
            "nation",
            "yr",
            "qtr",
            "n_items",
            "n_orders",
            F.round(F.col("_rev").cast("double"), 2).alias("revenue"),
        )
    )


SALES_NATION_QUARTER_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY 1, 2, 3
"""


def sales_rollup_totals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue ROLLUP with subtotals: per (nation, year), per nation,
    and grand total in one pass — the GROUPING SETS surface
    (``rollup()``) over the same star join as
    ``sales_by_nation_quarter``.  ``grouping_id()`` disambiguates a
    subtotal NULL from data NULL identically in both engines (same
    column order ⇒ same bitmask).  Revenue stays DECIMAL-accumulated
    (exact, associative) so every subtotal is partition-order
    independent; Spark expands rollup levels BEFORE the partial
    aggregate, so the shuffle still carries one row per (level, key)
    per partition — no extra pass per level."""
    li = _li(spark, sf_dir).select("l_orderkey", "l_extendedprice", "l_discount")
    o = src.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = src.load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = src.load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    # r16: same order-level pre-aggregation as sales_by_nation_quarter
    # (guide §2.3) — the rollup keys (nation, yr) are order-level and
    # both aggregates decompose (count → sum of per-order counts,
    # decimal sum associative), so the fact collapses ~4× before the
    # dimension joins and the rollup Expand runs over order-level rows
    # instead of every lineitem.  Hash-identical (oracle-green).
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_items"),
        F.sum(rev).alias("_r"),
    )
    return (
        per_order.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
            F.col("_items"),
            F.col("_r"),
        )
        .rollup("nation", "yr")
        .agg(
            F.grouping_id().cast("int").alias("lvl"),
            F.sum("_items").cast("long").alias("n_items"),
            F.sum("_r").alias("_rev"),
        )
        .select(
            "nation",
            "yr",
            "lvl",
            "n_items",
            F.round(F.col("_rev").cast("double"), 2).alias("revenue"),
        )
    )


SALES_ROLLUP_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(GROUPING(n_name, year(o_orderdate)) AS INT) AS lvl,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, year(o_orderdate))
"""


def sales_top_suppliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 suppliers by revenue — the league-table star join.

    supplier (100 rows/SF-invariant-small) broadcasts into lineitem's
    scan stage, revenue accumulates as DECIMAL (exact, associative)
    through the partial-aggregated s_suppkey shuffle, and the final
    order+limit plans as TakeOrderedAndProject — no global sort.  The
    ordering key is the EXACT decimal revenue with s_suppkey as
    tiebreak, so the cut is deterministic in both engines."""
    li = _li(spark, sf_dir).select("l_suppkey", "l_extendedprice", "l_discount")
    s = src.load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", rev.alias("_r"))
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("_r").alias("_rev"),
        )
        .orderBy(F.col("_rev").desc(), F.col("s_suppkey"))
        .limit(10)
        .select(
            "s_suppkey",
            "s_name",
            "n_items",
            F.round(F.col("_rev").cast("double"), 2).alias("revenue"),
        )
    )


TOP_SUPPLIERS_SQL = """
SELECT s_suppkey, s_name,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) DESC, s_suppkey
LIMIT 10
"""


def sales_region_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(region, year) revenue with share-of-year — the market-share
    rollup (TPC-H Q8 family) over the supplier→nation→region dim chain.

    The ONLY big-big join is lineitem⋈orders (shuffle on orderkey);
    supplier⋈nation⋈region collapses driver-side-free into a ~100-row
    (s_suppkey → region) dim that BROADCASTS into the same stage.
    Revenue accumulates as DECIMAL; the share divides two exact
    decimal sums (the denominator via a window over the tiny
    (region×year) aggregate, not a second pass over lineitem) in one
    double op per output row."""
    from pyspark.sql import Window

    li = _li(spark, sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = src.load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = src.load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = src.load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = src.load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    dim = (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "r_name")
    )
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    agg = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("r_name").alias("region"),
            F.year("o_orderdate").cast("int").alias("yr"),
            rev.alias("_r"),
        )
        .groupBy("region", "yr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("_r").alias("_rev"),
        )
    )
    w = Window.partitionBy("yr")
    return agg.select(
        "region",
        "yr",
        "n_items",
        F.round(F.col("_rev").cast("double"), 2).alias("revenue"),
        F.round(
            F.col("_rev").cast("double") / F.sum("_rev").over(w).cast("double"), 6
        ).alias("share"),
    )


REGION_SHARE_SQL = """
WITH dim AS (
  SELECT s_suppkey, r_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey),
agg AS (
  SELECT r_name AS region, CAST(year(o_orderdate) AS INT) AS yr,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                JOIN dim ON l_suppkey = s_suppkey
  GROUP BY 1, 2)
SELECT region, yr, n_items,
       ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
       ROUND(CAST(rev AS DOUBLE)
             / CAST(SUM(rev) OVER (PARTITION BY yr) AS DOUBLE), 6) AS share
FROM agg
"""


def lineitem_small_qty_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue for one brand (TPC-H Q17 family):
    "how much yearly revenue would we lose by dropping orders below
    20% of a part's average order quantity" — the correlated-average
    join-back shape.

    Scale shape: the brand filter cuts ``part`` to a tiny key list
    that BROADCASTS into the lineitem scan twice — once to compute the
    per-part average, once to score rows against it — so lineitem is
    scanned (pruned to 3 columns) but never shuffled as rows; the only
    Exchange carries (partkey, qty-sum partials), one row per
    surviving part.  The per-part averages (≤ |brand parts| rows) then
    broadcast back.  The threshold compare is EXACT arithmetic:
    ``qty × 5 × cnt < sum_qty`` (qty < 0.2·avg with the division
    cleared) over DECIMAL, so no engine can disagree on a boundary
    row.  Revenue accumulates as DECIMAL and rounds once at the end.
    """
    p = (
        src.load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#11")
        .select("p_partkey")
    )
    li = _li(spark, sf_dir).select("l_partkey", "l_quantity", "l_extendedprice")
    li_b = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    per_part = li_b.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sq"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    return (
        li_b.join(F.broadcast(per_part), "l_partkey")
        .filter(
            F.col("l_quantity").cast("decimal(18,2)") * F.lit(5) * F.col("_cnt")
            < F.col("_sq")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(
                (
                    F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
                    / F.lit(7.0)
                ).cast("double"),
                2,
            ).alias("avg_yearly"),
        )
    )


SMALL_QTY_REVENUE_SQL = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11')),
a AS (
  SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq, COUNT(*) AS cnt
  FROM li GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) / 7.0 AS DOUBLE), 2)
         AS avg_yearly
FROM li JOIN a USING (l_partkey)
WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * a.cnt < a.sq
"""


def orders_big_basket_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 family): orders whose total
    line quantity exceeds 300 units, with who placed them — the
    having-threshold join-back shape.

    Scale shape: lineitem pre-aggregates to one (orderkey, sum_qty)
    row per order BEFORE any join (partial map-side combine, then one
    orderkey shuffle), and the >300 filter kills ~99.95% of orders at
    the aggregate — so the joins against ``orders`` and ``customer``
    see only the handful of qualifying keys.  Both joins are written
    as plain equi-joins: at toy SF AQE broadcasts the tiny filtered
    side; at 100 TB the orderkey join reuses the aggregation's
    partitioning (same key) and the custkey join shuffles only
    qualifying orders.  Final order is totalprice desc with orderkey
    as the unique tiebreak, planned as a distributed top-k.
    """
    li = _li(spark, sf_dir).select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sq"))
        .filter(F.col("_sq") > 300)
    )
    o = src.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = src.load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            F.col("_sq").cast("double").alias("sum_qty"),
        )
    )


BIG_BASKET_SQL = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
SELECT c_custkey, c_name, o_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
       ROUND(o_totalprice, 2) AS totalprice,
       CAST(sq AS DOUBLE) AS sum_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def supplier_sole_late_blame_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely to blame for late multi-supplier orders
    (TPC-H Q21 family, lateness proxied as shipdate > orderdate + 60
    days since the synthetic schema has no commit/receipt dates).

    Scale shape: the textbook formulation is TWO lineitem self-joins
    (EXISTS another supplier / NOT EXISTS another late supplier) —
    three shuffles of the fact table.  This rewrite gets the same
    answer from ONE orderkey shuffle: after the lineitem⋈orders join
    (orders pre-filtered to status 'F', filter pushed to the scan),
    a (orderkey, suppkey) aggregate collapses lines to per-supplier
    lateness flags, and a second orderkey aggregate — which reuses the
    join's hash partitioning, so it plans WITHOUT a new Exchange —
    counts suppliers and late suppliers per order.  "Sole blame" is
    then ``n_supp ≥ 2 AND n_late = 1``, and the blamed key is
    ``max(case when late then suppkey end)`` (exactly one candidate,
    so max is exact, not a tiebreak).  Supplier/nation dims broadcast
    into the final tiny rollup.
    """
    o = (
        src.load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _li(spark, sf_dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_supp = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("_late"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n_supp"),
        F.sum(F.when(F.col("_late"), 1).otherwise(0)).alias("_n_late"),
        F.max(F.when(F.col("_late"), F.col("l_suppkey"))).alias("_blame"),
    )
    n = src.load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = (
        src.load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )
    return (
        per_order.filter((F.col("_n_supp") >= 2) & (F.col("_n_late") == 1))
        .groupBy("_blame")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(F.broadcast(dim), F.col("_blame") == F.col("s_suppkey"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
        .select("s_suppkey", "s_name", "nation", "numwait")
    )


SOLE_LATE_BLAME_SQL = """
WITH j AS (
  SELECT l_orderkey, l_suppkey,
         BOOL_OR(l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2),
per_order AS (
  SELECT l_orderkey,
         COUNT(*) AS n_supp,
         SUM(CASE WHEN late THEN 1 ELSE 0 END) AS n_late,
         MAX(CASE WHEN late THEN l_suppkey END) AS blame
  FROM j GROUP BY 1)
SELECT s_suppkey, s_name, n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order
JOIN supplier ON blame = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY 1, 2, 3
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def customer_dormant_balance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormant high-balance customers by nation (TPC-H Q22 family):
    customers with above-average positive balance and no order since
    1999 — the scalar-subquery + anti-join shape.

    Scale shape: the global average is a 1-row aggregate that
    CROSS-broadcasts into the customer scan (one tiny row, the
    allowlisted broadcast-cross shape, never a cartesian of data);
    "no recent order" is a LEFT ANTI join against the date-filtered
    orders projection (filter pushed to the scan, only o_custkey
    read).  The above-average compare clears the division —
    ``acctbal × cnt > total`` over DECIMAL — so both engines agree on
    exact boundary rows.  Output is a ≤25-row per-nation rollup with
    the nation dim broadcast.
    """
    cust = src.load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", F.col("c_acctbal").cast("decimal(18,2)").alias("_bal")
    )
    avg_row = cust.filter(F.col("_bal") > 0).agg(
        F.sum("_bal").alias("_total"), F.count(F.lit(1)).alias("_cnt")
    )
    recent = (
        src.load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    n = src.load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .crossJoin(F.broadcast(avg_row))
        .filter(F.col("_bal") * F.col("_cnt") > F.col("_total"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("_bal").cast("double"), 2).alias("total_balance"),
        )
        .select(F.col("n_name").alias("nation"), "n_customers", "total_balance")
        .orderBy("nation")
    )


DORMANT_BALANCE_SQL = """
WITH pos AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total, COUNT(*) AS cnt
  FROM customer WHERE c_acctbal > 0)
SELECT n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * (SELECT cnt FROM pos)
        > (SELECT total FROM pos)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
ORDER BY 1
"""


def nation_trade_flows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade-flow matrix (TPC-H Q7 family): shipped revenue
    between every (supplier nation, customer nation) pair per ship
    year — the two-sided-dimension shape where the SAME tiny dim
    (nation) labels both ends of one fact row.

    Scale shape: the ship-date filter pushes to the lineitem scan.
    supplier⋈nation collapses to a broadcast (suppkey → nation) map;
    the customer-side nation is a second broadcast of the 25-row dim
    AFTER the custkey join, so nation never shuffles.  The big-big
    joins are lineitem⋈orders (orderkey) and ⋈customer (custkey) —
    the two unavoidable fact shuffles of the Q7 shape (at toy SF AQE
    broadcasts both small sides; at 100 TB they are the only
    Exchanges that carry data rows, and both carry pruned
    4-column projections, never text).  Revenue accumulates as
    DECIMAL; output is a ≤25×25×2 matrix."""
    li = _li(spark, sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = src.load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = src.load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = src.load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sdim = (
        src.load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cn = n.select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sdim), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("_cnk"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("yr"),
            rev.alias("_r"),
        )
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(F.sum("_r"), 2).cast("double").alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "yr")
    )


TRADE_FLOWS_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def nation_market_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 family): within the STANDARD
    part-type slice, the fraction of each (customer region, order
    year)'s revenue supplied by NATION_7 — the two-level share shape.

    Scale shape: the share is computed INSIDE one aggregate
    (conditional DECIMAL sum / total DECIMAL sum per group) — never a
    second pass, self-join, or window over the fact.  The p_type
    filter pushes to the part scan and the filtered part list
    BROADCASTS to cut lineitem before the orderkey join; supplier and
    nation⋈region collapse to broadcast maps; the only data Exchanges
    are the two unavoidable fact shuffles (orderkey, custkey) plus a
    ≤regions×years rollup.  Reference analog: drift-ratio style
    share-of-total reporting (`src/services/reconciliation.py`)."""
    p = (
        src.load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    li = _li(spark, sf_dir).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = src.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("int").alias("yr")
    )
    c = src.load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = src.load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = src.load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    sdim = (
        src.load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cdim = (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("n_nationkey").alias("_cnk"),
            F.col("r_name").alias("region"),
        )
    )
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sdim), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cdim), F.col("c_nationkey") == F.col("_cnk"))
        .groupBy("region", "yr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(rev).alias("_total"),
            F.sum(
                F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(zero)
            ).alias("_target"),
        )
        .select(
            "region",
            "yr",
            "n_items",
            F.round(F.col("_total"), 2).cast("double").alias("total_revenue"),
            F.round(
                F.col("_target").cast("double") / F.col("_total").cast("double"),
                6,
            ).alias("nation7_share"),
        )
    )


MARKET_SHARE_SQL = """
SELECT r_name AS region,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue,
       ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_7'
                           THEN CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE), 6)
           AS nation7_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
WHERE p_type = 'STANDARD'
GROUP BY 1, 2
"""


def customer_order_distribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-count distribution (TPC-H Q13 family): histogram of
    customers by their number of non-urgent orders, INCLUDING the
    zero-order bucket — the outer-join-then-double-aggregate shape.

    Scale shape: orders aggregate per custkey FIRST (partial counts
    combine map-side, one (custkey, count) shuffle), the customer
    side LEFT-joins on custkey so missing customers survive as count
    0, and the final histogram rollup carries O(distinct counts)
    rows.  No window, no distinct over raw orders."""
    per = (
        src.load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    c = src.load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        c.join(per, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
    )


ORDER_DISTRIBUTION_SQL = """
WITH per AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
SELECT CAST(COALESCE(per.cnt, 0) AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM customer LEFT JOIN per ON c_custkey = o_custkey
GROUP BY 1
"""


def lineitem_bracket_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive-bracket promotion revenue (TPC-H Q19 family): three
    OR'ed (brand, size-range, quantity-range) brackets, reported per
    bracket — the shape where the textbook predicate defeats pushdown.

    Scale shape: Catalyst does NOT derive single-column bounds from an
    OR-of-ANDs spanning both join sides, so the query states the
    derived hulls explicitly — ``p_brand IN (…) AND p_size BETWEEN 1
    AND 15`` lands in the part scan and ``l_quantity BETWEEN 1 AND
    30`` lands in the LINEITEM scan as parquet pushed filters (row
    groups outside the hull never decompress).  The hull-filtered part
    list BROADCASTS; the residual bracket disjunction evaluates
    post-join on the survivors; the only Exchange carries 3 bracket
    partials.  Quantity bounds compare exactly (integral doubles), so
    both engines agree on boundary rows."""
    _B = [
        ("Brand#1", 5, 1, 11),
        ("Brand#2", 10, 10, 20),
        ("Brand#3", 15, 20, 30),
    ]
    p = (
        src.load_table(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin([b for b, *_ in _B])
            & F.col("p_size").between(1, 15)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = _li(spark, sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    ).filter(F.col("l_quantity").between(1, 30))
    bracket = F.lit(None).cast("string")
    cond = F.lit(False)
    for name, (b, smax, qlo, qhi) in zip(["small", "medium", "large"], _B):
        this = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(1, smax)
            & F.col("l_quantity").between(qlo, qhi)
        )
        bracket = F.when(this, F.lit(name)).otherwise(bracket)
        cond = cond | this
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .select(bracket.alias("bracket"), rev.alias("_r"))
        .groupBy("bracket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(F.sum("_r"), 2).cast("double").alias("revenue"),
        )
        .orderBy("bracket")
    )


BRACKET_REVENUE_SQL = """
SELECT CASE WHEN p_brand = 'Brand#1' THEN 'small'
            WHEN p_brand = 'Brand#2' THEN 'medium'
            ELSE 'large' END AS bracket,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
         AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
         AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
         AND l_quantity BETWEEN 20 AND 30)
GROUP BY 1 ORDER BY 1
"""


def customer_returns_ranking_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in one quarter
    (TPC-H Q10 family) — the filter-heavy rank-then-enrich shape.

    Scale shape: BOTH selective filters push to their scans
    (``l_returnflag = 'R'`` kills 2/3 of lineitem row-group-side;
    the quarter range kills ~96% of orders), the surviving fact joins
    on orderkey, and the per-customer rollup happens BEFORE touching
    the wide customer table — the custkey join sees one row per
    qualifying customer, not one per lineitem.  The final rank is a
    distributed top-k (TakeOrderedAndProject) on the EXACT decimal
    revenue with a custkey tiebreak, so the selected 20 are engine-
    independent; rounding happens after selection."""
    li = _li(spark, sf_dir).select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    ).filter(F.col("l_returnflag") == "R")
    o = src.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    ).filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    c = src.load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = src.load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    per_cust = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", rev.alias("_r"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("_r").alias("_rev"),
        )
    )
    return (
        per_cust.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .orderBy(F.col("_rev").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            "n_items",
            F.round(F.col("_rev"), 2).cast("double").alias("revenue"),
        )
    )


RETURNS_RANKING_SQL = """
WITH per_cust AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_items,
         SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,6))) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-07-01'
    AND o_orderdate <  TIMESTAMP '1996-10-01'
  GROUP BY 1)
SELECT c_custkey, c_name, n_name AS nation, n_items,
       CAST(ROUND(rev, 2) AS DOUBLE) AS revenue
FROM per_cust JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
ORDER BY rev DESC, c_custkey LIMIT 20
"""


def part_supplier_diversity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier diversity per part segment (TPC-H Q16 family): how
    many DISTINCT suppliers ship each (p_type, size-band) segment,
    excluding one blacklisted brand and the PROMO type — the
    count-distinct-over-derived-edges shape (the reference corpus has
    no partsupp table; the supplier↔part edge set is derived from the
    fact table, which is what a CDC-fed warehouse does anyway).

    Scale shape: a strictly-shrinking three-stage cascade.  (1) the
    fact projects to 2 key columns and dedups (partkey, suppkey) —
    map-side partial dedup collapses the repeats before the only
    fact-sized Exchange; (2) the tiny filtered part dim BROADCASTS
    onto the edge set and (type, band, suppkey) dedups — the shuffle
    carries edge-set rows, not fact rows; (3) the final count is a
    ≤|types|×|bands| rollup.  No COUNT(DISTINCT) expression ever
    reaches an aggregate — each stage is a plain hash dedup, so every
    stage partial-aggregates map-side (expand-free)."""
    edges = (
        _li(spark, sf_dir).select("l_partkey", "l_suppkey").distinct()
    )
    band = F.floor((F.col("p_size") - 1) / 10).cast("int")
    p = (
        src.load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO"))
        .select("p_partkey", "p_type", band.alias("size_band"))
    )
    return (
        edges.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_type", "size_band", "l_suppkey")
        .distinct()
        .groupBy("p_type", "size_band")
        .agg(F.count(F.lit(1)).cast("long").alias("supplier_cnt"))
        .orderBy("p_type", "size_band")
    )


SUPPLIER_DIVERSITY_SQL = """
WITH edges AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_type, CAST(FLOOR((p_size - 1) / 10) AS INT) AS size_band,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM edges JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
GROUP BY 1, 2 ORDER BY 1, 2
"""


def nation_profit_by_year_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-line profit by supplier nation and order year (TPC-H
    Q9 family) for parts named ``red …``: profit = revenue minus a
    cost proxy (50% of retail price per unit — the corpus has no
    partsupp/supplycost column; the proxy is documented, not hidden).

    Scale shape: the name predicate is a PREFIX match, so it pushes to
    the part scan as ``StringStartsWith`` (a LIKE '%red%' would scan
    every row); the surviving ~1/8 of parts BROADCAST into the
    lineitem scan and cut the fact BEFORE its only shuffle — the
    orderkey Exchange carries pre-filtered 5-column rows.  The
    supplier→nation map broadcasts.  Both profit terms are cast to
    DECIMAL(18,6) per row BEFORE the subtraction and the sum, so
    accumulation is exact in both engines and rounds once at output.
    """
    p = (
        src.load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey", "p_retailprice")
    )
    li = _li(spark, sf_dir).select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    o = src.load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = src.load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sdim = (
        src.load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    profit = (
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,6)")
        - (F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.5))
        .cast("decimal(18,6)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sdim), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "nation",
            F.year("o_orderdate").cast("int").alias("yr"),
            profit.alias("_p"),
        )
        .groupBy("nation", "yr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(F.sum("_p"), 2).cast("double").alias("profit"),
        )
        .orderBy("nation", "yr")
    )


NATION_PROFIT_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,6))
                     - CAST(p_retailprice * l_quantity * 0.5
                            AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE 'red%'
GROUP BY 1, 2 ORDER BY 1, 2
"""


def orders_priority_late_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one line shipped after the order date,
    counted per priority — the EXISTS/semi-join pattern (TPC-H Q4
    family; reference analog: the mismatch EXISTS probes in
    `src/services/reconciliation_engine.py`).

    A LEFT SEMI join keeps each qualifying order exactly once without
    a distinct/dedup step: the join condition carries both the equi
    key (orderkey — the shuffle key) and the non-equi l_shipdate >
    o_orderdate predicate, which Spark evaluates as the SMJ/SHJ
    residual filter, never as a nested loop.  The priority rollup then
    partial-aggregates a 5-key group.  At 100 TB both sides shuffle
    once on orderkey; lineitem prunes to (l_orderkey, l_shipdate) at
    the scan."""
    o = src.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _li(spark, sf_dir).select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )


PRIORITY_LATE_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY 1
"""


def part_min_cost_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest supplier per part by exact total billed price — the
    min-cost-supplier selection (TPC-H Q2 family, re-keyed to the
    lineitem fact since this schema has no partsupp).

    Per (part, supplier) totals accumulate as DECIMAL through one
    partial-aggregated shuffle; the per-part argmin is a row_number
    window whose (partkey) partitioning REUSES the aggregate's hash
    partitioning when AQE coalesces compatibly — and the ordering key
    is the exact decimal total with suppkey tiebreak, so the pick is
    deterministic in both engines (a rounded-double ordering would
    not be).  Output is one row per part appearing in lineitem."""
    from pyspark.sql import Window

    li = _li(spark, sf_dir).select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    per = (
        li.select(
            "l_partkey",
            "l_suppkey",
            F.col("l_extendedprice").cast("decimal(18,6)").alias("_p"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("_p").alias("_tot"),
        )
    )
    # r16: the per-part argmin is a MIN over lexicographically-ordered
    # structs — identical pick to the old row_number()==1 window
    # (struct comparison orders by _tot asc then l_suppkey asc, the
    # same key, and (_tot, l_suppkey) is unique per part so n_items
    # never tiebreaks).  An aggregate partial-aggregates map-side and
    # needs no Sort, where the window shape sorted every partition and
    # shipped every (part, supplier) row through the partkey exchange;
    # at scale a hot part degrades a window task but folds fine in a
    # partial min.
    best = per.groupBy("l_partkey").agg(
        F.min(F.struct("_tot", "l_suppkey", "n_items")).alias("_b")
    )
    return best.select(
        "l_partkey",
        F.col("_b.l_suppkey").alias("best_suppkey"),
        F.col("_b.n_items").alias("n_items"),
        F.round(F.col("_b._tot").cast("double"), 2).alias("total_price"),
    )


MIN_COST_SUPPLIER_SQL = """
WITH per AS (
  SELECT l_partkey, l_suppkey,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS tot
  FROM lineitem GROUP BY 1, 2),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey
                               ORDER BY tot ASC, l_suppkey ASC) AS rn
  FROM per)
SELECT l_partkey, l_suppkey AS best_suppkey, n_items,
       ROUND(CAST(tot AS DOUBLE), 2) AS total_price
FROM ranked WHERE rn = 1
"""


def customer_value_deciles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value deciles: rank customers by exact total
    spend, NTILE into 10 tiers, and profile each tier — the
    whale-curve rollup behind "top 10% of customers = X% of revenue".

    Spend per customer is one partial-aggregated shuffle with DECIMAL
    accumulation.  Decile assignment reproduces NTILE(10) EXACTLY but
    with NO unpartitioned window (the r6 form's global ``ntile`` put
    every customer in one task — the anti-pattern at 1e9+ customers):

    1. ``frozen_range_pid(spend, (spend desc, custkey))`` gives
       partitions that are globally ordered partition-to-partition
       AND frozen (lazy localCheckpoint — see its docstring): the
       rank branch and the counts branch below MUST read the
       identical partitioning, and without the freeze each branch
       compiled its own range Exchange whose RangePartitioner sampled
       boundaries independently (r8 ADVICE, high — boundary-tied rows
       could land in different ``_pid``s per branch at scale,
       silently corrupting the global rank).  A window PARTITIONED on
       the range-partition id then emits the partition-LOCAL row
       number — per-task state is one range slice, never the full key
       set, so the shape survives 100×.
    2. Global rank = local row number + prefix offset.  The offsets
       come from the per-partition counts (O(#partitions) rows) via a
       broadcast cross join of that tiny relation with itself —
       32×32 rows, constant at any SF — which also yields the grand
       total, so NTILE's tile sizes are closed-form columns (exact
       integer arithmetic: (a - a%b)/b with a made divisible).

    ONE driver action, nothing persisted (the r7 form's persist
    leaked in long-lived sessions — r7 ADVICE); the only build-time
    work is the range-boundary sampling the shuffle dependency always
    pays, and the spend aggregate now feeds the shuffle write ONCE
    instead of once per branch (the r8 form re-ran it 3×).  The
    ordering key (spend DESC, custkey) is total, so tier edges are
    deterministic in both engines; the final 10-row rollup
    partial-aggregates per tier."""
    from cass_cdc_pg_spark.operators.windows import frozen_range_pid

    o = src.load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(18,6)").alias("_p")
    )
    spend = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("_n"), F.sum("_p").alias("_s")
    )
    order = [F.col("_s").desc(), F.col("o_custkey").asc()]
    ranged = frozen_range_pid(spend, order)
    from pyspark.sql import Window

    w = Window.partitionBy("_pid").orderBy(*order)
    rows = ranged.withColumn("_rn", F.row_number().over(w).cast("long"))
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.crossJoin(F.broadcast(b))
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(
            F.sum(
                F.when(
                    F.col("b._pid") < F.col("a._pid"), F.col("b._c")
                ).otherwise(F.lit(0))
            ).alias("_offset"),
            F.sum("b._c").alias("_total"),
        )
    )

    def _idiv(x, y):  # exact long division: numerator made divisible
        return ((x - x % y) / y).cast("long")

    n_total = F.col("_total")
    size_lo = _idiv(n_total, F.lit(10))
    big = n_total % 10
    size_hi = size_lo + 1
    cutoff = big * size_hi  # last rank covered by the big tiles
    rank = F.col("_offset") + F.col("_rn")
    decile = (
        F.when(size_lo == 0, rank)
        .when(rank <= cutoff, _idiv(rank - 1, size_hi) + 1)
        .otherwise(big + _idiv(rank - cutoff - 1, size_lo) + 1)
    )
    return (
        rows.join(F.broadcast(offsets), "_pid")
        .withColumn("decile", decile.cast("int"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("_n").cast("long").alias("n_orders"),
            F.round(F.sum("_s").cast("double"), 2).alias("total_spend"),
            F.round(F.min("_s").cast("double"), 2).alias("min_spend"),
            F.round(F.max("_s").cast("double"), 2).alias("max_spend"),
        )
    )


VALUE_DECILES_SQL = """
WITH spend AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS s
  FROM orders GROUP BY 1),
tiered AS (
  SELECT *, CAST(NTILE(10) OVER (ORDER BY s DESC, o_custkey ASC) AS INT)
            AS decile
  FROM spend)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(n) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(s) AS DOUBLE), 2) AS total_spend,
       ROUND(CAST(MIN(s) AS DOUBLE), 2) AS min_spend,
       ROUND(CAST(MAX(s) AS DOUBLE), 2) AS max_spend
FROM tiered GROUP BY 1
"""


def sales_returns_by_brand_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lost revenue from returned items per part brand (TPC-H Q10
    family re-keyed to the part dim): the returns post-mortem rollup.

    The `l_returnflag = 'R'` predicate pushes to the parquet scan
    (min/max row-group pruning on the flag column), part (SF-small)
    broadcasts, revenue accumulates as DECIMAL through one brand-keyed
    partial-aggregated shuffle.  At 100 TB the filter cuts the scan to
    the returned fraction before any join or shuffle sees a row."""
    li = _li(spark, sf_dir).select(
        "l_partkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    p = src.load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", rev.alias("_r"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_returned"),
            F.round(F.sum("_r").cast("double"), 2).alias("lost_revenue"),
        )
    )


RETURNS_BY_BRAND_SQL = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_returned,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE), 2) AS lost_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_returnflag = 'R'
GROUP BY 1
"""


def segment_status_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order revenue by market segment × order status (TPC-H Q3
    family): the one genuinely BIG-BIG join in the star — customer is
    SF-proportional (~1e9 rows at 100 TB), so it does NOT broadcast;
    both sides shuffle once on custkey and every downstream stat
    partial-aggregates into a 15-cell grid.

    The projection is pruned to two columns per side before the
    Exchange, so the shuffle carries ~30-byte rows; with AQE on, a
    skewed segment (the reference's hot-table case, `plan.md:840-849`)
    splits at runtime — and `operators/skew.salted_join` is the
    explicit fallback when it doesn't."""
    o = src.load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,6)").alias("_p"),
    )
    c = src.load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("_p").cast("double"), 2).alias("revenue"),
        )
    )


SEGMENT_STATUS_SQL = """
SELECT c_mktsegment, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2)
         AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
"""


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def lineitem_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of lineitem's measures — see
    ``operators/profile.py`` for the scale argument (unpivot +
    two-phase distinct rollup instead of an Expand×5 into one wide
    reducer row)."""
    from cass_cdc_pg_spark.operators import profile

    li = _li(spark, sf_dir)
    return profile.profile_columns(li, _PROFILE_COLS)


LINEITEM_PROFILE_SQL = """
WITH u AS (
  SELECT 'l_quantity' AS col_name, l_quantity AS v FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
SELECT col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
       MIN(v) AS min_v,
       MAX(v) AS max_v,
       ROUND(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_v
FROM u GROUP BY 1
"""


def orders_fulfillment_lag_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship fulfillment lag per priority (TPC-H Q12 family,
    adapted to this schema's date columns): per priority, item count,
    exact total/max lag in days, and the count shipped >90 days after
    the order — the SLA breach rollup.

    All outputs are exact integers (sums of day diffs), so the oracle
    hash has no float-rounding surface.  At 100 TB both sides shuffle
    once on orderkey (orders is SF-proportional — no broadcast), both
    scans prune to 2-3 columns, and the rollup partial-aggregates to
    a 5-row grid."""
    o = src.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _li(spark, sf_dir).select("l_orderkey", "l_shipdate")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_orderpriority", lag.alias("_lag"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("_lag").cast("long").alias("total_lag_days"),
            F.max("_lag").cast("long").alias("max_lag_days"),
            F.sum((F.col("_lag") > 90).cast("long")).cast("long").alias("n_late_90d"),
        )
    )


FULFILLMENT_LAG_SQL = """
WITH j AS (
  SELECT o_orderpriority,
         datediff('day', CAST(o_orderdate AS DATE),
                  CAST(l_shipdate AS DATE)) AS lag
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(lag) AS BIGINT) AS total_lag_days,
       CAST(MAX(lag) AS BIGINT) AS max_lag_days,
       CAST(SUM(CASE WHEN lag > 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_90d
FROM j GROUP BY 1
"""


def customer_order_recency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency profile per market segment: days since each customer's
    last order, measured against the corpus max date — churn-risk
    rollup.

    The anchor date is a SCALAR aggregate broadcast back — never a
    window.  Its branch scans exactly ONE column (o_orderdate,
    columnar; a stats-only read once parquet aggregate pushdown is on)
    and moves one row per partition through a single-partition
    exchange — the correct scalar shape, vs. funnelling every
    customer through an unpartitioned window.  customer is
    SF-proportional so the customer⋈per-customer-aggregate join is a
    plain equi join on custkey; all outputs are exact integer day
    sums."""
    o = src.load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    last = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("_last"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("_mx"))
    cust = src.load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    rec = F.datediff(F.col("_mx"), F.col("_last"))
    return (
        last.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(anchor))
        .select("c_mktsegment", "_n", rec.alias("_rec"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("_n").cast("long").alias("n_orders"),
            F.sum("_rec").cast("long").alias("total_recency_days"),
            F.max("_rec").cast("long").alias("max_recency_days"),
            F.sum((F.col("_rec") > 30).cast("long")).cast("long").alias("n_stale_30d"),
        )
    )


ORDER_RECENCY_SQL = """
WITH last AS (
  SELECT o_custkey, MAX(o_orderdate) AS last_dt,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1),
r AS (
  SELECT c_mktsegment, n,
         datediff('day', CAST(last_dt AS DATE),
                  CAST((SELECT MAX(o_orderdate) FROM orders) AS DATE)) AS rec
  FROM last JOIN customer ON o_custkey = c_custkey)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(n) AS BIGINT) AS n_orders,
       CAST(SUM(rec) AS BIGINT) AS total_recency_days,
       CAST(MAX(rec) AS BIGINT) AS max_recency_days,
       CAST(SUM(CASE WHEN rec > 30 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stale_30d
FROM r GROUP BY 1
"""


def lineitem_revenue_forecast_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-change forecast (TPC-H Q6): the what-if sum of
    ``extendedprice * discount`` over a year of shipments in a
    discount band with small quantities — the classic
    filter-pushdown showcase.

    All three predicates reach the parquet scan (PushedFilters →
    row-group min/max pruning); the aggregate is a scalar DECIMAL
    partial-sum — at 100 TB the scan reads only matching row groups
    of three columns and moves one partial row per partition."""
    li = _li(spark, sf_dir).select(
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    )
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(F.sum(rev).cast("double"), 2).alias("forecast_revenue"),
        )
    )


REVENUE_FORECAST_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                  AS DOUBLE), 2) AS forecast_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


def sales_promo_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share per month (TPC-H Q14): what fraction of
    each month's discounted revenue came from PROMO-type parts.

    part (SF-small vs lineitem) broadcasts; both revenue sums
    accumulate as DECIMAL through one month-keyed partial-aggregated
    shuffle; the share divides at the end as double.  At 100 TB the
    fact side shuffles once into a ≤84-cell month grid."""
    li = _li(spark, sf_dir).select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    p = src.load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.year("l_shipdate").cast("int").alias("yr"),
            F.month("l_shipdate").cast("int").alias("mo"),
            rev.alias("_rev"),
            promo.alias("_promo"),
        )
        .groupBy("yr", "mo")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(F.sum("_rev").cast("double"), 2).alias("revenue"),
            F.round(F.sum("_promo").cast("double"), 2).alias("promo_revenue"),
            F.round(
                F.sum("_promo").cast("double") / F.sum("_rev").cast("double"),
                6,
            ).alias("promo_share"),
        )
    )


PROMO_SHARE_SQL = """
WITH j AS (
  SELECT CAST(year(l_shipdate) AS INT) AS yr,
         CAST(month(l_shipdate) AS INT) AS mo,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS rev,
         CASE WHEN p_type = 'PROMO'
              THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
              ELSE CAST(0 AS DECIMAL(18,6)) END AS promo
  FROM lineitem JOIN part ON l_partkey = p_partkey)
SELECT yr, mo,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS revenue,
       ROUND(CAST(SUM(promo) AS DOUBLE), 2) AS promo_revenue,
       ROUND(CAST(SUM(promo) AS DOUBLE) / CAST(SUM(rev) AS DOUBLE), 6)
           AS promo_share
FROM j GROUP BY 1, 2
"""


def lineitem_discount_bands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by (discount band × return flag) — a bounded 2-D
    histogram rollup (the pricing-sensitivity grid).

    The band is integer bucket arithmetic on the scan projection (no
    UDF), the grid is ≤ 33 cells, and every measure is an exact
    DECIMAL/era-integer partial aggregate — the bounded-state shape
    that survives any scale."""
    li = _li(spark, sf_dir).select(
        "l_discount", "l_returnflag", "l_extendedprice", "l_quantity"
    )
    band = F.floor(F.col("l_discount") * 100).cast("int")
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    return (
        li.select(
            band.alias("discount_pct"),
            "l_returnflag",
            rev.alias("_rev"),
            F.col("l_quantity").cast("decimal(18,6)").alias("_qty"),
        )
        .groupBy("discount_pct", "l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(F.sum("_qty").cast("double"), 2).alias("total_qty"),
            F.round(F.sum("_rev").cast("double"), 2).alias("revenue"),
        )
    )


DISCOUNT_BANDS_SQL = """
SELECT CAST(FLOOR(l_discount * 100) AS INT) AS discount_pct,
       l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2)
           AS total_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
FROM lineitem
GROUP BY 1, 2
"""


def sales_promo_bundles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive bundle pricing (TPC-H Q19 family): revenue from
    three OR'd (brand, size-range, quantity-range) bundles, computed
    in one lineitem⋈part pass — the canonical OR-of-ANDs predicate
    whose part-side conjuncts must still prune.

    Scale shape: the part-only disjunction (brand ∈ {1,2,3} ∨-chains
    with size ranges) pushes to the part SCAN, the surviving part
    rows BROADCAST, and the residual mixed predicate (quantity ×
    brand) evaluates on the join output — one fact pass, zero
    shuffles before the single-row aggregate.  Revenue is DECIMAL
    accumulation (the module's exact-sum discipline); per-bundle
    splits come from conditional sums INSIDE the one aggregate (the
    Q8-family pattern), so the disjunction is audited bundle by
    bundle."""
    li = _li(spark, sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = (
        src.load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_brand", "p_size")
        .filter(
            ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15))
            | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30))
            | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(25, 50))
        )
    )
    b1 = (F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 20)
    b2 = (F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 30)
    b3 = (F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 50)
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(b1 | b2 | b3)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            # DECIMAL accumulation (exact), DOUBLE on the way out: the
            # driver's pandas canonicalizer is decimal-unsafe
            # (tests/test_oracle_dtypes), and casting the identical
            # exact decimal gives the identical double in both engines
            F.sum(rev).cast("double").alias("revenue"),
            F.sum(F.when(b1, rev).otherwise(zero))
            .cast("double")
            .alias("rev_bundle1"),
            F.sum(F.when(b2, rev).otherwise(zero))
            .cast("double")
            .alias("rev_bundle2"),
            F.sum(F.when(b3, rev).otherwise(zero))
            .cast("double")
            .alias("rev_bundle3"),
        )
    )


PROMO_BUNDLES_SQL = """
WITH j AS (
  SELECT p.p_brand, l.l_quantity,
         CAST(l.l_extendedprice * (1.0 - l.l_discount)
              AS DECIMAL(18,6)) AS rev,
         (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 20) AS b1,
         (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 30) AS b2,
         (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 50) AS b3
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15)
     OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30)
     OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 25 AND 50))
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(rev) AS DOUBLE) AS revenue,
       CAST(SUM(CASE WHEN b1 THEN rev ELSE CAST(0 AS DECIMAL(18,6)) END)
            AS DOUBLE) AS rev_bundle1,
       CAST(SUM(CASE WHEN b2 THEN rev ELSE CAST(0 AS DECIMAL(18,6)) END)
            AS DOUBLE) AS rev_bundle2,
       CAST(SUM(CASE WHEN b3 THEN rev ELSE CAST(0 AS DECIMAL(18,6)) END)
            AS DOUBLE) AS rev_bundle3
FROM j
WHERE b1 OR b2 OR b3
"""


def _copurchase_pair_counts(li: DataFrame, count_alias: str) -> DataFrame:
    """Shared pair-count pipeline of the exact copurchase query and
    its r16 heavy-hitter sketch: per-order parts collapse to ONE
    sorted ``collect_set`` array, i<j pairs emit MAP-SIDE from the
    array, counts aggregate on the pair key — exactly two Exchanges
    (orderkey, then (p1, p2)).  Factored so the two entries cannot
    drift; the exact query's plan is expression-identical to its
    r15 form."""
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("_parts"))
        .filter(F.size("_parts") >= 2)
    )
    pairs = F.expr(
        """
        flatten(transform(_parts, (x, i) ->
          transform(slice(_parts, i + 2, size(_parts)), y ->
            struct(x AS p1, y AS p2))))
        """
    )
    return (
        per_order.select(F.explode(pairs).alias("_pr"))
        .groupBy(
            F.col("_pr.p1").alias("p1"), F.col("_pr.p2").alias("p2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias(count_alias))
    )


def lineitem_part_copurchase_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: the 20 part pairs most often bought
    in the same order (pair key ordered p1 < p2, ties → lowest pair).

    Scale shape (rewritten r15, r14 verdict #3 — the distinct-then-
    self-join build was ~45% of the 100× wall and pushed the decade
    ratio to 6.21): per-order parts collapse to ONE sorted distinct
    array in a single aggregation (``collect_set`` dedupes inside the
    partial-agg hash map, so the (orderkey, partkey) relation never
    materialises and the order table is scanned ONCE, not twice), the
    i<j pair combinations are emitted MAP-SIDE from the array
    (bounded by per-order line count — ≤7 in TPC-H — never
    corpus-quadratic), and pair counts aggregate on the pair key.
    Exactly two shuffles end to end — orderkey, then (p1, p2) — vs
    the old plan's distinct + join + pair-agg chain; the global
    top-20 stays TakeOrdered (per-partition heads + driver merge),
    NOT a single-partition window.  ``sort_array`` makes the
    combination order canonical so every emitted struct already has
    p1 < p2 (collect_set order is partition-nondeterministic)."""
    return (
        _copurchase_pair_counts(_li(spark, sf_dir), "n_orders")
        .orderBy(F.col("n_orders").desc(), F.col("p1").asc(), F.col("p2").asc())
        .limit(20)
    )


COPURCHASE_SQL = """
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM lp a JOIN lp b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, p1 ASC, p2 ASC
LIMIT 20
"""


#: heavy-hitter sketch sampling (r15 verdict #2 disposition (a)): the
#: exact pair count's 100× wall is its own OUTPUT volume (120 M
#: emitted pairs at a constant ~8.8 pairs/order — linear-in-pairs by
#: construction, no plan inefficiency left to remove), so the ROUTINE
#: cadence runs a deterministic basket-sampled estimate and the exact
#: count moves to the audit budget (the dedup_containment_pairs
#: precedent).  Orders are sampled by the same multiplicative-hash
#: draw family as the corpus carve-out (pmod shape, engine-identical
#: by construction — no md5 needed on an integer key), the pair
#: pipeline runs on the kept baskets only (the filter lands at the
#: scan, BEFORE both Exchanges, so shuffle and pair-emission volume
#: drop by the sampling factor), and counts scale back by the exact
#: rational MOD/t in integer arithmetic.
_COPURCHASE_SAMPLE_MOD = 10_000
_COPURCHASE_SAMPLE_MULT = 48_271
#: expected sampled-order budget: below this many orders the draw
#: keeps everything (t = MOD — a no-op guard at the sf0.001/sf0.01
#: gate fixtures and even sf0.1, MODELED in the oracle per the
#: stop-shingle convention so correctness is never scale-dependent);
#: at 100× scale_proof (~15 M orders) t ≈ 33 → ~0.3% of baskets.
_COPURCHASE_SAMPLE_TARGET = 50_000
_COPURCHASE_SKETCH_K = 50

_COPURCHASE_T_CACHE: dict[tuple[str, int], int] = {}


def _copurchase_sample_threshold(sf_dir: str) -> int:
    """Integer draw threshold t: keep an order iff its draw < t, so
    ~t/MOD of baskets survive; t is sized driver-side from the orders
    row count (parquet footer metadata only — no engine runs) and
    shipped as a LITERAL to both the Spark plan and the generated
    DuckDB oracle, per-fixture-cached like the IVF literals."""
    key = _reg._fixture_key(sf_dir, "orders")
    if key not in _COPURCHASE_T_CACHE:
        import pyarrow.dataset as ds

        n_orders = ds.dataset(src.table_path(sf_dir, "orders")).count_rows()
        _COPURCHASE_T_CACHE[key] = min(
            _COPURCHASE_SAMPLE_MOD,
            max(
                1,
                (_COPURCHASE_SAMPLE_TARGET * _COPURCHASE_SAMPLE_MOD)
                // max(1, n_orders),
            ),
        )
    return _COPURCHASE_T_CACHE[key]


def _copurchase_sketch(li: DataFrame, t: int, k: int) -> DataFrame:
    """Sketch core over a lineitem relation, threshold t baked as a
    literal (unit-testable at forced-small t — the containment
    property test drives this directly)."""
    m, mult = _COPURCHASE_SAMPLE_MOD, _COPURCHASE_SAMPLE_MULT
    draw = F.pmod(
        F.pmod(F.col("l_orderkey"), F.lit(m)) * F.lit(mult), F.lit(m)
    )
    sampled = li.filter(draw < F.lit(t))
    return (
        _copurchase_pair_counts(sampled, "n_sampled")
        .select(
            "p1",
            "p2",
            "n_sampled",
            F.expr(f"CAST(n_sampled * {m} DIV {t} AS BIGINT)").alias(
                "est_n_orders"
            ),
        )
        .orderBy(F.col("n_sampled").desc(), F.col("p1").asc(), F.col("p2").asc())
        .limit(k)
    )


def lineitem_copurchase_sketch_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Routine-cadence approximate co-purchase heavy hitters (new
    r16): top-K part pairs by basket count over a deterministic
    ~TARGET-order hash sample, with the integer-exact scale-back
    estimate.  Estimator: sampling whole BASKETS keeps every pair's
    occurrences within a kept order intact, so a pair's sampled count
    is Binomial(c, t/MOD) concentrating at c·t/MOD — heavy hitters
    (the only rows this query exists to surface) survive with
    probability → 1 (``test_sketches.py`` pins containment of the
    exact top-20 in the sketch top-K under a forced-small t on a
    heavy-hitter corpus, and exact-equality at t = MOD).  Scale
    shape: identical two-Exchange plan to the exact query with the
    draw filter BEFORE the first shuffle — at 100× the emitted-pair
    volume term that bounds the exact count drops by the sampling
    factor, which is the disposition the r15 verdict prescribed for
    the one `weak` row.  Reference posture: SAMPLE-type validation
    (`validation_service.py` SC-003's deterministic sample check) at
    the analytics tier."""
    return _copurchase_sketch(
        _li(spark, sf_dir),
        _copurchase_sample_threshold(sf_dir),
        _COPURCHASE_SKETCH_K,
    )


def _copurchase_sketch_sql(t: int, k: int) -> str:
    m, mult = _COPURCHASE_SAMPLE_MOD, _COPURCHASE_SAMPLE_MULT
    return f"""
WITH lp AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE ((l_orderkey % {m} + {m}) % {m} * {mult}) % {m} < {t}),
pc AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(COUNT(*) AS BIGINT) AS n_sampled
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2)
SELECT p1, p2, n_sampled,
       CAST(n_sampled * {m} // {t} AS BIGINT) AS est_n_orders
FROM pc
ORDER BY n_sampled DESC, p1 ASC, p2 ASC
LIMIT {k}
"""


def copurchase_sketch_oracle_sql(
    sf_dir: str = "/root/testdata/sf0.01",
) -> str | None:
    """Generated oracle twin of ``lineitem_copurchase_sketch`` — the
    same draw, threshold literal, integer scale-back, and ordering in
    DuckDB (the guard is modeled even where it is a no-op, the
    stop-shingle convention)."""
    try:
        t = _copurchase_sample_threshold(sf_dir)
    except OSError:
        return None
    return _copurchase_sketch_sql(t, _COPURCHASE_SKETCH_K)
