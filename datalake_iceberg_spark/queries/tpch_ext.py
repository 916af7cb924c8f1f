"""TPC-H shapes q2/q8/q9/q12/q13/q15/q16/q17/q20/q21 adapted to the
TESTDATA star schema (no partsupp / commitdate / shipmode columns, so
part↔supplier linkage goes through lineitem and the date/mode predicates
use columns the data carries — the join/subquery SHAPE of each query is
preserved exactly).

Oracle-parity rules are the same as ``analytics.py``: money in exact
integer cents, thresholds that TPC-H states as fractions (0.2·avg in
q17, 50% of stock in q20) are cross-multiplied into pure int64
comparisons (``5·qty·cnt < sum_qty``) so no float rounding can diverge
between Spark and DuckDB.

Scale notes (100 TB design point): every query keeps the fact table
(lineitem) as the probe side; part/supplier/nation/region broadcast at
any SF; the correlated "per-group threshold" subqueries (q2 min, q15
max, q17 avg, q20 share, q21 exists/anti) are expressed as a single
partial-agg shuffle + window or self-agg-join on the same key, never a
per-row subquery. Reference anchor: the reference has no explicit
relational joins (SURVEY §2.4) — these queries are the beyond-reference
analytic surface over the same DataFrame substrate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_iceberg_spark.queries import load
from datalake_iceberg_spark.queries.analytics import cents, cents_sql

_REV_C = lambda: cents("l_extendedprice") * (100 - cents("l_discount"))  # noqa: E731
_REV_C_SQL = f"{cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})"


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: min-cost supplier per part within a region. The
    correlated MIN subquery becomes a window min over one partial-agg
    pass; "supply cost" = cheapest extended price the supplier ever
    shipped that part for (lineitem is the partsupp stand-in)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    li = load(spark, sf_dir, "lineitem")
    offers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(cents("l_extendedprice")).alias("cost_c"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("min_cost_c", F.min("cost_c").over(w))
        .filter(F.col("cost_c") == F.col("min_cost_c"))
        .select(
            (cents("s_acctbal").cast("double") / 100.0).alias("s_acctbal"),
            "s_name", "n_name", "p_partkey", "p_name",
            (F.col("cost_c").cast("double") / 100.0).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = f"""
WITH offers AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         MIN({cents_sql('l_extendedprice')}) AS cost_c
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_size = 15 AND r_name = 'EUROPE'
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT CAST({cents_sql('s_acctbal')} AS DOUBLE) / 100.0 AS s_acctbal,
       s_name, n_name, p_partkey, p_name,
       CAST(cost_c AS DOUBLE) / 100.0 AS supply_cost
FROM (SELECT *, MIN(cost_c) OVER (PARTITION BY p_partkey) AS min_cost_c FROM offers)
WHERE cost_c = min_cost_c
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: national market share — NATION_1's slice of PROMO-part
    revenue sold into ASIA customers, per year. Two nation legs like Q7;
    the share ratio divides two exact-cents sums."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cust = load(spark, sf_dir, "customer")
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev_c = _REV_C()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        # customer is SF-proportional — shuffle-join it (broadcasting it
        # would OOM at the 100 TB design point; AQE may still elect a
        # broadcast at small SF where it fits)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", rev_c).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(rev_c).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       ROUND(
         CAST(SUM(CASE WHEN n2.n_name = 'NATION_1' THEN {_REV_C_SQL} ELSE 0 END) AS DOUBLE)
         / CAST(SUM({_REV_C_SQL}) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN part      ON l_partkey = p_partkey
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY 1
"""


def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation × year. Cost side uses
    p_retailprice (the partsupp supplycost stand-in); both terms land in
    the same 10^-4-dollar integer unit before summing."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    profit_c = _REV_C() - cents("p_retailprice") * cents("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg((F.sum(profit_c).cast("double") / 10000.0).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       CAST(SUM({_REV_C_SQL} - {cents_sql('p_retailprice')} * {cents_sql('l_quantity')}) AS DOUBLE)
         / 10000.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'STANDARD'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose shipped value from one nation's suppliers
    exceeds a fraction (1/10000) of that nation's total — the group-vs-
    global-scalar HAVING. The threshold test is an int64 cross-multiply
    (``value·10000 > total``), and the 1-row total broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    national = li.join(
        F.broadcast(
            sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
            .select("s_suppkey")
        ),
        li.l_suppkey == F.col("s_suppkey"),
    )
    per_part = national.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(cents("l_extendedprice")).alias("value_c")
    )
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_c") * 10000 > F.col("total_c"))
        .select(
            "p_partkey", (F.col("value_c").cast("double") / 100.0).alias("value")
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey AS p_partkey, SUM({cents_sql('l_extendedprice')}) AS value_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY 1
)
SELECT p_partkey, CAST(value_c AS DOUBLE) / 100.0 AS value
FROM per_part
WHERE value_c * 10000 > (SELECT SUM(value_c) FROM per_part)
ORDER BY value DESC, p_partkey
"""


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional counts of critical-priority orders per
    line status (shipmode stand-in) for one ship year."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of orders-per-customer including the
    zero-order bucket — the left-outer-join + double-aggregation plan.
    First agg shuffles on c_custkey, second on the (small) count value."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the global max quarterly revenue.
    The scalar MAX subquery is a 1-row broadcast; equality is tested on
    exact cents, never on a rounded double."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    sup = load(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_REV_C()).alias("total_revenue_c"))
    )
    top = revenue.agg(F.max("total_revenue_c").alias("max_revenue_c"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue_c") == F.col("max_revenue_c"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            (F.col("total_revenue_c").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, SUM({_REV_C_SQL}) AS total_revenue_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue_c AS DOUBLE) / 10000.0 AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_c = (SELECT MAX(total_revenue_c) FROM revenue)
ORDER BY s_suppkey
"""


def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per part attribute triple, with a
    NOT-IN supplier exclusion (low-balance suppliers stand in for the
    complaint filter). countDistinct shuffles once on the triple."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 4, 7, 10, 14, 23)
    )
    excluded = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_size IN (1, 4, 7, 10, 14, 23)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue lost to small orders — lineitems below
    0.2 × the part's average quantity. The correlated AVG becomes a
    per-part partial agg joined back; ``qty < 0.2·(sum/cnt)`` is
    cross-multiplied to ``5·qty_c·cnt < sum_qty_c·100 / 100`` i.e.
    pure int64 ``5·qty_c·cnt < sum_qty_c`` — zero float divergence."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(cents("l_quantity")).alias("sum_qty_c"),
            F.count("*").alias("cnt"),
        )
    )
    return (
        li.join(F.broadcast(per_part), on="l_partkey")
        .filter(cents("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty_c"))
        .agg(
            (F.sum(cents("l_extendedprice")).cast("double") / 100.0 / 7.0).alias("avg_yearly")
        )
    )


Q17_SQL = f"""
WITH per_part AS (
  SELECT l_partkey AS pk, SUM({cents_sql('l_quantity')}) AS sum_qty_c, COUNT(*) AS cnt
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
  GROUP BY 1
)
SELECT CAST(SUM({cents_sql('l_extendedprice')}) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
FROM lineitem JOIN per_part ON l_partkey = pk
WHERE {cents_sql('l_quantity')} * 5 * cnt < sum_qty_c
"""


def q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers holding a dominant share (>25%) of any
    SMALL-type part's 1997 shipments, in one nation. Share test is
    ``4·supp_qty > total_qty`` in int64. Two aggs on the same
    (partkey[,suppkey]) keys, then a semi-join to supplier."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    shipped = li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
    per_ps = shipped.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(cents("l_quantity")).alias("supp_qty_c")
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_ps.withColumn("total_qty_c", F.sum("supp_qty_c").over(w))
        .filter(F.col("supp_qty_c") * 4 > F.col("total_qty_c"))
        .select("l_suppkey")
    )
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(dominant, sup.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = f"""
WITH per_ps AS (
  SELECT l_partkey, l_suppkey, SUM({cents_sql('l_quantity')}) AS supp_qty_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'SMALL'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
),
dominant AS (
  SELECT l_suppkey
  FROM (SELECT *, SUM(supp_qty_c) OVER (PARTITION BY l_partkey) AS total_qty_c FROM per_ps)
  WHERE supp_qty_c * 4 > total_qty_c
)
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3' AND s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_suppkey
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers solely responsible for a fault on a
    multi-supplier order (returnflag 'R' stands in for late receipt).
    The classic EXISTS/NOT-EXISTS pair over lineitem self-joins
    collapses to aggregation: the order qualifies iff it has >1
    distinct suppliers and exactly one distinct faulty supplier.

    Two-level agg — (order, supplier) dedup first, then per-order
    counts — instead of two countDistinct over lineitem: multiple
    distinct-aggregates plan as an Expand (×3 row blowup on the fact
    table); the explicit dedup level halves wall time at sf0.1 and the
    gap widens with fact size."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    per_os = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("faulty"))
    )
    per_order = (
        per_os.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.sum("faulty").alias("n_faulty"),
            F.max(F.when(F.col("faulty") == 1, F.col("l_suppkey"))).alias("faulty_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_faulty") == 1))
    )
    return (
        per_order.join(
            F.broadcast(sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)),
            per_order.faulty_supp == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_faulty,
         MAX(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS faulty_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1
)
SELECT s_name, COUNT(*) AS numwait
FROM per_order
JOIN supplier ON faulty_supp = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_supp > 1 AND n_faulty = 1 AND n_name = 'NATION_2'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""
