"""Advanced relational surface: semi/anti joins, decorrelated subqueries,
rollup/cube, window running totals, set operations.

The reference engine (elastic/mito) has none of these — no joins or
grouping exist there (SURVEY.md §2.2 join/aggregation notes); they are
the "natural Spark extensions" the north star asks for, shaped after
TPC-H queries the synthetic star schema can express (no partsupp /
commitdate columns, so Q2/Q4/Q17/Q21 shapes are adapted).

Shared scale posture (same rules as relational.py):
  - money sums go through DECIMAL(18,4) then cast to double at the end,
    so reduce order / partitioning can never change the answer;
  - nation/region always broadcast; semi/anti joins let Catalyst pick
    broadcast vs shuffle (LeftSemi/LeftAnti both support broadcast);
  - decorrelated aggregates (q17) compute the per-group aggregate once
    and join it back — one extra shuffle instead of a per-row subquery;
  - rollup/cube are single-pass partial aggregates with grouping-set
    expansion, not N separate scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mito_spark.engine import load_table


def _dec(col, scale: int = 4):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def _rev():
    # built lazily: Column construction needs an active SparkContext
    return _dec("l_extendedprice") * (1 - _dec("l_discount"))


def q4_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join: count orders per priority that have at
    least one returned lineitem. The semi join never materializes
    lineitem columns and short-circuits per key; Catalyst broadcasts
    the filtered build side when it fits, else shuffles on orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    year. nation is joined twice (supplier side, customer side) — both
    broadcast; the disjunctive nation-pair predicate prunes before the
    fact joins."""
    # the OR pair-predicate can't be pushed per-table by Catalyst, but
    # its necessary condition (nation ∈ {1,2}) can be applied manually
    # to BOTH dimension sides before the fact joins — supplier/customer
    # shrink ~12.5× each before touching lineitem/orders
    pair_nations = ("NATION_1", "NATION_2")
    n1 = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair_nations)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair_nations)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    supp2 = supp.join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
    cust2 = cust.join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
    return (
        li.join(supp2, li.l_suppkey == supp2.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust2, orders.o_custkey == cust2.c_custkey)
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         YEAR(l_shipdate) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS vol
  FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q10_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by revenue lost to returns in
    one quarter. TakeOrderedAndProject keeps the top-N without a global
    sort; nation broadcast decorates after the aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q12_priority_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional (CASE) aggregation — high- vs
    low-priority line counts per linestatus for one ship year. The
    CASE folds into the partial aggregate; one scan, one tiny shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer including
    zero-order customers — left outer join, two-level aggregate. The
    outer join preserves customers with no (non-urgent) orders; count
    of a right-side column counts only matches."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — two conditional sums in
    one aggregate, single join, single-row result."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    rev = _rev()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (F.sum(promo).cast("double") * 100.0 / F.sum(rev).cast("double")).alias(
                "promo_revenue_pct"
            )
        )
    )


Q14_SQL = """
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""


def q17_below_avg_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity), decorrelated into aggregate-then-join — the aggregate is
    computed once per part key (one shuffle) instead of per row, which
    is the only plan that survives 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_limit")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == avg_qty.pk)
        .where(F.col("l_quantity") < F.col("qty_limit"))
        .agg((F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"))
    )


Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery. The
    qualifying-orders aggregate runs first (one shuffle on orderkey);
    the small qualifying set then semi-joins customer/orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.sum(_dec("l_quantity")).alias("_sq"))
        .where(F.col("_sq") > 300)
        .select("bk", F.col("_sq").cast("double").alias("sum_qty"))
    )
    return (
        orders.join(big, orders.o_orderkey == big.bk)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
  JOIN (SELECT l_orderkey AS bk, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300) ON o_orderkey = bk
  JOIN customer ON o_custkey = c_custkey
"""


def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicate. Catalyst extracts
    the common conjuncts (join key) and pushes the per-branch filters
    into both scans; the disjunction evaluates post-join on the
    surviving rows."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(part, li.l_partkey == part.p_partkey)
    branch = (
        ((F.col("p_brand") == "Brand#13") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#19") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return j.where(branch).agg(F.sum(_rev()).cast("double").alias("revenue"))


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#13' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#19' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average) + NOT EXISTS
    anti join. The average is a 1-row broadcast; the anti join runs on
    a date-filtered orders side (customers with no 2000+ orders)."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted — no partsupp table): for each size-1
    part, the supplier(s) whose lineitem hit the minimum extended
    price. Min-per-group computed once, joined back on (part, price) —
    the standard decorrelation of `price = (SELECT MIN ...)`."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") == 1)
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    offers = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_partkey", "p_brand", "l_suppkey", "l_extendedprice"
    )
    min_price = offers.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        offers.join(
            min_price,
            (offers.p_partkey == min_price.mk)
            & (offers.l_extendedprice == min_price.min_price),
        )
        .join(supp, offers.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_brand", "s_name", F.col("min_price").alias("price"))
        .distinct()
    )


Q2_SQL = """
SELECT DISTINCT p_partkey, p_brand, s_name, l_extendedprice AS price
FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size = 1
  AND l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2
                         WHERE l2.l_partkey = lineitem.l_partkey)
"""


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (nation, order-year): hierarchical subtotals + grand
    total in ONE pass — grouping-set expansion inside the partial
    aggregate, not N scans. GROUPING() flags distinguish subtotal rows
    from genuine NULL keys."""
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .rollup("n_name", "o_year")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping("o_year").cast("int").alias("g_year"),
        )
    )


ROLLUP_SQL = """
SELECT n_name, YEAR(o_orderdate) AS o_year,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders,
       CAST(GROUPING(n_name) AS INT) AS g_nation,
       CAST(GROUPING(YEAR(o_orderdate)) AS INT) AS g_year
FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_name, YEAR(o_orderdate))
"""


def order_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (orderstatus, orderpriority): all 2^2 grouping sets in one
    pass, with GROUPING() flags."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        )
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def customer_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame surface: cumulative revenue, order sequence number,
    previous-order gap, and 3-order moving average per customer
    (custkey < 20 for bounded output). One shuffle on o_custkey feeds
    all four window functions (same partitioning + ordering)."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 20)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wmov = w.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.row_number().over(w).alias("order_seq"),
        F.sum(_dec("o_totalprice")).over(wsum).cast("double").alias("cum_revenue"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        # SUM(decimal)/COUNT rather than AVG: Spark's avg(decimal)
        # rounds at scale+4 while DuckDB's AVG(decimal) returns DOUBLE;
        # exact decimal sum ÷ exact count is bit-identical on both.
        (
            F.sum(_dec("o_totalprice")).over(wmov).cast("double")
            / F.count(F.lit(1)).over(wmov)
        ).alias("moving_avg_3"),
    )


RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       ROW_NUMBER() OVER w AS order_seq,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue,
       LAG(o_totalprice, 1) OVER w AS prev_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
       / COUNT(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg_3
FROM orders
WHERE o_custkey < 20
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface: INTERSECT / EXCEPT / UNION over the
    nation keys of high-balance customers vs high-balance suppliers.
    Spark plans these as aggregate+join (semi/anti) — no sort needed."""
    cust_n = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").cast("int").alias("nationkey"))
        .distinct()
    )
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").cast("int").alias("nationkey"))
        .distinct()
    )
    both = cust_n.intersect(supp_n).select(F.lit("both").alias("src"), "nationkey")
    conly = cust_n.exceptAll(supp_n).select(F.lit("cust_only").alias("src"), "nationkey")
    sonly = supp_n.exceptAll(cust_n).select(F.lit("supp_only").alias("src"), "nationkey")
    return both.unionAll(conly).unionAll(sonly)


SET_OPS_SQL = """
WITH cust_n AS (SELECT DISTINCT CAST(c_nationkey AS INT) AS nationkey FROM customer WHERE c_acctbal > 9000),
     supp_n AS (SELECT DISTINCT CAST(s_nationkey AS INT) AS nationkey FROM supplier WHERE s_acctbal > 9000)
SELECT 'both' AS src, nationkey FROM (SELECT nationkey FROM cust_n INTERSECT SELECT nationkey FROM supp_n)
UNION ALL
SELECT 'cust_only' AS src, nationkey FROM (SELECT nationkey FROM cust_n EXCEPT SELECT nationkey FROM supp_n)
UNION ALL
SELECT 'supp_only' AS src, nationkey FROM (SELECT nationkey FROM supp_n EXCEPT SELECT nationkey FROM cust_n)
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's revenue share inside one region's
    market, by order year — two conditional sums over a 6-way join.
    Share is a ratio of DECIMAL sums cast at the end; nation/region
    broadcast, facts shuffle."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nation_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    nation_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    vol = _rev()
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation_c), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation_s), supp.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(target).cast("double") / F.sum(vol).cast("double")).alias("mkt_share")
        )
    )


Q8_SQL = """
SELECT YEAR(o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                     THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
       AS mkt_share
FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'EUROPE'
GROUP BY YEAR(o_orderdate)
"""


def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted — no partsupp.supplycost column): profit
    = revenue − 0.8 × p_retailprice × quantity, by supplier nation and
    year, for parts of one type."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # revenue and cost are summed as separate exact decimals; the 0.8
    # factor applies once to the final double — a decimal×decimal×decimal
    # chain would overflow precision 38 and round differently per engine
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(_rev()).cast("double")
                - F.sum(_dec("p_retailprice") * _dec("l_quantity")).cast("double") * 0.8
            ).alias("sum_profit")
        )
    )


Q9_SQL = """
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
       - CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) * 0.8 AS sum_profit
FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey
WHERE p_type = 'ECONOMY'
GROUP BY n_name, YEAR(o_orderdate)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) whose quarterly revenue equals the
    maximum — the view + scalar-subquery form, decorrelated to
    aggregate → 1-row max → broadcast equality join."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("sk"))
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mr"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("mr"))
        .join(supp, F.col("sk") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS sk,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON sk = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the engine's SQL surface
    (register_views + spark.sql): per-status and per-priority subtotals
    in one pass — the two single-column sets of the cube, without
    paying for the other grouping combinations."""
    from mito_spark.engine import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """)


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted — no partsupp table: part value =
    lineitem revenue from NATION_3's suppliers): group-HAVING against a
    *global* scalar subquery. The global total is a 1-row broadcast;
    the per-part aggregate shuffles once on partkey. Both sums are
    decimal-exact; the 0.001 fraction is applied on doubles identically
    in both engines."""
    nat = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    scoped = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    total = scoped.agg(F.sum(_dec("l_extendedprice")).cast("double").alias("grand"))
    return (
        scoped.groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).cast("double").alias("part_value"))
        .join(F.broadcast(total))
        .where(F.col("part_value") > F.col("grand") * 0.001)
        .select("l_partkey", "part_value")
    )


Q11_SQL = """
WITH scoped AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT l_partkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS part_value
FROM scoped
GROUP BY l_partkey
HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
       > (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) FROM scoped) * 0.001
"""


def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted): distinct-supplier variety per part
    attribute, with suppliers excluded by a NOT IN subquery (negative
    account balance standing in for 'Customer Complaints'). The
    exclusion is an anti join against a tiny broadcast side; the
    distinct count shuffles once on the group keys."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#1")
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
"""


def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted): suppliers qualified by an aggregate
    subquery — those who shipped > 150 units of PROMO-type parts during
    1998 — semi-joined to the supplier dim and filtered to one nation.
    The inner aggregate runs once on (suppkey); supplier then
    semi-joins the small qualified set (never a row-per-row EXISTS)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    nat = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_0")
    supp = load_table(spark, sf_dir, "supplier")
    qualified = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("_q"))
        .where(F.col("_q") > 150)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_0'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
  )
"""


def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted — no commit/receipt dates: 'late' =
    shipped more than 60 days after the order date): suppliers who were
    the ONLY late supplier on a multi-supplier order. EXISTS (another
    supplier on the order) is a semi join with a key-inequality
    condition; NOT EXISTS (another *late* supplier) is the matching
    anti join — both shuffle on orderkey only."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l1 = late.alias("l1")
    others = pairs.alias("o")
    other_late = late.alias("ol")
    sole_late = (
        l1.join(
            others,
            (F.col("l1.l_orderkey") == F.col("o.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("o.l_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l1.l_orderkey") == F.col("ol.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("ol.l_suppkey")),
            "left_anti",
        )
    )
    return (
        sole_late.join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_SQL = """
WITH pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM pairs o
              WHERE o.l_orderkey = l1.l_orderkey AND o.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late ol
                  WHERE ol.l_orderkey = l1.l_orderkey AND ol.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
"""


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def orders_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT coverage: order counts per year with the five TPC-H
    priorities as COLUMNS — the wide crosstab BI layer every warehouse
    emits. Built with `groupBy().pivot(values=...)`: passing the
    explicit value list keeps the schema static (no extra
    distinct-values job, and the plan is a single groupBy with five
    conditional aggregates — one shuffle on year, five columns out).
    The oracle is the equivalent conditional aggregation, the form
    PIVOT desugars to on both engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.select(
            F.year("o_orderdate").alias("order_year"), "o_orderpriority"
        )
        .groupBy("order_year")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    # pivot leaves NULL for empty cells; a crosstab reports 0
    cols = [
        F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(f"p{p[0]}_orders")
        for p in _PRIORITIES
    ]
    return piv.select("order_year", *cols).orderBy("order_year")


PRIORITY_PIVOT_SQL = "\n".join(
    ["SELECT YEAR(o_orderdate) AS order_year,"]
    + [
        f"       COALESCE(COUNT(*) FILTER (o_orderpriority = '{p}'), 0) AS p{p[0]}_orders,"
        for p in _PRIORITIES[:-1]
    ]
    + [
        f"       COALESCE(COUNT(*) FILTER (o_orderpriority = '{_PRIORITIES[-1]}'), 0) AS p{_PRIORITIES[-1][0]}_orders",
        "FROM orders GROUP BY 1 ORDER BY 1",
    ]
)


def lineitem_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt coverage: per-returnflag totals of three lineitem
    measures rotated from wide columns into (metric, total) rows — the
    long-form feed a metrics store or chart layer wants. Built with
    `DataFrame.unpivot` (Spark's melt): the rotation happens AFTER the
    aggregate, so the unpivot touches |returnflags| × 3 rows, not the
    fact table — rotate late, aggregate early.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("quantity"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("extendedprice"),
        F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double").alias("discount"),
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["quantity", "extendedprice", "discount"],
            variableColumnName="metric",
            valueColumnName="total",
        )
        .orderBy("l_returnflag", "metric")
    )


UNPIVOT_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS quantity,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS extendedprice,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS discount
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, metric, total FROM (
  SELECT l_returnflag, 'quantity' AS metric, quantity AS total FROM wide
  UNION ALL
  SELECT l_returnflag, 'extendedprice', extendedprice FROM wide
  UNION ALL
  SELECT l_returnflag, 'discount', discount FROM wide
)
ORDER BY l_returnflag, metric
"""


def lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag Pearson correlation of (quantity, extendedprice)
    and (quantity, discount) — the relationship screen a pricing
    analysis starts from. NOT `F.corr` over doubles: a streaming float
    covariance is shuffle-order-dependent, so the moments are
    decimal-exact sums (Σx, Σy, Σxy, Σx², Σy² as DECIMAL(38,6)) and
    the textbook formula is evaluated once per group in doubles —
    bit-identical on any partitioning and in the DuckDB twin. One
    shuffle; five decimal aggregates ride the same partial-agg pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    z = F.col("l_discount").cast("decimal(18,2)")
    d = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(x)).alias("sx"),
        F.sum(d(y)).alias("sy"),
        F.sum(d(z)).alias("sz"),
        F.sum(d(x * y)).alias("sxy"),
        F.sum(d(x * z)).alias("sxz"),
        F.sum(d(x * x)).alias("sxx"),
        F.sum(d(y * y)).alias("syy"),
        F.sum(d(z * z)).alias("szz"),
    )

    def corr(sxy, sx, sy, sxx, syy):
        n = F.col("n").cast("double")
        num = n * F.col(sxy).cast("double") - F.col(sx).cast("double") * F.col(sy).cast("double")
        den = F.sqrt(
            (n * F.col(sxx).cast("double") - F.col(sx).cast("double") * F.col(sx).cast("double"))
            * (n * F.col(syy).cast("double") - F.col(sy).cast("double") * F.col(sy).cast("double"))
        )
        return F.round(F.try_divide(num, den), 6)

    return g.select(
        "l_returnflag",
        "n",
        corr("sxy", "sx", "sy", "sxx", "syy").alias("corr_qty_price"),
        corr("sxz", "sx", "sz", "sxx", "szz").alias("corr_qty_discount"),
    ).orderBy("l_returnflag")


CORRELATIONS_SQL = """
WITH g AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS sx,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS sy,
         SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS sz,
         SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS sxy,
         SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS sxz,
         SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS sxx,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS syy,
         SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS szz
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))), 6) AS corr_qty_price,
       ROUND((n * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
             / (sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * (n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))), 6) AS corr_qty_discount
FROM g ORDER BY l_returnflag
"""


# --- table profiling (ANALYZE-style column statistics) --------------------

_TP_COLS: list[tuple[str, str]] = [
    ("l_orderkey", "int"),
    ("l_partkey", "int"),
    ("l_suppkey", "int"),
    ("l_linenumber", "int"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics over the widest fact table
    — row count, null count, EXACT distinct count, min/max — the
    profile an optimizer's stats collector, a data-quality monitor,
    and a migration diff all start from (the engine-surface sibling of
    corpus_snapshot_diff, which does the same job for documents).

    Plan shape (r12 optimization round): the non-distinct stats
    (count / nulls / min / max x 11 columns) come from ONE simple
    hash-aggregate pass; each EXACT distinct count is its own
    single-column two-phase aggregate (partial distinct map-side,
    |distinct|-bounded exchange, final count), and the twelve 1-row
    frames broadcast-join back together before the 11-row unpivot
    (rotate late — the lineitem_metrics_unpivot discipline). The
    r12-build version asked one aggregate for all 11 distincts, which
    Catalyst plans as an Expand (12x input replication) feeding a
    SORT-aggregate keyed on all 11 columns at once — measured 23.6 s
    at sf0.1 vs 1.9 s for this shape. Parquet being columnar, the
    per-column distinct scans re-read each column once (2x column
    I/O total vs the Expand's 1x) in exchange for dropping the 12x
    row replication and the corpus-sized multi-key sort — the right
    trade at any scale, and each distinct aggregate is map-side
    bounded by the column's per-partition cardinality. At 100 TB the
    drop-in substitution is approx_count_distinct (one HLL per
    column, one pass); hll_calibration_report prices exactly that
    swap's error, which is why the exact form is what the gate
    hash-checks.

    Min/max render through type-pinned formats so both engines emit
    identical strings (the profile is heterogeneous, so values ship as
    strings): integers via plain CAST, measures via DECIMAL(18,2) (the
    data is 2dp-quantized; nearest-double error ~1e-13 never straddles
    a rounding boundary), timestamps via an explicit
    yyyy-MM-dd HH:mm:ss format — never engine-default float/timestamp
    rendering, which diverges (Spark switches to E-notation at 1e7).
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, _ in _TP_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
            F.min(F.col(c)).alias(f"min_{c}"),
            F.max(F.col(c)).alias(f"max_{c}"),
        ]
    one = li.agg(*aggs)
    for c, _ in _TP_COLS:
        nd = li.select(c).agg(F.countDistinct(F.col(c)).alias(f"nd_{c}"))
        one = one.crossJoin(F.broadcast(nd))

    def render(name: str, kind: str):
        col = F.col(name)
        if kind == "int":
            return col.cast("string")
        if kind == "num":
            return col.cast("decimal(18,2)").cast("string")
        if kind == "ts":
            return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
        return col

    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"nulls_{c}").alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                render(f"min_{c}", k).alias("min_value"),
                render(f"max_{c}", k).alias("max_value"),
            )
            for c, k in _TP_COLS
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("column_name")
    )


def _table_profile_sql() -> str:
    aggs = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
    for c, _ in _TP_COLS:
        aggs += [
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_{c}",
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}",
            f"MIN({c}) AS min_{c}",
            f"MAX({c}) AS max_{c}",
        ]

    def render(name: str, kind: str) -> str:
        if kind == "int":
            return f"CAST({name} AS VARCHAR)"
        if kind == "num":
            return f"CAST(CAST({name} AS DECIMAL(18,2)) AS VARCHAR)"
        if kind == "ts":
            return f"strftime({name}, '%Y-%m-%d %H:%M:%S')"
        return name

    arms = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, n_rows, nulls_{c} AS n_nulls, nd_{c} AS n_distinct,\n"
        f"       {render(f'min_{c}', k)} AS min_value, {render(f'max_{c}', k)} AS max_value FROM one"
        for c, k in _TP_COLS
    )
    return f"""
WITH one AS MATERIALIZED (
  SELECT {', '.join(aggs)} FROM lineitem
)
{arms}
ORDER BY column_name
"""


TABLE_PROFILE_SQL = _table_profile_sql()
