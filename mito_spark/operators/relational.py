"""Relational headline queries over the TPC-H-ish synthetic star schema.

The reference engine (elastic/mito) has no joins, grouping or windows —
its only join-like construct is a comprehension Cartesian product and
its only aggregates are list min/max (SURVEY.md §2.2 notes). These
queries are the "natural Spark extensions" of that surface and the
engine's performance backbone.

Numeric determinism: monetary aggregates are summed as DECIMAL(18,4)
(exact, associative — safe under any partitioning / AQE re-plan) and
cast to DOUBLE only at the end, so results are bit-identical to the
DuckDB oracle regardless of partition count or reduce order. Plain
DOUBLE sums would drift with partitioning at scale.

Scale posture per query is in its docstring; shared rules:
  - region/nation are always broadcast (≤ 25 rows at any SF);
  - customer/supplier/part are broadcast below the 64 MB threshold and
    shuffle-join above it — we leave that call to Catalyst/AQE rather
    than hard-coding;
  - every aggregation is a partial (map-side) + final hash aggregate —
    guaranteed by using df.groupBy on deterministic exprs;
  - no query collects more than its final (small) result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mito_spark.engine import load_table


def _dec(col, scale: int = 4):
    return F.col(col).cast(f"decimal(18,{scale})") if isinstance(col, str) else col.cast(f"decimal(18,{scale})")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy single-table aggregate.

    100 TB posture: predicate + column pruning push to the parquet
    scan (ReadSchema carries 9 of 11 columns, PushedFilters carries the
    shipdate bound); the groupBy has 6 distinct keys → partial
    aggregation collapses each partition to ≤6 rows before the (tiny)
    shuffle. This query is bandwidth-bound at any scale, as it should
    be.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    charge = disc_price * (1 + _dec("l_tax"))
    out = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("_sq"),
            F.sum(_dec("l_extendedprice")).alias("_sbp"),
            F.sum(disc_price).alias("_sdp"),
            F.sum(charge).alias("_sc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sbp").cast("double").alias("sum_base_price"),
            F.col("_sdp").cast("double").alias("sum_disc_price"),
            F.col("_sc").cast("double").alias("sum_charge"),
            (F.col("_sq").cast("double") / F.col("count_order")).alias("avg_qty"),
            (F.col("_sbp").cast("double") / F.col("count_order")).alias("avg_price"),
            "count_order",
        )
    )
    return out


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-N.

    100 TB posture: customer filter (1/5 selectivity) applies before
    the join; customer↔orders and orders↔lineitem are shuffle joins on
    their keys (both sides huge) — AQE handles skew. The top-10 is a
    TakeOrderedAndProject: no global sort materializes. Ties broken on
    (revenue DESC, o_orderkey) for determinism.
    """
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through the full star.

    100 TB posture: region (5 rows) and nation (25 rows) are
    explicitly broadcast — they prune customer/supplier *before* the
    fact-table joins; the customer⋈orders⋈lineitem⋈supplier chain
    shuffles on join keys with AQE reordering/skew-handling. The
    same-nation condition (c_nationkey = s_nationkey) is applied as a
    join predicate, not a post-filter.
    """
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    nr = F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey))
    return (
        cust.join(nr, cust.c_nationkey == nr.n_nationkey)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).cast("double").alias("revenue")
        )
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg — the pushdown showcase.

    All three predicates reach the parquet reader as PushedFilters;
    ReadSchema is 4 columns of 11. Single-row result, no shuffle
    beyond the 1-row partial-agg exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"))
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function surface: rank per partition, keep top 3 orders
    by totalprice per customer (first 100 customers for bounded
    output).

    100 TB posture: one shuffle on o_custkey; row_number needs no full
    sort — AQE-sized hash partitions each sort locally. Deterministic
    tiebreak (o_totalprice DESC, o_orderkey).
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


TOP_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders WHERE o_custkey < 100
) WHERE rank <= 3
"""


def order_priority_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate: exact COUNT(DISTINCT) per group — expands to
    the standard two-phase plan (partial distinct → final). For
    approximate counting at scale, `approx_count_distinct` is the
    drop-in (HLL sketch, one pass, mergeable) — exposed here exactly
    because the oracle can verify the exact form.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join showcase: part is small at low SF — Catalyst
    broadcasts it under the 64 MB threshold; above, AQE converts to
    shuffle join. Aggregates lineitem revenue by part brand."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


PART_TYPE_SQL = """
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""
