"""Structural invariants for the advanced relational surface (full
oracle equivalence runs via scripts/check_correctness.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mito_spark.operators import relational2 as r2


def test_semi_join_counts_bounded_by_orders(spark, sf_dir):
    from mito_spark.engine import load_table

    total = load_table(spark, sf_dir, "orders").count()
    semi = r2.q4_priority_semi(spark, sf_dir).agg(F.sum("order_count")).collect()[0][0]
    assert 0 < semi <= total


def test_q13_includes_zero_order_bucket_total(spark, sf_dir):
    from mito_spark.engine import load_table

    rows = r2.q13_order_count_distribution(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.custdist for r in rows) == n_cust  # every customer in exactly one bucket


def test_rollup_grand_total_matches_detail(spark, sf_dir):
    rows = r2.revenue_rollup(spark, sf_dir).collect()
    grand = [r for r in rows if r.g_nation == 1 and r.g_year == 1]
    assert len(grand) == 1
    detail = sum(r.revenue for r in rows if r.g_nation == 0 and r.g_year == 0)
    assert abs(grand[0].revenue - detail) < 1e-4


def test_cube_has_all_grouping_sets(spark, sf_dir):
    rows = r2.order_cube(spark, sf_dir).collect()
    seen = {(r.g_status, r.g_priority) for r in rows}
    assert seen == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_running_totals_monotone_per_customer(spark, sf_dir):
    rows = r2.customer_running_totals(spark, sf_dir).collect()
    by_cust: dict = {}
    for r in sorted(rows, key=lambda r: (r.o_custkey, r.order_seq)):
        prev = by_cust.get(r.o_custkey, 0.0)
        assert r.cum_revenue >= prev  # totalprice > 0 ⇒ strictly growing
        by_cust[r.o_custkey] = r.cum_revenue


def test_set_ops_partition_is_disjoint_and_complete(spark, sf_dir):
    rows = r2.nation_set_ops(spark, sf_dir).collect()
    by_src: dict = {"both": set(), "cust_only": set(), "supp_only": set()}
    for r in rows:
        by_src[r.src].add(r.nationkey)
    assert by_src["both"].isdisjoint(by_src["cust_only"])
    assert by_src["both"].isdisjoint(by_src["supp_only"])
    assert by_src["cust_only"].isdisjoint(by_src["supp_only"])


def test_q2_min_per_group_is_minimum(spark, sf_dir):
    from mito_spark.engine import load_table

    out = {r.p_partkey: r.price for r in r2.q2_cheapest_supplier(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") == 1)
    true_min = {
        r.k: r.m
        for r in li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.min("l_extendedprice").alias("m"))
        .collect()
    }
    assert out == true_min


def test_salted_join_equals_plain_join(spark, sf_dir):
    from mito_spark.engine import load_table
    from mito_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(
            orders.withColumnRenamed("o_custkey", "c_custkey"), cust, "c_custkey", salt=8
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r.c_mktsegment, r.n) for r in plain.collect()} == {
        (r.c_mktsegment, r.n) for r in salted.collect()
    }


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Co-located join: bucketed tables joined on the bucket key plan
    ZERO exchanges before the join (the 100 TB shuffle-elimination
    contract); results equal the plain join."""
    from mito_spark.engine import load_table
    from mito_spark.operators.bucketing import bucketed_join, write_bucketed
    from mito_spark.operators.skew import explain_shuffle_count

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "k"), "b_orders", "k", 8,
                   sort_by="k", path=str(tmp_path / "b_orders"))
    write_bucketed(li.withColumnRenamed("l_orderkey", "k"), "b_lineitem", "k", 8,
                   sort_by="k", path=str(tmp_path / "b_lineitem"))

    # force the sort-merge path so bucketing (not broadcast) is on trial
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    joined = bucketed_join(spark, "b_orders", "b_lineitem", "k")
    agg = joined.groupBy("o_orderpriority").count()
    # the join itself is exchange-free; the only exchange allowed is the
    # final 5-row aggregation
    assert explain_shuffle_count(joined) == 0
    assert explain_shuffle_count(agg) <= 1

    plain = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )
    assert {(r.o_orderpriority, r["count"]) for r in agg.collect()} == {
        (r.o_orderpriority, r["count"]) for r in plain.collect()
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_left_outer_and_rejects_right_full(spark, sf_dir):
    """left join: unmatched skewed-side rows survive exactly once;
    right/full are rejected (replicated side would duplicate them)."""
    import pytest

    from mito_spark.engine import load_table
    from mito_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    cust = load_table(spark, sf_dir, "customer").where("c_custkey % 3 = 0").select(
        "c_custkey", "c_mktsegment"
    )
    plain = orders.join(cust, "c_custkey", "left")
    salted = salted_join(orders, cust, "c_custkey", salt=8, how="left")
    assert salted.count() == plain.count()
    assert salted.where("c_mktsegment IS NULL").count() == plain.where(
        "c_mktsegment IS NULL"
    ).count()

    for bad in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(orders, cust, "c_custkey", how=bad)


def test_unpivot_is_lossless_rotation(spark, sf_dir):
    """melt(wide) carries exactly the wide table's cells: pivoting the
    long form back by (group, metric) reproduces every total."""
    from mito_spark.operators.relational2 import lineitem_metrics_unpivot

    rows = lineitem_metrics_unpivot(spark, sf_dir).collect()
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], {})[r["metric"]] = r["total"]
    for flag, metrics in by_flag.items():
        assert set(metrics) == {"quantity", "extendedprice", "discount"}


def test_correlations_bounded_and_partition_invariant(spark, sf_dir):
    from mito_spark.operators.relational2 import lineitem_correlations

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = {tuple(r) for r in lineitem_correlations(spark, sf_dir).collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = {tuple(r) for r in lineitem_correlations(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b  # decimal moments: order-free
    for r in a:
        for c in (r[2], r[3]):
            assert c is None or -1.0 <= c <= 1.0
