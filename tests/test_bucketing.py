"""Bucketed co-located join: both sides bucketed by the join key ->
sort-merge join with NO shuffle Exchange in the physical plan."""

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.sources.bucketing import (
    read_table,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(orders, "orders_b", ["o_orderkey"], num_buckets=8,
                   sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], num_buckets=8,
                   sort_cols=["l_orderkey"])
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, ot).join(
            read_table(spark, lt),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        # and it is actually correct
        n = joined.count()
        plain = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").join(
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert n == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_aggregation_skips_shuffle(spark, bucketed_tables):
    _, lt = bucketed_tables
    agg = read_table(spark, lt).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
