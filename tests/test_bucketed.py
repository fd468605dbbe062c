"""Bucketed layout: co-located joins and aggregations run shuffle-free."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.sources.bucketed import (
    assert_no_shuffle,
    colocated_join,
    physical_plan,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_db(spark, sf_dir, tmp_path_factory):
    """A catalog database of bucketed copies of orders + customer,
    bucketed on the join key with the same bucket count."""
    loc = tmp_path_factory.mktemp("bucketed_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{loc}'")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(orders, "bktest.orders_b", ["o_custkey"], num_buckets=8)
    write_bucketed(customer, "bktest.customer_b", ["c_custkey"], num_buckets=8)
    yield "bktest"
    spark.sql("DROP DATABASE bktest CASCADE")


def test_colocated_join_has_no_exchange(spark, bucketed_db):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the shuffle-free claim is about bucketing,
        # not about the dimension fitting in memory
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = colocated_join(
            spark, "bktest.orders_b", "bktest.customer_b",
            on=[F.col("o_custkey") == F.col("c_custkey")],
        )
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert_no_shuffle(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_colocated_join_correct(spark, sf_dir, bucketed_db):
    joined = colocated_join(
        spark, "bktest.orders_b", "bktest.customer_b",
        on=[F.col("o_custkey") == F.col("c_custkey")],
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    expected = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).count()
    assert joined.count() == expected


def test_bucketed_groupby_has_no_exchange(spark, bucketed_db):
    """groupBy on the bucket key — the hash-map / digest shape — needs
    no shuffle over bucketed storage."""
    agg = (
        spark.table("bktest.orders_b")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert_no_shuffle(agg)


def test_unbucketed_join_does_exchange(spark, sf_dir):
    """Control: the identical join over plain parquet shuffles — proving
    the bucketing (not some session default) removes the exchange."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
        assert "Exchange" in physical_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
