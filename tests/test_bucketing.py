"""Bucketed co-located join: correctness + the plan property that
justifies it (no shuffle Exchange on either join side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from peerdb_cdc_psql_psql_spark.plans import plan_string
from peerdb_cdc_psql_psql_spark.sources.bucketing import (
    drop_table,
    read_table,
    write_bucketed,
)


def test_bucketed_join_is_shuffle_free(spark):
    orders = spark.range(0, 20000).select(
        F.col("id").alias("o_id"),
        (F.col("id") % 1000).alias("custkey"),
        (F.col("id") * 3 % 97).alias("amount"),
    )
    cust = spark.range(0, 1000).select(
        F.col("id").alias("custkey"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    try:
        write_bucketed(orders, "b_orders", "custkey", n_buckets=8)
        write_bucketed(cust, "b_cust", "custkey", n_buckets=8)
        bo, bc = read_table(spark, "b_orders"), read_table(spark, "b_cust")
        # disable broadcast so the planner must choose SMJ/shuffled-hash;
        # bucketing then removes the Exchange entirely
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        try:
            j = bo.join(bc, "custkey")
            plan = plan_string(j)
            assert "Exchange" not in plan, plan
            # correctness unchanged vs non-bucketed join
            plain = orders.join(cust, "custkey")
            assert j.count() == plain.count() == 20000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        drop_table(spark, "b_orders")
        drop_table(spark, "b_cust")
