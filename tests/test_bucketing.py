"""Bucketed tables: the write-once-shuffle / join-forever-free contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgloader_spark.sinks.bucketing import (
    BucketSpec,
    cobucketed_join,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    orders = spark.range(0, 2000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_val")
    )
    items = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("o_key"), F.col("id").alias("i_val")
    )
    spec = BucketSpec(key="o_key", n_buckets=8)
    write_bucketed(orders, "bktest.orders_b", spec)
    write_bucketed(items, "bktest.items_b", spec)
    yield "bktest.orders_b", "bktest.items_b"
    spark.sql("DROP DATABASE bktest CASCADE")


def _no_broadcast(spark):
    """Force the shuffle-join regime: at 100 TB neither fact side is
    broadcastable, which is exactly when bucketing pays."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    return ctx()


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    left, right = bucketed_pair
    with _no_broadcast(spark):
        df = cobucketed_join(spark, left, right, "o_key")
        df.collect()
        final = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in final, final
        assert df.count() == 6000


def test_bucketed_groupby_skips_shuffle(spark, bucketed_pair):
    left, _ = bucketed_pair
    agg = spark.table(left).groupBy("o_key").agg(F.sum("o_val").alias("s"))
    agg.collect()
    final = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in final, final


def test_unbucketed_join_does_shuffle(spark, bucketed_pair):
    """Control: the same join against a plain DataFrame needs at least
    one Exchange — proving the bucketed plan's absence is the storage
    layout, not AQE happening to broadcast."""
    left, _ = bucketed_pair
    plain = spark.range(0, 2000).select(
        F.col("id").alias("o_key"), F.lit(1).alias("x")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.table(left).join(plain, "o_key")
        df.collect()
        final = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in final
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucket_spec_validation():
    with pytest.raises(ValueError):
        BucketSpec(key="k", n_buckets=0)
