"""Scale-path strategy tests: bucketed shuffle-free joins, salting."""

from __future__ import annotations

import pyspark.sql.functions as F

from geo_big_data_analysis_spark.operators.scale import (
    read_bucketed,
    salted_agg_count,
    salted_join_inner,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark):
    # managed tables land in the session's default warehouse dir
    # (spark-warehouse/, gitignored); dropped at the end of the test
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bt_a", "bt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bt_a", ["k"], num_buckets=8)
    write_bucketed(b, "bt_b", ["k"], num_buckets=8)
    # tiny test tables would broadcast (hiding the bucketing); disable so
    # the plan shows what a 100 TB fact-fact join would do
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, "bt_a").join(read_bucketed(spark, "bt_b"), "k")
        # co-bucketed identical layout ⇒ sort-merge join with zero shuffle
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_salted_agg_count_matches_plain(spark):
    df = spark.range(10_000).select(
        F.when(F.col("id") % 100 == 0, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("key")
    )
    plain = {r["key"]: r["count"] for r in df.groupBy("key").count().collect()}
    salted = {r["key"]: r["count"] for r in salted_agg_count(df, "key").collect()}
    assert salted == plain


def test_salted_join_matches_plain(spark):
    big = spark.range(5000).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(10)], "k bigint, name string")
    plain = big.join(small, "k").agg(F.count(F.lit(1)), F.sum("v")).collect()[0]
    salted = salted_join_inner(big, small, "k").agg(F.count(F.lit(1)), F.sum("v")).collect()[0]
    assert tuple(plain) == tuple(salted)
