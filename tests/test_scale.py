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


def test_bloom_filter_contract(spark, sf_dir):
    """No false negatives ever; FPR small for 2048 bits / 3 hashes at
    fixture key counts; candidates ⊇ true matches."""
    from geo_big_data_analysis_spark.plans.registry import REGISTRY

    row = REGISTRY["bloom_prune_orders"][0](spark, sf_dir).collect()[0]
    assert row.n_missed == 0
    assert row.n_candidates >= row.n_true
    assert 0.0 <= row.fpr < 0.2
    assert row.n_candidates < row.n_total  # it actually prunes


def test_bloom_probe_equals_flag_filter(spark, sf_dir):
    from geo_big_data_analysis_spark.operators.scale import (
        bloom_bitmap,
        bloom_flag,
        bloom_probe,
    )
    from geo_big_data_analysis_spark.plans.registry import _t
    from pyspark.sql import functions as F

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    dim = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    bm = bloom_bitmap(dim, "c_custkey")
    n_probe = bloom_probe(orders, "o_custkey", bm).count()
    n_flag = bloom_flag(orders, "o_custkey", bm).filter("bloom_pass").count()
    assert n_probe == n_flag


def test_fuzzy_dup_includes_exact_dups(spark, sf_dir):
    """Exact-duplicate heads must appear at distance 0."""
    from geo_big_data_analysis_spark.plans.registry import REGISTRY, _t
    from pyspark.sql import functions as F

    docs = _t(spark, sf_dir, "documents")
    dup_heads = (
        docs.groupBy(F.substring("text", 1, 32).alias("h"))
        .count()
        .filter("count > 1")
        .count()
    )
    rows = REGISTRY["fuzzy_dup_docs"][0](spark, sf_dir).collect()
    zero_pairs = [r for r in rows if r.dist == 0]
    if dup_heads > 0:
        assert zero_pairs
    for r in rows:
        assert r.a_id < r.b_id and 0 <= r.dist <= 8


def test_divergence_nonnegative(spark, sf_dir):
    from geo_big_data_analysis_spark.plans.registry import REGISTRY

    for r in REGISTRY["source_lang_divergence"][0](spark, sf_dir).collect():
        assert r.entropy >= 0.0
        assert r.kl_from_global >= -1e-9  # Gibbs' inequality


def test_frequent_items_partition_independent(spark, sf_dir):
    """The pigeonhole candidate phase must yield the exact > support·n
    set regardless of partitioning."""
    from geo_big_data_analysis_spark.operators.scale import frequent_items
    from geo_big_data_analysis_spark.plans.registry import _t
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events").select("event_type")
    n = ev.count()
    expected = {
        (r.event_type, r.c)
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("c")).collect()
        if r.c > 0.15 * n
    }
    for parts in (1, 3, 16):
        got = {
            (r.event_type, r.freq)
            for r in frequent_items(
                ev.repartition(parts), ["event_type"], 0.15
            ).collect()
        }
        assert got == expected, parts


def test_aqe_coalesces_small_shuffles(spark, sf_dir):
    """AQE is live: a small aggregation's post-shuffle partition count
    is coalesced well below spark.sql.shuffle.partitions."""
    from geo_big_data_analysis_spark.plans.registry import _t

    n_conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    agg = _t(spark, sf_dir, "events").groupBy("event_type").count()
    assert agg.count() > 0  # materialize so AQE finalizes the plan
    n_parts = agg.rdd.getNumPartitions()
    assert n_parts < n_conf, (n_parts, n_conf)
