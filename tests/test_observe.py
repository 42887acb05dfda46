"""Spark observe() metrics: zero-extra-pass pipeline QA counters —
aggregate metrics collected DURING a query's normal execution (the
accumulator-style monitoring a 100 TB pipeline attaches to every
stage boundary instead of running separate audit queries)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from geo_big_data_analysis_spark.plans.registry import _t


def test_observe_collects_audit_metrics_in_one_pass(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    obs = Observation("audit")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("null_values"),
        F.min("value").alias("min_value"),
    )
    # downstream consumer runs its real work; metrics ride along
    n_purchases = observed.filter(F.col("event_type") == "purchase").count()
    m = obs.get
    assert m["n_rows"] == ev.count()
    assert m["null_values"] == 0
    assert m["min_value"] >= 0.0
    assert 0 < n_purchases < m["n_rows"]
