"""Write-audit-publish and backfill contracts: failing audits never
touch published data; backfill fills exactly the missing partitions and
is idempotent."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from geo_big_data_analysis_spark.plans.registry import _t
from geo_big_data_analysis_spark.sources.publish import (
    AuditFailure,
    plan_backfill,
    run_backfill,
    write_audit_publish,
)

SF = "/root/testdata/sf0.001"


def test_wap_publishes_on_pass_and_protects_on_fail(spark, tmp_path):
    pub = str(tmp_path / "published")
    ev = _t(spark, SF, "events").select("event_id", "user_id", "value")
    passed = write_audit_publish(
        ev,
        pub,
        audits=[
            ("nonempty", lambda d: d.count() > 0),
            ("no_null_ids", lambda d: d.filter(F.col("event_id").isNull()).count() == 0),
        ],
    )
    assert passed == ["nonempty", "no_null_ids"]
    v1_count = spark.read.parquet(pub).count()
    assert v1_count == ev.count()

    # a bad second version must NOT replace the good published data
    bad = ev.filter(F.lit(False))
    with pytest.raises(AuditFailure):
        write_audit_publish(bad, pub, audits=[("nonempty", lambda d: d.count() > 0)])
    assert spark.read.parquet(pub).count() == v1_count
    assert not os.path.exists(pub + ".__staging__")


def test_backfill_fills_exactly_missing_partitions(spark, tmp_path):
    sink = str(tmp_path / "bydate")
    ev = _t(spark, SF, "events").select("event_id", "ts")
    filled = run_backfill(ev, "ts", sink)
    assert len(filled) >= 3
    # drop two partitions, remember the others' file sets
    import shutil

    victims = sorted(filled)[:2]
    for v in victims:
        shutil.rmtree(f"{sink}/dt={v}")
    untouched_before = {
        d: sorted(glob.glob(f"{sink}/dt={d}/*.parquet"))
        for d in filled
        if d not in victims
    }
    refilled = run_backfill(ev, "ts", sink)
    assert refilled == victims
    # untouched partitions kept their exact files
    for d, files in untouched_before.items():
        assert sorted(glob.glob(f"{sink}/dt={d}/*.parquet")) == files
    # content complete again, and a further run is a no-op
    assert spark.read.parquet(sink).count() == ev.count()
    assert run_backfill(ev, "ts", sink) == []
    assert plan_backfill(ev, "ts", sink) == []


def test_write_audit_publish_recovers_stale_old_dir(spark, tmp_path):
    """A leftover .__old__ from a crash mid-swap is recovered: restored
    when the publish dir is missing, discarded when the swap completed
    (ADVICE r1)."""
    import os
    import shutil

    pub = str(tmp_path / "ds")
    df1 = spark.range(3).toDF("id")
    write_audit_publish(df1, pub, [("nonempty", lambda d: d.count() > 0)])
    # simulate crash after first rename: publish moved to .__old__
    os.rename(pub, pub + ".__old__")
    df2 = spark.range(5).toDF("id")
    write_audit_publish(df2, pub, [("nonempty", lambda d: d.count() > 0)])
    assert spark.read.parquet(pub).count() == 5
    assert not os.path.exists(pub + ".__old__")
    # stale .__old__ alongside a completed publish is just removed
    shutil.copytree(pub, pub + ".__old__")
    write_audit_publish(df1, pub, [("nonempty", lambda d: d.count() > 0)])
    assert spark.read.parquet(pub).count() == 3
    assert not os.path.exists(pub + ".__old__")
