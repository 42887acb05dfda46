"""The sf1 invariant oracles (tools/sf1invariants.py) are load-bearing
for the PASSg rows of the sf1 record — so they get their own guard:
each must pass on a true output and FLAG a corrupted one. Runs at
sf0.001 (the invariants are scale-free SQL over the reported rows)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from geo_big_data_analysis_spark.plans.registry import REGISTRY  # noqa: E402
from geo_big_data_analysis_spark.session import TPCH_TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TPCH_TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _run(spark, name):
    return REGISTRY[name][0](spark, SF_DIR).toPandas()


def test_pair_invariants_pass_and_catch_corruption(spark, con):
    from sf1invariants import INVARIANTS

    outputs = {}
    for name in ("minhash_near_dup_docs", "ngram_jaccard_pairs"):
        sdf = _run(spark, name)
        assert len(sdf) > 0, f"{name} fixture produced no pairs at sf0.001"
        assert INVARIANTS[name](spark, con, SF_DIR, sdf, outputs) == []
        bad = sdf.copy()
        bad.loc[bad.index[0], "jaccard"] = 0.999999
        assert INVARIANTS[name](spark, con, SF_DIR, bad, dict(outputs)), (
            f"{name} invariant did not flag a corrupted jaccard"
        )


def test_cluster_and_leakage_invariants(spark, con):
    from sf1invariants import INVARIANTS

    outputs = {"minhash_near_dup_docs": _run(spark, "minhash_near_dup_docs")}
    for name in ("near_dup_clusters_docs", "split_leakage_audit"):
        sdf = _run(spark, name)
        assert len(sdf) > 0
        assert INVARIANTS[name](spark, con, SF_DIR, sdf, outputs) == []
        bad = sdf.copy()
        bad.loc[bad.index[0], "n_members" if "cluster" in name else "n_pairs"] += 1
        assert INVARIANTS[name](spark, con, SF_DIR, bad, dict(outputs)), (
            f"{name} invariant did not flag a corrupted count"
        )


def test_training_corpus_invariant(spark, con):
    from sf1invariants import INVARIANTS

    outputs = {"minhash_near_dup_docs": _run(spark, "minhash_near_dup_docs")}
    sdf = _run(spark, "training_corpus_pipeline")
    assert len(sdf) > 0
    assert INVARIANTS["training_corpus_pipeline"](
        spark, con, SF_DIR, sdf, outputs
    ) == []
    bad = sdf.copy()
    bad.loc[bad.index[0], "n_docs"] += 1
    assert INVARIANTS["training_corpus_pipeline"](
        spark, con, SF_DIR, bad, dict(outputs)
    )


def test_distance_band_invariant_bounds(spark, con):
    from sf1invariants import INVARIANTS

    sdf = _run(spark, "distance_band_pairs")
    assert INVARIANTS["distance_band_pairs"](spark, con, SF_DIR, sdf, {}) == []
    bad = sdf.copy()
    bad.loc[bad.index[0], "avg_km"] = 99.0
    assert INVARIANTS["distance_band_pairs"](spark, con, SF_DIR, bad, {})
