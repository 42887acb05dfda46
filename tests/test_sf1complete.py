"""The sampled-subcorpus completeness checker (tools/sf1complete.py) is
load-bearing for the r8+ sf1 record's "+sample-complete" tags — so it
gets the same guard as the invariant oracles: it must pass on a true
output AND flag both a corrupted value and a MISSED pair (the failure
mode the invariants, by design, cannot catch). Runs at sf0.001 so the
quadratic sample oracle is instant; the checker itself is scale-free.
"""

from __future__ import annotations

import os
import shutil
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from geo_big_data_analysis_spark.plans.registry import REGISTRY  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# heavyweight sweep (VERDICT r8 "Next round" #4): gated out of the
# default suite so the driver's pytest window is met; run with
# SPARK_GRAFT_SLOW=1 (preflight does).
pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SLOW"),
    reason="sampled-subcorpus completeness sweep — SPARK_GRAFT_SLOW=1",
)


@pytest.fixture(scope="module")
def sample_env(tmp_path_factory):
    """Build the md5-cut sample of the sf0.001 documents in a temp dir
    (never write next to the read-only driver testdata)."""
    import sf1complete

    d = str(tmp_path_factory.mktemp("sf0001sample"))
    shutil.rmtree(d, ignore_errors=True)
    # the 50-doc fixture needs a wider cut than production's 3% for the
    # sample to contain any near-dup pair; the checker is cut-agnostic
    return sf1complete.ensure_sample_dir(
        SF_DIR, sample_dir=d, pred="substr(md5(doc_id::VARCHAR), 1, 1) < '8'"
    )


def test_sample_dir_is_deterministic_md5_cut(sample_env):
    import duckdb

    from sf1complete import SAMPLE_PRED

    test_pred = "substr(md5(doc_id::VARCHAR), 1, 1) < '8'"
    con = duckdb.connect()
    n_all, n_pred = con.execute(
        f"SELECT count(*), sum(CASE WHEN {test_pred} THEN 1 ELSE 0 END) "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()
    n_sample = con.execute(
        f"SELECT count(*) FROM read_parquet('{sample_env}/documents.parquet')"
    ).fetchone()[0]
    assert n_sample == n_pred > 0
    assert n_sample < n_all
    # the production predicate is an 8/256 prefix cut of the same form
    assert SAMPLE_PRED == "substr(md5(doc_id::VARCHAR), 1, 2) < '08'"


def test_completeness_passes_and_catches_corruption_and_missed_pair(
    spark, sample_env
):
    import sf1complete

    name = "minhash_near_dup_docs"
    full = REGISTRY[name][0](spark, SF_DIR).toPandas()
    ctx = {"sample_dir": sample_env}
    import duckdb

    con = duckdb.connect()
    ids = con.execute(
        f"SELECT doc_id FROM read_parquet('{sample_env}/documents.parquet')"
    ).fetchall()
    ctx["sample_ids"] = {r[0] for r in ids}

    # the fixture must exercise the check: at least one reported pair
    # with both endpoints inside the sample
    in_sample = full[
        full["doc_a"].isin(ctx["sample_ids"])
        & full["doc_b"].isin(ctx["sample_ids"])
    ]
    assert len(in_sample) > 0, "sample contains no near-dup pair — widen cut"

    assert sf1complete.check(name, spark, SF_DIR, full, dict(ctx)) == []

    # corrupted value in the full run -> full-run-restricted must flag
    bad = full.copy()
    bad.loc[in_sample.index[0], "jaccard"] = 0.999999
    msgs = sf1complete.check(name, spark, SF_DIR, bad, dict(ctx))
    assert any("full-run-restricted" in m for m in msgs), msgs

    # MISSED pair (dropped row) -> rowcount mismatch must flag. This is
    # the check the linear invariants structurally cannot perform.
    missing = full.drop(index=in_sample.index[0]).reset_index(drop=True)
    msgs = sf1complete.check(name, spark, SF_DIR, missing, dict(ctx))
    assert any(
        "full-run-restricted" in m and "rowcount" in m for m in msgs
    ), msgs


def test_non_pair_queries_run_engine_on_sample(spark, sample_env):
    import sf1complete

    name = "training_corpus_pipeline"
    full = REGISTRY[name][0](spark, SF_DIR).toPandas()
    ctx = {"sample_dir": sample_env, "sample_ids": set()}
    assert sf1complete.check(name, spark, SF_DIR, full, ctx) == []
