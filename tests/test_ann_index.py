"""IVF-PQ index-as-artifact contracts (`sources/ann_index.py`).

The production ANN shape is build-once/probe-many: codebooks + coarse
centroids + codes persist next to the data, and the probe never
retrains. These tests pin the storage layer — store/load losslessness,
probe-from-stored ≡ retrain-inline, and fingerprint-keyed staleness.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from geo_big_data_analysis_spark.plans.registry import _t
from geo_big_data_analysis_spark.sources.ann_index import (
    _embeddings_fingerprint,
    build_ivfpq_index,
    ensure_ivfpq_index,
    load_ivfpq_index,
)

PARAMS = dict(dim=64, m=8, k=4, iters=1, scale=1000)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def test_build_load_roundtrip(spark, emb, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivfpq"))
    meta = build_ivfpq_index(spark, emb, d, fingerprint="fp0", **PARAMS)
    codes, centers, cbs, meta2 = load_ivfpq_index(spark, d)
    assert meta2["fingerprint"] == "fp0"
    assert cbs == meta["codebooks"]
    assert [c for c, _ in centers] == sorted(c for c, _ in centers)
    # code table: one row per vector, probe-ready schema
    assert codes.count() == emb.count()
    cols = set(codes.columns)
    assert {"neighbor_id", "cell"} <= cols
    assert {f"code_{b}" for b in range(PARAMS["m"])} <= cols
    # every code id within [0, k)
    mx = codes.agg(
        *[F.max(f"code_{b}").alias(f"m{b}") for b in range(PARAMS["m"])]
    ).collect()[0]
    assert all(0 <= mx[f"m{b}"] < PARAMS["k"] for b in range(PARAMS["m"]))


def test_stored_probe_matches_inline(spark, emb, tmp_path_factory):
    """ivfpq_probe over the persisted artifact returns the exact rows
    of the retrain-inline ivfpq_topk — the hash-match contract."""
    from geo_big_data_analysis_spark.operators.similarity import (
        ivfpq_probe,
        ivfpq_topk,
        label_centroids,
        pq_encode,
        pq_train,
    )

    d = str(tmp_path_factory.mktemp("ivfpq_probe"))
    build_ivfpq_index(spark, emb, d, fingerprint="fp1", **PARAMS)
    codes, centers, cbs, _ = load_ivfpq_index(spark, d)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    stored = ivfpq_probe(
        queries, codes, cbs, centers, k=5, nprobe=3, scale=PARAMS["scale"]
    )

    cbs_i = pq_train(emb, **PARAMS)
    codes_i = pq_encode(emb, cbs_i, scale=PARAMS["scale"])
    centers_i = label_centroids(emb, "embedding", "label")
    inline = ivfpq_topk(
        queries, emb, codes_i, cbs_i, k=5,
        centers=centers_i, nprobe=3, scale=PARAMS["scale"],
    )
    key = ["query_id", "pq_rank"]
    a = {tuple(r) for r in stored.select(*key, "neighbor_id", "adc_dist").collect()}
    b = {tuple(r) for r in inline.select(*key, "neighbor_id", "adc_dist").collect()}
    assert a == b and len(a) > 0


def test_ensure_caches_and_rebuilds_on_fingerprint(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ann_root"))
    codes1, centers1, cbs1, meta1 = ensure_ivfpq_index(
        spark, sf_dir, base_dir=root, **PARAMS
    )
    dirs1 = set(os.listdir(root))
    assert len(dirs1) == 1
    # second ensure: pure load, no new artifact
    _codes2, _c2, cbs2, meta2 = ensure_ivfpq_index(
        spark, sf_dir, base_dir=root, **PARAMS
    )
    assert set(os.listdir(root)) == dirs1
    assert cbs2 == cbs1 and meta2["fingerprint"] == meta1["fingerprint"]
    # changed params → different artifact key → fresh build
    ensure_ivfpq_index(
        spark, sf_dir, base_dir=root,
        dim=64, m=8, k=4, iters=2, scale=1000,
    )
    assert len(os.listdir(root)) == 2


def test_fingerprint_tracks_file_change(tmp_path):
    p = tmp_path / "embeddings.parquet"
    p.write_bytes(b"a" * 10)
    f1 = _embeddings_fingerprint(str(tmp_path))
    p.write_bytes(b"b" * 11)
    f2 = _embeddings_fingerprint(str(tmp_path))
    assert f1 != f2
