"""Skyline operator: distributed two-phase result ≡ brute-force
dominance over all pairs, on seeded random point sets (2-D and 3-D,
with duplicate and collinear points mixed in)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geo_big_data_analysis_spark.operators.skyline import _skyline_kernel, skyline


def _brute(pdf: pd.DataFrame, minimize, maximize) -> set:
    obj = np.column_stack(
        [pdf[c].to_numpy(dtype=float) for c in minimize]
        + [-pdf[c].to_numpy(dtype=float) for c in maximize]
    )
    keep = set()
    n = len(pdf)
    for i in range(n):
        dominated = False
        for j in range(n):
            if i == j:
                continue
            if (obj[j] <= obj[i]).all() and (obj[j] < obj[i]).any():
                dominated = True
                break
        if not dominated:
            keep.add(int(pdf.iloc[i]["pid"]))
    return keep


def _random_points(seed: int, n: int, dims: int, discrete: bool) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    cols = {}
    for d in range(dims):
        vals = rng.integers(0, 8, n).astype(float) if discrete else rng.random(n)
        cols[f"x{d}"] = vals
    cols["pid"] = np.arange(n)
    return pd.DataFrame(cols)


@pytest.mark.parametrize("seed,dims,discrete", [(1, 2, False), (2, 2, True), (3, 3, True), (4, 3, False)])
def test_kernel_matches_bruteforce(seed, dims, discrete):
    pdf = _random_points(seed, 200, dims, discrete)
    minimize = [f"x{d}" for d in range(dims - 1)]
    maximize = [f"x{dims-1}"]
    got = set(_skyline_kernel(pdf, minimize, maximize)["pid"].astype(int))
    assert got == _brute(pdf, minimize, maximize)


def test_distributed_matches_bruteforce(spark):
    pdf = _random_points(7, 500, 2, True)
    df = spark.createDataFrame(pdf).repartition(8)
    got = {int(r.pid) for r in skyline(df, minimize=["x0"], maximize=["x1"]).collect()}
    assert got == _brute(pdf, ["x0"], ["x1"])


def test_skyline_parts_is_mutually_nondominated(spark):
    from geo_big_data_analysis_spark.plans.registry import REGISTRY

    rows = REGISTRY["skyline_parts"][0](spark, "/root/testdata/sf0.001").collect()
    assert rows
    for a in rows:
        for b in rows:
            if a.p_partkey == b.p_partkey:
                continue
            dominates = (
                b.p_retailprice <= a.p_retailprice
                and b.p_size >= a.p_size
                and (b.p_retailprice < a.p_retailprice or b.p_size > a.p_size)
            )
            assert not dominates
