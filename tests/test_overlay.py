"""Segment×grid overlay (J6/G9) and hull-membership (G6) tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from geo_big_data_analysis_spark.graph.algorithms import convex_hull, points_in_hull
from geo_big_data_analysis_spark.operators.spatial_join import segment_grid_overlap


def _segs(spark, rows):
    return spark.createDataFrame(rows, "seg_id bigint, x1 double, y1 double, x2 double, y2 double")


def test_segment_within_one_cell(spark):
    # wholly inside cell (0,0) of a unit grid
    out = segment_grid_overlap(
        _segs(spark, [(1, 0.1, 0.1, 0.4, 0.5)]), 0.0, 0.0, 1.0
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["gx"], r["gy"]) == (0, 0)
    assert r["overlap_len"] == pytest.approx(math.hypot(0.3, 0.4))


def test_segment_split_across_two_cells(spark):
    # horizontal segment from x=0.5 to x=1.5 at y=0.5: half in each cell
    out = {
        (r["gx"], r["gy"]): r["overlap_len"]
        for r in segment_grid_overlap(
            _segs(spark, [(1, 0.5, 0.5, 1.5, 0.5)]), 0.0, 0.0, 1.0
        ).collect()
    }
    assert out[(0, 0)] == pytest.approx(0.5)
    assert out[(1, 0)] == pytest.approx(0.5)


def test_diagonal_through_four_cells_total_length_conserved(spark):
    # diagonal of a 2x2 grid: total overlap == segment length
    out = segment_grid_overlap(
        _segs(spark, [(1, 0.0, 0.0, 2.0, 2.0)]), 0.0, 0.0, 1.0
    )
    total = out.agg(F.sum("overlap_len")).collect()[0][0]
    assert total == pytest.approx(math.hypot(2.0, 2.0))
    # touches (0,0),(1,1) with full diagonals; corner cells (0,1),(1,0) get 0
    cells = {(r["gx"], r["gy"]) for r in out.collect()}
    assert (0, 0) in cells and (1, 1) in cells


def test_vertical_segment_degenerate_axis(spark):
    out = {
        (r["gx"], r["gy"]): r["overlap_len"]
        for r in segment_grid_overlap(
            _segs(spark, [(1, 0.5, -0.25, 0.5, 0.75)]), 0.0, 0.0, 1.0
        ).collect()
    }
    assert out[(0, -1)] == pytest.approx(0.25)
    assert out[(0, 0)] == pytest.approx(0.75)


def test_point_segment_contributes_nothing(spark):
    out = segment_grid_overlap(
        _segs(spark, [(1, 0.5, 0.5, 0.5, 0.5)]), 0.0, 0.0, 1.0
    ).collect()
    assert out == []


def test_hull_and_membership(spark):
    pts = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(
            [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (1, 3)]
        )],
        "id bigint, x double, y double",
    )
    hull = convex_hull(pts)
    assert sorted(hull) == [(0.0, 0.0), (0.0, 4.0), (4.0, 0.0), (4.0, 4.0)]
    probe = spark.createDataFrame(
        [(1, 2.0, 2.0), (2, 5.0, 5.0), (3, 0.0, 2.0)], "id bigint, x double, y double"
    )
    inside = {r["id"] for r in points_in_hull(probe, hull).collect()}
    assert inside == {1, 3}  # boundary counts as inside, exterior excluded
