"""2-D kernel density estimation on a grid (A13).

Reference semantics: ``gaussian_kde`` heat surfaces over lon/lat —
lab4 yelp_analysis.ipynb (cell 18, json 1528); analyze_data_bias.py:369-387.

Spark-first: exact KDE is O(points × eval-grid); the scalable engine
form is density-on-a-grid — bin points to cells (one shuffle on an
integer cell key), then convolve with a small Gaussian stencil by
exploding each cell's count to its neighbor offsets and re-aggregating
(second integer-key shuffle, data size = cells × 9, independent of the
point count). At 100 TB the stencil pass touches only the binned grid,
never the raw points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 3×3 binomial approximation of a Gaussian kernel, σ≈0.85 cell; weights
# sum to 16 so the smoothed surface preserves total mass.
_KERNEL = [
    (-1, -1, 1), (-1, 0, 2), (-1, 1, 1),
    (0, -1, 2), (0, 0, 4), (0, 1, 2),
    (1, -1, 1), (1, 0, 2), (1, 1, 1),
]


def bin_counts(points: DataFrame, gx_col, gy_col) -> DataFrame:
    """Histogram pass: (gx, gy, n)."""
    return points.groupBy(
        F.col(gx_col).alias("gx"), F.col(gy_col).alias("gy")
    ).agg(F.count(F.lit(1)).alias("n"))


def gaussian_smooth(grid: DataFrame) -> DataFrame:
    """3×3 Gaussian-stencil smoothing of a (gx, gy, n) grid →
    (gx, gy, density). Cells that receive only spilled-over mass from
    neighbors appear in the output (same as a dense convolution over
    the occupied envelope)."""
    kernel = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(w).alias("w"))
            for dx, dy, w in _KERNEL
        ]
    )
    spread = grid.select(
        "gx", "gy", "n", F.explode(kernel).alias("k")
    ).select(
        (F.col("gx") + F.col("k.dx")).alias("gx"),
        (F.col("gy") + F.col("k.dy")).alias("gy"),
        (F.col("n") * F.col("k.w") / F.lit(16.0)).alias("contrib"),
    )
    return spread.groupBy("gx", "gy").agg(F.sum("contrib").alias("density"))


def kde_grid(points: DataFrame, gx_col, gy_col) -> DataFrame:
    """bin → smooth, the full A13 surface."""
    return gaussian_smooth(bin_counts(points, gx_col, gy_col))
