"""Grid-partitioned spatial joins — the engine's core physical strategy.

The reference does spatial joins via geopandas sjoin / nested loops
(lab2 nb cell 20 point-in-Voronoi; lab3a cell 15 POI-in-isochrone;
lab3c cell 5 O(cells×edges) grid×road intersection). The scalable
re-expression: assign covering grid-cell ids to BOTH sides, equi-join on
the cell id (hash shuffle — Catalyst handles it), then refine with the
exact geometric predicate. At 100 TB the cell id is also the storage
partition key, so the join degenerates to co-located per-cell work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import grid_cell


def tag_cells(
    df: DataFrame, lat: str, lon: str, origin_lat: float, origin_lon: float, cell_deg: float
) -> DataFrame:
    gx, gy = grid_cell(lat, lon, origin_lat, origin_lon, cell_deg)
    return df.withColumn("gx", gx).withColumn("gy", gy)


def point_in_rect_join(
    points: DataFrame,
    rects: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    lon_min: str = "cell_lon_min",
    lat_min: str = "cell_lat_min",
    lon_max: str = "cell_lon_max",
    lat_max: str = "cell_lat_max",
    how: str = "inner",
    broadcast_rects: bool = True,
) -> DataFrame:
    """J5 (axis-aligned polygon case): point-within-rectangle join.

    When the rectangle side is small (Voronoi cells, isochrone hulls,
    analysis grids — hundreds to thousands of rows) broadcast it; the
    join is then a map-side nested loop with a cheap predicate and no
    shuffle of the big point table.
    """
    rhs = F.broadcast(rects) if broadcast_rects else rects
    pred = (
        (F.col(lon) >= F.col(lon_min))
        & (F.col(lon) < F.col(lon_max))
        & (F.col(lat) >= F.col(lat_min))
        & (F.col(lat) < F.col(lat_max))
    )
    return points.join(rhs, pred, how)


def point_in_cell_join(
    points: DataFrame,
    cells: DataFrame,
    lat: str,
    lon: str,
    origin_lat: float,
    origin_lon: float,
    cell_deg: float,
    how: str = "inner",
) -> DataFrame:
    """J5 (general case): tag points with (gx, gy) → equi-join with a
    cell table keyed by (gx, gy). Pure hash join, shuffles only on the
    integer cell key — the scalable plan shape for point-in-polygon when
    the polygon side is itself huge (each polygon pre-expanded to its
    covering cells; refinement predicate applied after the equi-join)."""
    tagged = tag_cells(points, lat, lon, origin_lat, origin_lon, cell_deg)
    return tagged.join(cells, ["gx", "gy"], how)


def point_in_polygon_refine(df: DataFrame, lat: str, lon: str, poly_col: str):
    """Exact point-in-polygon refinement over WKT polygons via a
    vectorized pandas UDF (ray casting). Used after the cell equi-join
    has cut candidates to co-located pairs."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _pip(lats, lons, polys):
        import numpy as np

        out = []
        cache: dict[str, tuple] = {}
        for la, lo, wkt in zip(lats, lons, polys):
            if wkt not in cache:
                body = wkt.strip()[len("POLYGON ((") : -2]
                pts = [tuple(map(float, p.split())) for p in body.split(", ")]
                cache[wkt] = (np.array([p[0] for p in pts]), np.array([p[1] for p in pts]))
            xs, ys = cache[wkt]
            x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
            crossing = ((ys > la) != (y2 > la)) & (
                lo < (x2 - xs) * (la - ys) / (y2 - ys) + xs
            )
            out.append(bool(np.count_nonzero(crossing) % 2))
        return pd.Series(out)

    return df.filter(_pip(F.col(lat), F.col(lon), F.col(poly_col)))
