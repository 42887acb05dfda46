"""Convex-polygon ∩ bbox clipping (Sutherland–Hodgman) and shoelace
area as pure column expressions — the polygon-overlay primitive
(zonal statistics, area-weighted interpolation) the engine previously
had only for line segments (Liang-Barsky in `road_density_grid`).

The polygon is an ``array<struct<x double, y double>>`` column. The
clip unrolls the four half-plane passes (x ≥ xmin, x ≤ xmax, y ≥ ymin,
y ≤ ymax); each pass walks the vertex ring once via
``flatten(transform(...))`` emitting 0–2 points per edge with the
standard Sutherland–Hodgman case table, entirely inside whole-stage
codegen. The DuckDB twin (`*_duckdb`) builds the identical algorithm
from list comprehensions, so clipped rings — and their shoelace areas —
match vertex-for-vertex across engines.

Scale: per-row bounded work (ring length ≤ input vertices + 4); the
clip is a map, composable under the covering-cell equi-join for
polygon-vs-grid overlays (clip each polygon against each covering
cell's bbox — the J6 strategy lifted from lines to areas).
"""

from __future__ import annotations


def _pass_spark(p: str, inside: str, isect: str) -> str:
    """One Sutherland–Hodgman half-plane pass over ring ``p`` (Spark
    SQL). ``inside`` / ``isect`` are templates using S and E markers."""
    s = f"element_at({p}, i)"
    e = f"element_at({p}, i % size({p}) + 1)"
    in_s = inside.replace("__P__", s)
    in_e = inside.replace("__P__", e)
    x = isect.replace("__S__", s).replace("__E__", e)
    return (
        f"CASE WHEN size({p}) = 0 THEN {p} ELSE "
        f"flatten(transform(sequence(1, size({p})), i -> "
        f"CASE WHEN ({in_e}) AND ({in_s}) THEN array({e}) "
        f"WHEN ({in_e}) THEN array({x}, {e}) "
        f"WHEN ({in_s}) THEN array({x}) "
        f"ELSE cast(array() as array<struct<x: double, y: double>>) END)) END"
    )


def _pass_duckdb(p: str, inside: str, isect: str) -> str:
    s = f"list_extract({p}, i)"
    e = f"list_extract({p}, i % len({p}) + 1)"
    in_s = inside.replace("__P__", s)
    in_e = inside.replace("__P__", e)
    x = isect.replace("__S__", s).replace("__E__", e)
    return (
        f"CASE WHEN len({p}) = 0 THEN {p} ELSE "
        f"flatten([CASE WHEN ({in_e}) AND ({in_s}) THEN [{e}] "
        f"WHEN ({in_e}) THEN [{x}, {e}] "
        f"WHEN ({in_s}) THEN [{x}] "
        f"ELSE [] END for i in range(1, len({p}) + 1)]) END"
    )


def _edges(xmin, xmax, ymin, ymax, spark: bool):
    """Bounds may be floats OR SQL sub-expressions (strings) — the
    zonal overlay clips against per-row cell corners."""
    ns = "named_struct('x', {x}, 'y', {y})" if spark else "{{'x': {x}, 'y': {y}}}"

    def bnd(v):
        return repr(v) if isinstance(v, (int, float)) else f"({v})"

    def vx(bound):  # intersection with vertical line x = bound
        t = f"(({bound}) - __S__.x) / (__E__.x - __S__.x)"
        return ns.format(x=f"({bound}) + 0.0" ,
                         y=f"__S__.y + (__E__.y - __S__.y) * ({t})")

    def hy(bound):  # intersection with horizontal line y = bound
        t = f"(({bound}) - __S__.y) / (__E__.y - __S__.y)"
        return ns.format(x=f"__S__.x + (__E__.x - __S__.x) * ({t})",
                         y=f"({bound}) + 0.0")

    return [
        (f"__P__.x >= {bnd(xmin)}", vx(bnd(xmin))),
        (f"__P__.x <= {bnd(xmax)}", vx(bnd(xmax))),
        (f"__P__.y >= {bnd(ymin)}", hy(bnd(ymin))),
        (f"__P__.y <= {bnd(ymax)}", hy(bnd(ymax))),
    ]


def clip_polygon_bbox_spark(poly: str, xmin: float, xmax: float,
                            ymin: float, ymax: float) -> str:
    """Spark-SQL expression: ``poly`` clipped to the bbox. Each pass
    binds its input ring ONCE via a single-element transform lambda
    (a let-binding): naive textual nesting duplicates the previous
    pass at every reference site (~10x growth per pass, a ~1 MB
    expression), and splitting passes across withColumns doesn't help
    because Catalyst's projection collapse re-inlines them. The lambda
    variable is opaque to collapse and codegen evaluates each bound
    ring exactly once per row."""
    expr = poly
    for n, (inside, isect) in enumerate(
        _edges(xmin, xmax, ymin, ymax, spark=True)
    ):
        var = f"__pc{n}"
        body = _pass_spark(var, inside, isect)
        expr = f"element_at(transform(array({expr}), {var} -> ({body})), 1)"
    return expr


def clip_passes_duckdb(xmin: float, xmax: float,
                       ymin: float, ymax: float) -> list:
    """DuckDB twins; apply each pass in its own chained CTE."""
    return [
        (lambda p, i=inside, x=isect: _pass_duckdb(p, i, x))
        for inside, isect in _edges(xmin, xmax, ymin, ymax, spark=False)
    ]


def shoelace_area_spark(poly: str) -> str:
    """|shoelace|/2 of a ring column (0.0 for rings with < 3 points)."""
    cross = (
        f"aggregate(sequence(1, size({poly})), cast(0.0 as double), (a, i) -> a + "
        f"(element_at({poly}, i).x * element_at({poly}, i % size({poly}) + 1).y"
        f" - element_at({poly}, i % size({poly}) + 1).x * element_at({poly}, i).y))"
    )
    return f"CASE WHEN size({poly}) < 3 THEN 0.0D ELSE abs({cross}) / 2.0D END"


def shoelace_area_duckdb(poly: str) -> str:
    cross = (
        f"list_sum([list_extract({poly}, i)['x']"
        f" * list_extract({poly}, i % len({poly}) + 1)['y']"
        f" - list_extract({poly}, i % len({poly}) + 1)['x']"
        f" * list_extract({poly}, i)['y']"
        f" for i in range(1, len({poly}) + 1)])"
    )
    return (
        f"CASE WHEN len({poly}) < 3 THEN 0.0 ELSE abs({cross}) / 2.0 END"
    )
