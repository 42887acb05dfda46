"""GeoJSON source/sink + CSV point-promotion tests (S6/S7/S8)."""

from __future__ import annotations

import json

import pytest

from geo_big_data_analysis_spark.sources.geojson import (
    promote_csv_points,
    read_geojson_points,
    to_feature_structs,
    write_geojson,
)


def test_geojson_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", -74.0, 40.7), (2, "b", -73.9, 40.8)],
        "id bigint, name string, lon double, lat double",
    )
    path = str(tmp_path / "pts.geojson")
    write_geojson(df, path)
    doc = json.load(open(path))
    assert doc["type"] == "FeatureCollection" and len(doc["features"]) == 2
    f0 = doc["features"][0]
    assert f0["geometry"]["type"] == "Point"
    assert set(f0["properties"]) == {"id", "name"}

    back = read_geojson_points(spark, path)
    rows = sorted((r["id"], r["lon"], r["lat"], r["name"]) for r in back.collect())
    assert rows == [(1, -74.0, 40.7, "a"), (2, -73.9, 40.8, "b")]


def test_read_geojson_skips_non_points(spark, tmp_path):
    doc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
             "properties": {"id": 1}},
            {"type": "Feature",
             "geometry": {"type": "LineString",
                          "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
             "properties": {"id": 2}},
        ],
    }
    p = str(tmp_path / "mix.geojson")
    json.dump(doc, open(p, "w"))
    out = read_geojson_points(spark, p).collect()
    assert [r["id"] for r in out] == [1]


def test_promote_csv_points_aliases_and_cleaning(spark):
    df = spark.createDataFrame(
        [
            ("40.7", "-74.0", "ok"),
            ("not_a_number", "-74.0", "badlat"),
            ("95.0", "-74.0", "outofrange"),
            (None, "-74.0", "nulllat"),
        ],
        "Latitude string, Longitude string, tag string",
    )
    out = promote_csv_points(df)
    rows = out.collect()
    assert [r["tag"] for r in rows] == ["ok"]
    assert rows[0]["lat"] == 40.7 and rows[0]["lon"] == -74.0


def test_promote_csv_points_missing_columns_raises(spark):
    df = spark.createDataFrame([(1,)], "a bigint")
    with pytest.raises(ValueError):
        promote_csv_points(df)


def test_feature_structs_distributed(spark):
    df = spark.createDataFrame([(7, -73.5, 40.6)], "id bigint, lon double, lat double")
    s = json.loads(to_feature_structs(df).collect()[0]["feature_json"])
    assert s["geometry"]["coordinates"] == [-73.5, 40.6]
    assert s["properties"] == {"id": 7}


def _write_geojson(tmp_path):
    import json

    fc1 = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "id": 1,
             "geometry": {"type": "Point", "coordinates": [-74.0, 40.7]},
             "properties": {"name": "a", "count": 3}},
            {"type": "Feature",
             "geometry": {"type": "Point", "coordinates": [-73.9, 40.8]},
             "properties": {"name": "b", "tags": ["x", "y"]}},
            {"type": "Feature",
             "geometry": {"type": "LineString",
                          "coordinates": [[-74.0, 40.7], [-73.9, 40.8]]},
             "properties": {"name": "road"}},
            {"type": "Feature", "geometry": None, "properties": {"bad": True}},
            {"not": "a feature"},
        ],
    }
    fc2 = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "id": "f9",
             "geometry": {"type": "Point", "coordinates": [-73.8, 40.9]},
             "properties": {"name": "c"}},
        ],
    }
    (tmp_path / "a.geojson").write_text(json.dumps(fc1))
    (tmp_path / "b.geojson").write_text(json.dumps(fc2))
    return str(tmp_path)


def test_geojson_datasource_reads_directory(spark, tmp_path):
    from geo_big_data_analysis_spark.sources import geojson_datasource as gds

    path = _write_geojson(tmp_path)
    gds.register(spark)
    df = spark.read.format("geojson").load(path)
    rows = {(r["geom_type"], r["properties"].get("name")): r for r in df.collect()}
    # malformed features skipped, all geometry types kept
    assert len(rows) == 4
    pt = rows[("Point", "a")]
    assert (pt["lon"], pt["lat"]) == (-74.0, 40.7)
    assert pt["feature_id"] == "1" and pt["src_file"] == "a.geojson"
    assert pt["properties"]["count"] == "3"
    # nested property values survive as JSON strings
    assert rows[("Point", "b")]["properties"]["tags"] == '["x", "y"]'
    # non-point keeps coords in coordinates_json, lon/lat null
    line = rows[("LineString", "road")]
    assert line["lon"] is None and "[-74.0, 40.7]" in line["coordinates_json"]
    # one partition per file — files parallelize across executors
    assert df.rdd.getNumPartitions() == 2


def test_geojson_datasource_point_parity_with_json_reader(spark, tmp_path):
    """The datasource's Point view matches the existing
    spark.read.json-based S6 reader on a points-only collection."""
    import json

    from geo_big_data_analysis_spark.sources import geojson_datasource as gds
    from geo_big_data_analysis_spark.sources.geojson import read_geojson_points

    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "geometry": {"type": "Point", "coordinates": [-74.0 - i / 100, 40.7 + i / 100]},
             "properties": {"name": f"p{i}"}}
            for i in range(10)
        ],
    }
    f = tmp_path / "pts.geojson"
    f.write_text(json.dumps(fc))
    gds.register(spark)
    via_ds = {
        (r["lon"], r["lat"], r["properties"]["name"])
        for r in spark.read.format("geojson").load(str(f)).collect()
    }
    via_json = {
        (r["lon"], r["lat"], r["name"])
        for r in read_geojson_points(spark, str(f)).collect()
    }
    assert via_ds == via_json


def test_geojson_datasource_write_read_roundtrip(spark, tmp_path):
    """S8 sink via the DataSource writer: partitions write .geojsonl
    Feature files + a commit manifest; reading the directory back with
    the same format recovers every row."""
    import json as _json

    from pyspark.sql import functions as F

    from geo_big_data_analysis_spark.sources import geojson_datasource as gds

    gds.register(spark)
    df = spark.range(50).select(
        (F.lit(-74.3) + F.col("id") / 100.0).alias("lon"),
        (F.lit(40.5) + F.col("id") / 200.0).alias("lat"),
        F.concat(F.lit("site"), F.col("id")).alias("name"),
        (F.col("id") * 2).alias("score"),
    ).repartition(4)
    out = str(tmp_path / "sink")
    df.write.format("geojson").option("path", out).mode("append").save()

    manifest = _json.loads((tmp_path / "sink" / "_MANIFEST.json").read_text())
    assert manifest["total"] == 50 and len(manifest["files"]) == 4

    back = spark.read.format("geojson").load(out)
    assert back.count() == 50
    got = {
        (r["lon"], r["lat"], r["properties"]["name"], r["properties"]["score"])
        for r in back.collect()
    }
    want = {
        (r["lon"], r["lat"], r["name"], str(r["score"])) for r in df.collect()
    }
    assert got == want
    assert all(r["geom_type"] == "Point" for r in back.collect())
