"""OSM XML source (S12) tests — parse a crafted city-block extract."""

from __future__ import annotations

from geo_big_data_analysis_spark.sources.osm import osm_edge_lengths, read_osm_xml

OSM_DOC = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="test">
  <node id="1" lat="40.700" lon="-74.000"><tag k="name" v="a"/></node>
  <node id="2" lat="40.701" lon="-74.000"/>
  <node id="3" lat="40.701" lon="-73.999"/>
  <node id="4" lat="40.750" lon="-74.050"/>
  <way id="100">
    <nd ref="1"/><nd ref="2"/><nd ref="3"/>
    <tag k="highway" v="residential"/>
  </way>
  <way id="101">
    <nd ref="3"/><nd ref="1"/>
    <tag k="highway" v="primary"/><tag k="oneway" v="yes"/>
  </way>
  <way id="200">
    <nd ref="1"/><nd ref="4"/>
    <tag k="waterway" v="river"/>
  </way>
</osm>
"""


def _write(tmp_path):
    p = tmp_path / "block.osm"
    p.write_text(OSM_DOC)
    return str(p)


def test_read_osm_xml_nodes_edges(spark, tmp_path):
    nodes, edges = read_osm_xml(spark, _write(tmp_path))
    assert nodes.count() == 4
    n1 = nodes.filter("node_id = 1").collect()[0]
    assert n1["lat"] == 40.700 and n1["tags"]["name"] == "a"
    e = {(r["way_id"], r["seq"]): (r["src"], r["dst"], r["highway"], r["oneway"]) for r in edges.collect()}
    # way 100 -> two consecutive-pair edges; way 101 -> one oneway edge;
    # the waterway is filtered by highway_only
    assert e == {
        (100, 0): (1, 2, "residential", False),
        (100, 1): (2, 3, "residential", False),
        (101, 0): (3, 1, "primary", True),
    }
    _, all_edges = read_osm_xml(spark, _write(tmp_path), highway_only=False)
    assert all_edges.count() == 4


def test_osm_edges_feed_graph_sssp(spark, tmp_path):
    """End-to-end S12->G5->G4: parse, weight with haversine lengths,
    run weighted SSSP over the parsed street network."""
    from geo_big_data_analysis_spark.graph.algorithms import sssp

    nodes, edges = read_osm_xml(spark, _write(tmp_path))
    weighted = osm_edge_lengths(nodes, edges)
    lens = {(r["src"], r["dst"]): r["length_km"] for r in weighted.collect()}
    assert abs(lens[(1, 2)] - 0.11119) < 1e-3  # 0.001 deg lat
    dist = {
        r["id"]: r["dist"]
        for r in sssp(
            weighted.selectExpr("src", "dst", "length_km AS weight"), 1, directed=False
        ).collect()
    }
    assert dist[1] == 0.0
    assert 0 < dist[3] <= lens[(1, 2)] + lens[(2, 3)] + 1e-9


def test_write_html_report(spark, tmp_path):
    from geo_big_data_analysis_spark.sources.sinks import write_html_report

    import pytest as _pytest

    agg = spark.createDataFrame([("a", 1), ("<b>", 2)], "k string, n int")
    out = str(tmp_path / "report.html")
    write_html_report({"census": agg}, out, title="T & T")
    html = open(out).read()
    assert "<h2>census</h2>" in html and "&lt;b&gt;" in html and "T &amp; T" in html
    with _pytest.raises(ValueError, match="max_rows"):
        write_html_report({"big": spark.range(10).toDF("id")}, out, max_rows=5)


def test_filter_geometry_type_mixed_featurecollection(spark, tmp_path):
    """F19 — mixed-geometry FeatureCollection: type filter + Point
    promotion."""
    import json

    from geo_big_data_analysis_spark.sources.geojson import (
        filter_geometry_type,
        read_geojson_features,
    )

    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [-74.0, 40.7]},
         "properties": {"name": "a"}},
        {"type": "Feature", "geometry": {"type": "LineString",
         "coordinates": [[-74.0, 40.7], [-74.1, 40.8]]}, "properties": {"name": "b"}},
        {"type": "Feature", "geometry": {"type": "Polygon",
         "coordinates": [[[-74, 40], [-74, 41], [-73, 41], [-74, 40]]]},
         "properties": {"name": "c"}},
    ]}
    p = tmp_path / "mixed.geojson"
    p.write_text(json.dumps(fc))
    df = read_geojson_features(spark, str(p))
    assert df.count() == 3
    pts = filter_geometry_type(df, ["Point"]).collect()
    assert len(pts) == 1 and pts[0]["lon"] == -74.0 and pts[0]["lat"] == 40.7
    assert filter_geometry_type(df, ["LineString", "Polygon"]).count() == 2
