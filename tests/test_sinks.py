"""Sink tests (S15/S16/S9)."""

from __future__ import annotations

import json

import pytest

from geo_big_data_analysis_spark.sources.sinks import (
    write_csv,
    write_graph,
    write_json_stats,
    write_parquet_checkpoint,
)


def test_parquet_checkpoint_roundtrip(spark, tmp_path):
    df = spark.range(10).withColumnRenamed("id", "v")
    p = str(tmp_path / "ck.parquet")
    write_parquet_checkpoint(df, p)
    assert spark.read.parquet(p).count() == 10


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string")
    p = str(tmp_path / "out.csv")
    write_csv(df, p)
    back = spark.read.option("header", "true").csv(p)
    assert sorted(r["s"] for r in back.collect()) == ["a", "b"]


def test_json_stats_payload(spark, tmp_path):
    df = spark.createDataFrame([("x", 1.5), ("y", 2.5)], "k string, v double")
    p = str(tmp_path / "stats.json")
    meta = write_json_stats(df, p)
    assert meta["rows"] == 2
    payload = json.load(open(p))
    assert {d["k"]: d["v"] for d in payload} == {"x": 1.5, "y": 2.5}


def test_json_stats_rejects_big_tables(spark, tmp_path):
    with pytest.raises(ValueError):
        write_json_stats(spark.range(100), str(tmp_path / "big.json"), max_rows=10)


def test_write_graph_pair(spark, tmp_path):
    nodes = spark.createDataFrame([(1, 0.0, 0.0)], "id bigint, lon double, lat double")
    edges = spark.createDataFrame([(1, 1, 5.0)], "src bigint, dst bigint, length_m double")
    base = str(tmp_path / "graph")
    write_graph(nodes, edges, base)
    assert spark.read.parquet(f"{base}/nodes.parquet").count() == 1
    assert spark.read.parquet(f"{base}/edges.parquet").columns == ["src", "dst", "length_m"]
