"""jaro_winkler column expression vs the literature values and vs
DuckDB's independent C++ implementation on randomized-ish pairs."""

from __future__ import annotations

import itertools

import duckdb

from geo_big_data_analysis_spark.functions.strings import jaro_winkler


LITERATURE = [
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("dwayne", "duane", 0.8400000000000001),
    ("abc", "abc", 1.0),
    ("abc", "xyz", 0.0),
    ("ab", "ba", 0.0),  # window 0: adjacent transposition scores 0
    ("", "", 0.0),  # DuckDB convention
    ("a", "a", 1.0),
]


def test_jw_literature_pairs(spark):
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in LITERATURE], "a string, b string"
    ).withColumn("jw", jaro_winkler("a", "b"))
    got = {(r["a"], r["b"]): r["jw"] for r in df.collect()}
    for a, b, expect in LITERATURE:
        assert abs(got[(a, b)] - expect) < 1e-9, (a, b, got[(a, b)], expect)


def test_jw_matches_duckdb_exhaustive(spark):
    words = [
        "martha", "marhta", "dixon", "dicksonx", "crate", "trace",
        "arnab", "aranb", "customer", "customs", "aaaa", "aaa", "a", "",
        "goldenrod lavender spring chocolate lace",
        "goldenrod lavendar sprig chocolate lace",
        "misty salmon antique honeydew burnished",
    ]
    pairs = list(itertools.product(words, repeat=2))
    df = spark.createDataFrame(pairs, "a string, b string").withColumn(
        "jw", jaro_winkler("a", "b")
    )
    con = duckdb.connect()
    for r in df.collect():
        d = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [r["a"], r["b"]]
        ).fetchone()[0]
        assert abs(r["jw"] - d) < 1e-9, (r["a"], r["b"], r["jw"], d)


def test_jw_null_propagates(spark):
    df = spark.createDataFrame(
        [("abc", None), (None, None)], "a string, b string"
    ).withColumn("jw", jaro_winkler("a", "b"))
    assert [r["jw"] for r in df.collect()] == [None, None]


def test_jw_pandas_matches_expression_and_duckdb(spark):
    """The Arrow-batched scalar (the geocode hot path) must agree with
    BOTH the codegen expression and DuckDB's C++ implementation —
    exactly, because the geocode oracle rounds it to 6dp and a 1-ulp
    drift could flip a rank-1 tie."""
    import random

    from geo_big_data_analysis_spark.functions.strings import (
        _jw_py,
        jaro_winkler_pandas,
    )

    rng = random.Random(7)
    alpha = "abcdef "
    words = [""] + [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 24)))
        for _ in range(60)
    ]
    pairs = [(rng.choice(words), rng.choice(words)) for _ in range(300)]
    df = (
        spark.createDataFrame(pairs, "a string, b string")
        .withColumn("jw_expr", jaro_winkler("a", "b"))
        .withColumn("jw_pd", jaro_winkler_pandas("a", "b"))
    )
    con = duckdb.connect()
    for r in df.collect():
        assert r["jw_expr"] == r["jw_pd"], (r["a"], r["b"], r["jw_expr"], r["jw_pd"])
        d = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [r["a"], r["b"]]
        ).fetchone()[0]
        assert abs(r["jw_pd"] - d) < 1e-12, (r["a"], r["b"], r["jw_pd"], d)
    # scalar edge conventions match the expression's
    assert _jw_py(None, "x") is None
    assert _jw_py("", "") == 0.0
    assert _jw_py("ab", "ba") == 0.0


def test_jw_pandas_null_propagates(spark):
    from geo_big_data_analysis_spark.functions.strings import jaro_winkler_pandas

    df = spark.createDataFrame(
        [("abc", None), (None, None)], "a string, b string"
    ).withColumn("jw", jaro_winkler_pandas("a", "b"))
    assert [r["jw"] for r in df.collect()] == [None, None]
