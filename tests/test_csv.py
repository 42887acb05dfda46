"""CSV source tests (S1/S2/S3) + seeded-sample determinism (F14)."""

from __future__ import annotations

import pyspark.sql.functions as F

from geo_big_data_analysis_spark.sources.csv import read_csv


def test_read_csv_schema_sep_limit(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    spark.createDataFrame(
        [(1, "01/02/2024 01:30:00 PM", 3.5), (2, "12/31/2024 11:59:59 PM", -1.0)],
        ["id", "ts", "v"],
    ).coalesce(1).write.option("header", "true").option("sep", ";").csv(p)
    df = read_csv(
        spark,
        p,
        schema="id bigint, ts string, v double",
        sep=";",
        ts_formats={"ts": "M/d/yyyy h:mm:ss a"},
    )
    rows = {r.id: r for r in df.collect()}
    assert rows[1].ts.hour == 13 and rows[1].ts.minute == 30  # PM parse
    assert rows[2].ts.hour == 23
    assert rows[1].v == 3.5
    # S1: row cap
    assert read_csv(spark, p, schema="id bigint, ts string, v double", sep=";", limit=1).count() == 1


def test_seeded_sample_is_deterministic(spark, sf_dir):
    # F14 — sample(fraction=, seed=): same seed → identical row set.
    # NB: fraction/seed MUST be keyword args — positional sample(0.2, 42)
    # binds 0.2 to withReplacement and silently drops determinism.
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = {r.event_id for r in ev.sample(fraction=0.2, seed=42).select("event_id").collect()}
    b = {r.event_id for r in ev.sample(fraction=0.2, seed=42).select("event_id").collect()}
    c = {r.event_id for r in ev.sample(fraction=0.2, seed=7).select("event_id").collect()}
    assert a == b
    n = ev.count()
    assert a != c and 0.1 * n < len(a) < 0.3 * n


def test_csv_corrupt_rows_side_output(spark, tmp_path):
    """Malformed CSV rows route to the rejects frame; good rows parse."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from geo_big_data_analysis_spark.sources.csv import read_csv_with_rejects

    p = tmp_path / "mixed.csv"
    p.write_text(
        "id,name,score\n"
        "1,alice,9.5\n"
        "2,bob,not_a_number\n"
        "3,carol,7.25\n"
        "4,dave,\n"  # empty score: valid null, NOT corrupt
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    good, rejects = read_csv_with_rejects(spark, str(p), schema)
    assert good.count() == 3
    assert {r.id for r in good.collect()} == {1, 3, 4}
    bad = rejects.collect()
    assert len(bad) == 1 and "not_a_number" in bad[0].raw_line


def test_read_csv_with_rejects_does_not_mutate_schema(spark, tmp_path):
    """StructType.add mutates in place — the reader must build a fresh
    augmented schema so the caller's object is reusable (ADVICE r1)."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from geo_big_data_analysis_spark.sources.csv import read_csv_with_rejects

    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,x\nbad_row_only_one_colum_no_wait_two,y\n2,z\n")
    schema = StructType([StructField("a", IntegerType()), StructField("b", StringType())])
    good, rejects = read_csv_with_rejects(spark, str(p), schema)
    assert len(schema.fields) == 2  # caller's schema untouched
    # second call with the SAME object must not produce a duplicate
    # _corrupt_record field
    good2, rejects2 = read_csv_with_rejects(spark, str(p), schema)
    assert good.columns == good2.columns == ["a", "b"]
    assert good.count() == good2.count()
