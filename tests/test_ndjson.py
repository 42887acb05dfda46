"""NDJSON source tests (S4 malformed-skip, S5 semi-join pushdown)."""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType

from geo_big_data_analysis_spark.sources.ndjson import read_ndjson, read_ndjson_semi

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("city", StringType())]
)


def _write_lines(tmp_path, lines):
    p = tmp_path / "data.ndjson"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_ndjson_splits_good_and_corrupt(spark, tmp_path):
    path = _write_lines(
        tmp_path,
        [
            '{"id": 1, "city": "nola"}',
            "this is not json {{{",
            '{"id": 2, "city": "nyc"}',
            '{"id": 3 "city": "broken"}',
        ],
    )
    good, bad = read_ndjson(spark, path, SCHEMA)
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    raws = [r["raw_line"] for r in bad.collect()]
    assert len(raws) == 2 and "not json" in raws[0] + raws[1]


def test_read_ndjson_all_good_inferred_schema(spark, tmp_path):
    path = _write_lines(tmp_path, ['{"id": 1, "city": "a"}', '{"id": 2, "city": "b"}'])
    good, bad = read_ndjson(spark, path)
    assert good.count() == 2 and bad.count() == 0


def test_read_ndjson_semi_pushdown(spark, tmp_path):
    path = _write_lines(
        tmp_path,
        ['{"id": %d, "city": "c%d"}' % (i, i % 3) for i in range(10)],
    )
    ids = spark.createDataFrame([(2,), (5,), (7,), (99,)], "id bigint")
    out = read_ndjson_semi(spark, path, ids, "id", SCHEMA)
    assert sorted(r["id"] for r in out.collect()) == [2, 5, 7]
    # the semi side must not add columns
    assert set(out.columns) == {"id", "city"}


def test_checkpoint_or_recompute(spark, tmp_path):
    from geo_big_data_analysis_spark.plans.checkpoint import checkpoint_or_recompute

    calls = []

    def compute():
        calls.append(1)
        return spark.range(5).withColumnRenamed("id", "v")

    path = str(tmp_path / "ckpt.parquet")
    a = checkpoint_or_recompute(spark, path, compute)
    b = checkpoint_or_recompute(spark, path, compute)
    assert a.count() == 5 and b.count() == 5
    assert len(calls) == 1  # second call served from the checkpoint
    c = checkpoint_or_recompute(spark, path, compute, overwrite=True)
    assert c.count() == 5 and len(calls) == 2
