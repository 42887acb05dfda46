"""Two-phase global window primitives vs naive single-partition truth.

The operator contract: identical values to a global Window.orderBy, but
with the data range-partitioned (no single-partition WindowExec).
"""

import pyspark.sql.functions as F
import pytest

from geo_big_data_analysis_spark.operators import two_phase as tp


@pytest.fixture(scope="module")
def numbers(spark):
    # values with ties, deliberately spread over many input partitions
    rows = [(i, (i * 37) % 11, f"u{i:03d}") for i in range(500)]
    return spark.createDataFrame(rows, ["row_id", "v", "name"]).repartition(13)


def test_global_row_number_matches_enumerate(numbers):
    got = {
        r.row_id: r.rn
        for r in tp.global_row_number(
            numbers, [F.col("v").asc(), F.col("row_id").asc()]
        ).collect()
    }
    expected_order = sorted(range(500), key=lambda i: ((i * 37) % 11, i))
    for pos, row_id in enumerate(expected_order, start=1):
        assert got[row_id] == pos
    assert len(got) == 500


def test_global_row_number_is_bigint(numbers):
    df = tp.global_row_number(numbers, [F.col("row_id").asc()])
    assert dict(df.dtypes)["rn"] == "bigint"


def test_global_cumsum_matches_python(numbers):
    got = {
        r.row_id: r.cum
        for r in tp.global_cumsum(
            numbers, [F.col("v").desc(), F.col("row_id").asc()], "v"
        ).collect()
    }
    acc = 0
    for i in sorted(range(500), key=lambda i: (-((i * 37) % 11), i)):
        acc += (i * 37) % 11
        assert got[i] == acc


def test_global_rank_tie_semantics(numbers):
    got = {
        r.row_id: r.rank
        for r in tp.global_rank(
            numbers, [F.col("v").desc()], rank_keys=["v"]
        ).collect()
    }
    vals = sorted(((i * 37) % 11 for i in range(500)), reverse=True)
    first_pos = {}
    for pos, v in enumerate(vals, start=1):
        first_pos.setdefault(v, pos)
    for i in range(500):
        assert got[i] == first_pos[(i * 37) % 11]


def test_global_avg_rank_matches_pandas(numbers):
    got = {
        r.row_id: r.avg_rank
        for r in tp.global_avg_rank(
            numbers, [F.col("v").desc(), F.col("row_id").asc()], rank_keys=["v"]
        ).collect()
    }
    import pandas as pd

    vals = pd.Series([(i * 37) % 11 for i in range(500)])
    ref = vals.rank(ascending=False, method="average")
    for i in range(500):
        assert got[i] == ref[i]


def test_no_unpartitioned_window_in_plan(numbers):
    plan = tp.global_row_number(
        numbers, [F.col("v").asc(), F.col("row_id").asc()]
    )._jdf.queryExecution().executedPlan().toString()
    # every Window in the plan must be keyed (on the internal pid)
    for line in plan.splitlines():
        if "Window " in line and "row_number" in line:
            assert "__tp_pid" in line


def test_empty_input(spark):
    empty = spark.createDataFrame([], "row_id bigint, v bigint")
    assert tp.global_row_number(empty, [F.col("row_id").asc()]).count() == 0
    assert tp.global_cumsum(empty, [F.col("row_id").asc()], "v").count() == 0
