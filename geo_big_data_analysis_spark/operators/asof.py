"""As-of (backward) join — the time-series join Spark lacks natively.

For every left row ``(key, t)`` attach the right row with the same key
and the greatest ``rt <= t`` (pandas ``merge_asof`` backward-inclusive
semantics; the reference repo has only the interval form, SURVEY §2.3
J8 — this is the point-lookup twin, listed in the build brief as a
canonical custom operator).

Spark-first plan — NOT a per-pair range join: both sides are tagged and
unioned, then ONE shuffle partitions by key and a partition-local sort
by (t, side) lets ``last(..., ignorenulls=True)`` over an
unbounded-preceding frame carry each right row's payload forward to
every later left row. Cost is a single hash exchange + sort per call,
independent of match fan-out; a windowed NLJ or per-key explode would
be quadratic in events-per-key. Right rows sort BEFORE left rows at
equal timestamps, making the join inclusive (rt == t matches), same as
``merge_asof``. Skewed keys ride AQE; there is no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``{prefix}{right_ts}``
    and ``{prefix}{c}`` for each payload column, from the latest right
    row at-or-before its timestamp (nulls when no such row exists)."""
    lcols = left.columns
    l = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    for c in [right_ts] + payload_cols:
        l = l.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in [right_ts] + payload_cols],
    )
    for c in lcols:
        if c != key:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l.select(
        key, "__t", "__side", *[f"__r_{c}" for c in [right_ts] + payload_cols],
        *[c for c in lcols if c != key],
    ).unionByName(
        r.select(
            key, "__t", "__side", *[f"__r_{c}" for c in [right_ts] + payload_cols],
            *[c for c in lcols if c != key],
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in [right_ts] + payload_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).select(
        *lcols, *[f"{prefix}{c}" for c in [right_ts] + payload_cols]
    )
