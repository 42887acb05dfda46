"""Slowly-changing-dimension type 2 without a transactional format.

Spark has no MERGE INTO over plain parquet; the engine's SCD2 is the
anti-join/union/window emulation the warehouse world uses pre-Delta:
collapse a keyed event stream into versioned validity ranges
(gaps-and-islands), and merge a batch of updates into an existing SCD2
table by re-collapsing open rows ∪ updates while closed history passes
through untouched.

Scale shape: ONE hash exchange on the key feeds both the change-point
window and the range assembly (lead over the same partitioning — Spark
reuses the sort); closed history never shuffles. No driver state, no
per-key loops; ties in the version ordering are excluded by contract
((key, ts) unique — assert upstream with dedup_by_key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    updates: DataFrame,
    key: str,
    state_col: str,
    ts_col: str,
) -> DataFrame:
    """Collapse (key, state, ts) observations into SCD2 version rows
    ``(key, state, effective_from, effective_to, is_current)``:
    consecutive observations with unchanged state merge into one
    validity range; a state's range ends when the next different state
    begins (effective_to = next effective_from; null while current)."""
    w = Window.partitionBy(key).orderBy(ts_col)
    marked = updates.select(key, state_col, ts_col).withColumn(
        "_chg",
        (
            F.lag(state_col).over(w).isNull()
            | (F.col(state_col) != F.lag(state_col).over(w))
        ).cast("int"),
    )
    points = marked.filter(F.col("_chg") == 1)
    wv = Window.partitionBy(key).orderBy(ts_col)
    return (
        points.withColumn("effective_to", F.lead(ts_col).over(wv))
        .select(
            key,
            state_col,
            F.col(ts_col).alias("effective_from"),
            "effective_to",
            F.col("effective_to").isNull().alias("is_current"),
        )
    )


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    state_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """MERGE a batch of (key, state, ts) updates into an SCD2 table
    (schema as produced by :func:`scd2_collapse`). Closed versions are
    immutable passthrough; open versions re-enter the collapse as an
    observation at their own effective_from, so an update only creates
    a new version when the state actually changed (idempotent: merging
    the same batch twice yields the same table)."""
    closed = current.filter(F.col("effective_to").isNotNull()).select(
        key, state_col, "effective_from", "effective_to", "is_current"
    )
    open_obs = current.filter(F.col("effective_to").isNull()).select(
        F.col(key),
        F.col(state_col),
        F.col("effective_from").alias(ts_col),
    )
    merged_open = scd2_collapse(
        open_obs.unionByName(updates.select(key, state_col, ts_col).dropDuplicates([key, ts_col])),
        key,
        state_col,
        ts_col,
    )
    return closed.unionByName(merged_open)
