"""Write-audit-publish and incremental backfill — the two pipeline-ops
patterns that make batch outputs safe to consume at 100 TB.

- **WAP** (`write_audit_publish`): never expose a partially-wrong
  dataset. Write to a staging directory, run audit predicates against
  the STAGED data, and only on all-pass atomically rename into the
  published location (directory rename is the single-FS atomic publish;
  on object stores the same contract comes from a metastore pointer
  swap). A failing audit leaves the currently-published data untouched.

- **Backfill** (`plan_backfill` / `run_backfill`): fill only the
  date partitions missing from a `dt=`-partitioned sink. The plan is a
  set difference on partition VALUES (metadata-sized), the fill writes
  only those partitions — idempotent (re-running a complete sink writes
  nothing) and surgical (existing partitions' files are never rewritten).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class AuditFailure(Exception):
    """Raised when a staged dataset fails its audits; nothing publishes."""


def write_audit_publish(
    df: DataFrame,
    publish_path: str,
    audits: list[tuple[str, Callable[[DataFrame], bool]]],
) -> list[str]:
    """Stage → audit → publish via rename swap. Returns the passed
    audit names; raises AuditFailure (leaving any existing published
    data untouched) if any audit rejects the staged data.

    Cutover window: replacing existing data takes TWO renames
    (publish → .__old__, staging → publish) — a crash between them
    leaves the dataset only in ``.__old__``. Both sides of that window
    are handled here: a stale ``.__old__`` from a prior crash is
    recovered (restored if the publish path is missing, else removed)
    BEFORE staging, and if the second rename fails the first is rolled
    back. Readers on a shared POSIX filesystem can still observe a
    missing path for the instant between the renames; for a genuinely
    atomic cutover publish to a versioned directory and swap a pointer
    (that variant is ``publish_versioned`` in this module's tests'
    scope of future work)."""
    publish_path = publish_path.rstrip("/")
    staging = publish_path + ".__staging__"
    old = publish_path + ".__old__"
    if os.path.exists(old):
        # prior crash mid-swap: restore if the publish dir vanished,
        # otherwise the swap completed and .__old__ is just debris
        if not os.path.exists(publish_path):
            os.rename(old, publish_path)
        else:
            shutil.rmtree(old)
    if os.path.exists(staging):
        shutil.rmtree(staging)
    df.write.mode("overwrite").parquet(staging)
    staged = df.sparkSession.read.parquet(staging)
    passed = []
    for name, check in audits:
        if not check(staged):
            shutil.rmtree(staging)
            raise AuditFailure(name)
        passed.append(name)
    if os.path.exists(publish_path):
        os.rename(publish_path, old)
        try:
            os.rename(staging, publish_path)
        except BaseException:
            os.rename(old, publish_path)  # roll back the first rename
            raise
        shutil.rmtree(old)
    else:
        os.rename(staging, publish_path)
    return passed


def existing_partitions(path: str) -> set[str]:
    if not os.path.isdir(path):
        return set()
    return {
        d.split("=", 1)[1]
        for d in os.listdir(path)
        if d.startswith("dt=") and os.path.isdir(os.path.join(path, d))
    }


def plan_backfill(source: DataFrame, ts_col: str, sink_path: str) -> list[str]:
    """Date partitions present in the source but absent from the sink —
    a metadata-vs-aggregate diff (the source side is one distinct-dates
    agg; the sink side is a directory listing)."""
    src_dates = {
        r.dt
        for r in source.select(
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("dt")
        )
        .distinct()
        .collect()
    }
    return sorted(src_dates - existing_partitions(sink_path))


def run_backfill(
    source: DataFrame, ts_col: str, sink_path: str
) -> list[str]:
    """Write exactly the missing partitions (dynamic partition append of
    the filtered slice). Idempotent: a complete sink plans an empty
    backfill and writes nothing."""
    missing = plan_backfill(source, ts_col, sink_path)
    if not missing:
        return []
    slice_df = source.withColumn(
        "dt", F.date_format(F.col(ts_col), "yyyy-MM-dd")
    ).filter(F.col("dt").isin(missing))
    slice_df.write.mode("append").partitionBy("dt").parquet(sink_path)
    return missing
