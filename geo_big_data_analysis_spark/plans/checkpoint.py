"""Checkpoint-or-recompute orchestration (SURVEY §3.3 / §4).

The reference's caching story: ``load_intermediate_data`` (lab4
yelp_analysis.ipynb cell 8, json 343) reloads CSV checkpoints if they
exist, else recomputes and saves; lab1 writes geojson/csv intermediates
consumed by later stages (visualize_noise.py:248-255).

Engine-native mapping: Parquet checkpoints + an existence probe. The
expensive stateful handoffs (DBSCAN labels, fitted features) persist
once and every downstream stage reads the columnar file — at 100 TB
this is also the stage boundary where a pipeline restarts after
failure without recomputing upstream.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def checkpoint_or_recompute(
    spark: SparkSession,
    path: str,
    compute: Callable[[], DataFrame],
    overwrite: bool = False,
) -> DataFrame:
    """Return the DataFrame stored at ``path`` if present, else run
    ``compute()``, persist its result there, and return the re-read
    (so downstream plans scan parquet rather than re-running the
    lineage)."""
    if not overwrite and _exists(spark, path):
        return spark.read.parquet(path)
    compute().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)
