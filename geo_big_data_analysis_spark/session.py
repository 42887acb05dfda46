"""SparkSession bootstrap with engine defaults.

Defaults are tuned for correctness-parity with the DuckDB oracle (UTC
session timezone, ANSI off) and for scale (AQE on, partition coalescing,
skew-join handling). On a real cluster only ``master`` and memory sizing
change — the SQL-level behavior is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "geo_big_data_analysis_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults.

    Notes on the defaults:
    - ``spark.sql.session.timeZone=UTC``: parquet fixtures carry naive
      timestamps; UTC makes Spark's timestamp semantics match DuckDB's.
      Pipelines that need the reference's America/New_York semantics
      (SURVEY §2.8) apply `functions.temporal` helpers explicitly.
    - AQE enabled: runtime coalescing of shuffle partitions and skew-join
      splitting — the 100 TB story for uneven keys.
    - Arrow enabled: pandas_udf / toPandas use columnar transfer.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # SPARK_GRAFT_ANSI=true validates the suite under Spark 4's
        # default strict mode (the driver's vanilla session has it on)
        .config(
            "spark.sql.ansi.enabled",
            os.environ.get("SPARK_GRAFT_ANSI", "false"),
        )
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str, names=TPCH_TABLES):
    """Load the driver-generated parquet tables as a dict of DataFrames."""
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}
