"""NDJSON scan with malformed-row skip + semi-join pushdown (S4/S5).

Reference semantics:
- S4 — line-at-a-time NDJSON read skipping rows that fail
  ``json.loads``: lab4 yelp_analysis.ipynb (cell 6, json 113)
  ``load_business_data``.
- S5 — scan-time predicate pushdown: keep only rows whose key is in a
  membership set, chunked to bound memory: same cell,
  ``load_review_data`` (``business_ids_set``).

Spark-first: ``spark.read.json`` in PERMISSIVE mode does the malformed
handling natively (bad lines land in ``_corrupt_record`` instead of
killing the scan — same outcome as the reference's try/except, but
streamed and partition-parallel). The membership-set pushdown becomes a
``left_semi`` join that Catalyst turns into a broadcast hash semi-join
when the id set is small — the distributed twin of the reference's
Python ``set`` probe, with no collected set on the driver at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> tuple[DataFrame, DataFrame]:
    """S4 — scan NDJSON, returning (good_rows, corrupt_rows).

    The corrupt side output preserves the raw line (audit trail — the
    reference counts and reports skipped rows rather than silently
    dropping, analyze_data_bias.py:589-675).
    """
    if schema is None:
        # infer from the well-formed lines (sampled scan, same as
        # spark.read.json inference; corrupt lines are dropped by the
        # inferrer so they can't poison the schema)
        schema = spark.read.option("mode", "DROPMALFORMED").json(path).schema
        schema = StructType([f for f in schema.fields if f.name != CORRUPT_COL])
    # text scan + from_json: a malformed line fills the in-struct
    # corrupt field, which cleanly splits good/corrupt without Spark's
    # restriction on querying _corrupt_record from a raw scan — and the
    # parse is a narrow per-partition map (no driver, 100 TB-safe).
    parse_schema = StructType(
        [f for f in schema.fields] + [StructField(CORRUPT_COL, StringType())]
    )
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parsed = lines.select(
        F.col("value"),
        F.from_json(
            "value", parse_schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ).alias("rec"),
    )
    ok = F.col(f"rec.{CORRUPT_COL}").isNull() & F.col("rec").isNotNull()
    good = parsed.filter(ok).select("rec.*").drop(CORRUPT_COL)
    bad = parsed.filter(~ok).select(F.col("value").alias("raw_line"))
    return good, bad


def read_ndjson_semi(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    key: str,
    schema: StructType | None = None,
) -> DataFrame:
    """S5 — NDJSON scan keeping only rows whose ``key`` appears in
    ``ids`` (one column named ``key``). Broadcast semi-join replaces the
    reference's driver-side membership set."""
    good, _ = read_ndjson(spark, path, schema)
    return good.join(F.broadcast(ids.select(key).distinct()), key, "left_semi")
