"""CSV sources (SURVEY §2.1 S1/S2/S3).

- S1 header CSV scan with row limit: 实习一/实习一代码/test.py:25-33
  (``clip_csv`` — nrows cap) → ``spark.read.csv(header=True)`` +
  ``limit(n)`` (Catalyst pushes the limit into the scan).
- S2 CSV scan with date parsing: lab2 nb (cell 3, json 104)
  ``read_csv(parse_dates=[…])`` → declared schema + ``to_timestamp``
  with an explicit format (schema-on-read, no inference pass).
- S3 custom delimiter: lab2 nb (cell 3, json 104) ``sep=';'``
  (holidays table) → ``option('sep', …)``.

Scale notes: a declared ``StructType`` avoids the extra full-file
inference scan pandas does implicitly; CSV scans parallelize per file
split. Timestamp parsing happens as a column expression (JVM-side,
codegen) — never a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    sep: str = ",",
    header: bool = True,
    limit: int | None = None,
    ts_formats: dict[str, str] | None = None,
) -> DataFrame:
    """Declared-schema CSV scan with optional row cap and per-column
    timestamp parsing (``ts_formats``: col → Spark datetime pattern).
    Columns listed in ``ts_formats`` should be STRING in the schema;
    they are parsed with ``to_timestamp`` after the scan."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    for col, fmt in (ts_formats or {}).items():
        df = df.withColumn(col, F.to_timestamp(F.col(col), fmt))
    if limit is not None:
        df = df.limit(limit)
    return df
