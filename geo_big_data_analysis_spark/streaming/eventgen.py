"""Deterministic synthetic event-stream source (Spark 4 Python
DataSource streaming API).

A replayable, offset-tracked generator: row i is a pure function of i,
so any offset range replays to identical rows — the property Structured
Streaming needs from a source for exactly-once recovery (same contract
a Kafka offset range gives). Useful as a load/correctness harness for
the streaming operators without external infrastructure:

    spark.dataSource.register(EventGenDataSource)
    stream = (spark.readStream.format("eventgen")
              .option("rows_per_batch", 500)
              .option("max_rows", 10_000).load())

Schema mirrors the driver's ``events`` fixture shape (event_id, ts,
user_id, event_type, value). The batch twin of the full stream is
``eventgen_batch_df(spark, max_rows)`` — tests assert the drained
stream aggregates EXACTLY equal the batch computation (the same
batch-twin oracle convention as the other streaming queries).

Scale note: a single generator partition is the demo shape; real
sources shard by partition the same way the file-per-partition GeoJSON
reader does. The offset dict is the entire recovery state.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

EVENTGEN_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double"
)

_TYPES = ["click", "error", "purchase", "signup", "view"]
_BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _row(i: int):
    return (
        i,
        (_BASE + timedelta(seconds=137 * i)).replace(tzinfo=None),
        (i * 7) % 50,
        _TYPES[i % 5],
        ((i * 37) % 1000) / 10.0,
    )


class _EventGenStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        i = start["i"]
        end = min(i + self.rows_per_batch, self.max_rows)
        return iter([_row(j) for j in range(i, end)]), {"i": end}

    def readBetweenOffsets(self, start, end):
        return iter([_row(j) for j in range(start["i"], end["i"])])


class EventGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return EVENTGEN_SCHEMA

    def simpleStreamReader(self, schema):
        return _EventGenStreamReader(self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(EventGenDataSource)


def eventgen_batch_df(spark: SparkSession, max_rows: int) -> DataFrame:
    """The batch twin: same rows as draining the stream source, as one
    column-expression pipeline over spark.range (no Python crossing)."""
    base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    i = F.col("id")
    return spark.range(max_rows).select(
        i.alias("event_id"),
        F.timestamp_seconds(F.unix_timestamp(base) + 137 * i).alias("ts"),
        ((i * 7) % 50).alias("user_id"),
        F.element_at(F.array(*[F.lit(t) for t in _TYPES]), (i % 5 + 1).cast("int")).alias(
            "event_type"
        ),
        (((i * 37) % 1000) / 10.0).alias("value"),
    )
