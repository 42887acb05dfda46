"""Scale-path physical strategies: bucketed co-located joins and
skew-salted shuffles (SURVEY §4's '100 TB design' items).

These aren't reference operators — they're the physical techniques that
keep the reference's *logical* operators viable at 1000-executor scale:

- **Bucketing** (``write_bucketed`` / ``read_bucketed``): persist a fact
  table pre-hash-partitioned and sorted on its join key; a join between
  two tables bucketed the same way runs with ZERO Exchange (verified by
  tests/test_scale.py asserting no Exchange in the physical plan). At
  100 TB, that's the difference between an all-to-all shuffle of the
  fact table per query and none.
- **Salted aggregation** (``salted_agg_count``): two-phase aggregate for
  power-law keys — phase 1 aggregates on (key, salt) spreading one hot
  key over N reducers, phase 2 combines the N partials. Spark's AQE
  skew handling covers *joins*; aggregation skew still wants explicit
  salt when one key dominates.
- **Salted join** (``salted_join_inner``): replicate the small side N×
  with explicit salt so a skewed big-side key fans across N tasks.
  Prefer ``F.broadcast`` when the small side fits in memory — salting
  is for the mid-size case (too big to broadcast, too skewed to hash
  cleanly).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
) -> None:
    """Persist as a bucketed+sorted managed table (Parquet). Both sides
    of a recurring equi-join bucketed identically ⇒ shuffle-free joins."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def _salt(n: int) -> Column:
    # deterministic per-row salt: stable under retries (rand() is not),
    # uniform enough to spread a hot key across n reducers
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n))


def salted_agg_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe group-count: (key, salt) partial counts, then
    combine partials per key. Output equals ``groupBy(key).count()``."""
    partial = (
        df.withColumn("_salt", _salt(n_salts))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").cast("bigint").alias("count"))


def salted_join_inner(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Inner equi-join resilient to big-side key skew: the big side gets
    a random-ish salt, the small side is replicated once per salt value,
    and the join key becomes (key, salt) — a hot key's rows land in
    ``n_salts`` tasks instead of one straggler."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("_salt", _salt(n_salts))
    return big_salted.join(small_rep, [key, "_salt"]).drop("_salt")
