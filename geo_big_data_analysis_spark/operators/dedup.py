"""Deduplication suite for large-scale corpus processing.

Exact dedup (hash-groupBy), MinHash+LSH near-dup, SimHash, and n-gram
Jaccard verification — the operators a pretraining-data pipeline runs
over the `documents` table. All hash functions are Spark built-ins
(xxhash64) or integer arithmetic, so every stage stays JVM-side and the
shuffle keys are integers.

Scale shape: shingle→minhash is a map; LSH banding is a groupBy on a
band-hash (uniform integer key); candidate verification is an equi-join
on doc_id. No cross product ever materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import clean_text

# Mersenne prime 2^31-1: minhash permutations (a*x+b) mod P stay well
# below 2^63 (a,x < 2^31 → a*x < 2^62), so the arithmetic is exact AND
# ANSI-safe (no long overflow) — the driver runs queries on a vanilla
# ANSI-enabled Spark 4 session.
_P = 2147483647


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups keyed by normalized text hash.

    Returns one row per distinct text: (keep_id = min id, n_copies).
    groupBy on a 64-bit hash — map-side partial agg then single shuffle.
    """
    return (
        df.select(F.col(id_col), F.xxhash64(clean_text(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
    )


def shingles(text_col, n: int = 3):
    """Word n-gram shingles of cleaned text → array<string>."""
    toks = F.split(clean_text(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )


def minhash_signature(df: DataFrame, text_col: str, id_col: str, num_hashes: int = 64, shingle_n: int = 3) -> DataFrame:
    """MinHash signature per document: for permutation j,
    min over shingles of (a_j * xxhash64(shingle) + b_j mod P).

    Shape: entirely intra-row — hash the shingle array once per doc,
    then a nested array transform (permutations × hashes → array_min)
    builds the whole signature in a single narrow projection. No
    explode, no shuffle: the previous explode+groupBy(64 min aggs)
    formulation spent ~20× longer pushing shingle rows through hash
    aggregation for identical output (signatures are bit-equal; the
    permutation coefficients below are the same arithmetic either way).
    """
    seq = F.sequence(F.lit(0), F.lit(num_hashes - 1))

    def a_j(j):
        return F.pmod(F.lit(2654435761) * (j + 1), F.lit(_P))

    def b_j(j):
        return F.pmod(F.lit(40503) * (j + 1), F.lit(_P))

    hs = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            shingles(text_col, shingle_n), lambda s: F.pmod(F.xxhash64(s), F.lit(_P))
        ).alias("_hs"),
    )
    sig = F.transform(
        seq,
        lambda j: F.array_min(
            F.transform(F.col("_hs"), lambda h: F.pmod(h * a_j(j) + b_j(j), F.lit(_P)))
        ),
    )
    return hs.select("doc_id", sig.alias("minhash"))


def lsh_candidates(signatures: DataFrame, bands: int = 16, rows_per_band: int = 4) -> DataFrame:
    """LSH banding: hash each band of the signature, group by
    (band_idx, band_hash) → candidate pairs within a bucket.

    Output: (doc_a, doc_b) with doc_a < doc_b, distinct.
    """
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("minhash", b * rows_per_band + r + 1).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard(df: DataFrame, text_col: str, id_col: str, pairs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    pairs: (doc_a, doc_b). Joins shingle sets by id (hash joins) and
    computes |∩|/|∪| with array built-ins.
    """
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(shingles(text_col, shingle_n)).alias("sh"),
    )
    out = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("n_union", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.when(F.col("n_union") > 0, F.col("n_inter") / F.col("n_union")).otherwise(0.0),
        )
    )
    return out.select("doc_a", "doc_b", "jaccard")


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash over word tokens: sign-sum of per-token hash bits.

    Vectorized via explode + bit arithmetic (shiftright/bitwise AND) and
    a single groupBy(doc) — no UDF, no per-bit shuffle: the 64 bit-sums
    are one aggregate row per doc.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(clean_text(text_col), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sim = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        term = bit * F.lit(1 << b).cast("bigint") if b < 63 else F.when(
            F.col("b63") > 0, F.lit(-(1 << 63)).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.alias("simhash"))


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    jaccard_threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup: signatures → banded candidates →
    exact Jaccard verification → pairs above threshold."""
    # materialize signatures: the banding explode would otherwise inline
    # (and re-evaluate) the per-doc signature expression once per band
    sigs = minhash_signature(df, text_col, id_col, num_hashes, shingle_n).localCheckpoint()
    cands = lsh_candidates(sigs, bands, num_hashes // bands)
    verified = ngram_jaccard(df, text_col, id_col, cands, shingle_n)
    return verified.filter(F.col("jaccard") >= jaccard_threshold)
