"""Distributed BPE (byte-pair-encoding) merge training — the tokenizer
primitive of an LLM data pipeline (Sennrich 2016 word-level variant).

The reference repo tokenizes only by whitespace/regex (lab4 nb cell 16,
json 991 ``extract_keywords``); BPE training is part of the
training-data-pipeline extension the build brief asks for.

Algorithm: corpus → (word, count) vocabulary; each word is a
suffix-delimited symbol sequence (``'low' → 'l|o|w|'``). Each round
counts all adjacent symbol pairs (overlapping, weighted by word count),
picks the most frequent pair (tie-break: lexicographic (left, right)),
and rewrites every word with the pair merged greedily left-to-right.

Spark-first shape: the heavy step is the word-count aggregation over
the corpus (one shuffle on the word). The merge loop then runs on the
*distinct-vocabulary* table — |vocab| rows, corpus-size-independent —
with per-round jobs that are (a) a pair-count hash aggregate and (b) a
1-row argmax collect (the fit artifact, like Lloyd centroids). The
sequence rewrite is a single ``replace`` on the suffix-delimited string:
``replace(seq, 'l|r|', 'lr|')`` — replace scans left-to-right over
non-overlapping matches, which IS greedy BPE merge order, and the
suffix delimiter keeps adjacent matches from sharing a boundary char.
Everything stays in whole-stage codegen; no Python UDFs.

The vocabulary table is localCheckpoint'ed every round (consumed twice
per round: pair count + rewrite — SCALE.md checkpoint-cadence rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PAIRS_EXPR = """
transform(
  slice(_toks, 1, size(_toks) - 1),
  (x, i) -> struct(x AS l, element_at(_toks, i + 2) AS r)
)
"""


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) vocabulary: whitespace split + count. The only
    corpus-sized job; everything after runs on distinct words."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _init_words(vocab: DataFrame) -> DataFrame:
    """Suffix-delimit each word into its symbol sequence, apply the
    small-vocab size dispatch, and refuse delimiter-corrupting words
    (shared by the BPE and WordPiece trainers)."""
    words = vocab.withColumn(
        "seq", F.regexp_replace(F.col("word"), "(.)", "$1|")
    ).localCheckpoint()
    # size dispatch: the merge loop runs ~2 jobs/round over the distinct
    # vocabulary; when that table is small (fixtures, most corpora after
    # word-counting), 32-partition scheduling overhead dominates — fold
    # it to one partition. Web-scale vocabularies (>100k words) keep
    # the inherited partitioning. The same pass guards the suffix
    # delimiter: a word containing '|' would silently corrupt the
    # delimited encoding in BOTH engines (the oracle replays the same
    # representation, so a cross-engine check can't catch it) — refuse.
    stats = words.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("word").contains("|").cast("long")).alias("n_bad"),
    ).collect()[0]
    if (stats["n_bad"] or 0) > 0:
        raise ValueError(
            f"{stats['n_bad']} vocabulary words contain the '|' suffix "
            "delimiter; strip or remap them before BPE training"
        )
    if stats["n"] <= 100_000:
        words = words.coalesce(1).localCheckpoint()
    return words


def bpe_train(
    vocab: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE merges. Returns (merges, final_vocab_df)
    where merges rows are (rank, left, right, merged, pair_count) and
    the vocab DataFrame carries the fully-merged ``seq`` per word."""
    words = _init_words(vocab)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = (
            words.withColumn(
                "_toks", F.expr("filter(split(seq, '\\\\|'), x -> x <> '')")
            )
            .select(F.explode(F.expr(_PAIRS_EXPR)).alias("_p"), "cnt")
            .groupBy("_p.l", "_p.r")
            .agg(F.sum("cnt").alias("pc"))
        )
        best = pairs.orderBy(F.desc("pc"), "l", "r").limit(1).collect()
        if not best:
            break
        l, r, pc = best[0]["l"], best[0]["r"], int(best[0]["pc"])
        merges.append((rank, l, r, l + r, pc))
        # F.replace with literal COLUMNS, not an interpolated SQL string:
        # learned symbols routinely contain quotes/backslashes (apostrophes
        # in real text), which would break or corrupt an f-string F.expr.
        words = words.withColumn(
            "seq",
            F.replace(F.col("seq"), F.lit(f"{l}|{r}|"), F.lit(f"{l}{r}|")),
        ).localCheckpoint()
    return merges, words


def merges_df(spark: SparkSession, merges) -> DataFrame:
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string,"
        " merged string, pair_count bigint",
    )


def wordpiece_train(
    vocab: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, str, str, int, float]], DataFrame]:
    """WordPiece merge training (Schuster & Nakajima 2012, the
    likelihood-gain variant BERT's tokenizer popularized): identical
    loop shape to :func:`bpe_train`, but each round picks the pair
    maximizing ``count(l,r) / (count(l) · count(r))`` — the pair whose
    merge most increases corpus likelihood under a unigram model —
    instead of the raw pair count. So frequent-but-expected pairs
    ('e','s') lose to rarer-but-bound pairs.

    Determinism across engines: both factors are exact BIGINT counts
    ≤ 2^53, each is cast to double exactly, and IEEE multiply/divide
    are correctly rounded — so the double score is bit-identical in
    Spark and DuckDB and the (score DESC, l, r) argmax replays
    exactly. Per round: one symbol-count hash aggregate, one
    pair-count hash aggregate, two broadcast-sized joins on the
    distinct-vocabulary table, a 1-row argmax collect, and the same
    codegen'd ``replace`` rewrite — corpus-size-independent after the
    initial word count, same as BPE.
    """
    words = _init_words(vocab)
    merges: list[tuple[int, str, str, str, int, float]] = []
    for rank in range(1, n_merges + 1):
        toks = words.withColumn(
            "_toks", F.expr("filter(split(seq, '\\\\|'), x -> x <> '')")
        )
        syms = (
            toks.select(F.explode("_toks").alias("s"), "cnt")
            .groupBy("s")
            .agg(F.sum("cnt").alias("sc"))
        )
        pairs = (
            toks.select(F.explode(F.expr(_PAIRS_EXPR)).alias("_p"), "cnt")
            .groupBy("_p.l", "_p.r")
            .agg(F.sum("cnt").alias("pc"))
        )
        scored = (
            pairs.join(syms.select(F.col("s").alias("l"), F.col("sc").alias("cl")), "l")
            .join(syms.select(F.col("s").alias("r"), F.col("sc").alias("cr")), "r")
            .withColumn(
                "score",
                F.col("pc") / (F.col("cl").cast("double") * F.col("cr").cast("double")),
            )
        )
        best = scored.orderBy(F.desc("score"), "l", "r").limit(1).collect()
        if not best:
            break
        l, r, pc, score = best[0]["l"], best[0]["r"], int(best[0]["pc"]), float(best[0]["score"])
        merges.append((rank, l, r, l + r, pc, score))
        words = words.withColumn(
            "seq",
            F.replace(F.col("seq"), F.lit(f"{l}|{r}|"), F.lit(f"{l}{r}|")),
        ).localCheckpoint()
    return merges, words


def wordpiece_merges_df(spark: SparkSession, merges) -> DataFrame:
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string,"
        " merged string, pair_count bigint, score double",
    )
