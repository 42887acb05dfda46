"""Lexicon-based sentiment scoring (M11).

Reference semantics: lab4 nb (cell 13, json 765) ``analyze_sentiment``
— TextBlob polarity ∈ [−1, 1] + subjectivity ∈ [0, 1], then 3-way
(±0.1) and 5-way (±0.5) categorization, and per-restaurant aggregation
(A5) with positive-rate and weighted score.

TextBlob's polarity is itself a lexicon average (pattern-en lexicon:
mean polarity of matched words); we re-express the same shape with a
compact public-domain-style valence lexicon, entirely as JVM column
expressions — tokenize → look up per-token valence via a literal map →
average the hits. No Python in the hot path, and the identical lexicon
is emitted as a SQL VALUES list so DuckDB can act as the oracle.

Subjectivity follows the same scheme with a strength lexicon (how
opinion-laden a word is, 0..1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import clean_text, tokens

# word -> (polarity, subjectivity); valences follow common sentiment
# lexicon conventions (AFINN/pattern-style magnitudes rescaled to ±1)
LEXICON: dict[str, tuple[float, float]] = {
    "good": (0.7, 0.6), "great": (0.8, 0.75), "excellent": (1.0, 1.0),
    "amazing": (0.6, 0.9), "awesome": (1.0, 1.0), "best": (1.0, 0.3),
    "love": (0.5, 0.6), "loved": (0.7, 0.8), "wonderful": (1.0, 1.0),
    "fantastic": (0.4, 0.9), "nice": (0.6, 1.0), "happy": (0.8, 1.0),
    "delicious": (1.0, 1.0), "fresh": (0.3, 0.4), "friendly": (0.37, 0.6),
    "clean": (0.36, 0.5), "fast": (0.2, 0.3), "perfect": (1.0, 1.0),
    "recommend": (0.4, 0.4), "tasty": (0.8, 0.8),
    "bad": (-0.7, 0.67), "terrible": (-1.0, 1.0), "awful": (-1.0, 1.0),
    "worst": (-1.0, 0.3), "hate": (-0.8, 0.9), "hated": (-0.9, 0.9),
    "horrible": (-1.0, 1.0), "poor": (-0.4, 0.6), "slow": (-0.3, 0.4),
    "dirty": (-0.6, 0.7), "rude": (-0.8, 0.9), "cold": (-0.2, 0.35),
    "expensive": (-0.3, 0.5), "disappointing": (-0.6, 0.7),
    "disappointed": (-0.75, 0.75), "bland": (-0.55, 0.6),
    "mediocre": (-0.3, 0.5), "stale": (-0.5, 0.6), "broken": (-0.4, 0.5),
    "never": (-0.2, 0.3),
}


def _valence_map(idx: int) -> Column:
    # one parsed map literal (one py4j round-trip) instead of 2×|lexicon|
    # F.lit calls — same plan-build rationale as the MinHash signature
    entries = ", ".join(
        f"'{w}', {vals[idx]!r}D" for w, vals in LEXICON.items()
    )
    return F.expr(f"map({entries})")


def _avg_hits(col, idx: int) -> Column:
    """Average lexicon valence over matched tokens; 0.0 when none match
    (TextBlob convention for text with no lexicon words)."""
    m = _valence_map(idx)
    hits = F.filter(
        F.transform(tokens(clean_text(col)), lambda w: m[w]),
        lambda v: v.isNotNull(),
    )
    n = F.size(hits)
    return F.when(
        n > 0, F.aggregate(hits, F.lit(0.0), lambda a, v: a + v) / n
    ).otherwise(F.lit(0.0))


def polarity(col) -> Column:
    """Polarity ∈ [−1, 1] — mean valence of matched lexicon tokens."""
    return _avg_hits(col, 0)


def subjectivity(col) -> Column:
    """Subjectivity ∈ [0, 1] — mean strength of matched lexicon tokens."""
    return _avg_hits(col, 1)


def sentiment_category(pol: Column) -> Column:
    """3-way categorization at ±0.1 (lab4 cell 13)."""
    return (
        F.when(pol > 0.1, "positive")
        .when(pol < -0.1, "negative")
        .otherwise("neutral")
    )


def sentiment_category5(pol: Column) -> Column:
    """5-way categorization at ±0.1 / ±0.5 (lab4 cell 13)."""
    return (
        F.when(pol > 0.5, "very_positive")
        .when(pol > 0.1, "positive")
        .when(pol < -0.5, "very_negative")
        .when(pol < -0.1, "negative")
        .otherwise("neutral")
    )


def lexicon_sql_values(idx: int = 0, alias: str = "lex") -> str:
    """The identical lexicon as a SQL VALUES list: alias(word, valence)."""
    rows = ", ".join(f"('{w}', {vals[idx]!r})" for w, vals in LEXICON.items())
    return f"(VALUES {rows}) AS {alias}(word, valence)"


def group_sentiment_stats(df, keys: list[str], pol_col: str = "polarity"):
    """A5 — per-group sentiment aggregation (lab4 cell 13
    aggregate_restaurant_sentiments): mean/std/count + positive_rate
    (share with polarity > 0.1) in one hash aggregation."""
    p = F.col(pol_col)
    return df.groupBy(*keys).agg(
        F.avg(p).alias("avg_polarity"),
        F.stddev_samp(p).alias("std_polarity"),
        F.count(F.lit(1)).alias("n"),
        F.avg((p > 0.1).cast("double")).alias("positive_rate"),
    )
