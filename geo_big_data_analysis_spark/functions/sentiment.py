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


# ---------------------------------------------------------------------------
# PatternAnalyzer-faithful scorer (TextBlob parity, VERDICT r1 #8)
# ---------------------------------------------------------------------------
# TextBlob's PatternAnalyzer (pattern-en `sentiment()`) is not a plain
# mean over matched words: lexicon entries carry (polarity,
# subjectivity, intensity); an intensifier ("very", i=1.3) does not
# score itself — the following lexicon word REPLACES it with
# clamp(p·i)/clamp(s·i); a preceding negation flips the final polarity
# of the assessment by ×(−0.5) and INVERTS a pending intensifier's
# factor ("not very good" → 0.7·(1/1.3)·(−0.5)); an unknown word breaks
# the modifier chain and clears negation; doc score = mean over
# assessments, 0.0 with none. The fold below implements exactly those
# rules as one JVM-side `aggregate` over the token array — no UDF.

#: pattern-en lexicon subset with (polarity, subjectivity, intensity) —
#: values for the pinned-parity words match the pattern-en sense
#: averages TextBlob reports (good 0.7/0.6, great 0.8/0.75,
#: bad −0.7/0.6667, terrible −1/1, very 0.2/0.3/×1.3).
PATTERN_LEXICON: dict[str, tuple[float, float, float]] = {
    **{w: (p, s, 1.0) for w, (p, s) in LEXICON.items() if w != "never"},
    "bad": (-0.6999999999999998, 0.6666666666666666, 1.0),
    "very": (0.2, 0.3, 1.3),
    "really": (0.2, 0.2, 1.4),
    "extremely": (0.25, 0.25, 1.5),
    "totally": (0.0, 0.25, 1.2),
    "absolutely": (0.2, 0.3, 1.3),
    "incredibly": (0.9, 0.9, 1.3),
}

NEGATIONS = frozenset({"not", "no", "never", "n't", "cannot", "dont", "didnt", "isnt", "wasnt", "wont"})


def _pattern_lex_map() -> Column:
    entries = ", ".join(
        f"'{w}', named_struct('p', {p!r}D, 's', {s!r}D, 'i', {i!r}D)"
        for w, (p, s, i) in PATTERN_LEXICON.items()
    )
    return F.expr(f"map({entries})")


def _clamp1(v: Column) -> Column:
    return F.greatest(F.lit(-1.0), F.least(F.lit(1.0), v))


def pattern_scores(col) -> Column:
    """TextBlob/PatternAnalyzer sentiment as struct(polarity,
    subjectivity) — the stateful assessment chain as a single
    whole-stage-codegen ``aggregate`` fold over tokens."""
    lex = _pattern_lex_map()
    neg_arr = F.array(*[F.lit(w) for w in sorted(NEGATIONS)])

    init = F.struct(
        F.lit(0.0).alias("sum_p"),
        F.lit(0.0).alias("sum_s"),
        F.lit(0.0).alias("cnt"),
        F.lit(False).alias("open"),
        F.lit(0.0).alias("op"),
        F.lit(0.0).alias("os"),
        F.lit(False).alias("oneg"),
        F.lit(False).alias("omod"),
        F.lit(1.0).alias("oi"),
        F.lit(False).alias("neg"),
    )

    def closed(acc):
        """(sum_p, sum_s, cnt) with the open assessment folded in."""
        w = F.when(acc["oneg"], F.lit(-0.5)).otherwise(F.lit(1.0))
        return (
            acc["sum_p"] + F.when(acc["open"], acc["op"] * w).otherwise(F.lit(0.0)),
            acc["sum_s"] + F.when(acc["open"], acc["os"]).otherwise(F.lit(0.0)),
            acc["cnt"] + F.when(acc["open"], F.lit(1.0)).otherwise(F.lit(0.0)),
        )

    def step(acc, w):
        e = lex[w]
        is_neg = F.array_contains(neg_arr, w)
        # chain-extend: previous open assessment was an intensifier
        ext = F.struct(
            acc["sum_p"].alias("sum_p"),
            acc["sum_s"].alias("sum_s"),
            acc["cnt"].alias("cnt"),
            F.lit(True).alias("open"),
            _clamp1(e["p"] * acc["oi"]).alias("op"),
            _clamp1(e["s"] * acc["oi"]).alias("os"),
            acc["oneg"].alias("oneg"),
            (e["i"] != 1.0).alias("omod"),
            e["i"].alias("oi"),
            F.lit(False).alias("neg"),
        )
        cp, cs, cc = closed(acc)
        fresh = F.struct(
            cp.alias("sum_p"),
            cs.alias("sum_s"),
            cc.alias("cnt"),
            F.lit(True).alias("open"),
            e["p"].alias("op"),
            e["s"].alias("os"),
            acc["neg"].alias("oneg"),
            (e["i"] != 1.0).alias("omod"),
            F.when(acc["neg"], 1.0 / e["i"]).otherwise(e["i"]).alias("oi"),
            F.lit(False).alias("neg"),
        )
        negated = F.struct(
            acc["sum_p"].alias("sum_p"), acc["sum_s"].alias("sum_s"), acc["cnt"].alias("cnt"),
            acc["open"].alias("open"), acc["op"].alias("op"), acc["os"].alias("os"),
            acc["oneg"].alias("oneg"), acc["omod"].alias("omod"), acc["oi"].alias("oi"),
            F.lit(True).alias("neg"),
        )
        unknown = F.struct(
            acc["sum_p"].alias("sum_p"), acc["sum_s"].alias("sum_s"), acc["cnt"].alias("cnt"),
            acc["open"].alias("open"), acc["op"].alias("op"), acc["os"].alias("os"),
            acc["oneg"].alias("oneg"), F.lit(False).alias("omod"), acc["oi"].alias("oi"),
            F.lit(False).alias("neg"),
        )
        return (
            F.when(is_neg, negated)
            .when(e.isNull(), unknown)
            .when(acc["open"] & acc["omod"], ext)
            .otherwise(fresh)
        )

    def finish(acc):
        p, s, c = closed(acc)
        return F.struct(
            F.when(c > 0, p / c).otherwise(F.lit(0.0)).alias("polarity"),
            F.when(c > 0, s / c).otherwise(F.lit(0.0)).alias("subjectivity"),
        )

    return F.aggregate(tokens(clean_text(col)), init, step, finish)


def polarity_pattern(col) -> Column:
    """PatternAnalyzer-parity polarity ∈ [−1, 1]."""
    return pattern_scores(col)["polarity"]


def subjectivity_pattern(col) -> Column:
    """PatternAnalyzer-parity subjectivity ∈ [0, 1]."""
    return pattern_scores(col)["subjectivity"]


def pattern_lexicon_sql_values(alias: str = "lex") -> str:
    """PATTERN_LEXICON as a SQL VALUES list: alias(word, p, s, i) —
    repr-embedded floats so both engines hold identical constants."""
    rows = ", ".join(
        f"('{w}', {p!r}, {s!r}, {i!r})" for w, (p, s, i) in PATTERN_LEXICON.items()
    )
    return f"(VALUES {rows}) AS {alias}(word, p, s, i)"


def negations_sql_list() -> str:
    return "(" + ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(NEGATIONS)) + ")"


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
