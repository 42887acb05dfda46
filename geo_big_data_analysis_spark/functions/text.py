"""Text scalar functions — cleaning, tokenization, quality, language ID.

Re-expresses the reference's review-text processing (lab4 nb cell 13
``preprocess_text`` regex chain; cell 16 ``extract_keywords``
tokenize+stopword) plus the LLM-pipeline text-analysis operators
(token counting, quality scoring, language ID heuristic, document
fingerprinting) as JVM-side expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference stopword set (lab4 nb cell 16 uses wordcloud STOPWORDS + custom);
# we pin an explicit deterministic list so results are reproducible.
STOPWORDS = (
    "the a an and or but if of to in on for with at by from as is are was "
    "were be been it its this that these those i you he she we they not no"
).split()

URL_RE = r"http\S+|www\S+|https\S+"
NON_ALPHA_RE = r"[^a-zA-Z\s]"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col



_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(col) -> Column:
    """ASCII-only lowercase via translate — deliberately avoids Spark 4's
    ICU-collation lower() path, whose first executor-side use pays a
    multi-second (pathological under some sandboxes: minutes) ICU class
    init. Engine corpora are ASCII after clean_text's non-alpha strip, so
    byte-mapping is semantics-identical and stays in codegen."""
    return F.translate(_c(col), _UPPER, _LOWER)

def clean_text(col) -> Column:
    """lower → strip URLs → strip non-alpha → collapse whitespace
    (lab4 nb cell 13 ``preprocess_text``)."""
    c = ascii_lower(col)
    c = F.regexp_replace(c, URL_RE, " ")
    c = F.regexp_replace(c, NON_ALPHA_RE, " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def tokens(col) -> Column:
    """Whitespace tokenization of trimmed text → array<string>."""
    return F.split(F.trim(_c(col)), r"\s+")


def token_count(col) -> Column:
    """Whitespace token count (LLM-pipeline token accounting baseline)."""
    return F.size(tokens(col)).cast("bigint")


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token estimate: count of letter-runs, digit-runs and
    punctuation marks — a deterministic BPE stand-in."""
    c = _c(col)
    # count non-space character runs split at letter/digit/punct boundaries
    pieces = F.split(
        F.trim(F.regexp_replace(c, r"([^a-zA-Z0-9\s])", r" $1 ")), r"\s+"
    )
    return F.size(pieces).cast("bigint")


PII_URL_RE = r"https?://\S+"
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
LONG_DIGITS_RE = r"[0-9]{6,}"


def pii_counts(col) -> tuple[Column, Column, Column]:
    """(urls, emails, long-digit-runs) match counts per document —
    the audit side of PII scrubbing (codegen'd regexp_count; Java and
    DuckDB/RE2 agree on these anchored-free character-class patterns)."""
    c = _c(col)
    return (
        F.regexp_count(c, F.lit(PII_URL_RE)),
        F.regexp_count(c, F.lit(EMAIL_RE)),
        F.regexp_count(c, F.lit(LONG_DIGITS_RE)),
    )


def scrub_pii(col) -> Column:
    """Training-corpus PII redaction: URLs → <URL>, emails → <EMAIL>,
    long digit runs (ids/phones) → <NUM>. Order matters — URL first so
    query-string digits don't half-match; placeholders introduce no new
    matches for later patterns."""
    c = _c(col)
    c = F.regexp_replace(c, PII_URL_RE, "<URL>")
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, LONG_DIGITS_RE, "<NUM>")
    return c


def stopword_ratio(col) -> Column:
    """share of tokens that are stopwords (quality-scoring feature)."""
    t = tokens(ascii_lower(col))
    n_stop = F.size(F.filter(t, lambda x: x.isin(STOPWORDS)))
    return n_stop.cast("double") / F.greatest(F.size(t), F.lit(1)).cast("double")


def punct_ratio(col) -> Column:
    c = _c(col)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def quality_score(col) -> Column:
    """Composite [0,1] doc-quality heuristic: length band + low punct +
    sane stopword ratio (the classic pretraining-filter trio)."""
    c = _c(col)
    n = F.length(c).cast("double")
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(c) * 4, F.lit(1.0))
    sw = stopword_ratio(c)
    sw_score = F.when((sw > 0.05) & (sw < 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_score + punct_score + sw_score) / F.lit(3.0), 6)


# tiny deterministic per-language marker lists for the n-gram/stopword
# language-ID heuristic — order matters (first hit wins).
LANG_MARKERS = [
    ("en", [" the ", " and ", " of "]),
    ("de", [" der ", " und ", " die "]),
    ("es", [" el ", " los ", " de "]),
    ("fr", [" le ", " les ", " des "]),
]


def lang_id(col) -> Column:
    """Marker-word language ID. Deliberately simple + deterministic so the
    DuckDB oracle can replicate it as a CASE chain."""
    padded = F.concat(F.lit(" "), ascii_lower(col), F.lit(" "))
    expr = F.lit("und")
    for code, markers in reversed(LANG_MARKERS):
        cond = F.lit(False)
        for m in markers:
            cond = cond | padded.contains(m)
        expr = F.when(cond, F.lit(code)).otherwise(expr)
    return expr


def lang_id_oracle_sql(col_sql: str) -> str:
    """The equivalent DuckDB CASE chain for :func:`lang_id`."""
    padded = f"(' ' || lower({col_sql}) || ' ')"
    branches = []
    for code, markers in LANG_MARKERS:
        cond = " OR ".join(f"contains({padded}, '{m}')" for m in markers)
        branches.append(f"WHEN ({cond}) THEN '{code}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


def fingerprint64(col) -> Column:
    """64-bit document fingerprint: xxhash64 of the *cleaned* text —
    whitespace/case/punct-insensitive exact-dup key."""
    return F.xxhash64(clean_text(col))
