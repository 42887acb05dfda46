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


#: Gopher-style "common English words" presence check (Rae et al. 2021
#: §A.1.1: a document must contain ≥2 of a small closed set).
GOPHER_COMMON = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(col) -> Column:
    """Gopher-repetition-free quality rules (Rae et al. 2021, MassiveText
    filtering §A.1.1) as a struct of per-rule booleans — the standard
    pre-training corpus gate, pure column expressions:

    - word_count_ok:   10 ≤ #words ≤ 100 000
    - mean_word_len_ok: mean word length in [2, 12]
    - alpha_share_ok:  ≥ 80% of words contain an alphabetic character
    - symbol_ratio_ok: (# + … + bullet) to word ratio ≤ 0.1
    - common_words_ok: contains ≥ 2 distinct Gopher common words
    - pass_all:        conjunction
    """
    raw = _c(col)
    toks = tokens(raw)
    n_words = F.size(toks)
    mean_len = F.when(
        n_words > 0,
        F.aggregate(toks, F.lit(0.0), lambda a, w: a + F.length(w)) / n_words,
    ).otherwise(F.lit(0.0))
    alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    alpha_share = F.when(n_words > 0, alpha_words / n_words).otherwise(F.lit(0.0))
    n_symbols = (
        F.length(raw)
        - F.length(F.regexp_replace(raw, r"[#…•]|\.\.\.", ""))
    )
    symbol_ratio = F.when(n_words > 0, n_symbols / n_words).otherwise(F.lit(0.0))
    low = F.concat(F.lit(" "), ascii_lower(clean_text(raw)), F.lit(" "))
    n_common = sum(
        (F.instr(low, f" {w} ") > 0).cast("int") for w in GOPHER_COMMON
    )
    word_count_ok = (n_words >= 10) & (n_words <= 100000)
    mean_word_len_ok = (mean_len >= 2.0) & (mean_len <= 12.0)
    alpha_share_ok = alpha_share >= 0.8
    symbol_ratio_ok = symbol_ratio <= 0.1
    common_words_ok = n_common >= 2
    return F.struct(
        word_count_ok.alias("word_count_ok"),
        mean_word_len_ok.alias("mean_word_len_ok"),
        alpha_share_ok.alias("alpha_share_ok"),
        symbol_ratio_ok.alias("symbol_ratio_ok"),
        common_words_ok.alias("common_words_ok"),
        (
            word_count_ok & mean_word_len_ok & alpha_share_ok
            & symbol_ratio_ok & common_words_ok
        ).alias("pass_all"),
    )


def gopher_rules_sql(col_sql: str) -> dict[str, str]:
    """DuckDB twins of gopher_rules' per-rule booleans."""
    toks = f"regexp_split_to_array(trim({col_sql}), '\\s+')"
    n_words = f"len({toks})"
    mean_len = (
        f"CASE WHEN {n_words} > 0 THEN"
        f" list_sum(list_transform({toks}, w -> length(w)))::DOUBLE / {n_words}"
        f" ELSE 0.0 END"
    )
    alpha_share = (
        f"CASE WHEN {n_words} > 0 THEN"
        f" len(list_filter({toks}, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE / {n_words}"
        f" ELSE 0.0 END"
    )
    n_symbols = (
        f"length({col_sql}) - length(regexp_replace({col_sql}, '[#…•]|\\.\\.\\.', '', 'g'))"
    )
    symbol_ratio = f"CASE WHEN {n_words} > 0 THEN ({n_symbols})::DOUBLE / {n_words} ELSE 0.0 END"
    cleaned = (
        f"trim(regexp_replace(regexp_replace(regexp_replace(lower({col_sql}),"
        f" 'http\\S+|www\\S+|https\\S+', ' ', 'g'), '[^a-zA-Z\\s]', ' ', 'g'),"
        f" '\\s+', ' ', 'g'))"
    )
    low = f"(' ' || {cleaned} || ' ')"
    n_common = " + ".join(
        f"(CASE WHEN instr({low}, ' {w} ') > 0 THEN 1 ELSE 0 END)" for w in GOPHER_COMMON
    )
    return {
        "word_count_ok": f"({n_words} >= 10 AND {n_words} <= 100000)",
        "mean_word_len_ok": f"({mean_len} >= 2.0 AND {mean_len} <= 12.0)",
        "alpha_share_ok": f"({alpha_share} >= 0.8)",
        "symbol_ratio_ok": f"({symbol_ratio} <= 0.1)",
        "common_words_ok": f"(({n_common}) >= 2)",
    }


def fingerprint64(col) -> Column:
    """64-bit document fingerprint: xxhash64 of the *cleaned* text —
    whitespace/case/punct-insensitive exact-dup key."""
    return F.xxhash64(clean_text(col))
