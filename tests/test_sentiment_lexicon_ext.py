"""Guards for the tier-2 sentiment lexicon data file.

The extension must never move two pinned surfaces: the lab-4 golden
band (its fixture templates rely on specific words being UNscored) and
the TextBlob-pinned parity phrases (which rely on unknown-word chain
breaks). These tests enforce the exclusions structurally, so a future
lexicon edit can't silently shift either."""

from __future__ import annotations

import re

from geo_big_data_analysis_spark.functions.sentiment import (
    LEXICON,
    NEGATIONS,
    PATTERN_LEXICON,
    _EXTENDED_VALENCES,
)
from geo_big_data_analysis_spark.functions.sentiment_lexicon_ext import (
    EXTENDED_VALENCES_2,
)
from geo_big_data_analysis_spark.functions.sentiment_lexicon_ext3 import (
    EXTENDED_VALENCES_3,
)
from geo_big_data_analysis_spark.functions.sentiment_lexicon_ext4 import (
    EXTENDED_VALENCES_4,
)

#: words the TextBlob-pinned parity phrases use as unknown sentinels
_PARITY_SENTINELS = {"the", "weather", "report", "arrived", "and", "food", "staff"}


def _lab4_template_vocab() -> set[str]:
    from geo_big_data_analysis_spark.plans import registry as r

    vocab: set[str] = set()
    for t in r._LAB4_POS_TPL + r._LAB4_NEG_TPL + r._LAB4_NEU_TPL:
        vocab |= set(re.findall(r"[a-z]+", t.lower()))
    return vocab


def test_lexicon_size_at_pattern_en_scale():
    # pattern-en's en-sentiment.xml carries ~2,900 single-word entries
    assert len(PATTERN_LEXICON) >= 2900
    assert len(EXTENDED_VALENCES_2) >= 900
    assert len(EXTENDED_VALENCES_3) >= 900
    assert len(EXTENDED_VALENCES_4) >= 900


def test_tier3_adds_only_new_words():
    """Tier 3 may not duplicate an earlier tier — an overlapping entry
    would be dead weight (earlier tiers win on merge precedence)."""
    earlier = (
        set(LEXICON) | set(_EXTENDED_VALENCES) | set(EXTENDED_VALENCES_2)
    )
    dead = set(EXTENDED_VALENCES_3) & earlier
    assert not dead, sorted(dead)[:10]


def test_tier4_adds_only_new_words():
    earlier = (
        set(LEXICON)
        | set(_EXTENDED_VALENCES)
        | set(EXTENDED_VALENCES_2)
        | set(EXTENDED_VALENCES_3)
    )
    dead = set(EXTENDED_VALENCES_4) & earlier
    assert not dead, sorted(dead)[:10]


def test_words_are_sql_safe_lowercase_tokens():
    # embedded verbatim in SQL literals by the oracle generators
    for tier in (EXTENDED_VALENCES_2, EXTENDED_VALENCES_3, EXTENDED_VALENCES_4):
        for w in tier:
            assert re.fullmatch(r"[a-z]+", w), w


def test_value_ranges():
    for tier in (EXTENDED_VALENCES_2, EXTENDED_VALENCES_3, EXTENDED_VALENCES_4):
        for w, (p, s) in tier.items():
            assert -1.0 <= p <= 1.0, (w, p)
            assert 0.0 <= s <= 1.0, (w, s)


def test_no_new_lab4_template_or_parity_words():
    """No tier-2/3 word may score a previously-UNscored lab-4 template
    word or a parity-phrase sentinel — that would move the golden band
    / pinned expectations."""
    older_tiers = set(LEXICON) | set(_EXTENDED_VALENCES)
    forbidden = (
        (_lab4_template_vocab() | _PARITY_SENTINELS | set(NEGATIONS))
        - older_tiers
    )
    clash = (
        set(EXTENDED_VALENCES_2)
        | set(EXTENDED_VALENCES_3)
        | set(EXTENDED_VALENCES_4)
    ) & forbidden
    assert not clash, sorted(clash)


def test_higher_tiers_win_on_overlap():
    # precedence: pinned-parity values must survive the tier-2 merge
    assert PATTERN_LEXICON["good"] == (0.7, 0.6, 1.0)
    assert PATTERN_LEXICON["bad"][0] == -0.6999999999999998
    # a word present in both tier 2 and tier 1 takes tier 1's value
    for w, (p, s) in _EXTENDED_VALENCES.items():
        assert PATTERN_LEXICON[w] == (p, s, 1.0)
