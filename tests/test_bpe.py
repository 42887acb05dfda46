"""BPE merge training against the worked example from Sennrich 2016
(low/lower/newest/widest) and greedy-rewrite edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from geo_big_data_analysis_spark.operators.bpe import (
    bpe_train,
    word_vocab,
)


def _vocab(spark, counts):
    return spark.createDataFrame(list(counts.items()), "word string, cnt long")


def test_bpe_classic_corpus(spark):
    # Sennrich's example: {'low':5, 'lower':2, 'newest':6, 'widest':3}.
    # Pair counts round 1: ('e','s') = 6+3 = 9 is the max → merge 'es';
    # round 2: ('es','t') = 9 → 'est'; round 3: ('l','o') = 7 → 'lo'.
    vocab = _vocab(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    merges, words = bpe_train(vocab, 3)
    assert [(m[1], m[2], m[4]) for m in merges] == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("l", "o", 7),
    ]
    seqs = {r["word"]: r["seq"] for r in words.collect()}
    assert seqs["newest"] == "n|e|w|est|"
    assert seqs["low"] == "lo|w|"


def test_bpe_greedy_overlap(spark):
    # 'aaaa' with merge (a,a): greedy left-to-right → (aa)(aa), and the
    # second round merges (aa,aa). Overlapping pair COUNTS still see
    # 3 (a,a) pairs in round 1 (standard BPE counting).
    vocab = _vocab(spark, {"aaaa": 1})
    merges, words = bpe_train(vocab, 2)
    assert (merges[0][1], merges[0][2], merges[0][4]) == ("a", "a", 3)
    assert (merges[1][1], merges[1][2], merges[1][4]) == ("aa", "aa", 1)
    assert words.collect()[0]["seq"] == "aaaa|"


def test_word_vocab_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b  c")], "doc_id long, text string"
    )
    v = {r["word"]: r["cnt"] for r in word_vocab(docs).collect()}
    assert v == {"a": 2, "b": 2, "c": 1}


def test_bpe_quote_backslash_symbols(spark):
    # Apostrophes and backslashes are ordinary characters in real text;
    # the merge rewrite must treat learned symbols as LITERALS (column
    # F.replace), never interpolate them into a SQL expr string.
    vocab = _vocab(spark, {"don't": 5, "won't": 3, r"a\'b": 2})
    merges, words = bpe_train(vocab, 2)
    # Round-1 pair counts: (o,n)=8, (n,')=8, (',t)=8, (d,o)=5, (w,o)=3,
    # (a,\)=2, (\,')=2, (',b)=2 — three-way tie at 8, lexicographic
    # tie-break picks ("'", "t") ("'" < "n" < "o"). Round 2: (n,'t)=8
    # ties (o,n)=8, "n" < "o" → ("n", "'t").
    assert (merges[0][1], merges[0][2], merges[0][4]) == ("'", "t", 8)
    assert (merges[1][1], merges[1][2], merges[1][4]) == ("n", "'t", 8)
    seqs = {r["word"]: r["seq"] for r in words.collect()}
    assert seqs["don't"] == "d|o|n't|"
    assert seqs["won't"] == "w|o|n't|"
    assert seqs[r"a\'b"] == "a|\\|'|b|"  # untouched by merges


def test_bpe_rejects_pipe_in_vocab(spark):
    import pytest

    vocab = _vocab(spark, {"ok": 3, "ba|d": 1})
    with pytest.raises(ValueError, match="delimiter"):
        bpe_train(vocab, 1)


def test_bpe_stops_when_no_pairs(spark):
    vocab = _vocab(spark, {"a": 4, "b": 2})  # single-char words: no pairs
    merges, words = bpe_train(vocab, 5)
    assert merges == []
    assert {r["seq"] for r in words.collect()} == {"a|", "b|"}


def test_wordpiece_criterion_diverges_from_bpe(spark):
    """Same Sennrich corpus, hand-computed likelihood scores:
    round 1 symbol counts l:7 o:7 w:16 e:17 r:2 n:12 s:9 t:9 i:3 d:3;
    (i,d) scores 3/(3·3) = 1/3 — the rare-but-bound pair — beating
    BPE's winner (e,s) at 9/(17·9). Rounds 2-3 then pick (l,o) at
    1/7 and (s,t) at 1/9."""
    from geo_big_data_analysis_spark.operators.bpe import wordpiece_train

    vocab = _vocab(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    merges, words = wordpiece_train(vocab, 3)
    assert [(m[1], m[2], m[4]) for m in merges] == [
        ("i", "d", 3),
        ("l", "o", 7),
        ("s", "t", 9),
    ]
    scores = [m[5] for m in merges]
    assert abs(scores[0] - 1 / 3) < 1e-12
    assert abs(scores[1] - 1 / 7) < 1e-12
    assert abs(scores[2] - 1 / 9) < 1e-12
    seqs = {r["word"]: r["seq"] for r in words.collect()}
    assert seqs["widest"] == "w|id|e|st|"
    assert seqs["low"] == "lo|w|"


def test_wordpiece_rejects_pipe_in_vocab(spark):
    import pytest

    from geo_big_data_analysis_spark.operators.bpe import wordpiece_train

    vocab = _vocab(spark, {"a|b": 1, "ok": 2})
    with pytest.raises(ValueError, match="delimiter"):
        wordpiece_train(vocab, 1)
