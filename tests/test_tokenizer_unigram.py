"""Unigram-LM tokenizer (tokenizer.unigram_*): Viterbi semantics on
hand-checkable scores, tie order, smoothing, and the distributed EM
loop on a tiny corpus."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pr2_transformation_spark.functions.tokenizer import (
    quantize_scores,
    unigram_seed,
    unigram_segment,
    unigram_train,
    unigram_viterbi,
    unigram_words,
)


def test_viterbi_prefers_high_score_pieces():
    scores = {"b": -10, "a": -5, "n": -6, "an": -8, "ana": -9, "ban": -12}
    # ban|ana = -21 beats every char/bigram split
    assert unigram_viterbi("banana", scores) == ["ban", "ana"]


def test_viterbi_tie_prefers_fewer_pieces_then_lex():
    # two segmentations with EQUAL total score: ab|cd vs abcd
    scores = {"ab": -10, "cd": -10, "abcd": -20}
    assert unigram_viterbi("abcd", scores) == ["abcd"]
    # equal score AND equal piece count -> lexicographic seg string
    scores = {"ax": -10, "by": -10, "a": -10, "xb": -10, "y": -10}
    # 'a|xb|y' vs 'ax|by' have different np; construct a true lex tie:
    scores = {"aa": -7, "bb": -7, "a": -7, "ab": -7, "b": -7}
    # word 'aabb': aa|bb (-14, 2 pieces) unique best
    assert unigram_viterbi("aabb", scores) == ["aa", "bb"]


def test_viterbi_unsegmentable_returns_none():
    assert unigram_viterbi("xyz", {"x": -1, "y": -1}) is None


def test_quantize_scores_integer_logprobs():
    q = quantize_scores({"a": 3, "b": 1})
    assert q["a"] == round(math.log(3 / 4) * 1e6)
    assert q["b"] == round(math.log(1 / 4) * 1e6)
    assert all(isinstance(v, int) for v in q.values())


def test_unigram_words_filters_and_weights(spark):
    docs = spark.createDataFrame(
        [(1, "Foo foo BAR x supercalifragilistic 42")], ["doc_id", "text"])
    rows = {r["word"]: r["freq"]
            for r in unigram_words(docs, "text").collect()}
    assert rows == {"foo": 2, "bar": 1, "x": 1}  # long word + digits dropped


def test_seed_contains_all_chars_and_top_substrings(spark):
    docs = spark.createDataFrame([(1, "abab abab z")], ["doc_id", "text"])
    words = unigram_words(docs, "text")
    seed = {r["piece"]: r["cnt"] for r in unigram_seed(words, 3).collect()}
    assert seed["a"] == 4 and seed["b"] == 4 and seed["z"] == 1
    # overlapping count: 'abab' (freq 2) has 'ab' at pos 1,3 and 'ba' at 2
    assert seed["ab"] == 4
    assert len([p for p in seed if len(p) >= 2]) == 3


def test_em_loop_promotes_frequent_piece(spark):
    docs = spark.createDataFrame(
        [(i, "banana bandana") for i in range(5)], ["doc_id", "text"])
    words = unigram_words(docs, "text")
    usage = unigram_train(words, iterations=2, num_multi=10)
    rows = {r["piece"]: (r["cnt"], r["n_words"]) for r in usage.collect()}
    # 'an' or 'ana'-family pieces must have survived and both words use them
    assert any(len(p) > 1 for p in rows)
    for p, (cnt, n_words) in rows.items():
        assert cnt > 0 and 1 <= n_words <= 2


def test_segmentation_concatenates_back(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    words = unigram_words(docs, "text")
    seed = {r["piece"]: int(r["cnt"])
            for r in unigram_seed(words, 50).collect()}
    segs = unigram_segment(words, quantize_scores(seed)).collect()
    for r in segs:
        assert "".join(r["seg"].split("|")) == r["word"]
