"""Keyword-lexicon topic classification (operators/topics.py):
argmax with deterministic tie-break, the 'other' bucket, totality,
multi-topic words, and the shares rollup."""

import pytest

from fujishadergpu_spark.operators.topics import topic_assign, topic_shares

LEX = {
    "alpha": ("apple", "apricot"),
    "beta": ("banana", "berry"),
}


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_argmax_tiebreak_and_other(spark):
    docs = _df(spark, [
        (0, "apple apple banana x"),     # alpha 2 > beta 1
        (1, "apple banana y z"),          # tie 1-1 -> alpha (lexicographic)
        (2, "nothing matches here"),      # other
        (3, ""),                           # token-less, still total
    ])
    out = {r["doc_id"]: r.asDict() for r in topic_assign(docs, LEX).collect()}
    assert out[0]["topic"] == "alpha" and out[0]["n_hits"] == 2
    assert out[1]["topic"] == "alpha" and out[1]["n_hits"] == 1
    assert out[2]["topic"] == "other" and out[2]["n_hits"] == 0
    assert out[3]["topic"] == "other" and out[3]["n_tokens"] == 0
    assert out[3]["topic_share"] == 0.0
    assert out[0]["topic_share"] == 2 / 4


def test_word_in_two_topics_counts_for_each(spark):
    lex = {"a": ("shared",), "b": ("shared", "extra")}
    docs = _df(spark, [(0, "shared extra")])
    r = topic_assign(docs, lex).collect()[0]
    assert r["topic"] == "b" and r["n_hits"] == 2  # b: shared+extra > a: shared


def test_shares_rollup(spark):
    docs = _df(spark, [
        (0, "apple a b"),
        (1, "banana c"),
        (2, "apple"),
        (3, "zzz"),
    ])
    s = {r["topic"]: r.asDict() for r in topic_shares(topic_assign(docs, LEX)).collect()}
    assert s["alpha"]["n_docs"] == 2 and s["alpha"]["doc_share"] == 0.5
    assert s["beta"]["n_docs"] == 1
    assert s["other"]["n_docs"] == 1
    assert s["alpha"]["n_tokens"] == 4  # 3 + 1 tokens of the two alpha docs


def test_empty_lexicon_rejected(spark):
    with pytest.raises(ValueError, match="lexicon"):
        topic_assign(_df(spark, [(0, "x")]), {})
