"""The n-gram repetition arrow path must be row-identical to the expr
plan: same counts, same IEEE fractions, same tie-breaks."""

from __future__ import annotations

import pytest

from fujishadergpu_spark.operators.repetition import ngram_repetition_features


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "a b a b a b a b c d e f g h"),            # heavy top-2 gram
        (2, "one two three four five six seven eight nine ten eleven twelve"),
        (3, "x y z x y z x y z x y z x y z"),          # dup 5..10 coverage
        (4, ""),
        (5, None),
        (6, "solo"),
        (7, "t t t t t t t t t t t t t t t t t t t t"),  # one gram repeated
        (8, "a\nb  c\nd e f g h i j k l m n o p q r s t u v w"),
        (9, "p q r s t u v w x y p q r s t u v w x y tail tokens here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_arrow_equals_expr(spark, corpus):
    a = ngram_repetition_features(corpus, impl="expr").orderBy("doc_id").collect()
    b = ngram_repetition_features(corpus, impl="arrow").orderBy("doc_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    by_id = {r["doc_id"]: r for r in b}
    assert set(by_id) == {1, 2, 3, 4, 5, 6, 7, 8, 9}
    assert by_id[4]["total_chars"] == 0 and by_id[4]["keep"] is True
    assert by_id[1]["top2_char_frac"] > 0.2 and by_id[1]["keep"] is False


def test_ngram_impl_validation(spark, corpus):
    with pytest.raises(ValueError, match="unknown impl"):
        ngram_repetition_features(corpus, impl="bogus")
