"""jusText-style boilerplate removal (operators/boilerplate.py):
class rules, the nearest-decisive-neighbour rescue, totality, and the
one-exchange plan shape."""

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.boilerplate import (
    boilerplate_lines,
    boilerplate_strip,
)

GOOD = "the cat is in the house and it is warm"  # 10 words, 7 stopwords
BAD = "alpha beta gamma delta epsilon zeta eta theta"  # 0 stopwords
NEAR = "the quick brown fox jumps over lazy dogs today"  # 1/9 -> bad
NEAR2 = "the cat and dog sat on mats quietly here today"  # 2/10 = 0.2 near
SHORT = "home"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, "\n".join(t)) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _classes(spark, lines):
    out = (
        boilerplate_lines(_docs(spark, [lines]))
        .orderBy("pos")
        .select("cls", "is_content")
        .collect()
    )
    return [r["cls"] for r in out], [r["is_content"] for r in out]


def test_context_free_classes(spark):
    cls, _ = _classes(spark, [GOOD, BAD, NEAR2, SHORT])
    assert cls == ["good", "bad", "near", "short"]


def test_low_density_is_bad_not_near(spark):
    cls, _ = _classes(spark, [NEAR])
    assert cls == ["bad"]


def test_short_rescued_by_either_side(spark):
    # good above: rescued
    _, fin = _classes(spark, [GOOD, SHORT])
    assert fin == [True, True]
    # good below: rescued
    _, fin = _classes(spark, [SHORT, GOOD])
    assert fin == [True, True]
    # decisive neighbours both bad: dropped
    _, fin = _classes(spark, [BAD, SHORT, BAD])
    assert fin == [False, False, False]


def test_rescue_uses_nearest_decisive_not_adjacent(spark):
    # short/near run between a bad and a good decisive line: every
    # ambiguous line sees good on one side -> all rescued
    _, fin = _classes(spark, [BAD, SHORT, NEAR2, SHORT, GOOD])
    assert fin == [False, True, True, True, True]


def test_all_ambiguous_doc_drops_everything(spark):
    # no decisive neighbour anywhere: (NULL | NULL) must read false
    _, fin = _classes(spark, [SHORT, NEAR2, SHORT])
    assert fin == [False, False, False]


def test_strip_totality_and_rebuild(spark):
    df = _docs(spark, [[GOOD, BAD, SHORT], [], [BAD]])
    out = {r["doc_id"]: r for r in boilerplate_strip(df).collect()}
    # SHORT's nearest decisive neighbour is the BAD line, not the
    # farther GOOD one -> it is chrome, only GOOD survives
    assert out[0]["n_lines"] == 3 and out[0]["n_content"] == 1
    assert out[0]["text_content"] == GOOD
    # empty doc survives with zeros (totality)
    assert out[1]["n_lines"] == 0 and out[1]["text_content"] == ""
    assert out[2]["n_content"] == 0 and out[2]["text_content"] == ""


def test_custom_stopword_list(spark):
    df = _docs(spark, [["zork zork gork bork plork fnork"]])
    out = boilerplate_lines(df, stopwords=["zork", "gork"]).collect()[0]
    assert out["cls"] == "good" and out["sw_density"] == pytest.approx(0.5)


def test_single_exchange_plan(spark):
    """The explode, both neighbour windows, and the final verdict all
    ride ONE doc_id exchange (boilerplate_strip's totality back-join
    adds a second, ids-only one — the module docstring's contract)."""
    df = _docs(spark, [[GOOD, BAD]])
    plan = boilerplate_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_arrow_impl_row_identical_and_total(spark):
    import random

    rng = random.Random(11)
    vocab = ("the cat is warm", "alpha beta gamma delta epsilon zeta eta theta",
             "home", "the dog and the bird sit in the sun today", "menu login")
    docs = [
        (i, "\n".join(rng.choice(vocab) for _ in range(rng.randint(0, 8))))
        for i in range(60)
    ] + [(100, ""), (101, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, boilerplate_strip(df).collect()))
    b = sorted(map(tuple, boilerplate_strip(df, impl="arrow").collect()))
    assert a == b and len(a) == 62  # bit-identical AND total


def test_arrow_impl_zero_exchange(spark):
    df = _docs(spark, [[GOOD, BAD]])
    plan = (
        boilerplate_strip(df, impl="arrow")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan
