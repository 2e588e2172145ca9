"""Readability metrics (functions/readability.py): exact counts on
hand-checkable text, the vowel-group syllable proxy, guards for empty
docs, and formula values against a by-hand computation."""

from fujishadergpu_spark.functions.readability import readability


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts_and_formulas(spark):
    # "the cat sat. it ran fast!" -> 6 words, 2 sentences,
    # syllables (vowel runs): the(1) cat(1) sat(1) it(1) ran(1) fast(1) = 6
    docs = _df(spark, [(0, "the cat sat. it ran fast!")])
    r = readability(docs).collect()[0]
    assert r["n_words"] == 6 and r["n_sentences"] == 2 and r["n_syllables"] == 6
    wps, ypw = 6 / 2, 6 / 6
    assert r["flesch_ease"] == 206.835 - 1.015 * wps - 84.6 * ypw
    assert r["fk_grade"] == 0.39 * wps + 11.8 * ypw - 15.59


def test_vowel_group_proxy(spark):
    # "beautiful" -> eau|i|u = 3 runs; "rhythm" -> y = 1; "queue" -> ueue = 1
    docs = _df(spark, [(0, "beautiful rhythm queue")])
    r = readability(docs).collect()[0]
    assert r["n_syllables"] == 5
    assert r["n_sentences"] == 1  # no terminal punctuation: one sentence


def test_empty_doc_scores_null(spark):
    docs = _df(spark, [(0, ""), (1, None)])
    out = {r["doc_id"]: r.asDict() for r in readability(docs).collect()}
    for i in (0, 1):
        assert out[i]["n_words"] == 0
        assert out[i]["flesch_ease"] is None and out[i]["fk_grade"] is None


def test_harder_text_scores_harder(spark):
    easy = "the cat sat. it ran. we go now. it is fun."
    hard = (
        "notwithstanding institutional heterogeneity considerations "
        "epistemological reorganization necessitates comprehensive "
        "multidimensional evaluation frameworks"
    )
    out = {r["doc_id"]: r.asDict() for r in readability(
        _df(spark, [(0, easy), (1, hard)])
    ).collect()}
    assert out[0]["flesch_ease"] > out[1]["flesch_ease"]
    assert out[0]["fk_grade"] < out[1]["fk_grade"]
