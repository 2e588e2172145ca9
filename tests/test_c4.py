"""C4 heuristic cleaning rules (operators/c4.py, Raffel 2020 §2.2):
every line rule and every page rule on a hand corpus, totality, and
the filter variant."""

from pyspark.sql import functions as F

from fujishadergpu_spark.operators.c4 import c4_features, c4_filter

GOOD = "this line has plenty of words inside."  # survives every rule
DOCS = [
    # 0: three good lines -> kept, text unchanged
    (0, "\n".join([GOOD] * 3)),
    # 1: line without terminal punctuation is dropped -> only 2 kept
    (1, "\n".join([GOOD, GOOD, "no terminal punctuation on this line"])),
    # 2: four-word line is dropped (min 5 words)
    (2, "\n".join([GOOD, GOOD, "just four words here."])),
    # 3: javascript line is dropped even with punctuation and length
    (3, "\n".join([GOOD, GOOD, "please enable JavaScript to continue browsing."])),
    # 4: lorem ipsum anywhere kills the page
    (4, "\n".join([GOOD, GOOD, "Lorem Ipsum dolor sit amet sample filler."])),
    # 5: curly brace anywhere kills the page
    (5, "\n".join([GOOD, GOOD, "code snippet { return 0 } appears here."])),
    # 6: blocklisted word kills the page
    (6, "\n".join([GOOD, GOOD, "text mentioning badwordx in the middle here."])),
    # 7: empty text -> total output, keep false
    (7, ""),
    # 8: terminal '?' and '!' and '\"' all count
    (8, "is this a question with words?\nwhat an exciting line this is!\nhe said \"this line ends with a quote.\""),
]


def _run(spark, **kw):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in c4_features(df, **kw).collect()}


def test_line_rules(spark):
    out = _run(spark)
    assert out[0]["n_kept"] == 3 and out[0]["keep"]
    assert out[0]["text_clean"] == "\n".join([GOOD] * 3)
    # each bad line dropped -> 2 kept -> below min_sentences -> page out
    for did in (1, 2, 3):
        assert out[did]["n_lines"] == 3 and out[did]["n_kept"] == 2, did
        assert not out[did]["keep"], did
        assert out[did]["text_clean"] == "\n".join([GOOD, GOOD]), did


def test_page_rules(spark):
    out = _run(spark, blocklist=["badwordx"])
    # pages 4/5 have >= 3 kept lines but the page-level tells fire
    assert out[4]["n_kept"] == 3 and not out[4]["keep"]
    assert out[5]["n_kept"] == 3 and not out[5]["keep"]
    assert not out[6]["keep"]
    # without the blocklist argument doc 6 passes (mechanism is caller-armed)
    assert _run(spark)[6]["keep"]


def test_totality_and_terminal_variants(spark):
    out = _run(spark)
    assert set(out) == set(range(9))  # one row per input doc, always
    assert out[7]["n_lines"] == 0 and out[7]["n_kept"] == 0
    assert out[7]["text_clean"] == "" and not out[7]["keep"]
    assert out[8]["n_kept"] == 3 and out[8]["keep"]


def test_filter_variant(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    kept = {
        r["doc_id"]: r["text"]
        for r in c4_filter(df, blocklist=["badwordx"]).collect()
    }
    assert set(kept) == {0, 8}
    assert kept[0] == "\n".join([GOOD] * 3)


def test_min_params_override(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in c4_features(df, min_words=4, min_sentences=2).collect()
    }
    # the four-word line now survives; two kept lines now pass the page
    assert out[2]["n_kept"] == 3
    assert out[1]["keep"]
