"""Gopher repetition quality filter + CCNet corpus line dedup
(operators/repetition.py) — hand-computed expectations on a tiny
corpus, keeper discipline, idempotence, and edge cases."""

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.repetition import (
    line_dedup,
    repetition_features,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # doc 0: 4 lines, one duplicated twice -> 2 dup occurrences
        (0, "aa bb\naa bb\naa bb\ncc dd"),
        # doc 1: clean two-liner, long enough that no single bigram
        # covers >20% of its characters
        (1, "ee ff gg hh ii jj\nkk ll mm nn oo pp"),
        # doc 2: shares doc 1's first line (cross-doc duplicate)
        (2, "ee ff gg hh ii jj\nqq rr"),
        # doc 3: heavy bigram repetition on a single line
        (3, "xx yy xx yy xx yy xx yy"),
        # doc 4: single token (no bigrams)
        (4, "solo"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_repetition_features_hand_computed(corpus):
    out = {
        r["doc_id"]: r
        for r in repetition_features(corpus).collect()
    }
    d0 = out[0]
    # 4 lines, 2 distinct -> dup_line_frac = 2/4
    assert d0["n_lines"] == 4 and d0["n_distinct_lines"] == 2
    assert d0["dup_line_frac"] == pytest.approx(0.5)
    # dup chars: "aa bb" (5 chars) x 2 extra occurrences = 10 of 20
    assert d0["dup_line_char_frac"] == pytest.approx(10 / 20)
    # top bigram crosses the line boundary tokens: "bb aa" appears 2x,
    # "aa bb" appears 3x -> argmax is ("aa bb", 3)
    assert d0["top_bigram"] == "aa bb" and d0["top_bigram_cnt"] == 3
    assert not d0["keep"]

    d1 = out[1]
    assert d1["dup_line_frac"] == 0.0 and d1["dup_line_char_frac"] == 0.0
    # all bigrams distinct -> cnt 1, tie broken by greatest gram;
    # 5 of 34 chars -> under the 0.2 gate
    assert d1["top_bigram_cnt"] == 1 and d1["top_bigram"] == "oo pp"
    assert d1["top_bigram_char_frac"] == pytest.approx(5 / 34)
    assert d1["keep"]

    d3 = out[3]
    # one line -> no line dups, but "xx yy" occurs 4 of 7 bigrams and
    # covers 4*5=20 of 23 chars -> filtered on the 2-gram rule alone
    assert d3["dup_line_frac"] == 0.0
    assert d3["top_bigram"] == "xx yy" and d3["top_bigram_cnt"] == 4
    assert d3["top_bigram_char_frac"] == pytest.approx(20 / 23)
    assert not d3["keep"]

    d4 = out[4]
    # no bigrams -> empty top gram, zero fraction, kept
    assert d4["top_bigram"] == "" and d4["top_bigram_cnt"] == 0
    assert d4["top_bigram_char_frac"] == 0.0 and d4["keep"]


def test_line_dedup_keeper_and_counts(corpus):
    out = {r["doc_id"]: r for r in line_dedup(corpus).collect()}
    # doc 0 keeps one "aa bb" (pos 0) + "cc dd"
    assert out[0]["n_lines"] == 4 and out[0]["n_kept"] == 2
    assert out[0]["text_dedup"] == "aa bb\ncc dd"
    # doc 1 is fully first -> untouched
    assert out[1]["n_removed"] == 0
    assert out[1]["text_dedup"] == "ee ff gg hh ii jj\nkk ll mm nn oo pp"
    # doc 2 loses its first line to doc 1 (min doc_id wins)
    assert out[2]["n_kept"] == 1 and out[2]["text_dedup"] == "qq rr"
    # single-line docs survive
    assert out[3]["n_removed"] == 0 and out[4]["text_dedup"] == "solo"


def test_repetition_features_total_on_lineless_docs(spark):
    """Docs with empty / whitespace-only text (no non-empty lines)
    must still get a row — zeroed counts, 0.0 fractions, keep=true —
    instead of silently vanishing from the output."""
    df = spark.createDataFrame(
        [(0, ""), (1, "\n\n"), (2, "   "), (3, "aa bb\ncc dd")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_features(df).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    for did in (0, 1):
        r = out[did]
        assert r["n_lines"] == 0 and r["n_distinct_lines"] == 0
        assert r["dup_line_frac"] == 0.0 and r["dup_line_char_frac"] == 0.0
        assert r["top_bigram"] == "" and r["top_bigram_cnt"] == 0
        assert r["top_bigram_char_frac"] == 0.0 and r["keep"]
    # "   " is one whitespace-only line with no tokens: 1 line, kept
    assert out[2]["keep"] and out[2]["top_bigram_cnt"] == 0
    # doc 3 proves non-empty docs still flow through the real gates
    # (its top bigram covers 5/10 chars -> 2-gram rule rejects it)
    assert out[3]["n_lines"] == 2 and not out[3]["keep"]


def test_line_dedup_idempotent(corpus):
    once = line_dedup(corpus).select(
        "doc_id", F.col("text_dedup").alias("text")
    )
    twice = line_dedup(once)
    assert twice.agg(F.sum("n_removed")).collect()[0][0] == 0


def test_line_dedup_total_on_fully_duplicate_doc(spark):
    # doc 11's only line is doc 10's line -> doc 11 keeps nothing but
    # still appears in the output with empty text
    df = spark.createDataFrame(
        [(10, "same line"), (11, "same line")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert out[10]["n_kept"] == 1
    assert out[11]["n_kept"] == 0 and out[11]["text_dedup"] == ""


def test_multiline_synthesis_plants_expected_duplicates(spark):
    """The registry's deterministic multi-line synthesis: %3 docs carry
    within-doc duplicate lines, %7 docs carry the shared boilerplate."""
    from fujishadergpu_spark.queries import (
        _BOILERPLATE_LINE,
        _multiline_documents,
    )

    ml = _multiline_documents(spark, "/root/testdata/sf0.001").limit(0)
    assert ml.columns == ["doc_id", "text"]
    ml = _multiline_documents(spark, "/root/testdata/sf0.001")
    rows = {r["doc_id"]: r["text"].split("\n") for r in ml.limit(22).collect()}
    for did, lines in rows.items():
        has_bp = _BOILERPLATE_LINE in lines
        assert has_bp == (did % 7 == 0), did
        dup = len(lines) - len(set(lines))
        if did % 3 == 0 and did % 7 != 0:
            assert dup >= 1, did


# ---------------------------------------------------------------------
# full Gopher n-gram family (ngram_repetition_features)
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def ngram_corpus(spark):
    rows = [
        # doc 0: "a..h" twice -> every 5..8-gram duplicated, 9/10 not;
        # cover union = all 16 tokens, 14 of 15 separators (the seam
        # separator between the two halves is never inside one
        # occurrence)
        (0, "a b c d e f g h a b c d e f g h"),
        # doc 1: 30 distinct 3-char tokens -> no dup grams, top fracs
        # all under the published thresholds -> keep
        (1, " ".join(f"t{i:02d}" for i in range(30))),
        # doc 2: empty text -> total over the input, zero fracs, keep
        (2, ""),
        # doc 3: one token repeated 6x -> overlapping top-bigram count
        # exceeds 1.0 by design (counts multiply, union does not)
        (3, "x x x x x x"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngram_repetition_hand_computed(ngram_corpus):
    from fujishadergpu_spark.operators.repetition import (
        ngram_repetition_features,
    )

    out = {r["doc_id"]: r for r in ngram_repetition_features(ngram_corpus).collect()}
    assert set(out) == {0, 1, 2, 3}

    d0 = out[0]  # total = 16 chars + 15 seps = 31
    assert d0["total_chars"] == 31
    # ties on cnt=2 break to the lexicographically greatest gram
    assert d0["top2_char_frac"] == pytest.approx(6 / 31)   # "g h" x2
    assert d0["top3_char_frac"] == pytest.approx(10 / 31)  # "f g h" x2
    assert d0["top4_char_frac"] == pytest.approx(14 / 31)  # "e f g h" x2
    # n=5..8: union covers all 16 tokens + 14 separators
    for n in (5, 6, 7, 8):
        assert d0[f"dup{n}_char_frac"] == pytest.approx(30 / 31), n
    for n in (9, 10):
        assert d0[f"dup{n}_char_frac"] == 0.0, n
    assert d0["keep"] is False  # top3 10/31 > 0.18

    d1 = out[1]  # 30*3 chars + 29 seps = 119
    assert d1["total_chars"] == 119
    assert d1["top2_char_frac"] == pytest.approx(7 / 119)
    assert all(d1[f"dup{n}_char_frac"] == 0.0 for n in range(5, 11))
    assert d1["keep"] is True

    d2 = out[2]
    assert d2["total_chars"] == 0
    assert d2["top2_char_frac"] == 0.0 and d2["dup10_char_frac"] == 0.0
    assert d2["keep"] is True

    d3 = out[3]  # 6 chars + 5 seps = 11
    assert d3["total_chars"] == 11
    assert d3["top2_char_frac"] == pytest.approx(15 / 11)  # "x x" x5, 3 chars
    assert d3["dup5_char_frac"] == pytest.approx(1.0)  # full cover
    assert d3["keep"] is False


def test_paragraph_repetition_hand_computed(spark):
    """Gopher dup-paragraph rules: exact fractions on a hand-built
    corpus, totality on paragraph-less docs."""
    from fujishadergpu_spark.operators.repetition import (
        paragraph_repetition_features,
    )

    pa, pb, pc = "one two\nthree four", "five six", "seven eight nine"
    docs = [
        (0, "\n\n".join([pa, pb, pc])),          # all distinct -> keep
        (1, "\n\n".join([pa, pa, pb, pa])),      # pa x3 -> dup frac 0.5
        (2, ""),                                  # no paragraphs
        (3, pa + "\n\n\n\n" + pa),                # 3+ newlines = ONE separator
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in paragraph_repetition_features(df).collect()}

    assert out[0]["n_paras"] == 3 and out[0]["n_distinct_paras"] == 3
    assert out[0]["dup_para_frac"] == 0.0 and out[0]["keep"]

    d1 = out[1]
    assert d1["n_paras"] == 4 and d1["n_distinct_paras"] == 2
    assert d1["dup_para_frac"] == pytest.approx(2 / 4)
    # dup chars: 2 extra copies of pa (18 chars) over 3*18+8 = 62
    assert d1["dup_para_char_frac"] == pytest.approx(36 / 62)
    assert d1["keep"] is False

    assert out[2]["n_paras"] == 0 and out[2]["keep"] is True  # totality

    d3 = out[3]  # the 4-newline gap is one separator: exactly 2 paras
    assert d3["n_paras"] == 2 and d3["n_distinct_paras"] == 1
    assert d3["dup_para_frac"] == pytest.approx(0.5) and d3["keep"] is False


def test_paragraph_dedup_keeper_and_rebuild(spark):
    """First-occurrence keeper at paragraph granularity; documents
    rebuilt from surviving paragraphs with blank-line joins;
    totality on fully-duplicate docs."""
    from fujishadergpu_spark.operators.repetition import paragraph_dedup

    pa, pb, pc = "alpha one\nalpha two", "beta solo", "gamma x\ngamma y"
    docs = [
        (0, "\n\n".join([pa, pb])),
        (1, "\n\n".join([pa, pc, pb])),   # pa, pb already owned by doc 0
        (2, pa),                           # everything duplicate -> empty
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in paragraph_dedup(df).collect()}

    assert out[0]["n_paras"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["text_dedup"] == pa + "\n\n" + pb
    assert out[1]["n_paras"] == 3 and out[1]["n_kept"] == 1
    assert out[1]["n_removed"] == 2 and out[1]["text_dedup"] == pc
    assert out[2]["n_kept"] == 0 and out[2]["text_dedup"] == ""


def test_paragraph_dedup_idempotent(spark):
    from fujishadergpu_spark.operators.repetition import paragraph_dedup

    docs = [(0, "p one\n\np two"), (1, "p two\n\np three")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    once = paragraph_dedup(df).select(
        "doc_id", F.col("text_dedup").alias("text")
    )
    twice = paragraph_dedup(once).collect()
    for r in twice:
        assert r["n_removed"] == 0, r


def test_paragraph_dedup_plan_has_no_unit_window(spark):
    """The keeper is a map-side-partial aggregate, never a window over
    paragraph partitions (the line_dedup hot-key discipline)."""
    from fujishadergpu_spark.operators.repetition import paragraph_dedup

    df = spark.createDataFrame([(0, "a\n\nb")], "doc_id long, text string")
    plan = paragraph_dedup(df)._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan


def test_sentence_dedup_keeper_and_rebuild(spark):
    from fujishadergpu_spark.operators.repetition import sentence_dedup

    docs = spark.createDataFrame(
        [
            (0, "the cat sat. it ran fast. the cat sat."),   # in-doc dup
            (1, "it ran fast. something new here."),          # cross-doc dup of doc 0's sentence
            (2, "no punctuation single sentence"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in sentence_dedup(docs).collect()}
    assert out[0]["n_sentences"] == 3 and out[0]["n_kept"] == 2
    assert out[0]["text_dedup"] == "the cat sat. it ran fast."
    # doc 1 loses "it ran fast." to doc 0's earlier occurrence
    assert out[1]["n_kept"] == 1 and out[1]["text_dedup"] == "something new here."
    assert out[2]["n_kept"] == 1 and out[2]["n_removed"] == 0
    assert out[3]["n_sentences"] == 0 and out[3]["text_dedup"] == ""
