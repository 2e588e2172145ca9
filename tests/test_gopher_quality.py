"""Gopher §A1.1 document-level quality rules
(operators/gopher_quality.py): each published rule arm on hand-built
documents, totality over empty/NULL text, and boundary behavior."""

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.gopher_quality import (
    GOPHER_STOP_WORDS,
    gopher_quality_features,
)

GOOD_SENTENCE = "the quick brown fox and that dog have fun with it"  # 5 stop hits


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_features(df, **kw).collect()
    }


def test_good_document_keeps(spark):
    out = _run(spark, [(0, " ".join([GOOD_SENTENCE] * 6))])
    r = out[0]
    assert r["n_words"] == 66 and r["keep"]
    assert r["stop_hits"] == 5
    assert r["alpha_word_frac"] == 1.0


def test_word_count_bounds(spark):
    out = _run(
        spark,
        [(0, " ".join([GOOD_SENTENCE] * 6)), (1, GOOD_SENTENCE)],
        min_words=50,
    )
    assert out[0]["keep"] and not out[1]["keep"]
    # 11-word doc passes when the bound is lowered: the bound is the
    # only failing rule
    low = _run(spark, [(1, GOOD_SENTENCE)], min_words=5)
    assert low[1]["keep"]


def test_totality_empty_and_null(spark):
    out = _run(spark, [(0, ""), (1, None), (2, "   ")])
    assert set(out) == {0, 1, 2}
    for r in out.values():
        assert r["n_words"] == 0
        assert r["mean_word_len"] == 0.0 and r["alpha_word_frac"] == 0.0
        assert not r["keep"]
    assert out[0]["n_lines"] == 0 and out[1]["n_lines"] == 0
    # a whitespace-only line is non-empty under the != '' line filter
    # (same in the DuckDB twin); the doc still fails via word count
    assert out[2]["n_lines"] == 1


def test_mean_word_length_bounds(spark):
    short = " ".join(["a b c d"] * 20)  # mean 1.0 < 3
    long = " ".join(["extraordinarily"] * 60)  # mean 15 > 10
    out = _run(spark, [(0, short), (1, long)], min_stop_hits=0, min_words=10)
    assert out[0]["mean_word_len"] == 1.0 and not out[0]["keep"]
    assert out[1]["mean_word_len"] == 15.0 and not out[1]["keep"]


def test_symbol_ratio(spark):
    # 14 words, 2 '#' + 1 '...' + 1 '…' = 4 symbols -> ratio 4/14
    out = _run(spark, [(0, "# # ... … w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")])
    assert out[0]["symbol_word_ratio"] == pytest.approx(4 / 14)
    assert not out[0]["keep"]
    # non-overlapping '...' count: '....' is ONE occurrence (+ '.')
    o2 = _run(spark, [(1, ".... w1 w2 w3")])
    assert o2[1]["symbol_word_ratio"] == pytest.approx(1 / 4)


def test_bullet_and_ellipsis_line_fractions(spark):
    bullets = "\n".join(["• point one here", "- dash two here", "plain line"])
    ell = "\n".join(["ends here...", "ends there…", "no end", "also no"])
    out = _run(spark, [(0, bullets), (1, ell)])
    assert out[0]["bullet_line_frac"] == pytest.approx(2 / 3)
    assert out[1]["ellipsis_line_frac"] == pytest.approx(2 / 4)
    # a 10/11-bullet doc fails the 0.9 rule even with everything else
    # passing
    many = "\n".join(["• " + GOOD_SENTENCE] * 10 + [GOOD_SENTENCE] * 1)
    r = _run(spark, [(2, many)], min_words=10)[2]
    assert r["bullet_line_frac"] > 0.9 and not r["keep"]


def test_alpha_word_fraction(spark):
    doc = "12 34 " + " ".join(["word"] * 6)  # 6/8 alpha
    out = _run(spark, [(0, doc)], min_words=5, min_stop_hits=0)
    assert out[0]["alpha_word_frac"] == pytest.approx(6 / 8)
    assert not out[0]["keep"]  # 0.75 < 0.8


def test_stop_word_rule_distinct_and_case(spark):
    # 'The' (capitalized) + 'with' = 2 DISTINCT hits; repeats don't
    # inflate the count
    doc = "The with with with " + " ".join(["filler"] * 50)
    out = _run(spark, [(0, doc)])
    assert out[0]["stop_hits"] == 2 and out[0]["keep"]
    one = _run(spark, [(1, "the " + " ".join(["filler"] * 50))])
    assert one[1]["stop_hits"] == 1 and not one[1]["keep"]
    assert len(GOPHER_STOP_WORDS) == 8


def test_zero_shuffle_plan(spark):
    """The operator is one per-row projection: no Exchange anywhere
    in its plan (the 100-TB contract in the module docstring)."""
    df = spark.createDataFrame([(0, GOOD_SENTENCE)], "doc_id long, text string")
    plan = gopher_quality_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_streaming_safe(spark, tmp_path):
    """The gate is a stateless projection: identical rows in
    structured streaming (availableNow) and batch."""
    from fujishadergpu_spark.streaming.events import run_stream_to_memory

    docs = [(0, " ".join([GOOD_SENTENCE] * 6)), (1, "too short"), (2, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    src = str(tmp_path / "gq_stream_src")
    df.repartition(2).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    run_stream_to_memory(
        gopher_quality_features(stream), "gopher_stream_out", output_mode="append"
    )
    got = {
        tuple(r) for r in spark.sql("SELECT * FROM gopher_stream_out").collect()
    }
    exp = {tuple(r) for r in gopher_quality_features(df).collect()}
    assert got == exp and len(got) == 3
