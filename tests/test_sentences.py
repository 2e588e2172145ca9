"""Sentence segmentation + sentence-window chunking
(functions/sentences.py): boundary semantics, coverage law, totality,
plan shape, streaming parity."""

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.functions.sentences import (
    sentence_windows,
    sentences,
)


def _sents(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return df.select(sentences(F.col("text")).alias("s")).collect()[0]["s"]


def test_segmentation_semantics(spark):
    assert _sents(spark, "First one. Second here!  Third now? Done.") == [
        "First one.",
        "Second here!",
        "Third now?",
        "Done.",
    ]
    # punctuation runs are ONE boundary; terminal marks stay attached
    assert _sents(spark, "Wait... what?! Yes.") == ["Wait...", "what?!", "Yes."]
    # no terminal punctuation -> one sentence; NULL/empty -> none
    assert _sents(spark, "no punctuation here") == ["no punctuation here"]
    assert _sents(spark, "") == []
    assert _sents(spark, None) == []
    # newlines count as boundary whitespace
    assert _sents(spark, "Line one.\nLine two.") == ["Line one.", "Line two."]


def test_window_coverage_and_shapes(spark):
    text = "s1 a. s2 b! s3 c? s4 d. s5 e."
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = sentence_windows(df, 2, 2).collect()
    # 5 sentences, size 2 stride 2 -> starts 0, 2, 4; last is short
    assert [(r["start_sent"], r["n_win_sentences"]) for r in out] == [
        (0, 2),
        (2, 2),
        (4, 1),
    ]
    assert out[0]["text_chunk"] == "s1 a. s2 b!"
    assert out[2]["text_chunk"] == "s5 e."
    # every sentence index covered exactly once at stride == size
    covered = set()
    for r in out:
        covered |= set(range(r["start_sent"], r["start_sent"] + r["n_win_sentences"]))
    assert covered == set(range(5))


def test_overlapping_windows(spark):
    text = "a one. b two. c three."
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = sentence_windows(df, 2, 1).collect()
    assert [r["start_sent"] for r in out] == [0, 1]
    assert out[1]["text_chunk"] == "b two. c three."


def test_empty_docs_produce_no_windows(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "One real. Two real.")],
        "doc_id long, text string",
    )
    out = sentence_windows(df, 3).collect()
    assert {r["doc_id"] for r in out} == {2}


def test_validation():
    with pytest.raises(ValueError):
        sentence_windows(None, 0)
    with pytest.raises(ValueError):
        sentence_windows(None, 2, 0)


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(0, "A b. C d.")], "doc_id long, text string")
    plan = sentence_windows(df, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_streaming_safe(spark, tmp_path):
    from fujishadergpu_spark.streaming.events import run_stream_to_memory

    docs = [(0, "First one. Second two. Third three."), (1, "solo")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    src = str(tmp_path / "sent_stream_src")
    df.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    run_stream_to_memory(
        sentence_windows(stream, 2, 1), "sent_stream_out", output_mode="append"
    )
    got = {tuple(r) for r in spark.sql("SELECT * FROM sent_stream_out").collect()}
    exp = {tuple(r) for r in sentence_windows(df, 2, 1).collect()}
    assert got == exp
