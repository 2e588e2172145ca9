"""Streaming corpus ingestion (streaming/corpus.py): the online
clean chain's semantics in batch mode (deterministic keeper) and the
stream==batch parity of the emitted content-key set."""

import datetime

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.streaming import events as ev
from fujishadergpu_spark.streaming.corpus import ingest_corpus

GOOD_A = "this line has plenty of words inside."
GOOD_B = "another perfectly reasonable sentence sits here today."
GOOD_C = "a third quite acceptable line closes the page."


def _ts(minute):
    return datetime.datetime(2026, 1, 1, 12, minute)


DOCS = [
    # 0: clean three-line page -> kept
    (_ts(0), 0, "\n".join([GOOD_A, GOOD_B, GOOD_C])),
    # 1: byte-identical content arriving later -> deduped away
    (_ts(5), 1, "\n".join([GOOD_A, GOOD_B, GOOD_C])),
    # 2: PII in an otherwise good page -> kept, email redacted
    (_ts(1), 2, "\n".join([GOOD_A, GOOD_B, "write to bob@example.com for more details."])),
    # 3: lorem ipsum page tell -> C4-dropped
    (_ts(2), 3, "\n".join([GOOD_A, GOOD_B, "lorem ipsum dolor sit amet filler text."])),
    # 4: only two surviving lines -> below min_sentences, dropped
    (_ts(3), 4, "\n".join([GOOD_A, GOOD_B])),
    # 5: distinct clean page -> kept
    (_ts(4), 5, "\n".join([GOOD_B, GOOD_C, "one more unique line rounds it out."])),
]
SCHEMA = "ts timestamp, doc_id long, text string"


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def test_batch_semantics(spark, docs_df):
    out = {r["doc_id"]: r.asDict() for r in ingest_corpus(docs_df).collect()}
    # doc 1 deduped against doc 0 (min-ts keeper), 3 and 4 C4-dropped
    assert set(out) == {0, 2, 5}
    assert "<EMAIL>" in out[2]["text"] and "bob@example.com" not in out[2]["text"]
    # annotation columns present and sane
    assert out[0]["lang"] == "en"
    assert 0.0 <= out[0]["quality_score"] <= 1.0
    assert out[0]["fp_len"] > 0


def test_min_quality_gate(spark, docs_df):
    kept = {r["doc_id"] for r in ingest_corpus(docs_df, min_quality=2.0).collect()}
    assert kept == set()  # score is bounded by 1.0: the gate really ran


def test_stream_matches_batch_keyset(spark, docs_df, tmp_path):
    src = str(tmp_path / "docs_src")
    docs_df.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    ev.run_stream_to_memory(
        ingest_corpus(stream, watermark="720 hours"),
        "ingest_corpus_out",
        output_mode="append",
    )
    got = [
        (r["fp_hash"], r["fp_len"])
        for r in spark.sql(
            "SELECT fp_hash, fp_len FROM ingest_corpus_out"
        ).collect()
    ]
    exp = {
        (r["fp_hash"], r["fp_len"])
        for r in ingest_corpus(docs_df).select("fp_hash", "fp_len").collect()
    }
    assert len(got) == len(exp)  # exactly-once emission per key
    assert set(got) == exp


def test_stateless_until_dedup(spark, docs_df, tmp_path):
    """The whole cleaning chain must add NO stateful operator beyond
    the dedup keeper: the streaming plan carries exactly one
    dedupe-within-watermark node and no stateful aggregate."""
    src = str(tmp_path / "docs_src_plan")
    docs_df.write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    plan = ingest_corpus(stream)._jdf.queryExecution().analyzed().toString()
    assert plan.count("DeduplicateWithinWatermark") == 1
    assert "Aggregate" not in plan


def _seen_snapshot(spark):
    """Snapshot containing doc 0/1's content (as the kept corpus)."""
    from fujishadergpu_spark.operators.increment import exact_snapshot

    kept = spark.createDataFrame(
        [(99, "\n".join([GOOD_A, GOOD_B, GOOD_C]))], "doc_id long, text string"
    )
    return exact_snapshot(kept)


def test_snapshot_gate_batch(spark, docs_df):
    out = {r["doc_id"] for r in ingest_corpus(docs_df, seen_exact=_seen_snapshot(spark)).collect()}
    # docs 0/1 match the kept corpus -> gone; 2 and 5 survive
    assert out == {2, 5}


def test_snapshot_gate_stream_matches_batch_and_stays_stateless(spark, docs_df, tmp_path):
    src = str(tmp_path / "docs_src_snap")
    docs_df.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    snap = _seen_snapshot(spark)
    q = ingest_corpus(stream, watermark="720 hours", seen_exact=snap)
    # the stream-static anti-join adds no stateful operator
    plan = q._jdf.queryExecution().analyzed().toString()
    assert plan.count("DeduplicateWithinWatermark") == 1
    assert "Aggregate" not in plan
    ev.run_stream_to_memory(q, "ingest_snap_out", output_mode="append")
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM ingest_snap_out").collect()}
    exp = {r["doc_id"] for r in ingest_corpus(docs_df, seen_exact=snap).collect()}
    assert got == exp == {2, 5}
