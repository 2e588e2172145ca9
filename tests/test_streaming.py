"""Streaming-vs-batch twin parity over the driver events table."""

import pytest

from fujishadergpu_spark.streaming import events as ev

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _rows(df, keycols):
    return sorted(tuple(r[c] for c in keycols) for r in df.collect())


def test_windowed_counts_stream_matches_batch(spark, events_batch, tmp_path):
    src = str(tmp_path / "events_src")
    events_batch.repartition(6).write.parquet(src)  # several files => several triggers
    stream = ev.read_events_stream(spark, src, files_per_trigger=2)
    ev.run_stream_to_memory(ev.windowed_counts(stream), "win_counts")
    got = _rows(spark.sql("SELECT * FROM win_counts"), ["window_start", "event_type", "n_events"])
    exp = _rows(ev.windowed_counts(events_batch), ["window_start", "event_type", "n_events"])
    assert got == exp


def test_session_stats_stream_matches_batch(spark, events_batch, tmp_path):
    src = str(tmp_path / "events_src2")
    events_batch.repartition(4).write.parquet(src)
    stream = ev.read_events_stream(spark, src, files_per_trigger=2)
    ev.run_stream_to_memory(ev.session_stats(stream), "sess_stats")
    got = _rows(spark.sql("SELECT * FROM sess_stats"), ["session_start", "user_id", "n_events"])
    exp = _rows(ev.session_stats(events_batch), ["session_start", "user_id", "n_events"])
    assert got == exp


def test_cell_transitions_stream_matches_batch(spark, events_batch, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-key cell
    transitions from the stream equal the batch lag() twin. Events get
    a synthetic cell from value buckets; single availableNow batch so
    in-order arrival is guaranteed (the op's documented contract)."""
    from pyspark.sql import functions as F

    with_cell = events_batch.withColumn("cell_id", (F.col("value") * 5).cast("long"))
    src = str(tmp_path / "events_cells")
    with_cell.write.parquet(src)
    schema = ev.EVENTS_SCHEMA + ", cell_id long"
    stream = spark.readStream.schema(schema).parquet(src)
    ev.run_stream_to_memory(ev.cell_transitions(stream), "cell_trans", output_mode="append")
    got = _rows(spark.sql("SELECT * FROM cell_trans"), ["key", "ts", "from_cell", "to_cell"])
    exp = _rows(ev.cell_transitions(with_cell), ["key", "ts", "from_cell", "to_cell"])
    assert got == exp and len(got) > 100


def test_parquet_sink_checkpoint_exactly_once(spark, events_batch, tmp_path):
    """A15: the checkpointed parquet sink is exactly-once across
    restarts — resume after new data processes only the new files;
    resume with nothing new writes nothing."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = events_batch.filter("user_id % 2 = 0")
    second = events_batch.filter("user_id % 2 = 1")
    first.write.parquet(src)

    def drain():
        stream = ev.read_events_stream(spark, src, files_per_trigger=2)
        enriched = stream.withColumn("vk", (stream["value"] * 10).cast("long"))
        ev.run_stream_to_parquet(enriched, out, ckpt)

    drain()
    n1 = spark.read.parquet(out).count()
    assert n1 == first.count()
    drain()  # nothing new -> no duplicates
    assert spark.read.parquet(out).count() == n1
    second.write.mode("append").parquet(src)
    drain()  # only the new files processed
    total = spark.read.parquet(out)
    assert total.count() == events_batch.count()
    assert total.select("event_id").distinct().count() == events_batch.count()


def test_multimodal_plumbing(spark):
    from fujishadergpu_spark.sources.multimodal import extract_features, synthetic_media

    media = synthetic_media(spark, 200)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 200
    assert all(len(r["features"]) == 32 for r in rows)
    # deterministic across partitioning
    a = {r["media_id"]: list(r["features"]) for r in rows}
    b = {r["media_id"]: list(r["features"]) for r in extract_features(media.repartition(9)).collect()}
    assert a == b


def test_streaming_cell_counts_matches_batch(spark, tmp_path):
    from fujishadergpu_spark.sources.pages import pages as gen_pages
    from fujishadergpu_spark.streaming.events import streaming_cell_counts

    src = str(tmp_path / "pages_stream")
    gen_pages(spark, 2000).repartition(5).write.parquet(src)
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    ev.run_stream_to_memory(streaming_cell_counts(stream), "cell_counts")
    got = _rows(spark.sql("SELECT * FROM cell_counts"), ["window_start", "cell_id", "n_pages"])
    exp = _rows(streaming_cell_counts(spark.read.parquet(src)), ["window_start", "cell_id", "n_pages"])
    assert got == exp and len(got) > 100


def test_cell_transitions_multi_chunk_key(spark, events_batch, tmp_path):
    """A key spanning several Arrow chunks in one micro-batch must
    still process in global time order (review finding r1: per-chunk
    sorting dropped earlier chunks' rows as 'late')."""
    from pyspark.sql import functions as F

    with_cell = (
        events_batch.withColumn("user_id", F.lit(7).cast("long"))
        .withColumn("cell_id", (F.col("value") * 5).cast("long"))
    )
    src = str(tmp_path / "one_key")
    with_cell.write.parquet(src)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
    try:
        schema = ev.EVENTS_SCHEMA + ", cell_id long"
        stream = spark.readStream.schema(schema).parquet(src)
        ev.run_stream_to_memory(ev.cell_transitions(stream), "one_key_trans", output_mode="append")
        got = _rows(spark.sql("SELECT * FROM one_key_trans"), ["key", "ts", "from_cell", "to_cell"])
        exp = _rows(ev.cell_transitions(with_cell), ["key", "ts", "from_cell", "to_cell"])
        assert len(exp) > 500  # one key, thousands of rows -> many chunks
        assert got == exp
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_streaming_dedup_matches_batch_keyset(spark, tmp_path):
    from pyspark.sql import functions as F

    from fujishadergpu_spark.sources.pages import pages as gen_pages

    src = str(tmp_path / "pages_dedup_src")
    p = gen_pages(spark, 1500)
    p.repartition(3).write.parquet(src)
    # re-crawl wave: same texts again, slightly later fetch time —
    # cross-file duplicates the stream must suppress
    p.limit(400).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 10 MINUTES")
    ).repartition(2).write.mode("append").parquet(src)

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    # watermark wider than the synthetic crawl span: no state eviction
    # mid-run, so every key must be emitted EXACTLY once
    ev.run_stream_to_memory(
        ev.streaming_dedup(stream, watermark="720 hours"),
        "dedup_pages",
        output_mode="append",
    )
    got = [
        (r["fp_hash"], r["fp_len"])
        for r in spark.sql("SELECT fp_hash, fp_len FROM dedup_pages").collect()
    ]
    exp = {
        (r["fp_hash"], r["fp_len"])
        for r in ev.streaming_dedup(spark.read.parquet(src))
        .select("fp_hash", "fp_len")
        .collect()
    }
    assert set(got) == exp
    assert len(got) == len(exp)  # no key emitted twice despite the re-crawl
    assert len(got) < 1900  # the duplicates actually existed and were dropped
