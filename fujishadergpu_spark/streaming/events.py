"""Event-stream operators: watermarked tumbling-window aggregates and
session windows, with batch twins.

The reference has no streaming path (SURVEY.md §2 notes the absence);
Structured Streaming supplies it: readStream → stateful aggregation →
writeStream. Each streaming operator has a *batch twin* built from
the identical expression tree, and the twin is what the DuckDB oracle
checks — streaming-vs-batch equivalence is then test-enforced with an
availableNow run into a memory sink (the same twin-parity discipline
as the reference's Dask-vs-tile backend tests).

Late data: the tumbling aggregate uses a watermark on ts; in batch
mode the watermark is a no-op, so twins agree on finite inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str, files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window per-type counts + value sum. Works on both a
    stream (with watermark state eviction) and a batch frame."""
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        ev.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def session_stats(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap-based) with event counts — the
    custom-stateful-operator slot; session_window keeps state in the
    streaming aggregation layer (no Python state)."""
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col("user_id"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def streaming_cell_counts(pages_stream: DataFrame, res: int = 7, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of the geo path: incoming pages are geoparsed
    and counted per (cell, hour window) with watermark-bounded state —
    incremental maintenance of the geo_cells aggregate over a
    continuously arriving crawl."""
    from pyspark.sql import functions as F

    from ..functions import cells, geoparse

    pts = geoparse.geoparse(pages_stream).withColumn(
        "cell_id", cells.cell_of(F.col("lat"), F.col("lon"), res)
    )
    ev = pts.withWatermark("warc_ts", watermark) if pages_stream.isStreaming else pts
    return (
        ev.groupBy(F.window("warc_ts", "1 hour").alias("w"), F.col("cell_id"))
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "cell_id", "n_pages")
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """availableNow drain into a memory sink (test/verification path)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
