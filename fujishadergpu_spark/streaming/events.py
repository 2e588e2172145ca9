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


def streaming_dedup(
    pages: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
    tie_col: str = "url",
) -> DataFrame:
    """Incremental ingestion dedup over a continuously arriving crawl:
    pass through only the FIRST page carrying each content key.

    The key is the same 16-byte (xxhash64(normalized text), length)
    discipline as ``operators/dedup.exact_dedup`` — fixed-width state
    and shuffle rows regardless of document size. Streaming uses
    ``dropDuplicatesWithinWatermark``, so per-key state is EVICTED
    once the watermark passes it: state is bounded by the crawl-time
    horizon, not corpus size (re-crawls beyond the horizon re-emit —
    the cross-horizon pass is batch ``exact_dedup``).

    Which physical row wins is arrival-order-defined in a stream; the
    BATCH twin keeps a DETERMINISTIC representative instead — the
    min-(ts, tie_col) row per key, one struct-min aggregate (same
    shuffle cost as dropDuplicates: full rows shuffle either way, the
    comparator short-circuits on ts) — aligning it with exact_dedup's
    min-id discipline and making it row-for-row oracle-able (DuckDB
    row_number() OVER (PARTITION BY key ORDER BY ts, tie) = 1).
    tie_col defaults to the pages schema's 'url'; batch callers on a
    differently-shaped frame pass any unique-ish column. The
    stream==batch parity test pins the order-free shared contract:
    the emitted KEY SET and its cardinality.
    """
    from ..operators.dedup import norm_text

    t = norm_text(F.col(text_col))
    keyed = pages.withColumn("fp_hash", F.xxhash64(t)).withColumn(
        "fp_len", F.length(t)
    )
    if pages.isStreaming:
        return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["fp_hash", "fp_len"]
        )
    cols = keyed.columns
    win = F.min(
        F.struct(F.col(ts_col), F.col(tie_col), F.struct(*cols).alias("_r"))
    ).alias("_w")
    return keyed.groupBy("fp_hash", "fp_len").agg(win).select("_w._r.*")


TRANSITION_OUT_SCHEMA = "key long, ts timestamp, from_cell long, to_cell long"
TRANSITION_STATE_SCHEMA = "last_cell long, last_ts timestamp"


def cell_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    cell_col: str = "cell_id",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator: emit one row per cell CHANGE per key
    (movement events between spatial cells).

    Streaming: ``applyInPandasWithState`` — per-key state is
    (last_cell, last_ts); ``lag()`` is not available under streaming,
    so this is the genuinely-custom state slot (SURVEY.md §7.3). Rows
    are sorted by ts inside each micro-batch; rows older than the
    stored state ts are dropped (late-data policy: transitions are
    strictly forward in time).

    ``timeout_ms`` (state eviction for long-running continuous jobs)
    is OPT-IN: a ProcessingTimeTimeout keeps an availableNow drain
    alive until the timeout fires, so batch-style drains (tests, the
    parity check) must run with NoTimeout.

    Batch: the identical semantics from one ``lag()`` window — the
    twin the parity test compares against.
    """
    if not df.isStreaming:
        from pyspark.sql.window import Window

        w = Window.partitionBy(key_col).orderBy(ts_col)
        prev = F.lag(cell_col).over(w)
        return (
            df.withColumn("_prev", prev)
            .filter(F.col("_prev").isNotNull() & (F.col("_prev") != F.col(cell_col)))
            .select(
                F.col(key_col).alias("key"),
                F.col(ts_col).alias("ts"),
                F.col("_prev").alias("from_cell"),
                F.col(cell_col).alias("to_cell"),
            )
        )

    import pandas as pd  # noqa: PLC0415 (worker-side import)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=["key", "ts", "from_cell", "to_cell"])
            return
        last_cell, last_ts = state.get if state.exists else (None, None)
        out_rows = []
        # concat ALL chunks before the sort: a key larger than one
        # Arrow batch arrives as several shuffle-ordered chunks, and
        # per-chunk sorting would process later timestamps first and
        # silently drop the earlier chunk's rows as "late"
        chunks = [pdf for pdf in pdf_iter]
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(ts_col)
        for ts, cell in zip(pdf[ts_col], pdf[cell_col]):
            if last_ts is not None and ts < last_ts:
                continue  # late row older than state: drop
            if last_cell is not None and cell != last_cell:
                out_rows.append((key[0], ts, last_cell, cell))
            last_cell, last_ts = cell, ts
        state.update((last_cell, last_ts))
        if timeout_ms is not None:
            state.setTimeoutDuration(int(timeout_ms))
        yield pd.DataFrame(out_rows, columns=["key", "ts", "from_cell", "to_cell"])

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        TRANSITION_OUT_SCHEMA,
        TRANSITION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout if timeout_ms is not None else GroupStateTimeout.NoTimeout,
    )


def run_stream_to_parquet(
    stream_df: DataFrame, path: str, checkpoint: str, output_mode: str = "append"
):
    """availableNow drain into a parquet sink with a durable
    checkpoint — the production sink shape (A15): the checkpoint's
    file-source offsets + sink commit log give exactly-once output
    across restarts (a re-run after new files arrive processes ONLY
    the new files; a re-run with nothing new writes nothing). On an
    Iceberg catalog the same query targets ``.toTable(...)``."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


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
