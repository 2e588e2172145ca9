"""Streaming corpus ingestion: the A15 treatment for the text family.

A continuously arriving crawl (one row per fetched document with an
arrival timestamp) is cleaned ONLINE — PII scrub, C4 line/page gates,
quality + language annotation — and deduplicated against the
watermark horizon, all in a single structured-streaming query:

    readStream -> ingest_corpus(...) -> run_stream_to_parquet(...)

Why this is streaming-safe by construction: every cleaning gate here
is a pure per-row column expression (functions/pii.py,
operators/c4.py, functions/textfn.py — no aggregation, no UDF with
state), so the ONLY stateful operator in the plan is the watermarked
``dropDuplicatesWithinWatermark`` keeper inherited from
streaming/events.streaming_dedup. State is therefore bounded by the
crawl-time horizon (16-byte content keys, evicted as the watermark
passes), never by corpus size — the same contract the events
pipeline pins.

Gates that NEED corpus-wide aggregation (Gopher repetition rules,
line/span dedup, decontamination, sampling) deliberately stay in the
batch clean-corpus job (plans/clean_corpus.py): they are
cross-document relations, and their streaming formulations would
hold unbounded state. The intended production topology is
ingest_corpus (online, per-arrival) feeding periodic clean-corpus
runs (batch, corpus-level) — exactly the CommonCrawl-style
ingest-then-curate split.

Reference parity: the geospatial reference has no text pipeline; the
streaming machinery itself mirrors streaming/events.py (A15), which
maps the reference's chunked streaming sink (reference
core/tile_processor.py:1403-1468) onto structured streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textfn
from ..functions.pii import redact_text
from ..operators.c4 import c4_features
from .events import streaming_dedup


def ingest_corpus(
    docs: DataFrame,
    ts_col: str = "ts",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    watermark: str = "1 hour",
    min_quality: float | None = None,
    c4_rules: bool = True,
    blocklist: list[str] | None = None,
    seen_exact: DataFrame | None = None,
) -> DataFrame:
    """The online cleaning chain over a (ts, doc_id, text) relation —
    batch or streaming (the twin discipline: the SAME function body
    serves both, so the parity test compares one code path to itself
    under the two execution modes).

    Order: PII scrub (transform) -> C4 gates (drop + line rewrite,
    when ``c4_rules``) -> quality/language annotation (+ optional
    ``min_quality`` gate) -> first-arrival content dedup within the
    watermark -> (optional) cross-snapshot exact-dedup against
    ``seen_exact``. Output: (ts, doc_id, text, quality_score, lang)
    plus the dedup key columns (fp_hash, fp_len).

    ``seen_exact`` is the STATIC kept-corpus snapshot of
    operators/increment.exact_snapshot — distinct (_h, _len) 16-byte
    keys. The gate is a stream-static LEFT-ANTI join, which
    structured streaming executes STATELESSLY (the static side is
    re-scannable per micro-batch; broadcastable when compact), so it
    closes the watermark horizon's blind spot — recrawls arriving
    AFTER the horizon evicted their key are still dropped if the
    kept corpus has them — without growing stream state. The dedup
    keys are definitionally aligned: both sides derive from
    dedup.norm_text + xxhash64.
    """
    x = docs.select(
        F.col(ts_col),
        F.col(doc_id_col),
        redact_text(F.col(text_col)).alias(text_col),
    )
    if c4_rules:
        x = (
            c4_features(x, doc_id_col, text_col, blocklist=blocklist)
            .where("keep")
            .select(ts_col, doc_id_col, F.col("text_clean").alias(text_col))
        )
    x = textfn.quality_features(x, text_col=text_col).withColumn(
        "lang", textfn.lang_id(F.col(text_col))
    )
    if min_quality is not None:
        x = x.where(F.col("quality_score") >= min_quality)
    x = x.select(ts_col, doc_id_col, text_col, "quality_score", "lang")
    out = streaming_dedup(
        x, ts_col=ts_col, text_col=text_col, watermark=watermark, tie_col=doc_id_col
    )
    if seen_exact is not None:
        out = out.join(
            seen_exact.select(
                F.col("_h").alias("fp_hash"), F.col("_len").alias("fp_len")
            ).distinct(),
            ["fp_hash", "fp_len"],
            "left_anti",
        )
    return out
