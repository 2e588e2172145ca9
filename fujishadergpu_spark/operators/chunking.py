"""Context-window chunking — splitting documents into fixed-size
token windows with a stride (overlap), the step that turns cleaned
documents into training examples (GPT-style pretraining consumes
size-L windows; RAG indexing consumes overlapping chunks).

100-TB shape: pure whole-stage-codegen column math — tokenize, a
``sequence()`` explode over chunk indices (the knn ring_candidates
discipline), and per-chunk arithmetic on the token array. Zero
exchanges: chunking is embarrassingly row-parallel, and the fan-out
factor (~n_tokens/stride per doc) is bounded by document length.
Partition sizing note: output rows ≈ input tokens / stride, so
`spark.sql.files.maxPartitionBytes` on the scan bounds per-task
output; no repartition is needed.

Zero-token documents produce zero chunks by design (a window over no
tokens is not a training example); ``chunk_stats`` is the total
per-document view (one row per doc, zeroed counts) when a totality
gate is needed.

Reference parity note: the geospatial reference has no text pipeline;
this module is part of the web-scale training-data mandate
(SURVEY.md §2.E). The window/stride arithmetic mirrors the tile
pyramid's overlap discipline (reference core/tile_processor.py halo
windows) in one dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textfn


def _n_chunks(n, size: int, stride: int):
    """1 + ceil(max(n - size, 0) / stride) for n > 0 — every token is
    covered, the last chunk may be short, all-integer arithmetic."""
    over = F.greatest(n - F.lit(size), F.lit(0))
    return F.when(
        n > 0, (F.lit(1) + F.floor((over + F.lit(stride - 1)) / F.lit(stride))).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))


def chunk_windows(
    df: DataFrame,
    size: int,
    stride: int,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per (document, window): chunk_id, start_tok (0-based),
    n_chunk_tokens, first_tok, last_tok. Chunk i covers tokens
    [i*stride, i*stride + size) clipped to the document."""
    if size <= 0 or stride <= 0:
        raise ValueError(f"size and stride must be positive, got {size}, {stride}")
    if stride > size:
        raise ValueError(f"stride {stride} > size {size} would skip tokens")
    t = textfn.tokens(F.col(text_col))
    base = df.select(
        F.col(doc_id_col).alias("doc_id"), t.alias("_t"), F.size(t).alias("_n")
    )
    nc = _n_chunks(F.col("_n"), size, stride)
    ch = base.where(F.col("_n") > 0).select(
        "doc_id",
        "_t",
        "_n",
        F.explode(F.sequence(F.lit(0).cast("bigint"), nc - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    clen = F.least(F.lit(size).cast("bigint"), F.col("_n") - start)
    return ch.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        start.cast("bigint").alias("start_tok"),
        clen.cast("bigint").alias("n_chunk_tokens"),
        F.element_at("_t", (start + 1).cast("int")).alias("first_tok"),
        F.element_at("_t", (start + clen).cast("int")).alias("last_tok"),
    )


def chunk_stats(
    df: DataFrame,
    size: int,
    stride: int,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Total per-document chunk accounting (one row per input doc):
    n_tokens, n_chunks, n_window_tokens (sum of window lengths — the
    training-token count including overlap duplication)."""
    if size <= 0 or stride <= 0:
        raise ValueError(f"size and stride must be positive, got {size}, {stride}")
    t = textfn.tokens(F.col(text_col))
    n = F.size(t).cast("bigint")
    nc = _n_chunks(n, size, stride)
    # window-token total in closed form: full chunks contribute size
    # each; the last chunk contributes n - (nc-1)*stride (≤ size).
    last = n - (nc - 1) * F.lit(stride)
    n_window = F.when(nc > 0, (nc - 1) * F.lit(size) + F.least(F.lit(size).cast("bigint"), last)).otherwise(
        F.lit(0).cast("bigint")
    )
    return df.select(
        F.col(doc_id_col).alias("doc_id"),
        n.alias("n_tokens"),
        nc.alias("n_chunks"),
        n_window.cast("bigint").alias("n_window_tokens"),
    )
