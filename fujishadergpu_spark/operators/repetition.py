"""Repetition-based quality filtering and corpus-level line dedup for
web-text training pipelines.

Two operators over multi-line documents (``\\n``-separated lines, the
shape of real crawled text):

- :func:`repetition_features` — the repetition signals of Gopher
  (Rae et al. 2021, §A1.1 quality filtering): duplicate-line fraction,
  duplicate-line character fraction, and the fraction of characters
  covered by the most frequent word 2-gram, plus a ``keep`` flag at
  the published thresholds (0.30 / 0.20 / 0.20).
- :func:`line_dedup` — CCNet-style corpus-level line deduplication
  (Wenzek et al. 2020): every occurrence of a line after the first
  across the WHOLE corpus is dropped; the keeper is the minimum
  (doc_id, position) — the same deterministic min-struct keeper
  discipline as operators/dedup.exact_dedup.

Reference parity: the reference repo is the geospatial half of this
graft and has no text pipeline; these extend the LLM-data-pipeline
family (the training-data-pipeline mandate; README capability table) alongside operators/dedup.py.

Scale notes (100 TB):
- Per-doc features explode lines / bigrams and aggregate on
  (doc_id, token): short-string shuffle rows keyed by the document,
  map-side partial aggregation, no all-pairs path, nothing collected
  on the driver.
- Corpus line dedup reduces (line, doc_id, pos) rows with ONE
  hash aggregate ``groupBy(line).agg(min(struct(doc_id, pos)))``
  whose output IS the kept row set — map-side partial aggregation
  collapses every occurrence of a hot boilerplate line ("Home",
  cookie banners) to one row per map task before the Exchange, and
  AQE can skew-split the aggregate shuffle. (A window-min
  ``partitionBy(line)`` keeper — the previous shape — would force
  every occurrence of a hot line into ONE task with no partial agg
  and no AQE split: a guaranteed straggler at 100 TB. Pinned by
  tests/test_plan_shape.py: no Window node on the keeper stage.)
  Then one regroup by doc_id reassembles text. Line text crosses
  the wire at most once per DISTINCT (map task, line); no text
  enters any iteration.
- All fractions are single CAST(x AS DOUBLE)/y divisions of exact
  integer ratios, so the DuckDB twins hash bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Gopher §A1.1 published thresholds
MAX_DUP_LINE_FRAC = 0.30
MAX_DUP_LINE_CHAR_FRAC = 0.20
MAX_TOP_BIGRAM_CHAR_FRAC = 0.20


def _empty_str_array():
    return F.array().cast("array<string>")


def doc_lines(text):
    """Non-empty ``\\n``-separated lines (JVM split + filter)."""
    return F.filter(F.split(text, "\n"), lambda l: l != "")


def doc_tokens_ws(text):
    """Whitespace tokens across line boundaries (space or newline)."""
    return F.filter(F.split(text, "[ \n]+"), lambda t: t != "")


def repetition_features(
    df: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_frac: float = MAX_DUP_LINE_FRAC,
    max_dup_line_char_frac: float = MAX_DUP_LINE_CHAR_FRAC,
    max_top_bigram_char_frac: float = MAX_TOP_BIGRAM_CHAR_FRAC,
) -> DataFrame:
    """Per-document repetition features + keep flag (Gopher §A1.1).

    Returns one row per input document: n_lines, n_distinct_lines,
    dup_line_frac, dup_line_char_frac, top_bigram, top_bigram_cnt,
    top_bigram_char_frac, keep. Character fractions are measured
    against the total line characters (separators excluded), so both
    engines agree exactly. Total over the input: documents with no
    non-empty lines (empty / whitespace-only text — common in crawled
    corpora) still get a row, with all counts 0, all fractions 0.0
    and ``keep = true`` (no repetition evidence is not a rejection;
    emptiness is the length filter's job, textfn.quality_features).
    """
    did = F.col(doc_id_col)
    base = df.select(
        did.alias("doc_id"),
        doc_lines(F.col(text_col)).alias("lines"),
        doc_tokens_ws(F.col(text_col)).alias("tk"),
    )

    # duplicate-line stats: explode -> per-(doc, line) count -> per-doc
    per_line = (
        base.select("doc_id", F.explode("lines").alias("line"))
        .groupBy("doc_id", "line")
        .agg(F.count("*").alias("cnt"))
    )
    line_stats = per_line.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_lines"),
        F.count("*").alias("n_distinct_lines"),
        F.sum(F.col("cnt") * F.length("line")).alias("line_chars"),
        F.sum((F.col("cnt") - F.lit(1)) * F.length("line")).alias("dup_line_chars"),
    )

    # most frequent word 2-gram: argmax via one struct-max (ties broken
    # by the lexicographically greatest gram — row_number ORDER BY
    # cnt DESC, gram DESC in the DuckDB twin)
    n = F.size("tk")
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at("tk", i), F.element_at("tk", i + 1)),
        ),
    ).otherwise(_empty_str_array())
    per_gram = (
        base.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    top = per_gram.groupBy("doc_id").agg(
        F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("tg")
    )

    # left-join onto the full input id set (the line_dedup totals
    # discipline) so line-less documents survive with zeroed counts
    out = (
        base.select("doc_id")
        .join(line_stats, "doc_id", "left")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("bigint").alias("n_lines"),
            F.coalesce(F.col("n_distinct_lines"), F.lit(0))
            .cast("bigint")
            .alias("n_distinct_lines"),
            F.coalesce(F.col("line_chars"), F.lit(0)).alias("line_chars"),
            F.coalesce(F.col("dup_line_chars"), F.lit(0)).alias("dup_line_chars"),
            F.col("tg"),
        )
    )
    dup_line_frac = F.when(
        F.col("n_lines") > 0,
        (F.col("n_lines") - F.col("n_distinct_lines")).cast("double") / F.col("n_lines"),
    ).otherwise(F.lit(0.0))
    dup_char_frac = F.when(
        F.col("line_chars") > 0,
        F.col("dup_line_chars").cast("double") / F.col("line_chars"),
    ).otherwise(F.lit(0.0))
    top_chars = F.coalesce(F.col("tg.cnt") * F.length("tg.gram"), F.lit(0))
    top_frac = F.when(
        F.col("line_chars") > 0, top_chars.cast("double") / F.col("line_chars")
    ).otherwise(F.lit(0.0))
    return out.select(
        "doc_id",
        "n_lines",
        "n_distinct_lines",
        dup_line_frac.alias("dup_line_frac"),
        dup_char_frac.alias("dup_line_char_frac"),
        F.coalesce(F.col("tg.gram"), F.lit("")).alias("top_bigram"),
        F.coalesce(F.col("tg.cnt"), F.lit(0)).cast("bigint").alias("top_bigram_cnt"),
        top_frac.alias("top_bigram_char_frac"),
        (
            (dup_line_frac <= F.lit(max_dup_line_frac))
            & (dup_char_frac <= F.lit(max_dup_line_char_frac))
            & (top_frac <= F.lit(max_top_bigram_char_frac))
        ).alias("keep"),
    )


def line_dedup(
    df: DataFrame, doc_id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-level line dedup: keep only the globally-first occurrence
    of every distinct line (keeper = min (doc_id, position)); rebuild
    each document from its surviving lines in original order.

    Returns (doc_id, n_lines, n_kept, n_removed, text_dedup) for every
    input document — documents whose lines were all removed survive
    with empty text, so the operator is total and idempotent.
    """
    did = F.col(doc_id_col)
    base = df.select(did.alias("doc_id"), doc_lines(F.col(text_col)).alias("lines"))
    exploded = base.select(
        "doc_id", F.posexplode("lines").alias("pos", "line")
    )
    # one hash aggregate per distinct line: min(struct(doc_id, pos))
    # IS the kept occurrence, so its output is directly the survivor
    # row set — map-side partial collapses hot boilerplate lines
    # before the Exchange and AQE can skew-split it (a window-min
    # partitionBy(line) keeper would put every occurrence of a hot
    # line in one un-splittable task; see the module scale notes)
    kept = (
        exploded.groupBy("line")
        .agg(F.min(F.struct("doc_id", "pos")).alias("keeper"))
        .select(
            F.col("keeper.doc_id").alias("doc_id"),
            F.col("keeper.pos").alias("pos"),
            "line",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text_dedup"),
        )
    )
    totals = base.select("doc_id", F.size("lines").cast("bigint").alias("n_lines"))
    return totals.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("bigint")
        .alias("n_removed"),
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
    )
