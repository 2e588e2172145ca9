"""Anchor-text aggregation: for every link target, the top-k terms of
the anchor text on its in-links — the classic query-independent
relevance signal (Craswell 2001 "Effective Site Finding using Link
Anchor Information"; Common Crawl ships per-host anchor aggregates)
and a spam input (keyword-stuffed anchors concentrate mass on terms
the page body never supports).

Pipeline (all JVM-side until the bounded final rollup):

    links(src, dst, anchor) -> lower + split on non-alphanumerics ->
    explode terms -> groupBy(dst, term) COUNT   [the corpus exchange]
    -> per-dst top-k by (count DESC, term ASC)  [bounded rollup]

Output is one row per (target, rank): ``(target, rank, term, n)`` —
rank is 1-based, ties broken lexicographically so the selection is
deterministic and cross-engine bit-equal. A link whose anchor repeats
a term contributes each occurrence (occurrence counts, not link
counts; document-frequency variants are a caller-side distinct away).

Scale shape (10^12 links): the explode multiplies rows only by anchor
length (anchors are a few terms); the (dst, term) COUNT is map-side
partial and AQE skew-splittable — the everyone-links-here hub is
spread across its term keys. The per-target top-k is a second
aggregate whose groups are (target -> distinct anchor terms), bounded
by the term vocabulary a single page attracts (~10^5 worst case, a
few MB of (term, count) pairs) — a sort_array+slice over a
collect_list aggregate, NOT a window, so map-side partial merging
applies and no full-corpus partition pins to one task.

Reference analog: none (single-raster engine); extends the link-graph
family (operators/pagerank.py, linkstats.py) per SURVEY.md §2.E.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_SPLIT = "[^a-z0-9]+"


def anchor_terms(
    links: DataFrame,
    dst: str = "dst",
    anchor: str = "anchor",
) -> DataFrame:
    """(target, term, n) — exploded, lowercased, non-alphanumeric-split
    anchor term occurrence counts per link target. The corpus-sized
    stage of anchor_topk, exposed for callers that want the full
    distribution (e.g. anchor/body divergence scoring)."""
    return (
        links.select(
            F.col(dst).cast("long").alias("target"),
            F.explode(F.split(F.lower(F.col(anchor)), _TERM_SPLIT)).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("target", "term")
        .agg(F.count("*").alias("n"))
    )


def anchor_body_divergence(
    links: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dst: str = "dst",
    anchor: str = "anchor",
) -> DataFrame:
    """Anchor-spam signal (Davison 2000 "Recognizing Nepotistic
    Links"; nepotistic/keyword-stuffed anchors concentrate terms the
    target's body never uses): per link target,

        (target, n_terms, anchor_mass, unsupported_mass,
         unsupported_q6)

    where anchor_mass is total anchor term occurrences pointing at
    the target, unsupported_mass the share of that mass whose term
    does not occur in the target's own body (same non-alphanumeric
    tokenizer on both sides, so punctuation never fakes divergence),
    and unsupported_q6 the ratio in exact parts-per-million (floor
    division — the linkstats.py quantized-ratio contract). Targets
    with no in-link anchors emit nothing (there is no signal to
    score); a target with anchors but no/empty body counts all mass
    unsupported.

    Scale shape: anchor side is the anchor_terms rollup (its corpus
    exchange); body side is ONE distinct (id, term) explode; support
    is an equi-join on the (target, term) pair key — high-cardinality
    composite key, AQE-splittable — followed by one map-side-partial
    aggregate per target. Document text never rides past its own
    explode."""
    a = anchor_terms(links, dst=dst, anchor=anchor)
    body = docs.select(
        F.col(id_col).cast("long").alias("target"),
        F.explode(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), _TERM_SPLIT)
        ).alias("term"),
    ).where(F.col("term") != "").distinct()
    return (
        a.join(body.withColumn("_in_body", F.lit(1)), ["target", "term"], "left")
        .groupBy("target")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("n").alias("anchor_mass"),
            F.sum(F.when(F.col("_in_body").isNull(), F.col("n")).otherwise(F.lit(0))).alias(
                "unsupported_mass"
            ),
        )
        .select(
            "target",
            "n_terms",
            "anchor_mass",
            "unsupported_mass",
            F.expr("(unsupported_mass * 1000000) div anchor_mass")
            .cast("long")
            .alias("unsupported_q6"),
        )
    )


def anchor_topk(
    links: DataFrame,
    k: int = 3,
    dst: str = "dst",
    anchor: str = "anchor",
) -> DataFrame:
    """(target, rank, term, n) — the k most frequent anchor terms per
    link target, rank 1-based, ordered by (n DESC, term ASC). Targets
    with fewer than k distinct terms emit fewer rows; targets with no
    in-links (or all-empty anchors) emit none.
    """
    if k < 1:
        raise ValueError(f"anchor_topk: k must be >= 1, got {k}")
    counts = anchor_terms(links, dst=dst, anchor=anchor)
    # top-k per target WITHOUT a window: sort_array over a struct whose
    # leading field is the negated count makes (n DESC, term ASC) the
    # natural ascending struct order; slice bounds the carry to k.
    picked = counts.groupBy("target").agg(
        F.slice(
            F.sort_array(F.collect_list(F.struct(F.negate(F.col("n")).alias("_neg"), "term", "n"))),
            1,
            k,
        ).alias("_top")
    )
    return picked.select(
        "target", F.posexplode("_top").alias("_pos", "_row")
    ).select(
        "target",
        (F.col("_pos") + 1).cast("int").alias("rank"),
        F.col("_row.term").alias("term"),
        F.col("_row.n").alias("n"),
    )
