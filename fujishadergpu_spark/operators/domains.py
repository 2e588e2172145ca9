"""Domain-level corpus curation — aggregate per-source quality
signals and derive a source keep-list (RefinedWeb / C4 practice:
curation decisions at the site level, not just per page, because
spam and boilerplate cluster by domain).

100-TB shape:
- ``domain_stats``: ONE exchange of (domain, partial aggregates) with
  map-side combine; the per-row quality features are computed inline
  (whole-stage codegen, the doc_quality expressions), so text never
  shuffles — only the bounded aggregate rows do. The output relation
  is domain-count-sized (~10^7 registrable domains for the web).
- ``domain_filter``: the stats relation is bounded, so the keep
  verdict ships back to documents as a BROADCAST hash join — the
  corpus never shuffles to learn its domain verdict.

Determinism: every aggregate is integer or decimal (quality scores
are summed as DECIMAL(28,12), so the sum is exact and order-free
across engines/partitionings — the q1 decimal-sum discipline from
the driver contract); keep thresholds compare in the decimal domain.

Reference parity note: the geospatial reference has no text pipeline;
this module is part of the web-scale training-data mandate
(SURVEY.md §2.E). The stats->verdict->broadcast-back shape is the
A9/A11 global-stats normalize discipline applied per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textfn

_QUALITY_DEC = "decimal(28,12)"


def domain_stats(
    df: DataFrame,
    domain_col: str = "source",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain aggregates: n_docs, n_langs, n_tokens, n_chars,
    sum_quality (exact decimal), avg_tokens (bigint division —
    cross-engine stable)."""
    q = textfn.quality_features(
        df.select(
            F.col(domain_col).alias("domain"),
            F.col(doc_id_col).alias("_doc"),
            F.col(text_col).alias("text"),
            F.col("lang").alias("_lang") if "lang" in df.columns else F.lit(None).cast("string").alias("_lang"),
        )
    )
    return (
        q.groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("_lang").alias("n_langs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_chars_f").cast("bigint").alias("n_chars"),
            F.sum(F.col("quality_score").cast(_QUALITY_DEC)).alias("sum_quality"),
        )
        .withColumn("avg_tokens", (F.col("n_tokens") / F.col("n_docs")).alias("avg_tokens"))
    )


def domain_filter(
    df: DataFrame,
    stats: DataFrame,
    min_docs: int = 1,
    min_avg_quality: float = 0.0,
    domain_col: str = "source",
) -> DataFrame:
    """Adds a ``domain_keep`` flag to documents: keep when the domain
    has at least ``min_docs`` documents AND its mean quality clears
    ``min_avg_quality``. The mean test runs in the exact decimal
    domain (sum_quality >= threshold * n_docs) so the verdict is a
    pure function of the corpus, not of float summation order.

    ``stats`` is domain-count-bounded, so the join broadcasts; the
    document side never shuffles."""
    thr = F.col("sum_quality") >= F.lit(min_avg_quality).cast(_QUALITY_DEC) * F.col(
        "n_docs"
    )
    verdict = stats.select(
        F.col("domain"),
        ((F.col("n_docs") >= F.lit(min_docs)) & thr).alias("domain_keep"),
    )
    return df.join(
        F.broadcast(verdict), df[domain_col] == verdict["domain"], "left"
    ).drop("domain").fillna({"domain_keep": False})
