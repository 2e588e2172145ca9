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


def domain_keywords(
    df: DataFrame,
    k: int = 5,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` distinctive terms per domain — class-based TF-IDF
    (the c-TF-IDF of Grootendorst 2022 / classic class-IDF): score a
    (domain, word) pair by

        tf(word | domain) * ln((N_domains + 1) / (1 + df_domains(word)))

    so corpus-wide words (the/and) zero out and site-specific
    vocabulary surfaces — the one-glance "what IS this domain" label
    behind topic-aware curation decisions.

    Cross-engine rank contract (the BM25 discipline): ranking ties in
    a DOUBLE score can flip across engines in the last ulp, so the
    rank orders by the QUANTIZED score (round(score * 1e6) as long)
    then word ascending — bit-stable everywhere.

    100-TB shape: one exchange builds the (domain, word, tf) relation
    (map-side partial); df_domains and N are aggregates of that
    relation (vocabulary-sized, never the corpus); the top-k window
    partitions by domain over each domain's vocabulary — bounded
    breadth, high-cardinality key, no skew surface. Output is
    (k x domains) rows.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    tf = (
        df.select(
            F.col(domain_col).alias("domain"),
            F.explode(textfn.tokens(F.lower(F.col(text_col)))).alias("word"),
        )
        .groupBy("domain", "word")
        .agg(F.count("*").alias("tfc"))
    )
    dfreq = tf.groupBy("word").agg(F.count("*").alias("_df"))
    nd = tf.select("domain").distinct().agg(F.count("*").alias("_nd"))
    score = F.col("tfc") * F.log(
        (F.col("_nd") + F.lit(1)).cast("double") / (F.col("_df") + F.lit(1))
    )
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(nd))
        .select(
            "domain",
            "word",
            "tfc",
            F.round(score * F.lit(1000000.0)).cast("bigint").alias("score_q6"),
        )
    )
    w = Window.partitionBy("domain").orderBy(F.desc("score_q6"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("domain", "word", "tfc", "score_q6", "rank")
    )
