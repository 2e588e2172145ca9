"""Edit-distance verification of near-duplicate candidate pairs.

Sketch-based dedup (MinHash bands, SimHash, n-gram Jaccard) surfaces
CANDIDATE pairs; corpus-curation pipelines that drop one side of a
pair often verify the candidates with a character-level measure first
(the "verify" stage of every fuzzy-dedup system, e.g. the
edit-similarity gate in the Lee et al. 2022 NearDup setup, which
confirms MinHash candidates at edit-similarity >= 0.8). This module
is that verification join:

  edit_sim(a, b) = 1 - levenshtein(a, b) / max(len(a), len(b), 1)

computed ONLY over the bounded candidate set — never all pairs.

100-TB shape:
- candidates arrive as (id_a, id_b) rows from the sketch stage
  (ids only — 16-byte shuffle rows);
- text joins happen AFTER candidate generation, so the corpus text
  relation is scanned once per side and shuffled only for the
  candidate keys (two equi-joins, AQE-skew-splittable);
- a LENGTH-BAND prefilter runs before the quadratic DP:
  levenshtein(a, b) >= |len(a) - len(b)|, so
  edit_sim >= t  implies  |len_a - len_b| <= (1 - t) * max(len_a,
  len_b). Length columns ride the candidate row, the band check is
  whole-stage-codegen, and the O(len_a * len_b) DP only runs on pairs
  that can still pass. In production you would additionally use
  Spark's bounded ``levenshtein(l, r, threshold)`` early-exit variant
  with a global cap (O(cap * len) per pair); the fixture keeps the
  2-arg form so the DuckDB twin is expression-identical.

Cross-engine contract: Spark's levenshtein counts CODE POINTS while
DuckDB's counts UTF-8 BYTES — identical iff the text is ASCII, which
the fixture corpus is (asserted in tests/test_editsim.py); the
distances and the single IEEE division both engines perform are then
bit-equal. On non-ASCII corpora the operator itself is fine (code
points are the right unit); only the DuckDB twin would diverge.

Reference parity note: the geospatial reference has no text pipeline;
this module is part of the web-scale training-data mandate
(SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import ngram_jaccard_pairs


def verify_pairs_edit_similarity(
    docs: DataFrame,
    candidates: DataFrame,
    sim_threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Verify candidate (id_a, id_b) pairs at character level.

    Returns (id_a, id_b, dist, edit_sim) for the candidates whose
    normalized edit similarity clears ``sim_threshold``. NULL text
    reads as ''. The length-band prefilter eliminates pairs that
    cannot pass BEFORE any DP runs (see module docstring).
    """
    if not 0.0 < sim_threshold <= 1.0:
        raise ValueError(f"sim_threshold must be in (0, 1], got {sim_threshold}")
    t = docs.select(
        F.col(id_col).alias("_id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_tx"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("_len"),
    )
    a = t.select(
        F.col("_id").alias("id_a"), F.col("_tx").alias("_ta"), F.col("_len").alias("_la")
    )
    b = t.select(
        F.col("_id").alias("id_b"), F.col("_tx").alias("_tb"), F.col("_len").alias("_lb")
    )
    j = candidates.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    mx = F.greatest(F.col("_la"), F.col("_lb"), F.lit(1))
    band = (
        F.abs(F.col("_la") - F.col("_lb")).cast("double")
        <= (F.lit(1.0) - F.lit(sim_threshold)) * mx.cast("double")
    )
    dist = F.levenshtein("_ta", "_tb")
    sim = F.lit(1.0) - dist.cast("double") / mx.cast("double")
    return (
        j.filter(band)
        .withColumns({"dist": dist.cast("bigint"), "edit_sim": sim})
        .filter(F.col("edit_sim") >= sim_threshold)
        .select("id_a", "id_b", "dist", "edit_sim")
    )


def edit_similarity_pairs(
    docs: DataFrame,
    sim_threshold: float = 0.8,
    candidate_threshold: float = 0.2,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """End-to-end fuzzy-dedup verify: n-gram Jaccard candidates
    (dedup.ngram_jaccard_pairs — the recall stage, threshold kept LOW)
    confirmed at ``sim_threshold`` edit similarity (the precision
    stage). The candidate stage bounds the quadratic work; the verify
    stage upgrades sketch recall to a character-level guarantee."""
    cands = ngram_jaccard_pairs(
        docs, id_col, text_col=text_col, n=n,
        threshold=candidate_threshold, max_df=max_df,
    )
    return verify_pairs_edit_similarity(
        docs, cands, sim_threshold, id_col=id_col, text_col=text_col
    )
