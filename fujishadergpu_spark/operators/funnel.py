"""Filter-attribution funnel over a per-document verdict relation.

Every published corpus recipe reports a filter-ablation table —
RefinedWeb (Penedo 2023, Table 2), FineWeb's per-step ablations,
Dolma's attribute statistics: for each rule, how many documents it
removes, and how many it UNIQUELY removes (documents no other rule
catches). Unique-removal is the number that justifies a rule's
existence: a rule with high overlap and zero unique catches is free
to drop; a rule with large unique mass deserves its own ablation
before shipping.

Input: any relation with an id column and one boolean column per
rule where TRUE means "this rule keeps the document" (the
corpus_filter_pipeline verdict shape). Output: one row per rule —
(rule, n_removed, n_unique_removed, removal_share) — plus the
corpus-level constants (n_docs, n_kept) on every row so the table
reads standalone.

100-TB shape: ONE single-row global aggregate with map-side partial
combine (2·R+2 longs per partition, R = number of rules); the
per-rule rows are a driver-side pivot of that one row — no second
scan, no shuffle beyond the aggregate, output exactly R rows.
removal_share is one IEEE division of two exact longs per rule.

Reference parity note: the geospatial reference has no text pipeline;
this module is part of the web-scale training-data mandate
(SURVEY.md §2.E).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_attribution(
    verdicts: DataFrame,
    rule_cols: list[str],
    keep_col: str | None = "keep",
) -> DataFrame:
    """Per-rule removal attribution (see module docstring). Rules are
    keep-flags: a document is removed by rule r when NOT r; uniquely
    removed when r is its ONLY failing rule."""
    if not rule_cols:
        raise ValueError("rule_cols must be non-empty")
    fail = {r: F.when(F.col(r), 0).otherwise(1) for r in rule_cols}
    nf = reduce(lambda a, b: a + b, fail.values())
    aggs = [F.count("*").cast("bigint").alias("n_docs")]
    if keep_col is not None:
        aggs.append(
            F.sum(F.when(F.col(keep_col), 1).otherwise(0)).cast("bigint").alias("n_kept")
        )
    else:
        aggs.append(F.sum(F.when(nf == 0, 1).otherwise(0)).cast("bigint").alias("n_kept"))
    for r in rule_cols:
        aggs.append(F.sum(fail[r]).cast("bigint").alias(f"_rm_{r}"))
        aggs.append(
            F.sum(F.when((fail[r] == 1) & (nf == 1), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_uq_{r}")
        )
    one = verdicts.agg(*aggs)
    # pivot the single aggregate row to one row per rule: a bounded
    # stack expression over the already-computed sums (no second scan)
    stack_args = []
    for r in rule_cols:
        stack_args += [F.lit(r), F.col(f"_rm_{r}"), F.col(f"_uq_{r}")]
    rows = one.select(
        "n_docs",
        "n_kept",
        F.stack(F.lit(len(rule_cols)), *stack_args).alias(
            "rule", "n_removed", "n_unique_removed"
        ),
    )
    return rows.select(
        "rule",
        "n_removed",
        "n_unique_removed",
        (F.col("n_removed").cast("double") / F.col("n_docs").cast("double")).alias(
            "removal_share"
        ),
        "n_docs",
        "n_kept",
    )


def threshold_sweep(
    scored: DataFrame,
    thresholds: list[float],
    score_col: str = "score",
    weight_col: str | None = None,
) -> DataFrame:
    """Filter-calibration curve — the FineWeb-Edu-style table behind
    "where do we set the classifier cutoff": for each candidate
    threshold, how many documents and how much token mass survive
    ``score >= threshold``. Returns one row per threshold:
    (threshold, n_kept, kept_share[, kept_weight, weight_share]).
    NULL scores never pass any threshold (unscored is not kept).

    Same execution shape as filter_attribution: ONE single-row global
    aggregate with a conditional sum per threshold (map-side partial,
    2·T+2 longs per partition), pivoted to T rows by a bounded stack —
    no T-fold row blowup, no second scan."""
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    if sorted(thresholds) != list(thresholds):
        raise ValueError("thresholds must be ascending")
    s = F.col(score_col)
    aggs = [F.count("*").cast("bigint").alias("n_docs")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).cast("bigint").alias("_tw"))
    for i, t in enumerate(thresholds):
        keep = s.isNotNull() & (s >= F.lit(t))
        aggs.append(F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias(f"_k{i}"))
        if weight_col is not None:
            aggs.append(
                F.sum(F.when(keep, F.col(weight_col)).otherwise(0))
                .cast("bigint")
                .alias(f"_w{i}")
            )
    one = scored.agg(*aggs)
    stack_args = []
    for i, t in enumerate(thresholds):
        stack_args += [F.lit(float(t)), F.col(f"_k{i}")]
        if weight_col is not None:
            stack_args.append(F.col(f"_w{i}"))
    names = ["threshold", "n_kept"] + (["kept_weight"] if weight_col else [])
    rows = one.select(
        "n_docs",
        *(["_tw"] if weight_col else []),
        F.stack(F.lit(len(thresholds)), *stack_args).alias(*names),
    )
    out = rows.select(
        "threshold",
        "n_kept",
        (F.col("n_kept").cast("double") / F.col("n_docs").cast("double")).alias(
            "kept_share"
        ),
        *(
            [
                "kept_weight",
                (F.col("kept_weight").cast("double") / F.col("_tw").cast("double")).alias(
                    "weight_share"
                ),
            ]
            if weight_col
            else []
        ),
    )
    return out
