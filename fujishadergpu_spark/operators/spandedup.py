"""Exact substring (token-span) deduplication for web-text corpora.

The ExactSubstr operator of "Deduplicating Training Data Makes
Language Models Better" (Lee et al., ACL 2022): any token window of
length ``w`` that occurs more than once ANYWHERE in the corpus —
across documents or repeated inside one — is a duplicated span, and
every token it covers is removed from the cleaned text. Unlike
MinHash/SimHash (whole-document near-dup, operators/dedup.py) and
line dedup (operators/repetition.py), this catches partial overlap:
boilerplate sentences, quoted passages, templated fragments embedded
in otherwise-unique pages.

Reference parity: the reference repo is the geospatial half of this
graft and has no text pipeline; this extends the LLM-data-pipeline
family (the training-data-pipeline mandate; README capability table) alongside dedup.py / repetition.py /
decontaminate.py.

Scale shape (100 TB corpus). Lee et al. build a monolithic suffix
array; the distributed re-expression is window-hashing, and the plan
is staged so the expensive token-level work touches only dirty docs:

1. one corpus scan emits (id, pos, gram) window occurrences — at
   fixture scale the join key is the gram STRING so the DuckDB twin
   is bit-exact; at production scale pre-hash to ``xxhash64(gram)``
   (8-byte keys, the decontaminate.py contract) so every shuffled
   row is (hash, id, pos) ≈ 24 B regardless of w;
2. duplicated grams = one groupBy(gram) count + filter — map-side
   partial, then ONE shuffle join back to occurrences. The dup set
   is corpus-sized (NOT broadcast — unlike the benchmark set in
   decontaminate.py, which is bounded);
3. ONLY documents owning at least one duplicated window ("dirty",
   typically a small fraction of the corpus) are token-exploded for
   span removal; clean docs short-circuit to a whitespace re-join of
   their own tokens with no shuffle. Covered positions are w small
   ints per dup window — the explode factor applies to dup windows
   only, never the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text):
    return F.filter(F.split(text, "[ \n]+"), lambda t: t != "")


def window_occurrences(docs: DataFrame, w: int, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, gram) for every consecutive w-token window; pos is
    1-based. Docs with fewer than w tokens emit nothing."""
    tk = _tokens(F.col(text_col))
    wins = F.transform(
        F.sequence(F.lit(1), F.size(tk) - w + 1),
        lambda i: F.struct(
            i.alias("pos"), F.array_join(F.slice(tk, i, w), " ").alias("gram")
        ),
    )
    return (
        docs.where(F.size(tk) >= w)
        .select(F.col(id_col), F.explode(wins).alias("_w"))
        .select(id_col, F.col("_w.pos").alias("pos"), F.col("_w.gram").alias("gram"))
    )


def substring_dedup(
    docs: DataFrame,
    w: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-span report + span-removed text.

    Returns (id, n_tokens, n_windows, n_dup_windows, covered_tokens,
    dup_frac, text_clean): window counts, how many of the doc's
    windows are duplicated corpus-wide (total occurrence count >=
    min_count, same-doc repeats included), how many token positions
    any duplicated window covers, covered/n_tokens, and the text with
    every covered token removed (surviving tokens re-joined with
    single spaces; whitespace is normalized as a side effect, the
    doc_token_counts tokenization contract).
    """
    tk = _tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        tk.alias("_tk"),
        F.size(tk).cast("bigint").alias("n_tokens"),
        F.greatest(F.size(tk) - w + 1, F.lit(0)).cast("bigint").alias("n_windows"),
    )
    occ = window_occurrences(docs, w, id_col, text_col)
    dup_grams = (
        occ.groupBy("gram")
        .agg(F.count("*").alias("_cnt"))
        .where(F.col("_cnt") >= min_count)
        .select("gram")
    )
    dup_occ = occ.join(dup_grams, "gram").select(id_col, "pos")
    dup_stats = dup_occ.groupBy(id_col).agg(F.count("*").alias("n_dup_windows"))
    covered = (
        dup_occ.select(
            id_col, F.explode(F.sequence(F.col("pos"), F.col("pos") + w - 1)).alias("_p")
        )
        .distinct()
    )
    cov_stats = covered.groupBy(id_col).agg(F.count("*").alias("covered_tokens"))
    # token-level reconstruction over DIRTY docs only (module contract #3)
    dirty = base.join(dup_stats.select(id_col), id_col, "semi")
    toks = dirty.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_tk")),
                lambda i: F.struct(i.alias("_p"), F.element_at("_tk", i).alias("_tok")),
            )
        ).alias("_t"),
    ).select(id_col, F.col("_t._p").alias("_p"), F.col("_t._tok").alias("_tok"))
    rebuilt = (
        toks.join(covered, [id_col, "_p"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_p", "_tok"))),
                    lambda s: s["_tok"],
                ),
                " ",
            ).alias("_clean")
        )
    )
    nd = F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("bigint")
    ct = F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("bigint")
    return (
        base.join(dup_stats, id_col, "left")
        .join(cov_stats, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            "n_windows",
            nd.alias("n_dup_windows"),
            ct.alias("covered_tokens"),
            F.when(
                F.col("n_tokens") > 0, ct.cast("double") / F.col("n_tokens").cast("double")
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
            F.when(nd == 0, F.array_join("_tk", " "))
            .otherwise(F.coalesce(F.col("_clean"), F.lit("")))
            .alias("text_clean"),
        )
    )
