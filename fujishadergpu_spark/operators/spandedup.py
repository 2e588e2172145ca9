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

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS_RE = re.compile(r"[ \n]+")


def _py_tokens(text) -> list[str]:
    return [t for t in _WS_RE.split(text) if t] if text else []


def _tokens(text):
    return F.filter(F.split(text, "[ \n]+"), lambda t: t != "")


def window_occurrences(
    docs: DataFrame, w: int, id_col: str, text_col: str, impl: str = "expr"
) -> DataFrame:
    """(id, pos, gram) for every consecutive w-token window; pos is
    1-based. Docs with fewer than w tokens emit nothing.

    impl='arrow' builds the windows in a mapInPandas (plain Python
    slicing — the expr plan's per-window array_join(slice(tk)) HOFs
    are interpreted per element); identical rows, the gram string
    join is ' ' in both."""
    if impl == "arrow":

        def run(it):
            for pdf in it:
                ids, poss, grams = [], [], []
                for did, text in zip(pdf[id_col], pdf[text_col]):
                    tk = _py_tokens(text)
                    for i in range(len(tk) - w + 1):
                        ids.append(did)
                        poss.append(i + 1)
                        grams.append(" ".join(tk[i : i + w]))
                yield pd.DataFrame({id_col: ids, "pos": poss, "gram": grams})

        return docs.select(id_col, text_col).mapInPandas(
            run, f"{id_col} long, pos int, gram string"
        )
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
    impl: str = "arrow",
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

    ``impl``: 'arrow' (default) extracts windows and rebuilds cleaned
    text in Python batches — the cross-document dup detection (the
    only part that NEEDS a shuffle) stays relational and unchanged;
    'expr' is the original all-relational plan, the statement the
    DuckDB twin mirrors. Row-identical (tests/test_spandedup.py).
    """
    if impl == "arrow":
        return _substring_dedup_arrow(docs, w, min_count, id_col, text_col)
    if impl != "expr":
        raise ValueError(f"unknown impl {impl!r} (arrow/expr)")
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


def _substring_dedup_arrow(
    docs: DataFrame, w: int, min_count: int, id_col: str, text_col: str
) -> DataFrame:
    """Arrow-staged ExactSubstr: Python window extraction, relational
    corpus-wide dup detection, Python per-doc finalize.

    Stage shape vs the expr plan: the (id, pos, gram) occurrence
    relation, the groupBy(gram) dup filter and the covered-position
    union are IDENTICAL relations — only their production moved out
    of interpreted per-window HOFs. The finalize stage replaces the
    expr plan's token explode + anti-join + collect_list/array_sort
    rebuild (three exchanges over token rows) with one mapInPandas
    over (doc, covered-position list): per-doc work, list bounded by
    document length. Cleaned text is the same ' '-join of surviving
    tokens in position order."""
    # one window-extraction scan total (the ngram_jaccard_pairs
    # localCheckpoint precedent): occ feeds the dup count AND the
    # join-back; without the checkpoint each branch re-runs the
    # extraction UDF over the corpus
    occ = window_occurrences(docs, w, id_col, text_col, impl="arrow").localCheckpoint(
        eager=False
    )
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
    cov = covered.groupBy(id_col).agg(
        F.count("*").alias("covered_tokens"), F.collect_list("_p").alias("_ps")
    )
    joined = (
        docs.select(id_col, text_col)
        .join(dup_stats, id_col, "left")
        .join(cov, id_col, "left")
    )

    def finalize(it):
        for pdf in it:
            out = {
                id_col: [], "n_tokens": [], "n_windows": [], "n_dup_windows": [],
                "covered_tokens": [], "dup_frac": [], "text_clean": [],
            }
            for did, text, nd, ct, ps in zip(
                pdf[id_col], pdf[text_col], pdf["n_dup_windows"],
                pdf["covered_tokens"], pdf["_ps"],
            ):
                ndi = 0 if pd.isna(nd) else int(nd)
                cti = 0 if pd.isna(ct) else int(ct)
                if text is None:
                    # expr twin: size(NULL)/array_join(NULL) stay NULL,
                    # greatest(NULL, 0) is 0
                    out[id_col].append(did)
                    out["n_tokens"].append(None)
                    out["n_windows"].append(0)
                    out["n_dup_windows"].append(ndi)
                    out["covered_tokens"].append(cti)
                    out["dup_frac"].append(0.0)
                    out["text_clean"].append(None)
                    continue
                tk = _py_tokens(text)
                n = len(tk)
                if ndi == 0:
                    clean = " ".join(tk)
                else:
                    covset = set(int(p) for p in ps)
                    clean = " ".join(t for i, t in enumerate(tk, 1) if i not in covset)
                out[id_col].append(did)
                out["n_tokens"].append(n)
                out["n_windows"].append(max(n - w + 1, 0))
                out["n_dup_windows"].append(ndi)
                out["covered_tokens"].append(cti)
                out["dup_frac"].append(float(cti) / float(n) if n > 0 else 0.0)
                out["text_clean"].append(clean)
            yield pd.DataFrame(out)

    schema = (
        f"{id_col} long, n_tokens long, n_windows long, n_dup_windows long, "
        "covered_tokens long, dup_frac double, text_clean string"
    )
    return joined.mapInPandas(finalize, schema)
