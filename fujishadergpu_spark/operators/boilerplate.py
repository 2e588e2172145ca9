"""Boilerplate removal for crawled text — a deterministic, plain-text
variant of the jusText block classifier (Pomikalek 2011, "Removing
Boilerplate and Duplicate Content from Web Corpora", ch. 4).

jusText classifies each text block by stopword density and length,
then lets context rescue the ambiguous blocks: content ("good")
blocks cluster together, navigation/footer chrome ("bad") clusters
together, and short or borderline blocks take the verdict of their
nearest decisive neighbours. This module implements that two-pass
scheme over ``\\n``-separated lines:

Context-free pass (per line, pure column expressions):
- ``short``   — fewer than ``short_words`` words;
- ``good``    — stopword density >= ``sw_high``;
- ``near``    — stopword density >= ``sw_low`` (near-good);
- ``bad``     — otherwise.

Context pass (per document, position order): ``good``/``bad`` are
final; a ``short`` or ``near`` line becomes content iff its nearest
decisive neighbour on EITHER side (the closest preceding or following
context-free ``good``/``bad`` line) is ``good``. This is the
simplified deterministic form of jusText's neighbour rule — the
published classifier distinguishes the two sides and headings; the
rescue-by-nearest-decisive-neighbour core is the same.

Scale notes (100 TB):
- The context-free pass is whole-stage-codegen column arithmetic on
  the exploded line relation — no UDF, no shuffle.
- The context pass and the rebuild need the lines of one document
  together: ONE exchange on ``doc_id`` (high-cardinality, document-
  bounded partitions — the anti-``line_dedup`` key: no hot key can
  exist), then both neighbour windows, the final verdict, and the
  per-doc regroup all run under that same partitioning, so Catalyst
  reuses the exchange (pinned in tests/test_boilerplate.py). The
  totality back-join in :func:`boilerplate_strip` adds one more
  doc_id exchange for the base-id side — ids only, never text.
- Totality: documents with no non-empty line survive with zero
  counts and empty content (the repetition_features discipline).

Reference parity: the geospatial reference has no text pipeline;
this is part of the web-scale training-data mandate (SURVEY.md §2.E)
— the extraction-time complement of the corpus-level cleaners
(C4 rules, Gopher repetition, CCNet line dedup).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textfn import STOPWORDS
from .repetition import doc_lines

SHORT_WORDS = 3
SW_HIGH = 0.32
SW_LOW = 0.18


def _words(line):
    return F.filter(F.split(line, " +"), lambda t: t != "")


def boilerplate_lines(
    df: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    short_words: int = SHORT_WORDS,
    sw_high: float = SW_HIGH,
    sw_low: float = SW_LOW,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Per-line classification relation: (doc_id, pos, line, n_words,
    sw_density, cls, is_content). ``cls`` is the context-free class,
    ``is_content`` the final verdict after the neighbour pass.
    Documents with no non-empty line contribute no rows here (use
    :func:`boilerplate_strip` for the total per-document view).
    """
    sw = sorted({w.lower() for w in (stopwords if stopwords is not None else STOPWORDS["en"])})
    sw_arr = F.array(*[F.lit(w) for w in sw])
    did = F.col(doc_id_col)
    lines = df.select(
        did.alias("doc_id"), F.posexplode(doc_lines(F.col(text_col))).alias("pos", "line")
    )
    w = _words(F.col("line"))
    n_words = F.size(w)
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(sw_arr, F.lower(t))))
    density = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(F.lit(0.0))
    cls = (
        F.when(n_words < short_words, F.lit("short"))
        .when(density >= sw_high, F.lit("good"))
        .when(density >= sw_low, F.lit("near"))
        .otherwise(F.lit("bad"))
    )
    feat = lines.withColumns(
        {"n_words": n_words.cast("long"), "sw_density": density, "cls": cls}
    )
    # nearest decisive (good/bad) neighbour on each side — both
    # windows share the doc_id exchange with the regroup downstream
    edge = F.when(F.col("cls").isin("good", "bad"), F.col("cls"))
    order = Window.partitionBy("doc_id").orderBy("pos")
    prev_e = F.last(edge, ignorenulls=True).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_e = F.first(edge, ignorenulls=True).over(
        order.rowsBetween(1, Window.unboundedFollowing)
    )
    # coalesce each side: a doc of only short/near lines has NULL
    # neighbours on both sides, and (NULL | NULL) must read as false
    rescued = F.coalesce(prev_e == "good", F.lit(False)) | F.coalesce(
        next_e == "good", F.lit(False)
    )
    is_content = F.when(F.col("cls") == "good", F.lit(True)).otherwise(
        F.col("cls").isin("short", "near") & rescued
    )
    return feat.withColumn("is_content", is_content)


def boilerplate_strip(
    df: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "expr",
    **kw,
) -> DataFrame:
    """Total per-document rewrite: (doc_id, n_lines, n_content,
    text_content) for EVERY input document — the content lines
    re-joined in original order, empty when nothing survives.

    ``impl='arrow'``: the whole classify+rescue+rebuild runs per
    document inside one vectorized pandas UDF — ZERO exchanges and no
    totality join (the per-doc computation IS total), bit-identical
    rows (pinned in tests/test_boilerplate.py). The expr plan remains
    the DuckDB-twinned default and the per-LINE relation
    (boilerplate_lines) is expr-only."""
    if impl == "arrow":
        return _boilerplate_strip_arrow(
            df, doc_id_col, text_col,
            kw.get("short_words", SHORT_WORDS), kw.get("sw_high", SW_HIGH),
            kw.get("sw_low", SW_LOW), kw.get("stopwords"),
        )
    if impl != "expr":
        raise ValueError(f"unknown impl {impl!r} (expr/arrow)")
    did = F.col(doc_id_col)
    classed = boilerplate_lines(df, doc_id_col, text_col, **kw)
    per_doc = classed.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("is_content").cast("long")).alias("n_content"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("is_content"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_content"),
    )
    totals = df.select(did.alias("doc_id"))
    return totals.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_lines"), F.lit(0)).cast("bigint").alias("n_lines"),
        F.coalesce(F.col("n_content"), F.lit(0)).cast("bigint").alias("n_content"),
        F.coalesce(F.col("text_content"), F.lit("")).alias("text_content"),
    )


def _strip_one(text, short_words, sw_high, sw_low, sw_set):
    """One document's classify+rescue+rebuild, pure Python — the exact
    per-line semantics of the expression plan (split on runs of
    spaces, density as IEEE double division, rule order short->
    good->near->bad, nearest-decisive rescue)."""
    import re

    lines = [l for l in text.split("\n") if l != ""] if text else []
    cls = []
    for l in lines:
        words = [t for t in re.split(" +", l) if t != ""]
        nw = len(words)
        d = (sum(1 for t in words if t.lower() in sw_set) / nw) if nw else 0.0
        if nw < short_words:
            cls.append("short")
        elif d >= sw_high:
            cls.append("good")
        elif d >= sw_low:
            cls.append("near")
        else:
            cls.append("bad")
    n = len(lines)
    prev_e, last = [], None
    for c in cls:
        prev_e.append(last)
        if c in ("good", "bad"):
            last = c
    next_e, nxt = [None] * n, None
    for i in range(n - 1, -1, -1):
        next_e[i] = nxt
        if cls[i] in ("good", "bad"):
            nxt = cls[i]
    content = [
        lines[i]
        for i in range(n)
        if cls[i] == "good"
        or (cls[i] in ("short", "near") and (prev_e[i] == "good" or next_e[i] == "good"))
    ]
    return n, len(content), "\n".join(content)


def _boilerplate_strip_arrow(
    df: DataFrame,
    doc_id_col: str,
    text_col: str,
    short_words: int,
    sw_high: float,
    sw_low: float,
    stopwords: list[str] | None,
) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    sw_set = frozenset(
        w.lower() for w in (stopwords if stopwords is not None else STOPWORDS["en"])
    )

    @pandas_udf("n_lines long, n_content long, text_content string")
    def strip(texts: pd.Series) -> pd.DataFrame:
        rows = [_strip_one(t, short_words, sw_high, sw_low, sw_set) for t in texts]
        return pd.DataFrame(rows, columns=["n_lines", "n_content", "text_content"])

    return df.select(
        F.col(doc_id_col).alias("doc_id"), strip(F.col(text_col)).alias("_s")
    ).select("doc_id", "_s.n_lines", "_s.n_content", "_s.text_content")
