"""Dataset card statistics — the corpus-level summary every public
release ships alongside the data (Gebru 2021 "Datasheets for
Datasets"; the Pile/C4/RefinedWeb papers each publish exactly this
table): document counts, token/char mass, emptiness, exact-dup rate,
and token-length extrema, as ONE aggregate row.

Everything is integer counts or ``*_q6`` ratios quantized to
``round(x * 1e6)`` BEFORE leaving the engine (the bm25.py
quantized-sum contract), so the row hashes bit-identically across
Spark and DuckDB — a dataset card that cannot silently drift between
the engine that built the corpus and the engine that audits it.

100-TB shape: one map-side-partial aggregate to a single row — no
window, no join, no driver state beyond the 1-row result. The
exact-dup rate needs a distinct count over document text; at oracle
scale both engines count DISTINCT text directly, and at production
scale the caller pre-folds text through ``F.xxhash64`` (64-bit keys
instead of full text in the shuffle — the dedup.py discipline) via
``text_key_col``; the operator's shape is identical either way.

Reference parity note: the geospatial reference has no text pipeline;
this module is part of the web-scale training-data mandate
(SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textfn


def dataset_card(
    df: DataFrame,
    text_col: str = "text",
    text_key_col: str | None = None,
) -> DataFrame:
    """One summary row for the corpus:

    - ``n_docs``            — total rows (NULL text included);
    - ``n_empty``           — rows whose text is NULL or '';
    - ``n_chars``           — total characters over non-NULL text;
    - ``n_tokens``          — total whitespace tokens;
    - ``n_distinct_texts``  — exact-dup denominator: distinct text
      values over non-empty docs (or distinct ``text_key_col`` when
      given — the production 64-bit-key path, see module docstring);
    - ``dup_rate_q6``       — round(1e6 * (1 - distinct/non-empty)),
      0 when there are no non-empty docs;
    - ``mean_tokens_q6``    — round(1e6 * n_tokens / non-empty),
      0 when there are no non-empty docs;
    - ``max_tokens`` / ``min_tokens`` — extrema over non-empty docs
      (0 when none exist).

    All BIGINT — the row hashes bit-identically cross-engine.
    """
    t = F.col(text_col)
    nonempty = t.isNotNull() & (t != "")
    key = F.col(text_key_col) if text_key_col else t
    tc = textfn.token_count(t)
    n_nonempty = F.sum(nonempty.cast("long"))
    n_tokens = F.sum(F.when(nonempty, tc).otherwise(F.lit(0))).cast("long")
    n_distinct = F.count_distinct(F.when(nonempty, key))
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - n_nonempty).cast("long").alias("n_empty"),
        F.sum(F.when(nonempty, F.length(t)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct_texts"),
        F.when(n_nonempty > 0, F.round((F.lit(1.0) - n_distinct / n_nonempty) * 1e6))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dup_rate_q6"),
        F.when(n_nonempty > 0, F.round(n_tokens / n_nonempty * 1e6))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("mean_tokens_q6"),
        F.coalesce(F.max(F.when(nonempty, tc)), F.lit(0))
        .cast("long")
        .alias("max_tokens"),
        F.coalesce(F.min(F.when(nonempty, tc)), F.lit(0))
        .cast("long")
        .alias("min_tokens"),
    )
