"""Unicode script profiling — per-document script mix, the
language-robustness signal multilingual webtext pipelines gate on
(OSCAR's per-language corpora assume script purity; FineWeb-2 and
CCNet both report script-mix anomalies as spam/boilerplate evidence:
mixed-script text is the classic look-alike-domain / SEO-spam tell).

Each profiled script is an explicit Unicode BLOCK range table entry
(not a \\p{Script=...} property class — property semantics differ
between regex engines, literal codepoint ranges do not). Counts are
length-deltas of a global regexp_replace that strips the block, so
both engines produce identical exact integers; fractions are single
CAST(x AS DOUBLE)/y divisions of those integers (the repetition.py
cross-engine discipline). Dominant script is a fixed-priority
when-chain over the counts (first declared wins ties), mirrored
literally by a CASE chain in the DuckDB twin — no struct-comparison
semantics in sight.

100-TB shape: one per-row projection — zero shuffle, zero UDF,
whole-stage codegen, streaming-safe.

Reference parity note: the geospatial reference has no text pipeline;
this module is part of the web-scale training-data mandate
(SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, regex character-class body) in DOMINANT-TIE-BREAK PRIORITY
# order. Letter blocks only; Latin excludes the two block holes
# U+00D7 (×) and U+00F7 (÷) so arithmetic never counts as text.
SCRIPT_RANGES: list[tuple[str, str]] = [
    ("latin", "A-Za-zÀ-ÖØ-öø-ɏ"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("arabic", "؀-ۿ"),
    ("hebrew", "֐-׿"),
    ("devanagari", "ऀ-ॿ"),
    ("han", "一-鿿"),
    ("kana", "぀-ヿ"),
    ("hangul", "가-힯"),
]

# dominant_frac below this (over >= min_letters letters) flags a
# mixed-script document
MIXED_DOMINANT_FRAC = 0.95


def _block_count(text, class_body: str):
    """Exact count of characters in the block: length delta after a
    global strip of the class."""
    return (
        F.length(text) - F.length(F.regexp_replace(text, f"[{class_body}]", ""))
    ).cast("bigint")


def script_profile(
    df: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    mixed_dominant_frac: float = MIXED_DOMINANT_FRAC,
    min_letters: int = 20,
) -> DataFrame:
    """One row per input document (total — pure per-row projection):
    doc_id, n_chars, n_letters (sum of all profiled script counts),
    n_<script> for each SCRIPT_RANGES entry, dominant_script (''
    when no profiled letters), dominant_frac (of n_letters), and
    is_mixed — true when the document has >= ``min_letters`` profiled
    letters but the dominant script holds < ``mixed_dominant_frac``
    of them. NULL text behaves as empty text.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    counts = {name: _block_count(text, body) for name, body in SCRIPT_RANGES}
    n_letters = None
    for c in counts.values():
        n_letters = c if n_letters is None else n_letters + c

    max_cnt = F.greatest(*counts.values()) if len(counts) > 1 else list(counts.values())[0]
    dominant = F.lit("")
    # first-declared-wins tie-break: build the when-chain in reverse
    # so the FIRST table entry is the outermost branch
    for name, _ in reversed(SCRIPT_RANGES):
        dominant = F.when(
            (n_letters > 0) & (counts[name] == max_cnt), F.lit(name)
        ).otherwise(dominant)
    dominant_frac = F.when(
        n_letters > 0, max_cnt.cast("double") / n_letters
    ).otherwise(F.lit(0.0))
    is_mixed = (n_letters >= min_letters) & (dominant_frac < mixed_dominant_frac)

    return df.select(
        F.col(doc_id_col).alias("doc_id"),
        F.length(text).cast("bigint").alias("n_chars"),
        n_letters.alias("n_letters"),
        *[counts[name].alias(f"n_{name}") for name, _ in SCRIPT_RANGES],
        dominant.alias("dominant_script"),
        dominant_frac.alias("dominant_frac"),
        is_mixed.alias("is_mixed"),
    )


def script_profile_sql(from_sql: str) -> str:
    """DuckDB twin of script_profile over ``FROM (from_sql)`` rows
    (doc_id, text): identical block table, identical global-strip
    counts (note the 'g' flag — DuckDB regexp_replace is first-match
    by default), identical first-declared-wins CASE chain."""
    cnt = {
        name: f"(length(text) - length(regexp_replace(text, '[{body}]', '', 'g')))"
        for name, body in SCRIPT_RANGES
    }
    total = " + ".join(cnt.values())
    mx = f"greatest({', '.join(cnt.values())})"
    case = "CASE WHEN " + f"({total}) = 0" + " THEN '' " + " ".join(
        f"WHEN {cnt[name]} = {mx} THEN '{name}'" for name, _ in SCRIPT_RANGES
    ) + " END"
    frac = f"CASE WHEN ({total}) > 0 THEN CAST({mx} AS DOUBLE) / ({total}) ELSE 0.0 END"
    cols = ",\n  ".join(
        f"CAST({cnt[name]} AS BIGINT) AS n_{name}" for name, _ in SCRIPT_RANGES
    )
    return f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST({total} AS BIGINT) AS n_letters,
  {cols},
  {case} AS dominant_script,
  {frac} AS dominant_frac,
  (({total}) >= 20 AND ({frac}) < {MIXED_DOMINANT_FRAC}) AS is_mixed
FROM ({from_sql})
ORDER BY doc_id
"""
