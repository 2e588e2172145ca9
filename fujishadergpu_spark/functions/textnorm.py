"""CCNet-style text normalization for dedup keys.

CCNet (Wenzek et al. 2020, §3.1; public cc_net/text_normalizer.py)
deduplicates on a NORMALIZED form of each unit — lowercase, accents
folded, every digit replaced by zero, unicode punctuation mapped to
ASCII, non-printing characters dropped, whitespace collapsed — so
that trivially-differing copies ("Page 1 of 24" vs "page 2 of 31",
curly vs straight quotes, NBSP vs space) hash identically. This
module is that normalizer as ONE fused column expression plus the
exact-dedup verdict computed on the normalized key.

Everything is whole-stage-codegen JVM expression: two ``translate``
calls over literal tables, a bounded chain of literal ``replace``
calls for the few one-to-many mappings, and three ``regexp_replace``
passes (digits, control chars, whitespace runs) — no UDF, no Python,
no shuffle in the normalizer itself. The tables below are module
constants consumed by BOTH the Spark expression and the DuckDB
oracle twin (queries.py builds the SQL from these same strings), so
the two engines cannot drift.

Accent folding is the deterministic literal-table subset (Latin-1
supplement + Latin Extended-A, generated once from NFD decomposition
at build time and frozen here as a literal) rather than full NFD —
full unicode normalization needs a UDF; the table covers the
European-script accents CCNet's own table targets and keeps the
normalizer in codegen.

100-TB shape: the normalizer is per-row compute on the scan; the
dedup verdict is one exchange of (16-byte key hash, id) rows with
map-side partial aggregation and a min-struct keeper — the
dedup.exact_dedup discipline. Text never shuffles.

Reference parity note: the geospatial reference has no text pipeline;
this module is part of the web-scale training-data mandate
(SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# unicode punctuation -> ASCII, CCNet's UNICODE_PUNCT table
# (cc_net/text_normalizer.py): the 1:1 entries live in the translate
# tables, the one-to-many entries in REPLACE_MULTI
PUNCT_FROM = "，。、！？；：（）【】《》“”‘’『』「」〔〕·～—￥％＃＆＊＠"
PUNCT_TO = ',.,!?;:()[]<>\"\"\'\'\"\"\"\"().~-$%#&*@'
# accent fold, lowercase Latin-1 supplement + Latin Extended-A
# single-char NFD decompositions (applied AFTER lower())
ACCENT_FROM = (
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
    "āăąćĉċčďēĕėęěĝğġģĥĩīĭįıĵķĺļľŀńņňōŏőŕŗřśŝşšţťũūŭůűųŵŷźżž"
)
ACCENT_TO = (
    "aaaaaaceeeeiiiinooooouuuuyy"
    "aaaccccdeeeeegggghiiiiijkllllnnnooorrrssssttuuuuuuwyzzz"
)
# one-to-many mappings (translate can't express these)
REPLACE_MULTI = (
    ("…", "..."),
    ("æ", "ae"),
    ("œ", "oe"),
    ("ß", "ss"),
    ("đ", "d"),
    ("ħ", "h"),
    ("ł", "l"),
    ("ø", "o"),
    ("þ", "th"),
    ("ŋ", "n"),
    (" ", " "),  # NBSP reads as plain space before the collapse
)
DIGIT_RE = "[0-9]"
# tab/LF/CR (\x09 \x0a \x0d) are NOT controls here — they reach the
# whitespace collapse and become single spaces
CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
WS_RE = "[ \\t\\r\\n]+"

assert len(PUNCT_FROM) == len(PUNCT_TO)
assert len(ACCENT_FROM) == len(ACCENT_TO)


def normalize_for_dedup(text: Column) -> Column:
    """The CCNet dedup key: lowercase, punctuation/accent tables,
    digits -> 0, control chars dropped, whitespace collapsed+trimmed.
    NULL reads as ''."""
    s = F.lower(F.coalesce(text, F.lit("")))
    s = F.translate(s, PUNCT_FROM, PUNCT_TO)
    s = F.translate(s, ACCENT_FROM, ACCENT_TO)
    for frm, to in REPLACE_MULTI:
        s = F.replace(s, F.lit(frm), F.lit(to))
    s = F.regexp_replace(s, DIGIT_RE, "0")
    s = F.regexp_replace(s, CONTROL_RE, "")
    return F.trim(F.regexp_replace(s, WS_RE, " "))


def normalized_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact dedup on the normalized key: one row per input document
    (total) with (id, norm_len, n_copies, keep) — keep is the
    min-id representative of each normalized-key group. Two docs that
    differ only in case, digits, accents, punctuation style, or
    whitespace collapse into one group."""
    k = normalize_for_dedup(F.col(text_col))
    # the dedup.exact_dedup shuffle discipline: group and back-join on
    # (xxhash64(key), length(key)) — 16-byte rows, map-side partial;
    # the normalized TEXT never shuffles (collision odds ~2^-64/pair)
    keyed = docs.select(
        F.col(id_col), F.xxhash64(k).alias("_h"), F.length(k).alias("_len")
    )
    groups = keyed.groupBy("_h", "_len").agg(
        F.count("*").alias("n_copies"), F.min(id_col).alias("_keeper")
    )
    return (
        keyed.join(groups, ["_h", "_len"])
        .select(
            F.col(id_col),
            F.col("_len").cast("bigint").alias("norm_len"),
            F.col("n_copies").cast("bigint").alias("n_copies"),
            (F.col(id_col) == F.col("_keeper")).alias("keep"),
        )
    )
