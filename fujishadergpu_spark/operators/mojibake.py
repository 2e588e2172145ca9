"""Mojibake repair (ftfy-style, Speer 2019 "ftfy: fixes text for
you") — the curated-table core of the fixer every public webtext
pipeline runs before any other text gate (The Pile, OSCAR, C4
preprocessing all ship an encoding-repair pass).

The dominant real-world corruption class is UTF-8 bytes mis-decoded
as CP1252/Latin-1 ("â€™" where "’" was meant, "Ã©" for "é"). Repair
is a fixed, ordered literal-substitution table: each entry is the
CP1252 rendering of one UTF-8 sequence mapped back to the intended
character. We deliberately implement the TABLE, not ftfy's full
chardet heuristics — the table covers the overwhelmingly common
cases, is deterministic, and (critically for this repo's gates) has
an exact cross-engine twin: ``replace(...)`` chains are literal
substring substitution in both Spark and DuckDB, no regex dialect in
sight.

Table scope: only sequences whose CP1252 bytes are all MAPPED
codepoints (so the corruption round-trips deterministically). The
unmappable-byte cases (e.g. U+201D whose 0x9D is a CP1252 hole) are
excluded on purpose — their corrupted form is decoder-dependent, so
no fixed table is correct for them.

100-TB shape: the whole operator is a chain of literal ``replace``
column expressions fused by whole-stage codegen — zero shuffle, zero
UDF, zero driver state, streaming-safe. Flag and byte-delta columns
are pure arithmetic on the same projection.

Reference parity note: the geospatial reference has no text pipeline;
this module is part of the web-scale training-data mandate
(SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (corrupted, intended), applied IN LIST ORDER in both engines.
# 3-byte UTF-8 (E2 80 xx punctuation) first, then 2-byte (C3/C2 xx
# Latin-1 letters / symbols). Every corrupted string below is the
# CP1252 decode of the intended character's UTF-8 bytes, restricted
# to fully-mapped CP1252 bytes (see module docstring).
MOJIBAKE_TABLE: list[tuple[str, str]] = [
    ("â€™", "’"),  # â€™ -> ’
    ("â€˜", "‘"),  # â€˜ -> ‘
    ("â€œ", "“"),  # â€œ -> “
    ("â€“", "–"),  # â€“ -> –
    ("â€”", "—"),  # â€” -> —
    ("â€¦", "…"),  # â€¦ -> …
    ("â€¢", "•"),  # â€¢ -> •
    ("Ã©", "é"),  # Ã© -> é
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ãª", "ê"),  # Ãª -> ê
    ("Ã¡", "á"),  # Ã¡ -> á
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã§", "ç"),  # Ã§ -> ç
    ("Ã¯", "ï"),  # Ã¯ -> ï
    ("Ã³", "ó"),  # Ã³ -> ó
    ("Ãº", "ú"),  # Ãº -> ú
    ("Â«", "«"),  # Â« -> «
    ("Â»", "»"),  # Â» -> »
    ("Â°", "°"),  # Â° -> °
    ("Â·", "·"),  # Â· -> ·
    ("Â ", " "),  # Â<nbsp> -> nbsp
]


def fix_mojibake(col) -> "F.Column":
    """The repaired text as one fused column expression: the
    MOJIBAKE_TABLE substitutions applied in order via literal
    ``F.replace`` (whole-stage codegen, no regex engine)."""
    out = col
    for bad, good in MOJIBAKE_TABLE:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def mojibake_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per input document (total — pure per-row projection,
    nothing can drop): the input columns plus

    - ``text_fixed``   — text with MOJIBAKE_TABLE applied in order;
    - ``has_mojibake`` — true iff any substitution fired;
    - ``chars_fixed``  — length(text) - length(text_fixed). Every
      table entry strictly shortens (3->1 or 2->1 chars), so this is
      a deterministic, cross-engine-exact corruption-mass measure
      (NOT a substitution count: entries shrink by different
      amounts).

    NULL text passes through as NULL with has_mojibake=false and
    chars_fixed=0 (the repetition_features totality discipline).
    """
    t = F.col(text_col)
    fixed = fix_mojibake(t)
    return df.withColumns(
        {
            "text_fixed": fixed,
            "has_mojibake": F.coalesce(t != fixed, F.lit(False)),
            "chars_fixed": F.coalesce(
                (F.length(t) - F.length(fixed)).cast("long"), F.lit(0)
            ),
        }
    )


def mojibake_sql_expr(col_sql: str) -> str:
    """DuckDB twin of fix_mojibake over the SQL expression
    ``col_sql``: the same table, same order, as a nested replace()
    chain. Single quotes in literals are SQL-escaped (none occur in
    the table today, but keep the escape for safety)."""
    out = col_sql
    for bad, good in MOJIBAKE_TABLE:
        b = bad.replace("'", "''")
        g = good.replace("'", "''")
        out = f"replace({out}, '{b}', '{g}')"
    return out
