"""Text-analysis functions for training-data pipelines: token count,
quality scoring, language ID, document fingerprinting.

All hot-path math is either built-in pyspark.sql.functions (JVM,
whole-stage codegen) or Arrow pandas UDFs over NumPy — never per-row
Python. The quality metrics mirror the reference's global-stats
normalize-then-score discipline (reference algorithms/_norm_stats.py):
cheap per-row features first, corpus-level percentiles via
percentile_approx when a relative score is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

# minimal per-language stopword lists (public common words)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "nicht", "mit"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
    "es": ["el", "la", "de", "y", "un", "una", "es", "que", "por", "para"],
    "ja": ["no", "wa", "ni", "wo", "ga", "to", "de", "mo", "desu", "masu"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens, empty-safe (JVM split + filter)."""
    return F.filter(F.split(text, " +"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars / n_tokens / avg_token_len / alpha_ratio /
    space_ratio / quality_score — all closed-form column expressions
    (mirrored in the DuckDB oracle)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    spaces = n_chars - F.length(F.regexp_replace(t, " ", ""))
    avg_tok = F.when(n_tokens > 0, (n_chars - spaces).cast("double") / n_tokens).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha.cast("double") / n_chars).otherwise(F.lit(0.0))
    space_ratio = F.when(n_chars > 0, spaces.cast("double") / n_chars).otherwise(F.lit(0.0))
    # simple bounded score: favors alphabetic text with sane token
    # lengths; fully deterministic arithmetic
    score = (
        alpha_ratio * 0.5
        + F.when((avg_tok >= 3.0) & (avg_tok <= 10.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((n_tokens >= 10) & (n_tokens <= 100000), F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return df.withColumns(
        {
            "n_chars_f": n_chars.cast("long"),
            "n_tokens": n_tokens.cast("long"),
            "avg_token_len": avg_tok,
            "alpha_ratio": alpha_ratio,
            "space_ratio": space_ratio,
            "quality_score": score,
        }
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over the token set (JVM-side
    array_intersect; the n-gram-heuristic family of language ID)."""
    toks = F.array_distinct(tokens(F.lower(text)))
    return {
        lang: F.size(F.array_intersect(toks, F.lit(words)))
        for lang, words in STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax language with deterministic tie-break (lang asc);
    'und' when no stopword hits at all."""
    scores = lang_scores(text)
    pairs = F.array(
        *[F.struct((-scores[lang]).alias("neg"), F.lit(lang).alias("lang")) for lang in sorted(STOPWORDS)]
    )
    best = F.array_min(pairs)
    return F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und"))


# --------------------- fingerprint (rolling hash) ---------------------

_FP_P = np.uint64(1099511628211)  # FNV-ish multiplier
_FP_OFF = np.uint64(14695981039346656037)


def _fingerprint_series(texts: pd.Series) -> pd.Series:
    """64-bit FNV-1a content fingerprint, vectorized over the Arrow
    batch via fixed-width byte matrix ops (pure function of the text —
    the content-hash determinism device, cf. the reference's
    elevation-hash noise, reference algorithms/_impl_lic.py:38-46)."""
    arr = texts.fillna("").to_numpy(dtype=object)
    enc = [s.encode("utf-8") for s in arr]
    maxlen = max((len(b) for b in enc), default=0)
    if maxlen == 0:
        # empty text hashes to the FNV offset basis (h untouched)
        return pd.Series(np.full(len(arr), _FP_OFF, dtype=np.uint64).view(np.int64))
    mat = np.zeros((len(enc), maxlen), dtype=np.uint64)
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
    buf = np.zeros(maxlen, dtype=np.uint8)
    for i, b in enumerate(enc):  # row fill only; hashing below is columnar
        if b:
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(len(enc), _FP_OFF, dtype=np.uint64)
    col_idx = np.arange(maxlen)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = lens > j
            hj = (h[active] ^ mat[active, j]) * _FP_P
            h[active] = hj
    del buf, col_idx
    return pd.Series(h.view(np.int64))


@pandas_udf(LongType())
def fingerprint_udf(text: pd.Series) -> pd.Series:
    return _fingerprint_series(text)
