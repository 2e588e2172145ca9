"""Benchmark n-gram decontamination for web-text training pipelines.

The test-set-overlap check of large-scale LM training data work
(GPT-3, Brown et al. 2020 §C; PaLM, Chowdhery et al. 2022 §D): a
training document is *contaminated* when any of its token n-grams
also occurs in a held-out evaluation/benchmark corpus, and the
pipeline either drops the document or flags it for span-level
scrubbing. :func:`decontaminate` reports, per document, the distinct
n-gram count, how many of those n-grams hit the benchmark gram set,
the contaminated fraction, and a ``keep`` flag (zero hits).

Reference parity: the reference repo is the geospatial half of this
graft and has no text pipeline; this extends the LLM-data-pipeline
family (the training-data-pipeline mandate; README capability table) alongside operators/dedup.py and
operators/repetition.py.

Scale shape (100 TB corpus, benchmark << corpus): the benchmark gram
set is small and bounded — every public benchmark suite together is
well under 10 M distinct 13-grams — so the probe side is explicitly
``F.broadcast()``: the 100-TB document side is scanned exactly once
and filtered MAP-SIDE against the broadcast hash relation; document
text never shuffles. The only exchange in the whole plan is the
per-document (id, hit-count) aggregate — two longs per row, map-side
partial. At fixture scale the join key is the gram string itself so
the DuckDB twin is bit-exact; at production scale you'd pre-hash the
gram to xxhash64 (8-byte keys, ~2^-64 collision odds per pair) —
identical plan shape, smaller broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .repetition import _empty_str_array


def token_ngrams(text, n: int):
    """Distinct space-joined token ``n``-grams of a text column.

    Whitespace tokenization (the doc_token_counts contract), then one
    JVM ``transform`` over a ``sequence`` — no Python in the path.
    Documents with fewer than ``n`` tokens yield an empty array.
    """
    tk = F.filter(F.split(text, "[ \n]+"), lambda t: t != "")
    grams = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - n + 1),
            lambda i: F.array_join(F.slice(tk, i, n), " "),
        ),
    ).otherwise(_empty_str_array())
    return F.array_distinct(grams)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark-overlap report.

    Returns (id, n_grams, n_contaminated, contaminated_frac, keep):
    distinct n-grams in the doc, how many appear anywhere in the
    benchmark corpus, their ratio, and keep = (no hit). The benchmark
    side is deduplicated then BROADCAST — the corpus-side scan is
    map-side only (see module docstring for the 100-TB contract).
    """
    bench_grams = (
        benchmark.select(
            F.explode(token_ngrams(F.col(bench_text_col), n)).alias("gram")
        )
        .distinct()
    )
    base = docs.select(
        F.col(id_col),
        token_ngrams(F.col(text_col), n).alias("_grams"),
    )
    hits = (
        base.select(id_col, F.explode("_grams").alias("gram"))
        .join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("_hits"))
    )
    nc = F.coalesce(F.col("_hits"), F.lit(0)).cast("bigint")
    ng = F.size("_grams").cast("bigint")
    return (
        base.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            ng.alias("n_grams"),
            nc.alias("n_contaminated"),
            F.when(ng > 0, nc.cast("double") / ng.cast("double"))
            .otherwise(F.lit(0.0))
            .alias("contaminated_frac"),
            (nc == 0).alias("keep"),
        )
    )
