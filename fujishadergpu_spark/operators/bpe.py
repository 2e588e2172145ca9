"""Distributed byte-pair-encoding (BPE) tokenizer training — the
tokenizer-build step of a training-data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

``vocab_topk`` (operators/vocab.py) builds the frequency relation a
BPE trainer consumes; this module is that trainer, kept fully
distributed so the word-count table never has to fit on the driver:

100-TB shape:
- ``word_counts``: ONE corpus-wide exchange of (word, partial count)
  pairs with map-side combine — text never shuffles. Every later
  step runs over the VOCABULARY-sized relation (distinct words,
  ~10^8 rows for a web corpus), not the corpus.
- ``pair_counts``: adjacent-symbol pairs via a sequence() explode
  over the symbol arrays (the knn ring_candidates discipline — no
  codegen blowups), aggregated with map-side partials; the shuffle
  key space is bounded by the live symbol alphabet squared.
- ``bpe_train``: the classic iterate-argmax-merge loop. Per merge,
  exactly one driver-bounded collect (the single argmax row, with a
  deterministic count-desc / symbol-asc tie-break so the merge table
  is a pure function of the corpus) and one ``localCheckpoint`` of
  the vocabulary relation (symbol arrays are word-length-sized, so
  the Catalyst ``aggregate`` fold stays tiny per row; checkpointing
  keeps lineage flat across hundreds of merges).
- ``tokenize_words`` / ``bpe_tokenize_docs``: tokenization is
  VOCABULARY-SIDED — distinct words are tokenized once (an Arrow
  pandas UDF applying the bounded merge table, broadcast in the
  closure), then joined back to the exploded corpus. A 10^12-doc
  corpus re-tokenizes by joining against ~10^8 tokenized words, the
  standard production trick.

Merge-application semantics (both the Catalyst fold and the pandas
UDF): one rule rewrites all non-overlapping occurrences left-to-right
in a single pass — ``[a,a,a]`` under ``(a,a)->aa`` becomes
``[aa,a]`` — exactly Sennrich's reference behavior; the two
independent implementations are cross-checked in tests.

Reference parity note: the geospatial reference has no text pipeline;
this module is part of the web-scale training-data mandate
(SURVEY.md §2.E).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from ..functions import textfn

END = "</w>"  # end-of-word marker symbol (Sennrich's </w>)


def word_counts(
    df: DataFrame, doc_id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, n) over lowercased whitespace tokens — the bounded
    vocabulary relation everything else runs on."""
    return (
        df.select(F.explode(textfn.tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _symbols(word: Column) -> Column:
    """Initial symbol array: characters plus the end-of-word marker."""
    return F.concat(F.split(word, ""), F.array(F.lit(END)))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over a (syms, n) vocabulary
    relation: (sym_l, sym_r, n_occ)."""
    s = F.col("syms")
    return (
        vocab.select(s, "n")
        .where(F.size(s) >= 2)
        .select(
            F.explode(F.sequence(F.lit(1), F.size(s) - 1)).alias("i"), s.alias("s"), "n"
        )
        .select(
            F.element_at("s", F.col("i")).alias("sym_l"),
            F.element_at("s", F.col("i") + 1).alias("sym_r"),
            "n",
        )
        .groupBy("sym_l", "sym_r")
        .agg(F.sum("n").alias("n_occ"))
    )


def pair_counts(
    df: DataFrame, doc_id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Iteration-0 adjacent character-pair counts over the corpus —
    the relation the first BPE merge is argmaxed from. Deterministic
    rank (count desc, then symbols asc) for a stable cut."""
    vocab = word_counts(df, doc_id_col, text_col).select(
        _symbols(F.col("word")).alias("syms"), "n"
    )
    pc = _pair_counts(vocab)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_occ"), F.asc("sym_l"), F.asc("sym_r"))
    return pc.withColumn("rank", F.row_number().over(w).cast("bigint"))


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Rewrite one merge rule over a symbol array with a Catalyst
    ``aggregate`` fold (arrays are word-sized, so the interpreted
    higher-order function is cheap — the np_filters 65k-array rule
    does not apply). Accumulator: (emitted prefix, pending symbol)."""
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(a: Column, s: Column) -> Column:
        hit = a["pend"].eqNullSafe(F.lit(left)) & (s == F.lit(right))
        return F.struct(
            F.when(hit, F.concat(a["acc"], F.array(F.lit(merged))))
            .when(a["pend"].isNull(), a["acc"])
            .otherwise(F.concat(a["acc"], F.array(a["pend"])))
            .alias("acc"),
            F.when(hit, F.lit(None).cast("string")).otherwise(s).alias("pend"),
        )

    def fin(a: Column) -> Column:
        return F.when(a["pend"].isNull(), a["acc"]).otherwise(
            F.concat(a["acc"], F.array(a["pend"]))
        )

    return F.aggregate(syms, init, step, fin)


def bpe_train(
    df: DataFrame,
    n_merges: int,
    min_count: int = 2,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> list[dict]:
    """Train ``n_merges`` BPE merges over the corpus; returns the
    merge table ``[{rank, sym_l, sym_r, merged, n_occ}, ...]`` (the
    driver-side result is merge-table-sized — bounded by n_merges —
    never vocabulary- or corpus-sized).

    Stops early when the best remaining pair occurs fewer than
    ``min_count`` times. Ties argmax deterministically by
    (count desc, sym_l asc, sym_r asc).
    """
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    vocab = (
        word_counts(df, doc_id_col, text_col)
        .select(_symbols(F.col("word")).alias("syms"), "n")
        .localCheckpoint()
    )
    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("n_occ"), F.asc("sym_l"), F.asc("sym_r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n_occ"] < min_count:
            break
        left, right, n_occ = best[0]["sym_l"], best[0]["sym_r"], best[0]["n_occ"]
        merges.append(
            {
                "rank": rank,
                "sym_l": left,
                "sym_r": right,
                "merged": left + right,
                "n_occ": int(n_occ),
            }
        )
        # one rewrite + checkpoint per merge keeps lineage flat; the
        # relation stays vocabulary-sized throughout
        vocab = vocab.select(
            _apply_merge(F.col("syms"), left, right).alias("syms"), "n"
        ).localCheckpoint()
    return merges


def _merge_word(chars: list[str], merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python single-word merge application (rank order, each
    rule left-to-right non-overlapping) — the pandas-UDF body."""
    syms = chars
    for left, right in merges:
        out: list[str] = []
        i = 0
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def tokenize_words(words: DataFrame, merges: list[dict]) -> DataFrame:
    """Tokenize a relation with a ``word`` column: adds ``bpe`` (the
    subword array) and ``n_bpe``. Vocabulary-sided by design — feed
    it DISTINCT words and join back (``bpe_tokenize_docs`` does)."""
    rules = [(m["sym_l"], m["sym_r"]) for m in merges]

    @pandas_udf(ArrayType(StringType()))
    def _bpe(col: pd.Series) -> pd.Series:
        return col.map(lambda w: _merge_word(list(w) + [END], rules))

    return words.withColumn("bpe", _bpe(F.col("word"))).withColumn(
        "n_bpe", F.size("bpe").cast("bigint")
    )


def bpe_tokenize_docs(
    df: DataFrame,
    merges: list[dict],
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE statistics under a trained merge table:
    (doc_id, n_words, n_bpe_tokens), total over input documents
    (zero-token docs get zeroed counts, never a dropped row).

    Plan: distinct words tokenize once (pandas UDF over the
    vocabulary relation), the exploded corpus joins the tokenized
    vocabulary on word, and the per-doc re-aggregate carries only
    (doc_id, n_bpe) pairs — text never shuffles."""
    toks = df.select(
        F.col(doc_id_col).alias("_doc"),
        F.explode(textfn.tokens(F.lower(F.col(text_col)))).alias("word"),
    )
    vocab = tokenize_words(toks.select("word").distinct(), merges).select(
        "word", "n_bpe"
    )
    per = (
        toks.join(vocab, "word")
        .groupBy("_doc")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_bpe").alias("n_bpe_tokens"),
        )
    )
    base = df.select(F.col(doc_id_col).alias("_doc")).distinct()
    return (
        base.join(per, "_doc", "left")
        .select(
            F.col("_doc").alias(doc_id_col),
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("bigint").alias("n_bpe_tokens"),
        )
    )
