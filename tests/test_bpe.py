"""Distributed BPE trainer (operators/bpe.py): pair counts, the
iterate-argmax-merge loop vs an independent pure-Python reference
trainer, cross-implementation merge-application parity (Catalyst fold
vs pandas UDF), tokenization totality, and plan shape."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.bpe import (
    END,
    bpe_tokenize_docs,
    bpe_train,
    pair_counts,
    tokenize_words,
    word_counts,
)

DOCS = [
    (0, "low low low lower lowest"),
    (1, "new newer newest low"),
    (2, "wider wide new"),
    (3, ""),  # zero-token doc: tokenize totality
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


# ---------------------------------------------------------------------------
# independent pure-Python reference (classic Sennrich trainer)
# ---------------------------------------------------------------------------

def _ref_word_counts(docs):
    c = Counter()
    for _, text in docs:
        for w in text.lower().split():
            c[w] += 1
    return c


def _ref_pairs(vocab):
    pc = Counter()
    for syms, n in vocab:
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += n
    return pc


def _ref_apply(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(docs, n_merges, min_count=2):
    vocab = [
        (list(w) + [END], n) for w, n in sorted(_ref_word_counts(docs).items())
    ]
    merges = []
    for _ in range(n_merges):
        pc = _ref_pairs(vocab)
        if not pc:
            break
        # argmax with the same deterministic tie-break
        (left, right), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((left, right, n))
        vocab = [(_ref_apply(s, left, right), c) for s, c in vocab]
    return merges, vocab


def test_word_counts(spark):
    wc = {r["word"]: r["n"] for r in word_counts(_df(spark)).collect()}
    assert wc == dict(_ref_word_counts(DOCS))


def test_pair_counts_match_reference(spark):
    got = {
        (r["sym_l"], r["sym_r"]): r["n_occ"]
        for r in pair_counts(_df(spark)).collect()
    }
    ref = _ref_pairs(
        [(list(w) + [END], n) for w, n in _ref_word_counts(DOCS).items()]
    )
    assert got == dict(ref)


def test_pair_counts_rank_deterministic(spark):
    rows = pair_counts(_df(spark)).orderBy("rank").collect()
    keys = [(-r["n_occ"], r["sym_l"], r["sym_r"]) for r in rows]
    assert keys == sorted(keys)
    assert rows[0]["rank"] == 1


def test_train_matches_reference(spark):
    merges = bpe_train(_df(spark), n_merges=8, min_count=2)
    ref_merges, _ = _ref_train(DOCS, 8, min_count=2)
    assert [(m["sym_l"], m["sym_r"], m["n_occ"]) for m in merges] == ref_merges
    assert [m["rank"] for m in merges] == list(range(1, len(merges) + 1))
    assert all(m["merged"] == m["sym_l"] + m["sym_r"] for m in merges)


def test_train_rejects_nonpositive(spark):
    with pytest.raises(ValueError, match="n_merges must be positive"):
        bpe_train(_df(spark), 0)


def test_tokenize_words_matches_reference_vocab(spark):
    """The pandas-UDF tokenizer (merge table applied per word) must
    reproduce the trainer's final vocabulary state — two independent
    implementations (Catalyst fold vs Python loop) of the same rule."""
    merges = bpe_train(_df(spark), n_merges=6)
    _, ref_vocab = _ref_train(DOCS, 6)
    ref = {"".join(s).replace(END, ""): s for s, _ in ref_vocab}
    words = _df(spark).select(
        F.explode(F.split(F.lower("text"), " +")).alias("word")
    ).where(F.col("word") != "").distinct()
    got = {r["word"]: list(r["bpe"]) for r in tokenize_words(words, merges).collect()}
    assert got == ref


def test_overlapping_merge_is_left_to_right(spark):
    """[a,a,a] under (a,a)->aa must become [aa,a], not [a,aa]."""
    df = spark.createDataFrame([(0, "aaa aaa")], "doc_id long, text string")
    merges = bpe_train(df, n_merges=1)
    assert (merges[0]["sym_l"], merges[0]["sym_r"]) == ("a", "a")
    words = df.select(F.lit("aaa").alias("word")).distinct()
    got = tokenize_words(words, merges).collect()[0]["bpe"]
    assert list(got) == ["aa", "a", END]


def test_tokenize_docs_total_and_counts(spark):
    merges = bpe_train(_df(spark), n_merges=6)
    rows = {r["doc_id"]: r.asDict() for r in bpe_tokenize_docs(_df(spark), merges).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[3]["n_words"] == 0 and rows[3]["n_bpe_tokens"] == 0
    # doc 0: 5 words; BPE token count == sum of per-word token lengths
    _, ref_vocab = _ref_train(DOCS, 6)
    ref_len = {"".join(s).replace(END, ""): len(s) for s, _ in ref_vocab}
    assert rows[0]["n_words"] == 5
    words0 = DOCS[0][1].split()
    assert rows[0]["n_bpe_tokens"] == sum(ref_len[w] for w in words0)


def test_zero_merges_tokenizes_to_chars(spark):
    words = _df(spark).sparkSession.createDataFrame([("ab",)], "word string")
    got = tokenize_words(words, []).collect()[0]
    assert list(got["bpe"]) == ["a", "b", END] and got["n_bpe"] == 3
