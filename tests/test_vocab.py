"""Vocabulary building + coverage (operators/vocab.py): counts,
deterministic tie-break at the top-k cut, coverage totality, and the
broadcast-probe plan shape."""

import pytest

from fujishadergpu_spark.operators.vocab import vocab_coverage, vocab_topk

DOCS = [
    (0, "apple banana apple cherry"),
    (1, "Apple banana banana date"),   # lowercased: apple counts here too
    (2, "cherry cherry cherry"),
    (3, ""),                            # zero-token doc: coverage total
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_vocab_counts_and_rank(spark):
    v = {r["word"]: r.asDict() for r in vocab_topk(_df(spark), 10).collect()}
    assert v["apple"]["n_occ"] == 3 and v["apple"]["n_docs"] == 2
    assert v["banana"]["n_occ"] == 3 and v["banana"]["n_docs"] == 2
    assert v["cherry"]["n_occ"] == 4 and v["cherry"]["n_docs"] == 2
    assert v["date"]["n_occ"] == 1
    # rank: cherry(4), then the 3-count tie broken word-asc
    assert v["cherry"]["rank"] == 1
    assert v["apple"]["rank"] == 2 and v["banana"]["rank"] == 3
    assert v["date"]["rank"] == 4


def test_topk_cut_is_deterministic(spark):
    # k=2 cuts INSIDE the apple/banana tie: word asc keeps apple
    words = {r["word"] for r in vocab_topk(_df(spark), 2).collect()}
    assert words == {"cherry", "apple"}


def test_topk_rejects_nonpositive_k(spark):
    with pytest.raises(ValueError, match="k must be positive"):
        vocab_topk(_df(spark), 0)


def test_coverage_total_and_exact(spark):
    d = _df(spark)
    cov = {
        r["doc_id"]: r.asDict()
        for r in vocab_coverage(d, vocab_topk(d, 2)).collect()
    }
    assert set(cov) == {0, 1, 2, 3}
    # vocab = {cherry, apple}; doc 0 tokens: apple x2, banana, cherry
    assert cov[0]["n_tokens"] == 4 and cov[0]["n_in_vocab"] == 3
    assert cov[0]["n_oov"] == 1 and cov[0]["oov_rate"] == pytest.approx(0.25)
    # doc 1: apple, banana x2, date -> 1 in-vocab
    assert cov[1]["n_in_vocab"] == 1 and cov[1]["n_oov"] == 3
    assert cov[2]["n_oov"] == 0 and cov[2]["oov_rate"] == 0.0
    # zero-token doc: zeroed counts, rate 0.0, never a dropped row
    assert cov[3]["n_tokens"] == 0 and cov[3]["oov_rate"] == 0.0


def test_coverage_vocab_join_is_broadcast(spark):
    """The token->vocab probe must be a broadcast hash join: the
    corpus-sized exploded relation never shuffles to meet the bounded
    vocabulary."""
    d = _df(spark)
    plan = (
        vocab_coverage(d, vocab_topk(d, 2))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_freq_spectrum_laws(spark):
    from fujishadergpu_spark.operators.vocab import freq_spectrum

    docs = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "a b d")], ["doc_id", "text"]
    )
    # counts: a=4, b=3, c=1, d=1 -> spectrum: f1 x2 types, f3 x1, f4 x1
    out = {r["freq"]: r for r in freq_spectrum(docs).collect()}
    assert {(f, r["n_types"]) for f, r in out.items()} == {(1, 2), (3, 1), (4, 1)}
    # conservation: type shares sum to 1, token shares sum to 1,
    # n_tokens sums to the corpus token count
    assert sum(r["n_tokens"] for r in out.values()) == 9
    assert abs(sum(r["type_share"] for r in out.values()) - 1.0) < 1e-12
    assert abs(sum(r["token_share"] for r in out.values()) - 1.0) < 1e-12
    assert out[1]["type_share"] == 0.5  # hapax class: 2 of 4 types


def test_ngram_topk_counts_mass_not_distinct(spark):
    from fujishadergpu_spark.operators.vocab import ngram_topk

    docs = [
        (0, "a b a b a b"),   # 2-grams: "a b" x3, "b a" x2
        (1, "a b c"),          # "a b", "b c"
        (2, "x"),              # shorter than n: no grams
        (3, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    top = {r["gram"]: r.asDict() for r in ngram_topk(df, 2, 10).collect()}
    assert top["a b"]["n_occ"] == 4 and top["a b"]["n_docs"] == 2
    assert top["b a"]["n_occ"] == 2 and top["b a"]["n_docs"] == 1
    assert top["b c"]["n_occ"] == 1
    assert top["a b"]["rank"] == 1 and top["b a"]["rank"] == 2
    # tie at n_occ=1 ("b c" only) — and the cut is deterministic
    two = [r["gram"] for r in ngram_topk(df, 2, 2).collect()]
    assert two == ["a b", "b a"]


def test_ngram_topk_lowercases_and_validates(spark):
    from fujishadergpu_spark.operators.vocab import ngram_topk

    df = spark.createDataFrame([(0, "Foo BAR foo bar")], "doc_id long, text string")
    top = {r["gram"]: r["n_occ"] for r in ngram_topk(df, 2, 10).collect()}
    assert top["foo bar"] == 2
    with pytest.raises(ValueError, match="n must be"):
        ngram_topk(df, 0, 5)
    with pytest.raises(ValueError, match="k must be"):
        ngram_topk(df, 2, 0)
