"""Bigram LM perplexity scoring (operators/lmscore): exactness vs a
hand-rolled Python model, the no-bigram NULL contract, and the
unseen-bigram backoff when train != docs."""

import math

from pyspark.sql import Row

from fujishadergpu_spark.operators.lmscore import lm_score

K = 0.5


def _naive(train_texts, score_docs, k=K):
    toks = [t.split(" ") for t in train_texts]
    cb: dict[tuple[str, str], int] = {}
    for tk in toks:
        for a, b in zip(tk, tk[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
    cu: dict[str, int] = {}
    for (a, _), n in cb.items():
        cu[a] = cu.get(a, 0) + n
    v = len({w for tk in toks for w in tk})
    out = {}
    for i, text in score_docs.items():
        tk = text.split(" ")
        pairs = list(zip(tk, tk[1:]))
        if not pairs:
            out[i] = (0, None)
            continue
        s = sum(
            math.log(
                (cb.get((a, b), 0) + k) / (cu.get(a, 0) + k * v)
            )
            for a, b in pairs
        )
        out[i] = (len(pairs), round(-s * 1e6))
    return out


def test_matches_naive_self_trained(spark):
    docs = {
        1: "a b a b c",
        2: "c c c a",
        3: "b a c a b",
        4: "x",  # single token: 0 bigrams, NULL score
    }
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs.items()])
    got = {r.doc_id: (r.n_bigrams, r.nll_q6) for r in lm_score(df).collect()}
    assert got == _naive(list(docs.values()), docs)


def test_unseen_bigram_backoff_train_separate(spark):
    train = {10: "a b c a b"}
    score = {
        1: "a b",   # seen bigram
        2: "b b",   # seen context, unseen bigram
        3: "z a",   # unseen context
    }
    tdf = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in train.items()])
    sdf = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in score.items()])
    got = {r.doc_id: (r.n_bigrams, r.nll_q6) for r in lm_score(sdf, train=tdf).collect()}
    assert got == _naive(list(train.values()), score)
    # a seen bigram is strictly more likely than either unseen case
    # (note add-k's known artifact: an unseen CONTEXT can score higher
    # than an unseen bigram in a seen context, because its smoothed
    # denominator is smaller — so only the seen-vs-unseen ordering is
    # model-guaranteed)
    assert got[1][1] < got[2][1] and got[1][1] < got[3][1]


def test_null_and_empty_text_total(spark):
    """NULL text must behave like empty text: n_bigrams 0, never a
    NULL/-1 count (split(NULL) would otherwise propagate)."""
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, None), (2, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_bigrams"] for r in lm_score(df).collect()}
    assert got[1] == 0 and got[2] == 0
    assert got[0] == 3


# ------------------- CCNet perplexity buckets -------------------------

def _scored(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, nll_q6 long")


def test_ppl_thresholds_exact_rank_semantics(spark):
    from fujishadergpu_spark.operators.lmscore import ppl_bucket_thresholds

    rows = [(i, "en", v) for i, v in enumerate([10, 20, 30, 40, 50, 60])]
    th = ppl_bucket_thresholds(_scored(spark, rows), "lang", exact=True).collect()[0]
    # n=6: th1 = 2nd smallest (ceil(6/3)), th2 = 4th smallest (ceil(12/3))
    assert (th["th1"], th["th2"]) == (20, 40)


def test_ppl_thresholds_ignore_null_scores(spark):
    from fujishadergpu_spark.operators.lmscore import ppl_bucket_thresholds

    rows = [(0, "en", None), (1, "en", 5), (2, "en", 7), (3, "en", 9)]
    th = ppl_bucket_thresholds(_scored(spark, rows), "lang", exact=True).collect()[0]
    assert (th["th1"], th["th2"]) == (5, 7)  # n=3 -> ranks 1 and 2


def test_ppl_buckets_assignment_and_totality(spark):
    from fujishadergpu_spark.operators.lmscore import (
        ppl_bucket_thresholds,
        ppl_buckets,
    )

    rows = [(i, "en", v) for i, v in enumerate([10, 20, 30, 40, 50, 60])]
    rows += [(9, "en", None), (10, "xx", None)]  # unscored doc; scoreless group
    s = _scored(spark, rows)
    out = {
        r["doc_id"]: r["bucket"]
        for r in ppl_buckets(s, ppl_bucket_thresholds(s, "lang", exact=True), "lang").collect()
    }
    assert [out[i] for i in range(6)] == ["head", "head", "middle", "middle", "tail", "tail"]
    assert out[9] == "unscored" and out[10] == "unscored"
    assert len(out) == 8  # total over every input row


def test_ppl_buckets_global_mode(spark):
    from fujishadergpu_spark.operators.lmscore import (
        ppl_bucket_thresholds,
        ppl_buckets,
    )

    rows = [(i, "l", v) for i, v in enumerate([3, 1, 2])]
    s = _scored(spark, rows).drop("lang")
    out = ppl_buckets(s, ppl_bucket_thresholds(s, exact=True))
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    assert got == {1: "head", 2: "middle", 0: "tail"}


def test_ppl_thresholds_approx_mode_monotone(spark):
    from fujishadergpu_spark.operators.lmscore import ppl_bucket_thresholds

    rows = [(i, "en", (i * 37) % 101) for i in range(101)]
    th = ppl_bucket_thresholds(_scored(spark, rows), "lang", exact=False).collect()[0]
    assert th["th1"] <= th["th2"]


def test_ppl_hist_thresholds_conservative_within_bin(spark):
    from fujishadergpu_spark.operators.lmscore import ppl_bucket_thresholds_hist

    rows = [(i, "en", v) for i, v in enumerate([10, 20, 30, 40, 50, 60])]
    th = ppl_bucket_thresholds_hist(
        _scored(spark, rows), "lang", bin_width=10
    ).collect()[0]
    # exact ranks are 20 and 40; bin edges are their bins' upper ends
    assert (th["th1"], th["th2"]) == (29, 49)


def test_ppl_hist_equals_exact_at_unit_bins(spark):
    from fujishadergpu_spark.operators.lmscore import (
        ppl_bucket_thresholds,
        ppl_bucket_thresholds_hist,
    )

    rows = [(i, ["en", "de"][i % 2], int((i * 37) % 101)) for i in range(60)]
    s = _scored(spark, rows)
    ex = {r["lang"]: (r["th1"], r["th2"]) for r in ppl_bucket_thresholds(s, "lang", exact=True).collect()}
    hi = {r["lang"]: (r["th1"], r["th2"]) for r in ppl_bucket_thresholds_hist(s, "lang", bin_width=1).collect()}
    assert ex == hi  # unit bins: the histogram quantile IS the rank statistic


def test_ppl_hist_global_mode(spark):
    from fujishadergpu_spark.operators.lmscore import ppl_bucket_thresholds_hist

    rows = [(i, "l", v) for i, v in enumerate([3, 1, 2])]
    th = ppl_bucket_thresholds_hist(
        _scored(spark, rows).drop("lang"), bin_width=1
    ).collect()[0]
    assert (th["th1"], th["th2"]) == (1, 2)


def test_lm_score_term_quantized_close_and_integer(spark):
    from fujishadergpu_spark.operators.lmscore import lm_score

    docs = spark.createDataFrame(
        [(0, "a b a b c d"), (1, "a b c"), (2, "solo")], ["doc_id", "text"]
    )
    d = {r["doc_id"]: r for r in lm_score(docs, k=0.5).collect()}
    q = {r["doc_id"]: r for r in lm_score(docs, k=0.5, term_quantized=True).collect()}
    for did in (0, 1):
        # each term rounds within half a quantum of the double path
        assert abs(q[did]["nll_q6"] - d[did]["nll_q6"]) <= d[did]["n_bigrams"]
    assert q[2]["nll_q6"] is None  # unscored stays unscored


def test_mink_prob_membership_signal(spark):
    from fujishadergpu_spark.operators.lmscore import mink_prob

    # train corpus: "a b" everywhere; the member doc repeats seen
    # bigrams, the outlier doc ends in a model-miss bigram whose deep
    # negative term dominates its bottom-20%
    docs = spark.createDataFrame(
        [
            (0, "a b a b a b a b a b"),   # member-like: all high-prob bigrams
            (1, "a b a b a b a b zq"),    # one rare tail bigram
            (2, "x"),                      # no bigrams
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in mink_prob(docs, frac=(1, 5)).collect()}
    assert set(out) == {0, 1, 2}
    # n=9 bigrams each -> m = ceil(9/5) = 2
    assert out[0]["n_bigrams"] == 9 and out[0]["n_mink"] == 2
    assert out[1]["n_mink"] == 2
    # the member doc's worst-20% average is HIGHER (less negative)
    assert out[0]["mink_avg_q6"] > out[1]["mink_avg_q6"]
    # selection sums exactly m quantized terms
    assert out[0]["mink_sum_q6"] == 2 * (out[0]["mink_sum_q6"] // 2)  # two equal terms
    assert out[2]["n_mink"] == 0 and out[2]["mink_sum_q6"] is None
    assert out[2]["mink_avg_q6"] is None


def test_mink_prob_m_rounds_up_and_validates(spark):
    from fujishadergpu_spark.operators.lmscore import mink_prob

    docs = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])  # 2 bigrams
    r = mink_prob(docs, frac=(1, 5)).collect()[0]
    assert r["n_mink"] == 1  # ceil(2/5) = 1, never 0 for a scored doc
    import pytest as _pt

    with _pt.raises(ValueError, match="frac"):
        mink_prob(docs, frac=(0, 5))
    with _pt.raises(ValueError, match="frac"):
        mink_prob(docs, frac=(6, 5))


def _trigram_reference(doc_tokens, train_docs, k=0.5, lams=(0.7, 0.2, 0.1)):
    """Pure-Python interpolated-trigram nll for one token list."""
    import math
    from collections import Counter

    c3, c2, c1 = Counter(), Counter(), Counter()
    T = 0
    for tks in train_docs:
        T += len(tks)
        c1.update(tks)
        c2.update(" ".join(tks[i:i + 2]) for i in range(len(tks) - 1))
        c3.update(" ".join(tks[i:i + 3]) for i in range(len(tks) - 2))
    V = len(c1)
    nll = 0.0
    for i in range(len(doc_tokens) - 2):
        w1, w2, w3 = doc_tokens[i:i + 3]
        p3 = (c3[f"{w1} {w2} {w3}"] + k) / (c2[f"{w1} {w2}"] + k * V)
        p2 = (c2[f"{w2} {w3}"] + k) / (c1[w2] + k * V)
        p1 = (c1[w3] + k) / (T + k * V)
        nll -= math.log(lams[0] * p3 + lams[1] * p2 + lams[2] * p1)
    return round(nll * 1e6)


def test_trigram_score_matches_reference_self_trained(spark):
    from fujishadergpu_spark.operators.lmscore import trigram_score

    texts = ["a b c a b d", "b c a b c", "x y"]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in trigram_score(docs, k=0.5).collect()}
    train = [t.split() for t in texts]
    for i, t in enumerate(texts):
        tks = t.split()
        if len(tks) < 3:
            assert out[i]["n_trigrams"] == 0 and out[i]["nll3_q6"] is None
        else:
            assert out[i]["n_trigrams"] == len(tks) - 2
            assert out[i]["nll3_q6"] == _trigram_reference(tks, train), i


def test_trigram_score_miss_routing_external_train(spark):
    from fujishadergpu_spark.operators.lmscore import trigram_score

    train = spark.createDataFrame([(0, "a b c a b c")], ["doc_id", "text"])
    # "a b z" is a model-miss trigram (z unseen entirely); "b c a" seen
    docs = spark.createDataFrame([(0, "a b z b c a")], ["doc_id", "text"])
    out = trigram_score(docs, k=0.5, train=train).collect()[0]
    want = _trigram_reference("a b z b c a".split(), [["a", "b", "c", "a", "b", "c"]])
    assert out["nll3_q6"] == want


def test_trigram_fluent_scores_below_scrambled(spark):
    from fujishadergpu_spark.operators.lmscore import trigram_score

    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = spark.createDataFrame(
        [(0, base.strip()), (1, "dog the over quick lazy fox the jumps brown")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in trigram_score(docs).collect()}
    per = lambda i: out[i]["nll3_q6"] / out[i]["n_trigrams"]  # noqa: E731
    assert per(0) < per(1)  # fluent text = lower per-trigram nll
