"""Benchmark n-gram decontamination (operators/decontaminate.py) —
hand-computed expectations on a tiny corpus + benchmark, edge cases,
and the broadcast-probe plan contract."""

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.decontaminate import (
    decontaminate,
    embedding_decontaminate,
    token_ngrams,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # doc 0: contains the benchmark span "a b c" verbatim
        (0, "x y a b c z"),
        # doc 1: clean — no 3-gram overlaps the benchmark
        (1, "p q r s t"),
        # doc 2: the benchmark span repeated — distinct grams count ONCE
        (2, "a b c d a b c"),
        # doc 3: too short for any 3-gram
        (3, "a b"),
        # doc 4: two distinct contaminated grams ("a b c" and "b c z")
        (4, "a b c z q"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def bench_df(spark):
    return spark.createDataFrame(
        [("a b c z w",), ("m n o",)], ["text"]
    )


def test_hand_computed(spark, corpus, bench_df):
    out = {
        r["doc_id"]: r
        for r in decontaminate(corpus, bench_df, n=3).collect()
    }
    # bench grams (n=3): {a b c, b c z, c z w, m n o}
    # doc 0 grams: {x y a, y a b, a b c, b c z} -> 2 hits
    assert (out[0]["n_grams"], out[0]["n_contaminated"]) == (4, 2)
    assert not out[0]["keep"]
    # doc 1: 3 grams, 0 hits -> keep
    assert (out[1]["n_grams"], out[1]["n_contaminated"]) == (3, 0)
    assert out[1]["keep"]
    # doc 2: grams {a b c, b c d, c d a, d a b} distinct -> 1 hit,
    # even though "a b c" occurs twice in the text
    assert (out[2]["n_grams"], out[2]["n_contaminated"]) == (4, 1)
    # doc 3: shorter than n -> 0 grams, frac 0.0, keep
    assert (out[3]["n_grams"], out[3]["n_contaminated"]) == (0, 0)
    assert out[3]["contaminated_frac"] == 0.0 and out[3]["keep"]
    # doc 4: grams {a b c, b c z, c z q} -> 2 hits, frac 2/3
    assert (out[4]["n_grams"], out[4]["n_contaminated"]) == (3, 2)
    assert out[4]["contaminated_frac"] == pytest.approx(2.0 / 3.0)


def test_empty_benchmark_keeps_everything(spark, corpus):
    empty = spark.createDataFrame([], "text string")
    rows = decontaminate(corpus, empty, n=3).collect()
    assert all(r["keep"] for r in rows)
    assert all(r["n_contaminated"] == 0 for r in rows)


def test_ngrams_multiline_and_empty(spark):
    df = spark.createDataFrame([(0, "a b\nc d"), (1, "")], ["i", "t"])
    got = {
        r["i"]: r["g"]
        for r in df.select("i", token_ngrams(F.col("t"), 2).alias("g")).collect()
    }
    # newline is a token separator: grams cross the line boundary
    assert sorted(got[0]) == ["a b", "b c", "c d"]
    assert got[1] == []


def test_probe_is_broadcast(spark, corpus, bench_df):
    """100-TB contract: the benchmark gram set is the broadcast side of
    the probe join — the corpus side must never shuffle its text."""
    plan = decontaminate(corpus, bench_df, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------
# embedding-space decontamination
# ---------------------------------------------------------------------


def _emb_fixture(spark):
    """40 deterministic corpus vectors; a benchmark of blended twins
    of ids 0,8,16,24,32 (cosine ~0.98 to their source) plus one
    far-away probe that matches nothing."""
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(40, 16)).astype("float32")
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "doc_id long, embedding array<float>",
    )
    twins = [
        [float(0.97 * vecs[i][j] + 0.08 * vecs[i + 1][j]) for j in range(16)]
        for i in range(0, 40, 8)
    ]
    far = [[100.0] + [0.0] * 15]
    bench = spark.createDataFrame(
        [(e,) for e in twins + far], "embedding array<float>"
    )
    return corpus, bench


def test_embedding_decontaminate_exhaustive(spark):
    corpus, bench = _emb_fixture(spark)
    out = {
        r["doc_id"]: r.asDict()
        for r in embedding_decontaminate(
            corpus, bench, dim=16, threshold=0.9, exhaustive=True
        ).collect()
    }
    assert set(out) == set(range(40))  # total
    flagged = {d for d, r in out.items() if not r["keep"]}
    assert flagged == {0, 8, 16, 24, 32}
    assert all(out[d]["n_hits"] == 1 for d in flagged)
    assert all(out[d]["n_hits"] == 0 for d in set(out) - flagged)


def test_embedding_decontaminate_banded_matches_exhaustive(spark):
    """The sketch-gated scale path must reproduce the exact gate on the
    planted fixture (recall 1.0 there; precision structurally 1.0)."""
    corpus, bench = _emb_fixture(spark)
    kw = dict(dim=16, threshold=0.9)
    exact = sorted(
        tuple(r)
        for r in embedding_decontaminate(
            corpus, bench, exhaustive=True, **kw
        ).collect()
    )
    banded = sorted(
        tuple(r)
        for r in embedding_decontaminate(
            corpus, bench, exhaustive=False, **kw
        ).collect()
    )
    assert exact == banded


def test_embedding_decontaminate_bench_is_broadcast(spark):
    corpus, bench = _emb_fixture(spark)
    for exhaustive in (True, False):
        plan = (
            embedding_decontaminate(
                corpus, bench, dim=16, threshold=0.9, exhaustive=exhaustive
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Broadcast" in plan, exhaustive
        if exhaustive:
            # one broadcast scan + one aggregate: no shuffle join at all
            assert "SortMergeJoin" not in plan
        else:
            # the embedding probe itself must be the broadcast join;
            # only the ids-only totality back-join may merge-join
            assert "_ce" not in plan.split("SortMergeJoin")[-1].split("\n")[0]


def test_embedding_decontaminate_duplicate_bench_counts_once(spark):
    corpus, bench = _emb_fixture(spark)
    doubled = bench.unionByName(bench)
    out = {
        r["doc_id"]: r["n_hits"]
        for r in embedding_decontaminate(
            corpus, doubled, dim=16, threshold=0.9, exhaustive=True
        ).collect()
    }
    assert out[0] == 1  # distinct benchmark embeddings, not rows


def test_embedding_decontaminate_empty_benchmark_is_total(spark):
    """An empty benchmark must keep every document in BOTH modes —
    a plain cross join would silently drop the whole corpus."""
    corpus, bench = _emb_fixture(spark)
    empty = bench.limit(0)
    for exhaustive in (True, False):
        out = embedding_decontaminate(
            corpus, empty, dim=16, threshold=0.9, exhaustive=exhaustive
        ).collect()
        assert len(out) == 40, exhaustive
        assert all(r["keep"] and r["n_hits"] == 0 for r in out), exhaustive


def test_split_leakage_detects_planted_cross_split_dup(spark):
    from pyspark.sql import functions as F

    from fujishadergpu_spark.operators.decontaminate import split_leakage

    shared = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    docs = spark.createDataFrame(
        [
            (0, shared + " plus train only words here"),
            (1, "completely different training text with no overlap at all whatsoever"),
            (2, shared + " plus test side words instead"),
        ],
        "doc_id long, text string",
    )
    asg = spark.createDataFrame(
        [(0, "train"), (1, "train"), (2, "test")], "doc_id long, split string"
    )
    rep = {r["doc_id"]: r.asDict() for r in split_leakage(docs, asg, n=8).collect()}
    assert set(rep) == {0, 1}                      # train docs only
    # 10-token shared run -> 3 fully-inside 8-grams, plus the boundary
    # gram "a4..a10 plus" (both docs continue with 'plus') = 4
    assert rep[0]["n_leaked"] == 4 and rep[0]["clean"] is False
    assert rep[1]["n_leaked"] == 0 and rep[1]["clean"] is True
    assert rep[0]["split"] == "train"
