"""DSIR importance resampling (operators/dsir.py): target-likeness
signal, totals, determinism, and partition invariance."""

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.dsir import (
    dsir_resample,
    dsir_weights,
    gumbel_params,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # two registers: docs 0-9 "code" vocabulary, docs 10-19 "food"
    code = "spark shuffle join partition executor broadcast catalyst"
    food = "butter flour sugar oven whisk saucepan ladle"
    rows = [(i, code if i < 10 else food) for i in range(20)]
    rows.append((20, ""))  # token-less doc
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_weights_follow_target_register(corpus):
    # target = the code register -> code docs must outweigh food docs
    target = corpus.where(F.col("doc_id") < 10)
    w = {r["doc_id"]: r for r in dsir_weights(corpus, target).collect()}
    assert set(w) == set(range(21))
    code_w = {w[i]["weight_q6"] for i in range(10)}
    food_w = {w[i]["weight_q6"] for i in range(10, 20)}
    assert min(code_w) > max(food_w)
    # identical text -> identical weight
    assert len(code_w) == 1 and len(food_w) == 1
    # token-less doc: total over the input, zero weight
    assert w[20]["n_grams"] == 0 and w[20]["weight_q6"] == 0
    # unigrams + bigrams: 7 tokens -> 7 + 6
    assert w[0]["n_grams"] == 13


def test_resample_prefers_high_weight_and_is_deterministic(corpus):
    target = corpus.where(F.col("doc_id") < 10)
    w = dsir_weights(corpus, target)
    s1 = [r["doc_id"] for r in dsir_resample(w, 8).collect()]
    s2 = [r["doc_id"] for r in dsir_resample(w, 8).collect()]
    assert s1 == s2 and len(s1) == 8
    # weight gap between registers dwarfs Gumbel noise here, so the
    # sample is dominated by code docs
    assert sum(1 for i in s1 if i < 10) >= 6
    # a different seed draws different noise (weights unchanged)
    s3 = [r["doc_id"] for r in dsir_resample(w, 8, seed=7).collect()]
    assert gumbel_params(7) != gumbel_params(42)
    assert set(s1) != set(s3) or s1 != s3


def test_weights_partition_invariant(corpus):
    target = corpus.where(F.col("doc_id") < 10)
    a = sorted(dsir_weights(corpus, target).collect())
    b = sorted(
        dsir_weights(corpus.repartition(13, "doc_id"), target).collect()
    )
    assert a == b
